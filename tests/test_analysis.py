import numpy as np
import pytest

from gsearch_tpu.analysis.embed import Embedder, EmbedderParams
from gsearch_tpu.analysis.kgraph import Hubness, KGraph, kgraph_from_index
from gsearch_tpu.index.flat import FlatIndex


@pytest.fixture(scope="module")
def clustered_index():
    rng = np.random.default_rng(3)
    s, n_clusters, per = 128, 4, 25
    centers = rng.integers(0, 1 << 30, size=(n_clusters, s)).astype(np.uint32)
    sigs = []
    labels = []
    for c in range(n_clusters):
        for _ in range(per):
            x = centers[c].copy()
            mask = rng.random(s) < 0.1
            x[mask] = rng.integers(0, 1 << 30, size=mask.sum(), dtype=np.uint32)
            sigs.append(x)
            labels.append(c)
    idx = FlatIndex(sketch_size=s, sig_dtype=np.uint32)
    idx.insert(np.stack(sigs))
    return idx, np.array(labels)


def test_kgraph_extraction(clustered_index):
    idx, labels = clustered_index
    kg = kgraph_from_index(idx, knbn=8)
    assert kg.nb_nodes == 100 and kg.knbn == 8
    # no self edges
    assert all(kg.neighbors[i][0] != i for i in range(kg.nb_nodes))
    # neighbors are overwhelmingly same-cluster
    same = np.mean(labels[kg.neighbors] == labels[:, None])
    assert same > 0.95
    stats = kg.stats()
    assert 0.0 <= stats["mean_first_dist"] <= 0.5


def test_hubness(clustered_index):
    idx, _ = clustered_index
    kg = kgraph_from_index(idx, knbn=8)
    hub = Hubness(kg)
    assert hub.in_degree.sum() == kg.nb_nodes * kg.knbn
    s3m = hub.get_standard3m()
    assert np.isfinite(s3m)
    assert hub.get_hubness_histogram().sum() == kg.nb_nodes


def test_embedding_separates_clusters(clustered_index):
    idx, labels = clustered_index
    kg = kgraph_from_index(idx, knbn=8)
    emb = Embedder(kg, EmbedderParams(nb_grad_batch=30, grad_step=2.0))
    y = emb.embed()
    assert y.shape == (100, 2)
    assert np.isfinite(y).all()
    # mean intra-cluster embedded distance < mean inter-cluster distance
    d = np.linalg.norm(y[:, None, :] - y[None, :, :], axis=-1)
    same = labels[:, None] == labels[None, :]
    intra = d[same & (d > 0)].mean()
    inter = d[~same].mean()
    assert intra < inter, f"intra {intra:.3f} !< inter {inter:.3f}"
    q = emb.get_quality_estimate_from_edge_length(100)
    assert 0 <= q < 1.0


@pytest.mark.slow
def test_embedding_scale_hierarchical(rng):
    """Embedding quality at SCALE (the round-4 regression: 65k embed gave
    quality 1.60 — neighbors ended up FARTHER than random pairs).  N here
    exceeds hier_threshold so the hierarchical (landmark-coarsen ->
    coarse-embed -> refine) init path runs, exactly as `ann --embed` does
    at database scale; quality must beat the project's own q < 1 bar and
    clusters must separate."""
    n, s, n_clusters = 35_000, 96, 60
    centers = rng.integers(0, 1 << 30, size=(n_clusters, s)).astype(np.uint32)
    lab = rng.integers(0, n_clusters, n)
    sigs = centers[lab]
    mask = rng.random((n, s)) < 0.08
    sigs = np.where(mask,
                    rng.integers(0, 1 << 30, size=(n, s), dtype=np.uint32),
                    sigs).astype(np.uint32)
    idx = FlatIndex(sketch_size=s, sig_dtype=np.uint32)
    idx.insert(sigs)
    kg = kgraph_from_index(idx, knbn=8)
    emb = Embedder(kg)
    assert n > emb.params.hier_threshold  # the path under test
    y = emb.embed()
    assert np.isfinite(y).all()
    q = emb.get_quality_estimate_from_edge_length(500)
    assert 0 <= q < 1.0, f"embed quality {q:.3f} fails the q < 1 bar"
    pairs = rng.integers(0, n, (2, 20_000))
    d = np.linalg.norm(y[pairs[0]] - y[pairs[1]], axis=1)
    same = lab[pairs[0]] == lab[pairs[1]]
    assert same.any() and (~same).any()
    intra, inter = d[same].mean(), d[~same].mean()
    assert intra < 0.5 * inter, f"intra {intra:.3f} !< 0.5*inter {inter:.3f}"


def test_ann_workflow(tmp_path, clustered_index):
    from gsearch_tpu.analysis.embed import get_graph_stats_embed
    from gsearch_tpu.core import (HnswParams, ProcessingParams, SeqDict,
                                   SeqSketcherParams)
    from gsearch_tpu.core.seqdict import Id, ItemDict
    from gsearch_tpu.index.serialize import dumpall

    idx, _ = clustered_index
    seqdict = SeqDict([
        ItemDict(id=Id(path=f"g{i}.fna", fasta_id=f"g{i}"), len=1000)
        for i in range(idx.nb_points)
    ])
    params = ProcessingParams(
        hnsw=HnswParams(),
        sketch=SeqSketcherParams(kmer_size=16, sketch_size=idx.sketch_size,
                                 algo="OPTDENS", data_t="DNA"),
        block_flag=True,
    )
    dumpall(str(tmp_path), idx, seqdict, params)
    res = get_graph_stats_embed(str(tmp_path), ask_stats=True, embed=True,
                                out_dir=str(tmp_path))
    assert "hubness" in res["summary"]
    assert (tmp_path / "database_embedded.csv").exists()
    rows = open(tmp_path / "database_embedded.csv").read().strip().splitlines()
    assert len(rows) == idx.nb_points
