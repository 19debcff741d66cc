"""Multi-chip sharding on the 8-device virtual CPU mesh (see conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsearch_tpu.parallel.mesh import (
    make_device_mesh,
    shard_database,
    sharded_knn,
    sharded_sketch_and_knn_step,
)


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_sharded_knn_matches_single(rng):
    n, s, q, k = 1024, 128, 16, 10
    db = rng.integers(0, 64, size=(n, s)).astype(np.uint32)
    queries = db[rng.choice(n, q, replace=False)]

    mesh = make_device_mesh(8)
    search = sharded_knn(mesh, s_total=s, knbn=k)
    db_sharded = shard_database(db, mesh)
    d, ids = search(db_sharded, jnp.asarray(queries))
    d, ids = np.asarray(d), np.asarray(ids)

    # oracle: single-device exact
    from gsearch_tpu.ops.distance import brute_force_knn

    d0, ids0 = brute_force_knn(jnp.asarray(queries), jnp.asarray(db), k, impl="xla")
    np.testing.assert_allclose(d, np.asarray(d0), atol=1e-6)
    # ids may differ among equal distances; distances must match exactly
    assert (d[:, 0] == 0).all()


def test_sharded_knn_2d_mesh(rng):
    """2-D mesh: rows shard over 'd', sketch slots over 's'."""
    n, s, q, k = 512, 64, 8, 5
    db = rng.integers(0, 64, size=(n, s)).astype(np.uint32)
    queries = db[:q].copy()
    mesh = make_device_mesh(8, two_d=True)
    assert mesh.axis_names == ("d", "s")
    search = sharded_knn(mesh, s_total=s, knbn=k)
    db_sharded = shard_database(db, mesh)
    d, ids = search(db_sharded, jnp.asarray(queries))
    d, ids = np.asarray(d), np.asarray(ids)
    assert (ids[:, 0] == np.arange(q)).all()
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-6)


def test_sharded_sketch_and_knn_step(rng):
    """The full dp-sketch + sharded-search training step, 8 virtual chips."""
    from gsearch_tpu.core.params import DataType, SeqSketcherParams, SketchAlgo
    from gsearch_tpu.models import make_sketcher

    s = 256
    params = SeqSketcherParams(kmer_size=12, sketch_size=s, algo=SketchAlgo.OPTDENS,
                               data_t=DataType.DNA)
    sk = make_sketcher(params)

    mesh = make_device_mesh(8)
    block_len = 4096
    batch = 16  # 2 genomes per chip
    codes = rng.integers(0, 4, size=(batch, block_len)).astype(np.uint8)

    n = 256
    db = rng.integers(0, 1 << 30, size=(n, s)).astype(np.uint32)
    # make db rows 0..batch-1 equal to the batch's own signatures
    sigs_expected = sk.sketch_many(list(codes))
    db[:batch] = sigs_expected.view(np.uint32)

    step = sharded_sketch_and_knn_step(mesh, sk, block_len, knbn=3)
    from jax.sharding import NamedSharding, PartitionSpec as P

    codes_sharded = jax.device_put(codes, NamedSharding(mesh, P("d", None)))
    db_sharded = jax.device_put(db, NamedSharding(mesh, P("d", None)))
    sigs, d, ids = step(codes_sharded, db_sharded)
    sigs, d, ids = np.asarray(sigs), np.asarray(d), np.asarray(ids)

    # dp-sharded sketching == host-loop sketching
    np.testing.assert_array_equal(sigs.view(np.uint32), sigs_expected.view(np.uint32))
    # each fresh signature's nearest db row is its own planted copy
    assert (ids[:, 0] == np.arange(batch)).all()
    np.testing.assert_allclose(d[:, 0], 0.0, atol=1e-6)
