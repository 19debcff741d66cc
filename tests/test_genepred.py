"""Gene prediction: plant genes with strong codon bias in random DNA and
recover them."""

import numpy as np
import pytest

from gsearch_tpu.models.genepred import (GenePredParams, default_codon_logusage,
                                          predict_genes, _CODON_AA)


def _biased_gene(rng, n_codons: int) -> bytes:
    """A gene using only a subset of codons (strong usage bias)."""
    favored = [c for c, aa in _CODON_AA.items() if aa not in "*" and c[2] in "CG"]
    body = "".join(rng.choice(favored) for _ in range(n_codons))
    return ("ATG" + body + "TAA").encode()


def _biased_params() -> GenePredParams:
    """Codon table matching the generator's bias."""
    usage = np.full(64, 1e-4, dtype=np.float64)
    from gsearch_tpu.models.genepred import _codon_id

    favored = [c for c, aa in _CODON_AA.items() if aa not in "*" and c[2] in "CG"]
    for c in favored:
        usage[_codon_id(c)] = 1.0 / len(favored)
    usage /= usage.sum()
    return GenePredParams(codon_logusage=np.log(usage).astype(np.float32),
                          min_gene_len=90)


def _random_at_rich(rng, n: int) -> bytes:
    """AT-rich noncoding background (distinct from the gene bias)."""
    return bytes(rng.choice(np.frombuffer(b"ATAT" b"GC", dtype=np.uint8), size=n))


def test_recovers_planted_gene():
    rng = np.random.default_rng(0)
    gene = _biased_gene(rng, 120)  # 366 nt
    seq = _random_at_rich(rng, 400) + gene + _random_at_rich(rng, 400)
    genes = predict_genes(seq, _biased_params())
    assert genes, "no genes found"
    # one prediction overlaps the planted gene by >80%
    g0, g1 = 400, 400 + len(gene)
    best = max(genes, key=lambda g: min(g.end, g1) - max(g.start, g0))
    overlap = min(best.end, g1) - max(best.start, g0)
    assert overlap / len(gene) > 0.8, f"overlap {overlap}/{len(gene)}"
    assert best.strand == "+"
    assert len(best.aa) >= 100
    assert "*" not in best.aa


def test_recovers_minus_strand_gene():
    rng = np.random.default_rng(1)
    gene = _biased_gene(rng, 120)
    rc = gene.translate(bytes.maketrans(b"ACGT", b"TGCA"))[::-1]
    seq = _random_at_rich(rng, 300) + rc + _random_at_rich(rng, 300)
    genes = predict_genes(seq, _biased_params())
    assert genes
    g0, g1 = 300, 300 + len(rc)
    best = max(genes, key=lambda g: min(g.end, g1) - max(g.start, g0))
    overlap = min(best.end, g1) - max(best.start, g0)
    assert overlap / len(rc) > 0.8
    assert best.strand == "-"
    # the translated protein starts with M (the planted ATG)
    assert best.aa.startswith("M") or "M" in best.aa[:5]


def test_no_genes_in_pure_noise():
    rng = np.random.default_rng(2)
    seq = _random_at_rich(rng, 1500)
    genes = predict_genes(seq, _biased_params())
    total = sum(g.end - g.start for g in genes)
    assert total < 300, f"called {total}nt of genes in noise"


def test_cli_outputs(tmp_path):
    from gsearch_tpu.cli.genepred import run_genepred

    rng = np.random.default_rng(3)
    gene = _biased_gene(rng, 110)
    seq = _random_at_rich(rng, 200) + gene + _random_at_rich(rng, 200)
    f = tmp_path / "contig.fna"
    f.write_bytes(b">contig1\n" + seq + b"\n")
    # default (uniform) codon model with standard starts/stops still finds
    # the ORF thanks to start/stop bonuses and stop-free interior
    n = run_genepred(str(f), str(tmp_path / "pred"))
    for ext in (".faa", ".ffn", ".gff", ".out"):
        assert (tmp_path / ("pred" + ext)).exists()
    if n:
        faa = (tmp_path / "pred.faa").read_text()
        assert faa.startswith(">contig1_")
