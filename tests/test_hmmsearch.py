"""Profile-HMM search (hmmsearch_rs role, reference README.md:353-374)."""

import math
import textwrap

import numpy as np
import pytest

from gsearch_tpu.models.hmmprofile import (
    BG_FREQ, HMM_ALPHABET, HmmSearcher, parse_hmmer3)


def _write_motif_hmm(path, motif: str, name="TestMotif", ga=10.0):
    """A HMMER3/f profile strongly matching `motif` (0.9 on the motif
    residue, background elsewhere), realistic transitions."""
    L = len(motif)
    lines = [
        "HMMER3/f [3.3 | Nov 2019]",
        f"NAME  {name}",
        "ACC   TM00001.1",
        "DESC  synthetic test motif",
        f"LENG  {L}",
        "ALPH  amino",
        f"GA    {ga:.2f} {ga:.2f}",
        "STATS LOCAL VITERBI  -9.0000  0.70000",
        "HMM          " + "        ".join(HMM_ALPHABET),
        "            m->m     m->i     m->d     i->m     i->i     d->m     d->d",
    ]
    bg = [f"{-math.log(f):.5f}" for f in BG_FREQ]
    # node 0: insert emissions + transitions
    lines.append("          " + "  ".join(bg))
    t0 = [0.02, 4.0, 4.0, 0.02, 4.0, 0.02, 4.0]
    lines.append("          " + "  ".join(f"{v:.5f}" for v in t0))
    for k, aa in enumerate(motif, start=1):
        em = []
        hit = HMM_ALPHABET.index(aa)
        for i, f in enumerate(BG_FREQ):
            p = 0.9 if i == hit else 0.1 * f / (1.0 - BG_FREQ[hit])
            em.append(f"{-math.log(p):.5f}")
        lines.append(f"  {k}   " + "  ".join(em) + f"  {k} - - - -")
        lines.append("          " + "  ".join(bg))  # insert emissions
        lines.append("          " + "  ".join(f"{v:.5f}" for v in t0))
    lines.append("//")
    path.write_text("\n".join(lines) + "\n")


def test_parse_and_score_planted_motif(tmp_path, rng):
    motif = "WCHWMYWCHW"  # rare residues: big log-odds when matched
    f = tmp_path / "motif.hmm"
    _write_motif_hmm(f, motif)
    profs = parse_hmmer3(str(f))
    assert len(profs) == 1 and profs[0].length == len(motif)
    assert profs[0].name == "TestMotif"
    assert math.isclose(profs[0].ga, 10.0)

    aas = np.array(list(HMM_ALPHABET))
    background = "".join(rng.choice(aas, 200))
    planted = background[:90] + motif + background[90:]
    decoys = ["".join(rng.choice(aas, 200)) for _ in range(6)]

    searcher = HmmSearcher(profs)
    seqs = [searcher.encode(s) for s in [planted, *decoys]]
    bits = searcher.score(seqs)
    assert bits.shape == (1, 7)
    # the planted motif scores far above every decoy and above GA
    assert bits[0, 0] > profs[0].ga
    assert bits[0, 0] > bits[0, 1:].max() + 10
    ev = searcher.evalues(bits, n_targets=7)
    assert ev[0, 0] < 1e-3


def test_multi_profile_batch(tmp_path, rng):
    m1, m2 = "WWCHWW", "YMYHMY"
    f1, f2 = tmp_path / "a.hmm", tmp_path / "b.hmm"
    _write_motif_hmm(f1, m1, name="A")
    _write_motif_hmm(f2, m2, name="B")
    profs = parse_hmmer3(str(f1)) + parse_hmmer3(str(f2))
    searcher = HmmSearcher(profs)

    aas = np.array(list(HMM_ALPHABET))
    s1 = "".join(rng.choice(aas, 50)) + m1 + "".join(rng.choice(aas, 30))
    s2 = "".join(rng.choice(aas, 80)) + m2
    bits = searcher.score([searcher.encode(s) for s in (s1, s2)])
    # each sequence hits its own profile hardest
    assert bits[0, 0] > bits[0, 1] + 5
    assert bits[1, 1] > bits[1, 0] + 5


def test_cli_tsv_output(tmp_path, rng):
    from gsearch_tpu.cli.hmmsearch import run_hmmsearch

    motif = "WCHWMYWCHW"
    hmmf = tmp_path / "m.hmm"
    # GA sits between the decoy's Forward score (~13 bits: a short profile
    # on a 120-residue random sequence gains ~log2(#alignments) over its
    # Viterbi ~4.5) and the hit's (~56 bits) — the CLI applies GA to the
    # Forward score, as real hmmsearch does
    _write_motif_hmm(hmmf, motif, ga=25.0)
    aas = np.array(list(HMM_ALPHABET))
    faa = tmp_path / "p.faa"
    rec1 = "".join(rng.choice(aas, 60)) + motif
    rec2 = "".join(rng.choice(aas, 120))
    faa.write_text(f">hit_protein\n{rec1}\n>decoy\n{rec2}\n")
    out = tmp_path / "o.tsv"
    assert run_hmmsearch(str(faa), str(hmmf), str(out), cut_ga=True) == 0
    body = out.read_text().strip().splitlines()
    assert body[0].startswith("# seq_name")
    rows = [l.split("\t") for l in body[1:]]
    assert [r[0] for r in rows] == ["hit_protein"]  # decoy filtered by GA
    assert rows[0][1] == "TestMotif" and rows[0][6] == "1"
    # forward bits (col 3) >= viterbi bits (col 4): sum over alignments
    assert float(rows[0][3]) >= float(rows[0][4]) - 1e-3


def test_forward_ge_viterbi(tmp_path, rng):
    """Forward sums over alignments, so it must dominate Viterbi for every
    (profile, sequence) pair."""
    from gsearch_tpu.models.hmmprofile import HmmSearcher, parse_hmmer3

    motif = "WCHWMYWCHW"
    hmmf = tmp_path / "m.hmm"
    _write_motif_hmm(hmmf, motif)
    profs = parse_hmmer3(str(hmmf))
    aas = np.array(list(HMM_ALPHABET))
    seqs = [HmmSearcher.encode("".join(rng.choice(aas, ln)) + tail)
            for ln, tail in ((60, motif), (120, ""), (40, motif + motif))]
    s = HmmSearcher(profs)
    vit = s.score(seqs, algo="viterbi")
    fwd = s.score(seqs, algo="forward")
    assert (fwd >= vit - 1e-3).all()
    # the two-copy sequence gains more from multihit Forward than the
    # single-copy one does
    assert fwd[0, 2] > fwd[0, 0]


def test_universal_gene_level_chain(tmp_path, rng):
    """The reference's third classification level end-to-end
    (README.md:656-660): predict proteomes (FragGeneScan role), extract
    the shared marker gene with hmmsearch --cut_ga against a profile,
    build an AA database over ONLY the markers, and request a diverged
    query — it must resolve to its source genome."""
    from gsearch_tpu.cli.hmmsearch import run_hmmsearch
    from gsearch_tpu.cli.main import main
    from gsearch_tpu.models.genepred import predict_genes
    from tests.test_genepred import (_biased_gene, _biased_params,
                                     _random_at_rich)

    params = _biased_params()
    from gsearch_tpu.models.genepred import _CODON_AA

    favored = [c for c, aa in _CODON_AA.items()
               if aa not in "*" and c[2] in "CG"]

    def codon_mutate(gene: bytes, n_mut: int, r) -> bytes:
        """Mutate interior codons to other favored (never-stop) codons."""
        codons = [gene[i : i + 3].decode() for i in range(0, len(gene), 3)]
        for p in r.choice(np.arange(2, len(codons) - 2), n_mut, replace=False):
            codons[p] = str(r.choice(favored))
        return "".join(codons).encode()

    marker = _biased_gene(rng, 140)  # the shared "universal gene"

    def proteome(seq: bytes) -> bytes:
        genes = predict_genes(seq, params)
        assert genes
        return b"".join(b">g%d\n%s\n" % (i, g.aa.encode())
                        for i, g in enumerate(genes))

    # motif HMM: 30 residues from the middle of the marker's protein
    probe = predict_genes(
        _random_at_rich(rng, 220) + marker + _random_at_rich(rng, 220),
        params)
    marker_aa = max(probe, key=lambda g: len(g.aa)).aa
    motif = marker_aa[40:70]
    hmmf = tmp_path / "marker.hmm"
    _write_motif_hmm(hmmf, motif, name="UniMarker", ga=30.0)

    # four genomes: per-genome marker VARIANT (homologous, distinct) plus a
    # private random gene
    db_dir, q_dir = tmp_path / "faa", tmp_path / "q"
    db_dir.mkdir(), q_dir.mkdir()
    variants = [codon_mutate(marker, 10, rng) for _ in range(4)]

    def write_marker_faa(out_path, genome: bytes):
        full = tmp_path / (out_path.name + ".full")
        full.write_bytes(proteome(genome))
        tsv = tmp_path / (out_path.name + ".tsv")
        assert run_hmmsearch(str(full), str(hmmf), str(tsv), cut_ga=True) == 0
        hits = {l.split("\t")[0] for l in tsv.read_text().splitlines()[1:]}
        assert hits, "hmmsearch found no marker in a genome that has one"
        from gsearch_tpu.io.fasta import parse_fasta
        kept = [r for r in parse_fasta(str(full)) if r.fasta_id in hits]
        out_path.write_bytes(b"".join(
            b">%s\n%s\n" % (r.fasta_id.encode(), r.seq) for r in kept))

    for i, v in enumerate(variants):
        genome = (_random_at_rich(rng, 260) + v + _random_at_rich(rng, 260)
                  + _biased_gene(rng, 110) + _random_at_rich(rng, 260))
        write_marker_faa(db_dir / f"genome{i}.faa", genome)

    # query: genome2's variant with 2 extra codon mutations
    qv = codon_mutate(variants[2], 2, rng)
    write_marker_faa(q_dir / "query.faa",
                     _random_at_rich(rng, 260) + qv + _random_at_rich(rng, 260))

    out_db = str(tmp_path / "unidb")
    rc = main(["tohnsw", "-d", str(db_dir), "-k", "5", "-s", "512", "-n", "4",
               "--ef", "64", "--algo", "prob", "--aa", "--block", "-o", out_db])
    assert rc == 0
    rc = main(["request", "-b", out_db, "-n", "2", "-r", str(q_dir),
               "-o", str(tmp_path)])
    assert rc == 0
    text = (tmp_path / "gsearch.neighbors.txt").read_text()
    q_lines = [l for l in text.splitlines() if l.startswith("query_id:")]
    assert q_lines and "genome2.faa" in q_lines[0], q_lines[:1]
