"""Bulk `add` (incremental append) benchmark at reference scale.

Round-2 verdict item 4: the beam-insert `add` path measured ~4,800 s for
262k points; the bulk append path (_bulk_add: exact-kNN MXU sweep of the
new batch against prefix+batch, heuristic links, one reverse merge —
reference role dnasketch.rs:426-436) must take a 32k append into a 262k+
database in well under 90 s.

Reuses the cached signatures/graph of scripts/bench_hnsw.py when present
(HNSW_BENCH_SIG_CACHE / HNSW_BENCH_CACHE) so the 524k corpus doesn't
regenerate; fresh mutant points are appended and recall@10 of queries
targeting the ADDED points is checked against a streamed exact oracle.

Usage: python scripts/bench_add.py [N_BASE] [N_ADD] [S]
Writes ADD_BENCH.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def log(msg):
    print(f"[add-bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 524_288
    n_add = int(sys.argv[2]) if len(sys.argv) > 2 else 32_768
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 12_000
    nq, k = 256, 10

    from gsearch_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from gsearch_tpu.index.hnsw import HnswIndex, _next_pow2, _round_up
    from gsearch_tpu.ops.distance import hamming_frac_pallas

    log(f"backend={jax.default_backend()} base={n_base} add={n_add} s={s}")

    scache = os.environ.get("HNSW_BENCH_SIG_CACHE", "")
    gcache = os.environ.get("HNSW_BENCH_CACHE", "")
    if not (scache and os.path.exists(scache) and gcache
            and os.path.exists(gcache)):
        sys.exit("need HNSW_BENCH_SIG_CACHE + HNSW_BENCH_CACHE from a prior "
                 "scripts/bench_hnsw.py run (the base graph is reused, not "
                 "rebuilt)")
    g = np.load(scache)
    sigs, centers = g["sigs"], g["centers"]
    assert sigs.shape == (n_base, s), sigs.shape
    idx = HnswIndex(sketch_size=s, sig_dtype=np.float32, max_nb_conn=64,
                    ef_construction=256)
    gg = np.load(gcache)
    idx._sigs = sigs
    idx._nbrs, idx._nbr_d, idx._entry_ids = gg["nbrs"], gg["nbr_d"], gg["entries"]
    log(f"reused cached {n_base}-point graph")

    # fresh points: mutants of random centers — same generative process as
    # the base corpus (bench_hnsw.make_clustered_device)
    rng = np.random.default_rng(99)
    cc = rng.integers(0, centers.shape[0], n_add)
    new = centers[cc].astype(np.float32, copy=True)
    mask = rng.random((n_add, s)) < rng.uniform(0.02, 0.45, size=(n_add, 1))
    new[mask] = rng.random(int(mask.sum())).astype(np.float32)

    t0 = time.perf_counter()
    idx.insert(new)  # >= BULK_ADD_MIN: the bulk append path
    t_add = time.perf_counter() - t0
    n_total = n_base + n_add
    assert idx.nb_points == n_total
    log(f"ADD: {t_add:.1f}s for {n_add} points into {n_base} "
        f"({n_add / t_add:.0f}/s)")

    # queries: mutants of ADDED points (the add must make them findable)
    qsrc = rng.integers(n_base, n_total, nq)
    queries = idx._sigs[qsrc].astype(np.float32, copy=True)
    qmask = rng.random((nq, s)) < rng.uniform(0.02, 0.2, size=(nq, 1))
    queries[qmask] = rng.random(int(qmask.sum())).astype(np.float32)

    # streamed exact oracle over all n_total rows (full signatures)
    sp = _round_up(s, 1024)
    q_pad = np.ones((nq, sp), np.uint32)
    q_pad[:, :s] = queries.view(np.uint32)
    q_dev = jnp.asarray(q_pad)
    chunk = 16384

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def stream_chunk(db_rows, q, start, n_live, *, k):
        d = hamming_frac_pallas(q, db_rows)
        d = (d * jnp.float32(sp) - jnp.float32(sp - s)) / jnp.float32(s)
        col = start + jnp.arange(db_rows.shape[0], dtype=jnp.int32)
        d = jnp.where((col < n_live)[None, :], d, jnp.inf)
        neg, ii = jax.lax.top_k(-d, k)
        return -neg, start + ii

    sigs_u = idx._sigs.view(np.uint32)
    best_d = np.full((nq, k), np.inf, np.float32)
    best_i = np.zeros((nq, k), np.int32)
    nrows = _next_pow2(n_total)
    t0 = time.perf_counter()
    for st in range(0, nrows, chunk):
        rows = np.zeros((chunk, sp), np.uint32)
        live = max(min(n_total - st, chunk), 0)
        if live:
            rows[:live, :s] = sigs_u[st : st + live]
        dd, ii = stream_chunk(jnp.asarray(rows), q_dev, jnp.int32(st),
                              jnp.int32(n_total), k=k)
        cd = np.concatenate([best_d, np.asarray(dd)], axis=1)
        ci = np.concatenate([best_i, np.asarray(ii)], axis=1)
        sel = np.argsort(cd, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(cd, sel, axis=1)
        best_i = np.take_along_axis(ci, sel, axis=1)
    log(f"oracle done in {time.perf_counter() - t0:.0f}s")

    t0 = time.perf_counter()
    dd, ids = idx.search(queries, knbn=k, ef_search=64)
    t_first = time.perf_counter() - t0
    rec = float(np.mean([len(set(best_i[i]) & set(ids[i])) / k
                         for i in range(nq)]))
    ta = float(np.mean([
        1.0 - sum(1 for a, b in zip(sorted(dd[i]), sorted(best_d[i]))
                  if a > b + 1e-6) / k for i in range(nq)]))
    log(f"recall@10 {rec:.4f} tie-aware {ta:.4f} (first search {t_first:.1f}s)")

    out = {
        "n_base": n_base, "n_add": n_add, "s": s,
        "add_s": round(t_add, 1), "points_per_s": round(n_add / t_add, 1),
        "recall10_added_queries": round(rec, 4), "tie_aware": round(ta, 4),
        "beam_insert_reference_s": "4802 at 262k (round 2 PERF.md)",
    }
    with open("ADD_BENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    log("wrote ADD_BENCH.json")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
