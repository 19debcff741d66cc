"""Directory traversal selecting FASTA files by suffix.

Capability-equivalent of the reference's walker
(reference: src/utils/files.rs:117-217 — `is_fasta_dna_file` accepts
.fna/.fa/.fasta x {plain,.gz,.xz,.bz2}; `is_fasta_aa_file` accepts .faa
variants; `process_dir` recurses and stamps a global file rank).

Also provides grouped iteration for parallel ingest: groups of `group_size`
files are slurped (IO-bound) by a thread pool and decoded in order, the
analog of `--pio` / `process_files_group` (files.rs:258-341).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Tuple

_COMP = ("", ".gz", ".xz", ".bz2", ".zst", ".zstd")
_DNA_SUFFIXES = tuple(b + c for b in (".fna", ".fa", ".fasta") for c in _COMP)
_AA_SUFFIXES = tuple(b + c for b in (".faa",) for c in _COMP)


def is_fasta_dna_file(name: str) -> bool:
    return name.endswith(_DNA_SUFFIXES)


def is_fasta_aa_file(name: str) -> bool:
    return name.endswith(_AA_SUFFIXES)


def walk_fasta_dir(root: str, is_aa: bool = False) -> List[str]:
    """Recursive, deterministic (sorted) list of FASTA paths under root."""
    pred = is_fasta_aa_file if is_aa else is_fasta_dna_file
    found: List[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for name in sorted(filenames):
            if pred(name):
                found.append(os.path.join(dirpath, name))
    return found


def bounded_thread_map(fn, items, workers: int, window: int = 0):
    """Ordered thread map with a bounded in-flight window.

    ThreadPoolExecutor.map submits every item up front — unbounded memory
    when items expand into whole parsed genomes; this keeps at most
    `window` futures alive.  The worker role matches the reference's
    rayon par_iter over a file group (files.rs:258-341) with nb_threads
    workers."""
    from collections import deque

    window = window or 2 * workers
    with ThreadPoolExecutor(max_workers=workers) as pool:
        q: deque = deque()
        for x in items:
            q.append(pool.submit(fn, x))
            while len(q) >= window:
                yield q.popleft().result()
        while q:
            yield q.popleft().result()


def iter_file_buffers(
    paths: List[str], group_size: int = 0
) -> Iterator[Tuple[int, str, bytes]]:
    """Yield (filerank, path, raw-or-decompressed bytes) in path order.

    group_size > 0 enables grouped parallel slurping+decompression
    (the reference's --pio, files.rs:258-341); 0 reads serially.
    """
    from .fasta import read_file_bytes

    if group_size <= 1:
        for i, p in enumerate(paths):
            yield i, p, read_file_bytes(p)
        return
    with ThreadPoolExecutor(max_workers=min(group_size, 32)) as pool:
        for start in range(0, len(paths), group_size):
            group = paths[start : start + group_size]
            for off, data in enumerate(pool.map(read_file_bytes, group)):
                yield start + off, group[off], data
