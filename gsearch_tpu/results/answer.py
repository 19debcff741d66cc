"""Request answer writer — byte-format parity with the reference.

(reference: src/answer.rs:35-76 — `gsearch.neighbors.txt` carries, per
request with at least one sub-threshold neighbor, a header line
"rank\tpath\tfasta_id:\t<id>\tlength:\t<len>" followed by one line per
neighbor "query_id:\t<path>\tdistance:\t<x.xxxxxE?>\tanswer_fasta_path\t<p>\t
<fasta_id> \t answer_seq_len:\t <len>".  reformat consumes the
"query_id:"-prefixed lines, src/bin/reformat.rs:45.)
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, TextIO

from ..core.seqdict import ItemDict, SeqDict


def _rust_upper_exp(x: float, precision: int = 5) -> str:
    """Format like Rust's {:.5E}: e.g. 1.23450E-2 (no zero-padded exponent)."""
    s = f"{x:.{precision}E}"
    mant, exp = s.split("E")
    sign = "-" if exp.startswith("-") else ""
    digits = exp.lstrip("+-").lstrip("0") or "0"
    return f"{mant}E{sign}{digits}"


@dataclasses.dataclass
class Neighbour:
    d_id: int
    distance: float


@dataclasses.dataclass
class ReqAnswer:
    rank: int
    req_item: ItemDict
    neighbours: List[Neighbour]

    def dump(self, seqdict: SeqDict, threshold: float, out: TextIO) -> int:
        nb_match = 0
        has_match = any(n.distance <= threshold for n in self.neighbours)
        if not has_match:
            return 0
        out.write(
            f"\n{self.rank}\t{self.req_item.id.path}\tfasta_id:\t"
            f"{self.req_item.id.fasta_id}\tlength:\t{self.req_item.len}"
        )
        for n in self.neighbours:
            if n.distance < threshold:
                nb_match += 1
                item = seqdict[n.d_id]
                out.write(
                    f"\nquery_id:\t{self.req_item.id.path}\tdistance:\t"
                    f"{_rust_upper_exp(n.distance)}\tanswer_fasta_path\t{item.id.path}\t"
                    f"{item.id.fasta_id} \t answer_seq_len:\t {item.len}"
                )
        return nb_match


def write_answers(
    answers: Sequence[ReqAnswer], seqdict: SeqDict, threshold: float, out: TextIO
) -> int:
    total = 0
    for a in answers:
        total += a.dump(seqdict, threshold, out)
    return total
