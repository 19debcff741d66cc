"""Sequence identity dictionary.

Capability-equivalent of the reference's Id/ItemDict/SeqDict
(reference: src/utils/idsketch.rs:18-294).  The rank of an item in the
SeqDict IS the data id used by the index (idsketch.rs:152-154) — answers are
resolved back to (path, fasta_id, length) through it.

Persisted as `seqdict.json` (a JSON array of {path, fasta_id, len}) with a
CSV export (`seqdict_jsontocsv`, reference: src/utils/dumpload.rs:84-99).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterator, List


@dataclasses.dataclass
class Id:
    """(reference: src/utils/idsketch.rs:18-42)"""

    path: str
    fasta_id: str


@dataclasses.dataclass
class ItemDict:
    """(reference: src/utils/idsketch.rs:130-150)"""

    id: Id
    len: int

    def to_json(self) -> dict:
        return {"path": self.id.path, "fasta_id": self.id.fasta_id, "len": self.len}

    @classmethod
    def from_json(cls, d: dict) -> "ItemDict":
        return cls(id=Id(path=d["path"], fasta_id=d["fasta_id"]), len=int(d["len"]))


class SeqDict:
    """(reference: src/utils/idsketch.rs:155-294)"""

    FILENAME = "seqdict.json"

    def __init__(self, items: List[ItemDict] | None = None):
        self.items: List[ItemDict] = items or []

    def push(self, item: ItemDict) -> int:
        """Append, returning the data id assigned to the item."""
        self.items.append(item)
        return len(self.items) - 1

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, rank: int) -> ItemDict:
        return self.items[rank]

    def __iter__(self) -> Iterator[ItemDict]:
        return iter(self.items)

    def get_nb_entries(self) -> int:
        return len(self.items)

    def dump(self, dirpath: str) -> str:
        path = os.path.join(dirpath, self.FILENAME)
        # streamed array dump: one item per line keeps multi-GB dicts
        # re-loadable without holding a parse tree (idsketch.rs:164-253)
        with open(path, "w") as f:
            f.write("[\n")
            for i, item in enumerate(self.items):
                sep = "," if i + 1 < len(self.items) else ""
                f.write(json.dumps(item.to_json()) + sep + "\n")
            f.write("]\n")
        return path

    @classmethod
    def reload_json(cls, dirpath: str) -> "SeqDict":
        path = os.path.join(dirpath, cls.FILENAME)
        with open(path) as f:
            data = json.load(f)
        return cls([ItemDict.from_json(d) for d in data])

    def dump_csv(self, out_path: str) -> None:
        """(reference: src/utils/idsketch.rs dump_csv; scripts/dictjsontocsv.ipynb)"""
        with open(out_path, "w") as f:
            f.write("rank,path,fasta_id,len\n")
            for rank, item in enumerate(self.items):
                f.write(f"{rank},{item.id.path},{item.id.fasta_id},{item.len}\n")
