"""Index manifest: the JSON replacement for the reference's ``metadata.txt``
(``InvertedIndexManager.java:356-382`` write, ``:147-177`` load) plus
per-partition lineage/checkpoint records (north_rule: resumable from
per-partition checkpoints with lineage + throughput metrics).

The manifest is the only mutable state of an index; posting shards and
docstats files are immutable. Tombstones (delete-by-keyword doc ids,
reference ``InvertedIndexManager.java:677-715``) live here until a
compaction rewrites the shards.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any

MANIFEST_NAME = "manifest.json"


@dataclass
class IndexManifest:
    version: int = 1
    analyzer_mode: str = "punct_porter"
    positional: bool = True
    codec: str = "delta_varbyte"
    block_size: int = 128
    num_shards: int = 16
    doc_id_mode: str = "hash"
    n_docs: int = 0
    total_tokens: int = 0
    avgdl: float = 0.0
    bm25_k1: float = 1.2
    bm25_b: float = 0.75
    tombstones: list[int] = field(default_factory=list)
    phases: dict[str, Any] = field(default_factory=dict)
    generations: list[str] = field(default_factory=lambda: ["postings"])
    # head-term skew: term → n_salts (postings split across that many
    # reducer shards; query engine k-way merges the subsets)
    salted_terms: dict[str, int] = field(default_factory=dict)

    # --- persistence ---

    def save(self, index_dir: str | Path) -> None:
        path = Path(index_dir) / MANIFEST_NAME
        tmp = path.with_suffix(".tmp")
        tmp.write_text(json.dumps(asdict(self), indent=1, sort_keys=True))
        tmp.rename(path)

    @classmethod
    def load(cls, index_dir: str | Path) -> "IndexManifest":
        data = json.loads((Path(index_dir) / MANIFEST_NAME).read_text())
        m = cls()
        for k, v in data.items():
            setattr(m, k, v)
        return m

    @classmethod
    def exists(cls, index_dir: str | Path) -> bool:
        return (Path(index_dir) / MANIFEST_NAME).exists()

    # --- phase checkpoints ---

    def phase_complete(self, name: str) -> bool:
        return bool(self.phases.get(name, {}).get("completed"))

    def record_phase(self, name: str, **stats: Any) -> None:
        self.phases[name] = {"completed": True, "finished_at": time.time(), **stats}
