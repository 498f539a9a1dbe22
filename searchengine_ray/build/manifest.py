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
    # on-disk placement scheme for salted subsets: 2 = golden-ratio
    # stride (stages/postings.py:salt_shard). Scheme 1 (crc32 of
    # "term#salt") indexes predate this field; probing them with the
    # stride scheme would silently miss salted-head-term postings, so
    # load() refuses such indexes instead of returning wrong results.
    salt_scheme: int = 2

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
        if "salt_scheme" not in data:
            # pre-scheme-field index: placement only matters when head
            # terms were actually salted — an unsalted index loads fine
            # under any scheme, a salted one cannot be probed correctly.
            if m.salted_terms:
                raise ValueError(
                    f"index at {index_dir} was built with the legacy salted-shard "
                    "placement (no salt_scheme in manifest) and has salted terms; "
                    "rebuild or compact it with the current build before querying"
                )
            m.salt_scheme = 2
        elif m.salt_scheme != 2 and m.salted_terms:
            raise ValueError(
                f"index at {index_dir} uses salt_scheme={m.salt_scheme}; this "
                "build only reads scheme 2 (golden-ratio stride) salted layouts"
            )
        return m

    @classmethod
    def exists(cls, index_dir: str | Path) -> bool:
        return (Path(index_dir) / MANIFEST_NAME).exists()

    # --- phase checkpoints ---

    def phase_complete(self, name: str) -> bool:
        return bool(self.phases.get(name, {}).get("completed"))

    def record_phase(self, name: str, **stats: Any) -> None:
        self.phases[name] = {"completed": True, "finished_at": time.time(), **stats}
