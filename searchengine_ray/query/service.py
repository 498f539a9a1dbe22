"""Term-range-sharded query serving (SURVEY.md §3.2 "actors owning
term-range shards").

The default :class:`~searchengine_ray.query.engine.SearchEngine` reads
shard files itself — right single-node, where the page cache is shared.
On a multi-node cluster the shard-table LRU should live WITH the shard:
:class:`ShardedQueryService` spawns ``num_actors`` shard-owner actors,
assigns posting shards round-robin (``shard % num_actors``), and routes
every term lookup to the owner of its ``term_shard`` hash. An actor
only ever touches (and caches) its own shard files — cache locality
scales with the actor count instead of every node caching every shard.

:class:`RoutedSearchEngine` is a drop-in ``SearchEngine`` whose
``_load_terms`` scatter-gathers through the service; every scorer
(boolean / phrase / TF-IDF / BM25 exhaustive / MaxScore / WAND) works
unchanged on top (results asserted identical in tests).
"""

from __future__ import annotations

from pathlib import Path

from .engine import SearchEngine


class _ShardOwner:
    """Actor body: a thin SearchEngine used only for its shard reads +
    shard-table LRU; owns the shards with ``shard % num_actors == rank``."""

    def __init__(self, index_dir: str, rank: int, num_actors: int, warm: bool = True):
        self.engine = SearchEngine(index_dir)
        self.rank = rank
        self.num_actors = num_actors
        if warm:
            # prefetch this owner's shard tables so the first queries
            # don't pay per-shard cold reads (round-3 routed p95 was
            # 10x local at small corpora purely from cold-start fill)
            owned = [
                s
                for s in range(self.engine.manifest.num_shards)
                if s % num_actors == rank
            ]
            self.engine.warm_shards(owned)

    def ready(self):
        """Readiness + SERIALIZATION handshake: the first Arrow-bearing
        return from an actor pays Ray's lazy pyarrow-serializer setup
        (~100-220 ms measured); returning a real table here moves that
        cost out of the first queries' latency (the round-3 routed-p95
        tail was exactly 8 actors × this one-time hit)."""
        import pyarrow as pa

        return pa.table({"ok": pa.array([self.rank], pa.int64())})

    def rows_for_shards(self, plan: dict[int, list[str]], positions: bool) -> list:
        out = []
        for shard, ts in plan.items():
            assert shard % self.num_actors == self.rank, "misrouted shard"
            out.extend(self.engine._rows_for_shard(shard, ts, positions))
        return out


class ShardedQueryService:
    """Pool of shard-owner actors + routing table."""

    def __init__(
        self,
        index_dir: str | Path,
        num_actors: int = 4,
        warm: bool = True,
        block_until_ready: bool = True,
    ):
        import ray

        self.index_dir = str(index_dir)
        self.num_actors = num_actors
        owner = ray.remote(_ShardOwner)
        self.actors = [
            owner.remote(self.index_dir, rank, num_actors, warm)
            for rank in range(num_actors)
        ]
        if block_until_ready:
            ray.get([a.ready.remote() for a in self.actors])

    def fetch(self, plan: dict[int, list[str]], positions: bool) -> list:
        """Scatter the shard plan to owners, gather (gen, term, rows)."""
        import ray

        per_actor: dict[int, dict[int, list[str]]] = {}
        for shard, ts in plan.items():
            per_actor.setdefault(shard % self.num_actors, {})[shard] = ts
        refs = [
            self.actors[rank].rows_for_shards.remote(sub, positions)
            for rank, sub in per_actor.items()
        ]
        out = []
        for part in ray.get(refs):
            out.extend(part)
        return out

    def shutdown(self) -> None:
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []


class RoutedSearchEngine(SearchEngine):
    """SearchEngine whose term lookups go through a ShardedQueryService
    instead of local file reads. Everything above ``_load_terms``
    (caches, scorers, deletes) is inherited unchanged."""

    def __init__(self, index_dir: str | Path, service: ShardedQueryService, **kw):
        super().__init__(index_dir, **kw)
        self.service = service

    def _load_terms(self, terms, positions: bool = False):
        per_term_rows: dict[str, list] = {}
        for gen, t, rows in self.service.fetch(self._shard_plan(terms), positions):
            per_term_rows.setdefault(t, []).append((gen, rows))
        return {
            t: self._assemble_term(t, gen_rows, positions=positions)
            for t, gen_rows in per_term_rows.items()
        }
