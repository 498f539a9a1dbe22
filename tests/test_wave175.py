"""Wave 175: Dremel levels + conflict serializability — vs direct
reassembly / op-pair brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestDremelLevels:
    def test_stripe_unit_cases(self):
        from searchengine_ray.pipelines.queries import _dremel_stripe

        assert _dremel_stripe("a b. c") == [(0, 2), (2, 2), (1, 2)]
        assert _dremel_stripe("") == [(0, 1)]
        assert _dremel_stripe(".x") == [(0, 1), (1, 2)]
        assert _dremel_stripe("x.") == [(0, 2), (1, 1)]
        assert _dremel_stripe("a b c") == [(0, 2), (2, 2), (2, 2)]

    def test_roundtrip_reassembly(self, ray_session, sf_tiny):
        """Decode the level stream back into counts: values with r=0
        start docs, r≤1 start sentences — the decoded structure must
        match a direct parse."""
        import re

        from searchengine_ray.pipelines.queries import _dremel_stripe, q_dremel_levels

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text", "source"])
        want = {}
        n_sent = 0
        for t, s in zip(docs["text"], docs["source"]):
            for r, d in _dremel_stripe(t):
                want[(s, r, d)] = want.get((s, r, d), 0) + 1
                n_sent += r <= 1 and d >= 1
        got = q_dremel_levels(sf_tiny)
        assert dict(
            zip(zip(got["source"], got["r"], got["d"]), got["n_values"])
        ) == want
        assert got["n_docs"].iloc[0] == len(docs)
        assert got["n_sentences"].iloc[0] == n_sent
        # every word in the corpus appears exactly once in the stripe
        n_words = sum(
            len([w for w in re.split(r"\s+", sent) if w])
            for t in docs["text"]
            for sent in t.split(".")
        )
        assert got.loc[got["d"] == 2, "n_values"].sum() == n_words


class TestConflictSerializable:
    def test_matches_op_pair_bruteforce(self, ray_session, sf_tiny):
        """Edges from the first/last aggregate trick must equal edges
        from the O(n²) conflicting-op-pair definition."""
        from searchengine_ray.pipelines.queries import CS_TXNS, q_conflict_serializable

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        BASE = 1_704_067_200_000_000
        ev["p"] = (ev["ts"].astype("int64") - BASE) * (1 << 20) + (
            ev["event_id"] % (1 << 20)
        )
        ev["txn"] = ev["user_id"] % CS_TXNS
        ev["wr"] = (np.rint(ev["value"].to_numpy() * 100).astype(np.int64) % 2 == 1)
        edges = set()
        for _, g in ev.groupby("event_type"):
            g = g.sort_values("p")
            rows = list(zip(g["txn"], g["p"], g["wr"]))
            for ai in range(len(rows)):
                for bi in range(ai + 1, len(rows)):
                    ta, pa_, wa = rows[ai]
                    tb, pb, wb = rows[bi]
                    if ta != tb and (wa or wb):
                        edges.add((int(ta), int(tb)))
        got = q_conflict_serializable(sf_tiny)
        assert got["n_edges"].iloc[0] == len(edges)
        out_deg = {t: 0 for t in range(CS_TXNS)}
        in_deg = {t: 0 for t in range(CS_TXNS)}
        for i, j in edges:
            out_deg[i] += 1
            in_deg[j] += 1
        for r in got.itertuples():
            assert r.out_deg == out_deg[r.txn]
            assert r.in_deg == in_deg[r.txn]
        # cycle ground truth via DFS closure
        import itertools

        reach = {t: {j for i, j in edges if i == t} for t in range(CS_TXNS)}
        for _ in range(CS_TXNS):
            for t in range(CS_TXNS):
                reach[t] |= set(
                    itertools.chain.from_iterable(reach[x] for x in reach[t])
                )
        for r in got.itertuples():
            assert r.cyclic == (1 if r.txn in reach[r.txn] else 0)
        assert got["serializable"].iloc[0] == (
            0 if any(t in reach[t] for t in range(CS_TXNS)) else 1
        )

    def test_dense_schedule_is_cyclic(self, ray_session, sf_small):
        """With 16 hot txns hitting 5 shared items for a month, the
        schedule cannot be conflict-serializable."""
        from searchengine_ray.pipelines.queries import q_conflict_serializable

        got = q_conflict_serializable(sf_small)
        assert got["serializable"].iloc[0] == 0
        assert got["cyclic"].sum() > 0
