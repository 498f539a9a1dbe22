"""Wave 179: impact ordering + disk scheduling — vs direct replay and
policy optimality relations."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestImpactOrdering:
    def test_matches_direct_simulation(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DFR_QUERY,
            IMPACT_BUDGET,
            IMPACT_LEVELS,
            _engine,
            q_impact_ordering,
            round_half_away,
        )

        eng = _engine(sf_tiny)
        terms = DFR_QUERY.split()
        posts = eng._lookup(terms)
        weights = eng._bm25_weights(
            {t: posts[t] for t in terms if t in posts}, {t: 1 for t in terms}
        )
        rows = []
        for t in terms:
            if t not in posts:
                continue
            wm = np.rint(round_half_away(weights[t], 6) * 1e6).astype(np.int64)
            for d, w in zip(posts[t].doc_ids, wm):
                rows.append((t, int(d), int(w)))
        wmax = max(r[2] for r in rows)
        quant = sorted(
            ((t, d, w * IMPACT_LEVELS // (wmax + 1)) for t, d, w in rows),
            key=lambda r: (-r[2], r[0], r[1]),
        )
        scores = {}
        for _, d, q in quant[:IMPACT_BUDGET]:
            scores[d] = scores.get(d, 0) + q
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = q_impact_ordering(sf_tiny)
        assert list(got["doc_id"]) == [d for d, _ in want]
        assert list(got["impact_score"]) == [s for _, s in want]
        assert got["total_postings"].iloc[0] == len(quant)

    def test_budget_damage_bounded(self, ray_session, sf_small):
        """At a generous budget the impact-ordered top-10 should still
        recover most of the exact BM25 top-10."""
        from searchengine_ray.pipelines.queries import q_impact_ordering

        got = q_impact_ordering(sf_small)
        assert got["overlap_with_exact"].iloc[0] >= 4
        assert (np.diff(got["impact_score"].to_numpy()) <= 0).all()


class TestDiskScheduling:
    def test_matches_sequential_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DISK_HEAD0,
            DISK_N,
            q_disk_scheduling,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_id", "value"])
        ev = ev.sort_values(["ts", "event_id"]).head(DISK_N)
        cyl = (np.rint(ev["value"].to_numpy() * 100).astype(np.int64) % 1000)
        fcfs = abs(DISK_HEAD0 - cyl[0]) + int(np.abs(np.diff(cyl)).sum())
        mx, mn = int(cyl.max()), int(cyl.min())
        if mn >= DISK_HEAD0:
            scan = mx - DISK_HEAD0
        else:
            scan = max(mx - DISK_HEAD0, 0) + (max(mx, DISK_HEAD0) - mn)
        pos, sstf = DISK_HEAD0, 0
        left = sorted(set(cyl.tolist()))
        while left:
            best = min(left, key=lambda c: (abs(c - pos), c))
            sstf += abs(best - pos)
            pos = best
            left.remove(best)
        got = q_disk_scheduling(sf_tiny).set_index("policy")
        assert got.loc["fcfs", "total_seek"] == fcfs
        assert got.loc["scan", "total_seek"] == scan
        assert got.loc["sstf", "total_seek"] == sstf

    def test_policy_ordering(self, ray_session, sf_tiny):
        """SCAN and SSTF both bound FCFS from below on any trace with
        repeats; SSTF ≥ the one-way span (it must at least cover the
        range)."""
        from searchengine_ray.pipelines.queries import q_disk_scheduling

        got = q_disk_scheduling(sf_tiny).set_index("policy")
        assert got.loc["scan", "total_seek"] <= got.loc["fcfs", "total_seek"]
        assert got.loc["sstf", "total_seek"] <= got.loc["fcfs", "total_seek"]
