"""Wave 192: ARC cache + Recordinality — vs the textbook replay and
ghost-list invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestArcCache:
    def test_invariants_on_entry_trace(self, ray_session, sf_small):
        from searchengine_ray.pipelines.queries import (
            ARC_CAP,
            ARC_REQS,
            _arc_replay,
            q_arc_cache,
        )

        ev = pd.read_parquet(f"{sf_small}/events.parquet", columns=["ts", "event_id", "user_id"])
        objs = (
            ev.sort_values(["ts", "event_id"]).head(ARC_REQS)["user_id"].astype(int).tolist()
        )
        hits, ghost, p = _arc_replay(objs, ARC_CAP)
        got = q_arc_cache(sf_small)
        assert got["arc_hits"].iloc[0] == hits
        assert got["ghost_hits"].iloc[0] == ghost
        assert got["final_p"].iloc[0] == p
        assert 0 <= p <= ARC_CAP

    def test_arc_invariants_synthetic(self):
        """ARC list-size invariants on adversarial synthetic traces:
        |T1|+|T2| ≤ c, |T1|+|B1| ≤ c, total ≤ 2c at every step (checked
        by instrumenting the replay)."""
        from searchengine_ray.pipelines.queries import _arc_replay

        rng = np.random.RandomState(11)
        for trial in range(3):
            objs = rng.zipf(1.3, size=600).astype(int).tolist()
            # instrumented re-implementation with assertions
            c = 16
            t1, t2, b1, b2 = [], [], [], []
            p = 0

            def replace(x):
                nonlocal t1, t2, b1, b2
                if t1 and (len(t1) > p or (x in b2 and len(t1) == p)):
                    b1.append(t1.pop(0))
                else:
                    b2.append(t2.pop(0))

            hits = ghost = 0
            for x in objs:
                if x in t1:
                    t1.remove(x)
                    t2.append(x)
                    hits += 1
                elif x in t2:
                    t2.remove(x)
                    t2.append(x)
                    hits += 1
                elif x in b1:
                    ghost += 1
                    p = min(c, p + max(len(b2) // max(len(b1), 1), 1))
                    replace(x)
                    b1.remove(x)
                    t2.append(x)
                elif x in b2:
                    ghost += 1
                    p = max(0, p - max(len(b1) // max(len(b2), 1), 1))
                    replace(x)
                    b2.remove(x)
                    t2.append(x)
                else:
                    if len(t1) + len(b1) == c:
                        if len(t1) < c:
                            b1.pop(0)
                            replace(x)
                        else:
                            t1.pop(0)
                    elif len(t1) + len(b1) < c and len(t1) + len(t2) + len(b1) + len(b2) >= c:
                        if len(t1) + len(t2) + len(b1) + len(b2) == 2 * c:
                            b2.pop(0)
                        replace(x)
                    t1.append(x)
                assert len(t1) + len(t2) <= c
                assert len(t1) + len(b1) <= c
                assert len(t1) + len(t2) + len(b1) + len(b2) <= 2 * c
            wh, wg, wp = _arc_replay(objs, c)
            assert (wh, wg, wp) == (hits, ghost, p)


class TestRecordinality:
    def test_matches_direct_dominance(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            REC_K,
            _md5_low64,
            q_recordinality,
        )

        li = pd.read_parquet(
            f"{sf_tiny}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_partkey"],
        )
        li["fo"] = li["l_orderkey"] * 16 + li["l_linenumber"]
        firsts = li.groupby("l_partkey")["fo"].min().reset_index()
        firsts = firsts.sort_values(["fo", "l_partkey"]).reset_index(drop=True)
        h = np.array(
            [_md5_low64(str(int(k))) % (1 << 62) for k in firsts["l_partkey"]],
            np.int64,
        )
        R = sum(
            int((h[:i] < h[i]).sum()) < REC_K for i in range(len(h))
        )
        got = q_recordinality(sf_tiny)
        assert got["n_records"].iloc[0] == R
        assert got["n_exact"].iloc[0] == len(h)
        est = REC_K * (1 + 1 / REC_K) ** (R - REC_K + 1) - 1
        assert abs(got["estimate_micro"].iloc[0] / 1e6 - est) < 1e-3

    def test_estimator_ballpark(self, ray_session, sf_small):
        """Recordinality is high-variance but should land within an
        order of magnitude of truth for k=4."""
        from searchengine_ray.pipelines.queries import q_recordinality

        got = q_recordinality(sf_small)
        n = got["n_exact"].iloc[0]
        est = got["estimate_micro"].iloc[0] / 1e6
        assert n / 10 < est < n * 10
