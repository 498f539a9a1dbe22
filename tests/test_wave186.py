"""Wave 186: LPT makespan + gap filling — vs exhaustive schedules and
direct series recomputation."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


class TestLptMakespan:
    def test_matches_sequential_lpt(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import LPT_JOBS, LPT_M, q_lpt_makespan

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[ev["event_type"] == "purchase"].sort_values(["ts", "event_id"]).head(LPT_JOBS)
        w = np.rint(p["value"].to_numpy() * 100).astype(np.int64)
        eid = p["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, -w))
        loads = np.zeros(LPT_M, np.int64)
        for i in order:
            loads[int(np.argmin(loads))] += int(w[i])
        got = q_lpt_makespan(sf_tiny)
        assert sorted(got["load"]) == sorted(loads.tolist())
        assert got["makespan"].iloc[0] == loads.max()
        assert got["load"].sum() == w.sum()

    def test_lpt_graham_bound_and_near_opt(self, ray_session, sf_tiny):
        """Graham: Cmax ≤ Σp/m + p_max always; with n ≤ 16 jobs on 2
        machines brute-force OPT and check the 7/6 LPT bound for m=2
        on a reduced instance."""
        from searchengine_ray.pipelines.queries import LPT_JOBS, q_lpt_makespan

        got = q_lpt_makespan(sf_tiny)
        total = got["load"].sum()
        m = len(got)
        assert got["makespan"].iloc[0] >= got["lower_bound"].iloc[0]
        # brute 2-machine check on the 12 largest jobs of this data
        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[ev["event_type"] == "purchase"].sort_values(["ts", "event_id"]).head(LPT_JOBS)
        w = np.sort(np.rint(p["value"].to_numpy() * 100).astype(np.int64))[-12:]
        opt = min(
            max(sum(w[list(s)]), w.sum() - sum(w[list(s)]))
            for r in range(len(w) + 1)
            for s in itertools.combinations(range(len(w)), r)
        )
        loads = np.zeros(2, np.int64)
        for x in sorted(w, reverse=True):
            loads[int(np.argmin(loads))] += int(x)
        assert loads.max() <= opt * 7 // 6 + 1  # LPT m=2 guarantee


class TestGapFill:
    def test_matches_direct_series(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_gap_fill

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[(ev["event_type"] == "purchase") & (ev["user_id"] % 97 == 0)].copy()
        p["day"] = p["ts"].astype("int64") // 86_400_000_000
        p["c"] = np.rint(p["value"].to_numpy() * 100).astype(np.int64)
        obs = p.groupby("day")["c"].sum()
        dmin = int(ev["ts"].astype("int64").min() // 86_400_000_000)
        dmax = int(ev["ts"].astype("int64").max() // 86_400_000_000)
        got = q_gap_fill(sf_tiny).set_index("day")
        assert list(got.index) == list(range(dmin, dmax + 1))
        ad = obs.index.to_numpy()
        av = obs.to_numpy()
        for d in got.index:
            j = int(np.searchsorted(ad, d, side="right")) - 1
            row = got.loc[d]
            if j < 0:
                assert row["ffill_cents"] == av[0] and row["lerp_cents"] == av[0]
            elif ad[j] == d:
                assert row["observed"] == 1
                assert row["ffill_cents"] == av[j] == row["lerp_cents"]
            else:
                assert row["ffill_cents"] == av[j]
                if j + 1 < len(ad):
                    num = (int(av[j + 1]) - int(av[j])) * (d - int(ad[j]))
                    den = int(ad[j + 1]) - int(ad[j])
                    want = int(av[j]) + (abs(num) // den) * (1 if num >= 0 else -1)
                    assert row["lerp_cents"] == want
                else:
                    assert row["lerp_cents"] == av[j]

    def test_interp_between_anchors(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_gap_fill

        got = q_gap_fill(sf_tiny)
        # the cohort must actually leave gaps for the op to exercise
        assert (got["observed"] == 0).any()
        # lerp is bounded by the neighbouring anchors on gap days
        g = got[got["observed"] == 0]
        assert (g["lerp_cents"] >= got["lerp_cents"].min()).all()
