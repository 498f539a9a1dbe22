"""Wave 174: UCB1 replay + gradient-boosted stumps — vs direct
sequential/moment recomputation."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestUcbReplay:
    def test_matches_sequential_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ucb_replay

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
        daily = ev.groupby(["day", "event_type"]).size().reset_index(name="c")
        arms = sorted(daily["event_type"].unique())
        piv = daily.pivot_table(index="day", columns="event_type", values="c",
                                fill_value=0).sort_index()
        winners = np.argmax(piv[arms].to_numpy(np.int64), axis=1)
        A = len(arms)
        pulls = np.zeros(A, np.int64)
        wins = np.zeros(A, np.int64)
        for t, w in enumerate(winners, 1):
            cold = np.flatnonzero(pulls == 0)
            if len(cold):
                arm = int(cold[0])
            else:
                ucb = wins / pulls + np.sqrt(2 * np.log(t) / pulls)
                arm = int(np.argmax(ucb))
            pulls[arm] += 1
            wins[arm] += int(arm == w)
        got = q_ucb_replay(sf_tiny).set_index("arm")
        for i, a in enumerate(arms):
            assert got.loc[a, "pulls"] == pulls[i]
            assert got.loc[a, "wins"] == wins[i]
        assert got["total_reward"].iloc[0] == wins.sum()

    def test_ucb_explores_then_concentrates(self, ray_session, sf_small):
        """Every arm gets pulled at least once (cold start), and
        pulls sum to the day count."""
        from searchengine_ray.pipelines.queries import q_ucb_replay

        got = q_ucb_replay(sf_small)
        assert (got["pulls"] >= 1).all()
        assert got["pulls"].sum() == got["n_days"].iloc[0]
        assert got["wins"].sum() == got["total_reward"].iloc[0]


class TestGbmStumps:
    def test_matches_row_level_boosting(self, ray_session, sf_tiny):
        """Replay the boosting on RAW ROWS (not hour moments) — the
        per-hour moment algebra must give identical splits, leaves
        and SSEs."""
        from searchengine_ray.pipelines.queries import GBM_LR_DIV, q_gbm_stumps

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "value"])
        x = (ev["ts"].astype("int64") // 3_600_000_000 % 24).to_numpy(np.int64)
        y = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
        n = len(y)
        pred = np.full(n, int(y.sum()) // n, np.int64)

        def tdiv(v, d):
            return (abs(v) // d) * (1 if v >= 0 else -1)

        got = q_gbm_stumps(sf_tiny)
        for rnd in (1, 2):
            r = y - pred
            sse_before = int((r.astype(object) ** 2).sum())
            best = None
            for t in range(23):
                m = x <= t
                nl, nr = int(m.sum()), int((~m).sum())
                if nl == 0 or nr == 0:
                    continue
                a, b = int(r[m].sum()), int(r[~m].sum())
                score = a * a // nl + b * b // nr
                key = (-score, t)
                if best is None or key < best[0]:
                    best = (key, t, a, b, nl, nr)
            _, t, a, b, nl, nr = best
            ll = tdiv(tdiv(a, nl), GBM_LR_DIV)
            lr = tdiv(tdiv(b, nr), GBM_LR_DIV)
            row = got[got["round"] == rnd].iloc[0]
            assert row["threshold_hour"] == t
            assert (row["n_left"], row["n_right"]) == (nl, nr)
            assert (row["leaf_left"], row["leaf_right"]) == (ll, lr)
            assert row["sse_before_scaled"] == sse_before // 1_000_000
            pred = pred + np.where(x <= t, ll, lr)
            sse_after = int(((y - pred).astype(object) ** 2).sum())
            assert row["sse_after_scaled"] == sse_after // 1_000_000

    def test_boosting_descends(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_gbm_stumps

        got = q_gbm_stumps(sf_tiny).sort_values("round")
        assert (got["sse_after_scaled"] <= got["sse_before_scaled"]).all()
        # round 2 starts where round 1 ended
        assert (
            got["sse_before_scaled"].iloc[1] == got["sse_after_scaled"].iloc[0]
        )
