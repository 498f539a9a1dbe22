"""Wave 167: Wander Join + greedy view selection — vs direct
recomputation and the estimators' defining properties."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


class TestWanderJoin:
    def test_unbiasedness_identity(self, ray_session, sf_tiny):
        """Averaging HT estimates over ALL (order, line) walk choices
        — not a sample — must give the exact sum: Σ_o Σ_l n·f(o)·x /
        (n·f(o)) = Σ x. Verified with the entry's own cent units."""
        line = pd.read_parquet(
            f"{sf_tiny}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice"],
        )
        orders = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_orderkey"])
        n = len(orders)
        cents = np.rint(line["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        # full enumeration: Σ over orders of (1/n)·Σ_l (1/f)·n·f·x = Σ x
        exact = int(cents.sum())
        per_order = line.assign(c=cents).groupby("l_orderkey")["c"].agg(["sum", "size"])
        full_avg = sum(
            (row["sum"] / row["size"]) * row["size"] for _, row in per_order.iterrows()
        )
        assert abs(full_avg - exact) < 1e-6

    def test_estimate_within_sampling_error(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wander_join

        got = q_wander_join(sf_tiny)
        assert abs(got["rel_err"].iloc[0]) < 0.25  # 1000 walks, heavy-ish tail
        assert got["nonzero_walks"].iloc[0] <= got["n_walks"].iloc[0]
        # the estimator mean must be within 5 sigma-ish of truth; also
        # check exact ground truth against pandas
        line = pd.read_parquet(f"{sf_tiny}/lineitem.parquet", columns=["l_extendedprice"])
        exact = int(np.rint(line["l_extendedprice"].to_numpy() * 100).sum())
        assert got["exact_cents"].iloc[0] == exact

    def test_empty_orders_contribute_zero(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wander_join

        got = q_wander_join(sf_tiny)
        orders = pd.read_parquet(f"{sf_tiny}/orders.parquet", columns=["o_orderkey"])
        line = pd.read_parquet(f"{sf_tiny}/lineitem.parquet", columns=["l_orderkey"])
        frac_empty = 1 - line["l_orderkey"].nunique() / len(orders)
        # nonzero share should roughly track the non-empty order share
        nz = got["nonzero_walks"].iloc[0] / got["n_walks"].iloc[0]
        assert abs(nz - (1 - frac_empty)) < 0.1


class TestViewSelection:
    def _sizes(self, sf_dir):
        ev = pd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id"])
        base = pd.DataFrame(
            {
                "t": ev["event_type"],
                "d": ev["ts"].astype("int64") // 86_400_000_000,
                "u": ev["user_id"] % 10,
            }
        )
        cols = {"tdu": ["t", "d", "u"], "td": ["t", "d"], "tu": ["t", "u"],
                "du": ["d", "u"], "t": ["t"], "d": ["d"], "u": ["u"]}
        size = {v: base.groupby(c).ngroups for v, c in cols.items()}
        size["none"] = 1
        return size, cols

    def test_greedy_matches_direct(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_view_selection

        size, cols = self._sizes(sf_tiny)
        cols["none"] = []
        names = sorted(size)

        def cost(mat):
            return sum(
                min(size[a] for a in mat if set(cols[q]) <= set(cols[a]))
                for q in names
            )

        mat = {"tdu"}
        picks = []
        for _ in range(3):
            cur = cost(mat)
            best = None
            for v in sorted(names):
                if v in mat:
                    continue
                ben = cur - cost(mat | {v})
                if best is None or ben > best[0]:
                    best = (ben, v)
            mat.add(best[1])
            picks.append((best[1], best[0], cost(mat)))
        got = q_view_selection(sf_tiny)
        for r, (v, ben, after) in zip(got.itertuples(), picks):
            assert r.view == v and r.benefit == ben and r.total_cost_after == after

    def test_greedy_guarantee_on_this_instance(self, ray_session, sf_tiny):
        """The greedy total benefit must reach ≥ (1−1/e) of the best
        3-subset's benefit (Harinarayan et al. Thm) — exhaustively
        checkable on 7 candidates."""
        from searchengine_ray.pipelines.queries import q_view_selection

        size, cols = self._sizes(sf_tiny)
        cols["none"] = []
        names = sorted(size)

        def cost(mat):
            return sum(
                min(size[a] for a in mat if set(cols[q]) <= set(cols[a]))
                for q in names
            )

        base = cost({"tdu"})
        best = 0
        for combo in itertools.combinations([v for v in names if v != "tdu"], 3):
            best = max(best, base - cost({"tdu", *combo}))
        got = q_view_selection(sf_tiny)
        greedy_ben = base - got["total_cost_after"].iloc[-1]
        assert greedy_ben >= (1 - 1 / np.e) * best - 1e-9
