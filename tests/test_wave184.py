"""Wave 184: Fellegi-Sunter linkage + Sinkhorn OT — vs direct pair
enumeration and transport-plan properties."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


class TestFellegiSunter:
    def test_matches_pair_enumeration(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_fellegi_sunter

        c = pd.read_parquet(f"{sf_tiny}/customer.parquet")
        key = c["c_custkey"].to_numpy(np.int64)
        name = c["c_name"].to_numpy(object)
        bal = np.rint(c["c_acctbal"].to_numpy() * 100).astype(np.int64)
        seg = c["c_mktsegment"].to_numpy(object)
        nk = c["c_nationkey"].to_numpy(np.int64)
        nameB = np.array([n + "X" if k % 7 == 0 else n for n, k in zip(name, key)], object)
        balB = bal + np.where(key % 5 == 0, 10_000, 0)
        bb = (bal + 100_000) // 10_000
        bbB = (balB + 100_000) // 10_000
        stats = {f: [0, 0, 0, 0] for f in ("name", "balbkt", "seg")}
        pats = {}
        for n_ in np.unique(nk):
            idx = np.flatnonzero(nk == n_)
            for a in idx:
                for b in idx:
                    m = key[a] == key[b]
                    ags = {
                        "name": name[a] == nameB[b],
                        "balbkt": bb[a] == bbB[b],
                        "seg": seg[a] == seg[b],
                    }
                    for f, ag in ags.items():
                        st = stats[f]
                        if m:
                            st[0] += ag
                            st[1] += 1
                        else:
                            st[2] += ag
                            st[3] += 1
                    pat = ags["name"] * 4 + ags["balbkt"] * 2 + ags["seg"]
                    pats[(pat, m)] = pats.get((pat, m), 0) + 1
        got = q_fellegi_sunter(sf_tiny).set_index("field")
        weights = {}
        for f, (am, nm, au, nu) in stats.items():
            m = (am + 1) / (nm + 2)
            u = (au + 1) / (nu + 2)
            assert got.loc[f, "m_micro"] == int(np.rint(round(m, 6) * 1e6))
            wa = int(np.rint(round(math.log2(m / u), 6) * 1e6))
            wd = int(np.rint(round(math.log2((1 - m) / (1 - u)), 6) * 1e6))
            assert got.loc[f, "w_agree_micro"] == wa
            weights[f] = (wa, wd)
        conf = {"tp": 0, "fp": 0, "fn": 0, "tn": 0}
        for (pat, m), cnt in pats.items():
            score = sum(
                weights[f][0] if pat & bit else weights[f][1]
                for bit, f in ((4, "name"), (2, "balbkt"), (1, "seg"))
            )
            k = ("tp" if score > 0 else "fn") if m else ("fp" if score > 0 else "tn")
            conf[k] += cnt
        for k, v in conf.items():
            assert (got[k] == v).all(), k

    def test_classifier_quality(self, ray_session, sf_small):
        """The log-odds rule must recover almost all true matches
        (every record has its own copy) with modest false positives."""
        from searchengine_ray.pipelines.queries import q_fellegi_sunter

        got = q_fellegi_sunter(sf_small).iloc[0]
        recall = got["tp"] / (got["tp"] + got["fn"])
        assert recall > 0.9
        assert got["fp"] < got["tn"] / 10


class TestSinkhornOt:
    def test_matches_direct_iterations(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SINK_EPS,
            SINK_ITERS,
            q_sinkhorn_ot,
            round_half_away,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        dow = (ev["ts"].astype("int64") // 86_400_000_000) % 7
        rc = np.zeros(7)
        cc = np.zeros(7)
        for d, t in zip(dow, ev["event_type"]):
            if t == "click":
                rc[d] += 1
            elif t == "purchase":
                cc[d] += 1
        r = rc / rc.sum()
        c = cc / cc.sum()
        i = np.arange(7)
        C = np.minimum(np.abs(i[:, None] - i[None, :]), 7 - np.abs(i[:, None] - i[None, :]))
        K = np.exp(-C / SINK_EPS)
        u = np.ones(7)
        v = np.ones(7)
        for _ in range(SINK_ITERS):
            u = round_half_away(r / (K @ v), 10)
            v = round_half_away(c / (K.T @ u), 10)
        P = u[:, None] * K * v[None, :]
        got = q_sinkhorn_ot(sf_tiny)
        want = np.rint(round_half_away(P.ravel(), 6) * 1e6).astype(np.int64)
        assert list(got["plan_micro"]) == [int(x) for x in want]

    def test_transport_plan_properties(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_sinkhorn_ot

        got = q_sinkhorn_ot(sf_tiny)
        # a valid (near-)coupling: non-negative, sums to ~1, small
        # marginal errors after 10 rounds
        assert (got["plan_micro"] >= 0).all()
        assert abs(got["plan_micro"].sum() - 1_000_000) < 2000
        assert got["row_err_micro"].iloc[0] < 5000
        assert got["col_err_micro"].iloc[0] < 5000
