"""Wave 194: Freivalds verification + Borda fusion — vs direct
matmul / positional tallies."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestFreivaldsCheck:
    def test_matches_direct_matmul(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            FREI_TRIALS,
            _md5_low64,
            q_freivalds_check,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type", "user_id"])
        types = sorted(ev["event_type"].unique())
        tidx = {t: i for i, t in enumerate(types)}
        u = (ev["user_id"] % 8).to_numpy(np.int64)
        d = (ev["ts"].astype("int64") // 86_400_000_000 % 7).to_numpy(np.int64)
        A = np.zeros((len(types), 8), np.int64)
        B = np.zeros((8, 7), np.int64)
        for t, uu, dd in zip(ev["event_type"], u, d):
            A[tidx[t], uu] += 1
            B[uu, dd] += 1
        C = A @ B
        got = q_freivalds_check(sf_tiny)
        assert got["c_total"].iloc[0] == int(C.sum())
        assert (got["clean_ok"] == 1).all()
        assert got["n_detected"].iloc[0] >= 1
        # recompute trial 0's detection flag
        r = np.array(
            [1 if _md5_low64(f"fr#0#{j}") % 2 == 1 else -1 for j in range(7)], np.int64
        )
        Cbad = C.copy()
        Cbad[2, 3] += 1
        want = int(not ((A @ (B @ r)) == Cbad @ r).all())
        assert got[got["trial"] == 0]["corrupt_detected"].iloc[0] == want
        assert len(got) == FREI_TRIALS

    def test_detection_probability_structure(self):
        """A single-cell corruption is caught by EVERY ±1 vector:
        (E·r)[i] = r[j] ∈ {±1} is never zero — the ½ failure bound is
        for adversarial error matrices, not rank-one single cells."""
        rng = np.random.RandomState(0)
        A = rng.randint(0, 5, (4, 4))
        B = rng.randint(0, 5, (4, 4))
        C = A @ B
        Cbad = C.copy()
        Cbad[1, 2] += 1
        caught = 0
        total = 0
        for mask in range(16):
            r = np.array([1 if mask & (1 << j) else -1 for j in range(4)])
            total += 1
            caught += int(not ((A @ (B @ r)) == Cbad @ r).all())
        assert caught == total


class TestBordaFusion:
    def test_matches_direct_tally(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CONDORCET_DEPTH,
            EVAL_QUERIES,
            QL_MU,
            _engine,
            q_borda_fusion,
        )

        eng = _engine(sf_tiny)
        got = q_borda_fusion(sf_tiny)
        D = CONDORCET_DEPTH
        for qid, terms in enumerate(EVAL_QUERIES):
            def ranked(res):
                docs = np.asarray([d for d, _ in res], np.int64)
                scores = np.asarray([round(s, 6) for _, s in res], np.float64)
                return list(docs[np.lexsort((docs, -scores))])[:D]

            pts = {}
            for lst in (
                ranked(eng.search_tfidf(terms, None)),
                ranked(eng.search_bm25(terms, topk=None)),
                ranked(eng.search_ql_dirichlet(" ".join(terms), mu=QL_MU, topk=None)),
            ):
                for r, dd in enumerate(lst):
                    pts[int(dd)] = pts.get(int(dd), 0) + D - r
            want = sorted(pts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
            sub = got[got["qid"] == qid].sort_values("rank")
            assert list(sub["doc_id"]) == [d for d, _ in want]
            assert list(sub["borda"]) == [p for _, p in want]

    def test_points_decompose(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_borda_fusion

        got = q_borda_fusion(sf_tiny)
        assert (
            got["borda"]
            == got["pts_tfidf"] + got["pts_bm25"] + got["pts_ql"]
        ).all()
        for _, g in got.groupby("qid"):
            b = g.sort_values("rank")["borda"].to_numpy()
            assert (np.diff(b) <= 0).all()
