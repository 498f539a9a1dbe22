"""Wave 159: robots.txt longest-match evaluation + TREC depth-k
pooling — vs direct sequential recomputation."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestRobotsRules:
    def _decide(self, path, rules):
        """Reference RFC 9309 evaluation: most specific match wins,
        allow wins the tie (independent reimplementation)."""
        best = None
        for rid, verdict, pat in rules:
            if path.startswith(pat):
                key = (len(pat), 1 if verdict == "allow" else 0, -rid)
                if best is None or key > best[0]:
                    best = (key, rid, verdict)
        return best[1], best[2]

    def test_matches_reference_eval(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import ROBOTS_RULES, q_robots_rules

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        want: dict[int, int] = {}
        allowed = 0
        for d in docs["doc_id"].astype(int):
            path = f"/sec{d % 7}/item/{d % 50}"
            rid, verdict = self._decide(path, ROBOTS_RULES)
            want[rid] = want.get(rid, 0) + 1
            allowed += verdict == "allow"
        got = q_robots_rules(sf_tiny)
        assert dict(zip(got["rule_id"], got["n_urls"])) == want
        assert (got["allowed_urls"] == allowed).all()
        assert (got["total_urls"] == len(docs)).all()

    def test_overmatch_and_tie_semantics(self, ray_session, sf_tiny):
        """/sec5/item/13 must be won by the allow rule 6 (longer than
        the overmatching disallow '/sec5/item/1'); /sec5/item/12 falls
        to the disallow prefix — the literal-prefix pitfall."""
        from searchengine_ray.pipelines.queries import ROBOTS_RULES

        t = TestRobotsRules()
        rid, v = t._decide("/sec5/item/13", ROBOTS_RULES)
        assert (rid, v) == (6, "allow")
        rid, v = t._decide("/sec5/item/12", ROBOTS_RULES)
        assert (rid, v) == (5, "disallow")
        rid, v = t._decide("/sec0/item/3", ROBOTS_RULES)
        assert (rid, v) == (0, "allow")


class TestTrecPooling:
    def test_matches_direct_sets(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            POOL_DEPTHS,
            QL_MU,
            _engine,
            q_trec_pooling,
        )

        eng = _engine(sf_tiny)
        got = q_trec_pooling(sf_tiny).set_index(["qid", "depth"])
        for qid, terms in enumerate(EVAL_QUERIES):
            def ranked(res):
                docs = np.asarray([d for d, _ in res], np.int64)
                scores = np.asarray([round(s, 6) for _, s in res], np.float64)
                return list(docs[np.lexsort((docs, -scores))])

            tops_full = {
                "tfidf": ranked(eng.search_tfidf(terms, None)),
                "bm25": ranked(eng.search_bm25(terms, topk=None)),
                "ql": ranked(eng.search_ql_dirichlet(" ".join(terms), mu=QL_MU, topk=None)),
            }
            for depth in POOL_DEPTHS:
                tops = {s: set(r[:depth]) for s, r in tops_full.items()}
                pool = set().union(*tops.values())
                row = got.loc[(qid, depth)]
                assert row["pool_size"] == len(pool)
                assert row["overlap_all"] == len(
                    tops["tfidf"] & tops["bm25"] & tops["ql"]
                )
                assert row["uniq_tfidf"] == len(
                    tops["tfidf"] - tops["bm25"] - tops["ql"]
                )
                assert row["uniq_ql"] == len(tops["ql"] - tops["bm25"] - tops["tfidf"])

    def test_pool_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_trec_pooling

        got = q_trec_pooling(sf_tiny)
        # pool is at most 3×depth and at least depth (if any system fills it)
        assert (got["pool_size"] <= 3 * got["depth"]).all()
        assert (
            got["pool_size"]
            >= got[["uniq_tfidf", "uniq_bm25", "uniq_ql", "overlap_all"]].sum(axis=1)
        ).all()
        # pools grow with depth per qid
        for _, g in got.groupby("qid"):
            sizes = g.sort_values("depth")["pool_size"].to_numpy()
            assert (np.diff(sizes) >= 0).all()
