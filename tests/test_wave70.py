"""Brute-force identity tests for the block-max / sqlite wave
(registry 337-338)."""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


def _round_half_away(x, nd: int = 6):
    p = 10.0**nd
    return np.copysign(np.floor(np.abs(x) * p + 0.5) / p, x)


class TestBlockMaxAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            BLOCK_B,
            EVAL_QUERIES,
            q_block_max_audit,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        qset = {t for q in EVAL_QUERIES for t in q}
        # per-doc filtered token lists
        N = len(docs)
        dls: dict[int, int] = {}
        tf: dict[str, dict[int, int]] = {t: {} for t in qset}
        for did, text in zip(docs["doc_id"], docs["text"]):
            ts = [t for t in _raw_tokens(text) if t not in STOP_WORDS]
            dls[int(did)] = len(ts)
            for t in ts:
                if t in qset:
                    tf[t][int(did)] = tf[t].get(int(did), 0) + 1
        avgdl = sum(dls.values()) / float(N)
        # BM25 contribution per (term, doc)
        contrib: dict[str, dict[int, float]] = {}
        for t in qset:
            postings = tf[t]
            df = len(postings)
            if df == 0:
                continue
            idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
            contrib[t] = {
                d: (2.2 * idf)
                * (f / (f + 1.2 * (1.0 - 0.75 + 0.75 * dls[d] / avgdl)))
                for d, f in postings.items()
            }
        # per-query top-10 threshold over rounded summed scores
        theta: dict[int, float] = {}
        for qid, terms in enumerate(EVAL_QUERIES):
            scores: dict[int, float] = {}
            for t in terms:
                for d, c in contrib.get(t, {}).items():
                    scores[d] = scores.get(d, 0.0) + c
            s = sorted(
                (float(_round_half_away(v)) for v in scores.values()),
                reverse=True,
            )
            if len(s) >= 10:
                theta[qid] = s[9]
        # expected rows
        exp = []
        for qid, terms in enumerate(EVAL_QUERIES):
            for t in sorted(terms):
                if t not in contrib:
                    continue
                cb = np.array(
                    [contrib[t][d] for d in sorted(contrib[t])], np.float64
                )
                nblk = int(math.ceil(len(cb) / BLOCK_B))
                other = sum(
                    max(contrib[t2].values())
                    for t2 in terms
                    if t2 != t and t2 in contrib
                )
                ns = 0
                if qid in theta:
                    for b in range(nblk):
                        bm = cb[b * BLOCK_B : (b + 1) * BLOCK_B].max()
                        if float(_round_half_away(bm + other)) < theta[qid]:
                            ns += 1
                exp.append((qid, t, nblk, ns))
        got = q_block_max_audit(sf_tiny)
        assert (
            list(
                got[["qid", "term", "n_blocks", "n_skippable"]].itertuples(
                    index=False, name=None
                )
            )
            == exp
        )
        for _, row in got.iterrows():
            assert row["skip_ratio"] == float(
                _round_half_away(row["n_skippable"] / row["n_blocks"])
            )

    def test_skippable_bounded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_block_max_audit

        got = q_block_max_audit(sf_tiny)
        assert (got["n_skippable"] <= got["n_blocks"]).all()
        assert (got["n_blocks"] > 0).all()
        assert got["qid"].nunique() >= 2


class TestSqliteRoundtrip:
    def test_row_identity(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_sqlite_roundtrip

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source", "text"]
        ).sort_values("doc_id")
        got = q_sqlite_roundtrip(sf_tiny)
        assert got["doc_id"].tolist() == docs["doc_id"].astype(int).tolist()
        assert got["source"].tolist() == docs["source"].tolist()
        assert got["n_chars"].tolist() == docs["text"].map(len).tolist()
        assert (
            got["md5"].tolist()
            == docs["text"]
            .map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())
            .tolist()
        )

    def test_partitioned_layout(self, ray_session, sf_tiny):
        """SQLite is single-writer: the sink must emit one db file per
        block, never one shared file."""
        import glob

        from searchengine_ray.pipelines.queries import (
            CACHE_ROOT,
            q_sqlite_roundtrip,
        )

        q_sqlite_roundtrip(sf_tiny)
        dirs = glob.glob(str(CACHE_ROOT / "sqlite-*"))
        assert dirs
        files = glob.glob(dirs[0] + "/part-*.db")
        assert len(files) >= 1
