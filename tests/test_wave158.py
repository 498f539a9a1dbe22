"""Wave 158: DSIR importance weights + CCNet perplexity terciles —
vs direct single-process recomputation."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd


def _toks(sf_dir):
    """The no-stoplist tokenizer both entries share (textstats
    _token_lists semantics, recomputed independently here)."""
    import re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = {}
    for r in docs.itertuples():
        t = re.sub(r"[,.;?!]", " ", r.text.lower())
        out[int(r.doc_id)] = [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]
    return docs, out


class TestDsirWeights:
    def test_matches_direct(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DSIR_B,
            DSIR_TARGET_SOURCE,
            _md5_low64,
            q_dsir_weights,
            round_half_away,
        )

        docs, toks = _toks(sf_tiny)
        src = dict(zip(docs["doc_id"].astype(int), docs["source"]))
        raw = np.zeros(DSIR_B, np.int64)
        tgt = np.zeros(DSIR_B, np.int64)
        hcache = {}
        for d, tl in toks.items():
            for t in tl:
                h = hcache.setdefault(t, _md5_low64(t) % DSIR_B)
                raw[h] += 1
                if src[d] == DSIR_TARGET_SOURCE:
                    tgt[h] += 1
        tr, tt = int(raw.sum()), int(tgt.sum())
        micro = np.rint(
            round_half_away(
                np.log((tgt + 1) / float(tt + DSIR_B))
                - np.log((raw + 1) / float(tr + DSIR_B)),
                6,
            )
            * 1e6
        ).astype(np.int64)
        got = q_dsir_weights(sf_tiny).set_index("doc_id")
        for d, tl in toks.items():
            if not tl:
                assert d not in got.index
                continue
            want = sum(int(micro[hcache[t]]) for t in tl)
            assert got.loc[d, "logw_micro"] == want, d
            assert got.loc[d, "n_toks"] == len(tl)

    def test_target_docs_score_higher(self, ray_session, sf_tiny):
        """On average the target source's own docs must get larger
        importance weights than the rest — the defining property."""
        from searchengine_ray.pipelines.queries import DSIR_TARGET_SOURCE, q_dsir_weights

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "source"])
        got = q_dsir_weights(sf_tiny).merge(docs, on="doc_id")
        per_tok = got["logw_micro"] / got["n_toks"]
        is_t = got["source"] == DSIR_TARGET_SOURCE
        if is_t.any() and (~is_t).any():
            assert per_tok[is_t].mean() > per_tok[~is_t].mean()


class TestCcnetBuckets:
    def test_matches_direct(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ccnet_buckets, round_half_away

        docs, toks = _toks(sf_tiny)
        cf = collections.Counter()
        for tl in toks.values():
            cf.update(tl)
        total = float(sum(cf.values()))
        micro = {
            t: int(np.rint(round_half_away(-math.log(c / total), 6) * 1e6))
            for t, c in cf.items()
        }
        rows = []
        for r in docs.itertuples():
            tl = toks[int(r.doc_id)]
            if not tl:
                continue
            tot = sum(micro[t] for t in tl)
            rows.append((r.lang, int(r.doc_id), (tot * 1000) // len(tl), int(r.n_chars)))
        df = pd.DataFrame(rows, columns=["lang", "doc_id", "s", "n_chars"])
        want = {}
        for lang, g in df.groupby("lang"):
            g = g.sort_values(["s", "doc_id"]).reset_index(drop=True)
            n = len(g)
            rk = np.arange(1, n + 1)
            b = np.where(rk * 3 <= n, "head", np.where(rk * 3 <= 2 * n, "middle", "tail"))
            for bucket in ("head", "middle", "tail"):
                sub = g[b == bucket]
                if len(sub):
                    want[(lang, bucket)] = (
                        len(sub), int(sub["n_chars"].sum()),
                        int(sub["s"].min()), int(sub["s"].max()),
                    )
        got = q_ccnet_buckets(sf_tiny)
        assert len(got) == len(want)
        for r in got.itertuples():
            w = want[(r.lang, r.bucket)]
            assert (r.n_docs, r.sum_chars, r.min_score, r.max_score) == w, (r.lang, r.bucket)

    def test_bucket_order_and_partition(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ccnet_buckets

        got = q_ccnet_buckets(sf_tiny)
        for lang, g in got.groupby("lang"):
            g = g.set_index("bucket")
            # head scores ≤ middle ≤ tail (rank thirds are ordered)
            if {"head", "middle", "tail"} <= set(g.index):
                assert g.loc["head", "max_score"] <= g.loc["middle", "min_score"]
                assert g.loc["middle", "max_score"] <= g.loc["tail", "min_score"]
                # tercile sizes differ by at most 1
                sizes = g["n_docs"]
                assert sizes.max() - sizes.min() <= 1
