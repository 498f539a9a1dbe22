"""Brute-force identity tests for the layout/eval wave
(doc-id remap compression, lang-id confusion; registry 451-452)."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd


def _vb(gaps: np.ndarray) -> int:
    return int(sum((int(g).bit_length() + 6) // 7 for g in gaps))


class TestDocidRemap:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import REMAP_TERMS, q_docid_remap

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text", "source"]
        )
        remap = (
            docs.sort_values(["source", "doc_id"])
            .reset_index(drop=True)
            .assign(new_id=lambda d: np.arange(len(d), dtype=np.int64))
            .set_index("doc_id")["new_id"]
        )
        post: dict[str, list[int]] = {}
        df: Counter = Counter()
        for _, r in docs.iterrows():
            toks = {
                w
                for w in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if w and w not in STOP_WORDS
            }
            df.update(toks)
            for t in toks:
                post.setdefault(t, []).append(int(r["doc_id"]))
        top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:REMAP_TERMS]
        got = q_docid_remap(sf_tiny)
        assert set(got["term"]) == {t for t, _ in top}
        for _, r in got.iterrows():
            orig = np.sort(np.asarray(post[r["term"]], np.int64))
            new = np.sort(remap.loc[orig].to_numpy(np.int64))
            b_o = _vb(np.diff(orig, prepend=-1))
            b_r = _vb(np.diff(new, prepend=-1))
            assert (r["df"], r["bytes_orig"], r["bytes_remap"]) == (
                len(orig),
                b_o,
                b_r,
            )

    def test_byte_law(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_docid_remap

        got = q_docid_remap(sf_tiny)
        # a posting list never costs less than 1 byte per posting
        assert (got["bytes_orig"] >= got["df"]).all()
        assert (got["bytes_remap"] >= got["df"]).all()


class TestLangConfusion:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        import ray.data as rd

        from searchengine_ray.functions.textstats import lang_id_batch
        from searchengine_ray.pipelines.queries import q_lang_confusion

        pred = (
            rd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
            .map_batches(lang_id_batch, batch_format="pyarrow")
            .to_pandas()
        )
        truth = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "lang"]
        )
        m = pred.merge(truth, on="doc_id")
        exp = (
            m.groupby(["lang", "lang_pred"])
            .size()
            .reset_index(name="n")
            .sort_values(["lang", "lang_pred"])
        )
        got = q_lang_confusion(sf_tiny)
        assert list(got["lang"]) == list(exp["lang"])
        assert list(got["lang_pred"]) == list(exp["lang_pred"])
        assert list(got["n"]) == list(exp["n"])

    def test_matrix_consistency(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_lang_confusion

        got = q_lang_confusion(sf_tiny)
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["lang"])
        assert got["n"].sum() == len(docs)
        # recall cells sum to 1 within each true class
        for _, g in got.groupby("lang"):
            assert abs(g["recall"].sum() - 1.0) < 1e-5
