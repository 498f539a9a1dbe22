"""Webtext curation operators: WET source, Gopher filters, BPE pre-tokens."""

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.functions.gopher import gopher_metrics_batch
from searchengine_ray.sources.warc import (
    docs_to_wet,
    parse_wet,
    read_wet_dir,
    write_wet_dir,
)


def _docs(ids, texts):
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


class TestWet:
    def test_roundtrip_basic(self):
        t = _docs([3, 7], ["hello world", "second doc"])
        out = parse_wet(docs_to_wet(t))
        assert out["doc_id"].to_pylist() == [3, 7]
        assert out["text"].to_pylist() == ["hello world", "second doc"]

    def test_payload_may_contain_warc_headers(self):
        # Content-Length slicing must protect against header-looking text
        evil = "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nfake"
        out = parse_wet(docs_to_wet(_docs([1], [evil])))
        assert out["text"].to_pylist() == [evil]

    def test_unicode_and_empty(self):
        texts = ["héllo — ünïcode ★", ""]
        out = parse_wet(docs_to_wet(_docs([0, 1], texts)))
        assert out["text"].to_pylist() == texts
        # n_bytes is the UTF-8 byte length, not the char count
        assert out["n_bytes"].to_pylist() == [len(t.encode()) for t in texts]

    def test_real_world_uri_gets_stable_hash_id(self):
        # Common Crawl WET records carry arbitrary URLs; the id falls
        # back to a stable hash instead of ValueError (ADVICE r2)
        data = docs_to_wet(_docs([9], ["x"])).replace(
            b"WARC-Target-URI: http://corpus.local/doc/9",
            b"WARC-Target-URI: https://example.com/a/b.html?q=1",
        )
        out = parse_wet(data)
        assert out.num_rows == 1
        did = out["doc_id"].to_pylist()[0]
        assert did >= 0
        assert parse_wet(data)["doc_id"].to_pylist()[0] == did  # stable

    def test_warcinfo_record_skipped(self):
        data = docs_to_wet(_docs([5], ["x"]))
        assert data.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")
        assert parse_wet(data).num_rows == 1

    def test_dataset_roundtrip(self, tmp_path, ray_session):
        import ray.data as rd

        n = 257
        texts = [f"doc {i} body " * (i % 5 + 1) for i in range(n)]
        ds = rd.from_arrow(_docs(list(range(n)), texts)).repartition(4)
        manifest = write_wet_dir(ds, str(tmp_path / "wet"))
        assert manifest["n_docs"].sum() == n
        back = read_wet_dir(str(tmp_path / "wet")).to_pandas()
        back = back.sort_values("doc_id").reset_index(drop=True)
        assert back["text"].tolist() == texts


class TestGopher:
    def test_handcrafted_fractions(self):
        out = gopher_metrics_batch(_docs([0], ["a a a b"])).to_pydict()
        assert out["n_words"] == [4]
        assert out["dup_word_frac"] == [pytest.approx(0.5)]
        assert out["top_word_frac"] == [pytest.approx(0.75)]
        # bigrams: (a,a) x2, (a,b) x1 -> top 2/3
        assert out["top_bigram_frac"] == [pytest.approx(round(2 / 3, 6))]
        assert out["keep"] == [0]  # too short + too repetitive

    def test_keep_flag(self):
        good = " ".join(f"word{i}xyz" for i in range(100))
        out = gopher_metrics_batch(_docs([1], [good])).to_pydict()
        assert out["keep"] == [1]
        assert out["dup_word_frac"] == [0.0]

    def test_empty_text(self):
        out = gopher_metrics_batch(_docs([2], [""])).to_pydict()
        assert out["n_words"] == [0]
        assert out["keep"] == [0]

    def test_vectorized_matches_naive(self):
        rng = np.random.default_rng(7)
        vocab = [f"w{i}" for i in range(30)]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(1, 60)))
            for _ in range(50)
        ]
        out = gopher_metrics_batch(_docs(list(range(50)), texts)).to_pydict()
        for i, t in enumerate(texts):
            ws = t.split()
            assert out["n_words"][i] == len(ws)
            _, c = np.unique(ws, return_counts=True)
            assert out["top_word_frac"][i] == pytest.approx(
                round(c.max() / len(ws), 6)
            )
            assert out["dup_word_frac"][i] == pytest.approx(
                round(1 - len(c) / len(ws), 6)
            )


class TestBpePretokenize:
    def test_counts(self):
        import pyarrow.compute as pc

        from searchengine_ray.pipelines.queries import BPE_PRETOKEN_RE

        # "I'm fine" -> ["I", "'m", " fine"]; digits and punct split off
        cases = {"I'm fine": 3, "abc 123!": 3, "": 0, "x": 1}
        arr = pa.array(list(cases))
        got = pc.count_substring_regex(arr, BPE_PRETOKEN_RE).to_pylist()
        assert got == list(cases.values())
