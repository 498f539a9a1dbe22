"""Tests for the training-data ops: dedup family vs brute-force oracles,
similarity recall, text stats, multimodal plumbing."""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from searchengine_ray.functions import dedup, multimodal, similarity, textstats


def docs_ds(docs: dict[int, str]):
    import ray.data as rd

    ids = sorted(docs)
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array([docs[i] for i in ids])}
        )
    )


NEAR_DUP_DOCS = {
    0: "the quick brown fox jumps over the lazy dog near the river bank today",
    1: "the quick brown fox jumps over the lazy dog near the river bank tonight",  # near-dup of 0
    2: "completely different content about database query engines and shuffles",
    3: "the quick brown fox jumps over the lazy dog near the river bank today",  # exact dup of 0
    4: "another unrelated document discussing tokenizers stemmers and indexes",
    5: "completely different content about database query engines and shuffling",  # near-dup of 2
}


class TestExactDedup:
    def test_exact(self, ray_session):
        out = dedup.exact_dedup(docs_ds(NEAR_DUP_DOCS)).to_pandas()
        out = out.sort_values("doc_id").reset_index(drop=True)
        # 0 and 3 identical → survivor 0 with 2 copies
        assert out[out["doc_id"] == 0]["n_dups"].iloc[0] == 2
        assert 3 not in set(out["doc_id"])
        assert len(out) == 5


class TestMinHash:
    def test_signature_similarity_approximates_jaccard(self):
        h = dedup.MinHasher(256)
        a = dedup._hash_shingles([f"s{i}" for i in range(100)])
        b = dedup._hash_shingles([f"s{i}" for i in range(50, 150)])
        sim = (h.signature(a) == h.signature(b)).mean()
        true_j = 50 / 150
        assert abs(sim - true_j) < 0.12

    def test_pairs_match_bruteforce(self, ray_session):
        got = dedup.minhash_dedup_pairs(docs_ds(NEAR_DUP_DOCS), threshold=0.5)
        got_pairs = set(zip(got["doc_a"], got["doc_b"]))
        # brute-force oracle
        toks = {
            d: textstats._token_lists(pd.Series([t])).iloc[0]
            for d, t in NEAR_DUP_DOCS.items()
        }
        want = set()
        for a in NEAR_DUP_DOCS:
            for b in NEAR_DUP_DOCS:
                if a < b and dedup.jaccard(toks[a], toks[b]) >= 0.5:
                    want.add((a, b))
        assert got_pairs == want
        assert (0, 3) in got_pairs  # exact dup found
        assert (0, 1) in got_pairs  # near dup found

    def test_ngram_exact_matches_bruteforce(self, ray_session):
        got = dedup.ngram_jaccard_pairs(docs_ds(NEAR_DUP_DOCS), threshold=0.5)
        toks = {
            d: textstats._token_lists(pd.Series([t])).iloc[0]
            for d, t in NEAR_DUP_DOCS.items()
        }
        want = {
            (a, b): round(dedup.jaccard(toks[a], toks[b]), 6)
            for a in NEAR_DUP_DOCS
            for b in NEAR_DUP_DOCS
            if a < b and dedup.jaccard(toks[a], toks[b]) >= 0.5
        }
        got_map = {
            (a, b): j
            for a, b, j in zip(got["doc_a"], got["doc_b"], got["jaccard"])
        }
        assert got_map == want  # pairs AND exact jaccard values

    def test_ngram_rejects_wide_doc_ids(self, ray_session):
        """Packed uint64 pair keys require ids < 2^32 — full-range hash
        ids must raise, not silently collide (ADVICE r2)."""
        import ray.data as rd

        wide = rd.from_items(
            [{"doc_id": 1 << 40, "text": "a b c d"}, {"doc_id": 5, "text": "a b c d"}]
        )
        with pytest.raises(Exception, match=r"2\^32"):
            dedup.ngram_jaccard_pairs(wide, threshold=0.5)


class TestSimHash:
    def test_near_dups_blocked_and_found(self, ray_session):
        pairs = dedup.simhash_pairs(docs_ds(NEAR_DUP_DOCS), max_hamming=12)
        got = set(zip(pairs["doc_a"], pairs["doc_b"]))
        assert (0, 3) in got  # identical → hamming 0
        assert pairs[(pairs.doc_a == 0) & (pairs.doc_b == 3)]["hamming"].iloc[0] == 0
        assert (0, 1) in got
        # unrelated docs don't pair at small hamming
        strict = dedup.simhash_pairs(docs_ds(NEAR_DUP_DOCS), max_hamming=3)
        sg = set(zip(strict["doc_a"], strict["doc_b"]))
        assert (0, 4) not in sg and (2, 4) not in sg


class TestEmbeddingOps:
    @pytest.fixture(scope="class")
    def emb_ds(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        base = rng.standard_normal((40, 16))
        base[7] = base[3] + rng.standard_normal(16) * 0.01  # near-dup pair (3, 7)
        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(40), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in base], pa.list_(pa.float32())),
                }
            )
        ), base

    def test_neardup_pairs(self, emb_ds):
        ds, base = emb_ds
        pairs = dedup.embedding_neardup_pairs(ds, threshold=0.97)
        assert (3, 7) in set(zip(pairs["vec_a"], pairs["vec_b"]))

    def test_cosine_topk_matches_numpy(self, emb_ds):
        ds, base = emb_ds
        f32 = base.astype(np.float32).astype(np.float64)
        q = f32[5]
        got = similarity.cosine_topk(ds, q, k=5, ndigits=None)
        mat = f32 / np.linalg.norm(f32, axis=1, keepdims=True)
        sims = mat @ (q / np.linalg.norm(q))
        order = np.lexsort((np.arange(40), -sims))[:5]
        assert got["vec_id"].tolist() == order.tolist()
        np.testing.assert_allclose(got["cosine"].to_numpy(), sims[order], rtol=1e-12)

    def test_lsh_recall(self, emb_ds):
        ds, base = emb_ds
        idx = similarity.LshIndex(dim=16, n_planes=6)
        idx.build(ds)
        f32 = base.astype(np.float32).astype(np.float64)
        mat = f32 / np.linalg.norm(f32, axis=1, keepdims=True)
        hits = 0
        batch = idx.query_batch(f32[:10], k=5, n_probe=6)
        for qi in range(10):
            got = [i for i, _ in batch[qi]]
            assert got == [i for i, _ in idx.query(f32[qi], k=5, n_probe=6)]
            sims = mat @ mat[qi]
            want = set(np.lexsort((np.arange(40), -sims))[:5].tolist())
            hits += len(set(got) & want)
        assert hits / 50 >= 0.5  # approximate, but far better than chance

    def test_lsh_large_query_batch_matches_sequential(self, emb_ds):
        """Round-5 grouped-hit scan: a large query batch (many distinct
        probe buckets in one scan) must return exactly what per-query
        calls return."""
        ds, base = emb_ds
        idx = similarity.LshIndex(dim=16, n_planes=6, n_tables=4)
        idx.build(ds)
        f32 = base.astype(np.float32).astype(np.float64)
        queries = np.vstack([f32, f32[:10] * 2.0])  # 50 queries, some scaled
        batch = idx.query_batch(queries, k=5, n_probe=3)
        for qi in range(len(queries)):
            seq = idx.query(queries[qi], k=5, n_probe=3)
            # GEMM blocking differs between batch shapes → last-ULP
            # score wiggle; candidates and scores must still agree
            assert {i for i, _ in batch[qi]} == {i for i, _ in seq}, qi
            np.testing.assert_allclose(
                sorted(s for _, s in batch[qi]),
                sorted(s for _, s in seq),
                rtol=1e-12,
            )

    def test_lsh_multi_table_recall_at_least_single(self, emb_ds):
        # OR-ing tables can only widen the candidate set per seed family;
        # verify the multi-table recall beats/equals the single-table one
        # on the same corpus and that scoring stays exact cosine
        ds, base = emb_ds
        f32 = base.astype(np.float32).astype(np.float64)
        mat = f32 / np.linalg.norm(f32, axis=1, keepdims=True)

        def recall(n_tables):
            idx = similarity.LshIndex(dim=16, n_planes=6, n_tables=n_tables)
            idx.build(ds)
            hits = 0
            for qi in range(10):
                got = [i for i, _ in idx.query(f32[qi], k=5, n_probe=2)]
                sims = mat @ mat[qi]
                want = set(np.lexsort((np.arange(40), -sims))[:5].tolist())
                hits += len(set(got) & want)
            return hits / 50

        assert recall(4) >= recall(1)

    def test_lsh_multi_table_scores_are_exact_cosine(self, emb_ds):
        ds, base = emb_ds
        f32 = base.astype(np.float32).astype(np.float64)
        mat = f32 / np.linalg.norm(f32, axis=1, keepdims=True)
        idx = similarity.LshIndex(dim=16, n_planes=6, n_tables=3)
        idx.build(ds)
        for vid, cos in idx.query(f32[3], k=5, n_probe=2):
            np.testing.assert_allclose(cos, mat[vid] @ mat[3], rtol=1e-12)

    def test_pq_rerank_full_equals_bruteforce(self, emb_ds):
        # rerank depth = corpus size -> the shortlist covers everything,
        # so the result must be the exact cosine top-k
        ds, base = emb_ds
        f32 = base.astype(np.float32).astype(np.float64)
        mat = f32 / np.linalg.norm(f32, axis=1, keepdims=True)
        idx = similarity.PqIndex(m=2, ks=8, iters=2)
        idx.fit(ds)
        got = [i for i, _ in idx.query_rerank(f32[5], ds, k=5, rerank=40)]
        sims = mat @ mat[5]
        want = np.lexsort((np.arange(40), -sims))[:5].tolist()
        assert got == want


class TestTextStats:
    def test_token_stats(self):
        batch = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["The cat, the hat."]})
        out = textstats.token_stats_batch(batch)
        assert out["n_tokens"][0].as_py() == 4
        assert out["n_stop"][0].as_py() == 2
        assert out["n_distinct"][0].as_py() == 3

    def test_quality_and_langid(self):
        batch = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [
                    "the cat and the dog are in the house with a toy",
                    "zxqv wvut qqqq",
                    "東京 の 天気",
                ],
            }
        )
        q = textstats.quality_score_batch(batch)
        assert q["stop_ratio"][0].as_py() > q["stop_ratio"][1].as_py()
        lang = textstats.lang_id_batch(batch)
        assert lang["lang_pred"].to_pylist() == ["en", "other", "ja"]

    def test_fingerprints_deterministic(self):
        batch = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["hello world"]})
        a = textstats.fingerprint_batch(batch)
        b = textstats.fingerprint_batch(batch)
        assert a.equals(b)
        assert a["md5"][0].as_py() == "5eb63bbbe01eeed093cb22bb8f5acdc3"
        assert textstats.rolling_hash("abc") != textstats.rolling_hash("acb")


class TestMultimodal:
    def test_decode_stage_plumbing(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(20), pa.int64())}))
        with_payload = ds.map_batches(
            lambda b: multimodal.add_payload_batch(b), batch_format="pyarrow"
        )
        out = with_payload.map_batches(
            multimodal.DecodeStage, batch_format="pyarrow", batch_size=4, concurrency=2
        ).to_pandas()
        assert len(out) == 20
        assert set(out["kind"]) == {"image"}
        assert all(len(f) == 16 for f in out["features"])
        assert all(abs(sum(f) - 1.0) < 1e-9 for f in out["features"])

    def test_resize_halves_dims(self):
        batch = pa.table({"doc_id": pa.array([10], pa.int64())})
        batch = multimodal.add_payload_batch(batch)
        resized = multimodal.ResizeStage()(batch)
        out = multimodal.DecodeStage()(resized).to_pylist()[0]
        import struct

        w, h = struct.unpack("<HH", multimodal.synth_payload(10)[7:11])
        assert out["width"] == w // 2 and out["height"] == h // 2

    def test_real_decode_is_stubbed(self):
        with pytest.raises(NotImplementedError, match="PIL"):
            multimodal._real_image_decode(b"JFIF....")

    def test_bmp_roundtrip_exact(self):
        rng = np.random.default_rng(7)
        for h, w in [(1, 1), (3, 5), (8, 13), (16, 16)]:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.int64).astype(np.uint8)
            assert (multimodal.decode_bmp(multimodal.encode_bmp(img)) == img).all()

    def test_bmp_decode_stage_real_pixels(self):
        ids = [0, 5, 35, 99]  # 35: w=16,h=8 exercises the 48-byte stride
        batch = pa.table({"doc_id": pa.array(ids, pa.int64())})
        out = multimodal.DecodeStage()(
            multimodal.add_payload_batch(batch, kind="bmp")
        ).to_pylist()
        for row, d in zip(out, ids):
            w, h = 8 + d % 9, 8 + d % 7
            x, y = np.arange(w)[None, :], np.arange(h)[:, None]
            gray = (7 * x + 13 * y + d) % 256
            assert row["kind"] == "image/bmp"
            assert (row["width"], row["height"]) == (w, h)
            assert row["sum_intensity"] == int(gray.sum())

    def test_bmp_resize_real_pixels(self):
        batch = pa.table({"doc_id": pa.array([35], pa.int64())})
        resized = multimodal.ResizeStage()(multimodal.add_payload_batch(batch, kind="bmp"))
        small = multimodal.decode_bmp(resized["payload"][0].as_py())
        full = multimodal.decode_bmp(multimodal.synth_bmp_payload(35))
        assert (small == full[::2, ::2]).all()

    def test_wav_roundtrip_exact(self):
        rng = np.random.default_rng(21)
        for n, ch in [(1, 1), (7, 1), (64, 2), (33, 2)]:  # odd mono data → pad byte
            s = rng.integers(-32768, 32768, (n, ch), dtype=np.int64).astype(np.int16)
            got, sr = multimodal.decode_wav(multimodal.encode_wav(s, 44100))
            assert sr == 44100
            assert (got == s).all()

    def test_wav_chunk_walk_extra_chunk(self):
        # a LIST chunk before fmt/data must be skipped, odd-size honored
        s = np.array([100, -100, 100], np.int16)
        wav = multimodal.encode_wav(s, 8000)
        extra = b"LIST" + (3).to_bytes(4, "little") + b"abc\x00"  # odd size + pad
        patched = wav[:12] + extra + wav[12:]
        patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") + patched[8:]
        got, sr = multimodal.decode_wav(patched)
        assert (got.ravel() == s).all() and sr == 8000

    def test_wav_feature_stage_closed_form(self, ray_session):
        import ray.data as rd

        ids = list(range(40))
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
        out = (
            ds.map_batches(
                lambda b: multimodal.add_payload_batch(b, kind="wav"),
                batch_format="pyarrow",
            )
            .map_batches(
                multimodal.AudioFeatureStage,
                batch_format="pyarrow", batch_size=8, concurrency=2,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        for _, row in out.iterrows():
            d = int(row["doc_id"])
            assert row["n_samples"] == 64 + d % 33
            assert row["sample_rate"] == 8000
            assert row["n_channels"] == 1
            assert row["rms"] == float(100 + d % 900)  # exact for a square wave
            assert row["zero_crossings"] == 63 + d % 33

    def test_wav_compressed_is_stubbed(self):
        with pytest.raises(NotImplementedError, match="16-bit PCM"):
            fake_fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 8)  # mp3 tag
            body = b"WAVEfmt " + struct.pack("<I", len(fake_fmt)) + fake_fmt
            body += b"data" + struct.pack("<I", 0)
            multimodal.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


class TestFrameSample:
    def test_frame_grid_and_features(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([0, 5, 12], pa.int64())})
        )
        out = (
            ds.map_batches(
                lambda b: multimodal.add_payload_batch(b, kind="vid"),
                batch_format="pyarrow",
            )
            .map_batches(multimodal.FrameSampleStage, batch_format="pyarrow", concurrency=1)
            .to_pandas()
        )
        for doc in (0, 5, 12):
            n_frames = 4 + doc % 13
            want_frames = list(range(0, n_frames, 4))
            got = out[out.doc_id == doc].sort_values("frame")
            assert got["frame"].tolist() == want_frames
            assert (got["width"] == 8 + doc % 9).all()
            assert (got["height"] == 8 + doc % 7).all()
            assert ((got["mean_intensity"] > 90) & (got["mean_intensity"] < 165)).all()

    def test_non_video_payload_raises(self):
        stage = multimodal.FrameSampleStage()
        batch = pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "payload": pa.array([multimodal.synth_payload(1, "img")], pa.binary()),
            }
        )
        with pytest.raises(NotImplementedError):
            stage(batch)


class TestIvfIndex:
    def test_ivf_recall(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(7)
        base = rng.standard_normal((200, 16))
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(200), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in base], pa.list_(pa.float32())),
                }
            )
        )
        idx = similarity.IvfIndex(n_centroids=8, kmeans_iters=5)
        idx.build(ds)
        f = base.astype(np.float32).astype(np.float64)
        mat = f / np.linalg.norm(f, axis=1, keepdims=True)
        batch = idx.query_batch(f[:10], k=5, n_probe=3)
        hits = 0
        for qi in range(10):
            got = [i for i, _ in batch[qi]]
            assert got == [i for i, _ in idx.query(f[qi], k=5, n_probe=3)]
            sims = mat @ mat[qi]
            want = set(np.lexsort((np.arange(200), -sims))[:5].tolist())
            hits += len(set(got) & want)
        assert hits / 50 >= 0.6  # approximate, beats chance by far


class TestKmeans:
    @staticmethod
    def _ds(mat: np.ndarray):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(mat)), pa.int64()),
                    "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32())),
                }
            )
        )

    @staticmethod
    def _reference(mat: np.ndarray, k: int, iters: int):
        """Single-process mirror of the kmeans_fit contract."""
        x = mat.astype(np.float64)
        cent = x[:k].copy()
        for it in range(iters):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            lab = d.argmin(1)
            if it < iters - 1:
                new = cent.copy()
                for c in range(k):
                    m = x[lab == c]
                    if len(m):
                        new[c] = np.round(m.mean(0), 6)
                cent = new
        return cent, lab

    def test_matches_reference(self, ray_session):
        from searchengine_ray.functions.vectors import kmeans_fit

        rng = np.random.default_rng(11)
        mat = rng.standard_normal((120, 8)).astype(np.float32)
        cent, labels = kmeans_fit(self._ds(mat), k=5, iters=4)
        want_cent, want_lab = self._reference(mat, 5, 4)
        got = labels.to_pandas().sort_values("vec_id")
        assert got["cluster"].to_numpy().tolist() == want_lab.tolist()
        assert np.allclose(cent, want_cent)

    def test_empty_cluster_keeps_centroid(self, ray_session):
        from searchengine_ray.functions.vectors import kmeans_fit

        # vec 1 seeds a centroid but every point (incl. itself) is nearer
        # centroid 0's basin after one update → cluster 1 goes empty
        mat = np.array(
            [[0.0, 0.0], [0.2, 0.0], [0.1, 0.0], [0.1, 0.01], [0.1, -0.01]],
            dtype=np.float32,
        )
        cent, labels = kmeans_fit(self._ds(mat), k=2, iters=3)
        want_cent, want_lab = self._reference(mat, 2, 3)
        assert labels.to_pandas().sort_values("vec_id")["cluster"].tolist() == want_lab.tolist()
        assert np.allclose(cent, want_cent)

    def test_ivf_precomputed_centroids_exact(self, ray_session):
        """IVF with kmeans_fit centroids == brute force restricted to the
        probed cells (the contract the SQL oracle checks)."""
        from searchengine_ray.functions.vectors import _l2_assign, kmeans_fit

        rng = np.random.default_rng(13)
        mat = rng.standard_normal((150, 12)).astype(np.float32)
        ds = self._ds(mat)
        cent, _ = kmeans_fit(ds, k=6, iters=3)
        idx = similarity.IvfIndex(n_centroids=6)
        idx.build(ds, centroids=cent)
        q = mat[3].astype(np.float64)
        got = idx.query(q, k=5, n_probe=2)

        x = mat.astype(np.float64)
        cells = _l2_assign(x, cent)
        ncent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        csims = ncent @ qn
        probe = np.arange(6)[np.lexsort((np.arange(6), -csims))][:2]
        cand = np.flatnonzero(np.isin(cells, probe))
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = xn[cand] @ qn
        order = np.lexsort((cand, -sims))[:5]
        assert [i for i, _ in got] == cand[order].tolist()


class TestKwic:
    def test_window_first_occurrence_and_boundaries(self, ray_session):
        from searchengine_ray.functions.kwic import kwic

        ds = docs_ds(
            {
                0: "a b c TERM d e f g",          # interior window
                1: "TERM x y z q",                 # left boundary clamp
                2: "p q r s TERM",                 # right boundary clamp
                3: "no match here",                # absent → no row
                4: "u TERM v TERM w",              # first occurrence only
                5: "punct, TERM. end",             # punctuation stripped
            }
        )
        got = (
            kwic(ds, term="term", window=2)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = {
            0: "b c term d e",
            1: "term x y",
            2: "r s term",
            4: "u term v term",  # window spans the second hit too
            5: "punct term end",  # punct→space runs collapsed by the + split
        }
        assert dict(zip(got["doc_id"], got["snippet"])) == want


class TestSnippets:
    def test_best_window_and_highlight(self, ray_session):
        import pyarrow as pa

        from searchengine_ray.functions.kwic import snippet_batch

        batch = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        # window at second anchor covers both terms
                        "cat filler filler filler filler filler filler filler cat dog",
                        "no query terms here at all",
                        "dog alone in this one",
                    ]
                ),
            }
        )
        out = snippet_batch(batch, ["cat", "dog"], window=4).to_pandas()
        assert out["doc_id"].tolist() == [0, 2]
        assert out.loc[0, "snippet"] == "<em>cat</em> <em>dog</em>"
        assert out.loc[1, "snippet"] == "<em>dog</em> alone in this"

    def test_tie_breaks_earliest(self, ray_session):
        import pyarrow as pa

        from searchengine_ray.functions.kwic import snippet_batch

        batch = pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": pa.array(["x cat y z cat w"]),
            }
        )
        out = snippet_batch(batch, ["cat"], window=3).to_pandas()
        # both anchors cover 1 distinct term; earliest wins (pos of first cat)
        assert out.loc[0, "snippet"] == "<em>cat</em> y z"


class TestPng:
    def test_roundtrip_all_filters_and_channels(self):
        from searchengine_ray.functions.multimodal import decode_png, encode_png

        rng = np.random.default_rng(0)
        for shape in ((9, 13), (7, 5, 3), (6, 11, 4)):
            img = rng.integers(0, 256, shape).astype(np.uint8)
            for ft in range(5):
                got = decode_png(encode_png(img, filter_type=ft))
                assert got.shape == img.shape
                assert (got == img).all(), (shape, ft)

    def test_rejects_non_png_and_unsupported(self):
        import pytest as _pytest

        from searchengine_ray.functions.multimodal import decode_png, encode_png

        with _pytest.raises(ValueError):
            decode_png(b"BMnotapng")
        # 16-bit depth is honestly unsupported
        img = np.zeros((4, 4), np.uint8)
        payload = bytearray(encode_png(img))
        payload[8 + 4 + 4 + 8] = 16  # IHDR depth byte
        with _pytest.raises((NotImplementedError, ValueError)):
            decode_png(bytes(payload))

    def test_decode_stage_png_pixels(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.multimodal import (
            DecodeStage,
            add_payload_batch,
        )

        ids = pa.table({"doc_id": pa.array([0, 5, 37], pa.int64())})
        out = (
            rd.from_arrow(ids)
            .map_batches(lambda b: add_payload_batch(b, kind="png"), batch_format="pyarrow")
            .map_batches(DecodeStage, batch_format="pyarrow", concurrency=1)
            .to_pandas()
        )
        for _, r in out.iterrows():
            d = int(r.doc_id)
            w, h = 8 + d % 8, 8 + d % 5
            x = np.arange(w)[None, :]
            y = np.arange(h)[:, None]
            want = int(((3 * x + 11 * y + d) % 256).sum())
            assert (r.width, r.height, r.sum_intensity) == (w, h, want)
            assert r["kind"] == "image/png"


class TestPqIndex:
    def test_adc_orders_toward_true_neighbors(self, ray_session):
        """PQ is approximate, but with m=2 subspaces over clustered data
        the ADC top-1 must be the query itself (distance ~0) and top-k
        must overlap the exact L2 top-k."""
        import ray.data as rd

        from searchengine_ray.functions.similarity import PqIndex

        ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        t = ds.to_pandas()
        mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
        ids = t["vec_id"].to_numpy()
        q = mat[ids.tolist().index(0)]

        idx = PqIndex(m=2, ks=16, iters=2)
        idx.fit(rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet"))
        hits = idx.query(q, k=10)
        assert len(hits) == 10
        # self is in the top hits (its codes are the argmin cells of q)
        got_ids = [i for i, _ in hits]
        assert 0 in got_ids
        # overlap with exact L2 top-10 ≥ 3 (labelled clusters → PQ works)
        d = ((mat - q) ** 2).sum(axis=1)
        exact = set(ids[np.lexsort((ids, d))[:10]].tolist())
        assert len(exact & set(got_ids)) >= 3
        # adc ascending
        adcs = [s for _, s in hits]
        assert adcs == sorted(adcs)

    def test_codes_compress_to_m_columns(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.similarity import PqIndex

        idx = PqIndex(m=4, ks=8, iters=2)
        idx.fit(rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet"))
        cols = idx._codes.schema().names
        assert set(cols) == {"vec_id", "code_0", "code_1", "code_2", "code_3"}
        assert len(idx.codebooks) == 4
        assert idx.codebooks[0].shape == (8, 16)  # ks × dim/m


class TestPassageChunks:
    @pytest.mark.parametrize(
        "n,want_chunks",
        [(1, 1), (31, 1), (32, 1), (33, 2), (56, 2), (57, 3), (100, 4)],
    )
    def test_chunk_grid_boundaries(self, ray_session, n, want_chunks):
        """Chunk count = ceil(max(0, n-W)/stride) + 1 on every boundary,
        and the windows tile the doc (W=32, stride=24)."""
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.pipelines.queries import CHUNK_STRIDE, CHUNK_W, q_passage_chunks  # noqa: F401
        from searchengine_ray.pipelines import queries as Q

        text = " ".join(f"t{i}" for i in range(n))
        tbl = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([text])})
        import tempfile, pyarrow.parquet as pq_mod
        import os

        d = tempfile.mkdtemp()
        pq_mod.write_table(tbl, os.path.join(d, "documents.parquet"))
        out = Q.q_passage_chunks(d)
        assert len(out) == want_chunks
        # first chunk starts at token 0; every chunk's tokens are the
        # stride-grid slice of the doc
        for r in out.itertuples(index=False):
            s = r.chunk_id * CHUNK_STRIDE
            want = " ".join(f"t{i}" for i in range(s, min(s + CHUNK_W, n)))
            assert r.text == want
            assert r.n_tokens == min(CHUNK_W, n - s)


class TestContainmentPairs:
    def test_subset_has_containment_one(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.dedup import ngram_containment_pairs

        long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        short = "gamma delta epsilon zeta eta"  # contiguous slice of long
        other = "one two three four five six seven eight nine ten"
        ds = rd.from_arrow(
            pa.table({"doc_id": [1, 2, 3], "text": [long, short, other]})
        )
        out = ngram_containment_pairs(ds, threshold=0.8)
        rows = {(r.contained, r.container): r.containment for r in out.itertuples()}
        assert rows == {(2, 1): 1.0}  # short ⊂ long, never the reverse

    def test_matches_bruteforce_sets(self, ray_session, sf_tiny):
        import ray.data as rd

        from searchengine_ray.functions.dedup import (
            _shingle_hash_set,
            _token_hash_lists,
            _token_lists,
            ngram_containment_pairs,
        )
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        toks = _token_lists(t["text"].to_pandas())
        sets = [
            set(_shingle_hash_set(th, 3).tolist()) for th in _token_hash_lists(toks)
        ]
        ids = t["doc_id"].to_numpy()
        want = {}
        for i in range(len(ids)):
            for j in range(len(ids)):
                if i == j or not sets[i]:
                    continue
                c = len(sets[i] & sets[j]) / len(sets[i])
                if c >= 0.8:
                    want[(int(ids[i]), int(ids[j]))] = round(c, 6)
        ds = rd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        out = ngram_containment_pairs(ds, threshold=0.8)
        got = {(r.contained, r.container): r.containment for r in out.itertuples()}
        assert got == want


class TestGifCodec:
    def test_roundtrip_grid(self):
        from searchengine_ray.functions.multimodal import decode_gif, encode_gif

        rng = np.random.RandomState(3)
        for shape in [(1, 1), (8, 13), (64, 64), (200, 300)]:
            img = rng.randint(0, 256, shape).astype(np.uint8)
            assert (decode_gif(encode_gif(img)) == img).all()

    def test_gradient_forces_width_growth_and_reset(self):
        from searchengine_ray.functions.multimodal import decode_gif, encode_gif

        # low-entropy image: long LZW matches → dictionary passes 4096
        img = np.tile(np.arange(256, dtype=np.uint8), (128, 2))
        assert (decode_gif(encode_gif(img)) == img).all()

    def test_canonical_spec_fixture(self):
        import base64

        from searchengine_ray.functions.multimodal import decode_gif

        g = base64.b64decode(
            "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
        )
        out = decode_gif(g)  # GIF89a + graphic-control extension skipped
        assert out.shape == (1, 1)

    def test_rejects_non_gif(self):
        import pytest

        from searchengine_ray.functions.multimodal import decode_gif

        with pytest.raises(ValueError):
            decode_gif(b"NOTAGIF000")
