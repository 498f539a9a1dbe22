"""Brute-force identity tests for the WordPiece / DP-counts wave
(registry 295-296)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestWordpiece:
    def test_known_encodings(self):
        from searchengine_ray.pipelines.queries import (
            _wordpiece_encode,
            _wordpiece_tables,
        )

        start, cont, ml = _wordpiece_tables()
        # "the" is a start piece → 1 piece, no unk
        assert _wordpiece_encode("the", start, cont, ml) == (1, 0)
        # "thes" → "the" + "s"
        assert _wordpiece_encode("thes", start, cont, ml) == (2, 0)
        # greedy longest-first: "string" → "st"+"ri"+"ng"? no "ng" cont →
        # replay by hand instead of guessing
        n, u = _wordpiece_encode("string", start, cont, ml)
        assert u in (0, 1) and n >= 1

    def test_matches_per_word_recount(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import _token_lists
        from searchengine_ray.pipelines.queries import (
            _wordpiece_encode,
            _wordpiece_tables,
            q_wordpiece_tokens,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["source", "text"]
        )
        start, cont, ml = _wordpiece_tables()
        acc: dict[str, list[int]] = {}
        for src, toks in zip(docs["source"], _token_lists(docs["text"])):
            a = acc.setdefault(src, [0, 0, 0, 0])
            seen = acc.setdefault(src + "~words", set())  # type: ignore[arg-type]
            for w in toks:
                n, u = _wordpiece_encode(w, start, cont, ml)
                a[1] += 1
                a[2] += n
                a[3] += u
                seen.add(w)  # type: ignore[union-attr]
        got = q_wordpiece_tokens(sf_tiny).set_index("source")
        for src in docs["source"].unique():
            a = acc[src]
            r = got.loc[src]
            assert int(r["n_words"]) == len(acc[src + "~words"])
            assert int(r["n_tokens"]) == a[1]
            assert int(r["wp_tokens"]) == a[2]
            assert int(r["unk_tokens"]) == a[3]
            assert abs(r["pieces_per_token"] - a[2] / a[1]) < 1e-5

    def test_corpus_has_both_outcomes(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_wordpiece_tokens

        got = q_wordpiece_tokens(sf_tiny)
        # the vocab is sized so the corpus exercises BOTH branches:
        # multi-piece encodings (fertility > 1) and UNK fallbacks
        assert (got["wp_tokens"] > got["n_tokens"]).any() or (
            got["pieces_per_token"] > 1.0
        ).any()
        assert got["unk_tokens"].sum() > 0


