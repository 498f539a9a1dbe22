"""Brute-force identity tests for the readability and Holt-linear wave
(registry 289-290)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestReadability:
    def test_matches_per_doc_recount(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_readability

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["source", "text"]
        )
        rows: dict[str, list[int]] = {}
        for s, t in zip(docs["source"], docs["text"]):
            sents = sum(1 for p in re.split(r"[.?!]", t) if p.strip())
            words = sum(1 for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w)
            syll = len(re.findall(r"[aeiouy]+", t.lower()))
            acc = rows.setdefault(s, [0, 0, 0, 0])
            acc[0] += 1
            acc[1] += sents
            acc[2] += words
            acc[3] += syll
        got = q_readability(sf_tiny).set_index("source")
        for s, (n, se, wo, sy) in rows.items():
            r = got.loc[s]
            assert (int(r["n_docs"]), int(r["sents"]), int(r["words"]), int(r["sylls"])) == (
                n,
                se,
                wo,
                sy,
            )
            wps = wo / max(se, 1)
            spw = sy / max(wo, 1)
            assert abs(r["flesch_ease"] - (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-5
            assert abs(r["fk_grade"] - (0.39 * wps + 11.8 * spw - 15.59)) < 1e-5

    def test_known_text(self, ray_session):
        # "the cat sat." → 1 sentence, 3 words, 3 vowel groups
        t = "the cat sat."
        assert sum(1 for p in re.split(r"[.?!]", t) if p.strip()) == 1
        assert len(re.findall(r"[aeiouy]+", t)) == 3


