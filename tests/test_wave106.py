"""Brute-force identity tests for the succinct-tree/signature wave
(LOUDS + signature file, registry 409-410)."""

from __future__ import annotations

import hashlib
import re

import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestLoudsEncoding:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_louds_encoding

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        vocab: set[str] = set()
        for text in docs["text"]:
            ts = _raw_tokens(text)
            vocab.update(f"{a} {b}" for a, b in zip(ts, ts[1:]))
        nodes: set[str] = set()
        for t in vocab:
            for d in range(1, len(t) + 1):
                nodes.add(t[:d])
        children: dict[str, int] = {}
        roots = 0
        for p in nodes:
            if len(p) == 1:
                roots += 1
            else:
                children[p[:-1]] = children.get(p[:-1], 0) + 1
        bits = "1" * roots + "0"
        for p in sorted(nodes, key=lambda p: (len(p), p)):
            bits += "1" * children.get(p, 0) + "0"
        got = q_louds_encoding(sf_tiny).iloc[0]
        assert got["n_nodes"] == len(nodes)
        assert got["louds_bits"] == len(bits) == 2 * len(nodes) + 1
        assert got["louds_md5"] == hashlib.md5(bits.encode()).hexdigest()
        assert got["pointer_bytes"] == len(nodes) * 8

    def test_louds_navigation(self):
        """rank/select navigation on a hand trie: children of node i
        live between select0(i)+1 and select0(i+1)."""
        # trie: root children a, b; a child ab
        # nodes BFS: a, b, ab; degrees: a->1, b->0, ab->0
        bits = "110" + "10" + "0" + "0"  # super-root(2) a(1) b(0) ab(0)
        assert len(bits) == 2 * 3 + 1
        # select0 positions (0-based): 2, 4, 5, 6 — node1(a) children
        # are the '1' run before the 2nd zero after its own: count ok
        assert bits.count("1") == 3


class TestSignatureFile:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            EVAL_QUERIES,
            SIG_BITS,
            SIG_HASHES,
            _md5_low64,
            q_signature_file,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )

        def mask(t):
            m = 0
            for i in range(1, SIG_HASHES + 1):
                m |= 1 << (_md5_low64(f"s{i}:{t}") % SIG_BITS)
            return m

        got = q_signature_file(sf_tiny)
        for qid, terms in enumerate(EVAL_QUERIES):
            qsig = 0
            for t in terms:
                qsig |= mask(t)
            cand = true = 0
            for _, text in zip(docs["doc_id"], docs["text"]):
                seen = set(_raw_tokens(text))
                s = 0
                for t in seen:
                    s |= mask(t)
                if (s & qsig) == qsig:
                    cand += 1
                if set(terms) <= seen:
                    true += 1
            row = got[got["qid"] == qid].iloc[0]
            assert row["n_candidates"] == cand
            assert row["n_true"] == true
            assert row["false_positives"] == cand - true

    def test_one_sided_filter(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_signature_file

        got = q_signature_file(sf_tiny)
        # no false negatives by construction, so candidates >= truth
        assert (got["n_candidates"] >= got["n_true"]).all()
        assert (got["false_positives"] >= 0).all()
