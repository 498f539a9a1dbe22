"""Brute-force identity tests for the assembly/secret-sharing wave
(de Bruijn + Shamir, registry 419-420)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestDebruijnAssembly:
    @staticmethod
    def _assemble(s: str, k: int):
        edges = [
            (s[i : i + k - 1], s[i + 1 : i + k])
            for i in range(len(s) - k + 1)
        ]
        used = [False] * len(edges)
        cur = s[: k - 1]
        asm = cur
        n_used = 0
        while True:
            nxt = -1
            for e, (src, _) in enumerate(edges):
                if not used[e] and src == cur:
                    nxt = e
                    break
            if nxt < 0:
                break
            used[nxt] = True
            n_used += 1
            cur = edges[nxt][1]
            asm += cur[-1]
        return len(edges), n_used, asm

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            DB_K,
            DB_PREFIX,
            DB_STRIDE,
            q_debruijn_assembly,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        got = q_debruijn_assembly(sf_tiny)
        for d, t in zip(docs["doc_id"], docs["text"]):
            if d % DB_STRIDE != 0:
                continue
            s = t[:DB_PREFIX]
            ne, nu, asm = self._assemble(s, DB_K)
            row = got[got["doc_id"] == d].iloc[0]
            assert row["n_edges"] == ne
            assert row["n_used"] == nu
            assert row["assembled"] == asm
            assert row["is_full"] == int(nu == ne)
            assert row["equals_original"] == int(asm == s)

    def test_repeat_ambiguity(self):
        # unique k-mers reconstruct exactly; a repeat can mislead
        ne, nu, asm = self._assemble("abcdefgh", 4)
        assert asm == "abcdefgh" and nu == ne
        ne2, nu2, asm2 = self._assemble("abcabcab", 4)
        # the repeat-heavy string still walks edges deterministically
        assert nu2 <= ne2

    def test_full_implies_equal(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_debruijn_assembly

        got = q_debruijn_assembly(sf_tiny)
        full = got[got["is_full"] == 1]
        # a full greedy walk has the right length; equality holds
        # whenever the walk is full AND unique — length always matches
        assert (
            full["assembled"].str.len()
            == full["n_edges"] + 3
        ).all()


class TestShamirShares:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SHAMIR_P,
            _md5_low64,
            q_shamir_shares,
        )

        p = SHAMIR_P
        v = pd.read_parquet(
            f"{sf_tiny}/orders.parquet", columns=["o_totalprice"]
        )["o_totalprice"].to_numpy(np.float64)
        cents = (
            np.sign(v) * np.floor(np.abs(np.round(v, 2) * 100) + 0.5)
        ).astype(np.int64)
        secret = int(cents.sum()) % p
        a1 = _md5_low64("sh1") % p
        a2 = _md5_low64("sh2") % p
        shares = {x: (secret + a1 * x + a2 * x * x) % p for x in range(1, 6)}
        got = q_shamir_shares(sf_tiny)
        for x in range(1, 6):
            assert (
                got[(got["kind"] == "share") & (got["x"] == x)].iloc[0]["value"]
                == shares[x]
            )
        r123 = got[got["kind"] == "recon123"].iloc[0]
        r245 = got[got["kind"] == "recon245"].iloc[0]
        r12 = got[got["kind"] == "recon12"].iloc[0]
        assert r123["value"] == secret == r245["value"]
        assert r12["value"] != secret
        assert r123["recovers"] == 1 and r12["recovers"] == 0

    def test_any_three_shares_suffice(self, ray_session, sf_tiny):
        """Independent check: reconstruct from {1,3,5} with rational
        Lagrange weights computed exactly."""
        from fractions import Fraction

        from searchengine_ray.pipelines.queries import q_shamir_shares

        got = q_shamir_shares(sf_tiny)
        sh = {
            int(r["x"]): int(r["value"])
            for _, r in got[got["kind"] == "share"].iterrows()
        }
        secret = int(got[got["kind"] == "recon123"].iloc[0]["value"])
        xs = [1, 3, 5]
        acc = Fraction(0)
        for xi in xs:
            w = Fraction(1)
            for xj in xs:
                if xj != xi:
                    w *= Fraction(xj, xj - xi)
            acc += w * sh[xi]
        p = 2147483647
        num, den = acc.numerator, acc.denominator
        # reduce the rational mod p via the modular inverse of den
        inv_den = pow(den % p, p - 2, p)
        assert (num % p) * inv_den % p == secret
