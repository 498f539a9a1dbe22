"""Brute-force identity tests for the entropy-coding/sampling wave
(range coder + alias draws, registry 393-394)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


class TestRangeCoder:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            RC_BOT,
            RC_PREFIX,
            RC_STRIDE,
            RC_TOP,
            q_range_coder,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        sampled = [
            (int(d), t[:RC_PREFIX])
            for d, t in zip(docs["doc_id"], docs["text"])
            if d % RC_STRIDE == 0
        ]
        cnt: dict[str, int] = {}
        for _, s in sampled:
            for ch in s:
                cnt[ch] = cnt.get(ch, 0) + 1
        chars = sorted(cnt)
        freq = [cnt[c] for c in chars]
        cum = np.concatenate([[0], np.cumsum(freq)[:-1]]).astype(int)
        total = sum(freq)
        ci = {c: i for i, c in enumerate(chars)}
        got = q_range_coder(sf_tiny)
        for did, s in sampled:
            low, rng, nb, chain = 0, RC_TOP - 1, 0, "rc"
            for ch in s:
                i = ci[ch]
                r = rng // total
                low = (low + r * int(cum[i])) & (RC_TOP - 1)
                rng = r * freq[i]
                while rng < RC_BOT:
                    chain = hashlib.md5(
                        f"{chain}:{low >> 24}".encode()
                    ).hexdigest()
                    nb += 1
                    low = (low << 8) & (RC_TOP - 1)
                    rng = (rng << 8) & (RC_TOP - 1)
                    if rng == 0:
                        rng = RC_TOP - 1
            h = sum(
                int(
                    math.copysign(
                        math.floor(
                            abs(-math.log2(freq[ci[c]] / total) * 1e6) + 0.5
                        ),
                        1,
                    )
                )
                for c in s
            )
            row = got[got["doc_id"] == did].iloc[0]
            assert row["n_bytes"] == nb
            assert row["chain"] == chain
            assert row["entropy_bits"] == h

    def test_near_entropy(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_range_coder

        got = q_range_coder(sf_tiny)
        # emitted bytes stay within ~5 bytes of the entropy bound
        # (32-bit state holds back the tail flush)
        bits_out = got["n_bytes"] * 8 * 1_000_000
        assert (bits_out <= got["entropy_bits"] + 40 * 1_000_000).all()
        assert (got["n_bytes"] >= 0).all()


class TestAliasDraws:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            _PM_MOD,
            _PM_MUL,
            DRAW_M,
            q_alias_draws,
            q_alias_method,
        )

        tbl = q_alias_method(sf_tiny)
        names = tbl["bucket"].tolist()
        idx = {b: i for i, b in enumerate(names)}
        n = len(tbl)
        W = int(tbl["w"].sum())
        prob = tbl["prob_num"].astype(int).tolist()
        alias = [idx[a] for a in tbl["alias_bucket"]]
        counts = [0] * n
        state = 1
        for _ in range(DRAW_M):
            state = state * _PM_MUL % _PM_MOD
            cell = state % n
            coin = (state // n) % W
            counts[cell if coin < prob[cell] else alias[cell]] += 1
        got = q_alias_draws(sf_tiny)
        assert got["bucket"].tolist() == names
        assert got["n_drawn"].tolist() == counts
        assert got["n_drawn"].sum() == DRAW_M

    def test_distribution_tracks_weights(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import DRAW_M, q_alias_draws

        got = q_alias_draws(sf_tiny)
        W = got["w"].sum()
        # empirical shares within a loose band of the weights
        emp = got["n_drawn"] / DRAW_M
        exp = got["w"] / W
        assert (np.abs(emp - exp) < 0.05).all()
        # chi pieces are small for a well-mixed stream
        assert got["chi_micro"].mean() < 20_000_000
