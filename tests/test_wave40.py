"""Brute-force identity tests for the CDC / energy-distance /
quantile-normalization wave (registry 270-272)."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestCdcChunks:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CDC_BASE,
            CDC_MASK,
            CDC_MOD,
            CDC_WINDOW,
            q_cdc_chunks,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "text"])
        stats: dict[str, list] = {}
        for s, t in zip(docs["source"], docs["text"]):
            cps = [ord(ch) for ch in t]
            cuts = []
            for i in range(len(cps) - CDC_WINDOW + 1):
                h = 0
                for j in range(CDC_WINDOW):
                    h = (h + cps[i + j] * pow(CDC_BASE, CDC_WINDOW - 1 - j, CDC_MOD)) % CDC_MOD
                if h % CDC_MASK == 0:
                    cuts.append(i + CDC_WINDOW)
            bounds = [0] + cuts + [len(cps)]
            lens = [b - a for a, b in zip(bounds, bounds[1:]) if b > a]
            d = stats.setdefault(s, [0, 0, 0])
            d[0] += len(lens)
            d[1] += sum(lens)
            d[2] = max(d[2], max(lens) if lens else 0)
        got = q_cdc_chunks(sf_tiny).set_index("source")
        for s, (nc, ls, mx) in stats.items():
            assert int(got.loc[s, "n_chunks"]) == nc
            assert abs(got.loc[s, "mean_chunk_len"] - ls / nc) < 1e-6
            assert int(got.loc[s, "max_chunk_len"]) == mx

    def test_content_defined_shift_invariance(self, ray_session):
        # the defining CDC property: a prefix insertion only perturbs
        # chunk boundaries locally; downstream boundaries re-align
        from searchengine_ray.pipelines.queries import (
            CDC_BASE,
            CDC_MASK,
            CDC_MOD,
            CDC_WINDOW,
        )

        rng = np.random.RandomState(3)
        body = "".join(chr(97 + c) for c in rng.randint(0, 26, size=3000))

        def cuts_of(t: str) -> list[int]:
            cps = [ord(ch) for ch in t]
            out = []
            for i in range(len(cps) - CDC_WINDOW + 1):
                h = 0
                for j in range(CDC_WINDOW):
                    h = (h + cps[i + j] * pow(CDC_BASE, CDC_WINDOW - 1 - j, CDC_MOD)) % CDC_MOD
                if h % CDC_MASK == 0:
                    out.append(i + CDC_WINDOW)
            return out

        base = cuts_of(body)
        shifted = cuts_of("XYZ" + body)
        # all original boundaries reappear shifted by 3 (minus any in
        # the first perturbed window)
        re_aligned = {c + 3 for c in base if c > CDC_WINDOW}
        assert re_aligned <= set(shifted)


class TestEnergyDistance:
    def test_matches_pairwise_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_energy_distance

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["lang", "n_chars"])
        x = docs.loc[docs["lang"] == "en", "n_chars"].to_numpy(np.int64)
        y = docs.loc[docs["lang"] == "de", "n_chars"].to_numpy(np.int64)
        exy = np.abs(x[:, None] - y[None, :]).mean()
        exx = np.abs(x[:, None] - x[None, :]).mean()
        eyy = np.abs(y[:, None] - y[None, :]).mean()
        e = 2 * exy - exx - eyy
        got = q_energy_distance(sf_tiny)
        assert int(got["n_en"].iloc[0]) == len(x)
        assert int(got["n_de"].iloc[0]) == len(y)
        assert abs(got["energy_dist"].iloc[0] - e) < 1e-6
        assert got["energy_dist"].iloc[0] >= -1e-9  # energy distance >= 0


class TestQuantileNormalize:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_quantile_normalize

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["source", "n_chars"])
        pooled = np.sort(docs["n_chars"].to_numpy(np.int64))
        N = len(pooled)
        got = q_quantile_normalize(sf_tiny).set_index("source")
        for src, g in docs.groupby("source"):
            v = np.sort(g["n_chars"].to_numpy(np.int64))
            n_s = len(v)
            mapped = pooled[(np.arange(n_s) * N) // n_s]
            d = np.abs(mapped - v)
            assert int(got.loc[src, "n"]) == n_s
            assert abs(got.loc[src, "mean_abs_shift"] - d.mean()) < 1e-6
            assert int(got.loc[src, "max_shift"]) == int(d.max())
