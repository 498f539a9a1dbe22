"""Wave 182: CELF facility location + histogram equalization — vs
brute subset search and direct per-image recomputation."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


class TestCelfSelection:
    def test_greedy_guarantee_vs_exhaustive(self, ray_session, sf_tiny):
        """Greedy facility location carries the (1−1/e) guarantee —
        check it against the best exhaustive k=2 subset on the actual
        similarity block (k=2 keeps the search tractable)."""
        from searchengine_ray.pipelines.queries import (
            _md5_low64,  # noqa: F401  (import side effect free)
            q_celf_selection,
            round_half_away,
        )

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["vec_id", "embedding"])
        emb = emb.sort_values("vec_id").reset_index(drop=True)
        M = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
        ids = emb["vec_id"].to_numpy(np.int64)
        norms = np.sqrt((M**2).sum(axis=1))
        cand = ids % 10 == 0
        CM, cn = M[cand], norms[cand]
        cos = (M @ CM.T) / (norms[:, None] * cn[None, :])
        S = np.rint(round_half_away(cos, 6) * 1e6).astype(np.int64)

        def F(subset):
            if not subset:
                return 0
            return int(np.maximum(S[:, list(subset)].max(axis=1), 0).sum())

        # greedy k=2 from the entry's trace
        got = q_celf_selection(sf_tiny)
        cid_to_col = {int(c): i for i, c in enumerate(ids[cand])}
        g2 = F([cid_to_col[int(c)] for c in got["cand_id"].iloc[:2]])
        best2 = max(
            F(list(combo)) for combo in itertools.combinations(range(S.shape[1]), 2)
        )
        assert g2 >= (1 - 1 / np.e) * best2
        # objective trace is the running coverage
        assert (np.diff(got["objective_micro"].to_numpy()) >= 0).all()
        assert got["objective_micro"].iloc[0] == got["gain_micro"].iloc[0]

    def test_celf_saves_evaluations(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import CELF_K, q_celf_selection

        q_celf_selection(sf_tiny)
        celf_evals, naive_evals = q_celf_selection._last_evals
        assert celf_evals <= naive_evals
        assert celf_evals < naive_evals  # laziness must actually pay here


class TestHistEqualize:
    def test_matches_direct_per_image(self, ray_session, sf_tiny):
        from searchengine_ray.functions.multimodal import decode_bmp, synth_bmp_payload
        from searchengine_ray.pipelines.queries import q_hist_equalize, round_half_away

        got = q_hist_equalize(sf_tiny).set_index("doc_id")
        for did in [0, 7, 23]:
            img = decode_bmp(synth_bmp_payload(did))[:, :, 0].astype(np.int64).ravel()
            npix = len(img)
            hist = np.bincount(img, minlength=256)
            cdf = np.cumsum(hist)
            cdf_min = int(cdf[np.flatnonzero(hist)[0]])
            mapped = (cdf[img] - cdf_min) * 255 // max(npix - cdf_min, 1)
            hist2 = np.bincount(mapped, minlength=256)

            def ent(h):
                p = h[h > 0] / npix
                return int(
                    np.rint(round_half_away(-p * np.log2(p), 6) * 1e6).sum()
                )

            row = got.loc[did]
            assert row["n_pixels"] == npix
            assert row["distinct_before"] == int((hist > 0).sum())
            assert row["distinct_after"] == int((hist2 > 0).sum())
            assert row["entropy_before_micro"] == ent(hist)
            assert row["entropy_after_micro"] == ent(hist2)

    def test_equalized_range_stretched(self, ray_session, sf_tiny):
        """Equalization maps the max gray level to 255 by construction
        and never increases the distinct-level count."""
        from searchengine_ray.pipelines.queries import q_hist_equalize

        got = q_hist_equalize(sf_tiny)
        assert (got["distinct_after"] <= got["distinct_before"]).all()
        assert (got["n_pixels"] >= 64).all()
