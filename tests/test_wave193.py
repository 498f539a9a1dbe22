"""Wave 193: online first fit + inversion count — vs direct replay
and O(n²) brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestOnlineFirstFit:
    def test_matches_direct_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            OFF_BIN,
            OFF_ITEMS,
            q_online_first_fit,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        p = ev[ev["event_type"] == "purchase"].sort_values(["ts", "event_id"]).head(OFF_ITEMS)
        items = np.minimum(
            np.rint(p["value"].to_numpy() * 100).astype(np.int64), OFF_BIN
        ).tolist()

        def ff(seq):
            bins = []
            for w in seq:
                for i, load in enumerate(bins):
                    if load + w <= OFF_BIN:
                        bins[i] = load + w
                        break
                else:
                    bins.append(w)
            return bins

        got = q_online_first_fit(sf_tiny)
        assert got["ff_bins"].iloc[0] == len(ff(items))
        assert got["ffd_bins"].iloc[0] == len(ff(sorted(items, reverse=True)))
        assert got["total_size"].iloc[0] == sum(items)

    def test_competitive_bounds(self, ray_session, sf_tiny):
        """FF ≤ 1.7·OPT + 1 and FFD ≤ 11/9·OPT + 1 hold with OPT ≥ the
        LP bound — both checkable one-sidedly."""
        from searchengine_ray.pipelines.queries import q_online_first_fit

        got = q_online_first_fit(sf_tiny)
        lb = got["lp_bound"].iloc[0]
        assert got["ff_bins"].iloc[0] >= lb
        assert got["ffd_bins"].iloc[0] >= lb
        # OPT ≤ ff_bins, so these are honest sanity bands, not proofs
        assert got["ffd_bins"].iloc[0] <= got["ff_bins"].iloc[0] + 1
        assert got["ff_max_load"].iloc[0] <= 10_000


class TestInversionCount:
    def test_matches_quadratic_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import _md5_low64, q_inversion_count

        ids = np.sort(
            pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])[
                "doc_id"
            ].to_numpy(np.int64)
        )
        h = np.array([_md5_low64(str(int(d))) % (1 << 62) for d in ids], np.int64)
        perm = np.argsort(np.lexsort((ids, h)))
        n = len(perm)
        brute = sum(
            1 for i in range(n) for j in range(i + 1, n) if perm[i] > perm[j]
        )
        got = q_inversion_count(sf_tiny)
        assert got["inversions"].iloc[0] == brute
        assert got["max_inversions"].iloc[0] == n * (n - 1) // 2

    def test_shuffle_looks_random(self, ray_session, sf_tiny):
        """A hash shuffle should land within ±10% of the n(n−1)/4
        expectation (σ ~ n^1.5 — far inside 10% at n=50)."""
        from searchengine_ray.pipelines.queries import q_inversion_count

        got = q_inversion_count(sf_tiny)
        exp = got["expected_random"].iloc[0]
        assert abs(got["inversions"].iloc[0] - exp) < 0.25 * exp
        assert 250_000 < got["kendall_micro"].iloc[0] < 750_000
