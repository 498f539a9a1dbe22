"""Wave 172: seam carving + optimal BST — vs exhaustive-path /
recursive-memo brute force."""

from __future__ import annotations

import functools
import itertools

import numpy as np
import pandas as pd


class TestSeamCarve:
    def test_matches_exhaustive_paths(self, ray_session, sf_tiny):
        """Enumerate EVERY monotone vertical path on a few images and
        check the DP found the minimum (ties → lexicographically
        smallest path top-down... the DP's leftmost rule)."""
        from searchengine_ray.functions.multimodal import decode_bmp, synth_bmp_payload
        from searchengine_ray.pipelines.queries import q_seam_carve

        got = q_seam_carve(sf_tiny).set_index("doc_id")
        for did in [0, 3, 17, 25]:
            img = decode_bmp(synth_bmp_payload(did))[:, :, 0].astype(np.int64)
            h, w = img.shape
            xl = np.maximum(np.arange(w) - 1, 0)
            xr = np.minimum(np.arange(w) + 1, w - 1)
            e = np.abs(img[:, xr] - img[:, xl])

            best = None
            # enumerate paths via DFS over moves {-1,0,1}
            def walk(y, x, energy, path):
                nonlocal best
                if y == h:
                    key = (energy, tuple(path))
                    if best is None or key < best:
                        best = key
                    return
                for dx in (-1, 0, 1):
                    nx = x + dx
                    if 0 <= nx < w:
                        walk(y + 1, nx, energy + int(e[y, nx]), path + [nx])

            for x0 in range(w):
                walk(1, x0, int(e[0, x0]), [x0])
            row = got.loc[did]
            assert row["seam_energy"] == best[0], did
            # energy agrees; the DP's leftmost-tie path stats are
            # internally consistent
            assert 0 <= row["top_x"] < w and 0 <= row["bottom_x"] < w
            assert row["sum_x"] >= 0

    def test_seam_is_monotone_bounded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_seam_carve

        got = q_seam_carve(sf_tiny)
        # Σx of a path of h cells each < w
        assert (got["sum_x"] < got["height"] * got["width"]).all()
        assert (got["seam_energy"] >= 0).all()


class TestObstDp:
    def test_matches_recursive_memo(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_obst_dp

        got = q_obst_dp(sf_tiny)
        n = len(got)
        # reconstruct frequencies from the output? recompute from corpus
        import collections

        from searchengine_ray.pipelines.queries import OBST_N, _engine

        eng = _engine(sf_tiny, "punct")
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cf = collections.Counter()
        for t in docs["text"]:
            cf.update(eng.analyze(t))
        top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:OBST_N]
        keys = sorted(top)  # alphabetical
        f = [v for _, v in keys]
        pref = np.concatenate([[0], np.cumsum(f)])

        @functools.lru_cache(maxsize=None)
        def opt(i, j):
            if j < i:
                return 0
            w = int(pref[j] - pref[i - 1])
            return min(opt(i, r - 1) + opt(r + 1, j) + w for r in range(i, j + 1))

        n = len(f)
        assert got["full_cost"].iloc[0] == opt(1, n)
        # root term's optimality: splitting at the reported root gives
        # the reported cost
        r = int(got["full_root_idx"].iloc[0])
        w = int(pref[n])
        assert opt(1, r - 1) + opt(r + 1, n) + w == opt(1, n)
        assert got["full_root_term"].iloc[0] == keys[r - 1][0]
        # per-length sums
        for row in got.itertuples():
            L = int(row.length)
            tot = sum(opt(i, i + L - 1) for i in range(1, n - L + 2))
            assert row.sum_costs == tot
            assert row.n_intervals == n - L + 1

    def test_cost_bounds(self, ray_session, sf_tiny):
        """Weighted-depth bounds: total_freq ≤ cost ≤ total_freq·n
        (every key sits at depth ≥1 and ≤ n)."""
        from searchengine_ray.pipelines.queries import q_obst_dp

        got = q_obst_dp(sf_tiny)
        W = got["total_freq"].iloc[0]
        n = len(got)
        assert W <= got["full_cost"].iloc[0] <= W * n
        # costs grow with interval length on average
        s = got.sort_values("length")["sum_costs"].to_numpy()
        assert s[-1] == got["full_cost"].iloc[0]
