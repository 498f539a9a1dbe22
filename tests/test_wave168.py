"""Wave 168: IV/Wald estimator + TextTiling — vs direct
recomputation."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd


class TestIvWald:
    def test_matches_pandas_moments(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_iv_wald

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        per = ev.groupby("user_id").apply(
            lambda g: pd.Series(
                {
                    "x": int((g["event_type"] == "click").sum()),
                    "y": int(
                        np.rint(
                            g.loc[g["event_type"] == "purchase", "value"].to_numpy()
                            * 1e6
                        ).sum()
                    ),
                }
            ),
            include_groups=False,
        ).reset_index()
        z = per["user_id"].to_numpy(np.int64) % 2
        got = q_iv_wald(sf_tiny).set_index("z")
        for arm in (0, 1):
            m = z == arm
            assert got.loc[arm, "n_users"] == m.sum()
            assert got.loc[arm, "sum_clicks"] == per["x"][m].sum()
            assert got.loc[arm, "sum_rev_micro"] == per["y"][m].sum()
        dx = per["x"][z == 1].mean() - per["x"][z == 0].mean()
        dy = per["y"][z == 1].mean() - per["y"][z == 0].mean()
        assert abs(got["first_stage"].iloc[0] - round(dx, 6)) < 1e-6
        assert abs(got["beta_iv_micro"].iloc[0] - round(dy / dx, 6)) < 1e-4

    def test_wald_equals_2sls_closed_form(self, ray_session, sf_tiny):
        """With one binary instrument, 2SLS = cov(z,y)/cov(z,x): check
        the algebraic identity against the Wald ratio."""
        from searchengine_ray.pipelines.queries import q_iv_wald

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        per = ev.groupby("user_id").apply(
            lambda g: pd.Series(
                {
                    "x": float((g["event_type"] == "click").sum()),
                    "y": float(
                        np.rint(
                            g.loc[g["event_type"] == "purchase", "value"].to_numpy()
                            * 1e6
                        ).sum()
                    ),
                }
            ),
            include_groups=False,
        ).reset_index()
        z = (per["user_id"].to_numpy(np.int64) % 2).astype(float)
        cov_zy = np.cov(z, per["y"])[0, 1]
        cov_zx = np.cov(z, per["x"])[0, 1]
        got = q_iv_wald(sf_tiny)
        assert abs(got["beta_iv_micro"].iloc[0] - cov_zy / cov_zx) < 1e-3 * abs(
            cov_zy / cov_zx
        ) + 1e-6


class TestTextTiling:
    def _brute_one(self, toks, w, round_half_away):
        nb = len(toks) // w
        if nb < 3:
            return None
        import collections

        tfs = [collections.Counter(toks[i * w : (i + 1) * w]) for i in range(nb)]
        sims = []
        for i in range(nb - 1):
            a, b = tfs[i], tfs[i + 1]
            dot = sum(v * b[t] for t, v in a.items())
            cos = dot / math.sqrt(
                sum(v * v for v in a.values()) * sum(v * v for v in b.values())
            )
            sims.append(int(np.rint(round_half_away(cos, 6) * 1e6)))
        s = np.array(sims, np.int64)
        lmax = np.maximum.accumulate(s)
        rmax = np.maximum.accumulate(s[::-1])[::-1]
        depth = (lmax - s) + (rmax - s)
        mu = depth.sum() / len(depth)
        sd = math.sqrt(max((depth.astype(float) ** 2).sum() / len(depth) - mu * mu, 0))
        return (
            nb,
            len(s),
            int((depth > mu - sd / 2).sum()),
            int(np.lexsort((np.arange(len(depth)), -depth))[0]),
            int(depth.max()),
        )

    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            TILE_W,
            q_texttiling,
            round_half_away,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        got = q_texttiling(sf_tiny).set_index("doc_id")
        n_checked = 0
        for r in docs.itertuples():
            toks = [
                x
                for x in re.split(
                    r"[ \t\n\x0b\f\r]+", re.sub(r"[,.;?!]", " ", r.text.lower())
                )
                if x
            ]
            want = self._brute_one(toks, TILE_W, round_half_away)
            if want is None:
                assert int(r.doc_id) not in got.index
                continue
            n_checked += 1
            row = got.loc[int(r.doc_id)]
            assert (
                row["n_blocks"], row["n_gaps"], row["n_boundaries"],
                row["deepest_gap"], row["max_depth_micro"],
            ) == want, r.doc_id
        assert n_checked > 0

    def test_boundary_counts_sane(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_texttiling

        got = q_texttiling(sf_tiny)
        assert (got["n_gaps"] == got["n_blocks"] - 1).all()
        assert (got["n_boundaries"] <= got["n_gaps"]).all()
        assert (got["deepest_gap"] < got["n_gaps"]).all()
