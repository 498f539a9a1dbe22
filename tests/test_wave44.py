"""Brute-force identity tests for the Viterbi / Kalman wave
(registry 281-282)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _daily_counts(sf: str) -> np.ndarray:
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["ts"])
    day = (ev["ts"].astype("int64") // 86_400_000_000).to_numpy(np.int64)
    return pd.Series(day).value_counts().sort_index().to_numpy(np.int64)


class TestViterbi:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            VITERBI_EMIT,
            VITERBI_STAY,
            q_viterbi_2state,
        )

        c = _daily_counts(sf_tiny)
        med = int(np.sort(c)[(len(c) + 1) // 2 - 1])
        obs = (c > med).astype(int)
        ls, lm = math.log(VITERBI_STAY), math.log(1 - VITERBI_STAY)
        lh, lx = math.log(VITERBI_EMIT), math.log(1 - VITERBI_EMIT)

        def em(s, o):
            return lh if s == o else lx

        lp = [math.log(0.5) + em(0, obs[0]), math.log(0.5) + em(1, obs[0])]
        for o in obs[1:]:
            lp = [
                max(lp[0] + ls, lp[1] + lm) + em(0, o),
                max(lp[1] + ls, lp[0] + lm) + em(1, o),
            ]
        got = q_viterbi_2state(sf_tiny)
        assert int(got["n_days"].iloc[0]) == len(obs)
        assert int(got["n_high_sign"].iloc[0]) == int(obs.sum())
        assert int(got["final_state"].iloc[0]) == (1 if lp[1] > lp[0] else 0)
        assert abs(got["viterbi_logp"].iloc[0] - max(lp)) < 1e-6
        # log-prob of the best path is bounded by the best possible
        # per-step score
        best_possible = math.log(0.5) + len(obs) * math.log(VITERBI_EMIT) + (
            len(obs) - 1
        ) * math.log(VITERBI_STAY) - math.log(VITERBI_STAY)
        assert got["viterbi_logp"].iloc[0] <= best_possible + 1e-9


class TestKalman:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            KALMAN_Q,
            KALMAN_R,
            q_kalman_filter,
        )

        y = _daily_counts(sf_tiny).astype(float)
        x, p, ai = y[0], KALMAN_R, 0.0
        for obs in y[1:]:
            pp = p + KALMAN_Q
            k = pp / (pp + KALMAN_R)
            innov = obs - x
            x += k * innov
            p = (1 - k) * pp
            ai += abs(innov)
        got = q_kalman_filter(sf_tiny)
        assert int(got["n_days"].iloc[0]) == len(y)
        assert abs(got["level"].iloc[0] - x) < 1e-6
        assert abs(got["variance"].iloc[0] - p) < 1e-6
        assert abs(got["mean_abs_innov"].iloc[0] - ai / (len(y) - 1)) < 1e-6

    def test_steady_state_variance(self, ray_session, sf_tiny):
        # the filtered variance converges to the Riccati fixed point
        from searchengine_ray.pipelines.queries import (
            KALMAN_Q,
            KALMAN_R,
            q_kalman_filter,
        )

        got = q_kalman_filter(sf_tiny)
        # fixed point of p = (1 - (p+q)/(p+q+r)) (p+q)
        p = KALMAN_R
        for _ in range(200):
            pp = p + KALMAN_Q
            p = (1 - pp / (pp + KALMAN_R)) * pp
        assert abs(got["variance"].iloc[0] - p) < 1e-3
