"""Brute-force identity tests for the edit-distance and bandit-replay
wave (registry 285-286)."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _lev_ref(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


class TestEditDistance:
    def test_matches_textbook_dp(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import EDIT_PREFIX, q_edit_distance_stats

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "source", "text"]
        ).sort_values("doc_id")
        txt = [t[:EDIT_PREFIX] for t in docs["text"]]
        src = docs["source"].to_numpy()
        per: dict[str, list[int]] = {}
        for s, a, b in zip(src[:-1], txt[:-1], txt[1:]):
            per.setdefault(s, []).append(_lev_ref(a, b))
        got = q_edit_distance_stats(sf_tiny).set_index("source")
        for s, ds in per.items():
            assert int(got.loc[s, "n_pairs"]) == len(ds)
            assert abs(got.loc[s, "mean_dist"] - np.mean(ds)) < 1e-6
            assert int(got.loc[s, "max_dist"]) == max(ds)

    def test_known_distances(self, ray_session):
        assert _lev_ref("kitten", "sitting") == 3
        assert _lev_ref("", "abc") == 3
        assert _lev_ref("abc", "abc") == 0


class TestBanditReplay:
    def test_matches_sequential_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bandit_replay

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts", "event_type"])
        day = ev["ts"].astype("int64") // 86_400_000_000
        counts = ev.assign(day=day).groupby(["day", "event_type"]).size().unstack(fill_value=0)
        arms = sorted(counts.columns)
        counts = counts[arms].sort_index()
        winners = np.argmax(counts.to_numpy(), axis=1)
        MOD = 2147483647
        pulls = np.zeros(5, np.int64)
        wins = np.zeros(5, np.int64)
        for t, w in enumerate(winners, 1):
            draw = (16807 * ((t * 131071) % MOD)) % MOD
            if draw % 5 == 0:
                arm = int(draw % 5)
            else:
                means = np.where(pulls > 0, wins / np.maximum(pulls, 1), 0.0)
                arm = int(np.argmax(means))
            pulls[arm] += 1
            wins[arm] += int(arm == w)
        got = q_bandit_replay(sf_tiny)
        assert list(got["pulls"]) == list(pulls)
        assert list(got["wins"]) == list(wins)
        assert int(got["total_reward"].iloc[0]) == int(wins.sum())
        # conservation: pulls sum to the number of days
        assert int(got["pulls"].sum()) == len(winners)
