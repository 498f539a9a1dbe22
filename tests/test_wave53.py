"""Brute-force identity tests for the CDC/agreement/control wave
(registry 301-303: merge_upsert, cohens_kappa, cusum_control)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


def _upsert_brute(ev: pd.DataFrame, split_day: int) -> pd.DataFrame:
    ev = ev.copy()
    ev["day"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
    ).astype(int)
    ev["is_upd"] = (ev["day"] >= split_day).astype(int)
    rows = {}
    for uid, g in ev.groupby("user_id"):
        per = {}
        for p, gg in g.groupby("is_upd"):
            last = gg.sort_values(["ts", "event_id"]).iloc[-1]
            per[p] = last
        if set(per) == {0, 1}:
            action, fin = "update", per[1]
        elif 1 in per:
            action, fin = "insert", per[1]
        else:
            action, fin = "carry", per[0]
        rows.setdefault(action, []).append(round(round(fin["value"], 6) * 1e6))
    return pd.DataFrame(
        sorted(
            (a, len(v), int(sum(v))) for a, v in rows.items()
        ),
        columns=["action", "n_keys", "value_micro"],
    )


class TestMergeUpsert:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            UPSERT_BASE_DAYS,
            q_merge_upsert,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        min_day = int(
            ev["ts"].astype("datetime64[us]").astype("int64").min() // 86_400_000_000
        )
        want = _upsert_brute(ev, min_day + UPSERT_BASE_DAYS)
        got = q_merge_upsert(sf_tiny)
        pd.testing.assert_frame_equal(
            got, want.astype({"n_keys": "int64", "value_micro": "int64"})
        )

    def test_all_three_actions(self, ray_session, tmp_path):
        # synthetic stream covering insert (key only after the split),
        # carry (only before) and update (both sides, latest-wins)
        from searchengine_ray.pipelines.queries import (
            UPSERT_BASE_DAYS,
            q_merge_upsert,
        )

        day0 = pd.Timestamp("2024-01-01")
        split = UPSERT_BASE_DAYS
        rows = [
            # carry: user 1 only in base
            (1, 1, day0, 1.5),
            (2, 1, day0 + pd.Timedelta(days=2), 2.5),
            # update: user 2 in both; final = latest update row
            (3, 2, day0 + pd.Timedelta(days=1), 10.0),
            (4, 2, day0 + pd.Timedelta(days=split + 1), 11.0),
            (5, 2, day0 + pd.Timedelta(days=split + 2), 12.25),
            # insert: user 3 only after the split
            (6, 3, day0 + pd.Timedelta(days=split + 3), 7.125),
            # tie-break: same ts, higher event_id wins
            (8, 4, day0 + pd.Timedelta(days=1), 100.0),
            (7, 4, day0 + pd.Timedelta(days=1), 50.0),
        ]
        ev = pd.DataFrame(
            rows, columns=["event_id", "user_id", "ts", "value"]
        ).astype({"ts": "datetime64[us]"})
        ev.to_parquet(tmp_path / "events.parquet")
        got = q_merge_upsert(str(tmp_path)).set_index("action")
        assert got.loc["carry", "n_keys"] == 2  # users 1 and 4
        assert got.loc["update", "n_keys"] == 1
        assert got.loc["insert", "n_keys"] == 1
        # carry keeps the latest base rows: user1→2.5, user4→100.0 (id 8)
        assert got.loc["carry", "value_micro"] == int(102.5 * 1e6)
        assert got.loc["update", "value_micro"] == int(12.25 * 1e6)
        assert got.loc["insert", "value_micro"] == int(7.125 * 1e6)


class TestCohensKappa:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.functions.textstats import lang_id_batch
        from searchengine_ray.pipelines.queries import q_cohens_kappa
        import pyarrow as pa

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet")
        pred = lang_id_batch(pa.Table.from_pandas(docs))["lang_pred"].to_numpy(
            zero_copy_only=False
        )
        p_en = pred == "en"
        t_en = docs["lang"].to_numpy() == "en"
        tp = int(np.sum(p_en & t_en))
        fp = int(np.sum(p_en & ~t_en))
        fn = int(np.sum(~p_en & t_en))
        tn = int(np.sum(~p_en & ~t_en))
        n = tp + fp + fn + tn
        po = (tp + tn) / n
        pe = ((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)) / n / n
        got = q_cohens_kappa(sf_tiny)
        assert (
            got.loc[0, ["tp", "fp", "fn", "tn"]].tolist() == [tp, fp, fn, tn]
        )
        assert got["p_o"].iloc[0] == pytest.approx(po, abs=1e-6)
        assert got["kappa"].iloc[0] == pytest.approx(
            (po - pe) / (1 - pe), abs=1e-6
        )

    def test_kappa_bounds(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cohens_kappa

        got = q_cohens_kappa(sf_tiny)
        assert -1.0 <= got["kappa"].iloc[0] <= 1.0
        assert 0.0 <= got["p_e"].iloc[0] <= 1.0


class TestCusumControl:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cusum_control

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet", columns=["ts"])
        day = (
            ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000
        ).astype(int)
        x = day.value_counts().sort_index().to_numpy(np.float64)
        mu, sig = x.mean(), x.std()
        k, h = sig / 2.0, 4.0 * sig
        sh = sl = 0.0
        n_hi = n_lo = 0
        for c in x:
            sh = max(0.0, sh + (c - mu - k))
            if sh > h:
                n_hi, sh = n_hi + 1, 0.0
            sl = max(0.0, sl + (mu - c - k))
            if sl > h:
                n_lo, sl = n_lo + 1, 0.0
        got = q_cusum_control(sf_tiny)
        assert got["n_days"].iloc[0] == len(x)
        assert got["mu"].iloc[0] == pytest.approx(mu, abs=1e-6)
        assert got["sigma"].iloc[0] == pytest.approx(sig, abs=1e-6)
        assert got["n_alarm_hi"].iloc[0] == n_hi
        assert got["n_alarm_lo"].iloc[0] == n_lo
        assert got["s_hi"].iloc[0] == pytest.approx(sh, abs=1e-6)
        assert got["s_lo"].iloc[0] == pytest.approx(sl, abs=1e-6)

    def test_cusum_nonnegative(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_cusum_control

        got = q_cusum_control(sf_tiny)
        assert got["s_hi"].iloc[0] >= 0.0
        assert got["s_lo"].iloc[0] >= 0.0
        assert got["sigma"].iloc[0] > 0.0
