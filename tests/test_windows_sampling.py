"""Windowed aggregates, range join, sampling, group top-k vs brute-force oracles."""

import numpy as np
import pandas as pd
import pytest

from searchengine_ray.functions.joins import range_join
from searchengine_ray.functions.sampling import (
    _hash_pct,
    group_topk,
    hash_sample,
    stratified_sample,
)
from searchengine_ray.functions.windows import sessionize, sliding_window_agg


def _events(n, n_users, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "eid": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 5_000_000, n), unit="s"),
            "uid": rng.integers(0, n_users, n).astype(np.int64),
            "val": rng.random(n).round(6),
            "kind": rng.choice(["a", "b", "c"], n),
        }
    )


def test_sliding_window_matches_bruteforce(ray_session):
    import ray.data as rd

    df = _events(600, 10, seed=7)
    size, hop = 3_600_000_000, 900_000_000
    got = (
        sliding_window_agg(
            rd.from_pandas(df), ts_col="ts", keys=["kind"], value_col="val",
            size_us=size, hop_us=hop,
        )
        .to_pandas()
        .sort_values(["window", "kind"])
        .reset_index(drop=True)
    )
    # brute force: replicate each event into its 4 windows
    t = df["ts"].astype("int64").to_numpy()
    rows = []
    for j in range(size // hop):
        w = t // hop - j
        rows.append(pd.DataFrame({"window": w, "kind": df["kind"], "val": df["val"]}))
    want = (
        pd.concat(rows)
        .groupby(["window", "kind"], as_index=False)
        .agg(n_events=("val", "size"), sum_value=("val", "sum"))
        .sort_values(["window", "kind"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["window"].to_numpy() == want["window"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert np.allclose(got["sum_value"], want["sum_value"])


def test_sliding_window_rejects_nonmultiple(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError):
        sliding_window_agg(
            rd.from_pandas(_events(5, 2, 0)), "ts", ["kind"], "val",
            size_us=1000, hop_us=300,
        )


def test_sessionize_matches_bruteforce(ray_session):
    import ray.data as rd

    df = _events(800, 12, seed=11)
    gap = 1_800_000_000
    got = (
        sessionize(
            rd.from_pandas(df), user_col="uid", ts_col="ts", value_col="val",
            gap_us=gap, id_col="eid", n_buckets=5,
        )
        .to_pandas()
        .sort_values(["uid", "session"])
        .reset_index(drop=True)
    )
    # brute force gaps-and-islands in pandas
    d = df.sort_values(["uid", "ts", "eid"]).reset_index(drop=True)
    t = d["ts"].astype("int64")
    brk = (d["uid"] != d["uid"].shift()) | ((t - t.shift()) > gap)
    d["gsess"] = brk.cumsum()
    want = (
        d.groupby("gsess", sort=True)
        .agg(
            uid=("uid", "first"),
            session_start=("ts", lambda s: s.astype("int64").min()),
            n_events=("val", "size"),
            sum_value=("val", "sum"),
        )
        .reset_index(drop=True)
    )
    want["session"] = want.groupby("uid").cumcount() + 1
    want = want.sort_values(["uid", "session"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["uid"].to_numpy() == want["uid"].to_numpy()).all()
    assert (got["session"].to_numpy() == want["session"].to_numpy()).all()
    assert (got["session_start"].to_numpy() == want["session_start"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == want["n_events"].to_numpy()).all()
    assert np.allclose(got["sum_value"], want["sum_value"])


def test_range_join_matches_bruteforce(ray_session):
    import ray.data as rd

    left = _events(400, 8, seed=3)
    anchors = _events(60, 8, seed=4).rename(columns={"eid": "aid"})
    win = 100_000 * 10**9  # ~28h in ns (from_pandas keeps ns timestamps)
    a = anchors.assign(
        s=anchors["ts"].astype("int64"), e=anchors["ts"].astype("int64") + win
    )[["aid", "s", "e"]]
    got = (
        range_join(
            rd.from_pandas(left), rd.from_pandas(a),
            left_ts="ts", right_start="s", right_end="e",
            left_cols=["eid"], right_cols=["aid"],
            bucket_us=2 * win, suffix="",
        )
        .to_pandas()
        .sort_values(["aid", "eid"])
        .reset_index(drop=True)
    )
    t = left["ts"].astype("int64").to_numpy()
    pairs = [
        (aid, eid)
        for aid, s, e in a.itertuples(index=False)
        for eid in left["eid"].to_numpy()[(t >= s) & (t < e)]
    ]
    want = pd.DataFrame(pairs, columns=["aid", "eid"]).sort_values(
        ["aid", "eid"]
    ).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["aid"].to_numpy() == want["aid"].to_numpy()).all()
    assert (got["eid"].to_numpy() == want["eid"].to_numpy()).all()
    assert got["eid"].dtype == np.int64


def test_range_join_empty_right(ray_session):
    import ray.data as rd

    left = _events(50, 4, seed=5)
    a = pd.DataFrame(
        {"aid": pd.Series([], dtype="int64"), "s": pd.Series([], dtype="int64"),
         "e": pd.Series([], dtype="int64")}
    )
    out = range_join(
        rd.from_pandas(left), rd.from_pandas(a),
        left_ts="ts", right_start="s", right_end="e",
        left_cols=["eid"], right_cols=["aid"], bucket_us=10**9, suffix="",
    ).to_pandas()
    assert len(out) == 0


def test_group_topk_matches_bruteforce(ray_session):
    import ray.data as rd

    df = _events(500, 6, seed=9)
    got = (
        group_topk(
            rd.from_pandas(df), group_col="kind", order_col="val",
            tie_col="eid", k=4,
        )
        .to_pandas()
        .sort_values(["kind", "rank"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["kind", "val", "eid"], ascending=[True, False, True])
        .groupby("kind")
        .head(4)
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for kind, grp in got.groupby("kind"):
        wk = want[want["kind"] == kind]
        assert (grp.sort_values("rank")["eid"].to_numpy() == wk["eid"].to_numpy()).all()
        assert (grp["rank"].sort_values().to_numpy() == np.arange(1, len(wk) + 1)).all()


def test_hash_sample_deterministic_and_exact(ray_session):
    import ray.data as rd

    df = _events(2000, 5, seed=13)
    got = hash_sample(rd.from_pandas(df), "eid", 20).to_pandas()
    keep = _hash_pct(df["eid"].to_numpy()) < 20
    assert set(got["eid"]) == set(df["eid"][keep])
    # again → identical selection
    got2 = hash_sample(rd.from_pandas(df), "eid", 20).to_pandas()
    assert set(got2["eid"]) == set(got["eid"])
    # rate in the right ballpark
    assert 0.1 < len(got) / len(df) < 0.3


def test_stratified_sample_rates(ray_session):
    import ray.data as rd

    df = _events(3000, 5, seed=17)
    got = stratified_sample(
        rd.from_pandas(df), key_col="eid", strata_col="kind",
        rates={"a": 50}, default_pct=10,
    ).to_pandas()
    pct = _hash_pct(df["eid"].to_numpy())
    want_mask = np.where(df["kind"].to_numpy() == "a", pct < 50, pct < 10)
    assert set(got["eid"]) == set(df["eid"][want_mask])


class TestRunningTotal:
    def test_per_user_order_and_ties(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.windows import running_total

        # user 1: ts tie at 20 broken by event_id; user 2 isolated
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([10, 20, 20, 5, 30], pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "value": pa.array([1.5, 2.0, 4.0, 10.0, 0.25], pa.float64()),
            }
        )
        out = (
            running_total(rd.from_arrow(t), "user_id", "ts", "value", "event_id")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out["running"].tolist() == [1.5, 3.5, 7.5, 10.0, 10.25]


class TestLagDelta:
    def test_per_user_lag_and_nulls(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.windows import lag_delta

        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "ts": pa.array([10, 20, 20, 5, 30], pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
                "value": pa.array([1.5, 2.0, 4.0, 10.0, 0.25], pa.float64()),
            }
        )
        out = (
            lag_delta(rd.from_arrow(t), "user_id", "ts", "value", "event_id")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # first event per user -> NULL prev/delta; ts tie broken by id
        assert out["prev"].isna().tolist() == [True, False, False, True, False]
        assert out["prev"].tolist()[1:3] == [1.5, 2.0]
        assert out["delta"].tolist()[4] == -9.75


class TestFirstLastTwa:
    def test_first_last_and_twa(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.windows import (
            first_last_by_key,
            time_weighted_avg,
        )

        # user 1: values 1.0 (held 10us), 3.0 (held 30us), 5.0 (last, no hold)
        # user 2: single event -> twa NULL
        t = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array([0, 10, 40, 7], pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 2], pa.int64()),
                "kind": pa.array(["a", "b", "c", "z"]),
                "value": pa.array([1.0, 3.0, 5.0, 9.0], pa.float64()),
            }
        )
        fl = (
            first_last_by_key(rd.from_arrow(t), "user_id", "ts", "event_id", ["kind", "value"])
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        assert fl["first_kind"].tolist() == ["a", "z"]
        assert fl["last_kind"].tolist() == ["c", "z"]
        assert fl["last_value"].tolist() == [5.0, 9.0]

        twa = (
            time_weighted_avg(rd.from_arrow(t), "user_id", "ts", "value", "event_id")
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        assert twa["twa"][0] == (1.0 * 10 + 3.0 * 30) / 40
        assert twa["twa"].isna().tolist() == [False, True]


class TestAnalytics:
    def test_retention_small(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.analytics import retention_cohorts

        day = 86_400_000_000
        rows = [  # user 1: first day 0, active days 0,1,1; user 2: first day 1, active 1,3
            (1, 0), (1, day), (1, day + 5), (2, day), (2, 3 * day),
        ]
        t = pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            }
        )
        out = retention_cohorts(rd.from_arrow(t))
        got = {(r.cohort_day, r.day_offset): r.n_users for r in out.itertuples(index=False)}
        assert got == {(0, 0): 1, (0, 1): 1, (1, 0): 1, (1, 2): 1}

    def test_cube_margins_consistent(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.analytics import cube_events

        ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet").repartition(4)
        out = cube_events(ev)
        total = out[(out.event_type == "ALL") & (out.day == -1)]
        assert len(total) == 1
        n_all = int(total["n_events"].iloc[0])
        by_type = out[(out.event_type != "ALL") & (out.day == -1)]
        by_day = out[(out.event_type == "ALL") & (out.day != -1)]
        cells = out[(out.event_type != "ALL") & (out.day != -1)]
        assert by_type["n_events"].sum() == n_all
        assert by_day["n_events"].sum() == n_all
        assert cells["n_events"].sum() == n_all

    def test_pivot_unknown_type_raises(self, ray_session):
        import ray
        import ray.data as rd

        from searchengine_ray.functions.analytics import pivot_user_events

        ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
        with pytest.raises((ValueError, ray.exceptions.RayTaskError, ray.exceptions.UserCodeException)):
            pivot_user_events(ev, ["click", "view"])  # missing types → schema error

    def test_pivot_counts_match_groupby(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.analytics import pivot_user_events

        ev = rd.read_parquet("/root/testdata/sf0.001/events.parquet")
        out = pivot_user_events(ev, ["click", "error", "purchase", "signup", "view"])
        df = ev.to_pandas()
        want = df.groupby("user_id").size()
        got = out.set_index("user_id")[["click", "error", "purchase", "signup", "view"]].sum(axis=1)
        assert got.sort_index().equals(want.sort_index())


class TestEventPaths:
    def test_trigrams_respect_session_boundaries(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        import searchengine_ray.pipelines.queries as Q

        us = 1_000_000
        rows = []
        # user 1: a>b>c then a 31-min gap, then d>e>f (two sessions)
        for i, (et, t) in enumerate(
            [("a", 0), ("b", 60), ("c", 120), ("d", 120 + 31 * 60), ("e", 120 + 32 * 60), ("f", 120 + 33 * 60)]
        ):
            rows.append((i, t * us, 1, et))
        t = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
            }
        )
        pq.write_table(t, tmp_path / "events.parquet")
        out = Q.q_event_paths(str(tmp_path))
        got = dict(zip(out["path"], out["n"]))
        assert got == {"a>b>c": 1, "d>e>f": 1}  # no cross-gap trigrams


class TestFunnelEmptyStep:
    def test_no_step1_matches_yields_zero_counts(self, ray_session):
        """Regression (round 5): a bucket with zero step-1 events but
        later-step rows must short-circuit, not index an empty reached
        array inside np.where."""
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from searchengine_ray.functions.windows import funnel_counts

        df = pd.DataFrame(
            {
                "user_id": np.repeat(np.arange(50), 2).astype(np.int64),
                "ts": pd.to_datetime(np.arange(100), unit="s"),
                "event_type": ["click", "purchase"] * 50,
                "event_id": np.arange(100, dtype=np.int64),
            }
        )
        out = funnel_counts(
            rd.from_pandas(df), "user_id", "ts", "event_type", "event_id"
        ).to_pandas()
        assert out[["n_step1", "n_step2", "n_step3"]].sum().sum() == 0
