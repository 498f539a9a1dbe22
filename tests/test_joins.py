"""asof_join: Ray operator vs a global pandas merge_asof oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from searchengine_ray.functions.joins import asof_join


def _events(n, n_users, seed, start=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "eid": np.arange(start, start + n, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000_000, n), unit="s"),
            "uid": rng.integers(0, n_users, n).astype(np.int64),
            "val": rng.random(n).round(6),
        }
    )


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_oracle(ray_session, direction):
    import ray.data as rd

    left = _events(400, 25, seed=1)
    right = _events(300, 25, seed=2, start=10_000)
    got = (
        asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="ts", by="uid", left_cols=["eid"], right_cols=["eid", "val"],
            direction=direction, n_buckets=8,
        )
        .to_pandas()
        .sort_values("eid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"eid": "eid_r", "val": "val_r"})[
            ["ts", "uid", "eid_r", "val_r"]
        ],
        on="ts", by="uid", direction=direction,
    ).dropna(subset=["eid_r"]).sort_values("eid").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["eid"].to_numpy() == want["eid"].to_numpy()).all()
    assert (got["eid_r"].to_numpy() == want["eid_r"].to_numpy(np.int64)).all()
    assert got["eid_r"].dtype == np.int64  # typed output survives the union
    assert np.allclose(got["val_r"], want["val_r"])


def test_asof_empty_side(ray_session):
    import ray.data as rd

    left = _events(50, 5, seed=3)
    right = left.iloc[0:0]
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="ts", by="uid", left_cols=["eid"], right_cols=["eid"],
        n_buckets=4,
    ).to_pandas()
    assert len(out) == 0
    # Ray may drop the schema of an all-empty pandas block set; if
    # columns survive they must be the operator's contract
    if len(out.columns):
        assert list(out.columns) == ["uid", "ts", "eid", "eid_r"]


class TestSemiAntiJoin:
    def _sides(self, rd):
        import pyarrow as pa

        left = pa.table(
            {"k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
             "v": pa.array(list("abcdef"))}
        )
        right = pa.table({"rk": pa.array([2, 2, 4, 9], pa.int64())})
        return rd.from_arrow(left).repartition(3), rd.from_arrow(right).repartition(2)

    def test_semi_and_anti_broadcast(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.joins import semi_anti_join

        left, right = self._sides(rd)
        semi = semi_anti_join(left, right, "k", "rk").to_pandas()
        anti = semi_anti_join(left, right, "k", "rk", anti=True).to_pandas()
        assert sorted(semi["k"].tolist()) == [2, 4]
        assert sorted(anti["k"].tolist()) == [1, 3, 5, 6]

    def test_copartition_tier_matches_broadcast(self, ray_session):
        import ray.data as rd

        from searchengine_ray.functions.joins import semi_anti_join

        left, right = self._sides(rd)
        for anti in (False, True):
            a = (
                semi_anti_join(left, right, "k", "rk", anti=anti)
                .to_pandas().sort_values("k").reset_index(drop=True)
            )
            left2, right2 = self._sides(rd)
            b = (
                semi_anti_join(left2, right2, "k", "rk", anti=anti, broadcast_limit=0)
                .to_pandas().sort_values("k").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(a[["k", "v"]], b[["k", "v"]])
