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
