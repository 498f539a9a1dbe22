"""Brute-force identity tests for the LPA/SCD2 wave (registry 309-310)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _lpa_brute(n: int, rounds: int):
    ids = np.arange(n, dtype=np.int64)
    raw = np.concatenate(
        [
            np.stack([ids, (ids * 7 + 13) % n], axis=1),
            np.stack([ids, (ids * 31 + 5) % n], axis=1),
            np.stack([ids, ids % 10], axis=1),
        ]
    )
    raw = raw[raw[:, 0] != raw[:, 1]]
    canon = {(min(a, b), max(a, b)) for a, b in raw}
    nbrs: dict[int, list[int]] = {}
    for u, v in canon:
        nbrs.setdefault(int(u), []).append(int(v))
        nbrs.setdefault(int(v), []).append(int(u))
    lab = list(range(n))
    for _ in range(rounds):
        nxt = lab[:]
        for v in range(n):
            if v not in nbrs:
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[lab[u]] = counts.get(lab[u], 0) + 1
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        lab = nxt
    return lab


class TestLabelPropagation:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.queries import (
            LPA_ROUNDS,
            LPA_TOPK,
            q_label_propagation,
        )

        n = pq.read_metadata(f"{sf_tiny}/documents.parquet").num_rows
        lab = _lpa_brute(n, LPA_ROUNDS)
        sizes: dict[int, int] = {}
        for l in lab:
            sizes[l] = sizes.get(l, 0) + 1
        want = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:LPA_TOPK]
        got = q_label_propagation(sf_tiny)
        assert list(map(tuple, got.to_numpy())) == [(l, s) for l, s in want]

    def test_sizes_cover_nodes(self, ray_session, sf_tiny):
        import pyarrow.parquet as pq

        from searchengine_ray.pipelines.queries import q_label_propagation

        n = pq.read_metadata(f"{sf_tiny}/documents.parquet").num_rows
        got = q_label_propagation(sf_tiny)
        assert got["size"].sum() <= n
        assert (got["size"] > 0).all()
        assert got["label"].is_unique


class TestScd2History:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_scd2_history

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        ev["_ts"] = ev["ts"].astype("datetime64[us]").astype("int64")
        acc: dict[str, list[int]] = {}
        for _, g in ev.groupby("user_id"):
            g = g.sort_values(["_ts", "event_id"])
            et = g["event_type"].to_numpy()
            ts = g["_ts"].to_numpy(np.int64)
            starts = [0] + [i for i in range(1, len(g)) if et[i] != et[i - 1]]
            for j, s in enumerate(starts):
                a = acc.setdefault(et[s], [0, 0, 0])
                a[0] += 1
                if j + 1 < len(starts):
                    a[1] += 1
                    a[2] += int(ts[starts[j + 1]] - ts[s])
        got = q_scd2_history(sf_tiny).set_index("event_type")
        assert sorted(got.index) == sorted(acc)
        for et, (nv, nc, dur) in acc.items():
            row = got.loc[et]
            assert row["n_versions"] == nv
            assert row["n_closed"] == nc
            want_mean = dur / nc / 3.6e9 if nc else 0.0
            assert row["mean_hours"] == pytest.approx(want_mean, abs=1e-6)

    def test_invariants(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_scd2_history

        got = q_scd2_history(sf_tiny)
        assert (got["n_closed"] <= got["n_versions"]).all()
        assert (got["mean_hours"] >= 0).all()
