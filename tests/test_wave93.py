"""Brute-force identity tests for the durability/consistency wave
(XOR parity + G-counter CRDT, registry 383-384)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


class TestXorParity:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            PARITY_K,
            PARITY_LEN,
            PARITY_SAMPLE,
            q_xor_parity,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        ).sort_values("doc_id")
        padded = {
            int(d): t[:PARITY_LEN].ljust(PARITY_LEN)
            for d, t in zip(docs["doc_id"], docs["text"])
        }
        got = q_xor_parity(sf_tiny)
        exp_rows = []
        stripes = sorted({d // PARITY_K for d in padded})
        for s in stripes:
            members = [s * PARITY_K + m for m in range(PARITY_K)]
            if not all(m in padded for m in members) or s % PARITY_SAMPLE:
                continue
            mats = np.stack(
                [
                    np.frombuffer(padded[m].encode("latin1"), np.uint8)
                    for m in members
                ]
            ).astype(np.int64)
            parity = np.bitwise_xor.reduce(mats, axis=0)
            lost = s % PARITY_K
            exp_rows.append(
                (
                    s,
                    members[lost],
                    int(parity.sum()),
                    hashlib.md5(
                        ",".join(str(int(x)) for x in parity).encode()
                    ).hexdigest(),
                    hashlib.md5(
                        padded[members[lost]].encode("utf-8")
                    ).hexdigest(),
                )
            )
        assert list(got.itertuples(index=False, name=None)) == exp_rows

    def test_reconstruction_is_real(self):
        """Erasing any shard is recoverable; erasing two is not."""
        rng = np.random.default_rng(9)
        mats = rng.integers(32, 127, (4, 16)).astype(np.int64)
        parity = np.bitwise_xor.reduce(mats, axis=0)
        for lost in range(4):
            recon = parity ^ np.bitwise_xor.reduce(
                np.delete(mats, lost, axis=0), axis=0
            )
            assert np.array_equal(recon, mats[lost])


class TestCrdtCounter:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CRDT_REPLICAS,
            q_crdt_counter,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["ts", "event_id"]
        )
        day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
        rep = ev["event_id"].to_numpy(np.int64) % CRDT_REPLICAS
        per = (
            pd.DataFrame({"d": day, "r": rep})
            .groupby(["d", "r"])
            .size()
            .unstack(fill_value=0)
            .reindex(columns=range(CRDT_REPLICAS), fill_value=0)
            .sort_index()
        )
        cum = per.cumsum()
        got = q_crdt_counter(sf_tiny)
        days = cum.index.tolist()
        for i, d in enumerate(days):
            own = cum.iloc[i].to_numpy(np.int64)
            lag = (
                cum.iloc[i - 1].to_numpy(np.int64)
                if i > 0
                else np.zeros(CRDT_REPLICAS, np.int64)
            )
            views = [
                int(own[r] + lag.sum() - lag[r]) for r in range(CRDT_REPLICAS)
            ]
            row = got[got["day"] == d].iloc[0]
            assert row["stalest_total"] == min(views)
            assert row["merged_total"] == row["true_total"] == int(own.sum())
            assert row["gap"] == int(own.sum()) - min(views)

    def test_convergence_and_monotonicity(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_crdt_counter

        got = q_crdt_counter(sf_tiny).sort_values("day")
        # merge always recovers truth (the CRDT property)
        assert (got["merged_total"] == got["true_total"]).all()
        # counters only grow
        assert (np.diff(got["true_total"].to_numpy()) >= 0).all()
        # staleness gap bounded by one day's traffic
        daily = np.diff(np.concatenate([[0], got["true_total"].to_numpy()]))
        assert (got["gap"].to_numpy() <= np.maximum(daily, 0) + daily.max()).all()
