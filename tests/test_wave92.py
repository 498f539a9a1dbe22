"""Brute-force identity tests for the serving/federated wave
(speculative decoding + secure aggregation, registry 381-382)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestSpecDecodeSim:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            _PM_MOD,
            _PM_MUL,
            SPEC_SEEDS,
            SPEC_STEPS,
            q_spec_decode_sim,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["text"])
        cnt: dict[tuple[str, str], int] = {}
        for text in docs["text"]:
            ts = _raw_tokens(text)
            for a, b in zip(ts, ts[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        vocab = sorted({a for a, _ in cnt} | {b for _, b in cnt})
        vi = {t: i for i, t in enumerate(vocab)}
        V = len(vocab)
        c2 = [[0] * V for _ in range(V)]
        for (a, b), n in cnt.items():
            c2[vi[a]][vi[b]] = n
        c1 = [sum(r) for r in c2]
        cd = [
            sum(c2[i][j] for i in range(V)) + sum(c2[j][i] for i in range(V))
            for j in range(V)
        ]
        C = sum(cd)
        got = q_spec_decode_sim(sf_tiny)
        for si, seed in enumerate(SPEC_SEEDS):
            prev = vi[seed]
            state = si + 1
            acc = 0
            for _ in range(SPEC_STEPS):
                state = state * _PM_MUL % _PM_MOD
                wd = min(
                    (-cd[j], j) for j in range(V) if c2[prev][j] > 0
                )[1]
                if state * c1[prev] * cd[wd] <= _PM_MOD * c2[prev][wd] * C:
                    acc += 1
                    prev = wd
                else:
                    prev = min((-c2[prev][j], j) for j in range(V))[1]
            row = got[got["seed"] == seed].iloc[0]
            assert row["n_accepted"] == acc
            assert row["final_token"] == vocab[prev]

    def test_acceptance_semantics(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SPEC_STEPS,
            q_spec_decode_sim,
        )

        got = q_spec_decode_sim(sf_tiny)
        assert (got["n_steps"] == SPEC_STEPS).all()
        assert got["n_accepted"].between(0, SPEC_STEPS).all()
        # the draft matches the target often enough to be useful
        assert got["n_accepted"].sum() > 0


class TestSecureAgg:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            SECAGG_MASK_MOD,
            SECAGG_NODES,
            _md5_low64,
            q_secure_agg,
        )

        ev = pd.read_parquet(
            f"{sf_tiny}/events.parquet", columns=["user_id", "value"]
        )
        cents = (
            np.sign(ev["value"].to_numpy())
            * np.floor(np.abs(ev["value"].to_numpy() * 100.0) + 0.5)
        ).astype(np.int64)
        node = ev["user_id"].to_numpy(np.int64) % SECAGG_NODES
        partial = pd.DataFrame({"n": node, "c": cents}).groupby("n")["c"].sum()
        masks = np.zeros(SECAGG_NODES, np.int64)
        for i in range(SECAGG_NODES):
            for j in range(i + 1, SECAGG_NODES):
                m = _md5_low64(f"m{i}:{j}") % SECAGG_MASK_MOD
                masks[i] += m
                masks[j] -= m
        got = q_secure_agg(sf_tiny)
        for _, r in got.iterrows():
            assert r["partial"] == partial[r["node"]]
            assert r["mask"] == masks[r["node"]]
            assert r["published"] == partial[r["node"]] + masks[r["node"]]

    def test_masks_blind_but_cancel(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_secure_agg

        got = q_secure_agg(sf_tiny)
        # individual reports are blinded...
        assert (got["mask"] != 0).all()
        assert (got["published"] != got["partial"]).all()
        # ...but the total is exact
        assert got["published"].sum() == got["partial"].sum()
        assert got["mask"].sum() == 0
