"""Wave 180: Elias gamma/delta sizing + Chandy-Lamport snapshot — vs
real bitstream encoding and message-level replay."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _elias_gamma_bits(g: int) -> int:
    """Encode g in real Elias gamma and count bits (unary length +
    binary offset)."""
    b = g.bit_length()
    return (b - 1) + b


def _elias_delta_bits(g: int) -> int:
    b = g.bit_length()
    return _elias_gamma_bits(b) + (b - 1)


class TestGammaDelta:
    def test_formulas_match_real_encoders(self):
        """The closed forms must equal actual encoder output lengths
        for every gap value up to 10^4."""
        for g in range(1, 10_001):
            lg = g.bit_length() - 1
            assert 2 * lg + 1 == _elias_gamma_bits(g), g
            llg = (lg + 1).bit_length() - 1
            assert lg + 2 * llg + 1 == _elias_delta_bits(g), g

    def test_matches_direct_gaps(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import _engine, q_gamma_delta_audit

        eng = _engine(sf_tiny, "punct")
        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        postings: dict[str, list[int]] = {}
        for did, t in zip(docs["doc_id"], docs["text"]):
            for term in set(eng.analyze(t)):
                postings.setdefault(term, []).append(int(did))
        hist: dict[int, int] = {}
        for term, dl in postings.items():
            dl = sorted(dl)
            gaps = [dl[0] + 1] + [b - a for a, b in zip(dl, dl[1:])]
            for g in gaps:
                hist[g.bit_length()] = hist.get(g.bit_length(), 0) + 1
        got = q_gamma_delta_audit(sf_tiny)
        assert dict(zip(got["bitlen"], got["n_gaps"])) == hist
        # delta beats gamma on long gaps; both totals positive
        assert got["total_delta"].iloc[0] > 0
        long_rows = got[got["bitlen"] >= 6]
        if len(long_rows):
            assert (long_rows["delta_bits"] <= long_rows["gamma_bits"]).all()


class TestChandyLamport:
    def test_matches_message_replay(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CL_BASE_DELAY_US,
            CL_PROCS,
            q_chandy_lamport,
        )

        ev = pd.read_parquet(f"{sf_tiny}/events.parquet")
        clicks = ev[ev["event_type"] == "click"]
        tmin = int(ev["ts"].astype("int64").min())
        T0 = tmin + 10 * 86_400_000_000

        def delay(i, j):
            return CL_BASE_DELAY_US + ((4 * i + j) % 7) * 1_000_000

        # dijkstra over 4 nodes
        import heapq

        snap = {}
        h = [(T0, 0)]
        while h:
            t, i = heapq.heappop(h)
            if i in snap:
                continue
            snap[i] = t
            for j in range(CL_PROCS):
                if j != i and j not in snap:
                    heapq.heappush(h, (t + delay(i, j), j))
        want = {}
        for r in clicks.itertuples():
            s = int(r.user_id) % CL_PROCS
            d = (s + 1 + int(r.event_id) % 3) % CL_PROCS
            ts = int(pd.Timestamp(r.ts).value // 1000)
            dl = delay(s, d)
            tot, infl, orph = want.get((s, d), (0, 0, 0))
            want[(s, d)] = (
                tot + (ts < snap[s]),
                infl + (ts < snap[s] and ts + dl > snap[d]),
                orph + (ts >= snap[s] and ts + dl <= snap[d]),
            )
        got = q_chandy_lamport(sf_tiny)
        for r in got.itertuples():
            w = want.get((r.src, r.dst), (0, 0, 0))
            assert (r.n_sent_before_snap, r.n_inflight, r.n_orphans) == w, (r.src, r.dst)

    def test_consistency_guarantee(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_chandy_lamport

        got = q_chandy_lamport(sf_tiny)
        assert (got["n_orphans"] == 0).all()
        assert (got["n_inflight"] <= got["n_sent_before_snap"]).all()
        # marker triangle inequality: snap_dst ≤ snap_src + delay
        assert (
            got["snap_dst_rel_us"] <= got["snap_src_rel_us"] + got["delay_us"]
        ).all()
