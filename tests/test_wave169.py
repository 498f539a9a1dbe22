"""Wave 169: Robin Hood layout + XOR filter — vs sequential insertion
replay / filter semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd


class TestRobinhoodProbe:
    def test_closed_form_matches_sequential_insertion(self, ray_session, sf_tiny):
        """Insert keys one at a time with textbook Robin Hood stealing
        (any order) — final probe-length multiset must equal the
        closed-form layout (order independence)."""
        from searchengine_ray.pipelines.queries import (
            RH_M,
            _md5_low64,
            q_robinhood_probe,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        keys = []
        for d in docs["doc_id"].astype(int):
            h = _md5_low64(str(d))
            keys.append((h % RH_M, h % (1 << 62)))
        # sequential Robin Hood insertion in a shuffled deterministic order
        rng = np.random.RandomState(7)
        order = rng.permutation(len(keys))
        table: dict[int, tuple[int, int]] = {}
        for idx in order:
            home, key = keys[idx]
            pos = home
            cur = (home, key)
            while True:
                if pos not in table:
                    table[pos] = cur
                    break
                inc_home, inc_key = table[pos]
                # rich (small probe) yields to poor (large probe);
                # tie-break by key for determinism
                if (pos - inc_home, inc_key) < (pos - cur[0], cur[1]):
                    table[pos], cur = cur, table[pos]
                pos += 1
            # no wraparound in the audit's open-ended variant
        seq_probes = sorted(pos - h for pos, (h, _) in table.items())
        got = q_robinhood_probe(sf_tiny)
        from collections import Counter

        want = Counter(seq_probes)
        assert dict(zip(got["probe_len"], got["n_keys"])) == dict(want)
        assert got["max_probe"].iloc[0] == max(seq_probes)

    def test_histogram_totals(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_robinhood_probe

        got = q_robinhood_probe(sf_tiny)
        assert got["n_keys"].sum() == got["n_total"].iloc[0]
        assert (got["probe_len"] >= 0).all()


class TestXorFilter:
    def test_membership_and_fp_semantics(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_xor_filter

        got = q_xor_filter(sf_tiny)
        n = got["n_keys"].iloc[0]
        # all keys peeled across rounds
        assert got["peeled"].sum() == n
        # ~1.45n cells
        assert abs(got["n_cells"].iloc[0] - 1.45 * n) < 6
        # 8-bit fingerprints → FP rate ≈ 1/256
        fp_rate = got["fp_hits"].iloc[0] / got["fp_probes"].iloc[0]
        assert fp_rate < 0.03
        assert got["n_rounds"].iloc[0] == got["round"].max() + 1

    def test_construction_invariants(self, ray_session, sf_tiny):
        """Rebuild the filter independently and check the membership
        identity val[h0]^val[h1]^val[h2] == fp for every key."""
        from searchengine_ray.pipelines.queries import (
            _xorf_hashes,
            q_xor_filter,
        )

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id"])
        ids = docs["doc_id"].to_numpy(np.int64)
        n = len(ids)
        c3 = int(1.45 * n) // 3 + 1
        C = 3 * c3
        H = np.array([_xorf_hashes(int(k), c3) for k in ids], np.int64)
        # sequential textbook peeling (stack order) + back-substitution
        from collections import defaultdict

        use = defaultdict(set)
        for i in range(n):
            for c in H[i, :3]:
                use[int(c)].add(i)
        stack = []
        ready = [c for c in use if len(use[c]) == 1]
        peeled = set()
        while ready:
            c = ready.pop()
            if len(use[c]) != 1:
                continue
            (i,) = use[c]
            if i in peeled:
                continue
            stack.append((i, c))
            peeled.add(i)
            for c2 in H[i, :3]:
                use[int(c2)].discard(i)
                if len(use[int(c2)]) == 1:
                    ready.append(int(c2))
        assert len(peeled) == n
        val = np.zeros(C, np.int64)
        for i, c in reversed(stack):
            acc = int(H[i, 3])
            for c2 in H[i, :3]:
                if int(c2) != c:
                    acc ^= int(val[c2])
            val[c] = acc
        probe = val[H[:, 0]] ^ val[H[:, 1]] ^ val[H[:, 2]]
        assert (probe == H[:, 3]).all()
        # the entry must agree on sizes (assignment itself may differ —
        # any valid solution satisfies the same membership identity)
        got = q_xor_filter(sf_tiny)
        assert got["n_cells"].iloc[0] == C
        assert got["peeled"].sum() == n
