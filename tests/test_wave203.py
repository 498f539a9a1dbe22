"""Wave 203: max clique + line breaking DP — vs known graphs and
exhaustive break enumeration."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


class TestMaxClique:
    def test_known_graphs(self):
        def omega(edges, n):
            adj = [0] * n
            for a, b in edges:
                adj[a] |= 1 << b
                adj[b] |= 1 << a
            best = 0
            cnt = 0
            for mask in range(1, 1 << n):
                ok = True
                mm = mask
                while mm:
                    b = mm & (-mm)
                    i = b.bit_length() - 1
                    if mask & ~(adj[i] | b):
                        ok = False
                        break
                    mm ^= b
                if ok:
                    sz = bin(mask).count("1")
                    if sz > best:
                        best, cnt = sz, 1
                    elif sz == best:
                        cnt += 1
            return best, cnt

        # K4: ω=4 one max clique; C5: ω=2 five edges; K4 minus an edge: ω=3
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        assert omega(k4, 4) == (4, 1)
        c5 = [(i, (i + 1) % 5) for i in range(5)]
        assert omega(c5, 5) == (2, 5)
        assert omega(k4[:-1], 4)[0] == 3

    def test_witness_is_clique(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import SPT_N, q_max_clique

        got = q_max_clique(sf_tiny)
        m = int(got["n_nodes"].iloc[0])
        mask = int(got["witness_mask"].iloc[0])
        members = [i for i in range(m) if mask & (1 << i)]
        assert len(members) == got["omega"].iloc[0]
        ii = np.arange(m)
        edges = np.concatenate(
            [
                np.stack([ii, (ii * 7 + 13) % m], axis=1),
                np.stack([ii, (ii * 31 + 5) % m], axis=1),
                np.stack([ii, ii % 5], axis=1),
            ]
        )
        eset = {
            (min(a, b), max(a, b)) for a, b in edges if a != b
        }
        for a, b in itertools.combinations(members, 2):
            assert (a, b) in eset, (a, b)


class TestLineBreakDp:
    def test_matches_exhaustive_breaks(self, ray_session, sf_tiny):
        """Enumerate EVERY break-point subset for short docs and check
        the DP found the optimum."""
        from searchengine_ray.pipelines.queries import (
            LB_STRIDE,
            LB_WIDTH,
            LB_WORDS,
            _engine,
            q_line_break_dp,
        )
        from searchengine_ray.functions.textstats import _token_lists

        docs = pd.read_parquet(f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"])
        got = q_line_break_dp(sf_tiny).set_index("doc_id")
        toks = _token_lists(docs["text"])
        checked = 0
        for did, tl in zip(docs["doc_id"].astype(int), toks):
            if did % LB_STRIDE != 0 or did not in got.index:
                continue
            words = [len(w) for w in tl[:LB_WORDS]][:14]  # cap for 2^13 subsets
            nw = len(words)
            pre = [0]
            for w in words:
                pre.append(pre[-1] + w)

            def cost_of(breaks):
                # breaks: sorted interior break indices; lines [b_k, b_k+1)
                pts = [0] + list(breaks) + [nw]
                total = 0
                for a, b in zip(pts, pts[1:]):
                    L = pre[b] - pre[a] + (b - a - 1)
                    if L > LB_WIDTH:
                        return None
                    if b != nw:
                        total += (LB_WIDTH - L) ** 2
                return total

            best = None
            for r in range(nw):
                for breaks in itertools.combinations(range(1, nw), r):
                    c = cost_of(breaks)
                    if c is not None and (best is None or c < best):
                        best = c
            # compare against a fresh DP on the truncated word list
            INF = 1 << 60
            dp = [INF] * (nw + 1)
            dp[0] = 0
            for i in range(1, nw + 1):
                for j in range(i):
                    L = pre[i] - pre[j] + (i - j - 1)
                    if L > LB_WIDTH:
                        continue
                    c = 0 if i == nw else (LB_WIDTH - L) ** 2
                    dp[i] = min(dp[i], dp[j] + c)
            assert dp[nw] == best
            checked += 1
            if checked >= 3:
                break
        assert checked > 0

    def test_dp_beats_greedy(self, ray_session, sf_small):
        from searchengine_ray.pipelines.queries import q_line_break_dp

        got = q_line_break_dp(sf_small)
        assert (got["dp_cost"] <= got["greedy_cost"]).all()
        assert (got["dp_cost"] < got["greedy_cost"]).any()
