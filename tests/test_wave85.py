"""Brute-force identity tests for the compression/filter wave
(PForDelta + cuckoo filter, registry 367-368)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


def _raw_tokens(text: str) -> list[str]:
    t = re.sub(r"[,.;?!]", " ", text.lower())
    return [w for w in re.split(r"[ \t\n\x0b\f\r]+", t) if w]


class TestPforAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import PFOR_BLOCK, q_pfor_audit

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        post: dict[str, set[int]] = {}
        for did, text in zip(docs["doc_id"], docs["text"]):
            for t in set(_raw_tokens(text)):
                post.setdefault(t, set()).add(int(did))
        exp: dict[int, list[int]] = {}
        for t, s in post.items():
            ids = np.sort(np.array(sorted(s), np.int64))
            vals = np.diff(ids, prepend=np.int64(0))
            vals[0] = ids[0]
            widths = np.array([int(v).bit_length() for v in vals], np.int64)
            nb_t = ne_t = pb_t = 0
            for st in range(0, len(vals), PFOR_BLOCK):
                w = np.sort(widths[st : st + PFOR_BLOCK])
                nb = len(w)
                b = int(w[nb - nb // 8 - 1])
                exc = int((w > b).sum())
                pb_t += 1 + (nb * b + 7) // 8 + 5 * exc
                ne_t += exc
                nb_t += 1
            dd = len(str(len(ids)))
            e = exp.setdefault(dd, [0, 0, 0, 0, 0])
            e[0] += 1
            e[1] += nb_t
            e[2] += ne_t
            e[3] += 4 * len(ids)
            e[4] += pb_t
        got = q_pfor_audit(sf_tiny)
        assert got["df_digits"].tolist() == sorted(exp)
        for _, r in got.iterrows():
            n, nb, ne, raw, pb = exp[r["df_digits"]]
            assert (
                r["n_terms"],
                r["n_blocks"],
                r["n_exceptions"],
                r["raw_bytes"],
                r["pfor_bytes"],
            ) == (n, nb, ne, raw, pb)

    def test_exception_budget(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_pfor_audit

        got = q_pfor_audit(sf_tiny)
        # patches are bounded by the 1/8 budget per block
        assert (
            got["n_exceptions"] <= got["n_blocks"] * (128 // 8)
        ).all()
        assert (got["pfor_bytes"] < got["raw_bytes"]).all()


class TestCuckooFilter:
    def test_invariants(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            CUCKOO_NB,
            CUCKOO_SLOTS,
            q_cuckoo_filter,
        )

        got = q_cuckoo_filter(sf_tiny).iloc[0]
        assert got["n_inserted"] + got["n_rejected"] == got["n_items"]
        assert got["n_occupied"] == got["n_inserted"]  # fps are nonzero
        assert got["n_occupied"] <= CUCKOO_NB * CUCKOO_SLOTS
        assert got["fp_hits"] <= got["fp_probes"]

    def test_no_false_negatives(self, ray_session, sf_tiny):
        """Every inserted (non-rejected) key must be found by the
        probe rule — rebuild the table independently and probe the
        inserted set."""
        from searchengine_ray.pipelines.queries import (
            CUCKOO_MAX_KICKS,
            CUCKOO_NB,
            CUCKOO_SLOTS,
            CUCKOO_STRIDE,
            _md5_low64,
            q_cuckoo_filter,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id"]
        )["doc_id"].astype(int).sort_values()
        ins = [d for d in docs if d % CUCKOO_STRIDE == 0]
        hfp = [(_md5_low64(f"f{fp}") % CUCKOO_NB) for fp in range(256)]
        table = [0] * (CUCKOO_NB * CUCKOO_SLOTS)
        inserted_keys = []
        rejected = 0
        for key in ins:
            h = _md5_low64(str(key))
            fp = h % 255 + 1
            i1 = (h // 256) % CUCKOO_NB
            i2 = i1 ^ hfp[fp]
            placed = False
            for b in (i1, i2):
                for s in range(CUCKOO_SLOTS):
                    if table[b * CUCKOO_SLOTS + s] == 0:
                        table[b * CUCKOO_SLOTS + s] = fp
                        placed = True
                        break
                if placed:
                    break
            if placed:
                inserted_keys.append(key)
                continue
            cur_fp, cur_b, kicks = fp, i2, 0
            while kicks < CUCKOO_MAX_KICKS:
                slot = kicks % CUCKOO_SLOTS
                victim = table[cur_b * CUCKOO_SLOTS + slot]
                table[cur_b * CUCKOO_SLOTS + slot] = cur_fp
                cur_fp = victim
                cur_b ^= hfp[cur_fp]
                kicks += 1
                done = False
                for s in range(CUCKOO_SLOTS):
                    if table[cur_b * CUCKOO_SLOTS + s] == 0:
                        table[cur_b * CUCKOO_SLOTS + s] = cur_fp
                        done = True
                        break
                if done:
                    inserted_keys.append(key)
                    break
            else:
                rejected += 1
        # probe every originally-inserted key that was never displaced
        # out (rejection drops SOME fp, possibly a relocated victim's)
        misses = 0
        for key in inserted_keys:
            h = _md5_low64(str(key))
            fp = h % 255 + 1
            i1 = (h // 256) % CUCKOO_NB
            i2 = i1 ^ hfp[fp]
            r1 = table[i1 * CUCKOO_SLOTS : (i1 + 1) * CUCKOO_SLOTS]
            r2 = table[i2 * CUCKOO_SLOTS : (i2 + 1) * CUCKOO_SLOTS]
            if fp not in r1 and fp not in r2:
                misses += 1
        assert misses <= rejected  # only rejection can lose a key
        got = q_cuckoo_filter(sf_tiny).iloc[0]
        assert got["n_items"] == len(ins)
        assert got["n_inserted"] == len(inserted_keys)
        assert got["n_rejected"] == rejected
