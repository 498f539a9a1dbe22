"""Brute-force identity tests for the view-maintenance/positional wave
(IVM + positional size, registry 369-370)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd


def _cents(p: np.ndarray) -> np.ndarray:
    r = np.round(p, 2) * 100.0
    return (np.sign(r) * np.floor(np.abs(r) + 0.5)).astype(np.int64)


class TestIvmAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import (
            IVM_BUMP_DIV,
            IVM_STRIDE,
            q_ivm_audit,
        )

        orders = pd.read_parquet(
            f"{sf_tiny}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        cust = pd.read_parquet(
            f"{sf_tiny}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        )
        nk = orders["o_custkey"].map(
            dict(zip(cust["c_custkey"], cust["c_nationkey"]))
        )
        cents = _cents(orders["o_totalprice"].to_numpy())
        delta = (orders["o_orderkey"] % IVM_STRIDE == 0).to_numpy()
        df = pd.DataFrame(
            {
                "nation": nk.astype(int),
                "cents": cents,
                "is_delta": delta.astype(int),
                "dc": np.where(delta, cents + cents // IVM_BUMP_DIV, 0),
            }
        )
        exp = df.groupby("nation").agg(
            n_base=("cents", "size"),
            n_delta=("is_delta", "sum"),
            base_cents=("cents", "sum"),
            delta_cents=("dc", "sum"),
        )
        got = q_ivm_audit(sf_tiny).set_index("nation")
        for n, r in exp.iterrows():
            g = got.loc[n]
            assert g["n_base"] == r["n_base"]
            assert g["n_delta"] == r["n_delta"]
            assert g["base_cents"] == r["base_cents"]
            assert g["delta_cents"] == r["delta_cents"]
            assert (
                g["maintained_cents"]
                == g["recomputed_cents"]
                == r["base_cents"] + r["delta_cents"]
            )

    def test_view_consistency_is_enforced(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_ivm_audit

        got = q_ivm_audit(sf_tiny)
        assert (got["maintained_cents"] == got["recomputed_cents"]).all()
        assert (got["delta_cents"] > 0).any()


class TestPositionsSizeAudit:
    def test_matches_bruteforce(self, ray_session, sf_tiny):
        from searchengine_ray.codec.varbyte import encode
        from searchengine_ray.pipelines.queries import q_positions_size_audit

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["doc_id", "text"]
        )
        post: dict[str, dict[int, list[int]]] = {}
        for did, text in zip(docs["doc_id"], docs["text"]):
            t = re.sub(r"[,.;?!]", " ", text.lower())
            for i, tok in enumerate(re.split(r"[ \t\n\x0b\f\r]+", t), 1):
                if tok:
                    post.setdefault(tok, {}).setdefault(int(did), []).append(i)
        exp: dict[int, list[int]] = {}
        for t, m in post.items():
            ids = np.array(sorted(m), np.int64)
            docs_vb = len(encode(ids))
            pos_vb = sum(
                len(encode(np.array(ps, np.int64))) for ps in m.values()
            )
            npos = sum(len(ps) for ps in m.values())
            dd = len(str(len(ids)))
            e = exp.setdefault(dd, [0, 0, 0, 0, 0])
            e[0] += 1
            e[1] += len(ids)
            e[2] += npos
            e[3] += docs_vb
            e[4] += pos_vb
        got = q_positions_size_audit(sf_tiny)
        assert got["df_digits"].tolist() == sorted(exp)
        for _, r in got.iterrows():
            n, nd, npos, dvb, pvb = exp[r["df_digits"]]
            assert (
                r["n_terms"],
                r["n_docs"],
                r["n_positions"],
                r["docs_bytes"],
                r["pos_bytes"],
            ) == (n, nd, npos, dvb, pvb)
            assert r["overhead"] == round(pvb / dvb, 6) or abs(
                r["overhead"] - pvb / dvb
            ) < 1e-6

    def test_positions_dominate(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_positions_size_audit

        got = q_positions_size_audit(sf_tiny)
        # the classic result: positions cost a multiple of the doc ids
        assert (got["pos_bytes"] > got["docs_bytes"]).all()
        assert (got["n_positions"] >= got["n_docs"]).all()
