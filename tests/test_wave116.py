"""Reference-solver identity tests for the ML-training wave
(distributed IRLS logistic regression, PCA by power iteration;
registry 429-430)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd


class TestLogregQuality:
    def test_matches_reference_newton(self, ray_session, sf_tiny):
        from searchengine_ray.analysis.stopwords import STOP_WORDS
        from searchengine_ray.pipelines.queries import (
            LOGREG_ITERS,
            q_logreg_quality,
        )

        docs = pd.read_parquet(
            f"{sf_tiny}/documents.parquet", columns=["text", "lang", "n_chars"]
        )
        rows = []
        for _, r in docs.iterrows():
            toks = [
                t
                for t in re.sub(r"[,.;?!]", " ", (r["text"] or "").lower()).split()
                if t
            ]
            if not toks:
                continue
            sc = sum(t in STOP_WORDS for t in toks)
            rows.append(
                (
                    1.0 if r["lang"] == "en" else 0.0,
                    sc / len(toks),
                    np.log1p(r["n_chars"]),
                )
            )
        f = np.asarray(rows, np.float64)
        X = np.c_[np.ones(len(f)), f[:, 1], f[:, 2]]
        beta = np.zeros(3)
        exp = []
        for _ in range(LOGREG_ITERS):
            z = X @ beta
            p = 1.0 / (1.0 + np.exp(-z))
            w = p * (1 - p)
            beta = beta + np.linalg.solve((X * w[:, None]).T @ X, X.T @ (f[:, 0] - p))
            exp.append((*beta, (f[:, 0] * z - np.logaddexp(0, z)).sum()))
        got = q_logreg_quality(sf_tiny)
        for i, (b0, b1, b2, ll) in enumerate(exp):
            row = got.iloc[i]
            assert abs(row["b0"] - b0) < 1e-4
            assert abs(row["b1"] - b1) < 1e-4
            assert abs(row["b2"] - b2) < 1e-4
            assert abs(row["loglik"] - ll) < 1e-4

    def test_loglik_improves(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_logreg_quality

        got = q_logreg_quality(sf_tiny)
        ll = got["loglik"].to_numpy()
        # Newton from beta=0: the first step's ll is measured AT beta=0;
        # subsequent measurements must not get worse
        assert (np.diff(ll) >= -1e-6).all()


class TestPcaPower:
    def test_matches_bruteforce_replay(self, ray_session, sf_tiny):
        """Exact replay of the fixed power-iteration/deflation chain —
        the synthetic embeddings' near-degenerate top spectrum means
        power iteration is NOT expected to hit eigh's eigenvector in 15
        steps, so the test pins the algorithm, plus spectral bounds vs
        eigh below."""
        from searchengine_ray.pipelines.queries import (
            PCA_COMPONENTS,
            PCA_ITERS,
            q_pca_power,
        )

        emb = pd.read_parquet(f"{sf_tiny}/embeddings.parquet", columns=["embedding"])
        X = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
        C = np.cov(X, rowvar=False, bias=True)
        evals = np.linalg.eigvalsh(C)
        got = q_pca_power(sf_tiny)
        M = C.copy()
        for comp in range(1, PCA_COMPONENTS + 1):
            x = np.ones(C.shape[0])
            for _ in range(PCA_ITERS):
                y = M @ x
                x = y / np.abs(y).max()
            u = x / np.sqrt((x * x).sum())
            lam = float(u @ (M @ u))
            g = got[got["comp"] == comp].sort_values("dim")
            assert np.allclose(g["loading"].to_numpy(), u, atol=2e-6)
            assert abs(g["eigenvalue"].iloc[0] - lam) < 2e-6
            # Rayleigh quotient bounded by the true spectrum
            assert evals[0] - 1e-9 <= lam <= evals[-1] + 1e-9
            M = M - lam * np.outer(u, u)

    def test_evr_bounded(self, ray_session, sf_tiny):
        from searchengine_ray.pipelines.queries import q_pca_power

        got = q_pca_power(sf_tiny)
        per = got.groupby("comp")["evr"].first()
        assert (per > 0).all() and (per <= 1).all()
        norms = got.groupby("comp")["loading"].apply(
            lambda s: np.linalg.norm(s.to_numpy())
        )
        assert np.allclose(norms, 1.0, atol=1e-4)
