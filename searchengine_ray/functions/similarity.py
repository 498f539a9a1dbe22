"""Similarity search over an embedding column (``list<float>``).

- :func:`cosine_topk` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits its local top-k; the driver merges (k small). The exact baseline.
- :class:`LshIndex` — random-hyperplane LSH bucketing: the scale path.
  Buckets are built with one ``map_batches`` pass (signatures) +
  ``groupby(bucket)``; queries probe their own bucket plus
  ``n_probe``-bit-flip neighbors. Approximate — recall measured in tests
  against the brute-force baseline."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def cosine_topk(
    ds,
    query_vecs: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    emb_column: str = "embedding",
    ndigits: int | None = 6,
) -> pd.DataFrame:
    """Top-k per query vector. Returns columns ``qid, rank, vec_id, cosine``
    ordered by (qid, -cosine, vec_id)."""
    import ray

    q = np.atleast_2d(np.asarray(query_vecs, dtype=np.float64))
    qref = ray.put(_normalize(q))

    def local_topk(batch: pa.Table, _q=qref) -> pa.Table:
        qm = ray.get(_q)
        ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize(np.stack(batch[emb_column].to_pandas().to_numpy()).astype(np.float64))
        sims = qm @ mat.T  # (n_q, n_batch)
        out_q, out_id, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            # local top-k (order finalized at merge)
            idx = np.argpartition(-sims[qi], kk - 1)[:kk]
            out_q.extend([qi] * len(idx))
            out_id.extend(ids[idx].tolist())
            out_s.extend(sims[qi, idx].tolist())
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    parts = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    rows = []
    for qi, grp in parts.groupby("qid"):
        top = heapq.nsmallest(
            k, grp.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id)
        )
        for rank, r in enumerate(top):
            c = round(r.cosine, ndigits) if ndigits is not None else r.cosine
            rows.append((int(qi), rank, int(r.vec_id), c))
    return pd.DataFrame(rows, columns=["qid", "rank", "vec_id", "cosine"])


class LshIndex:
    """Random-hyperplane LSH over normalized embeddings."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))
        self.n_planes = n_planes
        self.buckets: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _bucket_of(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0
        return (bits.astype(np.int64) << np.arange(self.n_planes)).sum(axis=1)

    def build(self, ds, id_column="vec_id", emb_column="embedding") -> None:
        planes = self.planes

        def assign(batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            mat = _normalize(np.stack(batch[emb_column].to_pandas().to_numpy()).astype(np.float64))
            bits = (mat @ planes.T) > 0
            bucket = (bits.astype(np.int64) << np.arange(planes.shape[0])).sum(axis=1)
            return pa.table(
                {
                    "bucket": pa.array(bucket, pa.int64()),
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": batch[emb_column],
                }
            )

        rows = ds.map_batches(assign, batch_format="pyarrow").to_pandas()
        for bucket, grp in rows.groupby("bucket"):
            ids = grp["vec_id"].to_numpy(np.int64)
            mat = _normalize(np.stack(grp["embedding"].to_numpy()).astype(np.float64))
            self.buckets[int(bucket)] = (ids, mat)

    def query(self, vec: np.ndarray, k: int = 10, n_probe: int = 4) -> list[tuple[int, float]]:
        v = np.asarray(vec, dtype=np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        b0 = int(self._bucket_of(v[None, :])[0])
        probe = [b0] + [b0 ^ (1 << i) for i in range(min(n_probe, self.n_planes))]
        cands: list[tuple[int, float]] = []
        for b in probe:
            if b not in self.buckets:
                continue
            ids, mat = self.buckets[b]
            sims = mat @ v
            cands.extend(zip(ids.tolist(), sims.tolist()))
        cands.sort(key=lambda x: (-x[1], x[0]))
        seen, out = set(), []
        for i, s in cands:
            if i not in seen:
                seen.add(i)
                out.append((i, s))
            if len(out) == k:
                break
        return out
