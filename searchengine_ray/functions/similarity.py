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




def _scan_probes(bucketed, q_normed: np.ndarray, probes: dict[int, list[int]], k: int):
    """One pass over a bucketed Dataset answering every query: blocks
    score only rows whose bucket some query probes; local candidates are
    merged on the driver (q × k rows). Shared by LshIndex and IvfIndex."""
    import ray

    ref = ray.put((q_normed, probes))

    def scan(batch: pa.Table, _ref=ref) -> pa.Table:
        qm, pr = ray.get(_ref)
        buckets = batch["bucket"].to_numpy(zero_copy_only=False)
        hit_rows = np.flatnonzero(np.isin(buckets, np.fromiter(pr, np.int64)))
        if not len(hit_rows):
            return pa.table(
                {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)[hit_rows]
        mat = np.stack(batch["nemb"].to_pandas().to_numpy())[hit_rows]
        bsel = buckets[hit_rows]
        out_q, out_id, out_s = [], [], []
        for b in np.unique(bsel):
            rows = np.flatnonzero(bsel == b)
            qids = pr.get(int(b), [])
            if not qids:
                continue
            sims = qm[qids] @ mat[rows].T  # (n_q_probing, n_rows)
            for row_qi, qi in enumerate(qids):
                out_q.extend([qi] * len(rows))
                out_id.extend(ids[rows].tolist())
                out_s.extend(sims[row_qi].tolist())
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    parts = bucketed.map_batches(scan, batch_format="pyarrow").to_pandas()
    results: list[list[tuple[int, float]]] = [[] for _ in range(len(q_normed))]
    for qi, grp in parts.groupby("qid"):
        grp = grp.drop_duplicates("vec_id")
        top = heapq.nsmallest(
            k, grp.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id)
        )
        results[int(qi)] = [(int(r.vec_id), float(r.cosine)) for r in top]
    return results


class LshIndex:
    """Random-hyperplane LSH over normalized embeddings — Dataset-native.

    ``build`` assigns a bucket per (table, vector) in one ``map_batches``
    pass and pins the bucketed Dataset in the (distributed, spillable)
    object store — the driver never holds vectors or buckets.
    ``query_batch`` broadcasts the query matrix + per-query probe-bucket
    sets once (``ray.put``) and answers ALL queries in one scan: each
    block scores only its rows whose bucket some query probes, emits
    local top-k candidates, and the driver merges the (q × k)-sized
    result (duplicates across tables deduped there). No shuffle at
    query time.

    Recall levers (Lv et al., VLDB 2007 multi-probe + the classic
    OR-construction):

    - ``n_tables`` independent plane sets OR-ed together — the standard
      recall lever when neighbour cosines are weak (a cos-0.35
      neighbour flips ~4 of 10 plane bits in expectation, so no amount
      of near-bucket probing in ONE table reaches it);
    - probe flips are MARGIN-RANKED per query: the ``n_probe`` planes
      with the smallest \\|q·p\\| are flipped first (those are the
      boundaries a true neighbour most likely crosses), instead of
      arbitrary low-index bits.

    Composite bucket id = ``table << n_planes | bits``. Vectors are
    stored ONCE per row with a ``buckets: list<int64>`` column holding
    all n_tables composite ids — the OR-construction costs n_tables
    extra int64s per vector, NOT n_tables copies of the vector (the
    round-4 layout's memory multiplier, since removed)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42, n_tables: int = 1):
        self.planes = np.stack(
            [
                np.random.default_rng(seed + t).standard_normal((n_planes, dim))
                for t in range(n_tables)
            ]
        )  # (n_tables, n_planes, dim)
        self.n_planes = n_planes
        self.n_tables = n_tables
        self._bucketed = None  # ray Dataset: (vec_id, nemb, buckets)

    def _buckets_of(self, mat: np.ndarray) -> np.ndarray:
        """(n_rows, n_tables) composite bucket ids."""
        out = np.empty((len(mat), self.n_tables), np.int64)
        for t in range(self.n_tables):
            bits = (mat @ self.planes[t].T) > 0
            out[:, t] = (bits.astype(np.int64) << np.arange(self.n_planes)).sum(
                axis=1
            ) | (t << self.n_planes)
        return out

    def build(self, ds, id_column="vec_id", emb_column="embedding") -> None:
        buckets_of = self._buckets_of
        n_tables = self.n_tables

        def assign(batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            mat = _normalize(np.stack(batch[emb_column].to_pandas().to_numpy()).astype(np.float64))
            buckets = buckets_of(mat)  # (n_rows, n_tables)
            offsets = np.arange(0, (len(ids) + 1) * n_tables, n_tables, dtype=np.int32)
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "nemb": pa.array(mat.tolist(), pa.list_(pa.float64())),
                    "buckets": pa.ListArray.from_arrays(
                        pa.array(offsets), pa.array(buckets.reshape(-1), pa.int64())
                    ),
                }
            )

        self._bucketed = ds.map_batches(assign, batch_format="pyarrow").materialize()

    def query_batch(
        self, query_vecs: np.ndarray, k: int = 10, n_probe: int = 4
    ) -> list[list[tuple[int, float]]]:
        """Top-k per query row; one scan answers the whole batch.
        Per table: own bucket + ``n_probe`` margin-ranked bit flips.
        A block scores a row for query ``qi`` iff ANY of the row's
        per-table buckets is in ``qi``'s probe set; duplicates across
        tables are deduped in the q×k driver merge."""
        import heapq

        import ray

        if self._bucketed is None:
            raise RuntimeError("build() the index first")
        q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
        probes: dict[int, list[int]] = {}
        for t in range(self.n_tables):
            dots = q @ self.planes[t].T  # (n_q, n_planes)
            bits = dots > 0
            base = (bits.astype(np.int64) << np.arange(self.n_planes)).sum(axis=1) | (
                t << self.n_planes
            )
            # margin rank: smallest |q·p| first, ties by plane index
            order = np.argsort(np.abs(dots), axis=1, kind="stable")
            for qi in range(len(q)):
                bs = [int(base[qi])] + [
                    int(base[qi]) ^ (1 << int(p))
                    for p in order[qi, : min(n_probe, self.n_planes)]
                ]
                for b in bs:
                    probes.setdefault(b, []).append(qi)

        n_tables = self.n_tables
        ref = ray.put((q, probes))

        _EMPTY_SCAN = pa.table(
            {"qid": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )

        def scan(batch: pa.Table, _ref=ref) -> pa.Table:
            # One np.isin pass over the flattened per-table bucket ids,
            # then hits grouped by bucket — O(rows·tables + hits), not
            # O(probe-buckets · rows · tables) as a per-bucket
            # full-block equality scan would be. Composite bucket ids
            # are unique per table, so a row matches a given bucket in
            # at most one column; cross-bucket duplicates for the same
            # query are deduped in the q×k driver merge.
            qm, pr = ray.get(_ref)
            if batch.num_rows == 0:
                return _EMPTY_SCAN
            flat = (
                batch["buckets"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False)
            )
            pr_keys = np.fromiter(pr.keys(), np.int64, len(pr))
            pos = np.flatnonzero(np.isin(flat, pr_keys))
            if not len(pos):
                return _EMPTY_SCAN
            rows = pos // n_tables
            bks = flat[pos]
            order = np.argsort(bks, kind="stable")
            rows, bks = rows[order], bks[order]
            starts = np.flatnonzero(np.r_[True, bks[1:] != bks[:-1]])
            ends = np.append(starts[1:], len(bks))
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            mat = np.stack(batch["nemb"].to_pandas().to_numpy())
            out_q, out_id, out_s = [], [], []
            for s, e in zip(starts, ends):
                qids = pr[int(bks[s])]
                r = rows[s:e]
                sims = qm[qids] @ mat[r].T  # (n_q_probing, |r|)
                for row_qi, qi in enumerate(qids):
                    out_q.append(np.full(len(r), qi, np.int64))
                    out_id.append(ids[r].astype(np.int64))
                    out_s.append(sims[row_qi])
            return pa.table(
                {
                    "qid": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                    "cosine": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

        parts = self._bucketed.map_batches(scan, batch_format="pyarrow").to_pandas()
        results: list[list[tuple[int, float]]] = [[] for _ in range(len(q))]
        for qi, grp in parts.groupby("qid"):
            grp = grp.drop_duplicates("vec_id")
            top = heapq.nsmallest(
                k, grp.itertuples(index=False), key=lambda r: (-r.cosine, r.vec_id)
            )
            results[int(qi)] = [(int(r.vec_id), float(r.cosine)) for r in top]
        return results

    def query(self, vec: np.ndarray, k: int = 10, n_probe: int = 4) -> list[tuple[int, float]]:
        return self.query_batch(np.asarray(vec)[None, :], k=k, n_probe=n_probe)[0]

class IvfIndex:
    """IVF (inverted-file) ANN — the coarse-quantizer scale path next to
    LshIndex. ``build`` k-means a driver-side SAMPLE (sample only — never
    the full dataset) into ``n_centroids`` cells, broadcasts the
    centroids, assigns every vector to its nearest cell in one
    ``map_batches`` pass, and pins the celled Dataset in the object
    store. ``query_batch`` probes the ``n_probe`` nearest cells per
    query through the same one-scan path as LshIndex."""

    def __init__(self, n_centroids: int = 16, seed: int = 42, kmeans_iters: int = 10,
                 sample_rows: int = 10_000):
        self.n_centroids = n_centroids
        self.seed = seed
        self.kmeans_iters = kmeans_iters
        self.sample_rows = sample_rows
        self.centroids: np.ndarray | None = None
        self._bucketed = None

    def build(self, ds, id_column="vec_id", emb_column="embedding",
              centroids: np.ndarray | None = None) -> None:
        """Default path: k-means a sample, assign cells by cosine.
        ``centroids=`` path: trust precomputed (e.g. the distributed
        :func:`..functions.vectors.kmeans_fit`) raw-space centroids and
        assign cells by L2 argmin on the RAW vectors — the deterministic,
        SQL-mirrorable contract used by the ``ivf_topk`` oracle."""
        if centroids is not None:
            cent = np.asarray(centroids, dtype=np.float64)
            self.centroids = cent

            def cell_assign_l2(batch: pa.Table) -> pa.Table:
                from .vectors import _l2_assign

                ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
                raw = np.stack(batch[emb_column].to_pandas().to_numpy()).astype(np.float64)
                cells = _l2_assign(raw, cent)
                return pa.table(
                    {
                        "bucket": pa.array(cells, pa.int64()),
                        "vec_id": pa.array(ids, pa.int64()),
                        "nemb": pa.array(_normalize(raw).tolist(), pa.list_(pa.float64())),
                    }
                )

            self._bucketed = ds.map_batches(
                cell_assign_l2, batch_format="pyarrow"
            ).materialize()
            return
        sample = ds.limit(self.sample_rows).to_pandas()
        mat = _normalize(np.stack(sample[emb_column].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(self.seed)
        k = min(self.n_centroids, len(mat))
        cent = mat[rng.choice(len(mat), k, replace=False)]
        for _ in range(self.kmeans_iters):
            assign = np.argmax(mat @ cent.T, axis=1)  # cosine on normalized vecs
            for c in range(k):
                members = mat[assign == c]
                if len(members):
                    m = members.sum(axis=0)
                    cent[c] = m / max(np.linalg.norm(m), 1e-12)
        self.centroids = cent

        def cell_assign(batch: pa.Table) -> pa.Table:
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            m = _normalize(np.stack(batch[emb_column].to_pandas().to_numpy()).astype(np.float64))
            cells = np.argmax(m @ cent.T, axis=1).astype(np.int64)
            return pa.table(
                {
                    "bucket": pa.array(cells, pa.int64()),
                    "vec_id": pa.array(ids, pa.int64()),
                    "nemb": pa.array(m.tolist(), pa.list_(pa.float64())),
                }
            )

        self._bucketed = ds.map_batches(cell_assign, batch_format="pyarrow").materialize()

    def query_batch(
        self, query_vecs: np.ndarray, k: int = 10, n_probe: int = 4
    ) -> list[list[tuple[int, float]]]:
        if self._bucketed is None or self.centroids is None:
            raise RuntimeError("build() the index first")
        q = _normalize(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
        # cosine ranking of cells; centroids may be raw-space (kmeans_fit
        # path) so normalize them here — no-op for the default path
        sims = q @ _normalize(self.centroids).T  # (n_q, n_centroids)
        n_probe = min(n_probe, sims.shape[1])
        probes: dict[int, list[int]] = {}
        cell_idx = np.arange(sims.shape[1])
        for qi in range(len(q)):
            # deterministic: (-cosine, cell) order, mirrors the SQL probe CTE
            top_cells = cell_idx[np.lexsort((cell_idx, -sims[qi]))][:n_probe]
            for c in top_cells:
                probes.setdefault(int(c), []).append(qi)
        return _scan_probes(self._bucketed, q, probes, k)

    def query(self, vec: np.ndarray, k: int = 10, n_probe: int = 4) -> list[tuple[int, float]]:
        return self.query_batch(np.asarray(vec)[None, :], k=k, n_probe=n_probe)[0]


class PqIndex:
    """Product quantization (Jégou et al. 2011) — the memory-compression
    ANN path next to LshIndex (random planes) and IvfIndex (coarse
    cells): vectors are split into ``m`` subspaces, each quantized by a
    per-subspace codebook, so a 64-dim float64 vector compresses to
    ``m`` uint8 codes and queries score by Asymmetric Distance
    Computation (ADC): a per-query (m × ks) distance table plus one
    table lookup per (vector, subspace).

    Deterministic, SQL-mirrorable contract: each codebook comes from the
    distributed :func:`..functions.vectors.kmeans_fit` (first-k-by-id
    init, round-6 centroid means) on the SLICED vectors; assignment is
    L2 argmin with lowest-index tie-break; ADC = Σ_s ‖q_s − cent_s[code_s]‖²
    summed in subspace order.

    Scale shape: training touches each subspace slice via the kmeans
    combiner (≤ks rows per batch reach the driver); encoding is one
    ``map_batches`` per subspace plus (m−1) hash joins to assemble the
    code table, which then REPLACES the raw vectors (the 100-TB point of
    PQ: the scan side holds m bytes/vector, not 8·dim); queries are one
    scan of the code table with per-batch partial top-k."""

    def __init__(self, m: int = 2, ks: int = 16, iters: int = 2):
        self.m = m
        self.ks = ks
        self.iters = iters
        self.codebooks: list[np.ndarray] | None = None  # m × (ks, dim/m)
        self.dim: int | None = None
        self._codes = None  # Dataset: vec_id, code_0 … code_{m-1}

    def _bounds(self) -> list[tuple[int, int]]:
        step = self.dim // self.m
        return [(s * step, (s + 1) * step if s < self.m - 1 else self.dim)
                for s in range(self.m)]

    def fit(self, ds, id_column: str = "vec_id", emb_column: str = "embedding") -> None:
        from .vectors import kmeans_fit

        first = ds.take_batch(1, batch_format="pyarrow")
        self.dim = len(first[emb_column][0].as_py())
        if self.dim % self.m:
            raise ValueError(f"dim {self.dim} not divisible into {self.m} subspaces")

        def slicer(lo: int, hi: int):
            def fn(batch: pa.Table) -> pa.Table:
                from .vectors import _extract_matrix

                mat = _extract_matrix(batch[emb_column].combine_chunks())
                sub = mat[:, lo:hi]
                flat = pa.array(sub.ravel(), pa.float64())
                return pa.table(
                    {
                        id_column: batch[id_column].cast(pa.int64()),
                        emb_column: pa.FixedSizeListArray.from_arrays(flat, hi - lo),
                    }
                )

            return fn

        self.codebooks = []
        codes = None
        for s, (lo, hi) in enumerate(self._bounds()):
            sliced = ds.map_batches(slicer(lo, hi), batch_format="pyarrow")
            cent, labels = kmeans_fit(
                sliced, k=self.ks, iters=self.iters,
                id_column=id_column, emb_column=emb_column,
            )
            self.codebooks.append(cent)
            lab = labels.map_batches(
                lambda b, _s=s: pa.table(
                    {id_column: b[id_column].cast(pa.int64()),
                     f"code_{_s}": b["cluster"].cast(pa.int64())}
                ),
                batch_format="pyarrow",
            )
            codes = lab if codes is None else codes.join(
                lab, join_type="inner", num_partitions=8, on=(id_column,)
            )
        self._codes = codes.materialize()

    def query(self, vec: np.ndarray, k: int = 10, id_column: str = "vec_id") -> list[tuple[int, float]]:
        """Top-k smallest ADC distances (ties by id). Returns
        [(vec_id, adc)] with adc rounded to 6 digits."""
        if self._codes is None or self.codebooks is None:
            raise RuntimeError("fit() the index first")
        q = np.asarray(vec, dtype=np.float64)
        tables = []
        for (lo, hi), cb in zip(self._bounds(), self.codebooks):
            d = q[lo:hi][None, :] - cb  # (ks, sub_dim)
            tables.append((d * d).sum(axis=1))  # squared L2, subspace order
        tbl = np.stack(tables)  # (m, ks)

        m = self.m

        def block_topk(batch: pa.Table, _tbl=tbl) -> pa.Table:
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            adc = np.zeros(len(ids), np.float64)
            for s in range(m):
                adc += _tbl[s][batch[f"code_{s}"].to_numpy(zero_copy_only=False)]
            order = np.lexsort((ids, adc))[:k]
            return pa.table(
                {
                    id_column: pa.array(ids[order], pa.int64()),
                    "adc": pa.array(adc[order], pa.float64()),
                }
            )

        part = self._codes.map_batches(block_topk, batch_format="pyarrow").to_pandas()
        part = part.sort_values(["adc", id_column]).head(k)
        return [(int(r[id_column]), round(float(r["adc"]), 6)) for _, r in part.iterrows()]

    def query_rerank(
        self,
        vec: np.ndarray,
        ds,
        k: int = 10,
        rerank: int = 100,
        id_column: str = "vec_id",
        emb_column: str = "embedding",
    ) -> list[tuple[int, float]]:
        """ADC shortlist → exact re-rank (the standard IVF-PQ serving
        shape): the code scan returns the ``rerank`` smallest ADC ids,
        then ONE pruned pass over the raw vectors scores exactly those
        rows by cosine and the driver keeps top-k by (-cosine, id).
        Lifts recall@10 from ~0.1 (pure ADC at m=2) to ~0.8 at
        rerank=100 on the sf0.1 corpus while still scanning codes, not
        vectors. Returns [(vec_id, cosine)] rounded to 6 digits."""
        import ray

        shortlist = np.array(
            [i for i, _ in self.query(vec, k=rerank, id_column=id_column)], np.int64
        )
        q = np.asarray(vec, dtype=np.float64)
        q = q / max(np.linalg.norm(q), 1e-12)
        ref = ray.put(set(shortlist.tolist()))

        def exact(batch: pa.Table, _ref=ref) -> pa.Table:
            keep = ray.get(_ref)
            ids = batch[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
            sel = np.flatnonzero(np.isin(ids, np.fromiter(keep, np.int64)))
            if not len(sel):
                return pa.table(
                    {id_column: pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            mat = np.stack(batch[emb_column].to_pandas().to_numpy())[sel].astype(np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            return pa.table(
                {
                    id_column: pa.array(ids[sel], pa.int64()),
                    "cosine": pa.array(mat @ q, pa.float64()),
                }
            )

        part = ds.map_batches(exact, batch_format="pyarrow").to_pandas()
        part = part.sort_values(
            ["cosine", id_column], ascending=[False, True], kind="mergesort"
        ).head(k)
        return [
            (int(r[id_column]), round(float(r["cosine"]), 6))
            for _, r in part.iterrows()
        ]
