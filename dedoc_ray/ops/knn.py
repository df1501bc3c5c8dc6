"""Similarity search over an embedding column.

- ``knn_bruteforce``: exact top-k cosine per query. The (small) query matrix
  is broadcast once with ``ray.put``; every batch computes a vectorized
  float64 matmul and emits only its per-batch top-k candidates, so the final
  groupby sees at most ``k × n_batches`` rows per query — a partial top-k
  combiner, not an all-to-all of scores.
- ``embedding_neardup_pairs``: cosine >= threshold pairs via the same
  broadcast pattern (valid while one side fits in memory; the LSH-bucketed
  variant in dedoc_ray.ops.dedup is the both-sides-large path).
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa


def _embedding_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    arr = np.array(col.to_pylist(), dtype=np.float64)
    return arr


def _load_queries(sf_dir: str, n_queries: int):
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n_queries
    )
    qids = np.array(tbl["vec_id"].to_pylist(), dtype=np.int64)
    qmat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    return qids, qmat


class TopKKernel:
    """Per-batch brute-force cosine → per-batch top-k candidate rows."""

    def __init__(self, queries_ref, k: int) -> None:
        import ray

        self.qids, self.qmat = ray.get(queries_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ self.qmat.T  # (batch, nq)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        out_q: List[int] = []
        out_v: List[int] = []
        out_s: List[float] = []
        k = min(self.k, sims.shape[0])
        for j, qid in enumerate(self.qids):
            idx = np.argpartition(-sims[:, j], k - 1)[:k]
            out_q.extend([int(qid)] * len(idx))
            out_v.extend(vec_ids[idx].tolist())
            out_s.extend(sims[idx, j].tolist())
        return pa.Table.from_pydict(
            {
                "qid": pa.array(out_q, "int64"),
                "vec_id": pa.array(out_v, "int64"),
                "sim": pa.array(out_s, "float64"),
            }
        )


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 8):
    """Exact top-k neighbours (excluding the query itself) per query vector.

    Output: (qid, vec_id) — the neighbour SET; similarity kept out of the
    schema so the oracle compare is float-free.
    """
    import ray
    import ray.data as rd

    queries_ref = ray.put(_load_queries(sf_dir, n_queries))
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    candidates = emb.map_batches(
        TopKKernel, fn_constructor_kwargs={"queries_ref": queries_ref, "k": k + 1},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["vec_id"] != group["qid"]]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return g[["qid", "vec_id"]]

    return candidates.groupby("qid").map_groups(final_topk, batch_format="pandas")


def knn_sql(k: int = 10, n_queries: int = 8) -> str:
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {n_queries})
SELECT qid, vec_id
FROM q CROSS JOIN embeddings e
WHERE e.vec_id <> q.qid
QUALIFY row_number() OVER (
    PARTITION BY qid
    ORDER BY list_cosine_similarity(e.embedding, q.qe) DESC, e.vec_id ASC
) <= {k}
"""


class NearDupKernel:
    """Pairs (a < b) with cosine >= threshold against the broadcast side."""

    def __init__(self, side_ref, threshold: float) -> None:
        import ray

        self.ids, self.mat = ray.get(side_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ self.mat.T
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        rows_i, rows_j = np.nonzero(sims >= self.threshold)
        a = vec_ids[rows_i]
        b = self.ids[rows_j]
        keep = a < b
        return pa.Table.from_pydict(
            {"vec_a": pa.array(a[keep].tolist(), "int64"), "vec_b": pa.array(b[keep].tolist(), "int64")}
        )


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.3):
    import ray
    import ray.data as rd
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    side_ref = ray.put((ids, mat))

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return emb.map_batches(
        NearDupKernel, fn_constructor_kwargs={"side_ref": side_ref, "threshold": threshold},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    )


def embedding_neardup_sql(threshold: float = 0.3) -> str:
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {threshold}
"""


# ------------------------------------------------------------------- IVF ANN


def train_centroids(sf_dir: str, n_lists: int = 16, sample_rows: int = 512, iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on a head sample (driver-side, once).

    The scale path for similarity search: cluster the space into n_lists,
    then score only the lists a query probes. Centroid training reads a
    bounded sample — at 100 TB this stays a constant-size driver step; the
    big side streams through IVFTopKKernel below.
    """
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < sample_rows
    )
    mat = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    n = len(mat)
    idx = np.linspace(0, n - 1, n_lists).astype(int)  # deterministic init
    cent = mat[idx].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 1e-12:
                    cent[c] = v / norm
    return cent


class IVFTopKKernel:
    """Per-batch IVF scoring: assign rows to lists, score each query ONLY
    against rows in its probed lists, emit per-batch top-k candidates."""

    def __init__(self, queries_ref, centroids_ref, k: int, n_probe: int) -> None:
        import ray

        self.qids, self.qmat = ray.get(queries_ref)
        self.cent = ray.get(centroids_ref)
        self.k = k
        n_lists = len(self.cent)
        probe = np.argsort(-(self.qmat @ self.cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
        # lookup[l, j] = does query j probe list l
        self.lookup = np.zeros((n_lists, len(self.qids)), dtype=bool)
        for j in range(len(self.qids)):
            self.lookup[probe[j], j] = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = mat / norms
        assign = np.argmax(unit @ self.cent.T, axis=1)  # (batch,)
        sims = unit @ self.qmat.T                       # (batch, nq)
        sims = np.where(self.lookup[assign], sims, -np.inf)
        vec_ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        out_q: List[int] = []
        out_v: List[int] = []
        out_s: List[float] = []
        k = min(self.k, sims.shape[0])
        for j, qid in enumerate(self.qids):
            idx = np.argpartition(-sims[:, j], k - 1)[:k]
            idx = idx[np.isfinite(sims[idx, j])]
            out_q.extend([int(qid)] * len(idx))
            out_v.extend(vec_ids[idx].tolist())
            out_s.extend(sims[idx, j].tolist())
        return pa.Table.from_pydict(
            {
                "qid": pa.array(out_q, "int64"),
                "vec_id": pa.array(out_v, "int64"),
                "sim": pa.array(out_s, "float64"),
            }
        )


def knn_ivf(sf_dir: str, k: int = 10, n_queries: int = 8, n_lists: int = 16, n_probe: int = 4):
    """Approximate top-k via IVF probing (deterministic; recall vs brute
    force asserted in pytest — not SQL-expressible, rows-only oracle)."""
    import ray
    import ray.data as rd

    queries_ref = ray.put(_load_queries(sf_dir, n_queries))
    centroids_ref = ray.put(train_centroids(sf_dir, n_lists=n_lists))
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    candidates = emb.map_batches(
        IVFTopKKernel,
        fn_constructor_kwargs={"queries_ref": queries_ref, "centroids_ref": centroids_ref, "k": k + 1, "n_probe": n_probe},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["vec_id"] != group["qid"]]
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return g[["qid", "vec_id"]]

    return candidates.groupby("qid").map_groups(final_topk, batch_format="pandas")
