"""Distributed k-means over the embedding table + SemDeDup-style
semantic dedup.

``kmeans_fit`` is full Lloyd over EVERY row (unlike
``ops/knn.py::train_centroids``, the bounded head-sample trainer used to
seed IVF): each round is one streaming pass where a broadcast-centroid
kernel emits per-batch PARTIAL (cluster, count, sum-vector) rows — the
classic combiner, so the driver only ever reduces
O(n_batches x k) partials, never rows. Partials are reduced in sorted
batch-key order, making the float64 accumulation independent of batch
arrival order: two runs produce bit-identical centroids.

``semantic_dedup`` is the SemDeDup shape (Abbas et al., 2023): assign
every vector to its nearest centroid, shuffle once on cluster id, and
drop any vector whose cluster holds a SMALLER-id vector with cosine
similarity >= threshold. Pairwise work is confined to within-cluster
blocks — the quadratic term shrinks by ~k — and is vectorized
(one matmul per cluster partition). Deterministic end to end; pytest
asserts exact equality with a single-process reference."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from dedoc_ray.ops.knn import _embedding_matrix

K_DEFAULT = 8
ITERS_DEFAULT = 3
SEM_THRESHOLD = 0.97


def _assign(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest centroid per row, matmul-form squared distance.

    ONE shared definition: the trainer kernel, the assignment map, and
    the pytest reference all call this, so float tie behavior can never
    diverge between the distributed and single-process paths."""
    d2 = (
        (mat * mat).sum(axis=1)[:, None]
        - 2.0 * (mat @ cent.T)
        + (cent * cent).sum(axis=1)[None, :]
    )
    return np.argmin(d2, axis=1)


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """Deterministic init: the first k vec_ids (pushdown read, tiny)."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < k
    )
    order = np.argsort(np.asarray(tbl["vec_id"]))
    return _embedding_matrix(tbl).astype(np.float64)[order]


class KMeansPartialKernel:
    """batch -> (batch_key, cluster, count, vsum) partial rows.

    batch_key (the batch's min vec_id) gives the driver a deterministic
    reduce order; vsum is float64 so the reduction is exact enough to be
    reproducible bit-for-bit under the sorted order."""

    def __init__(self, cent_ref) -> None:
        import ray

        self.cent = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _embedding_matrix(batch).astype(np.float64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        assign = _assign(mat, self.cent)
        keys: List[int] = []
        clusters: List[int] = []
        counts: List[int] = []
        sums: List[List[float]] = []
        bk = int(ids.min()) if len(ids) else 0
        for c in np.unique(assign):
            members = mat[assign == c]
            keys.append(bk)
            clusters.append(int(c))
            counts.append(len(members))
            sums.append(members.sum(axis=0).tolist())
        return pa.Table.from_pydict(
            {
                "batch_key": pa.array(keys, "int64"),
                "cluster": pa.array(clusters, "int64"),
                "count": pa.array(counts, "int64"),
                "vsum": pa.array(sums, pa.list_(pa.float64())),
            }
        )


def kmeans_fit(sf_dir: str, k: int = K_DEFAULT, iters: int = ITERS_DEFAULT) -> np.ndarray:
    """Full-corpus Lloyd: ``iters`` rounds of broadcast → partial → reduce."""
    import ray
    import ray.data as rd

    cent = _init_centroids(sf_dir, k)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    for _ in range(iters):
        cent_ref = ray.put(cent)
        parts = emb.map_batches(
            KMeansPartialKernel,
            fn_constructor_kwargs={"cent_ref": cent_ref},
            batch_format="pyarrow", batch_size=4096, concurrency=(1, 4),
        ).to_pandas()  # tiny: <= n_batches x k combiner rows
        parts = parts.sort_values(["batch_key", "cluster"], kind="stable")
        new = cent.copy()
        for c in range(k):
            rows = parts[parts["cluster"] == c]
            n = int(rows["count"].sum())
            if n:
                s = np.zeros(cent.shape[1], np.float64)
                for v in rows["vsum"]:
                    s += np.asarray(v, np.float64)
                new[c] = s / n
        cent = new
    return cent


def kmeans_clusters(sf_dir: str, k: int = K_DEFAULT, iters: int = ITERS_DEFAULT):
    """(vec_id, cluster) for every row under the fitted centroids."""
    import ray
    import ray.data as rd

    cent_ref = ray.put(kmeans_fit(sf_dir, k, iters))

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cent = _ray.get(cent_ref)
        mat = _embedding_matrix(batch).astype(np.float64)
        return pa.Table.from_pydict(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(_assign(mat, cent).astype(np.int64), "int64"),
            }
        )

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return emb.map_batches(assign, batch_format="pyarrow", batch_size=4096)


def _dup_mask(mat: np.ndarray, threshold: float, block: int = 1024) -> np.ndarray:
    """dup[j] = exists i < j with cosine(mat[i], mat[j]) >= threshold.

    Blockwise matmul bounds peak memory to block x n; both the
    distributed path and the pytest reference call THIS function on the
    same per-cluster row order, so results are bit-identical."""
    n = len(mat)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    matn = mat / norms
    dup = np.zeros(n, bool)
    cols = np.arange(n)
    for j0 in range(0, n, block):
        j1 = min(j0 + block, n)
        sim = matn[j0:j1] @ matn.T  # (j1-j0, n)
        # row j may only match columns i < j (strict lower triangle)
        mask = cols[None, :] < (j0 + np.arange(j1 - j0))[:, None]
        dup[j0:j1] = ((sim >= threshold) & mask).any(axis=1)
    return dup


def semantic_dedup(
    sf_dir: str,
    threshold: float = SEM_THRESHOLD,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
    num_parts: int = 16,
):
    """SemDeDup: drop vectors with a smaller-id cosine>=threshold neighbor
    in the same k-means cluster. Returns (vec_id, cluster, keep).

    One cluster-keyed shuffle of (vec_id, cluster, embedding); inside each
    cluster-complete partition the pair scan is ONE normalized matmul and
    a triangular mask — never a cross-cluster comparison. At 100 TB the
    knob is k: more clusters → smaller quadratic blocks (SemDeDup's own
    scaling argument)."""
    import ray
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    cent_ref = ray.put(kmeans_fit(sf_dir, k, iters))

    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cent = _ray.get(cent_ref)
        mat = _embedding_matrix(batch).astype(np.float64)
        return batch.append_column(
            "cluster", pa.array(_assign(mat, cent).astype(np.int64), "int64")
        )

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    assigned = emb.map_batches(assign, batch_format="pyarrow", batch_size=4096)

    def dedup_cluster(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "cluster": pd.Series([], dtype="int64"),
                    "keep": pd.Series([], dtype="int64"),
                }
            )
        out = []
        for c, grp in df.groupby("cluster"):
            grp = grp.sort_values("vec_id")
            mat = np.asarray([np.asarray(v, np.float64) for v in grp["embedding"]])
            dup = _dup_mask(mat, threshold)
            out.append(
                pd.DataFrame(
                    {
                        "vec_id": grp["vec_id"].to_numpy("int64"),
                        "cluster": np.full(len(grp), c, np.int64),
                        "keep": (~dup).astype(np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    return hash_partition_apply(assigned, ["cluster"], dedup_cluster, num_parts=num_parts)


def semantic_dedup_reference(sf_dir: str, threshold: float = SEM_THRESHOLD,
                             k: int = K_DEFAULT, iters: int = ITERS_DEFAULT) -> pd.DataFrame:
    """Single-process replica for pytest exact-equality (same centroids,
    same assignment and pair rules — distribution must not change results)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    cent = kmeans_fit(sf_dir, k, iters)
    mat = _embedding_matrix(tbl).astype(np.float64)
    ids = np.asarray(tbl["vec_id"])
    assign = _assign(mat, cent)
    rows: List[Tuple[int, int, int]] = []
    for c in np.unique(assign):
        sel = assign == c
        sub_ids = ids[sel]
        order = np.argsort(sub_ids)
        sub = mat[sel][order]
        sub_ids = sub_ids[order]
        dup = _dup_mask(sub, threshold)
        rows.extend(
            (int(i), int(c), int(not d)) for i, d in zip(sub_ids, dup)
        )
    return pd.DataFrame(rows, columns=["vec_id", "cluster", "keep"])
