"""Product quantization (PQ) — compressed embeddings + ADC search.

At 100 TB an embedding column is the dominant storage/IO cost: 64 float32
dims = 256 B/row, while a PQ code with 4 subspaces × 16 centroids is
4 B/row (64× smaller). PQ splits each vector into ``n_sub`` contiguous
subvectors, k-means-quantizes every subspace independently, and stores
only the per-subspace centroid ids. Search uses ADC (asymmetric distance
computation): a query builds one tiny lookup table per subspace —
distances to all centroids — and each candidate's approximate distance
is a sum of ``n_sub`` table lookups over its byte codes. No decompression
ever happens.

Ray-Data shape (same discipline as ops/kmeans.py / ops/knn.py):
- training = Lloyd rounds where ONE streaming pass emits per-batch
  combiner partials for ALL subspaces at once ((batch_key, sub, cluster,
  count, vsum) rows); the driver reduces O(n_batches × n_sub × k)
  partials in sorted batch-key order → bit-deterministic codebooks;
- encoding = map-only with broadcast codebooks (ray.put once);
- search = broadcast query LUTs, per-batch partial top-k combiner, one
  tiny qid-partitioned merge (reusing the knn merge) — the corpus never
  shuffles, only ≤ (k+1)×n_batches candidate rows do.

Float k-means codebooks are not SQL-replayable, so the driver query is
rows-only (like knn_ivf); pytest pins exact equality between the
distributed path and a single-process reference, plus recall vs exact
brute-force cosine.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from dedoc_ray.ops.kmeans import _assign
from dedoc_ray.ops.knn import _embedding_matrix

N_SUB_DEFAULT = 4
K_CODES_DEFAULT = 16
ITERS_DEFAULT = 3


def _split(mat: np.ndarray, n_sub: int) -> List[np.ndarray]:
    w = mat.shape[1] // n_sub
    return [mat[:, s * w:(s + 1) * w] for s in range(n_sub)]


def _unit(mat: np.ndarray) -> np.ndarray:
    """Row-normalize: squared-L2 ADC on unit vectors ranks identically to
    cosine, aligning PQ with the rest of the embedding ops."""
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return mat / norms


def _init_codebooks(sf_dir: str, n_sub: int, k: int) -> np.ndarray:
    """Deterministic init: subvectors of the first k vec_ids."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < k
    )
    order = np.argsort(np.asarray(tbl["vec_id"]))
    mat = _unit(_embedding_matrix(tbl).astype(np.float64)[order])
    return np.stack(_split(mat, n_sub))  # (n_sub, k, w)


class PqPartialKernel:
    """One batch → combiner partials for every subspace."""

    def __init__(self, books_ref) -> None:
        import ray

        self.books = ray.get(books_ref) if not isinstance(books_ref, np.ndarray) else books_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _unit(_embedding_matrix(batch).astype(np.float64))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        bk = int(ids.min()) if len(ids) else 0
        keys, subs, clusters, counts, sums = [], [], [], [], []
        for s, sub in enumerate(_split(mat, len(self.books))):
            assign = _assign(sub, self.books[s])
            for c in np.unique(assign):
                members = sub[assign == c]
                keys.append(bk)
                subs.append(s)
                clusters.append(int(c))
                counts.append(len(members))
                sums.append(members.sum(axis=0).tolist())
        return pa.Table.from_pydict({
            "batch_key": pa.array(keys, "int64"),
            "sub": pa.array(subs, "int64"),
            "cluster": pa.array(clusters, "int64"),
            "count": pa.array(counts, "int64"),
            "vsum": pa.array(sums, pa.list_(pa.float64())),
        })


def pq_fit(sf_dir: str, n_sub: int = N_SUB_DEFAULT, k: int = K_CODES_DEFAULT,
           iters: int = ITERS_DEFAULT) -> np.ndarray:
    """Codebooks (n_sub, k, d/n_sub); all subspaces trained in the same
    streaming passes."""
    import ray
    import ray.data as rd

    books = _init_codebooks(sf_dir, n_sub, k)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    for _ in range(iters):
        books_ref = ray.put(books)
        def fold(batch, _ref=books_ref):
            # task-based: a fresh actor pool per Lloyd ROUND would pay
            # spinup 3× per fit; the broadcast codebooks are a tiny get
            return PqPartialKernel(_ref)(batch)

        parts = emb.map_batches(
            fold, batch_format="pyarrow", batch_size=4096,
        ).to_pandas()  # ≤ n_batches × n_sub × k combiner rows
        parts = parts.sort_values(["batch_key", "sub", "cluster"], kind="stable")
        new = books.copy()
        for s in range(n_sub):
            for c in range(k):
                rows = parts[(parts["sub"] == s) & (parts["cluster"] == c)]
                n = int(rows["count"].sum())
                if n:
                    acc = np.zeros(books.shape[2], np.float64)
                    for v in rows["vsum"]:
                        acc += np.asarray(v, np.float64)
                    new[s, c] = acc / n
        books = new
    return books


def _encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, n_sub) uint8 codes."""
    return np.stack(
        [_assign(sub, books[s]) for s, sub in enumerate(_split(mat, len(books)))],
        axis=1,
    ).astype(np.uint8)


def pq_encode(sf_dir: str, books: Optional[np.ndarray] = None,
              n_sub: int = N_SUB_DEFAULT, k: int = K_CODES_DEFAULT,
              iters: int = ITERS_DEFAULT):
    """(vec_id, codes list<uint8>) Dataset — the compressed column a real
    pipeline persists instead of the float vectors."""
    import ray
    import ray.data as rd

    if books is None:
        books = pq_fit(sf_dir, n_sub, k, iters)
    books_ref = ray.put(books)

    def enc(batch: pa.Table) -> pa.Table:
        import ray as _ray

        b = _ray.get(books_ref)
        mat = _unit(_embedding_matrix(batch).astype(np.float64))
        codes = _encode(mat, b)
        return pa.Table.from_pydict({
            "vec_id": batch["vec_id"],
            "codes": pa.array(codes.tolist(), pa.list_(pa.uint8())),
        })

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return emb.map_batches(enc, batch_format="pyarrow", batch_size=4096)


def _query_luts(sf_dir: str, books: np.ndarray, n_queries: int) -> np.ndarray:
    """(n_q, n_sub, k) squared-L2 LUTs for the first ``n_queries`` vectors."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n_queries
    )
    order = np.argsort(np.asarray(tbl["vec_id"]))
    qmat = _unit(_embedding_matrix(tbl).astype(np.float64)[order])
    n_sub, k, w = books.shape
    luts = np.empty((len(qmat), n_sub, k), np.float64)
    for s, qsub in enumerate(_split(qmat, n_sub)):
        diff = qsub[:, None, :] - books[s][None, :, :]
        luts[:, s, :] = (diff * diff).sum(axis=2)
    return luts


def _adc_scores(codes: np.ndarray, luts: np.ndarray) -> np.ndarray:
    """(n_q, n_rows) approximate squared distances from byte codes."""
    n_q, n_sub, _ = luts.shape
    out = np.zeros((n_q, codes.shape[0]), np.float64)
    for s in range(n_sub):
        out += luts[:, s, :][:, codes[:, s].astype(np.int64)]
    return out


class AdcTopKKernel:
    """Per-batch partial top-k under ADC distance (smaller = closer).

    ``rerank_r``: PQ-with-reranking (the standard production shape) — ADC
    prunes each batch to an R-shortlist, exact cosine is computed ONLY for
    shortlisted rows (we still hold the batch's original vectors), and the
    emitted sim is exact. Compute stays O(R) exact per batch instead of
    O(batch); the final merge then ranks by true similarity."""

    def __init__(self, books_ref, luts_ref, k: int, qmat_ref=None,
                 rerank_r: Optional[int] = None) -> None:
        import ray

        self.books = ray.get(books_ref)
        self.luts = ray.get(luts_ref)
        self.k = k
        self.qmat = ray.get(qmat_ref) if qmat_ref is not None else None
        self.rerank_r = rerank_r

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _unit(_embedding_matrix(batch).astype(np.float64))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = _encode(mat, self.books)
        dist = _adc_scores(codes, self.luts)
        n_q, n = dist.shape
        qids, vids, sims = [], [], []
        for q in range(n_q):
            if self.rerank_r is not None:
                short = np.lexsort((ids, dist[q]))[: min(self.rerank_r, n)]
                exact = mat[short] @ self.qmat[q]
                keep = short[np.lexsort((ids[short], -exact))[: min(self.k, len(short))]]
                sim_vals = mat[keep] @ self.qmat[q]
            else:
                keep = np.lexsort((ids, dist[q]))[: min(self.k, n)]  # ties → lower vec_id
                sim_vals = -dist[q, keep]  # negate: merge sorts sim DESC
            qids.extend([q] * len(keep))
            vids.extend(ids[keep].tolist())
            sims.extend(np.asarray(sim_vals, np.float64).tolist())
        return pa.Table.from_pydict({
            "qid": pa.array(qids, "int64"),
            "vec_id": pa.array(vids, "int64"),
            "sim": pa.array(sims, "float64"),
        })


def _query_matrix(sf_dir: str, n_queries: int) -> np.ndarray:
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < n_queries
    )
    order = np.argsort(np.asarray(tbl["vec_id"]))
    return _unit(_embedding_matrix(tbl).astype(np.float64)[order])


def pq_search(sf_dir: str, k: int = 10, n_queries: int = 8,
              n_sub: int = N_SUB_DEFAULT, n_codes: int = K_CODES_DEFAULT,
              iters: int = ITERS_DEFAULT, books: Optional[np.ndarray] = None,
              rerank_r: Optional[int] = None):
    """ADC top-k per query → (qid, vec_id) Dataset (same contract as
    knn_bruteforce; self-match excluded in the merge). ``rerank_r`` turns
    on per-batch exact reranking of the ADC shortlist."""
    import ray
    import ray.data as rd

    from dedoc_ray.ops.knn import _final_topk

    if books is None:
        books = pq_fit(sf_dir, n_sub, n_codes, iters)
    books_ref = ray.put(books)
    luts_ref = ray.put(_query_luts(sf_dir, books, n_queries))
    kwargs = {"books_ref": books_ref, "luts_ref": luts_ref, "k": k + 1}
    if rerank_r is not None:
        kwargs["qmat_ref"] = ray.put(_query_matrix(sf_dir, n_queries))
        kwargs["rerank_r"] = rerank_r
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    def score(batch, _kw=kwargs):
        return AdcTopKKernel(**_kw)(batch)  # task-based: tiny broadcast state

    candidates = emb.map_batches(score, batch_format="pyarrow", batch_size=4096)
    return _final_topk(candidates, k)


def pq_search_reference(sf_dir: str, k: int = 10, n_queries: int = 8,
                        n_sub: int = N_SUB_DEFAULT, n_codes: int = K_CODES_DEFAULT,
                        books: Optional[np.ndarray] = None) -> pd.DataFrame:
    """Single-process replay of pq_search (shared kernels) for pytest
    exact-equality: same codebooks, same ADC, same tie rules."""
    import pyarrow.dataset as pads

    tbl = pads.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"]).astype(np.int64)
    order = np.argsort(ids)
    mat = _unit(_embedding_matrix(tbl).astype(np.float64)[order])
    ids = ids[order]
    assert books is not None
    codes = _encode(mat, books)
    luts = _query_luts(sf_dir, books, n_queries)
    dist = _adc_scores(codes, luts)
    rows = []
    for q in range(n_queries):
        df = pd.DataFrame({"vec_id": ids, "sim": -dist[q]})
        df = df[df["vec_id"] != q]
        df = df.sort_values(["sim", "vec_id"], ascending=[False, True], kind="stable")
        for vid in df.head(k)["vec_id"]:
            rows.append((q, int(vid)))
    return pd.DataFrame(rows, columns=["qid", "vec_id"])
