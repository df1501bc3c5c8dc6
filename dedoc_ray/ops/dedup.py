"""Deduplication operators — exact, n-gram Jaccard, MinHash+LSH, SimHash.

Design notes (100 TB shape):

- Exact dedup: content hash computed per batch (vectorized), then ONE
  hash-partitioned ``groupby(fingerprint)`` keeping the min doc_id per
  group. The shuffle moves only (fingerprint, doc_id) pairs — never the
  text — because the hash column is computed first and the payload pruned.
- Jaccard pairs: inverted-index join. Explode (shingle_hash, doc_id),
  groupby shingle → emit co-occurring pairs per posting list, groupby pair →
  intersection counts, then jaccard = |∩| / (|A|+|B|-|∩|) with per-doc set
  sizes broadcast. Only 8-byte shingle hashes shuffle. Posting lists longer
  than ``max_posting`` are dropped (stop-shingles) — the standard skew guard;
  the oracle applies the same rule.
- MinHash+LSH: per-doc signature (k permutations via universal hashing,
  vectorized in numpy), banded into r-row bands; band buckets groupby →
  candidate pairs → exact-Jaccard verify. Signature computation is the only
  heavy stage and it's embarrassingly parallel.
- SimHash: 64-bit fingerprint from token hashes, bucketed by 4 x 16-bit
  bands for Hamming-distance candidate search.
"""

from __future__ import annotations

import hashlib
import re
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")


def _empty_frame(*cols: str) -> "pd.DataFrame":
    return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str) -> int:
    """Deterministic 64-bit string hash (md5-based, process-independent)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct hashed n-word shingles of the lowercased text."""
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        shingles = {" ".join(toks)} if toks else set()
    else:
        shingles = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return np.fromiter((_stable_hash64(s) for s in shingles), dtype=np.uint64, count=len(shingles))


# ------------------------------------------------------------------ exact


def exact_dedup(sf_dir: str):
    """Keep the smallest doc_id per identical normalized text.

    One hash-partitioned shuffle of (fingerprint, doc_id) pairs — the text
    never moves — then a vectorized min-per-fingerprint inside each
    partition (dedoc has no corpus ops; this is SURVEY.md §2.7's design).
    """
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply
    from dedoc_ray.ops.textstats import DocStatsKernel

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    hashed = docs.map_batches(DocStatsKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4))
    hashed = hashed.select_columns(["doc_id", "fingerprint"])

    def first_per_fp(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"), "fingerprint": pd.Series([], dtype="object")})
        g = df.groupby("fingerprint", as_index=False)["doc_id"].min()
        return g[["doc_id", "fingerprint"]]

    return hash_partition_apply(hashed, ["fingerprint"], first_per_fp, num_parts=32)


EXACT_DEDUP_SQL = """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
QUALIFY row_number() OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) ORDER BY doc_id) = 1
"""


# ------------------------------------------------------------------ jaccard


class ShingleKernel:
    """doc → exploded (shingle hash, doc_id, set size) rows."""

    def __init__(self, n: int = 3) -> None:
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: List[int] = []
        hashes: List[int] = []
        sizes: List[int] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            hs = shingle_hashes(text, self.n)
            doc_ids.extend([doc_id] * len(hs))
            hashes.extend(hs.tolist())
            sizes.extend([len(hs)] * len(hs))
        return pa.Table.from_pydict(
            {
                "shingle": pa.array(hashes, "uint64"),
                "doc_id": pa.array(doc_ids, "int64"),
                "set_size": pa.array(sizes, "int64"),
            }
        )


def jaccard_pairs(sf_dir: str, threshold: float = 0.5, n: int = 3, max_posting: int = 64):
    """Exact n-gram Jaccard duplicate pairs via inverted-index join.

    Returns (doc_a, doc_b, inter, size_a, size_b) for pairs with
    jaccard >= threshold; integer columns only, so the DuckDB oracle
    matches bit-for-bit.
    """
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    posting = docs.map_batches(
        ShingleKernel, fn_constructor_kwargs={"n": n},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 4),
    )

    def pairs_of_partition(df: pd.DataFrame) -> pd.DataFrame:
        """All co-occurrence pairs of the partition's posting lists, vectorized:
        stop-shingle filter, then a self-merge per shingle (cost bounded by
        max_posting² per list)."""
        if df.empty:
            return _empty_frame("doc_a", "doc_b", "size_a", "size_b")
        sz = df.groupby("shingle")["doc_id"].transform("size")
        df = df[(sz >= 2) & (sz <= max_posting)]
        if df.empty:
            return _empty_frame("doc_a", "doc_b", "size_a", "size_b")
        m = df.merge(df, on="shingle", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_a"].to_numpy("int64"),
                "doc_b": m["doc_id_b"].to_numpy("int64"),
                "size_a": m["set_size_a"].to_numpy("int64"),
                "size_b": m["set_size_b"].to_numpy("int64"),
            }
        )

    pair_rows = hash_partition_apply(posting, ["shingle"], pairs_of_partition, num_parts=32)

    def score_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty_frame("doc_a", "doc_b", "inter", "size_a", "size_b")
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            inter=("size_a", "size"), size_a=("size_a", "first"), size_b=("size_b", "first")
        )
        union = g["size_a"] + g["size_b"] - g["inter"]
        g = g[(union > 0) & (g["inter"] / union >= threshold)]
        return g.astype("int64")

    return hash_partition_apply(pair_rows, ["doc_a", "doc_b"], score_pairs, num_parts=16)


def jaccard_pairs_sql(threshold: float = 0.5, max_posting: int = 64) -> str:
    """DuckDB oracle for ``jaccard_pairs``: same shingling (3-word windows,
    whole-text shingle when fewer than 3 tokens), same stop-shingle rule."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
      [array_to_string(t[i:i+2], ' ') for i in range(1, greatest(length(t) - 2, 1) + 1)]
  )) AS s
  FROM toks WHERE length(t) > 0
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
posting AS (SELECT s FROM sh GROUP BY s HAVING count(*) BETWEEN 2 AND {max_posting}),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b USING (s) JOIN posting USING (s)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, inter, sa.sz AS size_a, sb.sz AS size_b
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= {threshold}
"""


# ------------------------------------------------------------------ minhash


class MinHashKernel:
    """doc → LSH band rows (band_id, band_hash, doc_id).

    k hash functions h_i(x) = (a_i * x + b_i) mod p over shingle hashes,
    vectorized; bands of r rows hashed to a bucket key.
    """

    def __init__(self, num_perm: int = 128, band_size: int = 4, n: int = 3, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.band_size = band_size
        self.n_bands = num_perm // band_size
        self.n = n

    def signature(self, hs: np.ndarray) -> np.ndarray:
        if len(hs) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (k, m) = (a ⊗ hs + b) mod p, min over shingles
        prod = (self.a[:, None] * hs[None, :] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_ids: List[int] = []
        band_hashes: List[int] = []
        doc_ids: List[int] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = self.signature(shingle_hashes(text, self.n))
            for band in range(self.n_bands):
                chunk = sig[band * self.band_size:(band + 1) * self.band_size]
                bh = int.from_bytes(hashlib.md5(chunk.tobytes()).digest()[:8], "little")
                band_ids.append(band)
                band_hashes.append(bh)
                doc_ids.append(doc_id)
        return pa.Table.from_pydict(
            {
                "band_id": pa.array(band_ids, "int32"),
                "band_hash": pa.array(band_hashes, "uint64"),
                "doc_id": pa.array(doc_ids, "int64"),
            }
        )


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5, num_perm: int = 128, band_size: int = 4, n: int = 3):
    """Candidate pairs from LSH buckets, verified with exact Jaccard.

    Not SQL-expressible (signature permutations) → rows-only driver check;
    the pytest suite verifies LSH recall against exact jaccard_pairs.
    """
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bands = docs.map_batches(
        MinHashKernel, fn_constructor_kwargs={"num_perm": num_perm, "band_size": band_size, "n": n},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 4),
    )

    def bucket_pairs_part(df: pd.DataFrame) -> pd.DataFrame:
        """Candidate pairs of every LSH bucket in the partition: skew-guarded
        (buckets >64 docs dropped) self-merge, deduped within the partition."""
        if df.empty:
            return _empty_frame("doc_a", "doc_b")
        keys = ["band_id", "band_hash"]
        df = df.drop_duplicates(keys + ["doc_id"])
        sz = df.groupby(keys)["doc_id"].transform("size")
        df = df[(sz >= 2) & (sz <= 64)]
        if df.empty:
            return _empty_frame("doc_a", "doc_b")
        m = df.merge(df, on=keys, suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = m[["doc_id_a", "doc_id_b"]].drop_duplicates()
        return pd.DataFrame(
            {"doc_a": out["doc_id_a"].to_numpy("int64"), "doc_b": out["doc_id_b"].to_numpy("int64")}
        )

    # the candidate set is tiny relative to the corpus by LSH design, so the
    # ONE pipeline execution lands it on the driver for global dedup + the
    # pushdown read of just the candidate texts (broadcast via ray.put)
    cand_df = (
        hash_partition_apply(bands, ["band_id", "band_hash"], bucket_pairs_part, num_parts=32)
        .to_pandas()
        .drop_duplicates(["doc_a", "doc_b"])
    )
    if cand_df.empty:
        return pa.Table.from_pydict({"doc_a": pa.array([], "int64"), "doc_b": pa.array([], "int64")})
    candidates = rd.from_pandas(cand_df.reset_index(drop=True))

    # exact-Jaccard verify: broadcast the candidate texts once (ray.put),
    # verify inside map_batches
    import ray
    import pyarrow.dataset as pads

    need_ids = sorted(set(cand_df["doc_a"].tolist()) | set(cand_df["doc_b"].tolist()))
    tbl = pads.dataset(f"{sf_dir}/documents.parquet").to_table(
        columns=["doc_id", "text"], filter=pads.field("doc_id").isin(need_ids)
    )
    id2text_ref = ray.put(dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())))

    class VerifyPairs:
        def __init__(self, ref, n_gram: int, thr: float) -> None:
            self.id2text = ray.get(ref)
            self.n = n_gram
            self.thr = thr

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep_a, keep_b = [], []
            for a, b in zip(batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()):
                ha = shingle_hashes(self.id2text[a], self.n)
                hb = shingle_hashes(self.id2text[b], self.n)
                inter = len(np.intersect1d(ha, hb))
                union = len(ha) + len(hb) - inter
                if union > 0 and inter / union >= self.thr:
                    keep_a.append(a)
                    keep_b.append(b)
            return pa.Table.from_pydict({"doc_a": pa.array(keep_a, "int64"), "doc_b": pa.array(keep_b, "int64")})

    return candidates.map_batches(
        VerifyPairs, fn_constructor_kwargs={"ref": id2text_ref, "n_gram": n, "thr": threshold},
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 2),
    )


# ------------------------------------------------------------------ simhash


class SimHashKernel:
    """64-bit SimHash over token hashes + 4 x 16-bit band keys."""

    def __init__(self) -> None:
        self.token_re = TOKEN_RE

    def simhash(self, text: str) -> int:
        toks = self.token_re.findall(text.lower())
        if not toks:
            return 0
        hs = np.fromiter((_stable_hash64(t) for t in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        counts = bits.sum(axis=0)
        return int("".join("1" if c * 2 > len(toks) else "0" for c in counts[::-1]), 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = [self.simhash(t) for t in batch["text"].to_pylist()]
        out = {
            "doc_id": batch["doc_id"],
            "simhash": pa.array(sims, "uint64"),
        }
        for band in range(4):
            out[f"band{band}"] = pa.array([(s >> (16 * band)) & 0xFFFF for s in sims], "int32")
        return pa.Table.from_pydict(out)


def simhash_fingerprints(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(SimHashKernel, batch_format="pyarrow", batch_size=512, concurrency=(1, 4))
