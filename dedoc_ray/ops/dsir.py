"""DSIR-shaped data selection: hashed-bigram importance weights.

"Data Selection for Language Models via Importance Resampling" (Xie et
al., NeurIPS 2023 — public paper) scores raw web documents by the ratio
of hashed-n-gram feature likelihoods under a TARGET distribution (the
high-quality corpus you want more of) vs the RAW distribution, then
resamples by that weight. The architectural trick that makes it work at
scale is the HASHED feature space: both models are fixed-size count
arrays of B buckets no matter how large the corpus vocabulary is.

Shape here (floats would defeat exact verification, so the output is the
integer core — the two hit-mass sums whose ratio is the importance
weight):

  1. TRAIN — map_batches emits per-batch partial (bucket, ct, cr)
     counts (ct over the deterministic target split doc_id%10==0, cr
     over all docs); ONE keyed shuffle sums them; the reduced table is
     <= B rows regardless of corpus size, collected once and ``ray.put``
     broadcast as two numpy arrays.
  2. SCORE — map_batches over all docs: token-hash with an LRU cache
     (Zipf makes the cache hit rate ~1), vectorized bigram-bucket
     combine, two ``arr[buckets].sum()`` lookups. No shuffle.

Bucketing is md5-32-prefix per token combined with the Rabin-Karp base,
so DuckDB replays it exactly (same recipe as ops/dedup.simhash)."""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa

from dedoc_ray.ops.textstats import TOKEN_RE

N_BUCKETS = 4096
TARGET_MOD = 10  # doc_id % TARGET_MOD == 0 → target (high-quality) split
_COMBINE = 1000003  # matches ops/fingerprint._BASE


@lru_cache(maxsize=1 << 20)
def _token_hash(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


def _bigram_buckets(text: str, n_buckets: int = N_BUCKETS) -> np.ndarray:
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < 2:
        return np.zeros(0, dtype=np.int64)
    hs = np.fromiter((_token_hash(t) for t in toks), dtype=np.int64, count=len(toks))
    return (hs[:-1] * _COMBINE + hs[1:]) % n_buckets


def _partial_counts(batch: pa.Table) -> pa.Table:
    """batch → (bucket, ct, cr) partials — the pre-shuffle combiner."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    ct = np.zeros(N_BUCKETS, dtype=np.int64)
    cr = np.zeros(N_BUCKETS, dtype=np.int64)
    for doc_id, text in zip(ids, batch["text"].to_pylist()):
        bks = _bigram_buckets(text)
        np.add.at(cr, bks, 1)
        if doc_id % TARGET_MOD == 0:
            np.add.at(ct, bks, 1)
    nz = np.nonzero(cr)[0]
    return pa.Table.from_pydict(
        {
            "bucket": pa.array(nz, "int64"),
            "ct": pa.array(ct[nz], "int64"),
            "cr": pa.array(cr[nz], "int64"),
        }
    )


def train_dsir_model(sf_dir: str):
    """Distributed bucket counts → two length-B numpy arrays."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    partials = docs.map_batches(_partial_counts, batch_format="pyarrow", batch_size=1024)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int64"),
                 "ct": pd.Series([], dtype="int64"),
                 "cr": pd.Series([], dtype="int64")}
            )
        return df.groupby("bucket", as_index=False)[["ct", "cr"]].sum()

    reduced = hash_partition_apply(partials, ["bucket"], combine, num_parts=8).to_pandas()
    ct = np.zeros(N_BUCKETS, dtype=np.int64)
    cr = np.zeros(N_BUCKETS, dtype=np.int64)
    ct[reduced["bucket"].to_numpy()] = reduced["ct"].to_numpy()
    cr[reduced["bucket"].to_numpy()] = reduced["cr"].to_numpy()
    return ct, cr


class DsirScoreKernel:
    """Broadcast-model scorer; the object-store ref resolves once per actor."""

    def __init__(self, model_ref) -> None:
        import ray

        self.ct, self.cr = (
            ray.get(model_ref) if not isinstance(model_ref, tuple) else model_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_bg, th, rh = [], [], []
        for text in batch["text"].to_pylist():
            bks = _bigram_buckets(text)
            n_bg.append(len(bks))
            th.append(int(self.ct[bks].sum()))
            rh.append(int(self.cr[bks].sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pa.array(n_bg, "int64"),
                "target_hits": pa.array(th, "int64"),
                "raw_hits": pa.array(rh, "int64"),
            }
        )


def dsir_scores(sf_dir: str):
    """Per-doc DSIR hit masses: importance weight ~ target_hits/raw_hits."""
    import ray
    import ray.data as rd

    model_ref = ray.put(train_dsir_model(sf_dir))
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        DsirScoreKernel,
        fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, 4),
    )


DSIR_SCORES_SQL = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts FROM documents
), big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(ts), 1)),
                i -> ts[CAST(i AS INTEGER)] || ' ' || ts[CAST(i + 1 AS INTEGER)])) AS bg
  FROM tok
), bk AS (
  SELECT doc_id,
         (CAST('0x' || substr(md5(split_part(bg, ' ', 1)), 1, 8) AS BIGINT) * {_COMBINE}
          + CAST('0x' || substr(md5(split_part(bg, ' ', 2)), 1, 8) AS BIGINT)) % {N_BUCKETS} AS b
  FROM big
), cnts AS (
  SELECT b,
         sum(CASE WHEN doc_id % {TARGET_MOD} = 0 THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM bk GROUP BY b
), score AS (
  SELECT bk.doc_id, count(*) AS n_bigrams,
         sum(c.ct) AS target_hits, sum(c.cr) AS raw_hits
  FROM bk JOIN cnts c USING (b) GROUP BY bk.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.target_hits, 0) AS BIGINT) AS target_hits,
       CAST(coalesce(s.raw_hits, 0) AS BIGINT) AS raw_hits
FROM documents d LEFT JOIN score s USING (doc_id)
"""
