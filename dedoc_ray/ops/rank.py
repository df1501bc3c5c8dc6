"""Exact global ranking + quantile bucketing without a global sort.

Curriculum schedules and length-balanced packing need every document's
exact global rank under some score (here: n_chars, with doc_id as the
deterministic tiebreak). The naive shape is ``ds.sort`` — an all-to-all
range shuffle that rewrites the whole corpus. This op exploits that the
SCORE DOMAIN is small even when the corpus is huge (document lengths
take at most ~millions of distinct values at any corpus size):

  1. per-batch combiner → (score, cnt) partials; ONE keyed shuffle sums
     them into the exact score histogram — O(distinct scores) rows;
  2. the histogram is collected (bounded by the score domain, not the
     corpus), prefix-summed on the driver, and broadcast;
  3. ONE keyed shuffle of (doc_id, score) by score: within a partition
     each score group sorts its doc_ids (vectorized lexsort) — global
     rank = broadcast offset[score] + local position. Buckets are
     floor(rank * q / N).

Total movement: two shuffles of integer pairs; the histogram is the only
driver-side object and its size is the score cardinality. If the score
were continuous (floats), step 1 would quantize first — documented
trade; for integer scores the result is exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

Q_DEFAULT = 10


def _partial_hist(batch: pa.Table) -> pa.Table:
    vals, cnts = np.unique(batch["n_chars"].to_numpy(zero_copy_only=False), return_counts=True)
    return pa.Table.from_pydict(
        {"score": pa.array(vals, "int64"), "cnt": pa.array(cnts.astype(np.int64))}
    )


def _sum_hist(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return pd.DataFrame(
            {"score": pd.Series([], dtype="int64"), "cnt": pd.Series([], dtype="int64")}
        )
    return df.groupby("score", as_index=False)["cnt"].sum()


def _rank_factory(offsets: dict, total: int, q: int):
    def rank(df: pd.DataFrame) -> pd.DataFrame:
        """Score-complete partition: per score group, doc_id order gives the
        local position; the broadcast prefix offset makes it global."""
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_chars": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["n_chars", "doc_id"], kind="stable").reset_index(drop=True)
        local = df.groupby("n_chars").cumcount().to_numpy()
        off = df["n_chars"].map(offsets).to_numpy()
        rk = (off + local).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_chars": df["n_chars"].astype("int64"),
                "rank": rk,
                "bucket": (rk * q // total).astype(np.int64),
            }
        )

    return rank


def length_quantiles(sf_dir: str, q: int = Q_DEFAULT, num_parts: int = 32):
    """(doc_id, n_chars, rank, bucket): exact 0-based global rank by
    (n_chars, doc_id) and q-quantile bucket, no global sort."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    partials = docs.map_batches(_partial_hist, batch_format="pyarrow", batch_size=4096)
    hist = (
        hash_partition_apply(partials, ["score"], _sum_hist, num_parts=8)
        .to_pandas()
        .sort_values("score")
    )
    total = int(hist["cnt"].sum())
    offsets = dict(
        zip(hist["score"], np.concatenate([[0], np.cumsum(hist["cnt"].to_numpy())[:-1]]))
    )
    return hash_partition_apply(
        docs, ["n_chars"], _rank_factory(offsets, total, q), num_parts=num_parts
    )


def length_quantiles_sql(q: int = Q_DEFAULT) -> str:
    return f"""
WITH r AS (
  SELECT doc_id, n_chars,
         CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT) AS rank
  FROM documents
)
SELECT doc_id, n_chars, rank,
       CAST((rank * {q}) // (SELECT count(*) FROM documents) AS BIGINT) AS bucket
FROM r
"""


# --------------------------------------------- grouped exact median


def group_median(sf_dir: str, num_parts: int = 8):
    """(lang, median_n_chars): the exact low median per group WITHOUT a
    per-group sort of rows.

    Same histogram trick as length_quantiles, grouped: per-batch
    (lang, n_chars) count combiners bound the shuffle payload by the
    VALUE cardinality (distinct doc lengths), not the row count — a
    billion-row language costs the same shuffle bytes as a small one, so
    group skew (one language owning half a crawl) cannot hurt. Inside
    the lang-complete partition the median falls out of a prefix sum.
    Low median = smallest v with |rows <= v| >= (n + 1) // 2, kept
    integer-exact on both sides of the oracle."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby(["lang", "n_chars"], as_index=False).size()
        return pa.Table.from_pydict(
            {
                "lang": pa.array(df["lang"], "string"),
                "n_chars": pa.array(df["n_chars"].astype("int64"), "int64"),
                "cnt": pa.array(df["size"].astype("int64"), "int64"),
            }
        )

    partials = docs.map_batches(partial, batch_format="pyarrow", batch_size=4096)

    def median_of(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype="object"),
                    "median_n_chars": pd.Series([], dtype="int64"),
                }
            )
        agg = df.groupby(["lang", "n_chars"], as_index=False)["cnt"].sum()
        out_lang, out_med = [], []
        for lang, grp in agg.groupby("lang"):
            grp = grp.sort_values("n_chars")
            cum = grp["cnt"].cumsum()
            need = (int(grp["cnt"].sum()) + 1) // 2
            out_lang.append(lang)
            out_med.append(int(grp["n_chars"].to_numpy()[np.argmax(cum.to_numpy() >= need)]))
        return pd.DataFrame({"lang": out_lang, "median_n_chars": pd.array(out_med, "int64")})

    return hash_partition_apply(partials, ["lang"], median_of, num_parts=num_parts)


GROUP_MEDIAN_SQL = """
WITH c AS (
  SELECT lang, n_chars, count(*) AS cnt FROM documents GROUP BY 1, 2
), t AS (
  SELECT lang, sum(cnt) AS n FROM c GROUP BY 1
), cum AS (
  SELECT lang, n_chars, sum(cnt) OVER (PARTITION BY lang ORDER BY n_chars) AS cum FROM c
)
SELECT cum.lang, CAST(min(cum.n_chars) AS BIGINT) AS median_n_chars
FROM cum JOIN t ON cum.lang = t.lang
WHERE cum.cum >= (t.n + 1) // 2
GROUP BY cum.lang
"""
