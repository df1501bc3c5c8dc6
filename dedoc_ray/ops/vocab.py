"""Corpus-wide vocabulary statistics — the tokenizer-training precursor.

Every BPE/unigram tokenizer build starts from a corpus token-frequency
table (term frequency + document frequency). The scalable shape:

  1. per-batch COMBINER inside ``map_batches`` — each batch collapses to
     its distinct tokens with partial (tf, df) counts, so the shuffle
     moves O(distinct tokens per batch), not O(corpus tokens);
  2. ONE keyed shuffle on token sums the partials;
  3. per-partition top-K pre-truncation (a token's global counts live in
     exactly one partition, so the global top-K is a subset of the union
     of per-partition top-Ks) — the final merge sees <= K x num_parts
     rows, never the vocabulary.

Token definition matches ``ops/textstats.py`` (``[a-z0-9]+`` over the
lowercased text), so DuckDB's RE2 ``regexp_extract_all`` replays it
exactly.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa

from dedoc_ray.ops.textstats import TOKEN_RE

K_DEFAULT = 50


class TokenPartialKernel:
    """batch of docs -> partial (token, tf, df) rows."""

    def __init__(self) -> None:
        self.token_re = TOKEN_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        tf: Counter = Counter()
        df: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = self.token_re.findall(text.lower())
            tf.update(toks)
            df.update(set(toks))
        tokens = list(tf)
        return pa.Table.from_pydict(
            {
                "token": pa.array(tokens, "string"),
                "tf": pa.array([tf[t] for t in tokens], "int64"),
                "df": pa.array([df[t] for t in tokens], "int64"),
            }
        )


def _topk_factory(k: int):
    def topk(part: pd.DataFrame) -> pd.DataFrame:
        """Token-complete partition: sum partials, keep the partition's
        top-k by (tf desc, token asc)."""
        if part.empty:
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype="string"),
                    "tf": pd.Series([], dtype="int64"),
                    "df": pd.Series([], dtype="int64"),
                }
            )
        agg = part.groupby("token", as_index=False)[["tf", "df"]].sum()
        agg = agg.sort_values(["tf", "token"], ascending=[False, True], kind="stable")
        return agg.head(k).astype({"tf": "int64", "df": "int64"})

    return topk


def vocab_topk(sf_dir: str, k: int = K_DEFAULT, num_parts: int = 32):
    """Top-k corpus tokens by term frequency: (token, tf, df), tf-desc,
    token-asc deterministic tiebreak."""
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    partials = docs.map_batches(
        TokenPartialKernel, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )
    per_part = hash_partition_apply(partials, ["token"], _topk_factory(k), num_parts=num_parts)
    # final merge over <= k x num_parts rows — counts are already global
    final = per_part.repartition(1).map_batches(
        lambda df: df.sort_values(["tf", "token"], ascending=[False, True], kind="stable").head(k),
        batch_format="pandas", batch_size=None,
    )
    return final


def vocab_topk_sql(k: int = K_DEFAULT) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
), a AS (
  SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM t GROUP BY token
)
SELECT token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM a ORDER BY tf DESC, token ASC LIMIT {k}
"""
