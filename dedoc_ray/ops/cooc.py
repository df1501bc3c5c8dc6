"""Windowed co-occurrence counts + PMI ranking — the word-embedding
training precursor (word2vec/GloVe both start from exactly this table).

Shape (the same discipline as ops/vocab.py):
- per-batch COMBINER partials: a Counter over unordered within-window
  token pairs and one over unigrams — only (pair, count) / (token,
  count) rows ever shuffle, never positions;
- one groupby-sum per table; the pair table is then thresholded
  (min_count) BEFORE anything is ranked, so the tail of hapax pairs
  never reaches the driver;
- unigram counts for surviving pairs ride a broadcast dict (bounded by
  the ≥min_count vocabulary — the standard trade; at larger scale swap
  for two keyed joins on a and b, same outputs);
- PMI is ranked by an INTEGER score, score = n_pair·N·10^6 //
  (n_a·n_b) — order-equivalent to PMI for fixed N (log is monotone),
  exactly replayable in DuckDB HUGEINT arithmetic, no floats anywhere.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

WINDOW = 2
MIN_COUNT = 5
TOPK = 50
_SCALE = 10 ** 6
_TOK_RE = re.compile(r"[a-z0-9]+")


class _CoocPartialKernel:
    """text batch → pair-count partial rows (a, b, cnt) plus unigram
    partial rows tagged b='' — one output stream, one shuffle."""

    def __init__(self, window: int = WINDOW) -> None:
        self.window = window
        self.tok = _TOK_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        pairs: Counter = Counter()
        unis: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = self.tok.findall((text or "").lower())
            unis.update(toks)
            for d in range(1, self.window + 1):
                for a, b in zip(toks, toks[d:]):
                    if a != b:
                        pairs[(a, b) if a < b else (b, a)] += 1
        a_col: List[str] = []
        b_col: List[str] = []
        c_col: List[int] = []
        for (a, b), c in pairs.items():
            a_col.append(a)
            b_col.append(b)
            c_col.append(c)
        for t, c in unis.items():
            a_col.append(t)
            b_col.append("")  # unigram marker
            c_col.append(c)
        return pa.Table.from_pydict({
            "a": pa.array(a_col, "string"),
            "b": pa.array(b_col, "string"),
            "cnt": pa.array(c_col, "int64"),
        })


def pmi_topk(sf_dir: str, window: int = WINDOW, min_count: int = MIN_COUNT,
             k: int = TOPK, num_parts: int = 32) -> pa.Table:
    """Top-k within-window pairs by integer PMI score →
    (a, b, n_pair, score) pyarrow table.

    Two passes over the corpus, GloVe-style (vocab pass, then co-occurrence
    pass), and the driver never touches an unbounded table:

    1. unigram pass: per-batch Counter partials → ONE keyed shuffle →
       per-partition sums. Only tokens with cnt ≥ ceil(min_count/(2·window))
       reach the driver (a pair with n_pair ≥ min_count forces both unigram
       counts above that bound, since one token occurrence joins at most
       2·window pairs) plus one total-row per partition → broadcast via
       ray.put;
    2. pair pass: per-batch pair partials → ONE keyed shuffle on (a, b) →
       per-partition sum, min_count filter, integer-PMI scoring against the
       broadcast unigram dict, LOCAL top-k truncation. The driver folds
       ≤ k·num_parts pre-truncated rows.
    """
    import math

    import ray
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    # -- pass 1: unigram counts (vocab-bounded driver fold + broadcast)
    def uni_fold(batch: pa.Table) -> pa.Table:
        unis: Counter = Counter()
        tok = _TOK_RE
        for text in batch["text"].to_pylist():
            unis.update(tok.findall((text or "").lower()))
        return pa.Table.from_pydict({
            "a": pa.array(list(unis.keys()), "string"),
            "cnt": pa.array(list(unis.values()), "int64"),
        })

    uni_keep = max(1, math.ceil(min_count / (2 * window)))

    def uni_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            return pd.DataFrame({"a": pd.Series([], dtype="string"),
                                 "cnt": pd.Series([], dtype="int64")})
        agg = part.groupby("a", as_index=False)["cnt"].sum()
        total = int(agg["cnt"].sum())
        kept = agg[agg["cnt"] >= uni_keep]
        # one ''-keyed total row per partition carries the full token mass
        # (the pruned tail still counts toward N)
        return pd.concat(
            [kept, pd.DataFrame({"a": [""], "cnt": [total]})], ignore_index=True
        ).astype({"cnt": "int64"})

    uni_partials = docs.map_batches(uni_fold, batch_format="pyarrow", batch_size=512)
    uni_rows = hash_partition_apply(uni_partials, ["a"], uni_part, num_parts=num_parts)
    uni: dict = {}
    total = 0
    for row in uni_rows.iter_rows():  # bounded: vocab(≥uni_keep) + num_parts
        if row["a"] == "":
            total += row["cnt"]
        else:
            uni[row["a"]] = row["cnt"]
    uni_ref = ray.put(uni)
    total_n = total

    # -- pass 2: pair counts → score → local top-k → bounded driver merge
    def pair_fold(batch: pa.Table) -> pa.Table:
        pairs: Counter = Counter()
        tok = _TOK_RE
        for text in batch["text"].to_pylist():
            toks = tok.findall((text or "").lower())
            for d in range(1, window + 1):
                for a, b in zip(toks, toks[d:]):
                    if a != b:
                        pairs[(a, b) if a < b else (b, a)] += 1
        keys = list(pairs.keys())
        return pa.Table.from_pydict({
            "a": pa.array([p[0] for p in keys], "string"),
            "b": pa.array([p[1] for p in keys], "string"),
            "cnt": pa.array([pairs[p] for p in keys], "int64"),
        })

    def pair_part(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "a": pd.Series([], dtype="string"), "b": pd.Series([], dtype="string"),
            "n_pair": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="int64"),
        })
        if part.empty:
            return empty
        agg = part.groupby(["a", "b"], as_index=False)["cnt"].sum()
        agg = agg[agg["cnt"] >= min_count]
        if agg.empty:
            return empty
        udict = ray.get(uni_ref)  # zero-copy local fetch, once per partition
        # python-int arithmetic: cnt·N·SCALE overflows int64 at corpus scale
        scores = [
            (int(c) * total_n * _SCALE) // (udict[a] * udict[b])
            for a, b, c in zip(agg["a"], agg["b"], agg["cnt"])
        ]
        out = pd.DataFrame({
            "a": agg["a"].to_numpy(), "b": agg["b"].to_numpy(),
            "n_pair": agg["cnt"].to_numpy(), "score": scores,
        })
        out = out.sort_values(["score", "a", "b"], ascending=[False, True, True], kind="stable")
        return out.head(k).astype({"n_pair": "int64", "score": "int64"})

    pair_partials = docs.map_batches(pair_fold, batch_format="pyarrow", batch_size=512)
    per_part = hash_partition_apply(pair_partials, ["a", "b"], pair_part, num_parts=num_parts)

    merged = per_part.to_pandas()  # ≤ k·num_parts pre-truncated rows
    merged = merged.sort_values(["score", "a", "b"], ascending=[False, True, True], kind="stable").head(k)
    return pa.Table.from_pydict({
        "a": pa.array(merged["a"].tolist(), "string"),
        "b": pa.array(merged["b"].tolist(), "string"),
        "n_pair": pa.array([int(v) for v in merged["n_pair"]], "int64"),
        "score": pa.array([int(v) for v in merged["score"]], "int64"),
    })


def pmi_topk_sql(window: int = WINDOW, min_count: int = MIN_COUNT,
                 k: int = TOPK) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
pos AS (
  SELECT doc_id, unnest(t) AS tok,
         unnest(range(1, len(t) + 1)) AS i
  FROM toks
),
uni AS (SELECT tok, count(*) AS n FROM pos GROUP BY tok),
total AS (SELECT sum(n) AS n FROM uni),
pairs AS (
  SELECT least(p1.tok, p2.tok) AS a, greatest(p1.tok, p2.tok) AS b,
         count(*) AS n_pair
  FROM pos p1 JOIN pos p2
    ON p1.doc_id = p2.doc_id AND p2.i > p1.i AND p2.i <= p1.i + {window}
   AND p1.tok <> p2.tok
  GROUP BY 1, 2
  HAVING count(*) >= {min_count}
)
SELECT a, b, n_pair,
       CAST(CAST(n_pair AS HUGEINT) * (SELECT n FROM total) * {_SCALE}
            // (CAST(ua.n AS HUGEINT) * ub.n) AS BIGINT) AS score
FROM pairs
JOIN uni ua ON pairs.a = ua.tok
JOIN uni ub ON pairs.b = ub.tok
ORDER BY score DESC, a, b
LIMIT {k}
"""
