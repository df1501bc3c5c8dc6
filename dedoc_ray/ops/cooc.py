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
             k: int = TOPK) -> pa.Table:
    """Top-k within-window pairs by integer PMI score →
    (a, b, n_pair, score) pyarrow table."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    def fold(batch: pa.Table) -> pa.Table:
        # task-based: state is one compiled regex; actor-pool spinup would
        # dominate the fold at bench scale
        return _CoocPartialKernel(window)(batch)

    partials = docs.map_batches(fold, batch_format="pyarrow", batch_size=512)
    merged = partials.groupby(["a", "b"]).sum("cnt").rename_columns(["a", "b", "cnt"])

    # split the one merged stream driver-side ONLY for the bounded parts:
    # unigrams (vocab-sized) and ≥min_count pairs (thresholded)
    uni: dict = {}
    surviving: List[tuple] = []
    total = 0
    for row in merged.iter_rows():
        if row["b"] == "":
            uni[row["a"]] = row["cnt"]
            total += row["cnt"]
        elif row["cnt"] >= min_count:
            surviving.append((row["a"], row["b"], row["cnt"]))

    scored = []
    for a, b, c in surviving:
        score = (c * total * _SCALE) // (uni[a] * uni[b])
        scored.append((a, b, c, score))
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    top = scored[:k]
    return pa.Table.from_pydict({
        "a": pa.array([t[0] for t in top], "string"),
        "b": pa.array([t[1] for t in top], "string"),
        "n_pair": pa.array([t[2] for t in top], "int64"),
        "score": pa.array([t[3] for t in top], "int64"),
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
