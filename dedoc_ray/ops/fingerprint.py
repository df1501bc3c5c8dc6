"""Document fingerprinting — Rabin-Karp rolling hash + winnowing.

Winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — public algorithm):
k-gram rolling hashes over the normalized text, then the minimum hash of
each sliding window of ``w`` consecutive k-grams is selected (rightmost
minimum on ties). Guarantee: any substring match of length >= w + k - 1
between two documents shares at least one selected fingerprint — the
basis for plagiarism/near-copy detection at corpus scale.

Vectorized per batch (numpy rolling hash, sliding_window_view minima);
fingerprints are 8-byte ints, so the exploded (fingerprint, doc_id) table
shuffles cheaply — same inverted-index shape as ops/dedup.jaccard_pairs.
"""

from __future__ import annotations

import re
from typing import List

import numpy as np
import pyarrow as pa

_WS_RE = re.compile(r"\s+")

_BASE = np.uint64(1_000_003)
_K_DEFAULT = 16
_W_DEFAULT = 8


def _normalize(text: str) -> bytes:
    return _WS_RE.sub(" ", text.lower()).strip().encode("utf-8")


def rolling_hashes(data: bytes, k: int = _K_DEFAULT) -> np.ndarray:
    """Rabin-Karp hashes of every k-byte gram (mod 2^64), vectorized."""
    buf = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(buf) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.uint64)
    powers = _BASE ** np.arange(k, dtype=np.uint64)  # wraps mod 2^64
    # h[i] = sum_{j<k} buf[i+j] * base^(k-1-j): compute via correlation
    from numpy.lib.stride_tricks import sliding_window_view

    grams = sliding_window_view(buf, k)  # (n, k)
    return (grams * powers[::-1]).sum(axis=1, dtype=np.uint64)


def winnow(hashes: np.ndarray, w: int = _W_DEFAULT) -> np.ndarray:
    """Distinct selected fingerprints: rightmost minimum per w-window."""
    if len(hashes) == 0:
        return hashes
    if len(hashes) <= w:
        return np.unique(hashes.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(hashes, w)  # (n-w+1, w)
    # rightmost minimum: argmin on the reversed window
    idx = w - 1 - np.argmin(wins[:, ::-1], axis=1) + np.arange(len(wins))
    return np.unique(hashes[np.unique(idx)])


class WinnowKernel:
    """doc → exploded (doc_id, fingerprint) rows."""

    def __init__(self, k: int = _K_DEFAULT, w: int = _W_DEFAULT) -> None:
        self.k = k
        self.w = w

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids: List[int] = []
        fps: List[int] = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sel = winnow(rolling_hashes(_normalize(text), self.k), self.w)
            doc_ids.extend([doc_id] * len(sel))
            fps.extend(sel.tolist())
        return pa.Table.from_pydict(
            {"doc_id": pa.array(doc_ids, "int64"), "fingerprint": pa.array(fps, "uint64")}
        )


def winnow_stats_sql(k: int = _K_DEFAULT, w: int = _W_DEFAULT) -> str:
    """DuckDB replay of the FULL winnowing selection: the Rabin-Karp fold
    (acc*base + byte mod 2^64, HUGEINT intermediate) per k-gram via nested
    list lambdas, then the rightmost-minimum index per w-window, distinct.
    ASCII whitespace class is pinned like textstats (corpus is ASCII).
    Docs whose normalized text is shorter than k contribute no rows (the
    Python side emits zero exploded fingerprints for them)."""
    return f"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '[ \\t\\n\\f\\r]+', ' ', 'g')) AS t
  FROM documents
), grams AS (
  SELECT doc_id,
    list_transform(range(1, greatest(length(t) - {k} + 2, 1)),
      i -> list_reduce(
             list_transform(range(i, i + {k}), j -> CAST(ascii(substr(t, CAST(j AS INTEGER), 1)) AS UBIGINT)),
             (acc, c) -> CAST((CAST(acc AS HUGEINT) * {int(_BASE)} + c) % 18446744073709551616 AS UBIGINT)
           )) AS h
  FROM norm
), sel AS (
  SELECT doc_id,
    CASE WHEN len(h) <= {w} THEN [list_min(h)]
    ELSE list_distinct(
      list_transform(
        list_distinct(
          list_transform(range(0, len(h) - {w} + 1),
            i -> list_reduce(range(CAST(i + 1 AS INTEGER), CAST(i + {w} + 1 AS INTEGER)),
                   (a, b) -> CASE WHEN h[CAST(b AS INTEGER)] <= h[CAST(a AS INTEGER)] THEN b ELSE a END))),
        ix -> h[CAST(ix AS INTEGER)]))
    END AS fps
  FROM grams
  WHERE len(h) > 0
)
SELECT doc_id, CAST(len(fps) AS BIGINT) AS n_fps FROM sel
"""


def winnow_fingerprints(sf_dir: str, k: int = _K_DEFAULT, w: int = _W_DEFAULT):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        WinnowKernel, fn_constructor_kwargs={"k": k, "w": w},
        batch_format="pyarrow", batch_size=512, concurrency=(1, 4),
    )
