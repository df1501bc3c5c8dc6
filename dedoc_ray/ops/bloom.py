"""Bloom-filter cross-crawl membership — bounded-state delta dedup.

``ops/dedup.py::delta_dedup`` answers "which new docs does the corpus
admit?" with one fingerprint shuffle — exact, but every base-corpus
fingerprint still travels once per crawl. The Bloom path trades a
tunable false-positive rate for a **fixed-size** summary of the base
corpus: a bit array built once (CCNet keeps exactly such a filter per
crawl), shipped to every worker via ``ray.put``, then each new crawl is
a pure map-only probe — zero shuffle, zero base-corpus re-scan.

State bound: the filter is ``M_BITS`` bits regardless of corpus size
(the per-batch partials emit DISTINCT bit positions, ≤ M_BITS rows
total, so the driver reduction is bounded by filter geometry, never by
row count). False positives only ever DROP a duplicate-looking new doc
— they never admit a duplicate — which is the safe direction for dedup.

Determinism contract (oracle-replayable end to end):
- doc fingerprint = the DocStatsKernel md5 (same as exact/delta dedup);
- h64 = big-endian first 16 hex chars of the fingerprint;
- Kirsch-Mitzenmacher double hashing: h1 = h64 low 32, h2 = h64 high
  32, position_j = (h1 + j·h2) mod M_BITS for j in 0..N_HASHES-1.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa

M_BITS = 1 << 18
N_HASHES = 4


def positions_of(fps: List[str]) -> np.ndarray:
    """(n, N_HASHES) int64 bit positions per fingerprint."""
    if not fps:
        return np.zeros((0, N_HASHES), np.int64)
    h64 = np.array([int(f[:16], 16) for f in fps], dtype=np.uint64)
    h1 = (h64 & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    h2 = (h64 >> np.uint64(32)).astype(np.uint64)
    j = np.arange(N_HASHES, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(M_BITS)).astype(np.int64)


class _BasePositionsKernel:
    """Base-side batch → DISTINCT bit-position rows (≤ M_BITS ever)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedoc_ray.ops.textstats import DocStatsKernel

        stats = DocStatsKernel()(batch)
        fps = stats["fingerprint"].to_pylist()
        pos = np.unique(positions_of(fps))
        return pa.Table.from_pydict({"pos": pa.array(pos, "int64")})


def bloom_build(base_ds) -> np.ndarray:
    """Base docs Dataset (doc_id, text) → packed bool filter (M_BITS,).

    The distinct-position groupby is bounded by filter geometry: at most
    M_BITS rows reach the driver however large the base corpus is."""
    def fold(batch: pa.Table) -> pa.Table:
        return _BasePositionsKernel()(batch)  # task-based: stateless

    parts = base_ds.map_batches(fold, batch_format="pyarrow", batch_size=1024)
    uniq = parts.groupby("pos").count()
    filt = np.zeros(M_BITS, dtype=bool)
    for row in uniq.iter_rows():
        filt[row["pos"]] = True
    return filt


class _ProbeKernel:
    """New-crawl batch → (doc_id, seen_maybe) under a broadcast filter."""

    def __init__(self, filt_ref) -> None:
        import ray

        self.filt = ray.get(filt_ref) if not isinstance(filt_ref, np.ndarray) else filt_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dedoc_ray.ops.textstats import DocStatsKernel

        stats = DocStatsKernel()(batch)
        fps = stats["fingerprint"].to_pylist()
        ids = stats["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = positions_of(fps)
        seen = self.filt[pos].all(axis=1) if len(fps) else np.zeros(0, bool)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, "int64"),
            "seen_maybe": pa.array(seen.astype(np.int64), "int64"),
        })


def bloom_delta(sf_dir: str):
    """delta_dedup's scenario (even doc_ids = base crawl, odd = new) with
    Bloom semantics: build the base filter once, probe the new crawl
    map-only. Output (doc_id, seen_maybe) per NEW doc."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    def _parity(keep_odd: bool):
        def f(batch: pa.Table) -> pa.Table:
            odd = pc.equal(pc.bit_wise_and(batch["doc_id"], 1), 1)
            return batch.filter(odd if keep_odd else pc.invert(odd))

        return f

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    base = docs.map_batches(_parity(False), batch_format="pyarrow")
    new = docs.map_batches(_parity(True), batch_format="pyarrow")
    filt_ref = ray.put(bloom_build(base))

    def probe(batch: pa.Table) -> pa.Table:
        # task-based: the broadcast filter is a 256 KiB zero-copy get
        return _ProbeKernel(filt_ref)(batch)

    return new.map_batches(probe, batch_format="pyarrow", batch_size=1024)


BLOOM_DELTA_SQL = f"""
WITH f AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
         doc_id % 2 AS is_new
  FROM documents
),
h AS (
  SELECT doc_id, is_new,
         CAST(CAST(('0x' || substr(fp, 1, 16)) AS UBIGINT) % 4294967296 AS HUGEINT) AS h1,
         CAST(CAST(('0x' || substr(fp, 1, 16)) AS UBIGINT) // 4294967296 AS HUGEINT) AS h2
  FROM f
),
pos AS (
  SELECT doc_id, is_new, CAST((h1 + j * h2) % {M_BITS} AS BIGINT) AS p
  FROM h CROSS JOIN (SELECT unnest(range({N_HASHES})) AS j)
),
base AS (SELECT DISTINCT p FROM pos WHERE is_new = 0),
probe AS (
  SELECT pos.doc_id, count(base.p) AS hits
  FROM pos LEFT JOIN base ON pos.p = base.p
  WHERE pos.is_new = 1
  GROUP BY pos.doc_id
)
SELECT doc_id, CAST(hits = {N_HASHES} AS BIGINT) AS seen_maybe FROM probe
"""
