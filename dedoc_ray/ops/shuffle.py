"""Coarse hash-partitioned group-apply — the workhorse shuffle pattern.

``ds.groupby(key).map_groups(fn)`` calls ``fn`` once per DISTINCT key; with
millions of keys (shingles, LSH buckets, fingerprints) that is millions of
Python calls and dominates wall-time. The scalable shape is the Spark
``repartition(key) + mapPartitions`` pattern: shuffle ONCE on
``hash(key) % num_parts`` and run ONE vectorized pandas function per
partition, which does its own intra-partition ``df.groupby`` with C-speed
kernels. Same bytes move; per-group Python overhead drops by orders of
magnitude. All co-occurrence semantics are preserved because every row of a
given key lands in the same partition.

``num_parts`` sizes the shuffle fan-in: at 100 TB pick ~#cores × 4 so each
partition fits a worker heap; at test scale a few dozen suffice.
"""

from __future__ import annotations

from typing import Callable, List

import numpy as np
import pandas as pd
import pyarrow as pa


def _part_ids(batch: pa.Table, keys: List[str], num_parts: int) -> np.ndarray:
    """Stable partition id per row from the key columns (int or string)."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        col = batch[k]
        if pa.types.is_integer(col.type):
            arr = col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        else:
            # deterministic 64-bit hash for strings/binary (fixed-key siphash)
            arr = pd.util.hash_array(np.asarray(col.to_pylist(), dtype=object))
        h = h * np.uint64(1000003) + arr
    return ((h * np.uint64(2654435761)) % np.uint64(num_parts)).astype(np.int32)


def hash_partition_apply(
    ds,
    keys: List[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_parts: int = 32,
):
    """Shuffle ``ds`` once on ``hash(keys) % num_parts``; apply ``fn`` to each
    whole partition as a pandas DataFrame (without the helper column).

    ``fn`` MUST be vectorized and group internally (e.g.
    ``df.groupby(keys)...``) — it sees every row of every key assigned to its
    partition, and nothing else.
    """

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column("_part", pa.array(_part_ids(batch, keys, num_parts)))

    def apply_part(df: pd.DataFrame) -> pd.DataFrame:
        return fn(df.drop(columns=["_part"]))

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(apply_part, batch_format="pandas")
    )


def salted_group_sum(
    ds,
    keys: List[str],
    value_col: str,
    num_salts: int = 16,
    num_parts: int = 32,
):
    """Sum ``value_col`` per ``keys`` with HOT-KEY SALTING: a two-level
    aggregation for skewed keys (one key holding a large fraction of all
    rows would otherwise send that fraction to a single partition).

    Level 1 shuffles on (keys, salt) — a hot key's rows spread over
    ``num_salts`` partitions, each emitting one partial row per key.
    Level 2 shuffles only those tiny partials on (keys) for the final sum.
    """
    import pyarrow.compute as pc  # noqa: F401  (kept local for worker import)

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = (np.arange(batch.num_rows, dtype=np.int64) % num_salts).astype(np.int64)
        return batch.append_column("_salt", pa.array(salt))

    def partial_sum(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({**{k: pd.Series([], dtype="object") for k in keys},
                                 value_col: pd.Series([], dtype="int64")})
        return df.drop(columns=["_salt"]).groupby(keys, as_index=False)[value_col].sum()

    def final_sum(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return df.groupby(keys, as_index=False)[value_col].sum()

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partials = hash_partition_apply(salted, keys + ["_salt"], partial_sum, num_parts=num_parts)
    return hash_partition_apply(partials, keys, final_sum, num_parts=max(4, num_parts // 4))
