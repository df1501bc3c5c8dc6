"""Coarse hash-partitioned group-apply — the workhorse shuffle pattern.

``ds.groupby(key).map_groups(fn)`` calls ``fn`` once per DISTINCT key; with
millions of keys (shingles, LSH buckets, fingerprints) that is millions of
Python calls and dominates wall-time. The scalable shape is the Spark
``repartition(key) + mapPartitions`` pattern: shuffle ONCE on hash(key) into
``num_parts`` partitions and run ONE vectorized pandas function per
partition, which does its own intra-partition ``df.groupby`` with C-speed
kernels. Same bytes move; per-group Python overhead drops by orders of
magnitude. All co-occurrence semantics are preserved because every row of a
given key lands in the same partition.

Implementation: Ray Data's native hash-shuffle repartition
(``Dataset.repartition(num_parts, keys=...)`` under
``ShuffleStrategy.HASH_SHUFFLE``) followed by ``map_batches(fn,
batch_size=None)`` so each call sees one whole key-complete partition.
This replaced a hand-rolled ``groupby("_part").map_groups`` in round 1 —
the native path skips the sort-based shuffle machinery entirely (the
asof join went 18.2s → see BENCH_r02) and streams partition blocks with
backpressure instead of materializing sort boundaries.

``num_parts`` sizes the shuffle fan-in: at 100 TB pick ~#cores × 4 so each
partition fits a worker heap; at test scale a few dozen suffice.
"""

from __future__ import annotations

import os
from typing import Callable, List

import numpy as np
import pandas as pd
import pyarrow as pa

# aggregator-actor cap for hash shuffles (see enable_hash_shuffle); a
# multi-node deployment raises it to ~#nodes via the environment
MAX_AGGREGATORS = int(os.environ.get("DEDOC_RAY_MAX_AGGREGATORS", "8"))


def enable_hash_shuffle() -> None:
    """Switch the current DataContext to hash-shuffle repartitioning.

    Idempotent and safe for every op in this repo (sort / groupby /
    aggregate all keep working under HASH_SHUFFLE; verified in tests).
    """
    import ray.data as rd
    from ray.data.context import ShuffleStrategy

    ctx = rd.DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Ray's default gives each shuffle's aggregator pool up to 50% of the
    # cluster's CPUs; a DAG with several concurrent shuffles (e.g. the
    # minhash verify: 4 shuffle stages) then oversubscribes the box and the
    # actor pools stall waiting for CPU slots (measured 66s of pure waiting
    # at sf0.01). Aggregators are I/O-bound concatenators — a sliver of CPU
    # each keeps every pool schedulable alongside the real compute stages.
    # 0.01 CPU/partition: a 32-partition shuffle's aggregator pool costs
    # 0.32 CPU, so even a 4-CPU test cluster can schedule a 4-shuffle DAG
    # alongside its map stages without deadlock.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    # default parallelism 200 would spawn the max 64 aggregator actors for
    # ANY later groupby/sort in the same session — an actor storm that
    # stalls small clusters. 32 partitions is plenty per single node; a
    # multi-node deployment raises it with the cluster size.
    ctx.default_hash_shuffle_parallelism = 32
    # pack partitions into FEW aggregator actors: each aggregator process
    # costs ~0.3-0.5s to spawn, and a 2-shuffle DAG at the default cap (64)
    # spawns ~130 worker processes before any byte moves (measured: first
    # 32-partition run in a session 51.8s vs 8.3s warm). 8 actors x 4
    # partitions each keeps partition-level parallelism for the downstream
    # map while bounding spinup; a real multi-node cluster raises it to
    # ~#nodes so every node hosts an aggregator.
    ctx.max_hash_shuffle_aggregators = MAX_AGGREGATORS


def hash_partition_apply(
    ds,
    keys: List[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_parts: int = 32,
    batch_format: str = "pandas",
):
    """Shuffle ``ds`` once on ``hash(keys) % num_parts``; apply ``fn`` to each
    whole partition (a pandas DataFrame, or a pyarrow Table with
    ``batch_format="pyarrow"`` — use that when the partition carries binary
    columns, so empty outputs keep an explicit Arrow schema).

    ``fn`` MUST be vectorized and group internally (e.g.
    ``df.groupby(keys)...``) — it sees every row of every key assigned to its
    partition, and nothing else.
    """
    from ray.data.context import ShuffleStrategy

    enable_hash_shuffle()
    # a Dataset snapshots its DataContext at creation — flip the captured
    # copy too so upstream stages planned before this call still comply
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ds.context.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    ds.context.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
    ds.context.max_hash_shuffle_aggregators = MAX_AGGREGATORS
    return ds.repartition(num_parts, keys=keys).map_batches(
        fn, batch_format=batch_format, batch_size=None
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
