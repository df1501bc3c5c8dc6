"""Event-time watermark / late-data accounting — the §2.9 streaming
concern expressed as a batch pipeline.

A streaming engine admits an event as "on time" if its event-time ts is
newer than the current WATERMARK = max event-time seen so far minus an
allowed delay; older events are "late". Replaying that decision over a
stored stream needs the prefix-maximum of event-time in ARRIVAL ORDER —
a sequential recurrence. The synthetic events table is perfectly
time-ordered, so arrival is modeled as ts + a deterministic md5-derived
network jitter (≤ 30 min per event) — the md5-low64 idiom every other
oracle replays — giving a realistically *mostly*-ordered stream with
genuine stragglers.

Parallelization (same two-pass shape as ops/rank.py's global rank):
1. one combiner pass: per-batch (arrival-range partition, max event-ts)
   partials → tiny groupby-max → the driver turns them into per-
   partition PREFIX seeds (max event-ts of all earlier partitions) —
   num_parts rows, never events;
2. one keyed shuffle on the contiguous arrival-range partition: inside
   each partition events sort by (arrival, event_id), a vectorized
   shifted cummax seeded with the partition prefix gives every event
   its watermark, and the partition emits per-hour (n, n_late)
   partials; a final tiny groupby merges them.

Everything integer-μs; DuckDB replays the exact decision with a window
prefix-max over the same jittered arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DELAY_MINUTES_DEFAULT = 10
JITTER_US = 30 * 60_000_000  # max modeled network delay
_SENTINEL = -(2 ** 62)  # safe: never overflows under "- delay_us"


def _ts_bounds_us(path: str) -> tuple:
    """(min, max) epoch-μs of the ts column from parquet row-group
    statistics — free, no data scan."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    idx = md.schema.names.index("ts")
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        smin = np.datetime64(st.min, "us").astype(np.int64)
        smax = np.datetime64(st.max, "us").astype(np.int64)
        lo = smin if lo is None else min(lo, smin)
        hi = smax if hi is None else max(hi, smax)
    return int(lo), int(hi)


def _arrival_us(event_ids: np.ndarray, ts_us: np.ndarray) -> np.ndarray:
    from dedoc_ray.ops.dedup import _stable_hash64

    jit = np.fromiter(
        (_stable_hash64(str(int(i))) % JITTER_US for i in event_ids),
        dtype=np.int64, count=len(event_ids),
    )
    return ts_us + jit


def late_events(sf_dir: str, delay_minutes: int = DELAY_MINUTES_DEFAULT,
                num_parts: int = 32):
    """(hour, n, n_late) per tumbling event-time hour — late = event-time
    older than the arrival-order watermark (prefix max ts − delay)."""
    import ray
    import ray.data as rd
    from dedoc_ray.ops.shuffle import hash_partition_apply

    delay_us = np.int64(delay_minutes) * 60_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])

    def tag_arrival(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_us = batch["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        arr = _arrival_us(ids, ts_us)
        return pa.Table.from_pydict({
            "event_id": pa.array(ids), "ts_us": pa.array(ts_us),
            "arrival_us": pa.array(arr),
        })

    # materialize ONCE: the tagged table is three int64 columns (bounded by
    # event count, not payloads), and both downstream consumers (seed
    # partials, the shuffle) would otherwise re-run the md5 jitter pass
    tagged = ds.map_batches(tag_arrival, batch_format="pyarrow").materialize()
    # arrival range bounds from parquet row-group STATISTICS (no compute
    # pass): arrival ∈ [min ts, max ts + max jitter]
    lo, hi = _ts_bounds_us(f"{sf_dir}/events.parquet")
    hi += JITTER_US
    range_size = max(1, (hi - lo + num_parts) // num_parts)

    def tag_part(batch: pa.Table) -> pa.Table:
        arr = batch["arrival_us"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(((arr - lo) // range_size).astype(np.int64)))

    parted = tagged.map_batches(tag_part, batch_format="pyarrow")

    # pass 1: bounded partials → per-partition prefix seeds on the driver
    def part_max(batch: pa.Table) -> pa.Table:
        df = batch.select(["part", "ts_us"]).to_pandas()
        g = df.groupby("part", as_index=False)["ts_us"].max()
        return pa.Table.from_pandas(g.rename(columns={"ts_us": "max_ts"}),
                                    preserve_index=False)

    partials = parted.map_batches(part_max, batch_format="pyarrow", batch_size=65536)
    # fold ≤ num_parts × n_batches partial rows on the driver — a native
    # hash-shuffle groupby costs ~10 s of fixed 200-partition overhead here
    pmax: dict = {}
    for r in partials.iter_rows():
        p = int(r["part"])
        pmax[p] = max(pmax.get(p, _SENTINEL), int(r["max_ts"]))
    seeds = {}
    running = _SENTINEL
    for p in range(num_parts + 2):
        seeds[p] = running
        if p in pmax:
            running = max(running, pmax[p])
    seeds_ref = ray.put(seeds)

    # pass 2: one keyed shuffle; vectorized per-partition watermark scan
    def scan(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        empty = pd.DataFrame({
            "hour": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "n_late": pd.Series([], dtype="int64"),
        })
        if df.empty:
            return empty
        sd = _ray.get(seeds_ref)
        out = []
        for part, sub in df.groupby("part"):
            sub = sub.sort_values(["arrival_us", "event_id"], kind="stable")
            ts = sub["ts_us"].to_numpy().astype(np.int64)
            prev_max = np.empty(len(ts), np.int64)
            prev_max[0] = sd.get(int(part), _SENTINEL)
            np.maximum.accumulate(ts[:-1], out=prev_max[1:])
            prev_max[1:] = np.maximum(prev_max[1:], prev_max[0])
            late = ts < prev_max - delay_us
            hours = ts // 3_600_000_000
            g = pd.DataFrame({"hour": hours, "n": np.int64(1),
                              "n_late": late.astype(np.int64)}).groupby(
                "hour", as_index=False)[["n", "n_late"]].sum()
            out.append(g)
        return pd.concat(out, ignore_index=True) if out else empty

    hour_parts = hash_partition_apply(parted, ["part"], scan, num_parts=num_parts)
    # final merge: ≤ n_hours × num_parts partial rows — bounded by window
    # geometry, not events — so a driver-side pandas sum beats a full
    # 200-partition hash-shuffle aggregate (measured 13 s of overhead on
    # <1k rows at sf0.1)
    merged = pd.DataFrame(hour_parts.take_all())
    if merged.empty:
        merged = pd.DataFrame({"hour": pd.Series([], dtype="int64"),
                               "n": pd.Series([], dtype="int64"),
                               "n_late": pd.Series([], dtype="int64")})
    out = merged.groupby("hour", as_index=False)[["n", "n_late"]].sum()
    return pa.Table.from_pandas(out.astype("int64"), preserve_index=False)


def late_events_sql(delay_minutes: int = DELAY_MINUTES_DEFAULT) -> str:
    from dedoc_ray.ops.sketch import _le64_of

    le = _le64_of("md5(CAST(event_id AS VARCHAR))")
    return f"""
WITH j AS (
  SELECT event_id, ts,
         epoch_us(ts) + CAST(({le}) % {JITTER_US} AS BIGINT) AS arr
  FROM events
),
w AS (
  SELECT ts,
         max(ts) OVER (ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM j
)
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN pmax IS NOT NULL
                      AND epoch_us(ts) < epoch_us(pmax) - {delay_minutes} * 60000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w
GROUP BY 1
"""
