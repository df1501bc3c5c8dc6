"""Corpus-level relational operators — the shuffle-bearing patterns.

These demonstrate (and test) the three wide-operation disciplines the
engine uses everywhere (ray_guide: Aggregation at scale / Joins):

- partial aggregation inside ``map_batches`` before the groupby shuffle
  (``lineitem_pricing``: the shuffle sees one row per key per batch);
- windowed aggregation by (key, time bucket) computed the same way
  (``events_hourly``);
- broadcast hash join for a small dimension side (``segment_revenue``:
  customer is ``ray.put`` once, looked up per batch — no shuffle join).

Money/measure sums are carried as integer cents (``floor(x*100 + 0.5)`` on
the identical per-row double) so results are bit-exact across engines —
float summation order would otherwise make the DuckDB oracle hash-mismatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _cents(series, scale: int = 100) -> np.ndarray:
    return np.floor(series.to_numpy(dtype=np.float64) * scale + 0.5).astype(np.int64)


def lineitem_pricing(sf_dir: str):
    """TPC-H Q1-shaped pricing summary with per-batch partial aggregation."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["sum_qty"] = df["l_quantity"].astype("int64")
        df["base_price_cents"] = _cents(df["l_extendedprice"])
        df["revenue_cents"] = _cents(df["l_extendedprice"] * (1.0 - df["l_discount"]))
        df["count_order"] = np.int64(1)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False)[
            ["sum_qty", "base_price_cents", "revenue_cents", "count_order"]
        ].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("base_price_cents", alias_name="base_price_cents"),
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("count_order", alias_name="count_order"),
    )


LINEITEM_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS base_price_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate per event_type (epoch-hour buckets)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = (df["ts"].astype("datetime64[s]").astype("int64") // 3600).astype("int64")
        df["value_milli"] = _cents(df["value"], scale=1000)
        df["n"] = np.int64(1)
        g = df.groupby(["event_type", "hour"], as_index=False)[["n", "value_milli"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby(["event_type", "hour"]).aggregate(
        Sum("n", alias_name="n"), Sum("value_milli", alias_name="value_milli")
    )


EVENTS_HOURLY_SQL = """
SELECT event_type,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS value_milli
FROM events
GROUP BY 1, 2
"""


def segment_revenue(sf_dir: str):
    """orders ⋈ customer via broadcast of the small dimension side."""
    import ray
    import ray.data as rd
    import pyarrow.dataset as pads
    from ray.data.aggregate import Sum

    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(columns=["c_custkey", "c_mktsegment"])
    lookup_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(), cust["c_mktsegment"].to_pylist())))

    class JoinSegment:
        def __init__(self, ref) -> None:
            self.lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["c_mktsegment"] = df["o_custkey"].map(self.lookup).fillna("UNKNOWN")
            df["revenue_cents"] = _cents(df["o_totalprice"])
            df["n_orders"] = np.int64(1)
            g = df.groupby("c_mktsegment", as_index=False)[["revenue_cents", "n_orders"]].sum()
            return pa.Table.from_pandas(g, preserve_index=False)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])
    partials = orders.map_batches(
        JoinSegment, fn_constructor_kwargs={"ref": lookup_ref}, batch_format="pyarrow", batch_size=65536, concurrency=(1, 2)
    )
    return partials.groupby("c_mktsegment").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"), Sum("n_orders", alias_name="n_orders")
    )


SEGMENT_REVENUE_SQL = """
SELECT coalesce(c.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def segment_revenue_shuffle_join(sf_dir: str):
    """Same result as ``segment_revenue`` via Ray Data's NATIVE hash join
    (``Dataset.join``, hash-shuffle backend) — the both-sides-large path a
    100 TB pipeline needs when the dimension no longer fits a broadcast.
    Orders rows are pre-pruned to (o_custkey, revenue_cents) before the
    shuffle; the joined stream partially aggregates per batch and the final
    combine is a tiny per-segment groupby."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from dedoc_ray.ops.shuffle import enable_hash_shuffle

    enable_hash_shuffle()

    def prune(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pydict(
            {
                "o_custkey": pa.array(df["o_custkey"].to_numpy("int64"), "int64"),
                "revenue_cents": pa.array(_cents(df["o_totalprice"]), "int64"),
            }
        )

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]).map_batches(
        prune, batch_format="pyarrow", batch_size=65536
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust, join_type="left_outer", num_partitions=16, on=("o_custkey",), right_on=("c_custkey",)
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["c_mktsegment"] = df["c_mktsegment"].fillna("UNKNOWN")
        df["n_orders"] = np.int64(1)
        g = df.groupby("c_mktsegment", as_index=False)[["revenue_cents", "n_orders"]].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return partials.groupby("c_mktsegment").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"), Sum("n_orders", alias_name="n_orders")
    )


def top_urls_by_size(extracted_ds, k: int = 20):
    """sort + limit demo on the extracted corpus (SURVEY.md §2.7)."""
    return extracted_ds.select_columns(["url", "n_bytes"]).sort("n_bytes", descending=True).limit(k)


def events_sliding(sf_dir: str, window: int = 3):
    """Sliding-window aggregate (custom operator class — Ray Data has no
    native window op): trailing ``window``-row moving sums over the hourly
    aggregate, per event_type.

    The distributed shape: the tumbling aggregate first (small output), then
    ONE hash-partition shuffle on event_type so each key's full hour series
    is co-located, then a vectorized pandas rolling inside the partition —
    windows never straddle partitions because the partition key is the
    window's PARTITION BY key.
    """
    import pandas as pd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    hourly = events_hourly(sf_dir)

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in
                                 ("event_type", "hour", "n_w", "value_milli_w")})
        out = []
        for _, g in df.groupby("event_type", sort=False):
            g = g.sort_values("hour").copy()
            g["n_w"] = g["n"].rolling(window, min_periods=1).sum().astype("int64")
            g["value_milli_w"] = g["value_milli"].rolling(window, min_periods=1).sum().astype("int64")
            out.append(g)
        return pd.concat(out)[["event_type", "hour", "n_w", "value_milli_w"]]

    return hash_partition_apply(hourly, ["event_type"], roll, num_parts=8)


def events_sliding_sql(window: int = 3) -> str:
    return f"""
WITH hourly AS ({EVENTS_HOURLY_SQL})
SELECT event_type, hour,
       CAST(sum(n) OVER w AS BIGINT) AS n_w,
       CAST(sum(value_milli) OVER w AS BIGINT) AS value_milli_w
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour
             ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
"""


def asof_events_orders(sf_dir: str):
    """AS-OF JOIN (custom operator — Ray Data has no native asof): each
    event matched to the user's latest order with o_orderdate <= event date.

    Distributed shape: both tables normalized to one tagged schema and
    UNIONed, ONE hash-partition shuffle on the join key co-locates each
    user's events and orders, then a vectorized ``pandas.merge_asof``
    (backward, inclusive) per partition. Orders are deduped per (user, date)
    keeping the max o_orderkey so ties are deterministic — the oracle
    applies the same rule with arg_max.
    """
    import pandas as pd
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    od = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    )

    def tag_events(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return pa.Table.from_pydict(
            {
                "key": pa.array(df["user_id"].astype("int64")),
                "kind": pa.array(["e"] * len(df), "string"),
                "when": pa.array(df["ts"].to_numpy().astype("datetime64[D]").astype("int64")),
                "id": pa.array(df["event_id"].astype("int64")),
                "price_cents": pa.array(np.zeros(len(df), dtype=np.int64)),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return pa.Table.from_pydict(
            {
                "key": pa.array(df["o_custkey"].astype("int64")),
                "kind": pa.array(["o"] * len(df), "string"),
                "when": pa.array(pd.to_datetime(df["o_orderdate"]).to_numpy().astype("datetime64[D]").astype("int64")),
                "id": pa.array(df["o_orderkey"].astype("int64")),
                "price_cents": pa.array(_cents(df["o_totalprice"])),
            }
        )

    tagged = ev.map_batches(tag_events, batch_format="pyarrow").union(
        od.map_batches(tag_orders, batch_format="pyarrow")
    )

    def join_part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype="int64")
                              for c in ("event_id", "user_id", "o_orderkey", "price_cents")})
        evp = df[df["kind"] == "e"]
        odp = df[df["kind"] == "o"]
        if evp.empty or odp.empty:
            return empty
        # dedupe orders: max o_orderkey per (user, date), carrying its price
        odp = odp.sort_values(["when", "id"]).groupby(["key", "when"], as_index=False).last()
        evp = evp.sort_values("when", kind="mergesort")
        odp = odp.sort_values("when", kind="mergesort")
        m = pd.merge_asof(evp, odp, on="when", by="key", direction="backward", suffixes=("", "_o"))
        m = m.dropna(subset=["id_o"])
        if m.empty:
            return empty
        return pd.DataFrame(
            {
                "event_id": m["id"].astype("int64"),
                "user_id": m["key"].astype("int64"),
                "o_orderkey": m["id_o"].astype("int64"),
                "price_cents": m["price_cents_o"].astype("int64"),
            }
        )

    return hash_partition_apply(tagged, ["key"], join_part, num_parts=16)


ASOF_EVENTS_ORDERS_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
         arg_max(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id, o.o_orderkey,
       CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM events e
ASOF JOIN o ON e.user_id = o.o_custkey AND CAST(e.ts AS DATE) >= o.o_orderdate
"""


def range_join_events_orders(sf_dir: str, window_days: int = 7):
    """RANGE JOIN (custom operator): per event, how many of the user's orders
    fall in the trailing ``window_days`` window [event_date - w, event_date].

    Same distributed shape as the as-of join — tag+union, one key shuffle —
    but the per-partition kernel is a windowed count via np.searchsorted on
    each user's sorted order dates (left-join semantics: events with no
    orders in range report 0).
    """
    import pandas as pd
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"])
    od = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_events(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return pa.Table.from_pydict(
            {
                "key": pa.array(df["user_id"].astype("int64")),
                "kind": pa.array(["e"] * len(df), "string"),
                "when": pa.array(df["ts"].to_numpy().astype("datetime64[D]").astype("int64")),
                "id": pa.array(df["event_id"].astype("int64")),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        return pa.Table.from_pydict(
            {
                "key": pa.array(df["o_custkey"].astype("int64")),
                "kind": pa.array(["o"] * len(df), "string"),
                "when": pa.array(pd.to_datetime(df["o_orderdate"]).to_numpy().astype("datetime64[D]").astype("int64")),
                "id": pa.array(df["o_orderkey"].astype("int64")),
            }
        )

    tagged = ev.map_batches(tag_events, batch_format="pyarrow").union(
        od.map_batches(tag_orders, batch_format="pyarrow")
    )

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series([], dtype="int64"), "n_orders": pd.Series([], dtype="int64")})
        evp = df[df["kind"] == "e"]
        if evp.empty:
            return empty
        out_id = evp["id"].to_numpy("int64")
        out_n = np.zeros(len(evp), dtype=np.int64)
        odp = df[df["kind"] == "o"]
        if not odp.empty:
            # composite key*K + when turns the per-key window count into ONE
            # pair of vectorized searchsorted calls over the whole partition
            # (no per-key loop). Valid because 0 <= when << K, so the window
            # lower bound key*K + (when - w) can never underflow into the
            # previous key's composite range.
            K = np.int64(1) << 21  # days-since-epoch < 2^15 << 2^21
            comp = np.sort(odp["key"].to_numpy("int64") * K + odp["when"].to_numpy("int64"))
            ek = evp["key"].to_numpy("int64") * K
            ew = evp["when"].to_numpy("int64")
            out_n = (
                np.searchsorted(comp, ek + ew, side="right")
                - np.searchsorted(comp, ek + ew - window_days, side="left")
            ).astype(np.int64)
        return pd.DataFrame({"event_id": out_id, "n_orders": out_n})

    return hash_partition_apply(tagged, ["key"], count_part, num_parts=16)


def range_join_sql(window_days: int = 7) -> str:
    return f"""
SELECT e.event_id,
       CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
FROM events e
LEFT JOIN orders o
  ON e.user_id = o.o_custkey
 AND o.o_orderdate BETWEEN CAST(e.ts AS DATE) - {window_days} AND CAST(e.ts AS DATE)
GROUP BY e.event_id
"""


def shipped_2000_revenue(sf_dir: str):
    """Predicate + projection pushdown at the read (SURVEY.md 'prune at the
    read'): only two columns and only year-2000 row groups leave storage —
    the filter executes inside the parquet scan, not in a downstream stage.
    Revenue per returnflag in cents."""
    import datetime

    import pyarrow.dataset as pads
    import ray.data as rd

    lo = datetime.datetime(2000, 1, 1)
    hi = datetime.datetime(2001, 1, 1)
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue_cents"] = _cents(df["l_extendedprice"])
        g = df.groupby("l_returnflag", as_index=False)["revenue_cents"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = partials.groupby("l_returnflag", as_index=False)["revenue_cents"].sum()
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    return out


SHIPPED_2000_REVENUE_SQL = """
SELECT l_returnflag,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2001-01-01'
GROUP BY 1
"""
