"""Sessionization — gap-based session assignment per user.

The canonical clickstream operator: a user's events, ordered by time,
start a new session whenever the gap to the previous event exceeds a
threshold. Per-key ORDER matters, so the op is ONE keyed shuffle on
user_id followed by a vectorized per-partition scan — never a global
sort: sessions of different users are independent, and a user's whole
history lands in exactly one partition (the same partitioning contract
as the asof join in ops/relational.py).

Within a partition the scan is pure numpy: sort by (user_id, ts,
event_id), mark rows where the user changes or the gap exceeds the
threshold, cumsum the marks per user. Skew note: one hyperactive user is
bounded by their own event count; partitions hold many users so the
shuffle stays balanced under hash(user_id)."""

from __future__ import annotations

import numpy as np
import pandas as pd

GAP_MINUTES_DEFAULT = 30


def _sessionize_factory(gap_minutes: int):
    gap_us = np.int64(gap_minutes) * 60_000_000

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        """User-complete partition -> (event_id, user_id, session_id,
        session_event_idx); session ids are 0-based per user."""
        if df.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "session_id": pd.Series([], dtype="int64"),
                    "session_event_idx": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable").reset_index(drop=True)
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = df["user_id"].to_numpy()
        new_user = np.empty(len(df), dtype=bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(df), dtype=np.int64)
        gap[0] = 0
        gap[1:] = ts[1:] - ts[:-1]
        new_session = new_user | (gap > gap_us)
        # cumsum of session starts, rebased to 0 per user
        sess_global = np.cumsum(new_session)
        first_of_user = np.where(new_user, sess_global, 0)
        base = np.maximum.accumulate(first_of_user)
        session_id = (sess_global - base).astype(np.int64)
        # event index within session
        start_idx = np.where(new_session, np.arange(len(df)), 0)
        sess_base = np.maximum.accumulate(start_idx)
        idx_in_sess = (np.arange(len(df)) - sess_base).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "session_id": session_id,
                "session_event_idx": idx_in_sess,
            }
        )

    return sessionize


def sessionize_events(sf_dir: str, gap_minutes: int = GAP_MINUTES_DEFAULT, num_parts: int = 32):
    import ray.data as rd

    from dedoc_ray.ops.shuffle import hash_partition_apply

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    return hash_partition_apply(
        events, ["user_id"], _sessionize_factory(gap_minutes), num_parts=num_parts
    )


def sessionize_sql(gap_minutes: int = GAP_MINUTES_DEFAULT) -> str:
    return f"""
WITH g AS (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
               OR date_diff('microsecond', lag(ts) OVER w, ts) > {gap_minutes} * 60000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT event_id, user_id, ts, new_session,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) - 1 AS session_id
  FROM g
)
SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(row_number() OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) - 1 AS BIGINT)
         AS session_event_idx
FROM s
"""
