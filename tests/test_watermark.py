"""Watermark / late-event accounting: parity, jitter realism, edges."""

import numpy as np
import pandas as pd


def _naive(sf: str, delay_minutes: int) -> pd.DataFrame:
    import pyarrow.parquet as pq

    from dedoc_ray.ops.watermark import _SENTINEL, _arrival_us

    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_id", "ts"]).to_pandas()
    ids = ev["event_id"].to_numpy().astype(np.int64)
    ts = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    arr = _arrival_us(ids, ts)
    order = np.lexsort((ids, arr))
    ts = ts[order]
    prev = np.empty(len(ts), np.int64)
    prev[0] = _SENTINEL
    np.maximum.accumulate(ts[:-1], out=prev[1:])
    late = ts < prev - delay_minutes * 60_000_000
    df = pd.DataFrame({"hour": ts // 3_600_000_000, "n": 1, "n_late": late.astype(int)})
    return df.groupby("hour", as_index=False).sum().sort_values("hour").reset_index(drop=True)


def test_late_events_matches_single_process(ray_session):
    """Distributed two-pass result == naive sequential replay, and the
    jittered stream genuinely contains late rows."""
    from dedoc_ray.ops.watermark import late_events

    sf = "/root/testdata/sf0.001"
    got = late_events(sf).to_pandas().sort_values("hour").reset_index(drop=True)
    want = _naive(sf, 10)
    assert (got["hour"].to_numpy() == want["hour"].to_numpy()).all()
    assert (got["n"].to_numpy() == want["n"].to_numpy()).all()
    assert (got["n_late"].to_numpy() == want["n_late"].to_numpy()).all()
    assert 0 < got["n_late"].sum() < got["n"].sum()


def test_larger_delay_never_increases_lateness(ray_session):
    """Monotonicity: a more tolerant watermark flags fewer late events."""
    from dedoc_ray.ops.watermark import late_events

    sf = "/root/testdata/sf0.001"
    tight = late_events(sf, delay_minutes=1).to_pandas()["n_late"].sum()
    loose = late_events(sf, delay_minutes=25).to_pandas()["n_late"].sum()
    assert loose <= tight
    assert tight > 0
