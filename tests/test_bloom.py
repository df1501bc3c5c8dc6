"""Bloom filter: position math, no-false-negative law, probe semantics."""

import numpy as np
import pandas as pd

from dedoc_ray.ops.bloom import M_BITS, N_HASHES, bloom_delta, positions_of


def test_positions_deterministic_and_in_range():
    fps = ["d41d8cd98f00b204e9800998ecf8427e", "ffffffffffffffff0000000000000000"]
    p1, p2 = positions_of(fps), positions_of(fps)
    assert np.array_equal(p1, p2)
    assert p1.shape == (2, N_HASHES)
    assert (p1 >= 0).all() and (p1 < M_BITS).all()
    # kirsch-mitzenmacher: position_j = (h1 + j*h2) mod m
    h64 = int(fps[1][:16], 16)
    h1, h2 = h64 & 0xFFFFFFFF, h64 >> 32
    assert p1[1, 3] == (h1 + 3 * h2) % M_BITS


def test_no_false_negatives_no_matter_the_filter():
    """A fingerprint inserted into the filter ALWAYS probes positive."""
    import hashlib

    fps = [hashlib.md5(str(i).encode()).hexdigest() for i in range(1000)]
    filt = np.zeros(M_BITS, bool)
    filt[np.unique(positions_of(fps))] = True
    assert filt[positions_of(fps)].all(axis=1).all()


def test_false_positive_direction_only():
    """Probing fingerprints NOT inserted may collide, but at this load
    (1k keys in 256k bits) the fp rate must be tiny."""
    import hashlib

    ins = [hashlib.md5(f"in-{i}".encode()).hexdigest() for i in range(1000)]
    other = [hashlib.md5(f"out-{i}".encode()).hexdigest() for i in range(1000)]
    filt = np.zeros(M_BITS, bool)
    filt[np.unique(positions_of(ins))] = True
    fp_rate = filt[positions_of(other)].all(axis=1).mean()
    assert fp_rate < 0.01


def test_bloom_delta_agrees_with_exact_anti_join(ray_session):
    """On the synthetic corpus the filter is far under capacity, so the
    Bloom verdict must equal exact membership of the base fingerprint
    set (any difference would be a false positive — none expected here)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = pd.DataFrame(bloom_delta(sf).take_all()).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    want = con.execute(r"""
        WITH f AS (
          SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
                 doc_id % 2 AS is_new FROM documents
        )
        SELECT doc_id,
               CAST(fp IN (SELECT fp FROM f WHERE is_new = 0) AS BIGINT) AS seen_exact
        FROM f WHERE is_new = 1 ORDER BY doc_id
    """).df()
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["seen_maybe"].to_numpy() == want["seen_exact"].to_numpy()).all()
