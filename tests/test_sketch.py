"""HyperLogLog sketch: register math, merge law, estimator accuracy."""

import numpy as np
import pyarrow as pa
import pytest

from dedoc_ray.ops.sketch import (
    M,
    RHO_MAX,
    _fold_registers,
    _hash64_column,
    estimate_components,
    hll_cardinality,
    hll_registers,
)


def _vals(n, salt=""):
    return [f"value-{salt}{i}" for i in range(n)]


def test_fold_registers_rho_definition():
    # bucket = top 12 bits, rho = leading zeros of low 52 bits + 1
    h = np.array([(5 << 52) | (1 << 51)], dtype=np.uint64)  # tail MSB set
    regs = _fold_registers(h)
    assert regs[5] == 1
    h = np.array([(7 << 52) | 1], dtype=np.uint64)  # tail = 1 → 51 zeros
    assert _fold_registers(h)[7] == 52
    h = np.array([9 << 52], dtype=np.uint64)  # tail = 0 → max rho
    assert _fold_registers(h)[9] == RHO_MAX


def test_merge_is_elementwise_max():
    hs = _hash64_column(_vals(5000))
    whole = _fold_registers(hs)
    merged = np.maximum(_fold_registers(hs[:2000]), _fold_registers(hs[2000:]))
    assert np.array_equal(whole, merged)


def test_hash_is_stable_and_duplicate_insensitive():
    a = _fold_registers(_hash64_column(_vals(1000)))
    b = _fold_registers(_hash64_column(_vals(1000) * 7))  # duplicates
    assert np.array_equal(a, b)


@pytest.mark.parametrize("n", [20_000, 100_000])
def test_estimator_accuracy_large_range(n):
    regs = _fold_registers(_hash64_column(_vals(n)))
    nz = np.nonzero(regs)[0]
    _, v, e_raw = estimate_components(nz, regs[nz].astype(np.int64))
    if v == 0 or e_raw > 5 * M // 2:  # raw-estimator regime
        assert abs(e_raw - n) / n < 0.05
    # corrected estimate must always be close (1.04/sqrt(4096) ≈ 1.6 % stderr)


def test_corrected_estimate_small_and_large():
    class _FakeDs:
        def __init__(self, tbl):
            self._t = tbl

        def to_arrow_refs(self):
            import ray
            return [ray.put(self._t)]

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=2, include_dashboard=False,
                 ignore_reinit_error=True)
    for n in (300, 50_000):
        regs = _fold_registers(_hash64_column(_vals(n, salt="c")))
        nz = np.nonzero(regs)[0]
        tbl = pa.table({"bucket": pa.array(nz.astype(np.int64)),
                        "rho": pa.array(regs[nz].astype(np.int64))})
        est = hll_cardinality(_FakeDs(tbl))
        assert abs(est - n) / n < 0.06, (n, est)


def test_ray_pipeline_matches_local_fold(ray_session):
    import ray.data as rd

    rows = [{"t": f"tok{i} tok{i + 1} shared"} for i in range(500)]
    ds = rd.from_items(rows).repartition(4)
    out = hll_registers(ds, "t", tokenize=True).take_all()
    toks = set()
    for r in rows:
        toks.update(r["t"].split())
    regs = _fold_registers(_hash64_column(sorted(toks)))
    expect = {int(b): int(regs[b]) for b in np.nonzero(regs)[0]}
    assert {r["bucket"]: r["rho"] for r in out} == expect


# ------------------------------------------------------- count-min sketch


def test_cms_overestimates_never_under(ray_session):
    """CMS guarantee: est ≥ true count, for every probed token."""
    import duckdb

    from dedoc_ray.ops.sketch import cms_estimate

    sf = "/root/testdata/sf0.001"
    est = {r["token"]: r["est_count"] for r in cms_estimate(sf).to_pylist()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")
    true = dict(con.execute(r"""
        SELECT tok, count(*) FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents
        ) GROUP BY tok
    """).fetchall())
    for tok, e in est.items():
        assert e >= true.get(tok, 0), (tok, e, true.get(tok))
    # 'the' is template-split, so it is frequent; estimate should be close
    assert est["the"] <= true["the"] * 2


def test_cms_partial_merge_is_sum():
    import pyarrow as pa

    from dedoc_ray.ops.sketch import CMS_D, CMS_W, _CmsPartialKernel

    k = _CmsPartialKernel()
    whole = k(pa.table({"text": ["a b c a", "b c d"]}))
    p1 = k(pa.table({"text": ["a b c a"]}))
    p2 = k(pa.table({"text": ["b c d"]}))

    def dense(t):
        import numpy as np

        m = np.zeros((CMS_D, CMS_W), np.int64)
        for r, c, n in zip(t["row"].to_pylist(), t["col"].to_pylist(), t["cnt"].to_pylist()):
            m[r, c] = n
        return m

    assert (dense(whole) == dense(p1) + dense(p2)).all()
