"""Windowed co-occurrence / PMI: pair semantics and integer scoring."""

import pyarrow as pa

from dedoc_ray.ops.cooc import _CoocPartialKernel, pmi_topk


def test_pair_window_semantics():
    k = _CoocPartialKernel(window=2)
    out = k(pa.table({"text": ["x y z x"]}))
    rows = {(a, b): c for a, b, c in zip(out["a"].to_pylist(), out["b"].to_pylist(), out["cnt"].to_pylist())}
    # pairs within window 2 of [x y z x]: (x,y) (y,z) (z,x) dist1; (x,z) (y,x) dist2
    assert rows[("x", "y")] == 2  # (x,y)d1 + (y,x)d2
    assert rows[("y", "z")] == 1
    assert rows[("x", "z")] == 2  # (z,x)d1 + (x,z)d2
    # unigram markers
    assert rows[("x", "")] == 2 and rows[("y", "")] == 1
    # self-pairs are dropped
    assert ("x", "x") not in rows


def test_pmi_topk_deterministic(ray_session):
    t1 = pmi_topk("/root/testdata/sf0.001")
    t2 = pmi_topk("/root/testdata/sf0.001")
    assert t1.equals(t2)
    assert t1.num_rows == 50
    assert (pa.compute.min(t1["n_pair"]).as_py() or 0) >= 5
