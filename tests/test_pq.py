"""Product quantization: codebook determinism, encode, ADC search parity."""

import numpy as np
import pandas as pd
import pytest

from dedoc_ray.ops.pq import (
    _adc_scores,
    _encode,
    _query_luts,
    pq_encode,
    pq_fit,
    pq_search,
    pq_search_reference,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def books(ray_session):
    return pq_fit(SF)


def test_fit_deterministic(ray_session, books):
    again = pq_fit(SF)
    assert np.array_equal(books, again)
    assert books.shape == (4, 16, 16)


def test_encode_shapes_and_range(ray_session, books):
    rows = pq_encode(SF, books=books).take_all()
    assert len(rows) == 500
    for r in rows[:20]:
        assert len(r["codes"]) == 4
        assert all(0 <= c < 16 for c in r["codes"])


def test_adc_lut_equals_direct_distance(ray_session, books):
    """For a vector quantized to codes, ADC distance == sum of subspace
    distances to the chosen centroids (exact float identity)."""
    import pyarrow.dataset as pads

    from dedoc_ray.ops.knn import _embedding_matrix

    from dedoc_ray.ops.pq import _unit

    tbl = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"], filter=pads.field("vec_id") < 8)
    mat = _unit(_embedding_matrix(tbl).astype(np.float64))
    codes = _encode(mat, books)
    luts = _query_luts(SF, books, 8)
    dist = _adc_scores(codes, luts)
    q = 3
    w = books.shape[2]
    manual = 0.0
    for s in range(4):
        diff = mat[q, s * w:(s + 1) * w] - books[s, codes[5, s]]
        manual += float((diff * diff).sum())
    assert dist[q, 5] == pytest.approx(manual, rel=0, abs=1e-12)


def test_distributed_equals_reference(ray_session, books):
    got = pd.DataFrame(pq_search(SF, books=books).take_all())
    want = pq_search_reference(SF, books=books)
    key = ["qid", "vec_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[key], want[key])


def test_recall_with_rerank(ray_session, books):
    """PQ + exact rerank of the ADC shortlist (the production shape) must
    recover most of the exact cosine top-10. The synthetic embeddings are
    near-random (weakly separated neighbours), so the bar is 0.7 at
    R = 8k; pure ADC on this data plateaus near 0.25 — documented
    quantizer distortion, not a pipeline defect."""
    from dedoc_ray.ops.knn import knn_bruteforce

    exact = pd.DataFrame(knn_bruteforce(SF).take_all())
    approx = pd.DataFrame(pq_search(SF, books=books, rerank_r=80).take_all())
    assert (approx.groupby("qid").size() == 10).all()
    assert not ((approx["qid"] == approx["vec_id"]).any())
    hits = len(exact.merge(approx, on=["qid", "vec_id"]))
    assert hits / len(exact) >= 0.7
