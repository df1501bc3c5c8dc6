"""Link graph: edge synthesis determinism, anchor extraction through the
real HTML pipeline, and integer PageRank vs a single-process reference."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from dedoc_ray.ops.linkgraph import (
    BASE,
    DAMP_DEN,
    DAMP_NUM,
    SCALE,
    _targets,
    extract_links,
    pagerank,
)

SF = "/root/testdata/sf0.001"


def test_targets_deterministic_no_self():
    for d in range(50):
        t1, t2 = _targets(d, 500), _targets(d, 500)
        assert t1 == t2
        assert d not in t1
        assert 1 <= len(t1) <= 3
        assert all(0 <= x < 500 for x in t1)


def _reference_pagerank(n_docs: int, iters: int) -> pd.DataFrame:
    edges = [(s, d, len(_targets(s, n_docs))) for s in range(n_docs) for d in _targets(s, n_docs)]
    rank = np.full(n_docs, SCALE, dtype=np.int64)
    for _ in range(iters):
        insum = np.zeros(n_docs, dtype=np.int64)
        for s, d, deg in edges:
            insum[d] += rank[s] // deg
        rank = BASE + (DAMP_NUM * insum) // DAMP_DEN
    return pd.DataFrame({"doc_id": np.arange(n_docs), "rank": rank})


def test_pagerank_exact_vs_reference(ray_session):
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    got = pagerank(SF, iters=2, num_parts=4).to_pandas().sort_values("doc_id").reset_index(drop=True)
    exp = _reference_pagerank(n, 2)
    pd.testing.assert_frame_equal(got.astype("int64"), exp, check_dtype=False)


def test_extract_links_matches_formula(ray_session):
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    got = extract_links(SF).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp_rows = [
        {"src": s, "dst": d, "anchor": f"doc {d}"} for s in range(n) for d in _targets(s, n)
    ]
    exp = pd.DataFrame(exp_rows).sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"src": "int64", "dst": "int64"}), exp)


def test_unlinked_node_gets_base_rank():
    # a node nothing points at must survive with rank == BASE after one round
    n = 500
    exp = _reference_pagerank(n, 1)
    indeg = np.zeros(n, dtype=int)
    for s in range(n):
        for d in _targets(s, n):
            indeg[d] += 1
    orphan = int(np.argmin(indeg))
    if indeg[orphan] == 0:
        assert exp.loc[orphan, "rank"] == BASE


def test_md5_formula_is_sql_replayable():
    # the Python and SQL sides must derive the same 32-bit hash
    d, j = 17, 2
    h_py = int(hashlib.md5(f"link:{d}:{j}".encode()).hexdigest()[:8], 16)
    import duckdb

    h_sql = duckdb.sql(
        f"SELECT CAST('0x' || substr(md5('link:' || 17 || ':' || 2), 1, 8) AS BIGINT)"
    ).fetchone()[0]
    assert h_py == h_sql
