"""Tests: connected components over duplicate pairs."""

from __future__ import annotations

import pyarrow as pa


def _cc(pairs, small_graph_edges=5_000_000):
    import ray.data as rd

    from dedoc_ray.ops.cc import connected_components

    ds = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_a": pa.array([a for a, _ in pairs], "int64"),
                "doc_b": pa.array([b for _, b in pairs], "int64"),
            }
        )
    )
    df = connected_components(ds, small_graph_edges=small_graph_edges).to_pandas()
    return dict(zip(df["doc_id"], df["cluster_id"]))


def test_two_components_and_star(ray_session):
    got = _cc([(5, 9), (9, 7), (20, 21)])
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 21: 20}


def test_long_chain_needs_multiple_rounds(ray_session):
    # path graph 10-11-12-...-19: diameter 9 → several propagation rounds
    pairs = [(i, i + 1) for i in range(10, 19)]
    got = _cc(pairs)
    assert got == {i: 10 for i in range(10, 20)}


def test_cluster_id_is_min_doc(ray_session):
    got = _cc([(100, 3), (3, 50), (50, 2)])
    assert set(got.values()) == {2}


def test_iterative_path_matches_unionfind(ray_session):
    pairs = [(5, 9), (9, 7), (20, 21)] + [(i, i + 1) for i in range(30, 39)]
    fast = _cc(pairs)
    iterative = _cc(pairs, small_graph_edges=0)  # force the shuffle rounds
    assert fast == iterative
