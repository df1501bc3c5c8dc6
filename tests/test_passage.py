"""Tests: substring-level duplicate-passage detection (ops/passage.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stats_local(texts: dict[int, str], k: int) -> pd.DataFrame:
    """Drive the kernels + partition functions directly (no Ray)."""
    from dedoc_ray.ops.passage import (
        GramCountKernel,
        PassageGramKernel,
        _filter_dup_grams,
        _finalize_factory,
    )

    batch = pa.Table.from_pydict(
        {
            "doc_id": pa.array(list(texts), "int64"),
            "text": pa.array(list(texts.values()), "string"),
        }
    )
    grams = PassageGramKernel(k)(batch).to_pandas()
    dup = _filter_dup_grams(grams)
    counts = GramCountKernel(k)(batch).to_pandas()
    return (
        _finalize_factory(k)(pd.concat([counts, dup], ignore_index=True))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_shared_sentence_detected_unique_doc_zero():
    shared = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        1: f"intro alpha. {shared} outro one.",
        2: f"different beginning text! {shared} and a different tail.",
        3: "completely unrelated content with no overlap whatsoever here today",
    }
    out = _stats_local(texts, k=24)
    row3 = out[out.doc_id == 3].iloc[0]
    assert row3.n_dup_grams == 0 and row3.n_dup_bytes == 0
    for d in (1, 2):
        row = out[out.doc_id == d].iloc[0]
        # a shared substring of length L >= k covers L - k + 1 grams and
        # >= L duplicated bytes
        assert row.n_dup_grams >= len(shared) - 24 + 1
        assert row.n_dup_bytes >= len(shared)
        assert row.n_dup_bytes <= len(texts[d])


def test_within_doc_repeat_is_not_cross_doc_dup():
    rep = "repeated phrase inside one document only. "
    texts = {1: rep * 3, 2: "totally different words with zero common substrings"}
    out = _stats_local(texts, k=24)
    assert (out.n_dup_bytes == 0).all()


def test_short_doc_zero_grams():
    texts = {1: "tiny", 2: "also tiny"}
    out = _stats_local(texts, k=24)
    assert (out.n_grams == 0).all() and (out.n_dup_grams == 0).all()


def test_coverage_interval_union_exact():
    # identical docs: every gram duplicated, coverage = whole normalized text
    from dedoc_ray.ops.fingerprint import _normalize

    t = "exactly the same words in both documents end to end, long enough"
    out = _stats_local({1: t, 2: t}, k=24)
    n = len(_normalize(t))
    assert (out.n_grams == n - 24 + 1).all()
    assert (out.n_dup_grams == n - 24 + 1).all()
    assert (out.n_dup_bytes == n).all()


def _strip_local(texts: dict[int, str], k: int) -> pd.DataFrame:
    from dedoc_ray.ops.passage import (
        DocTextKernel,
        PassageGramKernel,
        _filter_foreign_grams,
        _strip_factory,
    )

    batch = pa.Table.from_pydict(
        {
            "doc_id": pa.array(list(texts), "int64"),
            "text": pa.array(list(texts.values()), "string"),
        }
    )
    grams = PassageGramKernel(k)(batch).to_pandas()
    foreign = _filter_foreign_grams(grams)
    tagged = DocTextKernel()(batch).to_pandas()
    return (
        _strip_factory(k)(pd.concat([tagged, foreign], ignore_index=True))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_strip_keeps_canonical_removes_copy():
    from dedoc_ray.ops.fingerprint import _normalize

    shared = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        1: f"intro alpha. {shared} outro one.",
        2: f"different beginning text! {shared} and a different tail.",
    }
    out = _strip_local(texts, k=24)
    r1, r2 = out[out.doc_id == 1].iloc[0], out[out.doc_id == 2].iloc[0]
    # canonical doc 1 keeps its bytes
    assert r1.clean_text == _normalize(texts[1]).decode()
    assert r1.n_removed_bytes == 0
    # doc 2 loses the shared passage but keeps its unique head and tail
    assert shared not in r2.clean_text
    assert r2.clean_text.startswith("different beginning text!")
    assert r2.clean_text.endswith("different tail.")
    assert r2.n_removed_bytes >= len(shared)


def test_strip_identical_docs_second_emptied():
    t = "exactly the same words in both documents end to end, long enough"
    out = _strip_local({7: t, 9: t}, k=24)
    assert out[out.doc_id == 7].iloc[0].n_removed_bytes == 0
    assert out[out.doc_id == 9].iloc[0].clean_text == ""


def test_end_to_end_matches_local(ray_session):
    from dedoc_ray.ops.passage import duplicate_passages

    sf = "/root/testdata/sf0.001"
    got = duplicate_passages(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    want = _stats_local(dict(zip(docs.doc_id, docs.text)), k=24)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_novel_grams_bruteforce(ray_session, tmp_path):
    """Every doc's n_novel equals the count of its distinct 3-gram hashes
    not present in any smaller-id doc (brute-force replay)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dedoc_ray.ops.dedup import shingle_hashes
    from dedoc_ray.ops.passage import novel_grams

    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma zeta eta",      # shares the 'alpha beta gamma' gram
        "completely different words here now",
        "alpha beta gamma delta epsilon",  # exact dup of doc 0: zero novel
    ]
    d = str(tmp_path / "novel")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.Table.from_pydict(
            {"doc_id": pa.array(range(len(texts)), "int64"),
             "text": pa.array(texts, "string")}
        ),
        f"{d}/documents.parquet",
    )
    got = novel_grams(d).to_pandas().set_index("doc_id").sort_index()

    seen: set = set()
    for i, t in enumerate(texts):
        g = set(shingle_hashes(t).tolist())
        assert got.loc[i, "n_grams"] == len(g)
        assert got.loc[i, "n_novel"] == len(g - seen)
        seen |= g
    assert got.loc[3, "n_novel"] == 0
