"""Property-based tests (hypothesis) — invariants the fixture corpus can't
sweep: line algebra, annotation merging, hashing determinism, shingle/window
math. The reference has no property tests (SURVEY.md §5); these guard the
core algebra every kernel builds on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.annotation_merger import merge_annotations
from dedoc_ray.core.line import LineWithMeta

texts = st.text(alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=80)


@settings(max_examples=200, deadline=None)
@given(texts, texts)
def test_line_add_preserves_text_and_shifts_annotations(a, b):
    la = LineWithMeta(a, annotations=[Annotation(0, len(a), "bold", "True")] if a else [])
    lb = LineWithMeta(b, annotations=[Annotation(0, len(b), "italic", "True")] if b else [])
    merged = la + lb
    assert merged.line == a + b
    for ann in merged.annotations:
        assert 0 <= ann.start <= ann.end <= len(merged.line)


@settings(max_examples=200, deadline=None)
@given(texts, st.integers(0, 100), st.integers(0, 100))
def test_slice_clips_annotations_into_bounds(text, i, j):
    start, stop = sorted((min(i, len(text)), min(j, len(text))))
    line = LineWithMeta(text, annotations=[Annotation(0, len(text), "bold", "True")] if text else [])
    sliced = line.slice(start, stop)
    assert sliced.line == text[start:stop]
    for ann in sliced.annotations:
        assert 0 <= ann.start <= ann.end <= len(sliced.line)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)), max_size=12))
def test_merge_annotations_idempotent_and_bounded(spans):
    text = "x" * 50
    anns = [Annotation(min(a, b), max(a, b), "bold", "True") for a, b in spans if a != b]
    once = merge_annotations(anns, text)
    twice = merge_annotations(list(once), text)
    assert [(x.start, x.end, x.name, x.value) for x in once] == [
        (x.start, x.end, x.name, x.value) for x in twice
    ]
    for ann in once:
        assert 0 <= ann.start <= ann.end <= len(text)


@settings(max_examples=100, deadline=None)
@given(texts)
def test_shingle_hashes_deterministic_and_text_invariant(text):
    from dedoc_ray.ops.dedup import shingle_hashes

    a = shingle_hashes(text)
    b = shingle_hashes(text)
    assert sorted(a.tolist()) == sorted(b.tolist())
    # the contract is lowercase-invariance (upper() is NOT round-trippable:
    # hypothesis found 'ß'.upper() == 'SS', which legitimately changes tokens)
    c = shingle_hashes(text.lower())
    assert sorted(c.tolist()) == sorted(a.tolist())


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc .\n", min_size=0, max_size=60))
def test_simhash_deterministic(text):
    import pyarrow as pa

    from dedoc_ray.ops.dedup import SimHashKernel

    batch = pa.Table.from_pydict({"doc_id": pa.array([1], "int64"), "text": pa.array([text], "string")})
    k = SimHashKernel()
    assert k(batch)["simhash"][0].as_py() == k(batch)["simhash"][0].as_py()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=0, max_size=30),
       st.lists(st.integers(0, 1000), min_size=0, max_size=30),
       st.integers(1, 20))
def test_range_count_matches_naive(order_days, event_days, window):
    """The searchsorted window count in range_join equals the naive O(n·m)."""
    import numpy as np

    dates = np.sort(np.asarray(order_days, dtype=np.int64))
    w = np.asarray(event_days, dtype=np.int64)
    fast = np.searchsorted(dates, w, side="right") - np.searchsorted(dates, w - window, side="left")
    naive = [sum(1 for d in order_days if ew - window <= d <= ew) for ew in event_days]
    assert fast.tolist() == naive


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abcdefgh ", min_size=30, max_size=60),
       st.text(alphabet="ijklmnop ", min_size=0, max_size=20),
       st.text(alphabet="qrstuvwx ", min_size=0, max_size=20))
def test_winnowing_guarantee_shared_substring_shares_fingerprint(common, pre, post):
    """Schleimer et al.: documents sharing a substring of length >= w+k-1
    share at least one selected fingerprint."""
    from dedoc_ray.ops.fingerprint import _K_DEFAULT, _W_DEFAULT, _normalize, rolling_hashes, winnow

    need = _W_DEFAULT + _K_DEFAULT - 1
    if len(_normalize(common)) < need:
        return
    a = winnow(rolling_hashes(_normalize(pre + common), _K_DEFAULT), _W_DEFAULT)
    b = winnow(rolling_hashes(_normalize(common + post), _K_DEFAULT), _W_DEFAULT)
    assert len(set(a.tolist()) & set(b.tolist())) >= 1


def test_winnow_empty_and_short_inputs():
    import numpy as np

    from dedoc_ray.ops.fingerprint import rolling_hashes, winnow

    assert len(winnow(rolling_hashes(b"", 16))) == 0
    assert len(winnow(rolling_hashes(b"short", 16))) == 0       # < k bytes
    one = winnow(rolling_hashes(b"x" * 20, 16))                 # < w grams
    assert len(one) == 1


def test_gopher_rules_boundaries():
    import pyarrow as pa

    from dedoc_ray.ops.textstats import GopherQualityKernel

    good = " ".join(["word"] * 60)                      # 60 words, mean len 4
    short = "only three words"                          # < 50 words
    hashy = " ".join(["word"] * 60) + " " + "#" * 30    # hash ratio fails
    bullets = "\n".join(f"- item {i}" for i in range(10))
    batch = pa.Table.from_pydict(
        {"doc_id": pa.array([1, 2, 3, 4], "int64"),
         "text": pa.array([good, short, hashy, bullets], "string")}
    )
    out = GopherQualityKernel()(batch)
    assert out["passes"].to_pylist() == [1, 0, 0, 0]
    assert out["r_wordcount"].to_pylist() == [1, 0, 1, 0]
    assert out["r_hashratio"].to_pylist() == [1, 1, 0, 1]
    assert out["r_bullet"].to_pylist() == [1, 1, 1, 0]
