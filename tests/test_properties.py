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


# ------------------------------------------------- round-2 operator algebra


@settings(max_examples=150, deadline=None)
@given(texts)
def test_split_prefix_preserves_concatenated_text(t):
    """Item/subitem splitting never changes the concatenated text."""
    from dedoc_ray.core.hierarchy import HierarchyLevel
    from dedoc_ray.core.line import LineMetadata
    from dedoc_ray.structure.postprocess import (
        REGEXPS_DIGITS_WITH_DOTS,
        REGEXPS_ENDS_OF_NUMBER,
        split_prefix_lines,
    )

    line = LineWithMeta(
        t, metadata=LineMetadata(hierarchy_level=HierarchyLevel(2, 1, False, "item"))
    )
    out = split_prefix_lines([line], ("item",), (REGEXPS_DIGITS_WITH_DOTS,), (REGEXPS_ENDS_OF_NUMBER,))
    assert "".join(l.line for l in out) == t


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_rtf_reader_never_crashes(payload):
    """Arbitrary bytes after the magic: parse or raise BadRtfFile, never
    another exception type."""
    from dedoc_ray.readers.rtf import BadRtfFile, read_rtf

    try:
        read_rtf(b"{\\rtf1" + payload + b"}")
    except BadRtfFile:
        pass


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2000))
def test_numbering_formatter_decimal_letters(n):
    from dedoc_ray.readers.docx_numbering import format_number

    assert format_number("decimal", n) == str(n + 1)
    low = format_number("lowerLetter", n)
    assert low == low.lower() and len(low) == n // 26 + 1
    assert format_number("upperLetter", n) == low.upper()


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120))
def test_bpe_pattern_matches_duckdb(t):
    """The BPE-ish token pattern is shared verbatim with the SQL oracle —
    Python re and DuckDB RE2 must count identically on ASCII text."""
    import duckdb

    from dedoc_ray.ops.textstats import BPE_PATTERN, BPE_RE

    py = len(BPE_RE.findall(t))
    sql_pat = BPE_PATTERN.replace("'", "''")
    db = duckdb.execute(
        f"SELECT length(regexp_extract_all(?, '{sql_pat}'))", [t]
    ).fetchone()[0]
    assert py == db


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, (1 << 64) - 1), min_size=1, max_size=8))
def test_simhash_popcount_lut_matches_bincount(xs):
    import numpy as np

    x = np.array(xs, dtype=np.uint64)
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    ham = lut[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)
    assert [int(h) for h in ham] == [bin(v).count("1") for v in xs]


@settings(max_examples=150, deadline=None)
@given(
    st.binary(min_size=0, max_size=300),
    st.sampled_from([".html", ".txt", ".csv", ".json", ".pdf", ".docx", ".xlsx",
                     ".pptx", ".odt", ".rtf", ".eml", ".mhtml", ".zip", ".bin"]),
)
def test_extract_row_never_raises(payload, ext):
    """The 100 TB robustness contract: ANY payload byte string produces a
    status row (ok | bad_file | parse_error), never an exception — one bad
    row must not kill a 64-row batch."""
    from dedoc_ray.pipeline.kernel import ExtractKernel

    row = _FUZZ_KERNEL.extract_row(f"https://fuzz.test/x{ext}", payload)
    assert row["status"] in ("ok", "bad_file", "parse_error")


from dedoc_ray.pipeline.kernel import ExtractKernel as _EK  # noqa: E402

_FUZZ_KERNEL = _EK()


def test_gopher_repetition_kernel_matches_sql_on_adversarial_texts():
    """Kernel vs the DuckDB oracle on texts that exercise every branch:
    heavy top-gram repetition, duplicated 5-grams, short docs, empties."""
    import duckdb
    import pandas as pd
    import pyarrow as pa

    from dedoc_ray.ops.textstats import GOPHER_REPETITION_SQL, GopherRepetitionKernel

    texts = [
        "spam spam spam spam spam spam",                     # one 2-gram dominates
        "a b c d e a b c d e a b c d e",                     # duplicated 5-grams
        "one two three four",                                # L < 5: dup5 = 0
        "w",                                                 # single word
        "",                                                  # empty
        " ".join(f"word{i}" for i in range(40)),             # all unique, long
        "x y x y x y z q r s t u v w a b c d e f",           # mixed
    ]
    batch = pa.Table.from_pydict(
        {"doc_id": pa.array(range(len(texts)), "int64"), "text": pa.array(texts, "string")}
    )
    got = GopherRepetitionKernel()(batch).to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", batch.to_pandas())
    exp = con.execute(GOPHER_REPETITION_SQL).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)
    # the adversarial texts must actually trip the rules
    assert got.loc[0, "passes"] == 0 and got.loc[0, "top2_x1000"] > 200
    assert got.loc[1, "dup5_x1000"] > 150 and got.loc[1, "passes"] == 0
    assert got.loc[2, "dup5_x1000"] == 0
    assert got.loc[5, "passes"] == 1
