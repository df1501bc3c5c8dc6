"""Trained law/fintoc line-type classifiers."""

import numpy as np

from dedoc_ray.structure.ml_classifier import FintocTitleClassifier, LawLineClassifier


def test_law_classifier_heldout_accuracy():
    """Fresh synthetic corpus (different seed from training) — the same bar
    family as txtlayer (≥0.95)."""
    import scripts.train_line_types as tt

    rng = np.random.RandomState(99)
    clf = LawLineClassifier()
    total = correct = 0
    for _ in range(10):
        lines, labels = tt.law_doc(rng)
        preds = clf.predict(lines)
        correct += sum(p == t for p, t in zip(preds, labels))
        total += len(labels)
    assert correct / total >= 0.95, f"law acc {correct / total:.3f}"


def test_law_classifier_catches_regex_missed_variants():
    """Predicted IN DOCUMENT CONTEXT (features include relative position);
    the abbreviation/case forms below are exactly the ones the skeleton
    regexes in structure/domain.py do not match."""
    clf = LawLineClassifier()
    doc = [
        "Гл. 2",
        "Ст. 5. Общие положения",
        "положение применяется ко всем лицам при соблюдении условий",
        "ARTICLE 12",
        "the provision applies to all persons subject to conditions",
        "Art. 13.",
    ]
    preds = clf.predict(doc)
    assert preds[1] == "article" and preds[3] == "article" and preds[5] == "article"
    assert preds[2] == "raw_text" and preds[4] == "raw_text"


def test_fintoc_title_detection():
    import scripts.train_line_types as tt

    rng = np.random.RandomState(77)
    clf = FintocTitleClassifier()
    total = correct = 0
    for _ in range(10):
        lines, labels = tt.fintoc_doc(rng)
        preds = clf.predict_titles(lines)
        correct += int((preds == np.array(labels, dtype=bool)).sum())
        total += len(labels)
    assert correct / total >= 0.95


def test_fintoc_apply_assigns_depth_from_numbering():
    from dedoc_ray.core.line import LineWithMeta

    clf = FintocTitleClassifier()
    lines = [LineWithMeta("2.1 Market Risk\n"), LineWithMeta("plain body text about many figures and results\n")]
    clf.apply(lines)
    hl = lines[0].metadata.hierarchy_level
    assert hl.line_type == "header" and hl.level_2 == 2
    assert lines[1].metadata.hierarchy_level.is_raw_text()


def test_law_ml_kernel_end_to_end():
    from dedoc_ray.pipeline.config import PipelineConfig
    from dedoc_ray.pipeline.kernel import ExtractKernel
    from dedoc_ray.sources.synth_office import law_ml_bytes

    k = ExtractKernel(config=PipelineConfig(document_type="law", use_ml_line_classifier=True))
    row = k.extract_row("https://x.test/a.txt", law_ml_bytes(3, "alpha the beta the gamma"))
    arts = [n for n in row["nodes"] if n["line_type"] == "article"]
    assert len(arts) == 3


def test_windowed_features_shape_and_context():
    import numpy as np

    from dedoc_ray.structure.line_features import (
        FEATURE_NAMES,
        WINDOWED_FEATURE_NAMES,
        line_features,
        line_features_windowed,
    )

    texts = ["Chapter 1", "Article 2.", "plain body text of medium length here"]
    F = line_features_windowed(texts)
    assert F.shape == (3, len(WINDOWED_FEATURE_NAMES))
    base = line_features(texts)
    nb = len(FEATURE_NAMES)
    assert np.allclose(F[:, :nb], base)
    # prev window of line 1 carries line 0's chapter flag
    kw_chapter = FEATURE_NAMES.index("kw_chapter")
    prev_off = nb + [c for c in range(nb)].index(0)  # window cols start at base idx 0
    from dedoc_ray.structure.line_features import _WINDOW_COLS

    assert F[1, nb + _WINDOW_COLS.index(kw_chapter)] == 1.0
    assert F[0, nb + _WINDOW_COLS.index(kw_chapter)] == 0.0  # no prev line
    # next window of line 0 carries line 1's article flag
    kw_article = FEATURE_NAMES.index("kw_article")
    assert F[0, nb + len(_WINDOW_COLS) + _WINDOW_COLS.index(kw_article)] == 1.0
    # percentile columns are last two, in [0, 1], longest line ranked 1.0
    assert F[2, -2] == 1.0
    assert (F[:, -2:] >= 0).all() and (F[:, -2:] <= 1).all()


def test_tz_diploma_classifiers_on_variants():
    from dedoc_ray.structure.ml_classifier import DiplomaLineClassifier, TzLineClassifier

    tz = TzLineClassifier()
    assert tz.predict([
        "ТЕХНИЧЕСКОЕ ЗАДАНИЕ", "Req. 2:", "Requirements 5", "Раздел требований 1",
        "1) provide the data", "the provision applies to all parties as described",
    ]) == ["root", "section", "section", "section", "item", "raw_text"]

    dp = DiplomaLineClassifier()
    assert dp.predict([
        "ВВЕДЕНИЕ", "Гл. 2", "CHAPTER 3", "2.1 methods described here",
        "the narrative body of this chapter discusses results in detail",
        "ЗАКЛЮЧЕНИЕ.",
    ]) == ["named_item", "chapter", "chapter", "section", "raw_text", "named_item"]


def test_paragraph_classifier_heldout_accuracy():
    """Committed weights hold ≥0.95 on a fresh synthetic layout corpus
    (different seed than training) — same bar as the other classifiers."""
    import numpy as np

    from dedoc_ray.readers.paragraph import ParagraphClassifier
    from scripts.train_paragraph import synth_doc

    rng = np.random.RandomState(123)
    clf = ParagraphClassifier()
    correct = total = 0
    for _ in range(100):
        lines, labels = synth_doc(rng)
        preds = clf.predict_starts(lines)
        correct += int((preds == np.array(labels)).sum())
        total += len(labels)
    assert correct / total >= 0.95, f"paragraph acc {correct / total:.3f}"


def test_paragraph_merge_joins_continuations():
    from dedoc_ray.readers.paragraph import merge_paragraph_lines

    grouped = [
        (72.0, 780.0, "F1", 12.0, "Title line"),
        (90.0, 754.0, "F1", 10.0, "first paragraph starts"),
        (72.0, 741.0, "F1", 10.0, "and wraps onto this line"),
        (90.0, 715.0, "F1", 10.0, "second paragraph"),
        (72.0, 702.0, "F1", 10.0, "also wrapped"),
    ]
    merged = merge_paragraph_lines(grouped)
    assert [t[4] for t in merged] == [
        "Title line",
        "first paragraph starts and wraps onto this line",
        "second paragraph also wrapped",
    ]
    # start line's geometry is kept
    assert merged[1][:2] == (90.0, 754.0)


def test_paragraph_merge_off_by_default():
    from dedoc_ray.readers.pdf import read_pdf_textlayer
    from dedoc_ray.sources.synth_office import pdf_para_bytes

    data = pdf_para_bytes(5, "alpha beta the gamma delta")
    plain = read_pdf_textlayer(data)
    merged = read_pdf_textlayer(data, merge_paragraphs=True)
    assert len(plain.lines) == 5  # title + 2 paragraphs x 2 visual lines
    assert len(merged.lines) == 3
    assert "".join(l.line for l in merged.lines) == "Document 5\nalpha beta\ngamma delta\n"
