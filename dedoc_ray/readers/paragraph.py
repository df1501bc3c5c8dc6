"""Paragraph-continuation classifier over text-layer line geometry.

Reference: dedoc's ``ScanParagraphClassifierExtractor``
(dedoc/readers/pdf_reader/pdf_image_reader/paragraph_extractor/
scan_paragraph_classifier_extractor.py:18-77) — an XGBoost model over
``ParagraphFeatureExtractor`` features (indent, inter-line distance,
case, lengths; paragraph_feature_extractor.py:28-100) that decides
whether each OCR line CONTINUES the previous paragraph. XGBoost and the
hub model are absent here, so this is the same decision as a small
logistic model over the same feature families, computed from the PDF
text layer's line geometry (our reader carries x/y/size per line, the
analogue of the OCR bboxes). Weights are trained offline on a synthetic
layout corpus (scripts/train_paragraph.py regenerates; held-out accuracy
is asserted >= 0.95 in tests, the reference's quality-bar style) and
committed below so inference is dependency-free and deterministic.

Lines classified as continuations are merged into their paragraph's
first line BEFORE annotation synthesis, so downstream (structure tree,
spans) sees one line per paragraph — the same effect the reference
achieves by patching ``can_be_multiline`` ahead of tree construction.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

#: grouped line tuple shape shared with readers/pdf.py: (x, y, font, size, text)
_SENTENCE_END = (".", "!", "?", ":", ";")

PARA_FEATURE_NAMES = (
    "indent_delta",      # x - column x0, in tenths of pt (paragraph indent)
    "gap_ratio",         # baseline gap to prev line / median gap
    "first_in_column",
    "starts_upper",
    "starts_lower",
    "prev_ends_sentence",
    "prev_short",        # prev line shorter than 60% of the median length
    "size_delta",        # font-size delta vs column median
)

# scripts/train_paragraph.py output (seed 0): held-out acc 0.9936
_PARA_W = [6.29970, 12.88711, 7.19163, 1.84883, -9.37604, -0.41190, -0.12232, 2.24832]
_PARA_B = -7.52721


def para_features(lines: Sequence[Tuple[float, float, str, float, str]]) -> np.ndarray:
    """Feature matrix (n_lines × 8) for one column's grouped lines."""
    n = len(lines)
    x = np.array([ln[0] for ln in lines], dtype=np.float64)
    y = np.array([ln[1] for ln in lines], dtype=np.float64)
    size = np.array([ln[3] for ln in lines], dtype=np.float64)
    texts = [ln[4] for ln in lines]
    lens = np.array([len(t) for t in texts], dtype=np.float64)

    gaps = np.zeros(n)
    if n > 1:
        gaps[1:] = y[:-1] - y[1:]
        median_gap = float(np.median(gaps[1:])) or 1.0
    else:
        median_gap = 1.0
    gap_ratio = np.where(np.arange(n) == 0, 1.0, gaps / max(median_gap, 1e-6))

    feats = np.zeros((n, len(PARA_FEATURE_NAMES)))
    feats[:, 0] = np.clip((x - x.min()) / 10.0, 0.0, 5.0)
    feats[:, 1] = np.clip(gap_ratio, 0.0, 4.0)
    feats[0, 2] = 1.0
    feats[:, 3] = [bool(t[:1].isupper()) for t in texts]
    feats[:, 4] = [bool(t[:1].islower()) for t in texts]
    prev_end = [True] + [t.rstrip().endswith(_SENTENCE_END) for t in texts[:-1]]
    feats[:, 5] = prev_end
    median_len = float(np.median(lens)) or 1.0
    prev_short = np.zeros(n, bool)
    if n > 1:
        prev_short[1:] = lens[:-1] < 0.6 * median_len
    feats[:, 6] = prev_short
    feats[:, 7] = np.clip(size - np.median(size), -3.0, 3.0)
    return feats


class ParagraphClassifier:
    """is-paragraph-start decision per line (line 0 is forced start)."""

    def __init__(self) -> None:
        self.W = np.array(_PARA_W)
        self.b = _PARA_B

    def predict_starts(self, lines: Sequence[tuple]) -> np.ndarray:
        if not lines:
            return np.zeros(0, bool)
        starts = (para_features(lines) @ self.W + self.b) > 0
        starts[0] = True
        return starts


def merge_paragraph_lines(
    grouped: List[Tuple[float, float, str, float, str]],
    classifier: ParagraphClassifier = None,
) -> List[Tuple[float, float, str, float, str]]:
    """Merge continuation lines into their paragraph's first line
    (space-joined, keeping the start line's geometry)."""
    if len(grouped) < 2:
        return list(grouped)
    starts = (classifier or ParagraphClassifier()).predict_starts(grouped)
    out: List[Tuple[float, float, str, float, str]] = []
    for ln, is_start in zip(grouped, starts):
        if is_start or not out:
            out.append(ln)
        else:
            x, y, font, size, text = out[-1][:5]
            # merged lines drop per-run spans (offsets no longer valid)
            out[-1] = (x, y, font, size, text + " " + ln[4])
    return out
