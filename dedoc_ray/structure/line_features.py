"""Per-line feature extraction for the trained line-type classifiers.

Reference parity target: structure_extractors/feature_extractors/* (law/tz/
diploma + fintoc feature extractors feeding pickled XGBoost models,
abstract_pickled_classifier.py:16-77). Same feature families — keyword/
numbering indicator regexes, case/length statistics, relative document
position — vectorized per document. The models here are small logistic
layers with committed weights (scripts/train_line_types.py) instead of
downloaded XGBoost pickles: deterministic, dependency-free, retrainable.
"""

from __future__ import annotations

import re
from typing import List

import numpy as np

# keyword families, with the abbreviation/case variants the strict skeleton
# regexes in structure/domain.py do NOT match (that robustness is the point
# of the ML layer)
_KW = {
    "part": re.compile(r"^\s*(часть|ч\.|part)\b", re.IGNORECASE),
    "section": re.compile(r"^\s*(раздел|разд\.|section|sec\.)\b", re.IGNORECASE),
    "chapter": re.compile(r"^\s*(глава|гл\.|chapter|chap\.)\b", re.IGNORECASE),
    "article": re.compile(r"^\s*(статья|ст\.|article|art\.)\b", re.IGNORECASE),
    "appendix": re.compile(r"^\s*(приложение|appendix|annex)\b", re.IGNORECASE),
}
_DOTTED_RE = re.compile(r"^\s*(\d+)(\.\d+)*\.?\s")
_BRACKET_RE = re.compile(r"^\s*\d+[)}]")
_BULLET_RE = re.compile(r"^\s*[-*•·]\s")
_ROMAN_RE = re.compile(r"^\s*[IVXLC]+[.)]\s", 0)
_ENDS_PAGE_RE = re.compile(r"\.{2,}\s*\d+\s*$|\s\d{1,4}\s*$")
_NUM_RE = re.compile(r"\d")

FEATURE_NAMES = [
    "kw_part", "kw_section", "kw_chapter", "kw_article", "kw_appendix",
    "dotted_d1", "dotted_d2", "dotted_d3p", "bracket_num", "bullet", "roman",
    "upper_ratio", "title_case", "digit_ratio", "len_short", "len_mid",
    "len_long", "ends_colon", "ends_period", "ends_pagenum", "rel_pos",
    "has_digit_after_kw", "word_count_norm", "starts_upper",
]


def line_features(texts: List[str]) -> np.ndarray:
    """(n_lines, n_features) float matrix for one document's lines."""
    n = len(texts)
    out = np.zeros((n, len(FEATURE_NAMES)), dtype=np.float64)
    for i, raw in enumerate(texts):
        t = raw.rstrip("\n")
        stripped = t.strip()
        f = out[i]
        for j, key in enumerate(("part", "section", "chapter", "article", "appendix")):
            if _KW[key].match(stripped):
                f[j] = 1.0
        m = _DOTTED_RE.match(stripped)
        if m:
            depth = stripped[: m.end()].count(".")
            if depth <= 1:
                f[5] = 1.0
            elif depth == 2:
                f[6] = 1.0
            else:
                f[7] = 1.0
        if _BRACKET_RE.match(stripped):
            f[8] = 1.0
        if _BULLET_RE.match(stripped):
            f[9] = 1.0
        if _ROMAN_RE.match(stripped):
            f[10] = 1.0
        letters = [c for c in stripped if c.isalpha()]
        if letters:
            f[11] = sum(1 for c in letters if c.isupper()) / len(letters)
        words = stripped.split()
        if words:
            f[12] = sum(1 for w in words if w[:1].isupper()) / len(words)
        if stripped:
            f[13] = sum(1 for c in stripped if c.isdigit()) / len(stripped)
        L = len(stripped)
        f[14] = 1.0 if L < 20 else 0.0
        f[15] = 1.0 if 20 <= L < 80 else 0.0
        f[16] = 1.0 if L >= 80 else 0.0
        f[17] = 1.0 if stripped.endswith(":") else 0.0
        f[18] = 1.0 if stripped.endswith(".") else 0.0
        f[19] = 1.0 if _ENDS_PAGE_RE.search(stripped) else 0.0
        f[20] = i / max(n - 1, 1)
        kw_m = next((k.match(stripped) for k in _KW.values() if k.match(stripped)), None)
        if kw_m and _NUM_RE.search(stripped[kw_m.end():kw_m.end() + 8]):
            f[21] = 1.0
        f[22] = min(len(words), 30) / 30.0
        f[23] = 1.0 if stripped[:1].isupper() else 0.0
    return out


# indicator subset carried into the prev/next windows (kw + list flags +
# length classes) — the informative neighbors for line-type decisions
_WINDOW_COLS = list(range(0, 11)) + [14, 15, 16]

#: names for the windowed matrix (line_features_windowed)
WINDOWED_FEATURE_NAMES = (
    FEATURE_NAMES
    + [f"prev_{FEATURE_NAMES[c]}" for c in _WINDOW_COLS]
    + [f"next_{FEATURE_NAMES[c]}" for c in _WINDOW_COLS]
    + ["len_pctile", "words_pctile"]
)


def line_features_windowed(texts: List[str]) -> np.ndarray:
    """Per-line features ⊕ prev/next-line indicator windows ⊕ per-document
    percentile ranks — the reference feature-extractor shape
    (structure_extractors/feature_extractors/abstract_extractor.py:43-91:
    prev_line_features/next_line_features + document-relative quantiles)."""
    base = line_features(texts)
    n = len(texts)
    sub = base[:, _WINDOW_COLS]
    prev = np.zeros_like(sub)
    nxt = np.zeros_like(sub)
    if n > 1:
        prev[1:] = sub[:-1]
        nxt[:-1] = sub[1:]
    lens = np.array([len(t.strip()) for t in texts], dtype=np.float64)
    words = np.array([len(t.split()) for t in texts], dtype=np.float64)

    def pct(v: np.ndarray) -> np.ndarray:
        if n <= 1:
            return np.full(n, 0.5)
        order = v.argsort(kind="stable").argsort(kind="stable")
        return order / (n - 1)

    return np.hstack([base, prev, nxt, pct(lens)[:, None], pct(words)[:, None]])
