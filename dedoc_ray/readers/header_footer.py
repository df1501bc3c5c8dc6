"""Cross-page header/footer removal — per-document aggregation (no shuffle).

Reference: dedoc/readers/pdf_reader/utils/header_footers_analysis.py:84-155 —
score the first/last ``max_slice`` lines of every page across page pairs;
lines matching a popular pattern (same text up to varying digits, appearing
on enough pages) are dropped as running headers/footers.

This implementation is deterministic and dependency-free: normalize a
candidate line by masking digit runs (page numbers change per page), count
distinct pages per normalized pattern, and drop candidates whose pattern
covers ≥ ``threshold`` of pages (min 2). Stays inside the per-row kernel —
cross-PAGE, never cross-document (SURVEY.md §2.6)."""

from __future__ import annotations

import re
from typing import Dict, List, Set, Tuple

from dedoc_ray.core.line import LineWithMeta

_DIGITS_RE = re.compile(r"\d+")


def _normalize(text: str) -> str:
    return _DIGITS_RE.sub("@", text.strip().lower())


def remove_headers_footers(
    lines: List[LineWithMeta],
    max_slice: int = 4,
    threshold: float = 0.5,
) -> Tuple[List[LineWithMeta], List[str]]:
    """→ (kept lines, warnings). Only first/last ``max_slice`` lines of each
    page are candidates; patterns must recur on ≥ max(2, threshold·pages)
    pages to be treated as running headers/footers."""
    pages: Dict[int, List[int]] = {}
    for i, line in enumerate(lines):
        pages.setdefault(line.metadata.page_id, []).append(i)
    n_pages = len(pages)
    if n_pages < 2:
        return lines, []

    candidate_idx: List[int] = []
    for idxs in pages.values():
        candidate_idx.extend(idxs[:max_slice])
        candidate_idx.extend(idxs[-max_slice:])
    candidate_set = set(candidate_idx)

    pattern_pages: Dict[str, Set[int]] = {}
    for i in candidate_set:
        norm = _normalize(lines[i].line)
        if not norm:
            continue
        pattern_pages.setdefault(norm, set()).add(lines[i].metadata.page_id)

    min_pages = max(2, int(threshold * n_pages))
    popular = {p for p, pg in pattern_pages.items() if len(pg) >= min_pages}
    if not popular:
        return lines, []

    kept = [
        line
        for i, line in enumerate(lines)
        if not (i in candidate_set and _normalize(line.line) in popular)
    ]
    dropped = len(lines) - len(kept)
    return kept, [f"header/footer analysis dropped {dropped} lines ({len(popular)} patterns)"]
