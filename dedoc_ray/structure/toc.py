"""Table-of-contents detection — window scan over a document's lines.

Reference: dedoc/structure_extractors/feature_extractors/toc_feature_extractor.py:26-67
— scan the first pages for runs of lines that end in a page number (dot
leaders or whitespace before the number), require a minimum run length and
ascending page order; matched lines become ``toc_item`` and the heading
immediately before the run becomes ``toc``.

Pure per-document function over LineWithMeta (no shuffle, SURVEY.md §2.6);
opt-in utility — callers mark lines before structure extraction so the
toc/toc_item hierarchy levels flow into the tree.
"""

from __future__ import annotations

import re
from typing import List

from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineWithMeta

_TOC_ITEM_RE = re.compile(r"^(?P<title>.{2,}?)[\s.…]{2,}(?P<page>\d{1,4})\s*$")
_TOC_HEADING_RE = re.compile(r"^\s*(contents|table of contents|toc|содержание|оглавление)\s*$", re.IGNORECASE)


def mark_toc(lines: List[LineWithMeta], min_run: int = 3, max_page_id: int = 2) -> List[LineWithMeta]:
    """Tag toc/toc_item hierarchy levels in place; returns the same list.

    A run of ≥ ``min_run`` consecutive toc-looking lines (within the first
    ``max_page_id`` pages) with non-decreasing page numbers is a TOC; the
    line right before the run is the ``toc`` heading when it names one.
    """
    n = len(lines)
    i = 0
    while i < n:
        line = lines[i]
        if line.metadata.page_id > max_page_id:
            break
        m = _TOC_ITEM_RE.match(line.line.strip())
        if not m:
            i += 1
            continue
        run = [i]
        last_page = int(m.group("page"))
        j = i + 1
        while j < n:
            mj = _TOC_ITEM_RE.match(lines[j].line.strip())
            if not mj:
                break
            page = int(mj.group("page"))
            if page < last_page:
                break
            last_page = page
            run.append(j)
            j += 1
        if len(run) >= min_run:
            for k in run:
                lines[k].metadata.tag_hierarchy_level = HierarchyLevel(1, 2, False, HierarchyLevel.toc_item)
            if i > 0 and _TOC_HEADING_RE.match(lines[i - 1].line.strip()):
                lines[i - 1].metadata.tag_hierarchy_level = HierarchyLevel(1, 1, False, HierarchyLevel.toc)
        i = max(j, i + 1)
    return lines
