"""Line ↔ page-object (table) as-of linking.

Reference parity: dedoc/readers/pdf_reader/utils/line_object_linker.py
:17-127 — each table is annotated onto its closest text line, considering
up to ``n_lines`` candidates before and after the object in document order,
same-page lines preferred, with the reference's text bonuses ("table "/
"таблица " prefix attracts the link, empty lines repel it). Our corpus rows
carry no pixel bboxes (born-digital path), so "distance" is document-order
distance — the same ordering the reference sorts on (``o.order``) before
its bbox refinement.

Intra-document, no shuffle: runs inside the extraction kernel's row loop.
"""

from __future__ import annotations

from typing import List

from dedoc_ray.core.annotation import Annotation, AnnotationNames as AN
from dedoc_ray.core.line import LineWithMeta
from dedoc_ray.core.table import Table

_N_LINES = 5  # reference LineObjectLinker.n_lines


def _link_score(line: LineWithMeta, idx: int, anchor: float) -> float:
    score = abs(idx - anchor)
    text = line.line.lower().strip()
    if not text:
        score += 0.5
    elif text.startswith(("таблица ", "таб. ", "table ")):
        score -= 0.5
    return score


def link_line_objects(lines: List[LineWithMeta], tables: List[Table]) -> None:
    """Append a ``table`` annotation (value = table uid) to the best line
    for every table. Mutates ``lines`` in place; no-op without lines."""
    if not lines:
        return
    last_line_of_page = {}
    for i, ln in enumerate(lines):
        last_line_of_page[ln.metadata.page_id] = i

    for table in tables:
        anchor = table.order if table.order is not None else float("inf")
        if (
            isinstance(anchor, int)
            and 0 <= anchor < len(lines)
            and lines[anchor].metadata.page_id != table.page_id
        ):
            # cross-page anchor (top-of-page ruled table → previous page's
            # closing line): the resolved line IS the link target
            ln = lines[anchor]
            ln.annotations.append(Annotation(0, len(ln.line), AN.table, table.uid))
            continue
        same_page = [(i, ln) for i, ln in enumerate(lines) if ln.metadata.page_id == table.page_id]
        if same_page:
            # candidate window: n_lines before + n_lines after the anchor
            before = [(i, ln) for i, ln in same_page if i < anchor][-_N_LINES:]
            after = [(i, ln) for i, ln in same_page if i >= anchor][:_N_LINES]
            cands = before + after or same_page
        else:
            # no line on the object's page: last line of the previous page,
            # else the overall nearest preceding/first line (reference
            # _find_closest_line fallbacks)
            prev = table.page_id - 1
            if prev in last_line_of_page:
                cands = [(last_line_of_page[prev], lines[last_line_of_page[prev]])]
            else:
                cands = [(0, lines[0])]
        best_i, best = min(cands, key=lambda t: _link_score(t[1], t[0], anchor))
        start, end = 0, len(best.line)
        anchor_text = getattr(table, "anchor_text", None)
        if anchor_text:
            # merged multi-column lines: the annotation covers only the
            # fragment the table anchors to (reference bbox-derived span,
            # test_api_module_table_recognizer.test_tables_annotations)
            pos = best.line.find(anchor_text)
            if pos >= 0:
                start, end = pos, pos + len(anchor_text)
        best.annotations.append(Annotation(start, end, AN.table, table.uid))
