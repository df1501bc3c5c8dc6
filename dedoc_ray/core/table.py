"""Rectangular tables with merged-cell duplication.

Model matches the reference (dedoc/data_structures/table.py:9-32,
cell_with_meta.py:9-33): row-major grid; merged cells are duplicated with
colspan/rowspan kept on every copy and ``invisible=True`` on the copies.
"""

from __future__ import annotations

from typing import List, Optional  # noqa: F401

from dedoc_ray.core.line import LineWithMeta


class CellWithMeta:
    __slots__ = ("lines", "colspan", "rowspan", "invisible")

    def __init__(self, lines: Optional[List[LineWithMeta]] = None, colspan: int = 1, rowspan: int = 1, invisible: bool = False) -> None:
        self.lines = lines if lines is not None else []
        self.colspan = colspan
        self.rowspan = rowspan
        self.invisible = invisible

    def get_text(self) -> str:
        return "\n".join(line.line for line in self.lines)


class Table:
    __slots__ = ("cells", "page_id", "uid", "order", "ruled", "anchor_text")

    def __init__(
        self,
        cells: List[List[CellWithMeta]],
        page_id: int = 0,
        uid: str = "",
        order: Optional[int] = None,
        ruled: bool = False,
    ) -> None:
        self.cells = cells
        self.page_id = page_id
        self.uid = uid
        # document-order anchor (index into the line stream where the table
        # appeared) — consumed by core.object_linker; None = end of page
        self.order = order
        # derived from drawn cell borders (readers/pdf_rules.py) — exempt
        # from the band-heuristic plausibility gate
        self.ruled = ruled
        # the text fragment the table anchors to (narrows the table
        # annotation's span within a merged multi-column line)
        self.anchor_text: Optional[str] = None

    def n_cols(self) -> int:
        return len(self.cells[0]) if self.cells else 0


def merge_multipage_tables(tables: List["Table"]) -> List["Table"]:
    """Merge tables split across page breaks: a table on page p+1 with the
    same column count as one ending on page p continues it (rows appended,
    FIRST uid kept — reference multipage_table_extractor.py semantics,
    called at pdf_base_reader.py:140; bbox touch tests degrade to the
    consecutive-page + equal-arity rule for born-digital rows)."""
    out: List[Table] = []
    for t in tables:
        if out and t.page_id == out[-1].page_id + 1 and t.n_cols() == out[-1].n_cols() and t.n_cols() > 0:
            # a continuation that repeats the table HEADER drops the
            # duplicate rows (reference multipage_table_extractor.py:156-161).
            # Header rows are identified by their span structure (merged /
            # shadow cells) — plain identical DATA rows must never be
            # stripped, repeated values are legitimate.
            base = out[-1]

            def _is_header_row(row) -> bool:
                return any(c.colspan > 1 or c.rowspan > 1 or c.invisible for c in row)

            k = 0
            while (
                k < min(len(base.cells), len(t.cells))
                and _is_header_row(base.cells[k])
                and [c.get_text() for c in t.cells[k]] == [c.get_text() for c in base.cells[k]]
            ):
                k += 1
            out[-1].cells.extend(t.cells[k:])
            out[-1].page_id = t.page_id  # table now "ends" on this page, so a
            # further continuation on the next page chains correctly
        else:
            out.append(t)
    return out
