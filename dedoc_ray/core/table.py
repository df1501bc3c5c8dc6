"""Rectangular tables with merged-cell duplication.

Model matches the reference (dedoc/data_structures/table.py:9-32,
cell_with_meta.py:9-33): row-major grid; merged cells are duplicated with
colspan/rowspan kept on every copy and ``invisible=True`` on the copies.
"""

from __future__ import annotations

from typing import List, Optional

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
    __slots__ = ("cells", "page_id", "uid")

    def __init__(self, cells: List[List[CellWithMeta]], page_id: int = 0, uid: str = "") -> None:
        self.cells = cells
        self.page_id = page_id
        self.uid = uid
