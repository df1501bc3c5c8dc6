"""Hierarchy level of a document line.

Total order matches the reference (dedoc/data_structures/hierarchy_level.py:
29-53, ordering 58-94): compare (level_1, level_2) lexicographically with
``None`` treated as +infinity. Synthetic "list" nodes use a float level_2
(reference tree_constructor.py:94-99 uses ``level_2 - 0.5``), so level_2 is
int-or-float here.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

_INF = float("inf")

Num = Union[int, float]


class HierarchyLevel:
    root = "root"
    toc = "toc"
    header = "header"
    toc_item = "toc_item"
    list = "list"  # noqa: A003
    list_item = "list_item"
    bullet_list_item = "bullet_list_item"
    raw_text = "raw_text"
    footer = "footer"
    page_id = "page_id"
    unknown = "unknown"

    __slots__ = ("level_1", "level_2", "can_be_multiline", "line_type")

    def __init__(self, level_1: Optional[Num], level_2: Optional[Num], can_be_multiline: bool, line_type: str) -> None:
        assert level_1 is None or level_1 >= 0
        assert level_2 is None or level_2 >= 0
        self.level_1 = level_1
        self.level_2 = level_2
        self.can_be_multiline = can_be_multiline
        self.line_type = line_type

    def _key(self) -> Tuple[float, float]:
        return (
            _INF if self.level_1 is None else self.level_1,
            _INF if self.level_2 is None else self.level_2,
        )

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, HierarchyLevel):
            return False
        return self._key() == other._key()

    def __lt__(self, other: "HierarchyLevel") -> bool:
        return self._key() < other._key()

    def __le__(self, other: "HierarchyLevel") -> bool:
        return self._key() <= other._key()

    def __gt__(self, other: "HierarchyLevel") -> bool:
        return self._key() > other._key()

    def __ge__(self, other: "HierarchyLevel") -> bool:
        return self._key() >= other._key()

    def __repr__(self) -> str:
        return f"HL({self.level_1},{self.level_2},{self.can_be_multiline},{self.line_type})"

    def is_raw_text(self) -> bool:
        return self.line_type == HierarchyLevel.raw_text

    def is_unknown(self) -> bool:
        return self.line_type == HierarchyLevel.unknown

    def is_list_item(self) -> bool:
        return self.line_type == HierarchyLevel.list_item

    @staticmethod
    def create_raw_text() -> "HierarchyLevel":
        return HierarchyLevel(None, None, True, HierarchyLevel.raw_text)

    @staticmethod
    def create_unknown() -> "HierarchyLevel":
        return HierarchyLevel(None, None, True, HierarchyLevel.unknown)

    @staticmethod
    def create_root() -> "HierarchyLevel":
        return HierarchyLevel(0, 0, True, HierarchyLevel.root)
