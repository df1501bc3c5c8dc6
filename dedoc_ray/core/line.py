"""In-kernel line model: LineWithMeta + LineMetadata.

Replicates the reference algebra (dedoc/data_structures/line_with_meta.py:
join 33-54, split 59-82, slicing 84-118, ``__add__`` 162-178) and the
metadata container (dedoc/data_structures/line_metadata.py:27-44 — a ``None``
tag_hierarchy_level is normalized to "unknown").

These objects live only inside a map_batches kernel for one row (document);
they are never shipped through the object store — the Arrow batch schema in
``dedoc_ray.pipeline.schemas`` is the wire format.
"""

from __future__ import annotations

import re
from typing import List, Optional, Union

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.annotation_merger import merge_annotations
from dedoc_ray.core.hierarchy import HierarchyLevel


class LineMetadata:
    __slots__ = ("page_id", "line_id", "tag_hierarchy_level", "hierarchy_level", "html_tag")

    def __init__(
        self,
        page_id: int = 0,
        line_id: Optional[int] = None,
        tag_hierarchy_level: Optional[HierarchyLevel] = None,
        hierarchy_level: Optional[HierarchyLevel] = None,
        html_tag: Optional[str] = None,
    ) -> None:
        self.page_id = page_id
        self.line_id = line_id
        # reference line_metadata.py:39 — None becomes "unknown"
        self.tag_hierarchy_level = HierarchyLevel.create_unknown() if tag_hierarchy_level is None else tag_hierarchy_level
        self.hierarchy_level = hierarchy_level
        self.html_tag = html_tag


class LineWithMeta:
    __slots__ = ("line", "metadata", "annotations", "uid")

    def __init__(
        self,
        line: str,
        metadata: Optional[LineMetadata] = None,
        annotations: Optional[List[Annotation]] = None,
        uid: str = "",
    ) -> None:
        self.line = line
        self.metadata = metadata if metadata is not None else LineMetadata()
        self.annotations = annotations if annotations is not None else []
        self.uid = uid

    def __len__(self) -> int:
        return len(self.line)

    # --- slicing with annotation re-clipping (reference line_with_meta.py:84-118)

    def slice(self, start: int, stop: int) -> "LineWithMeta":
        annotations = []
        for a in self.annotations:
            if start < a.end and stop > a.start:
                annotations.append(Annotation(max(a.start, start) - start, min(a.end, stop) - start, a.name, a.value))
        return LineWithMeta(self.line[start:stop], metadata=self.metadata, annotations=annotations, uid=self.uid)

    # --- split on separator keeping all text (reference line_with_meta.py:59-82)

    def split(self, sep: str) -> List["LineWithMeta"]:
        if not sep:
            raise ValueError("empty separator")
        borders = {0, len(self.line)}
        for m in re.finditer(sep, self.line):
            borders.add(m.end())
        borders_sorted = sorted(borders)
        if len(borders_sorted) <= 2:
            return [self]
        return [self.slice(s, e) for s, e in zip(borders_sorted[:-1], borders_sorted[1:])]

    # --- concatenation with annotation shift + merge (reference line_with_meta.py:162-178)

    def __add__(self, other: Union["LineWithMeta", str]) -> "LineWithMeta":
        if isinstance(other, str):
            if not other:
                return self
            return LineWithMeta(self.line + other, metadata=self.metadata, annotations=self.annotations, uid=self.uid)
        if len(other) == 0:
            return self
        line = self.line + other.line
        shift = len(self)
        annotations = self.annotations + [a.shifted(shift) for a in other.annotations]
        annotations = merge_annotations(annotations, line)
        return LineWithMeta(line, metadata=self.metadata, annotations=annotations, uid=self.uid)

    @staticmethod
    def join(lines: List["LineWithMeta"], delimiter: str = "\n") -> "LineWithMeta":
        if not lines:
            return LineWithMeta("")
        first = lines[0]
        out = LineWithMeta(first.line, metadata=first.metadata, annotations=list(first.annotations), uid=first.uid)
        for nxt in lines[1:]:
            out = out + delimiter
            out = out + nxt
        return out

    def __repr__(self) -> str:
        return f"LineWithMeta({self.line[:60]!r})"
