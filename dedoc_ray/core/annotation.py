"""Typed character-span annotations.

Semantics match the reference's annotation model
(dedoc/data_structures/annotation.py:24-39 and
dedoc/data_structures/concrete_annotations/*): an annotation is a
``(start, end, name, value)`` span over a line's text; ``is_mergeable``
controls whether adjacent spans with equal (name, value) may be merged.
Values are stringly typed ("True", "12.0", href strings) like the reference.
"""

from __future__ import annotations


class AnnotationNames:
    """Names of the annotation kinds our kernels emit.

    The full reference taxonomy has 18 kinds
    (dedoc/data_structures/concrete_annotations/); the HTML/txt paths emit
    the subset below. Non-mergeable kinds carry distinct per-span values.
    """

    alignment = "alignment"
    attachment = "attachment"
    bold = "bold"
    indentation = "indentation"
    italic = "italic"
    linked_text = "linked_text"
    size = "size"
    spacing = "spacing"
    strike = "strike"
    style = "style"
    subscript = "subscript"
    superscript = "superscript"
    table = "table"
    underlined = "underlined"
    confidence = "confidence"          # OCR word confidence in [0, 1]
    color = "color_annotation"         # mean ink RGB as a JSON object
    bounding_box = "bounding box"
    reference = "reference"

    # reference: linked_text/attachment/table/reference/bbox/confidence are
    # created with is_mergeable=False; the rest default to True
    NOT_MERGEABLE = frozenset({linked_text, attachment, table, "reference", "bounding box", "confidence"})

    ALIGNMENT_VALID = frozenset({"left", "right", "both", "center"})


class Annotation:
    __slots__ = ("start", "end", "name", "value")

    def __init__(self, start: int, end: int, name: str, value: str) -> None:
        self.start = start
        self.end = end
        self.name = name
        self.value = value

    @property
    def is_mergeable(self) -> bool:
        return self.name not in AnnotationNames.NOT_MERGEABLE

    def shifted(self, offset: int) -> "Annotation":
        return Annotation(self.start + offset, self.end + offset, self.name, self.value)

    def __eq__(self, o: object) -> bool:
        return (
            isinstance(o, Annotation)
            and self.name == o.name
            and self.value == o.value
            and self.start == o.start
            and self.end == o.end
        )

    def __repr__(self) -> str:
        return f"{self.name.capitalize()}({self.start}:{self.end}, {self.value})"
