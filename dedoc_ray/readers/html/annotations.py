"""Inline tag / style-attribute annotation extraction.

Replicates dedoc/readers/html_reader/html_tag_annotation_parser.py:19-128:
recursive walk over the tag subtree accumulating character offsets; only
``TEXT_TAGS`` subtrees contribute length (a quirk kept for parity); ``style``
attribute parsing covers font-style/weight/size, text-align, font-family and
display:none.
"""

from __future__ import annotations

from typing import List, Tuple

from dedoc_ray.core.annotation import Annotation, AnnotationNames as AN
from dedoc_ray.readers.html import tags as T
from dedoc_ray.readers.html.dom import HtmlNode


def parse_tag_annotations(tag: HtmlNode) -> List[Annotation]:
    _, annotations = _walk(tag, 0)
    return annotations


def _walk(tag: HtmlNode, start: int) -> Tuple[int, List[Annotation]]:
    if tag.is_text:
        return len(tag.text), []
    if not tag.is_element or tag.name not in T.TEXT_TAGS:
        return 0, []

    annotations: List[Annotation] = []
    curr_len = 0
    for sub in tag.children:
        part_len, part_annotations = _walk(sub, start + curr_len)
        annotations.extend(part_annotations)
        curr_len += part_len

    annotations.extend(_tag_annotations(tag, start, start + curr_len))

    style = tag.attrs.get("style")
    if style is not None:
        annotations.extend(parse_style_string(style, start, start + curr_len))

    return curr_len, annotations


def _tag_annotations(tag: HtmlNode, start: int, end: int) -> List[Annotation]:
    name = tag.name
    if name in T.BOLD_TAGS:
        return [Annotation(start, end, AN.bold, "True")]
    if name in T.ITALIC_TAGS:
        return [Annotation(start, end, AN.italic, "True")]
    if name in T.UNDERLINED_TAGS:
        return [Annotation(start, end, AN.underlined, "True")]
    if name in T.SUPERSCRIPT_TAGS:
        return [Annotation(start, end, AN.superscript, "True")]
    if name in T.SUBSCRIPT_TAGS:
        return [Annotation(start, end, AN.subscript, "True")]
    if name in T.LINK_TAGS:
        return [Annotation(start, end, AN.linked_text, tag.attrs.get("href", ""))]
    if name in T.STRIKE_TAGS:
        return [Annotation(start, end, AN.strike, "True")]
    return []


def parse_style_string(styles_string: str, start: int, end: int) -> List[Annotation]:
    annotations: List[Annotation] = []
    for st in styles_string.split(";"):
        st = st.strip()
        if not st:
            continue
        pair = st.split(":")
        if len(pair) != 2:
            continue
        key, value = pair
        value = value.strip()
        a = _style_annotation(key, value, start, end)
        if a is not None:
            annotations.append(a)
    return annotations


def _style_annotation(key: str, value: str, start: int, end: int):
    if key == "font-style":
        return Annotation(start, end, AN.italic, "True") if value == "italic" else None
    if key == "font-weight":
        return Annotation(start, end, AN.bold, "True") if value == "bold" else None
    if key == "font-size":
        size = _parse_font_size(value)
        return Annotation(start, end, AN.size, size) if size is not None else None
    if key == "text-align":
        if value in AN.ALIGNMENT_VALID:
            return Annotation(start, end, AN.alignment, value)
        if value in ("start", "end"):
            return Annotation(start, end, AN.alignment, "left")
        return None
    if key == "font-family":
        return Annotation(start, end, AN.style, value)
    if key == "display":
        return Annotation(start, end, AN.style, "hidden") if value in ("none", "hidden") else None
    return None


def _parse_font_size(value: str):
    if value.endswith("pt"):
        return value[:-2]
    if value.endswith("px"):
        try:
            return str(float(value[:-2]) / 0.75)
        except ValueError:
            return None
    try:
        return str(float(value))
    except ValueError:
        return None
