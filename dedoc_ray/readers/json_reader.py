"""JSON kernel.

Replicates dedoc/readers/json_reader/json_reader.py:22-131: DFS over the
parsed value; dict keys become "key"-type lines (sorted key order, key then
value), list elements become "list_item" lines, nesting depth drives level_1;
flat scalars outside containers become raw_text lines.
"""

from __future__ import annotations

import json
from typing import Any, List

from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.readers.base import UnstructuredDoc


class BadFileError(ValueError):
    pass


def _is_flat(value: Any) -> bool:
    return not isinstance(value, (dict, list))


def _text_of(value: Any) -> str:
    if isinstance(value, (dict, list)) or value is None:
        return ""
    return str(value)


def _make_line(depth: int, value: Any, line_type: str) -> LineWithMeta:
    hl = HierarchyLevel(level_1=depth, level_2=1, can_be_multiline=False, line_type=line_type)
    metadata = LineMetadata(page_id=0, line_id=None, tag_hierarchy_level=hl)
    return LineWithMeta(line=_text_of(value), metadata=metadata)


def read_json(data: bytes, html_fields: List[str] = None) -> UnstructuredDoc:
    """``html_fields``: top-level keys whose string values are parsed as HTML
    documents instead of scalar lines (reference api_args.py:45 +
    json_reader html-field delegation; dotted nested paths degrade to the
    top-level key here)."""
    try:
        json_data = json.loads(data.decode("utf-8", errors="replace"))
    except (json.JSONDecodeError, ValueError) as e:
        raise BadFileError(f"invalid json: {e}") from e

    html_lines: List[LineWithMeta] = []
    if html_fields and isinstance(json_data, dict):
        from dedoc_ray.readers.html import read_html

        for field in html_fields:
            value = json_data.pop(field, None)
            if isinstance(value, str) and value:
                html_lines.extend(read_html(value.encode("utf-8")).lines)

    stack: List = [(json_data, 1)]
    result: List[LineWithMeta] = []
    while stack:
        element, depth = stack.pop()
        if isinstance(element, dict) and element:
            # one sorted key at a time, re-pushing the rest (json_reader.py:102-112)
            key = sorted(element.keys())[0]
            value = element.pop(key)
            result.append(_make_line(depth, key, "key"))
            stack.append((element, depth))
            if value is not None:
                stack.append((value, depth + 1))
        elif isinstance(element, list) and element:
            while element:
                sub = element.pop(0)
                result.append(_make_line(depth, sub, HierarchyLevel.list_item))
                if not _is_flat(sub):
                    stack.append((element, depth))
                    stack.append((sub, depth + 1))
                    break
        elif _is_flat(element):
            result.append(_make_line(depth, str(element), HierarchyLevel.raw_text))

    return UnstructuredDoc(lines=html_lines + result)
