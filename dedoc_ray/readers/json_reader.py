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


def _field_paths(html_fields) -> List[List[str]]:
    """Normalize ``html_fields`` to key paths: accepts a JSON string
    ('[["a","b"],["c"]]' — the reference wire form, json_reader.py:41-46),
    a list of strings, or a list of key lists."""
    if isinstance(html_fields, (str, bytes)):
        try:
            html_fields = json.loads(html_fields or "[]")
        except (json.JSONDecodeError, ValueError) as e:
            raise BadFileError(f"can't read html_fields: {e}") from e
    paths: List[List[str]] = []
    for field in html_fields or []:
        paths.append([field] if isinstance(field, str) else [str(k) for k in field])
    return paths


def _value_at(data, keys: List[str]):
    for key in keys:
        if not isinstance(data, dict) or key not in data:
            return None
        data = data[key]
    return data


def _exclude_key(data, keys: List[str]) -> None:
    """Tolerant variant of the reference's __exclude_key
    (json_reader.py:73-85): remove the leaf and prune emptied parents;
    missing keys are ignored (invalid html_fields must not fail the parse —
    test_api_misc_with_attachments.test_json_invalid_html_fields)."""
    parents = []
    node = data
    for key in keys[:-1]:
        if not isinstance(node, dict) or key not in node:
            return
        parents.append((node, key))
        node = node[key]
    if isinstance(node, dict) and keys[-1] in node:
        del node[keys[-1]]
        for parent, key in reversed(parents):
            if not parent[key]:
                del parent[key]


def read_json(data: bytes, html_fields=None) -> UnstructuredDoc:
    """``html_fields``: key paths whose string values become ATTACHED .html
    files (named ``json.dumps(keys) + ".html"``) and are excluded from the
    parsed json — reference json_reader.py:41-48 +
    json_attachment_extractor.py:45-60. The parent document's lines carry
    only the remaining json."""
    try:
        json_data = json.loads(data.decode("utf-8", errors="replace"))
    except (json.JSONDecodeError, ValueError) as e:
        raise BadFileError(f"invalid json: {e}") from e

    attachments: List[tuple] = []
    if html_fields and isinstance(json_data, dict):
        for keys in _field_paths(html_fields):
            value = _value_at(json_data, keys)
            if not isinstance(value, str):
                continue
            name = json.dumps(keys, ensure_ascii=False) + ".html"
            payload = value.encode("utf-8")
            attachments.append((name, len(payload), payload))
            _exclude_key(json_data, keys)

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

    return UnstructuredDoc(lines=result, attachments=attachments)
