"""HTML → lines/tables kernel.

Byte-level reimplementation of the reference HTML path
(dedoc/readers/html_reader/html_reader.py:25-314 with postprocessing from
html_line_postprocessing.py:8-39). Operates directly on the ``html`` bytes of
a corpus row instead of a file path; the uid recipe hashes those bytes, which
equals the reference's hash of its temp-file copy (dedoc_manager.py:102-104,
utils.py:172-181).

Behavioral parity notes (quirks deliberately preserved):

- nested block tags are re-read with default flags, dropping the
  ``handle_invisible_table`` parameter (reference html_reader.py:70);
- annotation offsets only accumulate across ``TEXT_TAGS`` subtrees
  (html_tag_annotation_parser.py:29-30) even though ``get_text`` includes all
  descendants;
- visible tables produce no lines — they are collected separately into
  ``tables`` (html_reader.py:40-43, 63);
- merged-span cells are duplicated by list insertion at DOM indices
  (html_reader.py:256-267);
- generated list prefixes: "1. " / "a) " with alpha radix for index >= 26
  (html_reader.py:138-160).

Deviation: table uids are deterministic (md5 of content hash + table index);
the reference mints uuid4 (table_metadata.py:31) which is non-reproducible.
"""

from __future__ import annotations

import hashlib
import string
from typing import List, Optional

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.html import tags as T
from dedoc_ray.readers.html.annotations import parse_tag_annotations
from dedoc_ray.readers.html.dom import DOCUMENT, HtmlNode, parse_html


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def read_html(data: bytes, handle_invisible_table: bool = False) -> UnstructuredDoc:
    """Full HTML read: block walk + visible-table collection + postprocess."""
    filepath_hash = hashlib.md5(data).hexdigest()
    root = parse_html(data)
    lines = _read_blocks(root, filepath_hash, handle_invisible_table=handle_invisible_table)
    tables = []
    for idx, table_tag in enumerate(root.find_all("table")):
        if _visible_table(table_tag, handle_invisible_table=handle_invisible_table):
            tables.append(_read_table(table_tag, filepath_hash, uid=f"{filepath_hash}_table_{idx}"))
    doc = UnstructuredDoc(lines=lines, tables=tables)
    _postprocess(doc)
    return doc


# ---------------------------------------------------------------- block walk


def _read_blocks(
    block: HtmlNode,
    filepath_hash: str = "",
    handle_invisible_table: bool = False,
    table: bool = False,
    uid: str = "",
) -> List[LineWithMeta]:
    tag_uid = _md5(filepath_hash + uid + str(block.name))
    if not _is_content_tag(block, handle_invisible_table=handle_invisible_table):
        return []
    lines: List[LineWithMeta] = []
    for child in block.children:
        lines.extend(
            _handle_block(child, filepath_hash=filepath_hash, handle_invisible_table=handle_invisible_table, table=table, uid=tag_uid)
        )
    return lines


def _handle_block(
    tag: HtmlNode,
    filepath_hash: str,
    handle_invisible_table: bool,
    table: bool = False,
    uid: str = "",
) -> List[LineWithMeta]:
    tag_uid = _md5(uid + str(tag.name))
    if not _is_content_tag(tag, handle_invisible_table=handle_invisible_table):
        block_lines: List[LineWithMeta] = []
    elif tag.is_element and tag.name == "table" and not _visible_table(tag, handle_invisible_table=handle_invisible_table):
        block_lines = _handle_invisible_table(tag, filepath_hash=filepath_hash, uid=tag_uid)
    elif tag.is_text:
        block_lines = _handle_text_line(tag.text, filepath_hash=filepath_hash, uid=tag_uid)
    elif tag.name not in T.AVAILABLE_TAGS:
        block_lines = []
    elif tag.name in T.SPECIAL_SYMBOL_TAGS:
        block_lines = _handle_text_line(T.SPECIAL_SYMBOL_TAGS[tag.name], filepath_hash=filepath_hash, uid=tag_uid, ignore_space=False)
    elif tag.name in T.BLOCK_TAGS:
        # nested blocks are re-read with default flags (reference html_reader.py:70)
        block_lines = _read_blocks(tag, filepath_hash=filepath_hash, uid=tag_uid)
    elif tag.name in T.LIST_TAGS:
        block_lines = _read_list(tag, uid=tag_uid, filepath_hash=filepath_hash, handle_invisible_table=handle_invisible_table)
    else:
        block_lines = _handle_single_tag(tag, filepath_hash=filepath_hash, uid=tag_uid, table=table)
    for line in block_lines:
        if not line.metadata.html_tag:
            line.metadata.html_tag = tag.name
    return block_lines


def _handle_single_tag(tag: HtmlNode, filepath_hash: str, uid: str, table: bool = False) -> List[LineWithMeta]:
    text = _get_text(tag, table)
    if not text or text.isspace():
        return []
    annotations = parse_tag_annotations(tag)
    header_level = int(tag.name[1:]) if tag.name in T.HEADER_TAGS else 0
    line_type = HierarchyLevel.unknown if header_level == 0 else HierarchyLevel.header
    tag_uid = _md5(uid + text)
    line = _make_line(text, line_type, header_level, uid=tag_uid, filepath_hash=filepath_hash, annotations=annotations)
    line.metadata.html_tag = tag.name
    return [line]


def _handle_text_line(block: str, filepath_hash: str, uid: str, ignore_space: bool = True) -> List[LineWithMeta]:
    if not block.strip() and ignore_space:
        return []
    tag_uid = _md5(uid + block)
    return [_make_line(block, HierarchyLevel.unknown, 0, uid=tag_uid, filepath_hash=filepath_hash)]


def _make_line(
    line: str,
    line_type: str,
    header_level: int = 0,
    uid: str = "",
    filepath_hash: str = "",
    annotations: Optional[List[Annotation]] = None,
) -> LineWithMeta:
    level = None if header_level == 0 else HierarchyLevel(1, header_level, False, line_type=line_type)
    metadata = LineMetadata(page_id=0, line_id=None, tag_hierarchy_level=level)
    return LineWithMeta(line=line, metadata=metadata, annotations=annotations or [], uid=f"{filepath_hash}_{uid}")


def _get_text(tag: HtmlNode, table: bool = False) -> str:
    for br in tag.find_all("br"):
        br.replace_with_text("\n")
    text = tag.get_text() + "\n" if tag.name == "p" and not table else tag.get_text()
    return "" if text is None else text


def _is_content_tag(tag: HtmlNode, handle_invisible_table: bool = False) -> bool:
    if tag.is_element and tag.name in T.SERVICE_TAGS:
        return False
    if tag.is_element and tag.name == "table" and not _visible_table(tag, handle_invisible_table=handle_invisible_table):
        return True
    return not tag.is_doctype and not tag.is_comment


# ---------------------------------------------------------------- lists


def _get_li_header(list_type: str, index: int) -> LineWithMeta:
    end = ") " if list_type in ("a", "A") else ". "
    if list_type == "":
        header = ""
    elif list_type in ("a", "A"):
        alphabet = string.ascii_lowercase if list_type == "a" else string.ascii_uppercase
        header = alphabet[index % len(alphabet)]
        while index >= len(alphabet):
            index = index // len(alphabet) - 1
            header = alphabet[index % len(alphabet)] + header
        header = header + end
    else:
        header = str(index + 1) + end
    metadata = LineMetadata(
        page_id=0, line_id=0, tag_hierarchy_level=HierarchyLevel(2, 1, False, line_type=HierarchyLevel.list_item)
    )
    return LineWithMeta(line=header, metadata=metadata)


def _read_list(lst: HtmlNode, uid: str, filepath_hash: str, handle_invisible_table: bool) -> List[LineWithMeta]:
    tag_uid = _md5(uid + str(lst.name))
    lines: List[LineWithMeta] = []
    list_type = lst.attrs.get("type", "1" if lst.name in T.ORDERED_LIST else "")
    item_index = 0
    for item in lst.children:
        if item.is_element and item.name in T.LIST_ITEMS:
            lines.extend(
                _handle_list_item(
                    item,
                    item_index=item_index,
                    list_type=list_type,
                    filepath_hash=filepath_hash,
                    uid=tag_uid,
                    handle_invisible_table=handle_invisible_table,
                )
            )
            item_index += 1
    return lines


def _handle_list_item(
    item: HtmlNode,
    item_index: int,
    list_type: str,
    filepath_hash: str,
    uid: str,
    handle_invisible_table: bool,
) -> List[LineWithMeta]:
    tag_uid = _md5(uid + str(item.name))
    lines: List[LineWithMeta] = []
    header_line = _get_li_header(list_type=list_type, index=item_index)
    block_lines = _handle_block(item, filepath_hash=filepath_hash, handle_invisible_table=handle_invisible_table, uid=tag_uid)
    hl_depth = header_line.metadata.tag_hierarchy_level.level_1
    for line in block_lines:
        if line.metadata.tag_hierarchy_level.is_unknown():
            header_line = header_line + line
        else:
            # nested list inside this item: flush the accumulated prefix line,
            # deepen the nested line (reference html_reader.py:191-198)
            lines.append(header_line)
            line.metadata.tag_hierarchy_level.level_1 += hl_depth
            header_line = line
    lines.append(header_line)
    return lines


# ---------------------------------------------------------------- tables


def _visible_table(table: HtmlNode, handle_invisible_table: bool) -> bool:
    if handle_invisible_table:
        return True
    assert table.name == "table"
    for td in table.find_all("td"):
        style = td.attrs.get("style", "")
        if "border-bottom-style:solid" in style or "border-top-style:solid" in style:
            return True
    return table.attrs.get("border", "0") != "0"


def _handle_invisible_table(block: HtmlNode, filepath_hash: str, uid: str) -> List[LineWithMeta]:
    result = []
    rows = _read_table(block, filepath_hash).cells
    for row in rows:
        text = "\t".join(cell.get_text() for cell in row)
        if text.strip() != "":
            tag_uid = _md5(uid + text)
            result.append(_make_line(text, HierarchyLevel.unknown, uid=tag_uid, filepath_hash=filepath_hash))
    return result


def _clone_cell(el: HtmlNode) -> HtmlNode:
    if el.is_text:
        return HtmlNode(el.kind, text=el.text)
    copy = HtmlNode(el.kind, name=el.name, attrs=dict(el.attrs))
    if el.is_element and el.name in T.TABLE_CELLS:
        copy.hidden = True
        copy.attrs["colspan"] = "1"
        copy.attrs["rowspan"] = "1"
    for child in el.children:
        cloned = _clone_cell(child)
        cloned.parent = copy
        copy.children.append(cloned)
    return copy


def _fix_table(table: HtmlNode) -> List[List[HtmlNode]]:
    table_list: List[List[HtmlNode]] = []
    for row in table.find_all(T.TABLE_ROWS):
        table_list.append(list(row.find_all(T.TABLE_CELLS)))

    # duplicate merged cells; indices refer to the DOM enumeration
    # (reference html_reader.py:256-267)
    for row_index, row in enumerate(table.find_all(T.TABLE_ROWS)):
        for cell_index, cell in enumerate(row.find_all(T.TABLE_CELLS)):
            cell_rowspan = int(cell.attrs.get("rowspan", 1))
            cell_colspan = int(cell.attrs.get("colspan", 1))
            if cell_rowspan > 1 or cell_colspan > 1:
                cell_copy = _clone_cell(cell)
                table_list[row_index][cell_index + 1:cell_index + 1] = [cell_copy] * (cell_colspan - 1)
                for index in range(row_index + 1, row_index + cell_rowspan):
                    if index < len(table_list):
                        table_list[index][cell_index:cell_index] = [cell_copy] * cell_colspan
    return table_list


def _read_table(table: HtmlNode, filepath_hash: str, uid: str = "") -> Table:
    cells_with_meta: List[List[CellWithMeta]] = []
    for row in _fix_table(table):
        row_cells = []
        for cell in row:
            row_cells.append(
                CellWithMeta(
                    lines=_read_blocks(cell, filepath_hash=filepath_hash, handle_invisible_table=False, table=True),
                    colspan=int(cell.attrs.get("colspan", 1)),
                    rowspan=int(cell.attrs.get("rowspan", 1)),
                    invisible=bool(cell.hidden),
                )
            )
        cells_with_meta.append(row_cells)
    return Table(cells=cells_with_meta, page_id=0, uid=uid)


# ---------------------------------------------------------------- postprocess


def _postprocess(doc: UnstructuredDoc) -> None:
    """Newline appending + NBSP fix + line_id assignment
    (reference html_line_postprocessing.py:15-39)."""
    lines = doc.lines
    for line, next_line in zip(lines[:-1], lines[1:]):
        if not line.line.endswith("\n") and next_line.metadata.html_tag in T.PARAGRAPHS:
            line.line = line.line + "\n"
    for line in lines:
        line.line = line.line.replace("\xa0", " ")
    for line_id, line in enumerate(lines):
        line.metadata.line_id = line_id
