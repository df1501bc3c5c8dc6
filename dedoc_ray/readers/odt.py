"""ODT (OpenDocument Text) kernel — native reader.

The reference handles .odt by shelling out to soffice and re-reading the
resulting DOCX (converters/concrete_converters/docx_converter.py:8); that
binary is absent here, so this is a NATIVE OpenDocument parser producing
the same line/table IR the docx reader yields: text:h → header lines with
outline-level hierarchy, text:p → paragraphs, text:list → list items with
synthesized bullet/number prefixes, table:table → Table grids, meta.xml →
document metadata columns.
"""

from __future__ import annotations

import zipfile
from typing import Dict, List, Optional
from xml.etree import ElementTree

from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.office import BadOfficeFile, _open_zip, _xml

TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
OFFICE = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
XLINK = "{http://www.w3.org/1999/xlink}"
META = "{urn:oasis:names:tc:opendocument:xmlns:meta:1.0}"
DC = "{http://purl.org/dc/elements/1.1/}"
STYLE = "{urn:oasis:names:tc:opendocument:xmlns:style:1.0}"
FO = "{urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0}"

ODT_MIMETYPE = b"application/vnd.oasis.opendocument.text"


def _odt_text_styles(*roots: Optional[ElementTree.Element]) -> Dict[str, Dict[str, str]]:
    """style:style → run-property dict from style:text-properties
    (content.xml automatic styles + styles.xml): fo:font-weight/-style,
    underline/line-through, style:text-position super/sub, fo:font-size."""
    out: Dict[str, Dict[str, str]] = {}
    for root in roots:
        if root is None:
            continue
        for style in root.iter(f"{STYLE}style"):
            name = style.get(f"{STYLE}name")
            tp = style.find(f"{STYLE}text-properties")
            if not name or tp is None:
                continue
            props: Dict[str, str] = {}
            if tp.get(f"{FO}font-weight") == "bold":
                props["bold"] = "True"
            if tp.get(f"{FO}font-style") == "italic":
                props["italic"] = "True"
            under = tp.get(f"{STYLE}text-underline-style")
            if under and under != "none":
                props["underlined"] = "True"
            through = tp.get(f"{STYLE}text-line-through-style")
            if through and through != "none":
                props["strike"] = "True"
            position = tp.get(f"{STYLE}text-position", "")
            if position.startswith("super"):
                props["superscript"] = "True"
            elif position.startswith("sub"):
                props["subscript"] = "True"
            size = tp.get(f"{FO}font-size")
            if size and size.endswith("pt"):
                props["size"] = str(float(size[:-2]))
            if props:
                out[name] = props
    return out


def _element_text(el: ElementTree.Element,
                  styles: Optional[Dict[str, Dict[str, str]]] = None,
                  annotations: Optional[List] = None) -> str:
    """Flatten one paragraph-level element: tabs/line-breaks/spaces expand
    per the ODF spec (text:tab, text:line-break, text:s). With ``styles``
    and ``annotations`` given, styled text:span runs emit bold/italic/
    underlined/strike/superscript/subscript/size annotation spans."""
    from dedoc_ray.core.annotation import Annotation

    parts: List[str] = []
    length = [0]

    def emit(s: str) -> None:
        parts.append(s)
        length[0] += len(s)

    def walk(e: ElementTree.Element) -> None:
        span_start = length[0]
        if e.tag == f"{TEXT}tab":
            emit("\t")
        elif e.tag == f"{TEXT}line-break":
            emit("\n")
        elif e.tag == f"{TEXT}s":
            emit(" " * int(e.get(f"{TEXT}c", "1")))
        if e.text:
            emit(e.text)
        for child in e:
            walk(child)
            if child.tail:
                emit(child.tail)
        if annotations is not None and styles and e.tag == f"{TEXT}span":
            props = styles.get(e.get(f"{TEXT}style-name", ""), {})
            for name, value in props.items():
                if span_start < length[0]:
                    annotations.append(Annotation(span_start, length[0], name, value))

    walk(el)
    return "".join(parts)


def _odt_metadata(zf: zipfile.ZipFile) -> Dict[str, str]:
    meta = {"title": "", "author": "", "created": "", "modified": "", "subject": ""}
    try:
        root = _xml(zf, "meta.xml")
    except BadOfficeFile:
        return meta
    if root is None:
        return meta
    body = root.find(f"{OFFICE}meta")
    if body is None:
        return meta
    for tag, key in (
        (f"{DC}title", "title"),
        (f"{META}initial-creator", "author"),
        (f"{DC}creator", "author"),
        (f"{DC}subject", "subject"),
        (f"{META}creation-date", "created"),
        (f"{DC}date", "modified"),
    ):
        el = body.find(tag)
        if el is not None and el.text and not meta[key]:
            meta[key] = el.text
    return meta


def _read_list(el: ElementTree.Element, lines: List[LineWithMeta], line_id: List[int], depth: int) -> None:
    """text:list → one list_item line per text:list-item with a synthesized
    dotted-number prefix (ODF numbering lives in styles; the common default
    is decimal — matching the reference's converted-docx output for simple
    generated lists)."""
    counter = 0
    for item in el.findall(f"{TEXT}list-item"):
        counter += 1
        sublists: List[ElementTree.Element] = []
        texts: List[str] = []
        for child in item:
            if child.tag == f"{TEXT}list":
                sublists.append(child)
            elif child.tag in (f"{TEXT}p", f"{TEXT}h"):
                texts.append(_element_text(child))
        if texts:
            hl = HierarchyLevel(2, depth, False, HierarchyLevel.list_item)
            lines.append(
                LineWithMeta(
                    f"{counter}. " + " ".join(texts) + "\n",
                    metadata=LineMetadata(page_id=0, line_id=line_id[0], tag_hierarchy_level=hl),
                )
            )
            line_id[0] += 1
        for sub in sublists:
            _read_list(sub, lines, line_id, depth + 1)


def _read_table(el: ElementTree.Element, page_id: int, uid: str) -> Table:
    grid: List[List[CellWithMeta]] = []
    for tr in el.findall(f"{TABLE}table-row"):
        row: List[CellWithMeta] = []
        for tc in tr.findall(f"{TABLE}table-cell"):
            colspan = int(tc.get(f"{TABLE}number-columns-spanned", "1"))
            text = "\n".join(_element_text(p) for p in tc.findall(f"{TEXT}p")).strip("\n")
            cell = CellWithMeta([LineWithMeta(text)] if text else [], colspan=colspan, rowspan=1)
            row.append(cell)
            for _ in range(colspan - 1):
                row.append(CellWithMeta(list(cell.lines), colspan, 1, invisible=True))
        grid.append(row)
    return Table(grid, page_id=page_id, uid=uid)


def read_odt(data: bytes) -> UnstructuredDoc:
    zf = _open_zip(data)
    root = _xml(zf, "content.xml")
    if root is None:
        raise BadOfficeFile("no content.xml")
    body = root.find(f"{OFFICE}body")
    text_el = body.find(f"{OFFICE}text") if body is not None else None
    if text_el is None:
        raise BadOfficeFile("no office:text body")
    try:
        styles_root = _xml(zf, "styles.xml")
    except BadOfficeFile:
        styles_root = None
    text_styles = _odt_text_styles(root, styles_root)
    lines: List[LineWithMeta] = []
    tables: List[Table] = []
    line_id = [0]
    # Pictures referenced by draw:image, numbered in DOCUMENT order — the
    # observable contract of the reference's soffice odt→docx conversion
    # (word/media/image{N}.jpeg), pinned by
    # test_api_misc_with_images_refs.test_odt_with_images
    from dedoc_ray.core.annotation import Annotation
    from dedoc_ray.readers.base import attachment_uid

    attachments: List[tuple] = []
    href2uid: dict = {}

    def _image_uid(href: str) -> "str | None":
        if href in href2uid:
            return href2uid[href]
        try:
            payload = zf.read(href)
        except KeyError:
            href2uid[href] = None
            return None
        ext = href.rsplit(".", 1)[-1].lower() if "." in href else "png"
        name = f"image{len(attachments) + 1}.{'jpeg' if ext == 'jpg' else ext}"
        attachments.append((name, len(payload), payload))
        href2uid[href] = attachment_uid(name, payload)
        return href2uid[href]

    def _annotate_images(child) -> None:
        uids = [
            uid for img in child.iter(f"{DRAW}image")
            for uid in [_image_uid(img.get(f"{XLINK}href", ""))]
            if uid is not None
        ]
        if not uids:
            return
        # anchor on the last non-empty paragraph (same pop-trailing-empty
        # semantics as the docx route, office.py read_docx)
        while lines and not lines[-1].line.strip():
            lines.pop()
            line_id[0] -= 1
        if lines:
            for uid in uids:
                lines[-1].annotations.append(Annotation(0, len(lines[-1].line), "attachment", uid))

    for child in text_el:
        if child.tag == f"{TEXT}h":
            level = int(child.get(f"{TEXT}outline-level", "1"))
            hl = HierarchyLevel(1, level, False, HierarchyLevel.header)
            anns: List = []
            text = _element_text(child, text_styles, anns)
            lines.append(
                LineWithMeta(
                    text + "\n", annotations=anns,
                    metadata=LineMetadata(page_id=0, line_id=line_id[0], tag_hierarchy_level=hl),
                )
            )
            line_id[0] += 1
        elif child.tag == f"{TEXT}p":
            anns = []
            text = _element_text(child, text_styles, anns)
            lines.append(
                LineWithMeta(
                    text + "\n", annotations=anns,
                    metadata=LineMetadata(page_id=0, line_id=line_id[0]),
                )
            )
            line_id[0] += 1
            _annotate_images(child)
        elif child.tag == f"{TEXT}list":
            _read_list(child, lines, line_id, depth=1)
        elif child.tag == f"{TABLE}table":
            tbl = _read_table(child, page_id=0, uid=f"table_{len(tables)}")
            tbl.order = line_id[0]
            tables.append(tbl)
    return UnstructuredDoc(
        lines=lines, tables=tables, metadata=_odt_metadata(zf), attachments=attachments
    )


# ------------------------------------------------------------- ODS / ODP
#
# The reference converts .ods → .xlsx and .odp → .pptx through soffice
# (converters/concrete_converters/excel_converter.py:8, pptx_converter.py:8);
# these native parsers produce the same IR the xlsx/pptx readers yield.

DRAW = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"

ODS_MIMETYPE = b"application/vnd.oasis.opendocument.spreadsheet"
ODP_MIMETYPE = b"application/vnd.oasis.opendocument.presentation"


def _ods_cell_text(tc: ElementTree.Element) -> str:
    # numeric cells render from office:value with xlrd-style float text
    # ("1" → "1.0", locale-free "6.28") — the reference converts ods →
    # xlsx via soffice and reads through xlrd, so display text (which may
    # carry locale commas) is not what it extracts
    val = tc.get(f"{OFFICE}value")
    if val is not None and tc.get(f"{OFFICE}value-type") in ("float", "percentage", "currency"):
        try:
            return str(float(val))
        except ValueError:
            pass
    ps = tc.findall(f"{TEXT}p")
    if ps:
        return "\n".join(_element_text(p) for p in ps).strip("\n")
    return val if val is not None else ""


def read_ods(data: bytes) -> UnstructuredDoc:
    """OpenDocument spreadsheet → one Table per sheet (page_id = sheet
    index), mirroring read_xlsx. Handles table:number-columns-repeated /
    number-rows-repeated (trailing empty repeats trimmed) and covered
    cells from column spans."""
    zf = _open_zip(data)
    root = _xml(zf, "content.xml")
    if root is None:
        raise BadOfficeFile("no content.xml")
    body = root.find(f"{OFFICE}body")
    ss = body.find(f"{OFFICE}spreadsheet") if body is not None else None
    if ss is None:
        raise BadOfficeFile("no office:spreadsheet body")
    tables: List[Table] = []
    for sheet_idx, tbl_el in enumerate(ss.findall(f"{TABLE}table")):
        grid: List[List[CellWithMeta]] = []
        pending_rows = 0  # empty-row repeats held until real content follows
        for tr in tbl_el.findall(f"{TABLE}table-row"):
            row: List[CellWithMeta] = []
            pending = 0  # empty-cell repeats held until real content follows
            for tc in tr:
                if tc.tag not in (f"{TABLE}table-cell", f"{TABLE}covered-table-cell"):
                    continue
                repeat = int(tc.get(f"{TABLE}number-columns-repeated", "1"))
                text = "" if tc.tag == f"{TABLE}covered-table-cell" else _ods_cell_text(tc)
                colspan = int(tc.get(f"{TABLE}number-columns-spanned", "1"))
                if not text:
                    # hold — only materialize if a non-empty cell follows, so
                    # mid-row gaps keep columns aligned while the 16k-column
                    # filler ODF writers pad rows with is still dropped
                    pending += repeat
                    continue
                row.extend(CellWithMeta([]) for _ in range(pending))
                pending = 0
                for _ in range(repeat):
                    row.append(CellWithMeta([LineWithMeta(text)], colspan=colspan, rowspan=1))
            row_repeat = int(tr.get(f"{TABLE}number-rows-repeated", "1"))
            if not row:
                pending_rows += row_repeat  # blank row run: flush only if content follows
                continue
            for _ in range(pending_rows):
                grid.append([])
            pending_rows = 0
            for _ in range(row_repeat):
                grid.append([CellWithMeta(list(c.lines), c.colspan, c.rowspan) for c in row])
        if grid:
            width = max(len(r) for r in grid)
            for r in grid:  # rectangularize (reference pads via soffice→xlsx grid)
                r.extend(CellWithMeta([]) for _ in range(width - len(r)))
            tables.append(Table(grid, page_id=sheet_idx, uid=f"sheet_{sheet_idx}"))
    return UnstructuredDoc(lines=[], tables=tables, metadata=_odt_metadata(zf))


def read_odp(data: bytes) -> UnstructuredDoc:
    """OpenDocument presentation → lines per draw:page (page_id = slide
    index); the first text frame of each page is the title (header line),
    the rest are paragraphs — mirroring read_pptx."""
    zf = _open_zip(data)
    root = _xml(zf, "content.xml")
    if root is None:
        raise BadOfficeFile("no content.xml")
    body = root.find(f"{OFFICE}body")
    pres = body.find(f"{OFFICE}presentation") if body is not None else None
    if pres is None:
        raise BadOfficeFile("no office:presentation body")
    lines: List[LineWithMeta] = []
    tables: List[Table] = []
    line_id = 0
    for page_idx, page in enumerate(pres.findall(f"{DRAW}page")):
        first = True
        for frame in page.findall(f"{DRAW}frame"):
            tb = frame.find(f"{DRAW}text-box")
            tbl = frame.find(f"{TABLE}table")
            if tbl is not None:
                # presentation table — same shape as the pptx path: cell
                # paragraph lines carry "\n", the annotation lands on the
                # preceding line (pptx_reader.py:100-109 semantics)
                import hashlib

                from dedoc_ray.core.annotation import Annotation

                table = _read_presentation_table(tbl, page_idx, hashlib.md5(ElementTree.tostring(tbl)).hexdigest())
                table.order = len(lines)
                if not lines:
                    lines.append(LineWithMeta("", metadata=LineMetadata(page_id=page_idx, line_id=0)))
                lines[-1].annotations.append(Annotation(0, len(lines[-1].line), "table", table.uid))
                tables.append(table)
                continue
            if tb is None:
                continue
            for p in tb.findall(f"{TEXT}p"):
                text = _element_text(p)
                if not text:
                    continue
                if first:
                    hl = HierarchyLevel(1, 1, False, HierarchyLevel.header)
                    md = LineMetadata(page_id=page_idx, line_id=line_id, tag_hierarchy_level=hl)
                    first = False
                else:
                    md = LineMetadata(page_id=page_idx, line_id=line_id)
                lines.append(LineWithMeta(text + "\n", metadata=md))
                line_id += 1
    return UnstructuredDoc(lines=lines, tables=tables, metadata=_odt_metadata(zf))


def _read_presentation_table(el: ElementTree.Element, page_id: int, uid: str) -> Table:
    """table:table inside a draw:frame (odp) → Table with pptx cell-line
    semantics (one line per text:p, trailing newline, empty cells bare)."""
    grid: List[List[CellWithMeta]] = []
    for tr in el.findall(f"{TABLE}table-row"):
        row: List[CellWithMeta] = []
        for tc in tr:
            if tc.tag not in (f"{TABLE}table-cell", f"{TABLE}covered-table-cell"):
                continue
            if tc.tag == f"{TABLE}covered-table-cell":
                origin = row[-1] if row else CellWithMeta([])
                row.append(CellWithMeta(origin.lines, colspan=1, rowspan=1, invisible=True))
                continue
            colspan = int(tc.get(f"{TABLE}number-columns-spanned", "1"))
            rowspan = int(tc.get(f"{TABLE}number-rows-spanned", "1"))
            cell_lines = [
                LineWithMeta(_element_text(p) + "\n", metadata=LineMetadata(page_id=page_id, line_id=k))
                for k, p in enumerate(tc.findall(f"{TEXT}p"))
                if _element_text(p)
            ]
            row.append(CellWithMeta(cell_lines, colspan=colspan, rowspan=rowspan))
        grid.append(row)
    return Table(grid, page_id=page_id, uid=uid)
