"""Office Open XML kernels: docx / xlsx / pptx — stdlib zipfile + ElementTree.

Reference semantics (NOT ports — the reference uses BeautifulSoup/xlrd):

- docx: dedoc/readers/docx_reader/docx_reader.py:8-53 +
  data_structures/docx_document.py:23-175 — paragraphs become lines with a
  tag hierarchy level from the paragraph style ("heading N" → header), runs
  carry bold/italic/underlined annotations, w:tbl becomes a Table with
  gridSpan/vMerge merged-cell duplication (invisible copies, like
  cell_with_meta.py:9-33).
- xlsx: dedoc/readers/excel_reader/excel_reader.py:10-61 — one Table per
  sheet, page_id = sheet index, no lines.
- pptx: dedoc/readers/pptx_reader/pptx_reader.py:12-118 — per slide: first
  text shape is the title (header line), other shapes raw text, a:tbl
  becomes a Table; page_id = slide index.
"""

from __future__ import annotations

import io
import re
import zipfile
from functools import lru_cache
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.readers.base import UnstructuredDoc

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
SHEET_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_HEADING_RE = re.compile(r"heading\s*(\d+)", re.IGNORECASE)
_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


class BadOfficeFile(ValueError):
    pass


def _open_zip(data: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise BadOfficeFile(f"not a zip container: {e}") from e


# Strict OOXML (ISO 29500 Strict) uses purl.oclc.org namespaces where
# Transitional uses schemas.openxmlformats.org; the element vocabulary is
# the same, so normalizing the namespace prefix makes every strict part
# parse through the transitional readers (the reference's BeautifulSoup
# matches bare "w:..." tags and never sees the difference)
_STRICT_NS = b"http://purl.oclc.org/ooxml/"
_TRANSITIONAL = {
    b"http://purl.oclc.org/ooxml/wordprocessingml/main": b"http://schemas.openxmlformats.org/wordprocessingml/2006/main",
    b"http://purl.oclc.org/ooxml/spreadsheetml/main": b"http://schemas.openxmlformats.org/spreadsheetml/2006/main",
    b"http://purl.oclc.org/ooxml/presentationml/main": b"http://schemas.openxmlformats.org/presentationml/2006/main",
    b"http://purl.oclc.org/ooxml/drawingml/main": b"http://schemas.openxmlformats.org/drawingml/2006/main",
    b"http://purl.oclc.org/ooxml/officeDocument/relationships": b"http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    b"http://purl.oclc.org/ooxml/officeDocument/math": b"http://schemas.openxmlformats.org/officeDocument/2006/math",
}


def _normalize_strict(raw: bytes) -> bytes:
    if _STRICT_NS in raw:
        for s, t in _TRANSITIONAL.items():
            raw = raw.replace(s, t)
    return raw


def _xml(zf: zipfile.ZipFile, name: str) -> Optional[ElementTree.Element]:
    try:
        raw = zf.read(name)
    except KeyError:
        return None
    try:
        return ElementTree.fromstring(_normalize_strict(raw))
    except ElementTree.ParseError as e:
        raise BadOfficeFile(f"bad xml in {name}: {e}") from e


def _cell_lines(text: str) -> List[LineWithMeta]:
    return [LineWithMeta(text)] if text else []


# --------------------------------------------------------------------- docx


def _docx_notes(zf: zipfile.ZipFile, part: str) -> Dict[str, str]:
    """word/footnotes.xml / word/endnotes.xml → {id: joined w:t text}
    (reference footnote_extractor.py:8-21)."""
    notes: Dict[str, str] = {}
    try:
        root = _xml(zf, part)
    except BadOfficeFile:
        return notes
    if root is None:
        return notes
    local = part.rsplit("/", 1)[-1].replace("s.xml", "")  # footnote | endnote
    for note in root.iter(f"{W}{local}"):
        note_id = note.get(f"{W}id")
        text = " ".join(t.text for t in note.iter(f"{W}t") if t.text)
        if note_id and text:
            notes[note_id] = text
    return notes


def _docx_paragraph(
    p: ElementTree.Element,
    page_id: int,
    line_id: int,
    numbering: Optional["NumberingEngine"] = None,
    styles: Optional["StylesDb"] = None,
    footnotes: Optional[Dict[str, str]] = None,
    endnotes: Optional[Dict[str, str]] = None,
    resolver: Optional["StyleResolver"] = None,
    prev_spacing_after: int = 0,
) -> Tuple[LineWithMeta, int]:
    """One w:p → (LineWithMeta, spacing_after). Properties resolve through
    the reference's full hierarchy (docx_props.py: docDefaults → default
    style → pStyle basedOn chain → direct pPr → character style → run rPr);
    annotations mirror line_with_meta_converter.py — paragraph-wide
    indentation/alignment/spacing/style + per-run size and the six boolean
    styles, merged by the shared AnnotationMerger. List paragraphs get the
    rendered numbering prefix as a leading run."""
    from dedoc_ray.core.annotation_merger import merge_annotations
    from dedoc_ray.readers.docx_props import (
        Props, change_paragraph_properties, change_run_properties, run_text as _run_text,
    )

    ppr = p.find(f"{W}pPr")
    ppr_rpr = ppr.find(f"{W}rPr") if ppr is not None else None
    _pstyle = ppr.find(f"{W}pStyle") if ppr is not None else None
    pstyle_id = _pstyle.get(f"{W}val", "") if _pstyle is not None else ""

    par = Props()
    if resolver is not None:
        resolver.parse(pstyle_id or None, par, "paragraph", is_paragraph=True)
    if ppr is not None:
        change_paragraph_properties(par, ppr)

    # numbering resolution first: the lvl's pPr feeds paragraph properties
    # and its rPr the numbering run (reference paragraph.py step 7 before 8)
    tag_hl: Optional[HierarchyLevel] = None
    style_id = pstyle_id
    num_ref: Optional[Tuple[str, str]] = None
    bare_list_depth: Optional[int] = None  # numPr without a resolvable numId
    numbering_removed = False  # direct numId=0 blocks style numbering too
    if ppr is not None:
        numpr = ppr.find(f"{W}numPr")
        if numpr is not None:
            num_el = numpr.find(f"{W}numId")
            ilvl_el = numpr.find(f"{W}ilvl")
            ilvl_val = ilvl_el.get(f"{W}val", "0") if ilvl_el is not None else "0"
            if num_el is not None:
                num_id = num_el.get(f"{W}val", "")
                # numId=0 REMOVES inherited numbering (ISO 29500 §17.9.15) —
                # the paragraph is NOT a list item (reference num_dict has
                # no entry "0", so its numbering extractor skips it too)
                if num_id != "0":
                    num_ref = (num_id, ilvl_val)
                else:
                    numbering_removed = True
            else:
                bare_list_depth = int(ilvl_val) + 1 if ilvl_val.isdigit() else 1
    if num_ref is None and not numbering_removed and style_id and styles is not None:
        num_ref = styles.numbering_of(style_id)
        if num_ref is not None and num_ref[1] is None:
            # style numPr without ilvl: bind to the lvl whose pStyle names
            # this style (reference numbering_extractor.py:56-66)
            ilvl = numbering.level_for_style(num_ref[0], style_id) if numbering is not None else None
            num_ref = (num_ref[0], ilvl) if ilvl is not None else None

    heading: Optional[int] = None
    if style_id:
        if styles is not None:
            heading = styles.heading_depth(style_id)
        if heading is None:
            m = _HEADING_RE.match(style_id)
            heading = int(m.group(1)) + 1 if m else None  # reference: N + 1

    # numbering renders for list items AND numbered headings alike — the
    # reference appends the numbering run regardless of style_level
    # (styles_extractor.py:80-86 for style numPr, paragraph.py:74-77 for
    # direct numPr); only the hierarchy kind differs
    prefix = ""
    num_rpr = None
    depth = bare_list_depth or 1
    if num_ref is not None and numbering is not None:
        prefix, depth = numbering.prefix(*num_ref)
        lvl = numbering.level_info(*num_ref)
        if lvl is not None:
            if lvl.style_id and resolver is not None:
                resolver.parse(lvl.style_id, par, "paragraph")
            if lvl.ppr is not None:
                change_paragraph_properties(par, lvl.ppr)
            num_rpr = lvl.rpr
    if heading is not None:
        tag_hl = HierarchyLevel(1, heading, False, HierarchyLevel.header)
    elif num_ref is not None or bare_list_depth is not None:
        tag_hl = HierarchyLevel(2, depth, False, HierarchyLevel.list_item)

    runs: List[Tuple[str, Props]] = []
    if prefix:
        # reference __get_numbering_formatting: the numbering text is a
        # leading run carrying paragraph + lvl rPr + pPr>rPr properties
        np_props = Props(par)
        if num_rpr is not None:
            change_run_properties(np_props, num_rpr)
        if ppr_rpr is not None:
            change_run_properties(np_props, ppr_rpr)
        runs.append((prefix, np_props))
    for run in p.iter(f"{W}r"):
        rp = Props(par)
        rpr = run.find(f"{W}rPr")
        rstyle = rpr.find(f"{W}rStyle") if rpr is not None else None
        if rstyle is not None and resolver is not None:
            resolver.parse(rstyle.get(f"{W}val", ""), rp, "character")
            if ppr_rpr is not None:
                change_run_properties(rp, ppr_rpr)
        if rpr is not None:
            change_run_properties(rp, rpr)
        text_r = _run_text(run)
        if not text_r:
            continue
        if rp.caps and any(el.tag == f"{W}caps" for el in run.iter()):
            text_r = text_r.upper()
        runs.append((text_r, rp))

    body = "".join(t for t, _ in runs)
    if par.caps:
        body = body.upper()
    blen = len(body)

    # annotations per line_with_meta_converter.py:35-55 — paragraph-wide
    # indentation/alignment/spacing/style (+ linked_text per footnote),
    # per-run size (always) and the six boolean styles; then merged
    spacing = max(prev_spacing_after, par.spacing_before) if line_id else par.spacing_before
    annotations: List[Annotation] = [
        Annotation(0, blen, "indentation", str(par.indentation)),
        Annotation(0, blen, "alignment", par.jc),
        Annotation(0, blen, "spacing", str(spacing)),
    ]
    for ref_tag, id2note in ((f"{W}footnoteReference", footnotes), (f"{W}endnoteReference", endnotes)):
        if not id2note:
            continue
        for ref in p.iter(ref_tag):
            note = id2note.get(ref.get(f"{W}id", ""))
            if note:
                annotations.append(Annotation(0, blen, "linked_text", note))
    if par.style_name is not None:
        annotations.append(Annotation(0, blen, "style", par.style_name))
    pos = 0
    for text_r, rp in runs:
        start, end = pos, pos + len(text_r)
        pos = end
        annotations.append(Annotation(start, end, "size", str(rp.size / 2)))
        for name in ("bold", "italic", "underlined", "strike", "superscript", "subscript"):
            if getattr(rp, name):
                annotations.append(Annotation(start, end, name, "True"))
    annotations = merge_annotations(annotations, body)

    # line text is the bare paragraph body — the trailing-newline rule is
    # positional (depends on the NEXT line) and runs in _fix_paragraph_newlines
    metadata = LineMetadata(page_id=page_id, line_id=line_id, tag_hierarchy_level=tag_hl)
    return LineWithMeta(body, metadata=metadata, annotations=annotations), par.spacing_after


_UNKNOWN_HL = HierarchyLevel(None, None, False, HierarchyLevel.unknown)


def _fix_paragraph_newlines(lines: List[LineWithMeta]) -> None:
    """Reference docx_reader.py:37-54 ``__fix_lines``: a paragraph gains a
    trailing "\\n" only when the NEXT line carries an equal hierarchy level
    (None levels compare as +inf) and this line is untyped raw text;
    annotations touching the old end stretch over the newline. Headers and
    list items never gain one, nor does the last line of the document."""
    for i in range(len(lines) - 1):
        cur = lines[i].metadata.tag_hierarchy_level or _UNKNOWN_HL
        nxt = lines[i + 1].metadata.tag_hierarchy_level or _UNKNOWN_HL
        if cur != nxt or cur.line_type != HierarchyLevel.unknown or lines[i].line.endswith("\n"):
            continue
        old_len = len(lines[i].line)
        lines[i].line += "\n"
        for a in lines[i].annotations:
            if a.end == old_len:
                a.end += 1


def _docx_table(tbl: ElementTree.Element, page_id: int, uid: str) -> Table:
    """w:tbl → rectangular grid; gridSpan/vMerge → duplicated invisible
    copies (reference cell duplication — docx_document.py + table.py:9-32)."""
    grid: List[List[CellWithMeta]] = []
    vmerge_starts: Dict[int, CellWithMeta] = {}  # col index → cell started above
    for tr in tbl.findall(f"{W}tr"):
        row: List[CellWithMeta] = []
        col = 0
        for tc in tr.findall(f"{W}tc"):
            tcpr = tc.find(f"{W}tcPr")
            colspan = 1
            vmerge_cont = False
            if tcpr is not None:
                gs = tcpr.find(f"{W}gridSpan")
                if gs is not None:
                    colspan = int(gs.get(f"{W}val", "1"))
                vm = tcpr.find(f"{W}vMerge")
                if vm is not None and vm.get(f"{W}val", "continue") != "restart":
                    vmerge_cont = True
            text = "\n".join(
                "".join(t.text or "" for t in p.iter(f"{W}t")) for p in tc.findall(f"{W}p")
            ).strip("\n")
            if vmerge_cont and col in vmerge_starts:
                origin = vmerge_starts[col]
                origin.rowspan += 1
                for _ in range(colspan):
                    row.append(CellWithMeta(list(origin.lines), origin.colspan, origin.rowspan, invisible=True))
                    col += 1
                continue
            cell = CellWithMeta(_cell_lines(text), colspan=colspan, rowspan=1)
            vmerge_starts[col] = cell
            row.append(cell)
            col += 1
            for _ in range(colspan - 1):
                row.append(CellWithMeta(list(cell.lines), colspan, 1, invisible=True))
                col += 1
        grid.append(row)
    return Table(grid, page_id=page_id, uid=uid)


_CP = "{http://schemas.openxmlformats.org/package/2006/metadata/core-properties}"
_DC = "{http://purl.org/dc/elements/1.1/}"
_DCTERMS = "{http://purl.org/dc/terms/}"


def _core_properties(zf: zipfile.ZipFile) -> Dict[str, str]:
    """docProps/core.xml → title/author/created/modified/subject columns
    (reference base_metadata_extractor.py:33 + docx core-properties)."""
    meta = {"title": "", "author": "", "created": "", "modified": "", "subject": ""}
    try:
        root = _xml(zf, "docProps/core.xml")
    except BadOfficeFile:
        return meta
    if root is None:
        return meta
    for tag, key in (
        (f"{_DC}title", "title"),
        (f"{_DC}creator", "author"),
        (f"{_DC}subject", "subject"),
        (f"{_DCTERMS}created", "created"),
        (f"{_DCTERMS}modified", "modified"),
    ):
        el = root.find(tag)
        if el is not None and el.text:
            meta[key] = el.text
    return meta


def _read_part(zf: zipfile.ZipFile, name: str) -> Optional[bytes]:
    try:
        return _normalize_strict(zf.read(name))
    except KeyError:
        return None


@lru_cache(maxsize=64)
def _cached_nums(xml_bytes: bytes):
    """Parse numbering.xml once per distinct byte content (corpora repeat
    the same part across documents); returns the immutable num definitions."""
    from dedoc_ray.readers.docx_numbering import NumberingEngine

    return NumberingEngine(ElementTree.fromstring(xml_bytes)).nums


@lru_cache(maxsize=64)
def _cached_styles(xml_bytes: bytes):
    from dedoc_ray.readers.docx_numbering import StylesDb

    return StylesDb(ElementTree.fromstring(xml_bytes))


@lru_cache(maxsize=64)
def _cached_resolver(xml_bytes: Optional[bytes]):
    from dedoc_ray.readers.docx_props import StyleResolver

    return StyleResolver(ElementTree.fromstring(xml_bytes) if xml_bytes else None)


def read_docx(data: bytes) -> UnstructuredDoc:
    from dedoc_ray.readers.docx_numbering import NumberingEngine, StylesDb

    zf = _open_zip(data)
    root = _xml(zf, "word/document.xml")
    if root is None:  # reference docx_document.py:30 falls back to document2.xml
        root = _xml(zf, "word/document2.xml")
    if root is None:
        raise BadOfficeFile("no word/document.xml")
    body = root.find(f"{W}body")
    if body is None:
        raise BadOfficeFile("no w:body")
    numbering_bytes = _read_part(zf, "word/numbering.xml")
    styles_bytes = _read_part(zf, "word/styles.xml")
    try:
        nums = _cached_nums(numbering_bytes) if numbering_bytes else None
    except ElementTree.ParseError as e:
        raise BadOfficeFile(f"bad xml in word/numbering.xml: {e}") from e
    numbering = NumberingEngine(None, nums=nums)
    try:
        styles = _cached_styles(styles_bytes) if styles_bytes else StylesDb(None)
    except ElementTree.ParseError as e:
        raise BadOfficeFile(f"bad xml in word/styles.xml: {e}") from e
    try:
        resolver = _cached_resolver(styles_bytes)
    except ElementTree.ParseError as e:
        raise BadOfficeFile(f"bad xml in word/styles.xml: {e}") from e
    footnotes = _docx_notes(zf, "word/footnotes.xml")
    endnotes = _docx_notes(zf, "word/endnotes.xml")
    attachments = _office_attachments(zf, "word")
    from dedoc_ray.readers.base import attachment_uid

    name2uid = {name: attachment_uid(name, payload) for name, _, payload in attachments}
    # rId → media basename (reference __handle_images_xml,
    # docx_document.py:133-154)
    images_rels: Dict[str, str] = {}
    rels_root = _xml(zf, "word/_rels/document.xml.rels")
    if rels_root is None:
        rels_root = _xml(zf, "word/_rels/document2.xml.rels")
    if rels_root is not None:
        for rel in rels_root:
            target = rel.get("Target", "")
            if target.startswith("media/"):
                images_rels[rel.get("Id", "")] = target[6:]
    lines: List[LineWithMeta] = []
    tables: List[Table] = []
    line_id = 0
    prev_after = 0

    def _body_children(el):
        """Flatten w:sdt wrappers (TOC fields, content controls) into their
        sdtContent paragraphs — reference reads them via find_all("w:p")
        (docx_document.py:78-81)."""
        for c in el:
            if c.tag == f"{W}sdt":
                content = c.find(f"{W}sdtContent")
                if content is not None:
                    yield from _body_children(content)
            else:
                yield c

    for child in _body_children(body):
        if child.tag == f"{W}p":
            line, prev_after = _docx_paragraph(
                child, page_id=0, line_id=line_id, numbering=numbering,
                styles=styles, footnotes=footnotes, endnotes=endnotes,
                resolver=resolver, prev_spacing_after=prev_after)
            lines.append(line)
            line_id += 1
            # image refs: each a:blip in the paragraph anchors an
            # `attachment` annotation on the last NON-empty paragraph —
            # trailing empty paragraphs are dropped, the reference's
            # __prepare_paragraph_list pop (docx_document.py:86-89,145-154,
            # 167-171; pinned by test_api_misc_with_images_refs.py)
            image_uids = [
                name2uid[images_rels[blip.get(f"{R}embed", "")]]
                for blip in child.iter(f"{A}blip")
                if images_rels.get(blip.get(f"{R}embed", "")) in name2uid
            ]
            if image_uids:
                while lines and not lines[-1].line.strip():
                    lines.pop()
                    line_id -= 1
                if lines:
                    for uid in image_uids:
                        lines[-1].annotations.append(
                            Annotation(0, len(lines[-1].line), "attachment", uid)
                        )
        elif child.tag == f"{W}tbl":
            tbl = _docx_table(child, page_id=0, uid=f"table_{len(tables)}")
            tbl.order = line_id  # document-order anchor for line↔table linking
            tables.append(tbl)
    _fix_paragraph_newlines(lines)
    return UnstructuredDoc(
        lines=lines, tables=tables, metadata=_core_properties(zf),
        attachments=attachments,
    )


def _ole_native_contents(payload: bytes) -> "tuple[str, bytes] | None":
    """``\\x01Ole10Native`` stream → (original ANSI name, embedded bytes) —
    the packager layout the reference walks byte-for-byte
    (abstract_office_attachments_extractor.py:15-62)."""
    from dedoc_ray.readers.txt import _detect_encoding

    stream = payload[6:]  # header: 4-byte size + 2-byte type
    end = stream.find(b"\0")
    if end < 0:
        return None
    name_raw = stream[:end]
    stream = stream[end + 1:]
    end = stream.find(b"\0")  # original filepath, unused
    if end < 0:
        return None
    stream = stream[end + 1 + 4:]  # path NUL + 4 unused bytes
    if len(stream) < 4:
        return None
    tmp_path_len = int.from_bytes(stream[:4], "little")
    stream = stream[4 + tmp_path_len:]
    if len(stream) < 4:
        return None
    size = int.from_bytes(stream[:4], "little")
    contents = stream[4:4 + size]
    name = name_raw.decode(_detect_encoding(name_raw, default="cp1251"), errors="replace")
    return name, contents


def _office_attachments(zf: zipfile.ZipFile, part_dir: str):
    """media/embeddings parts of an OOXML package → (name, size, payload)
    attachment tuples, reference semantics
    (abstract_office_attachments_extractor.py:64-107): windows metafiles
    (.emf/.wmf) are skipped; ``.bin`` OLE containers are UNPACKED — a
    ``CONTENTS`` stream holding %PDF becomes <oleObjectN>.pdf, an
    ``\\x01Ole10Native`` stream yields the packaged file under its original
    name; other parts attach as-is."""
    out = []
    for name in zf.namelist():
        if not name.startswith((f"{part_dir}/media/", f"{part_dir}/embeddings/")):
            continue
        if name.endswith("/"):  # zip directory entries are not members
            continue
        base = name.rsplit("/", 1)[-1]
        if base.lower().endswith((".emf", ".wmf")):
            continue
        payload = zf.read(name)
        if base.lower().endswith(".bin"):
            try:
                from dedoc_ray.readers.cfb import CfbFile

                cfb = CfbFile(payload)
                contents = cfb.stream("CONTENTS")
                if contents is not None and contents[:5] == b"%PDF-":
                    out.append((base.rsplit(".", 1)[0] + ".pdf", len(contents), contents))
                    continue
                native = cfb.stream("\x01Ole10Native")
                if native is not None:
                    unpacked = _ole_native_contents(native)
                    if unpacked is not None:
                        out.append((unpacked[0], len(unpacked[1]), unpacked[1]))
                        continue
            except Exception:
                pass
            continue  # undecodable OLE: reference attaches nothing (TODO at :102)
        out.append((base, len(payload), payload))
    return out


# --------------------------------------------------------------------- xlsx


def _col_index(ref: str) -> int:
    """'B7' → 1 (zero-based column)."""
    m = _CELL_REF_RE.match(ref)
    if not m:
        return 0
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - ord("A") + 1)
    return col - 1


def read_xlsx(data: bytes) -> UnstructuredDoc:
    zf = _open_zip(data)
    shared: List[str] = []
    ss = _xml(zf, "xl/sharedStrings.xml")
    if ss is not None:
        for si in ss.findall(f"{SHEET_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{SHEET_NS}t")))

    sheet_names = sorted(
        (n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)", n).group(1)),
    )
    if not sheet_names:
        raise BadOfficeFile("no worksheets")
    tables: List[Table] = []
    for page_id, name in enumerate(sheet_names):
        root = _xml(zf, name)
        rows: List[List[CellWithMeta]] = []
        max_cols = 0
        for row_el in root.iter(f"{SHEET_NS}row"):
            cells: List[Tuple[int, str]] = []
            for c in row_el.findall(f"{SHEET_NS}c"):
                v = c.find(f"{SHEET_NS}v")
                raw = v.text if v is not None and v.text is not None else ""
                if c.get("t") == "s" and raw != "":
                    raw = shared[int(raw)]
                elif c.get("t") in (None, "n") and raw != "":
                    # xlrd-parity float rendering ("1" → "1.0") — reference
                    # excel_reader.py reads via xlrd (all numerics float)
                    try:
                        raw = str(float(raw))
                    except ValueError:
                        pass
                cells.append((_col_index(c.get("r", "")), raw))
            width = (max(i for i, _ in cells) + 1) if cells else 0
            row = [""] * width
            for i, val in cells:
                row[i] = val
            max_cols = max(max_cols, width)
            rows.append([CellWithMeta(_cell_lines(v)) for v in row])
        for row in rows:  # rectangularize (reference pads via pandas/xlrd grid)
            row.extend(CellWithMeta([]) for _ in range(max_cols - len(row)))
        tables.append(Table(rows, page_id=page_id, uid=f"sheet_{page_id}"))
    # embedded media → attachments (reference ExcelAttachmentsExtractor
    # over xl/media + xl/embeddings — test_api_misc_with_attachments.py:23-33)
    return UnstructuredDoc(lines=[], tables=tables, attachments=_office_attachments(zf, "xl"))


# --------------------------------------------------------------------- pptx


def read_pptx(data: bytes) -> UnstructuredDoc:
    """Full-fidelity pptx path lives in readers/pptx.py (lazy import — pptx.py
    borrows BadOfficeFile/_core_properties from this module)."""
    from dedoc_ray.readers.pptx import read_pptx as _read_pptx

    return _read_pptx(data)
