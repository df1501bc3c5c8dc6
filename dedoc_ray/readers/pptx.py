"""PPTX reader at reference fidelity — stdlib zipfile + ElementTree.

Reference semantics (NOT a port — the reference walks BeautifulSoup trees):

- slide walk + title/first-shape rule + table/pic annotations:
  dedoc/readers/pptx_reader/pptx_reader.py:46-72
- shape paragraph loop with per-(list-type, level) numbering shift state:
  dedoc/readers/pptx_reader/shape.py:26-51
- paragraph → LineWithMeta (buAutoNum/buChar prefixes, per-run size + six
  boolean style annotations, alignment appended unmerged):
  dedoc/readers/pptx_reader/paragraph.py:34-64
- ST_TextAutonumberScheme rendering (arabic/alpha/roman × Period/Paren/Plain,
  additive-only roman): dedoc/readers/pptx_reader/numbering_extractor.py:1-51
- property hierarchy (run ← paragraph ← presentation.xml defaultTextStyle
  lvlNpPr defaults): dedoc/readers/pptx_reader/properties_extractor.py:20-125
- tables with hMerge/vMerge invisible copies + md5-of-xml uid:
  dedoc/readers/pptx_reader/table.py:32-66
"""

from __future__ import annotations

import hashlib
import io
import re
import zipfile
from collections import defaultdict
from typing import Dict, List, Optional
from xml.etree import ElementTree

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.annotation_merger import merge_annotations
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.readers.base import UnstructuredDoc, attachment_uid

P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_SLIDE_RE = re.compile(r"ppt/slides/slide(\d+)\.xml")
_SLIDE_RELS_RE = re.compile(r"ppt/slides/_rels/slide(\d+)\.xml\.rels")


# --------------------------------------------------------------- numbering
# ST_TextAutonumberScheme subset (numbering_extractor.py:1-51); chinese/
# japanese/hindi/thai schemes fall back to arabicPeriod like the reference.

_NUM_TYPES = {"arabic": "1", "alphaLc": "a", "alphaUc": "A", "romanLc": "i", "romanUc": "I"}
_NUM_FORMATTING = {"ParenBoth": "({}) ", "ParenR": "{}) ", "Period": "{}. ", "Plain": "{} "}
_COMBINED = {t + f: (t, f) for t in _NUM_TYPES for f in _NUM_FORMATTING}
_ROMAN = [(1000, "m"), (500, "d"), (100, "c"), (50, "l"), (10, "x"), (5, "v"), (1, "i")]


def numbering_text(numbering: str, shift: int) -> str:
    """Render the next item of a pptx auto-numbered list ("1. ", "(i) ")."""
    num_type, num_formatting = _COMBINED.get(numbering, ("arabic", "Period"))
    if num_type in ("alphaLc", "alphaUc"):
        shift1, shift2 = shift % 26, shift // 26 + 1
        num_char = chr(ord(_NUM_TYPES[num_type]) + shift1) * shift2
    elif num_type in ("romanLc", "romanUc"):
        # additive-only roman, same as the reference (4 → "iiii")
        num_char = ""
        for number, letter in _ROMAN:
            cnt, shift = shift // number, shift % number
            if num_type == "romanUc":
                letter = letter.upper()
            num_char += letter * cnt
    else:
        num_char = str(1 + shift)
    return _NUM_FORMATTING[num_formatting].format(num_char)


# --------------------------------------------------------------- properties

_ALIGNMENT = dict(l="left", r="right", ctr="center", just="both", dist="both", justLow="both", thaiDist="both")
_BOOL_PROPS = ("bold", "italic", "underlined", "strike", "superscript", "subscript")


class _Props:
    __slots__ = ("bold", "italic", "underlined", "superscript", "subscript", "strike", "size", "alignment")

    def __init__(self, other: Optional["_Props"] = None) -> None:
        if other is None:
            self.bold = self.italic = self.underlined = False
            self.superscript = self.subscript = self.strike = False
            self.size: object = 0  # int 0 default ↔ float once sz seen (str() parity)
            self.alignment = "left"
        else:
            for name in self.__slots__:
                setattr(self, name, getattr(other, name))


def _on(value: str) -> bool:
    return value in ("1", "true", "on")


def _update_props(el: ElementTree.Element, props: _Props) -> None:
    """Attribute updates per properties_extractor.py:52-80 (b/i/u/strike/
    sz/baseline/algn on pPr, rPr or defRPr)."""
    if _on(el.get("b", "0")):
        props.bold = True
    if _on(el.get("i", "0")):
        props.italic = True
    if el.get("u", "none").lower() != "none":
        props.underlined = True
    if el.get("strike", "noStrike").lower() != "nostrike":
        props.strike = True
    size = el.get("sz")
    if size:
        try:
            props.size = float(size) / 100
        except ValueError:
            pass
    baseline = el.get("baseline")
    if baseline:
        try:
            if float(baseline) < 0:
                props.subscript = True
            else:
                props.superscript = True
        except ValueError:
            pass
    alignment = el.get("algn")
    if alignment and alignment in _ALIGNMENT:
        props.alignment = _ALIGNMENT[alignment]


class _PropertiesExtractor:
    """Level defaults from presentation.xml defaultTextStyle lvl1pPr-lvl9pPr
    (properties_extractor.py:83-125)."""

    def __init__(self, zf: zipfile.ZipFile) -> None:
        self.lvl2default: Dict[int, _Props] = {}
        try:
            root = ElementTree.fromstring(zf.read("ppt/presentation.xml"))
        except (KeyError, ElementTree.ParseError):
            return
        default_style = root.find(f"{P}defaultTextStyle")
        if default_style is None:
            return
        for i in range(1, 10):
            lvl_el = default_style.find(f"{A}lvl{i}pPr")
            if lvl_el is None:
                continue
            level = int(lvl_el.get("lvl", "0") or "0") + 1
            props = self.lvl2default.get(level, _Props())
            alignment = lvl_el.get("algn")
            if alignment and alignment in _ALIGNMENT:
                props.alignment = _ALIGNMENT[alignment]
            def_rpr = lvl_el.find(f"{A}defRPr")
            if def_rpr is not None:
                _update_props(def_rpr, props)
            self.lvl2default[level] = props

    def get(self, el: Optional[ElementTree.Element], level: int, base: Optional[_Props] = None) -> _Props:
        props = _Props(base if base is not None else self.lvl2default.get(level))
        if el is not None:
            _update_props(el, props)
        return props


# --------------------------------------------------------------- paragraph


class _Paragraph:
    """One <a:p> (paragraph.py:23-64)."""

    def __init__(self, xml: ElementTree.Element, props_ex: _PropertiesExtractor) -> None:
        self.xml = xml
        ppr = xml.find(f"{A}pPr")
        bu_auto = xml.find(f".//{A}buAutoNum")
        self.numbered_list_type = bu_auto.get("type", "arabicPeriod") if bu_auto is not None else None
        lvl = ppr.get("lvl", "0") if ppr is not None else None
        self.level = (int(lvl) + 1 if lvl and lvl.isdigit() else 1) if ppr is not None else 1
        self.bu_char = xml.find(f".//{A}buChar")
        self.ppr = ppr
        self.props_ex = props_ex

    def line(self, page_id: int, line_id: int, is_title: bool, shift: int) -> LineWithMeta:
        text = ""
        par_props = self.props_ex.get(self.ppr, level=self.level)
        tag_hl: Optional[HierarchyLevel] = None  # unknown, like create_unknown()

        if is_title:
            tag_hl = HierarchyLevel(1, self.level, False, HierarchyLevel.header)
        elif self.numbered_list_type:
            text += numbering_text(self.numbered_list_type, shift)
            tag_hl = HierarchyLevel(2, self.level, False, HierarchyLevel.list_item)
        elif self.bu_char is not None:
            text += self.bu_char.get("char", "") + " "
            tag_hl = HierarchyLevel(3, self.level, False, HierarchyLevel.list_item)

        annotations: List[Annotation] = []
        for run in self.xml.iter(f"{A}r"):
            prev_len = len(text)
            text += "".join(t.text or "" for t in run.iter(f"{A}t"))
            run_props = self.props_ex.get(run.find(f"{A}rPr"), level=self.level, base=par_props)
            annotations.append(Annotation(prev_len, len(text), "size", str(run_props.size)))
            for name in _BOOL_PROPS:
                if getattr(run_props, name):
                    annotations.append(Annotation(prev_len, len(text), name, "True"))

        text = f"{text}\n"
        annotations = merge_annotations(annotations, text)
        annotations.append(Annotation(0, len(text), "alignment", par_props.alignment))
        return LineWithMeta(text, metadata=LineMetadata(page_id=page_id, line_id=line_id, tag_hierarchy_level=tag_hl), annotations=annotations)


def _shape_lines(
    sp: ElementTree.Element,
    page_id: int,
    init_line_id: int,
    props_ex: _PropertiesExtractor,
    is_title: bool = False,
) -> List[LineWithMeta]:
    """<a:sp>/<a:tc> → lines, with the per-shape numbering shift state that
    restarts a (type, level) counter on descent (shape.py:26-51)."""
    if not "".join(t.text or "" for t in sp.iter(f"{A}t")).strip():
        return []
    ph = sp.find(f".//{P}ph")
    if ph is not None and "title" in ph.get("type", "").lower():
        is_title = True

    lines: List[LineWithMeta] = []
    numbering2shift: Dict[tuple, int] = defaultdict(int)
    prev_list_level: Optional[int] = None
    for line_id, p_el in enumerate(sp.iter(f"{A}p")):
        par = _Paragraph(p_el, props_ex)
        if par.numbered_list_type:
            if prev_list_level and par.level > prev_list_level:
                numbering2shift[(par.numbered_list_type, par.level)] = 0
            shift = numbering2shift[(par.numbered_list_type, par.level)]
            numbering2shift[(par.numbered_list_type, par.level)] += 1
            prev_list_level = par.level
        else:
            shift = 0
        lines.append(par.line(page_id=page_id, line_id=init_line_id + line_id, is_title=is_title, shift=shift))
    return lines


# ------------------------------------------------------------------ tables


def _pptx_table(tbl: ElementTree.Element, page_id: int, props_ex: _PropertiesExtractor) -> Table:
    """<a:tbl> → Table; hMerge/vMerge become invisible copies sharing the
    origin's lines; uid is the md5 of the serialized xml (table.py:32-66)."""
    uid = hashlib.md5(ElementTree.tostring(tbl)).hexdigest()
    # the reference extracts nested tables before parsing rows
    for parent in list(tbl.iter()):
        for child in list(parent):
            if child.tag == f"{A}tbl":
                parent.remove(child)

    cell_list: List[List[CellWithMeta]] = []
    for row in tbl.findall(f".//{A}tr"):
        cell_row: List[CellWithMeta] = []
        col_index = 0
        for tc in row.findall(f"{A}tc"):
            if _on(tc.get("vMerge", "0")):
                origin = cell_list[-1][col_index] if cell_list and col_index < len(cell_list[-1]) else CellWithMeta([])
                cell = CellWithMeta(lines=origin.lines, colspan=1, rowspan=1, invisible=True)
            elif _on(tc.get("hMerge", "0")):
                origin = cell_row[-1] if cell_row else CellWithMeta([])
                cell = CellWithMeta(lines=origin.lines, colspan=1, rowspan=1, invisible=True)
            else:
                colspan = int(tc.get("gridSpan", "1") or "1")
                rowspan = int(tc.get("rowSpan", "1") or "1")
                lines = _shape_lines(tc, page_id=page_id, init_line_id=0, props_ex=props_ex)
                cell = CellWithMeta(lines=lines, colspan=colspan, rowspan=rowspan, invisible=False)
            cell_row.append(cell)
            col_index += 1
        cell_list.append(cell_row)
    return Table(cell_list, page_id=page_id, uid=uid)


# ------------------------------------------------------------------ reader


def _slide_media_rels(zf: zipfile.ZipFile) -> Dict[str, str]:
    """{str(slide_id) + relId → media file name} (pptx_reader.py:86-98)."""
    rels_names = sorted(
        (n for n in zf.namelist() if _SLIDE_RELS_RE.fullmatch(n)),
        key=lambda n: int(_SLIDE_RELS_RE.fullmatch(n).group(1)),
    )
    images_rels: Dict[str, str] = {}
    for slide_id, name in enumerate(rels_names):
        try:
            root = ElementTree.fromstring(zf.read(name))
        except ElementTree.ParseError:
            continue
        for rel in root.iter(f"{REL}Relationship"):
            target = rel.get("Target", "")
            if target.startswith("../media/"):
                images_rels[str(slide_id) + rel.get("Id", "")] = target[len("../media/"):]
    return images_rels


def read_pptx(data: bytes) -> UnstructuredDoc:
    """Parse pptx bytes into lines + tables + attachment manifest
    (pptx_reader.py:27-72)."""
    from dedoc_ray.readers.office import BadOfficeFile, _core_properties

    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise BadOfficeFile(f"not a zip container: {e}") from e
    slide_names = sorted(
        (n for n in zf.namelist() if _SLIDE_RE.fullmatch(n)),
        key=lambda n: int(_SLIDE_RE.fullmatch(n).group(1)),
    )
    if not slide_names:
        raise BadOfficeFile("no slides")

    props_ex = _PropertiesExtractor(zf)
    images_rels = _slide_media_rels(zf)
    from dedoc_ray.readers.office import _office_attachments

    # attachments follow reference PptxAttachmentsExtractor semantics
    # (emf/wmf skipped, .bin OLE unpacked); image-annotation uids keep the
    # RAW media listing so slides referencing skipped metafiles still link
    attachments = _office_attachments(zf, "ppt")
    name2uid = {
        name.rsplit("/", 1)[-1]: attachment_uid(name.rsplit("/", 1)[-1], zf.read(name))
        for name in zf.namelist()
        if name.startswith(("ppt/media/", "ppt/embeddings/")) and not name.endswith("/")
    }

    lines: List[LineWithMeta] = []
    tables: List[Table] = []
    for slide_id, slide_name in enumerate(slide_names):
        try:
            root = ElementTree.fromstring(zf.read(slide_name))
        except ElementTree.ParseError as e:
            raise BadOfficeFile(f"bad slide xml: {e}") from e
        sp_tree = root.find(f"{P}cSld/{P}spTree")
        if sp_tree is None:
            continue
        is_first_shape = True
        for child in sp_tree:
            if child.tag == f"{P}sp":
                if child.find(f"{P}txBody") is None:
                    continue
                shape_lines = _shape_lines(child, page_id=slide_id, init_line_id=len(lines), props_ex=props_ex, is_title=is_first_shape)
                lines.extend(shape_lines)
                if is_first_shape and shape_lines:
                    is_first_shape = False
            elif child.find(f".//{A}tbl") is not None:
                table = _pptx_table(child.find(f".//{A}tbl"), page_id=slide_id, props_ex=props_ex)
                table.order = len(lines)  # document-order anchor (object linker)
                if not lines:
                    lines.append(LineWithMeta("", metadata=LineMetadata(page_id=slide_id, line_id=0)))
                lines[-1].annotations.append(Annotation(0, len(lines[-1].line), "table", table.uid))
                tables.append(table)
            elif child.tag == f"{P}pic":
                blip = child.find(f".//{A}blip")
                if blip is None:
                    continue
                if not lines:
                    lines.append(LineWithMeta("", metadata=LineMetadata(page_id=slide_id, line_id=0)))
                image_name = images_rels.get(str(slide_id) + blip.get(f"{R}embed", ""))
                uid = name2uid.get(image_name or "")
                if uid:
                    lines[-1].annotations.append(Annotation(0, len(lines[-1].line), "attachment", uid))

    return UnstructuredDoc(lines=lines, tables=tables, attachments=attachments, metadata=_core_properties(zf))
