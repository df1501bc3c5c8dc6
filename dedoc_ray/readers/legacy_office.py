"""Native readers for the legacy binary Office formats: .doc (Word 97
[MS-DOC]), .xls (BIFF8 [MS-XLS]), .ppt ([MS-PPT]) — the CFB family the
reference converts with soffice before parsing
(dedoc/converters/concrete_converters/docx_converter.py:13-27,
excel_converter.py, pptx_converter.py). No soffice exists here, so — like
the odt/rtf readers — these parse the binary layouts directly; strictly
no external process, no temp files, one pass over the payload bytes.

Scope (documented subset): piece-table text + paragraph marks for .doc
(styles/FKP formatting not mapped), cell records NUMBER/RK/LABELSST + SST
for .xls, TextCharsAtom/TextBytesAtom document-order text for .ppt.
Metadata comes from the shared \\x05SummaryInformation property set.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.cfb import BadCfbFile, CfbFile, read_summary_info


class BadLegacyFile(ValueError):
    pass


def _open_cfb(data: bytes) -> CfbFile:
    try:
        return CfbFile(data)
    except (BadCfbFile, struct.error) as e:
        raise BadLegacyFile(str(e)) from e


# ------------------------------------------------------------------- .doc

# FIB fixed offsets for nFib 0x00C1 ([MS-DOC] 2.5.1): the A–M flag word sits
# at 0x000A (fWhichTblStm = bit 9); the (fcClx, lcbClx) pair of FibRgFcLcb97
# sits at 0x01A2/0x01A6.
_FIB_FLAGS_OFF = 0x000A
_FC_CLX_OFF = 0x01A2


def _doc_pieces(word: bytes, table: bytes) -> List[Tuple[int, int, bool]]:
    """CLX → [(file offset, char count, is_utf16)] piece descriptors."""
    (fc_clx,) = struct.unpack_from("<I", word, _FC_CLX_OFF)
    (lcb_clx,) = struct.unpack_from("<I", word, _FC_CLX_OFF + 4)
    clx = table[fc_clx : fc_clx + lcb_clx]
    pos = 0
    # skip Prc blocks (clxt 0x01: 2-byte size + grpprl) to the Pcdt (0x02)
    while pos < len(clx) and clx[pos] == 0x01:
        (cb,) = struct.unpack_from("<H", clx, pos + 1)
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise BadLegacyFile("no piece table")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    n = (len(plc) - 4) // 12  # n+1 CPs (4B) + n PCDs (8B)
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    pieces: List[Tuple[int, int, bool]] = []
    for i in range(n):
        (fc_raw,) = struct.unpack_from("<I", plc, (n + 1) * 4 + i * 8 + 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = (fc_raw & 0x3FFFFFFF) // 2 if compressed else fc_raw & 0x3FFFFFFF
        pieces.append((fc, cps[i + 1] - cps[i], not compressed))
    return pieces


_FC_PLCFBTECHPX_OFF = 0x00FA  # FibRgFcLcb97: fcPlcfBteChpx / lcbPlcfBteChpx


def _parse_chpx_sprms(grpprl: bytes) -> Dict[str, int]:
    """Chpx grpprl → character properties ([MS-DOC] 2.6.1 sprms: CFBold
    0x0835, CFItalic 0x0836, CFStrike 0x0837, CKul 0x2A3E, CIss 0x2A48,
    CHps 0x4A43). Operand width comes from the sprm's spra bits."""
    props: Dict[str, int] = {}
    i = 0
    while i + 2 <= len(grpprl):
        (sprm,) = struct.unpack_from("<H", grpprl, i)
        i += 2
        spra = sprm >> 13
        if spra in (0, 1):
            size = 1
        elif spra in (2, 4, 5):
            size = 2
        elif spra == 3:
            size = 4
        elif spra == 7:
            size = 3
        else:  # 6: variable — cb byte + payload
            if i >= len(grpprl):
                break
            size = grpprl[i] + 1
        op = grpprl[i : i + size]
        i += size
        if not op:
            continue
        if sprm == 0x0835:
            props["bold"] = op[0]
        elif sprm == 0x0836:
            props["italic"] = op[0]
        elif sprm == 0x0837:
            props["strike"] = op[0]
        elif sprm == 0x2A3E:
            props["kul"] = op[0]
        elif sprm == 0x2A48:
            props["iss"] = op[0]
        elif sprm == 0x4A43 and len(op) >= 2:
            props["hps"] = struct.unpack_from("<H", op)[0]
    return props


def _doc_char_runs(word: bytes, table: bytes) -> List[Tuple[int, int, Dict[str, int]]]:
    """PlcfBteChpx → ChpxFkp pages → [(fc_start, fc_end, props)] runs."""
    fc, lcb = struct.unpack_from("<II", word, _FC_PLCFBTECHPX_OFF)
    if not lcb or fc + lcb > len(table):
        return []
    plc = table[fc : fc + lcb]
    n = (len(plc) - 4) // 8  # n+1 FCs + n page numbers
    if n <= 0:
        return []
    pns = struct.unpack_from(f"<{n}I", plc, (n + 1) * 4)
    runs: List[Tuple[int, int, Dict[str, int]]] = []
    for pn in pns:
        page = word[pn * 512 : (pn + 1) * 512]
        if len(page) < 512:
            continue
        crun = page[511]
        if crun == 0 or (crun + 1) * 4 + crun > 511:
            continue
        rgfc = struct.unpack_from(f"<{crun + 1}I", page, 0)
        for i in range(crun):
            boff = page[(crun + 1) * 4 + i]
            if not boff:
                continue  # no Chpx: style-inherited run
            cpos = boff * 2
            cb = page[cpos]
            props = _parse_chpx_sprms(page[cpos + 1 : cpos + 1 + cb])
            if props:
                runs.append((rgfc[i], rgfc[i + 1], props))
    return runs


def _toggle_on(val: int) -> bool:
    # [MS-DOC] ToggleOperand: 1 = on, 0 = off, 0x80 = match style,
    # 0x81 = invert style (base styles default off → on)
    return val in (1, 0x81)


def _chpx_annotations(props: Dict[str, int], start: int, end: int) -> List[Annotation]:
    out: List[Annotation] = []
    if _toggle_on(props.get("bold", 0)):
        out.append(Annotation(start, end, "bold", "True"))
    if _toggle_on(props.get("italic", 0)):
        out.append(Annotation(start, end, "italic", "True"))
    if _toggle_on(props.get("strike", 0)):
        out.append(Annotation(start, end, "strike", "True"))
    if props.get("kul", 0):
        out.append(Annotation(start, end, "underlined", "True"))
    iss = props.get("iss", 0)
    if iss == 1:
        out.append(Annotation(start, end, "superscript", "True"))
    elif iss == 2:
        out.append(Annotation(start, end, "subscript", "True"))
    if "hps" in props:
        out.append(Annotation(start, end, "size", str(props["hps"] / 2)))
    return out


def read_doc(data: bytes) -> UnstructuredDoc:
    """Word 97 .doc → paragraphs (piece-table text split on \\r marks) with
    character-run annotations from the CHPX bin table (FKP pages)."""
    cfb = _open_cfb(data)
    word = cfb.stream("WordDocument")
    if word is None or len(word) < 0x01AA or struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        raise BadLegacyFile("no WordDocument stream")
    (flags,) = struct.unpack_from("<H", word, _FIB_FLAGS_OFF)
    table = cfb.stream("1Table" if flags & 0x0200 else "0Table")
    if table is None:
        raise BadLegacyFile("no table stream")
    pieces = _doc_pieces(word, table)
    chunks: List[str] = []
    for fc, n_chars, utf16 in pieces:
        if utf16:
            chunks.append(word[fc : fc + n_chars * 2].decode("utf-16-le", "replace"))
        else:
            chunks.append(word[fc : fc + n_chars].decode("cp1252", "replace"))
    text = "".join(chunks)

    # character runs: FC ranges → document char spans via the piece table
    doc_spans: List[Tuple[int, int, Dict[str, int]]] = []
    try:
        char_runs = _doc_char_runs(word, table)
    except struct.error:
        char_runs = []
    if char_runs:
        cp = 0
        for fc, n_chars, utf16 in pieces:
            width = 2 if utf16 else 1
            fc_end = fc + n_chars * width
            for run_s, run_e, props in char_runs:
                s, e = max(run_s, fc), min(run_e, fc_end)
                if s < e:
                    doc_spans.append((cp + (s - fc) // width, cp + (e - fc) // width, props))
            cp += n_chars

    lines: List[LineWithMeta] = []
    # \r = paragraph mark, \x07 = cell/row mark, \x0b = soft break ([MS-DOC])
    norm = text.replace("\x07", "\r")
    paras = norm.split("\r")
    if paras and paras[-1] == "":
        paras.pop()  # trailing mark terminates the last paragraph
    from dedoc_ray.core.annotation_merger import merge_annotations

    offset = 0
    for line_id, para in enumerate(paras):
        para_start, para_end = offset, offset + len(para)
        offset = para_end + 1  # the \r separator
        lead = len(para) - len(para.lstrip("\x00"))
        para = para.replace("\x0b", "\n").strip("\x00")
        annotations: List[Annotation] = []
        for s, e, props in doc_spans:
            s2, e2 = max(s, para_start + lead) - para_start - lead, min(e, para_end) - para_start - lead
            if 0 <= s2 < e2 <= len(para):
                annotations.extend(_chpx_annotations(props, s2, e2))
        annotations = merge_annotations(annotations, para) if annotations else []
        hl = HierarchyLevel(1, 1, False, HierarchyLevel.header) if line_id == 0 else None
        lines.append(
            LineWithMeta(para + "\n", metadata=LineMetadata(page_id=0, line_id=line_id, tag_hierarchy_level=hl),
                         annotations=annotations)
        )
    return UnstructuredDoc(lines=lines, metadata=read_summary_info(cfb))


# ------------------------------------------------------------------- .xls

_BIFF_BOF = 0x0809
_BIFF_EOF = 0x000A
_BIFF_SST = 0x00FC
_BIFF_CONTINUE = 0x003C
_BIFF_LABELSST = 0x00FD
_BIFF_NUMBER = 0x0203
_BIFF_RK = 0x027E
_BIFF_LABEL = 0x0204
_BIFF_BOUNDSHEET = 0x0085


def _fmt_num(x: float) -> str:
    # xlrd-parity: every numeric cell is a float, so "1" renders "1.0"
    # (reference excel_reader.py goes xlrd → DataFrame → astype(str)).
    # Binary doubles pass through a 15-significant-digit decimal first —
    # the soffice xls→xlsx serialization the reference rides does the same,
    # so a cached 5*6.28 = 31.400000000000002 renders "31.4"
    return str(float(f"{float(x):.15g}"))


def _decode_rk(rk: int) -> str:
    cent = rk & 1
    if rk & 2:  # signed 30-bit int
        val = float(struct.unpack("<i", struct.pack("<I", rk & 0xFFFFFFFC))[0] >> 2)
    else:  # top 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return _fmt_num(val / 100 if cent else val)


def _parse_sst(payload: bytes) -> List[str]:
    """SST record body → unique strings (XLUnicodeRichExtendedString,
    rich/ext runs skipped; CONTINUE splits not supported — the synth corpus
    and typical small workbooks fit one record)."""
    out: List[str] = []
    (_, n_unique) = struct.unpack_from("<II", payload, 0)
    pos = 8
    for _ in range(n_unique):
        if pos + 3 > len(payload):
            break
        (cch,) = struct.unpack_from("<H", payload, pos)
        opts = payload[pos + 2]
        pos += 3
        rich = opts & 0x08
        ext = opts & 0x04
        n_runs = 0
        cb_ext = 0
        if rich:
            (n_runs,) = struct.unpack_from("<H", payload, pos)
            pos += 2
        if ext:
            (cb_ext,) = struct.unpack_from("<i", payload, pos)
            pos += 4
        if opts & 0x01:
            out.append(payload[pos : pos + cch * 2].decode("utf-16-le", "replace"))
            pos += cch * 2
        else:
            out.append(payload[pos : pos + cch].decode("cp1252", "replace"))
            pos += cch
        pos += n_runs * 4 + cb_ext
    return out


def read_xls(data: bytes) -> UnstructuredDoc:
    """BIFF8 .xls → one Table per sheet substream (cells from
    NUMBER/RK/LABELSST/LABEL records; formulas/formats out of scope)."""
    cfb = _open_cfb(data)
    wb = cfb.stream("Workbook") or cfb.stream("Book")
    if wb is None:
        raise BadLegacyFile("no Workbook stream")
    sst: List[str] = []
    sheets: List[Dict[Tuple[int, int], str]] = []
    cur: Optional[Dict[Tuple[int, int], str]] = None
    pending_string: Optional[Tuple[int, int]] = None  # FORMULA awaiting STRING
    pos = 0
    while pos + 4 <= len(wb):
        rec, ln = struct.unpack_from("<HH", wb, pos)
        payload = wb[pos + 4 : pos + 4 + ln]
        if len(payload) < ln:
            raise BadLegacyFile("truncated BIFF record")
        pos += 4 + ln
        if rec == _BIFF_BOF:
            # substreams are sequential, not nested: dt 0x0005 = workbook
            # globals, 0x0010 = worksheet ([MS-XLS] 2.4.21)
            if len(payload) < 4:
                raise BadLegacyFile("short BOF record")
            (dt,) = struct.unpack_from("<H", payload, 2)
            if dt != 0x0005:
                cur = {}
                sheets.append(cur)
        elif rec == _BIFF_EOF:
            cur = None
        elif rec == _BIFF_SST:
            sst = _parse_sst(payload)
        elif cur is not None and rec == 0x00BD:  # MULRK: a run of RK cells
            if len(payload) < 6:
                raise BadLegacyFile("short MULRK record")
            rw, col_first = struct.unpack_from("<HH", payload, 0)
            (col_last,) = struct.unpack_from("<H", payload, len(payload) - 2)
            for k in range(col_last - col_first + 1):
                off = 4 + 6 * k
                if off + 6 > len(payload) - 2:
                    break
                (rk,) = struct.unpack_from("<I", payload, off + 2)  # skip ixfe
                cur[(rw, col_first + k)] = _decode_rk(rk)
        elif cur is not None and rec == 0x0006:  # FORMULA: cached result
            # [MS-XLS] 2.4.127 FormulaValue: bytes 12-13 == 0xFFFF marks a
            # non-numeric cached value (byte 6: 0 = string in the following
            # STRING record, 1 = bool, 2 = error); else an IEEE double
            if len(payload) >= 14:
                rw, col = struct.unpack_from("<HH", payload, 0)
                if struct.unpack_from("<H", payload, 12)[0] != 0xFFFF:
                    (num,) = struct.unpack_from("<d", payload, 6)
                    cur[(rw, col)] = _fmt_num(num)
                elif payload[6] == 0:
                    pending_string = (rw, col)
                elif payload[6] == 1:
                    cur[(rw, col)] = str(bool(payload[8]))
        elif cur is not None and rec == 0x0207 and pending_string is not None:  # STRING
            if len(payload) >= 3:
                (cch,) = struct.unpack_from("<H", payload, 0)
                if payload[2] & 0x01:
                    cur[pending_string] = payload[3 : 3 + cch * 2].decode("utf-16-le", "replace")
                else:
                    cur[pending_string] = payload[3 : 3 + cch].decode("cp1252", "replace")
            pending_string = None
        elif cur is not None and rec in (_BIFF_NUMBER, _BIFF_RK, _BIFF_LABELSST, _BIFF_LABEL):
            if len(payload) < {_BIFF_NUMBER: 14, _BIFF_RK: 10, _BIFF_LABELSST: 10, _BIFF_LABEL: 8}[rec]:
                raise BadLegacyFile("short BIFF cell record")
            rw, col = struct.unpack_from("<HH", payload, 0)
            if rec == _BIFF_NUMBER:
                (num,) = struct.unpack_from("<d", payload, 6)
                cur[(rw, col)] = _fmt_num(num)
            elif rec == _BIFF_RK:
                (rk,) = struct.unpack_from("<I", payload, 6)
                cur[(rw, col)] = _decode_rk(rk)
            elif rec == _BIFF_LABELSST:
                (isst,) = struct.unpack_from("<I", payload, 6)
                cur[(rw, col)] = sst[isst] if isst < len(sst) else ""
            else:  # LABEL: inline XLUnicodeString
                (cch,) = struct.unpack_from("<H", payload, 6)
                opts = payload[8]
                if opts & 0x01:
                    cur[(rw, col)] = payload[9 : 9 + cch * 2].decode("utf-16-le", "replace")
                else:
                    cur[(rw, col)] = payload[9 : 9 + cch].decode("cp1252", "replace")
    if not sheets:
        raise BadLegacyFile("no sheet substream")
    tables: List[Table] = []
    for page_id, cells in enumerate(sheets):
        if not cells:
            tables.append(Table([], page_id=page_id, uid=f"sheet_{page_id}"))
            continue
        n_rows = max(r for r, _ in cells) + 1
        n_cols = max(c for _, c in cells) + 1
        grid = [
            [CellWithMeta([LineWithMeta(cells.get((r, c), ""))] if cells.get((r, c), "") else []) for c in range(n_cols)]
            for r in range(n_rows)
        ]
        tables.append(Table(grid, page_id=page_id, uid=f"sheet_{page_id}"))
    return UnstructuredDoc(lines=[], tables=tables, metadata=read_summary_info(cfb))


# ------------------------------------------------------------------- .ppt

_PPT_TEXT_CHARS = 0x0FA0  # TextCharsAtom (utf-16-le)
_PPT_TEXT_BYTES = 0x0FA8  # TextBytesAtom (cp1252)


def _ppt_walk(buf: bytes, out: List[str]) -> None:
    pos = 0
    while pos + 8 <= len(buf):
        ver_inst, rec, ln = struct.unpack_from("<HHI", buf, pos)
        body = buf[pos + 8 : pos + 8 + ln]
        pos += 8 + ln
        if ver_inst & 0x000F == 0x000F:  # container record: recurse
            _ppt_walk(body, out)
        elif rec == _PPT_TEXT_CHARS:
            out.append(body.decode("utf-16-le", "replace"))
        elif rec == _PPT_TEXT_BYTES:
            out.append(body.decode("cp1252", "replace"))


# MS-PPT record/escher type ids (public spec [MS-PPT] 2.13.24 + [MS-ODRAW])
_PPT_DOCUMENT = 1000  # DocumentContainer
_PPT_SLIDE = 1006  # SlideContainer
_PPT_SLWT = 4080  # SlideListWithText (instance 0 = slides)
_PPT_SLIDEPERSIST = 1011  # SlidePersistAtom
_PPT_TEXTHEADER = 3999  # TextHeaderAtom (dword TextTypeEnum)
_PPT_OUTLINEREF = 3998  # OutlineTextRefAtom (index into the slide's SLWT texts)
_ESCHER_SPGR = 61443  # OfficeArtSpgrContainer (shape group)
_ESCHER_SP = 61444  # OfficeArtSpContainer (one shape)
_ESCHER_CLIENTTEXT = 61453  # OfficeArtClientTextbox (holds the text atoms)
_ESCHER_CHILDANCHOR = 61455  # OfficeArtChildAnchorHF (left, top, right, bottom)
_TITLE_TEXT_TYPES = (0, 6)  # title / centerTitle (TextTypeEnum)


def _ppt_records(buf: bytes):
    pos = 0
    while pos + 8 <= len(buf):
        ver_inst, rec, ln = struct.unpack_from("<HHI", buf, pos)
        yield ver_inst, rec, buf[pos + 8 : pos + 8 + ln]
        pos += 8 + ln


def _ppt_outline_texts(doc_body: bytes) -> List[List[List]]:
    """Per-slide outline entries from SlideListWithText instance 0: a
    SlidePersistAtom starts a slide, each TextHeaderAtom starts an entry
    ([text_type, text]) that the following text atom fills — placeholder
    shapes in the slide drawing point back here via OutlineTextRefAtom."""
    slides: List[List[List]] = []
    for ver_inst, rec, body in _ppt_records(doc_body):
        if rec != _PPT_SLWT or (ver_inst >> 4) != 0:
            continue
        cur: Optional[List[List]] = None
        for _vi, r2, b2 in _ppt_records(body):
            if r2 == _PPT_SLIDEPERSIST:
                cur = []
                slides.append(cur)
            elif r2 == _PPT_TEXTHEADER and cur is not None:
                ttype = struct.unpack_from("<I", b2, 0)[0] if len(b2) >= 4 else 4
                cur.append([ttype, ""])
            elif r2 == _PPT_TEXT_CHARS and cur:
                cur[-1][1] = b2.decode("utf-16-le", "replace")
            elif r2 == _PPT_TEXT_BYTES and cur:
                cur[-1][1] = b2.decode("cp1252", "replace")
    return slides


def _ppt_shapes(body: bytes):
    """Yield ("sp"|"grp", record body) for every shape/group under a slide
    drawing, in drawing (z) order — recursion stops at each shape/group so
    the caller decides how to descend."""
    for ver_inst, rec, rec_body in _ppt_records(body):
        if rec == _ESCHER_SP:
            yield "sp", rec_body
        elif rec == _ESCHER_SPGR:
            yield "grp", rec_body
        elif ver_inst & 0xF == 0xF:
            yield from _ppt_shapes(rec_body)


def _ppt_textbox(sp_body: bytes) -> Tuple[Optional[int], Optional[str], Optional[int], Optional[Tuple[int, int, int, int]]]:
    """(text_type, text, outline_ref, child_anchor) of one SpContainer."""
    ttype = text = ref = anchor = None
    for _vi, rec, body in _ppt_records(sp_body):
        if rec == _ESCHER_CHILDANCHOR and len(body) >= 16:
            anchor = struct.unpack_from("<4i", body, 0)
        elif rec == _ESCHER_CLIENTTEXT:
            for _v2, r2, b2 in _ppt_records(body):
                if r2 == _PPT_TEXTHEADER and len(b2) >= 4:
                    ttype = struct.unpack_from("<I", b2, 0)[0]
                elif r2 == _PPT_TEXT_CHARS:
                    text = b2.decode("utf-16-le", "replace")
                elif r2 == _PPT_TEXT_BYTES:
                    text = b2.decode("cp1252", "replace")
                elif r2 == _PPT_OUTLINEREF and len(b2) >= 4:
                    ref = struct.unpack_from("<i", b2, 0)[0]
    return ttype, text, ref, anchor


def _ppt_table_from_group(grp_body: bytes, page_id: int) -> Optional[Table]:
    """A shape group whose text children's child-anchors tile a full grid is
    a PPT table (cells are plain textboxes, borders are anchored lines with
    no textbox). Geometry-only reconstruction — the reference reaches the
    same grid through soffice's pptx conversion (a:tbl) + table.py:32-66."""
    cells = []  # (top, left, text)
    for kind, body in _ppt_shapes(grp_body):
        if kind != "sp":
            continue
        ttype, text, ref, anchor = _ppt_textbox(body)
        if anchor is None or (text is None and ref is None):
            continue
        cells.append((anchor[1], anchor[0], text or ""))
    if len(cells) < 4:
        return None
    rows = sorted({c[0] for c in cells})
    cols = sorted({c[1] for c in cells})
    if len(rows) < 2 or len(cols) < 2 or len(cells) != len(rows) * len(cols):
        return None
    row_idx = {top: i for i, top in enumerate(rows)}
    col_idx = {left: j for j, left in enumerate(cols)}
    grid: List[List[CellWithMeta]] = [[CellWithMeta([]) for _ in cols] for _ in rows]
    for top, left, text in cells:
        cell_lines = [
            LineWithMeta(para + "\n", metadata=LineMetadata(page_id=page_id, line_id=k))
            for k, para in enumerate(text.split("\r"))
        ] if text.strip() else []
        grid[row_idx[top]][col_idx[left]] = CellWithMeta(cell_lines)
    import hashlib

    return Table(grid, page_id=page_id, uid=hashlib.md5(grp_body).hexdigest())


def read_ppt(data: bytes) -> UnstructuredDoc:
    """.ppt → lines + tables in slide/drawing order, masters and notes
    excluded (the reference reaches the same order through soffice → pptx →
    pptx_reader.py:46-72; this parses the MS-PPT records natively).

    Placeholder shapes resolve their text through OutlineTextRefAtom into
    SlideListWithText; title-typed text becomes a header line. Streams
    without Slide containers (outline-only producers) keep the flat
    document-order text walk."""
    cfb = _open_cfb(data)
    stream = cfb.stream("PowerPoint Document")
    if stream is None:
        raise BadLegacyFile("no PowerPoint Document stream")
    top = list(_ppt_records(stream))
    slide_bodies = [body for _vi, rec, body in top if rec == _PPT_SLIDE]
    outline: List[List[List]] = []
    for _vi, rec, body in top:
        if rec == _PPT_DOCUMENT:
            outline = _ppt_outline_texts(body)

    lines: List[LineWithMeta] = []
    tables: List[Table] = []

    def emit(ttype: Optional[int], text: str, page_id: int) -> None:
        if not text.strip():
            return
        hl = HierarchyLevel(1, 1, False, HierarchyLevel.header) if ttype in _TITLE_TEXT_TYPES else None
        for para in text.split("\r"):
            lines.append(
                LineWithMeta(para + "\n", metadata=LineMetadata(page_id=page_id, line_id=len(lines), tag_hierarchy_level=hl))
            )

    if slide_bodies:
        for page_id, slide_body in enumerate(slide_bodies):
            entries = outline[page_id] if page_id < len(outline) else []
            used: set = set()

            def handle_sp(sp_body: bytes) -> None:
                ttype, text, ref, _anchor = _ppt_textbox(sp_body)
                if ref is not None and 0 <= ref < len(entries):
                    ttype, text = entries[ref]
                    used.add(ref)
                if text:
                    emit(ttype, text, page_id)

            def handle_container(container_body: bytes) -> None:
                for kind, body in _ppt_shapes(container_body):
                    if kind == "grp":
                        table = _ppt_table_from_group(body, page_id)
                        if table is not None:
                            table.order = len(lines)
                            if not lines:
                                lines.append(LineWithMeta("", metadata=LineMetadata(page_id=page_id, line_id=0)))
                            lines[-1].annotations.append(Annotation(0, len(lines[-1].line), "table", table.uid))
                            tables.append(table)
                        else:  # decorative group — descend for nested shapes/tables
                            handle_container(body)
                    else:
                        handle_sp(body)

            handle_container(slide_body)
            # outline text never placed by a shape (outline-only producers)
            for k, (ttype, text) in enumerate(entries):
                if k not in used:
                    emit(ttype, text, page_id)
    else:
        texts: List[str] = []
        _ppt_walk(stream, texts)
        for text in texts:
            if text:
                hl = HierarchyLevel(1, 1, False, HierarchyLevel.header) if not lines else None
                lines.append(
                    LineWithMeta(text + "\n", metadata=LineMetadata(page_id=0, line_id=len(lines), tag_hierarchy_level=hl))
                )
    return UnstructuredDoc(lines=lines, tables=tables, metadata=read_summary_info(cfb))
