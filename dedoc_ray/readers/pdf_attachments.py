"""PDF embedded-file attachment extraction (text-layer object scan).

Reference parity: dedoc's ``PDFAttachmentsExtractor``
(dedoc/attachments_extractors/concrete_attachments_extractors/
pdf_attachments_extractor.py:17-110) walks two routes with PyPDF2 —

  1. root attachments: ``/Root → /Names → /EmbeddedFiles`` name tree,
     each entry a ``/Filespec`` whose ``/EF /F`` stream is the payload;
  2. page-level ``/Annots`` with ``/Subtype /FileAttachment`` whose
     ``/FS`` points at the same Filespec shape.

This module implements the same two routes over a direct object scan of
the PDF byte stream (``N 0 obj … endobj``), consistent with the rest of
our from-scratch PDF reader (readers/pdf.py) — no PyPDF2. Documented
subset: direct (non-encrypted, non-objstm) objects, names as literal
strings, ``/EF /F`` as an indirect stream reference, optional
``/FlateDecode``. Filespecs reachable from both routes are deduplicated
by object number, mirroring the reference's effective behavior where a
file appears once per distinct Filespec.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Tuple

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_NAME_RE = re.compile(rb"/(?:UF|F)\s*\(((?:[^()\\]|\\.)*)\)")
_EF_RE = re.compile(rb"/EF\s*<<[^>]*?/F\s+(\d+)\s+0\s+R")
_EMBEDDED_NAMES_RE = re.compile(
    rb"/EmbeddedFiles\s*<<[^>]*?/Names\s*\[(.*?)\]", re.DOTALL
)
_NAMES_PAIR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s+(\d+)\s+0\s+R")
_FS_REF_RE = re.compile(rb"/FS\s+(\d+)\s+0\s+R")


def _pdf_string(raw: bytes) -> str:
    """Literal-string unescape (subset: \\(, \\), \\\\)."""
    return (
        raw.replace(rb"\(", b"(").replace(rb"\)", b")").replace(rb"\\", b"\\")
    ).decode("utf-8", errors="replace")


def _objects(data: bytes) -> Dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _stream_payload(body: bytes) -> bytes:
    m = _STREAM_RE.search(body)
    if m is None:
        return b""
    payload = m.group(1)
    if b"/FlateDecode" in body.split(b"stream", 1)[0]:
        try:
            payload = zlib.decompress(payload)
        except zlib.error:
            return b""  # corrupt filter: fail closed, drop the attachment
    return payload


def _filespec_attachment(num: int, objs: Dict[int, bytes]) -> Tuple[str, bytes] | None:
    body = objs.get(num)
    if body is None:
        return None
    ef = _EF_RE.search(body)
    if ef is None:
        return None
    stream_obj = objs.get(int(ef.group(1)))
    if stream_obj is None:
        return None
    name_m = _NAME_RE.search(body)  # /UF wins over /F by regex alternation order
    name = _pdf_string(name_m.group(1)) if name_m else f"attachment_{num}"
    return name, _stream_payload(stream_obj)


def _pdf_text_string(v) -> str:
    """PDF text string → str: UTF-16 with BOM, else PDFDocEncoding≈latin-1."""
    if isinstance(v, bytes):
        if v[:2] in (b"\xfe\xff", b"\xff\xfe"):
            try:
                return v.decode("utf-16")
            except UnicodeDecodeError:
                pass
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.decode("latin-1")
    return str(v)


def _pdf_datetime(v) -> int | None:
    """'D:YYYYMMDDHHmmSS...' → unix seconds (reference utils.convert_datetime,
    dedoc/utils/utils.py:234-258; offset suffix ignored like a Z date)."""
    import calendar
    import re as _re

    s = _pdf_text_string(v).replace("D:", "")
    m = _re.match(r"(\d{4})(\d{2})(\d{2})(\d{2})?(\d{2})?(\d{2})?", s)
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh = int(m.group(4) or 0)
    mm = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    try:
        base = calendar.timegm((y, mo, d, hh, mm, ss, 0, 0, 0))
    except ValueError:
        return None
    off = _re.search(r"([+-])(\d{2})'?(\d{2})'?", s)
    if off:
        sign = -1 if off.group(1) == "+" else 1
        base += sign * (int(off.group(2)) * 3600 + int(off.group(3)) * 60)
    return base


def _filespec_via_objects(doc, fs) -> Tuple[str, bytes] | None:
    """Resolve one /Filespec dict → (name, payload) through the full object
    layer (reference pdf_attachments_extractor.py:52-106 /FS semantics)."""
    fs = doc.resolve(fs)
    if not isinstance(fs, dict):
        return None
    ef = doc.resolve(fs.get("EF"))
    if not isinstance(ef, dict):
        return None
    stream = doc.resolve(ef.get("F") if "F" in ef else ef.get("UF"))
    if stream is None:
        return None
    try:
        payload = doc.stream_bytes(stream)
    except Exception:
        return None
    name_v = fs.get("UF") if "UF" in fs else fs.get("F")
    name = _pdf_text_string(doc.resolve(name_v)) if name_v is not None else ""
    return (name or "pdf_attachment", payload)


def _extract_via_objects(data: bytes) -> List[Tuple[str, int, bytes]]:
    """Object-layer walk (readers/pdf_objects.py): root EmbeddedFiles name
    tree (Kids handled) first, then per-page /Annots — /FileAttachment
    filespecs AND /Text-/Comment notes rendered as note json files (the
    reference's __create_note, pdf_attachments_extractor.py:108-124).
    Duplicates are NOT collapsed across routes — the reference emits a file
    once per route that reaches it (pinned by
    test_api_misc_with_attachments.test_get_attachments_pdf_depth_1)."""
    import hashlib
    import json as _json

    from dedoc_ray.readers.pdf_objects import PdfDocument

    doc = PdfDocument(data)
    out: List[Tuple[str, int, bytes]] = []

    def walk_names(node, depth=0) -> None:
        node = doc.resolve(node)
        if not isinstance(node, dict) or depth > 16:
            return
        names = doc.resolve(node.get("Names"))
        if isinstance(names, list):
            for i in range(0, len(names) - 1, 2):
                att = _filespec_via_objects(doc, names[i + 1])
                if att is not None:
                    out.append((att[0], len(att[1]), att[1]))
        kids = doc.resolve(node.get("Kids"))
        if isinstance(kids, list):
            for kid in kids:
                walk_names(kid, depth + 1)

    root = doc.resolve(doc.trailer.get("Root"))
    if isinstance(root, dict):
        names_dict = doc.resolve(root.get("Names"))
        if isinstance(names_dict, dict):
            walk_names(names_dict.get("EmbeddedFiles"))

    for page in doc.pages():
        annots = doc.resolve(page.get("Annots"))
        if not isinstance(annots, list):
            continue
        for annot in annots:
            annot = doc.resolve(annot)
            if not isinstance(annot, dict):
                continue
            subtype = str(annot.get("Subtype", ""))
            if subtype == "FileAttachment":
                att = _filespec_via_objects(doc, annot.get("FS"))
                if att is not None:
                    out.append((att[0], len(att[1]), att[1]))
            elif subtype == "Text" and str(annot.get("Name", "")) == "Comment":
                content = _pdf_text_string(doc.resolve(annot.get("Contents", b"")))
                note = {
                    "content": content,
                    "modified_time": _pdf_datetime(doc.resolve(annot["M"])) if "M" in annot else None,
                    "created_time": _pdf_datetime(doc.resolve(annot["CreationDate"])) if "CreationDate" in annot else None,
                    "size": len(content),
                    "author": _pdf_text_string(doc.resolve(annot.get("T"))) if "T" in annot else None,
                }
                payload = _json.dumps(note).encode("utf-8")
                # deterministic analogue of the reference's uuid note name
                tag = hashlib.md5(payload).hexdigest()[:8]
                out.append((f"note_{tag}.json", len(payload), payload))
    return out


_DO_RE = re.compile(rb"/((?:[^\s/<>\[\]()%]|#[0-9A-Fa-f]{2})+)\s+Do\b")


def _pdf_name_str(raw: bytes) -> str:
    """Content-stream name token → str (undo #xx hex escapes)."""
    return re.sub(
        rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
    ).decode("latin-1")


def _colorspace_components(doc, cs) -> "tuple[int, bytes | None] | None":
    """→ (n_components, palette_or_None) for the raster layouts we re-encode:
    gray (1), rgb (3), or 8-bit Indexed over one of those."""
    from dedoc_ray.readers.pdf_objects import Stream

    cs = doc.resolve(cs)
    if isinstance(cs, str):
        if cs in ("DeviceGray", "CalGray", "G"):
            return 1, None
        if cs in ("DeviceRGB", "CalRGB", "RGB"):
            return 3, None
        return None
    if isinstance(cs, list) and cs:
        head = str(doc.resolve(cs[0]))
        if head == "ICCBased" and len(cs) >= 2:
            st = doc.resolve(cs[1])
            n = int(doc.resolve(st.dict.get("N", 0)) or 0) if isinstance(st, Stream) else 0
            return (n, None) if n in (1, 3) else None
        if head in ("Indexed", "I") and len(cs) >= 4:
            base = _colorspace_components(doc, cs[1])
            if base is None:
                return None
            lookup = doc.resolve(cs[3])
            palette = doc.stream_bytes(lookup) if isinstance(lookup, Stream) else (
                lookup if isinstance(lookup, bytes) else None
            )
            if palette is None:
                return None
            return base[0], palette
    return None


def _drawn_image_payload(doc, xo, max_pixels: int) -> "Tuple[str, bytes] | None":
    """One painted image XObject → (".ext", file bytes), or None if the
    raster layout is outside the re-encodable subset (JBIG2/JPX/CCITT/
    sub-8-bit — those stay geometry-only, same cap story as the OCR route,
    readers/pdf.py:542-547)."""
    import numpy as np

    from dedoc_ray.ops.media_codecs import png_encode

    d = xo.dict
    w = int(doc.resolve(d.get("Width", 0)) or 0)
    h = int(doc.resolve(d.get("Height", 0)) or 0)
    if w <= 0 or h <= 0:
        return None
    filters = doc.resolve(d.get("Filter"))
    if isinstance(filters, list):
        filters = [str(doc.resolve(f)) for f in filters]
    else:
        filters = [str(filters)] if filters is not None else []
    if "DCTDecode" in filters or "DCT" in filters:
        # zero-copy passthrough: the stored stream IS a JFIF file. The
        # reference transcodes to PNG (tabby jar / PIL crop); at corpus
        # scale a decode + re-encode per raster buys nothing.
        if len(filters) == 1:
            return ".jpg", doc.stream_raw(xo)
        return None
    if any(f in ("JPXDecode", "JBIG2Decode", "CCITTFaxDecode", "CCF") for f in filters):
        return None
    if filters and not all(f in ("FlateDecode", "Fl", "LZWDecode", "LZW") for f in filters):
        return None
    if int(doc.resolve(d.get("BitsPerComponent", 8)) or 8) != 8:
        return None
    if w * h > max_pixels:
        return None
    comps = _colorspace_components(doc, d.get("ColorSpace"))
    if comps is None:
        return None
    ncomp, palette = comps
    payload = doc.stream_bytes(xo)
    if palette is not None:
        need = w * h
        if len(payload) < need:
            return None
        idx = np.frombuffer(payload[:need], np.uint8)
        pal = np.frombuffer(palette, np.uint8)
        if len(pal) < 256 * ncomp:
            pal = np.concatenate([pal, np.zeros(256 * ncomp - len(pal), np.uint8)])
        pixels = pal.reshape(-1, ncomp)[idx].reshape(h, w, ncomp)
    else:
        need = w * h * ncomp
        if len(payload) < need:
            return None
        pixels = np.frombuffer(payload[:need], np.uint8).reshape(h, w, ncomp)
    if ncomp == 1:
        pixels = pixels.reshape(h, w)
    return ".png", png_encode(pixels)


def extract_pdf_drawn_images(
    data: bytes, max_pixels: int = 4_000_000, max_per_page: int = 10
) -> List[Tuple[str, int, bytes]]:
    """On-page images actually PAINTED (``/Name Do``), page + paint order.

    Reference parity: both PDF routes attach only painted images — the
    tabby jar reports per-page painted images (pdf_tabby_reader.py:219-250)
    and pdfminer's layout walk yields LTImage per draw
    (pdfminer_extractor.py:91-116) — so resources merely LISTED in a shared
    page /Resources dict but never painted are skipped. A page painting
    ``max_per_page``+ images attaches none from that page
    (pdfminer_extractor.py:114). Form XObjects recurse like the text
    interpreter (readers/pdf_text.py). Names are deterministic
    ``image{N}.ext`` (the reference mints uuids — useless for replayable
    corpus runs)."""
    from dedoc_ray.readers.pdf_objects import PdfDocument, Stream

    doc = PdfDocument(data)
    out: List[Tuple[str, int, bytes]] = []
    seq = 0

    def painted(res, content: bytes, depth: int) -> list:
        found: list = []
        xobjects = doc.resolve(res.get("XObject")) if isinstance(res, dict) else None
        if not isinstance(xobjects, dict):
            return found
        seen_on_page: set = set()
        for m in _DO_RE.finditer(content):
            xo = doc.resolve(xobjects.get(_pdf_name_str(m.group(1))))
            if not isinstance(xo, Stream):
                continue
            subtype = str(doc.resolve(xo.dict.get("Subtype", "")))
            if subtype == "Image":
                key = id(xo)  # one attachment per distinct raster per page
                if key not in seen_on_page:
                    seen_on_page.add(key)
                    found.append(xo)
            elif subtype == "Form" and depth < 4:
                try:
                    sub_content = doc.stream_bytes(xo)
                except Exception:
                    continue
                sub_res = doc.resolve(xo.dict.get("Resources")) or {}
                found.extend(painted(sub_res, sub_content, depth + 1))
        return found

    for page in doc.pages():
        cont = doc.resolve(page.get("Contents"))
        try:
            if isinstance(cont, list):
                content = b"".join(doc.stream_bytes(doc.resolve(c)) for c in cont)
            else:
                content = doc.stream_bytes(cont)
        except Exception:
            continue
        images = painted(doc.resolve(page.get("Resources")) or {}, content, 0)
        if not images or len(images) >= max_per_page:
            continue
        for xo in images:
            try:
                att = _drawn_image_payload(doc, xo, max_pixels)
            except Exception:
                att = None
            if att is None:
                continue
            seq += 1
            out.append((f"image{seq}{att[0]}", len(att[1]), att[1]))
    return out


def extract_pdf_attachments(data: bytes) -> List[Tuple[str, int, bytes]]:
    """All embedded files of a PDF as (name, size, payload) tuples.

    Object-layer walk first (real-world PDFs: xref/ObjStm/filters all
    supported); the legacy direct-object regex scan remains as the fallback
    for bare synthetic streams the object layer can't chart."""
    try:
        out = _extract_via_objects(data)
    except Exception:
        out = []
    if out:
        return out
    objs = _objects(data)
    out: List[Tuple[str, int, bytes]] = []
    seen: set = set()

    for body in objs.values():
        names_m = _EMBEDDED_NAMES_RE.search(body)
        if names_m is None:
            continue
        for pair in _NAMES_PAIR_RE.finditer(names_m.group(1)):
            fs_num = int(pair.group(2))
            if fs_num in seen:
                continue
            att = _filespec_attachment(fs_num, objs)
            if att is not None:
                seen.add(fs_num)
                out.append((att[0], len(att[1]), att[1]))

    for body in objs.values():
        if b"/FileAttachment" not in body:
            continue
        fs_m = _FS_REF_RE.search(body)
        if fs_m is None:
            continue
        fs_num = int(fs_m.group(1))
        if fs_num in seen:
            continue
        att = _filespec_attachment(fs_num, objs)
        if att is not None:
            seen.add(fs_num)
            out.append((att[0], len(att[1]), att[1]))
    return out
