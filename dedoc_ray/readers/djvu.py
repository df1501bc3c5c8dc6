"""DjVu container reader — IFF85 structure, page metadata, layer inventory.

The reference converts .djvu through the external ``ddjvu`` binary
(converters/concrete_converters/pdf_converter.py); neither the binary nor
djvulibre's ZP-coder tables exist in this environment, so the BZZ-coded
payloads (TXTz text layers, DIRM name tables) and the JB2/IW44 image
codecs stay an honest gate. The CONTAINER is plain IFF85 though
(DjVu spec, Lizardtech/djvulibre docs): this reader walks
AT&T/FORM:DJVM/DJVU/DJVI chunk trees and surfaces what a corpus pipeline
needs to route and account for these files:

- page count and per-page geometry (width, height, dpi from raw INFO);
- the layer inventory per page (Sjbz mask, BG44/FG44 wavelets, TXTz/TXTa
  text layer, ANTz annotations);
- an explicit warning marking the text layer as present-but-undecodable
  so downstream routing (OCR fallback / skip accounting) stays honest.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.readers.base import UnstructuredDoc


class BadDjvu(ValueError):
    pass


def _walk(data: bytes, pos: int, end: int, out: List[Tuple[str, int, int]], depth: int = 0) -> None:
    """Flatten the chunk tree into (path-id, payload offset, length)."""
    if depth > 8:
        return
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        if ln > end - pos - 8:
            ln = max(0, end - pos - 8)  # tolerate truncated tails
        if cid == b"FORM":
            sub = data[pos + 8 : pos + 12].decode("latin-1", "replace")
            out.append((f"FORM:{sub}", pos + 12, ln - 4))
            _walk(data, pos + 12, pos + 8 + ln, out, depth + 1)
        else:
            out.append((cid.decode("latin-1", "replace"), pos + 8, ln))
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned


def djvu_structure(data: bytes):
    """→ (pages, chunk inventory). Each page dict: width/height/dpi +
    layer chunk ids present."""
    if data[:4] == b"AT&T":
        data = data[4:]
    if data[:4] != b"FORM" or data[8:12] not in (b"DJVM", b"DJVU", b"DJVI"):
        raise BadDjvu("not a DjVu document")
    chunks: List[Tuple[str, int, int]] = []
    _walk(data, 0, len(data), chunks)
    pages: List[Dict[str, object]] = []
    current: Dict[str, object] = {}
    for cid, off, ln in chunks:
        if cid == "FORM:DJVU":
            current = {"layers": []}
            pages.append(current)
        elif cid == "INFO" and pages and ln >= 8:
            w, h = struct.unpack(">HH", data[off : off + 4])
            # INFO: w(BE16) h(BE16) minor(1) major(1) dpi(LE16) gamma flags
            dpi = struct.unpack("<H", data[off + 6 : off + 8])[0] if ln >= 8 else 300
            current["width"] = w
            current["height"] = h
            current["dpi"] = dpi
        elif pages and cid not in ("FORM:DJVM", "FORM:DJVI"):
            current.setdefault("layers", []).append(cid)
    return pages, chunks


def read_djvu(data: bytes) -> UnstructuredDoc:
    pages, chunks = djvu_structure(data)
    warnings: List[str] = [f"djvu pages: {len(pages)}"]
    has_text = any("TXTz" in p.get("layers", []) or "TXTa" in p.get("layers", []) for p in pages)
    if has_text:
        warnings.append(
            "djvu text layer present but BZZ-coded (ZP-coder tables unavailable "
            "in this environment) — page metadata only"
        )
    else:
        warnings.append("djvu has no text layer (image-only; OCR route needed)")
    lines: List[LineWithMeta] = []
    for i, p in enumerate(pages):
        if "width" in p:
            lines.append(
                LineWithMeta(
                    f"[djvu page {i}: {p['width']}x{p['height']} @ {p.get('dpi', 300)} dpi]\n",
                    metadata=LineMetadata(page_id=i, line_id=i),
                )
            )
    return UnstructuredDoc(
        lines=lines,
        warnings=warnings,
        metadata={"pages": str(len(pages))},
    )
