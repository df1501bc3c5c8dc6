"""Deterministic synthetic scanner — renders text into PGM page rasters.

The test-side counterpart of ``readers/scan_ocr.py``: blits the same
md5-derived bitmap font onto a gray page (ink/paper levels distinct from the
binarizer's assumption-free split), optionally rotates the page 90k°, and
emits binary PGM (P5). Also wraps the raster as a textless PDF with a
DeviceGray FlateDecode image XObject — the scanned-PDF shape that the
reference routes to PdfImageReader.
"""

from __future__ import annotations

import zlib
from typing import List, Tuple

import numpy as np

from dedoc_ray.readers.scan_ocr import (
    BOLD_FONT,
    CHAR_GAP,
    FONT,
    GLYPH_H,
    INK,
    LEADING,
    MARGIN,
    PAPER,
    SPACE_ADVANCE,
)


def _line_width(text: str, bold: bool) -> int:
    font = BOLD_FONT if bold else FONT
    return sum(
        SPACE_ADVANCE if ch == " " else font.get(ch, font["?"]).shape[1] + CHAR_GAP
        for ch in text
    )


def render_page(lines: List[Tuple[str, bool]], rotate_k: int = 0, indent_px: int = 0) -> np.ndarray:
    """[(text, bold)] → uint8 page raster, rotated 90·k° counter-clockwise."""
    width = max((_line_width(t, b) for t, b in lines), default=0) + 2 * MARGIN + indent_px
    height = len(lines) * (GLYPH_H + LEADING) - LEADING + 2 * MARGIN if lines else 2 * MARGIN
    img = np.full((height, width), PAPER, dtype=np.uint8)
    y = MARGIN
    for text, bold in lines:
        font = BOLD_FONT if bold else FONT
        x = MARGIN
        for ch in text:
            if ch == " ":
                x += SPACE_ADVANCE
                continue
            bits = font.get(ch, font["?"])
            img[y : y + GLYPH_H, x : x + bits.shape[1]][bits] = INK
            x += bits.shape[1] + CHAR_GAP
        y += GLYPH_H + LEADING
    if rotate_k % 4:
        img = np.ascontiguousarray(np.rot90(img, rotate_k % 4))
    return img


def pgm_bytes(img: np.ndarray) -> bytes:
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img).tobytes()


def scan_pgm(doc_id: int, text: str) -> bytes:
    """documents row → scanned page: bold 'Document {id}' title + one body
    line per ' the '-chunk, page rotated by (doc_id % 4)·90°."""
    from dedoc_ray.sources.synth import chunks_of

    lines = [(f"Document {doc_id}", True)] + [(c, False) for c in chunks_of(text)]
    return pgm_bytes(render_page(lines, rotate_k=doc_id % 4))


def scan_2col_pgm(doc_id: int, text: str) -> bytes:
    """Two-column scanned page: bold title + first half of the chunks in
    the left column, second half in the right, separated by a 24-px
    gutter; page rotated by (doc_id % 4)·90°. Only column-aware decoding
    (left column first, then right) reproduces the reading order — a
    column-blind pass would interleave the rows with gap spaces."""
    from dedoc_ray.sources.synth import chunks_of

    chunks = chunks_of(text)
    half = (len(chunks) + 1) // 2
    left = render_page([(f"Document {doc_id}", True)] + [(c, False) for c in chunks[:half]])
    right = render_page([(c, False) for c in chunks[half:]])
    h = max(left.shape[0], right.shape[0])
    page = np.full((h, left.shape[1] + 24 + right.shape[1]), PAPER, dtype=np.uint8)
    page[: left.shape[0], : left.shape[1]] = left
    page[: right.shape[0], left.shape[1] + 24 :] = right
    if doc_id % 4:
        page = np.ascontiguousarray(np.rot90(page, doc_id % 4))
    return pgm_bytes(page)


def scan_bmp(doc_id: int, text: str) -> bytes:
    """Same scanned page encoded as a 24-bit BMP (the reference's image
    route accepts bmp/png/jpg directly — supported_image_types)."""
    from dedoc_ray.ops.media_codecs import bmp_encode
    from dedoc_ray.sources.synth import chunks_of

    lines = [(f"Document {doc_id}", True)] + [(c, False) for c in chunks_of(text)]
    return bmp_encode(render_page(lines, rotate_k=doc_id % 4))


def scan_pdf(doc_id: int, text: str) -> bytes:
    """Same raster wrapped as a TEXTLESS PDF: one page whose only content is
    a DeviceGray image XObject — the scanned-PDF input that the reference's
    PdfAutoReader hands to PdfImageReader (pdf_auto_reader.py OCR route)."""
    from dedoc_ray.sources.synth import chunks_of

    lines = [(f"Document {doc_id}", True)] + [(c, False) for c in chunks_of(text)]
    img = render_page(lines, rotate_k=doc_id % 4)
    h, w = img.shape
    payload = zlib.compress(np.ascontiguousarray(img).tobytes())
    content = b"q %d 0 0 %d 36 36 cm /Im0 Do Q" % (w, h)
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im0 5 0 R >> >> "
        b"/MediaBox [0 0 612 792] /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length %d >> stream\n" % len(content) + content + b"\nendstream endobj",
        b"5 0 obj << /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /FlateDecode /Length %d >> stream\n"
        % (w, h, len(payload))
        + payload
        + b"\nendstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def scan_pdf_jbig2(doc_id: int, text: str) -> bytes:
    """Same textless scanned PDF with the page raster JBIG2-compressed
    (/Filter /JBIG2Decode — the dominant bilevel codec in real scanner
    PDFs; the reference decodes it through pdfbox + jbig2-imageio).
    The bilevel bitmap goes through ops/jbig2.py's arithmetic
    generic-region encoder, exercising the embedded segment layer end to
    end in the OCR route."""
    from dedoc_ray.ops.jbig2 import jbig2_encode_embedded
    from dedoc_ray.sources.synth import chunks_of

    lines = [(f"Document {doc_id}", True)] + [(c, False) for c in chunks_of(text)]
    img = render_page(lines, rotate_k=doc_id % 4)
    h, w = img.shape
    payload = jbig2_encode_embedded((img < 128).astype(np.uint8), tpgdon=True)
    return _jbig2_pdf(payload, w, h)


def scan_pdf_jbig2_sym(doc_id: int, text: str) -> bytes:
    """Same textless scanned PDF with the raster SYMBOL-coded (JBIG2
    symbol dictionary + text region — the layout real scanner encoders
    like jbig2enc emit for textual pages): connected components dedupe
    into a dictionary, placements decode through the IADT/IAFS/IADS/IAID
    strip machinery of ops/jbig2.py."""
    from dedoc_ray.ops.jbig2 import jbig2_encode_symbols
    from dedoc_ray.sources.synth import chunks_of

    lines = [(f"Document {doc_id}", True)] + [(c, False) for c in chunks_of(text)]
    img = render_page(lines, rotate_k=doc_id % 4)
    h, w = img.shape
    payload = jbig2_encode_symbols((img < 128).astype(np.uint8))
    return _jbig2_pdf(payload, w, h)


def _jbig2_pdf(payload: bytes, w: int, h: int) -> bytes:
    content = b"q %d 0 0 %d 36 36 cm /Im0 Do Q" % (w, h)
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Resources << /XObject << /Im0 5 0 R >> >> "
        b"/MediaBox [0 0 612 792] /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length %d >> stream\n" % len(content) + content + b"\nendstream endobj",
        b"5 0 obj << /Type /XObject /Subtype /Image /Width %d /Height %d "
        b"/ColorSpace /DeviceGray /BitsPerComponent 1 /Filter /JBIG2Decode /Length %d >> stream\n"
        % (w, h, len(payload))
        + payload
        + b"\nendstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def scan_png(doc_id: int, text: str) -> bytes:
    """Same scanned page encoded as grayscale PNG (supported_image_types)."""
    from dedoc_ray.ops.media_codecs import png_encode
    from dedoc_ray.sources.synth import chunks_of

    lines = [(f"Document {doc_id}", True)] + [(c, False) for c in chunks_of(text)]
    return png_encode(render_page(lines, rotate_k=doc_id % 4))


def scan_tiff(doc_id: int, text: str) -> bytes:
    """Same scanned page as grayscale TIFF — the classic scanner output;
    every third doc is PackBits-compressed so both strips paths run."""
    from dedoc_ray.ops.media_codecs import tiff_encode
    from dedoc_ray.sources.synth import chunks_of

    lines = [(f"Document {doc_id}", True)] + [(c, False) for c in chunks_of(text)]
    return tiff_encode(render_page(lines, rotate_k=doc_id % 4), packbits=(doc_id % 3 == 0))


def scan_tiff_multipage(doc_id: int, text: str) -> bytes:
    """Two-page chained-IFD TIFF (the classic scanner batch container):
    title + first half of the chunks on page 0, the rest on page 1 — the
    reader must walk the IFD chain and keep page order, so the extracted
    text equals the single-page oracle byte for byte."""
    from dedoc_ray.ops.media_codecs import tiff_encode_pages
    from dedoc_ray.sources.synth import chunks_of

    chunks = chunks_of(text)
    k = len(chunks) // 2
    p1 = render_page([(f"Document {doc_id}", True)] + [(c, False) for c in chunks[:k]])
    p2 = render_page([(c, False) for c in chunks[k:]])
    return tiff_encode_pages([p1, p2])


def scan_exif_tiff(doc_id: int, text: str) -> bytes:
    """Scanner-output TIFF with camera EXIF metadata, every field a pure
    function of doc_id so the EXIF extractor's output is SQL-replayable
    (reference ImageMetadataExtractor field set)."""
    from dedoc_ray.ops.media_codecs import tiff_encode
    from dedoc_ray.sources.synth import chunks_of

    s = doc_id % 86400
    hh, mm, ss = s // 3600, (s // 60) % 60, s % 60
    exif = {
        "software": f"ScanSuite {doc_id % 5}.{doc_id % 3}",
        "make": f"Maker{doc_id % 4}",
        "model": f"Model {doc_id % 6}",
        "orientation": doc_id % 8 + 1,
        "date_time": f"2022:05:01 {hh:02d}:{mm:02d}:{ss:02d}",
    }
    lines = [(f"Document {doc_id}", True)] + [(c, False) for c in chunks_of(text)]
    return tiff_encode(render_page(lines), exif=exif)


# ---------------------------------------------------- proportional family
#
# A second deterministic font FAMILY: per-glyph proportional widths (3..7
# px) and integer pixel scaling — pages the fixed-width recognizer cannot
# read. The reader side never imports these tables: it LEARNS templates
# from a rendered atlas image (readers/scan_ocr.MultifontRecognizer), the
# honest stand-in for Tesseract's font-sample training flow.

import hashlib as _hashlib

from dedoc_ray.readers.scan_ocr import CHARSET as _CHARSET


def _prop_glyph_bits(ch: str, salt: int = 0) -> np.ndarray:
    h = _hashlib.md5(f"propfont-{ord(ch)}-{salt}".encode()).digest()
    w = 3 + h[0] % 5
    bits = np.unpackbits(np.frombuffer(h[1:], np.uint8))[: GLYPH_H * w]
    bits = bits.reshape(GLYPH_H, w).astype(bool).copy()
    # every COLUMN needs ink (glyph segmentation splits on blank columns)
    for j in range(w):
        if not bits[:, j].any():
            bits[h[(3 + j) % 16] % GLYPH_H, j] = True
    # top+bottom rows need ink so line bands are exactly GLYPH_H tall
    if not bits[0].any():
        bits[0, h[1] % w] = True
    if not bits[GLYPH_H - 1].any():
        bits[GLYPH_H - 1, h[2] % w] = True
    return bits


def _build_prop_font():
    font = {}
    seen = {}
    for ch in _CHARSET:
        salt = 0
        bits = _prop_glyph_bits(ch, salt)
        while (bits.shape[1], bits.tobytes()) in seen:
            salt += 1
            bits = _prop_glyph_bits(ch, salt)
        seen[(bits.shape[1], bits.tobytes())] = ch
        font[ch] = bits
    return font


PROP_FONT = _build_prop_font()


def render_page_prop(lines: List[str], scale: int = 1, rotate_k: int = 0) -> np.ndarray:
    """Text lines in the proportional family → page raster, integer-scaled
    ×``scale`` (nearest-neighbor, like a higher-resolution rescan)."""
    def lw(text: str) -> int:
        return sum(
            SPACE_ADVANCE if ch == " " else PROP_FONT.get(ch, PROP_FONT["?"]).shape[1] + CHAR_GAP
            for ch in text
        )

    width = max((lw(t) for t in lines), default=0) + 2 * MARGIN
    height = len(lines) * (GLYPH_H + LEADING) - LEADING + 2 * MARGIN if lines else 2 * MARGIN
    img = np.full((height, width), PAPER, dtype=np.uint8)
    y = MARGIN
    for text in lines:
        x = MARGIN
        for ch in text:
            if ch == " ":
                x += SPACE_ADVANCE
                continue
            bits = PROP_FONT.get(ch, PROP_FONT["?"])
            img[y : y + GLYPH_H, x : x + bits.shape[1]][bits] = INK
            x += bits.shape[1] + CHAR_GAP
        y += GLYPH_H + LEADING
    if scale > 1:
        img = np.repeat(np.repeat(img, scale, axis=0), scale, axis=1)
    if rotate_k % 4:
        img = np.ascontiguousarray(np.rot90(img, rotate_k % 4))
    return img


def render_prop_atlas(per_row: int = 12) -> np.ndarray:
    """The font-sample page a recognizer learns from: every CHARSET glyph
    in order, ``per_row`` per line, separated by wide gaps so atlas
    segmentation is unambiguous (spaces never appear in the atlas)."""
    rows = []
    for i in range(0, len(_CHARSET), per_row):
        chars = _CHARSET[i : i + per_row].replace(" ", "")
        if chars:
            rows.append("  ".join(chars))  # 2 spaces → unambiguous glyph gaps
    return render_page_prop(rows, scale=1)


def scan_multifont_pgm(doc_id: int, text: str) -> bytes:
    """Corpus page in the proportional family at scale 1 or 2 (doc_id
    parity) — unreadable by the fixed-width LUT, decoded only by the
    atlas-learned template recognizer."""
    from dedoc_ray.sources.synth import chunks_of

    lines = [f"Document {doc_id}"] + list(chunks_of(text))
    return pgm_bytes(render_page_prop(lines, scale=1 + doc_id % 2))
