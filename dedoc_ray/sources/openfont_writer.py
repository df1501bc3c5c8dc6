"""Open-font scan corpus: pages RENDERED with the system DejaVu outlines.

The other scan writers draw the repo's synthetic bitmap fonts, which the
exact-LUT recognizers read back byte-perfectly — they exercise the route,
not the recognizer. This writer renders real anti-aliased vector glyphs
(the same faces readers/real_ocr.py banks), so the only recognizer that
can read the page is the open-font template OCR itself: the corpus is a
true render→recognize roundtrip at corpus scale.

Charset discipline keeps the roundtrip EXACT (the oracle is a byte-exact
SQL replay): lowercase latin + digits + space, with 'l' removed — a bare
vertical bar is pixel-identical to 'I'/'|' in DejaVu Sans, the one
genuinely shape-ambiguous glyph class (Tesseract disambiguates those with
a language model; this recognizer refuses to guess).
"""

from __future__ import annotations

from typing import List

import numpy as np

from dedoc_ray.readers.pdf_render import _glyph_raster
from dedoc_ray.sources.scan_writer import pgm_bytes
from dedoc_ray.sources.synth import chunks_of

SIZE = 20      #: render px-per-em
GAP = 1.0      #: extra blank px between glyphs (blank stays under the
               #: recognizer's space threshold ~0.24 em)
SPACE_W = 0.5  #: word-space advance in em — over the recognizer space
               #: threshold (~0.24 em) but safely under its column-gutter
               #: floor (~a line height)


def render_openfont_page(lines: List[str], size: int = SIZE) -> np.ndarray:
    """Render text lines with DejaVu glyph outlines → uint8 grayscale page
    (white paper, anti-aliased ink)."""
    strips: List[np.ndarray] = []
    for line in lines:
        asc, desc = size, size // 2
        strip = np.zeros((asc + desc, 30 * max(1, len(line)) + 40), np.float32)
        x = 4.0
        for ch in line:
            if ch == " ":
                x += SPACE_W * size
                continue
            g = _glyph_raster(ch, size, False)
            if g is None:
                x += SPACE_W * size
                continue
            img, top, adv = g
            gx, gy = int(round(x)), asc - top
            h, w = img.shape
            y0, y1 = max(0, gy), min(strip.shape[0], gy + h)
            x1 = min(strip.shape[1], gx + w)
            if y1 > y0 and x1 > gx:
                strip[y0:y1, gx:x1] = np.maximum(
                    strip[y0:y1, gx:x1], img[y0 - gy : y1 - gy, : x1 - gx]
                )
            x += adv + GAP
        strips.append(strip[:, : int(x) + 4])
    W = max((s.shape[1] for s in strips), default=10) + 8
    H = sum(s.shape[0] + 12 for s in strips) + 24
    page = np.zeros((H, W), np.float32)
    y = 12
    for s in strips:
        page[y : y + s.shape[0], 4 : 4 + s.shape[1]] = s
        y += s.shape[0] + 12
    return (255.0 - np.clip(page, 0, 1) * 255.0).astype(np.uint8)


def openfont_lines(doc_id: int, text: str) -> List[str]:
    """The page's text lines — same ' the '-split as the sibling scan
    corpora over the first 200 chars (page-decode cost bound), minus the
    shape-ambiguous 'l' (see module docstring)."""
    return [f"Document {doc_id}"] + [c.replace("l", "") for c in chunks_of(text[:200])]


def scan_openfont_pgm(doc_id: int, text: str) -> bytes:
    return pgm_bytes(render_openfont_page(openfont_lines(doc_id, text)))


# ------------------------------------------------- ruled-table corpus


def openfont_table_cells(doc_id: int, text: str) -> List[List[str]]:
    """A deterministic 3×3 cell grid from the doc's first words ('l'
    removed — same charset discipline as the line corpus)."""
    words = [w.replace("l", "") for w in text[:120].split(" ")][:9]
    while len(words) < 9:
        words.append("pad")
    return [words[0:3], words[3:6], words[6:9]]


def render_openfont_table(cells: List[List[str]], size: int = SIZE) -> np.ndarray:
    """Render a fully-ruled table: 1-px borders, one word per cell, DejaVu
    glyphs — the raster-table recognizer must read it back byte-exactly."""
    ncols = len(cells[0])
    cellw = 30 + max(len(c) for r in cells for c in r) * 14
    cellh = 44
    W = ncols * cellw + 1
    H = len(cells) * cellh + 1
    page = np.zeros((H + 40, W + 40), np.float32)
    ox, oy = 20, 20
    for i in range(len(cells) + 1):
        page[oy + i * cellh, ox : ox + W] = 1.0
    for j in range(ncols + 1):
        page[oy : oy + H, ox + j * cellw] = 1.0
    for ri, row in enumerate(cells):
        for ci, text in enumerate(row):
            xx = float(ox + ci * cellw + 8)
            y = oy + ri * cellh + 8
            for ch in text:
                if ch == " ":
                    xx += SPACE_W * size
                    continue
                g = _glyph_raster(ch, size, False)
                if g is None:
                    xx += SPACE_W * size
                    continue
                img, top, adv = g
                gy = y + size - top
                h, w = img.shape
                # clip to the page like render_openfont_page — a run of wide
                # glyphs ('m'/'w' ~21px vs the 14px/char cell budget) can
                # overflow the right margin on data-dependent input
                gx = int(xx)
                y1 = min(page.shape[0], gy + h)
                x1 = min(page.shape[1], gx + w)
                if y1 > gy and x1 > gx:
                    page[gy:y1, gx:x1] = np.maximum(page[gy:y1, gx:x1], img[: y1 - gy, : x1 - gx])
                xx += adv + GAP
    return (255.0 - np.clip(page, 0, 1) * 255.0).astype(np.uint8)


def scan_openfont_table_pgm(doc_id: int, text: str) -> bytes:
    return pgm_bytes(render_openfont_table(openfont_table_cells(doc_id, text)))
