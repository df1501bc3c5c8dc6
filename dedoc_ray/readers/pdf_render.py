"""Rasterize a born-digital PDF's text layer to a page image.

The reference's forced-OCR route (pdf_with_text_layer="false",
pdf_image_reader.py) renders every page with pdf2image and runs Tesseract
over the raster — even when the page IS born-digital (its test_pdf posts
scanned/example.pdf, a text-layer file, through exactly this route and
expects the OCR'd tree).  Neither poppler nor Tesseract exists in this
container, so the analogue is built from parts this repo already has:

- the text layer gives per-word bounding boxes in PDF points plus font
  size and bold flags (readers/pdf.py annotations);
- words are drawn with the container's DejaVu faces through the sfnt
  outline rasterizer (readers/real_ocr.py), each word horizontally
  fitted to its true bbox width (font substitution — the same thing any
  PDF viewer does for a missing font);
- the page raster then feeds the SAME recognizer chain as bare image
  scans (scan_ocr.recognize_raster → the open-font template OCR).

Map-only per page, no state beyond the glyph faces (built once per
actor), deterministic.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as np

from dedoc_ray.readers.real_ocr import _FACE_PATHS, _flatten, _raster_poly
from dedoc_ray.readers.ttf_glyphs import SfntFont

DPI = 150  #: render resolution (the reference's pdf2image default family)


@lru_cache(maxsize=1)
def _faces():
    """[(font, unicode_lookup, is_bold)] for the available DejaVu faces —
    regular Serif first, Bold Serif for bold runs."""
    import os

    out = []
    for path in _FACE_PATHS:
        if "Italic" in path or "Oblique" in path or not os.path.exists(path):
            continue
        try:
            font = SfntFont(open(path, "rb").read())
        except Exception:
            continue
        lk = font.unicode_lookup()
        if lk is not None:
            out.append((font, lk, "Bold" in path))
    return out


@lru_cache(maxsize=4096)
def _glyph_raster(ch: str, size_px: int, bold: bool):
    """(raster float (h,w), top_above_baseline_px, advance_px) or None."""
    serif_first = sorted(_faces(), key=lambda f: (f[2] != bold, ))
    for font, lk, _b in serif_first:
        gid = lk(ord(ch))
        if not gid:
            continue
        polys = _flatten(font.outline(gid))
        if not polys:
            return None  # space-like
        xs = [x for p in polys for x, _ in p]
        ys = [y for p in polys for _, y in p]
        x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
        u = font.units_per_em
        sc = size_px / u
        w = max(1, int(round((x1 - x0) * sc)))
        h = max(1, int(round((y1 - y0) * sc)))
        img = _raster_poly(polys, x0, x1, y0, y1, w, h)
        top = int(round(y1 * sc))
        adv = (x1 - x0) * sc + 0.12 * size_px
        return img, top, adv
    return None


_BBOX_RE = re.compile(r"\(([-\d.]+),([-\d.]+),([-\d.]+),([-\d.]+)\)")


def render_textlayer_page(lines, page_id: int, page_w: float, page_h: float,
                          dpi: int = DPI) -> Optional[np.ndarray]:
    """Draw one page's text-layer lines (LineWithMeta with bounding-box /
    bold annotations in PDF points) onto a white uint8 raster."""
    if not _faces():
        return None
    sc = dpi / 72.0
    H, W = int(page_h * sc) + 1, int(page_w * sc) + 1
    if H * W > 40_000_000:
        return None
    canvas = np.zeros((H, W), np.float32)  # ink accumulator
    drew = False
    for line in lines:
        if getattr(line.metadata, "page_id", 0) != page_id:
            continue
        text = line.line
        bold_ranges = [
            (a.start, a.end)
            for a in line.annotations
            if a.name == "bold" and a.value == "True"
        ]

        def is_bold(i: int) -> bool:
            return any(s <= i < e for s, e in bold_ranges)

        for a in line.annotations:
            if a.name != "bounding box":
                continue
            m = _BBOX_RE.match(a.value)
            if not m:
                continue
            bx, by, bw, bh = (float(v) for v in m.groups())
            word = text[a.start : a.end]
            if not word.strip() or bh <= 1:
                continue
            size_px = max(4, int(round(bh * sc)))
            # lay the word out at natural advances, then fit to bbox width
            strip_w = max(2, int(round(bw * sc * 1.6)))
            asc = size_px
            desc = max(2, size_px // 3)
            strip = np.zeros((asc + desc, strip_w), np.float32)
            x = 0.0
            for i, ch in enumerate(word):
                if ch == " ":
                    x += 0.30 * size_px
                    continue
                g = _glyph_raster(ch, size_px, is_bold(a.start + i))
                if g is None:
                    x += 0.30 * size_px
                    continue
                img, top, adv = g
                gx = int(round(x))
                gy = asc - top
                h_, w_ = img.shape
                y0c, y1c = max(0, gy), min(asc + desc, gy + h_)
                x0c, x1c = max(0, gx), min(strip_w, gx + w_)
                if y1c > y0c and x1c > x0c:
                    strip[y0c:y1c, x0c:x1c] = np.maximum(
                        strip[y0c:y1c, x0c:x1c],
                        img[y0c - gy : y1c - gy, x0c - gx : x1c - gx],
                    )
                x += adv
            used = int(np.ceil(x))
            if used < 2:
                continue
            # horizontal fit to the word's true bbox width (font substitution)
            target_w = max(2, int(round(bw * sc)))
            strip = strip[:, :used]
            # natural advances can overrun the laid-out strip (rotated-cell
            # PDFs report narrow bboxes): the resample index must use the
            # REAL width or it reads one column past the end
            used = strip.shape[1]
            if used != target_w:
                idx = np.clip(
                    (np.arange(target_w) * used / target_w).astype(int), 0, used - 1
                )
                strip = strip[:, idx]
            # PDF y-up: bbox y is the text TOP in our extractor's convention?
            # Empirically the extractor emits (x, y_baseline_area, w, h) with
            # y measured from the page bottom to the glyph-box bottom-ish;
            # place the word box with its TOP at page_h - y - h.
            top_pt = page_h - by - bh
            py = int(round(top_pt * sc))
            px = int(round(bx * sc))
            h_, w_ = strip.shape
            y0c, y1c = max(0, py), min(H, py + h_)
            x0c, x1c = max(0, px), min(W, px + w_)
            if y1c > y0c and x1c > x0c:
                canvas[y0c:y1c, x0c:x1c] = np.maximum(
                    canvas[y0c:y1c, x0c:x1c], strip[y0c - py : y1c - py, x0c - px : x1c - px]
                )
                drew = True
    if not drew:
        return None
    return (255.0 - np.clip(canvas, 0, 1) * 255.0).astype(np.uint8)


def page_count_and_pages(lines) -> List[int]:
    return sorted({getattr(L.metadata, "page_id", 0) for L in lines})
