"""Open-font template OCR for REAL scans — the Tesseract-shaped recognizer.

The fixed-width LUT in readers/scan_ocr.py and the atlas-learned
MultifontRecognizer only read rasters written by this repo's own scan
writers (exact bitmap equality).  Real scanned pages — the reference's
tests/data/scanned fixtures: anti-aliased serif text, arbitrary sizes,
scanner noise, rotations — need an actual shape recognizer.  The reference
shells out to Tesseract (pdf_image_reader/ocr/ocr_line_extractor.py:11-48);
this module is a from-scratch classical template OCR over the SAME route:

1. **Glyph bank**: every charset glyph rasterized from the container's
   DejaVu faces (Sans/Serif × Regular/Bold/Italic) with the sfnt outline
   parser from readers/ttf_glyphs.py — three render variants per glyph (a
   supersampled smooth one plus 11 px / 15 px quantized ones that mimic
   how small print rasterizes), bbox-normalized to a 24×24 anti-aliased
   grid plus em-relative size features (height, y-center vs baseline,
   width).
2. **Page cleanup**: long-rule stripping (frames/borders defeat blank-row
   and blank-column detection), small-angle shear deskew by row-projection
   sharpness, optional adaptive local-mean binarization + despeckle for
   noisy photocopies (the reference's need_binarization knob).
3. **Columns then lines**: gutter split FIRST (two columns whose baselines
   interleave have no blank rows in a full-width projection), then
   noise-robust horizontal projection per column (row ink COUNT, not
   `.any()`), per-band baseline from the modal run bottom.
4. **Scale hypotheses**: the tallest ink alone cannot tell cap-height from
   x-height, so each band is decoded under ppem = h/0.74, h/0.63, h/0.54
   and the hypothesis with the best mean match score wins.
5. **Segmentation DP**: glyph runs from the grayscale column profile; wide
   runs get cut candidates at profile valleys (serif faces connect whole
   words through baseline serifs).  A valley whose bridge column is faint
   is a HARD cut (kissing letters — grouping may not cross); solid-ink
   valleys are soft (н's crossbar survives).  A DP over the atoms picks
   the segmentation maximizing Σ (match − margin)·width, with cross-run
   grouping whitelisted to the genuinely multi-part glyphs (ы Ы « »);
   candidate segments batch into ONE matmul per band.
6. **Match**: normalized cross-correlation on the 24×24 grid — max over
   two penalized vertical-warp row remaps (faces place е-crossbar-style
   internal features at different heights) — plus penalties on the
   em-relative size features (separates о/О/0-style case confusables),
   with a per-page script-coherence pass voted over script-DISTINCTIVE
   letters only (с/о/а/е homoglyphs are coin flips).
7. **Orientation**: row-projection-sharpness prefilter (sideways pages
   lose structure) then char-weighted trial recognition of the best bands
   in the surviving rotations — the ColumnsOrientationClassifier decision
   (reference: columns_orientation_classifier.py, a CNN) made by trial
   recognition.

Scale shape: map-only per page; the bank is built once per actor
(stateful-stage rule) from the system DejaVu faces; no shuffle, no
cross-row state.  Pages where the fonts are absent fall back to the
synthetic recognizers (the bank is None and callers skip this path).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from dedoc_ray.readers.ttf_glyphs import SfntFont, _DEJAVU_PATHS

GRID = 24  #: bbox-normalized match resolution

_FACE_PATHS = _DEJAVU_PATHS + (
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Italic.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Oblique.ttf",
)
_BOLD_FACES = frozenset(
    i for i, p in enumerate(_FACE_PATHS) if "Bold" in p
)

CHARSET = (
    "абвгдежзийклмнопрстуфхцчшщъыьэюя"
    "АБВГДЕЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
    ".,:;!?()-—–«»№/%\"'+=*"
    "ёЁ"
)

#: glyphs that legitimately span two column runs (everything else that the
#: DP would stitch across a real inter-letter gap is an over-merge: тат→ш)
_MULTI_RUN = frozenset("ыЫ«»")

#: letters whose SHAPE identifies the script (no Latin/Cyrillic homoglyph)
# score penalty for out-of-script templates under the page's script mask —
# soft, so a clearly-better out-of-script glyph (Latin part numbers inside
# Russian text) can still win; sized above the homoglyph noise floor
# (identical-shape pairs tie within ~0.02) and below a true shape
# difference (R vs its best Cyrillic stand-in loses ~0.2 of NCC)
_MASK_PENALTY = 0.12
# …and an out-of-script win additionally needs this absolute match quality:
# on DEGRADED scans every read is noisy (0.4-0.6) and margins are spurious,
# while a genuine crisp Latin token inside Russian text matches 0.8+
_MASK_FLOOR = 0.62

_DISTINCT_CYR = frozenset("бвгджзийлмнптфцчшщъыьэюяБГДЁЖЗИЙЛПЦЧШЩЪЫЬЭЮЯё")
_DISTINCT_LAT = frozenset("bdfghijklmnqrstuvwzDFGIJLNQRSUVWZ")

_SCALE_RATIOS = (0.74, 0.63, 0.54)  #: tall-ink-to-em hypotheses

#: lowercase letters whose ascender/descender pins the em scale — their
#: presence in a confident read makes the other scale hypotheses moot
_SCALE_PINNING = frozenset("bdfghjklpqtyбдруфщц")
_MARGIN = 0.25  #: DP per-pixel score margin (segmentation prior)


def _flatten(contours) -> List[List[Tuple[float, float]]]:
    """TrueType contours → polygons (quadratics flattened, off-curve-only
    contours reconstructed), font units."""
    polys = []
    for c in contours:
        on_idx = next((i for i, p in enumerate(c) if p[2]), None)
        if on_idx is None:
            mids = []
            for i in range(len(c)):
                a, b = c[i], c[(i + 1) % len(c)]
                mids.append(((a[0] + b[0]) / 2, (a[1] + b[1]) / 2, 1))
            merged = []
            for i in range(len(c)):
                merged.append(mids[i - 1])
                merged.append(c[i])
            c = merged
            on_idx = 0
        c = c[on_idx:] + c[:on_idx]
        pts = [(c[0][0], c[0][1])]
        prev_off = None
        for pt in list(c[1:]) + [c[0]]:
            if pt[2]:
                if prev_off is None:
                    pts.append((pt[0], pt[1]))
                else:
                    p0, p1 = pts[-1], prev_off
                    for t in (0.2, 0.4, 0.6, 0.8, 1.0):
                        x = (1 - t) ** 2 * p0[0] + 2 * (1 - t) * t * p1[0] + t * t * pt[0]
                        y = (1 - t) ** 2 * p0[1] + 2 * (1 - t) * t * p1[1] + t * t * pt[1]
                        pts.append((x, y))
                    prev_off = None
            else:
                if prev_off is not None:
                    mid = ((prev_off[0] + pt[0]) / 2, (prev_off[1] + pt[1]) / 2)
                    p0, p1 = pts[-1], prev_off
                    for t in (0.2, 0.4, 0.6, 0.8, 1.0):
                        x = (1 - t) ** 2 * p0[0] + 2 * (1 - t) * t * p1[0] + t * t * mid[0]
                        y = (1 - t) ** 2 * p0[1] + 2 * (1 - t) * t * p1[1] + t * t * mid[1]
                        pts.append((x, y))
                prev_off = pt
        polys.append(pts)
    return polys


def _raster_poly(polys, x0, x1, y0, y1, W, H) -> np.ndarray:
    """Anti-aliased non-zero-winding scanline fill of font-unit polygons
    onto a W×H grid covering [x0,x1]×[y0,y1] (top row = y1): per-row span
    fill with fractional edge coverage."""
    img = np.zeros((H, W), np.float32)
    sx = W / (x1 - x0)
    sy = H / (y1 - y0)
    for row in range(H):
        ys = y1 - (row + 0.5) / sy
        crossings = []
        for poly in polys:
            for (xa, ya), (xb, yb) in zip(poly, poly[1:] + poly[:1]):
                if (ya <= ys < yb) or (yb <= ys < ya):
                    t = (ys - ya) / (yb - ya)
                    crossings.append((xa + t * (xb - xa), 1 if yb > ya else -1))
        crossings.sort()
        wind = 0
        px = None
        for x, d in crossings:
            if wind != 0 and px is not None:
                ca = (px - x0) * sx
                cb = (x - x0) * sx
                ia, ib = int(np.floor(ca)), int(np.floor(cb))
                if ia == ib:
                    if 0 <= ia < W:
                        img[row, ia] += cb - ca
                else:
                    if 0 <= ia < W:
                        img[row, ia] += ia + 1 - ca
                    if 0 <= ib < W:
                        img[row, ib] += cb - ib
                    img[row, max(0, ia + 1) : max(0, min(W, ib))] += 1.0
            wind += d
            px = x
    return np.clip(img, 0.0, 1.0)


def _resize(img: np.ndarray, H: int, W: int) -> np.ndarray:
    """Resize (float32): bilinear when upscaling, AREA-average when
    downscaling — bilinear downsampling point-samples and can drop a
    1-px stroke entirely (е's crossbar), area averaging preserves its
    ink mass."""
    h, w = img.shape
    if h > H or w > W:
        # integral-image area average over fractional boxes, axis at a time
        def area_axis(m: np.ndarray, n_out: int) -> np.ndarray:
            n_in = m.shape[0]
            if n_in == n_out:
                return m
            cs = np.zeros((n_in + 1,) + m.shape[1:], np.float64)
            np.cumsum(m, axis=0, out=cs[1:])
            edges = np.linspace(0.0, n_in, n_out + 1)
            lo = np.floor(edges).astype(int)
            frac = edges - lo
            lo = np.clip(lo, 0, n_in)
            vals = cs[lo] + frac[(...,) + (None,) * (m.ndim - 1)] * (
                cs[np.clip(lo + 1, 0, n_in)] - cs[lo]
            )
            out = np.diff(vals, axis=0)
            widths = np.diff(edges)
            return (out / widths[(...,) + (None,) * (m.ndim - 1)]).astype(np.float32)

        tmp = area_axis(img.astype(np.float64), H)
        return area_axis(tmp.T, W).T.astype(np.float32)
    ys = (np.arange(H) + 0.5) * h / H - 0.5
    xs = (np.arange(W) + 0.5) * w / W - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[:, None]
    fx = np.clip(xs - x0, 0, 1)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx + c * fy * (1 - fx) + d * fy * fx


class RealScanOCR:
    """The recognizer. Build once per actor; ``decode_page`` per raster."""

    def __init__(self) -> None:
        import os

        entries = []  # (char, face, grid, rel_h, rel_yc, rel_w)
        for fi, path in enumerate(_FACE_PATHS):
            if not os.path.exists(path):
                continue
            try:
                font = SfntFont(open(path, "rb").read())
            except Exception:
                continue
            lk = font.unicode_lookup()
            if lk is None:
                continue
            u = font.units_per_em
            for ch in CHARSET:
                gid = lk(ord(ch))
                if not gid:
                    continue
                polys = _flatten(font.outline(gid))
                if not polys:
                    continue
                xs = [x for p in polys for x, _ in p]
                ys = [y for p in polys for _, y in p]
                x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
                if x1 - x0 < 1 or y1 - y0 < 1:
                    continue
                rh = (y1 - y0) / u
                ryc = ((y0 + y1) / 2) / u
                rw = (x1 - x0) / u
                big = _raster_poly(polys, x0, x1, y0, y1, GRID * 2, GRID * 2)
                entries.append((ch, fi, _resize(big, GRID, GRID), rh, ryc, rw))
                for hs in (11, 15):  # quantized small-print variants
                    ws = max(2, int(round(hs * (x1 - x0) / (y1 - y0))))
                    small = _raster_poly(polys, x0, x1, y0, y1, ws, hs)
                    entries.append((ch, fi, _resize(small, GRID, GRID), rh, ryc, rw))
        self.ok = bool(entries)
        if not self.ok:
            return
        self.chars: List[str] = [e[0] for e in entries]
        self.faces = np.array([e[1] for e in entries])
        grids = np.stack([e[2] for e in entries]).reshape(len(entries), -1)
        gm = grids - grids.mean(axis=1, keepdims=True)
        self.gn = gm / np.maximum(np.linalg.norm(gm, axis=1, keepdims=True), 1e-6)
        self.rel_h = np.array([e[3] for e in entries], np.float32)
        self.rel_yc = np.array([e[4] for e in entries], np.float32)
        self.rel_w = np.array([e[5] for e in entries], np.float32)
        # templates that are themselves (near-)solid bars — the only legal
        # matches for a zero-variance patch (see _match_batch): tall-narrow
        # AND high fill (l, I, solid-rendered i) — the geometry gate keeps
        # blurry small-size variants of wide letters out
        self._alnum = np.array([c.isalnum() for c in self.chars], dtype=float)
        self._lower = np.array([c.islower() for c in self.chars], dtype=float)
        self._barlike = np.array(
            [
                bool(e[5] < 0.30 * e[3] and float(e[2].mean()) > 0.5)
                for e in entries
            ]
        )
        # wide flat solid glyphs (hyphen/underscore/equals family) — the
        # horizontal analogue of _barlike; their bbox has near-zero NCC
        # variance so they too are decided by size features alone
        self._dashlike = np.array(
            [
                bool(e[3] < 0.5 * e[5] and float(e[2].mean()) > 0.4)
                for e in entries
            ]
        )
        carr = np.array(self.chars)
        self._cyr = np.array([("Ѐ" <= c <= "ӿ") for c in carr])
        self._lat = np.array([c.isalpha() and c.isascii() for c in carr])
        self._bold = np.array([f in _BOLD_FACES for f in self.faces])

    # ------------------------------------------------------------ matching

    def _match_batch(self, band_ink, cands, ppem, baseline, mask, allow_bar=None):
        """Match MANY candidate segments at once — one BLAS matmul per band
        instead of thousands of small ones (the 100× page-decode speedup).

        cands: list of (a0, a1). Returns list of (char, score, bank_idx) or
        None per candidate."""
        vecs = []
        feats = []
        keep = []
        out: List[Optional[tuple]] = [None] * len(cands)
        for ci, (a0, a1) in enumerate(cands):
            sub = band_ink[:, a0:a1]
            rm = sub.max(axis=1)
            rr = np.where(rm > 0.3)[0]
            if rr.size == 0:
                continue
            tp, bt = int(rr.min()), int(rr.max())
            ft = (
                (bt - tp + 1) / ppem,
                (baseline - (tp + bt) / 2) / ppem,
                (a1 - a0) / ppem,
            )
            ink_cols = int((sub.max(axis=0) > 0.3).sum())
            solid_rows = float((sub[tp : bt + 1].max(axis=1) > 0.45).mean())
            g = _resize(sub[tp : bt + 1], GRID, GRID).reshape(-1)
            fill = float(g.mean())
            g = g - fill
            n = np.linalg.norm(g)
            # bar matching only for atoms that are COMPLETE runs: a real
            # i/l is never produced by cutting a wider glyph, while stem
            # fragments of cut glyphs pass every geometric bar test
            is_bar = (
                (allow_bar is None or allow_bar[ci])
                and ink_cols <= max(2, int(0.12 * ppem))
                and (bt - tp + 1) >= 3.5 * max(1, ink_cols)
                and solid_rows > 0.95
            )
            ink_rows = bt - tp + 1
            # a hyphen/underscore: flat wide solid stroke — the NCC path is
            # meaningless (zero variance) and the vertical-bar path never
            # matches it, so "SN-2044" silently lost its dash. The solidity
            # reduction only runs once the cheap geometry gate passes.
            is_dash = ink_rows <= max(2, int(0.15 * ppem)) and ink_cols >= max(3, 2 * ink_rows)
            if is_dash:
                solid_cols = float((sub[tp : bt + 1].max(axis=0) > 0.45).mean())
                is_dash = solid_cols > 0.9
            if is_dash:
                sc = (
                    np.where(self._dashlike, 0.6, -1.0)
                    - 1.4 * np.abs(self.rel_h - ft[0])
                    - 1.2 * np.abs(self.rel_yc - ft[1])
                    - 0.5 * np.abs(self.rel_w - ft[2])
                )
                if mask is not None:
                    sc = np.where(mask, sc, -10.0)
                j = int(np.argmax(sc))
                if sc[j] > 0.0:
                    out[ci] = (self.chars[j], float(sc[j]), j)
                continue
            if n < 1e-6 or is_bar:
                # a SOLID BAR fills its bbox (l, I, dotless-rendered i) —
                # (near-)zero variance, NCC meaningless; decide among the
                # bar-shaped templates by the size features alone
                sc = (
                    np.where(self._barlike, 0.6, -1.0)
                    + 0.05 * self._alnum  # i/l over !/' on feature ties
                    + 0.04 * self._lower  # i over I: lowercase-frequency
                    # prior — a solid bar carries no case information
                    # (DejaVu i's dot tops at exactly cap height)
                    - 1.4 * np.abs(self.rel_h - ft[0])
                    - 1.2 * np.abs(self.rel_yc - ft[1])
                    - 0.5 * np.abs(self.rel_w - ft[2])
                )
                if mask is not None:
                    # bars (l/I/1/!) carry no script information — hard mask
                    sc = np.where(mask, sc, -10.0)
                j = int(np.argmax(sc))
                if sc[j] > 0.0:
                    out[ci] = (self.chars[j], float(sc[j]), j)
                continue
            vecs.append(g / n)
            feats.append(ft)
            keep.append(ci)
        if not vecs:
            return out
        V = np.stack(vecs)  # (m, GRID*GRID)
        # vertical-warp-max NCC: different faces place internal features
        # (е's crossbar) at different heights — correlate each patch also
        # under two smooth monotone row remaps (edges pinned, mid-grid
        # features move ~2 rows) and keep the best. Warped copies are
        # re-normalized so the maximum is a true NCC.
        ncc = V @ self.gn.T  # (m, n_bank)
        Vg = V.reshape(-1, GRID, GRID)
        for a in (0.82, 1.22):
            rows = np.clip(
                (GRID * (np.arange(GRID) / GRID) ** a).astype(int), 0, GRID - 1
            )
            Vw = Vg[:, rows, :].reshape(len(vecs), -1)
            Vw = Vw - Vw.mean(axis=1, keepdims=True)
            n = np.maximum(np.linalg.norm(Vw, axis=1, keepdims=True), 1e-6)
            np.maximum(ncc, (Vw / n) @ self.gn.T - 0.05, out=ncc)
        F = np.array(feats, np.float32)
        sc = (
            ncc
            - 1.4 * np.abs(self.rel_h[None, :] - F[:, 0:1])
            - 1.2 * np.abs(self.rel_yc[None, :] - F[:, 1:2])
            - 0.5 * np.abs(self.rel_w[None, :] - F[:, 2:3])
        )
        if mask is not None:
            # SOFT mask: the script vote is a prior, not a law — identical
            # homoglyphs (О/O, С/C) stay in-script because their score tie
            # loses to the penalty, but a DISTINCTIVE out-of-script glyph
            # (the R in a "KR13" part number inside Russian text, S vs 5)
            # wins when its match beats the best in-script read by more
            # than the penalty AND clears an absolute quality floor —
            # degraded scans produce noisy margins at low scores, crisp
            # foreign tokens match high
            sc_in = np.where(mask[None, :], sc, -10.0)
            js_in = np.argmax(sc_in, axis=1)
            js_all = np.argmax(sc, axis=1)
            rows = np.arange(len(js_in))
            use_out = (sc[rows, js_all] - sc_in[rows, js_in] > _MASK_PENALTY) & (
                sc[rows, js_all] >= _MASK_FLOOR
            )
            js = np.where(use_out, js_all, js_in)
            sc = np.where(use_out[:, None], sc, sc_in)
        else:
            js = np.argmax(sc, axis=1)
        for row, ci in enumerate(keep):
            j = int(js[row])
            out[ci] = (self.chars[j], float(sc[row, j]), j)
        return out

    # ---------------------------------------------------------- one band

    def _decode_band(self, ink, t, b, script_mask=None):
        """One text band → (text, mean_score, ppem, bold_ranges, x0)."""
        t0 = max(0, t - 2)
        b0 = min(ink.shape[0], b + 3)
        band_ink = ink[t0:b0]
        colmax = band_ink.max(axis=0)
        runs: List[Tuple[int, int]] = []
        s = None
        on = colmax >= 0.25
        for j in range(len(on) + 1):
            v = on[j] if j < len(on) else False
            if v and s is None:
                s = j
            elif not v and s is not None:
                runs.append((s, j))
                s = None
        if not runs:
            return None
        binb = band_ink > 0.4
        bots, tops = [], []
        for s_, e_ in runs:
            rr = np.where(binb[:, s_:e_].any(axis=1))[0]
            if rr.size:
                bots.append(int(rr.max()))
                tops.append(int(rr.min()))
        if not bots:
            return None
        baseline = float(np.median(np.array(bots)))
        h_tall = baseline - min(tops) + 1
        if h_tall < 4:
            return None
        best = None
        for ratio in _SCALE_RATIOS:
            ppem = h_tall / ratio
            atoms: List[Tuple[int, int, float]] = []  # (a0, a1, gap_before)
            prev_e = None
            for (s_, e_) in runs:
                gap = (s_ - prev_e) if prev_e is not None else 1e9
                w = e_ - s_
                cuts: List[Tuple[int, bool]] = [(s_, False)]
                if w > 0.55 * ppem:
                    prof = band_ink[:, s_:e_].sum(axis=0)
                    cmax = band_ink[:, s_:e_].max(axis=0)
                    nz = prof[prof > 0.1]
                    thr = 0.45 * float(np.median(nz)) if nz.size else 0.0
                    low = prof <= thr
                    j = 2
                    jlast = -9
                    while j < w - 2:
                        if low[j]:
                            j2 = j
                            while j2 < w - 2 and low[j2]:
                                j2 += 1
                            mid = j + int(np.argmin(prof[j:j2])) if j2 > j else j
                            if mid - jlast >= 3:
                                cuts.append((s_ + mid, bool(cmax[mid] < 0.32)))
                                jlast = mid
                            j = j2
                        j += 1
                cuts.append((e_, False))
                for ci in range(len(cuts) - 1):
                    c0, c1 = cuts[ci][0], cuts[ci + 1][0]
                    hard = cuts[ci][1]
                    gb = gap if ci == 0 else (-1.0 if hard else 0.0)
                    atoms.append((c0, c1, gb))
                prev_e = e_
            n = len(atoms)
            NEG = -1e9
            # enumerate every legal (i, k) group once, batch-match, then DP
            groups: List[Tuple[int, int, bool]] = []  # (i, k, cross)
            for i in range(n):
                for k in range(1, 5):
                    if i + k > n:
                        break
                    cross = any(atoms[i + t_][2] > 0 for t_ in range(1, k))
                    if k > 1 and atoms[i + k - 1][2] > 0.16 * ppem:
                        break
                    if k > 1 and any(atoms[i + t_][2] < 0 for t_ in range(1, k)):
                        break  # hard cut: kissing letters, no grouping across
                    a0, a1 = atoms[i][0], atoms[i + k - 1][1]
                    if (a1 - a0) > 1.5 * ppem and k > 1:
                        break
                    groups.append((i, k, cross))
            # an atom group is a full intact run iff it is a single atom
            # whose neighbors both lie across run boundaries (gap != 0)
            def _full_run(i, k):
                if k != 1:
                    return False
                if atoms[i][2] == 0:
                    return False  # starts mid-run (after a cut)
                return i + 1 >= len(atoms) or atoms[i + 1][2] != 0
            matches = self._match_batch(
                band_ink,
                [(atoms[i][0], atoms[i + k - 1][1]) for i, k, _ in groups],
                ppem,
                baseline,
                script_mask,
                allow_bar=[_full_run(i, k) for i, k, _ in groups],
            )
            dp = np.full(n + 1, NEG)
            dp[0] = 0.0
            bk: List[Optional[tuple]] = [None] * (n + 1)
            by_start: Dict[int, List[Tuple[int, bool, Optional[tuple]]]] = {}
            for (i, k, cross), m in zip(groups, matches):
                by_start.setdefault(i, []).append((k, cross, m))
            for i in range(n):
                if dp[i] <= NEG / 2:
                    continue
                for k, cross, m in by_start.get(i, ()):
                    if m is None:
                        if k == 1 and dp[i] > dp[i + 1]:
                            dp[i + 1] = dp[i]
                            bk[i + 1] = (i, None, 0.0)
                        continue
                    if cross and m[0] not in _MULTI_RUN:
                        continue
                    a0, a1 = atoms[i][0], atoms[i + k - 1][1]
                    val = dp[i] + (m[1] - _MARGIN) * (a1 - a0)
                    if val > dp[i + k]:
                        dp[i + k] = val
                        bk[i + k] = (i, m, atoms[i][2])
            seq = []
            i = n
            ok = True
            while i > 0:
                if bk[i] is None:
                    ok = False
                    break
                prev, m, gapb = bk[i]
                seq.append((m, gapb))
                i = prev
            if not ok:
                continue
            parts: List[str] = []
            bolds: List[bool] = []
            ssum = 0.0
            cnt = 0
            for m, gapb in reversed(seq):
                if 0.24 * ppem < gapb < 1e8:
                    parts.append(" ")
                    bolds.append(False)
                if m:
                    parts.append(m[0])
                    bolds.append(bool(self._bold[m[2]]))
                    ssum += m[1]
                    cnt += 1
            if not cnt:
                continue
            mean = ssum / cnt
            if best is None or mean > best[1]:
                best = ("".join(parts), mean, ppem, bolds)
            if mean >= 0.82 and any(c in _SCALE_PINNING for c in parts):
                # confident read at this scale AND the text contains a
                # glyph whose ascender/descender pins the em topology —
                # an all-x-height line ("sow va") ties between the cap
                # and x-height interpretations and must try them all;
                # otherwise alternative hypotheses only ever lose (clean
                # renders decide on the first try; 3x page-decode cost
                # saved on exactly the pages that dominate a corpus run)
                break
        if best is None:
            return None
        text, mean, ppem, bolds = best
        # word-level bold ranges: per-glyph face attribution is noisy, so a
        # WORD is bold when ≥60% of its glyphs matched a bold face; adjacent
        # bold words merge across the space (whole-line bold = one range)
        ranges: List[Tuple[int, int]] = []
        ws = 0
        words: List[Tuple[int, int, bool]] = []
        for idx in range(len(text) + 1):
            if idx == len(text) or text[idx] == " ":
                if idx > ws:
                    flags = bolds[ws:idx]
                    words.append((ws, idx, sum(flags) >= 0.6 * len(flags)))
                ws = idx + 1
        for w0, w1, bl in words:
            if not bl:
                continue
            if ranges and text[ranges[-1][1] : w0].strip() == "" and ranges[-1][1] + 2 >= w0:
                ranges[-1] = (ranges[-1][0], w1)
            else:
                ranges.append((w0, w1))
        x0 = runs[0][0]
        return text, mean, ppem, ranges, x0

    # --------------------------------------------------------------- page

    @staticmethod
    def _bands(ink: np.ndarray, expand: bool = True, with_flags: bool = False):
        """Noise-robust line bands: row ink COUNT threshold, then edges
        expanded over adjacent lightly-inked rows — on a wide page the
        scaled threshold would otherwise trim sparse glyph-top rows (a
        capital D's flat top) and deform the shapes."""
        counts = (ink > 0.45).sum(axis=1)
        # capped: a lone short word on a very wide page still makes a band
        need = max(2, min(ink.shape[1] // 400, 8))
        rows = counts >= need
        bands = []
        top = None
        for i in range(len(rows) + 1):
            v = rows[i] if i < len(rows) else False
            if v and top is None:
                top = i
            elif not v and top is not None:
                if i - top >= 4:
                    bands.append((top, i))
                top = None
        # rescue pass: a lone short word (even one letter) on a wide page
        # never reaches the scaled threshold — any ≥6-row region of ≥2-px
        # rows outside the found bands is a band too (junk ones die at the
        # confidence filter downstream)
        low = counts >= 2
        covered = np.zeros(len(counts), bool)
        for t, b in bands:
            covered[t:b] = True
        top = None
        extra = []
        for i in range(len(low) + 1):
            v = low[i] and not covered[i] if i < len(low) else False
            if v and top is None:
                top = i
            elif not v and top is not None:
                if i - top >= 6:
                    extra.append((top, i))
                top = None
        rescue = {tuple(e) for e in extra}
        if extra:
            bands = sorted(bands + extra)

        def _ret(bs):
            if with_flags:
                return [(t_, b_, (t_, b_) in rescue) for t_, b_ in bs]
            return bs
        if not expand:
            # binarized photocopies: speckle rows adjoin real bands and the
            # dot-recovery expansion would drag noise into every patch
            return _ret(bands)
        out = []
        n = len(counts)
        for bi, (t, b) in enumerate(bands):
            t0_, b0_ = t, b
            lo = bands[bi - 1][1] if bi else 0
            hi = bands[bi + 1][0] if bi + 1 < len(bands) else n
            for _ in range(6):
                # may skip up to TWO blank rows: i/j dots sit a couple of
                # rows above the x-height body and losing them leaves bare
                # unmatchable stems
                if t - 1 >= lo and counts[t - 1] >= 1:
                    t -= 1
                elif t - 2 >= lo and counts[t - 1] == 0 and counts[t - 2] >= 1:
                    t -= 2
                elif (
                    t - 3 >= lo
                    and counts[t - 1] == 0
                    and counts[t - 2] == 0
                    and counts[t - 3] >= 1
                ):
                    t -= 3
                else:
                    break
            for _ in range(6):
                if b < hi and counts[b] >= 1:
                    b += 1
                elif b + 1 < hi and counts[b] == 0 and counts[b + 1] >= 1:
                    b += 2
                elif (
                    b + 2 < hi
                    and counts[b] == 0
                    and counts[b + 1] == 0
                    and counts[b + 2] >= 1
                ):
                    b += 3
                else:
                    break
            out.append((t, b, (t0_, b0_) in rescue) if with_flags else (t, b))
        return out

    @staticmethod
    def _adaptive_ink(gray: np.ndarray) -> np.ndarray:
        """Local-mean adaptive binarization (the reference's
        AdaptiveBinarizer / need_binarization knob): photocopies with gray
        noise floors and lighting gradients defeat a global threshold —
        ink = pixel darker than its neighborhood mean by a margin.
        Box mean via integral image (O(1) per pixel)."""
        g = gray.astype(np.float64)
        h, w = g.shape
        win = max(15, min(h, w) // 40) | 1
        r = win // 2
        pad = np.pad(g, r + 1, mode="edge")
        ii = pad.cumsum(axis=0).cumsum(axis=1)
        a = ii[win:, win:]
        b = ii[:-win, win:]
        c = ii[win:, :-win]
        d = ii[:-win, :-win]
        local = (a - b - c + d)[: h, : w] / (win * win)
        span = float(g.max() - g.min()) or 1.0
        return ((local - g) > 0.18 * span).astype(np.float32)

    @staticmethod
    def _despeckle(binm: np.ndarray) -> np.ndarray:
        """Drop isolated ink pixels (< 2 of 8 neighbors inked) — photo noise
        amplified by adaptive binarization otherwise keeps every projection
        row 'on' and fuses all line bands."""
        h, w = binm.shape
        p = np.pad(binm, 1)
        nb = (
            sum(
                p[1 + dy : h + 1 + dy, 1 + dx : w + 1 + dx]
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            )
            - binm
        )
        return np.where(nb >= 2, binm, 0.0).astype(np.float32)

    @staticmethod
    def _strip_rules(ink: np.ndarray) -> np.ndarray:
        """Zero out long straight rules (page frames, table borders,
        underlines spanning most of the page): a >50%-ink row/column is a
        drawn line, never a text row — and an un-stripped frame defeats
        both blank-row band detection and blank-column gutter detection
        (Tesseract's line-removal preprocessing plays the same role)."""
        h, w = ink.shape
        binm = ink > 0.45
        bad_rows = binm.sum(axis=1) > 0.5 * w
        bad_cols = binm.sum(axis=0) > 0.5 * h
        if not bad_rows.any() and not bad_cols.any():
            return ink
        out = ink.copy()
        out[bad_rows, :] = 0.0
        out[:, bad_cols] = 0.0
        return out

    @staticmethod
    def _shear_rows(arr: np.ndarray, t: float, fill: float) -> np.ndarray:
        """Vertical shear: column x shifts by round(t·(x − W/2)) — the
        small-angle deskew transform (no interpolation, no cropping)."""
        h, w = arr.shape
        shifts = np.round(t * (np.arange(w) - w / 2)).astype(int)
        out = np.full_like(arr, fill)
        for s in np.unique(shifts):
            if abs(int(s)) >= h:  # wide short page: shift exceeds height
                continue
            cols = shifts == s
            if s == 0:
                out[:, cols] = arr[:, cols]
            elif s > 0:
                out[s:, cols] = arr[: h - s, cols]
            else:
                out[:h + s, cols] = arr[-s:, cols]
        return out

    def _deskew(self, ink: np.ndarray) -> Tuple[np.ndarray, float]:
        """Estimate small skew (±3°) by maximizing row-projection sharpness
        over shear candidates on a 2× downsample; return (deskewed ink,
        shear) — shear 0.0 when the page is already straight."""
        small = (ink[::2, ::2] > 0.45).astype(np.float32)
        if small.sum() < 50:
            return ink, 0.0
        def sharp(m):
            p = m.sum(axis=1)
            return float((p * p).sum())
        base = sharp(small)
        best_t, best_s = 0.0, base
        for deg in np.arange(-3.0, 3.01, 0.4):
            if abs(deg) < 1e-6:
                continue
            t = np.tan(np.radians(deg))
            s = sharp(self._shear_rows(small, t, 0.0))
            if s > best_s:
                best_s, best_t = s, t
        if best_t == 0.0 or best_s < 1.15 * base:
            return ink, 0.0
        return self._shear_rows(ink, best_t, 0.0), best_t

    def _page_score(self, ink: np.ndarray, probe_bands: int = 14,
                    expand: bool = True, top_n: int = 3,
                    early_stop: bool = True) -> float:
        """Char-weighted trial-recognition score of the BEST ``top_n`` of
        the probed bands: a correctly-oriented real page has a few strongly
        readable printed lines even when its leading bands are stamps or
        decorative junk; a wrong rotation has none."""
        cands = []
        for c0, c1 in self._columns(ink)[:2]:
            col = ink[:, c0:c1]
            got = 0
            for t, b in self._bands(col, expand=expand):
                if b - t < 8:
                    continue
                r = self._decode_band(col, t, b)
                if r is not None:
                    n = len(r[0].replace(" ", ""))
                    if n >= 3:
                        cands.append((r[1], n))
                        got += 1
                if got >= probe_bands or (
                    early_stop and sum(1 for sc, _ in cands if sc >= 0.55) >= 3
                ):
                    break  # three strongly-read bands settle the rotation
        if not cands:
            return -9.0
        top = sorted(cands, reverse=True)[:top_n]
        return sum(s * n for s, n in top) / sum(n for _, n in top)

    @classmethod
    def _columns(cls, ink: np.ndarray) -> List[Tuple[int, int]]:
        """Column x-ranges — split BEFORE line segmentation: two columns
        whose baselines interleave have no blank rows in the full-width
        projection, so bands fuse unless the gutter is cut first.

        The gutter floor scales with the line height (25th percentile of
        full-width band heights — robust against bands fused by the very
        columns being detected): a real gutter is wider than a line is
        tall, while large-print word spaces can exceed any fixed floor."""
        floor = max(16, ink.shape[1] // 60)
        heights = [b - t for t, b in cls._bands(ink)]
        if heights:
            h25 = float(np.percentile(np.array(heights), 25))
            floor = max(floor, int(1.15 * h25))
        return cls._split_columns(ink, floor)

    @staticmethod
    def _split_columns(ink: np.ndarray, min_gutter: int) -> List[Tuple[int, int]]:
        """Left-to-right column x-ranges: split at the widest internal blank
        column run ≥ min_gutter with substantial ink both sides."""
        on = (ink > 0.45).sum(axis=0) >= max(2, ink.shape[0] // 150)
        idx = np.flatnonzero(on)
        if idx.size == 0:
            return [(0, ink.shape[1])]
        gaps = np.diff(idx)
        if gaps.size == 0:
            return [(0, ink.shape[1])]
        cut = int(np.argmax(gaps))
        if gaps[cut] - 1 < min_gutter:
            return [(0, ink.shape[1])]
        left_end, right_start = int(idx[cut]) + 1, int(idx[cut + 1])
        # both sides must carry real text mass (≥ 15% of page ink each)
        total = float((ink > 0.45).sum())
        lmass = float((ink[:, :left_end] > 0.45).sum())
        if total <= 0 or not (0.15 <= lmass / total <= 0.85):
            return [(0, ink.shape[1])]
        out = []
        for lo, hi in RealScanOCR._split_columns(ink[:, :left_end], min_gutter):
            out.append((lo, hi))
        for lo, hi in RealScanOCR._split_columns(ink[:, right_start:], min_gutter):
            out.append((lo + right_start, hi + right_start))
        return out

    def _orientation_k(self, ink: np.ndarray, expand: bool = True) -> int:
        """k such that np.rot90(ink, -k) reads upright.

        Prefilter by text-line structure — the upright/upside-down pair has
        a far sharper row projection than the sideways pair — then trial
        recognition among the structurally-plausible rotations (the
        reference's ColumnsOrientationClassifier decision, a CNN there:
        columns_orientation_classifier.py; its class pins are replayed on
        the orient_1..8 fixtures in tests/test_real_ocr.py)."""
        small = (ink[::2, ::2] > 0.45).astype(np.float32)
        sharps = []
        for kk in range(4):
            p = np.rot90(small, -kk).sum(axis=1)
            sharps.append(float((p * p).sum()))
        cut = 0.7 * max(sharps) if max(sharps) > 0 else 0.0
        scores: Dict[int, float] = {}
        for kk in range(4):  # k=0 first: a clean upright page decides fast
            if sharps[kk] < cut:
                continue
            sc = self._page_score(np.rot90(ink, -kk), expand=expand)
            scores[kk] = sc
            if sc >= 0.72:
                # decisive trial read — upside-down/sideways text can never
                # score this high, so skip scoring the other rotations
                # (halves the orientation cost on every clean page)
                return kk
        if not scores:
            return 0
        order = sorted(scores, key=scores.get, reverse=True)
        k = order[0]
        # the top-3-band score is a coin flip on degraded pages whose
        # leading bands are stamps/letterhead (tz_scan_1page reads its
        # best 3 bands equally well upside-down): when the top two
        # rotations are within noise, re-score DEEP — best 8 of up to 30
        # bands — and only override the shallow winner on a clear margin
        if len(order) >= 2 and scores[k] - scores[order[1]] < 0.08:
            k2 = order[1]
            deep = {
                kk: self._page_score(
                    np.rot90(ink, -kk), probe_bands=30, expand=expand,
                    top_n=8, early_stop=False,
                )
                for kk in (k, k2)
            }
            if deep[k2] - deep[k] >= 0.02:
                k = k2  # clear deep margin overrides; ties keep shallow
        return k

    def detect_orientation_k(self, gray: np.ndarray) -> int:
        """Public orientation-only entry (no full page decode): the page
        was rotated 90k° CCW; reading it requires np.rot90(img, -k)."""
        img = gray.astype(np.float32)
        lo, hi = float(img.min()), float(img.max())
        if hi - lo < 64:
            return 0
        ink = self._strip_rules((hi - img) / (hi - lo))
        return self._orientation_k(ink)

    def decode_region(self, region_ink: np.ndarray, mask=None) -> List[str]:
        """OCR a small ink crop (a table cell) → text lines. No column
        split, no orientation — the caller owns the page geometry."""
        if not self.ok or region_ink.size == 0:
            return []
        out = []
        for t, b in self._bands(region_ink):
            r = self._decode_band(region_ink, t, b, mask)
            if r is not None and r[1] >= 0.18:
                out.append(r[0])
        return out

    def decode_page(self, gray: np.ndarray, orientation: str = "auto",
                    binarize: bool = False):
        """Grayscale page → ([(text, bold_ranges, x0, conf, ink_mean)], k).

        ``k``: page was rotated 90k° CCW; output reads the unrotated page.
        ``binarize``: adaptive local-mean binarization first (the
        reference's need_binarization knob — noisy photocopies).
        """
        lines, k, _tables = self.decode_page_full(
            gray, orientation=orientation, binarize=binarize, with_tables=False
        )
        return lines, k

    def decode_page_full(self, gray: np.ndarray, orientation: str = "auto",
                         binarize: bool = False, with_tables: bool = True,
                         file_hash: str = "", gost_frame: bool = False):
        """decode_page plus ruled-table recognition on the oriented page
        (readers/raster_tables.py): → (lines, k, tables). Table regions
        are blanked before the free-text line pass so cell text does not
        duplicate into the line stream (the reference PdfImageReader
        excludes recognized table areas the same way)."""
        if not self.ok:
            return [], 0, []
        img = gray.astype(np.float32)
        lo, hi = float(img.min()), float(img.max())
        if hi - lo < 64:
            return [], 0, []
        if binarize:
            raw_ink = self._despeckle(self._adaptive_ink(img))
        else:
            raw_ink = (hi - img) / (hi - lo)
        ink = self._strip_rules(raw_ink)
        expand = not binarize
        k = 0
        if orientation == "auto":
            k = self._orientation_k(ink, expand=expand)
        if k:
            ink = np.rot90(ink, -k).copy()
            img = np.rot90(img, -k).copy()
            raw_ink = np.rot90(raw_ink, -k).copy()
        if gost_frame:
            # GOST engineering frame: blank everything outside the content
            # window (coordinates stay page-absolute) — the frame's left
            # attribute strip otherwise becomes phantom table columns
            from dedoc_ray.readers.raster_tables import gost_frame_window

            win = gost_frame_window(raw_ink)
            if win is not None:
                y0, y1, x0, x1 = win
                for arr in (ink, raw_ink):
                    arr[:y0, :] = 0.0
                    arr[y1:, :] = 0.0
                    arr[:, :x0] = 0.0
                    arr[:, x1:] = 0.0
        # script vote first (over the leading bands of the raw page): the
        # mask steers CELL OCR inside table recognition too — Cyrillic
        # с/о/а/е render identically to Latin c/o/a/e in any face, so
        # homoglyph matches are arbitrary and dilute a naive majority to
        # a coin flip; only DISTINCTIVE letters vote
        pre = []
        for t, b in self._bands(ink, expand=expand)[:4]:
            r = self._decode_band(ink, t, b)
            if r:
                pre.append(r[0])
        joined = "".join(pre)
        n_cyr = sum(1 for c in joined if c in _DISTINCT_CYR)
        n_lat = sum(1 for c in joined if c in _DISTINCT_LAT)
        mask = None
        if n_cyr > 1.5 * n_lat and n_cyr >= 4:
            mask = ~self._lat
        elif n_lat > 1.5 * n_cyr and n_lat >= 4:
            mask = ~self._cyr
        tables: list = []
        if with_tables:
            from dedoc_ray.readers.raster_tables import detect_raster_tables

            try:
                # detection sees the UN-stripped, UN-deskewed ink: a
                # page-wide table's outer borders are exactly what
                # _strip_rules removes, and the detector runs its own
                # rotation correction (stacking two shears breaks it)
                tables, boxes, tilt = detect_raster_tables(
                    raw_ink, self, mask, file_hash, return_rotation=True
                )
            except Exception:
                tables, boxes, tilt = [], [], 0.0
            for t0, b0, l0, r0 in boxes:
                # margin absorbs the frame difference between the
                # detector's rotation-corrected space and this page; a
                # detected tilt (tilt = tan(theta)) displaces edge
                # coordinates by up to tan(theta)·dim/2, so the margin
                # scales with it or edge cell text escapes the blank and
                # duplicates into the free-text stream
                m = 4 + int(0.01 * max(ink.shape))
                m += int(abs(tilt) * max(ink.shape) / 2.0)
                ink[max(0, t0 - m) : b0 + m, max(0, l0 - m) : r0 + m] = 0.0
        ink, shear = self._deskew(ink)
        if shear:
            img = self._shear_rows(img, shear, fill=float(img.max()))
        # columns after tables are blanked (interleaved baselines fuse
        # full-width bands; table regions no longer fight the gutter)
        cols = self._columns(ink)
        lines = []
        for c0, c1 in cols:
            col_ink = ink[:, c0:c1]
            col_img = img[:, c0:c1]
            for t, b, rescued in self._bands(col_ink, expand=expand, with_flags=True):
                r = self._decode_band(col_ink, t, b, mask)
                if r is None:
                    continue
                text, mean, ppem, ranges, x0 = r
                conf = float(np.clip(mean, 0.0, 1.0))
                if rescued and conf < 0.33:
                    continue  # rescue bands carry the burden of proof
                band_bin = col_ink[t:b] > 0.45
                gband = col_img[t:b]
                ink_px = gband[band_bin]
                ink_mean = int(ink_px.mean()) if ink_px.size else 0
                on = np.flatnonzero(band_bin.any(axis=0))
                x1 = int(on[-1]) + 1 if on.size else x0 + 1
                bbox = (c0 + x0, int(t), max(1, x1 - x0), int(b - t))
                lines.append((text, ranges, c0 + x0, conf, ink_mean, bbox))
        return lines, k, tables


_REAL: List[Optional[RealScanOCR]] = [None]


def real_ocr() -> RealScanOCR:
    if _REAL[0] is None:
        _REAL[0] = RealScanOCR()
    return _REAL[0]
