"""Ruled-table recognition on RASTER scans — the table half of the
reference's PdfImageReader (table detect/recognize over OpenCV line
morphology + per-cell Tesseract; pdf_image_reader.py:61-131,
tests/unit_tests/test_module_table_detection.py pins the bboxes and
cell grids this module replays).

Pipeline, all per-page map work:

1. **Rule segments**: long horizontal/vertical ink runs (the OpenCV
   morphological-open analogue, done with run-length scans), merged
   across adjacent rows/columns into one rule per physical line (scan
   lines are 1-4 px thick), ends extended a few px so anti-aliased
   corners still intersect.
2. **Lattice**: the segments feed readers/pdf_rules.ruled_grids — the
   SAME frame/boundary/span machinery the born-digital tabby route uses
   (raster rows negate into its y-up convention), so merged cells and
   missing inner separators behave identically on scans and PDFs.
3. **Cell OCR**: every visible cell crop decodes through the open-font
   template recognizer (readers/real_ocr.py) — multi-line cells keep
   their line breaks, exactly the reference's per-cell OCR contract.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.table import CellWithMeta, Table
from dedoc_ray.readers.pdf_rules import ruled_grids

#: a rule must span at least this fraction of the page dimension
_MIN_FRAC = 0.08
#: rules thinner than this many px of thickness merge into one line
_THICK = 4


def _runs_longer(binm: np.ndarray, min_len: int):
    """Per row: (start, end) ink runs of length ≥ min_len → list of
    (row, start, end)."""
    h, w = binm.shape
    pad = np.zeros((h, w + 2), np.int8)
    pad[:, 1:-1] = binm
    d = np.diff(pad, axis=1)
    out = []
    for i in range(h):
        starts = np.flatnonzero(d[i] == 1)
        if starts.size == 0:
            continue
        ends = np.flatnonzero(d[i] == -1)
        for s, e in zip(starts, ends):
            if e - s >= min_len:
                out.append((i, int(s), int(e)))
    return out


def _merge_collinear(segs: List[Tuple[int, int, int]], gap: int = _THICK):
    """(pos, start, end) segments on adjacent scan lines with overlapping
    (or ≤``gap``-separated — degraded scans dash their rules) extent are
    ONE rule → (start, end, mean_pos) floats.

    Two guards tell drawn lines from text: a chain whose positions span
    more than ~2×_THICK scan lines is a TEXT BLOCK (letters chain through
    their x-height), and a chain covering < 55% of its extent with ink is
    debris, not a border."""
    segs = sorted(segs)
    # [start, end, pos_sum, count, last_pos, pos0, covered]
    rules: List[List[float]] = []
    for pos, s, e in segs:
        hit = None
        for r in rules:
            if pos - r[4] <= _THICK and s <= r[1] + gap and e >= r[0] - gap:
                hit = r
                break
        if hit is None:
            rules.append([float(s), float(e), float(pos), 1.0, float(pos), float(pos), float(e - s)])
        else:
            hit[0] = min(hit[0], float(s))
            hit[1] = max(hit[1], float(e))
            hit[2] += pos
            hit[3] += 1
            hit[4] = float(pos)
            hit[6] += e - s
    return [
        (r[0], r[1], r[2] / r[3])
        for r in rules
        if r[4] - r[5] <= 2 * _THICK  # thin = drawn line, thick = text
        and r[6] >= 0.55 * max(1.0, r[1] - r[0])  # dense = border, sparse = debris
    ]


def _merge_rules(rules, gap: int, pos_tol: float = 2 * _THICK):
    """Fuse rules that are pieces of one physical line: positions within
    pos_tol, extents overlapping or ≤ gap apart. Iterates to fixpoint."""
    rules = [list(r) for r in rules]
    changed = True
    while changed:
        changed = False
        out: List[list] = []
        for r in sorted(rules, key=lambda t: t[0]):
            hit = None
            for o in out:
                if abs(o[2] - r[2]) <= pos_tol and r[0] <= o[1] + gap and r[1] >= o[0] - gap:
                    hit = o
                    break
            if hit is None:
                out.append(r)
            else:
                w_o = hit[1] - hit[0]
                w_r = r[1] - r[0]
                hit[2] = (hit[2] * w_o + r[2] * w_r) / max(1.0, w_o + w_r)
                hit[0] = min(hit[0], r[0])
                hit[1] = max(hit[1], r[1])
                changed = True
        rules = out
    return [tuple(r) for r in rules]


def rule_segments(binm: np.ndarray):
    """Binary ink page → (h_rules [(x0, x1, y)], v_rules [(y0, y1, x)]) in
    raster coordinates, one rule per physical line.

    Runs are collected SHORT (1.5% of the page dimension) because scan
    aliasing and rule crossings fragment a physical line; chains merge in
    _merge_collinear and only merged rules long enough to be table
    borders survive."""
    h, w = binm.shape
    hs = _merge_collinear(_runs_longer(binm, max(12, int(w * 0.015))), gap=max(8, int(w * 0.02)))
    vs = _merge_collinear(_runs_longer(binm.T, max(12, int(h * 0.015))), gap=max(8, int(h * 0.02)))
    # second stage: a drifting scan line fragments into per-column chains
    # (the run sort visits columns, not the line) — fuse rules at nearby
    # positions whose extents abut
    hs = _merge_rules(hs, gap=max(16, int(w * 0.05)))
    vs = _merge_rules(vs, gap=max(16, int(h * 0.05)))
    min_h = max(40, int(w * _MIN_FRAC))
    min_v = max(40, int(h * _MIN_FRAC))
    hs = [r for r in hs if r[1] - r[0] >= min_h]
    vs = [r for r in vs if r[1] - r[0] >= min_v]
    # extend ends so anti-aliased corners still intersect the lattice
    hs = [(x0 - 3, x1 + 3, y) for x0, x1, y in hs]
    vs = [(y0 - 3, y1 + 3, x) for y0, y1, x in vs]
    return hs, vs


def _soft_axis(
    ink: np.ndarray,
    horizontal: bool,
    thresh: float = 0.28,
    bin_px: int = 12,
    min_frac: float = 0.12,
) -> List[Tuple[float, float, float]]:
    """Dotted/wobbly rule candidates along one axis (the reference's
    table_recognizer survives hand-drawn and photocopy-degraded borders —
    example_with_table_horizontal_union.jpg): a rule is a thin 3-px band
    with high ink BIN coverage over a long extent whose surrounding rows
    are clean (text bands are thick; dotted rules are thin but sparse, so
    run-length detection misses them). → [(start, end, pos)]."""
    b = (ink if horizontal else ink.T) > thresh
    H, W = b.shape
    band = b.copy()
    band[1:] |= b[:-1]
    band[:-1] |= b[1:]
    nbin = W // bin_px
    if nbin < 8 or H < 12:
        return []
    hit = band[:, : nbin * bin_px].reshape(H, nbin, bin_px).any(axis=2)
    min_bins = max(6, int(nbin * min_frac))
    cands: List[Tuple[int, int, int, int]] = []
    for r in range(2, H - 2):
        row = hit[r]
        runs: List[Tuple[int, int, int]] = []  # (start, end, hits)
        start = None
        misses = 0
        hits = 0
        # 3 sentinel misses so a run reaching the row's end still flushes
        for i in range(nbin + 3):
            on = bool(row[i]) if i < nbin else False
            if on:
                if start is None:
                    start, hits, misses = i, 0, 0
                hits += 1
                misses = 0
            elif start is not None:
                misses += 1
                if misses > 2:
                    if hits >= 3:
                        runs.append((start, i - misses, hits))
                    start = None
        if not runs:
            continue
        # one faded stretch must not halve a physical line: fuse the runs
        # when their combined extent stays dense, else keep the largest
        s_bin = min(s for s, _, _ in runs)
        e_bin = max(e for _, e, _ in runs)
        hits = sum(h for _, _, h in runs)
        if hits / max(1, e_bin - s_bin + 1) < 0.7:
            s_bin, e_bin, hits = max(runs, key=lambda t: t[2])
        if hits < min_bins or hits / max(1, e_bin - s_bin + 1) < 0.7:
            continue
        # thinness: context rows on BOTH sides mostly clean over the extent
        # — a text row always has ink on at least one side (its own
        # x-height band), a drawn rule has cell padding on both
        side_bad = False
        for side in ((r - 6, r - 4), (r + 4, r + 6)):
            ctx, n = 0.0, 0
            for rr in side:
                if 0 <= rr < H:
                    ctx += float(hit[rr, s_bin : e_bin + 1].mean())
                    n += 1
            if n and ctx / n > 0.45:
                side_bad = True
                break
        if side_bad:
            continue
        cands.append((r, s_bin, e_bin, hits))
    cands.sort()
    merged: List[List[float]] = []  # [pos_wsum, s_bin, e_bin, w, last_r]
    for r, s, e, hits in cands:
        if merged and r - merged[-1][4] <= 4 and not (e < merged[-1][1] or s > merged[-1][2]):
            m = merged[-1]
            m[1] = min(m[1], s)
            m[2] = max(m[2], e)
            m[0] += r * hits
            m[3] += hits
            m[4] = r
        else:
            merged.append([float(r * hits), float(s), float(e), float(hits), float(r)])
    return [
        (s * bin_px, (e + 1) * bin_px, pos_w / w) for pos_w, s, e, w, _ in merged
    ]


def _refine_extent(
    ink: np.ndarray,
    pos: float,
    a: float,
    b: float,
    horizontal: bool,
    thresh: float = 0.28,
    win: int = 48,
    bar: float = 0.55,
) -> Tuple[float, float]:
    """Trim a soft rule's extent to its well-inked span: the bin pass can
    stretch a partial separator across a tier it doesn't actually cross
    (text descenders bridge the gap), which would split merged header
    cells the reference keeps whole."""
    p = int(round(pos))
    if horizontal:
        band = (ink[max(0, p - 1) : p + 2, :] > thresh).any(axis=0)
    else:
        band = (ink[:, max(0, p - 1) : p + 2] > thresh).any(axis=1)
    a_i, b_i = max(0, int(a)), min(len(band), int(b))
    seg = band[a_i:b_i].astype(np.float32)
    if seg.size < win * 2:
        return a, b
    k = np.convolve(seg, np.ones(win, np.float32) / win, mode="same")
    good = k >= bar
    if not good.any():
        return a, b
    idx = np.flatnonzero(good)
    n0, n1 = int(idx[0]), int(idx[-1]) + 1
    if good[n0:n1].mean() < 0.7:
        # genuinely split coverage: fall back to the largest good interval
        best = (0, 0)
        s = None
        for i in range(len(good) + 1):
            v = bool(good[i]) if i < len(good) else False
            if v and s is None:
                s = i
            elif not v and s is not None:
                if i - s > best[1] - best[0]:
                    best = (s, i)
                s = None
        n0, n1 = best
    if n1 - n0 < 0.3 * (b_i - a_i):
        return a, b
    return float(a_i + max(0, n0 - win // 2)), float(a_i + min(len(seg), n1 + win // 2))


def _soft_rules(ink: np.ndarray) -> Tuple[list, list]:
    """Fallback rule detection for dotted/hand-drawn grids: page-level soft
    horizontal rules seed candidate table regions (≥2 stacked rules with
    overlapping extents); each region is re-scanned on BOTH axes with a
    region-relative span bar. Returns (h_rules, v_rules) in global raster
    coordinates, same (start, end, pos) shape as rule_segments."""
    H, W = ink.shape
    hs_page = _soft_axis(ink, True, min_frac=0.12)
    if len(hs_page) < 2:
        return [], []
    clusters: List[List[float]] = []  # [x0, x1, y0, y1, count]
    tol_x, tol_y = 0.15 * W, 0.15 * H
    for x0, x1, y in sorted(hs_page, key=lambda r: r[2]):
        placed = False
        for c in clusters:
            # a grid's separators are CONTAINED in its outer border extent
            # (partial inner separators included); text underlines with
            # unrelated extents stay out
            if y - c[3] <= tol_y and x0 >= c[0] - tol_x and x1 <= c[1] + tol_x:
                c[0] = min(c[0], x0)
                c[1] = max(c[1], x1)
                c[3] = max(c[3], y)
                c[4] += 1
                placed = True
                break
        if not placed:
            clusters.append([x0, x1, y, y, 1.0])
    out_h: List[Tuple[float, float, float]] = []
    out_v: List[Tuple[float, float, float]] = []
    for x0, x1, y0, y1, cnt in clusters:
        if cnt < 2 or y1 - y0 < 24:
            continue
        m = 30
        ry0, ry1 = max(0, int(y0) - m), min(H, int(y1) + m)
        rx0, rx1 = max(0, int(x0) - m), min(W, int(x1) + m)
        crop = ink[ry0:ry1, rx0:rx1]
        ch = _soft_axis(crop, True, min_frac=0.3)
        cv = _soft_axis(crop, False, min_frac=0.5)
        if len(ch) < 2 or len(cv) < 2:
            continue
        for a, b, p in ch:
            a2, b2 = _refine_extent(ink, p + ry0, a + rx0, b + rx0, True)
            out_h.append((a2, b2, p + ry0))
        for a, b, p in cv:
            a2, b2 = _refine_extent(ink, p + rx0, a + ry0, b + ry0, False)
            out_v.append((a2, b2, p + rx0))
    return out_h, out_v


def _rotation_correct(ink: np.ndarray) -> Tuple[np.ndarray, float]:
    """Fine small-angle rotation correction (±2°, 0.1° steps) driven by
    row-projection sharpness — a 0.3° scan tilt drifts a 1-px rule across
    15 scan lines and shatters rule detection. Approximated as the
    composition of a vertical and a horizontal shear (exact to O(θ²))."""
    from dedoc_ray.readers.real_ocr import RealScanOCR

    small = (ink[::2, ::2] > 0.45).astype(np.float32)
    if small.sum() < 100:
        return ink, 0.0

    def sharp(m):
        p = m.sum(axis=1)
        return float((p * p).sum())

    base = sharp(small)
    best_t, best_s = 0.0, base
    for deg in np.arange(-2.0, 2.01, 0.1):
        if abs(deg) < 1e-9:
            continue
        t = float(np.tan(np.radians(deg)))
        s = sharp(RealScanOCR._shear_rows(small, t, 0.0))
        if s > best_s:
            best_s, best_t = s, t
    if best_t == 0.0 or best_s < 1.05 * base:
        return ink, 0.0
    out = RealScanOCR._shear_rows(ink, best_t, 0.0)
    out = RealScanOCR._shear_rows(out.T, -best_t, 0.0).T
    return out, best_t


def gost_frame_window(ink: np.ndarray):
    """GOST drawing-frame content window (the reference's
    need_gost_frame_analysis / dedocutils frame remover): full-height
    verticals near both page edges plus a full-width bottom rule mean the
    page wears an engineering frame; everything outside the innermost
    frame lines (the left attribute strip included) is frame furniture.
    → (y0, y1, x0, x1) or None when no frame is present."""
    h, w = ink.shape
    hs, vs = rule_segments(ink > 0.45)
    fullv = [x for a, b, x in vs if b - a >= 0.85 * h]
    lefts = [x for x in fullv if x < 0.25 * w]
    rights = [x for x in fullv if x > 0.75 * w]
    if not lefts or not rights:
        return None
    fullh = [y for a, b, y in hs if b - a >= 0.85 * w]
    bots = [y for y in fullh if y > 0.8 * h]
    tops = [y for y in fullh if y < 0.2 * h]
    y0 = int(max(tops)) + 3 if tops else 0
    y1 = int(min(bots)) - 2 if bots else h
    return (y0, y1, int(max(lefts)) + 3, int(min(rights)) - 2)


def _drop_interior_strokes(hs, vs):
    """Keep rules that can be SEPARATORS: spanning ≥50% of their frame's
    other dimension, touching a frame edge, or ANCHORED — both endpoints
    land on perpendicular rules that cross them (mid-table tier separators
    like the 'В том числе / Осн.З/п' header splits connect two interior
    column rules without reaching any frame edge). Pen strokes and text
    underlines inside a cell satisfy none of these and would fabricate
    phantom columns."""
    if not hs or not vs:
        return hs, vs
    top = min(y for _a, _b, y in hs)
    bot = max(y for _a, _b, y in hs)
    left = min(x for _a, _b, x in vs)
    right = max(x for _a, _b, x in vs)
    h_span = max(1.0, bot - top)
    w_span = max(1.0, right - left)
    tol_y = 0.06 * h_span
    tol_x = 0.06 * w_span

    def anchored(p0, p1, pos, perp, tol=9.0):
        # both endpoints within tol of a perpendicular rule whose extent
        # covers this rule's position
        def hit(p):
            return any(
                abs(p - rp) <= tol and a0 - tol <= pos <= a1 + tol
                for a0, a1, rp in perp
            )

        return hit(p0) and hit(p1)

    def split_keep(rules, primary, anchor):
        base = [r for r in rules if primary(r)]
        out = list(base)
        for r in rules:
            if r in base or not anchor(r):
                continue
            a0, a1, p = r
            # an anchored rule that shadows a base-kept rule a few px away
            # is the same physical (thick/dashed) line re-detected — adding
            # it would shift the snapped boundary and drag border ink into
            # the cell crops
            # position-only proximity: a tilted dashed border fragments
            # into non-overlapping pieces at drifted positions — distinct
            # REAL separators are never 12 px apart
            if any(abs(p - bp) <= 12 for _b0, _b1, bp in out):
                continue
            out.append(r)
        return out

    vs2 = split_keep(
        vs,
        lambda r: (r[1] - r[0]) >= 0.5 * h_span or r[0] <= top + tol_y or r[1] >= bot - tol_y,
        lambda r: anchored(r[0], r[1], r[2], hs),
    )
    hs2 = split_keep(
        hs,
        lambda r: (r[1] - r[0]) >= 0.5 * w_span or r[0] <= left + tol_x or r[1] >= right - tol_x,
        lambda r: anchored(r[0], r[1], r[2], vs),
    )
    return hs2, vs2


def detect_raster_tables(
    ink: np.ndarray,
    recognizer,
    mask=None,
    file_hash: str = "",
    page_id: int = 0,
    return_rotation: bool = False,
):
    """→ (tables, boxes[, rot_deg]): ruled tables recognized from the page
    ink plus their (top, bottom, left, right) raster boxes in the (rotation-
    corrected) page frame (callers blank those regions before the
    free-text line pass). ``recognizer`` is a RealScanOCR; ``mask`` its
    script mask. ``return_rotation=True`` additionally returns tan(theta)
    of the detected tilt so callers blanking in the UN-corrected frame can
    scale their margin by the coordinate displacement the tilt induces."""
    ink, _rot = _rotation_correct(ink)

    def _ret(tabs, bxs):
        return (tabs, bxs, float(_rot)) if return_rotation else (tabs, bxs)

    binm = ink > 0.45
    hs, vs = rule_segments(binm)
    if len(hs) < 2 or len(vs) < 2:
        # dotted / hand-drawn / photocopy-faded grids leave no solid runs
        # for the strict detector — the soft bin-coverage pass recovers them
        hs, vs = _soft_rules(ink)
        if len(hs) < 2 or len(vs) < 2:
            return _ret([], [])
    else:
        hs, vs = _drop_interior_strokes(hs, vs)
        if len(hs) < 2 or len(vs) < 2:
            return _ret([], [])
    # snap positions to 8-px clusters: double-drawn / re-merged borders a
    # few px apart otherwise cluster into degenerate sliver columns
    def _snap(rules):
        reps = _bounds([r[2] for r in rules], tol=8.0)
        out = []
        for a, b, p in rules:
            out.append((a, b, min(reps, key=lambda v: abs(v - p))))
        return out

    hs = _snap(hs)
    vs = _snap(vs)
    # pdf_rules speaks y-up device space: negate raster rows
    h_rules = [(x0, x1, -y) for x0, x1, y in hs]
    v_rules = [(-y1, -y0, x) for y0, y1, x in vs]
    grids, _used = ruled_grids(h_rules, v_rules, [])
    tables: List[Table] = []
    boxes: List[Tuple[int, int, int, int]] = []
    H, W = ink.shape
    for y_top_neg, y_bot_neg, x0, x1, grid in grids:
        top, bot = int(-y_top_neg), int(-y_bot_neg)
        left, right = int(x0), int(x1)
        n_rows, n_cols = len(grid), len(grid[0]) if grid else 0
        if n_rows < 1 or n_cols < 2:
            continue
        if (bot - top) < 12 or (right - left) < 24:
            continue
        # boundary coordinates: cluster the frame's own rules (same
        # clustering the lattice used, raster-side)
        ys = _bounds([y for _x0, _x1, y in hs if top - 3 <= y <= bot + 3])
        xs = _bounds([x for _y0, _y1, x in vs if left - 3 <= x <= right + 3])
        if len(ys) != n_rows + 1 or len(xs) != n_cols + 1:
            # boundary recovery must agree with the lattice; fall back to
            # uniform spacing only when counts drift (rare wavy scans)
            ys = np.linspace(top, bot, n_rows + 1).tolist()
            xs = np.linspace(left, right, n_cols + 1).tolist()
        cells: List[List[CellWithMeta]] = []
        nonempty = 0
        for ri in range(n_rows):
            row: List[CellWithMeta] = []
            for ci in range(n_cols):
                meta = grid[ri][ci]
                colspan, rowspan = meta["colspan"], meta["rowspan"]
                if meta["invisible"]:
                    # owner's text is duplicated afterwards (reference grid
                    # contract: copies carry the text, invisible=True)
                    row.append(CellWithMeta([], colspan, rowspan, True))
                    continue
                r0 = int(ys[ri]) + 4
                r1 = int(ys[ri + rowspan]) - 3
                c0 = int(xs[ci]) + 4
                c1 = int(xs[ci + colspan]) - 3
                lines: List[LineWithMeta] = []
                if r1 > r0 + 3 and c1 > c0 + 3:
                    crop = ink[max(0, r0) : min(H, r1), max(0, c0) : min(W, c1)]
                    for li, text in enumerate(recognizer.decode_region(crop, mask)):
                        if not text.strip():
                            continue
                        lines.append(
                            LineWithMeta(
                                line=text + "\n",
                                metadata=LineMetadata(
                                    page_id=page_id,
                                    line_id=li,
                                    tag_hierarchy_level=HierarchyLevel.create_unknown(),
                                ),
                                annotations=[],
                                uid=f"rcell_{file_hash}_{len(tables)}_{ri}_{ci}_{li}",
                            )
                        )
                if lines:
                    nonempty += 1
                row.append(CellWithMeta(lines, colspan, rowspan, False))
            cells.append(row)
        # duplicate owner text into covered copies (reference contract)
        for ri in range(n_rows):
            for ci in range(n_cols):
                if not cells[ri][ci].invisible:
                    c = cells[ri][ci]
                    for r2 in range(ri, min(n_rows, ri + c.rowspan)):
                        for c2 in range(ci, min(n_cols, ci + c.colspan)):
                            if (r2, c2) != (ri, ci):
                                cells[r2][c2] = CellWithMeta(
                                    c.lines, c.colspan, c.rowspan, True
                                )
        if nonempty < 2:
            continue  # drawn frame with no readable content: not a table
        tables.append(
            Table(
                cells,
                page_id=page_id,
                uid=f"rastertab_{file_hash}_{len(tables)}",
                ruled=True,
            )
        )
        boxes.append((top, bot, left, right))
    return _ret(tables, boxes)


def _bounds(vals: List[float], tol: float = 4.0) -> List[float]:
    """Cluster near-equal boundary coordinates → sorted representatives."""
    out: List[float] = []
    group: List[float] = []
    for v in sorted(vals):
        if group and v - group[-1] > tol:
            out.append(sum(group) / len(group))
            group = []
        group.append(v)
    if group:
        out.append(sum(group) / len(group))
    return out
