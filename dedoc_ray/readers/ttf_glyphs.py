"""Glyph-shape unicode recovery for symbolic TrueType PDF fonts.

The "CIDFont+F" printer-driver family embeds subsetted TrueType fonts with
NO ToUnicode CMap, NO /Encoding, a (3,0) symbol cmap and a format-3 post
table — the byte codes in the content stream carry no character semantics
at all (reference handles these with its jar's glyph classifier;
tests/data/tables/example_with_table9.pdf is the canonical fixture).

Recovery = shape matching + a monotonicity prior:

1. parse the embedded sfnt (glyf outlines, simple + composite) and
   rasterise every mapped glyph on a bbox-normalised grid;
2. rasterise a reference atlas from the container's DejaVu Sans/Serif
   faces (full Cyrillic coverage, real unicode cmaps) the same way;
3. score code-glyph x atlas-char similarity (bitmap IoU + size features —
   the relative-height feature separates 'о'/'О'/'0'-style confusables);
4. decode all codes jointly with a strict-monotone DP: these drivers
   assign codes in cp1251 byte order, so code order == charset order.
   The DP turns many individually-ambiguous matches (Cyrillic/Latin
   lookalikes) into one globally consistent assignment.

The result feeds Font.tounicode in readers/pdf_text.py; it is cached per
font program. Everything is derived from the embedded outlines — no
language model, no OCR.
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import numpy as np

_GRID = 22  # raster size; IoU resolution

_DEJAVU_PATHS = (
    "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
    "/usr/share/fonts/truetype/dejavu/DejaVuSerif-Bold.ttf",
)


class BadTtf(ValueError):
    pass


class SfntFont:
    def __init__(self, data: bytes) -> None:
        self.data = data
        if len(data) < 12:
            raise BadTtf("short sfnt")
        ver, ntab = struct.unpack_from(">IH", data, 0)
        if ver not in (0x00010000, 0x74727565):
            raise BadTtf(f"not a TrueType sfnt: {ver:08x}")
        self.tables: Dict[str, Tuple[int, int]] = {}
        for i in range(ntab):
            tag, _cs, off, ln = struct.unpack_from(">4sIII", data, 12 + 16 * i)
            self.tables[tag.decode("latin1")] = (off, ln)
        for need in ("head", "maxp", "loca", "glyf", "cmap"):
            if need not in self.tables:
                raise BadTtf(f"missing {need} table")
        head = self.tables["head"][0]
        self.units_per_em = struct.unpack_from(">H", data, head + 18)[0] or 1000
        self.loca_long = struct.unpack_from(">h", data, head + 50)[0] == 1
        self.num_glyphs = struct.unpack_from(">H", data, self.tables["maxp"][0] + 4)[0]

    # ------------------------------------------------------------- cmap

    def _subtables(self):
        off = self.tables["cmap"][0]
        _v, n = struct.unpack_from(">HH", self.data, off)
        for i in range(n):
            pid, eid, soff = struct.unpack_from(">HHI", self.data, off + 4 + 8 * i)
            yield pid, eid, off + soff

    def _lookup_fmt(self, base: int):
        data = self.data
        fmt = struct.unpack_from(">H", data, base)[0]
        if fmt == 4:
            seg_x2 = struct.unpack_from(">H", data, base + 6)[0]
            seg = seg_x2 // 2
            ends = struct.unpack_from(f">{seg}H", data, base + 14)
            starts = struct.unpack_from(f">{seg}H", data, base + 16 + seg_x2)
            deltas = struct.unpack_from(f">{seg}h", data, base + 16 + 2 * seg_x2)
            ro_base = base + 16 + 3 * seg_x2
            ros = struct.unpack_from(f">{seg}H", data, ro_base)

            def lookup(code: int) -> int:
                for k in range(seg):
                    if starts[k] <= code <= ends[k]:
                        if ros[k] == 0:
                            return (code + deltas[k]) & 0xFFFF
                        addr = ro_base + 2 * k + ros[k] + 2 * (code - starts[k])
                        if addr + 2 > len(data):
                            return 0
                        g = struct.unpack_from(">H", data, addr)[0]
                        return (g + deltas[k]) & 0xFFFF if g else 0
                return 0

            return lookup
        if fmt == 6:
            first, cnt = struct.unpack_from(">HH", data, base + 6)
            gids = struct.unpack_from(f">{cnt}H", data, base + 10)
            return lambda code: gids[code - first] if first <= code < first + cnt else 0
        if fmt == 0:
            arr = data[base + 6 : base + 6 + 256]
            return lambda code: arr[code] if code < 256 else 0
        if fmt == 12:
            ngroups = struct.unpack_from(">I", data, base + 12)[0]
            groups = [struct.unpack_from(">III", data, base + 16 + 12 * i) for i in range(ngroups)]

            def lookup12(code: int) -> int:
                for s, e, g in groups:
                    if s <= code <= e:
                        return g + code - s
                return 0

            return lookup12
        return None

    def unicode_lookup(self):
        """Best unicode cmap: (3,10) > (3,1) > (0,*)."""
        best = None
        for pid, eid, base in self._subtables():
            rank = {(3, 10): 3, (3, 1): 2}.get((pid, eid), 1 if pid == 0 else 0)
            if rank and (best is None or rank > best[0]):
                lk = self._lookup_fmt(base)
                if lk:
                    best = (rank, lk)
        return best[1] if best else None

    def symbol_lookup(self):
        """(3,0) symbol cmap (code or 0xF000|code), else (1,0)."""
        for pid, eid, base in self._subtables():
            if (pid, eid) == (3, 0):
                lk = self._lookup_fmt(base)
                if lk:
                    return lambda c: lk(0xF000 | c) or lk(c)
        for pid, eid, base in self._subtables():
            if pid == 1:
                lk = self._lookup_fmt(base)
                if lk:
                    return lk
        return None

    # ----------------------------------------------------------- outlines

    def _glyf_range(self, gid: int) -> Tuple[int, int]:
        loca = self.tables["loca"][0]
        if self.loca_long:
            o1, o2 = struct.unpack_from(">II", self.data, loca + 4 * gid)
        else:
            o1, o2 = struct.unpack_from(">HH", self.data, loca + 2 * gid)
            o1, o2 = o1 * 2, o2 * 2
        return o1, o2

    def outline(self, gid: int, depth: int = 0) -> List[List[Tuple[float, float, int]]]:
        """Contours of (x, y, on_curve); composites resolved recursively."""
        if gid >= self.num_glyphs or depth > 4:
            return []
        o1, o2 = self._glyf_range(gid)
        if o1 >= o2:
            return []
        g = self.tables["glyf"][0] + o1
        data = self.data
        ncont = struct.unpack_from(">h", data, g)[0]
        if ncont >= 0:
            ends = struct.unpack_from(f">{ncont}H", data, g + 10)
            npts = ends[-1] + 1 if ncont else 0
            p = g + 10 + 2 * ncont
            ilen = struct.unpack_from(">H", data, p)[0]
            p += 2 + ilen
            flags: List[int] = []
            while len(flags) < npts:
                f = data[p]
                p += 1
                flags.append(f)
                if f & 8:
                    r = data[p]
                    p += 1
                    flags.extend([f] * r)
            xs: List[int] = []
            v = 0
            for f in flags:
                if f & 2:
                    d = data[p]
                    p += 1
                    v += d if f & 16 else -d
                elif not f & 16:
                    v += struct.unpack_from(">h", data, p)[0]
                    p += 2
                xs.append(v)
            ys: List[int] = []
            v = 0
            for f in flags:
                if f & 4:
                    d = data[p]
                    p += 1
                    v += d if f & 32 else -d
                elif not f & 32:
                    v += struct.unpack_from(">h", data, p)[0]
                    p += 2
                ys.append(v)
            pts = [(float(x), float(y), f & 1) for x, y, f in zip(xs, ys, flags)]
            contours = []
            s = 0
            for e in ends:
                contours.append(pts[s : e + 1])
                s = e + 1
            return contours
        # composite
        contours = []
        p = g + 10
        while True:
            flags, comp_gid = struct.unpack_from(">HH", data, p)
            p += 4
            if flags & 0x0001:  # words
                a1, a2 = struct.unpack_from(">hh", data, p)
                p += 4
            else:
                a1, a2 = struct.unpack_from(">bb", data, p)
                p += 2
            sx = sy = 1.0
            s01 = s10 = 0.0
            if flags & 0x0008:
                sx = sy = struct.unpack_from(">h", data, p)[0] / 16384.0
                p += 2
            elif flags & 0x0040:
                sx, sy = (v / 16384.0 for v in struct.unpack_from(">hh", data, p))
                p += 4
            elif flags & 0x0080:
                sx, s01, s10, sy = (v / 16384.0 for v in struct.unpack_from(">hhhh", data, p))
                p += 8
            dx, dy = (float(a1), float(a2)) if flags & 0x0002 else (0.0, 0.0)
            for cont in self.outline(comp_gid, depth + 1):
                contours.append(
                    [(x * sx + y * s10 + dx, x * s01 + y * sy + dy, on) for x, y, on in cont]
                )
            if not flags & 0x0020:  # MORE_COMPONENTS
                break
        return contours


# ------------------------------------------------------------ rasteriser


def rasterize(contours, units: int, size: int = _GRID):
    """→ (bool (size, size) bitmap, rel_height, rel_y_center) — bbox-fit
    normalisation, non-zero winding scanline fill, quadratics flattened."""
    if not contours:
        return None
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
    xs = [x for poly in polys for x, _ in poly]
    ys = [y for poly in polys for _, y in poly]
    x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
    w, h = max(x1 - x0, 1.0), max(y1 - y0, 1.0)
    sc = (size - 2) / max(w, h)
    img = np.zeros((size, size), bool)
    for row in range(size):
        ysamp = y1 - (row + 0.5) / sc
        crossings: List[Tuple[float, int]] = []
        for poly in polys:
            for (xa, ya), (xb, yb) in zip(poly, poly[1:] + poly[:1]):
                if (ya <= ysamp < yb) or (yb <= ysamp < ya):
                    t = (ysamp - ya) / (yb - ya)
                    crossings.append((xa + t * (xb - xa), 1 if yb > ya else -1))
        crossings.sort()
        wind = 0
        px = None
        for x, d in crossings:
            if wind != 0 and px is not None:
                ca = int((px - x0) * sc + 1)
                cb = int((x - x0) * sc + 1)
                img[row, max(0, ca) : min(size, cb + 1)] = True
            wind += d
            px = x
        # thin-feature safety: mark crossing columns even when the span
        # rounds to zero pixels
        for x, _ in crossings:
            cc = int((x - x0) * sc + 1)
            if 0 <= cc < size:
                pass
    return img, h / units, ((y0 + y1) / 2.0) / units


# ----------------------------------------------------------------- atlas

# cp1251 printable charset, sorted by byte value — the drivers assign
# glyph codes in this order, which is what the DP exploits.
_CP1251_BYTES = [b for b in range(0x20, 0x100)]


def _cp1251_chars() -> List[Tuple[int, str]]:
    out = []
    for b in _CP1251_BYTES:
        try:
            ch = bytes([b]).decode("cp1251")
        except UnicodeDecodeError:
            continue
        if ch.isprintable() and not ch.isspace() or ch == " ":
            out.append((b, ch))
    return out


@lru_cache(maxsize=1)
def _atlas():
    """(chars, entries): chars = [(byte, char)] sorted by cp1251 byte (one
    DP column per char); entries = [(char_index, bitmap, rel_h, rel_yc)]
    across all available DejaVu faces.  None when no faces exist."""
    import os

    chars = [(b, ch) for b, ch in _cp1251_chars() if ch != " "]
    chars.sort()
    index = {ch: i for i, (b, ch) in enumerate(chars)}
    entries = []
    for path in _DEJAVU_PATHS:
        if not os.path.exists(path):
            continue
        try:
            font = SfntFont(open(path, "rb").read())
        except (OSError, BadTtf):
            continue
        lk = font.unicode_lookup()
        if lk is None:
            continue
        for byte, ch in chars:
            gid = lk(ord(ch))
            if not gid:
                continue
            r = rasterize(font.outline(gid), font.units_per_em)
            if r is None:
                continue
            entries.append((index[ch], r[0], r[1], r[2]))
    if not entries:
        return None
    return chars, entries


# ------------------------------------------------------------- recovery


def _score_matrix(glyphs, chars, entries):
    """glyphs: [(code, bitmap, rel_h, rel_yc)] → (n, n_chars) scores; per
    char the best match over all atlas faces."""
    col = np.array([e[0] for e in entries], np.int64)
    bmps = np.stack([e[1] for e in entries]).reshape(len(entries), -1).astype(np.float32)
    hs = np.array([e[2] for e in entries], np.float32)
    ycs = np.array([e[3] for e in entries], np.float32)
    nchars = len(chars)
    rows = []
    for _code, bmp, rh, ryc in glyphs:
        v = bmp.reshape(-1).astype(np.float32)
        inter = bmps @ v
        union = bmps.sum(axis=1) + v.sum() - inter
        iou = inter / np.maximum(union, 1.0)
        entry_score = iou - 1.6 * np.abs(hs - rh) - 1.2 * np.abs(ycs - ryc)
        best = np.full(nchars, -2.0, np.float32)
        np.maximum.at(best, col, entry_score)
        rows.append(best)
    return np.stack(rows)


def _monotone_assign(scores: np.ndarray) -> List[int]:
    """Max-total-score strictly increasing assignment codes→atlas columns
    (classic DP, O(n·m)); returns the column per row."""
    n, m = scores.shape
    NEG = -1e9
    dp = np.full((n, m), NEG, np.float64)
    back = np.zeros((n, m), np.int32)
    dp[0] = scores[0]
    for i in range(1, n):
        best = NEG
        bestj = -1
        run_best = np.empty(m, np.float64)
        run_arg = np.empty(m, np.int32)
        for j in range(m):
            run_best[j] = best
            run_arg[j] = bestj
            if dp[i - 1, j] > best:
                best = dp[i - 1, j]
                bestj = j
        dp[i] = np.where(run_best > NEG / 2, scores[i] + run_best, NEG)
        back[i] = run_arg
    j = int(np.argmax(dp[n - 1]))
    cols = [0] * n
    for i in range(n - 1, -1, -1):
        cols[i] = j
        j = int(back[i, j]) if i > 0 else j
    return cols


_RECOVER_CACHE: Dict[bytes, Dict[int, str]] = {}


def recover_cached(ttf_bytes: bytes) -> Dict[int, str]:
    """md5-cached front-end — one shape-matching pass per font program."""
    import hashlib

    key = hashlib.md5(ttf_bytes).digest()
    hit = _RECOVER_CACHE.get(key)
    if hit is None:
        if len(_RECOVER_CACHE) > 256:
            _RECOVER_CACHE.clear()
        hit = _RECOVER_CACHE[key] = recover_unicode_map(ttf_bytes)
    return hit


def recover_unicode_map(ttf_bytes: bytes) -> Dict[int, str]:
    """code byte → unicode for a symbolic subset TrueType with no
    ToUnicode.  Empty dict when recovery is not possible (no atlas, no
    usable cmap, too few glyphs)."""
    atlas = _atlas()
    if atlas is None:
        return {}
    chars, entries = atlas
    try:
        font = SfntFont(ttf_bytes)
    except (BadTtf, struct.error, IndexError):
        return {}
    sym = font.symbol_lookup()
    if sym is None:
        return {}
    out: Dict[int, str] = {}
    glyphs = []
    for code in range(0x01, 0x100):
        gid = sym(code)
        if not gid:
            continue
        try:
            r = rasterize(font.outline(gid), font.units_per_em)
        except (struct.error, IndexError):
            r = None
        if r is None:
            out[code] = " "  # blank glyph: space-like
        else:
            glyphs.append((code, r[0], r[1], r[2]))
    if not glyphs:
        return out  # blanks-only font: spaces are still spaces
    if len(glyphs) > len(chars):
        return {}
    scores = _score_matrix(glyphs, chars, entries)
    if len(glyphs) < 4:
        # too few glyphs to pin a shift — per-glyph best match, confident
        # ones only (single-symbol fonts: bullets, dashes, one letter)
        for i, (code, _b, _h, _yc) in enumerate(glyphs):
            j = int(np.argmax(scores[i]))
            if scores[i, j] >= 0.35:
                out[code] = chars[j][1]
        return out
    # Model 1 — constant shift: these drivers assign code = cp1251 - s for
    # one s per font (glyph gaps = unused characters). Score every shift
    # over the whole glyph set; the distinctive glyphs pin it even when
    # individual Latin/Cyrillic lookalikes tie.
    byte_to_col = {b: j for j, (b, _ch) in enumerate(chars)}
    codes = [g[0] for g in glyphs]
    best_shift, best_mean, best_cov = None, -10.0, 0.0
    for s in range(0, 0xE0):
        tot = 0.0
        n = 0
        for i, code in enumerate(codes):
            j = byte_to_col.get(code + s)
            if j is None:
                continue  # overflow / unprintable: outside this shift's block
            tot += scores[i, j]
            n += 1
        if n:
            cov = n / len(codes)
            mean = (tot / n) * cov  # coverage-weighted so junk shifts lose
            if mean > best_mean:
                best_mean, best_shift, best_cov = mean, s, cov
    if best_shift is not None and best_mean >= 0.2 and best_cov >= 0.6:
        for i, code in enumerate(codes):
            j = byte_to_col.get(code + best_shift)
            jb = int(np.argmax(scores[i]))
            if j is not None and not (
                # appended extras sometimes land INSIDE the shifted charset
                # by accident (« at Ж's slot): when the shape flatly
                # contradicts the shift, trust the shape
                scores[i, jb] - scores[i, j] > 0.25
                and scores[i, j] < 0.35
            ):
                out[code] = chars[j][1]
            else:
                # appended extras past the shifted block (ё, №, quotes…):
                # unconstrained best match
                out[code] = chars[jb][1]
        return out
    # Model 2 — free strictly-monotone assignment (subset-reordered fonts)
    cols = _monotone_assign(scores)
    picked = scores[np.arange(len(cols)), cols]
    if float(np.mean(picked)) < 0.15:  # degenerate fit — refuse rather than garble
        return {}
    for (code, _b, _h, _yc), col in zip(glyphs, cols):
        out[code] = chars[col][1]
    return out
