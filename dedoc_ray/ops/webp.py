"""Native WebP decoding — VP8L (lossless) and VP8 (lossy key frame).

Implemented from the public format documents alone: the WebP Lossless
Bitstream Specification and RFC 6386 (VP8 Data Format and Decoding
Guide).  The system libwebp is used ONLY as a test oracle (encode with
the public WebPEncode* API, compare our pixels with WebPDecode* —
the same cross-implementation interop pattern as the libjpeg and
libarchive gates elsewhere in this repo).

Reference behavior being matched: the dedoc image readers accept .webp
scans (dedoc/utils/supported_image_formats.py) through cv2/PIL; here the
container is decoded natively and fed to the same OCR/scan pipeline.

Layout notes
------------
VP8L is a 14-bit-dimension ARGB format: LSB-first bit stream, canonical
prefix codes (deflate-style code construction, first bit read is the
most significant bit of the code), an optional color cache, optional
meta prefix (huffman) image, LZ77 backward references with a 120-entry
2D distance neighborhood, and four inverse transforms (predictor,
cross-color, subtract-green, color-indexing) applied in reverse read
order.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

__all__ = ["vp8l_decode", "webp_decode_rgba", "webp_payload"]


# ----------------------------------------------------------- bit reading


class _LsbReader:
    """LSB-first bit reader (VP8L convention: first bit = bit 0 of byte)."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ValueError("VP8L: bitstream overrun")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def bits(self, k: int) -> int:
        v = 0
        for i in range(k):
            v |= self.bit() << i
        return v


# ------------------------------------------------- canonical prefix codes


class _Prefix:
    """Canonical prefix decoder (deflate code assignment; stream bits give
    the code MSB-first — the puff.c walk)."""

    __slots__ = ("counts", "symbols", "single")

    def __init__(self, lengths: List[int]) -> None:
        maxlen = max(lengths) if lengths else 0
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nz) == 1:
            # zero-bit code: always that symbol, consumes nothing
            self.single: Optional[int] = nz[0][1]
            self.counts: List[int] = []
            self.symbols: List[int] = []
            return
        self.single = None
        counts = [0] * (maxlen + 1)
        for ln, _ in nz:
            counts[ln] += 1
        # over-subscription check (incomplete codes are invalid in VP8L)
        left = 1
        for ln in range(1, maxlen + 1):
            left = (left << 1) - counts[ln]
            if left < 0:
                raise ValueError("VP8L: over-subscribed prefix code")
        self.counts = counts
        self.symbols = [sym for ln, sym in sorted(nz)]

    def decode(self, br: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        first = 0
        index = 0
        for ln in range(1, len(self.counts)):
            code |= br.bit()
            count = self.counts[ln]
            if code - first < count:
                return self.symbols[index + code - first]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise ValueError("VP8L: invalid prefix code")


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_prefix_code(br: _LsbReader, alphabet: int) -> _Prefix:
    lengths = [0] * alphabet
    if br.bit():  # simple code
        nsym = br.bit() + 1
        if br.bit():
            sym0 = br.bits(8)
        else:
            sym0 = br.bit()
        if sym0 >= alphabet:
            raise ValueError("VP8L: simple-code symbol out of range")
        if nsym == 1:
            lengths[sym0] = 1  # single-symbol: zero-bit in practice
            p = _Prefix([0] * alphabet)
            p.single = sym0
            return p
        sym1 = br.bits(8)
        if sym1 >= alphabet:
            raise ValueError("VP8L: simple-code symbol out of range")
        lengths[sym0] = 1
        lengths[sym1] = 1
        return _Prefix(lengths)
    # normal: code-length code
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl = _Prefix(cl_lengths)
    if br.bit():  # explicit max symbol count
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet
    prev = 8
    i = 0
    while i < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if i >= alphabet:
                    raise ValueError("VP8L: code-length repeat overrun")
                lengths[i] = prev
                i += 1
        elif s == 17:
            rep = 3 + br.bits(3)
            i += rep
        else:
            rep = 11 + br.bits(7)
            i += rep
        if i > alphabet:
            raise ValueError("VP8L: code-length repeat overrun")
    return _Prefix(lengths)


# ------------------------------------------------------------- LZ77 bits


def _lz_value(br: _LsbReader, code: int) -> int:
    """Length/distance prefix value: codes 0-3 literal, then exponential
    ranges with (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


# The spec's fixed plane-code → (dx, dy) neighborhood (codes 1..120).
# Verified entry-by-entry against libwebp by decoding 120 crafted
# single-backref streams (see tests/test_webp_native.py).
_DIST_PAIRS = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _distance_map(width: int) -> np.ndarray:
    out = np.array([dy * width + dx for dx, dy in _DIST_PAIRS], np.int64)
    return np.maximum(out, 1)


# ------------------------------------------------------- image stream


def _ceil_div(a: int, b: int) -> int:
    return (a + b - 1) // b


_HASH_MUL = 0x1E35A7BD


def _read_entropy_image(br: _LsbReader, w: int, h: int) -> np.ndarray:
    """Decode a sub-resolution (transform / huffman / palette) image —
    same pixel coder, no transforms, no meta prefix."""
    return _decode_pixels(br, w, h, level0=False)


def _decode_pixels(br: _LsbReader, w: int, h: int, level0: bool,
                   meta: "Optional[np.ndarray]" = None, hbits: int = 0,
                   groups: "Optional[list]" = None,
                   cache_bits: int = 0) -> np.ndarray:
    """Pixel decode loop → uint32 ARGB array of length w*h.

    For level0 the caller has already read transforms + cache + meta and
    passes groups in; sub-images read their own cache/codes here."""
    if groups is None:
        cache_bits = br.bits(4) if br.bit() else 0
        if cache_bits > 11:
            raise ValueError("VP8L: bad color-cache size")
        groups = [_read_code_group(br, cache_bits)]
        meta = None
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = np.zeros(cache_size, np.uint32) if cache_size else None
    out = np.zeros(w * h, np.uint32)
    dist_map = _distance_map(w)
    npix = w * h
    i = 0
    hrow_w = _ceil_div(w, 1 << hbits) if meta is not None else 0
    g = groups[0]
    while i < npix:
        if meta is not None:
            x = i % w
            y = i // w
            g = groups[meta[(y >> hbits) * hrow_w + (x >> hbits)]]
        green_code, red_code, blue_code, alpha_code, dist_code = g
        s = green_code.decode(br)
        if s < 256:
            red = red_code.decode(br)
            blue = blue_code.decode(br)
            alpha = alpha_code.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            if cache is not None:
                cache[((_HASH_MUL * px) & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            i += 1
        elif s < 280:
            length = _lz_value(br, s - 256)
            dcode = dist_code.decode(br)
            dval = _lz_value(br, dcode)
            if dval > 120:
                dist = dval - 120
            else:
                dist = int(dist_map[dval - 1])
            if dist > i:
                raise ValueError("VP8L: backref before start")
            if i + length > npix:
                raise ValueError("VP8L: backref past end")
            if cache is not None:
                shift = 32 - cache_bits
                for k in range(length):
                    px = out[i - dist]
                    out[i] = px
                    cache[((_HASH_MUL * int(px)) & 0xFFFFFFFF) >> shift] = px
                    i += 1
            elif dist >= length:
                out[i:i + length] = out[i - dist:i - dist + length]
                i += length
            else:
                for k in range(length):
                    out[i] = out[i - dist]
                    i += 1
        else:
            if cache is None or s - 280 >= cache_size:
                raise ValueError("VP8L: cache index without cache")
            out[i] = cache[s - 280]
            i += 1
    return out


def _read_code_group(br: _LsbReader, cache_bits: int) -> tuple:
    cache_size = (1 << cache_bits) if cache_bits else 0
    green = _read_prefix_code(br, 256 + 24 + cache_size)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    dist = _read_prefix_code(br, 40)
    return green, red, blue, alpha, dist


# ------------------------------------------------------ inverse transforms


def _inv_subtract_green(argb: np.ndarray) -> None:
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) + g) & 0xFF
    b = (argb + g) & 0xFF
    argb &= np.uint32(0xFF00FF00)
    argb |= (r << 16) | b


def _inv_color_transform(argb: np.ndarray, w: int, h: int,
                         bits: int, data: np.ndarray) -> None:
    """Cross-color inverse: per-block multipliers live in the transform
    image's channels (g2r=blue, g2b=green, r2b=red); delta = (s8*s8)>>5."""
    bw = _ceil_div(w, 1 << bits)
    img = argb.reshape(h, w)
    # per-pixel block index → multiplier planes (vectorized per row-block)
    bx = np.arange(w) >> bits
    for y in range(h):
        row = img[y]
        cte = data[(y >> bits) * bw + bx]
        g2r = (cte & 0xFF).astype(np.int64)
        g2b = ((cte >> 8) & 0xFF).astype(np.int64)
        r2b = ((cte >> 16) & 0xFF).astype(np.int64)
        g2r -= (g2r & 0x80) << 1
        g2b -= (g2b & 0x80) << 1
        r2b -= (r2b & 0x80) << 1
        g = ((row >> 8) & 0xFF).astype(np.int64)
        gs = g - ((g & 0x80) << 1)
        r = ((row >> 16) & 0xFF).astype(np.int64)
        b = (row & 0xFF).astype(np.int64)
        r = (r + ((g2r * gs) >> 5)) & 0xFF
        rs = r - ((r & 0x80) << 1)
        b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
        img[y] = (row & np.uint32(0xFF00FF00)) | (r << 16).astype(np.uint32) | b.astype(np.uint32)


def _avg2(a: int, b: int) -> int:
    # per-channel floor average packed in u32
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(c0: int, c1: int, c2: int) -> int:
    out = 0
    for sh in (0, 8, 16, 24):
        v = ((c0 >> sh) & 0xFF) + ((c1 >> sh) & 0xFF) - ((c2 >> sh) & 0xFF)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _clamp_add_sub_half(c0: int, c1: int, c2: int) -> int:
    # ClampAddSubtractHalf(Average2(c0, c1), c2)
    ave = _avg2(c0, c1)
    out = 0
    for sh in (0, 8, 16, 24):
        a = (ave >> sh) & 0xFF
        b = (c2 >> sh) & 0xFF
        v = a + (a - b) // 2 if (a - b) >= 0 else a - ((b - a) // 2)
        v = 0 if v < 0 else (255 if v > 255 else v)
        out |= v << sh
    return out


def _select(left: int, top: int, topleft: int) -> int:
    p_l = 0
    p_t = 0
    for sh in (0, 8, 16, 24):
        p = ((left >> sh) & 0xFF) + ((top >> sh) & 0xFF) - ((topleft >> sh) & 0xFF)
        p_l += abs(p - ((left >> sh) & 0xFF))
        p_t += abs(p - ((top >> sh) & 0xFF))
    return left if p_l < p_t else top


def _inv_predictor(argb: np.ndarray, w: int, h: int,
                   bits: int, data: np.ndarray) -> None:
    bw = _ceil_div(w, 1 << bits)
    img = argb.reshape(h, w)
    add = lambda px, pred: (  # noqa: E731 - per-channel modular add
        ((px & 0x00FF00FF) + (pred & 0x00FF00FF)) & 0x00FF00FF
    ) | (((px & 0xFF00FF00) + (pred & 0xFF00FF00)) & 0xFF00FF00)
    for y in range(h):
        row = img[y]
        above = img[y - 1] if y > 0 else None
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(row[x - 1])
            elif x == 0:
                pred = int(above[x])
            else:
                mode = (int(data[(y >> bits) * bw + (x >> bits)]) >> 8) & 0xFF
                left = int(row[x - 1])
                top = int(above[x])
                tl = int(above[x - 1])
                # top-right of the last column wraps to the CURRENT row's
                # first (already reconstructed) pixel — the contiguous
                # buffer convention the format is defined over
                tr = int(above[x + 1]) if x + 1 < w else int(row[0])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = left
                elif mode == 2:
                    pred = top
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(left, tr), top)
                elif mode == 6:
                    pred = _avg2(left, tl)
                elif mode == 7:
                    pred = _avg2(left, top)
                elif mode == 8:
                    pred = _avg2(tl, top)
                elif mode == 9:
                    pred = _avg2(top, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(left, tl), _avg2(top, tr))
                elif mode == 11:
                    pred = _select(left, top, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(left, top, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(left, top, tl)
                else:
                    raise ValueError("VP8L: bad predictor mode")
            row[x] = add(int(row[x]), pred)


def _inv_color_index(argb: np.ndarray, w: int, h: int,
                     width_bits: int, palette: np.ndarray) -> np.ndarray:
    """Expand packed palette indices (green channel) to full-width ARGB."""
    packed_w = _ceil_div(w, 1 << width_bits) if width_bits else w
    img = argb.reshape(h, packed_w)
    out = np.zeros((h, w), np.uint32)
    n = len(palette)
    if width_bits == 0:
        idx = (img >> 8) & 0xFF
    else:
        per = 1 << width_bits
        bpp = 8 >> width_bits
        mask = (1 << bpp) - 1
        g = ((img >> 8) & 0xFF).astype(np.uint32)
        cols = np.zeros((h, packed_w * per), np.uint32)
        for k in range(per):
            cols[:, k::per] = (g >> (k * bpp)) & mask
        idx = cols[:, :w]
    safe = np.where(idx < n, idx, 0)
    out = palette[safe]
    out[idx >= n] = 0
    return out.reshape(-1)


# ------------------------------------------------------------ top level


def vp8l_decode(payload: bytes) -> np.ndarray:
    """VP8L chunk payload → (h, w, 4) uint8 RGBA."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature")
    br = _LsbReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("VP8L: unknown version")

    transforms: List[tuple] = []
    cur_w = w
    seen = set()
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / cross-color
            size_bits = br.bits(3) + 2
            bw = _ceil_div(cur_w, 1 << size_bits)
            bh = _ceil_div(h, 1 << size_bits)
            data = _read_entropy_image(br, bw, bh)
            transforms.append((ttype, size_bits, data))
        elif ttype == 2:
            transforms.append((2, 0, None))
        else:  # color indexing
            n = br.bits(8) + 1
            raw = _read_entropy_image(br, n, 1)
            # palette entries are componentwise deltas from the previous
            pal = np.zeros(n, np.uint32)
            prev = 0
            for j in range(n):
                cur = int(raw[j])
                prev = ((
                    ((prev & 0x00FF00FF) + (cur & 0x00FF00FF)) & 0x00FF00FF
                ) | (((prev & 0xFF00FF00) + (cur & 0xFF00FF00)) & 0xFF00FF00))
                pal[j] = prev
            width_bits = 3 if n <= 2 else (2 if n <= 4 else (1 if n <= 16 else 0))
            transforms.append((3, width_bits, pal))
            if width_bits:
                cur_w = _ceil_div(cur_w, 1 << width_bits)

    # color cache + meta prefix for the spatially-coded image
    cache_bits = br.bits(4) if br.bit() else 0
    if cache_bits > 11:
        raise ValueError("VP8L: bad color-cache size")
    meta = None
    hbits = 0
    ngroups = 1
    if br.bit():
        hbits = br.bits(3) + 2
        hw = _ceil_div(cur_w, 1 << hbits)
        hh = _ceil_div(h, 1 << hbits)
        himg = _read_entropy_image(br, hw, hh)
        meta = ((himg >> 8) & 0xFFFF).astype(np.int64)
        ngroups = int(meta.max()) + 1
    groups = [_read_code_group(br, cache_bits) for _ in range(ngroups)]
    argb = _decode_pixels(br, cur_w, h, True, meta=meta, hbits=hbits,
                          groups=groups, cache_bits=cache_bits)

    # inverse transforms in reverse read order
    for ttype, bits, data in reversed(transforms):
        if ttype == 0:
            _inv_predictor(argb, cur_w, h, bits, data)
        elif ttype == 1:
            _inv_color_transform(argb, cur_w, h, bits, data)
        elif ttype == 2:
            _inv_subtract_green(argb)
        else:
            argb = _inv_color_index(argb, w, h, bits, data)
            cur_w = w

    rgba = np.empty((h, w, 4), np.uint8)
    px = argb.reshape(h, w)
    rgba[..., 0] = (px >> 16) & 0xFF
    rgba[..., 1] = (px >> 8) & 0xFF
    rgba[..., 2] = px & 0xFF
    rgba[..., 3] = (px >> 24) & 0xFF
    return rgba


def webp_decode_rgba(data: bytes) -> np.ndarray:
    """RIFF/WEBP container → (h, w, 4) uint8 RGBA (native decode)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    chunks = {}
    order = []
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        chunks[tag] = data[pos + 8:pos + 8 + size]
        order.append(tag)
        pos += 8 + size + (size & 1)
    if b"VP8L" in chunks:
        return vp8l_decode(chunks[b"VP8L"])
    if b"VP8 " in chunks:
        from dedoc_ray.ops.vp8 import vp8_decode_rgba

        return vp8_decode_rgba(chunks[b"VP8 "], chunks.get(b"ALPH"))
    raise ValueError("WebP: no VP8/VP8L chunk")


# ------------------------------------------------------------ payload


def webp_payload(doc_id: int) -> bytes:
    """Deterministic VP8L image for the media corpus: a two-tone vertical
    gradient band pattern whose mean is SQL-replayable. Encoded natively
    (simple prefix codes, no transforms) — decodable by this module and
    by libwebp (interop pinned in tests/test_webp_native.py)."""
    w = 8 + doc_id % 9
    h = 8 + doc_id % 5
    lo = doc_id % 200
    hi = lo + 40
    # pixel grid: column parity picks lo/hi gray
    cols = np.arange(w) % 2
    grid = np.where(cols[None, :] == 0, lo, hi).astype(np.uint8)
    grid = np.broadcast_to(grid, (h, w))

    bits: List[int] = []

    def put(v: int, k: int) -> None:
        for i in range(k):
            bits.append((v >> i) & 1)

    put(w - 1, 14)
    put(h - 1, 14)
    put(0, 1)   # no alpha hint
    put(0, 3)   # version
    put(0, 1)   # no transforms
    put(0, 1)   # no color cache
    put(0, 1)   # no meta prefix image
    # GREEN: simple code, 2 symbols (lo, hi), 8-bit first symbol
    put(1, 1)   # simple
    put(1, 1)   # two symbols
    put(1, 1)   # first symbol is 8-bit
    put(lo, 8)
    put(hi, 8)
    # RED, BLUE: same two-symbol codes; ALPHA: single symbol 255
    for _ in range(2):
        put(1, 1)
        put(1, 1)
        put(1, 1)
        put(lo, 8)
        put(hi, 8)
    put(1, 1)   # ALPHA simple
    put(0, 1)   # one symbol
    put(1, 1)   # 8-bit symbol
    put(255, 8)
    # DIST: single-symbol code (unused)
    put(1, 1)
    put(0, 1)
    put(0, 1)
    put(0, 1)   # symbol 0 via 1-bit form
    # pixels: literals; two-symbol codes assign code 0 to the smaller
    # SYMBOL VALUE (canonical order), 1 to the larger
    bit_of = {lo: 0, hi: 1}
    for v in grid.reshape(-1):
        b = bit_of[int(v)]
        put(b, 1)  # green
        put(b, 1)  # red
        put(b, 1)  # blue
        # alpha: zero-bit code
    payload = bytearray([0x2F])
    acc = 0
    nb = 0
    for b in bits:
        acc |= b << nb
        nb += 1
        if nb == 8:
            payload.append(acc)
            acc = 0
            nb = 0
    if nb:
        payload.append(acc)
    chunk = bytes(payload)
    if len(chunk) & 1:
        chunk += b"\x00"
    riff = b"WEBPVP8L" + len(payload).to_bytes(4, "little") + chunk
    return b"RIFF" + (len(riff)).to_bytes(4, "little") + riff
