"""JPEG 2000 (ITU-T T.800) — native decoder for the reversible path.

The reference's image route accepts ``.j2k/.jp2`` scans (cv2/PIL decode
via OpenJPEG — dedoc/extensions.py:30); this container has no OpenJPEG,
so the codestream is decoded natively from the public spec:

- codestream markers (SOC/SIZ/COD/QCD/COM/SOT/SOD/EOC), raw ``.j2k``
  and the ``.jp2`` box container (jp2c box),
- LRCP/RLCP/RPCL packet iteration with tag-tree coded packet headers
  (inclusion, zero bit-planes, pass counts, Lblock lengths),
- EBCOT tier-1: the MQ arithmetic decoder (T.88 Qe table) with the
  three coding passes (significance propagation, magnitude refinement,
  cleanup with run mode) and the standard context formation per band,
- inverse 5/3 reversible DWT (lifting, even-start tiles) + DC shift.

Scope: reversible (transform=1) single-tile codestreams without
quantisation — exactly what lossless encoders emit.  Irreversible 9/7
streams raise ``ValueError`` (the scanned corpus is lossless).

Oracle: /root/reference/tests/data/scanned/example.j2k is the same image
as example.png (all ``example.*`` fixtures are one picture); the decoded
RGB must equal the PNG's RGB byte-for-byte (tests/test_jpeg2000.py).
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np


class BadJ2K(ValueError):
    pass


# ------------------------------------------------------------- MQ decoder

# T.88 state table: (Qe, NMPS, NLPS, SWITCH)
_MQ_STATES = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0), (0x0AC1, 4, 12, 0),
    (0x0521, 5, 29, 0), (0x0221, 38, 33, 0), (0x5601, 7, 6, 1), (0x5401, 8, 14, 0),
    (0x4801, 9, 14, 0), (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1), (0x5401, 16, 14, 0),
    (0x5101, 17, 15, 0), (0x4801, 18, 16, 0), (0x3801, 19, 17, 0), (0x3401, 20, 18, 0),
    (0x3001, 21, 19, 0), (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0), (0x1401, 28, 25, 0),
    (0x1201, 29, 26, 0), (0x1101, 30, 27, 0), (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0),
    (0x08A1, 33, 30, 0), (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0), (0x0085, 40, 37, 0),
    (0x0049, 41, 38, 0), (0x0025, 42, 39, 0), (0x0015, 43, 40, 0), (0x0009, 44, 41, 0),
    (0x0005, 45, 42, 0), (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
)

N_CTX = 19
CTX_UNI = 18
CTX_RUN = 17


class MQDecoder:
    """Software-conventions MQ decoder (T.800 Annex C / T.88)."""

    __slots__ = ("data", "bp", "c", "a", "ct", "I", "mps")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        self.c = (data[0] if data else 0xFF) << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000
        self.I = [0] * N_CTX
        self.mps = [0] * N_CTX
        self.I[0] = 4
        self.I[CTX_RUN] = 3
        self.I[CTX_UNI] = 46

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < len(data) else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if b1 > 0x8F:
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            self.bp = bp + 1
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            self.c += b1 << 8
            self.ct = 8

    def decode(self, cx: int) -> int:
        qe, nmps, nlps, switch = _MQ_STATES[self.I[cx]]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS path (or conditional exchange)
            if self.a < qe:
                d = self.mps[cx]
                self.I[cx] = nmps
            else:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.I[cx] = nlps
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return self.mps[cx]
            if self.a < qe:
                d = 1 - self.mps[cx]
                if switch:
                    self.mps[cx] = 1 - self.mps[cx]
                self.I[cx] = nlps
            else:
                d = self.mps[cx]
                self.I[cx] = nmps
        # renormalise
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


# ------------------------------------------------------- packet bit reader


class _PktReader:
    """MSB-first bit reader with 0xFF bit-stuffing (packet headers):
    the byte after a 0xFF carries only 7 payload bits (its MSB is a
    stuffed zero)."""

    __slots__ = ("data", "pos", "buf", "nbits", "last")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.last = 0

    def read(self) -> int:
        if self.nbits == 0:
            b = self.data[self.pos]
            self.pos += 1
            self.nbits = 7 if self.last == 0xFF else 8
            self.buf = b
            self.last = b
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read()
        return v

    def finish(self) -> int:
        """End of packet header: discard the rest of the current byte; a
        trailing 0xFF is followed by one stuffing byte that also belongs
        to the header."""
        if self.last == 0xFF:
            self.pos += 1
        self.nbits = 0
        self.last = 0
        return self.pos


class TagTree:
    def __init__(self, w: int, h: int) -> None:
        self.levels: List[Tuple[int, int]] = []
        while True:
            self.levels.append((w, h))
            if w == 1 and h == 1:
                break
            w = (w + 1) // 2
            h = (h + 1) // 2
        self.low = [np.zeros((lh, lw), np.int32) for lw, lh in self.levels]
        self.known = [np.zeros((lh, lw), bool) for lw, lh in self.levels]

    def decode(self, rd: _PktReader, i: int, j: int, threshold: int) -> int:
        """Raise the leaf's lower bound up to ``threshold``; returns the
        bound (== value if the leaf became known below threshold)."""
        val = 0
        for lev in range(len(self.levels) - 1, -1, -1):
            jj, ii = j >> lev, i >> lev
            low, known = self.low[lev], self.known[lev]
            if low[ii, jj] < val:
                low[ii, jj] = val
            while low[ii, jj] < threshold and not known[ii, jj]:
                if rd.read():
                    known[ii, jj] = True
                else:
                    low[ii, jj] += 1
            val = low[ii, jj]
        return val

    def leaf_known(self, i: int, j: int) -> bool:
        return bool(self.known[0][i, j])


# ------------------------------------------------------------ T1 contexts

_SIG_LUT: Dict[str, List[int]] = {}


def _build_sig_luts() -> None:
    for band in ("LL", "HL", "HH"):
        lut = [0] * (3 * 3 * 5)
        for h in range(3):
            for v in range(3):
                for d in range(5):
                    if band in ("LL",):
                        hh, vv = h, v
                    else:  # HL: transpose roles
                        hh, vv = v, h
                    if band == "HH":
                        if d >= 3:
                            cx = 8
                        elif d == 2:
                            cx = 7 if h + v >= 1 else 6
                        elif d == 1:
                            cx = 5 if h + v >= 2 else (4 if h + v == 1 else 3)
                        else:
                            cx = 2 if h + v >= 2 else (1 if h + v == 1 else 0)
                    else:
                        if hh == 2:
                            cx = 8
                        elif hh == 1:
                            cx = 7 if vv >= 1 else (6 if d >= 1 else 5)
                        else:
                            if vv == 2:
                                cx = 4
                            elif vv == 1:
                                cx = 3
                            else:
                                cx = 2 if d >= 2 else (1 if d == 1 else 0)
                    lut[(h * 3 + v) * 5 + d] = cx
        _SIG_LUT[band] = lut


_build_sig_luts()

_SIGN_CTX_FLAT = [0] * 9  # index (h+1)*3 + (v+1)
_SIGN_XOR_FLAT = [0] * 9
for _h in (-1, 0, 1):
    for _v in (-1, 0, 1):
        if _h == 1:
            c, x = {1: (13, 0), 0: (12, 0), -1: (11, 0)}[_v]
        elif _h == 0:
            c, x = {1: (10, 0), 0: (9, 0), -1: (10, 1)}[_v]
        else:
            c, x = {1: (11, 1), 0: (12, 1), -1: (13, 1)}[_v]
        _SIGN_CTX_FLAT[(_h + 1) * 3 + (_v + 1)] = c
        _SIGN_XOR_FLAT[(_h + 1) * 3 + (_v + 1)] = x


class _CodeBlock:
    __slots__ = ("x0", "y0", "w", "h", "included", "zbp", "lblock", "data", "npasses")

    def __init__(self, x0: int, y0: int, w: int, h: int) -> None:
        self.x0, self.y0, self.w, self.h = x0, y0, w, h
        self.included = False
        self.zbp = 0
        self.lblock = 3
        self.data = b""
        self.npasses = 0


def _t1_decode(cb: _CodeBlock, band_kind: str, mb: int) -> np.ndarray:
    """EBCOT tier-1 → signed coefficients (h, w).  Flat bytearrays + local
    caching: this is the decoder's hot loop."""
    w, h = cb.w, cb.h
    if cb.npasses == 0 or not cb.data:
        return np.zeros((h, w), np.int64)
    numbps = mb - cb.zbp
    if numbps <= 0:
        return np.zeros((h, w), np.int64)
    stride = w + 2
    sig = bytearray((h + 2) * stride)   # 1-padded borders, index (y+1)*stride + x+1
    neg = bytearray((h + 2) * stride)   # sign: 1 = negative
    visited = bytearray(h * w)
    refined = bytearray(h * w)
    mag = [0] * (h * w)
    mq = MQDecoder(cb.data)
    mq_decode = mq.decode
    lut = _SIG_LUT["HL" if band_kind == "HL" else ("HH" if band_kind == "HH" else "LL")]
    sign_ctx = _SIGN_CTX_FLAT
    sign_xor = _SIGN_XOR_FLAT

    def decode_sign(p: int) -> int:
        # p = padded index of the sample
        l, r = p - 1, p + 1
        u, d = p - stride, p + stride
        hc = (sig[l] and (1 - 2 * neg[l])) + (sig[r] and (1 - 2 * neg[r]))
        vc = (sig[u] and (1 - 2 * neg[u])) + (sig[d] and (1 - 2 * neg[d]))
        hc = -1 if hc < -1 else (1 if hc > 1 else hc)
        vc = -1 if vc < -1 else (1 if vc > 1 else vc)
        k = (hc + 1) * 3 + (vc + 1)
        bit = mq_decode(sign_ctx[k])
        return bit ^ sign_xor[k]  # 1 = negative

    plane = numbps - 1
    passno = 0
    total = cb.npasses
    pass_kind = 2  # cleanup first; then sigprop, magref, cleanup per plane
    while passno < total and plane >= 0:
        bit_at_plane = 1 << plane
        if pass_kind == 0:  # significance propagation
            for ys in range(0, h, 4):
                ye = ys + 4 if ys + 4 < h else h
                for x in range(w):
                    p0 = (ys + 1) * stride + x + 1
                    i0 = ys * w + x
                    for y in range(ys, ye):
                        p = p0
                        i = i0
                        p0 += stride
                        i0 += w
                        if sig[p]:
                            continue
                        hcnt = sig[p - 1] + sig[p + 1]
                        vcnt = sig[p - stride] + sig[p + stride]
                        dcnt = (sig[p - stride - 1] + sig[p - stride + 1]
                                + sig[p + stride - 1] + sig[p + stride + 1])
                        cx = lut[(hcnt * 3 + vcnt) * 5 + dcnt]
                        if cx == 0:
                            continue
                        visited[i] = 1
                        if mq_decode(cx):
                            s = decode_sign(p)
                            sig[p] = 1
                            neg[p] = s
                            mag[i] = bit_at_plane
        elif pass_kind == 1:  # magnitude refinement
            for ys in range(0, h, 4):
                ye = ys + 4 if ys + 4 < h else h
                for x in range(w):
                    p0 = (ys + 1) * stride + x + 1
                    i0 = ys * w + x
                    for y in range(ys, ye):
                        p = p0
                        i = i0
                        p0 += stride
                        i0 += w
                        if not sig[p] or visited[i]:
                            continue
                        if refined[i]:
                            cx = 16
                        else:
                            nb = (sig[p - 1] + sig[p + 1] + sig[p - stride]
                                  + sig[p + stride] + sig[p - stride - 1]
                                  + sig[p - stride + 1] + sig[p + stride - 1]
                                  + sig[p + stride + 1])
                            cx = 15 if nb else 14
                            refined[i] = 1
                        if mq_decode(cx):
                            mag[i] |= bit_at_plane
        else:  # cleanup
            for ys in range(0, h, 4):
                ye = ys + 4 if ys + 4 < h else h
                full = ye - ys == 4
                for x in range(w):
                    pbase = (ys + 1) * stride + x + 1
                    ibase = ys * w + x
                    k = 0
                    if full:
                        run_ok = True
                        p = pbase
                        i = ibase
                        for _ in range(4):
                            if sig[p] or visited[i]:
                                run_ok = False
                                break
                            hcnt = sig[p - 1] + sig[p + 1]
                            vcnt = sig[p - stride] + sig[p + stride]
                            dcnt = (sig[p - stride - 1] + sig[p - stride + 1]
                                    + sig[p + stride - 1] + sig[p + stride + 1])
                            if lut[(hcnt * 3 + vcnt) * 5 + dcnt]:
                                run_ok = False
                                break
                            p += stride
                            i += w
                        if run_ok:
                            if not mq_decode(CTX_RUN):
                                continue
                            r = (mq_decode(CTX_UNI) << 1) | mq_decode(CTX_UNI)
                            p = pbase + r * stride
                            i = ibase + r * w
                            s = decode_sign(p)
                            sig[p] = 1
                            neg[p] = s
                            mag[i] = bit_at_plane
                            k = r + 1
                    p = pbase + k * stride
                    i = ibase + k * w
                    for y in range(ys + k, ye):
                        if not sig[p] and not visited[i]:
                            hcnt = sig[p - 1] + sig[p + 1]
                            vcnt = sig[p - stride] + sig[p + stride]
                            dcnt = (sig[p - stride - 1] + sig[p - stride + 1]
                                    + sig[p + stride - 1] + sig[p + stride + 1])
                            if mq_decode(lut[(hcnt * 3 + vcnt) * 5 + dcnt]):
                                s = decode_sign(p)
                                sig[p] = 1
                                neg[p] = s
                                mag[i] = bit_at_plane
                        p += stride
                        i += w
            visited = bytearray(h * w)
            plane -= 1
        passno += 1
        pass_kind = 0 if pass_kind == 2 else pass_kind + 1
    out = np.array(mag, np.int64).reshape(h, w)
    negs = np.frombuffer(bytes(neg), np.uint8).reshape(h + 2, stride)[1:-1, 1:-1]
    out[negs.astype(bool)] *= -1
    return out


# ----------------------------------------------------------- inverse DWT


def _inv_53_1d(low: np.ndarray, high: np.ndarray, axis: int) -> np.ndarray:
    """Inverse 5/3 lifting along ``axis`` (even-start signals)."""
    low = np.moveaxis(low, axis, 0).astype(np.int64)
    high = np.moveaxis(high, axis, 0).astype(np.int64)
    nl, nh = low.shape[0], high.shape[0]
    n = nl + nh
    out = np.zeros((n,) + low.shape[1:], np.int64)
    if n == 1:
        out[0] = low[0] if nl else high[0] // 2
        return np.moveaxis(out, 0, axis)
    # step 1: even samples  X[2i] = L[i] - floor((H[i-1] + H[i] + 2) / 4)
    # (H[i-1] with symmetric extension: for i=0 → H[0])
    hi = np.empty_like(low)
    for i in range(nl):
        a = high[i - 1] if i - 1 >= 0 else (high[0] if nh else 0)
        b = high[i] if i < nh else (high[nh - 1] if nh else 0)
        hi[i] = a + b
    even = low - ((hi + 2) >> 2)
    # step 2: odd samples  X[2i+1] = H[i] + floor((X[2i] + X[2i+2]) / 2)
    odd = np.empty_like(high)
    for i in range(nh):
        a = even[i]
        b = even[i + 1] if i + 1 < nl else even[nl - 1]
        odd[i] = high[i] + ((a + b) >> 1)
    out[0::2] = even
    out[1::2] = odd
    return np.moveaxis(out, 0, axis)


def _inv_53_2d(ll: np.ndarray, hl: np.ndarray, lh: np.ndarray, hh: np.ndarray) -> np.ndarray:
    # T.800 F.3.2: 2D_SR = HOR_SR (rows) then VER_SR (columns) — the exact
    # order matters for the integer lifting (floor steps do not commute)
    top = _inv_53_1d(ll, hl, 1)    # rows of the low band
    bottom = _inv_53_1d(lh, hh, 1)  # rows of the high band
    return _inv_53_1d(top, bottom, 0)


# ----------------------------------------------------------- the decoder


def _parse_markers(data: bytes):
    if data[:2] != b"\xff\x4f":
        raise BadJ2K("no SOC")
    pos = 2
    siz = cod = qcd = None
    tiles = []
    n = len(data)
    while pos + 4 <= n:
        marker = data[pos : pos + 2]
        if marker == b"\xff\xd9":
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == b"\xff\x51":
            siz = body
            pos += 2 + ln
        elif marker == b"\xff\x52":
            cod = body
            pos += 2 + ln
        elif marker == b"\xff\x5c":
            qcd = body
            pos += 2 + ln
        elif marker == b"\xff\x90":  # SOT
            isot, psot, tpsot, tnsot = struct.unpack(">HIBB", body[:8])
            # find SOD
            p2 = pos + 2 + ln
            if data[p2 : p2 + 2] != b"\xff\x93":
                # other markers may precede SOD inside the tile header
                while data[p2 : p2 + 2] != b"\xff\x93":
                    (l2,) = struct.unpack(">H", data[p2 + 2 : p2 + 4])
                    p2 += 2 + l2
            body_start = p2 + 2
            end = pos + psot if psot else n
            tiles.append((isot, data[body_start:end]))
            pos = end
        else:
            pos += 2 + ln
    if siz is None or cod is None or qcd is None:
        raise BadJ2K("missing SIZ/COD/QCD")
    return siz, cod, qcd, tiles


def j2k_decode(data: bytes) -> np.ndarray:
    """Decode a .j2k codestream or .jp2 box file → uint8 (h, w) or (h, w, c)."""
    if data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  ":
        # jp2 container: walk boxes to jp2c
        pos = 0
        stream = None
        while pos + 8 <= len(data):
            (blen,) = struct.unpack(">I", data[pos : pos + 4])
            btype = data[pos + 4 : pos + 8]
            bstart, bend = pos + 8, (pos + blen if blen else len(data))
            if blen == 1:
                (blen64,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
                bstart, bend = pos + 16, pos + blen64
            if btype == b"jp2c":
                stream = data[bstart:bend]
                break
            pos = bend
        if stream is None:
            raise BadJ2K("jp2 without jp2c box")
        data = stream
    siz, cod, qcd, tiles = _parse_markers(data)

    rsiz, xsiz, ysiz, xo, yo, xt, yt, xto, yto, ncomp = struct.unpack_from(">HIIIIIIIIH", siz, 0)
    comps = []
    for c in range(ncomp):
        ssiz, xr, yr = struct.unpack(">BBB", siz[36 + 3 * c : 39 + 3 * c])
        if xr != 1 or yr != 1:
            raise BadJ2K("component subsampling unsupported")
        comps.append((ssiz & 0x7F) + 1)  # bit depth
    if xo or yo or xto or yto:
        raise BadJ2K("image/tile offsets unsupported")
    if xt < xsiz or yt < ysiz or len(tiles) != 1:
        raise BadJ2K("multi-tile codestreams unsupported")

    scod = cod[0]
    prog, nlayers, mct = struct.unpack(">BHB", cod[1:5])
    nl, xcb, ycb, cbstyle, wavelet = cod[5], cod[6] + 2, cod[7] + 2, cod[8], cod[9]
    if scod & 0x01:
        raise BadJ2K("user precincts unsupported")
    if cbstyle:
        raise BadJ2K("codeblock style flags unsupported")
    if wavelet != 1:
        raise BadJ2K("only the 5/3 reversible transform is supported")
    if prog > 2:
        raise BadJ2K("only LRCP/RLCP/RPCL progression supported")

    sqcd = qcd[0]
    guard = sqcd >> 5
    if sqcd & 0x1F:
        raise BadJ2K("quantisation unsupported (reversible path only)")
    exps = [b >> 3 for b in qcd[1:]]

    # band geometry per resolution r (single tile at origin)
    W, H = xsiz, ysiz

    def res_dims(r: int) -> Tuple[int, int]:
        d = 1 << (nl - r)
        return (W + d - 1) // d, (H + d - 1) // d

    def band_dims(r: int, xob: int, yob: int) -> Tuple[int, int]:
        if r == 0:
            return res_dims(0)
        nb = nl - r + 1
        d = 1 << nb
        bw = (W - (1 << (nb - 1)) * xob + d - 1) // d - 0
        bh = (H - (1 << (nb - 1)) * yob + d - 1) // d - 0
        return max(0, bw), max(0, bh)

    # Mb per (r, band)
    def band_mb(r: int, bindex: int) -> int:
        # qcd exponent order: LL, then (HL, LH, HH) per r=1..nl
        if r == 0:
            e = exps[0]
        else:
            e = exps[1 + 3 * (r - 1) + bindex]
        return e + guard - 1

    cbw, cbh = 1 << xcb, 1 << ycb

    # per component, per resolution, band structures with codeblock lists
    def make_bands(r: int):
        bands = []
        kinds = [("LL", 0, 0)] if r == 0 else [("HL", 1, 0), ("LH", 0, 1), ("HH", 1, 1)]
        for bi, (kind, xob, yob) in enumerate(kinds):
            bw, bh = band_dims(r, xob, yob)
            ncx = (bw + cbw - 1) // cbw if bw else 0
            ncy = (bh + cbh - 1) // cbh if bh else 0
            cbs = []
            for cy in range(ncy):
                row = []
                for cx in range(ncx):
                    x0, y0 = cx * cbw, cy * cbh
                    row.append(
                        _CodeBlock(x0, y0, min(cbw, bw - x0), min(cbh, bh - y0))
                    )
                cbs.append(row)
            bands.append(
                {
                    "kind": kind,
                    "w": bw,
                    "h": bh,
                    "cbs": cbs,
                    "incl": TagTree(max(1, ncx), max(1, ncy)) if ncx and ncy else None,
                    "zbp": TagTree(max(1, ncx), max(1, ncy)) if ncx and ncy else None,
                    "mb": band_mb(r, bi),
                    "coef": np.zeros((bh, bw), np.int64),
                }
            )
        return bands

    state = [[make_bands(r) for r in range(nl + 1)] for _ in range(ncomp)]

    # ---------------------------------------------------- packet parsing
    tile_data = tiles[0][1]
    rd = _PktReader(tile_data, 0)

    def read_packet(c: int, r: int, layer: int) -> None:
        nonlocal rd
        if not rd.read():  # zero-length packet
            rd.__init__(tile_data, rd.finish())
            return
        contribs = []
        for band in state[c][r]:
            if band["incl"] is None or band["w"] == 0 or band["h"] == 0:
                continue
            for cy, row in enumerate(band["cbs"]):
                for cx, cb in enumerate(row):
                    if not cb.included:
                        v = band["incl"].decode(rd, cy, cx, layer + 1)
                        included = band["incl"].leaf_known(cy, cx) and v <= layer
                    else:
                        included = bool(rd.read())
                    if not included:
                        continue
                    if not cb.included:
                        # zero bitplanes: raise threshold until known
                        thr = 1
                        while not band["zbp"].leaf_known(cy, cx):
                            band["zbp"].decode(rd, cy, cx, thr)
                            thr += 1
                        cb.zbp = int(band["zbp"].low[0][cy, cx])
                        cb.included = True
                    npasses = _read_npasses(rd)
                    lblk = cb.lblock
                    while rd.read():
                        lblk += 1
                    cb.lblock = lblk
                    nbits = lblk + int(math.floor(math.log2(npasses)))
                    seglen = rd.bits(nbits)
                    contribs.append((cb, npasses, seglen))
        pos = rd.finish()
        for cb, npasses, seglen in contribs:
            cb.data += tile_data[pos : pos + seglen]
            cb.npasses += npasses
            pos += seglen
        rd.__init__(tile_data, pos)

    def _read_npasses(rd: _PktReader) -> int:
        if not rd.read():
            return 1
        if not rd.read():
            return 2
        v = rd.bits(2)
        if v < 3:
            return 3 + v
        v = rd.bits(5)
        if v < 31:
            return 6 + v
        return 37 + rd.bits(7)

    # progression iteration (single precinct per band ⇒ p loop is trivial)
    if prog == 0:  # LRCP
        order = [(l, r, c) for l in range(nlayers) for r in range(nl + 1) for c in range(ncomp)]
    elif prog == 1:  # RLCP
        order = [(l, r, c) for r in range(nl + 1) for l in range(nlayers) for c in range(ncomp)]
    else:  # RPCL
        order = [(l, r, c) for r in range(nl + 1) for c in range(ncomp) for l in range(nlayers)]
    for l, r, c in order:
        read_packet(c, r, l)

    # ------------------------------------------------------- tier-1 + DWT
    out_comps = []
    for c in range(ncomp):
        for r in range(nl + 1):
            for band in state[c][r]:
                for row in band["cbs"]:
                    for cb in row:
                        if cb.w <= 0 or cb.h <= 0:
                            continue
                        coef = _t1_decode(cb, band["kind"], band["mb"])
                        band["coef"][cb.y0 : cb.y0 + cb.h, cb.x0 : cb.x0 + cb.w] = coef
        ll = state[c][0][0]["coef"]
        for r in range(1, nl + 1):
            hl, lh, hh = (state[c][r][i]["coef"] for i in range(3))
            ll = _inv_53_2d(ll, hl, lh, hh)
        depth = comps[c]
        ll = ll + (1 << (depth - 1))
        out_comps.append(np.clip(ll, 0, (1 << depth) - 1).astype(np.uint8))
    if mct == 1 and ncomp >= 3:
        # reversible component transform (RCT) inverse
        y = out_comps[0].astype(np.int64)
        u = out_comps[1].astype(np.int64) - 128  # not reached for mct=0 corpora
        v = out_comps[2].astype(np.int64) - 128
        g = y - ((u + v) >> 2)
        r_ = v + g
        b_ = u + g
        out_comps[0], out_comps[1], out_comps[2] = (
            np.clip(r_, 0, 255).astype(np.uint8),
            np.clip(g, 0, 255).astype(np.uint8),
            np.clip(b_, 0, 255).astype(np.uint8),
        )
    if ncomp == 1:
        return out_comps[0]
    return np.stack(out_comps, axis=-1)
