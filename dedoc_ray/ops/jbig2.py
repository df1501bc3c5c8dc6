"""JBIG2 (ITU-T T.88) — generic-region codec + the PDF embedded format.

The reference's PDF stack decodes JBIG2-compressed scan images through
pdfbox + the jbig2-imageio jar (dedoc/readers/pdf_reader/.../tabbypdf/
jars/jbig2-imageio-3.0.3.jar); no JVM exists here, so the ARITHMETIC
generic-region path is implemented natively:

- the MQ arithmetic coder (both directions) — the decoder shares the
  T.88 state table already pixel-validated against OpenJPEG via the
  JPEG 2000 fixture (ops/jpeg2000.py); the encoder exists so the
  decoder has a self-interop oracle and so tests can build real
  JBIG2-in-PDF scan pages end-to-end;
- generic region decoding/encoding with template 0 (nominal AT pixels)
  and TPGDON typical-prediction rows (SLTP context 0x9B25);
- the embedded-stream segment layer PDF uses (segment headers, page
  info 48, immediate (lossless) generic regions 38/39, end-of-page 49,
  end-of-file 51) plus the optional JBIG2Globals stream.

Scope notes: MMR-coded regions route to the existing CCITT-G4 decoder
(ops/ccitt.py — the MMR code IS T.6); symbol/text/halftone regions and
refinement raise :class:`BadJbig2` (the scanner-output subset most PDFs
use for photos/line art is generic-region; textual symbol coding stays
an honest gate). Context bit-packing follows the spec figure rows
top-to-bottom MSB-first with nominal ATs; non-nominal AT pixels raise.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from dedoc_ray.ops.jpeg2000 import _MQ_STATES


class BadJbig2(ValueError):
    pass


# ------------------------------------------------------------- MQ coder
#
# Sparse-context variants (JBIG2 generic template 0 addresses 2^16
# contexts; only the visited ones get state).


class MQDec:
    __slots__ = ("data", "bp", "c", "a", "ct", "cx")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bp = 0
        self.c = (data[0] if data else 0xFF) << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000
        self.cx: Dict[int, Tuple[int, int]] = {}

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

    def decode(self, ctx: int) -> int:
        i, mps = self.cx.get(ctx, (0, 0))
        qe, nmps, nlps, switch = _MQ_STATES[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            if self.a < qe:
                d = mps
                self.cx[ctx] = (nmps, mps)
            else:
                d = 1 - mps
                self.cx[ctx] = (nlps, 1 - mps if switch else mps)
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                self.cx[ctx] = (nlps, 1 - mps if switch else mps)
            else:
                d = mps
                self.cx[ctx] = (nmps, mps)
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return d


class MQEnc:
    __slots__ = ("a", "c", "ct", "b", "out", "cx", "started")

    def __init__(self) -> None:
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.b: Optional[int] = None  # pending byte
        self.out = bytearray()
        self.cx: Dict[int, Tuple[int, int]] = {}

    def _byteout(self) -> None:
        if self.b == 0xFF:
            self._ship(self.c >> 20)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self._ship(self.c >> 19)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            # carry into the pending byte
            self.b += 1
            if self.b == 0x100:
                raise BadJbig2("carry overflow")  # cannot happen: stuffing
            if self.b == 0xFF:
                self.c &= 0x7FFFFFF
                self._ship(self.c >> 20)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.c &= 0x7FFFFFF
                self._ship(self.c >> 19)
                self.c &= 0x7FFFF
                self.ct = 8

    def _ship(self, newb: int) -> None:
        if self.b is not None:
            self.out.append(self.b)
        self.b = newb & 0xFF

    def encode(self, ctx: int, d: int) -> None:
        i, mps = self.cx.get(ctx, (0, 0))
        qe, nmps, nlps, switch = _MQ_STATES[i]
        if d == mps:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.cx[ctx] = (nmps, mps)
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            self.cx[ctx] = (nlps, 1 - mps if switch else mps)
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS (T.88): fill C's low bits with 1s, back off if past C+A
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        if self.b is not None:
            self.out.append(self.b)
        return bytes(self.out)


# -------------------------------------------------- generic region codec

_SLTP_CTX0 = 0x9B25  # template-0 typical-prediction context

# template 0 with NOMINAL AT pixels: rows top-to-bottom, left-to-right,
# MSB first — (dy, dx) offsets
_T0_OFFSETS = (
    (-2, -2), (-2, -1), (-2, 0), (-2, 1), (-2, 2),
    (-1, -3), (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2), (-1, 3),
    (0, -4), (0, -3), (0, -2), (0, -1),
)


def generic_decode(data: bytes, width: int, height: int, tpgdon: bool = False) -> np.ndarray:
    """Arithmetic generic-region decode (template 0, nominal AT) →
    uint8 (h, w) bitmap of 0/1 (1 = black)."""
    if width <= 0 or height <= 0 or width * height > 40_000_000:
        raise BadJbig2(f"bad region geometry {width}x{height}")
    mq = MQDec(data)
    # padded bitmap: 2 rows above, 4 left, 3 right — context reads never
    # branch on borders
    pw = width + 7
    bm = [bytearray(pw) for _ in range(height + 2)]
    ltp = 0
    offs = _T0_OFFSETS
    for y in range(height):
        ry = y + 2
        if tpgdon:
            if mq.decode(_SLTP_CTX0):
                ltp ^= 1
            if ltp:
                bm[ry][:] = bm[ry - 1]
                continue
        row = bm[ry]
        rm1 = bm[ry - 1]
        rm2 = bm[ry - 2]
        for x in range(width):
            px = x + 4
            ctx = (
                (rm2[px - 2] << 15) | (rm2[px - 1] << 14) | (rm2[px] << 13)
                | (rm2[px + 1] << 12) | (rm2[px + 2] << 11)
                | (rm1[px - 3] << 10) | (rm1[px - 2] << 9) | (rm1[px - 1] << 8)
                | (rm1[px] << 7) | (rm1[px + 1] << 6) | (rm1[px + 2] << 5)
                | (rm1[px + 3] << 4)
                | (row[px - 4] << 3) | (row[px - 3] << 2) | (row[px - 2] << 1)
                | row[px - 1]
            )
            row[px] = mq.decode(ctx)
    out = np.zeros((height, width), np.uint8)
    for y in range(height):
        out[y] = np.frombuffer(bytes(bm[y + 2][4 : 4 + width]), np.uint8)
    return out


def generic_encode(bitmap: np.ndarray, tpgdon: bool = False) -> bytes:
    """Mirror of generic_decode — same template/packing, MQ-encoded."""
    height, width = bitmap.shape
    mq = MQEnc()
    pw = width + 7
    bm = [bytearray(pw) for _ in range(height + 2)]
    ltp = 0
    for y in range(height):
        ry = y + 2
        src = bitmap[y]
        if tpgdon:
            typical = y > 0 and bool((bitmap[y] == bitmap[y - 1]).all())
            bit = 1 if typical != bool(ltp) else 0
            mq.encode(_SLTP_CTX0, bit)
            ltp ^= bit
            if ltp:
                bm[ry][:] = bm[ry - 1]
                continue
        row = bm[ry]
        rm1 = bm[ry - 1]
        rm2 = bm[ry - 2]
        for x in range(width):
            px = x + 4
            ctx = (
                (rm2[px - 2] << 15) | (rm2[px - 1] << 14) | (rm2[px] << 13)
                | (rm2[px + 1] << 12) | (rm2[px + 2] << 11)
                | (rm1[px - 3] << 10) | (rm1[px - 2] << 9) | (rm1[px - 1] << 8)
                | (rm1[px] << 7) | (rm1[px + 1] << 6) | (rm1[px + 2] << 5)
                | (rm1[px + 3] << 4)
                | (row[px - 4] << 3) | (row[px - 3] << 2) | (row[px - 2] << 1)
                | row[px - 1]
            )
            bit = int(src[x] & 1)
            mq.encode(ctx, bit)
            row[px] = bit
    return mq.flush()


# ------------------------------------------------- embedded segment layer


def _parse_segment_header(data: bytes, pos: int):
    (num,) = struct.unpack_from(">I", data, pos)
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    p = pos + 5
    rts = data[p]
    count = rts >> 5
    if count == 7:
        (count,) = struct.unpack_from(">I", data, p)
        count &= 0x1FFFFFFF
        p += 4 + (count + 8) // 8  # retain bits
    else:
        p += 1
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    refs = []
    for _ in range(count):
        if ref_size == 1:
            refs.append(data[p])
        elif ref_size == 2:
            refs.append(struct.unpack_from(">H", data, p)[0])
        else:
            refs.append(struct.unpack_from(">I", data, p)[0])
        p += ref_size
    if page_assoc_4:
        (page,) = struct.unpack_from(">I", data, p)
        p += 4
    else:
        page = data[p]
        p += 1
    (length,) = struct.unpack_from(">I", data, p)
    p += 4
    if length == 0xFFFFFFFF:
        raise BadJbig2("unknown segment length unsupported")
    return num, seg_type, refs, page, length, p


def jbig2_decode_embedded(data: bytes, globals_data: bytes = b"") -> np.ndarray:
    """PDF /JBIG2Decode: embedded-organisation segments → page bitmap
    (uint8 0/1, 1 = black)."""
    page_bitmap: Optional[np.ndarray] = None
    for blob in (globals_data, data):
        pos = 0
        n = len(blob)
        while pos + 11 <= n:
            num, seg_type, refs, page, length, body = _parse_segment_header(blob, pos)
            payload = blob[body : body + length]
            pos = body + length
            if seg_type == 48:  # page info
                w, h = struct.unpack_from(">II", payload, 0)
                if h == 0xFFFFFFFF:
                    h = 0  # striped page, grows with regions
                flags = payload[16] if len(payload) > 16 else 0
                default = (flags >> 2) & 1
                page_bitmap = np.full((h, w), default, np.uint8) if h else np.zeros((0, w), np.uint8)
            elif seg_type in (36, 38, 39):  # generic region
                rw, rh, rx, ry_, _comb = struct.unpack_from(">IIIIB", payload, 0)
                gflags = payload[17]
                mmr = gflags & 1
                template = (gflags >> 1) & 3
                tpgdon = bool(gflags & 8)
                p = 18
                if not mmr:
                    n_at = 4 if template == 0 else 1
                    ats = [
                        (struct.unpack_from(">b", payload, p + 2 * i)[0],
                         struct.unpack_from(">b", payload, p + 2 * i + 1)[0])
                        for i in range(n_at)
                    ]
                    p += 2 * n_at
                    if template != 0:
                        raise BadJbig2(f"generic template {template} unsupported")
                    if ats != [(3, -1), (-3, -1), (2, -2), (-2, -2)]:
                        raise BadJbig2("non-nominal AT pixels unsupported")
                    region = generic_decode(payload[p:], rw, rh, tpgdon=tpgdon)
                else:
                    from dedoc_ray.ops.ccitt import ccitt_g4_decode

                    gray = ccitt_g4_decode(payload[p:], columns=rw, rows=rh)
                    region = (gray == 0).astype(np.uint8)  # G4 black → 1
                if page_bitmap is None:
                    page_bitmap = np.zeros((ry_ + rh, rx + rw), np.uint8)
                elif page_bitmap.shape[0] < ry_ + rh or page_bitmap.shape[1] < rx + rw:
                    grown = np.zeros(
                        (max(page_bitmap.shape[0], ry_ + rh), max(page_bitmap.shape[1], rx + rw)),
                        np.uint8,
                    )
                    grown[: page_bitmap.shape[0], : page_bitmap.shape[1]] = page_bitmap
                    page_bitmap = grown
                page_bitmap[ry_ : ry_ + rh, rx : rx + rw] |= region
            elif seg_type in (49, 50, 51, 52, 62):  # end-of-* / profiles / ext
                continue
            elif seg_type in (0, 4, 5, 6, 7, 16, 20, 22, 23, 40, 42, 43):
                raise BadJbig2(f"segment type {seg_type} (symbol/text/halftone/refinement) unsupported")
    if page_bitmap is None:
        raise BadJbig2("no page produced")
    return page_bitmap


def _segment(num: int, seg_type: int, page: int, payload: bytes) -> bytes:
    head = struct.pack(">IB", num, seg_type & 0x3F)
    head += b"\x00"  # no referred segments
    head += bytes([page])
    head += struct.pack(">I", len(payload))
    return head + payload


def jbig2_encode_embedded(bitmap: np.ndarray, tpgdon: bool = True) -> bytes:
    """Bitmap (uint8 0/1, 1 = black) → embedded-organisation JBIG2 stream
    (page info + immediate lossless generic region + end-of-page)."""
    h, w = bitmap.shape
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    region_info = struct.pack(">IIIIB", w, h, 0, 0, 0)
    gflags = (8 if tpgdon else 0)  # template 0, not MMR
    ats = struct.pack(">bbbbbbbb", 3, -1, -3, -1, 2, -2, -2, -2)
    payload = region_info + bytes([gflags]) + ats + generic_encode(bitmap, tpgdon=tpgdon)
    out = _segment(0, 48, 1, page_info)
    out += _segment(1, 39, 1, payload)  # immediate lossless generic region
    out += _segment(2, 49, 1, b"")  # end of page
    return out
