"""Baseline JPEG (ITU-T T.81, SOF0) — a real decoder, stdlib + numpy only.

JPEG was the one image family left "gated on PIL" in ops/multimodal.py. But a
baseline JPEG stream is self-describing: the Huffman tables travel in DHT
segments and the quantization tables in DQT, so nothing external is needed —
just the published algorithm (Annex F): segment walk, canonical Huffman
decode with 0xFF00 byte unstuffing and RSTn restart handling, DC prediction,
run-length AC with ZRL/EOB, dequantize, inverse zigzag, 8x8 IDCT (exact
orthonormal matrix form: C.T @ B @ C), level shift, clamp, edge crop.

Scope: 8-bit baseline grayscale AND YCbCr color (4:2:0/4:4:4 MCU-interleave,
Annex-K chroma tables), plus PROGRESSIVE (SOF2) — grayscale AND
multi-component color (MCU-interleaved DC scans, per-component AC bands) —
with full successive approximation: DC refinement bits and the T.81
G.1.2.3 AC refinement path (EOB runs, buffered correction bits). The
one honest gate left: arithmetic coding. Encoders for every
supported shape generate corpora and the bit-identity tests (progressive
reconstruction must equal the baseline decode exactly).

Exactness contract used by the SQL oracle: with a flat quantization table
(all ones) a CONSTANT image decodes bit-exactly (DC-only blocks survive the
float DCT/IDCT roundtrip after rounding) — pinned by pytest over all 256
gray levels, so `jpeg_payload` features are pure functions of doc_id.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# zigzag index order (T.81 figure A.6): _ZIGZAG[k] = flat index into the 8x8
# block of the k-th coefficient in transmission order.
_ZZ = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

# orthonormal 8-point DCT-II matrix; 2D: coeffs = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16) * (np.sqrt(0.125) if _k == 0 else 0.5)

# standard Annex K luminance Huffman tables: (bits per code length 1..16, values)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61,
    0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
    0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25,
    0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64,
    0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
    0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99,
    0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3,
    0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
    0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# standard Annex K chrominance Huffman tables (T.81 tables K.4 / K.6)
_DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_VALS_C = list(range(12))
_AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61,
    0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
    0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18,
    0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63,
    0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
    0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97,
    0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA,
    0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
    0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """value → (code, length), canonical order (T.81 Annex C)."""
    out: Dict[int, Tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _Bits:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.put(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bits: _Bits, zq: np.ndarray, dc_codes, ac_codes, prev_dc: int) -> int:
    """Entropy-encode one zigzag-quantized block; returns the new DC pred."""
    diff = int(zq[0]) - prev_dc
    cat = _category(diff)
    code, ln = dc_codes[cat]
    bits.put(code, ln)
    if cat:
        bits.put(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = max((k for k in range(1, 64) if zq[k]), default=0)
    for k in range(1, last_nz + 1):
        v = int(zq[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            bits.put(zc, zl)
            run -= 16
        cat = _category(v)
        code, ln = ac_codes[(run << 4) | cat]
        bits.put(code, ln)
        bits.put(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        ec, el = ac_codes[0x00]  # EOB
        bits.put(ec, el)
    return int(zq[0])


def _quantize_block(block: np.ndarray, qtab_nat: np.ndarray) -> np.ndarray:
    """Level-shifted spatial block → zigzag-order quantized coefficients."""
    coef = _C @ block @ _C.T
    return np.round(coef / qtab_nat).astype(np.int64).reshape(64)[_ZZ]


def jpeg_encode(
    gray: np.ndarray, quant: np.ndarray | None = None, restart: int = 0, precision: int = 8
) -> bytes:
    """(h, w) grayscale → baseline JPEG (single component, Annex K Huffman
    tables at 8-bit, flat all-ones quantization by default — near-lossless
    and exactly lossless on constant blocks). ``quant`` is zigzag order as
    in the DQT segment; ``restart`` emits a DRI segment + RSTn markers
    every that many MCUs. ``precision=12`` takes uint16 samples 0..4095
    (extended-sequential: DC categories to 15, AC to 14 — Annex K tables
    stop at 11/10, so stream-carried flat tables are emitted instead)."""
    h, w = gray.shape
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    q = np.ones(64, np.uint16) if quant is None else np.asarray(quant, np.uint16).reshape(64)
    if precision == 8:
        dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
        ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
        dht_payload = (b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS),
                       b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    else:
        dc_bits = [0] * 16
        dc_vals = list(range(16))  # categories 0..15
        dc_bits[4] = 16  # all 5-bit codes (16 < 31, all-ones unused)
        ac_bits = [0] * 16
        ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)]
        ac_bits[8] = len(ac_vals)  # flat 9-bit table (226 < 511)
        dc_codes = _canonical_codes(dc_bits, dc_vals)
        ac_codes = _canonical_codes(ac_bits, ac_vals)
        dht_payload = (b"\x00" + bytes(dc_bits) + bytes(dc_vals),
                       b"\x10" + bytes(ac_bits) + bytes(ac_vals))

    bh, bw = (h + 7) // 8, (w + 7) // 8
    shift = float(1 << (precision - 1))
    padded = np.pad(gray, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge").astype(np.float64) - shift
    qtab = np.empty(64, np.float64)
    qtab[_ZZ] = q  # DQT carries zigzag order; scatter to natural order
    qtab = qtab.reshape(8, 8)

    bits = _Bits()
    prev_dc = 0
    pieces: List[bytes] = []
    nblock = 0
    for by in range(bh):
        for bx in range(bw):
            if restart and nblock and nblock % restart == 0:
                pieces.append(bits.flush())
                pieces.append(bytes([0xFF, 0xD0 + (nblock // restart - 1) % 8]))
                bits = _Bits()
                prev_dc = 0
            nblock += 1
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            prev_dc = _encode_block(bits, _quantize_block(block, qtab), dc_codes, ac_codes, prev_dc)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, b"\x00" + bytes(int(x) for x in q))
    sof = seg(0xFFC0, struct.pack(">BHHB", precision, h, w, 1) + b"\x01\x11\x00")
    dht = seg(0xFFC4, dht_payload[0]) + seg(0xFFC4, dht_payload[1])
    sos = seg(0xFFDA, b"\x01\x01\x00" + b"\x00\x3f\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart)) if restart else b""
    pieces.append(bits.flush())
    return b"\xff\xd8" + dqt + dri + sof + dht + sos + b"".join(pieces) + b"\xff\xd9"


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        # Pre-scan the entropy stream ONCE: collapse 0xFF00 stuffing, split
        # at RSTn markers, stop at the first real marker. bit()/receive()
        # then run over clean bytes with zero per-byte branching, and
        # peek16/consume power the table-driven Huffman fast path — the
        # difference between ~100 s and ~10 s on a 1 MP photo scan.
        segs: List[bytes] = []
        cur = bytearray()
        p = pos
        end = len(data)
        self.end_pos = end
        while True:
            nxt = data.find(b"\xff", p)
            if nxt < 0:
                cur += data[p:end]
                self.end_pos = end
                break
            cur += data[p:nxt]
            mk = data[nxt + 1] if nxt + 1 < end else 0xD9
            if mk == 0x00:
                cur.append(0xFF)
                p = nxt + 2
            elif 0xD0 <= mk <= 0xD7:  # restart: segment boundary
                segs.append(bytes(cur))
                cur = bytearray()
                p = nxt + 2
            else:  # real marker terminates the scan
                self.end_pos = nxt
                break
        segs.append(bytes(cur))
        self.segs = segs
        self._load(0)

    def _load(self, i: int) -> None:
        self.si = i
        self.buf = self.segs[i] if i < len(self.segs) else b""
        self.bp = 0
        self.acc = 0
        self.n = 0
        self.virt = 0

    def _fill(self) -> None:
        buf = self.buf
        bp = self.bp
        take = len(buf) - bp
        if take > 0:
            if take > 6:
                take = 6
            self.acc = ((self.acc & ((1 << self.n) - 1)) << (take * 8)) | int.from_bytes(
                buf[bp : bp + take], "big"
            )
            self.bp = bp + take
            self.n += take * 8
        else:
            # past segment end: T.81 pad bits are 1s; bounded so corrupt
            # streams that keep asking fail closed
            if self.virt > 64:
                raise ValueError("truncated JPEG entropy data")
            self.acc = ((self.acc & ((1 << self.n) - 1)) << 16) | 0xFFFF
            self.n += 16
            self.virt += 16

    def bit(self) -> int:
        n = self.n
        if not n:
            self._fill()
            n = self.n
        self.n = n - 1
        return (self.acc >> (n - 1)) & 1

    def receive(self, length: int) -> int:
        while self.n < length:
            self._fill()
        self.n -= length
        return (self.acc >> self.n) & ((1 << length) - 1)

    def peek16(self) -> int:
        while self.n < 16:
            self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def consume(self, length: int) -> None:
        self.n -= length

    @property
    def pos(self) -> int:
        """Source offset of the marker terminating the scan (read by the
        progressive path after a scan completes)."""
        return self.end_pos

    def sync_restart(self) -> None:
        """Discard pad bits and consume one RSTn marker (advance segment)."""
        if self.si + 1 >= len(self.segs):
            raise ValueError("expected restart marker")
        self._load(self.si + 1)


class _HuffLUT:
    """16-bit-prefix Huffman decode table: one peek + two list lookups per
    symbol (JPEG codes are ≤ 16 bits)."""

    __slots__ = ("sym", "length")

    def __init__(self, bits: List[int], vals: List[int]) -> None:
        sym = [0] * 65536
        lng = [0] * 65536
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                a = code << (16 - length)
                b = (code + 1) << (16 - length)
                v = vals[k]
                sym[a:b] = [v] * (b - a)
                lng[a:b] = [length] * (b - a)
                code += 1
                k += 1
            code <<= 1
        self.sym = sym
        self.length = lng


def _decode_tree(bits: List[int], vals: List[int]) -> _HuffLUT:
    """Canonical table → prefix LUT (see _HuffLUT)."""
    return _HuffLUT(bits, vals)


def _huff_read(r: _BitReader, table: _HuffLUT) -> int:
    idx = r.peek16()
    length = table.length[idx]
    if length == 0:
        raise ValueError("invalid Huffman code")
    r.consume(length)
    return table.sym[idx]


def _extend(v: int, cat: int) -> int:
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _decode_block(r: _BitReader, dct, act, q: np.ndarray, prev_dc: int) -> Tuple[np.ndarray, int]:
    """Entropy-decode one 8x8 block → (spatial block float64, new DC pred)."""
    zq = np.zeros(64, np.int64)
    cat = _huff_read(r, dct)
    diff = _extend(r.receive(cat), cat) if cat else 0
    prev_dc += diff
    zq[0] = prev_dc
    k = 1
    while k < 64:
        rs = _huff_read(r, act)
        rr, cat = rs >> 4, rs & 0xF
        if cat == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC coefficient run past block end")
        zq[k] = _extend(r.receive(cat), cat)
        k += 1
    coef = np.zeros(64, np.float64)
    coef[_ZZ] = zq * q  # dequantize in zigzag order, scatter to natural
    return _C.T @ coef.reshape(8, 8) @ _C, prev_dc


def jpeg_decode_planes(data: bytes) -> List[np.ndarray]:
    """Baseline JPEG → per-component planes at FULL resolution (uint8;
    subsampled chroma upsampled by pixel replication). One plane for
    grayscale, three (Y, Cb, Cr) for color. MCU-interleaved scan with
    per-component sampling factors, DC predictors and table ids; honors
    DRI restarts and multiple DQT/DHT segments. Progressive/arithmetic
    streams raise ValueError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    htabs: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    w = h = None
    comps: List[Tuple[int, int, int, int]] = []  # (cid, hi, vi, tq)
    scan: List[Tuple[int, int]] = []  # per component in scan order: (dc_id, ac_id)
    restart = 0
    precision = 8
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if pos + 2 + ln > len(data):
            raise ValueError("truncated JPEG segment")
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(body[b + 1 : b + 65], np.uint8).astype(np.float64)
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("truncated DHT segment")
                htabs[(tc, th)] = _decode_tree(bits, vals)
                b += 17 + nv
        elif marker == 0xC0:
            precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if precision not in (8, 12):
                raise ValueError("only 8- or 12-bit precision supported")
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component baseline JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
        elif marker == 0xC2:
            return _decode_progressive(data)
        elif marker == 0xC9:  # arithmetic sequential (T.81 Annex G)
            from dedoc_ray.ops.jpeg_arith import arith_decode_planes

            return arith_decode_planes(data)
        elif marker == 0xCA:  # arithmetic progressive (T.81 G.2)
            from dedoc_ray.ops.jpeg_arith import arith_decode_progressive

            return arith_decode_progressive(data)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            if ns != len(comps):
                raise ValueError("SOS component count mismatch")
            by_id = {c[0]: i for i, c in enumerate(comps)}
            scan = [(0, 0)] * ns
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                scan[by_id[cid]] = (tids >> 4, tids & 0xF)
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if w is None or h is None or not comps:
        raise ValueError("JPEG missing SOF0")
    if not scan:
        raise ValueError("JPEG missing SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), np.float64) for c in comps]
    tables = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        dct = htabs.get((0, scan[ci][0]))
        act = htabs.get((1, scan[ci][1]))
        q = qtabs.get(tq)
        if dct is None or act is None or q is None:
            raise ValueError("JPEG missing Huffman/quant tables")
        tables.append((dct, act, q))
    r = _BitReader(data, pos)
    preds = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and nmcu and nmcu % restart == 0:
                r.sync_restart()
                preds = [0] * len(comps)
            nmcu += 1
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dct, act, q = tables[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        block, preds[ci] = _decode_block(r, dct, act, q, preds[ci])
                        y0 = (my * vi + byi) * 8
                        x0 = (mx * hi + bxi) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    out = []
    shift = float(1 << (precision - 1))
    maxv = (1 << precision) - 1
    dtype = np.uint8 if precision == 8 else np.uint16
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        p = np.clip(np.round(planes[ci] + shift), 0, maxv).astype(dtype)
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(p[:h, :w])
    return out


def _decode_progressive(data: bytes) -> List[np.ndarray]:
    """Progressive JPEG (SOF2), grayscale — the multi-scan path: spectral
    selection (per-scan Ss..Se bands with EOB-run coding) and DC successive
    approximation (first scan at Al + one-bit refinement scans). Scans
    accumulate into a per-block coefficient store; dequantize + IDCT run
    once after EOI; AC successive-approximation refinement (Ah>0 bands,
    T.81 G.1.2.3 correction bits) is fully supported. The one honest gate:
    3-component progressive raises ValueError."""
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    htabs: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    w = h = None
    restart = 0
    comps: List[Tuple[int, int, int, int]] = []
    stores: List[np.ndarray] = []
    geoms: List[Tuple[int, int, int, int, int]] = []  # (pad_bw, true_bw, true_bh, hi, vi)
    mcux = mcuy = 0
    hmax = vmax = 1
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        if pos + 2 + ln > len(data):
            raise ValueError("truncated JPEG segment")
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(body[b + 1 : b + 65], np.uint8).astype(np.float64)
                b += 65
        elif marker == 0xC4:
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("truncated DHT segment")
                htabs[(tc, th)] = _decode_tree(bits, vals)
                b += 17 + nv
        elif marker == 0xC2:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                # the reconstruction below hardcodes the 8-bit level shift
                # (+128, clip 0..255) — refuse rather than decode wrong values
                raise ValueError("only 8-bit precision progressive JPEG supported")
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component progressive JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            for cid, hi, vi, tq in comps:
                pad_bw, pad_bh = mcux * hi, mcuy * vi
                cw = (w * hi + hmax - 1) // hmax
                ch = (h * vi + vmax - 1) // vmax
                geoms.append((pad_bw, (cw + 7) // 8, (ch + 7) // 8, hi, vi))
                stores.append(np.zeros((pad_bh * pad_bw, 64), np.int64))
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            by_id = {comps[i][0]: i for i in range(len(comps))}
            scan_list = []
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                if cid not in by_id:
                    raise ValueError("SOS names an unknown component")
                scan_list.append((by_id[cid], tids >> 4, tids & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            r = _BitReader(data, pos + 2 + ln)
            pos = _decode_prog_scan(
                r, stores, geoms, scan_list, htabs, (mcux, mcuy),
                ss, se, ahal >> 4, ahal & 0xF, restart,
            )
            continue  # r consumed up to the next marker
        pos += 2 + ln
    if not comps or w is None:
        raise ValueError("progressive JPEG missing SOF2 or scans")
    planes: List[np.ndarray] = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        q = qtabs.get(tq)
        if q is None:
            raise ValueError("JPEG missing quant table")
        pad_bw, true_bw, true_bh, _, _ = geoms[ci]
        pad_bh = mcuy * vi
        out = np.zeros((pad_bh * 8, pad_bw * 8), np.float64)
        coefs = stores[ci]
        for bi in range(pad_bh * pad_bw):
            full = np.zeros(64, np.float64)
            full[_ZZ] = coefs[bi] * q
            by, bx = divmod(bi, pad_bw)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _C.T @ full.reshape(8, 8) @ _C
        p = np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(p[:h, :w])
    return planes


def _decode_prog_scan(
    r: _BitReader, stores, geoms, scan_list, htabs, mcu_dims, ss, se, ah, al, restart
) -> int:
    """Decode one progressive scan into the per-component coefficient
    stores; returns the stream position of the next marker. DC scans may
    be MCU-interleaved (Ns>1) or single-component; AC scans are always
    single-component over that component's TRUE block grid."""
    if ss == 0 and se != 0:
        raise ValueError("progressive scan must be DC (Ss=Se=0) or an AC band (Ss>=1)")
    if ss == 0 and len(scan_list) > 1:  # interleaved DC over the MCU grid
        mcux, mcuy = mcu_dims
        tables = []
        for ci, dc_id, _ in scan_list:
            dct = htabs.get((0, dc_id))
            if ah == 0 and dct is None:
                raise ValueError("DC scan without its Huffman table")
            tables.append(dct)
        preds = [0] * len(scan_list)
        nmcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart and nmcu and nmcu % restart == 0:
                    r.sync_restart()
                    preds = [0] * len(scan_list)
                nmcu += 1
                for si, (ci, dc_id, _) in enumerate(scan_list):
                    pad_bw, _, _, hi, vi = geoms[ci]
                    store = stores[ci]
                    for byi in range(vi):
                        for bxi in range(hi):
                            flat = (my * vi + byi) * pad_bw + (mx * hi + bxi)
                            if ah == 0:
                                cat = _huff_read(r, tables[si])
                                diff = _extend(r.receive(cat), cat) if cat else 0
                                preds[si] += diff
                                store[flat, 0] = preds[si] << al
                            elif r.bit():
                                store[flat, 0] |= 1 << al
        r.n = 0
        return r.pos

    if len(scan_list) != 1:
        raise ValueError("AC progressive scans must be single-component")
    ci, dc_id, ac_id = scan_list[0]
    pad_bw, true_bw, true_bh, _, _ = geoms[ci]
    coefs = stores[ci]
    flats = [(i // true_bw) * pad_bw + (i % true_bw) for i in range(true_bh * true_bw)]
    nblocks = len(flats)
    dct = htabs.get((0, dc_id))
    act = htabs.get((1, ac_id))
    if ss == 0:  # single-component DC scan
        if ah == 0:
            if dct is None:
                raise ValueError("DC scan without its Huffman table")
            pred = 0
            for bi, flat in enumerate(flats):
                if restart and bi and bi % restart == 0:
                    r.sync_restart()
                    pred = 0
                cat = _huff_read(r, dct)
                diff = _extend(r.receive(cat), cat) if cat else 0
                pred += diff
                coefs[flat, 0] = pred << al
        else:  # DC refinement: one raw bit per block
            for bi, flat in enumerate(flats):
                if restart and bi and bi % restart == 0:
                    r.sync_restart()
                if r.bit():
                    coefs[flat, 0] |= 1 << al
    elif ah == 0:  # AC band, first pass at this Al
        if act is None:
            raise ValueError("AC scan without its Huffman table")
        eobrun = 0
        for bi, flat in enumerate(flats):
            if restart and bi and bi % restart == 0:
                r.sync_restart()
                eobrun = 0
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_read(r, act)
                rr, s = rs >> 4, rs & 0xF
                if s == 0:
                    if rr == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << rr) - 1
                    if rr:
                        eobrun += r.receive(rr)
                    break
                k += rr
                if k > se:
                    raise ValueError("AC coefficient run past band end")
                coefs[flat, k] = _extend(r.receive(s), s) << al
                k += 1
    else:  # AC successive-approximation refinement (T.81 G.1.2.3)
        if act is None:
            raise ValueError("AC scan without its Huffman table")
        p1, m1 = 1 << al, -1 << al
        eobrun = 0
        for bi, flat in enumerate(flats):
            if restart and bi and bi % restart == 0:
                r.sync_restart()
                eobrun = 0
            row = coefs[flat]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_read(r, act)
                    rr, s = rs >> 4, rs & 0xF
                    val = 0
                    if s == 0:
                        if rr != 15:
                            eobrun = 1 << rr
                            if rr:
                                eobrun += r.receive(rr)
                            break  # correction bits for the rest handled below
                        # rr == 15: ZRL — skip 16 zero-HISTORY positions
                    else:
                        if s != 1:
                            raise ValueError("refinement scan symbol must have s=1")
                        val = p1 if r.bit() else m1
                    # advance: correction bits on nonzero-history coefficients,
                    # count rr zero-history positions, then place val (if any)
                    while k <= se:
                        c = int(row[k])
                        if c != 0:
                            if r.bit() and (c & p1) == 0:
                                row[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if rr == 0:
                                if s:
                                    row[k] = val
                                k += 1
                                break
                            rr -= 1
                        k += 1
            if eobrun > 0:
                # inside an EOB run: correction bits still flow for every
                # nonzero-history coefficient left in this block's band
                while k <= se:
                    c = int(row[k])
                    if c != 0:
                        if r.bit() and (c & p1) == 0:
                            row[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1
    r.n = 0  # drop pad bits; r.pos now points at the next marker
    return r.pos


def jpeg_encode_progressive(
    gray: np.ndarray, quant: np.ndarray | None = None, refine_ac: bool = False
) -> bytes:
    """(h, w) uint8 grayscale → progressive JPEG (SOF2). Default scans:
    DC at Al=1 → DC refinement bit → full AC band 1..63 at Al=0 with
    EOB-run coding. With ``refine_ac`` the AC band is itself split into a
    successive-approximation pair (first pass at Al=1, then the T.81
    G.1.2.3 refinement scan with buffered correction bits). Coefficients
    are identical to the baseline encoder's, so the decoded image is
    bit-identical to the baseline roundtrip either way."""
    h, w = gray.shape
    q = np.ones(64, np.uint16) if quant is None else np.asarray(quant, np.uint16).reshape(64)
    qtab = np.empty(64, np.float64)
    qtab[_ZZ] = q
    qtab = qtab.reshape(8, 8)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(gray, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge").astype(np.float64) - 128.0
    blocks = [
        _quantize_block(padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qtab)
        for by in range(bh)
        for bx in range(bw)
    ]
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    # progressive AC needs EOBn symbols (rs = g<<4, s=0) that Annex K's
    # baseline table lacks — Huffman tables are stream-carried, so build a
    # flat 9-bit canonical table holding both (176 symbols < 511, the
    # all-ones code stays unused as T.81 requires)
    ac_bits_p = [0] * 16
    ac_vals_p = _AC_VALS + [g << 4 for g in range(1, 15)]
    ac_bits_p[8] = len(ac_vals_p)  # all codes 9 bits long
    ac_codes = _canonical_codes(ac_bits_p, ac_vals_p)

    # scan 1: DC, Al=1 (successive approximation first pass)
    b1 = _Bits()
    pred = 0
    for zq in blocks:
        v = int(zq[0]) >> 1  # arithmetic shift = DC point transform
        diff = v - pred
        pred = v
        cat = _category(diff)
        code, ln = dc_codes[cat]
        b1.put(code, ln)
        if cat:
            b1.put(diff if diff > 0 else diff + (1 << cat) - 1, cat)

    # scan 2: DC refinement, Ah=1 Al=0 — the low bit, raw
    b2 = _Bits()
    for zq in blocks:
        b2.put(int(zq[0]) & 1, 1)

    def ac_first_scan(al: int) -> bytes:
        """AC band 1..63, Ah=0 at point transform ``al`` — EOB-run coding
        over the truncated magnitudes sign·(|c| >> al)."""
        b3 = _Bits()
        eobrun = 0

        def flush_eob() -> None:
            nonlocal eobrun
            while eobrun:
                g = min(eobrun.bit_length() - 1, 14)
                take = min(eobrun, (1 << (g + 1)) - 1)
                code, ln = ac_codes[g << 4]
                b3.put(code, ln)
                if g:
                    b3.put(take - (1 << g), g)
                eobrun -= take

        for zq in blocks:
            vals = [
                (abs(int(zq[k])) >> al) * (1 if zq[k] >= 0 else -1) for k in range(64)
            ]
            last_nz = max((k for k in range(1, 64) if vals[k]), default=0)
            if last_nz == 0:
                eobrun += 1
                continue
            flush_eob()
            run = 0
            for k in range(1, last_nz + 1):
                v = vals[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = ac_codes[0xF0]
                    b3.put(zc, zl)
                    run -= 16
                cat = _category(v)
                code, ln = ac_codes[(run << 4) | cat]
                b3.put(code, ln)
                b3.put(v if v > 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last_nz < 63:
                eobrun += 1
        flush_eob()
        return b3.flush()

    def ac_refine_scan(al: int) -> bytes:
        """AC band refinement (Ah = al+1 → Al = al): newly-significant
        coefficients as s=1 symbols, history coefficients as buffered
        correction bits flushed after the next symbol (T.81 G.1.2.3 /
        the libjpeg encode_mcu_AC_refine discipline)."""
        b4 = _Bits()
        eobrun = 0
        pending: List[int] = []  # correction bits awaiting the next EOBn

        def flush_eob() -> None:
            nonlocal eobrun, pending
            while eobrun:
                g = min(eobrun.bit_length() - 1, 14)
                take = min(eobrun, (1 << (g + 1)) - 1)
                code, ln = ac_codes[g << 4]
                b4.put(code, ln)
                if g:
                    b4.put(take - (1 << g), g)
                eobrun -= take
            for bit in pending:
                b4.put(bit, 1)
            pending = []

        for zq in blocks:
            absv = [abs(int(zq[k])) >> al for k in range(64)]
            eobpos = max((k for k in range(1, 64) if absv[k] == 1), default=0)
            run = 0
            br: List[int] = []
            for k in range(1, 64):
                t = absv[k]
                if t == 0:
                    run += 1
                    continue
                if run > 15 and k <= eobpos:
                    flush_eob()
                    while run > 15:
                        zc, zl = ac_codes[0xF0]
                        b4.put(zc, zl)
                        run -= 16
                        for bit in br:
                            b4.put(bit, 1)
                        br = []
                if t > 1:
                    br.append(t & 1)  # history coefficient: correction bit
                    continue
                # newly significant (t == 1)
                flush_eob()
                code, ln = ac_codes[(run << 4) | 1]
                b4.put(code, ln)
                b4.put(1 if int(zq[k]) >= 0 else 0, 1)
                for bit in br:
                    b4.put(bit, 1)
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    flush_eob()
        flush_eob()
        return b4.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, b"\x00" + bytes(int(x) for x in q))
    sof = seg(0xFFC2, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)) + seg(
        0xFFC4, b"\x10" + bytes(ac_bits_p) + bytes(ac_vals_p)
    )
    sos1 = seg(0xFFDA, b"\x01\x01\x00" + bytes([0, 0, 0x01]))  # Ss=0 Se=0 Ah=0 Al=1
    sos2 = seg(0xFFDA, b"\x01\x01\x00" + bytes([0, 0, 0x10]))  # Ah=1 Al=0 refinement
    out = b"\xff\xd8" + dqt + sof + dht + sos1 + b1.flush() + sos2 + b2.flush()
    if refine_ac:
        out += seg(0xFFDA, b"\x01\x01\x00" + bytes([1, 63, 0x01])) + ac_first_scan(1)
        out += seg(0xFFDA, b"\x01\x01\x00" + bytes([1, 63, 0x10])) + ac_refine_scan(0)
    else:
        out += seg(0xFFDA, b"\x01\x01\x00" + bytes([1, 63, 0x00])) + ac_first_scan(0)
    return out + b"\xff\xd9"


def jpeg_encode_progressive_color(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, subsampling: str = "420"
) -> bytes:
    """Full-resolution YCbCr planes → PROGRESSIVE color JPEG (SOF2):
    one MCU-interleaved DC scan at Al=1, an interleaved DC refinement
    scan, then three per-component AC band scans — the multi-component
    progressive path. Coefficients match jpeg_encode_color's exactly, so
    decoded planes are bit-identical to the baseline color roundtrip."""
    h, w = y.shape
    if subsampling == "420":
        hs = vs = 2
    elif subsampling == "444":
        hs = vs = 1
    else:
        raise ValueError("subsampling must be 420 or 444")
    q = np.ones(64, np.uint16)
    qtab = np.empty(64, np.float64)
    qtab[_ZZ] = q
    qtab = qtab.reshape(8, 8)
    mcuw, mcuh = 8 * hs, 8 * vs
    mcux, mcuy = (w + mcuw - 1) // mcuw, (h + mcuh - 1) // mcuh
    ypad = np.pad(y, ((0, mcuy * mcuh - h), (0, mcux * mcuw - w)), mode="edge").astype(np.float64) - 128.0
    planes = [ypad]
    for p in (cb, cr):
        pp = np.pad(p, ((0, mcuy * mcuh - h), (0, mcux * mcuw - w)), mode="edge").astype(np.float64)
        if hs == 2:
            pp = (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
        planes.append(pp - 128.0)
    samp = [(hs, vs), (1, 1), (1, 1)]
    # per-comp zq grids over the PAD block grid
    grids = []
    for ci, plane in enumerate(planes):
        hi, vi = samp[ci]
        pad_bh, pad_bw = mcuy * vi, mcux * hi
        grid = [
            [_quantize_block(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qtab) for bx in range(pad_bw)]
            for by in range(pad_bh)
        ]
        grids.append(grid)

    dc_l = _canonical_codes(_DC_BITS, _DC_VALS)
    dc_c = _canonical_codes(_DC_BITS_C, _DC_VALS_C)
    ac_bits_p = [0] * 16
    ac_vals_p = _AC_VALS + [g << 4 for g in range(1, 15)]
    ac_bits_p[8] = len(ac_vals_p)
    ac_codes = _canonical_codes(ac_bits_p, ac_vals_p)
    dc_tabs = [dc_l, dc_c, dc_c]

    # scan 1: interleaved DC at Al=1
    b1 = _Bits()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                hi, vi = samp[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        v = int(grids[ci][my * vi + byi][mx * hi + bxi][0]) >> 1
                        diff = v - preds[ci]
                        preds[ci] = v
                        cat = _category(diff)
                        code, ln = dc_tabs[ci][cat]
                        b1.put(code, ln)
                        if cat:
                            b1.put(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    # scan 2: interleaved DC refinement bits
    b2 = _Bits()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(3):
                hi, vi = samp[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        b2.put(int(grids[ci][my * vi + byi][mx * hi + bxi][0]) & 1, 1)

    def ac_scan(ci: int) -> bytes:
        hi, vi = samp[ci]
        cw = (w * hi + hs - 1) // hs
        ch = (h * vi + vs - 1) // vs
        true_bw, true_bh = (cw + 7) // 8, (ch + 7) // 8
        b3 = _Bits()
        eobrun = 0

        def flush_eob() -> None:
            nonlocal eobrun
            while eobrun:
                g = min(eobrun.bit_length() - 1, 14)
                take = min(eobrun, (1 << (g + 1)) - 1)
                code, ln = ac_codes[g << 4]
                b3.put(code, ln)
                if g:
                    b3.put(take - (1 << g), g)
                eobrun -= take

        for i in range(true_bh * true_bw):
            zq = grids[ci][i // true_bw][i % true_bw]
            last_nz = max((k for k in range(1, 64) if zq[k]), default=0)
            if last_nz == 0:
                eobrun += 1
                continue
            flush_eob()
            run = 0
            for k in range(1, last_nz + 1):
                v = int(zq[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    zc, zl = ac_codes[0xF0]
                    b3.put(zc, zl)
                    run -= 16
                cat = _category(v)
                code, ln = ac_codes[(run << 4) | cat]
                b3.put(code, ln)
                b3.put(v if v > 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last_nz < 63:
                eobrun += 1
        flush_eob()
        return b3.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qbytes = bytes(int(x) for x in q)
    dqt = seg(0xFFDB, b"\x00" + qbytes) + seg(0xFFDB, b"\x01" + qbytes)
    sof = seg(
        0xFFC2,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    dht = (
        seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
        + seg(0xFFC4, b"\x01" + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
        + seg(0xFFC4, b"\x10" + bytes(ac_bits_p) + bytes(ac_vals_p))
        + seg(0xFFC4, b"\x11" + bytes(ac_bits_p) + bytes(ac_vals_p))
    )
    sos_dc1 = seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x10, 3, 0x10]) + bytes([0, 0, 0x01]))
    sos_dc2 = seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x10, 3, 0x10]) + bytes([0, 0, 0x10]))
    out = b"\xff\xd8" + dqt + sof + dht + sos_dc1 + b1.flush() + sos_dc2 + b2.flush()
    for ci, cid in enumerate((1, 2, 3)):
        tid = 0x00 if ci == 0 else 0x01
        out += seg(0xFFDA, b"\x01" + bytes([cid, tid]) + bytes([1, 63, 0x00])) + ac_scan(ci)
    return out + b"\xff\xd9"


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG → (h, w) uint8 grayscale: the single plane for grayscale
    streams (baseline SOF0 or progressive SOF2), the Y (BT.601 luma)
    plane for YCbCr color."""
    return jpeg_decode_planes(data)[0]


def jpeg_encode_color(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    subsampling: str = "420",
    quant: np.ndarray | None = None,
) -> bytes:
    """Full-resolution (h, w) uint8 YCbCr planes → baseline color JPEG.
    ``subsampling``: "420" (chroma box-averaged 2×2, Y sampling 2,2) or
    "444". Luminance tables id 0, Annex K chrominance tables id 1 — the
    decoder's per-component table dispatch is exercised for real."""
    h, w = y.shape
    if cb.shape != (h, w) or cr.shape != (h, w):
        raise ValueError("YCbCr planes must share one shape")
    if subsampling == "420":
        hs = vs = 2
    elif subsampling == "444":
        hs = vs = 1
    else:
        raise ValueError("subsampling must be 420 or 444")
    q = np.ones(64, np.uint16) if quant is None else np.asarray(quant, np.uint16).reshape(64)
    qtab = np.empty(64, np.float64)
    qtab[_ZZ] = q
    qtab = qtab.reshape(8, 8)

    mcuw, mcuh = 8 * hs, 8 * vs
    mcux, mcuy = (w + mcuw - 1) // mcuw, (h + mcuh - 1) // mcuh
    ypad = np.pad(y, ((0, mcuy * mcuh - h), (0, mcux * mcuw - w)), mode="edge").astype(np.float64) - 128.0
    chroma = []
    for p in (cb, cr):
        pp = np.pad(p, ((0, mcuy * mcuh - h), (0, mcux * mcuw - w)), mode="edge").astype(np.float64)
        if hs == 2:
            pp = (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
        chroma.append(pp - 128.0)

    dc_l = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_l = _canonical_codes(_AC_BITS, _AC_VALS)
    dc_c = _canonical_codes(_DC_BITS_C, _DC_VALS_C)
    ac_c = _canonical_codes(_AC_BITS_C, _AC_VALS_C)

    bits = _Bits()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for byi in range(vs):
                for bxi in range(hs):
                    y0, x0 = (my * vs + byi) * 8, (mx * hs + bxi) * 8
                    blk = ypad[y0 : y0 + 8, x0 : x0 + 8]
                    preds[0] = _encode_block(bits, _quantize_block(blk, qtab), dc_l, ac_l, preds[0])
            for ci, plane in enumerate(chroma):
                blk = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                preds[1 + ci] = _encode_block(bits, _quantize_block(blk, qtab), dc_c, ac_c, preds[1 + ci])

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qbytes = bytes(int(x) for x in q)
    dqt = seg(0xFFDB, b"\x00" + qbytes) + seg(0xFFDB, b"\x01" + qbytes)
    samp_y = (hs << 4) | vs
    sof = seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_y, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    dht = (
        seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
        + seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
        + seg(0xFFC4, b"\x01" + bytes(_DC_BITS_C) + bytes(_DC_VALS_C))
        + seg(0xFFC4, b"\x11" + bytes(_AC_BITS_C) + bytes(_AC_VALS_C))
    )
    sos = seg(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dht + sos + bits.flush() + b"\xff\xd9"


def jpeg_payload(doc_id: int) -> bytes:
    """Constant-gray JPEG: w = 12 + (id%6)·4, h = 10 + (id%4)·6, every pixel
    ``doc_id % 256`` — constant blocks decode bit-exactly with the flat
    quant table, so width/height/n_pixels/mean_pixel are SQL-replayable."""
    w, h = 12 + (doc_id % 6) * 4, 10 + (doc_id % 4) * 6
    return jpeg_encode(np.full((h, w), doc_id % 256, np.uint8))


def jpeg_payload_progressive(doc_id: int) -> bytes:
    """Constant-gray PROGRESSIVE JPEG (SOF2, three scans), same dims and
    pixel field as jpeg_payload — the baseline SQL oracle applies since
    the coefficient store reconstructs identically."""
    w, h = 12 + (doc_id % 6) * 4, 10 + (doc_id % 4) * 6
    return jpeg_encode_progressive(np.full((h, w), doc_id % 256, np.uint8))


def jpeg_payload_progressive_color(doc_id: int) -> bytes:
    """Constant-plane 4:2:0 PROGRESSIVE color JPEG (interleaved DC scans +
    per-component AC bands), same dims/luma field as jpeg_payload."""
    w, h = 12 + (doc_id % 6) * 4, 10 + (doc_id % 4) * 6
    return jpeg_encode_progressive_color(
        np.full((h, w), doc_id % 256, np.uint8),
        np.full((h, w), (doc_id * 3) % 256, np.uint8),
        np.full((h, w), (doc_id * 7) % 256, np.uint8),
    )


def jpeg_payload_color(doc_id: int) -> bytes:
    """Constant-plane 4:2:0 YCbCr JPEG, same dims as jpeg_payload; the
    feature kernel reads the luma plane, so the same SQL oracle applies
    (constant planes survive subsampling + the flat-quant roundtrip)."""
    w, h = 12 + (doc_id % 6) * 4, 10 + (doc_id % 4) * 6
    return jpeg_encode_color(
        np.full((h, w), doc_id % 256, np.uint8),
        np.full((h, w), (doc_id * 3) % 256, np.uint8),
        np.full((h, w), (doc_id * 7) % 256, np.uint8),
        subsampling="420",
    )
