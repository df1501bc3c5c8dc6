"""FLAC (Free Lossless Audio Codec) — real decode/encode, stdlib + numpy.

The format is publicly specified (xiph.org FLAC format spec); everything a
mono 16-bit stream needs is implementable directly:

- stream layout: ``fLaC`` magic, metadata blocks (STREAMINFO parsed for
  rate/bps/channels), then frames until EOF;
- frame headers: 14-bit sync, blocking strategy, block-size / sample-rate
  codes (incl. the 8/16-bit end-of-header forms and the fixed tables),
  UTF-8-style coded frame number, CRC-8 (poly 0x07) verified;
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4 and LPC (quantized
  warmup + precision/shift/coefficients), wasted-bits unary prefix;
- residuals: both Rice methods (4- and 5-bit parameters), partition
  orders, and the escape-to-raw form; zigzag folding;
- frame CRC-16 (poly 0x8005) verified over header + subframes + padding.

Losslessness IS the test: decode(encode(x)) must equal x bit-for-bit for
arbitrary int16 signals — pinned in pytest across constant / random /
smooth signals, every fixed order, LPC, multi-frame streams and escape
partitions. Stereo and non-16-bit depths raise ValueError (honest scope).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.buf.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8

    def put_signed(self, value: int, bits: int) -> None:
        self.put(value & ((1 << bits) - 1), bits)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def get(self, bits: int) -> int:
        while self.n < bits:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= bits
        v = (self.acc >> self.n) & ((1 << bits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def get_signed(self, bits: int) -> int:
        v = self.get(bits)
        return v - (1 << bits) if v >= (1 << (bits - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.get(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _utf8_number(w: _BitWriter, n: int) -> None:
    if n < 0x80:
        w.put(n, 8)
        return
    # multi-byte UTF-8-style; an nbytes form holds (7-nbytes) lead bits +
    # 6*(nbytes-1) continuation bits = 5*nbytes+1 bits of payload
    nbytes = 2
    while nbytes < 7 and n >= (1 << (5 * nbytes + 1)):
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF if nbytes < 7 else 0xFE
    w.put(lead | ((n >> (6 * (nbytes - 1))) & ((1 << (7 - nbytes)) - 1)), 8)
    for i in range(nbytes - 2, -1, -1):
        w.put(0x80 | ((n >> (6 * i)) & 0x3F), 8)


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.get(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad coded number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.get(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad coded-number continuation")
        n = (n << 6) | (c & 0x3F)
    return n


# --------------------------------------------------------------- encoding


def _rice_encode(w: _BitWriter, res: np.ndarray) -> None:
    """Residuals → method 0, partition order 0, one Rice parameter (escape
    to raw when residuals are wild)."""
    u = np.where(res >= 0, res.astype(np.int64) * 2, -2 * res.astype(np.int64) - 1)
    w.put(0, 2)  # method: 4-bit Rice
    w.put(0, 4)  # partition order 0
    mean = int(u.mean()) if len(u) else 0
    param = max(0, min(14, mean.bit_length() - 1))
    # escape if unary parts would blow up (raw is bounded)
    if len(u) and int((u >> param).max()) > 48:
        w.put(0xF, 4)  # escape
        raw_bits = max(2, int(np.abs(res).max()).bit_length() + 1) if len(res) else 2
        w.put(raw_bits, 5)
        for v in res:
            w.put_signed(int(v), raw_bits)
        return
    w.put(param, 4)
    for v in u:
        w.unary(int(v) >> param)
        if param:
            w.put(int(v) & ((1 << param) - 1), param)


def _best_fixed_order(x: np.ndarray) -> int:
    best, best_cost = 0, None
    sig = x.astype(np.int64)
    for order in range(min(4, len(x) - 1) + 1):
        d = sig.copy()
        for _ in range(order):
            d = np.diff(d)
        cost = int(np.abs(d[order:] if False else d).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def flac_encode(
    samples: np.ndarray,
    rate: int = 8000,
    block_size: int = 4096,
    subframe: str = "auto",
) -> bytes:
    """int16 mono → FLAC. ``subframe``: "auto" (constant / best fixed
    order), "verbatim", "lpc" (order-2 quantized LPC — exercises the LPC
    path losslessly), or "fixedN"."""
    s = np.asarray(samples, np.int16).astype(np.int64)
    n = len(s)
    streaminfo = _BitWriter()
    streaminfo.put(block_size, 16)
    streaminfo.put(block_size, 16)
    streaminfo.put(0, 24)
    streaminfo.put(0, 24)
    streaminfo.put(rate, 20)
    streaminfo.put(0, 3)  # channels - 1
    streaminfo.put(15, 5)  # bps - 1
    streaminfo.put(n, 36)
    for _ in range(16):
        streaminfo.put(0, 8)  # md5 unknown
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34]) + streaminfo.bytes()  # last metadata block

    frame_idx = 0
    for start in range(0, max(n, 1), block_size):
        blk = s[start : start + block_size]
        if len(blk) == 0:
            break
        bs = len(blk)
        w = _BitWriter()
        w.put(0b11111111111110, 14)
        w.put(0, 1)  # reserved
        w.put(0, 1)  # fixed blocking strategy
        w.put(0b0111, 4)  # block size: 16 bits at end of header
        w.put(0, 4)  # sample rate: from STREAMINFO
        w.put(0, 4)  # channel assignment: mono
        w.put(0b100, 3)  # sample size: 16 bits
        w.put(0, 1)
        _utf8_number(w, frame_idx)
        w.put(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w = _BitWriter()
        for b in hdr:
            w.put(b, 8)
        w.put(_crc8(hdr), 8)

        if subframe == "verbatim":
            w.put(1 << 1, 8)  # subframe header: type VERBATIM
            for v in blk:
                w.put_signed(int(v), 16)
        elif subframe == "lpc":
            order = min(2, bs - 1)
            if order < 1:
                w.put(0, 8)
                w.put_signed(int(blk[0]), 16)
            else:
                w.put((32 + order - 1) << 1, 8)
                for v in blk[:order]:
                    w.put_signed(int(v), 16)
                # qlp: precision 5 bits (write precision-1 = 4), shift 1,
                # coefs [3, -1] (order 2) → pred = (3*x1 - x2) >> 1
                coefs = [3, -1][:order] if order == 2 else [2][:order]
                w.put(4, 4)  # precision - 1
                w.put_signed(1, 5)  # shift
                for c in coefs:
                    w.put_signed(c, 5)
                hist = blk.astype(np.int64)
                res = []
                for i in range(order, bs):
                    pred = sum(coefs[j] * int(hist[i - 1 - j]) for j in range(order)) >> 1
                    res.append(int(hist[i]) - pred)
                _rice_encode(w, np.array(res, np.int64))
        elif blk.min() == blk.max() and subframe == "auto":
            w.put(0, 8)  # CONSTANT
            w.put_signed(int(blk[0]), 16)
        else:
            if subframe.startswith("fixed"):
                order = int(subframe[5:])
            else:
                order = _best_fixed_order(blk)
            order = min(order, bs - 1) if bs > 1 else 0
            w.put((8 + order) << 1, 8)
            for v in blk[:order]:
                w.put_signed(int(v), 16)
            d = blk.copy()
            for _ in range(order):
                d = np.diff(d)
            _rice_encode(w, d)
        w.align()
        body = w.bytes()
        out += body + struct.pack(">H", _crc16(body))
        frame_idx += 1
    return bytes(out)


# --------------------------------------------------------------- decoding

_BS_TABLE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
             8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
             13: 8192, 14: 16384, 15: 32768}


def _rice_decode(r: _BitReader, n: int, order: int) -> np.ndarray:
    method = r.get(2)
    if method not in (0, 1):
        raise ValueError("unknown residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.get(4)
    nparts = 1 << porder
    out = np.empty(n, np.int64)
    idx = 0
    total = n + order  # samples per frame incl. warmup
    for p in range(nparts):
        cnt = total >> porder
        if p == 0:
            cnt -= order
        if cnt < 0:
            raise ValueError("bad partition geometry")
        param = r.get(pbits)
        if param == escape:
            raw = r.get(5)
            for _ in range(cnt):
                out[idx] = r.get_signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                q = r.unary()
                u = (q << param) | (r.get(param) if param else 0)
                out[idx] = (u >> 1) ^ -(u & 1)  # unfold zigzag
                idx += 1
    if idx != n:
        raise ValueError("residual count mismatch")
    return out


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.get(1):
        raise ValueError("invalid subframe padding bit")
    stype = r.get(6)
    wasted = 0
    if r.get(1):  # wasted-bits flag
        wasted = 1 + r.unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        out = np.full(bs, r.get_signed(eff), np.int64)
    elif stype == 1:  # VERBATIM
        out = np.fromiter((r.get_signed(eff) for _ in range(bs)), np.int64, bs)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = [r.get_signed(eff) for _ in range(order)]
        res = _rice_decode(r, bs - order, order)
        out = np.empty(bs, np.int64)
        out[:order] = warm
        coefs = _FIXED_COEFS[order]
        for i in range(order, bs):
            out[i] = res[i - order] + sum(coefs[j] * out[i - 1 - j] for j in range(order))
    elif stype >= 32:  # LPC
        order = stype - 31
        warm = [r.get_signed(eff) for _ in range(order)]
        precision = r.get(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = r.get_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.get_signed(precision) for _ in range(order)]
        res = _rice_decode(r, bs - order, order)
        out = np.empty(bs, np.int64)
        out[:order] = warm
        for i in range(order, bs):
            pred = sum(coefs[j] * int(out[i - 1 - j]) for j in range(order)) >> shift
            out[i] = res[i - order] + pred
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted


def flac_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """FLAC → (int16 samples, rate). Mono 16-bit; frame CRC-8/CRC-16
    verified; CONSTANT/VERBATIM/FIXED/LPC subframes, both Rice methods,
    partitioned residuals and escapes."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = bps = channels = None
    total = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos : pos + 4]
        last, btype = bool(hdr[0] & 0x80), hdr[0] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:  # STREAMINFO
            r = _BitReader(body)
            r.get(16), r.get(16), r.get(24), r.get(24)
            rate = r.get(20)
            channels = r.get(3) + 1
            bps = r.get(5) + 1
            total = r.get(36)
        pos += 4 + blen
        if last:
            break
    if rate is None:
        raise ValueError("FLAC missing STREAMINFO")
    if channels != 1 or bps != 16:
        raise ValueError("unsupported FLAC layout (mono 16-bit only)")

    chunks: List[np.ndarray] = []
    while pos < len(data):
        frame_start = pos
        r = _BitReader(data, pos)
        sync = r.get(14)
        if sync != 0b11111111111110:
            raise ValueError("lost FLAC frame sync")
        r.get(1)
        r.get(1)  # blocking strategy
        bs_code = r.get(4)
        sr_code = r.get(4)
        chan = r.get(4)
        size_code = r.get(3)
        r.get(1)
        if chan != 0:
            raise ValueError("unsupported FLAC layout (mono 16-bit only)")
        _read_utf8_number(r)
        if bs_code == 0:
            raise ValueError("reserved block-size code")
        elif bs_code == 6:
            bs = r.get(8) + 1
        elif bs_code == 7:
            bs = r.get(16) + 1
        else:
            bs = _BS_TABLE[bs_code]
        if sr_code == 12:
            r.get(8)
        elif sr_code in (13, 14):
            r.get(16)
        elif sr_code == 15:
            raise ValueError("invalid sample-rate code")
        r.align()
        hdr_bytes = data[frame_start : r.pos]
        if _crc8(hdr_bytes) != data[r.pos]:
            raise ValueError("FLAC frame header CRC mismatch")
        r.pos += 1
        out = _decode_subframe(r, bs, 16)
        r.align()
        (crc,) = struct.unpack(">H", data[r.pos : r.pos + 2])
        if _crc16(data[frame_start : r.pos]) != crc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = r.pos + 2
        chunks.append(out)
    samples = np.concatenate(chunks) if chunks else np.zeros(0, np.int64)
    if total:
        samples = samples[:total]
    return samples.astype(np.int16), rate


def flac_payload(doc_id: int) -> bytes:
    """Same (n, rate, sample field) as wav_payload — FLAC is LOSSLESS, so
    the decoded samples equal the PCM field exactly and the WAV frame-stat
    oracle applies unchanged."""
    rate = 8000 + (doc_id % 8) * 1000
    n = 500 + (doc_id % 50) * 20
    i = np.arange(n)
    return flac_encode(((doc_id * 7 + i) % 200 - 100).astype(np.int16), rate)
