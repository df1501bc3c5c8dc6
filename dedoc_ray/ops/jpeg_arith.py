"""Arithmetic-coded JPEG (ITU-T T.81 Annexes D/F/G) — QM coder, SOF9.

The last JPEG entropy-coding gate from round 2: sequential DCT with
arithmetic entropy coding instead of Huffman. Everything here is from the
public spec:

- the probability-estimation state machine is T.81 Table D.3 (113 states +
  the self-looping fixed ~0.5 state used for AC signs);
- encoder follows Annex F flow charts (CODELPS/CODEMPS with conditional
  MPS/LPS exchange, byte-stuffing via carry walk-back over emitted bytes);
- decoder follows Annex G / F.2 (DECODE with LPS at the interval bottom,
  BYTEIN with 0xFF00 unstuffing, zero-feed after a trailing marker);
- DC/AC statistical models per F.1.4.4.1/F.1.4.4.2: 49-bin DC areas with
  the L/U diff-conditioning contexts, 245-bin AC areas with the Kx split,
  magnitude categories as Sz = |v|-1 decision trees.

Validated three ways (tests/test_jpeg_arith.py): self roundtrip,
pixel-identity with the Huffman baseline on identical quantized
coefficients, and — when a C toolchain + libjpeg headers are present —
byte-level interop in BOTH directions against libjpeg itself.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from dedoc_ray.ops.jpeg_codec import _C, _ZZ, _quantize_block

# T.81 Table D.3: (Qe, Next_Index_LPS, Next_Index_MPS, Switch_MPS).
# Entry 113 is the non-adaptive ~0.5 state (self-looping) for AC signs.
_ARITAB: List[Tuple[int, int, int, int]] = [
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0), (0x080B, 18, 4, 0),
    (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0), (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0),
    (0x0036, 30, 9, 0), (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1), (0x3F25, 36, 16, 0),
    (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0), (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0),
    (0x0CEF, 43, 21, 0), (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0), (0x01B1, 54, 28, 0),
    (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0), (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0),
    (0x0068, 62, 33, 0), (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0), (0x2EF1, 67, 40, 0),
    (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0), (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0),
    (0x1177, 73, 45, 0), (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0), (0x04DE, 50, 52, 0),
    (0x040F, 50, 53, 0), (0x0363, 51, 54, 0), (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0),
    (0x01F8, 54, 57, 0), (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0), (0x008F, 61, 32, 0),
    (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0), (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0),
    (0x2FE8, 83, 69, 0), (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0), (0x119C, 74, 76, 0),
    (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0), (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0),
    (0x5832, 80, 81, 1), (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0), (0x2516, 86, 71, 0),
    (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0), (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0),
    (0x3824, 99, 93, 0), (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0), (0x3C3D, 104, 100, 0),
    (0x375E, 99, 93, 0), (0x5231, 105, 102, 0), (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0),
    (0x415E, 103, 99, 0), (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1), (0x5522, 112, 109, 0),
    (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
]

_FIXED = 113  # non-adaptive ~0.5 state (AC sign coding)


# ------------------------------------------------------------- QM decoder


class ArithDecoder:
    """T.81 F.2.4.2 QM decoder over JPEG entropy-coded data."""

    __slots__ = ("data", "pos", "end", "c", "a", "ct", "_marker")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.end = len(data)
        self._marker = False
        self._init_registers()

    def _init_registers(self) -> None:
        # code value aligned so Chigh = first two entropy bytes — the
        # mirror of INITENC's A=0x10000 / CT=11 output alignment
        self.c = self._byte() << 16
        self._bytein()
        self.c = (self.c << 8) & 0xFFFFFFFF
        self.ct = 0
        self.a = 0x10000

    def _byte(self) -> int:
        """Next entropy byte with 0xFF00 unstuffing; a marker (0xFF xx,
        xx != 0) ends the stream — zero bytes are fed thereafter (F.2.2.5)."""
        if self._marker or self.pos >= self.end:
            return 0
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < self.end else 0xD9
            if nxt == 0x00:
                self.pos += 1
                return 0xFF
            self.pos -= 1  # leave the marker for the caller
            self._marker = True
            return 0
        return b

    def _bytein(self) -> None:
        self.c = (self.c + (self._byte() << 8)) & 0xFFFFFFFF
        self.ct = 8

    def decode(self, st: List[int]) -> int:
        # T.81 convention (as in every interoperable implementation): the
        # MPS subinterval sits at the BOTTOM [0, A-Qe), LPS at the top.
        idx = st[0]
        mps = st[1]
        qe, nlps, nmps, switch = _ARITAB[idx]
        self.a -= qe
        if (self.c >> 16) < self.a:
            if self.a & 0x8000:
                return mps
            if self.a < qe:  # conditional exchange: bottom belongs to LPS
                d = mps ^ 1
                if switch:
                    st[1] = mps ^ 1
                st[0] = nlps
            else:
                d = mps
                st[0] = nmps
        else:
            self.c = (self.c - (self.a << 16)) & 0xFFFFFFFF
            if self.a < qe:  # conditional exchange: top belongs to MPS
                d = mps
                st[0] = nmps
            else:
                d = mps ^ 1
                if switch:
                    st[1] = mps ^ 1
                st[0] = nlps
            self.a = qe
        while self.a < 0x8000:
            if self.ct == 0:
                self._bytein()
            self.a <<= 1
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
        return d

    def restart(self, pos: int) -> None:
        self.pos = pos
        self._marker = False
        self._init_registers()


# ------------------------------------------------------------- QM encoder


class ArithEncoder:
    """T.81 F.1.4 QM encoder; carry resolved by walking back over the raw
    byte list (equivalent to the spec's 0xFF stack), 0x00-stuffing applied
    at serialization time."""

    __slots__ = ("out", "c", "a", "ct")

    def __init__(self) -> None:
        self.out: List[int] = []
        self.c = 0
        self.a = 0x10000
        self.ct = 11

    def encode(self, d: int, st: List[int]) -> None:
        idx = st[0]
        mps = st[1]
        qe, nlps, nmps, switch = _ARITAB[idx]
        self.a -= qe
        if d == mps:
            if self.a & 0x8000:
                return  # MPS in the bottom subinterval: C unchanged
            if self.a < qe:  # conditional exchange: MPS coded as the top (size Qe)
                self.c += self.a
                self.a = qe
            st[0] = nmps
        else:
            if self.a < qe:  # conditional exchange: LPS coded as the bottom
                pass  # C unchanged, interval = A-Qe
            else:
                self.c += self.a
                self.a = qe
            if switch:
                st[1] = mps ^ 1
            st[0] = nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def encode_fixed(self, d: int) -> None:
        st = [_FIXED, 0]
        self.encode(d, st)

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry: +1 into the last raw byte, rippling through 0xFFs
            i = len(self.out) - 1
            while i >= 0:
                self.out[i] = (self.out[i] + 1) & 0xFF
                if self.out[i] != 0:
                    break
                i -= 1
            t &= 0xFF
        self.out.append(t)
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        # Annex F "FLUSH": clear as many low-order C bits as possible
        t = (self.c + self.a - 1) & 0xFFFF0000
        if t < self.c:
            t += 0x8000
        self.c = t
        self.c <<= self.ct
        self._byteout()
        self.c <<= 8
        self._byteout()
        # drop trailing zero bytes (decoder feeds zeros past the marker)
        raw = self.out
        while raw and raw[-1] == 0:
            raw.pop()
        stuffed = bytearray()
        for b in raw:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


# ------------------------------------------- DC / AC statistical models


def _new_stats(n: int) -> List[List[int]]:
    return [[0, 0] for _ in range(n)]


class _DcModel:
    """49-bin DC statistics area + diff-conditioning context (F.1.4.4.1)."""

    __slots__ = ("stats", "L", "U")

    def __init__(self, L: int = 0, U: int = 1) -> None:
        self.stats = _new_stats(64)
        self.L = L
        self.U = U

    def reset(self) -> None:
        self.stats = _new_stats(64)

    def _new_ctx(self, m: int, sign: int) -> int:
        if m < (1 << self.L) >> 1:
            return 0
        if m > (1 << self.U) >> 1:
            return 12 + sign * 4
        return 4 + sign * 4

    def decode(self, dec: ArithDecoder, ctx: int) -> Tuple[int, int]:
        """→ (diff, new_ctx)."""
        s = self.stats
        base = ctx
        if dec.decode(s[base]) == 0:
            return 0, 0
        sign = dec.decode(s[base + 1])
        st = base + 2 + sign
        m = dec.decode(s[st])
        if m:
            st = 20  # X1
            while dec.decode(s[st]):
                m <<= 1
                if m == 0x8000:
                    raise ValueError("arith DC magnitude overflow")
                st += 1
        new_ctx = self._new_ctx(m, sign)
        v = m
        st += 14
        while m > 1:
            m >>= 1
            if dec.decode(s[st]):
                v |= m
        v += 1
        return (-v if sign else v), new_ctx

    def encode(self, enc: ArithEncoder, diff: int, ctx: int) -> int:
        """→ new_ctx."""
        s = self.stats
        base = ctx
        if diff == 0:
            enc.encode(0, s[base])
            return 0
        enc.encode(1, s[base])
        sign = 1 if diff < 0 else 0
        enc.encode(sign, s[base + 1])
        st = base + 2 + sign
        sz = (-diff if sign else diff) - 1
        if sz == 0:
            enc.encode(0, s[st])
            m = 0
        else:
            enc.encode(1, s[st])
            m = 1
            st = 20
            while (m << 1) <= sz:
                enc.encode(1, s[st])
                m <<= 1
                st += 1
            enc.encode(0, s[st])
        new_ctx = self._new_ctx(m, sign)
        st += 14
        bit = m >> 1
        while bit:
            enc.encode(1 if sz & bit else 0, s[st])
            bit >>= 1
        return new_ctx


class _AcModel:
    """245-bin AC statistics area with the Kx low/high split (F.1.4.4.2)."""

    __slots__ = ("stats", "kx")

    def __init__(self, kx: int = 5) -> None:
        self.stats = _new_stats(256)
        self.kx = kx

    def reset(self) -> None:
        self.stats = _new_stats(256)

    def decode_block(self, dec: ArithDecoder, zq: np.ndarray) -> None:
        self.decode_band(dec, zq, 1, 63, 0)

    def decode_band(self, dec: ArithDecoder, zq: np.ndarray, ss: int, se: int, al: int) -> None:
        """Spectral band Ss..Se at point transform Al (sequential = 1..63
        at 0; progressive AC-first scans per T.81 G.2.2)."""
        s = self.stats
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if dec.decode(s[st]):
                return  # EOB
            while dec.decode(s[st + 1]) == 0:
                st += 3
                k += 1
                if k > se:
                    raise ValueError("arith AC run past band end")
            sign = dec.decode([_FIXED, 0])
            st += 2
            m = dec.decode(s[st])
            if m:
                if dec.decode(s[st]):
                    m = 2
                    st = 189 if k <= self.kx else 217
                    while dec.decode(s[st]):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError("arith AC magnitude overflow")
                        st += 1
            v = m
            st += 14
            while m > 1:
                m >>= 1
                if dec.decode(s[st]):
                    v |= m
            v += 1
            zq[k] = (-v if sign else v) << al
            k += 1

    def refine_band(self, dec: ArithDecoder, zq: np.ndarray, ss: int, se: int, al: int) -> None:
        """AC successive-approximation refinement (T.81 G.2.3 / the
        decode_mcu_AC_refine flow): correction bits for known-nonzero
        coefficients, newly-significant flags for the rest, EOB decision
        only above the block's current last nonzero index."""
        s = self.stats
        p1 = 1 << al
        m1 = -p1
        kex = se
        while kex > 0 and zq[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            st = 3 * (k - 1)
            if k > kex and dec.decode(s[st]):
                return  # EOB
            while True:
                if zq[k]:  # previously nonzero: one correction bit
                    if dec.decode(s[st + 2]):
                        zq[k] += m1 if zq[k] < 0 else p1
                    break
                if dec.decode(s[st + 1]):  # newly nonzero
                    zq[k] = m1 if dec.decode([_FIXED, 0]) else p1
                    break
                st += 3
                k += 1
                if k > se:
                    raise ValueError("arith AC refinement past band end")
            k += 1

    def encode_block(self, enc: ArithEncoder, zq: np.ndarray) -> None:
        self.encode_band(enc, zq, 1, 63)

    def encode_band(self, enc: ArithEncoder, zq: np.ndarray, ss: int, se: int) -> None:
        """Encode spectral band Ss..Se (Al=0) — the inverse of decode_band;
        sequential encoding is the full 1..63 band."""
        s = self.stats
        ke = ss - 1
        for i in range(se, ss - 1, -1):
            if zq[i]:
                ke = i
                break
        k = ss
        while k <= ke:
            st = 3 * (k - 1)
            enc.encode(0, s[st])  # not EOB
            while zq[k] == 0:
                enc.encode(0, s[st + 1])
                st += 3
                k += 1
            enc.encode(1, s[st + 1])
            v = int(zq[k])
            sign = 1 if v < 0 else 0
            enc.encode_fixed(sign)
            st += 2
            sz = (-v if sign else v) - 1
            if sz == 0:
                enc.encode(0, s[st])
                m = 0
            else:
                enc.encode(1, s[st])
                if sz == 1:
                    enc.encode(0, s[st])
                    m = 1
                else:
                    enc.encode(1, s[st])
                    m = 2
                    st = 189 if k <= self.kx else 217
                    while (m << 1) <= sz:
                        enc.encode(1, s[st])
                        m <<= 1
                        st += 1
                    enc.encode(0, s[st])
            st += 14
            bit = m >> 1
            while bit:
                enc.encode(1 if sz & bit else 0, s[st])
                bit >>= 1
            k += 1
        if ke < se:
            enc.encode(1, s[3 * ke])  # EOB at position ke+1 (ke=ss-1 if band empty)


# ----------------------------------------------------------------- codec


def arith_decode_planes(data: bytes) -> List[np.ndarray]:
    """SOF9 arithmetic sequential JPEG → per-component full-resolution
    uint8 planes (grayscale: 1, YCbCr: 3 — chroma replicated up)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    dc_cond: Dict[int, Tuple[int, int]] = {}
    ac_cond: Dict[int, int] = {}
    w = h = None
    comps: List[Tuple[int, int, int, int]] = []
    scan: List[Tuple[int, int]] = []
    restart = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq:
                    raise ValueError("16-bit quant tables unsupported")
                qtabs[tq] = np.frombuffer(body[b + 1 : b + 65], np.uint8).astype(np.float64)
                b += 65
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            b = 0
            while b + 2 <= len(body):
                tc, tb = body[b] >> 4, body[b] & 0xF
                cs = body[b + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0xF, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
                b += 2
        elif marker == 0xC9:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit arithmetic JPEG supported")
            comps = []
            for ci in range(ncomp):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not an arithmetic sequential JPEG")
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            by_id = {c[0]: i for i, c in enumerate(comps)}
            scan = [(0, 0)] * ns
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                scan[by_id[cid]] = (tids >> 4, tids & 0xF)
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if w is None or not comps or not scan:
        raise ValueError("arithmetic JPEG missing SOF9/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), np.float64) for c in comps]

    dc_models: Dict[int, _DcModel] = {}
    ac_models: Dict[int, _AcModel] = {}
    for ci in range(len(comps)):
        dt, at = scan[ci]
        if dt not in dc_models:
            L, U = dc_cond.get(dt, (0, 1))
            dc_models[dt] = _DcModel(L, U)
        if at not in ac_models:
            ac_models[at] = _AcModel(ac_cond.get(at, 5))

    dec = ArithDecoder(data, pos)
    preds = [0] * len(comps)
    dc_ctx = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and nmcu and nmcu % restart == 0:
                # skip to the RSTn marker and reinitialize everything
                p = dec.pos
                while p + 1 < len(data) and not (data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7):
                    p += 1
                dec.restart(p + 2)
                for m in dc_models.values():
                    m.reset()
                for m in ac_models.values():
                    m.reset()
                preds = [0] * len(comps)
                dc_ctx = [0] * len(comps)
            nmcu += 1
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dt, at = scan[ci]
                q = qtabs[tq]
                for byi in range(vi):
                    for bxi in range(hi):
                        zq = np.zeros(64, np.int64)
                        diff, dc_ctx[ci] = dc_models[dt].decode(dec, dc_ctx[ci])
                        preds[ci] += diff
                        zq[0] = preds[ci]
                        ac_models[at].decode_block(dec, zq)
                        coef = np.zeros(64, np.float64)
                        coef[_ZZ] = zq * q
                        block = _C.T @ coef.reshape(8, 8) @ _C
                        y0 = (my * vi + byi) * 8
                        x0 = (mx * hi + bxi) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    out = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        p = np.clip(np.round(planes[ci] + 128.0), 0, 255).astype(np.uint8)
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        out.append(p[:h, :w])
    return out


def _next_marker(data: bytes, pos: int) -> int:
    """First real marker at/after pos (skips stuffed FF00 and fill FFs
    inside entropy data; RSTn are real markers here — callers that expect
    them consume them)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return n


def arith_decode_progressive(data: bytes) -> List[np.ndarray]:
    """SOF10 (progressive DCT, arithmetic coding) → per-component planes,
    mirroring jpeg_codec._decode_progressive's scan walk: coefficients
    accumulate per block across scans (DC first/refine per G.2.1, AC
    first bands per G.2.2, AC refinement per G.2.3 — statistics areas
    reset at every scan start and restart), dequantize + IDCT once at
    EOI. libjpeg's jpeg_simple_progression + arith_code streams decode
    pixel-identically to libjpeg itself (tests/test_jpeg_arith.py)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    dc_cond: Dict[int, Tuple[int, int]] = {}
    ac_cond: Dict[int, int] = {}
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
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            b = 0
            while b + 2 <= len(body):
                tc, tb = body[b] >> 4, body[b] & 0xF
                cs = body[b + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0xF, cs >> 4)
                else:
                    ac_cond[tb] = cs
                b += 2
        elif marker == 0xCA:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit progressive arithmetic JPEG supported")
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component progressive arithmetic JPEG supported")
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not a progressive arithmetic JPEG")
        elif marker == 0xDD:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if not comps:
                raise ValueError("SOS before SOF10")
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
            pos = _arith_prog_scan(
                data, pos + 2 + ln, stores, geoms, scan_list, dc_cond, ac_cond,
                (mcux, mcuy), ss, se, ahal >> 4, ahal & 0xF, restart,
            )
            continue
        pos += 2 + ln
    if not comps or w is None:
        raise ValueError("progressive arithmetic JPEG missing SOF10 or scans")
    planes: List[np.ndarray] = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        q = qtabs.get(tq)
        if q is None:
            raise ValueError("JPEG missing quant table")
        pad_bw = geoms[ci][0]
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


def _arith_prog_scan(
    data: bytes, start: int, stores, geoms, scan_list, dc_cond, ac_cond,
    mcu_dims, ss, se, ah, al, restart,
) -> int:
    """Decode one progressive arithmetic scan; returns the position of
    the next non-RST marker. Statistics areas are fresh per scan and
    reset at restart intervals (G.1.1.2)."""
    if ss == 0 and se != 0:
        raise ValueError("progressive scan must be DC (Ss=Se=0) or an AC band (Ss>=1)")
    dec = ArithDecoder(data, start)

    def do_restart() -> None:
        p = dec.pos
        while p + 1 < len(data) and not (data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7):
            p += 1
        dec.restart(p + 2)

    if ss == 0:  # DC scan — may be MCU-interleaved
        mcux, mcuy = mcu_dims
        models = {}
        if ah == 0:
            for ci, dc_id, _ in scan_list:
                if dc_id not in models:
                    L, U = dc_cond.get(dc_id, (0, 1))
                    models[dc_id] = _DcModel(L, U)
        preds = [0] * len(scan_list)
        dctx = [0] * len(scan_list)

        def reset_dc() -> None:
            nonlocal preds, dctx
            for m in models.values():
                m.reset()
            preds = [0] * len(scan_list)
            dctx = [0] * len(scan_list)

        if len(scan_list) > 1:  # interleaved: MCU grid, hi×vi blocks each
            nmcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and nmcu and nmcu % restart == 0:
                        do_restart()
                        reset_dc()
                    nmcu += 1
                    for si, (ci, dc_id, _) in enumerate(scan_list):
                        pad_bw, _, _, hi, vi = geoms[ci]
                        store = stores[ci]
                        for byi in range(vi):
                            for bxi in range(hi):
                                flat = (my * vi + byi) * pad_bw + (mx * hi + bxi)
                                if ah == 0:
                                    diff, dctx[si] = models[dc_id].decode(dec, dctx[si])
                                    preds[si] += diff
                                    store[flat, 0] = preds[si] << al
                                elif dec.decode([_FIXED, 0]):
                                    store[flat, 0] |= 1 << al
        else:  # single-component: the component's TRUE block grid
            ci, dc_id, _ = scan_list[0]
            pad_bw, true_bw, true_bh, _, _ = geoms[ci]
            store = stores[ci]
            nblk = 0
            for byi in range(true_bh):
                for bxi in range(true_bw):
                    if restart and nblk and nblk % restart == 0:
                        do_restart()
                        reset_dc()
                    nblk += 1
                    flat = byi * pad_bw + bxi
                    if ah == 0:
                        diff, dctx[0] = models[dc_id].decode(dec, dctx[0])
                        preds[0] += diff
                        store[flat, 0] = preds[0] << al
                    elif dec.decode([_FIXED, 0]):
                        store[flat, 0] |= 1 << al
        return _next_marker(data, dec.pos)

    if len(scan_list) != 1:
        raise ValueError("AC progressive scans must be single-component")
    ci, _, ac_id = scan_list[0]
    pad_bw, true_bw, true_bh, _, _ = geoms[ci]
    store = stores[ci]
    model = _AcModel(ac_cond.get(ac_id, 5))
    nblk = 0
    for byi in range(true_bh):
        for bxi in range(true_bw):
            if restart and nblk and nblk % restart == 0:
                do_restart()
                model.reset()
            nblk += 1
            zq = store[byi * pad_bw + bxi]
            if ah == 0:
                model.decode_band(dec, zq, ss, se, al)
            else:
                model.refine_band(dec, zq, ss, se, al)
    return _next_marker(data, dec.pos)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def arith_encode_gray(gray: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """(h, w) uint8 grayscale → arithmetic sequential JPEG (SOF9), default
    conditioning (L=0, U=1, Kx=5), flat all-ones quantization by default."""
    h, w = gray.shape
    q = np.ones(64, np.uint16) if quant is None else np.asarray(quant, np.uint16).reshape(64)
    qtab = np.empty(64, np.float64)
    qtab[_ZZ] = q
    qtab = qtab.reshape(8, 8)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(gray, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge").astype(np.float64) - 128.0

    enc = ArithEncoder()
    dc = _DcModel()
    ac = _AcModel()
    pred = 0
    ctx = 0
    for by in range(bh):
        for bx in range(bw):
            zq = _quantize_block(padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qtab)
            ctx = dc.encode(enc, int(zq[0]) - pred, ctx)
            pred = int(zq[0])
            ac.encode_block(enc, zq)
    payload = enc.flush()

    dqt = _seg(0xFFDB, b"\x00" + bytes(int(x) for x in q))
    sof = _seg(0xFFC9, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dac = _seg(0xFFCC, bytes([0x00, (1 << 4) | 0, 0x10, 5]))  # L=0 U=1; Kx=5
    sos = _seg(0xFFDA, b"\x01\x01\x00" + b"\x00\x3f\x00")
    return b"\xff\xd8" + dqt + sof + dac + sos + payload + b"\xff\xd9"


def arith_encode_gray_progressive(gray: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """(h, w) uint8 grayscale → PROGRESSIVE arithmetic JPEG (SOF10): a DC
    scan then two spectral-selection AC scans (1-5, 6-63), each with fresh
    statistics areas per T.81 G.2. Lossless under flat quantization like
    the sequential encoder, so the two paths reconstruct identically."""
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

    def dc_scan() -> bytes:
        enc = ArithEncoder()
        dc = _DcModel()
        pred = ctx = 0
        for zq in blocks:
            ctx = dc.encode(enc, int(zq[0]) - pred, ctx)
            pred = int(zq[0])
        return enc.flush()

    def ac_scan(ss: int, se: int) -> bytes:
        enc = ArithEncoder()
        ac = _AcModel()
        for zq in blocks:
            ac.encode_band(enc, zq, ss, se)
        return enc.flush()

    dqt = _seg(0xFFDB, b"\x00" + bytes(int(x) for x in q))
    sof = _seg(0xFFCA, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dac = _seg(0xFFCC, bytes([0x00, (1 << 4) | 0, 0x10, 5]))  # L=0 U=1; Kx=5
    out = b"\xff\xd8" + dqt + sof + dac
    out += _seg(0xFFDA, b"\x01\x01\x00" + b"\x00\x00\x00") + dc_scan()
    out += _seg(0xFFDA, b"\x01\x01\x00" + b"\x01\x05\x00") + ac_scan(1, 5)
    out += _seg(0xFFDA, b"\x01\x01\x00" + b"\x06\x3f\x00") + ac_scan(6, 63)
    return out + b"\xff\xd9"


def jpeg_payload_arith(doc_id: int) -> bytes:
    """Constant-gray ARITHMETIC JPEG, same dims/pixel field as
    jpeg_codec.jpeg_payload — the baseline SQL oracle applies because the
    flat-quant constant block reconstructs bit-exactly. Every third doc is
    PROGRESSIVE (SOF10) so the pipeline exercises both entropy layouts."""
    w, h = 12 + (doc_id % 6) * 4, 10 + (doc_id % 4) * 6
    img = np.full((h, w), doc_id % 256, np.uint8)
    if doc_id % 3 == 2:
        return arith_encode_gray_progressive(img)
    return arith_encode_gray(img)
