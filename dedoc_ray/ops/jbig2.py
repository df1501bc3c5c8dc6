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

plus SYMBOL + TEXT coding — the path real scanner output actually uses
for textual pages:

- generic templates 0-3 with arbitrary (causal) AT pixels: the context
  is the combined template+AT offset list sorted by (dy, dx), packed
  MSB-first (T.88 6.2.5.7 figure order);
- the arithmetic integer decoding procedure (T.88 Annex A.2: IADH/IADW/
  IAEX/IADT/IAFS/IADS/IAIT/IARI with the 512-state PREV tree and the
  six value ranges) and symbol-ID decoding (A.3, IAID) — both
  directions;
- symbol dictionary segments (type 0, 6.5: height classes via IADH,
  widths via IADW with OOB class end, per-symbol generic bitmaps
  sharing ONE coder + ONE GB context across the segment, IAEX export
  runs) and text region segments (types 6/7, 6.4: strip loop with
  IADT/IAFS/IADS/OOB, all four REFCORNERs, TRANSPOSED, SBCOMBOP
  OR/AND/XOR/REPLACE, SBDSOFFSET) — both directions;
- a page-level symbol encoder (connected components → deduped symbol
  dictionary → text region placements) so scanned-text pages get real
  symbol-coded JBIG2 streams for the self-interop oracle.

plus HALFTONE coding (6.6/6.7, both directions): pattern dictionaries
as one collective generic bitmap with AT1 = (-HDPW, 0); halftone
regions decode their grayscale image as Gray-coded bitplanes MSB→LSB
through one shared coder + context (Annex C.5) and stamp patterns on
the rotated fixed-point grid of 6.6.5.2.

plus REFINEMENT coding (6.3, both directions): generic refinement
regions with templates 0-1, adaptive pixels and reference offsets —
the lossy-generic-then-lossless-refinement layout real encoders emit —
composed onto the page with REPLACE semantics (segment types 42/43).

Scope notes: MMR-coded regions route to the existing CCITT-G4 decoder
(ops/ccitt.py — the MMR code IS T.6); Huffman-tabled segments (SDHUFF/
SBHUFF), TPGRON, refinement-aggregate SYMBOL coding (IARI), HENABLESKIP
and intermediate (stored) regions raise :class:`BadJbig2` — the honest
remainder.
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

    def decode(self, ctx: int, cx: Optional[Dict[int, Tuple[int, int]]] = None) -> int:
        cx = self.cx if cx is None else cx
        i, mps = cx.get(ctx, (0, 0))
        qe, nmps, nlps, switch = _MQ_STATES[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            if self.a < qe:
                d = mps
                cx[ctx] = (nmps, mps)
            else:
                d = 1 - mps
                cx[ctx] = (nlps, 1 - mps if switch else mps)
            self.a = qe
        else:
            self.c -= qe << 16
            if self.a & 0x8000:
                return mps
            if self.a < qe:
                d = 1 - mps
                cx[ctx] = (nlps, 1 - mps if switch else mps)
            else:
                d = mps
                cx[ctx] = (nmps, mps)
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

    def encode(self, ctx: int, d: int, cx: Optional[Dict[int, Tuple[int, int]]] = None) -> None:
        cx = self.cx if cx is None else cx
        i, mps = cx.get(ctx, (0, 0))
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
            cx[ctx] = (nmps, mps)
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            cx[ctx] = (nlps, 1 - mps if switch else mps)
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

# typical-prediction (SLTP) pseudo-pixel contexts per template
_SLTP_CTX = (0x9B25, 0x0795, 0x00E5, 0x0195)
_SLTP_CTX0 = _SLTP_CTX[0]

# base template pixels as (dy, dx), T.88 figures 4-7 (AT pixels excluded)
_TEMPLATE_BASE = (
    ((-2, -1), (-2, 0), (-2, 1),
     (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
     (0, -4), (0, -3), (0, -2), (0, -1)),
    ((-2, -1), (-2, 0), (-2, 1), (-2, 2),
     (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
     (0, -3), (0, -2), (0, -1)),
    ((-2, -1), (-2, 0), (-2, 1),
     (-1, -2), (-1, -1), (-1, 0), (-1, 1),
     (0, -2), (0, -1)),
    ((-1, -3), (-1, -2), (-1, -1), (-1, 0), (-1, 1),
     (0, -4), (0, -3), (0, -2), (0, -1)),
)

# nominal AT pixels as (dx, dy) pairs, segment-header order A1..A4
_NOMINAL_ATS = (
    ((3, -1), (-3, -1), (2, -2), (-2, -2)),
    ((3, -1),),
    ((2, -1),),
    ((2, -1),),
)


def _sorted_offsets(template: int, ats) -> Tuple[Tuple[int, int], ...]:
    """Combined template+AT offsets sorted by (dy, dx) — the context is
    packed MSB-first in this order (matches the spec figures; template 0
    with nominal ATs reproduces the classic 16-bit layout)."""
    if not 0 <= template <= 3:
        raise BadJbig2(f"generic template {template} unsupported")
    offs = list(_TEMPLATE_BASE[template])
    for dx, dy in ats:
        if dy > 0 or (dy == 0 and dx >= 0):
            raise BadJbig2(f"non-causal AT pixel ({dx},{dy})")
        if abs(dx) > 64 or dy < -64:
            raise BadJbig2(f"AT pixel ({dx},{dy}) out of sane range")
        offs.append((dy, dx))
    offs.sort()
    return tuple(offs)


_CTX_FNS: Dict[Tuple[Tuple[int, int], ...], object] = {}


def _ctx_fn(offs: Tuple[Tuple[int, int], ...]):
    """Compile the context expression for an offset list once — the
    per-pixel hot loop then evaluates one flat OR chain."""
    fn = _CTX_FNS.get(offs)
    if fn is None:
        n = len(offs)
        terms = []
        for i, (dy, dx) in enumerate(offs):
            shift = n - 1 - i
            t = f"bm[ry{dy:+d}][px{dx:+d}]"
            terms.append(f"({t} << {shift})" if shift else t)
        ns: Dict[str, object] = {}
        exec("def f(bm, ry, px):\n    return " + " | ".join(terms), ns)
        fn = _CTX_FNS[offs] = ns["f"]
    return fn


def _pads(offs) -> Tuple[int, int, int]:
    pad_t = max(2, max(-dy for dy, _ in offs))
    pad_l = max(4, max((-dx for _, dx in offs), default=0))
    pad_r = max(3, max((dx for _, dx in offs), default=0))
    return pad_t, pad_l, pad_r


_T0_NOMINAL = _sorted_offsets(0, _NOMINAL_ATS[0])


def _generic_decode_mq(
    mq: MQDec,
    gcx: Dict[int, Tuple[int, int]],
    width: int,
    height: int,
    template: int = 0,
    ats=None,
    tpgdon: bool = False,
) -> np.ndarray:
    """Generic-region decode on a SHARED coder + context (symbol dicts
    decode every symbol bitmap through one arithmetic stream) → uint8
    (h, w) bitmap of 0/1 (1 = black)."""
    if width <= 0 or height <= 0 or width * height > 40_000_000:
        raise BadJbig2(f"bad region geometry {width}x{height}")
    ats = _NOMINAL_ATS[template] if ats is None else tuple(ats)
    offs = _sorted_offsets(template, ats)
    pad_t, pad_l, pad_r = _pads(offs)
    pw = pad_l + width + pad_r + 1  # +1: the rolling-context prefetch below
    bm = [bytearray(pw) for _ in range(height + pad_t)]
    ltp = 0
    sltp = _SLTP_CTX[template]
    fast = offs == _T0_NOMINAL
    ctxf = None if fast else _ctx_fn(offs)
    for y in range(height):
        ry = y + pad_t
        if tpgdon:
            if mq.decode(sltp, gcx):
                ltp ^= 1
            if ltp:
                bm[ry][:] = bm[ry - 1]
                continue
        row = bm[ry]
        if fast:
            rm1 = bm[ry - 1]
            rm2 = bm[ry - 2]
            dec = mq.decode
            # rolling context: shift in rm2[px+3]/rm1[px+4]/the decoded bit
            # each step instead of recomputing 16 reads per pixel; the field
            # overflow bits (16, 11, 4) clear via the mask
            px = pad_l
            ctx = (
                (rm2[px - 2] << 15) | (rm2[px - 1] << 14) | (rm2[px] << 13)
                | (rm2[px + 1] << 12) | (rm2[px + 2] << 11)
                | (rm1[px - 3] << 10) | (rm1[px - 2] << 9) | (rm1[px - 1] << 8)
                | (rm1[px] << 7) | (rm1[px + 1] << 6) | (rm1[px + 2] << 5)
                | (rm1[px + 3] << 4)
                | (row[px - 4] << 3) | (row[px - 3] << 2) | (row[px - 2] << 1)
                | row[px - 1]
            )
            for px in range(pad_l, pad_l + width):
                bit = dec(ctx, gcx)
                row[px] = bit
                ctx = ((ctx << 1) & 0xF7EF) | (rm2[px + 3] << 11) | (rm1[px + 4] << 4) | bit
        else:
            dec = mq.decode
            for x in range(width):
                px = x + pad_l
                row[px] = dec(ctxf(bm, ry, px), gcx)
    out = np.zeros((height, width), np.uint8)
    for y in range(height):
        out[y] = np.frombuffer(bytes(bm[y + pad_t][pad_l : pad_l + width]), np.uint8)
    return out


def _generic_encode_mq(
    mq: MQEnc,
    gcx: Dict[int, Tuple[int, int]],
    bitmap: np.ndarray,
    template: int = 0,
    ats=None,
    tpgdon: bool = False,
) -> None:
    """Mirror of _generic_decode_mq — same template/packing, MQ-encoded
    onto a shared encoder (no flush)."""
    height, width = bitmap.shape
    ats = _NOMINAL_ATS[template] if ats is None else tuple(ats)
    offs = _sorted_offsets(template, ats)
    pad_t, pad_l, pad_r = _pads(offs)
    pw = pad_l + width + pad_r + 1  # +1: the rolling-context prefetch below
    bm = [bytearray(pw) for _ in range(height + pad_t)]
    ltp = 0
    sltp = _SLTP_CTX[template]
    fast = offs == _T0_NOMINAL
    ctxf = None if fast else _ctx_fn(offs)
    for y in range(height):
        ry = y + pad_t
        src = bitmap[y]
        if tpgdon:
            typical = y > 0 and bool((bitmap[y] == bitmap[y - 1]).all())
            bit = 1 if typical != bool(ltp) else 0
            mq.encode(sltp, bit, gcx)
            ltp ^= bit
            if ltp:
                bm[ry][:] = bm[ry - 1]
                continue
        row = bm[ry]
        if fast:
            rm1 = bm[ry - 1]
            rm2 = bm[ry - 2]
            enc = mq.encode
            bits = bytes(np.asarray(src, np.uint8) & 1)
            px = pad_l
            ctx = (
                (rm2[px - 2] << 15) | (rm2[px - 1] << 14) | (rm2[px] << 13)
                | (rm2[px + 1] << 12) | (rm2[px + 2] << 11)
                | (rm1[px - 3] << 10) | (rm1[px - 2] << 9) | (rm1[px - 1] << 8)
                | (rm1[px] << 7) | (rm1[px + 1] << 6) | (rm1[px + 2] << 5)
                | (rm1[px + 3] << 4)
                | (row[px - 4] << 3) | (row[px - 3] << 2) | (row[px - 2] << 1)
                | row[px - 1]
            )
            for x in range(width):
                px = x + pad_l
                bit = bits[x]
                enc(ctx, bit, gcx)
                row[px] = bit
                ctx = ((ctx << 1) & 0xF7EF) | (rm2[px + 3] << 11) | (rm1[px + 4] << 4) | bit
        else:
            enc = mq.encode
            for x in range(width):
                px = x + pad_l
                bit = int(src[x] & 1)
                enc(ctxf(bm, ry, px), bit, gcx)
                row[px] = bit


def generic_decode(
    data: bytes, width: int, height: int, tpgdon: bool = False,
    template: int = 0, ats=None,
) -> np.ndarray:
    """Arithmetic generic-region decode → uint8 (h, w) bitmap of 0/1
    (1 = black)."""
    mq = MQDec(data)
    return _generic_decode_mq(mq, {}, width, height, template, ats, tpgdon)


def generic_encode(
    bitmap: np.ndarray, tpgdon: bool = False, template: int = 0, ats=None,
) -> bytes:
    """Mirror of generic_decode — same template/packing, MQ-encoded."""
    mq = MQEnc()
    _generic_encode_mq(mq, {}, bitmap, template, ats, tpgdon)
    return mq.flush()


# --------------------------------- arithmetic integer decoding (Annex A)


def _int_decode(mq: MQDec, cx: Dict[int, Tuple[int, int]]) -> Optional[int]:
    """IAx decode (A.2) → int, or None for OOB."""
    prev = 1

    def bit() -> int:
        nonlocal prev
        d = mq.decode(prev, cx)
        prev = ((prev << 1) | d) if prev < 256 else ((((prev << 1) | d) & 511) | 256)
        return d

    s = bit()
    if not bit():
        nbits, offset = 2, 0
    elif not bit():
        nbits, offset = 4, 4
    elif not bit():
        nbits, offset = 6, 20
    elif not bit():
        nbits, offset = 8, 84
    elif not bit():
        nbits, offset = 12, 340
    else:
        nbits, offset = 32, 4436
    v = 0
    for _ in range(nbits):
        v = (v << 1) | bit()
    v += offset
    if s:
        return None if v == 0 else -v
    return v


def _int_encode(mq: MQEnc, cx: Dict[int, Tuple[int, int]], value: Optional[int]) -> None:
    """IAx encode — mirror of _int_decode; value=None encodes OOB."""
    prev = 1

    def bit(d: int) -> None:
        nonlocal prev
        mq.encode(prev, d, cx)
        prev = ((prev << 1) | d) if prev < 256 else ((((prev << 1) | d) & 511) | 256)

    if value is None:
        s, v = 1, 0
    else:
        s = 1 if value < 0 else 0
        v = -value if value < 0 else value
    bit(s)
    if v < 4:
        bit(0)
        nbits, base = 2, 0
    elif v < 20:
        bit(1), bit(0)
        nbits, base = 4, 4
    elif v < 84:
        bit(1), bit(1), bit(0)
        nbits, base = 6, 20
    elif v < 340:
        bit(1), bit(1), bit(1), bit(0)
        nbits, base = 8, 84
    elif v < 4436:
        bit(1), bit(1), bit(1), bit(1), bit(0)
        nbits, base = 12, 340
    else:
        bit(1), bit(1), bit(1), bit(1), bit(1)
        nbits, base = 32, 4436
    rem = v - base
    if rem >= 1 << nbits:
        raise BadJbig2(f"integer {value} out of coder range")
    for i in range(nbits - 1, -1, -1):
        bit((rem >> i) & 1)


def _iaid_decode(mq: MQDec, cx: Dict[int, Tuple[int, int]], codelen: int) -> int:
    """Symbol-ID decode (A.3): codelen MSB-first bits, tree-contexted."""
    prev = 1
    for _ in range(codelen):
        prev = (prev << 1) | mq.decode(prev, cx)
    return prev - (1 << codelen)


def _iaid_encode(mq: MQEnc, cx: Dict[int, Tuple[int, int]], codelen: int, value: int) -> None:
    prev = 1
    for i in range(codelen - 1, -1, -1):
        d = (value >> i) & 1
        mq.encode(prev, d, cx)
        prev = (prev << 1) | d


def _symcodelen(nsyms: int) -> int:
    return max(1, (nsyms - 1).bit_length() if nsyms > 1 else 1)


# ------------------------------------------- symbol dictionary (type 0)


def decode_symbol_dict(payload: bytes, input_syms: List[np.ndarray]) -> List[np.ndarray]:
    """Symbol dictionary segment data (6.5, arithmetic path) → exported
    symbol bitmaps (input symbols from referred dictionaries first)."""
    try:
        (flags,) = struct.unpack_from(">H", payload, 0)
        p = 2
        sdhuff = flags & 1
        sdrefagg = (flags >> 1) & 1
        ctx_used = (flags >> 8) & 1
        template = (flags >> 10) & 3
        if sdhuff:
            raise BadJbig2("Huffman symbol dictionaries unsupported")
        if sdrefagg:
            raise BadJbig2("refinement/aggregate symbol coding unsupported")
        if ctx_used:
            raise BadJbig2("retained coding contexts unsupported")
        n_at = 4 if template == 0 else 1
        ats = [
            (struct.unpack_from(">b", payload, p + 2 * i)[0],
             struct.unpack_from(">b", payload, p + 2 * i + 1)[0])
            for i in range(n_at)
        ]
        p += 2 * n_at
        n_ex, n_new = struct.unpack_from(">II", payload, p)
        p += 8
    except struct.error as e:
        raise BadJbig2(f"truncated symbol dictionary header: {e}") from e
    if n_new > 100_000 or n_ex > 100_000 + len(input_syms):
        raise BadJbig2("implausible symbol counts")
    mq = MQDec(payload[p:])
    iadh: Dict[int, Tuple[int, int]] = {}
    iadw: Dict[int, Tuple[int, int]] = {}
    iaex: Dict[int, Tuple[int, int]] = {}
    gcx: Dict[int, Tuple[int, int]] = {}
    new_syms: List[np.ndarray] = []
    hcheight = 0
    while len(new_syms) < n_new:
        dh = _int_decode(mq, iadh)
        if dh is None:
            raise BadJbig2("OOB height-class delta")
        hcheight += dh
        if hcheight <= 0 or hcheight > 10_000:
            raise BadJbig2(f"bad height class {hcheight}")
        symwidth = 0
        while True:
            dw = _int_decode(mq, iadw)
            if dw is None:
                break  # end of height class
            symwidth += dw
            if symwidth <= 0 or symwidth > 10_000:
                raise BadJbig2(f"bad symbol width {symwidth}")
            if len(new_syms) >= n_new:
                raise BadJbig2("more symbols than declared")
            new_syms.append(
                _generic_decode_mq(mq, gcx, symwidth, hcheight, template, ats, tpgdon=False)
            )
    # export flags: alternating IAEX run lengths over input+new, start 0
    all_syms = list(input_syms) + new_syms
    exported: List[np.ndarray] = []
    flag, i = 0, 0
    while i < len(all_syms):
        run = _int_decode(mq, iaex)
        if run is None or run < 0 or i + run > len(all_syms):
            raise BadJbig2("bad export run")
        if flag:
            exported.extend(all_syms[i : i + run])
        i += run
        flag ^= 1
    if len(exported) != n_ex:
        raise BadJbig2(f"exported {len(exported)} != declared {n_ex}")
    return exported


def encode_symbol_dict(symbols: List[np.ndarray], template: int = 0) -> bytes:
    """Mirror of decode_symbol_dict: all symbols new, all exported.
    Symbols must be sorted by (height, width)."""
    flags = (template & 3) << 10
    ats = _NOMINAL_ATS[template]
    head = struct.pack(">H", flags)
    for dx, dy in ats:
        head += struct.pack(">bb", dx, dy)
    head += struct.pack(">II", len(symbols), len(symbols))
    mq = MQEnc()
    iadh: Dict[int, Tuple[int, int]] = {}
    iadw: Dict[int, Tuple[int, int]] = {}
    iaex: Dict[int, Tuple[int, int]] = {}
    gcx: Dict[int, Tuple[int, int]] = {}
    hcheight = 0
    i = 0
    while i < len(symbols):
        h = symbols[i].shape[0]
        _int_encode(mq, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(symbols) and symbols[i].shape[0] == h:
            w = symbols[i].shape[1]
            _int_encode(mq, iadw, w - symwidth)
            symwidth = w
            _generic_encode_mq(mq, gcx, symbols[i], template, None, tpgdon=False)
            i += 1
        _int_encode(mq, iadw, None)  # OOB: height class done
    _int_encode(mq, iaex, 0)  # run of 0 non-exported
    _int_encode(mq, iaex, len(symbols))  # run exporting everything
    return head + mq.flush()


# ------------------------------------------------ text region (6/7)


def _blit(region: np.ndarray, sym: np.ndarray, y: int, x: int, op: int) -> None:
    rh, rw = region.shape
    h, w = sym.shape
    y0, x0 = max(y, 0), max(x, 0)
    y1, x1 = min(y + h, rh), min(x + w, rw)
    if y1 <= y0 or x1 <= x0:
        return
    view = region[y0:y1, x0:x1]
    s = sym[y0 - y : y1 - y, x0 - x : x1 - x]
    if op == 0:
        view |= s
    elif op == 1:
        view &= s
    elif op == 2:
        view ^= s
    elif op == 4:
        view[:] = s
    else:
        raise BadJbig2(f"SBCOMBOP {op} unsupported")


def decode_text_region(payload: bytes, syms: List[np.ndarray]):
    """Text region segment data (6.4, arithmetic path) → (bitmap, x, y).
    ``syms`` = concatenated exports of the referred symbol dictionaries."""
    try:
        rw, rh, rx, ry_, _comb = struct.unpack_from(">IIIIB", payload, 0)
        (tflags,) = struct.unpack_from(">H", payload, 17)
        p = 19
        sbhuff = tflags & 1
        refine = (tflags >> 1) & 1
        logstrips = (tflags >> 2) & 3
        refcorner = (tflags >> 4) & 3
        transposed = (tflags >> 6) & 1
        combop = (tflags >> 7) & 3
        defpixel = (tflags >> 9) & 1
        dsoffset = (tflags >> 10) & 0x1F
        if dsoffset > 15:
            dsoffset -= 32  # signed 5-bit
        rtemplate = (tflags >> 15) & 1
        if sbhuff:
            raise BadJbig2("Huffman text regions unsupported")
        if refine and rtemplate == 0:
            p += 4  # refinement AT pixels
        (n_inst,) = struct.unpack_from(">I", payload, p)
        p += 4
    except struct.error as e:
        raise BadJbig2(f"truncated text region header: {e}") from e
    if rw * rh > 40_000_000 or n_inst > 10_000_000:
        raise BadJbig2("implausible text region geometry")
    if not syms:
        raise BadJbig2("text region with no symbols")
    sbstrips = 1 << logstrips
    codelen = _symcodelen(len(syms))
    mq = MQDec(payload[p:])
    iadt: Dict[int, Tuple[int, int]] = {}
    iafs: Dict[int, Tuple[int, int]] = {}
    iads: Dict[int, Tuple[int, int]] = {}
    iait: Dict[int, Tuple[int, int]] = {}
    iari: Dict[int, Tuple[int, int]] = {}
    iaid: Dict[int, Tuple[int, int]] = {}
    region = np.full((rh, rw), defpixel, np.uint8)
    dt0 = _int_decode(mq, iadt)
    if dt0 is None:
        raise BadJbig2("OOB initial STRIPT")
    stript = -dt0 * sbstrips
    firsts = 0
    ninst = 0
    while ninst < n_inst:
        dt = _int_decode(mq, iadt)
        if dt is None:
            raise BadJbig2("OOB strip delta")
        stript += dt * sbstrips
        dfs = _int_decode(mq, iafs)
        if dfs is None:
            raise BadJbig2("OOB first-S delta")
        firsts += dfs
        curs = firsts
        first = True
        while True:
            if not first:
                ids = _int_decode(mq, iads)
                if ids is None:
                    break  # end of strip
                curs += ids + dsoffset
            first = False
            if ninst >= n_inst:
                raise BadJbig2("more instances than declared")
            curt = _int_decode(mq, iait) if sbstrips > 1 else 0
            if curt is None:
                raise BadJbig2("OOB T offset")
            t = stript + curt
            sid = _iaid_decode(mq, iaid, codelen)
            if sid >= len(syms):
                raise BadJbig2(f"symbol id {sid} out of range")
            if refine and _int_decode(mq, iari):
                raise BadJbig2("refined symbol instances unsupported")
            sym = syms[sid]
            h, w = sym.shape
            if not transposed:
                y = t if refcorner & 1 else t - h + 1
                _blit(region, sym, y, curs, combop)
                curs += w - 1
            else:
                x = t - w + 1 if refcorner & 2 else t
                _blit(region, sym, curs, x, combop)
                curs += h - 1
            ninst += 1
    return region, rx, ry_


def encode_text_region(
    shape: Tuple[int, int],
    instances: List[Tuple[int, int, int]],
    widths: List[int],
    heights: Optional[List[int]] = None,
    x: int = 0,
    y: int = 0,
    refcorner: int = 1,
    transposed: int = 0,
) -> bytes:
    """Mirror of decode_text_region: instances are (top, left, symbol id)
    in PAGE coordinates regardless of corner/transposition — the coded
    stream's (T, S) values are derived here. SBSTRIPS=1, OR composition.
    ``widths``/``heights`` index by symbol id (heights required for
    bottom corners and transposed mode)."""
    rh, rw = shape
    head = struct.pack(">IIIIB", rw, rh, x, y, 0)
    tflags = (refcorner & 3) << 4 | (transposed & 1) << 6
    head += struct.pack(">H", tflags)
    head += struct.pack(">I", len(instances))
    codelen = _symcodelen(len(widths))
    if heights is None:
        if refcorner & 1 == 0 or transposed:
            raise BadJbig2("heights required for bottom corners / transposed")
        heights = [0] * len(widths)

    coded = []  # (t, s, sid) in stream coordinates
    for top, left, sid in instances:
        h, w = heights[sid], widths[sid]
        if not transposed:
            t = top if refcorner & 1 else top + h - 1
            coded.append((t, left, sid))
        else:
            t = left + w - 1 if refcorner & 2 else left
            coded.append((t, top, sid))
    coded.sort()
    mq = MQEnc()
    iadt: Dict[int, Tuple[int, int]] = {}
    iafs: Dict[int, Tuple[int, int]] = {}
    iads: Dict[int, Tuple[int, int]] = {}
    iaid: Dict[int, Tuple[int, int]] = {}
    _int_encode(mq, iadt, 0)  # initial STRIPT
    stript = 0
    firsts = 0
    i = 0
    n = len(coded)
    while i < n:
        t = coded[i][0]
        _int_encode(mq, iadt, t - stript)
        stript = t
        s0 = coded[i][1]
        _int_encode(mq, iafs, s0 - firsts)
        firsts = s0
        curs = s0
        first = True
        while i < n and coded[i][0] == t:
            _, s, sid = coded[i]
            if not first:
                _int_encode(mq, iads, s - curs)
                curs = s
            first = False
            _iaid_encode(mq, iaid, codelen, sid)
            # mirrors the decoder's post-draw advance along the S axis
            curs += (heights[sid] if transposed else widths[sid]) - 1
            i += 1
        _int_encode(mq, iads, None)  # OOB: strip done
    return head + mq.flush()


# ------------------------------------------------- embedded segment layer


# ------------------------------------------------- refinement (T.88 6.3)
#
# Context = coding-bitmap pixels MSB-first in figure order, then
# reference-bitmap pixels (offset by GRREFERENCEDX/DY). Template 0 appends
# adaptive pixel A1 to the coding plane and A2 to the reference plane.

_GR_CODING = (((0, -1), (1, -1), (-1, 0)), ((-1, -1), (0, -1), (1, -1), (-1, 0)))
_GR_REFERENCE = (
    ((0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)),
    ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)),
)
_GR_NOMINAL_ATS = ((-1, -1), (-1, -1))


def _refine_offsets(template: int, ats=None):
    if template not in (0, 1):
        raise BadJbig2(f"refinement template {template} unsupported")
    coding = _GR_CODING[template]
    reference = _GR_REFERENCE[template]
    if template == 0:
        a1, a2 = (ats or _GR_NOMINAL_ATS)[:2]
        coding = coding + (tuple(a1),)
        reference = reference + (tuple(a2),)
    return coding, reference


def _refine_decode_mq(
    mq: MQDec,
    gcx: Dict[int, Tuple[int, int]],
    width: int,
    height: int,
    reference: np.ndarray,
    dx: int = 0,
    dy: int = 0,
    template: int = 0,
    ats=None,
) -> np.ndarray:
    """Generic refinement decode (no TPGRON) → uint8 (h, w) bitmap."""
    if width <= 0 or height <= 0 or width * height > 40_000_000:
        raise BadJbig2(f"bad refinement geometry {width}x{height}")
    coding, refer = _refine_offsets(template, ats)
    out = np.zeros((height, width), np.uint8)
    rh, rw = reference.shape
    dec = mq.decode
    for y in range(height):
        for x in range(width):
            ctx = 0
            for ox, oy in coding:
                cy, cx_ = y + oy, x + ox
                bit = int(out[cy, cx_]) if 0 <= cy < height and 0 <= cx_ < width else 0
                ctx = (ctx << 1) | bit
            for ox, oy in refer:
                ry_ = y - dy + oy
                rx_ = x - dx + ox
                bit = int(reference[ry_, rx_]) if 0 <= ry_ < rh and 0 <= rx_ < rw else 0
                ctx = (ctx << 1) | bit
            out[y, x] = dec(ctx, gcx)
    return out


def _refine_encode_mq(
    mq: MQEnc,
    gcx: Dict[int, Tuple[int, int]],
    bitmap: np.ndarray,
    reference: np.ndarray,
    dx: int = 0,
    dy: int = 0,
    template: int = 0,
    ats=None,
) -> None:
    """Mirror of _refine_decode_mq (no flush)."""
    height, width = bitmap.shape
    coding, refer = _refine_offsets(template, ats)
    rh, rw = reference.shape
    enc = mq.encode
    for y in range(height):
        for x in range(width):
            ctx = 0
            for ox, oy in coding:
                cy, cx_ = y + oy, x + ox
                bit = int(bitmap[cy, cx_]) if 0 <= cy < height and 0 <= cx_ < width else 0
                ctx = (ctx << 1) | bit
            for ox, oy in refer:
                ry_ = y - dy + oy
                rx_ = x - dx + ox
                bit = int(reference[ry_, rx_]) if 0 <= ry_ < rh and 0 <= rx_ < rw else 0
                ctx = (ctx << 1) | bit
            enc(ctx, int(bitmap[y, x] & 1), gcx)


def decode_refinement_region(payload: bytes, reference: np.ndarray):
    """Refinement region segment data (6.3.5) → (bitmap, x, y). The
    reference is the page region under the segment's bounding box."""
    rw, rh, rx, ry_ = struct.unpack_from(">IIII", payload, 0)
    flags = payload[17]
    template = flags & 1
    if flags & 2:
        raise BadJbig2("TPGRON refinement unsupported")
    p = 18
    ats = None
    if template == 0:
        ats = [
            (struct.unpack_from(">b", payload, p)[0], struct.unpack_from(">b", payload, p + 1)[0]),
            (struct.unpack_from(">b", payload, p + 2)[0], struct.unpack_from(">b", payload, p + 3)[0]),
        ]
        p += 4
    mq = MQDec(payload[p:])
    region = _refine_decode_mq(mq, {}, rw, rh, reference, 0, 0, template, ats)
    return region, rx, ry_


def encode_refinement_region(
    bitmap: np.ndarray, reference: np.ndarray, x: int = 0, y: int = 0
) -> bytes:
    """Mirror of decode_refinement_region (template 0, nominal ATs)."""
    rh, rw = bitmap.shape
    region_info = struct.pack(">IIIIB", rw, rh, x, y, 4)  # REPLACE composition
    mq = MQEnc()
    _refine_encode_mq(mq, {}, bitmap, reference)
    return region_info + bytes([0]) + struct.pack(">bbbb", -1, -1, -1, -1) + mq.flush()


def decode_pattern_dict(payload: bytes) -> List[np.ndarray]:
    """Pattern dictionary segment data (T.88 6.7) → HDPATS list. The
    patterns arrive as ONE collective generic bitmap (GRAYMAX+1 patterns
    of HDPW×HDPH side by side) with AT1 = (-HDPW, 0)."""
    flags = payload[0]
    if flags & 1:
        raise BadJbig2("MMR pattern dictionaries unsupported")
    template = (flags >> 1) & 3
    hdpw, hdph = payload[1], payload[2]
    (graymax,) = struct.unpack_from(">I", payload, 3)
    if hdpw == 0 or hdph == 0 or graymax > 10_000:
        raise BadJbig2("bad pattern dictionary geometry")
    ats = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)][: 4 if template == 0 else 1]
    collective = generic_decode(payload[7:], (graymax + 1) * hdpw, hdph, template=template, ats=ats)
    return [collective[:, i * hdpw : (i + 1) * hdpw] for i in range(graymax + 1)]


def encode_pattern_dict(patterns: List[np.ndarray]) -> bytes:
    """Mirror of decode_pattern_dict (template 0, no MMR)."""
    hdph, hdpw = patterns[0].shape
    if any(p.shape != (hdph, hdpw) for p in patterns):
        raise BadJbig2("patterns must share one size")
    collective = np.concatenate(patterns, axis=1)
    ats = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
    return (
        bytes([0, hdpw, hdph])
        + struct.pack(">I", len(patterns) - 1)
        + generic_encode(collective, template=0, ats=ats)
    )


def _grayscale_ats(template: int) -> List[Tuple[int, int]]:
    # Annex C.5 / 6.6.5.1: AT1 x = 3 for templates 0-1, 2 for 2-3
    a1 = (3 if template <= 1 else 2, -1)
    return [a1, (-3, -1), (2, -2), (-2, -2)][: 4 if template == 0 else 1]


def decode_halftone_region(payload: bytes, patterns: List[np.ndarray]):
    """Halftone region segment data (T.88 6.6, arithmetic path) →
    (bitmap, x, y). The grayscale image decodes as Gray-coded bitplanes
    MSB→LSB through ONE shared coder + context (Annex C.5), then each
    grid cell stamps its pattern at the rotated-grid position 6.6.5.2."""
    rw, rh, rx, ry_ = struct.unpack_from(">IIII", payload, 0)
    flags = payload[17]
    if flags & 1:
        raise BadJbig2("MMR halftone regions unsupported")
    template = (flags >> 1) & 3
    if flags & 8:
        raise BadJbig2("HENABLESKIP unsupported")
    combop = (flags >> 4) & 7
    defpixel = (flags >> 7) & 1
    hgw, hgh, hgx, hgy = struct.unpack_from(">IIii", payload, 18)
    hrx, hry = struct.unpack_from(">HH", payload, 34)
    if not patterns:
        raise BadJbig2("halftone region with no pattern dictionary")
    if rw * rh > 40_000_000 or hgw * hgh > 10_000_000:
        raise BadJbig2("bad halftone geometry")
    npats = len(patterns)
    bits = max(1, (npats - 1).bit_length())
    mq = MQDec(payload[38:])  # 17 region info + 1 flags + 16 grid + 4 vector
    gcx: Dict[int, Tuple[int, int]] = {}
    ats = _grayscale_ats(template)
    gray = np.zeros((hgh, hgw), np.int64)
    prev = None
    for j in range(bits - 1, -1, -1):
        plane = _generic_decode_mq(mq, gcx, hgw, hgh, template=template, ats=ats).astype(np.int64)
        if prev is not None:
            plane ^= prev  # Gray decode: XOR with the plane above
        gray |= plane << j
        prev = plane
    np.minimum(gray, npats - 1, out=gray)
    region = np.full((rh, rw), defpixel, np.uint8)
    for mg in range(hgh):
        for ng in range(hgw):
            x = (hgx + mg * hry + ng * hrx) >> 8
            y = (hgy + mg * hrx - ng * hry) >> 8
            _blit(region, patterns[int(gray[mg, ng])], y, x, combop)
    return region, rx, ry_


def encode_halftone_region(
    gray: np.ndarray, patterns: List[np.ndarray], region_size: Tuple[int, int] | None = None
) -> bytes:
    """Mirror of decode_halftone_region: axis-aligned square grid
    (HRX = HDPW<<8, HRY = 0), OR composition, template 0."""
    hgh, hgw = gray.shape
    hdph, hdpw = patterns[0].shape
    if hdph != hdpw:
        # the 6.6.5.2 grid uses ONE vector (HRX, HRY) for both axes, so a
        # square axis-aligned pitch needs square patterns
        raise BadJbig2("encoder supports square patterns only")
    rh, rw = region_size if region_size else (hgh * hdph, hgw * hdpw)
    npats = len(patterns)
    bits = max(1, (npats - 1).bit_length())
    mq = MQEnc()
    gcx: Dict[int, Tuple[int, int]] = {}
    ats = _grayscale_ats(0)
    g = np.asarray(gray, np.int64)
    if g.min() < 0 or g.max() >= npats:
        raise BadJbig2("gray values out of pattern range")
    prev = None
    for j in range(bits - 1, -1, -1):
        plane = (g >> j) & 1
        coded = plane if prev is None else plane ^ prev  # Gray encode
        _generic_encode_mq(mq, gcx, coded.astype(np.uint8), template=0, ats=ats)
        prev = plane
    region_info = struct.pack(">IIIIB", rw, rh, 0, 0, 0)
    # flags: not MMR, template 0, no skip, HCOMBOP=OR, HDEFPIXEL=0
    return (
        region_info
        + bytes([0])
        + struct.pack(">IIii", hgw, hgh, 0, 0)
        + struct.pack(">HH", hdpw << 8, 0)
        + mq.flush()
    )


def jbig2_encode_halftone(gray: np.ndarray, patterns: List[np.ndarray]) -> bytes:
    """Grayscale index image + patterns → embedded-organisation JBIG2
    stream (page info + pattern dictionary + immediate lossless halftone
    region + end-of-page)."""
    hgh, hgw = gray.shape
    hdph, hdpw = patterns[0].shape
    h, w = hgh * hdph, hgw * hdpw
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    out = _segment(0, 48, 1, page_info)
    out += _segment(1, 16, 1, encode_pattern_dict(patterns))
    out += _segment(2, 23, 1, encode_halftone_region(gray, patterns), refs=(1,))
    out += _segment(3, 49, 1, b"")
    return out


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
    sym_dicts: Dict[int, List[np.ndarray]] = {}  # segment number → exports
    pat_dicts: Dict[int, List[np.ndarray]] = {}  # segment number → patterns
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
                    region = generic_decode(
                        payload[p:], rw, rh, tpgdon=tpgdon, template=template, ats=ats
                    )
                else:
                    from dedoc_ray.ops.ccitt import ccitt_g4_decode

                    gray = ccitt_g4_decode(payload[p:], columns=rw, rows=rh)
                    region = (gray == 0).astype(np.uint8)  # G4 black → 1
                page_bitmap = _compose(page_bitmap, region, rx, ry_)
            elif seg_type == 0:  # symbol dictionary
                input_syms: List[np.ndarray] = []
                for r in refs:
                    if r not in sym_dicts:
                        raise BadJbig2(f"symbol dict {num} refers to missing segment {r}")
                    input_syms.extend(sym_dicts[r])
                sym_dicts[num] = decode_symbol_dict(payload, input_syms)
            elif seg_type in (6, 7):  # immediate (lossless) text region
                syms: List[np.ndarray] = []
                for r in refs:
                    syms.extend(sym_dicts.get(r, []))
                region, rx, ry_ = decode_text_region(payload, syms)
                page_bitmap = _compose(page_bitmap, region, rx, ry_)
            elif seg_type == 16:  # pattern dictionary
                pat_dicts[num] = decode_pattern_dict(payload)
            elif seg_type in (22, 23):  # immediate (lossless) halftone region
                pats: List[np.ndarray] = []
                for r in refs:
                    pats.extend(pat_dicts.get(r, []))
                region, rx, ry_ = decode_halftone_region(payload, pats)
                page_bitmap = _compose(page_bitmap, region, rx, ry_)
            elif seg_type in (42, 43):  # immediate (lossless) refinement region
                rw0, rh0, rx0, ry0 = struct.unpack_from(">IIII", payload, 0)
                if page_bitmap is None:
                    raise BadJbig2("refinement region before page info")
                ref = np.zeros((rh0, rw0), np.uint8)
                sub = page_bitmap[ry0 : ry0 + rh0, rx0 : rx0 + rw0]
                ref[: sub.shape[0], : sub.shape[1]] = sub
                region, rx, ry_ = decode_refinement_region(payload, ref)
                page_bitmap = _compose(page_bitmap, region, rx, ry_)
                # refinement REPLACES the rectangle it refines (6.3 + page
                # comb op REPLACE) — clear-then-set via direct assignment
                page_bitmap[ry_ : ry_ + region.shape[0], rx : rx + region.shape[1]] = region
            elif seg_type in (49, 50, 51, 52, 62):  # end-of-* / profiles / ext
                continue
            elif seg_type in (4, 20, 40, 53):
                raise BadJbig2(
                    f"segment type {seg_type} (intermediate/tables) unsupported"
                )
    if page_bitmap is None:
        raise BadJbig2("no page produced")
    return page_bitmap


def _compose(page: Optional[np.ndarray], region: np.ndarray, x: int, y: int) -> np.ndarray:
    rh, rw = region.shape
    if page is None:
        page = np.zeros((y + rh, x + rw), np.uint8)
    elif page.shape[0] < y + rh or page.shape[1] < x + rw:
        grown = np.zeros((max(page.shape[0], y + rh), max(page.shape[1], x + rw)), np.uint8)
        grown[: page.shape[0], : page.shape[1]] = page
        page = grown
    page[y : y + rh, x : x + rw] |= region
    return page


def _segment(num: int, seg_type: int, page: int, payload: bytes, refs: Tuple[int, ...] = ()) -> bytes:
    head = struct.pack(">IB", num, seg_type & 0x3F)
    if len(refs) > 4:
        raise BadJbig2("too many referred segments for the short form")
    head += bytes([len(refs) << 5])
    head += bytes(refs)  # segment numbers stay ≤ 256 in our writer
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


def _connected_components(bitmap: np.ndarray) -> List[Tuple[int, int, np.ndarray]]:
    """8-connected black components → [(top, left, mask bitmap)]. Masks
    carry only the component's own pixels so overlapping bounding boxes
    OR together losslessly."""
    h, w = bitmap.shape
    labels = np.zeros((h, w), np.int32)
    nxt = 0
    comps: List[Tuple[int, int, np.ndarray]] = []
    bm = bitmap != 0
    for sy in range(h):
        row = bm[sy]
        for sx in np.flatnonzero(row & (labels[sy] == 0)):
            nxt += 1
            stack = [(sy, int(sx))]
            labels[sy, sx] = nxt
            pixels = []
            while stack:
                cy, cx_ = stack.pop()
                pixels.append((cy, cx_))
                for ny in range(max(cy - 1, 0), min(cy + 2, h)):
                    for nx in range(max(cx_ - 1, 0), min(cx_ + 2, w)):
                        if bm[ny, nx] and labels[ny, nx] == 0:
                            labels[ny, nx] = nxt
                            stack.append((ny, nx))
            ys = [p[0] for p in pixels]
            xs = [p[1] for p in pixels]
            top, left = min(ys), min(xs)
            mask = np.zeros((max(ys) - top + 1, max(xs) - left + 1), np.uint8)
            for py, px_ in pixels:
                mask[py - top, px_ - left] = 1
            comps.append((top, left, mask))
    return comps


def jbig2_encode_symbols(bitmap: np.ndarray) -> bytes:
    """Bitmap (uint8 0/1, 1 = black) → embedded-organisation JBIG2 stream
    using SYMBOL coding: connected components become a deduplicated
    symbol dictionary + one immediate lossless text region (the layout
    real scanner encoders like jbig2enc emit for textual pages). Pages
    with no black pixels fall back to a generic region."""
    h, w = bitmap.shape
    comps = _connected_components(bitmap)
    if not comps:
        return jbig2_encode_embedded(bitmap)
    keys: Dict[Tuple[int, int, bytes], int] = {}
    uniq: List[np.ndarray] = []
    placements: List[Tuple[int, int, Tuple[int, int, bytes]]] = []
    for top, left, mask in comps:
        k = (mask.shape[0], mask.shape[1], mask.tobytes())
        if k not in keys:
            keys[k] = 0
            uniq.append(mask)
        placements.append((top, left, k))
    # canonical dictionary order: height classes ascending, widths ascending
    uniq.sort(key=lambda m: (m.shape[0], m.shape[1], m.tobytes()))
    for i, m in enumerate(uniq):
        keys[(m.shape[0], m.shape[1], m.tobytes())] = i
    instances = sorted((top, left, keys[k]) for top, left, k in placements)
    widths = [m.shape[1] for m in uniq]
    page_info = struct.pack(">IIIIBH", w, h, 0, 0, 0, 0)
    out = _segment(0, 48, 1, page_info)
    out += _segment(1, 0, 1, encode_symbol_dict(uniq))
    out += _segment(2, 7, 1, encode_text_region((h, w), instances, widths), refs=(1,))
    out += _segment(3, 49, 1, b"")  # end of page
    return out
