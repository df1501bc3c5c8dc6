"""CCITT Group 3/4 fax decoding (ITU-T T.4 / T.6) — the CCITTFaxDecode gate.

Scanned PDFs and TIFFs carry bilevel rasters as MH (1-D), MR (2-D, K>0) or
MMR (pure 2-D "Group 4", K<0 — the PDF default for fax scans). The run
-length Huffman tables below are the published ITU-T T.4 tables 2/3 (+ the
shared extended makeups) — recovered EMPIRICALLY in this environment by
black-box probing the JDK's CCITT RLE encoder with known run patterns
(scripts in the round-3 log; prefix-freeness and byte-exact roundtrips
against the same encoder validate every entry), since no table source
exists offline and transcribing 200 codes from memory is how silent
corruption happens.

Decoder structure per T.4 §4.2.1 (2-D coding: vertical/horizontal/pass
modes against the reference line's changing elements b1/b2). Validated
two ways in tests/test_ccitt.py: byte-exact roundtrips of random bilevel
images through the JDK's T.6/RLE encoders, and the real CCITT G4 pages in
the reference's scanned-law PDFs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

_WHITE_CODES = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000",
    4: "1011", 5: "1100", 6: "1110", 7: "1111",
    8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101",
    16: "101010", 17: "101011", 18: "0100111", 19: "0001100",
    20: "0001000", 21: "0010111", 22: "0000011", 23: "0000100",
    24: "0101000", 25: "0101011", 26: "0010011", 27: "0100100",
    28: "0011000", 29: "00000010", 30: "00000011", 31: "00011010",
    32: "00011011", 33: "00010010", 34: "00010011", 35: "00010100",
    36: "00010101", 37: "00010110", 38: "00010111", 39: "00101000",
    40: "00101001", 41: "00101010", 42: "00101011", 43: "00101100",
    44: "00101101", 45: "00000100", 46: "00000101", 47: "00001010",
    48: "00001011", 49: "01010010", 50: "01010011", 51: "01010100",
    52: "01010101", 53: "00100100", 54: "00100101", 55: "01011000",
    56: "01011001", 57: "01011010", 58: "01011011", 59: "01001010",
    60: "01001011", 61: "00110010", 62: "00110011", 63: "00110100",
}

_BLACK_CODES = {
    0: "0000110111", 1: "010", 2: "11", 3: "10",
    4: "011", 5: "0011", 6: "0010", 7: "00011",
    8: "000101", 9: "000100", 10: "0000100", 11: "0000101",
    12: "0000111", 13: "00000100", 14: "00000111", 15: "000011000",
    16: "0000010111", 17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110", 63: "000001100111",
}

_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011", 1792: "00000001000",
    1856: "00000001100", 1920: "00000001101", 1984: "000000010010", 2048: "000000010011",
    2112: "000000010100", 2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110", 2560: "000000011111",
}

_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001", 256: "000001011011",
    320: "000000110011", 384: "000000110100", 448: "000000110101", 512: "0000001101100",
    576: "0000001101101", 640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011", 1024: "0000001110100",
    1088: "0000001110101", 1152: "0000001110110", 1216: "0000001110111", 1280: "0000001010010",
    1344: "0000001010011", 1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101", 1792: "00000001000",
    1856: "00000001100", 1920: "00000001101", 1984: "000000010010", 2048: "000000010011",
    2112: "000000010100", 2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110", 2560: "000000011111",
}


def _build_tree(*tables: Dict[int, str]) -> Dict[str, int]:
    tree: Dict[str, int] = {}
    for tab in tables:
        for run, code in tab.items():
            tree[code] = run
    return tree


_WHITE_TREE = _build_tree(_WHITE_CODES, _WHITE_MAKEUP)
_BLACK_TREE = _build_tree(_BLACK_CODES, _BLACK_MAKEUP)
_MAX_CODE_LEN = max(len(c) for c in list(_WHITE_TREE) + list(_BLACK_TREE))

# T.4 §4.2.1.1 two-dimensional mode codes
_MODE_CODES = [
    ("1", "V0"), ("011", "VR1"), ("010", "VL1"), ("001", "H"), ("0001", "P"),
    ("000011", "VR2"), ("000010", "VL2"), ("0000011", "VR3"), ("0000010", "VL3"),
]


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def peek(self, n: int) -> str:
        out = []
        for i in range(self.pos, min(self.pos + n, len(self.data) * 8)):
            out.append("1" if self.data[i >> 3] & (0x80 >> (i & 7)) else "0")
        return "".join(out)

    def skip(self, n: int) -> None:
        self.pos += n

    def at_end(self) -> bool:
        return self.pos >= len(self.data) * 8


def _read_mode(r: _BitReader) -> Optional[str]:
    buf = r.peek(24)
    for code, mode in _MODE_CODES:
        if buf.startswith(code):
            r.skip(len(code))
            return mode
    if buf.startswith("000000000001"):  # EOL / EOFB
        r.skip(12)
        return "EOL"
    return None


def _read_run(r: _BitReader, white: bool) -> Optional[int]:
    """One complete run: zero or more makeup codes + a terminating code."""
    tree = _WHITE_TREE if white else _BLACK_TREE
    total = 0
    while True:
        buf = r.peek(_MAX_CODE_LEN)
        hit = None
        for ln in range(2, len(buf) + 1):
            run = tree.get(buf[:ln])
            if run is not None:
                hit = (ln, run)
                break
        if hit is None:
            return None
        r.skip(hit[0])
        total += hit[1]
        if hit[1] < 64:  # terminating code ends the run
            return total


def _transitions(row: np.ndarray) -> List[int]:
    """Changing-element positions per T.4 §4.2.1.3: the line conceptually
    starts WHITE, so a black first pixel is a change at position 0."""
    diff = (np.flatnonzero(row[1:] != row[:-1]) + 1).tolist()
    if len(row) and row[0]:
        return [0] + diff
    return diff


def ccitt_g4_decode(data: bytes, columns: int, rows: Optional[int] = None,
                    black_is_1: bool = False) -> np.ndarray:
    """MMR / Group 4 (PDF CCITTFaxDecode with K < 0) → uint8 raster
    (0 = black ink, 255 = white paper)."""
    r = _BitReader(data)
    out: List[np.ndarray] = []
    # reference line: imaginary all-white row (False = white)
    ref = np.zeros(columns, dtype=bool)  # True = black
    while not r.at_end() and (rows is None or len(out) < rows):
        cur = np.zeros(columns, dtype=bool)
        ref_tr = _transitions(ref)
        a0 = -1
        color_black = False
        ok = True
        while a0 < columns:
            # b1: first changing element on ref right of a0 whose NEW color
            # is opposite to the current coding color; b2: the next one
            b1 = _b1(ref, ref_tr, a0, color_black, columns)
            b2 = _next_transition(ref_tr, b1, columns)
            mode = _read_mode(r)
            if mode is None or mode == "EOL":
                ok = mode == "EOL"
                break
            if mode == "P":
                if color_black:
                    cur[max(a0, 0) : b2] = True
                a0 = b2
                continue
            if mode == "H":
                r1 = _read_run(r, not color_black)
                r2 = _read_run(r, color_black)
                if r1 is None or r2 is None:
                    ok = False
                    break
                s = max(a0, 0)
                a1 = min(s + r1, columns)
                a2 = min(a1 + r2, columns)
                if color_black:
                    cur[s:a1] = True
                else:
                    cur[a1:a2] = True
                a0 = a2
                continue
            # vertical modes
            delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                     "VL1": -1, "VL2": -2, "VL3": -3}[mode]
            a1 = min(max(b1 + delta, 0), columns)
            if color_black:
                cur[max(a0, 0) : a1] = True
            a0 = a1
            color_black = not color_black
        if not ok and a0 <= 0 and not cur.any():
            break  # EOFB or garbage tail
        out.append(cur)
        ref = cur
        if not ok:
            break
    if not out:
        raise ValueError("CCITT G4: no rows decoded")
    mask = np.stack(out)
    if black_is_1:
        # /BlackIs1: 1 bits are black — our mask already True=black; the
        # flag affects the INPUT bit sense for uncompressed data only;
        # decoded runs are color-explicit, so nothing changes here
        pass
    raster = np.where(mask, 0, 255).astype(np.uint8)
    return raster


def _b1(ref: np.ndarray, ref_tr: List[int], a0: int, color_black: bool, columns: int) -> int:
    """First changing element on the reference line right of a0 whose NEW
    color is opposite to the current coding color."""
    for t in ref_tr:
        if t > a0 and bool(ref[t]) != color_black:
            return t
    # imaginary change at `columns` always qualifies
    return columns


def _next_transition(ref_tr: List[int], after: int, columns: int) -> int:
    for t in ref_tr:
        if t > after:
            return t
    return columns


def ccitt_mh_decode(data: bytes, columns: int, rows: Optional[int] = None,
                    byte_align: bool = True) -> np.ndarray:
    """Modified Huffman 1-D (TIFF compression 2 "CCITT RLE"; PDF K = 0
    with EncodedByteAlign) → uint8 raster."""
    r = _BitReader(data)
    out: List[np.ndarray] = []
    while not r.at_end() and (rows is None or len(out) < rows):
        if byte_align and r.pos % 8:
            r.skip(8 - r.pos % 8)
        if r.at_end() or not r.peek(1):
            break
        cur = np.zeros(columns, dtype=bool)
        x = 0
        white = True
        ok = False
        while x < columns:
            run = _read_run(r, white)
            if run is None:
                break
            if not white:
                cur[x : min(x + run, columns)] = True
            x += run
            white = not white
            if x >= columns:
                ok = True
        if not ok:
            break
        out.append(cur)
    if not out:
        raise ValueError("CCITT MH: no rows decoded")
    return np.where(np.stack(out), 0, 255).astype(np.uint8)


def ccitt_g3_decode(data: bytes, columns: int, rows: Optional[int] = None,
                    two_d: bool = True) -> np.ndarray:
    """Group 3 with EOLs (PDF CCITTFaxDecode K > 0; TIFF compression 3).
    With ``two_d`` (K > 0 / T4Options bit 0) rows mix 1-D (MH) and 2-D:
    each row is preceded by EOL ``000000000001`` plus a tag bit (1 = 1-D,
    0 = 2-D against the previous row). Without it (pure 1-D G3) the EOL
    has no tag bit and every row is MH-coded."""
    r = _BitReader(data)
    out: List[np.ndarray] = []
    ref = np.zeros(columns, dtype=bool)
    while not r.at_end() and (rows is None or len(out) < rows):
        # hunt for the next EOL (fill bits are zeros before it)
        found = False
        while not r.at_end():
            buf = r.peek(12)
            if buf == "000000000001":
                r.skip(12)
                found = True
                break
            if not buf:
                break
            r.skip(1)
        if not found:
            break
        if two_d:
            tag = r.peek(1)
            if tag == "":
                break
            r.skip(1)
        else:
            tag = "1"  # pure 1-D: every row is MH, no tag bit
        cur = np.zeros(columns, dtype=bool)
        if tag == "1":  # 1-D MH row
            x = 0
            white = True
            ok = False
            while x < columns:
                run = _read_run(r, white)
                if run is None:
                    break
                if not white:
                    cur[x : min(x + run, columns)] = True
                x += run
                white = not white
                if x >= columns:
                    ok = True
            if not ok:
                break
        else:  # 2-D row against the previous row
            ref_tr = _transitions(ref)
            a0 = -1
            color_black = False
            ok = True
            while a0 < columns:
                b1 = _b1(ref, ref_tr, a0, color_black, columns)
                b2 = _next_transition(ref_tr, b1, columns)
                mode = _read_mode(r)
                if mode is None or mode == "EOL":
                    ok = mode == "EOL"
                    if mode == "EOL":
                        r.pos -= 12  # let the outer loop consume it
                    break
                if mode == "P":
                    if color_black:
                        cur[max(a0, 0) : b2] = True
                    a0 = b2
                    continue
                if mode == "H":
                    r1 = _read_run(r, not color_black)
                    r2 = _read_run(r, color_black)
                    if r1 is None or r2 is None:
                        ok = False
                        break
                    s = max(a0, 0)
                    a1 = min(s + r1, columns)
                    a2 = min(a1 + r2, columns)
                    if color_black:
                        cur[s:a1] = True
                    else:
                        cur[a1:a2] = True
                    a0 = a2
                    continue
                delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                         "VL1": -1, "VL2": -2, "VL3": -3}[mode]
                a1 = min(max(b1 + delta, 0), columns)
                if color_black:
                    cur[max(a0, 0) : a1] = True
                a0 = a1
                color_black = not color_black
            if not ok and not cur.any():
                break
        out.append(cur)
        ref = cur
    if not out:
        raise ValueError("CCITT G3: no rows decoded")
    return np.where(np.stack(out), 0, 255).astype(np.uint8)
