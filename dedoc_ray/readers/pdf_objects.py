"""PDF object layer — lexer, xref / xref-stream walk, stream filters, page tree.

The reference delegates document structure to pdfminer's PDFParser/PDFDocument
(dedoc/readers/pdf_reader/pdf_txtlayer_reader/pdfminer_reader/
pdfminer_extractor.py:40-75); this module is a from-scratch equivalent of the
subset the text path needs:

- a tokenizer/parser for the 8 object types (booleans, numbers, strings with
  escapes, names with #-escapes, arrays, dicts, streams, null) + indirect refs;
- the cross-reference machinery: classic ``xref`` sections, PDF 1.5 xref
  STREAMS (/Type/XRef with /W field widths + PNG predictors), /Prev chains,
  hybrid /XRefStm, and compressed objects inside /Type/ObjStm streams;
- a brute-force object scan fallback for files with broken or absent xref
  (the same recovery pdfminer's ``fallback=True`` performs);
- the standard non-image stream filters: FlateDecode, LZWDecode,
  ASCIIHexDecode, ASCII85Decode, RunLengthDecode, with /DecodeParms
  predictors (PNG 10-15 and TIFF 2); DCT/JPX/CCITT/JBIG2 pass through raw
  (image payloads — decoded elsewhere);
- the /Root → /Pages tree walk with attribute inheritance (/Resources,
  /MediaBox, /Rotate) and /Contents concatenation;
- /Encrypt detection (raised as PdfEncrypted — the no-password subset).
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, Iterator, List, Optional, Tuple

__all__ = [
    "Name",
    "Ref",
    "Stream",
    "PdfError",
    "PdfEncrypted",
    "PdfDocument",
    "Lexer",
    "apply_filters",
]


class PdfError(ValueError):
    pass


class PdfEncrypted(PdfError):
    pass


class Name(str):
    """A PDF name object (/Foo) — distinct from decoded string content."""

    __slots__ = ()


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:
        return f"{self.num} {self.gen} R"

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Ref) and other.num == self.num and other.gen == self.gen

    def __hash__(self) -> int:
        return hash((self.num, self.gen))


class Stream:
    __slots__ = ("dict", "raw", "_decoded", "num", "gen")

    def __init__(self, d: Dict[str, Any], raw: bytes, num: int = 0, gen: int = 0) -> None:
        self.dict = d
        self.raw = raw
        self._decoded: Optional[bytes] = None
        self.num = num  # owning object number — per-object decryption key
        self.gen = gen


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_REGULAR_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")


class Lexer:
    """Token-level reader over raw PDF bytes. ``parse_object`` returns one
    complete object; bare keywords (content-stream operators, ``obj``,
    ``stream``…) come back as ``("kw", bytes)`` tuples so callers can
    dispatch."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        data, n = self.data, len(self.data)
        pos = self.pos
        while pos < n:
            c = data[pos]
            if c in _WS:
                pos += 1
            elif c == 0x25:  # % comment to EOL
                e = data.find(b"\n", pos)
                e2 = data.find(b"\r", pos)
                if e == -1 or (e2 != -1 and e2 < e):
                    e = e2
                pos = n if e == -1 else e + 1
            else:
                break
        self.pos = pos

    def at_end(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.data)

    def _parse_string(self) -> bytes:
        # '(' already consumed by caller? no — consume here
        data = self.data
        pos = self.pos + 1  # skip (
        depth = 1
        out = bytearray()
        n = len(data)
        while pos < n:
            c = data[pos]
            if c == 0x5C:  # backslash
                if pos + 1 >= n:
                    break
                nxt = data[pos + 1]
                if nxt in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[nxt])
                    pos += 2
                elif nxt in b"()\\":
                    out.append(nxt)
                    pos += 2
                elif 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                    j = pos + 1
                    val = 0
                    while j < min(pos + 4, n) and 0x30 <= data[j] <= 0x37:
                        val = val * 8 + (data[j] - 0x30)
                        j += 1
                    out.append(val & 0xFF)
                    pos = j
                elif nxt in b"\r\n":  # line continuation
                    pos += 2
                    if nxt == 0x0D and pos < n and data[pos] == 0x0A:
                        pos += 1
                else:
                    out.append(nxt)
                    pos += 2
            elif c == 0x28:
                depth += 1
                out.append(c)
                pos += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    pos += 1
                    break
                out.append(c)
                pos += 1
            else:
                out.append(c)
                pos += 1
        self.pos = pos
        return bytes(out)

    def _parse_hex_string(self) -> bytes:
        data = self.data
        end = data.find(b">", self.pos + 1)
        if end == -1:
            end = len(data)
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[self.pos + 1 : end])
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"
        try:
            return bytes.fromhex(hx.decode("ascii"))
        except ValueError:
            return b""

    def _parse_name(self) -> Name:
        m = _REGULAR_RE.match(self.data, self.pos + 1)
        raw = m.group(0) if m else b""
        self.pos = (m.end() if m else self.pos + 1)
        if b"#" in raw:
            raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda mm: bytes([int(mm.group(1), 16)]), raw)
        return Name(raw.decode("latin-1"))

    def parse_object(self) -> Any:
        """One object; keywords → ("kw", bytes). Raises PdfError at EOF."""
        self.skip_ws()
        data, pos = self.data, self.pos
        if pos >= len(data):
            raise PdfError("unexpected end of data")
        c = data[pos]
        if c == 0x28:  # (
            return self._parse_string()
        if c == 0x2F:  # /
            return self._parse_name()
        if c == 0x3C:  # < or <<
            if data[pos : pos + 2] == b"<<":
                return self._parse_dict()
            return self._parse_hex_string()
        if c == 0x5B:  # [
            self.pos = pos + 1
            arr: List[Any] = []
            self._parse_seq_into(arr, b"]")
            return arr
        if c == 0x5D:  # stray ]
            self.pos = pos + 1
            return ("kw", b"]")
        if c == 0x3E and data[pos : pos + 2] == b">>":  # stray >>
            self.pos = pos + 2
            return ("kw", b">>")
        if c == 0x7B or c == 0x7D:  # { } (PostScript functions) — skip
            self.pos = pos + 1
            return ("kw", data[pos : pos + 1])
        m = _NUM_RE.match(data, pos)
        if m and (c in b"+-.0123456789"):
            self.pos = m.end()
            tok = m.group(0)
            if b"." in tok:
                return float(tok)
            return int(tok)
        m = _REGULAR_RE.match(data, pos)
        if not m:
            self.pos = pos + 1
            return ("kw", data[pos : pos + 1])
        self.pos = m.end()
        kw = m.group(0)
        if kw == b"true":
            return True
        if kw == b"false":
            return False
        if kw == b"null":
            return None
        return ("kw", kw)

    def _parse_seq_into(self, out: List[Any], closer: bytes) -> None:
        """Parse objects until ``closer``; collapses NUM NUM R into Ref."""
        while True:
            self.skip_ws()
            if self.pos >= len(self.data):
                return
            if closer == b"]" and self.data[self.pos] == 0x5D:
                self.pos += 1
                return
            if closer == b">>" and self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return
            obj = self.parse_object()
            if isinstance(obj, tuple) and obj[0] == "kw":
                if obj[1] == b"R" and len(out) >= 2 and isinstance(out[-1], int) and isinstance(out[-2], int):
                    gen = out.pop()
                    num = out.pop()
                    out.append(Ref(num, gen))
                    continue
                # stray keyword inside a container — tolerate and drop
                continue
            out.append(obj)

    def _parse_dict(self) -> Dict[str, Any]:
        self.pos += 2  # <<
        items: List[Any] = []
        self._parse_seq_into(items, b">>")
        d: Dict[str, Any] = {}
        i = 0
        while i + 1 < len(items):
            k = items[i]
            if isinstance(k, Name):
                d[str(k)] = items[i + 1]
                i += 2
            else:
                i += 1
        return d

    def try_keyword(self, kw: bytes) -> bool:
        self.skip_ws()
        if self.data[self.pos : self.pos + len(kw)] == kw:
            self.pos += len(kw)
            return True
        return False


# --------------------------------------------------------------- filters


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    n = len(data)
    while pos < n:
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        if len(row) < rowlen:
            row.extend(b"\x00" * (rowlen - len(row)))
        pos += 1 + rowlen
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[i] = (row[i] + pred) & 0xFF
        out.extend(row)
        prev = row
    return bytes(out)


def _tiff_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    if bpc != 8:
        return data
    rowlen = columns * colors
    out = bytearray(data)
    for r in range(0, len(out) - rowlen + 1, rowlen):
        for i in range(colors, rowlen):
            out[r + i] = (out[r + i] + out[r + i - colors]) & 0xFF
    return bytes(out)


def _apply_predictor(data: bytes, parms: Dict[str, Any]) -> bytes:
    pred = parms.get("Predictor", 1)
    if not isinstance(pred, int) or pred <= 1:
        return data
    columns = parms.get("Columns", 1) or 1
    colors = parms.get("Colors", 1) or 1
    bpc = parms.get("BitsPerComponent", 8) or 8
    if pred == 2:
        return _tiff_unpredict(data, columns, colors, bpc)
    return _png_unpredict(data, columns, colors, bpc)


def _flate(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error:
        pass
    # tolerate trailing garbage / truncation
    try:
        d = zlib.decompressobj()
        return d.decompress(data)
    except zlib.error:
        pass
    try:  # raw deflate (missing zlib header)
        d = zlib.decompressobj(-15)
        return d.decompress(data)
    except zlib.error as e:
        raise PdfError(f"FlateDecode failed: {e}")


def _lzw(data: bytes, early: int = 1) -> bytes:
    """PDF LZWDecode (TIFF-style, MSB-first, 9→12-bit codes, EarlyChange)."""
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bits = 9
    acc = 0
    nbits = 0
    prev: Optional[bytes] = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (acc >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == 256:  # clear
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                bits = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out.extend(entry)
            prev = entry
            # EarlyChange=1 (TIFF rule): the decoder's table runs one entry
            # behind the encoder's, so widen at size 511/1023/2047
            if len(table) + (1 if early else 0) >= (1 << bits) and bits < 12:
                bits += 1
    return bytes(out)


def _ascii85(data: bytes) -> bytes:
    data = re.sub(rb"\s", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    end = data.find(b"~>")
    if end != -1:
        data = data[:end]
    out = bytearray()
    group: List[int] = []
    for ch in data:
        if ch == 0x7A and not group:  # 'z' = four zero bytes
            out.extend(b"\x00\x00\x00\x00")
            continue
        if not (0x21 <= ch <= 0x75):
            continue
        group.append(ch - 0x21)
        if len(group) == 5:
            val = 0
            for g in group:
                val = val * 85 + g
            out.extend(val.to_bytes(4, "big"))
            group = []
    if group:  # partial group: pad with 'u' (84), drop pad bytes
        k = len(group)
        group += [84] * (5 - k)
        val = 0
        for g in group:
            val = val * 85 + g
        out.extend(val.to_bytes(4, "big")[: k - 1])
    return bytes(out)


def _asciihex(data: bytes) -> bytes:
    end = data.find(b">")
    if end != -1:
        data = data[:end]
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _runlength(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        ln = data[i]
        if ln == 128:
            break
        if ln < 128:
            out.extend(data[i + 1 : i + 2 + ln])
            i += 2 + ln
        else:
            if i + 1 < n:
                out.extend(data[i + 1 : i + 2] * (257 - ln))
            i += 2
    return bytes(out)


_IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "CCITTFaxDecode", "CCF", "JBIG2Decode"}


def apply_filters(d: Dict[str, Any], raw: bytes, resolve=None) -> bytes:
    """Run the /Filter chain over ``raw``. Image codecs pass through
    untouched (their consumers decode). ``resolve`` maps Refs to objects."""
    res = resolve if resolve is not None else (lambda o: o)
    filters = res(d.get("Filter"))
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    parms = res(d.get("DecodeParms", d.get("DP")))
    if not isinstance(parms, list):
        parms = [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms):
        f = str(res(f)) if f is not None else ""
        p = res(p) or {}
        if not isinstance(p, dict):
            p = {}
        p = {k: res(v) for k, v in p.items()}
        if f in ("FlateDecode", "Fl"):
            data = _apply_predictor(_flate(data), p)
        elif f in ("LZWDecode", "LZW"):
            data = _apply_predictor(_lzw(data, p.get("EarlyChange", 1)), p)
        elif f in ("ASCIIHexDecode", "AHx"):
            data = _asciihex(data)
        elif f in ("ASCII85Decode", "A85"):
            data = _ascii85(data)
        elif f in ("RunLengthDecode", "RL"):
            data = _runlength(data)
        elif f in _IMAGE_FILTERS:
            return data  # image payload — caller decodes
        elif f == "Crypt":
            raise PdfEncrypted("stream with /Crypt filter")
        else:
            raise PdfError(f"unsupported stream filter {f}")
    return data


# ----------------------------------------------------------- the document

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_OBJ_HEAD_RE = re.compile(rb"(\d{1,10})\s+(\d{1,5})\s+obj\b")
_TRAILER_RE = re.compile(rb"trailer")


class PdfDocument:
    """Random-access object store + page tree over one PDF byte string."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        # objnum -> ("off", byte offset) | ("stm", container objnum, index)
        self.xref: Dict[int, Tuple] = {}
        self.trailer: Dict[str, Any] = {}
        self._cache: Dict[int, Any] = {}
        self._objstm_cache: Dict[int, Dict[int, Any]] = {}
        self._scanned = False
        self.handler = None
        self._encrypt_num = -1
        try:
            ok = self._load_xref_chain()
        except PdfEncrypted:
            raise
        except Exception:
            ok = False
        if not ok or "Root" not in self.trailer:
            self._scan_objects()
            if "Root" not in self.trailer:
                self._find_root_by_scan()
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is not None:
            # empty-user-password standard security handler (RC4 + AES-128,
            # readers/pdf_crypt.py) — the silently-readable subset; a real
            # password keeps the explicit error
            from dedoc_ray.readers.pdf_crypt import StandardSecurityHandler

            self._encrypt_num = enc_ref.num if isinstance(enc_ref, Ref) else -1
            enc = self.resolve(enc_ref)
            ids = self.trailer.get("ID")
            id0 = bytes(ids[0]) if isinstance(ids, list) and ids and isinstance(ids[0], bytes) else b""
            if not isinstance(enc, dict) or str(enc.get("Filter", "")) != "Standard":
                raise PdfEncrypted("PDF is encrypted (unsupported security handler)")
            if int(self.resolve(enc.get("V", 1)) or 1) >= 5:
                from dedoc_ray.readers.pdf_crypt import R6SecurityHandler

                handler = R6SecurityHandler(enc, self.resolve)
            else:
                handler = StandardSecurityHandler(enc, id0, self.resolve)
            if not handler.authenticate_empty_password():
                raise PdfEncrypted("PDF is encrypted (password required)")
            self.handler = handler
            self._cache.clear()  # re-read objects with string decryption on

    # -- xref machinery

    def _load_xref_chain(self) -> bool:
        tail = self.data[-2048:]
        m = None
        for m in _STARTXREF_RE.finditer(tail):
            pass
        if m is None:
            return False
        offset = int(m.group(1))
        seen = set()
        queue = [offset]
        loaded = False
        while queue and len(seen) < 64:
            off = queue.pop(0)
            if off in seen or not (0 <= off < len(self.data)):
                continue
            seen.add(off)
            lex = Lexer(self.data, off)
            lex.skip_ws()
            if lex.try_keyword(b"xref"):
                trailer = self._load_classic_xref(lex)
            else:
                trailer = self._load_xref_stream(off)
            if trailer is None:
                continue
            loaded = True
            for k, v in trailer.items():
                self.trailer.setdefault(k, v)
            for key in ("XRefStm", "Prev"):
                nxt = trailer.get(key)
                if isinstance(nxt, (int, float)):
                    queue.append(int(nxt))
        return loaded and bool(self.xref)

    def _load_classic_xref(self, lex: Lexer) -> Optional[Dict[str, Any]]:
        data = lex.data
        while True:
            lex.skip_ws()
            if lex.try_keyword(b"trailer"):
                obj = lex.parse_object()
                return obj if isinstance(obj, dict) else {}
            m = re.match(rb"(\d+)\s+(\d+)", data[lex.pos : lex.pos + 64])
            if not m:
                return {}
            start, count = int(m.group(1)), int(m.group(2))
            lex.pos += m.end()
            lex.skip_ws()
            # entries are nominally 20 bytes; tolerate loose whitespace
            ent = re.compile(rb"(\d{10})\s+(\d{5})\s+([nf])\s*")
            pos = lex.pos
            for i in range(count):
                em = ent.match(data, pos)
                if not em:
                    break
                pos = em.end()
                num = start + i
                if em.group(3) == b"n" and num not in self.xref:
                    self.xref[num] = ("off", int(em.group(1)))
            lex.pos = pos

    def _load_xref_stream(self, off: int) -> Optional[Dict[str, Any]]:
        try:
            num, obj = self._parse_indirect_at(off)
        except PdfError:
            return None
        if not isinstance(obj, Stream) or str(obj.dict.get("Type", "")) != "XRef":
            return None
        d = obj.dict
        data = apply_filters(d, obj.raw, self.resolve)
        w = [int(self.resolve(x)) for x in self.resolve(d.get("W", [1, 2, 1]))]
        size = int(self.resolve(d.get("Size", 0)))
        index = self.resolve(d.get("Index", [0, size]))
        index = [int(self.resolve(x)) for x in index]
        rowlen = sum(w)
        pos = 0
        for k in range(0, len(index) - 1, 2):
            start, count = index[k], index[k + 1]
            for i in range(count):
                if pos + rowlen > len(data):
                    break
                row = data[pos : pos + rowlen]
                pos += rowlen
                fields = []
                o = 0
                for width in w:
                    fields.append(int.from_bytes(row[o : o + width], "big") if width else None)
                    o += width
                ftype = fields[0] if w[0] else 1
                num = start + i
                if num in self.xref:
                    continue
                if ftype == 1:
                    self.xref[num] = ("off", fields[1] or 0)
                elif ftype == 2:
                    self.xref[num] = ("stm", fields[1] or 0, fields[2] or 0)
        return {k: v for k, v in d.items() if k in ("Root", "Info", "Encrypt", "Prev", "XRefStm", "Size", "ID")}

    def _scan_objects(self) -> None:
        """Brute-force recovery: map every ``N G obj`` in the file (last
        definition wins — incremental updates append) and pick up trailer
        dicts for /Root."""
        if self._scanned:
            return
        self._scanned = True
        for m in _OBJ_HEAD_RE.finditer(self.data):
            # reject matches inside streams heuristically? last-wins keeps
            # the newest incremental update, which is the valid one
            self.xref[int(m.group(1))] = ("off", m.start())
        for m in _TRAILER_RE.finditer(self.data):
            lex = Lexer(self.data, m.end())
            try:
                obj = lex.parse_object()
            except PdfError:
                continue
            if isinstance(obj, dict):
                for k, v in obj.items():
                    self.trailer.setdefault(k, v)
        # expand any object streams so their contents are addressable
        for num, entry in list(self.xref.items()):
            if entry[0] != "off":
                continue
            try:
                _, obj = self._parse_indirect_at(entry[1])
            except PdfError:
                continue
            if isinstance(obj, Stream) and str(obj.dict.get("Type", "")) == "ObjStm":
                self._cache[num] = obj
                try:
                    contents = self._load_objstm(num)
                except PdfError:
                    continue
                for inner_num, idx in contents.items():
                    self.xref.setdefault(inner_num, ("stm", num, idx))

    def _find_root_by_scan(self) -> None:
        for num in sorted(self.xref):
            try:
                obj = self.get_object(num)
            except PdfError:
                continue
            if isinstance(obj, dict) and str(obj.get("Type", "")) == "Catalog":
                self.trailer["Root"] = Ref(num, 0)
                return

    # -- object access

    def _parse_indirect_at(self, off: int) -> Tuple[int, Any]:
        lex = Lexer(self.data, off)
        lex.skip_ws()
        m = _OBJ_HEAD_RE.match(self.data, lex.pos)
        if not m:
            raise PdfError(f"no object header at offset {off}")
        num = int(m.group(1))
        lex.pos = m.end()
        obj = lex.parse_object()
        if isinstance(obj, tuple):
            raise PdfError("bad object body")
        # collapse `NUM NUM R` at top level
        if isinstance(obj, int):
            save = lex.pos
            try:
                second = lex.parse_object()
                if isinstance(second, int) and lex.try_keyword(b"R"):
                    return num, Ref(obj, second)
            except PdfError:
                pass
            lex.pos = save
        if isinstance(obj, dict) and lex.try_keyword(b"stream"):
            pos = lex.pos
            if self.data[pos : pos + 2] == b"\r\n":
                pos += 2
            elif pos < len(self.data) and self.data[pos] in b"\r\n":
                pos += 1
            length = self.resolve(obj.get("Length"))
            raw = None
            if isinstance(length, (int, float)) and length >= 0:
                end = pos + int(length)
                # trust /Length only if `endstream` actually follows it
                after = self.data[end : end + 20].lstrip(b"\r\n \t")
                if after.startswith(b"endstream"):
                    raw = self.data[pos:end]
            if raw is None:
                end = self.data.find(b"endstream", pos)
                if end == -1:
                    end = len(self.data)
                raw = self.data[pos:end].rstrip(b"\r\n")
            return num, Stream(obj, raw, num=num, gen=int(m.group(2)))
        return num, obj

    def _load_objstm(self, num: int) -> Dict[int, int]:
        """ObjStm container → {objnum: index}; parses and caches members."""
        if num in self._objstm_cache:
            return self._objstm_cache[num]
        container = self.get_object(num)
        if not isinstance(container, Stream):
            raise PdfError(f"object {num} is not an ObjStm")
        payload = self.stream_bytes(container)
        n = int(self.resolve(container.dict.get("N", 0)))
        first = int(self.resolve(container.dict.get("First", 0)))
        head = payload[:first].split()
        pairs: List[Tuple[int, int]] = []
        for i in range(0, min(len(head), 2 * n), 2):
            pairs.append((int(head[i]), int(head[i + 1])))
        index: Dict[int, int] = {}
        for idx, (objnum, off) in enumerate(pairs):
            index[objnum] = idx
            lex = Lexer(payload, first + off)
            try:
                self._cache.setdefault(objnum, lex.parse_object())
            except PdfError:
                pass
        self._objstm_cache[num] = index
        return index

    def get_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        entry = self.xref.get(num)
        obj: Any = None
        if entry is None:
            if not self._scanned:
                self._scan_objects()
                return self.get_object(num)
            return None
        if entry[0] == "off":
            try:
                got_num, obj = self._parse_indirect_at(entry[1])
                if got_num != num:
                    raise PdfError("xref offset points at wrong object")
                if getattr(self, "handler", None) is not None and num != getattr(self, "_encrypt_num", -1) \
                        and not isinstance(obj, Stream):
                    obj = self._decrypt_strings(obj, num, 0)
                elif getattr(self, "handler", None) is not None and isinstance(obj, Stream):
                    obj = self._decrypt_strings(obj, num, 0)  # dict strings
            except PdfError:
                if not self._scanned:
                    # broken xref entry — rebuild by scan and retry once
                    del self.xref[num]
                    self._scan_objects()
                    entry2 = self.xref.get(num)
                    if entry2 and entry2 != entry:
                        return self.get_object(num)
                obj = None
        else:  # inside an ObjStm
            try:
                self._load_objstm(entry[1])
            except PdfError:
                obj = None
            obj = self._cache.get(num)
        self._cache[num] = obj
        return obj

    def resolve(self, obj: Any, _depth: int = 0) -> Any:
        while isinstance(obj, Ref) and _depth < 32:
            obj = self.get_object(obj.num)
            _depth += 1
        return obj

    def stream_bytes(self, obj: Any) -> bytes:
        obj = self.resolve(obj)
        if not isinstance(obj, Stream):
            return b""
        if obj._decoded is None:
            raw = obj.raw
            # xref streams are never encrypted (they bootstrap decryption);
            # everything else decrypts with the per-object key first
            if self.handler is not None and str(obj.dict.get("Type", "")) != "XRef":
                raw = self.handler.decrypt(raw, obj.num, obj.gen)
            obj._decoded = apply_filters(obj.dict, raw, self.resolve)
        return obj._decoded

    def stream_raw(self, obj: Any) -> bytes:
        """Decrypted but UNFILTERED stream payload (image codec paths)."""
        obj = self.resolve(obj)
        if not isinstance(obj, Stream):
            return b""
        if self.handler is not None and str(obj.dict.get("Type", "")) != "XRef":
            return self.handler.decrypt(obj.raw, obj.num, obj.gen)
        return obj.raw

    def _decrypt_strings(self, obj: Any, num: int, gen: int, _depth: int = 0) -> Any:
        if _depth > 32 or self.handler is None:
            return obj
        if isinstance(obj, bytes):
            return self.handler.decrypt(obj, num, gen)
        if isinstance(obj, list):
            return [self._decrypt_strings(v, num, gen, _depth + 1) for v in obj]
        if isinstance(obj, dict):
            return {k: self._decrypt_strings(v, num, gen, _depth + 1) for k, v in obj.items()}
        if isinstance(obj, Stream):
            obj.dict = self._decrypt_strings(obj.dict, num, gen, _depth + 1)
            return obj
        return obj

    # -- page tree

    _INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")

    def pages(self) -> Iterator[Dict[str, Any]]:
        """Walk /Root → /Pages, yielding one merged dict per page leaf with
        inherited attributes filled in."""
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("no document catalog")
        top = self.resolve(root.get("Pages"))
        if not isinstance(top, dict):
            raise PdfError("catalog has no /Pages")
        visited = set()
        count = 0

        def walk(node: Dict[str, Any], inherited: Dict[str, Any]) -> Iterator[Dict[str, Any]]:
            nonlocal count
            nid = id(node)
            if nid in visited or count > 50000:
                return
            visited.add(nid)
            merged = dict(inherited)
            for k in self._INHERITABLE:
                if k in node:
                    merged[k] = node[k]
            ntype = str(self.resolve(node.get("Type", "")))
            kids = self.resolve(node.get("Kids"))
            if ntype == "Page" or (ntype != "Pages" and kids is None):
                count += 1
                page = dict(node)
                for k in self._INHERITABLE:
                    page.setdefault(k, merged.get(k))
                yield page
                return
            if isinstance(kids, list):
                for kid in kids:
                    kid = self.resolve(kid)
                    if isinstance(kid, dict):
                        yield from walk(kid, merged)

        yield from walk(top, {})

    def page_content(self, page: Dict[str, Any]) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, Stream):
            return self.stream_bytes(contents)
        if isinstance(contents, list):
            return b"\n".join(self.stream_bytes(c) for c in contents)
        return b""
