"""PDF content-stream interpreter — char-accurate text extraction.

The reference runs pdfminer's PDFPageInterpreter + PDFPageAggregator with
LAParams(line_margin=1.5, line_overlap=0.5, boxes_flow=0.5, word_margin=0.1,
char_margin=3) (pdfminer_extractor.py:155-160). This module implements the
same pipeline from scratch on top of readers/pdf_objects.py:

- full text state machine (Tm/Tlm, Td/TD/T*/Tm, Tc/Tw/Tz/TL/Ts/Tf, q/Q/cm,
  BT/ET), glyph-advance tracking through font /Widths so every character
  carries its true device-space origin and width;
- the font model: simple fonts (/Encoding name or /BaseEncoding +
  /Differences over Standard/WinAnsi/MacRoman, AGL glyph names incl. the
  afii Cyrillic range), Type0/CID fonts (Identity-H, /DescendantFonts /W
  widths, /ToUnicode CMaps), missing-width defaults;
- Form XObject recursion (text inside /XObject /Subtype /Form — common in
  real-world writers);
- pdfminer-equivalent layout assembly: chars → baseline bands → fragments
  split at char_margin gaps (table cells become separate lines — the fix
  for interleaved column text), word_margin space insertion.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

from dedoc_ray.readers.pdf_objects import Name, PdfDocument, Stream

# ------------------------------------------------------------- encodings

# WinAnsiEncoding == cp1252 for all defined codes; MacRomanEncoding ==
# python's mac_roman; StandardEncoding is ASCII in 32..126 (with quoteright/
# quoteleft at 39/96) plus a small high range.
_WIN_ANSI: Dict[int, str] = {}
for _c in range(32, 256):
    try:
        _WIN_ANSI[_c] = bytes([_c]).decode("cp1252")
    except UnicodeDecodeError:
        pass
_MAC_ROMAN: Dict[int, str] = {}
for _c in range(32, 256):
    try:
        _MAC_ROMAN[_c] = bytes([_c]).decode("mac_roman")
    except UnicodeDecodeError:
        pass
_STANDARD: Dict[int, str] = {c: chr(c) for c in range(32, 127)}
_STANDARD.update({39: "’", 96: "‘", 0xA4: "/", 0xA6: "ƒ", 0xA8: "¤",
                  0xAA: "“", 0xB4: "·", 0xB9: "‘", 0xBA: "”",
                  0xBC: "…", 0xBD: "‰", 0xD0: "—", 0xD1: "–"})

# Adobe Glyph List subset: ASCII names, punctuation, common Latin extras,
# and the afii Cyrillic range (cp1251-era Russian PDFs name glyphs this way).
_AGL: Dict[str, str] = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#", "dollar": "$",
    "percent": "%", "ampersand": "&", "quotesingle": "'", "parenleft": "(",
    "parenright": ")", "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=", "greater": ">",
    "question": "?", "at": "@", "bracketleft": "[", "backslash": "\\",
    "bracketright": "]", "asciicircum": "^", "underscore": "_", "grave": "`",
    "braceleft": "{", "bar": "|", "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’", "quotedblleft": "“",
    "quotedblright": "”", "quotesinglbase": "‚", "quotedblbase": "„",
    "guillemotleft": "«", "guillemotright": "»", "guilsinglleft": "‹",
    "guilsinglright": "›", "endash": "–", "emdash": "—",
    "bullet": "•", "ellipsis": "…", "periodcentered": "·",
    "degree": "°", "section": "§", "paragraph": "¶",
    "copyright": "©", "registered": "®", "trademark": "™",
    "Euro": "€", "sterling": "£", "yen": "¥", "cent": "¢",
    "florin": "ƒ", "dagger": "†", "daggerdbl": "‡",
    "perthousand": "‰", "minus": "−", "multiply": "×",
    "divide": "÷", "plusminus": "±", "nbspace": " ",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ", "ffl": "ﬄ",
    "dotlessi": "ı", "OE": "Œ", "oe": "œ", "AE": "Æ",
    "ae": "æ", "oslash": "ø", "Oslash": "Ø", "eth": "ð",
    "thorn": "þ", "germandbls": "ß", "exclamdown": "¡",
    "questiondown": "¿", "brokenbar": "¦", "currency": "¤",
    "afii61352": "№",  # №
}
for _ch in "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz":
    _AGL[_ch] = _ch
# accented Latin: name = letter + accent suffix (AGL precomposed set)
for _base, _codes in {
    "grave": "àèìòù", "acute": "áéíóú", "circumflex": "âêîôû", "dieresis": "äëïöü",
}.items():
    for _letter, _u in zip("aeiou", _codes):
        _AGL[_letter + _base] = _u
        _AGL[(_letter + _base).capitalize()] = _u.upper()
for _nm, _u in {
    "ntilde": "ñ", "atilde": "ã", "otilde": "õ", "ccedilla": "ç",
    "ydieresis": "ÿ", "yacute": "ý", "aring": "å", "scaron": "š",
    "zcaron": "ž", "ccaron": "č", "lslash": "ł", "dotlessj": "ȷ",
}.items():
    _AGL[_nm] = _u
    _AGL[_nm.capitalize()] = _u.upper() if _u.upper() != _u else _u
_AGL["Yacute"] = "Ý"
# standalone accent glyphs (AGL spacing forms). TeX-era fonts (the Computer
# Modern OT1 layout in article.pdf-style papers) COMPOSE accents by
# overstriking these over the base letter; assemble_lines pairs an accent
# with the glyph it horizontally overlaps and emits the precomposed char.
for _nm, _u in {
    "grave": "`", "acute": "´", "circumflex": "ˆ", "tilde": "˜",
    "macron": "¯", "breve": "˘", "dotaccent": "˙", "dieresis": "¨",
    "ring": "˚", "hungarumlaut": "˝", "caron": "ˇ", "cedilla": "¸",
    "ogonek": "˛",
}.items():
    _AGL.setdefault(_nm, _u)

# Greek + math glyph names (AGL): TeX math fonts (CMMI/CMSY/CMEX) name
# their builtin codes this way — without them every μ/σ/Σ in a paper
# degrades to a C0 control char through the latin-1 fallback
_GREEK_LOWER = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho",
]
for _i, _nm in enumerate(_GREEK_LOWER):
    _AGL[_nm] = chr(0x03B1 + _i)
for _i, _nm in enumerate(["sigma", "tau", "upsilon", "phi", "chi", "psi", "omega"]):
    _AGL[_nm] = chr(0x03C3 + _i)  # skips final-sigma ς at 0x3C2
for _nm, _u in {
    "Gamma": "Γ", "Delta": "Δ", "Theta": "Θ", "Lambda": "Λ", "Xi": "Ξ",
    "Pi": "Π", "Sigma": "Σ", "Upsilon": "Υ", "Phi": "Φ", "Psi": "Ψ",
    "Omega": "Ω", "theta1": "ϑ", "phi1": "φ", "sigma1": "ς", "omega1": "ϖ",
    "epsilon1": "ε", "pi1": "ϖ", "rho1": "ϱ",
    "infinity": "∞", "partialdiff": "∂", "gradient": "∇", "nabla": "∇",
    "summation": "∑", "product": "∏", "integral": "∫", "radical": "√",
    "approxequal": "≈", "notequal": "≠", "equivalence": "≡",
    "lessequal": "≤", "greaterequal": "≥", "element": "∈", "notelement": "∉",
    "propersubset": "⊂", "propersuperset": "⊃", "reflexsubset": "⊆",
    "reflexsuperset": "⊇", "union": "∪", "intersection": "∩",
    "logicaland": "∧", "logicalor": "∨", "logicalnot": "¬",
    "arrowright": "→", "arrowleft": "←", "arrowup": "↑", "arrowdown": "↓",
    "arrowboth": "↔", "arrowdblright": "⇒", "arrowdblleft": "⇐",
    "arrowdblboth": "⇔", "asteriskmath": "∗", "circlemultiply": "⊗",
    "circleplus": "⊕", "emptyset": "∅", "angbracketleft": "⟨",
    "angbracketright": "⟩", "bardbl": "∥", "prime": "′",
    "similar": "∼", "similarequal": "≃", "congruent": "≅",
    "proportional": "∝", "perpendicular": "⊥", "star": "⋆",
    "diamondmath": "⋄", "dotmath": "⋅", "existential": "∃",
    "universal": "∀", "suchthat": "∋", "therefore": "∴",
    "lessmuch": "≪", "greatermuch": "≫", "approaches": "→",
    "braceex": "", "vextendsingle": "", "vextenddouble": "",
}.items():
    _AGL.setdefault(_nm, _u)

# spacing accent → combining mark for the overstrike composition pass
SPACING_TO_COMBINING: Dict[str, str] = {
    "`": "̀", "´": "́", "ˆ": "̂", "˜": "̃",
    "¯": "̄", "˘": "̆", "˙": "̇", "¨": "̈",
    "˚": "̊", "˝": "̋", "ˇ": "̌", "¸": "̧",
    "˛": "̨",
}
# afii Cyrillic (AGL): uppercase А..Е, Ё, Ж..Я then lowercase
for _k in range(6):
    _AGL[f"afii{10017 + _k}"] = chr(0x0410 + _k)
    _AGL[f"afii{10065 + _k}"] = chr(0x0430 + _k)
_AGL["afii10023"] = "Ё"  # Ё
_AGL["afii10071"] = "ё"  # ё
for _k in range(26):
    _AGL[f"afii{10024 + _k}"] = chr(0x0416 + _k)
    _AGL[f"afii{10072 + _k}"] = chr(0x0436 + _k)

_UNI_NAME_RE = re.compile(r"^uni([0-9A-Fa-f]{4})")
_U_NAME_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_to_unicode(name: str) -> Optional[str]:
    if name in _AGL:
        return _AGL[name]
    m = _UNI_NAME_RE.match(name)
    if m:
        return chr(int(m.group(1), 16))
    m = _U_NAME_RE.match(name)
    if m:
        cp = int(m.group(1), 16)
        if cp <= 0x10FFFF:
            return chr(cp)
    if len(name) == 1:
        return name
    return None


_BASE_ENCODINGS = {
    "WinAnsiEncoding": _WIN_ANSI,
    "MacRomanEncoding": _MAC_ROMAN,
    "StandardEncoding": _STANDARD,
    "MacExpertEncoding": _STANDARD,  # expert sets are symbol-only; approximate
}

# Type1 cleartext ``dup <code> /<glyph> put`` entries — the font program's
# builtin /Encoding array. A simple font with no /Encoding dict uses the
# builtin per the PDF spec; TeX Computer Modern subsets (no ToUnicode, no
# /Encoding — article.pdf) are unreadable without it (pdfminer reads the
# same array through its Type1FontHeaderParser).
_T1_DUP_RE = re.compile(rb"dup\s+(\d+)\s*/([A-Za-z0-9._]+)\s+put")


def _type1_builtin_encoding(doc: PdfDocument, d: Dict[str, Any]) -> Dict[int, str]:
    fd = doc.resolve(d.get("FontDescriptor"))
    if not isinstance(fd, dict):
        return {}
    ff = doc.resolve(fd.get("FontFile"))
    if ff is None:
        return {}
    try:
        raw = doc.stream_bytes(ff)
    except Exception:
        return {}
    # the encoding lives in the cleartext segment before eexec
    idx = raw.find(b"eexec")
    clear = raw[: idx if idx > 0 else min(len(raw), 4096)]
    enc_pos = clear.find(b"/Encoding")
    if enc_pos < 0:
        return {}
    out: Dict[int, str] = {}
    for m in _T1_DUP_RE.finditer(clear, enc_pos):
        code = int(m.group(1))
        if 0 <= code < 256:
            u = glyph_to_unicode(m.group(2).decode("latin-1"))
            if u is not None:
                out[code] = u
    return out


# ------------------------------------------------------------------ fonts


class Font:
    """Decoded view of one /Font resource: code bytes → (unicode, width)."""

    __slots__ = (
        "resource_name", "base_font", "subtype", "two_byte",
        "tounicode", "enc_map", "widths", "default_width", "bold", "italic",
    )

    def __init__(self, resource_name: str) -> None:
        self.resource_name = resource_name
        self.base_font = ""
        self.subtype = ""
        self.two_byte = False
        self.tounicode: Dict[int, str] = {}
        self.enc_map: Dict[int, str] = {}
        self.widths: Dict[int, float] = {}
        self.default_width = 500.0
        self.bold = False
        self.italic = False

    @property
    def display_name(self) -> str:
        """Font name for style annotations — BaseFont without the subset
        prefix (reference style annotation carries e.g. 'Helvetica-Bold')."""
        name = self.base_font or self.resource_name
        if len(name) > 7 and name[6] == "+" and name[:6].isupper():
            name = name[7:]
        return name

    @classmethod
    def build(cls, doc: PdfDocument, resource_name: str, font_obj: Any) -> "Font":
        from dedoc_ray.readers.pdf import _parse_cmap  # late: avoids cycle

        f = cls(resource_name)
        d = doc.resolve(font_obj)
        if not isinstance(d, dict):
            return f
        f.subtype = str(doc.resolve(d.get("Subtype", "")))
        f.base_font = str(doc.resolve(d.get("BaseFont", "")) or "")
        lowered = f.base_font.lower()
        f.bold = "bold" in lowered or "black" in lowered or "heavy" in lowered
        f.italic = "italic" in lowered or "oblique" in lowered

        tu = doc.resolve(d.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                f.tounicode = _parse_cmap(doc.stream_bytes(tu))
            except Exception:
                f.tounicode = {}

        if f.subtype == "Type0":
            f.two_byte = True  # Identity-H and the common UCS2 CMaps
            desc = doc.resolve(d.get("DescendantFonts"))
            if isinstance(desc, list) and desc:
                df = doc.resolve(desc[0])
                if isinstance(df, dict):
                    f.default_width = float(doc.resolve(df.get("DW", 1000)) or 1000)
                    f.widths = _parse_cid_widths(doc, doc.resolve(df.get("W")))
                    fd = doc.resolve(df.get("FontDescriptor"))
                    f._absorb_descriptor(doc, fd)
            else:
                f.default_width = 1000.0
            return f

        # simple font: 1-byte codes
        f._build_simple_encoding(doc, d)
        if not f.tounicode and f.subtype == "TrueType" and "Encoding" not in d:
            # symbolic subset with no unicode info at all (the printer-driver
            # "CIDFont+F" family): recover code→unicode by glyph-shape
            # matching against the DejaVu atlas (readers/ttf_glyphs.py)
            fd0 = doc.resolve(d.get("FontDescriptor"))
            if isinstance(fd0, dict):
                flags0 = doc.resolve(fd0.get("Flags"))
                ff = doc.resolve(fd0.get("FontFile2"))
                if ff is not None and isinstance(flags0, (int, float)) and int(flags0) & 4:
                    try:
                        from dedoc_ray.readers.ttf_glyphs import recover_cached

                        f.tounicode = recover_cached(doc.stream_bytes(ff))
                    except Exception:
                        pass
        first = doc.resolve(d.get("FirstChar"))
        widths = doc.resolve(d.get("Widths"))
        if isinstance(first, (int, float)) and isinstance(widths, list):
            fc = int(first)
            for i, w in enumerate(widths):
                w = doc.resolve(w)
                if isinstance(w, (int, float)):
                    f.widths[fc + i] = float(w)
        fd = doc.resolve(d.get("FontDescriptor"))
        f._absorb_descriptor(doc, fd)
        return f

    def _absorb_descriptor(self, doc: PdfDocument, fd: Any) -> None:
        if not isinstance(fd, dict):
            return
        mw = doc.resolve(fd.get("MissingWidth"))
        if isinstance(mw, (int, float)) and mw > 0:
            self.default_width = float(mw)
        flags = doc.resolve(fd.get("Flags"))
        if isinstance(flags, (int, float)):
            flags = int(flags)
            if flags & (1 << 18):  # ForceBold
                self.bold = True
            if flags & (1 << 6):  # Italic
                self.italic = True
        sw = doc.resolve(fd.get("StemV"))
        if isinstance(sw, (int, float)) and sw >= 140:
            self.bold = True

    def _build_simple_encoding(self, doc: PdfDocument, d: Dict[str, Any]) -> None:
        symbolic = False
        fd = doc.resolve(d.get("FontDescriptor"))
        if isinstance(fd, dict):
            flags = doc.resolve(fd.get("Flags"))
            if isinstance(flags, (int, float)) and int(flags) & 4:
                symbolic = True
        base = _STANDARD if symbolic else _STANDARD
        enc = doc.resolve(d.get("Encoding"))
        if enc is None or isinstance(enc, dict):
            # no explicit /Encoding (or Differences with no BaseEncoding):
            # the font program's builtin encoding is the base (PDF 9.6.6)
            builtin = _type1_builtin_encoding(doc, d)
            if builtin:
                base = dict(_STANDARD)
                base.update(builtin)
        if isinstance(enc, Name) or isinstance(enc, str) and not isinstance(enc, dict):
            base = _BASE_ENCODINGS.get(str(enc), base)
            self.enc_map = dict(base)
            return
        if isinstance(enc, dict):
            base_name = str(doc.resolve(enc.get("BaseEncoding", "")) or "")
            base = _BASE_ENCODINGS.get(base_name, base)
            self.enc_map = dict(base)
            diffs = doc.resolve(enc.get("Differences"))
            if isinstance(diffs, list):
                code = 0
                for item in diffs:
                    item = doc.resolve(item)
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, (Name, str)):
                        u = glyph_to_unicode(str(item))
                        if u is not None:
                            self.enc_map[code] = u
                        code += 1
            return
        self.enc_map = dict(base)

    def decode(self, raw: bytes) -> List[Tuple[str, float, bool]]:
        """→ [(unicode text, width in glyph units, is_space_code)] per glyph."""
        out: List[Tuple[str, float, bool]] = []
        if self.two_byte:
            if len(raw) % 2:
                raw += b"\x00"
            for i in range(0, len(raw), 2):
                code = (raw[i] << 8) | raw[i + 1]
                u = self.tounicode.get(code)
                if u is None:
                    u = "�"
                out.append((u, self.widths.get(code, self.default_width), code == 32))
            return out
        for b in raw:
            u = self.tounicode.get(b)
            if u is None:
                u = self.enc_map.get(b)
            if u is None:
                # unmapped code: never leak a C0/C1 control char into the
                # corpus text (pdfminer's analogue is "(cid:N)")
                u = bytes([b]).decode("latin-1")
                if u != "\t" and (ord(u) < 32 or 0x7F <= ord(u) < 0xA0):
                    u = "�"
            out.append((u, self.widths.get(b, self.default_width), b == 32))
        return out


def _parse_cid_widths(doc: PdfDocument, w: Any) -> Dict[int, float]:
    """/W array: c [w1 w2 ...]  |  cFirst cLast w."""
    widths: Dict[int, float] = {}
    if not isinstance(w, list):
        return widths
    i = 0
    n = len(w)
    while i < n:
        c = doc.resolve(w[i])
        if not isinstance(c, (int, float)):
            i += 1
            continue
        if i + 1 < n:
            nxt = doc.resolve(w[i + 1])
            if isinstance(nxt, list):
                for j, ww in enumerate(nxt):
                    ww = doc.resolve(ww)
                    if isinstance(ww, (int, float)):
                        widths[int(c) + j] = float(ww)
                i += 2
                continue
            if isinstance(nxt, (int, float)) and i + 2 < n:
                ww = doc.resolve(w[i + 2])
                if isinstance(ww, (int, float)):
                    for code in range(int(c), min(int(nxt), int(c) + 65536) + 1):
                        widths[code] = float(ww)
                i += 3
                continue
        i += 1
    return widths


# ------------------------------------------------------------ interpreter

Matrix = Tuple[float, float, float, float, float, float]
_IDENTITY: Matrix = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mmul(m1: Matrix, m2: Matrix) -> Matrix:
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _apply(m: Matrix, x: float, y: float) -> Tuple[float, float]:
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


class TextChar:
    __slots__ = ("x0", "x1", "y", "size", "font", "text")

    def __init__(self, x0: float, x1: float, y: float, size: float, font: Font, text: str) -> None:
        self.x0 = x0
        self.x1 = x1
        self.y = y
        self.size = size
        self.font = font
        self.text = text


class _GState:
    __slots__ = ("ctm", "char_sp", "word_sp", "scale", "leading", "rise", "font", "size")

    def __init__(self) -> None:
        self.ctm: Matrix = _IDENTITY
        self.char_sp = 0.0
        self.word_sp = 0.0
        self.scale = 100.0
        self.leading = 0.0
        self.rise = 0.0
        self.font: Optional[Font] = None
        self.size = 0.0

    def clone(self) -> "_GState":
        g = _GState()
        for s in self.__slots__:
            setattr(g, s, getattr(self, s))
        return g


_FALLBACK_FONT = Font("")
_BI_EI_RE = re.compile(rb"\bEI\b")


def interpret_page(
    doc: PdfDocument,
    content: bytes,
    resources: Any,
    ctm: Matrix = _IDENTITY,
    _depth: int = 0,
) -> List[TextChar]:
    """Run one content stream, recursing into Form XObjects; → chars."""
    from dedoc_ray.readers.pdf_objects import Lexer, PdfError

    resources = doc.resolve(resources) or {}
    font_dict = doc.resolve(resources.get("Font")) if isinstance(resources, dict) else {}
    if not isinstance(font_dict, dict):
        font_dict = {}
    xobjects = doc.resolve(resources.get("XObject")) if isinstance(resources, dict) else {}
    if not isinstance(xobjects, dict):
        xobjects = {}
    fonts: Dict[str, Font] = {}

    def get_font(name: str) -> Font:
        if name not in fonts:
            if name in font_dict:
                fonts[name] = Font.build(doc, name, font_dict[name])
            else:
                f = Font(name)
                f.bold = "bold" in name.lower()
                fonts[name] = f
        return fonts[name]

    chars: List[TextChar] = []
    gs = _GState()
    gs.ctm = ctm
    stack: List[_GState] = []
    tm: Matrix = _IDENTITY
    tlm: Matrix = _IDENTITY
    operands: List[Any] = []
    lex = Lexer(content)

    def show(raw: bytes) -> None:
        nonlocal tm
        font = gs.font or _FALLBACK_FONT
        trm0 = _mmul((gs.size * gs.scale / 100.0, 0.0, 0.0, gs.size, 0.0, gs.rise), _mmul(tm, gs.ctm))
        # device font size ≈ vertical scale of the composed matrix
        size_dev = abs(gs.size) * (abs(_mmul(tm, gs.ctm)[3]) or 1.0)
        for u, w0, is_space in font.decode(raw):
            adv = (w0 / 1000.0 * gs.size + gs.char_sp + (gs.word_sp if is_space else 0.0)) * gs.scale / 100.0
            x0, y0 = _apply(_mmul(tm, gs.ctm), 0.0, gs.rise)
            tm = _mmul((1.0, 0.0, 0.0, 1.0, adv, 0.0), tm)
            x1, _ = _apply(_mmul(tm, gs.ctm), 0.0, gs.rise)
            if u and u not in ("\x00",):
                chars.append(TextChar(x0, min(x0, x1) + abs(x1 - x0), y0, size_dev, font, u))

    def tj_adjust(n: float) -> None:
        nonlocal tm
        adv = -n / 1000.0 * gs.size * gs.scale / 100.0
        tm = _mmul((1.0, 0.0, 0.0, 1.0, adv, 0.0), tm)

    while True:
        lex.skip_ws()
        if lex.pos >= len(content):
            break
        try:
            obj = lex.parse_object()
        except PdfError:
            break
        if not (isinstance(obj, tuple) and obj and obj[0] == "kw"):
            operands.append(obj)
            if len(operands) > 64:
                operands = operands[-16:]
            continue
        op = obj[1]
        try:
            if op == b"q":
                stack.append(gs.clone())
            elif op == b"Q":
                if stack:
                    gs = stack.pop()
            elif op == b"cm" and len(operands) >= 6:
                nums = [float(v) for v in operands[-6:]]
                gs.ctm = _mmul(tuple(nums), gs.ctm)
            elif op == b"BT":
                tm = tlm = _IDENTITY
            elif op == b"Td" and len(operands) >= 2:
                tlm = _mmul((1.0, 0.0, 0.0, 1.0, float(operands[-2]), float(operands[-1])), tlm)
                tm = tlm
            elif op == b"TD" and len(operands) >= 2:
                gs.leading = -float(operands[-1])
                tlm = _mmul((1.0, 0.0, 0.0, 1.0, float(operands[-2]), float(operands[-1])), tlm)
                tm = tlm
            elif op == b"Tm" and len(operands) >= 6:
                tlm = tm = tuple(float(v) for v in operands[-6:])
            elif op == b"T*":
                tlm = _mmul((1.0, 0.0, 0.0, 1.0, 0.0, -gs.leading), tlm)
                tm = tlm
            elif op == b"TL" and operands:
                gs.leading = float(operands[-1])
            elif op == b"Tc" and operands:
                gs.char_sp = float(operands[-1])
            elif op == b"Tw" and operands:
                gs.word_sp = float(operands[-1])
            elif op == b"Tz" and operands:
                gs.scale = float(operands[-1])
            elif op == b"Ts" and operands:
                gs.rise = float(operands[-1])
            elif op == b"Tf" and len(operands) >= 2 and isinstance(operands[-2], (Name, str)):
                gs.font = get_font(str(operands[-2]))
                gs.size = float(operands[-1])
            elif op == b"Tj" and operands and isinstance(operands[-1], bytes):
                show(operands[-1])
            elif op == b"'" and operands and isinstance(operands[-1], bytes):
                tlm = _mmul((1.0, 0.0, 0.0, 1.0, 0.0, -gs.leading), tlm)
                tm = tlm
                show(operands[-1])
            elif op == b'"' and len(operands) >= 3 and isinstance(operands[-1], bytes):
                gs.word_sp = float(operands[-3])
                gs.char_sp = float(operands[-2])
                tlm = _mmul((1.0, 0.0, 0.0, 1.0, 0.0, -gs.leading), tlm)
                tm = tlm
                show(operands[-1])
            elif op == b"TJ" and operands and isinstance(operands[-1], list):
                for el in operands[-1]:
                    if isinstance(el, bytes):
                        show(el)
                    elif isinstance(el, (int, float)):
                        tj_adjust(float(el))
            elif op == b"Do" and operands and isinstance(operands[-1], (Name, str)) and _depth < 8:
                xo = doc.resolve(xobjects.get(str(operands[-1])))
                if isinstance(xo, Stream) and str(doc.resolve(xo.dict.get("Subtype", ""))) == "Form":
                    mtx = doc.resolve(xo.dict.get("Matrix"))
                    form_ctm = gs.ctm
                    if isinstance(mtx, list) and len(mtx) == 6:
                        form_ctm = _mmul(tuple(float(doc.resolve(v)) for v in mtx), gs.ctm)
                    form_res = xo.dict.get("Resources") or resources
                    try:
                        chars.extend(
                            interpret_page(doc, doc.stream_bytes(xo), form_res, form_ctm, _depth + 1)
                        )
                    except Exception:
                        pass
            elif op == b"BI":
                # inline image: skip to EI (whitespace-delimited)
                m = _BI_EI_RE.search(content, lex.pos)
                lex.pos = m.end() if m else len(content)
        except (TypeError, ValueError):
            pass
        operands = []
    return chars


# --------------------------------------------------------------- assembly

_WORD_MARGIN = 0.1   # reference LAParams word_margin
_CHAR_MARGIN = 3.0   # reference LAParams char_margin
_LINE_TOL_FRAC = 0.5  # baseline tolerance as a fraction of font size


def _compose_accents(frag: List[TextChar]) -> List[TextChar]:
    """TeX-style overstrike composition: a spacing accent glyph whose x-range
    overlaps an adjacent glyph decorates THAT glyph — replace the pair with
    the NFC-precomposed character ('Bela' + dieresis + dotlessi + 'd' →
    'Belaïd'). Accents with no overlapping neighbour (a genuine standalone
    '¨'/'ˇ') pass through unchanged."""
    if not any(c.text in SPACING_TO_COMBINING for c in frag):
        return frag
    import unicodedata

    def overlap(a: TextChar, b: TextChar) -> float:
        lo, hi = max(a.x0, b.x0), min(a.x1, b.x1)
        return hi - lo

    def base_text(t: str, comb: str) -> str:
        # above-accents compose over the DOTLESS forms in TeX ('ı'+¨ → ï);
        # unicode precomposes from the dotted letter instead
        if comb not in ("̧", "̨") and t in ("ı", "ȷ"):
            return "i" if t == "ı" else "j"
        return t

    out: List[TextChar] = []
    i = 0
    n = len(frag)
    while i < n:
        ch = frag[i]
        if ch.text in SPACING_TO_COMBINING:
            comb = SPACING_TO_COMBINING[ch.text]
            prev_c = out[-1] if out else None
            next_c = frag[i + 1] if i + 1 < n else None
            ov_prev = overlap(ch, prev_c) if prev_c is not None and len(prev_c.text) == 1 else -1.0
            ov_next = overlap(ch, next_c) if next_c is not None and len(next_c.text) == 1 else -1.0
            need = 0.25 * max(ch.x1 - ch.x0, 0.1)  # real overstrike, not kerning touch
            base_ch = None
            if ov_next >= ov_prev and ov_next > need:
                base_ch = next_c
                i += 1  # consume the base; accent merges into it
                composed = unicodedata.normalize("NFC", base_text(base_ch.text, comb) + comb)
                out.append(TextChar(base_ch.x0, base_ch.x1, base_ch.y, base_ch.size, base_ch.font, composed))
            elif ov_prev > need:
                base_ch = out[-1]
                composed = unicodedata.normalize("NFC", base_text(base_ch.text, comb) + comb)
                out[-1] = TextChar(base_ch.x0, base_ch.x1, base_ch.y, base_ch.size, base_ch.font, composed)
            if base_ch is None:
                out.append(ch)
        else:
            out.append(ch)
        i += 1
    return out


def assemble_lines(chars: List[TextChar]) -> List[tuple]:
    """Chars → line tuples (x0, y, font_display_name, size, text, runs)
    where ``runs`` is a tuple of (start, end, font, size) spans over the
    text — a superset of pdf.py's op-level 5-tuple shape (indices 0-4 are
    compatible; consumers slice ``[:5]``). Splits fragments at char_margin
    gaps (separate table cells stay separate lines) and inserts spaces at
    word_margin gaps."""
    if not chars:
        return []
    # 1. baseline bands
    chars_sorted = sorted(chars, key=lambda c: (-c.y, c.x0))
    bands: List[List[TextChar]] = []
    band_y = 0.0
    for ch in chars_sorted:
        tol = max(2.0, _LINE_TOL_FRAC * max(ch.size, 1.0))
        if bands and abs(band_y - ch.y) <= tol:
            bands[-1].append(ch)
        else:
            bands.append([ch])
            band_y = ch.y
    lines: List[Tuple[float, float, str, float, str]] = []
    for band in bands:
        band.sort(key=lambda c: (c.x0, c.x1))
        # 2. split into fragments at char_margin gaps
        frags: List[List[TextChar]] = [[band[0]]]
        for prev, ch in zip(band, band[1:]):
            ref = max(prev.x1 - prev.x0, ch.x1 - ch.x0, 0.3 * max(ch.size, 1.0))
            if ch.x0 - prev.x1 > _CHAR_MARGIN * ref:
                frags.append([ch])
            else:
                frags[-1].append(ch)
        for frag in frags:
            frag = _compose_accents(frag)
            parts: List[str] = []
            prev: Optional[TextChar] = None
            # per-run font/size spans over the assembled text (reference:
            # pdfminer LTChar runs → per-span style/size annotations,
            # test_api_format_pdf_with_text.py:40-81)
            runs: List[Tuple[int, int, str, float]] = []
            pos = 0
            run_start = 0
            run_font: Optional[str] = None
            run_size = 0.0
            for ch in frag:
                if prev is not None:
                    margin = _WORD_MARGIN * max(ch.x1 - ch.x0, ch.size, 1.0)
                    if ch.x0 - prev.x1 > margin and parts and not parts[-1].endswith(" ") and ch.text != " ":
                        parts.append(" ")
                        pos += 1
                ch_font = ch.font.display_name or ch.font.resource_name
                if run_font is None:
                    run_font, run_size, run_start = ch_font, ch.size, pos
                elif ch_font != run_font or abs(ch.size - run_size) > 0.01:
                    runs.append((run_start, pos, run_font, round(run_size, 2)))
                    run_font, run_size, run_start = ch_font, ch.size, pos
                parts.append(ch.text)
                pos += len(ch.text)
                prev = ch
            if run_font is not None:
                runs.append((run_start, pos, run_font, round(run_size, 2)))
            text = "".join(parts)
            if not text.strip():
                continue
            first = frag[0]
            size = max(c.size for c in frag)
            # round sizes the way the Tf operand reads (pdfminer reports
            # the device size; .1f keeps 18.0004 → 18.0 style values)
            size = round(size, 2)
            bold_frac = sum(1 for c in frag if c.font.bold) / len(frag)
            fname = first.font.display_name or first.font.resource_name
            if bold_frac > 0.5 and "bold" not in fname.lower():
                fname = fname + "-Bold" if fname else "Bold"
            lines.append((first.x0, first.y, fname, size, text, tuple(runs)))
    return lines
