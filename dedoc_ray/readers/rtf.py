"""RTF kernel — native reader.

The reference converts .rtf via soffice→DOCX (docx_converter.py:8, binary
absent here); this is a NATIVE tokenizer for the RTF 1.x core: control
words, group nesting, destination skipping (fonttbl/stylesheet/info/pict…),
\\'xx byte escapes with the active code page, \\uN unicode with \\ucN
skip-counts, \\par/\\line paragraph breaks. Headings are not encoded in
plain RTF text (they're style references), so lines surface as raw text —
the same result dedoc's convert-to-docx path yields for generator-simple
RTF without style tables.
"""

from __future__ import annotations

import re
from typing import List

from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.readers.base import UnstructuredDoc

_CTRL_RE = re.compile(rb"\\([a-z]{1,32})(-?\d{1,10})? ?|\\([^a-z])|([{}])|([^\\{}]+)", re.DOTALL)

# destination groups whose content never becomes document text
_SKIP_DESTS = frozenset(
    b"fonttbl stylesheet colortbl info pict object header footer footnote "
    b"generator listtable listoverridetable themedata datastore".split()
)

_SPECIAL = {
    b"par": "\n",
    b"line": "\n",
    b"tab": "\t",
    b"emdash": "—",
    b"endash": "–",
    b"lquote": "‘",
    b"rquote": "’",
    b"ldblquote": "“",
    b"rdblquote": "”",
    b"bullet": "•",
    b"~": "\u00a0",
}


class BadRtfFile(ValueError):
    pass


def rtf_to_text(data: bytes) -> str:
    if not data.startswith(b"{\\rtf"):
        raise BadRtfFile("not an rtf document")
    out: List[str] = []
    depth = 0
    skip_until_depth = None  # inside a skipped destination group
    uc_skip = [1]  # per-group \ucN state (bytes to skip after \uN)
    pending_skip = 0
    codepage = "cp1252"
    for m in _CTRL_RE.finditer(data):
        word, num, esc, brace, text = m.group(1), m.group(2), m.group(3), m.group(4), m.group(5)
        if brace == b"{":
            depth += 1
            uc_skip.append(uc_skip[-1])
            continue
        if brace == b"}":
            depth -= 1
            if len(uc_skip) > 1:
                uc_skip.pop()
            if skip_until_depth is not None and depth < skip_until_depth:
                skip_until_depth = None
            continue
        if skip_until_depth is not None:
            continue
        if word is not None:
            if word in _SKIP_DESTS:
                skip_until_depth = depth
                continue
            if word == b"ansicpg" and num:
                codepage = f"cp{int(num)}"
                continue
            if word == b"uc" and num:
                uc_skip[-1] = int(num)
                continue
            if word == b"u" and num:
                cp = int(num)
                out.append(chr(cp + 65536 if cp < 0 else cp))
                pending_skip = uc_skip[-1]
                continue
            special = _SPECIAL.get(word)
            if special:
                out.append(special)
            continue
        if esc is not None:
            if esc == b"'":
                # \'xx — hex byte in the active code page; the two hex chars
                # arrive as the NEXT text run's head
                continue
            if esc == b"*":
                # {\*\dest ...} — ignorable destination: skip the whole
                # group unless a handler exists (we handle none beyond the
                # named skip list), per RTF 1.x spec §"\*"
                skip_until_depth = depth
                continue
            out.append(_SPECIAL.get(esc, esc.decode("latin-1")))
            continue
        if text:
            chunk = text
            # consume \'xx escapes left adjacent in raw byte stream
            while pending_skip > 0 and chunk:
                chunk = chunk[1:]
                pending_skip -= 1
            out.append(chunk.decode(codepage, errors="replace"))
    # second pass for \'xx: the regex above splits them oddly only when the
    # byte follows text; handle the canonical form with a dedicated pass
    joined = "".join(out)
    return joined


_HEX_RE = re.compile(rb"\\'([0-9a-fA-F]{2})")


def _decode_hex_escapes(data: bytes, codepage: str) -> bytes:
    return _HEX_RE.sub(lambda m: bytes([int(m.group(1), 16)]), data)


def read_rtf(data: bytes) -> UnstructuredDoc:
    cp_m = re.search(rb"\\ansicpg(\d+)", data[:256])
    codepage = f"cp{int(cp_m.group(1))}" if cp_m else "cp1252"
    text = rtf_to_text(_decode_hex_escapes(data, codepage))
    lines: List[LineWithMeta] = []
    for i, raw in enumerate(text.split("\n")):
        raw = raw.strip()
        if raw:
            lines.append(LineWithMeta(raw + "\n", metadata=LineMetadata(page_id=0, line_id=i)))
    if not lines:
        raise BadRtfFile("rtf with no text content")
    return UnstructuredDoc(lines=lines)
