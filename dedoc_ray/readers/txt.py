"""Plain-text kernel.

Replicates dedoc/readers/txt_reader/raw_text_reader.py:54-130 on a bytes
payload: line iteration with NFC normalization and the "й" recompose quirk
(raw_text_reader.py:90-100), spacing/indentation annotations, and paragraph
detection by indent delta >= 2 (can_be_multiline flag).

Supports an optional gzip payload (".txt.gz" analogue) via magic-byte sniff.
"""

from __future__ import annotations

import gzip
import hashlib
import re
from typing import List, Optional
from unicodedata import normalize

from dedoc_ray.core.annotation import Annotation, AnnotationNames as AN
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.readers.base import UnstructuredDoc

_SPACE_REGEX = re.compile(r"^\s+")


def _native_detect(data: bytes, default: str = "utf-8") -> str:
    """Stdlib-only charset detection: BOMs, then strict-utf-8, then a
    letter-frequency vote across the common single-byte Cyrillic code pages
    (the reference reaches the same set through chardet —
    dedoc/utils/utils.py:196-213). Used when charset_normalizer is absent."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if data[:4] in (b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff"):
        return "utf-32"
    if data[:2] == b"\xff\xfe":
        return "utf-16-le"
    if data[:2] == b"\xfe\xff":
        return "utf-16-be"
    sample = data[:65536]
    try:
        sample.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    best_enc, best_score = default, -1.0
    for enc in ("cp1251", "koi8-r", "cp866", "iso-8859-5", "cp1252"):
        try:
            text = sample.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
        # score: fraction of non-ascii chars that land on Cyrillic letters
        # (or Latin-1 letters for cp1252), penalize control chars
        hi = [c for c in text if ord(c) > 127]
        if not hi:
            return "utf-8"
        good = sum(1 for c in hi if "Ѐ" <= c <= "џ" or c in "—–«»“”…№" or "À" <= c <= "ÿ")
        ctrl = sum(1 for c in text if ord(c) < 32 and c not in "\r\n\t\f")
        score = good / len(hi) - 0.05 * ctrl
        if score > best_score:
            best_enc, best_score = enc, score
    return best_enc


def _detect_encoding(data: bytes, default: str = "utf-8") -> str:
    # valid strict UTF-8 with no UTF-16/32 BOM IS utf-8 — statistical
    # detectors occasionally misfile symbol-heavy utf-8 (e.g. as cp932)
    if data[:2] not in (b"\xff\xfe", b"\xfe\xff") and b"\x00" not in data[:4096]:
        try:
            data[:65536].decode("utf-8")
            return "utf-8"
        except UnicodeDecodeError as e:
            if e.start >= 65532:  # multibyte char split at the sample edge
                return "utf-8"
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(data).best()
        if best is not None and best.encoding:
            return best.encoding
    except Exception:
        pass
    return _native_detect(data, default)


def _starting_spacing(line: Optional[str]) -> int:
    if line is None or (line != "" and line.isspace()):
        return 0
    m = _SPACE_REGEX.match(line.replace("\t", "    "))
    return 0 if m is None else m.end() - m.start()


def _indent_annotation(line: str) -> Annotation:
    m = _SPACE_REGEX.match(line)
    if m is None:
        return Annotation(0, len(line), AN.indentation, "0")
    space_cnt = sum(3 if ch == "\t" else 1 for ch in m.group())
    return Annotation(0, len(line), AN.indentation, str(211 * space_cnt))


def read_txt(data: bytes, encoding: Optional[str] = None) -> UnstructuredDoc:
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    elif data[:3] == b"BZh":
        import bz2

        data = bz2.decompress(data)
    elif data[:6] == b"\xfd7zXZ\x00":
        import lzma

        data = lzma.decompress(data)
    enc = encoding or _detect_encoding(data)
    file_hash = hashlib.md5(data).hexdigest()
    try:
        text = data.decode(enc, errors="ignore")
    except LookupError:
        text = data.decode("utf-8", errors="ignore")
    if text[:1] == "﻿":  # strip the BOM the decoder surfaced as U+FEFF
        text = text[1:]

    lines: List[LineWithMeta] = []
    number_of_empty_lines = 0
    for line_id, raw in enumerate(text.splitlines(keepends=True)):
        line = normalize("NFC", raw).replace("й", "й")  # recompose quirk (raw_text_reader.py:96)
        metadata = LineMetadata(page_id=0, line_id=line_id, tag_hierarchy_level=HierarchyLevel.create_unknown())
        spacing_value = str(int(100 * (0.5 if number_of_empty_lines == 0 else number_of_empty_lines)))
        annotations = [Annotation(0, len(line), AN.spacing, spacing_value), _indent_annotation(line)]
        lines.append(LineWithMeta(line=line, metadata=metadata, annotations=annotations, uid=f"txt_{file_hash}_{line_id}"))
        number_of_empty_lines = number_of_empty_lines + 1 if line.isspace() else 0

    # paragraph detection: indent jump >= 2 vs previous line ⇒ new paragraph
    previous: Optional[str] = None
    for line in lines:
        space_this = _starting_spacing(line.line)
        space_prev = _starting_spacing(previous)
        is_paragraph = not line.line.isspace() and line.line != "" and space_this - space_prev >= 2
        line.metadata.tag_hierarchy_level.can_be_multiline = not is_paragraph
        previous = line.line

    return UnstructuredDoc(lines=lines, warnings=[f"encoding is {enc}"])
