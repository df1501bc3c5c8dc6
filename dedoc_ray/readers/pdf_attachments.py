"""PDF embedded-file attachment extraction (text-layer object scan).

Reference parity: dedoc's ``PDFAttachmentsExtractor``
(dedoc/attachments_extractors/concrete_attachments_extractors/
pdf_attachments_extractor.py:17-110) walks two routes with PyPDF2 —

  1. root attachments: ``/Root → /Names → /EmbeddedFiles`` name tree,
     each entry a ``/Filespec`` whose ``/EF /F`` stream is the payload;
  2. page-level ``/Annots`` with ``/Subtype /FileAttachment`` whose
     ``/FS`` points at the same Filespec shape.

This module implements the same two routes over a direct object scan of
the PDF byte stream (``N 0 obj … endobj``), consistent with the rest of
our from-scratch PDF reader (readers/pdf.py) — no PyPDF2. Documented
subset: direct (non-encrypted, non-objstm) objects, names as literal
strings, ``/EF /F`` as an indirect stream reference, optional
``/FlateDecode``. Filespecs reachable from both routes are deduplicated
by object number, mirroring the reference's effective behavior where a
file appears once per distinct Filespec.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Tuple

_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_NAME_RE = re.compile(rb"/(?:UF|F)\s*\(((?:[^()\\]|\\.)*)\)")
_EF_RE = re.compile(rb"/EF\s*<<[^>]*?/F\s+(\d+)\s+0\s+R")
_EMBEDDED_NAMES_RE = re.compile(
    rb"/EmbeddedFiles\s*<<[^>]*?/Names\s*\[(.*?)\]", re.DOTALL
)
_NAMES_PAIR_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s+(\d+)\s+0\s+R")
_FS_REF_RE = re.compile(rb"/FS\s+(\d+)\s+0\s+R")


def _pdf_string(raw: bytes) -> str:
    """Literal-string unescape (subset: \\(, \\), \\\\)."""
    return (
        raw.replace(rb"\(", b"(").replace(rb"\)", b")").replace(rb"\\", b"\\")
    ).decode("utf-8", errors="replace")


def _objects(data: bytes) -> Dict[int, bytes]:
    return {int(m.group(1)): m.group(2) for m in _OBJ_RE.finditer(data)}


def _stream_payload(body: bytes) -> bytes:
    m = _STREAM_RE.search(body)
    if m is None:
        return b""
    payload = m.group(1)
    if b"/FlateDecode" in body.split(b"stream", 1)[0]:
        try:
            payload = zlib.decompress(payload)
        except zlib.error:
            return b""  # corrupt filter: fail closed, drop the attachment
    return payload


def _filespec_attachment(num: int, objs: Dict[int, bytes]) -> Tuple[str, bytes] | None:
    body = objs.get(num)
    if body is None:
        return None
    ef = _EF_RE.search(body)
    if ef is None:
        return None
    stream_obj = objs.get(int(ef.group(1)))
    if stream_obj is None:
        return None
    name_m = _NAME_RE.search(body)  # /UF wins over /F by regex alternation order
    name = _pdf_string(name_m.group(1)) if name_m else f"attachment_{num}"
    return name, _stream_payload(stream_obj)


def extract_pdf_attachments(data: bytes) -> List[Tuple[str, int, bytes]]:
    """All embedded files of a PDF as (name, size, payload) tuples.

    Root EmbeddedFiles entries first (document order), then page-level
    FileAttachment annotations, skipping Filespecs already emitted."""
    objs = _objects(data)
    out: List[Tuple[str, int, bytes]] = []
    seen: set = set()

    for body in objs.values():
        names_m = _EMBEDDED_NAMES_RE.search(body)
        if names_m is None:
            continue
        for pair in _NAMES_PAIR_RE.finditer(names_m.group(1)):
            fs_num = int(pair.group(2))
            if fs_num in seen:
                continue
            att = _filespec_attachment(fs_num, objs)
            if att is not None:
                seen.add(fs_num)
                out.append((att[0], len(att[1]), att[1]))

    for body in objs.values():
        if b"/FileAttachment" not in body:
            continue
        fs_m = _FS_REF_RE.search(body)
        if fs_m is None:
            continue
        fs_num = int(fs_m.group(1))
        if fs_num in seen:
            continue
        att = _filespec_attachment(fs_num, objs)
        if att is not None:
            seen.add(fs_num)
            out.append((att[0], len(att[1]), att[1]))
    return out
