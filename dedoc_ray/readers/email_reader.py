"""Email (.eml) and MHTML kernels — stdlib ``email`` package.

Reference semantics:

- eml: dedoc/readers/email_reader/email_reader.py:10-217 — walk MIME parts;
  text/plain parts become lines, text/html parts are delegated to the HTML
  reader; the subject becomes a header line; non-text parts are recorded as
  attachments (the reference writes them to disk + a header-fields json
  attachment; our rows carry (name, size) entries instead — attachments-as-
  files are out of scope for the web corpus, SURVEY.md §3 note).
- mhtml: dedoc/readers/mhtml_reader/mhtml_reader.py:8-141 — MIME unpack,
  every text/html part is parsed by the HTML reader (page_id = part index),
  other parts are recorded as attachments.
"""

from __future__ import annotations

import email
import email.policy
from typing import List, Tuple

from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.html import read_html


class BadMailFile(ValueError):
    pass


def _decode_part(part) -> bytes:
    payload = part.get_payload(decode=True)
    return payload if payload is not None else b""


def _plain_lines(text: str, page_id: int) -> List[LineWithMeta]:
    out = []
    for i, raw in enumerate(text.splitlines()):
        out.append(LineWithMeta(raw + "\n", metadata=LineMetadata(page_id=page_id, line_id=i)))
    return out


def read_eml(data: bytes) -> UnstructuredDoc:
    try:
        msg = email.message_from_bytes(data, policy=email.policy.default)
    except Exception as e:
        raise BadMailFile(f"invalid eml: {e}") from e
    if not msg.keys():
        raise BadMailFile("no rfc822 headers")

    lines: List[LineWithMeta] = []
    tables = []
    attachments: List[Tuple[str, int]] = []
    subject = str(msg.get("Subject", "") or "")
    if subject:
        hl = HierarchyLevel(1, 1, False, HierarchyLevel.header)
        lines.append(LineWithMeta(subject + "\n", metadata=LineMetadata(page_id=0, line_id=0, tag_hierarchy_level=hl)))

    part_id = 0
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        filename = part.get_filename()
        if ctype == "text/plain" and not filename:
            charset = part.get_content_charset() or "utf-8"
            text = _decode_part(part).decode(charset, errors="replace")
            lines.extend(_plain_lines(text, page_id=part_id))
            part_id += 1
        elif ctype == "text/html" and not filename:
            sub = read_html(_decode_part(part))
            for line in sub.lines:
                line.metadata.page_id = part_id
            lines.extend(sub.lines)
            tables.extend(sub.tables)
            part_id += 1
        else:
            payload = _decode_part(part)
            attachments.append((filename or f"part_{part_id}", len(payload), payload))
    doc = UnstructuredDoc(
        lines=lines,
        tables=tables,
        # header-fields metadata (reference writes a header json attachment —
        # email_reader.py; we surface the common fields as columns)
        metadata={
            "title": subject,
            "author": str(msg.get("From", "") or ""),
            "created": str(msg.get("Date", "") or ""),
        },
    )
    doc.attachments = attachments
    return doc


def read_mhtml(data: bytes) -> UnstructuredDoc:
    try:
        msg = email.message_from_bytes(data, policy=email.policy.default)
    except Exception as e:
        raise BadMailFile(f"invalid mhtml: {e}") from e

    lines: List[LineWithMeta] = []
    tables = []
    attachments: List[Tuple[str, int]] = []
    page_id = 0
    found_html = False
    for part in msg.walk():
        if part.is_multipart():
            continue
        if part.get_content_type() == "text/html":
            sub = read_html(_decode_part(part))
            for line in sub.lines:
                line.metadata.page_id = page_id
            for t in sub.tables:
                t.page_id = page_id
            lines.extend(sub.lines)
            tables.extend(sub.tables)
            page_id += 1
            found_html = True
        else:
            name = part.get_filename() or part.get("Content-Location", "") or f"part_{page_id}"
            attachments.append((str(name), len(_decode_part(part)), _decode_part(part)))
    if not found_html and not attachments:
        raise BadMailFile("no html parts in mhtml")
    doc = UnstructuredDoc(lines=lines, tables=tables)
    doc.attachments = attachments
    return doc
