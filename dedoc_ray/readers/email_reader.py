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


#: header fields that become typed lines, in reference order
#: (email_reader.py:205-217 __get_main_fields)
_EML_FIELDS = ("subject", "from", "to", "cc", "bcc", "date", "reply-to")


def read_eml(data: bytes) -> UnstructuredDoc:
    """Reference shape (email_reader.py:33-217): the subject is the ROOT
    line (level 0,0 type "root"), then one line per non-empty header field
    with the field name as its line type (level 1,0), then the body —
    text/html parts via the HTML reader, text/plain split per newline (only
    when no html part carried the same content). Header fields are also
    dumped into a leading ``message_header_*.json`` attachment."""
    try:
        msg = email.message_from_bytes(data, policy=email.policy.default)
    except Exception as e:
        raise BadMailFile(f"invalid eml: {e}") from e
    if not msg.keys():
        raise BadMailFile("no rfc822 headers")

    def field(name: str) -> str:
        try:
            return str(msg.get(name, "") or "")
        except Exception:  # undecodable rfc2047 garbage
            return ""

    subject = field("subject")
    lines: List[LineWithMeta] = [
        LineWithMeta(subject, metadata=LineMetadata(page_id=0, line_id=0, tag_hierarchy_level=HierarchyLevel(0, 0, False, "root")))
    ]
    for name in _EML_FIELDS:
        value = field(name)
        if value:
            hl = HierarchyLevel(1, 0, False, name)
            lines.append(LineWithMeta(value, metadata=LineMetadata(page_id=0, line_id=0, tag_hierarchy_level=hl)))

    tables = []
    attachments: List[Tuple[str, int, bytes]] = []
    # all header fields as a json attachment (reference writes
    # message_header_{uuid}.json; the name here is deterministic by content)
    import hashlib
    import json

    try:
        header_payload = json.dumps(dict(msg.items()), ensure_ascii=False, indent=4).encode("utf-8")
    except Exception:
        header_payload = b"{}"
    header_name = f"message_header_{hashlib.md5(header_payload).hexdigest()[:16]}.json"
    attachments.append((header_name, len(header_payload), header_payload))

    part_id = 0
    html_found = False
    text_parts: List[Tuple[str, bytes]] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        filename = part.get_filename()
        if ctype == "text/plain" and not filename:
            charset = part.get_content_charset() or "utf-8"
            text_parts.append((charset, _decode_part(part)))
            part_id += 1
        elif ctype == "text/html" and not filename:
            sub = read_html(_decode_part(part))
            for line in sub.lines:
                line.metadata.page_id = part_id
            lines.extend(sub.lines)
            tables.extend(sub.tables)
            html_found = True
            part_id += 1
        else:
            payload = _decode_part(part)
            attachments.append((filename or f"part_{part_id}", len(payload), payload))
    # text/plain usually mirrors text/html — reference keeps only one
    # (email_reader.py:102-108)
    if not html_found:
        for charset, payload in text_parts:
            text = payload.decode(charset, errors="replace")
            for i, raw in enumerate(text.split("\n")):
                lines.append(LineWithMeta(raw + "\n", metadata=LineMetadata(page_id=0, line_id=i)))

    doc = UnstructuredDoc(
        lines=lines,
        tables=tables,
        # header-fields metadata surfaced as columns on top of the
        # reference's json attachment
        metadata={
            "title": subject,
            "author": field("from"),
            "created": field("date"),
        },
    )
    doc.attachments = attachments
    return doc


# reference dedoc/utils/__init__.py:_supported_image_types
_MHTML_IMAGE_TYPES = {
    "bmp", "dib", "eps", "gif", "hdr", "jfif", "jp2", "jpe", "jpeg", "jpg",
    "pbm", "pcx", "pgm", "pic", "png", "pnm", "ppm", "ras", "sgi", "sr",
    "tiff", "webp", "j2k",
}


def read_mhtml(data: bytes) -> UnstructuredDoc:
    if data[:2] == b"\x1f\x8b":  # .mhtml.gz (reference mhtml_reader.py:24)
        import gzip

        try:
            data = gzip.decompress(data)
        except Exception as e:
            raise BadMailFile(f"invalid mhtml.gz: {e}") from e
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
            from urllib.parse import urlparse as _urlparse

            # reference mhtml_reader.py:126-135: only IMAGE parts attach
            # (supported_image_types by extension of the Content-Location
            # basename); css/js/font parts are dropped
            loc = str(part.get_filename() or part.get("Content-Location", "") or f"part_{page_id}")
            base = _urlparse(loc).path.rsplit("/", 1)[-1] or loc
            ext = base.rsplit(".", 1)[-1].lower() if "." in base else ""
            if ext in _MHTML_IMAGE_TYPES:
                payload = _decode_part(part)
                attachments.append((base, len(payload), payload))
    if not found_html and not attachments:
        raise BadMailFile("no html parts in mhtml")
    doc = UnstructuredDoc(lines=lines, tables=tables)
    doc.attachments = attachments
    return doc
