"""Format dispatch: extension first, then content magic bytes.

Mirrors the reference's dispatch policy (dedoc_manager.py:145-167 +
utils.py:65-77,139-150 + extensions.py): the file extension decides when
recognized, otherwise the content is sniffed. Here the "file name" is the
row's ``url`` and the "file bytes" are the ``html`` column payload.
"""

from __future__ import annotations

import json
import re
from urllib.parse import urlparse

HTML_EXT = (".html", ".htm", ".shtml")
TXT_EXT = (".txt", ".txt.gz", ".text", ".log")
CSV_EXT = (".csv", ".tsv")
JSON_EXT = (".json",)
PDF_EXT = (".pdf",)

_TAG_RE = re.compile(rb"<(!doctype|html|head|body|div|p|h[1-6]|table|span|a|ul|ol|br|meta)[\s>/]", re.IGNORECASE)


def sniff_format(url: str, data: bytes) -> str:
    """Return one of: html, txt, csv, json, pdf, bad_file."""
    path = urlparse(url).path.lower() if url else ""
    for exts, fmt in ((HTML_EXT, "html"), (CSV_EXT, "csv"), (JSON_EXT, "json"), (PDF_EXT, "pdf"), (TXT_EXT, "txt")):
        if path.endswith(exts):
            return fmt

    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:2] == b"\x1f\x8b":
        return "txt"  # .txt.gz analogue
    head = data[:4096]
    if _TAG_RE.search(head):
        return "html"
    stripped = head.lstrip()
    if stripped[:1] in (b"{", b"["):
        try:
            json.loads(data.decode("utf-8", errors="strict"))
            return "json"
        except Exception:
            pass
    # printable text?
    try:
        text = head.decode("utf-8")
    except UnicodeDecodeError:
        return "bad_file"
    n_printable = sum(1 for ch in text if ch.isprintable() or ch in "\n\r\t ")
    if text and n_printable / len(text) > 0.95:
        return "txt"
    return "bad_file"
