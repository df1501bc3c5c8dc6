"""PDF /Info document metadata (reference PdfMetadataExtractor,
dedoc/metadata_extractors/concrete_metadata_extractors/pdf_metadata_extractor.py:28-58,
date conversion dedoc/utils/utils.py:234-257).

The reference reads the /Info dictionary through PyPDF2 and keeps the
non-empty string fields under prettified names, converting the two
ISO/IEC 8824 date strings (``D:YYYYMMDDHHmmSSOHH'mm'``) to unix time;
a broken file yields ``{"broken_pdf": True}``.  Here the same fields come
from the native object layer (readers/pdf_objects.py), so encrypted files
decrypt and UTF-16BE text strings decode without an external dependency.
"""

from __future__ import annotations

import datetime
import re
from typing import Dict, Optional

# /Info key → prettified field name (reference pdf_metadata_extractor.py keys)
_KEYS = {
    "Producer": "producer",
    "Creator": "creator",
    "Author": "author",
    "Title": "title",
    "Subject": "subject",
    "Keywords": "keywords",
}
_KEYS_DATE = {
    "CreationDate": "creation_date",
    "ModDate": "modification_date",
}

_DATE_RE = re.compile(
    r"(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?\s*(?:(Z)|([+-])(\d{2})'?(\d{2})?'?)?"
)


def pdf_text_string(raw: object) -> str:
    """PDF text string → str: UTF-16BE with BOM, UTF-8 with BOM (PDF 2.0),
    else PDFDocEncoding (latin-1 superset — close enough for /Info)."""
    if isinstance(raw, str):
        return raw
    if not isinstance(raw, bytes):
        return ""
    if raw[:2] in (b"\xfe\xff", b"\xff\xfe"):
        try:
            return raw.decode("utf-16")
        except UnicodeDecodeError:
            return raw[2:].decode("utf-16-be", "replace")
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", "replace")
    return raw.decode("latin-1")


def convert_pdf_datetime(value: str) -> Optional[int]:
    """``D:20210202145619+00'16'`` → unix seconds (reference
    utils.convert_datetime; naive timestamps are taken as UTC here so the
    result is machine-independent — the reference inherits the host zone)."""
    s = value.strip()
    if s.startswith("D:"):
        s = s[2:]
    m = _DATE_RE.match(s)
    if not m or not m.group(1):
        return None
    y = int(m.group(1))
    mo = int(m.group(2) or 1)
    d = int(m.group(3) or 1)
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    if m.group(8):  # explicit offset
        sign = 1 if m.group(8) == "+" else -1
        off = sign * (int(m.group(9)) * 3600 + int(m.group(10) or 0) * 60)
        tz = datetime.timezone(datetime.timedelta(seconds=off))
    else:  # Z or absent → UTC
        tz = datetime.timezone.utc
    try:
        dt = datetime.datetime(y, mo, min(d, 28) if d > 28 and mo == 2 else d, hh, mi, ss, tzinfo=tz)
    except ValueError:
        return None
    return int(dt.timestamp())


def extract_pdf_metadata(data: bytes) -> Dict[str, object]:
    """/Info fields of one PDF, prettified (reference __prettify_metadata):
    non-empty strings under the ``_KEYS`` names plus the two dates as unix
    ints; ``{"broken_pdf": True}`` when the object layer cannot load."""
    from dedoc_ray.readers.pdf_objects import PdfDocument, PdfError

    try:
        doc = PdfDocument(data)
        info = doc.resolve(doc.trailer.get("Info"))
    except PdfError:
        return {"broken_pdf": True}
    except Exception:
        return {"broken_pdf": True}
    out: Dict[str, object] = {}
    if not isinstance(info, dict):
        return out
    for key, raw in info.items():
        name = str(key)
        try:
            val = pdf_text_string(doc.resolve(raw))
        except Exception:
            continue
        if not isinstance(val, str) or not val:
            continue
        if name in _KEYS:
            out[_KEYS[name]] = val
        elif name in _KEYS_DATE:
            ts = convert_pdf_datetime(val)
            if ts is not None:
                out[_KEYS_DATE[name]] = ts
    return out
