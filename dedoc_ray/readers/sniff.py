"""Format dispatch: decisive content magic first, then extension.

Mirrors the reference's dispatch policy (utils.get_mime_extension —
libmagic's content sniff leads, the extension breaks ties;
test_api_misc_mime_detection.py parses every format with NO extension and
with a WRONG extension). Magic wins only where it is decisive (container
signatures); text-family formats without reliable magic (csv/json/html/
txt/eml) fall to the extension, then to content heuristics. Here the
"file name" is the row's ``url`` and the "file bytes" are the ``html``
column payload.
"""

from __future__ import annotations

import io
import json
import re
import zipfile
from urllib.parse import urlparse

HTML_EXT = (".html", ".htm", ".shtml")
TXT_EXT = (".txt", ".txt.gz", ".txt.bz2", ".txt.xz", ".text", ".log",
           ".xml")  # xml→txt: reference xml_converter copies verbatim
CSV_EXT = (".csv", ".tsv")
JSON_EXT = (".json",)
PDF_EXT = (".pdf",)
DOCX_EXT = (".docx",)
XLSX_EXT = (".xlsx",)
PPTX_EXT = (".pptx",)
EML_EXT = (".eml",)
MHTML_EXT = (".mhtml", ".mht")
ARCHIVE_EXT = (".zip", ".tar", ".tar.gz", ".tgz", ".7z", ".rar",
               ".tar.bz2", ".tbz2", ".tar.xz", ".txz")
ODT_EXT = (".odt",)
ODS_EXT = (".ods",)
ODP_EXT = (".odp",)
RTF_EXT = (".rtf",)
DOC_EXT = (".doc",)
XLS_EXT = (".xls",)
PPT_EXT = (".ppt",)
TEI_EXT = (".tei", ".tei.xml")
NOTE_EXT = (".note.pickle",)
PGM_EXT = (".pgm", ".bmp", ".png", ".tif", ".tiff", ".jpg", ".jpeg",
           ".gif", ".webp", ".pcx", ".ppm", ".pbm", ".pnm", ".ras",
           ".sgi", ".rgb", ".hdr")

_EXT_TABLE = (
    (HTML_EXT, "html"),
    (CSV_EXT, "csv"),
    (JSON_EXT, "json"),
    (PDF_EXT, "pdf"),
    (DOCX_EXT, "docx"),
    (XLSX_EXT, "xlsx"),
    (PPTX_EXT, "pptx"),
    (EML_EXT, "eml"),
    (MHTML_EXT, "mhtml"),
    (ARCHIVE_EXT, "archive"),
    (ODT_EXT, "odt"),
    (ODS_EXT, "ods"),
    (ODP_EXT, "odp"),
    (RTF_EXT, "rtf"),
    (DOC_EXT, "doc"),
    (XLS_EXT, "xls"),
    (PPT_EXT, "ppt"),
    (TEI_EXT, "article"),
    (NOTE_EXT, "note"),
    (PGM_EXT, "pgm"),
    (TXT_EXT, "txt"),
)

_TAG_RE = re.compile(rb"<(!doctype|html|head|body|div|p|h[1-6]|table|span|a|ul|ol|br|meta)[\s>/]", re.IGNORECASE)
_MAIL_HEADER_RE = re.compile(rb"^(From|To|Subject|Received|Return-Path|Date|Message-ID):", re.IGNORECASE | re.MULTILINE)


def _sniff_zip(data: bytes) -> str:
    """PK container → docx / xlsx / pptx by member prefix, else archive
    (the content analogue of the reference's mime table, extensions.py)."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = zf.namelist()
    except zipfile.BadZipFile:
        return "bad_file"
    for name in names:
        if name.startswith("word/"):
            return "docx"
        if name.startswith("xl/"):
            return "xlsx"
        if name.startswith("ppt/"):
            return "pptx"
    if "content.xml" in names:  # OpenDocument container — split by mimetype member
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                mime = zf.read("mimetype") if "mimetype" in names else b""
        except (zipfile.BadZipFile, KeyError):
            mime = b""
        if b"spreadsheet" in mime:
            return "ods"
        if b"presentation" in mime:
            return "odp"
        return "odt"
    return "archive"


def sniff_format(url: str, data: bytes) -> str:
    """Return one of: html, txt, csv, json, pdf, docx, xlsx, pptx, odt, rtf,
    eml, mhtml, archive, bad_file."""
    magic = _sniff_magic(data)
    if magic is not None:
        return magic
    path = urlparse(url).path.lower() if url else ""
    for exts, fmt in _EXT_TABLE:
        if path.endswith(exts):
            if fmt == "pgm":
                # a raster extension whose content shows NO raster magic is
                # a mislabeled file (wrong-extension uploads,
                # test_api_misc_mime_detection.py:40-46) — sniff content
                from dedoc_ray.ops.media_codecs import image_dimensions

                if image_dimensions(data) is None:
                    break
            return fmt
    return _sniff_weak(data)


def _sniff_magic(data: bytes) -> "str | None":
    """Decisive container signatures (libmagic's role); None = undecided."""
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:2] == b"P5" and data[2:3].isspace():
        return "pgm"  # grayscale scan raster → OCR route
    if data[:2] == b"BM" and len(data) > 54 and data[14:15] in (b"\x28", b"\x6c", b"\x7c"):
        return "pgm"  # BMP raster (BITMAPINFO/V4/V5 header) → same OCR route
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "pgm"  # PNG raster → OCR route (reference supported_image_types)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "pgm"  # TIFF raster → OCR route
    if data[:3] == b"\xff\xd8\xff":
        return "pgm"  # JPEG raster → OCR route (reference supported_image_types)
    if data[:4] == b"GIF8":
        return "pgm"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "pgm"
    if data[:1] == b"P" and data[1:2] in b"12346" and data[2:3].isspace():
        return "pgm"  # other Netpbm variants (P5 matched above)
    if data[:4] == b"\x59\xa6\x6a\x95" or data[:2] == b"\x01\xda":
        return "pgm"  # Sun raster / SGI
    if data[:11] == b"#?RADIANCE\n" or data[:7] == b"#?RGBE\n":
        return "pgm"  # Radiance HDR
    if data[:4] == b"\xff\x4f\xff\x51" or (data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  "):
        return "pgm"  # JPEG 2000 codestream / jp2 box (ops/jpeg2000.py)
    if (
        len(data) > 128
        and data[0] == 0x0A
        and data[1] in (0, 2, 3, 4, 5)
        and data[2] in (0, 1)
        and data[3] in (1, 2, 4, 8)
    ):
        return "pgm"  # PCX (manufacturer/version/encoding/bpp header)
    if data[:5] == b"{\\rtf":
        return "rtf"
    if data[:4] == b"PK\x03\x04":
        return _sniff_zip(data)
    if data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        # CFB/OLE2 container → classify by signature stream name
        from dedoc_ray.readers.cfb import sniff_cfb_kind

        kind = sniff_cfb_kind(data)
        return kind if kind is not None else "bad_file"
    if len(data) > 262 and data[257:262] == b"ustar":
        return "archive"
    if data[:6] == b"7z\xbc\xaf\x27\x1c":
        return "archive"  # native 7z (readers/sevenzip.py)
    if data[:6] == b"Rar!\x1a\x07":
        return "archive"  # native rar container listing (readers/rar.py)
    if data[:4] == b"AT&T" and data[4:8] == b"FORM":
        return "djvu"  # container/structure reader (readers/djvu.py)
    if data[:2] == b"\x1f\x8b":
        # gzip: re-sniff the decompressed head — .tar.gz stays an archive,
        # .mhtml.gz routes to the mhtml reader (reference accepts .gz for
        # both), everything else is the .txt.gz analogue
        import gzip

        try:
            inner = gzip.decompress(data)[:4096]
        except Exception:
            return "txt"
        if len(inner) > 262 and inner[257:262] == b"ustar":
            return "archive"
        if b"MIME-Version:" in inner and b"multipart/related" in inner:
            return "mhtml"
        return "txt"
    if data[:3] == b"BZh" or data[:6] == b"\xfd7zXZ\x00":
        return "txt"  # bz2/xz single-file text (stdlib decompress)
    return None


def _sniff_weak(data: bytes) -> str:
    """Content heuristics for the text family (no reliable magic)."""
    head = data[:4096]
    if b"MIME-Version:" in head and b"multipart/related" in head:
        return "mhtml"
    if (
        _MAIL_HEADER_RE.match(head)
        and head.count(b":") >= 2
        and (b"\n\n" in data[:8192] or b"\r\n\r\n" in data[:8192])
    ):
        # rfc822 header block STARTING the file — checked before the html
        # tag scan because mail bodies embed html parts
        # (test_api_misc_mime_detection: message.eml with no extension)
        return "eml"
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
