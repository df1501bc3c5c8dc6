"""Html2PdfReader — HTML rendered to PDF, then parsed through the PDF
text-layer path (reference dedoc/readers/html2pdf_reader/
html2pdf_reader.py:17-53: weasyprint conversion + PdfTxtlayerReader +
table re-attachment).

weasyprint is absent here, so the conversion step is our own minimal
paginated PDF renderer (the same single-column BT/ET text-op layout the
PDF reader consumes) — the semantics that matter are faithfully kept:

1. tables are lifted out of the HTML first and replaced by placeholder
   uid lines (html2pdf_reader.py:55-105 ``_handle_tables``),
2. the PDF round-trip re-reads the text layer,
3. placeholder lines are removed and each table is re-attached with a
   table annotation on the preceding line (``_add_tables``, :35-53).
"""

from __future__ import annotations

from typing import List

from dedoc_ray.core.annotation import Annotation, AnnotationNames
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.html.reader import read_html
from dedoc_ray.readers.pdf import read_pdf_textlayer

_LINES_PER_PAGE = 50


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def render_pdf(lines: List[str]) -> bytes:
    """Minimal paginated text-layer PDF: y-descending Tj ops, 50 lines per
    612x792 page — the layout contract the txtlayer reader parses."""
    pages: List[bytes] = []
    for p in range(0, max(len(lines), 1), _LINES_PER_PAGE):
        ops = []
        for i, line in enumerate(lines[p : p + _LINES_PER_PAGE]):
            ops.append(f"BT /F1 12 Tf 72 {760 - 14 * i} Td ({_pdf_escape(line)}) Tj ET")
        pages.append("\n".join(ops).encode("latin-1", errors="replace"))

    objs: List[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(len(pages)))
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    objs.append(f"2 0 obj << /Type /Pages /Kids [{kids}] /Count {len(pages)} >> endobj".encode())
    for i, content in enumerate(pages):
        objs.append(
            f"{3 + 2 * i} 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R >> endobj".encode()
        )
        objs.append(
            f"{4 + 2 * i} 0 obj << /Length {len(content)} >> stream\n".encode()
            + content
            + b"\nendstream endobj"
        )
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def read_html2pdf(data: bytes, handle_invisible_table: bool = False) -> UnstructuredDoc:
    doc_html = read_html(data, handle_invisible_table=handle_invisible_table)

    # 1. lift tables out, placeholder line at each table's anchor
    placeholders = {}
    texts: List[str] = [ln.line.rstrip("\n") for ln in doc_html.lines]
    for i, table in enumerate(doc_html.tables):
        uid = table.uid or f"table_{i}"
        placeholders[uid] = table
        anchor = table.order if table.order is not None else len(texts)
        texts.insert(min(anchor + i, len(texts)), uid)

    # 2. render + re-read through the PDF text layer
    doc_pdf = read_pdf_textlayer(render_pdf(texts), one_column=True)

    # 3. drop placeholders, annotate the previous line, re-attach tables
    lines = []
    tables = []
    previous = None
    for line in doc_pdf.lines:
        uid = line.line.strip()
        if uid in placeholders:
            if previous is not None:
                previous.annotations.append(
                    Annotation(0, len(previous.line), AnnotationNames.table, uid)
                )
            tables.append(placeholders[uid])
        else:
            previous = line
            lines.append(line)
    for i, line in enumerate(lines):
        line.metadata.line_id = i
    return UnstructuredDoc(
        lines=lines, tables=tables,
        warnings=doc_pdf.warnings + ["html rendered to pdf natively (weasyprint absent)"],
    )
