"""Deterministic synthetic office/email corpora — E2E inputs for the new
readers (docx/xlsx/pptx/eml/mhtml/archive), derived purely from the
``documents`` table like sources/synth.py, so every pipeline stays
SQL-checkable by the DuckDB oracle.

Each generator emits (url, html) rows — ``html`` is the opaque payload
column of the input_hint schema; the extraction pipeline sniffs the real
format from the url/bytes.
"""

from __future__ import annotations

import io
import zipfile
from typing import Callable, Dict
from xml.sax.saxutils import escape

import pyarrow as pa

from dedoc_ray.sources.synth import chunks_of

_W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
_S = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_P = ('xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
      'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"')

_ZIP_DATE = (2024, 1, 1, 0, 0, 0)


def _zip_bytes(entries) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in entries:
            info = zipfile.ZipInfo(name, date_time=_ZIP_DATE)  # byte-deterministic
            zf.writestr(info, content)
    return buf.getvalue()


def docx_bytes(doc_id: int, text: str) -> bytes:
    """Heading 'Document {id}' + one paragraph per ' the '-chunk.
    Expected extracted text: 'Document {id}\n' + replace(text,' the ','\n') + '\n'."""
    paras = [f'<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t xml:space="preserve">Document {doc_id}</w:t></w:r></w:p>']
    for c in chunks_of(text):
        paras.append(f'<w:p><w:r><w:t xml:space="preserve">{escape(c)}</w:t></w:r></w:p>')
    xml = f'<?xml version="1.0"?><w:document {_W}><w:body>{"".join(paras)}</w:body></w:document>'
    return _zip_bytes([("word/document.xml", xml)])


def xlsx_bytes(doc_id: int, text: str) -> bytes:
    """One sheet, 2x3 numeric grid (values doc_id*10+i)."""
    rows = []
    i = 0
    for r in (1, 2):
        cells = []
        for ci, col in enumerate("ABC"):
            cells.append(f'<c r="{col}{r}"><v>{doc_id * 10 + i}</v></c>')
            i += 1
        rows.append(f'<row r="{r}">{"".join(cells)}</row>')
    xml = f'<?xml version="1.0"?><worksheet {_S}><sheetData>{"".join(rows)}</sheetData></worksheet>'
    return _zip_bytes([("xl/worksheets/sheet1.xml", xml)])


def pptx_bytes(doc_id: int, text: str) -> bytes:
    """One slide: title shape 'Slide {id}' + one body shape per chunk.
    Expected extracted: 'Slide {id}\n' + replace(text,' the ','\n') + '\n'."""
    shapes = [f"<p:sp><p:txBody><a:p><a:r><a:t>Slide {doc_id}</a:t></a:r></a:p></p:txBody></p:sp>"]
    for c in chunks_of(text):
        shapes.append(f"<p:sp><p:txBody><a:p><a:r><a:t>{escape(c)}</a:t></a:r></a:p></p:txBody></p:sp>")
    xml = f'<?xml version="1.0"?><p:sld {_P}><p:cSld><p:spTree>{"".join(shapes)}</p:spTree></p:cSld></p:sld>'
    return _zip_bytes([("ppt/slides/slide1.xml", xml)])


def eml_bytes(doc_id: int, text: str) -> bytes:
    """Subject header line + plain-text body (one line per chunk).
    Expected extracted: 'Doc {id}\n' + replace(text,' the ','\n') + '\n'."""
    body = "\n".join(chunks_of(text))
    msg = (f"From: corpus@synth.test\r\nTo: reader@synth.test\r\nSubject: Doc {doc_id}\r\n"
           f"MIME-Version: 1.0\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n")
    return msg.encode("ascii") + body.encode("utf-8")


def mhtml_bytes(doc_id: int, text: str) -> bytes:
    """One text/html part with <p> per chunk + one binary part.
    Expected extracted: replace(text,' the ','\n') + '\n' (html <p> semantics)."""
    html = "<html><body>" + "".join(f"<p>{escape(c)}</p>" for c in chunks_of(text)) + "</body></html>"
    part = (b"MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary=SYNTH\r\n\r\n"
            b"--SYNTH\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Content-Location: https://synth.test/page\r\n\r\n" + html.encode("utf-8") +
            b"\r\n--SYNTH\r\nContent-Type: image/png\r\nContent-Location: https://synth.test/i.png\r\n\r\n"
            + b"P" * (doc_id % 16 + 1) + b"\r\n--SYNTH--\r\n")
    return part


def csv_bytes(doc_id: int, text: str) -> bytes:
    """Single-column CSV: one sanitized row per chunk (commas/quotes blanked
    so the DuckDB oracle stays a pure string expression)."""
    rows = [c.replace(",", " ").replace('"', " ") for c in chunks_of(text)]
    return ("\n".join(rows) + "\n").encode("utf-8")


def archive_bytes(doc_id: int, text: str) -> bytes:
    """Zip with two members: body.txt (the utf-8 text) + meta.txt (8 bytes)."""
    return _zip_bytes([("body.txt", text.encode("utf-8")), ("meta.txt", "12345678")])


def law_bytes(doc_id: int, text: str) -> bytes:
    """Plain-text legal doc: one Chapter header, one 'Article i' per chunk
    (content lines prefixed 'text:' so they can never match a structure
    pattern — keeps the article count SQL-expressible)."""
    lines = [f"Chapter {doc_id % 3 + 1}"]
    for i, c in enumerate(chunks_of(text), 1):
        lines.append(f"Article {i}")
        lines.append(f"text: {c}")
    return ("\n".join(lines) + "\n").encode("utf-8")


_GENERATORS: Dict[str, Callable[[int, str], bytes]] = {
    "docx": docx_bytes,
    "xlsx": xlsx_bytes,
    "pptx": pptx_bytes,
    "eml": eml_bytes,
    "mhtml": mhtml_bytes,
    "zip": archive_bytes,
    "csv": csv_bytes,
    "law": law_bytes,
}


def office_pages_batch(batch: pa.Table, fmt: str) -> pa.Table:
    """documents rows → (url, html) payload rows for one format."""
    gen = _GENERATORS[fmt]
    urls, payloads = [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ext = "txt" if fmt == "law" else fmt
        urls.append(f"https://synth.test/office/{doc_id}.{ext}")
        payloads.append(gen(doc_id, text))
    return pa.Table.from_pydict(
        {"url": pa.array(urls, "string"), "html": pa.array(payloads, "binary")}
    )


def office_corpus(sf_dir: str, fmt: str):
    """Lazy Ray Dataset of the synthetic corpus for one format."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(lambda b: office_pages_batch(b, fmt), batch_format="pyarrow")
