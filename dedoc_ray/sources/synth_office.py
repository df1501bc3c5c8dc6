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
from typing import Callable, Dict, List
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


_DOCX_NUMBERING = f"""<?xml version="1.0"?>
<w:numbering {_W}>
  <w:abstractNum w:abstractNumId="0">
    <w:lvl w:ilvl="0"><w:start w:val="1"/><w:numFmt w:val="decimal"/>
      <w:lvlText w:val="%1."/><w:suff w:val="space"/></w:lvl>
    <w:lvl w:ilvl="1"><w:start w:val="1"/><w:numFmt w:val="lowerLetter"/>
      <w:lvlText w:val="%2)"/><w:suff w:val="space"/></w:lvl>
  </w:abstractNum>
  <w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>
</w:numbering>"""

_DOCX_STYLES = f"""<?xml version="1.0"?>
<w:styles {_W}>
  <w:style w:type="paragraph" w:styleId="Heading1"><w:name w:val="heading 1"/></w:style>
  <w:style w:type="paragraph" w:styleId="ListParagraph"><w:name w:val="List Paragraph"/></w:style>
</w:styles>"""

#: byte-exact expected rendering of the numbered list below (the DuckDB
#: oracle appends this constant — keep in sync with _docx_list_paras)
DOCX_LIST_TEXT = "1. item one\na) sub one\nb) sub two\n2. item two\n"


def _docx_list_paras() -> List[str]:
    items = [("item one", 0), ("sub one", 1), ("sub two", 1), ("item two", 0)]
    return [
        f'<w:p><w:pPr><w:pStyle w:val="ListParagraph"/><w:numPr><w:ilvl w:val="{ilvl}"/>'
        f'<w:numId w:val="1"/></w:numPr></w:pPr>'
        f'<w:r><w:t xml:space="preserve">{escape(t)}</w:t></w:r></w:p>'
        for t, ilvl in items
    ]


def _docx_core_xml(doc_id: int) -> str:
    return (
        '<?xml version="1.0"?>'
        '<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dc="http://purl.org/dc/elements/1.1/" xmlns:dcterms="http://purl.org/dc/terms/">'
        f"<dc:title>Document {doc_id}</dc:title>"
        f"<dc:creator>synth-author-{doc_id % 5}</dc:creator>"
        "<dc:subject>corpus</dc:subject>"
        "<dcterms:created>2024-01-01T00:00:00Z</dcterms:created>"
        "<dcterms:modified>2024-01-02T00:00:00Z</dcterms:modified>"
        "</cp:coreProperties>"
    )


def docx_bytes(doc_id: int, text: str) -> bytes:
    """Heading 'Document {id}' + one paragraph per ' the '-chunk + a 2-level
    numbered list (decimal / lowerLetter via word/numbering.xml) + core
    properties. Expected extracted text:
    'Document {id}\n' + replace(text,' the ','\n') + '\n' + DOCX_LIST_TEXT."""
    paras = [f'<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t xml:space="preserve">Document {doc_id}</w:t></w:r></w:p>']
    for i, c in enumerate(chunks_of(text)):
        # the first body paragraph carries a footnote reference
        ref = '<w:r><w:footnoteReference w:id="1"/></w:r>' if i == 0 else ""
        paras.append(f'<w:p><w:r><w:t xml:space="preserve">{escape(c)}</w:t></w:r>{ref}</w:p>')
    paras.extend(_docx_list_paras())
    xml = f'<?xml version="1.0"?><w:document {_W}><w:body>{"".join(paras)}</w:body></w:document>'
    footnotes = (f'<?xml version="1.0"?><w:footnotes {_W}>'
                 f'<w:footnote w:id="1"><w:p><w:r><w:t>note for doc {doc_id}</w:t></w:r></w:p></w:footnote>'
                 f"</w:footnotes>")
    return _zip_bytes(
        [
            ("word/document.xml", xml),
            ("word/numbering.xml", _DOCX_NUMBERING),
            ("word/styles.xml", _DOCX_STYLES),
            ("word/footnotes.xml", footnotes),
            ("docProps/core.xml", _docx_core_xml(doc_id)),
            # embedded image → exercises the docx attachment manifest
            ("word/media/image1.png", b"P" * (doc_id % 7 + 3)),
        ]
    )


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
    Expected extracted (reference header-field lines): 'Doc {id}\n' twice
    (root + subject field) + from + to lines + replace(text,' the ','\n')
    + '\n'."""
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


def rar_bytes(doc_id: int, text: str) -> bytes:
    """RAR archive with the same two members as archive_bytes, so the zip
    oracle shape carries.  Every third doc's stream is a RAR3 PPMd block
    (readers/rar_decode.py exercises the full var.H decode path in the
    distributed pipeline); the rest are STORED."""
    from dedoc_ray.readers.rar import rar_encode_ppm, rar_encode_stored

    members = [("body.txt", text.encode("utf-8")), ("meta.txt", b"12345678")]
    if doc_id % 3 == 0:
        return rar_encode_ppm(members, order=4)
    return rar_encode_stored(members)


def sevenzip_bytes(doc_id: int, text: str) -> bytes:
    """.7z with the same two members as archive_bytes — solid LZMA2 folder,
    with the metadata header itself LZMA2-compressed (kEncodedHeader) for
    every third doc so both header paths run in the corpus."""
    from dedoc_ray.readers.sevenzip import sevenzip_encode

    return sevenzip_encode(
        [("body.txt", text.encode("utf-8")), ("meta.txt", b"12345678")],
        codec="lzma2",
        solid=True,
        encoded_header=(doc_id % 3 == 0),
    )


_ODT_CONTENT_NS = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"'
)

#: byte-exact expected rendering of the odt list below
ODT_LIST_TEXT = "1. item one\n2. item two\n"


def odt_bytes(doc_id: int, text: str) -> bytes:
    """Native OpenDocument: heading + one text:p per chunk + a 2-item list +
    meta.xml. Expected extracted text:
    'Document {id}\n' + replace(text,' the ','\n') + '\n' + ODT_LIST_TEXT."""
    paras = [f'<text:h text:outline-level="1">Document {doc_id}</text:h>']
    for c in chunks_of(text):
        paras.append(f"<text:p>{escape(c)}</text:p>")
    paras.append(
        "<text:list>"
        "<text:list-item><text:p>item one</text:p></text:list-item>"
        "<text:list-item><text:p>item two</text:p></text:list-item>"
        "</text:list>"
    )
    content = (f'<?xml version="1.0"?><office:document-content {_ODT_CONTENT_NS}>'
               f'<office:body><office:text>{"".join(paras)}</office:text></office:body>'
               f"</office:document-content>")
    meta = ('<?xml version="1.0"?>'
            '<office:document-meta xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
            'xmlns:meta="urn:oasis:names:tc:opendocument:xmlns:meta:1.0" '
            'xmlns:dc="http://purl.org/dc/elements/1.1/"><office:meta>'
            f"<dc:title>Document {doc_id}</dc:title>"
            f"<meta:initial-creator>synth-author-{doc_id % 5}</meta:initial-creator>"
            "<meta:creation-date>2024-01-01T00:00:00Z</meta:creation-date>"
            "</office:meta></office:document-meta>")
    return _zip_bytes(
        [
            ("mimetype", "application/vnd.oasis.opendocument.text"),
            ("content.xml", content),
            ("meta.xml", meta),
        ]
    )


def ods_bytes(doc_id: int, text: str) -> bytes:
    """Native OpenDocument spreadsheet: one sheet, 2x3 grid of values
    doc_id*10+i (mirrors xlsx_bytes) with a trailing repeated-empty-cell
    filler so the reader's number-columns-repeated trim path runs."""
    rows = []
    i = 0
    for _ in range(2):
        cells = []
        for _ in range(3):
            cells.append(f'<table:table-cell office:value-type="float" office:value="{doc_id * 10 + i}">'
                         f"<text:p>{doc_id * 10 + i}</text:p></table:table-cell>")
            i += 1
        cells.append('<table:table-cell table:number-columns-repeated="1021"/>')
        rows.append(f"<table:table-row>{''.join(cells)}</table:table-row>")
    content = (f'<?xml version="1.0"?><office:document-content {_ODT_CONTENT_NS}>'
               f'<office:body><office:spreadsheet><table:table table:name="Sheet1">'
               f"{''.join(rows)}</table:table></office:spreadsheet></office:body>"
               f"</office:document-content>")
    return _zip_bytes(
        [
            ("mimetype", "application/vnd.oasis.opendocument.spreadsheet"),
            ("content.xml", content),
        ]
    )


def odp_bytes(doc_id: int, text: str) -> bytes:
    """Native OpenDocument presentation: one draw:page, title frame
    'Slide {id}' + one text frame per chunk (mirrors pptx_bytes)."""
    frames = [
        "<draw:frame><draw:text-box>"
        f"<text:p>Slide {doc_id}</text:p></draw:text-box></draw:frame>"
    ]
    for c in chunks_of(text):
        frames.append(f"<draw:frame><draw:text-box><text:p>{escape(c)}</text:p></draw:text-box></draw:frame>")
    ns = _ODT_CONTENT_NS + ' xmlns:draw="urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"'
    content = (f'<?xml version="1.0"?><office:document-content {ns}>'
               f'<office:body><office:presentation><draw:page draw:name="page1">'
               f"{''.join(frames)}</draw:page></office:presentation></office:body>"
               f"</office:document-content>")
    return _zip_bytes(
        [
            ("mimetype", "application/vnd.oasis.opendocument.presentation"),
            ("content.xml", content),
        ]
    )


def rtf_bytes(doc_id: int, text: str) -> bytes:
    """Native RTF: title paragraph + one paragraph per chunk. Expected
    extracted text: 'Document {id}\n' + non-empty trimmed chunks joined by
    newlines + '\n' (the reader drops blank paragraphs)."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("{", r"\{").replace("}", r"\}")

    body = "\\par ".join(esc(c) for c in chunks_of(text))
    return (f"{{\\rtf1\\ansi\\ansicpg1252 Document {doc_id}\\par {body}}}").encode("cp1252", errors="replace")


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def pdf_twocol_bytes(doc_id: int, text: str) -> bytes:
    """Two-column text-layer PDF: first half of the chunks in the left
    column (x=72), second half in the right (x=322), ops EMITTED INTERLEAVED
    with the right column's baselines offset so a naive global y-sort would
    interleave the columns — only column-aware reading order reproduces
    replace(text,' the ','\\n') + '\\n'."""
    chunks = chunks_of(text)
    k = (len(chunks) + 1) // 2
    left, right = chunks[:k], chunks[k:]
    ops = []
    for i in range(max(len(left), len(right))):
        if i < len(left):
            ops.append(f"BT /F1 12 Tf 72 {760 - 28 * i} Td ({_pdf_escape(left[i])}) Tj ET")
        if i < len(right):
            ops.append(f"BT /F1 12 Tf 322 {746 - 28 * i} Td ({_pdf_escape(right[i])}) Tj ET")
    content = "\n".join(ops).encode("latin-1", errors="replace")
    return (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
            + b" >> stream\n" + content + b"\nendstream endobj\ntrailer\n%%EOF")


def law_bytes(doc_id: int, text: str) -> bytes:
    """Plain-text legal doc: one Chapter header, one 'Article i' per chunk
    (content lines prefixed 'text:' so they can never match a structure
    pattern — keeps the article count SQL-expressible)."""
    lines = [f"Chapter {doc_id % 3 + 1}"]
    for i, c in enumerate(chunks_of(text), 1):
        lines.append(f"Article {i}")
        lines.append(f"text: {c}")
    return ("\n".join(lines) + "\n").encode("utf-8")


def law_foiv_bytes(doc_id: int, text: str) -> bytes:
    """Mixed law/foiv corpus for hat classification: odd doc_ids carry a
    ПРИКАЗ hat (routes to the foiv extractor → dotted items + letter
    subitems), even ones a ЗАКОН hat (law extractor → Статья articles).
    Counts per route are SQL-replayable from doc_id parity + chunk count."""
    chunks = chunks_of(text)
    if doc_id % 2:
        lines = [f"ПРИКАЗ от 17.12.2013 № {doc_id % 90 + 1}/8"]
        for i, c in enumerate(chunks, 1):
            lines.append(f"{i}. provision body {c.replace(chr(10), ' ')}")
            lines.append(f"а) subclause for part {i}")
    else:
        lines = [f"ЗАКОН О ДОКУМЕНТАХ {doc_id % 97}"]
        for i, c in enumerate(chunks, 1):
            lines.append(f"Статья {i}")
            lines.append(f"text: {c}")
    return ("\n".join(lines) + "\n").encode("utf-8")


_LAW_ART_FORMS = ["Статья {i}.", "Ст. {i}.", "Article {i}", "ARTICLE {i}", "Art. {i}."]


def law_ml_bytes(doc_id: int, text: str) -> bytes:
    """Law text whose article headers rotate through abbreviation/case
    variants ("Ст. N.", "ARTICLE N") that the strict skeleton regexes do
    NOT match — only the trained line-type classifier recovers them. One
    article per chunk; body lines start lowercase with no numbering so the
    classifier's raw_text precision is exercised too."""
    lines = [f"Гл. {doc_id % 3 + 1}"]
    for i, c in enumerate(chunks_of(text), 1):
        lines.append(_LAW_ART_FORMS[(doc_id + i) % len(_LAW_ART_FORMS)].format(i=i))
        lines.append(f"provision text {c}")
    return ("\n".join(lines) + "\n").encode("utf-8")


_FINTOC_TOPICS = ["Financial Review", "Market Risk", "Capital Resources",
                  "Operating Segments", "Audit Findings", "Regulatory Matters"]


def fintoc_bytes(doc_id: int, text: str) -> bytes:
    """Financial-report-like text: one numbered title per chunk + a body
    paragraph; the fintoc classifier must mark exactly the titles."""
    lines = []
    for i, c in enumerate(chunks_of(text), 1):
        topic = _FINTOC_TOPICS[(doc_id + i) % len(_FINTOC_TOPICS)]
        lines.append(f"{i}. {topic}")
        lines.append(f"the reported figures for this period reflect {c} across the group")
    return ("\n".join(lines) + "\n").encode("utf-8")


_GENERATORS: Dict[str, Callable[[int, str], bytes]] = {
    "docx": docx_bytes,
    "xlsx": xlsx_bytes,
    "pptx": pptx_bytes,
    "eml": eml_bytes,
    "mhtml": mhtml_bytes,
    "zip": archive_bytes,
    "7z": sevenzip_bytes,
    "rar": rar_bytes,
    "csv": csv_bytes,
    "law": law_bytes,
    "pdf2col": pdf_twocol_bytes,
    "odt": odt_bytes,
    "ods": ods_bytes,
    "odp": odp_bytes,
    "rtf": rtf_bytes,
    "law_ml": law_ml_bytes,
    "law_foiv": law_foiv_bytes,
    "fintoc": fintoc_bytes,
}

# legacy CFB formats live in their own module (binary writers)
from dedoc_ray.sources.cfb_writer import doc_bytes, ppt_bytes, xls_bytes  # noqa: E402

_GENERATORS["doc"] = doc_bytes
_GENERATORS["xls"] = xls_bytes
_GENERATORS["ppt"] = ppt_bytes


def tei_bytes(doc_id: int, text: str) -> bytes:
    """GROBID-style TEI for the article reader: title, 2 authors with
    affiliations, 3 keywords, abstract = chunk 0, one numbered section per
    chunk, 2 bibliography items; even doc_ids cite [1] in every paragraph."""
    chunks = chunks_of(text)
    words = (text.split(" ") + ["alpha", "beta", "gamma"])[:3]
    cite = doc_id % 2 == 0
    sections = []
    for i, c in enumerate(chunks, start=1):
        ref = '<ref type="bibr" target="#b0">[1]</ref> ' if cite else ""
        sections.append(
            f'<div><head n="{i}.">Section {i}</head><p>{ref}{escape(c)}</p></div>'
        )
    authors = "".join(
        f"<author><persName><forename type=\"first\">{fn}</forename>"
        f"<surname>{sn}</surname></persName><email>{fn.lower()}@synth.test</email>"
        f'<affiliation key="aff{i}"><orgName type="institution">Inst {i}</orgName>'
        f"<address><settlement>City {i}</settlement></address></affiliation></author>"
        for i, (fn, sn) in enumerate([("Alice", f"Author{doc_id % 5}"), ("Bob", f"Writer{doc_id % 3}")])
    )
    bib = (
        '<listBibl>'
        '<biblStruct xml:id="b0"><analytic><title level="a" type="main">Prior work one</title>'
        "<author><persName><forename>Carol</forename><surname>Cited</surname></persName></author></analytic>"
        '<monogr><imprint><biblScope unit="volume">4</biblScope>'
        '<biblScope unit="page" from="1" to="9"/><date>2020</date></imprint></monogr></biblStruct>'
        '<biblStruct xml:id="b1"><analytic><title level="j">Prior work two</title></analytic>'
        "<monogr><imprint><date>2021</date></imprint></monogr></biblStruct>"
        "</listBibl>"
    )
    xml = (
        '<TEI xmlns="http://www.tei-c.org/ns/1.0"><teiHeader><fileDesc>'
        f"<titleStmt><title>Article {doc_id}</title></titleStmt>"
        f"<sourceDesc><biblStruct>{authors}</biblStruct></sourceDesc></fileDesc>"
        "<profileDesc><textClass><keywords>"
        + "".join(f"<term>{escape(w)}</term>" for w in words)
        + "</keywords></textClass>"
        f"<abstract><p>{escape(chunks[0])}</p></abstract></profileDesc></teiHeader>"
        f'<text><body>{"".join(sections)}</body><back>{bib}</back></text></TEI>'
    )
    return xml.encode("utf-8")


_GENERATORS["article"] = tei_bytes


def note_bytes(doc_id: int, text: str) -> bytes:
    """.note.pickle payload: plain dict {content, author} — pickled
    containers only, loadable by the restricted unpickler. Expected
    extraction: replace(text,' the ',\\n) + '\\n'."""
    import pickle

    content = "\n".join(chunks_of(text)) + "\n"
    return pickle.dumps(
        {"content": content, "author": f"synth-author-{doc_id % 5}"}, protocol=4
    )


_GENERATORS["note"] = note_bytes


def tz_bytes(doc_id: int, text: str) -> bytes:
    """Technical-specification text: root line + one numbered requirement
    section per chunk (regex-skeleton path; 'text:' bodies never match)."""
    lines = [f"Technical specification {doc_id}"]
    for i, c in enumerate(chunks_of(text), 1):
        lines.append(f"{i}. requirement")
        lines.append(f"text: {c}")
    return ("\n".join(lines) + "\n").encode("utf-8")


_TZ_SEC_FORMS = ["Req. {i}:", "ТРЕБОВАНИЯ {i}", "Requirements {i}", "Раздел требований {i}",
                 "Section {i} requirements"]


def tz_ml_bytes(doc_id: int, text: str) -> bytes:
    """TZ text whose section headers rotate through variants the strict
    regexes do NOT match — the trained TzLineClassifier recovers them."""
    lines = ["ТЕХНИЧЕСКОЕ ЗАДАНИЕ"]
    for i, c in enumerate(chunks_of(text), 1):
        lines.append(_TZ_SEC_FORMS[(doc_id + i) % len(_TZ_SEC_FORMS)].format(i=i))
        lines.append(f"the provision body text reads {c} as specified in this clause")
    return ("\n".join(lines) + "\n").encode("utf-8")


def diploma_bytes(doc_id: int, text: str) -> bytes:
    """Thesis-like text: Introduction + one chapter per chunk + Conclusion
    (regex-skeleton path)."""
    lines = ["Introduction"]
    for i, c in enumerate(chunks_of(text), 1):
        lines.append(f"Chapter {i}")
        lines.append(f"text: {c}")
    lines.append("Conclusion")
    return ("\n".join(lines) + "\n").encode("utf-8")


_DIPLOMA_CHAP_FORMS = ["Гл. {i}", "CHAPTER {i}", "Chap. {i}.", "ГЛАВА {i}."]


def diploma_ml_bytes(doc_id: int, text: str) -> bytes:
    """Diploma text with chapter/named-part variants beyond the regexes."""
    lines = ["ВВЕДЕНИЕ"]
    for i, c in enumerate(chunks_of(text), 1):
        lines.append(_DIPLOMA_CHAP_FORMS[(doc_id + i) % len(_DIPLOMA_CHAP_FORMS)].format(i=i))
        lines.append(f"the narrative body of this chapter discusses {c} in further detail")
    lines.append("ЗАКЛЮЧЕНИЕ.")
    return ("\n".join(lines) + "\n").encode("utf-8")


_GENERATORS["tz"] = tz_bytes
_GENERATORS["tz_ml"] = tz_ml_bytes
_GENERATORS["diploma"] = diploma_bytes
_GENERATORS["diploma_ml"] = diploma_ml_bytes


def pdf_table_bytes(doc_id: int, text: str) -> bytes:
    """Text-layer PDF with a title line, a 3-column grid (one row per
    ' the '-chunk, cell text '{doc_id}r{i}c{j}') and a footer line — the
    tabby table-recognition corpus. Expected: 1 table,
    1 header + len(chunks) rows x 3 cols; extracted_text = title + footer."""
    ops = [f"BT /F1 12 Tf 72 760 Td (Table doc {doc_id}) Tj ET"]
    n_rows = len(chunks_of(text))
    for j, x in enumerate((72, 272, 472)):  # header row → grids always >=2 rows
        ops.append(f"BT /F1 10 Tf {x} 740 Td (h{j}) Tj ET")
    for i in range(n_rows):
        y = 720 - 20 * i
        for j, x in enumerate((72, 272, 472)):
            ops.append(f"BT /F1 10 Tf {x} {y} Td ({doc_id}r{i}c{j}) Tj ET")
    ops.append(f"BT /F1 12 Tf 72 {700 - 20 * n_rows} Td (footer {doc_id}) Tj ET")
    content = "\n".join(ops).encode("latin-1")
    return (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
            + b" >> stream\n" + content + b"\nendstream endobj\ntrailer\n%%EOF")


_GENERATORS["pdf_table"] = pdf_table_bytes

# scanned-document corpus (readers/scan_ocr.py OCR route): PGM page rasters
# and textless PDFs carrying the raster as an image XObject
from dedoc_ray.sources.scan_writer import (  # noqa: E402
    scan_2col_pgm,
    scan_bmp,
    scan_multifont_pgm,
    scan_pdf,
    scan_pdf_jbig2,
    scan_pdf_jbig2_sym,
    scan_exif_tiff,
    scan_tiff_multipage,
    scan_pgm,
    scan_png,
    scan_tiff,
)

_GENERATORS["scan"] = scan_pgm
_GENERATORS["scan_multifont"] = scan_multifont_pgm
_GENERATORS["scan2col"] = scan_2col_pgm
_GENERATORS["scan_bmp"] = scan_bmp
_GENERATORS["scan_png"] = scan_png
_GENERATORS["scan_tiff"] = scan_tiff
_GENERATORS["scan_exif"] = scan_exif_tiff
_GENERATORS["scan_tiff_mp"] = scan_tiff_multipage
_GENERATORS["pdf_scan"] = scan_pdf
_GENERATORS["pdf_scan_jbig2"] = scan_pdf_jbig2
_GENERATORS["pdf_scan_jbig2s"] = scan_pdf_jbig2_sym


def _scan_openfont(doc_id: int, text: str) -> bytes:
    # imported lazily: the open-font writer pulls the glyph rasterizer
    from dedoc_ray.sources.openfont_writer import scan_openfont_pgm

    return scan_openfont_pgm(doc_id, text)


_GENERATORS["scan_openfont"] = _scan_openfont

_EXT_OVERRIDE = {"law": "txt", "pdf2col": "pdf", "law_ml": "txt", "law_foiv": "txt", "fintoc": "txt",
                 "article": "tei", "note": "note.pickle", "pdf_table": "pdf",
                 "tz": "txt", "tz_ml": "txt", "diploma": "txt", "diploma_ml": "txt",
                 "scan": "pgm", "scan2col": "pgm", "scan_bmp": "bmp", "pdf_scan": "pdf",
                 "pdf_scan_jbig2": "pdf", "pdf_scan_jbig2s": "pdf", "scan_multifont": "pgm",
                 "scan_png": "png", "scan_tiff": "tif", "scan_exif": "tif", "scan_tiff_mp": "tif", "scan_openfont": "pgm"}


def office_pages_batch(batch: pa.Table, fmt: str) -> pa.Table:
    """documents rows → (url, html) payload rows for one format."""
    gen = _GENERATORS[fmt]
    urls, payloads = [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ext = _EXT_OVERRIDE.get(fmt, fmt)
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


def pdf_attach_bytes(doc_id: int, text: str) -> bytes:
    """Text-layer PDF carrying TWO embedded files through the reference's
    two routes: a root /Names → /EmbeddedFiles entry (raw stream) and a
    page-level /FileAttachment annotation (FlateDecode stream). Payload
    sizes are pure functions of doc_id so the manifest oracle is SQL:
    'report for doc {id}' and 3x'note {id};'."""
    import zlib as _z

    content = f"BT /F1 12 Tf 72 760 Td (Document {doc_id}) Tj ET".encode("latin-1")
    p1 = f"report for doc {doc_id}".encode()
    p2_raw = f"note {doc_id};".encode() * 3
    p2 = _z.compress(p2_raw)
    objs = [
        b"1 0 obj << /Type /Catalog /Names << /EmbeddedFiles << /Names "
        + f"[(report-{doc_id}.txt) 5 0 R] >> >> /Pages 2 0 R >> endobj".encode(),
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Annots [6 0 R] /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n" + content + b"\nendstream endobj",
        f"5 0 obj << /Type /Filespec /F (report-{doc_id}.txt) /UF (report-{doc_id}.txt) "
        f"/EF << /F 7 0 R >> >> endobj".encode(),
        b"6 0 obj << /Type /Annot /Subtype /FileAttachment /Rect [10 10 20 20] /FS 8 0 R >> endobj",
        b"7 0 obj << /Length " + str(len(p1)).encode() + b" >> stream\n" + p1 + b"\nendstream endobj",
        f"8 0 obj << /Type /Filespec /UF (note-{doc_id}.bin) /EF << /F 9 0 R >> >> endobj".encode(),
        b"9 0 obj << /Length " + str(len(p2)).encode() + b" /Filter /FlateDecode >> stream\n" + p2 + b"\nendstream endobj",
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


_GENERATORS["pdf_attach"] = pdf_attach_bytes
_EXT_OVERRIDE["pdf_attach"] = "pdf"


def pdf_para_bytes(doc_id: int, text: str) -> bytes:
    """Text-layer PDF with wrapped paragraphs: a flush-left title line
    (anchors the column x0), then one paragraph per ' the '-chunk — first
    visual line INDENTED 18pt with a 26pt leading, continuation line flush
    left with a 13pt leading. Correct paragraph merging reproduces
    'Document {id}\\n' + replace(text,' the ','\\n') + '\\n' byte-exactly;
    a reader without the classifier emits one line per VISUAL line and
    fails the oracle."""
    ops = [f"BT /F1 12 Tf 72 780 Td (Document {doc_id}) Tj ET"]
    y = 780.0
    for chunk in chunks_of(text):
        words = chunk.split(" ")
        k = (len(words) + 1) // 2
        first, second = words[:k], words[k:]
        y -= 26
        ops.append(f"BT /F1 10 Tf 90 {y:.0f} Td ({_pdf_escape(' '.join(first))}) Tj ET")
        if second:
            y -= 13
            ops.append(f"BT /F1 10 Tf 72 {y:.0f} Td ({_pdf_escape(' '.join(second))}) Tj ET")
    content = "\n".join(ops).encode("latin-1", errors="replace")
    return (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
            + b" >> stream\n" + content + b"\nendstream endobj\ntrailer\n%%EOF")


def pdf_info_bytes(doc_id: int, text: str) -> bytes:
    """Text-layer PDF with a trailer /Info dictionary whose every field is
    a pure function of doc_id (so the metadata oracle is SQL): Title is a
    UTF-16BE hex string (exercises the BOM decode path), CreationDate
    carries a +03'00' offset, ModDate the Z form. The reference extracts
    these through PyPDF2 (pdf_metadata_extractor.py:28-58); here the native
    object layer resolves the same dictionary."""
    content = f"BT /F1 12 Tf 72 760 Td (Document {doc_id}) Tj ET".encode("latin-1")
    s = doc_id % 86400
    hh, mm, ss = s // 3600, (s // 60) % 60, s % 60
    title_hex = "FEFF" + "".join(f"{ord(c):04X}" for c in f"Report {doc_id}")
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n" + content + b"\nendstream endobj",
        (
            f"5 0 obj << /Title <{title_hex}> /Author (Author {doc_id % 7}) "
            f"/Producer (SynthWriter 1.{doc_id % 5}) /Creator (Creator {doc_id % 3}) "
            f"/Subject (subject {doc_id % 11}) /Keywords (k1, k{doc_id % 9}) "
            f"/CreationDate (D:20200101{hh:02d}{mm:02d}{ss:02d}+03'00') "
            f"/ModDate (D:20210615083000Z) >> endobj"
        ).encode("latin-1"),
    ]
    return (
        b"%PDF-1.4\n" + b"\n".join(objs)
        + b"\ntrailer << /Root 1 0 R /Info 5 0 R >>\n%%EOF"
    )


_GENERATORS["pdf_info"] = pdf_info_bytes
_EXT_OVERRIDE["pdf_info"] = "pdf"


_GENERATORS["pdf_para"] = pdf_para_bytes
_EXT_OVERRIDE["pdf_para"] = "pdf"


def pdf_cid_bytes(doc_id: int, text: str) -> bytes:
    """Type0/CID PDF: text shown as 2-byte hex CIDs (code = ord + 0x100)
    mapped back through a /ToUnicode CMap; the first chunk is a TJ array
    that KERNS between words (-250/1000 em) instead of emitting space
    glyphs; the PAGE DICT lives inside a compressed /ObjStm. Exercises
    hex show-text, bfchar+bfrange CMap decode, TJ word-gap recovery and
    object-stream expansion in one document. Extracted text must equal
    the plain layout rendering (replace ' the '→newline), byte-exact."""
    import zlib as _z

    def cids(s: str) -> str:
        return "".join(f"{ord(c) + 0x100:04X}" for c in s)

    chunks = chunks_of(text)
    ops = []
    for i, chunk in enumerate(chunks):
        y = 760 - 14 * i
        if i == 0:
            words = chunk.split(" ")
            arr = " -250 ".join(f"<{cids(w)}>" for w in words)
            ops.append(f"BT /F1 12 Tf 72 {y} Td [{arr}] TJ ET")
        else:
            ops.append(f"BT /F1 12 Tf 72 {y} Td <{cids(chunk)}> Tj ET")
    content = "\n".join(ops).encode("latin-1")
    # bfchar covers 'a'..'e'; bfrange covers the full printable span —
    # both forms must be honored (bfchar wins by insertion, same values)
    bfchars = "\n".join(f"<{c + 0x100:04X}> <{c:04X}>" for c in range(ord("a"), ord("f")))
    cmap = f"""/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
5 beginbfchar
{bfchars}
endbfchar
1 beginbfrange
<0120> <017E> <0020>
endbfrange
endcmap
""".encode("latin-1")
    # page dict rides inside a FlateDecode ObjStm (PDF 1.5 layout)
    page_obj = b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
    objstm_payload = b"3 0 " + page_obj
    first = len(b"3 0 ")
    objstm = _z.compress(objstm_payload)
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n" + content + b"\nendstream endobj",
        b"5 0 obj << /Type /Font /Subtype /Type0 /BaseFont /Synth-CID /Encoding /Identity-H /ToUnicode 6 0 R >> endobj",
        b"6 0 obj << /Length " + str(len(cmap)).encode() + b" >> stream\n" + cmap + b"\nendstream endobj",
        b"7 0 obj << /Type /ObjStm /N 1 /First " + str(first).encode()
        + b" /Length " + str(len(objstm)).encode() + b" /Filter /FlateDecode >> stream\n"
        + objstm + b"\nendstream endobj",
    ]
    return b"%PDF-1.5\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


_GENERATORS["pdf_cid"] = pdf_cid_bytes
_EXT_OVERRIDE["pdf_cid"] = "pdf"


def pdf_encrypted_bytes(doc_id: int, text: str) -> bytes:
    """RC4-encrypted text-layer PDF (standard security handler V2/R3,
    128-bit, EMPTY user password — the silently-readable owner-locked
    shape): same line layout as the plain synthetic PDF, so the layout
    oracle applies unchanged once readers/pdf_crypt.py decrypts it."""
    import hashlib as _h
    import struct as _s

    from dedoc_ray.readers.pdf_crypt import _PAD, rc4
    from dedoc_ray.sources.synth import chunks_of

    ops = []
    for i, chunk in enumerate(chunks_of(text)):
        y = 760 - 14 * i
        safe = chunk.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"BT /F1 12 Tf 72 {y} Td ({safe}) Tj ET")
    content = "\n".join(ops).encode("latin-1")

    id0 = _h.md5(f"synthpdf-{doc_id}".encode()).digest()
    owner = _h.md5(f"owner-{doc_id}".encode()).digest() * 2  # opaque /O bytes
    p = 0xFFFFF0C0 - (1 << 32)  # typical owner-locked permission mask
    # Algorithm 2: file key for the EMPTY user password
    h = _h.md5()
    h.update(_PAD)
    h.update(owner[:32])
    h.update(_s.pack("<i", p))
    h.update(id0)
    key = h.digest()
    for _ in range(50):
        key = _h.md5(key[:16]).digest()
    key = key[:16]
    # Algorithm 5: /U entry
    u = rc4(key, _h.md5(_PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    u = u + b"\x00" * 16

    def obj_key(num: int) -> bytes:
        return _h.md5(key + _s.pack("<I", num)[:3] + b"\x00\x00").digest()[:16]

    enc_content = rc4(obj_key(4), content)

    def pdf_str(raw: bytes) -> bytes:
        return b"(" + raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)") + b")"

    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length " + str(len(enc_content)).encode() + b" >> stream\n" + enc_content + b"\nendstream endobj",
        b"5 0 obj << /Filter /Standard /V 2 /R 3 /Length 128 /P " + str(p).encode()
        + b" /O " + pdf_str(owner[:32]) + b" /U " + pdf_str(u) + b" >> endobj",
    ]
    trailer = (b"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [" + pdf_str(id0) + pdf_str(id0) + b"] >>")
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\n" + trailer + b"\n%%EOF"


_GENERATORS["pdf_encrypted"] = pdf_encrypted_bytes
_EXT_OVERRIDE["pdf_encrypted"] = "pdf"


def pdf_encrypted_aes256_bytes(doc_id: int, text: str) -> bytes:
    """AES-256 (V5/R6, AESV3) PDF with the EMPTY user password — the
    PDF 2.0 encryption shape. U/UE built per ISO 32000-2 Algorithm 8
    (validation + key salts, file key wrapped with the Algorithm-2.B
    hardened KDF); every stream AES-256-CBC encrypted with the ONE file
    key. Same layout as the plain synthetic PDF → same text oracle."""
    import hashlib as _h

    from dedoc_ray.readers.pdf_crypt import aes_cbc_encrypt, hash_r6
    from dedoc_ray.sources.synth import chunks_of

    ops = []
    for i, chunk in enumerate(chunks_of(text)):
        y = 760 - 14 * i
        safe = chunk.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"BT /F1 12 Tf 72 {y} Td ({safe}) Tj ET")
    content = "\n".join(ops).encode("latin-1")

    seed = _h.sha256(f"r6-{doc_id}".encode()).digest()
    file_key = seed  # 32 deterministic bytes
    # fixed corpus-wide salts: the hardened KDF costs ~0.2 s per distinct
    # salt by DESIGN; per-doc security comes from the per-doc file key
    vsalt = b"synthVS1"
    ksalt = b"synthKS1"
    u = hash_r6(b"", vsalt) + vsalt + ksalt
    ikey = hash_r6(b"", ksalt)
    ue = aes_cbc_encrypt(ikey, b"\x00" * 16, file_key)
    o = _h.sha256(f"owner-{doc_id}".encode()).digest() + b"\x00" * 16  # opaque
    oe = b"\x00" * 32

    iv = _h.md5(f"iv-{doc_id}".encode()).digest()
    pad = 16 - len(content) % 16
    enc_content = iv + aes_cbc_encrypt(file_key, iv, content + bytes([pad]) * pad)

    def pdf_str(raw: bytes) -> bytes:
        return b"(" + raw.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)") + b")"

    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj",
        b"4 0 obj << /Length " + str(len(enc_content)).encode() + b" >> stream\n" + enc_content + b"\nendstream endobj",
        b"5 0 obj << /Filter /Standard /V 5 /R 6 /Length 256 /P -1028 "
        b"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> /StmF /StdCF /StrF /StdCF "
        b"/U " + pdf_str(u) + b" /UE " + pdf_str(ue) + b" /O " + pdf_str(o) + b" /OE " + pdf_str(oe) + b" >> endobj",
    ]
    trailer = b"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [" + pdf_str(seed[:16]) + pdf_str(seed[:16]) + b"] >>"
    return b"%PDF-2.0\n" + b"\n".join(objs) + b"\n" + trailer + b"\n%%EOF"


_GENERATORS["pdf_encrypted_aes256"] = pdf_encrypted_aes256_bytes
_EXT_OVERRIDE["pdf_encrypted_aes256"] = "pdf"
