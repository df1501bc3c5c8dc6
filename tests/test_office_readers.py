"""Unit tests: docx / xlsx / pptx / eml / mhtml / archive kernels + sniffer.

Fixtures are built in-memory with stdlib zipfile/email — the same containers
the reference's test corpus exercises (tests/api_tests/test_api_format_docx
etc.), minus binary fixture files.
"""

from __future__ import annotations

import io
import tarfile
import zipfile

import pytest

from dedoc_ray.readers.archive import BadArchive, read_archive
from dedoc_ray.readers.email_reader import read_eml, read_mhtml
from dedoc_ray.readers.office import BadOfficeFile, read_docx, read_pptx, read_xlsx
from dedoc_ray.readers.sniff import sniff_format

W_NS = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
S_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
P_NS = ('xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"')


def zip_bytes(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in entries:
            zf.writestr(name, content)
    return buf.getvalue()


def docx_bytes(body_xml: str) -> bytes:
    return zip_bytes([
        ("word/document.xml", f'<?xml version="1.0"?><w:document {W_NS}><w:body>{body_xml}</w:body></w:document>'),
    ])


# ----------------------------------------------------------------- docx


def test_docx_headings_runs_annotations():
    doc = read_docx(docx_bytes(
        '<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>Section</w:t></w:r></w:p>'
        '<w:p><w:r><w:rPr><w:b/><w:i/></w:rPr><w:t>both</w:t></w:r><w:r><w:t> plain</w:t></w:r></w:p>'
        '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/></w:numPr></w:pPr><w:r><w:t>item</w:t></w:r></w:p>'
    ))
    # reference __fix_lines: "\n" joins only equal-level unknown pairs —
    # header and list item stay bare, and the last line never gains one
    assert [l.line for l in doc.lines] == ["Section", "both plain", "item"]
    hl0 = doc.lines[0].metadata.tag_hierarchy_level
    # reference __get_heading_level: "heading N" maps to N + 1 ("Title" is 1)
    assert (hl0.level_1, hl0.level_2, hl0.line_type) == (1, 3, "header")
    names = {(a.name, a.start, a.end) for a in doc.lines[1].annotations}
    # paragraph-wide indentation/alignment/spacing/size always present
    # (reference line_with_meta_converter.py:35-49); bold/italic per run
    assert {("bold", 0, 4), ("italic", 0, 4)} <= names
    assert {n for n, _, _ in names} == {"bold", "italic", "indentation",
                                        "alignment", "spacing", "size"}
    assert doc.lines[2].metadata.tag_hierarchy_level.line_type == "list_item"


def test_docx_table_gridspan_vmerge():
    doc = read_docx(docx_bytes(
        "<w:tbl>"
        '<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>'
        '<w:tc><w:tcPr><w:gridSpan w:val="2"/></w:tcPr><w:p><w:r><w:t>wide</w:t></w:r></w:p></w:tc></w:tr>'
        '<w:tr><w:tc><w:tcPr><w:vMerge w:val="restart"/></w:tcPr><w:p><w:r><w:t>tall</w:t></w:r></w:p></w:tc>'
        '<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>c</w:t></w:r></w:p></w:tc></w:tr>'
        '<w:tr><w:tc><w:tcPr><w:vMerge/></w:tcPr><w:p/></w:tc>'
        '<w:tc><w:p><w:r><w:t>d</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>e</w:t></w:r></w:p></w:tc></w:tr>'
        "</w:tbl>"
    ))
    [table] = doc.tables
    texts = [[c.get_text() for c in row] for row in table.cells]
    assert texts == [["a", "wide", "wide"], ["tall", "b", "c"], ["tall", "d", "e"]]
    assert table.cells[0][1].colspan == 2 and not table.cells[0][1].invisible
    assert table.cells[0][2].invisible
    assert table.cells[1][0].rowspan == 2 and not table.cells[1][0].invisible
    assert table.cells[2][0].invisible and table.cells[2][0].rowspan == 2


def test_docx_bad_container():
    with pytest.raises(BadOfficeFile):
        read_docx(b"not a zip at all")
    with pytest.raises(BadOfficeFile):
        read_docx(zip_bytes([("other.txt", "x")]))


# ----------------------------------------------------------------- xlsx


def test_xlsx_shared_strings_and_grid():
    data = zip_bytes([
        ("xl/sharedStrings.xml", f'<?xml version="1.0"?><sst {S_NS}><si><t>alpha</t></si><si><t>beta</t></si></sst>'),
        ("xl/worksheets/sheet1.xml",
         f'<?xml version="1.0"?><worksheet {S_NS}><sheetData>'
         '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1"><v>7</v></c></row>'
         '<row r="2"><c r="B2" t="s"><v>1</v></c></row>'
         "</sheetData></worksheet>"),
        ("xl/worksheets/sheet2.xml",
         f'<?xml version="1.0"?><worksheet {S_NS}><sheetData>'
         '<row r="1"><c r="A1"><v>9</v></c></row></sheetData></worksheet>'),
    ])
    doc = read_xlsx(data)
    assert len(doc.tables) == 2
    t0 = doc.tables[0]
    assert [[c.get_text() for c in row] for row in t0.cells] == [["alpha", "", "7.0"], ["", "beta", ""]]
    assert t0.page_id == 0 and doc.tables[1].page_id == 1
    assert doc.lines == []


# ----------------------------------------------------------------- pptx


def test_pptx_title_and_body():
    data = zip_bytes([
        ("ppt/slides/slide1.xml",
         f'<?xml version="1.0"?><p:sld {P_NS}><p:cSld><p:spTree>'
         "<p:sp><p:txBody><a:p><a:r><a:t>The Title</a:t></a:r></a:p></p:txBody></p:sp>"
         "<p:sp><p:txBody><a:p><a:r><a:t>body one</a:t></a:r></a:p></p:txBody></p:sp>"
         "</p:spTree></p:cSld></p:sld>"),
        ("ppt/slides/slide2.xml",
         f'<?xml version="1.0"?><p:sld {P_NS}><p:cSld><p:spTree>'
         "<p:sp><p:txBody><a:p><a:r><a:t>Second</a:t></a:r></a:p></p:txBody></p:sp>"
         "</p:spTree></p:cSld></p:sld>"),
    ])
    doc = read_pptx(data)
    assert [l.line for l in doc.lines] == ["The Title\n", "body one\n", "Second\n"]
    assert doc.lines[0].metadata.tag_hierarchy_level.line_type == "header"
    assert doc.lines[1].metadata.tag_hierarchy_level.line_type == "unknown"
    assert [l.metadata.page_id for l in doc.lines] == [0, 0, 1]


# ----------------------------------------------------------------- eml / mhtml


def test_eml_subject_plain_and_attachment():
    eml = (b"From: a@example.com\r\nTo: b@example.com\r\nSubject: Greetings\r\n"
           b"MIME-Version: 1.0\r\nContent-Type: multipart/mixed; boundary=BB\r\n\r\n"
           b"--BB\r\nContent-Type: text/plain\r\n\r\nhello\r\nworld\r\n"
           b"--BB\r\nContent-Type: application/octet-stream\r\n"
           b"Content-Disposition: attachment; filename=data.bin\r\n\r\nBINBIN\r\n--BB--\r\n")
    doc = read_eml(eml)
    # reference shape: root subject + typed field lines (subject/from/to),
    # then the body split per newline; header json attachment leads
    assert doc.lines[0].line == "Greetings"
    assert doc.lines[0].metadata.tag_hierarchy_level.line_type == "root"
    types = [l.metadata.tag_hierarchy_level.line_type for l in doc.lines[1:4]]
    assert types == ["subject", "from", "to"]
    assert [l.line for l in doc.lines[1:4]] == ["Greetings", "a@example.com", "b@example.com"]
    body = [l.line for l in doc.lines[4:]]
    # reference splits the decoded payload on "\n" only, so CRLF bodies
    # keep the "\r" (email_reader.py __add_text_content)
    assert body[:2] == ["hello\r\n", "world\n"]
    assert doc.attachments[0][0].startswith("message_header_")
    assert doc.attachments[-1] == ("data.bin", 6, b"BINBIN")


def test_eml_html_part_delegates_to_html_reader():
    eml = (b"From: x@y.z\r\nSubject: S\r\nMIME-Version: 1.0\r\n"
           b"Content-Type: text/html\r\n\r\n<html><body><p>para text</p></body></html>\r\n")
    doc = read_eml(eml)
    assert any("para text" in l.line for l in doc.lines)


def test_mhtml_html_parts():
    mhtml = (b"MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary=MM\r\n\r\n"
             b"--MM\r\nContent-Type: text/html\r\nContent-Location: http://a/\r\n\r\n"
             b"<html><body><p>first page</p></body></html>\r\n"
             b"--MM\r\nContent-Type: image/png\r\nContent-Location: http://a/i.png\r\n\r\nPNGPNG\r\n--MM--\r\n")
    doc = read_mhtml(mhtml)
    assert any("first page" in l.line for l in doc.lines)
    # basename of Content-Location, reference mhtml_reader.py:93-94
    assert doc.attachments == [("i.png", 6, b"PNGPNG")]


# ----------------------------------------------------------------- archive


def test_archive_zip_and_tar_members():
    z = zip_bytes([("a.txt", "xx"), ("dir/b.txt", "yyy")])
    doc = read_archive(z)
    assert [(n, sz) for n, sz, _ in doc.attachments] == [("a.txt", 2), ("dir/b.txt", 3)]
    assert doc.lines == [] and doc.tables == []

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        info = tarfile.TarInfo("m.txt")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"abcd"))
    doc = read_archive(buf.getvalue())
    assert [(n, sz) for n, sz, _ in doc.attachments] == [("m.txt", 4)]


def test_archive_rar_native_listing():
    # rar is no longer stubbed: the container parses natively
    # (readers/rar.py); garbage after a valid signature yields an empty
    # member list rather than an exception
    doc = read_archive(b"Rar!\x1a\x07\x00garbage")
    assert doc.attachments == []

    from dedoc_ray.readers.rar import rar_encode_stored

    doc2 = read_archive(rar_encode_stored([("a.txt", b"hi"), ("b.txt", b"there")]))
    assert [(a[0], a[1]) for a in doc2.attachments] == [("a.txt", 2), ("b.txt", 5)]


# ----------------------------------------------------------------- sniffer


def test_sniff_new_formats_by_extension_and_content():
    docx = docx_bytes("<w:p><w:r><w:t>t</w:t></w:r></w:p>")
    xlsx = zip_bytes([("xl/workbook.xml", "<x/>")])
    pptx = zip_bytes([("ppt/presentation.xml", "<x/>")])
    plain_zip = zip_bytes([("member.bin", "data")])
    assert sniff_format("https://x/f.docx", b"") == "docx"
    assert sniff_format("https://x/f", docx) == "docx"
    assert sniff_format("https://x/f", xlsx) == "xlsx"
    assert sniff_format("https://x/f", pptx) == "pptx"
    assert sniff_format("https://x/f", plain_zip) == "archive"
    assert sniff_format("https://x/f.eml", b"") == "eml"
    eml = b"From: a@b.c\nSubject: s\nDate: today\n\nbody"
    assert sniff_format("https://x/f", eml) == "eml"
    mhtml = b"MIME-Version: 1.0\nContent-Type: multipart/related; boundary=q\n\nx"
    assert sniff_format("https://x/f", mhtml) == "mhtml"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("a")
        info.size = 0
        tf.addfile(info, io.BytesIO(b""))
    assert sniff_format("https://x/f", buf.getvalue()) == "archive"


def test_archive_content_analysis():
    from dedoc_ray.pipeline.config import PipelineConfig
    from dedoc_ray.pipeline.kernel import ExtractKernel
    import pyarrow as pa

    z = zip_bytes([
        ("doc.html", "<html><body><p>member para</p></body></html>"),
        ("notes.txt", "plain member text"),
        ("blob.bin", b"\xff\xfe\xfa\x00".decode("latin-1")),
    ])
    batch = pa.Table.from_pydict({"url": ["https://x/a.zip"], "html": [z]})

    plain = ExtractKernel()(batch).to_pylist()[0]
    assert plain["extracted_text"] == ""
    assert len(plain["attachments"]) == 3

    deep = ExtractKernel(config=PipelineConfig(need_content_analysis=True))(batch).to_pylist()[0]
    assert "member para" in deep["extracted_text"]
    assert "plain member text" in deep["extracted_text"]
    assert len(deep["attachments"]) == 3
    assert any("content analysis parsed 2 members" in w for w in deep["warnings"])
    assert any("blob.bin" in w for w in deep["warnings"])
