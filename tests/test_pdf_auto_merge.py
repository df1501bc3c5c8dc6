"""Tests: PdfAuto first-page merge + spacing annotations from the layer."""

from __future__ import annotations

from dedoc_ray.core.annotation import Annotation, AnnotationNames as AN
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.table import Table
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.pdf import merge_partial_docs, read_pdf_auto, read_pdf_textlayer


def _line(text, page_id=0, line_id=0, annotations=None):
    return LineWithMeta(text, metadata=LineMetadata(page_id=page_id, line_id=line_id),
                        annotations=annotations or [])


def test_merge_renumbers_and_drops_first_page_tables():
    t0 = Table([], page_id=0, uid="t0")
    t1 = Table([], page_id=1, uid="t1")
    first = UnstructuredDoc(lines=[_line("ocr first\n")], tables=[Table([], page_id=0, uid="ocr_t")])
    second = UnstructuredDoc(
        lines=[
            _line("body a\n", 0, 0, [Annotation(0, 6, AN.table, "t0")]),
            _line("body b\n", 1, 1, [Annotation(0, 6, AN.table, "t1")]),
        ],
        tables=[t0, t1],
        metadata={"title": "second"},
    )
    merged = merge_partial_docs(first, second)
    assert [l.metadata.line_id for l in merged.lines] == [0, 1, 2]
    assert [t.uid for t in merged.tables] == ["ocr_t", "t1"]
    # table annotation for the dropped page-0 table is filtered; t1's stays
    assert merged.lines[1].annotations == []
    assert [a.value for a in merged.lines[2].annotations] == ["t1"]
    assert merged.metadata["title"] == "second"


def _two_page_pdf(first_page_lines, second_page_lines):
    from dedoc_ray.readers.html2pdf import render_pdf

    # render_pdf paginates at 50 lines — pad page 1 to force a page break
    lines = first_page_lines + [""] * (50 - len(first_page_lines)) + second_page_lines
    return render_pdf(lines)


def test_auto_reroutes_garbage_first_page_and_merges():
    garbage = ["qzx9 #@!$ vvv 0101010 zzz kqj"] * 3
    body = ["the quick brown fox jumps over the lazy dog again and again"] * 5
    pdf = _two_page_pdf(garbage, body)
    # sanity: the full layer IS correct overall (body dominates)
    injected = []

    def fake_first_page(data: bytes):
        injected.append(True)
        return UnstructuredDoc(lines=[_line("recovered first page\n")], warnings=["fake ocr"])

    doc = read_pdf_auto(pdf, first_page_reader=fake_first_page)
    if injected:  # classifier flagged page 0 → merge ran
        assert doc.lines[0].line == "recovered first page\n"
        assert all(l.metadata.page_id != 0 for l in doc.lines[1:])
        assert [l.metadata.line_id for l in doc.lines] == list(range(len(doc.lines)))
        assert "fake ocr" in doc.warnings
    else:  # classifier accepted the garbage — merge must NOT have mangled doc
        assert len(doc.lines) >= len(body)


def test_spacing_annotations_from_baselines():
    from dedoc_ray.readers.html2pdf import render_pdf

    doc = read_pdf_textlayer(render_pdf([f"line {i}" for i in range(5)]), one_column=True)
    spac = [a for l in doc.lines for a in l.annotations if a.name == AN.spacing]
    assert len(spac) == 5
    # uniform 14pt baselines → every gap (and the first line's median) is 14
    assert {a.value for a in spac} == {"14"}


# ------------------------------------------------ pdf attachments


def _pdf_with(objs: list) -> bytes:
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def test_pdf_attachments_two_routes_and_flate():
    from dedoc_ray.readers.pdf_attachments import extract_pdf_attachments
    from dedoc_ray.sources.synth_office import pdf_attach_bytes

    atts = extract_pdf_attachments(pdf_attach_bytes(7, "a the b"))
    assert [(a[0], a[1]) for a in atts] == [("report-7.txt", 16), ("note-7.bin", 21)]
    assert atts[0][2] == b"report for doc 7"
    assert atts[1][2] == b"note 7;" * 3


def test_pdf_attachments_dedupes_shared_filespec():
    from dedoc_ray.readers.pdf_attachments import extract_pdf_attachments

    data = _pdf_with(
        [
            b"1 0 obj << /Names << /EmbeddedFiles << /Names [(f.txt) 5 0 R] >> >> >> endobj",
            b"6 0 obj << /Subtype /FileAttachment /FS 5 0 R >> endobj",
            b"5 0 obj << /Type /Filespec /UF (f.txt) /EF << /F 7 0 R >> >> endobj",
            b"7 0 obj << /Length 2 >> stream\nhi\nendstream endobj",
        ]
    )
    atts = extract_pdf_attachments(data)
    assert [(a[0], a[2]) for a in atts] == [("f.txt", b"hi")]


def test_pdf_attachments_corrupt_flate_fails_closed():
    from dedoc_ray.readers.pdf_attachments import extract_pdf_attachments

    data = _pdf_with(
        [
            b"5 0 obj << /Type /Filespec /UF (x\\(1\\).bin) /EF << /F 7 0 R >> >> endobj",
            b"6 0 obj << /Subtype /FileAttachment /FS 5 0 R >> endobj",
            b"7 0 obj << /Length 4 /Filter /FlateDecode >> stream\nnope\nendstream endobj",
        ]
    )
    atts = extract_pdf_attachments(data)
    assert atts == [("x(1).bin", 0, b"")]


def test_pdf_attachments_none_on_plain_pdf():
    from dedoc_ray.readers.pdf_attachments import extract_pdf_attachments
    from dedoc_ray.sources.synth_office import pdf_table_bytes

    assert extract_pdf_attachments(pdf_table_bytes(1, "a the b")) == []
