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
