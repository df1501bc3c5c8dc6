"""Tests: NoteReader (restricted unpickler) + Html2PdfReader round trip."""

from __future__ import annotations

import pickle

import pytest

from dedoc_ray.readers.html2pdf import read_html2pdf, render_pdf
from dedoc_ray.readers.note import BadNoteFile, read_note
from dedoc_ray.sources.synth import page_bytes

TEXT = "key agg the row scan the table value part"


# ------------------------------------------------------------------ note


def test_note_roundtrip():
    blob = pickle.dumps({"content": "hello\nworld\n", "author": "a"}, protocol=4)
    doc = read_note(blob)
    assert doc.lines[0].line == "hello\nworld\n"
    assert doc.metadata["author"] == "a"


def test_note_bytes_content_decoded():
    blob = pickle.dumps({"content": b"raw bytes"}, protocol=4)
    assert read_note(blob).lines[0].line == "raw bytes"


def test_note_rejects_code_carrying_pickles():
    # hand-crafted GLOBAL opcode (the classic os.system gadget shape)
    with pytest.raises(BadNoteFile):
        read_note(b"cos\nsystem\n.")
    with pytest.raises(BadNoteFile):
        read_note(b"garbage not pickle")
    with pytest.raises(BadNoteFile):
        read_note(pickle.dumps({"no_content": 1}))


def test_note_sniff_and_generator():
    from dedoc_ray.readers.sniff import sniff_format
    from dedoc_ray.sources.synth_office import note_bytes

    blob = note_bytes(7, TEXT)
    assert sniff_format("https://x/7.note.pickle", blob) == "note"
    doc = read_note(blob)
    assert doc.lines[0].line == "key agg\nrow scan\ntable value part\n"
    assert doc.metadata["author"] == "synth-author-2"


# -------------------------------------------------------------- html2pdf


def test_html2pdf_plain_classes_byte_exact():
    from dedoc_ray.readers.html.reader import read_html

    for doc_id in (10, 21, 32, 43):  # template classes 0-3
        hb = page_bytes(doc_id, TEXT, "en")
        a = "".join(l.line for l in read_html(hb).lines)
        b = "".join(l.line for l in read_html2pdf(hb).lines)
        assert a == b


def test_html2pdf_reattaches_tables_with_annotation():
    hb = page_bytes(16, TEXT, "en")  # rich class: has a table
    doc = read_html2pdf(hb)
    assert len(doc.tables) == 1
    uid = doc.tables[0].uid
    # no placeholder line survives; previous line carries the table annotation
    assert not any(l.line.strip() == uid for l in doc.lines)
    ann = [a for l in doc.lines for a in l.annotations if a.name == "table"]
    assert [a.value for a in ann] == [uid]


def test_render_pdf_paginates():
    lines = [f"line {i}" for i in range(120)]  # 3 pages at 50/page
    pdf = render_pdf(lines)
    assert pdf.count(b"/Type /Page ") == 3
    from dedoc_ray.readers.pdf import read_pdf_textlayer

    doc = read_pdf_textlayer(pdf, one_column=True)
    assert [l.line for l in doc.lines] == [f"line {i}\n" for i in range(120)]
    assert {l.metadata.page_id for l in doc.lines} == {0, 1, 2}
