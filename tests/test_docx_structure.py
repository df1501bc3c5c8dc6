"""DocX numbering engine + item/subitem split postprocess tests."""

import re

from dedoc_ray.core.annotation import Annotation
from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.readers.docx_numbering import format_number
from dedoc_ray.readers.office import read_docx
from dedoc_ray.sources.synth_office import DOCX_LIST_TEXT, docx_bytes
from dedoc_ray.structure.postprocess import (
    REGEXPS_DIGITS_WITH_DOTS,
    REGEXPS_ENDS_OF_NUMBER,
    split_prefix_lines,
)


def test_format_number_formats():
    assert format_number("decimal", 0) == "1"
    assert format_number("decimal", 41) == "42"
    assert format_number("lowerLetter", 0) == "a"
    assert format_number("lowerLetter", 25) == "z"
    assert format_number("lowerLetter", 26) == "aa"  # reference repetition scheme
    assert format_number("upperLetter", 1) == "B"
    assert format_number("lowerRoman", 0) == "i"
    # reference NumberingFormatter is additive-only roman (no iv/ix)
    assert format_number("lowerRoman", 3) == "iiii"
    assert format_number("upperRoman", 8) == "VIIII"
    assert format_number("russianLower", 0) == "а"
    assert format_number("none", 5) == ""


def test_docx_numbered_list_bytes_exact():
    doc = read_docx(docx_bytes(3, "alpha the beta"))
    # reader lines are reference-exact (conditional "\n" per __fix_lines);
    # the kernel joins with one "\n" per paragraph like json2txt — replay it
    text = "".join(l.line if l.line.endswith("\n") else l.line + "\n" for l in doc.lines)
    assert text == "Document 3\nalpha\nbeta\n" + DOCX_LIST_TEXT


def test_docx_numbering_restarts_sublevel():
    """A second visit to ilvl=0 after ilvl=1 continues the outer counter;
    re-entering ilvl=1 later restarts it (lvlRestart default)."""
    from dedoc_ray.readers.docx_numbering import NumberingEngine
    from xml.etree import ElementTree

    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    xml = f"""<w:numbering xmlns:w="{W}">
      <w:abstractNum w:abstractNumId="0">
        <w:lvl w:ilvl="0"><w:start w:val="1"/><w:numFmt w:val="decimal"/>
          <w:lvlText w:val="%1."/><w:suff w:val="nothing"/></w:lvl>
        <w:lvl w:ilvl="1"><w:start w:val="1"/><w:numFmt w:val="lowerLetter"/>
          <w:lvlText w:val="%2)"/><w:suff w:val="nothing"/></w:lvl>
      </w:abstractNum>
      <w:num w:numId="5"><w:abstractNumId w:val="0"/></w:num>
    </w:numbering>"""
    eng = NumberingEngine(ElementTree.fromstring(xml))
    seq = [("5", "0"), ("5", "1"), ("5", "1"), ("5", "0"), ("5", "1")]
    got = [eng.prefix(n, i)[0] for n, i in seq]
    assert got == ["1.", "a)", "b)", "2.", "a)"]


def test_docx_metadata_core_properties():
    doc = read_docx(docx_bytes(7, "x the y"))
    assert doc.metadata["title"] == "Document 7"
    assert doc.metadata["author"] == "synth-author-2"
    assert doc.metadata["created"] == "2024-01-01T00:00:00Z"


def _line(text, line_type, annotations=None):
    hl = HierarchyLevel(2, 1, False, line_type)
    return LineWithMeta(text, metadata=LineMetadata(hierarchy_level=hl), annotations=annotations or [], uid="u1")


def test_split_prefix_keeps_total_text():
    lines = [_line("1.2. the clause text\n", "item")]
    out = split_prefix_lines(lines, ("item",), (REGEXPS_DIGITS_WITH_DOTS,), (REGEXPS_ENDS_OF_NUMBER,))
    assert len(out) == 2
    assert out[0].line == "1.2."
    assert out[1].line == " the clause text\n"
    assert out[0].line + out[1].line == lines[0].line
    assert out[0].metadata.hierarchy_level.line_type == "item"
    assert out[1].metadata.hierarchy_level.is_raw_text()
    assert out[1].uid == "u1_split"


def test_split_prefix_annotation_reslicing():
    # bold over "1.2. the" [0,8); italic over "clause" [9,15)
    ann = [Annotation(0, 8, "bold", "True"), Annotation(9, 15, "italic", "True")]
    lines = [_line("1.2. the clause\n", "item", ann)]
    out = split_prefix_lines(lines, ("item",), (REGEXPS_DIGITS_WITH_DOTS,), (REGEXPS_ENDS_OF_NUMBER,))
    # prefix "1.2." keeps the clipped bold [0,4)
    assert [(a.start, a.end, a.name) for a in out[0].annotations] == [(0, 4, "bold")]
    # remainder " the clause\n" re-bases: bold [0,4), italic [5,11)
    assert [(a.start, a.end, a.name) for a in out[1].annotations] == [(0, 4, "bold"), (5, 11, "italic")]


def test_split_non_matching_and_other_types_untouched():
    raw = LineWithMeta("plain\n", metadata=LineMetadata(hierarchy_level=HierarchyLevel.create_raw_text()))
    item = _line("no prefix here\n", "item")
    out = split_prefix_lines([raw, item], ("item",), (REGEXPS_DIGITS_WITH_DOTS,), (REGEXPS_ENDS_OF_NUMBER,))
    assert [l.line for l in out] == ["plain\n", "no prefix here\n"]


def test_split_drops_empty_raw_text():
    empty = LineWithMeta("", metadata=LineMetadata(hierarchy_level=HierarchyLevel.create_raw_text()))
    out = split_prefix_lines([empty], ("item",), (REGEXPS_DIGITS_WITH_DOTS,), (REGEXPS_ENDS_OF_NUMBER,))
    assert out == []


def test_docx_alignment_indent_annotations():
    from dedoc_ray.sources.synth_office import _zip_bytes

    W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
    xml = (f'<?xml version="1.0"?><w:document {W}><w:body>'
           '<w:p><w:pPr><w:jc w:val="center"/><w:ind w:firstLine="708"/></w:pPr>'
           '<w:r><w:t>centered and indented</w:t></w:r></w:p>'
           '</w:body></w:document>')
    doc = read_docx(_zip_bytes([("word/document.xml", xml)]))
    anns = {(a.name, a.value) for a in doc.lines[0].annotations}
    assert ("alignment", "center") in anns
    assert ("indentation", "708.0") in anns  # reference str(float) form


def test_docx_footnotes_linked_text():
    from dedoc_ray.readers.office import read_docx
    from dedoc_ray.sources.synth_office import docx_bytes

    doc = read_docx(docx_bytes(9, "alpha the beta"))
    notes = [a for l in doc.lines for a in l.annotations if a.name == "linked_text"]
    assert [a.value for a in notes] == ["note for doc 9"]
    # annotation sits on the first BODY paragraph, spans its pre-newline text
    line = next(l for l in doc.lines if any(a.name == "linked_text" for a in l.annotations))
    assert line.line == "alpha\n"
    # __fix_lines stretches annotations over the joining newline between
    # consecutive unknown-type lines (reference docx_reader.py:46-51)
    assert (notes[0].start, notes[0].end) == (0, len("alpha\n"))
