"""Tests: TEI article reader (GROBID response format, parsed natively)."""

from __future__ import annotations

import pytest

from dedoc_ray.readers.article import BadTeiFile, read_tei
from dedoc_ray.sources.synth_office import tei_bytes

TEXT = "key agg the row scan the table value"


def _types(doc):
    return [l.metadata.tag_hierarchy_level.line_type for l in doc.lines]


def test_tei_line_type_taxonomy():
    doc = read_tei(tei_bytes(4, TEXT))
    types = _types(doc)
    assert types[0] == "root"
    assert doc.lines[0].line == "Article 4"
    # header authors: two author groups with name parts + email + affiliation
    assert types.count("author_first_name") == 2
    assert types.count("author_surname") == 2
    assert types.count("email") == 2
    assert types.count("org_name") == 2
    assert types.count("address") == 2
    assert types.count("keyword") == 3
    assert "abstract" in types
    assert types.count("section") == 3  # three chunks → three numbered heads
    assert types.count("bibliography_item") == 2
    assert "biblScope_volume" in types and "biblScope_page" in types
    assert types.count("date") == 2


def test_tei_section_numbering_and_depth():
    doc = read_tei(tei_bytes(4, TEXT))
    sections = [l for l in doc.lines if l.metadata.tag_hierarchy_level.line_type == "section"]
    assert [s.line for s in sections] == ["1. Section 1", "2. Section 2", "3. Section 3"]
    assert all(s.metadata.tag_hierarchy_level.level_1 == 1 for s in sections)


def test_tei_citation_annotations_resolve_to_bib_items():
    doc = read_tei(tei_bytes(4, TEXT))  # even id → citations present
    refs = [a for l in doc.lines for a in l.annotations if a.name == "reference"]
    assert len(refs) == 3
    bib_items = [l for l in doc.lines if l.metadata.tag_hierarchy_level.line_type == "bibliography_item"]
    assert all(r.value == bib_items[0].uid for r in refs)
    # span covers the "[1]" citation text
    para = next(l for l in doc.lines if l.annotations)
    a = para.annotations[0]
    assert para.line[a.start : a.end] == "[1]"


def test_tei_odd_doc_has_no_citations():
    doc = read_tei(tei_bytes(5, TEXT))
    assert not any(a.name == "reference" for l in doc.lines for a in l.annotations)


def test_tei_dotted_depth():
    from dedoc_ray.readers.article import _dotted_depth

    assert _dotted_depth("4.1.1 ") == 3
    assert _dotted_depth("2. ") == 1
    assert _dotted_depth("") == 0
    assert _dotted_depth("abc") == 0


def test_tei_bad_file():
    with pytest.raises(BadTeiFile):
        read_tei(b"not xml <<<")


def test_tei_metadata_title():
    doc = read_tei(tei_bytes(9, TEXT))
    assert doc.metadata["title"] == "Article 9"
    assert any("GROBID service stubbed" in w for w in doc.warnings)
