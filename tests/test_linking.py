"""Line↔table linking + multipage table merge tests."""

from dedoc_ray.core.hierarchy import HierarchyLevel
from dedoc_ray.core.line import LineMetadata, LineWithMeta
from dedoc_ray.core.object_linker import link_line_objects
from dedoc_ray.core.table import CellWithMeta, Table, merge_multipage_tables


def _line(text, page_id=0):
    return LineWithMeta(text, metadata=LineMetadata(page_id=page_id, hierarchy_level=HierarchyLevel.create_raw_text()))


def _table(page_id=0, uid="t0", order=None, rows=1, cols=2):
    cells = [[CellWithMeta([LineWithMeta("c")]) for _ in range(cols)] for _ in range(rows)]
    return Table(cells, page_id=page_id, uid=uid, order=order)


def test_link_prefers_caption_line():
    lines = [_line("intro\n"), _line("Table 1: results\n"), _line("after\n")]
    link_line_objects(lines, [_table(order=2, uid="tbl_a")])
    # anchor=2 → "after" (dist 0) vs "Table 1:" (dist 1 - 0.5 = 0.5): after wins on pure distance?
    # "after" has dist 0, caption 0.5 → after. Caption bonus only breaks ties at equal distance.
    annotated = [ln for ln in lines if any(a.name == "table" for a in ln.annotations)]
    assert len(annotated) == 1


def test_link_caption_wins_tie():
    lines = [_line("Table 1: results\n"), _line("data data\n")]
    link_line_objects(lines, [_table(order=1, uid="tbl_a")])
    # anchor=1: caption dist 1-0.5=0.5, "data data" dist 0 → data; with anchor between
    # them both at dist 0.5 the caption wins
    lines2 = [_line("Table 1: results\n"), _line("\n")]
    link_line_objects(lines2, [_table(order=1, uid="tbl_b")])
    assert any(a.value == "tbl_b" for a in lines2[0].annotations)  # empty line repelled


def test_link_falls_back_to_previous_page():
    lines = [_line("page0 last\n", page_id=0)]
    link_line_objects(lines, [_table(page_id=1, uid="tbl_c")])
    assert any(a.name == "table" and a.value == "tbl_c" for a in lines[0].annotations)


def test_link_no_lines_noop():
    link_line_objects([], [_table()])  # must not raise


def test_docx_table_gets_link_annotation():
    from dedoc_ray.readers.office import read_docx
    from dedoc_ray.sources.synth_office import _zip_bytes

    W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
    xml = (f'<?xml version="1.0"?><w:document {W}><w:body>'
           '<w:p><w:r><w:t>Table 1 caption</w:t></w:r></w:p>'
           '<w:tbl><w:tr><w:tc><w:p><w:t>a</w:t></w:p></w:tc></w:tr></w:tbl>'
           '</w:body></w:document>')
    doc = read_docx(_zip_bytes([("word/document.xml", xml)]))
    assert doc.tables[0].order == 1


def test_merge_multipage_tables():
    t0 = _table(page_id=0, uid="a", rows=2, cols=3)
    t1 = _table(page_id=1, uid="b", rows=1, cols=3)  # continuation
    t2 = _table(page_id=1, uid="c", rows=1, cols=2)  # different arity
    t3 = _table(page_id=3, uid="d", rows=1, cols=2)  # page gap from t2
    out = merge_multipage_tables([t0, t1, t2, t3])
    assert [t.uid for t in out] == ["a", "c", "d"]
    assert len(out[0].cells) == 3  # 2 + 1 rows merged under first uid
    assert out[0].page_id == 1  # chain anchor moved to the last merged page


def test_merge_chains_across_three_pages():
    ts = [_table(page_id=p, uid=f"u{p}", rows=1, cols=4) for p in range(3)]
    out = merge_multipage_tables(ts)
    assert len(out) == 1 and out[0].uid == "u0" and len(out[0].cells) == 3
