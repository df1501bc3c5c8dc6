"""HTML kernel golden tests — hand-derived from the reference behavior
(dedoc/readers/html_reader/html_reader.py + tests/api_tests/
test_api_format_html.py assertions listed in FIXTURES.md §2)."""

from dedoc_ray.readers.html import read_html
from dedoc_ray.structure import construct_tree, extract_structure, flatten_tree


def extract(html: bytes, **kw):
    doc = read_html(html, **kw)
    lines = extract_structure(doc.lines)
    return flatten_tree(construct_tree(lines)), doc


def lines_of(html: bytes, **kw):
    return read_html(html, **kw).lines


class TestBlocks:
    def test_headers_and_paragraph(self):
        flat, _ = extract(b"<html><body><h1>Title</h1><p>Body text.</p></body></html>")
        types = [(n["node_id"], n["line_type"]) for n in flat["nodes"]]
        assert types == [("0", "root"), ("0.0", "header"), ("0.0.0", "raw_text")]
        assert flat["extracted_text"] == "Title\nBody text.\n"

    def test_header_nesting_depth(self):
        flat, _ = extract(b"<body><h1>A</h1><h2>B</h2><h3>C</h3><h2>D</h2></body>")
        ids = {n["node_id"]: n["line_type"] for n in flat["nodes"]}
        assert set(ids) == {"0", "0.0", "0.0.0", "0.0.0.0", "0.0.1"}

    def test_service_tags_comments_doctype_dropped(self):
        html = b"""<!DOCTYPE html><html><head><script>var x;</script><style>a{}</style></head>
        <body><!-- gone --><bogusBlock>invisible</bogusBlock><p>kept</p></body></html>"""
        flat, _ = extract(html)
        assert flat["extracted_text"] == "kept\n"

    def test_bare_text_in_body(self):
        flat, _ = extract(b"<html><body>February 24, 2021 and some text</body></html>")
        assert flat["extracted_text"] == "February 24, 2021 and some text"

    def test_partial_document_no_wrapper(self):
        flat, _ = extract(b"<h2>Header</h2><p>text</p>")
        assert flat["extracted_text"] == "Header\ntext\n"

    def test_br_becomes_newline(self):
        flat, _ = extract(b"<body><p>line one<br>line two</p></body>")
        assert flat["extracted_text"] == "line one\nline two\n"

    def test_nbsp_replaced(self):
        flat, _ = extract("<body><p>a\xa0b</p></body>".encode("utf-8"))
        assert flat["extracted_text"] == "a b\n"

    def test_leading_whitespace_preserved(self):
        # reference test_api_format_html.py:195-200 (53.html startswith "\n\n")
        doc = read_html(b"<body><pre>\n\nkeep</pre></body>")
        assert doc.lines[0].line.startswith("\n\n")

    def test_newline_appended_before_paragraph_tag(self):
        lines = lines_of(b"<body><span>first</span><p>second</p></body>")
        assert [ln.line for ln in lines] == ["first\n", "second\n"]

    def test_no_newline_before_inline_tag(self):
        lines = lines_of(b"<body><span>first</span><span>second</span></body>")
        assert [ln.line for ln in lines] == ["first", "second"]


class TestEncodings:
    def test_cp1251_with_meta(self):
        html = '<html><head><meta charset="windows-1251"></head><body><p>привет мир</p></body></html>'.encode("cp1251")
        flat, _ = extract(html)
        assert flat["extracted_text"] == "привет мир\n"

    def test_utf8_default(self):
        flat, _ = extract("<body><p>héllo</p></body>".encode("utf-8"))
        assert flat["extracted_text"] == "héllo\n"


class TestAnnotations:
    def test_bold_span_inside_paragraph(self):
        flat, _ = extract(b"<body><p>a <b>bold part</b> z</p></body>")
        anns = [a for a in flat["annotations"] if a["name"] == "bold"]
        assert anns == [{"node_id": "0.0", "start": 2, "end": 11, "name": "bold", "value": "True"}]

    def test_link_annotation_value(self):
        flat, _ = extract(b'<body><p>see <a href="http://x.test/page">here</a></p></body>')
        anns = [a for a in flat["annotations"] if a["name"] == "linked_text"]
        assert anns == [{"node_id": "0.0", "start": 4, "end": 8, "name": "linked_text", "value": "http://x.test/page"}]

    def test_style_attribute_annotations(self):
        flat, _ = extract(b'<body><p style="font-weight:bold; text-align:center; font-size:12pt">x</p></body>')
        names = {(a["name"], a["value"]) for a in flat["annotations"]}
        assert ("bold", "True") in names
        assert ("alignment", "center") in names
        assert ("size", "12") in names

    def test_display_none_becomes_hidden_style(self):
        flat, _ = extract(b'<body><p style="display:none">secret</p></body>')
        assert {"node_id": "0.0", "start": 0, "end": 6, "name": "style", "value": "hidden"} in flat["annotations"]

    def test_px_font_size_converted(self):
        flat, _ = extract(b'<body><p style="font-size:12px">x</p></body>')
        sizes = [a["value"] for a in flat["annotations"] if a["name"] == "size"]
        assert sizes == ["16.0"]

    def test_nested_inline_offsets(self):
        flat, _ = extract(b"<body><p><i>it</i> mid <u>un</u></p></body>")
        by_name = {a["name"]: (a["start"], a["end"]) for a in flat["annotations"]}
        assert by_name["italic"] == (0, 2)
        assert by_name["underlined"] == (7, 9)


class TestLists:
    def test_ordered_numeric_prefixes(self):
        flat, _ = extract(b"<body><ol><li>alpha</li><li>beta</li></ol></body>")
        texts = [n for n in flat["nodes"] if n["line_type"] == "list_item"]
        assert flat["extracted_text"] == "1. alpha2. beta"
        assert len(texts) == 2

    def test_type_a_prefixes_with_radix(self):
        items = "".join(f"<li>x{i}</li>" for i in range(28))
        lines = lines_of(f'<body><ol type="a">{items}</ol></body>'.encode())
        prefixes = [ln.line.split(" ")[0] for ln in lines]
        assert prefixes[0] == "a)"
        assert prefixes[25] == "z)"
        assert prefixes[26] == "aa)"
        assert prefixes[27] == "ab)"

    def test_unordered_no_prefix(self):
        lines = lines_of(b"<body><ul><li>one</li><li>two</li></ul></body>")
        assert [ln.line for ln in lines] == ["one", "two"]

    def test_nested_list_level_shift(self):
        html = b"<body><ol><li>outer<ol><li>inner</li></ol></li></ol></body>"
        lines = lines_of(html)
        hls = [ln.metadata.tag_hierarchy_level.level_1 for ln in lines]
        assert hls == [2, 4]

    def test_list_node_synthesized_in_tree(self):
        flat, _ = extract(b"<body><ol><li>a</li><li>b</li></ol></body>")
        list_nodes = [n for n in flat["nodes"] if n["line_type"] == "list"]
        assert len(list_nodes) == 1
        assert list_nodes[0]["level_2"] == 0.5


class TestTables:
    def test_visible_table_grid(self):
        html = b'<body><table border="1"><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table></body>'
        _, doc = extract(html)
        assert len(doc.tables) == 1
        grid = [[c.get_text() for c in row] for row in doc.tables[0].cells]
        assert grid == [["a", "b"], ["c", "d"]]

    def test_visible_table_produces_no_lines(self):
        html = b'<body><table border="1"><tr><td>cell</td></tr></table></body>'
        flat, doc = extract(html)
        assert flat["extracted_text"] == ""
        assert len(doc.tables) == 1

    def test_colspan_duplication(self):
        html = b'<body><table border="1"><tr><td colspan="2">wide</td></tr><tr><td>a</td><td>b</td></tr></table></body>'
        _, doc = extract(html)
        row0 = doc.tables[0].cells[0]
        assert [c.get_text() for c in row0] == ["wide", "wide"]
        assert [c.invisible for c in row0] == [False, True]
        assert row0[0].colspan == 2 and row0[1].colspan == 1

    def test_rowspan_duplication(self):
        html = (
            b'<body><table border="1"><tr><td rowspan="2">tall</td><td>b</td></tr>'
            b"<tr><td>c</td></tr></table></body>"
        )
        _, doc = extract(html)
        grid = [[c.get_text() for c in row] for row in doc.tables[0].cells]
        assert grid == [["tall", "b"], ["tall", "c"]]
        assert doc.tables[0].cells[1][0].invisible is True

    def test_invisible_table_as_tab_lines(self):
        html = b"<body><table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table></body>"
        flat, doc = extract(html)
        assert len(doc.tables) == 0
        # rows carry html_tag "table", which is not a paragraph tag, so the
        # postprocessor appends no newline between rows (reference parity:
        # html_line_postprocessing.py:22-27 with html_tags.py paragraphs set)
        assert flat["extracted_text"] == "a\tbc\td"

    def test_handle_invisible_table_param(self):
        html = b"<body><table><tr><td>a</td></tr></table></body>"
        _, doc = extract(html, handle_invisible_table=True)
        assert len(doc.tables) == 1

    def test_border_style_makes_visible(self):
        html = b'<body><table><tr><td style="border-bottom-style:solid">a</td></tr></table></body>'
        _, doc = extract(html)
        assert len(doc.tables) == 1


class TestDeterminism:
    def test_same_bytes_same_uids(self):
        html = b"<body><p>stable</p><h1>H</h1></body>"
        a = [ln.uid for ln in lines_of(html)]
        b = [ln.uid for ln in lines_of(html)]
        assert a == b
        assert all(uid for uid in a)

    def test_different_bytes_different_uids(self):
        a = [ln.uid for ln in lines_of(b"<body><p>one</p></body>")]
        b = [ln.uid for ln in lines_of(b"<body><p>one!</p></body>")]
        assert a != b

    def test_unique_node_ids(self):
        html = b"<body><h1>t</h1><p>a</p><ol><li>x</li><li>y</li></ol><p>b</p></body>"
        flat, _ = extract(html)
        ids = [n["node_id"] for n in flat["nodes"]]
        assert len(ids) == len(set(ids))
