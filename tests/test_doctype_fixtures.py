"""Domain structure extractors over the REFERENCE's real documents.

Pins reference tests/api_tests/test_api_doctype_{law,tz,diploma}.py
expectations: the law root(hat)→body→units tree with the articlePart
taxonomy, the tz single-body-after-toc contract, and the diploma
body/toc/named_item sibling layout.
"""

import os
import re

import pytest

from dedoc_ray.manager import DedocRayManager

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference fixtures not present")

_manager = DedocRayManager()


def parse(rel: str, **params):
    return _manager.parse(file_path=os.path.join(DATA, rel), parameters=params or None)


def tree2linear(tree):
    out = []
    stack = [tree]
    while stack:
        node = stack.pop(0)
        out.append(node)
        stack = node.get("subparagraphs", []) + stack
    return out


def by_path(tree, path):
    node = tree
    for i in path.split(".")[1:]:
        node = node["subparagraphs"][int(i)]
    return node


# ------------------------------------------------------------------- law


def test_law_txt():
    # test_api_doctype_law.py:16-27 — hat merges into root (incl. the
    # spaced-letter З А К О Н join), body adopts the articles
    r = parse("laws/коап_москвы_8_7_2015_utf.txt", document_type="law")
    content = r["content"]
    assert content["tables"] == []
    structure = content["structure"]
    assert "ЗАКОН" in structure["text"]
    assert structure["metadata"]["paragraph_type"] == "root"
    body = structure["subparagraphs"][0]
    assert body["metadata"]["paragraph_type"] == "body"
    first = body["subparagraphs"][0]["text"].split("\n")[0].strip()
    assert first == "Статья   1.1.   Законодательство   города   Москвы   об    административных"
    assert body["subparagraphs"][2]["text"].strip().startswith("Статья")


def test_law_html():
    # :29-37 — dotted clauses are articlePart under body; УКАЗ hat in root
    r = parse("laws/doc_Правовые акты_0A1B19DB-15D0-47BC-B559-76DA41A36105_27.html",
              document_type="law")
    structure = r["content"]["structure"]
    assert "У К А З" in structure["text"]
    body = structure["subparagraphs"][0]
    assert body["metadata"]["paragraph_type"] == "body"
    assert body["subparagraphs"][0]["metadata"]["paragraph_type"] == "articlePart"


# -------------------------------------------------------------------- tz


def _check_tz_tree(tree):
    # test_api_doctype_tz.py:76-82 — exactly ONE body node, after the toc
    lines = tree2linear(tree)
    toc_end = max((i for i, l in enumerate(lines)
                   if l["metadata"]["paragraph_type"].startswith("toc")), default=0)
    body_ids = [i for i, l in enumerate(lines) if l["metadata"]["paragraph_type"] == "body"]
    assert len(body_ids) == 1
    assert max(body_ids) > toc_end


@pytest.mark.parametrize("name", ["tz.txt", "alpaca_tz.docx", "alpaca_tz.doc"])
def test_tz_tree(name):
    r = parse(f"tz/{name}", document_type="tz")
    _check_tz_tree(r["content"]["structure"])


def test_tz_moloko_item_depth():
    # :34-42 — items "6.N" all sit at node depth 4 (root.body.section.item)
    r = parse("tz/13 молоко 1 полуг.docx", document_type="tz")
    tree = r["content"]["structure"]
    _check_tz_tree(tree)
    num = re.compile(r"\s*6\.\d")
    depths = {len(l["node_id"].split(".")) for l in tree2linear(tree) if num.match(l["text"])}
    assert depths == {4}


def test_tz_gasu_root_text():
    # :44-53 — title merges into root text
    r = parse("tz/Технические_требования_ГАСУ_(2012-2014)(1)(1)(1).docx", document_type="tz")
    tree = r["content"]["structure"]
    _check_tz_tree(tree)
    assert tree["text"].replace("\n", "")[:30] == "Технические требования на дора"
    assert tree["metadata"]["paragraph_type"] == "root"


# --------------------------------------------------------------- diploma


def test_diploma_docx():
    # test_api_doctype_diploma.py:54-89 — root hat ends "Москва 2023 г.";
    # children: empty body, toc("Содержание") with toc_items, named_items
    # for Введение and every Глава, in document order
    r = parse("diplomas/diploma.docx", document_type="diploma")
    s = r["content"]["structure"]
    assert s["text"].strip()[-14:] == "Москва 2023 г."
    assert by_path(s, "0.0")["metadata"]["paragraph_type"] == "body"
    assert by_path(s, "0.0")["text"] == ""
    assert by_path(s, "0.1")["metadata"]["paragraph_type"] == "toc"
    assert by_path(s, "0.1")["text"].strip() == "Содержание"
    toc0 = by_path(s, "0.1.0")
    assert toc0["metadata"]["paragraph_type"] == "toc_item"
    assert toc0["text"][:8] == "Введение"
    named = [(n["text"].strip().split("\n")[0][:8]) for n in s["subparagraphs"]
             if n["metadata"]["paragraph_type"] == "named_item"]
    assert named[0] == "Введение"
    assert named[1].startswith("Глава 1.")
    assert named[2].startswith("Глава 2.")
    assert named[3].startswith("Глава 3.")


def test_diploma_pdf():
    # :11-52 — tabby route; СОДЕРЖАНИЕ toc with wrapped entries, then the
    # numbered ALL-CAPS chapters / ЗАКЛЮЧЕНИЕ / БИБЛИОГРАФИЧЕСКИЙ СПИСОК
    # as root-level named_items
    r = parse("diplomas/diploma.pdf", document_type="diploma", pdf_with_text_layer="tabby")
    s = r["content"]["structure"]
    assert s["text"].strip()[-15:] == "Москва, 2021 г."
    assert by_path(s, "0.0")["metadata"]["paragraph_type"] == "body"
    assert by_path(s, "0.1")["metadata"]["paragraph_type"] == "toc"
    assert by_path(s, "0.1")["text"].strip() == "СОДЕРЖАНИЕ"
    assert by_path(s, "0.1.0")["text"][:8] == "ВВЕДЕНИЕ"
    assert by_path(s, "0.1.0")["metadata"]["paragraph_type"] == "toc_item"
    named = [n["text"].strip().split("\n")[0] for n in s["subparagraphs"]
             if n["metadata"]["paragraph_type"] == "named_item"]
    assert named[0] == "ВВЕДЕНИЕ"
    assert named[1][:16] == "1. ТЕОРЕТИЧЕСКОЕ"
    assert named[2][:9] == "2. АНАЛИЗ"
    assert "ЗАКЛЮЧЕНИЕ" in named
    assert "БИБЛИОГРАФИЧЕСКИЙ СПИСОК" in named


# ---------------------------------------------------------- list patching
# reference test_api_misc_list_patching.py — dotted numbering survives
# missing items and numId=0 "numbering removed" paragraphs


def test_list_patching_missed_items():
    # :14-38 — skipped numbers stay siblings; sub-lists nest by dot depth
    for name in ("missed_list.docx", "missed_list_2.docx"):
        r = parse(f"list_tests/{name}", structure_type="tree")
        sub = r["content"]["structure"]["subparagraphs"][0]["subparagraphs"][0]
        texts = [c["text"].strip() for c in sub["subparagraphs"]]
        assert texts == ["1. list item 1", "2. list item 2", "3. list item 3",
                         "4. list item 4", "6. list item 6"], name
    r = parse("list_tests/missed_list.docx", structure_type="tree")
    sub = r["content"]["structure"]["subparagraphs"][0]["subparagraphs"][0]
    inner = sub["subparagraphs"][4]["subparagraphs"][0]
    assert [c["text"].strip() for c in inner["subparagraphs"]] == \
        ["6.1. list item 6.1", "6.3 list item 6.3", "6.5 list item 6.5"]
    deep = [c["text"].strip() for g in inner["subparagraphs"][1].get("subparagraphs", [])
            for c in g.get("subparagraphs", [])]
    assert deep == ["6.3.2.3 list item 6.3.2.3", "6.3.2.4. list item 6.3.2.4"]


def test_list_patching_moloko():
    # :6-12 — numId=0 paragraphs ("10.2. ...") are NOT list items by tag;
    # their dotted text depth nests them under "10." → 12 top children
    r = parse("docx/13_moloko_1_polug.docx", structure_type="tree")
    lst = r["content"]["structure"]["subparagraphs"][1]
    assert len(lst["subparagraphs"]) == 12


def test_multipage_table_merges_across_routes():
    # test_api_misc_multipage_table.py:43-47 — the page-spanning table
    # merges to ONE on both the txtlayer ("true") and tabby routes
    for reader in ("true", "tabby"):
        r = parse("tables/example_mp_table_wo_repeate_header.pdf", pdf_with_text_layer=reader)
        tables = r["content"]["tables"]
        assert len(tables) == 1, reader
        cells = tables[0]["cells"]
        # ruled-grid route: 3 header tiers + 10 data rows, with the big
        # header spanning all 5 columns and shadow cells repeating its text
        # (the reference's merged-cell grid contract)
        assert len(cells) == 13, reader
        assert [c["text"].strip() for c in cells[0]] == ["Заголовок Большой"] * 5, reader
        assert cells[0][0]["colspan"] == 5 and not cells[0][0]["invisible"], reader
        assert cells[0][1]["invisible"], reader
        assert [c["text"].strip() for c in cells[3]] == ["Данные 1"] * 5, reader


# --------------------------------------------------------- docx (format)
# reference test_api_format_docx.py over the real example.* siblings


def _check_doc_like(result):
    # :132-140 — exact deep tree paths of the shared "Пример документа" doc
    content = result["content"]["structure"]
    assert by_path(content, "0")["text"] == ""
    assert by_path(content, "0.0")["text"].strip() == (
        "Пример документа\nГлава 1\nКакие то определения\nСтатья 1\n"
        "Определим опрделения\nСтатья 2\nДадим пояснения")
    assert by_path(content, "0.1.0")["text"].strip() == "1.2.1. Поясним за непонятное"
    assert by_path(content, "0.1.1")["text"].strip() == "1.2.2. Поясним за понятное"
    assert by_path(content, "0.1.2")["text"].strip() == "1.2.3."
    assert by_path(content, "0.1.1.0.0")["text"].rstrip().lstrip("\t ") == "а) это даже ежу понятно"


@pytest.mark.parametrize("name", ["example.docx", "example.odt"])
def test_doc_like_tree(name):
    r = parse(f"docx/{name}", structure_type="tree")
    _check_doc_like(r)


def test_docx_robustness_corpus():
    # :87-95,117-130 — tricky real files must parse without error
    for f in ("doc.docx", "not_stripped_xml.docx", "with_comments.docx",
              "tz-1ek-20_minimum.docx", "broken_properties.docx",
              "Well. Known -Nik O'Tinn -Ireland 2023- DRAFT.doc"):
        r = parse(f"docx/{f}")
        assert r["status"] == "ok", f


def test_docx_newline_tree():
    # :111-115
    r = parse("docx/inspector.docx", structure_type="tree")
    assert r["content"]["structure"]["subparagraphs"][0]["text"].startswith("КАКОЕ-ТО ЗАДАНИЕ")


# ------------------------------------------------------------- misc main


def test_http_bin_file_415():
    # test_api_misc_main.py:39-45 — unsupported format → 415 with version,
    # file_name and metadata in the body
    import io
    import json as _json

    from dedoc_ray.api import create_app

    client = create_app(_manager).test_client()
    resp = client.post("/upload", data={"file": (io.BytesIO(b"\x00\x01\x02\x03binary"), "file.bin")},
                       content_type="multipart/form-data")
    assert resp.status_code == 415
    body = _json.loads(resp.data)
    assert body["file_name"] == "file.bin"
    assert "dedoc_version" in body and "metadata" in body


def test_http_missing_file_422():
    # :47-48
    from dedoc_ray.api import create_app

    client = create_app(_manager).test_client()
    resp = client.post("/upload", data={}, content_type="multipart/form-data")
    assert resp.status_code == 422


def test_version_in_parsed_result():
    # :55-58
    import dedoc_ray

    r = parse("csvs/books.csv")
    assert r["version"].strip() == dedoc_ray.__version__


def test_txt_tree_list_items():
    # :60-67
    r = parse("txt/example.txt", structure_type="tree")
    content = r["content"]["structure"]
    assert content["subparagraphs"][0]["text"].strip() == "Пример документа"
    first_item = content["subparagraphs"][1]["subparagraphs"][0]
    assert first_item["text"].strip() == "1. Элемент нумерованного списка"
    assert first_item["metadata"]["paragraph_type"] == "list_item"


# ------------------------------------------------------ pdf auto routing
# reference test_api_format_pdf_auto_text_layer.py — the auto route's
# verbatim warning strings over real born-digital / scanned / mixed pdfs


def _assume_warnings(rel, **params):
    r = parse(rel, **params)
    return r["warnings"], r


def test_pdf_auto_correct_layer_warning():
    # :11-30,44-47 — born-digital pdfs are accepted with the verbatim warning
    for f in ("pdf_auto/0004057v1.pdf", "pdf_auto/liao2020_merged_organized.pdf",
              "pdf_auto/liao2020_merged-1-5.pdf"):
        warnings, _ = _assume_warnings(f, pdf_with_text_layer="auto", is_one_column_document="auto")
        assert "Assume document has a correct textual layer" in warnings, f
    warnings, _ = _assume_warnings("pdf_with_text_layer/english_doc.pdf", pdf_with_text_layer="auto")
    assert "Assume document has a correct textual layer" in warnings


def test_pdf_auto_wrong_layer_warning():
    # :49-53 — the trained txtlayer classifier rejects the garbage layer
    warnings, _ = _assume_warnings("pdf_auto/english_doc_bad_text.pdf", pdf_with_text_layer="auto")
    assert "Assume document has incorrect textual layer" in warnings


def test_pdf_auto_mixed_first_page():
    # :55-60 — a raster cover page over a textual body, on auto AND auto_tabby
    for mode in ("auto", "auto_tabby"):
        warnings, r = _assume_warnings("pdf_auto/mixed_pdf.pdf", pdf_with_text_layer=mode)
        assert "Assume document has a correct textual layer" in warnings, mode
        assert "Assume the first page hasn't a textual layer" in warnings, mode
        assert "продолжаем список" in r["extracted_text"], mode


# ---------------------------------------------------------------- fintoc
# reference test_api_doctype_fintoc.py over the real prospectus pdfs


def test_fintoc_en_prospectus():
    r = parse("fintoc/prospectus_en.pdf", document_type="fintoc", pdf_with_text_layer="true")
    s = r["content"]["structure"]
    headers = [n["text"].strip() for n in s["subparagraphs"]
               if n["metadata"]["paragraph_type"] == "header"]
    # :14-19 — the KID title and PURPOSE are SEPARATE header nodes
    assert headers[0] == "Key Information Document (KID)"
    assert "PURPOSE" in headers

    def walk(n):
        yield n
        for c in n.get("subparagraphs", []):
            yield from walk(c)

    # :22-24 — the purpose body is raw_text
    body = [x for x in walk(s) if x["text"].strip().startswith("This document provides")]
    assert body and body[0]["metadata"]["paragraph_type"] == "raw_text"


def test_fintoc_fr_prospectus():
    r = parse("fintoc/prospectus_fr.pdf", document_type="fintoc",
              pdf_with_text_layer="true", need_pdf_table_analysis="false")
    s = r["content"]["structure"]
    headers = [n["text"].strip() for n in s["subparagraphs"]
               if n["metadata"]["paragraph_type"] == "header"]
    # :34-36
    assert headers[0] == "INFORMATIONS CLES POUR L’INVESTISSEUR"


# ----------------------------------------------------------------- email
# reference test_api_format_email.py over the real eml fixtures


def test_email_header_structure_and_attachment():
    # :11-30 — subject as root text, typed from/to nodes, the header json
    r = parse("eml/spam_mail.eml", with_attachments="true")
    atts = r["attachments"]
    assert len(atts) == 1
    assert "message_header_" in atts[0]["metadata"]["file_name"]
    s = r["content"]["structure"]
    assert s["text"].strip() == "[Spam]Artificial flowers  for decors"
    assert s["subparagraphs"][1]["metadata"]["paragraph_type"] == "from"
    assert s["subparagraphs"][1]["text"].strip() == '"sunny_goldensun@126.com" <sunny_goldensun@126.com>'
    assert s["subparagraphs"][2]["metadata"]["paragraph_type"] == "to"
    assert s["subparagraphs"][2]["text"].strip() == "modis@ispras.ru"


def test_email_with_attachments():
    # :32-50 — header json first, then the real attachments by name
    r = parse("eml/message.eml", with_attachments="true")
    s = r["content"]["structure"]
    assert s["text"].strip() == "TetSubj"
    assert s["subparagraphs"][1]["text"].strip() == '"aa@aa.aa" <aa@aa.aa>'
    assert s["subparagraphs"][2]["text"].strip() == '"bb@bb.bb" <bb@bb.bb>'
    atts = r["attachments"]
    assert len(atts) == 3
    assert "message_header_" in atts[0]["metadata"]["file_name"]
    assert atts[1]["metadata"]["file_name"] == "grafana.jpg"
    assert atts[2]["metadata"]["file_name"] == "KY100Product SheetProduct Sheet.pdf"


# --------------------------------------------------------- misc structure
# reference test_api_misc_structure.py over example.docx


def test_structure_linear_vs_tree():
    # :10-32 — 13 flat leaves in linear mode, 2 top nodes in tree mode
    r = parse("docx/example.docx", structure_type="linear")
    nodes = r["content"]["structure"]["subparagraphs"]
    assert len(nodes) == 13
    assert all(n["subparagraphs"] == [] for n in nodes)
    r = parse("docx/example.docx", structure_type="tree")
    nodes = r["content"]["structure"]["subparagraphs"]
    assert len(nodes) == 2
    assert nodes[0]["text"].split("\n")[0] == "Пример документа"
    assert nodes[1]["subparagraphs"][0]["text"].strip() == "1.2.1. Поясним за непонятное"


def test_structure_invalid_type_is_400():
    # :48-50 — unknown structure_type → HTTP 400
    import io

    from dedoc_ray.api import create_app

    client = create_app(_manager).test_client()
    with open(os.path.join(DATA, "docx/example.docx"), "rb") as fh:
        body = fh.read()
    resp = client.post("/upload", data={"file": (io.BytesIO(body), "example.docx"),
                                        "structure_type": "bagel"},
                       content_type="multipart/form-data")
    assert resp.status_code == 400


# ---------------------------------------------------------- patterns API
# reference test_api_doctype_default.py — user patterns in the API's
# str([...]) wire form, incl. start_word and string booleans


def test_user_patterns_wire_form():
    patterns = str([
        {"name": "regexp", "regexp": "^глава\\s\\d+\\.", "line_type": "глава", "level_1": 1},
        {"name": "start_word", "start_word": "статья", "level_1": 2, "line_type": "статья"},
        {"name": "dotted_list", "level_1": 3, "line_type": "list_item", "can_be_multiline": False},
        {"name": "bracket_list", "level_1": 4, "level_2": 1, "line_type": "bracket_list_item",
         "can_be_multiline": "false"},
    ])
    r = parse("docx/without_numbering.docx", patterns=patterns)
    s = r["content"]["structure"]
    node = by_path(s, "0.1")
    assert node["text"].strip() == "Глава 1. Общие положения"
    assert node["metadata"]["paragraph_type"] == "глава"
    node = by_path(s, "0.1.1")
    assert "Статья 1.1." in node["text"]
    assert node["metadata"]["paragraph_type"] == "статья"
    assert by_path(s, "0.1.1.0")["metadata"]["paragraph_type"] == "list"
    node = by_path(s, "0.1.1.0.0")
    assert "1. Законодательство" in node["text"]
    assert node["metadata"]["paragraph_type"] == "list_item"
    node = by_path(s, "0.1.2.0.0.0")
    assert node["text"].strip() == "1) предупреждение;"
    assert node["metadata"]["paragraph_type"] == "bracket_list_item"
    node = by_path(s, "0.2")
    assert node["metadata"]["paragraph_type"] == "глава"


def test_user_patterns_empty_and_wrong():
    # :35-46 — empty patterns fall back to the default composition; every
    # malformed form raises (→ HTTP 400 at the API)
    for ok in ("", "[]"):
        assert parse("docx/example.docx", patterns=ok)["status"] == "ok"
    for bad in ('[{"regexp": "x", "line_type": "t", "level_1": 1}]',
                '[{"name": "start_word", "line_type": "t", "level_1": 1}]',
                '[{"name": "unknown", "line_type": "t", "level_1": 1}]',
                "[1]", "{1: 2}", "{1: blabla}"):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            parse("docx/example.docx", patterns=bad)


def test_multipage_table_repeated_header_dropped():
    # test_api_misc_multipage_table.test_..._synthetic_data_3 pins (the
    # reference's own expected values): continuation pages repeating the
    # header merge WITHOUT duplicate header rows
    for reader in ("true", "tabby"):
        r = parse("tables/example_mp_table_with_repeate_header_2.pdf", pdf_with_text_layer=reader)
        tables = r["content"]["tables"]
        assert len(tables) == 1, reader
        cells = tables[0]["cells"]
        assert len(cells) == 10, reader
        assert [c["text"].strip() for c in cells[0]] == \
            ["Заголовок\nБольшой"] + ["Еще один большой заголовок"] * 4, reader
        # the header tiers appear ONCE — data rows follow uninterrupted
        assert [c["text"].strip() for c in cells[3]] == ["Данные 1"] * 5, reader
        assert [c["text"].strip() for c in cells[9]] == ["Данные 7"] * 5, reader


def test_nesting_list_item_texts():
    # test_api_misc_nesting_list.py:6-14 — the numbered tz items keep their
    # verbatim tab-separated texts at the reference's positions
    r = parse("docx/pr14tz_v5_2007_03_01.docx", structure_type="tree")
    lst = r["content"]["structure"]["subparagraphs"][2]
    assert lst["subparagraphs"][4]["text"].rstrip("\n") == "1.5.\tОснования разработки"
    assert lst["subparagraphs"][5]["text"].rstrip("\n") == "1.6.\tНормативные документы"
    assert lst["subparagraphs"][6]["text"].rstrip("\n") == \
        "1.7.\tСведения об источниках и порядке финансирования работ"
