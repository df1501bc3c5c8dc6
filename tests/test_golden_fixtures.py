"""Golden tests over the REFERENCE's own fixture corpus.

Every other correctness gate in this repo runs on self-generated corpora;
this module is the real-world check the round-2 verdict asked for: parse the
reference's shipped test files (/root/reference/tests/data — read-only) and
pin the values its API tests hard-code (tests/api_tests/test_api_format_*.py,
tests/unit_tests/test_format_txt_reader.py). Encoder/decoder pairs by one
author can hide fidelity bugs; files written by Word/LibreOffice/pdflatex/
p7zip cannot.
"""

import os

import pytest

from dedoc_ray.manager import DedocRayManager

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference fixtures not present")

_manager = DedocRayManager()


def parse(rel: str, **params):
    return _manager.parse(file_path=os.path.join(DATA, rel), parameters=params or None)


def table_texts(result, idx=0):
    tables = result["content"]["tables"]
    t = tables[idx]["cells"] if isinstance(tables[idx], dict) else tables[idx]
    out = []
    for row in t:
        cells = []
        for cell in row:
            if isinstance(cell, dict):
                if "text" in cell:
                    cells.append(str(cell["text"]).strip())
                else:
                    cells.append("".join(ln.get("text", "") for ln in cell.get("lines", [])).strip())
            else:
                cells.append(str(cell).strip())
        out.append(cells)
    return out


# ------------------------------------------------------------------ html

# reference pins (test_api_format_html.py:27-80): the same tree for the
# utf-8, cp1251 and koi8-r encodings of example.html
_EXAMPLE_HEAD = "Пример документа\nГлава 1\nКакие то определения\nСтатья 1"


@pytest.mark.parametrize("name", ["example.html", "example_cp1251.html", "example_koi.html"])
def test_html_example_all_encodings(name):
    r = parse(f"htmls/{name}")
    assert r["status"] == "ok"
    text = r["extracted_text"]
    assert text.replace("  ", " ").startswith("Пример документа\nГлава 1\nКакие то определения\nСтатья 1")
    assert "Статья 2" in text and "Дадим пояснения" in text
    assert "1.2.1" in text and "Поясним за непонятное" in text


def test_html_with_styles():
    r = parse("htmls/html_with_styles.html")
    text = r["extracted_text"]
    for probe in ("Some right text", "Some center text", "Some left text", "BIG TEXT"):
        assert probe in text


# ------------------------------------------------------------ docx family


def test_docx_example():
    r = parse("docx/example.docx")
    text = r["extracted_text"]
    assert text.startswith("Пример документа\nГлава 1\n")
    assert "Статья 1" in text and "Статья 2" in text
    # the two tables from the reference docx fixture
    t0 = table_texts(r, 0)
    assert t0[0] == ["N", "Фамилия", "Имя", "Организация", "Телефон", "Примечания"]
    assert t0[1][1] == "Иванов"


def test_docx_english():
    r = parse("docx/english_doc.docx")
    text = r["extracted_text"]
    assert text.startswith("THE GREAT ENGLISH DOCUMENT")
    assert "1) Fisrst item with some english text" in text


def test_doc_example():  # word 97 binary, piece table + CFB
    r = parse("docx/example.doc")
    text = r["extracted_text"]
    assert text.startswith("Пример документа")
    assert "Статья 2" in text and "Иванов" in text


def test_odt_example():
    r = parse("docx/example.odt")
    text = r["extracted_text"]
    assert text.startswith("Пример документа")
    assert "Статья 2" in text
    assert table_texts(r, 0)[1][1] == "Иванов"


def test_rtf_example():
    r = parse("docx/example.rtf")
    text = r["extracted_text"]
    # ignorable {\*\...} destinations must not leak (pre-fix the output
    # started with stylesheet junk: '**??????j', 'Default Style;')
    assert text.startswith("Пример документа")
    assert "Default Style" not in text and "**" not in text
    assert "Статья 2" in text


# ------------------------------------------------- spreadsheets (3 shapes)

_SHEET1 = [["1", "2", "3"], ["4", "5", "6"]]
_SHEET2 = [["11", "22", "33", "44"], ["55", "66", "77", "88"]]


@pytest.mark.parametrize("name", ["xlsx/example.xlsx", "xlsx/example.ods", "xlsx/example.xls"])
def test_spreadsheet_grids(name):
    # reference pins the same two grids for xlsx/ods/xls
    # (test_api_format_excel.py:11-38 — their "1.0" is pandas float render)
    r = parse(name)
    assert [[c.split(".")[0] for c in row] for row in table_texts(r, 0)] == _SHEET1
    assert [[c.split(".")[0] for c in row] for row in table_texts(r, 1)] == _SHEET2


def test_csv_coma():
    r = parse("csvs/csv_coma.csv")
    assert "delimiter is ','" in r["warnings"]
    assert table_texts(r, 0) == [["1", "2", "3"], ["2", "1", "5"], ["5", "3", "1"]]


def test_csv_books_quoted():
    # books.csv: quoted fields with embedded commas/quotes
    # (reference test_api_format_csv.py:31-43)
    r = parse("csvs/books.csv")
    rows = table_texts(r, 0)
    assert rows[0][:4] == ["id", "cat", "name", "price"]
    assert rows[3][2] == "A Storm of Swords"


# ------------------------------------------------------------ email/mhtml


def test_eml_message():
    # reference pins subject/from/to (test_api_format_email.py:39-45)
    r = parse("eml/message.eml")
    assert r["extracted_text"].startswith("TetSubj")
    assert "Hello BB!" in r["extracted_text"]
    assert r["metadata"]["title"] == "TetSubj"
    assert r["metadata"]["author"] == '"aa@aa.aa" <aa@aa.aa>'


def test_mhtml():
    r = parse("mhtml/with_attachments.mhtml")
    assert r["status"] == "ok"
    assert "Newsletter" in r["extracted_text"]


# ------------------------------------------------------------------- txt


def test_txt_example():
    r = parse("txt/example.txt")
    text = r["extracted_text"]
    assert text.startswith("Пример документа")
    assert "1. Элемент нумерованного списка" in text


def test_txt_cp1251_native_decode():
    r = parse("txt/cp1251.txt")
    assert "Сэр Джон Монтегю" in r["extracted_text"]
    assert any("cp1251" in w or "windows-1251" in w for w in r["warnings"])


def test_txt_utf8_same_text():
    a = parse("txt/cp1251.txt")["extracted_text"]
    b = parse("txt/utf8.txt")["extracted_text"]
    assert a.split("\n")[0] == b.split("\n")[0]  # same document, two charsets


def test_txt_bom_stripped():
    r = parse("txt/pr_17.txt")
    assert not r["extracted_text"].startswith("﻿")
    assert "УТВЕРЖДЕНЫ" in r["extracted_text"][:200]


def test_txt_gz():
    r = parse("txt/football.txt.gz")
    assert "Association football" in r["extracted_text"]


# ------------------------------------------------------------------- pdf


def test_pdf_english_doc():
    # reference content_checker._check_english_doc: list items stay body
    # text, the 2×2 grid is a TABLE (auto route runs the table recognizer,
    # tests/api_tests/test_api_format_pdf_tabby_reader.py:20-22)
    r = parse("pdf_with_text_layer/english_doc.pdf")
    text = r["extracted_text"]
    assert text.startswith("THE GREAT ENGLISH DOCUMENT")
    assert "Fisrst item with some english text" in text
    assert table_texts(r, 0) == [
        ["London", "The capital of Great Britain"],
        ["Speek", "From my heart"],
    ]


def test_pdf_example_ru():
    r = parse("pdf_with_text_layer/example.pdf")
    assert r["extracted_text"].startswith("Пример документа")
    assert "Статья 2" in r["extracted_text"]


def test_pdf_vvp_tables_no_interleave():
    # round-2 verdict repro: the regex-scan reader returned 'Ф9р3а0н3ц7ия'
    # (digits from the adjacent table column interleaved into 'Франция');
    # the auto route now recognizes the reference's 4 tables, so the cell
    # lands in a grid, intact
    r = parse("pdf_with_text_layer/VVP_6_tables.pdf")
    lines = r["extracted_text"].split("\n")
    assert any(ln.startswith("ВВП (валовой внутренний продукт)") for ln in lines)
    tables = r["content"]["tables"]
    assert len(tables) == 4
    all_cells = [c for i in range(4) for row in table_texts(r, i) for c in row]
    assert "Франция" in all_cells
    assert not any("Ф9р" in c or "Ф9" in c for c in all_cells)
    assert not any("Ф9р" in ln or "Ф9" in ln for ln in lines)


def test_pdf_two_column_state():
    # round-2 verdict repro: the regex-scan reader claimed "no text layer"
    r = parse("pdf_with_text_layer/2-column-state.pdf", pdf_with_text_layer="true")
    text = r["extracted_text"]
    assert text.startswith("Compromising Tor Anonymity")
    for probe in (
        "Privacy of users in P2P networks",
        "Anonymizing Networks, Privacy, Tor, BitTorrent",
        "INTRODUCTION",
        "onion-routing",
    ):
        assert probe in text
    # title is Helvetica-Bold ~18pt in the source — bold must be detected
    # from the real BaseFont (reference test_api_format_pdf_with_text.py:84-98)
    from dedoc_ray.readers.pdf import read_pdf_textlayer

    with open(os.path.join(DATA, "pdf_with_text_layer/2-column-state.pdf"), "rb") as f:
        doc = read_pdf_textlayer(f.read())
    first = doc.lines[0]
    assert first.line.startswith("Compromising Tor Anonymity")
    names = {a.name: a.value for a in first.annotations}
    assert names.get("bold") == "True"
    assert 17.0 <= float(names["size"]) <= 19.0


def test_pdf_cp1251_differences_encoding():
    # /Differences + afii glyph names (Cyrillic) — no ToUnicode fallback
    r = parse("pdf_with_text_layer/cp1251.pdf")
    assert "Сэр" in r["extracted_text"] and "Монтегю" in r["extracted_text"]


def test_pdf_multipage_page_count():
    r = parse("pdf_with_text_layer/multipage.pdf")
    assert "pdf pages: 9" in r["warnings"]


def test_pdf_encrypted_empty_password_decrypts():
    # AES-128 (/CFM /AESV2) standard security handler with the EMPTY user
    # password — the silently-readable owner-locked subset
    # (readers/pdf_crypt.py: generated S-box, FIPS-197-vector-tested AES,
    # the file's own /U entry validates the key derivation)
    r = parse("pdf_auto/e09d__cs-pspc-xg-15p-portable-radio-quick-guide.pdf")
    assert r["status"] == "ok"
    text = r["extracted_text"]
    assert text.startswith("Quick Guide")
    # the guide's keypad/control grids now surface as tables on the auto
    # route; the decrypted content must appear in text OR table cells
    cells = " ".join(
        c for i in range(len(r["content"]["tables"])) for row in table_texts(r, i) for c in row
    )
    assert "Radio Controls" in text + cells
    assert "Rotate clockwise to apply power" in text + cells


# ------------------------------------------------------------------ pptx


def test_pptx_example():
    r = parse("pptx/example.pptx")
    text = r["extracted_text"]
    assert "A long time ago in a galaxy far far away" in text


# -------------------------------------------------------------- archives


@pytest.mark.parametrize(
    "name",
    ["archives/arch_with_attachs.zip", "archives/arch_with_attachs.7z", "archives/arch_with_attachs.tar.gz",
     "archives/arch_with_attachs.tar", "archives/arch_with_attachs.rar"],
)
def test_archive_members(name):
    r = parse(name, with_attachments="true")
    names = sorted(a.get("file_name") or a.get("name") or "" for a in r["attachments"])
    assert [n.rsplit("/", 1)[-1] for n in names] == [
        "doc_001.txt",
        "english_doc.pdf",
        "example.ods",
        "example.odt",
    ]


def test_7z_subfolders_lists_files_only():
    # externally-produced p7zip archive WITH directory entries: the
    # kEmptyFile-clear entries are directories and must not surface
    r = parse("archives/subfolders.7z", with_attachments="true")
    names = [a.get("file_name") or a.get("name") or "" for a in r["attachments"]]
    assert all("." in n.rsplit("/", 1)[-1] for n in names), names
    assert any(n.endswith("books.csv") for n in names)


# ------------------------------------------------------------------ json


def test_json_dict_with_list():
    r = parse("json/dict_with_list.json")
    assert r["status"] == "ok"
    assert r["extracted_text"]


def test_pdf_tabby_real_tables_vvp():
    # reference pins this row (test_api_format_pdf_tabby_reader.py:139,174)
    from dedoc_ray.readers.pdf_tables import read_pdf_tabby

    with open(os.path.join(DATA, "pdf_with_text_layer/VVP_6_tables.pdf"), "rb") as f:
        doc = read_pdf_tabby(f.read())
    # 4 like the reference (test_api_format_pdf_tabby_reader.py:155-161):
    # three captioned grids on page 0 stay separate (captions block the
    # coalescer), the page-1 repetitions with nothing between merge to one
    assert len(doc.tables) == 4
    rows = [
        [c.get_text() for c in row]
        for t in doc.tables
        for row in t.cells
    ]
    assert ["Франция", "9", "3037"] in rows
    # the merged page-1 grid leads with the reference's header rows
    big = doc.tables[3].cells
    assert [c.get_text() for c in big[0]] == ["", "2016", "2017", "2018", "2019"]
    # wrapped cell text joins with \n — the reference's verbatim value
    # (test_pdf_with_tables rows[22])
    assert [c.get_text() for c in big[-1]][0] == "Сальдо\nбюджета"


def test_pdf_tabby_real_tables_global():
    from dedoc_ray.readers.pdf_tables import read_pdf_tabby

    with open(os.path.join(DATA, "pdf_with_text_layer/VVP_global_table.pdf"), "rb") as f:
        doc = read_pdf_tabby(f.read())
    assert doc.tables
    rows = [[c.get_text() for c in row] for t in doc.tables for row in t.cells]
    assert any("Франция" in r[0] for r in rows if r)


def test_pdf_auto_bad_text_layer_routes_to_ocr():
    # reference pdf_auto fixture: a PDF whose text layer is Cyrillic
    # homoglyph garbage — the txtlayer classifier must reject it
    r = parse("pdf_auto/english_doc_bad_text.pdf")
    assert "СВЕАТ" not in (r["extracted_text"] or "")
    assert any("classified incorrect" in w for w in r["warnings"])


def test_law_hat_on_real_fixtures():
    from dedoc_ray.structure.domain import classify_law_hat

    def hat(rel):
        with open(os.path.join(DATA, rel), encoding="utf-8", errors="replace") as f:
            return classify_law_hat(f.read().split("\n")[:40])

    assert hat("laws/prikaz_0.txt") == "order"
    assert hat("laws/minsport_24.12.2013_1112.txt") == "order"
    # КоАП Москвы: 'З А К О Н' appears but КОДЕКС wins (the закон-deferral)
    assert hat("laws/коап_москвы_8_7_2015_utf.txt") == "code"


def test_docx_merged_cells_table():
    r = parse("docx/big_table_with_merged_cells.docx")
    rows = table_texts(r, 0)
    assert len(rows) == 6 and rows[2][:4] == ["1", "2", "3", "4"]


def test_djvu_container_structure():
    # djvulibre/ddjvu absent: the container reader surfaces page count,
    # geometry and the honest BZZ gate warning (readers/djvu.py)
    r = parse("scanned/example_with_table9.djvu")
    assert r["status"] == "ok"
    assert "djvu pages: 4" in r["warnings"]
    assert "[djvu page 0: 2481x3508 @ 300 dpi]" in r["extracted_text"]
    assert any("BZZ-coded" in w for w in r["warnings"])

    r2 = parse("scanned/example_with_table7.djvu")
    assert "djvu pages: 2" in r2["warnings"]
    assert any("no text layer" in w for w in r2["warnings"])

    r3 = parse("scanned/broken.djvu")
    assert r3["status"] in ("parse_error", "bad_file")


def test_scanned_pdf_raster_inventory():
    # real scanned PDFs: the OCR route decodes the DCT raster and runs the
    # open-font recognizer. This degraded photographed page decoded as
    # 180-flipped gibberish until the orientation tie-break (its best-3
    # bands read equally well either way); upright it reads real Russian
    # above the 0.5 confidence floor, with the typed mean-confidence signal
    r = parse("pdf_auto/tz_scan_1page.pdf")
    assert r["status"] == "ok"
    conf = r["metadata"].get("ocr_confidence")
    assert conf is not None and 0.5 <= conf < 0.8
    assert any("open-font template recognizer" in w for w in r["warnings"])
    text = r["extracted_text"]
    assert "аэропорт" in text and "жидкостей" in text
    assert "на приобретение" in text
    assert "Директор по наземному" in text
    # CCITT G4 pages now DECODE through ops/ccitt.py (T.4 tables recovered
    # from the JDK encoder, G4 modes validated pixel-exact against it)
    r2 = parse("laws/with_applications.pdf")
    assert not any("no native decoder" in w for w in r2["warnings"])
    assert r2["status"] == "ok"


def test_pdf_info_metadata_golden():
    # /Info metadata on real fixtures (reference PdfMetadataExtractor
    # pdf_metadata_extractor.py:28-58; date conversion utils.py:234-257):
    # english_doc.pdf was written by LibreOffice with UTF-16BE /Creator
    r = parse("pdf_with_text_layer/english_doc.pdf")
    md = r["metadata"]
    assert md["creator"] == "Writer"
    assert md["producer"] == "LibreOffice 6.0"
    # D:20191210200202+03'00' → 2019-12-10T17:02:02Z
    assert md["creation_date"] == 1575997322
    assert md["created"] == "2019-12-10T17:02:02Z"

    r2 = parse("pdf_with_text_layer/article.pdf")
    md2 = r2["metadata"]
    assert md2["producer"] == "MiKTeX pdfTeX-1.40.11"
    assert md2["creator"] == "TeX"
    assert md2["creation_date"] == md2["modification_date"] == 1392998486


def test_pdf_tex_builtin_encoding_accents():
    # Computer Modern subsets carry NO /Encoding and NO ToUnicode — the
    # builtin Type1 /Encoding array plus overstrike accent composition must
    # reproduce the diacritics (VERDICT r3 #4: 'Belaïd' rendered 'Bela\x7f')
    r = parse("pdf_with_text_layer/article.pdf", pdf_with_text_layer="true")
    text = r["extracted_text"]
    assert "Sonia Belaïd" in text
    assert "François Xavier-Standaert" in text
    assert "École Normale Supérieure" in text
    assert "Université catholique de Louvain" in text
    assert "\x7f" not in text and "\x13" not in text and "\x18" not in text


def test_convert_pdf_datetime_forms():
    from dedoc_ray.readers.pdf_metadata import convert_pdf_datetime

    # the three reference-handled forms (utils.py:234-257): offset, Z, bare
    assert convert_pdf_datetime("D:20210202145619+00'16'") == 1612276819
    assert convert_pdf_datetime("D:20191028113639Z") == 1572262599
    assert convert_pdf_datetime("D:20191028113639") == 1572262599
    assert convert_pdf_datetime("garbage") is None


def test_pdf_two_column_liters_reading_order():
    # reference pins 0.0="References", 0.1 starts "[1] Navaneeth Bodla..."
    # (test_api_format_pdf_with_text.py:124-132)
    r = parse("pdf_with_text_layer/liters_state.pdf", pdf_with_text_layer="true")
    lines = r["extracted_text"].split("\n")
    assert lines[0] == "References"
    assert lines[1] == "[1] Navaneeth Bodla, Bharat Singh, Rama Chellappa, and"


def test_docx_annotations_fixture():
    # reference test_api_format_docx_annotations.py:14-21 — the styled
    # lines carry their bold/italic/underlined/alignment spans
    r = parse("annotation_docx/example_1.docx")
    text = r["extracted_text"]
    anns = []
    from dedoc_ray.pipeline.kernel import ExtractKernel

    row = ExtractKernel().extract_row(
        "a.docx", open(os.path.join(DATA, "annotation_docx/example_1.docx"), "rb").read()
    )
    spans = {(a["name"], row["extracted_text"][a["start"]:a["end"]]) for a in row["annotations"]}
    # spans stretch over the joining newline between unknown-type lines
    # (reference docx_reader.py __fix_lines + node-level annotation merge)
    assert ("italic", "Italic text\n") in spans
    assert ("bold", "Bold text\n") in spans
    assert ("underlined", "Underlined text\n") in spans
    assert any(n == "alignment" for n, _ in spans)
    assert "Text aligned to both borders" in text


def test_docx_attachment_manifest_names():
    # reference with_attachments_0.docx: OLE .bin containers UNPACK to the
    # packaged files (test_api_misc_with_attachments.py:125-134: zip, pdf,
    # txt, csv all present by original name), media images attach as-is,
    # .emf metafiles are skipped, and zip DIRECTORY entries must not
    # surface as empty-name attachments
    r = parse("with_attachments/with_attachments_0.docx", with_attachments="true")
    names = [a.get("file_name") or a.get("name") for a in r["attachments"]]
    assert "" not in names
    for expected in ("arch_with_attachs.zip", "VVP_global_table.pdf", "lorem.txt", "books.csv", "image1.png"):
        assert expected in names
    assert not any(n.endswith((".bin", ".emf")) for n in names)


def test_xml_raw_text_lines():
    # reference routes xml through the raw-text reader, line-per-node
    # (test_api_format_xml.py:10-18)
    r = parse("xml/simple.xml", structure_type="linear")
    lines = r["extracted_text"].split("\n")
    assert lines[0] == '<?xml version="1.0" encoding="UTF-8"?>'
    assert lines[1] == "<note>"
    assert lines[2] == "  <to>Tove</to>"


def _line_annotations(rel):
    from dedoc_ray.readers.office import read_docx

    with open(os.path.join(DATA, rel), "rb") as f:
        doc = read_docx(f.read())
    return doc, [[(a.start, a.end, a.name, a.value) for a in l.annotations] for l in doc.lines]


def test_docx_annotations_example_2():
    # reference test_api_format_docx_annotations.py:35-63 — heading styles
    # (style-chain italic + style name), per-run size spans, alignment, and
    # whole-paragraph bold/italic/underlined including the joining newline
    _, anns = _line_annotations("annotation_docx/example_2.docx")
    pins = {
        3: [(0, 31, "italic", "True"), (0, 31, "style", "heading 4")],
        8: [(0, 29, "italic", "True"), (0, 29, "style", "heading 9")],
        35: [(66, 73, "italic", "True"), (75, 89, "bold", "True"),
             (91, 111, "underlined", "True"), (0, 153, "size", "14.0"),
             (153, 175, "size", "20.0"), (183, 199, "size", "11.0")],
        43: [(0, 46, "alignment", "right")],
        44: [(0, 40, "alignment", "center")],
        45: [(0, 160, "alignment", "both")],
        47: [(0, 26, "bold", "True")],
        48: [(0, 29, "italic", "True")],
        49: [(0, 32, "underlined", "True")],
        50: [(0, 35, "bold", "True"), (0, 35, "italic", "True")],
        51: [(0, 51, "bold", "True"), (0, 51, "underlined", "True"),
             (0, 51, "italic", "True")],
    }
    for idx, expected in pins.items():
        for pin in expected:
            assert pin in anns[idx], (idx, pin, anns[idx][:6])


def test_docx_annotations_example_1_full():
    # reference test_api_format_docx_annotations.py:14-33 — the complete
    # example_1 pin list including style/indentation/strike
    _, anns = _line_annotations("annotation_docx/example_1.docx")
    pins = {
        0: [(0, 11, "style", "Body")],
        1: [(0, 12, "italic", "True")],
        2: [(0, 10, "bold", "True")],
        3: [(0, 16, "underlined", "True")],
        4: [(0, 6, "italic", "True")],
        5: [(8, 13, "bold", "True")],
        6: [(0, 20, "bold", "True"), (5, 20, "underlined", "True")],
        8: [(0, 10, "alignment", "left")],
        9: [(0, 14, "alignment", "center")],
        10: [(0, 11, "alignment", "right")],
        11: [(0, 29, "alignment", "both")],
        12: [(0, 12, "indentation", "0")],
        13: [(0, 11, "indentation", "720.0")],
        14: [(0, 12, "indentation", "1440.0")],
        15: [(0, 11, "strike", "True")],
    }
    for idx, expected in pins.items():
        for pin in expected:
            assert pin in anns[idx], (idx, pin, anns[idx][:6])


def test_docx_spacing_annotations():
    # reference test_spacing_1/test_spacing_2: spacing = max(prev after,
    # cur before), LibreOffice and Word flavors
    _, anns = _line_annotations("annotation_docx/spacing_libreoffice.docx")
    for idx, pin in {0: "0", 1: "0", 2: "57", 3: "114", 4: "114",
                     5: "114", 6: "114", 7: "0"}.items():
        vals = [a[3] for a in anns[idx] if a[2] == "spacing"]
        assert vals == [pin], (idx, vals)
    _, anns = _line_annotations("annotation_docx/spacing_microsoft_word.docx")
    for idx, pin in {0: "0", 1: "0", 2: "200", 3: "200", 4: "400",
                     5: "400", 6: "600", 7: "400", 8: "0"}.items():
        vals = [a[3] for a in anns[idx] if a[2] == "spacing"]
        assert vals == [pin], (idx, vals)


def test_docx_indentation_annotations():
    # reference test_identation: the ind algebra over left/start/firstLine/
    # hanging, including numbering-level pPr indentation (786.0 on line 20)
    _, anns = _line_annotations("annotation_docx/indentation_libreoffice.docx")
    for idx, pin in {5: (0, 188, "360.0"), 10: (0, 152, "708.0"),
                     12: (0, 0, "1429.0"), 16: (0, 21, "709.0"),
                     20: (0, 65, "786.0")}.items():
        assert (pin[0], pin[1], "indentation", pin[2]) in anns[idx], (idx, anns[idx][:4])


@pytest.mark.parametrize("rel", ["docx/example_superscript.docx",
                                 "docx/example_superscript.odt",
                                 "docx/example_superscript.doc"])
def test_superscript_subscript(rel):
    # reference _check_superscript: H(2)O-style spans at (5,6)/(9,10)
    if not rel.endswith(".docx"):
        r = parse(rel)
        subs = r["content"]["structure"]["subparagraphs"]
        anns = [(a["start"], a["end"], a["name"], a["value"])
                for s in subs for a in s.get("annotations", [])]
    else:
        _, per_line = _line_annotations(rel)
        anns = [a for line in per_line for a in line]
    assert (5, 6, "superscript", "True") in anns, anns[:8]
    assert (9, 10, "subscript", "True") in anns, anns[:8]


# ----------------------------------------------- docx reader-level pins
# (reference tests/unit_tests/test_format_docx_reader.py — these assert
# LineWithMeta.line at READER level, where the conditional trailing-"\n"
# of docx_reader.py:37-54 __fix_lines is observable byte-for-byte)


def _docx_lines(rel):
    from dedoc_ray.readers.office import read_docx

    with open(os.path.join(DATA, rel), "rb") as f:
        return read_docx(f.read()).lines


def test_docx_header_test_numbering():
    # test_format_docx_reader.py:68-87 test_docx_without_tables
    lines = _docx_lines("docx/header_test.docx")
    got = [ln.line.strip() for ln in lines[:12]]
    assert got == [
        "Глава 543", "Какой-то текст.",
        "1. Текстового", "2. Текстового", "3. Еще текстового", "4. Пам",
        "4.1. авп", "4.2. текстового", "4.3. п", "4.4. п", "4.5. п", "4.6. п",
    ]


def test_docx_tz_multiline_first_line():
    # test_format_docx_reader.py:89-95 test_tz_file (w:br inside the run +
    # __fix_lines trailing newline, byte-exact)
    lines = _docx_lines("docx/tz.docx")
    assert lines[0].line == "Техническое задание\nна оказание услуг по созданию системы защиты персональных данных \n"


def test_docx_without_numbering_parses():
    # test_format_docx_reader.py:97-104 — numPr referencing a numId the
    # numbering part lacks must not raise
    assert len(_docx_lines("docx/without_numbering.docx")) > 0


def test_docx_caps_letters():
    # test_format_docx_reader.py:106-119 — w:caps uppercasing, and the
    # conditional newline: caps_1 lines 2-3 stay bare (unequal levels),
    # caps_2 lines 0/2 carry it (equal-level unknown successors)
    lines = _docx_lines("docx/caps_1.docx")
    assert lines[2].line == "ШИЖМАШ МОГАЙ ЛИЕШ ГЫН?\t"
    assert lines[3].line == "АНАСТАСИЯ АЙГУЗИНА"
    lines = _docx_lines("docx/caps_2.docx")
    assert lines[0].line == 'И. Одар "Таргылтыш"\n'
    assert lines[2].line == "I глава\n"


def test_docx_justification_alignment():
    # test_format_docx_reader.py:121-129 test_justification
    lines = _docx_lines("docx/justification.docx")
    for idx, want in [(15, "left"), (16, "center"), (17, "both"), (18, "right")]:
        vals = [a.value for a in lines[idx].annotations if a.name == "alignment"]
        assert vals == [want], (idx, vals)


def test_docx_numeration_byte_exact():
    # test_format_docx_reader.py:130-143 test_numeration — rendered list
    # prefixes with tab suffixes, list items bare of trailing newline
    lines = _docx_lines("docx/numeration.docx")
    assert lines[1].line.strip() == "5. Test numeration"
    assert lines[2].line.strip() == "5.1 text"
    expected = [
        (3, "5.2 text. "), (4, "5.2.1.\tlist. "), (5, "5.2.2.\tlist"),
        (7, "5.3.\tlist."), (8, "5.3.1\t list."), (9, "5.3.2\t list"),
        (11, "5.4.\tlist"), (13, "5.5.\tlist"),
    ]
    for idx, want in expected:
        assert lines[idx].line == want, (idx, lines[idx].line)


# ------------------------------------------------ pptx family (api pins)
# reference tests/api_tests/test_api_format_pptx.py — same fixture files,
# same tree paths, same byte-exact node texts / annotation spans / merges


def _tree_nodes(result):
    def walk(node, path="0"):
        yield path, node
        for i, sub in enumerate(node.get("subparagraphs", [])):
            yield from walk(sub, f"{path}.{i}")

    return dict(walk(result["content"]["structure"]))


def _cell_text(cell):
    # cells carry "lines" (populated only for annotated cells) + flat "text"
    if cell.get("lines"):
        return "".join(ln["text"] for ln in cell["lines"])
    return cell.get("text", "")


def _check_pptx_content(result):
    # reference __check_content (test_api_format_pptx.py:159-173)
    subs = result["content"]["structure"]["subparagraphs"]
    assert subs[0]["text"].strip() == "A long time ago in a galaxy far far away"
    assert subs[1]["text"].strip() == "Example"
    assert subs[2]["text"].strip() == "Some author"
    assert subs[3]["text"].strip() == "This is simple table"
    table = result["content"]["tables"][0]
    rows = [[_cell_text(c) for c in row] for row in table["cells"]]
    assert rows[0] == ["", "Header1\n", "Header2\n", "Header3\n"]
    assert rows[1] == ["Some content\n", "A\n", "B\n", "C\n"]
    table_anns = [a for a in subs[2]["annotations"] if a["name"] == "table"]
    assert len(table_anns) == 1 and table_anns[0]["value"] == table["uid"]


@pytest.mark.parametrize("name", ["pptx/example.pptx", "pptx/example.ppt", "pptx/example.odp"])
def test_pptx_family_content(name):
    _check_pptx_content(parse(name, structure_type="linear"))


def test_pptx_structure_and_annotations():
    # test_api_format_pptx.py:26-119 on test-presentation.pptx
    r = parse("pptx/test-presentation.pptx", with_attachments="true")
    nodes = _tree_nodes(r)

    # headers with placeholder-level size/alignment
    node = nodes["0.0"]
    assert node["text"] == "Title\n" and node["metadata"]["paragraph_type"] == "header"
    sizes = [a["value"] for a in node["annotations"] if a["name"] == "size"]
    assert [float(s) for s in sizes] == [50.0]
    assert [a["value"] for a in node["annotations"] if a["name"] == "alignment"] == ["center"]
    assert nodes["0.2"]["text"] == "Title\n" and nodes["0.2"]["metadata"]["paragraph_type"] == "header"

    # auto-numbered lists, nested restarts, bullets (buChar)
    assert nodes["0.2.1"]["metadata"]["paragraph_type"] == "list"
    for path, text in [
        ("0.2.1.0", "1. first item\n"), ("0.2.1.1", "2. second item\n"),
        ("0.2.1.1.0.0", "a. subitem\n"), ("0.2.1.2", "3. third item\n"),
        ("0.2.1.2.0.0", "a. \n"),
        ("0.3.0.0", "❏ first bullet item\n"), ("0.3.0.1", "❏ second bullet item\n"),
        ("0.3.0.1.0.0", "❏ subitem\n"),
        ("0.3.1.0", "A. first letter item\n"), ("0.3.1.1", "B. second letter item\n"),
        ("0.3.1.1.0.0", "○ first subitem\n"), ("0.3.1.1.0.1", "○ second subitem\n"),
    ]:
        assert nodes[path]["text"] == text, (path, nodes[path]["text"])
    assert nodes["0.2.1.1.0"]["metadata"]["paragraph_type"] == "list"

    # run-level annotations on the custom text field (node 0.5/0.5.0)
    node = nodes["0.5"]
    assert node["text"] == "Custom title\n" and node["metadata"]["paragraph_type"] == "header"
    anns = {(a["start"], a["end"], a["name"], a["value"]) for a in node["annotations"]}
    assert (0, 12, "size", "30.0") in anns and (0, 12, "bold", "True") in anns
    assert (0, 13, "alignment", "center") in anns
    node = nodes["0.5.0"]
    anns = {(a["start"], a["end"], a["name"], a["value"]) for a in node["annotations"]}
    assert {float(v) for s, e, n, v in anns if n == "size"} == {18.0, 24.0, 10.0}
    for want in [(18, 27, "bold", "True"), (28, 39, "italic", "True"), (40, 55, "underlined", "True"),
                 (56, 67, "strike", "True"), (68, 79, "superscript", "True"), (81, 90, "subscript", "True")]:
        assert want in anns, want
    node = nodes["0.6"]
    anns = {(a["start"], a["end"], a["name"], a["value"]) for a in node["annotations"]}
    for want in [(0, 12, "bold", "True"), (0, 12, "italic", "True"), (0, 12, "underlined", "True"),
                 (0, 12, "size", "20.0"), (0, 13, "alignment", "right")]:
        assert want in anns, want

    # hMerge/vMerge invisible copies (all eight reference cell pins)
    table = r["content"]["tables"][0]
    tann = [a["value"] for a in nodes["0.4"]["annotations"] if a["name"] == "table"]
    assert tann == [table["uid"]]
    cells = table["cells"]
    def cell(i, j):
        c = cells[i][j]
        return (_cell_text(c), c["rowspan"], c["colspan"], c["invisible"])
    assert cell(0, 0) == ("Horizontally merged cells\n", 1, 2, False)
    assert cell(0, 1) == ("Horizontally merged cells\n", 1, 1, True)
    assert cell(1, 2) == ("Vertically merged cells\n", 2, 1, False)
    assert cell(2, 2) == ("Vertically merged cells\n", 1, 1, True)
    assert cell(2, 0) == ("Vertically merged cells 2\n", 2, 1, False)
    assert cell(3, 0) == ("Vertically merged cells 2\n", 1, 1, True)
    assert cell(3, 2) == ("Horizontally merged cells 2\n", 1, 3, False)
    assert cell(3, 3) == ("Horizontally merged cells 2\n", 1, 1, True)

    # attachments: pic shapes annotate the preceding line with the uid
    assert len(r["attachments"]) == 3
    uids = {a["uid"] for a in r["attachments"]}
    vals = [a["value"] for a in nodes["0.6"]["annotations"] if a["name"] == "attachment"]
    assert len(vals) == 2 and all(v in uids for v in vals)
    assert nodes["0.8.0"]["text"] == "Text text\n"
    vals = [a["value"] for a in nodes["0.8.0"]["annotations"] if a["name"] == "attachment"]
    assert len(vals) == 1 and vals[0] in uids


# --------------------------------------------- excel family (api pins)
# reference tests/api_tests/test_api_format_excel.py — xlrd-parity float
# rendering ("1" → "1.0") and cached formula results, across all three
# containers (ooxml, opendocument, BIFF8)


def _sheet_rows(result, idx):
    return [[_cell_text(c).strip() for c in row] for row in result["content"]["tables"][idx]["cells"]]


@pytest.mark.parametrize("name", ["xlsx/example.xlsx", "xlsx/example.ods", "xlsx/example.xls"])
def test_excel_family_grids(name):
    r = parse(name)
    assert _sheet_rows(r, 0)[:2] == [["1.0", "2.0", "3.0"], ["4.0", "5.0", "6.0"]]
    assert _sheet_rows(r, 1)[:2] == [["11.0", "22.0", "33.0", "44.0"], ["55.0", "66.0", "77.0", "88.0"]]


@pytest.mark.parametrize("name", ["xlsx/example_formulas.xlsx", "xlsx/example_formulas.ods", "xlsx/example_formulas.xls"])
def test_excel_family_formulas(name):
    # cached formula results surface like values (BIFF FORMULA/STRING
    # records, xlsx cached <v>, ods office:value)
    r = parse(name)
    assert _sheet_rows(r, 0)[:6] == [
        ["a", "b", "c"], ["1.0", "2.0", "3.0"], ["3.0", "4.0", "7.0"],
        ["2.0", "3.0", "5.0"], ["5.0", "6.0", "11.0"], ["7.0", "33.0", "40.0"],
    ]
    assert _sheet_rows(r, 1)[:9] == [
        ["r", "p", "s", "pi"], ["1.0", "6.28", "3.14", "3.14"],
        ["2.0", "12.56", "12.56", ""], ["3.0", "18.84", "28.26", ""],
        ["4.0", "25.12", "50.24", ""], ["5.0", "31.4", "78.5", ""],
        ["6.0", "37.68", "113.04", ""], ["7.0", "43.96", "153.86", ""],
        ["8.0", "50.24", "200.96", ""],
    ]


def test_eml_typed_header_lines():
    # test_api_format_email.py:11-50 — root = subject, typed from/to nodes,
    # message_header json attachment first, fixed attachment names
    r = parse("eml/message.eml", with_attachments="true")
    st = r["content"]["structure"]
    assert st["text"] == "TetSubj\n"
    subs = st["subparagraphs"]
    assert subs[0]["metadata"]["paragraph_type"] == "subject"
    assert subs[1]["text"] == '"aa@aa.aa" <aa@aa.aa>\n'
    assert subs[1]["metadata"]["paragraph_type"] == "from"
    assert subs[2]["text"] == '"bb@bb.bb" <bb@bb.bb>\n'
    assert subs[2]["metadata"]["paragraph_type"] == "to"
    names = [a["name"] for a in r["attachments"]]
    assert len(names) == 3
    assert names[0].startswith("message_header_")
    assert names[1] == "grafana.jpg"
    assert names[2] == "KY100Product SheetProduct Sheet.pdf"


def test_eml_spam_mail_decoded_subject():
    # test_api_format_email.py:11-30 (rfc2047-decoded subject, double space)
    r = parse("eml/spam_mail.eml", with_attachments="true")
    st = r["content"]["structure"]
    assert st["text"] == "[Spam]Artificial flowers  for decors\n"
    subs = st["subparagraphs"]
    assert subs[1]["text"] == '"sunny_goldensun@126.com" <sunny_goldensun@126.com>\n'
    assert subs[1]["metadata"]["paragraph_type"] == "from"
    assert subs[2]["text"] == "modis@ispras.ru\n"
    assert subs[2]["metadata"]["paragraph_type"] == "to"
    assert [a["name"] for a in r["attachments"]][0].startswith("message_header_")


# ------------------------------------------------- json (api pins)
# reference tests/api_tests/test_api_format_json.py — typed key/list tree


def test_json_string_list_dict():
    r = parse("json/string.json")
    assert r["content"]["structure"]["subparagraphs"][0]["text"] == "у попа была собака"

    r = parse("json/list.json")
    list_node = r["content"]["structure"]["subparagraphs"][0]
    assert list_node["metadata"]["paragraph_type"] == "list"
    items = list_node["subparagraphs"]
    assert [(i["metadata"]["paragraph_type"], i["text"]) for i in items] == [
        ("list_item", "у попа была собака"), ("list_item", "он её любил"),
    ]

    r = parse("json/dict.json")
    nodes = r["content"]["structure"]["subparagraphs"]
    assert nodes[0]["metadata"]["paragraph_type"] == "key"
    assert nodes[0]["subparagraphs"][0]["text"] == "у попа была собака"
    assert nodes[1]["metadata"]["paragraph_type"] == "key"
    assert nodes[1]["subparagraphs"][0]["text"] == "он её любил"


def test_json_nested_containers():
    # test_api_format_json.py:39-68 (dict_with_list + list_with_dict)
    r = parse("json/dict_with_list.json")
    result = r["content"]["structure"]
    first = result["subparagraphs"][0]["subparagraphs"][0]["subparagraphs"]
    second = result["subparagraphs"][1]["subparagraphs"][0]["subparagraphs"]
    first, second = sorted([first, second], key=lambda v: -len(v))
    assert [i["text"] for i in first] == ["июнь", "июль", "август"]
    assert [i["text"] for i in second] == ["понедельник", "вторник"]

    r = parse("json/list_with_dict.json")
    nodes = _tree_nodes(r)
    assert nodes["0.0.0.0"]["text"] == "month"
    assert [nodes[f"0.0.0.0.0.{k}"]["text"] for k in range(3)] == ["июнь", "июль", "август"]
    assert nodes["0.1.0.0"]["text"] == "days"
    assert [nodes[f"0.1.0.0.0.{k}"]["text"] for k in range(2)] == ["понедельник", "вторник"]


def test_docx_style_numbering_on_headings():
    # test_api_misc_nesting_list.py pins "1.5.\tОснования разработки" etc. —
    # Heading styles whose numPr lacks ilvl bind to the lvl naming them via
    # pStyle, and numbered headings render their prefix
    # (styles_extractor.py:80-86 + numbering_extractor.py:56-66)
    r = parse("docx/pr14tz_v5_2007_03_01.docx", structure_type="tree")
    t = r["extracted_text"]
    assert "1.5.\tОснования разработки" in t
    assert "1.6.\tНормативные документы" in t
    assert "1.7.\tСведения об источниках и порядке финансирования работ" in t
    assert "4.1.1.\tТребования к структуре и функционированию" in t
    assert "Система должна иметь базу хранения" in t


def test_docx_structure_types():
    # test_api_misc_structure.py:11-33 — example.docx node counts per
    # structure_type
    r = parse("docx/example.docx", structure_type="linear")
    nodes = r["content"]["structure"]["subparagraphs"]
    assert len(nodes) == 13 and all(n["subparagraphs"] == [] for n in nodes)
    r = parse("docx/example.docx", structure_type="tree")
    nodes = r["content"]["structure"]["subparagraphs"]
    assert len(nodes) == 2
    assert nodes[0]["text"].split("\n")[0] == "Пример документа"
    assert nodes[1]["subparagraphs"][0]["text"].strip() == "1.2.1. Поясним за непонятное"


# ------------------------------------------- csv + txt api pins
# reference tests/api_tests/test_api_format_csv.py / test_api_format_txt.py


@pytest.mark.parametrize("name", ["csvs/utf-8.csv", "csvs/cp1251.csv", "csvs/utf-8.tsv", "csvs/cp1251.tsv"])
def test_csv_encodings_and_tsv(name):
    r = parse(name)
    t = [[_cell_text(c).strip() for c in row] for row in r["content"]["tables"][0]["cells"]]
    assert t[0] == ["имя", "фамилия", "возраст"]
    assert t[1] == ["Иванов", "Иван", "31"]
    assert t[2] == ["Алексей", "Петров", "15"]


def test_csv_books_quoting():
    r = parse("csvs/books.csv")
    assert "delimiter is ','" in r["warnings"]
    t = [[_cell_text(c).strip() for c in row] for row in r["content"]["tables"][0]["cells"]]
    assert t[0] == ["id", "cat", "name", "price", "inStock", "author", "series_t", "sequence_i", "genre_s"]
    assert t[3] == ["055357342X", "book", "A Storm of Swords", "7.99", "true",
                    "George R.R. Martin", "A Song of Ice and Fire", "3", "fantasy"]
    r = parse("csvs/books_2.csv")
    t = [[_cell_text(c).strip() for c in row] for row in r["content"]["tables"][0]["cells"]]
    assert t[1][2] == "A Game of Throne, kings and other stuff"
    assert t[2][2] == 'A Clash of "Kings"'


def test_txt_special_symbols_byte_exact():
    # test_api_format_txt.py:46-51 — the whole file is one node, byte-exact
    r = parse("txt/special_symbol.txt", structure_type="tree", encoding="utf-8")
    with open(os.path.join(DATA, "txt/special_symbol.txt")) as f:
        assert r["content"]["structure"]["subparagraphs"][0]["text"] == f.read()


@pytest.mark.parametrize("name", ["txt/football.txt", "txt/football.txt.gz"])
def test_txt_football_paragraphs(name):
    # test_api_format_txt.py:53-63 + __check_football — 4 paragraph nodes,
    # leading indentation preserved, spacing annotation span byte-exact
    r = parse(name, structure_type="tree")
    subs = r["content"]["structure"]["subparagraphs"]
    assert len(subs) == 4
    assert subs[0]["text"].startswith("    Association football, more commonly known as simply")
    assert subs[0]["text"].endswith("The team with the higher number of goals wins the game.\n\n")
    assert {"name": "spacing", "value": "50", "start": 0, "end": 546} in [
        {k: a[k] for k in ("name", "value", "start", "end")} for a in subs[0]["annotations"]
    ]
    assert subs[1]["text"].startswith("  Football is played in accordance with a set of rules known")
    assert subs[1]["text"].strip().endswith("the coin toss prior to kick-off or penalty kicks.")


def test_txt_large_gz_line_numbers():
    # test_api_format_txt.py:65-71
    r = parse("txt/large_text.txt.gz", structure_type="tree")
    content = r["content"]["structure"]["subparagraphs"][0]["text"]
    for i, line in enumerate(content.split("\n")):
        if line.strip():
            assert line == f"Line number {i:09d}"


# ----------------------------------------------- html format (continued)
# reference test_api_format_html.py:114-221 over the real html fixtures


def _node(tree, path):
    for i in path.split(".")[1:]:
        tree = tree["subparagraphs"][int(i)]
    return tree


def test_html_part_nesting():
    # :114-123 — header nesting of the partial-html fragment
    c = parse("htmls/part.html")["content"]["structure"]
    assert _node(c, "0.0")["text"].strip() == "Лесные слоны"
    assert _node(c, "0.0.0")["text"].strip() == "В данном разделе мы поговорим о малоизвестных лесных слонах..."
    assert _node(c, "0.0.1")["text"].strip() == "Среда обитания"
    assert _node(c, "0.0.1.0")["text"].strip() == "Лесные слоны живут не на деревьях, а под ними."


def test_html_plain_text():
    # :125-131
    c = parse("htmls/plain.html")["content"]["structure"]
    assert c["subparagraphs"][0]["text"] == "February 24, 2021 and some text"


def test_html_styles_as_attribute():
    # :133-148 — alignment + bold annotations with exact offsets
    c = parse("htmls/html_with_styles.html")["content"]["structure"]
    node = c["subparagraphs"][0]
    assert node["text"] == "Some right text\nSome center text\nSome left text\n\nBIG TEXT"
    anns = [{k: a[k] for k in ("name", "value", "start", "end")} for a in node["annotations"]]
    for expected in (
        {"name": "alignment", "value": "right", "start": 0, "end": 15},
        {"name": "alignment", "value": "left", "start": 33, "end": 47},
        {"name": "bold", "value": "True", "start": 33, "end": 47},
        {"name": "bold", "value": "True", "start": 0, "end": 15},
    ):
        assert expected in anns


def test_html_table_with_styles():
    # :150-166 — cell-level annotations and span/invisible grid
    t = parse("htmls/table_with_styles.html")["content"]["tables"][0]

    def anns(r, c):
        return [{k: a[k] for k in ("name", "value", "start", "end")}
                for ln in t["cells"][r][c]["lines"] for a in ln["annotations"]]

    assert {"start": 0, "end": 6, "name": "bold", "value": "True"} in anns(1, 0)
    assert {"start": 0, "end": 10, "name": "italic", "value": "True"} in anns(1, 1)
    assert {"start": 0, "end": 10, "name": "linked_text", "value": "some_text"} in anns(2, 0)
    assert {"start": 0, "end": 16, "name": "strike", "value": "True"} in anns(2, 1)
    assert (t["cells"][3][0]["rowspan"], t["cells"][3][0]["colspan"], t["cells"][3][0]["invisible"]) == (2, 2, False)
    assert t["cells"][3][1]["invisible"] is True
    assert t["cells"][4][0]["invisible"] is True


def test_html_newlines_grouping():
    # :172-193 — the Support block keeps its address lines together
    c = parse("htmls/some.html")["content"]["structure"]
    node = _node(c, "0.0")
    assert node["text"].strip() == "Support"
    assert node["metadata"]["paragraph_type"] == "header"
    text = _node(c, "0.0.0")["text"]
    for probe in ("Technical support:", "Facility / Shipping / Mailing address:",
                  "Grand Rapids, MI 49512-9704 USA", "Repair and overhaul administration: ",
                  "Data services:",
                  "For service repair (Part 145) returned material authorizations (RMA):"):
        assert probe in text


def test_html_leading_newlines_53():
    # :195-200
    c = parse("htmls/53.html")["content"]["structure"]
    assert c["subparagraphs"][0]["text"].startswith("\n\n")


def test_html_no_newline_italic():
    # :202-213
    c = parse("htmls/no_new_line.html")["content"]["structure"]
    node = c["subparagraphs"][0]
    assert node["text"].strip() == ('"I can’t bring myself to feel too sorry for Amazon or textbook '
                                    'publishers, given how much they tend to gouge on the prices of those books."')
    italics = [node["text"][a["start"]:a["end"]] for a in node["annotations"] if a["name"] == "italic"]
    assert "or" in italics


def test_html_none_display_hidden():
    # :215-221 — display:none spans carry the hidden style annotation
    c = parse("htmls/none_display.html")["content"]["structure"]
    anns = [{k: a[k] for k in ("name", "value", "start", "end")}
            for a in c["subparagraphs"][0]["annotations"]]
    assert {"name": "style", "value": "hidden", "start": 24, "end": 39} in anns
    assert {"name": "bold", "value": "True", "start": 45, "end": 49} in anns


def test_html_font_style_210_parses():
    # :168-170
    assert parse("htmls/210.html")["status"] == "ok"


def test_pdf_text_style_annotations():
    # test_api_format_pdf_with_text.py:83-101 — font-name style annotations
    # on the txtlayer route (values are the reference's verbatim)
    r = parse("pdf_with_text_layer/2-column-state.pdf",
              pdf_with_text_layer="true", need_pdf_table_analysis="false")
    node = r["content"]["structure"]["subparagraphs"][0]
    assert node["text"][0:27] == "Compromising Tor Anonymity\n"
    styles = [(a["value"], a["start"], a["end"]) for a in node["annotations"] if a["name"] == "style"]
    assert ("Helvetica-Bold", 0, 61) in styles
    bolds = [(a["start"], a["end"]) for a in node["annotations"] if a["name"] == "bold"]
    assert (0, 61) in bolds


def test_pdf_diff_styles_fonts():
    # :40-47 — per-run font names on the diff_styles fixture
    r = parse("pdf_with_text_layer/diff_styles.pdf",
              pdf_with_text_layer="true", need_pdf_table_analysis="false")

    def walk(n):
        yield n
        for c in n.get("subparagraphs", []):
            yield from walk(c)

    nodes = list(walk(r["content"]["structure"]))
    tahoma = [n for n in nodes for a in n.get("annotations", [])
              if a["name"] == "style" and "Tahoma" in a["value"]]
    assert tahoma, "Tahoma-run style annotation missing"
    sizes = {a["value"] for n in nodes for a in n.get("annotations", []) if a["name"] == "size"}
    assert any(v.startswith("20") for v in sizes)  # the 20pt heading


def test_pdf_table_only_carrier_ref():
    # test_api_format_pdf_with_text.py:145-149 — a table-only pdf still
    # exposes the table annotation on subparagraphs[0]
    r = parse("pdf_with_text_layer/VVP_global_table.pdf", pdf_with_text_layer="true")
    uid = r["content"]["tables"][0]["uid"]
    sub0 = r["content"]["structure"]["subparagraphs"][0]
    assert uid in [a["value"] for a in sub0["annotations"] if a["name"] == "table"]


def test_pdf_multipage_table_refs_survive_header_removal():
    # :151-160 — with header/footer analysis on, every table's uid is
    # referenced from a SURVIVING line
    r = parse("tables/multipage_table.pdf", pdf_with_text_layer="true",
              need_header_footer_analysis="true")
    uids = {t["uid"] for t in r["content"]["tables"]}
    assert uids

    def walk(n):
        yield n
        for c in n.get("subparagraphs", []):
            yield from walk(c)

    refs = {a["value"] for n in walk(r["content"]["structure"])
            for a in n.get("annotations", []) if a["name"] == "table"}
    assert refs == uids


# ------------------------------------------------------------------ json
# reference test_api_format_json.py:13-51


def test_json_string_scalar():
    r = parse("json/string.json")
    assert r["content"]["structure"]["subparagraphs"][0]["text"].strip() == "у попа была собака"


def test_json_list_nodes():
    s = parse("json/list.json")["content"]["structure"]
    lst = s["subparagraphs"][0]
    assert lst["metadata"]["paragraph_type"] == "list"
    items = lst["subparagraphs"]
    assert len(items) == 2
    assert items[0]["metadata"]["paragraph_type"] == "list_item"
    assert items[0]["text"].strip() == "у попа была собака"
    assert items[1]["text"].strip() == "он её любил"


def test_json_dict_nodes():
    s = parse("json/dict.json")["content"]["structure"]
    nodes = s["subparagraphs"]
    assert nodes[0]["metadata"]["paragraph_type"] == "key"
    assert nodes[0]["subparagraphs"][0]["text"].strip() == "у попа была собака"
    assert nodes[1]["metadata"]["paragraph_type"] == "key"
    assert nodes[1]["subparagraphs"][0]["text"].strip() == "он её любил"


def test_json_dict_with_list():
    s = parse("json/dict_with_list.json")["content"]["structure"]

    def walk(n):
        yield n
        for c in n.get("subparagraphs", []):
            yield from walk(c)

    texts = [n["text"].strip() for n in walk(s)]
    for probe in ("июнь", "июль", "август"):
        assert probe in texts


def test_pdf_tabby_line_annotations():
    # test_api_format_pdf_tabby_reader.test_pdf_annotations — the tabby
    # route carries the same bold/spacing/bbox annotation set as txtlayer
    r = parse("pdf_with_text_layer/Document635.pdf", pdf_with_text_layer="tabby")
    names = {a["name"] for a in r["content"]["structure"]["subparagraphs"][0]["annotations"]}
    assert {"bold", "spacing", "bounding box"} <= names


def test_pdf_additional_page_ids_exact():
    # test_api_misc_structure.test_page_id_tree_structure — a paragraph
    # merged across 7 pages records each page's text span at the
    # reference's EXACT byte positions
    r = parse("pdf_with_text_layer/test_page_id.pdf", structure_type="tree")
    node = r["content"]["structure"]["subparagraphs"][0]
    positions = [2135, 4270, 6405, 8540, 10675, 12810, 13323]
    extra = node["metadata"]["additional_page_ids"]
    for idx, entry in enumerate(extra, start=1):
        assert entry["page_id"] == idx
        assert entry["start"] == positions[idx - 1]
        assert entry["end"] == positions[idx]
        seg = node["text"][entry["start"]:entry["end"]]
        assert not seg.startswith("\n") and seg.endswith("\n")


def test_image_metadata_dimensions():
    # test_api_format_pdf.test_image_metadata — exif dims + rotation angles
    r = parse("scanned/orient_3.png")
    assert r["metadata"]["exif_image_width"] == 1654
    assert r["metadata"]["exif_image_height"] == 2338
    assert "rotated_page_angles" in r["metadata"]


def test_pdf_tabby_global_table_exact_grid():
    # test_api_format_pdf_tabby_reader.test_tables2 — all 11 rows verbatim
    r = parse("pdf_with_text_layer/VVP_global_table.pdf", pdf_with_text_layer="tabby")
    rows = [[c["text"].strip() for c in row] for row in r["content"]["tables"][0]["cells"]]
    assert rows == [
        ["Государство", "Место", "ВВП (по ППС) за 2018 г."],
        ["Китай", "1", "25362"], ["США", "2", "20494"], ["Индия", "3", "10498"],
        ["Япония", "4", "5415"], ["Германия", "5", "4456"], ["Франция", "9", "3037"],
        ["Россия", "6", "4051"], ["Индонезия", "7", "3495"], ["Бразилия", "8", "3366"],
        ["Франция", "9", "3037"],
    ]


def test_pdf_tabby_vvp6_four_tables():
    # test_api_format_pdf_tabby_reader.test_pdf_with_tables:155-181 —
    # 4 tables; grids 0-2 match the reference's pinned rows
    r = parse("pdf_with_text_layer/VVP_6_tables.pdf",
              pdf_with_text_layer="tabby", document_orientation="no_change")
    tables = r["content"]["tables"]
    assert len(tables) == 4

    def row(t, i):
        return [c["text"].strip() for c in tables[t]["cells"][i]]

    assert row(0, 0) == ["Государство", "Место", "ВВП (по ППС) за 2018 г."]
    assert row(0, 1) == ["Китай", "1", "25362"]
    assert row(0, 2) == ["США", "2", "20494"]
    assert row(1, 1) == ["Индия", "3", "10498"]
    assert row(1, 4) == ["Франция", "9", "3037"]
    assert row(2, 1) == ["Россия", "6", "4051"]
    assert row(2, 3) == ["Бразилия", "8", "3366"]
    assert row(3, 0) == ["", "2016", "2017", "2018", "2019"]


def test_pdf_example_two_tables_with_refs():
    # test_api_format_pdf_with_text.test_ref_tables — example.pdf has TWO
    # tables on both routes, each referenced from the tree by uid
    def walk(n):
        yield n
        for c in n.get("subparagraphs", []):
            yield from walk(c)

    for mode in ("true", "tabby"):
        r = parse("pdf_with_text_layer/example.pdf", pdf_with_text_layer=mode)
        uids = [t["uid"] for t in r["content"]["tables"]]
        assert len(uids) == 2, mode
        refs = {a["value"] for n in walk(r["content"]["structure"])
                for a in n.get("annotations", []) if a["name"] == "table"}
        assert refs == set(uids), mode


def test_pdf_merged_cells_spans():
    # test_api_format_pdf_tabby_reader.test_tables_with_merged_cells —
    # col/rowspans from the drawn cell borders, exact reference pins
    r = parse("pdf_with_text_layer/big_table_with_merged_cells.pdf", pdf_with_text_layer="tabby")
    table = r["content"]["tables"][0]["cells"]
    for (i, j), k in [[(1, 0), 10], [(5, 5), 5]]:
        assert table[i][j]["invisible"] is False
        assert table[i][j]["rowspan"] == 1
        assert table[i][j]["colspan"] == k
    assert table[3][0]["invisible"] is False
    assert table[3][0]["rowspan"] == 3
    assert table[3][0]["colspan"] == 4


# ------------------------- running header/footer removal on real PDFs
# reference test_format_pdf_reader.test_header_footer_search{,_2,_3}: the
# Richelieu Bond / QUEST MANAGEMENT prospectuses carry a running header on
# every page and "- N -"-style page footers; with need_header_footer_analysis
# both must vanish while genuine BODY mentions of the same words survive.

import re as _re


def _hf_lines(rel):
    from dedoc_ray.readers.header_footer import remove_headers_footers
    from dedoc_ray.readers.pdf import read_pdf_textlayer

    with open(os.path.join(DATA, rel), "rb") as f:
        doc = read_pdf_textlayer(f.read())
    lines, _w = remove_headers_footers(doc.lines)
    pages = {}
    for line in lines:
        pages.setdefault(line.metadata.page_id, []).append(line.line)
    return pages


def test_header_footer_prospectus():
    pages = _hf_lines("pdf_with_text_layer/prospectus.pdf")
    assert len(pages) == 6
    flat = [l for p in pages.values() for l in p]
    assert not any(l.strip() == "Richelieu Bond" for l in flat)
    assert not any(_re.match(r"^\s*-( )*[0-9]+( )*-\s*$", p[-1]) for p in pages.values())
    assert any('Richelieu Bond (the "Sicav")' in l for l in flat)  # body kept


def test_header_footer_changed_positions():
    # reference test 2: same header/footer pattern at CHANGED positions
    pages = _hf_lines("pdf_with_text_layer/with_changed_header_footer.pdf")
    assert len(pages) == 10
    flat = [l for p in pages.values() for l in p]
    assert not any(l.strip() == "Richelieu Bond" for l in flat)
    assert not any(_re.match(r"^\s*-( )*[0-9]+( )*-\s*$", p[-1]) for p in pages.values())


def test_header_footer_quest_sicav():
    pages = _hf_lines("pdf_with_text_layer/with_header_footer_2.pdf")
    assert len(pages) == 5
    flat = [l for p in pages.values() for l in p]
    assert not any(l.strip() == "QUEST MANAGEMENT, SICAV" for l in flat)
    assert not any(_re.match(r"^\s*[0-9]\s*$", p[-1]) for p in pages.values())
    assert any('QUEST MANAGEMENT, SICAV (the "Company")' in l for l in flat)


def test_strict_ooxml_docx():
    # size1/size2.docx are ISO 29500 STRICT documents (purl.oclc.org
    # namespaces; 'pt'-suffixed measurements) — the reference reads them
    # via namespace-agnostic tag matching and pins every size annotation
    # at 12.0 (test_format_docx_reader.py:289-300); the strict→transitional
    # namespace normalization makes them parse through the same reader
    from dedoc_ray.readers.office import read_docx

    for nm in ("size1.docx", "size2.docx"):
        with open(f"/root/reference/tests/data/docx/{nm}", "rb") as f:
            doc = read_docx(f.read())
        assert doc.lines, nm
        sizes = [
            float(a.value)
            for L in doc.lines
            for a in L.annotations
            if a.name == "size"
        ]
        assert sizes and all(s == 12.0 for s in sizes), (nm, sizes[:5])
