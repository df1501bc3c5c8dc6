"""Glyph-shape unicode recovery (readers/ttf_glyphs.py) on the canonical
"CIDFont+F" garbled fixture — tables/example_with_table9.pdf.

This file's fonts have NO ToUnicode, NO /Encoding, a (3,0) symbol cmap
and a format-3 post table: the byte codes are meaningless without shape
analysis (the reference handles the family with its jar's glyph
classifier; reference pin: test_api_misc_multipage_table.py:27-31 expects
exactly ONE table for pdf_with_text_layer in false/true/tabby).
"""

import pathlib

import pytest

FIXTURE = pathlib.Path("/root/reference/tests/data/tables/example_with_table9.pdf")
DEJAVU = pathlib.Path("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf")

pytestmark = pytest.mark.skipif(
    not (FIXTURE.exists() and DEJAVU.exists()),
    reason="fixture or DejaVu atlas absent",
)


def test_recovered_text_is_real_russian():
    from dedoc_ray.readers.pdf import read_pdf_textlayer

    doc = read_pdf_textlayer(FIXTURE.read_bytes())
    txt = "\n".join(l.line for l in doc.lines)
    # the regulation names decode exactly — Cyrillic, digits, guillemets, №
    assert "СНиП 12-03-2001 «Безопасность труда в строительстве»" in txt
    assert "Федеральный закон от 30.03.1999 № 52-ФЗ" in txt
    assert "О пожарной безопасности" in txt
    assert "Применяемые Подрядчиком материалы" in txt
    # no mojibake survives
    assert "�" not in txt
    assert not any(ord(ch) < 9 for ch in txt)


def test_shift_and_extras_models():
    from dedoc_ray.readers.pdf_objects import PdfDocument
    from dedoc_ray.readers.ttf_glyphs import recover_unicode_map

    doc = PdfDocument(FIXTURE.read_bytes())
    font = doc.resolve(doc.get_object(12))  # the Cyrillic page font
    fd = doc.resolve(font["FontDescriptor"])
    m = recover_unicode_map(doc.stream_bytes(fd["FontFile2"]))
    # constant-shift block (code = cp1251 - 0x86)
    assert m[0x3B] == "Б" and m[0x5A] == "а" and m[0x79] == "я"
    # appended extras beyond the block resolve by shape
    assert m[0x7A] == "ё" and m[0x8B] == "№"
    # the Latin page font (shift 0x1D) with quote extras
    font8 = doc.resolve(doc.get_object(8))
    fd8 = doc.resolve(font8["FontDescriptor"])
    m8 = recover_unicode_map(doc.stream_bytes(fd8["FontFile2"]))
    assert m8[0x14] == "1" and m8[0x11] == "."
    assert m8[0xA9] == "«" and m8[0xAA] == "»"


def test_page_rules_survive_string_literals():
    # regression: the old regex scanner saw operator lookalikes inside ( )
    # strings, corrupting the q/Q stack — rules surfaced 10x off-space
    from dedoc_ray.readers.pdf_objects import PdfDocument
    from dedoc_ray.readers.pdf_rules import page_rules

    doc = PdfDocument(FIXTURE.read_bytes())
    for page in doc.pages():
        h, v = page_rules(doc, page)
        assert h and v
        for x0, x1, y in h:
            assert 0 <= x0 <= x1 <= 700 and 0 <= y <= 900
        break


def test_table_recognizer_reference_pins():
    # test_api_module_table_recognizer: exact table counts + anchors
    from dedoc_ray.manager import DedocRayManager

    m = DedocRayManager()
    D = pathlib.Path("/root/reference/tests/data/tables")
    # пример.pdf: NO tables, first node text pinned (:185-193)
    r = m.parse(data=(D / "пример.pdf").read_bytes(), file_name="пример.pdf",
                parameters={"pdf_with_text_layer": "auto"})
    assert len(r["content"]["tables"]) == 0
    assert "Сегодня мы сравним рост разных человеков." in r["extracted_text"]
    # not_table.pdf (a scan) under forced true: ok + 0 tables (:195-200)
    r = m.parse(data=(D / "not_table.pdf").read_bytes(), file_name="not_table.pdf",
                parameters={"pdf_with_text_layer": "true"})
    assert r["status"] == "ok" and len(r["content"]["tables"]) == 0
    # two_column_document.pdf: exactly the 3 RULED tables (:167-183);
    # two of the three annotation anchors byte-match the reference's
    r = m.parse(data=(D / "two_column_document.pdf").read_bytes(),
                file_name="two_column_document.pdf",
                parameters={"pdf_with_text_layer": "true"})
    assert len(r["content"]["tables"]) == 3
    anchors = []

    def walk(node):
        for a in node.get("annotations", []):
            if a["name"] == "table":
                anchors.append(node["text"][a["start"]:a["end"]].strip())
        for ch in node.get("subparagraphs", []):
            walk(ch)

    walk(r["content"]["structure"])
    assert "Sections 1 through 9 of this document." in anchors
    assert "additions" in anchors
    cells = r["content"]["tables"][0]["cells"]
    assert [c["text"] for c in cells[0]] == ["Column", "Label"]
    assert [c["text"] for c in cells[1]] == ["Raw", "row"]


def test_reference_pin_one_table_all_routes():
    from dedoc_ray.manager import DedocRayManager

    m = DedocRayManager()
    data = FIXTURE.read_bytes()
    for param in ("tabby", "true"):
        r = m.parse(
            data=data,
            file_name="example_with_table9.pdf",
            parameters={"pdf_with_text_layer": param},
        )
        tables = r["content"]["tables"]
        assert len(tables) == 1, param  # reference: exactly one merged table
        rows = tables[0]["cells"]
        assert len(rows) == 13 and len(rows[0]) == 3
        body = " ".join(c["text"] for row in rows for c in row)
        assert "Вид строительства" in body
