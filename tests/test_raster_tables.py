"""Ruled-table recognition on the reference's REAL raster-table fixtures.

The reference pins table bboxes and cell grids via its OpenCV+Tesseract
stack (tests/unit_tests/test_module_table_detection.py, api table tests);
readers/raster_tables.py must land in the same tolerance windows on the
same files."""

import os
from difflib import SequenceMatcher

import numpy as np
import pytest

DATA = "/root/reference/tests/data/tables"

pytestmark = pytest.mark.skipif(
    not os.path.exists("/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"),
    reason="system DejaVu faces absent",
)


def sim(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


def detect(name: str):
    from dedoc_ray.ops.media_codecs import image_decode_gray
    from dedoc_ray.readers.raster_tables import detect_raster_tables
    from dedoc_ray.readers.real_ocr import real_ocr

    with open(os.path.join(DATA, name), "rb") as f:
        img = image_decode_gray(f.read()).astype(np.float32)
    span = max(1.0, img.max() - img.min())
    ink = (img.max() - img) / span
    return detect_raster_tables(ink, real_ocr())


def _close(a, b, eps):
    return abs(a - b) <= eps


def test_table3_structure_and_cells():
    # reference test_table_detection_1 (bbox ±10) + test_table_recognition_1
    tables, boxes = detect("example_with_table3.png")
    assert len(tables) == 1
    top, bot, left, right = boxes[0]
    assert _close(left, 57, 10) and _close(top, 177, 10)
    assert _close(right - left, 519, 10) and _close(bot - top, 617, 10)
    t = tables[0]
    assert len(t.cells) == 8 and len(t.cells[0]) == 3
    # "Инн" cell reads exactly even at this tiny 605-px-wide scan
    assert sim(t.cells[4][1].get_text().strip().capitalize(), "Инн") >= 0.8


def test_table4_structure_and_cells():
    # reference test_table_detection_2 (bbox ±30) + test_table_recognition_2
    # — 300-dpi scan: all four reference cell pins read at ITS OWN 0.8 bar
    tables, boxes = detect("example_with_table4.jpg")
    assert len(tables) == 1
    top, bot, left, right = boxes[0]
    assert _close(left, 108, 30) and _close(top, 1525, 30)
    assert _close(right - left, 2282, 50) and _close(bot - top, 1797, 30)
    t = tables[0]
    assert len(t.cells) == 5 and len(t.cells[0]) == 3
    pins = [
        ((0, 1), "Перечень основных данных и\nтребований"),
        ((0, 2), "Основные данные и требования"),
        ((3, 1), "Количество"),
        ((4, 1), "Технические параметры оборудования"),
    ]
    for (r, c), want in pins:
        got = t.cells[r][c].get_text().strip()
        assert sim(got, want) >= 0.8, (r, c, got)


def test_table5_structure():
    # reference test_table_detection_3 + test_table_recognition_3 grid:
    # 13 rows × 3 cols despite a dashed, slightly-rotated left border
    tables, boxes = detect("example_with_table5.png")
    assert len(tables) == 1
    top, bot, left, right = boxes[0]
    assert _close(left, 164, 30) and _close(top, 261, 30)
    assert _close(right - left, 1464, 50) and _close(bot - top, 1868, 30)
    t = tables[0]
    assert len(t.cells) == 13 and len(t.cells[0]) == 3
    assert sim(t.cells[0][1].get_text().strip(), "Техническая характеристика") >= 0.75


def test_table6_bbox():
    # reference test_table_detection_with_rotate_4 (bbox ±30)
    tables, boxes = detect("example_with_table6.png")
    assert len(tables) == 1
    top, bot, left, right = boxes[0]
    assert _close(left, 57, 30) and _close(top, 507, 30)
    assert _close(right - left, 1652, 60) and _close(bot - top, 631, 30)


def test_no_false_tables_on_plain_pages():
    from dedoc_ray.ops.media_codecs import image_decode_gray
    from dedoc_ray.readers.raster_tables import detect_raster_tables
    from dedoc_ray.readers.real_ocr import real_ocr

    for name in ("example.png", "example_2_columns.png"):
        with open(f"/root/reference/tests/data/scanned/{name}", "rb") as f:
            img = image_decode_gray(f.read()).astype(np.float32)
        ink = (img.max() - img) / max(1.0, img.max() - img.min())
        tables, _ = detect_raster_tables(ink, real_ocr())
        assert tables == [], name


def test_openfont_table_roundtrip_exact():
    # the extract_scan_table_openfont corpus: rendered fully-ruled 3x3
    # grids decode byte-exactly through detection + lattice + cell OCR
    import pyarrow.parquet as pq

    from dedoc_ray.readers.scan_ocr import read_scan
    from dedoc_ray.sources.openfont_writer import (
        openfont_table_cells,
        scan_openfont_table_pgm,
    )

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))[:15]
    for doc_id, text in rows:
        doc = read_scan(scan_openfont_table_pgm(doc_id, text))
        assert doc.tables and len(doc.tables) == 1, doc_id
        got = [[c.get_text().strip() for c in r] for r in doc.tables[0].cells]
        assert got == openfont_table_cells(doc_id, text), (doc_id, got)


def test_gost_multipage_table_pdf():
    # reference test_multipage_gost_table_image: gost_multipage_table.pdf
    # (image-only pdf, FlateDecode+DCTDecode rasters, GOST engineering
    # frame) with need_gost_frame_analysis — the frame is blanked, per-page
    # ruled tables recognize and MERGE across the page break, and the last
    # merged row carries the reference's pinned content
    from dedoc_ray.readers.pdf import read_pdf_auto

    with open("/root/reference/tests/data/tables/gost_multipage_table.pdf", "rb") as f:
        doc = read_pdf_auto(f.read(), gost_frame=True)
    assert doc.tables and len(doc.tables) == 1  # merged across pages
    t = doc.tables[0]
    assert len(t.cells) >= 20 and len(t.cells[0]) >= 4
    last = [c.get_text() for c in t.cells[-1]]
    assert "7.4.9" in last[3]
    assert sim(last[1][:28].strip(), "Испытание на воздействие") >= 0.6
    # the quoted body text survives outside the table
    text = " ".join(L.line for L in doc.lines)
    assert "квалификационных испытаний" in text


def test_read_scan_attaches_tables():
    # end-to-end: the bare-image route carries recognized tables on the doc
    from dedoc_ray.readers.scan_ocr import read_scan

    with open(os.path.join(DATA, "example_with_table3.png"), "rb") as f:
        doc = read_scan(f.read())
    assert doc.tables and len(doc.tables[0].cells) == 8
    assert any("ruled table" in w for w in doc.warnings)
    # the quota-table page: table recognized AND letterhead still read
    with open("/root/reference/tests/data/scanned/orient_3.png", "rb") as f:
        doc = read_scan(f.read())
    assert doc.tables and len(doc.tables[0].cells[0]) >= 5


def test_dotted_table_horizontal_union():
    # reference test_api_module_table_recognizer.py:37-49 — a photographed
    # contract page whose table grid is drawn with dotted/faded lines the
    # strict run-length detector cannot see; the soft bin-coverage fallback
    # must recover the exact 3x4 grid with BOTH unions: col1 merged down
    # rows 0-1 ("Наименование позиции") and the top header tier merged
    # across cols 2-3 ("Начальная (максимальная) цена за единицу...")
    from dedoc_ray.ops.media_codecs import image_decode_gray
    from dedoc_ray.readers.raster_tables import detect_raster_tables
    from dedoc_ray.readers.real_ocr import real_ocr

    with open(
        "/root/reference/tests/data/tables/example_with_table_horizontal_union.jpg", "rb"
    ) as f:
        img = image_decode_gray(f.read()).astype(np.float32)
    ink = (img.max() - img) / max(1.0, img.max() - img.min())
    tables, boxes = detect_raster_tables(ink, real_ocr())
    assert len(tables) == 1
    t = tables[0]
    assert len(t.cells) == 3 and len(t.cells[0]) == 4
    # vertical union: rows 0-1 of col 1 are one cell (copy invisible)
    assert not t.cells[0][1].invisible and t.cells[1][1].invisible
    assert t.cells[0][1].get_text() == t.cells[1][1].get_text()
    # horizontal union: row 0 cols 2-3 are one cell (copy invisible)
    assert not t.cells[0][2].invisible and t.cells[0][3].invisible
    assert t.cells[0][2].get_text() == t.cells[0][3].get_text()
    # tier-2 header and body cells are separate
    assert not t.cells[1][2].invisible and not t.cells[1][3].invisible
    assert not t.cells[2][3].invisible
    # the box sits on the page's bottom quarter
    (top, bot, left, right) = boxes[0]
    assert 2800 < top < 3000 and 3100 < bot < 3300
    assert 200 < left < 400 and 2200 < right < 2350


def test_hor_vert_union_three_tier_header():
    # reference test_api_table_recognition_hor_and_vert_union_2
    # (test_api_module_table_recognizer.py:51-68): a 17-column estimate
    # sheet whose header is THREE tiers deep with both vertical unions
    # (cols 0-4 merged down all three tiers) and horizontal unions
    # ("Стоимость единицы, руб." across cols 6-8, "Общая стоимость, руб."
    # across cols 11-13). The mid-table tier separators do not touch the
    # frame — they anchor on interior column rules (the anchored-keep rule
    # in _drop_interior_strokes).
    from dedoc_ray.ops.media_codecs import image_decode_gray
    from dedoc_ray.readers.raster_tables import detect_raster_tables
    from dedoc_ray.readers.real_ocr import real_ocr

    with open(
        "/root/reference/tests/data/tables/example_with_table_hor_vert_union.png", "rb"
    ) as f:
        img = image_decode_gray(f.read()).astype(np.float32)
    ink = (img.max() - img) / max(1.0, img.max() - img.min())
    tables, _boxes = detect_raster_tables(ink, real_ocr())
    assert len(tables) == 1
    t = tables[0]
    assert len(t.cells) == 6 and len(t.cells[0]) == 17
    # reference row0[6]: "Стоимость единицы, руб." (union copy of the tier
    # head), row1[6]: "В том числе", row2[6]: "Осн.З/п"
    assert sim(t.cells[0][6].get_text().strip(), "Стоимость единицы, руб.") >= 0.6
    assert sim(t.cells[1][6].get_text().strip(), "В том числе") >= 0.7
    assert sim(t.cells[2][6].get_text().strip(), "Осн.З/п") >= 0.4
    # reference row1[10] and row2[10]: "Всего" (vertical union copies)
    assert sim(t.cells[1][10].get_text().strip(), "Всего") >= 0.6
    assert t.cells[2][10].invisible
    assert t.cells[1][10].get_text() == t.cells[2][10].get_text()
    # reference row0[12]: "Общая стоимость, руб." / row1[12]: "В том числе"
    assert sim(t.cells[0][12].get_text().strip(), "Общая стоимость, руб.") >= 0.55
    assert sim(t.cells[1][12].get_text().split("\n")[0], "В том числе") >= 0.7
    # left identity block: cols 0-4 merged down all three header tiers
    assert t.cells[1][0].invisible and t.cells[2][0].invisible


def test_photographed_table_fixtures_structure():
    # reference table_recognizer fixtures (unit test_module_table_detection
    # test_table_detection_2/test_table_recognition_2 + api
    # test_api_table_recognition_3/4): photographed pages — the detector
    # must find one table each with the reference's grid/bbox; cell OCR on
    # these degraded photos is below the text bar, so the pins are
    # structural (the reference pins bboxes the same way in its unit layer)
    from dedoc_ray.ops.media_codecs import image_decode_gray
    from dedoc_ray.readers.raster_tables import detect_raster_tables
    from dedoc_ray.readers.real_ocr import real_ocr

    R = real_ocr()

    def detect_file(name):
        with open(f"/root/reference/tests/data/tables/{name}", "rb") as f:
            img = image_decode_gray(f.read()).astype(np.float32)
        ink = (img.max() - img) / max(1.0, img.max() - img.min())
        return detect_raster_tables(ink, R)

    # table4: 5 rows x 3 cols at bbox ~(108,1525)+(2282x1797) (ref ±30)
    tabs, boxes = detect_file("example_with_table4.jpg")
    assert len(tabs) == 1
    assert len(tabs[0].cells) == 5 and len(tabs[0].cells[0]) == 3
    top, bot, left, right = boxes[0]
    assert _close(left, 108, 50) and _close(top, 1525, 30)
    assert _close(right - left, 2282, 60) and _close(bot - top, 1797, 30)

    # table16: the forestry sheet — ref pins rows up to index 13 (≥14 rows)
    tabs, _ = detect_file("example_with_table16.jpg")
    assert len(tabs) == 1
    assert len(tabs[0].cells) >= 14 and len(tabs[0].cells[0]) == 4

    # table17: same family, ref pins row 3 col 3 (≥4 rows x 4 cols)
    tabs, _ = detect_file("example_with_table17.jpg")
    assert len(tabs) == 1
    assert len(tabs[0].cells) >= 4 and len(tabs[0].cells[0]) == 4


def test_forced_ocr_route_rotated_cell_tables():
    # reference test_api_ml_table_recognition_7 (+ the 270-degree sibling
    # and example_with_table8): pdf_with_text_layer="false" must still
    # yield exactly one table per file. The rendered-text raster carries no
    # ruling lines, so the vector lattice supplies the grid; the crash on
    # narrow rotated-cell bboxes (resample index one past the laid-out
    # strip) is pinned fixed by these parses succeeding.
    from dedoc_ray.readers.pdf import read_pdf_auto

    for name in (
        "example_table_with_90_orient_cells.pdf",
        "example_table_with_270_orient_cells.pdf",
        "example_with_table8.pdf",
    ):
        with open(f"/root/reference/tests/data/tables/{name}", "rb") as f:
            doc = read_pdf_auto(f.read(), mode="false", table_analysis=True)
        assert len(doc.tables or []) == 1, name
        assert doc.lines, name
