"""Recursive attachment handling against the REFERENCE fixture corpus.

Pins the expectations of reference tests/api_tests/
test_api_misc_with_attachments.py over the real files it ships: the
manager-level AttachmentsHandler contract (with_attachments /
need_content_analysis / recursion_deep_attachments), OLE unpacking in
office containers, painted-page-image attachments for every PDF route,
and json html_fields exclusion-as-attachment.
"""

import json
import os

import pytest

from dedoc_ray.manager import DedocRayManager

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(DATA), reason="reference fixtures not present")

_manager = DedocRayManager()


def parse(rel: str, **params):
    return _manager.parse(file_path=os.path.join(DATA, rel), parameters=params or None)


def names_of(result):
    return [a["metadata"]["file_name"] for a in result["attachments"]]


def test_wo_attachments_excel():
    # test_api_misc_with_attachments.py:18-21
    r = parse("xlsx/example.xlsx", with_attachments="true")
    assert r["attachments"] == []


def test_attachments_xlsx_depth_1():
    # :23-27 — attachments exist and each carries an `attachments` list
    r = parse("xlsx/example_with_images.xlsx", with_attachments="true")
    atts = r["attachments"]
    assert len(atts) > 0
    for a in atts:
        assert a["attachments"] is not None
        assert a["metadata"]["file_type"].startswith("image/")


def test_attachments_pdf_depth_1_names():
    # :35-45 — exact names in exact order (embedded files + annotation
    # note; the duplicate header_test.pdf IS the reference behavior)
    r = parse("with_attachments/example_with_attachments_depth_1.pdf", with_attachments="true")
    names = names_of(r)
    assert names[0] == "header_test.pdf"
    assert names[1] == "example_with_table4.jpg"
    assert names[2] == "header_test.pdf"
    assert names[3] == "attachment.txt"
    assert r["attachments"][4]["metadata"]["file_type"] == "application/json"


def test_attachments_pmi_document_types():
    # :47-56 — two painted page images first, then two annotation notes
    r = parse("pdf_with_text_layer/Document635.pdf", with_attachments="true")
    types = [a["metadata"]["file_type"] for a in r["attachments"]]
    assert types == ["image/png", "image/png", "application/json", "application/json"]


def test_need_content_analysis():
    # :58-69 — notes stay empty without content analysis, parse with it
    r = parse("pdf_with_text_layer/Document635.pdf", with_attachments="true", need_content_analysis="false")
    atts = r["attachments"]
    assert len(atts[2]["content"]["structure"]["subparagraphs"]) == 0
    assert len(atts[3]["content"]["structure"]["subparagraphs"]) == 0
    r = parse("pdf_with_text_layer/Document635.pdf", with_attachments="true", need_content_analysis="true")
    atts = r["attachments"]
    assert len(atts[2]["content"]["structure"]["subparagraphs"]) > 0
    assert len(atts[3]["content"]["structure"]["subparagraphs"]) > 0


def test_get_without_attachments():
    # :71-74 — with_attachments=false (the reference default) → []
    r = parse("with_attachments/example_with_attachments_depth_1.pdf", with_attachments="false")
    assert r["attachments"] == []
    r = parse("with_attachments/example_with_attachments_depth_1.pdf")
    assert r["attachments"] == []


def test_json_attachments():
    # :76-85 — html_fields become .html attachments named json.dumps(keys)
    r = parse("json/with_html.json", with_attachments="true",
              html_fields=json.dumps([["title"], ["body"], ["example"], ["deep_key1", "deep_key2", "deep_key3"]]))
    assert len(r["attachments"]) == 4
    assert names_of(r) == ['["title"].html', '["body"].html', '["example"].html',
                           '["deep_key1", "deep_key2", "deep_key3"].html']


def test_json_invalid_html_fields():
    # :87-98 — unknown keys are ignored, never fail the parse
    r = parse("json/with_html.json", with_attachments="true",
              html_fields=json.dumps([["title"], ["example"], ["another_field"], ["test"], ["lists"],
                                      ["log"], ["text"], ["deep_key1", "deep_key2", "deep_key3"]]))
    assert len(r["attachments"]) == 4


def test_json_with_html_fields_with_scripts():
    # :100-112 — the attached html parses on content analysis; scripts drop
    r = parse("json/example2.json", with_attachments="true",
              html_fields=json.dumps([["text"]]), need_content_analysis="true")
    atts = r["attachments"]
    assert len(atts) == 1
    sub = atts[0]["content"]["structure"]["subparagraphs"]
    assert len(sub) == 3
    assert sub[1]["text"].strip() == "Web Content Viewer"
    assert sub[2]["text"].strip() == "Let us know how we can help"


def test_json_with_bad_style_in_html():
    # :114-123
    r = parse("json/0001-p1.json", with_attachments="true",
              html_fields=json.dumps([["news_link"], ["publication_title"], ["publication_date"],
                                      ["publication_author"], ["text_publication"]]))
    assert len(r["attachments"]) == 5


def test_docx_attachments_ole_unpack():
    # :125-142 — OLE .bin containers unpack to the packaged files; the zip
    # attachment recursively yields its 4 members; lorem.txt text parses
    r = parse("with_attachments/with_attachments_0.docx", with_attachments="true", need_content_analysis="true")
    names = names_of(r)
    for expected in ("arch_with_attachs.zip", "VVP_global_table.pdf", "lorem.txt", "books.csv"):
        assert expected in names
    arch = [a for a in r["attachments"] if a["metadata"]["file_name"] == "arch_with_attachs.zip"][0]
    assert len(arch["attachments"]) == 4
    txt = [a for a in r["attachments"] if a["metadata"]["file_name"] == "lorem.txt"][0]
    assert "Adipisicing est non minim aute reprehenderit" in txt["content"]["structure"]["subparagraphs"][0]["text"]


def test_attachments_recursion():
    # :173-185 — depth 0 → nothing; depth 1 → flat; depth 2 → one nested level
    f = "with_attachments/with_attachments_0.docx"
    r = parse(f, with_attachments="true", need_content_analysis="true", recursion_deep_attachments="0")
    assert len(r["attachments"]) == 0
    r = parse(f, with_attachments="true", need_content_analysis="true", recursion_deep_attachments="1")
    assert len(r["attachments"]) > 0
    assert all(len(a["attachments"]) == 0 for a in r["attachments"])
    r = parse(f, with_attachments="true", need_content_analysis="true", recursion_deep_attachments="2")
    assert len(r["attachments"]) > 0
    assert len(r["attachments"][1]["attachments"]) == 4  # the zip's members


def test_mixed_pdf_single_painted_image():
    # :159-171 __check_base64 — mixed_pdf paints its scan raster on page 0
    # only; page 1 lists the same XObject in shared /Resources but never
    # draws it, so exactly ONE image attaches. Divergence by design: the
    # DCT stream passes through as image/jpeg instead of a PNG transcode.
    r = parse("pdf_auto/mixed_pdf.pdf", with_attachments="true")
    assert len(r["attachments"]) == 1
    assert r["attachments"][0]["metadata"]["file_type"] == "image/jpeg"


def test_attachment_metadata_fields():
    # attachments_handler.py:73-79 — every attachment carries file_name,
    # temporary_file_name, size, file_type, uid
    r = parse("with_attachments/example_with_attachments_depth_1.pdf", with_attachments="true")
    for a in r["attachments"]:
        meta = a["metadata"]
        assert meta["file_name"]
        assert meta["temporary_file_name"] == meta["file_name"]
        assert meta["size"] > 0
        assert meta["file_type"]
        assert meta["uid"]


def test_return_base64_attachment_metadata():
    # test_docx_images_base64 (:144-171): base64_encode appears in the
    # ATTACHMENT metadata (never the parent's) only when return_base64 set,
    # and the decoded payload is the original file
    import base64

    r = parse("pdf_auto/mixed_pdf.pdf", with_attachments="true", return_base64="true")
    assert "base64_encode" not in r["metadata"]
    meta = r["attachments"][0]["metadata"]
    payload = base64.b64decode(meta["base64_encode"])
    assert payload[:3] == b"\xff\xd8\xff" and len(payload) == meta["size"]
    r = parse("pdf_auto/mixed_pdf.pdf", with_attachments="true")
    assert "base64_encode" not in r["attachments"][0]["metadata"]


def test_attachments_dir(tmp_path):
    # attachments_handler.py:15 — payloads land in attachments_dir;
    # temporary_file_name is the on-disk name
    r = parse("with_attachments/with_attachments_0.docx", with_attachments="true",
              attachments_dir=str(tmp_path))
    assert len(r["attachments"]) > 0
    for a in r["attachments"]:
        meta = a["metadata"]
        disk = tmp_path / meta["temporary_file_name"]
        assert disk.is_file()
        assert disk.stat().st_size == meta["size"]


def test_http_api_attachments_passthrough():
    # the POST /upload facade forwards QueryParameters untouched, so the
    # recursive handler works over HTTP (reference dedoc_api.py contract)
    import io
    import json as _json

    from dedoc_ray.api import create_app

    app = create_app(_manager)
    client = app.test_client()
    with open(os.path.join(DATA, "json/with_html.json"), "rb") as fh:
        body = fh.read()
    resp = client.post("/upload", data={
        "file": (io.BytesIO(body), "with_html.json"),
        "with_attachments": "true",
        "html_fields": _json.dumps([["title"], ["body"]]),
    }, content_type="multipart/form-data")
    assert resp.status_code == 200
    parsed = _json.loads(resp.data)
    assert len(parsed["attachments"]) == 2
    assert parsed["attachments"][0]["metadata"]["file_type"] == "text/html"


# ---------------------------------------------------------------- archives
# reference test_api_format_archives.py over the real multi-format fixtures


def test_archives_four_attachments_every_container():
    # :18-45 — the same 4 members through zip/tar/tar.gz/7z/rar
    for arch in ("arch_with_attachs.zip", "arch_with_attachs.tar",
                 "arch_with_attachs.tar.gz", "arch_with_attachs.7z",
                 "arch_with_attachs.rar"):
        r = parse(f"archives/{arch}", with_attachments="true", need_content_analysis="true")
        assert len(r["attachments"]) == 4, arch
        names = set(names_of(r))
        assert names == {"doc_001.txt", "english_doc.pdf", "example.ods", "example.odt"}, arch


def test_archive_with_unsupported_file():
    # :67-73 — 7 members; file.bin surfaces as application/octet-stream
    r = parse("archives/arch_with_unsupport_atchs.zip", with_attachments="true", need_content_analysis="true")
    assert len(r["attachments"]) == 7
    unsupported = [a for a in r["attachments"] if a["metadata"]["file_name"] == "file.bin"][0]
    assert unsupported["metadata"]["file_type"] == "application/octet-stream"


def test_broken_archive_members():
    # :75-82 — broken members degrade to empty documents, never raise
    r = parse("archives/broken.zip", with_attachments="true", need_content_analysis="true")
    assert len(r["attachments"]) == 7
    assert any(n.startswith("english_doc") for n in names_of(r))


def test_archive_subfolders():
    # :51-65 — members inside nested directories are found (4 real files)
    for arch in ("archives/subfolders.zip", "archives/subfolders.tar.gz",
                 "archives/subfolders.7z", "archives/subfolders.rar"):
        r = parse(arch, with_attachments="true", need_content_analysis="true")
        assert len(r["attachments"]) == 4, arch
        assert "english_doc.docx" in names_of(r), arch


def test_oversize_scan_raster_caps_not_hangs():
    # zipka_eng.zip carries 24-megapixel scan JPEGs; the pure-Python codec
    # cap must surface a geometry warning instead of minutes of decode
    import time

    t0 = time.time()
    r = parse("archives/zipka_eng.zip", with_attachments="true", need_content_analysis="true")
    assert time.time() - t0 < 30
    assert len(r["attachments"]) == 4
    jpg = [a for a in r["attachments"] if a["metadata"]["file_name"] == "ZD-odin.jpg"][0]
    assert any("decode cap" in w for w in jpg["warnings"])


# -------------------------------------------------------------- page limit
# reference test_api_format_pdf_page_limit.py over multipage.pdf

_PAGES_LINES = ["Первая страница", "Вторая страница", "Третья страница",
                "Четвёртая страница", "Пятая страница", "Шестая страница",
                "Седьмая страница", "Восьмая страница", "Девятая страница"]


def _page_text(pages):
    r = parse("pdf_with_text_layer/multipage.pdf",
              pdf_with_text_layer="true", pages=pages, is_one_column_document="true")
    tree = r["content"]["structure"]
    return "".join(n["text"] for n in tree["subparagraphs"]).strip(), r


def test_pdf_page_limit_slices():
    # :47-75 — 1-based inclusive slices with open ends
    assert _page_text("")[0] == "\n".join(_PAGES_LINES)
    assert _page_text("1:2")[0] == "\n".join(_PAGES_LINES[0:2])
    assert _page_text("1:1")[0] == _PAGES_LINES[0]
    assert _page_text("2:2")[0] == _PAGES_LINES[1]
    assert _page_text("2:3")[0] == "\n".join(_PAGES_LINES[1:3])
    assert _page_text("5:8")[0] == "\n".join(_PAGES_LINES[4:8])
    assert _page_text("9:")[0] == _PAGES_LINES[8]
    assert _page_text("1:9")[0] == "\n".join(_PAGES_LINES[0:9])


def test_pdf_page_limit_out_of_range():
    # :43-45 — empty/inverted/past-the-end slices → empty text, no error
    for pages in ("0:0", "10:11", "11:", "2:1"):
        text, r = _page_text(pages)
        assert text == "", pages
        assert r["status"] == "ok", pages


def test_pdf_page_limit_partial_warning():
    # :80-85 — a restricting slice surfaces the partial-parse warning and
    # first_page/last_page metadata
    text, r = _page_text("1:2")
    assert "The document is partially parsed" in r["warnings"]
    assert "first_page" in r["metadata"] and "last_page" in r["metadata"]
    _, r = _page_text("")
    assert "The document is partially parsed" not in r["warnings"]


def test_mhtml_image_attachments_only():
    # test_api_format_mhtml.py:5-9 — exactly the 17 image parts attach
    # (css/js parts drop, reference supported_image_types filter)
    r = parse("mhtml/Валентин Николаевич Ничипоренко биография, досье, компромат, "
              "фото и видео - ЗНАЙ ЮА.mhtml", with_attachments="true")
    assert len(r["attachments"]) == 17


def test_mhtml_gz_routes_to_mhtml():
    # test_api_format_mhtml.py:11-16 — .mhtml.gz unwraps and parses as html
    r = parse("mhtml/antivaxxers.mhtml.gz")
    assert "Эрнест Валеев" in r["extracted_text"]


def test_mime_detection_no_or_wrong_extension():
    # test_api_misc_mime_detection.py — every supported format parses with
    # NO extension and with a WRONG extension (magic-first dispatch)
    files = [
        "archives/arch_with_attachs.7z", "archives/arch_with_attachs.tar.gz",
        "archives/arch_with_attachs.zip", "csvs/csv_coma.csv", "csvs/csv_tab.tsv",
        "docx/english_doc.doc", "docx/english_doc.docx", "docx/english_doc.odt",
        "docx/english_doc.rtf", "pdf_with_text_layer/english_doc.pdf",
        "scanned/example.bmp", "scanned/example.gif", "scanned/example.jpg",
        "scanned/example.pcx", "scanned/example.png", "scanned/example.tiff",
        "scanned/example.webp", "htmls/example.html", "xlsx/example.ods",
        "xlsx/example.xls", "xlsx/example.xlsx", "pptx/example.odp",
        "pptx/example.ppt", "pptx/example.pptx", "json/dict.json",
        "txt/football.txt", "eml/message.eml", "xml/simple.xml",
        "mhtml/with_attachments.mhtml",
    ]
    for f in files:
        with open(os.path.join(DATA, f), "rb") as fh:
            data = fh.read()
        wrong = "file.png" if not f.endswith("png") else "file.docx"
        for fake in ("file", wrong):
            r = _manager.parse(data=data, file_name=fake)
            assert r["status"] == "ok", (f, fake, r["error_msg"])


# ----------------------------------------------------------- image refs
# reference test_api_misc_with_images_refs.py — paragraphs that contain
# images carry `attachment` annotations whose value is the attachment uid,
# anchored on the last non-empty paragraph


def _attach_names_by_paragraph(rel):
    r = parse(rel, with_attachments="true", structure_type="linear")
    uid2name = {a["metadata"]["uid"]: a["metadata"]["file_name"] for a in r["attachments"]}
    out = {}
    for i, p in enumerate(r["content"]["structure"]["subparagraphs"]):
        names = sorted(uid2name[a["value"]] for a in p.get("annotations", [])
                       if a["name"] == "attachment" and a["value"] in uid2name)
        if names:
            out[i] = names
    return out


def test_docx_with_images_refs():
    # :11-30
    refs = _attach_names_by_paragraph("with_attachments/docx_with_images.docx")
    assert refs[0] == ["image1.png"]
    assert refs[2] == ["image2.jpeg", "image3.jpeg"]
    assert refs[5] == ["image4.jpeg"]
    assert refs[6] == ["image5.jpeg", "image6.jpeg", "image7.jpeg"]


def test_docx_with_images_from_mac_refs():
    # :48-62
    refs = _attach_names_by_paragraph("with_attachments/doc_with_images.docx")
    assert refs[2] == ["image1.jpeg"]
    assert refs[3] == ["image2.jpeg"]
    assert refs[5] == ["image3.png"]


def test_odt_with_images_refs():
    # :32-46 — picture names follow the document-order image{N} contract of
    # the reference's odt→docx conversion
    refs = _attach_names_by_paragraph("with_attachments/odt_with_images.odt")
    assert refs[0] == ["image1.jpeg"]
    assert refs[7] == ["image2.jpeg"]
    assert refs[8] == ["image3.jpeg"]
