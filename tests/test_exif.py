"""EXIF metadata extraction (reference ImageMetadataExtractor,
image_metadata_extractor.py:28-118) — native TIFF/APP1 walk, prettified
typed fields, golden-pinned on the reference's own JPEG fixtures."""

import os

from dedoc_ray.readers.exif import extract_exif, _parse_exif_date

REF = "/root/reference/tests/data"


def _load(rel):
    with open(os.path.join(REF, rel), "rb") as f:
        return f.read()


def test_exif_invoice_fields():
    # ACDSee-written EXIF: IFD0 strings/ints + Exif-IFD pixel dims
    md = extract_exif(_load("tables/invoice.jpg"))
    assert md["software"] == "ACDSee Ultimate 2019"
    assert md["orientation"] == 1
    assert md["resolution_unit"] == 2
    assert md["exif_image_width"] == 774
    assert md["exif_image_height"] == 1024
    # 2019:03:24 13:36:51 (naive → UTC)
    assert md["date_time"] == 1553434611


def test_exif_orientation_camera():
    md = extract_exif(_load("scanned/scan_orient_1.jpg"))
    assert md["orientation"] == 6  # 90-degree rotated capture
    assert md["software"] == "Shotwell 0.28.4"
    assert md["exif_image_width"] == 1128
    assert md["exif_image_height"] == 898


def test_exif_gimp_date():
    md = extract_exif(_load("tz/small_image.jpg"))
    assert md["software"] == "GIMP 2.10.18"
    assert md["date_time"] == 1637328831  # 2021:11:19 13:33:51


def test_exif_absent_and_garbage():
    assert extract_exif(b"not an image at all") == {}
    assert extract_exif(b"\xff\xd8\xff\xe0JFIF\x00" + b"\x00" * 64) == {}
    # truncated TIFF header must not raise
    assert extract_exif(b"II*\x00\x08\x00") == {}


def test_exif_date_forms():
    assert _parse_exif_date("2019:03:24 13:36:51") == 1553434611
    # the reference collapses ': ' → ':' before parsing
    assert _parse_exif_date("2019: 03: 24 13: 36: 51") == 1553434611
    assert _parse_exif_date("not a date") is None


def test_scan_metadata_carries_exif():
    # read_scan merges EXIF fields into the document metadata alongside
    # the decode-derived dims (reference ImageMetadataExtractor runs above
    # the readers for every image-like file)
    from dedoc_ray.readers.scan_ocr import read_scan

    doc = read_scan(_load("tz/small_image.jpg"))
    assert doc.metadata.get("software") == "GIMP 2.10.18"
    assert doc.metadata.get("date_time") == 1637328831
    # decode-derived geometry is still there
    assert doc.metadata.get("exif_image_width")


def test_multipage_tiff_roundtrip_and_scan():
    # chained-IFD TIFF: encode/decode all pages, and the scan route walks
    # the chain emitting per-page lines (page_id increments, multi-page
    # warning, first-page dims in metadata)
    import numpy as np

    from dedoc_ray.ops.media_codecs import tiff_decode, tiff_decode_pages, tiff_encode_pages
    from dedoc_ray.readers.scan_ocr import read_scan
    from dedoc_ray.sources.scan_writer import render_page

    a = (np.arange(21 * 30, dtype=np.uint8).reshape(21, 30) % 250)
    b = (np.arange(24 * 31, dtype=np.uint8).reshape(24, 31) % 250)[::-1]
    enc = tiff_encode_pages([a, b])
    pages = tiff_decode_pages(enc)
    assert len(pages) == 2
    assert (pages[0] == a).all() and (pages[1] == b).all()
    # single-page API stays first-page compatible
    assert (tiff_decode(enc) == a).all()

    p1 = render_page([("Document 7", True), ("alpha beta gamma", False)])
    p2 = render_page([("second page here", False), ("delta epsilon", False)])
    doc = read_scan(tiff_encode_pages([p1, p2]))
    texts = [(L.metadata.page_id, L.line.rstrip("\n")) for L in doc.lines]
    assert texts == [
        (0, "Document 7"), (0, "alpha beta gamma"),
        (1, "second page here"), (1, "delta epsilon"),
    ]
    assert any("2 pages" in w for w in doc.warnings)
    assert doc.metadata["exif_image_width"]
