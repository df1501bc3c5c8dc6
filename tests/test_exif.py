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
