"""Native ODT / RTF reader tests."""

import pytest

from dedoc_ray.readers.odt import read_odt
from dedoc_ray.readers.rtf import BadRtfFile, read_rtf
from dedoc_ray.sources.synth_office import ODT_LIST_TEXT, _zip_bytes, odt_bytes, rtf_bytes


def test_odt_roundtrip_byte_exact():
    doc = read_odt(odt_bytes(4, "a the b the c"))
    text = "".join(l.line for l in doc.lines)
    assert text == "Document 4\na\nb\nc\n" + ODT_LIST_TEXT
    hl = doc.lines[0].metadata.tag_hierarchy_level
    assert (hl.level_1, hl.level_2, hl.line_type) == (1, 1, "header")
    assert doc.lines[-1].metadata.tag_hierarchy_level.line_type == "list_item"


def test_odt_metadata():
    doc = read_odt(odt_bytes(9, "x"))
    assert doc.metadata["title"] == "Document 9"
    assert doc.metadata["author"] == "synth-author-4"


def test_odt_table_and_spans():
    ns = ('xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
          'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
          'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"')
    content = (f'<?xml version="1.0"?><office:document-content {ns}><office:body><office:text>'
               '<text:p>before<text:tab/>tabbed<text:line-break/>broken<text:s text:c="3"/>spaced</text:p>'
               '<table:table><table:table-row>'
               '<table:table-cell table:number-columns-spanned="2"><text:p>wide</text:p></table:table-cell>'
               '<table:table-cell><text:p>x</text:p></table:table-cell>'
               '</table:table-row></table:table>'
               '</office:text></office:body></office:document-content>')
    doc = read_odt(_zip_bytes([("content.xml", content)]))
    assert doc.lines[0].line == "before\ttabbed\nbroken   spaced\n"
    [t] = doc.tables
    assert [c.colspan for c in t.cells[0]] == [2, 2, 1]
    assert t.cells[0][1].invisible


def test_rtf_roundtrip():
    doc = read_rtf(rtf_bytes(4, "a the b"))
    assert "".join(l.line for l in doc.lines) == "Document 4\na\nb\n"


def test_rtf_skips_destinations_and_decodes_unicode():
    rtf = (b"{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}{\\info{\\author nobody}}"
           b"Hello \\u1084?\\u1080?\\u1088?\\par next {\\pict deadbeef} line}")
    doc = read_rtf(rtf)
    text = "".join(l.line for l in doc.lines)
    assert "Hello мир" in text
    assert "Arial" not in text and "nobody" not in text and "deadbeef" not in text
    assert "next  line" in text or "next line" in text


def test_rtf_hex_escapes_cp1251():
    doc = read_rtf(b"{\\rtf1\\ansi\\ansicpg1251 \\'ef\\'f0\\'e8\\'e2\\'e5\\'f2}")
    assert "".join(l.line for l in doc.lines) == "привет\n"


def test_rtf_rejects_non_rtf():
    with pytest.raises(BadRtfFile):
        read_rtf(b"plain text, no rtf magic")


def test_kernel_routes_odt_rtf():
    from dedoc_ray.pipeline.kernel import ExtractKernel

    k = ExtractKernel()
    r1 = k.extract_row("https://x.test/a.odt", odt_bytes(1, "x"))
    assert r1["format"] == "odt" and r1["status"] == "ok"
    r2 = k.extract_row("https://x.test/a.rtf", rtf_bytes(1, "x"))
    assert r2["format"] == "rtf" and r2["status"] == "ok"


# ------------------------------------------------------------- ODS / ODP


def test_read_ods_grid_and_filler_trim():
    from dedoc_ray.readers.odt import read_ods
    from dedoc_ray.sources.synth_office import ods_bytes

    doc = read_ods(ods_bytes(7, "alpha the beta"))
    assert len(doc.tables) == 1
    grid = doc.tables[0].cells
    assert [[c.lines[0].line for c in row] for row in grid] == [
        ["70.0", "71.0", "72.0"], ["73.0", "74.0", "75.0"],
    ]


def test_read_ods_repeated_rows_and_covered_cells():
    from dedoc_ray.readers.odt import read_ods
    from dedoc_ray.sources.synth_office import _zip_bytes

    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:spreadsheet><table:table>"
        '<table:table-row table:number-rows-repeated="2">'
        '<table:table-cell table:number-columns-repeated="2"><text:p>x</text:p></table:table-cell>'
        "</table:table-row>"
        "<table:table-row>"
        '<table:table-cell table:number-columns-spanned="2"><text:p>wide</text:p></table:table-cell>'
        "<table:covered-table-cell/>"
        "</table:table-row>"
        "</table:table></office:spreadsheet></office:body></office:document-content>"
    )
    doc = read_ods(_zip_bytes([("content.xml", content)]))
    grid = doc.tables[0].cells
    assert len(grid) == 3
    assert [c.lines[0].line for c in grid[0]] == ["x", "x"]
    assert grid[2][0].lines[0].line == "wide" and grid[2][0].colspan == 2


def test_read_odp_title_and_frames():
    from dedoc_ray.core.hierarchy import HierarchyLevel
    from dedoc_ray.readers.odt import read_odp
    from dedoc_ray.sources.synth_office import odp_bytes

    doc = read_odp(odp_bytes(3, "alpha the beta the gamma"))
    texts = [ln.line for ln in doc.lines]
    assert texts == ["Slide 3\n", "alpha\n", "beta\n", "gamma\n"]
    assert doc.lines[0].metadata.tag_hierarchy_level.line_type == HierarchyLevel.header
    assert doc.lines[1].metadata.tag_hierarchy_level.line_type != HierarchyLevel.header


def test_sniff_splits_opendocument_family():
    from dedoc_ray.readers.sniff import sniff_format
    from dedoc_ray.sources.synth_office import odp_bytes, ods_bytes, odt_bytes

    assert sniff_format("", odt_bytes(1, "a the b")) == "odt"
    assert sniff_format("", ods_bytes(1, "a the b")) == "ods"
    assert sniff_format("", odp_bytes(1, "a the b")) == "odp"
    assert sniff_format("https://x.test/f.ods", b"") == "ods"
    assert sniff_format("https://x.test/f.odp", b"") == "odp"


def test_read_ods_midrow_empty_run_preserves_positions():
    # ADVICE r2: 'A, 10 empty, B' must keep B at column 11; repeated blank
    # rows mid-grid must survive as empty rows (soffice→xlsx grid semantics)
    from dedoc_ray.readers.odt import read_ods
    from dedoc_ray.sources.synth_office import _zip_bytes

    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
        'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
        'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:spreadsheet><table:table>"
        "<table:table-row>"
        "<table:table-cell><text:p>A</text:p></table:table-cell>"
        '<table:table-cell table:number-columns-repeated="10"/>'
        "<table:table-cell><text:p>B</text:p></table:table-cell>"
        '<table:table-cell table:number-columns-repeated="16372"/>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="3"/>'
        "<table:table-row>"
        "<table:table-cell><text:p>C</text:p></table:table-cell>"
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="1048000"/>'
        "</table:table></office:spreadsheet></office:body></office:document-content>"
    )
    doc = read_ods(_zip_bytes([("content.xml", content)]))
    grid = doc.tables[0].cells
    texts = [[(c.lines[0].line if c.lines else "") for c in row] for row in grid]
    assert len(grid) == 5  # row1 + 3 blank + C-row; the 1M trailing filler dropped
    assert texts[0][0] == "A" and texts[0][11] == "B" and len(texts[0]) == 12
    assert texts[1] == texts[2] == texts[3] == [""] * 12
    assert texts[4][0] == "C"


def test_sevenzip_empty_file_vs_directory():
    # ADVICE r2: empty-stream entries with the kEmptyFile bit CLEAR are
    # directories and must be skipped; with the bit SET they are 0-byte files
    from dedoc_ray.readers.sevenzip import (
        K_EMPTY_FILE, sevenzip_decode, sevenzip_encode,
    )

    members = [("a.txt", b"hello"), ("zero.txt", b""), ("b.txt", b"world")]
    blob = sevenzip_encode(members, encoded_header=False)
    assert sevenzip_decode(blob) == members  # writer marks kEmptyFile now

    # flip the kEmptyFile bit off -> 'zero.txt' becomes a directory entry
    idx = blob.rindex(bytes([K_EMPTY_FILE]))
    patched = bytearray(blob)
    assert patched[idx + 1] == 1  # one-byte bitfield follows
    patched[idx + 2] = 0x00       # clear the bit
    import struct, zlib
    # re-stamp the next-header CRC in the start header
    body_len, hdr_len = struct.unpack("<QQ", patched[12:28])
    hdr_off = 32 + body_len
    patched[28:32] = struct.pack("<I", zlib.crc32(bytes(patched[hdr_off:hdr_off + hdr_len])))
    patched[8:12] = struct.pack("<I", zlib.crc32(bytes(patched[12:32])))
    assert sevenzip_decode(bytes(patched)) == [("a.txt", b"hello"), ("b.txt", b"world")]
