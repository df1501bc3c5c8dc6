"""Type0/CID PDF depth: CMap parse, hex strings, TJ kerning, ObjStm."""

import zlib

from dedoc_ray.readers.pdf import (
    _decode_cids,
    _expand_objstm,
    _font_cmaps,
    _parse_cmap,
    _tj_text,
    read_pdf_textlayer,
)
from dedoc_ray.sources.synth_office import pdf_cid_bytes


def test_parse_cmap_bfchar_and_both_bfrange_forms():
    cmap = b"""
2 beginbfchar
<0041> <0061>
<0042> <00660069>
endbfchar
1 beginbfrange
<0050> <0052> <0030>
endbfrange
1 beginbfrange
<0060> <0061> [<0058> <0059>]
endbfrange
"""
    t = _parse_cmap(cmap)
    assert t[0x41] == "a"
    assert t[0x42] == "fi"  # multi-char destination (ligature)
    assert t[0x50] == "0" and t[0x52] == "2"
    assert t[0x60] == "X" and t[0x61] == "Y"


def test_decode_cids_unmapped_degrades():
    assert _decode_cids(b"\x00\x41\x99\x99", {0x41: "a"}) == "a\N{REPLACEMENT CHARACTER}"


def test_tj_kern_inserts_word_gap():
    cmaps = {}
    arr = b"[(Hello) -250 (world) -20 (!)]"
    assert _tj_text(arr, "F1", cmaps) == "Hello world!"
    # small kerns (tracking adjustments) never become spaces
    assert _tj_text(b"[(a) -119 (b)]", "F1", cmaps) == "ab"
    assert _tj_text(b"[(a) -121 (b)]", "F1", cmaps) == "a b"


def test_hex_string_without_cmap_is_latin1():
    assert _tj_text(b"[<48656C6C6F>]", "F1", {}) == "Hello"


def test_expand_objstm_roundtrip():
    payload = b"9 0 << /Type /Page /Rotate 90 >>"
    stm = zlib.compress(payload)
    data = (b"7 0 obj << /Type /ObjStm /N 1 /First 4 /Length "
            + str(len(stm)).encode() + b" /Filter /FlateDecode >> stream\n"
            + stm + b"\nendstream endobj")
    out = _expand_objstm(data)
    assert b"9 0 obj" in out and b"/Rotate 90" in out


def test_font_cmaps_resolution():
    data = pdf_cid_bytes(3, "alpha the beta gamma")
    cmaps = _font_cmaps(data + _expand_objstm(data))
    assert "F1" in cmaps
    assert cmaps["F1"][ord("a") + 0x100] == "a"
    assert cmaps["F1"][ord(" ") + 0x100] == " "


def test_cid_document_end_to_end():
    doc = read_pdf_textlayer(pdf_cid_bytes(11, "alpha beta the gamma delta the eps"))
    text = "".join(line.line for line in doc.lines)
    assert text == "alpha beta\ngamma delta\neps\n"
