"""Tests: CFB container + legacy .doc/.xls/.ppt readers."""

from __future__ import annotations

import struct

import pytest

from dedoc_ray.readers.cfb import CfbFile, sniff_cfb_kind
from dedoc_ray.readers.legacy_office import (
    BadLegacyFile,
    _decode_rk,
    read_doc,
    read_ppt,
    read_xls,
)
from dedoc_ray.sources.cfb_writer import (
    build_cfb,
    doc_bytes,
    ppt_bytes,
    summary_info_bytes,
    xls_bytes,
)

TEXT = "key agg the row scan the table value part"


# ------------------------------------------------------------- container


def test_cfb_roundtrip_mini_and_big_streams():
    small = b"tiny payload"
    big = bytes(range(256)) * 40  # 10240 B > 4096 cutoff
    blob = build_cfb([("Small", small), ("BigStream", big)])
    cfb = CfbFile(blob)
    assert set(cfb.streams()) == {"Small", "BigStream"}
    assert cfb.stream("Small") == small
    assert cfb.stream("BigStream") == big
    assert cfb.stream("Missing") is None


def test_cfb_deterministic():
    assert doc_bytes(3, TEXT) == doc_bytes(3, TEXT)
    assert xls_bytes(3, TEXT) == xls_bytes(3, TEXT)
    assert ppt_bytes(3, TEXT) == ppt_bytes(3, TEXT)


def test_sniff_cfb_kind():
    assert sniff_cfb_kind(doc_bytes(1, TEXT)) == "doc"
    assert sniff_cfb_kind(xls_bytes(1, TEXT)) == "xls"
    assert sniff_cfb_kind(ppt_bytes(1, TEXT)) == "ppt"
    assert sniff_cfb_kind(b"\x00" * 600) is None


def test_sniff_format_ext_and_magic():
    from dedoc_ray.readers.sniff import sniff_format

    payload = doc_bytes(2, TEXT)
    assert sniff_format("https://x/2.doc", payload) == "doc"
    # no extension → magic fallback through the CFB directory
    assert sniff_format("https://x/2", payload) == "doc"
    assert sniff_format("https://x/2", xls_bytes(2, TEXT)) == "xls"
    assert sniff_format("https://x/2", ppt_bytes(2, TEXT)) == "ppt"


def test_summary_information_metadata():
    blob = build_cfb([("\x05SummaryInformation", summary_info_bytes(12))])
    from dedoc_ray.readers.cfb import read_summary_info

    meta = read_summary_info(CfbFile(blob))
    assert meta["title"] == "Document 12"
    assert meta["author"] == "synth-author-2"
    assert meta["created"] == "2024-01-01T00:00:00Z"
    assert meta["modified"] == "2024-01-02T00:00:00Z"


# ------------------------------------------------------------------ .doc


def test_doc_roundtrip():
    doc = read_doc(doc_bytes(7, TEXT))
    assert [l.line for l in doc.lines] == [
        "Document 7\n",
        "key agg\n",
        "row scan\n",
        "table value part\n",
    ]
    assert doc.lines[0].metadata.tag_hierarchy_level.line_type == "header"
    assert doc.metadata["title"] == "Document 7"


def test_doc_compressed_piece():
    """cp1252 (fCompressed) pieces — the path the synth writer doesn't use."""
    body = "Hello\rWorld\r"
    raw = body.encode("cp1252")
    fib = bytearray(1024)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 2, 0x00C1)
    text_off = 1024
    # fCompressed: bit30 set, fc = 2 * byte offset
    fc_raw = (text_off * 2) | 0x40000000
    plc = struct.pack("<II", 0, len(body)) + struct.pack("<HIH", 0, fc_raw, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", fib, 0x01A2, 0)
    struct.pack_into("<I", fib, 0x01A6, len(clx))
    blob = build_cfb([("WordDocument", bytes(fib) + raw), ("0Table", clx)])
    doc = read_doc(blob)
    assert [l.line for l in doc.lines] == ["Hello\n", "World\n"]


def test_doc_big_stream():
    """A document long enough that WordDocument exceeds the mini cutoff."""
    long_text = " the ".join(f"w{i}" for i in range(2000))
    doc = read_doc(doc_bytes(1, long_text))
    assert len(doc.lines) == 2001
    assert doc.lines[1].line == "w0\n"
    assert doc.lines[-1].line == "w1999\n"


def test_doc_bad_file():
    with pytest.raises(BadLegacyFile):
        read_doc(b"not a cfb at all" * 40)
    with pytest.raises(BadLegacyFile):
        read_doc(build_cfb([("SomethingElse", b"x" * 100)]))


# ------------------------------------------------------------------ .xls


def test_xls_roundtrip_grid():
    doc = read_xls(xls_bytes(7, TEXT))
    grid = [[c.get_text() for c in row] for row in doc.tables[0].cells]
    assert grid == [["70.0", "71.0", "72.0"], ["73.0", "74.0", "75.0"]]  # xlrd-parity floats
    assert doc.metadata["author"] == "synth-author-2"


def test_xls_rk_and_labelsst():
    """RK + SST/LABELSST + inline LABEL records (paths the synth writer
    doesn't emit)."""
    from dedoc_ray.sources.cfb_writer import _biff

    def bof(dt):
        return _biff(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0))

    # SST with one compressed and one utf16 string
    s1, s2 = b"abc", "déf".encode("utf-16-le")
    sst = struct.pack("<II", 2, 2)
    sst += struct.pack("<HB", 3, 0) + s1
    sst += struct.pack("<HB", 3, 1) + s2
    recs = [bof(0x0005), _biff(0x00FC, sst), _biff(0x000A, b"")]
    recs.append(bof(0x0010))
    # RK int (val 100 shifted) + RK double/100 + LABELSST + inline LABEL
    rk_int = (100 << 2) | 2
    recs.append(_biff(0x027E, struct.pack("<HHHI", 0, 0, 0, rk_int)))
    recs.append(_biff(0x00FD, struct.pack("<HHHI", 0, 1, 0, 0)))
    recs.append(_biff(0x00FD, struct.pack("<HHHI", 0, 2, 0, 1)))
    recs.append(_biff(0x0204, struct.pack("<HHHHB", 1, 0, 0, 2, 0) + b"hi"))
    recs.append(_biff(0x000A, b""))
    blob = build_cfb([("Workbook", b"".join(recs))])
    doc = read_xls(blob)
    grid = [[c.get_text() for c in row] for row in doc.tables[0].cells]
    assert grid == [["100.0", "abc", "déf"], ["hi", "", ""]]


def test_decode_rk():
    assert _decode_rk((100 << 2) | 2) == "100.0"
    assert _decode_rk(((-5) << 2 & 0xFFFFFFFF) | 2) == "-5.0"
    # 1.5 as top-30-bits double
    packed = struct.unpack("<Q", struct.pack("<d", 1.5))[0]
    assert _decode_rk((packed >> 32) & 0xFFFFFFFC) == "1.5"


# ------------------------------------------------------------------ .ppt


def test_ppt_roundtrip():
    doc = read_ppt(ppt_bytes(7, TEXT))
    assert [l.line for l in doc.lines] == [
        "Slide 7\n",
        "key agg\n",
        "row scan\n",
        "table value part\n",
    ]
    assert doc.lines[0].metadata.tag_hierarchy_level.line_type == "header"


def test_ppt_bytes_atom():
    """TextBytesAtom (cp1252) path."""
    from dedoc_ray.sources.cfb_writer import _ppt_rec

    atoms = _ppt_rec(0x0000, 0x0FA8, b"plain bytes")
    blob = build_cfb([("PowerPoint Document", _ppt_rec(0x000F, 0x03E8, atoms))])
    doc = read_ppt(blob)
    assert [l.line for l in doc.lines] == ["plain bytes\n"]


# ------------------------------------------------------------- pipeline


def test_legacy_formats_through_kernel(ray_session):
    """E2E: synth corpora for doc/xls/ppt through the extraction pipeline."""
    from dedoc_ray.pipeline.extract import extract_pages
    from dedoc_ray.sources.synth_office import office_corpus

    sf = "/root/testdata/sf0.001"
    for fmt in ("doc", "ppt"):
        out = extract_pages(office_corpus(sf, fmt), concurrency=2).take(5)
        assert all(r["status"] == "ok" for r in out)
        head = "Document" if fmt == "doc" else "Slide"
        assert all(r["extracted_text"].startswith(head) for r in out)
    out = extract_pages(office_corpus(sf, "xls"), concurrency=2).take(5)
    assert all(r["status"] == "ok" and r["n_tables"] == 1 for r in out)
