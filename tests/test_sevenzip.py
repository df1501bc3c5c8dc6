"""Native 7z container (readers/sevenzip.py) — codec/layout matrix, header
CRC verification, empty-stream bitfields, unsupported-coder scope, and the
archive-kernel integration."""

import struct

import pytest

from dedoc_ray.readers.sevenzip import Bad7z, read_num, sevenzip_decode, sevenzip_encode, write_num

MEMBERS = [
    ("a.txt", b"hello world " * 100),
    ("dir/b.bin", bytes(range(256)) * 7),
    ("empty.txt", b""),
    ("c.txt", b"x"),
]


def test_number_encoding_roundtrip():
    for n in (0, 1, 0x7F, 0x80, 0xFF, 0x1234, 2**32, 2**63, 2**64 - 1):
        got, pos = read_num(write_num(n), 0)
        assert got == n and pos == len(write_num(n))


@pytest.mark.parametrize("codec", ["copy", "lzma1", "lzma2"])
@pytest.mark.parametrize("solid", [True, False])
@pytest.mark.parametrize("encoded_header", [True, False])
def test_roundtrip_matrix(codec, solid, encoded_header):
    data = sevenzip_encode(MEMBERS, codec=codec, solid=solid, encoded_header=encoded_header)
    assert sevenzip_decode(data) == MEMBERS


def test_unicode_names_and_empty_archive():
    members = [("папка/файл.txt", "текст".encode("utf-8")), ("日本語.bin", b"\x00\x01")]
    assert sevenzip_decode(sevenzip_encode(members)) == members
    assert sevenzip_decode(sevenzip_encode([])) == []
    all_empty = [("e1", b""), ("e2", b"")]
    assert sevenzip_decode(sevenzip_encode(all_empty)) == all_empty


def test_crc_checks_catch_corruption():
    data = bytearray(sevenzip_encode(MEMBERS, codec="copy"))
    data[-1] ^= 0xFF  # header tail byte
    with pytest.raises(Bad7z):
        sevenzip_decode(bytes(data))
    data = bytearray(sevenzip_encode(MEMBERS))
    data[13] ^= 0xFF  # start-header field under the start CRC
    with pytest.raises(Bad7z):
        sevenzip_decode(bytes(data))
    with pytest.raises(Bad7z):
        sevenzip_decode(b"not7z" + bytes(40))


def test_unsupported_coder_rejected():
    data = bytearray(sevenzip_encode([("f", b"payload")], codec="copy", solid=False))
    # the Copy coder id 0x00 sits in the plain header; swap it for BCJ x86
    # (0x03030103 is 4 bytes — instead patch id to 0x04 keeping size 1)
    idx = data.rindex(b"\x01\x01\x00\x0c")  # numCoders=1, flag=1 (idsize1), id=00, kUnpackSizes
    data[idx + 2] = 0x04
    # re-seal both CRCs so the parse reaches the coder dispatch
    import zlib

    nh_off, nh_size = struct.unpack("<QQ", data[12:28])
    hdr = bytes(data[32 + nh_off : 32 + nh_off + nh_size])
    data[28:32] = struct.pack("<I", zlib.crc32(hdr))
    data[8:12] = struct.pack("<I", zlib.crc32(bytes(data[12:32])))
    with pytest.raises(Bad7z, match="unsupported 7z coder"):
        sevenzip_decode(bytes(data))


def test_archive_kernel_integration():
    from dedoc_ray.readers.archive import read_archive

    doc = read_archive(sevenzip_encode(MEMBERS, codec="lzma2"))
    assert [(a[0], a[1]) for a in doc.attachments] == [(n, len(p)) for n, p in MEMBERS]
    assert doc.warnings[0] == "archive with 4 members"


def test_sniff_routes_7z():
    from dedoc_ray.readers.sniff import sniff_format

    data = sevenzip_encode(MEMBERS)
    assert sniff_format("https://x.test/a.7z", b"") == "archive"
    assert sniff_format("", data) == "archive"
