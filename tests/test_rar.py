"""RAR container parsing: real RAR4/RAR5 fixtures + stored roundtrip."""

import os

import pytest

from dedoc_ray.readers.rar import BadRar, rar_encode_stored, rar_list

ARCHIVES = "/root/reference/tests/data/archives"


def test_stored_roundtrip():
    members = [("docs/a.txt", b"hello world"), ("b.bin", bytes(range(64))), ("empty.txt", b"")]
    blob = rar_encode_stored(members)
    got = [(m.name, m.payload) for m in rar_list(blob) if not m.is_dir]
    assert got == members


def test_not_rar_rejected():
    with pytest.raises(BadRar):
        rar_list(b"PK\x03\x04 not a rar")


@pytest.mark.skipif(not os.path.isdir(ARCHIVES), reason="reference fixtures absent")
def test_real_rar4_listing():
    with open(os.path.join(ARCHIVES, "arch_with_attachs.rar"), "rb") as f:
        members = rar_list(f.read())
    files = {m.name.rsplit("/", 1)[-1]: m for m in members if not m.is_dir}
    assert set(files) == {"english_doc.pdf", "doc_001.txt", "example.ods", "example.odt"}
    assert files["doc_001.txt"].size == 82914  # unpacked size from the header
    # compressed members decode natively now (readers/rar_decode.py),
    # crc-verified inside rar_list
    assert all(m.payload is not None and len(m.payload) == m.size for m in files.values())
    assert any(m.is_dir for m in members)  # the directory entry is flagged


@pytest.mark.skipif(not os.path.isdir(ARCHIVES), reason="reference fixtures absent")
def test_real_rar5_stored_member_extracted():
    with open(os.path.join(ARCHIVES, "zipka.rar"), "rb") as f:
        members = rar_list(f.read())
    stored = {m.name: m.payload for m in members if m.payload is not None}
    # the csv member is STORED in this RAR5 archive — byte-identical to
    # the same file inside zipka.zip
    assert stored["zipka/order.csv"] == b"ZD-odin.jpg,0\nZD-dva.jpg,1\n"


@pytest.mark.skipif(not os.path.isdir(ARCHIVES), reason="reference fixtures absent")
def test_real_rar4_subfolders_files_only_through_reader():
    from dedoc_ray.readers.archive import read_archive

    with open(os.path.join(ARCHIVES, "subfolders.rar"), "rb") as f:
        doc = read_archive(f.read())
    names = [a[0].rsplit("/", 1)[-1] for a in doc.attachments]
    assert "books.csv" in names and all("." in n for n in names)


def test_kernel_routes_rar():
    from dedoc_ray.pipeline.kernel import ExtractKernel

    k = ExtractKernel()
    blob = rar_encode_stored([("body.txt", b"alpha beta"), ("meta.txt", b"12345678")])
    row = k.extract_row("corpus.rar", blob)
    assert row["status"] == "ok"
    assert len(row["attachments"]) == 2
    assert sum(a["size"] for a in row["attachments"]) == 10 + 8
