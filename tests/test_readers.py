"""txt / csv / json / pdf kernels + format sniffing."""

import gzip

from dedoc_ray.readers.csv_reader import read_csv
from dedoc_ray.readers.json_reader import read_json
from dedoc_ray.readers.pdf import read_pdf_textlayer
from dedoc_ray.readers.sniff import sniff_format
from dedoc_ray.readers.txt import read_txt
from dedoc_ray.sources.synth import _pdf_bytes


class TestTxt:
    def test_lines_and_uids(self):
        doc = read_txt(b"first line\nsecond line\n")
        assert [ln.line for ln in doc.lines] == ["first line\n", "second line\n"]
        assert doc.lines[0].uid.startswith("txt_")
        assert doc.lines[0].uid != doc.lines[1].uid

    def test_gzip_payload(self):
        doc = read_txt(gzip.compress(b"packed\ntext"))
        assert [ln.line for ln in doc.lines] == ["packed\n", "text"]

    def test_nfc_i_kratkoe_recompose(self):
        # "й" written as decomposed и + combining breve must recompose
        decomposed = "йод\n".encode("utf-8")
        doc = read_txt(decomposed)
        assert doc.lines[0].line == "йод\n"

    def test_spacing_annotation_values(self):
        doc = read_txt(b"a\n\n\nb\n")
        spacing = {i: next(a.value for a in ln.annotations if a.name == "spacing") for i, ln in enumerate(doc.lines)}
        # first line: 50 (no empties before); "b" after two empty lines: 200
        assert spacing[0] == "50"
        assert spacing[3] == "200"

    def test_indentation_annotation(self):
        doc = read_txt(b"\tindented\n")
        indent = next(a.value for a in doc.lines[0].annotations if a.name == "indentation")
        assert indent == str(211 * 3)

    def test_paragraph_detection_by_indent(self):
        doc = read_txt(b"start\n    deep paragraph\n")
        flags = [ln.metadata.tag_hierarchy_level.can_be_multiline for ln in doc.lines]
        assert flags == [True, False]


class TestCsv:
    def test_comma_grid(self):
        doc = read_csv(b"a,b,c\n1,2,3\n")
        grid = [[c.get_text() for c in row] for row in doc.tables[0].cells]
        assert grid == [["a", "b", "c"], ["1", "2", "3"]]

    def test_tab_autodetect(self):
        doc = read_csv(b"x\ty\n1\t2\n")
        grid = [[c.get_text() for c in row] for row in doc.tables[0].cells]
        assert grid == [["x", "y"], ["1", "2"]]


class TestJson:
    def test_dict_sorted_keys_then_values(self):
        doc = read_json(b'{"b": "two", "a": "one"}')
        assert [(ln.line, ln.metadata.tag_hierarchy_level.line_type) for ln in doc.lines] == [
            ("a", "key"),
            ("one", "raw_text"),
            ("b", "key"),
            ("two", "raw_text"),
        ]

    def test_list_items(self):
        doc = read_json(b'["x", "y"]')
        assert [(ln.line, ln.metadata.tag_hierarchy_level.line_type) for ln in doc.lines] == [
            ("x", "list_item"),
            ("y", "list_item"),
        ]

    def test_depth_levels(self):
        doc = read_json(b'{"k": {"inner": "v"}}')
        levels = [(ln.line, ln.metadata.tag_hierarchy_level.level_1) for ln in doc.lines]
        assert levels == [("k", 1), ("inner", 2), ("v", 3)]

    def test_invalid_json_raises(self):
        import pytest

        from dedoc_ray.readers.json_reader import BadFileError

        with pytest.raises(BadFileError):
            read_json(b"{nope")


class TestPdf:
    def test_lines_sorted_by_y(self):
        pdf = _pdf_bytes(3, "alpha the beta the gamma")
        doc = read_pdf_textlayer(pdf)
        assert [ln.line for ln in doc.lines] == ["alpha\n", "beta\n", "gamma\n"]

    def test_size_annotation(self):
        pdf = _pdf_bytes(0, "only line here")
        doc = read_pdf_textlayer(pdf)
        sizes = [a.value for a in doc.lines[0].annotations if a.name == "size"]
        assert sizes == ["12.0"]

    def test_no_text_layer_raises(self):
        import pytest

        with pytest.raises(ValueError):
            read_pdf_textlayer(b"%PDF-1.4\nno streams here\n%%EOF")


class TestSniff:
    def test_extension_first(self):
        assert sniff_format("https://x/y/1.txt", b"<html>") == "txt"
        assert sniff_format("https://x/y/1.html", b"whatever") == "html"
        assert sniff_format("https://x/y/1.json", b"") == "json"
        assert sniff_format("https://x/y/1.pdf", b"") == "pdf"

    def test_content_magic(self):
        assert sniff_format("https://x/n", b"%PDF-1.4 ...") == "pdf"
        assert sniff_format("https://x/n", b"\x1f\x8b\x08rest") == "txt"
        assert sniff_format("https://x/n", b"<!DOCTYPE html><html>") == "html"
        assert sniff_format("https://x/n", b'{"k": 1}') == "json"
        assert sniff_format("https://x/n", b"plain words here") == "txt"
        assert sniff_format("https://x/n", b"\xff\xfe\xfa\x01\x02") == "bad_file"


def test_txt_bz2_and_xz_payloads():
    import bz2
    import lzma

    from dedoc_ray.readers.sniff import sniff_format
    from dedoc_ray.readers.txt import read_txt

    raw = "alpha\nbeta\n".encode("utf-8")
    for blob in (bz2.compress(raw), lzma.compress(raw)):
        assert sniff_format("", blob) == "txt"
        doc = read_txt(blob)
        assert [ln.line for ln in doc.lines] == ["alpha\n", "beta\n"]


def test_tar_bz2_and_xz_archives():
    import io
    import tarfile

    from dedoc_ray.readers.archive import read_archive
    from dedoc_ray.readers.sniff import sniff_format

    for comp, ext in (("bz2", ".tar.bz2"), ("xz", ".tar.xz")):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode=f"w:{comp}") as tf:
            payload = b"member body"
            info = tarfile.TarInfo("a.txt")
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
        data = buf.getvalue()
        assert sniff_format(f"https://x.test/f{ext}", b"") == "archive"
        doc = read_archive(data)
        assert doc.attachments[0][:2] == ("a.txt", 11)
