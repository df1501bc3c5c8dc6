"""Tests: DedocRayManager single-document facade."""

from __future__ import annotations

import pytest


def _manager():
    from dedoc_ray.manager import DedocRayManager

    return DedocRayManager()


def test_parse_html_bytes_tree_content():
    out = _manager().parse(
        data=b"<html><body><h1>Title</h1><p>Hello world.</p></body></html>",
        file_name="page.html",
    )
    assert out["status"] == "ok"
    assert "Title" in out["extracted_text"] and "Hello world." in out["extracted_text"]
    structure = out["content"]["structure"]
    texts = [structure["text"]] + [s["text"] for s in structure["subparagraphs"]]
    assert any("Title" in t for t in texts)


def test_parse_file_path_and_missing_path(tmp_path):
    p = tmp_path / "doc.txt"
    p.write_text("plain text line one\n")
    out = _manager().parse(file_path=str(p))
    assert out["status"] == "ok" and "plain text line one" in out["extracted_text"]
    assert out["file_name"] == "doc.txt"
    with pytest.raises(FileNotFoundError):
        _manager().parse(file_path=str(tmp_path / "absent.txt"))


def test_parse_bad_file_returns_error_status_not_raise():
    out = _manager().parse(data=b"\x00\x01\x02\x03\xff\xfe", file_name="blob.bin")
    assert out["status"] == "bad_file"
    assert out["error_msg"]


def test_string_parameters_coerced():
    from dedoc_ray.manager import config_from_params

    cfg = config_from_params(
        {
            "handle_invisible_table": "true",
            "return_format": "plain_text",
            "recursion_deep_attachments": "3",
            "unknown_knob": "whatever",
        }
    )
    assert cfg.handle_invisible_table is True
    assert cfg.return_format == "plain_text"
    assert cfg.recursion_deep_attachments == 3


def test_return_format_html_and_plain_text():
    data = b"<html><body><p>alpha</p><p>beta</p></body></html>"
    html = _manager().parse(data=data, file_name="a.html", parameters={"return_format": "html"})
    assert isinstance(html["content"], str) and "alpha" in html["content"]
    txt = _manager().parse(
        data=data, file_name="a.html", parameters={"return_format": "plain_text"}
    )
    assert isinstance(txt["content"], str) and "beta" in txt["content"]


def test_kernel_reused_across_parses():
    m = _manager()
    m.parse(data=b"<p>one</p>", file_name="x.html")
    m.parse(data=b"<p>two</p>", file_name="y.html")
    assert len(m._kernel_cache) == 1
