"""Tests: Flask HTTP facade (reference POST /upload contract)."""

from __future__ import annotations

import io
import json

import pytest

flask = pytest.importorskip("flask")


@pytest.fixture(scope="module")
def client():
    from dedoc_ray.api import create_app

    return create_app().test_client()


def test_root_and_version(client):
    assert client.get("/").status_code == 200
    v = client.get("/version")
    assert v.status_code == 200 and v.data


def test_upload_html_json(client):
    html = b"<html><body><h1>Title</h1><p>Hello api.</p></body></html>"
    r = client.post(
        "/upload",
        data={"file": (io.BytesIO(html), "page.html")},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200
    parsed = json.loads(r.data)
    assert parsed["status"] == "ok"
    assert "Hello api." in parsed["extracted_text"]
    assert parsed["file_name"] == "page.html"
    assert "structure" in parsed["content"]


def test_upload_return_format_html_and_plain(client):
    html = b"<html><body><p>Rendered body.</p></body></html>"
    r = client.post(
        "/upload",
        data={"file": (io.BytesIO(html), "p.html"), "return_format": "html"},
        content_type="multipart/form-data",
    )
    assert r.status_code == 200 and r.mimetype == "text/html"
    assert b"Rendered body." in r.data

    r2 = client.post(
        "/upload",
        data={"file": (io.BytesIO(html), "p.html"), "return_format": "plain_text"},
        content_type="multipart/form-data",
    )
    assert r2.status_code == 200 and r2.mimetype == "text/plain"
    assert b"Rendered body." in r2.data


def test_upload_parameters_forwarded(client):
    # structure_type=linear flattens the tree: every node is a root child
    html = b"<html><body><h1>A</h1><p>b</p><p>c</p></body></html>"
    r = client.post(
        "/upload",
        data={"file": (io.BytesIO(html), "p.html"), "structure_type": "linear"},
        content_type="multipart/form-data",
    )
    structure = json.loads(r.data)["content"]["structure"]
    kids = structure["subparagraphs"]
    assert all(not k["subparagraphs"] for k in kids)


def test_upload_no_file_is_422(client):
    # reference dedoc_api contract (test_api_misc_main.test_send_wo_file)
    r = client.post("/upload", data={}, content_type="multipart/form-data")
    assert r.status_code == 422


def test_upload_bad_file_reports_status(client):
    r = client.post(
        "/upload",
        data={"file": (io.BytesIO(b"\x00\x01\x02garbage"), "blob.bin")},
        content_type="multipart/form-data",
    )
    # reference: unsupported format -> 415 (test_api_misc_main.test_bin_file)
    assert r.status_code == 415
    body = json.loads(r.data)
    assert body["file_name"] == "blob.bin"
    assert "dedoc_version" in body
