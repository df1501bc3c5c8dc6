"""Round-2 QueryParameters knobs: pdf routing, html_fields, nested archives,
one-column forcing, return_format validation."""

import io
import zipfile

import pytest

from dedoc_ray.pipeline.config import PipelineConfig
from dedoc_ray.pipeline.kernel import ExtractKernel


def _zip(entries) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in entries:
            zf.writestr(name, content)
    return buf.getvalue()


def _simple_pdf(text: str = "hello world from a pdf line") -> bytes:
    content = f"BT /F1 12 Tf 72 720 Td ({text}) Tj ET".encode()
    return (b"%PDF-1.4\n1 0 obj << /Length " + str(len(content)).encode()
            + b" >> stream\n" + content + b"\nendstream endobj\ntrailer\n%%EOF")


def test_pdf_with_text_layer_false_renders_and_ocrs():
    # the forced-OCR route now rasterizes the born-digital page from its
    # text layer and re-reads it with the open-font recognizer (reference
    # pdf2image+Tesseract shape) instead of the old stub warning
    k = ExtractKernel(config=PipelineConfig(pdf_with_text_layer="false"))
    row = k.extract_row("https://x.test/a.pdf", _simple_pdf())
    assert any("pdf_with_text_layer=false" in w for w in row["warnings"])
    if any("rasterized from the text layer" in w for w in row["warnings"]):
        assert row["extracted_text"].strip()  # OCR'd the rendered page
    else:  # no DejaVu faces in this environment: honest stub
        assert row["extracted_text"] == ""


def test_pdf_with_text_layer_true_skips_classifier():
    garbage = " ".join(f"cid{i % 97}x" for i in range(120))
    k = ExtractKernel(config=PipelineConfig(pdf_with_text_layer="true"))
    row = k.extract_row("https://x.test/a.pdf", _simple_pdf(garbage))
    assert garbage.split()[0] in row["extracted_text"]  # layer trusted


def test_is_one_column_true_forces_interleaved_order():
    from dedoc_ray.sources.synth_office import pdf_twocol_bytes

    pdf = pdf_twocol_bytes(1, "alpha the beta the gamma the delta")
    auto = ExtractKernel().extract_row("https://x.test/a.pdf", pdf)["extracted_text"]
    forced = ExtractKernel(config=PipelineConfig(is_one_column_document="true")).extract_row(
        "https://x.test/a.pdf", pdf
    )["extracted_text"]
    assert auto == "alpha\nbeta\ngamma\ndelta\n"
    assert forced != auto  # y-sort interleaves the columns


def test_html_fields_become_attachments():
    # reference json_reader.py:41-48: html fields are EXCLUDED from the
    # parsed json and attached as .html files named json.dumps(keys)+".html"
    data = b'{"body": "<html><body><p>rich para</p></body></html>", "plain": "x"}'
    k = ExtractKernel(config=PipelineConfig(html_fields=["body"]))
    row = k.extract_row("https://x.test/a.json", data)
    assert "<p>" not in row["extracted_text"]  # excluded, not inlined
    assert [a["name"] for a in row["attachments"]] == ['["body"].html']
    row2 = ExtractKernel().extract_row("https://x.test/a.json", data)
    assert "<p>rich para</p>" in row2["extracted_text"]  # default: raw scalar line


def test_nested_archive_recursion_depth():
    inner = _zip([("deep.txt", "deep text payload")])
    outer = _zip([("inner.zip", inner), ("top.txt", "top text")])
    k = ExtractKernel(config=PipelineConfig(need_content_analysis=True, recursion_deep_attachments=3))
    row = k.extract_row("https://x.test/a.zip", outer)
    assert "deep text payload" in row["extracted_text"]
    assert "top text" in row["extracted_text"]
    # depth 1: nested archive is NOT descended into
    k1 = ExtractKernel(config=PipelineConfig(need_content_analysis=True, recursion_deep_attachments=1))
    row1 = k1.extract_row("https://x.test/a.zip", outer)
    assert "deep text payload" not in row1["extracted_text"]
    assert "top text" in row1["extracted_text"]


def test_return_format_validation():
    with pytest.raises(ValueError):
        PipelineConfig(return_format="nope").validate()
    with pytest.raises(ValueError):
        PipelineConfig(pdf_with_text_layer="maybe").validate()
    PipelineConfig(return_format="plain_text").validate()


def test_with_attachments_and_base64(ray_session):
    import base64

    from dedoc_ray.pipeline.config import PipelineConfig
    from dedoc_ray.pipeline.extract import extract_pages
    from dedoc_ray.sources.synth_office import office_corpus

    sf = "/root/testdata/sf0.001"
    # default: manifest rows present, base64 empty
    rows = extract_pages(office_corpus(sf, "zip"), concurrency=2).take(2)
    assert rows[0]["attachments"] and rows[0]["attachments"][0]["base64"] == ""
    # return_base64: payloads round-trip
    rows = extract_pages(
        office_corpus(sf, "zip"), concurrency=2, config=PipelineConfig(return_base64=True)
    ).take(2)
    att = rows[0]["attachments"][0]
    assert len(base64.b64decode(att["base64"])) == att["size"]
    # with_attachments=False: manifest suppressed (the reference default)
    rows = extract_pages(
        office_corpus(sf, "zip"), concurrency=2, config=PipelineConfig(with_attachments=False)
    ).take(2)
    assert rows[0]["attachments"] == []
