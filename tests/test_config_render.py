"""Tests: PipelineConfig knobs, linear constructor, user patterns API,
PDF auto-routing/pages, renderers."""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from dedoc_ray.pipeline.config import PipelineConfig, parse_pages
from dedoc_ray.pipeline.kernel import ExtractKernel
from dedoc_ray.pipeline.render import render_batch, render_html, render_tree, render_txt

HTML = b"<html><body><h1>Title</h1><p>first para</p><p>second para</p></body></html>"


def _extract(config: PipelineConfig, url: str = "https://x/a.html", data: bytes = HTML):
    kern = ExtractKernel(config=config)
    out = kern(pa.Table.from_pydict({"url": [url], "html": [data]}))
    return out.to_pylist()[0]


def test_linear_vs_tree_structure():
    tree_row = _extract(PipelineConfig(structure_type="tree"))
    linear_row = _extract(PipelineConfig(structure_type="linear"))
    # identical text, different shape: linear puts every line at depth 1
    assert tree_row["extracted_text"] == linear_row["extracted_text"]
    linear_depths = {n["node_id"].count(".") for n in linear_row["nodes"] if n["node_id"] != "0"}
    assert linear_depths == {1}
    tree_depths = {n["node_id"].count(".") for n in tree_row["nodes"] if n["node_id"] != "0"}
    assert len(tree_depths) >= 1


def test_invalid_structure_type_rejected():
    with pytest.raises(ValueError, match="structure_type"):
        ExtractKernel(config=PipelineConfig(structure_type="graph"))


def test_user_patterns_override():
    cfg = PipelineConfig(patterns=[
        {"name": "regexp", "regexp": r"^first", "line_type": "header", "level_1": 1, "level_2": 1},
        {"name": "tag", "line_type": "raw_text", "level_1": None, "level_2": None},
    ])
    row = _extract(cfg)
    headers = [n for n in row["nodes"] if n["line_type"] == "header"]
    assert any("first" in row["extracted_text"][n["text_start"]:n["text_end"]] for n in headers)


def test_unknown_pattern_name_rejected():
    from dedoc_ray.structure.patterns import pattern_from_dict

    with pytest.raises(ValueError, match="unknown pattern"):
        pattern_from_dict({"name": "nope"})


def test_parse_pages():
    assert parse_pages(None) == (0, None)
    assert parse_pages("2:3") == (1, 3)
    assert parse_pages(":2") == (0, 2)
    assert parse_pages("3:") == (2, None)


def test_pdf_pages_slice_and_ocr_stub():
    from dedoc_ray.sources.synth import _pdf_bytes

    pdf = _pdf_bytes(17, "alpha the beta the gamma")
    full = _extract(PipelineConfig(), url="https://x/a.pdf", data=pdf)
    assert full["status"] == "ok" and full["extracted_text"]

    # a PDF with no BT/ET text ops → OCR stub warning, not a failure
    textless = b"%PDF-1.4\nstream\nnothing here\nendstream\ntrailer\n%%EOF"
    row = _extract(PipelineConfig(), url="https://x/b.pdf", data=textless)
    assert row["status"] == "ok"
    assert row["extracted_text"] == ""
    assert any("OCR" in w for w in row["warnings"])


def test_renderers_roundtrip():
    row = _extract(PipelineConfig())
    assert render_txt(row) == row["extracted_text"]

    html_out = render_html(row)
    assert html_out.startswith("<html><body>") and "first para" in html_out

    tree = render_tree(row)
    assert tree["content"]["structure"]["node_id"] == "0"
    texts = []

    def walk(n):
        texts.append(n["text"])
        for s in n["subparagraphs"]:
            walk(s)

    walk(tree["content"]["structure"])
    assert "".join(texts) == row["extracted_text"]


def test_render_batch_stage():
    kern = ExtractKernel()
    out = kern(pa.Table.from_pydict({"url": ["https://x/a.html"], "html": [HTML]}))
    rendered = render_batch(out, fmt="tree")
    parsed = json.loads(rendered["rendered"][0].as_py())
    assert parsed["content"]["structure"]["subparagraphs"]


def test_render_html_annotations_wrapped():
    data = b"<html><body><p><b>bold bit</b> rest</p></body></html>"
    row = _extract(PipelineConfig(), data=data)
    out = render_html(row)
    assert "<b>bold bit</b>" in out


def test_header_footer_removal():
    from dedoc_ray.core.line import LineMetadata, LineWithMeta
    from dedoc_ray.readers.header_footer import remove_headers_footers

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta", "iota"]
    lines = []
    for page in range(3):
        lines.append(LineWithMeta("ACME Corp Annual Report\n", metadata=LineMetadata(page_id=page)))
        for j in range(3):  # body lines genuinely differ between pages
            w = words[page * 3 + j]
            lines.append(LineWithMeta(f"body {w} content {w}\n", metadata=LineMetadata(page_id=page)))
        lines.append(LineWithMeta(f"Page {page + 1}\n", metadata=LineMetadata(page_id=page)))
    kept, warnings = remove_headers_footers(lines)
    texts = [l.line for l in kept]
    assert all("ACME" not in t for t in texts)          # running header gone
    assert all(not t.startswith("Page ") for t in texts)  # page number gone (digits masked)
    assert sum("body" in t for t in texts) == 9          # body intact
    assert warnings and "dropped 6 lines" in warnings[0]


def test_header_footer_single_page_noop():
    from dedoc_ray.core.line import LineMetadata, LineWithMeta
    from dedoc_ray.readers.header_footer import remove_headers_footers

    lines = [LineWithMeta("only page\n", metadata=LineMetadata(page_id=0))]
    kept, warnings = remove_headers_footers(lines)
    assert kept == lines and warnings == []


def test_document_type_law_structure():
    law_txt = (b"Chapter 1\n"
               b"Article 1\n"
               b"1. First clause text here\n"
               b"2. Second clause text here\n"
               b"Article 2\n"
               b"1. Another clause follows\n")
    row = _extract(PipelineConfig(document_type="law"), url="https://x/law.txt", data=law_txt)
    types = {n["line_type"] for n in row["nodes"]}
    # dotted clauses are articlePart in the reference law taxonomy
    # (law_structure_unit.py:40-42); a synthetic empty body node roots the units
    assert "chapter" in types and "article" in types and "articlePart" in types
    assert "body" in types
    # articles nest under the chapter, items under articles
    by_type = {t: [n for n in row["nodes"] if n["line_type"] == t] for t in types}
    assert all(n["node_id"].count(".") > by_type["chapter"][0]["node_id"].count(".")
               for n in by_type["article"])


def test_document_type_unknown_rejected():
    with pytest.raises(ValueError, match="document_type"):
        ExtractKernel(config=PipelineConfig(document_type="poetry"))


def test_document_type_diploma_named_items():
    txt = (b"Introduction\n"
           b"Chapter 1\n"
           b"some body text follows here\n"
           b"Conclusion\n")
    row = _extract(PipelineConfig(document_type="diploma"), url="https://x/d.txt", data=txt)
    types = [n["line_type"] for n in row["nodes"]]
    # chapters are named_item in the reference diploma taxonomy
    # (diploma_builder/body_builder.py:16; test_api_doctype_diploma pins)
    assert types.count("named_item") >= 2
    assert "body" in types


def test_labeling_dump_sink(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from dedoc_ray.pipeline.extract import extract_pages
    from dedoc_ray.pipeline.render import write_labeling_dump
    from dedoc_ray.sources.synth import pages_batch

    docs_tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([5], "int64"),  # cls 5: h1 + paragraph
            "text": pa.array(["alpha beta"], "string"),
            "lang": pa.array(["en"], "string"),
            "source": pa.array(["s"], "string"),
        }
    )
    ds = extract_pages(rd.from_arrow(pages_batch(docs_tbl)), concurrency=2)
    out = str(tmp_path / "labeling")
    write_labeling_dump(ds, out)
    dumped = pq.read_table(out).to_pylist()
    assert len(dumped) >= 2  # root + at least one content node
    assert {"url", "node_id", "line_type", "text", "annotations_json"} <= set(dumped[0])
    texts = "".join(sorted(r["text"] for r in dumped))
    assert "alpha beta" in texts
