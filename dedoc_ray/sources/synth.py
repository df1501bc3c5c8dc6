"""Deterministic synthetic web-page corpus.

Builds the Common-Crawl-style pages table (url, warc_ts, html, text, lang,
shard — BASELINE.json input_hint) as a PURE function of the driver-provided
``documents`` table (doc_id, text, lang, source). Every byte is derived from
(doc_id, text, lang, source) alone, so the same rows are produced at any
parallelism, any scale factor, any run — and simple template classes are
SQL-expressible for the DuckDB correctness oracle.

Template class = doc_id % 10 (with two % 20 refinements):

  0-3  multi-<p> HTML;      extracted = replace(text,' the ',\n) + \n
  4    multi-<div> HTML;    extracted = replace(text,' the ',\n)
  5    h1 + one <p>;        extracted = 'Document {id}\n' + text + \n
  6    rich HTML (headers/lists/bordered table/styles; cp1251+meta charset
       when doc_id % 20 == 6) — exercised by pytest goldens, not SQL
  7    plain text bytes (.txt url); doc_id % 20 == 17 → text-layer PDF (.pdf)
  8    JSON bytes (.json url)
  9    undecodable binary → status=bad_file

The heavy-tail size skew required by FIXTURES.md §1 comes from repeating the
body deterministically for doc_id % 997 == 0 (multi-hundred-KB rows).
"""

from __future__ import annotations

import gzip
import json
import struct
from datetime import datetime, timedelta
from html import escape
from typing import Dict, List

import pyarrow as pa

from dedoc_ray.pipeline.schemas import PAGES_SCHEMA

EPOCH = datetime(2024, 1, 1)
N_SHARDS_DEFAULT = 8


def template_class(doc_id: int) -> int:
    return doc_id % 10


def url_for(doc_id: int, source: str) -> str:
    cls = template_class(doc_id)
    if cls <= 6:
        ext = ".html"
    elif cls == 7:
        ext = ".pdf" if doc_id % 20 == 17 else ".txt"
    elif cls == 8:
        ext = ".json"
    else:
        ext = ".bin"
    return f"https://synth.test/{source}/{doc_id}{ext}"


def chunks_of(text: str) -> List[str]:
    return text.split(" the ")


def _rich_html(doc_id: int, text: str, lang: str) -> bytes:
    chunks = chunks_of(text)
    words = text.split(" ")
    parts = ["<!DOCTYPE html><html><head><title>ignored title</title>", "<script>var a=1;</script></head><body>"]
    parts.append(f"<h1>Document {doc_id}</h1>")
    parts.append(f"<p>Lead <b>{escape(words[0])}</b> and <i>{escape(words[min(1, len(words) - 1)])}</i> "
                 f'<a href="https://synth.test/ref/{doc_id}">link</a>.</p>')
    parts.append(f"<h2>Section {doc_id % 5}</h2>")
    parts.append("<ol>" + "".join(f"<li>{escape(c[:40])}</li>" for c in chunks[:3]) + "</ol>")
    parts.append("<ul>" + "".join(f"<li>{escape(w)}</li>" for w in words[:2]) + "</ul>")
    parts.append('<table border="1"><tr><td>r1c1</td><td colspan="2">wide</td></tr>'
                 "<tr><td>r2c1</td><td>r2c2</td><td>r2c3</td></tr></table>")
    parts.append(f'<p style="font-weight:bold; text-align:center">styled {doc_id}</p>')
    if len(chunks) > 3:
        parts.append("".join(f"<p>{escape(c)}</p>" for c in chunks[3:]))
    parts.append("<!-- comment dropped --></body></html>")
    html = "".join(parts)
    if doc_id % 20 == 6:
        html = html.replace("<head>", '<head><meta charset="windows-1251">')
        return html.encode("cp1251", errors="replace")
    return html.encode("utf-8")


def _pdf_bytes(doc_id: int, text: str) -> bytes:
    """Minimal single-page text-layer PDF; lines emitted in doc_id-rotated
    order with strictly descending-y layout so the reader's y-sort is
    actually exercised."""
    chunks = chunks_of(text)
    n = len(chunks)
    rot = doc_id % max(n, 1)
    ops = []
    order = list(range(n))
    order = order[rot:] + order[:rot]  # emit rotated, positions keep layout order
    for emit_pos, chunk_idx in enumerate(order):
        y = 760 - 14 * chunk_idx
        safe = chunks[chunk_idx].replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"BT /F1 12 Tf 72 {y} Td ({safe}) Tj ET")
    content = "\n".join(ops).encode("latin-1")
    objs = []
    objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    objs.append(b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj")
    objs.append(b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >> endobj")
    objs.append(b"4 0 obj << /Length " + str(len(content)).encode() + b" >> stream\n" + content + b"\nendstream endobj")
    body = b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"
    return body


def _garbage_bytes(doc_id: int) -> bytes:
    # deterministic undecodable binary (0x80-0xFF runs break utf-8 strict)
    seed = struct.pack("<Q", doc_id * 2654435761 % (1 << 64))
    return (b"\xff\xfe\xfa" + seed) * 7


def page_bytes(doc_id: int, text: str, lang: str) -> bytes:
    cls = template_class(doc_id)
    if doc_id % 997 == 0:  # heavy-tail skew rows (log-normal tail analogue)
        text = (text + " the ") * 200 + text
    chunks = chunks_of(text)
    if cls <= 3:
        body = "".join(f"<p>{escape(c)}</p>" for c in chunks)
        return f"<html><body>{body}</body></html>".encode("utf-8")
    if cls == 4:
        body = "".join(f"<div>{escape(c)}</div>" for c in chunks)
        return f"<html><body>{body}</body></html>".encode("utf-8")
    if cls == 5:
        return f"<html><body><h1>Document {doc_id}</h1><p>{escape(text)}</p></body></html>".encode("utf-8")
    if cls == 6:
        return _rich_html(doc_id, text, lang)
    if cls == 7:
        if doc_id % 20 == 17:
            return _pdf_bytes(doc_id, text)
        payload = ("\n  ".join(chunks)).encode("utf-8")
        return gzip.compress(payload, mtime=0) if doc_id % 40 == 27 else payload
    if cls == 8:
        return json.dumps({"body": text, "title": f"Doc {doc_id}"}, sort_keys=True).encode("utf-8")
    return _garbage_bytes(doc_id)


def pages_batch(batch: pa.Table, n_shards: int = N_SHARDS_DEFAULT, size_mult: int = 1) -> pa.Table:
    """documents rows → pages rows; pure, vector-friendly per batch.

    ``size_mult`` > 1 repeats each body deterministically BEFORE templating —
    bench-only lever producing realistically-sized (tens-of-KB) pages like
    real Common-Crawl HTML; correctness oracles always use size_mult=1."""
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    if size_mult > 1:
        texts = [(t + " the ") * (size_mult - 1) + t for t in texts]
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    cols: Dict[str, list] = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": [], "shard": []}
    for doc_id, text, lang, source in zip(doc_ids, texts, langs, sources):
        cols["url"].append(url_for(doc_id, source))
        cols["warc_ts"].append(EPOCH + timedelta(seconds=doc_id))
        cols["html"].append(page_bytes(doc_id, text, lang))
        cols["text"].append(text)
        cols["lang"].append(lang)
        cols["shard"].append(doc_id % n_shards)
    return pa.Table.from_pydict(cols, schema=PAGES_SCHEMA)


def synth_pages_dataset(sf_dir: str, n_shards: int = N_SHARDS_DEFAULT):
    """Ray Dataset of synthetic pages for a scale-factor directory."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"])
    return docs.map_batches(lambda b: pages_batch(b, n_shards), batch_format="pyarrow")


def write_pages_parquet(sf_dir: str, out_dir: str, n_shards: int = N_SHARDS_DEFAULT) -> str:
    """Materialize the synthetic corpus once (bench input cache), partitioned
    by shard so downstream runs can checkpoint/skip per shard."""
    import os

    ds = synth_pages_dataset(sf_dir, n_shards)
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, partition_cols=["shard"])
    return out_dir
