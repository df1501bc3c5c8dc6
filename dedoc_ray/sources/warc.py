"""WARC (Web ARChive) source — the on-disk format Common-Crawl ships.

A crawl corpus arrives as ``*.warc.gz`` files: concatenated gzip members,
one WARC record per member (warcinfo / request / response / metadata).
This module turns a directory of WARC files into the engine's pages table
``(url, warc_ts, html)`` as a streaming Ray Data pipeline:

    read_binary_files(paths)  →  flat parse (map_batches, stateless)
        →  (url, warc_ts, html) rows  →  extract_pages(...)

Scale notes (100 TB):
- The WARC *file* is the natural input shard — `read_binary_files` hands
  one file per block, so parallelism = number of files and no record ever
  straddles a task. CC files are ~1 GB; `target_max_block_size` must
  accommodate one decompressed file (set batch_size=1 on the parse stage
  so a worker holds at most one file's pages at a time).
- Parsing is map-only (no shuffle); the html payload stays a binary Arrow
  column end-to-end.
- Malformed records/files degrade to per-record skips, never task
  failures, so one corrupt crawl file cannot kill a job.

Format reference: ISO 28500 (WARC/1.0, WARC/1.1) — headers are
CRLF-terminated `Name: value` lines, a blank line, `Content-Length`
payload bytes, then CRLF CRLF between records. Response records carry an
HTTP/1.1 message as payload.
"""

from __future__ import annotations

import gzip
import hashlib
import io
from typing import Iterator, List, Optional, Tuple

import pyarrow as pa

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# Record building (synthesis / tests / re-archiving sink)
# ---------------------------------------------------------------------------

def _record_id(url: str, ts: str) -> str:
    h = hashlib.md5(f"{url}|{ts}".encode()).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def build_record(rec_type: str, url: Optional[str], ts: str, payload: bytes,
                 content_type: str = "application/http; msgtype=response") -> bytes:
    """One uncompressed WARC/1.0 record (headers + payload + record gap)."""
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + rec_type.encode(),
        b"WARC-Date: " + ts.encode(),
        b"WARC-Record-ID: " + _record_id(url or rec_type, ts).encode(),
    ]
    if url is not None:
        lines.append(b"WARC-Target-URI: " + url.encode())
    lines.append(b"Content-Type: " + content_type.encode())
    lines.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(lines) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def build_response_record(url: str, ts: str, body: bytes,
                          mime: str = "text/html; charset=utf-8") -> bytes:
    http = (b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: " + mime.encode() + _CRLF
            + b"Content-Length: " + str(len(body)).encode() + _CRLF
            + _CRLF + body)
    return build_record("response", url, ts, http)


def build_warc_file(records: List[bytes], gzip_members: bool = True) -> bytes:
    """Concatenate records into one WARC file.

    ``gzip_members=True`` is the Common-Crawl layout: each record is its
    own gzip member, members concatenated — a reader can then seek to a
    record offset and inflate just that member.
    """
    info = build_record(
        "warcinfo", None, "2024-01-01T00:00:00Z",
        b"software: dedoc-ray-synth\r\nformat: WARC File Format 1.0\r\n",
        content_type="application/warc-fields",
    )
    parts = [info] + records
    if not gzip_members:
        return b"".join(parts)
    out = io.BytesIO()
    for rec in parts:
        out.write(gzip.compress(rec, mtime=0))
    return out.getvalue()


# ---------------------------------------------------------------------------
# Parsing
# ---------------------------------------------------------------------------

def _gunzip_members(data: bytes) -> bytes:
    """Inflate a concatenated-gzip-members stream (also plain single-member
    gzip; returns input unchanged when not gzip)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gf:  # reads ALL members
        while True:
            chunk = gf.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(_CRLF)[1:]:  # [0] is the version / status line
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return headers


def _http_body(payload: bytes) -> Optional[bytes]:
    """Extract the entity body of an HTTP/1.1 response payload. Returns
    None for non-2xx statuses."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return payload  # bare payload (some writers omit the HTTP envelope)
    head = payload[:sep]
    status_line = head.split(_CRLF, 1)[0].split(b" ")
    if len(status_line) >= 2 and not status_line[1].startswith(b"2"):
        return None
    headers = _parse_headers(head)
    body = payload[sep + 4:]
    n = headers.get("content-length")
    if n is not None:
        try:
            body = body[: int(n)]
        except ValueError:
            pass
    if headers.get("transfer-encoding", "").lower() == "chunked":
        body = _dechunk(body)
    return body


def _dechunk(body: bytes) -> bytes:
    out, pos = [], 0
    while pos < len(body):
        eol = body.find(_CRLF, pos)
        if eol < 0:
            break
        try:
            size = int(body[pos:eol].split(b";")[0], 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[eol + 2: eol + 2 + size])
        pos = eol + 2 + size + 2
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[Tuple[dict, bytes]]:
    """Yield (warc_headers, payload) per record; tolerates trailing junk
    and malformed records (stops at the first unrecoverable corruption)."""
    data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record gap
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break  # corrupt tail — stop, keep records parsed so far
        sep = data.find(_CRLF + _CRLF, pos)
        if sep < 0:
            break
        headers = _parse_headers(data[pos:sep])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload = data[sep + 4: sep + 4 + length]
        yield headers, payload
        pos = sep + 4 + length


def parse_warc_pages(data: bytes) -> List[Tuple[str, str, bytes]]:
    """WARC file bytes → [(url, warc_ts, html_bytes)] for every 2xx
    response record with a target URI."""
    pages = []
    for headers, payload in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        body = _http_body(payload)
        if body is None:
            continue
        pages.append((url, headers.get("warc-date", ""), body))
    return pages


# ---------------------------------------------------------------------------
# Ray integration
# ---------------------------------------------------------------------------

def _pages_from_warc_batch(batch: pa.Table, col: str) -> pa.Table:
    urls: List[str] = []
    tss: List[str] = []
    payloads: List[bytes] = []
    for blob in batch[col]:
        for url, ts, body in parse_warc_pages(blob.as_py()):
            urls.append(url)
            tss.append(ts)
            payloads.append(body)
    return pa.Table.from_pydict({
        "url": pa.array(urls, "string"),
        "warc_ts": pa.array(tss, "string"),
        "html": pa.array(payloads, "binary"),
    })


def read_warc_pages(paths):
    """Directory / list of ``*.warc[.gz]`` files → streaming pages Dataset
    ``(url, warc_ts, html)``. One file per task; map-only."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)
    return ds.map_batches(
        lambda b: _pages_from_warc_batch(b, "bytes"),
        batch_format="pyarrow", batch_size=1,  # ≤1 decompressed file per task
    )


def warc_pages_from_payloads(ds, col: str = "warc"):
    """Same parse over an in-Dataset binary column of WARC file bytes."""
    return ds.map_batches(
        lambda b: _pages_from_warc_batch(b, col),
        batch_format="pyarrow", batch_size=4,
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic crawl (tests / oracle queries)
# ---------------------------------------------------------------------------

def synth_ts(doc_id: int) -> str:
    s = doc_id % 86400
    return f"2024-01-01T{s // 3600:02d}:{s % 3600 // 60:02d}:{s % 60:02d}Z"


def _synth_warc_batch(batch: pa.Table, per_file: int) -> pa.Table:
    """documents rows → one WARC file per ``per_file`` consecutive rows.
    Request records interleave with responses (the parser must skip them);
    files alternate CC-style gzip members / plain to cover both layouts.
    Grouping depends on batch boundaries, but the PARSED output does not —
    the oracle checks pages, not files."""
    from xml.sax.saxutils import escape

    from dedoc_ray.sources.synth import chunks_of

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    files = []
    for start in range(0, len(ids), per_file):
        records = []
        for doc_id, text in zip(ids[start:start + per_file], texts[start:start + per_file]):
            url = f"https://synth.test/warc/{doc_id}.html"
            ts = synth_ts(doc_id)
            body = ("<html><body>"
                    + "".join(f"<p>{escape(c)}</p>" for c in chunks_of(text))
                    + "</body></html>").encode("utf-8")
            records.append(build_record(
                "request", url, ts, b"GET / HTTP/1.1\r\nHost: synth.test\r\n\r\n",
                content_type="application/http; msgtype=request"))
            records.append(build_response_record(url, ts, body))
        gzip_members = (ids[start] % 3 != 0) if start < len(ids) else True
        files.append(build_warc_file(records, gzip_members=gzip_members))
    return pa.Table.from_pydict({"warc": pa.array(files, "binary")})


def synth_warc_corpus(sf_dir: str, per_file: int = 8):
    """Lazy Dataset of WARC file payloads derived from ``documents``."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(
        lambda b: _synth_warc_batch(b, per_file), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Sink: re-archive pages as WARC shards
# ---------------------------------------------------------------------------

def write_warc(pages_ds, out_dir: str, per_file: int = 256) -> int:
    """Pages Dataset ``(url, html[, warc_ts])`` → ``shard-*.warc.gz``
    files under ``out_dir`` (CC gzip-member layout) — the interchange
    sink inverse of ``read_warc_pages``. Each task writes its own shard
    files (name = uuid-free: shard index from Ray's task context via the
    batch's first url hash), so writers never coordinate. Returns the
    number of pages written.

    Scale: map-only; one open file per task at a time; payload bytes
    stream through without concatenation beyond ``per_file`` records."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        tss = (batch["warc_ts"].to_pylist() if "warc_ts" in batch.column_names
               else ["2024-01-01T00:00:00Z"] * len(urls))
        n = 0
        for start in range(0, len(urls), per_file):
            recs = [
                build_response_record(u, ts or "2024-01-01T00:00:00Z", h or b"")
                for u, ts, h in zip(urls[start:start + per_file],
                                    tss[start:start + per_file],
                                    htmls[start:start + per_file])
            ]
            shard_id = hashlib.md5(
                (urls[start] + str(len(recs))).encode()).hexdigest()[:16]
            path = os.path.join(out_dir, f"shard-{shard_id}.warc.gz")
            with open(path, "wb") as f:
                f.write(build_warc_file(recs, gzip_members=True))
            n += len(recs)
        return pa.Table.from_pydict({"n": pa.array([n], "int64")})

    counts = pages_ds.map_batches(write_batch, batch_format="pyarrow",
                                  batch_size=per_file)
    return sum(r["n"] for r in counts.iter_rows())
