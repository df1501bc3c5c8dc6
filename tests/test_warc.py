"""WARC source: record build/parse roundtrip, layout variants, Ray read."""

import gzip

import pyarrow as pa
import pytest

from dedoc_ray.sources.warc import (
    build_record,
    build_response_record,
    build_warc_file,
    iter_warc_records,
    parse_warc_pages,
    read_warc_pages,
    synth_ts,
    warc_pages_from_payloads,
)


def _two_page_file(gzip_members: bool) -> bytes:
    recs = []
    for i, body in enumerate([b"<html><body><p>alpha</p></body></html>",
                              b"<html><body><p>beta</p></body></html>"]):
        url = f"https://ex.test/{i}.html"
        recs.append(build_record("request", url, "2024-01-01T00:00:00Z",
                                 b"GET / HTTP/1.1\r\n\r\n",
                                 content_type="application/http; msgtype=request"))
        recs.append(build_response_record(url, "2024-01-01T00:00:00Z", body))
    return build_warc_file(recs, gzip_members=gzip_members)


@pytest.mark.parametrize("gzip_members", [True, False])
def test_roundtrip_layouts(gzip_members):
    pages = parse_warc_pages(_two_page_file(gzip_members))
    assert [u for u, _, _ in pages] == ["https://ex.test/0.html", "https://ex.test/1.html"]
    assert pages[0][2] == b"<html><body><p>alpha</p></body></html>"
    assert all(ts == "2024-01-01T00:00:00Z" for _, ts, _ in pages)


def test_warcinfo_and_request_records_skipped():
    data = _two_page_file(False)
    types = [h.get("warc-type") for h, _ in iter_warc_records(data)]
    assert types == ["warcinfo", "request", "response", "request", "response"]
    assert len(parse_warc_pages(data)) == 2


def test_non_2xx_and_missing_uri_skipped():
    recs = [
        build_record("response", "https://ex.test/404", "2024-01-01T00:00:00Z",
                     b"HTTP/1.1 404 Not Found\r\nContent-Length: 2\r\n\r\nno"),
        build_record("response", None, "2024-01-01T00:00:00Z",
                     b"HTTP/1.1 200 OK\r\n\r\nbody"),
        build_response_record("https://ex.test/ok", "2024-01-01T00:00:00Z", b"yes"),
    ]
    pages = parse_warc_pages(build_warc_file(recs, gzip_members=False))
    assert [(u, b) for u, _, b in pages] == [("https://ex.test/ok", b"yes")]


def test_chunked_transfer_encoding():
    payload = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
               b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n")
    rec = build_record("response", "https://ex.test/c", "2024-01-01T00:00:00Z", payload)
    pages = parse_warc_pages(rec)
    assert pages[0][2] == b"hello world"


def test_content_length_truncates_padding():
    payload = b"HTTP/1.1 200 OK\r\nContent-Length: 4\r\n\r\nbodyEXTRA"
    rec = build_record("response", "https://ex.test/t", "2024-01-01T00:00:00Z", payload)
    assert parse_warc_pages(rec)[0][2] == b"body"


def test_corrupt_tail_keeps_parsed_prefix():
    data = _two_page_file(False) + b"GARBAGE NOT A RECORD"
    assert len(parse_warc_pages(data)) == 2
    # corrupt content-length: stop without raising
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: NaN\r\n\r\nx"
    assert parse_warc_pages(bad) == []


def test_plain_gzip_whole_file():
    plain = _two_page_file(False)
    assert len(parse_warc_pages(gzip.compress(plain, mtime=0))) == 2


def test_read_warc_pages_from_files(ray_session, tmp_path):
    for i, gz in enumerate([True, False]):
        suffix = ".warc.gz" if gz else ".warc"
        (tmp_path / f"f{i}{suffix}").write_bytes(_two_page_file(gz))
    ds = read_warc_pages([str(tmp_path / "f0.warc.gz"), str(tmp_path / "f1.warc")])
    rows = ds.take_all()
    assert len(rows) == 4
    assert {r["url"] for r in rows} == {"https://ex.test/0.html", "https://ex.test/1.html"}
    assert all(isinstance(r["html"], bytes) for r in rows)


def test_synth_corpus_extracts(ray_session):
    import ray.data as rd

    from dedoc_ray.pipeline.extract import extract_pages
    from dedoc_ray.sources.warc import synth_warc_corpus

    sf = "/root/testdata/sf0.001"
    pages = warc_pages_from_payloads(synth_warc_corpus(sf))
    out = extract_pages(pages, concurrency=2).select_columns(
        ["url", "warc_ts", "status", "extracted_text"]).take_all()
    n_docs = rd.read_parquet(f"{sf}/documents.parquet").count()
    assert len(out) == n_docs
    assert all(r["status"] == "ok" for r in out)
    by_url = {r["url"]: r for r in out}
    import pandas as pd
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    row = docs.iloc[0]
    r = by_url[f"https://synth.test/warc/{row.doc_id}.html"]
    assert r["extracted_text"] == row.text.replace(" the ", "\n") + "\n"
    assert r["warc_ts"] == synth_ts(int(row.doc_id))


def test_cc_prep_flagship(ray_session):
    """WARC → extract → stats → dedup → split composition sanity."""
    import pandas as pd

    from dedoc_ray.ops.funnel import cc_prep

    df = pd.DataFrame(cc_prep("/root/testdata/sf0.001").take_all())
    assert df["doc_id"].is_unique
    assert set(df["split"]) <= {"train", "val", "test"}
    assert (df["n_tokens"] >= 32).all()
    assert (df["split"] == "train").mean() > 0.7


def test_write_warc_roundtrip(ray_session, tmp_path):
    """write_warc → read_warc_pages roundtrip preserves url/ts/payload."""
    import glob

    import ray.data as rd

    from dedoc_ray.sources.warc import read_warc_pages, write_warc

    rows = [{"url": f"https://ex.test/{i}", "warc_ts": synth_ts(i),
             "html": f"<html><body><p>doc {i}</p></body></html>".encode()}
            for i in range(37)]
    out = str(tmp_path / "warc-out")
    n = write_warc(rd.from_items(rows).repartition(3), out, per_file=10)
    assert n == 37
    files = glob.glob(out + "/shard-*.warc.gz")
    assert len(files) >= 4  # 37 pages / 10 per file, across partitions
    back = read_warc_pages(files).take_all()
    assert len(back) == 37
    got = {(r["url"], r["warc_ts"], r["html"]) for r in back}
    want = {(r["url"], r["warc_ts"], r["html"]) for r in rows}
    assert got == want
