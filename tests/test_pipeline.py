"""Ray pipeline tests: end-to-end extraction, determinism at two parallelism
levels, resumable per-shard manifests (SURVEY.md §5 plan items 3-4)."""

import json
import os

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _sorted_pdf(ds):
    df = ds.to_pandas()
    return df.sort_values("url").reset_index(drop=True)


@pytest.fixture(scope="module")
def pages_ds(ray_session):
    from dedoc_ray.sources.synth import synth_pages_dataset

    return synth_pages_dataset(SF)


class TestExtractionPipeline:
    def test_end_to_end_counts(self, ray_session, pages_ds):
        from dedoc_ray.pipeline.extract import extract_pages

        out = extract_pages(pages_ds, concurrency=2).to_pandas()
        assert len(out) == 500
        assert set(out["status"]) == {"ok", "bad_file"}
        assert (out["status"] == "bad_file").sum() == 50
        assert (out[out["status"] == "ok"]["extracted_text"].str.len() > 0).all()

    def test_determinism_across_parallelism(self, ray_session, pages_ds):
        from dedoc_ray.pipeline.extract import extract_pages

        # pool must stay below session CPUs (4) or the read stage starves
        a = _sorted_pdf(extract_pages(pages_ds, concurrency=1, batch_size=500))
        b = _sorted_pdf(extract_pages(pages_ds, concurrency=2, batch_size=16))
        assert a["extracted_text"].tolist() == b["extracted_text"].tolist()
        assert a["status"].tolist() == b["status"].tolist()
        assert a["n_nodes"].tolist() == b["n_nodes"].tolist()

    def test_unique_node_ids_per_doc(self, ray_session, pages_ds):
        from dedoc_ray.pipeline.extract import extract_pages

        out = extract_pages(pages_ds, concurrency=2).limit(100).to_pandas()
        for nodes in out["nodes"]:
            ids = [n["node_id"] for n in nodes]
            assert len(ids) == len(set(ids))

    def test_errors_do_not_kill_blocks(self, ray_session):
        import ray.data as rd

        from dedoc_ray.pipeline.extract import extract_pages

        import pyarrow as pa
        from datetime import datetime

        from dedoc_ray.pipeline.schemas import PAGES_SCHEMA

        rows = {
            "url": ["https://t/1.html", "https://t/2.bin", "https://t/3.json"],
            "warc_ts": [datetime(2024, 1, 1)] * 3,
            "html": [b"<body><p>fine</p></body>", b"\xff\xfe\x01", b"{broken"],
            "text": [""] * 3,
            "lang": ["en"] * 3,
            "shard": [0, 0, 0],
        }
        ds = rd.from_arrow(pa.Table.from_pydict(rows, schema=PAGES_SCHEMA))
        out = extract_pages(ds, concurrency=1).to_pandas().sort_values("url")
        assert out["status"].tolist() == ["ok", "bad_file", "parse_error"]


class TestResumableRun:
    def test_manifests_and_skip(self, ray_session, tmp_path):
        import ray.data as rd

        from dedoc_ray.pipeline.extract import run_extract_resumable
        from dedoc_ray.sources.synth import synth_pages_dataset

        # write 2 input shards
        shard_dir = tmp_path / "shards"
        pages = synth_pages_dataset(SF).to_pandas()
        half = len(pages) // 2
        os.makedirs(shard_dir)
        import pyarrow as pa

        pq.write_table(pa.Table.from_pandas(pages.iloc[:half], preserve_index=False), shard_dir / "s0.parquet")
        pq.write_table(pa.Table.from_pandas(pages.iloc[half:], preserve_index=False), shard_dir / "s1.parquet")

        out_dir = str(tmp_path / "out")
        shards = [str(shard_dir / "s0.parquet"), str(shard_dir / "s1.parquet")]
        totals = run_extract_resumable(shards, out_dir, concurrency=2)
        assert totals["shards_done"] == 2
        assert totals["docs"] == 500
        assert totals["parse_failures"] == 0  # bad_file is a status, not a parse failure... see manifest
        with open(os.path.join(out_dir, "_manifests", "s0.json")) as f:
            manifest = json.load(f)
        assert manifest["parser_version"].startswith("dedoc_ray-")
        assert manifest["docs"] == half

        # second run skips everything
        totals2 = run_extract_resumable(shards, out_dir, concurrency=2)
        assert totals2["shards_skipped"] == 2
        assert totals2["shards_done"] == 0

        # dropping one manifest reprocesses exactly that shard
        os.remove(os.path.join(out_dir, "_manifests", "s1.json"))
        totals3 = run_extract_resumable(shards, out_dir, concurrency=2)
        assert totals3["shards_done"] == 1
        assert totals3["shards_skipped"] == 1

        # output readable and complete
        out = rd.read_parquet(out_dir + "/s0") .union(rd.read_parquet(out_dir + "/s1"))
        assert out.count() == 500


def test_giant_row_isolation_same_results(ray_session):
    """Straggler isolation (giant_row_bytes) must partition, not drop or
    duplicate: union of the two pools equals the unsplit output."""
    import pandas as pd
    import ray.data as rd

    from dedoc_ray.pipeline.extract import extract_pages
    from dedoc_ray.sources.synth import pages_batch

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    pages = docs.map_batches(pages_batch, batch_format="pyarrow")

    plain = extract_pages(pages, concurrency=2).select_columns(
        ["url", "status", "extracted_text"]).to_pandas()
    split = extract_pages(pages, concurrency=2, giant_row_bytes=500).select_columns(
        ["url", "status", "extracted_text"]).to_pandas()

    a = plain.sort_values("url").reset_index(drop=True)
    b = split.sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert len(b) == len(b["url"].unique())  # no dup, no drop
