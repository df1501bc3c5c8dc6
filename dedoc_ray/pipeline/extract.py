"""Pipeline assembly: pages Dataset → extracted Dataset, with resumable
per-shard checkpointed runs.

Scale design (SURVEY.md §4, north rule):

- The extraction stage is an ACTOR POOL (``map_batches(ExtractKernel,
  concurrency=...)``) so pattern compositions/regexes compile once per
  worker, not per batch.
- ``batch_size`` is bounded (default 64 rows) because rows carry multi-KB..MB
  binary payloads; blocks stream through the object store with backpressure,
  nothing materializes the corpus.
- No shuffle anywhere in extraction: every row is self-contained, so the
  pipeline is embarrassingly parallel at any cluster size; the only
  all-to-all operations in this repo live in the corpus-level ops
  (dedup/groupby — see dedoc_ray.ops).
- Resumability: one output directory + manifest per input shard, written
  atomically (tmp dir + rename). A restarted run skips shards whose manifest
  is committed with a matching parser version. Manifest carries lineage
  (input path, shard id, parser version) and counters (docs, bytes, parse
  failures) — the checkpoint contract of the north rule.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Any, Dict, List, Optional

import pyarrow.compute as pc

import dedoc_ray
from dedoc_ray.pipeline.kernel import ExtractKernel

PARSER_VERSION = f"dedoc_ray-{dedoc_ray.__version__}"

DEFAULT_BATCH_SIZE = 64


def _autosize_pool() -> int:
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    # leave ~half the cpus for read/decode tasks: parquet read+decode of
    # the page corpus costs ~1 cpu per 3-4 parse cpus, and a pool holding
    # nearly every cpu starves the reads (measured: conc=30/32 cpus →
    # 15k docs/s read-bound vs conc=16/32 cpus → 35k docs/s). A pool
    # holding EVERY cpu deadlocks the upstream read outright.
    return max(1, ncpu // 2)


def extract_pages(
    pages_ds,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[int] = None,
    handle_invisible_table: bool = False,
    giant_row_bytes: Optional[int] = None,
    config=None,
    readers=None,
    converters=None,
):
    """pages Dataset → extracted Dataset (lazy, streaming).

    ``concurrency=None`` lets Ray autoscale the actor pool to available CPUs;
    pass an explicit (min, max) tuple or int to pin pool size per stage.

    ``giant_row_bytes``: straggler isolation for the heavy tail (SURVEY.md §4
    skew row). Rows whose ``html`` payload exceeds the threshold are routed
    to a dedicated low-concurrency pool with tiny batches, so one multi-MB
    page cannot stall a 64-row batch of small ones; the two branches are
    unioned (row order is not guaranteed — it never is for this pipeline).
    """
    kwargs: Dict[str, Any] = {}
    kwargs["concurrency"] = concurrency if concurrency is not None else _autosize_pool()
    fn_kwargs = {"config": config} if config is not None else {"handle_invisible_table": handle_invisible_table}
    if readers is not None:  # pluggable reader registry (manager_config analogue)
        fn_kwargs["readers"] = readers
    if converters is not None:  # pluggable converter registry (ConverterComposition analogue)
        fn_kwargs["converters"] = converters

    if giant_row_bytes is None:
        return pages_ds.map_batches(
            ExtractKernel,
            fn_constructor_kwargs=fn_kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=1,
            **kwargs,
        )

    import pyarrow as pa
    import pyarrow.compute as pc

    def _split(keep_giant: bool):
        def f(batch: pa.Table) -> pa.Table:
            sizes = pc.binary_length(pc.coalesce(batch["html"], pa.scalar(b"", type=batch["html"].type)))
            mask = pc.greater(sizes, giant_row_bytes)
            return batch.filter(mask if keep_giant else pc.invert(mask))

        return f

    small = pages_ds.map_batches(_split(False), batch_format="pyarrow").map_batches(
        ExtractKernel, fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow", batch_size=batch_size, num_cpus=1, **kwargs,
    )
    giant_pool = max(1, (kwargs["concurrency"] if isinstance(kwargs["concurrency"], int) else 4) // 4)
    giant = pages_ds.map_batches(_split(True), batch_format="pyarrow").map_batches(
        ExtractKernel, fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow", batch_size=4, num_cpus=1, concurrency=(1, giant_pool),
    )
    return small.union(giant)


# ------------------------------------------------------------ resumable runs


def _manifest_path(out_dir: str, shard_name: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{shard_name}.json")


def is_committed(out_dir: str, shard_name: str) -> bool:
    path = _manifest_path(out_dir, shard_name)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            manifest = json.load(f)
        return manifest.get("parser_version") == PARSER_VERSION
    except (OSError, json.JSONDecodeError):
        return False


def run_extract_resumable(
    shard_paths: List[str],
    out_dir: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    concurrency: Optional[int] = None,
    giant_row_bytes: Optional[int] = None,
) -> Dict[str, Any]:
    """Process input parquet shards with per-shard checkpointing.

    Each shard: read → extract → write to ``out_dir/<shard>.tmp`` → fsync
    rename to ``out_dir/<shard>`` → commit manifest. A killed run leaves at
    most one .tmp directory which the next run overwrites; committed shards
    are skipped (reference has no such mechanism — dedoc is request-scoped;
    this is the explicit design the north rule demands).
    """
    import ray.data as rd

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    totals = {"shards_done": 0, "shards_skipped": 0, "docs": 0, "bytes": 0, "parse_failures": 0}
    for path in shard_paths:
        shard_name = os.path.splitext(os.path.basename(path.rstrip("/")))[0]
        if is_committed(out_dir, shard_name):
            totals["shards_skipped"] += 1
            continue
        t0 = time.time()
        final_dir = os.path.join(out_dir, shard_name)
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)

        ds = rd.read_parquet(path)
        extracted = extract_pages(ds, batch_size=batch_size, concurrency=concurrency,
                                  giant_row_bytes=giant_row_bytes)
        extracted.write_parquet(tmp_dir)

        # counters from the written shard: per-batch partials → tiny driver sum
        import pyarrow as pa

        out = rd.read_parquet(tmp_dir, columns=["status", "n_bytes"])
        partials = out.map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "docs": [b.num_rows],
                    "bytes": [pc.sum(b["n_bytes"]).as_py() or 0],
                    "fails": [pc.sum(pc.cast(pc.equal(b["status"], "parse_error"), "int64")).as_py() or 0],
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        n_docs = int(partials["docs"].sum())
        n_bytes = int(partials["bytes"].sum())
        n_fail = int(partials["fails"].sum())

        os.replace(tmp_dir, final_dir)
        manifest = {
            "input_path": path,
            "shard": shard_name,
            "parser_version": PARSER_VERSION,
            "row_range": [0, n_docs],
            "docs": n_docs,
            "bytes": n_bytes,
            "parse_failures": n_fail,
            "wall_sec": round(time.time() - t0, 3),
        }
        tmp_manifest = _manifest_path(out_dir, shard_name) + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_manifest, _manifest_path(out_dir, shard_name))
        totals["shards_done"] += 1
        totals["docs"] += n_docs
        totals["bytes"] += n_bytes
        totals["parse_failures"] += n_fail
    return totals
