#!/usr/bin/env python
"""Resumable extraction job driver — the ``ray job submit`` entry point.

    python scripts/run_job.py --input '/data/pages/shard_*.parquet' \
        --out /tmp/extracted [--batch-size 64] [--concurrency N] \
        [--giant-row-bytes 1048576]

Per-shard checkpointing (pipeline/extract.py::run_extract_resumable): each
input shard writes to ``<out>/<shard>.tmp`` then atomically renames and
commits a manifest with lineage (input path, parser version) and counters
(docs, bytes, parse failures). Re-running after a kill skips committed
shards — submit the same command again and it resumes.

Owns its Ray session (init/shutdown), unlike __ray_entry__.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="glob of input parquet shards")
    ap.add_argument("--out", required=True, help="output directory (one subdir + manifest per shard)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--concurrency", type=int, default=None)
    ap.add_argument("--giant-row-bytes", type=int, default=None,
                    help="route rows above this size to the straggler-isolation pool")
    ap.add_argument("--num-cpus", type=int, default=None, help="local testing only; omit on a cluster")
    args = ap.parse_args()

    shards = sorted(glob.glob(args.input))
    if not shards:
        print(f"no shards match {args.input!r}", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        init_kwargs = {"include_dashboard": False}
        if args.num_cpus is not None:
            init_kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**init_kwargs)
    try:
        from dedoc_ray.pipeline.extract import run_extract_resumable

        totals = run_extract_resumable(
            shards,
            args.out,
            batch_size=args.batch_size,
            concurrency=args.concurrency,
            giant_row_bytes=args.giant_row_bytes,
        )
        print(json.dumps(totals))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    sys.exit(main())
