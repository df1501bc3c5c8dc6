#!/usr/bin/env python
"""Per-operator Ray Data stats for the flagship extraction pipeline.

    python scripts/stats_report.py [sf_dir] [repeat] [num_cpus]

Prints each operator's wall time, remote cpu time, rows and per-row cost —
the evidence loop for 'wall-time dominated by useful compute' tuning
(e.g. this is how the conc=30 read-starvation and the driver-side
iter_batches throttling were found; see BASELINE.md config notes).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    try:
        from dedoc_ray.pipeline.extract import extract_pages
        from dedoc_ray.sources.synth import pages_batch

        paths = [os.path.join(sf_dir, "documents.parquet")] * repeat
        pages = rd.read_parquet(paths, columns=["doc_id", "text", "lang", "source"]).map_batches(
            pages_batch, batch_format="pyarrow"
        )
        ex = extract_pages(pages).select_columns(["url", "status", "n_bytes"])
        t0 = time.time()
        n = 0
        # consume THIS dataset (count() builds a separate aggregate plan and
        # the stats would attach there, not here)
        for batch in ex.iter_batches(batch_format="pyarrow", batch_size=8192):
            n += batch.num_rows
        wall = time.time() - t0
        print(f"rows={n}  wall={wall:.2f}s  docs/s={n / wall:.0f}  num_cpus={num_cpus}\n")

        stats = ex.stats()
        for block in re.split(r"\n(?=Operator )", stats):
            name_m = re.match(r"Operator \d+ (\S+)", block)
            if not name_m:
                continue
            wall_m = re.search(r"in ([\d.]+)s", block)
            cpu_m = re.search(r"Remote cpu time:.*?([\d.]+)(ms|us|s) total", block)
            rows_m = re.search(r"Output num rows per block:.*?(\d+) total", block)
            name = name_m.group(1)[:60]
            op_wall = float(wall_m.group(1)) if wall_m else 0.0
            op_cpu = float(cpu_m.group(1)) * {"s": 1.0, "ms": 1e-3, "us": 1e-6}[cpu_m.group(2)] if cpu_m else 0.0
            op_rows = int(rows_m.group(1)) if rows_m else 0
            per_row_us = op_cpu / op_rows * 1e6 if op_rows else 0.0
            print(f"{name:60} wall={op_wall:7.2f}s  cpu={op_cpu:8.2f}s  rows={op_rows:8d}  {per_row_us:7.1f}us/row")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
