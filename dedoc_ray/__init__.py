"""dedoc_ray — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the query/data-processing capabilities of
ispras/dedoc (reference read at /root/reference) re-expressed as Ray Data
pipelines: ``ray.data.Dataset`` over Parquet shards of Common-Crawl-style web
pages, ``map_batches`` stages over zero-copy Arrow batches, actor pools for
stateful parser/classifier stages, explicit partitioning + per-partition
checkpoint manifests for 100 TB-scale runs.

Subpackages
-----------
core        in-kernel data model (Line/Annotation/HierarchyLevel/Table algebra)
readers     per-format byte kernels (html, txt, csv, json) + format sniffing
structure   pattern-based structure extraction + tree construction + flatten
pipeline    Ray Data pipeline assembly, Arrow schemas, checkpoint manifests
ops         corpus-scale operations: dedup, text analysis, ANN search
sources     deterministic synthetic page-corpus generation
"""

__version__ = "0.1.0"
