from dedoc_ray.sources.synth import pages_batch, synth_pages_dataset, write_pages_parquet

__all__ = ["pages_batch", "synth_pages_dataset", "write_pages_parquet"]
