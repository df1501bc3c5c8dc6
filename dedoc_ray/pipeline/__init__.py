from dedoc_ray.pipeline.extract import extract_pages, run_extract_resumable
from dedoc_ray.pipeline.kernel import ExtractKernel
from dedoc_ray.pipeline.schemas import EXTRACTED_SCHEMA, PAGES_SCHEMA

__all__ = ["extract_pages", "run_extract_resumable", "ExtractKernel", "EXTRACTED_SCHEMA", "PAGES_SCHEMA"]
