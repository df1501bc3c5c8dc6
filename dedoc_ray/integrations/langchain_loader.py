"""LangChain-style document loader over the extraction pipeline.

Reference parity: dedoc's DedocFileLoader / DedocAPIFileLoader integration
(langchain-community wraps dedoc; SURVEY.md §2.10 "LangChain loader" row).
This loader is corpus-scale instead of per-file: it runs the Ray pipeline
over a pages dataset (or a parquet directory of Common-Crawl-style rows)
and yields one Document per row, streaming via ``iter_batches`` — the
loader is a driver-side CONSUMER by design, the extraction itself stays
distributed.

langchain is not installed in this container, so the loader falls back to
a minimal ``Document`` shim with the same (page_content, metadata) shape;
when langchain_core is importable the real class is used.
"""

from __future__ import annotations

from typing import Iterator, Optional

try:  # real langchain Document when available
    from langchain_core.documents import Document  # type: ignore
except ImportError:  # pragma: no cover - container has no langchain
    class Document:  # minimal shim, same constructor surface
        def __init__(self, page_content: str, metadata: Optional[dict] = None) -> None:
            self.page_content = page_content
            self.metadata = metadata or {}

        def __repr__(self) -> str:  # pragma: no cover
            return f"Document(page_content={self.page_content[:40]!r}, metadata={self.metadata})"


class DedocRayLoader:
    """Load extracted documents lazily from a pages dataset or parquet dir.

    >>> loader = DedocRayLoader("/path/to/pages_parquet")
    >>> for doc in loader.lazy_load():  # doctest: +SKIP
    ...     print(doc.metadata["url"], len(doc.page_content))
    """

    def __init__(self, source, config=None, batch_size: int = 64) -> None:
        self.source = source
        self.config = config
        self.batch_size = batch_size

    def _dataset(self):
        import ray.data as rd

        from dedoc_ray.pipeline.extract import extract_pages

        ds = self.source if hasattr(self.source, "map_batches") else rd.read_parquet(self.source)
        return extract_pages(ds, config=self.config)

    def lazy_load(self) -> Iterator[Document]:
        cols = ["url", "status", "format", "extracted_text", "metadata"]
        for batch in self._dataset().select_columns(cols).iter_batches(
            batch_size=self.batch_size, batch_format="pyarrow"
        ):
            rows = batch.to_pylist()
            for row in rows:
                meta = {"url": row["url"], "status": row["status"], "format": row["format"]}
                meta.update({k: v for k, v in (row["metadata"] or {}).items() if v})
                yield Document(page_content=row["extracted_text"], metadata=meta)

    def load(self):
        return list(self.lazy_load())
