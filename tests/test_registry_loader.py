"""Pluggable reader registry + LangChain-style loader tests."""

import pyarrow as pa
import pyarrow.parquet as pq

from dedoc_ray.core.line import LineWithMeta
from dedoc_ray.readers.base import UnstructuredDoc


def _upper_txt_reader(data: bytes) -> UnstructuredDoc:
    return UnstructuredDoc(lines=[LineWithMeta(data.decode("utf-8").upper() + "\n")])


def test_reader_registry_override():
    from dedoc_ray.pipeline.kernel import ExtractKernel

    k = ExtractKernel(readers={"txt": _upper_txt_reader})
    row = k.extract_row("https://x.test/a.txt", b"hello world")
    assert row["status"] == "ok"
    assert row["extracted_text"].startswith("HELLO WORLD")


def test_reader_registry_default_untouched():
    from dedoc_ray.pipeline.kernel import ExtractKernel

    row = ExtractKernel().extract_row("https://x.test/a.txt", b"hello world")
    assert row["extracted_text"].startswith("hello world")


def test_docx_media_attachments():
    from dedoc_ray.readers.office import read_docx
    from dedoc_ray.sources.synth_office import docx_bytes

    doc = read_docx(docx_bytes(10, "a the b"))
    assert doc.attachments == [("image1.png", 10 % 7 + 3, b"P" * (10 % 7 + 3))]


def test_langchain_loader_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from dedoc_ray.integrations.langchain_loader import DedocRayLoader
    from dedoc_ray.sources.synth import pages_batch

    docs_tbl = pa.Table.from_pydict(
        {
            "doc_id": pa.array([1, 2], "int64"),
            "text": pa.array(["alpha the beta", "gamma the delta"], "string"),
            "lang": pa.array(["en", "en"], "string"),
            "source": pa.array(["s", "s"], "string"),
        }
    )
    pages = pages_batch(docs_tbl)
    loader = DedocRayLoader(rd.from_arrow(pages))
    docs = loader.load()
    assert len(docs) == 2
    by_url = {d.metadata["url"]: d for d in docs}
    assert all(d.metadata["status"] == "ok" for d in docs)
    assert any("alpha" in d.page_content for d in docs)


def _rtf_to_txt_converter(data: bytes):
    """Converter for the registry test: rtf bytes → plain text bytes."""
    from dedoc_ray.readers.rtf import read_rtf

    text = "".join(l.line for l in read_rtf(data).lines)
    return "txt", text.encode()


def test_converter_registry():
    """ConverterComposition analogue: the converter runs BEFORE reading and
    rewrites (format, bytes) — here an RTF row re-routed through the txt
    reader (the hook a deployment points at soffice). Kernel-level like the
    reader-registry tests (module-level callables pickle into pool actors
    the same way readers do)."""
    from dedoc_ray.pipeline.kernel import ExtractKernel
    from dedoc_ray.sources.synth_office import rtf_bytes

    k = ExtractKernel(converters={"rtf": _rtf_to_txt_converter})
    row = k.extract_row("https://x.test/7.rtf", rtf_bytes(7, "alpha the beta"))
    assert row["format"] == "txt"
    assert row["status"] == "ok"
    assert row["extracted_text"].startswith("Document 7")
