"""PipelineConfig — the engine's knob surface, mirroring the reference's
``QueryParameters`` (dedoc/api/api_args.py:8-54).

Reference knobs that don't apply to the web-corpus engine are documented
rather than silently dropped:

- ``with_attachments`` / ``need_content_analysis``: rows carry their own
  bytes; archive/email members surface in the ``attachments`` column instead
  of recursive re-parsing (attachments_handler is request-scoped in the
  reference).
- ``pdf_with_text_layer``: our "auto" routes text-layer PDFs through the
  textlayer kernel and flags OCR-needing pages with a warning (the OCR stack
  — Tesseract/torch — is stubbed in this container; see readers/pdf.py).
- ``language`` / OCR params: OCR path stubbed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional


@dataclass(frozen=True)
class PipelineConfig:
    # structure (api_args.py: document_type / structure_type)
    document_type: str = "other"           # other | law | law_txt | tz | tz_txt | diploma | fintoc
    structure_type: str = "tree"          # "tree" | "linear"
    patterns: Optional[List[dict]] = None  # user patterns, see structure/patterns.py
    # trained line-type layer over the regex skeleton (reference pickled
    # XGBoost classifiers) — catches abbreviation/case variants ("Ст. 5.",
    # "ARTICLE 5") the strict patterns miss; structure/ml_classifier.py
    use_ml_line_classifier: bool = False

    # output (api_args.py: return_format) — consumed by pipeline.render
    return_format: str = "json"            # "json" | "html" | "plain_text" | "tree"

    # readers (api_args.py: delimiter / encoding / handle_invisible_table / pages)
    handle_invisible_table: bool = False
    need_content_analysis: bool = False    # parse archive members recursively
    with_attachments: bool = True          # emit the attachment manifest (reference defaults to false; the corpus queries consume manifests, so ours defaults on)
    return_base64: bool = False            # attachment payloads as base64 in the manifest (api_args return_base)
    recursion_deep_attachments: int = 10   # nested-attachment parse depth (api_args.py:19)
    need_header_footer_analysis: bool = False  # cross-page running header/footer drop (pdf)
    delimiter: Optional[str] = None        # csv
    encoding: Optional[str] = None         # txt/csv override
    pages: Optional[str] = None            # "first:last" per-document page slice (pdf)
    html_fields: Optional[List[str]] = None  # json keys whose values parse as HTML (api_args.py:45)
    # GROBID-shaped article service (reference article_reader.py:25-62):
    # when set, PDFs route through readers/grobid_client.py (bounded
    # in-flight, retry/backoff) and the TEI response is parsed natively
    article_service_url: str = ""

    # pdf routing (api_args.py: pdf_with_text_layer / fast detection / columns)
    pdf_with_text_layer: str = "auto"      # "auto" (classifier) | "true" (always) | "false" (OCR route) | "tabby"/"auto_tabby" (tables too)
    fast_textual_layer_detection: bool = False  # classify on a bounded text prefix
    is_one_column_document: str = "auto"   # "auto" (x-gap clustering) | "true" (skip column split)

    # OCR-domain knobs (language / binarization / orientation / gost frame /
    # table_type): the OCR stack is stubbed in this container (no
    # Tesseract/torch) — fields accepted for API parity, the OCR route
    # itself surfaces an explicit warning (readers/pdf.py).
    # need_pdf_table_analysis is REAL for the text-layer tabby route: false
    # skips table recognition (reference pdf_txtlayer_reader.py:49).
    language: str = "rus+eng"
    table_type: str = ""
    document_orientation: str = "auto"
    need_binarization: bool = False
    need_gost_frame_analysis: bool = False
    need_pdf_table_analysis: bool = True
    # trained paragraph-continuation merge over text-layer line geometry
    # (reference runs ScanParagraphClassifierExtractor inside the OCR
    # pipeline; here the text layer carries the same geometry)
    need_paragraph_analysis: bool = False

    # execution (ours: map_batches sizing — the reference has no corpus axis)
    batch_size: int = 64
    concurrency: Optional[object] = None   # int | (min, max) | None=autosize

    def validate(self) -> "PipelineConfig":
        if self.structure_type not in ("tree", "linear"):
            raise ValueError(f"structure_type must be tree|linear, got {self.structure_type!r}")
        if self.return_format not in ("json", "html", "plain_text", "tree"):
            raise ValueError(f"unknown return_format {self.return_format!r}")
        if self.pdf_with_text_layer not in ("auto", "true", "false", "tabby", "auto_tabby"):
            raise ValueError(f"pdf_with_text_layer must be auto|true|false|tabby|auto_tabby, got {self.pdf_with_text_layer!r}")
        if self.is_one_column_document not in ("auto", "true"):
            raise ValueError(f"is_one_column_document must be auto|true, got {self.is_one_column_document!r}")
        return self


def parse_pages(pages: Optional[str]):
    """'first:last' (1-based, inclusive, open ends allowed) → (start, stop)
    0-based slice — reference parameter_utils.py:111-129 semantics."""
    if not pages:
        return (0, None)
    first, _, last = pages.partition(":")
    start = int(first) - 1 if first.strip() else 0
    stop = int(last) if last.strip() else None
    return (max(0, start), stop)
