"""The extraction kernel — the callable class passed to ``map_batches``.

One actor instance holds the compiled pattern composition and regexes
(built once in ``__init__``); ``__call__`` processes one Arrow batch of
corpus rows. The document loop is inherently row-at-a-time (a document's
DOM/tree is order-sensitive and row-scoped — SURVEY.md §7 risk 6); the
vectorization axis is the corpus: thousands of concurrent batch tasks,
not SIMD inside one document.

Errors never kill a block: every row gets status ok | bad_file |
parse_error with ``error_msg`` (reference raises DedocError per file —
dedoc_manager.py:73-81; we convert to error columns per SURVEY.md §1.3).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

from dedoc_ray.pipeline.config import PipelineConfig, parse_pages
from dedoc_ray.pipeline.schemas import EXTRACTED_SCHEMA
from dedoc_ray.readers.base import UnstructuredDoc
from dedoc_ray.readers.csv_reader import read_csv
from dedoc_ray.readers.html import read_html
from dedoc_ray.readers.json_reader import read_json
from dedoc_ray.readers.sniff import sniff_format
from dedoc_ray.readers.txt import read_txt
from dedoc_ray.structure.patterns import PatternComposition, default_patterns
from dedoc_ray.structure.tree import construct_tree, extract_structure, flatten_tree

_EMPTY_FLAT = {"extracted_text": "", "nodes": [], "annotations": []}

# mean open-font OCR match confidence below which a scanned row is classed
# status=low_confidence instead of ok (VERDICT r3: silent gibberish at 0.43
# poisons training data; the reference's Tesseract emits per-word conf the
# same way — ocr_line_extractor.py confidence fields)
OCR_CONFIDENCE_FLOOR = 0.5


class ExtractKernel:
    """sniff → per-format read → structure → tree → flatten, per row."""

    def __init__(
        self,
        handle_invisible_table: bool = False,
        patterns: Optional[PatternComposition] = None,
        config: Optional[PipelineConfig] = None,
        readers: Optional[Dict[str, object]] = None,
        converters: Optional[Dict[str, object]] = None,
    ) -> None:
        # pluggable reader registry (reference manager_config composition,
        # manager_config docs + dedoc_manager.py): map format → callable
        # bytes → UnstructuredDoc; entries override the built-in dispatch.
        # Callables must be module-level (pickled into each pool actor).
        self.readers: Dict[str, object] = dict(readers) if readers else {}
        # pluggable converter registry (reference ConverterComposition,
        # converter_composition.py:6-42): sniffed format → callable
        # bytes → (new_format, new_bytes), applied BEFORE reading — the
        # hook where a deployment plugs soffice/ddjvu when available.
        self.converters: Dict[str, object] = dict(converters) if converters else {}
        if config is None:
            config = PipelineConfig(handle_invisible_table=handle_invisible_table)
        self.config = config.validate()
        if patterns is not None:
            self.patterns = patterns
        elif config.patterns:
            from dedoc_ray.structure.patterns import patterns_from_dicts

            self.patterns = patterns_from_dicts(config.patterns)
        elif config.document_type != "other":
            from dedoc_ray.structure.domain import patterns_for_document_type

            self.patterns = PatternComposition(patterns_for_document_type(config.document_type))
        else:
            self.patterns = PatternComposition(default_patterns())
        self.handle_invisible_table = config.handle_invisible_table
        from dedoc_ray.structure.tree import construct_linear

        self.constructor = construct_tree if config.structure_type == "tree" else construct_linear
        self.pages = parse_pages(config.pages)
        # trained line-type layer (built ONCE per actor — weights are tiny
        # but the principle is model-in-__init__, reference pickled
        # classifiers are request-cached the same way)
        self.fintoc = None
        self.law_ml = None
        # external-service client built ONCE per actor (bounded in-flight,
        # retry/backoff — readers/grobid_client.py)
        self.grobid = None
        if config.article_service_url:
            from dedoc_ray.readers.grobid_client import GrobidClient

            self.grobid = GrobidClient(config.article_service_url)
        if config.document_type == "fintoc":
            from dedoc_ray.structure.ml_classifier import FintocTitleClassifier

            self.fintoc = FintocTitleClassifier()
        elif config.use_ml_line_classifier and config.document_type.startswith("law"):
            from dedoc_ray.structure.ml_classifier import LawLineClassifier

            self.law_ml = LawLineClassifier()
        elif config.use_ml_line_classifier and config.document_type.startswith("tz"):
            from dedoc_ray.structure.ml_classifier import TzLineClassifier

            self.law_ml = TzLineClassifier()
        elif config.use_ml_line_classifier and config.document_type == "diploma":
            from dedoc_ray.structure.ml_classifier import DiplomaLineClassifier

            self.law_ml = DiplomaLineClassifier()

    # --- per-document ------------------------------------------------------

    def read_document(self, fmt: str, data: bytes) -> UnstructuredDoc:
        if fmt in self.readers:
            return self.readers[fmt](data)
        if fmt == "html":
            return read_html(data, handle_invisible_table=self.handle_invisible_table)
        if fmt == "txt":
            return read_txt(data, encoding=self.config.encoding)
        if fmt == "csv":
            return read_csv(data, delimiter=self.config.delimiter, encoding=self.config.encoding)
        if fmt == "json":
            return read_json(data, html_fields=self.config.html_fields)
        if fmt == "pdf" and self.grobid is not None:
            # article route: PDF → GROBID-shaped service → TEI → native
            # parse (reference ArticleReader.read); service failures become
            # warning rows, never exceptions
            from dedoc_ray.readers.article import read_tei

            tei, warning = self.grobid.process(data)
            if tei is None:
                return UnstructuredDoc(lines=[], warnings=[warning])
            doc = read_tei(tei)
            return doc
        if fmt == "pdf":
            from dedoc_ray.readers.pdf import read_pdf_auto

            doc = read_pdf_auto(
                data,
                pages=self.pages,
                mode=self.config.pdf_with_text_layer,
                fast_detection=self.config.fast_textual_layer_detection,
                one_column=self.config.is_one_column_document == "true",
                table_analysis=self.config.need_pdf_table_analysis,
                merge_paragraphs=self.config.need_paragraph_analysis,
                gost_frame=self.config.need_gost_frame_analysis,
            )
            if self.pages != (0, None):
                # reference pdf_base_reader partial-slice surface
                # (test_api_format_pdf_page_limit.py:80-85): a warning plus
                # first_page/last_page in metadata
                doc.warnings.append("The document is partially parsed")
                doc.metadata = dict(doc.metadata or {})
                doc.metadata["first_page"] = self.pages[0]
                doc.metadata["last_page"] = self.pages[1]
            return doc
        if fmt == "docx":
            from dedoc_ray.readers.office import read_docx

            doc = read_docx(data)
            # the reader's line text is reference-exact (conditional trailing
            # newline — docx_reader.py:37-54 __fix_lines); the flat corpus
            # text keeps one separator per paragraph, like json2txt's
            # per-node "\n" (api_utils.py:271-275)
            for ln in doc.lines:
                if not ln.line.endswith("\n"):
                    ln.line += "\n"
            return doc
        if fmt == "xlsx":
            from dedoc_ray.readers.office import read_xlsx

            return read_xlsx(data)
        if fmt == "pptx":
            from dedoc_ray.readers.office import read_pptx

            return read_pptx(data)
        if fmt == "odt":
            from dedoc_ray.readers.odt import read_odt

            return read_odt(data)
        if fmt == "ods":
            from dedoc_ray.readers.odt import read_ods

            return read_ods(data)
        if fmt == "odp":
            from dedoc_ray.readers.odt import read_odp

            return read_odp(data)
        if fmt == "rtf":
            from dedoc_ray.readers.rtf import read_rtf

            return read_rtf(data)
        if fmt == "doc":
            from dedoc_ray.readers.legacy_office import read_doc

            return read_doc(data)
        if fmt == "xls":
            from dedoc_ray.readers.legacy_office import read_xls

            return read_xls(data)
        if fmt == "ppt":
            from dedoc_ray.readers.legacy_office import read_ppt

            return read_ppt(data)
        if fmt == "article":
            from dedoc_ray.readers.article import read_tei

            return read_tei(data)
        if fmt == "djvu":
            from dedoc_ray.readers.djvu import read_djvu

            return read_djvu(data)
        if fmt == "note":
            from dedoc_ray.readers.note import read_note

            return read_note(data)
        if fmt == "pgm":
            from dedoc_ray.readers.scan_ocr import read_scan

            return read_scan(data, orientation=self.config.document_orientation)
        if fmt == "eml":
            from dedoc_ray.readers.email_reader import read_eml

            doc = read_eml(data)
            # reader lines are reference-exact (header-field lines carry no
            # newline — email_reader.py __get_field); the flat corpus text
            # keeps one separator per line, like json2txt's per-node "\n"
            for ln in doc.lines:
                if not ln.line.endswith("\n"):
                    ln.line += "\n"
            return doc
        if fmt == "mhtml":
            from dedoc_ray.readers.email_reader import read_mhtml

            return read_mhtml(data)
        if fmt == "archive":
            from dedoc_ray.readers.archive import read_archive

            if self.config.need_content_analysis:
                max_depth = self.config.recursion_deep_attachments

                def read_member(name: str, payload: bytes, depth: int = 1) -> UnstructuredDoc:
                    sub_fmt = sniff_format(f"https://member/{name}", payload)
                    if sub_fmt == "bad_file":
                        raise ValueError("member not parseable")
                    if sub_fmt == "archive":
                        # nested archives recurse up to recursion_deep_attachments
                        # (reference attachments_handler.py:31-81 depth bound)
                        if depth >= max_depth:
                            raise ValueError("max attachment recursion depth")
                        return read_archive(
                            payload, read_member=lambda n, p: read_member(n, p, depth + 1)
                        )
                    return self.read_document(sub_fmt, payload)

                return read_archive(data, read_member=read_member)
            return read_archive(data)
        raise ValueError(f"unsupported format: {fmt}")

    def extract_row(
        self, url: str, data: bytes, attachment_sink: Optional[list] = None
    ) -> Dict[str, object]:
        fmt = sniff_format(url, data)
        if fmt in self.converters:
            fmt, data = self.converters[fmt](data)
        out: Dict[str, object] = {
            "status": "ok",
            "format": fmt,
            "extracted_text": "",
            "nodes": [],
            "annotations": [],
            "tables": [],
            "attachments": [],
            "metadata": {k: "" for k in ("title", "author", "created", "modified", "subject")},
            "warnings": [],
            "error_msg": "",
            "ocr_conf": None,
        }
        if fmt == "bad_file":
            out["status"] = "bad_file"
            out["error_msg"] = "unrecognized format"
            return out
        try:
            doc = self.read_document(fmt, data)
            if self.config.need_header_footer_analysis and fmt == "pdf":
                # header/footer removal BEFORE table linking — a table ref
                # anchored on a removed header line would vanish (reference
                # pdf_base_reader order)
                from dedoc_ray.readers.header_footer import remove_headers_footers

                doc.lines, hf_warnings = remove_headers_footers(doc.lines)
                doc.warnings.extend(hf_warnings)
            if fmt in ("pdf", "docx") and doc.tables:
                from dedoc_ray.core.object_linker import link_line_objects
                from dedoc_ray.core.table import merge_multipage_tables

                if fmt == "pdf":
                    # reference merges page-spanning tables before linking
                    # (pdf_base_reader.py:140)
                    doc.tables = merge_multipage_tables(doc.tables)
                if not doc.lines:
                    # table-only document: synthesize an empty carrier line
                    # so the refs surface in the tree (reference structure
                    # always exposes subparagraphs[0] with the annotation,
                    # test_pdf_with_only_table)
                    from dedoc_ray.core.line import LineMetadata, LineWithMeta

                    doc.lines = [LineWithMeta("", metadata=LineMetadata(page_id=0, line_id=0), uid="table_carrier")]
                link_line_objects(doc.lines, doc.tables)
            if self.config.document_type in ("law", "law_txt") and fmt == "txt":
                from dedoc_ray.structure.domain import law_preprocess_txt_lines

                # З А К О Н → ЗАКОН etc. (reference txt-route preprocess)
                doc.lines = law_preprocess_txt_lines(doc.lines)
            if self.fintoc is not None:
                lines = self.fintoc.apply(doc.lines)
            elif self.law_ml is not None:
                lines = self.law_ml.apply(doc.lines)
            elif self.config.document_type in ("law", "law_txt") and not self.config.patterns:
                # dynamic law-vs-foiv routing from the document "hat"
                # (reference ClassifyingLawStructureExtractor.extract)
                from dedoc_ray.structure.domain import law_route_for_lines

                route_patterns, route_warning = law_route_for_lines([ln.line for ln in doc.lines])
                lines = extract_structure(doc.lines, PatternComposition(route_patterns))
                doc.warnings.append(route_warning)
            else:
                lines = extract_structure(doc.lines, self.patterns)
            if self.config.document_type in ("law", "law_txt"):
                from dedoc_ray.structure.domain import law_shape

                # root(hat) → body → units, applications as body siblings
                # (reference law tree contract, test_api_doctype_law.py);
                # runs BEFORE the prefix split, like the reference's
                # builders-then-_postprocess_lines order
                lines = law_shape(lines)
            elif self.config.document_type in ("tz", "tz_txt"):
                from dedoc_ray.structure.domain import tz_shape

                # root(header) → toc → toc_items, one body node for units
                # (reference tz tree contract, test_api_doctype_tz.py)
                lines = tz_shape(lines)
            elif self.config.document_type == "diploma":
                from dedoc_ray.structure.domain import diploma_shape

                # root(hat) → body, toc, named_item siblings
                # (reference diploma tree, test_api_doctype_diploma.py)
                lines = diploma_shape(lines)
            if self.config.document_type != "other":
                from dedoc_ray.structure.postprocess import split_for_document_type

                # item/subitem prefix splitting — reference concrete domain
                # extractors only (abstract_structure_extractor.py:41-113)
                lines = split_for_document_type(self.config.document_type, lines)
            root = self.constructor(lines)
            flat = flatten_tree(root)
            out.update(flat)
            out["warnings"] = doc.warnings
            if attachment_sink is not None:
                # raw (name, size, payload) tuples for the manager-level
                # recursive attachments handler (reference
                # attachments_handler.py:31-81 lives ABOVE the readers).
                # PDF additionally surfaces PAINTED page images first —
                # reference order: attached images, then embedded files +
                # notes (pdf_tabby_reader.py:72-79). Manager surface only:
                # the corpus manifest keeps embedded FILES, not rasters.
                if fmt == "pdf":
                    from dedoc_ray.readers.pdf_attachments import extract_pdf_drawn_images

                    try:
                        attachment_sink.extend(extract_pdf_drawn_images(data))
                    except Exception:
                        pass
                attachment_sink.extend(doc.attachments)
            if self.config.with_attachments:
                import base64 as _b64

                from dedoc_ray.readers.base import attachment_uid

                out["attachments"] = [
                    {"name": t[0], "size": t[1],
                     "uid": attachment_uid(t[0], t[2] if len(t) > 2 else b""),
                     "base64": (_b64.b64encode(t[2]).decode() if self.config.return_base64 and len(t) > 2 else "")}
                    for t in doc.attachments
                ]
            else:  # reference default: attachments only on request (api_args.py with_attachments)
                out["attachments"] = []
            out["metadata"] = doc.metadata
            conf = (doc.metadata or {}).get("ocr_confidence") if isinstance(doc.metadata, dict) else None
            if conf is not None:
                out["ocr_conf"] = float(conf)
                if float(conf) < OCR_CONFIDENCE_FLOOR:
                    # the read is kept (the reference ships Tesseract's read
                    # regardless) but classed so pipelines can gate — a 0.43
                    # gibberish scan must not pass as ok training text
                    out["status"] = "low_confidence"
            out["tables"] = [
                {
                    "page_id": t.page_id,
                    "uid": t.uid,
                    "cells": [
                        [
                            {
                                "text": c.get_text(),
                                "colspan": c.colspan,
                                "rowspan": c.rowspan,
                                "invisible": c.invisible,
                                # reference CellWithMeta shape: per-line
                                # annotations ride the cell (pinned by
                                # test_api_format_html.test_html_table_with_styles).
                                # Populated only when annotations exist —
                                # plain cells already carry their text, and
                                # the empty-list fast path keeps the corpus
                                # blocks' schema cheap to hash/serialize.
                                "lines": (
                                    [
                                        {
                                            "text": ln.line,
                                            "annotations": [
                                                {"name": a.name, "value": a.value,
                                                 "start": a.start, "end": a.end}
                                                for a in ln.annotations
                                            ],
                                        }
                                        for ln in c.lines
                                    ]
                                    if any(ln.annotations for ln in c.lines)
                                    else []
                                ),
                            }
                            for c in row
                        ]
                        for row in t.cells
                    ],
                }
                for t in doc.tables
            ]
        except Exception as e:  # deterministic parse failure → error columns, no retry
            out["status"] = "parse_error"
            out["error_msg"] = f"{type(e).__name__}: {e}"[:500]
            out.update(_EMPTY_FLAT)
            out["tables"] = []
            out["attachments"] = []
        return out

    # --- per-batch ---------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        payloads = batch["html"].to_pylist()
        langs = batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
        shards = batch["shard"].to_pylist() if "shard" in batch.column_names else [0] * len(urls)

        cols: Dict[str, List] = {name: [] for name in EXTRACTED_SCHEMA.names}
        for url, data, lang, shard in zip(urls, payloads, langs, shards):
            data = data if data is not None else b""
            row = self.extract_row(url, data)
            cols["url"].append(url)
            cols["lang"].append(lang)
            cols["shard"].append(shard)
            cols["status"].append(row["status"])
            cols["format"].append(row["format"])
            cols["extracted_text"].append(row["extracted_text"])
            cols["nodes"].append(row["nodes"])
            cols["annotations"].append(row["annotations"])
            cols["tables"].append(row["tables"])
            cols["attachments"].append(row["attachments"])
            cols["metadata"].append(row["metadata"])
            cols["warnings"].append(row["warnings"])
            cols["error_msg"].append(row["error_msg"])
            cols["ocr_conf"].append(row.get("ocr_conf"))
            cols["n_nodes"].append(len(row["nodes"]))
            cols["n_tables"].append(len(row["tables"]))
            cols["n_bytes"].append(len(data))
        out = pa.Table.from_pydict(cols, schema=EXTRACTED_SCHEMA)
        # passthrough: lineage columns riding the pages table (e.g. warc_ts,
        # crawl id) survive extraction — row order is preserved 1:1.
        for name in batch.column_names:
            if name not in ("url", "html", "lang", "shard") and name not in out.column_names:
                out = out.append_column(name, batch[name])
        return out
