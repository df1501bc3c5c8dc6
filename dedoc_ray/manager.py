"""DedocRayManager — the single-document convenience facade.

The reference's primary user API is ``DedocManager().parse(file_path,
parameters)`` (reference dedoc_manager.py:60-82): convert → read →
extract metadata → extract structure → construct → handle attachments,
returning a ParsedDocument. This facade runs the SAME kernel the corpus
pipeline uses (``pipeline/kernel.py::ExtractKernel`` — one warm instance
held by the manager, exactly like one actor of the corpus pool) on one
file, so single-doc and 100 TB results are identical by construction.

Differences from the reference, by design:
- parse() never raises for bad/unparseable files — it returns the same
  status/error_msg columns the corpus rows carry (SURVEY.md §1.3); a
  missing path still raises FileNotFoundError (caller bug, reference
  parity dedoc_manager.py:97).
- No Ray here: one document is below the distribution grain. Corpus
  work goes through ``pipeline/extract.py``.

Parameters accept the reference's QueryParameters string forms
("true"/"false", "first:last" pages, etc.)."""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

from dedoc_ray.pipeline.config import PipelineConfig
from dedoc_ray.pipeline.kernel import ExtractKernel
from dedoc_ray.pipeline.render import render_html, render_tree, render_txt

_BOOL_FIELDS = {
    f.name for f in dataclasses.fields(PipelineConfig) if f.type in ("bool", bool)
}
_INT_FIELDS = {
    f.name for f in dataclasses.fields(PipelineConfig) if f.type in ("int", int)
}


def config_from_params(parameters: Optional[Dict[str, object]]) -> PipelineConfig:
    """QueryParameters-style string dict → PipelineConfig (unknown keys are
    ignored like the reference's tolerant arg parsing)."""
    kwargs: Dict[str, object] = {}
    known = {f.name for f in dataclasses.fields(PipelineConfig)}
    for key, val in (parameters or {}).items():
        if key not in known:
            continue
        if key in _BOOL_FIELDS and isinstance(val, str):
            kwargs[key] = val.strip().lower() == "true"
        elif key in _INT_FIELDS and isinstance(val, str):
            kwargs[key] = int(val)
        else:
            kwargs[key] = val
    return PipelineConfig(**kwargs).validate()


class DedocRayManager:
    """Warm-kernel single-document parser mirroring the reference manager."""

    def __init__(self, manager_config: Optional[Dict[str, object]] = None) -> None:
        # manager_config mirrors the reference's pluggable composition:
        # {"readers": {fmt: callable}, "converters": {fmt: callable}}
        self._manager_config = dict(manager_config or {})
        self._kernel_cache: Dict[str, ExtractKernel] = {}

    def _kernel(self, config: PipelineConfig) -> ExtractKernel:
        key = repr(config)
        if key not in self._kernel_cache:
            self._kernel_cache[key] = ExtractKernel(
                config=config,
                readers=self._manager_config.get("readers"),
                converters=self._manager_config.get("converters"),
            )
        return self._kernel_cache[key]

    def parse(
        self,
        file_path: Optional[str] = None,
        parameters: Optional[Dict[str, object]] = None,
        data: Optional[bytes] = None,
        file_name: Optional[str] = None,
    ) -> Dict[str, object]:
        """Parse one document from a path or raw bytes.

        Returns the ParsedDocument-shaped dict: ``content`` (structure tree
        + tables per return_format), ``metadata``, ``attachments``,
        ``warnings``, ``status``/``error_msg``, plus the rendered
        ``extracted_text``."""
        if data is None:
            if file_path is None:
                raise ValueError("parse() needs file_path or data")
            if not os.path.isfile(file_path):
                raise FileNotFoundError(file_path)
            with open(file_path, "rb") as f:
                data = f.read()
            file_name = file_name or os.path.basename(file_path)
        config = config_from_params(parameters)
        # the manager surface follows the REFERENCE default (api_args.py:17):
        # attachments only on explicit request — unlike the corpus kernels,
        # whose manifest defaults on. Recursive content analysis happens
        # HERE (attachments.py), never inside the kernel, so the parent
        # archive document keeps its reference-empty content.
        raw_with = (parameters or {}).get("with_attachments", False)
        want_attachments = (
            raw_with is True or str(raw_with).strip().lower() in ("true", "1")
        )
        kernel = self._kernel(dataclasses.replace(config, need_content_analysis=False))
        sink: Optional[list] = [] if want_attachments else None
        row = kernel.extract_row(file_name or "document", data, attachment_sink=sink)
        if want_attachments:
            from dedoc_ray.attachments import handle_attachments

            attachments = handle_attachments(
                self,
                sink,
                parameters,
                need_content_analysis=config.need_content_analysis,
                recursion_deep_attachments=config.recursion_deep_attachments,
            )
        else:
            attachments = []

        if config.return_format == "html":
            content: object = render_html(row)
        elif config.return_format == "plain_text":
            content = render_txt(row)
        else:  # "json" | "tree"
            content = render_tree(row)["content"]
        return {
            "version": __import__("dedoc_ray").__version__,
            "file_name": file_name or (os.path.basename(file_path) if file_path else ""),
            "status": row["status"],
            "error_msg": row["error_msg"],
            "content": content,
            "extracted_text": row["extracted_text"],
            "metadata": row["metadata"],
            "attachments": attachments,
            "warnings": list(row["warnings"]),
        }
