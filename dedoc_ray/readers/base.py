"""Reader output container — the per-document intermediate representation.

Mirrors the reference's ``UnstructuredDocument``
(dedoc/data_structures/unstructured_document.py:8-45): flat lines + tables +
warnings. Attachments are out of scope for the web corpus (rows carry their
own bytes; reference default ``with_attachments=false`` — api_args.py:17).
"""

from __future__ import annotations

from typing import List, Optional

from dedoc_ray.core.line import LineWithMeta
from dedoc_ray.core.table import Table


#: fixed metadata keys every reader may fill (reference
#: base_metadata_extractor.py:33 + per-format extractors)
METADATA_KEYS = ("title", "author", "created", "modified", "subject")


def attachment_uid(name: str, payload: bytes) -> str:
    """Deterministic analogue of the reference's ``attach_{uuid4}`` uid
    (abstract_office_attachments_extractor / attached_file.py) — md5 over
    name+payload so corpora replay bit-exact and attach annotations can
    point at the manifest row."""
    import hashlib

    return "attach_" + hashlib.md5(name.encode("utf-8", "replace") + b"\x00" + payload).hexdigest()


class UnstructuredDoc:
    __slots__ = ("lines", "tables", "warnings", "attachments", "metadata")

    def __init__(
        self,
        lines: Optional[List[LineWithMeta]] = None,
        tables: Optional[List[Table]] = None,
        warnings: Optional[List[str]] = None,
        attachments: Optional[List[tuple]] = None,
        metadata: Optional[dict] = None,
    ) -> None:
        self.lines = lines if lines is not None else []
        self.tables = tables if tables is not None else []
        self.warnings = warnings if warnings is not None else []
        # (name, size) pairs — the row-carried analogue of the reference's
        # AttachedFile temp files (attached_file.py)
        self.attachments = attachments if attachments is not None else []
        # document-level metadata columns (title/author/created/modified/
        # subject) always present; readers may add EXTRA keys (e.g. the
        # image metadata extractor's exif_image_width/height +
        # rotated_page_angles — reference base/image metadata extractors)
        self.metadata = {k: "" for k in METADATA_KEYS}
        if metadata:
            self.metadata.update(metadata)
