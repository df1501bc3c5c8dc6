"""Manager-level recursive attachments handler.

Mirrors the reference's AttachmentsHandler (dedoc/attachments_handler/
attachments_handler.py:31-104): readers emit raw attachment payloads;
ABOVE the readers, each attachment becomes a full ParsedDocument-shaped
dict — recursively parsed when ``need_content_analysis`` is set (depth
bounded by ``recursion_deep_attachments``), metadata-only otherwise.

This layer is deliberately single-document (it serves the manager / HTTP
facade). The corpus pipeline keeps its flat attachment MANIFEST columns
(name/size/uid) — shipping recursively parsed documents inside Ray rows
would bloat the object store at 100 TB for data most queries never read.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

from dedoc_ray.readers.base import attachment_uid

# magic-number / extension → mime, reference get_file_mime_type semantics
# (dedoc/utils/utils.py via libmagic). Magic wins; extension breaks ties.
_EXT_MIME = {
    "txt": "text/plain",
    "csv": "text/csv",
    "tsv": "text/tab-separated-values",
    "html": "text/html",
    "htm": "text/html",
    "xml": "application/xml",
    "json": "application/json",
    "pdf": "application/pdf",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "bmp": "image/bmp",
    "tiff": "image/tiff",
    "tif": "image/tiff",
    "webp": "image/webp",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "doc": "application/msword",
    "xls": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    "rtf": "application/rtf",
    "zip": "application/zip",
    "rar": "application/x-rar",
    "7z": "application/x-7z-compressed",
    "tar": "application/x-tar",
    "gz": "application/gzip",
    "eml": "message/rfc822",
    "djvu": "image/vnd.djvu",
}


def mime_of(name: str, payload: bytes) -> str:
    """Content-sniffed mime with extension fallback (reference uses libmagic
    from_file; same outcome for the formats the fixtures exercise)."""
    p = payload or b""
    if p.startswith(b"%PDF"):
        return "application/pdf"
    if p.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if p.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if p.startswith((b"GIF87a", b"GIF89a")):
        return "image/gif"
    if p.startswith(b"BM") and len(p) > 14:
        return "image/bmp"
    if p.startswith((b"II*\x00", b"MM\x00*")):
        return "image/tiff"
    if p.startswith(b"{\\rtf"):
        return "application/rtf"
    if p.startswith(b"Rar!"):
        return "application/x-rar"
    if p.startswith(b"7z\xbc\xaf\x27\x1c"):
        return "application/x-7z-compressed"
    ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
    if p.startswith(b"PK\x03\x04"):
        # OOXML / ODF containers keep their extension mime; bare zip otherwise
        return _EXT_MIME.get(ext, "application/zip")
    if ext in _EXT_MIME:
        if ext == "json":
            try:
                json.loads(p.decode("utf-8", errors="strict"))
            except Exception:
                return "text/plain"
        return _EXT_MIME[ext]
    # textual payloads without a known extension
    try:
        p[:4096].decode("utf-8")
        return "text/plain"
    except Exception:
        return "application/octet-stream"


def empty_parsed_document(file_name: str) -> Dict[str, object]:
    """The reference's __get_empty_document analogue
    (attachments_handler.py:86-104 + utils.get_empty_content): metadata
    carrier with an empty root structure."""
    return {
        "file_name": file_name,
        "status": "ok",
        "error_msg": "",
        "content": {
            "structure": {
                "node_id": "0",
                "text": "",
                "annotations": [],
                "metadata": {"paragraph_type": "root"},
                "subparagraphs": [],
            },
            "tables": [],
        },
        "extracted_text": "",
        "metadata": {},
        "attachments": [],
        "warnings": [],
    }


def handle_attachments(
    manager,
    raw: List[tuple],
    parameters: Optional[Dict[str, object]],
    *,
    need_content_analysis: bool,
    recursion_deep_attachments: int,
) -> List[Dict[str, object]]:
    """raw (name, size, payload) tuples → list of ParsedDocument dicts.

    Recursion contract = reference attachments_handler.py:47-83: depth
    decrements per level and stops the whole handler below zero; parse
    failures degrade to the metadata-only empty document, never raise."""
    out: List[Dict[str, object]] = []
    depth_left = recursion_deep_attachments - 1
    if depth_left < 0:
        return out
    attachments_dir = (parameters or {}).get("attachments_dir") or None
    for t in raw:
        name = str(t[0])
        size = int(t[1]) if len(t) > 1 else 0
        payload = t[2] if len(t) > 2 and isinstance(t[2], (bytes, bytearray)) else b""
        base = os.path.basename(name.rstrip("/"))
        if not base:  # TLDR-185 parity: nameless attachments are skipped
            continue
        parsed: Optional[Dict[str, object]] = None
        if need_content_analysis and payload:
            sub_params = dict(parameters or {})
            sub_params["recursion_deep_attachments"] = str(depth_left)
            try:
                parsed = manager.parse(data=bytes(payload), file_name=base, parameters=sub_params)
            except Exception:
                parsed = None
            if parsed is not None and parsed.get("status") != "ok":
                parsed = None  # DedocError → empty document, reference :78-80
        if parsed is None:
            parsed = empty_parsed_document(base)
        meta = dict(parsed.get("metadata") or {})
        meta["file_name"] = base
        meta["temporary_file_name"] = base
        meta["size"] = size if size else len(payload)
        meta["file_type"] = mime_of(base, bytes(payload))
        meta["uid"] = attachment_uid(name, bytes(payload))
        raw64 = (parameters or {}).get("return_base64", False)
        if raw64 is True or str(raw64).strip().lower() in ("true", "1"):
            # reference metadata_extractor adds base64_encode for attachments
            # when return_base64 is set (test_docx_images_base64)
            import base64

            meta["base64_encode"] = base64.b64encode(bytes(payload)).decode()
        if attachments_dir:
            # reference attachments_dir contract (attachments_handler.py:15):
            # payloads land in the caller's directory; temporary_file_name is
            # the on-disk name (uid-prefixed — deterministic, collision-free)
            disk_name = f"{meta['uid']}_{base}"
            try:
                with open(os.path.join(str(attachments_dir), disk_name), "wb") as fh:
                    fh.write(bytes(payload))
                meta["temporary_file_name"] = disk_name
            except OSError:
                pass
        parsed["metadata"] = meta
        parsed["file_name"] = base
        # manifest-compat aliases (the corpus rows and pre-round-3 manager
        # output exposed name/size/uid flat; keep both addressable)
        parsed["name"] = base
        parsed["uid"] = meta["uid"]
        parsed["size"] = meta["size"]
        out.append(parsed)
    return out
