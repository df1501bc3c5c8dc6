"""Archive kernel (.zip / .tar / .tar.gz) — members become attachments only.

Reference: dedoc/readers/archive_reader/archive_reader.py:9-113 — archives
produce no lines/tables, only attachments (one per member). rar/7z need
external binaries the reference shells out to; here they raise BadArchive
(stubbed — the container has no unrar/7z).
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import List, Tuple

from dedoc_ray.readers.base import UnstructuredDoc


class BadArchive(ValueError):
    pass


def read_archive(data: bytes) -> UnstructuredDoc:
    attachments: List[Tuple[str, int]] = []
    if data[:4] == b"PK\x03\x04":
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                for info in zf.infolist():
                    if not info.is_dir():
                        attachments.append((info.filename, info.file_size))
        except zipfile.BadZipFile as e:
            raise BadArchive(f"bad zip: {e}") from e
    elif data[:6] == b"Rar!\x1a\x07":
        raise BadArchive("rar archives need the external unrar binary (stubbed)")
    elif data[:2] == b"7z":
        raise BadArchive("7z archives need the external 7z binary (stubbed)")
    else:
        try:
            with tarfile.open(fileobj=io.BytesIO(data)) as tf:
                for member in tf.getmembers():
                    if member.isfile():
                        attachments.append((member.name, member.size))
        except tarfile.TarError as e:
            raise BadArchive(f"bad tar: {e}") from e
    doc = UnstructuredDoc()
    doc.attachments = attachments
    doc.warnings = [f"archive with {len(attachments)} members"]
    return doc
