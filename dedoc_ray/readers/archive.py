"""Archive kernel (.zip / .tar / .tar.gz / .7z / .rar) — members become attachments.

Reference: dedoc/readers/archive_reader/archive_reader.py:9-113 — archives
produce no lines/tables, only attachments (one per member). The reference
shells out to external binaries for rar/7z; here BOTH are parsed NATIVELY:
.7z via readers/sevenzip.py (stdlib lzma) and .rar via readers/rar.py +
rar_decode.py (native RAR3/RAR5 LZ decompression, CRC32-verified; only
RAR3 PPMd blocks remain out of subset).
"""

from __future__ import annotations

import io
import tarfile
import zipfile
from typing import Callable, List, Optional, Tuple

from dedoc_ray.readers.base import UnstructuredDoc

# bound recursive member parsing: members beyond this are listed, not parsed
MAX_ANALYZED_MEMBERS = 16


class BadArchive(ValueError):
    pass


def _iter_members(data: bytes):
    """Yield (name, payload bytes) for each file member."""
    if data[:4] == b"PK\x03\x04":
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                for info in zf.infolist():
                    if not info.is_dir():
                        yield info.filename, zf.read(info)
        except zipfile.BadZipFile as e:
            raise BadArchive(f"bad zip: {e}") from e
    elif data[:6] == b"Rar!\x1a\x07":
        # NATIVE RAR reader (readers/rar.py + rar_decode.py): container
        # walk for both generations plus native LZ decompression (RAR5
        # methods 1-5, RAR3 v2.9 LZ with standard-filter recognition),
        # CRC32-verified. Only RAR3 PPMd blocks and non-standard RarVM
        # programs remain out of subset — those members stay listed with
        # empty payloads (reason in member.note)
        from dedoc_ray.readers.rar import BadRar, rar_list

        try:
            members = rar_list(data)
        except BadRar as e:
            raise BadArchive(f"bad rar: {e}") from e
        for m in members:
            if not m.is_dir:
                yield m.name, (m.payload if m.payload is not None else b"")
    elif data[:6] == b"7z\xbc\xaf\x27\x1c":
        # NATIVE 7z reader (readers/sevenzip.py): Copy/LZMA1/LZMA2 folders,
        # encoded headers, empty-stream bitfields — stdlib lzma, no binary
        from dedoc_ray.readers.sevenzip import Bad7z, sevenzip_decode

        try:
            yield from sevenzip_decode(data)
        except Bad7z as e:
            raise BadArchive(f"bad 7z: {e}") from e
    else:
        try:
            with tarfile.open(fileobj=io.BytesIO(data)) as tf:
                for member in tf.getmembers():
                    if member.isfile():
                        f = tf.extractfile(member)
                        yield member.name, (f.read() if f else b"")
        except tarfile.TarError as e:
            raise BadArchive(f"bad tar: {e}") from e


def read_archive(
    data: bytes,
    read_member: Optional[Callable[[str, bytes], UnstructuredDoc]] = None,
) -> UnstructuredDoc:
    """``read_member`` enables depth-1 content analysis (the reference's
    recursive attachments_handler.py:31-81, bounded to one level and
    MAX_ANALYZED_MEMBERS): each parseable member's lines join the document
    (page_id = member index); unparseable members are listed only."""
    attachments: List[Tuple[str, int]] = []
    lines = []
    tables = []
    warnings: List[str] = []
    analyzed = 0
    for idx, (name, payload) in enumerate(_iter_members(data)):
        attachments.append((name, len(payload), payload))
        if read_member is None or analyzed >= MAX_ANALYZED_MEMBERS:
            continue
        try:
            sub = read_member(name, payload)
        except Exception:
            warnings.append(f"member {name!r}: not parseable, listed only")
            continue
        analyzed += 1
        for line in sub.lines:
            line.metadata.page_id = idx
        for t in sub.tables:
            t.page_id = idx
        lines.extend(sub.lines)
        tables.extend(sub.tables)
    doc = UnstructuredDoc(lines=lines, tables=tables)
    doc.attachments = attachments
    doc.warnings = [f"archive with {len(attachments)} members"] + warnings
    if read_member is not None:
        doc.warnings.append(f"content analysis parsed {analyzed} members")
    return doc
