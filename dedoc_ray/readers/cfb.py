"""Compound File Binary (OLE2) container parser — the outer envelope of the
legacy Office formats (.doc/.xls/.ppt) that the reference handles by
shelling out to soffice (dedoc/converters/concrete_converters/
docx_converter.py:13-27 et al.). No external binary exists in this
environment, so — like the native odt/rtf readers — we parse the container
directly from the public [MS-CFB] layout: 512-byte header, DIFAT→FAT sector
chains, 128-byte directory entries, and the 64-byte mini-sector stream for
payloads under the 4096-byte cutoff.

Pure stdlib (struct over bytes); one instance parses one document inside a
map_batches kernel — nothing here touches Ray.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC


class BadCfbFile(ValueError):
    pass


class DirEntry:
    __slots__ = ("name", "obj_type", "start", "size", "sid")

    def __init__(self, name: str, obj_type: int, start: int, size: int, sid: int) -> None:
        self.name = name
        self.obj_type = obj_type
        self.start = start
        self.size = size
        self.sid = sid


class CfbFile:
    """Read-only CFB container: ``streams()`` lists stream names,
    ``stream(name)`` returns a stream's bytes (regular or mini chain)."""

    def __init__(self, data: bytes) -> None:
        if len(data) < 512 or data[:8] != MAGIC:
            raise BadCfbFile("not a CFB file")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        # [MS-CFB]: v3 files use 512-byte sectors, v4 4096; mini sectors 64.
        # Anything else is corruption — fail closed before any arithmetic.
        if self.sector_shift not in (9, 12) or self.mini_shift != 6:
            raise BadCfbFile(f"invalid sector shifts {self.sector_shift}/{self.mini_shift}")
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        self._max_sid = max((len(data) - 512) // self.sector_size, 0)
        (self.n_fat_sectors,) = struct.unpack_from("<I", data, 44)
        (self.first_dir_sector,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.first_minifat_sector,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat_sectors,) = struct.unpack_from("<I", data, 64)
        (self.first_difat_sector,) = struct.unpack_from("<I", data, 68)
        (self.n_difat_sectors,) = struct.unpack_from("<I", data, 72)
        self.fat = self._read_fat()
        self.minifat = self._read_minifat()
        self.entries = self._read_directory()
        self._mini_stream = self._load_mini_stream()

    # ------------------------------------------------------------ sectors

    def _sector(self, sid: int) -> bytes:
        if sid >= self._max_sid + 1 or sid < 0:
            # corrupt chain pointing past EOF: fail soft with a zero sector
            return b"\x00" * self.sector_size
        off = 512 + sid * self.sector_size
        if off + self.sector_size > len(self.data):
            # tolerate a truncated final sector (common in the wild)
            return self.data[off:].ljust(self.sector_size, b"\x00")
        return self.data[off : off + self.sector_size]

    def _read_fat(self) -> List[int]:
        # DIFAT: first 109 entries live in the header; overflow sectors chain.
        difat: List[int] = list(struct.unpack_from("<109I", self.data, 76))
        sid = self.first_difat_sector
        per = self.sector_size // 4 - 1
        seen = 0
        while sid not in (ENDOFCHAIN, FREESECT) and seen < self.n_difat_sectors:
            sec = self._sector(sid)
            vals = struct.unpack(f"<{per + 1}I", sec)
            difat.extend(vals[:-1])
            sid = vals[-1]
            seen += 1
        fat: List[int] = []
        for fsid in difat:
            if fsid in (FREESECT, ENDOFCHAIN):
                continue
            fat.extend(struct.unpack(f"<{self.sector_size // 4}I", self._sector(fsid)))
        return fat

    def _chain(self, start: int, fat: List[int]) -> List[int]:
        chain: List[int] = []
        sid = start
        limit = len(fat) + 2
        while sid not in (ENDOFCHAIN, FREESECT) and len(chain) < limit:
            chain.append(sid)
            if sid >= len(fat):
                break
            sid = fat[sid]
        return chain

    def _read_minifat(self) -> List[int]:
        out: List[int] = []
        for sid in self._chain(self.first_minifat_sector, self.fat):
            out.extend(struct.unpack(f"<{self.sector_size // 4}I", self._sector(sid)))
        return out

    # ---------------------------------------------------------- directory

    def _read_directory(self) -> List[DirEntry]:
        raw = b"".join(self._sector(s) for s in self._chain(self.first_dir_sector, self.fat))
        entries: List[DirEntry] = []
        for i in range(len(raw) // 128):
            ent = raw[i * 128 : (i + 1) * 128]
            (name_len,) = struct.unpack_from("<H", ent, 64)
            if name_len < 2 or name_len > 64:
                continue
            name = ent[: name_len - 2].decode("utf-16-le", errors="replace")
            obj_type = ent[66]
            (start,) = struct.unpack_from("<I", ent, 116)
            (size,) = struct.unpack_from("<Q", ent, 120)
            if self.sector_shift == 9:
                size &= 0xFFFFFFFF  # v3: upper 4 bytes undefined
            entries.append(DirEntry(name, obj_type, start, size, i))
        return entries

    def _load_mini_stream(self) -> bytes:
        root = next((e for e in self.entries if e.obj_type == 5), None)
        if root is None:
            return b""
        raw = b"".join(self._sector(s) for s in self._chain(root.start, self.fat))
        return raw[: root.size]

    # ------------------------------------------------------------- public

    def streams(self) -> List[str]:
        return [e.name for e in self.entries if e.obj_type == 2]

    def stream(self, name: str) -> Optional[bytes]:
        ent = next((e for e in self.entries if e.obj_type == 2 and e.name == name), None)
        if ent is None:
            return None
        if ent.size < self.mini_cutoff:
            parts = []
            sid = ent.start
            limit = len(self.minifat) + 2
            n = 0
            while sid not in (ENDOFCHAIN, FREESECT) and n < limit:
                off = sid * self.mini_size
                parts.append(self._mini_stream[off : off + self.mini_size])
                sid = self.minifat[sid] if sid < len(self.minifat) else ENDOFCHAIN
                n += 1
            return b"".join(parts)[: ent.size]
        raw = b"".join(self._sector(s) for s in self._chain(ent.start, self.fat))
        return raw[: ent.size]


def sniff_cfb_kind(data: bytes) -> Optional[str]:
    """Classify a CFB payload by its signature stream name:
    WordDocument → doc, Workbook/Book → xls, 'PowerPoint Document' → ppt."""
    try:
        names = set(CfbFile(data).streams())
    except (BadCfbFile, struct.error):
        return None
    if "WordDocument" in names:
        return "doc"
    if "Workbook" in names or "Book" in names:
        return "xls"
    if "PowerPoint Document" in names:
        return "ppt"
    return None


# ----------------------------------------------- property set (metadata)

_PIDSI = {2: "title", 3: "subject", 4: "author", 12: "created", 13: "modified"}


def read_summary_info(cfb: CfbFile) -> Dict[str, str]:
    """\x05SummaryInformation property set → metadata columns
    (public [MS-OLEPS]; reference reads these via its docx/pdf metadata
    extractors — base_metadata_extractor.py:33)."""
    meta = {k: "" for k in ("title", "author", "created", "modified", "subject")}
    raw = cfb.stream("\x05SummaryInformation")
    if not raw or len(raw) < 48:
        return meta
    try:
        (n_sets,) = struct.unpack_from("<I", raw, 24)
        if n_sets < 1:
            return meta
        (sec_off,) = struct.unpack_from("<I", raw, 44)
        (sec_size, n_props) = struct.unpack_from("<II", raw, sec_off)
        for i in range(n_props):
            pid, off = struct.unpack_from("<II", raw, sec_off + 8 + i * 8)
            key = _PIDSI.get(pid)
            if key is None:
                continue
            (vt,) = struct.unpack_from("<I", raw, sec_off + off)
            body = sec_off + off + 4
            if vt == 0x001E:  # VT_LPSTR: 4B length incl NUL, cp1252 bytes
                (ln,) = struct.unpack_from("<I", raw, body)
                meta[key] = raw[body + 4 : body + 4 + ln].split(b"\x00", 1)[0].decode("cp1252", "replace")
            elif vt == 0x0040:  # VT_FILETIME: 100ns ticks since 1601
                (ticks,) = struct.unpack_from("<Q", raw, body)
                from datetime import datetime, timedelta, timezone

                dt = datetime(1601, 1, 1, tzinfo=timezone.utc) + timedelta(microseconds=ticks // 10)
                meta[key] = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    except (struct.error, OverflowError):  # corrupt offsets / FILETIME ticks
        pass
    return meta
