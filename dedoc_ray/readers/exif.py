"""Native EXIF/TIFF metadata parser (reference ImageMetadataExtractor,
dedoc/metadata_extractors/concrete_metadata_extractors/image_metadata_extractor.py:28-118).

The reference reads the Exif block through PIL + piexif and surfaces a
prettified subset with typed conversion (dates → unix seconds, ints,
floats, decoded strings; unparseable values dropped).  This parser walks
the TIFF structure in the JPEG APP1 segment (or a bare TIFF header)
directly: IFD0, the Exif sub-IFD (tag 0x8769), both byte orders.
"""

from __future__ import annotations

import datetime
import re
import struct
from typing import Dict, Optional, Tuple

# tag → (prettified name, converter) — the reference's self.keys table.
# IFD0 carries DateTime/Make/Model/Software/Orientation/ResolutionUnit;
# the Exif sub-IFD carries the rest.
_TAGS: Dict[int, Tuple[str, str]] = {
    0x0132: ("date_time", "date"),
    0x9004: ("date_time_digitized", "date"),
    0x9003: ("date_time_original", "date"),
    0xA404: ("digital_zoom_ratio", "float"),
    0xA003: ("exif_image_height", "int"),
    0xA002: ("exif_image_width", "int"),
    0x9000: ("exif_version", "str"),
    0x9208: ("light_source", "int"),
    0x010F: ("make", "str"),
    0x0110: ("model", "str"),
    0x0112: ("orientation", "int"),
    0x0128: ("resolution_unit", "int"),
    0x0131: ("software", "str"),
    0xA40C: ("subject_distance_range", "int"),
    0x9286: ("user_comment", "str"),
}

_EXIF_DATE_RE = re.compile(r"(\d{4}):\s?(\d{2}):\s?(\d{2})[ T](\d{2}):(\d{2}):(\d{2})")

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _parse_exif_date(s: str) -> Optional[int]:
    """``2019:03:24 13:36:51`` → unix seconds (the reference goes through
    dateutil after collapsing ': ' → ':'; naive values are taken as UTC
    here for machine-independence)."""
    m = _EXIF_DATE_RE.search(s.replace(": ", ":"))
    if not m:
        return None
    try:
        dt = datetime.datetime(
            *(int(g) for g in m.groups()), tzinfo=datetime.timezone.utc
        )
    except ValueError:
        return None
    return int(dt.timestamp())


def _convert(kind: str, val: object) -> object:
    if val is None:
        return None
    if isinstance(val, bytes):
        try:
            val = val.rstrip(b"\x00").decode()
        except UnicodeDecodeError:
            return None
    if kind == "date":
        return _parse_exif_date(str(val))
    if kind == "int":
        try:
            return int(val)
        except (TypeError, ValueError):
            return None
    if kind == "float":
        try:
            f = float(val)
        except (TypeError, ValueError):
            return None
        return None if f != f else f  # NaN → dropped, like the reference
    return str(val) if not isinstance(val, (dict, list)) else None


def _find_tiff(data: bytes) -> Optional[bytes]:
    """Locate the TIFF structure: JPEG APP1 ``Exif\\0\\0`` payload, or the
    file itself when it IS a TIFF (II*\\0 / MM\\0*)."""
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return data
    i = data.find(b"Exif\x00\x00", 0, 1 << 16)
    if i >= 0:
        return data[i + 6 :]
    return None


def extract_exif(data: bytes) -> Dict[str, object]:
    """Image bytes → prettified EXIF dict (empty when there is no Exif
    block; fields with unparseable values are dropped, reference
    __prettify semantics)."""
    t = _find_tiff(data)
    if t is None or len(t) < 8:
        return {}
    if t[:2] == b"II":
        bo = "<"
    elif t[:2] == b"MM":
        bo = ">"
    else:
        return {}

    def u16(o: int) -> int:
        return struct.unpack_from(bo + "H", t, o)[0]

    def u32(o: int) -> int:
        return struct.unpack_from(bo + "I", t, o)[0]

    out: Dict[str, object] = {}
    seen_ifds = set()

    def read_ifd(off: int) -> None:
        if off in seen_ifds or off <= 0 or off + 2 > len(t) or len(seen_ifds) > 8:
            return
        seen_ifds.add(off)
        try:
            n = u16(off)
        except struct.error:
            return
        for k in range(min(n, 256)):
            e = off + 2 + 12 * k
            if e + 12 > len(t):
                return
            tag, typ, cnt = u16(e), u16(e + 2), u32(e + 4)
            size = _TYPE_SIZE.get(typ, 1) * cnt
            vo = u32(e + 8) if size > 4 else e + 8
            if vo + size > len(t):
                continue
            val: object = None
            try:
                if typ == 2 or typ == 7:  # ASCII / undefined
                    val = t[vo : vo + cnt]
                elif typ == 3:
                    val = u16(vo)
                elif typ in (4, 9):
                    val = u32(vo)
                elif typ in (5, 10):  # rational
                    num, den = u32(vo), u32(vo + 4)
                    val = (num / den) if den else None
                elif typ == 1:
                    val = t[vo]
            except struct.error:
                continue
            if tag == 0x8769 and isinstance(val, int):  # Exif sub-IFD pointer
                read_ifd(val)
                continue
            if tag in _TAGS and val is not None:
                name, kind = _TAGS[tag]
                conv = _convert(kind, val)
                if conv is not None and name not in out:
                    out[name] = conv

    read_ifd(u32(4))
    return out
