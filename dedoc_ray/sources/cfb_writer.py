"""Deterministic CFB (OLE2) writer + legacy .doc/.xls/.ppt payload
generators for the synthetic corpus — pure functions of (doc_id, text) like
every other generator in synth_office.py, so the DuckDB oracle can replay
the expected extraction.

The writer emits a spec-shaped v3 container: 512-byte sectors, header
DIFAT, FAT chains, a 64-byte mini-sector stream for payloads under the
4096-byte cutoff, and a linear right-sibling directory tree. Byte-stable
across runs (no timestamps, fixed layout order).
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone
from typing import List, Tuple

from dedoc_ray.sources.synth import chunks_of

SECTOR = 512
MINI = 64
CUTOFF = 4096
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
NOSTREAM = 0xFFFFFFFF


def _dir_entry(name: str, obj_type: int, start: int, size: int, child: int = NOSTREAM,
               left: int = NOSTREAM, right: int = NOSTREAM) -> bytes:
    raw_name = name.encode("utf-16-le") + b"\x00\x00"
    ent = bytearray(128)
    ent[: len(raw_name)] = raw_name
    struct.pack_into("<H", ent, 64, len(raw_name))
    ent[66] = obj_type
    ent[67] = 1  # black
    struct.pack_into("<III", ent, 68, left, right, child)
    struct.pack_into("<I", ent, 116, start)
    struct.pack_into("<Q", ent, 120, size)
    return bytes(ent)


def _pad(b: bytes, unit: int) -> bytes:
    rem = len(b) % unit
    return b if rem == 0 else b + b"\x00" * (unit - rem)


def build_cfb(streams: List[Tuple[str, bytes]]) -> bytes:
    """Assemble a CFB container holding ``streams`` (name, payload)."""
    minis = [(n, b) for n, b in streams if len(b) < CUTOFF]
    bigs = [(n, b) for n, b in streams if len(b) >= CUTOFF]

    # --- mini stream + miniFAT
    mini_blob = bytearray()
    minifat: List[int] = []
    mini_starts = {}
    for name, payload in minis:
        n_sec = max(1, -(-len(payload) // MINI))
        start = len(minifat)
        mini_starts[name] = start
        for i in range(n_sec - 1):
            minifat.append(start + i + 1)
        minifat.append(ENDOFCHAIN)
        mini_blob += _pad(payload, MINI)

    # --- regular-sector components, laid out in order:
    # [directory][miniFAT][mini stream][big streams]; FAT appended last.
    components: List[bytes] = []

    minifat_blob = _pad(b"".join(struct.pack("<I", v) for v in minifat), SECTOR) if minifat else b""
    mini_container = _pad(bytes(mini_blob), SECTOR)

    # directory depends on sector numbers — compute sizes first
    n_dir_entries = 1 + len(streams)
    dir_size = -(-n_dir_entries * 128 // SECTOR) * SECTOR
    n_dir_sec = dir_size // SECTOR
    n_minifat_sec = len(minifat_blob) // SECTOR
    n_mini_sec = len(mini_container) // SECTOR

    first_dir = 0
    first_minifat = n_dir_sec if n_minifat_sec else ENDOFCHAIN
    first_mini = n_dir_sec + n_minifat_sec
    big_start = first_mini + n_mini_sec
    big_starts = {}
    cursor = big_start
    big_blobs: List[bytes] = []
    for name, payload in bigs:
        big_starts[name] = cursor
        blob = _pad(payload, SECTOR)
        big_blobs.append(blob)
        cursor += len(blob) // SECTOR
    n_data_sec = cursor

    # --- directory
    entries = [
        _dir_entry(
            "Root Entry", 5,
            first_mini if minis else ENDOFCHAIN,
            len(mini_blob),
            child=1 if streams else NOSTREAM,
        )
    ]
    for i, (name, payload) in enumerate(streams):
        start = mini_starts[name] if len(payload) < CUTOFF else big_starts[name]
        right = i + 2 if i + 1 < len(streams) else NOSTREAM
        entries.append(_dir_entry(name, 2, start, len(payload), right=right))
    dir_blob = _pad(b"".join(entries), SECTOR)

    # --- FAT (fixpoint on its own size)
    n_fat_sec = 1
    while True:
        total = n_data_sec + n_fat_sec
        need = -(-total * 4 // SECTOR)
        if need == n_fat_sec:
            break
        n_fat_sec = need
    fat: List[int] = [FREESECT] * (n_fat_sec * SECTOR // 4)

    def chain(start: int, n: int) -> None:
        for i in range(n - 1):
            fat[start + i] = start + i + 1
        if n:
            fat[start + n - 1] = ENDOFCHAIN

    chain(first_dir, n_dir_sec)
    if n_minifat_sec:
        chain(first_minifat, n_minifat_sec)
    if n_mini_sec:
        chain(first_mini, n_mini_sec)
    for name, _ in bigs:
        blob_len = len(_pad(dict(bigs)[name], SECTOR)) // SECTOR
        chain(big_starts[name], blob_len)
    for i in range(n_fat_sec):
        fat[n_data_sec + i] = FATSECT
    fat_blob = b"".join(struct.pack("<I", v) for v in fat)

    # --- header
    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (v3)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)       # 512B sectors
    struct.pack_into("<H", header, 32, 6)       # 64B mini sectors
    struct.pack_into("<I", header, 44, n_fat_sec)
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, CUTOFF)
    struct.pack_into("<I", header, 60, first_minifat if n_minifat_sec else ENDOFCHAIN)
    struct.pack_into("<I", header, 64, n_minifat_sec)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT sectors
    struct.pack_into("<I", header, 72, 0)
    difat = [FREESECT] * 109
    for i in range(n_fat_sec):
        difat[i] = n_data_sec + i
    struct.pack_into("<109I", header, 76, *difat)

    return bytes(header) + dir_blob + minifat_blob + mini_container + b"".join(big_blobs) + fat_blob


# ------------------------------------------------- SummaryInformation

_FMTID_SI = bytes.fromhex("E0859FF2F94F1068AB9108002B27B3D9")
_EPOCH_1601 = datetime(1601, 1, 1, tzinfo=timezone.utc)


def _filetime(dt: datetime) -> int:
    return int((dt - _EPOCH_1601).total_seconds() * 10_000_000)


def summary_info_bytes(doc_id: int) -> bytes:
    """Property set with title/author/created/modified ([MS-OLEPS])."""
    props: List[Tuple[int, bytes]] = []
    for pid, s in ((2, f"Document {doc_id}"), (4, f"synth-author-{doc_id % 5}")):
        raw = s.encode("cp1252") + b"\x00"
        props.append((pid, struct.pack("<II", 0x001E, len(raw)) + _pad(raw, 4)))
    for pid, dt in (
        (12, datetime(2024, 1, 1, tzinfo=timezone.utc)),
        (13, datetime(2024, 1, 2, tzinfo=timezone.utc)),
    ):
        props.append((pid, struct.pack("<IQ", 0x0040, _filetime(dt))))
    head_sz = 8 + 8 * len(props)
    offsets, blob = [], b""
    for pid, body in props:
        offsets.append((pid, head_sz + len(blob)))
        blob += body
    section = struct.pack("<II", head_sz + len(blob), len(props))
    for pid, off in offsets:
        section += struct.pack("<II", pid, off)
    section += blob
    header = struct.pack("<HHI16sI", 0xFFFE, 0, 0x00020005, b"\x00" * 16, 1)
    header += _FMTID_SI + struct.pack("<I", 48)
    return header + section


# --------------------------------------------------------------- .doc


def doc_bytes(doc_id: int, text: str) -> bytes:
    """Word 97 file: 'Document {id}' heading + one paragraph per chunk,
    single UTF-16 piece. Expected extraction:
    'Document {id}\\n' + replace(text,' the ','\\n') + '\\n'."""
    paras = [f"Document {doc_id}"] + chunks_of(text)
    body = "".join(p + "\r" for p in paras)
    raw = body.encode("utf-16-le")
    fib = bytearray(1024)
    struct.pack_into("<H", fib, 0, 0xA5EC)
    struct.pack_into("<H", fib, 2, 0x00C1)  # nFib Word 97
    # flags at 0x000A stay 0 → piece table in 0Table
    text_off = 1024
    n_chars = len(body)
    # CLX: Pcdt(0x02) + lcb + PlcPcd([0, n] CPs + one PCD, fc=byte offset)
    plc = struct.pack("<II", 0, n_chars) + struct.pack("<HIH", 0, text_off, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<I", fib, 0x01A2, 0)        # fcClx (start of 0Table)
    struct.pack_into("<I", fib, 0x01A6, len(clx))  # lcbClx
    word_stream = bytes(fib) + raw
    return build_cfb(
        [
            ("WordDocument", word_stream),
            ("0Table", clx),
            ("\x05SummaryInformation", summary_info_bytes(doc_id)),
        ]
    )


# --------------------------------------------------------------- .xls


def _biff(rec: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rec, len(payload)) + payload


def xls_bytes(doc_id: int, text: str) -> bytes:
    """BIFF8 workbook: one sheet, 2x3 NUMBER grid (values doc_id*10+i) —
    the same grid xlsx_bytes builds, so the oracle shape matches."""
    globals_recs = [_biff(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))]
    # BOUNDSHEET needs the sheet BOF offset — assemble with a placeholder
    sheet_name = b"Sheet1"
    bs_payload = struct.pack("<IHBB", 0, 0, len(sheet_name), 0) + sheet_name
    globals_recs.append(_biff(0x0085, bs_payload))
    globals_recs.append(_biff(0x000A, b""))
    globals_blob = b"".join(globals_recs)

    sheet_recs = [_biff(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))]
    i = 0
    for r in range(2):
        for c in range(3):
            sheet_recs.append(_biff(0x0203, struct.pack("<HHHd", r, c, 0, float(doc_id * 10 + i))))
            i += 1
    sheet_recs.append(_biff(0x000A, b""))
    sheet_blob = b"".join(sheet_recs)

    # patch the BOUNDSHEET lbPlyPos (offset of the sheet BOF in the stream)
    bs_off = len(globals_recs[0]) + 4  # after globals BOF record, past rec header
    blob = bytearray(globals_blob + sheet_blob)
    struct.pack_into("<I", blob, bs_off, len(globals_blob))
    return build_cfb(
        [
            ("Workbook", bytes(blob)),
            ("\x05SummaryInformation", summary_info_bytes(doc_id)),
        ]
    )


# --------------------------------------------------------------- .ppt


def _ppt_rec(ver_inst: int, rec: int, payload: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rec, len(payload)) + payload


def ppt_bytes(doc_id: int, text: str) -> bytes:
    """PowerPoint binary: a Document container of TextCharsAtoms —
    'Slide {id}' title + one atom per chunk. Expected extraction:
    'Slide {id}\\n' + replace(text,' the ','\\n') + '\\n'."""
    atoms = b"".join(
        _ppt_rec(0x0000, 0x0FA0, s.encode("utf-16-le"))
        for s in [f"Slide {doc_id}"] + chunks_of(text)
    )
    document = _ppt_rec(0x000F, 0x03E8, atoms)
    return build_cfb(
        [
            ("PowerPoint Document", document),
            ("\x05SummaryInformation", summary_info_bytes(doc_id)),
        ]
    )
