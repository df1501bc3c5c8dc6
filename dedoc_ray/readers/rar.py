"""RAR container parsing — member listing + stored-member extraction.

The reference extracts RAR archives through the external ``rarfile`` +
unrar binary (dedoc/readers/archive_reader/archive_reader.py:9-113). The
RAR *decompression* algorithm (method 0x31-0x35 / RAR5 LZ) has no
freely-licensed implementation, so that part stays an honest gate — but
the CONTAINER format is plain structure: this module walks the header
chains of both generations and yields every member's name, size and
directory flag, plus the payload for STORED (method 0x30 / RAR5 comp 0)
members. Compressed members surface in the listing with a None payload
and the caller emits the unsupported-compression warning.

Formats (public format descriptions, e.g. the rarfile project docs):
- RAR 4.x: signature ``Rar!\\x1a\\x07\\x00``; 7-byte block headers
  (crc16, type, flags, size) + per-type fixed fields; file header 0x74
  with ADD_SIZE = packed size; directory = (flags & 0xE0) == 0xE0.
- RAR 5.x: signature ``Rar!\\x1a\\x07\\x01\\x00``; blocks are
  crc32 + vint(size) + header data of vint fields; file header type 2,
  directory bit 0x1 in file flags, compression method bits 7..9.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

RAR4_SIG = b"Rar!\x1a\x07\x00"
RAR5_SIG = b"Rar!\x1a\x07\x01\x00"


class BadRar(ValueError):
    pass


class RarMember:
    __slots__ = ("name", "size", "is_dir", "payload", "method", "packed", "crc", "solid", "version", "note")

    def __init__(
        self,
        name: str,
        size: int,
        is_dir: bool,
        payload: Optional[bytes],
        method: int,
        packed: bytes = b"",
        crc: Optional[int] = None,
        solid: bool = False,
        version: int = 0,
    ) -> None:
        self.name = name
        self.size = size
        self.is_dir = is_dir
        self.payload = payload  # None = not (yet) decodable
        self.method = method
        self.packed = packed
        self.crc = crc  # CRC32 of unpacked data when the header carries one
        self.solid = solid
        self.version = version  # 3 or 5
        self.note = ""  # reason when payload stays None


def _iter_rar4(data: bytes) -> Iterator[RarMember]:
    pos = 7
    n = len(data)
    while pos + 7 <= n:
        _crc, htype, flags, size = struct.unpack_from("<HBHH", data, pos)
        if size < 7:
            break
        add = 0
        if htype == 0x74:  # file header
            if pos + 32 > n:
                break
            (packsize, unpsize, _host, fcrc, _ftime, _ver, method, namelen, _attr) = struct.unpack_from(
                "<IIBIIBBHI", data, pos + 7
            )
            add = packsize
            if flags & 0x100:  # LHD_LARGE: 64-bit sizes follow
                high_pack, high_unp = struct.unpack_from("<II", data, pos + 32)
                packsize |= high_pack << 32
                unpsize |= high_unp << 32
                add = packsize
                name_off = pos + 40
            else:
                name_off = pos + 32
            raw_name = data[name_off : name_off + namelen]
            if flags & 0x200 and b"\x00" in raw_name:  # unicode name block
                raw_name = raw_name.split(b"\x00", 1)[0]
            name = raw_name.decode("utf-8", "replace").replace("\\", "/")
            is_dir = (flags & 0xE0) == 0xE0
            packed = data[pos + size : pos + size + packsize]
            payload: Optional[bytes] = None
            if method == 0x30 and not is_dir:  # stored
                payload = packed
            yield RarMember(
                name, unpsize, is_dir, payload, method,
                packed=packed, crc=fcrc, solid=bool(flags & 0x10), version=3,
            )
        elif flags & 0x8000:  # other block with ADD_SIZE
            if pos + 11 <= n:
                (add,) = struct.unpack_from("<I", data, pos + 7)
        pos += size + add
        if htype == 0x7B:  # archive end
            break


def _vint(data: bytes, pos: int) -> Tuple[int, int]:
    val = 0
    shift = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 70:
            break
    raise BadRar("bad vint")


def _iter_rar5(data: bytes) -> Iterator[RarMember]:
    pos = 8
    n = len(data)
    while pos + 5 <= n:
        # crc32(4) + vint header size + header data
        hsize, hstart = _vint(data, pos + 4)
        hend = hstart + hsize
        if hsize == 0 or hend > n:
            break
        p = hstart
        htype, p = _vint(data, p)
        hflags, p = _vint(data, p)
        extra_size = data_size = 0
        if hflags & 0x01:
            extra_size, p = _vint(data, p)
        if hflags & 0x02:
            data_size, p = _vint(data, p)
        if htype == 2:  # file header
            fflags, p = _vint(data, p)
            unpsize, p = _vint(data, p)
            _attr, p = _vint(data, p)
            if fflags & 0x02:  # mtime
                p += 4
            fcrc: Optional[int] = None
            if fflags & 0x04:  # crc32
                fcrc = struct.unpack_from("<I", data, p)[0]
                p += 4
            comp, p = _vint(data, p)
            _host, p = _vint(data, p)
            namelen, p = _vint(data, p)
            name = data[p : p + namelen].decode("utf-8", "replace")
            is_dir = bool(fflags & 0x01)
            method = (comp >> 7) & 0x07
            packed = data[hend : hend + data_size]
            payload: Optional[bytes] = None
            if method == 0 and not is_dir:  # stored
                payload = packed
            yield RarMember(
                name, unpsize, is_dir, payload, method,
                packed=packed, crc=fcrc, solid=bool(comp & 0x40), version=5,
            )
        elif htype == 5:  # end of archive
            break
        pos = hend + data_size


def rar_list(data: bytes) -> List[RarMember]:
    """All members of a RAR4/RAR5 archive (files AND directories flagged),
    with compressed payloads decoded by the native LZ decompressor
    (readers/rar_decode.py).  A CRC32 mismatch or an out-of-subset stream
    (RAR3 PPMd, non-standard RarVM filter) leaves ``payload=None`` with
    the reason in ``member.note`` — the caller's manifest still lists it."""
    if data.startswith(RAR5_SIG):
        members = list(_iter_rar5(data))
    elif data.startswith(RAR4_SIG):
        members = list(_iter_rar4(data))
    else:
        raise BadRar("not a RAR archive")
    _decode_compressed(members)
    return members


def _decode_compressed(members: List[RarMember]) -> None:
    import zlib as _z

    from dedoc_ray.readers.rar_decode import (
        Rar3Decoder,
        Rar5Decoder,
        RarDecodeError,
        RarPPMError,
    )

    decoder = None  # carried across solid chains
    for m in members:
        if m.is_dir or m.payload is not None or m.method == 0 or m.method == 0x30:
            decoder = None if not m.solid else decoder
            continue
        try:
            if m.version == 5:
                if decoder is None or not isinstance(decoder, Rar5Decoder) or not m.solid:
                    decoder = Rar5Decoder()
                out = decoder.decode_member(m.packed, m.size)
            else:
                if decoder is None or not isinstance(decoder, Rar3Decoder) or not m.solid:
                    decoder = Rar3Decoder()
                fresh = not (m.solid and decoder.tables_read)
                out = decoder.decode_member(m.packed, m.size, fresh_tables=fresh)
            if m.crc is not None and _z.crc32(out) & 0xFFFFFFFF != m.crc:
                m.note = "crc mismatch after decode"
                decoder = None
                continue
            m.payload = out
        except RarPPMError:
            m.note = "RAR3 PPMd block (outside the implemented subset)"
            decoder = None
        except (RarDecodeError, IndexError, struct.error) as e:
            m.note = f"decode failed: {e}"
            decoder = None


# ------------------------------------------------------------- writer
#
# STORED-member RAR4 writer — the container half is free; only the LZ
# compressor is license-gated. Exists so the reader has a corpus whose
# payloads survive the roundtrip (and so the oracle query covers the rar
# path E2E like zip/7z).


def _rar4_block(htype: int, flags: int, body: bytes, payload: bytes = b"") -> bytes:
    size = 7 + len(body)
    head = struct.pack("<BHH", htype, flags, size) + body
    crc = __import__("zlib").crc32(head) & 0xFFFF
    return struct.pack("<H", crc) + head + payload


def rar_encode_ppm(members: List[Tuple[str, bytes]], order: int = 6, mem_mb: int = 16) -> bytes:
    """[(name, payload)] → RAR3 archive whose data streams are PPMd
    var.H blocks (method 0x35, UNP_VER 29).  Exists to validate the PPM
    decode path against libarchive in BOTH directions: bsdtar must
    extract these archives byte-exactly, and rar_list must as well."""
    import zlib as _z

    from dedoc_ray.ops.ppmd import ppmd_rar_compress

    out = [RAR4_SIG]
    out.append(_rar4_block(0x73, 0x0000, b"\x00" * 6))  # main header
    for name, payload in members:
        packed = ppmd_rar_compress(payload, order=order, mem_mb=mem_mb)
        nameb = name.replace("/", "\\").encode("utf-8")
        body = struct.pack(
            "<IIBIIBBHI",
            len(packed),
            len(payload),
            2,                     # host os: windows
            _z.crc32(payload) & 0xFFFFFFFF,
            0x28210000,            # dos timestamp (fixed, deterministic)
            29,                    # version to extract: 2.9
            0x35,                  # method: best
            len(nameb),
            0x20,
        ) + nameb
        # flags: 0x8000 long block + dictionary size 2 MB ((5 & 7) << 5)
        out.append(_rar4_block(0x74, 0x8000 | (5 << 5), body, packed))
    out.append(_rar4_block(0x7B, 0x4000, b""))
    return b"".join(out)


def rar_encode_stored(members: List[Tuple[str, bytes]]) -> bytes:
    """[(name, payload)] → RAR4 archive with method 0x30 (stored) members."""
    import zlib as _z

    out = [RAR4_SIG]
    out.append(_rar4_block(0x73, 0x0000, b"\x00" * 6))  # main header
    for name, payload in members:
        nameb = name.replace("/", "\\").encode("utf-8")
        body = struct.pack(
            "<IIBIIBBHI",
            len(payload),          # packed size (stored: == unpacked)
            len(payload),          # unpacked size
            2,                     # host os: windows
            _z.crc32(payload) & 0xFFFFFFFF,
            0x28210000,            # dos timestamp (fixed, deterministic)
            20,                    # version to extract
            0x30,                  # method: stored
            len(nameb),
            0x20,                  # attributes: archive
        ) + nameb
        out.append(_rar4_block(0x74, 0x8000, body, payload))
    out.append(_rar4_block(0x7B, 0x4000, b""))  # end of archive
    return b"".join(out)
