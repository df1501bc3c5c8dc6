"""Native 7-Zip container support — stdlib ``lzma`` + ``zlib.crc32`` only.

The reference ArchiveReader shells out to the external ``7z`` binary
(dedoc/readers/archive_reader/archive_reader.py:9-113); this container has
none, but the .7z format is publicly specified (7zFormat.txt in the 7-Zip
source distribution) and its two dominant codecs — LZMA1 and LZMA2 — are
exactly what ``lzma.FORMAT_RAW`` decodes. So the reader is REAL:

- signature + start-header walk with both CRC32 checks,
- plain (kHeader) and compressed (kEncodedHeader) metadata headers,
- the 7z variable-length number encoding,
- PackInfo / UnpackInfo (folders, coder flags/ids/properties) /
  SubStreamsInfo (multi-substream folders: per-stream sizes + CRCs) /
  FilesInfo (UTF-16LE names, kEmptyStream/kEmptyFile bitfields),
- single-coder folders with Copy (00), LZMA1 (030101: lc/lp/pb + dict
  size from the 5-byte props), LZMA2 (21: dict-size code byte), BZip2
  (040202, stdlib bz2), Deflate (040108, zlib raw) and PPMd var.H
  (030401 — the native model in ops/ppmd.py, validated byte-exact
  against libarchive-written archives in tests/test_ppmd.py).

Multi-coder chains (BCJ filters), encryption (AES id 06f10701) and
external headers raise ``ValueError`` — honest scope, listed per coder id.

The writer generates test corpora: solid single-folder archives (all
members concatenated, one LZMA2/Copy stream, SubStreamsInfo splitting) or
one-folder-per-member layouts; optional encoded (LZMA2-compressed) header.
RAR is handled natively too (readers/rar.py + rar_decode.py).
"""

from __future__ import annotations

import lzma
import struct
import zlib
from typing import List, Optional, Tuple

_SIG = b"7z\xbc\xaf\x27\x1c"

K_END = 0x00
K_HEADER = 0x01
K_MAIN_STREAMS = 0x04
K_FILES_INFO = 0x05
K_PACK_INFO = 0x06
K_UNPACK_INFO = 0x07
K_SUBSTREAMS = 0x08
K_SIZE = 0x09
K_CRC = 0x0A
K_FOLDER = 0x0B
K_UNPACK_SIZES = 0x0C
K_NUM_UNPACK_STREAM = 0x0D
K_EMPTY_STREAM = 0x0E
K_EMPTY_FILE = 0x0F
K_NAME = 0x11
K_ENCODED_HEADER = 0x17

_COPY = b"\x00"
_LZMA1 = b"\x03\x01\x01"
_LZMA2 = b"\x21"
_BZIP2 = b"\x04\x02\x02"
_DEFLATE = b"\x04\x01\x08"
_PPMD = b"\x03\x04\x01"


class Bad7z(ValueError):
    pass


# --------------------------------------------------------------- numbers


def read_num(data: bytes, pos: int) -> Tuple[int, int]:
    """7z variable-length uint64 (7zFormat.txt ReadNumber)."""
    first = data[pos]
    pos += 1
    mask, value = 0x80, 0
    for i in range(8):
        if not (first & mask):
            value |= (first & (mask - 1)) << (8 * i)
            return value, pos
        value |= data[pos] << (8 * i)
        pos += 1
        mask >>= 1
    return value, pos


def write_num(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    return b"\xff" + struct.pack("<Q", n)  # full 8-byte form is always valid


def _read_bitfield(data: bytes, pos: int, n: int) -> Tuple[List[bool], int]:
    out: List[bool] = []
    mask, byte = 0, 0
    for _ in range(n):
        if not mask:
            byte, mask = data[pos], 0x80
            pos += 1
        out.append(bool(byte & mask))
        mask >>= 1
    return out, pos


def _write_bitfield(bits: List[bool]) -> bytes:
    out = bytearray()
    acc, mask = 0, 0x80
    for b in bits:
        if b:
            acc |= mask
        mask >>= 1
        if not mask:
            out.append(acc)
            acc, mask = 0, 0x80
    if mask != 0x80:
        out.append(acc)
    return bytes(out)


# --------------------------------------------------------------- decoding


def _decode_folder(coder_id: bytes, props: bytes, packed: bytes, unpack_size: int) -> bytes:
    if coder_id == _COPY:
        return packed[:unpack_size]
    if coder_id == _LZMA2:
        if len(props) != 1:
            raise Bad7z("LZMA2 props must be one byte")
        p = props[0]
        dict_size = 0xFFFFFFFF if p > 40 else (2 | (p & 1)) << (p // 2 + 11)
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW, filters=[{"id": lzma.FILTER_LZMA2, "dict_size": dict_size}]
        )
        return dec.decompress(packed, max_length=unpack_size)
    if coder_id == _LZMA1:
        if len(props) != 5:
            raise Bad7z("LZMA1 props must be five bytes")
        d = props[0]
        lc, rem = d % 9, d // 9
        lp, pb = rem % 5, rem // 5
        (dict_size,) = struct.unpack("<I", props[1:5])
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA1, "lc": lc, "lp": lp, "pb": pb, "dict_size": max(dict_size, 4096)}],
        )
        return dec.decompress(packed, max_length=unpack_size)
    if coder_id == _BZIP2:
        import bz2

        return bz2.decompress(packed)[:unpack_size]
    if coder_id == _DEFLATE:
        import zlib

        return zlib.decompressobj(-15).decompress(packed)[:unpack_size]
    if coder_id == _PPMD:
        # PPMd variant H (7z id 030401): props = order byte + mem-size u32
        if len(props) != 5:
            raise Bad7z("PPMd props must be five bytes")
        order = props[0]
        (mem_size,) = struct.unpack("<I", props[1:5])
        from dedoc_ray.ops.ppmd import ppmd7_decompress

        return ppmd7_decompress(packed, unpack_size, order, mem_size)
    raise Bad7z(
        f"unsupported 7z coder id {coder_id.hex()} (Copy/LZMA1/LZMA2/BZip2/Deflate/PPMd only)"
    )


def _parse_streams_info(data: bytes, pos: int):
    """→ (pack_pos, pack_sizes, folders, substream_counts, substream_sizes, pos).
    Each folder = (coder_id, props, num_pack_streams, unpack_size)."""
    pack_pos, pack_sizes = 0, []
    folders: List[Tuple[bytes, bytes, int, int]] = []
    sub_counts: Optional[List[int]] = None
    sub_sizes: Optional[List[List[int]]] = None
    folder_crc_defined: List[bool] = []
    while True:
        t = data[pos]
        pos += 1
        if t == K_END:
            break
        if t == K_PACK_INFO:
            pack_pos, pos = read_num(data, pos)
            n_pack, pos = read_num(data, pos)
            while True:
                t2 = data[pos]
                pos += 1
                if t2 == K_END:
                    break
                if t2 == K_SIZE:
                    pack_sizes = []
                    for _ in range(n_pack):
                        s, pos = read_num(data, pos)
                        pack_sizes.append(s)
                elif t2 == K_CRC:
                    defined, pos = _read_all_defined(data, pos, n_pack)
                    pos += 4 * sum(defined)
                else:
                    raise Bad7z(f"unexpected id 0x{t2:02x} in PackInfo")
        elif t == K_UNPACK_INFO:
            if data[pos] != K_FOLDER:
                raise Bad7z("UnpackInfo must start with kFolder")
            pos += 1
            n_folders, pos = read_num(data, pos)
            if data[pos] != 0:
                raise Bad7z("external folder definitions unsupported")
            pos += 1
            raw_folders = []
            for _ in range(n_folders):
                n_coders, pos = read_num(data, pos)
                if n_coders != 1:
                    raise Bad7z("multi-coder folders (filter chains) unsupported")
                flag = data[pos]
                pos += 1
                id_size = flag & 0x0F
                coder_id = data[pos : pos + id_size]
                pos += id_size
                if flag & 0x10:  # complex coder
                    _, pos = read_num(data, pos)
                    _, pos = read_num(data, pos)
                props = b""
                if flag & 0x20:
                    psize, pos = read_num(data, pos)
                    props = data[pos : pos + psize]
                    pos += psize
                raw_folders.append((coder_id, props))
            if data[pos] != K_UNPACK_SIZES:
                raise Bad7z("missing kCodersUnpackSize")
            pos += 1
            for coder_id, props in raw_folders:
                usize, pos = read_num(data, pos)
                folders.append((coder_id, props, 1, usize))
            while True:
                t2 = data[pos]
                pos += 1
                if t2 == K_END:
                    break
                if t2 == K_CRC:
                    folder_crc_defined, pos = _read_all_defined(data, pos, len(folders))
                    pos += 4 * sum(folder_crc_defined)
                else:
                    raise Bad7z(f"unexpected id 0x{t2:02x} in UnpackInfo")
        elif t == K_SUBSTREAMS:
            sub_counts = None
            sub_sizes_flat: List[List[int]] = []
            while True:
                t2 = data[pos]
                pos += 1
                if t2 == K_END:
                    break
                if t2 == K_NUM_UNPACK_STREAM:
                    sub_counts = []
                    for _ in range(len(folders)):
                        c, pos = read_num(data, pos)
                        sub_counts.append(c)
                elif t2 == K_SIZE:
                    counts = sub_counts if sub_counts is not None else [1] * len(folders)
                    for fi, c in enumerate(counts):
                        sizes = []
                        for _ in range(c - 1):  # last substream size is implied
                            s, pos = read_num(data, pos)
                            sizes.append(s)
                        sizes.append(folders[fi][3] - sum(sizes))
                        sub_sizes_flat.append(sizes)
                    sub_sizes = sub_sizes_flat
                elif t2 == K_CRC:
                    counts = sub_counts if sub_counts is not None else [1] * len(folders)
                    # digests are omitted for single-substream folders whose
                    # CRC was already defined in UnpackInfo (7zFormat.txt)
                    total = sum(
                        c
                        for fi, c in enumerate(counts)
                        if not (c == 1 and fi < len(folder_crc_defined) and folder_crc_defined[fi])
                    )
                    defined, pos = _read_all_defined(data, pos, total)
                    pos += 4 * sum(defined)
                else:
                    raise Bad7z(f"unexpected id 0x{t2:02x} in SubStreamsInfo")
        else:
            raise Bad7z(f"unexpected id 0x{t:02x} in StreamsInfo")
    return pack_pos, pack_sizes, folders, sub_counts, sub_sizes, pos


def _read_all_defined(data: bytes, pos: int, n: int) -> Tuple[List[bool], int]:
    all_defined = data[pos]
    pos += 1
    if all_defined:
        return [True] * n, pos
    return _read_bitfield(data, pos, n)


def _parse_files_info(data: bytes, pos: int):
    n_files, pos = read_num(data, pos)
    names: List[str] = []
    empty_stream = [False] * n_files
    empty_file: List[bool] = []
    while True:
        t = data[pos]
        pos += 1
        if t == K_END:
            break
        size, pos = read_num(data, pos)
        body = data[pos : pos + size]
        pos += size
        if t == K_EMPTY_STREAM:
            empty_stream, _ = _read_bitfield(body, 0, n_files)
        elif t == K_EMPTY_FILE:
            empty_file, _ = _read_bitfield(body, 0, sum(empty_stream))
        elif t == K_NAME:
            if body[0] != 0:
                raise Bad7z("external file names unsupported")
            raw = body[1:].decode("utf-16-le")
            names = raw.split("\x00")[:-1]
    if len(names) != n_files:
        raise Bad7z("file-name count mismatch")
    return names, empty_stream, empty_file, pos


def _parse_header(data: bytes, hdr: bytes) -> List[Tuple[str, bytes]]:
    pos = 0
    if hdr[pos] != K_HEADER:
        raise Bad7z("expected kHeader")
    pos += 1
    folders: List[Tuple[bytes, bytes, int, int]] = []
    pack_sizes: List[int] = []
    pack_pos = 0
    sub_counts = sub_sizes = None
    names: List[str] = []
    empty_stream: List[bool] = []
    empty_file: List[bool] = []
    while pos < len(hdr):
        t = hdr[pos]
        pos += 1
        if t == K_END:
            break
        if t == K_MAIN_STREAMS:
            pack_pos, pack_sizes, folders, sub_counts, sub_sizes, pos = _parse_streams_info(hdr, pos)
        elif t == K_FILES_INFO:
            names, empty_stream, empty_file, pos = _parse_files_info(hdr, pos)
        else:
            raise Bad7z(f"unsupported header section 0x{t:02x}")

    # decode folders → substreams in order
    base = 32 + pack_pos
    streams: List[bytes] = []
    off = base
    for fi, (coder_id, props, n_pack, usize) in enumerate(folders):
        psize = pack_sizes[fi]
        plain = _decode_folder(coder_id, props, data[off : off + psize], usize)
        if len(plain) != usize:
            raise Bad7z("folder unpacked to wrong size")
        off += psize
        sizes = sub_sizes[fi] if sub_sizes is not None else [usize]
        at = 0
        for s in sizes:
            streams.append(plain[at : at + s])
            at += s

    members: List[Tuple[str, bytes]] = []
    si = 0
    ei = 0  # index into the empty-stream-ordered kEmptyFile bitfield
    for i, name in enumerate(names):
        if empty_stream and empty_stream[i]:
            # empty-stream + empty-file bit set = zero-byte FILE; bit clear
            # (or bitfield absent with no payload) = directory — skip, the
            # reference's ArchiveReader lists files only
            is_file = empty_file[ei] if ei < len(empty_file) else False
            ei += 1
            if is_file:
                members.append((name, b""))
        else:
            if si >= len(streams):
                raise Bad7z("more files than substreams")
            members.append((name, streams[si]))
            si += 1
    return members


def sevenzip_decode(data: bytes) -> List[Tuple[str, bytes]]:
    """.7z bytes → [(name, payload)] in FilesInfo order. CRC-checked headers."""
    if data[:6] != _SIG or len(data) < 32:
        raise Bad7z("not a 7z archive")
    (start_crc,) = struct.unpack("<I", data[8:12])
    if zlib.crc32(data[12:32]) != start_crc:
        raise Bad7z("start header CRC mismatch")
    nh_off, nh_size, nh_crc = struct.unpack("<QQI", data[12:32])
    hdr = data[32 + nh_off : 32 + nh_off + nh_size]
    if len(hdr) != nh_size or zlib.crc32(hdr) != nh_crc:
        raise Bad7z("next header truncated or CRC mismatch")
    if not hdr:
        return []
    if hdr[0] == K_ENCODED_HEADER:
        pack_pos, pack_sizes, folders, _, _, _ = _parse_streams_info(hdr, 1)
        if len(folders) != 1 or len(pack_sizes) != 1:
            raise Bad7z("encoded header must be a single folder")
        coder_id, props, _, usize = folders[0]
        off = 32 + pack_pos
        hdr = _decode_folder(coder_id, props, data[off : off + pack_sizes[0]], usize)
    return _parse_header(data, hdr)


# --------------------------------------------------------------- encoding


def _compress(payload: bytes, codec: str) -> Tuple[bytes, bytes, bytes]:
    """→ (coder_id, props, packed)."""
    if codec == "copy":
        return _COPY, b"", payload
    if codec == "lzma2":
        # 64 KiB dict (props code 8): tiny members dominate the corpus and a
        # big dictionary costs allocation per call, not ratio
        packed = lzma.compress(
            payload, format=lzma.FORMAT_RAW, filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 16}]
        )
        return _LZMA2, bytes([8]), packed
    if codec == "lzma1":
        packed = lzma.compress(
            payload,
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA1, "lc": 3, "lp": 0, "pb": 2, "dict_size": 1 << 16}],
        )
        return _LZMA1, bytes([3 + 0 * 9 + 2 * 45]) + struct.pack("<I", 1 << 16), packed
    raise ValueError(f"unknown codec {codec!r}")


def _streams_info(pack_sizes, coders, unpack_sizes, sub_sizes=None) -> bytes:
    out = bytearray([K_PACK_INFO])
    out += write_num(0) + write_num(len(pack_sizes)) + bytes([K_SIZE])
    for s in pack_sizes:
        out += write_num(s)
    out.append(K_END)
    out += bytes([K_UNPACK_INFO, K_FOLDER]) + write_num(len(coders)) + b"\x00"
    for coder_id, props in coders:
        flag = len(coder_id) | (0x20 if props else 0)
        out += bytes([1, flag]) + coder_id
        if props:
            out += write_num(len(props)) + props
    out.append(K_UNPACK_SIZES)
    for u in unpack_sizes:
        out += write_num(u)
    out.append(K_END)
    if sub_sizes is not None:
        out.append(K_SUBSTREAMS)
        out.append(K_NUM_UNPACK_STREAM)
        for sizes in sub_sizes:
            out += write_num(len(sizes))
        out.append(K_SIZE)
        for sizes in sub_sizes:
            for s in sizes[:-1]:
                out += write_num(s)
        out.append(K_END)
    out.append(K_END)
    return bytes(out)


def sevenzip_encode(
    members: List[Tuple[str, bytes]], codec: str = "lzma2", solid: bool = True, encoded_header: bool = False
) -> bytes:
    """[(name, payload)] → .7z. ``solid`` packs all non-empty members into
    ONE folder (SubStreamsInfo splits it); otherwise one folder per member.
    ``encoded_header`` LZMA2-compresses the metadata header (kEncodedHeader),
    exercising the reader's two-level parse."""
    nonempty = [(n, p) for n, p in members if p]
    empties = [n for n, p in members if not p]

    pack_blobs: List[bytes] = []
    coders: List[Tuple[bytes, bytes]] = []
    unpack_sizes: List[int] = []
    sub_sizes = None
    if nonempty:
        if solid:
            concat = b"".join(p for _, p in nonempty)
            cid, props, packed = _compress(concat, codec)
            pack_blobs, coders, unpack_sizes = [packed], [(cid, props)], [len(concat)]
            sub_sizes = [[len(p) for _, p in nonempty]]
        else:
            for _, p in nonempty:
                cid, props, packed = _compress(p, codec)
                pack_blobs.append(packed)
                coders.append((cid, props))
                unpack_sizes.append(len(p))

    hdr = bytearray([K_HEADER])
    if nonempty:
        hdr.append(K_MAIN_STREAMS)
        hdr += _streams_info([len(b) for b in pack_blobs], coders, unpack_sizes, sub_sizes)
    hdr.append(K_FILES_INFO)
    hdr += write_num(len(members))
    if empties:
        bf = _write_bitfield([not p for _, p in members])
        hdr += bytes([K_EMPTY_STREAM]) + write_num(len(bf)) + bf
        # every empty-stream entry we write is a zero-byte FILE, not a
        # directory — mark them so readers (ours included) keep them
        ef = _write_bitfield([True] * sum(1 for _, p in members if not p))
        hdr += bytes([K_EMPTY_FILE]) + write_num(len(ef)) + ef
    names_blob = b"\x00" + "".join(n + "\x00" for n, _ in members).encode("utf-16-le")
    hdr += bytes([K_NAME]) + write_num(len(names_blob)) + names_blob
    hdr += bytes([K_END, K_END])
    hdr_bytes = bytes(hdr)

    body = b"".join(pack_blobs)
    if encoded_header:
        cid, props, packed_hdr = _compress(hdr_bytes, "lzma2")
        # pack_pos of the header folder = end of member data
        enc_fixed = bytearray([K_ENCODED_HEADER, K_PACK_INFO])
        enc_fixed += write_num(len(body)) + write_num(1) + bytes([K_SIZE]) + write_num(len(packed_hdr))
        enc_fixed.append(K_END)
        enc_fixed += bytes([K_UNPACK_INFO, K_FOLDER]) + write_num(1) + b"\x00"
        flag = len(cid) | (0x20 if props else 0)
        enc_fixed += bytes([1, flag]) + cid
        if props:
            enc_fixed += write_num(len(props)) + props
        enc_fixed.append(K_UNPACK_SIZES)
        enc_fixed += write_num(len(hdr_bytes))
        enc_fixed += bytes([K_END, K_END])
        next_hdr = bytes(enc_fixed)
        body += packed_hdr
    else:
        next_hdr = hdr_bytes

    start = struct.pack("<QQI", len(body), len(next_hdr), zlib.crc32(next_hdr))
    return _SIG + b"\x00\x04" + struct.pack("<I", zlib.crc32(start)) + start + body + next_hdr
