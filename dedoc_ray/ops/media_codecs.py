"""Real codecs for the public media container family.

The multimodal stages (ops/multimodal.py) dispatch their decode step on
magic bytes to the parsers in this module — every format below is a plain
public specification implemented with struct + numpy (JPEG and FLAC live in
their own modules, ops/jpeg_codec.py and ops/flac_codec.py):

- **BMP** (Windows bitmap, BITMAPINFOHEADER, 24-bit BGR, bottom-up rows,
  4-byte row stride padding) → grayscale pixel matrix (ITU-R-601-ish mean
  is overkill for equal-channel pixels; we average the channels exactly).
- **WAV** (RIFF/WAVE, PCM 16-bit little-endian, chunk walk — fmt/data in
  any order, unknown chunks skipped per spec) → samples + rate.
- **Y4M** (YUV4MPEG2: ASCII stream header with W/H/F tags, ``FRAME\\n``
  separated raw 4:2:0 planes) → per-frame luma planes.

Writers for the same formats generate the deterministic test corpus (pure
functions of doc_id → DuckDB-replayable features). Decoders validate
structure and raise ValueError on malformed input — the kernels' error
contract."""

from __future__ import annotations

import re
import struct
import zlib
from typing import List, Tuple

import numpy as np

# ----------------------------------------------------------------- BMP


def bmp_encode(gray: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → 24-bit BMP (equal BGR channels)."""
    h, w = gray.shape
    stride = (w * 3 + 3) & ~3
    pad = stride - w * 3
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = np.repeat(gray[y], 3).astype(np.uint8).tobytes()
        rows.append(row + b"\0" * pad)
    pixels = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def bmp_decode(data: bytes) -> np.ndarray:
    """24-bit BMP → (h, w) uint8 grayscale (channel mean, exact)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    size, w, h, planes, bpp = struct.unpack("<IiiHH", data[14:30])
    if size < 40 or bpp != 24 or planes != 1 or w <= 0 or h == 0:
        raise ValueError("unsupported BMP variant (24-bit BITMAPINFOHEADER only)")
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    body = data[offset : offset + stride * h]
    if len(body) != stride * h:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(body, np.uint8).reshape(h, stride)[:, : w * 3]
    px = rows.reshape(h, w, 3).astype(np.uint16)
    gray = (px.sum(axis=2) // 3).astype(np.uint8)
    return gray[::-1] if flip else gray


# ----------------------------------------------------------------- WAV


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM."""
    body = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def wav_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE mono → (int16 samples, sample_rate). Walks chunks in file
    order, skipping unknown ones (word-aligned) per the RIFF spec. Format
    tags: 1 (PCM-16) and 0x11 (IMA ADPCM — 4-bit compressed, decoded with
    the standard step tables; sample count from the fact chunk)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples, tag, fact_n = 12, None, None, None, None
    raw = None
    while pos + 8 <= len(data):
        cid, clen = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if channels != 1 or tag not in (1, 0x11) or (tag == 1 and bits != 16):
                raise ValueError("unsupported WAV variant (mono PCM-16 / IMA ADPCM only)")
        elif cid == b"fact":
            (fact_n,) = struct.unpack("<I", payload[:4])
        elif cid == b"data":
            raw = payload
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("WAV missing fmt or data chunk")
    if tag == 0x11:
        if fact_n is None:
            raise ValueError("ADPCM WAV missing fact chunk")
        samples = ima_adpcm_decode_block(raw, fact_n)
    else:
        samples = np.frombuffer(raw[: len(raw) & ~1], "<i2")
    return samples, rate


# ----------------------------------------------------------------- Y4M


def y4m_encode(frames: List[np.ndarray], fps: int = 25) -> bytes:
    """[(h, w) uint8 luma planes] → YUV4MPEG2 4:2:0 (chroma = 128)."""
    h, w = frames[0].shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A0:0 C420\n".encode()
    chroma = bytes([128]) * ((w // 2) * (h // 2) * 2)
    return head + b"".join(b"FRAME\n" + f.tobytes() + chroma for f in frames)


def y4m_decode(data: bytes) -> List[np.ndarray]:
    """YUV4MPEG2 4:2:0 → list of (h, w) uint8 luma planes."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    for tag in data[10:nl].split(b" "):
        if tag[:1] == b"W":
            w = int(tag[1:])
        elif tag[:1] == b"H":
            h = int(tag[1:])
        elif tag[:1] == b"C" and tag != b"C420":
            raise ValueError("unsupported Y4M chroma mode (C420 only)")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    frame_len = w * h + 2 * ((w // 2) * (h // 2))
    frames: List[np.ndarray] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        start = fnl + 1
        if start + frame_len > len(data):
            raise ValueError("truncated Y4M frame")
        luma = data[start : start + w * h]
        frames.append(np.frombuffer(luma, np.uint8).reshape(h, w))
        pos = start + frame_len
    return frames


# ------------------------------------------------- deterministic test corpus


def bmp_payload(doc_id: int) -> bytes:
    """w=4+id%8, h=3+id%5, pixel(y, x) = (doc_id + x + y) % 256."""
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    y, x = np.mgrid[0:h, 0:w]
    return bmp_encode(((doc_id + x + y) % 256).astype(np.uint8))


def wav_payload(doc_id: int) -> bytes:
    """rate = 8000 + (id%8)·1000; n = 500 + (id%50)·20;
    sample(i) = (doc_id·7 + i) % 200 - 100."""
    rate = 8000 + (doc_id % 8) * 1000
    n = 500 + (doc_id % 50) * 20
    i = np.arange(n)
    return wav_encode(((doc_id * 7 + i) % 200 - 100).astype(np.int16), rate)


def y4m_payload(doc_id: int) -> bytes:
    """n = 10 + id%20 frames of w = 8 + (id%4)·2, h = 8; frame f's luma is
    the constant (doc_id + f) % 256."""
    n, w, h = 10 + doc_id % 20, 8 + (doc_id % 4) * 2, 8
    frames = [np.full((h, w), (doc_id + f) % 256, np.uint8) for f in range(n)]
    return y4m_encode(frames)


# ----------------------------------------------------------------- PNG
#
# Grayscale 8-bit PNG (color type 0) with the stdlib zlib doing DEFLATE.
# The encoder writes filter 0 rows; the decoder implements ALL five row
# filters (None/Sub/Up/Average/Paeth) so externally-produced streams decode
# too. CRCs are verified chunk by chunk.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", zlib.crc32(tag + body))


def png_encode(gray: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → PNG color type 0, or (h, w, 3) uint8 RGB →
    color type 2; bit depth 8, filter 0 rows."""
    import zlib

    h, w = gray.shape[:2]
    color_type = 2 if gray.ndim == 3 else 0
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\0" + gray[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 9))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


_PNG_NCH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_defilter(raw: bytes, h: int, stride: int, bpp: int, off: int = 0) -> Tuple[np.ndarray, int]:
    """Undo the five scanline filters over h rows of `stride` bytes starting
    at byte `off` of the decompressed stream; returns (rows, new offset)."""
    out = np.zeros((h, stride), np.uint8)
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = raw[off]
        row = np.frombuffer(raw[off + 1 : off + 1 + stride], np.uint8).astype(np.int32)
        off += 1 + stride
        if ftype == 0:
            recon = row
        elif ftype == 2:  # Up — vectorized
            recon = (row + prior) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need the running left
            recon = np.zeros(stride, np.int32)
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    recon[x] = (row[x] + a) & 0xFF
                elif ftype == 3:
                    recon[x] = (row[x] + (a + b) // 2) & 0xFF
                else:
                    recon[x] = (row[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = recon.astype(np.uint8)
        prior = recon
    return out, off


def _png_samples(rows: np.ndarray, w: int, nch: int, depth: int) -> np.ndarray:
    """Defiltered byte rows → (h, w, nch) uint8 samples. Sub-byte depths
    unpack MSB-first and scale to full range for gray (palette indices are
    left as-is by the caller); 16-bit takes the high byte (libpng strip_16)."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * nch].reshape(h, w, nch)
    if depth == 16:
        return rows[:, : w * nch * 2].reshape(h, w, nch, 2)[..., 0]
    bits = np.unpackbits(rows, axis=1)
    vals = bits[:, : w * nch * depth].reshape(h, w * nch, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    return (vals.astype(np.uint16) @ weights).astype(np.uint8).reshape(h, w, nch)


def png_decode(data: bytes) -> np.ndarray:
    """PNG → (h, w) uint8 grayscale. All five row filters, gray/RGB/palette
    /gray+alpha/RGBA color types, bit depths 1/2/4/8/16, Adam7 interlace;
    verifies chunk CRCs. RGB reduces by exact channel mean; alpha composites
    over white; 16-bit reduces to the high byte (as libpng strip_16)."""
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat: List[bytes] = []
    palette = None
    while pos + 8 <= len(data):
        (clen,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + clen > len(data):
            raise ValueError("truncated PNG chunk")
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        (crc,) = struct.unpack(">I", data[pos + 8 + clen : pos + 12 + clen])
        if zlib.crc32(tag + body) != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            nch = _PNG_NCH.get(ctype)
            if nch is None or depth not in (1, 2, 4, 8, 16) or interlace > 1:
                raise ValueError("unsupported PNG variant")
            if depth < 8 and ctype not in (0, 3):
                raise ValueError("sub-byte depth only valid for gray/palette")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + clen
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, nch * depth // 8)

    def stride_of(width: int) -> int:
        return (width * nch * depth + 7) // 8

    if not interlace:
        rows, off = _png_defilter(raw, h, stride_of(w), bpp)
        if off != len(raw):
            raise ValueError("PNG pixel data length mismatch")
        samples = _png_samples(rows, w, nch, depth)
    else:  # Adam7: seven independently-filtered sub-images
        samples = np.zeros((h, w, nch), np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, off = _png_defilter(raw, ph, stride_of(pw), bpp, off)
            samples[y0::dy, x0::dx] = _png_samples(rows, pw, nch, depth)
        if off != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    if ctype == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        rgb = palette[samples[..., 0]].astype(np.uint16)
        return (rgb.sum(axis=2) // 3).astype(np.uint8)
    if depth < 8 and ctype == 0:  # scale sub-byte gray to full range
        samples = (samples.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    if ctype == 0:
        return samples[..., 0]
    if ctype == 2:
        return (samples.astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    # alpha types: composite over white, rounding division
    if ctype == 4:
        g = samples[..., 0].astype(np.uint32)
        a = samples[..., 1].astype(np.uint32)
    else:  # 6: RGBA
        g = samples[..., :3].astype(np.uint32).sum(axis=2) // 3
        a = samples[..., 3].astype(np.uint32)
    return ((g * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


# ----------------------------------------------------------------- GIF
#
# GIF87a/89a with a 256-entry grayscale global color table and the standard
# LZW codec (variable code width 9→12, clear-code table resets, LSB-first
# bit packing, ≤255-byte sub-blocks).


def _lzw_compress(indices: bytes, min_code: int = 8) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(1 << min_code)}
    next_code, width = eoi + 1, min_code + 1
    out_bits: List[Tuple[int, int]] = [(clear, width)]
    run = b""
    for byte in indices:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], width))
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                out_bits.append((clear, width))
                table = {bytes([i]): i for i in range(1 << min_code)}
                next_code, width = eoi + 1, min_code + 1
        run = bytes([byte])
    if run:
        out_bits.append((table[run], width))
    out_bits.append((eoi, width))
    acc = n = 0
    packed = bytearray()
    for code, cw in out_bits:
        acc |= code << n
        n += cw
        while n >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _lzw_decompress(data: bytes, min_code: int = 8) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table: List[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    width = min_code + 1
    acc = n = pos = 0
    out = bytearray()
    prev: bytes | None = None
    while True:
        while n < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
            width, prev = min_code + 1, None
            continue
        if code == eoi:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def gif_encode(gray: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale → GIF89a with a 256-gray global palette."""
    h, w = gray.shape
    lsd = struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT present, 256 entries
    gct = bytes(v for i in range(256) for v in (i, i, i))
    imgd = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    lzw = _lzw_compress(gray.tobytes())
    blocks = bytearray([8])  # LZW minimum code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return b"GIF89a" + lsd + gct + imgd + bytes(blocks) + b"\x3b"


def gif_decode(data: bytes) -> np.ndarray:
    """GIF87a/89a, first image frame → (h, w) uint8 grayscale (palette
    entries mapped by exact RGB mean). Extensions are skipped; interlaced
    frames are de-interlaced by the four-pass row order."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            _, _, _, w, h, ipack = struct.unpack("<BHHHHB", data[pos : pos + 10])
            pos += 10
            if ipack & 0x80:
                n = 2 << (ipack & 7)
                palette = np.frombuffer(data[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if palette is None:
                raise ValueError("GIF image without a color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = np.frombuffer(_lzw_decompress(bytes(lzw), min_code), np.uint8)
            if len(indices) < w * h:
                raise ValueError("truncated GIF image data")
            gray = (palette.astype(np.uint16).sum(axis=1) // 3).astype(np.uint8)
            img = gray[indices[: w * h]].reshape(h, w)
            if ipack & 0x40:  # interlaced: rows stored in four passes
                order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                        np.arange(2, h, 4), np.arange(1, h, 2)])
                out = np.empty_like(img)
                out[order] = img
                return out
            return img
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image")


# ----------------------------------------------------------------- AU
#
# Sun/NeXT audio (.au/.snd): 24-byte big-endian header. Encoding 3 =
# PCM-16 big-endian (lossless; the corpus format) and encoding 1 = G.711
# µ-law 8-bit (the classic telephony codec, exact per-spec tables).


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 → µ-law bytes (G.711, bias 0x84, clip 32635)."""
    x = samples.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0)
    x = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(x)) - 7).astype(np.int32)
    mant = (x >> (exp + 3)) & 0xF
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """µ-law bytes → int16 (exact inverse of the quantizer)."""
    u = (~codes.astype(np.int32)) & 0xFF
    sign, exp, mant = u & 0x80, (u >> 4) & 7, u & 0xF
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def au_encode(samples: np.ndarray, rate: int, ulaw: bool = False) -> bytes:
    """int16 mono samples → Sun AU (PCM-16 BE, or µ-law when ``ulaw``)."""
    body = ulaw_encode(samples).tobytes() if ulaw else samples.astype(">i2").tobytes()
    enc = 1 if ulaw else 3
    return struct.pack(">4sIIIII", b".snd", 24, len(body), enc, rate, 1) + body


def au_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """Sun AU → (int16 samples, rate). Encodings 1 (µ-law) and 3 (PCM-16 BE),
    mono; honors the header's data offset (annotation field skipped)."""
    if data[:4] != b".snd" or len(data) < 24:
        raise ValueError("not a Sun AU file")
    _, offset, size, enc, rate, channels = struct.unpack(">4sIIIII", data[:24])
    if channels != 1 or enc not in (1, 3):
        raise ValueError("unsupported AU variant (mono µ-law/PCM-16 only)")
    if size == 0xFFFFFFFF:  # unknown-length marker per spec
        size = len(data) - offset
    body = data[offset : offset + size]
    if enc == 3:
        return np.frombuffer(body[: len(body) & ~1], ">i2").astype(np.int16), rate
    return ulaw_decode(np.frombuffer(body, np.uint8)), rate


def png_payload(doc_id: int) -> bytes:
    """Same pixel field as bmp_payload — one SQL oracle covers both."""
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    y, x = np.mgrid[0:h, 0:w]
    return png_encode(((doc_id + x + y) % 256).astype(np.uint8))


def gif_payload(doc_id: int) -> bytes:
    """Same pixel field as bmp_payload — one SQL oracle covers both."""
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    y, x = np.mgrid[0:h, 0:w]
    return gif_encode(((doc_id + x + y) % 256).astype(np.uint8))


def au_payload(doc_id: int) -> bytes:
    """Same sample field as wav_payload (PCM-16 BE) — one SQL oracle."""
    rate = 8000 + (doc_id % 8) * 1000
    n = 500 + (doc_id % 50) * 20
    i = np.arange(n)
    return au_encode(((doc_id * 7 + i) % 200 - 100).astype(np.int16), rate)


# ----------------------------------------------------------------- TIFF
#
# Baseline grayscale TIFF 6.0 — the classic document-scan container. The
# decoder walks the IFD in either byte order (II/MM), reassembles strips,
# and handles Compression=1 (none) and 32773 (PackBits); PhotometricInterp
# 0 (WhiteIsZero) is inverted to the BlackIsZero convention; RGB
# (SamplesPerPixel=3) reduces to the exact channel mean. LZW/JPEG-in-TIFF
# raise ValueError. The encoder writes II, single-strip, gray-8.


def packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits (Apple RLE). Literal-run greedy: repeats >= 3 become
    replicate runs."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run & 0xFF, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += run
        ln = min(i, lit_start + 128) - lit_start
        out += bytes([ln - 1]) + data[lit_start : lit_start + ln]
        i = lit_start + ln
    return bytes(out)


def packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        b = data[i]
        i += 1
        if b == 128:  # noop per spec
            continue
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        else:
            out += bytes([data[i]]) * (257 - b)
            i += 1
    if len(out) < expect:
        raise ValueError("truncated PackBits stream")
    return bytes(out[:expect])


def tiff_encode(gray: np.ndarray, packbits: bool = False, exif: "dict | None" = None) -> bytes:
    """(h, w) uint8 grayscale → little-endian single-strip TIFF.

    ``exif`` optionally embeds camera-style metadata the EXIF extractor
    (readers/exif.py) reads back: string keys ``software``/``make``/
    ``model``/``date_time`` (``YYYY:MM:DD HH:MM:SS``) plus int
    ``orientation`` go into IFD0; an Exif sub-IFD carries the pixel dims
    and ``date_time_original``."""
    h, w = gray.shape
    body = np.ascontiguousarray(gray).tobytes()
    if packbits:
        body = b"".join(packbits_encode(gray[y].tobytes()) for y in range(h))
    entries = [
        (256, 4, 1, w),            # ImageWidth
        (257, 4, 1, h),            # ImageLength
        (258, 3, 1, 8),            # BitsPerSample
        (259, 3, 1, 32773 if packbits else 1),  # Compression
        (262, 3, 1, 1),            # Photometric: BlackIsZero
        (273, 4, 1, 0),            # StripOffsets (patched below)
        (277, 3, 1, 1),            # SamplesPerPixel
        (278, 4, 1, h),            # RowsPerStrip (single strip)
        (279, 4, 1, len(body)),    # StripByteCounts
    ]
    extra = bytearray()  # out-of-line values + the Exif sub-IFD
    sub_ifd: list = []
    if exif:
        _STR_TAGS = {"make": 0x010F, "model": 0x0110, "software": 0x0131, "date_time": 0x0132}

        def _ascii(tag_list, tag, s):
            raw = s.encode("ascii", "replace") + b"\x00"
            if len(raw) <= 4:
                tag_list.append((tag, 2, len(raw), int.from_bytes(raw.ljust(4, b"\x00"), "little")))
            else:
                tag_list.append((tag, 2, len(raw), ("extra", len(extra))))
                extra.extend(raw)
                if len(extra) & 1:
                    extra.append(0)

        for key, tag in sorted(_STR_TAGS.items(), key=lambda kv: kv[1]):
            if key in exif:
                _ascii(entries, tag, str(exif[key]))
        if "orientation" in exif:
            entries.append((0x0112, 3, 1, int(exif["orientation"])))
        # Exif sub-IFD: pixel dims + original date
        if "date_time" in exif:
            _ascii(sub_ifd, 0x9003, str(exif.get("date_time_original", exif["date_time"])))
        sub_ifd.append((0xA002, 4, 1, w))
        sub_ifd.append((0xA003, 4, 1, h))
        sub_ifd.sort()
        entries.append((0x8769, 4, 1, ("subifd", 0)))
    entries.sort(key=lambda e: e[0])
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    sub_size = (2 + 12 * len(sub_ifd) + 4) if sub_ifd else 0
    extra_off = ifd_off + ifd_size + sub_size
    sub_off = ifd_off + ifd_size
    data_off = extra_off + len(extra)

    def _pack(tag_list, patch_strip=False):
        buf = bytearray(struct.pack("<H", len(tag_list)))
        for tag, typ, cnt, val in tag_list:
            if patch_strip and tag == 273:
                val = data_off
            elif isinstance(val, tuple):
                val = extra_off + val[1] if val[0] == "extra" else sub_off
            buf += struct.pack("<HHII", tag, typ, cnt, val)
        buf += struct.pack("<I", 0)
        return buf

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += _pack(entries, patch_strip=True)
    if sub_ifd:
        out += _pack(sub_ifd)
    out += extra
    out += body
    return bytes(out)


def tiff_encode_pages(grays: "List[np.ndarray]") -> bytes:
    """Multi-page little-endian TIFF: one chained IFD per (h, w) uint8
    grayscale page — the classic document-scanner container shape."""
    out = bytearray(struct.pack("<2sHI", b"II", 42, 8))
    for pi, g in enumerate(grays):
        h, w = g.shape
        body = np.ascontiguousarray(g).tobytes()
        if len(body) & 1:
            body += b"\x00"  # keep IFD offsets word-aligned
        entries = [
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
            (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 4, 1, h),
            (279, 4, 1, h * w),
        ]
        ifd_off = len(out)
        data_off = ifd_off + 2 + 12 * len(entries) + 4
        next_ifd = data_off + len(body) if pi < len(grays) - 1 else 0
        out += struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            if tag == 273:
                val = data_off
            out += struct.pack("<HHII", tag, typ, cnt, val)
        out += struct.pack("<I", next_ifd)
        out += body
    return bytes(out)


def tiff_decode(data: bytes) -> np.ndarray:
    """Grayscale/RGB baseline TIFF → (h, w) uint8 gray (FIRST page). II and
    MM byte orders; strips; Compression 1/PackBits; WhiteIsZero inverted."""
    return tiff_decode_pages(data, max_pages=1)[0]


def tiff_decode_pages(data: bytes, max_pages: int = 50) -> "List[np.ndarray]":
    """Multi-page TIFF → one gray array per IFD in the chain (classic
    scanner output is one-IFD-per-scanned-page; the reference reads these
    through its image route page by page). Page 0 must decode; later pages
    that fail decode are skipped."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF")
    (magic,) = struct.unpack(e + "H", data[2:4])
    if magic != 42:
        raise ValueError("bad TIFF magic")
    (ifd,) = struct.unpack(e + "I", data[4:8])
    pages: List[np.ndarray] = []
    seen = set()
    while ifd and ifd not in seen and len(pages) < max_pages:
        seen.add(ifd)
        if ifd + 2 > len(data):
            break
        try:
            pages.append(_tiff_decode_ifd(data, e, ifd))
        except ValueError:
            if not pages:
                raise
        (n_ent,) = struct.unpack(e + "H", data[ifd : ifd + 2])
        nxt_off = ifd + 2 + 12 * n_ent
        if nxt_off + 4 > len(data):
            break
        (ifd,) = struct.unpack(e + "I", data[nxt_off : nxt_off + 4])
    if not pages:
        raise ValueError("TIFF with no decodable pages")
    return pages


def _tiff_decode_ifd(data: bytes, e: str, ifd: int) -> np.ndarray:
    (n_ent,) = struct.unpack(e + "H", data[ifd : ifd + 2])
    tags = {}
    for i in range(n_ent):
        off = ifd + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", data[off : off + 8])
        raw = data[off + 8 : off + 12]
        size = {1: 1, 3: 2, 4: 4, 7: 1}.get(typ)
        if size is None:
            continue  # RATIONAL etc. — not needed
        total = size * cnt
        if total > 4:
            (ptr,) = struct.unpack(e + "I", raw)
            raw = data[ptr : ptr + total]
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
        vals = struct.unpack(e + str(cnt) + fmt, raw[:total])
        tags[tag] = list(vals)
    try:
        w, h = tags[256][0], tags[257][0]
    except KeyError:
        raise ValueError("TIFF missing dimensions")
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    if comp in (2, 3, 4):
        # CCITT bilevel (MH "RLE" / Group 3 with EOLs / Group 4) —
        # ops/ccitt.py decoders; photometric 0 (WhiteIsZero) is the fax
        # default, black ink = 0 out
        from dedoc_ray.ops.ccitt import ccitt_g3_decode, ccitt_g4_decode, ccitt_mh_decode

        offs = tags.get(273)
        cnts = tags.get(279)
        if not offs or not cnts:
            raise ValueError("TIFF missing strip layout")
        rows_per_strip = tags.get(278, [h])[0]
        t4_2d = bool(tags.get(292, [0])[0] & 1)  # T4Options bit 0: 2-D rows
        strips = []
        y = 0
        for o, c in zip(offs, cnts):
            n_rows = min(rows_per_strip, h - y)
            payload = data[o : o + c]
            if comp == 3:
                dec = ccitt_g3_decode(payload, columns=w, rows=n_rows, two_d=t4_2d)
            else:
                dec = (ccitt_g4_decode if comp == 4 else ccitt_mh_decode)(payload, columns=w, rows=n_rows)
            if dec.shape[0] < n_rows:  # pad short strips
                dec = np.vstack([dec, np.full((n_rows - dec.shape[0], w), 255, np.uint8)])
            strips.append(dec[:n_rows])
            y += n_rows
        return np.vstack(strips)[:h]
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise ValueError("unsupported TIFF sample layout (8-bit gray/RGB only)")
    if comp not in (1, 5, 7, 8, 32773, 32946):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if photo not in (0, 1, 2, 6):
        raise ValueError("unsupported TIFF photometric interpretation")
    offs = tags.get(273)
    cnts = tags.get(279)
    if not offs or not cnts or len(offs) != len(cnts):
        raise ValueError("TIFF missing strip layout")
    rps = tags.get(278, [h])[0]
    if comp == 7:
        # new-style JPEG-in-TIFF: each strip is an abbreviated JPEG stream;
        # tag 347 (JPEGTables) holds a tables-only stream whose body is
        # injected after each strip's SOI (TIFF TechNote 2 layout)
        from dedoc_ray.ops.jpeg_codec import jpeg_decode

        tabs = bytes(tags.get(347, []))
        if tabs[:2] == b"\xff\xd8" and tabs[-2:] == b"\xff\xd9":
            tabs = tabs[2:-2]
        strips = []
        y = 0
        for so, sc in zip(offs, cnts):
            payload = data[so : so + sc]
            if tabs and payload[:2] == b"\xff\xd8":
                payload = payload[:2] + tabs + payload[2:]
            gray = jpeg_decode(payload)  # luma plane = gray for YCbCr/gray
            n_rows = min(rps, h - y)
            strips.append(gray[:n_rows, :w])
            y += n_rows
        px = np.vstack(strips)[:h]
        if photo == 0:
            px = (255 - px.astype(np.int16)).astype(np.uint8)
        return px
    if photo == 6:
        raise ValueError("YCbCr TIFF only supported with JPEG compression")
    pred = tags.get(317, [1])[0]
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offs, cnts)):
        chunk = data[so : so + sc]
        if len(chunk) != sc:
            raise ValueError("truncated TIFF strip")
        rows = min(rps, h - si * rps)
        if comp == 32773:
            chunk = packbits_decode(chunk, rows * w * spp)
        elif comp == 5:
            from dedoc_ray.readers.pdf_objects import _lzw

            chunk = _lzw(chunk)  # TIFF LZW = PDF LZWDecode, EarlyChange 1
        elif comp in (8, 32946):
            chunk = zlib.decompress(chunk)
        if pred == 2 and comp in (5, 8, 32946):
            # horizontal differencing: undo by cumulative sum per sample
            arr = np.frombuffer(chunk[: rows * w * spp], np.uint8).reshape(rows, w, spp)
            chunk = np.cumsum(arr, axis=1, dtype=np.uint32).astype(np.uint8).tobytes()
        raw += chunk
    if len(raw) < h * w * spp:
        raise ValueError("TIFF pixel data short")
    px = np.frombuffer(bytes(raw[: h * w * spp]), np.uint8)
    if spp == 3:
        px = (px.reshape(h, w, 3).astype(np.uint16).sum(axis=2) // 3).astype(np.uint8)
    else:
        px = px.reshape(h, w)
    if photo == 0:  # WhiteIsZero
        px = (255 - px.astype(np.int16)).astype(np.uint8)
    return px


def tiff_payload(doc_id: int) -> bytes:
    """Same pixel field as bmp_payload — one SQL oracle covers the family;
    every third doc uses PackBits so both compressions run in the corpus."""
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    y, x = np.mgrid[0:h, 0:w]
    return tiff_encode(((doc_id + x + y) % 256).astype(np.uint8), packbits=(doc_id % 3 == 0))


# ----------------------------------------------------------------- AVI/MJPEG
#
# Motion-JPEG in an AVI RIFF container — compressed video that needs no
# external codec: each frame is a baseline JPEG (ops/jpeg_codec.py). The
# decoder walks RIFF LISTs to the 'movi' payload and decodes every '..dc'
# chunk; the encoder writes a minimal-but-valid avih/strl header pair.


def avi_mjpeg_encode(frames: List[np.ndarray], fps: int = 25) -> bytes:
    """[(h, w) uint8 gray] → AVI with one MJPG video stream."""
    from dedoc_ray.ops.jpeg_codec import jpeg_encode

    h, w = frames[0].shape
    jpegs = [jpeg_encode(f) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I", 1000000 // fps, 0, 0, 0x10, len(jpegs), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs), 0, 0, 0, 0)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", j) for j in jpegs))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_mjpeg_decode(data: bytes) -> List[np.ndarray]:
    """AVI/MJPG → [(h, w) uint8 gray luma planes], one per '..dc' chunk."""
    from dedoc_ray.ops.jpeg_codec import jpeg_decode

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")

    frames: List[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            tag = data[pos : pos + 4]
            (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + clen > end:
                raise ValueError("truncated AVI chunk")
            if tag == b"LIST":
                walk(body_start + 4, body_start + clen)
            elif tag[2:4] == b"dc":
                payload = data[body_start : body_start + clen]
                if payload[:2] != b"\xff\xd8":
                    raise ValueError("non-JPEG frame in MJPG stream")
                frames.append(jpeg_decode(payload))
            pos = body_start + clen + (clen & 1)

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames


def avi_payload(doc_id: int) -> bytes:
    """Same frame field as y4m_payload (constant luma (doc_id+f)%256 —
    constant JPEG frames decode bit-exactly) → shared SQL oracle."""
    n, w, h = 10 + doc_id % 20, 8 + (doc_id % 4) * 2, 8
    frames = [np.full((h, w), (doc_id + f) % 256, np.uint8) for f in range(n)]
    return avi_mjpeg_encode(frames)


# ----------------------------------------------------------------- IMA ADPCM
#
# WAV format tag 0x11 (IMA/DVI ADPCM): 4-bit differential coding with the
# standard step-size table — the classic compressed-audio codec that is
# pure integer arithmetic, so encode/decode are deterministic and the
# decode is exact per spec. Mono, one block per file (block-align = data).

_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int32)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230,
    253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
    1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
    3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794,
    32767], np.int32)


def _ima_step(pred: int, index: int, nibble: int):
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = max(-32768, min(32767, pred - diff if nibble & 8 else pred + diff))
    index = max(0, min(88, index + int(_IMA_INDEX[nibble])))
    return pred, index


def ima_adpcm_encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono → WAV (format 0x11), single IMA block: 4-byte block
    header (pred, index, reserved) + one nibble per remaining sample."""
    s = samples.astype(np.int32)
    pred, index = (int(s[0]), 0) if len(s) else (0, 0)
    nibbles: List[int] = []
    for x in s[1:]:
        step = int(_IMA_STEPS[index])
        delta = int(x) - pred
        nib = 8 if delta < 0 else 0
        delta = abs(delta)
        if delta >= step:
            nib |= 4
            delta -= step
        if delta >= step >> 1:
            nib |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            nib |= 1
        pred, index = _ima_step(pred, index, nib)
        nibbles.append(nib)
    if len(nibbles) & 1:
        nibbles.append(0)
    packed = bytes((nibbles[i] | (nibbles[i + 1] << 4)) for i in range(0, len(nibbles), 2))
    block = struct.pack("<hBB", int(s[0]) if len(s) else 0, 0, 0) + packed
    n = len(s)
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate, rate // 2, len(block), 4, 2, n)
    chunks = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"fact" + struct.pack("<II", 4, n)
              + b"data" + struct.pack("<I", len(block)) + block)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def ima_adpcm_decode_block(block: bytes, n_samples: int) -> np.ndarray:
    pred, index, _ = struct.unpack("<hBB", block[:4])
    out = np.empty(n_samples, np.int16)
    if n_samples == 0:
        return out
    out[0] = pred
    k = 1
    for byte in block[4:]:
        for nib in (byte & 0xF, byte >> 4):
            if k >= n_samples:
                break
            pred, index = _ima_step(pred, index, nib)
            out[k] = pred
            k += 1
    if k < n_samples:
        raise ValueError("truncated ADPCM block")
    return out


def adpcm_payload(doc_id: int) -> bytes:
    """Same (n, rate) field as wav_payload, IMA-ADPCM-compressed — the
    frame-stat oracle depends only on sample COUNT and rate, which the
    codec preserves exactly (fact chunk), so the WAV SQL applies."""
    rate = 8000 + (doc_id % 8) * 1000
    n = 500 + (doc_id % 50) * 20
    i = np.arange(n)
    return ima_adpcm_encode(((doc_id * 7 + i) % 200 - 100).astype(np.int16), rate)


# ------------------------------------------- scanner raster containers
#
# The reference's PdfImageReader accepts every raster its cv2/PIL stack can
# open (supported_image_formats in dedoc/utils/parameter_utils.py); its test
# corpus carries the same scanned page as pbm/pgm/pnm/ppm, pcx, ras/sr, sgi
# and hdr/pic. These are plain container parses — tests pin pixel equality
# of every lossless variant against the PNG decode of the same page.


def pnm_decode(data: bytes) -> np.ndarray:
    """Netpbm P1–P6 → (h, w) uint8 grayscale. ASCII and raw variants,
    comments, arbitrary maxval (16-bit samples are big-endian); bitmaps
    map 1 → black. RGB reduces by exact channel mean."""
    if data[:1] != b"P" or data[1:2] not in b"123456":
        raise ValueError("not a PNM")
    kind = data[1] - 0x30
    pos = 2
    tokens: List[int] = []
    need = 2 if kind in (1, 4) else 3
    while len(tokens) < need:
        while pos < len(data) and data[pos] in b" \t\r\n":
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] not in b"\r\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and data[pos] not in b" \t\r\n#":
            pos += 1
        tokens.append(int(data[start:pos]))
    w, h = tokens[0], tokens[1]
    maxval = tokens[2] if need == 3 else 1
    nch = 3 if kind in (3, 6) else 1
    if kind in (1, 2, 3):  # ASCII samples
        vals = np.array(data[pos:].split()[: w * h * nch], dtype=np.uint32)
        if len(vals) < w * h * nch:
            raise ValueError("truncated PNM")
        samples = vals.reshape(h, w, nch)
    else:
        pos += 1  # exactly one whitespace byte after the header
        if kind == 4:
            stride = (w + 7) // 8
            rows = np.frombuffer(data[pos : pos + stride * h], np.uint8).reshape(h, stride)
            bits = np.unpackbits(rows, axis=1)[:, :w]
            return np.where(bits, 0, 255).astype(np.uint8)
        itemsize = 2 if maxval > 255 else 1
        count = w * h * nch
        buf = data[pos : pos + count * itemsize]
        if len(buf) < count * itemsize:
            raise ValueError("truncated PNM")
        dt = ">u2" if itemsize == 2 else np.uint8
        samples = np.frombuffer(buf, dt).astype(np.uint32).reshape(h, w, nch)
    if kind == 1:  # ASCII bitmap: 1 = black
        return np.where(samples[..., 0], 0, 255).astype(np.uint8)
    samples = samples * 255 // maxval
    if nch == 3:
        return (samples.sum(axis=2) // 3).astype(np.uint8)
    return samples[..., 0].astype(np.uint8)


def pcx_decode(data: bytes) -> np.ndarray:
    """ZSoft PCX (8-bit, 1 or 3 planes, RLE) → (h, w) uint8 grayscale.
    Single-plane images use the 256-color VGA palette trailer when present,
    else the raw index as gray."""
    if data[0] != 0x0A or data[2] != 1 or data[3] != 8:
        raise ValueError("unsupported PCX (8-bit RLE only)")
    xmin, ymin, xmax, ymax = struct.unpack("<4H", data[4:12])
    w, h = xmax - xmin + 1, ymax - ymin + 1
    nplanes = data[65]
    (bpl,) = struct.unpack("<H", data[66:68])
    if nplanes not in (1, 3):
        raise ValueError("unsupported PCX plane count")
    total = h * nplanes * bpl
    out = bytearray()
    i = 128
    n = len(data)
    while len(out) < total and i < n:
        b = data[i]
        i += 1
        if b >= 0xC0:
            out += data[i : i + 1] * (b & 0x3F)
            i += 1
        else:
            out.append(b)
    if len(out) < total:
        raise ValueError("truncated PCX")
    rows = np.frombuffer(bytes(out[:total]), np.uint8).reshape(h, nplanes, bpl)[:, :, :w]
    if nplanes == 3:
        return (rows.astype(np.uint16).sum(axis=1) // 3).astype(np.uint8)
    idx = rows[:, 0, :]
    if len(data) >= 769 and data[-769] == 0x0C:  # VGA palette trailer
        pal = np.frombuffer(data[-768:], np.uint8).reshape(256, 3)
        gray = (pal.astype(np.uint16).sum(axis=1) // 3).astype(np.uint8)
        return gray[idx]
    return idx.copy()


def sun_raster_decode(data: bytes) -> np.ndarray:
    """Sun Rasterfile (.ras/.sr) → (h, w) uint8 grayscale. Standard (type
    0/1) and byte-RLE (type 2) encodings; 1/8/24-bit depths; rows padded
    to 16 bits; 24-bit pixels are BGR; 8-bit uses the RGB colormap when
    present."""
    if data[:4] != b"\x59\xa6\x6a\x95":
        raise ValueError("not a Sun raster")
    w, h, depth, _length, rtype, maptype, maplen = struct.unpack(">7I", data[4:32])
    if rtype not in (0, 1, 2) or depth not in (1, 8, 24):
        raise ValueError("unsupported Sun raster variant")
    cmap = data[32 : 32 + maplen]
    raw = data[32 + maplen :]
    if rtype == 2:  # byte RLE: 0x80 <count> <value>; 0x80 0x00 = literal 0x80
        out = bytearray()
        i = 0
        while i < len(raw):
            b = raw[i]
            if b == 0x80:
                cnt = raw[i + 1]
                if cnt == 0:
                    out.append(0x80)
                    i += 2
                else:
                    out += raw[i + 2 : i + 3] * (cnt + 1)
                    i += 3
            else:
                out.append(b)
                i += 1
        raw = bytes(out)
    stride = ((w * depth + 15) // 16) * 2
    if len(raw) < stride * h:
        raise ValueError("truncated Sun raster")
    rows = np.frombuffer(raw[: stride * h], np.uint8).reshape(h, stride)
    if depth == 1:  # 1 = black (foreground)
        bits = np.unpackbits(rows, axis=1)[:, :w]
        return np.where(bits, 0, 255).astype(np.uint8)
    if depth == 24:  # BGR order
        px = rows[:, : w * 3].reshape(h, w, 3).astype(np.uint16)
        return (px.sum(axis=2) // 3).astype(np.uint8)
    idx = rows[:, :w]
    if maptype == 1 and maplen >= 3:  # RGB colormap: r-plane, g-plane, b-plane
        n = maplen // 3
        pal = np.frombuffer(cmap, np.uint8).reshape(3, n).T.astype(np.uint16)
        gray = (pal.sum(axis=1) // 3).astype(np.uint8)
        return gray[idx]
    return idx.copy()


def sgi_decode(data: bytes) -> np.ndarray:
    """SGI image (.sgi/.rgb) → (h, w) uint8 grayscale. 1 byte per channel,
    verbatim and RLE storage; rows are stored bottom-up, channels planar;
    RGB(A) reduces by exact channel mean of the first three channels."""
    if data[:2] != b"\x01\xda":
        raise ValueError("not an SGI image")
    storage, bpc = data[2], data[3]
    _dim, x, y, z = struct.unpack(">4H", data[4:12])
    if bpc != 1:
        raise ValueError("unsupported SGI bytes-per-channel")
    z = max(z, 1)
    if storage == 0:
        need = x * y * z
        planes = np.frombuffer(data[512 : 512 + need], np.uint8)
        if len(planes) < need:
            raise ValueError("truncated SGI image")
        planes = planes.reshape(z, y, x)[:, ::-1, :]  # bottom-up rows
    else:  # RLE: per-(row, channel) offset/length tables then packed runs
        ntab = y * z
        starts = np.frombuffer(data[512 : 512 + 4 * ntab], ">u4")
        lens = np.frombuffer(data[512 + 4 * ntab : 512 + 8 * ntab], ">u4")
        planes = np.zeros((z, y, x), np.uint8)
        for c in range(z):
            for row in range(y):
                i = int(starts[c * y + row])
                end = i + int(lens[c * y + row])
                pos = 0
                while i < end:
                    b = data[i]
                    i += 1
                    cnt = b & 0x7F
                    if cnt == 0:
                        break
                    if b & 0x80:
                        planes[c, y - 1 - row, pos : pos + cnt] = np.frombuffer(
                            data[i : i + cnt], np.uint8)
                        i += cnt
                    else:
                        planes[c, y - 1 - row, pos : pos + cnt] = data[i]
                        i += 1
                    pos += cnt
    if z == 1:
        return planes[0].copy()
    return (planes[:3].astype(np.uint16).sum(axis=0) // 3).astype(np.uint8)


def hdr_decode(data: bytes) -> np.ndarray:
    """Radiance RGBE (.hdr/.pic) → (h, w) uint8 grayscale. New-style RLE
    scanlines; shared-exponent floats reduce by linear channel mean, then
    clamp to [0, 1] and scale to 8 bits."""
    if not data.startswith(b"#?"):
        raise ValueError("not a Radiance picture")
    pos = 0
    res = None
    while pos < len(data):
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line.startswith(b"-Y") or line.startswith(b"+Y"):
            res = line.split()
            break
    if res is None or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError("unsupported Radiance orientation")
    h, w = int(res[1]), int(res[3])
    rgbe = np.zeros((h, w, 4), np.uint8)
    for row in range(h):
        if pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2 \
                and (data[pos + 2] << 8 | data[pos + 3]) == w:
            pos += 4  # new-style RLE: four component streams
            for c in range(4):
                xpos = 0
                while xpos < w:
                    cnt = data[pos]
                    pos += 1
                    if cnt > 128:
                        rgbe[row, xpos : xpos + cnt - 128, c] = data[pos]
                        pos += 1
                        xpos += cnt - 128
                    else:
                        rgbe[row, xpos : xpos + cnt, c] = np.frombuffer(
                            data[pos : pos + cnt], np.uint8)
                        pos += cnt
                        xpos += cnt
        else:  # flat scanline of RGBE quadruples
            rgbe[row] = np.frombuffer(data[pos : pos + 4 * w], np.uint8).reshape(w, 4)
            pos += 4 * w
    mant = rgbe[..., :3].astype(np.float64)
    exp = rgbe[..., 3:4].astype(np.int32)
    rgb = np.where(exp > 0, mant * np.exp2(exp - (128 + 8)), 0.0)
    gray = rgb.mean(axis=2)
    return np.clip(gray * 255.0 + 0.5, 0, 255).astype(np.uint8)


def webp_decode(data: bytes) -> np.ndarray:
    """WebP → (h, w) uint8 grayscale THROUGH THE SYSTEM libwebp via ctypes
    (public WebPDecodeRGBA API). VP8/VP8L entropy decoding is the one
    raster codec not reimplemented natively here — gated honestly: raises
    ValueError when the shared library is absent."""
    import ctypes

    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError as exc:  # pragma: no cover - container always has it
        raise ValueError("libwebp unavailable for WebP decode") from exc
    w = ctypes.c_int()
    h = ctypes.c_int()
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise ValueError("WebP decode failed")
    n = w.value * h.value * 4
    arr = np.ctypeslib.as_array(buf, shape=(n,)).copy()
    lib.WebPFree(buf)
    px = arr.reshape(h.value, w.value, 4)[..., :3].astype(np.uint16)
    return (px.sum(axis=2) // 3).astype(np.uint8)


def image_dimensions(data: bytes) -> "Tuple[int, int] | None":
    """(width, height) from container headers WITHOUT decoding pixel data —
    the cheap peek that lets callers apply pixel caps before committing to
    a pure-Python decode. None = container unknown here (caller decides)."""
    try:
        if data[:3] == b"\xff\xd8\xff":  # JPEG: walk markers to SOFn
            pos = 2
            while pos + 9 < len(data):
                if data[pos] != 0xFF:
                    pos += 1
                    continue
                marker = data[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                seg_len = struct.unpack(">H", data[pos + 2:pos + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
                    return w, h
                pos += 2 + seg_len
            return None
        if data[:8] == _PNG_SIG:
            w, h = struct.unpack(">II", data[16:24])
            return w, h
        if data[:4] == b"\xff\x4f\xff\x51":  # JPEG 2000 codestream: SIZ
            w, h = struct.unpack(">II", data[8:16])
            return w, h
        if data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  ":
            i = data.find(b"\xff\x4f\xff\x51")
            if i >= 0 and i + 16 <= len(data):
                w, h = struct.unpack(">II", data[i + 8 : i + 16])
                return w, h
            return None
        if data[:2] == b"BM":
            w, h = struct.unpack("<ii", data[18:26])
            return abs(w), abs(h)
        if data[:4] == b"GIF8":
            w, h = struct.unpack("<HH", data[6:10])
            return w, h
        if data[:4] in (b"II*\x00", b"MM\x00*"):
            bo = "<" if data[:2] == b"II" else ">"
            off = struct.unpack(bo + "I", data[4:8])[0]
            n = struct.unpack(bo + "H", data[off:off + 2])[0]
            w = h = None
            for i in range(n):
                e = off + 2 + 12 * i
                tag, typ = struct.unpack(bo + "HH", data[e:e + 4])
                if tag in (256, 257):
                    v = struct.unpack(
                        bo + ("H" if typ == 3 else "I"), data[e + 8:e + 10 if typ == 3 else e + 12]
                    )[0]
                    if tag == 256:
                        w = v
                    else:
                        h = v
            return (w, h) if w and h else None
        if data[:1] == b"P" and data[1:2] in b"123456":
            toks = []
            pos = 2
            while len(toks) < 2 and pos < min(len(data), 512):
                m = re.match(rb"\s*(?:#[^\n]*\n\s*)*(\d+)", data[pos:])
                if not m:
                    break
                toks.append(int(m.group(1)))
                pos += m.end()
            return (toks[0], toks[1]) if len(toks) == 2 else None
        if data[:4] == b"\x59\xa6\x6a\x95":
            w, h = struct.unpack(">II", data[4:12])
            return w, h
        if data[:2] == b"\x01\xda":
            w, h = struct.unpack(">HH", data[6:10])  # XSIZE, YSIZE
            return w, h
        if len(data) > 68 and data[0] == 0x0A and data[2] == 1:
            x0, y0, x1, y1 = struct.unpack("<4H", data[4:12])
            return x1 - x0 + 1, y1 - y0 + 1
    except (struct.error, IndexError):
        return None
    return None


def image_decode_gray(data: bytes) -> np.ndarray:
    """Magic-dispatched raster decode → (h, w) uint8 grayscale. One entry
    point for every container the engine parses natively (the analogue of
    the reference's cv2.imread/PIL.Image.open catch-all)."""
    if data[:2] == b"\xff\xd8":
        from dedoc_ray.ops.jpeg_codec import jpeg_decode

        return jpeg_decode(data)
    if data[:2] == b"BM":
        return bmp_decode(data)
    if data[:8] == _PNG_SIG:
        return png_decode(data)
    if data[:4] == b"GIF8":
        return gif_decode(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return tiff_decode(data)
    if data[:1] == b"P" and data[1:2] in b"123456":
        return pnm_decode(data)
    if data[:4] == b"\x59\xa6\x6a\x95":
        return sun_raster_decode(data)
    if data[:2] == b"\x01\xda":
        return sgi_decode(data)
    if data[:2] == b"#?":
        return hdr_decode(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return webp_decode(data)
    if data[:4] == b"\xff\x4f\xff\x51" or (data[:4] == b"\x00\x00\x00\x0c" and data[4:8] == b"jP  "):
        from dedoc_ray.ops.jpeg2000 import j2k_decode

        img = j2k_decode(data)
        if img.ndim == 3:  # exact channel mean, same reduction as png_decode
            img = (img.astype(np.uint32).sum(axis=-1) // img.shape[-1]).astype(np.uint8)
        return img
    if len(data) > 68 and data[0] == 0x0A and data[2] == 1:
        return pcx_decode(data)
    raise ValueError("unknown image container")


# --------------------------------- writers for the scanner-raster corpus
#
# Same pixel field as bmp_payload (doc_id + x + y mod 256, equal channels)
# so the one exact SQL oracle covers the whole container family.


def pnm_encode(gray: np.ndarray) -> bytes:
    """(h, w) uint8 → binary PPM (P6, equal RGB channels)."""
    h, w = gray.shape
    return b"P6\n%d %d\n255\n" % (w, h) + np.repeat(gray.reshape(-1), 3).tobytes()


def pcx_encode(gray: np.ndarray) -> bytes:
    """(h, w) uint8 → 8-bit 3-plane RLE PCX (equal channels)."""
    h, w = gray.shape
    bpl = w + (w & 1)  # even bytes per line
    head = bytearray(128)
    head[0], head[1], head[2], head[3] = 0x0A, 5, 1, 8
    head[4:12] = struct.pack("<4H", 0, 0, w - 1, h - 1)
    head[12:16] = struct.pack("<2H", 72, 72)
    head[65] = 3
    head[66:68] = struct.pack("<H", bpl)
    head[68:70] = struct.pack("<H", 1)
    out = bytearray(head)
    for y in range(h):
        row = bytes(gray[y]) + b"\0" * (bpl - w)
        for _plane in range(3):  # equal channels
            x = 0
            while x < len(row):
                v = row[x]
                run = 1
                while x + run < len(row) and row[x + run] == v and run < 63:
                    run += 1
                if run > 1 or v >= 0xC0:
                    out.append(0xC0 | run)
                out.append(v)
                x += run
    return bytes(out)


def sun_raster_encode(gray: np.ndarray) -> bytes:
    """(h, w) uint8 → 24-bit standard (type 1) Sun rasterfile."""
    h, w = gray.shape
    stride = ((w * 3 + 1) // 2) * 2
    rows = []
    for y in range(h):
        rows.append(np.repeat(gray[y], 3).tobytes() + b"\0" * (stride - w * 3))
    body = b"".join(rows)
    head = struct.pack(">8I", 0x59A66A95, w, h, 24, len(body), 1, 0, 0)
    return head + body


def sgi_encode(gray: np.ndarray) -> bytes:
    """(h, w) uint8 → verbatim 3-channel SGI image (bottom-up planes)."""
    h, w = gray.shape
    head = bytearray(512)
    head[0:2] = b"\x01\xda"
    head[2], head[3] = 0, 1  # verbatim, 1 byte per channel
    head[4:12] = struct.pack(">4H", 3, w, h, 3)
    head[12:20] = struct.pack(">2I", 0, 255)
    plane = gray[::-1].tobytes()  # bottom-up
    return bytes(head) + plane * 3


def pnm_payload(doc_id: int) -> bytes:
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    y, x = np.mgrid[0:h, 0:w]
    return pnm_encode(((doc_id + x + y) % 256).astype(np.uint8))


def pcx_payload(doc_id: int) -> bytes:
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    y, x = np.mgrid[0:h, 0:w]
    return pcx_encode(((doc_id + x + y) % 256).astype(np.uint8))


def ras_payload(doc_id: int) -> bytes:
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    y, x = np.mgrid[0:h, 0:w]
    return sun_raster_encode(((doc_id + x + y) % 256).astype(np.uint8))


def sgi_payload(doc_id: int) -> bytes:
    w, h = 4 + doc_id % 8, 3 + doc_id % 5
    y, x = np.mgrid[0:h, 0:w]
    return sgi_encode(((doc_id + x + y) % 256).astype(np.uint8))
