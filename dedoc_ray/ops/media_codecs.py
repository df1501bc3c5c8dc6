"""Real codecs for the uncompressed media container family — BMP, WAV, Y4M.

The multimodal stages (ops/multimodal.py) were designed with the decode step
swappable: compressed codecs (JPEG/MP3/H.264) need PIL/ffmpeg, absent in this
container, and stay gated. But the classic UNCOMPRESSED containers are plain
public formats parseable with struct + numpy — so this module implements them
for real, moving the image/audio/video decode stages from "stub" to "actual
codec" for:

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

import struct
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
    """RIFF/WAVE PCM-16 mono → (int16 samples, sample_rate). Walks chunks
    in file order, skipping unknown ones (word-aligned) per the RIFF spec."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if tag != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (PCM-16 mono only)")
        elif cid == b"data":
            samples = np.frombuffer(payload[: len(payload) & ~1], "<i2")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt or data chunk")
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
