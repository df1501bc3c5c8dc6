"""Real media codecs: BMP/WAV/Y4M roundtrips, spec edge cases, and
malformed-input rejection (the kernels' ValueError contract)."""

import struct

import numpy as np
import pytest

from dedoc_ray.ops.media_codecs import (
    bmp_decode,
    bmp_encode,
    bmp_payload,
    wav_decode,
    wav_encode,
    wav_payload,
    y4m_decode,
    y4m_encode,
    y4m_payload,
)


def test_bmp_roundtrip_with_stride_padding():
    # w=5 → 15-byte rows padded to 16: exercises the 4-byte stride rule
    g = (np.arange(30, dtype=np.uint8) * 7 % 256).reshape(6, 5)
    assert (bmp_decode(bmp_encode(g)) == g).all()


def test_bmp_topdown_variant():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = bytearray(bmp_encode(g))
    # flip to negative height (top-down storage): reorder rows accordingly
    h = struct.unpack("<i", data[22:26])[0]
    data[22:26] = struct.pack("<i", -h)
    stride = 4 * 3  # w=4 → 12 bytes, already aligned
    rows = [bytes(data[54 + i * stride : 54 + (i + 1) * stride]) for i in range(3)]
    data[54:] = b"".join(reversed(rows))
    assert (bmp_decode(bytes(data)) == g).all()


def test_bmp_rejects_non_bmp_and_truncated():
    with pytest.raises(ValueError):
        bmp_decode(b"PNG....")
    g = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError):
        bmp_decode(bmp_encode(g)[:-5])


def test_wav_roundtrip_and_unknown_chunk_skip():
    s = ((np.arange(333) * 31) % 200 - 100).astype(np.int16)
    data = wav_encode(s, 22050)
    # splice an unknown odd-length chunk between fmt and data (word-aligned)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\0"
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    s2, rate = wav_decode(spliced)
    assert rate == 22050 and (s2 == s).all()


def test_wav_rejects_stereo_and_missing_data():
    s = np.zeros(10, np.int16)
    data = bytearray(wav_encode(s, 8000))
    data[22:24] = struct.pack("<H", 2)  # channels=2
    with pytest.raises(ValueError):
        wav_decode(bytes(data))
    with pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_y4m_roundtrip_and_frame_count():
    frames = [np.full((8, 12), (i * 11) % 256, np.uint8) for i in range(7)]
    out = y4m_decode(y4m_encode(frames, fps=30))
    assert len(out) == 7
    assert all((a == b).all() for a, b in zip(frames, out))


def test_y4m_rejects_bad_chroma_and_truncation():
    frames = [np.zeros((8, 8), np.uint8)]
    data = y4m_encode(frames)
    with pytest.raises(ValueError):
        y4m_decode(data.replace(b"C420", b"C444"))
    with pytest.raises(ValueError):
        y4m_decode(data[:-10])


def test_payloads_match_documented_formulas():
    d = 37
    g = bmp_decode(bmp_payload(d))
    assert g.shape == (3 + d % 5, 4 + d % 8)
    assert g[1, 2] == (d + 2 + 1) % 256
    s, rate = wav_decode(wav_payload(d))
    assert rate == 8000 + (d % 8) * 1000 and len(s) == 500 + (d % 50) * 20
    assert s[3] == (d * 7 + 3) % 200 - 100
    planes = y4m_decode(y4m_payload(d))
    assert len(planes) == 10 + d % 20
    assert int(planes[2][0, 0]) == (d + 2) % 256
