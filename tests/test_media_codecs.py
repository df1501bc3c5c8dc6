"""Real media codecs: BMP/WAV/Y4M roundtrips, spec edge cases, and
malformed-input rejection (the kernels' ValueError contract)."""

import struct

import numpy as np
import pyarrow as pa
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


# ---------------------------------------------------------- PNG / GIF / AU


def test_png_roundtrip_and_crc_check():
    from dedoc_ray.ops.media_codecs import png_decode, png_encode

    rng = np.random.RandomState(3)
    for _ in range(5):
        g = rng.randint(0, 256, (rng.randint(1, 30), rng.randint(1, 30))).astype(np.uint8)
        assert (png_decode(png_encode(g)) == g).all()
    data = bytearray(png_encode(g))
    data[40] ^= 0xFF  # flip a pixel byte inside IDAT → CRC must catch it
    with pytest.raises(ValueError):
        png_decode(bytes(data))
    with pytest.raises(ValueError):
        png_decode(b"\x89PNG\r\n\x1a\nnot-a-chunk")


def test_png_all_filter_types_decode():
    """Hand-build one stream per filter type (Sub/Up/Average/Paeth) and pin
    the reconstruction to the spec's reference unfilter."""
    import zlib

    from dedoc_ray.ops.media_codecs import _paeth, _png_chunk, png_decode

    rng = np.random.RandomState(5)
    truth = rng.randint(0, 256, (6, 9)).astype(np.uint8)
    for ftype in (1, 2, 3, 4):
        rows = []
        prior = np.zeros(9, np.int32)
        for y in range(6):
            recon = truth[y].astype(np.int32)
            raw = np.zeros(9, np.int32)
            for x in range(9):
                a = recon[x - 1] if x else 0
                b, c = prior[x], (prior[x - 1] if x else 0)
                pred = {1: a, 2: b, 3: (a + b) // 2, 4: _paeth(a, b, c)}[ftype]
                raw[x] = (recon[x] - pred) & 0xFF
            rows.append(bytes([ftype]) + raw.astype(np.uint8).tobytes())
            prior = recon
        ihdr = struct.pack(">IIBBBBB", 9, 6, 8, 0, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _png_chunk(b"IEND", b"")
        )
        assert (png_decode(data) == truth).all(), f"filter {ftype}"


def test_png_rgb_color_type_channel_mean():
    import zlib

    from dedoc_ray.ops.media_codecs import _png_chunk, png_decode

    rgb = np.array([[[30, 60, 90], [255, 0, 1]]], np.uint8)  # 1x2 RGB
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + rgb.tobytes()))
        + _png_chunk(b"IEND", b"")
    )
    assert (png_decode(data) == np.array([[60, 85]], np.uint8)).all()


def test_gif_roundtrip_including_lzw_width_growth():
    from dedoc_ray.ops.media_codecs import gif_decode, gif_encode

    rng = np.random.RandomState(11)
    small = rng.randint(0, 256, (3, 5)).astype(np.uint8)
    assert (gif_decode(gif_encode(small)) == small).all()
    # large enough to grow the code width to 12 bits and reset the table
    big = rng.randint(0, 256, (150, 200)).astype(np.uint8)
    assert (gif_decode(gif_encode(big)) == big).all()


def test_gif_skips_extensions_and_rejects_garbage():
    from dedoc_ray.ops.media_codecs import gif_decode, gif_encode

    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    data = gif_encode(g)
    # splice a graphic-control extension between LSD+GCT and the image
    head, img = data[: 13 + 768], data[13 + 768 : ]
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    assert (gif_decode(head + ext + img) == g).all()
    with pytest.raises(ValueError):
        gif_decode(b"GIF89a" + b"\x00" * 7)
    with pytest.raises(ValueError):
        gif_decode(b"JIF89a" + data[6:])


def test_au_pcm_roundtrip_and_ulaw_tables():
    from dedoc_ray.ops.media_codecs import au_decode, au_encode, ulaw_decode, ulaw_encode

    s = np.array([0, 1, -1, 500, -500, 32767, -32768], np.int16)
    dec, rate = au_decode(au_encode(s, 22050))
    assert rate == 22050 and (dec == s).all()
    # G.711 idempotence on codes (0x7F is "negative zero" — never emitted)
    codes = np.array([c for c in range(256) if c != 0x7F], np.uint8)
    assert (ulaw_encode(ulaw_decode(codes)) == codes).all()
    # µ-law quantization error bounded by the segment step size
    rng = np.random.RandomState(2)
    x = rng.randint(-32000, 32000, 2000).astype(np.int16)
    y, _ = au_decode(au_encode(x, 8000, ulaw=True))
    err = np.abs(y.astype(np.int32) - x.astype(np.int32))
    step = np.maximum(8, (np.abs(x.astype(np.int32)) + 0x84) // 16)
    assert (err <= step).all()
    with pytest.raises(ValueError):
        au_decode(b"nosd" + b"\x00" * 24)


def test_new_payloads_equal_uncompressed_fields():
    """PNG/GIF payloads decode to the exact BMP pixel field; AU to the WAV
    samples — one SQL oracle covers each family."""
    from dedoc_ray.ops.media_codecs import (
        au_decode,
        au_payload,
        bmp_decode,
        bmp_payload,
        gif_decode,
        gif_payload,
        png_decode,
        png_payload,
        wav_decode,
        wav_payload,
    )

    for d in (0, 3, 41, 255, 1234):
        want = bmp_decode(bmp_payload(d))
        assert (png_decode(png_payload(d)) == want).all()
        assert (gif_decode(gif_payload(d)) == want).all()
        sa, ra = au_decode(au_payload(d))
        sw, rw = wav_decode(wav_payload(d))
        assert ra == rw and (sa == sw).all()


# ------------------------------------------------------------------ TIFF


def test_tiff_roundtrip_both_compressions():
    from dedoc_ray.ops.media_codecs import tiff_decode, tiff_encode

    rng = np.random.RandomState(8)
    for _ in range(6):
        g = rng.randint(0, 256, (rng.randint(1, 40), rng.randint(1, 40))).astype(np.uint8)
        assert (tiff_decode(tiff_encode(g)) == g).all()
        assert (tiff_decode(tiff_encode(g, packbits=True)) == g).all()


def test_tiff_big_endian_and_white_is_zero():
    """Hand-build an MM (big-endian) WhiteIsZero TIFF and pin the decode."""
    from dedoc_ray.ops.media_codecs import tiff_decode

    g = np.array([[0, 100], [200, 255]], np.uint8)
    inverted = (255 - g.astype(np.int16)).astype(np.uint8)
    entries = [
        (256, 4, 1, 2), (257, 4, 1, 2), (258, 3, 1, 8 << 16), (259, 3, 1, 1 << 16),
        (262, 3, 1, 0), (273, 4, 1, 0), (277, 3, 1, 1 << 16), (278, 4, 1, 2),
        (279, 4, 1, 4),
    ]
    data_off = 8 + 2 + 12 * len(entries) + 4
    out = bytearray(struct.pack(">2sHI", b"MM", 42, 8)) + struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0) + inverted.tobytes()
    assert (tiff_decode(bytes(out)) == g).all()


def test_tiff_rejects_unsupported():
    from dedoc_ray.ops.media_codecs import tiff_decode, tiff_encode

    with pytest.raises(ValueError):
        tiff_decode(b"XX*\x00" + b"\x00" * 20)
    data = bytearray(tiff_encode(np.zeros((4, 4), np.uint8)))
    # patch Compression (tag 259) value to 6 (old-style JPEG — unsupported)
    idx = data.index(struct.pack("<HHII", 259, 3, 1, 1))
    data[idx + 8] = 6
    with pytest.raises(ValueError, match="compression"):
        tiff_decode(bytes(data))


def test_packbits_edge_runs():
    from dedoc_ray.ops.media_codecs import packbits_decode, packbits_encode

    rng = np.random.RandomState(1)
    for s in (b"", b"a", b"aaa", b"abcabc", b"a" * 300, b"ab" * 100,
              bytes(rng.randint(0, 3, 999, dtype=np.uint8))):
        assert packbits_decode(packbits_encode(s), len(s)) == s


def test_scan_route_decodes_png_and_tiff_rasters():
    from dedoc_ray.readers.scan_ocr import read_scan
    from dedoc_ray.readers.sniff import sniff_format
    from dedoc_ray.sources.scan_writer import scan_pgm, scan_png, scan_tiff

    text = "alpha the beta the gamma"
    want = [ln.line for ln in read_scan(scan_pgm(5, text)).lines]
    for gen, ext in ((scan_png, "png"), (scan_tiff, "tif")):
        data = gen(5, text)
        assert sniff_format("", data) == "pgm"
        assert sniff_format(f"https://x.test/p.{ext}", data) == "pgm"
        got = [ln.line for ln in read_scan(data).lines]
        assert got == want


# ------------------------------------------------------------- AVI / MJPEG


def test_avi_mjpeg_roundtrip_and_payload():
    from dedoc_ray.ops.media_codecs import (
        avi_mjpeg_decode,
        avi_mjpeg_encode,
        avi_payload,
        y4m_decode,
        y4m_payload,
    )

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, (16, 24)).astype(np.uint8) for _ in range(7)]
    out = avi_mjpeg_decode(avi_mjpeg_encode(frames))
    assert len(out) == 7
    for a, b in zip(out, frames):
        assert a.shape == b.shape and np.abs(a.astype(int) - b.astype(int)).max() <= 1
    # constant-frame payload matches the Y4M field exactly (shared oracle)
    for d in (0, 3, 19, 255):
        got = avi_mjpeg_decode(avi_payload(d))
        want = y4m_decode(y4m_payload(d))
        assert len(got) == len(want) and all((g == w).all() for g, w in zip(got, want))


def test_avi_rejects_malformed():
    from dedoc_ray.ops.media_codecs import avi_mjpeg_decode, avi_mjpeg_encode

    with pytest.raises(ValueError):
        avi_mjpeg_decode(b"RIFF\x00\x00\x00\x00WAVE")
    data = bytearray(avi_mjpeg_encode([np.zeros((8, 8), np.uint8)]))
    data = data[:-10]  # truncate into the frame chunk
    with pytest.raises(ValueError):
        avi_mjpeg_decode(bytes(data))


# ------------------------------------------------------------- IMA ADPCM


def test_adpcm_tracks_smooth_signal_and_preserves_count():
    from dedoc_ray.ops.media_codecs import ima_adpcm_encode, wav_decode

    t = np.arange(3000)
    s = (3000 * np.sin(t / 30)).astype(np.int16)
    dec, rate = wav_decode(ima_adpcm_encode(s, 8000))
    assert rate == 8000 and len(dec) == len(s)
    assert np.abs(dec.astype(int) - s.astype(int)).mean() < 120
    # ~4:1 compression vs PCM-16
    assert len(ima_adpcm_encode(s, 8000)) < len(s)


def test_adpcm_decode_is_deterministic_and_bounded():
    from dedoc_ray.ops.media_codecs import ima_adpcm_encode, wav_decode

    rng = np.random.RandomState(7)
    s = rng.randint(-32768, 32768, 777).astype(np.int16)
    a, _ = wav_decode(ima_adpcm_encode(s, 11025))
    b, _ = wav_decode(ima_adpcm_encode(s, 11025))
    assert (a == b).all() and len(a) == 777
    assert a.min() >= -32768 and a.max() <= 32767


def test_adpcm_payload_count_matches_wav_field():
    from dedoc_ray.ops.media_codecs import adpcm_payload, wav_decode, wav_payload

    for d in (0, 9, 123, 999):
        sa, ra = wav_decode(adpcm_payload(d))
        sw, rw = wav_decode(wav_payload(d))
        assert ra == rw and len(sa) == len(sw)
    with pytest.raises(ValueError):
        # ADPCM without a fact chunk must be rejected
        from dedoc_ray.ops.media_codecs import ima_adpcm_encode

        data = ima_adpcm_encode(np.zeros(10, np.int16), 8000)
        i = data.index(b"fact")
        wav_decode(data[:i] + data[i + 16:])


def test_mixed_corpus_dispatch_covers_all_six_formats():
    from dedoc_ray.ops.multimodal import ImageFeatureKernel
    from dedoc_ray.ops import media_codecs as mc
    from dedoc_ray.ops.jpeg_codec import jpeg_payload, jpeg_payload_color

    fns = [mc.bmp_payload, mc.png_payload, mc.gif_payload, mc.tiff_payload,
           jpeg_payload, jpeg_payload_color]
    ids = list(range(12))  # two of each format
    batch = pa.Table.from_pydict(
        {"doc_id": ids, "image": [fns[d % 6](d) for d in ids]}
    )
    out = ImageFeatureKernel()(batch).to_pylist()
    for row in out:
        d = row["doc_id"]
        if d % 6 <= 3:
            assert row["width"] == 4 + d % 8 and row["height"] == 3 + d % 5
        else:
            assert row["width"] == 12 + (d % 6) * 4 and row["height"] == 10 + (d % 4) * 6
            assert row["mean_pixel"] == d % 256
