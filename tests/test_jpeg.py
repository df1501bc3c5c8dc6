"""Baseline JPEG codec (ops/jpeg_codec.py) — the exactness contract the SQL
oracle relies on, plus spec-path coverage (filters of the entropy layer:
byte stuffing, restart markers, ZRL runs, custom quant tables)."""

import numpy as np
import pytest

from dedoc_ray.ops.jpeg_codec import jpeg_decode, jpeg_encode, jpeg_payload


def test_constant_images_decode_bit_exactly_all_levels():
    """The oracle contract: every constant gray level survives the float
    DCT/quant/IDCT roundtrip bit-exactly with the flat quant table."""
    for v in range(256):
        g = np.full((10, 13), v, np.uint8)
        out = jpeg_decode(jpeg_encode(g))
        assert out.shape == g.shape and (out == g).all(), v


def test_random_images_within_one_gray_level():
    rng = np.random.RandomState(4)
    for _ in range(8):
        h, w = rng.randint(1, 50), rng.randint(1, 50)
        g = rng.randint(0, 256, (h, w)).astype(np.uint8)
        out = jpeg_decode(jpeg_encode(g))
        assert out.shape == g.shape
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


def test_byte_stuffing_roundtrip():
    """A block engineered so the entropy stream emits 0xFF bytes (stuffed as
    0xFF00) — near-saturated values produce long all-ones Huffman runs."""
    g = np.full((8, 8), 255, np.uint8)
    g[0, 0] = 0
    data = jpeg_encode(g)
    assert (jpeg_decode(data) == g).all()


def test_restart_markers():
    rng = np.random.RandomState(9)
    g = rng.randint(0, 256, (40, 56)).astype(np.uint8)
    for ri in (1, 3, 8):
        out = jpeg_decode(jpeg_encode(g, restart=ri))
        assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


def test_custom_quant_table_lossy_but_close():
    rng = np.random.RandomState(1)
    g = rng.randint(100, 156, (24, 24)).astype(np.uint8)  # low-contrast
    q = np.full(64, 8, np.uint16)
    out = jpeg_decode(jpeg_encode(g, quant=q))
    assert np.abs(out.astype(int) - g.astype(int)).mean() < 8


def test_rejects_malformed_and_unsupported():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG not a jpeg")
    data = bytearray(jpeg_encode(np.zeros((8, 8), np.uint8)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # progressive marker
    with pytest.raises(ValueError):
        jpeg_decode(bytes(data))
    # truncated entropy data
    with pytest.raises(ValueError):
        jpeg_decode(jpeg_encode(np.full((16, 16), 7, np.uint8))[:-20])


def test_payload_formula_matches_decode():
    for d in (0, 5, 100, 999, 4321):
        img = jpeg_decode(jpeg_payload(d))
        assert img.shape == (10 + (d % 4) * 6, 12 + (d % 6) * 4)
        assert (img == d % 256).all()


# ----------------------------------------------------------------- color


def test_color_444_constant_planes_exact():
    from dedoc_ray.ops.jpeg_codec import jpeg_decode_planes, jpeg_encode_color

    y = np.full((20, 25), 77, np.uint8)
    cb = np.full((20, 25), 100, np.uint8)
    cr = np.full((20, 25), 200, np.uint8)
    py, pcb, pcr = jpeg_decode_planes(jpeg_encode_color(y, cb, cr, "444"))
    assert (py == 77).all() and (pcb == 100).all() and (pcr == 200).all()


def test_color_420_random_planes_within_one_level():
    from dedoc_ray.ops.jpeg_codec import jpeg_decode_planes, jpeg_encode_color

    rng = np.random.RandomState(12)
    y = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    cb = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    cr = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    py, pcb, pcr = jpeg_decode_planes(jpeg_encode_color(y, cb, cr, "420"))
    assert np.abs(py.astype(int) - y.astype(int)).max() <= 1
    # chroma comes back as the 2x2 box mean replicated to full res
    want = (cb[0::2, 0::2].astype(int) + cb[0::2, 1::2] + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4
    # ±0.5 from the fractional box mean + ±1 from the DCT/quant roundtrip
    assert np.abs(pcb[0::2, 0::2].astype(float) - want).max() <= 1.5
    assert (pcb[0::2, 0::2] == pcb[1::2, 1::2]).all()  # replication, not interpolation


def test_color_payload_luma_matches_grayscale_oracle():
    from dedoc_ray.ops.jpeg_codec import jpeg_decode, jpeg_payload_color

    for d in (0, 7, 123, 999):
        img = jpeg_decode(jpeg_payload_color(d))  # returns the luma plane
        assert img.shape == (10 + (d % 4) * 6, 12 + (d % 6) * 4)
        assert (img == d % 256).all()


def test_color_odd_dimensions_and_grayscale_still_ok():
    from dedoc_ray.ops.jpeg_codec import jpeg_decode_planes, jpeg_encode_color

    rng = np.random.RandomState(3)
    for h, w in ((1, 1), (7, 9), (17, 31)):
        y = rng.randint(0, 256, (h, w)).astype(np.uint8)
        cb = np.full((h, w), 128, np.uint8)
        cr = np.full((h, w), 128, np.uint8)
        py, pcb, pcr = jpeg_decode_planes(jpeg_encode_color(y, cb, cr, "420"))
        assert py.shape == (h, w)
        assert np.abs(py.astype(int) - y.astype(int)).max() <= 1
        assert (pcb == 128).all() and (pcr == 128).all()
