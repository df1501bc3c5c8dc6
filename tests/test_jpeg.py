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


# ----------------------------------------------------------- progressive


def test_progressive_matches_baseline_bit_for_bit():
    """SOF2 multi-scan reconstruction accumulates the SAME quantized
    coefficients the baseline stream carries — decoded pixels must be
    identical, not merely close."""
    from dedoc_ray.ops.jpeg_codec import jpeg_encode_progressive

    rng = np.random.RandomState(6)
    for shape in ((8, 8), (10, 13), (33, 47), (1, 1)):
        g = rng.randint(0, 256, shape).astype(np.uint8)
        assert (jpeg_decode(jpeg_encode(g)) == jpeg_decode(jpeg_encode_progressive(g))).all()


def test_progressive_constant_exactness_and_eob_runs():
    from dedoc_ray.ops.jpeg_codec import jpeg_encode_progressive

    for v in (0, 7, 128, 255):
        g = np.full((10, 13), v, np.uint8)
        assert (jpeg_decode(jpeg_encode_progressive(g)) == g).all()
    # a 6x6-block page of near-constant gray → one long EOB run across blocks
    g = np.full((48, 48), 100, np.uint8)
    g[0, 0] = 101
    assert (jpeg_decode(jpeg_encode_progressive(g)) == jpeg_decode(jpeg_encode(g))).all()


def test_progressive_rejects_unsupported_shapes():
    from dedoc_ray.ops.jpeg_codec import jpeg_encode_progressive

    data = bytearray(jpeg_encode_progressive(np.full((16, 16), 9, np.uint8)))
    sof = data.find(b"\xff\xc2")
    data[sof + 9] = 3  # claim 3 components
    with pytest.raises(ValueError):
        jpeg_decode(bytes(data))
    # a combined 0..63 scan is sequential-only, illegal under SOF2
    data = bytearray(jpeg_encode_progressive(np.full((16, 16), 9, np.uint8)))
    i = data.find(bytes([1, 63, 0x00]))  # the AC SOS tail Ss=1 Se=63 AhAl=0
    data[i] = 0
    with pytest.raises(ValueError, match="AC band"):
        jpeg_decode(bytes(data))


def test_progressive_ac_successive_approximation_matches_baseline():
    """The full T.81 G.1.2.3 path: AC first pass at Al=1 + refinement scan
    with buffered correction bits — still bit-identical to baseline."""
    from dedoc_ray.ops.jpeg_codec import jpeg_encode_progressive

    rng = np.random.RandomState(17)
    for shape in ((8, 8), (24, 88), (33, 47)):
        g = rng.randint(0, 256, shape).astype(np.uint8)
        want = jpeg_decode(jpeg_encode(g))
        got = jpeg_decode(jpeg_encode_progressive(g, refine_ac=True))
        assert (got == want).all(), shape
    # larger quant steps mix zero / newly-significant / history coefficients
    q = np.full(64, 4, np.uint16)
    g = rng.randint(0, 256, (32, 48)).astype(np.uint8)
    assert (
        jpeg_decode(jpeg_encode_progressive(g, quant=q, refine_ac=True))
        == jpeg_decode(jpeg_encode(g, quant=q))
    ).all()


def test_progressive_payload_matches_formula():
    from dedoc_ray.ops.jpeg_codec import jpeg_payload_progressive

    for d in (0, 5, 100, 999):
        img = jpeg_decode(jpeg_payload_progressive(d))
        assert img.shape == (10 + (d % 4) * 6, 12 + (d % 6) * 4)
        assert (img == d % 256).all()


def test_progressive_color_matches_baseline_color():
    """Multi-component SOF2: interleaved DC scans (per-component
    predictors) + per-component AC bands — planes bit-identical to the
    baseline color decode for both subsamplings."""
    from dedoc_ray.ops.jpeg_codec import (
        jpeg_decode_planes,
        jpeg_encode_color,
        jpeg_encode_progressive_color,
    )

    rng = np.random.RandomState(8)
    for shape in ((16, 16), (20, 25), (7, 9)):
        for sub in ("420", "444"):
            y = rng.randint(0, 256, shape).astype(np.uint8)
            cb = rng.randint(0, 256, shape).astype(np.uint8)
            cr = rng.randint(0, 256, shape).astype(np.uint8)
            base = jpeg_decode_planes(jpeg_encode_color(y, cb, cr, sub))
            prog = jpeg_decode_planes(jpeg_encode_progressive_color(y, cb, cr, sub))
            for a, b in zip(base, prog):
                assert (a == b).all(), (shape, sub)


def test_progressive_color_payload_matches_formula():
    from dedoc_ray.ops.jpeg_codec import jpeg_payload_progressive_color

    for d in (0, 5, 100, 999):
        img = jpeg_decode(jpeg_payload_progressive_color(d))
        assert img.shape == (10 + (d % 4) * 6, 12 + (d % 6) * 4)
        assert (img == d % 256).all()


def test_12bit_precision_roundtrip():
    """Extended-sequential 12-bit: constant values decode bit-exactly
    (uint16 plane), random within one level; stream-carried wide Huffman
    tables (DC categories to 15, AC to 14)."""
    rng = np.random.RandomState(2)
    for v in (0, 1, 2048, 4095):
        g = np.full((10, 13), v, np.uint16)
        out = jpeg_decode(jpeg_encode(g, precision=12))
        assert out.dtype == np.uint16 and (out == g).all(), v
    g = rng.randint(0, 4096, (30, 41)).astype(np.uint16)
    out = jpeg_decode(jpeg_encode(g, precision=12))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1
    with pytest.raises(ValueError):
        jpeg_encode(g, precision=10)
