"""JBIG2 (ops/jbig2.py) — MQ coder pair, generic region, embedded layer.

The MQ DECODER's state machine is already pixel-validated against an
independent encoder via the JPEG 2000 fixture (tests/test_jpeg2000.py —
the state table and decode procedure are shared); these tests pin the
ENCODER against that decoder, the template-0 generic region in both
directions, the PDF embedded-segment layer, and the end-to-end scanned
PDF with /JBIG2Decode through the manager."""

import random

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from dedoc_ray.ops.jbig2 import (
    BadJbig2,
    MQDec,
    MQEnc,
    decode_symbol_dict,
    decode_text_region,
    encode_symbol_dict,
    encode_text_region,
    generic_decode,
    generic_encode,
    jbig2_decode_embedded,
    jbig2_encode_embedded,
    jbig2_encode_symbols,
)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_mq_coder_pair_roundtrips(seed):
    rnd = random.Random(seed)
    n = rnd.randint(1, 800)
    bits = [rnd.getrandbits(1) for _ in range(n)]
    ctxs = [rnd.randrange(64) for _ in range(n)]
    enc = MQEnc()
    for c, b in zip(ctxs, bits):
        enc.encode(c, b)
    data = enc.flush()
    dec = MQDec(data)
    assert [dec.decode(c) for c in ctxs] == bits


@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_roundtrips(tpgdon):
    rng = np.random.default_rng(11)
    cases = [
        np.zeros((30, 40), np.uint8),
        np.ones((30, 40), np.uint8),
        (rng.random((70, 110)) < 0.08).astype(np.uint8),
        (rng.random((65, 127)) < 0.5).astype(np.uint8),
    ]
    text_like = np.zeros((48, 180), np.uint8)
    text_like[8:11, 4:170] = 1
    text_like[20:44:4, 25:80] = 1
    cases.append(text_like)
    for bm in cases:
        enc = generic_encode(bm, tpgdon=tpgdon)
        dec = generic_decode(enc, bm.shape[1], bm.shape[0], tpgdon=tpgdon)
        assert (dec == bm).all()


def test_embedded_segment_layer_roundtrip():
    rng = np.random.default_rng(5)
    bm = (rng.random((40, 90)) < 0.12).astype(np.uint8)
    stream = jbig2_encode_embedded(bm)
    out = jbig2_decode_embedded(stream)
    assert out.shape == bm.shape and (out == bm).all()


def test_embedded_rejects_truncated_symbol_dict():
    import struct

    # a truncated symbol-dictionary segment (type 0) must raise, not garble
    seg = struct.pack(">IB", 0, 0) + b"\x00" + bytes([1]) + struct.pack(">I", 2) + b"\x00\x00"
    with pytest.raises(BadJbig2):
        jbig2_decode_embedded(seg)


@pytest.mark.parametrize("template", [1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_templates_1_to_3_roundtrip(template, tpgdon):
    rng = np.random.default_rng(template * 7 + tpgdon)
    bm = (rng.random((40, 70)) < 0.15).astype(np.uint8)
    enc = generic_encode(bm, tpgdon=tpgdon, template=template)
    dec = generic_decode(enc, 70, 40, tpgdon=tpgdon, template=template)
    assert (dec == bm).all()


def test_generic_non_nominal_at_pixels_roundtrip():
    rng = np.random.default_rng(9)
    bm = (rng.random((30, 50)) < 0.2).astype(np.uint8)
    ats = [(1, -1), (-2, -1), (1, -2), (-1, -2)]
    enc = generic_encode(bm, template=0, ats=ats)
    dec = generic_decode(enc, 50, 30, template=0, ats=ats)
    assert (dec == bm).all()
    with pytest.raises(BadJbig2):  # non-causal AT pixel fails closed
        generic_decode(enc, 50, 30, template=0, ats=[(1, 0), (-2, -1), (1, -2), (-1, -2)])


def test_symbol_dictionary_roundtrip_height_classes():
    rng = np.random.default_rng(21)
    syms = []
    for hgt, wid in [(5, 3), (5, 7), (7, 4), (7, 4), (9, 9), (9, 2)]:
        m = (rng.random((hgt, wid)) < 0.5).astype(np.uint8)
        m[0, 0] = 1
        syms.append(m)
    syms.sort(key=lambda m: (m.shape[0], m.shape[1], m.tobytes()))
    out = decode_symbol_dict(encode_symbol_dict(syms), [])
    assert len(out) == len(syms)
    for a, b in zip(syms, out):
        assert (a == b).all()


@pytest.mark.parametrize("transposed", [0, 1])
@pytest.mark.parametrize("corner", [0, 1, 2, 3])
def test_text_region_all_corners(corner, transposed):
    # every REFCORNER × TRANSPOSED combination draws identical pixels
    # from page-coordinate instances — pinning the T/S interpretation
    rng = np.random.default_rng(corner * 2 + transposed)
    syms = []
    for hgt, wid in [(4, 6), (6, 3), (8, 8)]:
        m = (rng.random((hgt, wid)) < 0.5).astype(np.uint8)
        m[0, 0] = 1
        m[-1, -1] = 1
        syms.append(m)
    widths = [s.shape[1] for s in syms]
    heights = [s.shape[0] for s in syms]
    inst = [(3, 2, 0), (3, 12, 1), (14, 5, 2), (14, 20, 0), (25, 1, 1)]
    expect = np.zeros((40, 40), np.uint8)
    for t, s, sid in inst:
        sym = syms[sid]
        expect[t : t + sym.shape[0], s : s + sym.shape[1]] |= sym
    blob = encode_text_region(
        (40, 40), inst, widths, heights, refcorner=corner, transposed=transposed
    )
    region, _, _ = decode_text_region(blob, syms)
    assert (region == expect).all()


def test_symbol_coded_page_roundtrips_and_dedupes():
    rng = np.random.default_rng(3)
    page = np.zeros((60, 200), np.uint8)
    glyph = (rng.random((7, 5)) < 0.6).astype(np.uint8)
    glyph[0, 0] = 1
    for i in range(12):
        page[10:17, 8 * i + 4 : 8 * i + 9] |= glyph  # 12 copies → 1 symbol
    page[40:47, 20:25] = glyph
    stream = jbig2_encode_symbols(page)
    dec = jbig2_decode_embedded(stream)
    assert dec.shape == page.shape and (dec == page).all()
    # 13 instances of one deduped symbol must beat the generic coding of
    # a page that repeats it 13 times — the whole point of symbol mode
    assert len(stream) < len(jbig2_encode_embedded(page, tpgdon=True)) + 64


@settings(max_examples=15, deadline=None)
@given(st.integers(min_value=0, max_value=2**32 - 1))
def test_symbol_coded_random_pages_roundtrip(seed):
    rnd = random.Random(seed)
    rng = np.random.default_rng(seed)
    page = np.zeros((rnd.randint(20, 50), rnd.randint(30, 90)), np.uint8)
    for _ in range(rnd.randint(0, 14)):
        gh, gw = rnd.randint(1, 9), rnd.randint(1, 9)
        gy = rnd.randint(0, page.shape[0] - gh)
        gx = rnd.randint(0, page.shape[1] - gw)
        page[gy : gy + gh, gx : gx + gw] |= (rng.random((gh, gw)) < 0.7).astype(np.uint8)
    dec = jbig2_decode_embedded(jbig2_encode_symbols(page))
    out = np.zeros_like(page)
    out[: dec.shape[0], : dec.shape[1]] = dec[: page.shape[0], : page.shape[1]]
    assert (out == page).all()


@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=19, max_size=256))
def test_symbol_and_text_segments_fail_closed(data):
    try:
        decode_symbol_dict(data, [])
    except (BadJbig2, ValueError, IndexError, KeyError, OverflowError):
        pass
    try:
        decode_text_region(data, [np.ones((2, 2), np.uint8)])
    except (BadJbig2, ValueError, IndexError, KeyError, OverflowError):
        pass


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_embedded_fails_closed(data):
    try:
        jbig2_decode_embedded(data)
    except (BadJbig2, ValueError, IndexError, KeyError, OverflowError):
        pass
    except Exception as e:  # struct.error subclasses Exception only
        assert type(e).__module__ == "struct"


def test_scanned_pdf_with_jbig2_reads_end_to_end():
    from dedoc_ray.manager import DedocRayManager
    from dedoc_ray.sources.scan_writer import scan_pdf, scan_pdf_jbig2, scan_pdf_jbig2_sym

    m = DedocRayManager()
    text = "the quick brown fox jumps over the lazy dog " * 3
    flate = m.parse(data=scan_pdf(7, text), file_name="scan.pdf")
    jbig2 = m.parse(data=scan_pdf_jbig2(7, text), file_name="scan_jbig2.pdf")
    assert jbig2["status"] == "ok"
    assert "Document 7" in jbig2["extracted_text"]
    # identical raster, identical OCR result across the two codecs
    assert jbig2["extracted_text"] == flate["extracted_text"]
    # symbol-coded variant (dictionary + text region) — same raster again
    sym = m.parse(data=scan_pdf_jbig2_sym(7, text), file_name="scan_jbig2s.pdf")
    assert sym["status"] == "ok"
    assert sym["extracted_text"] == flate["extracted_text"]


# --------------------------------------------------------- halftone (6.6/6.7)


def test_pattern_dict_roundtrip():
    from dedoc_ray.ops.jbig2 import decode_pattern_dict, encode_pattern_dict

    rng = np.random.RandomState(11)
    pats = [(rng.rand(5, 5) > 0.5).astype(np.uint8) for _ in range(9)]
    out = decode_pattern_dict(encode_pattern_dict(pats))
    assert len(out) == 9
    for a, b in zip(pats, out):
        assert np.array_equal(a, b)


def test_halftone_region_roundtrip_density_patterns():
    from dedoc_ray.ops.jbig2 import _blit, jbig2_decode_embedded, jbig2_encode_halftone

    rng = np.random.RandomState(7)
    pats = []
    for k in range(17):  # 17 density levels → 5 Gray-coded bitplanes
        p = np.zeros(16, np.uint8)
        p[np.argsort((np.arange(16) * 7) % 16)[:k]] = 1
        pats.append(p.reshape(4, 4))
    gray = (rng.rand(12, 18) * 17).astype(np.int64)
    page = jbig2_decode_embedded(jbig2_encode_halftone(gray, pats))
    exp = np.zeros((48, 72), np.uint8)
    for m in range(12):
        for n in range(18):
            _blit(exp, pats[gray[m, n]], m * 4, n * 4, 0)
    assert np.array_equal(page, exp)


def test_halftone_region_binary_patterns():
    # 2 patterns → single bitplane, the bits=1 edge
    from dedoc_ray.ops.jbig2 import jbig2_decode_embedded, jbig2_encode_halftone

    rng = np.random.RandomState(3)
    pats = [np.zeros((3, 3), np.uint8), np.ones((3, 3), np.uint8)]
    g = (rng.rand(20, 30) > 0.6).astype(np.int64)
    page = jbig2_decode_embedded(jbig2_encode_halftone(g, pats))
    assert np.array_equal(page, np.kron(g, np.ones((3, 3))).astype(np.uint8))


def test_halftone_fails_closed():
    from dedoc_ray.ops.jbig2 import BadJbig2, decode_halftone_region, decode_pattern_dict

    with pytest.raises((BadJbig2, ValueError, IndexError)):
        decode_pattern_dict(b"\x01\x04\x04\x00\x00\x00\x03")  # MMR bit set
    with pytest.raises((BadJbig2, ValueError, IndexError)):
        decode_halftone_region(b"\x00" * 38, [])  # no patterns


# ------------------------------------------------------- refinement (6.3)


def test_refinement_region_roundtrip():
    from dedoc_ray.ops.jbig2 import decode_refinement_region, encode_refinement_region

    rng = np.random.RandomState(5)
    truth = (rng.rand(40, 60) > 0.7).astype(np.uint8)
    noisy = truth.copy()
    noisy[rng.rand(40, 60) < 0.05] ^= 1
    region, x, y = decode_refinement_region(encode_refinement_region(truth, noisy), noisy)
    assert (x, y) == (0, 0)
    assert np.array_equal(region, truth)


@pytest.mark.parametrize("template,dx,dy", [(0, 0, 0), (1, 0, 0), (0, 2, -1), (1, -3, 2)])
def test_refinement_templates_and_offsets(template, dx, dy):
    from dedoc_ray.ops.jbig2 import MQDec, MQEnc, _refine_decode_mq, _refine_encode_mq

    rng = np.random.RandomState(template * 10 + dx + dy + 50)
    truth = (rng.rand(25, 33) > 0.6).astype(np.uint8)
    ref = truth.copy()
    ref[rng.rand(25, 33) < 0.08] ^= 1
    mq = MQEnc()
    _refine_encode_mq(mq, {}, truth, ref, dx=dx, dy=dy, template=template)
    out = _refine_decode_mq(MQDec(mq.flush()), {}, 33, 25, ref, dx=dx, dy=dy, template=template)
    assert np.array_equal(out, truth)


def test_embedded_lossy_generic_plus_refinement_replaces_exactly():
    # the real lossy-to-lossless layout: generic region of a degraded
    # raster, then an immediate refinement region restoring the truth
    import struct as _s

    from dedoc_ray.ops import jbig2 as J

    rng = np.random.RandomState(9)
    truth = (rng.rand(30, 50) > 0.75).astype(np.uint8)
    noisy = truth.copy()
    noisy[rng.rand(30, 50) < 0.06] ^= 1
    page_info = _s.pack(">IIIIBH", 50, 30, 0, 0, 0, 0)
    region_info = _s.pack(">IIIIB", 50, 30, 0, 0, 0)
    ats = _s.pack(">bbbbbbbb", 3, -1, -3, -1, 2, -2, -2, -2)
    gpayload = region_info + bytes([8]) + ats + J.generic_encode(noisy, tpgdon=True)
    blob = J._segment(0, 48, 1, page_info)
    blob += J._segment(1, 39, 1, gpayload)
    blob += J._segment(2, 42, 1, J.encode_refinement_region(truth, noisy))
    blob += J._segment(3, 49, 1, b"")
    assert np.array_equal(J.jbig2_decode_embedded(blob), truth)
