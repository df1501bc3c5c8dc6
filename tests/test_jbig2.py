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
    generic_decode,
    generic_encode,
    jbig2_decode_embedded,
    jbig2_encode_embedded,
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


def test_embedded_rejects_symbol_regions():
    import struct

    # a symbol-dictionary segment header (type 0) must raise, not garble
    seg = struct.pack(">IB", 0, 0) + b"\x00" + bytes([1]) + struct.pack(">I", 2) + b"\x00\x00"
    with pytest.raises(BadJbig2):
        jbig2_decode_embedded(seg)


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
    from dedoc_ray.sources.scan_writer import scan_pdf, scan_pdf_jbig2

    m = DedocRayManager()
    text = "the quick brown fox jumps over the lazy dog " * 3
    flate = m.parse(data=scan_pdf(7, text), file_name="scan.pdf")
    jbig2 = m.parse(data=scan_pdf_jbig2(7, text), file_name="scan_jbig2.pdf")
    assert jbig2["status"] == "ok"
    assert "Document 7" in jbig2["extracted_text"]
    # identical raster, identical OCR result across the two codecs
    assert jbig2["extracted_text"] == flate["extracted_text"]
