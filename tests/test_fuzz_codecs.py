"""Fuzz: this round's codecs fail CLOSED on arbitrary/corrupted bytes.

A 100 TB crawl corpus contains truncated and bit-flipped members; the
extraction kernel catches per-row errors, but only typed ValueError-family
exceptions keep the error column meaningful (and no input may hang or
exhaust memory). Targets: RAR3/RAR5 LZ (readers/rar_decode), PPMd var.H
under both coders (ops/ppmd), JPEG 2000 (ops/jpeg2000), and the glyph
recovery path (readers/ttf_glyphs)."""

from __future__ import annotations

import pathlib

import pytest
from hypothesis import given, settings, strategies as st

from dedoc_ray.ops.jpeg2000 import BadJ2K, j2k_decode
from dedoc_ray.ops.ppmd import PpmdError, ppmd7_decompress, ppmd_rar_compress
from dedoc_ray.readers.rar import BadRar, rar_encode_ppm, rar_encode_stored, rar_list
from dedoc_ray.readers.rar_decode import Rar3Decoder, Rar5Decoder, RarDecodeError
from dedoc_ray.readers.ttf_glyphs import recover_unicode_map

OK_ERRORS = (ValueError, IndexError, KeyError, EOFError, OverflowError, ZeroDivisionError)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=1024))
def test_rar_list_fails_closed(data):
    for prefix in (b"", b"Rar!\x1a\x07\x00", b"Rar!\x1a\x07\x01\x00"):
        try:
            rar_list(prefix + data)
        except OK_ERRORS:
            pass


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=512), st.integers(min_value=1, max_value=4096))
def test_rar_lz_decoders_fail_closed(packed, size):
    try:
        Rar5Decoder().decode_member(packed, size)
    except OK_ERRORS:
        pass
    try:
        Rar3Decoder().decode_member(packed, size)
    except OK_ERRORS:
        pass


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=512), st.integers(min_value=1, max_value=2048))
def test_ppmd_decoder_fails_closed(packed, size):
    try:
        ppmd7_decompress(packed, size, order=6, mem_size=1 << 20)
    except OK_ERRORS:
        pass


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_ppmd_rar_roundtrip_random_payloads(payload):
    # not just fail-closed: arbitrary payloads must ROUNDTRIP
    arc = rar_encode_ppm([("f", payload)], order=4, mem_mb=4)
    (m,) = [m for m in rar_list(arc) if not m.is_dir]
    assert m.payload == payload


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=1024))
def test_j2k_fails_closed(data):
    for prefix in (b"", b"\xff\x4f\xff\x51"):
        try:
            j2k_decode(prefix + data)
        except OK_ERRORS:
            pass


def test_j2k_truncations_fail_closed():
    fixture = pathlib.Path("/root/reference/tests/data/scanned/example.j2k")
    if not fixture.exists():
        pytest.skip("fixture absent")
    data = fixture.read_bytes()
    for cut in (8, 40, 90, 300, 5000, len(data) - 7):
        try:
            j2k_decode(data[:cut])
        except OK_ERRORS:
            pass
    # bit flips in the codestream header region
    for pos in (4, 20, 52, 80):
        mutated = bytearray(data)
        mutated[pos] ^= 0xFF
        try:
            j2k_decode(bytes(mutated))
        except OK_ERRORS:
            pass


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=2048))
def test_glyph_recovery_fails_closed(data):
    # arbitrary bytes and sfnt-prefixed garbage both yield {} or a dict
    for prefix in (b"", b"\x00\x01\x00\x00"):
        out = recover_unicode_map(prefix + data)
        assert isinstance(out, dict)
