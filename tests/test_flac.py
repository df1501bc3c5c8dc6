"""FLAC codec (ops/flac_codec.py) — losslessness IS the contract:
decode(encode(x)) must equal x bit-for-bit for every subframe type."""

import numpy as np
import pytest

from dedoc_ray.ops.flac_codec import flac_decode, flac_encode, flac_payload


def _sigs():
    rng = np.random.RandomState(3)
    return [
        np.full(5000, -123, np.int16),
        rng.randint(-32768, 32768, 7001).astype(np.int16),
        (8000 * np.sin(np.arange(9000) / 40)).astype(np.int16),
        np.arange(-3000, 3000, dtype=np.int16),
        np.array([5], np.int16),
    ]


@pytest.mark.parametrize("mode", ["auto", "verbatim", "lpc", "fixed0", "fixed2", "fixed4"])
def test_lossless_roundtrip_every_subframe_type(mode):
    for sig in _sigs():
        dec, rate = flac_decode(flac_encode(sig, 8000, subframe=mode))
        assert rate == 8000 and (dec == sig).all()


def test_multi_frame_and_empty():
    rng = np.random.RandomState(1)
    sig = rng.randint(-32768, 32768, 10000).astype(np.int16)
    dec, _ = flac_decode(flac_encode(sig, 44100, block_size=1024))
    assert (dec == sig).all()
    dec, _ = flac_decode(flac_encode(np.zeros(0, np.int16), 8000))
    assert len(dec) == 0


def test_compresses_smooth_audio():
    smooth = (1000 * np.sin(np.arange(20000) / 60)).astype(np.int16)
    assert len(flac_encode(smooth)) < 0.25 * 2 * len(smooth)


def test_crc_checks_catch_corruption():
    data = bytearray(flac_encode(np.arange(100, dtype=np.int16), 8000))
    data[-3] ^= 0xFF  # inside the last frame body
    with pytest.raises(ValueError):
        flac_decode(bytes(data))
    with pytest.raises(ValueError):
        flac_decode(b"fLaX" + bytes(40))


def test_payload_equals_wav_field():
    from dedoc_ray.ops.media_codecs import wav_decode, wav_payload

    for d in (0, 9, 100, 999):
        sa, ra = flac_decode(flac_payload(d))
        sw, rw = wav_decode(wav_payload(d))
        assert ra == rw and (sa == sw).all()


def test_kernel_branches_on_flac_magic():
    import pyarrow as pa

    from dedoc_ray.ops.multimodal import AudioFrameKernel

    batch = pa.Table.from_pydict({"doc_id": [7], "audio": [flac_payload(7)]})
    out = AudioFrameKernel()(batch).to_pylist()[0]
    n = 500 + (7 % 50) * 20
    assert out["n_samples"] == n and out["n_frames"] == n // 400


def test_utf8_frame_number_byte_lengths():
    # ADVICE r2: 2-byte form holds only 11 bits (0..2047); 2048 needs 3 bytes
    from dedoc_ray.ops.flac_codec import _BitReader, _BitWriter, _read_utf8_number, _utf8_number

    for n, nbytes in [(0, 1), (127, 1), (128, 2), (2047, 2), (2048, 3),
                      (65535, 3), (65536, 4), ((1 << 31) - 1, 6), (1 << 31, 7), ((1 << 36) - 1, 7)]:
        w = _BitWriter()
        _utf8_number(w, n)
        blob = bytes(w.buf)
        assert len(blob) == nbytes, (n, len(blob), nbytes)
        assert _read_utf8_number(_BitReader(blob)) == n
