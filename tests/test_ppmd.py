"""PPMd var.H (ops/ppmd.py) — the model under both entropy coders.

Oracles:
- 7z folders: bsdtar (libarchive) WRITES PPMd/BZip2/Deflate 7z archives;
  our reader must extract them byte-exactly (cross-implementation decode).
- RAR3 PPM blocks: we WRITE synthetic RAR3 archives whose streams are
  PPM-coded (rar_encode_ppm) and bsdtar must extract them byte-exactly
  (cross-implementation encode) — plus our own decoder round-trips them.
"""

import pathlib
import random
import shutil
import subprocess

import pytest

from dedoc_ray.readers.rar import rar_encode_ppm, rar_list
from dedoc_ray.readers.sevenzip import sevenzip_decode

HAVE_BSDTAR = shutil.which("bsdtar") is not None


def _payloads(seed=42):
    rnd = random.Random(seed)
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    return {
        "text.txt": (" ".join(rnd.choice(words) for _ in range(5000))).encode(),
        "bin.dat": bytes(rnd.randrange(256) for _ in range(20000)),
        "esc.dat": bytes([2]) * 100 + b"ab\x02cd" * 50,  # literal-escape path
        "runs.dat": bytes(range(256)) * 40,
    }


# ------------------------------------------------------------------- 7z


@pytest.mark.skipif(not HAVE_BSDTAR, reason="bsdtar not available")
@pytest.mark.parametrize("compression", ["ppmd", "bzip2", "deflate"])
def test_7z_codec_decodes_libarchive_output(compression, tmp_path):
    payloads = _payloads()
    files = []
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
        files.append(name)
    arc = tmp_path / "t.7z"
    subprocess.run(
        ["bsdtar", "--format", "7zip", "--options", f"compression={compression}",
         "-cf", str(arc), "-C", str(tmp_path)] + files,
        check=True, capture_output=True,
    )
    out = dict(sevenzip_decode(arc.read_bytes()))
    assert set(out) == set(payloads)
    for name, data in payloads.items():
        assert out[name] == data, name


# ------------------------------------------------------------------ RAR3


def test_rar3_ppm_self_roundtrip():
    payloads = _payloads(7)
    arc = rar_encode_ppm(list(payloads.items()))
    for m in rar_list(arc):
        assert m.payload == payloads[m.name], f"{m.name}: {m.note}"


def test_rar3_ppm_small_orders_and_tiny_inputs():
    cases = [b"", b"a", b"ab" * 3, bytes([2, 2, 2]), b"x" * 1000]
    for order in (2, 6, 16):
        arc = rar_encode_ppm([(f"f{i}", c) for i, c in enumerate(cases)], order=order)
        got = {m.name: m.payload for m in rar_list(arc)}
        for i, c in enumerate(cases):
            assert got[f"f{i}"] == c, (order, i)


@pytest.mark.skipif(not HAVE_BSDTAR, reason="bsdtar not available")
def test_rar3_ppm_extractable_by_libarchive(tmp_path):
    payloads = _payloads(99)
    arc = tmp_path / "synth_ppm.rar"
    arc.write_bytes(rar_encode_ppm(list(payloads.items())))
    subprocess.run(
        ["bsdtar", "-xf", str(arc), "-C", str(tmp_path)],
        check=True, capture_output=True,
    )
    for name, data in payloads.items():
        assert (tmp_path / name).read_bytes() == data, name
