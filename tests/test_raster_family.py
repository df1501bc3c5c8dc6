"""The reference's scanned corpus carries the SAME page in ~20 raster
containers (tests/data/scanned/example.*). Decoding every one through
image_decode_gray and pinning pixel equality against the PNG decode is a
cross-format golden gate: any container parse bug shows up as a raster
mismatch without needing an external oracle."""

import os

import numpy as np
import pytest

from dedoc_ray.ops.media_codecs import image_decode_gray

_BASE = "/root/reference/tests/data/scanned/example."

_LOSSLESS = ["bmp", "gif", "pbm", "pgm", "pnm", "ppm", "pcx", "ras", "sr",
             "sgi", "tiff"]
_LOSSY = {"jpg": 1.0, "jfif": 1.0, "jpe": 1.5, "webp": 1.0, "dib": 1.0,
          "hdr": 0.05, "pic": 0.05}

pytestmark = pytest.mark.skipif(
    not os.path.isfile(_BASE + "png"), reason="reference fixtures absent")


@pytest.fixture(scope="module")
def png_raster():
    with open(_BASE + "png", "rb") as f:
        img = image_decode_gray(f.read())
    assert img.shape == (1170, 827)
    return img


@pytest.mark.parametrize("ext", _LOSSLESS)
def test_lossless_containers_pixel_equal(png_raster, ext):
    with open(_BASE + ext, "rb") as f:
        img = image_decode_gray(f.read())
    assert np.array_equal(img, png_raster), ext


@pytest.mark.parametrize("ext", sorted(_LOSSY))
def test_lossy_containers_close(png_raster, ext):
    # dib is a JPEG re-export of the page; hdr/pic hold linear floats whose
    # 8-bit requantization rounds; jpeg/webp are lossy codecs
    with open(_BASE + ext, "rb") as f:
        img = image_decode_gray(f.read())
    assert img.shape == png_raster.shape
    mad = float(np.abs(img.astype(int) - png_raster.astype(int)).mean())
    assert mad <= _LOSSY[ext], (ext, mad)


def test_j2k_decodes_natively():
    # the former honest gate fell: ops/jpeg2000.py decodes the reversible
    # path (pixel-exact oracle vs the png sibling in tests/test_jpeg2000.py)
    with open(_BASE + "j2k", "rb") as f:
        data = f.read()
    img = image_decode_gray(data)
    assert img.shape == (1170, 827)


def test_scan_route_reads_every_container():
    # the OCR route accepts any parseable raster, shape-checked end-to-end
    from dedoc_ray.readers.scan_ocr import read_scan

    for ext in ("pcx", "ras", "sgi", "ppm"):
        with open(_BASE + ext, "rb") as f:
            doc = read_scan(f.read(), orientation="no_change")
        assert doc.lines or doc.warnings
