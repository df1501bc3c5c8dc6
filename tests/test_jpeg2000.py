"""JPEG 2000 (ops/jpeg2000.py) — pixel-exact oracle.

All ``scanned/example.*`` fixtures are ONE image in different containers
(the reference's image-converter corpus).  example.j2k was written by
OpenJPEG 2.3.1 with the reversible 5/3 transform and no quantisation —
lossless — so the native decode must byte-equal the RGB extracted from
example.png.  That cross-validates the MQ decoder, the EBCOT tier-1
passes, packet-header/tag-tree parsing and the inverse 5/3 DWT against
an independent encoder in one shot.
"""

import pathlib
import struct
import zlib

import numpy as np
import pytest

from dedoc_ray.ops.jpeg2000 import BadJ2K, j2k_decode

SCANNED = pathlib.Path("/root/reference/tests/data/scanned")

pytestmark = pytest.mark.skipif(not SCANNED.exists(), reason="reference fixtures absent")


def _png_rgb(path: pathlib.Path) -> np.ndarray:
    """Raw RGB from an 8-bit colortype-2 PNG (independent of our reader's
    grayscale reduction, so the oracle stays per-channel exact)."""
    data = path.read_bytes()
    pos, idat = 8, []
    w = h = None
    while pos + 8 <= len(data):
        (clen,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", body[:10])
            assert (depth, ctype) == (8, 2)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + clen
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    out = np.zeros((h, stride), np.int32)
    p = 0
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = raw[p]
        p += 1
        cur = np.frombuffer(raw[p : p + stride], np.uint8).astype(np.int32)
        p += stride
        if f == 1:
            cur = cur.copy()
            for i in range(3, stride):
                cur[i] = (cur[i] + cur[i - 3]) & 255
        elif f == 2:
            cur = (cur + prev) & 255
        elif f == 3:
            cur = cur.copy()
            for i in range(stride):
                left = cur[i - 3] if i >= 3 else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 255
        elif f == 4:
            cur = cur.copy()
            for i in range(stride):
                a = cur[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 255
        out[y] = cur
        prev = out[y]
    return out.astype(np.uint8).reshape(h, w, 3)


def test_j2k_fixture_pixel_exact_vs_png():
    ref = _png_rgb(SCANNED / "example.png")
    img = j2k_decode((SCANNED / "example.j2k").read_bytes())
    assert img.shape == ref.shape
    assert (img == ref).all()


def test_jp2_box_container_unwraps():
    # wrap the fixture codestream in a minimal jp2 box file
    stream = (SCANNED / "example.j2k").read_bytes()
    sig = struct.pack(">I", 12) + b"jP  " + b"\r\n\x87\n"
    ftyp = struct.pack(">I", 20) + b"ftyp" + b"jp2 " + b"\x00\x00\x00\x00" + b"jp2 "
    jp2c = struct.pack(">I", 8 + len(stream)) + b"jp2c" + stream
    img = j2k_decode(sig + ftyp + jp2c)
    assert img.shape == (1170, 827, 3)


def test_image_dimensions_header_peek():
    from dedoc_ray.ops.media_codecs import image_dimensions

    data = (SCANNED / "example.j2k").read_bytes()
    assert image_dimensions(data) == (827, 1170)


def test_sniff_routes_j2k_to_scan():
    from dedoc_ray.readers.sniff import sniff_format

    data = (SCANNED / "example.j2k").read_bytes()
    assert sniff_format("example.j2k", data) == "pgm"
    assert sniff_format("noext", data) == "pgm"


def test_manager_route_matches_png_sibling():
    # identical pixels ⇒ the scan route must produce identical output for
    # the j2k and png containers of the same fixture image
    from dedoc_ray.manager import DedocRayManager

    m = DedocRayManager()
    r_j2k = m.parse(data=(SCANNED / "example.j2k").read_bytes(), file_name="example.j2k")
    r_png = m.parse(data=(SCANNED / "example.png").read_bytes(), file_name="example.png")
    assert r_j2k["status"] == "ok"
    assert r_j2k["extracted_text"] == r_png["extracted_text"]


def test_irreversible_stream_rejected_cleanly():
    data = bytearray((SCANNED / "example.j2k").read_bytes())
    # flip the COD transform byte (offset: SOC(2)+SIZ(2+2+45)+COD marker —
    # find it instead of hardcoding)
    i = bytes(data).find(b"\xff\x52")
    assert i > 0
    data[i + 2 + 2 + 9] = 0x00  # wavelet byte: 0 = 9/7 irreversible
    with pytest.raises((BadJ2K, ValueError)):
        j2k_decode(bytes(data))
