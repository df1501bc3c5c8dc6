"""TIFF LZW / Deflate / predictor / JPEG-in-TIFF: cross-implementation
validation against the system libtiff (libtiff.so.6, public API declared
by hand — no dev headers in the container). The same pattern as the
libjpeg interop in test_jpeg_arith.py: a compiled C oracle writes real
files, our pure-Python tiff_decode must reproduce them.

This gate caught a real bug: the LZW early-change boundary was one entry
late (width bump at table size 512 instead of 511), invisible on streams
that never grow the table past 510 entries.
"""

import shutil
import subprocess

import numpy as np
import pytest

from dedoc_ray.ops.media_codecs import tiff_decode

_LIBTIFF = "/usr/lib/x86_64-linux-gnu/libtiff.so.6"

_HARNESS = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
typedef void TIFF;
extern TIFF *TIFFOpen(const char *, const char *);
extern int TIFFSetField(TIFF *, unsigned, ...);
extern int TIFFGetField(TIFF *, unsigned, ...);
extern int TIFFWriteScanline(TIFF *, void *, unsigned, unsigned short);
extern int TIFFReadScanline(TIFF *, void *, unsigned, unsigned short);
extern void TIFFClose(TIFF *);
static unsigned char hexv(char c){return c<='9'?c-'0':(c|32)-'a'+10;}
int main(int argc, char **argv) {
    if (!strcmp(argv[1], "enc")) {
        int comp = atoi(argv[2]), pred = atoi(argv[3]);
        int w = atoi(argv[4]), h = atoi(argv[5]);
        const char *path = argv[6];
        FILE *hf = fopen(argv[7], "r");
        unsigned char *px = malloc((size_t)w * h);
        for (int i = 0; i < w * h; i++) {
            int a = fgetc(hf), b = fgetc(hf);
            px[i] = (hexv(a) << 4) | hexv(b);
        }
        fclose(hf);
        TIFF *t = TIFFOpen(path, "w");
        TIFFSetField(t, 256, w); TIFFSetField(t, 257, h);
        TIFFSetField(t, 258, 8); TIFFSetField(t, 277, 1);
        TIFFSetField(t, 262, 1); TIFFSetField(t, 259, comp);
        TIFFSetField(t, 284, 1);
        TIFFSetField(t, 278, h > 8 ? 8 : h);  /* multi-strip on purpose */
        if (pred) TIFFSetField(t, 317, pred);
        for (int y = 0; y < h; y++)
            if (TIFFWriteScanline(t, px + (size_t)y * w, y, 0) < 0) return 2;
        TIFFClose(t);
        return 0;
    }
    if (!strcmp(argv[1], "dec")) {
        TIFF *t = TIFFOpen(argv[2], "r");
        if (!t) return 3;
        unsigned w = 0, h = 0;
        TIFFGetField(t, 256, &w); TIFFGetField(t, 257, &h);
        unsigned char *row = malloc(w + 16);
        FILE *o = fopen(argv[3], "wb");
        fprintf(o, "%u %u\n", w, h);
        for (unsigned y = 0; y < h; y++) {
            if (TIFFReadScanline(t, row, y, 0) < 0) return 4;
            fwrite(row, 1, w, o);
        }
        fclose(o);
        TIFFClose(t);
        return 0;
    }
    return 1;
}
"""

_HAVE_TOOLCHAIN = shutil.which("gcc") is not None


@pytest.fixture(scope="module")
def tifftool(tmp_path_factory):
    import os

    if not _HAVE_TOOLCHAIN or not os.path.exists(_LIBTIFF):
        pytest.skip("no gcc/libtiff for the TIFF cross-validation harness")
    d = tmp_path_factory.mktemp("tifftool")
    src = d / "tifftool.c"
    src.write_text(_HARNESS)
    exe = d / "tifftool"
    r = subprocess.run(["gcc", "-O2", "-o", str(exe), str(src), _LIBTIFF],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"gcc failed: {r.stderr[:160]}")

    def encode(img: np.ndarray, comp: int, pred: int = 0) -> bytes:
        hexf = d / "px.hex"
        hexf.write_text(img.tobytes().hex())
        out = d / "t.tif"
        subprocess.run(
            [str(exe), "enc", str(comp), str(pred), str(img.shape[1]),
             str(img.shape[0]), str(out), str(hexf)],
            check=True, capture_output=True)
        return out.read_bytes()

    def decode(tiff: bytes) -> np.ndarray:
        f = d / "in.tif"
        f.write_bytes(tiff)
        out = d / "out.raw"
        subprocess.run([str(exe), "dec", str(f), str(out)],
                       check=True, capture_output=True)
        blob = out.read_bytes()
        head, _, rest = blob.partition(b"\n")
        w, h = map(int, head.split())
        return np.frombuffer(rest, np.uint8)[: w * h].reshape(h, w)

    yield encode, decode


def _images(rng):
    for trial in range(6):
        h, w = int(rng.randint(1, 60)), int(rng.randint(2, 150))
        if trial % 2:
            yield rng.randint(0, 256, (h, w), dtype=np.uint8)
        else:  # smooth gradients: the predictor's favorable case
            yield ((np.arange(h * w) * 7) % 256).astype(np.uint8).reshape(h, w)


@pytest.mark.parametrize("comp,pred", [(5, 0), (5, 2), (8, 0), (8, 2), (32946, 2)])
def test_lzw_deflate_pixel_exact_vs_libtiff(tifftool, comp, pred):
    encode, _ = tifftool
    rng = np.random.RandomState(comp + pred)
    for img in _images(rng):
        assert np.array_equal(tiff_decode(encode(img, comp, pred)), img)


def test_lzw_code_width_boundaries(tifftool):
    # large low-entropy image: the LZW table crosses 511/1023/2047 and
    # resets; this is the case that exposed the early-change off-by-one
    encode, _ = tifftool
    rng = np.random.RandomState(3)
    img = rng.randint(0, 8, (150, 250)).astype(np.uint8) * 31
    assert np.array_equal(tiff_decode(encode(img, 5, 0)), img)
    assert np.array_equal(tiff_decode(encode(img, 5, 2)), img)


def test_jpeg_in_tiff_vs_libtiff_decode(tifftool):
    # comp 7 (TechNote 2): abbreviated JPEG strips + JPEGTables tag; lossy,
    # so compare our decode against libtiff's own (libjpeg) decode with the
    # same <=1 IDCT-rounding tolerance as the libjpeg interop tests
    encode, decode = tifftool
    rng = np.random.RandomState(7)
    for _ in range(3):
        h, w = int(rng.randint(16, 70)), int(rng.randint(16, 90))
        img = ((np.indices((h, w)).sum(0) * 5) % 256).astype(np.uint8)
        tiff = encode(img, 7)
        theirs = decode(tiff)
        mine = tiff_decode(tiff)
        assert mine.shape == theirs.shape
        assert np.abs(mine.astype(int) - theirs.astype(int)).max() <= 1


def test_pdf_lzw_early_change_zero():
    # PDF-side regression: EarlyChange 0 widens one entry later; exercise
    # both rules through a hand-built encoder crossing the 9->10 boundary
    from dedoc_ray.readers.pdf_objects import _lzw

    def lzw_encode(data: bytes, early: int) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        nxt, bits = 258, 9
        acc, nbits, out = 0, 0, bytearray()

        def emit(code, width):
            nonlocal acc, nbits
            acc = (acc << width) | code
            nbits += width
            while nbits >= 8:
                out.append((acc >> (nbits - 8)) & 0xFF)
                nbits -= 8

        emit(256, bits)
        cur = b""
        for b in data:
            nxt_seq = cur + bytes([b])
            if nxt_seq in table:
                cur = nxt_seq
                continue
            emit(table[cur], bits)
            table[nxt_seq] = nxt
            nxt += 1
            if nxt + (1 if early else 0) > (1 << bits) and bits < 12:
                bits += 1
            cur = bytes([b])
        if cur:
            emit(table[cur], bits)
        emit(257, bits)
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
        return bytes(out)

    rng = np.random.RandomState(1)
    payload = bytes(rng.randint(0, 5, 4000, dtype=np.uint8))  # grows table past 511
    assert _lzw(lzw_encode(payload, 1), early=1) == payload
    assert _lzw(lzw_encode(payload, 0), early=0) == payload
