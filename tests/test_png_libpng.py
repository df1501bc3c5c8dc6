"""PNG decoder: cross-implementation validation against the system libpng
(png.h + libpng16 are in the container). A compiled C harness writes real
PNGs for every (color type, bit depth, interlace) combination the decoder
claims; our pure-Python png_decode must reproduce the known source pixels
exactly (PNG is lossless, so the expected gray is computed in numpy from
the same samples/palette/alpha policy the docstring pins)."""

import shutil
import subprocess

import numpy as np
import pytest

from dedoc_ray.ops.media_codecs import png_decode

_HARNESS = r"""
#include <png.h>
#include <stdio.h>
#include <stdlib.h>
static unsigned char hexv(char c){return c<='9'?c-'0':(c|32)-'a'+10;}
int main(int argc, char **argv) {
    int ctype = atoi(argv[1]), depth = atoi(argv[2]), inter = atoi(argv[3]);
    int w = atoi(argv[4]), h = atoi(argv[5]);
    int nch = ctype == 2 ? 3 : ctype == 4 ? 2 : ctype == 6 ? 4 : 1;
    size_t rowbytes = (size_t)w * nch * (depth == 16 ? 2 : 1);
    unsigned char *px = malloc(rowbytes * h);
    FILE *hf = fopen(argv[7], "r");
    for (size_t i = 0; i < rowbytes * h; i++) {
        int a = fgetc(hf), b = fgetc(hf);
        px[i] = (hexv(a) << 4) | hexv(b);
    }
    fclose(hf);
    FILE *f = fopen(argv[6], "wb");
    png_structp p = png_create_write_struct(PNG_LIBPNG_VER_STRING, 0, 0, 0);
    png_infop info = png_create_info_struct(p);
    if (setjmp(png_jmpbuf(p))) return 2;
    png_init_io(p, f);
    png_set_IHDR(p, info, w, h, depth, ctype,
                 inter ? PNG_INTERLACE_ADAM7 : PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    if (ctype == 3) {
        png_color pal[256];
        int n = 1 << depth;
        for (int i = 0; i < n; i++) {
            pal[i].red = i * 7 % 256; pal[i].green = i * 13 % 256; pal[i].blue = i * 29 % 256;
        }
        png_set_PLTE(p, info, pal, n);
    }
    png_write_info(p, info);
    if (depth < 8) png_set_packing(p);  /* input is one byte per sample */
    png_bytep *rows = malloc(sizeof(png_bytep) * h);
    for (int y = 0; y < h; y++) rows[y] = px + (size_t)y * rowbytes;
    png_write_image(p, rows);
    png_write_end(p, info);
    png_destroy_write_struct(&p, &info);
    fclose(f);
    return 0;
}
"""

_HAVE_TOOLCHAIN = shutil.which("gcc") is not None


@pytest.fixture(scope="module")
def pngtool(tmp_path_factory):
    if not _HAVE_TOOLCHAIN:
        pytest.skip("no gcc for the PNG cross-validation harness")
    d = tmp_path_factory.mktemp("pngtool")
    src = d / "pngtool.c"
    src.write_text(_HARNESS)
    exe = d / "pngtool"
    r = subprocess.run(["gcc", "-O2", "-o", str(exe), str(src), "-lpng"],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"gcc failed: {r.stderr[:160]}")

    def encode(samples: np.ndarray, ctype: int, depth: int, inter: int) -> bytes:
        # samples: (h, w, nch) ints at the given depth (<= 2^depth - 1)
        h, w, _ = samples.shape
        if depth == 16:
            payload = samples.astype(">u2").tobytes()
        else:
            payload = samples.astype(np.uint8).tobytes()
        hexf = d / "px.hex"
        hexf.write_text(payload.hex())
        out = d / "t.png"
        subprocess.run([str(exe), str(ctype), str(depth), str(inter),
                        str(w), str(h), str(out), str(hexf)],
                       check=True, capture_output=True)
        return out.read_bytes()

    yield encode


_PALETTE = np.stack([(np.arange(256) * 7) % 256,
                     (np.arange(256) * 13) % 256,
                     (np.arange(256) * 29) % 256], axis=1).astype(np.uint16)


def _expected_gray(samples: np.ndarray, ctype: int, depth: int) -> np.ndarray:
    s = samples.astype(np.uint32)
    if depth == 16:
        s = s >> 8  # high byte, as libpng strip_16
    if ctype == 3:
        rgb = _PALETTE[samples[..., 0]]
        return (rgb.sum(axis=2) // 3).astype(np.uint8)
    if ctype == 0:
        g = s[..., 0]
        if depth < 8:
            g = g * 255 // ((1 << depth) - 1)
        return g.astype(np.uint8)
    if ctype == 2:
        return (s.sum(axis=2) // 3).astype(np.uint8)
    if ctype == 4:
        g, a = s[..., 0], s[..., 1]
    else:
        g, a = s[..., :3].sum(axis=2) // 3, s[..., 3]
    return ((g * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)


_MATRIX = [
    (0, 1, 0), (0, 2, 1), (0, 4, 0), (0, 8, 1), (0, 16, 0), (0, 16, 1),
    (2, 8, 0), (2, 8, 1), (2, 16, 0),
    (3, 1, 0), (3, 2, 0), (3, 4, 1), (3, 8, 1),
    (4, 8, 0), (4, 8, 1), (6, 8, 0), (6, 8, 1),
]


@pytest.mark.parametrize("ctype,depth,inter", _MATRIX)
def test_png_variants_pixel_exact_vs_libpng(pngtool, ctype, depth, inter):
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    rng = np.random.RandomState(ctype * 100 + depth * 10 + inter)
    # odd sizes stress the Adam7 pass geometry and sub-byte row padding
    for h, w in [(1, 1), (2, 3), (5, 13), (17, 31), (23, 64)]:
        maxv = (1 << depth) - 1
        samples = rng.randint(0, maxv + 1, (h, w, nch)).astype(np.uint32)
        png = pngtool(samples, ctype, depth, inter)
        dec = png_decode(png)
        assert np.array_equal(dec, _expected_gray(samples, ctype, depth)), (h, w)


def test_png_16bit_values_roundtrip(pngtool):
    # deterministic ramp so the high-byte reduction is visible
    h, w = 8, 40
    samples = ((np.arange(h * w) * 257) % 65536).astype(np.uint32).reshape(h, w, 1)
    dec = png_decode(pngtool(samples, 0, 16, 0))
    assert np.array_equal(dec, (samples[..., 0] >> 8).astype(np.uint8))
