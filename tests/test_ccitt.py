"""CCITT G3/G4 decoder: cross-implementation validation against the JDK's
TIFF codec (the encoder the T.4 tables were recovered from) plus the real
fax pages in the reference corpus."""

import os
import shutil
import subprocess

import numpy as np
import pytest

from dedoc_ray.ops.ccitt import (
    _BLACK_CODES,
    _BLACK_MAKEUP,
    _WHITE_CODES,
    _WHITE_MAKEUP,
    ccitt_g3_decode,
    ccitt_g4_decode,
    ccitt_mh_decode,
)


def test_famous_code_values():
    # spot pins from ITU-T T.4 tables 2/3 — the well-known entries
    assert _WHITE_CODES[0] == "00110101"
    assert _WHITE_CODES[1] == "000111"
    assert _BLACK_CODES[0] == "0000110111"
    assert _BLACK_CODES[1] == "010"
    assert _BLACK_CODES[2] == "11"
    assert _WHITE_MAKEUP[64] == "11011"
    assert _WHITE_MAKEUP[1728] == "010011011"


def test_prefix_free_tables():
    for tab in ({**_WHITE_CODES, **_WHITE_MAKEUP},):
        codes = sorted(tab.values(), key=len)
        for i, a in enumerate(codes):
            for b in codes[i + 1 :]:
                assert a == b or not b.startswith(a)


_HARNESS = r"""
import javax.imageio.*;
import javax.imageio.stream.*;
import java.awt.image.*;
import java.io.*;
public class Enc {
    public static void main(String[] a) throws Exception {
        ImageWriter w = ImageIO.getImageWritersByFormatName("tiff").next();
        BufferedReader br = new BufferedReader(new InputStreamReader(System.in));
        PrintWriter out = new PrintWriter(new BufferedWriter(new OutputStreamWriter(System.out)));
        String line;
        while ((line = br.readLine()) != null) {
            String[] p = line.split(" ");
            int width = Integer.parseInt(p[1]), height = Integer.parseInt(p[2]);
            byte[] bits = new byte[p[3].length() / 2];
            for (int i = 0; i < bits.length; i++)
                bits[i] = (byte) Integer.parseInt(p[3].substring(2 * i, 2 * i + 2), 16);
            int stride = (width + 7) / 8;
            BufferedImage img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_BINARY);
            for (int y = 0; y < height; y++)
                for (int x = 0; x < width; x++)
                    img.getRaster().setSample(x, y, 0, (bits[y * stride + (x >> 3)] & (0x80 >> (x & 7))) != 0 ? 1 : 0);
            ImageWriteParam pw = w.getDefaultWriteParam();
            pw.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            pw.setCompressionType(p[0].equals("t6") ? "CCITT T.6" : p[0].equals("t4") ? "CCITT T.4" : "CCITT RLE");
            ByteArrayOutputStream bos = new ByteArrayOutputStream();
            ImageOutputStream ios = ImageIO.createImageOutputStream(bos);
            w.reset(); w.setOutput(ios);
            w.write(null, new IIOImage(img, null, null), pw);
            ios.flush();
            byte[] tiff = bos.toByteArray();
            java.nio.ByteBuffer bb = java.nio.ByteBuffer.wrap(tiff);
            bb.order(tiff[0] == 'I' ? java.nio.ByteOrder.LITTLE_ENDIAN : java.nio.ByteOrder.BIG_ENDIAN);
            int ifd = bb.getInt(4), n = bb.getShort(ifd) & 0xFFFF;
            long off = -1, cnt = -1;
            for (int i = 0; i < n; i++) {
                int e = ifd + 2 + 12 * i;
                int tag = bb.getShort(e) & 0xFFFF, typ = bb.getShort(e + 2) & 0xFFFF;
                long val = typ == 3 ? (bb.getShort(e + 8) & 0xFFFF) : (bb.getInt(e + 8) & 0xFFFFFFFFL);
                if (tag == 273) off = val;
                if (tag == 279) cnt = val;
            }
            StringBuilder sb = new StringBuilder();
            for (long i = off; i < off + cnt; i++) sb.append(String.format("%02x", tiff[(int) i]));
            out.println(sb); out.flush();
        }
    }
}
"""

_HAVE_JDK = shutil.which("javac") is not None and shutil.which("java") is not None


@pytest.fixture(scope="module")
def jdk_encoder(tmp_path_factory):
    if not _HAVE_JDK:
        pytest.skip("no JDK for the CCITT cross-validation harness")
    d = tmp_path_factory.mktemp("ccitt")
    (d / "Enc.java").write_text(_HARNESS)
    r = subprocess.run(["javac", str(d / "Enc.java")], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"javac failed: {r.stderr[:160]}")
    proc = subprocess.Popen(
        ["java", "-cp", str(d), "Enc"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, bufsize=1,
    )

    def encode(img_black: np.ndarray, typ: str) -> bytes:
        packed = np.packbits(~img_black, axis=1)
        proc.stdin.write(f"{typ} {img_black.shape[1]} {img_black.shape[0]} {packed.tobytes().hex()}\n")
        proc.stdin.flush()
        return bytes.fromhex(proc.stdout.readline().strip())

    yield encode
    proc.stdin.close()
    proc.terminate()


def _shapes(rng):
    for kind in range(14):
        h = int(rng.randint(1, 20))
        w = int(rng.randint(4, 220))
        if kind % 4 == 0:
            yield rng.rand(h, w) < 0.5
        elif kind % 4 == 1:
            img = np.zeros((h, w), bool)
            for y in range(h):
                for _ in range(rng.randint(0, 5)):
                    s = rng.randint(0, w)
                    img[y, s : min(w, s + rng.randint(1, 12))] = True
            yield img
        elif kind % 4 == 2:
            yield np.zeros((h, w), bool)
        else:
            yield np.ones((h, w), bool)


def test_g4_pixel_exact_vs_jdk(jdk_encoder):
    rng = np.random.RandomState(7)
    for img in _shapes(rng):
        dec = ccitt_g4_decode(jdk_encoder(img, "t6"), columns=img.shape[1], rows=img.shape[0])
        assert np.array_equal(dec, np.where(img, 0, 255).astype(np.uint8))


def test_mh_pixel_exact_vs_jdk(jdk_encoder):
    rng = np.random.RandomState(8)
    for img in _shapes(rng):
        dec = ccitt_mh_decode(jdk_encoder(img, "rle"), columns=img.shape[1], rows=img.shape[0])
        assert np.array_equal(dec, np.where(img, 0, 255).astype(np.uint8))


def test_g3_mixed_pixel_exact_vs_jdk(jdk_encoder):
    # Group 3 with EOLs, K>0 flavor: EOL + tag bit, 1-D and 2-D rows mixed
    rng = np.random.RandomState(9)
    for img in _shapes(rng):
        dec = ccitt_g3_decode(jdk_encoder(img, "t4"), columns=img.shape[1], rows=img.shape[0])
        assert np.array_equal(dec, np.where(img, 0, 255).astype(np.uint8))


def _g3_1d_encode(img_black: np.ndarray) -> bytes:
    """Pure 1-D G3 (no tag bits): EOL + MH runs per row, from the same
    published T.4 tables the decoder uses."""
    bits = []
    for row in img_black:
        bits.append("000000000001")
        runs, color = [], False
        x = 0
        arr = row.tolist()
        while x < len(arr):
            n = 0
            while x + n < len(arr) and arr[x + n] == color:
                n += 1
            runs.append(n)
            x += n
            color = not color
        if not runs or len(runs) % 2 == 0:
            runs.append(0)  # rows end on a white run in MH coding
        white = True
        for run in runs:
            term, makeup = (_WHITE_CODES, _WHITE_MAKEUP) if white else (_BLACK_CODES, _BLACK_MAKEUP)
            while run >= 64:
                step = min(2560, (run // 64) * 64)
                bits.append(makeup[step])
                run -= step
            bits.append(term[run])
            white = not white
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def test_g3_pure_1d_rows():
    rng = np.random.RandomState(11)
    for img in _shapes(rng):
        dec = ccitt_g3_decode(_g3_1d_encode(img), columns=img.shape[1],
                              rows=img.shape[0], two_d=False)
        assert np.array_equal(dec, np.where(img, 0, 255).astype(np.uint8))


_REAL = "/root/reference/tests/data/laws/with_applications.pdf"


@pytest.mark.skipif(not os.path.isfile(_REAL), reason="reference fixture absent")
def test_real_g4_fax_pages_decode():
    from dedoc_ray.readers.pdf_objects import PdfDocument

    with open(_REAL, "rb") as f:
        doc = PdfDocument(f.read())
    page = next(doc.pages())
    xo = doc.resolve(doc.resolve(page["Resources"])["XObject"])
    img = doc.resolve(next(iter(xo.values())))
    parms = doc.resolve(img.dict.get("DecodeParms")) or {}
    assert int(doc.resolve(parms.get("K", 0))) < 0  # really G4
    raster = ccitt_g4_decode(
        doc.stream_raw(img), columns=int(doc.resolve(parms["Columns"])),
        rows=int(doc.resolve(img.dict.get("Height"))),
    )
    # a real typed page: a few percent ink, not blank, not solid
    ink = (raster < 128).mean()
    assert raster.shape[1] == 2475 and 0.01 < ink < 0.3


def test_g4_tiff_through_tiff_decode(jdk_encoder, tmp_path):
    # full-file check: a JDK-written CCITT T.6 TIFF decodes through the
    # TIFF container reader (compression 4 branch)
    import struct

    rng = np.random.RandomState(5)
    img = np.zeros((40, 120), bool)
    for y in range(40):
        for _ in range(rng.randint(0, 4)):
            s = rng.randint(0, 120)
            img[y, s : min(120, s + rng.randint(2, 15))] = True
    strip = jdk_encoder(img, "t6")
    # hand-assemble a minimal little-endian G4 TIFF around the strip
    entries = [
        (256, 3, 1, 120), (257, 3, 1, 40), (258, 3, 1, 1), (259, 3, 1, 4),
        (262, 3, 1, 0), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, 40),
        (279, 4, 1, len(strip)),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    buf = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    buf += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if tag == 273:
            val = data_off
        buf += struct.pack("<HHII", tag, typ, cnt, val)
    buf += struct.pack("<I", 0)
    buf += strip
    from dedoc_ray.ops.media_codecs import tiff_decode

    dec = tiff_decode(bytes(buf))
    assert np.array_equal(dec, np.where(img, 0, 255).astype(np.uint8))
