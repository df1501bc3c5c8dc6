"""Multimodal column stages — image/audio/video payloads as binary columns.

The Ray-side plumbing: typed binary columns with metadata, actor-pool
``map_batches`` stages with SMALL batch sizes (binary payloads × concurrency
must fit the worker heap — SURVEY.md §4 memory row), deterministic output
schemas. The decode step is magic-dispatched over REAL codecs implemented in
this repo (no PIL/cv2/ffmpeg needed):

- images: BMP, PNG, GIF (ops/media_codecs.py), TIFF, and JPEG — baseline
  grayscale, YCbCr color, progressive SOF2 (ops/jpeg_codec.py);
- audio: WAV PCM-16 + IMA ADPCM, Sun AU + G.711 µ-law, lossless FLAC
  (ops/flac_codec.py);
- video: YUV4MPEG2 raw and Motion-JPEG AVI.

Codecs with no public-license implementation path here stay gated behind
import-try (``_HAVE_PIL``): MP3, H.264, arithmetic-coded JPEG.

A tiny synthetic container family (FIMG/FAUD/FVID, pure functions of doc_id)
remains for plumbing tests that want zero codec cost:

- image: b"FIMG" + width:u16 + height:u16 + pixels (w*h bytes, all
  ``doc_id % 256``); width = 16 + doc_id % 32, height = 16 + doc_id % 24.
- audio: b"FAUD" + n_samples:u32 + samples (n bytes, all ``doc_id % 256``);
  n_samples = 1000 + (doc_id % 100) * 40, rate 16 kHz.
"""

from __future__ import annotations

import struct
from typing import Dict

import numpy as np
import pyarrow as pa

IMG_MAGIC = b"FIMG"
AUD_MAGIC = b"FAUD"
VID_MAGIC = b"FVID"

try:  # real-codec path — absent in this container, kept for deployment
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


# ------------------------------------------------------------- synth corpus


def image_payload(doc_id: int) -> bytes:
    w = 16 + doc_id % 32
    h = 16 + doc_id % 24
    return IMG_MAGIC + struct.pack("<HH", w, h) + bytes([doc_id % 256]) * (w * h)


def audio_payload(doc_id: int) -> bytes:
    n = 1000 + (doc_id % 100) * 40
    return AUD_MAGIC + struct.pack("<I", n) + bytes([doc_id % 256]) * n


def video_payload(doc_id: int) -> bytes:
    """Synthetic video container: magic + frame count + dims + one mean
    byte per frame ((doc_id + i) % 256 — deterministic, SQL-replayable)."""
    n = 24 + doc_id % 48
    w, h = 8 + doc_id % 8, 8
    frames = bytes((doc_id + i) % 256 for i in range(n))
    return VID_MAGIC + struct.pack("<IHH", n, w, h) + frames


def media_batch(batch: pa.Table) -> pa.Table:
    """documents rows → media rows (doc_id, image/audio/video binary)."""
    doc_ids = batch["doc_id"].to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": batch["doc_id"],
            "image": pa.array([image_payload(d) for d in doc_ids], "binary"),
            "audio": pa.array([audio_payload(d) for d in doc_ids], "binary"),
            "video": pa.array([video_payload(d) for d in doc_ids], "binary"),
        }
    )


def media_corpus(sf_dir: str):
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(media_batch, batch_format="pyarrow")


def media_corpus_real(sf_dir: str, image_codec: str = "bmp", audio_codec: str = "wav", video_codec: str = "y4m"):
    """Same corpus shape but REAL container formats (ops/media_codecs.py):
    images as 24-bit BMP / PNG / GIF, audio as RIFF/WAVE PCM-16 / Sun AU,
    video as YUV4MPEG2 — the kernels decode these through actual format
    parsers, branching on magic bytes."""
    import ray.data as rd

    from dedoc_ray.ops import media_codecs as mc

    if image_codec == "jpeg":
        from dedoc_ray.ops.jpeg_codec import jpeg_payload

        img_fn = jpeg_payload
    elif image_codec == "jpeg_color":
        from dedoc_ray.ops.jpeg_codec import jpeg_payload_color

        img_fn = jpeg_payload_color
    elif image_codec == "jpeg_prog":
        from dedoc_ray.ops.jpeg_codec import jpeg_payload_progressive

        img_fn = jpeg_payload_progressive
    elif image_codec == "jpeg_prog_color":
        from dedoc_ray.ops.jpeg_codec import jpeg_payload_progressive_color

        img_fn = jpeg_payload_progressive_color
    elif image_codec == "jpeg_arith":
        from dedoc_ray.ops.jpeg_arith import jpeg_payload_arith

        img_fn = jpeg_payload_arith
    else:
        img_fn = {"bmp": mc.bmp_payload, "png": mc.png_payload, "gif": mc.gif_payload,
                  "tiff": mc.tiff_payload, "pnm": mc.pnm_payload, "pcx": mc.pcx_payload,
                  "ras": mc.ras_payload, "sgi": mc.sgi_payload}[image_codec]
    if audio_codec == "flac":
        from dedoc_ray.ops.flac_codec import flac_payload

        aud_fn = flac_payload
    else:
        aud_fn = {"wav": mc.wav_payload, "au": mc.au_payload, "adpcm": mc.adpcm_payload}[audio_codec]
    vid_fn = {"y4m": mc.y4m_payload, "avi": mc.avi_payload}[video_codec]

    def gen(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "image": pa.array([img_fn(d) for d in doc_ids], "binary"),
                "audio": pa.array([aud_fn(d) for d in doc_ids], "binary"),
                "video": pa.array([vid_fn(d) for d in doc_ids], "binary"),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(gen, batch_format="pyarrow")


# ------------------------------------------------------------- decode stage


def _decode_payload(data: bytes):
    """→ (width, height, pixel ndarray). The synthetic FIMG container for
    tests, else ops/media_codecs.image_decode_gray's magic dispatch over
    the full native raster family (BMP/PNG/GIF/TIFF/JPEG/Netpbm/PCX/Sun/
    SGI/HDR, plus WebP through the system libwebp)."""
    if data[:4] == IMG_MAGIC:
        w, h = struct.unpack("<HH", data[4:8])
        px = np.frombuffer(data[8:8 + w * h], dtype=np.uint8)
        return w, h, px
    from dedoc_ray.ops.media_codecs import image_decode_gray

    gray = image_decode_gray(data)
    h, w = gray.shape
    return w, h, gray.reshape(-1)


class ImageFeatureKernel:
    """Actor: decode + per-image features. One instance per worker; batch
    size must stay small (payload bytes × batch_size bounded)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: Dict[str, list] = {"doc_id": batch["doc_id"].to_pylist(), "width": [], "height": [], "n_pixels": [], "mean_pixel": []}
        for data in batch["image"].to_pylist():
            w, h, px = _decode_payload(data)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_pixels"].append(w * h)
            # integer division, not float mean: exact and SQL-replayable
            cols["mean_pixel"].append(int(px.sum()) // len(px) if len(px) else 0)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(cols["doc_id"], "int64"),
                "width": pa.array(cols["width"], "int64"),
                "height": pa.array(cols["height"], "int64"),
                "n_pixels": pa.array(cols["n_pixels"], "int64"),
                "mean_pixel": pa.array(cols["mean_pixel"], "int64"),
            }
        )


class ThumbnailKernel:
    """Actor: subsample to target×target (stride crop — the stub resize;
    a real deployment swaps in PIL's resize)."""

    def __init__(self, target: int = 8) -> None:
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        thumbs, dims = [], []
        for data in batch["image"].to_pylist():
            w, h, px = _decode_payload(data)
            t = self.target
            grid = px[: w * h].reshape(h, w)
            ys = np.linspace(0, h - 1, t).astype(int)
            xs = np.linspace(0, w - 1, t).astype(int)
            thumb = grid[np.ix_(ys, xs)]
            thumbs.append(IMG_MAGIC + struct.pack("<HH", t, t) + thumb.tobytes())
            dims.append(t)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "thumb": pa.array(thumbs, "binary"),
                "thumb_dim": pa.array(dims, "int64"),
            }
        )


class AudioFrameKernel:
    """Actor: frame-sample stats (frame_len-sized windows, hop = frame_len)."""

    def __init__(self, frame_len: int = 400) -> None:
        self.frame_len = frame_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_samples, n_frames, dur_ms = [], [], []
        for data in batch["audio"].to_pylist():
            if data[:4] == b"RIFF":
                # REAL codec: RIFF/WAVE PCM-16 (ops/media_codecs.py)
                from dedoc_ray.ops.media_codecs import wav_decode

                samples, rate = wav_decode(data)
                n = len(samples)
            elif data[:4] == b".snd":
                # REAL codec: Sun AU, PCM-16 BE or G.711 µ-law
                from dedoc_ray.ops.media_codecs import au_decode

                samples, rate = au_decode(data)
                n = len(samples)
            elif data[:4] == b"fLaC":
                # REAL lossless codec: FLAC (ops/flac_codec.py) — Rice
                # residuals, fixed/LPC predictors, CRC-checked frames
                from dedoc_ray.ops.flac_codec import flac_decode

                samples, rate = flac_decode(data)
                n = len(samples)
            elif data[:4] == AUD_MAGIC:
                (n,) = struct.unpack("<I", data[4:8])
                rate = 16000
            else:
                raise ValueError("unknown audio container")
            n_samples.append(n)
            n_frames.append(n // self.frame_len)
            dur_ms.append(n * 1000 // rate)
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_samples": pa.array(n_samples, "int64"),
                "n_frames": pa.array(n_frames, "int64"),
                "duration_ms": pa.array(dur_ms, "int64"),
            }
        )


class VideoFrameSampleKernel:
    """Actor: fps-decimated frame sampling (every ``stride``-th frame) with
    a sampled-frame checksum — the video analogue of AudioFrameKernel;
    a real deployment swaps the container parse for ffmpeg keyframe pulls
    (absent here; plumbing — small batches, binary column, per-frame
    stats — is the real contract)."""

    def __init__(self, stride: int = 6) -> None:
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames, n_sampled, checksum = [], [], []
        for data in batch["video"].to_pylist():
            if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
                # REAL compressed codec: Motion-JPEG in AVI — every frame
                # runs the baseline JPEG decoder (ops/jpeg_codec.py)
                from dedoc_ray.ops.media_codecs import avi_mjpeg_decode

                planes = avi_mjpeg_decode(data)
                sampled_means = [int(f.sum()) // f.size for f in planes[:: self.stride]]
                n_frames.append(len(planes))
                n_sampled.append(len(sampled_means))
                checksum.append(sum(sampled_means))
                continue
            if data[:9] == b"YUV4MPEG2":
                # REAL codec: Y4M 4:2:0 raw video (ops/media_codecs.py);
                # per-frame stat = integer mean of the sampled luma plane
                from dedoc_ray.ops.media_codecs import y4m_decode

                planes = y4m_decode(data)
                sampled_means = [int(f.sum()) // f.size for f in planes[:: self.stride]]
                n_frames.append(len(planes))
                n_sampled.append(len(sampled_means))
                checksum.append(sum(sampled_means))
                continue
            if data[:4] != VID_MAGIC:
                raise ValueError("unknown video container")
            n, w, h = struct.unpack("<IHH", data[4:12])
            frames = np.frombuffer(data[12:12 + n], dtype=np.uint8)
            sampled = frames[:: self.stride]
            n_frames.append(n)
            n_sampled.append(len(sampled))
            checksum.append(int(sampled.sum()))
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "n_frames": pa.array(n_frames, "int64"),
                "n_sampled": pa.array(n_sampled, "int64"),
                "checksum": pa.array(checksum, "int64"),
            }
        )


# ------------------------------------------------------------- pipelines


def image_features(sf_dir: str):
    return media_corpus(sf_dir).drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def image_thumbnails(sf_dir: str, target: int = 8):
    return media_corpus(sf_dir).drop_columns(["audio", "video"]).map_batches(
        ThumbnailKernel, fn_constructor_kwargs={"target": target},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1,
    )


def audio_frames(sf_dir: str, frame_len: int = 400):
    return media_corpus(sf_dir).drop_columns(["image", "video"]).map_batches(
        AudioFrameKernel, fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4), num_cpus=1,
    )


def video_frames(sf_dir: str, stride: int = 6):
    return media_corpus(sf_dir).drop_columns(["image", "audio"]).map_batches(
        VideoFrameSampleKernel, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1,
    )


def image_features_bmp(sf_dir: str):
    """The image feature stage over REAL BMP payloads — same kernel,
    format-agnostic decode."""
    return media_corpus_real(sf_dir).drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def image_features_png(sf_dir: str):
    """The image feature stage over REAL PNG payloads (stdlib-zlib inflate,
    per-row unfilter) — same kernel, magic-dispatched decode."""
    return media_corpus_real(sf_dir, image_codec="png").drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def image_features_gif(sf_dir: str):
    """The image feature stage over REAL GIF payloads (LZW decode, palette
    mapping) — same kernel, magic-dispatched decode."""
    return media_corpus_real(sf_dir, image_codec="gif").drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def image_features_jpeg(sf_dir: str):
    """The image feature stage over REAL baseline JPEG payloads — full
    entropy decode (canonical Huffman from DHT, 0xFF00 unstuffing, DC
    prediction, ZRL/EOB), dequantize, matrix IDCT (ops/jpeg_codec.py).
    Constant-gray corpus images decode bit-exactly → exact SQL oracle."""
    return media_corpus_real(sf_dir, image_codec="jpeg").drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def image_features_jpeg_color(sf_dir: str):
    """The image feature stage over 4:2:0 YCbCr color JPEG payloads — the
    MCU-interleaved multi-component decode path (per-component sampling
    factors, predictors and Huffman tables); features read the luma plane."""
    return media_corpus_real(sf_dir, image_codec="jpeg_color").drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def image_features_jpeg_arith(sf_dir: str):
    """The image feature stage over ARITHMETIC-coded JPEG payloads (SOF9
    sequential + SOF10 progressive every third doc; T.81 Annexes D/F/G —
    QM coder, DC diff-conditioning contexts, AC Kx split, spectral-band
    scans; ops/jpeg_arith.py). Decoder interop is pinned against libjpeg
    in both directions in tests/test_jpeg_arith.py; constant-gray corpus
    images decode bit-exactly → the baseline exact SQL oracle applies."""
    return media_corpus_real(sf_dir, image_codec="jpeg_arith").drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def audio_frames_au(sf_dir: str, frame_len: int = 400):
    """The audio frame stage over REAL Sun AU PCM-16-BE payloads."""
    return media_corpus_real(sf_dir, audio_codec="au").drop_columns(["image", "video"]).map_batches(
        AudioFrameKernel, fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4), num_cpus=1,
    )


def audio_frames_wav(sf_dir: str, frame_len: int = 400):
    """The audio frame stage over REAL RIFF/WAVE PCM payloads (per-file
    sample rates from the fmt chunk)."""
    return media_corpus_real(sf_dir).drop_columns(["image", "video"]).map_batches(
        AudioFrameKernel, fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4), num_cpus=1,
    )


def video_frames_y4m(sf_dir: str, stride: int = 6):
    """The video frame-sampling stage over REAL YUV4MPEG2 payloads
    (checksum = integer mean luma of each sampled frame)."""
    return media_corpus_real(sf_dir).drop_columns(["image", "audio"]).map_batches(
        VideoFrameSampleKernel, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1,
    )


IMAGE_FEATURES_BMP_SQL = """
SELECT doc_id,
       CAST(4 + doc_id % 8 AS BIGINT) AS width,
       CAST(3 + doc_id % 5 AS BIGINT) AS height,
       CAST((4 + doc_id % 8) * (3 + doc_id % 5) AS BIGINT) AS n_pixels,
       CAST(list_sum(flatten(list_transform(range(0, 3 + doc_id % 5),
                y -> list_transform(range(0, 4 + doc_id % 8),
                                    x -> (doc_id + x + y) % 256))))
            // ((4 + doc_id % 8) * (3 + doc_id % 5)) AS BIGINT) AS mean_pixel
FROM documents
"""

def image_features_jpeg_prog(sf_dir: str):
    """The image feature stage over PROGRESSIVE JPEG (SOF2) — multi-scan
    coefficient accumulation: DC successive approximation + refinement
    scan + AC spectral band with EOB-run decode (ops/jpeg_codec.py)."""
    return media_corpus_real(sf_dir, image_codec="jpeg_prog").drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def audio_frames_adpcm(sf_dir: str, frame_len: int = 400):
    """The audio frame stage over IMA-ADPCM-compressed WAV (format tag
    0x11) — a REAL compressed audio codec, integer step-table decode."""
    return media_corpus_real(sf_dir, audio_codec="adpcm").drop_columns(["image", "video"]).map_batches(
        AudioFrameKernel, fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4), num_cpus=1,
    )


def image_features_tiff(sf_dir: str):
    """The image feature stage over REAL TIFF payloads (IFD walk, strips,
    PackBits on every third doc) — same kernel, magic-dispatched decode."""
    return media_corpus_real(sf_dir, image_codec="tiff").drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def image_features_scanext(sf_dir: str):
    """The image feature stage over the scanner-raster container family —
    Netpbm P6 / PCX RLE / Sun raster / SGI rotated by doc_id % 4. All four
    decoders are pinned pixel-exact against the reference's real scanned
    page (tests/test_raster_family.py); the corpus writers share bmp's
    pixel field, so the one exact SQL oracle covers the family."""
    from dedoc_ray.ops import media_codecs as mc

    fns = [mc.pnm_payload, mc.pcx_payload, mc.ras_payload, mc.sgi_payload]

    def gen(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict({
            "doc_id": batch["doc_id"],
            "image": pa.array([fns[d % 4](d) for d in doc_ids], "binary"),
        })

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(gen, batch_format="pyarrow").map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def media_corpus_mixed(sf_dir: str):
    """HETEROGENEOUS image corpus — the real-crawl shape: each doc's format
    is picked by doc_id % 6 across BMP/PNG/GIF/TIFF/JPEG/color-JPEG, all
    flowing through ONE stream into the magic-dispatched decode."""
    import ray.data as rd

    from dedoc_ray.ops import media_codecs as mc
    from dedoc_ray.ops.jpeg_codec import jpeg_payload, jpeg_payload_color

    fns = [mc.bmp_payload, mc.png_payload, mc.gif_payload, mc.tiff_payload,
           jpeg_payload, jpeg_payload_color]

    def gen(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "image": pa.array([fns[d % 6](d) for d in doc_ids], "binary"),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(gen, batch_format="pyarrow")


def image_features_mixed(sf_dir: str):
    """Image features over the mixed-format corpus — one actor stage, six
    container formats, per-row magic dispatch (the production contract)."""
    return media_corpus_mixed(sf_dir).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def audio_corpus_mixed(sf_dir: str):
    """HETEROGENEOUS audio corpus: each doc's container picked by
    doc_id % 4 across WAV/AU/IMA-ADPCM/FLAC, one stream, per-row magic
    dispatch in the frame kernel — the audio sibling of
    media_corpus_mixed. All four carry the same sample field, so the WAV
    oracle applies without a CASE."""
    import ray.data as rd

    from dedoc_ray.ops import media_codecs as mc
    from dedoc_ray.ops.flac_codec import flac_payload

    fns = [mc.wav_payload, mc.au_payload, mc.adpcm_payload, flac_payload]

    def gen(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch["doc_id"],
                "audio": pa.array([fns[d % 4](d) for d in doc_ids], "binary"),
            }
        )

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return docs.map_batches(gen, batch_format="pyarrow")


def audio_frames_mixed(sf_dir: str, frame_len: int = 400):
    """Audio frame stats over the mixed-container corpus — one actor
    stage, four containers (RIFF/WAVE PCM, Sun AU big-endian, IMA ADPCM,
    FLAC), per-row magic dispatch."""
    return audio_corpus_mixed(sf_dir).map_batches(
        AudioFrameKernel, fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4), num_cpus=1,
    )


IMAGE_FEATURES_MIXED_SQL = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 6 <= 3 THEN 4 + doc_id % 8
                 ELSE 12 + (doc_id % 6) * 4 END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 6 <= 3 THEN 3 + doc_id % 5
                 ELSE 10 + (doc_id % 4) * 6 END AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 6 <= 3 THEN (4 + doc_id % 8) * (3 + doc_id % 5)
                 ELSE (12 + (doc_id % 6) * 4) * (10 + (doc_id % 4) * 6) END AS BIGINT) AS n_pixels,
       CAST(CASE WHEN doc_id % 6 <= 3 THEN
                 list_sum(flatten(list_transform(range(0, 3 + doc_id % 5),
                          y -> list_transform(range(0, 4 + doc_id % 8),
                                              x -> (doc_id + x + y) % 256))))
                 // ((4 + doc_id % 8) * (3 + doc_id % 5))
                 ELSE doc_id % 256 END AS BIGINT) AS mean_pixel
FROM documents
"""


def image_features_jpeg_prog_color(sf_dir: str):
    """The image feature stage over PROGRESSIVE COLOR JPEG — interleaved
    DC scans over the MCU grid + per-component AC band scans with distinct
    Huffman table ids; features read the luma plane."""
    return media_corpus_real(sf_dir, image_codec="jpeg_prog_color").drop_columns(["audio", "video"]).map_batches(
        ImageFeatureKernel, batch_format="pyarrow", batch_size=128, concurrency=(1, 4), num_cpus=1
    )


def audio_frames_flac(sf_dir: str, frame_len: int = 400):
    """The audio frame stage over FLAC — a real LOSSLESS compressed codec
    (ops/flac_codec.py): the decoded samples equal the PCM field exactly,
    so the WAV oracle applies unchanged."""
    return media_corpus_real(sf_dir, audio_codec="flac").drop_columns(["image", "video"]).map_batches(
        AudioFrameKernel, fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pyarrow", batch_size=256, concurrency=(1, 4), num_cpus=1,
    )


def video_frames_avi(sf_dir: str, stride: int = 6):
    """The video frame-sampling stage over Motion-JPEG AVI — a REAL
    compressed codec: the RIFF walk hands each '..dc' chunk to the
    baseline JPEG decoder; constant frames decode bit-exactly so the
    Y4M oracle applies unchanged."""
    return media_corpus_real(sf_dir, video_codec="avi").drop_columns(["image", "audio"]).map_batches(
        VideoFrameSampleKernel, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4), num_cpus=1,
    )


IMAGE_FEATURES_JPEG_SQL = """
SELECT doc_id,
       CAST(12 + (doc_id % 6) * 4 AS BIGINT) AS width,
       CAST(10 + (doc_id % 4) * 6 AS BIGINT) AS height,
       CAST((12 + (doc_id % 6) * 4) * (10 + (doc_id % 4) * 6) AS BIGINT) AS n_pixels,
       CAST(doc_id % 256 AS BIGINT) AS mean_pixel
FROM documents
"""

AUDIO_FRAMES_WAV_SQL = """
SELECT doc_id,
       CAST(500 + (doc_id % 50) * 20 AS BIGINT) AS n_samples,
       CAST((500 + (doc_id % 50) * 20) // 400 AS BIGINT) AS n_frames,
       CAST((500 + (doc_id % 50) * 20) * 1000
            // (8000 + (doc_id % 8) * 1000) AS BIGINT) AS duration_ms
FROM documents
"""

VIDEO_FRAMES_Y4M_SQL = """
SELECT doc_id,
       CAST(10 + doc_id % 20 AS BIGINT) AS n_frames,
       CAST((10 + doc_id % 20 + 5) // 6 AS BIGINT) AS n_sampled,
       CAST(list_sum(list_transform(range(0, 10 + doc_id % 20, 6),
                                    f -> (doc_id + f) % 256)) AS BIGINT) AS checksum
FROM documents
"""


VIDEO_FRAMES_SQL = """
SELECT doc_id,
       CAST(24 + doc_id % 48 AS BIGINT) AS n_frames,
       CAST((24 + doc_id % 48 + 5) // 6 AS BIGINT) AS n_sampled,
       CAST(list_sum(list_transform(range(0, 24 + doc_id % 48, 6),
                                    i -> (doc_id + i) % 256)) AS BIGINT) AS checksum
FROM documents
"""


IMAGE_FEATURES_SQL = """
SELECT doc_id,
       CAST(16 + doc_id % 32 AS BIGINT) AS width,
       CAST(16 + doc_id % 24 AS BIGINT) AS height,
       CAST((16 + doc_id % 32) * (16 + doc_id % 24) AS BIGINT) AS n_pixels,
       CAST(doc_id % 256 AS BIGINT) AS mean_pixel
FROM documents
"""

AUDIO_FRAMES_SQL = """
SELECT doc_id,
       CAST(1000 + (doc_id % 100) * 40 AS BIGINT) AS n_samples,
       CAST((1000 + (doc_id % 100) * 40) // 400 AS BIGINT) AS n_frames,
       CAST((1000 + (doc_id % 100) * 40) * 1000 // 16000 AS BIGINT) AS duration_ms
FROM documents
"""
