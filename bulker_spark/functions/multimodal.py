"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for 100 TB: media bytes live in a ``binary`` column (or an object-
store URI column for >~1 MB assets); decode / feature-extract / resize /
frame-sample run as **Arrow-batched ``mapInPandas``** stages so bytes move
executor-side in columnar batches, never through the driver. Partitioning:
media rows are large — size partitions by bytes not rows
(``spark.sql.files.maxPartitionBytes``, and ``maxRecordsPerBatch`` tuned
down so a batch of decoded frames fits in executor memory).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are stubbed: with ``codec="fake"`` (default) they parse the
deterministic FAKE header format below (real Spark plumbing, fake decode);
with ``codec="real"`` they raise ``NotImplementedError`` unless the lib
imports. The UDF signatures, schemas, and batch shapes are the production
ones.

FAKE binary layouts (deterministic, self-describing):
  image: b"FIMG" + u32 width + u32 height + pixel bytes (w*h, grayscale)
  audio: b"FAUD" + u32 sample_rate + u32 n_samples + i16 samples
  video: b"FVID" + u32 width + u32 height + u32 fps + u32 n_frames
         + n_frames consecutive w*h grayscale frames; frame i is the
         constant value (seed + 7*i) mod 256, so frame statistics are
         exact arithmetic functions of (seed, i) — oracle-checkable
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_MAGIC = b"FIMG"
AUDIO_MAGIC = b"FAUD"
VIDEO_MAGIC = b"FVID"

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    pixels = rng.randint(0, 256, size=width * height, dtype=np.uint8)
    return IMAGE_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def make_fake_image_pixels(width: int, height: int, pixels) -> bytes:
    """FAKE image from an explicit pixel sequence (values taken mod 256) —
    lets callers build images whose pixels are *arithmetic* functions of a
    key, so downstream decode stages are oracle-checkable in plain SQL."""
    px = np.asarray(pixels, dtype=np.int64) % 256
    if px.size != width * height:
        raise ValueError(f"need {width * height} pixels, got {px.size}")
    return (
        IMAGE_MAGIC
        + struct.pack("<II", width, height)
        + px.astype(np.uint8).tobytes()
    )


def make_fake_audio(sample_rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32767, size=n_samples, dtype=np.int16)
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + samples.tobytes()


def make_fake_video(
    width: int, height: int, fps: int, n_frames: int, seed: int = 0
) -> bytes:
    frames = bytearray()
    for i in range(n_frames):
        frames += bytes([(seed + 7 * i) % 256]) * (width * height)
    return (
        VIDEO_MAGIC
        + struct.pack("<IIII", width, height, fps, n_frames)
        + bytes(frames)
    )


def _decode_fake_image(b: bytes) -> tuple[int, int, np.ndarray] | None:
    if b is None or len(b) < 12 or b[:4] != IMAGE_MAGIC:
        return None
    w, h = struct.unpack("<II", b[4:12])
    pixels = np.frombuffer(b[12 : 12 + w * h], dtype=np.uint8)
    if pixels.size != w * h:
        return None
    return w, h, pixels.reshape(h, w)


def _require_real_codec(lib: str):
    try:
        return __import__(lib)
    except ImportError as ex:  # pragma: no cover - real codecs absent here
        raise NotImplementedError(
            f"real codec requires {lib!r}, not available in this environment; "
            "use codec='fake' (deterministic stub) for the Spark plumbing"
        ) from ex


# -- operators -------------------------------------------------------------

def image_metadata(
    df: DataFrame, content_col: str = "content", codec: str = "fake"
) -> DataFrame:
    """Decode headers → typed metadata struct column ``image_meta``.

    Arrow-batched; only headers are touched, pixels stay unparsed (cheap
    scan even at 100 TB: the binary column is late-materialized by parquet).
    """
    out_schema = T.StructType(
        [*df.schema.fields, T.StructField("image_meta", IMAGE_META_SCHEMA)]
    )
    if codec == "real":
        _require_real_codec("PIL")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[content_col]:
                d = _decode_fake_image(b)
                if d is None:
                    metas.append(
                        {
                            "width": None,
                            "height": None,
                            "n_bytes": len(b) if b is not None else None,
                            "format": None,
                            "valid": False,
                        }
                    )
                else:
                    w, h, _ = d
                    metas.append(
                        {
                            "width": w,
                            "height": h,
                            "n_bytes": len(b),
                            "format": "fimg",
                            "valid": True,
                        }
                    )
            pdf = pdf.copy()
            pdf["image_meta"] = metas
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def image_features(
    df: DataFrame,
    content_col: str = "content",
    n_bins: int = 16,
    codec: str = "fake",
) -> DataFrame:
    """Pixel-histogram feature vector (``array<double>``, L1-normalized) —
    the feature-extraction stage shape (swap the kernel for a real model)."""
    out_schema = T.StructType(
        [
            *df.schema.fields,
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    if codec == "real":
        _require_real_codec("PIL")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                d = _decode_fake_image(b)
                if d is None:
                    feats.append(None)
                else:
                    _, _, px = d
                    hist, _ = np.histogram(px, bins=n_bins, range=(0, 256))
                    total = hist.sum() or 1
                    feats.append((hist / total).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def image_resize(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    codec: str = "fake",
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded into the FAKE format (the
    batch-transform stage shape: binary in → binary out)."""
    out_schema = T.StructType(
        [*df.schema.fields, T.StructField("resized", T.BinaryType())]
    )
    if codec == "real":
        _require_real_codec("PIL")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[content_col]:
                d = _decode_fake_image(b)
                if d is None:
                    out.append(None)
                else:
                    w, h, px = d
                    ys = (np.arange(height) * h // height).clip(0, h - 1)
                    xs = (np.arange(width) * w // width).clip(0, w - 1)
                    small = px[np.ix_(ys, xs)]
                    out.append(
                        IMAGE_MAGIC
                        + struct.pack("<II", width, height)
                        + small.astype(np.uint8).tobytes()
                    )
            pdf = pdf.copy()
            pdf["resized"] = out
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


AHASH_BANDS = 4  # 64-bit hash as 4×16-bit bands (the LSH band unit)


def image_ahash(
    df: DataFrame, content_col: str = "content", codec: str = "fake"
) -> DataFrame:
    """Perceptual average-hash (aHash) over image binaries → 4×16-bit
    band columns ``b0..b3`` (+ ``ahash_valid``).

    The kernel nearest-neighbor-downsamples to 8×8, then sets bit *i* iff
    ``pixel_i * 64 >= sum(pixels)`` — the integer form of "pixel above
    mean", exact (no float mean), so the whole stage is oracle-checkable.
    Bands instead of one 64-bit value: band equality is the LSH bucketing
    key for near-duplicate candidate generation (hamming-≤k pairs share a
    band with high probability), and per-band ``xor``+``bit_count`` gives
    the verify-stage hamming distance JVM-side. Arrow-batched, vectorized
    numpy; only candidate *pairs* ever shuffle, never pixel data."""
    out_schema = T.StructType(
        [
            *df.schema.fields,
            *[T.StructField(f"b{k}", T.IntegerType()) for k in range(AHASH_BANDS)],
            T.StructField("ahash_valid", T.BooleanType()),
        ]
    )
    if codec == "real":
        _require_real_codec("PIL")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bands: list[list[int | None]] = [[] for _ in range(AHASH_BANDS)]
            valid = []
            for b in pdf[content_col]:
                d = _decode_fake_image(b)
                if d is None:
                    for k in range(AHASH_BANDS):
                        bands[k].append(None)
                    valid.append(False)
                    continue
                w, h, px = d
                ys = (np.arange(8) * h // 8).clip(0, h - 1)
                xs = (np.arange(8) * w // 8).clip(0, w - 1)
                small = px[np.ix_(ys, xs)].astype(np.int64).ravel()
                bits = (small * 64 >= small.sum()).astype(np.int64)
                weights = 1 << np.arange(16, dtype=np.int64)
                for k in range(AHASH_BANDS):
                    bands[k].append(
                        int((bits[16 * k : 16 * (k + 1)] * weights).sum())
                    )
                valid.append(True)
            pdf = pdf.copy()
            for k in range(AHASH_BANDS):
                pdf[f"b{k}"] = pd.array(bands[k], dtype="Int32")
            pdf["ahash_valid"] = valid
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def video_frame_sample(
    df: DataFrame,
    every_nth: int = 1,
    content_col: str = "content",
    codec: str = "fake",
) -> DataFrame:
    """Frame-sampling over video binaries: keep every ``every_nth`` frame,
    one output row per kept frame with its timestamp and mean luminance.

    The 1 → N row explosion runs inside ``mapInPandas`` so frames never
    leave the executor undecoded; at 100 TB, pair with a small
    ``maxRecordsPerBatch`` so a batch of decoded frames fits in memory,
    and drop ``content`` immediately after (only scalar frame stats
    shuffle). ``codec="real"`` gates on cv2 (not in this container)."""
    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")
    out_schema = T.StructType(
        [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("t_ms", T.LongType()),
            T.StructField("mean_luma", T.DoubleType()),
            *[f for f in df.schema.fields if f.name != content_col],
        ]
    )
    if codec == "real":
        _require_real_codec("cv2")

    passthrough = [f.name for f in df.schema.fields if f.name != content_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # column-wise iteration (r08, guide §4.2): the previous
        # ``pdf.iterrows()`` + one dict per output row paid ~100 µs of
        # pandas Series construction per INPUT row and re-boxed every
        # passthrough value per frame; zip over plain column lists and
        # build output columns once. Per-frame math is unchanged
        # (same np.frombuffer/.mean()/round), so values are
        # bit-identical — mean_luma feeds an oracled average.
        for pdf in batches:
            idx_out: list[int] = []
            tms_out: list[int] = []
            luma_out: list[float] = []
            keep: list[int] = []
            contents = pdf[content_col].tolist()
            for j, b in enumerate(contents):
                if b is None or len(b) < 20 or b[:4] != VIDEO_MAGIC:
                    continue
                w, h, fps, n = struct.unpack("<IIII", b[4:20])
                frame_bytes = w * h
                if fps < 1 or len(b) < 20 + n * frame_bytes:
                    continue
                for i in range(0, n, every_nth):
                    off = 20 + i * frame_bytes
                    frame = np.frombuffer(
                        b[off : off + frame_bytes], dtype=np.uint8
                    )
                    idx_out.append(i)
                    tms_out.append(i * 1000 // fps)
                    luma_out.append(round(float(frame.mean()), 4))
                    keep.append(j)
            out = pd.DataFrame(
                {
                    "frame_idx": pd.Series(idx_out, dtype="int32"),
                    "t_ms": pd.Series(tms_out, dtype="int64"),
                    "mean_luma": pd.Series(luma_out, dtype="float64"),
                }
            )
            for c in passthrough:
                out[c] = pdf[c].iloc[keep].reset_index(drop=True)
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def audio_frame_sample(
    df: DataFrame,
    frame_ms: int = 100,
    content_col: str = "content",
    codec: str = "fake",
) -> DataFrame:
    """Frame-sampling: one output row per frame with RMS energy —
    ``mapInPandas`` with row explosion (1 → N), the video-frame shape too."""
    out_schema = T.StructType(
        [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
            *[f for f in df.schema.fields if f.name != content_col],
        ]
    )
    if codec == "real":
        _require_real_codec("librosa")

    passthrough = [f.name for f in df.schema.fields if f.name != content_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # column-wise iteration (r08, guide §4.2) — same rationale and
        # same per-frame numpy math as video_frame_sample above
        for pdf in batches:
            idx_out: list[int] = []
            rms_out: list[float] = []
            keep: list[int] = []
            contents = pdf[content_col].tolist()
            for j, b in enumerate(contents):
                if b is None or len(b) < 12 or b[:4] != AUDIO_MAGIC:
                    continue
                rate, n = struct.unpack("<II", b[4:12])
                samples = np.frombuffer(b[12 : 12 + 2 * n], dtype=np.int16)
                hop = max(int(rate * frame_ms / 1000), 1)
                for idx in range(0, len(samples), hop):
                    frame = samples[idx : idx + hop].astype(np.float64)
                    rms = float(np.sqrt(np.mean(frame**2))) if len(frame) else 0.0
                    idx_out.append(idx // hop)
                    rms_out.append(round(rms, 4))
                    keep.append(j)
            out = pd.DataFrame(
                {
                    "frame_idx": pd.Series(idx_out, dtype="int32"),
                    "rms": pd.Series(rms_out, dtype="float64"),
                }
            )
            for c in passthrough:
                out[c] = pdf[c].iloc[keep].reset_index(drop=True)
            yield out

    return df.mapInPandas(kernel, schema=out_schema)
