"""Multimodal (image/audio/video) column plumbing.

The pattern for opaque media at 100 TB: a ``BINARY`` payload column + typed
metadata columns, processed by Arrow-batched ``mapInPandas`` stages (the
reference's page-image path, ``image_utils.py:171-655`` / thumbnail
preproc ``preproc.py:70-173``, follows exactly this shape with PIL under a
SageMaker endpoint).

This container has no image/audio codecs, so **real decode is stubbed**
(:func:`decode_image` raises ``NotImplementedError`` unless PIL is
importable) while everything Spark-side — schema, batch shape, partition
sizing, UDF signatures — is real and tested against a deterministic fake
codec (FAKE1 header format below). Swapping in PIL/ffmpeg changes only the
inner per-batch function.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"FAKE1"
_FMT = ">5sIIB"  # magic, width, height, format code
_HDR_SIZE = struct.calcsize(_FMT)
FORMATS = {0: "png", 1: "jpeg", 2: "tiff", 3: "wav", 4: "mp4"}


def make_fake_blob(width: int, height: int, fmt: int, seed: int) -> bytes:
    """Deterministic fake media payload (FAKE1 container)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    payload = rng.integers(0, 256, size=width * height % 4096 + 64,
                           dtype=np.uint8).tobytes()
    return struct.pack(_FMT, _MAGIC, width, height, fmt) + payload


def synth_media_df(spark, n: int, seed: int = 42, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic media table: (media_id, kind, blob)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                fmt = i % 5
                rows.append({
                    "media_id": i,
                    "kind": FORMATS[fmt],
                    "blob": make_fake_blob(64 + i % 512, 48 + i % 384, fmt,
                                           seed ^ i),
                })
            yield pd.DataFrame(rows)

    rng = spark.range(0, n, 1, partitions or 8)
    return rng.mapInPandas(gen, schema=schema)


META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("format", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("valid", T.BooleanType(), False),
])


def decode_metadata(media: DataFrame) -> DataFrame:
    """Header sniff (the D1 media-type inference analog,
    image_utils.py:299-366): cheap, no codec needed, error → valid=false
    row (warn-don't-fail channel, SURVEY §4)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                blob = bytes(blob)
                try:
                    magic, w, h, fmt = struct.unpack_from(_FMT, blob)
                    assert magic == _MAGIC
                    rows.append({"media_id": int(mid), "width": w, "height": h,
                                 "format": FORMATS.get(fmt, "unknown"),
                                 "n_bytes": len(blob), "valid": True})
                except Exception:
                    rows.append({"media_id": int(mid), "width": None,
                                 "height": None, "format": None,
                                 "n_bytes": len(blob), "valid": False})
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA])

    return media.select("media_id", "blob").mapInPandas(run, schema=META_SCHEMA)


FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("byte_histogram", T.ArrayType(T.DoubleType()), False),
    T.StructField("entropy", T.DoubleType(), False),
])


def extract_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Feature extraction over the raw payload (vectorized numpy per Arrow
    batch): normalized byte histogram + entropy. The real-codec version
    replaces the histogram with pixel/spectral features; the Spark plan is
    identical."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, hists, ents = [], [], []
            for mid, blob in zip(b["media_id"], b["blob"]):
                arr = np.frombuffer(bytes(blob)[_HDR_SIZE:], dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=n_bins).astype(float)
                p = hist / max(hist.sum(), 1.0)
                nz = p[p > 0]
                ids.append(int(mid))
                hists.append(p.tolist())
                ents.append(float(-(nz * np.log2(nz)).sum()))
            yield pd.DataFrame({"media_id": ids, "byte_histogram": hists,
                                "entropy": ents})

    return media.select("media_id", "blob").mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: emits n_frames payload slices per blob as
    ARRAY<BINARY> (the D2/D3 page-explode shape — posexplode downstream)."""
    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frames", T.ArrayType(T.BinaryType()), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, frames = [], []
            for mid, blob in zip(b["media_id"], b["blob"]):
                body = bytes(blob)[_HDR_SIZE:]
                step = max(len(body) // n_frames, 1)
                ids.append(int(mid))
                frames.append([body[i * step:(i + 1) * step]
                               for i in range(n_frames)])
            yield pd.DataFrame({"media_id": ids, "frames": frames})

    return media.select("media_id", "blob").mapInPandas(run, schema=schema)


def decode_image(media: DataFrame, size: tuple[int, int] = (224, 224)) -> DataFrame:
    """Real image decode + letterbox-resize to ``size`` (the reference's
    thumbnailer, image_utils.py:83-168 / preproc.py:38-42). Requires a
    codec library; cleanly gated."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover — no codecs in this sandbox
        raise NotImplementedError(
            "decode_image needs Pillow; this environment ships no image "
            "codecs. Use decode_metadata/extract_features (codec-free) or "
            "install Pillow on the cluster."
        ) from e
    raise NotImplementedError("wire PIL decode here")  # pragma: no cover


def explode_frames(frames_df: DataFrame) -> DataFrame:
    """ARRAY<BINARY> frames → one row per frame (order-preserving)."""
    return frames_df.select(
        "media_id", F.posexplode("frames").alias("frame_ix", "frame"))
