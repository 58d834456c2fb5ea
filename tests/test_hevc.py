"""hev1/hvc1 MP4 decode via the system-libde265 ctypes backend: real
HEVC intra bitstreams (x265 via libheif) rewrapped as MP4 video tracks,
decoded byte-identically to libheif's own decode of the same NALs."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_spark.functions.av import (
    _libde265,
    decode_hevc_frames,
    decode_video_frames,
    encode_hevc_mp4,
    mp4_sample_tables,
    parse_hvcc,
)
from amazon_textract_transformer_pipeline_spark.functions.heif import (
    _libheif,
    heif_decode_rgb,
    heif_encode_rgb,
)

needs_libs = pytest.mark.skipif(
    _libde265() is None or _libheif() is None,
    reason="system libde265/libheif absent")


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 5) % 256, (y * 7) % 256,
                     ((x + y) * 3) % 256], -1).astype(np.uint8)


@needs_libs
def test_hevc_mp4_roundtrip_matches_libheif_exactly():
    """Our NAL plumbing + full-range BT.601 conversion reproduces
    libheif's decode of the IDENTICAL bitstream byte-for-byte."""
    arr = _smooth(32, 48)
    mp4 = encode_hevc_mp4(arr, quality=90)
    trk = [t for t in mp4_sample_tables(mp4) if t["format"] == "hev1"][0]
    assert (trk["width"], trk["height"]) == (48, 32)
    length_size, params = parse_hvcc(trk["config"]["hvcC"])
    assert length_size == 4 and len(params) == 3  # VPS/SPS/PPS
    frames = decode_hevc_frames(mp4)
    assert len(frames) == 1
    rgb, orient = frames[0]
    assert orient is None and rgb.shape == (32, 48, 3)
    ref, _ = heif_decode_rgb(heif_encode_rgb(arr, fmt="heic", quality=90))
    assert np.array_equal(rgb, ref)


@needs_libs
def test_video_dispatch_and_error_channel():
    mp4 = encode_hevc_mp4(_smooth(16, 16))
    assert decode_video_frames(mp4, max_frames=1)[0][0].shape == (16, 16, 3)
    # truncate mdat: malformed bitstream stays in the ValueError channel
    bad = mp4[:60] + b"\x00" * 16
    with pytest.raises(ValueError):
        decode_video_frames(bad)


@needs_libs
def test_multiframe_thumbnails_routes_hevc(spark):
    import pandas as pd

    from amazon_textract_transformer_pipeline_spark.operators.multimodal import (
        multiframe_thumbnails,
    )

    mp4 = encode_hevc_mp4(_smooth(24, 24))
    media = spark.createDataFrame(
        pd.DataFrame([{"media_id": 0, "blob": mp4}]))
    rows = multiframe_thumbnails(media, size=(8, 8)).collect()
    assert len(rows) == 1 and rows[0].error is None
