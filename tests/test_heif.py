"""HEIC/AVIF via the system-libheif ctypes backend (functions/heif.py):
real entropy-coded roundtrips when the library is present, declared-seam
behavior and native metadata sniff regardless."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_spark.functions import codecs
from amazon_textract_transformer_pipeline_spark.functions.heif import (
    _libheif,
    heif_decode_rgb,
    heif_encode_rgb,
)

needs_libheif = pytest.mark.skipif(_libheif() is None,
                                   reason="system libheif absent")


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 5) % 256, (y * 7) % 256,
                     ((x + y) * 3) % 256], -1).astype(np.uint8)


@needs_libheif
@pytest.mark.parametrize("fmt", ["heic", "avif"])
def test_roundtrip_real_bitstreams(fmt):
    arr = _smooth(32, 48)
    blob = heif_encode_rgb(arr, fmt=fmt, quality=90)
    assert codecs.sniff_format(blob) == ("heif" if fmt == "heic" else "avif")
    out, orient = heif_decode_rgb(blob)
    assert orient is None
    assert out.shape == (32, 48, 3)
    assert float(np.mean(np.abs(out.astype(int) - arr.astype(int)))) < 6.0


@needs_libheif
def test_native_dims_sniff_agrees_with_decoder(fmt="avif"):
    blob = heif_encode_rgb(_smooth(24, 56), fmt=fmt)
    assert codecs.sniff_dimensions(blob) == (56, 24)


@needs_libheif
def test_hostile_input_stays_in_error_channel():
    good = heif_encode_rgb(_smooth(16, 16), fmt="avif")
    bad = good[:40] + b"\x00" * 10  # truncated after ftyp
    with pytest.raises(ValueError):
        heif_decode_rgb(bad)


@needs_libheif
def test_auto_decode_routes_heif():
    from amazon_textract_transformer_pipeline_spark.operators.multimodal import (
        auto_decode_fn,
    )

    arr = _smooth(20, 30)
    out, orient = auto_decode_fn(heif_encode_rgb(arr, fmt="avif"))
    assert out.shape == (20, 30, 3) and orient is None
