"""Lossless WebP / VP8L (functions/webp.py): encode→decode identity for
every decoder stage the fixture writer can emit, container/seam
behavior, and integration with the codec family."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_spark.functions import codecs, webp


def _rng(seed):
    return np.random.Generator(np.random.PCG64(seed))


def test_literal_roundtrip_shapes():
    rng = _rng(1)
    for shape in [(1, 1, 3), (9, 13, 3), (5, 5), (3, 70, 3), (16, 2, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        if len(shape) == 3 and shape[2] == 4:
            img[:, :, 3] = 255  # opaque: RGB compare stays exact
        out, orient = webp.decode_webp(webp.encode_webp_lossless(img))
        want = img if img.ndim == 3 and img.shape[2] == 3 else (
            np.repeat(img[:, :, None], 3, axis=2) if img.ndim == 2
            else img[:, :, :3])
        assert orient is None
        assert np.array_equal(out, want), shape


def test_all_predictor_modes_roundtrip():
    rng = _rng(2)
    img = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    for mode in range(14):
        blob = webp.encode_webp_lossless(img, predictor_mode=mode)
        assert np.array_equal(webp.decode_webp(blob)[0], img), mode


def test_transform_dialects_roundtrip():
    rng = _rng(3)
    img = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    for kw in [{"subtract_green": True},
               {"cross_color": (10, -20, 33)},
               {"cross_color": (-128, 127, 5)},
               {"meta_prefix": True},
               {"cache_bits": 4},
               {"subtract_green": True, "predictor_mode": 7},
               {"cache_bits": 3, "rle": True, "subtract_green": True}]:
        blob = webp.encode_webp_lossless(img, **kw)
        assert np.array_equal(webp.decode_webp(blob)[0], img), kw


def test_palette_packing_roundtrip():
    rng = _rng(4)
    # 2/3/12/200 colors exercise 1-, 2-, 4-bit packing and none
    for ncol in (2, 3, 12, 200):
        pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = pal[rng.integers(0, ncol, (10, 13))]
        blob = webp.encode_webp_lossless(img, palette=True)
        assert np.array_equal(webp.decode_webp(blob)[0], img), ncol


def test_rle_backrefs_roundtrip():
    rng = _rng(5)
    img = np.repeat(rng.integers(0, 256, (6, 2, 3), dtype=np.uint8),
                    8, axis=1)  # long horizontal runs
    blob = webp.encode_webp_lossless(img, rle=True)
    assert np.array_equal(webp.decode_webp(blob)[0], img)
    plain = webp.encode_webp_lossless(img)
    assert len(blob) < len(plain)  # the backrefs actually fired


def test_alpha_composites_over_white():
    img = np.zeros((2, 2, 4), np.uint8)
    img[:, :, 0] = 200  # red
    img[:, :, 3] = 128  # half transparent
    out, _ = webp.decode_webp(webp.encode_webp_lossless(img))
    # 200*0.502 + 255*0.498 ≈ 227; green/blue ≈ 127
    assert abs(int(out[0, 0, 0]) - 227) <= 1
    assert abs(int(out[0, 0, 1]) - 127) <= 1


def test_container_and_seams():
    img = np.zeros((3, 3, 3), np.uint8)
    blob = webp.encode_webp_lossless(img)
    assert codecs.sniff_format(blob) == "webp"
    assert codecs.sniff_dimensions(blob) == (3, 3)
    arr, orient = codecs.builtin_decode_fn(blob)
    assert np.array_equal(arr, img)
    # lossy VP8 chunk → the documented external-codec seam
    lossy = blob.replace(b"VP8L", b"VP8 ")
    with pytest.raises(ValueError, match="lossy VP8"):
        webp.decode_webp(lossy)
    with pytest.raises(ValueError):
        webp.decode_webp(b"RIFF\x00\x00\x00\x00WAVE")


def test_truncation_stays_in_error_channel():
    img = _rng(6).integers(0, 256, (6, 6, 3), dtype=np.uint8)
    blob = webp.encode_webp_lossless(img, cache_bits=2)
    for cut in (13, 20, 30, len(blob) - 4):
        try:
            codecs.builtin_decode_fn(blob[:cut])
        except ValueError:
            pass  # the sanctioned channel; anything else fails the test


def test_vp8_stub_sniffs_dims_but_decode_is_seamed():
    """Lossy VP8: metadata NEVER errors (dims from the uncompressed
    key-frame header), pixel decode stays the declared codec seam."""
    from amazon_textract_transformer_pipeline_spark.functions import codecs
    from amazon_textract_transformer_pipeline_spark.functions.webp import (
        decode_webp, encode_webp_vp8_stub)

    blob = encode_webp_vp8_stub(640, 480, seed=3)
    assert codecs.sniff_format(blob) == "webp"
    assert codecs.sniff_dimensions(blob) == (640, 480)
    with pytest.raises(ValueError, match="lossy VP8"):
        decode_webp(blob)


def _has_libwebp() -> bool:
    from amazon_textract_transformer_pipeline_spark.functions.webp import (
        _libwebp,
    )

    return _libwebp() is not None


@pytest.mark.skipif(not _has_libwebp(), reason="system libwebp absent")
def test_libwebp_cross_validates_native_vp8l():
    """The reference implementation (system libwebp via ctypes) decodes
    our native VP8L encoder's output byte-exactly — the spec-derived
    lossless codec agrees with the spec's own implementation."""
    from amazon_textract_transformer_pipeline_spark.functions.webp import (
        decode_vp8l, encode_webp_lossless, libwebp_decode_rgba)

    rng = np.random.Generator(np.random.PCG64(11))
    arr = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    for kw in ({}, {"subtract_green": True}, {"cache_bits": 4},
               {"rle": True}):
        blob = encode_webp_lossless(arr, **kw)
        ours = decode_vp8l(blob[20:] if blob[12:16] == b"VP8L" else blob)
        theirs = libwebp_decode_rgba(blob)
        assert np.array_equal(ours, theirs), kw


@pytest.mark.skipif(not _has_libwebp(), reason="system libwebp absent")
def test_lossy_vp8_decodes_through_libwebp_backend():
    """REAL entropy-coded VP8: libwebp-encoded lossy bytes decode through
    decode_webp (ctypes backend) with correct dims and small error on a
    smooth image; sniff_dimensions reads the same dims header-only."""
    from amazon_textract_transformer_pipeline_spark.functions import codecs
    from amazon_textract_transformer_pipeline_spark.functions.webp import (
        decode_webp, libwebp_encode_rgb)

    y, x = np.mgrid[0:48, 0:64]
    arr = np.stack([(x * 4) % 256, (y * 5) % 256,
                    ((x + y) * 2) % 256], axis=-1).astype(np.uint8)
    blob = libwebp_encode_rgb(arr, quality=90.0)
    assert codecs.sniff_format(blob) == "webp"
    assert codecs.sniff_dimensions(blob) == (64, 48)
    rgb, orient = decode_webp(blob)
    assert rgb.shape == (48, 64, 3) and orient is None
    assert float(np.mean(np.abs(rgb.astype(int) - arr.astype(int)))) < 12.0
