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
    with pytest.raises(ValueError, match="external codec"):
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
    with pytest.raises(ValueError, match="external codec"):
        decode_webp(blob)
