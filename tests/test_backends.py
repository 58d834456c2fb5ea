"""Codec-backend deployment policy (functions/backends.py): the same corpus
must decode identically fleet-wide — 'require' fails fast on a missing
library, 'none' pins the library-less seam even where libraries exist."""

from __future__ import annotations

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_spark.functions import (
    av,
    backends,
    heif,
    webp,
)


def test_report_shape_and_sandbox_surface():
    rep = backends.codec_backend_report()
    assert rep["policy"] == "auto"
    # this sandbox ships all three system libraries (memory: round 5)
    assert rep["libwebp"] and rep["libheif"] and rep["libde265"]


def test_policy_none_forces_the_seam(monkeypatch):
    monkeypatch.setenv(backends.CODEC_BACKEND_ENV, "none")
    assert webp._libwebp() is None
    assert heif._libheif() is None
    assert av._libde265() is None
    rep = backends.codec_backend_report()
    assert rep == {"policy": "none", "libwebp": False,
                   "libheif": False, "libde265": False}
    # a decodable lossy blob now takes the declared ValueError seam
    rgb = np.zeros((8, 8, 3), np.uint8)
    monkeypatch.delenv(backends.CODEC_BACKEND_ENV)
    lossy = webp.libwebp_encode_rgb(rgb)         # encode under 'auto'
    monkeypatch.setenv(backends.CODEC_BACKEND_ENV, "none")
    with pytest.raises(ValueError):
        webp.decode_webp(lossy)


def test_policy_require_raises_on_missing_lib(monkeypatch):
    monkeypatch.setenv(backends.CODEC_BACKEND_ENV, "require")
    # present libraries resolve fine under 'require'
    assert webp._libwebp() is not None
    # an absent one is a deployment error, not a per-row degradation
    with pytest.raises(RuntimeError, match="required"):
        backends.resolve_backend("libnonexistent", lambda: None)


def test_invalid_policy_rejected(monkeypatch):
    monkeypatch.setenv(backends.CODEC_BACKEND_ENV, "sometimes")
    with pytest.raises(RuntimeError, match="invalid"):
        backends.codec_backend_policy()


def test_policy_returns_to_auto(monkeypatch):
    """Cache survives a policy round-trip: none → auto re-resolves."""
    monkeypatch.setenv(backends.CODEC_BACKEND_ENV, "none")
    assert webp._libwebp() is None
    monkeypatch.setenv(backends.CODEC_BACKEND_ENV, "auto")
    assert webp._libwebp() is not None
