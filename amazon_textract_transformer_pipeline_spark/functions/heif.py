"""HEIF/HEIC/AVIF decode via the system libheif (ctypes backend).

The reference's media registry treats every raster format PIL can open as
decodable (``image_utils.py:17-42``); HEIC (iPhone default) and AVIF (the
modern web format) are entropy-coded (HEVC / AV1) — like lossy VP8, their
bitstreams need thousands of exact spec constants, so the engine binds to
the platform's reference implementation instead of transcribing them:
``libheif`` (1.x, present on most hosts) with its de265/x265 and
dav1d/aom plugins. When the library is absent every call raises the
declared external-codec ValueError and records degrade to the metadata
row (dims still sniff natively from the ispe box, functions/codecs.py).

API notes (why this binding is safe): libheif's public C API is opaque
pointers + scalars — no struct layouts to mirror except ``heif_error``
(three fields, returned by value, stable since 1.0). Encoding writes via
``heif_context_write_to_file`` (a tempfile) because the in-memory writer
needs a by-value-struct-returning callback, the one ctypes construct
worth avoiding.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

_RGB, _ILV = 1, 10       # heif_colorspace_RGB, heif_chroma_interleaved_RGB
_CH_ILV = 10             # heif_channel_interleaved
_FMT = {"heic": 1, "avif": 4}   # heif_compression_{HEVC,AV1}

class _HeifError(Exception):
    pass


def _probe_libheif():
    lib = None
    try:
        import ctypes
        import ctypes.util

        class HeifError(ctypes.Structure):
            _fields_ = [("code", ctypes.c_int), ("subcode", ctypes.c_int),
                        ("message", ctypes.c_char_p)]

        name = ctypes.util.find_library("heif") or "libheif.so.1"
        lib = ctypes.CDLL(name)
        P = ctypes.c_void_p
        u8p = ctypes.POINTER(ctypes.c_uint8)
        sigs = {
            "heif_context_alloc": (P, []),
            "heif_context_free": (None, [P]),
            "heif_context_read_from_memory_without_copy":
                (HeifError, [P, ctypes.c_char_p, ctypes.c_size_t, P]),
            "heif_context_get_primary_image_handle":
                (HeifError, [P, ctypes.POINTER(P)]),
            "heif_image_handle_get_width": (ctypes.c_int, [P]),
            "heif_image_handle_get_height": (ctypes.c_int, [P]),
            "heif_image_handle_release": (None, [P]),
            "heif_decode_image":
                (HeifError, [P, ctypes.POINTER(P), ctypes.c_int,
                             ctypes.c_int, P]),
            "heif_image_get_plane_readonly":
                (u8p, [P, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]),
            "heif_image_release": (None, [P]),
            "heif_context_get_encoder_for_format":
                (HeifError, [P, ctypes.c_int, ctypes.POINTER(P)]),
            "heif_encoder_release": (None, [P]),
            "heif_encoder_set_lossy_quality": (HeifError, [P, ctypes.c_int]),
            "heif_image_create":
                (HeifError, [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int, ctypes.POINTER(P)]),
            "heif_image_add_plane":
                (HeifError, [P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int]),
            "heif_image_get_plane":
                (u8p, [P, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]),
            "heif_context_encode_image":
                (HeifError, [P, P, P, P, ctypes.POINTER(P)]),
            "heif_context_write_to_file": (HeifError, [P, ctypes.c_char_p]),
        }
        for fn, (res, args) in sigs.items():
            f = getattr(lib, fn)
            f.restype = res
            f.argtypes = args
        lib._HeifError = HeifError  # stash for callers
    except (OSError, AttributeError):
        lib = None
    return lib


def _libheif():
    """System libheif under the deployment backend policy
    (functions/backends.py): auto-probe / require / forced-off."""
    from .backends import resolve_backend

    return resolve_backend("libheif", _probe_libheif)


def libheif_available() -> bool:
    return _libheif() is not None


def _check(err, what: str) -> None:
    if err.code != 0:
        msg = (err.message or b"").decode("utf-8", "replace")
        raise _HeifError(f"libheif {what}: {err.code}/{err.subcode} {msg}")


def heif_decode_rgb(blob: bytes) -> tuple[np.ndarray, None]:
    """HEIC/AVIF container → ((h, w, 3) uint8 RGB, orientation=None —
    libheif applies irot/imir itself). ValueError when the library is
    absent (the declared seam) or the payload is undecodable."""
    import ctypes

    lib = _libheif()
    if lib is None:
        raise ValueError(
            "HEIF/AVIF needs an external codec (libheif seam) — "
            "metadata dims still sniff natively")
    ctx = lib.heif_context_alloc()
    handle = img = None
    P = ctypes.c_void_p
    blob = bytes(blob)
    try:
        _check(lib.heif_context_read_from_memory_without_copy(
            ctx, blob, len(blob), None), "read")
        h_ = P()
        _check(lib.heif_context_get_primary_image_handle(
            ctx, ctypes.byref(h_)), "primary handle")
        handle = h_
        w = lib.heif_image_handle_get_width(handle)
        h = lib.heif_image_handle_get_height(handle)
        if not (0 < w <= 65536 and 0 < h <= 65536):
            raise _HeifError(f"libheif: implausible dims {w}x{h}")
        i_ = P()
        _check(lib.heif_decode_image(handle, ctypes.byref(i_),
                                     _RGB, _ILV, None), "decode")
        img = i_
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane_readonly(img, _CH_ILV,
                                                ctypes.byref(stride))
        if not ptr:
            raise _HeifError("libheif: no interleaved plane")
        flat = np.ctypeslib.as_array(ptr, shape=(h * stride.value,)).copy()
        out = np.stack([
            flat[y * stride.value:y * stride.value + w * 3].reshape(w, 3)
            for y in range(h)])
        return out, None
    except _HeifError as e:
        raise ValueError(str(e)) from e
    finally:
        if img is not None:
            lib.heif_image_release(img)
        if handle is not None:
            lib.heif_image_handle_release(handle)
        lib.heif_context_free(ctx)


def heif_encode_rgb(arr: np.ndarray, fmt: str = "avif",
                    quality: int = 90) -> bytes:
    """RGB array → HEIC (x265) or AVIF (aom) bytes — test fixtures for
    the real decode path. ValueError when libheif/encoder is absent."""
    import ctypes

    lib = _libheif()
    if lib is None:
        raise ValueError("HEIF/AVIF: libheif not available for encoding")
    if fmt not in _FMT:
        raise ValueError(f"HEIF/AVIF: unknown format {fmt!r}")
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("HEIF/AVIF: encoder expects (h, w, 3) RGB")
    h, w = arr.shape[:2]
    P = ctypes.c_void_p
    ctx = lib.heif_context_alloc()
    enc = img = None
    try:
        e_ = P()
        _check(lib.heif_context_get_encoder_for_format(
            ctx, _FMT[fmt], ctypes.byref(e_)), "get encoder")
        enc = e_
        i_ = P()
        _check(lib.heif_image_create(w, h, _RGB, _ILV,
                                     ctypes.byref(i_)), "image create")
        img = i_
        _check(lib.heif_image_add_plane(img, _CH_ILV, w, h, 8), "add plane")
        stride = ctypes.c_int()
        ptr = lib.heif_image_get_plane(img, _CH_ILV, ctypes.byref(stride))
        buf = np.ctypeslib.as_array(ptr, shape=(h * stride.value,))
        src = np.ascontiguousarray(arr, dtype=np.uint8)
        for y in range(h):
            buf[y * stride.value:y * stride.value + w * 3] = \
                src[y].reshape(-1)
        _check(lib.heif_encoder_set_lossy_quality(enc, int(quality)),
               "quality")
        _check(lib.heif_context_encode_image(ctx, img, enc, None, None),
               "encode")
        fd, path = tempfile.mkstemp(suffix=f".{fmt}")
        os.close(fd)
        try:
            _check(lib.heif_context_write_to_file(ctx, path.encode()),
                   "write")
            with open(path, "rb") as f:
                return f.read()
        finally:
            os.unlink(path)
    except _HeifError as e:
        raise ValueError(str(e)) from e
    finally:
        if img is not None:
            lib.heif_image_release(img)
        if enc is not None:
            lib.heif_encoder_release(enc)
        lib.heif_context_free(ctx)
