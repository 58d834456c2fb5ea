"""Pure-Python/numpy image codecs — real decode with no native image libs.

The reference decodes page images with PIL under SageMaker
(``notebooks/preproc/preproc.py:70-173``, ``image_utils.py:83-168``); this
sandbox ships no codecs, so round 2 left D2/D3 as an import-gated seam.
This module closes the seam for every format a from-scratch decoder can
cover from public specs using only the stdlib (``zlib``, ``struct``) and
numpy:

- **PNG** (W3C PNG spec / RFC 2083): non-interlaced, bit depth 8, color
  types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); all five
  scanline filters; ``PLTE``/``tRNS`` honored; alpha composited over
  white (the reference thumbnails onto a white page, preproc.py:120);
  ``eXIf`` chunk parsed for EXIF orientation (TIFF tag 0x0112) so the
  D4 rotation path runs on real containers.
- **BMP** (BITMAPINFOHEADER): uncompressed BI_RGB 24/32-bit, bottom-up or
  top-down, 4-byte row padding.
- **PPM/PGM** binary (``P6``/``P5``, maxval ≤ 255, comment-tolerant).

Matching encoders (:func:`encode_png`, :func:`encode_bmp`,
:func:`encode_ppm`) exist so tests roundtrip real containers end-to-end
and synthetic corpora can carry real-format payloads. JPEG/GIF/TIFF remain
behind the PIL seam (``operators/multimodal.pil_decode_fn``) — entropy
coding from scratch is out of scope and the seam is documented.

Decode cost note (100 TB): filters 0/1/2 are fully vectorized (copy,
per-lane cumsum mod 256, vectorized up-add); filters 3/4 (average/Paeth)
are inherently sequential per scanline byte and fall back to a Python
loop. This runs inside the Arrow-batched ``thumbnail_images`` stage, which
is already the sanctioned Python-side path; on a real cluster you'd still
prefer Pillow-SIMD where installable — this is the zero-dependency floor,
not the ceiling.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


# --------------------------------------------------------------------------
# format sniffing
# --------------------------------------------------------------------------

def sniff_format(blob: bytes) -> str | None:
    """Magic-number sniff (the D1 media-type inference rule for real
    containers, image_utils.py:299-366). Returns a lowercase format name
    or None."""
    if blob.startswith(_PNG_SIG):
        return "png"
    if blob.startswith(b"BM"):
        return "bmp"
    if blob[:2] in (b"P5", b"P6") and (len(blob) > 2 and blob[2:3].isspace()):
        return "pgm" if blob[:2] == b"P5" else "ppm"
    if blob.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if blob.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if blob.startswith((b"II*\x00", b"MM\x00*")):
        return "tiff"
    return None


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """PNG scanline unfiltering → (height, stride) uint8. Filters 0/1/2
    vectorized; 3/4 per-byte (see module docstring)."""
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG IDAT size mismatch: got {len(raw)}, "
            f"want {height * (stride + 1)}")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint16)
    for y in range(height):
        ftype = int(rows[y, 0])
        filt = rows[y, 1:]
        if ftype == 0:
            recon = filt.copy()
        elif ftype == 1:  # Sub: prefix sum per byte lane, mod 256
            lanes = filt.reshape(-1, bpp).astype(np.uint64)
            recon = (np.cumsum(lanes, axis=0) & 0xFF).astype(np.uint8)
            recon = recon.reshape(stride)
        elif ftype == 2:  # Up
            recon = ((filt.astype(np.uint16) + prev) & 0xFF).astype(np.uint8)
        elif ftype in (3, 4):  # Average / Paeth: sequential per byte
            fi = filt.tolist()
            pr = prev.tolist()
            rc = [0] * stride
            for x in range(stride):
                a = rc[x - bpp] if x >= bpp else 0
                b = pr[x]
                if ftype == 3:
                    rc[x] = (fi[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = pr[x - bpp] if x >= bpp else 0
                    rc[x] = (fi[x] + _paeth(a, b, c)) & 0xFF
            recon = np.asarray(rc, dtype=np.uint8)
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = recon
        prev = recon.astype(np.uint16)
    return out


def _parse_exif_orientation(tiff: bytes) -> int | None:
    """Minimal TIFF IFD walk for tag 0x0112 (Orientation) — the payload of
    a PNG ``eXIf`` chunk is a bare TIFF blob (PNG eXIf spec)."""
    try:
        if tiff[:4] == b"II*\x00":
            e = "<"
        elif tiff[:4] == b"MM\x00*":
            e = ">"
        else:
            return None
        (ifd_off,) = struct.unpack_from(e + "I", tiff, 4)
        (n,) = struct.unpack_from(e + "H", tiff, ifd_off)
        for i in range(n):
            tag, typ, _cnt = struct.unpack_from(
                e + "HHI", tiff, ifd_off + 2 + 12 * i)
            if tag == 0x0112 and typ == 3:  # SHORT
                (val,) = struct.unpack_from(
                    e + "H", tiff, ifd_off + 2 + 12 * i + 8)
                return int(val)
    except (struct.error, IndexError):
        return None
    return None


def decode_png(blob: bytes) -> tuple[np.ndarray, int | None]:
    """PNG → ((h, w, 3) uint8 RGB, exif_orientation|None). Alpha is
    composited over white. Raises ValueError for interlaced / non-8-bit /
    malformed input (callers surface it in the ``error`` column)."""
    if not blob.startswith(_PNG_SIG):
        raise ValueError("PNG: bad signature")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = trns = exif_tiff = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("PNG: truncated chunk")
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"eXIf":
            exif_tiff = bytes(data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("PNG: Adam7 interlace not supported (re-encode "
                         "non-interlaced or use the PIL seam)")
    if depth != 8:
        raise ValueError(f"PNG: bit depth {depth} not supported (8 only)")
    if color not in _PNG_CHANNELS:
        raise ValueError(f"PNG: color type {color} not supported")
    if w == 0 or h == 0:
        raise ValueError("PNG: zero dimension")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, w, h, ch).reshape(h, w, ch)

    orientation = _parse_exif_orientation(exif_tiff) if exif_tiff else None

    if color == 2:  # RGB
        return px.copy(), orientation
    if color == 0:  # gray
        return np.repeat(px, 3, axis=2), orientation
    if color == 3:  # palette
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        ix = px[:, :, 0]
        if ix.max(initial=0) >= len(plte):
            raise ValueError("PNG: palette index out of range")
        rgb = plte[ix]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[:len(trns)] = trns
            return _over_white(rgb, alpha[ix]), orientation
        return rgb, orientation
    if color == 4:  # gray + alpha
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
        return _over_white(rgb, px[:, :, 1]), orientation
    # color == 6: RGBA
    return _over_white(px[:, :, :3], px[:, :, 3]), orientation


def _over_white(rgb: np.ndarray, alpha: np.ndarray) -> np.ndarray:
    """Composite (h, w, 3) over white with (h, w) alpha — integer exact:
    out = round((rgb*a + 255*(255-a)) / 255)."""
    a = alpha.astype(np.uint32)[..., None]
    num = rgb.astype(np.uint32) * a + 255 * (255 - a)
    return ((num + 127) // 255).astype(np.uint8)


def _filter_row(ftype: int, cur: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Forward PNG filter (encoder side) for one reconstructed scanline."""
    stride = len(cur)
    c32, p32 = cur.astype(np.int32), prev.astype(np.int32)
    left = np.zeros(stride, dtype=np.int32)
    left[bpp:] = c32[:-bpp]
    ul = np.zeros(stride, dtype=np.int32)
    ul[bpp:] = p32[:-bpp]
    if ftype == 0:
        out = c32
    elif ftype == 1:
        out = c32 - left
    elif ftype == 2:
        out = c32 - p32
    elif ftype == 3:
        out = c32 - ((left + p32) >> 1)
    elif ftype == 4:
        pred = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            pred[x] = _paeth(int(left[x]), int(p32[x]), int(ul[x]))
        out = c32 - pred
    else:
        raise ValueError(f"PNG: unknown filter type {ftype}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(arr: np.ndarray, filter_type: int | str = 0,
               orientation: int | None = None) -> bytes:
    """(h, w) | (h, w, {1,3,4}) uint8 → PNG bytes. ``filter_type`` is one
    of 0-4 applied to every row, or ``"mixed"`` (cycles 0→4 — exercises
    every decoder path). ``orientation`` writes an eXIf chunk."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"encode_png: {ch}-channel input not supported")
    flat = arr.reshape(h, w * ch)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        lines.append(ft)
        lines.extend(_filter_row(ft, flat[y], prev, ch).tobytes())
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    out = bytearray(_PNG_SIG)
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    if orientation is not None:
        tiff = (b"II*\x00" + struct.pack("<I", 8)
                + struct.pack("<H", 1)
                + struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
                + struct.pack("<I", 0))
        out += chunk(b"eXIf", tiff)
    out += chunk(b"IDAT", zlib.compress(bytes(lines), 6))
    out += chunk(b"IEND", b"")
    return bytes(out)


# --------------------------------------------------------------------------
# BMP
# --------------------------------------------------------------------------

def decode_bmp(blob: bytes) -> tuple[np.ndarray, int | None]:
    """BMP (BITMAPINFOHEADER, BI_RGB 24/32-bit) → ((h, w, 3) uint8 RGB,
    None). BMP carries no EXIF. Bottom-up (positive height) and top-down
    (negative) both handled; 32-bit alpha is ignored (opaque convention)."""
    if not blob.startswith(b"BM") or len(blob) < 54:
        raise ValueError("BMP: bad header")
    (pix_off,) = struct.unpack_from("<I", blob, 10)
    (hdr_size,) = struct.unpack_from("<I", blob, 14)
    if hdr_size < 40:
        raise ValueError(f"BMP: DIB header size {hdr_size} not supported")
    w, h = struct.unpack_from("<ii", blob, 18)
    (bpp,) = struct.unpack_from("<H", blob, 28)
    (compression,) = struct.unpack_from("<I", blob, 30)
    if compression != 0:
        raise ValueError(f"BMP: compression {compression} not supported "
                         "(BI_RGB only)")
    if bpp not in (24, 32):
        raise ValueError(f"BMP: {bpp}-bit not supported (24/32 only)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("BMP: bad dimensions")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = pix_off + stride * h
    if len(blob) < need:
        raise ValueError("BMP: truncated pixel data")
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h,
                         offset=pix_off).reshape(h, stride)
    px = rows[:, :w * nch].reshape(h, w, nch)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1].copy(), None  # BGR(A) → RGB


def encode_bmp(arr: np.ndarray, top_down: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_bmp: RGB input required")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = arr[:, :, ::-1].reshape(h, w * 3)  # RGB → BGR
    body = rows.tobytes() if top_down else rows[::-1].tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24,
                      0, stride * h, 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + dib + body


# --------------------------------------------------------------------------
# PPM / PGM (binary)
# --------------------------------------------------------------------------

def decode_ppm(blob: bytes) -> tuple[np.ndarray, int | None]:
    """Binary PPM (P6) / PGM (P5), maxval ≤ 255 → ((h, w, 3) uint8, None).
    Netpbm headers allow ``#`` comments between tokens."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("PPM: not a binary P5/P6 file")
    ch = 3 if blob[:2] == b"P6" else 1
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":
            while pos < len(blob) and blob[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        start = pos
        while pos < len(blob) and blob[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("PPM: malformed header")
        vals.append(int(blob[start:pos]))
    w, h, maxval = vals
    if maxval > 255 or maxval <= 0:
        raise ValueError(f"PPM: maxval {maxval} not supported")
    pos += 1  # exactly one whitespace byte after maxval
    need = w * h * ch
    px = np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos)
    if len(px) < need:
        raise ValueError("PPM: truncated pixel data")
    px = px.reshape(h, w, ch)
    if maxval != 255:  # rescale to full range, round-half-up
        px = (((px.astype(np.uint32) * 255) + maxval // 2)
              // maxval).astype(np.uint8)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return px.copy(), None


def encode_ppm(arr: np.ndarray, comment: str | None = None) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_ppm: RGB input required")
    hdr = b"P6\n"
    if comment:
        hdr += b"# " + comment.encode() + b"\n"
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + arr.tobytes()


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

_DECODERS = {"png": decode_png, "bmp": decode_bmp,
             "ppm": decode_ppm, "pgm": decode_ppm}


def builtin_decode_fn(blob: bytes) -> tuple[np.ndarray, int | None]:
    """Codec-seam implementation (``decode_fn(blob) -> (pixels,
    orientation)``) backed entirely by this module — the zero-dependency
    real-decode path for ``thumbnail_images``. Raises ValueError for
    formats needing native codecs (jpeg/gif/tiff) or unrecognized bytes;
    the Arrow stage converts that into the per-record ``error`` column."""
    fmt = sniff_format(bytes(blob))
    dec = _DECODERS.get(fmt)
    if dec is None:
        raise ValueError(
            f"builtin_decode_fn: format {fmt or 'unknown'} needs a native "
            "codec (PIL seam) — supported here: png/bmp/ppm/pgm")
    return dec(bytes(blob))
