"""Audio/video containers — pure struct/numpy, no native libs.

Rounds out the multimodal column family (SURVEY §2.13-adjacent; the
prompt's audio/video decode + feature-extract ops):

- **WAV** (RIFF PCM / IEEE-float): full decode to float samples and an
  encoder for fixtures. 8-bit unsigned, 16/24-bit signed PCM, 32-bit
  float; any channel count; chunk-walk tolerant of LIST/fact chunks.
- **MP4/QuickTime**: header-only box walk (ftyp/moov/mvhd/trak/tkhd) for
  duration and track dimensions — the D1 metadata path for video. Frame
  decode (H.264 et al.) is entropy-coded and stays behind an external
  tool seam, exactly like progressive JPEG.

Spark-side: ``operators/multimodal.audio_features`` maps WAV blobs to
(duration, rms, zero-crossing rate, spectral centroid) per record inside
the standard Arrow batch stage — the numpy FFT is vectorized per record,
errors land in the ``error`` column.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------

def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV → ((n_samples, n_channels) float64 in [-1, 1], sample_rate)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("WAV: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body = blob[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV: missing fmt/data chunk")
    audio_format, channels, rate, _byterate, _align, bits = fmt
    if channels == 0 or rate == 0:
        raise ValueError("WAV: zero channels/rate")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) \
                / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            raw = raw[:len(raw) - len(raw) % 3].reshape(-1, 3)
            as32 = (raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16))
            as32 = np.where(as32 >= 1 << 23, as32 - (1 << 24), as32)
            x = as32.astype(np.float64) / float(1 << 23)
        else:
            raise ValueError(f"WAV: {bits}-bit PCM not supported")
    elif audio_format == 3 and bits == 32:  # IEEE float
        x = np.frombuffer(data, "<f4").astype(np.float64)
    else:
        raise ValueError(f"WAV: format {audio_format}/{bits}-bit "
                         "not supported (PCM 8/16/24, float32)")
    n = len(x) - len(x) % channels
    return x[:n].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n, ch) float in [-1, 1] → WAV bytes (PCM 8/16 or float32)."""
    samples = np.asarray(samples, np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]  # mono column
    n, ch = samples.shape
    clipped = np.clip(samples, -1.0, 1.0)
    if bits == 16:
        raw = (np.round(clipped * 32767.0).astype("<i2")).tobytes()
        audio_format = 1
    elif bits == 8:
        raw = (np.round(clipped * 127.0) + 128).astype(np.uint8).tobytes()
        audio_format = 1
    elif bits == 32:
        raw = clipped.astype("<f4").tobytes()
        audio_format = 3
    else:
        raise ValueError("encode_wav: bits must be 8, 16 or 32")
    byterate = rate * ch * bits // 8
    fmt = struct.pack("<HHIIHH", audio_format, ch, rate, byterate,
                      ch * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_features(blob: bytes) -> dict:
    """Per-record audio features (all vectorized numpy): duration, RMS,
    zero-crossing rate, spectral centroid (Hz, mono mixdown rFFT)."""
    x, rate = decode_wav(blob)
    mono = x.mean(axis=1)
    n = len(mono)
    if n == 0:
        raise ValueError("WAV: empty data chunk")
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    spec = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    denom = float(spec.sum())
    centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
    return {
        "sample_rate": int(rate),
        "n_channels": int(x.shape[1]),
        "duration_s": n / rate,
        "rms": float(np.sqrt(np.mean(mono ** 2))),
        "zero_crossing_rate": zc,
        "spectral_centroid_hz": centroid,
    }


# --------------------------------------------------------------------------
# MP4 (header-only metadata)
# --------------------------------------------------------------------------

def sniff_mp4_meta(blob: bytes) -> dict:
    """MP4/QuickTime box walk → {duration_s, width, height, brand}.
    Header-only: mvhd gives timescale/duration, the first video tkhd
    gives 16.16 fixed-point dimensions. No codec work."""
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        raise ValueError("MP4: no ftyp box")
    brand = blob[8:12].decode("ascii", errors="replace")
    out = {"brand": brand, "duration_s": None, "width": None, "height": None}

    def walk(start: int, end: int, depth: int = 0) -> None:
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", blob, pos)
            btype = blob[pos + 4:pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack_from(">Q", blob, pos + 8)
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return
            body = pos + hdr
            if btype == b"moov" and depth == 0:
                walk(body, pos + size, 1)
            elif btype == b"trak" and depth == 1:
                walk(body, pos + size, 2)
            elif btype == b"mvhd":
                ver = blob[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", blob, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", blob, body + 12)
                if ts:
                    out["duration_s"] = dur / ts
            elif btype == b"tkhd" and out["width"] is None:
                ver = blob[body]
                w, h = struct.unpack_from(
                    ">II", blob, body + (76 if ver == 0 else 88))
                if w and h:
                    out["width"] = w >> 16  # 16.16 fixed point
                    out["height"] = h >> 16
            pos += size

    walk(0, len(blob))
    return out


def encode_mp4_stub(duration_s: float, width: int, height: int,
                    timescale: int = 1000) -> bytes:
    """Metadata-only MP4 fixture: ftyp + moov(mvhd + trak(tkhd)), no
    media data — exactly the boxes :func:`sniff_mp4_meta` reads."""
    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    mvhd = (b"\x00\x00\x00\x00"          # version/flags
            + b"\x00" * 8                # creation/modification
            + struct.pack(">II", timescale, int(duration_s * timescale))
            + b"\x00" * 80)              # rate/volume/matrix/next_track
    tkhd = (b"\x00\x00\x00\x07"          # version 0, enabled flags
            + b"\x00" * 72               # fixed v0 fields through matrix
            + struct.pack(">II", width << 16, height << 16))
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov
