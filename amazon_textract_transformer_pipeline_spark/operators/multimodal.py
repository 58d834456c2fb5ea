"""Multimodal (image/audio/video) column plumbing.

The pattern for opaque media at 100 TB: a ``BINARY`` payload column + typed
metadata columns, processed by Arrow-batched ``mapInPandas`` stages (the
reference's page-image path, ``image_utils.py:171-655`` / thumbnail
preproc ``preproc.py:70-173``, follows exactly this shape with PIL under a
SageMaker endpoint).

Real decode (round 3): ``functions/codecs.py`` implements PNG/BMP/PPM/PGM,
multi-frame TIFF, and GIF from the public specs with stdlib zlib + numpy,
so :func:`decode_image` and :func:`multiframe_thumbnails` run for real in
this codec-less sandbox via :func:`auto_decode_fn` (FAKE1 → fake codec,
png/bmp/ppm/pgm/tiff/gif → built-in, jpeg → PIL when importable (libjpeg
speed) with the built-in baseline T.81 decoder (functions/jpeg.py) as the
no-PIL fallback; only progressive jpeg without PIL lands in the
per-record ``error`` column). The deterministic FAKE1 container below
remains the oracle-friendly fixture format.
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

    rng = spark.range(0, n, 1, partitions or max(8, spark.sparkContext.defaultParallelism))
    return rng.mapInPandas(gen, schema=schema)


def synth_pdf_df(spark, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic PDF corpus: (media_id, blob). Closed-form
    in media_id (dims/page-count/line text below mirror the DuckDB gate
    oracle exactly), cycling through all six structural dialects of
    functions/pdf.write_pdf (classic xref, Flate content, xref streams,
    PNG-predictored xref streams, object streams) crossed with all four
    font dialects (unencoded Courier, WinAnsi + /Differences + /Widths,
    /ToUnicode CMap, Type0/CID Identity-H) — every line carries the
    accented token 'café' so the encoded-font paths must actually decode
    (a latin-1-only reader would emit mojibake and hash-mismatch)."""
    from ..functions.pdf import write_pdf

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ])
    dialects = [{}, {"compress": True}, {"xref_stream": True},
                {"xref_stream": True, "predictor": True},
                {"objstm": True}, {"objstm": True, "compress": True}]
    fonts = ["courier", "winansi", "tounicode", "cid"]
    # standard-security-handler axis: every 8th doc RC4- or AES-encrypted
    # (owner-locked, empty user password) — text must still extract
    encrypts = [None, None, None, "rc4", None, None, None, "aes"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                pages = []
                for p in range(1 + i % 4):
                    lines = [
                        f"doc {i} page {p} line {j} "
                        f"tok{(i*7 + p*3 + j) % 100} café"
                        for j in range(1 + (i + p) % 3)]
                    pages.append({"width": 300 + (i % 5) * 60,
                                  "height": 400 + (i % 4) * 80,
                                  "lines": lines})
                rows.append({"media_id": i,
                             "blob": write_pdf(pages, font=fonts[i % 4],
                                               encrypt=encrypts[i % 8],
                                               **dialects[i % 6])})
            yield pd.DataFrame(rows)

    rng = spark.range(0, n, 1, partitions or max(8, spark.sparkContext.defaultParallelism))
    return rng.mapInPandas(gen, schema=schema)


META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("format", T.StringType(), True),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("valid", T.BooleanType(), False),
])

PDF_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_pages", T.IntegerType(), True),
    T.StructField("encrypted", T.BooleanType(), True),
    T.StructField("valid", T.BooleanType(), False),
])


def pdf_structure_metadata(media: DataFrame) -> DataFrame:
    """D1/D2 for PDFs: structure-only metadata (page-1 point dims,
    page count, encrypted flag) via the native parser — no rasterization,
    no content decode. Map-only Arrow stage; error → valid=false row."""
    from ..functions import pdf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PDF_META_SCHEMA]
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                try:
                    m = pdf.pdf_meta(bytes(blob))
                    p0 = m["pages"][0] if m["pages"] else None
                    rows.append({
                        "media_id": int(mid),
                        "width": round(p0["width_pt"]) if p0 else None,
                        "height": round(p0["height_pt"]) if p0 else None,
                        "n_pages": m["n_pages"],
                        "encrypted": m["encrypted"],
                        "valid": True})
                except Exception:
                    rows.append({"media_id": int(mid), "width": None,
                                 "height": None, "n_pages": None,
                                 "encrypted": None, "valid": False})
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "blob").mapInPandas(
        run, schema=PDF_META_SCHEMA)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Header sniff (the D1 media-type inference analog,
    image_utils.py:299-366): cheap, no codec and no decompression needed —
    FAKE1 fixtures by header struct, real containers via
    codecs.sniff_format/sniff_dimensions (O(header) bytes per record);
    error → valid=false row (warn-don't-fail channel, SURVEY §4)."""
    from ..functions import codecs

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
                    continue
                except Exception:
                    pass
                rfmt = codecs.sniff_format(blob)
                dims = codecs.sniff_dimensions(blob) if rfmt else None
                if rfmt:  # sniffed format is the D1 answer; dims optional
                    # (audio has none, webp/mp4 may not expose them)
                    rows.append({"media_id": int(mid),
                                 "width": dims[0] if dims else None,
                                 "height": dims[1] if dims else None,
                                 "format": rfmt,
                                 "n_bytes": len(blob), "valid": True})
                else:
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
    """Video frame sampling → ARRAY<BINARY> per blob (the D2/D3
    page-explode shape — posexplode downstream). Real MP4 containers get
    n_frames evenly-spaced *samples* via the stbl sample table (for
    MJPEG tracks each element is a complete JPEG file, decodable by the
    built-in codec); other payloads fall back to positional byte slices
    (the FAKE1 fixture behavior). Structure walk only — no pixel
    decode."""
    from ..functions import av

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frames", T.ArrayType(T.BinaryType()), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, frames = [], []
            for mid, blob in zip(b["media_id"], b["blob"]):
                blob = bytes(blob)
                out = None
                if len(blob) >= 12 and blob[4:8] == b"ftyp":
                    try:
                        samples = av.mp4_extract_samples(blob)
                        if samples:
                            if len(samples) <= n_frames:
                                out = samples
                            else:
                                step = len(samples) / n_frames
                                out = [samples[int(i * step)]
                                       for i in range(n_frames)]
                    except ValueError:
                        out = None
                if out is None:
                    body = blob[_HDR_SIZE:]
                    step = max(len(body) // n_frames, 1)
                    out = [body[i * step:(i + 1) * step]
                           for i in range(n_frames)]
                ids.append(int(mid))
                frames.append(out)
            yield pd.DataFrame({"media_id": ids, "frames": frames})

    return media.select("media_id", "blob").mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# D4/D5: EXIF rotation + resize/letterbox arithmetic (pure numpy — the PIL
# dependency is *only* byte decode; all geometry below is codec-free and
# tested on fake-codec arrays).
# ---------------------------------------------------------------------------

def exif_rotation_angle(orientation: int | None) -> int:
    """EXIF orientation tag → anticlockwise rotation degrees
    (``image_utils.py:59-80``: 3→180, 6→270, 8→90, anything else → 0;
    mirrored orientations 2/4/5/7 are deliberately untouched, as in the
    reference)."""
    return {3: 180, 6: 270, 8: 90}.get(orientation or 0, 0)


def apply_exif_rotation_array(arr: np.ndarray,
                              orientation: int | None) -> tuple[np.ndarray, int]:
    """Rotate (h, w[, c]) pixels per the EXIF tag; returns (pixels, angle).
    ``np.rot90(k)`` is anticlockwise like PIL's ``rotate(expand=True)``."""
    angle = exif_rotation_angle(orientation)
    if angle:
        arr = np.rot90(arr, k=angle // 90)
    return arr, angle


def resize_plan(iw: int, ih: int, size, default_square: bool = True,
                max_size: int | None = None) -> tuple[int, int]:
    """Target (width, height) per the reference's size normalization
    (``image_utils.py:125-155``): a (w, h) pair passes through; a single
    number is a square when ``default_square`` else the *shortest-edge*
    target with aspect preserved and the ``max_size`` long-edge overrule
    (all divisions truncate via int(), exactly as the reference)."""
    if hasattr(size, "__len__"):
        if len(size) != 1:
            return int(size[0]), int(size[1])
        size = size[0]
    if default_square:
        return int(size), int(size)
    short = int(size)
    ishort, ilong = (iw, ih) if iw <= ih else (ih, iw)
    if short == ishort:
        return iw, ih  # reference returns the original image untouched
    long = int(short * ilong / ishort)
    if max_size is not None:
        if max_size <= short:
            raise ValueError(
                f"max_size = {max_size} must be strictly greater than the "
                f"requested size for the smaller edge = {short}")
        if long > max_size:
            short, long = int(max_size * short / long), max_size
    return (short, long) if iw <= ih else (long, short)


def letterbox_plan(iw: int, ih: int, w: int, h: int) -> tuple[int, int, int, int]:
    """(new_w, new_h, offset_x, offset_y) for letterboxing iw×ih into w×h
    (``image_utils.py:157-165``: scale = min(w/iw, h/ih), truncating resize,
    centered paste with floor-div offsets)."""
    scale = min(w / iw, h / ih)
    nw, nh = int(iw * scale), int(ih * scale)
    return nw, nh, (w - nw) // 2, (h - nh) // 2


def stretch_resize_array(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor stretch of (ih, iw[, c]) pixels to (h, w[, c]).
    (The reference resamples BICUBIC via PIL — a codec detail; the *plan*
    arithmetic above is what must match. Nearest keeps this path
    dependency-free and deterministic.)"""
    ih, iw = arr.shape[:2]
    ys = (np.arange(h) * ih) // h
    xs = (np.arange(w) * iw) // w
    return arr[ys][:, xs]


def letterbox_array(arr: np.ndarray, w: int, h: int,
                    color: tuple[int, int, int] = (0, 0, 0)) -> np.ndarray:
    """Letterbox (ih, iw, 3) pixels into a w×h canvas of ``color``."""
    ih, iw = arr.shape[:2]
    nw, nh, ox, oy = letterbox_plan(iw, ih, w, h)
    out = np.empty((h, w, 3), dtype=arr.dtype)
    out[:, :] = np.asarray(color, dtype=arr.dtype)
    out[oy:oy + nh, ox:ox + nw] = stretch_resize_array(arr, nw, nh)
    return out


def fake_decode_array(blob: bytes) -> tuple[np.ndarray, int | None]:
    """FAKE1 blob → ((h, w, 3) uint8 pixels, exif_orientation). Deterministic
    from the payload bytes; the low header byte of the payload doubles as a
    fake EXIF orientation in 0..8 so the rotation path is exercised."""
    magic, w, h, _fmt = struct.unpack_from(_FMT, blob)
    if magic != _MAGIC:
        raise ValueError("not a FAKE1 blob")
    payload = np.frombuffer(blob, dtype=np.uint8, offset=_HDR_SIZE)
    if not len(payload):
        raise ValueError("empty FAKE1 payload")
    reps = -(-(w * h * 3) // len(payload))
    pixels = np.tile(payload, reps)[: w * h * 3].reshape(h, w, 3)
    return pixels, int(payload[0] % 9)


THUMBNAIL_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_ix", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("rotation_applied", T.IntegerType(), False),
    T.StructField("pixels", T.BinaryType(), False),  # raw h*w*3 uint8
    T.StructField("error", T.StringType(), True),
])


def thumbnail_images(media: DataFrame, size=(224, 224),
                     letterbox_color: tuple[int, int, int] | None = (128, 128, 128),
                     default_square: bool = True,
                     max_size: int | None = None,
                     decode_fn=fake_decode_array) -> DataFrame:
    """D2+D4+D5 pipeline: decode → EXIF-rotate → resize (stretch or
    letterbox) → fixed-size pixel payloads (the thumbnailer contract,
    ``preproc.py:70-173``). ``decode_fn(blob) -> (pixels, orientation)`` is
    the codec seam — fake codec by default, PIL via :func:`pil_decode_fn`.
    Per-record errors land in the ``error`` column, not exceptions."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, fix, blob in zip(b["media_id"], b["frame_ix"], b["blob"]):
                try:
                    arr, orient = decode_fn(bytes(blob))
                    arr, angle = apply_exif_rotation_array(arr, orient)
                    ih, iw = arr.shape[:2]
                    w, h = resize_plan(iw, ih, size, default_square, max_size)
                    if letterbox_color is not None:
                        out = letterbox_array(arr, w, h, letterbox_color)
                    else:
                        out = stretch_resize_array(arr, w, h)
                    rows.append({"media_id": int(mid), "frame_ix": int(fix),
                                 "width": int(out.shape[1]),
                                 "height": int(out.shape[0]),
                                 "rotation_applied": angle,
                                 "pixels": out.astype(np.uint8).tobytes(),
                                 "error": None})
                except Exception as e:
                    rows.append({"media_id": int(mid), "frame_ix": int(fix),
                                 "width": 0, "height": 0,
                                 "rotation_applied": 0, "pixels": b"",
                                 "error": str(e)})
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in THUMBNAIL_SCHEMA])

    # frame_ix = explicit page/frame order within a media (explode_frames
    # emits one); single-blob relations get 0. Carrying it through is what
    # makes the npz bundle's frame_NNNN naming deterministic.
    if "frame_ix" in media.columns:
        src = media.select("media_id", F.col("frame_ix").cast("int"), "blob")
    else:
        src = media.select("media_id", F.lit(0).alias("frame_ix"), "blob")
    return src.mapInPandas(run, schema=THUMBNAIL_SCHEMA)


def pil_decode_fn(blob: bytes):
    """Real-codec decode seam for :func:`thumbnail_images` — import-gated
    (no codecs in this sandbox); everything downstream of the decode is the
    tested numpy path above."""
    try:
        import PIL.Image
    except ImportError as e:  # pragma: no cover — no codecs in this sandbox
        raise NotImplementedError(
            "pil_decode_fn needs Pillow; this environment ships no image "
            "codecs. Use the fake codec (decode_fn default) or install "
            "Pillow on the cluster."
        ) from e
    import io

    img = PIL.Image.open(io.BytesIO(blob))
    exif = dict((img.getexif() or {}).items())
    orientation = exif.get(274)  # EXIF Orientation tag id
    return np.asarray(img.convert("RGB")), orientation


def pdf_rasterize_fn(blob: bytes, page: int = 0, dpi: int = 300):
    """PDF rasterizer seam — import-gated like :func:`pil_decode_fn`.
    Structure + text extraction are native (functions/pdf.py); *pixel*
    rendering needs a rasterizer. Honors the reference's 300-DPI
    convention (``image_utils.py:560-582``, scalable registry rows
    ``image_utils.py:27-42``); functions/pdf.render_plan computes the
    output pixel geometry either way."""
    try:
        import pypdfium2  # type: ignore
    except ImportError:
        try:
            import pdf2image  # type: ignore
        except ImportError as e:  # pragma: no cover — no renderer here
            raise NotImplementedError(
                "pdf_rasterize_fn needs pypdfium2 or pdf2image; this "
                "environment ships neither. PDF structure/metadata/text "
                "decode natively (functions/pdf.py) — only pixel "
                "rasterization is seamed.") from e
        imgs = pdf2image.convert_from_bytes(
            bytes(blob), dpi=dpi, first_page=page + 1, last_page=page + 1)
        return np.asarray(imgs[0].convert("RGB")), None
    doc = pypdfium2.PdfDocument(bytes(blob))
    bitmap = doc[page].render(scale=dpi / 72.0)
    return np.asarray(bitmap.to_pil().convert("RGB")), None


def auto_decode_fn(blob: bytes):
    """Dispatching codec seam: FAKE1 fixtures → :func:`fake_decode_array`;
    png/bmp/ppm/pgm/tiff/gif → the zero-dependency built-in codecs
    (functions/codecs.py); pdf → :func:`pdf_rasterize_fn` (page 1 at the
    reference's 300 DPI); everything else → PIL when importable. Failures
    raise ValueError, which :func:`thumbnail_images` turns into the
    per-record ``error`` column — one bad blob never fails the stage."""
    from ..functions import codecs

    blob = bytes(blob)
    if blob[:len(_MAGIC)] == _MAGIC:
        return fake_decode_array(blob)
    fmt = codecs.sniff_format(blob)
    if fmt == "pdf":
        try:
            return pdf_rasterize_fn(blob)
        except NotImplementedError as e:
            raise ValueError(str(e)) from e
    if fmt == "mp4":  # still-image view of a video = its first frame
        from ..functions.av import decode_video_frames
        return decode_video_frames(blob, max_frames=1)[0]
    if fmt in ("png", "bmp", "ppm", "pgm", "tiff", "gif"):
        return codecs.builtin_decode_fn(blob)
    if fmt in ("avif", "heif"):
        # entropy-coded HEVC/AV1: system-libheif ctypes backend when
        # present, declared seam ValueError when not
        from ..functions.heif import heif_decode_rgb
        return heif_decode_rgb(blob)
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return codecs.builtin_decode_fn(blob)  # raises the clear ValueError
    return pil_decode_fn(blob)


def multiframe_thumbnails(media: DataFrame, size=(224, 224),
                          letterbox_color=(128, 128, 128),
                          default_square: bool = True,
                          max_size: int | None = None,
                          max_frames: int | None = 64) -> DataFrame:
    """D3 for real containers: walk EVERY frame of each blob (TIFF IFD
    chain, GIF image-descriptor walk via the built-in codecs — the
    reference's PIL ``seek(i)`` loop, image_utils.py:510-558;
    single-frame formats pass through as frame 0)
    then run the D4+D5 rotate/resize kernels per frame. Emits
    THUMBNAIL_SCHEMA rows with the in-container ``frame_ix``, which is what
    keys the npz bundle's ``frame_NNNN`` ordering.

    ``max_frames`` (default 64) bounds the walk — decode_gif_frames holds
    a full canvas copy per decoded frame, so an unbounded walk over a
    long animated GIF could exhaust executor memory inside the Arrow
    stage before the per-record error handler ever fires. Pass ``None``
    for the unbounded walk if the corpus is known-small-frame-count."""
    from ..functions import codecs

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                blob = bytes(blob)
                try:
                    fmt = codecs.sniff_format(blob)
                    if fmt == "tiff":
                        frames = codecs.decode_tiff_frames(
                            blob, max_frames=max_frames)
                    elif fmt == "gif":
                        frames = codecs.decode_gif_frames(
                            blob, max_frames=max_frames)
                    elif fmt == "mp4":
                        # native for Motion-JPEG tracks, libde265 for
                        # hev1/hvc1; other codecs raise into the error
                        # column (decoder seam)
                        from ..functions.av import decode_video_frames
                        frames = decode_video_frames(
                            blob, max_frames=max_frames)
                    else:
                        frames = [auto_decode_fn(blob)]
                    for fix, (arr, orient) in enumerate(frames):
                        arr, angle = apply_exif_rotation_array(arr, orient)
                        ih, iw = arr.shape[:2]
                        w, h = resize_plan(iw, ih, size, default_square,
                                           max_size)
                        if letterbox_color is not None:
                            out = letterbox_array(arr, w, h, letterbox_color)
                        else:
                            out = stretch_resize_array(arr, w, h)
                        rows.append({"media_id": int(mid), "frame_ix": fix,
                                     "width": int(out.shape[1]),
                                     "height": int(out.shape[0]),
                                     "rotation_applied": angle,
                                     "pixels": out.astype(np.uint8).tobytes(),
                                     "error": None})
                except Exception as e:
                    rows.append({"media_id": int(mid), "frame_ix": 0,
                                 "width": 0, "height": 0,
                                 "rotation_applied": 0, "pixels": b"",
                                 "error": str(e)})
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in
                                                  THUMBNAIL_SCHEMA])

    return media.select("media_id", "blob").mapInPandas(
        run, schema=THUMBNAIL_SCHEMA)


def decode_image(media: DataFrame, size: tuple[int, int] = (224, 224)) -> DataFrame:
    """Real image decode + letterbox-resize to ``size`` (the reference's
    thumbnailer, image_utils.py:83-168 / preproc.py:38-42).
    PNG/BMP/PPM/PGM/TIFF/GIF always decode via the built-in pure-numpy
    codecs (functions/codecs.py); JPEG uses PIL when installed
    (libjpeg-turbo speed), else the built-in baseline decoder
    (functions/jpeg.py); only progressive JPEG without PIL lands in the
    per-record ``error`` column."""
    return thumbnail_images(media, size=size, decode_fn=auto_decode_fn)


def blank_thumbnail(size: tuple[int, int] = (224, 224),
                    gray: int = 128) -> bytes:
    """I5 fallback payload: the reference substitutes a plain grey 224×224
    thumbnail (with a warning) when the model needs page images but none
    were provided (``inference.py:424-433``)."""
    w, h = size
    return np.full((h, w, 3), gray, dtype=np.uint8).tobytes()


def fill_missing_thumbnails(thumbs: DataFrame,
                            size: tuple[int, int] = (224, 224),
                            gray: int = 128) -> DataFrame:
    """Replace failed/missing thumbnail rows with the grey fallback, keeping
    the failure reason as a warning column (warn-don't-fail): downstream
    model stages always get a valid fixed-size pixel payload."""
    w, h = size
    return (
        thumbs.withColumn("warning", F.col("error"))
        .withColumn(
            "pixels",
            F.when(F.col("error").isNull(), F.col("pixels"))
            .otherwise(F.lit(blank_thumbnail(size, gray))))
        .withColumn("width",
                    F.when(F.col("error").isNull(), F.col("width"))
                    .otherwise(F.lit(w)))
        .withColumn("height",
                    F.when(F.col("error").isNull(), F.col("height"))
                    .otherwise(F.lit(h)))
        .drop("error")
    )


NPZ_BUNDLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("npz", T.BinaryType(), False),
])


def thumbnail_npz_bundles(thumbs: DataFrame) -> DataFrame:
    """S8 analog: per-media numpy archive of page/frame thumbnails
    (reference ``preproc.py:120-173`` writes pages → PNG bytestrings → npz).
    Input = :func:`thumbnail_images` output (or any (media_id, width,
    height, pixels) relation); one npz BINARY per media_id with arrays
    ``frame_0000..`` in row order. Grouped Arrow stage — one shuffle on
    media_id, bounded frames per media."""
    import io

    def bundle(pdf: pd.DataFrame) -> pd.DataFrame:
        # Sort on the explicit frame index (page order, preproc.py:120-173)
        # — Arrow delivers group rows in arbitrary order, and media_id is
        # constant within the group so sorting on it would be a no-op.
        key = "frame_ix" if "frame_ix" in pdf.columns else "media_id"
        pdf = pdf.sort_values([key]).reset_index(drop=True)
        arrays = {}
        for i, r in pdf.iterrows():
            px = np.frombuffer(r["pixels"], dtype=np.uint8)
            arrays[f"frame_{i:04d}"] = px.reshape(r["height"], r["width"], 3) \
                if px.size else np.zeros((0, 0, 3), dtype=np.uint8)
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        return pd.DataFrame([{
            "media_id": int(pdf["media_id"].iloc[0]),
            "n_frames": len(arrays),
            "npz": buf.getvalue(),
        }])

    return thumbs.filter(F.col("error").isNull()).groupBy("media_id") \
        .applyInPandas(bundle, schema=NPZ_BUNDLE_SCHEMA)


def explode_frames(frames_df: DataFrame) -> DataFrame:
    """ARRAY<BINARY> frames → one row per frame (order-preserving)."""
    return frames_df.select(
        "media_id", F.posexplode("frames").alias("frame_ix", "frame"))


def synth_real_media_df(spark, n: int, seed: int = 42,
                        partitions: int | None = None) -> DataFrame:
    """Distributed deterministic media table carrying REAL container
    bytes (round-robin png / jpeg / bmp / multi-frame tiff / gif /
    lossless webp / lossy-VP8 webp, produced by the built-in encoders) —
    the real-format counterpart of :func:`synth_media_df` for exercising
    the full decode path at corpus scale. Same schema:
    (media_id, kind, blob)."""
    from ..functions import codecs, jpeg, webp

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ])
    kinds = ("png", "jpeg", "bmp", "tiff", "gif", "webp", "webp-vp8")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                rng = np.random.Generator(np.random.PCG64(seed ^ i))
                h, w = 16 + i % 48, 16 + (i * 7) % 48
                kind = kinds[i % len(kinds)]
                if kind == "gif":  # exact palettizer needs ≤256 colors
                    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
                    arr = pal[rng.integers(0, 64, size=(h, w))]
                else:
                    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                if kind == "png":
                    blob = codecs.encode_png(arr, filter_type=i % 5,
                                             orientation=(i % 9) or None)
                elif kind == "jpeg":
                    blob = jpeg.encode_jpeg(
                        arr, quality=85 + i % 13,
                        subsampling="4:2:0" if i % 2 else "4:4:4")
                elif kind == "bmp":
                    blob = codecs.encode_bmp(arr, top_down=bool(i % 2))
                elif kind == "tiff":
                    arr2 = rng.integers(0, 256, size=(h, w, 3),
                                        dtype=np.uint8)
                    blob = codecs.encode_tiff(
                        [arr, arr2], compression=(1, 5, 32773)[i % 3],
                        predictor=2 if i % 3 == 1 else 1)
                elif kind == "gif":
                    blob = codecs.encode_gif([arr], interlace=bool(i % 2))
                elif kind == "webp-vp8":
                    # lossy VP8: header-valid stub — D1 metadata sniffs
                    # real dims; pixel decode is the declared codec seam
                    blob = webp.encode_webp_vp8_stub(w, h, seed=i)
                else:
                    blob = webp.encode_webp_lossless(
                        arr, subtract_green=bool(i % 2),
                        cache_bits=(i % 5) or 0, rle=bool(i % 3))
                rows.append({"media_id": i, "kind": kind, "blob": blob})
            yield pd.DataFrame(rows)

    rng_df = spark.range(0, n, 1, partitions or max(8, spark.sparkContext.defaultParallelism))
    return rng_df.mapInPandas(gen, schema=schema)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("zero_crossing_rate", T.DoubleType(), True),
    T.StructField("spectral_centroid_hz", T.DoubleType(), True),
    T.StructField("error", T.StringType(), True),
])


def audio_features(media: DataFrame) -> DataFrame:
    """Audio decode + feature extraction over WAV payload columns (the
    multimodal audio op: duration, RMS, zero-crossing rate, spectral
    centroid — functions/av.py, vectorized numpy per record inside the
    Arrow batch stage). Non-WAV / mangled blobs land in ``error``."""
    from ..functions import av

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEATURES_SCHEMA]
        for b in batches:
            rows = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                try:
                    f = av.wav_features(bytes(blob))
                    rows.append({"media_id": int(mid), **f, "error": None})
                except Exception as e:
                    rows.append({"media_id": int(mid), "sample_rate": None,
                                 "n_channels": None, "duration_s": None,
                                 "rms": None, "zero_crossing_rate": None,
                                 "spectral_centroid_hz": None,
                                 "error": str(e)})
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "blob").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA)
