"""Audio/video containers (functions/av.py): WAV decode/encode across
bit depths, analytic feature validation, MP4 box-walk metadata, and the
Spark audio_features / decode_metadata integration."""

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_spark.functions import av, codecs


@pytest.mark.parametrize("bits,tol", [(16, 1e-4), (8, 1.5e-2), (32, 1e-7)])
def test_wav_roundtrip(bits, tol):
    x = np.random.default_rng(bits).uniform(-0.9, 0.9, size=(500, 2))
    y, rate = av.decode_wav(av.encode_wav(x, 22050, bits=bits))
    assert rate == 22050 and y.shape == x.shape
    assert np.abs(y - x).max() < tol


def test_wav_24bit_decode():
    # hand-build a 24-bit PCM data chunk: value 2^22 → 0.5
    import struct
    vals = [1 << 22, -(1 << 22), 0]
    data = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    y, rate = av.decode_wav(blob)
    np.testing.assert_allclose(y[:, 0], [0.5, -0.5, 0.0], atol=1e-9)


def test_wav_features_analytic_tone():
    t = np.arange(16000) / 16000.0
    f = av.wav_features(av.encode_wav(np.sin(2 * np.pi * 440 * t), 16000))
    assert f["n_channels"] == 1 and abs(f["duration_s"] - 1.0) < 1e-9
    assert abs(f["rms"] - 1 / np.sqrt(2)) < 1e-3
    assert abs(f["spectral_centroid_hz"] - 440) < 15
    assert abs(f["zero_crossing_rate"] - 2 * 440 / 16000) < 1e-3


def test_wav_errors():
    with pytest.raises(ValueError, match="RIFF"):
        av.decode_wav(b"nope")
    with pytest.raises(ValueError, match="fmt/data"):
        av.decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_mp4_meta_and_sniff():
    blob = av.encode_mp4_stub(12.5, 640, 360)
    m = av.sniff_mp4_meta(blob)
    assert m["duration_s"] == 12.5
    assert (m["width"], m["height"]) == (640, 360)
    assert codecs.sniff_format(blob) == "mp4"
    assert codecs.sniff_dimensions(blob) == (640, 360)
    with pytest.raises(ValueError, match="ftyp"):
        av.sniff_mp4_meta(b"\x00\x00\x00\x08free")
    # RIFF disambiguation: wav vs webp vs bmp
    wav = av.encode_wav(np.zeros(8), 8000)
    assert codecs.sniff_format(wav) == "wav"
    assert codecs.sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"


def test_audio_features_spark(spark):
    from amazon_textract_transformer_pipeline_spark.operators.multimodal import (
        audio_features,
        decode_metadata,
    )

    t = np.arange(8000) / 8000.0
    rows = [
        (0, bytearray(av.encode_wav(np.sin(2 * np.pi * 200 * t), 8000))),
        (1, bytearray(av.encode_wav(
            np.stack([np.sin(2 * np.pi * 100 * t)] * 2, 1), 8000, bits=32))),
        (2, bytearray(b"RIFF\x04\x00\x00\x00WAVE")),  # no fmt/data → error
        (3, bytearray(av.encode_mp4_stub(3.0, 320, 240))),  # video → error
    ]
    media = spark.createDataFrame(rows, "media_id: long, blob: binary")
    got = {r.media_id: r for r in audio_features(media).collect()}
    assert got[0].error is None and abs(got[0].spectral_centroid_hz - 200) < 10
    assert got[1].error is None and got[1].n_channels == 2
    assert got[2].error is not None and got[3].error is not None

    # D1 metadata sees both audio (no dims) and video (tkhd dims)
    meta = {r.media_id: r for r in decode_metadata(media).collect()}
    assert meta[0].valid and meta[0].format == "wav" and meta[0].width is None
    assert meta[3].valid and meta[3].format == "mp4"
    assert (meta[3].width, meta[3].height) == (320, 240)
    # truncated RIFF still *sniffs* as wav — D1 is header inference, the
    # decode failure surfaces in audio_features.error above, not here
    assert meta[2].valid and meta[2].format == "wav"


def test_decode_metadata_sniffed_format_without_dims(spark):
    """Review fix: any sniffed format is the D1 answer even without
    header dimensions (webp; mp4 lacking a video tkhd)."""
    from amazon_textract_transformer_pipeline_spark.operators.multimodal import (
        decode_metadata,
    )

    import struct
    mp4_no_trak = (struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
                   + struct.pack(">I", 8) + b"moov")
    rows = [(0, bytearray(b"RIFF\x00\x00\x00\x00WEBPVP8 data")),
            (1, bytearray(mp4_no_trak))]
    media = spark.createDataFrame(rows, "media_id: long, blob: binary")
    meta = {r.media_id: r for r in decode_metadata(media).collect()}
    assert meta[0].valid and meta[0].format == "webp" and meta[0].width is None
    assert meta[1].valid and meta[1].format == "mp4" and meta[1].width is None


def _mjpeg_fixture(n_frames=3, shape=(24, 32)):
    import numpy as np

    from amazon_textract_transformer_pipeline_spark.functions import av, jpeg

    rng = np.random.Generator(np.random.PCG64(5))
    h, w = shape
    frames = []
    for _ in range(n_frames):
        img = np.clip(
            np.linspace(0, 255, h * w * 3).reshape(h, w, 3)
            + rng.normal(0, 20, (h, w, 3)), 0, 255).astype(np.uint8)
        frames.append(jpeg.encode_jpeg(img, quality=85))
    return frames, av.encode_mjpeg_mp4(frames, fps=5)


def test_mjpeg_mp4_samples_byte_identical():
    import numpy as np

    from amazon_textract_transformer_pipeline_spark.functions import av, jpeg

    frames, blob = _mjpeg_fixture(4)
    assert av.mp4_extract_samples(blob) == frames  # verbatim sample bytes
    dec = av.decode_mjpeg_frames(blob)
    assert len(dec) == 4
    for f, (arr, orient) in zip(frames, dec):
        assert np.array_equal(arr, jpeg.decode_jpeg(f)[0])
        assert orient is None
    # max_frames caps the decode
    assert len(av.decode_mjpeg_frames(blob, max_frames=2)) == 2
    # metadata sniff agrees with the writer
    m = av.sniff_mp4_meta(blob)
    assert (m["width"], m["height"]) == (32, 24)
    t = av.mp4_sample_tables(blob)[0]
    assert t["format"] == "jpeg" and len(t["samples"]) == 4


def test_mjpeg_mp4_count_frames_and_nonmjpeg_seam():
    import pytest

    from amazon_textract_transformer_pipeline_spark.functions import av, codecs

    frames, blob = _mjpeg_fixture(3)
    assert codecs.sniff_format(blob) == "mp4"
    assert codecs.count_frames(blob) == 3
    # metadata-only stub (no samples): count falls back to 1
    stub = av.encode_mp4_stub(2.0, 64, 48)
    assert codecs.count_frames(stub) == 1
    # a non-MJPEG codec id goes to the external decoder seam
    fake_avc = blob.replace(b"jpeg", b"avc1", 1)  # stsd entry format
    with pytest.raises(ValueError, match="external decoder"):
        av.decode_mjpeg_frames(fake_avc)


def test_mjpeg_mp4_through_multiframe_thumbnails(spark):
    from amazon_textract_transformer_pipeline_spark.operators.multimodal import (
        multiframe_thumbnails,
    )

    _, blob = _mjpeg_fixture(3)
    media = spark.createDataFrame([(0, bytearray(blob))],
                                  "media_id long, blob binary")
    rows = multiframe_thumbnails(media, size=(16, 16)).collect()
    assert [r.frame_ix for r in rows] == [0, 1, 2]
    assert all(r.error is None and r.width == 16 for r in rows)


def test_frame_sample_real_mp4(spark):
    """frame_sample over a real MJPEG MP4: evenly-spaced verbatim JPEG
    samples, each decodable; non-MP4 payloads keep the slice fallback."""
    import numpy as np

    from amazon_textract_transformer_pipeline_spark.functions import jpeg
    from amazon_textract_transformer_pipeline_spark.operators.multimodal import (
        frame_sample,
        make_fake_blob,
    )

    frames, blob = _mjpeg_fixture(6)
    media = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(make_fake_blob(32, 32, 4, 9)))],
        "media_id long, blob binary")
    got = {r.media_id: r.frames for r in
           frame_sample(media, n_frames=3).collect()}
    assert len(got[0]) == 3
    assert [bytes(f) for f in got[0]] == [frames[0], frames[2], frames[4]]
    arr, _ = jpeg.decode_jpeg(bytes(got[0][1]))
    assert arr.shape[2] == 3
    assert len(got[1]) == 3  # fake container: positional slices
