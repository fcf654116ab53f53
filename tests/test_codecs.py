"""Real raster decode through the multimodal codec seam — no fake=True.

The pure-numpy BMP/PPM codecs (operators/codecs.py) are checked byte-exact
against hand-built fixtures, then plugged into `decode_media` /
`resize_media` so genuine image bytes flow the whole distributed path.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from logstash_forwarder_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_pnm,
    encode_bmp,
    encode_ppm,
    image_feature_codec,
    image_resize_codec,
    nearest_resize,
)

RED, GREEN, BLUE, WHITE = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)


def _bmp_2x2() -> bytes:
    """Hand-assembled (not via encode_bmp) 2×2 24bpp BMP, bottom-up:
    image = [[RED, GREEN], [BLUE, WHITE]]; rows stored bottom-first in BGR
    with 2 pad bytes each (row stride 8)."""
    pix = bytes(
        [255, 0, 0, 255, 255, 255, 0, 0]  # bottom row: BLUE, WHITE (BGR) + pad
        + [0, 0, 255, 0, 255, 0, 0, 0]  # top row: RED, GREEN (BGR) + pad
    )
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def test_decode_bmp_byte_exact():
    img = decode_bmp(_bmp_2x2())
    assert img.shape == (2, 2, 3)
    assert [tuple(p) for p in img.reshape(-1, 3)] == [RED, GREEN, BLUE, WHITE]


def test_decode_bmp_top_down():
    # negative height = top-down storage: same stored rows now mean the
    # first stored row IS the top image row
    data = bytearray(_bmp_2x2())
    struct.pack_into("<i", data, 22, -2)
    img = decode_bmp(bytes(data))
    assert [tuple(p) for p in img.reshape(-1, 3)] == [BLUE, WHITE, RED, GREEN]


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (5, 4), (8, 3)])
def test_bmp_roundtrip_odd_widths(w, h):
    # odd widths exercise the 4-byte row padding
    rng = np.random.default_rng(7 * w + h)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_decode_bmp_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG" + b"\x00" * 60)
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(_bmp_2x2()[:-4])


def test_decode_ppm_with_comments():
    raw = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9, 8, 8, 8, 7, 7, 7])
    data = b"P6\n# a comment\n3 2\n255\n" + raw
    img = decode_pnm(data)
    assert img.shape == (2, 3, 3)
    assert np.array_equal(img.reshape(-1), np.frombuffer(raw, np.uint8))


def test_pgm_roundtrip_and_truncation():
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (4, 5), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_ppm(gray)), gray)
    with pytest.raises(ValueError, match="truncated"):
        decode_pnm(encode_ppm(gray)[:-2])


def test_ppm_roundtrip_rgb():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (3, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)


def test_nearest_resize_exact():
    img = np.array([[[1, 1, 1], [2, 2, 2]], [[3, 3, 3], [4, 4, 4]]], np.uint8)
    up = nearest_resize(img, 4, 4)
    assert np.array_equal(up[:2, :2], np.full((2, 2, 3), 1))
    assert np.array_equal(up[2:, 2:], np.full((2, 2, 3), 4))
    down = nearest_resize(up, 2, 2)
    assert np.array_equal(down, img)


def _media_df(spark, n=24):
    """Media rows whose payloads are REAL encoded images: even ids BMP,
    odd ids PPM, plus two non-image passthrough rows."""
    from logstash_forwarder_spark.schema import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        rng = np.random.default_rng(100 + i)
        w, h = int(rng.integers(2, 9)), int(rng.integers(2, 7))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        payload = encode_bmp(img) if i % 2 == 0 else encode_ppm(img)
        rows.append((f"m-{i:04d}", "image", bytearray(payload), (w, h, None, None, "bmp" if i % 2 == 0 else "ppm")))
    rows.append(("m-aud", "audio", bytearray(b"\x01\x02\x03"), (None, None, 16000, None, "pcm")))
    rows.append(("m-vid", "video", bytearray(b"\x04\x05"), (None, None, None, 30, "raw")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA), rows


def _expected_img(i):
    rng = np.random.default_rng(100 + i)
    w, h = int(rng.integers(2, 9)), int(rng.integers(2, 7))
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_decode_media_real_codec_end_to_end(spark):
    from logstash_forwarder_spark.operators.multimodal import decode_media

    df, rows = _media_df(spark)
    # only image rows: the feature codec is an image decoder
    out = decode_media(df.filter("kind = 'image'"), codec=image_feature_codec)
    got = {r.media_id: r for r in out.collect()}
    assert len(got) == 24
    for i in range(24):
        img = _expected_img(i)
        r = got[f"m-{i:04d}"]
        f = np.asarray(r.features, np.float64)
        assert (int(f[0]), int(f[1])) == (img.shape[1], img.shape[0])
        assert f[2] == pytest.approx(img[:, :, 0].mean() / 255.0, abs=1e-6)
        assert f[7] == pytest.approx(img.max() / 255.0, abs=1e-6)
        assert r.n_bytes == len(bytes(rows[i][2]))


def test_resize_media_real_codec_end_to_end(spark):
    from logstash_forwarder_spark.operators.multimodal import resize_media

    df, rows = _media_df(spark)
    out = resize_media(df, 4, 3, codec=image_resize_codec)
    got = {r.media_id: r for r in out.collect()}
    for i in range(24):
        r = got[f"m-{i:04d}"]
        assert (r.width, r.height) == (4, 3)
        dec = decode_image(bytes(r.payload))
        # resized payload re-encodes in the SAME container it arrived in
        assert bytes(r.payload)[:2] == (b"BM" if i % 2 == 0 else b"P6")
        assert np.array_equal(dec, nearest_resize(_expected_img(i), 4, 3))
    # non-image rows pass through untouched
    assert bytes(got["m-aud"].payload) == b"\x01\x02\x03"
    assert bytes(got["m-vid"].payload) == b"\x04\x05"


# ---- hypothesis property sweep (pure functions; no Spark session) -------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
        fmt=st.sampled_from(["bmp", "ppm", "pgm"]),
    )
    def test_property_roundtrip(w, h, seed, fmt):
        rng = np.random.default_rng(seed)
        if fmt == "pgm":
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            data = encode_ppm(img)
        else:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            data = encode_bmp(img) if fmt == "bmp" else encode_ppm(img)
        assert np.array_equal(decode_image(data), img)

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 12),
        tw=st.integers(1, 20),
        th=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_property_resize(w, h, tw, th, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = nearest_resize(img, tw, th)
        assert out.shape == (th, tw, 3)
        # every output pixel is a source pixel; same-size resize is identity
        assert set(map(tuple, out.reshape(-1, 3))) <= set(
            map(tuple, img.reshape(-1, 3))
        )
        assert np.array_equal(nearest_resize(img, w, h), img)

except ImportError:  # pragma: no cover - hypothesis is in this image
    pass


# ---- WAV / PCM (round 4: real audio modality) ---------------------------


def test_wav_roundtrip_mono_and_stereo():
    from logstash_forwarder_spark.operators.codecs import decode_wav, encode_wav

    mono = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    s, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(s, mono)

    stereo = np.array([[1, -2], [3, -4], [32767, -32768]], dtype=np.int16)
    s2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and s2.shape == (3, 2) and np.array_equal(s2, stereo)


def test_wav_chunk_walk_with_extra_chunks():
    """Decoder must walk the chunk list, not assume the canonical 44-byte
    layout: a LIST chunk (odd-sized, exercising even-offset padding)
    between fmt and data must be skipped."""
    import struct as _struct

    from logstash_forwarder_spark.operators.codecs import decode_wav, encode_wav

    canonical = encode_wav(np.array([7, -8, 9], dtype=np.int16), 16000)
    fmt_chunk = canonical[12:36]
    data_chunk = canonical[36:]
    extra = b"LIST" + _struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    body = b"WAVE" + fmt_chunk + extra + data_chunk
    wav = b"RIFF" + _struct.pack("<I", len(body)) + body
    s, rate = decode_wav(wav)
    assert rate == 16000 and list(s) == [7, -8, 9]


def test_audio_feature_codec_features():
    import pandas as pd

    from logstash_forwarder_spark.operators.codecs import (
        audio_feature_codec,
        encode_wav,
    )

    samples = np.array([16384, -16384, 16384, -16384], dtype=np.int16)
    f = audio_feature_codec(
        pd.Series(["audio"]), pd.Series([encode_wav(samples, 8000)])
    ).iloc[0]
    assert f[0] == 4 and f[1] == 8.0  # n_samples, kHz
    assert abs(f[3] - 0.5) < 1e-6  # rms of +/-2^14 is 2^14/2^15
    assert f[6] == 0.75  # 3 sign changes / 4 samples
    assert f[7] == 0.5  # 4 samples at 8 kHz = 0.5 ms


def test_media_feature_codec_dispatch():
    import pandas as pd

    from logstash_forwarder_spark.operators.codecs import (
        encode_bmp,
        encode_wav,
        media_feature_codec,
    )

    img = np.full((2, 3, 3), 10, np.uint8)
    wav = encode_wav(np.array([100, -100], dtype=np.int16), 16000)
    out = media_feature_codec(
        pd.Series(["image", "audio"]), pd.Series([encode_bmp(img), wav])
    )
    assert out.iloc[0][0] == 3 and out.iloc[0][1] == 2  # image w, h
    assert out.iloc[1][0] == 2 and out.iloc[1][1] == 16.0  # n_samples, kHz


try:
    from hypothesis import given as _given, settings as _settings
    from hypothesis import strategies as _st

    @_settings(max_examples=60, deadline=None)
    @_given(
        n=_st.integers(0, 200),
        ch=_st.integers(1, 4),
        rate=_st.sampled_from([8000, 16000, 22050, 44100]),
        seed=_st.integers(0, 2**31 - 1),
    )
    def test_property_wav_roundtrip(n, ch, rate, seed):
        from logstash_forwarder_spark.operators.codecs import (
            decode_wav,
            encode_wav,
        )

        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
        if ch == 1:
            s = s.reshape(-1)
        dec, r = decode_wav(encode_wav(s, rate))
        assert r == rate
        assert np.array_equal(dec, s)

except ImportError:  # pragma: no cover
    pass


# ---- Y4M / YUV4MPEG2 (round 4: real video modality) ---------------------


def test_y4m_roundtrip_and_header():
    from logstash_forwarder_spark.operators.codecs import decode_y4m, encode_y4m

    frames = np.arange(2 * 4 * 6, dtype=np.uint8).reshape(2, 4, 6)
    data = encode_y4m(frames, fps=(30, 1))
    assert data.startswith(b"YUV4MPEG2 W6 H4 F30:1 ")
    dec, fps = decode_y4m(data)
    assert fps == (30, 1) and np.array_equal(dec, frames)


def test_y4m_tag_order_and_mono():
    """Spec: parameter tags come in any order, unknown tags are ignored;
    Cmono streams carry no chroma planes."""
    from logstash_forwarder_spark.operators.codecs import decode_y4m

    luma = bytes(range(8))  # 4x2
    data = b"YUV4MPEG2 F25:1 H2 XSOMETAG W4 Cmono\n" + b"FRAME\n" + luma
    dec, fps = decode_y4m(data)
    assert dec.shape == (1, 2, 4) and list(dec.ravel()) == list(luma)


def test_y4m_truncated_frame_raises():
    import pytest as _pytest

    from logstash_forwarder_spark.operators.codecs import decode_y4m, encode_y4m

    frames = np.zeros((1, 2, 2), np.uint8)
    data = encode_y4m(frames)[:-1]
    with _pytest.raises(ValueError, match="truncated"):
        decode_y4m(data)


def test_video_frame_features_sampling():
    from logstash_forwarder_spark.operators.codecs import (
        encode_y4m,
        video_frame_features,
    )

    frames = np.stack([np.full((2, 2), v, np.uint8) for v in (10, 200, 30, 40, 50)])
    feats = video_frame_features(encode_y4m(frames), every_n=2)
    assert [int(r[0]) for r in feats] == [0, 2, 4]
    assert [r[1] for r in feats] == [10.0, 30.0, 50.0]
    assert feats[0][4] == 0.0  # constant frame: no 128-crossings


try:
    from hypothesis import given as _g2, settings as _s2
    from hypothesis import strategies as _st2

    @_s2(max_examples=50, deadline=None)
    @_g2(
        n=_st2.integers(0, 6),
        w2=_st2.integers(1, 8),
        h2=_st2.integers(1, 6),
        seed=_st2.integers(0, 2**31 - 1),
    )
    def test_property_y4m_roundtrip(n, w2, h2, seed):
        from logstash_forwarder_spark.operators.codecs import (
            decode_y4m,
            encode_y4m,
        )

        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, (n, 2 * h2, 2 * w2), dtype=np.uint8)
        dec, fps = decode_y4m(encode_y4m(frames))
        assert fps == (25, 1)
        assert dec.shape == frames.shape and np.array_equal(dec, frames)

except ImportError:  # pragma: no cover
    pass


def test_wav_truncated_data_chunk_raises():
    import struct as _struct

    import pytest as _pytest

    from logstash_forwarder_spark.operators.codecs import decode_wav, encode_wav

    wav = encode_wav(np.array([1, 2, 3, 4], dtype=np.int16), 8000)
    with _pytest.raises(ValueError, match="truncated WAV data"):
        decode_wav(wav[:-3])  # data chunk size lies vs payload


def test_y4m_zero_fps_denominator_raises():
    import pytest as _pytest

    from logstash_forwarder_spark.operators.codecs import decode_y4m

    data = b"YUV4MPEG2 W4 H2 F25:0 Cmono\n" + b"FRAME\n" + bytes(8)
    with _pytest.raises(ValueError, match="bad Y4M frame rate"):
        decode_y4m(data)
