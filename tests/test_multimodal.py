from __future__ import annotations

import pytest
from pyspark.sql.utils import PythonException

from logstash_forwarder_spark.datagen import gen_media
from logstash_forwarder_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    frame_sample_plan,
    media_stats,
)


def test_media_schema_and_stats(spark):
    media = gen_media(spark, 300)
    stats = {r.kind: r for r in media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert sum(r.n_media for r in stats.values()) == 300
    assert all(r.bytes_total > 0 for r in stats.values())


def test_decode_fake_plumbing(spark):
    media = gen_media(spark, 100)
    out = decode_media(media, fake=True)
    rows = out.collect()
    assert len(rows) == 100
    for r in rows[:5]:
        assert len(r.features) == FEATURE_DIM
        assert r.n_bytes == 32  # sha2-256 payload
    # deterministic: same input → same features
    again = decode_media(media, fake=True).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_decode_codec_injection(spark):
    """The codec seam: a user-supplied batch decoder (stand-in for a real
    PIL/ffmpeg feature extractor) runs on executors and its output flows
    through the same schema/partition plumbing as the fake path."""
    import numpy as np

    def first_bytes_codec(kinds, payloads):
        return payloads.map(
            lambda p: np.frombuffer(p[: FEATURE_DIM * 4], dtype=np.uint8)[
                :FEATURE_DIM
            ].astype(np.float32)
        )

    media = gen_media(spark, 50)
    rows = decode_media(media, codec=first_bytes_codec).collect()
    assert len(rows) == 50
    payload = {r.media_id: r for r in media.collect()}
    for r in rows[:10]:
        want = list(payload[r.media_id].payload[:FEATURE_DIM])
        assert [int(x) for x in r.features] == want


def test_decode_real_is_stubbed(spark):
    media = gen_media(spark, 10)
    with pytest.raises(Exception) as ei:
        decode_media(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_plan(spark):
    media = gen_media(spark, 200)
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    vids = {r.media_id for r in rows}
    assert vids  # some videos exist
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_no)
    for frames in by_media.values():
        assert frames == sorted(frames)
        assert all(f % 10 == 0 for f in frames)


def test_resize_fake_plumbing(spark):
    from logstash_forwarder_spark.operators.multimodal import resize_media

    media = gen_media(spark, 90)
    out = resize_media(media, 16, 12, fake=True)
    rows = out.collect()
    assert len(rows) == 90
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    # images: exactly w*h payload bytes and the new dimensions
    for r in by_kind["image"]:
        assert len(r.payload) == 16 * 12
        assert (r.width, r.height) == (16, 12)
    # non-images pass through untouched
    src = {r.media_id: r for r in media.collect()}
    for kind in ("audio", "video"):
        for r in by_kind[kind]:
            assert bytes(r.payload) == bytes(src[r.media_id].payload)
    # deterministic
    assert [bytes(r.payload) for r in sorted(rows, key=lambda r: r.media_id)] == [
        bytes(r.payload)
        for r in sorted(resize_media(media, 16, 12, fake=True).collect(), key=lambda r: r.media_id)
    ]


def test_resize_real_is_stubbed(spark):
    from logstash_forwarder_spark.operators.multimodal import resize_media

    media = gen_media(spark, 10)
    with pytest.raises(PythonException, match="NotImplementedError"):
        resize_media(media, 8, 8).collect()


def test_resize_plan_has_no_shuffle(spark):
    from logstash_forwarder_spark.operators.multimodal import resize_media

    media = gen_media(spark, 20)
    plan = resize_media(media, 8, 8, fake=True)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_decode_real_image_and_audio_via_combined_codec(spark):
    """Round 4: ALL THREE real modalities through the seam in one plan —
    BMP images, RIFF/WAVE audio and Y4M video, dispatched per payload by
    media_feature_codec; features must match driver-side decodes."""
    import numpy as np

    from logstash_forwarder_spark.operators.codecs import (
        encode_bmp,
        encode_wav,
        media_feature_codec,
    )

    from logstash_forwarder_spark.operators.codecs import encode_y4m

    rows = []
    for i in range(6):
        if i % 3 == 0:
            img = np.full((2 + i, 3, 3), (i * 37) % 256, np.uint8)
            rows.append((f"m{i}", "image", bytearray(encode_bmp(img))))
        elif i % 3 == 1:
            s = np.arange(-i * 5, i * 5, dtype=np.int16)
            rows.append((f"m{i}", "audio", bytearray(encode_wav(s, 16000))))
        else:
            fr = np.full((1 + i, 2, 4), (i * 29) % 256, np.uint8)
            rows.append((f"m{i}", "video", bytearray(encode_y4m(fr))))
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary"
    )
    got = {
        r.media_id: list(r.features)
        for r in decode_media(media, codec=media_feature_codec).collect()
    }
    import pandas as pd

    for mid, kind, payload in rows:
        want = media_feature_codec(
            pd.Series([kind]), pd.Series([bytes(payload)])
        ).iloc[0]
        assert got[mid] == pytest.approx(list(want)), mid
