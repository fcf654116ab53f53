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
