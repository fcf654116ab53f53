"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed ``meta``
struct (schema.MEDIA_SCHEMA). The Spark-side plumbing — schema, Arrow batch
shape, ``mapInPandas`` partitioning — is real and tested. Codec work flows
through an injection seam: with no codec and ``fake=False``,
``decode_media``/``resize_media`` raise NotImplementedError (no PIL/ffmpeg
in this container); ``fake=True`` substitutes a deterministic byte-derived
stand-in. REAL raster formats are covered dependency-free:
``operators.codecs.image_feature_codec`` / ``image_resize_codec`` decode
and re-encode genuine BMP (24bpp) and PPM/PGM bytes with pure numpy
(byte-exact fixtures in tests/test_codecs.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

DECODED_SCHEMA = (
    "media_id string, kind string, n_bytes long, features array<float>"
)


def _fake_features(payloads: pd.Series) -> pd.Series:
    """Deterministic fake 'decode': FEATURE_DIM floats from payload bytes.
    Stands in for image-resize / audio-spectrogram / frame-sample output."""
    feats = []
    for p in payloads:
        b = np.frombuffer(p, dtype=np.uint8) if p is not None else np.zeros(1, np.uint8)
        reps = -(-FEATURE_DIM * 4 // len(b))
        arr = np.tile(b, reps)[: FEATURE_DIM * 4].reshape(FEATURE_DIM, 4)
        feats.append((arr.sum(axis=1) / 255.0).astype(np.float32))
    return pd.Series(feats)


def _real_decode(kind: str):
    raise NotImplementedError(
        f"media decode for kind={kind!r} needs PIL/torchaudio/ffmpeg — "
        "not available in this container; pass codec=... (a batch decoder) "
        "or fake=True for plumbing tests"
    )


def decode_media(df: DataFrame, *, codec=None, fake: bool = False) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas (Arrow batches).

    ``codec`` is the injection seam for a real decoder: a callable
    ``(kinds: pd.Series[str], payloads: pd.Series[bytes]) ->
    pd.Series[array-like float32[FEATURE_DIM]]`` evaluated per Arrow batch
    on executors (shipped by closure, so it may hold a lazily-initialized
    PIL/ffmpeg handle). ``fake=True`` substitutes a deterministic
    byte-derived feature vector so the distributed plumbing — schema,
    batch shape, partition preservation — is exercised without media libs.
    With neither, raises NotImplementedError (this container has no codecs).

    Batch shape: the iterator yields whole Arrow batches; per-batch work is
    vectorized. Partitioning is preserved — no shuffle.
    """
    if codec is None and fake:
        codec = lambda kinds, payloads: _fake_features(payloads)  # noqa: E731

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is None:
                _real_decode(pdf["kind"].iloc[0] if len(pdf) else "?")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": codec(pdf["kind"], pdf["payload"]),
                }
            )

    return df.mapInPandas(op, schema=DECODED_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation over media (no decode needed):
    per-kind counts, byte totals, max dimensions."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.length("payload")).cast("long").alias("bytes_total"),
        F.max("meta.width").alias("max_width"),
        F.max("meta.n_frames").alias("max_frames"),
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Expand a video row into (media_id, frame_no) sample plan rows —
    pure relational expansion; the decode of each frame is the stubbed part."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_no"),
    )


RESIZED_SCHEMA = "media_id string, kind string, width int, height int, payload binary"


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    *,
    codec=None,
    fake: bool = False,
) -> DataFrame:
    """Resize image payloads to (target_w, target_h) via mapInPandas.

    Same codec-injection seam as ``decode_media``: ``codec`` is a callable
    ``(payloads: pd.Series[bytes], w: int, h: int) -> pd.Series[bytes]``
    (a real PIL/opencv batch resizer drops in); ``fake=True`` substitutes a
    deterministic byte-resample — nearest-neighbor index into the source
    bytes, w*h output bytes — so schema, Arrow batch shape and partition
    preservation are exercised without media libs. Non-image rows pass
    through with payload untouched. Row-local; zero shuffle.
    """
    if codec is None and fake:

        def codec(payloads: pd.Series, w: int, h: int) -> pd.Series:
            out = []
            n = w * h
            for p in payloads:
                b = (
                    np.frombuffer(p, dtype=np.uint8)
                    if p
                    else np.zeros(1, np.uint8)
                )
                idx = (np.arange(n) * len(b)) // n
                out.append(b[idx].tobytes())
            return pd.Series(out)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec is None:
                _real_decode(pdf["kind"].iloc[0] if len(pdf) else "?")
            is_img = pdf["kind"] == "image"
            payload = pdf["payload"].copy()
            if is_img.any():
                # positional assignment: the codec returns a fresh-indexed
                # Series, so .loc would align by label and write NaN
                payload.loc[is_img] = codec(
                    payload.loc[is_img], target_w, target_h
                ).to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": np.where(is_img, target_w, pdf["meta"].map(lambda m: m["width"] if m else None)),
                    "height": np.where(is_img, target_h, pdf["meta"].map(lambda m: m["height"] if m else None)),
                    "payload": payload,
                }
            )

    return df.mapInPandas(op, schema=RESIZED_SCHEMA)
