"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real at Spark level (schema, batching, partition sizing, UDF signatures);
the codec kernels are STUBS — image/audio libraries are not in this
container. ``decode_fn`` is injectable: pass a real decoder in production;
the default deterministic fake derives features from the payload bytes so
tests exercise the full distributed path end-to-end.

Layout stance for 100 TB of media: payload stays an opaque ``binary``
column co-located with its metadata struct in Parquet (no tiny-file zoo);
``mapInPandas`` streams Arrow batches through Python once, with
``maxRecordsPerBatch`` tuned so a batch of payloads fits executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: bytewise histogram-ish
    features. Replace with PIL/librosa/ffmpeg kernels in production."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] += b
    total = max(sum(acc), 1)
    return [a / total for a in acc]


def real_decode(payload: bytes, kind: str) -> list[float]:  # pragma: no cover
    """The production decode hook. Requires PIL / librosa / av."""
    raise NotImplementedError(
        "media codecs are not available in this environment; inject a "
        "decode_fn into extract_features() in production"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] | None = None,
    dim: int = 8,
) -> DataFrame:
    """Distributed decode/feature-extract via mapInPandas (Arrow batches)."""
    fn = decode_fn or (lambda p, k: _fake_decode(p, k, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int = 32,
    height: int = 32,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Distributed image resize via mapInPandas; same MEDIA_SCHEMA out.

    ``resize_fn(payload, w, h) -> payload`` is the injectable kernel (PIL in
    production). The default deterministic fake maps the payload onto a
    w*h byte grid by index striding, so output size really is w*h and the
    full Spark path (Arrow batch in, binary out, meta rewrite) is exercised.
    Non-image rows pass through untouched.
    """

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        if payload is None:
            return None
        n = w * h
        if len(payload) == 0:
            return bytes(n)
        return bytes(payload[(i * len(payload)) // n] for i in range(n))

    fn = resize_fn or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["meta"]):
                if k == "image":
                    out_payload.append(fn(p, width, height))
                    m = dict(m) if m is not None else {}
                    m["width"], m["height"] = width, height
                    out_meta.append(m)
                else:
                    out_payload.append(p)
                    out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Frame-sampling *plan* for video rows: one output row per planned
    frame timestamp (decode itself is the stubbed kernel above). Pure
    column math — demonstrates the explode-based fan-out shape."""
    frames = F.sequence(
        F.lit(0),
        F.least(
            F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms,
            F.lit(max_frames - 1),
        ).cast("long"),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
        .select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms"))
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes([(i * 37 + j * 11) % 256 for j in range(64 + (i % 5) * 16)])
        meta = (
            (64, 48, None, None, "png")
            if kind == "image"
            else (None, None, 16000, 2_000, "pcm")
            if kind == "audio"
            else (320, 240, None, 5_000, "h264")
        )
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
