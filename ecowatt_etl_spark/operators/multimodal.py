"""Multimodal (image/audio/video) column plumbing.

Design: media travel as opaque ``binary`` columns with a typed metadata
struct alongside — the Spark-native shape for 100 TB multimodal corpora
(bytes stay columnar in Parquet, metadata prunes without touching
payloads). Decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` operators so payload bytes cross the
JVM↔Python boundary once per batch, not per row.

The actual codecs (PIL/opencv/librosa) are NOT in this environment —
``set_codec`` injects one; the default raises NotImplementedError. A
deterministic FakeCodec ships for tests so the Spark-side plumbing
(schemas, batching, partitioning) is real and tested end-to-end.
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
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, media_type string, n_bytes long, feature array<double>"

# codec: payload bytes -> fixed-length feature vector
Codec = Callable[[bytes, str], list[float]]

_codec: Codec | None = None


def set_codec(codec: Codec | None) -> None:
    """Inject a real decoder (e.g. PIL-based). None resets to stub."""
    global _codec
    _codec = codec


class FakeCodec:
    """Deterministic stand-in codec: 8 doubles derived from payload
    bytes. Exercises the full batch path without media libraries."""

    DIM = 8

    def __call__(self, payload: bytes, media_type: str) -> list[float]:
        if payload is None:
            return [0.0] * self.DIM
        return [
            float(sum(payload[i :: self.DIM]) % 997) / 997.0 for i in range(self.DIM)
        ]


def extract_features(media: DataFrame, codec: Codec | None = None) -> DataFrame:
    """Batch feature extraction over a media frame.

    mapInPandas: each Arrow batch is decoded in one Python call; the
    output keeps (media_id, media_type, n_bytes) for joining back.
    Partitioning note: payloads dominate batch size — repartition by
    bytes (spark.sql.files.maxPartitionBytes) not rows when reading
    media parquet at scale.

    The codec is resolved HERE (driver side) and captured in the task
    closure — executors re-import this module, so a worker-side global
    lookup would always see the stub.
    """
    codec = codec if codec is not None else _codec

    def decode(payload: bytes, media_type: str) -> list[float]:
        if codec is None:
            raise NotImplementedError(
                "no media codec installed in this environment; call "
                "set_codec(...) with a PIL/opencv/librosa-backed decoder "
                "(or multimodal.FakeCodec() for deterministic testing)"
            )
        return codec(payload, media_type)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(p, t) for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — reads ONLY the meta struct columns;
    Parquet column pruning means the (huge) payload column is never
    scanned. The query shape to prefer whenever the answer doesn't need
    pixels."""
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.duration_ms").alias("avg_duration_ms"),
    )


def synthesize_media_frame(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/demos (payload bytes
    derived from the id via sha2 — stable across runs/engines)."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("media_type"),
    )
    payload = F.to_binary(
        F.repeat(F.sha2(F.col("media_id").cast("string"), 256), 4), F.lit("hex")
    )
    return base.select(
        "media_id",
        "media_type",
        F.concat(F.col("media_type"), F.lit("/fake")).alias("mime"),
        payload.alias("payload"),
        F.struct(
            F.when(F.col("media_type") == "image", 640).otherwise(None).alias("width"),
            F.when(F.col("media_type") == "image", 480).otherwise(None).alias("height"),
            F.when(F.col("media_type") != "image", (F.col("media_id") * 100 + 1000))
            .otherwise(None)
            .cast("long")
            .alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
