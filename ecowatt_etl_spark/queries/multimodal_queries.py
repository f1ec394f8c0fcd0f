"""Multimodal queries — the media-column pipeline surface.

The driver testdata has no media table, so these run on the
deterministic synthesized media frame (operators/multimodal.py:
payload bytes derived from sha2(media_id) — identical every run).
No DuckDB oracle (the table is not one of the pre-registered parquet
views) → rows-only driver check; determinism and values are asserted
in tests/test_streaming.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecowatt_etl_spark.operators.multimodal import (
    FakeCodec,
    extract_features,
    media_stats,
    synthesize_media_frame,
)
from ecowatt_etl_spark.queries.registry import query

_N_MEDIA = 256


@query("q80_media_stats")
def q80_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media aggregation: per-type counts, byte totals,
    dimensions/durations. Reads ONLY the meta struct — at scale the
    (huge) binary payload column is pruned out of the parquet scan
    entirely, which is the query shape to prefer whenever the answer
    doesn't need pixels."""
    media = synthesize_media_frame(spark, _N_MEDIA)
    return media_stats(media).orderBy("media_type")


@query("q81_media_features")
def q81_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas), then
    aggregate per media type. The codec here is the deterministic
    FakeCodec (no media libs in this environment); swapping in a
    PIL/librosa codec changes one injection point, none of the Spark
    plumbing. Feature vectors are summarized as per-dimension-0 stats
    so the result is a small stable frame."""
    media = synthesize_media_frame(spark, _N_MEDIA)
    feats = extract_features(media, codec=FakeCodec())
    return (
        feats.select(
            "media_type",
            "n_bytes",
            F.element_at("feature", 1).alias("f0"),
            F.aggregate("feature", F.lit(0.0), lambda a, x: a + x).alias("f_sum"),
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("f0"), 9).alias("avg_f0"),
            F.round(F.avg("f_sum"), 9).alias("avg_f_sum"),
        )
        .orderBy("media_type")
    )


@query("q82_media_resize")
def q82_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: image payload+meta rewrite through an
    Arrow-batched transform that preserves MEDIA_SCHEMA (so resize
    composes with any downstream media operator), verified here by
    re-aggregating the resized frame's metadata. Deterministic
    FakeResizer stands in for PIL."""
    from ecowatt_etl_spark.operators.multimodal import FakeResizer, resize_images

    media = synthesize_media_frame(spark, _N_MEDIA)
    resized = resize_images(media, 224, 224, resizer=FakeResizer())
    return media_stats(resized).orderBy("media_type")


@query("q83_frame_sample")
def q83_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one output row per second of each clip —
    the row-EXPANDING mapInPandas shape (per-row UDFs can't change
    cardinality). Per-clip frame counts and payload checks are
    asserted in tests; here frames roll up per media_id."""
    from ecowatt_etl_spark.operators.multimodal import (
        FakeFrameGrabber,
        sample_frames,
    )

    media = synthesize_media_frame(spark, _N_MEDIA)
    frames = sample_frames(media, every_ms=1000, grabber=FakeFrameGrabber())
    return (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.max("ts_ms").alias("last_ts_ms"),
            F.sum(F.length("frame")).alias("frame_bytes"),
        )
        .orderBy("media_id")
    )
