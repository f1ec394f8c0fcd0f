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

# Injected-codec state lives in a dict, not a bare module scalar: the
# evidence ledger fingerprints simple module constants reached by a
# query closure, and a scalar that changes at runtime (None -> codec
# object after set_codec) would make the multimodal queries'
# fingerprints depend on WHEN they were computed (the proto_vendor
# lesson from the r10 mid-suite window flake).
_INJECTED: dict = {"codec": None}


def set_codec(codec: Codec | None) -> None:
    """Inject a real decoder (e.g. PIL-based). None resets to stub."""
    _INJECTED["codec"] = codec


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
    codec = codec if codec is not None else _INJECTED["codec"]

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


# payload-transform codec: (payload, w, h) -> resized payload bytes
Resizer = Callable[[bytes, int, int], bytes]
# frame sampler: (payload, ts_ms) -> frame payload bytes
FrameGrabber = Callable[[bytes, int], bytes]


class FakeResizer:
    """Deterministic stand-in for an image resize codec: emits a
    payload whose length scales with the target pixel count (slice or
    tile of the source bytes) — enough to test batching, schema and
    metadata propagation without PIL."""

    def __call__(self, payload: bytes, w: int, h: int) -> bytes:
        if payload is None:
            return b""
        target = max(1, (w * h) // 4096)
        reps = (target // max(1, len(payload))) + 1
        return (payload * reps)[:target]


class FakeFrameGrabber:
    """Deterministic frame extractor: an 8-byte slice selected by the
    timestamp — stable across runs, no video codec needed."""

    def __call__(self, payload: bytes, ts_ms: int) -> bytes:
        if not payload:
            return b""
        start = ts_ms % max(1, len(payload) - 8)
        return payload[start : start + 8]


def resize_images(
    media: DataFrame, width: int, height: int, resizer: Resizer | None = None
) -> DataFrame:
    """Resize the image rows to (width, height), passing other media
    types through untouched. Same MEDIA_SCHEMA out as in — resize is a
    payload+meta rewrite, so downstream operators compose unchanged.
    Arrow-batched; the resizer is captured in the closure (injected,
    NotImplementedError without one — no real codec ships here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            for i in pdf.index[pdf["media_type"] == "image"]:
                if resizer is None:
                    raise NotImplementedError(
                        "no image resize codec installed; inject one "
                        "(or FakeResizer() for deterministic testing)"
                    )
                new_payload = resizer(pdf.at[i, "payload"], width, height)
                out.at[i, "payload"] = new_payload
                meta = dict(pdf.at[i, "meta"])
                meta.update(width=width, height=height, n_bytes=len(new_payload))
                out.at[i, "meta"] = meta
            yield out

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx long, ts_ms long, frame binary"


def sample_frames(
    media: DataFrame, every_ms: int, grabber: FrameGrabber | None = None
) -> DataFrame:
    """One row per sampled video frame (every ``every_ms`` over the
    clip's duration) — the one-to-many batch shape: a mapInPandas that
    EXPANDS rows, which no per-row UDF can do. Output rows carry
    (media_id, frame_idx, ts_ms, frame bytes) for downstream per-frame
    feature extraction. At scale, repartition videos by bytes before
    sampling so one long clip doesn't serialize a whole task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            vids = pdf[pdf["media_type"] == "video"]
            for _, r in vids.iterrows():
                if grabber is None:
                    raise NotImplementedError(
                        "no video frame codec installed; inject one "
                        "(or FakeFrameGrabber() for deterministic testing)"
                    )
                duration = int(r["meta"]["duration_ms"] or 0)
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(idx)
                    rows["ts_ms"].append(ts)
                    rows["frame"].append(grabber(r["payload"], ts))
            # explicit dtypes so batches with no videos concat cleanly
            # (all-object empty frames trip pandas' concat deprecation)
            yield pd.DataFrame(rows).astype(
                {"media_id": "int64", "frame_idx": "int64", "ts_ms": "int64"}
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
