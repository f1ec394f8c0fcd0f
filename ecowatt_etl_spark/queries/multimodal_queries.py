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

# The synthesized media frame is pure arithmetic over media_id
# (operators/multimodal.py:synthesize_media_frame): type = id%3 cycling
# image/audio/video; payload is always 128 bytes (4× a 64-hex sha256);
# image dims 640×480; non-image duration = id*100+1000. That makes the
# metadata aggregates exactly reproducible in SQL from generate_series —
# upgrading these from rows-only to exact-oracle checks.
_MEDIA_CTE = f"""
    WITH m AS (
      SELECT g AS media_id,
             CASE g % 3 WHEN 0 THEN 'image'
                        WHEN 1 THEN 'audio'
                        ELSE 'video' END AS media_type
      FROM generate_series(0, {_N_MEDIA - 1}) t(g)
    )
"""


@query(
    "q80_media_stats",
    oracle=_MEDIA_CTE
    + """
    SELECT media_type, COUNT(*) AS n_items,
           COUNT(*) * 128 AS total_bytes,
           AVG(CASE WHEN media_type = 'image' THEN 640 END) AS avg_width,
           AVG(CASE WHEN media_type <> 'image' THEN media_id * 100 + 1000 END)
             AS avg_duration_ms
    FROM m GROUP BY media_type
    """,
)
def q80_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only media aggregation: per-type counts, byte totals,
    dimensions/durations. Reads ONLY the meta struct — at scale the
    (huge) binary payload column is pruned out of the parquet scan
    entirely, which is the query shape to prefer whenever the answer
    doesn't need pixels."""
    media = synthesize_media_frame(spark, _N_MEDIA)
    return media_stats(media).orderBy("media_type")


# q81 oracle (r10 verdict item 4): the codec is INJECTED, but the
# deterministic FakeCodec the driver configuration runs is not — its
# contract (operators/multimodal.py:FakeCodec: feature[i] =
# (sum of payload[i::8]) % 997 / 997 over sha2(media_id)-derived
# payloads) pins the output to constants, so the oracle is an inline
# VALUES pin of the expected 3-row aggregate rather than rows-only.
# The constants are re-derivable: tools/derive_q81_oracle() below
# recomputes them from a pure-Python mirror of synthesize_media_frame
# + FakeCodec, and tests/test_streaming.py asserts the derivation
# equals this literal. Floats are written via repr() so the DOUBLE
# literals round-trip bit-exactly through DuckDB.
_Q81_ORACLE = """
    SELECT * FROM (VALUES
      {rows}
    ) AS t(media_type, n_items, total_bytes, avg_f0, avg_f_sum)
    ORDER BY media_type
"""


def derive_q81_oracle_rows() -> list[tuple]:
    """Pure-Python mirror of q81's exact-integer aggregation over the
    synthesized media frame + FakeCodec — the source of the VALUES
    constants in q81's oracle, re-asserted by pytest so the literal
    can never silently drift from the codec contract."""
    import hashlib

    by_type: dict[str, list[tuple[int, int, int]]] = {}
    for mid in range(_N_MEDIA):
        mtype = ["image", "audio", "video"][mid % 3]
        # synthesize_media_frame: to_binary(repeat(sha2(id, 256), 4), 'hex')
        payload = bytes.fromhex(
            hashlib.sha256(str(mid).encode()).hexdigest() * 4
        )
        ks = [sum(payload[i::8]) % 997 for i in range(8)]
        by_type.setdefault(mtype, []).append((len(payload), ks[0], sum(ks)))
    rows = []
    for mtype in sorted(by_type):
        items = by_type[mtype]
        n = len(items)
        total_bytes = sum(b for b, _, _ in items)
        sk0 = sum(k0 for _, k0, _ in items)
        sksum = sum(ks for _, _, ks in items)
        rows.append(
            (
                mtype,
                n,
                total_bytes,
                round(sk0 / (n * 997), 9),
                round(sksum / (n * 997), 9),
            )
        )
    return rows


@query(
    "q81_media_features",
    oracle=_Q81_ORACLE.format(
        rows=",\n      ".join(
            "('{}', CAST({} AS BIGINT), CAST({} AS BIGINT), "
            "CAST({!r} AS DOUBLE), CAST({!r} AS DOUBLE))".format(*r)
            for r in derive_q81_oracle_rows()
        )
    ),
)
def q81_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas), then
    aggregate per media type. The codec here is the deterministic
    FakeCodec (no media libs in this environment); swapping in a
    PIL/librosa codec changes one injection point, none of the Spark
    plumbing.

    Determinism: FakeCodec features are exact multiples of 1/997, so
    the aggregation recovers the integer numerators (round(f*997)),
    sums them as longs (partition-order-free), and divides ONCE at the
    end — float averages of doubles would be fold-order-sensitive and
    could drift a 9th decimal across partitionings. That makes the
    3-row result constant, which is what lets the VALUES oracle above
    upgrade this query from rows-only to exact (r10 verdict item 4)."""
    media = synthesize_media_frame(spark, _N_MEDIA)
    feats = extract_features(media, codec=FakeCodec())
    return (
        feats.select(
            "media_type",
            "n_bytes",
            F.round(F.element_at("feature", 1) * 997, 0)
            .cast("long")
            .alias("k0"),
            F.round(
                F.aggregate("feature", F.lit(0.0), lambda a, x: a + x) * 997, 0
            )
            .cast("long")
            .alias("ksum"),
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("k0").alias("sk0"),
            F.sum("ksum").alias("sksum"),
        )
        .select(
            "media_type",
            "n_items",
            "total_bytes",
            F.round(F.col("sk0") / (F.col("n_items") * 997), 9).alias("avg_f0"),
            F.round(F.col("sksum") / (F.col("n_items") * 997), 9).alias(
                "avg_f_sum"
            ),
        )
        .orderBy("media_type")
    )


@query(
    "q82_media_resize",
    # FakeResizer contract: image payload becomes (224*224)//4096 = 12
    # bytes with width=height=224; non-image rows pass through (128 B).
    oracle=_MEDIA_CTE
    + """
    SELECT media_type, COUNT(*) AS n_items,
           CAST(SUM(CASE WHEN media_type = 'image' THEN 12 ELSE 128 END)
                AS BIGINT) AS total_bytes,
           AVG(CASE WHEN media_type = 'image' THEN 224 END) AS avg_width,
           AVG(CASE WHEN media_type <> 'image' THEN media_id * 100 + 1000 END)
             AS avg_duration_ms
    FROM m GROUP BY media_type
    """,
)
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


@query(
    "q83_frame_sample",
    # duration = id*100+1000 ⇒ n_frames = ceil(duration/1000); every
    # FakeFrameGrabber frame is exactly 8 bytes (128-byte payloads).
    oracle=f"""
    WITH v AS (
      SELECT g AS media_id, (g * 100 + 1000 + 999) // 1000 AS n_frames
      FROM generate_series(0, {_N_MEDIA - 1}) t(g)
      WHERE g % 3 = 2
    )
    SELECT media_id, n_frames,
           (n_frames - 1) * 1000 AS last_ts_ms,
           n_frames * 8 AS frame_bytes
    FROM v
    """,
)
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


# ---------------------------------------------------------------------------
# q84 — binary-payload exact dedup
# ---------------------------------------------------------------------------
_DEDUP_MOD = 32  # distinct payloads among _N_MEDIA items (8 copies each)


@query(
    "q84_media_dedup",
    oracle=f"""
    WITH m AS (
      SELECT g AS media_id,
             repeat(sha256(CAST(g % {_DEDUP_MOD} AS VARCHAR)), 4) AS hex_payload,
             unhex(repeat(sha256(CAST(g % {_DEDUP_MOD} AS VARCHAR)), 4)) AS payload
      FROM generate_series(0, {_N_MEDIA - 1}) t(g)
    )
    SELECT md5(hex_payload) AS digest,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           MIN(media_id) AS canonical_id,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes
    FROM m
    GROUP BY digest
    """,
)
def q84_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over BINARY media payloads — q51's content-hash
    dedup extended to the multimodal columns: group on a digest of the
    payload bytes, keep the smallest media_id as canonical. The frame
    plants 8 byte-identical copies of each of 32 payloads so the check
    exercises real collapses.

    The digest is computed over the payload's lowercase hex (DuckDB's
    md5 is VARCHAR-only; at scale you'd digest the raw bytes — same
    plan). Shuffle is O(items × 32-byte digest) regardless of payload
    size — the 100 TB contract for media dedup: bytes never shuffle,
    digests do. Scan-local hashing + one hash aggregate.
    """
    dup = spark.range(_N_MEDIA).select(
        F.col("id").alias("media_id"),
        F.repeat(F.sha2((F.col("id") % _DEDUP_MOD).cast("string"), 256), 4).alias(
            "hex_payload"
        ),
    )
    with_payload = dup.select(
        "media_id",
        F.to_binary(F.col("hex_payload"), F.lit("hex")).alias("payload"),
        F.md5(F.col("hex_payload")).alias("digest"),
    )
    return with_payload.groupBy("digest").agg(
        F.count("*").alias("n_copies"),
        F.min("media_id").alias("canonical_id"),
        F.sum(F.length("payload")).alias("total_bytes"),
    )


# ---------------------------------------------------------------------------
# q137 — binaryFile ingest (raw-object → table boundary)
# ---------------------------------------------------------------------------
# The oracle must name a concrete path (oracle SQL is a static string);
# the driver's correctness gate always runs at sf0.01, so the oracle
# pins that directory while the Spark side honors sf_dir — at gate time
# the two are the same files.
from ecowatt_etl_spark.sources.tables import ORACLE_SF_DIR as _GATE_SF_DIR  # noqa: E402


@query(
    "q137_binary_ingest",
    oracle=f"""
    SELECT regexp_extract(filename, '[^/]+$') AS file_name,
           CAST(size AS BIGINT) AS n_bytes
    FROM read_blob('{_GATE_SF_DIR}/*.parquet')
    """,
)
def q137_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-object ingest via the `binaryFile` source: each matched file
    becomes one row (path, modificationTime, length, content) — the
    front door a multimodal corpus (images / audio / video / PDFs)
    enters the engine through before the operators/multimodal.py
    decode stages take over.

    Scale notes: this projection reads ONLY file metadata — the
    `content` column is pruned out of the scan (binaryFile supports
    column pruning, so listing a petabyte of objects costs a listing,
    not a read). When content IS needed, binaryFile does not split
    files (one file = one task = whole payload in one executor's
    memory), so the 100 TB pattern is: binaryFile for ingest of
    many small/medium objects → immediately repack into parquet
    binary columns (synthesize_media_frame's layout) where batch
    size, splitting, and payload pruning are under engine control.
    DuckDB's read_blob is the oracle twin of the same boundary.
    """
    df = spark.read.format("binaryFile").load(sf_dir + "/*.parquet")
    return df.select(
        F.element_at(F.split("path", "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
    )
