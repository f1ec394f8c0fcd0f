"""Parquet scans over the synthetic warehouse (TPC-H-ish star schema).

Spark equivalent of the reference's table-scan surface: the reference
pulls whole tables from Azure SQL with ``SELECT * FROM t``
(reference app.py:70-77) and re-reads CSV blobs per run
(reference utils/datsetup.py:89-96). Here every scan is a lazy Parquet
read — column pruning and predicate pushdown reach the file scan via
Catalyst, so "SELECT *" pull-everything semantics never happen unless a
query actually needs everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# The scale the driver's DuckDB value-check runs at. Oracle SQL strings
# are fixed at import time and cannot take sf_dir, so queries whose
# oracle must reference a filesystem path embed THIS directory — keep
# it the single source of truth (tests/conftest.py's SF_ORACLE must
# match).
ORACLE_SF_DIR = "/root/testdata/sf0.01"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Timestamp-bearing columns per table: normalized at scan time because
# the testdata generator has shipped different parquet physical shapes
# across driver rounds (nanos-as-long, tz-less micros/NTZ, adjusted
# micros) — see load_table's docstring.
_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy columnar scan of one warehouse table.

    Timestamp normalization — the synthetic warehouse has been written
    by several parquet producers across driver rounds, so ``events.ts``
    arrives in one of three physical shapes and is normalized to a
    session-zone TIMESTAMP (micros) here, at the single scan wrapper:

    * TIMESTAMP(NANOS): surfaces as epoch-nano longs under
      spark.sql.legacy.parquet.nanosAsLong → truncate to micros
      (bit-identical to DuckDB's nanos→micros cast).
    * TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
      TIMESTAMP_NTZ (parquet.inferTimestampNTZ default on), which the
      chronological operators (unix_micros, window, range frames)
      reject → cast to TIMESTAMP. The session zone is pinned to UTC
      (session.py), so the cast is value-preserving and matches
      DuckDB's naive-timestamp reading of the same file.
    * TIMESTAMP(MICROS, adjusted): already TIMESTAMP — no-op.

    SIDE EFFECT, by design: for timestamp-bearing tables this pins the
    CALLER session's ``spark.sql.session.timeZone`` to UTC (and enables
    ``nanosAsLong``) for the remainder of the session — the NTZ→LTZ
    cast and the engine's formatted-timestamp outputs are only
    deterministic under a pinned zone, and the verification driver's
    plain session arrives unpinned. A non-UTC consumer session will see
    its timestamp FORMATTING (date_format, casts to string) switch to
    UTC after the first events/orders/lineitem scan. That is the
    engine's documented contract — all published results are UTC; a
    caller needing wall-clock rendering in another zone should convert
    explicitly with from_utc_timestamp rather than rely on session-zone
    formatting.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_cols = _TS_COLUMNS.get(name, ())
    if ts_cols:
        # runtime-settable; needed even when the caller's session was not
        # built by get_spark (e.g. the verification driver's own session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # NTZ→LTZ cast below is only deterministic under a pinned zone.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in ts_cols:
        if col not in df.columns:  # partial-schema fixtures (tests)
            continue
        ts_type = df.schema[col].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif col == "ts" and isinstance(ts_type, T.TimestampNTZType):
            # events.ts feeds unix_micros/window/range-frame operators,
            # which reject NTZ → cast. The date-like columns stay NTZ
            # when they arrive as NTZ: every consumer (string compares,
            # interval arithmetic, date_format) accepts NTZ, and an
            # unconditional cast would wrap the scan column in a
            # projection and break predicate pushdown on the date
            # filters (plan-asserted in tests/test_plans.py).
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register catalog temp views so the SQL surface (spark.sql) sees the
    warehouse — the engine's replacement for the reference's Azure SQL
    catalog (reference app.py:519-538 ad-hoc SQL path)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
