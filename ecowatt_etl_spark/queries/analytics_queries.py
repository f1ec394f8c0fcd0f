"""Advanced-analytics queries: per-group regression, grouped-map UDFs.

q90 computes ordinary-least-squares slope/intercept per event type with
EXACT cross-engine arithmetic: all sums (Σx, Σy, Σxy, Σx²) accumulate
in decimal (x is integer epoch-seconds, y fixed-point decimal(18,6)),
the numerator/denominator differences stay decimal-exact, and only the
final division runs in double after a string-routed cast — identical
bits in Spark and DuckDB. q91 is the same regression via
groupBy().applyInPandas (numpy lstsq) — the grouped-map Arrow API the
engine exposes for per-group logic SQL can't express; parity with q90
is asserted in tests (float tolerance: numpy's summation order is its
own).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecowatt_etl_spark.queries.registry import query
from ecowatt_etl_spark.sources.tables import load_table

_DEC_Y = "decimal(18,6)"
_DEC_WIDE = "decimal(38,6)"


# ---------------------------------------------------------------------------
# q90 — OLS slope/intercept per event type (exact-decimal closed form)
# ---------------------------------------------------------------------------
@query(
    "q90_regr_by_type",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             epoch_us(ts) // 1000000 AS x,
             CAST(value AS DECIMAL(18,6)) AS y
      FROM events
    ),
    sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(x) AS sx,
             CAST(SUM(y) AS DECIMAL(38,6)) AS sy,
             SUM(x * x) AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(38,6)) * y) AS DECIMAL(38,6)) AS sxy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS slope,
           (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
             - (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
                / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE))
               * CAST(CAST(sx AS VARCHAR) AS DOUBLE)) / n AS intercept
    FROM sums
    """,
)
def q90_regr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS y = a·x + b per event type (x = epoch seconds, y = value),
    via the closed form over exact-decimal sums: one hash aggregate
    computes n, Σx, Σy, Σx², Σxy map-side; numerator n·Σxy − Σx·Σy and
    denominator n·Σx² − (Σx)² stay decimal-exact; only the final
    division is floating point (string-routed decimal→double cast, so
    both engines round identically). Scales like any single aggregate —
    the whole regression is 5 partial sums per group."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.floor(F.unix_micros("ts") / 1_000_000).alias("x"),
        F.col("value").cast(_DEC_Y).alias("y"),
    )
    # x² and Σx·Σx exceed int64 (epoch-seconds squared ≈ 3e18/row) —
    # everything quadratic runs in decimal(38,0); DuckDB's BIGINT sums
    # auto-promote to 128-bit, so both engines stay exact
    sums = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").cast(_DEC_WIDE).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(_DEC_WIDE) * F.col("y")).cast(_DEC_WIDE).alias("sxy"),
    )
    sx_dec = F.col("sx").cast("decimal(38,0)")
    num = (F.col("n") * F.col("sxy") - sx_dec * F.col("sy")).cast("string").cast("double")
    den = (F.col("n") * F.col("sxx") - sx_dec * sx_dec).cast("string").cast("double")
    slope = num / den
    sy_d = F.col("sy").cast("string").cast("double")
    sx_d = F.col("sx").cast("string").cast("double")
    return sums.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((sy_d - slope * sx_d) / F.col("n")).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# q91 — the same regression via groupBy().applyInPandas (rows-only)
# ---------------------------------------------------------------------------
@query("q91_regr_grouped_map")  # numpy lstsq summation order ≠ decimal → rows-only
def q91_regr_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Arrow path: each event type's full point set arrives
    as ONE pandas DataFrame; numpy solves the least-squares fit. The
    API template for per-group logic beyond SQL (model fits, seasonal
    decomposition, custom scoring). Values match q90 to float64
    tolerance (asserted in tests); the group must fit one executor's
    memory — for 100 TB groups, use the q90 aggregate form instead."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.floor(F.unix_micros("ts") / 1_000_000).alias("x"),
        F.col("value").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy(dtype=np.float64)
        y = pdf["y"].to_numpy(dtype=np.float64)
        a = np.vstack([x, np.ones_like(x)]).T
        (slope, intercept), *_ = np.linalg.lstsq(a, y, rcond=None)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [len(pdf)],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return pts.groupBy("event_type").applyInPandas(
        fit, schema="event_type string, n long, slope double, intercept double"
    )
