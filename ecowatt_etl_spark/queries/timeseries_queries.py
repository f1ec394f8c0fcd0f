"""Time-series analytics over the event stream: OHLC bars, time-weighted
averages, last-observation-carried-forward imputation, and robust
(median/MAD) anomaly detection.

These are the hypertable-style operators a metrics warehouse layers on
top of raw events (reference scope: the dashboard aggregations in
``main.py`` — per-bucket summaries over a time column — generalized to
the standard time-series toolkit). All four follow the engine's exact
cross-engine arithmetic discipline: order statistics are selected by
rank (identical row choice in Spark and DuckDB), money/metric values
ride integer micro-units or decimals through every reduction, and only
a final fixed-order division runs in double — so every query is
hash-checkable against the DuckDB oracle, no tolerance.

Scale notes per query live on the functions; the common theme is that
q164 is windowless (ONE hash aggregate — at 100 TB an OHLC rollup must
not per-bucket sort), and q165–q167 each spend exactly one exchange on
their natural partition key (user_id / event_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ecowatt_etl_spark.queries.registry import query
from ecowatt_etl_spark.sources.tables import load_table

# Composite ordering key for arg_min/arg_max-style selection without a
# struct comparator (DuckDB's arg_min only orders by scalars):
# epoch-micros * 10^7 + event_id, carried as decimal(38,0) in Spark and
# HUGEINT in DuckDB — exact on both sides, and event_id < 10^7 holds by
# construction of the synthetic ids at every sf (asserted in tests).
_ORD_KEY_SQL = "CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id"


def _ord_key() -> F.Column:
    return (
        F.unix_micros("ts").cast("decimal(38,0)") * F.lit(10_000_000)
        + F.col("event_id")
    ).alias("ord_key")


# Micro-unit fixed-point view of ``value`` (exact: value is rendered
# through decimal(18,6) first, so both engines quantize identically).
_V_US_SQL = "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"


def _v_us() -> F.Column:
    return (
        (F.col("value").cast("decimal(18,6)") * F.lit(1_000_000))
        .cast("bigint")
        .alias("v_us")
    )


# ---------------------------------------------------------------------------
# q164 — OHLC candlestick bars per (event_type, day), windowless
# ---------------------------------------------------------------------------
_Q164_ORACLE = f"""
    WITH pts AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS bar_date,
             {_V_US_SQL} AS v_us,
             {_ORD_KEY_SQL} AS ord_key
      FROM events
    )
    SELECT event_type, bar_date,
           CAST(arg_min(v_us, ord_key) AS DOUBLE) / 1000000 AS open,
           CAST(MAX(v_us) AS DOUBLE) / 1000000 AS high,
           CAST(MIN(v_us) AS DOUBLE) / 1000000 AS low,
           CAST(arg_max(v_us, ord_key) AS DOUBLE) / 1000000 AS close,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(CAST(SUM(CAST(v_us AS HUGEINT)) AS VARCHAR) AS DOUBLE)
             / 1000000 AS total_value
    FROM pts
    GROUP BY event_type, bar_date
    """


@query("q164_ohlc_bars", oracle=_Q164_ORACLE)
def q164_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open/high/low/close) candlestick bars per event type
    — the financial/metrics rollup shape — computed WINDOWLESS: open
    and close are ``min_by``/``max_by`` over a composite
    (epoch-micros, event_id) ordering key, so the whole bar is ONE
    hash aggregate with map-side partials. The naive formulation
    (row_number window per bar, pick first/last) would sort every
    partition of a 100 TB event log; this shape shuffles only
    per-(type, day) partial states — O(bars), not O(events) — and is
    the one to reach for when bars are the ingest-time rollup.
    Ties on ts are broken by event_id inside the ordering key, so the
    selected open/close rows are deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.to_date(F.date_trunc("day", "ts")).alias("bar_date"),
        _v_us(),
        _ord_key(),
    )
    return pts.groupBy("event_type", "bar_date").agg(
        (F.min_by("v_us", "ord_key").cast("double") / 1_000_000).alias("open"),
        (F.max("v_us").cast("double") / 1_000_000).alias("high"),
        (F.min("v_us").cast("double") / 1_000_000).alias("low"),
        (F.max_by("v_us", "ord_key").cast("double") / 1_000_000).alias("close"),
        F.count("*").alias("n_trades"),
        (
            F.sum(F.col("v_us").cast("decimal(38,0)"))
            .cast("string")
            .cast("double")
            / 1_000_000
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# q165 — time-weighted average value per user (hypertable time_weight())
# ---------------------------------------------------------------------------
@query(
    "q165_time_weighted_avg",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             epoch_us(ts) AS t_us,
             {_V_US_SQL} AS v_us,
             {_ORD_KEY_SQL} AS ord_key
      FROM events
    ),
    seg AS (
      SELECT user_id, v_us,
             lead(t_us) OVER (PARTITION BY user_id ORDER BY ord_key)
               - t_us AS dt_us
      FROM pts
    ),
    agg AS (
      SELECT user_id,
             COUNT(*) AS n_obs,
             SUM(CAST(v_us AS HUGEINT) * dt_us) AS wsum,
             SUM(CAST(dt_us AS HUGEINT)) AS span_us
      FROM seg WHERE dt_us IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_obs AS BIGINT) AS n_segments,
           CAST(span_us AS BIGINT) AS span_us,
           CAST(CAST(wsum AS VARCHAR) AS DOUBLE)
             / CAST(span_us AS BIGINT) / 1000000 AS twa_value
    FROM agg
    """,
)
def q165_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user — hypertable
    ``time_weight('LOCF', ...)`` semantics: each observation holds its
    value until the next one, so the mean weights each reading by its
    holding duration instead of treating a burst of samples as equal
    votes. One lead() window and one aggregate, both keyed on
    user_id: Catalyst reuses the window's hashpartitioning for the
    groupBy, so the event log is exchanged ONCE. Products ride
    HUGEINT/decimal(38,0) (micro-value × micro-duration overflows
    int64 by design), and the final double division happens in the
    same fixed order on both engines. At 100 TB this is the canonical
    per-entity sessionless rollup — shuffle O(events) once on the
    entity key, state O(1) per entity."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t_us"),
        _v_us(),
        _ord_key(),
    )
    w = W.partitionBy("user_id").orderBy("ord_key")
    seg = pts.select(
        "user_id",
        "v_us",
        (F.lead("t_us").over(w) - F.col("t_us")).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.count("*").alias("n_segments"),
        F.sum(F.col("v_us").cast("decimal(38,0)") * F.col("dt_us")).alias("wsum"),
        F.sum("dt_us").alias("span_us"),
    )
    return agg.select(
        "user_id",
        "n_segments",
        "span_us",
        (
            F.col("wsum").cast("string").cast("double")
            / F.col("span_us")
            / 1_000_000
        ).alias("twa_value"),
    )


# ---------------------------------------------------------------------------
# q166 — LOCF imputation on a dense (user × day) grid
# ---------------------------------------------------------------------------
@query(
    "q166_locf_impute",
    oracle=f"""
    WITH pts AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             {_V_US_SQL} AS v_us,
             {_ORD_KEY_SQL} AS ord_key
      FROM events
    ),
    daily AS (
      SELECT user_id, day, arg_max(v_us, ord_key) AS v_us
      FROM pts GROUP BY user_id, day
    ),
    bounds AS (
      SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS lo,
             CAST(date_trunc('day', MAX(ts)) AS DATE) AS hi
      FROM events
    ),
    days AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL '1 day')) AS DATE)
               AS day
      FROM bounds
    ),
    grid AS (
      SELECT u.user_id, days.day
      FROM days CROSS JOIN (SELECT DISTINCT user_id FROM events) u
    ),
    g AS (
      SELECT grid.user_id, grid.day, daily.v_us
      FROM grid LEFT JOIN daily
        ON daily.user_id = grid.user_id AND daily.day = grid.day
    )
    SELECT user_id, day,
           CAST(v_us IS NULL AND last_value(v_us IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY day
                  ROWS UNBOUNDED PRECEDING) IS NOT NULL
                AS BOOLEAN) AS filled,
           CAST(last_value(v_us IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY day
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1000000
             AS value_locf
    FROM g
    """,
)
def q166_locf_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily series with last-observation-carried-
    forward imputation — the feature-store companion to q162's linear
    interpolation (LOCF is the causal variant: it never reads the
    future, so it is the one a training pipeline may use). Day cells
    with no observation inherit the user's most recent daily closing
    value (``arg_max`` by the composite ts/event_id key — windowless,
    like q164); days before a user's first observation stay NULL and
    are flagged. The event log contributes one (user, day) aggregate;
    the carry-forward window runs on the dense O(users × days) grid,
    never on raw events — the same events-aggregate-then-grid shape
    as q162, with the grid join broadcast."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        _v_us(),
        _ord_key(),
    )
    daily = pts.groupBy("user_id", "day").agg(
        F.max_by("v_us", "ord_key").alias("v_us")
    )
    bounds = ev.agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("lo"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("hi"),
    )
    days = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    grid = days.crossJoin(ev.select("user_id").distinct())
    g = F.broadcast(daily).join(grid, ["user_id", "day"], "right")
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("v_us", ignorenulls=True).over(w_prev)
    return g.select(
        "user_id",
        "day",
        (F.col("v_us").isNull() & carried.isNotNull()).alias("filled"),
        (carried.cast("double") / 1_000_000).alias("value_locf"),
    )


# ---------------------------------------------------------------------------
# q167 — robust anomaly detection: median/MAD outlier counts per type
# ---------------------------------------------------------------------------
@query(
    "q167_mad_anomalies",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, event_id, {_V_US_SQL} AS v_us
      FROM events
    ),
    r AS (
      SELECT event_type, v_us,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY v_us, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM pts
    ),
    med AS (
      -- med2 = 2 * exact median, kept integral (sum of the two middle
      -- ranks, or twice the single middle) so deviations stay integer
      SELECT event_type,
             CAST(SUM(v_us) * 2 // COUNT(*) AS BIGINT) AS med2
      FROM r WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
      GROUP BY event_type
    ),
    dev AS (
      SELECT pts.event_type, pts.event_id,
             ABS(2 * pts.v_us - med.med2) AS d2
      FROM pts JOIN med ON pts.event_type = med.event_type
    ),
    rd AS (
      SELECT event_type, d2,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY d2, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM dev
    ),
    mad AS (
      -- mad4 = 4 * exact MAD (same doubling trick, one level deeper)
      SELECT event_type,
             CAST(SUM(d2) * 2 // COUNT(*) AS BIGINT) AS mad4
      FROM rd WHERE rn IN ((cnt + 1) // 2, (cnt + 2) // 2)
      GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MAX(med.med2) AS DOUBLE) / 2 / 1000000 AS median_value,
           CAST(MAX(mad.mad4) AS DOUBLE) / 4 / 1000000 AS mad_value,
           -- |v - med| > 3 * MAD  <=>  4*d2 > 3*mad4, all integer
           CAST(SUM(CASE WHEN 4 * dev.d2 > 3 * mad.mad4
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM dev
    JOIN med ON dev.event_type = med.event_type
    JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type
    """,
)
def q167_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier report: exact median and exact MAD
    (median absolute deviation) via the q160 rank construction, then
    a count of events beyond the classic 3×MAD fence. MAD is the
    estimator curation pipelines use where stddev is useless (one
    wild sensor shifts a mean fence; the median/MAD fence moves only
    at 50% contamination). EVERYTHING is integer: values ride
    micro-units, the median is kept doubled (med2 = 2·median) and the
    MAD quadrupled (mad4 = 4·MAD) so half-steps from even-n midpoints
    never leave the integers, and the fence test |v−med| > 3·MAD is
    evaluated as 4·|2v−med2| > 3·mad4 — exact on both engines, no
    float anywhere before the two display columns. Cost: two
    per-type sorted windows (median, then deviation median) and two
    broadcast-sized joins of the per-type medians back onto the
    events — at 100 TB the documented downgrade is approx_percentile
    for both order statistics; the fence algebra is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select("event_type", "event_id", _v_us())

    def _doubled_median(df: DataFrame, col: str, out: str) -> DataFrame:
        w = W.partitionBy("event_type").orderBy(col, "event_id")
        wc = W.partitionBy("event_type")
        r = df.select(
            "event_type",
            col,
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wc).alias("cnt"),
        )
        mid = r.filter(
            (F.col("rn") == F.expr("(cnt + 1) div 2"))
            | (F.col("rn") == F.expr("(cnt + 2) div 2"))
        )
        return mid.groupBy("event_type").agg(
            F.expr(f"CAST(SUM({col}) * 2 DIV COUNT(*) AS BIGINT)").alias(out)
        )

    med = _doubled_median(pts, "v_us", "med2")
    dev = pts.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        F.abs(F.lit(2) * F.col("v_us") - F.col("med2")).alias("d2"),
    )
    mad = _doubled_median(dev, "d2", "mad4")
    joined = dev.join(F.broadcast(med), "event_type").join(
        F.broadcast(mad), "event_type"
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (F.max("med2").cast("double") / 2 / 1_000_000).alias("median_value"),
        (F.max("mad4").cast("double") / 4 / 1_000_000).alias("mad_value"),
        F.sum(
            F.when(F.lit(4) * F.col("d2") > F.lit(3) * F.col("mad4"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_anomalies"),
    )


# ---------------------------------------------------------------------------
# q174 — the SAME OHLC bars under Structured Streaming (exact oracle)
# ---------------------------------------------------------------------------
@query("q174_stream_ohlc", oracle=_Q164_ORACLE)
def q174_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q164's daily OHLC bars executed as a Structured Streaming query
    (file replay → 1-hour watermark → memory sink, complete mode):
    min_by/max_by are declarative aggregates, so each live bar is five
    scalars of state per (type, day) that late data folds into until
    the watermark closes the bar — the ingest-time rollup shape where
    bars are SERVED while the day is still open. Integer micro-unit
    values and post-aggregate display divisions make the full replay
    bit-identical to batch q164, so this carries q164's EXACT oracle —
    batch/stream parity as a value gate (the q44/q45 discipline)."""
    from ecowatt_etl_spark.streaming.events_stream import (
        ohlc_bars_stream,
        read_events_stream,
        run_to_completion,
    )

    bars = ohlc_bars_stream(read_events_stream(spark, sf_dir))
    return run_to_completion(bars, "q174_stream_ohlc_sink", output_mode="complete")


# ---------------------------------------------------------------------------
# q177 — exact winsorization report (clip at p01/p99 rank statistics)
# ---------------------------------------------------------------------------
@query(
    "q177_winsorize",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, event_id, {_V_US_SQL} AS v_us FROM events
    ),
    r AS (
      SELECT event_type, v_us,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY v_us, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM pts
    ),
    fences AS (
      SELECT event_type,
             MAX(CASE WHEN rn = (cnt + 99) // 100 THEN v_us END) AS lo,
             MAX(CASE WHEN rn = (99 * cnt + 99) // 100 THEN v_us END) AS hi
      FROM r GROUP BY event_type
    )
    SELECT pts.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(f.lo AS DOUBLE) / 1000000 AS p01,
           CAST(f.hi AS DOUBLE) / 1000000 AS p99,
           CAST(SUM(CASE WHEN v_us < f.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_low,
           CAST(SUM(CASE WHEN v_us > f.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_high,
           CAST(CAST(SUM(CAST(v_us AS HUGEINT)) AS VARCHAR) AS DOUBLE)
             / COUNT(*) / 1000000 AS mean_raw,
           CAST(CAST(SUM(CAST(GREATEST(f.lo, LEAST(f.hi, v_us)) AS HUGEINT))
                     AS VARCHAR) AS DOUBLE)
             / COUNT(*) / 1000000 AS mean_winsorized
    FROM pts JOIN fences f ON f.event_type = pts.event_type
    GROUP BY pts.event_type, f.lo, f.hi
    """,
)
def q177_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization report per event type: clip values at the EXACT
    p01/p99 order statistics (percentile_disc by integer rank — the
    q160/q167 discipline, so fence selection is identical on both
    engines) and report how many observations each tail clips plus
    the raw vs winsorized mean. This is the standard outlier
    treatment a feature pipeline applies before scaling (q10's
    min-max normalize is exactly the op winsorizing protects: one
    wild sensor otherwise owns the range).

    All comparisons and the clipped sum are integer micro-units; the
    two means are string-routed divisions. Cost: one per-type rank
    window to pick fences (the 100 TB downgrade is approx_percentile),
    one broadcast of the 5-row fence table, one hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select("event_type", "event_id", _v_us())
    w = W.partitionBy("event_type").orderBy("v_us", "event_id")
    wc = W.partitionBy("event_type")
    r = pts.select(
        "event_type",
        "v_us",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("cnt"),
    )
    fences = r.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(cnt + 99) div 100"), F.col("v_us"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.expr("(99 * cnt + 99) div 100"), F.col("v_us"))
        ).alias("hi"),
    )
    j = pts.join(F.broadcast(fences), "event_type")
    clipped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v_us")))
    return j.groupBy("event_type", "lo", "hi").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("v_us") < F.col("lo"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("v_us") > F.col("hi"), 1).otherwise(0))
        .cast("long")
        .alias("n_clipped_high"),
        (
            F.sum(F.col("v_us").cast("decimal(38,0)"))
            .cast("string")
            .cast("double")
            / F.count("*")
            / 1_000_000
        ).alias("mean_raw"),
        (
            F.sum(clipped.cast("decimal(38,0)")).cast("string").cast("double")
            / F.count("*")
            / 1_000_000
        ).alias("mean_winsorized"),
    ).select(
        "event_type",
        "n",
        (F.col("lo").cast("double") / 1_000_000).alias("p01"),
        (F.col("hi").cast("double") / 1_000_000).alias("p99"),
        "n_clipped_low",
        "n_clipped_high",
        "mean_raw",
        "mean_winsorized",
    )


# ---------------------------------------------------------------------------
# q184 — diurnal (hour-of-day) seasonal profile per event type
# ---------------------------------------------------------------------------
@query(
    "q184_diurnal_profile",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod, {_V_US_SQL} AS v_us
      FROM events
    ),
    cell AS (
      SELECT event_type, hod, COUNT(*) AS n,
             SUM(CAST(v_us AS HUGEINT)) AS sv
      FROM pts GROUP BY event_type, hod
    ),
    tot AS (
      SELECT event_type, SUM(n) AS tn, SUM(sv) AS tsv FROM cell
      GROUP BY event_type
    )
    SELECT c.event_type, c.hod,
           CAST(c.n AS BIGINT) AS n_events,
           CAST(CAST(c.sv AS VARCHAR) AS DOUBLE) / c.n / 1000000 AS hourly_mean,
           CAST(CAST(c.sv * t.tn - t.tsv * c.n AS VARCHAR) AS DOUBLE)
             / c.n / t.tn / 1000000 AS seasonal_delta,
           CAST(c.n * 24 * 10000 // t.tn AS BIGINT) AS load_share_bp
    FROM cell c JOIN tot t ON t.event_type = c.event_type
    """,
)
def q184_diurnal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal seasonality profile: per (event type, hour-of-day), the
    hourly mean value, its EXACT deviation from the type's all-hours
    mean (computed as the cross-multiplied rational
    (sv·tn − tsv·n)/(n·tn) so the subtraction of two averages never
    touches floats), and the hour's load share in basis points
    normalized against a uniform 1/24 profile (10000 = exactly
    average load). This is the seasonal-naive baseline every anomaly
    detector and capacity planner starts from — and the profile q167's
    MAD fence would be applied AGAINST for seasonal data.

    Scale: one (type, hour) hash aggregate over the scan (≤ 24·types
    groups), totals re-aggregated from the cell table — the events
    are touched once. The profile table is permanently tiny."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type", F.hour("ts").cast("long").alias("hod"), _v_us()
    )
    cell = pts.groupBy("event_type", "hod").agg(
        F.count("*").alias("n"),
        F.sum(F.col("v_us").cast("decimal(38,0)")).alias("sv"),
    )
    tot = cell.groupBy("event_type").agg(
        F.sum("n").alias("tn"), F.sum("sv").alias("tsv")
    )
    c = cell.join(F.broadcast(tot), "event_type")
    delta_num = (
        F.col("sv") * F.col("tn") - F.col("tsv") * F.col("n")
    ).cast("decimal(38,0)")
    return c.select(
        "event_type",
        "hod",
        F.col("n").cast("long").alias("n_events"),
        (
            F.col("sv").cast("string").cast("double") / F.col("n") / 1_000_000
        ).alias("hourly_mean"),
        (
            delta_num.cast("string").cast("double")
            / F.col("n")
            / F.col("tn")
            / 1_000_000
        ).alias("seasonal_delta"),
        F.expr("CAST(n * 24 * 10000 DIV tn AS BIGINT)").alias("load_share_bp"),
    )


# ---------------------------------------------------------------------------
# q194 — custom Python STREAMING data source, value-gated end to end
# ---------------------------------------------------------------------------
_TICKS_TOTAL = 1000
_TICK_BUCKETS = 8


@query(
    "q194_python_stream_source",
    oracle=f"""
    WITH t AS (
      SELECT unnest(generate_series(0, {_TICKS_TOTAL - 1})) AS tick
    )
    SELECT CAST(tick % {_TICK_BUCKETS} AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM((tick * 2654435761) % 10000) AS BIGINT) AS total_cents,
           CAST(MIN(tick) AS BIGINT) AS first_tick,
           CAST(MAX(tick) AS BIGINT) AS last_tick
    FROM t GROUP BY 1
    """,
)
def q194_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING half of the Python DataSource API (q193 is the
    batch half): a custom SimpleDataSourceStreamReader emits a
    deterministic tick stream in offset-tracked micro-batches
    (offsets are tick indices, so recovery replays exactly), and a
    streaming aggregation rolls it up per bucket in complete mode.
    The DuckDB oracle regenerates the tick arithmetic relationally —
    the whole custom-source micro-batch pipeline (offset management,
    batch slicing, streaming agg state) is value-gated, not just
    smoke-tested. This is the template for reading a real queue/API
    the engine has no connector for: replace the generator arithmetic
    with the client call; keep the offset contract and the oracle
    discipline.

    Scale: the simple stream reader pulls slices on the DRIVER — the
    right variant for low-volume control streams; a high-volume
    source implements the partitioned DataSourceStreamReader instead
    (executor-parallel reads, same offset contract). All values are
    int64-exact (Knuth multiplicative hash mod 10⁴)."""
    from ecowatt_etl_spark.sources.pydatasource import register_tick_stream
    from ecowatt_etl_spark.streaming.events_stream import run_to_completion

    register_tick_stream(spark)
    ticks = (
        spark.readStream.format("tick_stream")
        .option("ticks_total", str(_TICKS_TOTAL))
        .option("n_buckets", str(_TICK_BUCKETS))
        .load()
    )
    agg = ticks.groupBy("bucket").agg(
        F.count("*").alias("n_ticks"),
        F.sum("amount_cents").cast("long").alias("total_cents"),
        F.min("tick_id").alias("first_tick"),
        F.max("tick_id").alias("last_tick"),
    )
    return run_to_completion(
        agg, "q194_python_stream_sink", output_mode="complete"
    )


# ---------------------------------------------------------------------------
# q203 — seasonal-naive forecast BACKTEST (per-type daily, exact MAE)
# ---------------------------------------------------------------------------
_BT_SEASON = 7  # weekly seasonality
_BT_HOLDOUT = 7  # last 7 days are the test window


@query(
    "q203_forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_V_US_SQL}) AS v_us
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, v_us,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS dn,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM daily
    ),
    joined AS (
      SELECT t.event_type, t.day,
             t.v_us AS actual_us, f.v_us AS forecast_us
      FROM idx t JOIN idx f
        ON f.event_type = t.event_type AND f.dn = t.dn - {_BT_SEASON}
      WHERE t.dn > t.nd - {_BT_HOLDOUT}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(CAST(SUM(CAST(ABS(actual_us - forecast_us) AS HUGEINT))
                     AS VARCHAR) AS DOUBLE) / COUNT(*) / 1000000 AS mae,
           CAST(CAST(SUM(CAST(ABS(actual_us - forecast_us) AS HUGEINT))
                     AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(ABS(actual_us) AS HUGEINT))
                         AS VARCHAR) AS DOUBLE) AS wape
    FROM joined GROUP BY event_type
    """,
)
def q203_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast BACKTEST — the evaluation harness that justifies (or
    kills) any forecasting model: the seasonal-naive baseline
    (forecast = the value 7 days earlier) is scored on the
    final 7-day holdout per event type, reporting MAE and
    WAPE. Seasonal-naive is THE baseline every forecast benchmark
    (M-competitions onward) requires you to beat; a warehouse that
    can backtest it in one query can backtest any model whose
    predictions land in a table. Errors accumulate in integer
    micro-units (|actual − forecast| summed exactly), the two
    metrics are final string-routed divisions — hash-exact.

    Scale: one (type, day) aggregate over events; the forecast
    lookup is a self-join on day-index within the tiny daily frame;
    everything after the first aggregate is O(types × days)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(_v_us()).alias("v_us"))
    w = W.partitionBy("event_type").orderBy("day")
    wc = W.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "day",
        "v_us",
        F.row_number().over(w).alias("dn"),
        F.count("*").over(wc).alias("nd"),
    )
    t = idx.select(
        "event_type",
        "day",
        F.col("v_us").alias("actual_us"),
        "dn",
        "nd",
    )
    f = idx.select(
        F.col("event_type").alias("f_type"),
        F.col("v_us").alias("forecast_us"),
        (F.col("dn") + _BT_SEASON).alias("f_dn"),
    )
    joined = t.join(
        f,
        (F.col("f_type") == F.col("event_type")) & (F.col("f_dn") == F.col("dn")),
    ).filter(F.col("dn") > F.col("nd") - _BT_HOLDOUT)
    abs_err = F.abs(F.col("actual_us") - F.col("forecast_us")).cast("decimal(38,0)")
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        (
            F.sum(abs_err).cast("string").cast("double")
            / F.count("*")
            / 1_000_000
        ).alias("mae"),
        (
            F.sum(abs_err).cast("string").cast("double")
            / F.sum(F.abs(F.col("actual_us")).cast("decimal(38,0)"))
            .cast("string")
            .cast("double")
        ).alias("wape"),
    )


# ---------------------------------------------------------------------------
# q204 — CUSUM change-point detection over the daily series
# ---------------------------------------------------------------------------
@query(
    "q204_cusum_changepoint",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_V_US_SQL}) AS v_us
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, SUM(v_us) AS tot, COUNT(*) AS nd
      FROM daily GROUP BY event_type
    ),
    cusum AS (
      -- S_t = Σ (nd·v_i − tot), kept in nd-scaled integer units so the
      -- running sum of (value − mean) never leaves the integers
      SELECT d.event_type, d.day,
             SUM(CAST(m.nd AS HUGEINT) * d.v_us - m.tot)
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS UNBOUNDED PRECEDING) AS s_scaled,
             m.nd, m.tot
      FROM daily d JOIN m ON m.event_type = d.event_type
    ),
    peak AS (
      SELECT event_type, day, s_scaled, nd,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ABS(s_scaled) DESC, day) AS pk
      FROM cusum
    )
    SELECT event_type,
           day AS changepoint_day,
           CAST(CAST(s_scaled AS VARCHAR) AS DOUBLE)
             / nd / 1000000 AS cusum_peak,
           CAST(nd AS BIGINT) AS n_days
    FROM peak WHERE pk = 1
    """,
)
def q204_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection: the day where the cumulative sum
    of (daily value − series mean) peaks in magnitude — the classic
    estimator of WHERE a level shift happened (monitoring's answer
    to 'when did this metric break', and the segmentation primitive
    behind drift-aware training-data selection). The running sum is
    kept EXACTLY integral by working in nd-scaled units
    (S_t = Σ nd·vᵢ − tot ≡ nd·Σ(vᵢ − mean)), so the peak day is an
    integer argmax — no float accumulation anywhere near the
    decision; the displayed peak is one string-routed division.

    Scale: one (type, day) aggregate, one per-type mean over the
    daily frame, one running-sum window over O(types × days) rows.
    The detector never touches raw events after the first
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(_v_us()).alias("v_us"))
    m = daily.groupBy("event_type").agg(
        F.sum("v_us").alias("tot"), F.count("*").alias("nd")
    )
    j = daily.join(F.broadcast(m), "event_type")
    w_run = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    term = (
        F.col("nd").cast("decimal(38,0)") * F.col("v_us") - F.col("tot")
    ).cast("decimal(38,0)")
    cusum = j.select(
        "event_type",
        "day",
        "nd",
        F.sum(term).over(w_run).alias("s_scaled"),
    )
    w_pk = W.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("s_scaled"))), F.asc("day")
    )
    return (
        cusum.withColumn("pk", F.row_number().over(w_pk))
        .filter(F.col("pk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            (
                F.col("s_scaled").cast("string").cast("double")
                / F.col("nd")
                / 1_000_000
            ).alias("cusum_peak"),
            F.col("nd").cast("long").alias("n_days"),
        )
    )


# ---------------------------------------------------------------------------
# q236 — split-conformal forecast intervals (distribution-free coverage)
# ---------------------------------------------------------------------------
_CP_ALPHA_NUM, _CP_ALPHA_DEN = 1, 5  # alpha = 0.2 → 80% intervals


@query(
    "q236_conformal_intervals",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM({_V_US_SQL}) AS v_us
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, v_us,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS dn,
             COUNT(*) OVER (PARTITION BY event_type) AS nd
      FROM daily
    ),
    joined AS (
      SELECT t.event_type, t.dn, t.nd,
             CAST(ABS(t.v_us - f.v_us) AS BIGINT) AS r
      FROM idx t JOIN idx f
        ON f.event_type = t.event_type AND f.dn = t.dn - {_BT_SEASON}
    ),
    cal AS (
      SELECT event_type, r,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY r, dn) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n_cal
      FROM joined WHERE dn <= nd - {_BT_HOLDOUT}
    ),
    qhat AS (
      SELECT event_type, CAST(MAX(n_cal) AS BIGINT) AS n_cal,
             CAST(MAX(CASE WHEN rn = LEAST(
               ((n_cal + 1) * ({_CP_ALPHA_DEN} - {_CP_ALPHA_NUM})
                + {_CP_ALPHA_DEN} - 1) // {_CP_ALPHA_DEN}, n_cal)
               THEN r END) AS BIGINT) AS q_hat_us
      FROM cal GROUP BY event_type
    ),
    test AS (
      SELECT event_type, r FROM joined WHERE dn > nd - {_BT_HOLDOUT}
    )
    SELECT t.event_type, q.n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           q.q_hat_us,
           CAST(SUM(CASE WHEN t.r <= q.q_hat_us THEN 1 ELSE 0 END) AS BIGINT)
             AS n_covered,
           CAST(SUM(CASE WHEN t.r <= q.q_hat_us THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS coverage_bp
    FROM test t JOIN qhat q ON q.event_type = t.event_type
    GROUP BY 1, 2, 4
    """,
)
def q236_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction intervals for the q203 forecast —
    the distribution-free calibration wrapper (Vovk; popularized as
    conformal prediction) that turns ANY point forecast into an
    interval with finite-sample coverage ≥ 1−α, no error-model
    assumed: the 80% interval half-width q̂ is the ⌈(n+1)(1−α)⌉-th
    smallest calibration residual of the seasonal-naive forecast,
    and the held-out week audits empirical coverage. This is the
    honest error bar a forecast-serving pipeline ships next to q203's
    MAE — backtest says how good the point is, conformal says how
    wide the promise must be.

    Exactness: residuals are integer micro-units; the conformal rank
    ⌈(n+1)(1−α)⌉ is computed with integer ceiling-division and
    selected by ROW_NUMBER over the tiny per-type calibration frame
    (tie-break residual, day-index); q̂ and the coverage basis points
    stay integers end to end. Scale shape = q203's: one (type, day)
    aggregate over events, then everything is O(types × days)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(F.sum(_v_us()).alias("v_us"))
    w = W.partitionBy("event_type").orderBy("day")
    wc = W.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "v_us",
        F.row_number().over(w).alias("dn"),
        F.count("*").over(wc).alias("nd"),
    )
    f = idx.select(
        F.col("event_type").alias("f_type"),
        F.col("v_us").alias("f_us"),
        (F.col("dn") + _BT_SEASON).alias("f_dn"),
    )
    joined = idx.join(
        f,
        (F.col("f_type") == F.col("event_type")) & (F.col("f_dn") == F.col("dn")),
    ).select(
        "event_type",
        "dn",
        "nd",
        F.abs(F.col("v_us") - F.col("f_us")).cast("long").alias("r"),
    )
    cal = joined.filter(F.col("dn") <= F.col("nd") - _BT_HOLDOUT).select(
        "event_type",
        "r",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("r", "dn"))
        .alias("rn"),
        F.count("*").over(wc).alias("n_cal"),
    )
    k = F.least(
        F.expr(
            f"((n_cal + 1) * ({_CP_ALPHA_DEN} - {_CP_ALPHA_NUM})"
            f" + {_CP_ALPHA_DEN} - 1) DIV {_CP_ALPHA_DEN}"
        ),
        F.col("n_cal"),
    )
    qhat = cal.groupBy("event_type").agg(
        F.max("n_cal").alias("n_cal"),
        F.max(F.when(F.col("rn") == k, F.col("r"))).cast("long").alias("q_hat_us"),
    )
    test = joined.filter(F.col("dn") > F.col("nd") - _BT_HOLDOUT).select(
        "event_type", "r"
    )
    covered = F.sum(F.when(F.col("r") <= F.col("q_hat_us"), 1).otherwise(0))
    return (
        test.join(qhat, "event_type")
        .groupBy("event_type", "n_cal", "q_hat_us")
        .agg(
            F.count("*").alias("n_test"),
            covered.cast("long").alias("n_covered"),
        )
        .withColumn(
            "coverage_bp", F.expr("CAST(n_covered * 10000 DIV n_test AS BIGINT)")
        )
        .select(
            "event_type", "n_cal", "n_test", "q_hat_us", "n_covered",
            "coverage_bp",
        )
    )


# ---------------------------------------------------------------------------
# q243 — Holt linear-trend smoothing + forecast (level & trend state)
# ---------------------------------------------------------------------------
# Smoothing constants as exact literal strings: both engines parse the
# same decimal literal to the same nearest double, and the complements
# are written as their own literals (0.7, 0.8) rather than computed, so
# the fold arithmetic below is the identical IEEE op sequence in Spark
# and DuckDB (the q131 EWMA bit-parity pattern, extended to 2-state).
_HOLT_A = "0.3"   # level gain
_HOLT_CA = "0.7"  # 1 - level gain
_HOLT_B = "0.2"   # trend gain
_HOLT_CB = "0.8"  # 1 - trend gain
_HOLT_H = 7       # forecast horizon, days


@query(
    "q243_holt_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM({_V_US_SQL}) AS BIGINT) AS v_us
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    series AS (
      SELECT event_type,
             list(CAST(v_us AS DOUBLE) / 1000000.0 ORDER BY day) AS xs
      FROM daily GROUP BY event_type
    ),
    folded AS (
      SELECT event_type, len(xs) AS n_days,
             list_reduce(
               list_prepend([xs[1], 0.0],
                            list_transform(xs[2:], x -> [x, 0.0])),
               (acc, e) -> [
                 {_HOLT_A} * e[1] + {_HOLT_CA} * (acc[1] + acc[2]),
                 {_HOLT_B} * (({_HOLT_A} * e[1]
                               + {_HOLT_CA} * (acc[1] + acc[2])) - acc[1])
                   + {_HOLT_CB} * acc[2]
               ]) AS st
      FROM series
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           st[1] AS level, st[2] AS trend,
           st[1] + {_HOLT_H}.0 * st[2] AS forecast
    FROM folded
    """,
)
def q243_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per event_type over the daily
    value series, returning the final (level, trend) state and an
    h-step-ahead linear forecast — the workhorse trend forecaster one
    rung above q131's EWMA (which tracks level only and lags any
    trending metric). Recursion: l_t = a*x_t + (1-a)*(l+b);
    b_t = B*(l_t - l) + (1-B)*b, seeded l1 = x1, b1 = 0.

    Cross-engine exactness: daily inputs ride integer micro-units out
    of the aggregate, and the order-dependent 2-state recursion is a
    FIXED-ORDER fold over the day-sorted array (array_sort on a
    (day, v_us) struct — day is unique per type, so the order is
    total); every fold op is written as the same literal expression
    tree in Spark's F.aggregate and DuckDB's list_reduce, so level,
    trend, and forecast are bit-identical without tolerance.

    Scale: ONE exchange (the daily pre-aggregate, map-side partial);
    the per-type series is bounded by the calendar (days, not events),
    so the collected array is small by construction — the same shape
    every hypertable downsample-then-model pipeline uses. The fold is
    scan-local; no driver collect, no UDF, no window."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(_v_us()).alias("v_us"))
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v_us"))),
            lambda s: s["v_us"].cast("double") / F.lit(1000000.0),
        ).alias("xs")
    )
    a, ca = F.lit(float(_HOLT_A)), F.lit(float(_HOLT_CA))
    b, cb = F.lit(float(_HOLT_B)), F.lit(float(_HOLT_CB))

    def _step(acc: F.Column, x: F.Column) -> F.Column:
        l0, b0 = F.element_at(acc, 1), F.element_at(acc, 2)
        l1 = a * x + ca * (l0 + b0)
        b1 = b * ((a * x + ca * (l0 + b0)) - l0) + cb * b0
        return F.array(l1, b1)

    st = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        F.array(F.element_at(F.col("xs"), 1), F.lit(0.0)),
        _step,
    )
    return series.select(
        "event_type",
        F.size("xs").cast("long").alias("n_days"),
        F.element_at(st, 1).alias("level"),
        F.element_at(st, 2).alias("trend"),
        (F.element_at(st, 1) + F.lit(float(_HOLT_H)) * F.element_at(st, 2)).alias(
            "forecast"
        ),
    )
