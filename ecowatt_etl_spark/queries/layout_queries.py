"""Physical-layout operators: Z-order (Morton-curve) clustering audit.

Data-skipping at 100 TB is a LAYOUT property: parquet row-group and
file-level min/max stats only prune when rows that are close in the
query predicate space are close in the file order. Linear sort order
clusters one column and destroys the other; the Z-order interleave
gives every indexed column locality proportional to its bit share.
This module computes the Morton key with pure codegen bit arithmetic
(no UDF), assigns fixed-width z-range buckets — the moral equivalent
of output files — and audits the per-bucket min/max envelope of each
dimension, i.e. exactly the statistics a scan planner would prune on.

The write-path twin (not a query, shown in the docstring) is
``df.repartitionByRange(N, "zvalue").sortWithinPartitions("zvalue")``
followed by a parquet write: range exchange + local sort, no global
funnel. The audit query here buckets by the TOP BITS of the z-value
instead of sampled range boundaries so both engines pick identical
buckets — RangePartitioner boundaries are sample-derived and would
not be oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecowatt_etl_spark.queries.registry import query
from ecowatt_etl_spark.sources.tables import load_table

_BITS = 8  # per-dimension quantization width
_BUCKET_BITS = 6  # 64 z-range buckets ≈ output files


def _interleave_sql(x: str, y: str, fdiv: str) -> str:
    """SQL for the Morton interleave of two pre-quantized _BITS-wide
    ints — same expression tree in both dialects; only the floor-div
    spelling differs (Spark ``div``, DuckDB ``//``), which is safe
    because every operand is a non-negative integer."""
    terms = []
    for b in range(_BITS):
        terms.append(f"(({x} {fdiv} {1 << b}) & 1) * {1 << (2 * b)}")
        terms.append(f"(({y} {fdiv} {1 << b}) & 1) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def _quant_sql(v: str, mn: str, mx: str, fdiv: str) -> str:
    """Min-max quantize ``v`` onto [0, 2^_BITS): exact integer
    arithmetic, degenerate range collapses to 0."""
    hi = (1 << _BITS) - 1
    return (
        f"CASE WHEN {mx} > {mn} THEN ({v} - {mn}) * {hi} {fdiv} ({mx} - {mn})"
        " ELSE 0 END"
    )


# ---------------------------------------------------------------------------
# q168 — Z-order layout audit over lineitem (l_partkey × l_suppkey)
# ---------------------------------------------------------------------------
_ZQ = _quant_sql("l_partkey", "mn_p", "mx_p", "//")
_ZQ2 = _quant_sql("l_suppkey", "mn_s", "mx_s", "//")
_ZQ_S = _quant_sql("l_partkey", "mn_p", "mx_p", "div")
_ZQ2_S = _quant_sql("l_suppkey", "mn_s", "mx_s", "div")


@query(
    "q168_zorder_layout",
    oracle=f"""
    WITH b AS (
      SELECT MIN(l_partkey) AS mn_p, MAX(l_partkey) AS mx_p,
             MIN(l_suppkey) AS mn_s, MAX(l_suppkey) AS mx_s
      FROM lineitem
    ),
    q AS (
      SELECT l_partkey, l_suppkey,
             {_ZQ} AS xq,
             {_ZQ2} AS yq
      FROM lineitem CROSS JOIN b
    ),
    z AS (
      SELECT l_partkey, l_suppkey,
             ({_interleave_sql("xq", "yq", "//")}) AS zvalue
      FROM q
    )
    SELECT zvalue // {1 << (2 * _BITS - _BUCKET_BITS)} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS part_lo, MAX(l_partkey) AS part_hi,
           MIN(l_suppkey) AS supp_lo, MAX(l_suppkey) AS supp_hi,
           MAX(l_partkey) - MIN(l_partkey) AS part_span,
           MAX(l_suppkey) - MIN(l_suppkey) AS supp_span
    FROM z GROUP BY bucket
    """,
)
def q168_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit: Morton-interleave (l_partkey,
    l_suppkey) into a 16-bit z-value — pure codegen bit arithmetic
    built from `&`, integer multiply and floor-divide, no UDF — carve
    the curve into 64 fixed z-range buckets (top 6 bits ≈ output
    files), and report each bucket's min/max envelope per dimension.
    The envelopes ARE the file-skipping statistics: a predicate on
    EITHER key prunes every bucket whose envelope excludes it, which
    is the property a single-column sort cannot give the second key.

    Cost shape: one 4-value global min/max aggregate (broadcast back
    via cross-join of a 1-row frame, the F13 pattern), then a single
    (bucket)-keyed hash aggregate — no sort, no window, no shuffle of
    raw rows beyond the per-bucket partials. The production write is
    ``repartitionByRange(N, zvalue) + sortWithinPartitions`` (range
    exchange, per-file local sort); the audit buckets by top z-bits
    instead of sampled range boundaries so the result is engine-
    reproducible (RangePartitioner boundaries come from sampling)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    b = li.agg(
        F.min("l_partkey").alias("mn_p"),
        F.max("l_partkey").alias("mx_p"),
        F.min("l_suppkey").alias("mn_s"),
        F.max("l_suppkey").alias("mx_s"),
    )
    q = li.crossJoin(F.broadcast(b)).selectExpr(
        "l_partkey",
        "l_suppkey",
        f"{_ZQ_S} AS xq",
        f"{_ZQ2_S} AS yq",
    )
    z = q.selectExpr(
        "l_partkey",
        "l_suppkey",
        f"({_interleave_sql('xq', 'yq', 'div')}) AS zvalue",
    )
    return (
        z.groupBy(
            F.expr(f"zvalue div {1 << (2 * _BITS - _BUCKET_BITS)}").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
            (F.max("l_partkey") - F.min("l_partkey")).alias("part_span"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("supp_span"),
        )
    )
