"""Distributed prefix sum (the scalable form of a global cumsum).

``Window.orderBy(...)`` with no partition key collapses to ONE task —
Spark even warns about it — so a global running total over a 100 TB
key range is the textbook scale-killer. The classic fix is the
two-phase scan every parallel-prefix algorithm uses:

  1. bucket rows by fixed-width ranges of the order key and cumsum
     WITHIN each bucket (distributed: Window partitioned by bucket);
  2. cumsum the per-bucket totals (a frame with one row per bucket —
     bounded, the only global window, over thousands of rows not
     billions) and broadcast the bucket base offsets back.

The result is bit-identical to the single-task global window for any
associative integer sum, shuffles the (key, value) pairs once, and
keeps every task's window state bounded by the bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "prefix",
    bucket_width: int = 65_536,
    exclusive: bool = True,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Running total of ``value_col`` in ``order_col`` order, computed
    as a two-phase distributed scan. ``exclusive=True`` yields the sum
    of all STRICTLY EARLIER rows (0 for the first row) — the offset
    form sequence-packing needs; ``False`` includes the current row.
    With ``partition_cols`` the scan restarts per partition key (e.g.
    one packed stream per source) and EVERY phase keys by the
    partition columns too, so no single key's rows ever serialize on
    one task beyond ``bucket_width``.

    ``order_col`` must be unique non-negative integers (ids) within a
    partition; ties would make "earlier" ambiguous. ``bucket_width``
    bounds per-task window state; the bucket-totals frame has one row
    per OCCUPIED bucket, so sparse id spaces cost nothing.

    Width choice (r8 probe, SCALE.md): the output is bit-identical at
    ANY width (pytest-pinned), so width is purely a parallelism/state
    knob. The original 1M default left every warehouse-scale corpus
    (≤1M ids) in ONE bucket — a single-task window, measured 2.74 s vs
    0.64 s at 10k-width over the 100× corpus. 64Ki splits the tested
    decades into enough buckets to parallelize while a 10B-id corpus
    still yields only ~152k bucket rows — a few MB to broadcast."""
    pcols = list(partition_cols or [])
    bucket = F.expr(f"{order_col} DIV {bucket_width}").alias("__bucket")
    b = df.withColumn("__bucket", bucket)
    in_w = (
        W.partitionBy(*pcols, "__bucket")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1 if exclusive else 0)
    )
    local = b.withColumn(
        "__local", F.coalesce(F.sum(value_col).over(in_w), F.lit(0))
    )
    totals = b.groupBy(*pcols, "__bucket").agg(
        F.sum(value_col).alias("__btot")
    )
    base_w = (
        W.partitionBy(*pcols)
        .orderBy("__bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    bases = totals.withColumn(
        "__base", F.coalesce(F.sum("__btot").over(base_w), F.lit(0))
    ).select(*pcols, "__bucket", "__base")
    return (
        local.join(F.broadcast(bases), pcols + ["__bucket"])
        .withColumn(out_col, F.col("__local") + F.col("__base"))
        .drop("__bucket", "__local")
    )


def bucketed_row_number(
    df: DataFrame,
    bucket_col,
    order_cols: list,
    out_col: str = "rn",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Partition-wide ROW_NUMBER as a two-phase distributed scan — the
    ranking twin of :func:`prefix_sum`, for when the order key is NOT
    a unique integer (ties broken by later order columns) but a rank
    over the whole partition is still needed bit-identically to
    ``ROW_NUMBER() OVER (PARTITION BY p ORDER BY ...)``.

    A bare per-partition window serializes each partition key onto one
    task — per-SOURCE ranks over a 100 TB corpus put the largest
    source's billions of rows through a single sort consumer. Instead:

      1. rows get a coarse ``bucket_col`` that must be MONOTONE in the
         leading order column (every row of a lower bucket sorts
         before every row of a higher one — e.g. ``value DIV width``,
         or the leading 16 bits of a hash-hex sort key);
      2. ``row_number`` runs within (partition, bucket) — distributed,
         per-task state bounded by bucket occupancy;
      3. per-bucket COUNTS cumsum over the tiny per-bucket totals
         frame and broadcast back as rank bases.

    The result equals the single-task window for any bucketing that
    respects the order (pytest-pinned), so bucket width is purely a
    parallelism knob."""
    pcols = list(partition_cols or [])
    b = df.withColumn("__bucket", bucket_col)
    in_w = W.partitionBy(*pcols, "__bucket").orderBy(*order_cols)
    local = b.withColumn("__rn", F.row_number().over(in_w))
    totals = b.groupBy(*pcols, "__bucket").agg(F.count("*").alias("__bcnt"))
    base_w = (
        W.partitionBy(*pcols)
        .orderBy("__bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    bases = totals.withColumn(
        "__base", F.coalesce(F.sum("__bcnt").over(base_w), F.lit(0))
    ).select(*pcols, "__bucket", "__base")
    return (
        local.join(F.broadcast(bases), pcols + ["__bucket"])
        .withColumn(out_col, F.col("__rn") + F.col("__base"))
        .drop("__bucket", "__rn")
    )
