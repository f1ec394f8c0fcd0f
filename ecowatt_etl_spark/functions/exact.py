"""Order-independent (exact-decimal) aggregate builders.

Floating-point SUM/AVG depend on reduction order, which in a distributed
engine differs run-to-run and engine-to-engine (partial aggregation on
32 partitions vs a single-threaded oracle). For any aggregate whose
value must be bit-stable — the DuckDB-oracle correctness gate, golden
tests, idempotent re-runs — route the measure through fixed-point
decimal: cast each input double to a decimal (both engines round the
same IEEE double to the same fixed-point value), SUM exactly, cast the
final total back to double.

Cost note for 100 TB: decimal aggregation is a few × slower than double
in Tungsten's hash aggregate; it is applied only to the declared result
columns, never to intermediate joins/filters, and both stay map-side
partial aggregates — the shuffle volume is identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits / 6 fractional: covers money and quantity columns in this
# warehouse with exact tie-free rounding from double.
_DEC = "decimal(18,6)"


def dec(col: str | Column, typ: str = _DEC) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def exact_sum(col: str | Column, alias: str) -> Column:
    """SUM(double) with a deterministic, order-independent result."""
    return F.sum(dec(col)).cast("double").alias(alias)


def exact_avg(col: str | Column, alias: str) -> Column:
    """AVG via exact decimal sum / count → deterministic double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def exact_sum_product(a: str | Column, b: str | Column, alias: str) -> Column:
    """SUM(a*b) exactly: both factors fixed-point decimal(18,6), the
    product decimal(37,12) is exact, the sum is exact, only the final
    cast back to double rounds — identically in every engine."""
    return F.sum(dec(a) * dec(b)).cast("double").alias(alias)


# DuckDB twins route the final decimal→double conversion through
# VARCHAR: DuckDB's direct decimal→double computes int128 × 10^-scale in
# floating point and can land 1 ulp off at high scale (seen at scale 12),
# while decimal→string is exact and string→double is correctly rounded —
# matching Spark's BigDecimal.doubleValue(), which is correctly rounded.


def str_double(col: Column) -> Column:
    """String-routed decimal→double cast — THE exactness-critical
    conversion (both engines render the exact decimal then parse the
    double, so they round identically; a direct decimal→double cast
    may not). Every final division in the exact-moment queries goes
    through this."""
    return col.cast("string").cast("double")


def sql_exact_sum(col_expr: str, alias: str) -> str:
    """DuckDB twin of :func:`exact_sum`."""
    return (
        f"CAST(CAST(SUM(CAST({col_expr} AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"
        f" AS {alias}"
    )


def sql_exact_avg(col_expr: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({col_expr} AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)"
        f" / COUNT({col_expr}) AS {alias}"
    )


def sql_exact_sum_product(a: str, b: str, alias: str) -> str:
    """DuckDB twin of :func:`exact_sum_product`."""
    return (
        f"CAST(CAST(SUM(CAST({a} AS DECIMAL(18,6)) * CAST({b} AS DECIMAL(18,6)))"
        f" AS VARCHAR) AS DOUBLE) AS {alias}"
    )
