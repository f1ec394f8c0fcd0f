"""Incremental aggregate maintenance — mergeable rollup state.

At 100 TB you do not recompute yesterday's rollup because today's
partition arrived: you keep the aggregate's PARTIAL STATE (the same
algebra Spark's own two-phase hash aggregation and streaming state
use) and fold new batches in. Every aggregate kept here is
commutative-monoid state:

    count → merge by SUM     sum → merge by SUM
    min   → merge by MIN     max → merge by MAX
    avg   → carried as (sum, count), finalized on read

so `rollup(base ∪ delta) == merge(rollup(base), rollup(delta))` holds
exactly — the property the tests and the q29 oracle check. Merging
shuffles only |group keys| rows per batch, never the base data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure -> (state builder over raw rows, state merger over states)
_ALGEBRA = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def rollup_state(df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]) -> DataFrame:
    """Build mergeable rollup state from raw rows.

    measures: output column -> (kind, input column), kind in
    count/sum/min/max. Raising on unknown kinds keeps non-mergeable
    aggregates (median, distinct count) out — those need sketch state
    (q09b/q25b/q77), not this exact algebra.
    """
    aggs = []
    for out, (kind, col) in measures.items():
        if kind not in _ALGEBRA:
            raise ValueError(f"non-mergeable aggregate kind {kind!r}")
        aggs.append(_ALGEBRA[kind][0](col).alias(out))
    return df.groupBy(keys).agg(*aggs)


def merge_rollup(
    prev: DataFrame, delta: DataFrame, keys: list[str], measures: dict[str, tuple[str, str]]
) -> DataFrame:
    """Fold a delta batch's state into the previous state: union the
    two state frames and re-reduce with each measure's MERGE operator.
    Cost: one shuffle of |groups in prev| + |groups in delta| state
    rows — independent of how many raw rows built `prev`.
    """
    aggs = [
        _ALGEBRA[kind][1](out).alias(out) for out, (kind, _) in measures.items()
    ]
    return prev.unionByName(delta).groupBy(keys).agg(*aggs)
