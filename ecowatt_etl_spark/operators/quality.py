"""Free-rider data-quality metrics via ``DataFrame.observe``.

The reference validates its pipeline with driver-side spot checks —
``print(df.shape)`` / ``nunique`` comparisons after each stage
(reference main.py:392-433). The Spark-native equivalent is
``observe()``: named aggregate expressions attached to a plan that are
computed DURING whatever action consumes the frame — zero extra jobs,
zero extra scans, exactly-once semantics per action. At 100 TB that
difference is the whole feature: a separate ``df.count()`` validation
pass would re-read the input; an observation rides the write.

``expect`` turns the collected metrics into a hard gate: predicates
over the metric row that raise (with every metric in the message) when
violated — the load step of an ETL can refuse to publish a table whose
row count collapsed or whose join sprouted nulls, at the cost of
reading the metrics map the action already produced.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    name: str = "quality",
    null_cols: list[str] | None = None,
    extra: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach standard quality metrics to ``df``: total row count plus a
    null count per column in ``null_cols`` (default: every column), and
    any caller-supplied named aggregates in ``extra``.

    Returns the instrumented frame and the Observation; read
    ``observation.get`` AFTER an action has run on the returned frame.
    Metrics are computed by the same tasks that execute the action —
    map-side partials merged on the driver, no second pass."""
    cols = null_cols if null_cols is not None else df.columns
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    for alias, expr in (extra or {}).items():
        metrics.append(expr.alias(alias))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def expect(
    obs: Observation, **predicates: Callable[[object], bool]
) -> dict[str, object]:
    """Validate collected observation metrics: each keyword names a
    metric and maps to a predicate over its value. Raises ValueError
    naming every failed expectation (with the full metric row for
    diagnosis); returns the metrics dict when all pass.

    Call only after the observed frame's action completed —
    ``Observation.get`` blocks until the metrics exist."""
    metrics = obs.get
    failed = [
        f"{k}={metrics.get(k)!r}"
        for k, pred in predicates.items()
        if k not in metrics or not pred(metrics[k])
    ]
    if failed:
        raise ValueError(
            f"data-quality expectations failed: {', '.join(failed)}; "
            f"all metrics: {metrics}"
        )
    return metrics
