"""Write-time data-quality gate: refuse to materialize a frame that
violates its declared expectations.

q152's DQ audit reports violations after the fact; production
pipelines also need the WRITE-side contract — the sink equivalent of
plans/guard.py's admission control: a batch that breaks an invariant
(null keys, out-of-range money, dangling foreign keys) must fail the
job loudly BEFORE it lands where downstream readers trust it.

The check pass and the write share one computation: expectations are
evaluated as conditional counts in a single aggregate over the frame
(one extra action, no extra shuffle — each check is a map-side
predicate), so the gate costs one scan, not one scan per rule. At
100 TB the same single-aggregate shape holds; for pipelines that
cannot afford any second pass, ride the counts on the write itself via
q244's Observation pattern and validate post-write before publishing
the partition (write-audit-publish).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class ExpectationError(RuntimeError):
    """Raised when a frame violates its write expectations."""


def check_expectations(
    df: DataFrame, checks: dict[str, Column]
) -> dict[str, int]:
    """Evaluate all expectations in ONE aggregate: each value is a
    boolean Column that must hold (evaluate to TRUE) per row — FALSE
    and NULL both violate; returns violation counts per check name."""
    if not checks:
        return {}
    # three-valued logic matters here: a NULL-evaluating condition is
    # NOT TRUE, so it must count as a violation — when(cond, 0)
    # .otherwise(1) sends both FALSE and NULL to 1, where the naive
    # when(~cond, 1) form would silently wave NULLs through (the exact
    # trap q257 pins)
    row = df.agg(
        *[
            F.sum(F.when(cond, 0).otherwise(1)).cast("long").alias(name)
            for name, cond in checks.items()
        ]
    ).collect()[0]
    return {name: row[name] or 0 for name in checks}


def write_checked(
    df: DataFrame,
    path: str,
    checks: dict[str, Column],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, int]:
    """Gate-then-write: evaluate ``checks`` (name -> per-row boolean
    Column), raise :class:`ExpectationError` naming every violated
    expectation and its count if any fail, otherwise write and return
    the (all-zero) violation report for the job log."""
    # Pin ONE materialization for both the check and the write: the
    # two actions otherwise recompute the frame independently, so a
    # non-deterministic expression (rand, current_timestamp, shuffling
    # UDx output) or a source mutated between the scans could land rows
    # the gate never saw. localCheckpoint truncates the lineage to the
    # materialized blocks; eager=True runs the single computation here.
    # At 100 TB the equivalent is staging to a temp location (or the
    # q244 write-audit-publish pattern) rather than executor memory —
    # the invariant is the same: check and write read ONE snapshot.
    pinned = df.localCheckpoint(eager=True)
    try:
        report = check_expectations(pinned, checks)
        violated = {k: v for k, v in report.items() if v}
        if violated:
            raise ExpectationError(
                f"refusing to write {path}: violated expectations {violated} "
                "(counts are rows failing the declared per-row condition)"
            )
        pinned.write.mode(mode).format(fmt).save(path)
    finally:
        pinned.unpersist()
    return report
