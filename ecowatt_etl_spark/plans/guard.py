"""Plan admission control: refuse to EXECUTE a plan that could not
survive production scale.

tests/test_plans.py pins the shapes of known queries offline; this
guard is the RUNTIME form of the same contract for ad-hoc work — the
check a scheduled job or a notebook gateway runs on `df` before
`collect()`/`write`, so a query that silently degraded (a lost equi
condition turning a join cartesian, a UDF blocking codegen) fails
loudly at submit time instead of burning a cluster.

The banned shapes and why:

- ``CartesianProduct`` — O(|L|x|R|) row pairing; never survives two
  large inputs.
- ``BroadcastNestedLoopJoin`` — per-row predicate scan of the
  broadcast side; legitimate ONLY when one side is provably tiny (the
  engine's 1-row stats frames, bounded query matrices), which callers
  assert explicitly via ``allow``.
- ``BatchEvalPython`` — row-at-a-time Python UDF; banned engine-wide
  (Arrow-batched paths show as ArrowEvalPython / mapInPandas and are
  allowed).

The guard inspects the ANALYZED physical plan without executing it.
AQE may later improve a plan (e.g. sort-merge -> broadcast) but never
introduces a banned shape that the static plan lacked, so a pass here
is conservative in the right direction.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame

BANNED: tuple[str, ...] = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BatchEvalPython",
)


class PlanGuardError(RuntimeError):
    """Raised when a plan contains a banned physical shape."""


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan string the guard inspects."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def assert_scalable(df: DataFrame, allow: Iterable[str] = ()) -> DataFrame:
    """Raise :class:`PlanGuardError` if ``df``'s physical plan contains
    a banned shape not explicitly allowed; return ``df`` unchanged so
    the guard chains into pipelines:

        assert_scalable(build_report(spark)).write.parquet(out)

    ``allow`` lists shapes the caller has ARGUED are safe here (e.g.
    ``{"BroadcastNestedLoopJoin"}`` for a 1-row broadcast frame) — the
    argument belongs in a comment next to the call site."""
    allowed = set(allow)
    plan = physical_plan(df)
    hits = [b for b in BANNED if b not in allowed and b in plan]
    if hits:
        raise PlanGuardError(
            f"plan contains banned shape(s) {hits}; either fix the query "
            "(lost equi-join key? row-wise UDF?) or pass allow={...} with "
            "a written justification at the call site"
        )
    return df
