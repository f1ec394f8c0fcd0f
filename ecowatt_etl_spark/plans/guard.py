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
    """The formatted physical plan string the guard inspects.

    Classic sessions read it through the JVM handle; Spark Connect
    DataFrames have no ``_jdf``, so the fallback captures
    ``df.explain('formatted')`` — same text, transport-agnostic, which
    is what lets the guard run inside the notebook gateways and
    scheduled jobs the module docstring describes."""
    try:
        spark = df.sparkSession
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def _shape_count(plan: str, shape: str) -> int:
    """Occurrences of a node, counted once each via the formatted
    plan's details section ("(id) Shape" lines) — tree lines carry
    modifiers between the name and the id ("BroadcastNestedLoopJoin
    Cross BuildRight (5)") and would need fragile parsing. Falls back
    to a bare substring test for plan texts without a details section
    (simple-mode strings)."""
    import re

    n = len(re.findall(rf"^\(\d+\) {re.escape(shape)}\b", plan, re.M))
    if n == 0 and shape in plan:
        # plan text without a details section (simple-mode string or a
        # changed layout): count the node at TREE positions only (line
        # start or after tree-drawing prefixes like "+-"/":-"/"*"), so
        # one legitimately-waived occurrence under a {shape: 1} cap
        # doesn't spuriously fail from detail echoes of the same node.
        # Simple-mode codegen annotations put "*(2) " between the tree
        # prefix and the name — permit it, else a mixed plan where one
        # occurrence is codegen-wrapped UNDERSTATES and a capped
        # waiver silently absorbs the uncounted site (r5 ADVICE).
        n = len(
            re.findall(
                rf"^[\s+:|*-]*(?:\*\(\d+\)\s+)?{re.escape(shape)}\b",
                plan,
                re.M,
            )
        )
        if n == 0:
            # the node appears only mid-line (an unrecognized layout):
            # fall back to the raw substring count, which OVERSTATES
            # but never understates — caps stay conservative
            return plan.count(shape)
    return n


def assert_scalable(
    df: DataFrame, allow: Iterable[str] | dict[str, int] = ()
) -> DataFrame:
    """Raise :class:`PlanGuardError` if ``df``'s physical plan contains
    a banned shape not explicitly allowed; return ``df`` unchanged so
    the guard chains into pipelines:

        assert_scalable(build_report(spark)).write.parquet(out)

    ``allow`` waives shapes the caller has ARGUED are safe here — the
    argument belongs in a comment next to the call site. Pass a dict
    ``{shape: max_occurrences}`` to cap the waiver at the number of
    justified sites (e.g. ``{"BroadcastNestedLoopJoin": 1}`` for one
    1-row stats-frame join): a SECOND occurrence appearing later —
    say a lost equi-key turning another join nested-loop — still
    fails. A plain set/iterable waives the shape entirely."""
    caps = (
        dict(allow)
        if isinstance(allow, dict)
        else {s: None for s in allow}  # None = unlimited
    )
    plan = physical_plan(df)
    hits = []
    for shape in BANNED:
        n = _shape_count(plan, shape)
        cap = caps.get(shape, 0)
        if n and cap is not None and n > cap:
            hits.append(f"{shape} x{n} (allowed {cap})")
    if hits:
        raise PlanGuardError(
            f"plan contains banned shape(s) {hits}; either fix the query "
            "(lost equi-join key? row-wise UDF?) or pass allow={...} with "
            "a written justification at the call site"
        )
    return df
