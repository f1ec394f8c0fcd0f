"""Registry-wide plan-recompute audit.

Counts source scans in every registered query's physical plan —
Catalyst does NOT dedup identical lazy subtrees across join arms, so a
query that references an expensive derived frame N times executes it N
times unless the frame is materialized (localCheckpoint/cache). This
audit is how q89's 32-scan wedge-close and q53's 16-scan verify
pipeline were found; tests/test_plans.py pins the fix with a global
cap.

Usage: python tools/audit_scans.py  (prints ranked counts at sf0.001)
"""

from __future__ import annotations

import os
import sys

# streaming sinks / eager iterative trainers / live database writers
# execute on construction or need a streaming context — plan text is
# not the interesting signal (q237 does a real Derby JDBC write just
# to build its frame)
SKIP_PREFIXES = ("q44", "q45", "q49_s", "q49b", "q88", "q237", "qe")


def scan_count(spark, df) -> int:
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    return plan.count("Scan parquet") + plan.count("Scan ExistingRDD")


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.session import get_spark

    spark = get_spark(app_name="audit-scans")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    rows = []
    for name, spec in all_queries().items():
        if name.startswith(SKIP_PREFIXES):
            continue
        rows.append((scan_count(spark, spec.fn(spark, sf)), name))
    for c, n in sorted(rows, reverse=True):
        print(c, n)


if __name__ == "__main__":
    main()
