"""r12 verdict item 4: q155-family serving-session decomposition.

The exec sweep evicts session artifacts between q155/q285/q286 (their
name prefixes are different eviction families), so each sweep row pays
a FULL rebuild of centroids + cells + banded pairs — the sweep
deliberately measures fresh cost. This probe measures the other
operating point the r12 artifact change targets: one serving session,
q155 first (pays the build), then q285/q286 riding the session pair
artifact (_CELL_PAIRS_CACHE).

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf_x100 python tools/q155_family_probe_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf_x100")

    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.session import get_spark

    spark = get_spark(app_name="q155-family-r12")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    for name in (
        "q155_semantic_neardup",
        "q285_semantic_recall_audit",
        "q286_semantic_keep_list",
    ):
        spark.sparkContext.setJobDescription(f"family:{name}")
        t0 = time.perf_counter()
        rows = specs[name].fn(spark, sf_dir).collect()
        print(
            json.dumps(
                {"q": name, "sec": round(time.perf_counter() - t0, 2),
                 "rows": len(rows)}
            ),
            flush=True,
        )
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
