"""r12 optimization probe: per-query noop-sink timing + formatted plans.

For each named query (default: the bench HEADLINE list) this runs, on
the engine session at $SPARK_GRAFT_SF_DIR (default sf0.1):

  * noop-sink timing, median of N reps (guide §1.4 — computes every
    column of every row, no sink cost, no Catalyst count-pruning), and
  * collect timing, median of N reps (the bench's end-to-end number),

labels each job (guide §1.5) and optionally dumps
``explain("formatted")`` to plans/r12/<name>_<tag>.txt so plan-shape
claims in OPTIMIZATION_r12.md are checkable offline.

Usage:
  python tools/opt_probe_r12.py [--plans TAG] [--reps N] [name ...]

Output: one JSON line per query on stdout:
  {"q": name, "noop_s": median, "collect_s": median, "noop_all": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    tag = None
    reps = 3
    if "--plans" in args:
        i = args.index("--plans")
        tag = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.session import get_spark

    spark = get_spark(app_name="opt-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    names = args or [n for n in HEADLINE if n in specs]

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    if tag:
        os.makedirs(plans_dir, exist_ok=True)

    # warm-up: JIT + parquet footer cache + session artifacts for the
    # first family, mirroring bench.py's untimed warm-up
    specs[names[0]].fn(spark, sf_dir).collect()

    for name in names:
        fn = specs[name].fn
        if tag:
            df = fn(spark, sf_dir)
            with open(
                os.path.join(plans_dir, f"{name}_{tag}.txt"), "w", encoding="utf-8"
            ) as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
        noop, coll = [], []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"collect:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            coll.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        noop.sort()
        coll.sort()
        print(
            json.dumps(
                {
                    "q": name,
                    "noop_s": round(noop[len(noop) // 2], 4),
                    "collect_s": round(coll[len(coll) // 2], 4),
                    "noop_all": [round(x, 4) for x in noop],
                    "collect_all": [round(x, 4) for x in coll],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
