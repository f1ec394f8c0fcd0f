"""Skew stress for the salted-join/salted-agg path (r6 verdict item 7).

The 100x probe stressed LSH bucket skew but never the relational salt
path (operators/skew.py, q28). This tool builds a deliberately
zipfian join key over the events fact — ~half of all rows collapse
onto ONE hot key, the rest spread over ~20k cold keys — and measures
the same join/aggregation three ways at any scale:

  join_plain_aqe      sort-merge join, AQE skew-join ON (the session
                      default — Spark's own runtime mitigation)
  join_plain_noaqe    sort-merge join, AQE skew-join OFF (what a
                      static planner, or a shuffle AQE cannot split,
                      would do: the one-straggler-task shape)
  join_salted         operators/skew.py::salted_join, AQE skew-join
                      OFF — the manual mitigation under test

  agg_plain / agg_salted: the q28 two-stage aggregate vs the plain
  GROUP BY on the same hot key. Algebraic aggregates have map-side
  partial combine, so the expected ratio here is ~1.0 — recorded as
  the honest negative that says WHEN salting is pointless.

Broadcast is disabled for the join arms (autoBroadcastJoinThreshold
-1): a broadcastable dim is the trivial fix and would measure nothing.
Row counts are asserted identical across arms before times are
reported. Prints ONE JSON line; run per decade, record in SCALE.md:

  SKEW_SF=/tmp/sf_x100 python tools/skew_stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SKEW_SF", "/root/testdata/sf0.1")
N_SALTS = int(os.environ.get("SKEW_SALTS", "16"))
HOT_PCT = 50  # % of fact rows collapsed onto the single hot key
COLD_KEYS = 20_000


def main() -> None:
    from ecowatt_etl_spark.operators.skew import salted_count_sum, salted_join
    from ecowatt_etl_spark.session import get_spark
    from ecowatt_etl_spark.sources.tables import load_table

    spark = get_spark(app_name="skew-stress")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    # zipfian head: HOT_PCT% of rows -> key 0, tail spread over COLD_KEYS
    fact = ev.withColumn(
        "k",
        F.when(
            F.pmod(F.hash("event_id"), 100) < HOT_PCT, F.lit(0).cast("int")
        ).otherwise(F.pmod(F.hash("user_id"), F.lit(COLD_KEYS)) + 1),
    ).localCheckpoint()  # pin ONE materialization so arms time the join, not the scan
    dim = (
        spark.range(COLD_KEYS + 1)
        .select(
            F.col("id").cast("int").alias("k"),
            F.md5(F.col("id").cast("string")).alias("attr"),
        )
        .localCheckpoint()
    )
    n_fact = fact.count()
    hot_frac = round(fact.filter(F.col("k") == 0).count() / n_fact, 4)

    def timed(fn) -> tuple[float, int]:
        t0 = time.monotonic()
        n = fn()
        return round(time.monotonic() - t0, 2), n

    def join_plain() -> int:
        j = fact.hint("merge").join(dim, "k")
        return j.agg(
            F.count("*").alias("n"), F.sum(F.length("attr")).alias("s")
        ).collect()[0]["n"]

    def join_salted() -> int:
        j = salted_join(fact, dim, "k", n_salts=N_SALTS)
        return j.agg(
            F.count("*").alias("n"), F.sum(F.length("attr")).alias("s")
        ).collect()[0]["n"]

    results: dict[str, float] = {}
    conf = spark.conf
    old_bcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_skew = conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        t, n1 = timed(join_plain)
        results["join_plain_aqe_s"] = t

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        t, n2 = timed(join_plain)
        results["join_plain_noaqe_s"] = t

        t, n3 = timed(join_salted)
        results["join_salted_noaqe_s"] = t
        assert n1 == n2 == n3 == n_fact, (n1, n2, n3, n_fact)
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)
        conf.set("spark.sql.adaptive.skewJoin.enabled", old_skew)

    # q28-style aggregate: map-side combine should absorb the hot key
    t, _ = timed(
        lambda: len(
            fact.groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .collect()
        )
    )
    results["agg_plain_s"] = t
    t, _ = timed(
        lambda: len(salted_count_sum(fact, ["k"], "value").collect())
    )
    results["agg_salted_s"] = t

    print(
        json.dumps(
            {
                "sf_dir": SF,
                "n_fact": n_fact,
                "hot_key_frac": hot_frac,
                "n_salts": N_SALTS,
                **results,
                "salted_vs_unsalted_join": round(
                    results["join_plain_noaqe_s"]
                    / results["join_salted_noaqe_s"],
                    2,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
