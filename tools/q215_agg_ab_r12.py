"""r12: q215 aggregate-arm A/B — decimal multiply per row vs long
multiply with the decimal cast only at the sum.

The probe (tools/q215_probe_r12.py) put the md5 draw at ~125 s of the
152 s total; the aggregate machinery is the remaining ~27 s. w*pm fits
long exactly (w <= 7, pm < 6.6e11 => product < 4.7e12), so the
per-row decimal multiply can become a long multiply with the
exactness-preserving decimal cast moved to the SUM input. Values are
bit-identical; only the per-row arithmetic changes.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf_x100 python tools/q215_agg_ab_r12.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf_x100")

    from ecowatt_etl_spark.queries.analytics_queries import (
        _BOOT_B,
        _BOOT_T,
        _DEC_Y,
    )
    from ecowatt_etl_spark.session import get_spark
    from ecowatt_etl_spark.sources.tables import load_table

    spark = get_spark(app_name="q215-agg-ab-r12")
    spark.sparkContext.setLogLevel("ERROR")

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice").cast(_DEC_Y) * 1_000_000)
        .cast("long")
        .alias("pm"),
    )
    u = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.col("b").cast("string"), F.col("k").cast("string")
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("long")
    w = F.when(u < _BOOT_T[0], 0)
    for kk, t in enumerate(_BOOT_T[1:], start=1):
        w = w.when(u < t, kk)
    w = w.otherwise(len(_BOOT_T))
    ex = o.select(
        "k", "pm", F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b")
    ).select("b", "pm", w.alias("w"))

    cur = ex.groupBy("b").agg(
        F.sum(F.col("w").cast("decimal(38,0)") * F.col("pm"))
        .cast("decimal(38,0)")
        .alias("s"),
        F.sum("w").cast("long").alias("n"),
    )
    new = ex.groupBy("b").agg(
        F.sum((F.col("w") * F.col("pm")).cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("s"),
        F.sum("w").cast("long").alias("n"),
    )
    a = {tuple(r) for r in cur.collect()}
    bvals = {tuple(r) for r in new.collect()}
    print(json.dumps({"rows_equal": a == bvals}), flush=True)
    for rep in range(reps):
        for name, df in (("dec_mul", cur), ("long_mul", new)):
            spark.sparkContext.setJobDescription(f"q215agg:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(
                json.dumps(
                    {"arm": name, "rep": rep,
                     "sec": round(time.perf_counter() - t0, 2)}
                ),
                flush=True,
            )
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
