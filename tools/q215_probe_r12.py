"""r12: decompose q215_bootstrap_ci's cost at scale (guide SS1).

The 100x row is 188 s; the md5 draw is the query's replayable
randomness and cannot change, but WHERE the time goes (md5+conv
evaluation vs the exploded-row aggregate machinery) was never
measured. Arms, each noop-sunk (guide SS1.4), interleaved:

  a_u:    scan + x100 explode + the md5/conv draw only
  a_w:    + the CASE threshold weight
  a_agg:  + groupBy(b) decimal/long sums            (current shape)
  a_arr:  NO explode - per-order weight ARRAY (same 100 md5 draws via
          transform) into ONE single-group aggregate with 200 slots
          (sum of ws[b]*pm as decimal, sum of ws[b] as long)

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf_x100 python tools/q215_probe_r12.py [reps]
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

    spark = get_spark(app_name="q215-probe-r12")
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

    ex = o.select("k", "pm", F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b"))

    # arm d: per-order weight array, one single-group aggregate
    u_sql = (
        "CAST(conv(substring(md5(concat(CAST(b AS STRING), '|', ks)), 1, 13),"
        " 16, 10) AS BIGINT)"
    )
    arms_sql = " ".join(f"WHEN u < {t} THEN {kk}" for kk, t in enumerate(_BOOT_T))
    ws = F.expr(
        f"transform(sequence(0, {_BOOT_B - 1}),"
        f" b -> CASE {arms_sql} ELSE {len(_BOOT_T)} END)"
        .replace("WHEN u <", f"WHEN {u_sql} <")
    )
    oa = o.select("pm", F.col("k").cast("string").alias("ks")).select(
        "pm", ws.alias("ws")
    )
    aggs = []
    for b in range(_BOOT_B):
        e = F.element_at(F.col("ws"), b + 1)
        aggs.append(
            F.sum(e.cast("decimal(38,0)") * F.col("pm")).alias(f"s{b}")
        )
        aggs.append(F.sum(e).cast("long").alias(f"n{b}"))
    arr_agg = oa.agg(*aggs)

    cases = [
        ("a_u", ex.select(u.alias("u"))),
        ("a_w", ex.select("pm", w.alias("w"))),
        (
            "a_agg",
            ex.select("b", "pm", w.alias("w"))
            .groupBy("b")
            .agg(
                F.sum(F.col("w").cast("decimal(38,0)") * F.col("pm"))
                .cast("decimal(38,0)")
                .alias("s"),
                F.sum("w").cast("long").alias("n"),
            ),
        ),
        ("a_arr", arr_agg),
    ]
    # warm-up
    o.write.format("noop").mode("overwrite").save()
    for rep in range(reps):
        for name, df in cases:
            spark.sparkContext.setJobDescription(f"q215probe:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            print(
                json.dumps({"arm": name, "rep": rep, "sec": round(dt, 2)}),
                flush=True,
            )
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
