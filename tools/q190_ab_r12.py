"""r12: interleaved A/B of q190's JVM pre-reduce vs the r11 per-item
cogroup at 100x.

The filtered after-sweep put the new shape at 52.9 s vs the r11
full-sweep row's 45.4 s — but the new row ran FIRST in a cold JVM
(exec_sweep has no warm-up; the r11 row ran mid-session). This probe
interleaves both shapes in one warmed session so the code effect is
attributable (the r11 A/B protocol).

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf_x100 python tools/q190_ab_r12.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf_x100")

    from ecowatt_etl_spark.queries.analytics_queries import (
        q190_cogroup_order_audit,
    )
    from ecowatt_etl_spark.session import get_spark
    from ecowatt_etl_spark.sources.tables import load_table

    spark = get_spark(app_name="q190-ab-r12")
    spark.sparkContext.setLogLevel("ERROR")

    def old_shape():
        o = load_table(spark, sf_dir, "orders").select(
            F.expr("o_orderkey DIV 256").alias("bucket"),
            "o_orderkey",
            "o_orderstatus",
            (F.col("o_totalprice").cast("decimal(18,6)") * 1_000_000)
            .cast("bigint")
            .alias("total_us"),
        )
        li = load_table(spark, sf_dir, "lineitem").select(
            F.expr("l_orderkey DIV 256").alias("bucket"),
            "l_orderkey",
            F.expr(
                "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,6))"
                " * CAST((1 - l_discount) AS DECIMAL(18,6))"
                " * 1000000000000 AS DECIMAL(38,0)) DIV 1000000 AS BIGINT)"
            ).alias("item_us"),
        )

        def audit(key, odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
            items = (
                ldf.groupby("l_orderkey", as_index=False)["item_us"]
                .sum()
                .rename(
                    columns={"l_orderkey": "o_orderkey", "item_us": "items_us"}
                )
            )
            m = odf.merge(items, on="o_orderkey", how="left")
            itemless = m["items_us"].isna()
            out = pd.DataFrame(
                {
                    "o_orderstatus": m["o_orderstatus"],
                    "kind": "matched",
                    "delta_us": 0,
                }
            )
            out.loc[itemless, "kind"] = "itemless"
            mism = ~itemless & (m["items_us"] != m["total_us"])
            out.loc[mism, "kind"] = "mismatched"
            delta = (m["items_us"] - m["total_us"]).abs()
            out.loc[mism, "delta_us"] = delta[mism].astype("int64")
            return out

        verdicts = (
            o.groupBy("bucket")
            .cogroup(li.groupBy("bucket"))
            .applyInPandas(
                audit, "o_orderstatus string, kind string, delta_us long"
            )
        )
        return verdicts.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("kind") == "itemless", 1).otherwise(0))
            .cast("long")
            .alias("n_itemless"),
            F.sum(F.when(F.col("kind") == "mismatched", 1).otherwise(0))
            .cast("long")
            .alias("n_mismatched"),
            F.max(
                F.when(F.col("kind") != "itemless", F.col("delta_us")).otherwise(0)
            )
            .cast("long")
            .alias("max_abs_delta_us"),
        )

    cases = [
        ("old_per_item", old_shape),
        ("new_prereduce", lambda: q190_cogroup_order_audit(spark, sf_dir)),
    ]
    # warm-up (untimed): JIT, parquet footers, Python workers
    for _, fn in cases:
        fn().collect()
    base = sorted(old_shape().collect())
    new = sorted(q190_cogroup_order_audit(spark, sf_dir).collect())
    print(json.dumps({"rows_equal": base == new}), flush=True)
    for rep in range(reps):
        for name, fn in cases:
            spark.sparkContext.setJobDescription(f"q190ab:{name}")
            t0 = time.perf_counter()
            fn().collect()
            dt = time.perf_counter() - t0
            print(
                json.dumps({"arm": name, "rep": rep, "sec": round(dt, 2)}),
                flush=True,
            )
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
