"""r12: decompose q192's remaining cost at scale (verdict item 6).

After the r12 round-2 change (train arm skips per-doc array_distinct,
size-gated eval broadcast) the 100x row is ~73 s (was 93.6). Arms,
noop-sunk, interleaved, all on the TRAIN side (the corpus-sized arm):

  t_tok:   scan + tokenize (array build) only
  t_zip:   + the arrays_zip gram-array build (struct grams)
  t_expl:  + explode
  t_semi:  + broadcast semi-join vs eval gram set + distinct (hit_set)
  v_tf:    gram array via transform(sequence, i -> struct(t[i]..)) --
           element_at construction instead of slice+zip
  v_tfex:  v_tf + explode

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf_x100 python tools/q192_probe_r12.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf_x100")

    from ecowatt_etl_spark.operators.text import tokens
    from ecowatt_etl_spark.queries.curation_queries import _EVAL_SRC, _OVL_N
    from ecowatt_etl_spark.session import get_spark
    from ecowatt_etl_spark.sources.tables import load_table

    spark = get_spark(app_name="q192-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    n = F.size(t)
    zipped = F.arrays_zip(
        *[F.slice(t, 1 + k, n - (_OVL_N - 1)) for k in range(_OVL_N)]
    )
    short = F.arrays_zip(
        F.array(F.concat_ws(" ", t)),
        *[F.array(F.lit("")) for _ in range(_OVL_N - 1)],
    )
    grams = F.when(n >= _OVL_N, zipped).otherwise(short)

    fields = ", ".join(
        f"element_at(tk, i + {k}) AS `{k}`" for k in range(_OVL_N)
    )
    tf = F.expr(
        f"CASE WHEN size(tk) >= {_OVL_N} THEN "
        f"transform(sequence(1, size(tk) - {_OVL_N - 1}),"
        f" i -> struct({fields})) "
        "ELSE array(struct(concat_ws(' ', tk) AS `0`"
        + "".join(f", '' AS `{k}`" for k in range(1, _OVL_N))
        + ")) END"
    )

    train = d.filter(F.col("source") != _EVAL_SRC)
    ev_set = (
        d.filter(F.col("source") == _EVAL_SRC)
        .select(F.explode(F.array_distinct(grams)).alias("gh"))
        .distinct()
    )
    cases = [
        ("t_tok", train.select(t.alias("tk"))),
        ("t_zip", train.select(grams.alias("ga"))),
        ("t_expl", train.select(F.explode(grams).alias("gh"))),
        (
            "t_semi",
            train.select(F.explode(grams).alias("gh"))
            .join(F.broadcast(ev_set), "gh", "left_semi")
            .distinct(),
        ),
        ("v_tf", train.select(t.alias("tk")).select(tf.alias("ga"))),
        (
            "v_tfex",
            train.select(t.alias("tk")).select(F.explode(tf).alias("gh")),
        ),
    ]
    train.select("doc_id").write.format("noop").mode("overwrite").save()
    for rep in range(reps):
        for name, df in cases:
            spark.sparkContext.setJobDescription(f"q192probe:{name}")
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
