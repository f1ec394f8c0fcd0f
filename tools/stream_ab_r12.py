"""r12 verdict item 7: interleaved A/B of streaming state-partition
sizing on the non-TWS stateful replays (q133 EWMA, q252 clamped
balance) at 100x.

q277's r11 fix (state partitions = max(8, defaultParallelism)) was
validated for the TWS path only; the r11 invariant note says the
default 8 wins at GATE scale for the applyInPandasWithState streams.
This measures whether that still holds at 100x before accepting the
82.6/117.9 s sweep rows as protocol floors.

Usage: SPARK_GRAFT_SF_DIR=/tmp/sf_x100 python tools/stream_ab_r12.py [reps]
Output: one JSON line per (query, partitions, rep) with wall seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf_x100")

    from ecowatt_etl_spark.session import get_spark
    from ecowatt_etl_spark.streaming.events_stream import (
        read_events_stream,
        run_to_completion,
        stateful_clamped_balance,
        stateful_ewma,
    )

    spark = get_spark(app_name="stream-ab-r12")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    def q133(p: int):
        agg = stateful_ewma(read_events_stream(spark, sf_dir))
        return run_to_completion(
            agg, f"ab_q133_p{p}", output_mode="update", shuffle_partitions=p
        )

    def q252(p: int):
        agg = stateful_clamped_balance(read_events_stream(spark, sf_dir))
        return run_to_completion(
            agg, f"ab_q252_p{p}", output_mode="update", shuffle_partitions=p
        )

    cases = [("q133", q133), ("q252", q252)]
    parts = [8, max(8, par)]
    # warm-up: one untimed pass so parquet footers/JIT don't charge arm 1
    for name, fn in cases:
        fn(8).limit(1).collect()

    for rep in range(reps):
        for name, fn in cases:
            for p in parts:
                t0 = time.perf_counter()
                out = fn(p)
                n = out.count()
                dt = time.perf_counter() - t0
                print(
                    json.dumps(
                        {"q": name, "partitions": p, "rep": rep,
                         "sec": round(dt, 2), "rows": n}
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
