"""Per-decade LSH cap probe (r7 verdict item 1 follow-through).

For each warehouse dir given on argv (default: sf0.1 and the /tmp
synthetic 10x/100x decades from tools/scale_datagen.py), measure IN A
FRESH PROCESS (the r7 lesson: in-session artifact pressure skews
decade timings):

* the resolved corpus-scaled cap and the drop fractions
  (operators/dedup.py::lsh_cap_drop_stats) — the r8 scaling claims a
  ~flat curve; this is the artifact that proves or refutes it;
* the CAPPED index's candidate volume, Σ n·(n−1)/2 over surviving
  buckets — the banded join's actual work, the quantity the old fixed
  cap existed to bound; publishing it alongside the drop curve makes
  the recall/cost trade visible in both directions;
* q53 wall-clock (live verify pipeline over the index) and pair count;
* q219's recall-per-decile table and wall-clock.

Prints one JSON line per dir. Usage:
  python tools/lsh_cap_probe.py [dir ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_DEFAULT_DIRS = ["/root/testdata/sf0.1", "/tmp/sf_x10", "/tmp/sf_x100"]


def probe(sf_dir: str) -> dict:
    sys.path.insert(0, _REPO)
    from pyspark.sql import functions as F

    from ecowatt_etl_spark.operators.dedup import (
        lsh_cap_drop_stats,
        minhash_from_hashes,
    )
    from ecowatt_etl_spark.queries.dedup_queries import shingle_index
    from ecowatt_etl_spark.queries.registry import all_queries
    from ecowatt_etl_spark.session import get_spark

    spark = get_spark(app_name="lsh-cap-probe")
    specs = all_queries()
    out: dict = {"dir": sf_dir}

    e, bands = shingle_index(spark, sf_dir)
    out["docs"] = e.select("doc_id").distinct().count()
    out.update(lsh_cap_drop_stats(minhash_from_hashes(e)))

    # candidate volume of the CAPPED index: Σ n(n-1)/2 over buckets
    sizes = bands.groupBy("band", "k1", "k2").agg(F.count("*").alias("n"))
    row = sizes.agg(
        F.sum(F.expr("n * (n - 1) DIV 2")).alias("cand_pairs"),
        F.max("n").alias("max_bucket"),
        F.count("*").alias("buckets"),
    ).collect()[0]
    out["cand_pairs"] = int(row["cand_pairs"] or 0)
    out["max_bucket"] = int(row["max_bucket"] or 0)
    out["buckets"] = int(row["buckets"] or 0)

    t0 = time.monotonic()
    out["q53_pairs"] = specs["q53_minhash_lsh_pairs"].fn(spark, sf_dir).count()
    out["q53_s"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    rec = specs["q219_lsh_recall_audit"].fn(spark, sf_dir).collect()
    out["q219_s"] = round(time.monotonic() - t0, 2)
    out["q219_recall"] = {
        str(r["sim_decile"]): [r["n_truth"], r["n_found"], r["recall_bp"]]
        for r in rec
    }
    return out


def main() -> None:
    if os.environ.get("_LSH_PROBE_DIR"):
        print(json.dumps(probe(os.environ["_LSH_PROBE_DIR"])))
        return
    dirs = sys.argv[1:] or [d for d in _DEFAULT_DIRS if os.path.isdir(d)]
    for d in dirs:
        env = dict(os.environ, _LSH_PROBE_DIR=d)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        print(line[-1] if line else json.dumps(
            {"dir": d, "error": proc.stderr[-500:]}
        ))


if __name__ == "__main__":
    main()
