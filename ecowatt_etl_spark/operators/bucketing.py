"""Bucketed-table writes for exchange-free co-located joins.

The reference's fact-fact merges (`main.py:171-202` full-outer joins,
`main.py:240-349` fact builds joining back to dims) re-shuffle both
sides on every run because pandas has no persisted partitioning. At
100 TB the dominant cost of any fact ⋈ fact query IS that shuffle:
both sides move over the network every time the join runs.

Bucketing fixes the economics: pay the shuffle ONCE at write time
(`bucketBy(n, key)` hash-partitions rows into a fixed bucket layout
recorded in the catalog), and every subsequent equi-join or
aggregation on the bucket key reads co-located buckets with NO
Exchange — Spark's planner sees matching `HashPartitioning` on both
scans and elides the shuffle entirely. `sortBy` within buckets
additionally lets sort-merge joins skip their per-task sorts when each
bucket is a single file.

Scale notes:
- bucket count is a capacity decision fixed at write time: size it so
  one bucket ≈ one task's worth of data at the TARGET scale (e.g.
  100 TB / 1000 buckets = 100 GB splits read by many tasks is wrong —
  use O(10k) buckets so a bucket fits an executor's working set).
- both join sides must agree on bucket count (or be multiples, with
  `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
- `repartition(n, key)` before the write aligns shuffle partitions
  with buckets one-to-one (same Murmur3 hash), yielding exactly one
  file per bucket — required for the scan to report sorted output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Scratch warehouse inside the repo (driver cwd varies; keep all side
# effects under /root/repo). Gitignored.
BUCKET_ROOT = "/root/repo/.bucketed_cache"


def bucket_token(sf_dir: str) -> str:
    """Stable identifier for a testdata dir, usable in table names."""
    return re.sub(r"[^0-9A-Za-z]+", "_", sf_dir.strip("/"))


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, path: str
) -> DataFrame:
    """Persist ``df`` as a parquet table bucketed (and sorted) by
    ``key``; returns the catalog-backed frame whose scans carry the
    bucket partitioning."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
    return spark.table(table)
