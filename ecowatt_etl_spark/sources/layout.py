"""Storage-layout maintenance: compaction and sort-ordered writes.

Two jobs a 100 TB lake runs nightly that the query engine itself never
shows you:

- **Small-file compaction.** Streaming sinks and frequent small batches
  leave thousands of KB-scale files per partition; every reader then
  pays a task per file (the under-parallelism cousin of
  operators/dedup.fan_out, at the storage layer instead of the scan).
  Compaction rewrites a directory into ~target-sized files.

- **Range-sorted layout.** Parquet footers carry per-column min/max; a
  scan can skip whole files only if the write CLUSTERED the key — a
  range-partitioned, sorted write gives every file a disjoint key range
  so point/range predicates prune to O(1) files (the poor man's
  Z-order, exact for a single key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite the parquet directory at `path` into ceil(bytes/target)
    files (at least one). Returns the file count written. Uses a
    staging read + localCheckpoint so the overwrite does not race the
    scan feeding it (same constraint as sources/upsert.py). Row order
    within the compacted files is not preserved — pair with
    write_range_sorted when footer pruning matters."""
    import math
    import os

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    df.repartition(n).localCheckpoint().write.mode("overwrite").parquet(path)
    return n


def write_range_sorted(df: DataFrame, path: str, key: str, n_files: int) -> None:
    """Range-partition by `key` into n_files files, sorted within each:
    every output file covers a disjoint key range, so parquet footer
    min/max stats let a key predicate skip all but one file. At scale
    n_files follows data volume; the sort cost is one range shuffle."""
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )
