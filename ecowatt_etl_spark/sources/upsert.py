"""Keyed upsert (MERGE) into path-based parquet tables, plus SCD2.

The reference's only mutating sink is JDBC `to_sql(if_exists=
'replace'/'append')` (utils/datsetup.py:98-117) — whole-table replace
or blind append. A lake engine needs the third verb, MERGE: apply a
batch of keyed changes without rewriting the world and without
duplicate keys. Without a lakehouse table format (Delta/Iceberg, not in
this environment) the scalable primitive is DYNAMIC PARTITION
OVERWRITE: rewrite exactly the partitions the change batch touches,
leave every other partition's files untouched on disk.

Scale shape: the change batch is typically tiny relative to the table.
With a partition column, the target read is pruned to affected
partitions (partition filter from the batch's distinct values —
partition pruning, not a scan), the anti-join runs only over those
partitions, and the overwrite rewrites only them. Unpartitioned upsert
degenerates to a full-table rewrite and is documented as the
small-dimension path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _table_exists(path: str) -> bool:
    # path-based parquet table: exists iff the directory has content
    # (driver-side check; at scale this is a metastore lookup instead)
    return os.path.isdir(path) and any(
        not n.startswith(("_", ".")) for n in os.listdir(path)
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    newer_than: list[str] | None = None,
) -> None:
    """MERGE `updates` into the parquet table at `path` by `keys`:
    matched rows are replaced, unmatched rows inserted (upsert).

    With `newer_than` (ordering columns, e.g. ``["ts", "event_id"]``):
    a matched target row is replaced ONLY when the update row is
    strictly newer under the lexicographic struct ordering of those
    columns — ties and regressions keep the stored row. This makes the
    merge idempotent AND order-insensitive across change batches: a
    replayed or out-of-order batch carrying stale rows cannot regress
    latest-state (the CDC guard q149 relies on). Implemented as one
    per-key window over (pruned target ∪ updates) rather than a
    join-then-filter, so it stays a single shuffle of the affected
    partitions. Without `newer_than`: matched rows are replaced
    unconditionally (the original last-batch-wins contract).

    With `partition_col`: requires every key-match to stay inside its
    partition (the partition column must be FUNCTIONALLY DETERMINED by
    the keys — true for e.g. key-derived date/bucket partitions); reads
    only affected partitions (partition-pruned), merges, and rewrites
    only those via dynamic partition overwrite. Without it: full-table
    merge rewrite — the small-dimension path.

    The merged frame is localCheckpoint'ed before the overwrite:
    Spark refuses to overwrite a path that feeds the running plan, so
    the merge result must be materialized first (with a metastore +
    Delta/Iceberg this is the transaction log's job instead).
    """
    from pyspark.sql import Window as W

    dupes = (
        updates.groupBy(keys).count().filter(F.col("count") > 1).limit(1).count()
    )
    if dupes:
        raise ValueError(
            "updates batch has multiple rows per key — MERGE would persist "
            "duplicate keys; dedupe the batch first"
        )
    if not _table_exists(path):
        w = updates.write.mode("overwrite")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(path)
        return

    target = spark.read.parquet(path)
    if partition_col:
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        target = target.filter(F.col(partition_col).isin(parts))

    if newer_than:
        # stored rows win ties (_src 0 < 1): an update must be STRICTLY
        # newer to displace state
        union = target.withColumn("_src", F.lit(0)).unionByName(
            updates.select(target.columns).withColumn("_src", F.lit(1))
        )
        w = W.partitionBy(*keys).orderBy(
            F.desc(F.struct(*[F.col(c) for c in newer_than])), F.asc("_src")
        )
        merged = (
            union.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk", "_src")
            .localCheckpoint()
        )
    else:
        keep = target.join(updates.select(keys).distinct(), keys, "left_anti")
        merged = keep.unionByName(updates.select(keep.columns)).localCheckpoint()

    if partition_col:
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    else:
        merged.write.mode("overwrite").parquet(path)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    keys: list[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a change batch to a
    versioned dimension, returning the new dimension frame.

    `dim` carries history rows with [effective_col, end_col) validity
    (open rows have NULL end). The key's current open row is CLOSED at
    the key's EARLIEST change time; change rows become new versions
    chained by effective time (each closed by the key's next change,
    the last left open) — so a batch carrying several changes for one
    key yields a correct version chain, not duplicated history. One
    hash join on the keys against the per-key earliest-change frame
    (broadcast when small); closed history rows pass through untouched.
    """
    from pyspark.sql import Window as W

    end_type = dim.schema[end_col].dataType
    first_change = changes.groupBy(keys).agg(
        F.min(effective_col).alias("_new_from")
    )
    closed = (
        dim.join(first_change, keys, "left")
        .withColumn(
            end_col,
            F.when(
                F.col(end_col).isNull() & F.col("_new_from").isNotNull(),
                F.col("_new_from"),
            ).otherwise(F.col(end_col)),
        )
        .drop("_new_from")
    )
    chain_w = W.partitionBy(*keys).orderBy(effective_col)
    new_rows = changes.withColumn(
        end_col, F.lead(effective_col).over(chain_w).cast(end_type)
    )
    return closed.unionByName(new_rows.select(closed.columns))


def delete_keys(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
) -> None:
    """DELETE by key from the parquet table at `path`: every row whose
    key appears in `keys_df` is removed — the missing warehouse verb
    next to MERGE (merge_upsert) and SCD2 (scd2_apply), and the
    primitive behind right-to-erasure requests. Implemented as one
    LEFT ANTI join against the (small, broadcastable) key set and a
    rewrite; with `partition_col` the rewrite is partition-pruned via
    dynamic partition overwrite exactly like merge_upsert — only
    partitions that contained a deleted key are rewritten. The
    surviving frame is localCheckpoint'ed before the overwrite for
    the same self-read reason as merge_upsert. With a transactional
    table format the rewrite becomes a delete-file commit; the anti-
    join shape is identical."""
    target = spark.read.parquet(path)
    del_keys = keys_df.select(keys).distinct()
    if partition_col:
        parts = [
            r[0]
            for r in target.join(del_keys, keys, "left_semi")
            .select(partition_col)
            .distinct()
            .collect()
        ]
        scope = target.filter(F.col(partition_col).isin(parts))
        kept = scope.join(del_keys, keys, "left_anti").localCheckpoint()
        (
            kept.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    else:
        kept = target.join(del_keys, keys, "left_anti").localCheckpoint()
        kept.write.mode("overwrite").parquet(path)
