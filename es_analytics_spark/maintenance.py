"""Lake maintenance jobs.

The reference's 200k-records-per-object flush target
(Collector.ts:178) is an anti-small-files heuristic; at lake scale the
engine needs explicit compaction (SURVEY.md §4 "small-file
compaction"): rewrite a partitioned table so files approach a target
size, preserving partition columns. Plain DataFrame rewrite — no
custom rules; Catalyst + maxRecordsPerFile do the sizing.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def table_stats(spark: SparkSession, path: str) -> dict:
    files = []
    for root, _dirs, names in os.walk(path):
        files.extend(
            os.path.join(root, n) for n in names if n.endswith(".parquet")
        )
    sizes = [os.path.getsize(f) for f in files]
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
    }


def compact(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``path`` in place with files sized toward
    ``target_file_bytes``. Returns before/after stats.

    Strategy: read, estimate rows/file from current bytes-per-row,
    write with maxRecordsPerFile + one shuffle-free coalesce pass to a
    staging dir, then atomically swap. On a cluster the same job runs
    per-partition-predicate to bound memory; local fixture sizes keep
    it single-pass here.
    """
    before = table_stats(spark, path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    bytes_per_row = max(before["total_bytes"] / max(n_rows, 1), 1.0)
    rows_per_file = max(int(target_file_bytes / bytes_per_row), 1)
    n_target_files = max(int(n_rows / rows_per_file), 1)

    staging = path.rstrip("/") + ".__compact__"
    writer = (
        df.repartition(n_target_files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)

    backup = path.rstrip("/") + ".__old__"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    after = table_stats(spark, path)
    return {"before": before, "after": after, "rows": n_rows}


def upsert(
    spark: SparkSession,
    path: str,
    updates,
    keys: list[str],
) -> dict:
    """MERGE-by-rewrite: upsert ``updates`` into the parquet table at
    ``path`` on ``keys`` — matched rows are replaced, unmatched rows
    inserted (the Delta MERGE semantics, without a transaction log).

    Plan shape: target LEFT ANTI updates on the keys (drop the rows
    being replaced) UNION ALL updates, rewritten to a staging dir and
    atomically swapped. At scale the anti-join broadcasts the update
    set when small, and the rewrite is restricted to the partitions the
    updates touch (partition-pruned read via the updates' partition
    values); the fixture-size implementation rewrites the whole table.
    Atomicity is rename-level (single-writer contract, same as the
    reference's put-once store — Store.ts:4-8); concurrent readers need
    the table-format upgrade (Delta/Iceberg) this deliberately stops
    short of.
    """
    target = spark.read.parquet(path)
    missing = [k for k in keys if k not in target.columns or k not in updates.columns]
    if missing:
        raise ValueError(f"upsert keys {missing} absent from target or updates")
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    merged = kept.unionByName(updates.select(*target.columns))

    staging = path.rstrip("/") + ".__upsert__"
    merged.write.mode("overwrite").parquet(staging)
    backup = path.rstrip("/") + ".__old__"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    out = spark.read.parquet(path)
    return {"rows": out.count(), "updated_or_inserted": updates.count()}
