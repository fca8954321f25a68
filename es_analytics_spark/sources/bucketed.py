"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of fact⋈fact joins is the shuffle. Writing
both sides bucketed by the join key (same bucket count) lets Spark
plan a SortMergeJoin with NO Exchange on either side — the shuffle is
paid once at write time and amortized over every subsequent join.
This module is that workflow; tests/test_plans.py pins the no-Exchange
plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    reading the parquet path directly would lose it)."""
    return spark.table(table_name)
