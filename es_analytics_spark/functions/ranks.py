"""Distributed global-rank building blocks shared by the catalog's
range-rank recipes (ml_split_shuffle, ml_quality_bucket_sample,
rec_rfm_segments): a window-free cumulative-offset table over the
per-partition count frame.

Why window-free: the original recipe computed the per-partition offset
with an unpartitioned cumsum window (`SUM(cnt) OVER (ORDER BY pid)`)
— safe because the frame is one row per shuffle partition, but the
catalog-wide single-partition plan guard cannot see cardinality, so
every user needed a documented allowlist entry. A broadcast triangle
self-join over the same |partitions|-row frame computes the identical
prefix sum with no window and no Exchange SinglePartition anywhere in
the plan, letting those queries pass the guard outright.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cumulative_offsets(cnts: DataFrame, pid: str = "pid", cnt: str = "cnt") -> DataFrame:
    """Given a frame with one row per partition id carrying its row
    count, return (pid, off) where off = sum of counts of all strictly
    earlier partitions — the exclusive prefix sum the distributed-rank
    recipe adds to per-partition row_numbers.

    Implementation is a broadcast triangle self-join: |partitions|^2
    candidate pairs at most (32 x 32 at the default shuffle
    parallelism; a few thousand even at cluster scale) — bounded by
    configuration, never by data size."""
    a, b = cnts.alias("a"), cnts.alias("b")
    return (
        a.join(F.broadcast(b), F.col(f"b.{pid}") < F.col(f"a.{pid}"), "left")
        .groupBy(F.col(f"a.{pid}").alias(pid))
        .agg(F.coalesce(F.sum(f"b.{cnt}"), F.lit(0)).alias("off"))
    )
