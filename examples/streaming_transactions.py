"""Exactly-once streaming into transactional tables, end to end.

Run with:  PYTHONPATH=/root/repo python examples/streaming_transactions.py

The lifecycle a production pipeline actually runs, on the engine's two
durability mechanisms composed (streaming checkpoint WAL x txlog
commit protocol):

  1. ingest      an event stream lands in a txlog table, one
                 exactly-once transactional commit per epoch
  2. consume     a downstream rollup follows the table with a version
                 cursor (changes_since) — commit-sized work per poll,
                 compactions invisible
  3. upsert      a CDC-shaped stream MERGEs into a keyed table: the
                 table converges to latest-row-per-key, transactionally
  4. comply      a row-level DELETE (the GDPR/right-to-be-forgotten
                 shape) rewrites only the parts holding matching rows
  5. audit       table_changes_cdf replays every row-level change —
                 inserts, upserts as delete(old)+insert(new), deletes —
                 with the commit version that caused each
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from es_analytics_spark import get_spark, txlog
from es_analytics_spark.streaming.txlog_sink import (
    stream_merge_to_txlog,
    stream_to_txlog,
)


def main() -> None:
    spark = get_spark("streaming-tx-example")
    root = tempfile.mkdtemp(prefix="stream_tx_demo_")
    events, profiles = f"{root}/events", f"{root}/profiles"

    # 1. ingest: micro-batches -> exactly-once txlog commits
    src = f"{root}/incoming_events"
    spark.range(0, 3000).select(
        "id",
        (F.col("id") % 50).alias("user_id"),
        (F.col("id") % 7 * 10.0).alias("value"),
    ).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_to_txlog(
        stream, path=events, checkpoint_dir=f"{root}/ckpt_events",
        stream_id="events", available_now=True,
    )
    q.awaitTermination()
    print("epochs committed:", txlog.current_version(spark, events))
    print("rows:", txlog.read_table(spark, events).count())

    # 2. consume: cursor-driven incremental rollup (then a compaction,
    # which the cursor consumer must not even notice)
    cursor, revenue = 0, {}
    delta, cursor = txlog.changes_since(spark, events, cursor)
    for r in delta.groupBy("user_id").agg(F.sum("value").alias("s")).collect():
        revenue[r["user_id"]] = revenue.get(r["user_id"], 0.0) + r["s"]
    txlog.compact(spark, events)
    delta, cursor = txlog.changes_since(spark, events, cursor)
    print("rollup users:", len(revenue), "| post-compact delta rows:", delta.count())

    # 3. upsert: a CDC stream merges into a keyed profile table
    cdc = f"{root}/incoming_profiles"
    spark.createDataFrame(
        [(u, "bronze", 1) for u in range(50)], "user_id long, tier string, seq long"
    ).coalesce(1).write.mode("append").parquet(cdc)
    spark.createDataFrame(
        [(u, "gold", 2) for u in range(0, 50, 5)], "user_id long, tier string, seq long"
    ).coalesce(1).write.mode("append").parquet(cdc)
    pstream = (
        spark.readStream.schema("user_id long, tier string, seq long")
        .option("maxFilesPerTrigger", "1")
        .parquet(cdc)
    )
    q = stream_merge_to_txlog(
        pstream, path=profiles, keys=["user_id"], order_col="seq",
        checkpoint_dir=f"{root}/ckpt_profiles", stream_id="profiles",
        available_now=True,
    )
    q.awaitTermination()
    tiers = txlog.read_table(spark, profiles).groupBy("tier").count().collect()
    print("profile tiers:", sorted((r["tier"], r["count"]) for r in tiers))

    # 4. comply: row-level delete rewrites only the touched parts
    r = txlog.delete_where(spark, profiles, "user_id % 10 = 7")
    print("deleted:", r["rows_deleted"], "rows;", r["parts_rewritten"], "parts rewritten")

    # 5. audit: the exact row-level history, change by change
    cdf = txlog.table_changes_cdf(spark, profiles, 0)
    audit = (
        cdf.groupBy("_commit_version", "_change_type")
        .count()
        .orderBy("_commit_version", "_change_type")
        .collect()
    )
    for row in audit:
        print(f"  v{row['_commit_version']:>2} {row['_change_type']:>6}: {row['count']} rows")

    # 6. re-stream: the txlog table is itself a streaming SOURCE — the
    # closed loop. Mirror the events table into another txlog table
    # with exactly-once semantics on BOTH ends (version offsets in the
    # WAL, epoch source-stamps in the sink's commits).
    from es_analytics_spark.sources.txlog_source import register_txlog_feed

    register_txlog_feed(spark)
    mirror = f"{root}/events_mirror"
    feed = spark.readStream.format("txlog_feed").option("path", events).load()
    q = stream_to_txlog(
        feed, path=mirror, checkpoint_dir=f"{root}/ckpt_mirror",
        stream_id="mirror", available_now=True,
    )
    q.awaitTermination()
    print(
        "mirror == source:",
        txlog.read_table(spark, mirror).count()
        == txlog.read_table(spark, events).count(),
    )

    # 7. maintain: an incrementally-maintained rollup ON the log —
    # signed CDF deltas fold into a txlog rollup table, commit-sized
    # work per call, exactly-once per source version, correct across
    # the delete in step 4
    from es_analytics_spark.incremental import maintain_rollup, read_rollup

    tier_stats = f"{root}/tier_stats"
    res = maintain_rollup(
        spark, profiles, tier_stats, keys=["tier"],
        measures={"users": ("count", None)},
    )
    print("rollup applied", res["applied"], "source versions; state:",
          sorted((r["tier"], r["users"]) for r in read_rollup(spark, tier_stats).collect()))

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
