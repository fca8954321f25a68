"""Round-5 batch-20 surface: the streaming Holt-Winters twin (stateful
forecaster maintained by the streaming engine, pinned to the batch
entry's recursive-CTE oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.queries import query
from es_analytics_spark.queries_sql17 import _HW_SQL


@query("stream_holt_winters", mutates_conf=True, oracle=_HW_SQL)
def stream_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_holt_winters_additive's forecaster maintained by the
    STREAMING engine (applyInPandasWithState; see streaming.stateful.
    running_holt_winters): per-series state is the day -> exact
    scale-10 integer sum map (the dsum decimal contract as int
    arithmetic), every epoch re-derives the full forecast through the
    SHARED recursion (functions.forecast.holt_winters_rows), and the
    drained replay is pinned against the identical recursive-CTE
    oracle as the batch entry — late/out-of-order events land in their
    day exactly as batch aggregation would, so stream == batch
    bit-for-bit. This is the batch/stream parity bar every stateful
    operator in this engine meets, extended to a model-carrying
    operator (the state is a training aggregate, not just counters).

    Scale: state is calendar-bounded per series (|days| longs); the
    fixture has one global series, so one state key — a multi-tenant
    deployment keys by series id and shards across executors, which is
    where streaming-forecast parallelism actually lives."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events
    from es_analytics_spark.streaming.stateful import running_holt_winters

    ev = stream_events(spark, sf_dir)
    src = ev.select(
        F.lit(1).cast("int").alias("g"),
        F.unix_micros(F.col("ts")).alias("tus"),
        "value",
    )
    out = replay_stream(
        spark,
        running_holt_winters(src),
        name="stream_holt_winters",
        output_mode="append",
    )
    w = W.partitionBy("day_epoch").orderBy(F.col("n_rows").desc())
    final = out.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return final.select(
        F.timestamp_micros(F.col("day_epoch") * F.lit(86_400_000_000)).alias(
            "day"
        ),
        "y",
        "level",
        "trend",
        "seasonal",
        "fitted",
        "residual",
    )
