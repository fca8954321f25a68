"""Structured Streaming layer — the reference's ingestion semantics done
natively (SURVEY.md §2.B Streaming):

- micro-batch trigger by time  ≙ reference batchAgeLimit (Collector.ts:179)
- source rate limits (maxFilesPerTrigger etc.) ≙ batchRecordLimit (:178)
- graceful stop + final epoch  ≙ Collector.stop() (:182-200)
- StreamingQueryListener       ≙ onFlush/onError signals (:147-151)

Plus the event-time operators the reference never had: tumbling/sliding
windows, session windows, watermarked late-data handling, stateful
dedup. Every transformation here is a plain DataFrame function usable
on both batch and streaming frames — batch/stream equivalence is
testable by construction (tests/test_streaming.py) and the driver
oracle-checks the streaming queries through :func:`replay_stream`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.session import apply_runtime_confs
from es_analytics_spark.sources.lake import read_table


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table as an unbounded stream (file source, one-shot replay
    via availableNow in tests/driver). Schema comes from the batch
    reader so the ns→µs normalization matches exactly."""
    apply_runtime_confs(spark)
    batch = read_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file stream source wants a directory: stream the sf dir filtered
    # to the events file
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    assert raw.schema == batch.schema
    return raw


# -- event-time transformations (work on batch AND streaming frames) ----


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window per event_type with a 10-minute
    watermark (streaming: late rows beyond it are dropped)."""
    src = events.withWatermark("ts", "10 minutes") if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows (gap-based) per user — the streaming
    equivalent of operators.sessionize."""
    src = events.withWatermark("ts", "10 minutes") if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Stateful streaming dedup: drop repeats of (keys) arriving within
    the watermark horizon; state is GC'd past it, which is what makes
    this viable on an unbounded stream."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


# -- replay harness -----------------------------------------------------


def replay_stream(
    spark: SparkSession,
    streaming_df: DataFrame,
    name: str = "replay_out",
    output_mode: str = "append",
) -> DataFrame:
    """Run a streaming frame to exhaustion (availableNow) into a memory
    sink and return the materialized result as a batch DataFrame.

    This is how streaming operators get the same oracle check as batch
    ones: replaying the bounded fixture through the streaming engine
    must produce the batch answer.
    """
    # Stateful operators keep one state-store instance per shuffle
    # partition; at fixture scale 32 stores are pure overhead, so the
    # replay runs with 8 (results are partition-count independent).
    # A real deployment sizes this to cluster cores via config.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        query = (
            streaming_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            query.awaitTermination()
        finally:
            query.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
