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
    from es_analytics_spark.sources.lake import raw_parquet_schema

    raw_schema = raw_parquet_schema(spark, f"{sf_dir}/events.parquet")
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


def rate_events(spark: SparkSession, rows_per_second: int = 500) -> DataFrame:
    """Live UNBOUNDED event stream from Spark's built-in ``rate``
    source, shaped to the events schema — the one live-source class
    exercisable without external jars or a broker (SURVEY §2.B
    "file/Kafka/rate source"). Unlike :func:`stream_events` (a bounded
    file replay), this stream never ends: micro-batches keep arriving
    until the query is stopped, so it drives true processing-time
    triggers, listener progress events, and graceful-stop paths the
    replay harness can't.

    The rate source emits (timestamp, value: monotonically increasing
    bigint); the event fields are deterministic functions of ``value``
    so any assertion over a captured prefix is reproducible.
    """
    apply_runtime_confs(spark)
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return raw.select(
        F.col("value").alias("event_id"),
        (F.col("value") % 97).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("value") % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 1000 / 10.0).alias("value"),
    )


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


# -- Kafka source seam --------------------------------------------------
#
# SURVEY §2.B declares "file/Kafka/rate source". The sandbox has no
# broker and no spark-sql-kafka connector jar (offline, no pip), so the
# live path is untestable here; this seam fixes the full option and
# schema contract so a deployment only adds the connector package. The
# value-parsing half is plain DataFrame code, tested against a batch
# frame with Kafka's exact wire schema.

#: Kafka's fixed wire schema — every record the connector emits has
#: exactly these columns (Structured Streaming + Kafka Integration
#: Guide). parse_kafka_events consumes this shape, so its contract is
#: testable without a broker.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def kafka_reader_options(
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 200_000,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """The engine's Kafka option contract, mirroring the file source's
    conventions: ``maxOffsetsPerTrigger`` is the per-micro-batch bound
    (≙ the reference batchRecordLimit, Collector.ts:178, same role
    maxFilesPerTrigger plays for the file source); ``failOnDataLoss``
    stays true so retention-expired offsets surface as errors instead
    of silent gaps (flip explicitly for backfill-after-outage)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def parse_kafka_events(raw: DataFrame, value_schema=None) -> DataFrame:
    """Decode Kafka wire records into the events schema: JSON value →
    typed columns (ts as ISO-8601, matching the collector's Date→ISO
    preprocessing), event-time watermark on ts for the downstream
    windowed operators. Works identically on a streaming frame from
    the connector and a batch frame with KAFKA_WIRE_SCHEMA (how the
    contract is tested offline)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = value_schema or StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    parsed = raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.from_json(F.col("value").cast("string"), schema).alias("e"),
    ).select("topic", "partition", "offset", "e.*")
    if parsed.isStreaming:
        parsed = parsed.withWatermark("ts", "10 minutes")
    return parsed


def stream_events_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str = "events",
    **option_overrides,
) -> DataFrame:
    """events as an unbounded Kafka stream: readStream.format("kafka")
    with the engine's option contract, decoded by parse_kafka_events.
    Exactly-once end to end follows from Kafka offsets living in the
    query checkpoint (same replay contract the file source's
    checkpointed-drain test pins).

    Raises a clear RuntimeError when the spark-sql-kafka connector is
    not on the classpath (this sandbox) — the seam's logic is still
    fully covered offline via parse_kafka_events + the option-contract
    test."""
    apply_runtime_confs(spark)
    opts = kafka_reader_options(brokers, topic)
    opts.update({k: str(v) for k, v in option_overrides.items()})
    try:
        raw = spark.readStream.format("kafka").options(**opts).load()
    except Exception as e:  # connector jar absent
        if "Failed to find data source: kafka" in str(e):
            raise RuntimeError(
                "Kafka connector not on the classpath — deploy with the "
                "spark-sql-kafka-0-10 package (offline sandbox: file "
                "source carries the streaming semantics; see "
                "BASELINE.md table-format/connector notes)"
            ) from e
        raise
    return parse_kafka_events(raw)
