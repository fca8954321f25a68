"""SparkSession factory with engine defaults.

Local-mode testing uses local[N]; the same configs are what we would
ship on a multi-executor cluster: AQE on (runtime re-plan, skew-join
splitting, partition coalescing), UTC session time zone (the reference
serializes all times as UTC ISO-8601 — Collector.ts:130,136-142), Arrow
for the Python boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Session-settable confs applied even when the caller (e.g. the verify
# driver) hands us an already-built SparkSession.
RUNTIME_CONFS: dict[str, str] = {
    # testdata events.parquet stores TIMESTAMP(NANOS) which Spark's
    # parquet reader rejects by default; read as long and convert.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # naive parquet timestamps (isAdjustedToUTC=false) would infer as
    # TIMESTAMP_NTZ, which unix_micros and streaming watermarks reject;
    # with a UTC session the LTZ reading is value-identical.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Best-effort apply of session-settable engine confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — fall back to whatever the session has
    return spark


def get_spark(app_name: str = "es_analytics_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # match local parallelism, not the 200 default; AQE coalesces further
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # catalog tables (bucketed layouts) go to a scratch warehouse,
        # not the repo working dir
        .config("spark.sql.warehouse.dir", os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/es_analytics_warehouse"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
