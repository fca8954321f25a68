"""Lake readers: the engine's scan layer over the testdata star schema.

The reference lake is date-partitioned objects per table
(README.md:113-123 in /root/reference); here the scan layer is Spark's
parquet source — vectorized reads, predicate pushdown, partition
pruning all come from Catalyst (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions worth broadcasting in joins at any scale factor.
BROADCAST_TABLES = {"region", "nation", "supplier", "customer", "part"}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing types to engine conventions."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) parquet read as long (nanosAsLong) → truncate
        # to microseconds, matching what any µs-native engine sees.
        # integer div, not double div: double rounding at ~1.7e18 ns
        # flips the last microsecond vs an engine that truncates
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Normalize any TIMESTAMP_NTZ column to session-TZ TIMESTAMP (UTC):
    # watermarks and unix_micros require LTZ, and with a UTC session the
    # wall-clock values are identical. Belt-and-braces for sessions where
    # inferTimestampNTZ could not be disabled (see session.RUNTIME_CONFS).
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES, register_views: bool = True
) -> dict[str, DataFrame]:
    """Load tables and (optionally) register same-named temp views."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
