"""Lenient scans: malformed input rows routed, not fatal.

A 100 TB lake WILL contain corrupt objects (truncated gzip members,
schema-drifted JSON, mojibake CSV). A scan that dies at row 40 billion
wastes the cluster; a scan that silently drops rows corrupts training
data. The contract here is the third option — Spark's PERMISSIVE mode
made explicit: every malformed row lands in a quarantine column /
frame with its raw text, good rows flow on, and the caller decides the
threshold at which corruption is an error.

Reference behavior being upgraded: the collector's CSV store is
write-only and its reader trusted the files it wrote; a lake shared
with other writers cannot (SURVEY.md §1.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_lenient(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with an explicit schema; returns (good, quarantined).

    Malformed lines (bad JSON, wrong types under the schema) appear in
    the quarantine frame with their raw text in ``_corrupt_record``.
    Both frames share one cached parse of the input (Spark requires the
    cache to query the corrupt column; callers doing a huge one-shot
    scan can ``good.unpersist()``-equivalent via ``spark.catalog``).
    """
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        # Spark forbids queries whose only referenced column is the
        # corrupt column on a raw scan (SPARK-21610 /
        # QUERY_ONLY_CORRUPT_RECORD_COLUMN); the documented contract is
        # to cache the parsed frame first — which also means the file
        # parses once for both outputs.
        .cache()
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def read_csv_lenient(
    spark: SparkSession, path: str, schema: T.StructType, **options
) -> tuple[DataFrame, DataFrame]:
    """CSV variant of :func:`read_json_lenient` (same quarantine contract)."""
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType(), True)])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .csv(path)
        .cache()  # see read_json_lenient
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def corruption_rate(good: DataFrame, bad: DataFrame) -> float:
    """Fraction of quarantined rows — the gate a pipeline checks before
    trusting a scan (e.g. abort above 0.1%)."""
    n_bad = bad.count()
    n_good = good.count()
    total = n_bad + n_good
    return (n_bad / total) if total else 0.0
