"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over es_analytics_spark.queries.REGISTRY: every implemented
operator family from SURVEY.md §2 has a (Spark query, DuckDB oracle)
pair there; entries with ``oracle is None`` are non-SQL-expressible
(approx sketches, LSH candidate generation) and get the weaker
rows-only check by contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from es_analytics_spark.queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
