"""es_analytics_spark — a PySpark-native analytics engine.

A from-scratch engine providing the capabilities of the reference
event-ingestion library `plato-app/es-analytics` (typed collector API →
date-partitioned data lake; see /root/reference/lib/collector/Collector.ts)
plus the declared analytics surface of SURVEY.md §2.B: batch query
operators, streaming ingestion, and large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design: DataFrame/Spark-SQL first; Catalyst does the optimization.
Custom operators are compositions of built-ins; Pandas UDFs only where
built-ins genuinely cannot express the semantics.
"""

from es_analytics_spark.session import get_spark
from es_analytics_spark.sources.lake import load_tables, TABLES
from es_analytics_spark.collector import Collector, CollectorConfig, DataType, FlushInfo, FlushTrigger
from es_analytics_spark import incremental, txlog
from es_analytics_spark.sources.txlog_source import register_txlog_feed
from es_analytics_spark.sqldml import SqlDmlError, execute_sql
from es_analytics_spark.txlog import CommitConflict

__all__ = [
    "get_spark",
    "load_tables",
    "TABLES",
    "Collector",
    "CollectorConfig",
    "DataType",
    "FlushInfo",
    "FlushTrigger",
    "incremental",
    "txlog",
    "register_txlog_feed",
    "CommitConflict",
    "execute_sql",
    "SqlDmlError",
]

__version__ = "0.1.0"
