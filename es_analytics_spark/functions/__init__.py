"""Expression helpers shared by operators and the query catalog."""

from es_analytics_spark.functions.exact import dsum, davg, dsum_expr, davg_expr

__all__ = ["dsum", "davg", "dsum_expr", "davg_expr"]
