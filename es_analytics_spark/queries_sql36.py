"""Round-5 batch-36 surface: lead-lag cross-correlation between two
daily series.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


_CCF_LAGS = (-3, -2, -1, 0, 1, 2, 3)


def _ccf_sql() -> str:
    lag_rows = ", ".join(f"({k})" for k in _CCF_LAGS)
    return f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d,
               {dsum_expr("CASE WHEN event_type = 'view'"
                          " THEN value ELSE 0 END")} AS x,
               {dsum_expr("CASE WHEN event_type = 'purchase'"
                          " THEN value ELSE 0 END")} AS y
        FROM events GROUP BY 1
    ), lags(k) AS (VALUES {lag_rows}),
    aligned AS MATERIALIZED (
        SELECT l.k, a.x, b.y
        FROM lags l
        JOIN daily a ON TRUE
        JOIN daily b ON b.d = a.d + l.k
    ), mom AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('x')} AS sx, {dsum_expr('y')} AS sy,
               {dsum_expr('x * x')} AS sxx, {dsum_expr('y * y')} AS syy,
               {dsum_expr('x * y')} AS sxy
        FROM aligned GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS lag_days, n AS n_pairs,
           FLOOR((sxy - sx * sy / n)
                 / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n))
                 * 1e6 + 0.5) / 1e6 AS ccf
    FROM mom
"""


@query("ts_cross_correlation", oracle=_ccf_sql())
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between the daily view and purchase
    revenue series at lags -3..+3 days (corr(x_t, y_{t+k}) — positive
    peak lag means views LEAD purchases by k days): the CCF table
    behind "does top-of-funnel predict revenue, and with what delay" —
    window_moving_correlation tracks the contemporaneous relationship
    over time; the CCF localizes the causal-delay structure a
    marketing-mix model keys off. Each lag uses its own aligned-pair
    population (the standard CCF convention).

    Exactness: daily series are decimal-contract sums; per-lag moments
    decimal-sum identical IEEE products over calendar-bounded aligned
    pairs; each correlation is one fixed tree with a single SQRT,
    quantized at 1e-6.

    Scale: one shuffle to the daily grain; the lag alignment is a
    |lags| x |days| self-join on the day key (calendar-bounded), then
    a 7-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
            .cast("bigint")
            .alias("d")
        )
        .agg(
            dsum(
                F.when(F.col("event_type") == "view", F.col("value")).otherwise(
                    0
                )
            ).alias("x"),
            dsum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0)
            ).alias("y"),
        )
        .transform(cut_lineage)
    )
    lags = spark.createDataFrame([(k,) for k in _CCF_LAGS], "k int")
    a = daily.select(F.col("d").alias("da"), "x")
    b = daily.select(F.col("d").alias("db"), "y")
    aligned = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("db") == F.col("da") + F.col("k"))
        .select("k", "x", "y")
    )
    mom = aligned.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    ccf = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
    )
    return mom.select(
        F.col("k").cast("bigint").alias("lag_days"),
        F.col("n").alias("n_pairs"),
        _q6(ccf).alias("ccf"),
    )
