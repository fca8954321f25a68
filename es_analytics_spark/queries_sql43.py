"""Round-5 batch-43 surface: daily sample-ratio-mismatch monitoring and
the Durbin-Watson autocorrelation test on deseasonalized residuals.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Daily sample-ratio mismatch (SRM) monitor
# ---------------------------------------------------------------------------

_SRMD_SQL = """
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 0
                                        THEN user_id END) AS BIGINT) AS n0,
               CAST(COUNT(DISTINCT CASE WHEN user_id % 2 = 1
                                        THEN user_id END) AS BIGINT) AS n1
        FROM events GROUP BY 1
    )
    SELECT day, n0 AS n_control, n1 AS n_treat,
           FLOOR((n1 - (n0 + n1) / 2.0)
                 / SQRT((n0 + n1) / 4.0) * 1e6 + 0.5) / 1e6 AS srm_z,
           CAST(CASE WHEN ABS((n1 - (n0 + n1) / 2.0)
                              / SQRT((n0 + n1) / 4.0)) > 3.0
                     THEN 1 ELSE 0 END AS BIGINT) AS srm_alarm
    FROM daily
"""


@query("ab_srm_daily", oracle=_SRMD_SQL)
def ab_srm_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily sample-ratio-mismatch monitor: per day, the distinct
    active users per variant, the z against the designed 50/50 split,
    and a |z| > 3 alarm — ab_ztest_srm tests the split once over the
    whole experiment; the DAILY trace is what catches a mid-experiment
    config push or logging regression the moment it ships (an SRM that
    starts on day 12 is invisible in the pooled number until it is
    large).

    Exactness: daily per-variant counts are exact distinct counts; z
    is one fixed tree with a single SQRT; the alarm compares the
    unquantized |z| to the literal 3.0 identically on both engines.

    Scale: one (day)-grain distinct-count aggregate; |days| output
    rows."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct(
                F.when(F.col("user_id") % 2 == 0, F.col("user_id"))
            )
            .cast("bigint")
            .alias("n0"),
            F.countDistinct(
                F.when(F.col("user_id") % 2 == 1, F.col("user_id"))
            )
            .cast("bigint")
            .alias("n1"),
        )
        .transform(cut_lineage)
    )
    z = (F.col("n1") - (F.col("n0") + F.col("n1")) / F.lit(2.0)) / F.sqrt(
        (F.col("n0") + F.col("n1")) / F.lit(4.0)
    )
    return daily.select(
        "day",
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treat"),
        _q6(z).alias("srm_z"),
        F.when(F.abs(z) > F.lit(3.0), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("srm_alarm"),
    )


# ---------------------------------------------------------------------------
# Durbin-Watson test on deseasonalized daily residuals
# ---------------------------------------------------------------------------

_DW_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), dows AS MATERIALIZED (
        SELECT day, y,
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(day AS DATE)) % 7
                    AS BIGINT) AS dow
        FROM daily
    ), seas AS MATERIALIZED (
        SELECT dow, {dsum_expr('y')} / COUNT(*) AS s FROM dows GROUP BY dow
    ), resid AS MATERIALIZED (
        SELECT d.day, d.y - se.s AS e FROM dows d JOIN seas se USING (dow)
    ), lagged AS MATERIALIZED (
        SELECT day, e, LAG(e) OVER (ORDER BY day) AS ep FROM resid
    ), sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('(e - ep) * (e - ep)')} AS sd,
               {dsum_expr('e * e')} AS se2
        FROM lagged
    )
    SELECT n AS n_days,
           FLOOR(sd / se2 * 1e6 + 0.5) / 1e6 AS durbin_watson,
           FLOOR((1.0 - sd / se2 / 2.0) * 1e6 + 0.5) / 1e6 AS rho_implied
    FROM sums
"""


@query("stat_durbin_watson", oracle=_DW_SQL)
def stat_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic on the deseasonalized daily revenue
    residuals (DW ~ 2 means no first-order autocorrelation; DW < 2
    implies positive serial correlation with rho ~ 1 - DW/2) — the
    regression-residual diagnostic that tells you whether
    ts_effective_sample_size's correction is even needed, and the
    classical companion to stat_ljung_box's portmanteau test (DW is
    the lag-1 specialist the econometrics playbook reaches for
    first).

    Exactness: residuals are exact arithmetic on decimal-contract
    values; numerator/denominator decimal-sum identical IEEE squares
    over the calendar-bounded frame; two quantized outputs.

    Scale: one shuffle to the daily grain, a 7-row seasonal profile,
    one calendar-bounded lag window (plan-guard allowlisted)."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    dows = daily.select(
        "day",
        "y",
        (F.datediff(F.to_date("day"), F.to_date(F.lit("1970-01-01"))) % 7)
        .cast("bigint")
        .alias("dow"),
    )
    seas = dows.groupBy("dow").agg((dsum("y") / F.count("y")).alias("s"))
    resid = dows.join(F.broadcast(seas), "dow").select(
        "day", (F.col("y") - F.col("s")).alias("e")
    )
    w = W.orderBy("day")
    lagged = resid.select("day", "e", F.lag("e").over(w).alias("ep")).transform(
        cut_lineage
    )
    sums = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum((F.col("e") - F.col("ep")) * (F.col("e") - F.col("ep"))).alias(
            "sd"
        ),
        dsum(F.col("e") * F.col("e")).alias("se2"),
    )
    dw = F.col("sd") / F.col("se2")
    return sums.select(
        F.col("n").alias("n_days"),
        _q6(dw).alias("durbin_watson"),
        _q6(F.lit(1.0) - dw / F.lit(2.0)).alias("rho_implied"),
    )
