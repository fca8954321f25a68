"""Round-5 batch-24 surface: a Holt-Winters holdout backtest, partial
correlation, and inter-purchase gap statistics.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Holt-Winters holdout backtest (last 7 days) vs seasonal naive
# ---------------------------------------------------------------------------

_HWBT_H = 7

_HWBT_SQL = f"""
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), idx AS MATERIALIZED (
        SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily
    ), cut AS (
        SELECT CAST(MAX(t) AS BIGINT) - {_HWBT_H} AS tc FROM idx
    ), init AS (
        SELECT l0, b0,
               (SELECT LIST(y - l0 ORDER BY t) FROM idx WHERE t <= 7) AS s0
        FROM (SELECT
                (SELECT SUM(y) / 7 FROM idx WHERE t <= 7) AS l0,
                ((SELECT SUM(y) / 7 FROM idx WHERE t BETWEEN 8 AND 14)
                 - (SELECT SUM(y) / 7 FROM idx WHERE t <= 7)) / 7 AS b0)
    ), rec(t, l, b, s) AS (
        SELECT CAST(7 AS BIGINT), l0, b0, s0 FROM init
        UNION ALL
        SELECT i.t,
               0.5 * (i.y - r.s[1]) + 0.5 * (r.l + r.b),
               0.25 * ((0.5 * (i.y - r.s[1]) + 0.5 * (r.l + r.b)) - r.l)
                   + 0.75 * r.b,
               r.s[2:7] || [0.25 * (i.y - (0.5 * (i.y - r.s[1])
                                           + 0.5 * (r.l + r.b)))
                            + 0.75 * r.s[1]]
        FROM rec r JOIN idx i ON i.t = r.t + 1, cut
        WHERE r.t < cut.tc
    ), fin AS (
        SELECT r.l, r.b, r.s FROM rec r, cut WHERE r.t = cut.tc
    ), hs AS (
        SELECT CAST(h.range AS BIGINT) AS h FROM range(1, {_HWBT_H} + 1) h
    )
    SELECT i.day, i.y,
           FLOOR((fin.l + hs.h * fin.b
                  + fin.s[CAST((hs.h - 1) % 7 + 1 AS INT)])
                 * 1e6 + 0.5) / 1e6 AS hw_forecast,
           sn.y AS snaive_forecast,
           FLOOR(ABS(i.y - (fin.l + hs.h * fin.b
                            + fin.s[CAST((hs.h - 1) % 7 + 1 AS INT)]))
                 * 1e6 + 0.5) / 1e6 AS hw_abs_err,
           FLOOR(ABS(i.y - sn.y) * 1e6 + 0.5) / 1e6 AS snaive_abs_err
    FROM hs
    CROSS JOIN fin CROSS JOIN cut
    JOIN idx i ON i.t = cut.tc + hs.h
    JOIN idx sn ON sn.t = cut.tc + hs.h - 7
"""


@query("ts_holt_winters_backtest", oracle=_HWBT_SQL)
def ts_holt_winters_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holdout backtest of the Holt-Winters forecaster: train on all
    but the last {_HWBT_H} days, forecast the held-out week
    (f_h = level + h*trend + seasonal), and report per-day absolute
    errors next to the seasonal-naive baseline (y[t-7]) — the
    evaluation loop that turns ts_holt_winters_additive from a fit
    into a model decision (ts_forecast_accuracy grades snaive; this
    grades the state-space upgrade against it on the SAME holdout).

    Exactness: the training recursion is the shared bit-exact
    recurrence (functions.forecast, same as the oracle's recursive CTE
    stopped at the cutoff); forecasts are one fixed IEEE tree per
    horizon; snaive values are exact scale-4 doubles; errors quantize
    at 1e-6.

    Scale: one shuffle to the daily grain; training is the per-series
    sequential recursion (parallel across series), and the holdout
    join is |horizon|-sized."""
    import pandas as pd

    from es_analytics_spark.functions.forecast import (
        holt_winters_forecast,
        q6,
    )

    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .withColumn("g", F.lit(1))
    )

    def _bt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        days = list(pdf["day"])
        ys = [float(v) for v in pdf["y"]]
        cols = [
            "day",
            "y",
            "hw_forecast",
            "snaive_forecast",
            "hw_abs_err",
            "snaive_abs_err",
        ]
        if len(ys) < 15 + _HWBT_H:
            return pd.DataFrame(
                {
                    "day": pd.Series(dtype="datetime64[ns]"),
                    **{
                        c: pd.Series(dtype="float64")
                        for c in cols
                        if c != "day"
                    },
                }
            )
        tc = len(ys) - _HWBT_H
        fc = holt_winters_forecast(ys[:tc], _HWBT_H)
        out = []
        for h in range(1, _HWBT_H + 1):
            yt = ys[tc + h - 1]
            sn = ys[tc + h - 1 - 7]
            out.append(
                {
                    "day": days[tc + h - 1],
                    "y": yt,
                    "hw_forecast": q6(fc[h - 1]),
                    "snaive_forecast": sn,
                    "hw_abs_err": q6(abs(yt - fc[h - 1])),
                    "snaive_abs_err": q6(abs(yt - sn)),
                }
            )
        return pd.DataFrame(out, columns=cols)

    schema = (
        "day timestamp, y double, hw_forecast double, "
        "snaive_forecast double, hw_abs_err double, snaive_abs_err double"
    )
    return daily.groupBy("g").applyInPandas(_bt, schema=schema)


# ---------------------------------------------------------------------------
# Partial correlation (views ~ purchases, controlling for clicks)
# ---------------------------------------------------------------------------


def _corr_expr(sx: str, sy: str, sxy: str, sxx: str, syy: str, n: str) -> str:
    return (
        f"FLOOR(({sxy} - {sx} * {sy} / {n})"
        f" / SQRT(({sxx} - {sx} * {sx} / {n})"
        f" * ({syy} - {sy} * {sy} / {n})) * 1e6 + 0.5) / 1e6"
    )


_PCORR_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                    AS DOUBLE) AS x,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS DOUBLE) AS y,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                    AS DOUBLE) AS z
        FROM events GROUP BY 1
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('x')} AS sx, {dsum_expr('y')} AS sy,
               {dsum_expr('z')} AS sz,
               {dsum_expr('x * x')} AS sxx, {dsum_expr('y * y')} AS syy,
               {dsum_expr('z * z')} AS szz,
               {dsum_expr('x * y')} AS sxy, {dsum_expr('x * z')} AS sxz,
               {dsum_expr('y * z')} AS syz
        FROM pu
    ), corrs AS (
        SELECT n,
               {_corr_expr('sx', 'sy', 'sxy', 'sxx', 'syy', 'n')} AS rxy,
               {_corr_expr('sx', 'sz', 'sxz', 'sxx', 'szz', 'n')} AS rxz,
               {_corr_expr('sy', 'sz', 'syz', 'syy', 'szz', 'n')} AS ryz
        FROM mom
    )
    SELECT n AS n_users, rxy AS r_view_purchase, rxz AS r_view_click,
           ryz AS r_purchase_click,
           FLOOR((rxy - rxz * ryz)
                 / SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
                 * 1e6 + 0.5) / 1e6 AS partial_corr
    FROM corrs
"""


@query("stat_partial_correlation", oracle=_PCORR_SQL)
def stat_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation between per-user view and
    purchase counts CONTROLLING for click count — the confound check
    agg_corr_matrix can't answer: a strong raw view~purchase
    correlation may be entirely "active users do more of everything";
    the partial residualizes the shared activity driver out of both
    sides.

    Exactness: counts are exact integers; the three pairwise
    correlations are fixed IEEE trees on decimal-contract moments,
    quantized at 1e-6 BEFORE entering the partial formula (so both
    engines combine identical r's); one more quantized tree out.

    Scale: one user-grain aggregate, a 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "view", 1))
        .cast("double")
        .alias("x"),
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("double")
        .alias("y"),
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("double")
        .alias("z"),
    )
    mom = pu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum("z").alias("sz"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
        dsum(F.col("z") * F.col("z")).alias("szz"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("z")).alias("sxz"),
        dsum(F.col("y") * F.col("z")).alias("syz"),
    )

    def corr(sx, sy, sxy, sxx, syy):
        return _q6(
            (F.col(sxy) - F.col(sx) * F.col(sy) / F.col("n"))
            / F.sqrt(
                (F.col(sxx) - F.col(sx) * F.col(sx) / F.col("n"))
                * (F.col(syy) - F.col(sy) * F.col(sy) / F.col("n"))
            )
        )

    corrs = mom.select(
        "n",
        corr("sx", "sy", "sxy", "sxx", "syy").alias("rxy"),
        corr("sx", "sz", "sxz", "sxx", "szz").alias("rxz"),
        corr("sy", "sz", "syz", "syy", "szz").alias("ryz"),
    )
    return corrs.select(
        F.col("n").alias("n_users"),
        F.col("rxy").alias("r_view_purchase"),
        F.col("rxz").alias("r_view_click"),
        F.col("ryz").alias("r_purchase_click"),
        _q6(
            (F.col("rxy") - F.col("rxz") * F.col("ryz"))
            / F.sqrt(
                (F.lit(1.0) - F.col("rxz") * F.col("rxz"))
                * (F.lit(1.0) - F.col("ryz") * F.col("ryz"))
            )
        ).alias("partial_corr"),
    )


# ---------------------------------------------------------------------------
# Inter-purchase gap statistics
# ---------------------------------------------------------------------------

_GAP_SQL = """
    WITH p AS MATERIALIZED (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE event_type = 'purchase'
    ), gaps AS MATERIALIZED (
        SELECT user_id,
               CAST(DATEDIFF('second', prev_ts, ts) AS BIGINT) AS gap_s
        FROM p WHERE prev_ts IS NOT NULL
    ), users AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers
        FROM p
    )
    SELECT u.n_buyers,
           CAST(COUNT(DISTINCT g.user_id) AS BIGINT) AS n_repeat_buyers,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           FLOOR(ROUND(QUANTILE_CONT(g.gap_s / 3600.0, 0.5), 4)
                 * 1e6 + 0.5) / 1e6 AS median_gap_hours,
           FLOOR(ROUND(QUANTILE_CONT(g.gap_s / 3600.0, 0.9), 4)
                 * 1e6 + 0.5) / 1e6 AS p90_gap_hours,
           FLOOR(CAST(SUM(g.gap_s) AS DOUBLE) / COUNT(*) / 3600.0
                 * 1e6 + 0.5) / 1e6 AS mean_gap_hours
    FROM gaps g CROSS JOIN users u
    GROUP BY u.n_buyers
"""


@query("ts_interpurchase_gaps", oracle=_GAP_SQL)
def ts_interpurchase_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase gap profile: per-user consecutive purchase gaps
    (seconds, via a per-user lag), summarized as median / p90 / mean
    hours plus buyer and repeat-buyer counts — the raw input behind
    replenishment reminders, churn-risk windows (a user 3x past their
    median gap is churning), and the ts_survival_churn horizon choice.

    Exactness: gaps are exact integer second differences over the
    deterministic (ts, event_id) order; quantiles use the shared
    interpolated contract on identical gap/3600 doubles; the mean is
    an exact integer sum divided once.

    Scale: one shuffle on user_id for the lag window; one global
    aggregate with single-pass percentiles."""
    e = _t(spark, sf_dir, "events")["events"]
    wp = W.partitionBy("user_id").orderBy("ts", "event_id")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(wp))
        .transform(cut_lineage)
    )
    gaps = p.filter(F.col("prev_ts").isNotNull()).select(
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts"))
        .cast("bigint")
        .alias("gap_s"),
    )
    users = p.agg(F.countDistinct("user_id").cast("bigint").alias("n_buyers"))
    gh = F.col("gap_s") / F.lit(3600.0)
    return (
        gaps.crossJoin(F.broadcast(users))
        .groupBy("n_buyers")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("n_repeat_buyers"),
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            _q6(F.round(F.percentile(gh, F.lit(0.5)), 4)).alias(
                "median_gap_hours"
            ),
            _q6(F.round(F.percentile(gh, F.lit(0.9)), 4)).alias(
                "p90_gap_hours"
            ),
            _q6(
                F.sum("gap_s").cast("double") / F.count(F.lit(1)) / F.lit(3600.0)
            ).alias("mean_gap_hours"),
        )
        .select(
            "n_buyers",
            "n_repeat_buyers",
            "n_gaps",
            "median_gap_hours",
            "p90_gap_hours",
            "mean_gap_hours",
        )
    )
