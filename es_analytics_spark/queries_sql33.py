"""Round-5 batch-33 surface: the individuals/moving-range (I-MR)
control chart, and cost-sensitive decision thresholding.

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
# I-MR (individuals / moving range) control chart on daily revenue
# ---------------------------------------------------------------------------

_IMR_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), mr AS MATERIALIZED (
        SELECT day, y,
               ABS(y - LAG(y) OVER (ORDER BY day)) AS mrange
        FROM daily
    ), lims AS (
        SELECT {dsum_expr('y')} / COUNT(*) AS ybar,
               {dsum_expr('mrange')} / COUNT(mrange) AS mrbar
        FROM mr
    )
    SELECT m.day, m.y,
           FLOOR(l.ybar * 1e6 + 0.5) / 1e6 AS center,
           FLOOR((l.ybar + 2.66 * l.mrbar) * 1e6 + 0.5) / 1e6 AS ucl,
           FLOOR((l.ybar - 2.66 * l.mrbar) * 1e6 + 0.5) / 1e6 AS lcl,
           CAST(CASE WHEN m.y > l.ybar + 2.66 * l.mrbar
                       OR m.y < l.ybar - 2.66 * l.mrbar
                     THEN 1 ELSE 0 END AS BIGINT) AS out_of_control
    FROM mr m CROSS JOIN lims l
"""


@query("ts_control_chart_imr", oracle=_IMR_SQL)
def ts_control_chart_imr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart individuals / moving-range (I-MR) control chart on
    daily revenue: center line, UCL/LCL at ybar +/- 2.66 * MRbar (the
    d2-based 3-sigma estimate from consecutive moving ranges — robust
    to slow drift in a way a plain stddev limit is not), and the
    out-of-control flag per day — the SPC primitive behind "is this
    day special cause or common cause", the disciplined version of the
    z-score alert (ts_anomaly_zscore).

    Exactness: daily values are decimal-contract sums; moving ranges
    are exact differences over the day order; ybar/MRbar decimal-sum
    identical doubles; limits and flags are fixed quantized trees
    (flags computed on unquantized limits — identical both engines).

    Scale: one shuffle to the daily grain; the lag window is
    calendar-bounded (plan-guard allowlisted); limits broadcast."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    w = W.orderBy("day")
    mr = daily.select(
        "day", "y", F.abs(F.col("y") - F.lag("y").over(w)).alias("mrange")
    )
    lims = mr.agg(
        (dsum("y") / F.count("y")).alias("ybar"),
        (dsum("mrange") / F.count("mrange")).alias("mrbar"),
    )
    ucl = F.col("ybar") + F.lit(2.66) * F.col("mrbar")
    lcl = F.col("ybar") - F.lit(2.66) * F.col("mrbar")
    return mr.crossJoin(F.broadcast(lims)).select(
        "day",
        "y",
        _q6(F.col("ybar")).alias("center"),
        _q6(ucl).alias("ucl"),
        _q6(lcl).alias("lcl"),
        F.when((F.col("y") > ucl) | (F.col("y") < lcl), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("out_of_control"),
    )


# ---------------------------------------------------------------------------
# Cost-sensitive decision thresholding
# ---------------------------------------------------------------------------

# Business cost matrix: a missed high-value converter costs 5x a
# wasted outreach (the classic asymmetric-cost setting that moves the
# optimal threshold away from the F1 point).
_COST_FN = 5.0
_COST_FP = 1.0

_COST_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               CAST(LEAST(GREATEST(SUM(CASE WHEN event_type = 'click'
                                            THEN 1 ELSE 0 END) - 8, 0) // 2, 6)
                    AS BIGINT) AS bin,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label
        FROM events WHERE user_id % 3 = 0 GROUP BY user_id
    ), bins AS MATERIALIZED (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS x
        FROM pu GROUP BY bin
    ), th AS (
        SELECT CAST(r.range AS BIGINT) AS threshold FROM range(0, 8) r
    ), conf AS MATERIALIZED (
        SELECT t.threshold,
               CAST(SUM(CASE WHEN b.bin >= t.threshold THEN b.n - b.x ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN b.bin < t.threshold THEN b.x ELSE 0 END)
                    AS BIGINT) AS fn
        FROM th t CROSS JOIN bins b
        GROUP BY t.threshold
    ), scored AS MATERIALIZED (
        SELECT threshold, fp, fn,
               FLOOR(({_COST_FP} * fp + {_COST_FN} * fn) * 1e6 + 0.5) / 1e6
                   AS expected_cost
        FROM conf
    ), best AS (
        SELECT MIN(threshold) AS bt FROM scored
        WHERE expected_cost = (SELECT MIN(expected_cost) FROM scored)
    )
    SELECT threshold, fp AS n_false_positive, fn AS n_false_negative,
           expected_cost,
           CAST(CASE WHEN threshold = best.bt THEN 1 ELSE 0 END AS BIGINT)
               AS is_best
    FROM scored CROSS JOIN best
"""


@query("ml_cost_sensitive_threshold", oracle=_COST_SQL)
def ml_cost_sensitive_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-sensitive threshold sweep for the behavioral score (same
    model/test split as ml_threshold_tuning) under an asymmetric cost
    matrix (missed converter = {_COST_FN}x a wasted outreach): expected
    cost per cut and the cost-argmin flag — F1 treats both error types
    equally, which almost no business does; this is the threshold the
    finance model actually wants, and comparing its argmin to the F1
    argmin quantifies what the symmetry assumption costs.

    Exactness: confusion counts are exact integers via the constant
    threshold-grid cross join; expected cost is one quantized linear
    tree; the argmin breaks ties toward the smaller threshold.

    Scale: user-grain aggregate -> constant 8x7 grid arithmetic."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = (
        e.filter(F.col("user_id") % 3 == 0)
        .groupBy("user_id")
        .agg(
            F.least(
                F.floor(
                    F.greatest(
                        F.sum(
                            F.when(F.col("event_type") == "click", 1).otherwise(
                                0
                            )
                        )
                        - 8,
                        F.lit(0),
                    )
                    / 2
                ),
                F.lit(6).cast("bigint"),
            )
            .cast("bigint")
            .alias("bin"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 100.0),
                    1,
                ).otherwise(0)
            ).alias("label"),
        )
    )
    bins = (
        pu.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("x"),
        )
        .transform(cut_lineage)
    )
    th = spark.range(0, 8).select(F.col("id").cast("bigint").alias("threshold"))
    conf = (
        bins.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(
                F.when(
                    F.col("bin") >= F.col("threshold"), F.col("n") - F.col("x")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(
                F.when(F.col("bin") < F.col("threshold"), F.col("x")).otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
        )
    )
    scored = conf.select(
        "threshold",
        "fp",
        "fn",
        _q6(F.lit(_COST_FP) * F.col("fp") + F.lit(_COST_FN) * F.col("fn")).alias(
            "expected_cost"
        ),
    ).transform(cut_lineage)
    mn = scored.agg(F.min("expected_cost").alias("mc"))
    best = (
        scored.crossJoin(F.broadcast(mn))
        .filter(F.col("expected_cost") == F.col("mc"))
        .agg(F.min("threshold").alias("bt"))
    )
    return scored.crossJoin(F.broadcast(best)).select(
        "threshold",
        F.col("fp").alias("n_false_positive"),
        F.col("fn").alias("n_false_negative"),
        "expected_cost",
        F.when(F.col("threshold") == F.col("bt"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_best"),
    )
