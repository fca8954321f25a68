"""Round-5 batch-37 surface: seasonally-adjusted anomaly days, linear
score recalibration, and cross-sectional brand momentum.

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
# Seasonally-adjusted anomaly days (decomposition residual + MAD)
# ---------------------------------------------------------------------------

_SAA_K = 3.0  # MAD multiplier

_SAA_SQL = f"""
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
        SELECT d.day, d.y, d.y - se.s AS r
        FROM dows d JOIN seas se USING (dow)
    ), med AS (
        SELECT ROUND(QUANTILE_CONT(r, 0.5), 4) AS m FROM resid
    ), mad AS (
        SELECT m, ROUND(QUANTILE_CONT(ABS(r - m), 0.5), 4) AS md
        FROM resid CROSS JOIN med GROUP BY m
    )
    SELECT r.day, r.y,
           FLOOR(r.r * 1e6 + 0.5) / 1e6 AS seasonal_residual,
           FLOOR((r.r - mad.m) / (1.4826 * mad.md) * 1e6 + 0.5) / 1e6
               AS robust_z,
           CAST(CASE WHEN ABS(r.r - mad.m) > {_SAA_K} * 1.4826 * mad.md
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM resid r CROSS JOIN mad
"""


@query("ts_seasonal_adjusted_anomaly", oracle=_SAA_SQL)
def ts_seasonal_adjusted_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection: remove the day-of-week
    mean profile from daily revenue, then flag days whose residual
    exceeds {_SAA_K} robust (MAD-scaled) sigmas — the deseasonalized
    detector that stops crying wolf every weekend, which is exactly
    what a raw z-score over the seasonal series does
    (ts_anomaly_zscore flags structure; this flags only the part the
    calendar cannot explain).

    Exactness: daily values and dow means are decimal-contract
    sums/means; median and MAD use the shared quantile contract
    (1e-4); residuals, robust z, and the flag are fixed IEEE trees
    (flag computed on the unquantized threshold — identical both
    engines), quantized at 1e-6 on output.

    Scale: one shuffle to the daily grain, a 7-row seasonal profile
    broadcast back, two single-pass quantiles over the |days| frame."""
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
        "day", "y", (F.col("y") - F.col("s")).alias("r")
    ).transform(cut_lineage)
    med = resid.agg(F.round(F.percentile("r", F.lit(0.5)), 4).alias("m"))
    mad = (
        resid.crossJoin(F.broadcast(med))
        .agg(
            F.any_value("m").alias("m"),
            F.round(
                F.percentile(F.abs(F.col("r") - F.col("m")), F.lit(0.5)), 4
            ).alias("md"),
        )
    )
    scale = F.lit(1.4826) * F.col("md")
    return resid.crossJoin(F.broadcast(mad)).select(
        "day",
        "y",
        _q6(F.col("r")).alias("seasonal_residual"),
        _q6((F.col("r") - F.col("m")) / scale).alias("robust_z"),
        F.when(F.abs(F.col("r") - F.col("m")) > F.lit(_SAA_K) * scale, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# Linear recalibration of the behavioral score
# ---------------------------------------------------------------------------

_CALIB_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               CAST(LEAST(GREATEST(SUM(CASE WHEN event_type = 'click'
                                            THEN 1 ELSE 0 END) - 8, 0) // 2, 6)
                    AS BIGINT) AS bin,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label,
               user_id % 3 = 0 AS is_test
        FROM events GROUP BY user_id
    ), train AS MATERIALIZED (
        SELECT bin, SUM(label) * 1.0 / COUNT(*) AS pred
        FROM pu WHERE NOT is_test GROUP BY bin
    ), test AS MATERIALIZED (
        SELECT p.label * 1.0 AS yv, t.pred AS xv
        FROM pu p JOIN train t USING (bin) WHERE p.is_test
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('xv')} AS sx, {dsum_expr('yv')} AS sy,
               {dsum_expr('xv * xv')} AS sxx, {dsum_expr('xv * yv')} AS sxy
        FROM test
    )
    SELECT n AS n_test,
           FLOOR(sy / n * 1e6 + 0.5) / 1e6 AS observed_rate,
           FLOOR(sx / n * 1e6 + 0.5) / 1e6 AS mean_predicted,
           FLOOR((sxy - sx * sy / n) / (sxx - sx * sx / n) * 1e6 + 0.5) / 1e6
               AS calib_slope,
           FLOOR((sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                          * (sx / n)) * 1e6 + 0.5) / 1e6 AS calib_intercept
    FROM mom
"""


@query("ml_calibration_linear", oracle=_CALIB_SQL)
def ml_calibration_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear recalibration line for the behavioral score (same model
    and split as the calibration family): regress test labels on
    train-bin predicted rates — slope ~1 and intercept ~0 mean the
    score is calibrated; slope < 1 means over-confident spread
    (shrink), intercept > 0 means global under-prediction
    (calibration-in-the-large). This is the FIX direction the
    diagnostics point at: ml_ece_calibration measures miscalibration,
    the (slope, intercept) pair is the one-line correction a serving
    layer applies.

    Exactness: predicted rates are exact-integer rationals; the test
    regression moments are decimal-contract sums; slope/intercept are
    fixed quantized trees.

    Scale: user-grain aggregate, constant bin grain broadcast back, a
    1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy("user_id").agg(
        F.least(
            F.floor(
                F.greatest(
                    F.sum(
                        F.when(F.col("event_type") == "click", 1).otherwise(0)
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
                (F.col("event_type") == "purchase") & (F.col("value") >= 100.0),
                1,
            ).otherwise(0)
        ).alias("label"),
    ).withColumn("is_test", F.col("user_id") % 3 == 0)
    train = (
        pu.filter(~F.col("is_test"))
        .groupBy("bin")
        .agg((F.sum("label") * F.lit(1.0) / F.count(F.lit(1))).alias("pred"))
        .transform(cut_lineage)
    )
    test = (
        pu.filter(F.col("is_test"))
        .join(F.broadcast(train), "bin")
        .select(
            (F.col("label") * F.lit(1.0)).alias("yv"), F.col("pred").alias("xv")
        )
    )
    mom = test.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("xv").alias("sx"),
        dsum("yv").alias("sy"),
        dsum(F.col("xv") * F.col("xv")).alias("sxx"),
        dsum(F.col("xv") * F.col("yv")).alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    return mom.select(
        F.col("n").alias("n_test"),
        _q6(F.col("sy") / F.col("n")).alias("observed_rate"),
        _q6(F.col("sx") / F.col("n")).alias("mean_predicted"),
        _q6(slope).alias("calib_slope"),
        _q6(F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n"))).alias(
            "calib_intercept"
        ),
    )


# ---------------------------------------------------------------------------
# Cross-sectional brand momentum (latest vs previous month)
# ---------------------------------------------------------------------------

_MOM_TOP = 10

_MOM_SQL = f"""
    WITH monthly AS MATERIALIZED (
        SELECT p.p_brand,
               CAST(DATE_TRUNC('month', l.l_shipdate) AS TIMESTAMP) AS mo,
               {dsum_expr('l.l_extendedprice * (1 - l.l_discount)')} AS rev
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ), mm AS (
        SELECT MAX(mo) AS m1 FROM monthly
    ), lastm AS MATERIALIZED (
        SELECT p_brand, rev AS rev_last FROM monthly, mm WHERE mo = m1
    ), prevm AS MATERIALIZED (
        SELECT p_brand, rev AS rev_prev FROM monthly, mm
        WHERE mo = m1 - INTERVAL 1 MONTH
    )
    SELECT l.p_brand, l.rev_last, p.rev_prev,
           FLOOR((l.rev_last / p.rev_prev - 1.0) * 1e6 + 0.5) / 1e6
               AS momentum
    FROM lastm l JOIN prevm p USING (p_brand)
    ORDER BY momentum DESC, p_brand ASC
    LIMIT {_MOM_TOP}
"""


@query("ts_brand_momentum", oracle=_MOM_SQL)
def ts_brand_momentum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-sectional brand momentum: the top-{_MOM_TOP} brands by
    latest-month vs previous-month revenue growth — the movers table a
    merchandising review opens with (ts_week_over_week tracks the
    whole portfolio through time; momentum ranks the cross-section at
    the latest tick, which is where assortment decisions happen).
    Brands without revenue in both months drop out (growth undefined)
    — documented inner-join semantics.

    Exactness: monthly revenues are decimal-contract sums; the growth
    ratio is one quantized division on exact scale-4 doubles; the
    top-{_MOM_TOP} orders by the quantized value with the brand
    breaking ties.

    Scale: one join shuffle to the (brand, month) grain; the latest/
    previous lookups are tiny keyed joins; the top-{_MOM_TOP} is
    TakeOrdered."""
    t = _t(spark, sf_dir, "lineitem", "part")
    monthly = (
        t["lineitem"]
        .join(
            t["part"].select("p_partkey", "p_brand"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", F.date_trunc("month", "l_shipdate").alias("mo"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("rev")
        )
        .transform(cut_lineage)
    )
    mm = monthly.agg(F.max("mo").alias("m1"))
    lastm = (
        monthly.crossJoin(F.broadcast(mm))
        .filter(F.col("mo") == F.col("m1"))
        .select("p_brand", F.col("rev").alias("rev_last"))
    )
    prevm = (
        monthly.crossJoin(F.broadcast(mm))
        .filter(F.col("mo") == F.col("m1") - F.expr("INTERVAL 1 MONTH"))
        .select("p_brand", F.col("rev").alias("rev_prev"))
    )
    return (
        lastm.join(prevm, "p_brand")
        .select(
            "p_brand",
            "rev_last",
            "rev_prev",
            _q6(F.col("rev_last") / F.col("rev_prev") - F.lit(1.0)).alias(
                "momentum"
            ),
        )
        .orderBy(F.col("momentum").desc(), F.col("p_brand").asc())
        .limit(_MOM_TOP)
    )
