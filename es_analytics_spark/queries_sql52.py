"""Round-7 batch-52 surface: circular statistics of event timing
(Rayleigh uniformity), negative-binomial overdispersion fit, and the
Murphy decomposition of the Brier score.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Circular statistics of event hour-of-day + Rayleigh uniformity test
# ---------------------------------------------------------------------------


def _hour_twiddles() -> list[tuple[int, float, float]]:
    """(hour, cos, sin) literals — Python-precomputed once and embedded
    identically in both plans (the ts_periodogram_fixed precedent), so
    neither engine evaluates a trig function."""
    return [
        (h, math.cos(2.0 * math.pi * h / 24.0), math.sin(2.0 * math.pi * h / 24.0))
        for h in range(24)
    ]


def _circ_sql() -> str:
    tw = " UNION ALL ".join(
        f"SELECT {h} AS h, {c!r} AS cs, {s!r} AS sn" for h, c, s in _hour_twiddles()
    )
    return f"""
    WITH hours AS MATERIALIZED (
        SELECT event_type, CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS h,
               COUNT(*) AS n_h
        FROM events GROUP BY event_type, EXTRACT(HOUR FROM ts)
    ), sums AS (
        SELECT e.event_type, CAST(SUM(e.n_h) AS BIGINT) AS n,
               {dsum_expr('e.n_h * t.cs')} AS c,
               {dsum_expr('e.n_h * t.sn')} AS s
        FROM hours e JOIN ({tw}) t ON t.h = e.h
        GROUP BY e.event_type
    )
    SELECT event_type, n,
           FLOOR(SQRT(c * c + s * s) / n * 1e6 + 0.5) / 1e6
               AS resultant_length,
           FLOOR(n * ((c * c + s * s) / (CAST(n AS DOUBLE) * n)) * 1e6 + 0.5)
               / 1e6 AS rayleigh_z,
           FLOOR(EXP(FLOOR(-n * ((c * c + s * s)
                 / (CAST(n AS DOUBLE) * n)) * 1e6 + 0.5) / 1e6) * 1e6 + 0.5)
               / 1e6 AS p_approx,
           EXP(FLOOR(-n * ((c * c + s * s) / (CAST(n AS DOUBLE) * n))
               * 1e6 + 0.5) / 1e6) < 0.05 AS nonuniform
    FROM sums
    ORDER BY event_type
"""


@query("ts_hour_circular_stats", oracle=_circ_sql())
def ts_hour_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular statistics of event hour-of-day per type: the mean
    resultant length R (0 = uniformly spread around the clock, 1 =
    concentrated at one hour) and the Rayleigh uniformity test
    z = n*R^2 with p ~ e^-z — the CORRECT way to ask "does this event
    type have a time-of-day pattern": linear statistics on hours are
    wrong at the 23->0 wraparound (the mean of 23h and 1h is midnight,
    not noon), which is exactly what circular moments fix.
    ts_seasonal_profile shows the day-of-week shape; this scores the
    within-day clock concentration with an actual test.

    Exactness: the 24 (cos, sin) twiddles are Python-precomputed
    literals shared by both plans; hour counts are exact integers; the
    weighted component sums go through the decimal contract; R, z, and
    the EXP p-value quantize per the transcendental contract.

    Scale: one events scan to the |types| x 24 grain; the twiddle
    table is a 24-row broadcast; everything downstream is
    |types|-sized."""
    ev = _t(spark, sf_dir, "events")["events"]
    hours = (
        ev.groupBy("event_type", F.hour("ts").cast("bigint").alias("h"))
        .agg(F.count("*").alias("n_h"))
        .transform(cut_lineage)
    )
    tw = spark.createDataFrame(_hour_twiddles(), "h long, cs double, sn double")
    sums = (
        hours.join(F.broadcast(tw), "h")
        .groupBy("event_type")
        .agg(
            F.sum("n_h").cast("bigint").alias("n"),
            dsum(F.col("n_h") * F.col("cs")).alias("c"),
            dsum(F.col("n_h") * F.col("sn")).alias("s"),
        )
    )
    n = F.col("n").cast("double")
    r2 = (F.col("c") * F.col("c") + F.col("s") * F.col("s")) / (n * n)
    z_q = _q6(F.col("n") * r2)
    neg_z_q = F.floor(-F.col("n") * r2 * 1e6 + F.lit(0.5)) / 1e6
    return sums.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        _q6(F.sqrt(F.col("c") * F.col("c") + F.col("s") * F.col("s")) / n).alias(
            "resultant_length"
        ),
        z_q.alias("rayleigh_z"),
        _q6(F.exp(neg_z_q)).alias("p_approx"),
        (F.exp(neg_z_q) < 0.05).alias("nonuniform"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Negative-binomial overdispersion fit (method of moments)
# ---------------------------------------------------------------------------

_NB_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY user_id
    ), m1 AS MATERIALIZED (
        SELECT COUNT(*) AS n, {dsum_expr('k')} / COUNT(k) AS m
        FROM pu
    ), m2 AS (
        SELECT MAX(x.n) AS n, MAX(x.m) AS m,
               CAST(ROUND(SUM(CAST((p.k - x.m) * (p.k - x.m)
                                   AS DECIMAL(38,6))), 4) AS DOUBLE)
                   / (MAX(x.n) - 1) AS v
        FROM pu p CROSS JOIN m1 x GROUP BY 'x'
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           FLOOR(m * 1e6 + 0.5) / 1e6 AS mean_count,
           FLOOR(v * 1e6 + 0.5) / 1e6 AS var_count,
           FLOOR(v / m * 1e6 + 0.5) / 1e6 AS dispersion_ratio,
           CASE WHEN v > m THEN FLOOR(m * m / (v - m) * 1e6 + 0.5) / 1e6
                ELSE NULL END AS nb_r,
           CASE WHEN v > m THEN FLOOR(m / v * 1e6 + 0.5) / 1e6
                ELSE NULL END AS nb_p,
           v > m AS overdispersed
    FROM m2
"""


@query("stat_negbin_fit_mom", oracle=_NB_SQL)
def stat_negbin_fit_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit (method of moments) of per-user event
    counts: r = m^2/(v - m), p = m/v from the exact mean/variance —
    the canonical model for overdispersed activity counts.
    stat_poisson_dispersion DETECTS overdispersion; this fit gives the
    replacement model's parameters (r is the heterogeneity dial — the
    gamma shape of the per-user rate mixture — which capacity planning
    and per-user simulation consume). Under-dispersed data reports
    NULL parameters with the flag down (NB is undefined there).

    Exactness: counts are exact integers; mean via the decimal
    contract and variance via the DECIMAL(38,6) deviation recipe; the
    parameter transforms are fixed trees, quantized at 1e6.

    Scale: user-grain count aggregate, 1-row moment reductions —
    nothing downstream exceeds one row."""
    from pyspark.sql.types import DecimalType

    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("k"))
        .transform(cut_lineage)
    )
    m1 = pu.agg(
        F.count("*").alias("n"), (dsum(F.col("k")) / F.count("k")).alias("m")
    )
    m2 = (
        pu.crossJoin(F.broadcast(m1))
        .agg(
            F.max("n").alias("n"),
            F.max("m").alias("m"),
            (
                F.round(
                    F.sum(
                        ((F.col("k") - F.col("m")) * (F.col("k") - F.col("m"))).cast(
                            DecimalType(38, 6)
                        )
                    ),
                    4,
                ).cast("double")
                / (F.max("n") - 1)
            ).alias("v"),
        )
    )
    m, v = F.col("m"), F.col("v")
    return m2.select(
        F.col("n").cast("bigint").alias("n_users"),
        _q6(m).alias("mean_count"),
        _q6(v).alias("var_count"),
        _q6(v / m).alias("dispersion_ratio"),
        F.when(v > m, _q6(m * m / (v - m))).alias("nb_r"),
        F.when(v > m, _q6(m / v)).alias("nb_p"),
        (v > m).alias("overdispersed"),
    )


# ---------------------------------------------------------------------------
# Murphy decomposition of the Brier score
# ---------------------------------------------------------------------------

_MD_SQL = """
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               CAST(LEAST(GREATEST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                                   - 8, 0) // 2, 6) AS BIGINT) AS bin,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label,
               user_id % 3 = 0 AS is_test
        FROM events GROUP BY user_id
    ), train AS (
        SELECT bin, COUNT(*) AS n_train, SUM(label) AS x_train
        FROM pu WHERE NOT is_test GROUP BY bin
    ), test AS (
        SELECT bin, COUNT(*) AS n_test, SUM(label) AS x_test
        FROM pu WHERE is_test GROUP BY bin
    ), joined AS MATERIALIZED (
        SELECT t.bin, t.x_train * 1.0 / t.n_train AS pred,
               COALESCE(s.n_test, 0) AS n_test, COALESCE(s.x_test, 0) AS x_test
        FROM train t LEFT JOIN test s ON s.bin = t.bin
    ), base AS (
        SELECT CAST(SUM(n_test) AS BIGINT) AS n,
               CAST(SUM(x_test) AS BIGINT) AS x
        FROM joined
    ), parts AS (
        SELECT b.n, b.x,
               CAST(ROUND(SUM(CAST(j.n_test
                   * (j.pred - CASE WHEN j.n_test = 0 THEN 0.0
                               ELSE j.x_test * 1.0 / j.n_test END)
                   * (j.pred - CASE WHEN j.n_test = 0 THEN 0.0
                               ELSE j.x_test * 1.0 / j.n_test END)
                   AS DECIMAL(38,10))), 6) AS DOUBLE) / b.n AS rel,
               CAST(ROUND(SUM(CAST(j.n_test
                   * ((CASE WHEN j.n_test = 0 THEN 0.0
                       ELSE j.x_test * 1.0 / j.n_test END)
                      - b.x * 1.0 / b.n)
                   * ((CASE WHEN j.n_test = 0 THEN 0.0
                       ELSE j.x_test * 1.0 / j.n_test END)
                      - b.x * 1.0 / b.n)
                   AS DECIMAL(38,10))), 6) AS DOUBLE) / b.n AS res
        FROM joined j CROSS JOIN base b
        GROUP BY b.n, b.x
    )
    SELECT CAST(n AS BIGINT) AS n_test,
           FLOOR(rel * 1e6 + 0.5) / 1e6 AS reliability,
           FLOOR(res * 1e6 + 0.5) / 1e6 AS resolution,
           FLOOR((x * 1.0 / n) * (1.0 - x * 1.0 / n) * 1e6 + 0.5) / 1e6
               AS uncertainty,
           FLOOR((rel - res + (x * 1.0 / n) * (1.0 - x * 1.0 / n)) * 1e6 + 0.5)
               / 1e6 AS brier_score
    FROM parts
"""


@query("ml_brier_decomposition", oracle=_MD_SQL)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the behavioral
    score ml_calibration_brier evaluates: BS = REL - RES + UNC, where
    reliability is the calibration gap (0 is perfect — fixable by
    recalibration), resolution is the discrimination the score
    actually has (NOT fixable by recalibration), and uncertainty is
    the base-rate entropy floor no model can beat. The single Brier
    number confounds these three; the decomposition says whether to
    recalibrate (high REL) or go get new features (low RES).

    Exactness: the bin/label/split construction is byte-identical to
    ml_calibration_brier's; per-bin predicted and observed rates are
    fixed trees over exact counts; the n-weighted quadratic terms sum
    through DECIMAL(38,10); components quantize at 1e6 and the
    reported Brier is the exact identity over the unquantized parts.

    Scale: user-grain aggregate to bins (<= 7 of them); every
    decomposition term runs on the bin grain."""
    ev = _t(spark, sf_dir, "events")["events"]
    from pyspark.sql.types import DecimalType

    pu = ev.groupBy("user_id").agg(
        F.least(
            F.greatest(
                F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)) - 8,
                F.lit(0),
            ).cast("bigint")
            / 2,
            F.lit(6).cast("bigint"),
        )
        .cast("bigint")
        .alias("bin"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1
            ).otherwise(0)
        ).alias("label"),
        (F.col("user_id") % 3 == 0).alias("is_test"),
    )
    pu = pu.withColumn("bin", F.floor(F.col("bin")).cast("bigint")).transform(
        cut_lineage
    )
    train = (
        pu.filter(~F.col("is_test"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_train"), F.sum("label").alias("x_train"))
    )
    test = (
        pu.filter(F.col("is_test"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_test"), F.sum("label").alias("x_test"))
    )
    joined = (
        train.join(test, "bin", "left")
        .select(
            "bin",
            (F.col("x_train") * 1.0 / F.col("n_train")).alias("pred"),
            F.coalesce("n_test", F.lit(0)).alias("n_test"),
            F.coalesce("x_test", F.lit(0)).alias("x_test"),
        )
        .transform(cut_lineage)
    )
    base = joined.agg(
        F.sum("n_test").cast("bigint").alias("n"),
        F.sum("x_test").cast("bigint").alias("x"),
    )
    obs = F.when(F.col("n_test") == 0, F.lit(0.0)).otherwise(
        F.col("x_test") * 1.0 / F.col("n_test")
    )
    ybar = F.col("x") * 1.0 / F.col("n")
    dec10 = DecimalType(38, 10)
    parts = (
        joined.crossJoin(F.broadcast(base))
        .groupBy("n", "x")
        .agg(
            (
                F.round(
                    F.sum(
                        (
                            F.col("n_test") * (F.col("pred") - obs) * (F.col("pred") - obs)
                        ).cast(dec10)
                    ),
                    6,
                ).cast("double")
                / F.col("n")
            ).alias("rel"),
            (
                F.round(
                    F.sum((F.col("n_test") * (obs - ybar) * (obs - ybar)).cast(dec10)),
                    6,
                ).cast("double")
                / F.col("n")
            ).alias("res"),
        )
    )
    unc = (F.col("x") * 1.0 / F.col("n")) * (1.0 - F.col("x") * 1.0 / F.col("n"))
    return parts.select(
        F.col("n").cast("bigint").alias("n_test"),
        _q6(F.col("rel")).alias("reliability"),
        _q6(F.col("res")).alias("resolution"),
        _q6(unc).alias("uncertainty"),
        _q6(F.col("rel") - F.col("res") + unc).alias("brier_score"),
    )
