"""Round-5 batch-42 surface: Lorenz curve decile points, and the
autocorrelation-adjusted effective sample size of the daily series.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Lorenz curve decile points over per-customer revenue
# ---------------------------------------------------------------------------

_LORENZ_SQL = """
    WITH rev AS MATERIALIZED (
        SELECT o_custkey AS c,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 4)
                    AS DOUBLE) AS r
        FROM orders GROUP BY o_custkey
    ), ranked AS MATERIALIZED (
        SELECT c, r, ROW_NUMBER() OVER (ORDER BY r ASC, c ASC) AS i,
               COUNT(*) OVER () AS n
        FROM rev
    ), deciled AS MATERIALIZED (
        SELECT CAST(FLOOR((i - 1) * 10 / n) AS BIGINT) AS decile, r, n
        FROM ranked
    ), per_dec AS MATERIALIZED (
        SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(ROUND(SUM(CAST(r AS DECIMAL(38,10))), 4) AS DOUBLE) AS rev
        FROM deciled GROUP BY decile
    ), tot AS (
        SELECT CAST(ROUND(SUM(CAST(rev AS DECIMAL(38,10))), 4) AS DOUBLE)
                   AS total
        FROM per_dec
    )
    SELECT p.decile, p.n_customers,
           FLOOR(p.rev / t.total * 1e6 + 0.5) / 1e6 AS revenue_share,
           FLOOR(SUM(p.rev) OVER (ORDER BY p.decile) / t.total * 1e6 + 0.5)
               / 1e6 AS cum_revenue_share
    FROM per_dec p CROSS JOIN tot t
"""


@query("agg_lorenz_curve_points", oracle=_LORENZ_SQL)
def agg_lorenz_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve decile points over per-customer revenue: each
    revenue decile's share and the cumulative share up to it — the
    table BEHIND agg_revenue_concentration's Gini number (the Gini is
    the area; these are the curve points a dashboard actually plots,
    and "bottom 50% of customers hold X% of revenue" reads straight
    off them).

    Exactness: per-customer revenue and per-decile rollups are decimal
    sums; the global rank is distributed (range-partition + offsets);
    decile assignment uses explicit FLOOR (the DuckDB CAST-rounds
    trap); shares quantize at 1e-6 and the cumulative runs over the
    constant 10-row frame.

    Scale: customer-grain aggregate, one range shuffle, a 10-row
    reduction; the cumulative window spans 10 rows (constant grain —
    same class as ml_isotonic_calibration's allowlisted grid, spelled
    here as a window over the decile frame)."""
    from pyspark.sql import types as T

    t = _t(spark, sf_dir, "orders")
    rev = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(dsum("o_totalprice").alias("r"))
        .transform(cut_lineage)
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        rev.repartitionByRange(n_parts, F.asc("r"), F.asc("c"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "lr",
        F.row_number().over(W.partitionBy("pid").orderBy(F.asc("r"), F.asc("c"))),
    )
    offsets = cumulative_offsets(
        ranged.groupBy("pid").agg(F.count("*").alias("cnt"))
    )
    tot_n = ranged.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("i", F.col("lr") + F.col("off"))
        .crossJoin(F.broadcast(tot_n))
    )
    per_dec = (
        ranked.groupBy(
            F.floor((F.col("i") - 1) * 10 / F.col("n"))
            .cast("bigint")
            .alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            dsum("r").alias("rev"),
        )
        .transform(cut_lineage)
    )
    tot = per_dec.agg(dsum("rev").alias("total"))
    # cumulative over the CONSTANT 10-row decile frame via the
    # broadcast triangle join (window-free, guard-clean)
    a, b = per_dec.alias("a"), per_dec.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("decile"))
        .agg(
            F.round(
                F.sum(F.col("b.rev").cast(T.DecimalType(38, 10))), 4
            )
            .cast("double")
            .alias("cum_rev")
        )
    )
    return (
        per_dec.join(cum, "decile")
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_customers",
            _q6(F.col("rev") / F.col("total")).alias("revenue_share"),
            _q6(F.col("cum_rev") / F.col("total")).alias("cum_revenue_share"),
        )
    )


# ---------------------------------------------------------------------------
# Effective sample size of the daily revenue series
# ---------------------------------------------------------------------------

_ESS_LAGS = (1, 2, 3)

_ESS_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS d,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('y')} AS sy, {dsum_expr('y * y')} AS syy
        FROM daily
    ), lags AS MATERIALIZED (
        {' UNION ALL '.join(
            f'''SELECT {k} AS k,
                CAST(COUNT(*) AS BIGINT) AS np,
                {dsum_expr('a.y * b.y')} AS sxy,
                {dsum_expr('a.y')} AS sxa, {dsum_expr('b.y')} AS sxb
                FROM daily a JOIN daily b ON b.d = a.d + {k}'''
            for k in _ESS_LAGS)}
    ), rs AS MATERIALIZED (
        SELECT l.k,
               FLOOR((l.sxy - l.sxa * l.sxb / l.np)
                     / ((m.syy - m.sy * m.sy / m.n) / m.n * l.np)
                     * 1e6 + 0.5) / 1e6 AS r
        FROM lags l CROSS JOIN mom m
    ), ess AS (
        SELECT {dsum_expr('r')} AS rsum FROM rs
    )
    SELECT m.n AS n_days,
           (SELECT MAX(CASE WHEN k = 1 THEN r END) FROM rs) AS r1,
           (SELECT MAX(CASE WHEN k = 2 THEN r END) FROM rs) AS r2,
           (SELECT MAX(CASE WHEN k = 3 THEN r END) FROM rs) AS r3,
           FLOOR(m.n / (1.0 + 2.0 * e.rsum) * 1e6 + 0.5) / 1e6
               AS effective_n
    FROM mom m CROSS JOIN ess e
"""


@query("ts_effective_sample_size", oracle=_ESS_SQL)
def ts_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation-adjusted effective sample size of the daily
    revenue series: n / (1 + 2*(r1 + r2 + r3)) — the number every
    "mean of the last 30 days, +/- SE" readout silently needs
    (positively autocorrelated days are NOT 30 independent samples, so
    naive standard errors are too tight; ts_autocorrelation reports
    the r's, this converts them into the honest n).

    Exactness: per-lag covariance moments are decimal sums over
    calendar-aligned pairs; each r quantizes at 1e-6 before the ESS
    formula (decimal-summed over the 3-lag support); one quantized
    division out.

    Scale: one shuffle to the daily grain; lag alignments are keyed
    self-joins on the day integer; 1-row output."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
            .cast("bigint")
            .alias("d")
        )
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("y").alias("sy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    lag_rows = None
    for k in _ESS_LAGS:
        row = (
            a.join(b, F.col("db") == F.col("da") + k)
            .agg(
                F.lit(k).alias("k"),
                F.count(F.lit(1)).cast("bigint").alias("np"),
                dsum(F.col("ya") * F.col("yb")).alias("sxy"),
                dsum("ya").alias("sxa"),
                dsum("yb").alias("sxb"),
            )
        )
        lag_rows = row if lag_rows is None else lag_rows.unionAll(row)
    rs = lag_rows.crossJoin(F.broadcast(mom)).select(
        "k",
        _q6(
            (F.col("sxy") - F.col("sxa") * F.col("sxb") / F.col("np"))
            / (
                (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
                / F.col("n")
                * F.col("np")
            )
        ).alias("r"),
    ).transform(cut_lineage)
    ess = rs.agg(dsum("r").alias("rsum"))
    rwide = rs.groupBy().pivot("k", list(_ESS_LAGS)).agg(F.first("r"))
    return (
        mom.crossJoin(F.broadcast(ess))
        .crossJoin(F.broadcast(rwide))
        .select(
            F.col("n").alias("n_days"),
            F.col("1").alias("r1"),
            F.col("2").alias("r2"),
            F.col("3").alias("r3"),
            _q6(
                F.col("n") / (F.lit(1.0) + F.lit(2.0) * F.col("rsum"))
            ).alias("effective_n"),
        )
    )
