"""Round-5 batch-41 surface: Poisson overdispersion test and the
new-product revenue share by month.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Poisson overdispersion test on per-user purchase counts
# ---------------------------------------------------------------------------

_DISP_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS k
        FROM events GROUP BY user_id
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(k) AS BIGINT) AS s1,
               CAST(SUM(k * k) AS BIGINT) AS s2
        FROM pu
    )
    SELECT n AS n_users,
           FLOOR(CAST(s1 AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS mean_count,
           FLOOR((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)
                 * 1e6 + 0.5) / 1e6 AS var_count,
           FLOOR(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                 / (CAST(s1 AS DOUBLE) / n) * 1e6 + 0.5) / 1e6
               AS dispersion_ratio,
           FLOOR((n - 1.0)
                 * ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
                 / (CAST(s1 AS DOUBLE) / n) * 1e6 + 0.5) / 1e6
               AS dispersion_chi2
    FROM mom
"""


@query("stat_poisson_dispersion", oracle=_DISP_SQL)
def stat_poisson_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion test on per-user purchase counts: the
    variance-to-mean dispersion ratio and the (n-1)*var/mean
    chi-square — the assumption audit BEHIND stat_bayes_poisson_rates
    and every Poisson rate model (ratio >> 1 means user heterogeneity;
    a negative-binomial model and wider intervals are then required —
    using Poisson anyway silently overstates significance).

    Exactness: counts and their squares are exact integer sums; all
    four outputs are fixed IEEE trees on those integers, quantized at
    1e-6.

    Scale: one user-grain aggregate and a 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint")
        .alias("k")
    )
    mom = pu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("s1"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    return mom.select(
        F.col("n").alias("n_users"),
        _q6(mean).alias("mean_count"),
        _q6(var).alias("var_count"),
        _q6(var / mean).alias("dispersion_ratio"),
        _q6((F.col("n") - F.lit(1.0)) * var / mean).alias("dispersion_chi2"),
    )


# ---------------------------------------------------------------------------
# New-product revenue share by ship month
# ---------------------------------------------------------------------------

_NEWP_SQL = f"""
    WITH lines AS MATERIALIZED (
        SELECT l_partkey,
               CAST(DATE_TRUNC('month', l_shipdate) AS TIMESTAMP) AS mo,
               l_extendedprice * (1 - l_discount) AS net
        FROM lineitem
    ), firstm AS MATERIALIZED (
        SELECT l_partkey, MIN(mo) AS first_mo FROM lines GROUP BY 1
    ), monthly AS MATERIALIZED (
        SELECT l.mo,
               {dsum_expr('l.net')} AS revenue,
               {dsum_expr('CASE WHEN l.mo = f.first_mo THEN l.net END')}
                   AS new_revenue,
               CAST(COUNT(DISTINCT CASE WHEN l.mo = f.first_mo
                                        THEN l.l_partkey END) AS BIGINT)
                   AS n_new_parts
        FROM lines l JOIN firstm f USING (l_partkey)
        GROUP BY l.mo
    )
    SELECT mo AS month, revenue,
           COALESCE(new_revenue, 0.0) AS new_revenue,
           n_new_parts,
           FLOOR(COALESCE(new_revenue, 0.0) / revenue * 1e6 + 0.5) / 1e6
               AS new_share
    FROM monthly
"""


@query("ts_new_product_share", oracle=_NEWP_SQL)
def ts_new_product_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-product revenue share by ship month: a part is "new" in its
    first-ever ship month, and the share of each month's revenue
    carried by first-month parts measures assortment refresh — the
    innovation-dependence dial (high share = launch-driven business,
    falling share = aging catalog) that ts_brand_momentum's movers
    table cannot see because it conditions on already-established
    brands.

    Exactness: first months are exact minima; monthly and new revenue
    are decimal-contract sums over identical per-line terms; the share
    is one quantized division.

    Scale: one part-grain min, one broadcast-joinable month rollup —
    two map-side-combinable aggregates."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    lines = li.select(
        "l_partkey",
        F.date_trunc("month", "l_shipdate").alias("mo"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "net"
        ),
    )
    firstm = (
        lines.groupBy("l_partkey")
        .agg(F.min("mo").alias("first_mo"))
        .transform(cut_lineage)
    )
    monthly = (
        lines.join(firstm, "l_partkey")
        .groupBy("mo")
        .agg(
            dsum("net").alias("revenue"),
            dsum(
                F.when(F.col("mo") == F.col("first_mo"), F.col("net"))
            ).alias("new_revenue"),
            F.countDistinct(
                F.when(F.col("mo") == F.col("first_mo"), F.col("l_partkey"))
            )
            .cast("bigint")
            .alias("n_new_parts"),
        )
    )
    return monthly.select(
        F.col("mo").alias("month"),
        "revenue",
        F.coalesce(F.col("new_revenue"), F.lit(0.0)).alias("new_revenue"),
        "n_new_parts",
        _q6(
            F.coalesce(F.col("new_revenue"), F.lit(0.0)) / F.col("revenue")
        ).alias("new_share"),
    )
