"""Round-5 batch-34 surface: a KS uniformity audit of the engine's
portable sampling hash, and exact two-feature Shapley attribution of
regression R^2.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.fanout import fan_out
from es_analytics_spark.functions.portable import (
    MIX_P as _MIX_P,
    accept_hash as _accept_hash,
    accept_hash_sql as _accept_hash_sql,
)
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# KS uniformity audit of the portable LCG sampling hash
# ---------------------------------------------------------------------------

_HASHU_SQL = f"""
    WITH hs AS MATERIALIZED (
        SELECT DISTINCT user_id,
               CAST({_accept_hash_sql('user_id')} AS DOUBLE) / {_MIX_P} AS u
        FROM events
    ), ranked AS (
        SELECT u, ROW_NUMBER() OVER (ORDER BY u ASC, user_id ASC) AS i,
               COUNT(*) OVER () AS n
        FROM hs
    ), ks AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               MAX(CAST(i AS DOUBLE) / n - u) AS dplus,
               MAX(u - (CAST(i AS DOUBLE) - 1) / n) AS dminus
        FROM ranked
    )
    SELECT n AS n_keys,
           FLOOR(GREATEST(dplus, dminus) * 1e6 + 0.5) / 1e6 AS ks_d,
           FLOOR(GREATEST(dplus, dminus) * SQRT(CAST(n AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS ks_stat
    FROM ks
"""


@query("stat_hash_uniformity", oracle=_HASHU_SQL)
def stat_hash_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov-Smirnov uniformity audit of the engine's portable LCG
    sampling hash over the live key population: D and sqrt(n)*D
    against U(0,1) — the empirical justification behind every
    rate-based sampler and KMV sketch in the catalog (they all assume
    this hash is uniform on the ACTUAL keys; sqrt(n)*D around ~1 is
    healthy, >> 1.63 rejects at 1%). Auditing one's own randomness
    source is the difference between assuming and knowing.

    Exactness: hash values are exact integer rationals over the shared
    modulus; ranks come from the distributed range-rank recipe (no
    single-partition window); D+/D- are exact-tree maxima quantized at
    1e-6.

    Scale: one distinct over keys, one range shuffle for the rank, a
    1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    hs = (
        e.select("user_id")
        .distinct()
        .withColumn(
            "u", _accept_hash(F.col("user_id")).cast("double") / F.lit(_MIX_P)
        )
        .transform(cut_lineage)
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        hs.repartitionByRange(n_parts, F.asc("u"), F.asc("user_id"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "lr",
        F.row_number().over(
            W.partitionBy("pid").orderBy(F.asc("u"), F.asc("user_id"))
        ),
    )
    offsets = cumulative_offsets(
        ranged.groupBy("pid").agg(F.count("*").alias("cnt"))
    )
    tot = ranged.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("i", F.col("lr") + F.col("off"))
        .crossJoin(F.broadcast(tot))
    )
    ks = ranked.agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.col("i").cast("double") / F.col("n") - F.col("u")).alias(
            "dplus"
        ),
        F.max(
            F.col("u") - (F.col("i").cast("double") - 1) / F.col("n")
        ).alias("dminus"),
    )
    d = F.greatest(F.col("dplus"), F.col("dminus"))
    return ks.select(
        F.col("n").alias("n_keys"),
        _q6(d).alias("ks_d"),
        _q6(d * F.sqrt(F.col("n").cast("double"))).alias("ks_stat"),
    )


# ---------------------------------------------------------------------------
# Exact Shapley attribution of two-feature regression R^2
# ---------------------------------------------------------------------------

_SHAP_SQL = f"""
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('l_quantity')} AS s1,
               {dsum_expr('l_discount')} AS s2,
               {dsum_expr('l_extendedprice / 1000.0')} AS sy,
               {dsum_expr('l_quantity * l_quantity')} AS s11,
               {dsum_expr('l_discount * l_discount')} AS s22,
               {dsum_expr('l_quantity * l_discount')} AS s12,
               {dsum_expr('l_quantity * (l_extendedprice / 1000.0)')} AS s1y,
               {dsum_expr('l_discount * (l_extendedprice / 1000.0)')} AS s2y,
               {dsum_expr('(l_extendedprice / 1000.0)'
                          ' * (l_extendedprice / 1000.0)')} AS syy
        FROM lineitem
    ), c AS (
        SELECT n,
               s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
               s2y - s2 * sy / n AS c2y, syy - sy * sy / n AS cyy
        FROM s
    ), r2s AS (
        SELECT n,
               c1y * c1y / (c11 * cyy) AS r2_1,
               c2y * c2y / (c22 * cyy) AS r2_2,
               ((c22 * c1y - c12 * c2y) * c1y + (c11 * c2y - c12 * c1y) * c2y)
                   / ((c11 * c22 - c12 * c12) * cyy) AS r2_12
        FROM c
    )
    SELECT n AS n_rows,
           FLOOR(r2_12 * 1e6 + 0.5) / 1e6 AS r2_full,
           FLOOR(r2_1 * 1e6 + 0.5) / 1e6 AS r2_quantity_only,
           FLOOR(r2_2 * 1e6 + 0.5) / 1e6 AS r2_discount_only,
           FLOOR((0.5 * r2_1 + 0.5 * (r2_12 - r2_2)) * 1e6 + 0.5) / 1e6
               AS shapley_quantity,
           FLOOR((0.5 * r2_2 + 0.5 * (r2_12 - r2_1)) * 1e6 + 0.5) / 1e6
               AS shapley_discount
    FROM r2s
"""


@query("ml_shapley_r2_two_features", oracle=_SHAP_SQL)
def ml_shapley_r2_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley attribution of the two-feature OLS R^2
    (ml_ols_two_features' model): with two players the Shapley value
    is the closed-form average of each feature's solo R^2 and its
    marginal contribution on top of the other —
    phi_1 = (R^2_1 + R^2_12 - R^2_2) / 2 — and the two values sum to
    R^2_12 by construction (the efficiency axiom, checkable from the
    output). This is the game-theoretic "which feature earns the fit"
    answer that correlation screens (ml_feature_selection_mrmr) only
    approximate, computed exactly because the sub-models are all
    closed-form from the SAME Gram moments — no refits, no sampling.

    Exactness: one decimal-contract moment pass (shared with the OLS
    entry, y pre-scaled by 1e-3 for the dsum bound); every sub-model
    R^2 and both Shapley values are one fixed IEEE tree, quantized at
    1e-6.

    Scale: a single map-side-combinable aggregate; everything after is
    1-row arithmetic — the k-feature generalization costs 2^k
    closed-form evaluations of the same moments, not 2^k refits."""
    # spread the 10-moment decimal aggregation out of the single-task
    # scan stage (layout-adaptive; exact-sum contract makes the result
    # partitioning-independent)
    li = fan_out(
        _t(spark, sf_dir, "lineitem")["lineitem"],
        sf_dir, "lineitem", "l_orderkey", weight=4,
    )
    yk = F.col("l_extendedprice") / F.lit(1000.0)
    x1, x2 = F.col("l_quantity"), F.col("l_discount")
    s = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(yk).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * x2).alias("s12"),
        dsum(x1 * yk).alias("s1y"),
        dsum(x2 * yk).alias("s2y"),
        dsum(yk * yk).alias("syy"),
    )
    n = F.col("n")
    c = s.select(
        "n",
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("cyy"),
    )
    r2_1 = F.col("c1y") * F.col("c1y") / (F.col("c11") * F.col("cyy"))
    r2_2 = F.col("c2y") * F.col("c2y") / (F.col("c22") * F.col("cyy"))
    r2_12 = (
        (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) * F.col("c1y")
        + (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y"))
        * F.col("c2y")
    ) / ((F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")) * F.col("cyy"))
    r2s = c.select(
        "n",
        r2_1.alias("r2_1"),
        r2_2.alias("r2_2"),
        r2_12.alias("r2_12"),
    )
    return r2s.select(
        F.col("n").alias("n_rows"),
        _q6(F.col("r2_12")).alias("r2_full"),
        _q6(F.col("r2_1")).alias("r2_quantity_only"),
        _q6(F.col("r2_2")).alias("r2_discount_only"),
        _q6(
            F.lit(0.5) * F.col("r2_1")
            + F.lit(0.5) * (F.col("r2_12") - F.col("r2_2"))
        ).alias("shapley_quantity"),
        _q6(
            F.lit(0.5) * F.col("r2_2")
            + F.lit(0.5) * (F.col("r2_12") - F.col("r2_1"))
        ).alias("shapley_discount"),
    )
