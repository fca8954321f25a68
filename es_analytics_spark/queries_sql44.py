"""Round-5 batch-44 surface: return-rate analysis by brand and
dormancy/reactivation lifecycle counts.

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
# Return rate and revenue impact by brand
# ---------------------------------------------------------------------------

_RET_TOP = 15

_RETURN_SQL = f"""
    WITH lines AS MATERIALIZED (
        SELECT p.p_brand,
               CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
               l.l_extendedprice * (1 - l.l_discount) AS net
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), per_brand AS MATERIALIZED (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(ret) AS BIGINT) AS n_returned,
               {dsum_expr('net')} AS revenue,
               {dsum_expr('CASE WHEN ret = 1 THEN net END')} AS returned_rev
        FROM lines GROUP BY p_brand
    )
    SELECT p_brand, n_lines, n_returned,
           FLOOR(CAST(n_returned AS DOUBLE) / n_lines * 1e6 + 0.5) / 1e6
               AS return_rate,
           FLOOR(COALESCE(returned_rev, 0.0) * 1e4 + 0.5) / 1e4
               AS returned_revenue,
           FLOOR(COALESCE(returned_rev, 0.0) / revenue * 1e6 + 0.5) / 1e6
               AS returned_rev_share
    FROM per_brand
    ORDER BY return_rate DESC, p_brand ASC
    LIMIT {_RET_TOP}
"""


@query("agg_return_rate_by_brand", oracle=_RETURN_SQL)
def agg_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate league table: the top-{_RET_TOP} brands by line
    return rate (l_returnflag = 'R'), with returned revenue and its
    share — the quality/fit problem detector a retail review runs
    weekly (tpch_q10 totals returned revenue by customer; the BRAND
    cut is where a merchandiser can actually act — delist, fix the
    listing, or chase the supplier).

    Exactness: return counts are exact; revenue aggregates are
    decimal-contract sums; rates are quantized divisions; the top-
    {_RET_TOP} orders by the quantized rate with the brand breaking
    ties.

    Scale: one join shuffle to the brand grain (map-side combinable);
    the top-{_RET_TOP} is TakeOrdered."""
    t = _t(spark, sf_dir, "lineitem", "part")
    lines = t["lineitem"].join(
        t["part"].select("p_partkey", "p_brand"),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "net"
        ),
    )
    per_brand = (
        lines.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("ret").cast("bigint").alias("n_returned"),
            dsum("net").alias("revenue"),
            dsum(F.when(F.col("ret") == 1, F.col("net"))).alias("returned_rev"),
        )
        .transform(cut_lineage)
    )
    return (
        per_brand.select(
            "p_brand",
            "n_lines",
            "n_returned",
            _q6(F.col("n_returned").cast("double") / F.col("n_lines")).alias(
                "return_rate"
            ),
            (
                F.floor(
                    F.coalesce(F.col("returned_rev"), F.lit(0.0)) * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("returned_revenue"),
            _q6(
                F.coalesce(F.col("returned_rev"), F.lit(0.0)) / F.col("revenue")
            ).alias("returned_rev_share"),
        )
        .orderBy(F.col("return_rate").desc(), F.col("p_brand").asc())
        .limit(_RET_TOP)
    )


# ---------------------------------------------------------------------------
# Dormancy / reactivation lifecycle counts
# ---------------------------------------------------------------------------

_DORM_DAYS = 7

_DORM_SQL = f"""
    WITH span AS (
        SELECT MAX(ts) AS tmax FROM events
    ), gaps AS MATERIALIZED (
        SELECT user_id, ts,
               LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev_ts
        FROM events
    ), per_user AS MATERIALIZED (
        SELECT g.user_id,
               CAST(MAX(CASE WHEN g.prev_ts IS NOT NULL
                             AND g.ts >= g.prev_ts
                                 + INTERVAL {_DORM_DAYS} DAYS
                             THEN 1 ELSE 0 END) AS BIGINT) AS reactivated,
               MAX(g.ts) AS last_ts
        FROM gaps g
        GROUP BY g.user_id
    ), flags AS MATERIALIZED (
        SELECT p.user_id, p.reactivated,
               CASE WHEN s.tmax >= p.last_ts + INTERVAL {_DORM_DAYS} DAYS
                    THEN 1 ELSE 0 END AS dormant_now
        FROM per_user p CROSS JOIN span s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(reactivated) AS BIGINT) AS n_reactivated,
           CAST(SUM(dormant_now) AS BIGINT) AS n_dormant_now,
           FLOOR(CAST(SUM(reactivated) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
               / 1e6 AS reactivation_share,
           FLOOR(CAST(SUM(dormant_now) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
               / 1e6 AS dormant_share
    FROM flags
"""


@query("seq_dormancy_reactivation", oracle=_DORM_SQL)
def seq_dormancy_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy lifecycle counts with a {_DORM_DAYS}-day dormancy
    definition: users who ever went dormant and CAME BACK (an internal
    gap >= {_DORM_DAYS} days between consecutive events) and users
    dormant RIGHT NOW (silent for >= {_DORM_DAYS} days at the window
    end) — the resurrection-vs-at-risk split ts_growth_accounting's
    monthly buckets coarsen away, and the population a win-back
    campaign actually targets.

    Exactness: gaps are exact timestamp comparisons over the
    deterministic (ts, event_id) order; flags and counts are exact;
    shares are quantized divisions.

    Scale: one per-user lag window (single user_id shuffle), a
    user-grain reduction, the window-end broadcast."""
    e = _t(spark, sf_dir, "events")["events"]
    span = e.agg(F.max("ts").alias("tmax"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id", "ts", F.lag("ts").over(w).alias("prev_ts")
    ).transform(cut_lineage)
    per_user = gaps.groupBy("user_id").agg(
        F.max(
            F.when(
                F.col("prev_ts").isNotNull()
                & (
                    F.col("ts")
                    >= F.col("prev_ts") + F.expr(f"INTERVAL {_DORM_DAYS} DAYS")
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("reactivated"),
        F.max("ts").alias("last_ts"),
    )
    flags = per_user.crossJoin(F.broadcast(span)).select(
        "user_id",
        "reactivated",
        F.when(
            F.col("tmax")
            >= F.col("last_ts") + F.expr(f"INTERVAL {_DORM_DAYS} DAYS"),
            1,
        )
        .otherwise(0)
        .alias("dormant_now"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("reactivated").cast("bigint").alias("n_reactivated"),
        F.sum("dormant_now").cast("bigint").alias("n_dormant_now"),
        _q6(
            F.sum("reactivated").cast("double") / F.count(F.lit(1))
        ).alias("reactivation_share"),
        _q6(
            F.sum("dormant_now").cast("double") / F.count(F.lit(1))
        ).alias("dormant_share"),
    )
