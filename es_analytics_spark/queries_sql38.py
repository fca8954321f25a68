"""Round-5 batch-38 surface: order basket profile and the
events-before-conversion distribution.

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
# Basket-size profile: revenue and mix by distinct items per order
# ---------------------------------------------------------------------------

_BASKET_SQL = f"""
    WITH per_order AS MATERIALIZED (
        SELECT l_orderkey,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS basket_size,
               {dsum_expr('l_extendedprice * (1 - l_discount)')} AS rev
        FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               {dsum_expr('rev')} AS total_rev
        FROM per_order
    )
    SELECT p.basket_size,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / t.n_orders * 1e6 + 0.5) / 1e6
               AS order_share,
           FLOOR({dsum_expr('p.rev')} * 1e4 + 0.5) / 1e4 AS revenue,
           FLOOR({dsum_expr('p.rev')} / t.total_rev * 1e6 + 0.5) / 1e6
               AS revenue_share,
           FLOOR({dsum_expr('p.rev')} / COUNT(*) * 1e6 + 0.5) / 1e6
               AS avg_order_value
    FROM per_order p CROSS JOIN tot t
    GROUP BY p.basket_size, t.n_orders, t.total_rev
"""


@query("agg_basket_profile", oracle=_BASKET_SQL)
def agg_basket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size profile: for every distinct-items-per-order size,
    the order count/share, revenue/share, and average order value —
    the merchandising table behind bundle and free-shipping-threshold
    decisions (rec_item_cooccurrence mines WHICH items co-occur; this
    shows how much of the business multi-item baskets actually carry).

    Exactness: basket sizes are exact distinct counts; revenues are
    decimal-contract sums re-decimal-summed at the size grain; shares
    and AOV are single quantized divisions.

    Scale: one order-grain aggregate (map-side combinable), a
    basket-size-domain reduction, totals broadcast."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_partkey").cast("bigint").alias("basket_size"),
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("rev"),
        )
        .transform(cut_lineage)
    )
    tot = per_order.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum("rev").alias("total_rev"),
    )
    return (
        per_order.crossJoin(F.broadcast(tot))
        .groupBy("basket_size", "n_orders", "total_rev")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders_sz"),
            dsum("rev").alias("rev_sz"),
        )
        .select(
            "basket_size",
            F.col("n_orders_sz").alias("n_orders"),
            _q6(F.col("n_orders_sz").cast("double") / F.col("n_orders")).alias(
                "order_share"
            ),
            (F.floor(F.col("rev_sz") * 1e4 + F.lit(0.5)) / 1e4).alias("revenue"),
            _q6(F.col("rev_sz") / F.col("total_rev")).alias("revenue_share"),
            _q6(F.col("rev_sz") / F.col("n_orders_sz")).alias(
                "avg_order_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Events-before-first-conversion distribution
# ---------------------------------------------------------------------------

_E2C_SQL = """
    WITH ordered AS MATERIALIZED (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ), firstp AS MATERIALIZED (
        SELECT user_id, CAST(MIN(rn) - 1 AS BIGINT) AS n_before
        FROM ordered WHERE event_type = 'purchase' GROUP BY user_id
    ), users AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM ordered
    )
    SELECT u.n_users,
           CAST(COUNT(*) AS BIGINT) AS n_converters,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / u.n_users * 1e6 + 0.5) / 1e6
               AS converter_share,
           CAST(MIN(f.n_before) AS BIGINT) AS min_events_before,
           ROUND(QUANTILE_CONT(f.n_before, 0.5), 4) AS median_events_before,
           ROUND(QUANTILE_CONT(f.n_before, 0.9), 4) AS p90_events_before,
           CAST(MAX(f.n_before) AS BIGINT) AS max_events_before
    FROM firstp f CROSS JOIN users u
    GROUP BY u.n_users
"""


@query("seq_events_to_convert", oracle=_E2C_SQL)
def seq_events_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many events does a user generate BEFORE their first
    purchase? The effort-to-convert distribution (min/median/p90/max
    plus converter share) — ts_time_to_convert measures the clock;
    this measures engagement DEPTH, which is the budget an
    onboarding/nudge flow actually controls (you can't make time pass
    faster, you can shorten the path).

    Exactness: event positions are exact ranks over the deterministic
    (ts, event_id) order; quantiles use the shared interpolated
    contract on exact integer counts.

    Scale: one per-user rank window (single user_id shuffle), a
    user-grain min, a 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).transform(cut_lineage)
    firstp = (
        ordered.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg((F.min("rn") - 1).cast("bigint").alias("n_before"))
    )
    users = ordered.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    return (
        firstp.crossJoin(F.broadcast(users))
        .groupBy("n_users")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_converters"),
            _q6(F.count(F.lit(1)).cast("double") / F.col("n_users")).alias(
                "converter_share"
            ),
            F.min("n_before").cast("bigint").alias("min_events_before"),
            F.round(F.percentile("n_before", F.lit(0.5)), 4).alias(
                "median_events_before"
            ),
            F.round(F.percentile("n_before", F.lit(0.9)), 4).alias(
                "p90_events_before"
            ),
            F.max("n_before").cast("bigint").alias("max_events_before"),
        )
        .select(
            "n_users",
            "n_converters",
            "converter_share",
            "min_events_before",
            "median_events_before",
            "p90_events_before",
            "max_events_before",
        )
    )
