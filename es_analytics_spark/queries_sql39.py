"""Round-5 batch-39 surface: discount-band quantity lift, and latency
to the Nth purchase.

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
# Quantity lift by discount band (vs the zero/low-discount baseline)
# ---------------------------------------------------------------------------

_DISC_SQL = f"""
    WITH banded AS MATERIALIZED (
        SELECT CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) // 2 AS band,
               l_quantity,
               l_extendedprice * (1 - l_discount) AS net
        FROM lineitem
    ), per_band AS MATERIALIZED (
        SELECT band, CAST(COUNT(*) AS BIGINT) AS n_lines,
               {dsum_expr('l_quantity')} AS qty,
               {dsum_expr('net')} AS revenue
        FROM banded GROUP BY band
    ), base AS (
        SELECT qty / n_lines AS base_qty FROM per_band WHERE band = 0
    )
    SELECT p.band AS discount_band, p.n_lines,
           FLOOR(p.qty / p.n_lines * 1e6 + 0.5) / 1e6 AS avg_quantity,
           FLOOR(p.revenue * 1e4 + 0.5) / 1e4 AS net_revenue,
           FLOOR((p.qty / p.n_lines / b.base_qty - 1.0) * 1e6 + 0.5) / 1e6
               AS qty_lift_vs_base
    FROM per_band p CROSS JOIN base b
"""


@query("agg_discount_band_lift", oracle=_DISC_SQL)
def agg_discount_band_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity lift by discount band (2-percentage-point bands,
    band 0 = 0-1% as the baseline): average quantity, net revenue, and
    the per-band lift over the undiscounted baseline — the promo-depth
    effectiveness table a pricing team reads BEFORE fitting anything
    (agg_price_elasticity fits the elasticity; this shows the raw
    dose-response and whether deeper cuts actually move more units or
    just give margin away).

    Exactness: bands come from exact integer cents of the discount;
    per-band quantity/revenue are decimal-contract sums; averages and
    lifts are fixed quantized trees on exact scale-4 doubles.

    Scale: one map-side-combinable aggregate to the constant band
    grain; the baseline row broadcasts."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    band = (
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("bigint") / 2
    )
    banded = li.select(
        F.floor(band).cast("bigint").alias("band"),
        "l_quantity",
        (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
            "net"
        ),
    )
    per_band = (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            dsum("l_quantity").alias("qty"),
            dsum("net").alias("revenue"),
        )
        .transform(cut_lineage)
    )
    base = per_band.filter(F.col("band") == 0).select(
        (F.col("qty") / F.col("n_lines")).alias("base_qty")
    )
    return per_band.crossJoin(F.broadcast(base)).select(
        F.col("band").alias("discount_band"),
        "n_lines",
        _q6(F.col("qty") / F.col("n_lines")).alias("avg_quantity"),
        (F.floor(F.col("revenue") * 1e4 + F.lit(0.5)) / 1e4).alias(
            "net_revenue"
        ),
        _q6(
            F.col("qty") / F.col("n_lines") / F.col("base_qty") - F.lit(1.0)
        ).alias("qty_lift_vs_base"),
    )


# ---------------------------------------------------------------------------
# Latency to the Nth purchase
# ---------------------------------------------------------------------------

_NTH = 3

_NTH_SQL = f"""
    WITH firsts AS MATERIALIZED (
        SELECT user_id, MIN(ts) AS t0 FROM events GROUP BY user_id
    ), purch AS MATERIALIZED (
        SELECT user_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS k
        FROM events WHERE event_type = 'purchase'
    ), nth AS MATERIALIZED (
        SELECT p.user_id,
               CAST(DATEDIFF('second', f.t0, p.ts) AS BIGINT) / 3600.0
                   AS hours_to_nth
        FROM purch p JOIN firsts f USING (user_id)
        WHERE p.k = {_NTH}
    ), users AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM firsts
    )
    SELECT u.n_users,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / u.n_users * 1e6 + 0.5) / 1e6
               AS reach_share,
           FLOOR(ROUND(QUANTILE_CONT(hours_to_nth, 0.5), 4) * 1e6 + 0.5) / 1e6
               AS median_hours,
           FLOOR(ROUND(QUANTILE_CONT(hours_to_nth, 0.9), 4) * 1e6 + 0.5) / 1e6
               AS p90_hours
    FROM nth CROSS JOIN users u
    GROUP BY u.n_users
"""


@query("ts_time_to_nth_purchase", oracle=_NTH_SQL)
def ts_time_to_nth_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency from a user's first event to their {_NTH}rd purchase
    (reach share + median/p90 hours): the habit-formation milestone —
    ts_time_to_convert measures activation (1st purchase);
    the {_NTH}rd is the classic "habituated customer" definition whose
    reach and latency a growth team targets directly.

    Exactness: purchase ordinals are exact ranks over the
    deterministic (ts, event_id) order; latencies are exact second
    differences divided once; quantiles use the shared contract.

    Scale: one per-user rank window (single user_id shuffle), one
    keyed join to first-event times, a 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    firsts = e.groupBy("user_id").agg(F.min("ts").alias("t0"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.row_number().over(w).alias("k"))
        .transform(cut_lineage)
    )
    nth = (
        purch.filter(F.col("k") == _NTH)
        .join(firsts, "user_id")
        .select(
            "user_id",
            (
                (F.unix_timestamp("ts") - F.unix_timestamp("t0")).cast(
                    "bigint"
                )
                / F.lit(3600.0)
            ).alias("hours_to_nth"),
        )
    )
    users = firsts.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    return (
        nth.crossJoin(F.broadcast(users))
        .groupBy("n_users")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            _q6(F.count(F.lit(1)).cast("double") / F.col("n_users")).alias(
                "reach_share"
            ),
            _q6(F.round(F.percentile("hours_to_nth", F.lit(0.5)), 4)).alias(
                "median_hours"
            ),
            _q6(F.round(F.percentile("hours_to_nth", F.lit(0.9)), 4)).alias(
                "p90_hours"
            ),
        )
        .select("n_users", "n_reached", "reach_share", "median_hours", "p90_hours")
    )
