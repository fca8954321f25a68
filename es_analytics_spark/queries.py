"""Oracle-checkable query catalog — the engine's declared surface.

Every entry pairs a Spark implementation (DataFrame/SQL, Catalyst-
optimized) with an equivalent ANSI-SQL oracle that DuckDB runs on the
same parquet tables. The driver hash-compares the two at sf0.01
(row count + schema + order-insensitive value hash), so every query is
written to be *deterministic as a set of rows* and *bit-identical* in
float math:

- double SUM/AVG go through DECIMAL(38,10) (order-independent; see
  es_analytics_spark.functions.exact),
- transcendental / variance results are rounded to a fixed scale,
- every top-k has a total order (explicit tie-break columns).

Queries cover SURVEY.md §2.B family by family; names group them.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, davg, dsum_expr, davg_expr
from es_analytics_spark.functions.fanout import fan_out
from es_analytics_spark.sources.lake import load_tables


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    # True → the entry mutates session conf while running (e.g. the
    # streaming replay harness swaps spark.sql.shuffle.partitions), so
    # concurrent harnesses (bench's pooled cold pass) must run it
    # serially — keyed on behavior, not on a name prefix, so a future
    # non-"stream_*" replay caller can't race the pool unnoticed
    # (tests/test_plans.py AST-enforces the flag on replay_stream use).
    mutates_conf: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, mutates_conf: bool = False):
    def deco(fn):
        if name in REGISTRY:
            # a duplicate silently SHADOWS the earlier query in every
            # harness (driver, oracle CLI, bench) — fail at import time
            raise ValueError(
                f"catalog name {name!r} registered twice "
                f"(existing: {REGISTRY[name].fn.__module__}, new: {fn.__module__})"
            )
        REGISTRY[name] = QuerySpec(fn, oracle, mutates_conf)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return load_tables(spark, sf_dir, names or None)


# ---------------------------------------------------------------------------
# Aggregation family
# ---------------------------------------------------------------------------


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr('l_quantity')} AS sum_qty,
           {dsum_expr('l_extendedprice')} AS sum_base_price,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_expr('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_expr('l_quantity')} AS avg_qty,
           {davg_expr('l_extendedprice')} AS avg_price,
           {davg_expr('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (flagship). Single scan →
    partial+final hash aggregate; filter pushed to parquet."""
    # the decimal partial aggregates are the per-row cost and they run
    # in the scan stage, which a single-row-group file pins to ONE task
    # — fan out on a high-card key first (guide §2.2; layout-gated
    # no-op on a real lake). Filter BEFORE the exchange so pushdown and
    # the shuffled row count are unchanged.
    li = fan_out(
        _t(spark, sf_dir, "lineitem")["lineitem"].filter(
            F.col("l_shipdate") <= F.lit("1997-09-01").cast("timestamp")
        ),
        sf_dir,
        "lineitem",
        "l_orderkey",
        weight=2,
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_stats_minmax",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_stats_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@query(
    "agg_variance",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
           ROUND(VAR_SAMP(l_quantity), 4) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


@query(
    "agg_distinct_multi",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS d_orders,
           COUNT(DISTINCT l_partkey) AS d_parts,
           COUNT(DISTINCT l_suppkey) AS d_supps,
           COUNT(DISTINCT (l_partkey, l_suppkey)) AS d_part_supp
    FROM lineitem
    """,
)
def agg_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    # four distinct aggregates expand every row 4x before the partial
    # aggregates, all inside the scan stage — fan out on a high-card
    # key so the expand+partials parallelize (guide §2.2; layout-gated)
    li = fan_out(
        _t(spark, sf_dir, "lineitem")["lineitem"],
        sf_dir,
        "lineitem",
        "l_orderkey",
        weight=2,
    )
    return li.agg(
        F.countDistinct("l_orderkey").alias("d_orders"),
        F.countDistinct("l_partkey").alias("d_parts"),
        F.countDistinct("l_suppkey").alias("d_supps"),
        F.countDistinct("l_partkey", "l_suppkey").alias("d_part_supp"),
    )


@query("agg_approx_distinct", oracle=None)  # HLL impls differ engine-to-engine
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT o_orderpriority,
           ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50,
           ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    QUANTILE_CONT)."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {dsum_expr('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, {dsum_expr('l_extendedprice')} AS sum_price
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.cube("l_returnflag", "l_linestatus").agg(dsum("l_extendedprice").alias("sum_price"))


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {dsum_expr('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               {dsum_expr('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {dsum_expr("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {dsum_expr("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")["nation"]
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations")
    )


# ---------------------------------------------------------------------------
# Projection / filter / expressions
# ---------------------------------------------------------------------------


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 5000
      AND o_orderpriority LIKE '2-%'
      AND o_custkey IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 5000)
        & F.col("o_orderpriority").like("2-%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_totalprice", "o_orderstatus")


@query(
    "project_case_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CASE WHEN o_totalprice > 3000 THEN 'high'
                WHEN o_totalprice > 1000 THEN 'mid'
                ELSE 'low' END AS bucket,
           TRY_CAST(o_orderstatus AS DOUBLE) AS bad_cast
    FROM orders
    """,
)
def project_case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.when(F.col("o_totalprice") > 3000, "high")
        .when(F.col("o_totalprice") > 1000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.col("o_orderstatus").try_cast("double").alias("bad_cast"),
    )


# ---------------------------------------------------------------------------
# Join family
# ---------------------------------------------------------------------------


@query(
    "join_5way_revenue",
    oracle=f"""
    SELECT n_name, {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def join_5way_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact table shuffles once on orderkey;
    every dimension is broadcast (no dim-side shuffles)."""
    t = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation", "region")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           {dsum_expr('o_totalprice')} AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice").alias("total_spent"))
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS k, a.n_cust, b.n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
    FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) b
    ON a.k = b.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "supplier")
    a = t["customer"].groupBy(F.col("c_nationkey").alias("k")).agg(F.count("*").alias("n_cust"))
    b = t["supplier"].groupBy(F.col("s_nationkey").alias("k")).agg(F.count("*").alias("n_supp"))
    return (
        a.join(b, a["k"] == b["k"], "full_outer")
        .select(F.coalesce(a["k"], b["k"]).alias("k"), "n_cust", "n_supp")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 4000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    big = t["orders"].filter(F.col("o_totalprice") > 4000)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_cross_theta",
    oracle="""
    SELECT r1.r_name AS region_a, r2.r_name AS region_b
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")["region"]
    r1 = r.select(F.col("r_name").alias("region_a"), F.col("r_regionkey").alias("ka"))
    r2 = r.select(F.col("r_name").alias("region_b"), F.col("r_regionkey").alias("kb"))
    return r1.crossJoin(r2).filter(F.col("ka") < F.col("kb")).select("region_a", "region_b")


@query(
    "join_range",
    oracle=f"""
    SELECT o_orderkey, COUNT(*) AS n_lines_in_window,
           {dsum_expr('l_extendedprice')} AS window_price
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderkey
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + range predicate: planner keeps the equi part as the
    join key (hash/SMJ) and evaluates the range as a post-condition —
    no BNLJ blow-up."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
    )
    return (
        t["orders"]
        .join(t["lineitem"], cond)
        .groupBy("o_orderkey")
        .agg(
            F.count("*").alias("n_lines_in_window"),
            dsum("l_extendedprice").alias("window_price"),
        )
    )


@query(
    "join_asof",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
             ) AS rn
      FROM events e LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS last_orderkey, o_orderdate AS last_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of: latest order at-or-before each event for the same
    user/customer. Union + last(ignorenulls) window — one shuffle,
    no join explosion (operators.joins.asof_join)."""
    from es_analytics_spark.operators.joins import asof_join

    t = _t(spark, sf_dir, "events", "orders")
    ev = t["events"].select("event_id", F.col("user_id"), "ts")
    od = t["orders"].select(
        F.col("o_custkey"), "o_orderdate", "o_orderkey"
    )
    out = asof_join(
        ev.withColumnRenamed("user_id", "k"),
        od.withColumnRenamed("o_custkey", "k"),
        on="k",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        tie_break="o_orderkey",
    )
    return out.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


# ---------------------------------------------------------------------------
# Window family
# ---------------------------------------------------------------------------


@query(
    "window_rank_dense_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")["customer"]
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderkey) OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


@query(
    "window_running_frame",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rolling3
    FROM orders
    """,
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    o = _t(spark, sf_dir, "orders")["orders"]
    dec = F.col("o_totalprice").cast(T.DecimalType(38, 10))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("double").alias("running_spend"),
        F.sum(dec).over(w.rowsBetween(-2, 0)).cast("double").alias("rolling3"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rank_in_group
      FROM customer)
    SELECT c_mktsegment, c_custkey, c_acctbal, rank_in_group
    FROM ranked WHERE rank_in_group <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from es_analytics_spark.operators.joins import topk_per_group

    c = _t(spark, sf_dir, "customer")["customer"]
    return topk_per_group(
        c.select("c_mktsegment", "c_custkey", "c_acctbal"),
        ["c_mktsegment"],
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        3,
    )


@query(
    "window_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             -- DuckDB's windowed SUM(int) yields HUGEINT -> pandas float64;
             -- Spark emits bigint. CAST so the driver's dtype-sensitive hash matches.
             CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min gap) + per-session rollup."""
    from es_analytics_spark.operators.sessionize import sessionize

    ev = _t(spark, sf_dir, "events")["events"]
    s = sessionize(ev.select("user_id", "ts"), "user_id", "ts", gap_seconds=1800)
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops
# ---------------------------------------------------------------------------


@query(
    "sort_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: planner emits TakeOrderedAndProject (per-partition
    heap + driver merge), not a full sort."""
    o = _t(spark, sf_dir, "orders")["orders"]
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@query(
    "sort_multikey_nulls",
    oracle="""
    SELECT p_brand, p_size, p_retailprice FROM part
    WHERE p_size > 40
    ORDER BY p_brand ASC, p_retailprice DESC NULLS LAST, p_size
    """,
)
def sort_multikey_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    return (
        p.filter(F.col("p_size") > 40)
        .select("p_brand", "p_size", "p_retailprice")
        .orderBy(F.col("p_brand").asc(), F.col("p_retailprice").desc_nulls_last(), F.col("p_size"))
    )


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "supplier")
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .union(t["supplier"].select("s_nationkey"))
        .distinct()
    )


@query(
    "setop_intersect_except",
    oracle="""
    SELECT 'both' AS side, k FROM (
      SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS side, k FROM (
      SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    """,
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "supplier")
    c = t["customer"].select(F.col("c_nationkey").alias("k"))
    s = t["supplier"].select(F.col("s_nationkey").alias("k"))
    both = c.intersect(s).select(F.lit("both").alias("side"), "k")
    only = c.subtract(s).select(F.lit("cust_only").alias("side"), "k")  # EXCEPT DISTINCT
    return both.unionAll(only)


@query(
    "setop_dedup_keys",
    oracle="""
    SELECT l_orderkey, l_partkey, MIN(l_linenumber) AS first_line
    FROM lineitem GROUP BY l_orderkey, l_partkey
    """,
)
def setop_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based dedup with a deterministic survivor (vs dropDuplicates'
    arbitrary one)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.groupBy("l_orderkey", "l_partkey").agg(F.min("l_linenumber").alias("first_line"))


# ---------------------------------------------------------------------------
# Scalar function families
# ---------------------------------------------------------------------------


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_u,
           LOWER(p_type) AS type_l,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           TRIM(CONCAT('  ', p_brand, '  ')) AS trimmed,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           CONTAINS(p_type, 'BRASS') AS has_brass,
           SPLIT_PART(p_type, ' ', 1) AS type_first
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")["part"]
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_type").contains("BRASS").alias("has_brass"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT event_id,
           DATE_TRUNC('hour', ts) AS ts_hour,
           DATE_TRUNC('day', ts) AS ts_day,
           CAST(YEAR(ts) AS BIGINT) AS y,
           CAST(MONTH(ts) AS BIGINT) AS m,
           CAST(DAYOFMONTH(ts) AS BIGINT) AS d,
           CAST(HOUR(ts) AS BIGINT) AS h,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS unix_s,
           STRFTIME(ts, '%Y-%m-%d') AS day_str,
           CAST(DATE_DIFF('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS days_since_jan1
    FROM events
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return ev.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.date_trunc("day", "ts").alias("ts_day"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("unix_s"),
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since_jan1"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           FLOOR(l_extendedprice) AS price_floor,
           CEIL(l_extendedprice) AS price_ceil,
           ABS(l_discount - 0.05) AS disc_dev,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ROUND(POW(l_quantity, 2), 6) AS qty_sq,
           ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
           CAST(MOD(CAST(l_quantity AS BIGINT), 7) AS BIGINT) AS qty_mod7
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod7"),
    )


@query(
    "fn_conditional_null",
    oracle="""
    SELECT o_orderkey,
           COALESCE(TRY_CAST(o_orderstatus AS DOUBLE), o_totalprice, 0.0) AS first_num,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           CASE WHEN o_totalprice IS NULL THEN 'null' ELSE 'set' END AS price_state,
           IFNULL(NULLIF(o_orderstatus, o_orderstatus), 'same') AS always_same
    FROM orders
    """,
)
def fn_conditional_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.col("o_orderstatus").try_cast("double"), F.col("o_totalprice"), F.lit(0.0)
        ).alias("first_num"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.when(F.col("o_totalprice").isNull(), "null").otherwise("set").alias("price_state"),
        F.nvl(F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus")), F.lit("same")).alias(
            "always_same"
        ),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k_val,
           JSON_EXTRACT_STRING(props, '$.k') AS k_str
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT c_custkey,
           MD5(c_name) AS name_md5,
           SHA256(c_name) AS name_sha256
    FROM customer
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")["customer"]
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2("c_name", 256).alias("name_sha256"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id, label,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
           ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 6) AS vec_max,
           LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_positive
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double")), 4
        ).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vec_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_positive"),
    )


@query(
    "fn_explode_posexplode",
    oracle="""
    SELECT vec_id, CAST(p.pos AS INTEGER) AS pos, p.elem
    FROM (
      SELECT vec_id,
             UNNEST(LIST_TRANSFORM(embedding,
                    (x, i) -> {'pos': i - 1, 'elem': ROUND(CAST(x AS DOUBLE), 6)})) AS p
      FROM embeddings WHERE vec_id < 5)
    """,
)
def fn_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    return (
        e.filter(F.col("vec_id") < 5)
        .select("vec_id", F.posexplode("embedding").alias("pos", "elem"))
        .select("vec_id", "pos", F.round(F.col("elem").cast("double"), 6).alias("elem"))
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: text analysis (documents table)
# ---------------------------------------------------------------------------

# normalization mirrored between engines: lower → strip non-[a-z0-9\s] →
# collapse whitespace → trim
_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)


@query(
    "text_token_stats",
    oracle="""
    SELECT doc_id, lang, source,
           CAST(LENGTH(text) AS BIGINT) AS n_chars,
           CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'))) AS BIGINT)
             AS n_unique_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts (word / single digit /
    punctuation pieces — the pre-merge segmentation BPE vocabularies
    start from), the brief's two token-counting modes."""
    from es_analytics_spark.operators.text import bpe_ish_token_count

    d = _t(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.trim(F.col("text")), r"\s+")
    toks_l = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks_l)).cast("long").alias("n_unique_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


@query(
    "text_quality",
    oracle="""
    SELECT doc_id,
           ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                 / LENGTH(text), 6) AS punct_ratio,
           ROUND(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS DOUBLE)
                 / LENGTH(text), 6) AS digit_ratio,
           ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'),
                 t -> LIST_CONTAINS(['the','and','of','to','is','in','that','it','for','with'], t)))
                 AS DOUBLE) / LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 6) AS stopword_ratio
    FROM documents
    WHERE LENGTH(text) > 0
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from es_analytics_spark.operators.text import STOPWORDS

    d = _t(spark, sf_dir, "documents")["documents"]
    c = F.col("text")
    n_chars = F.length(c)
    toks_l = F.split(F.lower(F.trim(c)), r"\s+")
    n_tokens = F.size(F.split(F.trim(c), r"\s+"))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks_l, lambda t: F.array_contains(sw, t)))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    return d.filter(n_chars > 0).select(
        "doc_id",
        F.round(n_punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(n_digit.cast("double") / n_chars, 6).alias("digit_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
    )


@query(
    "text_fingerprint_dedup",
    oracle=f"""
    SELECT MD5({_NORM_SQL}) AS fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keeper_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def text_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text fingerprint groups: the exact near-dup key
    (case/punct/whitespace-insensitive) with a deterministic keeper."""
    from es_analytics_spark.operators.dedup import document_fingerprint

    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        document_fingerprint(d, "text")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper_doc_id"))
    )


@query(
    "dedup_exact_docs",
    oracle="""
    SELECT MD5(text) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_doc_id
    FROM documents GROUP BY 1 HAVING COUNT(*) >= 1
    """,
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")["documents"]
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper_doc_id")
    )


_SW_SQL = {
    "en": "['the','and','of','to','is','in','that','it','for','with']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','auf','zu']",
    "fr": "['le','la','les','et','est','un','une','dans','pour','que']",
    "es": "['el','los','las','es','un','una','en','por','para','con']",
    "zh": "['de','shi','bu','le','wo','you','he','zai','ren','ta']",
}


_HITS_SQL = ", ".join(
    "LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(TRIM(text)), '\\s+'), "
    "t -> LIST_CONTAINS(" + sql + ", t))) AS hits_" + lang
    for lang, sql in _SW_SQL.items()
)


@query(
    "text_language_id",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, lang AS lang_true, {_HITS_SQL}
      FROM documents)
    SELECT doc_id, lang_true,
           CASE WHEN GREATEST(hits_en, hits_de, hits_fr, hits_es, hits_zh) = 0 THEN 'und'
                WHEN hits_en >= GREATEST(hits_de, hits_fr, hits_es, hits_zh) THEN 'en'
                WHEN hits_de >= GREATEST(hits_fr, hits_es, hits_zh) THEN 'de'
                WHEN hits_fr >= GREATEST(hits_es, hits_zh) THEN 'fr'
                WHEN hits_es >= hits_zh THEN 'es'
                ELSE 'zh' END AS lang_pred
    FROM hits
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language ID; tie-break order en>de>fr>es>zh is
    part of the operator contract (deterministic)."""
    from es_analytics_spark.operators.text import STOPWORDS

    d = _t(spark, sf_dir, "documents")["documents"]
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")

    def _hits(lang):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        # nb: the lambda must be unary — a 2-arg lambda would be
        # interpreted by F.filter as (element, index)
        return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))

    hits = {lang: _hits(lang) for lang in _SW_SQL}
    best = F.greatest(*[hits[l] for l in ("de", "fr", "es", "zh")])
    pred = (
        F.when(F.greatest(*hits.values()) == 0, "und")
        .when(hits["en"] >= F.greatest(hits["de"], hits["fr"], hits["es"], hits["zh"]), "en")
        .when(hits["de"] >= F.greatest(hits["fr"], hits["es"], hits["zh"]), "de")
        .when(hits["fr"] >= F.greatest(hits["es"], hits["zh"]), "fr")
        .when(hits["es"] >= hits["zh"], "es")
        .otherwise("zh")
    )
    return d.select("doc_id", F.col("lang").alias("lang_true"), pred.alias("lang_pred"))


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, source, STRING_SPLIT({_NORM_SQL}, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, source,
             LIST_DISTINCT(CASE WHEN LEN(w) >= 3
               THEN LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 2),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
               ELSE [ARRAY_TO_STRING(w, ' ')] END) AS g
      FROM words)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(LEN(LIST_INTERSECT(a.g, b.g)) AS DOUBLE)
             / LEN(LIST_DISTINCT(a.g || b.g)) AS jaccard
    FROM grams a JOIN grams b ON b.doc_id > a.doc_id AND a.source = b.source
    WHERE CAST(LEN(LIST_INTERSECT(a.g, b.g)) AS DOUBLE)
             / LEN(LIST_DISTINCT(a.g || b.g)) >= 0.35
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked word-3-gram Jaccard ≥ 0.35: only pairs sharing ``source``
    are compared, so the join shuffles once on the block key instead of
    going n² — the shape that survives 100×. The un-blocked all-pairs
    form lives only in tests/test_operators.py as the recall referee for
    the MinHash-LSH path (see dedup_minhash_lsh)."""
    from es_analytics_spark.operators.dedup import ngram_jaccard_pairs

    # the gram explode + distinct partial work runs map-side in the
    # scan stage; spread it when the layout is a single local file
    # (layout-adaptive no-op on a multi-file lake)
    d = fan_out(
        _t(spark, sf_dir, "documents")["documents"],
        sf_dir, "documents", "doc_id", weight=30,
    )
    return ngram_jaccard_pairs(
        d, "doc_id", "text", ngram=3, block_col="source", threshold=0.35
    ).filter(F.col("jaccard") >= 0.35)


@query("dedup_minhash_lsh", oracle=None)  # xxhash64 family not in the oracle engine
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates, Jaccard-verified (≥0.5).
    Correctness covered by tests/test_operators.py against exact
    all-pairs Jaccard at sf0.001."""
    from es_analytics_spark.operators.dedup import minhash_lsh_pairs

    # 64 hash-min partial aggregates per shingle run map-side in the
    # scan stage — fan the docs out first (layout-adaptive no-op at scale)
    d = fan_out(
        _t(spark, sf_dir, "documents")["documents"],
        sf_dir, "documents", "doc_id", weight=30,
    )
    return minhash_lsh_pairs(d, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.5)


@query("dedup_simhash", oracle=None)  # xxhash64 not in the oracle engine
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from es_analytics_spark.operators.dedup import simhash

    d = fan_out(
        _t(spark, sf_dir, "documents")["documents"],
        sf_dir, "documents", "doc_id", weight=30,
    )
    return simhash(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# Training-data pipeline: embedding similarity (embeddings table)
# ---------------------------------------------------------------------------

_COS_SQL = """
    ROUND(
      LIST_SUM(LIST_TRANSFORM(LIST_ZIP(q.embedding, c.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (SQRT(LIST_SUM(LIST_TRANSFORM(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * SQRT(LIST_SUM(LIST_TRANSFORM(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      6)
"""


@query(
    "sim_cosine_pairs",
    oracle=f"""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cosine
    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 20 AND {_COS_SQL} >= 0.25
    """,
)
def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine: all corpus neighbors of the first 20 query
    vectors above 0.25. Query side broadcast; dot product via
    zip_with/aggregate (JVM codegen, no Python)."""
    from es_analytics_spark.operators.similarity import cosine_pairs_above

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 20)
    out = cosine_pairs_above(e, q, "vec_id", "embedding", threshold=-2.0)
    return out.withColumn("cosine", F.round("cosine", 6)).filter(F.col("cosine") >= 0.25)


@query(
    "sim_cosine_topk",
    oracle=f"""
    WITH sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cosine
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rank
      FROM sims)
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors for 10 queries; ranking on the rounded
    cosine (the cross-engine-stable value) with id tie-break."""
    from pyspark.sql import Window as W2

    from es_analytics_spark.operators.similarity import cosine_pairs_above

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    pairs = cosine_pairs_above(e, q, "vec_id", "embedding", threshold=-2.0).withColumn(
        "cosine", F.round("cosine", 6)
    )
    w = W2.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


@query("sim_lsh_bucketed", oracle=None)  # approximate by design (recall < 1)
def sim_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN path: sign-of-random-projection buckets, top-5 within bucket.
    Recall measured against sim_cosine_topk in tests."""
    from es_analytics_spark.operators.similarity import lsh_bucketed_topk

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    return lsh_bucketed_topk(e, q, "vec_id", "embedding", k=5, num_planes=6)


@query(
    "sim_embedding_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           ROUND(AVG(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6)
             AS avg_sq_norm
    FROM embeddings GROUP BY label
    """,
)
def sim_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats (norm profile) — the embedding-hygiene
    check a pipeline runs before indexing. AVG over a deterministic
    per-row double is ROUND-stabilized."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    sq = F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(sq), 6).alias("avg_sq_norm"),
    )


# ---------------------------------------------------------------------------
# Streaming family: the bounded fixture replayed through Structured
# Streaming (availableNow) must equal the batch/oracle answer.
# ---------------------------------------------------------------------------


@query(
    "stream_windowed_counts",
    mutates_conf=True,
    oracle=f"""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events,
           {dsum_expr('value')} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows computed BY THE STREAMING ENGINE
    (file source → watermark → window agg → memory sink, availableNow),
    then compared against the batch SQL oracle."""
    from es_analytics_spark.streaming.ingest import (
        replay_stream,
        stream_events,
        windowed_event_counts,
    )

    ev = stream_events(spark, sf_dir)
    return replay_stream(
        spark, windowed_event_counts(ev, "1 hour"), name="stream_windowed_counts",
        output_mode="complete",
    )


@query(
    "stream_session_windows",
    mutates_conf=True,
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged)
    SELECT MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30 min gap) in the streaming engine;
    oracle = the window-function sessionization (same gap semantics:
    session end is last event + gap)."""
    from es_analytics_spark.streaming.ingest import (
        replay_stream,
        session_window_agg,
        stream_events,
    )

    ev = stream_events(spark, sf_dir)
    return replay_stream(
        spark, session_window_agg(ev, "30 minutes"), name="stream_session_windows",
        output_mode="complete",
    )


@query(
    "stream_dedup_watermark",
    mutates_conf=True,
    oracle="""
    SELECT user_id, event_type, DATE_TRUNC('minute', ts) AS ts_minute,
           MIN(event_id) AS event_id
    FROM events GROUP BY 1, 2, 3
    """,
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on (user, type, minute): duplicates in
    the fixture arrive within the 10-min watermark horizon, so the
    streaming result equals batch dedup. min(event_id) survivor for
    determinism."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events

    ev = stream_events(spark, sf_dir).withColumn(
        "ts_minute", F.date_trunc("minute", "ts")
    )
    src = ev.withWatermark("ts", "10 minutes")
    dedup = (
        src.groupBy("user_id", "event_type", "ts_minute")
        .agg(F.min("event_id").alias("event_id"))
    )
    return replay_stream(
        spark, dedup, name="stream_dedup_watermark", output_mode="complete"
    )


# ---------------------------------------------------------------------------
# Multimodal columns: opaque binary payloads + typed metadata
# ---------------------------------------------------------------------------


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           SHA256(text) AS payload_sha256,
           MD5(text) AS payload_md5
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata computed JVM-side: the documents' utf-8
    bytes stand in for media payloads (same code path as image/audio
    blobs — binary is binary)."""
    from es_analytics_spark.operators.multimodal import attach_media_meta

    d = _t(spark, sf_dir, "documents")["documents"]
    payload = d.withColumn("payload", F.encode("text", "utf-8"))
    out = attach_media_meta(payload, "payload", "application/octet-stream")
    return out.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha256").alias("payload_sha256"),
        F.md5("payload").alias("payload_md5"),
    )


@query("mm_extract_features", oracle=None)  # mapInPandas decode path; NumPy-checked in tests
def mm_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas). Decode is the deterministic stand-in (see
    operators.multimodal: codec libs absent by environment contract)."""
    from es_analytics_spark.operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents")["documents"]
    payload = d.withColumn("payload", F.encode("text", "utf-8"))
    return extract_features(payload, "payload", "doc_id")


@query(
    "mm_segment_sample",
    oracle="""
    SELECT doc_id, CAST(seg.i AS INTEGER) AS segment_idx,
           SUBSTRING(text, CAST(seg.i * GREATEST(LENGTH(text) // 4, 1) + 1 AS INTEGER), 16)
             AS segment_text,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
    FROM documents, (SELECT UNNEST([0,1,2,3]) AS i) seg
    """,
)
def mm_segment_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'frame sampling': 4 evenly spaced windows per doc.
    ASCII fixture text → byte offsets == char offsets, so the binary
    segment decodes to the oracle's substring."""
    from es_analytics_spark.operators.multimodal import sample_segments

    d = _t(spark, sf_dir, "documents")["documents"]
    payload = d.withColumn("payload", F.encode("text", "utf-8"))
    out = sample_segments(payload, "payload", "doc_id", n_segments=4, segment_bytes=16)
    return out.select(
        "doc_id",
        "segment_idx",
        F.decode(F.col("segment"), "utf-8").alias("segment_text"),
        "n_bytes",
    )


# ---------------------------------------------------------------------------
# Map / JSON-map functions
# ---------------------------------------------------------------------------


@query(
    "fn_map_explode",
    oracle="""
    SELECT event_id, u.k AS key, CAST(JSON_EXTRACT(props, '$.' || u.k) AS BIGINT) AS value
    FROM events, UNNEST(JSON_KEYS(props)) AS u(k)
    """,
)
def fn_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON → MapType → explode to (key, value) rows; also the
    engine's map_keys/map_values surface."""
    ev = _t(spark, sf_dir, "events")["events"]
    m = F.from_json("props", "map<string,bigint>")
    return ev.select("event_id", F.explode(m).alias("key", "value"))


@query(
    "fn_map_ops",
    oracle="""
    SELECT event_id,
           JSON_KEYS(props)[1] AS first_key,
           CAST(LEN(JSON_KEYS(props)) AS INTEGER) AS n_keys,
           CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")["events"]
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.map_keys(m)[0].alias("first_key"),
        F.size(F.map_keys(m)).alias("n_keys"),
        m["k"].alias("k_value"),
    )


@query(
    "fn_uuid_deterministic",
    oracle="""
    SELECT c_custkey,
           SUBSTRING(MD5(c_name), 1, 8) || '-' || SUBSTRING(MD5(c_name), 9, 4) || '-' ||
           SUBSTRING(MD5(c_name), 13, 4) || '-' || SUBSTRING(MD5(c_name), 17, 4) || '-' ||
           SUBSTRING(MD5(c_name), 21, 12) AS name_uuid
    FROM customer
    """,
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-derived UUID (name-based, UUIDv3-flavored formatting) —
    the deterministic sibling of uuid(); random uuid() itself is
    exercised in the collector (batch ids)."""
    c = _t(spark, sf_dir, "customer")["customer"]
    h = F.md5("c_name")
    uuid_str = F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
    return c.select("c_custkey", uuid_str.alias("name_uuid"))


@query(
    "fn_string_extra",
    oracle="""
    SELECT s_suppkey,
           REVERSE(s_name) AS name_rev,
           REPEAT(SUBSTRING(s_name, 1, 2), 3) AS name_rep,
           TRANSLATE(s_name, '#', '_') AS name_tr,
           CAST(STRPOS(s_name, '#') AS BIGINT) AS hash_pos,
           LEFT(s_name, 4) AS name_left,
           RIGHT(s_name, 3) AS name_right,
           REPLACE(s_name, 'Supplier', 'S') AS name_short
    FROM supplier
    """,
)
def fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")["supplier"]
    return s.select(
        "s_suppkey",
        F.reverse("s_name").alias("name_rev"),
        F.repeat(F.substring("s_name", 1, 2), 3).alias("name_rep"),
        F.translate("s_name", "#", "_").alias("name_tr"),
        F.instr(F.col("s_name"), "#").cast("long").alias("hash_pos"),
        F.substring("s_name", 1, 4).alias("name_left"),
        F.substring(F.col("s_name"), -3, 3).alias("name_right"),
        F.regexp_replace("s_name", "Supplier", "S").alias("name_short"),
    )


@query(
    "fn_datetime_extra",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS plus_3m,
           LAST_DAY(o_orderdate) AS month_end,
           ROUND(CAST(DATEDIFF('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) / 30.0, 4)
             AS months_since,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS BIGINT) AS dow,  -- 1-based Sunday (engine convention)
           CAST(WEEKOFYEAR(o_orderdate) AS BIGINT) AS woy,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS q
    FROM orders
    """,
)
def fn_datetime_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")["orders"]
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH")).alias("plus_3m"),
        # cast: Spark DATE -> pandas object(date) but DuckDB DATE -> datetime64;
        # emit timestamp on both sides so the dtype-sensitive hash agrees
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.round(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("double")
            / 30.0,
            4,
        ).alias("months_since"),
        (F.dayofweek("o_orderdate")).cast("long").alias("dow"),
        F.weekofyear("o_orderdate").cast("long").alias("woy"),
        F.quarter("o_orderdate").cast("long").alias("q"),
    )


# ---------------------------------------------------------------------------
# TPC-H classic shapes (SQL surface; what a reference-lake user runs)
# ---------------------------------------------------------------------------


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey, {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue, o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT l_orderkey, {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue, o_orderdate
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum_expr('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@query(
    "tpch_q14_promo_effect",
    oracle=f"""
    SELECT (100.0 * {dsum_expr("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) END")}
            / {dsum_expr('l_extendedprice * (1 - l_discount)')}) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-02-01 00:00:00'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "lineitem", "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * dsum(promo) / dsum(disc)).alias("promo_revenue_pct"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


# ---------------------------------------------------------------------------
# Subqueries / CTE / remaining window + array surface
# ---------------------------------------------------------------------------


@query(
    "subq_correlated_scalar",
    oracle=f"""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem l1
    WHERE l_quantity > 2 * (SELECT AVG(l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def subq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery, decorrelated by
    Catalyst into an aggregate + join (no per-row re-execution).
    AVG double here is safe: the comparison margin (2x) dwarfs ulp."""
    _t(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_partkey, l_quantity
        FROM lineitem l1
        WHERE l_quantity > 2 * (SELECT AVG(l_quantity) FROM lineitem l2
                                WHERE l2.l_partkey = l1.l_partkey)
        """
    )


@query(
    "subq_in_uncorrelated",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus <> 'F'
    """,
)
def subq_in_uncorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus <> 'F'
        """
    )


@query(
    "subq_cte_chain",
    oracle=f"""
    WITH cust_spend AS (
      SELECT o_custkey, {dsum_expr('o_totalprice')} AS spend FROM orders GROUP BY o_custkey),
    segmented AS (
      SELECT c_mktsegment, spend FROM cust_spend JOIN customer ON c_custkey = o_custkey)
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           {dsum_expr('spend')} AS total_spend
    FROM segmented GROUP BY c_mktsegment
    """,
)
def subq_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders", "customer")
    return spark.sql(
        f"""
        WITH cust_spend AS (
          SELECT o_custkey, {dsum_expr('o_totalprice')} AS spend FROM orders GROUP BY o_custkey),
        segmented AS (
          SELECT c_mktsegment, spend FROM cust_spend JOIN customer ON c_custkey = o_custkey)
        SELECT c_mktsegment, COUNT(*) AS n_customers,
               {dsum_expr('spend')} AS total_spend
        FROM segmented GROUP BY c_mktsegment
        """
    )


@query(
    "window_cume_nth",
    oracle="""
    SELECT s_suppkey,
           ROUND(CUME_DIST() OVER w, 6) AS cd,
           NTH_VALUE(s_suppkey, 2) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_richest,
           FIRST_VALUE(s_suppkey) OVER w AS richest,
           LAST_VALUE(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
    """,
)
def window_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")["supplier"]
    w = W.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return s.select(
        "s_suppkey",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("s_suppkey", 2).over(wfull).alias("second_richest"),
        F.first("s_suppkey").over(w).alias("richest"),
        F.last("s_suppkey").over(wfull).alias("poorest"),
    )


@query(
    "fn_array_extra",
    oracle="""
    SELECT vec_id,
           LIST_SORT(LIST_TRANSFORM(embedding[1:4], x -> ROUND(CAST(x AS DOUBLE), 4)), 'DESC')
             AS top_head,
           LEN(FLATTEN([embedding[1:2], embedding[3:4]])) AS flat_len,
           ROUND(CAST(LIST_MIN(embedding) AS DOUBLE), 4) AS vec_min,
           LIST_CONTAINS(LIST_TRANSFORM(embedding, x -> x > 0.5), TRUE) AS any_big,
           ROUND(GREATEST(CAST(embedding[1] AS DOUBLE), CAST(embedding[2] AS DOUBLE)), 4)
             AS head_max,
           ROUND(LEAST(CAST(embedding[1] AS DOUBLE), CAST(embedding[2] AS DOUBLE)), 4)
             AS head_min
    FROM embeddings WHERE vec_id < 50
    """,
)
def fn_array_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    head4 = F.slice("embedding", 1, 4)
    return e.filter(F.col("vec_id") < 50).select(
        "vec_id",
        F.sort_array(
            F.transform(head4, lambda x: F.round(x.cast("double"), 4)), asc=False
        ).alias("top_head"),
        F.size(F.flatten(F.array(F.slice("embedding", 1, 2), F.slice("embedding", 3, 2))))
        .cast("long")
        .alias("flat_len"),
        F.round(F.array_min("embedding").cast("double"), 4).alias("vec_min"),
        F.exists("embedding", lambda x: x > 0.5).alias("any_big"),
        F.round(
            F.greatest(F.col("embedding")[0].cast("double"), F.col("embedding")[1].cast("double")), 4
        ).alias("head_max"),
        F.round(
            F.least(F.col("embedding")[0].cast("double"), F.col("embedding")[1].cast("double")), 4
        ).alias("head_min"),
    )


@query(
    "agg_windowed_time_bucket",
    oracle=f"""
    SELECT DATE_TRUNC('day', ts) AS day, event_type,
           COUNT(*) AS n, {dsum_expr('value')} AS total_value,
           COUNT(DISTINCT user_id) AS uniq_users
    FROM events GROUP BY 1, 2
    """,
)
def agg_windowed_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-side tumbling window via F.window (the streaming operator's
    batch twin — same window() function, same buckets)."""
    ev = _t(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("total_value"),
            F.countDistinct("user_id").alias("uniq_users"),
        )
        .select(F.col("w.start").alias("day"), "event_type", "n", "total_value", "uniq_users")
    )


# ---------------------------------------------------------------------------
# Python-extension surface: pandas UDAF / grouped map / UDTF / state
# ---------------------------------------------------------------------------


@query(
    "udf_weighted_avg",
    oracle="""
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF (quantity-weighted price). fsum in the
    UDAF makes the result order-independent; ROUND(4) absorbs the
    last-ulp difference vs the oracle's sequential sum."""
    from es_analytics_spark.operators.udfs import grouped_weighted_avg

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    out = grouped_weighted_avg(li, ["l_returnflag"], "l_extendedprice", "l_quantity")
    return out.withColumn("wavg", F.round("wavg", 4))


@query(
    "udf_zscore_groupmap",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           ROUND((c_acctbal - AVG(c_acctbal) OVER seg) / STDDEV_SAMP(c_acctbal) OVER seg, 6)
             AS zscore
    FROM customer
    WINDOW seg AS (PARTITION BY c_mktsegment)
    """,
)
def udf_zscore_groupmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map: per-segment z-score normalization —
    the feature-scaling step of a training-data pipeline."""
    from es_analytics_spark.operators.udfs import zscore_normalize

    c = _t(spark, sf_dir, "customer")["customer"].select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    out = zscore_normalize(c, ["c_mktsegment"], "c_acctbal", order_col="c_custkey")
    return out.select("c_custkey", "c_mktsegment", F.round("zscore", 6).alias("zscore"))


@query(
    "udf_token_udtf",
    oracle="""
    SELECT s_suppkey, CAST(p.pos AS INTEGER) AS pos, p.token
    FROM (
      SELECT s_suppkey,
             UNNEST(LIST_TRANSFORM(STRING_SPLIT_REGEX(TRIM(s_name), '\\s+'),
                    (x, i) -> {'pos': i - 1, 'token': x})) AS p
      FROM supplier)
    """,
)
def udf_token_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF expanding text to (pos, token) rows via LATERAL —
    the declared UDTF surface on a deliberately small table."""
    from es_analytics_spark.operators.udfs import token_udtf

    _t(spark, sf_dir, "supplier")
    token_udtf(spark)
    return spark.sql(
        """
        SELECT s_suppkey, t.pos, t.token
        FROM supplier, LATERAL split_tokens(s_name) t
        """
    )


@query(
    "stream_stateful_profiles",
    mutates_conf=True,
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4)::DOUBLE AS total_value,
           MAX(ts) AS last_ts
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState: running per-user profiles across
    micro-batches; the final (max-n) row per user must equal the batch
    aggregate. fsum accumulation over a canonical in-key order makes
    total_value order-independent (round 4 = the dsum contract)."""
    from pyspark.sql import Window as W2

    from es_analytics_spark.streaming.ingest import replay_stream, stream_events
    from es_analytics_spark.streaming.stateful import running_user_profiles

    ev = stream_events(spark, sf_dir)
    out = replay_stream(
        spark, running_user_profiles(ev), name="stream_stateful_profiles", output_mode="append"
    )
    w = W2.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "total_value", "last_ts")
    )


# ---------------------------------------------------------------------------
# More TPC-H classic shapes (adapted to the testdata schema)
# ---------------------------------------------------------------------------


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {dsum_expr('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    return spark.sql(
        f"""
        SELECT supp_nation, cust_nation, l_year, {dsum_expr('volume')} AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                        JOIN orders ON o_orderkey = l_orderkey
                        JOIN customer ON c_custkey = o_custkey
                        JOIN nation n1 ON s_nationkey = n1.n_nationkey
                        JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE n1.n_name IN ('NATION_1', 'NATION_2') AND n2.n_name IN ('NATION_1', 'NATION_2')
            AND n1.n_name <> n2.n_name) shipping
        GROUP BY supp_nation, cust_nation, l_year
        """
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {dsum_expr('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        f"""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 {dsum_expr('l_extendedprice * (1 - l_discount)')} AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@query(
    "tpch_q18_large_volume",
    oracle=f"""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {dsum_expr('l_quantity')} AS total_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
    GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: IN over a grouped HAVING subquery. SUM(double) in the HAVING
    is safe — qty sums are integers-valued, margin ≫ ulp."""
    _t(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        f"""
        SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
               {dsum_expr('l_quantity')} AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        """
    )


@query(
    "tpch_q19_disjunctive",
    oracle=f"""
    SELECT {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-ANDs join filter — exercises predicate normalization
    (CNF extraction pushes the common p_partkey join key)."""
    t = _t(spark, sf_dir, "lineitem", "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@query(
    "fn_nan_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ISNAN(CASE WHEN l_discount = 0 THEN CAST('NaN' AS DOUBLE)
                      ELSE l_extendedprice / l_discount END) AS ratio_is_nan,
           CASE WHEN ISNAN(CASE WHEN l_discount = 0 THEN CAST('NaN' AS DOUBLE)
                                ELSE l_extendedprice / l_discount END)
                THEN -1.0
                ELSE ROUND(l_extendedprice / l_discount, 4) END AS ratio_or_neg1
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def fn_nan_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isnan / nanvl over a computed NaN (declared conditional-family
    coverage; NULL vs NaN distinction is part of the engine contract)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    ratio = F.when(F.col("l_discount") == 0, F.lit(float("nan"))).otherwise(
        F.col("l_extendedprice") / F.col("l_discount")
    )
    return li.filter(F.col("l_orderkey") < 100).select(
        "l_orderkey",
        "l_linenumber",
        F.isnan(ratio).alias("ratio_is_nan"),
        F.when(F.isnan(ratio), F.lit(-1.0)).otherwise(F.round(ratio, 4)).alias("ratio_or_neg1"),
    )


# Registered last: TPC-H suite completion + embedding-dedup / IVF ANN,
# then the modern-SQL surface (LATERAL / RECURSIVE / UNPIVOT / ordered-set).
from es_analytics_spark import queries_ext as _queries_ext  # noqa: E402,F401
from es_analytics_spark import queries_sql2 as _queries_sql2  # noqa: E402,F401
from es_analytics_spark import queries_sql3 as _queries_sql3  # noqa: E402,F401
from es_analytics_spark import queries_sql4 as _queries_sql4  # noqa: E402,F401
from es_analytics_spark import queries_sql5 as _queries_sql5  # noqa: E402,F401
from es_analytics_spark import queries_sql6 as _queries_sql6  # noqa: E402,F401
from es_analytics_spark import queries_sql7 as _queries_sql7  # noqa: E402,F401
from es_analytics_spark import queries_sql8 as _queries_sql8  # noqa: E402,F401
from es_analytics_spark import queries_sql9 as _queries_sql9  # noqa: E402,F401
from es_analytics_spark import queries_sql10 as _queries_sql10  # noqa: E402,F401
from es_analytics_spark import queries_sql11 as _queries_sql11  # noqa: E402,F401
from es_analytics_spark import queries_sql12 as _queries_sql12  # noqa: E402,F401
from es_analytics_spark import queries_sql13 as _queries_sql13  # noqa: E402,F401
from es_analytics_spark import queries_sql14 as _queries_sql14  # noqa: E402,F401
from es_analytics_spark import queries_sql15 as _queries_sql15  # noqa: E402,F401
from es_analytics_spark import queries_sql16 as _queries_sql16  # noqa: E402,F401
from es_analytics_spark import queries_sql17 as _queries_sql17  # noqa: E402,F401
from es_analytics_spark import queries_sql18 as _queries_sql18  # noqa: E402,F401
from es_analytics_spark import queries_sql19 as _queries_sql19  # noqa: E402,F401
from es_analytics_spark import queries_sql20 as _queries_sql20  # noqa: E402,F401
from es_analytics_spark import queries_sql21 as _queries_sql21  # noqa: E402,F401
from es_analytics_spark import queries_sql22 as _queries_sql22  # noqa: E402,F401
from es_analytics_spark import queries_sql23 as _queries_sql23  # noqa: E402,F401
from es_analytics_spark import queries_sql24 as _queries_sql24  # noqa: E402,F401
from es_analytics_spark import queries_sql25 as _queries_sql25  # noqa: E402,F401
from es_analytics_spark import queries_sql26 as _queries_sql26  # noqa: E402,F401
from es_analytics_spark import queries_sql27 as _queries_sql27  # noqa: E402,F401
from es_analytics_spark import queries_sql28 as _queries_sql28  # noqa: E402,F401
from es_analytics_spark import queries_sql29 as _queries_sql29  # noqa: E402,F401
from es_analytics_spark import queries_sql30 as _queries_sql30  # noqa: E402,F401
from es_analytics_spark import queries_sql31 as _queries_sql31  # noqa: E402,F401
from es_analytics_spark import queries_sql32 as _queries_sql32  # noqa: E402,F401
from es_analytics_spark import queries_sql33 as _queries_sql33  # noqa: E402,F401
from es_analytics_spark import queries_sql34 as _queries_sql34  # noqa: E402,F401
from es_analytics_spark import queries_sql35 as _queries_sql35  # noqa: E402,F401
from es_analytics_spark import queries_sql36 as _queries_sql36  # noqa: E402,F401
from es_analytics_spark import queries_sql37 as _queries_sql37  # noqa: E402,F401
from es_analytics_spark import queries_sql38 as _queries_sql38  # noqa: E402,F401
from es_analytics_spark import queries_sql39 as _queries_sql39  # noqa: E402,F401
from es_analytics_spark import queries_sql40 as _queries_sql40  # noqa: E402,F401
from es_analytics_spark import queries_sql41 as _queries_sql41  # noqa: E402,F401
from es_analytics_spark import queries_sql42 as _queries_sql42  # noqa: E402,F401
from es_analytics_spark import queries_sql43 as _queries_sql43  # noqa: E402,F401
from es_analytics_spark import queries_sql44 as _queries_sql44  # noqa: E402,F401
from es_analytics_spark import queries_sql45 as _queries_sql45  # noqa: E402,F401
from es_analytics_spark import queries_sql46 as _queries_sql46  # noqa: E402,F401
from es_analytics_spark import queries_sql47 as _queries_sql47  # noqa: E402,F401
from es_analytics_spark import queries_sql48 as _queries_sql48  # noqa: E402,F401
from es_analytics_spark import queries_sql49 as _queries_sql49  # noqa: E402,F401
from es_analytics_spark import queries_sql50 as _queries_sql50  # noqa: E402,F401
from es_analytics_spark import queries_sql51 as _queries_sql51  # noqa: E402,F401
from es_analytics_spark import queries_sql52 as _queries_sql52  # noqa: E402,F401
from es_analytics_spark import queries_sql53 as _queries_sql53  # noqa: E402,F401
from es_analytics_spark import queries_sql54 as _queries_sql54  # noqa: E402,F401
from es_analytics_spark import queries_sql55 as _queries_sql55  # noqa: E402,F401
