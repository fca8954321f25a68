"""Modern-SQL surface extensions: ordered-set aggregates, UNPIVOT,
LATERAL joins, recursive CTEs, and fixed-bound histograms.

These close the gap between "classic TPC-H SQL" and the SQL a 2020s
analytics user writes daily. Each entry pairs the Spark implementation
(SQL or DataFrame, whichever is the native surface for the feature)
with a DuckDB oracle; where an engine lacks a builtin (DuckDB has no
``width_bucket``) the oracle spells out the equivalent arithmetic so
the comparison stays exact.

Scale notes are per-docstring. None of these shapes add a shuffle
beyond the aggregation/join they express: LATERAL decorrelates to a
ranked window, recursion here generates a tiny spine (dimension-sized,
broadcast), and UNPIVOT/histogram are map-side only until their final
aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.queries import _t, query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the requested tables as temp views (idempotent) so
    SQL-surface queries can run through spark.sql."""
    for name, df in _t(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Ordered-set / positional aggregates
# ---------------------------------------------------------------------------

_MODE_MEDIAN_SQL = """
    WITH qty_counts AS (
        SELECT l_returnflag, l_quantity, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ), qty_mode AS (
        SELECT l_returnflag, l_quantity AS mode_qty
        FROM (SELECT l_returnflag, l_quantity,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                        ORDER BY n DESC, l_quantity ASC) AS rn
              FROM qty_counts) r
        WHERE rn = 1
    ), stats AS (
        SELECT l_returnflag,
               CAST(MEDIAN(l_quantity) AS DOUBLE) AS median_qty,
               CAST(PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_extendedprice)
                    AS DOUBLE) AS q1_price,
               CAST(PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY l_extendedprice)
                    AS DOUBLE) AS q3_price
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT s.l_returnflag, m.mode_qty, s.median_qty, s.q1_price, s.q3_price
    FROM stats s JOIN qty_mode m ON s.l_returnflag = m.l_returnflag
"""


@query("agg_mode_median", oracle=_MODE_MEDIAN_SQL)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates: deterministic MODE (max count, value
    tie-break), MEDIAN, and PERCENTILE_DISC quartiles per return flag.

    MODE is computed as a rank over grouped counts rather than the
    builtin ``mode()`` because both Spark's and DuckDB's builtins pick
    an arbitrary value on frequency ties — the explicit form pins the
    answer. PERCENTILE_DISC selects an actual data value (no
    interpolation), so the comparison is exact, not float-fuzzy.

    Scale: two partial+final hash aggregates over one scan each, keyed
    on the (tiny) flag domain; the mode rank runs over the grouped
    counts (|flags| x |distinct qty| rows), not the fact table.
    """
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_MODE_MEDIAN_SQL)


# ---------------------------------------------------------------------------
# UNPIVOT (wide -> long)
# ---------------------------------------------------------------------------


@query(
    "fn_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, k AS metric, v AS amount
    FROM (SELECT l_orderkey, l_linenumber,
                 l_quantity AS qty, l_extendedprice AS price,
                 l_discount AS disc, l_tax AS tax
          FROM lineitem)
    UNPIVOT (v FOR k IN (qty, price, disc, tax))
    """,
)
def fn_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long UNPIVOT of four lineitem measures into
    (metric, amount) pairs — the melt step feeding any long-format
    metrics store.

    Scale: pure map-side expansion (Expand node, 4x rows, no shuffle);
    column pruning still reaches the scan because only the six source
    columns are read.
    """
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_discount").alias("disc"),
        F.col("l_tax").alias("tax"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["qty", "price", "disc", "tax"],
        "metric",
        "amount",
    )


# ---------------------------------------------------------------------------
# LATERAL join (correlated table subquery)
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
    SELECT n_name, l.s_name, l.s_acctbal
    FROM nation, LATERAL (
        SELECT s_name, s_acctbal
        FROM supplier
        WHERE s_nationkey = n_nationkey
        ORDER BY s_acctbal DESC, s_name ASC
        LIMIT 2
    ) l
"""


@query("join_lateral_topk", oracle=_LATERAL_SQL)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 suppliers by account balance
    per nation, expressed as the SQL-standard lateral form rather than
    a window + filter.

    Catalyst decorrelates this to a ranked window over the join of
    supplier x nation — no per-row subquery execution. Scale: one
    shuffle on the correlation key (nationkey); the tie-broken ORDER BY
    makes the answer deterministic.
    """
    _views(spark, sf_dir, "nation", "supplier")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Recursive CTE
# ---------------------------------------------------------------------------

_RECURSIVE_SQL = """
    WITH RECURSIVE months(m) AS (
        SELECT TIMESTAMP '1992-01-01 00:00:00'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < TIMESTAMP '1998-12-01 00:00:00'
    )
    SELECT m AS month_start, COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders ON DATE_TRUNC('MONTH', o_orderdate) = m
    GROUP BY m
"""


@query("subq_recursive_cte", oracle=_RECURSIVE_SQL)
def subq_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate an 84-month
    spine by recursion, then LEFT JOIN order counts per month —
    months with no orders surface as zero rows instead of gaps.

    Scale: the recursive part produces 84 rows on the driver-side
    local relation; the join broadcasts the spine against the orders
    aggregate, so the only shuffle is the per-month count. Recursion
    depth is bounded by the WHERE guard (84 < the engine's recursion
    limit).
    """
    _views(spark, sf_dir, "orders")
    return spark.sql(_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# Fixed-bound histogram (width_bucket)
# ---------------------------------------------------------------------------


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(CASE WHEN l_extendedprice < 0 THEN 0
                     WHEN l_extendedprice >= 120000 THEN 25
                     ELSE FLOOR(l_extendedprice / 5000) + 1 END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           ROUND(MIN(l_extendedprice), 2) AS lo,
           ROUND(MAX(l_extendedprice), 2) AS hi
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound 24-bucket histogram of extended price via
    ``width_bucket`` (DuckDB lacks the builtin, so the oracle spells
    out the same bucket arithmetic: 5000-wide buckets over
    [0, 120000), underflow->0, overflow->25).

    Scale: bucket id is a map-side expression; the aggregate is a
    partial+final hash agg on <=26 keys — the canonical cheap
    distribution profile at any data size.
    """
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.withColumn(
            "bucket",
            F.expr("width_bucket(l_extendedprice, 0.0, 120000.0, 24)").cast("bigint"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("l_extendedprice"), 2).alias("lo"),
            F.round(F.max("l_extendedprice"), 2).alias("hi"),
        )
    )
