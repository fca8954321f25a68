"""Round-5 batch-28 surface: discounted NPV of purchase streams, the
paired sign test, and degree inequality (Gini) of the co-supply graph.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql16 import _PDF_EXPR, _T_EXPR, _P2_EXPR


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Discounted NPV of each user's purchase stream
# ---------------------------------------------------------------------------

# Weekly discount rate 10%: factor = 1.1^(-t_days/7), spelled as
# EXP(-(t/7) * LN(1.1)) so both engines run the identical LN/EXP tree
# on identical rationals (the catalog LN/EXP precedent).
_NPV_SQL = f"""
    WITH base AS (
        SELECT CAST(MIN(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)))
                    AS BIGINT) AS d0
        FROM events
    ), pur AS MATERIALIZED (
        SELECT e.user_id,
               e.value,
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(e.ts AS DATE))
                    AS BIGINT) - b.d0 AS t
        FROM events e CROSS JOIN base b
        WHERE e.event_type = 'purchase'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           {dsum_expr('value')} AS nominal_total,
           FLOOR({dsum_expr(
               'value * EXP(-(t / 7.0) * LN(1.1))')} * 1e6 + 0.5) / 1e6
               AS npv
    FROM pur GROUP BY user_id
"""


@query("fn_npv_discounted", oracle=_NPV_SQL)
def fn_npv_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net present value of every user's purchase stream at a 10%
    weekly discount (anchored at the corpus start date): the
    time-value-of-money rollup behind LTV-to-CAC decisions —
    ts_cohort_ltv accumulates nominal revenue; NPV is what a finance
    model actually compares against acquisition cost, and the discount
    kernel (EXP(-t/7 * LN(1.1))) is the same machinery as
    attr_time_decay's attribution decay, repurposed for valuation.

    Exactness: day offsets are exact integers; each discount factor is
    one LN/EXP tree on identical rationals (accepted precedent class);
    nominal and discounted totals are decimal-contract sums; NPV
    quantizes at 1e-6.

    Scale: one broadcast anchor row + one user-grain aggregate
    (map-side combinable)."""
    e = _t(spark, sf_dir, "events")["events"]
    epoch_day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).cast(
        "bigint"
    )
    base = e.agg(F.min(epoch_day).alias("d0"))
    pur = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(base))
        .select(
            "user_id",
            "value",
            (epoch_day - F.col("d0")).alias("t"),
        )
    )
    disc = F.col("value") * F.exp(
        -(F.col("t") / F.lit(7.0)) * F.log(F.lit(1.1))
    )
    return pur.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        dsum("value").alias("nominal_total"),
        _q6(dsum(disc)).alias("npv"),
    )


# ---------------------------------------------------------------------------
# Paired sign test: first-half vs second-half per-user revenue
# ---------------------------------------------------------------------------

_SIGN_SQL = f"""
    WITH span AS (
        SELECT CAST(MIN(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)))
                    AS BIGINT) AS d0,
               CAST(MAX(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)))
                    AS BIGINT) AS d1
        FROM events
    ), pu AS MATERIALIZED (
        SELECT e.user_id,
               {dsum_expr("CASE WHEN event_type = 'purchase' AND "
                          "CAST(DATEDIFF('day', DATE '1970-01-01',"
                          " CAST(ts AS DATE)) AS BIGINT)"
                          " <= (s.d0 + s.d1) // 2 THEN value ELSE 0 END")}
                   AS h1,
               {dsum_expr("CASE WHEN event_type = 'purchase' AND "
                          "CAST(DATEDIFF('day', DATE '1970-01-01',"
                          " CAST(ts AS DATE)) AS BIGINT)"
                          " > (s.d0 + s.d1) // 2 THEN value ELSE 0 END")}
                   AS h2
        FROM events e CROSS JOIN span s
        GROUP BY e.user_id
    ), signs AS (
        SELECT CAST(COUNT(*) FILTER (WHERE h2 > h1) AS BIGINT) AS n_pos,
               CAST(COUNT(*) FILTER (WHERE h2 < h1) AS BIGINT) AS n_neg
        FROM pu WHERE h1 <> h2
    ), zs AS (
        SELECT n_pos, n_neg,
               FLOOR((ABS(CAST(n_pos AS DOUBLE)
                          - (n_pos + n_neg) / 2.0) - 0.5)
                     / (SQRT(CAST(n_pos + n_neg AS DOUBLE)) / 2.0)
                     * 1e6 + 0.5) / 1e6 AS z
        FROM signs
    ), tstage AS (
        SELECT *, {_T_EXPR} AS t, {_PDF_EXPR} AS pdf FROM zs
    )
    SELECT n_pos AS n_improved, n_neg AS n_declined, z AS z_sign,
           FLOOR(({_P2_EXPR}) * 1e6 + 0.5) / 1e6 AS p_two_sided
    FROM tstage
"""


@query("stat_sign_test", oracle=_SIGN_SQL)
def stat_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired sign test: did each user's purchase revenue improve from
    the first half of the observation window to the second? Counts
    improvers vs decliners (exact ties excluded — the classical rule)
    and tests the 50/50 null with a continuity-corrected normal z —
    the weakest-assumption paired test there is (no symmetry needed,
    unlike Wilcoxon; the within-user pairing removes the cross-user
    variance that drowns an unpaired comparison).

    Exactness: half-window revenues are decimal-contract sums (exact
    scale-4 doubles, so > / < / = comparisons are exact); the z is one
    fixed tree on exact counts, quantized before the pinned CDF.

    Scale: one user-grain aggregate and a 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    epoch_day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).cast(
        "bigint"
    )
    span = e.agg(
        F.min(epoch_day).alias("d0"), F.max(epoch_day).alias("d1")
    )
    mid = F.floor((F.col("d0") + F.col("d1")) / 2).cast("bigint")
    pu = (
        e.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            dsum(
                F.when(
                    (F.col("event_type") == "purchase") & (epoch_day <= mid),
                    F.col("value"),
                ).otherwise(0)
            ).alias("h1"),
            dsum(
                F.when(
                    (F.col("event_type") == "purchase") & (epoch_day > mid),
                    F.col("value"),
                ).otherwise(0)
            ).alias("h2"),
        )
    )
    signs = pu.filter(F.col("h1") != F.col("h2")).agg(
        F.count_if(F.col("h2") > F.col("h1")).cast("bigint").alias("n_pos"),
        F.count_if(F.col("h2") < F.col("h1")).cast("bigint").alias("n_neg"),
    )
    n = (F.col("n_pos") + F.col("n_neg")).cast("double")
    zs = signs.select(
        "n_pos",
        "n_neg",
        _q6(
            (
                F.abs(
                    F.col("n_pos").cast("double")
                    - (F.col("n_pos") + F.col("n_neg")) / F.lit(2.0)
                )
                - F.lit(0.5)
            )
            / (F.sqrt(n) / F.lit(2.0))
        ).alias("z"),
    )
    tstage = zs.withColumn("t", F.expr(_T_EXPR)).withColumn(
        "pdf", F.expr(_PDF_EXPR)
    )
    return tstage.select(
        F.col("n_pos").alias("n_improved"),
        F.col("n_neg").alias("n_declined"),
        F.col("z").alias("z_sign"),
        _q6(F.expr(_P2_EXPR)).alias("p_two_sided"),
    )


# ---------------------------------------------------------------------------
# Degree inequality (Gini) of the co-supply graph
# ---------------------------------------------------------------------------


def _degree_gini_sql() -> str:
    from es_analytics_spark.queries_sql4 import _EDGES_CTE

    return f"""
    WITH {_EDGES_CTE},
    dd AS MATERIALIZED (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY node
    ), ranked AS (
        SELECT node, d, ROW_NUMBER() OVER (ORDER BY d ASC, node ASC) AS i,
               COUNT(*) OVER () AS n, SUM(d) OVER () AS s
        FROM dd
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_nodes,
           CAST(MAX(s) AS BIGINT) AS total_degree,
           CAST(MAX(CASE WHEN i = n THEN d END) AS BIGINT) AS max_degree,
           FLOOR(CAST(MAX(s) AS DOUBLE) / MAX(n) * 1e6 + 0.5) / 1e6
               AS mean_degree,
           FLOOR((2.0 * SUM(i * d) / (MAX(n) * CAST(MAX(s) AS DOUBLE))
                  - (MAX(n) + 1.0) / MAX(n)) * 1e6) / 1e6 AS degree_gini
    FROM ranked
"""


@query("graph_degree_gini", oracle=_degree_gini_sql())
def graph_degree_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree inequality of the co-supply graph: the Gini coefficient
    over node degrees plus max/mean degree — the one-number hub-
    concentration summary that pairs with graph_rich_club (phi says
    whether hubs interconnect; degree Gini says how extreme the hub
    hierarchy is, the practical skew warning for any per-node fan-out
    join).

    Exactness: degrees and ranks are exact integers via the
    distributed range-rank recipe; sum(i*d) is an exact BIGINT; the
    Gini is one quantized expression (the agg_revenue_concentration
    identity).

    Scale: one degree aggregate, one range shuffle for the rank, a
    1-row reduction — no single-partition window."""
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    edges = _co_supply_edges(spark, sf_dir)
    dd = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
        .transform(cut_lineage)
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        dd.repartitionByRange(n_parts, F.asc("d"), F.asc("node"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "lr",
        F.row_number().over(
            W.partitionBy("pid").orderBy(F.asc("d"), F.asc("node"))
        ),
    )
    offsets = cumulative_offsets(
        ranged.groupBy("pid").agg(F.count("*").alias("cnt"))
    )
    tot = ranged.agg(
        F.count(F.lit(1)).alias("n"), F.sum("d").alias("s")
    )
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("i", F.col("lr") + F.col("off"))
        .crossJoin(F.broadcast(tot))
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_nodes"),
        F.max("s").cast("bigint").alias("total_degree"),
        F.max(F.when(F.col("i") == F.col("n"), F.col("d")))
        .cast("bigint")
        .alias("max_degree"),
        _q6(F.max("s").cast("double") / F.max("n")).alias("mean_degree"),
        (
            F.floor(
                (
                    2.0
                    * F.sum(F.col("i") * F.col("d"))
                    / (F.max("n") * F.max("s").cast("double"))
                    - (F.max("n") + 1.0) / F.max("n")
                )
                * 1e6
            )
            / 1e6
        ).alias("degree_gini"),
    )
