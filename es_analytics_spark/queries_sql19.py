"""Round-5 batch-19 surface: drawdown spell analysis, log-log price
elasticity, F1-optimal decision-threshold tuning, a Poisson-Gamma
Bayesian rate comparison, and two-hop graph reach.

Same contract as the rest of the catalog (see queries.py): Spark-first
implementation + DuckDB oracle per entry, deterministic row sets,
decimal-sum contract for aggregated floats, LN/EXP only on identical
rationals inside fixed IEEE trees, 1e-6 half-up quantization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql16 import _PDF_EXPR, _T_EXPR
from es_analytics_spark.queries_sql17 import _TAIL_EXPR


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Drawdown spells on the net-flow equity curve
# ---------------------------------------------------------------------------

_SPELL_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr("CASE WHEN event_type = 'purchase'"
                          " THEN value ELSE 0 END")}
               - {dsum_expr("CASE WHEN event_type = 'error'"
                            " THEN value ELSE 0 END")} AS y
        FROM events GROUP BY 1
    ), eq AS MATERIALIZED (
        SELECT day,
               CAST(ROUND(SUM(CAST(y AS DECIMAL(38,10)))
                          OVER (ORDER BY day), 4) AS DOUBLE) AS e
        FROM daily
    ), uw AS MATERIALIZED (
        SELECT day, e, MAX(e) OVER (ORDER BY day) AS rm,
               ROW_NUMBER() OVER (ORDER BY day) AS rn
        FROM eq
    ), under AS MATERIALIZED (
        SELECT day, rm - e AS depth,
               rn - ROW_NUMBER() OVER (ORDER BY day) AS isle
        FROM uw WHERE e < rm
    )
    SELECT MIN(day) AS spell_start,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           FLOOR(MAX(depth) * 1e6 + 0.5) / 1e6 AS max_depth
    FROM under GROUP BY isle
"""


@query("ts_drawdown_spells", oracle=_SPELL_SQL)
def ts_drawdown_spells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Underwater-spell table of the cumulative net-flow curve
    (purchase value minus error chargebacks, day by day): one row per
    contiguous run of days below the running peak, with its start, its
    length, and its deepest point — ts_max_drawdown reports the single
    worst excursion; this reports EVERY recovery cycle, the shape a
    finance/reliability review reads for "how long do slumps last".
    Spelled as the gaps-islands idiom (row_number difference) on the
    underwater day set.

    Exactness: daily net flow is a difference of two decimal-contract
    sums (exact scale-4 doubles); the equity curve is an exact
    windowed DECIMAL cumsum (the dsum-as-window convention); running
    max, the underwater comparison, and depths are exact arithmetic on
    those scale-4 doubles; only max_depth is quantized.

    Scale: one shuffle to the daily grain; every window runs over the
    |days| frame — calendar-bounded (plan-guard allowlisted on that
    bound, same as ts_max_drawdown)."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            (
                dsum(
                    F.when(
                        F.col("event_type") == "purchase", F.col("value")
                    ).otherwise(0)
                )
                - dsum(
                    F.when(
                        F.col("event_type") == "error", F.col("value")
                    ).otherwise(0)
                )
            ).alias("y")
        )
        .transform(cut_lineage)
    )
    wd = W.orderBy("day")
    eq = daily.select(
        "day",
        F.round(
            F.sum(F.col("y").cast(T.DecimalType(38, 10))).over(
                wd.rowsBetween(W.unboundedPreceding, 0)
            ),
            4,
        )
        .cast("double")
        .alias("e"),
    )
    uw = eq.select(
        "day",
        "e",
        F.max("e").over(wd.rowsBetween(W.unboundedPreceding, 0)).alias("rm"),
        F.row_number().over(wd).alias("rn"),
    )
    under = uw.filter(F.col("e") < F.col("rm")).select(
        "day",
        (F.col("rm") - F.col("e")).alias("depth"),
        (F.col("rn") - F.row_number().over(wd)).alias("isle"),
    )
    return under.groupBy("isle").agg(
        F.min("day").alias("spell_start"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _q6(F.max("depth")).alias("max_depth"),
    ).select("spell_start", "n_days", "max_depth")


# ---------------------------------------------------------------------------
# Log-log price elasticity of demand per brand
# ---------------------------------------------------------------------------

_ELAST_SQL = f"""
    WITH demand AS MATERIALIZED (
        SELECT p.p_brand, p.p_partkey,
               LN(p.p_retailprice) AS x,
               LN({dsum_expr('l.l_quantity')}) AS y
        FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand, p.p_partkey, p.p_retailprice
    ), mom AS (
        SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('x')} AS sx, {dsum_expr('y')} AS sy,
               {dsum_expr('x * x')} AS sxx, {dsum_expr('x * y')} AS sxy
        FROM demand GROUP BY 1
    )
    SELECT p_brand, n AS n_parts,
           FLOOR((sxy - sx * sy / n) / (sxx - sx * sx / n) * 1e6 + 0.5) / 1e6
               AS elasticity,
           FLOOR((sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n)
                          * (sx / n)) * 1e6 + 0.5) / 1e6 AS log_intercept
    FROM mom
"""


@query("agg_price_elasticity", oracle=_ELAST_SQL)
def agg_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand: regress ln(total
    quantity sold) on ln(retail price) across each brand's parts — the
    textbook constant-elasticity estimate (slope = % demand change per
    % price change) every pricing team asks for, and the economic
    companion to agg_linear_regression's levels fit.

    Exactness: per-part demand is a decimal-contract sum (an exact
    integer in double); both LNs run on exact rationals (the catalog
    LN precedent); the per-brand moments decimal-sum those identical
    doubles; slope/intercept are one fixed IEEE tree each, quantized
    at 1e-6.

    Scale: one join shuffle to the part grain (map-side combinable
    quantity sum), one brand-grain aggregate — no windows, no
    brand-level fan-out."""
    t = _t(spark, sf_dir, "part", "lineitem")
    demand = (
        t["lineitem"]
        .join(
            t["part"].select("p_partkey", "p_brand", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_partkey", "p_retailprice")
        .agg(dsum("l_quantity").alias("qty"))
        .select(
            "p_brand",
            F.log(F.col("p_retailprice")).alias("x"),
            F.log(F.col("qty")).alias("y"),
        )
        .transform(cut_lineage)
    )
    mom = demand.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    )
    return mom.select(
        "p_brand",
        F.col("n").alias("n_parts"),
        _q6(slope).alias("elasticity"),
        _q6(F.col("sy") / F.col("n") - slope * (F.col("sx") / F.col("n"))).alias(
            "log_intercept"
        ),
    )


# ---------------------------------------------------------------------------
# F1-optimal decision threshold over the behavioral score
# ---------------------------------------------------------------------------

_THRESH_SQL = """
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               CAST(LEAST(GREATEST(SUM(CASE WHEN event_type = 'click'
                                            THEN 1 ELSE 0 END) - 8, 0) // 2, 6)
                    AS BIGINT) AS bin,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label
        FROM events WHERE user_id % 3 = 0 GROUP BY user_id
    ), bins AS MATERIALIZED (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(label) AS BIGINT) AS x
        FROM pu GROUP BY bin
    ), th AS (
        SELECT CAST(r.range AS BIGINT) AS threshold FROM range(0, 8) r
    ), conf AS MATERIALIZED (
        SELECT t.threshold,
               CAST(SUM(CASE WHEN b.bin >= t.threshold THEN b.x ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN b.bin >= t.threshold THEN b.n - b.x ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN b.bin < t.threshold THEN b.x ELSE 0 END)
                    AS BIGINT) AS fn
        FROM th t CROSS JOIN bins b
        GROUP BY t.threshold
    ), scored AS MATERIALIZED (
        SELECT threshold, tp, fp, fn,
               CASE WHEN tp = 0 THEN 0.0
                    ELSE FLOOR(CAST(tp AS DOUBLE) / (tp + fp) * 1e6 + 0.5) / 1e6
               END AS precision_,
               CASE WHEN tp = 0 THEN 0.0
                    ELSE FLOOR(CAST(tp AS DOUBLE) / (tp + fn) * 1e6 + 0.5) / 1e6
               END AS recall_,
               CASE WHEN tp = 0 THEN 0.0
                    ELSE FLOOR(2.0 * tp / (2.0 * tp + fp + fn) * 1e6 + 0.5) / 1e6
               END AS f1
        FROM conf
    ), best AS (
        SELECT MIN(threshold) AS bt FROM scored
        WHERE f1 = (SELECT MAX(f1) FROM scored)
    )
    SELECT threshold, tp, fp, fn,
           precision_ AS precision_pos, recall_ AS recall_pos, f1,
           CAST(CASE WHEN threshold = best.bt THEN 1 ELSE 0 END AS BIGINT)
               AS is_best
    FROM scored CROSS JOIN best
"""


@query("ml_threshold_tuning", oracle=_THRESH_SQL)
def ml_threshold_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-threshold sweep for the behavioral score the
    calibration family trains (same click-count bins, same
    high-value-purchase label, evaluated on the user_id % 3 test
    population): for every cut "predict positive when bin >= t",
    the confusion counts, precision, recall, F1, and the F1-argmax
    flag — the table that turns a scored model into a deployable
    classifier (ml_auc_score ranks; this picks the operating point).

    Exactness: all confusion counts are exact integers via a
    threshold-grid x bin-grid cross join (8 x 7 constant rows — no
    cumulative window, no allowlist entry); precision/recall/F1 are
    single quantized divisions; the argmax breaks ties toward the
    smaller threshold with exact comparisons on quantized F1.

    Scale: user-grain aggregate -> constant bin grid; everything after
    is constant-size arithmetic."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = (
        e.filter(F.col("user_id") % 3 == 0)
        .groupBy("user_id")
        .agg(
            F.least(
                F.floor(
                    F.greatest(
                        F.sum(
                            F.when(F.col("event_type") == "click", 1).otherwise(
                                0
                            )
                        )
                        - 8,
                        F.lit(0),
                    )
                    / 2
                ),
                F.lit(6).cast("bigint"),
            )
            .cast("bigint")
            .alias("bin"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= 100.0),
                    1,
                ).otherwise(0)
            ).alias("label"),
        )
    )
    bins = (
        pu.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("x"),
        )
        .transform(cut_lineage)
    )
    th = spark.range(0, 8).select(F.col("id").cast("bigint").alias("threshold"))
    conf = (
        bins.crossJoin(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("bin") >= F.col("threshold"), F.col("x")).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when(
                    F.col("bin") >= F.col("threshold"), F.col("n") - F.col("x")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(F.when(F.col("bin") < F.col("threshold"), F.col("x")).otherwise(0))
            .cast("bigint")
            .alias("fn"),
        )
    )
    prec = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(
        _q6(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")))
    )
    rec = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(
        _q6(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")))
    )
    f1 = F.when(F.col("tp") == 0, F.lit(0.0)).otherwise(
        _q6(
            F.lit(2.0)
            * F.col("tp")
            / (F.lit(2.0) * F.col("tp") + F.col("fp") + F.col("fn"))
        )
    )
    scored = conf.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        prec.alias("precision_pos"),
        rec.alias("recall_pos"),
        f1.alias("f1"),
    ).transform(cut_lineage)
    mx = scored.agg(F.max("f1").alias("mf"))
    best = (
        scored.crossJoin(F.broadcast(mx))
        .filter(F.col("f1") == F.col("mf"))
        .agg(F.min("threshold").alias("bt"))
    )
    return scored.crossJoin(F.broadcast(best)).select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "precision_pos",
        "recall_pos",
        "f1",
        F.when(F.col("threshold") == F.col("bt"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_best"),
    )


# ---------------------------------------------------------------------------
# Poisson-Gamma Bayesian rate comparison per variant
# ---------------------------------------------------------------------------

_POIS_SQL = f"""
    WITH per_user AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                    AS BIGINT) AS k
        FROM events GROUP BY 1, 2
    ), agg AS (
        SELECT CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS n0,
               CAST(SUM(k) FILTER (WHERE variant = 0) AS BIGINT) AS k0,
               CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS n1,
               CAST(SUM(k) FILTER (WHERE variant = 1) AS BIGINT) AS k1
        FROM per_user
    ), post AS (
        SELECT n0, k0, n1, k1,
               CAST(1 + k0 AS DOUBLE) / (1 + n0) AS m0,
               CAST(1 + k1 AS DOUBLE) / (1 + n1) AS m1,
               CAST(1 + k0 AS DOUBLE)
                   / (CAST(1 + n0 AS DOUBLE) * (1 + n0)) AS v0,
               CAST(1 + k1 AS DOUBLE)
                   / (CAST(1 + n1 AS DOUBLE) * (1 + n1)) AS v1
        FROM agg
    ), zs AS (
        SELECT n0, k0, n1, k1, m0, m1,
               FLOOR((m1 - m0) / SQRT(v0 + v1) * 1e6 + 0.5) / 1e6 AS z
        FROM post
    ), tstage AS (
        SELECT *, {_T_EXPR} AS t, {_PDF_EXPR} AS pdf FROM zs
    )
    SELECT n0 AS n_control, k0 AS events_control,
           n1 AS n_treat, k1 AS events_treat,
           FLOOR(m0 * 1e6 + 0.5) / 1e6 AS post_rate_control,
           FLOOR(m1 * 1e6 + 0.5) / 1e6 AS post_rate_treat,
           FLOOR(m1 / m0 * 1e6 + 0.5) / 1e6 AS rate_ratio,
           z,
           FLOOR((CASE WHEN z >= 0 THEN 1.0 - ({_TAIL_EXPR})
                       ELSE {_TAIL_EXPR} END) * 1e6 + 0.5) / 1e6
               AS p_treat_higher_rate
    FROM tstage
"""


@query("stat_bayes_poisson_rates", oracle=_POIS_SQL)
def stat_bayes_poisson_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-Gamma Bayesian comparison of per-user purchase RATES by
    variant: Gamma(1,1) prior + per-user event counts give a
    Gamma(1 + events, 1 + users) posterior on each arm's rate;
    posterior means, the rate ratio, and the normal-approximate
    P(treatment rate > control rate) — the count-metric sibling of
    ab_bayes_beta_normal (conversion is Bernoulli; frequency/intensity
    metrics are Poisson, and conflating them understates variance).

    Exactness: posterior moments are exact-integer rationals in one
    fixed IEEE tree; z quantizes at 1e-6 BEFORE the pinned A&S
    26.2.17 CDF fragments.

    Scale: one user-grain aggregate and a 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    per_user = e.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.count(F.when(F.col("event_type") == "purchase", 1))
        .cast("bigint")
        .alias("k")
    )
    agg = per_user.agg(
        F.count_if(F.col("variant") == 0).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("k"))).cast("bigint").alias("k0"),
        F.count_if(F.col("variant") == 1).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("k"))).cast("bigint").alias("k1"),
    )
    m0 = (F.lit(1) + F.col("k0")).cast("double") / (F.lit(1) + F.col("n0"))
    m1 = (F.lit(1) + F.col("k1")).cast("double") / (F.lit(1) + F.col("n1"))
    v0 = (F.lit(1) + F.col("k0")).cast("double") / (
        (F.lit(1) + F.col("n0")).cast("double") * (F.lit(1) + F.col("n0"))
    )
    v1 = (F.lit(1) + F.col("k1")).cast("double") / (
        (F.lit(1) + F.col("n1")).cast("double") * (F.lit(1) + F.col("n1"))
    )
    zs = agg.select(
        "n0",
        "k0",
        "n1",
        "k1",
        m0.alias("m0"),
        m1.alias("m1"),
        _q6((m1 - m0) / F.sqrt(v0 + v1)).alias("z"),
    )
    tstage = zs.withColumn("t", F.expr(_T_EXPR)).withColumn(
        "pdf", F.expr(_PDF_EXPR)
    )
    return tstage.select(
        F.col("n0").alias("n_control"),
        F.col("k0").alias("events_control"),
        F.col("n1").alias("n_treat"),
        F.col("k1").alias("events_treat"),
        _q6(F.col("m0")).alias("post_rate_control"),
        _q6(F.col("m1")).alias("post_rate_treat"),
        _q6(F.col("m1") / F.col("m0")).alias("rate_ratio"),
        "z",
        _q6(
            F.when(F.col("z") >= 0, F.lit(1.0) - F.expr(_TAIL_EXPR)).otherwise(
                F.expr(_TAIL_EXPR)
            )
        ).alias("p_treat_higher_rate"),
    )


# ---------------------------------------------------------------------------
# Two-hop reach over the thinned co-supply graph
# ---------------------------------------------------------------------------

_REACH_TOP = 20


def _reach_sql() -> str:
    from es_analytics_spark.queries_sql4 import _EDGES_CTE
    from es_analytics_spark.queries_sql9 import _CC_MOD

    return f"""
    WITH {_EDGES_CTE},
    thin AS MATERIALIZED (
        SELECT u, v FROM edges WHERE (u * 131 + v * 17) % {_CC_MOD} = 0
    ), sym AS MATERIALIZED (
        SELECT u, v FROM thin UNION ALL SELECT v AS u, u AS v FROM thin
    ), two AS (
        SELECT a.u, b.v FROM sym a JOIN sym b ON b.u = a.v
        WHERE b.v <> a.u
        UNION
        SELECT u, v FROM sym
    )
    SELECT u AS node, CAST(COUNT(DISTINCT v) AS BIGINT) AS reach2
    FROM two GROUP BY u
    ORDER BY reach2 DESC, node ASC LIMIT {_REACH_TOP}
"""


@query("graph_two_hop_reach", oracle=_reach_sql())
def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach (distinct nodes within distance <= 2) for the
    top-20 best-connected nodes of the thinned co-supply graph — the
    influence/neighborhood-size primitive behind friend-of-friend
    recommendations and blast-radius estimates, one hop past plain
    degree and far cheaper than full BFS (graph_bfs_distance).

    Exactness: pure exact-integer set arithmetic (distinct union of
    1-hop and 2-hop neighbors, self excluded); top-20 orders by exact
    counts with the node id breaking ties.

    Scale: the 2-hop expansion is the edge-list self-join — work is
    sum(deg^2), the published bound for friend-of-friend; on
    power-law graphs cap the hub fan-out (the rec_user_cf_topk
    popularity-cap recipe) before the join. Distinct counts are one
    map-side-combinable aggregate; the top-20 is TakeOrdered."""
    from es_analytics_spark.queries_sql4 import _co_supply_edges
    from es_analytics_spark.queries_sql9 import _CC_MOD

    e = _co_supply_edges(spark, sf_dir).filter(
        (F.col("u") * 131 + F.col("v") * 17) % _CC_MOD == 0
    )
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).transform(cut_lineage)
    a = sym.alias("a")
    b = sym.alias("b")
    two = (
        a.join(b, F.col("b.u") == F.col("a.v"))
        .filter(F.col("b.v") != F.col("a.u"))
        .select(F.col("a.u").alias("u"), F.col("b.v").alias("v"))
        .union(sym)
        .distinct()
    )
    return (
        two.groupBy(F.col("u").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("reach2"))
        .orderBy(F.col("reach2").desc(), F.col("node").asc())
        .limit(_REACH_TOP)
    )
