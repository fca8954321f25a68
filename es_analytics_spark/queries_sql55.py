"""Round-7 batch-55 surface: Nemenyi-style pairwise follow-up to the
Friedman test, level-3 association rules, and Ripley's K spatial
clustering curve.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum_expr, dsum
from es_analytics_spark.functions.fanout import broadcast_if_small
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql16 import _P2_EXPR, _PDF_EXPR, _T_EXPR


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Pairwise post-hoc after Friedman (Nemenyi-style z with Bonferroni)
# ---------------------------------------------------------------------------

_FN_PAIRS = 10  # C(5, 2) event-type pairs — the Bonferroni family size

_FN_SQL = f"""
    WITH d AS MATERIALIZED (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1, 2
    ), ranked AS MATERIALIZED (
        SELECT event_type, day,
               CAST(ROW_NUMBER() OVER (PARTITION BY day
                                       ORDER BY y ASC, event_type ASC)
                    AS BIGINT) AS r
        FROM d
    ), sums AS MATERIALIZED (
        SELECT event_type, CAST(SUM(r) AS BIGINT) AS rsum,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM ranked GROUP BY event_type
    ), dims AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(nb) AS BIGINT) AS n
        FROM sums
    ), zs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               FLOOR(CAST(a.rsum AS DOUBLE) / dm.n * 1e4 + 0.5) / 1e4
                   AS mean_rank_a,
               FLOOR(CAST(b.rsum AS DOUBLE) / dm.n * 1e4 + 0.5) / 1e4
                   AS mean_rank_b,
               FLOOR((CAST(a.rsum AS DOUBLE) / dm.n
                      - CAST(b.rsum AS DOUBLE) / dm.n)
                     / SQRT(CAST(dm.k AS DOUBLE) * (dm.k + 1) / (6.0 * dm.n))
                     * 1e6 + 0.5) / 1e6 AS z
        FROM sums a JOIN sums b ON a.event_type < b.event_type
        CROSS JOIN dims dm
    ), tstage AS (
        SELECT type_a, type_b, mean_rank_a, mean_rank_b, z,
               {_T_EXPR} AS t, {_PDF_EXPR} AS pdf
        FROM zs
    )
    SELECT type_a, type_b, mean_rank_a, mean_rank_b, z,
           LEAST(FLOOR({_FN_PAIRS}.0 * ({_P2_EXPR}) * 1e6 + 0.5) / 1e6, 1.0)
               AS p_bonferroni,
           LEAST(FLOOR({_FN_PAIRS}.0 * ({_P2_EXPR}) * 1e6 + 0.5) / 1e6, 1.0)
               < 0.05 AS significant
    FROM tstage
    ORDER BY type_a, type_b
"""


@query("stat_friedman_nemenyi", oracle=_FN_SQL)
def stat_friedman_nemenyi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise follow-up to stat_friedman_test: for every event-type
    pair, the standardized mean-rank difference over the shared daily
    blocks, z = (Rbar_i - Rbar_j) / sqrt(k(k+1)/(6n)), with
    Bonferroni-adjusted two-sided p over the {_FN_PAIRS}-pair family —
    the Nemenyi-style answer to WHICH types consistently out-rank
    which once the Friedman omnibus fires (the repeated-measures
    sibling of stat_dunn_posthoc, which follows Kruskal-Wallis on
    independent groups).

    Exactness: within-block ranks are exact integers (the Friedman
    frame verbatim); each pair's z is one fixed IEEE tree over exact
    rank sums, quantized at 1e6; p uses the pinned Abramowitz-Stegun
    26.2.17 CDF fragment shared verbatim with the oracle.

    Scale: the (type, day) grain and per-day |types|-row ranking
    windows are the Friedman shape; the pair expansion is a
    |types|^2/2-row self-join of the |types|-row sums frame."""
    e = _t(spark, sf_dir, "events")["events"]
    d = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    wr = W.partitionBy("day").orderBy(F.asc("y"), F.asc("event_type"))
    ranked = d.select(
        "event_type", "day", F.row_number().over(wr).cast("bigint").alias("r")
    )
    sums = (
        ranked.groupBy("event_type")
        .agg(
            F.sum("r").cast("bigint").alias("rsum"),
            F.count(F.lit(1)).cast("bigint").alias("nb"),
        )
        .transform(cut_lineage)
    )
    dims = sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("nb").cast("bigint").alias("n"),
    )
    a = sums.select(F.col("event_type").alias("type_a"), F.col("rsum").alias("ra"))
    b = sums.select(F.col("event_type").alias("type_b"), F.col("rsum").alias("rb"))
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    nn = F.col("n").cast("double")
    sig = F.sqrt(F.col("k").cast("double") * (F.col("k") + 1) / (6.0 * nn))
    zs = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .crossJoin(F.broadcast(dims))
        .select(
            "type_a",
            "type_b",
            q4(F.col("ra").cast("double") / nn).alias("mean_rank_a"),
            q4(F.col("rb").cast("double") / nn).alias("mean_rank_b"),
            _q6(
                (F.col("ra").cast("double") / nn - F.col("rb").cast("double") / nn)
                / sig
            ).alias("z"),
        )
    )
    tstage = zs.withColumn("t", F.expr(_T_EXPR)).withColumn("pdf", F.expr(_PDF_EXPR))
    p_adj = F.least(
        F.floor(float(_FN_PAIRS) * F.expr(_P2_EXPR) * 1e6 + F.lit(0.5)) / 1e6,
        F.lit(1.0),
    )
    return tstage.select(
        "type_a",
        "type_b",
        "mean_rank_a",
        "mean_rank_b",
        "z",
        p_adj.alias("p_bonferroni"),
        (p_adj < 0.05).alias("significant"),
    ).orderBy("type_a", "type_b")


# ---------------------------------------------------------------------------
# Level-3 association rules (A, B -> C) with confidence and lift
# ---------------------------------------------------------------------------

_R3_MIN_SUPPORT = 2
_R3_TOP = 20

_R3_SQL = f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n_orders AS (
        SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM op
    ), item AS MATERIALIZED (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS n_p FROM op GROUP BY p
    ), pair AS MATERIALIZED (
        SELECT a.p AS p1, b.p AS p2, CAST(COUNT(*) AS BIGINT) AS sup2
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    ), triple AS MATERIALIZED (
        SELECT a.p AS p1, b.p AS p2, c.p AS p3, CAST(COUNT(*) AS BIGINT) AS sup3
        FROM op a
        JOIN op b ON a.o = b.o AND a.p < b.p
        JOIN op c ON b.o = c.o AND b.p < c.p
        GROUP BY a.p, b.p, c.p
        HAVING COUNT(*) >= {_R3_MIN_SUPPORT}
    ), rules AS (
        SELECT p1 AS ant1, p2 AS ant2, p3 AS cons, sup3 FROM triple
        UNION ALL
        SELECT p1, p3, p2, sup3 FROM triple
        UNION ALL
        SELECT p2, p3, p1, sup3 FROM triple
    ), scored AS (
        SELECT r.ant1, r.ant2, r.cons, r.sup3, pr.sup2,
               FLOOR(CAST(r.sup3 AS DOUBLE) / pr.sup2 * 1e6 + 0.5) / 1e6
                   AS confidence,
               FLOOR(CAST(r.sup3 AS DOUBLE) / pr.sup2 * n.n / i.n_p * 1e6 + 0.5)
                   / 1e6 AS lift
        FROM rules r
        JOIN pair pr ON pr.p1 = r.ant1 AND pr.p2 = r.ant2
        JOIN item i ON i.p = r.cons
        CROSS JOIN n_orders n
    )
    SELECT ant1, ant2, cons, sup3 AS support, confidence, lift
    FROM scored
    ORDER BY confidence DESC, lift DESC, ant1 ASC, ant2 ASC, cons ASC
    LIMIT {_R3_TOP}
"""


@query("rec_association_rules_l3", oracle=_R3_SQL)
def rec_association_rules_l3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-3 association rules (A, B -> C): every frequent triple
    yields its three pair->item rules, scored by confidence
    sup(ABC)/sup(AB) and lift confidence/P(C) — the actionable form of
    rec_itemset_triples (a triple says "these sell together"; the rule
    says "given A and B are in the cart, recommend C", which is the
    shape a cart-page recommender consumes). Extends
    rec_association_rules' single-antecedent rules to the two-item
    antecedent Apriori level.

    Exactness: all supports are exact integers; confidence and lift
    are quantized divisions; the top-{_R3_TOP} is total-ordered on
    (confidence, lift, keys).

    Scale: the triple enumeration is the C(s, 3) basket-capped join;
    rules are 3x triples; pair supports join on the sorted antecedent
    (pair frame is basket-capped too), item supports broadcast;
    TakeOrdered top-k."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .transform(cut_lineage)
    )
    n_orders = op.select("o").distinct().agg(F.count("*").cast("bigint").alias("n"))
    item = op.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n_p"))
    # NO fan-out here: this was round 11's one never-won fan-out, and a
    # round-12 conf-toggled A/B on the shared-pw shape below still read
    # it 0.86x (the extra exchange costs more than the explosion
    # parallelism buys at this basket size) — reverted per the verdict,
    # keeping the shuffle_hash hints (the self-join sides' only
    # consumer is the equi-join; sort-merge paid two input sorts for
    # nothing)
    opf = op
    a, b, c = opf.alias("a"), opf.alias("b"), opf.alias("c")
    # ONE materialized pair-with-order frame feeds BOTH the pair-support
    # aggregate and the triple join. The former shape derived the a-b
    # self-join twice — once inside pair's eager cut and again inside
    # triple's (cross-job exchange reuse does not exist, so each cut
    # re-ran the fan-out + join; this query was the round-11 verdict's
    # one never-won fan-out). Materializing the C(s,2) explosion once
    # (basket-capped, same frame the oracle's `pair` CTE materializes)
    # makes the second derivation a checkpoint read.
    pw = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(
            F.col("a.o").alias("o"),
            F.col("a.p").alias("p1"),
            F.col("b.p").alias("p2"),
        )
        .transform(cut_lineage)
    )
    # single consumer — no cut: the final action reads the pw checkpoint
    pair = (
        pw.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup2"))
    )
    triple = (
        pw.alias("w")
        .join(
            c.hint("shuffle_hash"),
            (F.col("w.o") == F.col("c.o")) & (F.col("w.p2") < F.col("c.p")),
        )
        .groupBy("w.p1", "w.p2", F.col("c.p").alias("p3"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup3"))
        .filter(F.col("sup3") >= _R3_MIN_SUPPORT)
        .transform(cut_lineage)
    )
    rules = None
    for a1, a2, cc in (("p1", "p2", "p3"), ("p1", "p3", "p2"), ("p2", "p3", "p1")):
        r = triple.select(
            F.col(a1).alias("ant1"),
            F.col(a2).alias("ant2"),
            F.col(cc).alias("cons"),
            "sup3",
        )
        rules = r if rules is None else rules.unionAll(r)
    # rules is 3x the support-filtered triples — broadcast it when the
    # local layout proves the base table small, so the (bigger) pair
    # frame is not re-exchanged/sorted for the antecedent join
    scored = (
        broadcast_if_small(rules, sf_dir, "lineitem")
        .join(
            pair.select(
                F.col("p1").alias("ant1"), F.col("p2").alias("ant2"), "sup2"
            ),
            ["ant1", "ant2"],
        )
        .join(F.broadcast(item.select(F.col("p").alias("cons"), "n_p")), "cons")
        .crossJoin(F.broadcast(n_orders))
    )
    conf = F.col("sup3").cast("double") / F.col("sup2")
    lift = conf * F.col("n") / F.col("n_p")
    return (
        scored.select(
            "ant1",
            "ant2",
            "cons",
            F.col("sup3").alias("support"),
            _q6(conf).alias("confidence"),
            _q6(lift).alias("lift"),
        )
        .orderBy(
            F.col("confidence").desc(),
            F.col("lift").desc(),
            F.col("ant1").asc(),
            F.col("ant2").asc(),
            F.col("cons").asc(),
        )
        .limit(_R3_TOP)
    )


# ---------------------------------------------------------------------------
# Ripley's K clustering curve on the customer grid
# ---------------------------------------------------------------------------

_RK_CELL = 10_000  # bucket size = max radius, so 9 cells cover every pair
_RK_RADII = (2_000, 5_000, 10_000)
_RK_AREA = 100_000.0 * 100_000.0

_RK_SQL = f"""
    WITH pts AS MATERIALIZED (
        SELECT c_custkey AS id,
               CAST((c_custkey * 48271 + 11) % 100000 AS BIGINT) AS x,
               CAST((c_custkey * 69621 + 7) % 100000 AS BIGINT) AS y
        FROM customer
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
    cand AS (
        SELECT a.id AS ia, b.id AS ib,
               (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
        FROM pts a
        JOIN (SELECT UNNEST([-1, 0, 1]) AS dx) dx ON TRUE
        JOIN (SELECT UNNEST([-1, 0, 1]) AS dy) dy ON TRUE
        JOIN pts b
          ON b.x // {_RK_CELL} = a.x // {_RK_CELL} + dx.dx
         AND b.y // {_RK_CELL} = a.y // {_RK_CELL} + dy.dy
         AND b.id <> a.id
    ), counts AS (
        SELECT {', '.join(f'CAST(SUM(CASE WHEN d2 <= {r * r} THEN 1 ELSE 0 END) AS BIGINT) AS c{r}' for r in _RK_RADII)}
        FROM cand
    ), rows_ AS (
        {' UNION ALL '.join(f"SELECT {r} AS radius, c{r} AS n_pairs FROM counts" for r in _RK_RADII)}
    )
    SELECT r.radius, r.n_pairs,
           FLOOR({_RK_AREA!r} / (CAST(n.n AS DOUBLE) * (n.n - 1)) * r.n_pairs
                 * 1e4 + 0.5) / 1e4 AS k_hat,
           FLOOR((SQRT({_RK_AREA!r} / (CAST(n.n AS DOUBLE) * (n.n - 1))
                       * r.n_pairs / 3.141592653589793) - r.radius)
                 * 1e4 + 0.5) / 1e4 AS l_hat_minus_r
    FROM rows_ r CROSS JOIN n
    ORDER BY r.radius
"""


@query("geo_ripley_k", oracle=_RK_SQL)
def geo_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K clustering curve at three radii over the customer
    point field: K(r) = A/(n(n-1)) * #{ordered pairs within r}, with
    the variance-stabilized L(r) - r (positive = clustered at that
    SCALE, negative = dispersed) — the multi-scale completion of the
    geo tier: geo_moran_i scores cell-level clustering at one fixed
    grain, Ripley's K says at WHICH distances the clustering lives
    (the naive uncorrected estimator; edge effects bias K down near
    the border equally in both engines).

    Exactness: squared pair distances are exact BIGINT (integer
    coordinates); per-radius pair counts are conditional integer
    aggregates over one candidate pass; K and L quantize at 1e4.

    Scale: candidate pairs come from the 9-cell neighborhood join
    with the bucket sized to the max radius — work is bounded by
    points-per-cell (the geo_grid_nearest argument), never n^2; all
    three radii share the single candidate pass."""
    cst = _t(spark, sf_dir, "customer")["customer"]
    pts = cst.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") * 48271 + 11) % 100000).cast("bigint").alias("x"),
        ((F.col("c_custkey") * 69621 + 7) % 100000).cast("bigint").alias("y"),
    ).transform(cut_lineage)
    nrow = pts.agg(F.count("*").cast("bigint").alias("n"))
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx long, dy long"
    )
    a = pts.select(
        F.col("id").alias("ia"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.floor(F.col("x") / _RK_CELL).cast("bigint").alias("cx"),
        F.floor(F.col("y") / _RK_CELL).cast("bigint").alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("ib"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / _RK_CELL).cast("bigint").alias("bcx"),
        F.floor(F.col("y") / _RK_CELL).cast("bigint").alias("bcy"),
    )
    cand = (
        a.crossJoin(F.broadcast(offs))
        .join(
            b,
            (F.col("bcx") == F.col("cx") + F.col("dx"))
            & (F.col("bcy") == F.col("cy") + F.col("dy"))
            & (F.col("ib") != F.col("ia")),
        )
        .select(
            (
                (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            ).alias("d2")
        )
    )
    counts = cand.agg(
        *[
            F.sum(F.when(F.col("d2") <= r * r, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{r}")
            for r in _RK_RADII
        ]
    ).transform(cut_lineage)
    rows = None
    for r in _RK_RADII:
        row = counts.select(
            F.lit(r).cast("bigint").alias("radius"), F.col(f"c{r}").alias("n_pairs")
        )
        rows = row if rows is None else rows.unionAll(row)
    q4 = lambda col: F.floor(col * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    nn = F.col("n").cast("double")
    k_hat = _RK_AREA / (nn * (F.col("n") - 1)) * F.col("n_pairs")
    return (
        rows.crossJoin(F.broadcast(nrow))
        .select(
            "radius",
            "n_pairs",
            q4(k_hat).alias("k_hat"),
            q4(F.sqrt(k_hat / 3.141592653589793) - F.col("radius")).alias(
                "l_hat_minus_r"
            ),
        )
        .orderBy("radius")
    )
