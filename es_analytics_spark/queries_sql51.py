"""Round-7 batch-51 surface: tie-adjusted two-sample Anderson-Darling,
Apriori 3-itemsets, and lognormal distribution fitting.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.fanout import fan_out
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Two-sample Anderson-Darling (Scholz-Stephens, tie-adjusted)
# ---------------------------------------------------------------------------

# With doubled cumulatives everything below stays integral:
#   t  = l_j        (multiplicity of pooled distinct value j)
#   B2 = 2*B_j - t  (doubled midpoint pooled cumulative)
#   M2 = 2*M_1j - t1 (doubled midpoint sample-1 cumulative)
# and the tie-adjusted statistic (Scholz & Stephens 1987, eq. 7) is
#   A2 = (N-1)/N * sum_j (t/N) * [ (1/n0)*(N*M2_0 - n0*B2)^2
#                                + (1/n1)*(N*M2_1 - n1*B2)^2 ]
#                               / (B2*(2N - B2) - N*t)
# where the denominator is the doubled form of 4*[Ba*(N-Ba) - N*t/4].

_AD_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS side,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), g AS (
        SELECT rev,
               SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
        FROM pu GROUP BY rev
    ), cum AS (
        SELECT c0, c1,
               SUM(c0) OVER (ORDER BY rev) - c0 AS k0,
               SUM(c1) OVER (ORDER BY rev) - c1 AS k1
        FROM g
    ), tots AS (
        SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM g
    ), terms AS (
        SELECT t.n0, t.n1, t.n0 + t.n1 AS nn,
               (c.c0 + c.c1) AS l,
               (2 * (c.k0 + c.k1) + (c.c0 + c.c1)) AS b2,
               (2 * c.k0 + c.c0) AS m20,
               (2 * c.k1 + c.c1) AS m21
        FROM cum c CROSS JOIN tots t
    ), scored AS (
        SELECT nn, n0, n1,
               CASE WHEN b2 * (2 * nn - b2) - nn * l = 0 THEN 0.0
                    ELSE (CAST(l AS DOUBLE) / nn)
                         * ((CAST(nn * m20 - n0 * b2 AS DOUBLE)
                             * (nn * m20 - n0 * b2)) / n0
                          + (CAST(nn * m21 - n1 * b2 AS DOUBLE)
                             * (nn * m21 - n1 * b2)) / n1)
                         / (CAST(b2 AS DOUBLE) * (2 * nn - b2) - CAST(nn AS DOUBLE) * l)
               END AS term
        FROM terms
    ), agg AS (
        SELECT MAX(nn) AS nn, MAX(n0) AS n0, MAX(n1) AS n1,
               {dsum_expr('term')} AS s
        FROM scored
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           FLOOR((nn - 1.0) / nn * s * 1e6 + 0.5) / 1e6 AS a2_stat,
           (nn - 1.0) / nn * s > 2.492 AS significant
    FROM agg
"""


@query("stat_anderson_darling", oracle=_AD_SQL)
def stat_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson-Darling (Scholz-Stephens k=2, tie-adjusted)
    on per-user purchase revenue between the two variants: the
    distribution-equality test that up-weights the TAILS where KS
    (stat_ks_test) is least sensitive — exactly where heavy-tailed
    revenue experiments hide their effects (a whale-only treatment
    shift moves AD long before it moves KS's central sup-gap).
    Verdict vs the asymptotic 5% critical value 2.492 (k=2, Scholz-
    Stephens Table 1, m=1).

    Exactness: with doubled midpoint cumulatives every numerator
    factor is BIGINT (the stat_mann_whitney doubling trick extended to
    AD's quadratic form); each distinct value's term is one fixed IEEE
    tree over exact integers (degenerate denominators contribute 0 by
    the tie convention), terms sum through the decimal contract, and
    the statistic quantizes at 1e6.

    Scale: identical shape to stat_mann_whitney — value-grain
    aggregate, window-free range-partition + triangle-offset
    cumulatives, then a reduction."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("rev")
        )
        .select((F.col("user_id") % 2).cast("int").alias("side"), "rev")
    )
    g = pu.groupBy("rev").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c1"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        g.repartitionByRange(n_parts, F.asc("rev"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    wv = W.partitionBy("pid").orderBy(F.asc("rev")).rowsBetween(
        W.unboundedPreceding, 0
    )
    local = ranged.select(
        "pid",
        "c0",
        "c1",
        (F.sum("c0").over(wv) - F.col("c0")).alias("l0"),
        (F.sum("c1").over(wv) - F.col("c1")).alias("l1"),
    )
    cum = local
    for i in range(2):
        offs = cumulative_offsets(
            ranged.groupBy("pid").agg(F.sum(f"c{i}").alias("ct")), cnt="ct"
        ).withColumnRenamed("off", f"off{i}")
        cum = cum.join(F.broadcast(offs), "pid")
    tots = g.agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"))
    k0, k1 = F.col("l0") + F.col("off0"), F.col("l1") + F.col("off1")
    terms = cum.crossJoin(F.broadcast(tots)).select(
        "n0",
        "n1",
        (F.col("n0") + F.col("n1")).alias("nn"),
        (F.col("c0") + F.col("c1")).alias("l"),
        (2 * (k0 + k1) + F.col("c0") + F.col("c1")).alias("b2"),
        (2 * k0 + F.col("c0")).alias("m20"),
        (2 * k1 + F.col("c1")).alias("m21"),
    )
    nn, l, b2 = F.col("nn"), F.col("l"), F.col("b2")
    denom = b2 * (2 * nn - b2) - nn * l
    num = (
        ((nn * F.col("m20") - F.col("n0") * b2).cast("double"))
        * (nn * F.col("m20") - F.col("n0") * b2)
        / F.col("n0")
        + ((nn * F.col("m21") - F.col("n1") * b2).cast("double"))
        * (nn * F.col("m21") - F.col("n1") * b2)
        / F.col("n1")
    )
    term = F.when(denom == 0, F.lit(0.0)).otherwise(
        (l.cast("double") / nn) * num / denom.cast("double")
    )
    agg = terms.select(
        "nn", "n0", "n1", term.alias("term")
    ).agg(
        F.max("nn").alias("nn"),
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
        dsum("term").alias("s"),
    )
    a2 = (F.col("nn") - 1.0) / F.col("nn") * F.col("s")
    return agg.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        _q6(a2).alias("a2_stat"),
        (a2 > 2.492).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Apriori 3-itemsets (frequent triples bought together)
# ---------------------------------------------------------------------------

_TRIPLE_MIN_SUPPORT = 2
_TRIPLE_TOP = 20

_TRIPLE_SQL = f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n_orders AS (
        SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM op
    ), triple AS (
        SELECT a.p AS p1, b.p AS p2, c.p AS p3, COUNT(*) AS support
        FROM op a
        JOIN op b ON a.o = b.o AND a.p < b.p
        JOIN op c ON b.o = c.o AND b.p < c.p
        GROUP BY a.p, b.p, c.p
        HAVING COUNT(*) >= {_TRIPLE_MIN_SUPPORT}
    )
    SELECT p1, p2, p3, support,
           FLOOR(CAST(support AS DOUBLE) / n.n * 1e6 + 0.5) / 1e6
               AS support_share
    FROM triple CROSS JOIN n_orders n
    ORDER BY support DESC, p1 ASC, p2 ASC, p3 ASC
    LIMIT {_TRIPLE_TOP}
"""


@query("rec_itemset_triples", oracle=_TRIPLE_SQL)
def rec_itemset_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets: the top-{_TRIPLE_TOP} part TRIPLES bought
    together in one order (support >= {_TRIPLE_MIN_SUPPORT}) — the
    Apriori level above rec_item_cooccurrence's pairs, which is where
    bundle design actually happens (a pair tells you to co-merchandise
    two items; the triple is the bundle with a margin structure).

    Exactness: supports are exact integers; the share is one quantized
    division; the ranking is total-ordered on (support, p1, p2, p3).

    Scale: the within-basket triple enumeration is C(s, 3) per basket
    — bounded by order line-count caps exactly as the pair join's
    C(s, 2) argument (a 7-line order emits 35 triples); the ordered
    p1 < p2 < p3 orientation counts each triple once, and the top-k is
    TakeOrdered."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    # ONE order-keyed exchange feeds the whole query (guide §2.4): the
    # fan-out repartition lands BEFORE the dedup, so the (o, p)
    # distinct, the basket-count aggregate and all three self-join
    # sides reuse that single partitioning (hash partitioning on o
    # satisfies every key set containing o) — replacing the former
    # dedup exchange + eager checkpoint barrier + separate fan-out
    # exchange. Interleaved A/B: 1.41 -> 1.20 s median; rows identical
    # at sf0.1 and sf0.01. (The same reorder was tried on
    # rec_association_rules_l3 and LOST — its pair/triple eager cuts
    # are separate actions, so each re-derived the fan-out instead of
    # reusing it — and was flat on rec_item_cooccurrence, whose
    # uncut op already shared its dedup exchange via ReusedExchange.)
    raw = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
    op = fan_out(raw, sf_dir, "lineitem", "o", weight=8).distinct()
    n_orders = op.select("o").distinct().agg(F.count("*").cast("bigint").alias("n"))
    a, b, c = op.alias("a"), op.alias("b"), op.alias("c")
    triple = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .join(c.hint("shuffle_hash"), (F.col("b.o") == F.col("c.o")) & (F.col("b.p") < F.col("c.p")))
        .groupBy(
            F.col("a.p").alias("p1"),
            F.col("b.p").alias("p2"),
            F.col("c.p").alias("p3"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _TRIPLE_MIN_SUPPORT)
    )
    return (
        triple.crossJoin(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "p3",
            "support",
            _q6(F.col("support").cast("double") / F.col("n")).alias("support_share"),
        )
        .orderBy(
            F.col("support").desc(),
            F.col("p1").asc(),
            F.col("p2").asc(),
            F.col("p3").asc(),
        )
        .limit(_TRIPLE_TOP)
    )


# ---------------------------------------------------------------------------
# Lognormal fit of positive per-user revenue
# ---------------------------------------------------------------------------

_LN_SQL = f"""
    WITH pu AS (
        SELECT user_id,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), lx AS MATERIALIZED (
        SELECT FLOOR(LN(rev) * 1e6 + 0.5) / 1e6 AS lx
        FROM pu WHERE rev > 0
    ), m1 AS MATERIALIZED (
        SELECT COUNT(*) AS n, {dsum_expr('lx')} / COUNT(lx) AS mu
        FROM lx
    ), m2 AS (
        SELECT MAX(m.n) AS n, MAX(m.mu) AS mu,
               CAST(ROUND(SUM(CAST((l.lx - m.mu) * (l.lx - m.mu)
                                   AS DECIMAL(38,6))), 4) AS DOUBLE)
                   / (MAX(m.n) - 1) AS var
        FROM lx l CROSS JOIN m1 m GROUP BY 'x'
    )
    SELECT CAST(n AS BIGINT) AS n_positive,
           FLOOR(mu * 1e6 + 0.5) / 1e6 AS mu_log,
           FLOOR(SQRT(var) * 1e6 + 0.5) / 1e6 AS sigma_log,
           FLOOR(EXP(FLOOR(mu * 1e6 + 0.5) / 1e6) * 1e4 + 0.5) / 1e4
               AS implied_median,
           FLOOR(EXP(FLOOR((mu + var / 2.0) * 1e6 + 0.5) / 1e6) * 1e4 + 0.5)
               / 1e4 AS implied_mean
    FROM m2
"""


@query("stat_lognormal_fit", oracle=_LN_SQL)
def stat_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit of positive per-user purchase revenue: MLE
    (mu, sigma) of ln(revenue) with the implied median e^mu and mean
    e^(mu + sigma^2/2) — the parametric model heavy-tailed spend
    actually follows, and the gap between implied mean and median IS
    the whale premium (agg_revenue_concentration measures it
    nonparametrically; the fit lets you extrapolate tail quantiles and
    simulate). Zero-revenue users are excluded (the lognormal is a
    positive-support model; the zero mass is the conversion rate,
    reported by funnel entries).

    Exactness: each ln goes through the quantize-at-6 contract BEFORE
    any aggregation, so the log values are identical doubles in both
    engines; the mean uses the decimal contract and the variance the
    DECIMAL(38,6) deviation recipe; EXP applies to already-quantized
    arguments.

    Scale: user-grain aggregate, a 1-row moment reduction, one more
    user-grain deviation pass — the agg_higher_moments shape."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("rev")
    )
    lx = (
        pu.filter(F.col("rev") > 0)
        .select((F.floor(F.log("rev") * 1e6 + F.lit(0.5)) / 1e6).alias("lx"))
        .transform(cut_lineage)
    )
    m1 = lx.agg(F.count("*").alias("n"), (dsum("lx") / F.count("lx")).alias("mu"))
    from pyspark.sql.types import DecimalType

    m2 = (
        lx.crossJoin(F.broadcast(m1))
        .agg(
            F.max("n").alias("n"),
            F.max("mu").alias("mu"),
            (
                F.round(
                    F.sum(
                        ((F.col("lx") - F.col("mu")) * (F.col("lx") - F.col("mu"))).cast(
                            DecimalType(38, 6)
                        )
                    ),
                    4,
                ).cast("double")
                / (F.max("n") - 1)
            ).alias("var"),
        )
    )
    mu_q = _q6(F.col("mu"))
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return m2.select(
        F.col("n").cast("bigint").alias("n_positive"),
        mu_q.alias("mu_log"),
        _q6(F.sqrt(F.col("var"))).alias("sigma_log"),
        q4(F.exp(mu_q)).alias("implied_median"),
        q4(F.exp(_q6(F.col("mu") + F.col("var") / 2.0))).alias("implied_mean"),
    )
