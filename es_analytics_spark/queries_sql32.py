"""Round-5 batch-32 surface: CAGR per event type, a Gumbel
extreme-value fit with return levels, Bartlett's variance-homogeneity
test, and recommendation rank stability across scoring functions.

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
# Weekly compound growth rate per event type
# ---------------------------------------------------------------------------

_CAGR_SQL = f"""
    WITH weekly AS MATERIALIZED (
        SELECT event_type,
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                    AS BIGINT) AS wk,
               {dsum_expr('value')} AS rev
        FROM events GROUP BY 1, 2
    ), span AS MATERIALIZED (
        SELECT event_type, CAST(MIN(wk) AS BIGINT) AS w0,
               CAST(MAX(wk) AS BIGINT) AS w1
        FROM weekly GROUP BY 1
    )
    SELECT s.event_type,
           CAST(s.w1 - s.w0 AS BIGINT) AS n_periods,
           a.rev AS first_week_rev, b.rev AS last_week_rev,
           FLOOR((EXP(LN(b.rev / a.rev) / (s.w1 - s.w0)) - 1.0)
                 * 1e6 + 0.5) / 1e6 AS weekly_cagr
    FROM span s
    JOIN weekly a ON a.event_type = s.event_type AND a.wk = s.w0
    JOIN weekly b ON b.event_type = s.event_type AND b.wk = s.w1
    WHERE s.w1 > s.w0
"""


@query("agg_cagr_by_type", oracle=_CAGR_SQL)
def agg_cagr_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly compound growth rate per event type: (last-week /
    first-week revenue)^(1/periods) - 1, spelled EXP(LN(ratio)/n) so
    both engines run the identical LN/EXP tree (fractional POWER is
    NOT cross-engine safe; this spelling is the catalog's standard
    escape) — the growth headline next to ts_week_over_week's
    step-by-step deltas: CAGR is the one number an exec narrative
    quotes.

    Exactness: weekly revenues are decimal-contract sums; the ratio,
    LN, division, and EXP are one fixed tree on identical scale-4
    doubles, quantized at 1e-6.

    Scale: one shuffle to the (type, week) grain; first/last lookups
    are tiny keyed joins."""
    e = _t(spark, sf_dir, "events")["events"]
    epoch_day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    weekly = (
        e.groupBy(
            "event_type",
            F.floor(epoch_day / 7).cast("bigint").alias("wk"),
        )
        .agg(dsum("value").alias("rev"))
        .transform(cut_lineage)
    )
    span = weekly.groupBy("event_type").agg(
        F.min("wk").cast("bigint").alias("w0"),
        F.max("wk").cast("bigint").alias("w1"),
    )
    a = weekly.select(
        F.col("event_type").alias("et_a"),
        F.col("wk").alias("wk_a"),
        F.col("rev").alias("first_week_rev"),
    )
    b = weekly.select(
        F.col("event_type").alias("et_b"),
        F.col("wk").alias("wk_b"),
        F.col("rev").alias("last_week_rev"),
    )
    j = (
        span.filter(F.col("w1") > F.col("w0"))
        .join(
            F.broadcast(a),
            (F.col("et_a") == F.col("event_type")) & (F.col("wk_a") == F.col("w0")),
        )
        .join(
            F.broadcast(b),
            (F.col("et_b") == F.col("event_type")) & (F.col("wk_b") == F.col("w1")),
        )
    )
    n = (F.col("w1") - F.col("w0")).cast("bigint")
    return j.select(
        "event_type",
        n.alias("n_periods"),
        "first_week_rev",
        "last_week_rev",
        _q6(
            F.exp(
                F.log(F.col("last_week_rev") / F.col("first_week_rev"))
                / (F.col("w1") - F.col("w0"))
            )
            - F.lit(1.0)
        ).alias("weekly_cagr"),
    )


# ---------------------------------------------------------------------------
# Gumbel extreme-value fit on daily maxima + return levels
# ---------------------------------------------------------------------------

# Method-of-moments Gumbel fit: beta = sqrt(6)*sd/pi, mu = mean -
# gamma*beta (Euler-Mascheroni). Constants as plain <=16-digit decimal
# literals (exact-int / power-of-10 conversion — safe on both engines).
_GUMBEL_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               MAX(value) AS mx
        FROM events GROUP BY 1
    ), mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('mx')} AS s1, {dsum_expr('mx * mx')} AS s2
        FROM daily
    ), fit AS (
        SELECT n,
               s1 / n AS mean_mx,
               SQRT((s2 - s1 * s1 / n) / (n - 1)) AS sd_mx,
               2.449489742783178 * SQRT((s2 - s1 * s1 / n) / (n - 1))
                   / 3.141592653589793 AS beta
        FROM mom
    )
    SELECT n AS n_days,
           FLOOR(mean_mx * 1e6 + 0.5) / 1e6 AS mean_daily_max,
           FLOOR((mean_mx - 0.5772156649015329 * beta) * 1e6 + 0.5) / 1e6
               AS gumbel_mu,
           FLOOR(beta * 1e6 + 0.5) / 1e6 AS gumbel_beta,
           FLOOR((mean_mx - 0.5772156649015329 * beta
                  - beta * LN(-LN(1.0 - 1.0 / 30.0))) * 1e6 + 0.5) / 1e6
               AS return_level_30d,
           FLOOR((mean_mx - 0.5772156649015329 * beta
                  - beta * LN(-LN(1.0 - 1.0 / 365.0))) * 1e6 + 0.5) / 1e6
               AS return_level_365d
    FROM fit
"""


@query("stat_gumbel_maxima", oracle=_GUMBEL_SQL)
def stat_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel extreme-value fit on the daily maxima of event value
    (method of moments: beta = sqrt(6) sd / pi, mu = mean - gamma*beta)
    with the 30-day and 1-year return levels — the block-maxima
    extreme-value analysis behind capacity planning and SLO sizing:
    stat_tail_cvar summarizes the observed tail; EVT extrapolates to
    the once-a-year spike you have NOT observed yet, which is the
    number an on-call budget needs.

    Exactness: daily maxima are exact column values; moments are
    decimal-contract sums; the fit and return levels are fixed IEEE
    trees (literal sqrt(6)/pi/gamma constants, LN on identical
    rationals), quantized at 1e-6.

    Scale: one shuffle to the daily grain, a 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.max("value").alias("mx"))
        .transform(cut_lineage)
    )
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("mx").alias("s1"),
        dsum(F.col("mx") * F.col("mx")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    sd = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    )
    beta = F.lit(2.449489742783178) * sd / F.lit(3.141592653589793)
    mu = mean - F.lit(0.5772156649015329) * beta
    rl = lambda T: mu - beta * F.log(-F.log(F.lit(1.0) - F.lit(1.0) / F.lit(float(T))))  # noqa: E731
    return mom.select(
        F.col("n").alias("n_days"),
        _q6(mean).alias("mean_daily_max"),
        _q6(mu).alias("gumbel_mu"),
        _q6(beta).alias("gumbel_beta"),
        _q6(rl(30)).alias("return_level_30d"),
        _q6(rl(365)).alias("return_level_365d"),
    )


# ---------------------------------------------------------------------------
# Bartlett's test for variance homogeneity across event types
# ---------------------------------------------------------------------------

_BARTLETT_SQL = f"""
    WITH g AS MATERIALIZED (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('value')} AS s1, {dsum_expr('value * value')} AS s2
        FROM events GROUP BY 1
    ), v AS MATERIALIZED (
        SELECT event_type, n,
               (s2 - s1 * s1 / n) / (n - 1) AS var_i
        FROM g
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS nn,
               {dsum_expr('(n - 1) * var_i')} AS pooled_num,
               {dsum_expr('(n - 1) * LN(var_i)')} AS sum_ln,
               {dsum_expr('1.0 / (n - 1)')} AS sum_inv
        FROM v
    )
    SELECT k AS n_groups, nn AS n_total,
           FLOOR(pooled_num / (nn - k) * 1e6 + 0.5) / 1e6 AS pooled_var,
           FLOOR(((nn - k) * LN(pooled_num / (nn - k)) - sum_ln)
                 / (1.0 + (sum_inv - 1.0 / (nn - k)) / (3.0 * (k - 1)))
                 * 1e6 + 0.5) / 1e6 AS bartlett_chi2
    FROM agg
"""


@query("stat_bartlett", oracle=_BARTLETT_SQL)
def stat_bartlett(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartlett's chi-square test for equal variances across event
    types — the normal-theory, high-power companion to stat_levene_bf
    (Levene is the robust screen; when it and Bartlett disagree, the
    data is heavy-tailed, itself a finding). The chi-square has k-1
    degrees of freedom.

    Exactness: group moments are decimal-contract sums; per-group
    variances are fixed trees; the (n-1)ln(var) and 1/(n-1) terms are
    identical-rational LN/division trees decimal-summed over the
    |types| support; the statistic is one quantized tree.

    Scale: one map-side-combinable aggregate -> |types|-row frame ->
    1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    v = g.select(
        "event_type",
        "n",
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var_i"),
    ).transform(cut_lineage)
    agg = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("nn"),
        dsum((F.col("n") - 1) * F.col("var_i")).alias("pooled_num"),
        dsum((F.col("n") - 1) * F.log("var_i")).alias("sum_ln"),
        dsum(F.lit(1.0) / (F.col("n") - 1)).alias("sum_inv"),
    )
    pooled = F.col("pooled_num") / (F.col("nn") - F.col("k"))
    chi2 = (
        (F.col("nn") - F.col("k")) * F.log(pooled) - F.col("sum_ln")
    ) / (
        F.lit(1.0)
        + (F.col("sum_inv") - F.lit(1.0) / (F.col("nn") - F.col("k")))
        / (F.lit(3.0) * (F.col("k") - 1))
    )
    return agg.select(
        F.col("k").alias("n_groups"),
        F.col("nn").alias("n_total"),
        _q6(pooled).alias("pooled_var"),
        _q6(chi2).alias("bartlett_chi2"),
    )


# ---------------------------------------------------------------------------
# Recommendation rank stability: support-ranked vs lift-ranked top-k
# ---------------------------------------------------------------------------

_RS_TOPK = 3

_RS_SQL = f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pop AS MATERIALIZED (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS np FROM op GROUP BY p
    ), pairs AS MATERIALIZED (
        SELECT a.p AS anchor, b.p AS reco, CAST(COUNT(*) AS BIGINT) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
        GROUP BY 1, 2
    ), scored AS MATERIALIZED (
        SELECT pr.anchor, pr.reco, pr.support,
               FLOOR(CAST(pr.support AS DOUBLE) / (pa.np * 1.0 * pb.np)
                     * 1e9 + 0.5) / 1e9 AS lift_score
        FROM pairs pr
        JOIN pop pa ON pa.p = pr.anchor
        JOIN pop pb ON pb.p = pr.reco
    ), top_sup AS MATERIALIZED (
        SELECT anchor, reco FROM (
            SELECT anchor, reco,
                   ROW_NUMBER() OVER (PARTITION BY anchor
                                      ORDER BY support DESC, reco ASC) AS rn
            FROM scored) WHERE rn <= {_RS_TOPK}
    ), top_lift AS MATERIALIZED (
        SELECT anchor, reco FROM (
            SELECT anchor, reco,
                   ROW_NUMBER() OVER (PARTITION BY anchor
                                      ORDER BY lift_score DESC, reco ASC) AS rn
            FROM scored) WHERE rn <= {_RS_TOPK}
    ), per_anchor AS MATERIALIZED (
        SELECT s.anchor, CAST(COUNT(l.reco) AS BIGINT) AS n_common
        FROM top_sup s
        LEFT JOIN top_lift l ON l.anchor = s.anchor AND l.reco = s.reco
        GROUP BY s.anchor
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
           FLOOR({dsum_expr(f'n_common * 1.0 / {_RS_TOPK}')} / COUNT(*)
                 * 1e6 + 0.5) / 1e6 AS mean_overlap,
           CAST(COUNT(*) FILTER (WHERE n_common = {_RS_TOPK}) AS BIGINT)
               AS n_identical_lists,
           CAST(COUNT(*) FILTER (WHERE n_common = 0) AS BIGINT)
               AS n_disjoint_lists
    FROM per_anchor
"""


@query("rec_rank_stability", oracle=_RS_SQL)
def rec_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank stability of the co-occurrence recommender under a scoring
    change: per-anchor top-{_RS_TOPK} overlap between support-ranked
    and lift-ranked lists (lift = support / (pop_a * pop_b)), with the
    mean overlap and the identical/disjoint list counts — the blast-
    radius estimate every ranking change ships with ("how many users'
    recs actually change"), the deploy-time twin of sim_rrf_fusion's
    merge question.

    Exactness: supports/popularities are exact integers; the lift
    score is one quantized (1e-9) exact-rational division so both
    engines rank identical values with the reco id breaking ties;
    overlaps are exact counts, the mean a decimal sum.

    Scale: the bounded within-basket pair join once, two per-anchor
    rank windows over the same frame, an anchor-grain reduction."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .transform(cut_lineage)
    )
    pop = op.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("anchor"), F.col("b.p").alias("reco"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    scored = (
        pairs.join(
            F.broadcast(pop.select(F.col("p").alias("anchor"), F.col("np").alias("na"))),
            "anchor",
        )
        .join(
            F.broadcast(pop.select(F.col("p").alias("reco"), F.col("np").alias("nb"))),
            "reco",
        )
        .select(
            "anchor",
            "reco",
            "support",
            (
                F.floor(
                    F.col("support").cast("double")
                    / (F.col("na") * F.lit(1.0) * F.col("nb"))
                    * 1e9
                    + F.lit(0.5)
                )
                / 1e9
            ).alias("lift_score"),
        )
        .transform(cut_lineage)
    )
    ws = W.partitionBy("anchor").orderBy(F.desc("support"), F.asc("reco"))
    wl = W.partitionBy("anchor").orderBy(F.desc("lift_score"), F.asc("reco"))
    top_sup = (
        scored.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= _RS_TOPK)
        .select("anchor", "reco")
    )
    top_lift = (
        scored.withColumn("rn", F.row_number().over(wl))
        .filter(F.col("rn") <= _RS_TOPK)
        .select("anchor", "reco")
    )
    per_anchor = (
        top_sup.join(
            top_lift.withColumn("hit", F.lit(1)), ["anchor", "reco"], "left"
        )
        .groupBy("anchor")
        .agg(F.count("hit").cast("bigint").alias("n_common"))
    )
    return per_anchor.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
        _q6(
            dsum(F.col("n_common") * F.lit(1.0) / _RS_TOPK) / F.count(F.lit(1))
        ).alias("mean_overlap"),
        F.count_if(F.col("n_common") == _RS_TOPK)
        .cast("bigint")
        .alias("n_identical_lists"),
        F.count_if(F.col("n_common") == 0).cast("bigint").alias(
            "n_disjoint_lists"
        ),
    )
