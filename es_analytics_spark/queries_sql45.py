"""Round-7 batch-45 surface: k-sample rank testing (Kruskal-Wallis),
normality screening (Jarque-Bera), rank-based changepoint localization
(Pettitt), deterministic k-fold assignment audits, neighbor-Jaccard
link prediction, and Grubbs max-studentized outlier screens.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import davg_expr, dsum, dsum_expr
from es_analytics_spark.functions.fanout import broadcast_if_small, fan_out
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


_CHI2_CRIT_DF2 = 5.991464547107979  # chi-square 0.95 quantile at df=2


# ---------------------------------------------------------------------------
# Kruskal-Wallis H test (k-sample rank ANOVA, exact tie-corrected)
# ---------------------------------------------------------------------------

_KW_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 3 AS INT) AS grp,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), g AS (
        SELECT rev,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS c2
        FROM pu GROUP BY rev
    ), cum AS (
        SELECT c0, c1, c2,
               SUM(c0 + c1 + c2) OVER (ORDER BY rev) - (c0 + c1 + c2) AS kprev
        FROM g
    ), agg AS (
        SELECT SUM(c0) AS n0, SUM(c1) AS n1, SUM(c2) AS n2,
               SUM(c0 * (2 * kprev + c0 + c1 + c2 + 1)) AS r2_0,
               SUM(c1 * (2 * kprev + c0 + c1 + c2 + 1)) AS r2_1,
               SUM(c2 * (2 * kprev + c0 + c1 + c2 + 1)) AS r2_2,
               SUM((c0 + c1 + c2) * (c0 + c1 + c2) * (c0 + c1 + c2)
                   - (c0 + c1 + c2)) AS tie3
        FROM cum
    ), scored AS (
        SELECT n0, n1, n2, tie3, n0 + n1 + n2 AS n,
               FLOOR(CAST(r2_0 * r2_0 AS DOUBLE) / (4.0 * n0) * 1e4 + 0.5)
             + FLOOR(CAST(r2_1 * r2_1 AS DOUBLE) / (4.0 * n1) * 1e4 + 0.5)
             + FLOOR(CAST(r2_2 * r2_2 AS DOUBLE) / (4.0 * n2) * 1e4 + 0.5)
                   AS rsum_fp
        FROM agg
    )
    SELECT CAST(3 AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           FLOOR((12.0 * (CAST(rsum_fp AS DOUBLE) / 1e4)
                  / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1)) * 1e6 + 0.5)
               / 1e6 AS h,
           FLOOR((12.0 * (CAST(rsum_fp AS DOUBLE) / 1e4)
                  / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                 / (1.0 - CAST(tie3 AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n * n - n)) * 1e6 + 0.5) / 1e6
               AS h_corrected,
           (12.0 * (CAST(rsum_fp AS DOUBLE) / 1e4)
                  / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))
                 / (1.0 - CAST(tie3 AS DOUBLE)
                          / (CAST(n AS DOUBLE) * n * n - n))
                 > {_CHI2_CRIT_DF2} AS significant
    FROM scored
"""


@query("stat_kruskal_wallis", oracle=_KW_SQL)
def stat_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H: the k-sample rank ANOVA over per-user purchase
    revenue across three deterministic variants (user_id % 3) — the
    nonparametric "did ANY arm move the metric" omnibus that fronts
    pairwise Mann-Whitney follow-ups (stat_mann_whitney) exactly the
    way one-way ANOVA (stat_anova_oneway) fronts t-tests, but without
    the normality assumption heavy-tailed revenue always violates.
    Midranks for ties with the standard tie correction
    H / (1 - sum(t^3 - t)/(n^3 - n)); significance vs the chi-square
    df=2 0.95 critical value.

    Exactness: doubled rank sums per group are pure BIGINT arithmetic
    over the value-grain counts (2*R_g = sum c_g*(2*kprev + t + 1)
    keeps midranks integral), the tie term likewise; each group's
    R_g^2/n_g is one fixed IEEE tree over those integers quantized to
    1e4 fixed point BEFORE the 3-term sum (so the only float addition
    is over exact integers), and H is a final fixed tree, half-up
    quantized at 1e6.

    Scale: identical shape to stat_mann_whitney — value-grain
    aggregate, then the window-free range-partition + triangle-offset
    cumulative (per-partition windows only), then 1-row reductions."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("rev")
        )
        .select((F.col("user_id") % 3).cast("int").alias("grp"), "rev")
    )
    g = pu.groupBy("rev").agg(
        *[
            F.sum(F.when(F.col("grp") == i, 1).otherwise(0)).alias(f"c{i}")
            for i in range(3)
        ]
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        g.repartitionByRange(n_parts, F.asc("rev"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    t = F.col("c0") + F.col("c1") + F.col("c2")
    w = W.partitionBy("pid").orderBy(F.asc("rev")).rowsBetween(W.unboundedPreceding, 0)
    local = ranged.select(
        "pid", "c0", "c1", "c2", (F.sum(t).over(w) - t).alias("lprev")
    )
    offs = cumulative_offsets(ranged.groupBy("pid").agg(F.sum(t).alias("ct")), cnt="ct")
    m2 = 2 * (F.col("lprev") + F.col("off")) + t + 1
    cum = local.join(F.broadcast(offs), "pid")
    agg = cum.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c0") * m2).alias("r2_0"),
        F.sum(F.col("c1") * m2).alias("r2_1"),
        F.sum(F.col("c2") * m2).alias("r2_2"),
        F.sum(t * t * t - t).alias("tie3"),
    )
    n = F.col("n0") + F.col("n1") + F.col("n2")
    rsum_fp = sum(
        F.floor(
            (F.col(f"r2_{i}") * F.col(f"r2_{i}")).cast("double")
            / (4.0 * F.col(f"n{i}"))
            * 1e4
            + F.lit(0.5)
        )
        for i in range(3)
    )
    scored = agg.select(
        n.alias("n"), F.col("tie3"), rsum_fp.alias("rsum_fp")
    )
    h = (
        12.0
        * (F.col("rsum_fp").cast("double") / 1e4)
        / (F.col("n").cast("double") * (F.col("n") + 1))
        - 3.0 * (F.col("n") + 1)
    )
    corr = 1.0 - F.col("tie3").cast("double") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return scored.select(
        F.lit(3).cast("bigint").alias("k"),
        F.col("n").cast("bigint").alias("n"),
        _q6(h).alias("h"),
        _q6(h / corr).alias("h_corrected"),
        (h / corr > _CHI2_CRIT_DF2).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Jarque-Bera normality screen (from the exact central-moment sums)
# ---------------------------------------------------------------------------

_JB_SQL = f"""
    WITH stats AS MATERIALIZED (
        SELECT event_type, {davg_expr('value')} AS mu
        FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, (e.value - s.mu) AS d
        FROM events e JOIN stats s USING (event_type)
    ), moments AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(d * d AS DECIMAL(38,6))), 4) AS DOUBLE) AS m2,
               CAST(ROUND(SUM(CAST(d * d * d AS DECIMAL(38,6))), 4) AS DOUBLE) AS m3,
               CAST(ROUND(SUM(CAST(d * d * d * d AS DECIMAL(38,6))), 4) AS DOUBLE) AS m4
        FROM dev GROUP BY event_type
    ), sk AS (
        SELECT event_type, n,
               FLOOR(SQRT(CAST(n AS DOUBLE)) * m3 / POWER(m2, 1.5) * 1e6 + 0.5)
                   / 1e6 AS s,
               FLOOR((CAST(n AS DOUBLE) * m4 / (m2 * m2) - 3.0) * 1e6 + 0.5)
                   / 1e6 AS k
        FROM moments
    )
    SELECT event_type, CAST(n AS BIGINT) AS n, s AS skewness, k AS excess_kurtosis,
           FLOOR(n / 6.0 * (s * s + k * k / 4.0) * 1e6 + 0.5) / 1e6 AS jb_stat,
           n / 6.0 * (s * s + k * k / 4.0) > {_CHI2_CRIT_DF2} AS reject_normal
    FROM sk
    ORDER BY event_type
"""


@query("stat_jarque_bera", oracle=_JB_SQL)
def stat_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality screen per event type: the composite
    JB = n/6 (S^2 + K^2/4) over the skewness/excess-kurtosis pair,
    with the chi-square df=2 verdict — the cheap "is a t-test even
    admissible here" gate that routes a metric to the parametric
    (ab_welch_ttest) or rank-based (stat_mann_whitney,
    stat_kruskal_wallis) arm of the testing stack. agg_higher_moments
    publishes the raw moments; this entry turns them into a decision.

    Exactness: deviations come from the decimal-contract mean
    (identical doubles in both engines); power sums go through
    DECIMAL(38,6) exactly as agg_higher_moments pins; S and K are
    quantized at 1e6 FIRST and JB is then a fixed IEEE tree over the
    already-exact quantized statistics — drift-free by construction.

    Scale: one events scan to the |types| mean frame, one deviation
    scan with map-side-combined decimal moment sums — nothing past the
    second shuffle exceeds |event types| rows."""
    from pyspark.sql.types import DecimalType

    ev = _t(spark, sf_dir, "events")["events"]
    stats = (
        ev.groupBy("event_type")
        .agg((dsum(F.col("value")) / F.count("value")).alias("mu"))
        .transform(cut_lineage)
    )
    d = F.col("value") - F.col("mu")
    dec6 = DecimalType(38, 6)
    moments = (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum((d * d).cast(dec6)), 4).cast("double").alias("m2"),
            F.round(F.sum((d * d * d).cast(dec6)), 4).cast("double").alias("m3"),
            F.round(F.sum((d * d * d * d).cast(dec6)), 4).cast("double").alias("m4"),
        )
    )
    nn = F.col("n").cast("double")
    s = _q6(F.sqrt(nn) * F.col("m3") / F.pow(F.col("m2"), 1.5))
    k = _q6(nn * F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0)
    sk = moments.select("event_type", "n", s.alias("s"), k.alias("k"))
    jb = F.col("n") / 6.0 * (F.col("s") * F.col("s") + F.col("k") * F.col("k") / 4.0)
    return sk.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("s").alias("skewness"),
        F.col("k").alias("excess_kurtosis"),
        _q6(jb).alias("jb_stat"),
        (jb > _CHI2_CRIT_DF2).alias("reject_normal"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Pettitt rank-based changepoint per series
# ---------------------------------------------------------------------------

_PETTITT_SQL = """
    WITH daily AS MATERIALIZED (
        SELECT event_type, DATE_TRUNC('day', ts) AS day, COUNT(*) AS cnt
        FROM events GROUP BY event_type, DATE_TRUNC('day', ts)
    ), gv AS (
        SELECT event_type, cnt, COUNT(*) AS tv
        FROM daily GROUP BY event_type, cnt
    ), mr AS (
        SELECT event_type, cnt,
               2 * (SUM(tv) OVER (PARTITION BY event_type ORDER BY cnt) - tv)
                   + tv + 1 AS m2
        FROM gv
    ), stats AS (
        SELECT event_type, COUNT(*) AS n FROM daily GROUP BY event_type
    ), walk AS (
        SELECT d.event_type, d.day, s.n,
               SUM(m.m2) OVER (PARTITION BY d.event_type ORDER BY d.day)
                   - CAST(ROW_NUMBER() OVER (PARTITION BY d.event_type
                                             ORDER BY d.day) AS BIGINT)
                     * (s.n + 1) AS u_t,
               ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day)
                   AS t_idx
        FROM daily d
        JOIN mr m ON m.event_type = d.event_type AND m.cnt = d.cnt
        JOIN stats s ON s.event_type = d.event_type
    ), ranked AS (
        SELECT event_type, n, day, ABS(u_t) AS au,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ABS(u_t) DESC, day ASC) AS rn
        FROM walk WHERE t_idx < n
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(au AS BIGINT) AS k_stat, day AS change_day,
           LEAST(FLOOR(2.0 * EXP(-6.0 * CAST(au AS DOUBLE) * au
                       / (CAST(n AS DOUBLE) * n * n
                          + CAST(n AS DOUBLE) * n)) * 1e6 + 0.5) / 1e6, 1.0)
               AS p_approx,
           LEAST(2.0 * EXP(-6.0 * CAST(au AS DOUBLE) * au
                 / (CAST(n AS DOUBLE) * n * n + CAST(n AS DOUBLE) * n)), 1.0)
               < 0.05 AS significant
    FROM ranked WHERE rn = 1
    ORDER BY event_type
"""


@query("ts_pettitt_test", oracle=_PETTITT_SQL)
def ts_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt changepoint per event type on the daily event-count
    series: K = max_t |U_t| with U_t = 2*sum_{i<=t} r_i - t(n+1) over
    the midranks r of the daily values — the RANK-based single
    changepoint test (a level shift is found even when the magnitudes
    are heavy-tailed), complementing ts_cusum_changepoint's
    mean-deviation walk; with the standard approximation
    p ~ 2 exp(-6K^2/(n^3+n^2)).

    Exactness: midranks stay integral as doubled rank values (the
    stat_mann_whitney identity m2 = 2*kprev + t + 1 at the
    (series, value) grain), so every U_t is exact BIGINT; the argmax
    orders by |U_t| with the day as tie-break (total order); only the
    p approximation touches EXP, under the quantize-at-6 contract.

    Scale: everything is keyed on the series id — value-grain midranks
    and the time walk are per-series windows over CALENDAR-bounded
    frames (|days| rows per series), never a data-sized or
    single-partition window; the verdict frame is |series| rows."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .transform(cut_lineage)
    )
    gv = daily.groupBy("event_type", "cnt").agg(F.count("*").alias("tv"))
    wv = W.partitionBy("event_type").orderBy("cnt").rowsBetween(
        W.unboundedPreceding, 0
    )
    mr = gv.select(
        "event_type",
        "cnt",
        (2 * (F.sum("tv").over(wv) - F.col("tv")) + F.col("tv") + 1).alias("m2"),
    )
    stats = daily.groupBy("event_type").agg(F.count("*").alias("n"))
    wt = W.partitionBy("event_type").orderBy("day")
    walk = (
        daily.join(mr, ["event_type", "cnt"])
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            (
                F.sum("m2").over(wt.rowsBetween(W.unboundedPreceding, 0))
                - F.row_number().over(wt).cast("bigint") * (F.col("n") + 1)
            ).alias("u_t"),
            F.row_number().over(wt).alias("t_idx"),
        )
    )
    ranked = (
        walk.filter(F.col("t_idx") < F.col("n"))
        .withColumn("au", F.abs(F.col("u_t")))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(F.desc("au"), F.asc("day"))
            ),
        )
        .filter(F.col("rn") == 1)
    )
    au, n = F.col("au").cast("double"), F.col("n").cast("double")
    p = F.least(2.0 * F.exp(-6.0 * au * au / (n * n * n + n * n)), F.lit(1.0))
    return ranked.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("au").cast("bigint").alias("k_stat"),
        F.col("day").alias("change_day"),
        F.least(_q6(2.0 * F.exp(-6.0 * au * au / (n * n * n + n * n))), F.lit(1.0)).alias(
            "p_approx"
        ),
        (p < 0.05).alias("significant"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Deterministic k-fold assignment audit
# ---------------------------------------------------------------------------

_KFOLD_K = 5

_KFOLD_SQL = f"""
    WITH assign AS (
        SELECT doc_id, lang, n_chars,
               CAST(((doc_id * 9973 + 7919) % 1000003) % {_KFOLD_K} AS INT) AS fold
        FROM documents
    ), fl AS MATERIALIZED (
        SELECT fold, lang, COUNT(*) AS c, CAST(SUM(n_chars) AS BIGINT) AS chars
        FROM assign GROUP BY fold, lang
    ), per_fold AS (
        SELECT fold, CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(SUM(chars) AS BIGINT) AS sum_chars,
               CAST(COUNT(*) AS BIGINT) AS n_langs,
               CAST(MAX(c) AS BIGINT) AS top_c
        FROM fl GROUP BY fold
    )
    SELECT p.fold, p.n_docs, p.sum_chars, p.n_langs,
           MIN(f.lang) AS top_lang,
           FLOOR(CAST(p.top_c AS DOUBLE) / p.n_docs * 1e6 + 0.5) / 1e6
               AS top_lang_share
    FROM per_fold p JOIN fl f ON f.fold = p.fold AND f.c = p.top_c
    GROUP BY p.fold, p.n_docs, p.sum_chars, p.n_langs, p.top_c
    ORDER BY p.fold
"""


@query("ml_kfold_assignment", oracle=_KFOLD_SQL)
def ml_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment audit: every
    document lands in one of {_KFOLD_K} folds by the portable mix-hash
    of doc_id (the ml_split_shuffle hash family — reproducible under
    any partitioning, no RNG, no shuffled copy of the corpus), and the
    audit reports per-fold size, character mass, language count, and
    the dominant language's share — the balance check run BEFORE
    trusting any cross-validated metric (a fold that over-draws one
    language biases every validation score computed on it).

    Exactness: the assignment is pure BIGINT arithmetic; counts and
    char sums are exact integers; the dominant language ties break to
    the MIN lang (total order).

    Scale: one map-side assignment (no shuffle beyond the
    (fold, lang)-grain aggregate); everything downstream is
    k*|langs|-sized."""
    from es_analytics_spark.functions.portable import accept_hash

    docs = _t(spark, sf_dir, "documents")["documents"]
    assign = docs.select(
        "lang",
        "n_chars",
        (accept_hash(F.col("doc_id")) % _KFOLD_K).cast("int").alias("fold"),
    )
    fl = (
        assign.groupBy("fold", "lang")
        .agg(F.count("*").alias("c"), F.sum("n_chars").cast("bigint").alias("chars"))
        .transform(cut_lineage)
    )
    per_fold = fl.groupBy("fold").agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.sum("chars").cast("bigint").alias("sum_chars"),
        F.count("*").cast("bigint").alias("n_langs"),
        F.max("c").cast("bigint").alias("top_c"),
    )
    # rename before the derived self-join so resolution is unambiguous
    top = fl.select(
        F.col("fold").alias("tfold"), F.col("lang"), F.col("c").alias("tc")
    )
    return (
        per_fold.join(
            top,
            (per_fold["fold"] == top["tfold"]) & (per_fold["top_c"] == top["tc"]),
        )
        .groupBy("fold", "n_docs", "sum_chars", "n_langs", "top_c")
        .agg(F.min("lang").alias("top_lang"))
        .select(
            "fold",
            "n_docs",
            "sum_chars",
            "n_langs",
            "top_lang",
            _q6(F.col("top_c").cast("double") / F.col("n_docs")).alias(
                "top_lang_share"
            ),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Neighbor-Jaccard link prediction on the co-supply graph
# ---------------------------------------------------------------------------

_JN_FP = 1_000_000_000  # 1e9 fixed point for the Jaccard ratio


def _jn_sql() -> str:
    from es_analytics_spark.queries_sql4 import _EDGES_CTE

    return f"""
    WITH {_EDGES_CTE},
    adj AS (
        SELECT u AS w, v AS nb FROM edges
        UNION ALL
        SELECT v AS w, u AS nb FROM edges
    ), scored AS (
        SELECT a.nb AS u, b.nb AS v, COUNT(*) AS cn
        FROM adj a JOIN adj b ON a.w = b.w AND a.nb < b.nb
        GROUP BY a.nb, b.nb
    )
    SELECT s.u, s.v, s.cn AS common_neighbors,
           CAST(FLOOR(CAST({_JN_FP} AS DOUBLE) * s.cn
                      / (du.d + dv.d - s.cn) + 0.5) AS BIGINT) AS jaccard_fp
    FROM scored s
    JOIN deg du ON du.node = s.u
    JOIN deg dv ON dv.node = s.v
    LEFT JOIN edges e ON e.u = s.u AND e.v = s.v
    WHERE e.u IS NULL
    ORDER BY jaccard_fp DESC, s.u ASC, s.v ASC LIMIT 20
"""


@query("graph_jaccard_neighbors", oracle=_jn_sql())
def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-Jaccard link prediction: top-20 non-adjacent supplier
    pairs by |N(u) ∩ N(v)| / |N(u) ∪ N(v)| — the normalized
    common-neighbors score that completes the link-prediction trio
    beside Resource-Allocation (graph_link_predict) and Adamic-Adar
    (graph_adamic_adar): RA and AA reward sharing RARE neighbors,
    Jaccard rewards sharing a large FRACTION of each other's
    neighborhoods, so disagreement between the three rankings flags
    hub-driven artifacts.

    Exactness: common-neighbor and degree counts are exact integers;
    the ratio quantizes to 1e9 fixed point (one fixed IEEE division
    over exact ints) before ranking, with (u, v) breaking ties.

    Scale: the same wedge self-join as AA/RA (each common neighbor
    emits one pair, hub centers bounded by the co-supply edge
    derivation's caps); degrees join at |nodes| size; the final
    anti-join is edge-sized and the top-20 is TakeOrdered."""
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    edges = _co_supply_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # the wedge explosion amplifies each adjacency row ~deg(w)-fold, but
    # AQE coalesces the tiny pre-join shuffle to 1-2 partitions at this
    # input size (measured: every stage of this query ran 1-2 tasks on
    # 32 cores) — fan the adjacency out on the join key so both sides
    # co-partition at the conf-derived width and the explosion stage
    # parallelizes (guide §2.2/§2.5 input skew; exchange count is
    # unchanged — this IS the join's exchange, just wider)
    adj = fan_out(
        edges.select(F.col("u").alias("w"), F.col("v").alias("nb")).unionAll(
            edges.select(F.col("v").alias("w"), F.col("u").alias("nb"))
        ),
        sf_dir,
        "lineitem",
        "w",
        weight=8,
    )
    a, b = adj.alias("a"), adj.alias("b")
    # wedge join: shuffle_hash instead of sort-merge (guide §3.1 — the
    # adjacency sides are edge-sized; SMJ paid two input sorts whose
    # only consumer is this equi-join). The wedge pair crosses the
    # aggregate packed into ONE bigint (u << 32 | v — supplier keys are
    # int-sized at any published SF, the _co_supply_edges precedent):
    # the partial aggregate over the wedge explosion hashes one long
    # instead of a two-field row and the exchange carries half the key
    # bytes (guide §2.3 "narrower types").
    scored = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.nb") < F.col("b.nb")))
        .select(
            (F.shiftleft(F.col("a.nb"), 32) + F.col("b.nb")).alias("uv")
        )
        .groupBy("uv")
        .agg(F.count(F.lit(1)).alias("cn"))
        .select(
            F.shiftright("uv", 32).alias("u"),
            (F.col("uv") - F.shiftleft(F.shiftright("uv", 32), 32)).alias("v"),
            "cn",
        )
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    jfp = F.floor(
        F.lit(float(_JN_FP)) * F.col("cn") / (F.col("du") + F.col("dv") - F.col("cn"))
        + F.lit(0.5)
    ).cast("bigint")
    # anti-join against the (edge-sized, lineitem-bounded) edge list:
    # broadcast it when the local layout proves it small, so the scored
    # aggregate is not re-exchanged/sorted for a sort-merge anti join
    return (
        scored.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .join(broadcast_if_small(edges, sf_dir, "lineitem"), ["u", "v"], "left_anti")
        .select("u", "v", F.col("cn").alias("common_neighbors"), jfp.alias("jaccard_fp"))
        .orderBy(F.col("jaccard_fp").desc(), F.col("u").asc(), F.col("v").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Grubbs max-studentized outlier screen
# ---------------------------------------------------------------------------

# mean first, deviations second — two scans of the user-grain frame
# (the agg_higher_moments recipe)
_GRUBBS_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT event_type, user_id, {dsum_expr('value')} AS rev
        FROM events GROUP BY event_type, user_id
    ), stats AS MATERIALIZED (
        SELECT event_type, COUNT(*) AS n, {davg_expr('rev')} AS mu
        FROM pu GROUP BY event_type
    ), dev AS MATERIALIZED (
        SELECT p.event_type, p.user_id, s.n, s.mu, p.rev,
               CAST(FLOOR(ABS(p.rev - s.mu) * 1e4 + 0.5) AS BIGINT) AS dev_fp
        FROM pu p JOIN stats s USING (event_type)
    ), m2 AS (
        SELECT event_type, MAX(n) AS n, MAX(mu) AS mu,
               CAST(ROUND(SUM(CAST((rev - mu) * (rev - mu)
                                   AS DECIMAL(38,6))), 4) AS DOUBLE) AS ss,
               MAX(dev_fp) AS max_dev_fp
        FROM dev
        GROUP BY event_type
    )
    SELECT m.event_type, CAST(m.n AS BIGINT) AS n,
           FLOOR(m.mu * 1e6 + 0.5) / 1e6 AS mean_rev,
           FLOOR(SQRT(m.ss / (m.n - 1)) * 1e6 + 0.5) / 1e6 AS sd_rev,
           FLOOR((CAST(m.max_dev_fp AS DOUBLE) / 1e4)
                 / SQRT(m.ss / (m.n - 1)) * 1e6 + 0.5) / 1e6 AS g_stat,
           CAST(MAX(d.user_id) AS BIGINT) AS suspect_user
    FROM m2 m JOIN dev d
      ON d.event_type = m.event_type AND d.dev_fp = m.max_dev_fp
    GROUP BY m.event_type, m.n, m.mu, m.ss, m.max_dev_fp
    ORDER BY m.event_type
"""


@query("stat_grubbs_outlier", oracle=_GRUBBS_SQL)
def stat_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs max-studentized outlier screen per event type: the
    G statistic max|x - mean| / sd over per-user revenue, with the
    suspect user identified — the "is the metric mover one whale"
    check that precedes any experiment readout (one extreme user can
    fabricate a significant ab_welch_ttest; ts_mad_outliers screens
    points in time, this screens USERS within a metric).

    Exactness: per-user revenue and the mean come from the decimal
    contract (identical doubles in both engines); deviations quantize
    to 1e4 fixed point so the per-group max is exact-integer; the
    squared-deviation sum goes through DECIMAL(38,6) (the
    agg_higher_moments recipe); G is one fixed IEEE tree, quantized at
    1e6; suspect ties break to the MAX user id.

    Scale: user-grain aggregate, |types|-row stats broadcast back,
    one more user-grain pass for deviations — the suspect join-back
    compares against a |types|-row broadcast of max deviations."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("event_type", "user_id")
        .agg(dsum(F.col("value")).alias("rev"))
        .transform(cut_lineage)
    )
    stats = pu.groupBy("event_type").agg(
        F.count("*").alias("n"),
        (dsum(F.col("rev")) / F.count("rev")).alias("mu"),
    )
    from pyspark.sql.types import DecimalType

    dev = pu.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "user_id",
        "n",
        "mu",
        "rev",
        F.floor(F.abs(F.col("rev") - F.col("mu")) * 1e4 + F.lit(0.5))
        .cast("bigint")
        .alias("dev_fp"),
    ).transform(cut_lineage)
    m2 = dev.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("mu").alias("mu"),
        F.round(
            F.sum(
                ((F.col("rev") - F.col("mu")) * (F.col("rev") - F.col("mu"))).cast(
                    DecimalType(38, 6)
                )
            ),
            4,
        )
        .cast("double")
        .alias("ss"),
        F.max("dev_fp").alias("max_dev_fp"),
    )
    sd = F.sqrt(F.col("ss") / (F.col("n") - 1))
    return (
        m2.join(
            dev.select("event_type", "user_id", "dev_fp"),
            ["event_type"],
        )
        .filter(F.col("dev_fp") == F.col("max_dev_fp"))
        .groupBy("event_type", "n", "mu", "ss", "max_dev_fp")
        .agg(F.max("user_id").cast("bigint").alias("suspect_user"))
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            _q6(F.col("mu")).alias("mean_rev"),
            _q6(sd).alias("sd_rev"),
            _q6((F.col("max_dev_fp").cast("double") / 1e4) / sd).alias("g_stat"),
            "suspect_user",
        )
        .orderBy("event_type")
    )
