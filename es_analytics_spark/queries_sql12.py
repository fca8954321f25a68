"""Round-5 batch-12 surface: mRMR greedy feature selection over an MI
matrix, the Mann-Kendall nonparametric trend test, per-dimension
embedding whitening statistics, and a two-model agreement matrix
(trained naive Bayes vs the stopword heuristic).

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, integer micro-nat LN terms
(quantize-at-1e-6 precedent), and fixed IEEE trees on exact-int or
decimal-rounded inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _HITS_SQL, _t, query
from es_analytics_spark.queries_sql9 import _NB_PREFIX, _nb_ranked


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# mRMR greedy feature selection over a pairwise-MI matrix
# ---------------------------------------------------------------------------

# variable definitions shared by the Spark exprs below and the SQL text:
# label  = user-level high-value-purchaser flag (the ml_mutual_information
#          label, joined back to every event)
# etype  = event_type; dow = epoch-day mod 7; hour4 = hour div 6 band;
# vband  = floor(value / 100)
_MRMR_VARS_SQL = {
    "etype": "e.event_type",
    "dow": "CAST(DATEDIFF('day', DATE '1970-01-01', CAST(e.ts AS DATE)) % 7"
    " AS VARCHAR)",
    "hour4": "CAST(EXTRACT(HOUR FROM e.ts) // 6 AS VARCHAR)",
    "vband": "CAST(CAST(FLOOR(e.value / 100.0) AS BIGINT) AS VARCHAR)",
}

_MRMR_FEATURES = tuple(sorted(_MRMR_VARS_SQL))

_MI_TERM = "c.o * 1.0 / t.n * LN(c.o * 1.0 * t.n / (b.ob * 1.0 * l.ol))"


def _mrmr_sql() -> str:
    pair_selects = []
    # relevance pairs: (label, feature); redundancy pairs: (f, g), f < g
    for f in _MRMR_FEATURES:
        pair_selects.append(
            f"SELECT 'label|{f}' AS pair, CAST(pu.label AS VARCHAR) AS x,"
            f" {_MRMR_VARS_SQL[f]} AS y"
            " FROM events e JOIN pu ON pu.user_id = e.user_id"
        )
    for i, f in enumerate(_MRMR_FEATURES):
        for g in _MRMR_FEATURES[i + 1 :]:
            pair_selects.append(
                f"SELECT '{f}|{g}' AS pair, {_MRMR_VARS_SQL[f]} AS x,"
                f" {_MRMR_VARS_SQL[g]} AS y FROM events e"
            )
    pairs = " UNION ALL ".join(pair_selects)
    return f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ), pts AS MATERIALIZED (
        {pairs}
    ), cells AS MATERIALIZED (
        SELECT pair, x, y, COUNT(*) AS o FROM pts GROUP BY 1, 2, 3
    ), bm AS (
        SELECT pair, x, SUM(o) AS ob FROM cells GROUP BY 1, 2
    ), lm AS (
        SELECT pair, y, SUM(o) AS ol FROM cells GROUP BY 1, 2
    ), tot AS (
        SELECT pair, SUM(o) AS n FROM cells GROUP BY 1
    ), mi AS MATERIALIZED (
        SELECT c.pair,
               FLOOR({dsum_expr(_MI_TERM)} * 1e6 + 0.5) / 1e6 AS mi
        FROM cells c
        JOIN bm b ON b.pair = c.pair AND b.x = c.x
        JOIN lm l ON l.pair = c.pair AND l.y = c.y
        JOIN tot t ON t.pair = c.pair
        GROUP BY c.pair
    ), rel AS MATERIALIZED (
        SELECT SUBSTR(pair, 7) AS f, mi AS rel FROM mi
        WHERE pair LIKE 'label|%'
    ), red AS MATERIALIZED (
        SELECT SPLIT_PART(pair, '|', 1) AS f1, SPLIT_PART(pair, '|', 2) AS f2,
               mi
        FROM mi WHERE pair NOT LIKE 'label|%'
    ), s1 AS MATERIALIZED (
        SELECT f, rel, rel AS score FROM rel
        QUALIFY ROW_NUMBER() OVER (ORDER BY rel DESC, f ASC) = 1
    ), s2 AS MATERIALIZED (
        SELECT r.f, r.rel,
               FLOOR((r.rel - d.mi) * 1e6 + 0.5) / 1e6 AS score
        FROM rel r
        JOIN (SELECT f AS sf1 FROM s1) p1 ON r.f <> p1.sf1
        JOIN red d ON d.f1 = LEAST(r.f, p1.sf1)
                  AND d.f2 = GREATEST(r.f, p1.sf1)
        QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, r.f ASC) = 1
    ), s3 AS (
        SELECT r.f, r.rel,
               FLOOR((r.rel - (d1.mi + d2.mi) / 2) * 1e6 + 0.5) / 1e6 AS score
        FROM rel r
        JOIN (SELECT f AS sf1 FROM s1) p1 ON r.f <> p1.sf1
        JOIN (SELECT f AS sf2 FROM s2) p2 ON r.f <> p2.sf2
        JOIN red d1 ON d1.f1 = LEAST(r.f, p1.sf1)
                   AND d1.f2 = GREATEST(r.f, p1.sf1)
        JOIN red d2 ON d2.f1 = LEAST(r.f, p2.sf2)
                   AND d2.f2 = GREATEST(r.f, p2.sf2)
        QUALIFY ROW_NUMBER() OVER (ORDER BY score DESC, r.f ASC) = 1
    )
    SELECT 1 AS rank, f AS feature, rel AS relevance, score FROM s1
    UNION ALL
    SELECT 2 AS rank, f AS feature, rel AS relevance, score FROM s2
    UNION ALL
    SELECT 3 AS rank, f AS feature, rel AS relevance, score FROM s3
"""


@query("ml_feature_selection_mrmr", oracle=_mrmr_sql())
def ml_feature_selection_mrmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mRMR (max-relevance, min-redundancy) greedy feature selection:
    rank three of four candidate event features by I(feature; label)
    MINUS their average MI with already-selected features — the
    selection step on top of ml_mutual_information's screen, and the
    reason a second feature that merely restates the first never wins.
    Label is the user-level high-value-purchaser flag.

    Exactness: all 10 MI values (4 relevance + 6 redundancy pairs)
    come from exact contingency counts with the single-LN decimal-sum
    contract, quantized at 1e-6; the greedy arithmetic then runs on
    those quantized values with deterministic (score desc, feature
    asc) tie-breaks, so the selection path is bit-identical in both
    engines.

    Scale: the pair fan-out is a bounded UNION over one scan shape,
    each pair reducing map-side to a |levels_x| x |levels_y| cell grid
    (all value-domain-bounded); the greedy rounds are joins over the
    10-row MI matrix. Feature count F costs F^2/2 bounded aggregates —
    the standard mRMR trade, data-size-independent after the scan."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") >= 100.0),
                1,
            ).otherwise(0)
        ).alias("label")
    )
    ev = e.join(pu, "user_id").transform(cut_lineage)
    var_exprs = {
        "etype": F.col("event_type"),
        "dow": (
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) % 7
        ).cast("string"),
        "hour4": F.expr("hour(ts) div 6").cast("string"),
        "vband": F.floor(F.col("value") / F.lit(100.0))
        .cast("bigint")
        .cast("string"),
        "label": F.col("label").cast("string"),
    }
    branches = []
    for f in _MRMR_FEATURES:
        branches.append(
            ev.select(
                F.lit(f"label|{f}").alias("pair"),
                var_exprs["label"].alias("x"),
                var_exprs[f].alias("y"),
            )
        )
    for i, f in enumerate(_MRMR_FEATURES):
        for g in _MRMR_FEATURES[i + 1 :]:
            branches.append(
                ev.select(
                    F.lit(f"{f}|{g}").alias("pair"),
                    var_exprs[f].alias("x"),
                    var_exprs[g].alias("y"),
                )
            )
    pts = branches[0]
    for b in branches[1:]:
        pts = pts.unionAll(b)
    cells = (
        pts.groupBy("pair", "x", "y")
        .agg(F.count(F.lit(1)).alias("o"))
        .transform(cut_lineage)
    )
    bm = cells.groupBy("pair", "x").agg(F.sum("o").alias("ob"))
    lm = cells.groupBy("pair", "y").agg(F.sum("o").alias("ol"))
    tot = cells.groupBy("pair").agg(F.sum("o").alias("n"))
    term = (
        F.col("o")
        * 1.0
        / F.col("n")
        * F.log(
            F.col("o") * 1.0 * F.col("n") / (F.col("ob") * 1.0 * F.col("ol"))
        )
    )
    mi = (
        cells.join(bm, ["pair", "x"])
        .join(lm, ["pair", "y"])
        .join(F.broadcast(tot), "pair")
        .groupBy("pair")
        .agg(_q6(dsum(term)).alias("mi"))
        .transform(cut_lineage)
    )
    rel = mi.filter(F.col("pair").startswith("label|")).select(
        F.substring("pair", 7, 100).alias("f"), F.col("mi").alias("rel")
    )
    red = mi.filter(~F.col("pair").startswith("label|")).select(
        F.split("pair", r"\|")[0].alias("f1"),
        F.split("pair", r"\|")[1].alias("f2"),
        "mi",
    )
    w_rel = W.orderBy(F.col("rel").desc(), F.asc("f"))
    s1 = (
        rel.withColumn("rk", F.row_number().over(w_rel))
        .filter(F.col("rk") == 1)
        .select("f", "rel", F.col("rel").alias("score"))
    )

    def pick(cands: DataFrame) -> DataFrame:
        w = W.orderBy(F.col("score").desc(), F.asc("f"))
        return (
            cands.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("f", "rel", "score")
        )

    def redu(fcol, scol):
        return (F.least(fcol, scol), F.greatest(fcol, scol))

    s1b = F.broadcast(s1.select(F.col("f").alias("sf1")))
    l1, g1 = redu(F.col("f"), F.col("sf1"))
    s2 = pick(
        rel.crossJoin(s1b)
        .filter(F.col("f") != F.col("sf1"))
        .join(
            F.broadcast(red),
            (F.col("f1") == l1) & (F.col("f2") == g1),
        )
        .select("f", "rel", _q6(F.col("rel") - F.col("mi")).alias("score"))
    )
    s2b = F.broadcast(s2.select(F.col("f").alias("sf2")))
    red1 = red.select(
        F.col("f1").alias("a1"), F.col("f2").alias("a2"), F.col("mi").alias("mi1")
    )
    red2 = red.select(
        F.col("f1").alias("b1"), F.col("f2").alias("b2"), F.col("mi").alias("mi2")
    )
    l2, g2 = redu(F.col("f"), F.col("sf2"))
    s3 = pick(
        rel.crossJoin(s1b)
        .crossJoin(s2b)
        .filter((F.col("f") != F.col("sf1")) & (F.col("f") != F.col("sf2")))
        .join(F.broadcast(red1), (F.col("a1") == l1) & (F.col("a2") == g1))
        .join(F.broadcast(red2), (F.col("b1") == l2) & (F.col("b2") == g2))
        .select(
            "f",
            "rel",
            _q6(
                F.col("rel") - (F.col("mi1") + F.col("mi2")) / 2
            ).alias("score"),
        )
    )

    def emit(s: DataFrame, rk: int) -> DataFrame:
        return s.select(
            F.lit(rk).alias("rank"),
            F.col("f").alias("feature"),
            F.col("rel").alias("relevance"),
            "score",
        )

    return emit(s1, 1).unionAll(emit(s2, 2)).unionAll(emit(s3, 3))


# ---------------------------------------------------------------------------
# Mann-Kendall trend test on the daily-revenue series
# ---------------------------------------------------------------------------

_MK_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), s AS (
        SELECT CAST(SUM(CASE WHEN b.y > a.y THEN 1
                             WHEN b.y < a.y THEN -1 ELSE 0 END)
                    AS BIGINT) AS s_stat
        FROM daily a JOIN daily b ON b.day > a.day
    ), ties AS (
        SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                   AS tie_term
        FROM (SELECT COUNT(*) AS t FROM daily GROUP BY y HAVING COUNT(*) > 1)
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily
    )
    SELECT n AS n_days, s_stat,
           FLOOR((CAST(n * (n - 1) * (2 * n + 5) AS DOUBLE)
                  - CAST(tie_term AS DOUBLE)) / 18 * 1e6 + 0.5) / 1e6 AS var_s,
           FLOOR(CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
                      WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
                      ELSE 0.0 END
                 / SQRT((CAST(n * (n - 1) * (2 * n + 5) AS DOUBLE)
                         - CAST(tie_term AS DOUBLE)) / 18)
                 * 1e6 + 0.5) / 1e6 AS z_mk
    FROM s CROSS JOIN ties CROSS JOIN nn
"""


@query("stat_mann_kendall", oracle=_MK_SQL)
def stat_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on the daily-revenue series: the
    rank-based S statistic (concordant minus discordant day pairs),
    its tie-corrected variance, and the continuity-corrected z —
    the nonparametric companion to ts_trend_theil_sen (Theil-Sen
    estimates the slope; Mann-Kendall decides whether a monotone
    trend exists at all, immune to outlier days).

    Exactness: the sign comparisons run on decimal-contract daily
    sums (identical doubles), so S and the tie groups are exact
    integers; variance and z are fixed IEEE trees with one correctly
    rounded SQRT, quantized at 1e-6.

    Scale: one shuffle to the |days| grain; the pair scan is a
    broadcast self-join over the calendar-bounded frame (30-365 rows
    — n^2 on the calendar, never on events); everything else is
    1-row arithmetic."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    a, b = daily.alias("a"), daily.alias("b")
    s = a.join(F.broadcast(b), F.col("b.day") > F.col("a.day")).agg(
        F.sum(
            F.when(F.col("b.y") > F.col("a.y"), 1)
            .when(F.col("b.y") < F.col("a.y"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    ties = (
        daily.groupBy("y")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    j = s.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(nn))
    var_s = (
        (
            F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        ).cast("double")
        - F.col("tie_term").cast("double")
    ) / 18
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double"))
        .otherwise(F.lit(0.0))
    ) / F.sqrt(var_s)
    return j.select(
        F.col("n").alias("n_days"),
        "s_stat",
        _q6(var_s).alias("var_s"),
        _q6(z).alias("z_mk"),
    )


# ---------------------------------------------------------------------------
# Per-dimension embedding whitening statistics
# ---------------------------------------------------------------------------

_WHITEN_EPS = "0.000001"

_WHITEN_SQL = f"""
    WITH dims AS (
        SELECT GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
               CAST(UNNEST(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), g AS (
        SELECT CAST(dim AS BIGINT) AS dim, COUNT(*) AS n,
               {dsum_expr('x')} AS sx, {dsum_expr('x * x')} AS sxx
        FROM dims GROUP BY 1
    )
    SELECT dim, CAST(n AS BIGINT) AS n,
           FLOOR(sx / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean,
           FLOOR((sxx / CAST(n AS DOUBLE)
                  - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS variance,
           FLOOR(1 / SQRT(sxx / CAST(n AS DOUBLE)
                          - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE))
                          + {_WHITEN_EPS})
                 * 1e6 + 0.5) / 1e6 AS whiten_scale
    FROM g
"""


@query("ml_embedding_whitening_diag", oracle=_WHITEN_SQL)
def ml_embedding_whitening_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diagonal whitening statistics per embedding dimension: mean,
    variance, and the 1/sqrt(var + eps) scale — the preprocessing step
    before cosine/ANN retrieval when dimensions have wildly different
    energies (a hot dimension dominates every dot product;
    sim_embedding_stats sees the symptom, this computes the fix). The
    output is the whitening vector a pipeline broadcasts onto the
    embedding column.

    Exactness: per-dimension sums of x and x^2 go through the decimal
    contract (the float32→double widening is exact); mean/variance/
    scale are fixed IEEE trees with one correctly rounded SQRT and a
    shared epsilon literal, quantized at 1e-6.

    Scale: one posexplode to (dim, value) — 64x the vector count but
    map-side combinable immediately to the |dims| grain; no state
    beyond 64 rows after the first aggregate."""
    em = _t(spark, sf_dir, "embeddings")["embeddings"]
    dims = em.select(
        F.posexplode("embedding").alias("dim0", "xf")
    ).select(
        (F.col("dim0") + 1).cast("bigint").alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    g = dims.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum("x").alias("sx"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("sx") / nd
    var = F.col("sxx") / nd - (F.col("sx") / nd) * (F.col("sx") / nd)
    return g.select(
        "dim",
        "n",
        _q6(mean).alias("mean"),
        _q6(var).alias("variance"),
        _q6(1 / F.sqrt(var + F.lit(float(_WHITEN_EPS)))).alias(
            "whiten_scale"
        ),
    )


# ---------------------------------------------------------------------------
# Two-model agreement matrix (naive Bayes vs stopword heuristic)
# ---------------------------------------------------------------------------

_AGREE_SQL = (
    _NB_PREFIX
    + f"""
    , heur AS (
        SELECT doc_id,
               CASE WHEN GREATEST(hits_en, hits_de, hits_fr, hits_es,
                                  hits_zh) = 0 THEN 'und'
                    WHEN hits_en >= GREATEST(hits_de, hits_fr, hits_es,
                                             hits_zh) THEN 'en'
                    WHEN hits_de >= GREATEST(hits_fr, hits_es, hits_zh)
                        THEN 'de'
                    WHEN hits_fr >= GREATEST(hits_es, hits_zh) THEN 'fr'
                    WHEN hits_es >= hits_zh THEN 'es'
                    ELSE 'zh' END AS lang_heur
        FROM (SELECT doc_id, {_HITS_SQL}
              FROM documents WHERE doc_id % 2 = 1)
    ), nbp AS (
        SELECT doc_id, true_lang, m_lang AS lang_nb FROM ranked WHERE rn = 1
    )
    SELECT n.lang_nb, h.lang_heur, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE n.lang_nb = n.true_lang) AS BIGINT)
               AS n_nb_correct,
           CAST(COUNT(*) FILTER (WHERE h.lang_heur = n.true_lang) AS BIGINT)
               AS n_heur_correct
    FROM nbp n JOIN heur h USING (doc_id)
    GROUP BY 1, 2
"""
)


@query("ml_model_agreement", oracle=_AGREE_SQL)
def ml_model_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-agreement matrix between two independent language-ID
    models on the held-out half: the trained naive Bayes
    (ml_naive_bayes_langid) vs the stopword heuristic
    (text_language_id), with per-cell truth hit counts — the
    model-diff monitor that catches silent regressions when either
    model changes (disagreement cells are exactly where to audit, the
    cross-model twin of ml_langid_confusion).

    Exactness: both predictors are already deterministic catalog
    contracts (integer micro-nat argmax; integer stopword-hit
    cascade); the matrix is exact counts.

    Scale: reuses the NB scoring plan plus one doc-grain map for the
    heuristic; the join is doc-keyed, the output |langs|^2-bounded."""
    from es_analytics_spark.queries import text_language_id

    nbp = (
        _nb_ranked(spark, sf_dir)
        .filter(F.col("rn") == 1)
        .select("doc_id", "true_lang", F.col("m_lang").alias("lang_nb"))
    )
    heur = (
        text_language_id(spark, sf_dir)
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", F.col("lang_pred").alias("lang_heur"))
    )
    return (
        nbp.join(heur, "doc_id")
        .groupBy("lang_nb", "lang_heur")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_if(F.col("lang_nb") == F.col("true_lang"))
            .cast("bigint")
            .alias("n_nb_correct"),
            F.count_if(F.col("lang_heur") == F.col("true_lang"))
            .cast("bigint")
            .alias("n_heur_correct"),
        )
    )
