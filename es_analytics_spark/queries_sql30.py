"""Round-5 batch-30 surface: McNemar's paired model test, daily bounce
rate from sessionization, and recommendation novelty.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _HITS_SQL, _t, query
from es_analytics_spark.queries_sql9 import _NB_PREFIX, _nb_ranked
from es_analytics_spark.queries_sql16 import _PDF_EXPR, _T_EXPR, _P2_EXPR


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# McNemar's test between the two language-ID models
# ---------------------------------------------------------------------------

_MCNEMAR_SQL = (
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
    ), cellsx AS (
        SELECT CAST(COUNT(*) FILTER (WHERE n.lang_nb = n.true_lang
                                     AND h.lang_heur <> n.true_lang)
                    AS BIGINT) AS b,
               CAST(COUNT(*) FILTER (WHERE n.lang_nb <> n.true_lang
                                     AND h.lang_heur = n.true_lang)
                    AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM nbp n JOIN heur h USING (doc_id)
    ), zs AS (
        SELECT n_docs, b, c,
               FLOOR((ABS(CAST(b AS DOUBLE) - c) - 1.0)
                     / SQRT(CAST(b + c AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS z
        FROM cellsx
    ), tstage AS (
        SELECT *, {_T_EXPR} AS t, {_PDF_EXPR} AS pdf FROM zs
    )
    SELECT n_docs, b AS n_nb_only_correct, c AS n_heur_only_correct,
           z AS z_mcnemar,
           FLOOR(({_P2_EXPR}) * 1e6 + 0.5) / 1e6 AS p_two_sided
    FROM tstage
"""
)


@query("stat_mcnemar_models", oracle=_MCNEMAR_SQL)
def stat_mcnemar_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test between the trained naive-Bayes and the
    stopword-heuristic language-ID models on the SAME held-out
    documents: only the disagreement cells matter (docs exactly one
    model gets right), with the continuity-corrected normal z and the
    pinned-CDF p — the statistically correct way to claim "model A
    beats model B" on one test set (comparing two accuracies with an
    unpaired test ignores that both models see the same docs;
    ml_model_agreement shows WHERE they disagree, McNemar says whether
    the disagreement favors one side beyond chance).

    Exactness: both predictors are deterministic catalog contracts;
    b/c counts are exact; z is one fixed tree quantized before the
    CDF.

    Scale: reuses the NB scoring plan + the doc-grain heuristic; one
    doc-keyed join and a 1-row reduction."""
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
    cells = nbp.join(heur, "doc_id").agg(
        F.count_if(
            (F.col("lang_nb") == F.col("true_lang"))
            & (F.col("lang_heur") != F.col("true_lang"))
        )
        .cast("bigint")
        .alias("b"),
        F.count_if(
            (F.col("lang_nb") != F.col("true_lang"))
            & (F.col("lang_heur") == F.col("true_lang"))
        )
        .cast("bigint")
        .alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    zs = cells.select(
        "n_docs",
        "b",
        "c",
        _q6(
            (F.abs(F.col("b").cast("double") - F.col("c")) - F.lit(1.0))
            / F.sqrt((F.col("b") + F.col("c")).cast("double"))
        ).alias("z"),
    )
    tstage = zs.withColumn("t", F.expr(_T_EXPR)).withColumn(
        "pdf", F.expr(_PDF_EXPR)
    )
    return tstage.select(
        "n_docs",
        F.col("b").alias("n_nb_only_correct"),
        F.col("c").alias("n_heur_only_correct"),
        F.col("z").alias("z_mcnemar"),
        _q6(F.expr(_P2_EXPR)).alias("p_two_sided"),
    )


# ---------------------------------------------------------------------------
# Daily bounce rate from 30-minute-gap sessionization
# ---------------------------------------------------------------------------

_BOUNCE_GAP_MIN = 30

_BOUNCE_SQL = f"""
    WITH ordered AS MATERIALIZED (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts > LAG(ts) OVER w
                            + INTERVAL {_BOUNCE_GAP_MIN} MINUTES
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS MATERIALIZED (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS sid
        FROM ordered
    ), per_sess AS MATERIALIZED (
        SELECT user_id, sid,
               CAST(DATE_TRUNC('day', MIN(ts)) AS TIMESTAMP) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM sess GROUP BY 1, 2
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounces,
           FLOOR(CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE)
                 / COUNT(*) * 1e6 + 0.5) / 1e6 AS bounce_rate
    FROM per_sess GROUP BY day
"""


@query("ts_bounce_rate_daily", oracle=_BOUNCE_SQL)
def ts_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: sessionize each user's events with the
    {_BOUNCE_GAP_MIN}-minute-gap rule (window_sessionize's contract),
    call a single-event session a bounce, and report sessions/bounces/
    rate per day (a session counts on the day it STARTS) — the
    engagement-quality headline next to ts_dau_wau_stickiness's volume
    numbers: traffic that bounces is volume without engagement.

    Exactness: session boundaries are exact timestamp comparisons over
    the deterministic (ts, event_id) order; session ids are exact
    running sums of 0/1 flags; all outputs are exact counts and one
    quantized division.

    Scale: two per-user windows (lag + running sum) on one user_id
    shuffle, then session- and day-grain aggregates — the standard
    sessionization plan."""
    e = _t(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts")
                > F.lag("ts").over(w)
                + F.expr(f"INTERVAL {_BOUNCE_GAP_MIN} MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_s"),
    )
    sess = ordered.select(
        "user_id",
        "ts",
        F.sum("new_s")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .alias("sid"),
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.date_trunc("day", F.min("ts")).alias("day"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return per_sess.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.count_if(F.col("n_events") == 1).cast("bigint").alias("n_bounces"),
        _q6(
            F.count_if(F.col("n_events") == 1).cast("double")
            / F.count(F.lit(1))
        ).alias("bounce_rate"),
    )


# ---------------------------------------------------------------------------
# Recommendation novelty (Vargas) + popularity-bias share
# ---------------------------------------------------------------------------

_NOV_TOPK = 3

_NOV_SQL = f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n_orders AS (
        SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS no FROM op
    ), pop AS MATERIALIZED (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS np FROM op GROUP BY p
    ), pcut AS (
        SELECT ROUND(QUANTILE_CONT(np, 0.9), 4) AS c90 FROM pop
    ), pairs AS MATERIALIZED (
        SELECT a.p AS anchor, b.p AS reco, CAST(COUNT(*) AS BIGINT) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
        GROUP BY 1, 2
    ), topk AS MATERIALIZED (
        SELECT anchor, reco FROM (
            SELECT anchor, reco,
                   ROW_NUMBER() OVER (PARTITION BY anchor
                                      ORDER BY support DESC, reco ASC) AS rn
            FROM pairs) WHERE rn <= {_NOV_TOPK}
    ), scored AS MATERIALIZED (
        SELECT t.anchor, t.reco,
               -LN(CAST(pop.np AS DOUBLE) / n_orders.no) AS nov,
               CASE WHEN pop.np >= pcut.c90 THEN 1 ELSE 0 END AS is_popular
        FROM topk t
        JOIN pop ON pop.p = t.reco
        CROSS JOIN n_orders CROSS JOIN pcut
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rec_pairs,
           FLOOR({dsum_expr('nov')} / COUNT(*) * 1e6 + 0.5) / 1e6
               AS mean_novelty,
           FLOOR(CAST(SUM(is_popular) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
               / 1e6 AS popular_share
    FROM scored
"""


@query("rec_novelty_share", oracle=_NOV_SQL)
def rec_novelty_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty audit of the co-occurrence recommender's top-{_NOV_TOPK}
    lists: mean Vargas novelty (-ln of the recommended item's
    popularity share — high when recs surface long-tail items) and the
    share of recommendations that land in the top-decile-popularity
    club — the popularity-bias dial rec_catalog_coverage's Gini
    summarizes from the item side, measured here from the
    recommendation side.

    Exactness: popularities and supports are exact integers; each
    novelty term is LN on an exact rational decimal-summed over the
    rec set; the popularity cutoff is the shared quantile contract;
    shares are quantized divisions.

    Scale: the bounded within-basket pair join (rec_item_cooccurrence's
    bound), per-anchor top-k windows, popularity broadcast into the
    scoring join, 1-row reduction."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .transform(cut_lineage)
    )
    n_orders = op.agg(F.countDistinct("o").cast("bigint").alias("no"))
    pop = op.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    pcut = pop.agg(F.round(F.percentile("np", F.lit(0.9)), 4).alias("c90"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("anchor"), F.col("b.p").alias("reco"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    wk = W.partitionBy("anchor").orderBy(F.desc("support"), F.asc("reco"))
    topk = (
        pairs.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _NOV_TOPK)
        .select("anchor", "reco")
    )
    scored = (
        topk.join(
            F.broadcast(pop.select(F.col("p").alias("reco"), "np")), "reco"
        )
        .crossJoin(F.broadcast(n_orders))
        .crossJoin(F.broadcast(pcut))
        .select(
            (-F.log(F.col("np").cast("double") / F.col("no"))).alias("nov"),
            F.when(F.col("np") >= F.col("c90"), 1).otherwise(0).alias(
                "is_popular"
            ),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rec_pairs"),
        _q6(dsum("nov") / F.count(F.lit(1))).alias("mean_novelty"),
        _q6(F.sum("is_popular").cast("double") / F.count(F.lit(1))).alias(
            "popular_share"
        ),
    )
