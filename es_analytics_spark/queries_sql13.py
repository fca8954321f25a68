"""Round-5 batch-13 surface: chance-corrected inter-model agreement
(Cohen's kappa), a confident-learning label-noise screen, a nearest-
centroid (Rocchio) embedding classifier with held-out confusion, and
Slope One collaborative filtering with an RMSE backtest.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, integer micro-nat scores, and
fixed IEEE trees on exact-int or decimal-rounded inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.portable import accept_hash, accept_hash_sql
from es_analytics_spark.queries import _HITS_SQL, _t, query
from es_analytics_spark.queries_sql9 import _NB_PREFIX, _nb_ranked


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Cohen's kappa between the two language-ID models
# ---------------------------------------------------------------------------

_KAPPA_SQL = (
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
    ), paired AS MATERIALIZED (
        SELECT r.m_lang AS a, h.lang_heur AS b
        FROM ranked r JOIN heur h USING (doc_id) WHERE r.rn = 1
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE a = b) AS BIGINT) AS agree
        FROM paired
    ), marg AS (
        SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS chance_pairs
        FROM (SELECT a AS c, COUNT(*) AS na FROM paired GROUP BY 1) x
        JOIN (SELECT b AS c, COUNT(*) AS nb FROM paired GROUP BY 1) y
          USING (c)
    )
    SELECT n, agree,
           FLOOR(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS p_observed,
           FLOOR(CAST(chance_pairs AS DOUBLE) / CAST(n * n AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS p_chance,
           FLOOR((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
                  - CAST(chance_pairs AS DOUBLE) / CAST(n * n AS DOUBLE))
                 / (1 - CAST(chance_pairs AS DOUBLE) / CAST(n * n AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS kappa
    FROM nn CROSS JOIN marg
"""
)


@query("stat_cohens_kappa", oracle=_KAPPA_SQL)
def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the trained naive Bayes and the stopword
    heuristic on the held-out docs: agreement corrected for the
    agreement two unrelated predictors would reach by chance — the
    single-number summary of ml_model_agreement's matrix (raw
    agreement over-credits models that both predict the majority
    class; kappa is what a model-diff alert should gate on).

    Exactness: the pair table, agreement count, and marginal products
    are exact integers from two deterministic predictors; p_o, p_e and
    kappa are fixed IEEE trees on exact-int doubles, quantized at 1e-6.

    Scale: reuses the NB scoring plan and a doc-grain heuristic map;
    the kappa arithmetic runs on |langs|-sized marginals."""
    from es_analytics_spark.queries import text_language_id

    nbp = (
        _nb_ranked(spark, sf_dir)
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("m_lang").alias("a"))
    )
    heur = (
        text_language_id(spark, sf_dir)
        .filter(F.col("doc_id") % 2 == 1)
        .select("doc_id", F.col("lang_pred").alias("b"))
    )
    paired = nbp.join(heur, "doc_id").select("a", "b").transform(cut_lineage)
    nn = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_if(F.col("a") == F.col("b")).cast("bigint").alias("agree"),
    )
    ma = paired.groupBy(F.col("a").alias("c")).agg(
        F.count(F.lit(1)).alias("na")
    )
    mb = paired.groupBy(F.col("b").alias("c")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    marg = (
        ma.join(mb, "c")
        .agg(
            F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
            .cast("bigint")
            .alias("chance_pairs")
        )
    )
    j = nn.crossJoin(F.broadcast(marg))
    po = F.col("agree").cast("double") / F.col("n").cast("double")
    pe = F.col("chance_pairs").cast("double") / (
        F.col("n") * F.col("n")
    ).cast("double")
    return j.select(
        "n",
        "agree",
        _q6(po).alias("p_observed"),
        _q6(pe).alias("p_chance"),
        _q6((po - pe) / (1 - pe)).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Label-noise screen: confident disagreements with the given label
# ---------------------------------------------------------------------------

_NOISE_TOP = 20

_NOISE_SQL = (
    _NB_PREFIX
    + f"""
    , top2 AS (
        SELECT doc_id, MAX(true_lang) AS true_lang,
               MAX(CASE WHEN rn = 1 THEN m_lang END) AS pred_lang,
               MAX(CASE WHEN rn = 1 THEN s_tot END) AS s1,
               MAX(CASE WHEN rn = 2 THEN s_tot END) AS s2
        FROM ranked GROUP BY doc_id
    )
    SELECT doc_id, true_lang, pred_lang,
           CAST(s1 - s2 AS BIGINT) AS margin_unats
    FROM top2 WHERE pred_lang <> true_lang
    ORDER BY margin_unats DESC, doc_id ASC LIMIT {_NOISE_TOP}
"""
)


@query("ml_label_noise_screen", oracle=_NOISE_SQL)
def ml_label_noise_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confident-learning label-noise screen: the held-out documents
    where the trained model disagrees with the GIVEN label by the
    LARGEST margin — the opposite tail from ml_uncertainty_sampling
    (uncertain rows need labels; confidently-contradicted rows have
    probably got WRONG labels, and pruning or re-labeling them is one
    of the highest-leverage training-data fixes at 100 TB).

    Exactness: same exact integer micro-nat scores and margins as the
    shared NB pipeline; the disagreement filter and top-20 selection
    are exact integer operations with doc_id tie-breaks.

    Scale: the NB scoring plan plus a per-doc top-2 pivot and a
    bounded TakeOrdered, exactly like the uncertainty entry."""
    r = _nb_ranked(spark, sf_dir).filter(F.col("rn") <= 2)
    top2 = r.groupBy("doc_id").agg(
        F.max("true_lang").alias("true_lang"),
        F.max(F.when(F.col("rn") == 1, F.col("m_lang"))).alias("pred_lang"),
        F.max(F.when(F.col("rn") == 1, F.col("s_tot"))).alias("s1"),
        F.max(F.when(F.col("rn") == 2, F.col("s_tot"))).alias("s2"),
    )
    return (
        top2.filter(F.col("pred_lang") != F.col("true_lang"))
        .select(
            "doc_id",
            "true_lang",
            "pred_lang",
            (F.col("s1") - F.col("s2")).cast("bigint").alias("margin_unats"),
        )
        .orderBy(F.desc("margin_unats"), F.asc("doc_id"))
        .limit(_NOISE_TOP)
    )


# ---------------------------------------------------------------------------
# Nearest-centroid (Rocchio) embedding classifier
# ---------------------------------------------------------------------------

_CENTROID_SQL = f"""
    WITH dims AS MATERIALIZED (
        SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
               CAST(UNNEST(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), cent AS MATERIALIZED (
        SELECT label AS c_label, dim, {dsum_expr('x')} / COUNT(x) AS m
        FROM dims WHERE vec_id % 2 = 0 GROUP BY 1, 2
    ), dist AS (
        SELECT d.vec_id, d.label AS true_label, c.c_label,
               {dsum_expr('(d.x - c.m) * (d.x - c.m)')} AS d2
        FROM dims d JOIN cent c ON c.dim = d.dim
        WHERE d.vec_id % 2 = 1
        GROUP BY 1, 2, 3
    ), ranked AS (
        SELECT vec_id, true_label, c_label,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY d2 ASC, c_label ASC) AS rn
        FROM dist
    )
    SELECT CAST(true_label AS BIGINT) AS true_label,
           CAST(c_label AS BIGINT) AS pred_label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs
    FROM ranked WHERE rn = 1 GROUP BY 1, 2
"""


@query("sim_centroid_classify", oracle=_CENTROID_SQL)
def sim_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification of embeddings: train
    per-label centroids on even vec_ids, assign each held-out vector
    to the nearest centroid by squared L2, report the confusion
    matrix — the classical linear companion to sim_knn_classify (kNN
    pays a per-query corpus probe; Rocchio compresses each class to
    one vector, the shape production labelers actually deploy first).

    Exactness: centroids are decimal-contract per-dimension means;
    every squared distance is a DECIMAL SUM over per-dimension
    (x - m)^2 terms (identical IEEE inputs), so distances are
    order-independent and bit-identical — the argmin needs no
    quantization, just a label tie-break. The confusion matrix is
    exact counts.

    Scale: the long (vec, dim) layout makes the distance computation a
    dim-keyed join + (vec, label) aggregate — no array fold, no
    centroid collect; |labels| x dims centroid rows broadcast
    naturally. At 100 TB this is one wide aggregate and one
    |labels|-fanout join, both map-side combinable."""
    em = _t(spark, sf_dir, "embeddings")["embeddings"]
    dims = em.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "xf"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = (
        dims.filter(F.col("vec_id") % 2 == 0)
        .groupBy(F.col("label").alias("c_label"), "dim")
        .agg((dsum("x") / F.count("x")).alias("m"))
        .transform(cut_lineage)
    )
    dist = (
        dims.filter(F.col("vec_id") % 2 == 1)
        .join(F.broadcast(cent), "dim")
        .groupBy(
            "vec_id", F.col("label").alias("true_label"), "c_label"
        )
        .agg(
            dsum(
                (F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))
            ).alias("d2")
        )
    )
    w = W.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_label"))
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy(
            F.col("true_label").cast("bigint").alias("true_label"),
            F.col("c_label").cast("bigint").alias("pred_label"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )


# ---------------------------------------------------------------------------
# Slope One collaborative filtering with an RMSE backtest
# ---------------------------------------------------------------------------

_SLOPE1_SQL = f"""
    WITH ratings AS MATERIALIZED (
        SELECT o.o_custkey AS u, p.p_brand AS i,
               {dsum_expr('l.l_extendedprice')} / COUNT(l.l_extendedprice)
                   AS r
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    ), split AS MATERIALIZED (
        SELECT u, i, r,
               ({accept_hash_sql("u * 100 + CAST(SUBSTR(i, 7) AS BIGINT)")}
                % 5 = 0) AS is_test
        FROM ratings
    ), train AS MATERIALIZED (
        SELECT u, i, r FROM split WHERE NOT is_test
    ), dev AS MATERIALIZED (
        SELECT a.i AS i1, b.i AS i2, CAST(COUNT(*) AS BIGINT) AS n_ij,
               {dsum_expr('a.r - b.r')} AS sdiff
        FROM train a JOIN train b ON a.u = b.u AND a.i <> b.i
        GROUP BY 1, 2
    ), preds AS (
        SELECT t.u, t.i, t.r AS actual,
               {dsum_expr('(d.sdiff / CAST(d.n_ij AS DOUBLE)'
                          ' + j.r) * d.n_ij')}
                   / CAST(SUM(d.n_ij) AS DOUBLE) AS pred
        FROM split t
        JOIN train j ON j.u = t.u
        JOIN dev d ON d.i1 = t.i AND d.i2 = j.i
        WHERE t.is_test
        GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
           FLOOR(SQRT({dsum_expr('(pred - actual) * (pred - actual)')}
                      / COUNT(*)) * 1e6 + 0.5) / 1e6 AS rmse,
           FLOOR({dsum_expr('ABS(pred - actual)')} / COUNT(*)
                 * 1e6 + 0.5) / 1e6 AS mae
    FROM preds
"""


@query("rec_slope_one", oracle=_SLOPE1_SQL)
def rec_slope_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slope One collaborative filtering: learn the per-item-pair
    average rating deviation on a hash-split train set, predict each
    held-out (customer, brand) rating as the support-weighted average
    of (deviation + that user's other ratings), and report RMSE/MAE —
    the deviation-based CF family next to rec_user_cf_topk's
    neighborhood model (Slope One has no neighborhood search, just one
    item-pair aggregate, which is why it scales embarrassingly).

    Exactness: ratings are decimal-contract means; the deviation
    matrix sums go through the decimal contract over exact co-rating
    counts; predictions decimal-sum the weighted terms per test pair;
    RMSE/MAE use decimal sums of identical IEEE residuals with one
    SQRT, quantized at 1e-6. The train/test split is a portable
    integer hash.

    Scale: the co-rating self-join is user-keyed with per-user fanout
    bounded by items-per-user (brands: <= 25), and the deviation
    matrix is |items|^2-bounded — the published Slope One trade.
    Prediction is two key joins against distributed tables; nothing
    ships to the driver."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    o = _t(spark, sf_dir, "orders")["orders"]
    p = _t(spark, sf_dir, "part")["part"]
    ratings = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.col("o_custkey").alias("u"), F.col("p_brand").alias("i"))
        .agg(
            (dsum("l_extendedprice") / F.count("l_extendedprice")).alias("r")
        )
        .transform(cut_lineage)
    )
    split = ratings.withColumn(
        "is_test",
        accept_hash(
            F.col("u") * 100 + F.substring("i", 7, 10).cast("bigint")
        )
        % 5
        == 0,
    ).transform(cut_lineage)
    # the per-user co-rating explosion (<= items-per-user^2 rows each)
    # runs in the post-join stage, which AQE coalesces to 1-2 tasks at
    # this input size — fan the train split out on the user key so both
    # self-join sides co-partition (guide §2.2; layout-gated no-op on a
    # lake) and hash-join instead of sort-merge
    from es_analytics_spark.functions.fanout import fan_out

    train = fan_out(
        split.filter(~F.col("is_test")).select("u", "i", "r"),
        sf_dir,
        "lineitem",
        "u",
        weight=4,
    )
    a = train.select(
        F.col("u"), F.col("i").alias("i1"), F.col("r").alias("r1")
    )
    b = train.select(
        F.col("u"), F.col("i").alias("i2"), F.col("r").alias("r2")
    )
    dev = (
        a.hint("shuffle_hash")
        .join(b, ["u"])
        .filter(F.col("i1") != F.col("i2"))
        .groupBy("i1", "i2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ij"),
            dsum(F.col("r1") - F.col("r2")).alias("sdiff"),
        )
        .transform(cut_lineage)
    )
    test = split.filter(F.col("is_test")).select(
        "u", "i", F.col("r").alias("actual")
    )
    j = train.select("u", F.col("i").alias("ij"), F.col("r").alias("rj"))
    # the deviation matrix is |brands|^2-bounded (~625 rows at ANY
    # scale factor — brands are a fixed 25-value domain), so broadcast
    # it unconditionally: the test-expansion frame is never exchanged
    # for the deviation lookup (guide §3.1)
    preds = (
        test.join(j, "u")
        .join(
            F.broadcast(dev),
            (F.col("i1") == F.col("i")) & (F.col("i2") == F.col("ij")),
        )
        .groupBy("u", "i", "actual")
        .agg(
            (
                dsum(
                    (
                        F.col("sdiff") / F.col("n_ij").cast("double")
                        + F.col("rj")
                    )
                    * F.col("n_ij")
                )
                / F.sum("n_ij").cast("double")
            ).alias("pred")
        )
    )
    resid = F.col("pred") - F.col("actual")
    return preds.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scored"),
        _q6(F.sqrt(dsum(resid * resid) / F.count(F.lit(1)))).alias("rmse"),
        _q6(dsum(F.abs(resid)) / F.count(F.lit(1))).alias("mae"),
    )
