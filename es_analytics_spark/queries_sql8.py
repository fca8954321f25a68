"""Round-5 batch-7 surface: Kendall tau-b rank concordance, Adamic-Adar
link prediction, a PII exposure screen, ranking-quality backtests
(NDCG@10 / MRR / hit rate and exact average precision), and
second-order Markov context analysis.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, integer fixed-point
intermediates, or single-op IEEE chains parenthesized identically in
both engines. Natural-log terms follow the catalog's LN precedent
(text_zipf_exponent, text_conditional_entropy): libm/JVM log agree
bitwise on these inputs and every ln-derived term is quantized to an
integer before any multi-row summation.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.queries import _t, query


# ---------------------------------------------------------------------------
# Kendall tau-b rank concordance over the (size, price-band) contingency
# ---------------------------------------------------------------------------

_KT_BAND = 1_000  # cents per price band ($10) — bounds the cell grid


_KENDALL_SQL = f"""
    WITH pts AS (
        SELECT CAST(p_size AS BIGINT) AS x,
               CAST(FLOOR(FLOOR(p_retailprice * 100 + 0.5) / {_KT_BAND}) AS BIGINT)
                   AS yb
        FROM part
    ), cells AS (
        SELECT x, yb, COUNT(*) AS c FROM pts GROUP BY x, yb
    ), pq AS (
        SELECT
            CAST(COALESCE(SUM(CASE WHEN b.yb > a.yb THEN a.c * b.c END), 0)
                 AS BIGINT) AS p_conc,
            CAST(COALESCE(SUM(CASE WHEN b.yb < a.yb THEN a.c * b.c END), 0)
                 AS BIGINT) AS q_disc
        FROM cells a JOIN cells b ON b.x > a.x
    ), tx AS (
        SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n1
        FROM (SELECT SUM(c) AS t FROM cells GROUP BY x)
    ), ty AS (
        SELECT CAST(SUM(t * (t - 1) // 2) AS BIGINT) AS n2
        FROM (SELECT SUM(c) AS t FROM cells GROUP BY yb)
    ), nn AS (
        SELECT COUNT(*) AS n, CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS n0
        FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n, p_conc AS concordant, q_disc AS discordant,
           FLOOR(CAST(p_conc - q_disc AS DOUBLE)
                 / (SQRT(CAST(n0 - n1 AS DOUBLE)) * SQRT(CAST(n0 - n2 AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS tau_b
    FROM pq CROSS JOIN tx CROSS JOIN ty CROSS JOIN nn
"""


@query("stat_kendall_tau", oracle=_KENDALL_SQL)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank concordance between part size and retail
    price band — the pair-counting companion to stat_spearman: tau
    reads directly as P(concordant) - P(discordant), is even more
    outlier-proof, and tau-b's denominator corrects for ties on both
    margins.

    Exactness: concordant/discordant pair counts are exact BIGINT
    products over the (size, $10-band) contingency cells; the tie
    terms n1/n2 and n0 = n(n-1)/2 are exact integers; tau-b is one
    division over a product of two correctly rounded sqrts, quantized
    at 1e-6.

    Scale: the O(n^2) pair space collapses to cell-pair space — cells
    are bounded by |sizes| x |price bands| (a data-independent
    constant grid), so the inequality self-join is a broadcast
    nested-loop over a tiny frame no matter the row count; everything
    upstream is one map-side-combinable groupBy.
    """
    p = _t(spark, sf_dir, "part")["part"]
    pts = p.select(
        F.col("p_size").cast("long").alias("x"),
        F.floor(
            F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)) / F.lit(_KT_BAND)
        )
        .cast("long")
        .alias("yb"),
    )
    cells = pts.groupBy("x", "yb").agg(F.count(F.lit(1)).alias("c"))
    a, b = cells.alias("a"), cells.alias("b")
    pq = (
        a.join(F.broadcast(b), F.col("b.x") > F.col("a.x"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("b.yb") > F.col("a.yb"), F.col("a.c") * F.col("b.c")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("p_conc"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("b.yb") < F.col("a.yb"), F.col("a.c") * F.col("b.c")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("q_disc"),
        )
    )
    tx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("n1"))
    )
    ty = (
        cells.groupBy("yb")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.expr("t * (t - 1) div 2")).cast("long").alias("n2"))
    )
    nn = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("count(1) * (count(1) - 1) div 2").cast("long").alias("n0"),
    )
    j = (
        pq.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(nn))
    )
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("p_conc").alias("concordant"),
        F.col("q_disc").alias("discordant"),
        (
            F.floor(
                (F.col("p_conc") - F.col("q_disc")).cast("double")
                / (
                    F.sqrt((F.col("n0") - F.col("n1")).cast("double"))
                    * F.sqrt((F.col("n0") - F.col("n2")).cast("double"))
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction on the co-supply graph
# ---------------------------------------------------------------------------

_AA_FP = 1_000_000_000  # 1e9 fixed-point scale for 1/ln(degree)


def _aa_sql() -> str:
    from es_analytics_spark.queries_sql4 import _EDGES_CTE

    return f"""
    WITH {_EDGES_CTE},
    adj AS (
        SELECT u AS w, v AS nb FROM edges
        UNION ALL
        SELECT v AS w, u AS nb FROM edges
    ), adj_w AS (
        SELECT a.w, a.nb,
               CASE WHEN d.d >= 2
                    THEN CAST(FLOOR({_AA_FP} / LN(CAST(d.d AS DOUBLE)) + 0.5)
                              AS BIGINT)
                    ELSE 0 END AS contrib
        FROM adj a JOIN deg d ON d.node = a.w
    ), scored AS (
        SELECT a.nb AS u, b.nb AS v, COUNT(*) AS common_neighbors,
               CAST(SUM(a.contrib) AS BIGINT) AS aa_score_fp
        FROM adj_w a JOIN adj_w b ON a.w = b.w AND a.nb < b.nb
        GROUP BY a.nb, b.nb
    )
    SELECT s.u, s.v, s.common_neighbors, s.aa_score_fp
    FROM scored s
    LEFT JOIN edges e ON e.u = s.u AND e.v = s.v
    WHERE e.u IS NULL
    ORDER BY s.aa_score_fp DESC, s.u ASC, s.v ASC LIMIT 20
"""


@query("graph_adamic_adar", oracle=_aa_sql())
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction: top-20 non-adjacent supplier pairs
    by sum of 1/ln(degree) over common neighbors — the logarithmic
    damping variant beside graph_link_predict's Resource-Allocation
    index (1/d). AA penalizes hub neighbors more gently, so comparing
    the two rankings is itself a robustness check on "who should be
    connected".

    Exactness: each center's 1/ln(d) is quantized to a 1e9 fixed-point
    integer BEFORE the per-pair summation (ln itself follows the
    catalog LN precedent; centers with d < 2 contribute 0 and cannot
    be wedge centers anyway), so scores sum and rank exactly.

    Scale: identical shape to graph_link_predict — the fixed-point
    contribution attaches to the 2|E| adjacency rows, the wedge
    self-join on the center emits each common-neighbor pair once, one
    shuffle on the center + one on (u, v), edge-sized anti-join,
    TakeOrdered top-20.
    """
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    edges = _co_supply_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    adj = edges.select(F.col("u").alias("w"), F.col("v").alias("nb")).unionAll(
        edges.select(F.col("v").alias("w"), F.col("u").alias("nb"))
    )
    adj_w = adj.join(
        F.broadcast(deg.withColumnRenamed("node", "w")), "w"
    ).withColumn(
        "contrib",
        F.when(
            F.col("d") >= 2,
            F.floor(F.lit(_AA_FP) / F.log(F.col("d").cast("double")) + F.lit(0.5))
            .cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    a, b = adj_w.alias("a"), adj_w.alias("b")
    scored = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.nb") < F.col("b.nb")))
        .select(
            F.col("a.nb").alias("u"),
            F.col("b.nb").alias("v"),
            F.col("a.contrib").alias("contrib"),
        )
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("contrib").cast("bigint").alias("aa_score_fp"),
        )
    )
    return (
        scored.join(edges, ["u", "v"], "left_anti")
        .orderBy(F.col("aa_score_fp").desc(), F.col("u").asc(), F.col("v").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# PII exposure screen over the documents corpus
# ---------------------------------------------------------------------------

# Patterns deliberately use only [...] classes, literals, and {m,n}
# quantifiers — the regex subset on which Java regex (Spark) and RE2
# (DuckDB) agree exactly.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
_PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
_PII_PHONE = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
_PII_DIGITRUN = "[0-9]{13,19}"


_PII_SQL = f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN REGEXP_MATCHES(text, '{_PII_EMAIL}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS email_docs,
           CAST(SUM(CASE WHEN REGEXP_MATCHES(text, '{_PII_IPV4}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS ipv4_docs,
           CAST(SUM(CASE WHEN REGEXP_MATCHES(text, '{_PII_PHONE}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS phone_docs,
           CAST(SUM(CASE WHEN REGEXP_MATCHES(text, '{_PII_DIGITRUN}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS digitrun_docs,
           FLOOR(CAST(SUM(CASE WHEN REGEXP_MATCHES(text, '{_PII_EMAIL}')
                              OR REGEXP_MATCHES(text, '{_PII_IPV4}')
                              OR REGEXP_MATCHES(text, '{_PII_PHONE}')
                              OR REGEXP_MATCHES(text, '{_PII_DIGITRUN}')
                         THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS any_pii_share
    FROM documents
    GROUP BY source
"""


@query("text_pii_screen", oracle=_PII_SQL)
def text_pii_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure screen per corpus source: documents matching
    email, IPv4, phone-number, and long-digit-run (card/account-like)
    patterns, plus the any-PII share — the governance gate a training
    corpus passes BEFORE tokenization (the redaction twin of the
    erase_keys right-to-be-forgotten path; this finds what that must
    then remove).

    Patterns restrict themselves to the regex subset where Java regex
    and RE2 agree exactly (character classes, literals, bounded
    quantifiers — no \\b, \\d, or backrefs), so the per-doc match
    verdicts — and therefore all counts — are engine-independent.

    Scale: pure per-row predicate evaluation inside whole-stage
    codegen + one |sources|-key map-side-combinable groupBy. Regex
    cost is the scan cost; nothing shuffles but the tiny aggregate.
    """
    d = _t(spark, sf_dir, "documents")["documents"]
    m_email = F.col("text").rlike(_PII_EMAIL)
    m_ip = F.col("text").rlike(_PII_IPV4)
    m_phone = F.col("text").rlike(_PII_PHONE)
    m_run = F.col("text").rlike(_PII_DIGITRUN)
    cnt = lambda m: F.sum(F.when(m, 1).otherwise(0)).cast("long")  # noqa: E731
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        cnt(m_email).alias("email_docs"),
        cnt(m_ip).alias("ipv4_docs"),
        cnt(m_phone).alias("phone_docs"),
        cnt(m_run).alias("digitrun_docs"),
        (
            F.floor(
                F.sum(
                    F.when(m_email | m_ip | m_phone | m_run, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("any_pii_share"),
    )


# ---------------------------------------------------------------------------
# NDCG@10 / MRR / hit-rate backtest of the popularity ranker
# ---------------------------------------------------------------------------

_NDCG_K = 10
_NDCG_SPLIT = "1999-01-01"
# 1/log2(i+1) discount constants, 1e6 fixed-point, computed ONCE here in
# Python and embedded as literals in BOTH engines — no runtime log2, so
# no cross-engine transcendental risk; prefix sums give ideal DCG.
_DISC_FP = tuple(round(1 / math.log2(i + 1) * 1e6) for i in range(1, _NDCG_K + 1))
_IDCG_FP = tuple(
    sum(_DISC_FP[: i + 1]) for i in range(_NDCG_K)
)  # idcg for 1..K relevant items


def _ndcg_sql() -> str:
    disc_rows = ", ".join(f"({i + 1}, {d})" for i, d in enumerate(_DISC_FP))
    idcg_rows = ", ".join(f"({i + 1}, {d})" for i, d in enumerate(_IDCG_FP))
    return f"""
    WITH disc(rnk, d_fp) AS (VALUES {disc_rows}),
    idcg(nrel, i_fp) AS (VALUES {idcg_rows}),
    li_o AS (
        SELECT l_partkey AS pk, o_custkey AS ck, o_orderdate AS dt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), top10 AS (
        SELECT pk, ROW_NUMBER() OVER (ORDER BY cnt DESC, pk ASC) AS rnk
        FROM (SELECT pk, COUNT(*) AS cnt FROM li_o
              WHERE dt < TIMESTAMP '{_NDCG_SPLIT}' GROUP BY pk)
        QUALIFY rnk <= {_NDCG_K}
    ), test AS (
        SELECT DISTINCT ck, pk FROM li_o WHERE dt >= TIMESTAMP '{_NDCG_SPLIT}'
    ), peruser AS (
        SELECT t.ck,
               COUNT(tp.pk) AS hits,
               CAST(COALESCE(SUM(d.d_fp), 0) AS BIGINT) AS dcg_fp,
               MIN(tp.rnk) AS first_rank,
               COUNT(*) AS nrel
        FROM test t
        LEFT JOIN top10 tp ON t.pk = tp.pk
        LEFT JOIN disc d ON d.rnk = tp.rnk
        GROUP BY t.ck
    ), scored AS (
        SELECT p.ck, p.hits,
               CAST(FLOOR(CAST(p.dcg_fp AS DOUBLE) / CAST(i.i_fp AS DOUBLE)
                          * 1e6 + 0.5) AS BIGINT) AS ndcg_fp,
               CASE WHEN p.first_rank IS NOT NULL
                    THEN CAST(FLOOR(1e6 / CAST(p.first_rank AS DOUBLE) + 0.5)
                              AS BIGINT)
                    ELSE 0 END AS rr_fp
        FROM peruser p
        JOIN idcg i ON i.nrel = LEAST(p.nrel, {_NDCG_K})
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_hit,
           FLOOR(CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS hit_rate,
           FLOOR(CAST(SUM(ndcg_fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5)
               / 1e6 AS mean_ndcg,
           FLOOR(CAST(SUM(rr_fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5)
               / 1e6 AS mrr
    FROM scored
"""


@query("ml_ndcg_at_k", oracle=_ndcg_sql())
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal backtest of the popularity ranker: rank the top-10
    parts by pre-1999 purchase count, score them against each
    customer's post-split purchases with NDCG@10, MRR, and hit rate —
    the offline ranking-evaluation trio (rec_user_cf_topk produces
    rankings; this is how you'd know whether to ship them, with
    popularity as the canonical baseline to beat).

    Exactness: the 1/log2(i+1) discounts and their ideal-DCG prefix
    sums are Python-computed 1e6 fixed-point literals embedded in both
    engines — no runtime transcendentals; per-user NDCG and reciprocal
    rank are single correctly rounded divisions over those integers,
    re-quantized before the final exact integer sums.

    Scale: the ranked list is K rows (rank via a K^2 broadcast
    triangle join, window-free); relevance joins broadcast it against
    the distinct test (user, item) frame; one user-keyed groupBy and a
    final reduction. The train-side top-K is a TakeOrdered over the
    part-count aggregate.
    """
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    o = _t(spark, sf_dir, "orders")["orders"]
    split = F.lit(_NDCG_SPLIT).cast("timestamp")
    li_o = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("l_partkey").alias("pk"),
        F.col("o_custkey").alias("ck"),
        F.col("o_orderdate").alias("dt"),
    )
    pop = (
        li_o.filter(F.col("dt") < split)
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("pk").asc())
        .limit(_NDCG_K)
    )
    # window-free rank over the K-row frame: broadcast triangle join
    a, b = pop.alias("a"), pop.alias("b")
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("b.cnt") > F.col("a.cnt"))
            | ((F.col("b.cnt") == F.col("a.cnt")) & (F.col("b.pk") < F.col("a.pk"))),
            "left",
        )
        .groupBy(F.col("a.pk").alias("pk"))
        .agg((F.count(F.col("b.pk")) + 1).cast("int").alias("rnk"))
    )
    disc_arr = F.array(*[F.lit(d) for d in _DISC_FP])
    idcg_arr = F.array(*[F.lit(d) for d in _IDCG_FP])
    ranked = ranked.withColumn("d_fp", F.element_at(disc_arr, F.col("rnk")))
    test = li_o.filter(F.col("dt") >= split).select("ck", "pk").distinct()
    peruser = (
        test.join(F.broadcast(ranked), "pk", "left")
        .groupBy("ck")
        .agg(
            F.count("rnk").alias("hits"),
            F.coalesce(F.sum("d_fp"), F.lit(0)).cast("long").alias("dcg_fp"),
            F.min("rnk").alias("first_rank"),
            F.count(F.lit(1)).alias("nrel"),
        )
    )
    scored = peruser.select(
        "hits",
        F.floor(
            F.col("dcg_fp").cast("double")
            / F.element_at(idcg_arr, F.least(F.col("nrel"), F.lit(_NDCG_K)).cast("int"))
            .cast("double")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("ndcg_fp"),
        F.when(
            F.col("first_rank").isNotNull(),
            F.floor(F.lit(1e6) / F.col("first_rank").cast("double") + F.lit(0.5))
            .cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("rr_fp"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).cast("long").alias("users_hit"),
        (
            F.floor(
                F.sum(F.when(F.col("hits") > 0, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("hit_rate"),
        (
            F.floor(
                F.sum("ndcg_fp").cast("double") / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            )
            / 1e6
        ).alias("mean_ndcg"),
        (
            F.floor(
                F.sum("rr_fp").cast("double") / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            )
            / 1e6
        ).alias("mrr"),
    )


# ---------------------------------------------------------------------------
# Exact average precision (area under the PR curve) of a score column
# ---------------------------------------------------------------------------

_AP_SQL = """
    WITH pts AS (
        SELECT c_custkey,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS score,
               CASE WHEN c_custkey IN (
                   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
               ) THEN 1 ELSE 0 END AS label
        FROM customer
    ), ranked AS (
        SELECT label,
               ROW_NUMBER() OVER (ORDER BY score DESC, c_custkey ASC) AS rnk,
               SUM(label) OVER (ORDER BY score DESC, c_custkey ASC
                                ROWS UNBOUNDED PRECEDING) AS cum_pos
        FROM pts
    ), terms AS (
        SELECT CAST(FLOOR(CAST(cum_pos AS DOUBLE) / CAST(rnk AS DOUBLE)
                          * 1e6 + 0.5) AS BIGINT) AS term_fp
        FROM ranked WHERE label = 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pts) AS n,
           (SELECT CAST(SUM(label) AS BIGINT) FROM pts) AS n_pos,
           FLOOR(CAST(SUM(term_fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) + 0.5)
               / 1e6 AS average_precision
    FROM terms
"""


@query("ml_average_precision", oracle=_AP_SQL)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (area under the precision-recall curve)
    of account balance as a predictor of having a finalized order —
    the class-imbalance-honest companion to ml_auc_score: AUC-ROC
    rewards ranking negatives low, AP only rewards putting positives
    on top, which is what retrieval and alert triage actually pay for.

    The tie-break (score DESC, custkey ASC) makes the ranking a total
    order, so precision@k at every positive is an exact rational;
    each term is one correctly rounded division quantized at 1e-6,
    then summed and averaged as exact integers.

    Scale: the global rank and cumulative-positive prefix both come
    from the window-free recipe (range partition by (score desc, key),
    per-partition running sums + broadcast triangle offsets for row
    count AND positive count) — no Exchange SinglePartition anywhere;
    the final AP is a one-row reduction.
    """
    from es_analytics_spark.functions.lineage import cut_lineage
    from es_analytics_spark.functions.ranks import cumulative_offsets

    c = _t(spark, sf_dir, "customer")["customer"]
    o = _t(spark, sf_dir, "orders")["orders"]
    fcust = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("is_pos", F.lit(1))
    )
    pts = (
        c.join(fcust, "c_custkey", "left")
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("score"),
            F.coalesce(F.col("is_pos"), F.lit(0)).alias("label"),
        )
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        pts.repartitionByRange(n_parts, F.desc("score"), F.asc("c_custkey"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    w = (
        W.partitionBy("pid")
        .orderBy(F.desc("score"), F.asc("c_custkey"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = ranged.select(
        "label",
        "pid",
        F.count(F.lit(1)).over(w).alias("rn_local"),
        F.sum("label").over(w).alias("cum_local"),
    )
    cnts = ranged.groupBy("pid").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("label").alias("n_pos_pid")
    )
    off_rows = cumulative_offsets(cnts.select("pid", "n_rows"), cnt="n_rows")
    off_pos = cumulative_offsets(
        cnts.select("pid", "n_pos_pid"), cnt="n_pos_pid"
    ).withColumnRenamed("off", "off_pos")
    terms = (
        local.join(F.broadcast(off_rows), "pid")
        .join(F.broadcast(off_pos), "pid")
        .filter(F.col("label") == 1)
        .select(
            F.floor(
                (F.col("cum_local") + F.col("off_pos")).cast("double")
                / (F.col("rn_local") + F.col("off")).cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_fp")
        )
    )
    tot = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    return (
        terms.agg(
            F.sum("term_fp").alias("s"), F.count(F.lit(1)).alias("np")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_pos",
            (
                F.floor(
                    F.col("s").cast("double") / F.col("np").cast("double") + F.lit(0.5)
                )
                / 1e6
            ).alias("average_precision"),
        )
    )


# ---------------------------------------------------------------------------
# Second-order Markov contexts: transitions + conditional entropy
# ---------------------------------------------------------------------------

_MARKOV2_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type, 1) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev1,
               LAG(event_type, 2) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev2
        FROM events
    ), tri AS (
        SELECT prev2, prev1, event_type AS next_type, COUNT(*) AS c
        FROM seq WHERE prev2 IS NOT NULL
        GROUP BY prev2, prev1, event_type
    ), ctx AS (
        SELECT prev2, prev1,
               CAST(SUM(c) AS BIGINT) AS n_transitions,
               CAST(SUM(CAST(FLOOR(c * LN(CAST(c AS DOUBLE)) * 1e6 + 0.5)
                             AS BIGINT)) AS BIGINT) AS clnc_fp
        FROM tri GROUP BY prev2, prev1
    ), top AS (
        SELECT prev2, prev1, next_type, c,
               ROW_NUMBER() OVER (PARTITION BY prev2, prev1
                                  ORDER BY c DESC, next_type ASC) AS rn
        FROM tri
    )
    SELECT x.prev2, x.prev1, x.n_transitions,
           t.next_type AS top_next,
           FLOOR(CAST(t.c AS DOUBLE) / CAST(x.n_transitions AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS top_share,
           FLOOR((LN(CAST(x.n_transitions AS DOUBLE))
                  - ((CAST(x.clnc_fp AS DOUBLE) / 1e6)
                     / CAST(x.n_transitions AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS entropy_nats
    FROM ctx x JOIN top t
      ON t.prev2 = x.prev2 AND t.prev1 = x.prev1 AND t.rn = 1
"""


@query("seq_markov2", oracle=_MARKOV2_SQL)
def seq_markov2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order Markov analysis of event streams: for every
    (prev2, prev1) context, the transition mass, the most likely next
    event, and the conditional entropy H(next | context) in nats —
    does knowing TWO steps of history beat ts_markov_transitions'
    one-step model? Low-entropy contexts are scripted flows (or bots);
    high-entropy contexts are genuine choice points.

    Exactness: counts are exact; each c*ln(c) term is quantized to a
    1e6 fixed-point integer BEFORE summation (the catalog's entropy
    contract — no order-dependent float accumulation), and the final
    entropy is a short identically parenthesized IEEE chain.

    Scale: per-user lag windows (hash-partitioned by user, never
    single-partition), one groupBy to the |event_types|^3 transition
    grain (125 cells), and windows/joins over that bounded grain only.
    """
    ev = _t(spark, sf_dir, "events")["events"]
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(wseq).alias("prev1"),
        F.lag("event_type", 2).over(wseq).alias("prev2"),
    ).filter(F.col("prev2").isNotNull())
    tri = seq.groupBy("prev2", "prev1", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("c")
    )
    ctx = tri.groupBy("prev2", "prev1").agg(
        F.sum("c").cast("long").alias("n_transitions"),
        F.sum(
            F.floor(
                F.col("c") * F.log(F.col("c").cast("double")) * F.lit(1e6) + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("clnc_fp"),
    )
    wtop = W.partitionBy("prev2", "prev1").orderBy(
        F.col("c").desc(), F.col("next_type").asc()
    )
    top = (
        tri.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") == 1)
        .select("prev2", "prev1", "next_type", "c")
    )
    return ctx.join(top, ["prev2", "prev1"]).select(
        "prev2",
        "prev1",
        "n_transitions",
        F.col("next_type").alias("top_next"),
        (
            F.floor(
                F.col("c").cast("double")
                / F.col("n_transitions").cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("top_share"),
        (
            F.floor(
                (
                    F.log(F.col("n_transitions").cast("double"))
                    - (
                        (F.col("clnc_fp").cast("double") / F.lit(1e6))
                        / F.col("n_transitions").cast("double")
                    )
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("entropy_nats"),
    )
