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
    # wedge treatment (the graph_jaccard_neighbors batch): center-keyed
    # fan-out, shuffle_hash, packed-bigint partial aggregate, and a
    # broadcast anti-join probe — all layout-gated
    from es_analytics_spark.functions.fanout import broadcast_if_small, fan_out

    adj_w = fan_out(adj_w, sf_dir, "lineitem", "w", weight=8)
    a, b = adj_w.alias("a"), adj_w.alias("b")
    scored = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.nb") < F.col("b.nb")))
        .select(
            (F.shiftleft(F.col("a.nb"), 32) + F.col("b.nb")).alias("uv"),
            F.col("a.contrib").alias("contrib"),
        )
        .groupBy("uv")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("contrib").cast("bigint").alias("aa_score_fp"),
        )
        .select(
            F.shiftright("uv", 32).alias("u"),
            (F.col("uv") - F.shiftleft(F.shiftright("uv", 32), 32)).alias("v"),
            "common_neighbors",
            "aa_score_fp",
        )
    )
    return (
        scored.join(broadcast_if_small(edges, sf_dir, "lineitem"), ["u", "v"], "left_anti")
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


# ---------------------------------------------------------------------------
# Decision-stump (one-split) feature importance screen
# ---------------------------------------------------------------------------

_STUMP_BAND = 100_000  # cents per acctbal band ($1000) — bounds that feature


_STUMP_SQL = f"""
    WITH base AS (
        SELECT c_custkey,
               c_mktsegment AS seg,
               CAST(c_nationkey AS BIGINT) AS nat,
               CAST(FLOOR(FLOOR(c_acctbal * 100 + 0.5) / {_STUMP_BAND}) AS BIGINT)
                   AS bal_band,
               CASE WHEN c_custkey IN (
                   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
               ) THEN 1 ELSE 0 END AS label
        FROM customer
    ), parent AS (
        SELECT COUNT(*) AS n, CAST(SUM(label) AS BIGINT) AS pos FROM base
    ), pg AS (
        SELECT n,
               FLOOR((CAST(n * n - pos * pos - (n - pos) * (n - pos) AS DOUBLE)
                      / CAST(n * n AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS gini_parent
        FROM parent
    ), splits AS (
        SELECT 'mktsegment' AS feature, CAST(seg AS VARCHAR) AS v,
               COUNT(*) AS nv, CAST(SUM(label) AS BIGINT) AS pv
        FROM base GROUP BY seg
        UNION ALL
        SELECT 'nationkey', CAST(nat AS VARCHAR), COUNT(*), CAST(SUM(label) AS BIGINT)
        FROM base GROUP BY nat
        UNION ALL
        SELECT 'acctbal_band', CAST(bal_band AS VARCHAR), COUNT(*),
               CAST(SUM(label) AS BIGINT)
        FROM base GROUP BY bal_band
    ), terms AS (
        SELECT s.feature,
               CAST(FLOOR((CAST(s.nv * s.nv - s.pv * s.pv
                                - (s.nv - s.pv) * (s.nv - s.pv) AS DOUBLE)
                           / (CAST(s.nv AS DOUBLE) * CAST(p.n AS DOUBLE)))
                          * 1e9 + 0.5) AS BIGINT) AS term_fp
        FROM splits s CROSS JOIN parent p
    ), agg AS (
        SELECT feature, COUNT(*) AS n_values,
               CAST(SUM(term_fp) AS BIGINT) AS gini_split_fp
        FROM terms GROUP BY feature
    )
    SELECT a.feature, CAST(a.n_values AS BIGINT) AS n_values,
           g.gini_parent,
           a.gini_split_fp / 1e9 AS gini_split,
           FLOOR((g.gini_parent - a.gini_split_fp / 1e9) * 1e9 + 0.5) / 1e9
               AS importance
    FROM agg a CROSS JOIN pg g
"""


@query("ml_stump_importance", oracle=_STUMP_SQL)
def ml_stump_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump feature importance: for each candidate feature
    (market segment, nation, $1000 account-balance band), the Gini
    impurity reduction of a one-level multi-way split predicting
    "customer has a finalized order" — the five-minute feature screen
    that says which columns a model (or a targeting rule) should even
    look at, the categorical companion to ml_mutual_information.

    Exactness: parent and per-value Gini terms are single correctly
    rounded divisions over exact BIGINT count squares ((n² - pos² -
    neg²)/n²), each quantized at 1e-9 before summation — no float
    accumulation anywhere.

    Scale: three map-side-combinable groupBys over bounded value sets
    (5 segments, 25 nations, ~11 bands) unioned into one frame, plus
    a one-row broadcast parent. The label derivation is one semi-join
    on the customer key.
    """
    c = _t(spark, sf_dir, "customer")["customer"]
    o = _t(spark, sf_dir, "orders")["orders"]
    fcust = (
        o.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("is_pos", F.lit(1))
    )
    base = c.join(fcust, "c_custkey", "left").select(
        F.col("c_mktsegment").alias("seg"),
        F.col("c_nationkey").cast("long").alias("nat"),
        F.floor(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)) / F.lit(_STUMP_BAND)
        )
        .cast("long")
        .alias("bal_band"),
        F.coalesce(F.col("is_pos"), F.lit(0)).alias("label"),
    )
    parent = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("label").cast("long").alias("pos")
    )

    def _split(colname: str, feature: str) -> DataFrame:
        return base.groupBy(F.col(colname).cast("string").alias("v")).agg(
            F.count(F.lit(1)).alias("nv"), F.sum("label").cast("long").alias("pv")
        ).select(F.lit(feature).alias("feature"), "v", "nv", "pv")

    splits = (
        _split("seg", "mktsegment")
        .unionAll(_split("nat", "nationkey"))
        .unionAll(_split("bal_band", "acctbal_band"))
    )
    nv, pv, n = F.col("nv"), F.col("pv"), F.col("n")
    terms = splits.crossJoin(F.broadcast(parent)).select(
        "feature",
        F.floor(
            (nv * nv - pv * pv - (nv - pv) * (nv - pv)).cast("double")
            / (nv.cast("double") * n.cast("double"))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("term_fp"),
    )
    agg = terms.groupBy("feature").agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.sum("term_fp").cast("long").alias("gini_split_fp"),
    )
    pos = F.col("pos")
    pg = parent.select(
        "n",
        (
            F.floor(
                (n * n - pos * pos - (n - pos) * (n - pos)).cast("double")
                / (n * n).cast("double")
                * F.lit(1e9)
                + F.lit(0.5)
            )
            / 1e9
        ).alias("gini_parent"),
    )
    return agg.crossJoin(F.broadcast(pg)).select(
        "feature",
        "n_values",
        "gini_parent",
        (F.col("gini_split_fp") / F.lit(1e9)).alias("gini_split"),
        (
            F.floor(
                (F.col("gini_parent") - F.col("gini_split_fp") / F.lit(1e9))
                * F.lit(1e9)
                + F.lit(0.5)
            )
            / 1e9
        ).alias("importance"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman supplier concentration per nation
# ---------------------------------------------------------------------------

from es_analytics_spark.functions.exact import dsum_expr  # noqa: E402


_HHI_SQL = f"""
    WITH rev AS (
        SELECT s_nationkey AS nat, l_suppkey AS sk,
               {dsum_expr('l_extendedprice * (1 - l_discount)')} AS r
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey, l_suppkey
    ), tot AS (
        SELECT nat, {dsum_expr('r')} AS rt, COUNT(*) AS n_suppliers
        FROM rev GROUP BY nat
    ), shares AS (
        SELECT r.nat,
               CAST(FLOOR(r.r / t.rt * 1e6 + 0.5) AS BIGINT) AS share_fp
        FROM rev r JOIN tot t ON r.nat = t.nat
    )
    SELECT CAST(s.nat AS BIGINT) AS nationkey,
           CAST(t.n_suppliers AS BIGINT) AS n_suppliers,
           FLOOR(CAST(MAX(s.share_fp) AS DOUBLE) / 1e2 + 0.5) / 1e4 AS top_share,
           FLOOR(CAST(SUM(s.share_fp * s.share_fp) AS DOUBLE) / 1e8 * 1e4 + 0.5)
               / 1e4 AS hhi,
           CAST(SUM(s.share_fp * s.share_fp) AS DOUBLE) / 1e8 * 1e4 > 2500
               AS concentrated
    FROM shares s JOIN tot t ON s.nat = t.nat
    GROUP BY s.nat, t.n_suppliers
"""


@query("agg_hhi_concentration", oracle=_HHI_SQL)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per nation:
    Σ share² over each supplier's revenue share, on the DOJ's 0-10000
    scale with the 2500 "highly concentrated" flag — the
    single-number market-structure readout beside
    agg_revenue_concentration's Gini/top-decile view (HHI weights the
    head quadratically, which is what antitrust and vendor-risk care
    about).

    Exactness: revenues use the decimal-sum contract; each share is
    one correctly rounded division quantized at 1e-6, and HHI sums
    exact BIGINT squares before a single final scaling chain.

    Scale: supplier-grain then nation-grain groupBys (both map-side
    combinable, nation keys bounded); the shares join is co-keyed on
    the nation aggregate.
    """
    from es_analytics_spark.functions.exact import dsum

    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    s = _t(spark, sf_dir, "supplier")["supplier"]
    rev = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_nationkey").alias("nat"), F.col("l_suppkey").alias("sk"))
        .agg(
            dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias(
                "r"
            )
        )
    )
    tot = rev.groupBy("nat").agg(
        dsum("r").alias("rt"), F.count(F.lit(1)).alias("n_suppliers")
    )
    shares = rev.join(tot, "nat").select(
        "nat",
        "n_suppliers",
        F.floor(F.col("r") / F.col("rt") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("share_fp"),
    )
    hhi_raw = F.sum(F.col("share_fp") * F.col("share_fp")).cast("double") / F.lit(
        1e8
    ) * F.lit(1e4)
    return shares.groupBy("nat", "n_suppliers").agg(
        (
            F.floor(F.max("share_fp").cast("double") / F.lit(1e2) + F.lit(0.5)) / 1e4
        ).alias("top_share"),
        (F.floor(hhi_raw + F.lit(0.5)) / 1e4).alias("hhi"),
        (hhi_raw > 2500).alias("concentrated"),
    ).select(
        F.col("nat").cast("long").alias("nationkey"),
        F.col("n_suppliers").cast("long").alias("n_suppliers"),
        "top_share",
        "hhi",
        "concentrated",
    )


# ---------------------------------------------------------------------------
# Theil inequality index with within/between-nation decomposition
# ---------------------------------------------------------------------------

_THEIL_SQL = f"""
    WITH x AS (
        SELECT o_custkey AS ck, c_nationkey AS nat,
               {dsum_expr('o_totalprice')} AS xv
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY o_custkey, c_nationkey
    ), tot AS (
        SELECT {dsum_expr('xv')} AS xs, COUNT(*) AS n FROM x
    ), terms AS (
        SELECT CAST(FLOOR((xv / t.xs)
                          * LN((xv * t.n) / t.xs) * 1e9 + 0.5) AS BIGINT) AS tfp
        FROM x CROSS JOIN tot AS t
    ), g AS (
        SELECT nat, {dsum_expr('xv')} AS xg, COUNT(*) AS ng FROM x GROUP BY nat
    ), bterms AS (
        SELECT CAST(FLOOR((g.xg / t.xs)
                          * LN((g.xg / t.xs) / (CAST(g.ng AS DOUBLE) / t.n))
                          * 1e9 + 0.5) AS BIGINT) AS tfp
        FROM g CROSS JOIN tot AS t
    )
    SELECT CAST(t.n AS BIGINT) AS n_customers,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS n_groups,
           (SELECT FLOOR(CAST(SUM(tfp) AS DOUBLE) / 1e3 + 0.5) / 1e6
            FROM terms) AS theil_total,
           (SELECT FLOOR(CAST(SUM(tfp) AS DOUBLE) / 1e3 + 0.5) / 1e6
            FROM bterms) AS theil_between,
           (SELECT FLOOR(CAST(SUM(tfp) AS DOUBLE) / 1e3 + 0.5) / 1e6 FROM terms)
               - (SELECT FLOOR(CAST(SUM(tfp) AS DOUBLE) / 1e3 + 0.5) / 1e6
                  FROM bterms) AS theil_within
    FROM tot t
"""


@query("agg_theil_index", oracle=_THEIL_SQL)
def agg_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of per-customer order revenue with the
    exact within/between-nation decomposition — the additive
    inequality measure Gini lacks: T = T_between + T_within tells you
    whether revenue concentration lives ACROSS markets or INSIDE them,
    which decides whether to rebalance geos or hunt whales.

    Exactness: revenues are decimal sums; each (x/X)·ln(nx/X) term
    (and each group term) is a short pinned IEEE chain quantized to a
    1e9 fixed-point integer before the exact sums; the within term is
    the literal difference of the two quantized aggregates, so the
    decomposition identity holds to the printed precision by
    construction.

    Scale: customer-grain then nation-grain groupBys, a one-row
    broadcast total, per-row term arithmetic in codegen, two one-row
    reductions. Nothing data-sized is ever windowed or broadcast.
    """
    from es_analytics_spark.functions.exact import dsum

    o = _t(spark, sf_dir, "orders")["orders"]
    c = _t(spark, sf_dir, "customer")["customer"]
    x = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("o_custkey").alias("ck"), F.col("c_nationkey").alias("nat"))
        .agg(dsum("o_totalprice").alias("xv"))
    )
    tot = x.agg(dsum("xv").alias("xs"), F.count(F.lit(1)).alias("n"))
    terms = x.crossJoin(F.broadcast(tot)).select(
        F.floor(
            (F.col("xv") / F.col("xs"))
            * F.log((F.col("xv") * F.col("n")) / F.col("xs"))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tfp")
    )
    g = x.groupBy("nat").agg(dsum("xv").alias("xg"), F.count(F.lit(1)).alias("ng"))
    bterms = g.crossJoin(F.broadcast(tot)).select(
        F.floor(
            (F.col("xg") / F.col("xs"))
            * F.log(
                (F.col("xg") / F.col("xs"))
                / (F.col("ng").cast("double") / F.col("n"))
            )
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tfp")
    )
    t_total = terms.agg(
        (F.floor(F.sum("tfp").cast("double") / F.lit(1e3) + F.lit(0.5)) / 1e6).alias(
            "theil_total"
        )
    )
    t_between = bterms.agg(
        (F.floor(F.sum("tfp").cast("double") / F.lit(1e3) + F.lit(0.5)) / 1e6).alias(
            "theil_between"
        )
    )
    ngroups = g.agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
    return (
        tot.select(F.col("n").cast("long").alias("n_customers"))
        .crossJoin(F.broadcast(ngroups))
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(t_between))
        .select(
            "n_customers",
            "n_groups",
            "theil_total",
            "theil_between",
            (F.col("theil_total") - F.col("theil_between")).alias("theil_within"),
        )
    )


# ---------------------------------------------------------------------------
# Pairwise source vocabulary overlap (Jaccard matrix)
# ---------------------------------------------------------------------------

_SRC_OVERLAP_SQL = """
    WITH words AS (
        SELECT DISTINCT source,
               UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS w
        FROM documents WHERE n_chars > 0
    ), clean AS (
        SELECT source, w FROM words WHERE w <> ''
    ), vocab AS (
        SELECT source, COUNT(*) AS v FROM clean GROUP BY source
    ), inter AS (
        SELECT a.source AS s1, b.source AS s2, COUNT(*) AS i
        FROM clean a JOIN clean b ON a.w = b.w AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.s1, i.s2,
           CAST(va.v AS BIGINT) AS vocab_1,
           CAST(vb.v AS BIGINT) AS vocab_2,
           CAST(i.i AS BIGINT) AS shared,
           FLOOR(CAST(i.i AS DOUBLE) / CAST(va.v + vb.v - i.i AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS jaccard,
           FLOOR(CAST(i.i AS DOUBLE) / CAST(LEAST(va.v, vb.v) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS containment
    FROM inter i
    JOIN vocab va ON va.source = i.s1
    JOIN vocab vb ON vb.source = i.s2
"""


@query("text_source_overlap", oracle=_SRC_OVERLAP_SQL)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between corpus sources: shared
    types, Jaccard, and small-side containment for every source pair —
    the corpus-composition audit that catches a "new" source that is
    really a re-crawl of an existing one (high containment) before it
    double-weights a training mix (dedup_* catches duplicate DOCS;
    this catches duplicate DISTRIBUTIONS).

    Counts are exact integers under the shared whitespace-tokenization
    contract; Jaccard/containment are single fixed-pointed divisions.

    Scale: the word-grain self-join is keyed on the word with sources
    bounded (each word appears in ≤ |sources| rows), so the join
    output is at most C(|sources|,2) per word — linear in vocabulary,
    never quadratic in documents; groupBys are map-side combinable.
    """
    d = _t(spark, sf_dir, "documents")["documents"]
    clean = (
        d.filter(F.col("n_chars") > 0)
        .select(
            "source",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .distinct()
    )
    vocab = clean.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a, b = clean.alias("a"), clean.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("s1"), F.col("b.source").alias("s2"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    va = vocab.select(F.col("source").alias("s1"), F.col("v").alias("vocab_1"))
    vb = vocab.select(F.col("source").alias("s2"), F.col("v").alias("vocab_2"))
    i, v1, v2 = F.col("i"), F.col("vocab_1"), F.col("vocab_2")
    return (
        inter.join(F.broadcast(va), "s1")
        .join(F.broadcast(vb), "s2")
        .select(
            "s1",
            "s2",
            v1.cast("long").alias("vocab_1"),
            v2.cast("long").alias("vocab_2"),
            i.cast("long").alias("shared"),
            (
                F.floor(
                    i.cast("double") / (v1 + v2 - i).cast("double") * F.lit(1e6)
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("jaccard"),
            (
                F.floor(
                    i.cast("double") / F.least(v1, v2).cast("double") * F.lit(1e6)
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Variance-ratio test for trending vs mean-reverting daily metrics
# ---------------------------------------------------------------------------

_VR_KS = (2, 4, 7)


def _vr_sql() -> str:
    branches = []
    for k in _VR_KS:
        branches.append(f"""
        SELECT {k} AS k,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(COUNT(*) * SUM(yk * yk) - SUM(yk) * SUM(yk) AS DOUBLE)
                   / CAST(COUNT(*) * COUNT(*) AS DOUBLE) AS var_k
        FROM (
            SELECT CAST(SUM(r_fp) OVER (ORDER BY day
                        ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS yk,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM rets
        ) WHERE rn >= {k}
        """)
    union = " UNION ALL ".join(branches)
    return f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {dsum_expr('value')} AS dv
        FROM events GROUP BY 1
    ), rets AS (
        SELECT day,
               CAST(FLOOR((dv - LAG(dv) OVER (ORDER BY day)) * 1e4 + 0.5)
                    AS BIGINT) AS r_fp
        FROM daily
        QUALIFY LAG(dv) OVER (ORDER BY day) IS NOT NULL
    ), base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n1,
               CAST(COUNT(*) * SUM(r_fp * r_fp) - SUM(r_fp) * SUM(r_fp) AS DOUBLE)
                   / CAST(COUNT(*) * COUNT(*) AS DOUBLE) AS var_1
        FROM rets
    ), ks AS ({union})
    SELECT CAST(ks.k AS BIGINT) AS k, ks.n_obs,
           FLOOR(ks.var_k / (CAST(ks.k AS DOUBLE) * b.var_1) * 1e6 + 0.5) / 1e6
               AS variance_ratio
    FROM ks CROSS JOIN base b
"""


@query("ts_variance_ratio", oracle=_vr_sql())
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test on daily metric changes:
    Var(k-day change) / (k · Var(1-day change)) for k = 2, 4, 7 — the
    random-walk diagnostic: VR ≈ 1 means uncorrelated daily shocks,
    VR > 1 trending/momentum, VR < 1 mean reversion. Tells a
    forecaster whether ts_holt_linear's trend term is signal or noise.

    Exactness: daily changes are 1e4 fixed-point BIGINTs, so every
    k-day rolling sum and both population-variance moment forms
    (n·Σy² − (Σy)²) are EXACT integer arithmetic; each VR is one
    pinned three-op IEEE chain over those integers, quantized at 1e-6.

    Scale: the windows run over the one-row-per-calendar-day frame —
    bounded by time, not data (the ts_cumulative_users bound; plan
    allowlist) — and everything upstream is one daily groupBy.
    """
    from es_analytics_spark.functions.exact import dsum

    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(dsum("value").alias("dv"))
    wday = W.orderBy("day")
    rets = (
        daily.select(
            "day", (F.col("dv") - F.lag("dv").over(wday)).alias("r")
        )
        .filter(F.col("r").isNotNull())
        .select(
            "day",
            F.floor(F.col("r") * F.lit(1e4) + F.lit(0.5)).cast("long").alias("r_fp"),
        )
    )
    base = rets.agg(
        F.count(F.lit(1)).alias("n1"),
        (
            (
                F.count(F.lit(1)) * F.sum(F.col("r_fp") * F.col("r_fp"))
                - F.sum("r_fp") * F.sum("r_fp")
            ).cast("double")
            / (F.count(F.lit(1)) * F.count(F.lit(1))).cast("double")
        ).alias("var_1"),
    )
    outs = []
    for k in _VR_KS:
        wk = W.orderBy("day").rowsBetween(-(k - 1), 0)
        wrn = W.orderBy("day")
        yk = (
            rets.select(
                F.sum("r_fp").over(wk).cast("long").alias("yk"),
                F.row_number().over(wrn).alias("rn"),
            )
            .filter(F.col("rn") >= k)
        )
        outs.append(
            yk.agg(
                F.lit(k).cast("long").alias("k"),
                F.count(F.lit(1)).cast("long").alias("n_obs"),
                (
                    (
                        F.count(F.lit(1)) * F.sum(F.col("yk") * F.col("yk"))
                        - F.sum("yk") * F.sum("yk")
                    ).cast("double")
                    / (F.count(F.lit(1)) * F.count(F.lit(1))).cast("double")
                ).alias("var_k"),
            )
        )
    ks = outs[0]
    for o in outs[1:]:
        ks = ks.unionAll(o)
    return ks.crossJoin(F.broadcast(base)).select(
        "k",
        "n_obs",
        (
            F.floor(
                F.col("var_k") / (F.col("k").cast("double") * F.col("var_1"))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("variance_ratio"),
    )


# ---------------------------------------------------------------------------
# Nearest-neighbor propensity-style matching with ATT readout
# ---------------------------------------------------------------------------

_MATCH_SQL = f"""
    WITH outc AS (
        SELECT o_custkey AS ck, {dsum_expr('o_totalprice')} AS rev
        FROM orders GROUP BY o_custkey
    ), pop AS (
        SELECT c_custkey AS id, c_nationkey AS nat,
               CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
               c_custkey % 2 = 1 AS treated,
               COALESCE(o.rev, 0.0) AS outcome
        FROM customer LEFT JOIN outc o ON c_custkey = o.ck
    ), fwdbwd AS (
        SELECT id, nat, bal, treated, outcome,
               LAST_VALUE(CASE WHEN NOT treated THEN bal END IGNORE NULLS)
                   OVER (PARTITION BY nat ORDER BY bal ASC, treated ASC, id ASC
                         ROWS UNBOUNDED PRECEDING) AS b_bal,
               LAST_VALUE(CASE WHEN NOT treated THEN outcome END IGNORE NULLS)
                   OVER (PARTITION BY nat ORDER BY bal ASC, treated ASC, id ASC
                         ROWS UNBOUNDED PRECEDING) AS b_out,
               LAST_VALUE(CASE WHEN NOT treated THEN bal END IGNORE NULLS)
                   OVER (PARTITION BY nat ORDER BY bal DESC, treated ASC, id DESC
                         ROWS UNBOUNDED PRECEDING) AS f_bal,
               LAST_VALUE(CASE WHEN NOT treated THEN outcome END IGNORE NULLS)
                   OVER (PARTITION BY nat ORDER BY bal DESC, treated ASC, id DESC
                         ROWS UNBOUNDED PRECEDING) AS f_out
        FROM pop
    ), matched AS (
        SELECT id, bal, outcome,
               CASE WHEN b_bal IS NOT NULL
                         AND (f_bal IS NULL OR bal - b_bal <= f_bal - bal)
                    THEN b_bal ELSE f_bal END AS m_bal,
               CASE WHEN b_bal IS NOT NULL
                         AND (f_bal IS NULL OR bal - b_bal <= f_bal - bal)
                    THEN b_out ELSE f_out END AS m_out
        FROM fwdbwd WHERE treated
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
           CAST(COUNT(m_bal) AS BIGINT) AS n_matched,
           FLOOR(CAST(SUM(CASE WHEN m_bal IS NOT NULL
                          THEN CAST(FLOOR((outcome - m_out) * 1e4 + 0.5) AS BIGINT)
                          END) AS DOUBLE)
                 / CAST(COUNT(m_bal) AS DOUBLE) + 0.5) / 1e4 AS att,
           CAST(FLOOR(CAST(SUM(CASE WHEN m_bal IS NOT NULL
                          THEN ABS(bal - m_bal) END) AS DOUBLE)
                 / CAST(COUNT(m_bal) AS DOUBLE) + 0.5) AS BIGINT)
               AS mean_abs_gap_cents
    FROM matched
"""


@query("ml_propensity_match", oracle=_MATCH_SQL)
def ml_propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:1 nearest-neighbor matching (with replacement) of treated to
    control customers on the account-balance covariate within each
    nation, then the average treatment effect on the treated over
    order revenue — observational causal inference's workhorse when
    randomization (ab_*) isn't available: compare each treated unit to
    its most similar control, not to the population.

    Match rule is fully deterministic: nearest control by balance
    within the nation, backward-preferring on exact-distance ties,
    with the window order (bal, treated, id) pinning which control
    carries among equal balances. Matched-pair revenue diffs are 1e4
    fixed-pointed before the exact sums; covariate gaps are integer
    cents.

    Scale: two sorted window passes PARTITIONED BY nation (hash
    exchange, never single-partition) — the as-of-join recipe applied
    to a covariate axis instead of time; no pairwise candidate
    generation at all (contrast the O(pairs) alternative), so matching
    n treated against m controls costs one sort, not n·m.
    """
    from es_analytics_spark.functions.exact import dsum

    c = _t(spark, sf_dir, "customer")["customer"]
    o = _t(spark, sf_dir, "orders")["orders"]
    outc = o.groupBy(F.col("o_custkey").alias("id")).agg(
        dsum("o_totalprice").alias("rev")
    )
    pop = (
        c.select(
            F.col("c_custkey").alias("id"),
            F.col("c_nationkey").alias("nat"),
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal"),
            (F.col("c_custkey") % 2 == 1).alias("treated"),
        )
        .join(outc, "id", "left")
        .withColumn("outcome", F.coalesce(F.col("rev"), F.lit(0.0)))
        .drop("rev")
    )
    ctl_bal = F.when(~F.col("treated"), F.col("bal"))
    ctl_out = F.when(~F.col("treated"), F.col("outcome"))
    wb = (
        W.partitionBy("nat")
        .orderBy(F.asc("bal"), F.asc("treated"), F.asc("id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy("nat")
        .orderBy(F.desc("bal"), F.asc("treated"), F.desc("id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    fwdbwd = pop.select(
        "id",
        "bal",
        "treated",
        "outcome",
        F.last(ctl_bal, ignorenulls=True).over(wb).alias("b_bal"),
        F.last(ctl_out, ignorenulls=True).over(wb).alias("b_out"),
        F.last(ctl_bal, ignorenulls=True).over(wf).alias("f_bal"),
        F.last(ctl_out, ignorenulls=True).over(wf).alias("f_out"),
    )
    use_b = F.col("b_bal").isNotNull() & (
        F.col("f_bal").isNull()
        | ((F.col("bal") - F.col("b_bal")) <= (F.col("f_bal") - F.col("bal")))
    )
    matched = fwdbwd.filter(F.col("treated")).select(
        "bal",
        "outcome",
        F.when(use_b, F.col("b_bal")).otherwise(F.col("f_bal")).alias("m_bal"),
        F.when(use_b, F.col("b_out")).otherwise(F.col("f_out")).alias("m_out"),
    )
    diff_fp = F.when(
        F.col("m_bal").isNotNull(),
        F.floor((F.col("outcome") - F.col("m_out")) * F.lit(1e4) + F.lit(0.5)).cast(
            "long"
        ),
    )
    gap = F.when(F.col("m_bal").isNotNull(), F.abs(F.col("bal") - F.col("m_bal")))
    return matched.agg(
        F.count(F.lit(1)).cast("long").alias("n_treated"),
        F.count("m_bal").cast("long").alias("n_matched"),
        (
            F.floor(
                F.sum(diff_fp).cast("double") / F.count("m_bal").cast("double")
                + F.lit(0.5)
            )
            / 1e4
        ).alias("att"),
        F.floor(
            F.sum(gap).cast("double") / F.count("m_bal").cast("double") + F.lit(0.5)
        ).cast("long").alias("mean_abs_gap_cents"),
    )
