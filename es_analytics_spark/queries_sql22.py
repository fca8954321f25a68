"""Round-5 batch-22 surface: the Friedman repeated-measures rank test,
hard-negative mining over embeddings, ABC/XYZ inventory
classification, a Chapman capture-recapture population estimate, and
embedding isotropy diagnostics.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.fanout import fan_out
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Friedman repeated-measures rank test (daily revenue across types)
# ---------------------------------------------------------------------------

_FRIED_SQL = f"""
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
    ), sums AS (
        SELECT event_type, CAST(SUM(r) AS BIGINT) AS rsum,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM ranked GROUP BY event_type
    ), dims AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(MAX(nb) AS BIGINT) AS n
        FROM sums
    )
    SELECT s.event_type, s.rsum AS rank_sum,
           FLOOR(CAST(s.rsum AS DOUBLE) / dm.n * 1e6 + 0.5) / 1e6
               AS mean_rank,
           FLOOR((12.0 / (CAST(dm.n AS DOUBLE) * dm.k * (dm.k + 1))
                  * (SELECT SUM(CAST(rsum AS DOUBLE) * rsum) FROM sums)
                  - 3.0 * dm.n * (dm.k + 1)) * 1e6 + 0.5) / 1e6
               AS friedman_chi2
    FROM sums s CROSS JOIN dims dm
"""


@query("stat_friedman_test", oracle=_FRIED_SQL)
def stat_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman repeated-measures rank test: within every day (the
    block), rank the event types by daily revenue, then test whether
    the mean ranks differ — the nonparametric two-way companion to
    stat_anova_oneway (ANOVA compares raw levels and is dominated by
    scale; Friedman asks "does the same type consistently WIN each
    day", which survives any monotone distortion). Rank ties break on
    event_type (exact scale-4 revenues make true ties measure-zero;
    the fixture has none — checked).

    Exactness: ranks are exact integers from a per-day window over the
    |types| frame; rank sums and the chi-square statistic are one
    fixed IEEE tree over exact integers, quantized at 1e-6.

    Scale: one shuffle to the (type, day) grain; ranking windows are
    per-day over |types| rows; the reduction is |types|-sized."""
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
    sums = ranked.groupBy("event_type").agg(
        F.sum("r").cast("bigint").alias("rsum"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    ).transform(cut_lineage)
    dims = sums.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.max("nb").cast("bigint").alias("n"),
    )
    sq = sums.agg(
        F.sum(F.col("rsum").cast("double") * F.col("rsum")).alias("ss")
    )
    chi2 = (
        F.lit(12.0)
        / (F.col("n").cast("double") * F.col("k") * (F.col("k") + 1))
        * F.col("ss")
        - F.lit(3.0) * F.col("n") * (F.col("k") + 1)
    )
    return (
        sums.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(sq))
        .select(
            "event_type",
            F.col("rsum").alias("rank_sum"),
            _q6(F.col("rsum").cast("double") / F.col("n")).alias("mean_rank"),
            _q6(chi2).alias("friedman_chi2"),
        )
    )


# ---------------------------------------------------------------------------
# Hard-negative mining over embeddings
# ---------------------------------------------------------------------------

_HNM_STRIDE = 25  # queries = vec_id % stride == 0
_HNM_K = 5

_HNM_SQL = f"""
    WITH dims AS MATERIALIZED (
        SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
               CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1e4 + 0.5)
                    AS BIGINT) AS iq
        FROM embeddings
    ), nrm AS MATERIALIZED (
        SELECT vec_id, label, CAST(SUM(iq * iq) AS BIGINT) AS in2
        FROM dims GROUP BY 1, 2
    ), dots AS MATERIALIZED (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
               CAST(SUM(a.iq * b.iq) AS BIGINT) AS idot
        FROM dims a JOIN dims b ON b.dim = a.dim
        WHERE a.vec_id % {_HNM_STRIDE} = 0 AND b.vec_id <> a.vec_id
        GROUP BY 1, 2
    ), scored AS MATERIALIZED (
        SELECT d.qid, qq.label AS q_label, d.cid, c.label AS neg_label,
               FLOOR(CAST(d.idot AS DOUBLE)
                     / SQRT(CAST(qq.in2 AS DOUBLE) * c.in2)
                     * 1e6 + 0.5) / 1e6 AS cosine
        FROM dots d
        JOIN nrm qq ON qq.vec_id = d.qid
        JOIN nrm c ON c.vec_id = d.cid
        WHERE c.label <> qq.label
    ), topk AS (
        SELECT qid, q_label, cid, neg_label, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, cid ASC) AS rnk
        FROM scored
    )
    SELECT qid AS query_id, CAST(q_label AS BIGINT) AS query_label,
           cid AS negative_id, CAST(neg_label AS BIGINT) AS negative_label,
           cosine, CAST(rnk AS BIGINT) AS rnk
    FROM topk WHERE rnk <= {_HNM_K}
"""


@query("ml_hard_negative_mining", oracle=_HNM_SQL)
def ml_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector (a deterministic 1-in-{_HNM_STRIDE} sample), the top-{_HNM_K}
    most-cosine-similar vectors with a DIFFERENT label — the negatives
    that sit closest to the decision boundary, which is exactly the
    set a contrastive/triplet fine-tune wants (sim_cosine_topk
    retrieves same-anything neighbors; this conditions on the label
    disagreeing).

    Exactness: the operator is DEFINED on the 1e-4-quantized embedding
    (the queries_sql7 quantized-similarity precedent): dots and norms
    are then exact BIGINT sums (whole-stage-codegen integer arithmetic
    — measured ~4x faster than the decimal-contract double path at
    sf0.1, with cosine shifted < 1e-4, irrelevant for mining), and the
    cosine is one fixed IEEE tree on identical integers, quantized at
    1e-6 with the candidate id breaking ties.

    Scale: the dim-keyed join computes |queries| x |corpus| dots with
    the query side STRIDE-sampled (the documented probe budget —
    production mines from an ANN candidate pool instead of the full
    corpus, the sim_ivf_topk two-stage recipe); ranks are per-query
    windows."""
    # the 64x posexplode + broadcast-probe + quantize run in the scan
    # stage (one task on a single-file layout) — fan the corpus out
    # first (guide §2.2; layout-gated no-op on a lake)
    em = fan_out(
        _t(spark, sf_dir, "embeddings")["embeddings"],
        sf_dir,
        "embeddings",
        "vec_id",
        weight=8,
    )
    dims = em.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "xf"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("xf").cast("double") * 1e4 + F.lit(0.5))
        .cast("bigint")
        .alias("iq"),
    )
    nrm = (
        dims.groupBy("vec_id", "label")
        .agg(F.sum(F.col("iq") * F.col("iq")).cast("bigint").alias("in2"))
        .transform(cut_lineage)
    )
    qdims = dims.filter(F.col("vec_id") % _HNM_STRIDE == 0).select(
        F.col("vec_id").alias("qid"), "dim", F.col("iq").alias("qiq")
    )
    dots = (
        dims.join(F.broadcast(qdims), "dim")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum(F.col("qiq") * F.col("iq")).cast("bigint").alias("idot"))
    )
    qn = nrm.filter(F.col("vec_id") % _HNM_STRIDE == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("in2").alias("qin2"),
    )
    cn = nrm.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("neg_label"),
        F.col("in2").alias("cin2"),
    )
    scored = (
        dots.join(F.broadcast(qn), "qid")
        .join(F.broadcast(cn), "cid")
        .filter(F.col("neg_label") != F.col("q_label"))
        .select(
            "qid",
            "q_label",
            "cid",
            "neg_label",
            _q6(
                F.col("idot").cast("double")
                / F.sqrt(F.col("qin2").cast("double") * F.col("cin2"))
            ).alias("cosine"),
        )
    )
    wq = W.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(wq).cast("bigint"))
        .filter(F.col("rnk") <= _HNM_K)
        .select(
            F.col("qid").alias("query_id"),
            F.col("q_label").cast("bigint").alias("query_label"),
            F.col("cid").alias("negative_id"),
            F.col("neg_label").cast("bigint").alias("negative_label"),
            "cosine",
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# ABC / XYZ inventory classification
# ---------------------------------------------------------------------------

_ABC_SQL = f"""
    WITH per_part AS MATERIALIZED (
        SELECT l_partkey AS p,
               {dsum_expr('l_extendedprice * (1 - l_discount)')} AS rev,
               CAST(COUNT(DISTINCT DATE_TRUNC('month', l_shipdate))
                    AS BIGINT) AS months,
               {dsum_expr('l_quantity')} AS qty,
               {dsum_expr('l_quantity * l_quantity')} AS qty2,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY 1
    ), ranked AS MATERIALIZED (
        SELECT p, rev, n_lines, qty, qty2,
               SUM(rev) OVER (ORDER BY rev DESC, p ASC) AS cum_rev,
               SUM(rev) OVER () AS tot_rev
        FROM per_part
    ), classed AS MATERIALIZED (
        SELECT p,
               CASE WHEN cum_rev <= 0.8 * tot_rev THEN 'A'
                    WHEN cum_rev <= 0.95 * tot_rev THEN 'B'
                    ELSE 'C' END AS abc,
               CASE WHEN n_lines < 2 THEN 'Z'
                    WHEN SQRT((qty2 - qty * qty / n_lines) / (n_lines - 1))
                         / (qty / n_lines) <= 0.5 THEN 'X'
                    WHEN SQRT((qty2 - qty * qty / n_lines) / (n_lines - 1))
                         / (qty / n_lines) <= 1.0 THEN 'Y'
                    ELSE 'Z' END AS xyz,
               rev
        FROM ranked
    )
    SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
           FLOOR({dsum_expr('rev')} * 1e4 + 0.5) / 1e4 AS class_revenue
    FROM classed GROUP BY 1, 2
"""


@query("agg_abc_classification", oracle=_ABC_SQL)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory classification: parts fall into A/B/C by
    cumulative revenue share (80% / 95% Pareto cuts over the
    revenue-descending order) and into X/Y/Z by demand variability
    (per-line quantity coefficient of variation at 0.5 / 1.0), reported
    as the 2-D class matrix with counts and revenue — the planning
    segmentation every supply-chain review starts from
    (agg_revenue_concentration gives the curve; this assigns the
    actionable classes).

    Exactness: revenue/quantity moments are decimal-contract sums; the
    cumulative-share cut uses an exact windowed DECIMAL-backed running
    sum over the deterministic (rev desc, partkey) order computed
    DISTRIBUTIVELY (range-partition + offsets — no single-partition
    window); CV thresholds compare fixed IEEE trees; class revenue is
    a decimal sum.

    Scale: one part-grain aggregate, one range shuffle for the
    cumulative rank, a 9-cell reduction."""
    # the 4-sum decimal partial aggregation runs map-side in the scan
    # stage; fan out on the grouping key so the exchange this adds IS
    # the aggregation's exchange (layout-adaptive no-op at scale)
    li = fan_out(
        _t(spark, sf_dir, "lineitem")["lineitem"],
        sf_dir, "lineitem", "l_partkey", weight=4,
    )
    per_part = (
        li.groupBy(F.col("l_partkey").alias("p"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("rev"),
            dsum("l_quantity").alias("qty"),
            dsum(F.col("l_quantity") * F.col("l_quantity")).alias("qty2"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .transform(cut_lineage)
    )
    n_parts_conf = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        per_part.repartitionByRange(
            n_parts_conf, F.desc("rev"), F.asc("p")
        )
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    # exact decimal running revenue: local decimal prefix + per-partition
    # decimal offsets (the cumulative_offsets recipe on sums, not counts)
    from pyspark.sql import types as T

    dec = T.DecimalType(38, 10)
    local = ranged.withColumn(
        "lcum",
        F.sum(F.col("rev").cast(dec)).over(
            W.partitionBy("pid")
            .orderBy(F.desc("rev"), F.asc("p"))
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    psums = ranged.groupBy("pid").agg(F.sum(F.col("rev").cast(dec)).alias("cnt"))
    offsets = cumulative_offsets(psums)
    tot = ranged.agg(
        F.round(F.sum(F.col("rev").cast(dec)), 4).cast("double").alias("tot_rev")
    )
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .withColumn(
            "cum_rev",
            F.round(F.col("lcum") + F.coalesce(F.col("off").cast(dec), F.lit(0)), 4)
            .cast("double"),
        )
        .crossJoin(F.broadcast(tot))
    )
    cv = F.sqrt(
        (F.col("qty2") - F.col("qty") * F.col("qty") / F.col("n_lines"))
        / (F.col("n_lines") - 1)
    ) / (F.col("qty") / F.col("n_lines"))
    classed = ranked.select(
        F.when(F.col("cum_rev") <= 0.8 * F.col("tot_rev"), "A")
        .when(F.col("cum_rev") <= 0.95 * F.col("tot_rev"), "B")
        .otherwise("C")
        .alias("abc"),
        F.when(F.col("n_lines") < 2, "Z")
        .when(cv <= 0.5, "X")
        .when(cv <= 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
        "rev",
    )
    return classed.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        (F.floor(dsum("rev") * 1e4 + F.lit(0.5)) / 1e4).alias("class_revenue"),
    )


# ---------------------------------------------------------------------------
# Chapman capture-recapture population estimate
# ---------------------------------------------------------------------------

_CAPREC_VALUE = 95.0

_CAPREC_SQL = f"""
    WITH wk AS (
        SELECT MIN(DATE_TRUNC('week', ts)) AS w0 FROM events
    ), s1 AS MATERIALIZED (
        SELECT DISTINCT user_id FROM events, wk
        WHERE event_type = 'purchase' AND value >= {_CAPREC_VALUE}
          AND DATE_TRUNC('week', ts) = w0
    ), s2 AS MATERIALIZED (
        SELECT DISTINCT user_id FROM events, wk
        WHERE event_type = 'purchase' AND value >= {_CAPREC_VALUE}
          AND DATE_TRUNC('week', ts) = w0 + INTERVAL 7 DAY
    ), cnts AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
               (SELECT CAST(COUNT(*) AS BIGINT)
                FROM s1 JOIN s2 USING (user_id)) AS m
    )
    SELECT n1 AS n_sample1, n2 AS n_sample2, m AS n_recaptured,
           FLOOR((CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1.0)
                 * 1e6 + 0.5) / 1e6 AS chapman_estimate,
           FLOOR(SQRT(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) * (n1 - m) * (n2 - m)
                      / ((CAST(m + 1 AS DOUBLE) * (m + 1)) * (m + 2)))
                 * 1e6 + 0.5) / 1e6 AS chapman_se
    FROM cnts
"""


@query("stat_capture_recapture", oracle=_CAPREC_SQL)
def stat_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the high-value-buyer
    population: week-1 high-value purchasers are the marked sample,
    week-2 the recapture, and the overlap yields the bias-corrected
    Chapman estimator N = (n1+1)(n2+1)/(m+1) - 1 with its standard
    error — the classic "how many exist that we never saw" estimator,
    used in data engineering to size dataset overlap/coverage from two
    independent crawls (the same algebra as mark-recapture ecology).

    Exactness: all three counts are exact integers; the estimate and
    SE are single fixed IEEE trees, quantized at 1e-6.

    Scale: two filtered user-grain distincts + one semi-join-sized
    intersection; 1-row output."""
    e = _t(spark, sf_dir, "events")["events"]
    w0 = e.agg(F.min(F.date_trunc("week", "ts")).alias("w0"))
    hv = e.filter(
        (F.col("event_type") == "purchase") & (F.col("value") >= _CAPREC_VALUE)
    ).crossJoin(F.broadcast(w0))
    s1 = (
        hv.filter(F.date_trunc("week", "ts") == F.col("w0"))
        .select("user_id")
        .distinct()
    )
    s2 = (
        hv.filter(
            F.date_trunc("week", "ts")
            == F.col("w0") + F.expr("INTERVAL 7 DAY")
        )
        .select("user_id")
        .distinct()
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    m = s1.join(s2, "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("m")
    )
    cnts = n1.crossJoin(F.broadcast(n2)).crossJoin(F.broadcast(m))
    est = (F.col("n1") + 1).cast("double") * (F.col("n2") + 1) / (
        F.col("m") + 1
    ) - F.lit(1.0)
    se = F.sqrt(
        (F.col("n1") + 1).cast("double")
        * (F.col("n2") + 1)
        * (F.col("n1") - F.col("m"))
        * (F.col("n2") - F.col("m"))
        / (
            ((F.col("m") + 1).cast("double") * (F.col("m") + 1))
            * (F.col("m") + 2)
        )
    )
    return cnts.select(
        F.col("n1").alias("n_sample1"),
        F.col("n2").alias("n_sample2"),
        F.col("m").alias("n_recaptured"),
        _q6(est).alias("chapman_estimate"),
        _q6(se).alias("chapman_se"),
    )


# ---------------------------------------------------------------------------
# Embedding isotropy diagnostics
# ---------------------------------------------------------------------------

_ISO_SQL = f"""
    WITH dims AS MATERIALIZED (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
               CAST(UNNEST(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), nv AS (
        SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM dims
    ), dstat AS MATERIALIZED (
        SELECT dim, {dsum_expr('x')} AS sx, {dsum_expr('x * x')} AS sxx
        FROM dims GROUP BY dim
    ), parts AS (
        SELECT CAST(ROUND(SUM(CAST(
                   (sx / n) * (sx / n) AS DECIMAL(38,10))), 4) AS DOUBLE)
                   AS mu2,
               CAST(ROUND(SUM(CAST(sxx / n AS DECIMAL(38,10))), 4) AS DOUBLE)
                   AS ex2,
               CAST(ROUND(SUM(CAST(
                   sxx / n - (sx / n) * (sx / n) AS DECIMAL(38,10))), 4)
                   AS DOUBLE) AS total_var,
               MAX(sxx / n - (sx / n) * (sx / n)) AS max_var
        FROM dstat CROSS JOIN nv
    )
    SELECT (SELECT n FROM nv) AS n_vecs,
           FLOOR(mu2 * 1e6 + 0.5) / 1e6 AS mean_norm2,
           FLOOR(ex2 * 1e6 + 0.5) / 1e6 AS avg_norm2,
           FLOOR((1.0 - mu2 / ex2) * 1e6 + 0.5) / 1e6 AS isotropy_score,
           FLOOR(max_var / total_var * 1e6 + 0.5) / 1e6 AS top_dim_var_share
    FROM parts
"""


@query("ml_embedding_isotropy", oracle=_ISO_SQL)
def ml_embedding_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy diagnostics for the embedding corpus: |mean vector|^2
    vs mean |x|^2 (their ratio is the expected cosine between random
    pairs — anisotropic cones score near 1, isotropic clouds near 0,
    so isotropy_score = 1 - ratio), plus the largest single
    dimension's share of total variance (a rogue dominant dimension is
    the classic embedding pathology that wrecks cosine retrieval).
    Complements ml_embedding_whitening_diag: that computes the fix,
    this computes the headline health number.

    Exactness: per-dimension moments are decimal-contract sums; the
    dimension-level reductions are decimal sums over the 64-dim
    support; ratios are quantized fixed trees (max_var's argmax needs
    no tie-break — only its value is reported).

    Scale: one (dim)-grain aggregate over the exploded corpus —
    map-side combinable; constant-size reductions after."""
    em = _t(spark, sf_dir, "embeddings")["embeddings"]
    dims = em.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "xf")
    ).select(
        "vec_id", (F.col("dim0") + 1).alias("dim"), F.col("xf").cast("double").alias("x")
    )
    nv = dims.agg(F.countDistinct("vec_id").cast("bigint").alias("n"))
    dstat = (
        dims.groupBy("dim")
        .agg(dsum("x").alias("sx"), dsum(F.col("x") * F.col("x")).alias("sxx"))
        .transform(cut_lineage)
    )
    j = dstat.crossJoin(F.broadcast(nv))
    mu = F.col("sx") / F.col("n")
    var = F.col("sxx") / F.col("n") - mu * mu
    parts = j.agg(
        dsum(mu * mu).alias("mu2"),
        dsum(F.col("sxx") / F.col("n")).alias("ex2"),
        dsum(var).alias("total_var"),
        F.max(var).alias("max_var"),
        F.max("n").alias("n_vecs"),
    )
    return parts.select(
        F.col("n_vecs"),
        _q6(F.col("mu2")).alias("mean_norm2"),
        _q6(F.col("ex2")).alias("avg_norm2"),
        _q6(F.lit(1.0) - F.col("mu2") / F.col("ex2")).alias("isotropy_score"),
        _q6(F.col("max_var") / F.col("total_var")).alias("top_dim_var_share"),
    )
