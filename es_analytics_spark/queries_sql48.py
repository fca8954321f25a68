"""Round-7 batch-48 surface: two-NN intrinsic-dimension estimation for
embedding corpora, Mood's k-sample median test, and Cochran's Q for
correlated binary engagement outcomes.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.fanout import fan_out
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


_CHI2_CRIT_DF2 = 5.991464547107979


# ---------------------------------------------------------------------------
# Two-NN intrinsic dimension (Facco et al.) of the embedding corpus
# ---------------------------------------------------------------------------

_ID_STRIDE = 7  # probe-budget convention: every 7th vector is a query
# FIXED probe budget: the probe set must NOT grow with the corpus, or
# the probes x corpus exact arm turns quadratic (measured 67 s at the
# 10x scratch scale with stride-only probes vs ~2 s capped) — the
# estimator converges with ~100 probes regardless of corpus size
_ID_MAX_PROBE_ID = 100 * _ID_STRIDE

_ID_IQ = (
    "LIST_TRANSFORM({col}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e4 + 0.5) AS BIGINT))"
)

_ID_SQL = f"""
    WITH iqv AS MATERIALIZED (
        SELECT vec_id, {_ID_IQ.format(col='embedding')} AS iq FROM embeddings
    ), d2 AS MATERIALIZED (
        SELECT q.vec_id AS qid, c.vec_id AS cid,
               LIST_SUM(LIST_TRANSFORM(LIST_ZIP(q.iq, c.iq),
                        p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist2
        FROM iqv q JOIN iqv c ON c.vec_id <> q.vec_id
        WHERE q.vec_id % {_ID_STRIDE} = 0 AND q.vec_id < {_ID_MAX_PROBE_ID}
    ), nn AS (
        SELECT qid, dist2,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY dist2 ASC, cid ASC) AS rn
        FROM d2
    ), mu AS (
        SELECT a.qid,
               0.5 * (FLOOR(LN(CAST(b.dist2 AS DOUBLE) / a.dist2) * 1e6 + 0.5)
                      / 1e6) AS ln_mu
        FROM nn a JOIN nn b ON b.qid = a.qid AND b.rn = 2
        WHERE a.rn = 1 AND a.dist2 > 0
    ), agg AS (
        SELECT COUNT(*) AS n_q, {dsum_expr('ln_mu')} AS s
        FROM mu
    )
    SELECT CAST(n_q AS BIGINT) AS n_queries,
           FLOOR(n_q / s * 1e4 + 0.5) / 1e4 AS intrinsic_dim,
           FLOOR(s / n_q * 1e6 + 0.5) / 1e6 AS mean_ln_mu
    FROM agg
"""


@query("ml_intrinsic_dimension", oracle=_ID_SQL)
def ml_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-NN intrinsic-dimension estimate (Facco et al. 2017) of the
    embedding corpus: ID = n / sum ln(r2/r1) over each probe's two
    nearest-neighbor distance ratio — the manifold-dimension
    diagnostic that says how much of the 64 ambient dimensions the
    corpus actually uses (low ID → aggressive PQ/matryoshka truncation
    is safe — the operator that sizes sim_pq_topk / sim_matryoshka_topk
    budgets; high ID → quantization will cost recall). Probes are the
    1-in-{_ID_STRIDE} stride sample CAPPED at a fixed 100-probe budget
    (a probe set growing with the corpus turns the exact arm quadratic
    — measured 67 s vs 3 s at the 10x scratch scale; the estimator
    converges with hundreds of probes at any corpus size);
    exact-duplicate probes (r1 = 0) are excluded as the estimator
    requires.

    Exactness: elements quantize to 1e4 integers so every squared
    distance is exact BIGINT in both engines; the NN-2 selection
    orders by (dist2, cid) — a total order; ln(r2/r1) =
    0.5*ln(d2²/d1²) goes through the quantize-at-6 contract and the
    probe sum through the decimal contract.

    Scale: |probes| x |corpus| integer-dot work — the same
    stride-bounded exact arm as sim_quantization_recall; at production
    scale the probe sample is the budget knob (the estimator converges
    with hundreds of probes regardless of corpus size)."""
    # the probe-join explode (|probes| x |corpus| rows) and its
    # partial aggregation run in the partitions of the checkpointed
    # dims frame, which inherit the single-task scan — fan out first
    # (layout-adaptive no-op at scale)
    em = fan_out(
        _t(spark, sf_dir, "embeddings")["embeddings"],
        sf_dir, "embeddings", "vec_id", weight=50,
    )
    dims = em.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select(
        "vec_id",
        "dim",
        F.floor(F.col("xf").cast("double") * 1e4 + F.lit(0.5))
        .cast("bigint")
        .alias("iq"),
    ).transform(cut_lineage)
    qdims = dims.filter(
        (F.col("vec_id") % _ID_STRIDE == 0) & (F.col("vec_id") < _ID_MAX_PROBE_ID)
    ).select(F.col("vec_id").alias("qid"), "dim", F.col("iq").alias("qiq"))
    d2 = (
        dims.join(F.broadcast(qdims), "dim")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(
            F.sum((F.col("qiq") - F.col("iq")) * (F.col("qiq") - F.col("iq")))
            .cast("bigint")
            .alias("dist2")
        )
    )
    wq = W.partitionBy("qid").orderBy(F.col("dist2").asc(), F.col("cid").asc())
    nn = (
        d2.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .transform(cut_lineage)
    )
    d1 = nn.filter((F.col("rn") == 1) & (F.col("dist2") > 0)).select(
        "qid", F.col("dist2").alias("d1")
    )
    d2top = nn.filter(F.col("rn") == 2).select("qid", F.col("dist2").alias("d2"))
    mu = d1.join(d2top, "qid").select(
        (
            0.5
            * (
                F.floor(
                    F.log(F.col("d2").cast("double") / F.col("d1")) * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            )
        ).alias("ln_mu")
    )
    agg = mu.agg(F.count("*").alias("n_q"), dsum("ln_mu").alias("s"))
    return agg.select(
        F.col("n_q").cast("bigint").alias("n_queries"),
        (F.floor(F.col("n_q") / F.col("s") * 1e4 + F.lit(0.5)) / 1e4).alias(
            "intrinsic_dim"
        ),
        _q6(F.col("s") / F.col("n_q")).alias("mean_ln_mu"),
    )


# ---------------------------------------------------------------------------
# Mood's k-sample median test
# ---------------------------------------------------------------------------

_MOOD_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 3 AS INT) AS grp,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), g AS MATERIALIZED (
        SELECT rev,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS c2
        FROM pu GROUP BY rev
    ), cum AS (
        SELECT rev, SUM(c0 + c1 + c2) OVER (ORDER BY rev) AS cn,
               (SELECT SUM(c0 + c1 + c2) FROM g) AS n
        FROM g
    ), med AS (
        SELECT MIN(rev) AS m FROM cum WHERE cn >= CAST(CEIL(n / 2.0) AS BIGINT)
    ), cells AS (
        SELECT grp, COUNT(*) AS n_g,
               CAST(SUM(CASE WHEN rev > (SELECT m FROM med)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_above
        FROM pu GROUP BY grp
    ), tot AS (
        SELECT SUM(n_g) AS n, SUM(n_above) AS a FROM cells
    ), chi AS (
        SELECT t.n, t.a,
               SUM(
                 (c.n_above - CAST(c.n_g * t.a AS DOUBLE) / t.n)
                 * (c.n_above - CAST(c.n_g * t.a AS DOUBLE) / t.n)
                 / (CAST(c.n_g * t.a AS DOUBLE) / t.n)
               + ((c.n_g - c.n_above)
                  - CAST(c.n_g * (t.n - t.a) AS DOUBLE) / t.n)
                 * ((c.n_g - c.n_above)
                    - CAST(c.n_g * (t.n - t.a) AS DOUBLE) / t.n)
                 / (CAST(c.n_g * (t.n - t.a) AS DOUBLE) / t.n)
               ) AS chi2
        FROM cells c CROSS JOIN tot t GROUP BY t.n, t.a
    )
    SELECT CAST(n AS BIGINT) AS n, CAST(a AS BIGINT) AS n_above_median,
           (SELECT FLOOR(m * 1e4 + 0.5) / 1e4 FROM med) AS grand_median_lower,
           FLOOR(chi2 * 1e6 + 0.5) / 1e6 AS chi2,
           chi2 > {_CHI2_CRIT_DF2} AS significant
    FROM chi
"""


@query("stat_mood_median", oracle=_MOOD_SQL)
def stat_mood_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across the three variants: classify every
    user's purchase revenue as above/not-above the grand LOWER median
    (the rank-floor element — exact in any engine, no interpolation
    rule to disagree on) and chi-square the resulting 2x3 table — the
    maximally robust k-sample location test (only signs of deviations
    from the median matter; complements stat_kruskal_wallis, which
    uses full rank information and more power but less outlier
    immunity).

    Exactness: the lower median comes from the value-grain cumulative
    (first value whose cumulative count reaches ceil(N/2)); cell
    counts are exact integers; the chi-square is one fixed IEEE tree
    over those integers, quantized at 1e6.

    Scale: value-grain aggregate for the median (the MWU frame), one
    more user-grain pass for the 2x3 cells — the window runs on the
    value grain, partition-pruned by the same range recipe at scale;
    at fixture scale a single ordered pass over the value grain is
    bounded by distinct revenue values."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("rev")
        )
        .select((F.col("user_id") % 3).cast("int").alias("grp"), "rev")
        .transform(cut_lineage)
    )
    g = pu.groupBy("rev").agg(F.count("*").alias("ct"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    from es_analytics_spark.functions.ranks import cumulative_offsets

    ranged = (
        g.repartitionByRange(n_parts, F.asc("rev"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    wv = W.partitionBy("pid").orderBy(F.asc("rev")).rowsBetween(
        W.unboundedPreceding, 0
    )
    local = ranged.select("rev", "pid", F.sum("ct").over(wv).alias("lcum"))
    offs = cumulative_offsets(ranged.groupBy("pid").agg(F.sum("ct").alias("ct")), cnt="ct")
    tot_n = pu.agg(F.count("*").alias("n"))
    med = (
        local.join(F.broadcast(offs), "pid")
        .crossJoin(F.broadcast(tot_n))
        .filter(
            F.col("lcum") + F.col("off") >= F.ceil(F.col("n") / 2.0).cast("bigint")
        )
        .agg(F.min("rev").alias("m"))
    )
    cells = (
        pu.crossJoin(F.broadcast(med))
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_g"),
            F.sum(F.when(F.col("rev") > F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above"),
            F.max("m").alias("m"),
        )
    )
    tot = cells.agg(
        F.sum("n_g").alias("n"), F.sum("n_above").alias("a"), F.max("m").alias("m")
    )
    j = cells.drop("m").crossJoin(F.broadcast(tot))
    e_above = F.col("n_g") * F.col("a") / F.col("n").cast("double")
    e_below = F.col("n_g") * (F.col("n") - F.col("a")) / F.col("n").cast("double")
    term = (F.col("n_above") - e_above) * (F.col("n_above") - e_above) / e_above + (
        (F.col("n_g") - F.col("n_above")) - e_below
    ) * ((F.col("n_g") - F.col("n_above")) - e_below) / e_below
    chi = j.groupBy("n", "a", "m").agg(F.sum(term).alias("chi2"))
    return chi.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("a").cast("bigint").alias("n_above_median"),
        (F.floor(F.col("m") * 1e4 + F.lit(0.5)) / 1e4).alias("grand_median_lower"),
        _q6(F.col("chi2")).alias("chi2"),
        (F.col("chi2") > _CHI2_CRIT_DF2).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Cochran's Q over correlated binary engagement outcomes
# ---------------------------------------------------------------------------

_COCHRAN_TYPES = ("view", "click", "purchase")

_CQ_SQL = f"""
    WITH flags AS MATERIALIZED (
        SELECT user_id, DATE_TRUNC('day', ts) AS day,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x1,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x2,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x3
        FROM events GROUP BY user_id, DATE_TRUNC('day', ts)
    ), agg AS (
        SELECT COUNT(*) AS n_blocks,
               CAST(SUM(x1) AS BIGINT) AS c1, CAST(SUM(x2) AS BIGINT) AS c2,
               CAST(SUM(x3) AS BIGINT) AS c3,
               CAST(SUM(x1 + x2 + x3) AS BIGINT) AS rs,
               CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS rs2
        FROM flags
    ), q AS (
        SELECT n_blocks, c1, c2, c3,
               CASE WHEN 3 * rs - rs2 = 0 THEN 0.0
                    ELSE 3.0 * 2.0 * ((c1 - CAST(rs AS DOUBLE) / 3.0)
                                      * (c1 - CAST(rs AS DOUBLE) / 3.0)
                                    + (c2 - CAST(rs AS DOUBLE) / 3.0)
                                      * (c2 - CAST(rs AS DOUBLE) / 3.0)
                                    + (c3 - CAST(rs AS DOUBLE) / 3.0)
                                      * (c3 - CAST(rs AS DOUBLE) / 3.0))
                         / (3.0 * rs - rs2) END AS q_raw
        FROM agg
    )
    SELECT CAST(n_blocks AS BIGINT) AS n_blocks, c1 AS n_view, c2 AS n_click,
           c3 AS n_purchase,
           FLOOR(q_raw * 1e6 + 0.5) / 1e6 AS q_stat,
           q_raw > {_CHI2_CRIT_DF2} AS significant
    FROM q
"""


@query("stat_cochran_q", oracle=_CQ_SQL)
def stat_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over the correlated binary engagement triple
    (did the user view / click / purchase on a given active day —
    blocks are user-days, where engagement genuinely varies): Q =
    k(k-1) sum_j(C_j - R/k)^2 / (k R - sum_i R_i^2) with k = 3
    treatments on the SAME block — the repeated-measures extension of
    McNemar (stat_mcnemar_models compares 2 models on shared examples;
    this compares k engagement steps on shared blocks, where an
    independence-assuming chi-square would be wrong because the same
    block contributes every column). All-or-nothing blocks contribute
    nothing; a fully degenerate table (denominator 0) reports Q = 0
    rather than dividing by zero (ANSI-safe in both engines).

    Exactness: all column/row sums are exact integers (row sums and
    their squares stay BIGINT); Q is one fixed IEEE tree over them,
    quantized at 1e6; verdict vs the chi-square df=k-1 critical value.

    Scale: one user-day flag aggregate (map-side combined), then a
    1-row reduction — nothing downstream exceeds one row."""
    ev = _t(spark, sf_dir, "events")["events"]
    flags = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        *[
            F.max(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"x{i+1}")
            for i, t in enumerate(_COCHRAN_TYPES)
        ]
    )
    r = F.col("x1") + F.col("x2") + F.col("x3")
    agg = flags.agg(
        F.count("*").alias("n_blocks"),
        F.sum("x1").cast("bigint").alias("c1"),
        F.sum("x2").cast("bigint").alias("c2"),
        F.sum("x3").cast("bigint").alias("c3"),
        F.sum(r).cast("bigint").alias("rs"),
        F.sum(r * r).cast("bigint").alias("rs2"),
    )
    mean = F.col("rs").cast("double") / 3.0
    num = sum(
        (F.col(c) - mean) * (F.col(c) - mean) for c in ("c1", "c2", "c3")
    )
    denom = 3 * F.col("rs") - F.col("rs2")
    q = F.when(denom == 0, F.lit(0.0)).otherwise(
        3.0 * 2.0 * num / denom.cast("double")
    )
    return agg.select(
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.col("c1").alias("n_view"),
        F.col("c2").alias("n_click"),
        F.col("c3").alias("n_purchase"),
        _q6(q).alias("q_stat"),
        (q > _CHI2_CRIT_DF2).alias("significant"),
    )
