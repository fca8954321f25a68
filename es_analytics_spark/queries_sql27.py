"""Round-5 batch-27 surface: the Pythagorean mean family, rolling
7-day distinct users (exact vs KMV sketch, with the error readout),
and a Heaps'-law vocabulary-growth fit.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.portable import (
    MIX_P as _MIX_P,
    accept_hash as _accept_hash,
    accept_hash_sql as _accept_hash_sql,
)
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Pythagorean mean family per event type
# ---------------------------------------------------------------------------

_MEANS_SQL = f"""
    WITH pos AS MATERIALIZED (
        SELECT event_type, value FROM events WHERE value > 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pos,
           FLOOR({dsum_expr('value')} / COUNT(*) * 1e6 + 0.5) / 1e6
               AS mean_arith,
           FLOOR(EXP({dsum_expr('LN(value)')} / COUNT(*)) * 1e6 + 0.5) / 1e6
               AS mean_geom,
           FLOOR(COUNT(*) / {dsum_expr('1.0 / value')} * 1e6 + 0.5) / 1e6
               AS mean_harm
    FROM pos GROUP BY event_type
"""


@query("agg_mean_family", oracle=_MEANS_SQL)
def agg_mean_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pythagorean mean family per event type over positive values:
    arithmetic, geometric (the right average for ratios/growth rates),
    and harmonic (the right average for rates like items/second) — the
    AM >= GM >= HM triple every metrics glossary needs and plain AVG
    silently gets wrong for ratio metrics. Zero/negative values are
    excluded (geometric/harmonic are undefined there) — documented
    domain, identical filter on both engines.

    Exactness: the geometric mean decimal-sums LN-on-identical-doubles
    terms (the catalog LN precedent) with one EXP at the end; the
    harmonic mean decimal-sums identical 1/x terms; all three quantize
    at 1e-6.

    Scale: one map-side-combinable aggregate; |types| output rows."""
    e = _t(spark, sf_dir, "events")["events"]
    pos = e.filter(F.col("value") > 0)
    return pos.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
        _q6(dsum("value") / F.count(F.lit(1))).alias("mean_arith"),
        _q6(F.exp(dsum(F.log("value")) / F.count(F.lit(1)))).alias("mean_geom"),
        _q6(F.count(F.lit(1)) / dsum(F.lit(1.0) / F.col("value"))).alias(
            "mean_harm"
        ),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day distinct users: exact vs KMV sketch
# ---------------------------------------------------------------------------

_RKMV_K = 64
_RKMV_WIN = 7

_RKMV_SQL = f"""
    WITH du AS MATERIALIZED (
        SELECT DISTINCT
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               user_id,
               {_accept_hash_sql('user_id')} AS h
        FROM events
    ), days AS MATERIALIZED (
        SELECT DISTINCT day FROM du
    ), contrib AS MATERIALIZED (
        SELECT d.day AS tday, du.user_id, du.h
        FROM du JOIN days d
          ON d.day BETWEEN du.day AND du.day + {_RKMV_WIN - 1}
    ), dedup AS MATERIALIZED (
        SELECT DISTINCT tday, user_id, h FROM contrib
    ), exact AS (
        SELECT tday, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM dedup GROUP BY tday
    ), hashes AS MATERIALIZED (
        SELECT DISTINCT tday, h FROM dedup
    ), ranked AS (
        SELECT tday, h,
               ROW_NUMBER() OVER (PARTITION BY tday ORDER BY h) AS rn,
               COUNT(*) OVER (PARTITION BY tday) AS nh
        FROM hashes
    ), kth AS (
        SELECT tday, ANY_VALUE(nh) AS n_hashes,
               MAX(CASE WHEN rn = {_RKMV_K} THEN h END) AS hk
        FROM ranked WHERE rn <= {_RKMV_K} GROUP BY tday
    ), est AS (
        SELECT tday,
               CASE WHEN n_hashes < {_RKMV_K} THEN CAST(n_hashes AS DOUBLE)
                    ELSE FLOOR(({_RKMV_K} - 1) * {_MIX_P} * 1.0 / hk
                               * 1e4 + 0.5) / 1e4 END AS kmv_estimate
        FROM kth
    )
    SELECT e.tday AS day, e.exact_distinct, s.kmv_estimate,
           FLOOR(ABS(s.kmv_estimate - e.exact_distinct)
                 / e.exact_distinct * 1e6 + 0.5) / 1e6 AS rel_error
    FROM exact e JOIN est s ON s.tday = e.tday
"""


@query("ts_rolling_distinct_kmv", oracle=_RKMV_SQL)
def ts_rolling_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users per day, computed BOTH ways: the
    exact distinct count and the KMV k-minimum-values sketch estimate,
    with the per-day relative error — the sliding-window distinct
    problem every DAU/WAU dashboard has (exact sliding distincts don't
    decompose: you can't subtract yesterday; sketches make the window
    mergeable at fixed memory), shipped here WITH its own accuracy
    audit (agg_kmv_distinct sketches static sets; this slides the
    window and shows what the sketch costs day by day).

    Exactness: the portable LCG mix hash is shared with the oracle, so
    the k-smallest-distinct-hash state is bit-identical; the estimator
    is exact integers into one quantized division; exact counts are
    exact.

    Scale: the day->window fan-out is a bounded x7 explode of the
    (day, user) grain; per-day k-min selection is a partitioned rank.
    At 100 TB the sketch arm is the one you keep (fixed k state,
    mergeable); the exact arm is the audit you run on a sample."""
    e = _t(spark, sf_dir, "events")["events"]
    du = (
        e.select(
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
            .cast("bigint")
            .alias("day"),
            "user_id",
        )
        .distinct()
        .withColumn("h", _accept_hash(F.col("user_id")))
        .transform(cut_lineage)
    )
    days = du.select("day").distinct().select(F.col("day").alias("tday"))
    contrib = du.join(
        F.broadcast(days),
        (F.col("tday") >= F.col("day"))
        & (F.col("tday") <= F.col("day") + (_RKMV_WIN - 1)),
    )
    dedup = contrib.select("tday", "user_id", "h").distinct().transform(
        cut_lineage
    )
    exact = dedup.groupBy("tday").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct")
    )
    hashes = dedup.select("tday", "h").distinct()
    wr = W.partitionBy("tday").orderBy("h")
    ranked = hashes.select(
        "tday",
        "h",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("tday")).alias("nh"),
    )
    kth = (
        ranked.filter(F.col("rn") <= _RKMV_K)
        .groupBy("tday")
        .agg(
            F.any_value("nh").alias("n_hashes"),
            F.max(F.when(F.col("rn") == _RKMV_K, F.col("h"))).alias("hk"),
        )
    )
    est = kth.select(
        "tday",
        F.when(
            F.col("n_hashes") < _RKMV_K, F.col("n_hashes").cast("double")
        )
        .otherwise(
            F.floor(
                (_RKMV_K - 1) * _MIX_P * F.lit(1.0) / F.col("hk") * 1e4
                + F.lit(0.5)
            )
            / 1e4
        )
        .alias("kmv_estimate"),
    )
    return exact.join(est, "tday").select(
        F.col("tday").alias("day"),
        "exact_distinct",
        "kmv_estimate",
        _q6(
            F.abs(F.col("kmv_estimate") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        ).alias("rel_error"),
    )


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth fit
# ---------------------------------------------------------------------------

_HEAPS_POINTS = 10


def _heaps_sql() -> str:
    cut_union = "\n        UNION ALL ".join(
        f"SELECT {k} AS chk, ROUND(QUANTILE_CONT(doc_id, {k / 10}), 4) AS cutoff"
        " FROM docs"
        for k in range(1, _HEAPS_POINTS + 1)
    )
    return f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
                           x -> LENGTH(x) >= 2) AS arr
        FROM documents
    ), docs AS MATERIALIZED (
        SELECT doc_id, LEN(arr) AS n_words FROM toks
    ), firsts AS MATERIALIZED (
        SELECT w, CAST(MIN(doc_id) AS BIGINT) AS first_doc
        FROM (SELECT doc_id, UNNEST(arr) AS w FROM toks) GROUP BY w
    ), cuts AS MATERIALIZED (
        {cut_union}
    ), pts AS MATERIALIZED (
        SELECT c.chk, c.cutoff,
               (SELECT CAST(SUM(n_words) AS BIGINT) FROM docs
                WHERE doc_id <= c.cutoff) AS n_tokens,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM firsts
                WHERE first_doc <= c.cutoff) AS vocab
        FROM cuts c
    ), lp AS MATERIALIZED (
        SELECT chk, cutoff, n_tokens, vocab,
               LN(CAST(n_tokens AS DOUBLE)) AS x,
               LN(CAST(vocab AS DOUBLE)) AS y
        FROM pts WHERE n_tokens > 0 AND vocab > 0
    ), fit AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS np,
               {dsum_expr('x')} AS sx, {dsum_expr('y')} AS sy,
               {dsum_expr('x * x')} AS sxx, {dsum_expr('x * y')} AS sxy
        FROM lp
    )
    SELECT lp.chk AS checkpoint, lp.n_tokens, lp.vocab,
           FLOOR((fit.sxy - fit.sx * fit.sy / fit.np)
                 / (fit.sxx - fit.sx * fit.sx / fit.np) * 1e6 + 0.5) / 1e6
               AS heaps_beta,
           FLOOR(EXP(fit.sy / fit.np
                     - (fit.sxy - fit.sx * fit.sy / fit.np)
                       / (fit.sxx - fit.sx * fit.sx / fit.np)
                       * (fit.sx / fit.np)) * 1e6 + 0.5) / 1e6 AS heaps_k
    FROM lp CROSS JOIN fit
"""


@query("text_heaps_law", oracle=_heaps_sql())
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth fit: cumulative vocabulary size V
    vs cumulative token count N at ten doc-order checkpoints, with the
    log-log fit V = K * N^beta — the sublinear vocabulary-growth law
    (beta ~ 0.4-0.6 for natural text) that sizes tokenizer vocabularies
    and predicts how much NEW vocabulary the next 10x of corpus will
    bring (text_zipf_exponent is the frequency-rank dual; Heaps is the
    growth view a data-acquisition plan needs).

    The cumulative counts need NO prefix rescans: each word's FIRST
    document (one vocab-grain min) turns "vocabulary at checkpoint"
    into a count of first_doc <= cutoff — the same trick as
    ts_cumulative_users.

    Exactness: checkpoints are shared-quantile doc_id cutoffs (1e-4);
    token/vocab counts are exact integers; the log-log fit decimal-sums
    LN-on-exact-integer terms over the 10-point support; beta and K
    are quantized fixed trees (one EXP).

    Scale: one corpus scan for tokens, one vocab-grain min, 10
    broadcast threshold counts — no window over anything data-sized."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) >= 2
        ).alias("arr"),
    )
    docs = toks.select("doc_id", F.size("arr").alias("n_words")).transform(
        cut_lineage
    )
    firsts = (
        toks.select("doc_id", F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.min("doc_id").cast("bigint").alias("first_doc"))
        .transform(cut_lineage)
    )
    cuts = None
    for k in range(1, _HEAPS_POINTS + 1):
        row = docs.agg(
            F.lit(k).alias("chk"),
            F.round(F.percentile("doc_id", F.lit(k / 10)), 4).alias("cutoff"),
        )
        cuts = row if cuts is None else cuts.unionAll(row)
    ntok = (
        docs.crossJoin(F.broadcast(cuts))
        .filter(F.col("doc_id") <= F.col("cutoff"))
        .groupBy("chk", "cutoff")
        .agg(F.sum("n_words").cast("bigint").alias("n_tokens"))
    )
    voc = (
        firsts.crossJoin(F.broadcast(cuts))
        .filter(F.col("first_doc") <= F.col("cutoff"))
        .groupBy("chk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("vocab"))
    )
    lp = (
        ntok.join(voc, "chk")
        .filter((F.col("n_tokens") > 0) & (F.col("vocab") > 0))
        .select(
            "chk",
            "n_tokens",
            "vocab",
            F.log(F.col("n_tokens").cast("double")).alias("x"),
            F.log(F.col("vocab").cast("double")).alias("y"),
        )
        .transform(cut_lineage)
    )
    fit = lp.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("np")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("np")
    )
    return lp.crossJoin(F.broadcast(fit)).select(
        F.col("chk").alias("checkpoint"),
        "n_tokens",
        "vocab",
        _q6(slope).alias("heaps_beta"),
        _q6(
            F.exp(F.col("sy") / F.col("np") - slope * (F.col("sx") / F.col("np")))
        ).alias("heaps_k"),
    )
