"""Round-5 batch-11 surface: piecewise-linear trend with a fitted
changepoint, exact isotonic calibration via the minimax formula,
held-out bigram language-model perplexity per source, the Ljung-Box
whiteness test, and Wilson score confidence intervals.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, integer micro-nat LN terms
(quantize-at-1e-6 precedent), and fixed IEEE trees on exact-int or
decimal-rounded inputs. SQRT is correctly rounded and safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


_DCUM = "CAST(ROUND(SUM(CAST({col} AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Piecewise-linear trend with one fitted changepoint
# ---------------------------------------------------------------------------

# Centered second moments from raw prefix/suffix sums; spelled once and
# reused token-identically for the left and right segments.
_PW_SSE = (
    "(({cyy}) - (({cy}) * ({cy})) / CAST({cn} AS DOUBLE)"
    " - ((({cxy}) - ({cx}) * ({cy}) / CAST({cn} AS DOUBLE))"
    "    * (({cxy}) - ({cx}) * ({cy}) / CAST({cn} AS DOUBLE)))"
    "   / (CAST({cxx} AS DOUBLE) - CAST({cx} AS DOUBLE) * CAST({cx} AS DOUBLE)"
    "      / CAST({cn} AS DOUBLE)))"
)

_PW_SLOPE = (
    "((({cxy}) - ({cx}) * ({cy}) / CAST({cn} AS DOUBLE))"
    " / (CAST({cxx} AS DOUBLE) - CAST({cx} AS DOUBLE) * CAST({cx} AS DOUBLE)"
    "    / CAST({cn} AS DOUBLE)))"
)

_PW_L = dict(cn="cn", cx="cx", cxx="cxx", cy="cy", cxy="cxy", cyy="cyy")
_PW_R = dict(
    cn="(tn - cn)",
    cx="(tx - cx)",
    cxx="(txx - cxx)",
    cy="(ty - cy)",
    cxy="(txy - cxy)",
    cyy="(tyy - cyy)",
)

_PIECEWISE_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), pts AS MATERIALIZED (
        SELECT CAST(DATEDIFF('day', (SELECT MIN(day) FROM daily), day)
                    AS BIGINT) AS i, y
        FROM daily
    ), cum AS MATERIALIZED (
        SELECT i,
               CAST(COUNT(*) OVER w AS BIGINT) AS cn,
               CAST(SUM(i) OVER w AS BIGINT) AS cx,
               CAST(SUM(i * i) OVER w AS BIGINT) AS cxx,
               {_DCUM.format(col='y')} AS cy,
               {_DCUM.format(col='i * y')} AS cxy,
               {_DCUM.format(col='y * y')} AS cyy
        FROM pts
        WINDOW w AS (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS tn, CAST(SUM(i) AS BIGINT) AS tx,
               CAST(SUM(i * i) AS BIGINT) AS txx,
               {dsum_expr('y')} AS ty, {dsum_expr('i * y')} AS txy,
               {dsum_expr('y * y')} AS tyy
        FROM pts
    ), cand AS (
        SELECT i AS bp, cn, tn,
               FLOOR(({_PW_SSE.format(**_PW_L)}
                      + {_PW_SSE.format(**_PW_R)}) * 1e6 + 0.5) / 1e6 AS sse,
               {_PW_SLOPE.format(**_PW_L)} AS sl,
               {_PW_SLOPE.format(**_PW_R)} AS sr
        FROM cum CROSS JOIN tot
        WHERE cn >= 2 AND tn - cn >= 2
    )
    SELECT CAST(bp AS BIGINT) AS breakpoint_idx,
           CAST(tn AS BIGINT) AS n_days,
           FLOOR(sl * 1e6 + 0.5) / 1e6 AS slope_left,
           FLOOR(sr * 1e6 + 0.5) / 1e6 AS slope_right,
           sse AS sse_total
    FROM cand QUALIFY ROW_NUMBER() OVER (ORDER BY sse ASC, bp ASC) = 1
"""


@query("ts_piecewise_trend", oracle=_PIECEWISE_SQL)
def ts_piecewise_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise-linear trend: fit two least-squares segments to the
    daily-revenue series with the changepoint CHOSEN by total SSE —
    the "did growth bend, and when" primitive (the trend half of a
    Prophet-style decomposition; ts_causal_impact_lite assumes the
    break date, this one finds it).

    Exactness: prefix counts/Σi/Σi² are exact integers; Σy/Σiy/Σy²
    prefixes are exact windowed DECIMAL sums rounded to scale 4 (the
    dsum convention as a window); suffix stats derive by subtraction;
    per-candidate SSE and slopes are fixed IEEE trees spelled from one
    shared template for both segments and both engines, with the SSE
    quantized at 1e-6 before the argmin (tie: earliest breakpoint).

    Scale: one shuffle to the daily grain, then every window/argmin
    runs over the |days| frame — calendar-bounded (allowlisted
    single-partition shape), the same bound as ts_max_drawdown. The
    candidate scan is O(|days|), not O(|days| x rows)."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    mins = daily.agg(F.min("day").alias("day0"))
    pts = (
        daily.crossJoin(F.broadcast(mins))
        .select(
            F.datediff(F.col("day"), F.col("day0")).cast("bigint").alias("i"),
            "y",
        )
        .transform(cut_lineage)
    )
    wcum = W.orderBy("i").rowsBetween(W.unboundedPreceding, W.currentRow)
    dcum = lambda c: (  # noqa: E731
        F.round(F.sum(c.cast("decimal(38,10)")).over(wcum), 4).cast("double")
    )
    cum = pts.select(
        "i",
        F.count(F.lit(1)).over(wcum).cast("bigint").alias("cn"),
        F.sum("i").over(wcum).cast("bigint").alias("cx"),
        F.sum(F.col("i") * F.col("i")).over(wcum).cast("bigint").alias("cxx"),
        dcum(F.col("y")).alias("cy"),
        dcum(F.col("i") * F.col("y")).alias("cxy"),
        dcum(F.col("y") * F.col("y")).alias("cyy"),
    )
    tot = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("tn"),
        F.sum("i").cast("bigint").alias("tx"),
        F.sum(F.col("i") * F.col("i")).cast("bigint").alias("txx"),
        dsum("y").alias("ty"),
        dsum(F.col("i") * F.col("y")).alias("txy"),
        dsum(F.col("y") * F.col("y")).alias("tyy"),
    )

    def seg(cn, cx, cxx, cy, cxy, cyy):
        cnd = cn.cast("double")
        sxy = cxy - cx * cy / cnd
        sxx = cxx.cast("double") - cx.cast("double") * cx.cast("double") / cnd
        sse = cyy - (cy * cy) / cnd - (sxy * sxy) / sxx
        return sse, sxy / sxx

    c = lambda n: F.col(n)  # noqa: E731
    sse_l, sl = seg(c("cn"), c("cx"), c("cxx"), c("cy"), c("cxy"), c("cyy"))
    sse_r, sr = seg(
        c("tn") - c("cn"),
        c("tx") - c("cx"),
        c("txx") - c("cxx"),
        c("ty") - c("cy"),
        c("txy") - c("cxy"),
        c("tyy") - c("cyy"),
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .filter((F.col("cn") >= 2) & (F.col("tn") - F.col("cn") >= 2))
        .select(
            F.col("i").alias("bp"),
            "tn",
            _q6(sse_l + sse_r).alias("sse"),
            sl.alias("sl"),
            sr.alias("sr"),
        )
    )
    wmin = W.orderBy(F.asc("sse"), F.asc("bp"))
    return (
        cand.withColumn("rk", F.row_number().over(wmin))
        .filter(F.col("rk") == 1)
        .select(
            F.col("bp").cast("bigint").alias("breakpoint_idx"),
            F.col("tn").cast("bigint").alias("n_days"),
            _q6(F.col("sl")).alias("slope_left"),
            _q6(F.col("sr")).alias("slope_right"),
            F.col("sse").alias("sse_total"),
        )
    )


# ---------------------------------------------------------------------------
# Exact isotonic calibration (minimax formula over score bins)
# ---------------------------------------------------------------------------

_ISO_BAND = 25.0
_ISO_MAXBIN = 19

_ISO_SQL = f"""
    WITH bins AS MATERIALIZED (
        SELECT LEAST(CAST(FLOOR(value / {_ISO_BAND}) AS BIGINT),
                     {_ISO_MAXBIN}) AS b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS pos
        FROM events GROUP BY 1
    ), pre AS MATERIALIZED (
        SELECT b, n, pos,
               CAST(SUM(n) OVER w AS BIGINT) AS cn,
               CAST(SUM(pos) OVER w AS BIGINT) AS cp
        FROM bins
        WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), inner_min AS (
        -- for each (i, j<=i): min over k>=i of the pooled mean on [j,k]
        SELECT i.b AS bi, j.b AS bj,
               MIN(CAST(k.cp - (j.cp - j.pos) AS DOUBLE)
                   / CAST(k.cn - (j.cn - j.n) AS DOUBLE)) AS m
        FROM pre i JOIN pre j ON j.b <= i.b JOIN pre k ON k.b >= i.b
        GROUP BY 1, 2
    ), iso AS (
        SELECT bi AS b, MAX(m) AS iso_rate FROM inner_min GROUP BY 1
    )
    SELECT bins.b AS bin, bins.n, bins.pos,
           FLOOR(CAST(bins.pos AS DOUBLE) / CAST(bins.n AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS rate,
           FLOOR(iso.iso_rate * 1e6 + 0.5) / 1e6 AS iso_rate
    FROM bins JOIN iso ON iso.b = bins.b
"""


@query("ml_isotonic_calibration", oracle=_ISO_SQL)
def ml_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT isotonic regression of purchase rate on the event-value
    score (20 bins): the weighted monotone fit via the minimax
    characterization iso[i] = max_{j<=i} min_{k>=i} pooledMean(j..k) —
    the calibration step (Zadrozny-Elkan) that ml_calibration_brier
    diagnoses and Platt/isotonic fixes. Unlike the sequential
    pool-adjacent-violators algorithm, the minimax form is pure
    relational algebra, so the oracle checks the actual fit.

    Exactness: bin counts and prefix sums are exact integers; every
    pooled mean is ONE double division of exact ints (identical in
    both engines); MIN/MAX over identical doubles are exact; outputs
    quantize at 1e-6.

    Scale: one scan to the constant 20-bin grain; the minimax triple
    join is bins^3 <= 8000 rows of arithmetic — data-independent. At
    scale the bin grain is what you'd isotonize anyway (per-row
    isotonic is a modeling error at 100 TB, not a systems problem)."""
    e = _t(spark, sf_dir, "events")["events"]
    bins = (
        e.groupBy(
            F.least(
                F.floor(F.col("value") / F.lit(_ISO_BAND)).cast("bigint"),
                F.lit(_ISO_MAXBIN).cast("bigint"),
            ).alias("b")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_if(F.col("event_type") == "purchase")
            .cast("bigint")
            .alias("pos"),
        )
        .transform(cut_lineage)
    )
    wpre = W.orderBy("b").rowsBetween(W.unboundedPreceding, W.currentRow)
    pre = bins.select(
        "b",
        "n",
        "pos",
        F.sum("n").over(wpre).cast("bigint").alias("cn"),
        F.sum("pos").over(wpre).cast("bigint").alias("cp"),
    ).transform(cut_lineage)
    i, j, k = pre.alias("i"), pre.alias("j"), pre.alias("k")
    inner = (
        i.join(F.broadcast(j), F.col("j.b") <= F.col("i.b"))
        .join(F.broadcast(k), F.col("k.b") >= F.col("i.b"))
        .groupBy(F.col("i.b").alias("bi"), F.col("j.b").alias("bj"))
        .agg(
            F.min(
                (
                    F.col("k.cp") - (F.col("j.cp") - F.col("j.pos"))
                ).cast("double")
                / (
                    F.col("k.cn") - (F.col("j.cn") - F.col("j.n"))
                ).cast("double")
            ).alias("m")
        )
    )
    iso = inner.groupBy(F.col("bi").alias("b")).agg(
        F.max("m").alias("iso_rate")
    )
    return bins.join(iso, "b").select(
        F.col("b").alias("bin"),
        "n",
        "pos",
        _q6(F.col("pos").cast("double") / F.col("n").cast("double")).alias(
            "rate"
        ),
        _q6(F.col("iso_rate")).alias("iso_rate"),
    )


# ---------------------------------------------------------------------------
# Held-out bigram LM perplexity per source
# ---------------------------------------------------------------------------

_LM_SQL = """
    WITH toks AS MATERIALIZED (
        SELECT doc_id, source,
               UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS w,
               GENERATE_SUBSCRIPTS(
                   STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), 1) AS pos
        FROM documents
    ), big AS MATERIALIZED (
        SELECT a.doc_id, a.source, a.w AS w1, b.w AS w2
        FROM toks a JOIN toks b
          ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        WHERE a.w <> '' AND b.w <> ''
    ), c12 AS MATERIALIZED (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big
        WHERE doc_id % 2 = 0 GROUP BY 1, 2
    ), c1 AS MATERIALIZED (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1
    ), vv AS (
        SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM toks
        WHERE doc_id % 2 = 0 AND w <> ''
    ), scored AS (
        SELECT t.source,
               CAST(FLOOR(-LN(CAST(COALESCE(c.c12, 0) + 1 AS DOUBLE)
                    / CAST(COALESCE(u.c1, 0) + (SELECT v FROM vv) AS DOUBLE))
                    * 1e6 + 0.5) AS BIGINT) AS nll_u
        FROM big t
        LEFT JOIN c12 c ON c.w1 = t.w1 AND c.w2 = t.w2
        LEFT JOIN c1 u ON u.w1 = t.w1
        WHERE t.doc_id % 2 = 1
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(nll_u) AS BIGINT) AS nll_unats,
           FLOOR(CAST(SUM(nll_u) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e6
                 * 1e6 + 0.5) / 1e6 AS nll_per_bigram
    FROM scored GROUP BY source
"""


@query("text_lm_perplexity_heldout", oracle=_LM_SQL)
def text_lm_perplexity_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram language-model cross-entropy per source: train an
    add-one-smoothed bigram LM on even doc_ids, score the odd half,
    report mean negative log-likelihood per bigram BY SOURCE — the
    distribution-shift screen (a source whose held-out NLL is far off
    corpus norm is out-of-domain or corrupted). Complements
    text_lm_quality (unigram, per-doc, no split) and
    text_conditional_entropy (corpus H(w2|w1), no held-out eval) with
    the actual train/test LM protocol.

    Exactness: bigram/unigram counts and vocabulary size are exact
    integers from the train half; each NLL term is one LN over a ratio
    of exact-int doubles, quantized to integer micro-nats before the
    per-source sum (exact); the per-bigram mean is one quantized
    division.

    Scale: bigrams come from a position self-join at the doc grain
    (per-doc bounded); the model is a (w1, w2)-keyed DataFrame joined
    back by key — the model never leaves the cluster, the same
    distributed-scoring shape as ml_naive_bayes_langid."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos0", "w"
        ),
    )
    wnext = W.partitionBy("doc_id").orderBy("pos0")
    big = (
        toks.select(
            "doc_id",
            "source",
            F.col("w").alias("w1"),
            F.lead("w").over(wnext).alias("w2"),
        )
        .filter(
            (F.col("w1") != "") & (F.col("w2") != "") & F.col("w2").isNotNull()
        )
        .transform(cut_lineage)
    )
    train = big.filter(F.col("doc_id") % 2 == 0)
    c12 = train.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    vv = (
        toks.filter((F.col("doc_id") % 2 == 0) & (F.col("w") != ""))
        .select("w")
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    scored = (
        big.filter(F.col("doc_id") % 2 == 1)
        .join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vv))
        .select(
            "source",
            F.floor(
                -F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1).cast("double")
                    / (
                        F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")
                    ).cast("double")
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("nll_u"),
        )
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("nll_u").cast("bigint").alias("nll_unats"),
        _q6(
            F.sum("nll_u").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1e6)
        ).alias("nll_per_bigram"),
    )


# ---------------------------------------------------------------------------
# Ljung-Box whiteness test per event type
# ---------------------------------------------------------------------------

_LB_SQL = f"""
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS x
        FROM events GROUP BY 1, 2
    ), mu AS (
        SELECT event_type, {dsum_expr('x')} / COUNT(x) AS m, COUNT(*) AS n
        FROM daily GROUP BY event_type
    ), dev AS (
        SELECT d.event_type, m.n, (d.x - m.m) AS d,
               LAG(d.x - m.m, 1) OVER w AS d1,
               LAG(d.x - m.m, 2) OVER w AS d2,
               LAG(d.x - m.m, 3) OVER w AS d3
        FROM daily d JOIN mu m USING (event_type)
        WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)
    ), rs AS (
        SELECT event_type, ANY_VALUE(n) AS n,
               FLOOR({dsum_expr('d * d1')} / {dsum_expr('d * d')}
                     * 1e6 + 0.5) / 1e6 AS r1,
               FLOOR({dsum_expr('d * d2')} / {dsum_expr('d * d')}
                     * 1e6 + 0.5) / 1e6 AS r2,
               FLOOR({dsum_expr('d * d3')} / {dsum_expr('d * d')}
                     * 1e6 + 0.5) / 1e6 AS r3
        FROM dev GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days, r1, r2, r3,
           FLOOR(CAST(n * (n + 2) AS DOUBLE)
                 * (r1 * r1 / CAST(n - 1 AS DOUBLE)
                    + r2 * r2 / CAST(n - 2 AS DOUBLE)
                    + r3 * r3 / CAST(n - 3 AS DOUBLE)) * 1e6 + 0.5) / 1e6
               AS q_lb
    FROM rs
"""


@query("stat_ljung_box", oracle=_LB_SQL)
def stat_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q (lags 1-3) per event type's daily-revenue series:
    the portmanteau "is this series white noise" test that turns
    ts_autocorrelation's individual r_k values into one chi-square-
    distributed statistic — the standard residual-whiteness check
    after fitting ts_holt_linear / ts_piecewise_trend class models
    (large Q = structure left unmodeled).

    Exactness: r1-r3 follow ts_autocorrelation's decimal contract and
    are quantized at 1e-6 BEFORE entering Q; n is an exact day count;
    Q is one fixed IEEE tree on those values, spelled identically in
    both engines.

    Scale: identical shape to ts_autocorrelation — one shuffle to the
    calendar-bounded (type, day) grain, per-type windows, a |types|-row
    reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("x"))
        .transform(cut_lineage)
    )
    mu = daily.groupBy("event_type").agg(
        (dsum("x") / F.count("x")).alias("m"), F.count(F.lit(1)).alias("n")
    )
    w = W.partitionBy("event_type").orderBy("day")
    dev = (
        daily.join(F.broadcast(mu), "event_type")
        .withColumn("d", F.col("x") - F.col("m"))
        .select(
            "event_type",
            "n",
            "d",
            F.lag("d", 1).over(w).alias("d1"),
            F.lag("d", 2).over(w).alias("d2"),
            F.lag("d", 3).over(w).alias("d3"),
        )
    )

    def r(k: str):
        return _q6(dsum(F.col("d") * F.col(k)) / dsum(F.col("d") * F.col("d")))

    rs = dev.groupBy("event_type").agg(
        F.any_value("n").alias("n"),
        r("d1").alias("r1"),
        r("d2").alias("r2"),
        r("d3").alias("r3"),
    )
    nd = lambda off: (F.col("n") - F.lit(off)).cast("double")  # noqa: E731
    return rs.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        "r1",
        "r2",
        "r3",
        _q6(
            (F.col("n") * (F.col("n") + 2)).cast("double")
            * (
                F.col("r1") * F.col("r1") / nd(1)
                + F.col("r2") * F.col("r2") / nd(2)
                + F.col("r3") * F.col("r3") / nd(3)
            )
        ).alias("q_lb"),
    )


# ---------------------------------------------------------------------------
# Wilson score confidence intervals
# ---------------------------------------------------------------------------

_WILSON_Z = "1.96"  # 95% normal quantile, shared literal
_WILSON_THRESH = 100.0

_WILSON_SQL = f"""
    WITH g AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE value >= {_WILSON_THRESH})
                    AS BIGINT) AS k
        FROM events GROUP BY 1
    )
    SELECT event_type, n, k,
           FLOOR(CAST(k AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS p_hat,
           FLOOR(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                   + {_WILSON_Z} * {_WILSON_Z} / (2 * CAST(n AS DOUBLE))
                   - {_WILSON_Z} * SQRT(
                       CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + {_WILSON_Z} * {_WILSON_Z}
                         / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                  / (1 + {_WILSON_Z} * {_WILSON_Z} / CAST(n AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS wilson_lo,
           FLOOR(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                   + {_WILSON_Z} * {_WILSON_Z} / (2 * CAST(n AS DOUBLE))
                   + {_WILSON_Z} * SQRT(
                       CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + {_WILSON_Z} * {_WILSON_Z}
                         / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
                  / (1 + {_WILSON_Z} * {_WILSON_Z} / CAST(n AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS wilson_hi
    FROM g
"""


@query("stat_wilson_ci", oracle=_WILSON_SQL)
def stat_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% confidence interval for the high-value-event
    rate per event type — the binomial CI that stays inside [0,1] and
    behaves at small n or extreme rates, where the Wald interval
    ab_ztest_srm-style pipelines default to is famously wrong; this is
    the right error bar for every rate the catalog reports.

    Exactness: n and k are exact counts; the interval is one fixed
    IEEE tree on exact-int doubles with a shared z = 1.96 literal and
    one correctly rounded SQRT, quantized at 1e-6.

    Scale: a single map-side-combinable scan aggregate to the |types|
    grain; the CI math is per-group constant work."""
    e = _t(spark, sf_dir, "events")["events"]
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_if(F.col("value") >= F.lit(_WILSON_THRESH))
        .cast("bigint")
        .alias("k"),
    )
    z = F.lit(1.96)
    nd = F.col("n").cast("double")
    p = F.col("k").cast("double") / nd
    center = p + z * z / (2 * nd)
    half = z * F.sqrt(p * (1 - p) / nd + z * z / (4 * nd * nd))
    denom = 1 + z * z / nd
    return g.select(
        "event_type",
        "n",
        "k",
        _q6(p).alias("p_hat"),
        _q6((center - half) / denom).alias("wilson_lo"),
        _q6((center + half) / denom).alias("wilson_hi"),
    )
