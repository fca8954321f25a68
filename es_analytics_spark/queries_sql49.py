"""Round-7 batch-49 surface: BM25 ranked retrieval, SAX symbolic
time-series motifs, and the circular block bootstrap for autocorrelated
series.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# BM25 ranked retrieval over the documents corpus
# ---------------------------------------------------------------------------

_BM25_TERMS = ("table", "query", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20

_BM25_SQL = f"""
    WITH words AS MATERIALIZED (
        SELECT doc_id, UNNEST(LIST_FILTER(
            STRING_SPLIT(REGEXP_REPLACE(LOWER(text), '[^a-z]+', ' ', 'g'), ' '),
            w -> LENGTH(w) > 0)) AS w
        FROM documents
    ), dl AS MATERIALIZED (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS len FROM words GROUP BY doc_id
    ), corpus AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(len) AS BIGINT) AS total_len
        FROM dl
    ), tf AS (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
        FROM words WHERE w IN {_BM25_TERMS!r} GROUP BY doc_id, w
    ), df AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
    ), scored AS (
        SELECT tf.doc_id,
               (FLOOR(LN((c.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * 1e6 + 0.5)
                / 1e6)
               * (tf.tf * ({_BM25_K1} + 1.0))
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.len
                    / (CAST(c.total_len AS DOUBLE) / c.n))) AS term_score
        FROM tf
        JOIN df ON df.w = tf.w
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN corpus c
    ), agg AS (
        SELECT doc_id, COUNT(*) AS n_terms_hit,
               FLOOR({dsum_expr('term_score')} * 1e6 + 0.5) / 1e6 AS bm25
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_terms_hit, bm25
    FROM agg
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT {_BM25_TOP}
"""


@query("text_bm25_topk", oracle=_BM25_SQL)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: top-{_BM25_TOP} documents for the fixed
    query {_BM25_TERMS} under Okapi BM25 (k1={_BM25_K1}, b={_BM25_B},
    Lucene's +1 idf form) — THE standard lexical ranking function, the
    sparse arm that text_tfidf_topk approximates and sim_hybrid_search
    style fusion expects; length normalization (the b term) is what
    TF-IDF lacks and long boilerplate docs exploit.

    Exactness: tf, df, and doc lengths are exact integers; idf's LN
    goes through the quantize-at-6 contract; each (doc, term) score is
    a fixed IEEE tree over those values, the per-doc term sum goes
    through the decimal contract, and the final score quantizes at 1e6
    with doc_id breaking ties.

    Scale: one token scan; only query-term postings survive the tf
    filter (|terms| x matching docs); doc lengths join at |docs|; the
    top-k is TakeOrdered."""
    d = _t(spark, sf_dir, "documents")["documents"]
    words = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " "), " "),
                lambda w: F.length(w) > 0,
            )
        ).alias("w"),
    ).transform(cut_lineage)
    dl = words.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("len"))
    corpus = dl.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("len").cast("bigint").alias("total_len"),
    )
    tf = (
        words.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    df = tf.groupBy("w").agg(F.count("*").cast("bigint").alias("df"))
    idf = F.floor(
        F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0) * 1e6
        + F.lit(0.5)
    ) / 1e6
    avgdl = F.col("total_len").cast("double") / F.col("n")
    term_score = (
        idf
        * (F.col("tf") * (_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("len") / avgdl)
        )
    )
    scored = (
        tf.join(F.broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select("doc_id", term_score.alias("term_score"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_terms_hit"),
        _q6(dsum("term_score")).alias("bm25"),
    )
    return agg.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(_BM25_TOP)


# ---------------------------------------------------------------------------
# SAX symbolic motifs over daily series
# ---------------------------------------------------------------------------

# Gaussian breakpoints for a 4-symbol alphabet (standard SAX table)
_SAX_BP = (-0.6744897501960817, 0.0, 0.6744897501960817)
_SAX_PAA = 4  # days per PAA frame
_SAX_WORD = 3  # symbols per motif word

# two-pass spelling: mean first, then sd from deviations (the
# agg_higher_moments recipe), then z -> PAA -> symbol -> word
_SAX_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1, 2
    ), d0 AS (
        SELECT event_type, MIN(day) AS day0 FROM daily GROUP BY event_type
    ), mu AS MATERIALIZED (
        SELECT event_type, COUNT(*) AS n, {dsum_expr('y')} / COUNT(y) AS mu
        FROM daily GROUP BY event_type
    ), sd AS MATERIALIZED (
        SELECT d.event_type, MAX(m.n) AS n, MAX(m.mu) AS mu,
               FLOOR(SQRT(CAST(ROUND(SUM(CAST((d.y - m.mu) * (d.y - m.mu)
                          AS DECIMAL(38,6))), 4) AS DOUBLE) / (MAX(m.n) - 1))
                     * 1e6 + 0.5) / 1e6 AS sd
        FROM daily d JOIN mu m USING (event_type) GROUP BY d.event_type
    ), z AS MATERIALIZED (
        SELECT d.event_type,
               CAST(DATE_DIFF('day', x.day0, d.day) AS BIGINT)
                   // {_SAX_PAA} AS frame,
               FLOOR((d.y - s.mu) / s.sd * 1e6 + 0.5) / 1e6 AS z
        FROM daily d
        JOIN d0 x ON x.event_type = d.event_type
        JOIN sd s ON s.event_type = d.event_type
    ), paa AS MATERIALIZED (
        SELECT event_type, frame,
               CAST(ROUND(SUM(CAST(z AS DECIMAL(38,10))), 6) AS DOUBLE)
                   / COUNT(z) AS v
        FROM z GROUP BY event_type, frame
    ), sym AS (
        SELECT event_type, frame,
               CASE WHEN v < {_SAX_BP[0]!r} THEN 'a'
                    WHEN v < {_SAX_BP[1]!r} THEN 'b'
                    WHEN v < {_SAX_BP[2]!r} THEN 'c'
                    ELSE 'd' END AS s
        FROM paa
    ), wrd AS (
        SELECT event_type,
               s || LEAD(s, 1) OVER (PARTITION BY event_type ORDER BY frame)
                 || LEAD(s, 2) OVER (PARTITION BY event_type ORDER BY frame)
                   AS word
        FROM sym
    ), cnt AS (
        SELECT event_type, word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM wrd WHERE word IS NOT NULL GROUP BY event_type, word
    ), ranked AS (
        SELECT event_type, word, n_occurrences,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY n_occurrences DESC, word ASC) AS rn
        FROM cnt
    )
    SELECT event_type, word AS top_motif, n_occurrences
    FROM ranked WHERE rn <= 3
    ORDER BY event_type, n_occurrences DESC, top_motif
"""


@query("ts_sax_motifs", oracle=_SAX_SQL)
def ts_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic motif mining per event type: z-normalize the daily
    revenue series, PAA-average {_SAX_PAA}-day frames, map each frame
    to a 4-symbol alphabet at the standard Gaussian breakpoints, and
    count {_SAX_WORD}-symbol words — the top-3 recurring motifs per
    series. SAX is the classic symbolic index for "this shape keeps
    happening" questions (recurring ramp-ups, weekly dips) that
    distance-based entries (ts_cross_correlation, ts_periodogram)
    cannot name; a motif table is also the cheap input to anomaly-by-
    rarity (rare words = discords).

    Exactness: the mean comes from the decimal contract and sd from
    the DECIMAL(38,6) deviation sums, both quantized; z quantizes at
    1e6, PAA frame means go through DECIMAL(38,10) division by exact
    counts, and symbol assignment compares against shared double
    breakpoint literals — so the symbol string is identical in both
    engines by construction.

    Scale: everything keys on the series; frames are calendar-bounded
    per-series windows; the motif count is |series| x |alphabet^word|
    bounded."""
    from pyspark.sql.types import DecimalType

    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    d0 = daily.groupBy("event_type").agg(F.min("day").alias("day0"))
    mu = daily.groupBy("event_type").agg(
        F.count("*").alias("n"), (dsum("y") / F.count("y")).alias("mu")
    )
    sd = (
        daily.join(F.broadcast(mu), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.max("mu").alias("mu"),
            (
                F.floor(
                    F.sqrt(
                        F.round(
                            F.sum(
                                (
                                    (F.col("y") - F.col("mu"))
                                    * (F.col("y") - F.col("mu"))
                                ).cast(DecimalType(38, 6))
                            ),
                            4,
                        ).cast("double")
                        / (F.max("n") - 1)
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("sd"),
        )
    )
    z = (
        daily.join(F.broadcast(d0), "event_type")
        .join(F.broadcast(sd.select("event_type", "mu", "sd")), "event_type")
        .select(
            "event_type",
            F.floor(
                F.datediff(F.col("day"), F.col("day0")).cast("bigint") / _SAX_PAA
            ).cast("bigint").alias("frame"),
            _q6((F.col("y") - F.col("mu")) / F.col("sd")).alias("z"),
        )
    )
    paa = z.groupBy("event_type", "frame").agg(
        (
            F.round(F.sum(F.col("z").cast(DecimalType(38, 10))), 6).cast("double")
            / F.count("z")
        ).alias("v")
    )
    sym = paa.select(
        "event_type",
        "frame",
        F.when(F.col("v") < _SAX_BP[0], "a")
        .when(F.col("v") < _SAX_BP[1], "b")
        .when(F.col("v") < _SAX_BP[2], "c")
        .otherwise("d")
        .alias("s"),
    )
    wf = W.partitionBy("event_type").orderBy("frame")
    wrd = sym.select(
        "event_type",
        F.concat(
            F.col("s"), F.lead("s", 1).over(wf), F.lead("s", 2).over(wf)
        ).alias("word"),
    ).filter(F.col("word").isNotNull())
    cnt = wrd.groupBy("event_type", "word").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    )
    ranked = cnt.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("event_type").orderBy(
                F.col("n_occurrences").desc(), F.col("word").asc()
            )
        ),
    ).filter(F.col("rn") <= 3)
    return ranked.select(
        "event_type", F.col("word").alias("top_motif"), "n_occurrences"
    ).orderBy("event_type", F.col("n_occurrences").desc(), "top_motif")


# ---------------------------------------------------------------------------
# Circular block bootstrap CI for the mean of an autocorrelated series
# ---------------------------------------------------------------------------

_BB_B = 100  # resamples
_BB_L = 7  # block length (one week preserves weekly autocorrelation)

_BB_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_DIFF('day',
                   (SELECT MIN(DATE_TRUNC('day', ts)) FROM events),
                   DATE_TRUNC('day', ts)) AS BIGINT) AS i,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), n AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily
    ), gen AS (
        SELECT b.b, blk.j,
               CAST(((b.b * 131 + blk.j) * 9973 + 7919) % 1000003
                    % (SELECT n FROM n) AS BIGINT) AS start
        FROM (SELECT UNNEST(GENERATE_SERIES(0, {_BB_B - 1})) AS b) b
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0,
            CAST(CEIL((SELECT n FROM n) / {_BB_L}.0) AS BIGINT) - 1)) AS j) blk
    ), picks AS (
        SELECT g.b, (g.start + o.o) % (SELECT n FROM n) AS i,
               g.j * {_BB_L} + o.o AS pos
        FROM gen g
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {_BB_L - 1})) AS o) o
        WHERE g.j * {_BB_L} + o.o < (SELECT n FROM n)
    ), means AS MATERIALIZED (
        SELECT p.b,
               FLOOR({dsum_expr('d.y')} / (SELECT n FROM n) * 1e6 + 0.5) / 1e6
                   AS m
        FROM picks p JOIN daily d ON d.i = p.i
        GROUP BY p.b
    ), lo AS (
        SELECT MAX(m) AS ci_lo FROM (
            SELECT m FROM means ORDER BY m ASC, b ASC LIMIT 3)
    ), hi AS (
        SELECT MIN(m) AS ci_hi FROM (
            SELECT m FROM means ORDER BY m DESC, b DESC LIMIT 3)
    ), obs AS (
        SELECT FLOOR({dsum_expr('y')} / COUNT(y) * 1e6 + 0.5) / 1e6 AS mean_obs,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily
    )
    SELECT o.n_days, CAST({_BB_B} AS BIGINT) AS n_resamples,
           o.mean_obs, l.ci_lo, h.ci_hi
    FROM obs o CROSS JOIN lo l CROSS JOIN hi h
"""


@query("stat_block_bootstrap_ci", oracle=_BB_SQL)
def stat_block_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular block bootstrap CI for mean daily revenue: {_BB_B}
    deterministic resamples built from {_BB_L}-day circular blocks
    (block starts are portable-hash functions of (resample, block) —
    the stat_bootstrap_ci generator-not-copies rule), percentile 95%
    bounds as the 3rd-smallest / 3rd-largest resample mean. The i.i.d.
    Poisson bootstrap (stat_bootstrap_ci) UNDERSTATES uncertainty on
    autocorrelated daily series; week-long blocks preserve the serial
    dependence inside each block, which is the whole point of the
    block variant (Künsch 1989 / Politis-Romano).

    Exactness: day indices and block starts are pure BIGINT
    arithmetic; each resample mean is a decimal-contract sum over the
    picked days divided by the exact day count, quantized at 1e6; the
    order statistics are exact selections with resample-id
    tie-breaks — TakeOrdered, no global sort and no window.

    Scale: the resample axis is a generated (B x n/L x L) spine joined
    to the CALENDAR-bounded daily grain — the event-scale table is
    scanned once; B shuffled copies of the data never exist."""
    ev = _t(spark, sf_dir, "events")["events"]
    day0 = ev.agg(F.min(F.date_trunc("day", "ts")).alias("day0"))
    daily = (
        ev.crossJoin(F.broadcast(day0))
        .groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.col("day0"))
            .cast("bigint")
            .alias("i")
        )
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    nrow = daily.agg(F.count("*").cast("bigint").alias("n"))
    import math

    # blocks per resample is data-dependent; build a generous spine and
    # bound it by the broadcast n (deterministic in both engines)
    bs = spark.range(_BB_B).select(F.col("id").alias("b"))
    js = spark.range(4096).select(F.col("id").alias("j"))  # >= ceil(n/L) at any SF
    os_ = spark.range(_BB_L).select(F.col("id").alias("o"))
    gen = (
        bs.crossJoin(js)
        .crossJoin(F.broadcast(nrow))
        .filter(F.col("j") < F.ceil(F.col("n") / float(_BB_L)).cast("bigint"))
        .select(
            "b",
            "j",
            "n",
            (((F.col("b") * 131 + F.col("j")) * 9973 + 7919) % 1000003 % F.col("n"))
            .cast("bigint")
            .alias("start"),
        )
    )
    picks = (
        gen.crossJoin(F.broadcast(os_))
        .filter(F.col("j") * _BB_L + F.col("o") < F.col("n"))
        .select("b", ((F.col("start") + F.col("o")) % F.col("n")).alias("i"), "n")
    )
    means = (
        picks.join(daily, "i")
        .groupBy("b")
        .agg(_q6(dsum("y") / F.max("n")).alias("m"))
        .transform(cut_lineage)
    )
    k = max(int(math.ceil(0.025 * _BB_B)), 1)
    lo = (
        means.orderBy(F.col("m").asc(), F.col("b").asc())
        .limit(k)
        .agg(F.max("m").alias("ci_lo"))
    )
    hi = (
        means.orderBy(F.col("m").desc(), F.col("b").desc())
        .limit(k)
        .agg(F.min("m").alias("ci_hi"))
    )
    obs = daily.agg(
        _q6(dsum("y") / F.count("y")).alias("mean_obs"),
        F.count("*").cast("bigint").alias("n_days"),
    )
    return (
        obs.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n_days",
            F.lit(_BB_B).cast("bigint").alias("n_resamples"),
            "mean_obs",
            "ci_lo",
            "ci_hi",
        )
    )
