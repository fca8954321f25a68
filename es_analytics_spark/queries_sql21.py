"""Round-5 batch-21 surface: order-to-ship lag percentiles, effect
sizes (Cohen's d / Hedges' g / Glass's delta), TextRank-style keyphrase
ranking (weighted PageRank over the word co-occurrence graph, under
the exact-compare iteration contract), a rolling 7-day correlation
between two daily series, and per-source corpus language composition.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.fanout import broadcast_if_small
from es_analytics_spark.functions.lineage import cut_lineage, cut_lineage_lazy
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql2 import _dsum12_sql


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Order-to-ship lag percentiles per ship month
# ---------------------------------------------------------------------------

_LAG_LATE_DAYS = 90

_LAG_SQL = f"""
    WITH lags AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('month', l.l_shipdate) AS TIMESTAMP) AS ship_month,
               CAST(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(QUANTILE_CONT(lag_days, 0.5), 4) AS p50_lag_days,
           ROUND(QUANTILE_CONT(lag_days, 0.9), 4) AS p90_lag_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_lag_days,
           FLOOR(CAST(COUNT(*) FILTER (WHERE lag_days > {_LAG_LATE_DAYS})
                      AS DOUBLE) / COUNT(*) * 1e6 + 0.5) / 1e6 AS late_share
    FROM lags GROUP BY ship_month
"""


@query("ts_shipping_lag_percentiles", oracle=_LAG_SQL)
def ts_shipping_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment lag profile per ship month: median and
    p90 lag in days, the worst case, and the share of lines later than
    {_LAG_LATE_DAYS} days — the operational SLA table a fulfillment
    review reads (tpch_q12 classifies by priority; this tracks the
    latency DISTRIBUTION over time, which is what degrades first).

    Exactness: lags are exact integer day differences; percentiles use
    the shared interpolated-quantile contract (Spark percentile ==
    DuckDB QUANTILE_CONT, rounded at 1e-4); the late share is one
    quantized division of exact counts.

    Scale: one join shuffle (orderkey-keyed), one month-grain
    aggregate with a single-pass percentile — no windows."""
    t = _t(spark, sf_dir, "lineitem", "orders")
    lags = (
        t["lineitem"]
        .join(
            t["orders"].select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.date_trunc("month", "l_shipdate").alias("ship_month"),
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
            .cast("bigint")
            .alias("lag_days"),
        )
        .transform(cut_lineage)
    )
    return lags.groupBy("ship_month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.round(F.percentile("lag_days", F.lit(0.5)), 4).alias("p50_lag_days"),
        F.round(F.percentile("lag_days", F.lit(0.9)), 4).alias("p90_lag_days"),
        F.max("lag_days").cast("bigint").alias("max_lag_days"),
        _q6(
            F.count_if(F.col("lag_days") > _LAG_LATE_DAYS).cast("double")
            / F.count(F.lit(1))
        ).alias("late_share"),
    )


# ---------------------------------------------------------------------------
# Effect sizes between variants on per-user purchase revenue
# ---------------------------------------------------------------------------

_EFFECT_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               {dsum_expr("CASE WHEN event_type = 'purchase'"
                          " THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY 1, 2
    ), mom AS (
        SELECT CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS n0,
               CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS n1,
               {dsum_expr('CASE WHEN variant = 0 THEN rev END')} AS s0,
               {dsum_expr('CASE WHEN variant = 1 THEN rev END')} AS s1,
               {dsum_expr('CASE WHEN variant = 0 THEN rev * rev END')} AS ss0,
               {dsum_expr('CASE WHEN variant = 1 THEN rev * rev END')} AS ss1
        FROM pu
    ), stats AS (
        SELECT n0, n1, s0 / n0 AS m0, s1 / n1 AS m1,
               (ss0 - s0 * s0 / n0) / (n0 - 1) AS v0,
               (ss1 - s1 * s1 / n1) / (n1 - 1) AS v1
        FROM mom
    )
    SELECT n0 AS n_control, n1 AS n_treat,
           FLOOR(m0 * 1e6 + 0.5) / 1e6 AS mean_control,
           FLOOR(m1 * 1e6 + 0.5) / 1e6 AS mean_treat,
           FLOOR((m1 - m0) / SQRT(((n0 - 1) * v0 + (n1 - 1) * v1)
                                  / (n0 + n1 - 2)) * 1e6 + 0.5) / 1e6
               AS cohens_d,
           FLOOR((m1 - m0) / SQRT(((n0 - 1) * v0 + (n1 - 1) * v1)
                                  / (n0 + n1 - 2))
                 * (1.0 - 3.0 / (4.0 * (n0 + n1) - 9.0)) * 1e6 + 0.5) / 1e6
               AS hedges_g,
           FLOOR((m1 - m0) / SQRT(v0) * 1e6 + 0.5) / 1e6 AS glass_delta
    FROM stats
"""


@query("stat_effect_sizes", oracle=_EFFECT_SQL)
def stat_effect_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standardized effect sizes for the variant split on per-user
    purchase revenue: Cohen's d (pooled SD), Hedges' g (small-sample
    bias correction), and Glass's delta (control-SD denominator) — the
    practical-significance companion to ab_welch_ttest's p-value: a
    decision memo needs "how big", not just "how unlikely".

    Exactness: per-user revenue is a decimal-contract sum; group
    moments decimal-sum those identical doubles; every effect size is
    one fixed IEEE tree with a single SQRT, quantized at 1e-6.

    Scale: user-grain aggregate -> 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0)
        ).alias("rev")
    )
    mom = pu.agg(
        F.count_if(F.col("variant") == 0).cast("bigint").alias("n0"),
        F.count_if(F.col("variant") == 1).cast("bigint").alias("n1"),
        dsum(F.when(F.col("variant") == 0, F.col("rev"))).alias("s0"),
        dsum(F.when(F.col("variant") == 1, F.col("rev"))).alias("s1"),
        dsum(
            F.when(F.col("variant") == 0, F.col("rev") * F.col("rev"))
        ).alias("ss0"),
        dsum(
            F.when(F.col("variant") == 1, F.col("rev") * F.col("rev"))
        ).alias("ss1"),
    )
    stats = mom.select(
        "n0",
        "n1",
        (F.col("s0") / F.col("n0")).alias("m0"),
        (F.col("s1") / F.col("n1")).alias("m1"),
        (
            (F.col("ss0") - F.col("s0") * F.col("s0") / F.col("n0"))
            / (F.col("n0") - 1)
        ).alias("v0"),
        (
            (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
            / (F.col("n1") - 1)
        ).alias("v1"),
    )
    pooled = F.sqrt(
        ((F.col("n0") - 1) * F.col("v0") + (F.col("n1") - 1) * F.col("v1"))
        / (F.col("n0") + F.col("n1") - 2)
    )
    d = (F.col("m1") - F.col("m0")) / pooled
    return stats.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treat"),
        _q6(F.col("m0")).alias("mean_control"),
        _q6(F.col("m1")).alias("mean_treat"),
        _q6(d).alias("cohens_d"),
        _q6(
            d
            * (
                F.lit(1.0)
                - F.lit(3.0) / (F.lit(4.0) * (F.col("n0") + F.col("n1")) - F.lit(9.0))
            )
        ).alias("hedges_g"),
        _q6((F.col("m1") - F.col("m0")) / F.sqrt(F.col("v0"))).alias(
            "glass_delta"
        ),
    )


# ---------------------------------------------------------------------------
# TextRank-style keyphrase ranking (weighted PageRank on word graph)
# ---------------------------------------------------------------------------

_KP_MINLEN = 4
_KP_ITERS = 3
_KP_TOP = 15


def _keyphrase_sql(iters: int = _KP_ITERS) -> str:
    parts = [
        f"""
    WITH toks AS MATERIALIZED (
        SELECT LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
                           x -> LENGTH(x) >= {_KP_MINLEN}) AS arr
        FROM documents
    ), co AS (
        SELECT arr[i] AS a, arr[i + 1] AS b
        FROM toks, UNNEST(GENERATE_SERIES(1, LEN(arr) - 1)) t(i)
        UNION ALL
        SELECT arr[i] AS a, arr[i + 2] AS b
        FROM toks, UNNEST(GENERATE_SERIES(1, LEN(arr) - 2)) t(i)
    ), und AS MATERIALIZED (
        SELECT LEAST(a, b) AS u, GREATEST(a, b) AS v,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM co WHERE a <> b GROUP BY 1, 2
    ), sym AS MATERIALIZED (
        SELECT u, v, w FROM und UNION ALL SELECT v AS u, u AS v, w FROM und
    ), wdeg AS MATERIALIZED (
        SELECT u, CAST(SUM(w) AS BIGINT) AS wd FROM sym GROUP BY u
    ), nn AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wdeg
    ), r0 AS (
        SELECT u AS node, CAST(1.0 AS DOUBLE) / n AS rank
        FROM wdeg CROSS JOIN nn
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", r{i} AS (
        SELECT e.v AS node,
               CAST(0.15 AS DOUBLE) / ANY_VALUE(nn.n)
               + CAST(0.85 AS DOUBLE)
                 * {_dsum12_sql('r.rank / o.wd * e.w')} AS rank
        FROM sym e
        JOIN r{i - 1} r ON e.u = r.node
        JOIN wdeg o ON e.u = o.u
        CROSS JOIN nn
        GROUP BY e.v
    )"""
        )
    parts.append(
        f""", resid AS (
        SELECT CAST(ROUND(MAX(ABS(a.rank - b.rank)), 9) AS DOUBLE) AS residual
        FROM r{iters} a JOIN r{iters - 1} b ON a.node = b.node
    )
    SELECT node AS term, ROUND(rank, 9) AS rank, residual
    FROM r{iters} CROSS JOIN resid
    ORDER BY rank DESC, term ASC LIMIT {_KP_TOP}
"""
    )
    return "".join(parts)


@query("text_keyphrase_rank", oracle=_keyphrase_sql())
def text_keyphrase_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyphrase extraction (Mihalcea & Tarau 2004): weighted
    PageRank (d = 0.85, {_KP_ITERS} iterations, graph_pagerank's exact-
    compare iteration contract) over the word co-occurrence graph
    (tokens of length >= {_KP_MINLEN}, window 2, edge weight =
    corpus co-occurrence count), top-{_KP_TOP} terms with the
    convergence residual — the graph-centrality keyword ranker that
    catches connective topic words TF-IDF's rarity bias misses, and
    the fourth member of the term-importance family (tfidf,
    collocations, burstiness, keyphrases).

    Exactness: edge weights and weighted degrees are exact integers;
    each iteration's per-edge term (rank / wdeg * w) is an identical
    IEEE tree decimal-summed at scale 12 (the pagerank contract), so
    the distributed aggregation bit-matches the oracle's unrolled CTE
    chain; outputs round at 1e-9.

    Scale: co-occurrence pairs explode map-side (no self-join); the
    graph is vocab-bounded; each iteration is one edge join + one
    node-grain sum (map-side combinable), with the edge list and
    degrees checkpointed once. Residual telemetry sizes the iteration
    count at 100x (the r4 convergence-telemetry contract)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"),
            lambda x: F.length(x) >= _KP_MINLEN,
        ).alias("arr")
    )
    co = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(arr) - 2),"
                " i -> struct(arr[i] AS a, arr[i + 1] AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b").unionAll(
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(arr) - 3),"
                    " i -> struct(arr[i] AS a, arr[i + 2] AS b))"
                )
            ).alias("p")
        ).select("p.a", "p.b")
    )
    und = (
        co.filter(F.col("a") != F.col("b"))
        .groupBy(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    sym = und.unionAll(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).transform(cut_lineage_lazy)
    wdeg = (
        sym.groupBy("u").agg(F.sum("w").cast("bigint").alias("wd"))
    ).transform(cut_lineage_lazy)
    n = wdeg.count()
    r = wdeg.select(F.col("u").alias("node"), F.lit(1.0 / n).alias("rank"))
    r_prev = r
    for _ in range(_KP_ITERS):
        # vocab-sized frontier broadcast when the documents layout
        # bounds it (guide §3.1, the graph_pagerank loop pattern): the
        # co-occurrence edge list then never shuffles inside the loop;
        # the shuffle_hash hint keeps the audited plan on a real lake
        frontier = broadcast_if_small(
            r.join(wdeg, r["node"] == wdeg["u"]).select(
                "node", (F.col("rank") / F.col("wd")).alias("share")
            ),
            sf_dir,
            "documents",
        )
        contrib = (
            sym.hint("shuffle_hash")
            .join(frontier, sym["u"] == frontier["node"])
            .select("v", (F.col("share") * F.col("w")).alias("c"))
        )
        s = F.round(F.sum(F.col("c").cast(T.DecimalType(38, 15))), 12).cast(
            "double"
        )
        r_prev = r
        r = (
            contrib.groupBy("v")
            .agg((F.lit(0.15) / n + F.lit(0.85) * s).alias("rank"))
            .select(F.col("v").alias("node"), "rank")
            .transform(cut_lineage_lazy)
        )
    resid = (
        r.join(
            r_prev.select(F.col("node"), F.col("rank").alias("prev")), "node"
        ).agg(
            F.round(F.max(F.abs(F.col("rank") - F.col("prev"))), 9)
            .cast("double")
            .alias("residual")
        )
    )
    return (
        r.crossJoin(F.broadcast(resid))
        .select(
            F.col("node").alias("term"),
            F.round("rank", 9).alias("rank"),
            "residual",
        )
        .orderBy(F.col("rank").desc(), F.col("term").asc())
        .limit(_KP_TOP)
    )


# ---------------------------------------------------------------------------
# Rolling 7-day correlation between two daily series
# ---------------------------------------------------------------------------

_CORR_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr("CASE WHEN event_type = 'purchase'"
                          " THEN value ELSE 0 END")} AS p,
               {dsum_expr("CASE WHEN event_type = 'view'"
                          " THEN value ELSE 0 END")} AS v
        FROM events GROUP BY 1
    ), roll AS MATERIALIZED (
        SELECT day,
               CAST(ROUND(SUM(CAST(p AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS sp,
               CAST(ROUND(SUM(CAST(v AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS sv,
               CAST(ROUND(SUM(CAST(p * v AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS spv,
               CAST(ROUND(SUM(CAST(p * p AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS spp,
               CAST(ROUND(SUM(CAST(v * v AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS svv,
               COUNT(*) OVER w AS k
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           FLOOR((spv - sp * sv / 7)
                 / SQRT((spp - sp * sp / 7) * (svv - sv * sv / 7))
                 * 1e6 + 0.5) / 1e6 AS corr7
    FROM roll WHERE k = 7
"""


@query("window_moving_correlation", oracle=_CORR_SQL)
def window_moving_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between the purchase and view
    daily revenue series: the co-movement monitor behind "did these
    metrics decouple this week" alerts — ts_autocorrelation tracks one
    series against itself; this tracks the RELATIONSHIP between two,
    which is what breaks when a funnel stage regresses. Days without a
    full 7-day history are excluded.

    Exactness: daily series are decimal-contract sums (exact scale-4
    doubles); the five rolling moments are exact windowed DECIMAL sums
    of identical per-day IEEE products (the dsum-as-window
    convention); the correlation is one fixed tree with a single SQRT,
    quantized at 1e-6.

    Scale: one shuffle to the daily grain; all windows run over the
    |days| frame — calendar-bounded (plan-guard allowlisted)."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            dsum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0)
            ).alias("p"),
            dsum(
                F.when(F.col("event_type") == "view", F.col("value")).otherwise(
                    0
                )
            ).alias("v"),
        )
        .transform(cut_lineage)
    )
    w = W.orderBy("day").rowsBetween(-6, 0)

    def dwin(c):
        return F.round(F.sum(c.cast(T.DecimalType(38, 10))).over(w), 4).cast(
            "double"
        )

    roll = daily.select(
        "day",
        dwin(F.col("p")).alias("sp"),
        dwin(F.col("v")).alias("sv"),
        dwin(F.col("p") * F.col("v")).alias("spv"),
        dwin(F.col("p") * F.col("p")).alias("spp"),
        dwin(F.col("v") * F.col("v")).alias("svv"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    corr = (F.col("spv") - F.col("sp") * F.col("sv") / 7) / F.sqrt(
        (F.col("spp") - F.col("sp") * F.col("sp") / 7)
        * (F.col("svv") - F.col("sv") * F.col("sv") / 7)
    )
    return roll.filter(F.col("k") == 7).select("day", _q6(corr).alias("corr7"))


# ---------------------------------------------------------------------------
# Corpus language composition per source
# ---------------------------------------------------------------------------

_MIX_SQL = f"""
    WITH cnt AS MATERIALIZED (
        SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        FROM documents GROUP BY 1, 2
    ), tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1
    ), ranked AS (
        SELECT source, lang, c,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY c DESC, lang ASC) AS rn
        FROM cnt
    )
    SELECT t.source, t.n AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ANY_VALUE(r.lang) FILTER (WHERE r.rn = 1) AS top_lang,
           FLOOR(CAST(MAX(c.c) AS DOUBLE) / t.n * 1e6 + 0.5) / 1e6
               AS top_lang_share,
           FLOOR({dsum_expr('-(c.c * 1.0 / t.n) * LN(c.c * 1.0 / t.n)')}
                 * 1e6 + 0.5) / 1e6 AS lang_entropy
    FROM cnt c
    JOIN tot t USING (source)
    JOIN ranked r ON r.source = c.source AND r.lang = c.lang
    GROUP BY t.source, t.n
"""


@query("text_lang_mix_per_source", oracle=_MIX_SQL)
def text_lang_mix_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language composition per corpus source: language count, dominant
    language and its share, and the Shannon entropy of the mix — the
    governance table a multilingual training-data pipeline keys its
    per-source sampling weights off (ml_domain_mix_sample consumes
    exactly this kind of composition).

    Exactness: counts are exact integers; each entropy term runs LN on
    an exact-integer rational and decimal-sums over the
    language-domain-bounded support; shares are single quantized
    divisions; the dominant language breaks count ties alphabetically.

    Scale: one (source, lang) aggregate (map-side combinable), a
    source-grain rollup, and a per-source rank over the |langs| frame
    — all domain-bounded."""
    d = _t(spark, sf_dir, "documents")["documents"]
    cnt = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(cut_lineage)
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    wr = W.partitionBy("source").orderBy(F.col("c").desc(), F.col("lang").asc())
    ranked = cnt.withColumn("rn", F.row_number().over(wr))
    share = F.col("c") * F.lit(1.0) / F.col("n")
    return (
        ranked.join(tot, "source")
        .groupBy("source", "n")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.any_value(F.when(F.col("rn") == 1, F.col("lang")), True).alias(
                "top_lang"
            ),
            _q6(F.max("c").cast("double") / F.col("n")).alias("top_lang_share"),
            _q6(dsum(-share * F.log(share))).alias("lang_entropy"),
        )
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "n_langs",
            "top_lang",
            "top_lang_share",
            "lang_entropy",
        )
    )
