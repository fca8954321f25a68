"""Round-7 batch-47 surface: Moran's I spatial autocorrelation, AIC
model selection over nested OLS fits, pairwise Jensen-Shannon source
divergence, and the streaming Markov-transition twin.

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


# ---------------------------------------------------------------------------
# Moran's I global spatial autocorrelation over the customer grid
# ---------------------------------------------------------------------------

# Same deterministic LCG scatter as geo_grid_nearest / geo_hotspot_gi;
# 10x10 cells of 10000 units over the 100000-unit plane.
_MI_CELL = 10_000
_MI_DIM = 10

_MORAN_SQL = f"""
    WITH cust AS (
        SELECT CAST((c_custkey * 48271 + 11) % 100000 AS BIGINT) // {_MI_CELL} AS gx,
               CAST((c_custkey * 69621 + 7) % 100000 AS BIGINT) // {_MI_CELL} AS gy
        FROM customer
    ), spine AS (
        SELECT x.gx, y.gy
        FROM (SELECT UNNEST(GENERATE_SERIES(0, {_MI_DIM - 1})) AS gx) x
        CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {_MI_DIM - 1})) AS gy) y
    ), cells AS MATERIALIZED (
        SELECT s.gx, s.gy, CAST(COUNT(c.gx) AS BIGINT) AS x
        FROM spine s LEFT JOIN cust c ON c.gx = s.gx AND c.gy = s.gy
        GROUP BY s.gx, s.gy
    ), tot AS (
        SELECT CAST(SUM(x) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS n
        FROM cells
    ), z AS MATERIALIZED (
        SELECT gx, gy, x - (SELECT CAST(t AS DOUBLE) / n FROM tot) AS z
        FROM cells
    ), nbr AS (
        SELECT a.z AS za, b.z AS zb
        FROM z a
        JOIN (SELECT UNNEST([-1, 0, 1]) AS dx) dx ON TRUE
        JOIN (SELECT UNNEST([-1, 0, 1]) AS dy) dy ON NOT (dx.dx = 0 AND dy.dy = 0)
        JOIN z b ON b.gx = a.gx + dx.dx AND b.gy = a.gy + dy.dy
    ), agg AS (
        SELECT (SELECT n FROM tot) AS n,
               (SELECT COUNT(*) FROM nbr) AS w,
               (SELECT {dsum_expr('za * zb')} FROM nbr) AS cross_sum,
               (SELECT {dsum_expr('z * z')} FROM z) AS z2_sum
    )
    SELECT CAST(n AS BIGINT) AS n_cells, CAST(w AS BIGINT) AS w_pairs,
           FLOOR(CAST(n AS DOUBLE) / w * cross_sum / z2_sum * 1e6 + 0.5) / 1e6
               AS moran_i,
           FLOOR(-1.0 / (n - 1) * 1e6 + 0.5) / 1e6 AS expected_i,
           CAST(n AS DOUBLE) / w * cross_sum / z2_sum > -1.0 / (n - 1)
               AS clustered
    FROM agg
"""


@query("geo_moran_i", oracle=_MORAN_SQL)
def geo_moran_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I global spatial autocorrelation of customer density
    over the deterministic grid: I = (n/W) * sum_ij w_ij z_i z_j /
    sum z_i^2 with queen (8-neighbor) contiguity weights — the single
    "is demand spatially clustered at all" number that decides whether
    the per-cell Gi* hotspot map (geo_hotspot_gi) is worth reading
    (I near E[I] = -1/(n-1) means hotspots are noise). Completes the
    geo tier: grid-join, local hotspot, global autocorrelation.

    Exactness: cell counts are exact integers over the full grid spine
    (empty cells included — dropping them biases I); deviations are
    one fixed tree over (count, total/n); the cross and square sums go
    through the decimal contract; I is quantized at 1e6.

    Scale: customers collapse to the bounded cell grid in the first
    aggregate; the neighbor join is grid-sized (<= 8 n_cells rows) and
    every sum runs over that constant frame."""
    c = _t(spark, sf_dir, "customer")["customer"]
    cust = c.select(
        ((F.col("c_custkey") * 48271 + 11) % 100000).cast("bigint").alias("px"),
        ((F.col("c_custkey") * 69621 + 7) % 100000).cast("bigint").alias("py"),
    ).select(
        F.floor(F.col("px") / _MI_CELL).cast("bigint").alias("gx"),
        F.floor(F.col("py") / _MI_CELL).cast("bigint").alias("gy"),
    )
    spine = spark.range(_MI_DIM).select(F.col("id").alias("gx")).crossJoin(
        spark.range(_MI_DIM).select(F.col("id").alias("gy"))
    )
    cells = (
        spine.join(cust.groupBy("gx", "gy").agg(F.count("*").alias("cx")),
                   ["gx", "gy"], "left")
        .select("gx", "gy", F.coalesce("cx", F.lit(0)).cast("bigint").alias("x"))
        .transform(cut_lineage)
    )
    tot = cells.agg(
        F.sum("x").cast("bigint").alias("t"), F.count("*").cast("bigint").alias("n")
    )
    z = (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "gx", "gy", "n",
            (F.col("x") - F.col("t").cast("double") / F.col("n")).alias("z"),
        )
        .transform(cut_lineage)
    )
    offs = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)],
        "dx long, dy long",
    )
    a = z.select("gx", "gy", F.col("z").alias("za"))
    b = z.select(
        F.col("gx").alias("bgx"), F.col("gy").alias("bgy"), F.col("z").alias("zb")
    )
    nbr = (
        a.crossJoin(F.broadcast(offs))
        .join(
            F.broadcast(b),
            (F.col("bgx") == F.col("gx") + F.col("dx"))
            & (F.col("bgy") == F.col("gy") + F.col("dy")),
        )
    )
    cross = nbr.agg(
        F.count("*").cast("bigint").alias("w"),
        dsum(F.col("za") * F.col("zb")).alias("cross_sum"),
    )
    z2 = z.agg(F.max("n").alias("n"), dsum(F.col("z") * F.col("z")).alias("z2_sum"))
    agg = cross.crossJoin(F.broadcast(z2))
    i_stat = (
        F.col("n").cast("double") / F.col("w") * F.col("cross_sum") / F.col("z2_sum")
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_cells"),
        F.col("w").alias("w_pairs"),
        _q6(i_stat).alias("moran_i"),
        _q6(-1.0 / (F.col("n") - 1)).alias("expected_i"),
        (i_stat > -1.0 / (F.col("n") - 1)).alias("clustered"),
    )


# ---------------------------------------------------------------------------
# AIC model selection over nested OLS fits
# ---------------------------------------------------------------------------

_AIC_SQL = f"""
    WITH m AS MATERIALIZED (
        SELECT COUNT(*) AS n,
               {dsum_expr('l_quantity')} AS s1,
               {dsum_expr('l_discount')} AS s2,
               {dsum_expr('l_extendedprice / 1000.0')} AS sy,
               {dsum_expr('l_quantity * l_quantity')} AS s11,
               {dsum_expr('l_discount * l_discount')} AS s22,
               {dsum_expr('l_quantity * l_discount')} AS s12,
               {dsum_expr('l_quantity * (l_extendedprice / 1000.0)')} AS s1y,
               {dsum_expr('l_discount * (l_extendedprice / 1000.0)')} AS s2y,
               {dsum_expr('(l_extendedprice / 1000.0) * (l_extendedprice / 1000.0)')} AS syy
        FROM lineitem
    ), c AS (
        SELECT n,
               s11 - s1 * s1 / n AS c11, s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12, s1y - s1 * sy / n AS c1y,
               s2y - s2 * sy / n AS c2y, syy - sy * sy / n AS cyy
        FROM m
    ), fits AS (
        SELECT n,
               FLOOR(cyy * 1e4 + 0.5) / 1e4 AS rss0,
               FLOOR((cyy - c1y * c1y / c11) * 1e4 + 0.5) / 1e4 AS rss1,
               FLOOR((cyy
                      - ((c1y - ((c2y * c11 - c1y * c12)
                                 / (c11 * c22 - c12 * c12)) * c12) / c11) * c1y
                      - ((c2y * c11 - c1y * c12)
                         / (c11 * c22 - c12 * c12)) * c2y) * 1e4 + 0.5) / 1e4
                   AS rss2
        FROM c
    ), models AS (
        SELECT n, 'intercept_only' AS model, 0 AS k, rss0 AS rss FROM fits
        UNION ALL
        SELECT n, 'quantity' AS model, 1 AS k, rss1 AS rss FROM fits
        UNION ALL
        SELECT n, 'quantity_discount' AS model, 2 AS k, rss2 AS rss FROM fits
    ), scored AS (
        SELECT model, CAST(k AS BIGINT) AS n_features, rss,
               FLOOR((n * (FLOOR(LN(rss / n) * 1e6 + 0.5) / 1e6)
                      + 2.0 * (k + 1)) * 1e4 + 0.5) / 1e4 AS aic
        FROM models
    )
    SELECT model, n_features, rss, aic,
           FLOOR((aic - MIN(aic) OVER ()) * 1e4 + 0.5) / 1e4 AS delta_aic,
           aic = MIN(aic) OVER () AS selected
    FROM scored
    ORDER BY aic ASC, model ASC
"""


@query("ml_aic_model_select", oracle=_AIC_SQL)
def ml_aic_model_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AIC model selection over the nested OLS ladder intercept-only →
    +quantity → +quantity+discount on line net price: AIC =
    n ln(RSS/n) + 2(k+1) per fit, with delta-AIC and the winner — the
    "is the extra feature worth its parameter" decision
    ml_ols_two_features leaves open (R² always improves with more
    features; AIC is the penalized comparison that can say no).

    Exactness: every RSS comes from the same one-scan decimal-contract
    moment matrix (centered covariance identities — fixed IEEE trees
    over exact sums), quantized at 1e4 BEFORE the log; LN goes through
    the quantize-at-6 transcendental contract; AIC/delta are fixed
    trees over the quantized values.

    Scale: ONE lineitem scan produces the 10 moment sums (map-side
    combined); all three fits and the ranking are 1-row/3-row
    arithmetic."""
    # the 10-moment decimal partial aggregation is the whole cost of
    # this query and runs inside the scan task; on a single-row-group
    # local file that stage is one task, so spread the rows first
    # (layout-adaptive no-op on a real multi-file lake) — the decimal
    # sums are order-independent by the exact.py contract, so the
    # repartition cannot change a bit of the result
    li = fan_out(
        _t(spark, sf_dir, "lineitem")["lineitem"],
        sf_dir, "lineitem", "l_orderkey", weight=4,
    )
    # response in kilo-dollars: raw price moments (sum of price^2) cross
    # the decimal->double safe conversion range (exact.py: unscaled
    # int beyond 2^53 rounds differently across engines) at sf0.1+;
    # the /1000 literal is the same IEEE op in both plans and shifts
    # AIC by an n*ln(1e6) constant that cancels in the comparison
    x1, x2 = F.col("l_quantity"), F.col("l_discount")
    y = F.col("l_extendedprice") / 1000.0
    m = li.agg(
        F.count("*").alias("n"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(y).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * x2).alias("s12"),
        dsum(x1 * y).alias("s1y"),
        dsum(x2 * y).alias("s2y"),
        dsum(y * y).alias("syy"),
    )
    n = F.col("n")
    c = m.select(
        n.alias("n"),
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("cyy"),
    )
    q4 = lambda col: F.floor(col * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    b2 = (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / (
        F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    )
    b1 = (F.col("c1y") - b2 * F.col("c12")) / F.col("c11")
    fits = c.select(
        "n",
        q4(F.col("cyy")).alias("rss0"),
        q4(F.col("cyy") - F.col("c1y") * F.col("c1y") / F.col("c11")).alias("rss1"),
        q4(F.col("cyy") - b1 * F.col("c1y") - b2 * F.col("c2y")).alias("rss2"),
        # three union branches consume this 1-row frame — cut the
        # lineage or each branch re-runs the full moment scan
    ).transform(cut_lineage)
    models = None
    for name, k, col in (
        ("intercept_only", 0, "rss0"),
        ("quantity", 1, "rss1"),
        ("quantity_discount", 2, "rss2"),
    ):
        row = fits.select(
            "n",
            F.lit(name).alias("model"),
            F.lit(k).alias("k"),
            F.col(col).alias("rss"),
        )
        models = row if models is None else models.unionAll(row)
    ln_q6 = F.floor(F.log(F.col("rss") / F.col("n")) * 1e6 + F.lit(0.5)) / 1e6
    scored = models.select(
        "model",
        F.col("k").cast("bigint").alias("n_features"),
        "rss",
        q4(F.col("n") * ln_q6 + 2.0 * (F.col("k") + 1)).alias("aic"),
    ).transform(cut_lineage)
    # broadcast 1-row min + TakeOrdered(3): the 3-row frame must not
    # plan a SinglePartition window/global sort (catalog-wide guard)
    best = scored.agg(F.min("aic").alias("min_aic"))
    return (
        scored.crossJoin(F.broadcast(best))
        .select(
            "model",
            "n_features",
            "rss",
            "aic",
            q4(F.col("aic") - F.col("min_aic")).alias("delta_aic"),
            (F.col("aic") == F.col("min_aic")).alias("selected"),
        )
        .orderBy(F.col("aic").asc(), F.col("model").asc())
        .limit(3)
    )


# ---------------------------------------------------------------------------
# Pairwise Jensen-Shannon divergence between source unigram profiles
# ---------------------------------------------------------------------------

_JS_SQL = """
    WITH words AS MATERIALIZED (
        SELECT source, UNNEST(LIST_FILTER(
            STRING_SPLIT(REGEXP_REPLACE(LOWER(text), '[^a-z]+', ' ', 'g'), ' '),
            w -> LENGTH(w) > 0)) AS w
        FROM documents
    ), cnt AS MATERIALIZED (
        SELECT source, w, COUNT(*) AS c FROM words GROUP BY source, w
    ), tot AS MATERIALIZED (
        SELECT source, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY source
    ), pairs AS (
        SELECT a.source AS sa, b.source AS sb, a.t AS ta, b.t AS tb
        FROM tot a JOIN tot b ON a.source < b.source
    ), vocab AS (
        SELECT p.sa, p.sb, p.ta, p.tb, v.w,
               COALESCE(ca.c, 0) AS cca, COALESCE(cb.c, 0) AS ccb
        FROM pairs p
        JOIN (SELECT DISTINCT w FROM cnt) v ON TRUE
        LEFT JOIN cnt ca ON ca.source = p.sa AND ca.w = v.w
        LEFT JOIN cnt cb ON cb.source = p.sb AND cb.w = v.w
        WHERE ca.c IS NOT NULL OR cb.c IS NOT NULL
    ), terms AS (
        SELECT sa, sb,
               CAST(cca AS DOUBLE) / ta AS p,
               CAST(ccb AS DOUBLE) / tb AS q
        FROM vocab
    ), js AS (
        SELECT sa, sb, COUNT(*) AS n_vocab,
               CAST(ROUND(SUM(CAST(
                   0.5 * (CASE WHEN p > 0
                          THEN p * (FLOOR(LN(2.0 * p / (p + q)) * 1e6 + 0.5) / 1e6)
                          ELSE 0 END)
                 + 0.5 * (CASE WHEN q > 0
                          THEN q * (FLOOR(LN(2.0 * q / (p + q)) * 1e6 + 0.5) / 1e6)
                          ELSE 0 END) AS DECIMAL(38,10))), 4) AS DOUBLE) AS d
        FROM terms GROUP BY sa, sb
    )
    SELECT sa AS source_a, sb AS source_b, CAST(n_vocab AS BIGINT) AS n_vocab,
           FLOOR(d * 1e6 + 0.5) / 1e6 AS js_divergence,
           FLOOR(SQRT(CASE WHEN d > 0 THEN d ELSE 0 END) * 1e6 + 0.5) / 1e6
               AS js_distance
    FROM js
    ORDER BY sa, sb
"""


@query("text_js_divergence_sources", oracle=_JS_SQL)
def text_js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions: the symmetric, bounded ([0, ln 2]) distributional
    distance between every corpus-source pair — the mixing-audit
    companion to text_source_overlap's set-based Jaccard (overlap says
    WHICH words are shared; JS says whether they are used at the same
    RATES) and stat_kl_divergence's one-directional form. sqrt(JS) is
    a metric, reported as js_distance for threshold rules.

    Exactness: probabilities are fixed trees over exact counts; each
    LN goes through the quantize-at-6 transcendental contract; the
    per-word terms sum through DECIMAL(38,10) (order-independent), and
    the final values quantize at 1e6.

    Scale: one token scan to the (source, word) grain; the pair
    expansion is |sources|^2/2 x vocab — vocabulary-bounded, never
    document-bounded; zero-count sides contribute 0 by the JS
    convention (0 ln 0 = 0)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    words = d.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z]+", " "), " "),
                lambda w: F.length(w) > 0,
            )
        ).alias("w"),
    )
    cnt = words.groupBy("source", "w").agg(F.count("*").alias("c")).transform(
        cut_lineage
    )
    tot = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("t"))
    ta = tot.select(F.col("source").alias("sa"), F.col("t").alias("ta"))
    tb = tot.select(F.col("source").alias("sb"), F.col("t").alias("tb"))
    pairs = ta.join(tb, F.col("sa") < F.col("sb"))
    ca = cnt.select(F.col("source").alias("sa"), "w", F.col("c").alias("cca"))
    cb = cnt.select(F.col("source").alias("sb"), "w", F.col("c").alias("ccb"))
    vocab = cnt.select("w").distinct()
    terms = (
        pairs.crossJoin(vocab)
        .join(ca, ["sa", "w"], "left")
        .join(cb, ["sb", "w"], "left")
        .filter(F.col("cca").isNotNull() | F.col("ccb").isNotNull())
        .select(
            "sa",
            "sb",
            (F.coalesce("cca", F.lit(0)).cast("double") / F.col("ta")).alias("p"),
            (F.coalesce("ccb", F.lit(0)).cast("double") / F.col("tb")).alias("q"),
        )
    )
    ln_q6 = lambda col: F.floor(F.log(col) * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    p, q = F.col("p"), F.col("q")
    term = 0.5 * F.when(p > 0, p * ln_q6(2.0 * p / (p + q))).otherwise(0.0) + (
        0.5 * F.when(q > 0, q * ln_q6(2.0 * q / (p + q))).otherwise(0.0)
    )
    js = terms.groupBy("sa", "sb").agg(
        F.count("*").cast("bigint").alias("n_vocab"), dsum(term).alias("d")
    )
    return js.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "n_vocab",
        _q6(F.col("d")).alias("js_divergence"),
        _q6(F.sqrt(F.greatest(F.col("d"), F.lit(0.0)))).alias("js_distance"),
    ).orderBy("source_a", "source_b")


# ---------------------------------------------------------------------------
# Streaming twin of the Markov transition matrix
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _markov_oracle() -> str:
    from es_analytics_spark.queries_sql5 import _MARKOV_SQL

    return _MARKOV_SQL


@query("stream_markov_transitions", mutates_conf=True, oracle=_markov_oracle())
def stream_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_markov_transitions' per-user event sequences maintained by
    the STREAMING engine (applyInPandasWithState; see
    streaming.stateful.running_transitions): state per user is the
    (ts, event_id, type) sequence kept in the batch twin's exact total
    order, each epoch re-derives the full transition multiset — an
    out-of-order arrival landing BETWEEN two already-counted events
    retroactively splits their transition exactly as the batch lead()
    window would — and the replay's final per-user counts aggregate to
    the identical |types|^2 matrix, pinned against the same SQL oracle
    as the batch entry.

    Scale: state is the user's activity-bounded event sequence
    (TRANSITION_STATE_CAP backstop), sharded by user; the global
    matrix aggregate and the per-source normalization run over the
    |types|^2 grain."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events
    from es_analytics_spark.streaming.stateful import running_transitions

    code = F.lit(None).cast("int")
    for i, t in enumerate(_EVENT_TYPES):
        code = F.when(F.col("event_type") == t, i).otherwise(code)
    ev = stream_events(spark, sf_dir).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("tus"),
        F.col("event_id").alias("eid"),
        code.alias("code"),
    )
    out = replay_stream(
        spark,
        running_transitions(ev),
        name="stream_markov_transitions",
        output_mode="append",
    )
    # per-user final-epoch selection via a window (a join back onto the
    # memory-sink frame hits Spark's self-join attribute ambiguity);
    # rows per user are epochs x |types|^2 — bounded
    final = (
        out.withColumn("mx", F.max("n_rows").over(W.partitionBy("user_id")))
        .filter((F.col("n_rows") == F.col("mx")) & (F.col("src_code") >= 0))
    )
    names = F.array(*[F.lit(t) for t in _EVENT_TYPES])
    cnt = (
        final.groupBy("src_code", "dst_code")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
        .select(
            F.element_at(names, F.col("src_code") + 1).alias("src"),
            F.element_at(names, F.col("dst_code") + 1).alias("dst"),
            "n",
        )
    )
    return cnt.select(
        "src",
        "dst",
        "n",
        F.floor(F.col("n") * 1e6 / F.sum("n").over(W.partitionBy("src")))
        .cast("bigint")
        .alias("p_fp"),
    )
