"""Round-5 batch-18 surface: Dunning log-likelihood collocations, a
view-to-purchase abandonment window (sequence anti-pattern), expected
calibration error, per-term burstiness (variance-to-mean), and
directed-graph reciprocity/degree statistics.

Same contract as the rest of the catalog (see queries.py): Spark-first
implementation + DuckDB oracle per entry, deterministic row sets,
decimal-sum contract for aggregated floats, LN only on identical
rationals inside fixed IEEE trees, 1e-6 half-up quantization on
outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Dunning log-likelihood-ratio collocations
# ---------------------------------------------------------------------------

_LLR_MIN = 5


def _xlx(e: str) -> str:
    """x*ln(x) with the 0*ln(0)=0 convention — identical SQL fragment
    on both engines (LN on exact-integer rationals, the catalog LN
    precedent)."""
    return f"(CASE WHEN ({e}) = 0 THEN 0.0 ELSE ({e}) * LN(CAST(({e}) AS DOUBLE)) END)"


def _llr_expr() -> str:
    k11 = "cab"
    k12 = "(ca - cab)"
    k21 = "(cb - cab)"
    k22 = "(n - ca - cb + cab)"
    return (
        f"2.0 * ({_xlx(k11)} + {_xlx(k12)} + {_xlx(k21)} + {_xlx(k22)}"
        f" - {_xlx('ca')} - {_xlx('(n - ca)')}"
        f" - {_xlx('cb')} - {_xlx('(n - cb)')} + {_xlx('n')})"
    )


_LLR_SQL = f"""
    WITH toks AS MATERIALIZED (
        SELECT LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
                           x -> LENGTH(x) >= 2) AS arr
        FROM documents
    ), big AS (
        SELECT arr[i] AS a, arr[i + 1] AS b
        FROM toks, UNNEST(GENERATE_SERIES(1, LEN(arr) - 1)) AS t(i)
    ), bc AS MATERIALIZED (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cab FROM big GROUP BY a, b
    ), rowt AS MATERIALIZED (
        SELECT a, CAST(SUM(cab) AS BIGINT) AS ca FROM bc GROUP BY a
    ), colt AS MATERIALIZED (
        SELECT b, CAST(SUM(cab) AS BIGINT) AS cb FROM bc GROUP BY b
    ), nn AS (
        SELECT CAST(SUM(cab) AS BIGINT) AS n FROM bc
    ), scored AS (
        SELECT bc.a, bc.b, bc.cab,
               FLOOR(({_llr_expr()}) * 1e6 + 0.5) / 1e6 AS llr
        FROM bc
        JOIN rowt USING (a) JOIN colt USING (b) CROSS JOIN nn
        WHERE bc.cab >= {_LLR_MIN}
    )
    SELECT a, b, cab, llr FROM scored
    ORDER BY llr DESC, a ASC, b ASC LIMIT 20
"""


@query("text_collocations_llr", oracle=_LLR_SQL)
def text_collocations_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by Dunning's log-likelihood ratio: the G^2 test
    over each bigram's 2x2 contingency table (bigram events as trials,
    first/second word as margins). LLR is the collocation statistic
    that stays calibrated for RARE pairs where text_bigram_lift's
    plain lift explodes — the standard choice in corpus linguistics
    (Dunning 1993) and the one a phrase-mining pipeline should rank
    by.

    Exactness: all nine contingency terms are exact integers; each
    x*ln(x) runs LN on an exact-integer rational (the catalog LN
    precedent) inside ONE fixed IEEE tree per bigram — no float
    aggregation anywhere; quantized at 1e-6 with (a, b) breaking ties.

    Scale: bigrams explode map-side (no self-join); margins come from
    the vocab^2-bounded pair counts (not a second corpus pass) and
    broadcast into the scoring join; the top-20 is TakeOrdered."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) >= 2
        ).alias("arr")
    )
    big = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(arr) - 2),"
                " i -> struct(arr[i] AS a, arr[i + 1] AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bc = (
        big.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cab"))
        .transform(cut_lineage)
    )
    rowt = bc.groupBy("a").agg(F.sum("cab").cast("bigint").alias("ca"))
    colt = bc.groupBy("b").agg(F.sum("cab").cast("bigint").alias("cb"))
    nn = bc.agg(F.sum("cab").cast("bigint").alias("n"))
    return (
        bc.filter(F.col("cab") >= _LLR_MIN)
        .join(F.broadcast(rowt), "a")
        .join(F.broadcast(colt), "b")
        .crossJoin(F.broadcast(nn))
        .select("a", "b", "cab", _q6(F.expr(_llr_expr())).alias("llr"))
        .orderBy(F.col("llr").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# View-to-purchase abandonment within a 1-hour window
# ---------------------------------------------------------------------------

_ABANDON_SQL = """
    WITH views AS MATERIALIZED (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    ), conv AS (
        SELECT v.user_id,
               CASE WHEN EXISTS (
                   SELECT 1 FROM events p
                   WHERE p.user_id = v.user_id AND p.event_type = 'purchase'
                     AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR)
                    THEN 1 ELSE 0 END AS converted
        FROM views v
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_views,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(COUNT(*) - SUM(converted) AS BIGINT) AS n_abandoned,
           FLOOR((1.0 - CAST(SUM(converted) AS DOUBLE) / COUNT(*))
                 * 1e6 + 0.5) / 1e6 AS abandonment_rate
    FROM conv GROUP BY user_id
"""


@query("seq_cart_abandonment", oracle=_ABANDON_SQL)
def seq_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View-to-purchase abandonment: for every view, did the same user
    purchase within the next hour (strictly after the view)? Reported
    per user as view/converted/abandoned counts and the abandonment
    rate — the windowed-existence sequence pattern behind cart- and
    search-abandonment funnels (ts_time_to_convert measures latency of
    first conversion; this grades EVERY view against a fixed SLA
    window).

    The Spark side uses the union + ordered-window rewrite (the
    join_asof_forward recipe): views and purchases interleave in one
    per-user stream ordered by (ts, kind, event_id) with purchases
    BEFORE views at equal timestamps, so the first following
    purchase-ts is strictly later than the view — matching the
    oracle's correlated EXISTS with p.ts > v.ts exactly, without a
    range join. One shuffle on user_id; state per row is one
    timestamp; the correlated-subquery spelling the oracle uses would
    be quadratic per user.

    Counts are exact integers; the rate is one quantized division."""
    e = _t(spark, sf_dir, "events")["events"]
    tagged = e.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("kind"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    stream = tagged.withColumn(
        "next_p", F.first("p_ts", ignorenulls=True).over(w)
    )
    views = stream.filter(F.col("kind") == 1).select(
        "user_id",
        F.when(
            F.col("next_p").isNotNull()
            & (F.col("next_p") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
            1,
        )
        .otherwise(0)
        .alias("converted"),
    )
    return views.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_views"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        (F.count(F.lit(1)) - F.sum("converted")).cast("bigint").alias("n_abandoned"),
        _q6(
            F.lit(1.0)
            - F.sum("converted").cast("double") / F.count(F.lit(1))
        ).alias("abandonment_rate"),
    )


# ---------------------------------------------------------------------------
# Expected calibration error (shares ml_calibration_brier's model)
# ---------------------------------------------------------------------------

_ECE_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id,
               CAST(LEAST(GREATEST(SUM(CASE WHEN event_type = 'click'
                                            THEN 1 ELSE 0 END) - 8, 0) // 2, 6)
                    AS BIGINT) AS bin,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label,
               user_id % 3 = 0 AS is_test
        FROM events GROUP BY user_id
    ), train AS (
        SELECT bin, COUNT(*) AS n_train, SUM(label) AS x_train
        FROM pu WHERE NOT is_test GROUP BY bin
    ), test AS (
        SELECT bin, COUNT(*) AS n_test, SUM(label) AS x_test
        FROM pu WHERE is_test GROUP BY bin
    ), joined AS MATERIALIZED (
        SELECT t.bin,
               COALESCE(s.n_test, 0) AS n_test, COALESCE(s.x_test, 0) AS x_test,
               t.x_train * 1.0 / t.n_train AS pred
        FROM train t LEFT JOIN test s ON s.bin = t.bin
    ), tot AS (
        SELECT CAST(SUM(n_test) AS BIGINT) AS nt FROM joined
    )
    SELECT tot.nt AS n_test,
           CAST(COUNT(*) FILTER (WHERE n_test > 0) AS BIGINT) AS n_bins,
           FLOOR({dsum_expr('CASE WHEN n_test = 0 THEN 0.0 ELSE'
                            ' (CAST(n_test AS DOUBLE) / nt)'
                            ' * ABS(x_test * 1.0 / n_test - pred) END')}
                 * 1e6 + 0.5) / 1e6 AS ece,
           FLOOR(MAX(CASE WHEN n_test = 0 THEN 0.0
                          ELSE ABS(x_test * 1.0 / n_test - pred) END)
                 * 1e6 + 0.5) / 1e6 AS mce
    FROM joined CROSS JOIN tot
    GROUP BY tot.nt
"""


@query("ml_ece_calibration", oracle=_ECE_SQL)
def ml_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error of the behavioral score
    ml_calibration_brier trains (same click-count bins, same
    high-value-purchase label, same user_id % 3 test split, so the
    three calibration entries grade ONE model): ECE is the
    test-weighted mean |observed - predicted| per bin, MCE the worst
    bin — the pair every model-monitoring dashboard shows next to the
    Brier score (Brier mixes calibration with resolution; ECE isolates
    the miscalibration a temperature rescale would fix).

    Exactness: bin counts are exact integers; predicted/observed rates
    are exact-integer rationals; per-bin |gap| terms are fixed IEEE
    trees decimal-summed over the constant 7-bin support; one
    quantized output each.

    Scale: user-grain aggregate -> constant bin grain -> 1-row
    reduction, all map-side combinable."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy("user_id").agg(
        F.least(
            F.floor(
                F.greatest(
                    F.sum(
                        F.when(F.col("event_type") == "click", 1).otherwise(0)
                    )
                    - 8,
                    F.lit(0),
                )
                / 2
            ),
            F.lit(6).cast("bigint"),
        )
        .cast("bigint")
        .alias("bin"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100.0),
                1,
            ).otherwise(0)
        ).alias("label"),
    ).withColumn("is_test", F.col("user_id") % 3 == 0)
    train = (
        pu.filter(~F.col("is_test"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_train"), F.sum("label").alias("x_train"))
    )
    test = (
        pu.filter(F.col("is_test"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_test"), F.sum("label").alias("x_test"))
    )
    joined = (
        train.join(test, "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("n_test"), F.lit(0)).alias("n_test"),
            F.coalesce(F.col("x_test"), F.lit(0)).alias("x_test"),
            (F.col("x_train") * F.lit(1.0) / F.col("n_train")).alias("pred"),
        )
        .transform(cut_lineage)
    )
    tot = joined.agg(F.sum("n_test").cast("bigint").alias("nt"))
    gap = F.abs(F.col("x_test") * F.lit(1.0) / F.col("n_test") - F.col("pred"))
    term = F.when(F.col("n_test") == 0, F.lit(0.0)).otherwise(
        (F.col("n_test").cast("double") / F.col("nt")) * gap
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .groupBy("nt")
        .agg(
            F.count_if(F.col("n_test") > 0).cast("bigint").alias("n_bins"),
            _q6(dsum(term)).alias("ece"),
            _q6(
                F.max(F.when(F.col("n_test") == 0, F.lit(0.0)).otherwise(gap))
            ).alias("mce"),
        )
        .select(F.col("nt").alias("n_test"), "n_bins", "ece", "mce")
    )


# ---------------------------------------------------------------------------
# Per-term burstiness (variance-to-mean ratio over documents)
# ---------------------------------------------------------------------------

_BURST_TOP = 30

_BURST_SQL = f"""
    WITH toks AS MATERIALIZED (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
                           x -> LENGTH(x) >= 2) AS arr
        FROM documents
    ), nd AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM toks
    ), tc AS MATERIALIZED (
        SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, UNNEST(arr) AS w FROM toks) GROUP BY 1, 2
    ), term AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(c) AS BIGINT) AS tf,
               CAST(SUM(c * c) AS BIGINT) AS tf2
        FROM tc GROUP BY w
    ), top AS (
        SELECT w, df, tf, tf2 FROM term
        ORDER BY df DESC, w ASC LIMIT {_BURST_TOP}
    )
    SELECT w AS term, df, tf AS tf_total,
           FLOOR(((CAST(tf2 AS DOUBLE) / n_docs
                   - (CAST(tf AS DOUBLE) / n_docs) * (CAST(tf AS DOUBLE) / n_docs))
                  / (CAST(tf AS DOUBLE) / n_docs)) * 1e6 + 0.5) / 1e6
               AS vmr_burstiness
    FROM top CROSS JOIN nd
"""


@query("text_term_burstiness", oracle=_BURST_SQL)
def text_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale burstiness of the 30 highest-document-frequency
    terms: the variance-to-mean ratio of per-document counts (zeros
    included via the moment identity — E[x^2] and E[x] over ALL docs
    need only the nonzero counts plus n_docs). VMR = 1 is Poisson
    ("content-free" function words); VMR >> 1 marks topical/bursty
    terms — the statistic that separates keywords from glue words
    without any stopword list, and a core quality signal for
    TF-IDF-style weighting at corpus scale.

    Exactness: df/tf/tf^2 sums are exact integers; VMR is one fixed
    IEEE tree per term, quantized at 1e-6. The top-30 selection orders
    by exact integers (df, term) — no float in the cut.

    Scale: doc-term counts shuffle once; term moments are
    vocabulary-sized and map-side combinable; the top-30 is
    TakeOrdered; n_docs broadcasts."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) >= 2
        ).alias("arr"),
    )
    nd = toks.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tc = (
        toks.select("doc_id", F.explode("arr").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    term = tc.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("c").cast("bigint").alias("tf"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("tf2"),
    )
    top = term.orderBy(F.col("df").desc(), F.col("w").asc()).limit(_BURST_TOP)
    mean = F.col("tf").cast("double") / F.col("n_docs")
    ex2 = F.col("tf2").cast("double") / F.col("n_docs")
    return top.crossJoin(F.broadcast(nd)).select(
        F.col("w").alias("term"),
        "df",
        F.col("tf").alias("tf_total"),
        _q6((ex2 - mean * mean) / mean).alias("vmr_burstiness"),
    )


# ---------------------------------------------------------------------------
# Directed-graph reciprocity and degree statistics
# ---------------------------------------------------------------------------

_RECIP_SQL = """
    WITH seq AS MATERIALIZED (
        SELECT l_orderkey, l_partkey AS src,
               LEAD(l_partkey) OVER (PARTITION BY l_orderkey
                                     ORDER BY l_linenumber, l_partkey) AS dst
        FROM lineitem
    ), edges AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM seq
        WHERE dst IS NOT NULL AND dst <> src
    ), deg AS (
        SELECT CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src,
               CAST(COUNT(*) AS BIGINT) AS n_edges
        FROM edges
    ), outd AS (
        SELECT src, COUNT(*) AS od FROM edges GROUP BY src
    ), ind AS (
        SELECT dst, COUNT(*) AS id FROM edges GROUP BY dst
    ), recip AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_recip
        FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
    ), nodes AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM (
            SELECT src AS v FROM edges UNION SELECT dst FROM edges)
    )
    SELECT nodes.n_nodes, deg.n_edges,
           CAST((SELECT MAX(od) FROM outd) AS BIGINT) AS max_out_degree,
           CAST((SELECT MAX(id) FROM ind) AS BIGINT) AS max_in_degree,
           FLOOR(CAST(recip.n_recip AS DOUBLE) / deg.n_edges * 1e6 + 0.5)
               / 1e6 AS reciprocity,
           FLOOR(CAST(deg.n_edges AS DOUBLE) / nodes.n_nodes * 1e6 + 0.5)
               / 1e6 AS avg_out_degree
    FROM deg CROSS JOIN recip CROSS JOIN nodes
"""


@query("graph_reciprocity_degree", oracle=_RECIP_SQL)
def graph_reciprocity_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity and degree profile of the DIRECTED part-sequence
    graph (an edge a->b when part b follows part a in an order's
    linenumber sequence): edge reciprocity |{(a,b): (b,a) exists}| /
    |edges|, max in/out degree, and density — the directed-graph
    health numbers the catalog's undirected entries (clustering,
    assortativity) can't express, and the first sanity check before
    interpreting any directed centrality.

    Exactness: every statistic is an exact integer count; the two
    ratios are single quantized divisions.

    Scale: edge extraction is one per-order window (lead over
    linenumber); the reciprocity join is edge-keyed on (dst, src) —
    one shuffle, output bounded by |edges|; degree maxima are
    map-side-combinable aggregates."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    # the fixture's l_linenumber is NOT unique per order — l_partkey
    # tiebreak makes the sequence deterministic (rows tied on both keys
    # share the same partkey, so their order cannot change the edge set)
    wseq = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    edges = (
        li.select(
            F.col("l_partkey").alias("src"),
            F.lead("l_partkey").over(wseq).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
        .distinct()
        .transform(cut_lineage)
    )
    deg = edges.agg(
        F.countDistinct("src").cast("bigint").alias("n_src"),
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
    )
    max_out = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .agg(F.max("od").cast("bigint").alias("max_out_degree"))
    )
    max_in = (
        edges.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("id"))
        .agg(F.max("id").cast("bigint").alias("max_in_degree"))
    )
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = edges.join(rev, ["src", "dst"]).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_recip")
    )
    nodes = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
    )
    return (
        deg.crossJoin(F.broadcast(recip))
        .crossJoin(F.broadcast(nodes))
        .crossJoin(F.broadcast(max_out))
        .crossJoin(F.broadcast(max_in))
        .select(
            "n_nodes",
            "n_edges",
            "max_out_degree",
            "max_in_degree",
            _q6(
                F.col("n_recip").cast("double") / F.col("n_edges")
            ).alias("reciprocity"),
            _q6(
                F.col("n_edges").cast("double") / F.col("n_nodes")
            ).alias("avg_out_degree"),
        )
    )
