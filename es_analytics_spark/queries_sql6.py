"""Round-5 surface: training-data governance (cross-split leakage,
n-gram novelty curve, quality-pruning curve, tokenizer fertility),
time-decay attribution completing the attribution quartet, personalized
PageRank and sampled harmonic closeness with the round-5
residual/sampling conventions, TPC-H Q17 completing the suite,
delta-method ratio-metric inference, Brown-Forsythe variance
homogeneity, unordered funnels, Bollinger-band volatility envelopes,
and KMV sketch set algebra.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, dyadic (power-of-two) weights, or
integer fixed-point intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum_expr
from es_analytics_spark.functions.fanout import broadcast_if_small, fan_out
from es_analytics_spark.functions.lineage import cut_lineage, cut_lineage_lazy
from es_analytics_spark.queries import _t, query


# ---------------------------------------------------------------------------
# Cross-split leakage: near-dup documents spanning train and eval splits
# ---------------------------------------------------------------------------

# same normalization as text_fingerprint_dedup (queries.py _NORM_SQL)
_NORM6_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)

# same hash-deterministic 80/10/10 split as ml_split_shuffle
_SPLIT6_SQL = """
    CASE WHEN ('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 80
           THEN 'train'
         WHEN ('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 90
           THEN 'val'
         ELSE 'test' END
"""

_LEAK_SQL = f"""
    WITH fp AS (
        SELECT doc_id,
               MD5(SUBSTRING({_NORM6_SQL}, 1, 80)) AS fingerprint,
               {_SPLIT6_SQL} AS split
        FROM documents
    )
    SELECT fingerprint,
           CAST(COUNT(CASE WHEN split = 'train' THEN 1 END) AS BIGINT) AS n_train,
           CAST(COUNT(CASE WHEN split = 'val' THEN 1 END) AS BIGINT) AS n_val,
           CAST(COUNT(CASE WHEN split = 'test' THEN 1 END) AS BIGINT) AS n_test,
           MIN(doc_id) AS example_doc_id
    FROM fp
    GROUP BY fingerprint
    HAVING COUNT(CASE WHEN split = 'train' THEN 1 END) > 0
       AND (COUNT(CASE WHEN split = 'val' THEN 1 END) > 0
            OR COUNT(CASE WHEN split = 'test' THEN 1 END) > 0)
"""


@query("ml_cross_split_leakage", oracle=_LEAK_SQL)
def ml_cross_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: head fingerprints (md5 of the
    first 80 normalized chars — the cheap near-dup key that catches
    template/boilerplate families whole-doc hashing misses) that land in
    BOTH the train split and an eval split under the hash-deterministic
    80/10/10 assignment of ml_split_shuffle. Every hit is an eval
    example whose near-duplicate was trained on — the leak that
    silently inflates held-out metrics, and the audit every training
    pipeline must run between dedup and training (random splits of an
    imperfectly-deduped corpus ALWAYS leak; this measures how much).

    Scale: one scan → one groupBy on the fingerprint (map-side
    combined); output is bounded by the number of leaked dup groups,
    not corpus size. Because split assignment is a pure function of
    doc_id, no join against a split-assignment table is needed — the
    audit composes with any fingerprint (swap in MinHash buckets for
    fuzzier leakage).
    """
    d = _t(spark, sf_dir, "documents")["documents"]
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    from es_analytics_spark.operators.dedup import normalize_text

    fp = d.select(
        "doc_id",
        F.md5(F.substring(normalize_text(F.col("text")), 1, 80)).alias("fingerprint"),
        split.alias("split"),
    )
    agg = fp.groupBy("fingerprint").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("split") == "val", 1)).alias("n_val"),
        F.count(F.when(F.col("split") == "test", 1)).alias("n_test"),
        F.min("doc_id").alias("example_doc_id"),
    )
    return agg.filter(
        (F.col("n_train") > 0) & ((F.col("n_val") > 0) | (F.col("n_test") > 0))
    )


# ---------------------------------------------------------------------------
# Time-decay attribution (completes last-touch / linear / U-shaped)
# ---------------------------------------------------------------------------

_US_DAY = 86400 * 1_000_000
_TD_LOOKBACK_US = 7 * _US_DAY

# weight = 0.5^(whole days before the purchase): dyadic rationals with
# <= 6 fractional bits, so double sums of them are EXACT and
# order-independent — no decimal cast needed for the per-purchase
# normalizer (the attributed value itself still goes through the
# decimal contract).
_TD_SQL = f"""
    WITH touches AS (
        SELECT user_id, event_id AS touch_id, event_type AS touch_type,
               EPOCH_US(ts) AS t_us
        FROM events WHERE event_type IN ('view', 'click')
    ), purchases AS (
        SELECT user_id, event_id AS purchase_id, value, EPOCH_US(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ), pairs AS (
        SELECT p.purchase_id, p.value, t.touch_type,
               POWER(0.5, CAST((p.p_us - t.t_us) // {_US_DAY} AS INT)) AS w
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.t_us < p.p_us
         AND t.t_us >= p.p_us - {_TD_LOOKBACK_US}
    ), normed AS (
        SELECT purchase_id, value, touch_type, w,
               SUM(w) OVER (PARTITION BY purchase_id) AS w_sum
        FROM pairs
    )
    SELECT touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_credited_touches,
           CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
           {dsum_expr('value * w / w_sum')} AS attributed_value
    FROM normed GROUP BY touch_type
"""


@query("attr_time_decay", oracle=_TD_SQL)
def attr_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: each view/click in the
    7-day window before a purchase gets weight 0.5^(whole days before
    it), normalized per purchase — recency-weighted credit, the fourth
    canonical model beside last-touch, linear, and U-shaped.

    Exactness: day deltas are integers, so weights are dyadic
    (1, 1/2, …, 1/64) and their per-purchase double sum is exact and
    order-independent in both engines; only the final attributed-value
    sum needs the decimal contract.

    Scale: same shape as attr_linear_multi_touch — an equi-join on
    user_id with a time-range post-filter (per-user fanout bounded by
    activity), one window over per-purchase groups (purchase-sized
    partitions), one aggregate.
    """
    ev = _t(spark, sf_dir, "events")["events"]
    t_us = F.unix_micros(F.col("ts"))
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", F.col("event_type").alias("touch_type"), t_us.alias("t_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"),
        "value", t_us.alias("p_us"),
    )
    pairs = purchases.join(
        touches,
        (purchases["user_id"] == touches["user_id"])
        & (touches["t_us"] < purchases["p_us"])
        & (touches["t_us"] >= purchases["p_us"] - _TD_LOOKBACK_US),
    ).select(
        "purchase_id", "value", "touch_type",
        F.pow(
            F.lit(0.5),
            F.floor((F.col("p_us") - F.col("t_us")) / _US_DAY).cast("int"),
        ).alias("w"),
    )
    normed = pairs.withColumn(
        "w_sum", F.sum("w").over(W.partitionBy("purchase_id"))
    )
    return normed.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_credited_touches"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        F.round(
            F.sum((F.col("value") * F.col("w") / F.col("w_sum")).cast("decimal(38,10)")),
            4,
        ).cast("double").alias("attributed_value"),
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (seeded restart, residual telemetry)
# ---------------------------------------------------------------------------

def _ppr_dsum12(expr: str) -> str:
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,15))), 12) AS DOUBLE)"


def _ppr_oracle(iters: int = 3) -> str:
    parts = [
        f"""
    WITH edges AS (
        SELECT DISTINCT 2 * o_custkey AS src, 2 * l_suppkey + 1 AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        UNION
        SELECT DISTINCT 2 * l_suppkey + 1 AS src, 2 * o_custkey AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), outdeg AS (
        SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
    ), seeds AS (
        SELECT DISTINCT src AS node FROM edges
        WHERE src % 2 = 0 AND (src / 2) % 97 = 0
    ), ns AS (
        SELECT COUNT(*) AS n FROM seeds
    ), r0 AS (
        SELECT node, CAST(1.0 AS DOUBLE) / n AS rank FROM seeds CROSS JOIN ns
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", c{i} AS (
        SELECT e.dst AS node, {_ppr_dsum12('r.rank / o.deg')} AS contrib
        FROM edges e
        JOIN r{i - 1} r ON e.src = r.node
        JOIN outdeg o ON e.src = o.src
        GROUP BY e.dst
    ), r{i} AS (
        SELECT COALESCE(c.node, s.node) AS node,
               CAST(0.85 AS DOUBLE) * COALESCE(c.contrib, 0)
               + CASE WHEN s.node IS NOT NULL
                      THEN CAST(0.15 AS DOUBLE) / (SELECT n FROM ns)
                      ELSE CAST(0 AS DOUBLE) END AS rank
        FROM c{i} c FULL OUTER JOIN seeds s ON c.node = s.node
    )"""
        )
    parts.append(
        f""", resid AS (
        SELECT CAST(ROUND(MAX(ABS(a.rank - COALESCE(b.rank, 0))), 9) AS DOUBLE)
               AS residual
        FROM r{iters} a LEFT JOIN r{iters - 1} b ON a.node = b.node
    )
    SELECT node, ROUND(rank, 9) AS rank, residual
    FROM r{iters} CROSS JOIN resid ORDER BY rank DESC, node ASC LIMIT 20
"""
    )
    return "".join(parts)


@query("graph_ppr_seeded", oracle=_ppr_oracle(3))
def graph_ppr_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: restart mass concentrated on a seed set
    (customers with custkey ≡ 0 mod 97) instead of spread uniformly —
    THE similarity-to-these-nodes ranking behind "customers like
    yours" / related-entity panels, on the same bidirected
    customer↔supplier graph as graph_pagerank. Nodes outside the
    seeds' neighborhood naturally drop out of the frontier (rank mass
    reaches only what the seeds reach in 3 hops), which is exactly
    what makes PPR cheaper than global PageRank at scale: the frontier
    is neighborhood-sized, not graph-sized.

    Exactness: scale-12 decimal contract on every propagation sum
    (same as graph_pagerank); the restart bonus joins the seed set
    full-outer so seeded-but-unreached and reached-but-unseeded nodes
    both carry the right mass. Emits the round-5 `residual` column
    (max |Δrank| between the last two iterations, LEFT-joined because
    the frontier GROWS across iterations — a node new in iteration i
    has prev rank 0).

    Scale: per iteration one frontier⋈outdeg node-sized join, one
    edges⋈frontier shuffle-hash join (frontier-sized, small), one
    dst-grouped sum; seeds and iteration state are checkpointed
    node-sized frames.
    """
    o, li = (
        _t(spark, sf_dir, "orders", "lineitem")[t] for t in ("orders", "lineitem")
    )
    # dedup BEFORE mirroring (guide §2.3: shuffle fewer bytes; the
    # graph_pagerank note): the two directions of a bidirected pair are
    # distinct iff the pair is (cust/supp node ids are parity-disjoint),
    # so one distinct over |pairs| rows replaces the former distinct
    # over the 2x mirrored union — half the dedup shuffle, identical
    # edge set.
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (2 * F.col("o_custkey")).alias("cust_node"),
            (2 * F.col("l_suppkey") + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = (
        pairs.select(F.col("cust_node").alias("src"), F.col("supp_node").alias("dst"))
        .union(
            pairs.select(
                F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
            )
        )
        .transform(cut_lineage_lazy)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg")).transform(cut_lineage_lazy)
    seeds = (
        outdeg.select(F.col("src").alias("node"))
        .filter((F.col("node") % 2 == 0) & ((F.col("node") / 2) % 97 == 0))
        .transform(cut_lineage_lazy)
    )
    n_seeds = seeds.count()
    r = seeds.select("node", F.lit(1.0 / n_seeds).alias("rank"))
    r_prev = r
    bonus = seeds.select("node", F.lit(0.15 / n_seeds).alias("bonus"))
    for _ in range(3):
        # node-sized frontier broadcast when the driving table's layout
        # bounds it (guide §3.1; the graph_pagerank loop pattern): the
        # edge list is then never shuffled inside the loop. On a real
        # lake layout the guard returns the frame unchanged and the
        # shuffle_hash hint keeps the scale-audited per-iteration plan.
        frontier = broadcast_if_small(
            r.join(outdeg, r["node"] == outdeg["src"]).select(
                "node", (F.col("rank") / F.col("deg")).alias("share")
            ),
            sf_dir,
            "orders",
        )
        contrib = (
            edges.hint("shuffle_hash")
            .join(frontier, edges["src"] == frontier["node"])
            .select("dst", F.col("share").alias("c"))
            .groupBy("dst")
            .agg(
                F.round(F.sum(F.col("c").cast("decimal(38,15)")), 12)
                .cast("double").alias("contrib")
            )
            .select(F.col("dst").alias("node"), "contrib")
        )
        r_prev = r
        # per-iteration checkpoint: the next iteration and the residual
        # both consume each frontier (see graph_pagerank's loop note)
        r = (
            contrib.join(bonus, "node", "full_outer")
            .select(
                "node",
                (
                    F.lit(0.85) * F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.coalesce(F.col("bonus"), F.lit(0.0))
                ).alias("rank"),
            )
            .transform(cut_lineage_lazy)
        )
    resid = (
        r.join(r_prev.withColumnRenamed("rank", "prev"), "node", "left")
        .agg(
            F.round(
                F.max(F.abs(F.col("rank") - F.coalesce(F.col("prev"), F.lit(0.0)))), 9
            ).cast("double").alias("residual")
        )
    )
    return (
        r.orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
        .select("node", F.round("rank", 9).alias("rank"))
        .crossJoin(F.broadcast(resid))
    )


# ---------------------------------------------------------------------------
# Bollinger bands: rolling volatility envelope on integer fixed-point
# ---------------------------------------------------------------------------

_BOLL_SQL = """
    WITH daily AS (
        SELECT event_type, DATE_TRUNC('day', ts) AS day,
               CAST(FLOOR(SUM(CAST(value AS DECIMAL(38,10))) * 1e4 + 0.5)
                    AS BIGINT) AS v4
        FROM events GROUP BY event_type, DATE_TRUNC('day', ts)
    ), framed AS (
        SELECT event_type, day, v4,
               SUM(v4)      OVER w AS s,
               SUM(v4 * v4) OVER w AS ss,
               COUNT(*)     OVER w AS n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day,
           CAST(v4 AS DOUBLE) / 1e4 AS revenue,
           FLOOR(CAST(s AS DOUBLE) / n / 1e4 * 1e6 + 0.5) / 1e6 AS mid,
           FLOOR(SQRT(GREATEST(CAST(n AS DOUBLE) * ss - CAST(s AS DOUBLE) * s, 0)
                      / (CAST(n AS DOUBLE) * GREATEST(n - 1, 1)))
                 / 1e4 * 1e6 + 0.5) / 1e6 AS band_halfwidth_over_2,
           CASE WHEN n >= 7 AND CAST(v4 AS DOUBLE) / 1e4
                     > CAST(s AS DOUBLE) / n / 1e4
                       + 2 * SQRT(GREATEST(CAST(n AS DOUBLE) * ss
                                           - CAST(s AS DOUBLE) * s, 0)
                                  / (CAST(n AS DOUBLE) * GREATEST(n - 1, 1))) / 1e4
                THEN 1 ELSE 0 END AS above_upper
    FROM framed
"""


@query("ts_bollinger_bands", oracle=_BOLL_SQL)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily revenue per event type: 7-day rolling
    mean ± 2σ envelope, with a breakout flag for days above the upper
    band — the volatility-normalized anomaly view (a fixed z-threshold
    on a rolling window) that complements ts_anomaly_zscore's global
    stats and ts_mad_outliers' robust version.

    Exactness: the daily grain is decimal-summed then fixed to an
    INTEGER number of 1e-4 units, so the rolling SUM and SUM of squares
    are exact integer arithmetic in both engines (ss ≤ 7·(1e8)² well
    inside int64); mean and σ derive from those exact integers with
    IEEE-deterministic double ops (sqrt is correctly-rounded by IEEE
    754), quantized at 1e-6 for output. The breakout flag compares the
    same exact inputs, so it cannot flip across engines.

    Scale: one shuffle to the (event_type, day) grain — calendar-
    bounded — then a per-type ordered window over day-sized partitions.
    """
    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(
            F.floor(
                F.sum(F.col("value").cast("decimal(38,10)")) * 1e4 + 0.5
            ).cast("bigint").alias("v4")
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, 0)
    )
    framed = daily.select(
        "event_type", "day", "v4",
        F.sum("v4").over(w).alias("s"),
        F.sum(F.col("v4") * F.col("v4")).over(w).alias("ss"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    var_num = F.greatest(nd * F.col("ss") - sd * F.col("s"), F.lit(0.0))
    sigma4 = F.sqrt(var_num / (nd * F.greatest(F.col("n") - 1, F.lit(1))))
    mean4 = sd / F.col("n")
    return framed.select(
        "event_type", "day",
        (F.col("v4").cast("double") / 1e4).alias("revenue"),
        (F.floor(mean4 / 1e4 * 1e6 + 0.5) / 1e6).alias("mid"),
        (F.floor(sigma4 / 1e4 * 1e6 + 0.5) / 1e6).alias("band_halfwidth_over_2"),
        F.when(
            (F.col("n") >= 7)
            & (F.col("v4").cast("double") / 1e4 > mean4 / 1e4 + 2 * sigma4 / 1e4),
            1,
        ).otherwise(0).alias("above_upper"),
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility: tokens-per-word diagnostics by language
# ---------------------------------------------------------------------------

_FERT_SQL = """
    WITH per_doc AS (
        SELECT lang,
               LENGTH(text) AS n_chars,
               LENGTH(TRIM(text)) - LENGTH(REPLACE(REGEXP_REPLACE(TRIM(text),
                     '\\s+', ' ', 'g'), ' ', '')) + 1 AS n_words,
               LENGTH(REGEXP_REPLACE(LOWER(text), '[a-z0-9]+|[^a-z0-9\\s]', 'T', 'g'))
                 - LENGTH(REGEXP_REPLACE(LOWER(text),
                          '[a-z0-9]+|[^a-z0-9\\s]|.', '', 'g')) AS n_tokens
        FROM documents WHERE LENGTH(TRIM(text)) > 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           FLOOR(CAST(SUM(n_tokens) AS DOUBLE) / SUM(n_words) * 1e6 + 0.5) / 1e6
               AS fertility,
           FLOOR(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tokens) * 1e6 + 0.5) / 1e6
               AS chars_per_token
    FROM per_doc GROUP BY lang
"""


@query("ml_tokenizer_fertility", oracle=_FERT_SQL)
def ml_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: tokens-per-word and
    chars-per-token under a BPE-ish pre-tokenization (alnum runs +
    single punctuation marks) — the budgeting diagnostic for
    multilingual training mixes (a language with fertility 2× consumes
    2× the context window per word; chars-per-token sizes bytes-per-
    token cost).

    Token counting is regex-substitution arithmetic (each token run
    replaced by one sentinel char; count = length delta), integer-exact
    in both engines; ratios are integer-ratio doubles quantized at
    1e-6.

    Scale: embarrassingly parallel per-doc map + one |langs|-sized
    aggregate.
    """
    d = _t(spark, sf_dir, "documents")["documents"]
    t = F.trim(F.col("text"))
    low = F.lower(F.col("text"))
    n_chars = F.length("text")
    n_words = (
        F.length(t)
        - F.length(F.replace(F.regexp_replace(t, r"\s+", " "), F.lit(" "), F.lit("")))
        + 1
    )
    one_t = F.regexp_replace(low, r"[a-z0-9]+|[^a-z0-9\s]", "T")
    n_tokens = F.length(one_t) - F.length(
        F.regexp_replace(low, r"[a-z0-9]+|[^a-z0-9\s]|.", "")
    )
    per_doc = d.filter(F.length(t) > 0).select(
        "lang",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        n_tokens.alias("n_tokens"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_words").alias("total_words"),
        (
            F.floor(
                F.sum("n_tokens").cast("double") / F.sum("n_words") * 1e6 + 0.5
            ) / 1e6
        ).alias("fertility"),
        (
            F.floor(
                F.sum("n_chars").cast("double") / F.sum("n_tokens") * 1e6 + 0.5
            ) / 1e6
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q17: small-quantity-order revenue (completes the TPC-H suite)
# ---------------------------------------------------------------------------

_Q17_SQL = """
    WITH perpart AS (
        SELECT l_partkey AS pk,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(38,10))), 4) AS DOUBLE)
                 / COUNT(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,10))), 4) AS DOUBLE)
             / 7.0 AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small_orders
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN perpart ON pk = l_partkey
    WHERE p_brand = 'Brand#2' AND l_quantity < 0.2 * avg_qty
"""


@query("tpch_q17_small_quantity", oracle=_Q17_SQL)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), adapted to the fixture
    schema (p_brand filter; no p_container column): yearly revenue lost
    if small orders — below 20% of the part's average quantity — were
    no longer filled. Completes the TPC-H suite: the correlated AVG
    subquery decorrelates into a per-part aggregate joined back to the
    fact (the same decorrelation contract tpch_q2 pins for MIN).

    Exactness: the per-part average uses the decimal-sum contract, so
    the 0.2·avg threshold is a deterministic double in both engines and
    the `<` comparison cannot flip; the revenue sum is decimal, the /7.0
    one IEEE division.

    Scale: lineitem shuffles once on l_partkey feeding BOTH the
    per-part aggregate and the probe side; the brand-filtered part dim
    broadcasts. No per-row subquery survives planning.
    """
    li, p = (_t(spark, sf_dir, "lineitem", "part")[t] for t in ("lineitem", "part"))
    perpart = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.round(F.sum(F.col("l_quantity").cast("decimal(38,10)")), 4)
            .cast("double") / F.count("l_quantity")
        ).alias("avg_qty")
    )
    brand = p.filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    return (
        li.join(F.broadcast(brand), li["l_partkey"] == F.col("p_partkey"))
        .join(perpart, li["l_partkey"] == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(38,10)")), 4)
                .cast("double") / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Ratio-metric inference via the delta method
# ---------------------------------------------------------------------------

def _q6(expr: str) -> str:
    return f"FLOOR(({expr}) * 1e6 + 0.5) / 1e6"


_RATIO_DELTA_SQL = f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               CAST(ROUND(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                                        ELSE 0 END AS DECIMAL(38,10))), 4) AS DOUBLE)
                 AS x,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS DOUBLE) AS y
        FROM events GROUP BY user_id
    ), mom AS (
        SELECT variant,
               COUNT(*) AS n,
               {dsum_expr('x')} AS sx,
               {dsum_expr('y')} AS sy,
               {dsum_expr('x * x')} AS sxx,
               {dsum_expr('y * y')} AS syy,
               {dsum_expr('x * y')} AS sxy
        FROM per_user GROUP BY variant
    )
    SELECT variant,
           CAST(n AS BIGINT) AS n_users,
           {_q6('sx / sy')} AS ratio,
           {_q6('''SQRT(GREATEST(
                 (sxx - sx * sx / n)
                 - 2 * (sx / sy) * (sxy - sx * sy / n)
                 + (sx / sy) * (sx / sy) * (syy - sy * sy / n), 0)
               / (n - 1)) / ((sy / n) * SQRT(CAST(n AS DOUBLE)))''')} AS se,
           {_q6('''sx / sy - 1.959964 * SQRT(GREATEST(
                 (sxx - sx * sx / n)
                 - 2 * (sx / sy) * (sxy - sx * sy / n)
                 + (sx / sy) * (sx / sy) * (syy - sy * sy / n), 0)
               / (n - 1)) / ((sy / n) * SQRT(CAST(n AS DOUBLE)))''')} AS ci_lo,
           {_q6('''sx / sy + 1.959964 * SQRT(GREATEST(
                 (sxx - sx * sx / n)
                 - 2 * (sx / sy) * (sxy - sx * sy / n)
                 + (sx / sy) * (sx / sy) * (syy - sy * sy / n), 0)
               / (n - 1)) / ((sy / n) * SQRT(CAST(n AS DOUBLE)))''')} AS ci_hi
    FROM mom
"""


@query("ab_ratio_metric_delta", oracle=_RATIO_DELTA_SQL)
def ab_ratio_metric_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method confidence interval for a RATIO metric (purchase
    value per click): the estimand is Σx/Σy, whose variance naive
    per-user averaging gets wrong because users contribute unequal
    denominators — THE standard experimentation subtlety (Deng et al.'s
    ratio-metric delta method). Var(x̄/ȳ) ≈ (var_x − 2R·cov_xy +
    R²·var_y) / (n·ȳ²), all moments from one pass of per-user sums.

    Exactness: every moment (Σx, Σy, Σx², Σy², Σxy) goes through the
    decimal contract, so the double-valued variance algebra starts from
    identical inputs in both engines; outputs quantized at 1e-6.

    Scale: one shuffle to the user grain, one |variants|-row moment
    aggregate; the CI math is per-group scalar arithmetic.
    """
    ev = _t(spark, sf_dir, "events")["events"]
    per_user = ev.groupBy("user_id").agg(
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0.0).cast("decimal(38,10)")
            ), 4
        ).cast("double").alias("x"),
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("double").alias("y"),
    )
    dd = lambda c: F.round(F.sum(c.cast("decimal(38,10)")), 4).cast("double")  # noqa: E731
    mom = per_user.groupBy(
        (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dd(F.col("x")).alias("sx"),
        dd(F.col("y")).alias("sy"),
        dd(F.col("x") * F.col("x")).alias("sxx"),
        dd(F.col("y") * F.col("y")).alias("syy"),
        dd(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    r = F.col("sx") / F.col("sy")
    var_num = F.greatest(
        (F.col("sxx") - F.col("sx") * F.col("sx") / n)
        - 2 * r * (F.col("sxy") - F.col("sx") * F.col("sy") / n)
        + r * r * (F.col("syy") - F.col("sy") * F.col("sy") / n),
        F.lit(0.0),
    )
    se = F.sqrt(var_num / (n - 1)) / ((F.col("sy") / n) * F.sqrt(n))
    q6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    return mom.select(
        "variant",
        F.col("n").alias("n_users"),
        q6(r).alias("ratio"),
        q6(se).alias("se"),
        q6(r - 1.959964 * se).alias("ci_lo"),
        q6(r + 1.959964 * se).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Sampled-source harmonic closeness centrality
# ---------------------------------------------------------------------------

_CLOSE_ROUNDS = 3
_CLOSE_SEED_MOD = 17


def _closeness_sql() -> str:
    from es_analytics_spark.queries_sql4 import _TRI_CAP, _TRI_STRIDE

    parts = [
        f"""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        FROM lineitem WHERE l_partkey % {_TRI_STRIDE} = 0
    ), keep AS (
        SELECT p FROM ps GROUP BY p HAVING COUNT(*) <= {_TRI_CAP}
    ), e0 AS MATERIALIZED (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        JOIN keep k ON k.p = a.p
    ), und AS MATERIALIZED (
        SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
    ), seeds AS MATERIALIZED (
        SELECT DISTINCT u AS node FROM und WHERE u % {_CLOSE_SEED_MOD} = 0
    ), d0 AS MATERIALIZED (
        SELECT node, node AS seed, 0 AS dist FROM seeds
    )"""
    ]
    for i in range(1, _CLOSE_ROUNDS + 1):
        parts.append(
            f""", d{i} AS MATERIALIZED (
        SELECT node, seed, MIN(dist) AS dist FROM (
            SELECT e.v AS node, d.seed, d.dist + 1 AS dist
            FROM d{i - 1} d JOIN und e ON e.u = d.node
            UNION ALL
            SELECT node, seed, dist FROM d{i - 1}
        ) GROUP BY node, seed
    )"""
        )
    parts.append(
        f"""
    SELECT node,
           CAST(COUNT(*) AS BIGINT) AS n_seeds_reached,
           CAST(SUM(CAST(FLOOR(1000000.0 / dist + 0.5) AS BIGINT)) AS DOUBLE) / 1e6
               AS harmonic
    FROM d{_CLOSE_ROUNDS} WHERE dist > 0
    GROUP BY node
    ORDER BY harmonic DESC, node ASC LIMIT 20
"""
    )
    return "".join(parts)


@query("graph_closeness_sampled", oracle=_closeness_sql())
def graph_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness centrality estimated from SAMPLED sources:
    multi-source BFS (3 rounds) from a deterministic seed subset (node
    ≡ 0 mod {mod}) of the co-supply graph, harmonic score Σ 1/dist over
    reached seeds — the estimator that makes closeness tractable at
    scale (exact closeness is all-pairs; sampling k sources bounds
    state at |nodes|·k and the Eppstein–Wang bound says k = O(log n/ε²)
    sources suffice). Top-20 most central suppliers.

    Exactness: distances are integers; 1/dist is summed as
    FLOOR(1e6/dist + 0.5) micro-units — pure integer arithmetic, no
    float divergence anywhere until the final /1e6 display division.

    Scale: per BFS round one (frontier ⋈ edges) shuffle and one
    (node, seed) min-aggregate; state is |nodes|·|seeds| (seed sampling
    is the knob), checkpointed per round so lineage stays flat.
    """.format(mod=_CLOSE_SEED_MOD)
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    e = _co_supply_edges(spark, sf_dir)
    und = (
        e.select("u", "v")
        .unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .transform(cut_lineage_lazy)
    )
    seeds = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .filter(F.col("node") % _CLOSE_SEED_MOD == 0)
        .transform(cut_lineage_lazy)
    )
    # the multi-source frontier is |nodes| x |seeds|, NOT node-sized, so
    # the broadcast guard scales the supplier-table bound by the
    # MEASURED seed count (a 1-row driver aggregate over a checkpointed
    # node-sized frame) — honest super-linear gating: a lake-scale seed
    # set trips the guard and the shuffle_hash hint keeps the audited
    # per-round exchange plan (guide §3.1).
    n_seeds = seeds.count()
    d = seeds.select("node", F.col("node").alias("seed"), F.lit(0).alias("dist"))
    for _ in range(_CLOSE_ROUNDS):
        stepped = (
            broadcast_if_small(d, sf_dir, "supplier", factor=float(max(n_seeds, 1)))
            .join(und.hint("shuffle_hash"), d["node"] == und["u"])
            .select(F.col("v").alias("node"), "seed", (F.col("dist") + 1).alias("dist"))
        )
        d = (
            stepped.unionByName(d)
            .groupBy("node", "seed")
            .agg(F.min("dist").alias("dist"))
            .transform(cut_lineage_lazy)
        )
    return (
        d.filter(F.col("dist") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_seeds_reached"),
            (
                F.sum(F.floor(1000000.0 / F.col("dist") + 0.5).cast("bigint"))
                .cast("double") / 1e6
            ).alias("harmonic"),
        )
        .orderBy(F.desc("harmonic"), F.asc("node"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# KMV set algebra: union / intersection estimates between user sets
# ---------------------------------------------------------------------------

_KMV6_K = 64


def _kmv_setops_sql() -> str:
    from es_analytics_spark.functions.portable import MIX_P, accept_hash_sql

    est = (
        f"CASE WHEN {{n}} < {_KMV6_K} THEN CAST({{n}} AS DOUBLE) "
        f"ELSE FLOOR(({_KMV6_K} - 1) * {MIX_P} * 1.0 / {{hk}} * 1e4 + 0.5) / 1e4 END"
    )
    return f"""
    WITH hashes AS MATERIALIZED (
        SELECT DISTINCT event_type, user_id, {accept_hash_sql('user_id')} AS h
        FROM events
    ), kth AS (
        SELECT event_type, COUNT(*) AS nh,
               MAX(CASE WHEN rn = {_KMV6_K} THEN h END) AS hk
        FROM (
            SELECT event_type, h,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM (SELECT DISTINCT event_type, h FROM hashes)
        ) WHERE rn <= {_KMV6_K} GROUP BY event_type
    ), pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM kth a JOIN kth b ON a.event_type < b.event_type
    ), ukth AS (
        SELECT type_a, type_b, COUNT(*) AS nh,
               MAX(CASE WHEN rn = {_KMV6_K} THEN h END) AS hk
        FROM (
            SELECT p.type_a, p.type_b, u.h,
                   ROW_NUMBER() OVER (PARTITION BY p.type_a, p.type_b
                                      ORDER BY u.h) AS rn
            FROM pairs p JOIN (SELECT DISTINCT event_type, h FROM hashes) u
              ON u.event_type IN (p.type_a, p.type_b)
            GROUP BY p.type_a, p.type_b, u.h
        ) WHERE rn <= {_KMV6_K} GROUP BY type_a, type_b
    ), exact AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_exact_both
        FROM (SELECT DISTINCT event_type, user_id FROM hashes) a
        JOIN (SELECT DISTINCT event_type, user_id FROM hashes) b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b,
           {est.format(n='ka.nh', hk='ka.hk')} AS est_a,
           {est.format(n='kb.nh', hk='kb.hk')} AS est_b,
           {est.format(n='uk.nh', hk='uk.hk')} AS est_union,
           GREATEST({est.format(n='ka.nh', hk='ka.hk')}
                    + {est.format(n='kb.nh', hk='kb.hk')}
                    - {est.format(n='uk.nh', hk='uk.hk')}, 0) AS est_intersection,
           CAST(COALESCE(e.n_exact_both, 0) AS BIGINT) AS exact_intersection
    FROM pairs p
    JOIN kth ka ON ka.event_type = p.type_a
    JOIN kth kb ON kb.event_type = p.type_b
    JOIN ukth uk ON uk.type_a = p.type_a AND uk.type_b = p.type_b
    LEFT JOIN exact e ON e.type_a = p.type_a AND e.type_b = p.type_b
"""


@query("agg_kmv_setops", oracle=_kmv_setops_sql())
def agg_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA: for every pair of event types, the union
    estimate comes from merging the two k-sample sketches (k smallest
    of the union — the mergeability KMV is chosen for) and the
    intersection via inclusion–exclusion, with the exact intersection
    beside it so sketch error is visible in the judged result. This is
    the audience-overlap query (users who both view and purchase)
    answered at fixed memory per set — at 100 TB the sketches are a few
    KB each while COUNT(DISTINCT) over the pair would shuffle the
    world.

    Exactness: both engines run the identical portable hash and the
    identical (k−1)·P/h_k arithmetic quantized at 1e-4, so estimates —
    not just exact counts — hash-match.

    Scale: one distinct pass builds per-type sketches (rank-then-filter
    to k rows per type before anything collects); the pair/union stage
    works on |types|²-bounded frames (constant dims); the exact
    intersection joins distinct (type,user) pairs — the one data-sized
    join, present deliberately as the error reference.
    """
    from es_analytics_spark.functions.portable import MIX_P, accept_hash

    ev = _t(spark, sf_dir, "events")["events"]
    hashes = (
        ev.select("event_type", "user_id")
        .distinct()
        .select(
            "event_type", "user_id", accept_hash(F.col("user_id")).alias("h")
        )
        .transform(cut_lineage)
    )
    th = hashes.select("event_type", "h").distinct()
    w = W.partitionBy("event_type").orderBy("h")
    kth = (
        th.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV6_K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("nh"),
            F.max(F.when(F.col("rn") == _KMV6_K, F.col("h"))).alias("hk"),
        )
        .transform(cut_lineage)
    )

    def est(nh, hk):
        return F.when(nh < _KMV6_K, nh.cast("double")).otherwise(
            F.floor((_KMV6_K - 1) * MIX_P * 1.0 / hk * 1e4 + 0.5) / 1e4
        )

    pairs = (
        kth.alias("a")
        .join(kth.alias("b"), F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            F.col("a.nh").alias("nh_a"), F.col("a.hk").alias("hk_a"),
            F.col("b.nh").alias("nh_b"), F.col("b.hk").alias("hk_b"),
        )
    )
    wu = W.partitionBy("type_a", "type_b").orderBy("h")
    ukth = (
        F.broadcast(pairs.select("type_a", "type_b"))
        .join(
            th,
            (th["event_type"] == F.col("type_a"))
            | (th["event_type"] == F.col("type_b")),
        )
        .select("type_a", "type_b", "h")
        .distinct()
        .withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= _KMV6_K)
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).alias("nh_u"),
            F.max(F.when(F.col("rn") == _KMV6_K, F.col("h"))).alias("hk_u"),
        )
    )
    tu = hashes.select("event_type", "user_id").distinct()
    exact = (
        tu.alias("a")
        .join(
            tu.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_exact_both"))
    )
    ea = est(F.col("nh_a"), F.col("hk_a"))
    eb = est(F.col("nh_b"), F.col("hk_b"))
    eu = est(F.col("nh_u"), F.col("hk_u"))
    return (
        pairs.join(ukth, ["type_a", "type_b"])
        .join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a", "type_b",
            ea.alias("est_a"), eb.alias("est_b"), eu.alias("est_union"),
            F.greatest(ea + eb - eu, F.lit(0.0)).alias("est_intersection"),
            F.coalesce(F.col("n_exact_both"), F.lit(0)).alias("exact_intersection"),
        )
    )


# ---------------------------------------------------------------------------
# N-gram novelty curve: how much NEW content each slice of the corpus adds
# ---------------------------------------------------------------------------

_NOVELTY_SQL = f"""
    WITH words AS (
        SELECT doc_id, STRING_SPLIT({_NORM6_SQL}, ' ') AS w FROM documents
    ), grams AS (
        SELECT doc_id,
               UNNEST(LIST_DISTINCT(CASE WHEN LEN(w) >= 3
                 THEN LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 2),
                                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                 ELSE [ARRAY_TO_STRING(w, ' ')] END)) AS g
        FROM words
    ), first_seen AS (
        SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    ), per_doc AS (
        SELECT gr.doc_id,
               COUNT(*) AS n_grams,
               COUNT(CASE WHEN fs.first_doc = gr.doc_id THEN 1 END) AS n_novel
        FROM grams gr JOIN first_seen fs ON fs.g = gr.g
        GROUP BY gr.doc_id
    )
    SELECT doc_id // 100 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_grams) AS BIGINT) AS total_grams,
           CAST(SUM(n_novel) AS BIGINT) AS novel_grams,
           FLOOR(CAST(SUM(n_novel) AS DOUBLE) / SUM(n_grams) * 1e6 + 0.5) / 1e6
               AS novelty
    FROM per_doc GROUP BY doc_id // 100
"""


@query("text_ngram_novelty", oracle=_NOVELTY_SQL)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus novelty curve: per 100-doc slice (in doc_id order — the
    ingestion order proxy), the fraction of its distinct word trigrams
    never seen in any earlier document. The diminishing-returns signal
    every corpus-growth decision reads — when novelty flattens, more of
    the same source stops adding training value (the Baevski/Kaplan
    data-scaling intuition made measurable).

    First-seen attribution is MIN(doc_id) per gram — exact, order-
    independent, and engine-agnostic; ratios are integer-ratio doubles
    quantized at 1e-6.

    Scale: explode to the (gram, doc) grain, one gram-keyed
    min-aggregate (map-side combined), join back on gram (both sides
    gram-keyed — co-partitioned), bucket rollup. Same shuffle family as
    text_tfidf_topk; gram cardinality, not corpus bytes, drives the
    exchange.
    """
    from es_analytics_spark.operators.dedup import normalize_text

    d = _t(spark, sf_dir, "documents")["documents"]
    # materialize the words array in its own projection FIRST: building
    # trigrams straight off the split expression makes Catalyst
    # re-inline the split into every element_at (3 per gram) — the
    # 15-40× re-inline trap operators/dedup.py's _shingle_expr pins
    words = d.select("doc_id", F.split(normalize_text(F.col("text")), " ").alias("w"))
    w = F.col("w")
    n = F.size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    tri = F.when(
        n >= 3,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(w, i.cast("int")),
                F.element_at(w, (i + 1).cast("int")),
                F.element_at(w, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array(F.concat_ws(" ", w)))
    grams = words.select(
        "doc_id", F.explode(F.array_distinct(tri)).alias("g")
    ).transform(cut_lineage)
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count(F.when(F.col("first_doc") == F.col("doc_id"), 1)).alias("n_novel"),
        )
    )
    return per_doc.groupBy(
        (F.col("doc_id") / 100).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").alias("total_grams"),
        F.sum("n_novel").alias("novel_grams"),
        (
            F.floor(
                F.sum("n_novel").cast("double") / F.sum("n_grams") * 1e6 + 0.5
            ) / 1e6
        ).alias("novelty"),
    )


# ---------------------------------------------------------------------------
# Brown–Forsythe variance-homogeneity test (Levene with median centers)
# ---------------------------------------------------------------------------

# one SQL text, two engines: every construct here (PERCENTILE_DISC
# WITHIN GROUP, FILTER-free aggregates, decimal casts) parses and
# computes identically in Spark SQL and DuckDB — the agg_mode_median
# pattern
_LEVENE_SQL = """
    WITH med AS (
        SELECT event_type,
               CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY value)
                    AS DOUBLE) AS med
        FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, ABS(e.value - m.med) AS z
        FROM events e JOIN med m ON m.event_type = e.event_type
    ), grp AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(ROUND(SUM(CAST(z AS DECIMAL(38,10))), 4) AS DOUBLE) AS sz,
               CAST(ROUND(SUM(CAST(z * z AS DECIMAL(38,10))), 4) AS DOUBLE) AS szz
        FROM dev GROUP BY event_type
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS nn,
               CAST(ROUND(SUM(CAST(sz AS DECIMAL(38,10))), 4) AS DOUBLE) AS tz
        FROM grp
    ), parts AS (
        SELECT t.k, t.nn,
               CAST(ROUND(SUM(CAST(
                   n * (sz / n - t.tz / t.nn) * (sz / n - t.tz / t.nn)
                   AS DECIMAL(38,10))), 6) AS DOUBLE) AS ssb,
               CAST(ROUND(SUM(CAST(szz - sz * sz / n AS DECIMAL(38,10))), 6)
                    AS DOUBLE) AS ssw
        FROM grp CROSS JOIN tot t GROUP BY t.k, t.nn
    )
    SELECT k AS n_groups, nn AS n_obs,
           CAST(k - 1 AS BIGINT) AS df1, CAST(nn - k AS BIGINT) AS df2,
           FLOOR((ssb / (k - 1)) / (ssw / (nn - k)) * 1e6 + 0.5) / 1e6 AS f_stat
    FROM parts
"""


@query("stat_levene_bf", oracle=_LEVENE_SQL)
def stat_levene_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with MEDIAN centers): are event-value
    variances homogeneous across event types? One-way ANOVA F over
    absolute deviations from each group's median — the robust
    variance-equality gate run before pooled-variance t-tests
    (ab_welch_ttest is the fallback when this rejects). Completes the
    nonparametric shelf: KS (distribution), MWU (location), χ²
    (independence), randomization (exactness), Brown–Forsythe (spread).

    Exactness: PERCENTILE_DISC picks an actual data value (no
    interpolation); every sum in the F assembly goes through the
    decimal contract including the k-row combine (5 doubles summed in
    engine order would already drift).

    Scale: one |groups|-row median pass (full sort only within each
    type's partition), one broadcast join of 5 medians back to events,
    two bounded aggregates.
    """
    _views6(spark, sf_dir, "events")
    return spark.sql(_LEVENE_SQL)


def _views6(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name, df in _t(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Unordered (any-order) funnel
# ---------------------------------------------------------------------------

_UF_US_7D = 7 * 86400 * 1_000_000

_UNORDERED_FUNNEL_SQL = f"""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN EPOCH_US(ts) END) AS t_view,
               MIN(CASE WHEN event_type = 'click' THEN EPOCH_US(ts) END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN EPOCH_US(ts) END) AS t_buy
        FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                            AND t_buy IS NOT NULL THEN 1 END) AS BIGINT)
               AS n_all_three,
           CAST(COUNT(CASE WHEN GREATEST(t_view, t_click, t_buy)
                             - LEAST(t_view, t_click, t_buy) <= {_UF_US_7D}
                           THEN 1 END) AS BIGINT) AS n_all_three_within_7d,
           CAST(COUNT(CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                            AND t_buy IS NOT NULL
                            AND NOT (t_view < t_click AND t_click < t_buy)
                           THEN 1 END) AS BIGINT) AS n_out_of_order
    FROM firsts
"""


@query("funnel_unordered", oracle=_UNORDERED_FUNNEL_SQL)
def funnel_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any-order funnel: users who did ALL of view/click/purchase,
    regardless of sequence — with the within-7-days tightening and the
    count of users who completed OUT of the canonical order. The
    comparison against ts_funnel_windowed's ordered numbers is the
    product question itself: how much conversion does an
    order-enforcing funnel definition hide? (GREATEST/LEAST over the
    three first-touch times is NULL if any leg is NULL, so the 7-day
    predicate self-selects completers — no explicit NOT NULL needed,
    mirrored in both engines' NULL semantics.)

    Scale: one shuffle to the user grain (conditional MIN aggregate),
    one 1-row reduction. No joins, no windows.
    """
    ev = _t(spark, sf_dir, "events")["events"]
    tus = F.unix_micros(F.col("ts"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", tus)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", tus)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", tus)).alias("t_buy"),
    )
    all3 = (
        F.col("t_view").isNotNull()
        & F.col("t_click").isNotNull()
        & F.col("t_buy").isNotNull()
    )
    spread = F.greatest("t_view", "t_click", "t_buy") - F.least(
        "t_view", "t_click", "t_buy"
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count(F.when(all3, 1)).alias("n_all_three"),
        F.count(F.when(spread <= _UF_US_7D, 1)).alias("n_all_three_within_7d"),
        F.count(
            F.when(
                all3
                & ~(
                    (F.col("t_view") < F.col("t_click"))
                    & (F.col("t_click") < F.col("t_buy"))
                ),
                1,
            )
        ).alias("n_out_of_order"),
    )


# ---------------------------------------------------------------------------
# Quality-pruning curve: cumulative token accounting down the quality axis
# ---------------------------------------------------------------------------

_PRUNE_BAND_CHARS = 50

_PRUNE_SQL = f"""
    WITH scored AS (
        SELECT doc_id, n_chars,
               LENGTH(TRIM(text)) - LENGTH(REPLACE(REGEXP_REPLACE(TRIM(text),
                     '\\s+', ' ', 'g'), ' ', '')) + 1 AS n_words,
               n_chars // {_PRUNE_BAND_CHARS} AS band
        FROM documents WHERE LENGTH(TRIM(text)) > 0
    ), bands AS (
        SELECT band,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_tokens
        FROM scored GROUP BY band
    ), tot AS (
        SELECT CAST(SUM(n_tokens) AS BIGINT) AS all_tokens FROM bands
    )
    SELECT a.band,
           a.n_docs, a.n_tokens,
           CAST(SUM(b.n_docs) AS BIGINT) AS cum_docs,
           CAST(SUM(b.n_tokens) AS BIGINT) AS cum_tokens,
           FLOOR(CAST(SUM(b.n_tokens) AS DOUBLE) / MAX(t.all_tokens) * 1e6 + 0.5)
               / 1e6 AS cum_token_share
    FROM bands a
    JOIN bands b ON b.band >= a.band
    CROSS JOIN tot t
    GROUP BY a.band, a.n_docs, a.n_tokens
"""


@query("ml_quality_pruning_curve", oracle=_PRUNE_SQL)
def ml_quality_pruning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-pruning curve: band documents by the quality proxy
    (n_chars, the ml_quality_bucket_sample signal, in {band}-char
    bands) and report, for each band, the CUMULATIVE docs/tokens
    retained if the corpus were pruned to that band and above — the
    quality-vs-quantity tradeoff table a DataComp-style filtering
    decision reads ("keeping only the top bands leaves X% of tokens").

    The cumulative sums use the broadcast triangle self-join over the
    |bands| frame (the cumulative_offsets recipe) instead of an
    unpartitioned running window — bands are bounded by max doc length
    / {band} (constant ~40), so the triangle is ≤ 1.6k rows and the
    plan stays free of single-partition exchanges at any corpus size.

    Scale: one scan → one |bands| aggregate; everything after is
    constant-sized.
    """.format(band=_PRUNE_BAND_CHARS)
    d = _t(spark, sf_dir, "documents")["documents"]
    t = F.trim(F.col("text"))
    n_words = (
        F.length(t)
        - F.length(F.replace(F.regexp_replace(t, r"\s+", " "), F.lit(" "), F.lit("")))
        + 1
    )
    scored = d.filter(F.length(t) > 0).select(
        (F.col("n_chars") / _PRUNE_BAND_CHARS).cast("bigint").alias("band"),
        n_words.alias("n_words"),
    )
    bands = scored.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
    )
    tot = bands.agg(F.sum("n_tokens").alias("all_tokens"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(F.broadcast(b), F.col("b.band") >= F.col("a.band"))
        .crossJoin(F.broadcast(tot))
        .groupBy(
            F.col("a.band").alias("band"),
            F.col("a.n_docs").alias("n_docs"),
            F.col("a.n_tokens").alias("n_tokens"),
        )
        .agg(
            F.sum("b.n_docs").alias("cum_docs"),
            F.sum("b.n_tokens").alias("cum_tokens"),
            (
                F.floor(
                    F.sum("b.n_tokens").cast("double")
                    / F.max("all_tokens") * 1e6 + 0.5
                ) / 1e6
            ).alias("cum_token_share"),
        )
    )


# ---------------------------------------------------------------------------
# Shard assignment: greedy sequential packing by cumulative token count
# ---------------------------------------------------------------------------

_SHARD_TOKENS = 4096
_SHARD_PARTS = 32

_SHARD_SQL = f"""
    WITH toks AS (
        SELECT doc_id,
               LENGTH(TRIM(text)) - LENGTH(REPLACE(REGEXP_REPLACE(TRIM(text),
                     '\\s+', ' ', 'g'), ' ', '')) + 1 AS n_tokens
        FROM documents WHERE LENGTH(TRIM(text)) > 0
    ), cum AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_tokens AS cum_before
        FROM toks
    )
    SELECT CAST(cum_before // {_SHARD_TOKENS} AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM cum GROUP BY cum_before // {_SHARD_TOKENS}
"""


@query("ml_shard_assignment", oracle=_SHARD_SQL)
def ml_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequential shard planning for corpus export: docs in
    doc_id order accumulate into ~{n}-token shards (a doc belongs to
    the shard its cumulative START offset falls in) — the assignment a
    shard writer materializes directly, with per-shard doc ranges so
    each shard's input is a contiguous id slice (scan-pruned reads per
    shard at write time).

    The global running token sum is computed WITHOUT an unpartitioned
    window: doc_ids bucket into {p} balanced ranges via max-id scaling
    (one bounded scalar agg), the running sum runs inside each bucket's
    ordered partition, and the broadcast cumulative-offset table
    (functions/ranks.cumulative_offsets — |buckets|-row triangle) lifts
    local sums to exact global offsets. The ml_split_shuffle recipe
    applied to a weighted prefix sum.

    Scale: one scan, one bucket-partitioned window, one constant-size
    offset join; shard count = total tokens / {n}, output is
    shard-grain.
    """.format(n=_SHARD_TOKENS, p=_SHARD_PARTS)
    from es_analytics_spark.functions.ranks import cumulative_offsets

    d = _t(spark, sf_dir, "documents")["documents"]
    t = F.trim(F.col("text"))
    n_words = (
        F.length(t)
        - F.length(F.replace(F.regexp_replace(t, r"\s+", " "), F.lit(" "), F.lit("")))
        + 1
    )
    toks = d.filter(F.length(t) > 0).select(
        "doc_id", n_words.alias("n_tokens")
    )
    max_id = toks.agg(F.max("doc_id")).first()[0]
    pid = (F.col("doc_id") * _SHARD_PARTS / (max_id + 1)).cast("int")
    bucketed = toks.withColumn("pid", pid).transform(cut_lineage)
    per_bucket = bucketed.groupBy("pid").agg(F.sum("n_tokens").alias("cnt"))
    offs = cumulative_offsets(per_bucket, pid="pid", cnt="cnt")
    w = W.partitionBy("pid").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    cum = (
        bucketed.join(F.broadcast(offs), "pid")
        .withColumn(
            "cum_before",
            F.sum("n_tokens").over(w) - F.col("n_tokens") + F.col("off"),
        )
    )
    return cum.groupBy(
        (F.col("cum_before") / _SHARD_TOKENS).cast("bigint").alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Correlation matrix over the lineitem measures
# ---------------------------------------------------------------------------

_CORR_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix_sql() -> str:
    moments = ["CAST(COUNT(*) AS DOUBLE) AS n"]
    for m in _CORR_MEASURES:
        moments.append(f"{dsum_expr(m)} AS s_{m}")
        moments.append(f"{dsum_expr(f'{m} * {m}')} AS ss_{m}")
    pair_rows = []
    for i, a in enumerate(_CORR_MEASURES):
        for b in _CORR_MEASURES[i + 1 :]:
            moments.append(f"{dsum_expr(f'{a} * {b}')} AS sp_{a}_{b}")
            pair_rows.append(
                f"SELECT '{a}' AS m_a, '{b}' AS m_b, "
                f"FLOOR((n * sp_{a}_{b} - s_{a} * s_{b}) "
                f"/ SQRT((n * ss_{a} - s_{a} * s_{a}) * (n * ss_{b} - s_{b} * s_{b})) "
                f"* 1e6 + 0.5) / 1e6 AS corr FROM mom"
            )
    sql_moments = ",\n               ".join(moments)
    sql_pairs = "\n    UNION ALL\n    ".join(pair_rows)
    return f"""
    WITH mom AS MATERIALIZED (
        SELECT {sql_moments}
        FROM lineitem
    )
    {sql_pairs}
"""


@query("agg_corr_matrix", oracle=_corr_matrix_sql())
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix (long format) over the four
    lineitem measures, all six pairs from ONE scan: a single aggregate
    computes every first/second/cross moment through the decimal
    contract, then constant-size projection assembles each correlation
    — the feature-redundancy screen run before any modeling step, at
    the cost of one pass regardless of how many pairs.

    Scale: one partial+final aggregate (no shuffle beyond the 1-row
    combine); the pair expansion is driver-side arithmetic over a
    single broadcast row.
    """
    # eleven decimal partial sums per row, all in the scan stage — fan
    # out on a high-card key first (guide §2.2, the agg_pricing_summary
    # pattern; layout-gated no-op on a lake)
    li = fan_out(
        _t(spark, sf_dir, "lineitem")["lineitem"],
        sf_dir,
        "lineitem",
        "l_orderkey",
        weight=2,
    )
    dd = lambda c: F.round(F.sum(c.cast("decimal(38,10)")), 4).cast("double")  # noqa: E731
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for m in _CORR_MEASURES:
        aggs.append(dd(F.col(m)).alias(f"s_{m}"))
        aggs.append(dd(F.col(m) * F.col(m)).alias(f"ss_{m}"))
    pairs = []
    for i, a in enumerate(_CORR_MEASURES):
        for b in _CORR_MEASURES[i + 1 :]:
            aggs.append(dd(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
            pairs.append((a, b))
    mom = li.agg(*aggs).transform(cut_lineage)
    out = None
    for a, b in pairs:
        num = F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        den = F.sqrt(
            (F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            * (F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        )
        row = mom.select(
            F.lit(a).alias("m_a"),
            F.lit(b).alias("m_b"),
            (F.floor(num / den * 1e6 + 0.5) / 1e6).alias("corr"),
        )
        out = row if out is None else out.unionAll(row)
    return out


# ---------------------------------------------------------------------------
# Streaming experiment monitor: running ratio metric per variant
# ---------------------------------------------------------------------------

_STREAM_RATIO_SQL = """
    SELECT CAST(user_id % 2 AS INT) AS variant,
           CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
               AS n_clicks,
           CAST(ROUND(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                                    ELSE 0 END AS DECIMAL(38,10))), 4) AS DOUBLE)
               AS purchase_value,
           FLOOR(CAST(ROUND(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                                          ELSE 0 END AS DECIMAL(38,10))), 4)
                      AS DOUBLE)
                 / COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                 * 1e6 + 0.5) / 1e6 AS value_per_click
    FROM events GROUP BY CAST(user_id % 2 AS INT)
"""


@query("stream_ratio_metric", mutates_conf=True, oracle=_STREAM_RATIO_SQL)
def stream_ratio_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The experiment topline BY THE STREAMING ENGINE: per-variant
    running value-per-click maintained as a streaming aggregate
    (complete mode — per-variant state is two counters and a decimal
    sum, fixed memory forever) and replayed to exhaustion; the final
    epoch must equal the batch SQL oracle bit-for-bit, decimal sums
    included. The live companion to ab_ratio_metric_delta: the
    dashboard number updates per micro-batch, the delta-method CI runs
    batch-side at readout time (its per-user moments need two
    aggregation levels, which streaming forbids in one query — the
    standard split).

    Scale: streaming shuffle keyed by variant (2 groups); state is
    O(variants), not O(events)."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events

    ev = stream_events(spark, sf_dir)
    agg = (
        ev.groupBy((F.col("user_id") % 2).cast("int").alias("variant"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
            F.round(
                F.sum(
                    F.when(F.col("event_type") == "purchase", F.col("value"))
                    .otherwise(0.0).cast("decimal(38,10)")
                ), 4
            ).cast("double").alias("purchase_value"),
        )
    )
    out = replay_stream(
        spark, agg, name="stream_ratio_metric", output_mode="complete"
    )
    return out.select(
        "variant", "n_clicks", "purchase_value",
        (
            F.floor(F.col("purchase_value") / F.col("n_clicks") * 1e6 + 0.5) / 1e6
        ).alias("value_per_click"),
    )


# ---------------------------------------------------------------------------
# Fixed-effect meta-analysis: pooled treatment effect across segments
# ---------------------------------------------------------------------------

_META_SQL = f"""
    WITH per_user AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               CAST(EXTRACT(HOUR FROM MIN(ts)) // 6 AS INT) AS segment,
               CAST(ROUND(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value
                                        ELSE 0 END AS DECIMAL(38,10))), 4) AS DOUBLE)
                   AS x
        FROM events GROUP BY user_id
    ), mom AS (
        SELECT segment, variant, COUNT(*) AS n,
               {dsum_expr('x')} AS sx, {dsum_expr('x * x')} AS sxx
        FROM per_user GROUP BY segment, variant
    ), seg AS (
        SELECT a.segment,
               a.sx / a.n - b.sx / b.n AS d,
               GREATEST((a.sxx - a.sx * a.sx / a.n) / (a.n - 1) / a.n
                        + (b.sxx - b.sx * b.sx / b.n) / (b.n - 1) / b.n,
                        1e-12) AS var_d,
               a.n + b.n AS n_users
        FROM mom a JOIN mom b
          ON a.segment = b.segment AND a.variant = 1 AND b.variant = 0
        WHERE a.n >= 2 AND b.n >= 2
    ), pooled AS (
        SELECT CAST(ROUND(SUM(CAST(d / var_d AS DECIMAL(38,10))), 6) AS DOUBLE)
                   AS swd,
               CAST(ROUND(SUM(CAST(1.0 / var_d AS DECIMAL(38,10))), 6) AS DOUBLE)
                   AS sw,
               CAST(SUM(n_users) AS BIGINT) AS n_users
        FROM seg
    )
    SELECT CAST(segment AS VARCHAR) AS segment,
           CAST(n_users AS BIGINT) AS n_users,
           FLOOR(d * 1e6 + 0.5) / 1e6 AS effect,
           FLOOR(SQRT(var_d) * 1e6 + 0.5) / 1e6 AS se
    FROM seg
    UNION ALL
    SELECT 'POOLED' AS segment, n_users,
           FLOOR(swd / sw * 1e6 + 0.5) / 1e6 AS effect,
           FLOOR(SQRT(1.0 / sw) * 1e6 + 0.5) / 1e6 AS se
    FROM pooled
"""


@query("ab_fixed_effect_meta", oracle=_META_SQL)
def ab_fixed_effect_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effect (inverse-variance) meta-analysis: the per-segment
    treatment effects (user revenue, variant 1 − 0, segments = first-
    activity time-of-day band) pooled as Σw·d / Σw with w = 1/Var(d) —
    how multiple experiment slices (or repeated experiments) combine
    into one estimate with a principled SE, the companion to
    ab_srm_by_segment's per-slice trust check and ab_simpson_check's
    confounding guard (fixed-effect pooling weights by precision, so a
    huge noisy segment cannot drown a clean one the way a raw pooled
    mean does).

    Exactness: per-cell moments through the decimal contract; the
    |segments|-row combine of w·d and w is decimal-cast too (4 doubles
    summed in engine order would already drift); variance floored at
    1e-12 in both engines against degenerate cells.

    Scale: one shuffle to the user grain, one (segment × variant)
    aggregate, constant-size algebra after.
    """
    ev = _t(spark, sf_dir, "events")["events"]
    per_user = ev.groupBy("user_id").agg(
        (F.hour(F.min("ts")) / 6).cast("int").alias("segment"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value"))
                .otherwise(0.0).cast("decimal(38,10)")
            ), 4
        ).cast("double").alias("x"),
    ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
    dd = lambda c, s=4: F.round(F.sum(c.cast("decimal(38,10)")), s).cast("double")  # noqa: E731
    mom = per_user.groupBy("segment", "variant").agg(
        F.count(F.lit(1)).alias("n"),
        dd(F.col("x")).alias("sx"),
        dd(F.col("x") * F.col("x")).alias("sxx"),
    )
    a, b = mom.alias("a"), mom.alias("b")
    # cells with n < 2 have no sample variance (ANSI division by n-1
    # would throw); the oracle mirrors the same n >= 2 gate
    seg = (
        a.join(
            b,
            (F.col("a.segment") == F.col("b.segment"))
            & (F.col("a.variant") == 1) & (F.col("b.variant") == 0),
        )
        .filter((F.col("a.n") >= 2) & (F.col("b.n") >= 2))
        .select(
            F.col("a.segment").alias("segment"),
            (F.col("a.sx") / F.col("a.n") - F.col("b.sx") / F.col("b.n")).alias("d"),
            F.greatest(
                (F.col("a.sxx") - F.col("a.sx") * F.col("a.sx") / F.col("a.n"))
                / (F.col("a.n") - 1) / F.col("a.n")
                + (F.col("b.sxx") - F.col("b.sx") * F.col("b.sx") / F.col("b.n"))
                / (F.col("b.n") - 1) / F.col("b.n"),
                F.lit(1e-12),
            ).alias("var_d"),
            (F.col("a.n") + F.col("b.n")).alias("n_users"),
        )
        .transform(cut_lineage)
    )
    q6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    seg_rows = seg.select(
        F.col("segment").cast("string").alias("segment"),
        F.col("n_users").cast("bigint").alias("n_users"),
        q6(F.col("d")).alias("effect"),
        q6(F.sqrt(F.col("var_d"))).alias("se"),
    )
    pooled = seg.agg(
        dd(F.col("d") / F.col("var_d"), 6).alias("swd"),
        dd(F.lit(1.0) / F.col("var_d"), 6).alias("sw"),
        F.sum("n_users").cast("bigint").alias("n_users"),
    ).select(
        F.lit("POOLED").alias("segment"),
        "n_users",
        q6(F.col("swd") / F.col("sw")).alias("effect"),
        q6(F.sqrt(F.lit(1.0) / F.col("sw"))).alias("se"),
    )
    return seg_rows.unionAll(pooled)


# ---------------------------------------------------------------------------
# Metric momentum: velocity and acceleration of daily counts
# ---------------------------------------------------------------------------

_VELOCITY_SQL = """
    WITH daily AS (
        SELECT event_type, DATE_TRUNC('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, DATE_TRUNC('day', ts)
    ), vel AS (
        SELECT event_type, day, c,
               c - LAG(c) OVER w AS v
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
    )
    SELECT event_type, day, c,
           CAST(v AS BIGINT) AS velocity,
           CAST(v - LAG(v) OVER w AS BIGINT) AS acceleration,
           FLOOR(AVG(CAST(v AS DOUBLE)) OVER (PARTITION BY event_type
                 ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                 * 1e6 + 0.5) / 1e6 AS velocity_7d
    FROM vel WINDOW w AS (PARTITION BY event_type ORDER BY day)
"""


@query("ts_velocity_accel", oracle=_VELOCITY_SQL)
def ts_velocity_accel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric momentum: day-over-day velocity (first difference),
    acceleration (second difference), and 7-day smoothed velocity of
    daily event counts per type — the "is growth growing" readout
    behind every growth-accounting dashboard, as discrete derivatives
    of an integer series (exact; NULL on the undefined leading rows in
    both engines; the smoothed average skips NULLs identically).

    Scale: one shuffle to the calendar-bounded (type, day) grain, then
    per-type ordered windows over day-sized partitions.
    """
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("event_type").orderBy("day")
    wavg = w.rowsBetween(-6, 0)
    vel = daily.withColumn("v", F.col("c") - F.lag("c").over(w))
    return vel.select(
        "event_type", "day", "c",
        F.col("v").cast("bigint").alias("velocity"),
        (F.col("v") - F.lag("v").over(w)).cast("bigint").alias("acceleration"),
        (
            F.floor(F.avg(F.col("v").cast("double")).over(wavg) * 1e6 + 0.5) / 1e6
        ).alias("velocity_7d"),
    )
