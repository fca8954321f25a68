"""Round-5 surface: training-data governance (cross-split leakage
detection), time-decay attribution completing the attribution quartet,
personalized PageRank with the round-5 residual-telemetry convention,
Bollinger-band volatility envelopes, and tokenizer fertility
diagnostics.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, dyadic (power-of-two) weights, or
integer fixed-point intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
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
    pairs = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        (2 * F.col("o_custkey")).alias("cust_node"),
        (2 * F.col("l_suppkey") + 1).alias("supp_node"),
    )
    edges = (
        pairs.select(F.col("cust_node").alias("src"), F.col("supp_node").alias("dst"))
        .union(
            pairs.select(
                F.col("supp_node").alias("src"), F.col("cust_node").alias("dst")
            )
        )
        .distinct()
        .transform(cut_lineage)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg")).transform(cut_lineage)
    seeds = (
        outdeg.select(F.col("src").alias("node"))
        .filter((F.col("node") % 2 == 0) & ((F.col("node") / 2) % 97 == 0))
        .transform(cut_lineage)
    )
    n_seeds = seeds.count()
    r = seeds.select("node", F.lit(1.0 / n_seeds).alias("rank"))
    r_prev = r
    bonus = seeds.select("node", F.lit(0.15 / n_seeds).alias("bonus"))
    for _ in range(3):
        frontier = r.join(outdeg, r["node"] == outdeg["src"]).select(
            "node", (F.col("rank") / F.col("deg")).alias("share")
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
        r = (
            contrib.join(bonus, "node", "full_outer")
            .select(
                "node",
                (
                    F.lit(0.85) * F.coalesce(F.col("contrib"), F.lit(0.0))
                    + F.coalesce(F.col("bonus"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    r = r.transform(cut_lineage)
    r_prev = r_prev.transform(cut_lineage)
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
