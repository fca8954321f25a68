"""Round-5 batch-10 surface: reciprocal-rank fusion for hybrid
retrieval, uncertainty sampling off the in-engine naive-Bayes model,
two-round gradient-boosted stumps (actual iterative training with an
unrolled SQL oracle), Croston intermittent-demand forecasting, a lake
compaction planner, and the streaming twin of the alert-debounce
sequential operator.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, integer fixed-point intermediates
(micro-harmonic RRF scores, micro-nat NB margins), dyadic 0.5^int
weights (exact in IEEE — the attr_time_decay precedent), or fixed IEEE
trees on decimal-rounded inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _COS_SQL, _t, query
from es_analytics_spark.queries_sql9 import (
    _DEBOUNCE_HOURS,
    _DEBOUNCE_SQL,
    _DEBOUNCE_VALUE,
    _NB_PREFIX,
    _nb_ranked,
)


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of two retrieval rankings
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF dampening constant
_RRF_DEPTH = 50  # per-ranker candidate depth
_RRF_TOP = 10

_RRF_SQL = f"""
    WITH sims AS MATERIALIZED (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_COS_SQL} AS cosine
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 2
    ), ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS r
        FROM sims
    ), fused AS (
        SELECT neighbor_id,
               CAST(SUM(FLOOR(1e9 / ({_RRF_K} + r) + 0.5)) AS BIGINT) AS rrf_u,
               CAST(COUNT(*) AS BIGINT) AS n_lists
        FROM ranked WHERE r <= {_RRF_DEPTH} GROUP BY 1
    ), top AS (
        SELECT neighbor_id, rrf_u, n_lists,
               ROW_NUMBER() OVER (ORDER BY rrf_u DESC, neighbor_id) AS rank
        FROM fused
    )
    SELECT neighbor_id, rrf_u, n_lists, CAST(rank AS INTEGER) AS rank
    FROM top WHERE rank <= {_RRF_TOP}
"""


@query("sim_rrf_fusion", oracle=_RRF_SQL)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF) of two retrieval rankings — the
    standard hybrid-search combiner (score = sum over rankers of
    1/(60 + rank)) that sim_hybrid_search's weighted-score variant is
    usually replaced by in production, because RRF needs NO score
    calibration between rankers: only ranks cross the fusion boundary.
    Here the two rankers are cosine retrievals for two probe vectors;
    the same code fuses any rankers that emit (list, item, rank).

    Exactness: per-list ranks come from the 1e-6-rounded cosine (the
    sim_cosine_topk contract) with id tie-breaks; each RRF term is the
    micro-integer harmonic FLOOR(1e9/(60+r) + 0.5) (the
    graph_closeness_sampled precedent), so fused scores are exact
    integer sums and the final top-10 is an exact integer sort.

    Scale: probes broadcast against the corpus (cosine_pairs_above's
    contract), per-list rank is a partitioned window, the fusion is a
    |candidates <= rankers x depth| aggregate, and the final top-10 is
    a bounded TakeOrdered — no all-pairs term anywhere."""
    from es_analytics_spark.operators.similarity import cosine_pairs_above

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 2)
    pairs = cosine_pairs_above(
        e, q, "vec_id", "embedding", threshold=-2.0
    ).withColumn("cosine", F.round("cosine", 6))
    wr = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    ranked = pairs.withColumn("r", F.row_number().over(wr)).filter(
        F.col("r") <= _RRF_DEPTH
    )
    fused = ranked.groupBy("neighbor_id").agg(
        F.sum(
            F.floor(F.lit(1e9) / (F.lit(_RRF_K) + F.col("r")) + F.lit(0.5))
        )
        .cast("bigint")
        .alias("rrf_u"),
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
    )
    top = fused.orderBy(F.col("rrf_u").desc(), F.col("neighbor_id")).limit(
        _RRF_TOP
    )
    wt = W.orderBy(F.col("rrf_u").desc(), F.col("neighbor_id"))
    return top.select(
        "neighbor_id", "rrf_u", "n_lists", F.row_number().over(wt).alias("rank")
    )


# ---------------------------------------------------------------------------
# Uncertainty sampling (active learning) off the naive-Bayes model
# ---------------------------------------------------------------------------

_UNC_TOP = 20

_UNC_SQL = (
    _NB_PREFIX
    + f"""
    , top2 AS (
        SELECT doc_id, MAX(true_lang) AS true_lang,
               MAX(CASE WHEN rn = 1 THEN m_lang END) AS pred_lang,
               MAX(CASE WHEN rn = 1 THEN s_tot END) AS s1,
               MAX(CASE WHEN rn = 2 THEN s_tot END) AS s2
        FROM ranked GROUP BY doc_id
    )
    SELECT doc_id, true_lang, pred_lang,
           CAST(s1 - s2 AS BIGINT) AS margin_unats
    FROM top2 ORDER BY margin_unats ASC, doc_id ASC LIMIT {_UNC_TOP}
"""
)


@query("ml_uncertainty_sampling", oracle=_UNC_SQL)
def ml_uncertainty_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based uncertainty sampling: the 20 held-out documents
    where the trained naive-Bayes classifier (ml_naive_bayes_langid's
    model, same shared scoring pipeline) is least sure — smallest gap
    between the top-1 and top-2 class posteriors. This is the active-
    learning selection step: at 100 TB you label (or route to a bigger
    model) exactly these rows first.

    Exactness: scores are the NB pipeline's exact integer micro-nats,
    so the margin is an exact integer difference and the bottom-20
    selection is an exact integer sort with doc_id tie-break.

    Scale: reuses the NB scoring plan (term-key join, broadcast class
    table), adds one per-doc top-2 pivot and a bounded TakeOrdered —
    selection cost is score-table-sized, never corpus-quadratic."""
    r = _nb_ranked(spark, sf_dir).filter(F.col("rn") <= 2)
    top2 = r.groupBy("doc_id").agg(
        F.max("true_lang").alias("true_lang"),
        F.max(F.when(F.col("rn") == 1, F.col("m_lang"))).alias("pred_lang"),
        F.max(F.when(F.col("rn") == 1, F.col("s_tot"))).alias("s1"),
        F.max(F.when(F.col("rn") == 2, F.col("s_tot"))).alias("s2"),
    )
    return (
        top2.select(
            "doc_id",
            "true_lang",
            "pred_lang",
            (F.col("s1") - F.col("s2")).cast("bigint").alias("margin_unats"),
        )
        .orderBy(F.asc("margin_unats"), F.asc("doc_id"))
        .limit(_UNC_TOP)
    )


# ---------------------------------------------------------------------------
# Two-round gradient-boosted regression stumps
# ---------------------------------------------------------------------------

_BST_Y = "p_retailprice"

_BST_CUM = (
    "CAST(ROUND(SUM(CAST({col} AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE)"
)

_BST_SSE = (
    "FLOOR((t.syy_t - (cy * cy / CAST(cn AS DOUBLE)"
    " + (t.sy_t - cy) * (t.sy_t - cy) / CAST(t.nn - cn AS DOUBLE)))"
    " * 1e6 + 0.5) / 1e6"
)


def _bst_sql() -> str:
    return f"""
    WITH g0 AS MATERIALIZED (
        SELECT p_size AS s, COUNT(*) AS n, {dsum_expr(_BST_Y)} AS sy,
               {dsum_expr(f'{_BST_Y} * {_BST_Y}')} AS syy
        FROM part GROUP BY 1
    ), t0 AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, {dsum_expr('sy')} AS sy_t,
               {dsum_expr('syy')} AS syy_t
        FROM g0
    ), c1 AS (
        SELECT s, CAST(SUM(n) OVER w AS BIGINT) AS cn,
               {_BST_CUM.format(col='sy')} AS cy
        FROM g0
        WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), sse1 AS (
        SELECT s, cn, cy, t.nn, t.sy_t, {_BST_SSE} AS sse
        FROM c1 CROSS JOIN t0 t WHERE cn < t.nn
    ), best1 AS MATERIALIZED (
        SELECT s AS t1, cn AS n_l, nn - cn AS n_r,
               cy / CAST(cn AS DOUBLE) AS m_l,
               (sy_t - cy) / CAST(nn - cn AS DOUBLE) AS m_r, sse
        FROM sse1 QUALIFY ROW_NUMBER() OVER (ORDER BY sse ASC, s ASC) = 1
    ), g2 AS MATERIALIZED (
        SELECT s, n, sy - n * p AS sy2,
               syy - 2 * p * sy + n * p * p AS syy2
        FROM (
            SELECT g0.*, CASE WHEN g0.s <= b.t1 THEN b.m_l ELSE b.m_r END AS p
            FROM g0 CROSS JOIN best1 b
        )
    ), t2 AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nn, {dsum_expr('sy2')} AS sy_t,
               {dsum_expr('syy2')} AS syy_t
        FROM g2
    ), c2 AS (
        SELECT s, CAST(SUM(n) OVER w AS BIGINT) AS cn,
               {_BST_CUM.format(col='sy2')} AS cy
        FROM g2
        WINDOW w AS (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW)
    ), sse2 AS (
        SELECT s, cn, cy, t.nn, t.sy_t, {_BST_SSE} AS sse
        FROM c2 CROSS JOIN t2 t WHERE cn < t.nn
    ), best2 AS (
        SELECT s AS t1, cn AS n_l, nn - cn AS n_r,
               cy / CAST(cn AS DOUBLE) AS m_l,
               (sy_t - cy) / CAST(nn - cn AS DOUBLE) AS m_r, sse
        FROM sse2 QUALIFY ROW_NUMBER() OVER (ORDER BY sse ASC, s ASC) = 1
    )
    SELECT 1 AS round, CAST(t1 AS BIGINT) AS threshold,
           CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
           FLOOR(m_l * 1e6 + 0.5) / 1e6 AS mean_left,
           FLOOR(m_r * 1e6 + 0.5) / 1e6 AS mean_right, sse
    FROM best1
    UNION ALL
    SELECT 2 AS round, CAST(t1 AS BIGINT) AS threshold,
           CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
           FLOOR(m_l * 1e6 + 0.5) / 1e6 AS mean_left,
           FLOOR(m_r * 1e6 + 0.5) / 1e6 AS mean_right, sse
    FROM best2
"""


@query("ml_boosted_stumps", oracle=_bst_sql())
def ml_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of gradient boosting with regression stumps (squared
    loss, learning rate 1) predicting retail price from part size:
    round 1 fits the best single split, round 2 fits the residuals —
    actual iterative model TRAINING in the engine, one step past
    ml_stump_importance's screening. The oracle is the fully unrolled
    two-round SQL, so the training math itself is cross-checked.

    Split search is the sufficient-statistics scan: per-feature-value
    (n, sum y, sum y^2) through the decimal contract, cumulated over
    the ordered value domain with an exact windowed DECIMAL sum
    (rounded to scale 4 per the dsum convention), so SSE(t) for EVERY
    threshold is a fixed IEEE tree on identical doubles — no per-row
    work per candidate. Residual statistics for round 2 derive
    algebraically from round 1's grain (sum r = sum y - n*pred, etc.),
    so round 2 NEVER rescans rows. Argmin ties break on threshold asc
    over the 1e-6-quantized SSE.

    Scale: one map-side-combinable scan to the |value domain| grain
    (p_size: <= 50 rows); the cumulative windows and argmin ranks run
    over that domain-bounded frame (allowlisted single-partition shape
    with a constant bound); every later round is grain arithmetic.
    With B feature bins this is the histogram-boosting layout
    LightGBM/XGBoost use at scale."""
    p = _t(spark, sf_dir, "part")["part"]
    y = F.col(_BST_Y)
    g0 = (
        p.groupBy(F.col("p_size").alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(y).alias("sy"),
            dsum(y * y).alias("syy"),
        )
        .transform(cut_lineage)
    )

    def round_fit(g: DataFrame) -> DataFrame:
        """One boosting round over a (s, n, sy, syy) grain: returns the
        1-row best split (t1, n_l, n_r, m_l, m_r, sse)."""
        t = g.agg(
            F.sum("n").cast("bigint").alias("nn"),
            dsum("sy").alias("sy_t"),
            dsum("syy").alias("syy_t"),
        )
        wcum = W.orderBy("s").rowsBetween(W.unboundedPreceding, W.currentRow)
        c = g.select(
            "s",
            F.sum("n").over(wcum).cast("bigint").alias("cn"),
            F.round(
                F.sum(F.col("sy").cast("decimal(38,10)")).over(wcum), 4
            )
            .cast("double")
            .alias("cy"),
        )
        sse = (
            c.crossJoin(F.broadcast(t))
            .filter(F.col("cn") < F.col("nn"))
            .select(
                "s",
                "cn",
                "cy",
                "nn",
                "sy_t",
                _q6(
                    F.col("syy_t")
                    - (
                        F.col("cy") * F.col("cy") / F.col("cn").cast("double")
                        + (F.col("sy_t") - F.col("cy"))
                        * (F.col("sy_t") - F.col("cy"))
                        / (F.col("nn") - F.col("cn")).cast("double")
                    )
                ).alias("sse"),
            )
        )
        wmin = W.orderBy(F.asc("sse"), F.asc("s"))
        return (
            sse.withColumn("rk", F.row_number().over(wmin))
            .filter(F.col("rk") == 1)
            .select(
                F.col("s").alias("t1"),
                F.col("cn").alias("n_l"),
                (F.col("nn") - F.col("cn")).alias("n_r"),
                (F.col("cy") / F.col("cn").cast("double")).alias("m_l"),
                (
                    (F.col("sy_t") - F.col("cy"))
                    / (F.col("nn") - F.col("cn")).cast("double")
                ).alias("m_r"),
                "sse",
            )
        )

    best1 = round_fit(g0).transform(cut_lineage)
    pred = F.when(F.col("s") <= F.col("t1"), F.col("m_l")).otherwise(
        F.col("m_r")
    )
    g2 = (
        g0.crossJoin(F.broadcast(best1))
        .withColumn("p", pred)
        .select(
            "s",
            "n",
            (F.col("sy") - F.col("n") * F.col("p")).alias("sy2"),
            (
                F.col("syy")
                - F.lit(2) * F.col("p") * F.col("sy")
                + F.col("n") * F.col("p") * F.col("p")
            ).alias("syy2"),
        )
        .withColumnRenamed("sy2", "sy")
        .withColumnRenamed("syy2", "syy")
    )
    best2 = round_fit(g2)

    def emit(best: DataFrame, rnd: int) -> DataFrame:
        return best.select(
            F.lit(rnd).alias("round"),
            F.col("t1").cast("bigint").alias("threshold"),
            F.col("n_l").cast("bigint").alias("n_left"),
            F.col("n_r").cast("bigint").alias("n_right"),
            _q6(F.col("m_l")).alias("mean_left"),
            _q6(F.col("m_r")).alias("mean_right"),
            "sse",
        )

    return emit(best1, 1).unionAll(emit(best2, 2))


# ---------------------------------------------------------------------------
# Croston intermittent-demand forecast (per-user purchase series)
# ---------------------------------------------------------------------------

# alpha = 0.5: EWMA weights are dyadic (0.5^int), exact in IEEE doubles
_CROSTON_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS z
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), seq AS MATERIALIZED (
        SELECT user_id, z,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS m,
               DATEDIFF('day', LAG(day) OVER (PARTITION BY user_id
                                              ORDER BY day), day) AS gap
        FROM daily
    ), agg AS (
        SELECT user_id, CAST(MAX(m) AS BIGINT) AS n_demands,
               {dsum_expr(
                   'z * POWER(0.5, CASE WHEN rn = 1 THEN m - 1'
                   ' ELSE m - rn + 1 END)'
               )} AS z_hat,
               {dsum_expr(
                   'CASE WHEN rn >= 2 THEN gap * POWER(0.5,'
                   ' CASE WHEN rn = 2 THEN m - 2 ELSE m - rn + 1 END) END'
               )} AS p_hat
        FROM seq WHERE m >= 2 GROUP BY 1
    )
    SELECT user_id, n_demands, z_hat, p_hat,
           FLOOR(z_hat / p_hat * 1e6 + 0.5) / 1e6 AS demand_per_day
    FROM agg
"""


@query("ts_croston", oracle=_CROSTON_SQL)
def ts_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method per user: intermittent-demand forecasting for
    series that are mostly zeros (a user buys on 13 of 30 days) —
    EWMA of the nonzero demand SIZES and EWMA of the INTER-demand
    intervals, forecast = size/interval per day. Plain EWMA
    (ts_ewma/ts_holt_linear) is biased toward zero on sparse series;
    Croston is the standard fix for spare-parts / long-tail demand.

    Exactness: alpha = 0.5 makes every EWMA weight a dyadic 0.5^int —
    multiplying a double by 2^-k is EXACT (exponent-only), so each
    weighted term is exact and only the cross-term sums need the
    decimal contract (the attr_time_decay dyadic precedent). Demand
    sizes are decimal-contract daily sums; intervals are exact
    day-integers; the final rate is one quantized division.

    Scale: one shuffle to the (user, day) demand grain, one
    user-partitioned window pass (per-user state = their demand days,
    activity-bounded), one aggregate. The closed-form weight spelling
    means no per-row recursion — the whole EWMA is one weighted sum."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("z"))
        .transform(cut_lineage)
    )
    wseq = W.partitionBy("user_id").orderBy("day")
    wall = W.partitionBy("user_id")
    seq = daily.select(
        "user_id",
        "z",
        F.row_number().over(wseq).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("m"),
        F.datediff(F.col("day"), F.lag("day").over(wseq)).alias("gap"),
    )
    zw = F.pow(
        F.lit(0.5),
        F.when(F.col("rn") == 1, F.col("m") - 1).otherwise(
            F.col("m") - F.col("rn") + 1
        ),
    )
    pw = F.when(
        F.col("rn") >= 2,
        F.col("gap")
        * F.pow(
            F.lit(0.5),
            F.when(F.col("rn") == 2, F.col("m") - 2).otherwise(
                F.col("m") - F.col("rn") + 1
            ),
        ),
    )
    agg = (
        seq.filter(F.col("m") >= 2)
        .groupBy("user_id")
        .agg(
            F.max("m").cast("bigint").alias("n_demands"),
            dsum(F.col("z") * zw).alias("z_hat"),
            dsum(pw).alias("p_hat"),
        )
    )
    return agg.select(
        "user_id",
        "n_demands",
        "z_hat",
        "p_hat",
        _q6(F.col("z_hat") / F.col("p_hat")).alias("demand_per_day"),
    )


# ---------------------------------------------------------------------------
# Lake compaction planner (offset binning of small files)
# ---------------------------------------------------------------------------

_COMPACT_ROW_BYTES = 64  # fixture row-width estimate (metadata seam)
_COMPACT_TARGET = 8192  # target output size per compacted file


_COMPACT_SQL = f"""
    WITH files AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               user_id % 16 AS bucket,
               CAST(COUNT(*) * {_COMPACT_ROW_BYTES} AS BIGINT) AS bytes
        FROM events GROUP BY 1, 2
    ), placed AS (
        SELECT day, bucket, bytes,
               CAST(COALESCE(SUM(bytes) OVER (
                   PARTITION BY day ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS off
        FROM files
    )
    SELECT day, CAST(off // {_COMPACT_TARGET} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bytes
    FROM placed GROUP BY 1, 2
"""


@query("lake_compaction_plan", oracle=_COMPACT_SQL)
def lake_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: within each partition (day), pack the
    partition's files into target-sized output bins by byte offset —
    the planning half of OPTIMIZE/compaction that lake_partition_advisor
    motivates and maintenance-style rewrites execute. A file's bin is
    floor(cumulative_bytes_before_it / target): deterministic,
    order-stable (files ordered by id), and single-pass.

    The fixture has no physical small files, so the "file listing" is
    the metadata seam: (day, user-bucket) groups with a constant
    row-width byte estimate stand in for (partition, file, size) rows;
    a real deployment feeds the same planner from the filesystem or
    manifest listing (sources/fsio.py) unchanged.

    Exactness: everything is exact integer arithmetic; the offset
    division's operands are non-negative, where DuckDB's floor
    division and Spark's `div` agree.

    Scale: one aggregate to the file-listing grain, one window over
    per-partition file lists (bounded by files-per-partition), one
    plan-grain aggregate. The plan output is what a compaction
    executor consumes as its work list."""
    e = _t(spark, sf_dir, "events")["events"]
    files = (
        e.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            (F.col("user_id") % 16).alias("bucket"),
        )
        .agg(
            (F.count(F.lit(1)) * _COMPACT_ROW_BYTES)
            .cast("bigint")
            .alias("bytes")
        )
    )
    woff = (
        W.partitionBy("day")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    placed = files.select(
        "day",
        "bytes",
        F.coalesce(F.sum("bytes").over(woff), F.lit(0))
        .cast("bigint")
        .alias("off"),
    )
    return (
        placed.groupBy(
            "day", F.expr(f"off div {_COMPACT_TARGET}").cast("bigint").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming twin of the alert debounce
# ---------------------------------------------------------------------------


@query("stream_alert_debounce", mutates_conf=True, oracle=_DEBOUNCE_SQL)
def stream_alert_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """seq_alert_debounce's cooldown chain maintained by the STREAMING
    engine (applyInPandasWithState; see streaming.stateful.
    running_debounce for the bounded-state re-derivation contract),
    replayed to exhaustion and pinned against the identical recursive-
    CTE oracle as the batch entry — the batch/stream parity bar every
    stateful operator in this engine meets. Because the state keeps
    the per-user alert set (not just the last kept timestamp), late or
    out-of-order arrivals re-anchor the chain exactly as batch would.

    Scale: state is one (ts, id) pair per alert per user (capped, see
    running_debounce); each epoch's work is the micro-batch plus a
    per-key sorted re-derivation — user-activity-bounded, sharded by
    user_id across executors."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events
    from es_analytics_spark.streaming.stateful import running_debounce

    ev = stream_events(spark, sf_dir)
    src = ev.filter(F.col("value") >= F.lit(_DEBOUNCE_VALUE)).select(
        "user_id", F.unix_micros(F.col("ts")).alias("tus"), "event_id"
    )
    out = replay_stream(
        spark,
        running_debounce(src, _DEBOUNCE_HOURS * 3_600 * 1_000_000),
        name="stream_alert_debounce",
        output_mode="append",
    )
    w = W.partitionBy("user_id").orderBy(F.col("n_rows").desc())
    final = out.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return final.select(
        "user_id",
        "n_alerts",
        "n_kept",
        F.timestamp_micros(F.col("first_kept_us")).alias("first_kept"),
        F.timestamp_micros(F.col("last_kept_us")).alias("last_kept"),
    )
