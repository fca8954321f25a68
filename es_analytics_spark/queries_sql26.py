"""Round-5 batch-26 surface: a quantization-recall evaluation for the
vector-retrieval tier and the streaming twin of the cart-abandonment
window.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries import _COS_SQL
from es_analytics_spark.queries_sql18 import _ABANDON_SQL


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Quantization recall: 1e-4 int retrieval vs exact cosine retrieval
# ---------------------------------------------------------------------------

_QR_STRIDE = 100
_QR_K = 10

_QR_SQL = f"""
    WITH exact_pairs AS MATERIALIZED (
        SELECT q.vec_id AS qid, c.vec_id AS cid, {_COS_SQL} AS cosine
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id % {_QR_STRIDE} = 0
    ), exact_topk AS MATERIALIZED (
        SELECT qid, cid FROM (
            SELECT qid, cid,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, cid ASC) AS rn
            FROM exact_pairs) WHERE rn <= {_QR_K}
    ), dims AS MATERIALIZED (
        SELECT vec_id, GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
               CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1e4 + 0.5)
                    AS BIGINT) AS iq
        FROM embeddings
    ), nrm AS MATERIALIZED (
        SELECT vec_id, CAST(SUM(iq * iq) AS BIGINT) AS in2
        FROM dims GROUP BY 1
    ), idots AS MATERIALIZED (
        SELECT a.vec_id AS qid, b.vec_id AS cid,
               CAST(SUM(a.iq * b.iq) AS BIGINT) AS idot
        FROM dims a JOIN dims b ON b.dim = a.dim
        WHERE a.vec_id % {_QR_STRIDE} = 0 AND b.vec_id <> a.vec_id
        GROUP BY 1, 2
    ), int_topk AS MATERIALIZED (
        SELECT qid, cid FROM (
            SELECT d.qid, d.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.qid
                       ORDER BY FLOOR(CAST(d.idot AS DOUBLE)
                                / SQRT(CAST(nq.in2 AS DOUBLE) * nc.in2)
                                * 1e6 + 0.5) DESC, d.cid ASC) AS rn
            FROM idots d
            JOIN nrm nq ON nq.vec_id = d.qid
            JOIN nrm nc ON nc.vec_id = d.cid) WHERE rn <= {_QR_K}
    ), hits AS MATERIALIZED (
        SELECT e.qid, CAST(COUNT(i.cid) AS BIGINT) AS n_overlap
        FROM exact_topk e
        LEFT JOIN int_topk i ON i.qid = e.qid AND i.cid = e.cid
        GROUP BY e.qid
    ), avg_r AS (
        SELECT {dsum_expr(f'n_overlap * 1.0 / {_QR_K}')} / COUNT(*) AS mr
        FROM hits
    )
    SELECT h.qid AS query_id, h.n_overlap,
           FLOOR(h.n_overlap * 1.0 / {_QR_K} * 1e6 + 0.5) / 1e6
               AS recall_at_{_QR_K},
           FLOOR(avg_r.mr * 1e6 + 0.5) / 1e6 AS mean_recall
    FROM hits h CROSS JOIN avg_r
"""


@query("sim_quantization_recall", oracle=_QR_SQL)
def sim_quantization_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{_QR_K} of 1e-4-quantized integer retrieval against the
    exact-cosine ground truth, per sampled query plus the corpus mean —
    the eval that tells a vector platform whether the cheap
    integer/SQ8-style index is ALLOWED to replace the exact path
    (sim_sq8_topk ships the quantized retrieval; this measures what it
    costs). Both retrievals run in-engine; ground truth is the same
    ranking contract as sim_cosine_topk.

    Exactness: the exact arm uses the shared per-row array-fold cosine
    rounded at 1e-6; the quantized arm uses exact BIGINT dots/norms
    with the cosine quantized at 1e-6 inside the rank (matching the
    sim/ml int-retrieval contract); overlap counts are exact and
    recall is one quantized division; the mean decimal-sums the
    bounded query set.

    Scale: both arms are |queries| x |corpus| with the query side
    stride-sampled (the probe-budget convention); at production scale
    the exact arm runs on a held-out query sample only — exactly what
    this entry models."""
    em = _t(spark, sf_dir, "embeddings")["embeddings"]
    from es_analytics_spark.operators.similarity import cosine_pairs_above

    q = em.filter(F.col("vec_id") % _QR_STRIDE == 0)
    pairs = cosine_pairs_above(
        em, q, "vec_id", "embedding", threshold=-2.0
    ).withColumn("cosine", F.round("cosine", 6))
    we = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    exact_topk = (
        pairs.withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= _QR_K)
        .select(
            F.col("query_id").alias("qid"), F.col("neighbor_id").alias("cid")
        )
        .transform(cut_lineage)
    )
    dims = em.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "xf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("xf").cast("double") * 1e4 + F.lit(0.5))
        .cast("bigint")
        .alias("iq"),
    )
    nrm = dims.groupBy("vec_id").agg(
        F.sum(F.col("iq") * F.col("iq")).cast("bigint").alias("in2")
    )
    qdims = dims.filter(F.col("vec_id") % _QR_STRIDE == 0).select(
        F.col("vec_id").alias("qid"), "dim", F.col("iq").alias("qiq")
    )
    idots = (
        dims.join(F.broadcast(qdims), "dim")
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", F.col("vec_id").alias("cid"))
        .agg(F.sum(F.col("qiq") * F.col("iq")).cast("bigint").alias("idot"))
    )
    nq = nrm.select(F.col("vec_id").alias("qid"), F.col("in2").alias("qin2"))
    nc = nrm.select(F.col("vec_id").alias("cid"), F.col("in2").alias("cin2"))
    icos = F.floor(
        F.col("idot").cast("double")
        / F.sqrt(F.col("qin2").cast("double") * F.col("cin2"))
        * 1e6
        + F.lit(0.5)
    )
    wi = W.partitionBy("qid").orderBy(icos.desc(), F.col("cid").asc())
    int_topk = (
        idots.join(F.broadcast(nq), "qid")
        .join(F.broadcast(nc), "cid")
        .withColumn("rn", F.row_number().over(wi))
        .filter(F.col("rn") <= _QR_K)
        .select("qid", "cid")
        .transform(cut_lineage)
    )
    hits = (
        exact_topk.join(
            int_topk.withColumn("hit", F.lit(1)), ["qid", "cid"], "left"
        )
        .groupBy("qid")
        .agg(F.count(F.col("hit")).cast("bigint").alias("n_overlap"))
    )
    avg_r = hits.agg(
        (dsum(F.col("n_overlap") * F.lit(1.0) / _QR_K) / F.count(F.lit(1))).alias(
            "mr"
        )
    )
    return hits.crossJoin(F.broadcast(avg_r)).select(
        F.col("qid").alias("query_id"),
        "n_overlap",
        _q6(F.col("n_overlap") * F.lit(1.0) / _QR_K).alias(f"recall_at_{_QR_K}"),
        _q6(F.col("mr")).alias("mean_recall"),
    )


# ---------------------------------------------------------------------------
# Streaming twin of the cart-abandonment window
# ---------------------------------------------------------------------------


@query("stream_cart_abandonment", mutates_conf=True, oracle=_ABANDON_SQL)
def stream_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """seq_cart_abandonment's 1-hour windowed-existence check
    maintained by the STREAMING engine (applyInPandasWithState; see
    streaming.stateful.running_abandonment for the bounded-state
    re-derivation contract): per-user sorted view/purchase timestamp
    sets, each epoch re-grading every view, replayed to exhaustion and
    pinned against the identical correlated-EXISTS oracle as the batch
    entry — late purchases retroactively convert their views exactly
    as batch would, which a carry-only-counters design cannot do.

    Scale: state is the user's view/purchase timestamps (activity-
    bounded, capped); work per epoch is the micro-batch plus a per-key
    binary-search re-grade, sharded by user."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events
    from es_analytics_spark.streaming.stateful import running_abandonment

    ev = stream_events(spark, sf_dir)
    src = ev.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("tus"),
        F.when(F.col("event_type") == "view", 1).otherwise(2).alias("kind"),
    )
    out = replay_stream(
        spark,
        running_abandonment(src, 3_600_000_000),
        name="stream_cart_abandonment",
        output_mode="append",
    )
    w = W.partitionBy("user_id").orderBy(F.col("n_rows").desc())
    final = out.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    return final.select(
        "user_id",
        F.col("n_views").cast("bigint").alias("n_views"),
        F.col("n_converted").cast("bigint").alias("n_converted"),
        (F.col("n_views") - F.col("n_converted"))
        .cast("bigint")
        .alias("n_abandoned"),
        _q6(
            F.lit(1.0)
            - F.col("n_converted").cast("double") / F.col("n_views")
        ).alias("abandonment_rate"),
    )
