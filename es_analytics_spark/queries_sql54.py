"""Round-7 batch-54 surface: Dunn's post-hoc pairwise rank comparisons
(the follow-up Kruskal-Wallis demands) and absorbing-chain expected
steps to purchase.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql16 import _P2_EXPR, _PDF_EXPR, _T_EXPR


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Dunn's post-hoc test after Kruskal-Wallis
# ---------------------------------------------------------------------------

_DUNN_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 3 AS INT) AS grp,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), g AS (
        SELECT rev,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS c2
        FROM pu GROUP BY rev
    ), cum AS (
        SELECT c0, c1, c2,
               SUM(c0 + c1 + c2) OVER (ORDER BY rev) - (c0 + c1 + c2) AS kprev
        FROM g
    ), agg AS MATERIALIZED (
        SELECT SUM(c0) AS n0, SUM(c1) AS n1, SUM(c2) AS n2,
               SUM(c0 * (2 * kprev + c0 + c1 + c2 + 1)) AS r2_0,
               SUM(c1 * (2 * kprev + c0 + c1 + c2 + 1)) AS r2_1,
               SUM(c2 * (2 * kprev + c0 + c1 + c2 + 1)) AS r2_2,
               SUM((c0 + c1 + c2) * (c0 + c1 + c2) * (c0 + c1 + c2)
                   - (c0 + c1 + c2)) AS tie3,
               SUM(c0) + SUM(c1) + SUM(c2) AS n
        FROM cum
    ), pairs AS (
        SELECT 0 AS grp_a, 1 AS grp_b, r2_0 AS ra2, r2_1 AS rb2,
               n0 AS na, n1 AS nb, tie3, n FROM agg
        UNION ALL
        SELECT 0, 2, r2_0, r2_2, n0, n2, tie3, n FROM agg
        UNION ALL
        SELECT 1, 2, r2_1, r2_2, n1, n2, tie3, n FROM agg
    ), zs AS (
        SELECT grp_a, grp_b,
               FLOOR(CAST(ra2 AS DOUBLE) / (2.0 * na) * 1e4 + 0.5) / 1e4
                   AS mean_rank_a,
               FLOOR(CAST(rb2 AS DOUBLE) / (2.0 * nb) * 1e4 + 0.5) / 1e4
                   AS mean_rank_b,
               FLOOR((CAST(ra2 AS DOUBLE) / (2.0 * na)
                      - CAST(rb2 AS DOUBLE) / (2.0 * nb))
                     / SQRT((CAST(n AS DOUBLE) * (n + 1) / 12.0
                             - CAST(tie3 AS DOUBLE) / (12.0 * (n - 1)))
                            * (1.0 / na + 1.0 / nb)) * 1e6 + 0.5) / 1e6 AS z
        FROM pairs
    ), tstage AS (
        SELECT grp_a, grp_b, mean_rank_a, mean_rank_b, z,
               {_T_EXPR} AS t, {_PDF_EXPR} AS pdf
        FROM zs
    )
    SELECT grp_a, grp_b, mean_rank_a, mean_rank_b, z,
           LEAST(FLOOR(3.0 * ({_P2_EXPR}) * 1e6 + 0.5) / 1e6, 1.0)
               AS p_bonferroni,
           LEAST(FLOOR(3.0 * ({_P2_EXPR}) * 1e6 + 0.5) / 1e6, 1.0) < 0.05
               AS significant
    FROM tstage
    ORDER BY grp_a, grp_b
"""


@query("stat_dunn_posthoc", oracle=_DUNN_SQL)
def stat_dunn_posthoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunn's post-hoc pairwise comparisons after Kruskal-Wallis: for
    each variant pair, the standardized mean-rank difference
    z = (Rbar_i - Rbar_j) / sqrt((N(N+1)/12 - tie/(12(N-1)))
    (1/n_i + 1/n_j)) with Bonferroni-adjusted two-sided p — the test
    that answers WHICH arms differ once stat_kruskal_wallis's omnibus
    fires (running pairwise Mann-Whitneys instead reuses within-pair
    ranks and inflates error; Dunn reuses the POOLED ranks, which is
    the whole point).

    Exactness: doubled rank sums, group sizes, and the tie term come
    from the same exact BIGINT value-grain machinery as
    stat_kruskal_wallis; each pair's z is one fixed IEEE tree,
    quantized at 1e6; the normal CDF is the pinned Abramowitz-Stegun
    26.2.17 fragment shared VERBATIM with the oracle (the
    stat_bh_fdr precedent).

    Scale: the value-grain cumulative runs once (window-free recipe);
    the pair expansion is 3 rows off a broadcast 1-row aggregate."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("rev")
        )
        .select((F.col("user_id") % 3).cast("int").alias("grp"), "rev")
    )
    g = pu.groupBy("rev").agg(
        *[
            F.sum(F.when(F.col("grp") == i, 1).otherwise(0)).alias(f"c{i}")
            for i in range(3)
        ]
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        g.repartitionByRange(n_parts, F.asc("rev"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    t = F.col("c0") + F.col("c1") + F.col("c2")
    wv = W.partitionBy("pid").orderBy(F.asc("rev")).rowsBetween(
        W.unboundedPreceding, 0
    )
    local = ranged.select(
        "pid", "c0", "c1", "c2", (F.sum(t).over(wv) - t).alias("lprev")
    )
    offs = cumulative_offsets(ranged.groupBy("pid").agg(F.sum(t).alias("ct")), cnt="ct")
    m2 = 2 * (F.col("lprev") + F.col("off")) + t + 1
    agg = (
        local.join(F.broadcast(offs), "pid")
        .agg(
            F.sum("c0").alias("n0"),
            F.sum("c1").alias("n1"),
            F.sum("c2").alias("n2"),
            F.sum(F.col("c0") * m2).alias("r2_0"),
            F.sum(F.col("c1") * m2).alias("r2_1"),
            F.sum(F.col("c2") * m2).alias("r2_2"),
            F.sum(t * t * t - t).alias("tie3"),
        )
        .withColumn("n", F.col("n0") + F.col("n1") + F.col("n2"))
        .transform(cut_lineage)
    )
    pairs = None
    for a, b in ((0, 1), (0, 2), (1, 2)):
        row = agg.select(
            F.lit(a).alias("grp_a"),
            F.lit(b).alias("grp_b"),
            F.col(f"r2_{a}").alias("ra2"),
            F.col(f"r2_{b}").alias("rb2"),
            F.col(f"n{a}").alias("na"),
            F.col(f"n{b}").alias("nb"),
            "tie3",
            "n",
        )
        pairs = row if pairs is None else pairs.unionAll(row)
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    ra = F.col("ra2").cast("double") / (2.0 * F.col("na"))
    rb = F.col("rb2").cast("double") / (2.0 * F.col("nb"))
    nn = F.col("n").cast("double")
    sig = F.sqrt(
        (nn * (F.col("n") + 1) / 12.0 - F.col("tie3").cast("double") / (12.0 * (F.col("n") - 1)))
        * (1.0 / F.col("na") + 1.0 / F.col("nb"))
    )
    zs = pairs.select(
        "grp_a",
        "grp_b",
        q4(ra).alias("mean_rank_a"),
        q4(rb).alias("mean_rank_b"),
        _q6((ra - rb) / sig).alias("z"),
    )
    tstage = zs.withColumn("t", F.expr(_T_EXPR)).withColumn("pdf", F.expr(_PDF_EXPR))
    p_adj = F.least(
        F.floor(3.0 * F.expr(_P2_EXPR) * 1e6 + F.lit(0.5)) / 1e6, F.lit(1.0)
    )
    return tstage.select(
        "grp_a",
        "grp_b",
        "mean_rank_a",
        "mean_rank_b",
        "z",
        p_adj.alias("p_bonferroni"),
        (p_adj < 0.05).alias("significant"),
    ).orderBy("grp_a", "grp_b")


# ---------------------------------------------------------------------------
# Absorbing-chain expected steps to purchase
# ---------------------------------------------------------------------------

_ABS_ITERS = 30
_ABS_TARGET = "purchase"
# driver-pull guard: the transition matrix is |event_types|^2-bounded
_ABS_MAX_Q = 200_000


def _abs_sql() -> str:
    chain = []
    for k in range(1, _ABS_ITERS + 1):
        chain.append(f"""
    e{k} AS MATERIALIZED (
        SELECT st.node,
               1.0 + COALESCE(agg.s, 0.0) AS e
        FROM states st
        LEFT JOIN (
            SELECT q.src, CAST(ROUND(SUM(CAST(q.n * e.e / q.rs
                AS DECIMAL(38,15))), 12) AS DOUBLE) AS s
            FROM q JOIN e{k - 1} e ON e.node = q.dst
            GROUP BY q.src
        ) agg ON agg.src = st.node
    )""")
    return f"""
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id
               ) AS dst
        FROM events
    ), cnt AS MATERIALIZED (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ), rs AS MATERIALIZED (
        SELECT src, CAST(SUM(n) AS BIGINT) AS r FROM cnt GROUP BY src
    ), q AS MATERIALIZED (
        SELECT c.src, c.dst, c.n, r.r AS rs
        FROM cnt c JOIN rs r ON r.src = c.src
        WHERE c.src <> '{_ABS_TARGET}' AND c.dst <> '{_ABS_TARGET}'
    ), states AS MATERIALIZED (
        SELECT DISTINCT src AS node FROM q
    ), e0 AS (SELECT node, 0.0 AS e FROM states),
    {','.join(chain)}
    , direct AS (
        SELECT c.src AS node,
               CAST(FLOOR(c.n * 1e6 / r.r) AS BIGINT) AS p_direct_fp
        FROM cnt c JOIN rs r ON r.src = c.src
        WHERE c.dst = '{_ABS_TARGET}' AND c.src <> '{_ABS_TARGET}'
    )
    SELECT f.node AS event_type,
           FLOOR(f.e * 1e6 + 0.5) / 1e6 AS expected_steps,
           COALESCE(d.p_direct_fp, 0) AS p_direct_fp,
           FLOOR(ABS(f.e - p.e) * 1e9 + 0.5) / 1e9 AS residual
    FROM e{_ABS_ITERS} f
    JOIN e{_ABS_ITERS - 1} p ON p.node = f.node
    LEFT JOIN direct d ON d.node = f.node
    ORDER BY f.node
"""


@query("seq_expected_steps_to_purchase", oracle=_abs_sql())
def seq_expected_steps_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-chain analysis of user journeys: treating
    '{_ABS_TARGET}' as the absorbing state, the expected number of
    events until purchase from each current event type — the
    fundamental-matrix quantity E = (I - Q)^-1 1, computed as
    {_ABS_ITERS} unrolled fixed-point iterations E <- 1 + Q E (the
    ts_markov_stationary power-iteration contract), with the
    convergence residual on every row. ts_markov_transitions gives the
    one-step matrix; this is the planning number it implies — how far
    from conversion each surface sits, the quantity funnel teams
    actually prioritize by.

    Exactness: transition counts and row sums are exact integers; each
    iteration's per-edge term e*n/rs is an identical exact-rational
    IEEE tree decimal-summed at scale 12, so the distributed iteration
    bit-matches the oracle's unrolled CTE chain; outputs quantize at
    1e6 with the residual at 1e9 (sizing the iteration count per the
    r4 convergence-telemetry contract).

    Scale: one lead() window per user; then {_ABS_ITERS} joins over
    the constant |types|^2 grain — driver-side control flow over
    lazily composed, lineage-cut plans."""
    ev = _t(spark, sf_dir, "events")["events"]
    wu = W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")), "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wu).alias("dst"),
    )
    cnt = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .transform(cut_lineage)
    )
    rs = cnt.groupBy("src").agg(F.sum("n").cast("bigint").alias("r"))
    q = (
        cnt.join(rs, "src")
        .filter((F.col("src") != _ABS_TARGET) & (F.col("dst") != _ABS_TARGET))
        .select("src", "dst", "n", F.col("r").alias("rs"))
    )
    # Driver-side fixed point over the k-bounded chain (guide step 1:
    # pick the right distributed algorithm — here the right algorithm
    # is NOT distributed). The transition matrix is |event-types|^2 —
    # vocabulary-sized at ANY data scale; the distributed plan paid ~5
    # tiny jobs per iteration (broadcast builds + eager checkpoints,
    # measured 167 jobs/run = most of its 5.9 s), all to re-derive a
    # <=|types|-row frame 30 times. The big-data work (the lead()
    # window and the transition counts) stays distributed above; the
    # collect is limit-guarded like every other k-bounded driver pull
    # in this engine (similarity.py pq_topk precedent).
    #
    # Exactness: the Python loop mirrors the former Spark expression
    # tree op for op — (double(n) * e / double(rs)) in IEEE doubles,
    # cast to DECIMAL(38,15) via the shortest-decimal-string value
    # (Spark: BigDecimal.valueOf(Double.toString), Python: repr — the
    # same shortest round-trip string), exact decimal sum, HALF_UP
    # round at scale 12 (both engines' ROUND rule on decimals), and a
    # decimal->double conversion whose unscaled value fits 2^53 (the
    # exact.py safe-conversion argument; e is O(iterations)). The
    # sf0.001/0.01/0.1 snapshot + DuckDB oracle gates pin the mirror.
    rows = q.limit(_ABS_MAX_Q + 1).collect()
    if len(rows) > _ABS_MAX_Q:
        raise ValueError(
            f"seq_expected_steps_to_purchase: transition matrix exceeds "
            f"{_ABS_MAX_Q} rows; raise _ABS_MAX_Q (state space is "
            "|event_types|^2-bounded by design)"
        )
    import decimal as _dec

    q15 = _dec.Decimal("1e-15")
    q12 = _dec.Decimal("1e-12")
    nodes = sorted({r["src"] for r in rows})
    e_map = {nd: 0.0 for nd in nodes}
    ep_map = dict(e_map)
    with _dec.localcontext() as ctx:
        ctx.prec = 60
        for _i in range(_ABS_ITERS):
            s_map: dict[str, _dec.Decimal] = {}
            for r in rows:
                ev_dst = e_map.get(r["dst"])
                if ev_dst is None:
                    continue  # dst outside the transient state set
                term = float(r["n"]) * ev_dst / float(r["rs"])
                s_map[r["src"]] = s_map.get(r["src"], _dec.Decimal(0)) + _dec.Decimal(
                    repr(term)
                ).quantize(q15, rounding=_dec.ROUND_HALF_UP)
            ep_map = e_map
            e_map = {
                nd: 1.0
                + (
                    float(s_map[nd].quantize(q12, rounding=_dec.ROUND_HALF_UP))
                    if nd in s_map
                    else 0.0
                )
                for nd in nodes
            }
    e = spark.createDataFrame(
        [(nd, e_map[nd], ep_map[nd]) for nd in nodes], "node string, e double, ep double"
    )
    direct = (
        cnt.join(rs, "src")
        .filter((F.col("dst") == _ABS_TARGET) & (F.col("src") != _ABS_TARGET))
        .select(
            F.col("src").alias("node"),
            F.floor(F.col("n") * 1e6 / F.col("r")).cast("bigint").alias("p_direct_fp"),
        )
    )
    return (
        e.join(F.broadcast(direct), "node", "left")
        .select(
            F.col("node").alias("event_type"),
            _q6(F.col("e")).alias("expected_steps"),
            F.coalesce("p_direct_fp", F.lit(0).cast("bigint")).alias("p_direct_fp"),
            (F.floor(F.abs(F.col("e") - F.col("ep")) * 1e9 + F.lit(0.5)) / 1e9).alias(
                "residual"
            ),
        )
        .orderBy("event_type")
    )
