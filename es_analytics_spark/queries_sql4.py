"""Round-3 surface, continued: ordered-arg / boolean aggregates,
autocorrelation, exact rolling medians and Theil-Sen robust trends
under the decimal contract, degree-ordered triangle counting and
RA-index link prediction over a shared checkpointed co-supply graph,
exactly-k weighted reservoir sampling (A-ES), KMV distinct sketches
(batch + streaming state), frame-exclusion (EXCLUDE CURRENT ROW)
windows, forward as-of joins, word-bigram collocation lift,
inverted-index builds, tokenizer vocab-coverage OOV analysis, linear
multi-touch attribution, dataset cards, and the lake constraint-audit
/ join-key skew diagnostics pair.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math bit-identical
across engines via the DECIMAL-sum / explicit half-up-rounding
contract in functions.exact (or pure integer / fixed-point arithmetic
where the statistic allows — RA scores, bigram lift, skew ratios).

Scale notes live on each docstring; none of these shapes collect
unbounded data to the driver, every top-k is a TakeOrdered heap, and
every aggregation state that could grow with data frequency (posting
lists, KMV samples, rolling frames) is K-bounded by rank-then-filter
before collection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.fanout import broadcast_if_small, fan_out
from es_analytics_spark.functions.lineage import cut_lineage, cut_lineage_lazy

from es_analytics_spark.functions.exact import davg, davg_expr, dsum, dsum_expr
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.functions.portable import MIX_P as _MIX_P, accept_hash as _accept_hash, accept_hash_sql as _accept_hash_sql
from es_analytics_spark.queries import _t, query


# ---------------------------------------------------------------------------
# Ordered-arg and boolean aggregates (max_by / min_by / bool_and / count_if)
# ---------------------------------------------------------------------------

# max_by/arg_max tie-break hazard: two customers in a segment can share
# an account balance, and neither engine defines which payload wins.
# c_acctbal is 2-decimal by construction, so (balance, custkey) packs
# into one integer-exact BIGINT key — cents * 1e8 + custkey — that both
# engines order identically (custkey < 1e8 keeps the pack lexicographic,
# including for negative balances: same cents → larger custkey → larger
# key, regardless of sign).
_MINMAX_BY_SQL = """
    SELECT c_mktsegment,
           arg_max(c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey)
               AS richest,
           arg_min(c_name, CAST(ROUND(c_acctbal * 100) AS BIGINT) * 100000000 + c_custkey)
               AS poorest,
           bool_and(c_acctbal > -1000.0) AS all_above_floor,
           bool_or(c_acctbal > 9900.0)   AS any_near_cap,
           CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
           COUNT(*)                      AS n_customers
    FROM customer
    GROUP BY c_mktsegment
"""


@query("agg_minmax_by", oracle=_MINMAX_BY_SQL)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-argument (max_by/min_by) and boolean (bool_and/bool_or/
    count_if) aggregates — the "which row holds the extreme" family the
    reference's lake consumers reach for before window functions.

    Determinism: max_by over a non-unique ordering value is undefined
    on ties in BOTH engines, so the ordering key is the integer-exact
    (cents, custkey) pack documented on the SQL above — unique per row,
    hence one well-defined winner everywhere.

    Scale: one hash aggregate, one shuffle on the group key; max_by
    carries a single (key, payload) pair per group through the partial/
    final split, so memory is group-count-sized, not row-sized."""
    c = _t(spark, sf_dir, "customer")["customer"]
    pack = (
        F.round(F.col("c_acctbal") * 100).cast("long") * F.lit(100000000)
        + F.col("c_custkey")
    )
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", pack).alias("richest"),
        F.min_by("c_name", pack).alias("poorest"),
        F.bool_and(F.col("c_acctbal") > -1000.0).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") > 9900.0).alias("any_near_cap"),
        F.count_if(F.col("c_acctbal") < 0).alias("n_negative"),
        F.count(F.lit(1)).alias("n_customers"),
    )


# ---------------------------------------------------------------------------
# Time series: lag-k autocorrelation (ACF) under the decimal contract
# ---------------------------------------------------------------------------

_ACF_SQL = f"""
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS x
        FROM events GROUP BY 1, 2
    ), mu AS (
        SELECT event_type, {davg_expr('x')} AS m, COUNT(*) AS n_days
        FROM daily GROUP BY event_type
    ), dev AS (
        SELECT d.event_type, m.n_days, (d.x - m.m) AS d,
               LAG(d.x - m.m, 1) OVER w AS d1,
               LAG(d.x - m.m, 2) OVER w AS d2,
               LAG(d.x - m.m, 3) OVER w AS d3
        FROM daily d JOIN mu m USING (event_type)
        WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day)
    )
    SELECT event_type, ANY_VALUE(n_days) AS n_days,
           FLOOR({dsum_expr('d * d1')} / {dsum_expr('d * d')} * 1e6 + 0.5) / 1e6 AS r1,
           FLOOR({dsum_expr('d * d2')} / {dsum_expr('d * d')} * 1e6 + 0.5) / 1e6 AS r2,
           FLOOR({dsum_expr('d * d3')} / {dsum_expr('d * d')} * 1e6 + 0.5) / 1e6 AS r3
    FROM dev GROUP BY event_type
"""


@query("ts_autocorrelation", oracle=_ACF_SQL)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/2/3 autocorrelation of each event type's daily-revenue
    series — the "is this metric mean-reverting or trending" primitive
    behind seasonality detection (ts_seasonal_profile) and anomaly
    scoring (ts_anomaly_zscore).

    Cross-engine float contract: the daily series and its mean come out
    of decimal sums (identical doubles on both engines), so per-row
    deviations and their products are identical IEEE values; the
    order-dependent step — summing products over the series — goes back
    through DECIMAL(38,10), and the final ratio is quantized with the
    explicit half-up spelling.

    Scale: one shuffle to daily grains (map-side partials first), a
    broadcast-sized per-type mean join, one window over day-count-sized
    partitions, one final aggregate. Day-grain state is |types| x |days|
    — bounded by the calendar, not the event count."""
    e = _t(spark, sf_dir, "events")["events"]
    # calendar-bounded grain (|types| x |days|), reused by the mean
    # branch and the window branch — materialize once so the event scan
    # happens once, not per consumer
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("x"))
        .transform(cut_lineage)
    )
    mu = daily.groupBy("event_type").agg(
        davg("x").alias("m"), F.count(F.lit(1)).alias("n_days")
    )
    w = W.partitionBy("event_type").orderBy("day")
    dev = (
        daily.join(F.broadcast(mu), "event_type")
        .withColumn("d", F.col("x") - F.col("m"))
        .select(
            "event_type",
            "n_days",
            "d",
            F.lag("d", 1).over(w).alias("d1"),
            F.lag("d", 2).over(w).alias("d2"),
            F.lag("d", 3).over(w).alias("d3"),
        )
    )

    def r(k: str) -> Column:
        num = dsum(F.col("d") * F.col(k))
        den = dsum(F.col("d") * F.col("d"))
        return (F.floor(num / den * 1e6 + F.lit(0.5)) / 1e6).alias(f"r{k[1:]}")

    return dev.groupBy("event_type").agg(
        F.any_value(F.col("n_days")).alias("n_days"), r("d1"), r("d2"), r("d3")
    )


# ---------------------------------------------------------------------------
# Time series: exact rolling median (trailing 7 observations)
# ---------------------------------------------------------------------------

_ROLLMED_SQL = f"""
    WITH daily AS (
        SELECT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS spend
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT user_id, day, spend,
           MEDIAN(spend) OVER (PARTITION BY user_id ORDER BY day
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
    FROM daily
"""


@query("ts_rolling_median", oracle=_ROLLMED_SQL)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-7-observation median of per-user daily spend — the
    robust-center companion to ts_anomaly_zscore's mean/stddev frame
    (a median shrugs off the one-day spikes that drag a mean).

    Spark has no median window function; over a *bounded* frame the
    exact spelling is sort_array(collect_list(x) over frame) + middle
    element (odd n) or the mean of the two middles (even n) — which is
    bit-identical to DuckDB's interpolating windowed MEDIAN, because
    (a + b) / 2 on two identical doubles is one identical IEEE op.
    The frame inputs are decimal-contract daily sums, so they are the
    same doubles on both engines to begin with.

    Scale: the collect_list is over a ROWS 6 PRECEDING frame — 7
    elements max per row regardless of data size (NOT a per-partition
    collect); one shuffle to daily grains, one user-partitioned window.
    A calendar-RANGE variant would need a gap-filled spine
    (fn_date_spine_gapfill) first."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("spend"))
    )
    w7 = W.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    arr = F.sort_array(F.collect_list("spend").over(w7))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    med = F.when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int"))).otherwise(
        (lo + hi) / 2
    )
    return daily.select("user_id", "day", "spend", med.alias("med7"))


# ---------------------------------------------------------------------------
# Graph: triangle counting by degree-ordered edge orientation
# ---------------------------------------------------------------------------

# Co-supply blocking bound: parts supplied by more than _TRI_CAP distinct
# suppliers are skipped when deriving edges (a part shared by s suppliers
# contributes s*(s-1)/2 pair rows — the cap bounds the quadratic blowup of
# pathological hub parts, the standard blocking move shared with the dedup
# family). Fixture p99 is ~36 suppliers/part, so 64 keeps essentially all
# real edges at every scale factor.
_TRI_CAP = 64
# Part-universe sample stride: the fixture's co-supply graph is nearly
# complete (any two suppliers share ~18+ parts at every SF), so the full
# graph's triangle count approaches C(n,3) — a dense-graph degeneracy,
# not an operator property. The query analyzes the subgraph induced by a
# deterministic 1-in-97 part sample (modulo a prime stride — no hash
# needed, partkeys are dense), the standard subgraph-sampling move for
# triangle statistics on dense graphs; the orientation machinery is
# identical at any density.
_TRI_STRIDE = 97

# Shared edge-list CTE text for the graph queries' oracles.
_EDGES_CTE = f"""
    ps AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        WHERE l_partkey % {_TRI_STRIDE} = 0
    ), keepp AS (
        SELECT p FROM ps GROUP BY p HAVING COUNT(*) <= {_TRI_CAP}
    ), edges AS (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        JOIN keepp k ON a.p = k.p
    ), deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY node
    )
"""


def _co_supply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected co-supply edge list (u < v), sampled + capped as the
    module comments document; localCheckpoint'd ONCE (the
    graph_pagerank pattern) because each graph query's 3-4 consumers
    would otherwise re-derive the whole lineage from the lineitem scan
    (measured on the triangle query: 60 scans / 116 shuffles naive vs
    ~4 / 8 materialized). Edge-list-sized, never lineitem-sized."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    ps = (
        li.filter(F.col("l_partkey") % _TRI_STRIDE == 0)
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
        .transform(cut_lineage_lazy)
    )
    keep = (
        ps.groupBy("p")
        .count()
        .filter(F.col("count") <= _TRI_CAP)
        .select(F.col("p").alias("keep_p"))
    )
    a, b = ps.alias("a"), ps.alias("b")
    # the pair dedup crosses its exchange packed into ONE bigint
    # (u << 32 | v — supplier keys are int-sized at any published SF:
    # 10k x SF < 2^31 even at SF 100k): half the shuffle bytes and one
    # hash per row for the distinct that dominates this derivation
    # (guide §2.3 "narrower types"; measured 1.03 s -> 0.79 s at
    # sf0.1). Unpack AFTER the exchange — same (u, v) set, same types.
    packed = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .join(F.broadcast(keep), F.col("a.p") == F.col("keep_p"))
        .select((F.shiftleft(F.col("a.s"), 32) + F.col("b.s")).alias("uv"))
        .distinct()
    )
    return (
        packed.select(
            F.shiftright("uv", 32).alias("u"),
            (F.col("uv") - F.shiftleft(F.shiftright("uv", 32), 32)).alias("v"),
        )
        .transform(cut_lineage_lazy)
    )


_TRIANGLE_SQL = f"""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        WHERE l_partkey % {_TRI_STRIDE} = 0
    ), keep AS (
        SELECT p FROM ps GROUP BY p HAVING COUNT(*) <= {_TRI_CAP}
    ), edges AS (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        JOIN keep k ON a.p = k.p
    ), deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
        ) GROUP BY node
    ), oriented AS (
        -- orient each edge from the (degree, id)-smaller endpoint: every
        -- node's out-degree is O(sqrt(|E|)), which bounds the wedge join.
        -- dst_deg travels with the edge because the WEDGE pair below must
        -- be ordered by the SAME (degree, id) total order — ordering by
        -- raw id drops every triangle whose closing edge is oriented
        -- against id order (caught by the brute-force property test)
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END AS dst_deg
        FROM edges e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ), tri AS (
        SELECT COUNT(*) AS n_triangles
        FROM oriented e1
        JOIN oriented e2 ON e1.src = e2.src
         AND (e1.dst_deg, e1.dst) < (e2.dst_deg, e2.dst)
        JOIN oriented e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ), wedge AS (
        SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           n_triangles, n_wedges,
           FLOOR(3.0 * n_triangles / n_wedges * 1e6 + 0.5) / 1e6
               AS clustering_coeff
    FROM tri, wedge
"""


@query("graph_triangle_count", oracle=_TRIANGLE_SQL)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the supplier
    co-supply graph (suppliers sharing >= 1 part of a deterministic
    1-in-_TRI_STRIDE part sample are adjacent; see the module comment on
    why the unsampled fixture graph is degenerate-dense) — the
    graph-analytics companion to graph_pagerank/dedup_clusters, and the
    canonical "join explosion unless you orient" benchmark shape.

    The scalable move is degree-ordered orientation (node-iterator++):
    orienting every edge from its (degree, id)-smaller endpoint caps
    each node's out-degree at O(sqrt(|E|)), so the wedge self-join
    enumerates each triangle exactly once and never materializes a
    hub's full neighborhood square. The closing-edge check is an
    equi-join on (src, dst); all math is integer-exact, and the one
    double (clustering coefficient) uses the half-up spelling.

    Scale: pair generation is bounded by the documented _TRI_CAP
    blocking bound; degrees are node-sized (broadcast); the wedge join
    shuffles oriented edges once on src and the closing check once on
    (src, dst). No driver-side state at all — output is one row."""
    return triangle_stats(_co_supply_edges(spark, sf_dir), sf_dir)


def triangle_stats(edges: DataFrame, sf_dir: str | None = None) -> DataFrame:
    """Degree-ordered triangle counting over an undirected (u < v)
    edge DataFrame — factored out of graph_triangle_count so the
    brute-force property test can drive it on arbitrary graphs.

    When ``sf_dir`` is given, the catalog caller's layout gates two
    optimizations (both exact no-ops on a lake layout): the wedge
    self-join sides fan out on the shared src key so the explosion
    stage parallelizes (guide §2.2 — AQE coalesces the tiny pre-join
    shuffle to 1-2 tasks otherwise), and the closing edge probe is
    broadcast (guide §3.1) so the wedge explosion is consumed map-side
    into the count instead of being exchanged for a sort-merge join."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .transform(cut_lineage_lazy)
    )
    e = (
        edges.join(F.broadcast(deg).withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(F.broadcast(deg).withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # dst_deg travels with each oriented edge: the wedge pair below must
    # be ordered by the SAME (degree, id) total order the orientation
    # uses — ordering by raw id drops every triangle whose closing edge
    # is oriented against id order (caught by the brute-force test)
    oriented = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
    ).transform(cut_lineage_lazy)
    wedge_side = (
        fan_out(oriented, sf_dir, "lineitem", "src", weight=8)
        if sf_dir is not None
        else oriented
    )
    closing = (
        broadcast_if_small(oriented, sf_dir, "lineitem")
        if sf_dir is not None
        else oriented
    )
    e1, e2, e3 = wedge_side.alias("e1"), wedge_side.alias("e2"), closing.alias("e3")
    pair_lt = (F.col("e1.dst_deg") < F.col("e2.dst_deg")) | (
        (F.col("e1.dst_deg") == F.col("e2.dst_deg"))
        & (F.col("e1.dst") < F.col("e2.dst"))
    )
    tri = (
        e1.hint("shuffle_hash")
        .join(e2, (F.col("e1.src") == F.col("e2.src")) & pair_lt)
        .join(e3, (F.col("e3.src") == F.col("e1.dst")) & (F.col("e3.dst") == F.col("e2.dst")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    wedge = deg.agg(
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("n_wedges")
    )
    counts = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        nodes.crossJoin(counts)
        .crossJoin(tri)
        .crossJoin(wedge)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            (
                F.floor(3.0 * F.col("n_triangles") / F.col("n_wedges") * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# Exactly-k weighted sampling without replacement (A-ES / exponential clocks)
# ---------------------------------------------------------------------------

_WSAMPLE_K = 50

# A-ES (Efraimidis-Spirakis): each row gets key u^(1/w) with u uniform in
# (0,1]; the k largest keys are a weighted-without-replacement sample.
# Ordering by ln(u)/w is monotone-equivalent and avoids pow. u derives
# from the portable integer hash, so both engines see identical u; ln()
# may differ in the last ulp between libm and the JVM, so the key is
# quantized to 9 decimals (boundary-crossing probability ~1e-9 per row)
# with doc_id breaking quantization ties — the ORDER itself is the
# deterministic contract, not the real-valued key.
_WSAMPLE_SQL = f"""
    SELECT doc_id, source, n_chars, key
    FROM (
        SELECT doc_id, source, n_chars,
               FLOOR(LN(CAST({_accept_hash_sql('doc_id')} + 1 AS DOUBLE) / {_MIX_P})
                     / n_chars * 1e9 + 0.5) / 1e9 AS key
        FROM documents
    )
    ORDER BY key DESC, doc_id ASC
    LIMIT {_WSAMPLE_K}
"""


@query("ml_weighted_sample", oracle=_WSAMPLE_SQL)
def ml_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k weighted sample without replacement (weight = document
    length), via Efraimidis-Spirakis exponential clocks — the
    "length-proportional corpus spot-check" between sample_exact_k_global
    (uniform exactly-k) and ml_domain_mix_sample (rate-based
    acceptance): long documents are proportionally likelier to appear,
    yet the result is exactly k rows and identical on every run, engine,
    and partitioning.

    Scale: map-only key computation, then orderBy+limit plans as
    TakeOrderedAndProject — a k-row heap per task, k rows to the
    driver, zero shuffles."""
    d = _t(spark, sf_dir, "documents")["documents"]
    u = (_accept_hash(F.col("doc_id")) + 1).cast("double") / _MIX_P
    key = F.floor(F.log(u) / F.col("n_chars") * 1e9 + F.lit(0.5)) / 1e9
    return (
        d.select("doc_id", "source", "n_chars", key.alias("key"))
        .orderBy(F.col("key").desc(), F.col("doc_id").asc())
        .limit(_WSAMPLE_K)
    )


# ---------------------------------------------------------------------------
# Lake operations: single-sweep constraint audit
# ---------------------------------------------------------------------------

_AUDIT_SQL = """
    SELECT * FROM (
        SELECT 'customer_dup_key' AS rule,
               (SELECT COUNT(*) FROM (
                    SELECT c_custkey FROM customer GROUP BY 1 HAVING COUNT(*) > 1))
                   AS violations,
               (SELECT COUNT(*) FROM customer) AS checked
        UNION ALL
        SELECT 'lineitem_orphan_orderkey',
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)),
               (SELECT COUNT(*) FROM lineitem)
        UNION ALL
        SELECT 'lineitem_qty_range',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50),
               (SELECT COUNT(*) FROM lineitem)
        UNION ALL
        SELECT 'orders_negative_total',
               (SELECT COUNT(*) FROM orders
                WHERE o_totalprice IS NULL OR o_totalprice <= 0),
               (SELECT COUNT(*) FROM orders)
        UNION ALL
        SELECT 'orders_orphan_custkey',
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
                    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
               (SELECT COUNT(*) FROM orders)
        UNION ALL
        SELECT 'orders_null_custkey',
               (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
               (SELECT COUNT(*) FROM orders)
    ) ORDER BY rule
"""


@query("lake_constraint_audit", oracle=_AUDIT_SQL)
def lake_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit over the lake: primary-key
    uniqueness, NOT NULL, value-range, and referential-integrity rules,
    each reported as (rule, violations, checked) — the check a
    collector-fed lake runs before promoting a partition (the reference
    never validates what it writes; see SURVEY §1.4 on its
    first-record-wins schema drift).

    Shapes, per rule class: uniqueness = one hash aggregate on the key;
    range/NOT NULL = map-side conditional counts fused into ONE scan per
    table (count_if over a shared pass, not one scan per rule);
    referential = left-anti join with the dimension side broadcast.
    Output is rule-count-sized; at 100 TB the audit costs ~one scan of
    each fact table plus one shuffle for the uniqueness rule."""
    t = _t(spark, sf_dir, "customer", "orders", "lineitem")
    c, o, li = t["customer"], t["orders"], t["lineitem"]

    def row(rule: str, violations: Column | DataFrame, checked: DataFrame):
        return violations.crossJoin(checked).select(
            F.lit(rule).alias("rule"), "violations", "checked"
        )

    # each fused-count aggregate feeds multiple output rows; materialize
    # the 1-row results so each fact table is scanned once for its
    # map-side rules, not once per rule row
    c_total = c.agg(F.count(F.lit(1)).alias("checked")).transform(cut_lineage)
    o_counts = o.agg(
        F.count(F.lit(1)).alias("checked"),
        F.count_if(F.col("o_custkey").isNull()).alias("null_cust"),
        F.count_if(
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
        ).alias("neg_total"),
    ).transform(cut_lineage)
    li_counts = li.agg(
        F.count(F.lit(1)).alias("checked"),
        F.count_if(
            F.col("l_quantity").isNull()
            | (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50)
        ).alias("bad_qty"),
    ).transform(cut_lineage)

    dup = (
        c.groupBy("c_custkey")
        .count()
        .filter(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    o_orphan = (
        o.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(c.select("c_custkey")), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    li_orphan = li.join(
        o.select("o_orderkey"), li["l_orderkey"] == o["o_orderkey"], "left_anti"
    ).agg(F.count(F.lit(1)).alias("violations"))

    rows = [
        row("customer_dup_key", dup, c_total),
        row(
            "lineitem_orphan_orderkey",
            li_orphan,
            li_counts.select(F.col("checked")),
        ),
        li_counts.select(
            F.lit("lineitem_qty_range").alias("rule"),
            F.col("bad_qty").alias("violations"),
            "checked",
        ),
        o_counts.select(
            F.lit("orders_negative_total").alias("rule"),
            F.col("neg_total").alias("violations"),
            "checked",
        ),
        row("orders_orphan_custkey", o_orphan, o_counts.select(F.col("checked"))),
        o_counts.select(
            F.lit("orders_null_custkey").alias("rule"),
            F.col("null_cust").alias("violations"),
            "checked",
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("rule")


# ---------------------------------------------------------------------------
# Forward as-of join (next event at-or-after)
# ---------------------------------------------------------------------------

_ASOF_FWD_SQL = """
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate ASC, o.o_orderkey DESC
             ) AS rn
      FROM events e LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS next_orderkey,
           o_orderdate AS next_orderdate
    FROM ranked WHERE rn = 1
"""


@query("join_asof_forward", oracle=_ASOF_FWD_SQL)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: the EARLIEST order at-or-after each event for the
    same user — the "time-to-next-conversion" direction join_asof's
    backward scan can't answer. Same union + running-last rewrite, just
    scanned in descending timestamp order (operators.joins.asof_join
    direction="forward"): one shuffle on the key, no join node, no
    per-event probe explosion. Ties on the order date resolve to the
    largest orderkey in both engines (asof_join's documented tie rule;
    the oracle's ORDER BY o_orderkey DESC mirrors it)."""
    from es_analytics_spark.operators.joins import asof_join

    t = _t(spark, sf_dir, "events", "orders")
    ev = t["events"].select("event_id", F.col("user_id"), "ts")
    od = t["orders"].select(F.col("o_custkey"), "o_orderdate", "o_orderkey")
    out = asof_join(
        ev.withColumnRenamed("user_id", "k"),
        od.withColumnRenamed("o_custkey", "k"),
        on="k",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        tie_break="o_orderkey",
        direction="forward",
    )
    return out.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_orderdate").alias("next_orderdate"),
    )


# ---------------------------------------------------------------------------
# Frame-exclusion window: leave-one-out peer deviation
# ---------------------------------------------------------------------------

_LOO_SQL = """
    SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,10))) OVER (
                    PARTITION BY l_suppkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                    EXCLUDE CURRENT ROW), 4) AS DOUBLE)
               / (COUNT(*) OVER (PARTITION BY l_suppkey) - 1) AS loo_mean
    FROM lineitem
"""


@query("window_loo_deviation", oracle=_LOO_SQL)
def window_loo_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out peer mean: each line's price vs the mean of its
    supplier's OTHER lines — the self-excluding baseline that makes
    outlier scores unbiased (a row inflates any frame that includes
    it). ANSI frames spell this EXCLUDE CURRENT ROW (the oracle runs
    it natively); Spark has no frame exclusion, so the engine uses the
    algebraic identity loo_mean = (S - x) / (n - 1) with S an exact
    decimal partition sum — subtraction in decimal is exact, so the
    identity IS the excluded frame, not an approximation of it.

    Single-member partitions yield NULL in both spellings (empty
    excluded frame vs n-1 = 0 guard).

    Scale: one shuffle on l_suppkey; both window aggregates share the
    exchange and the partition count is supplier-cardinality (no
    6-value skew key: partitioning by returnflag/linestatus would make
    each partition 1/6th of the table — suppkey keeps partitions
    bounded as data grows)."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    w = W.partitionBy("l_suppkey")
    price_dec = F.col("l_extendedprice").cast("decimal(38,10)")
    s = F.sum(price_dec).over(w)
    n = F.count(F.lit(1)).over(w)
    loo = F.when(
        n > 1,
        F.round(s - price_dec, 4).cast("double") / (n - 1),
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice",
        loo.alias("loo_mean"),
    )


# ---------------------------------------------------------------------------
# Inverted index (term -> document-frequency + bounded posting list)
# ---------------------------------------------------------------------------

_INVIDX_K = 8

_INVIDX_SQL = f"""
    WITH td AS (
        SELECT DISTINCT term, doc_id FROM (
            SELECT doc_id, UNNEST(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+')) AS term
            FROM documents)
        WHERE LENGTH(term) >= 3
    )
    SELECT term, COUNT(*) AS df,
           (ARRAY_AGG(doc_id ORDER BY doc_id))[1:{_INVIDX_K}] AS postings
    FROM td GROUP BY term
"""


@query("text_inverted_index", oracle=_INVIDX_SQL)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build an inverted index: term -> document frequency + the first
    _INVIDX_K doc_ids as a bounded posting-list head — the retrieval-
    side artifact next to text_tfidf_topk's scoring side.

    Scale: the tempting spelling — slice(sort_array(collect_list(...)))
    — buffers EVERY posting per term before slicing, i.e. per-term state
    proportional to document frequency (a stopword's postings = the
    whole corpus). The engine instead ranks postings per term
    (row_number over doc_id) and filters to the head BEFORE collecting,
    so aggregate state is K-bounded by construction; df comes from a
    plain count on the same exchange-shared shuffle key. The two
    vocab-sized sides then join on term."""
    d = _t(spark, sf_dir, "documents")["documents"]
    td = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
        )
        .filter(F.length("term") >= 3)
        .distinct()
    )
    dfreq = td.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    heads = (
        td.withColumn(
            "rn", F.row_number().over(W.partitionBy("term").orderBy("doc_id"))
        )
        .filter(F.col("rn") <= _INVIDX_K)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return dfreq.join(heads, "term").select("term", "df", "postings")


# ---------------------------------------------------------------------------
# Dataset card: corpus-level summary via ROLLUP
# ---------------------------------------------------------------------------

_DATASET_CARD_SQL = """
    SELECT COALESCE(lang, 'ALL') AS lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           FLOOR(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) * 1e4 + 0.5) / 1e4
               AS mean_chars,
           COUNT(*) - COUNT(DISTINCT text) AS dup_docs
    FROM documents
    GROUP BY ROLLUP(lang)
"""


@query("ml_dataset_card", oracle=_DATASET_CARD_SQL)
def ml_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass "dataset card" for the corpus: per-language and overall
    document counts, source diversity, size totals/means, and exact-
    duplicate counts — the summary block a training-data pipeline
    publishes next to every shipped corpus snapshot (per-lang rows +
    the ALL roll-up in one ROLLUP aggregate, not two scans).

    Integer sums are exact (no decimal detour needed); the one double
    (mean chars) is quantized half-up. Scale: ROLLUP expands each row
    into its grouping sets map-side and aggregates once; the two
    DISTINCTs make this an expand + two-phase distinct aggregate —
    still a single scan of the corpus."""
    d = _t(spark, sf_dir, "documents")["documents"]
    return (
        d.rollup("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("total_chars"),
            (
                F.floor(
                    F.sum("n_chars").cast("double") / F.count(F.lit(1)) * 1e4
                    + F.lit(0.5)
                )
                / 1e4
            ).alias("mean_chars"),
            (F.count(F.lit(1)) - F.countDistinct("text")).alias("dup_docs"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            "n_docs", "n_sources", "total_chars", "mean_chars", "dup_docs",
        )
    )


# ---------------------------------------------------------------------------
# Word-bigram association (PMI as exact lift)
# ---------------------------------------------------------------------------

_BIGRAM_MIN = 5

_BIGRAM_SQL = f"""
    WITH toks AS (
        SELECT doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
                           x -> LENGTH(x) >= 2) AS arr
        FROM documents
    ), big AS (
        SELECT arr[i] AS a, arr[i + 1] AS b
        FROM toks, UNNEST(GENERATE_SERIES(1, LEN(arr) - 1)) AS t(i)
    ), uni AS (
        SELECT w, COUNT(*) AS cw FROM (
            SELECT UNNEST(arr) AS w FROM toks) GROUP BY w
    ), bc AS (
        SELECT a, b, COUNT(*) AS cab FROM big GROUP BY a, b
    ), n AS (
        SELECT COUNT(*) AS n FROM big
    )
    SELECT a, b, cab,
           FLOOR(CAST(cab * n AS DOUBLE) / (ua.cw * ub.cw) * 1e6 + 0.5) / 1e6
               AS lift
    FROM bc, n
    JOIN uni ua ON ua.w = bc.a
    JOIN uni ub ON ub.w = bc.b
    WHERE cab >= {_BIGRAM_MIN}
    ORDER BY lift DESC, a ASC, b ASC LIMIT 20
"""


@query("text_bigram_lift", oracle=_BIGRAM_SQL)
def text_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top word-bigram associations: observed/expected co-occurrence
    lift, cab*N / (ca*cb) — PMI without the log (log is monotone, so
    the ranking is identical and the statistic stays a single exact
    division of exact integers instead of a cross-engine ln()). The
    collocation-mining companion to text_bpe_pair_counts' char-pair
    loop and text_tfidf_topk's term weighting.

    Scale: bigrams explode map-side from each document's token array
    (no self-join); bigram counts shuffle once on the pair; unigram
    counts are vocabulary-sized and broadcast into the lift join; the
    final top-20 is TakeOrdered. All counts are exact integers; the one
    double is a single division quantized half-up, with (a, b) breaking
    rounded-lift ties."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = d.select(
        F.filter(
            F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: F.length(x) >= 2
        ).alias("arr")
    )
    big = toks.select(
        F.explode(
            F.expr("transform(sequence(0, size(arr) - 2), i -> struct(arr[i] AS a, arr[i + 1] AS b))")
        ).alias("p")
    ).select("p.a", "p.b")
    uni = (
        toks.select(F.explode("arr").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    bc = big.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    # total bigrams from the vocab²-bounded counts, not a fourth pass
    # over the corpus-sized token stream
    n = bc.agg(F.sum("cab").alias("n"))
    ua = uni.select(F.col("w").alias("a"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("cw").alias("cb"))
    lift = (
        F.floor(
            (F.col("cab") * F.col("n")).cast("double")
            / (F.col("ca") * F.col("cb"))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        bc.filter(F.col("cab") >= _BIGRAM_MIN)
        .crossJoin(F.broadcast(n))
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .select("a", "b", "cab", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Link prediction: Resource-Allocation index over common neighbors
# ---------------------------------------------------------------------------

# Fixed-point scale for the RA index: score = sum over common
# neighbors w of FP // deg(w), in exact integer arithmetic (integer
# division: DuckDB //, Spark div) — no cross-engine float summation.
_RA_FP = 10_000_000_000

_LINKPRED_SQL = f"""
    WITH {_EDGES_CTE},
    adj AS (
        SELECT u AS w, v AS nb FROM edges
        UNION ALL
        SELECT v AS w, u AS nb FROM edges
    ), wedge AS (
        SELECT a.nb AS u, b.nb AS v, a.w AS w
        FROM adj a JOIN adj b ON a.w = b.w AND a.nb < b.nb
    ), scored AS (
        SELECT wd.u, wd.v, COUNT(*) AS common_neighbors,
               CAST(SUM({_RA_FP} // d.d) AS BIGINT) AS ra_score_fp
        FROM wedge wd JOIN deg d ON d.node = wd.w
        GROUP BY wd.u, wd.v
    )
    SELECT s.u, s.v, s.common_neighbors, s.ra_score_fp
    FROM scored s
    LEFT JOIN edges e ON e.u = s.u AND e.v = s.v
    WHERE e.u IS NULL
    ORDER BY s.ra_score_fp DESC, s.u ASC, s.v ASC LIMIT 20
"""


@query("graph_link_predict", oracle=_LINKPRED_SQL)
def graph_link_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-supply graph: the top-20 non-adjacent
    supplier pairs by Resource-Allocation index (sum of 1/degree over
    common neighbors — Adamic-Adar's integer-friendly sibling; RA is
    the stronger baseline in the Zhou/Lu/Zhang comparison). "Which two
    suppliers SHOULD be connected" is the recommendation query the
    co-supply lake exists to answer.

    Exactness: 1/deg(w) is fixed-point integer division (_RA_FP //
    deg), summed as exact integers — no float summation to drift
    between engines; ranking ties broken by (u, v).

    Scale: common-neighbor pairs come from the wedge self-join of the
    adjacency list on the CENTER node — each wedge is emitted exactly
    once and joins degree by the center, so no neighborhood list is
    ever materialized per row. One shuffle on the center for the wedge
    join, one on (u, v) for the score aggregate, an edge-list-sized
    anti-join to keep non-adjacent pairs, TakeOrdered top-20. The
    edge list itself is the shared, checkpointed, sampled+capped
    derivation (_co_supply_edges)."""
    edges = _co_supply_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    adj = edges.select(F.col("u").alias("w"), F.col("v").alias("nb")).unionAll(
        edges.select(F.col("v").alias("w"), F.col("u").alias("nb"))
    )
    # attach the center's fixed-point contribution to the EDGE-sized
    # adjacency (2|E| rows), not to the wedge output (sum of C(deg,2)
    # rows) — the wedge join then carries a ready-made addend
    # wedge treatment (the graph_jaccard_neighbors batch): fan the
    # adjacency out on the center key so both self-join sides
    # co-partition and the explosion parallelizes (layout-gated),
    # hash-join instead of sort-merge, and cross the hot partial
    # aggregate on ONE packed bigint (supplier keys are int-sized at
    # any published SF — the _co_supply_edges precedent)
    adj_w = fan_out(
        adj.join(
            F.broadcast(deg.withColumnRenamed("node", "w")), "w"
        ).withColumn("contrib", F.expr(f"{_RA_FP} div d")),
        sf_dir,
        "lineitem",
        "w",
        weight=8,
    )
    a, b = adj_w.alias("a"), adj_w.alias("b")
    scored = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.nb") < F.col("b.nb")))
        .select(
            (F.shiftleft(F.col("a.nb"), 32) + F.col("b.nb")).alias("uv"),
            F.col("a.contrib").alias("contrib"),
        )
        .groupBy("uv")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum("contrib").cast("bigint").alias("ra_score_fp"),
        )
        .select(
            F.shiftright("uv", 32).alias("u"),
            (F.col("uv") - F.shiftleft(F.shiftright("uv", 32), 32)).alias("v"),
            "common_neighbors",
            "ra_score_fp",
        )
    )
    return (
        scored.join(broadcast_if_small(edges, sf_dir, "lineitem"), ["u", "v"], "left_anti")
        .orderBy(F.col("ra_score_fp").desc(), F.col("u").asc(), F.col("v").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch, exact-checked
# ---------------------------------------------------------------------------

_KMV_K = 64

# KMV estimator: hash every distinct key uniformly into [0, P); keep the
# k smallest DISTINCT hash values; if at least k exist, the k-th one
# estimates density — distinct ~= (k-1) * P / h_k. Fewer than k distinct
# hashes means the sketch holds the whole set and is exact. Same
# portable mix hash as the sampling family, so the oracle reproduces the
# sketch arithmetic bit-for-bit; the one double is a single division
# quantized half-up.
_KMV_SQL = f"""
    WITH hashes AS (
        SELECT DISTINCT event_type, {_accept_hash_sql('user_id')} AS h
        FROM events
    ), ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS nh
        FROM hashes
    ), kth AS (
        SELECT event_type, ANY_VALUE(nh) AS n_hashes,
               MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk
        FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
    ), exact AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS n_exact FROM events
        GROUP BY event_type
    )
    SELECT e.event_type, e.n_exact,
           CASE WHEN k.n_hashes < {_KMV_K} THEN CAST(k.n_hashes AS DOUBLE)
                ELSE FLOOR(({_KMV_K} - 1) * {_MIX_P} * 1.0 / k.hk * 1e4 + 0.5) / 1e4
           END AS kmv_est
    FROM exact e JOIN kth k USING (event_type)
"""


@query("agg_kmv_distinct", oracle=_KMV_SQL)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / theta-family) distinct-count sketch,
    driven under the exact-compare gate like agg_count_min: the sketch
    runs on the portable hash so BOTH engines compute the identical
    estimate, and the exact count sits beside it so the error is
    visible in the judged result, not asserted off-line. Completes the
    sketch shelf: HLL (approx union-only), bitmap (exact, dense ids),
    count-min (frequency), Misra-Gries (heavy hitters), KMV (distinct
    with mergeable k-sample state and set-algebra headroom).

    Scale: per-group state is the k smallest hashes — rank-then-filter
    BEFORE any collection (the text_inverted_index rule), so nothing
    df-sized is buffered; the distinct-hash dedup and the window share
    one event_type shuffle. A mergeable production form keeps the same
    k-sample per partition and merges by taking the k smallest of the
    union — the estimator here is that merge's final step."""
    e = _t(spark, sf_dir, "events")["events"]
    hashes = e.select(
        "event_type", _accept_hash(F.col("user_id")).alias("h")
    ).distinct()
    w = W.partitionBy("event_type").orderBy("h")
    ranked = hashes.select(
        "event_type",
        "h",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("nh"),
    )
    kth = (
        ranked.filter(F.col("rn") <= _KMV_K)
        .groupBy("event_type")
        .agg(
            F.any_value(F.col("nh")).alias("n_hashes"),
            F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
        )
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    est = F.when(
        F.col("n_hashes") < _KMV_K, F.col("n_hashes").cast("double")
    ).otherwise(
        F.floor(
            (_KMV_K - 1) * _MIX_P * F.lit(1.0) / F.col("hk") * 1e4 + F.lit(0.5)
        )
        / 1e4
    )
    return exact.join(kth, "event_type").select(
        "event_type", "n_exact", est.alias("kmv_est")
    )


# ---------------------------------------------------------------------------
# Lake operations: join-key skew diagnostics
# ---------------------------------------------------------------------------

# Skew ratio in fixed-point: (max single-key rows) / (mean rows per key),
# scaled 1e4 and computed with integer division — 10000 means perfectly
# uniform, 50000 means the hottest key is 5x the mean.
_SKEW_KEY_SQL = """
        SELECT '{label}' AS key, CAST(SUM(c) AS BIGINT) AS n_rows,
               COUNT(*) AS n_keys,
               MAX(c) AS max_key_rows,
               CAST(MAX(c) * COUNT(*) * 10000 // SUM(c) AS BIGINT) AS skew_ratio_fp
        FROM (SELECT {col}, COUNT(*) AS c FROM {table} GROUP BY {col})
"""

_SKEW_KEYS = [
    ("events.user_id", "events", "user_id"),
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
]

_SKEW_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(
        _SKEW_KEY_SQL.format(label=label, table=table, col=col)
        for label, table, col in _SKEW_KEYS
    )
    + ") ORDER BY key"
)


@query("lake_skew_report", oracle=_SKEW_SQL)
def lake_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for the lake's shuffle keys: per key,
    total rows, distinct keys, the hottest key's row count, and the
    fixed-point max/mean skew ratio — the report that tells an operator
    WHICH joins need the salted rewrite (operators.joins.salted_join)
    or AQE skew-split headroom before a 100 TB run, instead of
    discovering the straggler task in production.

    Mechanics, per key: one partial+final count aggregate on the key
    (per-key counts never leave the executors un-aggregated), then a
    1-row summary; the per-key grain is reused by three statistics in
    one aggregate pass. All arithmetic is exact integers (fixed-point
    ratio via integer division)."""
    tables = _t(spark, sf_dir, "events", "lineitem", "orders")

    def one(label: str, table: str, col: str) -> DataFrame:
        per_key = tables[table].groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        return per_key.agg(
            F.lit(label).alias("key"),
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("c").alias("max_key_rows"),
            F.expr("max(c) * count(1) * 10000 div sum(c)").alias("skew_ratio_fp"),
        ).select("key", "n_rows", "n_keys", "max_key_rows", "skew_ratio_fp")

    out = None
    for label, table, col in _SKEW_KEYS:
        part = one(label, table, col)
        out = part if out is None else out.unionAll(part)
    return out.orderBy("key")


# ---------------------------------------------------------------------------
# Time series: Theil-Sen robust trend slope
# ---------------------------------------------------------------------------

_THEILSEN_SQL = f"""
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS x
        FROM events GROUP BY 1, 2
    ), seq AS (
        SELECT event_type, x,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
        FROM daily
    ), slopes AS (
        SELECT a.event_type, (b.x - a.x) / (b.t - a.t) AS slope
        FROM seq a JOIN seq b
          ON a.event_type = b.event_type AND a.t < b.t
    )
    SELECT event_type, COUNT(*) AS n_pairs,
           FLOOR(MEDIAN(slope) * 1e6 + 0.5) / 1e6 AS trend_per_day
    FROM slopes GROUP BY event_type
"""


@query("ts_trend_theil_sen", oracle=_THEILSEN_SQL)
def ts_trend_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: the median of all pairwise slopes of the
    daily series — the estimator that shrugs off the outlier days that
    wreck a least-squares slope (agg_linear_regression's regr_slope is
    the fragile twin; this is its robust companion, ~29% breakdown
    point).

    Exactness: series values are decimal-contract doubles, each slope
    is one identical IEEE division, and the median is Spark exact
    `percentile` ≡ DuckDB MEDIAN (both interpolate), quantized half-up.

    Scale: the pairwise self-join is quadratic in DAYS, not in events —
    the series is a calendar-bounded grain (365 days → ~66k pairs per
    key), which is the standard regime for exact Theil-Sen; beyond
    that, the estimator's own literature switches to sampled pairs.
    One shuffle to the grain, a grain-sized self-join, one aggregate."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("x"))
        .transform(cut_lineage)
    )
    seq = daily.select(
        "event_type",
        "x",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("day"))
        .alias("t"),
    )
    a, b = seq.alias("a"), seq.alias("b")
    slopes = a.join(
        b, (F.col("a.event_type") == F.col("b.event_type")) & (F.col("a.t") < F.col("b.t"))
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.x") - F.col("a.x")) / (F.col("b.t") - F.col("a.t"))).alias("slope"),
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (
            F.floor(F.percentile("slope", F.lit(0.5)) * 1e6 + F.lit(0.5)) / 1e6
        ).alias("trend_per_day"),
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct state
# ---------------------------------------------------------------------------

_STREAM_KMV_SQL = f"""
    WITH hashes AS (
        SELECT DISTINCT event_type, {_accept_hash_sql('user_id')} AS h
        FROM events
    ), ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS nh
        FROM hashes
    )
    SELECT event_type,
           CASE WHEN ANY_VALUE(nh) < {_KMV_K} THEN CAST(ANY_VALUE(nh) AS DOUBLE)
                ELSE FLOOR(({_KMV_K} - 1) * {_MIX_P} * 1.0
                           / MAX(CASE WHEN rn = {_KMV_K} THEN h END) * 1e4 + 0.5) / 1e4
           END AS kmv_est
    FROM ranked WHERE rn <= {_KMV_K} GROUP BY event_type
"""


@query("stream_kmv_distinct", mutates_conf=True, oracle=_STREAM_KMV_SQL)
def stream_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV distinct sketch (agg_kmv_distinct) maintained BY THE
    STREAMING ENGINE in arbitrary state: per event type, the k smallest
    distinct portable hashes live in GroupState (<= k longs per key,
    forever — micro-batch merge is set-union + re-truncate, the
    mergeability that makes KMV streaming-legal), and the replayed
    final estimate must match the batch sketch — and therefore the SQL
    oracle — bit-for-bit. Completes the streaming sketch-state pair:
    bitmap state for exact distinct over dense ids
    (stream_bitmap_distinct), KMV state for approximate distinct over
    arbitrary domains at fixed memory."""
    from pyspark.sql import Window as W2

    from es_analytics_spark.streaming.ingest import replay_stream, stream_events
    from es_analytics_spark.streaming.stateful import running_kmv_distinct

    ev = stream_events(spark, sf_dir)
    hashes = ev.select("event_type", _accept_hash(F.col("user_id")).alias("h"))
    out = replay_stream(
        spark,
        running_kmv_distinct(hashes, _MIX_P),
        name="stream_kmv_distinct",
        output_mode="append",
    )
    w = W2.partitionBy("event_type").orderBy(F.col("n_rows").desc())
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", "kmv_est")
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution
# ---------------------------------------------------------------------------

_MTA_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000

_MTA_SQL = f"""
    WITH touches AS (
        SELECT user_id, event_id AS touch_id, event_type AS touch_type,
               EPOCH_US(ts) AS t_us
        FROM events WHERE event_type IN ('view', 'click')
    ), purchases AS (
        SELECT user_id, event_id AS purchase_id, value, EPOCH_US(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ), pairs AS (
        SELECT p.purchase_id, p.value, t.touch_type,
               COUNT(*) OVER (PARTITION BY p.purchase_id) AS n_touches
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.t_us < p.p_us
         AND t.t_us >= p.p_us - {_MTA_LOOKBACK_US}
    )
    SELECT touch_type,
           COUNT(*) AS n_credited_touches,
           COUNT(DISTINCT purchase_id) AS n_purchases,
           {dsum_expr('value / n_touches')} AS attributed_value
    FROM pairs GROUP BY touch_type
"""


@query("attr_linear_multi_touch", oracle=_MTA_SQL)
def attr_linear_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution: every view/click
    in the 7-day window strictly before a purchase shares the purchase
    value equally — the fairness-spread companion to attr_last_touch's
    winner-takes-all. Purchases with no in-window touch drop out (no
    credit to assign), matching the industry definition.

    Exactness: each touch's credit value/n is one identical IEEE
    division (n from an exact window count over the pair set); credit
    sums re-enter the decimal contract.

    Scale: touch-purchase pairs come from an EQUI join on user_id with
    the time-range as a post-join filter — one shuffle per side on the
    user key, pair count bounded by per-user activity (multi-touch's
    intrinsic output), never a cartesian. A pathologically hot user is
    the known hazard; the fix is the bucketed interval rewrite
    (operators.joins.interval_join_bucketed) keyed on (user, week
    bucket), same as join_interval_bucketed."""
    e = _t(spark, sf_dir, "events")["events"]
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("touch_type"),
        F.unix_micros("ts").alias("t_us"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "value",
        F.unix_micros("ts").alias("p_us"),
    )
    pairs = purchases.join(touches, "user_id").filter(
        (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - _MTA_LOOKBACK_US)
    )
    n = F.count(F.lit(1)).over(W.partitionBy("purchase_id"))
    credited = pairs.select(
        "purchase_id", "touch_type", (F.col("value") / n).alias("credit")
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_credited_touches"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        dsum("credit").alias("attributed_value"),
    )


# ---------------------------------------------------------------------------
# Tokenizer vocabulary coverage (OOV-rate analysis)
# ---------------------------------------------------------------------------

_VOCAB_K = 100

_VOCAB_SQL = f"""
    WITH tok AS (
        SELECT doc_id, source, UNNEST(
            LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
                        x -> LENGTH(x) >= 2)) AS term
        FROM documents
    ), vocab AS (
        SELECT term FROM (
            SELECT term, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term ASC) AS rn
            FROM tok GROUP BY term) WHERE rn <= {_VOCAB_K}
    ), per_doc AS (
        SELECT t.doc_id, ANY_VALUE(t.source) AS source,
               COUNT(*) AS n_tok,
               CAST(COUNT(*) FILTER (WHERE v.term IS NULL) AS DOUBLE) / COUNT(*)
                   AS oov_rate
        FROM tok t LEFT JOIN vocab v ON v.term = t.term
        GROUP BY t.doc_id
    )
    SELECT source, COUNT(*) AS n_docs,
           {dsum_expr('oov_rate')} / COUNT(*) AS mean_oov_rate
    FROM per_doc GROUP BY source
"""


@query("ml_vocab_coverage", oracle=_VOCAB_SQL)
def ml_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage: build the top-_VOCAB_K corpus
    vocabulary, then measure each source's mean out-of-vocabulary token
    rate — the diagnostic that decides whether a tokenizer's vocab
    budget fits a new data source before training on it (high OOV =
    fragmentation = wasted sequence length).

    Determinism: vocabulary selection totals are exact integers with
    (count DESC, term ASC) tie-break; each doc's OOV rate is one IEEE
    division; per-source means go through the decimal contract.

    Scale: tokens explode map-side; the vocabulary is K-bounded
    (rank-then-filter) and BROADCAST into the membership join, so the
    corpus-sized token stream shuffles only for the per-doc aggregate
    (doc-keyed) and the per-source rollup (source-keyed, tiny)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    tok = d.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: F.length(x) >= 2,
            )
        ).alias("term"),
    )
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        counts.withColumn(
            "rn",
            F.row_number().over(
                W.orderBy(F.col("n").desc(), F.col("term").asc())
            ),
        )
        .filter(F.col("rn") <= _VOCAB_K)
        .select("term", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value(F.col("source")).alias("source"),
            F.count(F.lit(1)).alias("n_tok"),
            (
                F.count_if(F.col("in_vocab").isNull()).cast("double")
                / F.count(F.lit(1))
            ).alias("oov_rate"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (dsum("oov_rate") / F.count(F.lit(1))).alias("mean_oov_rate"),
    )


# ---------------------------------------------------------------------------
# Position-based (U-shaped) multi-touch attribution
# ---------------------------------------------------------------------------

# Industry-standard 40/20/40: first and last touch get 0.4 each, the
# middle touches share 0.2. Degenerate journeys: a single touch takes
# 1.0; a two-touch journey splits 0.5/0.5. Weights are exact dyadic /
# small-rational doubles, so per-touch credit = value * w / m is the
# same IEEE arithmetic in both engines.
_UMTA_SQL = f"""
    WITH touches AS (
        SELECT user_id, event_id AS touch_id, event_type AS touch_type,
               EPOCH_US(ts) AS t_us
        FROM events WHERE event_type IN ('view', 'click')
    ), purchases AS (
        SELECT user_id, event_id AS purchase_id, value, EPOCH_US(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ), pairs AS (
        SELECT p.purchase_id, p.value, t.touch_type,
               ROW_NUMBER() OVER w AS pos,
               COUNT(*) OVER (PARTITION BY p.purchase_id) AS n
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.t_us < p.p_us
         AND t.t_us >= p.p_us - {_MTA_LOOKBACK_US}
        WINDOW w AS (PARTITION BY p.purchase_id ORDER BY t.t_us, t.touch_id)
    ), credited AS (
        SELECT touch_type, purchase_id,
               value * (CASE
                   WHEN n = 1 THEN 1.0
                   WHEN n = 2 THEN 0.5
                   WHEN pos = 1 OR pos = n THEN 0.4
                   ELSE 0.2 / (n - 2)
               END) AS credit
        FROM pairs
    )
    SELECT touch_type, COUNT(*) AS n_credited_touches,
           {dsum_expr('credit')} AS attributed_value
    FROM credited GROUP BY touch_type
"""


@query("attr_u_shaped", oracle=_UMTA_SQL)
def attr_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) attribution — completes the
    attribution trio: attr_last_touch (winner-takes-all),
    attr_linear_multi_touch (equal split), and this positional split
    that rewards discovery and closing touches. Touch order within a
    journey is (timestamp, touch_id) — total, so positions are
    deterministic.

    Scale: identical pair generation to the linear form (user-keyed
    equi join, range as a post-join filter); one extra window pair
    (position + count) over purchase-keyed partitions bounded by
    per-journey touch counts; credit weights are exact rationals and
    the sums re-enter the decimal contract."""
    e = _t(spark, sf_dir, "events")["events"]
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.unix_micros("ts").alias("t_us"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        "value",
        F.unix_micros("ts").alias("p_us"),
    )
    pairs = purchases.join(touches, "user_id").filter(
        (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - _MTA_LOOKBACK_US)
    )
    wp = W.partitionBy("purchase_id")
    pos = F.row_number().over(wp.orderBy("t_us", "touch_id"))
    n = F.count(F.lit(1)).over(wp)
    w_credit = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((pos == 1) | (pos == n), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2))
    )
    credited = pairs.select(
        "touch_type", (F.col("value") * w_credit).alias("credit")
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_credited_touches"),
        dsum("credit").alias("attributed_value"),
    )


# ---------------------------------------------------------------------------
# Robust outliers: median absolute deviation (MAD)
# ---------------------------------------------------------------------------

_MAD_CUT = 3.0

_MAD_SQL = f"""
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS x
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, MEDIAN(x) AS m FROM daily GROUP BY event_type
    ), mad AS (
        SELECT d.event_type, ANY_VALUE(m.m) AS m,
               MEDIAN(ABS(d.x - m.m)) AS mad
        FROM daily d JOIN med m USING (event_type) GROUP BY d.event_type
    )
    SELECT d.event_type, d.day, d.x,
           FLOOR(ABS(d.x - a.m) / a.mad * 1e6 + 0.5) / 1e6 AS mad_score
    FROM daily d JOIN mad a USING (event_type)
    WHERE ABS(d.x - a.m) > {_MAD_CUT} * a.mad
"""


@query("ts_mad_outliers", oracle=_MAD_SQL)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier days: |x - median| > 3 * MAD —
    the robust-statistics anomaly detector next to ts_anomaly_zscore's
    mean/stddev frames (one genuinely extreme day inflates a stddev and
    hides itself; it cannot move a median). Completes the robust shelf:
    median (ts_rolling_median), winsorizing (agg_winsorize), Theil-Sen
    trend, MAD outliers.

    Exactness: daily values are decimal-contract doubles; both medians
    are exact interpolating percentiles (identical in both engines on
    identical inputs); |x-m| and the cut compare are identical IEEE
    ops; the reported score is quantized half-up.

    Scale: two grain-sized aggregates (the grain is calendar-bounded)
    plus broadcast-sized joins back to the grain — the event-scale
    table is touched once."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("x"))
        .transform(cut_lineage)
    )
    med = daily.groupBy("event_type").agg(
        F.percentile("x", F.lit(0.5)).alias("m")
    )
    mad = (
        daily.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value(F.col("m")).alias("m"),
            F.percentile(F.abs(F.col("x") - F.col("m")), F.lit(0.5)).alias("mad"),
        )
    )
    scored = daily.join(F.broadcast(mad), "event_type")
    return scored.filter(
        F.abs(F.col("x") - F.col("m")) > _MAD_CUT * F.col("mad")
    ).select(
        "event_type",
        "day",
        "x",
        (
            F.floor(F.abs(F.col("x") - F.col("m")) / F.col("mad") * 1e6 + F.lit(0.5))
            / 1e6
        ).alias("mad_score"),
    )


# ---------------------------------------------------------------------------
# Growth analytics: cumulative distinct users by day
# ---------------------------------------------------------------------------

_CUMUSERS_SQL = """
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(DATE_TRUNC('day', ts) AS TIMESTAMP)) AS day
        FROM events GROUP BY user_id
    ), per_day AS (
        SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cumulative_users
    FROM per_day
"""


@query("ts_cumulative_users", oracle=_CUMUSERS_SQL)
def ts_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth curve every
    product dashboard opens with. The naive spelling (per day, count
    distinct users with any event <= day) is O(days x users) and
    re-counts the whole history per day; the scalable identity is
    first-seen attribution: cumulative distinct THROUGH day d = sum of
    per-day first-appearance counts — one aggregate per user, one per
    day, and a running sum over the calendar-bounded grain.

    All-integer arithmetic. The running-sum window is over the day
    grain (calendar-bounded single partition — exempt from the
    data-sized single-partition guard by being bounded, the same
    argument as the bench's offset tables)."""
    e = _t(spark, sf_dir, "events")["events"]
    first_seen = e.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts")).alias("day")
    )
    per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


# ---------------------------------------------------------------------------
# Higher-moment statistics under the decimal contract
# ---------------------------------------------------------------------------

# Spark's skewness/kurtosis are population (g1, g2-3) statistics while
# DuckDB's carry sample-bias correction — the built-ins can never
# hash-match. The moment sums themselves CAN: deviations from the
# decimal-contract mean are identical doubles, their 2nd/3rd/4th powers
# are identical products, and the order-dependent sums go through
# DECIMAL(38,6) (power-summed doubles reach ~1e13 at the fixture's
# value range; scale 6 keeps 38 digits of headroom at 100x data).
_MOMENTS_SQL = f"""
    WITH stats AS (
        SELECT event_type, {davg_expr('value')} AS mu
        FROM events GROUP BY event_type
    ), dev AS (
        SELECT e.event_type, (e.value - s.mu) AS d
        FROM events e JOIN stats s USING (event_type)
    ), moments AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(d * d AS DECIMAL(38,6))), 4) AS DOUBLE) AS m2,
               CAST(ROUND(SUM(CAST(d * d * d AS DECIMAL(38,6))), 4) AS DOUBLE) AS m3,
               CAST(ROUND(SUM(CAST(d * d * d * d AS DECIMAL(38,6))), 4) AS DOUBLE) AS m4
        FROM dev GROUP BY event_type
    )
    SELECT event_type, n,
           FLOOR(SQRT(CAST(n AS DOUBLE)) * m3 / POWER(m2, 1.5) * 1e6 + 0.5) / 1e6
               AS skewness_g1,
           FLOOR((CAST(n AS DOUBLE) * m4 / (m2 * m2) - 3.0) * 1e6 + 0.5) / 1e6
               AS excess_kurtosis_g2
    FROM moments
"""


@query("agg_higher_moments", oracle=_MOMENTS_SQL)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis (population g1/g2) per event type,
    from explicit decimal central-moment sums — the distribution-shape
    companions to agg_variance. Built-in skewness/kurtosis are
    deliberately NOT used: Spark's are population statistics, DuckDB's
    are sample-corrected, so only the from-moments spelling can sit
    under the exact gate (the same reason agg_linear_regression spells
    out regr components).

    Scale: one broadcast-sized mean join, then a single partial+final
    aggregate carrying three decimal sums — map-side combine applies,
    per-group state is four numbers."""
    e = _t(spark, sf_dir, "events")["events"]
    mu = e.groupBy("event_type").agg(davg("value").alias("mu"))
    dev = e.join(F.broadcast(mu), "event_type").withColumn(
        "d", F.col("value") - F.col("mu")
    )

    def msum(expr: Column) -> Column:
        return F.round(F.sum(expr.cast("decimal(38,6)")), 4).cast("double")

    d = F.col("d")
    moments = dev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        msum(d * d).alias("m2"),
        msum(d * d * d).alias("m3"),
        msum(d * d * d * d).alias("m4"),
    )
    nd = F.col("n").cast("double")
    skew = F.sqrt(nd) * F.col("m3") / F.pow(F.col("m2"), 1.5)
    kurt = nd * F.col("m4") / (F.col("m2") * F.col("m2")) - 3.0
    return moments.select(
        "event_type",
        "n",
        (F.floor(skew * 1e6 + F.lit(0.5)) / 1e6).alias("skewness_g1"),
        (F.floor(kurt * 1e6 + F.lit(0.5)) / 1e6).alias("excess_kurtosis_g2"),
    )


# ---------------------------------------------------------------------------
# Streaming windowed percentiles
# ---------------------------------------------------------------------------

_STREAM_PCTL_SQL = """
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS window_start,
           ROUND(QUANTILE_CONT(value, 0.5), 4) AS p50,
           ROUND(QUANTILE_CONT(value, 0.9), 4) AS p90,
           COUNT(*) AS n
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
"""


@query("stream_windowed_percentile", mutates_conf=True, oracle=_STREAM_PCTL_SQL)
def stream_windowed_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 of purchase values per tumbling day window,
    computed BY THE STREAMING ENGINE: percentile is a non-algebraic
    (buffering) aggregate, and this entry pins that the streaming
    window state machinery carries it correctly — the replayed result
    must equal batch QUANTILE_CONT exactly. The latency-SLO dashboard
    shape (daily pXX) as a stream.

    Scale: state per open window is that window's value buffer — exact
    windowed percentiles are inherently buffer-until-close; at 100 TB
    the approximate twin (percentile_approx, bounded state) takes over
    once windows stop fitting, the same exact/approx pairing as
    agg_percentile vs agg_approx_percentile."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events

    ev = stream_events(spark, sf_dir)
    agg = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    out = replay_stream(
        spark, agg, name="stream_windowed_percentile", output_mode="complete"
    )
    return out.select(
        F.col("w.start").alias("window_start"), "p50", "p90", "n"
    )


# ---------------------------------------------------------------------------
# Share-of-parent hierarchy reporting
# ---------------------------------------------------------------------------

_SHARE_PARENT_SQL = f"""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               {dsum_expr('c.c_acctbal')} AS nation_bal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, nation_bal,
           FLOOR(nation_bal /
                 CAST(ROUND(SUM(CAST(nation_bal AS DECIMAL(38,10)))
                            OVER (PARTITION BY region), 4) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS share_of_region,
           FLOOR(nation_bal /
                 CAST(ROUND(SUM(CAST(nation_bal AS DECIMAL(38,10)))
                            OVER (), 4) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS share_of_total
    FROM rev
"""


@query("agg_share_of_parent", oracle=_SHARE_PARENT_SQL)
def agg_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent at two hierarchy levels (nation within region,
    nation within world) — the drill-down ratio every reporting layer
    needs beside plain ROLLUP subtotals (window_percent_of_total is
    the single-level form).

    Exactness: the leaf grain comes out of decimal sums, but the
    PARENT sums aggregate those doubles again — and even a 5-row
    double window SUM is visit-order-dependent — so both window sums
    run over decimal-cast leaf values with the identical round-4
    spelling in both engines (the window twin of
    functions.exact.dsum), and each share is one IEEE division
    quantized half-up.

    Scale: one aggregate to the |region|x|nation| grain (broadcast dim
    joins), then window math over a bounded frame."""
    t = _t(spark, sf_dir, "customer", "nation", "region")
    c, n, r = t["customer"], t["nation"], t["region"]
    rev = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(dsum("c_acctbal").alias("nation_bal"))
    )
    leaf_dec = F.col("nation_bal").cast("decimal(38,10)")
    region_sum = F.round(F.sum(leaf_dec).over(W.partitionBy("region")), 4).cast("double")
    total_sum = F.round(
        F.sum(leaf_dec).over(W.partitionBy(F.lit(1))), 4
    ).cast("double")
    return rev.select(
        "region",
        "nation",
        "nation_bal",
        (F.floor(F.col("nation_bal") / region_sum * 1e6 + F.lit(0.5)) / 1e6).alias(
            "share_of_region"
        ),
        (F.floor(F.col("nation_bal") / total_sum * 1e6 + F.lit(0.5)) / 1e6).alias(
            "share_of_total"
        ),
    )


# ---------------------------------------------------------------------------
# Proportional-allocation stratified sample (largest-remainder method)
# ---------------------------------------------------------------------------

_PA_BUDGET = 100

_PA_SQL = f"""
    WITH sizes AS (
        SELECT lang, COUNT(*) AS n_g,
               CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
        FROM documents GROUP BY lang
    ), quota AS (
        SELECT lang, n_g,
               base + CASE WHEN rn <= {_PA_BUDGET} - base_sum THEN 1 ELSE 0 END
                   AS quota
        FROM (
            SELECT lang, n_g,
                   {_PA_BUDGET} * n_g // n_total AS base,
                   CAST(SUM({_PA_BUDGET} * n_g // n_total) OVER () AS BIGINT)
                       AS base_sum,
                   ROW_NUMBER() OVER (
                       ORDER BY {_PA_BUDGET} * n_g % n_total DESC, lang ASC
                   ) AS rn
            FROM sizes)
    ), ranked AS (
        SELECT d.doc_id, d.lang, q.quota,
               ROW_NUMBER() OVER (
                   PARTITION BY d.lang
                   ORDER BY {_accept_hash_sql('d.doc_id')} ASC, d.doc_id ASC
               ) AS rn
        FROM documents d JOIN quota q USING (lang)
    )
    SELECT doc_id, lang, quota FROM ranked WHERE rn <= quota
"""


@query("sample_proportional_allocation", oracle=_PA_SQL)
def sample_proportional_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with proportional allocation: a fixed total
    budget split across language strata by the largest-remainder
    (Hamilton) method — quotas sum to EXACTLY the budget, unlike
    per-stratum rates (sample_stratified) or fixed per-group quotas
    (sample_exact_k_per_group), and the within-stratum pick is the
    deterministic portable-hash order. The corpus-rebalancing
    primitive for "give me exactly 100 docs, language-proportional".

    All arithmetic is exact integers (floor quotas + remainder-ranked
    top-ups); determinism comes from the (remainder, lang) and
    (hash, doc_id) total orders.

    Scale: stratum sizes are a groups-sized aggregate (window math
    over a bounded frame); the per-stratum rank is one shuffle on
    lang; quota filters happen before any row leaves its partition
    beyond that shuffle."""
    d = _t(spark, sf_dir, "documents")["documents"]
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_g"))
    sizes = sizes.withColumn(
        "n_total", F.sum("n_g").over(W.partitionBy(F.lit(1))).cast("bigint")
    )
    base = F.expr(f"{_PA_BUDGET} * n_g div n_total")
    rem = F.expr(f"{_PA_BUDGET} * n_g % n_total")
    quota = (
        sizes.select("lang", "n_g", base.alias("base"), rem.alias("rem"))
        .withColumn(
            "base_sum", F.sum("base").over(W.partitionBy(F.lit(1))).cast("bigint")
        )
        .withColumn(
            "rn",
            F.row_number().over(W.orderBy(F.col("rem").desc(), F.col("lang").asc())),
        )
        .select(
            "lang",
            "n_g",
            (
                F.col("base")
                + F.when(F.col("rn") <= _PA_BUDGET - F.col("base_sum"), 1).otherwise(0)
            ).alias("quota"),
        )
    )
    ranked = d.join(F.broadcast(quota), "lang").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("lang").orderBy(
                _accept_hash(F.col("doc_id")).asc(), F.col("doc_id").asc()
            )
        ),
    )
    return ranked.filter(F.col("rn") <= F.col("quota")).select(
        "doc_id", "lang", "quota"
    )


# ---------------------------------------------------------------------------
# Market-basket co-occurrence (items bought together, support + lift)
# ---------------------------------------------------------------------------

_BASKET_MIN_SUPPORT = 2

_BASKET_SQL = f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n_orders AS (
        SELECT COUNT(DISTINCT o) AS n FROM op
    ), item AS (
        SELECT p, COUNT(*) AS n_p FROM op GROUP BY p
    ), pair AS (
        SELECT a.p AS p1, b.p AS p2, COUNT(*) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    )
    SELECT p1, p2, support,
           FLOOR(CAST(support * n.n AS DOUBLE) / (i1.n_p * i2.n_p) * 1e6 + 0.5)
               / 1e6 AS lift
    FROM pair, n_orders n
    JOIN item i1 ON i1.p = pair.p1
    JOIN item i2 ON i2.p = pair.p2
    WHERE support >= {_BASKET_MIN_SUPPORT}
    ORDER BY support DESC, lift DESC, p1 ASC, p2 ASC LIMIT 20
"""


@query("rec_item_cooccurrence", oracle=_BASKET_SQL)
def rec_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs ordered together,
    with support and observed/expected lift — the "customers who bought
    X also bought Y" recommender primitive (Apriori's first level; the
    item-item half of collaborative filtering).

    Scale: pair generation is a within-basket self-join — each basket of
    s distinct items emits C(s,2) pairs, bounded by the basket-size cap
    natural to order data (fixture max 13); support counts shuffle once
    on the pair; item frequencies are item-count-sized and broadcast
    into the lift join; total basket count is one broadcast row derived
    from the aggregated counts, and the top-20 is TakeOrdered. Counts
    are exact integers; lift is one half-up-quantized division."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    n_orders = op.agg(F.countDistinct("o").alias("n"))
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    # basket-explosion stage parallelism: AQE coalesces the tiny
    # pre-join shuffle to 1-2 partitions at this input size, so the
    # C(s,2) explosion ran near-single-threaded — fan the basket frame
    # out on the order key (both self-join sides co-partition; the
    # added exchange IS the join's) and hash- instead of sort-merge-join
    opf = fan_out(op, sf_dir, "lineitem", "o", weight=8)
    a, b = opf.alias("a"), opf.alias("b")
    pair = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BASKET_MIN_SUPPORT)
    )
    i1 = item.select(F.col("p").alias("p1"), F.col("n_p").alias("n_p1"))
    i2 = item.select(F.col("p").alias("p2"), F.col("n_p").alias("n_p2"))
    lift = (
        F.floor(
            (F.col("support") * F.col("n")).cast("double")
            / (F.col("n_p1") * F.col("n_p2"))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        pair.crossJoin(F.broadcast(n_orders))
        .join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .select("p1", "p2", "support", lift.alias("lift"))
        .orderBy(
            F.col("support").desc(),
            F.col("lift").desc(),
            F.col("p1").asc(),
            F.col("p2").asc(),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quintiles)
# ---------------------------------------------------------------------------

_RFM_SQL = f"""
    WITH per_user AS (
        SELECT user_id,
               COUNT(*) AS frequency,
               {dsum_expr('value')} AS monetary,
               MAX(ts) AS last_ts
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ), anchored AS (
        SELECT user_id, frequency, monetary,
               DATE_DIFF('day', CAST(last_ts AS DATE),
                         CAST(MAX(last_ts) OVER () AS DATE)) AS recency_days
        FROM per_user
    )
    SELECT user_id, recency_days, frequency, monetary,
           NTILE(5) OVER (ORDER BY recency_days ASC, user_id ASC) AS r,
           NTILE(5) OVER (ORDER BY frequency DESC, user_id ASC) AS f,
           NTILE(5) OVER (ORDER BY monetary DESC, user_id ASC) AS m
    FROM anchored
"""


def _dist_quintile(anchored: DataFrame, total: DataFrame, sort_cols, out_name: str) -> DataFrame:
    """Distributed NTILE(5) over the given total order: the
    range-partition + per-partition row_number + broadcast offset-table
    recipe from ml_quality_bucket_sample (queries_sql3.py), followed by
    the closed-form NTILE bucket arithmetic. Unlike the original
    recipe, the per-partition offset table is built with a broadcast
    triangle self-join over the |partitions|-row count table instead
    of an unpartitioned cumsum window, so NO window or sort anywhere
    in the plan sees Exchange SinglePartition — this entry needs no
    guard allowlist. The only broadcasts are the |partitions|-row
    offset table and the 1-row total.

    The ranged frame is localCheckpoint'ed for the same reason as in
    ml_quality_bucket_sample: RangePartitioner samples its boundaries
    nondeterministically, and the two consumers (local ranks, offsets)
    must agree on pid."""
    from es_analytics_spark.queries_sql3 import ntile_closed_form

    spark = anchored.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        anchored.repartitionByRange(n_parts, *sort_cols)
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "lr", F.row_number().over(W.partitionBy("pid").orderBy(*sort_cols))
    )
    offsets = cumulative_offsets(ranged.groupBy("pid").agg(F.count("*").alias("cnt")))
    return (
        local.join(F.broadcast(offsets.select("pid", "off")), "pid")
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            ntile_closed_form(F.col("lr") + F.col("off"), F.col("n"), 5).alias(out_name),
        )
    )


@query("rec_rfm_segments", oracle=_RFM_SQL)
def rec_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quintiles per
    purchasing user (1 = best in each dimension) — the classic
    customer-value grid marketing teams cut campaigns by, and the
    direct consumer of the attribution family's outputs.

    Determinism: every quintile ordering carries a user_id tie-break
    (total order), frequencies are exact integers, monetary is a
    decimal-contract sum, and recency anchors to the data's own
    max-date (no wall clock — reruns are identical).

    Scale: one aggregate to the |users| grain, then each of the three
    quintile dimensions is ranked DISTRIBUTIVELY via the
    range-partition + offset-table recipe (_dist_quintile; the
    ml_quality_bucket_sample shape) instead of a global NTILE window —
    no Exchange SinglePartition anywhere, so the plan survives a user
    grain that dwarfs one task. The recency anchor is a 1-row
    broadcast aggregate, not a partitionBy(lit(1)) window. The three
    rank frames re-join the anchored frame on user_id (hash joins at
    the user grain)."""
    e = _t(spark, sf_dir, "events")["events"]
    per_user = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("frequency"),
            dsum("value").alias("monetary"),
            F.max("ts").alias("last_ts"),
        )
    )
    anchor = per_user.agg(F.max("last_ts").alias("anchor_ts"))
    anchored = (
        per_user.crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            "frequency",
            "monetary",
            F.datediff(F.col("anchor_ts").cast("date"), F.col("last_ts").cast("date")).alias(
                "recency_days"
            ),
        )
        .transform(cut_lineage)
    )
    total = anchored.agg(F.count("*").alias("n"))
    r = _dist_quintile(
        anchored, total, [F.col("recency_days").asc(), F.col("user_id").asc()], "r"
    )
    f = _dist_quintile(
        anchored, total, [F.col("frequency").desc(), F.col("user_id").asc()], "f"
    )
    m = _dist_quintile(
        anchored, total, [F.col("monetary").desc(), F.col("user_id").asc()], "m"
    )
    # the three quintile frames are user-grain (bounded by the events
    # table the grain derives from): broadcast them when the local
    # layout proves it small (guide §3.1) so the final assembly is
    # three map-side probes over the checkpointed anchored frame
    # instead of three sort-merge exchanges; a lake layout keeps the
    # audited hash-join plan
    return (
        anchored.join(broadcast_if_small(r, sf_dir, "events"), "user_id")
        .join(broadcast_if_small(f, sf_dir, "events"), "user_id")
        .join(broadcast_if_small(m, sf_dir, "events"), "user_id")
        .select("user_id", "recency_days", "frequency", "monetary", "r", "f", "m")
    )


# ---------------------------------------------------------------------------
# Forecast backtest: seasonal-naive baseline + MAPE
# ---------------------------------------------------------------------------

_SNAIVE_SQL = f"""
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS x
        FROM events GROUP BY 1, 2
    ), paired AS (
        SELECT a.event_type, a.day, a.x, b.x AS xhat,
               ABS(a.x - b.x) / a.x AS ape
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type
         AND b.day = a.day - INTERVAL 7 DAY
    )
    SELECT event_type, COUNT(*) AS n_evaluated,
           FLOOR({dsum_expr('ape')} / COUNT(*) * 1e6 + 0.5) / 1e6 AS mape
    FROM paired GROUP BY event_type
"""


@query("ts_forecast_snaive", oracle=_SNAIVE_SQL)
def ts_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's revenue
    with the same weekday one week earlier and report per-type MAPE —
    the baseline every real forecasting model must beat, and the
    evaluation harness shape (point forecasts joined to actuals,
    scored, aggregated) that any model would plug into.

    The seven-day lag is a calendar JOIN (day = day - 7), not lag(7)
    over rows — a row-offset silently misaligns whenever the series
    has gaps. Per-day absolute percentage errors are identical IEEE
    divisions (daily values are decimal-contract doubles, always
    positive); the mean goes back through the decimal contract.

    Scale: grain aggregate + a grain-sized self-join on (type, day) +
    one final aggregate; the event-scale scan happens once."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("x"))
        .transform(cut_lineage)
    )
    a, b = daily.alias("a"), daily.alias("b")
    paired = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") == F.col("a.day") - F.expr("INTERVAL 7 DAY")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.abs(F.col("a.x") - F.col("b.x")) / F.col("a.x")).alias("ape"),
    )
    return paired.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_evaluated"),
        (F.floor(dsum("ape") / F.count(F.lit(1)) * 1e6 + F.lit(0.5)) / 1e6).alias(
            "mape"
        ),
    )


# ---------------------------------------------------------------------------
# Distribution drift: total-variation distance between periods
# ---------------------------------------------------------------------------

# Fixed value bins (the fixture's value range is 0..500): a drift
# monitor's bins must be FROZEN, not data-derived, or the comparison
# itself drifts. The statistic is total-variation distance, not PSI:
# TV = 0.5 * sum_i |p_i - q_i| is a pure rational of integer counts —
# scaled by the common denominator n1*n2 it is exactly
# sum_i |c_i*n2 - d_i*n1| / (2*n1*n2), integer arithmetic end to end —
# while PSI's log-ratio would reintroduce cross-engine transcendentals.
_DRIFT_BIN = 50.0
_DRIFT_SPLIT = "2024-01-16 00:00:00"

_DRIFT_SQL = f"""
    WITH binned AS (
        SELECT event_type,
               CAST(FLOOR(value / {_DRIFT_BIN}) AS BIGINT) AS bin,
               CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END AS half
        FROM events
    ), counts AS (
        SELECT event_type, bin,
               CAST(COUNT(*) FILTER (WHERE half = 0) AS BIGINT) AS c,
               CAST(COUNT(*) FILTER (WHERE half = 1) AS BIGINT) AS d
        FROM binned GROUP BY event_type, bin
    ), totals AS (
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS n1, CAST(SUM(d) AS BIGINT) AS n2
        FROM counts GROUP BY event_type
    )
    SELECT c.event_type, t.n1, t.n2,
           FLOOR(CAST(SUM(ABS(c.c * t.n2 - c.d * t.n1)) AS DOUBLE)
                 / (2.0 * t.n1 * t.n2) * 1e6 + 0.5) / 1e6 AS tv_distance
    FROM counts c JOIN totals t USING (event_type)
    GROUP BY c.event_type, t.n1, t.n2
"""


@query("ts_distribution_drift", oracle=_DRIFT_SQL)
def ts_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between the first and second half of the
    observation window: total-variation distance between each event
    type's binned value distributions — the monitor that catches a
    metric's SHAPE changing while its mean stays put (and the
    train-vs-serve skew check every ML feature pipeline runs). TV
    rather than PSI: the statistic is a pure rational of integer
    counts (see the module comment), so it sits under the exact gate
    with a single final division.

    Scale: one conditional-count aggregate to the (type, bin) grain —
    both periods counted in ONE scan via FILTER, not a scan per
    period — then grain-sized arithmetic. Bins are frozen constants;
    a data-derived binning would make the monitor drift with the data
    it monitors."""
    e = _t(spark, sf_dir, "events")["events"]
    binned = e.select(
        "event_type",
        F.floor(F.col("value") / _DRIFT_BIN).cast("bigint").alias("bin"),
        F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 0)
        .otherwise(1)
        .alias("half"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.count_if(F.col("half") == 0).alias("c"),
        F.count_if(F.col("half") == 1).alias("d"),
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n1"), F.sum("d").cast("bigint").alias("n2")
    )
    tv = (
        F.floor(
            F.sum(F.abs(F.col("c") * F.col("n2") - F.col("d") * F.col("n1")))
            .cast("double")
            / (2.0 * F.col("n1") * F.col("n2"))
            * 1e6
            + F.lit(0.5)
        )
        / 1e6
    )
    return (
        counts.join(F.broadcast(totals), "event_type")
        .groupBy("event_type", "n1", "n2")
        .agg(tv.alias("tv_distance"))
    )


# ---------------------------------------------------------------------------
# Association rules (directional confidence)
# ---------------------------------------------------------------------------

_RULES_SQL = f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), item AS (
        SELECT p, COUNT(*) AS n_p FROM op GROUP BY p
    ), pair AS (
        SELECT a.p AS p1, b.p AS p2, COUNT(*) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    ), rules AS (
        SELECT p1 AS antecedent, p2 AS consequent, support, i.n_p AS n_ante,
               FLOOR(CAST(support AS DOUBLE) / i.n_p * 1e6 + 0.5) / 1e6
                   AS confidence
        FROM pair JOIN item i ON i.p = pair.p1
        UNION ALL
        SELECT p2, p1, support, i.n_p,
               FLOOR(CAST(support AS DOUBLE) / i.n_p * 1e6 + 0.5) / 1e6
        FROM pair JOIN item i ON i.p = pair.p2
    )
    SELECT antecedent, consequent, support, n_ante, confidence
    FROM rules WHERE support >= {_BASKET_MIN_SUPPORT}
    ORDER BY confidence DESC, support DESC, antecedent ASC, consequent ASC
    LIMIT 20
"""


@query("rec_association_rules", oracle=_RULES_SQL)
def rec_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional association rules X -> Y with confidence
    support(X,Y)/count(X) — completing the Apriori triple beside
    rec_item_cooccurrence's symmetric support/lift (a rule and its
    reverse have the SAME lift but different confidence, which is why
    recommenders rank by this number).

    Scale: reuses the within-basket pair shape (basket-size-bounded
    self-join, one shuffle on the pair); each undirected pair expands
    into exactly two directional rules map-side; antecedent counts are
    item-sized broadcasts; confidence is one half-up division of exact
    integers and the top-20 is TakeOrdered."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    op = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")).distinct()
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    a, b = op.alias("a"), op.alias("b")
    pair = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _BASKET_MIN_SUPPORT)
    )
    fwd = pair.select(
        F.col("p1").alias("antecedent"), F.col("p2").alias("consequent"), "support"
    )
    rev = pair.select(
        F.col("p2").alias("antecedent"), F.col("p1").alias("consequent"), "support"
    )
    rules = (
        fwd.unionAll(rev)
        .join(
            F.broadcast(item.select(F.col("p").alias("antecedent"), F.col("n_p").alias("n_ante"))),
            "antecedent",
        )
        .select(
            "antecedent",
            "consequent",
            "support",
            "n_ante",
            (
                F.floor(F.col("support").cast("double") / F.col("n_ante") * 1e6 + F.lit(0.5))
                / 1e6
            ).alias("confidence"),
        )
    )
    return rules.orderBy(
        F.col("confidence").desc(),
        F.col("support").desc(),
        F.col("antecedent").asc(),
        F.col("consequent").asc(),
    ).limit(20)


# ---------------------------------------------------------------------------
# Period-over-period: week-over-week revenue growth
# ---------------------------------------------------------------------------

_WOW_SQL = f"""
    WITH weekly AS (
        SELECT event_type, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS week,
               {dsum_expr('value')} AS revenue
        FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, a.week, a.revenue,
           b.revenue AS prev_revenue,
           CASE WHEN b.revenue IS NULL THEN NULL
                ELSE FLOOR((a.revenue - b.revenue) / b.revenue * 1e6 + 0.5) / 1e6
           END AS wow_growth
    FROM weekly a LEFT JOIN weekly b
      ON a.event_type = b.event_type
     AND b.week = a.week - INTERVAL 7 DAY
"""


@query("ts_week_over_week", oracle=_WOW_SQL)
def ts_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue growth per event type — the
    period-over-period delta every business review opens with. The
    previous period comes from a calendar join (week = week - 7 days),
    the same gap-safe spelling as ts_forecast_snaive: a row-offset
    lag silently pairs non-adjacent weeks when a series skips one.
    First weeks have no predecessor and carry NULL growth (left join),
    matching the reporting convention.

    Exactness: weekly grains are decimal-contract sums; growth is one
    IEEE division quantized half-up. Scale: one event-scale aggregate
    to the |types| x |weeks| grain, then grain-sized join + math."""
    e = _t(spark, sf_dir, "events")["events"]
    weekly = (
        e.groupBy("event_type", F.date_trunc("week", "ts").alias("week"))
        .agg(dsum("value").alias("revenue"))
        .transform(cut_lineage)
    )
    a, b = weekly.alias("a"), weekly.alias("b")
    growth = F.when(
        F.col("b.revenue").isNotNull(),
        F.floor(
            (F.col("a.revenue") - F.col("b.revenue")) / F.col("b.revenue") * 1e6
            + F.lit(0.5)
        )
        / 1e6,
    )
    return a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.week") == F.col("a.week") - F.expr("INTERVAL 7 DAY")),
        "left",
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.week").alias("week"),
        F.col("a.revenue").alias("revenue"),
        F.col("b.revenue").alias("prev_revenue"),
        growth.alias("wow_growth"),
    )
