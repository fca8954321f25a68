"""Round-4 surface: product-analytics sequences (windowed multi-step
funnel, weekly cohort retention triangle, growth accounting), the
nearest-direction as-of join completing the backward/forward pair,
Tukey boxplot outlier fences, and user-based collaborative filtering
over the purchase graph.

Same contract as the rest of the catalog (see queries.py): every
entry pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract or explicit fixed-point
quantization. Scale notes live on each docstring; no entry collects
unbounded data to the driver, and the one pair-explosion shape
(user-CF co-purchase pairs) is popularity-capped the way the
winnowing index caps template fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.lineage import cut_lineage, cut_lineage_lazy
from es_analytics_spark.functions.fanout import broadcast_if_small, fan_out

from es_analytics_spark.functions.exact import davg, davg_expr, dsum, dsum_expr
from es_analytics_spark.functions.portable import (
    MIX_P as _MIX_P,
    accept_hash as _accept_hash,
    accept_hash_sql as _accept_hash_sql,
)
from es_analytics_spark.functions.ranks import cumulative_offsets, exact_percentile_cuts
from es_analytics_spark.queries import _t, query


_US_7D = 7 * 86400 * 1_000_000


# ---------------------------------------------------------------------------
# Windowed multi-step funnel (view -> click -> purchase within 7 days)
# ---------------------------------------------------------------------------

_FUNNEL_SQL = f"""
    WITH b AS (
        SELECT user_id, event_type, EPOCH_US(ts) AS tus FROM events
    ), s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN tus END)
                      OVER (PARTITION BY user_id) AS t1
        FROM b
    ), s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click'
                            AND tus > t1 AND tus <= t1 + {_US_7D}
                           THEN tus END) OVER (PARTITION BY user_id) AS t2
        FROM s1
    ), s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase'
                            AND tus > t2 AND tus <= t1 + {_US_7D}
                           THEN tus END) OVER (PARTITION BY user_id) AS t3
        FROM s2
    ), per_user AS (
        SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        FROM s3 GROUP BY user_id
    )
    SELECT CAST(CASE WHEN t3 IS NOT NULL THEN 3
                     WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1
                     ELSE 0 END AS INT) AS funnel_level,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user GROUP BY 1
"""


@query("ts_funnel_windowed", oracle=_FUNNEL_SQL)
def ts_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed multi-step funnel (the windowFunnel shape): per user,
    the furthest strictly-ordered step reached in view -> click ->
    purchase where every later step must land within 7 days of the
    FIRST view — then user counts per furthest level. The 2-step
    funnel (funnel_view_to_purchase) pairs individual conversions;
    this is the per-user journey summary dashboards bucket on.

    Step anchors chain through same-partition windows: t1 = earliest
    view, t2 = earliest qualifying click (needs t1), t3 = earliest
    qualifying purchase (needs t2) — three sequential window selects
    over the SAME partitionBy(user_id), which Catalyst plans as one
    shuffle with stacked Window nodes, no re-exchange. All times are
    integer microseconds; levels are exact.

    Scale: one shuffle on user_id; window state is O(1) per row; the
    level histogram is a 4-group aggregate."""
    ev = _t(spark, sf_dir, "events")["events"]
    tus = F.unix_micros(F.col("ts"))
    wu = W.partitionBy("user_id")
    s1 = ev.select("user_id", "event_type", tus.alias("tus")).withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("tus"))).over(wu)
    )
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("tus") > F.col("t1"))
                & (F.col("tus") <= F.col("t1") + _US_7D),
                F.col("tus"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("tus") > F.col("t2"))
                & (F.col("tus") <= F.col("t1") + _US_7D),
                F.col("tus"),
            )
        ).over(wu),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    level = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
        .cast("int")
    )
    return per_user.groupBy(level.alias("funnel_level")).agg(
        F.count("*").cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention triangle
# ---------------------------------------------------------------------------

_COHORT_SQL = """
    WITH weekly AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM weekly GROUP BY user_id
    ), sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort_week
    ), grid AS (
        SELECT f.cohort_week,
               CAST(DATE_DIFF('day', f.cohort_week, w.wk) / 7 AS INT) AS week_offset,
               CAST(COUNT(*) AS BIGINT) AS n_active
        FROM weekly w JOIN firsts f ON w.user_id = f.user_id
        GROUP BY 1, 2
    )
    SELECT g.cohort_week, g.week_offset, g.n_active, s.cohort_size,
           FLOOR(g.n_active * 1e6 / s.cohort_size) / 1e6 AS retention
    FROM grid g JOIN sizes s USING (cohort_week)
"""


@query("ts_cohort_retention", oracle=_COHORT_SQL)
def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by first-active
    week (Monday-truncated in both engines), then for every later
    active week the cohort's surviving count and retention rate — the
    classic cohort grid. retention_next_day is the per-DAY primitive;
    this is the cohort-week matrix product teams actually chart.

    Retention is integer-exact until the final division, which is
    floor-quantized to 6 dp (n_active and cohort_size are exact
    BIGINTs in both engines).

    Scale: the (user, week) grain collapses the event table first
    (distinct — one shuffle); first-week is a user-grain aggregate;
    the grid join is user-grain on user_id and the final join is on
    the |weeks|-sized cohort dimension (broadcast)."""
    ev = _t(spark, sf_dir, "events")["events"]
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    firsts = weekly.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    grid = (
        weekly.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("wk").cast("date"), F.col("cohort_week").cast("date"))
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )
    return grid.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        (F.floor(F.col("n_active") * 1e6 / F.col("cohort_size")) / 1e6).alias("retention"),
    )


# ---------------------------------------------------------------------------
# Weekly growth accounting (new / retained / resurrected / churned)
# ---------------------------------------------------------------------------

_GROWTH_SQL = """
    WITH weekly AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk
        FROM events
    ), seq AS (
        SELECT user_id, wk,
               LAG(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
               LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
        FROM weekly
    ), status AS (
        SELECT wk,
               CAST(COUNT(*) FILTER (WHERE prev_wk IS NULL) AS BIGINT) AS n_new,
               CAST(COUNT(*) FILTER (WHERE prev_wk = wk - INTERVAL 7 DAY) AS BIGINT)
                   AS n_retained,
               CAST(COUNT(*) FILTER (
                   WHERE prev_wk IS NOT NULL AND prev_wk < wk - INTERVAL 7 DAY
               ) AS BIGINT) AS n_resurrected
        FROM seq GROUP BY wk
    ), churn AS (
        SELECT wk + INTERVAL 7 DAY AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
        FROM seq
        WHERE (next_wk IS NULL OR next_wk > wk + INTERVAL 7 DAY)
          AND wk + INTERVAL 7 DAY <= (SELECT MAX(wk) FROM weekly)
        GROUP BY 1
    )
    SELECT s.wk AS week, s.n_new, s.n_retained, s.n_resurrected,
           COALESCE(c.n_churned, 0) AS n_churned
    FROM status s LEFT JOIN churn c ON s.wk = c.wk
"""


@query("ts_growth_accounting", oracle=_GROWTH_SQL)
def ts_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: every active user-week classified as
    new (first week), retained (active the prior week) or resurrected
    (returning after a gap), plus the churned count — users active the
    prior week who did not return — attributed to the week they went
    missing. The standard MAU-accounting identity (active_t =
    new + retained + resurrected; active_{t-1} - retained = churned_t)
    falls out of the columns.

    Churn weeks beyond the data's last observed week are excluded
    (whether a user churns in the final week is unknowable from the
    data) — the max-week bound is a 1-row broadcast aggregate.

    Scale: the (user, week) grain collapses events first; lag/lead run
    in one user-partitioned window shuffle; the weekly counts are
    |weeks|-sized aggregates and the final join is week-grain."""
    ev = _t(spark, sf_dir, "events")["events"]
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    wu = W.partitionBy("user_id").orderBy("wk")
    seq = weekly.select(
        "user_id",
        "wk",
        F.lag("wk").over(wu).alias("prev_wk"),
        F.lead("wk").over(wu).alias("next_wk"),
    ).transform(cut_lineage)
    week_plus = F.col("wk") + F.expr("INTERVAL 7 DAY")
    prev_expected = F.col("wk") - F.expr("INTERVAL 7 DAY")
    status = seq.groupBy(F.col("wk").alias("week")).agg(
        F.sum(F.when(F.col("prev_wk").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_wk") == prev_expected, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                F.col("prev_wk").isNotNull() & (F.col("prev_wk") < prev_expected), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    max_wk = weekly.agg(F.max("wk").alias("max_wk"))
    churn = (
        seq.filter(F.col("next_wk").isNull() | (F.col("next_wk") > week_plus))
        .crossJoin(F.broadcast(max_wk))
        .filter(week_plus <= F.col("max_wk"))
        .groupBy(week_plus.alias("week"))
        .agg(F.count("*").cast("bigint").alias("n_churned"))
    )
    return (
        status.join(churn, "week", "left")
        .select(
            "week",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0).cast("bigint")).alias("n_churned"),
        )
    )


# ---------------------------------------------------------------------------
# Nearest as-of join (backward/forward pair completed)
# ---------------------------------------------------------------------------

_ASOF_NEAREST_SQL = """
    WITH ranked AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               ABS(DATE_DIFF('day', o.o_orderdate, CAST(e.ts AS DATE))) AS day_gap,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY ABS(DATE_DIFF('day', o.o_orderdate, CAST(e.ts AS DATE))),
                            CASE WHEN o.o_orderdate <= CAST(e.ts AS DATE)
                                 THEN 0 ELSE 1 END,
                            o.o_orderkey DESC
               ) AS rn
        FROM events e LEFT JOIN orders o ON o.o_custkey = e.user_id
    )
    SELECT event_id, user_id, o_orderkey AS nearest_orderkey,
           o_orderdate AS nearest_orderdate, CAST(day_gap AS BIGINT) AS day_gap
    FROM ranked WHERE rn = 1
"""


@query("join_asof_nearest", oracle=_ASOF_NEAREST_SQL)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: the order whose date is CLOSEST to each event in
    days, either direction — completing the backward (join_asof) /
    forward (join_asof_forward) pair. Ties between equally-near
    directions resolve backward (the at-or-before order), date ties to
    the largest orderkey — asof_join's documented tie rule, mirrored
    in the oracle's ORDER BY.

    Composition, not a new algorithm: one backward and one forward
    union+window pass over the same key (each a single shuffle, no
    join node, no per-event probe), then a column-level argmin over
    the two candidates. The oracle spells it as the all-pairs rank —
    the distributed form must reproduce it exactly.

    Scale: two shuffles on the join key total; never an all-pairs
    product (the oracle's LEFT JOIN shape is the 100 TB anti-pattern
    this rewrite exists to avoid)."""
    from es_analytics_spark.operators.joins import asof_join

    t = _t(spark, sf_dir, "events", "orders")
    ev = t["events"].select(
        "event_id", F.col("user_id").alias("k"), F.col("ts").cast("date").alias("ev_day")
    )
    od = t["orders"].select(
        F.col("o_custkey").alias("k"), "o_orderdate", "o_orderkey"
    )
    back = asof_join(
        ev,
        od,
        on="k",
        left_ts="ev_day",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        tie_break="o_orderkey",
        direction="backward",
    ).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_date"),
        "ev_day",
    )
    fwd = asof_join(
        ev,
        od,
        on="k",
        left_ts="ev_day",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        tie_break="o_orderkey",
        direction="forward",
    ).select(
        "event_id",
        F.col("o_orderkey").alias("f_key"),
        F.col("o_orderdate").alias("f_date"),
    )
    both = back.join(fwd, "event_id")
    b_gap = F.datediff(F.col("ev_day"), F.col("b_date"))
    f_gap = F.datediff(F.col("f_date"), F.col("ev_day"))
    take_back = F.col("b_date").isNotNull() & (
        F.col("f_date").isNull() | (b_gap <= f_gap)
    )
    return both.select(
        "event_id",
        "user_id",
        F.when(take_back, F.col("b_key")).otherwise(F.col("f_key")).alias("nearest_orderkey"),
        F.when(take_back, F.col("b_date")).otherwise(F.col("f_date")).alias("nearest_orderdate"),
        F.when(take_back, b_gap).otherwise(f_gap).cast("bigint").alias("day_gap"),
    )


# ---------------------------------------------------------------------------
# Tukey boxplot fences + outliers per group
# ---------------------------------------------------------------------------

_BOXPLOT_SQL = """
    WITH q AS (
        SELECT l_returnflag,
               FLOOR(QUANTILE_CONT(l_extendedprice, 0.25) * 100 + 0.5) / 100 AS q1,
               FLOOR(QUANTILE_CONT(l_extendedprice, 0.75) * 100 + 0.5) / 100 AS q3
        FROM lineitem GROUP BY l_returnflag
    ), f AS (
        SELECT l_returnflag, q1, q3,
               q1 - 1.5 * (q3 - q1) AS lo_fence,
               q3 + 1.5 * (q3 - q1) AS hi_fence
        FROM q
    )
    SELECT l.l_returnflag, f.q1, f.q3,
           CAST(COUNT(*) FILTER (
               WHERE l.l_extendedprice < f.lo_fence
                  OR l.l_extendedprice > f.hi_fence) AS BIGINT) AS n_outliers,
           MIN(l.l_extendedprice) FILTER (WHERE l.l_extendedprice >= f.lo_fence)
               AS whisker_lo,
           MAX(l.l_extendedprice) FILTER (WHERE l.l_extendedprice <= f.hi_fence)
               AS whisker_hi
    FROM lineitem l JOIN f USING (l_returnflag)
    GROUP BY 1, 2, 3
"""


@query("agg_boxplot_iqr", oracle=_BOXPLOT_SQL)
def agg_boxplot_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot per group: exact interpolated quartiles, 1.5-IQR
    fences, outlier counts, and the whisker bounds (extreme values
    still inside the fences) — the robust-spread complement to
    ts_mad_outliers' median-absolute-deviation screen.

    Cross-engine exactness: interpolated quartiles are quantized to
    cents (prices are 2-decimal by construction) BEFORE the fence
    arithmetic, so both engines compare rows against bit-identical
    fence doubles; counts and min/max are then exact.

    Scale: two passes over the fact — a per-group quartile aggregate
    (|groups| rows, broadcast back) and one filtered count/min/max
    aggregate; no sort, no window."""
    # both passes (percentile partials, fence probe + count) run
    # map-side in the scan stage; fan out on a high-card key first
    # (percentile partials just buffer values, so the partial/final
    # split point cannot change the interpolated result).
    # NOTE: swapping the grouped percentile for exact_percentile_cuts
    # (the agg_histogram_equidepth fix) was A/B'd here and LOST
    # (2.1 -> 4.1 s): the helper's three passes re-pay the fan-out
    # exchange each time, while this builtin's final merge is already
    # |groups|-way parallel (3 returnflags) — the single-merge disease
    # the helper cures is the GLOBAL percentile's.
    li = fan_out(
        _t(spark, sf_dir, "lineitem")["lineitem"],
        sf_dir, "lineitem", "l_orderkey", weight=4,
    )
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)) / 100  # noqa: E731
    q = li.groupBy("l_returnflag").agg(
        cents(F.expr("percentile(l_extendedprice, 0.25)")).alias("q1"),
        cents(F.expr("percentile(l_extendedprice, 0.75)")).alias("q3"),
    )
    f = q.select(
        "l_returnflag",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo_fence"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi_fence"),
    )
    price = F.col("l_extendedprice")
    return (
        li.join(F.broadcast(f), "l_returnflag")
        .groupBy("l_returnflag", "q1", "q3")
        .agg(
            F.sum(
                F.when((price < F.col("lo_fence")) | (price > F.col("hi_fence")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.min(F.when(price >= F.col("lo_fence"), price)).alias("whisker_lo"),
            F.max(F.when(price <= F.col("hi_fence"), price)).alias("whisker_hi"),
        )
    )


# ---------------------------------------------------------------------------
# User-based collaborative filtering (co-purchase cosine, top-k neighbors)
# ---------------------------------------------------------------------------

_CF_POP_CAP = 100  # drop hub items co-purchased by more customers than this
_CF_MIN_COMMON = 2  # min co-purchase support: singleton overlaps are noise
_CF_K = 5

_USER_CF_CTE = f"""
    WITH r AS (
        SELECT DISTINCT o_custkey AS c, l_partkey AS p
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), pop AS (
        SELECT p FROM r GROUP BY p HAVING COUNT(*) <= {_CF_POP_CAP}
    ), rr AS (
        SELECT c, r.p FROM r JOIN pop USING (p)
    ), deg AS (
        SELECT c, COUNT(*) AS d FROM rr GROUP BY c
    ), pairs AS (
        SELECT a.c AS c1, b.c AS c2, COUNT(*) AS common
        FROM rr a JOIN rr b ON a.p = b.p AND a.c < b.c
        GROUP BY a.c, b.c
        HAVING COUNT(*) >= {_CF_MIN_COMMON}
    ), scored AS (
        SELECT c1, c2, common,
               CAST(FLOOR(common * 1e6 / SQRT(d1.d * d2.d)) AS BIGINT) AS cos_fp
        FROM pairs JOIN deg d1 ON d1.c = pairs.c1
                   JOIN deg d2 ON d2.c = pairs.c2
    ), sym AS (
        SELECT c1 AS c, c2 AS nb, common, cos_fp FROM scored
        UNION ALL
        SELECT c2 AS c, c1 AS nb, common, cos_fp FROM scored
    ), ranked AS (
        SELECT c, nb, common, cos_fp,
               ROW_NUMBER() OVER (
                   PARTITION BY c
                   ORDER BY cos_fp DESC, common DESC, nb ASC
               ) AS rank
        FROM sym
    )
"""

_USER_CF_SQL = (
    _USER_CF_CTE
    + f"""
    SELECT c AS custkey, nb AS neighbor, CAST(common AS BIGINT) AS n_common,
           cos_fp, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_CF_K}
"""
)


@query("rec_user_cf_topk", oracle=_USER_CF_SQL)
def rec_user_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-based collaborative filtering: top-5 most similar
    customers per customer by cosine over their purchased-part sets —
    the user-user half of the recommendation pair whose item-item half
    is rec_item_cooccurrence. Similarity is |common| / sqrt(|A||B|),
    floor-quantized to 1e-6 fixed point BEFORE ranking so both engines
    rank identical integers (double-precision cosine ties would
    otherwise order differently); remaining ties break on common count
    then neighbor id.

    Pair generation is the inverted-index self-join on the ITEM with a
    popularity cap (items bought by > {_CF_POP_CAP} customers are
    dropped — the winnowing df-cap trade): candidate pairs are bounded
    by sum over items of pop^2 with pop <= cap, never |users|^2. A
    minimum co-support of {_CF_MIN_COMMON} (standard neighborhood-CF
    hygiene — one shared item is noise, not similarity) drops the long
    singleton tail BEFORE the degree joins / symmetrization / rank, a
    measured ~21x row reduction for those stages at sf0.1. The
    per-user top-k is a partitioned rank window (one shuffle).

    Scale: grain collapses to distinct (customer, part) first; every
    join key is an item or customer id; the hub cap is what keeps the
    self-join shuffle-bounded at catalog scale — exactly the published
    trade in neighborhood CF systems."""
    t = _t(spark, sf_dir, "orders", "lineitem")
    # ONE item-keyed exchange feeds the whole derivation (guide §2.4
    # "two operations keyed the same way can share one exchange"): the
    # fan-out repartition on p is planted BEFORE the dedup, so the
    # (c, p) distinct, the item-popularity aggregate, and the inverted-
    # index self-join all reuse that single partitioning — hash-
    # partitioning on p satisfies the clustered distribution of every
    # key set containing p, and the plan shows one Exchange + one
    # ReusedExchange where the former shape paid a (c,p) dedup
    # exchange, a popularity exchange, an eager checkpoint barrier AND
    # a fan-out exchange (interleaved A/B: 4.20 -> 3.92 s median, 4/5
    # pairs faster; the checkpointed form measured 5.3 s — cutting
    # lineage here erases the partitioning the join needs).
    raw = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    )
    r = fan_out(raw, sf_dir, "lineitem", "p", weight=8).distinct()
    pop = r.groupBy("p").agg(F.count("*").alias("np")).filter(F.col("np") <= _CF_POP_CAP)
    # the kept-item list is bounded by the part universe — broadcast
    # when the part table's local layout proves it small (guide §3.1);
    # on a lake layout the planner keeps the plain filter join
    rr = r.join(broadcast_if_small(pop.select("p"), sf_dir, "part"), "p")
    return _user_cf_topk_from(rr, sf_dir)


def _user_cf_topk_from(rr: DataFrame, sf_dir: str) -> DataFrame:
    """The CF neighbor ranking from a prebuilt hub-capped (c, p)
    ratings frame — extracted so rec_item_recommendations can feed BOTH
    its vote/anti-join stages and this ranking from ONE materialized
    ratings frame instead of re-deriving the orders-lineitem dedup
    twice. rec_user_cf_topk passes its un-checkpointed frame through,
    so its audited exchange-sharing plan is unchanged."""
    deg = rr.groupBy("c").agg(F.count("*").alias("d"))
    a = rr.select(F.col("p"), F.col("c").alias("c1"))
    b = rr.select(F.col("p"), F.col("c").alias("c2"))
    # inverted-index self-join as shuffle_hash (guide §3.1): the sides
    # are (customer, item)-grain and their ONLY consumer is this
    # equi-join — sort-merge paid two input sorts for nothing; the
    # wedge explosion downstream is unchanged
    pairs = (
        a.hint("shuffle_hash")
        .join(b, ["p"])
        .filter(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count("*").alias("common"))
        .filter(F.col("common") >= _CF_MIN_COMMON)
    )
    # degree table is customer-sized: broadcast when the customer
    # table's local layout proves it bounded (guide §3.1) so the pair
    # aggregate is not re-exchanged for two node-sized joins
    scored = (
        pairs.join(
            broadcast_if_small(
                deg.select(F.col("c").alias("c1"), F.col("d").alias("d1")),
                sf_dir,
                "customer",
            ),
            "c1",
        )
        .join(
            broadcast_if_small(
                deg.select(F.col("c").alias("c2"), F.col("d").alias("d2")),
                sf_dir,
                "customer",
            ),
            "c2",
        )
        .select(
            "c1",
            "c2",
            "common",
            F.floor(F.col("common") * 1e6 / F.sqrt(F.col("d1") * F.col("d2")))
            .cast("bigint")
            .alias("cos_fp"),
        )
    )
    sym = scored.select(
        F.col("c1").alias("c"), F.col("c2").alias("nb"), "common", "cos_fp"
    ).unionByName(
        scored.select(F.col("c2").alias("c"), F.col("c1").alias("nb"), "common", "cos_fp")
    )
    wr = W.partitionBy("c").orderBy(
        F.desc("cos_fp"), F.desc("common"), F.asc("nb")
    )
    return (
        sym.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _CF_K)
        .select(
            F.col("c").alias("custkey"),
            F.col("nb").alias("neighbor"),
            F.col("common").cast("bigint").alias("n_common"),
            "cos_fp",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Event-type Markov transition matrix
# ---------------------------------------------------------------------------

_MARKOV_SQL = """
    WITH seq AS (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id
               ) AS dst
        FROM events
    ), cnt AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    )
    SELECT src, dst, n,
           CAST(FLOOR(n * 1e6 / SUM(n) OVER (PARTITION BY src)) AS BIGINT) AS p_fp
    FROM cnt
"""


@query("ts_markov_transitions", oracle=_MARKOV_SQL)
def ts_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current type), the navigation-flow
    summary behind sankey/path dashboards and the generative model the
    funnel entries score against. Counts are exact; probabilities are
    1e-6 fixed-point integers (floor of an exact integer division).

    Scale: one lead() window per user (single shuffle on user_id), a
    |types|^2-sized count aggregate, and the per-source normalization
    runs over that tiny grain — the row-normalizing window partitions
    by src (~5 groups of ~5 rows), never by data."""
    ev = _t(spark, sf_dir, "events")["events"]
    wu = W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")), "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wu).alias("dst"),
    )
    cnt = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return cnt.select(
        "src",
        "dst",
        "n",
        F.floor(F.col("n") * 1e6 / F.sum("n").over(W.partitionBy("src")))
        .cast("bigint")
        .alias("p_fp"),
    )


# ---------------------------------------------------------------------------
# Survival curve: fraction of cohorts still active t weeks after first seen
# ---------------------------------------------------------------------------

_SURVIVAL_SQL = """
    WITH weekly AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk
        FROM events
    ), span AS (
        SELECT user_id, MIN(wk) AS fw, MAX(wk) AS lw FROM weekly GROUP BY user_id
    ), bounds AS (
        SELECT MAX(wk) AS max_wk,
               CAST(DATE_DIFF('day', MIN(wk), MAX(wk)) / 7 AS INT) AS max_t
        FROM weekly
    ), spine AS (
        SELECT UNNEST(GENERATE_SERIES(0, (SELECT max_t FROM bounds))) AS t
    )
    SELECT t,
           CAST(COUNT(*) FILTER (
               WHERE s.fw <= b.max_wk - TO_DAYS(CAST(t * 7 AS INT))
           ) AS BIGINT) AS n_observable,
           CAST(COUNT(*) FILTER (
               WHERE s.fw <= b.max_wk - TO_DAYS(CAST(t * 7 AS INT))
                 AND DATE_DIFF('day', s.fw, s.lw) / 7 >= t
           ) AS BIGINT) AS n_surviving,
           FLOOR(COUNT(*) FILTER (
               WHERE s.fw <= b.max_wk - TO_DAYS(CAST(t * 7 AS INT))
                 AND DATE_DIFF('day', s.fw, s.lw) / 7 >= t
           ) * 1e6 / COUNT(*) FILTER (
               WHERE s.fw <= b.max_wk - TO_DAYS(CAST(t * 7 AS INT))
           )) / 1e6 AS survival
    FROM span s CROSS JOIN bounds b CROSS JOIN spine
    GROUP BY t
"""


@query("ts_survival_churn", oracle=_SURVIVAL_SQL)
def ts_survival_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifetime survival curve: for each week offset t, the share
    of users still active >= t weeks after their first week, computed
    ONLY over users observable for t weeks (first seen at least t
    weeks before the data's end) — the censoring-aware denominator
    that makes late cohorts not drag the curve down. Complements the
    cohort retention grid with the lifetime-distribution view.

    All quantities are exact integer week arithmetic; the rate is
    floor-quantized. The t-spine and data bounds are 1-row broadcast
    aggregates.

    Scale: events collapse to the (user, week) grain, then to one
    (first, last) row per user; the user-grain frame crosses a
    |weeks|-sized broadcast spine — at most a ~52x row multiplication
    of the USER grain per year of data, never event-sized."""
    ev = _t(spark, sf_dir, "events")["events"]
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    span = weekly.groupBy("user_id").agg(
        F.min("wk").alias("fw"), F.max("wk").alias("lw")
    )
    bounds = weekly.agg(
        F.max("wk").alias("max_wk"),
        (F.datediff(F.max("wk").cast("date"), F.min("wk").cast("date")) / 7)
        .cast("int")
        .alias("max_t"),
    )
    spine = bounds.select(
        "max_wk", F.explode(F.sequence(F.lit(0), F.col("max_t"))).alias("t")
    )
    lifetime_w = (F.datediff(F.col("lw").cast("date"), F.col("fw").cast("date")) / 7).cast("int")
    observable = F.col("fw").cast("date") <= F.date_sub(
        F.col("max_wk").cast("date"), F.col("t") * 7
    )
    surviving = observable & (lifetime_w >= F.col("t"))
    return (
        span.crossJoin(F.broadcast(spine))
        .groupBy("t")
        .agg(
            F.sum(F.when(observable, 1).otherwise(0)).cast("bigint").alias("n_observable"),
            F.sum(F.when(surviving, 1).otherwise(0)).cast("bigint").alias("n_surviving"),
            (
                F.floor(
                    F.sum(F.when(surviving, 1).otherwise(0))
                    * 1e6
                    / F.sum(F.when(observable, 1).otherwise(0))
                )
                / 1e6
            ).alias("survival"),
        )
    )


# ---------------------------------------------------------------------------
# Partition-layout advisor (lake ops)
# ---------------------------------------------------------------------------

_ADVISOR_MIN_KEYS = 8
_ADVISOR_MIN_ROWS_PER_KEY = 1000
_ADVISOR_MAX_SKEW_FP = 10 * 10_000  # max/mean > 10x

_ADVISOR_CASE = f"""
    CASE WHEN n_keys < {_ADVISOR_MIN_KEYS} THEN 'too-few-keys'
         WHEN rows_per_key < {_ADVISOR_MIN_ROWS_PER_KEY} THEN 'small-files'
         WHEN skew_fp > {_ADVISOR_MAX_SKEW_FP} THEN 'skewed'
         ELSE 'good' END
"""

_ADVISOR_SQL = f"""
    WITH per AS (
        SELECT 'events.event_type' AS candidate, event_type AS k FROM events
        UNION ALL
        SELECT 'events.day(ts)', CAST(CAST(ts AS DATE) AS VARCHAR) FROM events
        UNION ALL
        SELECT 'events.user_id', CAST(user_id AS VARCHAR) FROM events
        UNION ALL
        SELECT 'orders.month(o_orderdate)',
               STRFTIME(o_orderdate, '%Y-%m') FROM orders
    ), stats AS (
        SELECT candidate,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(c) // COUNT(*) AS BIGINT) AS rows_per_key,
               CAST(MAX(c) AS BIGINT) AS max_key_rows,
               CAST(MAX(c) * COUNT(*) * 10000 // SUM(c) AS BIGINT) AS skew_fp
        FROM (
            SELECT candidate, k, COUNT(*) AS c FROM per GROUP BY candidate, k
        ) GROUP BY candidate
    )
    SELECT candidate, n_keys, rows_per_key, max_key_rows, skew_fp,
           {_ADVISOR_CASE} AS verdict
    FROM stats ORDER BY candidate
"""


@query("lake_partition_advisor", oracle=_ADVISOR_SQL)
def lake_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-layout advisor: for each candidate partition key,
    key-count, average rows per key, hottest key, and a fixed-point
    skew ratio, reduced to a deterministic verdict by the standard
    layout rules — too few keys can't parallelize writes, too few rows
    per key shreds the table into small files, a hot key turns one
    partition directory into the whole table. lake_skew_report
    diagnoses JOIN keys; this one scores PARTITION candidates and says
    which to pick.

    Every statistic is exact integer arithmetic (fixed-point ratios
    via integer division), so the verdict string is bit-stable across
    engines.

    Scale: one per-key count aggregate per candidate (map-side
    combined) then a 1-row reduction each — the union is |candidates|
    scans of pruned single columns, never a wide read."""
    t = _t(spark, sf_dir, "events", "orders")
    ev, od = t["events"], t["orders"]
    per = (
        ev.select(F.lit("events.event_type").alias("candidate"), F.col("event_type").alias("k"))
        .unionByName(
            ev.select(
                F.lit("events.day(ts)").alias("candidate"),
                F.col("ts").cast("date").cast("string").alias("k"),
            )
        )
        .unionByName(
            ev.select(
                F.lit("events.user_id").alias("candidate"),
                F.col("user_id").cast("string").alias("k"),
            )
        )
        .unionByName(
            od.select(
                F.lit("orders.month(o_orderdate)").alias("candidate"),
                F.date_format("o_orderdate", "yyyy-MM").alias("k"),
            )
        )
    )
    per_key = per.groupBy("candidate", "k").agg(F.count("*").alias("c"))
    stats = per_key.groupBy("candidate").agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.expr("sum(c) div count(*)").cast("bigint").alias("rows_per_key"),
        F.max("c").cast("bigint").alias("max_key_rows"),
        F.expr("(max(c) * count(*) * 10000) div sum(c)").cast("bigint").alias("skew_fp"),
    )
    verdict = (
        F.when(F.col("n_keys") < _ADVISOR_MIN_KEYS, "too-few-keys")
        .when(F.col("rows_per_key") < _ADVISOR_MIN_ROWS_PER_KEY, "small-files")
        .when(F.col("skew_fp") > _ADVISOR_MAX_SKEW_FP, "skewed")
        .otherwise("good")
    )
    return stats.select(
        "candidate", "n_keys", "rows_per_key", "max_key_rows", "skew_fp",
        verdict.alias("verdict"),
    ).orderBy("candidate")


# ---------------------------------------------------------------------------
# k-core decomposition (fixed-k peeling) on the co-supply graph
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 4

def _kcore_peel_sql() -> str:
    """Unrolled peeling CTEs (the graph_pagerank fixed-iteration trade:
    recursive CTEs cannot aggregate per round, so rounds unroll; the
    pytest referee proves the round count reaches the true fixpoint on
    the fixtures)."""
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
        JOIN keep k ON a.p = k.p
    )"""
    ]
    for i in range(_KCORE_ROUNDS):
        parts.append(
            f""", d{i} AS MATERIALIZED (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i}
        ) GROUP BY node
    ), k{i} AS (
        SELECT node FROM d{i} WHERE d >= {_KCORE_K}
    ), e{i + 1} AS MATERIALIZED (
        SELECT u, v FROM e{i}
        JOIN k{i} ku ON ku.node = e{i}.u
        JOIN k{i} kv ON kv.node = e{i}.v
    )"""
        )
    n = _KCORE_ROUNDS
    parts.append(
        f""", f AS MATERIALIZED (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e{n} UNION ALL SELECT v FROM e{n}
        ) GROUP BY node
    ), resid AS (
        SELECT CAST((SELECT COUNT(*) FROM d{n - 1})
                    - (SELECT COUNT(*) FROM f) AS BIGINT) AS residual
    )
    SELECT node, CAST(d AS BIGINT) AS core_degree, residual
    FROM f CROSS JOIN resid"""
    )
    return "".join(parts)


@query("graph_kcore", oracle=_kcore_peel_sql())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core extraction (k=3) of the supplier co-supply graph:
    iteratively delete nodes with degree < k until only the cohesive
    core remains — the community-density screen that pagerank/triangle
    scores are usually read against. Output: each core node with its
    within-core degree.

    Fixed {rounds} peeling rounds in BOTH engines (the unrolled-CTE
    trade graph_pagerank documents — SQL cannot aggregate inside a
    recursive CTE), so the contract is "{rounds} rounds", not
    "fixpoint"; tests/test_operators.py's referee computes the true
    fixpoint in Python and pins that {rounds} rounds reach it on the
    fixtures (peeling converges geometrically on sparse graphs).

    Scale: each round is one degree aggregate over the current edge
    list plus two semi-join filters — edge-list-sized work throughout,
    localCheckpoint'd per round so round r+1 reads r's result, not the
    whole lineage (the dedup_clusters loop pattern). Never
    node-quadratic; the graph build reuses the capped co-supply
    edges.""".format(rounds=_KCORE_ROUNDS)
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    edges = _co_supply_edges(spark, sf_dir)
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.col("u").alias("node"))
            .unionAll(edges.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        # keep-set is node-sized: broadcast both semi-join probes when
        # the supplier table's layout proves it bounded (guide §3.1,
        # the graph loop pattern) — the edge list then pays no
        # per-round exchange beyond the degree aggregate's
        keep = deg.filter(F.col("d") >= _KCORE_K).select("node")
        prev_nodes = deg
        edges = (
            edges.join(
                broadcast_if_small(
                    keep.withColumnRenamed("node", "u"), sf_dir, "supplier"
                ),
                "u",
                "left_semi",
            )
            .join(
                broadcast_if_small(
                    keep.withColumnRenamed("node", "v"), sf_dir, "supplier"
                ),
                "v",
                "left_semi",
            )
            .select("u", "v")
            .transform(cut_lineage_lazy)
        )
    core = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .transform(cut_lineage_lazy)
    )
    # round-5 residual convention: nodes peeled in the LAST round — 0
    # means the fixed round count reached the peeling fixpoint (the
    # pytest referee proves it on fixtures; at 100× a user reads this
    # instead). Both counts are 1-row aggregates over checkpointed
    # frames.
    resid = prev_nodes.agg(F.count(F.lit(1)).alias("n_prev")).crossJoin(
        core.agg(F.count(F.lit(1)).alias("n_core"))
    ).select(
        (F.col("n_prev") - F.col("n_core")).cast("bigint").alias("residual")
    )
    return core.crossJoin(F.broadcast(resid))


# ---------------------------------------------------------------------------
# Streaming windowed funnel (stateful twin of ts_funnel_windowed)
# ---------------------------------------------------------------------------


@query("stream_funnel_windowed", mutates_conf=True, oracle=_FUNNEL_SQL)
def stream_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_funnel_windowed's per-user furthest-step levels maintained by
    the STREAMING engine (applyInPandasWithState; see
    streaming.stateful.running_funnel_levels for the bounded-state
    contract), replayed to exhaustion and reduced to the same level
    histogram — pinned against the identical SQL oracle as the batch
    query, the batch/stream parity bar every stateful operator in this
    engine meets. Late arrivals that lower the first-view anchor
    re-qualify earlier clicks because the state keeps the cap-earliest
    step times, not just the current winners.

    Scale: state is <= 2+2*cap longs per user sharded by user_id; each
    epoch's work is the micro-batch plus a per-key re-derivation."""
    from pyspark.sql import Window as W2

    from es_analytics_spark.streaming.ingest import replay_stream, stream_events
    from es_analytics_spark.streaming.stateful import running_funnel_levels

    ev = stream_events(spark, sf_dir)
    src = ev.select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("tus")
    )
    out = replay_stream(
        spark,
        running_funnel_levels(src, _US_7D),
        name="stream_funnel_windowed",
        output_mode="append",
    )
    w = W2.partitionBy("user_id").orderBy(F.col("n_rows").desc())
    final = (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "funnel_level")
    )
    return final.groupBy("funnel_level").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# BFS shortest-path distances on the co-supply graph
# ---------------------------------------------------------------------------

_BFS_ROUNDS = 6


def _bfs_sql() -> str:
    from es_analytics_spark.queries_sql4 import _TRI_CAP, _TRI_STRIDE

    return f"""
    WITH RECURSIVE ps AS MATERIALIZED (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        FROM lineitem WHERE l_partkey % {_TRI_STRIDE} = 0
    ), keep AS (
        SELECT p FROM ps GROUP BY p HAVING COUNT(*) <= {_TRI_CAP}
    ), e0 AS MATERIALIZED (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        JOIN keep k ON a.p = k.p
    ), und AS MATERIALIZED (
        SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
    ), src AS (
        SELECT MIN(u) AS s FROM und
    ), walk(node, d) AS (
        SELECT s, 0 FROM src
        UNION
        SELECT und.v, walk.d + 1
        FROM walk JOIN und ON und.u = walk.node
        WHERE walk.d < {_BFS_ROUNDS}
    )
    SELECT node, CAST(MIN(d) AS INT) AS dist FROM walk GROUP BY node
"""


@query("graph_bfs_distance", oracle=_bfs_sql())
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS shortest-path distances from a deterministic source (the
    smallest node id) on the co-supply graph, depth-capped at
    {rounds} — reachability rings for "how far is every supplier from
    this one". The depth cap is the CONTRACT in both engines (the
    oracle's recursive CTE carries the same d < {rounds} guard), so
    fixed iterations compare exactly, same trade as graph_kcore /
    graph_pagerank.

    Spark runs frontier BFS: each round expands only the newly-settled
    ring (frontier join edges, anti-join visited), unioning exact
    min-distances — O(|E|) work per round, localCheckpoint between
    rounds so round r reads r-1's result, not the full lineage.

    Scale: frontier/visited frames are node-sized; edges shuffle once
    per round on the expansion key; no node-quadratic term
    anywhere.""".format(rounds=_BFS_ROUNDS)
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    e = _co_supply_edges(spark, sf_dir)
    und = (
        e.select(F.col("u"), F.col("v"))
        .unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .transform(cut_lineage_lazy)
    )
    seed = und.agg(F.min("u").alias("node")).select(
        "node", F.lit(0).cast("int").alias("dist")
    )
    visited = seed.transform(cut_lineage_lazy)
    frontier = visited
    for r in range(1, _BFS_ROUNDS + 1):
        # frontier and visited are node-sized: broadcast both sides of
        # the expansion when the supplier table's layout proves them
        # bounded (guide §3.1, the graph_pagerank loop pattern) — the
        # edge list is then never shuffled inside the loop and the
        # anti-join builds a broadcast hash set instead of exchanging.
        # Only the new ring is checkpointed per round; visited is a
        # union chain of already-checkpointed rings (each round's
        # consumer reads cached blocks), halving the per-round
        # localCheckpoint barrier jobs.
        nxt = (
            broadcast_if_small(frontier, sf_dir, "supplier")
            .join(und, frontier["node"] == und["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(
                broadcast_if_small(visited.select("node"), sf_dir, "supplier"),
                "node",
                "left_anti",
            )
            .select("node", F.lit(r).cast("int").alias("dist"))
        )
        frontier = nxt.transform(cut_lineage_lazy)
        visited = visited.unionByName(frontier)
    return visited.select("node", "dist")


# ---------------------------------------------------------------------------
# Bitwise function surface
# ---------------------------------------------------------------------------

_BITWISE_SQL = """
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey & 255 AS BIGINT)        AS and_mask,
           CAST(l_orderkey | 4096 AS BIGINT)       AS or_flag,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS xor_keys,
           CAST(l_linenumber << 3 AS BIGINT)       AS shl3,
           CAST(l_orderkey >> 2 AS BIGINT)         AS shr2,
           CAST(bit_count(CAST(l_orderkey AS BIGINT)) AS INT) AS popcount
    FROM lineitem WHERE l_orderkey < 200
"""


@query("fn_bitwise", oracle=_BITWISE_SQL)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface: AND/OR/XOR masks, shifts, and
    population count — the flag-field and bitmap-index arithmetic the
    bitmap aggregate family builds on, declared as scalar functions.
    All integer-exact; both engines operate on 64-bit values."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(F.col("l_orderkey") < 200).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey & 255").cast("bigint").alias("and_mask"),
        F.expr("l_orderkey | 4096").cast("bigint").alias("or_flag"),
        F.expr("l_orderkey ^ l_partkey").cast("bigint").alias("xor_keys"),
        F.expr("shiftleft(l_linenumber, 3)").cast("bigint").alias("shl3"),
        F.expr("shiftright(l_orderkey, 2)").cast("bigint").alias("shr2"),
        F.bit_count(F.col("l_orderkey").cast("bigint")).cast("int").alias("popcount"),
    )


# ---------------------------------------------------------------------------
# Matryoshka two-stage ANN (prefix-dim shortlist + full-dim rerank)
# ---------------------------------------------------------------------------

_MRL_PREFIX = 16
_MRL_SHORTLIST = 20
_MRL_K = 5

_MRL_PRE_SQL = f"""
    ROUND(
      LIST_SUM(LIST_TRANSFORM(LIST_ZIP(q.embedding[1:{_MRL_PREFIX}], c.embedding[1:{_MRL_PREFIX}]),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (SQRT(LIST_SUM(LIST_TRANSFORM(q.embedding[1:{_MRL_PREFIX}], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * SQRT(LIST_SUM(LIST_TRANSFORM(c.embedding[1:{_MRL_PREFIX}], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      6)
"""

_MRL_FULL_SQL = """
    ROUND(
      LIST_SUM(LIST_TRANSFORM(LIST_ZIP(q.embedding, c.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      / (SQRT(LIST_SUM(LIST_TRANSFORM(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
       * SQRT(LIST_SUM(LIST_TRANSFORM(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
      6)
"""

_MRL_SQL = f"""
    WITH pre AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_MRL_PRE_SQL} AS pre_cos, {_MRL_FULL_SQL} AS full_cos
        FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10
    ), short AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY pre_cos DESC, neighbor_id) AS pre_rank
        FROM pre
    ), reranked AS (
        SELECT query_id, neighbor_id, full_cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY full_cos DESC, neighbor_id) AS rank
        FROM short WHERE pre_rank <= {_MRL_SHORTLIST}
    )
    SELECT query_id, neighbor_id, full_cos AS cosine, CAST(rank AS INT) AS rank
    FROM reranked WHERE rank <= {_MRL_K}
"""


@query("sim_matryoshka_topk", oracle=_MRL_SQL)
def sim_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage retrieval (MRL-style nested embeddings):
    shortlist by cosine over the first {pre} dimensions — the cheap
    prefix every matryoshka-trained model packs its coarse signal
    into — then exact full-dimension rerank of the {short}-candidate
    shortlist down to top-{k}. The deterministic two-stage contract
    (rounded prefix cosine + id tie-break defines the shortlist,
    rounded full cosine the final rank) is spelled identically in the
    oracle, so the whole funnel is hash-exact, unlike the recall-bound
    ANN entries.

    Scale: stage-1 scoring touches {pre}/64ths of every vector's bytes
    (the whole point of MRL at serving time — column-pruned prefix
    scans), stage 2 only |queries| x {short} full vectors; queries
    broadcast, no corpus shuffle.""".format(
        pre=_MRL_PREFIX, short=_MRL_SHORTLIST, k=_MRL_K
    )
    from pyspark.sql import Window as W2

    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))

    def cos(a, b, n):
        pa, pb = F.slice(a, 1, n), F.slice(b, 1, n)
        dot = F.aggregate(
            F.zip_with(pa, pb, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        nrm = lambda v: F.sqrt(  # noqa: E731
            F.aggregate(
                v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )
        return F.round(dot / (nrm(pa) * nrm(pb)), 6)

    pairs = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cos(F.col("qv"), F.col("cv"), _MRL_PREFIX).alias("pre_cos"),
            cos(F.col("qv"), F.col("cv"), 64).alias("full_cos"),
        )
    )
    w_pre = W2.partitionBy("query_id").orderBy(F.desc("pre_cos"), F.asc("neighbor_id"))
    short = pairs.withColumn("pre_rank", F.row_number().over(w_pre)).filter(
        F.col("pre_rank") <= _MRL_SHORTLIST
    )
    w_full = W2.partitionBy("query_id").orderBy(F.desc("full_cos"), F.asc("neighbor_id"))
    return (
        short.withColumn("rank", F.row_number().over(w_full))
        .filter(F.col("rank") <= _MRL_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("full_cos").alias("cosine"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Experimentation: variant report with Wilson CIs + z-test / SRM summary
# ---------------------------------------------------------------------------

_AB_Z = 1.96  # 95% two-sided
_AB_CHI2_95 = 3.841459  # chi-square 95% at 1 df

_AB_REPORT_SQL = f"""
    WITH assign AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0 THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ), agg AS (
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted
        FROM assign GROUP BY variant
    )
    SELECT variant, n_users, n_converted,
           FLOOR(n_converted * 1e6 / n_users) / 1e6 AS cvr,
           FLOOR((
               (n_converted * 1.0 / n_users + {_AB_Z} * {_AB_Z} / (2 * n_users)
                - {_AB_Z} * SQRT((n_converted * 1.0 / n_users) * (1 - n_converted * 1.0 / n_users) / n_users
                                 + {_AB_Z} * {_AB_Z} / (4.0 * n_users * n_users)))
               / (1 + {_AB_Z} * {_AB_Z} / n_users)) * 1e6) / 1e6 AS wilson_lo,
           FLOOR((
               (n_converted * 1.0 / n_users + {_AB_Z} * {_AB_Z} / (2 * n_users)
                + {_AB_Z} * SQRT((n_converted * 1.0 / n_users) * (1 - n_converted * 1.0 / n_users) / n_users
                                 + {_AB_Z} * {_AB_Z} / (4.0 * n_users * n_users)))
               / (1 + {_AB_Z} * {_AB_Z} / n_users)) * 1e6) / 1e6 AS wilson_hi
    FROM agg
"""


@query("ab_experiment_report", oracle=_AB_REPORT_SQL)
def ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment variant report: per deterministic variant assignment
    (user_id parity — the hash-bucket assignment every experimentation
    platform uses, engine-independent), user counts, converters
    (>= 1 purchase), conversion rate, and the Wilson 95% score
    interval — the CI that stays inside [0,1] and behaves at small n,
    which is why experimentation platforms report it instead of the
    Wald interval.

    Exactness: counts are exact integers; the Wilson endpoints are one
    fixed expression tree over those integers evaluated in IEEE double
    identically in both engines, then floor-quantized to 1e-6.

    Scale: one user-grain aggregate (map-side combinable MAX) then a
    2-row reduction; CI math runs on the 2-row frame."""
    ev = _t(spark, sf_dir, "events")["events"]
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1).otherwise(0)
        ).alias("converted")
    )
    agg = assign.groupBy((F.col("user_id") % 2).cast("int").alias("variant")).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    n, x, z = F.col("n_users"), F.col("n_converted"), F.lit(_AB_Z)
    p = x * 1.0 / n
    center = p + z * z / (2 * n)
    margin = z * F.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    q6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    return agg.select(
        "variant",
        "n_users",
        "n_converted",
        q6(x * 1e6 / n / 1e6).alias("cvr"),
        q6((center - margin) / denom).alias("wilson_lo"),
        q6((center + margin) / denom).alias("wilson_hi"),
    )


_AB_ZTEST_SQL = f"""
    WITH assign AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0 THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ), agg AS (
        SELECT variant, COUNT(*) AS n, SUM(converted) AS x
        FROM assign GROUP BY variant
    ), wide AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
               MAX(CASE WHEN variant = 0 THEN x END) AS x0,
               MAX(CASE WHEN variant = 1 THEN n END) AS n1,
               MAX(CASE WHEN variant = 1 THEN x END) AS x1
        FROM agg
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(x0 AS BIGINT) AS x0,
           CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
           CASE WHEN x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN 0.0
                ELSE FLOOR((x0 * 1.0 / n0 - x1 * 1.0 / n1)
                 / SQRT(((x0 + x1) * 1.0 / (n0 + n1)) * (1 - (x0 + x1) * 1.0 / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)) * 1e6) / 1e6 END AS z_score,
           CASE WHEN x0 + x1 = 0 OR x0 + x1 = n0 + n1 THEN FALSE
                ELSE ABS((x0 * 1.0 / n0 - x1 * 1.0 / n1)
               / SQRT(((x0 + x1) * 1.0 / (n0 + n1)) * (1 - (x0 + x1) * 1.0 / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1))) > {_AB_Z} END AS significant,
           FLOOR((n0 - n1) * (n0 - n1) * 1e6 / (n0 + n1)) / 1e6 AS srm_chi2,
           (n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1) > {_AB_CHI2_95} AS srm_flag
    FROM wide
"""


@query("ab_ztest_srm", oracle=_AB_ZTEST_SQL)
def ab_ztest_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment decision summary: the pooled two-proportion z-test
    between the two variants (significance at 95%) plus the
    sample-ratio-mismatch chi-square against the designed 50/50 split
    — the guardrail that invalidates a 'significant' readout when
    assignment itself is broken. The SRM statistic is an exact integer
    rational ((n0-n1)^2 / (n0+n1)); the z-score is one fixed double
    expression over exact counts, floor-quantized.

    Scale: user-grain aggregate, then all statistics on a 1-row
    frame."""
    ev = _t(spark, sf_dir, "events")["events"]
    assign = ev.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1).otherwise(0)
        ).alias("converted")
    )
    agg = assign.groupBy((F.col("user_id") % 2).cast("int").alias("variant")).agg(
        F.count("*").alias("n"), F.sum("converted").alias("x")
    )
    wide = agg.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("x0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("x1"),
    )
    n0, x0, n1, x1 = F.col("n0"), F.col("x0"), F.col("n1"), F.col("x1")
    p0, p1 = x0 * 1.0 / n0, x1 * 1.0 / n1
    pp = (x0 + x1) * 1.0 / (n0 + n1)
    # all-convert / none-convert pools have zero variance: z is 0/0 —
    # defined to 0 / not-significant in BOTH engines (guard mirrored in
    # the oracle CASE)
    degenerate = (x0 + x1 == 0) | (x0 + x1 == n0 + n1)
    z = (p0 - p1) / F.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
    chi2 = (n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1)
    return wide.select(
        n0.cast("bigint").alias("n0"),
        x0.cast("bigint").alias("x0"),
        n1.cast("bigint").alias("n1"),
        x1.cast("bigint").alias("x1"),
        F.when(degenerate, F.lit(0.0))
        .otherwise(F.floor(z * 1e6) / 1e6)
        .alias("z_score"),
        F.when(degenerate, F.lit(False))
        .otherwise(F.abs(z) > _AB_Z)
        .alias("significant"),
        (F.floor((n0 - n1) * (n0 - n1) * 1e6 / (n0 + n1)) / 1e6).alias("srm_chi2"),
        (chi2 > _AB_CHI2_95).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of join (completes the as-of surface)
# ---------------------------------------------------------------------------

_ASOF_TOL_DAYS = 30

_ASOF_TOL_SQL = f"""
    WITH ranked AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e LEFT JOIN orders o
          ON o.o_custkey = e.user_id
         AND o.o_orderdate <= CAST(e.ts AS DATE)
         AND o.o_orderdate >= CAST(e.ts AS DATE) - INTERVAL {_ASOF_TOL_DAYS} DAY
    )
    SELECT event_id, user_id, o_orderkey AS last_orderkey,
           o_orderdate AS last_orderdate
    FROM ranked WHERE rn = 1
"""


@query("join_asof_tolerance", oracle=_ASOF_TOL_SQL)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded backward as-of: the latest order at-or-before
    each event, but only within {d} days — stale state beyond the
    horizon becomes NULL instead of silently matching (pandas
    merge_asof's `tolerance`; the shape risk models need so a
    years-old record never leaks into a feature). Same union+window
    single-shuffle rewrite as join_asof; the tolerance is a post-match
    null-out, not a join-condition change, so the plan is
    identical.""".format(d=_ASOF_TOL_DAYS)
    from es_analytics_spark.operators.joins import asof_join

    t = _t(spark, sf_dir, "events", "orders")
    ev = t["events"].select(
        "event_id",
        F.col("user_id").alias("k"),
        F.col("ts").cast("date").cast("timestamp").alias("ev_day"),
    )
    od = t["orders"].select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").cast("timestamp").alias("od_ts"),
        "o_orderkey",
        "o_orderdate",
    )
    out = asof_join(
        ev,
        od,
        on="k",
        left_ts="ev_day",
        right_ts="od_ts",
        right_cols=["o_orderkey", "o_orderdate"],
        tie_break="o_orderkey",
        tolerance=F.expr(f"INTERVAL {_ASOF_TOL_DAYS} DAY"),
    )
    return out.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
    )


# ---------------------------------------------------------------------------
# Label-propagation communities (fixed synchronous rounds)
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_sql(with_residual: bool = True) -> str:
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
        JOIN keep k ON a.p = k.p
    ), und AS MATERIALIZED (
        SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0
    ), l0 AS MATERIALIZED (
        SELECT DISTINCT u AS node, u AS lbl FROM und
    )"""
    ]
    for i in range(_LPA_ROUNDS):
        parts.append(
            f""", v{i} AS MATERIALIZED (
        SELECT e.v AS node, l.lbl AS nlbl, COUNT(*) AS c
        FROM und e JOIN l{i} l ON l.node = e.u
        GROUP BY e.v, l.lbl
    ), l{i + 1} AS MATERIALIZED (
        SELECT node, nlbl AS lbl FROM (
            SELECT node, nlbl,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY c DESC, nlbl ASC) AS rn
            FROM v{i}
        ) WHERE rn = 1
    )"""
        )
    if with_residual:
        parts.append(
            f""", resid AS MATERIALIZED (
        SELECT CAST(COUNT(CASE WHEN a.lbl <> b.lbl THEN 1 END) AS BIGINT)
               AS residual
        FROM l{_LPA_ROUNDS} a JOIN l{_LPA_ROUNDS - 1} b ON a.node = b.node
    )
    SELECT node, CAST(lbl AS BIGINT) AS community, residual
    FROM l{_LPA_ROUNDS} CROSS JOIN resid"""
        )
    else:
        parts.append(
            f"""
    SELECT node, CAST(lbl AS BIGINT) AS community FROM l{_LPA_ROUNDS}"""
        )
    return "".join(parts)


@query("graph_community_lpa", oracle=_lpa_sql())
def graph_community_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection on the co-supply graph:
    every node starts as its own label, and each synchronous round
    adopts the most frequent neighbor label (ties to the smallest
    label — the determinism LPA is notorious for lacking, pinned here
    so both engines and any rerun agree). Completes the graph family:
    pagerank ranks, triangles measure cohesion, k-core screens
    density, connected components find reachability, LPA finds
    communities.

    Fixed {rounds} synchronous rounds in both engines (the unrolled-CTE
    trade; oracle CTEs MATERIALIZED against exponential re-inlining).

    Scale: each round is one |E|-shuffle join of labels onto edges and
    a per-node vote rank (window partitioned BY NODE — node-sized
    partitions, never single-partition); labels localCheckpoint per
    round so lineage stays flat.""".format(rounds=_LPA_ROUNDS)
    from pyspark.sql import Window as W2

    from es_analytics_spark.queries_sql4 import _co_supply_edges

    e = _co_supply_edges(spark, sf_dir)
    und = (
        e.select("u", "v")
        .unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .transform(cut_lineage_lazy)
    )
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).transform(cut_lineage_lazy)
    labels_prev = labels
    for _ in range(_LPA_ROUNDS):
        # label frame is node-sized: broadcast into the vote join when
        # the supplier layout proves it bounded (guide §3.1) so the
        # edge list never shuffles inside the loop; the per-node vote
        # winner is an ARGMAX aggregate — max(struct(c, -nlbl)) picks
        # the largest count then the smallest label, exactly the old
        # row_number(DESC c, ASC nlbl)=1 rule — so the winner reduces
        # map-side instead of paying a sort-based rank window
        # (guide §2.3 "aggregate before you shuffle")
        votes = (
            und.join(
                broadcast_if_small(
                    labels.withColumnRenamed("node", "u"), sf_dir, "supplier"
                ),
                "u",
            )
            .groupBy(F.col("v").alias("node"), F.col("lbl").alias("nlbl"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels_prev = labels
        labels = (
            votes.groupBy("node")
            .agg(F.max(F.struct(F.col("c"), (-F.col("nlbl")).alias("neg"))).alias("m"))
            .select("node", (-F.col("m.neg")).alias("lbl"))
            .transform(cut_lineage_lazy)
        )
    # convergence telemetry (r4 verdict ask 7): how many nodes changed
    # label in the LAST round — 0 means the fixed round count reached a
    # fixpoint, >0 tells a 100×-scale user to raise it. Exact integer,
    # same recurrence in the oracle. Both label frames are node-sized
    # and already checkpointed.
    resid = (
        labels.join(
            labels_prev.withColumnRenamed("lbl", "prev"), "node"
        ).agg(
            F.count(F.when(F.col("lbl") != F.col("prev"), 1))
            .cast("bigint").alias("residual")
        )
    )
    return labels.select(
        "node", F.col("lbl").cast("bigint").alias("community")
    ).crossJoin(F.broadcast(resid))


# ---------------------------------------------------------------------------
# Revenue concentration: Gini coefficient + top-decile share
# ---------------------------------------------------------------------------

_GINI_SQL = """
    WITH rev AS (
        SELECT o_custkey AS c,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,10))), 4) AS DOUBLE) AS r
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT c, r, ROW_NUMBER() OVER (ORDER BY r ASC, c ASC) AS i,
               COUNT(*) OVER () AS n, SUM(r) OVER () AS s
        FROM rev
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           FLOOR(MAX(s) * 1e4 + 0.5) / 1e4 AS total_revenue,
           FLOOR((2.0 * SUM(i * r) / (MAX(n) * MAX(s)) - (MAX(n) + 1.0) / MAX(n)) * 1e6) / 1e6
               AS gini,
           FLOOR(SUM(CASE WHEN i >= n - (n + 9) // 10 + 1 THEN r ELSE 0 END)
                 * 1e6 / MAX(s)) / 1e6 AS top_decile_share
    FROM ranked
"""


@query("agg_revenue_concentration", oracle=_GINI_SQL)
def agg_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration: the Gini coefficient over per-customer
    revenue (the rank-weighted identity G = 2*sum(i*x_i)/(n*S) -
    (n+1)/n on the (revenue, custkey) total order) and the share held
    by the top decile of customers — the whale-dependence numbers
    every monetization review opens with.

    The global rank is computed DISTRIBUTIVELY with the window-free
    range-partition + triangle-join offset recipe
    (functions/ranks.cumulative_offsets — no single-partition window;
    the oracle spells it as a plain ROW_NUMBER). Revenue enters
    through the decimal contract; ranks and counts are exact integers;
    each statistic does exactly one quantized double division.

    Scale: one customer-grain aggregate, one range shuffle for the
    rank, 1-row reduction. MAX(n)/MAX(s) come broadcast."""
    t = _t(spark, sf_dir, "orders")
    rev = (
        t["orders"]
        .groupBy(F.col("o_custkey").alias("c"))
        .agg(dsum("o_totalprice").alias("r"))
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        rev.repartitionByRange(n_parts, F.asc("r"), F.asc("c"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "lr", F.row_number().over(W.partitionBy("pid").orderBy(F.asc("r"), F.asc("c")))
    )
    offsets = cumulative_offsets(ranged.groupBy("pid").agg(F.count("*").alias("cnt")))
    totals = ranged.agg(
        F.count("*").alias("n"), F.sum("r").alias("s")
    )
    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("i", F.col("lr") + F.col("off"))
        .crossJoin(F.broadcast(totals))
    )
    top_cut = F.col("n") - F.expr("(n + 9) div 10") + 1
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        (F.floor(F.max("s") * 1e4 + F.lit(0.5)) / 1e4).alias("total_revenue"),
        (
            F.floor(
                (
                    2.0 * F.sum(F.col("i") * F.col("r")) / (F.max("n") * F.max("s"))
                    - (F.max("n") + 1.0) / F.max("n")
                )
                * 1e6
            )
            / 1e6
        ).alias("gini"),
        (
            F.floor(
                F.sum(F.when(F.col("i") >= top_cut, F.col("r")).otherwise(0.0))
                * 1e6
                / F.max("s")
            )
            / 1e6
        ).alias("top_decile_share"),
    )


# ---------------------------------------------------------------------------
# Community quality: modularity of the LPA partition
# ---------------------------------------------------------------------------


def _modularity_sql() -> str:
    # reuse the LPA unrolled prefix, then score the partition
    base = _lpa_sql(with_residual=False)
    tail = f"""
    SELECT node, CAST(lbl AS BIGINT) AS community FROM l{_LPA_ROUNDS}"""
    assert base.endswith(tail)
    return (
        base[: -len(tail)]
        + f""", labels AS MATERIALIZED (
        SELECT node, lbl FROM l{_LPA_ROUNDS}
    ), m AS (
        SELECT COUNT(*) AS m FROM e0
    ), deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0
        ) GROUP BY node
    ), comm AS (
        SELECT l.lbl AS community,
               COUNT(*) AS n_nodes,
               SUM(d.d) AS d_sum
        FROM labels l JOIN deg d ON d.node = l.node
        GROUP BY l.lbl
    ), internal AS (
        SELECT lu.lbl AS community, COUNT(*) AS e_in
        FROM e0
        JOIN labels lu ON lu.node = e0.u
        JOIN labels lv ON lv.node = e0.v
        WHERE lu.lbl = lv.lbl
        GROUP BY lu.lbl
    )
    SELECT CAST((SELECT COUNT(*) FROM comm) AS BIGINT) AS n_communities,
           CAST((SELECT m FROM m) AS BIGINT) AS n_edges,
           FLOOR((4.0 * (SELECT m FROM m) * (SELECT COALESCE(SUM(e_in), 0) FROM internal)
                  - (SELECT SUM(d_sum * d_sum) FROM comm))
                 * 1e6 / (4.0 * (SELECT m FROM m) * (SELECT m FROM m))) / 1e6
               AS modularity
"""
    )


@query("graph_modularity", oracle=_modularity_sql())
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modularity Q of the LPA community partition — the standard
    "are these communities real" score (fraction of edges inside
    communities minus the degree-preserving random expectation),
    computed from exact integers: Q = (4m*Σe_c - ΣD_c²) / 4m², one
    quantized division at the end. Scoring the partition the engine
    itself produced closes the community-detection loop:
    graph_community_lpa finds it, this evaluates it.

    Scale: label join onto the edge list (|E|-shuffle), degree and
    community aggregates at node/community grain, 1-row reduction."""
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    e0 = _co_supply_edges(spark, sf_dir)
    labels = graph_community_lpa(spark, sf_dir).select(
        F.col("node"), F.col("community").alias("lbl")
    ).transform(cut_lineage)
    m = e0.count()
    deg = (
        e0.select(F.col("u").alias("node"))
        .unionAll(e0.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    comm = (
        labels.join(deg, "node")
        .groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("d_sum"))
        .transform(cut_lineage)
    )
    internal = (
        e0.join(labels.withColumnRenamed("node", "u").withColumnRenamed("lbl", "lu"), "u")
        .join(labels.withColumnRenamed("node", "v").withColumnRenamed("lbl", "lv"), "v")
        .filter(F.col("lu") == F.col("lv"))
        .agg(F.count(F.lit(1)).alias("e_in_total"))
    )
    sums = comm.agg(
        F.count(F.lit(1)).alias("n_communities"),
        F.sum(F.col("d_sum") * F.col("d_sum")).alias("dsq"),
    )
    return (
        sums.crossJoin(F.broadcast(internal))
        .select(
            F.col("n_communities").cast("bigint").alias("n_communities"),
            F.lit(m).cast("bigint").alias("n_edges"),
            (
                F.floor(
                    (4.0 * m * F.coalesce(F.col("e_in_total"), F.lit(0)) - F.col("dsq"))
                    * 1e6
                    / (4.0 * m * m)
                )
                / 1e6
            ).alias("modularity"),
        )
    )


# ---------------------------------------------------------------------------
# Experiment power analysis (sample-size planning)
# ---------------------------------------------------------------------------

_PWR_MDE = 0.02  # minimum detectable effect, absolute
_PWR_Z_BETA = 0.8416212335729143  # 80% power


@query(
    "ab_power_analysis",
    oracle=f"""
    WITH conv AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(c) AS BIGINT) AS n_conv
        FROM (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                            THEN 1 ELSE 0 END) AS c
            FROM events GROUP BY user_id
        )
    )
    SELECT n_users, n_conv,
           FLOOR(n_conv * 1e6 / n_users) / 1e6 AS p_base,
           CAST(CEIL(2.0 * ({_AB_Z} + {_PWR_Z_BETA}) * ({_AB_Z} + {_PWR_Z_BETA})
                * (n_conv * 1.0 / n_users) * (1 - n_conv * 1.0 / n_users)
                / ({_PWR_MDE} * {_PWR_MDE})) AS BIGINT) AS n_per_arm
    FROM conv
""",
)
def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-size planning from the observed base rate: users per arm
    to detect a {mde} absolute lift at 95% confidence / 80% power
    (n = 2(z_a+z_b)^2 p(1-p)/mde^2) — the pre-registration number the
    z-test entry's readout is meaningless without. Exact counts in,
    one fixed double formula out (ceil is integer-exact in both
    engines).

    Scale: user-grain aggregate then a 1-row formula.""".format(mde=_PWR_MDE)
    ev = _t(spark, sf_dir, "events")["events"]
    conv = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1
                ).otherwise(0)
            ).alias("c")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("c").cast("bigint").alias("n_conv"),
        )
    )
    p = F.col("n_conv") * 1.0 / F.col("n_users")
    zsum = _AB_Z + _PWR_Z_BETA
    return conv.select(
        "n_users",
        "n_conv",
        (F.floor(F.col("n_conv") * 1e6 / F.col("n_users")) / 1e6).alias("p_base"),
        F.ceil(2.0 * zsum * zsum * p * (1 - p) / (_PWR_MDE * _PWR_MDE))
        .cast("bigint")
        .alias("n_per_arm"),
    )


# ---------------------------------------------------------------------------
# Class-balance training weights
# ---------------------------------------------------------------------------


@query(
    "ml_class_weights",
    oracle="""
    WITH per AS (
        SELECT label, CAST(COUNT(*) AS BIGINT) AS n_c FROM embeddings GROUP BY label
    ), tot AS (
        SELECT SUM(n_c) AS n, COUNT(*) AS k FROM per
    )
    SELECT label, n_c,
           CAST(FLOOR(t.n * 1e6 / (t.k * n_c)) AS BIGINT) AS weight_fp
    FROM per CROSS JOIN tot t
""",
)
def ml_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced'
    heuristic, n/(k*n_c)) over the embedding labels — the loss-weight
    table an imbalanced classifier head trains with. Fixed-point exact
    (integer counts, one floored integer-scaled division).

    Scale: one label-grain aggregate; totals are a 1-row broadcast."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    per = e.groupBy("label").agg(F.count("*").cast("bigint").alias("n_c"))
    tot = per.agg(F.sum("n_c").alias("n"), F.count("*").alias("k"))
    return per.crossJoin(F.broadcast(tot)).select(
        "label",
        "n_c",
        F.floor(F.col("n") * 1e6 / (F.col("k") * F.col("n_c")))
        .cast("bigint")
        .alias("weight_fp"),
    )


# ---------------------------------------------------------------------------
# Streaming bottom-k uniform sample (deterministic reservoir)
# ---------------------------------------------------------------------------

_BOTTOMK_K = 16

_BOTTOMK_SQL = f"""
    WITH ranked AS (
        SELECT event_type, event_id,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY {_accept_hash_sql('event_id')} ASC, event_id ASC
               ) AS rn
        FROM events
    )
    SELECT event_type, event_id
    FROM ranked WHERE rn <= {_BOTTOMK_K}
"""


@query("stream_bottomk_sample", mutates_conf=True, oracle=_BOTTOMK_SQL)
def stream_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform per-key k-sample maintained BY THE STREAMING ENGINE:
    the k rows with the smallest portable hash per event type live in
    GroupState (bottom-k — the deterministic replacement for reservoir
    sampling: hash order is uniformly random but identical across
    engines, replays, and restarts, so the replayed sample equals the
    batch bottom-k and the SQL oracle EXACTLY, row for row). Completes
    the streaming-state family: profiles, bitmap/KMV distinct,
    windowed percentiles, funnel levels, and now uniform samples.

    Scale: state is <= k (hash, id) pairs per key forever; micro-batch
    merge is union + re-truncate (the KMV mergeability argument with
    row ids carried)."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events
    from es_analytics_spark.streaming.stateful import running_bottomk_sample

    ev = stream_events(spark, sf_dir)
    hashed = ev.select(
        "event_type", "event_id", _accept_hash(F.col("event_id")).alias("h")
    )
    out = replay_stream(
        spark,
        running_bottomk_sample(hashed, _BOTTOMK_K),
        name="stream_bottomk_sample",
        output_mode="append",
    )
    from pyspark.sql import Window as W2

    w = W2.partitionBy("event_type").orderBy(F.col("n_rows").desc())
    final = (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_type", F.explode("sample_ids").alias("event_id"))
    )
    return final


# ---------------------------------------------------------------------------
# Benford first-digit deviation (data-quality / fraud screen)
# ---------------------------------------------------------------------------

# log10(1 + 1/d) as shared literals so both engines compare against
# bit-identical expectations
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items()
) + " END"

_BENFORD_SQL = f"""
    WITH digits AS (
        SELECT CAST(SUBSTRING(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS digit
        FROM orders
    ), counts AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(COUNT(*)) OVER () AS total
        FROM digits GROUP BY digit
    )
    SELECT digit, n,
           FLOOR(n * 1e6 / total) / 1e6 AS share,
           FLOOR({_BENFORD_CASE} * 1e6) / 1e6 AS benford_expected,
           FLOOR(ABS(n * 1.0 / total - {_BENFORD_CASE}) * 1e6) / 1e6 AS abs_deviation
    FROM counts
"""


@query("agg_benford_deviation", oracle=_BENFORD_SQL)
def agg_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals: observed
    leading-digit shares against log10(1+1/d) — the fraud/data-entry
    anomaly check auditors run on financial columns. Leading digits
    come from exact integer cents via string arithmetic (NOT
    floor(log10): log10 at powers of ten is off-by-ulp and flips the
    digit); the expected probabilities are shared double literals, so
    both engines compare bit-identical values.

    Scale: map-side digit extraction, a 9-group aggregate, and the
    share normalization over that 9-row frame."""
    od = _t(spark, sf_dir, "orders")["orders"]
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = od.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("bigint").alias("n")
    )
    # total as a 1-row broadcast, not an unpartitioned window — keeps
    # the catalog-wide single-partition guard allowlist-free
    totals = counts.agg(F.sum("n").alias("total"))
    total = F.col("total")
    expected = F.create_map(
        *[x for d, p in _BENFORD.items() for x in (F.lit(d), F.lit(p))]
    )[F.col("digit")]
    return counts.crossJoin(F.broadcast(totals)).select(
        "digit",
        "n",
        (F.floor(F.col("n") * 1e6 / total) / 1e6).alias("share"),
        (F.floor(expected * 1e6) / 1e6).alias("benford_expected"),
        (F.floor(F.abs(F.col("n") * 1.0 / total - expected) * 1e6) / 1e6).alias(
            "abs_deviation"
        ),
    )


# ---------------------------------------------------------------------------
# Nested learning-curve samples
# ---------------------------------------------------------------------------

_CURVE_PCTS = [1, 2, 5, 10, 25, 100]

_CURVE_SQL = f"""
    WITH pcts AS (
        SELECT UNNEST(ARRAY{_CURVE_PCTS}) AS pct
    )
    SELECT pct,
           CAST(COUNT(CASE WHEN {_accept_hash_sql('doc_id')} * 100 < pct * {_MIX_P}
                           THEN 1 END) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN {_accept_hash_sql('doc_id')} * 100 < pct * {_MIX_P}
                         THEN n_chars ELSE 0 END) AS BIGINT) AS n_chars
    FROM documents CROSS JOIN pcts
    GROUP BY pct
"""


@query("ml_learning_curve_sample", oracle=_CURVE_SQL)
def ml_learning_curve_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested learning-curve subsamples: deterministic hash-acceptance
    slices at 1/2/5/10/25/100% where every smaller slice is a strict
    subset of every larger one (same hash, higher threshold — the
    nestedness scaling-law experiments require so curve points differ
    only by data quantity, never by which data). Reports docs and
    chars per slice; the membership predicate is the same portable
    hash the domain-mix and split entries use, so slices are
    consistent ACROSS those operators too.

    Scale: one scan, |pcts| conditional aggregates fused into a single
    map-side-combined pass (the spine is a 6-row broadcast)."""
    d = _t(spark, sf_dir, "documents")["documents"]
    pcts = spark.createDataFrame([(p,) for p in _CURVE_PCTS], "pct int")
    member = _accept_hash(F.col("doc_id")) * 100 < F.col("pct") * _MIX_P
    return (
        d.crossJoin(F.broadcast(pcts))
        .groupBy("pct")
        .agg(
            F.sum(F.when(member, 1).otherwise(0)).cast("bigint").alias("n_docs"),
            F.sum(F.when(member, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("n_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Top user journeys (bounded path strings)
# ---------------------------------------------------------------------------

_PATH_CAP = 8  # first K events define the journey prefix

_TOP_PATHS_SQL = f"""
    WITH seq AS (
        SELECT user_id, SUBSTR(event_type, 1, 1) AS c,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY EPOCH_US(ts), event_id) AS rn
        FROM events
    ), paths AS (
        SELECT user_id, STRING_AGG(c, '' ORDER BY rn) AS path
        FROM seq WHERE rn <= {_PATH_CAP} GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path ASC LIMIT 10
"""


@query("ts_top_paths", oracle=_TOP_PATHS_SQL)
def ts_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common user journey prefixes (first {cap} events as
    an event-initial string) — the entry-path sankey's data. The
    prefix cap is the scale contract: full journeys grow with the
    fact table, prefixes are <= {cap} chars per user regardless of
    event volume (the path-state bound any journey analytics needs at
    100 TB).

    Scale: one user shuffle for the order window, map-side prefix
    filter BEFORE the string agg, a path-grain count, TakeOrdered
    top-10.""".format(cap=_PATH_CAP)
    ev = _t(spark, sf_dir, "events")["events"]
    wu = W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")), "event_id")
    seq = ev.select(
        "user_id",
        F.substring("event_type", 1, 1).alias("c"),
        F.row_number().over(wu).alias("rn"),
    ).filter(F.col("rn") <= _PATH_CAP)
    paths = seq.groupBy("user_id").agg(
        F.concat_ws("", F.array_sort(F.collect_list(F.struct("rn", "c"))).getField("c")).alias(
            "path"
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), F.asc("path"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Longest daily-activity streak per user
# ---------------------------------------------------------------------------

_STREAK_SQL = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), isl AS (
        SELECT user_id,
               day - TO_DAYS(CAST(ROW_NUMBER() OVER (
                   PARTITION BY user_id ORDER BY day) AS INT)) AS grp
        FROM days
    ), streaks AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
        FROM isl GROUP BY user_id, grp
    )
    SELECT user_id, MAX(len) AS longest_streak_days
    FROM streaks GROUP BY user_id
    ORDER BY longest_streak_days DESC, user_id ASC LIMIT 20
"""


@query("ts_longest_streak", oracle=_STREAK_SQL)
def ts_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, top-20 — the
    engagement-streak leaderboard (duolingo-style). Classic
    gaps-and-islands on the CALENDAR: day minus per-user day-rank is
    constant exactly within a consecutive run. window_gaps_islands
    finds value runs inside the event stream; this finds calendar
    runs at the (user, day) grain.

    Scale: events collapse to distinct (user, day) first; one user
    shuffle for the rank; streak and max aggregates at user grain;
    TakeOrdered top-20."""
    ev = _t(spark, sf_dir, "events")["events"]
    days = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    wu = W.partitionBy("user_id").orderBy("day")
    isl = days.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(wu)).alias("grp"),
    )
    streaks = isl.groupBy("user_id", "grp").agg(F.count("*").cast("bigint").alias("len"))
    return (
        streaks.groupBy("user_id")
        .agg(F.max("len").alias("longest_streak_days"))
        .orderBy(F.desc("longest_streak_days"), F.asc("user_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Equi-depth histogram (quantile-bucketed)
# ---------------------------------------------------------------------------

_EQD_BUCKETS = 10

_EQD_SQL = """
    WITH cuts AS (
        SELECT UNNEST(LIST_TRANSFORM(
                   QUANTILE_CONT(l_extendedprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
                   q -> FLOOR(q * 100 + 0.5) / 100)) AS cut
        FROM lineitem
    ), assigned AS (
        SELECT l.l_extendedprice AS x,
               CAST(1 + COALESCE(SUM(CASE WHEN l.l_extendedprice > c.cut THEN 1 ELSE 0 END), 0)
                    AS INT) AS bucket
        FROM lineitem l CROSS JOIN cuts c
        GROUP BY l.l_orderkey, l.l_linenumber, l.l_extendedprice
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(x) AS lo, MAX(x) AS hi
    FROM assigned GROUP BY bucket
"""


@query("agg_histogram_equidepth", oracle=_EQD_SQL)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile-bucketed) histogram of extended price:
    {b} buckets holding ~equal row counts, with each bucket's actual
    range — the histogram query optimizers and drift monitors use
    when fixed-width bins (agg_histogram) would put 90% of rows in one
    bar. Cut points are exact interpolated percentiles quantized to
    cents, so bucket assignment compares bit-identical doubles in
    both engines.

    Scale: one percentile aggregate (|cuts| rows, broadcast back),
    then one pass assigning each row by counting crossed cuts — a
    9-row broadcast product, map-side, followed by a {b}-group
    aggregate.

    Contract note: the cut points are computed EAGERLY at DataFrame-
    construction time (exact_percentile_cuts runs collect() jobs) and
    baked into the returned plan as literals — the returned frame
    reflects the data as of the call, so do not cache it across data
    refreshes; rebuild it instead.""".format(b=_EQD_BUCKETS)
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    pcts = [b / _EQD_BUCKETS for b in range(1, _EQD_BUCKETS)]
    # cut points via the distributed order-statistics helper — the
    # builtin percentile's single-threaded final merge over the
    # (near-unique) price column was this query's dominant cost and
    # does not scale (see exact_percentile_cuts); the helper is
    # bit-identical and the cent-quantization stays in the same Spark
    # transform over the literal cut array, so bucket assignment
    # compares the exact same doubles
    raw = exact_percentile_cuts(li, [], "l_extendedprice", pcts)[()]
    cuts = spark.range(1).select(
        F.transform(
            F.array(*[F.lit(c) for c in raw]),
            lambda c: F.floor(c * 100 + F.lit(0.5)) / 100,
        ).alias("cs")
    )
    assigned = (
        fan_out(li.select(F.col("l_extendedprice")), sf_dir, "lineitem",
                "l_extendedprice", weight=2)
        .select(F.col("l_extendedprice").alias("x"))
        .crossJoin(F.broadcast(cuts))
        .select(
            "x",
            (
                1
                + F.aggregate(
                    F.col("cs"),
                    F.lit(0),
                    lambda acc, c: acc + F.when(F.col("x") > c, 1).otherwise(0),
                )
            )
            .cast("int")
            .alias("bucket"),
        )
    )
    return assigned.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )


# ---------------------------------------------------------------------------
# Exact weighted median per group
# ---------------------------------------------------------------------------

_WMED_SQL = """
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS x,
               CAST(l_quantity AS BIGINT) AS wt,
               SUM(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
               SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_returnflag) AS tw
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(MAX(tw) AS BIGINT) AS total_weight,
           MIN(CASE WHEN cw * 2 >= tw THEN x END) AS weighted_median
    FROM w GROUP BY l_returnflag
"""


@query("agg_weighted_median", oracle=_WMED_SQL)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per group: the smallest price whose
    cumulative quantity weight reaches half the group's total — the
    "median unit price by volume" no unweighted percentile can answer
    (a 1-unit line and a 50-unit line count the same to MEDIAN).
    Deterministic: the cumulative order carries (price, orderkey,
    linenumber), weights are exact integers, and the chosen value is
    an existing data point (lower weighted median — no interpolation,
    no float synthesis).

    Scale: one group shuffle; both window sums and the total reuse the
    same partition; the final aggregate is |groups|-sized."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    wcum = (
        W.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("x"),
        F.sum(F.col("l_quantity").cast("bigint")).over(wcum).alias("cw"),
        F.sum(F.col("l_quantity").cast("bigint")).over(wall).alias("tw"),
    )
    return w.groupBy("l_returnflag").agg(
        F.max("tw").cast("bigint").alias("total_weight"),
        F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("x"))).alias("weighted_median"),
    )


# ---------------------------------------------------------------------------
# Forward / backward fill per group
# ---------------------------------------------------------------------------

_FFILL_SQL = """
    WITH src AS (
        SELECT user_id, event_id, EPOCH_US(ts) AS tus,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events WHERE user_id < 20
    )
    SELECT user_id, event_id, v,
           LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
           FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
    FROM src
"""


@query("fn_fill_forward", oracle=_FFILL_SQL)
def fn_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward- and backward-fill of missing measurements per user
    (error events carry no value): last/first non-null over the
    event-time order — pandas ffill/bfill as pure window expressions.
    ts_interpolate_linear fills BETWEEN points; this carries the
    last/next OBSERVED value, the sensor/price-stickiness semantics.

    Scale: both directions share one user shuffle (same partition
    spec, ascending + descending frames); no state beyond the window
    frame."""
    ev = _t(spark, sf_dir, "events")["events"]
    src = ev.filter(F.col("user_id") < 20).select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("tus"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bwd = (
        W.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return src.select(
        "user_id",
        "event_id",
        "v",
        F.last("v", ignorenulls=True).over(fwd).alias("ffill"),
        F.first("v", ignorenulls=True).over(bwd).alias("bfill"),
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix + per-class recall
# ---------------------------------------------------------------------------


def _langid_confusion_sql() -> str:
    from es_analytics_spark.queries import _HITS_SQL

    return f"""
    WITH hits AS (
        SELECT doc_id, lang AS lang_true, {_HITS_SQL}
        FROM documents
    ), pred AS (
        SELECT lang_true,
               CASE WHEN GREATEST(hits_en, hits_de, hits_fr, hits_es, hits_zh) = 0 THEN 'und'
                    WHEN hits_en >= GREATEST(hits_de, hits_fr, hits_es, hits_zh) THEN 'en'
                    WHEN hits_de >= GREATEST(hits_fr, hits_es, hits_zh) THEN 'de'
                    WHEN hits_fr >= GREATEST(hits_es, hits_zh) THEN 'fr'
                    WHEN hits_es >= hits_zh THEN 'es'
                    ELSE 'zh' END AS lang_pred
        FROM hits
    ), cm AS (
        SELECT lang_true, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY lang_true, lang_pred
    )
    SELECT lang_true, lang_pred, n,
           CAST(FLOOR(n * 1e6 / SUM(n) OVER (PARTITION BY lang_true)) AS BIGINT)
               AS class_share_fp
    FROM cm
"""


@query("ml_langid_confusion", oracle=_langid_confusion_sql())
def ml_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation harness for the engine's own language-ID heuristic:
    confusion matrix against the labeled lang column with per-class
    share (the diagonal is per-class recall) — the model-eval shape
    (predict → join truth → confusion → per-class metrics) every
    classifier audit runs, here closing the loop on
    text_language_id's predictions. Fixed-point shares over exact
    counts; the normalizing window partitions by true class
    (|langs|-sized, never data-sized).

    Scale: map-side prediction (same codegen'd stopword-overlap
    expressions as text_language_id), one |langs|^2 aggregate."""
    pred = text_language_id_pred(spark, sf_dir)
    cm = pred.groupBy("lang_true", "lang_pred").agg(
        F.count("*").cast("bigint").alias("n")
    )
    return cm.select(
        "lang_true",
        "lang_pred",
        "n",
        F.floor(F.col("n") * 1e6 / F.sum("n").over(W.partitionBy("lang_true")))
        .cast("bigint")
        .alias("class_share_fp"),
    )


def text_language_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang_true, lang_pred) per doc — text_language_id's projection,
    shared so the confusion-matrix entry scores the identical
    predictions."""
    from es_analytics_spark.queries import REGISTRY

    return REGISTRY["text_language_id"].fn(spark, sf_dir).select("lang_true", "lang_pred")


# ---------------------------------------------------------------------------
# DAU / WAU stickiness
# ---------------------------------------------------------------------------

_STICKY_SQL = """
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
        SELECT DISTINCT day FROM ud
    ), coverage AS (
        SELECT ud.user_id, d2.day
        FROM ud
        JOIN days d2 ON d2.day >= ud.day AND d2.day <= ud.day + INTERVAL 6 DAY
        GROUP BY ud.user_id, d2.day
    ), wau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM coverage GROUP BY day
    ), dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    )
    SELECT CAST(d.day AS TIMESTAMP) AS day, d.dau, w.wau,
           FLOOR(d.dau * 1e6 / w.wau) / 1e6 AS stickiness
    FROM dau d JOIN wau w USING (day)
"""


@query("ts_dau_wau_stickiness", oracle=_STICKY_SQL)
def ts_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day-WAU stickiness per day — the engagement
    ratio ("what share of this week's users showed up today") product
    teams track beside retention. WAU is exact: each (user, day)
    activity covers the next 7 calendar days, so trailing distinct
    membership is a bounded 7x expansion of the user-day grain joined
    to the observed-day spine, then one count per day — never a
    sliding count-distinct window.

    Scale: events collapse to (user, day) first; the expansion joins
    user-day against the |days| spine (broadcast) with a 7-day band;
    all counts are exact integers, stickiness floor-quantized."""
    ev = _t(spark, sf_dir, "events")["events"]
    ud = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    days = ud.select("day").distinct()
    coverage = (
        ud.join(
            F.broadcast(days.withColumnRenamed("day", "d2")),
            (F.col("d2") >= F.col("day")) & (F.col("d2") <= F.date_add(F.col("day"), 6)),
        )
        .select("user_id", F.col("d2").alias("day"))
        .distinct()
    )
    wau = coverage.groupBy("day").agg(F.count("*").cast("bigint").alias("wau"))
    dau = ud.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "wau",
            (F.floor(F.col("dau") * 1e6 / F.col("wau")) / 1e6).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# Final-mile recommendations: neighbor-vote items per user
# ---------------------------------------------------------------------------

_REC_K_ITEMS = 5

_ITEM_RECS_SQL = (
    _USER_CF_CTE
    + f"""
    , neighbors AS (
        SELECT c, nb, cos_fp FROM ranked WHERE rank <= {_CF_K}
    ), votes AS (
        SELECT n.c, rr.p, CAST(SUM(n.cos_fp) AS BIGINT) AS score_fp,
               CAST(COUNT(*) AS BIGINT) AS n_voters
        FROM neighbors n JOIN rr ON rr.c = n.nb
        GROUP BY n.c, rr.p
    ), novel AS (
        SELECT v.c, v.p, v.score_fp, v.n_voters
        FROM votes v LEFT JOIN rr own ON own.c = v.c AND own.p = v.p
        WHERE own.c IS NULL
    ), topn AS (
        SELECT c, p, score_fp, n_voters,
               ROW_NUMBER() OVER (PARTITION BY c
                                  ORDER BY score_fp DESC, n_voters DESC, p ASC) AS rank
        FROM novel
    )
    SELECT c AS custkey, p AS partkey, score_fp, n_voters, CAST(rank AS INT) AS rank
    FROM topn WHERE rank <= {_REC_K_ITEMS}
"""
)


@query("rec_item_recommendations", oracle=_ITEM_RECS_SQL)
def rec_item_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final-mile recommender: top-{k} parts per customer by
    neighbor vote — each of the user's top-{n} CF neighbors
    (rec_user_cf_topk's exact output) votes its own purchases with its
    fixed-point cosine as the weight; the user's already-purchased
    items are anti-joined out (recommend NOVEL items, the serving
    contract). Scores are sums of fixed-point integers, so ranking is
    exact; remaining ties break on voter count then part id.

    Scale: the neighbor table is |users| x {n}; the vote join expands
    it by neighbor basket size (bounded by the ratings grain); the
    anti-join and rank run at the candidate grain (never
    |users| x |items|).""".format(k=_REC_K_ITEMS, n=_CF_K)
    from pyspark.sql import Window as W2

    t = _t(spark, sf_dir, "orders", "lineitem")
    # ONE shared hub-capped ratings frame feeds the embedded CF
    # neighbor ranking AND the vote/novelty stages below — the former
    # shape built the orders-lineitem dedup twice (its own eagerly-cut
    # rr plus the one inside rec_user_cf_topk). The shared frame is
    # deliberately NOT checkpointed: a cut erases the item-keyed
    # partitioning the CF self-join shares (the measured 5.3 s trap
    # from round 11 — and an eagerly-cut shared rr here re-measured
    # 7.2 s vs 3.6 s for this shape); instead every consumer references
    # the identical fanned dedup subtree in ONE final plan and AQE's
    # stage cache reuses the shuffle stages at runtime, exactly the
    # rec_user_cf_topk exchange-sharing contract.
    raw = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    )
    r = fan_out(raw, sf_dir, "lineitem", "p", weight=8).distinct()
    pop = r.groupBy("p").agg(F.count("*").alias("np")).filter(F.col("np") <= _CF_POP_CAP)
    rr = r.join(broadcast_if_small(pop.select("p"), sf_dir, "part"), "p")
    neighbors = _user_cf_topk_from(rr, sf_dir).select(
        F.col("custkey").alias("c"), F.col("neighbor").alias("nb"), "cos_fp"
    )
    votes = (
        neighbors.join(rr.select(F.col("c").alias("nb"), "p"), "nb")
        .groupBy("c", "p")
        .agg(
            F.sum("cos_fp").cast("bigint").alias("score_fp"),
            F.count("*").cast("bigint").alias("n_voters"),
        )
    )
    novel = votes.join(rr, ["c", "p"], "left_anti")
    w = W2.partitionBy("c").orderBy(F.desc("score_fp"), F.desc("n_voters"), F.asc("p"))
    return (
        novel.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _REC_K_ITEMS)
        .select(
            F.col("c").alias("custkey"),
            F.col("p").alias("partkey"),
            "score_fp",
            "n_voters",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort LTV curves (cumulative revenue per cohort week offset)
# ---------------------------------------------------------------------------

_LTV_SQL = f"""
    WITH weekly AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM weekly GROUP BY user_id
    ), sizes AS (
        SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM firsts GROUP BY cohort_week
    ), rev AS (
        SELECT f.cohort_week,
               CAST(DATE_DIFF('day', f.cohort_week,
                              CAST(DATE_TRUNC('week', e.ts) AS TIMESTAMP)) / 7 AS INT)
                   AS week_offset,
               {dsum_expr('e.value')} AS revenue
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.week_offset, r.revenue,
           CAST(ROUND(SUM(CAST(r.revenue AS DECIMAL(38,10))) OVER (
                    PARTITION BY r.cohort_week ORDER BY r.week_offset
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
               AS cum_revenue,
           FLOOR(CAST(ROUND(SUM(CAST(r.revenue AS DECIMAL(38,10))) OVER (
                    PARTITION BY r.cohort_week ORDER BY r.week_offset
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE)
                 * 1e4 / s.cohort_size) / 1e4 AS ltv_per_user
    FROM rev r JOIN sizes s USING (cohort_week)
"""


@query("ts_cohort_ltv", oracle=_LTV_SQL)
def ts_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: cumulative purchase revenue per first-active
    week cohort at each week offset, absolute and per cohort user —
    the payback-period chart acquisition spend is judged against, and
    the revenue companion to ts_cohort_retention's count grid.

    Revenue flows through the decimal contract end to end (the
    cumulative window sums DECIMAL, rounding once at read-out);
    per-user LTV floor-quantizes after an exact BIGINT division
    denominator.

    Scale: one purchase-grain aggregate to (cohort, offset), then the
    cumulative window partitions BY COHORT over |offsets| rows —
    cohort-count partitions of weeks-sized frames, never
    data-sized."""
    ev = _t(spark, sf_dir, "events")["events"]
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    firsts = weekly.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = firsts.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(dsum("value").alias("revenue"))
    )
    wc = (
        W.partitionBy("cohort_week")
        .orderBy("week_offset")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.round(F.sum(F.col("revenue").cast("decimal(38,10)")).over(wc), 4).cast(
        "double"
    )
    return (
        rev.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "revenue",
            cum.alias("cum_revenue"),
            (F.floor(cum * 1e4 / F.col("cohort_size")) / 1e4).alias("ltv_per_user"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding distribution drift (centroid cosine between slices)
# ---------------------------------------------------------------------------

_EMB_DRIFT_SQL = """
    WITH halves AS (
        SELECT CAST(vec_id % 2 AS INT) AS half, t.i AS dim,
               CAST(embedding[t.i] AS DOUBLE) AS v
        FROM embeddings,
             UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS t(i)
    ), means AS (
        SELECT half, dim, AVG(v) AS m
        FROM halves GROUP BY half, dim
    ), joined AS (
        SELECT a.dim, a.m AS m0, b.m AS m1
        FROM means a JOIN means b ON a.dim = b.dim AND a.half = 0 AND b.half = 1
    )
    SELECT CAST(COUNT(*) AS INT) AS n_dims,
           FLOOR(SUM(m0 * m1) / (SQRT(SUM(m0 * m0)) * SQRT(SUM(m1 * m1))) * 1e6) / 1e6
               AS centroid_cosine,
           FLOOR((SQRT(SUM(m0 * m0)) - SQRT(SUM(m1 * m1))) * 1e6) / 1e6
               AS norm_gap
    FROM joined
"""


@query("sim_embedding_drift", oracle=_EMB_DRIFT_SQL)
def sim_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: cosine between the
    centroid vectors of two deterministic corpus slices (vec_id
    parity stands in for the before/after snapshots a production
    monitor compares) plus the centroid-norm gap — the cheap first
    alarm that an embedding model or upstream corpus shifted,
    before any ANN-recall regression shows.

    Per-dimension means are exact aggregate order-independent doubles
    (AVG over the same float32 inputs widened to double in both
    engines); the two summary statistics quantize once at the end.

    Scale: posexplode to (slice, dim, value) is a map-side 64x
    row expansion feeding one (slice, dim)-grain aggregate; the
    summary runs over 64 rows."""
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    halves = e.select(
        (F.col("vec_id") % 2).cast("int").alias("half"),
        F.posexplode("embedding").alias("dim0", "v"),
    ).select("half", (F.col("dim0") + 1).alias("dim"), F.col("v").cast("double").alias("v"))
    means = halves.groupBy("half", "dim").agg(F.avg("v").alias("m"))
    m0 = means.filter(F.col("half") == 0).select("dim", F.col("m").alias("m0"))
    m1 = means.filter(F.col("half") == 1).select("dim", F.col("m").alias("m1"))
    joined = m0.join(m1, "dim")
    return joined.agg(
        F.count("*").cast("int").alias("n_dims"),
        (
            F.floor(
                F.sum(F.col("m0") * F.col("m1"))
                / (
                    F.sqrt(F.sum(F.col("m0") * F.col("m0")))
                    * F.sqrt(F.sum(F.col("m1") * F.col("m1")))
                )
                * 1e6
            )
            / 1e6
        ).alias("centroid_cosine"),
        (
            F.floor(
                (
                    F.sqrt(F.sum(F.col("m0") * F.col("m0")))
                    - F.sqrt(F.sum(F.col("m1") * F.col("m1")))
                )
                * 1e6
            )
            / 1e6
        ).alias("norm_gap"),
    )


# ---------------------------------------------------------------------------
# New vs returning revenue split per week
# ---------------------------------------------------------------------------

_NEWRET_SQL = f"""
    WITH weekly AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(wk) AS first_wk FROM weekly GROUP BY user_id
    )
    SELECT CAST(DATE_TRUNC('week', e.ts) AS TIMESTAMP) AS week,
           CAST(COUNT(DISTINCT CASE WHEN CAST(DATE_TRUNC('week', e.ts) AS TIMESTAMP) = f.first_wk
                                    THEN e.user_id END) AS BIGINT) AS new_buyers,
           CAST(COUNT(DISTINCT CASE WHEN CAST(DATE_TRUNC('week', e.ts) AS TIMESTAMP) <> f.first_wk
                                    THEN e.user_id END) AS BIGINT) AS returning_buyers,
           {dsum_expr("CASE WHEN CAST(DATE_TRUNC('week', e.ts) AS TIMESTAMP) = f.first_wk THEN e.value ELSE 0 END")}
               AS new_revenue,
           {dsum_expr("CASE WHEN CAST(DATE_TRUNC('week', e.ts) AS TIMESTAMP) <> f.first_wk THEN e.value ELSE 0 END")}
               AS returning_revenue
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    WHERE e.event_type = 'purchase'
    GROUP BY 1
"""


@query("ts_new_vs_returning_revenue", oracle=_NEWRET_SQL)
def ts_new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue split by new vs returning purchasers (new =
    purchasing in their first-ever active week) — the acquisition-vs-
    retention revenue mix that tells a team which engine is carrying
    growth. Buyer counts are exact distincts; both revenue streams go
    through the decimal contract in one fused FILTER-style aggregate
    (single scan, no per-segment re-read).

    Scale: (user, week) grain first, user-grain first-week join onto
    the purchase stream (hash join at user grain), one weekly
    aggregate."""
    ev = _t(spark, sf_dir, "events")["events"]
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    firsts = weekly.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    purch = ev.filter(F.col("event_type") == "purchase").join(firsts, "user_id")
    wk = F.date_trunc("week", F.col("ts"))
    is_new = wk == F.col("first_wk")
    return purch.groupBy(wk.alias("week")).agg(
        F.countDistinct(F.when(is_new, F.col("user_id"))).cast("bigint").alias("new_buyers"),
        F.countDistinct(F.when(~is_new, F.col("user_id")))
        .cast("bigint")
        .alias("returning_buyers"),
        dsum(F.when(is_new, F.col("value")).otherwise(0.0)).alias("new_revenue"),
        dsum(F.when(~is_new, F.col("value")).otherwise(0.0)).alias("returning_revenue"),
    )


# ---------------------------------------------------------------------------
# Activation latency: signup -> first purchase percentiles
# ---------------------------------------------------------------------------

_TTC_SQL = """
    WITH s AS (
        SELECT user_id, MIN(EPOCH_US(ts)) AS signup_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
        SELECT e.user_id, MIN(EPOCH_US(e.ts)) AS first_purchase_us
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND EPOCH_US(e.ts) > s.signup_us
        GROUP BY e.user_id
    ), lat AS (
        SELECT s.user_id,
               (p.first_purchase_us - s.signup_us) / 3600000000.0 AS hours
        FROM s JOIN p ON p.user_id = s.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           FLOOR(QUANTILE_CONT(hours, 0.50) * 1e4 + 0.5) / 1e4 AS p50_hours,
           FLOOR(QUANTILE_CONT(hours, 0.90) * 1e4 + 0.5) / 1e4 AS p90_hours,
           FLOOR(QUANTILE_CONT(hours, 0.99) * 1e4 + 0.5) / 1e4 AS p99_hours
    FROM lat
"""


@query("ts_time_to_convert", oracle=_TTC_SQL)
def ts_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation latency: exact p50/p90/p99 hours from each user's
    first signup to their first STRICTLY LATER purchase — the
    time-to-value distribution activation teams move. Latencies are
    exact integer microsecond differences divided once by a constant
    (identical IEEE op per row); percentiles are exact interpolated
    and half-up quantized.

    Scale: two user-grain min-aggregates, one user-grain join, and a
    percentile aggregate over the converted-user grain."""
    ev = _t(spark, sf_dir, "events")["events"]
    tus = F.unix_micros(F.col("ts"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(tus).alias("signup_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", tus.alias("pus"))
        .join(s, "user_id")
        .filter(F.col("pus") > F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("pus").alias("first_purchase_us"))
    )
    lat = s.join(p, "user_id").select(
        ((F.col("first_purchase_us") - F.col("signup_us")) / 3600000000.0).alias("hours")
    )
    q = lambda frac: (  # noqa: E731
        F.floor(F.expr(f"percentile(hours, {frac})") * 1e4 + F.lit(0.5)) / 1e4
    )
    return lat.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        q(0.50).alias("p50_hours"),
        q(0.90).alias("p90_hours"),
        q(0.99).alias("p99_hours"),
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

_CUPED_SQL = f"""
    WITH b AS (
        SELECT (MIN(EPOCH_US(ts)) + MAX(EPOCH_US(ts))) // 2 AS cutoff FROM events
    ), pu AS (
        SELECT user_id,
               {dsum_expr("CASE WHEN event_type = 'purchase' AND EPOCH_US(ts) <= cutoff THEN value ELSE 0 END")} AS x,
               {dsum_expr("CASE WHEN event_type = 'purchase' AND EPOCH_US(ts) > cutoff THEN value ELSE 0 END")} AS y
        FROM events, b GROUP BY user_id, cutoff
    ), g AS (
        SELECT COUNT(*) AS n, {dsum_expr('x')} AS sx, {dsum_expr('y')} AS sy,
               {dsum_expr('x * x')} AS sxx, {dsum_expr('x * y')} AS sxy
        FROM pu
    ), th AS (
        SELECT sx / n AS xbar,
               CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                    ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS theta
        FROM g
    ), v AS (
        SELECT CAST(user_id % 2 AS INT) AS variant, COUNT(*) AS n_users,
               {dsum_expr('x')} AS sx, {dsum_expr('y')} AS sy,
               {dsum_expr('x * x')} AS sxx, {dsum_expr('x * y')} AS sxy,
               {dsum_expr('y * y')} AS syy
        FROM pu GROUP BY 1
    )
    SELECT variant, CAST(n_users AS BIGINT) AS n_users,
           FLOOR(th.theta * 1e6 + 0.5) / 1e6 AS theta,
           FLOOR(sy / n_users * 1e6 + 0.5) / 1e6 AS mean_metric,
           FLOOR((sy / n_users - th.theta * (sx / n_users - th.xbar)) * 1e6 + 0.5) / 1e6
               AS mean_cuped,
           CASE WHEN syy / n_users - (sy / n_users) * (sy / n_users) = 0 THEN 0.0
                ELSE FLOOR(100 * (1 - (
                         (syy / n_users - (sy / n_users) * (sy / n_users))
                         - 2 * th.theta * (sxy / n_users - (sx / n_users) * (sy / n_users))
                         + th.theta * th.theta * (sxx / n_users - (sx / n_users) * (sx / n_users))
                     ) / (syy / n_users - (sy / n_users) * (sy / n_users))) * 1e6 + 0.5) / 1e6
           END AS var_reduction_pct
    FROM v, th
"""


@query("ab_cuped_readout", oracle=_CUPED_SQL)
def ab_cuped_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) readout:
    per hash-bucket variant, the raw metric mean (experiment-half
    purchase revenue per user) and the variance-reduced CUPED mean
    Y - theta * (X - mean(X)), where X is the same user's
    pre-period revenue and theta = cov(X,Y)/var(X) pooled over all
    users — the adjustment every modern experimentation platform
    applies to shrink CIs without touching the point estimate's
    expectation. Also reports the per-variant variance-reduction
    percentage, the number CUPED advocates quote (typically 30-60%
    when pre-period behavior predicts in-period behavior).

    Exactness: the pre/post cutoff is the integer midpoint of the
    event-time span (pure BIGINT microsecond arithmetic); per-user x/y
    and every moment (sx, sxx, sxy, ...) go through the decimal-sum
    contract, so theta and all reported statistics are single fixed
    IEEE expression trees over exact scalars, half-up quantized at
    1e-6 identically in both engines.

    Scale: one user-grain aggregate over the fact stream, a 1-row
    bounds broadcast, a 1-row theta broadcast, and a 2-row variant
    reduction — no data-sized windows, joins, or collects."""
    ev = _t(spark, sf_dir, "events")["events"]
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx")).select(
        F.expr("(mn + mx) div 2").alias("cutoff")
    )
    is_p = F.col("event_type") == "purchase"
    pu = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "cutoff")
        .agg(
            dsum(F.when(is_p & (us <= F.col("cutoff")), F.col("value")).otherwise(0.0)).alias(
                "x"
            ),
            dsum(F.when(is_p & (us > F.col("cutoff")), F.col("value")).otherwise(0.0)).alias(
                "y"
            ),
        )
        .drop("cutoff")
        # pu feeds both the pooled-theta reduction and the per-variant
        # readout; checkpoint the |users|-row frame so the fact stream
        # is scanned once for it, not once per consumer
        .transform(cut_lineage)
    )
    g = pu.agg(
        F.count("*").alias("n"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy, sxx, sxy = (F.col(c) for c in ("n", "sx", "sy", "sxx", "sxy"))
    th = g.select(
        (sx / n).alias("xbar"),
        F.when(n * sxx - sx * sx == 0, F.lit(0.0))
        .otherwise((n * sxy - sx * sy) / (n * sxx - sx * sx))
        .alias("theta"),
    )
    v = pu.groupBy((F.col("user_id") % 2).cast("int").alias("variant")).agg(
        F.count("*").cast("bigint").alias("n_users"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    j = v.crossJoin(F.broadcast(th))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    nv = F.col("n_users")
    my, mx_ = F.col("sy") / nv, F.col("sx") / nv
    vy = F.col("syy") / nv - my * my
    cv = F.col("sxy") / nv - mx_ * my
    vx = F.col("sxx") / nv - mx_ * mx_
    t = F.col("theta")
    vc = vy - 2 * t * cv + t * t * vx
    return j.select(
        "variant",
        "n_users",
        q6(t).alias("theta"),
        q6(my).alias("mean_metric"),
        q6(my - t * (mx_ - F.col("xbar"))).alias("mean_cuped"),
        F.when(vy == 0, F.lit(0.0))
        .otherwise(q6(100 * (1 - vc / vy)))
        .alias("var_reduction_pct"),
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson-bootstrap confidence interval
# ---------------------------------------------------------------------------

_BOOT_B = 100
# floor(CDF_Poisson(1)(k) * 1000003) for k = 0..4 — shared integer
# thresholds so the per-(row, resample) weight is pure BIGINT in both
# engines (no double comparison anywhere in the hot path)
_BOOT_T = (367880, 735761, 919701, 981014, 996343)

_BOOT_SQL = f"""
    WITH p AS (
        SELECT event_id, value FROM events WHERE event_type = 'purchase'
    ), rs AS (
        SELECT p.value, bs.b,
               ((p.event_id + bs.b * 31) * 9973 + 7919) % 1000003 AS h
        FROM p CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {_BOOT_B - 1})) AS b) bs
    ), wtd AS (
        SELECT b, value,
               CASE WHEN h < {_BOOT_T[0]} THEN 0 WHEN h < {_BOOT_T[1]} THEN 1
                    WHEN h < {_BOOT_T[2]} THEN 2 WHEN h < {_BOOT_T[3]} THEN 3
                    WHEN h < {_BOOT_T[4]} THEN 4 ELSE 5 END AS w
        FROM rs
    ), means AS (
        SELECT b, {dsum_expr('w * value')} / SUM(w) AS m
        FROM wtd GROUP BY b
    ), obs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
               {davg_expr('value')} AS om
        FROM p
    )
    SELECT obs.n_purchases,
           FLOOR(obs.om * 1e6 + 0.5) / 1e6 AS obs_mean,
           FLOOR(QUANTILE_CONT(m, 0.025) * 1e6 + 0.5) / 1e6 AS boot_lo,
           FLOOR(QUANTILE_CONT(m, 0.975) * 1e6 + 0.5) / 1e6 AS boot_hi
    FROM means, obs GROUP BY obs.n_purchases, obs.om
"""


@query("stat_bootstrap_ci", oracle=_BOOT_SQL)
def stat_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% CI for mean purchase value:
    each of the 100 resamples weights every row by a
    Poisson(1)-distributed count derived from a portable integer hash
    of (event_id, resample) — the online-bootstrap construction (Owen &
    Eckles, "Bootstrapping data arrays of arbitrary order") that makes
    resampling a single scan instead of B shuffled copies, and the
    standard way to bootstrap at terabyte scale. The CI is the exact
    interpolated 2.5/97.5 percentile of the resample means.

    Exactness: weights are pure BIGINT hash-threshold arithmetic
    (identical in both engines); each resample mean is a decimal-exact
    weighted sum over an exact integer weight total; the percentile is
    the shared R-7 linear interpolation over 100 deterministic
    doubles, half-up quantized.

    Scale: the resample axis is a generator (explode of a 100-int
    sequence), not a join — one scan, one map-side-combinable groupBy
    on the resample id (100 groups), then a 100-row
    reduction. No shuffled data copies, no driver state."""
    ev = _t(spark, sf_dir, "events")["events"]
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "value")
    rs = p.select(
        "event_id", "value", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b")
    )
    h = ((F.col("event_id") + F.col("b") * 31) * 9973 + 7919) % 1000003
    w = (
        F.when(h < _BOOT_T[0], 0)
        .when(h < _BOOT_T[1], 1)
        .when(h < _BOOT_T[2], 2)
        .when(h < _BOOT_T[3], 3)
        .when(h < _BOOT_T[4], 4)
        .otherwise(5)
    )
    means = (
        rs.select("b", "value", w.alias("w"))
        .groupBy("b")
        .agg((dsum(F.col("w") * F.col("value")) / F.sum("w")).alias("m"))
    )
    obs = p.agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        davg("value").alias("om"),
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    ci = means.agg(
        q6(F.expr("percentile(m, 0.025D)")).alias("boot_lo"),
        q6(F.expr("percentile(m, 0.975D)")).alias("boot_hi"),
    )
    return ci.crossJoin(F.broadcast(obs)).select(
        "n_purchases", q6(F.col("om")).alias("obs_mean"), "boot_lo", "boot_hi"
    )


# ---------------------------------------------------------------------------
# Holt linear-trend exponential smoothing (level + trend forecast)
# ---------------------------------------------------------------------------

_HOLT_SQL = f"""
    WITH RECURSIVE daily AS (
        SELECT user_id, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS v
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), ord AS (
        SELECT user_id, day, v,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
        FROM daily
    ), nn AS (
        SELECT user_id, MAX(rn) AS n, MAX(day) AS last_day FROM ord GROUP BY user_id
    ), rec AS (
        SELECT user_id, rn, v AS l, CAST(0.0 AS DOUBLE) AS b FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.rn,
               FLOOR((0.5 * o.v + 0.5 * (r.l + r.b)) * 1e6 + 0.5) / 1e6 AS l,
               FLOOR((0.3 * ((FLOOR((0.5 * o.v + 0.5 * (r.l + r.b)) * 1e6 + 0.5) / 1e6) - r.l)
                      + 0.7 * r.b) * 1e6 + 0.5) / 1e6 AS b
        FROM rec r JOIN ord o ON o.user_id = r.user_id AND o.rn = r.rn + 1
    )
    SELECT r.user_id, CAST(nn.n AS BIGINT) AS n_days, nn.last_day,
           r.l AS level, r.b AS trend,
           FLOOR((r.l + 7 * r.b) * 1e6 + 0.5) / 1e6 AS forecast_7d
    FROM rec r JOIN nn ON nn.user_id = r.user_id AND r.rn = nn.n
"""

_HOLT_L = "floor((0.5 * x.v + 0.5 * (s.l + s.b)) * 1e6 + 0.5) / 1e6"
_HOLT_B = (
    f"floor((0.3 * (({_HOLT_L}) - s.l) + 0.7 * s.b) * 1e6 + 0.5) / 1e6"
)


@query("ts_holt_linear", oracle=_HOLT_SQL)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend exponential smoothing (alpha=0.5, beta=0.3)
    over each user's daily purchase-revenue series: final smoothed
    level + trend state and the 7-step-ahead linear forecast
    level + 7*trend — the trend-aware complement to ts_ewma (no trend
    state) and ts_forecast_snaive (no smoothing). Initialized at
    l_1 = y_1, b_1 = 0, the standard short-series-safe start.

    Exactness: daily sums go through the decimal contract; each
    recursion step quantizes level and trend half-up at 1e-6 so the
    walk is the identical double sequence in both engines (the oracle
    is the same recurrence as a WITH RECURSIVE walk).

    Scale: the recursion is a per-series fold over the collected daily
    array (series length is bounded by the calendar — days, not
    events), keyed and shuffled once on the series id; there are no
    per-step joins, no driver state, and no single-partition windows.
    For very long series this is the applyInPandas-shaped pattern the
    streaming module carries state for."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum(F.col("value")).alias("v"))
    )
    arr = daily.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("day", "v"))).alias("vals"),
        F.count("*").cast("bigint").alias("n_days"),
        F.max("day").alias("last_day"),
    )
    fold = F.expr(
        "aggregate(slice(vals, 2, greatest(size(vals) - 1, 0)), "
        "named_struct('l', vals[0].v, 'b', cast(0 as double)), "
        f"(s, x) -> named_struct('l', {_HOLT_L}, 'b', {_HOLT_B}))"
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return arr.select(
        "user_id",
        "n_days",
        "last_day",
        fold.alias("st"),
    ).select(
        "user_id",
        "n_days",
        "last_day",
        F.col("st.l").alias("level"),
        F.col("st.b").alias("trend"),
        q6(F.col("st.l") + 7 * F.col("st.b")).alias("forecast_7d"),
    )


# ---------------------------------------------------------------------------
# Delete-one-bucket jackknife CI for a ratio metric
# ---------------------------------------------------------------------------

_JK_G = 50  # jackknife buckets (delete-one-bucket over user hash buckets)

_JK_SQL = f"""
    WITH pu AS (
        SELECT user_id,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev,
               COUNT(*) AS ev
        FROM events GROUP BY user_id
    ), bkt AS (
        SELECT (user_id * 9973 + 7919) % 1000003 % {_JK_G} AS g,
               {dsum_expr('rev')} AS sy, SUM(ev) AS sn
        FROM pu GROUP BY 1
    ), tot AS (
        SELECT {dsum_expr('sy')} AS ty, SUM(sn) AS tn, COUNT(*) AS ng FROM bkt
    ), loo AS (
        SELECT bkt.g, (tot.ty - bkt.sy) / (tot.tn - bkt.sn) AS rg, tot.ty, tot.tn, tot.ng
        FROM bkt, tot
    ), jk AS (
        SELECT ng, ty, tn, {dsum_expr('rg')} / ng AS rbar FROM loo
        GROUP BY ng, ty, tn
    )
    SELECT CAST(jk.ng AS BIGINT) AS n_buckets,
           FLOOR(jk.ty / jk.tn * 1e6 + 0.5) / 1e6 AS ratio,
           FLOOR(SQRT((jk.ng - 1.0) / jk.ng *
                      {dsum_expr('(loo.rg - jk.rbar) * (loo.rg - jk.rbar)')})
                 * 1e6 + 0.5) / 1e6 AS se,
           FLOOR((jk.ty / jk.tn - 1.959963984540054 *
                  SQRT((jk.ng - 1.0) / jk.ng *
                       {dsum_expr('(loo.rg - jk.rbar) * (loo.rg - jk.rbar)')}))
                 * 1e6 + 0.5) / 1e6 AS ci_lo,
           FLOOR((jk.ty / jk.tn + 1.959963984540054 *
                  SQRT((jk.ng - 1.0) / jk.ng *
                       {dsum_expr('(loo.rg - jk.rbar) * (loo.rg - jk.rbar)')}))
                 * 1e6 + 0.5) / 1e6 AS ci_hi
    FROM loo JOIN jk ON loo.ng = jk.ng
    GROUP BY jk.ng, jk.ty, jk.tn, jk.rbar
"""


@query("stat_jackknife_ratio_ci", oracle=_JK_SQL)
def stat_jackknife_ratio_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-bucket jackknife 95% CI for a ratio-of-sums metric
    (revenue per event): users are hashed into 50 buckets with the
    portable mix, the ratio is re-computed leaving each bucket out, and
    the jackknife variance (G-1)/G * sum (R_g - Rbar)^2 yields the
    standard error — the estimator experimentation platforms use for
    ratio metrics where user-level CLT doesn't apply directly (the
    denominator is random too). Delete-one-BUCKET (not delete-one-user)
    is what makes the jackknife O(G) instead of O(n) — the standard
    scale trade.

    Exactness: bucket assignment is pure BIGINT hash arithmetic;
    bucket/total sums and the squared-deviation sum all go through the
    decimal contract, so every reported statistic is one fixed IEEE
    expression over exact scalars, half-up quantized at 1e-6.

    Scale: one user-grain aggregate, one 50-row bucket aggregate, a
    1-row totals broadcast, and a 50-row reduction — no data-sized
    windows or collects."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("rev"),
        F.count("*").alias("ev"),
    )
    bkt = (
        pu.groupBy(((F.col("user_id") * 9973 + 7919) % 1000003 % _JK_G).alias("g"))
        .agg(dsum("rev").alias("sy"), F.sum("ev").alias("sn"))
        # the 50-row bucket frame feeds totals, leave-one-out ratios,
        # AND the deviation sum — checkpoint it so the fact stream is
        # scanned once, not once per consumer
        .transform(cut_lineage)
    )
    tot = bkt.agg(
        dsum("sy").alias("ty"), F.sum("sn").alias("tn"), F.count("*").alias("ng")
    )
    loo = bkt.crossJoin(F.broadcast(tot)).select(
        "g",
        ((F.col("ty") - F.col("sy")) / (F.col("tn") - F.col("sn"))).alias("rg"),
        "ty",
        "tn",
        "ng",
    )
    jk = (
        loo.groupBy("ng", "ty", "tn")
        .agg((dsum("rg") / F.col("ng")).alias("rbar"))
        .select("rbar")
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    dev2 = (F.col("rg") - F.col("rbar")) * (F.col("rg") - F.col("rbar"))
    agg = (
        loo.crossJoin(F.broadcast(jk))
        .groupBy("ng", "ty", "tn", "rbar")
        .agg(dsum(dev2).alias("ss"))
    )
    z95 = 1.959963984540054
    se = F.sqrt((F.col("ng") - 1.0) / F.col("ng") * F.col("ss"))
    ratio = F.col("ty") / F.col("tn")
    return agg.select(
        F.col("ng").cast("bigint").alias("n_buckets"),
        q6(ratio).alias("ratio"),
        q6(se).alias("se"),
        q6(ratio - z95 * se).alias("ci_lo"),
        q6(ratio + z95 * se).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Forecast-accuracy backtest: naive vs seasonal-naive vs drift
# ---------------------------------------------------------------------------

_FCA_SQL = f"""
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS x
        FROM events GROUP BY 1, 2
    ), d3 AS (
        SELECT event_type, day, x,
               ROW_NUMBER() OVER w AS rn,
               LAG(x, 1) OVER w AS lag1,
               LAG(x, 7) OVER w AS lag7,
               LAG(x, 14) OVER w AS lag14,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ), stats AS (
        SELECT event_type, n,
               MIN(CASE WHEN rn = 1 THEN x END) AS first_x,
               MIN(CASE WHEN rn = n - 14 THEN x END) AS last_x,
               {dsum_expr('CASE WHEN rn >= 2 THEN ABS(x - lag1) ELSE 0 END')} / (n - 15)
                   AS mae_in
        FROM d3 WHERE rn <= n - 14 GROUP BY event_type, n
    ), test AS (
        SELECT d3.event_type, d3.x, s.mae_in,
               s.last_x AS f_naive,
               CASE WHEN d3.rn - (d3.n - 14) <= 7 THEN d3.lag7 ELSE d3.lag14 END AS f_snaive,
               s.last_x + (d3.rn - (d3.n - 14)) * (s.last_x - s.first_x) / (d3.n - 15)
                   AS f_drift
        FROM d3 JOIN stats s ON s.event_type = d3.event_type
        WHERE d3.rn - (d3.n - 14) >= 1
    ), unp AS (
        SELECT event_type, x, mae_in, 'naive' AS method, f_naive AS f FROM test
        UNION ALL
        SELECT event_type, x, mae_in, 'snaive' AS method, f_snaive AS f FROM test
        UNION ALL
        SELECT event_type, x, mae_in, 'drift' AS method, f_drift AS f FROM test
    ), met AS (
        SELECT event_type, method, COUNT(*) AS n_test,
               {dsum_expr('ABS(x - f)')} / COUNT(*) AS mae,
               {dsum_expr("CASE WHEN ABS(x) + ABS(f) = 0 THEN 0 ELSE 2 * ABS(x - f) / (ABS(x) + ABS(f)) END")}
                   / COUNT(*) AS sm,
               MAX(mae_in) AS mi
        FROM unp GROUP BY 1, 2
    )
    SELECT event_type, method, CAST(n_test AS BIGINT) AS n_test,
           FLOOR(mae * 1e6 + 0.5) / 1e6 AS mae,
           FLOOR(100 * sm * 1e6 + 0.5) / 1e6 AS smape,
           CASE WHEN mi = 0 THEN 0.0
                ELSE FLOOR(mae / mi * 1e6 + 0.5) / 1e6 END AS mase
    FROM met
"""


@query("ts_forecast_accuracy", oracle=_FCA_SQL)
def ts_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy backtest: hold out the last 14 days of each
    per-event-type daily revenue series and score three classical
    baselines — naive (last train value), seasonal-naive (value one or
    two weeks back, never reading held-out actuals), and drift (linear
    extrapolation through the train endpoints) — with the three
    standard accuracy metrics: MAE, sMAPE, and MASE (MAE scaled by the
    in-sample one-step naive MAE, Hyndman's scale-free standard). The
    model-evaluation layer that turns ts_forecast_snaive /
    ts_holt_linear from forecasters into a measured choice.

    Exactness: daily sums, error sums, and the in-sample scaling term
    go through the decimal contract; lag frames are exact; every
    reported metric is a fixed IEEE expression half-up quantized at
    1e-6, with the two zero-denominator cases (flat series sMAPE term,
    zero in-sample MAE) defined identically in both engines.

    Scale: windows partition by series id (event_type) over the
    day-grain aggregate — calendar-bounded rows per partition, no
    single-partition exchange; the per-series stats frame (5 rows) is
    broadcast back; the method axis is a 3-way stack of the 14-row
    test frame."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        dsum(F.col("value")).alias("x")
    )
    w = W.partitionBy("event_type").orderBy("day")
    d3 = daily.select(
        "event_type",
        "day",
        "x",
        F.row_number().over(w).alias("rn"),
        F.lag("x", 1).over(w).alias("lag1"),
        F.lag("x", 7).over(w).alias("lag7"),
        F.lag("x", 14).over(w).alias("lag14"),
        F.count("*").over(W.partitionBy("event_type")).alias("n"),
    )
    rn, n, x = F.col("rn"), F.col("n"), F.col("x")
    stats = (
        d3.filter(rn <= n - 14)
        .groupBy("event_type", "n")
        .agg(
            F.min(F.when(rn == 1, x)).alias("first_x"),
            F.min(F.when(rn == n - 14, x)).alias("last_x"),
            (
                dsum(F.when(rn >= 2, F.abs(x - F.col("lag1"))).otherwise(0.0))
                / (F.col("n") - 15)
            ).alias("mae_in"),
        )
        .drop("n")
    )
    h = rn - (n - 14)
    test = (
        d3.filter(h >= 1)
        .join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "x",
            "mae_in",
            F.col("last_x").alias("f_naive"),
            F.when(h <= 7, F.col("lag7")).otherwise(F.col("lag14")).alias("f_snaive"),
            (
                F.col("last_x")
                + h * (F.col("last_x") - F.col("first_x")) / (n - 15)
            ).alias("f_drift"),
        )
    )
    unp = test.selectExpr(
        "event_type",
        "x",
        "mae_in",
        "stack(3, 'naive', f_naive, 'snaive', f_snaive, 'drift', f_drift) AS (method, f)",
    )
    f = F.col("f")
    sm_term = F.when(F.abs(x) + F.abs(f) == 0, 0.0).otherwise(
        2 * F.abs(x - f) / (F.abs(x) + F.abs(f))
    )
    met = unp.groupBy("event_type", "method").agg(
        F.count("*").alias("n_test"),
        (dsum(F.abs(x - f)) / F.count("*")).alias("mae"),
        (dsum(sm_term) / F.count("*")).alias("sm"),
        F.max("mae_in").alias("mi"),
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return met.select(
        "event_type",
        "method",
        F.col("n_test").cast("bigint").alias("n_test"),
        q6(F.col("mae")).alias("mae"),
        q6(100 * F.col("sm")).alias("smape"),
        F.when(F.col("mi") == 0, F.lit(0.0))
        .otherwise(q6(F.col("mae") / F.col("mi")))
        .alias("mase"),
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities (fixed 2-iteration, L1-normalized)
# ---------------------------------------------------------------------------


def _hits_dsum12_sql(expr: str) -> str:
    return f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(38,15))), 12) AS DOUBLE)"


_HITS_SQL = f"""
    WITH edges AS (
        SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ), h0 AS (
        SELECT DISTINCT cust, CAST(1.0 AS DOUBLE) AS h FROM edges
    ), a1r AS (
        SELECT e.supp, {_hits_dsum12_sql('h.h')} AS ar
        FROM edges e JOIN h0 h ON e.cust = h.cust GROUP BY e.supp
    ), a1t AS (
        SELECT {_hits_dsum12_sql('ar')} AS t FROM a1r
    ), a1 AS (
        SELECT supp, ar / t AS a FROM a1r, a1t
    ), h1r AS (
        SELECT e.cust, {_hits_dsum12_sql('a.a')} AS hr
        FROM edges e JOIN a1 a ON e.supp = a.supp GROUP BY e.cust
    ), h1t AS (
        SELECT {_hits_dsum12_sql('hr')} AS t FROM h1r
    ), h1 AS (
        SELECT cust, hr / t AS h FROM h1r, h1t
    ), a2r AS (
        SELECT e.supp, {_hits_dsum12_sql('h.h')} AS ar
        FROM edges e JOIN h1 h ON e.cust = h.cust GROUP BY e.supp
    ), a2t AS (
        SELECT {_hits_dsum12_sql('ar')} AS t FROM a2r
    ), a2 AS (
        SELECT supp, ar / t AS a FROM a2r, a2t
    ), h2r AS (
        SELECT e.cust, {_hits_dsum12_sql('a.a')} AS hr
        FROM edges e JOIN a2 a ON e.supp = a.supp GROUP BY e.cust
    ), h2t AS (
        SELECT {_hits_dsum12_sql('hr')} AS t FROM h2r
    ), h2 AS (
        SELECT cust, hr / t AS h FROM h2r, h2t
    )
    , resid AS (
        SELECT CAST(ROUND(MAX(ABS(x.a - y.a)), 9) AS DOUBLE) AS residual
        FROM a2 x JOIN a1 y ON x.supp = y.supp
    )
    SELECT * FROM (
        SELECT 'authority' AS role, supp AS node, ROUND(a, 9) AS score, residual
        FROM a2 CROSS JOIN resid ORDER BY a DESC, supp ASC LIMIT 10
    )
    UNION ALL
    SELECT * FROM (
        SELECT 'hub' AS role, cust AS node, ROUND(h, 9) AS score, residual
        FROM h2 CROSS JOIN resid ORDER BY h DESC, cust ASC LIMIT 10
    )
"""


@query("graph_hits", oracle=_HITS_SQL)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg) over the bipartite
    customer→supplier purchase graph: two mutual-reinforcement
    iterations — authority(s) = sum of hub scores pointing at s,
    hub(c) = sum of authority scores c points at — L1-normalized each
    half-step so scores stay a distribution. Top-10 authorities
    (suppliers everyone important buys from) and top-10 hubs
    (customers whose baskets span important suppliers). Complements
    graph_pagerank: HITS separates pointing-well from being-pointed-at,
    which a bipartite commerce graph expresses naturally.

    Exactness: every propagation sum uses the scale-12 decimal
    contract (scores <= 1 after L1 normalization, so unscaled values
    stay < 2^53 — same rule as PageRank); normalization divides two
    exact doubles, one IEEE op identical in both engines; the oracle
    is the identical recurrence unrolled as CTEs.

    Scale: the edge list is checkpointed once and pays exactly two
    equi-joins per iteration (frontier on cust, then on supp); scores
    and totals are node-sized / 1-row broadcasts; fixed iteration
    count is driver-side control flow, no collects."""
    o, li = (
        _t(spark, sf_dir, "orders", "lineitem")[t] for t in ("orders", "lineitem")
    )
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
        .transform(cut_lineage_lazy)
    )
    d12 = lambda c: F.round(  # noqa: E731
        F.sum(c.cast("decimal(38,15)")), 12
    ).cast("double")
    h = edges.select("cust").distinct().withColumn("h", F.lit(1.0))
    a = a_prev = None
    for it in range(2):
        # each raw-score frame is node-sized and feeds BOTH its L1
        # total and the normalized frame — checkpoint it so the
        # iterative lineage stays linear (without this the dual
        # consumption doubles the recomputed chain per half-step).
        # Iteration 0 starts from h = 1.0, so the first authority
        # half-step is exactly the in-degree — one aggregate, no join
        # (decimal sum of ones == COUNT, bit-identical to the oracle's
        # join form); later half-steps force shuffle_hash like
        # graph_pagerank so the edge partitions aren't re-sorted per
        # join.
        if it == 0:
            ar = (
                edges.groupBy("supp")
                .agg(F.count("*").cast("double").alias("ar"))
                .transform(cut_lineage_lazy)
            )
        else:
            # hub frame is customer-sized: broadcast when the customer
            # table's local layout proves it small (guide §3.1, the
            # graph_pagerank frontier pattern) so the edge list is not
            # shuffled for this half-step; the shuffle_hash hint keeps
            # the scale plan when the guard trips on a real lake
            ar = (
                edges.hint("shuffle_hash")
                .join(broadcast_if_small(h, sf_dir, "customer"), "cust")
                .groupBy("supp")
                .agg(d12(F.col("h")).alias("ar"))
                .transform(cut_lineage_lazy)
            )
        at = ar.agg(d12(F.col("ar")).alias("t"))
        a_prev = a
        a = ar.crossJoin(F.broadcast(at)).select(
            "supp", (F.col("ar") / F.col("t")).alias("a")
        )
        # authority frame is supplier-sized: same broadcast-when-bounded
        hr = (
            edges.hint("shuffle_hash")
            .join(broadcast_if_small(a, sf_dir, "supplier"), "supp")
            .groupBy("cust")
            .agg(d12(F.col("a")).alias("hr"))
            .transform(cut_lineage_lazy)
        )
        ht = hr.agg(d12(F.col("hr")).alias("t"))
        h = hr.crossJoin(F.broadcast(ht)).select(
            "cust", (F.col("hr") / F.col("t")).alias("h")
        )
    # convergence telemetry (r4 verdict ask 7): max |Δauthority|
    # between the two iterations under the same decimal contract —
    # lets a deployment size the iteration count from the output
    # itself. Normalized frames are node-sized; checkpoint so the
    # extra consumer reads blocks.
    a = a.transform(cut_lineage_lazy)
    a_prev = a_prev.transform(cut_lineage_lazy)
    resid = (
        a.join(a_prev.withColumnRenamed("a", "pa"), "supp")
        .agg(F.round(F.max(F.abs(F.col("a") - F.col("pa"))), 9)
             .cast("double").alias("residual"))
    )
    auth = (
        a.orderBy(F.desc("a"), F.asc("supp"))
        .limit(10)
        .select(
            F.lit("authority").alias("role"),
            F.col("supp").alias("node"),
            F.round("a", 9).alias("score"),
        )
    )
    hubs = (
        h.orderBy(F.desc("h"), F.asc("cust"))
        .limit(10)
        .select(
            F.lit("hub").alias("role"),
            F.col("cust").alias("node"),
            F.round("h", 9).alias("score"),
        )
    )
    # one broadcast onto the 20-row union, not one per arm
    return auth.unionAll(hubs).crossJoin(F.broadcast(resid))


# ---------------------------------------------------------------------------
# Funnel step latency percentiles
# ---------------------------------------------------------------------------

_FSL_SQL = """
    WITH v AS (
        SELECT user_id, MIN(EPOCH_US(ts)) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(EPOCH_US(e.ts)) AS t2
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND EPOCH_US(e.ts) > v.t1
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(EPOCH_US(e.ts)) AS t3
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND EPOCH_US(e.ts) > c.t2
        GROUP BY e.user_id
    ), lat AS (
        SELECT 'view->click' AS transition,
               (c.t2 - v.t1) / 3600000000.0 AS hours
        FROM v JOIN c ON c.user_id = v.user_id
        UNION ALL
        SELECT 'click->purchase' AS transition,
               (p.t3 - c.t2) / 3600000000.0 AS hours
        FROM c JOIN p ON p.user_id = c.user_id
    )
    SELECT transition, CAST(COUNT(*) AS BIGINT) AS n_users,
           FLOOR(QUANTILE_CONT(hours, 0.50) * 1e4 + 0.5) / 1e4 AS p50_hours,
           FLOOR(QUANTILE_CONT(hours, 0.90) * 1e4 + 0.5) / 1e4 AS p90_hours
    FROM lat GROUP BY transition
"""


@query("seq_funnel_step_latency", oracle=_FSL_SQL)
def seq_funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step-latency distribution: for the strictly-ordered
    view → click → purchase funnel (each step's first occurrence after
    the previous step), the exact p50/p90 hours spent in each
    transition — the where-do-users-stall readout that turns
    ts_funnel_windowed's conversion counts into actionable dwell
    times. Latencies are exact integer microsecond differences divided
    once by a constant; percentiles are exact interpolated, half-up
    quantized at 1e-4.

    Scale: three user-grain min-aggregates chained by user-keyed hash
    joins (each stage shrinks the frame), then one aggregate over the
    2-transition grain. No windows, no collects."""
    ev = _t(spark, sf_dir, "events")["events"]
    tus = F.unix_micros(F.col("ts"))

    def first_after(etype: str, prev: DataFrame, prev_col: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select("user_id", tus.alias("t"))
            .join(prev, "user_id")
            .filter(F.col("t") > F.col(prev_col))
            .groupBy("user_id")
            .agg(F.min("t").alias(out))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(tus).alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    lat = (
        v.join(c, "user_id")
        .select(
            F.lit("view->click").alias("transition"),
            ((F.col("t2") - F.col("t1")) / 3600000000.0).alias("hours"),
        )
        .unionAll(
            c.join(p, "user_id").select(
                F.lit("click->purchase").alias("transition"),
                ((F.col("t3") - F.col("t2")) / 3600000000.0).alias("hours"),
            )
        )
    )
    q4 = lambda c_: F.floor(c_ * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return lat.groupBy("transition").agg(
        F.count("*").cast("bigint").alias("n_users"),
        q4(F.expr("percentile(hours, 0.50D)")).alias("p50_hours"),
        q4(F.expr("percentile(hours, 0.90D)")).alias("p90_hours"),
    )


# ---------------------------------------------------------------------------
# Quantile treatment effects between experiment variants
# ---------------------------------------------------------------------------

_QTE_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), wide AS (
        SELECT QUANTILE_CONT(CASE WHEN variant = 0 THEN rev END, 0.25) AS q0_25,
               QUANTILE_CONT(CASE WHEN variant = 0 THEN rev END, 0.50) AS q0_50,
               QUANTILE_CONT(CASE WHEN variant = 0 THEN rev END, 0.75) AS q0_75,
               QUANTILE_CONT(CASE WHEN variant = 0 THEN rev END, 0.90) AS q0_90,
               QUANTILE_CONT(CASE WHEN variant = 1 THEN rev END, 0.25) AS q1_25,
               QUANTILE_CONT(CASE WHEN variant = 1 THEN rev END, 0.50) AS q1_50,
               QUANTILE_CONT(CASE WHEN variant = 1 THEN rev END, 0.75) AS q1_75,
               QUANTILE_CONT(CASE WHEN variant = 1 THEN rev END, 0.90) AS q1_90
        FROM pu
    )
    SELECT 'p25' AS quantile, FLOOR(q0_25 * 1e6 + 0.5) / 1e6 AS control,
           FLOOR(q1_25 * 1e6 + 0.5) / 1e6 AS treatment,
           FLOOR((q1_25 - q0_25) * 1e6 + 0.5) / 1e6 AS qte FROM wide
    UNION ALL
    SELECT 'p50', FLOOR(q0_50 * 1e6 + 0.5) / 1e6,
           FLOOR(q1_50 * 1e6 + 0.5) / 1e6,
           FLOOR((q1_50 - q0_50) * 1e6 + 0.5) / 1e6 FROM wide
    UNION ALL
    SELECT 'p75', FLOOR(q0_75 * 1e6 + 0.5) / 1e6,
           FLOOR(q1_75 * 1e6 + 0.5) / 1e6,
           FLOOR((q1_75 - q0_75) * 1e6 + 0.5) / 1e6 FROM wide
    UNION ALL
    SELECT 'p90', FLOOR(q0_90 * 1e6 + 0.5) / 1e6,
           FLOOR(q1_90 * 1e6 + 0.5) / 1e6,
           FLOOR((q1_90 - q0_90) * 1e6 + 0.5) / 1e6 FROM wide
"""


@query("ab_quantile_lift", oracle=_QTE_SQL)
def ab_quantile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects: the per-quantile difference between
    the treatment and control distributions of per-user purchase
    revenue (p25/p50/p75/p90) — the readout that shows WHERE in the
    distribution an experiment moves spend (a mean lift hiding in the
    top decile vs a broad shift), which the ab_ztest_srm mean
    comparison cannot distinguish.

    Exactness: per-user revenue goes through the decimal contract;
    each quantile is the shared R-7 interpolation over exact doubles
    filtered per variant (NULL-skipping CASE mirrors Spark's
    null-ignoring percentile); differences and outputs are half-up
    quantized at 1e-6.

    Scale: one user-grain aggregate, then a single global percentile
    reduction (8 scalars in one pass) and a 4-row stack."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("rev"),
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "rev")
    wide = pu.agg(
        *[
            F.expr(f"percentile(if(variant = {v}, rev, null), {q}D)").alias(
                f"q{v}_{int(q * 100)}"
            )
            for v in (0, 1)
            for q in (0.25, 0.50, 0.75, 0.90)
        ]
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    rows = []
    for q in (25, 50, 75, 90):
        rows.append(
            wide.select(
                F.lit(f"p{q}").alias("quantile"),
                q6(F.col(f"q0_{q}")).alias("control"),
                q6(F.col(f"q1_{q}")).alias("treatment"),
                q6(F.col(f"q1_{q}") - F.col(f"q0_{q}")).alias("qte"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# Difference-in-differences readout
# ---------------------------------------------------------------------------

_DID_SQL = f"""
    WITH b AS (
        SELECT (MIN(EPOCH_US(ts)) + MAX(EPOCH_US(ts))) // 2 AS cutoff FROM events
    ), pu AS (
        SELECT user_id,
               {dsum_expr("CASE WHEN event_type = 'purchase' AND EPOCH_US(ts) <= cutoff THEN value ELSE 0 END")} AS x,
               {dsum_expr("CASE WHEN event_type = 'purchase' AND EPOCH_US(ts) > cutoff THEN value ELSE 0 END")} AS y
        FROM events, b GROUP BY user_id, cutoff
    ), v AS (
        SELECT CAST(user_id % 2 AS INT) AS variant, COUNT(*) AS n,
               {dsum_expr('x')} AS sx, {dsum_expr('y')} AS sy
        FROM pu GROUP BY 1
    ), w AS (
        SELECT MAX(CASE WHEN variant = 0 THEN sx / n END) AS c_pre,
               MAX(CASE WHEN variant = 0 THEN sy / n END) AS c_post,
               MAX(CASE WHEN variant = 1 THEN sx / n END) AS t_pre,
               MAX(CASE WHEN variant = 1 THEN sy / n END) AS t_post
        FROM v
    )
    SELECT FLOOR(c_pre * 1e6 + 0.5) / 1e6 AS control_pre,
           FLOOR(c_post * 1e6 + 0.5) / 1e6 AS control_post,
           FLOOR(t_pre * 1e6 + 0.5) / 1e6 AS treat_pre,
           FLOOR(t_post * 1e6 + 0.5) / 1e6 AS treat_post,
           FLOOR(((t_post - t_pre) - (c_post - c_pre)) * 1e6 + 0.5) / 1e6 AS did
    FROM w
"""


@query("ab_diff_in_diff", oracle=_DID_SQL)
def ab_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: per-user purchase revenue means for
    the four (variant × pre/post) cells around the event-time
    midpoint, and the DiD estimate (treatment post-minus-pre) minus
    (control post-minus-pre) — the causal readout that nets out both
    the level difference between groups and the common time trend,
    the standard design when assignment isn't randomized cleanly.
    Complements ab_cuped_readout (same cells, different estimand).

    Exactness: same integer-microsecond midpoint and decimal user
    sums as ab_cuped_readout; cell means and the DiD contrast are one
    fixed IEEE expression tree, half-up quantized at 1e-6.

    Scale: one user-grain aggregate, a 2-row variant reduction, and a
    1-row pivot — nothing data-sized past the first shuffle."""
    ev = _t(spark, sf_dir, "events")["events"]
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx")).select(
        F.expr("(mn + mx) div 2").alias("cutoff")
    )
    is_p = F.col("event_type") == "purchase"
    pu = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id", "cutoff")
        .agg(
            dsum(F.when(is_p & (us <= F.col("cutoff")), F.col("value")).otherwise(0.0)).alias(
                "x"
            ),
            dsum(F.when(is_p & (us > F.col("cutoff")), F.col("value")).otherwise(0.0)).alias(
                "y"
            ),
        )
    )
    v = pu.groupBy((F.col("user_id") % 2).cast("int").alias("variant")).agg(
        F.count("*").alias("n"), dsum("x").alias("sx"), dsum("y").alias("sy")
    )
    cell = lambda vv, c: F.max(  # noqa: E731
        F.when(F.col("variant") == vv, F.col(c) / F.col("n"))
    )
    w = v.agg(
        cell(0, "sx").alias("c_pre"),
        cell(0, "sy").alias("c_post"),
        cell(1, "sx").alias("t_pre"),
        cell(1, "sy").alias("t_post"),
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return w.select(
        q6(F.col("c_pre")).alias("control_pre"),
        q6(F.col("c_post")).alias("control_post"),
        q6(F.col("t_pre")).alias("treat_pre"),
        q6(F.col("t_post")).alias("treat_post"),
        q6(
            (F.col("t_post") - F.col("t_pre")) - (F.col("c_post") - F.col("c_pre"))
        ).alias("did"),
    )


# ---------------------------------------------------------------------------
# Quality-filter ablation matrix
# ---------------------------------------------------------------------------

_ABLATION_SQL = """
    WITH f AS (
        SELECT doc_id,
               n_chars < 200 AS f_short,
               LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'))) * 1.0
                   / LEN(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) < 0.4
                   AS f_repetitive,
               n_chars * 1.0 / LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) > 5.7
                   AS f_longword
        FROM documents WHERE n_chars > 0
    ), m AS (
        SELECT f_short, f_repetitive, f_longword, COUNT(*) AS n_docs
        FROM f GROUP BY 1, 2, 3
    ), t AS (
        SELECT SUM(n_docs) AS total FROM m
    )
    SELECT m.f_short, m.f_repetitive, m.f_longword,
           CAST(m.n_docs AS BIGINT) AS n_docs,
           FLOOR(m.n_docs * 1.0 / t.total * 1e6 + 0.5) / 1e6 AS pct
    FROM m, t
"""


@query("text_filter_ablation", oracle=_ABLATION_SQL)
def text_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter ablation matrix: every combination of three
    document quality filters (too-short, repetitive low-token-diversity, long-word) with the count and share of the corpus it captures — the
    overlap audit a pipeline owner reads before turning filters on
    (a filter that only removes docs another filter already removes
    adds risk, not signal). The all-false row is the surviving
    fraction.

    Exactness: filter predicates are integer/ratio comparisons using
    the same LENGTH/regexp/token-count spellings the text_quality
    family already oracles; counts are exact; shares are one division,
    half-up quantized.

    Scale: single corpus scan into an 8-row-max mask aggregate
    (map-side combinable), 1-row total broadcast."""
    d = _t(spark, sf_dir, "documents")["documents"]
    c = F.col("text")
    n_chars = F.col("n_chars")
    toks_l = F.split(F.trim(F.lower(c)), r"\s+")
    n_tokens = F.size(F.split(F.trim(c), r"\s+"))
    tdr = F.size(F.array_distinct(toks_l)) * 1.0 / F.size(toks_l)
    f = d.filter(n_chars > 0).select(
        (n_chars < 200).alias("f_short"),
        (tdr < 0.4).alias("f_repetitive"),
        (n_chars * 1.0 / n_tokens > 5.7).alias("f_longword"),
    )
    m = f.groupBy("f_short", "f_repetitive", "f_longword").agg(F.count("*").alias("n_docs"))
    t = m.agg(F.sum("n_docs").alias("total"))
    q6 = lambda cc: F.floor(cc * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return m.crossJoin(F.broadcast(t)).select(
        "f_short",
        "f_repetitive",
        "f_longword",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        q6(F.col("n_docs") * 1.0 / F.col("total")).alias("pct"),
    )


# ---------------------------------------------------------------------------
# Dedup impact report (composition shift + total-variation distance)
# ---------------------------------------------------------------------------

_NORM5_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', '', 'g'),"
    " '\\s+', ' ', 'g'))"
)

_DEDUP_IMPACT_SQL = f"""
    WITH keep AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY MD5({_NORM5_SQL})
    ), bef AS (
        SELECT lang, COUNT(*) AS n_before FROM documents GROUP BY lang
    ), aft AS (
        SELECT d.lang, COUNT(*) AS n_after
        FROM documents d JOIN keep k ON d.doc_id = k.doc_id GROUP BY d.lang
    ), tb AS (
        SELECT SUM(n_before) AS t FROM bef
    ), ta AS (
        SELECT SUM(n_after) AS t FROM aft
    ), j AS (
        SELECT b.lang, b.n_before, COALESCE(a.n_after, 0) AS n_after,
               b.n_before * 1.0 / tb.t AS pct_before,
               COALESCE(a.n_after, 0) * 1.0 / ta.t AS pct_after
        FROM bef b LEFT JOIN aft a ON a.lang = b.lang, tb, ta
    ), tv AS (
        SELECT FLOOR(0.5 * {dsum_expr('ABS(pct_before - pct_after)')} * 1e6 + 0.5) / 1e6
            AS tv_distance
        FROM j
    )
    SELECT j.lang, CAST(j.n_before AS BIGINT) AS n_before,
           FLOOR(j.pct_before * 1e6 + 0.5) / 1e6 AS pct_before,
           CAST(j.n_after AS BIGINT) AS n_after,
           FLOOR(j.pct_after * 1e6 + 0.5) / 1e6 AS pct_after,
           tv.tv_distance
    FROM j, tv
"""


@query("dedup_impact_report", oracle=_DEDUP_IMPACT_SQL)
def dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship-bias audit: per-language corpus composition
    before vs after normalized-fingerprint exact dedup (deterministic
    min-doc_id keeper), plus the total-variation distance between the
    two language distributions — the check that deduplication didn't
    silently reshape the training mixture (boilerplate concentrates in
    some languages/sources, so dedup rarely removes uniformly).

    Exactness: the fingerprint and keeper rule are the
    text_fingerprint_dedup spellings; counts are exact; shares are one
    division each; the TV distance runs the |langs| absolute gaps
    through the decimal contract before halving, half-up quantized.

    Scale: one fingerprint aggregate (|docs| grain), a doc_id-keyed
    semi-join-shaped keeper join, two |langs|-row aggregates, 1-row
    total broadcasts; the |langs| comparison frame is checkpointed so
    the fingerprint pass runs once for both the rows and the TV
    reduction."""
    from es_analytics_spark.operators.dedup import document_fingerprint

    d = _t(spark, sf_dir, "documents")["documents"]
    keep = (
        document_fingerprint(d, "text")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    bef = d.groupBy("lang").agg(F.count("*").alias("n_before"))
    aft = (
        d.join(keep, "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_after"))
    )
    tb = bef.agg(F.sum("n_before").alias("tb"))
    ta = aft.agg(F.sum("n_after").alias("ta"))
    j = (
        bef.join(aft, "lang", "left")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(ta))
        .select(
            "lang",
            "n_before",
            F.coalesce(F.col("n_after"), F.lit(0)).alias("n_after"),
            (F.col("n_before") * 1.0 / F.col("tb")).alias("pct_before"),
            (
                F.coalesce(F.col("n_after"), F.lit(0)) * 1.0 / F.col("ta")
            ).alias("pct_after"),
        )
        .transform(cut_lineage)
    )
    q6 = lambda cc: F.floor(cc * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    tv = j.agg(
        q6(0.5 * dsum(F.abs(F.col("pct_before") - F.col("pct_after")))).alias(
            "tv_distance"
        )
    )
    return j.crossJoin(F.broadcast(tv)).select(
        "lang",
        F.col("n_before").cast("bigint").alias("n_before"),
        q6(F.col("pct_before")).alias("pct_before"),
        F.col("n_after").cast("bigint").alias("n_after"),
        q6(F.col("pct_after")).alias("pct_after"),
        "tv_distance",
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test (distributed exact ECDF)
# ---------------------------------------------------------------------------

_KS_CRIT_95 = 1.3581015157406195  # c(alpha) for alpha = 0.05

_KS_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), g AS (
        SELECT rev,
               SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1
        FROM pu GROUP BY rev
    ), cum AS (
        SELECT rev,
               SUM(c0) OVER (ORDER BY rev) AS k0,
               SUM(c1) OVER (ORDER BY rev) AS k1
        FROM g
    ), tot AS (
        SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM g
    ), d AS (
        SELECT MAX(ABS(k0 * tot.n1 - k1 * tot.n0)) AS dnum,
               MAX(tot.n0) AS n0, MAX(tot.n1) AS n1
        FROM cum, tot
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           FLOOR(dnum * 1.0 / (n0 * n1) * 1e6 + 0.5) / 1e6 AS ks_d,
           FLOOR({_KS_CRIT_95} * SQRT((n0 + n1) * 1.0 / (n0 * n1)) * 1e6 + 0.5) / 1e6
               AS ks_crit,
           dnum * 1.0 / (n0 * n1) > {_KS_CRIT_95} * SQRT((n0 + n1) * 1.0 / (n0 * n1))
               AS significant
    FROM d
"""


@query("stat_ks_test", oracle=_KS_SQL)
def stat_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test between the control and
    treatment distributions of per-user purchase revenue: the supremum
    ECDF gap D, the alpha=0.05 critical value
    c(alpha) * sqrt((n0+n1)/(n0*n1)), and the verdict — the
    distribution-level companion to ab_quantile_lift (QTE shows WHERE
    the shift is; KS says whether ANY distributional shift is
    significant), and the same statistic drift monitors run between
    data snapshots.

    Exactness: the ECDF comparison is pure integer arithmetic — the
    gap numerator |k0*n1 - k1*n0| is an exact BIGINT per distinct
    value, so the max is exact and only the final normalization
    divides. The global cumulative counts are computed with the
    window-free range-partition + triangle-offset recipe
    (functions/ranks.cumulative_offsets, run per variant column); the
    oracle spells them as plain window cumsums.

    Scale: one user-grain aggregate, one value-grain aggregate, one
    range shuffle; per-partition windows only (the plan guard passes
    without an allowlist entry)."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("rev"),
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "rev")
    g = pu.groupBy("rev").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("c1"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        g.repartitionByRange(n_parts, F.asc("rev"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    w = W.partitionBy("pid").orderBy(F.asc("rev")).rowsBetween(W.unboundedPreceding, 0)
    local = ranged.select(
        "rev",
        "pid",
        F.sum("c0").over(w).alias("l0"),
        F.sum("c1").over(w).alias("l1"),
    )
    cnts = ranged.groupBy("pid").agg(
        F.sum("c0").alias("c0"), F.sum("c1").alias("c1")
    )
    off0 = cumulative_offsets(cnts.select("pid", "c0"), cnt="c0").withColumnRenamed(
        "off", "o0"
    )
    off1 = cumulative_offsets(cnts.select("pid", "c1"), cnt="c1").withColumnRenamed(
        "off", "o1"
    )
    tot = cnts.agg(F.sum("c0").alias("n0"), F.sum("c1").alias("n1"))
    cum = (
        local.join(F.broadcast(off0), "pid")
        .join(F.broadcast(off1), "pid")
        .crossJoin(F.broadcast(tot))
        .select(
            ((F.col("l0") + F.col("o0")) * F.col("n1")
             - (F.col("l1") + F.col("o1")) * F.col("n0")).alias("gap"),
            "n0",
            "n1",
        )
    )
    d = cum.agg(
        F.max(F.abs(F.col("gap"))).alias("dnum"),
        F.max("n0").alias("n0"),
        F.max("n1").alias("n1"),
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    n0, n1, dnum = F.col("n0"), F.col("n1"), F.col("dnum")
    ks_d = dnum * 1.0 / (n0 * n1)
    crit = _KS_CRIT_95 * F.sqrt((n0 + n1) * 1.0 / (n0 * n1))
    return d.select(
        n0.cast("bigint").alias("n0"),
        n1.cast("bigint").alias("n1"),
        q6(ks_d).alias("ks_d"),
        q6(crit).alias("ks_crit"),
        (ks_d > crit).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence (contingency table)
# ---------------------------------------------------------------------------

_CHI2_SQL = f"""
    WITH cells AS (
        SELECT event_type, CAST(user_id % 2 AS INT) AS variant, COUNT(*) AS o
        FROM events GROUP BY 1, 2
    ), rows_m AS (
        SELECT event_type, SUM(o) AS rc FROM cells GROUP BY event_type
    ), cols_m AS (
        SELECT variant, SUM(o) AS cc FROM cells GROUP BY variant
    ), tot AS (
        SELECT SUM(o) AS n,
               COUNT(DISTINCT event_type) AS r,
               COUNT(DISTINCT variant) AS c
        FROM cells
    )
    SELECT CAST(tot.n AS BIGINT) AS n,
           CAST((tot.r - 1) * (tot.c - 1) AS BIGINT) AS dof,
           FLOOR({dsum_expr("(cells.o - rows_m.rc * cols_m.cc * 1.0 / tot.n) * (cells.o - rows_m.rc * cols_m.cc * 1.0 / tot.n) / (rows_m.rc * cols_m.cc * 1.0 / tot.n)")}
                 * 1e6 + 0.5) / 1e6 AS chi2,
           FLOOR(SQRT({dsum_expr("(cells.o - rows_m.rc * cols_m.cc * 1.0 / tot.n) * (cells.o - rows_m.rc * cols_m.cc * 1.0 / tot.n) / (rows_m.rc * cols_m.cc * 1.0 / tot.n)")}
                      / (tot.n * (CASE WHEN tot.r - 1 < tot.c - 1 THEN tot.r - 1 ELSE tot.c - 1 END)))
                 * 1e6 + 0.5) / 1e6 AS cramers_v
    FROM cells
    JOIN rows_m ON rows_m.event_type = cells.event_type
    JOIN cols_m ON cols_m.variant = cells.variant
    CROSS JOIN tot
    GROUP BY tot.n, tot.r, tot.c
"""


@query("stat_chi2_independence", oracle=_CHI2_SQL)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence over the event_type × variant
    contingency table: the chi² statistic sum((O-E)²/E) with expected
    counts from the marginals, degrees of freedom, and Cramér's V
    effect size sqrt(chi²/(N·min(r-1,c-1))) — the categorical
    association test behind guardrail checks like "did the experiment
    change the MIX of actions users take" (the multi-category
    generalization of ab_ztest_srm's 2-cell SRM check).

    Exactness: observed and marginal counts are exact integers; each
    cell's (O-E)²/E is one fixed IEEE tree over those integers and the
    per-cell terms go through the decimal contract before summing, so
    the statistic is bit-identical in both engines; half-up quantized.

    Scale: one contingency aggregate (|types|×|variants| cells),
    marginals and totals are cell-grain reductions broadcast back —
    nothing data-sized past the first shuffle."""
    ev = _t(spark, sf_dir, "events")["events"]
    cells = (
        ev.groupBy("event_type", (F.col("user_id") % 2).cast("int").alias("variant"))
        .agg(F.count("*").alias("o"))
        # the |types|x|variants| table feeds both marginals, the totals,
        # and the scored join — checkpoint so the fact scan runs once
        .transform(cut_lineage)
    )
    rows_m = cells.groupBy("event_type").agg(F.sum("o").alias("rc"))
    cols_m = cells.groupBy("variant").agg(F.sum("o").alias("cc"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("event_type").alias("r"),
        F.countDistinct("variant").alias("c"),
    )
    j = (
        cells.join(F.broadcast(rows_m), "event_type")
        .join(F.broadcast(cols_m), "variant")
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("rc") * F.col("cc") * 1.0 / F.col("n")
    term = (F.col("o") - e) * (F.col("o") - e) / e
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    mindim = F.when(
        F.col("r") - 1 < F.col("c") - 1, F.col("r") - 1
    ).otherwise(F.col("c") - 1)
    agg2 = j.groupBy("n", "r", "c").agg(dsum(term).alias("chi2_raw"))
    return agg2.select(
        F.col("n").cast("bigint").alias("n"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        q6(F.col("chi2_raw")).alias("chi2"),
        q6(F.sqrt(F.col("chi2_raw") / (F.col("n") * mindim))).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U test (exact tie-corrected rank sums)
# ---------------------------------------------------------------------------

_MWU_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), g AS (
        SELECT rev,
               SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1
        FROM pu GROUP BY rev
    ), cum AS (
        SELECT rev, c0, c1,
               SUM(c0 + c1) OVER (ORDER BY rev) - (c0 + c1) AS kprev
        FROM g
    ), agg AS (
        SELECT SUM(c0) AS n0, SUM(c1) AS n1,
               SUM(c1 * (2 * kprev + c0 + c1 + 1)) AS r1x2,
               SUM((c0 + c1) * (c0 + c1) * (c0 + c1) - (c0 + c1)) AS tie3
        FROM cum
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           FLOOR((r1x2 / 2.0 - n1 * (n1 + 1) / 2.0) * 1e4 + 0.5) / 1e4 AS u1,
           FLOOR((r1x2 / 2.0 - n1 * (n1 + 1) / 2.0 - n0 * n1 / 2.0)
                 / SQRT(n0 * n1 / 12.0 * ((n0 + n1 + 1)
                        - tie3 * 1.0 / ((n0 + n1) * (n0 + n1 - 1))))
                 * 1e6 + 0.5) / 1e6 AS z_score,
           ABS((r1x2 / 2.0 - n1 * (n1 + 1) / 2.0 - n0 * n1 / 2.0)
               / SQRT(n0 * n1 / 12.0 * ((n0 + n1 + 1)
                      - tie3 * 1.0 / ((n0 + n1) * (n0 + n1 - 1))))) > 1.959963984540054
               AS significant
    FROM agg
"""


@query("stat_mann_whitney", oracle=_MWU_SQL)
def stat_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test between control and
    treatment per-user purchase revenue: the rank-based location test
    that needs no normality assumption — the robust companion to
    ab_ztest_srm's parametric z-test (heavy-tailed revenue is exactly
    where rank tests earn their keep). Uses midranks for ties with the
    standard tie-corrected normal approximation.

    Exactness: doubled rank sums are pure BIGINT arithmetic over the
    value-grain contingency counts (2*R1 = sum c1*(2*kprev+c0+c1+1)
    keeps midranks integral), as is the tie-correction term
    sum(t^3 - t); the z-score is one fixed IEEE tree over those
    integers, half-up quantized. The oracle recomputes the identical
    integers with a window cumsum.

    Scale: the global cumulative count reuses the window-free
    range-partition + triangle-offset recipe (per-partition windows
    only); everything after the value-grain aggregate is a reduction."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("rev"),
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "rev")
    g = pu.groupBy("rev").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("c1"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        g.repartitionByRange(n_parts, F.asc("rev"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    w = W.partitionBy("pid").orderBy(F.asc("rev")).rowsBetween(W.unboundedPreceding, 0)
    t = F.col("c0") + F.col("c1")
    local = ranged.select(
        "rev",
        "pid",
        "c0",
        "c1",
        (F.sum(t).over(w) - t).alias("lprev"),
    )
    cnts = ranged.groupBy("pid").agg(F.sum(t).alias("ct"))
    offs = cumulative_offsets(cnts, cnt="ct")
    cum = local.join(F.broadcast(offs), "pid").select(
        "c0", "c1", (F.col("lprev") + F.col("off")).alias("kprev")
    )
    agg = cum.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum(
            F.col("c1") * (2 * F.col("kprev") + F.col("c0") + F.col("c1") + 1)
        ).alias("r1x2"),
        F.sum(t * t * t - t).alias("tie3"),
    )
    n0, n1, r1x2, tie3 = (F.col(c) for c in ("n0", "n1", "r1x2", "tie3"))
    u1 = r1x2 / 2.0 - n1 * (n1 + 1) / 2.0
    z = (u1 - n0 * n1 / 2.0) / F.sqrt(
        n0 * n1 / 12.0
        * ((n0 + n1 + 1) - tie3 * 1.0 / ((n0 + n1) * (n0 + n1 - 1)))
    )
    return agg.select(
        n0.cast("bigint").alias("n0"),
        n1.cast("bigint").alias("n1"),
        (F.floor(u1 * 1e4 + F.lit(0.5)) / 1e4).alias("u1"),
        (F.floor(z * 1e6 + F.lit(0.5)) / 1e6).alias("z_score"),
        (F.abs(z) > 1.959963984540054).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Deterministic randomization (relabeling) test
# ---------------------------------------------------------------------------

_RAND_B = 200

_RAND_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), obs AS (
        SELECT {dsum_expr('CASE WHEN variant = 1 THEN rev ELSE 0 END')}
                   / SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
               - {dsum_expr('CASE WHEN variant = 0 THEN rev ELSE 0 END')}
                   / SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS d_obs
        FROM pu
    ), rs AS (
        SELECT pu.rev, bs.b,
               CAST(((pu.user_id + bs.b * 131) * 9973 + 7919) % 1000003 % 2 AS INT) AS rv
        FROM pu CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {_RAND_B - 1})) AS b) bs
    ), perm AS (
        SELECT b,
               {dsum_expr('CASE WHEN rv = 1 THEN rev ELSE 0 END')}
                   / SUM(CASE WHEN rv = 1 THEN 1 ELSE 0 END)
               - {dsum_expr('CASE WHEN rv = 0 THEN rev ELSE 0 END')}
                   / SUM(CASE WHEN rv = 0 THEN 1 ELSE 0 END) AS d
        FROM rs GROUP BY b
    )
    SELECT FLOOR(obs.d_obs * 1e6 + 0.5) / 1e6 AS observed_diff,
           CAST(COUNT(*) AS BIGINT) AS n_resamples,
           CAST(SUM(CASE WHEN ABS(perm.d) >= ABS(obs.d_obs) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_as_extreme,
           FLOOR((SUM(CASE WHEN ABS(perm.d) >= ABS(obs.d_obs) THEN 1 ELSE 0 END) + 1) * 1.0
                 / (COUNT(*) + 1) * 1e6 + 0.5) / 1e6 AS p_value
    FROM perm, obs GROUP BY obs.d_obs
"""


@query("stat_randomization_test", oracle=_RAND_SQL)
def stat_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic randomization test for the treatment-control mean
    difference: 200 pseudo-random relabelings of users (portable
    integer hash of (user_id, resample) — the random-reassignment
    null), the observed difference's rank among them, and the
    add-one-smoothed p-value (b+1)/(B+1) — the assumption-free
    significance test that works for ANY statistic, at the cost the
    bootstrap already paid: one scan, an exploded resample axis, no
    shuffled data copies.

    Exactness: relabels are BIGINT hash arithmetic; per-resample group
    sums go through the decimal contract; each difference is one fixed
    IEEE tree; the comparison against |d_obs| is the same double
    compare in both engines, and the p-value is integer-ratio exact.

    Scale: user-grain aggregate, 200-way explode (generator, not a
    join), one (resample)-keyed aggregate with map-side combine, then
    a 200-row reduction against a 1-row broadcast."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("rev"),
        )
        # feeds the observed difference AND the 200-way relabel explode
        .transform(cut_lineage)
    )
    variant = (F.col("user_id") % 2).cast("int")
    mean_of = lambda cond: dsum(  # noqa: E731
        F.when(cond, F.col("rev")).otherwise(0.0)
    ) / F.sum(F.when(cond, 1).otherwise(0))
    obs = pu.select("user_id", "rev", variant.alias("variant")).agg(
        (mean_of(F.col("variant") == 1) - mean_of(F.col("variant") == 0)).alias(
            "d_obs"
        )
    )
    rs = pu.select(
        "user_id", "rev", F.explode(F.sequence(F.lit(0), F.lit(_RAND_B - 1))).alias("b")
    ).select(
        "rev",
        "b",
        (((F.col("user_id") + F.col("b") * 131) * 9973 + 7919) % 1000003 % 2)
        .cast("int")
        .alias("rv"),
    )
    perm = rs.groupBy("b").agg(
        (mean_of(F.col("rv") == 1) - mean_of(F.col("rv") == 0)).alias("d")
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    joined = perm.crossJoin(F.broadcast(obs))
    extreme = F.sum(
        F.when(F.abs(F.col("d")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
    )
    return joined.groupBy("d_obs").agg(
        q6(F.col("d_obs")).alias("observed_diff"),
        F.count("*").cast("bigint").alias("n_resamples"),
        extreme.cast("bigint").alias("n_as_extreme"),
        q6((extreme + 1) * 1.0 / (F.count("*") + 1)).alias("p_value"),
    ).drop("d_obs")


# ---------------------------------------------------------------------------
# Always-valid sequential test (mixture SPRT over daily looks)
# ---------------------------------------------------------------------------

_MSPRT_TAU2 = 100.0  # mixture variance (tau = 10, the plausible-effect scale)
_MSPRT_LN20 = 2.995732273553991  # ln(1/alpha) at alpha = 0.05

_MSPRT_SQL = f"""
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr("CASE WHEN user_id % 2 = 0 THEN value ELSE 0 END")} AS y0,
               {dsum_expr("CASE WHEN user_id % 2 = 1 THEN value ELSE 0 END")} AS y1
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), walk AS (
        SELECT day,
               ROW_NUMBER() OVER w AS t,
               CAST(ROUND(SUM(CAST(y0 AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS s0,
               CAST(ROUND(SUM(CAST(y0 * y0 AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS q0,
               CAST(ROUND(SUM(CAST(y1 AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS s1,
               CAST(ROUND(SUM(CAST(y1 * y1 AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE) AS q1
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), looks AS (
        SELECT day, t,
               s1 / t - s0 / t AS delta,
               (q0 / t - (s0 / t) * (s0 / t)) / t
               + (q1 / t - (s1 / t) * (s1 / t)) / t AS v
        FROM walk WHERE t >= 2
    ), scored AS (
        SELECT day, t, delta, v,
               0.5 * LN(v / (v + {_MSPRT_TAU2}))
               + delta * delta * {_MSPRT_TAU2} / (2 * v * (v + {_MSPRT_TAU2}))
                   AS ll
        FROM looks WHERE v > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_looks,
           FLOOR(MAX_BY(delta, t) * 1e6 + 0.5) / 1e6 AS final_delta,
           FLOOR(MAX(ll) * 1e6 + 0.5) / 1e6 AS max_log_lambda,
           FLOOR(LEAST(1.0, EXP(-MAX(ll))) * 1e6 + 0.5) / 1e6 AS always_valid_p,
           MAX(ll) > {_MSPRT_LN20} AS significant,
           MIN(CASE WHEN ll > {_MSPRT_LN20} THEN day END) AS first_significant_day
    FROM scored
"""


@query("ab_sequential_msprt", oracle=_MSPRT_SQL)
def ab_sequential_msprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential test (mixture SPRT, Johari et al.): at
    every daily look, the cumulative treatment-control difference of
    daily purchase revenue is scored with the normal-mixture likelihood
    ratio log Λ_t = ½ln(V/(V+τ²)) + δ²τ²/(2V(V+τ²)); the always-valid
    p-value is min_t 1/Λ_t = exp(-max_t log Λ) — the test a platform
    can PEEK at every day without inflating false positives, which the
    fixed-horizon ab_ztest_srm readout never permits. Reports the
    final effect, the strongest look, the always-valid p, and the
    first day the α=0.05 boundary was crossed.

    Exactness: cumulative sums and sums-of-squares are ordered decimal
    prefix sums rounded at 4dp before double arithmetic (the
    ts_cusum_changepoint walk contract); LN/EXP follow the catalog's
    quantize-at-6 transcendental precedent (fn_math, TF-IDF, entropy);
    degenerate looks (t<2 or zero variance) are filtered identically
    in both engines.

    Scale: the look walk runs on the DAY grain — one row per calendar
    day, bounded by time, not data (the ts_cumulative_users argument;
    allowlisted single-partition window with that documented bound).
    Everything upstream is one partial+final daily aggregate; the
    final row is a 1-pass reduction over looks."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            dsum(
                F.when(F.col("user_id") % 2 == 0, F.col("value")).otherwise(0.0)
            ).alias("y0"),
            dsum(
                F.when(F.col("user_id") % 2 == 1, F.col("value")).otherwise(0.0)
            ).alias("y1"),
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    dprefix = lambda c: F.round(  # noqa: E731
        F.sum(c.cast("decimal(38,10)")).over(w), 4
    ).cast("double")
    walk = daily.select(
        "day",
        F.row_number().over(W.orderBy("day")).alias("t"),
        dprefix(F.col("y0")).alias("s0"),
        dprefix(F.col("y0") * F.col("y0")).alias("q0"),
        dprefix(F.col("y1")).alias("s1"),
        dprefix(F.col("y1") * F.col("y1")).alias("q1"),
    )
    t, s0, q0, s1, q1 = (F.col(c) for c in ("t", "s0", "q0", "s1", "q1"))
    looks = walk.filter(t >= 2).select(
        "day",
        "t",
        (s1 / t - s0 / t).alias("delta"),
        (
            (q0 / t - (s0 / t) * (s0 / t)) / t
            + (q1 / t - (s1 / t) * (s1 / t)) / t
        ).alias("v"),
    )
    v, delta = F.col("v"), F.col("delta")
    tau2 = _MSPRT_TAU2
    scored = looks.filter(v > 0).select(
        "day",
        "t",
        "delta",
        (
            0.5 * F.log(v / (v + tau2))
            + delta * delta * tau2 / (2 * v * (v + tau2))
        ).alias("ll"),
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    ll = F.col("ll")
    return scored.agg(
        F.count("*").cast("bigint").alias("n_looks"),
        q6(F.max_by("delta", "t")).alias("final_delta"),
        q6(F.max(ll)).alias("max_log_lambda"),
        q6(F.least(F.lit(1.0), F.exp(-F.max(ll)))).alias("always_valid_p"),
        (F.max(ll) > _MSPRT_LN20).alias("significant"),
        F.min(F.when(ll > _MSPRT_LN20, F.col("day"))).alias("first_significant_day"),
    )


# ---------------------------------------------------------------------------
# AUC of a behavioral score (exact midrank formulation)
# ---------------------------------------------------------------------------

_AUC_SQL = """
    WITH pu AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS score,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ), g AS (
        SELECT score,
               SUM(1 - label) AS c0,
               SUM(label) AS c1
        FROM pu GROUP BY score
    ), cum AS (
        SELECT score, c0, c1,
               SUM(c0 + c1) OVER (ORDER BY score) - (c0 + c1) AS kprev
        FROM g
    ), agg AS (
        SELECT SUM(c0) AS n0, SUM(c1) AS n1,
               SUM(c1 * (2 * kprev + c0 + c1 + 1)) AS r1x2
        FROM cum
    )
    SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
           CASE WHEN n0 * n1 = 0 THEN 0.5
                ELSE FLOOR((r1x2 - n1 * (n1 + 1)) * 1.0 / (2 * n0 * n1) * 1e6 + 0.5)
                     / 1e6 END AS auc,
           CASE WHEN n0 * n1 = 0 THEN 0.0
                ELSE FLOOR(((r1x2 - n1 * (n1 + 1)) * 1.0 / (n0 * n1) - 1) * 1e6 + 0.5)
                     / 1e6 END AS gini_coef
    FROM agg
"""


@query("ml_auc_score", oracle=_AUC_SQL)
def ml_auc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC of a behavioral score: how well a user's click count
    ranks high-value purchasers (the ab_experiment_report conversion
    definition) above everyone else, via the exact midrank
    identity AUC = (R1 - n1(n1+1)/2) / (n0*n1) — ties get half credit,
    which IS the trapezoidal ROC area. Plus the Gini coefficient
    2*AUC - 1. The model-evaluation shape for ANY score column
    (propensity models, quality classifiers, rankers) — swap the score
    expression and the machinery holds.

    Exactness: the doubled positive-rank sum is pure BIGINT over the
    score-grain contingency counts (the stat_mann_whitney identity),
    so AUC is an exact integer ratio with one final division, half-up
    quantized at 1e-6.

    Scale: user-grain aggregate, score-grain aggregate (distinct
    integer click counts — tiny), then the window-free range-partition
    + triangle-offset cumulative recipe and a 1-row reduction."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1
            ).otherwise(0)
        ).alias("label"),
    )
    g = pu.groupBy("score").agg(
        F.sum(1 - F.col("label")).alias("c0"),
        F.sum("label").alias("c1"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        g.repartitionByRange(n_parts, F.asc("score"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    w = W.partitionBy("pid").orderBy(F.asc("score")).rowsBetween(
        W.unboundedPreceding, 0
    )
    t = F.col("c0") + F.col("c1")
    local = ranged.select(
        "score", "pid", "c0", "c1", (F.sum(t).over(w) - t).alias("lprev")
    )
    cnts = ranged.groupBy("pid").agg(F.sum(t).alias("ct"))
    offs = cumulative_offsets(cnts, cnt="ct")
    cum = local.join(F.broadcast(offs), "pid").select(
        "c0", "c1", (F.col("lprev") + F.col("off")).alias("kprev")
    )
    agg = cum.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum(
            F.col("c1") * (2 * F.col("kprev") + F.col("c0") + F.col("c1") + 1)
        ).alias("r1x2"),
    )
    n0, n1, r1x2 = (F.col(c) for c in ("n0", "n1", "r1x2"))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    degenerate = n0 * n1 == 0
    return agg.select(
        n1.cast("bigint").alias("n_pos"),
        n0.cast("bigint").alias("n_neg"),
        F.when(degenerate, F.lit(0.5))
        .otherwise(q6((r1x2 - n1 * (n1 + 1)) * 1.0 / (2 * n0 * n1)))
        .alias("auc"),
        F.when(degenerate, F.lit(0.0))
        .otherwise(q6((r1x2 - n1 * (n1 + 1)) * 1.0 / (n0 * n1) - 1))
        .alias("gini_coef"),
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test
# ---------------------------------------------------------------------------

_WELCH_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), v AS (
        SELECT variant, COUNT(*) AS n,
               {dsum_expr('rev')} AS s, {dsum_expr('rev * rev')} AS q
        FROM pu GROUP BY variant
    ), w AS (
        SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
               MAX(CASE WHEN variant = 0 THEN s END) AS s0,
               MAX(CASE WHEN variant = 0 THEN q END) AS q0,
               MAX(CASE WHEN variant = 1 THEN n END) AS n1,
               MAX(CASE WHEN variant = 1 THEN s END) AS s1,
               MAX(CASE WHEN variant = 1 THEN q END) AS q1
        FROM v
    ), st AS (
        SELECT n0, n1,
               s1 / n1 - s0 / n0 AS diff,
               (q0 / n0 - (s0 / n0) * (s0 / n0)) * n0 / (n0 - 1) / n0 AS se0sq,
               (q1 / n1 - (s1 / n1) * (s1 / n1)) * n1 / (n1 - 1) / n1 AS se1sq
        FROM w
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           FLOOR(diff * 1e6 + 0.5) / 1e6 AS mean_diff,
           CASE WHEN se0sq + se1sq = 0 THEN 0.0
                ELSE FLOOR(diff / SQRT(se0sq + se1sq) * 1e6 + 0.5) / 1e6 END AS t_stat,
           CASE WHEN se0sq + se1sq = 0 THEN 0.0
                ELSE FLOOR((se0sq + se1sq) * (se0sq + se1sq)
                           / (se0sq * se0sq / (n0 - 1) + se1sq * se1sq / (n1 - 1))
                           * 1e4 + 0.5) / 1e4 END AS welch_df,
           CASE WHEN se0sq + se1sq = 0 THEN FALSE
                ELSE ABS(diff / SQRT(se0sq + se1sq)) > 1.959963984540054 END
               AS significant
    FROM st
"""


@query("ab_welch_ttest", oracle=_WELCH_SQL)
def ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on per-user purchase revenue
    between variants: the mean difference, the t statistic with
    separate per-variant variance estimates, and the
    Welch-Satterthwaite effective degrees of freedom — the test to
    reach for when treatment changes the VARIANCE too (equal-variance
    pooled tests understate error exactly then). Large-sample normal
    cutoff at 1.96 (dof in the thousands at any real scale).

    Exactness: per-variant moments (n, sum, sum-of-squares) go
    through the decimal contract; sample variances use the n/(n-1)
    Bessel spelling identically; t and dof are fixed IEEE trees over
    exact scalars, half-up quantized; the zero-variance degenerate is
    defined identically in both engines.

    Scale: one user-grain aggregate, a 2-row variant reduction, and a
    1-row pivot — the ab_ztest_srm shape with second moments."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("rev"),
    ).select((F.col("user_id") % 2).cast("int").alias("variant"), "rev")
    v = pu.groupBy("variant").agg(
        F.count("*").alias("n"),
        dsum("rev").alias("s"),
        dsum(F.col("rev") * F.col("rev")).alias("q"),
    )
    cell = lambda vv, c: F.max(F.when(F.col("variant") == vv, F.col(c)))  # noqa: E731
    w = v.agg(
        cell(0, "n").alias("n0"),
        cell(0, "s").alias("s0"),
        cell(0, "q").alias("q0"),
        cell(1, "n").alias("n1"),
        cell(1, "s").alias("s1"),
        cell(1, "q").alias("q1"),
    )
    n0, s0, q0 = F.col("n0"), F.col("s0"), F.col("q0")
    n1, s1, q1 = F.col("n1"), F.col("s1"), F.col("q1")
    st = w.select(
        "n0",
        "n1",
        (s1 / n1 - s0 / n0).alias("diff"),
        ((q0 / n0 - (s0 / n0) * (s0 / n0)) * n0 / (n0 - 1) / n0).alias("se0sq"),
        ((q1 / n1 - (s1 / n1) * (s1 / n1)) * n1 / (n1 - 1) / n1).alias("se1sq"),
    )
    diff, a, b = F.col("diff"), F.col("se0sq"), F.col("se1sq")
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    degenerate = a + b == 0
    t = diff / F.sqrt(a + b)
    df = (a + b) * (a + b) / (
        a * a / (F.col("n0") - 1) + b * b / (F.col("n1") - 1)
    )
    return st.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        q6(diff).alias("mean_diff"),
        F.when(degenerate, F.lit(0.0)).otherwise(q6(t)).alias("t_stat"),
        F.when(degenerate, F.lit(0.0))
        .otherwise(F.floor(df * 1e4 + F.lit(0.5)) / 1e4)
        .alias("welch_df"),
        F.when(degenerate, F.lit(False))
        .otherwise(F.abs(t) > 1.959963984540054)
        .alias("significant"),
    )


# ---------------------------------------------------------------------------
# Retention decay rate and half-life (log-linear fit)
# ---------------------------------------------------------------------------

_RHL_WK_US = 7 * 86400 * 1000000  # one week in microseconds
_RHL_K = 3  # fit over offsets 1..3, cohorts observable that long

_RHL_SQL = f"""
    WITH weekly AS (
        SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS wk
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(wk) AS first_wk FROM weekly GROUP BY user_id
    ), mx AS (
        SELECT MAX(wk) AS maxw FROM weekly
    ), elig AS (
        SELECT f.user_id, f.first_wk
        FROM firsts f, mx
        WHERE (EPOCH_US(mx.maxw) - EPOCH_US(f.first_wk)) // {_RHL_WK_US} >= {_RHL_K}
    ), n AS (
        SELECT COUNT(*) AS n_users FROM elig
    ), ret AS (
        SELECT (EPOCH_US(w.wk) - EPOCH_US(e.first_wk)) // {_RHL_WK_US} AS k,
               COUNT(DISTINCT w.user_id) AS retained
        FROM weekly w JOIN elig e ON e.user_id = w.user_id
        WHERE (EPOCH_US(w.wk) - EPOCH_US(e.first_wk)) // {_RHL_WK_US}
              BETWEEN 1 AND {_RHL_K}
        GROUP BY 1
    ), pts AS (
        SELECT k, retained, LN(retained * 1.0 / n.n_users) AS y, n.n_users
        FROM ret, n WHERE retained > 0
    ), fit AS (
        SELECT MAX(n_users) AS n_users, COUNT(*) AS npts,
               SUM(k) AS sx, SUM(k * k) AS sxx,
               {dsum_expr('y')} AS sy, {dsum_expr('k * y')} AS sxy
        FROM pts
    )
    SELECT CAST(n_users AS BIGINT) AS n_users, CAST(npts AS BIGINT) AS n_offsets,
           FLOOR((npts * sxy - sx * sy) / (npts * sxx - sx * sx) * 1e6 + 0.5) / 1e6
               AS weekly_decay_rate,
           CASE WHEN (npts * sxy - sx * sy) / (npts * sxx - sx * sx) >= 0 THEN 0.0
                ELSE FLOOR(-0.6931471805599453
                           / ((npts * sxy - sx * sy) / (npts * sxx - sx * sx))
                           * 1e4 + 0.5) / 1e4 END AS half_life_weeks
    FROM fit
"""


@query("ts_retention_half_life", oracle=_RHL_SQL)
def ts_retention_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: fit ln(retention_k) = a + b·k over weekly
    offsets 1..3 (pooled across cohorts old enough to observe all
    three — the censoring-safe window; widen with the fixture span) and report the weekly decay rate b and
    the half-life -ln2/b — the single number that compresses
    ts_cohort_retention's triangle into "how many weeks until half the
    users are gone", and the input LTV projections discount by.
    Non-decaying fits (b >= 0) report half-life 0 by contract.

    Exactness: retained counts and the k regressors are exact
    integers; each ln(ratio) is one fixed transcendental op (the
    catalog's quantize-at-6 LN precedent); the regression moment sums
    go through the decimal contract; slope and half-life are fixed
    IEEE trees, half-up quantized.

    Scale: (user, week) grain distinct, user-grain firsts, a 1-row max
    broadcast, one offset-grain aggregate (6 rows) and a 1-row fit —
    the heavy lifting is a single distinct over the activity grain."""
    ev = _t(spark, sf_dir, "events")["events"]
    weekly = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    firsts = weekly.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    mx = weekly.agg(F.max("wk").alias("maxw"))
    wk_us = F.lit(_RHL_WK_US)
    elig = (
        firsts.crossJoin(F.broadcast(mx))
        .filter(
            F.expr(f"(unix_micros(maxw) - unix_micros(first_wk)) div {_RHL_WK_US}")
            >= _RHL_K
        )
        .select("user_id", "first_wk")
    )
    n = elig.agg(F.count("*").alias("n_users"))
    k = F.expr(f"(unix_micros(wk) - unix_micros(first_wk)) div {_RHL_WK_US}")
    ret = (
        weekly.join(elig, "user_id")
        .select(k.alias("k"), "user_id")
        .filter((F.col("k") >= 1) & (F.col("k") <= _RHL_K))
        .groupBy("k")
        .agg(F.countDistinct("user_id").alias("retained"))
    )
    pts = (
        ret.crossJoin(F.broadcast(n))
        .filter(F.col("retained") > 0)
        .select(
            "k",
            "n_users",
            F.log(F.col("retained") * 1.0 / F.col("n_users")).alias("y"),
        )
    )
    fit = pts.agg(
        F.max("n_users").alias("n_users"),
        F.count("*").alias("npts"),
        F.sum("k").alias("sx"),
        F.sum(F.col("k") * F.col("k")).alias("sxx"),
        dsum("y").alias("sy"),
        dsum(F.col("k") * F.col("y")).alias("sxy"),
    )
    npts, sx, sxx, sy, sxy = (F.col(c) for c in ("npts", "sx", "sxx", "sy", "sxy"))
    slope = (npts * sxy - sx * sy) / (npts * sxx - sx * sx)
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return fit.select(
        F.col("n_users").cast("bigint").alias("n_users"),
        npts.cast("bigint").alias("n_offsets"),
        q6(slope).alias("weekly_decay_rate"),
        F.when(slope >= 0, F.lit(0.0))
        .otherwise(F.floor(-0.6931471805599453 / slope * 1e4 + F.lit(0.5)) / 1e4)
        .alias("half_life_weeks"),
    )


# ---------------------------------------------------------------------------
# Mutual information feature screening
# ---------------------------------------------------------------------------

_MI_SQL = f"""
    WITH pu AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ), feat AS (
        SELECT e.user_id, 'event_mix' AS feature, e.event_type AS bucket, pu.label
        FROM events e JOIN pu ON pu.user_id = e.user_id
        UNION ALL
        SELECT e.user_id, 'hour_band' AS feature,
               CASE WHEN EXTRACT(HOUR FROM e.ts) < 6 THEN 'night'
                    WHEN EXTRACT(HOUR FROM e.ts) < 12 THEN 'morning'
                    WHEN EXTRACT(HOUR FROM e.ts) < 18 THEN 'afternoon'
                    ELSE 'evening' END AS bucket, pu.label
        FROM events e JOIN pu ON pu.user_id = e.user_id
    ), cells AS (
        SELECT feature, bucket, label, COUNT(*) AS o
        FROM feat GROUP BY 1, 2, 3
    ), bm AS (
        SELECT feature, bucket, SUM(o) AS ob FROM cells GROUP BY 1, 2
    ), lm AS (
        SELECT feature, label, SUM(o) AS ol FROM cells GROUP BY 1, 2
    ), tot AS (
        SELECT feature, SUM(o) AS n FROM cells GROUP BY 1
    )
    SELECT c.feature,
           FLOOR({dsum_expr("c.o * 1.0 / t.n * LN(c.o * 1.0 * t.n / (b.ob * 1.0 * l.ol))")}
                 * 1e6 + 0.5) / 1e6 AS mutual_info_nats,
           CAST(MAX(t.n) AS BIGINT) AS n_rows
    FROM cells c
    JOIN bm b ON b.feature = c.feature AND b.bucket = c.bucket
    JOIN lm l ON l.feature = c.feature AND l.label = c.label
    JOIN tot t ON t.feature = c.feature
    GROUP BY c.feature
"""


@query("ml_mutual_information", oracle=_MI_SQL)
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information feature screening: I(feature; label) in nats
    for two candidate event features (the event-type mix and the
    time-of-day band) against the high-value-purchaser label — the
    model-free feature-selection statistic that catches nonlinear
    dependence corr() misses, computed from exact contingency counts
    via I = sum p(x,y)·ln(p(x,y)/(p(x)p(y))). Zero-count cells
    contribute nothing by construction (they never appear in the cell
    table).

    Exactness: all cell/marginal/total counts are exact integers; each
    cell term is one fixed tree with a single LN (the catalog's
    quantize-at-6 transcendental precedent) and the per-feature term
    sum goes through the decimal contract.

    Scale: one label aggregate at user grain, one fact-stream pass per
    feature (stacked in a single union), then cell-grain joins —
    |buckets|×2 cells per feature, marginals broadcast."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1
            ).otherwise(0)
        ).alias("label")
    )
    j = ev.join(pu, "user_id")
    hour = F.hour(F.col("ts"))
    band = (
        F.when(hour < 6, "night")
        .when(hour < 12, "morning")
        .when(hour < 18, "afternoon")
        .otherwise("evening")
    )
    feat = j.select(
        F.lit("event_mix").alias("feature"),
        F.col("event_type").alias("bucket"),
        "label",
    ).unionAll(j.select(F.lit("hour_band").alias("feature"), band.alias("bucket"), "label"))
    cells = (
        feat.groupBy("feature", "bucket", "label")
        .agg(F.count("*").alias("o"))
        # feeds three marginal reductions and the scored join
        .transform(cut_lineage)
    )
    bm = cells.groupBy("feature", "bucket").agg(F.sum("o").alias("ob"))
    lm = cells.groupBy("feature", "label").agg(F.sum("o").alias("ol"))
    tot = cells.groupBy("feature").agg(F.sum("o").alias("n"))
    scored = (
        cells.join(bm, ["feature", "bucket"])
        .join(lm, ["feature", "label"])
        .join(F.broadcast(tot), "feature")
    )
    term = (
        F.col("o")
        * 1.0
        / F.col("n")
        * F.log(F.col("o") * 1.0 * F.col("n") / (F.col("ob") * 1.0 * F.col("ol")))
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return scored.groupBy("feature").agg(
        q6(dsum(term)).alias("mutual_info_nats"),
        F.max("n").cast("bigint").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Zipf exponent of the corpus vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOPR = 200  # fit over the top-R ranks (the power-law regime)

def _zipf_sql_fixed() -> str:
    # correlation needs the y second moment too — regenerate the SQL
    # with it included (kept out of the f-string above for clarity)
    return f"""
    WITH words AS (
        SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS w
        FROM documents WHERE n_chars > 0
    ), vocab AS (
        SELECT w, COUNT(*) AS f FROM words WHERE w <> '' GROUP BY w
    ), ranked AS (
        SELECT f, w, ROW_NUMBER() OVER (ORDER BY f DESC, w ASC) AS r
        FROM vocab
    ), pts AS (
        SELECT LN(r * 1.0) AS x, LN(f * 1.0) AS y
        FROM ranked WHERE r <= {_ZIPF_TOPR}
    ), fit AS (
        SELECT COUNT(*) AS npts,
               {dsum_expr('x')} AS sx, {dsum_expr('x * x')} AS sxx,
               {dsum_expr('y')} AS sy, {dsum_expr('x * y')} AS sxy,
               {dsum_expr('y * y')} AS syy
        FROM pts
    )
    SELECT CAST(npts AS BIGINT) AS n_ranks,
           FLOOR(-((npts * sxy - sx * sy) / (npts * sxx - sx * sx)) * 1e6 + 0.5) / 1e6
               AS zipf_exponent,
           FLOOR((npts * sxy - sx * sy)
                 / SQRT((npts * sxx - sx * sx) * (npts * syy - sy * sy))
                 * 1e6 + 0.5) / 1e6 AS fit_corr
    FROM fit
"""


@query("text_zipf_exponent", oracle=_zipf_sql_fixed())
def text_zipf_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus vocabulary: the log-log slope of
    term frequency vs frequency rank over the top-200 ranks, with the
    fit correlation — natural-language corpora sit near exponent 1
    with |corr| ≈ 1, so a drifting exponent or a broken fit is a fast
    corpus-health screen (template spam flattens the curve; truncated
    vocabularies steepen it).

    Exactness: term frequencies are exact; the global frequency rank
    uses a (f desc, w asc) total order; each log point is one LN op
    (quantize-at-6 precedent); regression moments go through the
    decimal contract; slope and correlation are fixed IEEE trees.

    Scale: one token explode + vocab aggregate; the top-R rank is a
    TakeOrdered (R = 200 rows to one task, bounded by the constant,
    not the vocabulary); the fit is a 200-row reduction."""
    d = _t(spark, sf_dir, "documents")["documents"]
    words = (
        d.filter(F.col("n_chars") > 0)
        .select(F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
    )
    vocab = words.groupBy("w").agg(F.count("*").alias("f"))
    top = vocab.orderBy(F.desc("f"), F.asc("w")).limit(_ZIPF_TOPR)
    # rank within the bounded top-R slice (constant-size single task)
    wr = W.orderBy(F.desc("f"), F.asc("w"))
    pts = top.select(
        F.log(F.row_number().over(wr) * 1.0).alias("x"),
        F.log(F.col("f") * 1.0).alias("y"),
    )
    fit = pts.agg(
        F.count("*").alias("npts"),
        dsum("x").alias("sx"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    npts, sx, sxx, sy, sxy, syy = (
        F.col(c) for c in ("npts", "sx", "sxx", "sy", "sxy", "syy")
    )
    slope = (npts * sxy - sx * sy) / (npts * sxx - sx * sx)
    corr = (npts * sxy - sx * sy) / F.sqrt(
        (npts * sxx - sx * sx) * (npts * syy - sy * sy)
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return fit.select(
        npts.cast("bigint").alias("n_ranks"),
        q6(-slope).alias("zipf_exponent"),
        q6(corr).alias("fit_corr"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-supply graph
# ---------------------------------------------------------------------------


def _assort_sql() -> str:
    from es_analytics_spark.queries_sql4 import _TRI_CAP, _TRI_STRIDE

    return f"""
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
    ), pairs AS (
        SELECT du.d AS x, dv.d AS y
        FROM edges e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
        UNION ALL
        SELECT dv.d AS x, du.d AS y
        FROM edges e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ), m AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM pairs
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                ELSE FLOOR((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
                           / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * 1e6 + 0.5) / 1e6 END AS assortativity
    FROM m
"""


@query("graph_assortativity", oracle=_assort_sql())
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the supplier co-supply graph: the
    Pearson correlation of the degrees at the two ends of every edge
    (symmetrized, so x- and y-marginals coincide and
    r = (n·Sxy - Sx²)/(n·Sxx - Sx²)) — positive means hubs link to
    hubs (social-network-like), negative means hubs link to leaves
    (infrastructure-like); the one-number topology screen read next to
    graph_triangle_count's clustering coefficient.

    Exactness: degrees and all moment sums are exact BIGINTs over the
    doubled edge-endpoint list; r is one fixed double expression with
    the zero-variance degenerate defined identically; half-up
    quantized at 1e-6.

    Scale: reuses the checkpointed capped co-supply edge list; degrees
    are node-sized; the pair frame is two edge-keyed hash joins and
    one 1-row moment reduction."""
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    edges = _co_supply_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        # consumed by both endpoint joins — node-sized
        .transform(cut_lineage)
    )
    du = deg.withColumnRenamed("node", "u").withColumnRenamed("d", "dx")
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dy")
    ed = edges.join(du, "u").join(dv, "v")
    # symmetrized moments in ONE pass over the edge-degree join: the
    # doubled pair list {(x,y)}∪{(y,x)} has n = 2m, Sx = Σ(dx+dy),
    # Sxx = Σ(dx²+dy²), Sxy = 2Σ(dx·dy) — identical integers to the
    # oracle's UNION ALL, without running the joins twice
    dx, dy = F.col("dx"), F.col("dy")
    m = ed.agg(
        (2 * F.count("*")).alias("n"),
        F.sum(dx + dy).alias("sx"),
        F.sum(dx * dx + dy * dy).alias("sxx"),
        (2 * F.sum(dx * dy)).alias("sxy"),
    )
    n, sx, sxx, sxy = (F.col(c) for c in ("n", "sx", "sxx", "sxy"))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    r = (n.cast("double") * sxy - sx.cast("double") * sx) / (
        n.cast("double") * sxx - sx.cast("double") * sx
    )
    return m.select(
        F.expr("n div 2").cast("bigint").alias("n_edges"),
        F.when(n * sxx - sx * sx == 0, F.lit(0.0)).otherwise(q6(r)).alias(
            "assortativity"
        ),
    )


# ---------------------------------------------------------------------------
# Behavioral burstiness of inter-event times
# ---------------------------------------------------------------------------

_BURST_SQL = f"""
    WITH seq AS (
        SELECT user_id, EPOCH_US(ts) AS t,
               LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS pt
        FROM events
    ), gaps AS (
        SELECT user_id, (t - pt) / 1000000.0 AS g
        FROM seq WHERE pt IS NOT NULL
    ), per_user AS (
        SELECT user_id, COUNT(*) AS k,
               {dsum_expr('g')} AS sg, {dsum_expr('g * g')} AS sgg
        FROM gaps GROUP BY user_id HAVING COUNT(*) >= 3
    ), scored AS (
        SELECT user_id,
               (SQRT(sgg / k - (sg / k) * (sg / k)) - sg / k)
               / (SQRT(sgg / k - (sg / k) * (sg / k)) + sg / k) AS b
        FROM per_user
        WHERE SQRT(sgg / k - (sg / k) * (sg / k)) + sg / k > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           FLOOR({dsum_expr('b')} / COUNT(*) * 1e6 + 0.5) / 1e6 AS mean_burstiness,
           FLOOR(QUANTILE_CONT(b, 0.50) * 1e6 + 0.5) / 1e6 AS p50_burstiness
    FROM scored
"""


@query("ts_burstiness", oracle=_BURST_SQL)
def ts_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness of user activity (Goh-Barabási B = (σ-μ)/(σ+μ) over
    each user's inter-event gaps, users with ≥3 gaps): B → +1 for
    bursty humans, 0 for a Poisson process, → -1 for periodic bots —
    the behavioral-signature screen that separates organic activity
    from scripted traffic, reported as the mean and median over users.

    Exactness: gaps are exact integer microsecond differences divided
    once by a constant; per-user moment sums go through the decimal
    contract; each B is a fixed IEEE tree; the mean goes through the
    decimal contract again and the median is the shared R-7
    interpolation.

    Scale: one user-partitioned lag window, one user-grain moment
    aggregate, one global reduction — no global windows, no
    collects."""
    ev = _t(spark, sf_dir, "events")["events"]
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    seq = ev.select("user_id", t.alias("t"), F.lag(t).over(w).alias("pt"))
    gaps = seq.filter(F.col("pt").isNotNull()).select(
        "user_id", ((F.col("t") - F.col("pt")) / 1000000.0).alias("g")
    )
    per_user = (
        gaps.groupBy("user_id")
        .agg(
            F.count("*").alias("k"),
            dsum("g").alias("sg"),
            dsum(F.col("g") * F.col("g")).alias("sgg"),
        )
        .filter(F.col("k") >= 3)
    )
    k, sg, sgg = F.col("k"), F.col("sg"), F.col("sgg")
    mu = sg / k
    sigma = F.sqrt(sgg / k - mu * mu)
    scored = per_user.filter(sigma + mu > 0).select(
        ((sigma - mu) / (sigma + mu)).alias("b")
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return scored.agg(
        F.count("*").cast("bigint").alias("n_users"),
        q6(dsum("b") / F.count("*")).alias("mean_burstiness"),
        q6(F.expr("percentile(b, 0.50D)")).alias("p50_burstiness"),
    )


# ---------------------------------------------------------------------------
# Novelty-effect decay: treatment-effect trend across weeks
# ---------------------------------------------------------------------------

_NOVEL_SQL = f"""
    WITH wk AS (
        SELECT CAST(user_id % 2 AS INT) AS variant,
               CAST(DATE_TRUNC('week', ts) AS TIMESTAMP) AS week,
               user_id, {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY 1, 2, 3
    ), cell AS (
        SELECT week, variant, COUNT(*) AS n, {dsum_expr('rev')} AS s
        FROM wk GROUP BY 1, 2
    ), wide AS (
        SELECT week,
               MAX(CASE WHEN variant = 1 THEN s END) / MAX(CASE WHEN variant = 1 THEN n END)
               - MAX(CASE WHEN variant = 0 THEN s END) / MAX(CASE WHEN variant = 0 THEN n END)
                   AS delta
        FROM cell GROUP BY week
        HAVING MAX(CASE WHEN variant = 0 THEN n END) IS NOT NULL
           AND MAX(CASE WHEN variant = 1 THEN n END) IS NOT NULL
    ), idx AS (
        SELECT delta, ROW_NUMBER() OVER (ORDER BY week) AS t FROM wide
    ), fit AS (
        SELECT COUNT(*) AS npts, SUM(t) AS sx, SUM(t * t) AS sxx,
               {dsum_expr('delta')} AS sy, {dsum_expr('t * delta')} AS sxy
        FROM idx
    )
    SELECT CAST(npts AS BIGINT) AS n_weeks,
           FLOOR(sy / npts * 1e6 + 0.5) / 1e6 AS mean_weekly_effect,
           CASE WHEN npts * sxx - sx * sx = 0 THEN 0.0
                ELSE FLOOR((npts * sxy - sx * sy)
                           / (npts * sxx - sx * sx) * 1e6 + 0.5) / 1e6 END
               AS effect_trend_per_week,
           CASE WHEN npts * sxx - sx * sx = 0 THEN FALSE
                ELSE (npts * sxy - sx * sy) / (npts * sxx - sx * sx)
                     < -0.05 * ABS(sy / npts) END AS novelty_decay_flag
    FROM fit
"""


@query("ab_novelty_decay", oracle=_NOVEL_SQL)
def ab_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty-effect detector: the weekly treatment-control difference
    of per-user purchase revenue, and the linear trend of that effect
    across experiment weeks — a significantly negative trend relative
    to the mean effect flags a NOVELTY effect (users react to newness,
    not value), the classic reason a 'winning' experiment decays after
    ship. Flag threshold: trend < -5% of |mean effect| per week.

    Exactness: (user, week) revenue and the weekly cell sums go
    through the decimal contract; the week index regressor is an exact
    integer ROW_NUMBER over the week order; slope and flag are fixed
    IEEE trees, half-up quantized.

    Scale: one (user, week) grain aggregate, a |weeks|×2 cell
    reduction, and a |weeks|-row fit — the week-index window runs on
    the calendar-bounded weekly frame (the ts_cumulative_users
    bound)."""
    ev = _t(spark, sf_dir, "events")["events"]
    wk = ev.groupBy(
        (F.col("user_id") % 2).cast("int").alias("variant"),
        F.date_trunc("week", F.col("ts")).alias("week"),
        "user_id",
    ).agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("rev")
    )
    cell = wk.groupBy("week", "variant").agg(
        F.count("*").alias("n"), dsum("rev").alias("s")
    )
    c = lambda vv, col: F.max(F.when(F.col("variant") == vv, F.col(col)))  # noqa: E731
    wide = (
        cell.groupBy("week")
        .agg(
            (c(1, "s") / c(1, "n") - c(0, "s") / c(0, "n")).alias("delta"),
            c(0, "n").alias("n0"),
            c(1, "n").alias("n1"),
        )
        .filter(F.col("n0").isNotNull() & F.col("n1").isNotNull())
        .select("week", "delta")
    )
    idx = wide.select("delta", F.row_number().over(W.orderBy("week")).alias("t"))
    fit = idx.agg(
        F.count("*").alias("npts"),
        F.sum("t").alias("sx"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
        dsum("delta").alias("sy"),
        dsum(F.col("t") * F.col("delta")).alias("sxy"),
    )
    npts, sx, sxx, sy, sxy = (F.col(c_) for c_ in ("npts", "sx", "sxx", "sy", "sxy"))
    slope = (npts * sxy - sx * sy) / (npts * sxx - sx * sx)
    q6 = lambda c_: F.floor(c_ * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    degenerate = npts * sxx - sx * sx == 0
    return fit.select(
        npts.cast("bigint").alias("n_weeks"),
        q6(sy / npts).alias("mean_weekly_effect"),
        F.when(degenerate, F.lit(0.0)).otherwise(q6(slope)).alias(
            "effect_trend_per_week"
        ),
        F.when(degenerate, F.lit(False))
        .otherwise(slope < -0.05 * F.abs(sy / npts))
        .alias("novelty_decay_flag"),
    )


# ---------------------------------------------------------------------------
# Bigram conditional entropy (corpus predictability)
# ---------------------------------------------------------------------------

_CENT_SQL = f"""
    WITH toks AS (
        SELECT doc_id, w, o FROM (
            SELECT doc_id,
                   UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS w,
                   UNNEST(GENERATE_SERIES(1,
                       LEN(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')))) AS o
            FROM documents WHERE n_chars > 0
        ) WHERE w <> ''
    ), bi AS (
        SELECT a.w AS w1, b.w AS w2, COUNT(*) AS c
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.o = a.o + 1
        GROUP BY 1, 2
    ), uni AS (
        SELECT w1, SUM(c) AS cu FROM bi GROUP BY w1
    ), tot AS (
        SELECT SUM(c) AS n FROM bi
    )
    SELECT CAST(tot.n AS BIGINT) AS n_bigrams,
           FLOOR({dsum_expr("-(bi.c * 1.0 / tot.n) * LN(bi.c * 1.0 / tot.n)")}
                 * 1e6 + 0.5) / 1e6 AS h_bigram_nats,
           FLOOR({dsum_expr("-(bi.c * 1.0 / tot.n) * LN(bi.c * 1.0 / uni.cu)")}
                 * 1e6 + 0.5) / 1e6 AS h_conditional_nats
    FROM bi
    JOIN uni ON uni.w1 = bi.w1
    CROSS JOIN tot
    GROUP BY tot.n
"""


@query("text_conditional_entropy", oracle=_CENT_SQL)
def text_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus predictability: the bigram entropy H(W1,W2) and the
    conditional entropy H(W2|W1) = -sum p(w1,w2)·ln p(w2|w1) over
    within-document adjacent word pairs — the information-theoretic
    repetitiveness gauge (natural prose sits well above template spam;
    a collapsing H(W2|W1) means the corpus is becoming
    auto-completable, the signal LM-loss-based quality filters proxy).
    Complements agg_entropy (unigram, single column) with sequence
    structure.

    Exactness: bigram and left-marginal counts are exact integers;
    each entropy term is one fixed tree with a single LN
    (quantize-at-6 precedent) and term sums go through the decimal
    contract.

    Scale: tokenization explodes once with positions (posexplode);
    the bigram join is (doc, position)-keyed — adjacent pairs only,
    never token-quadratic; marginals are vocabulary-sized
    aggregates."""
    d = _t(spark, sf_dir, "documents")["documents"]
    toks = (
        d.filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
                "p", "w"
            ),
        )
        .filter(F.col("w") != "")
        .select("doc_id", (F.col("p") + 1).alias("o"), "w")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    bi = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.o") == F.col("a.o") + 1),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count("*").alias("c"))
        # feeds the left marginal, the total, and the scored join
        .transform(cut_lineage)
    )
    uni = bi.groupBy("w1").agg(F.sum("c").alias("cu"))
    tot = bi.agg(F.sum("c").alias("n"))
    j = bi.join(uni, "w1").crossJoin(F.broadcast(tot))
    p_joint = F.col("c") * 1.0 / F.col("n")
    term_joint = -p_joint * F.log(p_joint)
    term_cond = -p_joint * F.log(F.col("c") * 1.0 / F.col("cu"))
    q6 = lambda c_: F.floor(c_ * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return j.groupBy("n").agg(
        F.col("n").cast("bigint").alias("n_bigrams"),
        q6(dsum(term_joint)).alias("h_bigram_nats"),
        q6(dsum(term_cond)).alias("h_conditional_nats"),
    ).drop("n")


# ---------------------------------------------------------------------------
# Population Stability Index drift monitor
# ---------------------------------------------------------------------------

_PSI_SQL = f"""
    WITH b AS (
        SELECT (MIN(EPOCH_US(ts)) + MAX(EPOCH_US(ts))) // 2 AS cutoff FROM events
    ), p AS (
        SELECT value, EPOCH_US(ts) <= b.cutoff AS is_ref
        FROM events, b WHERE event_type = 'purchase'
    ), edges AS (
        SELECT QUANTILE_CONT(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
        FROM p WHERE is_ref
    ), binned AS (
        SELECT CAST(is_ref AS INT) AS is_ref,
               1 + CAST(value > e[1] AS INT) + CAST(value > e[2] AS INT)
                 + CAST(value > e[3] AS INT) + CAST(value > e[4] AS INT)
                 + CAST(value > e[5] AS INT) + CAST(value > e[6] AS INT)
                 + CAST(value > e[7] AS INT) + CAST(value > e[8] AS INT)
                 + CAST(value > e[9] AS INT) AS bin
        FROM p, edges
    ), spine AS (
        SELECT UNNEST(GENERATE_SERIES(1, 10)) AS bin
    ), cnt AS (
        SELECT s.bin,
               COALESCE(SUM(CASE WHEN b2.is_ref = 1 THEN 1 END), 0) AS cr,
               COALESCE(SUM(CASE WHEN b2.is_ref = 0 THEN 1 END), 0) AS cc
        FROM spine s LEFT JOIN binned b2 ON b2.bin = s.bin
        GROUP BY s.bin
    ), tot AS (
        SELECT SUM(cr) AS nr, SUM(cc) AS nc FROM cnt
    )
    SELECT CAST(tot.nr AS BIGINT) AS n_reference, CAST(tot.nc AS BIGINT) AS n_current,
           FLOOR({dsum_expr("((cnt.cc + 1.0) / (tot.nc + 10) - (cnt.cr + 1.0) / (tot.nr + 10)) * LN(((cnt.cc + 1.0) / (tot.nc + 10)) / ((cnt.cr + 1.0) / (tot.nr + 10)))")}
                 * 1e6 + 0.5) / 1e6 AS psi,
           {dsum_expr("((cnt.cc + 1.0) / (tot.nc + 10) - (cnt.cr + 1.0) / (tot.nr + 10)) * LN(((cnt.cc + 1.0) / (tot.nc + 10)) / ((cnt.cr + 1.0) / (tot.nr + 10)))")}
               > 0.25 AS drift_flag
    FROM cnt, tot GROUP BY tot.nr, tot.nc
"""


@query("ml_psi_drift", oracle=_PSI_SQL)
def ml_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the purchase-value stream: decile bins from the reference half,
    add-one-smoothed shares on both sides, PSI =
    sum (q-p)·ln(q/p), flagged at the industry 0.25
    retrain-your-model threshold — the model-monitoring standard that
    complements ts_distribution_drift's total-variation distance
    (PSI weights tail moves logarithmically; TV treats all mass
    equally). Smoothing makes empty current-side bins well-defined
    without epsilon hacks, identically in both engines.

    Exactness: the time cutoff is integer microseconds; decile edges
    are the shared R-7 interpolation over the reference half (one
    1-row broadcast); bin assignment is 9 comparisons against those
    edges; counts are exact; each PSI term is one fixed tree with a
    single LN and the term sum goes through the decimal contract.

    Scale: one scan bins both halves (the edge row broadcasts); the
    10-bin spine closes missing bins; everything after is a 10-row
    reduction."""
    ev = _t(spark, sf_dir, "events")["events"]
    us = F.unix_micros(F.col("ts"))
    b = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx")).select(
        F.expr("(mn + mx) div 2").alias("cutoff")
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(b))
        .select("value", (us <= F.col("cutoff")).alias("is_ref"))
        .transform(cut_lineage)
    )
    edges = p.filter("is_ref").agg(
        F.expr(
            "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"
        ).alias("e")
    )
    bin_col = F.lit(1)
    for i in range(1, 10):
        bin_col = bin_col + (F.col("value") > F.expr(f"element_at(e, {i})")).cast("int")
    binned = p.crossJoin(F.broadcast(edges)).select(
        F.col("is_ref").cast("int").alias("is_ref"), bin_col.alias("bin")
    )
    spine = spark.range(1, 11).select(F.col("id").cast("int").alias("bin"))
    cnt = (
        spine.join(binned, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("is_ref") == 1, 1)), F.lit(0)
            ).alias("cr"),
            F.coalesce(
                F.sum(F.when(F.col("is_ref") == 0, 1)), F.lit(0)
            ).alias("cc"),
        )
    )
    tot = cnt.agg(F.sum("cr").alias("nr"), F.sum("cc").alias("nc"))
    j = cnt.crossJoin(F.broadcast(tot))
    q_ = (F.col("cc") + 1.0) / (F.col("nc") + 10)
    p_ = (F.col("cr") + 1.0) / (F.col("nr") + 10)
    term = (q_ - p_) * F.log(q_ / p_)
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return j.groupBy("nr", "nc").agg(
        F.col("nr").cast("bigint").alias("n_reference"),
        F.col("nc").cast("bigint").alias("n_current"),
        q6(dsum(term)).alias("psi"),
        (dsum(term) > 0.25).alias("drift_flag"),
    ).select("n_reference", "n_current", "psi", "drift_flag")


# ---------------------------------------------------------------------------
# Calibration curve + Brier score of a behavioral score
# ---------------------------------------------------------------------------

_CAL_SQL = """
    WITH pu AS (
        SELECT user_id,
               CAST(LEAST(GREATEST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                                   - 8, 0) // 2, 6) AS BIGINT) AS bin,
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
    ), joined AS (
        SELECT t.bin, t.n_train, t.x_train,
               COALESCE(s.n_test, 0) AS n_test, COALESCE(s.x_test, 0) AS x_test,
               t.x_train * 1.0 / t.n_train AS pred
        FROM train t LEFT JOIN test s ON s.bin = t.bin
    ), brier AS (
        SELECT CAST(ROUND(SUM(CAST(
                   (x_test * (1 - pred) * (1 - pred)
                    + (n_test - x_test) * pred * pred) AS DECIMAL(38,10))), 4)
                    AS DOUBLE) / SUM(n_test) AS bs
        FROM joined
    )
    SELECT j.bin AS score_bin,
           CAST(j.n_train AS BIGINT) AS n_train,
           FLOOR(j.pred * 1e6 + 0.5) / 1e6 AS predicted_rate,
           CAST(j.n_test AS BIGINT) AS n_test,
           CASE WHEN j.n_test = 0 THEN 0.0
                ELSE FLOOR(j.x_test * 1.0 / j.n_test * 1e6 + 0.5) / 1e6 END
               AS observed_rate,
           FLOOR(brier.bs * 1e6 + 0.5) / 1e6 AS brier_score
    FROM joined j, brier
"""


@query("ml_calibration_brier", oracle=_CAL_SQL)
def ml_calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve + Brier score of the behavioral score
    ml_auc_score ranks: click-count bins (2-click-wide, clamped to the
    observed 8-20 range) get a
    predicted conversion rate from the train users (2/3 hash split)
    and are scored on the held-out third — per-bin predicted vs
    observed is the reliability diagram, and the Brier score
    mean((pred-label)²) is the proper scoring rule that AUC (pure
    ranking) cannot see miscalibration with.

    Exactness: bins, labels, and the deterministic user split are
    integer arithmetic; predicted/observed rates are single divisions
    of exact counts; the Brier numerator uses the closed form
    x·(1-p)² + (n-x)·p² per bin summed through the decimal contract.

    Scale: one user-grain aggregate; train/test are bin-grain
    (≤6 rows) reductions; the Brier reduction is 1-row."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        F.least(
            F.expr(
                "greatest(sum(case when event_type = 'click' then 1 else 0 end)"
                " - 8, 0) div 2"
            ),
            F.lit(6),
        ).cast("bigint").alias("bin"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1
            ).otherwise(0)
        ).alias("label"),
    ).select("bin", "label", (F.col("user_id") % 3 == 0).alias("is_test"))
    train = (
        pu.filter(~F.col("is_test"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_train"), F.sum("label").alias("x_train"))
    )
    test = (
        pu.filter("is_test")
        .groupBy("bin")
        .agg(F.count("*").alias("n_test"), F.sum("label").alias("x_test"))
    )
    joined = (
        train.join(test, "bin", "left")
        .select(
            "bin",
            "n_train",
            "x_train",
            F.coalesce(F.col("n_test"), F.lit(0)).alias("n_test"),
            F.coalesce(F.col("x_test"), F.lit(0)).alias("x_test"),
            (F.col("x_train") * 1.0 / F.col("n_train")).alias("pred"),
        )
        .transform(cut_lineage)
    )
    pr = F.col("pred")
    num = F.col("x_test") * (1 - pr) * (1 - pr) + (
        F.col("n_test") - F.col("x_test")
    ) * pr * pr
    brier = joined.agg(
        (
            F.round(F.sum(num.cast("decimal(38,10)")), 4).cast("double")
            / F.sum("n_test")
        ).alias("bs")
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return joined.crossJoin(F.broadcast(brier)).select(
        F.col("bin").alias("score_bin"),
        F.col("n_train").cast("bigint").alias("n_train"),
        q6(pr).alias("predicted_rate"),
        F.col("n_test").cast("bigint").alias("n_test"),
        F.when(F.col("n_test") == 0, F.lit(0.0))
        .otherwise(q6(F.col("x_test") * 1.0 / F.col("n_test")))
        .alias("observed_rate"),
        q6(F.col("bs")).alias("brier_score"),
    )


# ---------------------------------------------------------------------------
# Seasonality strength of the daily revenue series
# ---------------------------------------------------------------------------

_SEASTR_SQL = f"""
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               DAYOFWEEK(DATE_TRUNC('day', ts)) + 1 AS dow,
               {dsum_expr('value')} AS x
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), prof AS (
        SELECT dow, {dsum_expr('x')} / COUNT(*) AS m FROM daily GROUP BY dow
    ), tot AS (
        SELECT COUNT(*) AS n, {dsum_expr('x')} AS s, {dsum_expr('x * x')} AS q
        FROM daily
    ), resid AS (
        SELECT {dsum_expr('(d.x - p.m) * (d.x - p.m)')} AS rss
        FROM daily d JOIN prof p ON p.dow = d.dow
    )
    SELECT CAST(tot.n AS BIGINT) AS n_days,
           CASE WHEN tot.q - tot.s * tot.s / tot.n = 0 THEN 0.0
                ELSE FLOOR((1 - resid.rss / (tot.q - tot.s * tot.s / tot.n))
                           * 1e6 + 0.5) / 1e6 END AS seasonality_strength,
           (SELECT MAX_BY(dow, m) FROM prof) AS peak_dow,
           (SELECT MIN_BY(dow, m) FROM prof) AS trough_dow
    FROM tot, resid
"""


@query("ts_seasonality_strength", oracle=_SEASTR_SQL)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality strength of daily purchase revenue: the fraction of
    daily variance explained by the day-of-week profile,
    1 - SS_resid/SS_total (the eta-squared of the weekly pattern, the
    STL-style strength statistic) — near 1 means scheduling/capacity
    should follow the weekly cycle, near 0 means the weekly profile in
    ts_seasonal_profile is noise. Also reports the peak and trough
    days.

    Exactness: daily sums, profile means, and both sums of squares go
    through the decimal contract; the ratio is one fixed tree with the
    zero-variance degenerate defined identically; peak/trough use the
    exact MAX_BY/MIN_BY pair on the 7-row profile.

    Scale: day-grain aggregate, 7-row profile broadcast back, two
    1-row reductions."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.dayofweek(F.date_trunc("day", "ts")).alias("dow"),
        )
        .agg(dsum(F.col("value")).alias("x"))
        # feeds profile, totals, and residuals
        .transform(cut_lineage)
    )
    prof = daily.groupBy("dow").agg((dsum("x") / F.count("*")).alias("m"))
    tot = daily.agg(
        F.count("*").alias("n"),
        dsum("x").alias("s"),
        dsum(F.col("x") * F.col("x")).alias("q"),
    )
    resid = daily.join(F.broadcast(prof), "dow").agg(
        dsum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias("rss")
    )
    extremes = prof.agg(
        F.max_by("dow", "m").alias("peak_dow"), F.min_by("dow", "m").alias("trough_dow")
    )
    j = tot.crossJoin(F.broadcast(resid)).crossJoin(F.broadcast(extremes))
    n, s, q, rss = (F.col(c) for c in ("n", "s", "q", "rss"))
    ss_tot = q - s * s / n
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return j.select(
        n.cast("bigint").alias("n_days"),
        F.when(ss_tot == 0, F.lit(0.0))
        .otherwise(q6(1 - rss / ss_tot))
        .alias("seasonality_strength"),
        "peak_dow",
        "trough_dow",
    )


# ---------------------------------------------------------------------------
# Dedup threshold-sweep curve
# ---------------------------------------------------------------------------

_SWEEP_TS = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

_SWEEP_SQL = f"""
    WITH words AS (
      SELECT doc_id, source, STRING_SPLIT({_NORM5_SQL}, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id, source,
             LIST_DISTINCT(CASE WHEN LEN(w) >= 3
               THEN LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 2),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
               ELSE [ARRAY_TO_STRING(w, ' ')] END) AS g
      FROM words),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(LEN(LIST_INTERSECT(a.g, b.g)) AS DOUBLE)
               / LEN(LIST_DISTINCT(a.g || b.g)) AS jaccard
      FROM grams a JOIN grams b ON b.doc_id > a.doc_id AND a.source = b.source
      WHERE CAST(LEN(LIST_INTERSECT(a.g, b.g)) AS DOUBLE)
               / LEN(LIST_DISTINCT(a.g || b.g)) >= {_SWEEP_TS[0]}
    ), ts AS (
      SELECT UNNEST([{", ".join(str(t) for t in _SWEEP_TS)}]) AS t
    ), pc AS (
      SELECT ts.t, COUNT(*) AS n_pairs
      FROM ts LEFT JOIN pairs ON pairs.jaccard >= ts.t
      GROUP BY ts.t
    ), dc AS (
      SELECT t, COUNT(DISTINCT d) AS n_docs FROM (
        SELECT ts.t, pairs.id_a AS d FROM ts JOIN pairs ON pairs.jaccard >= ts.t
        UNION ALL
        SELECT ts.t, pairs.id_b AS d FROM ts JOIN pairs ON pairs.jaccard >= ts.t
      ) GROUP BY t
    )
    SELECT pc.t AS threshold,
           CAST(CASE WHEN dc.t IS NULL THEN 0 ELSE pc.n_pairs END AS BIGINT)
               AS n_pairs,
           CAST(COALESCE(dc.n_docs, 0) AS BIGINT) AS n_docs_involved
    FROM pc LEFT JOIN dc ON dc.t = pc.t
"""


@query("dedup_threshold_sweep", oracle=_SWEEP_SQL)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup threshold-selection curve: for each candidate Jaccard
    threshold 0.2..0.9, how many blocked near-dup pairs and distinct
    documents the threshold would implicate — the one-pass sweep a
    pipeline owner reads to pick the dedup_ngram_jaccard /
    dedup_minhash_lsh operating point (too low melts the corpus, too
    high leaves boilerplate; the knee of this curve is the decision).

    Exactness: pair similarities are exact integer ratios from the
    same blocked 3-gram machinery dedup_ngram_jaccard oracles;
    threshold comparisons are identical double compares; counts are
    exact (a LEFT JOIN spine keeps zero-pair thresholds present).

    Scale: ONE blocked pair computation at the lowest threshold feeds
    all 8 thresholds (the sweep is a broadcast spine join over the
    pair list, not 8 re-computations); doc involvement is an explode +
    distinct at pair grain."""
    from es_analytics_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")["documents"]
    pairs = (
        ngram_jaccard_pairs(
            d, "doc_id", "text", ngram=3, block_col="source", threshold=_SWEEP_TS[0]
        )
        .filter(F.col("jaccard") >= _SWEEP_TS[0])
        .select("id_a", "id_b", "jaccard")
        # one pair computation feeds every threshold
        .transform(cut_lineage)
    )
    ts = spark.createDataFrame([(t,) for t in _SWEEP_TS], "t double")
    hit = pairs.crossJoin(F.broadcast(ts)).filter(F.col("jaccard") >= F.col("t"))
    pc = ts.join(hit.groupBy("t").agg(F.count("*").alias("n_pairs")), "t", "left")
    dc = (
        hit.select("t", F.col("id_a").alias("d"))
        .unionAll(hit.select("t", F.col("id_b").alias("d")))
        .groupBy("t")
        .agg(F.countDistinct("d").alias("n_docs"))
    )
    return (
        pc.join(dc, "t", "left")
        .select(
            F.col("t").alias("threshold"),
            F.coalesce(F.col("n_pairs"), F.lit(0)).cast("bigint").alias("n_pairs"),
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias(
                "n_docs_involved"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Tail risk: VaR and CVaR (expected shortfall) of purchase values
# ---------------------------------------------------------------------------

_CVAR_SQL = f"""
    WITH p AS (
        SELECT value FROM events WHERE event_type = 'purchase'
    ), v AS (
        SELECT QUANTILE_CONT(value, 0.95) AS var95 FROM p
    ), tail AS (
        SELECT COUNT(*) AS n_tail, {dsum_expr('p.value')} AS s_tail
        FROM p, v WHERE p.value >= v.var95
    )
    SELECT CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n,
           FLOOR(v.var95 * 1e6 + 0.5) / 1e6 AS var_95,
           CAST(tail.n_tail AS BIGINT) AS n_tail,
           FLOOR(tail.s_tail / tail.n_tail * 1e6 + 0.5) / 1e6 AS cvar_95
    FROM v, tail
"""


@query("stat_tail_cvar", oracle=_CVAR_SQL)
def stat_tail_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail risk of the purchase-value distribution: the 95% VaR (the
    exact interpolated p95) and the CVaR / expected shortfall (mean of
    everything at or beyond it) — the coherent tail statistic risk and
    capacity teams plan against, because a p95 alone says nothing
    about HOW BAD the tail is. The at-or-above convention makes the
    tail set a deterministic predicate on the broadcast threshold.

    Exactness: VaR is the shared R-7 interpolation; the tail set is a
    single compare against the broadcast threshold; the tail mean is a
    decimal sum over exact doubles divided by an exact count.

    Scale: one percentile aggregate, a 1-row threshold broadcast, and
    one filtered aggregate — two scans of the purchase stream, no
    sorts, no collects."""
    ev = _t(spark, sf_dir, "events")["events"]
    p = ev.filter(F.col("event_type") == "purchase").select("value").transform(cut_lineage)
    v = p.agg(F.expr("percentile(value, 0.95D)").alias("var95"))
    tail = p.crossJoin(F.broadcast(v)).filter(F.col("value") >= F.col("var95"))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    n = p.agg(F.count("*").alias("n"))
    agg = tail.groupBy("var95").agg(
        F.count("*").alias("n_tail"), dsum("value").alias("s_tail")
    )
    return (
        agg.crossJoin(F.broadcast(n))
        .select(
            F.col("n").cast("bigint").alias("n"),
            q6(F.col("var95")).alias("var_95"),
            F.col("n_tail").cast("bigint").alias("n_tail"),
            q6(F.col("s_tail") / F.col("n_tail")).alias("cvar_95"),
        )
    )


# ---------------------------------------------------------------------------
# Maximum drawdown of cumulative daily net revenue
# ---------------------------------------------------------------------------

_MDD_SQL = f"""
    WITH daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE -value END")} AS x
        FROM events WHERE event_type IN ('purchase', 'error') GROUP BY 1
    ), walk AS (
        SELECT day,
               CAST(ROUND(SUM(CAST(x AS DECIMAL(38,10))) OVER w, 4) AS DOUBLE)
                   AS equity
        FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
    ), dd AS (
        SELECT day, equity,
               MAX(equity) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) - equity AS drawdown
        FROM walk
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           FLOOR(MAX(drawdown) * 1e6 + 0.5) / 1e6 AS max_drawdown,
           MIN(CASE WHEN drawdown = (SELECT MAX(drawdown) FROM dd) THEN day END)
               AS trough_day
    FROM dd
"""


@query("ts_max_drawdown", oracle=_MDD_SQL)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative daily net-revenue curve
    (purchases credit, error-event values debit — a net 'equity'
    curve): the largest peak-to-trough fall and the day it bottomed —
    the path-dependent risk statistic a plain variance cannot see
    (two series with equal variance can have wildly different worst
    runs). Classic in finance; equally useful for revenue-run
    monitoring.

    Exactness: the equity curve is an ordered decimal prefix sum
    rounded at 4dp (the ts_cusum_changepoint walk contract); the
    running max and the drawdown max are exact comparisons of those
    quantized doubles; the trough day takes the earliest argmax.

    Scale: day-grain aggregate, then two windows over the
    calendar-bounded daily frame (the ts_cumulative_users
    single-partition bound, allowlisted) and a 1-row reduction."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.filter(F.col("event_type").isin("purchase", "error"))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    -F.col("value")
                )
            ).alias("x")
        )
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    walk = daily.select(
        "day",
        F.round(F.sum(F.col("x").cast("decimal(38,10)")).over(w), 4)
        .cast("double")
        .alias("equity"),
    )
    dd = walk.select(
        "day",
        "equity",
        (F.max("equity").over(w) - F.col("equity")).alias("drawdown"),
    ).transform(cut_lineage)
    mx = dd.agg(F.max("drawdown").alias("mdd"))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (
        dd.crossJoin(F.broadcast(mx))
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            q6(F.max("drawdown")).alias("max_drawdown"),
            F.min(
                F.when(F.col("drawdown") == F.col("mdd"), F.col("day"))
            ).alias("trough_day"),
        )
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval + empirical coverage
# ---------------------------------------------------------------------------

_CONF_SQL = f"""
    WITH pu AS (
        SELECT user_id,
               CAST(LEAST(GREATEST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                                   - 8, 0) // 2, 6) AS BIGINT) AS bin,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS y,
               CAST(user_id % 3 AS INT) AS fold
        FROM events GROUP BY user_id
    ), model AS (
        SELECT bin, {dsum_expr('y')} / COUNT(*) AS pred
        FROM pu WHERE fold = 1 GROUP BY bin
    ), cal AS (
        SELECT ABS(pu.y - m.pred) AS r
        FROM pu JOIN model m ON m.bin = pu.bin WHERE pu.fold = 2
    ), q AS (
        SELECT QUANTILE_CONT(r, 0.9) AS q90, COUNT(*) AS n_cal FROM cal
    ), test AS (
        SELECT COUNT(*) AS n_test,
               SUM(CASE WHEN ABS(pu.y - m.pred) <= q.q90 THEN 1 ELSE 0 END)
                   AS covered
        FROM pu JOIN model m ON m.bin = pu.bin CROSS JOIN q
        WHERE pu.fold = 0
    )
    SELECT CAST((SELECT COUNT(*) FROM pu WHERE fold = 1) AS BIGINT) AS n_train,
           CAST(q.n_cal AS BIGINT) AS n_cal,
           CAST(test.n_test AS BIGINT) AS n_test,
           FLOOR(2 * q.q90 * 1e6 + 0.5) / 1e6 AS interval_width,
           FLOOR(test.covered * 1.0 / test.n_test * 1e6 + 0.5) / 1e6
               AS empirical_coverage
    FROM q, test
"""


@query("ml_conformal_interval", oracle=_CONF_SQL)
def ml_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% prediction interval for per-user purchase
    revenue predicted from the click-count bin model: fold 1 fits the
    bin means, fold 2's absolute residuals give the conformal quantile
    q90, and fold 0 measures EMPIRICAL COVERAGE — the
    distribution-free guarantee check (coverage ≈ 0.9 regardless of
    the model being right) that turns any point predictor into a
    calibrated interval. Complements ml_calibration_brier (probability
    calibration) with regression-interval calibration.

    Exactness: bins, folds, and counts are integer arithmetic;
    predictions and per-user revenue go through the decimal contract;
    the conformal quantile is the shared R-7 interpolation; the
    coverage comparison is the same double compare in both engines.

    Scale: one user-grain aggregate feeds all three folds; the model
    is a ≤7-row broadcast; the quantile and coverage are single
    reductions."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.least(
                F.expr(
                    "greatest(sum(case when event_type = 'click' then 1 else 0 end)"
                    " - 8, 0) div 2"
                ),
                F.lit(6),
            ).cast("bigint").alias("bin"),
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("y"),
        )
        .select("bin", "y", (F.col("user_id") % 3).cast("int").alias("fold"))
        .transform(cut_lineage)
    )
    model = (
        pu.filter(F.col("fold") == 1)
        .groupBy("bin")
        .agg((dsum("y") / F.count("*")).alias("pred"))
    )
    cal = (
        pu.filter(F.col("fold") == 2)
        .join(F.broadcast(model), "bin")
        .select(F.abs(F.col("y") - F.col("pred")).alias("r"))
    )
    qn = cal.agg(
        F.expr("percentile(r, 0.9D)").alias("q90"), F.count("*").alias("n_cal")
    )
    test = (
        pu.filter(F.col("fold") == 0)
        .join(F.broadcast(model), "bin")
        .crossJoin(F.broadcast(qn))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(F.abs(F.col("y") - F.col("pred")) <= F.col("q90"), 1).otherwise(
                    0
                )
            ).alias("covered"),
            F.max("q90").alias("q90"),
            F.max("n_cal").alias("n_cal"),
        )
    )
    ntr = pu.filter(F.col("fold") == 1).agg(F.count("*").alias("n_train"))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return test.crossJoin(F.broadcast(ntr)).select(
        F.col("n_train").cast("bigint").alias("n_train"),
        F.col("n_cal").cast("bigint").alias("n_cal"),
        F.col("n_test").cast("bigint").alias("n_test"),
        q6(2 * F.col("q90")).alias("interval_width"),
        q6(F.col("covered") * 1.0 / F.col("n_test")).alias("empirical_coverage"),
    )


# ---------------------------------------------------------------------------
# Causal-impact-lite: pre-period drift forecast vs post-period actuals
# ---------------------------------------------------------------------------

_CIL_SQL = f"""
    WITH b AS (
        SELECT CAST(DATE_TRUNC('day',
                    MAKE_TIMESTAMP((MIN(EPOCH_US(ts)) + MAX(EPOCH_US(ts))) // 2))
                    AS TIMESTAMP) AS cutday
        FROM events
    ), daily AS (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS x
        FROM events GROUP BY 1
    ), pre AS (
        SELECT COUNT(*) AS n_pre,
               MIN_BY(d.x, d.day) AS first_val, MIN(d.day) AS first_day,
               MAX_BY(d.x, d.day) AS last_val, MAX(d.day) AS last_day
        FROM daily d, b WHERE d.day <= b.cutday
    ), post AS (
        SELECT d.day, d.x,
               DATEDIFF('day', pre.last_day, d.day) AS h,
               pre.last_val
               + DATEDIFF('day', pre.last_day, d.day)
                 * (pre.last_val - pre.first_val)
                 / DATEDIFF('day', pre.first_day, pre.last_day) AS f
        FROM daily d, b, pre WHERE d.day > b.cutday
    )
    SELECT CAST(pre.n_pre AS BIGINT) AS n_pre_days,
           CAST(COUNT(*) AS BIGINT) AS n_post,
           FLOOR({dsum_expr('post.x')} * 1e4 + 0.5) / 1e4 AS cum_actual,
           FLOOR({dsum_expr('post.f')} * 1e4 + 0.5) / 1e4 AS cum_forecast,
           FLOOR(({dsum_expr('post.x')} - {dsum_expr('post.f')}) * 1e4 + 0.5) / 1e4
               AS abs_impact,
           CASE WHEN {dsum_expr('post.f')} = 0 THEN 0.0
                ELSE FLOOR(({dsum_expr('post.x')} - {dsum_expr('post.f')}) * 100
                           / {dsum_expr('post.f')} * 1e4 + 0.5) / 1e4 END
               AS rel_impact_pct
    FROM post, pre GROUP BY pre.n_pre
"""


@query("ts_causal_impact_lite", oracle=_CIL_SQL)
def ts_causal_impact_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal-impact-lite: treat the event-time midpoint as the
    intervention day, fit the drift baseline (line through the first
    and last pre-period daily revenue) on the pre-period, project it
    over the post-period calendar, and report cumulative actual vs
    counterfactual with absolute and relative impact — the
    launch-impact readout when there IS no control group (the
    CausalImpact idea with the classical drift forecaster standing in
    for the Bayesian structural model; significance via the
    randomization machinery if needed).

    Exactness: the cutover day and forecast horizons are pure calendar
    arithmetic (no row indexing, no windows); daily sums and all
    cumulative terms go through the decimal contract; the baseline is
    one fixed tree over MIN_BY/MAX_BY-selected exact endpoints.

    Scale: one day-grain aggregate, two 1-row broadcasts (cutover +
    pre-period endpoints), one filtered reduction over post days — no
    data-sized windows or collects anywhere."""
    ev = _t(spark, sf_dir, "events")["events"]
    us = F.unix_micros(F.col("ts"))
    b = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx")).select(
        F.date_trunc("day", F.expr("timestamp_micros((mn + mx) div 2)")).alias(
            "cutday"
        )
    )
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("x")
        )
        .transform(cut_lineage)
    )
    pre = (
        daily.crossJoin(F.broadcast(b))
        .filter(F.col("day") <= F.col("cutday"))
        .agg(
            F.count("*").alias("n_pre"),
            F.min_by("x", "day").alias("first_val"),
            F.min("day").alias("first_day"),
            F.max_by("x", "day").alias("last_val"),
            F.max("day").alias("last_day"),
        )
    )
    post = (
        daily.crossJoin(F.broadcast(b))
        .filter(F.col("day") > F.col("cutday"))
        .crossJoin(F.broadcast(pre))
        .select(
            "n_pre",
            "x",
            (
                F.col("last_val")
                + F.datediff(F.col("day"), F.col("last_day"))
                * (F.col("last_val") - F.col("first_val"))
                / F.datediff(F.col("last_day"), F.col("first_day"))
            ).alias("f"),
        )
    )
    q4 = lambda c: F.floor(c * 1e4 + F.lit(0.5)) / 1e4  # noqa: E731
    return post.groupBy("n_pre").agg(
        F.col("n_pre").cast("bigint").alias("n_pre_days"),
        F.count("*").cast("bigint").alias("n_post"),
        q4(dsum("x")).alias("cum_actual"),
        q4(dsum("f")).alias("cum_forecast"),
        q4(dsum("x") - dsum("f")).alias("abs_impact"),
        F.when(dsum("f") == 0, F.lit(0.0))
        .otherwise(q4((dsum("x") - dsum("f")) * 100 / dsum("f")))
        .alias("rel_impact_pct"),
    ).drop("n_pre")


# ---------------------------------------------------------------------------
# Ensemble anomaly consensus (z-score + MAD + Tukey votes)
# ---------------------------------------------------------------------------

_CONSENSUS_SQL = """
    WITH daily AS (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ), st AS (
        SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS q,
               QUANTILE_CONT(c, 0.5) AS med,
               QUANTILE_CONT(c, 0.25) AS q1, QUANTILE_CONT(c, 0.75) AS q3
        FROM daily GROUP BY 1
    ), md AS (
        SELECT d.event_type, QUANTILE_CONT(ABS(d.c - st.med), 0.5) AS mad
        FROM daily d JOIN st ON st.event_type = d.event_type GROUP BY 1
    ), scored AS (
        SELECT d.event_type, d.day, d.c,
               CAST(ABS(d.c - st.s * 1.0 / st.n)
                    > 2 * SQRT(st.q * 1.0 / st.n
                               - (st.s * 1.0 / st.n) * (st.s * 1.0 / st.n))
                    AS INT) AS v_z,
               CAST(md.mad > 0 AND ABS(d.c - st.med) > 3 * 1.4826 * md.mad AS INT)
                   AS v_mad,
               CAST(d.c < st.q1 - 1.5 * (st.q3 - st.q1)
                    OR d.c > st.q3 + 1.5 * (st.q3 - st.q1) AS INT) AS v_tukey
        FROM daily d
        JOIN st ON st.event_type = d.event_type
        JOIN md ON md.event_type = d.event_type
    )
    SELECT event_type, day, CAST(c AS BIGINT) AS n_events,
           CAST(v_z + v_mad + v_tukey AS BIGINT) AS votes,
           v_z = 1 AS flag_z, v_mad = 1 AS flag_mad, v_tukey = 1 AS flag_tukey,
           v_z + v_mad + v_tukey >= 2 AS consensus
    FROM scored WHERE v_z + v_mad + v_tukey >= 1
"""


def _score_consensus(daily: DataFrame) -> DataFrame:
    """Shared scoring for the anomaly-consensus pair: per-series
    moments + robust stats broadcast back, three votes, consensus
    flag. ``daily`` is the (event_type, day, c) frame (checkpointed by
    the caller)."""
    st = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("q"),
        F.expr("percentile(c, 0.5D)").alias("med"),
        F.expr("percentile(c, 0.25D)").alias("q1"),
        F.expr("percentile(c, 0.75D)").alias("q3"),
    )
    md = (
        daily.join(F.broadcast(st), "event_type")
        .select("event_type", F.abs(F.col("c") - F.col("med")).alias("dev"))
        .groupBy("event_type")
        .agg(F.expr("percentile(dev, 0.5D)").alias("mad"))
    )
    n, sm, q = F.col("n"), F.col("s"), F.col("q")
    mean = sm * 1.0 / n
    sd = F.sqrt(q * 1.0 / n - mean * mean)
    iqr = F.col("q3") - F.col("q1")
    scored = (
        daily.join(F.broadcast(st), "event_type")
        .join(F.broadcast(md), "event_type")
        .select(
            "event_type",
            "day",
            "c",
            (F.abs(F.col("c") - mean) > 2 * sd).cast("int").alias("v_z"),
            (
                (F.col("mad") > 0)
                & (F.abs(F.col("c") - F.col("med")) > 3 * 1.4826 * F.col("mad"))
            )
            .cast("int")
            .alias("v_mad"),
            (
                (F.col("c") < F.col("q1") - 1.5 * iqr)
                | (F.col("c") > F.col("q3") + 1.5 * iqr)
            )
            .cast("int")
            .alias("v_tukey"),
        )
    )
    votes = F.col("v_z") + F.col("v_mad") + F.col("v_tukey")
    return scored.filter(votes >= 1).select(
        "event_type",
        "day",
        F.col("c").cast("bigint").alias("n_events"),
        votes.cast("bigint").alias("votes"),
        (F.col("v_z") == 1).alias("flag_z"),
        (F.col("v_mad") == 1).alias("flag_mad"),
        (F.col("v_tukey") == 1).alias("flag_tukey"),
        (votes >= 2).alias("consensus"),
    )


@query("ts_anomaly_consensus", oracle=_CONSENSUS_SQL)
def ts_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble anomaly consensus over per-event-type daily counts:
    three
    independent outlier rules — 2σ z-score (parametric), 3-scaled-MAD
    (robust to the outliers themselves), and 1.5-IQR Tukey fences
    (quartile-based) — vote per (series, day); every
    single-rule fire surfaces with its votes and the consensus flag
    marks days at least two rules agree on. The consensus is what production alerting
    converges on: each rule alone has a known failure mode (z is
    masked by its own outliers, MAD degenerates on discrete data,
    Tukey over-fires on skew); requiring agreement cuts alert fatigue
    without losing real incidents.

    Exactness: daily counts and the per-series moment sums are exact
    integers; median/quartiles/MAD are shared R-7 interpolations; each
    vote is one fixed-tree comparison; the zero-MAD degenerate
    (constant series) disables that vote identically in both engines.

    Scale: one (series, day) aggregate, |series|-row stat frames
    broadcast back, one scored pass over the calendar-bounded daily
    frame — everything keys on the series id."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("c"))
        .transform(cut_lineage)
    )
    return _score_consensus(daily)


# ---------------------------------------------------------------------------
# Semi-structured property discovery (props JSON schema profile)
# ---------------------------------------------------------------------------

_PROPS_SQL = """
    WITH tot AS (
        SELECT COUNT(*) AS n FROM events
    ), kv AS (
        SELECT k, JSON_EXTRACT_STRING(props, '$.' || k) AS v
        FROM (SELECT props, UNNEST(JSON_KEYS(props)) AS k FROM events)
    )
    SELECT kv.k AS prop_key,
           CAST(COUNT(*) AS BIGINT) AS n_present,
           FLOOR(COUNT(*) * 1.0 / tot.n * 1e6 + 0.5) / 1e6 AS present_pct,
           CAST(COUNT(DISTINCT kv.v) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN TRY_CAST(kv.v AS DOUBLE) IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
           MIN(TRY_CAST(kv.v AS DOUBLE)) AS num_min,
           MAX(TRY_CAST(kv.v AS DOUBLE)) AS num_max
    FROM kv, tot GROUP BY kv.k, tot.n
"""


@query("fn_props_profile", oracle=_PROPS_SQL)
def fn_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property discovery over the events ``props``
    JSON: every key that occurs anywhere, how often it is present,
    its distinct-value cardinality, and (for values that parse as
    numbers) the numeric range — the schema-on-read property explorer
    product-analytics tools put in front of untyped event payloads,
    and the audit that decides which props graduate to typed columns.

    Exactness: keys come from json_object_keys; values are extracted
    as strings (identical JSON-path semantics both engines); numeric
    classification is TRY_CAST (error-safe, null on non-numeric) so
    counts and min/max are exact.

    Scale: one scan explodes only the key LIST per row (props-sized,
    not corpus-sized state), then a |keys|-grain aggregate with a
    1-row total broadcast."""
    ev = _t(spark, sf_dir, "events")["events"]
    tot = ev.agg(F.count("*").alias("n"))
    kv = ev.select(
        "props", F.explode(F.json_object_keys(F.col("props"))).alias("k")
    ).select("k", F.expr("get_json_object(props, concat('$.', k))").alias("v"))
    numv = F.expr("try_cast(v as double)")
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (
        kv.crossJoin(F.broadcast(tot))
        .groupBy("k", "n")
        .agg(
            F.count("*").cast("bigint").alias("n_present"),
            q6(F.count("*") * 1.0 / F.col("n")).alias("present_pct"),
            F.countDistinct("v").cast("bigint").alias("n_distinct"),
            F.sum(F.when(numv.isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_numeric"),
            F.min(numv).alias("num_min"),
            F.max(numv).alias("num_max"),
        )
        .select(
            F.col("k").alias("prop_key"),
            "n_present",
            "present_pct",
            "n_distinct",
            "n_numeric",
            "num_min",
            "num_max",
        )
    )


@query("stream_anomaly_consensus", mutates_conf=True, oracle=_CONSENSUS_SQL)
def stream_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ts_anomaly_consensus's per-series daily counts maintained BY THE
    STREAMING ENGINE (file source → watermark → 1-day tumbling window
    counts, availableNow replay), then scored with the identical
    shared z/MAD/Tukey consensus logic and pinned against the same SQL
    oracle — the streaming anomaly monitor every ops team actually
    deploys, meeting the batch/stream parity bar of this engine's
    stateful operators.

    Scale: the streaming state is one count per open (series, day)
    window under a 1-day watermark (bounded by series × lateness, not
    data); the scoring pass reads the drained day-grain result —
    result-sized, never event-sized."""
    from es_analytics_spark.streaming.ingest import replay_stream, stream_events

    ev = stream_events(spark, sf_dir)
    daily_stream = (
        ev.withWatermark("ts", "1 day")
        .groupBy("event_type", F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("c"))
    )
    out = replay_stream(
        spark,
        daily_stream,
        name="stream_anomaly_consensus",
        output_mode="complete",
    )
    daily = out.select(
        "event_type", F.col("w.start").alias("day"), "c"
    ).transform(cut_lineage)
    return _score_consensus(daily)


# ---------------------------------------------------------------------------
# Cumulative gains / lift curve by score decile
# ---------------------------------------------------------------------------

_LIFT_SQL = """
    WITH pu AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS score,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ), ranked AS (
        SELECT label,
               ROW_NUMBER() OVER (ORDER BY score DESC, user_id ASC) AS r,
               COUNT(*) OVER () AS n
        FROM pu
    ), dec AS (
        SELECT (r * 10 + n - 1) // n AS decile,
               COUNT(*) AS n_users, SUM(label) AS n_pos, MAX(n) AS n
        FROM ranked GROUP BY 1
    ), tot AS (
        SELECT SUM(n_pos) AS total_pos FROM dec
    ), cum AS (
        SELECT d.decile, d.n_users, d.n_pos,
               SUM(d2.n_pos) AS cum_pos, SUM(d2.n_users) AS cum_users
        FROM dec d JOIN dec d2 ON d2.decile <= d.decile
        GROUP BY d.decile, d.n_users, d.n_pos
    )
    SELECT CAST(cum.decile AS BIGINT) AS decile,
           CAST(cum.n_users AS BIGINT) AS n_users,
           CAST(cum.n_pos AS BIGINT) AS n_pos,
           FLOOR(cum.cum_pos * 1.0 / tot.total_pos * 1e6 + 0.5) / 1e6
               AS cum_capture_pct,
           FLOOR((cum.cum_pos * 1.0 / tot.total_pos)
                 / (cum.cum_users * 1.0 / (SELECT MAX(n) FROM dec))
                 * 1e6 + 0.5) / 1e6 AS cum_lift
    FROM cum, tot
"""


@query("ml_lift_curve", oracle=_LIFT_SQL)
def ml_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift curve: rank users by the behavioral
    score (click count, deterministic user_id tie-break), cut into
    exact deciles, and report each decile's cumulative share of all
    high-value purchasers plus the lift over random targeting — the
    chart marketing/scoring teams read before spending a campaign
    budget ("the top 2 deciles capture X% of converters"). Completes
    the scoring-eval trio: AUC (ranking), calibration (probabilities),
    lift (business targeting).

    Exactness: the global rank is computed with the window-free
    range-partition + triangle-offset recipe (oracle spells it as a
    plain ROW_NUMBER); decile assignment is the pure-integer
    ceil(10r/n) = (10r + n - 1) // n; capture and lift are single
    divisions of exact integers, half-up quantized.

    Scale: one user-grain aggregate, one range shuffle for the rank,
    a 10-row decile frame with a broadcast triangle cumsum — the
    agg_revenue_concentration shape applied to model targeting."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1
            ).otherwise(0)
        ).alias("label"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        pu.repartitionByRange(n_parts, F.desc("score"), F.asc("user_id"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "lr",
        F.row_number().over(
            W.partitionBy("pid").orderBy(F.desc("score"), F.asc("user_id"))
        ),
    )
    offs = cumulative_offsets(ranged.groupBy("pid").agg(F.count("*").alias("cnt")))
    tot_n = ranged.agg(F.count("*").alias("n"))
    ranked = (
        local.join(F.broadcast(offs), "pid")
        .crossJoin(F.broadcast(tot_n))
        .select(
            "label",
            (F.col("lr") + F.col("off")).alias("r"),
            "n",
        )
    )
    dec = (
        ranked.groupBy(F.expr("(r * 10 + n - 1) div n").alias("decile"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum("label").alias("n_pos"),
            F.max("n").alias("n"),
        )
        # 10-row frame feeds totals, the triangle cumsum, and the
        # scored join — checkpoint so the rank chain runs once
        .transform(cut_lineage)
    )
    tot = dec.agg(F.sum("n_pos").alias("total_pos"), F.max("n").alias("nn"))
    d2 = dec.select(
        F.col("decile").alias("d2"),
        F.col("n_pos").alias("p2"),
        F.col("n_users").alias("u2"),
    )
    cum = (
        dec.join(F.broadcast(d2), F.col("d2") <= F.col("decile"))
        .groupBy("decile", "n_users", "n_pos")
        .agg(F.sum("p2").alias("cum_pos"), F.sum("u2").alias("cum_users"))
    )
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        q6(F.col("cum_pos") * 1.0 / F.col("total_pos")).alias("cum_capture_pct"),
        q6(
            (F.col("cum_pos") * 1.0 / F.col("total_pos"))
            / (F.col("cum_users") * 1.0 / F.col("nn"))
        ).alias("cum_lift"),
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox check: stratified vs pooled effect direction
# ---------------------------------------------------------------------------

_SIMPSON_SQL = """
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label,
               MIN_BY(CASE WHEN EXTRACT(HOUR FROM ts) < 6 THEN 'night'
                           WHEN EXTRACT(HOUR FROM ts) < 12 THEN 'morning'
                           WHEN EXTRACT(HOUR FROM ts) < 18 THEN 'afternoon'
                           ELSE 'evening' END, ts) AS stratum
        FROM events GROUP BY user_id
    ), cell AS (
        SELECT stratum, variant, COUNT(*) AS n, SUM(label) AS x
        FROM pu GROUP BY 1, 2
        UNION ALL
        SELECT 'pooled' AS stratum, variant, COUNT(*) AS n, SUM(label) AS x
        FROM pu GROUP BY 2
    ), wide AS (
        SELECT stratum,
               MAX(CASE WHEN variant = 0 THEN n END) AS n0,
               MAX(CASE WHEN variant = 0 THEN x END) AS x0,
               MAX(CASE WHEN variant = 1 THEN n END) AS n1,
               MAX(CASE WHEN variant = 1 THEN x END) AS x1
        FROM cell GROUP BY stratum
    ), scored AS (
        SELECT stratum, n0, x0, n1, x1,
               x1 * 1.0 / n1 - x0 * 1.0 / n0 AS diff
        FROM wide WHERE n0 IS NOT NULL AND n1 IS NOT NULL
    ), pooled AS (
        SELECT diff AS pdiff FROM scored WHERE stratum = 'pooled'
    )
    SELECT s.stratum, CAST(s.n0 + s.n1 AS BIGINT) AS n_users,
           FLOOR(s.x0 * 1.0 / s.n0 * 1e6 + 0.5) / 1e6 AS cvr_control,
           FLOOR(s.x1 * 1.0 / s.n1 * 1e6 + 0.5) / 1e6 AS cvr_treatment,
           FLOOR(s.diff * 1e6 + 0.5) / 1e6 AS effect,
           s.stratum <> 'pooled' AND s.diff * p.pdiff < 0 AS sign_reversal
    FROM scored s, pooled p
"""


@query("ab_simpson_check", oracle=_SIMPSON_SQL)
def ab_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox guard: the treatment-control conversion
    difference computed pooled AND within each behavioral stratum
    (time-of-day band of the user's first event), with a flag on any
    stratum whose effect direction OPPOSES the pooled effect — the
    aggregation-reversal check that catches confounded readouts before
    anyone ships a conclusion drawn at the wrong grain. A reversal
    means the pooled number is a composition artifact and the
    stratified numbers (or ab_cuped_readout / ab_diff_in_diff) are the
    ones to trust.

    Exactness: the stratum is the MIN_BY-first-event band
    (deterministic ts tie-break at user grain); all cell counts are
    exact integers; rates, effects, and the sign test are fixed IEEE
    trees, half-up quantized.

    Scale: one user-grain aggregate, a (|strata|+1)×2 cell reduction,
    and a 1-row pooled broadcast."""
    ev = _t(spark, sf_dir, "events")["events"]
    hour = F.hour(F.col("ts"))
    band = (
        F.when(hour < 6, "night")
        .when(hour < 12, "morning")
        .when(hour < 18, "afternoon")
        .otherwise("evening")
    )
    pu = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 100.0), 1
                ).otherwise(0)
            ).alias("label"),
            F.min_by(band, F.col("ts")).alias("stratum"),
        )
        .select(
            (F.col("user_id") % 2).cast("int").alias("variant"), "label", "stratum"
        )
        # feeds the stratum cells and the pooled cells
        .transform(cut_lineage)
    )
    cell = pu.groupBy("stratum", "variant").agg(
        F.count("*").alias("n"), F.sum("label").alias("x")
    ).unionAll(
        pu.groupBy("variant")
        .agg(F.count("*").alias("n"), F.sum("label").alias("x"))
        .select(F.lit("pooled").alias("stratum"), "variant", "n", "x")
    )
    c = lambda vv, col: F.max(F.when(F.col("variant") == vv, F.col(col)))  # noqa: E731
    wide = cell.groupBy("stratum").agg(
        c(0, "n").alias("n0"),
        c(0, "x").alias("x0"),
        c(1, "n").alias("n1"),
        c(1, "x").alias("x1"),
    )
    scored = (
        wide.filter(F.col("n0").isNotNull() & F.col("n1").isNotNull())
        .withColumn(
            "diff", F.col("x1") * 1.0 / F.col("n1") - F.col("x0") * 1.0 / F.col("n0")
        )
        .transform(cut_lineage)
    )
    pooled = scored.filter(F.col("stratum") == "pooled").select(
        F.col("diff").alias("pdiff")
    )
    q6 = lambda cc: F.floor(cc * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return scored.crossJoin(F.broadcast(pooled)).select(
        "stratum",
        (F.col("n0") + F.col("n1")).cast("bigint").alias("n_users"),
        q6(F.col("x0") * 1.0 / F.col("n0")).alias("cvr_control"),
        q6(F.col("x1") * 1.0 / F.col("n1")).alias("cvr_treatment"),
        q6(F.col("diff")).alias("effect"),
        (
            (F.col("stratum") != "pooled") & (F.col("diff") * F.col("pdiff") < 0)
        ).alias("sign_reversal"),
    )


# ---------------------------------------------------------------------------
# Sample-ratio mismatch by segment
# ---------------------------------------------------------------------------

_SRM_SEG_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               MIN_BY(CASE WHEN EXTRACT(HOUR FROM ts) < 6 THEN 'night'
                           WHEN EXTRACT(HOUR FROM ts) < 12 THEN 'morning'
                           WHEN EXTRACT(HOUR FROM ts) < 18 THEN 'afternoon'
                           ELSE 'evening' END, ts) AS segment
        FROM events GROUP BY user_id
    ), wide AS (
        SELECT segment,
               SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
               SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1
        FROM pu GROUP BY segment
    )
    SELECT segment, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           FLOOR((n0 - n1) * (n0 - n1) * 1e6 / (n0 + n1)) / 1e6 AS srm_chi2,
           (n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1) > {_AB_CHI2_95} AS srm_flag
    FROM wide
"""


@query("ab_srm_by_segment", oracle=_SRM_SEG_SQL)
def ab_srm_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch PER SEGMENT: the 50/50 chi-square guard of
    ab_ztest_srm run within each behavioral segment (first-event
    time-of-day band) — the localization step after (or even without)
    a global SRM alarm, because biased exposure logging usually lives
    in ONE surface/segment and the global test dilutes it. A flagged
    segment means that slice's data is untrustworthy regardless of the
    overall readout.

    Exactness: segment assignment is the deterministic MIN_BY
    first-event band; counts are exact integers; the chi-square
    statistic is the exact integer rational (n0-n1)²/(n0+n1) with the
    same spelling and 95% critical constant as ab_ztest_srm.

    Scale: one user-grain aggregate and a |segments|-row reduction."""
    ev = _t(spark, sf_dir, "events")["events"]
    hour = F.hour(F.col("ts"))
    band = (
        F.when(hour < 6, "night")
        .when(hour < 12, "morning")
        .when(hour < 18, "afternoon")
        .otherwise("evening")
    )
    pu = ev.groupBy("user_id").agg(F.min_by(band, F.col("ts")).alias("segment")).select(
        (F.col("user_id") % 2).cast("int").alias("variant"), "segment"
    )
    wide = pu.groupBy("segment").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    chi2 = (n0 - n1) * (n0 - n1) * 1.0 / (n0 + n1)
    return wide.select(
        "segment",
        n0.cast("bigint").alias("n0"),
        n1.cast("bigint").alias("n1"),
        (F.floor((n0 - n1) * (n0 - n1) * 1e6 / (n0 + n1)) / 1e6).alias("srm_chi2"),
        (chi2 > _AB_CHI2_95).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Power-law fit of the degree distribution
# ---------------------------------------------------------------------------


def _powerlaw_sql() -> str:
    from es_analytics_spark.queries_sql4 import _TRI_CAP, _TRI_STRIDE

    return f"""
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
    ), hist AS (
        SELECT d, COUNT(*) AS nd FROM deg GROUP BY d
    ), pts AS (
        SELECT LN(d * 1.0) AS x, LN(nd * 1.0) AS y FROM hist WHERE d >= 2
    ), fit AS (
        SELECT COUNT(*) AS npts,
               {dsum_expr('x')} AS sx, {dsum_expr('x * x')} AS sxx,
               {dsum_expr('y')} AS sy, {dsum_expr('x * y')} AS sxy,
               {dsum_expr('y * y')} AS syy
        FROM pts
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST(npts AS BIGINT) AS n_degree_levels,
           CASE WHEN npts * sxx - sx * sx = 0 THEN 0.0
                ELSE FLOOR(-((npts * sxy - sx * sy) / (npts * sxx - sx * sx))
                           * 1e6 + 0.5) / 1e6 END AS powerlaw_alpha,
           CASE WHEN (npts * sxx - sx * sx) * (npts * syy - sy * sy) <= 0 THEN 0.0
                ELSE FLOOR((npts * sxy - sx * sy)
                           / SQRT((npts * sxx - sx * sx) * (npts * syy - sy * sy))
                           * 1e6 + 0.5) / 1e6 END AS fit_corr
    FROM fit
"""


@query("graph_powerlaw_fit", oracle=_powerlaw_sql())
def graph_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent of the co-supply graph's degree distribution:
    the log-log slope of (degree, #nodes-with-degree) over degrees ≥ 2
    with the fit correlation — scale-free networks sit near alpha 2-3
    with |corr| ≈ 1; a flat or broken fit means the graph is random or
    truncated, which changes which algorithms (PageRank vs k-core vs
    community) are even meaningful. The graph-health screen read
    before the graph family's results.

    Exactness: degrees and histogram counts are exact integers; each
    log point is one LN op (quantize-at-6 precedent); regression
    moments go through the decimal contract; slope/correlation are
    fixed IEEE trees with degenerate cases defined identically.

    Scale: reuses the checkpointed capped edge list; the degree
    histogram is two node-grain aggregates; the fit is a
    |degree-levels|-row reduction."""
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    edges = _co_supply_edges(spark, sf_dir)
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
        # feeds the node count and the histogram
        .transform(cut_lineage)
    )
    hist = deg.groupBy("d").agg(F.count("*").alias("nd"))
    pts = hist.filter(F.col("d") >= 2).select(
        F.log(F.col("d") * 1.0).alias("x"), F.log(F.col("nd") * 1.0).alias("y")
    )
    fit = pts.agg(
        F.count("*").alias("npts"),
        dsum("x").alias("sx"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    )
    nn = deg.agg(F.count("*").alias("n_nodes"))
    npts, sx, sxx, sy, sxy, syy = (
        F.col(c) for c in ("npts", "sx", "sxx", "sy", "sxy", "syy")
    )
    slope_den = npts * sxx - sx * sx
    slope = (npts * sxy - sx * sy) / slope_den
    corr_den2 = (npts * sxx - sx * sx) * (npts * syy - sy * sy)
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return fit.crossJoin(F.broadcast(nn)).select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        npts.cast("bigint").alias("n_degree_levels"),
        F.when(slope_den == 0, F.lit(0.0)).otherwise(q6(-slope)).alias(
            "powerlaw_alpha"
        ),
        F.when(corr_den2 <= 0, F.lit(0.0))
        .otherwise(
            q6((npts * sxy - sx * sy) / F.sqrt(corr_den2))
        )
        .alias("fit_corr"),
    )
