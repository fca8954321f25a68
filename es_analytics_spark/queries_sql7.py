"""Round-5 batch-6 surface: per-node clustering coefficients, power-user
activity curves, local-maxima peak detection, temperature-scaled domain
mixing, embedding outlier ranking, a Bloom-filter membership sketch with
measured FPR, price-volume-mix revenue decomposition, quantified
subqueries (ANY/ALL), hapax-legomena lexical richness, and Spearman rank
correlation.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine stable
via the decimal-sum contract, integer fixed-point intermediates, or
single-op IEEE chains (sqrt / one division / one multiply are each
correctly rounded everywhere; chains are parenthesized identically in
both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from es_analytics_spark.functions.exact import dsum_expr
from es_analytics_spark.queries import _t, query


# ---------------------------------------------------------------------------
# Local clustering coefficient over the co-supply graph
# ---------------------------------------------------------------------------

def _cc_sql() -> str:
    from es_analytics_spark.queries_sql4 import _TRI_CAP, _TRI_STRIDE

    return f"""
    WITH ps AS (
        SELECT DISTINCT l_partkey AS p, l_suppkey AS s
        FROM lineitem WHERE l_partkey % {_TRI_STRIDE} = 0
    ), keep AS (
        SELECT p FROM ps GROUP BY p HAVING COUNT(*) <= {_TRI_CAP}
    ), e AS MATERIALIZED (
        SELECT DISTINCT a.s AS u, b.s AS v
        FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
        JOIN keep k ON a.p = k.p
    ), deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY node
    ), tri AS MATERIALIZED (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ), pert AS (
        SELECT node, COUNT(*) AS t FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    )
    SELECT d.node, CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(p.t, 0) AS BIGINT) AS n_triangles,
           CASE WHEN d.d >= 2
                THEN FLOOR(2.0 * COALESCE(p.t, 0)
                           / (CAST(d.d AS DOUBLE) * (d.d - 1)) * 1e6 + 0.5) / 1e6
                ELSE 0.0 END AS clustering
    FROM deg d LEFT JOIN pert p ON p.node = d.node
    """


@query("graph_clustering_coefficient", oracle=_cc_sql())
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient 2T(v) / (d(v)(d(v)-1)) on
    the capped co-supply graph — the "how clique-like is each node's
    neighborhood" metric behind community seeding and spam-node
    detection. Extends graph_triangle_count (global count) to the
    per-node profile: each ordered triangle (a<b<c) credits all three
    corners via a 3-way union, then joins onto degrees.

    Exactness: coefficient = ((2.0*T)/(d*(d-1)))*1e6 quantized — one
    multiply, one division, one multiply, identically parenthesized in
    both engines over exact integer inputs.

    Scale: same bounded derivation as graph_triangle_count
    (stride-sampled parts, per-part supplier cap => edge list and
    triangle join are cap-bounded, never |lineitem|-sized); the
    wedge-close join shuffles edge-sized frames only; per-node credit
    is a map-side-combinable groupBy. 100 TB: the cap is the contract.
    """
    from es_analytics_spark.queries_sql4 import _co_supply_edges

    e = _co_supply_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    pert = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    t = F.coalesce(F.col("t"), F.lit(0))
    d = F.col("d")
    coeff = F.when(
        d >= 2,
        F.floor(
            F.lit(2.0) * t / (d.cast("double") * (d - 1)) * F.lit(1e6) + F.lit(0.5)
        )
        / 1e6,
    ).otherwise(F.lit(0.0))
    return deg.join(pert, "node", "left").select(
        "node",
        d.cast("long").alias("degree"),
        t.cast("long").alias("n_triangles"),
        coeff.alias("clustering"),
    )


# ---------------------------------------------------------------------------
# Power-user curve: distribution of active days in the first 28 days
# ---------------------------------------------------------------------------

_POWER_CURVE_SQL = """
    WITH bounds AS (
        SELECT MIN(ts) AS t0 FROM events
    ), d AS (
        SELECT user_id, CAST(ts AS DATE) AS day
        FROM events, bounds
        WHERE ts < t0 + INTERVAL 28 DAY
        GROUP BY 1, 2
    ), u AS (
        SELECT user_id, COUNT(*) AS active_days FROM d GROUP BY 1
    ), tot AS (
        SELECT COUNT(*) AS n FROM u
    )
    SELECT CAST(active_days AS BIGINT) AS active_days,
           COUNT(*) AS n_users,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / CAST(t.n AS DOUBLE) * 1e6 + 0.5) / 1e6
             AS user_share
    FROM u CROSS JOIN tot t
    GROUP BY active_days, t.n
"""


@query("ts_power_user_curve", oracle=_POWER_CURVE_SQL)
def ts_power_user_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-user curve (the L28 histogram): for each user, the number
    of distinct active days inside the first 28 days of the fixture,
    then the distribution of users over that count — the
    growth-accounting companion that separates "many barely-active
    users" from "a core of daily users" (ts_dau_wau_stickiness gives
    the ratio; this gives the whole shape).

    The 28-day window anchors to MIN(ts) (a 1-row broadcast), so the
    entry is deterministic for any fixture span.

    Scale: user×day distinct → per-user count → histogram, all
    map-side-combinable groupBys keyed on user then on the bounded
    active-day count (≤ 28 buckets); the total is a 1-row broadcast
    cross join. No window functions, no data-sized single partition.
    """
    ev = _t(spark, sf_dir, "events")["events"]
    t0 = ev.agg(F.min("ts").alias("t0"))
    d = (
        ev.crossJoin(F.broadcast(t0))
        .filter(F.col("ts") < F.col("t0") + F.expr("INTERVAL 28 DAYS"))
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    u = d.groupBy("user_id").agg(F.count(F.lit(1)).alias("active_days"))
    tot = u.agg(F.count(F.lit(1)).alias("n"))
    return (
        u.crossJoin(F.broadcast(tot))
        .groupBy("active_days", "n")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("active_days").cast("long").alias("active_days"),
            "n_users",
            (
                F.floor(
                    F.col("n_users").cast("double") / F.col("n").cast("double")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("user_share"),
        )
    )


# ---------------------------------------------------------------------------
# Peak detection: strict local maxima of the daily revenue series
# ---------------------------------------------------------------------------

_PEAKS_SQL = f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, {dsum_expr('value')} AS daily_value
        FROM events GROUP BY 1
    ), lagged AS (
        SELECT day, daily_value,
               LAG(daily_value) OVER (ORDER BY day) AS prev,
               LEAD(daily_value) OVER (ORDER BY day) AS next
        FROM daily
    )
    SELECT day, daily_value,
           ROUND(daily_value - GREATEST(prev, next), 4) AS prominence
    FROM lagged
    WHERE prev IS NOT NULL AND next IS NOT NULL
      AND daily_value > prev AND daily_value > next
"""


@query("ts_peak_detection", oracle=_PEAKS_SQL)
def ts_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict local maxima of the daily metric series: days whose total
    strictly exceeds both neighbors, with prominence = peak − the
    higher neighbor — the campaign-spike / incident-detection primitive
    that feeds anomaly triage (ts_anomaly_* score deviations; this
    reports the peaks themselves with their margin).

    Daily totals use the decimal-sum contract, so the neighbor
    comparisons and the prominence subtraction run on bit-identical
    doubles in both engines.

    Scale: one data-sized groupBy to the daily grain; the lag/lead
    window runs over one row per calendar day — bounded by time, not
    data (the ts_cumulative_users bound), hence the plan-guard
    allowlist entry.
    """
    from es_analytics_spark.functions.exact import dsum

    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        dsum("value").alias("daily_value")
    )
    w = W.orderBy("day")
    lagged = daily.select(
        "day",
        "daily_value",
        F.lag("daily_value").over(w).alias("prev"),
        F.lead("daily_value").over(w).alias("next"),
    )
    return lagged.filter(
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (F.col("daily_value") > F.col("prev"))
        & (F.col("daily_value") > F.col("next"))
    ).select(
        F.col("day").cast("timestamp").alias("day"),
        "daily_value",
        F.round(
            F.col("daily_value") - F.greatest("prev", "next"), 4
        ).alias("prominence"),
    )


# ---------------------------------------------------------------------------
# Temperature-scaled domain mixing (tau = 0.5)
# ---------------------------------------------------------------------------

_TEMP_MIX_SQL = """
    WITH s AS (
        SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), q AS (
        SELECT source, n_docs,
               CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS sq_fp
        FROM s
    ), t AS (
        SELECT CAST(SUM(sq_fp) AS BIGINT) AS s_sum, CAST(SUM(n_docs) AS BIGINT) AS n_tot
        FROM q
    ), shares AS (
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               FLOOR(CAST(n_docs AS DOUBLE) / t.n_tot * 1e6 + 0.5) / 1e6 AS raw_share,
               FLOOR(CAST(sq_fp AS DOUBLE) / t.s_sum * 1e6 + 0.5) / 1e6 AS temp_share
        FROM q CROSS JOIN t
    )
    SELECT source, n_docs, raw_share, temp_share,
           ROUND(temp_share - raw_share, 6) AS share_uplift
    FROM shares
"""


@query("ml_temperature_mix", oracle=_TEMP_MIX_SQL)
def ml_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixing weights at tau = 0.5 (the
    multilingual-training upsampling rule w_i ∝ p_i^tau): per source,
    the raw corpus share and the temperature share sqrt(n_i)/Σ sqrt(n_j)
    — sqrt(p) normalized equals sqrt(n) normalized, so no intermediate
    ratio is needed. share_uplift > 0 marks tail domains the schedule
    boosts; < 0 marks head domains it suppresses — the knob between
    "train on the natural distribution" and "uniform over domains"
    (ml_domain_mix_sample draws by fixed weights; this derives them).

    Exactness: sqrt over an exact integer count is one
    correctly-rounded IEEE op; it is then fixed-pointed to 1e-6
    (BIGINT), so both normalizing sums are exact integer sums and each
    share is a single double division, quantized.

    Scale: |sources| rows after one map-side-combinable count; the
    normalizer is a 1-row cross-joined broadcast.
    """
    docs = _t(spark, sf_dir, "documents")["documents"]
    s = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    q = s.withColumn(
        "sq_fp",
        F.floor(
            F.sqrt(F.col("n_docs").cast("double")) * F.lit(1e6) + F.lit(0.5)
        ).cast("long"),
    )
    t = q.agg(
        F.sum("sq_fp").cast("long").alias("s_sum"),
        F.sum("n_docs").cast("long").alias("n_tot"),
    )
    raw_share = (
        F.floor(
            F.col("n_docs").cast("double") / F.col("n_tot") * F.lit(1e6) + F.lit(0.5)
        )
        / 1e6
    )
    temp_share = (
        F.floor(
            F.col("sq_fp").cast("double") / F.col("s_sum") * F.lit(1e6) + F.lit(0.5)
        )
        / 1e6
    )
    return (
        q.crossJoin(F.broadcast(t))
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            raw_share.alias("raw_share"),
            temp_share.alias("temp_share"),
        )
        .withColumn(
            "share_uplift", F.round(F.col("temp_share") - F.col("raw_share"), 6)
        )
    )


# ---------------------------------------------------------------------------
# Embedding outliers: farthest-from-centroid per label (fixed-point)
# ---------------------------------------------------------------------------

_EMB_OUT_SQL = """
    WITH ex AS (
        SELECT vec_id, label, generate_subscripts(embedding, 1) AS dim,
               CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS q
        FROM embeddings
    ), cent AS (
        SELECT label, dim, CAST(SUM(q) AS BIGINT) AS s, COUNT(*) AS n
        FROM ex GROUP BY 1, 2
    ), dist AS (
        SELECT e.vec_id, e.label,
               CAST(SUM((c.n * e.q - c.s) * (c.n * e.q - c.s)) AS BIGINT) AS d2_scaled
        FROM ex e JOIN cent c ON c.label = e.label AND c.dim = e.dim
        GROUP BY 1, 2
    ), ranked AS (
        SELECT vec_id, label, d2_scaled,
               ROW_NUMBER() OVER (
                   PARTITION BY label ORDER BY d2_scaled DESC, vec_id
               ) AS rnk
        FROM dist
    )
    SELECT vec_id, label, d2_scaled, CAST(rnk AS INTEGER) AS rnk
    FROM ranked WHERE rnk <= 5
"""


@query("ml_embedding_outliers", oracle=_EMB_OUT_SQL)
def ml_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 farthest-from-centroid vectors per label — the
    embedding-hygiene sweep that surfaces mislabeled / out-of-domain
    rows before they poison an index or a fine-tune (sim_group_centroids
    summarizes the centers; this ranks what's farthest from them).

    Exactness: components are fixed-pointed at 1e-4; with per-label
    per-dim centroid numerator S and count n, squared distance to the
    mean is computed scaled by n² — Σ_d (n·q_d − S_d)² — which is exact
    BIGINT arithmetic end to end (no division, no floats), so the
    ranking and the reported d2_scaled are bit-identical everywhere.

    Scale: explode is 64×|embeddings| but map-local; both groupBys are
    map-side combinable on bounded keys (label×dim, then vec); the
    top-5 window partitions by label (hash exchange, never a single
    partition). The n² scaling keeps magnitudes < 2^53 for n up to
    ~10^5 rows/label at this quantization — re-scale q for larger
    cohorts.
    """
    e = _t(spark, sf_dir, "embeddings")["embeddings"]
    ex = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "x"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * F.lit(1e4) + F.lit(0.5))
        .cast("long")
        .alias("q"),
    )
    cent = ex.groupBy("label", "dim").agg(
        F.sum("q").cast("long").alias("s"), F.count(F.lit(1)).alias("n")
    )
    diff = F.col("n") * F.col("q") - F.col("s")
    dist = (
        ex.join(cent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum(diff * diff).cast("long").alias("d2_scaled"))
    )
    w = W.partitionBy("label").orderBy(F.col("d2_scaled").desc(), "vec_id")
    return (
        dist.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("vec_id", "label", "d2_scaled", F.col("rnk").cast("int").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# Quantified subqueries: > ALL / < ANY against a reference brand
# ---------------------------------------------------------------------------

_ANY_ALL_SQL = """
    SELECT p_partkey, p_brand, p_retailprice,
           p_retailprice > ALL (SELECT p_retailprice FROM part
                                WHERE p_brand = 'Brand#13') AS gt_all_b13,
           p_retailprice < ANY (SELECT p_retailprice FROM part
                                WHERE p_brand = 'Brand#13') AS lt_any_b13
    FROM part
    WHERE p_brand <> 'Brand#13'
"""


@query("subq_any_all", oracle=_ANY_ALL_SQL)
def subq_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison subqueries (`> ALL`, `< ANY`) — the ANSI
    surface Spark SQL does not parse, expressed the way every engine
    actually executes them: decorrelated to a one-row MIN/MAX aggregate
    of the subquery and a broadcast comparison (`x > ALL S` = `x >
    max(S)`, `x < ANY S` = `x < max(S)`; valid here because Brand#13 is
    non-empty and p_retailprice is non-NULL — the NULL-quantifier edge
    cases don't arise, and the oracle's native ANY/ALL agrees).

    Scale: the subquery collapses to a single-row aggregate broadcast
    to the scan — no shuffle of the probe side at all; the classic
    decorrelation every optimizer (including Catalyst for IN/EXISTS)
    performs.
    """
    p = _t(spark, sf_dir, "part")["part"]
    ref = p.filter(F.col("p_brand") == "Brand#13").agg(
        F.max("p_retailprice").alias("mx")
    )
    return (
        p.filter(F.col("p_brand") != "Brand#13")
        .crossJoin(F.broadcast(ref))
        .select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            (F.col("p_retailprice") > F.col("mx")).alias("gt_all_b13"),
            (F.col("p_retailprice") < F.col("mx")).alias("lt_any_b13"),
        )
    )


# ---------------------------------------------------------------------------
# Price-volume-mix decomposition of revenue change, 1996 -> 1997
# ---------------------------------------------------------------------------

_PVM_SQL = f"""
    WITH per AS (
        SELECT p_brand,
               {dsum_expr("CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1996 "
                          "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS rev_a,
               {dsum_expr("CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1997 "
                          "THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS rev_b,
               CAST(SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1996
                        THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_a,
               CAST(SUM(CASE WHEN EXTRACT(YEAR FROM l_shipdate) = 1997
                        THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_b
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE EXTRACT(YEAR FROM l_shipdate) IN (1996, 1997)
        GROUP BY p_brand
        HAVING qty_a > 0 AND qty_b > 0
    ), pr AS (
        SELECT p_brand, rev_a, rev_b, qty_a, qty_b,
               FLOOR(rev_a / CAST(qty_a AS DOUBLE) * 1e6 + 0.5) / 1e6 AS price_a,
               FLOOR(rev_b / CAST(qty_b AS DOUBLE) * 1e6 + 0.5) / 1e6 AS price_b
        FROM per
    ), eff AS (
        SELECT p_brand, rev_a, rev_b, qty_a, qty_b,
               FLOOR(CAST(qty_b - qty_a AS DOUBLE) * price_a * 1e4 + 0.5) / 1e4 AS volume_effect,
               FLOOR((price_b - price_a) * CAST(qty_b AS DOUBLE) * 1e4 + 0.5) / 1e4 AS price_effect
        FROM pr
    )
    SELECT p_brand, qty_a, qty_b, rev_a, rev_b,
           volume_effect, price_effect,
           FLOOR((((rev_b - rev_a) - volume_effect) - price_effect) * 1e4 + 0.5) / 1e4
               AS mix_residual
    FROM eff
"""


@query("agg_price_volume_mix", oracle=_PVM_SQL)
def agg_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix decomposition of per-brand revenue change
    between two fiscal years: ΔRev = volume effect (qty change at old
    price) + price effect (price change at new volume) + mix residual —
    the FP&A bridge chart behind every "why did revenue move" readout.

    Exactness: revenues use the decimal-sum contract and quantities are
    exact BIGINTs, so the derived average prices are one correctly
    rounded IEEE division fixed-pointed at 1e-6; each effect is a
    single multiply over those quantized inputs, half-up at 1e-4, and
    the residual subtracts in one pinned association order — every
    float op is individually correctly rounded and identically
    parenthesized in both engines.

    Scale: one hash join lineitem->part on the part key (AQE broadcasts
    the dim when it fits; at TPC-H shape part is ~1/30 of lineitem) and
    one 25-key groupBy with map-side partial aggregation; the effect
    arithmetic runs on the |brands| frame.
    """
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    p = _t(spark, sf_dir, "part")["part"]
    from es_analytics_spark.functions.exact import dsum

    yr = F.year("l_shipdate")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    per = (
        li.filter(yr.isin(1996, 1997))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            dsum(F.when(yr == 1996, rev).otherwise(0.0)).alias("rev_a"),
            dsum(F.when(yr == 1997, rev).otherwise(0.0)).alias("rev_b"),
            F.sum(
                F.when(yr == 1996, F.col("l_quantity").cast("bigint")).otherwise(0)
            ).cast("bigint").alias("qty_a"),
            F.sum(
                F.when(yr == 1997, F.col("l_quantity").cast("bigint")).otherwise(0)
            ).cast("bigint").alias("qty_b"),
        )
        .filter((F.col("qty_a") > 0) & (F.col("qty_b") > 0))
    )

    def _fp(c, s):
        return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)

    pr = per.withColumn(
        "price_a", _fp(F.col("rev_a") / F.col("qty_a").cast("double"), 1e6)
    ).withColumn("price_b", _fp(F.col("rev_b") / F.col("qty_b").cast("double"), 1e6))
    eff = pr.withColumn(
        "volume_effect",
        _fp((F.col("qty_b") - F.col("qty_a")).cast("double") * F.col("price_a"), 1e4),
    ).withColumn(
        "price_effect",
        _fp((F.col("price_b") - F.col("price_a")) * F.col("qty_b").cast("double"), 1e4),
    )
    return eff.select(
        "p_brand",
        "qty_a",
        "qty_b",
        "rev_a",
        "rev_b",
        "volume_effect",
        "price_effect",
        _fp(
            ((F.col("rev_b") - F.col("rev_a")) - F.col("volume_effect"))
            - F.col("price_effect"),
            1e4,
        ).alias("mix_residual"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch with measured false-positive rate
# ---------------------------------------------------------------------------

_BLOOM_M = 4096          # bits (power of two => bits_set/m division is exact)
_BLOOM_P = 1_000_000_007  # modulus prime for the hash family
_BLOOM_SEEDS = ((2654435761, 97), (2246822519, 1013), (3266489917, 10007))


def _bloom_sql() -> str:
    seeds = ", ".join(f"({a}, {b})" for a, b in _BLOOM_SEEDS)
    k = len(_BLOOM_SEEDS)
    return f"""
    WITH seeds(a, b) AS (VALUES {seeds}),
    members AS (
        SELECT DISTINCT c_custkey AS key FROM customer
        WHERE c_mktsegment = 'BUILDING'
    ), probes AS (
        SELECT DISTINCT c_custkey AS key FROM customer
        WHERE c_mktsegment <> 'BUILDING'
    ), bits AS (
        SELECT DISTINCT ((key * a + b) % {_BLOOM_P}) % {_BLOOM_M} AS pos
        FROM members CROSS JOIN seeds
    ), probe_hits AS (
        SELECT p.key, COUNT(bits.pos) AS hits
        FROM (SELECT key, ((key * a + b) % {_BLOOM_P}) % {_BLOOM_M} AS pos
              FROM probes CROSS JOIN seeds) p
        LEFT JOIN bits ON p.pos = bits.pos
        GROUP BY p.key
    ), agg AS (
        SELECT (SELECT COUNT(*) FROM members) AS n_members,
               (SELECT COUNT(*) FROM probes) AS n_probes,
               (SELECT COUNT(*) FROM bits) AS bits_set,
               (SELECT COUNT(*) FROM probe_hits WHERE hits = {k}) AS false_pos
    )
    SELECT CAST(n_members AS BIGINT) AS n_members,
           CAST(n_probes AS BIGINT) AS n_probes,
           CAST(bits_set AS BIGINT) AS bits_set,
           CAST(false_pos AS BIGINT) AS false_pos,
           FLOOR(CAST(false_pos AS DOUBLE) / CAST(n_probes AS DOUBLE) * 1e6 + 0.5)
             / 1e6 AS fpr_measured,
           FLOOR((CAST(bits_set AS DOUBLE) / {_BLOOM_M})
                 * (CAST(bits_set AS DOUBLE) / {_BLOOM_M})
                 * (CAST(bits_set AS DOUBLE) / {_BLOOM_M}) * 1e6 + 0.5) / 1e6
             AS fpr_expected
    FROM agg
"""


@query("sketch_bloom_fpr", oracle=_bloom_sql())
def sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch built from one customer segment
    and probed with the complement, reporting the measured vs expected
    false-positive rate — the workhorse sketch behind join pruning and
    "have we seen this key" pre-filters (Spark's own runtime Bloom
    pushdown uses exactly this structure; here the filter itself is
    first-class and auditable).

    The k=3 hash family is portable integer arithmetic
    (((key*a + b) mod P) mod m), so the bit set — and therefore every
    count — is bit-identical in any engine; m = 4096 is a power of two,
    making bits_set/m an exact binary division and the expected-FPR
    chain (fill^k via two correctly rounded multiplies) deterministic.

    Scale: the bit set is ≤ m rows no matter the corpus (broadcast
    side); probes explode ×k then aggregate map-side by key. Nothing
    data-sized crosses a single partition; the filter memory is the
    m-bit contract, exactly why Bloom filters work at 100 TB.
    """
    c = _t(spark, sf_dir, "customer")["customer"]
    k = len(_BLOOM_SEEDS)
    seeds = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _BLOOM_SEEDS
        ]
    )
    members = (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    probes = (
        c.filter(F.col("c_mktsegment") != "BUILDING")
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )

    def _pos(df):
        s = df.select("key", F.explode(seeds).alias("s"))
        return s.select(
            "key",
            (
                (F.col("key") * F.col("s.a") + F.col("s.b")) % _BLOOM_P % _BLOOM_M
            ).alias("pos"),
        )

    bits = _pos(members).select("pos").distinct()
    probe_hits = (
        _pos(probes)
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("hits"))
    )
    agg = (
        members.agg(F.count(F.lit(1)).alias("n_members"))
        .crossJoin(probes.agg(F.count(F.lit(1)).alias("n_probes")))
        .crossJoin(bits.agg(F.count(F.lit(1)).alias("bits_set")))
        .crossJoin(
            probe_hits.filter(F.col("hits") == k)
            .agg(F.count(F.lit(1)).alias("false_pos"))
        )
    )
    fill = F.col("bits_set").cast("double") / F.lit(float(_BLOOM_M))
    return agg.select(
        F.col("n_members").cast("long").alias("n_members"),
        F.col("n_probes").cast("long").alias("n_probes"),
        F.col("bits_set").cast("long").alias("bits_set"),
        F.col("false_pos").cast("long").alias("false_pos"),
        (
            F.floor(
                F.col("false_pos").cast("double")
                / F.col("n_probes").cast("double")
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("fpr_measured"),
        (F.floor(fill * fill * fill * F.lit(1e6) + F.lit(0.5)) / 1e6).alias(
            "fpr_expected"
        ),
    )


# ---------------------------------------------------------------------------
# Hapax legomena / lexical richness per language
# ---------------------------------------------------------------------------

_HAPAX_SQL = """
    WITH words AS (
        SELECT lang, UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS w
        FROM documents WHERE n_chars > 0
    ), vocab AS (
        SELECT lang, w, COUNT(*) AS f FROM words WHERE w <> '' GROUP BY lang, w
    )
    SELECT lang,
           COUNT(*) AS vocab_size,
           CAST(SUM(f) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_count,
           CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis_count,
           FLOOR(CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS hapax_vocab_share,
           FLOOR(CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(f) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS hapax_token_share
    FROM vocab
    GROUP BY lang
"""


@query("text_hapax_richness", oracle=_HAPAX_SQL)
def text_hapax_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax/dis legomena counts and lexical-richness shares per
    language: the fraction of a corpus vocabulary seen exactly once
    (and twice) — the classic vocabulary-growth diagnostic that flags
    boilerplate-heavy (low hapax share) or OCR-noise-heavy (inflated
    hapax share) training corpora, complementing text_zipf_exponent's
    slope with the tail mass itself.

    Tokenization is the catalog's shared whitespace contract
    (lower->trim->split on \\s+, empty tokens dropped), so every count
    is an exact integer in both engines; shares are fixed-pointed
    integer/integer divisions.

    Scale: one (lang, word) groupBy over the exploded token stream
    (map-side combinable; the explode is map-local) and one |langs|-key
    rollup. No windows, no driver state.
    """
    d = _t(spark, sf_dir, "documents")["documents"]
    words = (
        d.filter(F.col("n_chars") > 0)
        .select(
            "lang",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    vocab = words.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("f"))
    hapax = F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
    return vocab.groupBy("lang").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("f").cast("long").alias("n_tokens"),
        hapax.cast("long").alias("hapax_count"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0)).cast("long").alias("dis_count"),
        (
            F.floor(
                hapax.cast("double") / F.count(F.lit(1)).cast("double") * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("hapax_vocab_share"),
        (
            F.floor(
                hapax.cast("double") / F.sum("f").cast("double") * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("hapax_token_share"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (midranks, window-free distributed ranking)
# ---------------------------------------------------------------------------

_SPEARMAN_SQL = """
    WITH pts AS (
        SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
               CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS y
        FROM part
    ), nn AS (
        SELECT COUNT(*) AS cn FROM pts
    ), gx AS (
        SELECT x, COUNT(*) AS c FROM pts GROUP BY x
    ), rx AS (
        SELECT x, 2 * (SUM(c) OVER (ORDER BY x) - c) + c + 1 AS r2 FROM gx
    ), gy AS (
        SELECT y, COUNT(*) AS c FROM pts GROUP BY y
    ), ry AS (
        SELECT y, 2 * (SUM(c) OVER (ORDER BY y) - c) + c + 1 AS r2 FROM gy
    ), j AS (
        SELECT CAST(rx.r2 - (cn + 1) AS BIGINT) AS dx,
               CAST(ry.r2 - (cn + 1) AS BIGINT) AS dy
        FROM pts
        JOIN rx ON pts.x = rx.x
        JOIN ry ON pts.y = ry.y
        CROSS JOIN nn
    ), s AS (
        SELECT CAST(SUM(dx * dy) AS BIGINT) AS num,
               CAST(SUM(dx * dx) AS BIGINT) AS vx,
               CAST(SUM(dy * dy) AS BIGINT) AS vy,
               COUNT(*) AS n
        FROM j
    )
    SELECT CAST(n AS BIGINT) AS n,
           FLOOR(CAST(num AS DOUBLE)
                 / (SQRT(CAST(vx AS DOUBLE)) * SQRT(CAST(vy AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS spearman_rho
    FROM s
"""


@query("stat_spearman", oracle=_SPEARMAN_SQL)
def stat_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between part size and retail price —
    the monotone-association measure that survives outliers and
    nonlinearity where Pearson (stat_correlation_matrix) does not.
    Midranks handle ties exactly: doubled midrank 2*c_lt + c_eq + 1 is
    integral, and centering by the doubled mean rank (n+1) keeps every
    moment in BIGINT, so rho's numerator and both variance terms are
    exact integers; rho itself is one division over a product of two
    correctly rounded sqrts, fixed-pointed at 1e-6.

    Scale: ranks come from the catalog's window-free recipe
    (value-grain counts -> repartitionByRange -> per-partition cumsum +
    broadcast triangle offsets), so nothing data-sized funnels through
    a single partition; the doubled-rank frames join back on the exact
    value key and collapse to one reduction row. Prices are quantized
    to integer cents for an exact join/rank key. BIGINT headroom: |dx|
    <= 2n so the moments are < 4n^3 — exact through n ~ 1e6 rows;
    beyond that, pre-aggregate to the value grain and widen to decimal.
    """
    from es_analytics_spark.functions.lineage import cut_lineage
    from es_analytics_spark.functions.ranks import cumulative_offsets

    p = _t(spark, sf_dir, "part")["part"]
    pts = p.select(
        "p_partkey",
        F.col("p_size").cast("long").alias("x"),
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def _rank2(col: str) -> DataFrame:
        g = pts.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        ranged = (
            g.repartitionByRange(n_parts, F.asc(col))
            .withColumn("pid", F.spark_partition_id())
            .transform(cut_lineage)
        )
        w = (
            W.partitionBy("pid")
            .orderBy(F.asc(col))
            .rowsBetween(W.unboundedPreceding, 0)
        )
        local = ranged.select(
            col, "pid", "c", (F.sum("c").over(w) - F.col("c")).alias("lprev")
        )
        cnts = ranged.groupBy("pid").agg(F.sum("c").alias("ct"))
        offs = cumulative_offsets(cnts, cnt="ct")
        return local.join(F.broadcast(offs), "pid").select(
            col,
            (2 * (F.col("lprev") + F.col("off")) + F.col("c") + 1).alias(f"r2_{col}"),
        )

    nn = pts.agg(F.count(F.lit(1)).alias("cn"))
    j = (
        pts.join(_rank2("x"), "x")
        .join(_rank2("y"), "y")
        .crossJoin(F.broadcast(nn))
        .select(
            (F.col("r2_x") - (F.col("cn") + 1)).cast("long").alias("dx"),
            (F.col("r2_y") - (F.col("cn") + 1)).cast("long").alias("dy"),
        )
    )
    s = j.agg(
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("num"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("vx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("vy"),
        F.count(F.lit(1)).alias("n"),
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        (
            F.floor(
                F.col("num").cast("double")
                / (F.sqrt(F.col("vx").cast("double")) * F.sqrt(F.col("vy").cast("double")))
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / 1e6
        ).alias("spearman_rho"),
    )
