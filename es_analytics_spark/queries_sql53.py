"""Round-7 batch-53 surface: Haar multi-resolution energy decomposition
and the Hill tail-index estimator.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Haar wavelet energy by scale (multi-resolution variance decomposition)
# ---------------------------------------------------------------------------

_HAAR_LEVELS = 4

_HAAR_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_DIFF('day',
                   (SELECT MIN(DATE_TRUNC('day', ts)) FROM events),
                   DATE_TRUNC('day', ts)) AS BIGINT) AS i,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ),
    lvl0 AS (SELECT i, y AS a FROM daily),
    lvl1 AS MATERIALIZED (
        SELECT e.i // 2 AS i, (e.a + o.a) / 2.0 AS a, (e.a - o.a) / 2.0 AS d
        FROM lvl0 e JOIN lvl0 o ON o.i = e.i + 1 AND e.i % 2 = 0
    ),
    lvl2 AS MATERIALIZED (
        SELECT e.i // 2 AS i, (e.a + o.a) / 2.0 AS a, (e.a - o.a) / 2.0 AS d
        FROM lvl1 e JOIN lvl1 o ON o.i = e.i + 1 AND e.i % 2 = 0
    ),
    lvl3 AS MATERIALIZED (
        SELECT e.i // 2 AS i, (e.a + o.a) / 2.0 AS a, (e.a - o.a) / 2.0 AS d
        FROM lvl2 e JOIN lvl2 o ON o.i = e.i + 1 AND e.i % 2 = 0
    ),
    lvl4 AS MATERIALIZED (
        SELECT e.i // 2 AS i, (e.a + o.a) / 2.0 AS a, (e.a - o.a) / 2.0 AS d
        FROM lvl3 e JOIN lvl3 o ON o.i = e.i + 1 AND e.i % 2 = 0
    ),
    energies AS (
        SELECT 1 AS level, 2 AS scale_days, COUNT(*) AS n_coeffs,
               {dsum_expr('d * d')} AS energy FROM lvl1
        UNION ALL
        SELECT 2, 4, COUNT(*), {dsum_expr('d * d')} FROM lvl2
        UNION ALL
        SELECT 3, 8, COUNT(*), {dsum_expr('d * d')} FROM lvl3
        UNION ALL
        SELECT 4, 16, COUNT(*), {dsum_expr('d * d')} FROM lvl4
    ), tot AS (
        SELECT {dsum_expr('energy')} AS te FROM energies
    )
    SELECT CAST(e.level AS BIGINT) AS level,
           CAST(e.scale_days AS BIGINT) AS scale_days,
           CAST(e.n_coeffs AS BIGINT) AS n_coeffs,
           FLOOR(e.energy * 1e4 + 0.5) / 1e4 AS energy,
           FLOOR(e.energy / t.te * 1e6 + 0.5) / 1e6 AS energy_share
    FROM energies e CROSS JOIN tot t
    ORDER BY e.level
"""


@query("ts_haar_energy", oracle=_HAAR_SQL)
def ts_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy decomposition of daily revenue across
    {_HAAR_LEVELS} dyadic scales (2/4/8/16-day details): each level
    pairs consecutive approximations into a smooth (mean) and a detail
    (half-difference); the detail energies say WHERE the variance
    lives — day-to-day churn (level 1), weekly texture (2-3), or
    fortnight-plus regime moves (4). The multi-resolution companion to
    ts_spectral_entropy (Fourier assumes stationarity and global
    sinusoids; Haar localizes bursts and steps, which is what revenue
    series actually contain).

    Exactness: daily values come from the decimal contract; every
    average/difference divides by the exact power of 2 (an exact IEEE
    operation — no rounding ever occurs), so coefficients are
    identical doubles in both engines; squared details sum through the
    decimal contract and shares quantize at 1e6. Odd-length tails at
    each level are dropped (the standard truncated-dyadic convention,
    identical in both plans by the paired-index join).

    Scale: level l has n/2^l coefficients — the whole pyramid is O(n)
    over the CALENDAR-bounded daily grain, built with index-halving
    equi-joins (no windows at all)."""
    ev = _t(spark, sf_dir, "events")["events"]
    day0 = ev.agg(F.min(F.date_trunc("day", "ts")).alias("day0"))
    lvl = (
        ev.crossJoin(F.broadcast(day0))
        .groupBy(
            F.datediff(F.date_trunc("day", "ts"), F.col("day0"))
            .cast("bigint")
            .alias("i")
        )
        .agg(dsum("value").alias("a"))
        .transform(cut_lineage)
    )
    energies = None
    for level in range(1, _HAAR_LEVELS + 1):
        e = lvl.filter(F.col("i") % 2 == 0).select(
            (F.col("i") / 2).cast("bigint").alias("i"), F.col("a").alias("ae")
        )
        o = lvl.filter(F.col("i") % 2 == 1).select(
            ((F.col("i") - 1) / 2).cast("bigint").alias("i"), F.col("a").alias("ao")
        )
        paired = e.join(o, "i").select(
            "i",
            ((F.col("ae") + F.col("ao")) / 2.0).alias("a"),
            ((F.col("ae") - F.col("ao")) / 2.0).alias("d"),
        ).transform(cut_lineage)
        erow = paired.agg(
            F.count("*").cast("bigint").alias("n_coeffs"),
            dsum(F.col("d") * F.col("d")).alias("energy"),
        ).select(
            F.lit(level).cast("bigint").alias("level"),
            F.lit(2 ** level).cast("bigint").alias("scale_days"),
            "n_coeffs",
            "energy",
        )
        energies = erow if energies is None else energies.unionAll(erow)
        lvl = paired.select("i", "a")
    energies = energies.transform(cut_lineage)
    tot = energies.agg(dsum("energy").alias("te"))
    return (
        energies.crossJoin(F.broadcast(tot))
        .select(
            "level",
            "scale_days",
            "n_coeffs",
            (F.floor(F.col("energy") * 1e4 + F.lit(0.5)) / 1e4).alias("energy"),
            _q6(F.col("energy") / F.col("te")).alias("energy_share"),
        )
        .orderBy("level")
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator over top order statistics
# ---------------------------------------------------------------------------

# top-k order statistics in the tail; sized to the smallest fixture's
# positive-revenue population (15 users at sf0.001) — at production
# scale k is the bias/variance knob (hundreds to thousands)
_HILL_K = 10

_HILL_SQL = f"""
    WITH pu AS (
        SELECT user_id,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), topk AS MATERIALIZED (
        SELECT rev, ROW_NUMBER() OVER (ORDER BY rev DESC, user_id ASC) AS rn
        FROM pu WHERE rev > 0
        ORDER BY rev DESC LIMIT {_HILL_K}
    ), xk AS (
        SELECT rev AS x_k FROM topk WHERE rn = {_HILL_K}
    ), terms AS (
        SELECT FLOOR(LN(t.rev / x.x_k) * 1e6 + 0.5) / 1e6 AS lr
        FROM topk t CROSS JOIN xk x WHERE t.rn < {_HILL_K}
    ), agg AS (
        SELECT COUNT(*) AS k1, {dsum_expr('lr')} AS s FROM terms
    )
    SELECT CAST(k1 + 1 AS BIGINT) AS k,
           (SELECT FLOOR(x_k * 1e4 + 0.5) / 1e4 FROM xk) AS tail_threshold,
           FLOOR(k1 / s * 1e6 + 0.5) / 1e6 AS hill_alpha,
           FLOOR(s / k1 * 1e6 + 0.5) / 1e6 AS mean_log_excess,
           k1 / s <= 2.0 AS infinite_variance_tail
    FROM agg
"""


@query("stat_hill_tail_index", oracle=_HILL_SQL)
def stat_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate over the top-{_HILL_K} per-user
    revenues: alpha = (k-1) / sum ln(x_(i)/x_(k)) — the standard
    Pareto-tail exponent. alpha <= 2 means the tail has INFINITE
    variance, which invalidates every CLT-based CI in the
    experimentation stack (ab_welch_ttest's SEs, bootstrap coverage) —
    this is the gate that says whether mean-based readouts are even
    meaningful, complementing stat_lognormal_fit (lognormal = all
    moments finite) and stat_tail_cvar (which quantifies, not tests,
    the tail). graph_powerlaw_fit applies the same idea to degrees;
    this applies it to the revenue measure itself.

    Exactness: the top-k order statistics are an exact TakeOrdered
    selection with user-id tie-breaks; each log-excess goes through
    the quantize-at-6 contract and sums through the decimal contract;
    alpha is one quantized division.

    Scale: TakeOrderedAndProject keeps k rows per task and k to the
    driver-side plan — no global sort; everything after is k-row
    arithmetic."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = ev.groupBy("user_id").agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("rev")
    )
    topk = (
        pu.filter(F.col("rev") > 0)
        .orderBy(F.col("rev").desc(), F.col("user_id").asc())
        .limit(_HILL_K)
        .select("rev", "user_id")
        .transform(cut_lineage)
    )
    xk = (
        topk.orderBy(F.col("rev").asc(), F.col("user_id").desc())
        .limit(1)
        .select(F.col("rev").alias("x_k"))
    )
    # rank-(<k) semantics under ties: threshold-valued rows contribute
    # lr = 0 exactly (floor(ln(1)*1e6 + 0.5) = 0), so summing over ALL
    # top-k rows and counting k-1 terms reproduces the oracle's
    # rn < k selection without materializing ranks
    terms = topk.crossJoin(F.broadcast(xk)).select(
        (F.floor(F.log(F.col("rev") / F.col("x_k")) * 1e6 + F.lit(0.5)) / 1e6)
        .alias("lr")
    )
    agg = terms.agg((F.count("*") - 1).alias("k1"), dsum("lr").alias("s"))
    alpha = F.col("k1") / F.col("s")
    return agg.crossJoin(F.broadcast(xk)).select(
        (F.col("k1") + 1).cast("bigint").alias("k"),
        (F.floor(F.col("x_k") * 1e4 + F.lit(0.5)) / 1e4).alias("tail_threshold"),
        _q6(alpha).alias("hill_alpha"),
        _q6(F.col("s") / F.col("k1")).alias("mean_log_excess"),
        (alpha <= 2.0).alias("infinite_variance_tail"),
    )
