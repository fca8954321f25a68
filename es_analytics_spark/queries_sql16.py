"""Round-5 batch-16 surface: Benjamini-Hochberg FDR over a hypothesis
family, closed-form two-feature OLS, a grid-bucketed spatial
nearest-neighbor join (new ``geo`` family), classical additive
seasonal decomposition, and a simplified-silhouette cluster-quality
score over the embeddings table.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, fixed IEEE expression trees on
identical inputs, and quantize-at-1e-6 outputs. New precedent here:
the normal CDF is pinned to the Abramowitz-Stegun 26.2.17 polynomial
(|err| < 7.5e-8), evaluated from the SAME SQL fragment on both
engines — cross-engine exactness comes from the shared tree, and the
single EXP term sits in the accepted LN/EXP-on-identical-rationals
risk class behind the 1e-6 quantizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.fanout import fan_out
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR over the (event_type x day-of-week) family
# ---------------------------------------------------------------------------

# Normal-CDF fragments shared VERBATIM between the Spark plan (F.expr)
# and the DuckDB oracle, so both engines evaluate the identical IEEE
# tree. Abramowitz-Stegun 26.2.17: for z >= 0,
#   1 - Phi(z) = pdf(z) * (b1 t + b2 t^2 + ... + b5 t^5),
#   t = 1 / (1 + 0.2316419 z).
# Every literal has <= 16 significant digits over a power-of-10
# denominator, so decimal->double conversion is a single correctly
# rounded division on both engines (bit-identical constants).
_T_EXPR = "1.0 / (1.0 + 0.2316419 * ABS(z))"
_PDF_EXPR = "0.3989422804014327 * EXP(-0.5 * z * z)"
_P2_EXPR = (
    "2.0 * pdf * (t * (0.319381530 + t * (-0.356563782 + t * (1.781477937"
    " + t * (-1.821255978 + t * 1.330274429)))))"
)

_BH_SQL = f"""
    WITH cells AS MATERIALIZED (
        SELECT event_type,
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_c,
               {dsum_expr('value')} AS s_c
        FROM events GROUP BY 1, 2
    ), gstats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_g,
               {dsum_expr('value')} AS s_g,
               {dsum_expr('value * value')} AS ss_g
        FROM events
    ), zs AS MATERIALIZED (
        SELECT event_type, dow, n_c,
               FLOOR((s_c / n_c - s_g / n_g)
                     / (SQRT((ss_g - s_g * s_g / n_g) / n_g)
                        / SQRT(CAST(n_c AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS z
        FROM cells CROSS JOIN gstats
    ), tstage AS MATERIALIZED (
        SELECT event_type, dow, n_c, z,
               {_T_EXPR} AS t, {_PDF_EXPR} AS pdf
        FROM zs
    ), ps AS MATERIALIZED (
        SELECT event_type, dow, n_c, z,
               FLOOR(({_P2_EXPR}) * 1e6 + 0.5) / 1e6 AS p
        FROM tstage
    ), ranked AS MATERIALIZED (
        SELECT event_type, dow, n_c, z, p,
               CAST(ROW_NUMBER() OVER (ORDER BY p, event_type, dow)
                    AS BIGINT) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS m
        FROM ps
    ), kk AS (
        SELECT MAX(CASE WHEN p <= (0.1 * rk) / m THEN rk END) AS k
        FROM ranked
    )
    SELECT event_type, dow, n_c AS n_obs, z, p, rk AS p_rank,
           FLOOR(((0.1 * rk) / m) * 1e6 + 0.5) / 1e6 AS bh_threshold,
           CAST(CASE WHEN rk <= COALESCE(k, 0) THEN 1 ELSE 0 END
                AS BIGINT) AS rejected
    FROM ranked CROSS JOIN kk
"""


@query("stat_bh_fdr", oracle=_BH_SQL)
def stat_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the 35-hypothesis family of
    (event_type x day-of-week) mean-value z-tests: every metrics
    platform that slices one KPI by N segments runs N simultaneous
    tests, and BH is the standard correction that bounds the expected
    fraction of false discoveries at q = 10% — the missing layer above
    the catalog's single-test entries (ab_welch_ttest, ab_ztest_srm).

    Exactness: cell/global moments are decimal-contract sums; z is a
    fixed IEEE tree quantized at 1e-6 BEFORE the CDF so both engines
    feed Phi identical doubles; the two-sided p comes from the shared
    A&S 26.2.17 fragment (one EXP — the accepted LN-class risk behind
    the quantizer); the BH step-up compares quantized p against the
    exact-rational-shaped 0.1*rank/m ladder, and the rejection
    frontier max(rank | p_rank ok) is an aggregate + broadcast, not a
    second global window.

    Scale: one map-side-combinable shuffle to the 35-cell grain; the
    global ranking window runs over |types| x 7 rows — bounded by the
    schema, not the data (plan-guard allowlisted on that bound)."""
    e = _t(spark, sf_dir, "events")["events"]
    dow = (
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) % 7
    ).cast("bigint")
    cells = (
        e.groupBy("event_type", dow.alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_c"),
            dsum("value").alias("s_c"),
        )
        .transform(cut_lineage)
    )
    glob = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        dsum("value").alias("s_g"),
        dsum(F.col("value") * F.col("value")).alias("ss_g"),
    )
    zs = cells.crossJoin(F.broadcast(glob)).select(
        "event_type",
        "dow",
        "n_c",
        _q6(
            (F.col("s_c") / F.col("n_c") - F.col("s_g") / F.col("n_g"))
            / (
                F.sqrt(
                    (F.col("ss_g") - F.col("s_g") * F.col("s_g") / F.col("n_g"))
                    / F.col("n_g")
                )
                / F.sqrt(F.col("n_c").cast("double"))
            )
        ).alias("z"),
    )
    ps = (
        zs.withColumn("t", F.expr(_T_EXPR))
        .withColumn("pdf", F.expr(_PDF_EXPR))
        .select(
            "event_type",
            "dow",
            "n_c",
            "z",
            _q6(F.expr(_P2_EXPR)).alias("p"),
        )
    )
    wrank = W.orderBy("p", "event_type", "dow")
    ranked = ps.select(
        "event_type",
        "dow",
        "n_c",
        "z",
        "p",
        F.row_number().over(wrank).cast("bigint").alias("rk"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("bigint").alias("m"),
    ).transform(cut_lineage)
    kk = ranked.agg(
        F.max(
            F.when(
                F.col("p") <= (F.lit(0.1) * F.col("rk")) / F.col("m"),
                F.col("rk"),
            )
        ).alias("k")
    )
    return ranked.crossJoin(F.broadcast(kk)).select(
        "event_type",
        "dow",
        F.col("n_c").alias("n_obs"),
        "z",
        "p",
        F.col("rk").alias("p_rank"),
        _q6((F.lit(0.1) * F.col("rk")) / F.col("m")).alias("bh_threshold"),
        F.when(F.col("rk") <= F.coalesce(F.col("k"), F.lit(0)), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Closed-form two-feature OLS (lineitem price ~ quantity + discount)
# ---------------------------------------------------------------------------

# y enters scaled by 1e-3 so every decimal sum (incl. sum of y^2) keeps
# its scale-4 unscaled value under 2^53 — the dsum decimal->double
# determinism bound — through sf10; coefficients are rescaled back to
# price units inside the fixed output tree.
_OLS_SQL = f"""
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {dsum_expr('l_quantity')} AS s1,
               {dsum_expr('l_discount')} AS s2,
               {dsum_expr('l_extendedprice / 1000.0')} AS sy,
               {dsum_expr('l_quantity * l_quantity')} AS s11,
               {dsum_expr('l_discount * l_discount')} AS s22,
               {dsum_expr('l_quantity * l_discount')} AS s12,
               {dsum_expr('l_quantity * (l_extendedprice / 1000.0)')} AS s1y,
               {dsum_expr('l_discount * (l_extendedprice / 1000.0)')} AS s2y,
               {dsum_expr('(l_extendedprice / 1000.0)'
                          ' * (l_extendedprice / 1000.0)')} AS syy
        FROM lineitem
    ), c AS (
        SELECT n, s1, s2, sy,
               s11 - s1 * s1 / n AS c11,
               s22 - s2 * s2 / n AS c22,
               s12 - s1 * s2 / n AS c12,
               s1y - s1 * sy / n AS c1y,
               s2y - s2 * sy / n AS c2y,
               syy - sy * sy / n AS cyy
        FROM s
    ), b AS (
        SELECT n, s1, s2, sy, c1y, c2y, cyy,
               (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1k,
               (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2k
        FROM c
    )
    SELECT n AS n_rows,
           FLOOR((sy / n - b1k * (s1 / n) - b2k * (s2 / n)) * 1000.0
                 * 1e6 + 0.5) / 1e6 AS intercept,
           FLOOR(b1k * 1000.0 * 1e6 + 0.5) / 1e6 AS beta_quantity,
           FLOOR(b2k * 1000.0 * 1e6 + 0.5) / 1e6 AS beta_discount,
           FLOOR((b1k * c1y + b2k * c2y) / cyy * 1e6 + 0.5) / 1e6 AS r2
    FROM b
"""


@query("ml_ols_two_features", oracle=_OLS_SQL)
def ml_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple linear regression of l_extendedprice on
    (l_quantity, l_discount) via the normal equations — the multivariate
    step past agg_linear_regression's single-feature fit: one pass
    collects the 10 Gram-matrix moments, then a Cramer's-rule 2x2
    solve yields both slopes, the intercept, and R^2 with no iteration
    and no driver-side math.

    Exactness: every moment is a decimal-contract sum of exact-decimal
    per-row products (y is pre-scaled by 1e-3 so even sum(y^2) stays
    inside the dsum determinism bound at 100x the bench SF); the
    centered moments, determinant, and solve are one fixed IEEE tree on
    those identical sums, quantized at 1e-6 after rescaling back to
    price units.

    Scale: a single map-side-combinable aggregate over the fact table —
    the same shuffle shape as a SUM; everything after is 1-row
    arithmetic. Adding features grows the moment count quadratically
    but never adds a pass."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    yk = F.col("l_extendedprice") / F.lit(1000.0)
    x1, x2 = F.col("l_quantity"), F.col("l_discount")
    s = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dsum(x1).alias("s1"),
        dsum(x2).alias("s2"),
        dsum(yk).alias("sy"),
        dsum(x1 * x1).alias("s11"),
        dsum(x2 * x2).alias("s22"),
        dsum(x1 * x2).alias("s12"),
        dsum(x1 * yk).alias("s1y"),
        dsum(x2 * yk).alias("s2y"),
        dsum(yk * yk).alias("syy"),
    )
    n = F.col("n")
    c = s.select(
        "n",
        "s1",
        "s2",
        "sy",
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("c11"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("c22"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("c12"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("c1y"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("c2y"),
        (F.col("syy") - F.col("sy") * F.col("sy") / n).alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b = c.select(
        "n",
        "s1",
        "s2",
        "sy",
        "c1y",
        "c2y",
        "cyy",
        ((F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det).alias(
            "b1k"
        ),
        ((F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det).alias(
            "b2k"
        ),
    )
    return b.select(
        F.col("n").alias("n_rows"),
        _q6(
            (
                F.col("sy") / n
                - F.col("b1k") * (F.col("s1") / n)
                - F.col("b2k") * (F.col("s2") / n)
            )
            * F.lit(1000.0)
        ).alias("intercept"),
        _q6(F.col("b1k") * F.lit(1000.0)).alias("beta_quantity"),
        _q6(F.col("b2k") * F.lit(1000.0)).alias("beta_discount"),
        _q6(
            (F.col("b1k") * F.col("c1y") + F.col("b2k") * F.col("c2y"))
            / F.col("cyy")
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Grid-bucketed spatial nearest neighbor (geo family)
# ---------------------------------------------------------------------------

# Deterministic planar coordinates derived from the keys (LCG-style
# scatter on a 100 000 x 100 000 integer grid; a * key + b < 2^63 for
# every SF, so the modulus is exact BIGINT arithmetic on both engines).
_GEO_CELL = 10_000

_GEO_SQL = f"""
    WITH cust AS MATERIALIZED (
        SELECT c_custkey,
               CAST((c_custkey * 48271 + 11) % 100000 AS BIGINT) AS cx,
               CAST((c_custkey * 69621 + 7) % 100000 AS BIGINT) AS cy
        FROM customer
    ), supp AS MATERIALIZED (
        SELECT s_suppkey,
               CAST((s_suppkey * 40692 + 3) % 100000 AS BIGINT) AS sx,
               CAST((s_suppkey * 16807 + 5) % 100000 AS BIGINT) AS sy
        FROM supplier
    ), cand AS MATERIALIZED (
        SELECT s_suppkey, sx, sy,
               sx // {_GEO_CELL} + dx.d AS gx,
               sy // {_GEO_CELL} + dy.d AS gy
        FROM supp
        CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
        CROSS JOIN (VALUES (-1), (0), (1)) dy(d)
    ), ranked AS (
        SELECT c.c_custkey, s.s_suppkey,
               (c.cx - s.sx) * (c.cx - s.sx)
                   + (c.cy - s.sy) * (c.cy - s.sy) AS dist2,
               ROW_NUMBER() OVER (
                   PARTITION BY c.c_custkey
                   ORDER BY (c.cx - s.sx) * (c.cx - s.sx)
                            + (c.cy - s.sy) * (c.cy - s.sy),
                            s.s_suppkey) AS rn,
               COUNT(*) OVER (PARTITION BY c.c_custkey) AS n_cand
        FROM cust c
        JOIN cand s ON s.gx = c.cx // {_GEO_CELL}
                   AND s.gy = c.cy // {_GEO_CELL}
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey,
           CAST(dist2 AS BIGINT) AS dist2,
           CAST(n_cand AS BIGINT) AS n_candidates
    FROM ranked WHERE rn = 1
"""


@query("geo_grid_nearest", oracle=_GEO_SQL)
def geo_grid_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial nearest-neighbor join: each customer point
    finds its closest supplier point among the 3x3 grid-cell
    neighborhood around it — the standard scale-out spelling of a
    spatial kNN (geohash/S2-cell bucketing): bucket both sides, expand
    the SMALL side to its neighbor cells, equi-join on the cell, rank
    locally. Points with an empty neighborhood (no supplier within the
    3x3 block) are excluded by the inner join — the documented radius
    bound of the probe.

    Coordinates are deterministic LCG scatters of the keys onto a
    100k x 100k integer grid (multiplier * key stays < 2^63 at every
    SF), so every distance is exact BIGINT arithmetic — no floats
    anywhere, no quantization needed; ties break on s_suppkey.

    Scale: the 9x expansion lands on the SMALL (supplier) side, which
    Spark broadcasts; candidates per customer are bounded by supplier
    density per cell, never |customers| x |suppliers|; the rank window
    is partitioned per customer. At 100 TB the same plan holds with
    the grid sized so cells hold O(100) points."""
    cu = _t(spark, sf_dir, "customer")["customer"]
    su = _t(spark, sf_dir, "supplier")["supplier"]
    cust = cu.select(
        "c_custkey",
        ((F.col("c_custkey") * 48271 + 11) % 100000).cast("bigint").alias("cx"),
        ((F.col("c_custkey") * 69621 + 7) % 100000).cast("bigint").alias("cy"),
    )
    supp = su.select(
        "s_suppkey",
        ((F.col("s_suppkey") * 40692 + 3) % 100000).cast("bigint").alias("sx"),
        ((F.col("s_suppkey") * 16807 + 5) % 100000).cast("bigint").alias("sy"),
    )
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    cand = (
        supp.withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.floor(F.col("sx") / _GEO_CELL) + F.col("dx")).alias("gx"),
            (F.floor(F.col("sy") / _GEO_CELL) + F.col("dy")).alias("gy"),
        )
    )
    joined = cust.join(
        F.broadcast(cand),
        (F.col("gx") == F.floor(F.col("cx") / _GEO_CELL))
        & (F.col("gy") == F.floor(F.col("cy") / _GEO_CELL)),
    )
    d2 = (F.col("cx") - F.col("sx")) * (F.col("cx") - F.col("sx")) + (
        F.col("cy") - F.col("sy")
    ) * (F.col("cy") - F.col("sy"))
    wc = W.partitionBy("c_custkey")
    ranked = joined.select(
        "c_custkey",
        "s_suppkey",
        d2.alias("dist2"),
        F.row_number().over(wc.orderBy(d2, "s_suppkey")).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_cand"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "c_custkey",
        F.col("s_suppkey").alias("nearest_suppkey"),
        F.col("dist2").cast("bigint").alias("dist2"),
        F.col("n_cand").cast("bigint").alias("n_candidates"),
    )


# ---------------------------------------------------------------------------
# Classical additive seasonal decomposition (trend + seasonal + residual)
# ---------------------------------------------------------------------------

_DECOMP_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), ma AS MATERIALIZED (
        SELECT day, y,
               CAST(ROUND(SUM(CAST(y AS DECIMAL(38,10))) OVER w, 4)
                    AS DOUBLE) / 7 AS trend0,
               COUNT(*) OVER w AS k
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), interior AS MATERIALIZED (
        SELECT day,
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(day AS DATE)) % 7
                    AS BIGINT) AS dow,
               y,
               FLOOR(trend0 * 1e6 + 0.5) / 1e6 AS trend
        FROM ma WHERE k = 7
    ), sraw AS MATERIALIZED (
        SELECT dow, {dsum_expr('y - trend')} / COUNT(*) AS s
        FROM interior GROUP BY 1
    ), smean AS (
        SELECT {dsum_expr('s')} / COUNT(*) AS sbar FROM sraw
    ), sadj AS MATERIALIZED (
        SELECT dow, FLOOR((s - sbar) * 1e6 + 0.5) / 1e6 AS seasonal
        FROM sraw CROSS JOIN smean
    )
    SELECT i.day, i.y, i.trend, sa.seasonal,
           FLOOR((i.y - i.trend - sa.seasonal) * 1e6 + 0.5) / 1e6 AS residual
    FROM interior i JOIN sadj sa USING (dow)
"""


@query("ts_decompose_classical", oracle=_DECOMP_SQL)
def ts_decompose_classical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily revenue series:
    trend = centered 7-day moving average, seasonal = zero-centered
    day-of-week mean of the detrended series, residual = the rest —
    the table every anomaly detector and forecaster starts from
    (ts_seasonality_strength reports one summary number; this emits
    the full decomposition). Edge days without a complete 7-day window
    are excluded (trend undefined there — the classical convention).

    Exactness: daily y is a decimal-contract sum; the moving-average
    numerator is an exact windowed DECIMAL sum rounded to scale 4 (the
    dsum convention as a window, per ts_variance_ratio); seasonal
    means are decimal sums over identical quantized detrended terms;
    each output component quantizes at 1e-6 BEFORE the residual
    subtraction so the three columns add back to y within 2e-6 by
    construction on both engines.

    Scale: one shuffle to the daily grain; the ordered window and the
    7-row seasonal frame are calendar-bounded (plan-guard allowlisted
    on that bound)."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    w = W.orderBy("day").rowsBetween(-3, 3)
    from pyspark.sql import types as T

    ma = daily.select(
        "day",
        "y",
        (
            F.round(F.sum(F.col("y").cast(T.DecimalType(38, 10))).over(w), 4)
            .cast("double")
            / 7
        ).alias("trend0"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    interior = (
        ma.filter(F.col("k") == 7)
        .select(
            "day",
            (
                F.datediff(F.to_date("day"), F.to_date(F.lit("1970-01-01"))) % 7
            )
            .cast("bigint")
            .alias("dow"),
            "y",
            _q6(F.col("trend0")).alias("trend"),
        )
        .transform(cut_lineage)
    )
    sraw = interior.groupBy("dow").agg(
        (dsum(F.col("y") - F.col("trend")) / F.count(F.lit(1))).alias("s")
    )
    smean = sraw.agg((dsum("s") / F.count(F.lit(1))).alias("sbar"))
    sadj = sraw.crossJoin(F.broadcast(smean)).select(
        "dow", _q6(F.col("s") - F.col("sbar")).alias("seasonal")
    )
    return interior.join(F.broadcast(sadj), "dow").select(
        "day",
        "y",
        "trend",
        "seasonal",
        _q6(F.col("y") - F.col("trend") - F.col("seasonal")).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Simplified silhouette score per embedding label
# ---------------------------------------------------------------------------

_SIL_SQL = f"""
    WITH dims AS MATERIALIZED (
        SELECT vec_id, label, GENERATE_SUBSCRIPTS(embedding, 1) AS dim,
               CAST(UNNEST(embedding) AS DOUBLE) AS x
        FROM embeddings
    ), cent AS MATERIALIZED (
        SELECT label AS c_label, dim, {dsum_expr('x')} / COUNT(x) AS m
        FROM dims GROUP BY 1, 2
    ), d2 AS MATERIALIZED (
        SELECT d.vec_id, d.label, c.c_label,
               {dsum_expr('(d.x - c.m) * (d.x - c.m)')} AS dist2
        FROM dims d JOIN cent c ON c.dim = d.dim
        GROUP BY 1, 2, 3
    ), ab AS MATERIALIZED (
        SELECT vec_id, label,
               SQRT(MIN(CASE WHEN c_label = label THEN dist2 END)) AS a,
               SQRT(MIN(CASE WHEN c_label <> label THEN dist2 END)) AS b
        FROM d2 GROUP BY 1, 2
    ), sil AS MATERIALIZED (
        SELECT vec_id, label,
               FLOOR((b - a) / GREATEST(a, b) * 1e6 + 0.5) / 1e6 AS sil
        FROM ab
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           FLOOR({dsum_expr('sil')} / COUNT(*) * 1e6 + 0.5) / 1e6
               AS avg_silhouette,
           CAST(COUNT(*) FILTER (WHERE sil > 0) AS BIGINT) AS n_well_clustered
    FROM sil GROUP BY 1
"""


@query("ml_silhouette_by_label", oracle=_SIL_SQL)
def ml_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette score per embedding
    label: a = distance to own-label centroid, b = distance to the
    nearest other centroid, silhouette = (b - a) / max(a, b) averaged
    per label — the cluster-quality readout for a labeled embedding
    corpus (sim_centroid_classify asks "can centroids classify?"; this
    asks "how separable are the clusters at all", the number a
    SemDeDup / domain-mix pipeline tunes against).

    Exactness: centroids are decimal-contract per-dimension means;
    squared distances are DECIMAL sums over identical per-dimension
    IEEE terms (bit-identical, so the own/other argmin needs no
    quantization); SQRT is correctly rounded; per-point silhouettes
    quantize at 1e-6 before the decimal-mean per label.

    Scale: the long (vec, dim) layout makes distances a dim-keyed join
    + (vec, label) aggregate — |labels| x dims centroid rows broadcast
    naturally; per-point work is |labels| candidates, never
    points^2 (the full Rousseeuw silhouette IS pairwise — the
    simplified variant is the one that scales, which is why it's the
    one shipped)."""
    # the centroid-probe join and its decimal partial aggregation run
    # map-side in the scan stage — fan out first (layout-adaptive
    # no-op at scale)
    em = fan_out(
        _t(spark, sf_dir, "embeddings")["embeddings"],
        sf_dir, "embeddings", "vec_id", weight=50,
    )
    dims = em.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim0", "xf"),
    ).select(
        "vec_id",
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = (
        dims.groupBy(F.col("label").alias("c_label"), "dim")
        .agg((dsum("x") / F.count("x")).alias("m"))
        .transform(cut_lineage)
    )
    d2 = (
        dims.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "c_label")
        .agg(
            dsum((F.col("x") - F.col("m")) * (F.col("x") - F.col("m"))).alias(
                "dist2"
            )
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.sqrt(
            F.min(F.when(F.col("c_label") == F.col("label"), F.col("dist2")))
        ).alias("a"),
        F.sqrt(
            F.min(F.when(F.col("c_label") != F.col("label"), F.col("dist2")))
        ).alias("b"),
    )
    sil = ab.select(
        "vec_id",
        "label",
        _q6(
            (F.col("b") - F.col("a")) / F.greatest(F.col("a"), F.col("b"))
        ).alias("sil"),
    )
    return sil.groupBy(F.col("label").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        _q6(dsum("sil") / F.count(F.lit(1))).alias("avg_silhouette"),
        F.count_if(F.col("sil") > 0).cast("bigint").alias("n_well_clustered"),
    )
