"""Round-5 batch-17 surface: Getis-Ord Gi* spatial hotspots, additive
Holt-Winters (triple exponential smoothing), Bayesian A/B readout with
a Beta posterior, the Cochran-Armitage trend-in-proportions test, and
recommendation catalog-coverage/equity metrics.

Same contract as the rest of the catalog (see queries.py). The normal
CDF reuses batch 16's pinned Abramowitz-Stegun 26.2.17 fragments
(shared verbatim between both engines). Holt-Winters extends the
catalog's sequential-operator precedent (seq_alert_debounce): the
recursion runs as an Arrow-batched grouped-map over the calendar-
bounded daily series, and the oracle spells the identical recurrence
as a recursive CTE carrying the 7-slot seasonal state as a list —
both engines execute the same IEEE update order step by step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql16 import _PDF_EXPR, _T_EXPR, _P2_EXPR


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# One-sided upper tail 1 - Phi(|z|) from the batch-16 fragments
# (pdf and t must already be bound as columns on |z|-symmetric z).
_TAIL_EXPR = (
    "pdf * (t * (0.319381530 + t * (-0.356563782 + t * (1.781477937"
    " + t * (-1.821255978 + t * 1.330274429)))))"
)


# ---------------------------------------------------------------------------
# Getis-Ord Gi* hotspot detection on the customer-density grid
# ---------------------------------------------------------------------------

_GI_CELL = 5_000  # 20 x 20 grid over the 100k x 100k key-scatter plane
_GI_N = 20

_GI_SQL = f"""
    WITH pts AS MATERIALIZED (
        SELECT ((c_custkey * 48271 + 11) % 100000) // {_GI_CELL} AS gx,
               ((c_custkey * 69621 + 7) % 100000) // {_GI_CELL} AS gy
        FROM customer
    ), grid AS MATERIALIZED (
        SELECT r1.range AS gx, r2.range AS gy
        FROM range(0, {_GI_N}) r1, range(0, {_GI_N}) r2
    ), cells AS MATERIALIZED (
        SELECT g.gx, g.gy, CAST(COALESCE(p.x, 0) AS BIGINT) AS x
        FROM grid g LEFT JOIN (
            SELECT gx, gy, COUNT(*) AS x FROM pts GROUP BY 1, 2
        ) p ON p.gx = g.gx AND p.gy = g.gy
    ), nbr AS MATERIALIZED (
        SELECT c.gx + dx.d AS tx, c.gy + dy.d AS ty,
               CAST(SUM(c.x) AS BIGINT) AS nbr_sum,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM cells c
        CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
        CROSS JOIN (VALUES (-1), (0), (1)) dy(d)
        GROUP BY 1, 2
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM cells
    )
    SELECT c.gx, c.gy, c.x AS n_points, b.nbr_sum, b.w AS nbr_cells,
           FLOOR((b.nbr_sum - (CAST(t.sx AS DOUBLE) / t.n) * b.w)
                 / (SQRT(CAST(t.sxx AS DOUBLE) / t.n
                         - (CAST(t.sx AS DOUBLE) / t.n)
                           * (CAST(t.sx AS DOUBLE) / t.n))
                    * SQRT((CAST(t.n AS DOUBLE) * b.w - CAST(b.w AS DOUBLE) * b.w)
                           / (t.n - 1.0)))
                 * 1e6 + 0.5) / 1e6 AS gi_z
    FROM cells c
    JOIN nbr b ON b.tx = c.gx AND b.ty = c.gy
    CROSS JOIN tot t
"""


@query("geo_hotspot_gi", oracle=_GI_SQL)
def geo_hotspot_gi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot statistic over the customer-density grid:
    for every cell of a 20x20 grid, compare the 3x3-neighborhood point
    count against the global mean density — the standard local spatial
    autocorrelation test behind every "where are the hotspots" map
    (companion to geo_grid_nearest: that probes points, this scores
    regions). Border cells keep their truncated neighborhoods (w = 4/6/9),
    which the Gi* variance term accounts for exactly.

    Exactness: cell counts, neighbor sums, and the global moments are
    exact integers (the same key-scatter coordinates as
    geo_grid_nearest); z is one fixed IEEE tree over those integers
    with two correctly-rounded SQRTs, quantized at 1e-6.

    Scale: the neighbor sum is a 9-way explode + one shuffle to the
    constant 400-cell grain — density aggregation happens at point
    scale first (map-side combinable), so 100 TB of points reduce to
    the grid before any join."""
    cu = _t(spark, sf_dir, "customer")["customer"]
    pts = cu.select(
        F.floor(((F.col("c_custkey") * 48271 + 11) % 100000) / _GI_CELL).alias(
            "gx"
        ),
        F.floor(((F.col("c_custkey") * 69621 + 7) % 100000) / _GI_CELL).alias(
            "gy"
        ),
    )
    counts = pts.groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("x"))
    axis = F.sequence(F.lit(0), F.lit(_GI_N - 1))
    grid = (
        spark.range(1)
        .select(F.explode(axis).alias("gx"))
        .select("gx", F.explode(axis).alias("gy"))
    )
    cells = (
        grid.join(counts, ["gx", "gy"], "left")
        .select(
            "gx", "gy", F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x")
        )
        .transform(cut_lineage)
    )
    offs = F.array(F.lit(-1), F.lit(0), F.lit(1))
    nbr = (
        cells.withColumn("dx", F.explode(offs))
        .withColumn("dy", F.explode(offs))
        .groupBy(
            (F.col("gx") + F.col("dx")).alias("tx"),
            (F.col("gy") + F.col("dy")).alias("ty"),
        )
        .agg(
            F.sum("x").cast("bigint").alias("nbr_sum"),
            F.count(F.lit(1)).cast("bigint").alias("w"),
        )
    )
    tot = cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    xbar = F.col("sx").cast("double") / F.col("n")
    s = F.sqrt(F.col("sxx").cast("double") / F.col("n") - xbar * xbar)
    denom = s * F.sqrt(
        (F.col("n").cast("double") * F.col("w") - F.col("w").cast("double") * F.col("w"))
        / (F.col("n") - F.lit(1.0))
    )
    return (
        cells.join(
            nbr,
            (F.col("tx") == F.col("gx")) & (F.col("ty") == F.col("gy")),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "gx",
            "gy",
            F.col("x").alias("n_points"),
            "nbr_sum",
            F.col("w").alias("nbr_cells"),
            _q6((F.col("nbr_sum") - xbar * F.col("w")) / denom).alias("gi_z"),
        )
    )


# ---------------------------------------------------------------------------
# Additive Holt-Winters (triple exponential smoothing, weekly season)
# ---------------------------------------------------------------------------

# Dyadic smoothing constants: alpha = 0.5, beta = 0.25, gamma = 0.25 —
# exact in binary, so every recurrence step is the identical IEEE tree
# on both engines (the dyadic-weight catalog convention).
_HW_SQL = f"""
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1
    ), idx AS MATERIALIZED (
        SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS t FROM daily
    ), init AS (
        SELECT l0, b0,
               (SELECT LIST(y - l0 ORDER BY t) FROM idx WHERE t <= 7) AS s0
        FROM (SELECT
                (SELECT SUM(y) / 7 FROM idx WHERE t <= 7) AS l0,
                ((SELECT SUM(y) / 7 FROM idx WHERE t BETWEEN 8 AND 14)
                 - (SELECT SUM(y) / 7 FROM idx WHERE t <= 7)) / 7 AS b0)
    ), rec(t, l, b, s, f) AS (
        SELECT CAST(7 AS BIGINT), l0, b0, s0, CAST(NULL AS DOUBLE) FROM init
        UNION ALL
        SELECT i.t,
               0.5 * (i.y - r.s[1]) + 0.5 * (r.l + r.b),
               0.25 * ((0.5 * (i.y - r.s[1]) + 0.5 * (r.l + r.b)) - r.l)
                   + 0.75 * r.b,
               r.s[2:7] || [0.25 * (i.y - (0.5 * (i.y - r.s[1])
                                           + 0.5 * (r.l + r.b)))
                            + 0.75 * r.s[1]],
               r.l + r.b + r.s[1]
        FROM rec r JOIN idx i ON i.t = r.t + 1
    )
    SELECT i.day, i.y,
           FLOOR(r.l * 1e6 + 0.5) / 1e6 AS level,
           FLOOR(r.b * 1e6 + 0.5) / 1e6 AS trend,
           FLOOR(r.s[7] * 1e6 + 0.5) / 1e6 AS seasonal,
           FLOOR(r.f * 1e6 + 0.5) / 1e6 AS fitted,
           FLOOR((i.y - r.f) * 1e6 + 0.5) / 1e6 AS residual
    FROM rec r JOIN idx i ON i.t = r.t
    WHERE r.t >= 8
"""


@query("ts_holt_winters_additive", oracle=_HW_SQL)
def ts_holt_winters_additive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonal) over the
    daily revenue series with dyadic smoothing (alpha 0.5, beta 0.25,
    gamma 0.25): the one-step-ahead fit, the decomposed state, and the
    residual per day — the seasonal upgrade of ts_holt_linear and the
    classical forecaster a metrics platform ships first. Initialization
    is the textbook one (level = week-1 mean, trend = (week-2 mean -
    week-1 mean)/7, seasonals = week-1 deviations); output starts at
    day 8.

    The recurrence is state-dependent (not window-expressible), so the
    Spark side runs it as ONE Arrow-batched grouped-map over the
    calendar-bounded daily series (the seq_alert_debounce contract:
    per-series state, zero driver involvement; a multi-series version
    groups by series key). The oracle spells the identical recurrence
    as a recursive CTE carrying the 7-slot seasonal list. Both engines
    execute the same dyadic IEEE update order step by step, so the
    states match bit-for-bit before the 1e-6 output quantizer.

    Scale: one shuffle to the daily grain, then O(days) sequential work
    per series — the intrinsic shape of exponential smoothing; 100 TB
    parallelism comes from the number of series, not days."""
    import pandas as pd

    from es_analytics_spark.functions.forecast import holt_winters_rows

    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .withColumn("g", F.lit(1))
    )

    def _hw(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day")
        days = list(pdf["day"])
        rows = holt_winters_rows([float(v) for v in pdf["y"]])
        if not rows:
            return pd.DataFrame(
                {
                    "day": pd.Series(dtype="datetime64[ns]"),
                    "y": pd.Series(dtype="float64"),
                    "level": pd.Series(dtype="float64"),
                    "trend": pd.Series(dtype="float64"),
                    "seasonal": pd.Series(dtype="float64"),
                    "fitted": pd.Series(dtype="float64"),
                    "residual": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            [{**r, "day": days[r.pop("idx")]} for r in rows],
            columns=["day", "y", "level", "trend", "seasonal", "fitted", "residual"],
        )

    schema = (
        "day timestamp, y double, level double, trend double, "
        "seasonal double, fitted double, residual double"
    )
    return daily.groupBy("g").applyInPandas(_hw, schema=schema)


# ---------------------------------------------------------------------------
# Bayesian A/B readout: Beta posterior + normal-approximate P(B > A)
# ---------------------------------------------------------------------------

_BAYES_SQL = f"""
    WITH conv AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        FROM events GROUP BY 1, 2
    ), agg AS (
        SELECT CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS n0,
               CAST(SUM(c) FILTER (WHERE variant = 0) AS BIGINT) AS c0,
               CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS n1,
               CAST(SUM(c) FILTER (WHERE variant = 1) AS BIGINT) AS c1
        FROM conv
    ), post AS (
        SELECT n0, c0, n1, c1,
               CAST(1 + c0 AS DOUBLE) / (2 + n0) AS mu0,
               CAST(1 + c1 AS DOUBLE) / (2 + n1) AS mu1,
               (CAST(1 + c0 AS DOUBLE) * (1 + n0 - c0))
                   / ((CAST(2 + n0 AS DOUBLE) * (2 + n0)) * (3 + n0)) AS v0,
               (CAST(1 + c1 AS DOUBLE) * (1 + n1 - c1))
                   / ((CAST(2 + n1 AS DOUBLE) * (2 + n1)) * (3 + n1)) AS v1
        FROM agg
    ), zs AS (
        SELECT n0, c0, n1, c1, mu0, mu1, v0, v1,
               FLOOR((mu1 - mu0) / SQRT(v0 + v1) * 1e6 + 0.5) / 1e6 AS z
        FROM post
    ), tstage AS (
        SELECT *, {_T_EXPR} AS t, {_PDF_EXPR} AS pdf FROM zs
    )
    SELECT n0 AS n_control, c0 AS conv_control,
           n1 AS n_treat, c1 AS conv_treat,
           FLOOR(mu0 * 1e6 + 0.5) / 1e6 AS post_mean_control,
           FLOOR(mu1 * 1e6 + 0.5) / 1e6 AS post_mean_treat,
           z,
           FLOOR((CASE WHEN z >= 0 THEN 1.0 - ({_TAIL_EXPR})
                       ELSE {_TAIL_EXPR} END) * 1e6 + 0.5) / 1e6
               AS p_treat_beats_control,
           FLOOR((mu1 - mu0 - 1.959963985 * SQRT(v0 + v1)) * 1e6 + 0.5) / 1e6
               AS lift_ci95_low,
           FLOOR((mu1 - mu0 + 1.959963985 * SQRT(v0 + v1)) * 1e6 + 0.5) / 1e6
               AS lift_ci95_high
    FROM tstage
"""


@query("ab_bayes_beta_normal", oracle=_BAYES_SQL)
def ab_bayes_beta_normal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bayesian A/B conversion readout: Beta(1,1)-prior posteriors per
    variant (deterministic user_id % 2 assignment, conversion = any
    purchase), posterior means, the normal-approximate P(treatment
    beats control), and a 95% credible interval on the lift — the
    decision-ready Bayesian companion to ab_experiment_report's
    frequentist table (same assignment, same conversion definition, so
    the two entries reconcile row-for-row).

    Exactness: posterior moments are exact-integer rationals in one
    fixed IEEE tree; z quantizes at 1e-6 BEFORE the pinned A&S 26.2.17
    CDF fragments (shared verbatim with stat_bh_fdr); the z>=0 branch
    uses Phi-symmetry so only the tail polynomial is ever evaluated.

    Scale: one user-grain aggregate (map-side combinable) and a 1-row
    reduction — the same shape as a COUNT."""
    e = _t(spark, sf_dir, "events")["events"]
    conv = e.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "c"
        )
    )
    agg = conv.agg(
        F.count_if(F.col("variant") == 0).cast("bigint").alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("c"))).cast("bigint").alias("c0"),
        F.count_if(F.col("variant") == 1).cast("bigint").alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("c"))).cast("bigint").alias("c1"),
    )
    mu0 = (F.lit(1) + F.col("c0")).cast("double") / (F.lit(2) + F.col("n0"))
    mu1 = (F.lit(1) + F.col("c1")).cast("double") / (F.lit(2) + F.col("n1"))
    v0 = ((F.lit(1) + F.col("c0")).cast("double") * (F.lit(1) + F.col("n0") - F.col("c0"))) / (
        ((F.lit(2) + F.col("n0")).cast("double") * (F.lit(2) + F.col("n0")))
        * (F.lit(3) + F.col("n0"))
    )
    v1 = ((F.lit(1) + F.col("c1")).cast("double") * (F.lit(1) + F.col("n1") - F.col("c1"))) / (
        ((F.lit(2) + F.col("n1")).cast("double") * (F.lit(2) + F.col("n1")))
        * (F.lit(3) + F.col("n1"))
    )
    post = agg.select(
        "n0",
        "c0",
        "n1",
        "c1",
        mu0.alias("mu0"),
        mu1.alias("mu1"),
        v0.alias("v0"),
        v1.alias("v1"),
    )
    zs = post.select(
        "*",
        _q6((F.col("mu1") - F.col("mu0")) / F.sqrt(F.col("v0") + F.col("v1"))).alias(
            "z"
        ),
    )
    tstage = zs.withColumn("t", F.expr(_T_EXPR)).withColumn(
        "pdf", F.expr(_PDF_EXPR)
    )
    half_width = F.lit(1.959963985) * F.sqrt(F.col("v0") + F.col("v1"))
    return tstage.select(
        F.col("n0").alias("n_control"),
        F.col("c0").alias("conv_control"),
        F.col("n1").alias("n_treat"),
        F.col("c1").alias("conv_treat"),
        _q6(F.col("mu0")).alias("post_mean_control"),
        _q6(F.col("mu1")).alias("post_mean_treat"),
        "z",
        _q6(
            F.when(
                F.col("z") >= 0, F.lit(1.0) - F.expr(_TAIL_EXPR)
            ).otherwise(F.expr(_TAIL_EXPR))
        ).alias("p_treat_beats_control"),
        _q6(F.col("mu1") - F.col("mu0") - half_width).alias("lift_ci95_low"),
        _q6(F.col("mu1") - F.col("mu0") + half_width).alias("lift_ci95_high"),
    )


# ---------------------------------------------------------------------------
# Cochran-Armitage trend test (conversion across ordered exposure doses)
# ---------------------------------------------------------------------------

_CA_SQL = f"""
    WITH users AS MATERIALIZED (
        SELECT user_id,
               LEAST(CAST(COUNT(*) FILTER (WHERE event_type = 'view') // 4
                          AS BIGINT), 5) AS dose,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 90
                        THEN 1 ELSE 0 END) AS resp
        FROM events GROUP BY 1
    ), buckets AS MATERIALIZED (
        SELECT dose, CAST(COUNT(*) AS BIGINT) AS n_k,
               CAST(SUM(resp) AS BIGINT) AS r_k
        FROM users GROUP BY 1
    ), sums AS (
        SELECT CAST(SUM(n_k) AS BIGINT) AS n,
               CAST(SUM(r_k) AS BIGINT) AS r,
               CAST(SUM(dose * r_k) AS BIGINT) AS tr,
               CAST(SUM(dose * n_k) AS BIGINT) AS tn,
               CAST(SUM(dose * dose * n_k) AS BIGINT) AS ttn,
               CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM buckets
    ), zs AS (
        SELECT n, r, n_buckets,
               FLOOR((tr - (CAST(r AS DOUBLE) / n) * tn)
                     / SQRT((CAST(r AS DOUBLE) / n)
                            * (1.0 - CAST(r AS DOUBLE) / n)
                            * (ttn - CAST(tn AS DOUBLE) * tn / n))
                     * 1e6 + 0.5) / 1e6 AS z
        FROM sums
    ), tstage AS (
        SELECT *, {_T_EXPR} AS t, {_PDF_EXPR} AS pdf FROM zs
    )
    SELECT n AS n_users, r AS n_responders, n_buckets, z AS z_trend,
           FLOOR(({_P2_EXPR}) * 1e6 + 0.5) / 1e6 AS p_two_sided
    FROM tstage
"""


@query("stat_cochran_armitage", oracle=_CA_SQL)
def stat_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: does high-value conversion (any
    purchase with value >= 90 — rare enough that neither proportion
    degenerates to 0 or 1) rise MONOTONICALLY with exposure dose
    (views bucketed 0..5)? The
    ordered-alternative test that chi-square independence
    (stat_chi2_independence) throws away — a dose-response signal can
    be decisive here while invisible to the omnibus test. Scores are
    the bucket indices (the standard equally-spaced choice).

    Exactness: all five Cochran-Armitage sums are exact integers from
    one bucket-grain aggregate; z is a fixed IEEE tree with one SQRT,
    quantized at 1e-6 before the pinned A&S 26.2.17 two-sided p.

    Scale: user-grain aggregate -> 6-row bucket grain -> 1-row
    reduction; every stage map-side combinable."""
    e = _t(spark, sf_dir, "events")["events"]
    users = e.groupBy("user_id").agg(
        F.least(
            F.floor(F.count_if(F.col("event_type") == "view") / 4).cast("bigint"),
            F.lit(5).cast("bigint"),
        ).alias("dose"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 90),
                1,
            ).otherwise(0)
        ).alias("resp"),
    )
    buckets = users.groupBy("dose").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("resp").cast("bigint").alias("r_k"),
    )
    sums = buckets.agg(
        F.sum("n_k").cast("bigint").alias("n"),
        F.sum("r_k").cast("bigint").alias("r"),
        F.sum(F.col("dose") * F.col("r_k")).cast("bigint").alias("tr"),
        F.sum(F.col("dose") * F.col("n_k")).cast("bigint").alias("tn"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n_k"))
        .cast("bigint")
        .alias("ttn"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    pbar = F.col("r").cast("double") / F.col("n")
    zs = sums.select(
        "n",
        "r",
        "n_buckets",
        _q6(
            (F.col("tr") - pbar * F.col("tn"))
            / F.sqrt(
                pbar
                * (F.lit(1.0) - pbar)
                * (F.col("ttn") - F.col("tn").cast("double") * F.col("tn") / F.col("n"))
            )
        ).alias("z"),
    )
    tstage = zs.withColumn("t", F.expr(_T_EXPR)).withColumn(
        "pdf", F.expr(_PDF_EXPR)
    )
    return tstage.select(
        F.col("n").alias("n_users"),
        F.col("r").alias("n_responders"),
        "n_buckets",
        F.col("z").alias("z_trend"),
        _q6(F.expr(_P2_EXPR)).alias("p_two_sided"),
    )


# ---------------------------------------------------------------------------
# Recommendation catalog coverage / exposure equity
# ---------------------------------------------------------------------------

_COV_TOPK = 3

_COV_SQL = f"""
    WITH op AS MATERIALIZED (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), pairs AS MATERIALIZED (
        SELECT a.p AS anchor, b.p AS reco, CAST(COUNT(*) AS BIGINT) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p <> b.p
        GROUP BY 1, 2
    ), topk AS MATERIALIZED (
        SELECT anchor, reco FROM (
            SELECT anchor, reco,
                   ROW_NUMBER() OVER (PARTITION BY anchor
                                      ORDER BY support DESC, reco ASC) AS rn
            FROM pairs) WHERE rn <= {_COV_TOPK}
    ), expo AS MATERIALIZED (
        SELECT reco, CAST(COUNT(*) AS BIGINT) AS x FROM topk GROUP BY 1
    ), ranked AS (
        SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, reco ASC) AS i
        FROM expo
    ), cat AS (
        SELECT CAST(COUNT(DISTINCT p) AS BIGINT) AS n_catalog FROM op
    )
    SELECT c.n_catalog,
           CAST(COUNT(*) AS BIGINT) AS n_recommended,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / c.n_catalog * 1e6 + 0.5) / 1e6
               AS coverage,
           FLOOR((2.0 * SUM(i * x) / (COUNT(*) * CAST(SUM(x) AS DOUBLE))
                  - (COUNT(*) + 1.0) / COUNT(*)) * 1e6) / 1e6
               AS exposure_gini,
           FLOOR(CAST(SUM(x) AS DOUBLE) * SUM(x) / SUM(x * x) * 1e6 + 0.5)
               / 1e6 AS effective_catalog_size,
           FLOOR(CAST(MAX(x) AS DOUBLE) / SUM(x) * 1e6 + 0.5) / 1e6
               AS top_item_share
    FROM ranked CROSS JOIN cat c
    GROUP BY c.n_catalog
"""


@query("rec_catalog_coverage", oracle=_COV_SQL)
def rec_catalog_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-diversity audit of the co-occurrence recommender:
    build every anchor part's top-3 "bought together" list, then score
    the SYSTEM — catalog coverage (share of parts that ever get
    recommended), the Gini of exposure across recommended parts,
    effective catalog size (inverse HHI of exposure shares), and the
    single most-exposed item's share. These are the popularity-bias
    numbers (Adomavicius-style aggregate diversity) a rec platform
    tracks next to accuracy: rec_item_recommendations grades WHAT we
    recommend; this grades who never gets recommended.

    Exactness: supports, exposures, and ranks are exact integers; the
    Gini uses the rank-weighted identity over the (exposure, partkey)
    total order with exact integer sums (sum(i*x) fits BIGINT), so
    every statistic is one quantized double expression.

    Scale: pair generation is the bounded within-basket self-join
    (rec_item_cooccurrence's bound); top-k is a per-anchor window; the
    exposure rank is computed DISTRIBUTIVELY with the range-partition +
    offset recipe (functions/ranks.cumulative_offsets) — no
    single-partition window over the item domain."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    op = (
        li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .transform(cut_lineage)
    )
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") != F.col("b.p")))
        .groupBy(F.col("a.p").alias("anchor"), F.col("b.p").alias("reco"))
        .agg(F.count(F.lit(1)).alias("support"))
    )
    wk = W.partitionBy("anchor").orderBy(F.desc("support"), F.asc("reco"))
    topk = (
        pairs.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _COV_TOPK)
        .select("anchor", "reco")
    )
    expo = topk.groupBy("reco").agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        expo.repartitionByRange(n_parts, F.asc("x"), F.asc("reco"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    local = ranged.withColumn(
        "lr",
        F.row_number().over(W.partitionBy("pid").orderBy(F.asc("x"), F.asc("reco"))),
    )
    offsets = cumulative_offsets(
        ranged.groupBy("pid").agg(F.count("*").alias("cnt"))
    )
    ranked = local.join(F.broadcast(offsets), "pid").withColumn(
        "i", F.col("lr") + F.col("off")
    )
    cat = op.agg(F.countDistinct("p").cast("bigint").alias("n_catalog"))
    return (
        ranked.crossJoin(F.broadcast(cat))
        .groupBy("n_catalog")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_recommended"),
            (
                F.floor(
                    (
                        2.0 * F.sum(F.col("i") * F.col("x"))
                        / (F.count(F.lit(1)) * F.sum("x").cast("double"))
                        - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))
                    )
                    * 1e6
                )
                / 1e6
            ).alias("exposure_gini"),
            _q6(
                F.sum("x").cast("double") * F.sum("x") / F.sum(F.col("x") * F.col("x"))
            ).alias("effective_catalog_size"),
            _q6(F.max("x").cast("double") / F.sum("x")).alias("top_item_share"),
        )
        .select(
            "n_catalog",
            "n_recommended",
            _q6(
                F.col("n_recommended").cast("double") / F.col("n_catalog")
            ).alias("coverage"),
            "exposure_gini",
            "effective_catalog_size",
            "top_item_share",
        )
    )
