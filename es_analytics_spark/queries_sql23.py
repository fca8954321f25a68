"""Round-5 batch-23 surface: Tukey median polish, Freedman-Diaconis
histogram, the Spark-4 SQL pipe syntax surface, and Yuen's trimmed-mean
test.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql16 import _PDF_EXPR, _T_EXPR, _P2_EXPR


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _med4(c):
    """The shared interpolated-median contract (percentile == DuckDB
    QUANTILE_CONT), rounded at 1e-4 before any downstream arithmetic."""
    return F.round(F.percentile(c, F.lit(0.5)), 4)


# ---------------------------------------------------------------------------
# Tukey median polish of the (dow x week) revenue table
# ---------------------------------------------------------------------------

_POLISH_SQL = f"""
    WITH cells AS MATERIALIZED (
        SELECT CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    AS BIGINT) AS dow,
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7
                    AS BIGINT) AS week,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1, 2
    ),
    r1 AS (SELECT dow, ROUND(QUANTILE_CONT(y, 0.5), 4) AS re1
           FROM cells GROUP BY dow),
    s1 AS (SELECT c.dow, c.week, c.y, r1.re1, c.y - r1.re1 AS resid
           FROM cells c JOIN r1 USING (dow)),
    c1 AS (SELECT week, ROUND(QUANTILE_CONT(resid, 0.5), 4) AS ce1
           FROM s1 GROUP BY week),
    s2 AS (SELECT s1.dow, s1.week, s1.y, s1.re1, c1.ce1,
                  s1.resid - c1.ce1 AS resid
           FROM s1 JOIN c1 USING (week)),
    r2 AS (SELECT dow, ROUND(QUANTILE_CONT(resid, 0.5), 4) AS re2
           FROM s2 GROUP BY dow),
    s3 AS (SELECT s2.dow, s2.week, s2.y, s2.re1 + r2.re2 AS row_eff,
                  s2.ce1, s2.resid - r2.re2 AS resid
           FROM s2 JOIN r2 USING (dow)),
    c2 AS (SELECT week, ROUND(QUANTILE_CONT(resid, 0.5), 4) AS ce2
           FROM s3 GROUP BY week)
    SELECT s3.dow, s3.week, s3.y,
           FLOOR(s3.row_eff * 1e6 + 0.5) / 1e6 AS row_effect,
           FLOOR((s3.ce1 + c2.ce2) * 1e6 + 0.5) / 1e6 AS col_effect,
           FLOOR((s3.resid - c2.ce2) * 1e6 + 0.5) / 1e6 AS residual
    FROM s3 JOIN c2 USING (week)
"""


@query("stat_median_polish", oracle=_POLISH_SQL)
def stat_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish (two full row/column sweeps) of the
    day-of-week x week revenue table: robust additive row and column
    effects plus residuals — the outlier-resistant sibling of
    ts_decompose_classical's mean-based decomposition (one anomalous
    day drags a mean-based dow effect; medians shrug it off), and the
    classical EDA operator for any two-way table.

    Exactness: cell values are decimal-contract sums; every median is
    the shared interpolated-quantile contract rounded at 1e-4; all
    subtractions are identical IEEE ops on those values; outputs
    quantize at 1e-6.

    Scale: one shuffle to the (dow, week) grain (bounded by calendar),
    then |dow|- and |week|-sized median aggregates with broadcast
    join-backs — sweep count is fixed driver-side control flow."""
    e = _t(spark, sf_dir, "events")["events"]
    epoch_day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
    cells = (
        e.groupBy(
            (epoch_day % 7).cast("bigint").alias("dow"),
            F.floor(epoch_day / 7).cast("bigint").alias("week"),
        )
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    r1 = cells.groupBy("dow").agg(_med4(F.col("y")).alias("re1"))
    s1 = cells.join(F.broadcast(r1), "dow").withColumn(
        "resid", F.col("y") - F.col("re1")
    )
    c1 = s1.groupBy("week").agg(_med4(F.col("resid")).alias("ce1"))
    s2 = (
        s1.join(F.broadcast(c1), "week")
        .withColumn("resid", F.col("resid") - F.col("ce1"))
        .transform(cut_lineage)
    )
    r2 = s2.groupBy("dow").agg(_med4(F.col("resid")).alias("re2"))
    s3 = (
        s2.join(F.broadcast(r2), "dow")
        .withColumn("row_eff", F.col("re1") + F.col("re2"))
        .withColumn("resid", F.col("resid") - F.col("re2"))
    )
    c2 = s3.groupBy("week").agg(_med4(F.col("resid")).alias("ce2"))
    return s3.join(F.broadcast(c2), "week").select(
        "dow",
        "week",
        "y",
        _q6(F.col("row_eff")).alias("row_effect"),
        _q6(F.col("ce1") + F.col("ce2")).alias("col_effect"),
        _q6(F.col("resid") - F.col("ce2")).alias("residual"),
    )


# ---------------------------------------------------------------------------
# Freedman-Diaconis histogram (data-driven bin width)
# ---------------------------------------------------------------------------

_FD_SQL = """
    WITH stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               MIN(value) AS lo, MAX(value) AS hi,
               ROUND(QUANTILE_CONT(value, 0.75), 4)
                   - ROUND(QUANTILE_CONT(value, 0.25), 4) AS iqr
        FROM events
    ), width AS (
        SELECT n, lo, hi,
               FLOOR(2.0 * iqr / CBRT(CAST(n AS DOUBLE)) * 1e6 + 0.5) / 1e6
                   AS h
        FROM stats
    ), binned AS MATERIALIZED (
        SELECT LEAST(CAST(FLOOR((e.value - w.lo) / w.h) AS BIGINT),
                     CAST(CEIL((w.hi - w.lo) / w.h) AS BIGINT) - 1) AS bin,
               w.h, w.lo
        FROM events e CROSS JOIN width w
    )
    SELECT bin,
           FLOOR((lo + bin * h) * 1e6 + 0.5) / 1e6 AS bin_lo,
           FLOOR((lo + (bin + 1) * h) * 1e6 + 0.5) / 1e6 AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM binned GROUP BY bin, h, lo
"""


@query("agg_histogram_fd", oracle=_FD_SQL)
def agg_histogram_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram with the Freedman-Diaconis data-driven bin width
    (h = 2*IQR/n^(1/3)): the statistically-sized histogram that adapts
    to both spread and volume — agg_histogram fixes the bin count a
    priori; FD is what a profiler should default to, and at 100x the
    data it automatically sharpens resolution (h shrinks with
    n^(-1/3)).

    Exactness: IQR comes from the shared quantile contract (1e-4
    rounding per quartile); the width quantizes at 1e-6 BEFORE binning
    so both engines floor identical (value - lo)/h trees (CBRT's
    sub-ulp risk collapses onto the quantizer boundary — the accepted
    LN-class risk); the top edge folds into the last bin; counts are
    exact.

    Scale: one aggregate for the stats row (broadcast back), one
    map-side-combinable bin count — two passes total, no windows."""
    e = _t(spark, sf_dir, "events")["events"]
    stats = e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        (
            F.round(F.percentile("value", F.lit(0.75)), 4)
            - F.round(F.percentile("value", F.lit(0.25)), 4)
        ).alias("iqr"),
    )
    width = stats.select(
        "n",
        "lo",
        "hi",
        _q6(F.lit(2.0) * F.col("iqr") / F.cbrt(F.col("n").cast("double"))).alias(
            "h"
        ),
    )
    nbins = F.ceil((F.col("hi") - F.col("lo")) / F.col("h")).cast("bigint")
    binned = e.crossJoin(F.broadcast(width)).select(
        F.least(
            F.floor((F.col("value") - F.col("lo")) / F.col("h")).cast("bigint"),
            nbins - 1,
        ).alias("bin"),
        "h",
        "lo",
    )
    return binned.groupBy("bin", "h", "lo").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).select(
        "bin",
        _q6(F.col("lo") + F.col("bin") * F.col("h")).alias("bin_lo"),
        _q6(F.col("lo") + (F.col("bin") + 1) * F.col("h")).alias("bin_hi"),
        "n_rows",
    )


# ---------------------------------------------------------------------------
# Spark 4 SQL pipe syntax surface
# ---------------------------------------------------------------------------

_PIPE_ORACLE = f"""
    SELECT event_type,
           CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {dsum_expr('value')} AS revenue
    FROM events
    WHERE value >= 10.0
    GROUP BY 1, 2
    HAVING COUNT(*) >= 5
"""


@query("fn_pipe_syntax", oracle=_PIPE_ORACLE)
def fn_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 SQL PIPE syntax surface (|> operators — the
    linear-dataflow SQL dialect from the Google "SQL Has Problems"
    paper, adopted in Spark 4.0): the same filtered revenue-by-
    (type, dow) rollup every warehouse user writes, expressed as
    FROM |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY |> WHERE — proof
    the engine accepts the modern pipeline dialect end-to-end with the
    catalog's decimal-sum and HAVING semantics intact. The oracle is
    the equivalent classical ANSI query.

    Exactness/scale: identical plan to the classical spelling after
    parsing — Catalyst sees the same aggregate; the decimal contract
    and map-side combine apply unchanged."""
    e = _t(spark, sf_dir, "events")["events"]
    view = f"pipe_events_{uuid.uuid4().hex[:12]}"
    e.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            FROM {view}
            |> WHERE value >= 10.0
            |> EXTEND CAST(DATEDIFF(CAST(ts AS DATE), DATE '1970-01-01') % 7
                           AS BIGINT) AS dow
            |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_events,
                         CAST(ROUND(SUM(CAST(value AS DECIMAL(38,10))), 4)
                              AS DOUBLE) AS revenue
               GROUP BY event_type, dow
            |> WHERE n_events >= 5
            |> SELECT event_type, dow, n_events, revenue
            """
        )
    finally:
        pass  # view stays registered for the session; name is unique


# ---------------------------------------------------------------------------
# Yuen's trimmed-mean test between variants
# ---------------------------------------------------------------------------

_YUEN_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               {dsum_expr("CASE WHEN event_type = 'purchase'"
                          " THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY 1, 2
    ), cuts AS MATERIALIZED (
        SELECT variant,
               ROUND(QUANTILE_CONT(rev, 0.2), 4) AS q20,
               ROUND(QUANTILE_CONT(rev, 0.8), 4) AS q80
        FROM pu GROUP BY variant
    ), wins AS MATERIALIZED (
        SELECT p.variant,
               CASE WHEN p.rev >= c.q20 AND p.rev <= c.q80 THEN 1 ELSE 0 END
                   AS in_trim,
               p.rev,
               LEAST(GREATEST(p.rev, c.q20), c.q80) AS wrev
        FROM pu p JOIN cuts c USING (variant)
    ), mom AS (
        SELECT variant,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(in_trim) AS BIGINT) AS h,
               {dsum_expr('CASE WHEN in_trim = 1 THEN rev END')} AS ts,
               {dsum_expr('wrev')} AS ws,
               {dsum_expr('wrev * wrev')} AS wss
        FROM wins GROUP BY variant
    ), sides AS (
        SELECT MAX(CASE WHEN variant = 0 THEN ts / h END) AS tm0,
               MAX(CASE WHEN variant = 1 THEN ts / h END) AS tm1,
               MAX(CASE WHEN variant = 0 THEN
                   (wss - ws * ws / n) / (n - 1) * (n - 1.0)
                   / (h * (h - 1.0)) END) AS d0,
               MAX(CASE WHEN variant = 1 THEN
                   (wss - ws * ws / n) / (n - 1) * (n - 1.0)
                   / (h * (h - 1.0)) END) AS d1,
               CAST(MAX(CASE WHEN variant = 0 THEN h END) AS BIGINT) AS h0,
               CAST(MAX(CASE WHEN variant = 1 THEN h END) AS BIGINT) AS h1
        FROM mom
    ), zs AS (
        SELECT h0, h1,
               FLOOR(tm0 * 1e6 + 0.5) / 1e6 AS trimmed_mean_control,
               FLOOR(tm1 * 1e6 + 0.5) / 1e6 AS trimmed_mean_treat,
               FLOOR((tm1 - tm0) / SQRT(d0 + d1) * 1e6 + 0.5) / 1e6 AS z
        FROM sides
    ), tstage AS (
        SELECT *, {_T_EXPR} AS t, {_PDF_EXPR} AS pdf FROM zs
    )
    SELECT h0 AS n_trimmed_control, h1 AS n_trimmed_treat,
           trimmed_mean_control, trimmed_mean_treat, z AS yuen_t,
           FLOOR(({_P2_EXPR}) * 1e6 + 0.5) / 1e6 AS p_two_sided
    FROM tstage
"""


@query("stat_yuen_trimmed_test", oracle=_YUEN_SQL)
def stat_yuen_trimmed_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yuen's trimmed-mean test (20% quantile trim) on per-user
    purchase revenue between variants: compare 20-80% trimmed means
    with Winsorized variances — the robust alternative to
    ab_welch_ttest when whales/heavy tails dominate (a single whale
    moves a mean t-test; Yuen caps its influence). Trimming is defined
    by the shared quantile thresholds (deterministic under the
    catalog's quantile contract); the p-value uses the pinned normal
    CDF (large-sample normal approximation, documented).

    Exactness: per-user revenue and all Winsorized moments are
    decimal-contract sums; thresholds round at 1e-4; the statistic is
    one fixed IEEE tree quantized at 1e-6 before the CDF.

    Scale: user-grain aggregate -> per-variant quantiles (single-pass)
    -> broadcast thresholds -> one more user-grain aggregate; no
    windows, no sorts."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0)
        ).alias("rev")
    )
    cuts = pu.groupBy("variant").agg(
        F.round(F.percentile("rev", F.lit(0.2)), 4).alias("q20"),
        F.round(F.percentile("rev", F.lit(0.8)), 4).alias("q80"),
    )
    wins = pu.join(F.broadcast(cuts), "variant").select(
        "variant",
        F.when(
            (F.col("rev") >= F.col("q20")) & (F.col("rev") <= F.col("q80")), 1
        )
        .otherwise(0)
        .alias("in_trim"),
        "rev",
        F.least(F.greatest(F.col("rev"), F.col("q20")), F.col("q80")).alias(
            "wrev"
        ),
    )
    mom = wins.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("in_trim").cast("bigint").alias("h"),
        dsum(F.when(F.col("in_trim") == 1, F.col("rev"))).alias("ts"),
        dsum("wrev").alias("ws"),
        dsum(F.col("wrev") * F.col("wrev")).alias("wss"),
    )
    dvar = (
        (F.col("wss") - F.col("ws") * F.col("ws") / F.col("n"))
        / (F.col("n") - 1)
        * (F.col("n") - F.lit(1.0))
        / (F.col("h") * (F.col("h") - F.lit(1.0)))
    )
    sides = mom.agg(
        F.max(F.when(F.col("variant") == 0, F.col("ts") / F.col("h"))).alias(
            "tm0"
        ),
        F.max(F.when(F.col("variant") == 1, F.col("ts") / F.col("h"))).alias(
            "tm1"
        ),
        F.max(F.when(F.col("variant") == 0, dvar)).alias("d0"),
        F.max(F.when(F.col("variant") == 1, dvar)).alias("d1"),
        F.max(F.when(F.col("variant") == 0, F.col("h")))
        .cast("bigint")
        .alias("h0"),
        F.max(F.when(F.col("variant") == 1, F.col("h")))
        .cast("bigint")
        .alias("h1"),
    )
    zs = sides.select(
        "h0",
        "h1",
        _q6(F.col("tm0")).alias("trimmed_mean_control"),
        _q6(F.col("tm1")).alias("trimmed_mean_treat"),
        _q6((F.col("tm1") - F.col("tm0")) / F.sqrt(F.col("d0") + F.col("d1"))).alias(
            "z"
        ),
    )
    tstage = zs.withColumn("t", F.expr(_T_EXPR)).withColumn(
        "pdf", F.expr(_PDF_EXPR)
    )
    return tstage.select(
        F.col("h0").alias("n_trimmed_control"),
        F.col("h1").alias("n_trimmed_treat"),
        "trimmed_mean_control",
        "trimmed_mean_treat",
        F.col("z").alias("yuen_t"),
        _q6(F.expr(_P2_EXPR)).alias("p_two_sided"),
    )
