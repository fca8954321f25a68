"""Round-5 batch-29 surface: uplift-by-bin with a Qini prefix curve,
the Mantel-Haenszel pooled odds ratio, and Neyman (optimal) sample
allocation.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Uplift by behavior bin + Qini prefix curve
# ---------------------------------------------------------------------------

_UPLIFT_SQL = """
    WITH pu AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               CAST(LEAST(GREATEST(SUM(CASE WHEN event_type = 'click'
                                            THEN 1 ELSE 0 END) - 8, 0) // 2, 6)
                    AS BIGINT) AS bin,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
                        THEN 1 ELSE 0 END) AS label
        FROM events GROUP BY user_id
    ), bins AS MATERIALIZED (
        SELECT bin,
               CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_c,
               CAST(SUM(CASE WHEN variant = 0 THEN label ELSE 0 END)
                    AS BIGINT) AS x_c,
               CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_t,
               CAST(SUM(CASE WHEN variant = 1 THEN label ELSE 0 END)
                    AS BIGINT) AS x_t
        FROM pu GROUP BY bin
    ), scored AS MATERIALIZED (
        SELECT bin, n_c, x_c, n_t, x_t,
               FLOOR((CAST(x_t AS DOUBLE) / n_t
                      - CAST(x_c AS DOUBLE) / n_c) * 1e6 + 0.5) / 1e6
                   AS uplift
        FROM bins WHERE n_c > 0 AND n_t > 0
    )
    SELECT a.bin, a.n_c AS n_control, a.x_c AS conv_control,
           a.n_t AS n_treat, a.x_t AS conv_treat, a.uplift,
           FLOOR(SUM(CAST(b.x_t AS DOUBLE)
                     - CAST(b.x_c AS DOUBLE) * b.n_t / b.n_c)
                 * 1e6 + 0.5) / 1e6 AS qini_cum
    FROM scored a
    JOIN scored b
      ON b.uplift > a.uplift OR (b.uplift = a.uplift AND b.bin <= a.bin)
    GROUP BY a.bin, a.n_c, a.x_c, a.n_t, a.x_t, a.uplift
"""


@query("ml_uplift_by_bin", oracle=_UPLIFT_SQL)
def ml_uplift_by_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneous treatment effect by behavior bin: per click-count
    bin (the calibration family's score), the treatment-minus-control
    conversion uplift plus the Qini prefix curve (cumulative incremental
    conversions when targeting bins in decreasing-uplift order) — the
    table an uplift-targeting policy reads: ab_experiment_report gives
    ONE average effect; this shows who the effect lives in and how much
    of it the top segments capture.

    Exactness: bin counts are exact integers; uplift quantizes at 1e-6
    BEFORE the prefix ordering, so the Qini order is identical on both
    engines (bin id breaks uplift ties); the prefix accumulation is a
    broadcast triangle join over the constant 7-bin frame (no window,
    no allowlist) with decimal-safe exact-rational terms.

    Scale: user-grain aggregate -> constant bin grain -> bin^2 triangle
    join — all constant-size after the first shuffle."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy("user_id").agg(
        F.least(
            F.floor(
                F.greatest(
                    F.sum(
                        F.when(F.col("event_type") == "click", 1).otherwise(0)
                    )
                    - 8,
                    F.lit(0),
                )
                / 2
            ),
            F.lit(6).cast("bigint"),
        )
        .cast("bigint")
        .alias("bin"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100.0),
                1,
            ).otherwise(0)
        ).alias("label"),
    ).withColumn("variant", (F.col("user_id") % 2).cast("int"))
    bins = (
        pu.groupBy("bin")
        .agg(
            F.count_if(F.col("variant") == 0).cast("bigint").alias("n_c"),
            F.sum(F.when(F.col("variant") == 0, F.col("label")).otherwise(0))
            .cast("bigint")
            .alias("x_c"),
            F.count_if(F.col("variant") == 1).cast("bigint").alias("n_t"),
            F.sum(F.when(F.col("variant") == 1, F.col("label")).otherwise(0))
            .cast("bigint")
            .alias("x_t"),
        )
        .filter((F.col("n_c") > 0) & (F.col("n_t") > 0))
        .withColumn(
            "uplift",
            _q6(
                F.col("x_t").cast("double") / F.col("n_t")
                - F.col("x_c").cast("double") / F.col("n_c")
            ),
        )
        .transform(cut_lineage)
    )
    a = bins.alias("a")
    b = bins.alias("b")
    prefix = (F.col("b.uplift") > F.col("a.uplift")) | (
        (F.col("b.uplift") == F.col("a.uplift")) & (F.col("b.bin") <= F.col("a.bin"))
    )
    return (
        a.join(F.broadcast(b), prefix)
        .groupBy(
            F.col("a.bin").alias("bin"),
            F.col("a.n_c").alias("n_control"),
            F.col("a.x_c").alias("conv_control"),
            F.col("a.n_t").alias("n_treat"),
            F.col("a.x_t").alias("conv_treat"),
            F.col("a.uplift").alias("uplift"),
        )
        .agg(
            _q6(
                F.sum(
                    F.col("b.x_t").cast("double")
                    - F.col("b.x_c").cast("double") * F.col("b.n_t") / F.col("b.n_c")
                )
            ).alias("qini_cum")
        )
    )


# ---------------------------------------------------------------------------
# Mantel-Haenszel pooled odds ratio across day-of-week strata
# ---------------------------------------------------------------------------

_MH_SQL = f"""
    WITH cells AS MATERIALIZED (
        SELECT user_id,
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    AS BIGINT) AS dow,
               CAST(user_id % 2 AS INT) AS exposed,
               MAX(CASE WHEN event_type = 'purchase' AND value >= 90
                        THEN 1 ELSE 0 END) AS outcome
        FROM events GROUP BY 1, 2, 3
    ), strata AS MATERIALIZED (
        SELECT dow,
               CAST(COUNT(*) FILTER (WHERE exposed = 1 AND outcome = 1)
                    AS BIGINT) AS a,
               CAST(COUNT(*) FILTER (WHERE exposed = 1 AND outcome = 0)
                    AS BIGINT) AS b,
               CAST(COUNT(*) FILTER (WHERE exposed = 0 AND outcome = 1)
                    AS BIGINT) AS c,
               CAST(COUNT(*) FILTER (WHERE exposed = 0 AND outcome = 0)
                    AS BIGINT) AS d
        FROM cells GROUP BY dow
    ), tot AS (
        SELECT CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
               CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(d) AS BIGINT) AS sd,
               CAST(COUNT(*) AS BIGINT) AS n_strata,
               {dsum_expr('a * 1.0 * d / (a + b + c + d)')} AS num,
               {dsum_expr('b * 1.0 * c / (a + b + c + d)')} AS den
        FROM strata
    )
    SELECT n_strata,
           FLOOR((CAST(sa AS DOUBLE) * sd) / (CAST(sb AS DOUBLE) * sc)
                 * 1e6 + 0.5) / 1e6 AS or_crude,
           FLOOR(num / den * 1e6 + 0.5) / 1e6 AS or_mantel_haenszel
    FROM tot
"""


@query("stat_odds_ratio_mh", oracle=_MH_SQL)
def stat_odds_ratio_mh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mantel-Haenszel pooled odds ratio: the variant -> high-value-
    conversion odds ratio pooled across day-of-week strata (units are
    (user, dow) activity cells), next to the crude unstratified OR —
    the classic confounding check: if crude and MH diverge, the
    stratifier is mixing into the effect (Simpson's-paradox territory;
    ab_simpson_check flags sign flips, MH gives the adjusted
    estimate).

    Exactness: all 2x2 cells are exact integers; each stratum's
    ad/n and bc/n terms are identical exact-rational IEEE trees
    decimal-summed over the 7-stratum support; both ORs are single
    quantized divisions.

    Scale: one (user, dow)-grain aggregate -> 7-row strata -> 1-row
    reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    cells = e.groupBy(
        "user_id",
        (
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) % 7
        )
        .cast("bigint")
        .alias("dow"),
        (F.col("user_id") % 2).cast("int").alias("exposed"),
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 90), 1
            ).otherwise(0)
        ).alias("outcome")
    )
    strata = cells.groupBy("dow").agg(
        F.count_if((F.col("exposed") == 1) & (F.col("outcome") == 1))
        .cast("bigint")
        .alias("a"),
        F.count_if((F.col("exposed") == 1) & (F.col("outcome") == 0))
        .cast("bigint")
        .alias("b"),
        F.count_if((F.col("exposed") == 0) & (F.col("outcome") == 1))
        .cast("bigint")
        .alias("c"),
        F.count_if((F.col("exposed") == 0) & (F.col("outcome") == 0))
        .cast("bigint")
        .alias("d"),
    )
    n_i = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    tot = strata.agg(
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum("c").cast("bigint").alias("sc"),
        F.sum("d").cast("bigint").alias("sd"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        dsum(F.col("a") * F.lit(1.0) * F.col("d") / n_i).alias("num"),
        dsum(F.col("b") * F.lit(1.0) * F.col("c") / n_i).alias("den"),
    )
    return tot.select(
        "n_strata",
        _q6(
            (F.col("sa").cast("double") * F.col("sd"))
            / (F.col("sb").cast("double") * F.col("sc"))
        ).alias("or_crude"),
        _q6(F.col("num") / F.col("den")).alias("or_mantel_haenszel"),
    )


# ---------------------------------------------------------------------------
# Neyman (optimal) sample allocation across event-type strata
# ---------------------------------------------------------------------------

_NEY_BUDGET = 1000

_NEY_SQL = f"""
    WITH strata AS MATERIALIZED (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_h,
               {dsum_expr('value')} AS s1, {dsum_expr('value * value')} AS s2
        FROM events GROUP BY event_type
    ), w AS MATERIALIZED (
        SELECT event_type, n_h,
               FLOOR(n_h * SQRT((s2 - s1 * s1 / n_h) / (n_h - 1))
                     * 1e6 + 0.5) / 1e6 AS wgt
        FROM strata
    ), tot AS (
        SELECT {dsum_expr('wgt')} AS wsum FROM w
    ), alloc AS MATERIALIZED (
        SELECT w.event_type, w.n_h, w.wgt,
               CAST(FLOOR({_NEY_BUDGET} * w.wgt / t.wsum) AS BIGINT) AS base,
               {_NEY_BUDGET} * w.wgt / t.wsum
                   - FLOOR({_NEY_BUDGET} * w.wgt / t.wsum) AS rem
        FROM w CROSS JOIN tot t
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, event_type ASC) AS rn,
               SUM(base) OVER () AS base_sum
        FROM alloc
    )
    SELECT event_type, n_h, wgt AS neyman_weight,
           CAST(base + CASE WHEN rn <= {_NEY_BUDGET} - base_sum
                            THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
    FROM ranked
"""


@query("sample_neyman_allocation", oracle=_NEY_SQL)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) allocation of a {_NEY_BUDGET}-row sampling
    budget across event-type strata: allocate proportionally to
    N_h * S_h (stratum size x stratum standard deviation), the
    allocation that minimizes the variance of the stratified mean —
    sample_proportional_allocation ignores within-stratum variance;
    Neyman is what a measurement pipeline should actually use when
    strata differ in noise. Integerized with the largest-remainder
    method (same convention as the proportional entry).

    Exactness: stratum moments are decimal-contract sums; each weight
    is one fixed SQRT tree quantized at 1e-6 BEFORE normalization (so
    both engines divide identical weights); bases and remainders are
    fixed trees on those quantized values; the remainder rank breaks
    ties on event_type.

    Scale: one map-side-combinable aggregate; the allocation runs on
    the |strata| frame (plan-guard allowlisted on that bound, same as
    sample_proportional_allocation)."""
    e = _t(spark, sf_dir, "events")["events"]
    strata = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    w = strata.select(
        "event_type",
        "n_h",
        _q6(
            F.col("n_h")
            * F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_h"))
                / (F.col("n_h") - 1)
            )
        ).alias("wgt"),
    ).transform(cut_lineage)
    tot = w.agg(dsum("wgt").alias("wsum"))
    frac = F.lit(_NEY_BUDGET) * F.col("wgt") / F.col("wsum")
    alloc = w.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_h",
        "wgt",
        F.floor(frac).cast("bigint").alias("base"),
        (frac - F.floor(frac)).alias("rem"),
    )
    ranked = alloc.withColumn(
        "rn",
        F.row_number().over(W.orderBy(F.col("rem").desc(), F.col("event_type"))),
    ).withColumn("base_sum", F.sum("base").over(W.partitionBy(F.lit(1))))
    return ranked.select(
        "event_type",
        "n_h",
        F.col("wgt").alias("neyman_weight"),
        (
            F.col("base")
            + F.when(F.col("rn") <= _NEY_BUDGET - F.col("base_sum"), 1).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("n_alloc"),
    )
