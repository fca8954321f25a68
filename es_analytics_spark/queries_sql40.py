"""Round-5 batch-40 surface: TOST equivalence testing between
variants.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql16 import _PDF_EXPR, _T_EXPR
from es_analytics_spark.queries_sql17 import _TAIL_EXPR


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# One-sided upper-tail p for a SIGNED z: P(Z > z) = tail(|z|) when
# z >= 0, else 1 - tail(|z|) — built from the shared pinned fragments.
def _p_upper_sql(z: str) -> str:
    return (
        f"CASE WHEN {z} >= 0 THEN ({_TAIL_EXPR.replace('z', z)})"
        f" ELSE 1.0 - ({_TAIL_EXPR.replace('z', z)}) END"
    )


_TOST_MARGIN = 0.05  # equivalence margin: 5% of the control mean

_TOST_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
               {dsum_expr("CASE WHEN event_type = 'purchase'"
                          " THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY 1, 2
    ), mom AS (
        SELECT CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS n0,
               CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS n1,
               {dsum_expr('CASE WHEN variant = 0 THEN rev END')} AS s0,
               {dsum_expr('CASE WHEN variant = 1 THEN rev END')} AS s1,
               {dsum_expr('CASE WHEN variant = 0 THEN rev * rev END')} AS ss0,
               {dsum_expr('CASE WHEN variant = 1 THEN rev * rev END')} AS ss1
        FROM pu
    ), stats AS (
        SELECT n0, n1, s0 / n0 AS m0, s1 / n1 AS m1,
               (ss0 - s0 * s0 / n0) / (n0 - 1) / n0
                   + (ss1 - s1 * s1 / n1) / (n1 - 1) / n1 AS se2,
               {_TOST_MARGIN} * (s0 / n0) AS delta
        FROM mom
    ), zs AS (
        SELECT n0, n1,
               FLOOR(m0 * 1e6 + 0.5) / 1e6 AS mean_control,
               FLOOR(m1 * 1e6 + 0.5) / 1e6 AS mean_treat,
               FLOOR(delta * 1e6 + 0.5) / 1e6 AS margin,
               FLOOR((m1 - m0 + delta) / SQRT(se2) * 1e6 + 0.5) / 1e6 AS zlow,
               FLOOR((delta - (m1 - m0)) / SQRT(se2) * 1e6 + 0.5) / 1e6 AS zhigh
        FROM stats
    ), ps AS (
        SELECT n0, n1, mean_control, mean_treat, margin, zlow, zhigh,
               GREATEST(
                   (SELECT {_p_upper_sql('zl.z')}
                    FROM (SELECT zlow AS z, 1.0 / (1.0 + 0.2316419 * ABS(zlow)) AS t,
                                 0.3989422804014327 * EXP(-0.5 * zlow * zlow) AS pdf) zl),
                   (SELECT {_p_upper_sql('zh.z')}
                    FROM (SELECT zhigh AS z, 1.0 / (1.0 + 0.2316419 * ABS(zhigh)) AS t,
                                 0.3989422804014327 * EXP(-0.5 * zhigh * zhigh) AS pdf) zh)
               ) AS p_tost
        FROM zs
    )
    SELECT n0 AS n_control, n1 AS n_treat, mean_control, mean_treat, margin,
           zlow AS z_lower, zhigh AS z_upper,
           FLOOR(p_tost * 1e6 + 0.5) / 1e6 AS p_tost,
           CAST(CASE WHEN p_tost < 0.05 THEN 1 ELSE 0 END AS BIGINT)
               AS is_equivalent
    FROM ps
"""


@query("ab_equivalence_tost", oracle=_TOST_SQL)
def ab_equivalence_tost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST (two one-sided tests) equivalence readout on per-user
    purchase revenue between variants, with a {_TOST_MARGIN:.0%}-of-
    control equivalence margin: both one-sided z-tests must reject
    (p_tost = max of the two one-sided p's) to declare the treatment
    EQUIVALENT — the correct statistics for "this refactor/migration
    did not change revenue", where a non-significant t-test is NOT
    evidence of no effect (absence of evidence fallacy; every
    infrastructure launch review needs this, not ab_welch_ttest).

    Exactness: moments are decimal-contract sums; both z's quantize at
    1e-6 before the pinned A&S 26.2.17 one-sided tails (evaluated via
    Phi symmetry); the verdict compares the quantized p to the
    literal alpha.

    Scale: one user-grain aggregate and a 1-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    pu = e.groupBy(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).agg(
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0)
        ).alias("rev")
    )
    mom = pu.agg(
        F.count_if(F.col("variant") == 0).cast("bigint").alias("n0"),
        F.count_if(F.col("variant") == 1).cast("bigint").alias("n1"),
        dsum(F.when(F.col("variant") == 0, F.col("rev"))).alias("s0"),
        dsum(F.when(F.col("variant") == 1, F.col("rev"))).alias("s1"),
        dsum(F.when(F.col("variant") == 0, F.col("rev") * F.col("rev"))).alias(
            "ss0"
        ),
        dsum(F.when(F.col("variant") == 1, F.col("rev") * F.col("rev"))).alias(
            "ss1"
        ),
    )
    m0 = F.col("s0") / F.col("n0")
    m1 = F.col("s1") / F.col("n1")
    se2 = (
        (F.col("ss0") - F.col("s0") * F.col("s0") / F.col("n0"))
        / (F.col("n0") - 1)
        / F.col("n0")
        + (F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1"))
        / (F.col("n1") - 1)
        / F.col("n1")
    )
    delta = F.lit(_TOST_MARGIN) * m0
    zs = mom.select(
        "n0",
        "n1",
        _q6(m0).alias("mean_control"),
        _q6(m1).alias("mean_treat"),
        _q6(delta).alias("margin"),
        _q6((m1 - m0 + delta) / F.sqrt(se2)).alias("zlow"),
        _q6((delta - (m1 - m0)) / F.sqrt(se2)).alias("zhigh"),
    )

    def p_upper_of(zcol: str):
        # P(Z > z) via the shared fragments: tail(|z|) for z >= 0,
        # 1 - tail(|z|) for z < 0 (Phi symmetry)
        t = f"1.0 / (1.0 + 0.2316419 * ABS({zcol}))"
        pdf = f"0.3989422804014327 * EXP(-0.5 * {zcol} * {zcol})"
        tail = _TAIL_EXPR.replace("pdf", f"({pdf})").replace("t", f"({t})")
        return F.expr(
            f"CASE WHEN {zcol} >= 0 THEN ({tail}) ELSE 1.0 - ({tail}) END"
        )

    ps = zs.withColumn(
        "p_tost",
        F.greatest(p_upper_of("zlow"), p_upper_of("zhigh")),
    )
    return ps.select(
        F.col("n0").alias("n_control"),
        F.col("n1").alias("n_treat"),
        "mean_control",
        "mean_treat",
        "margin",
        F.col("zlow").alias("z_lower"),
        F.col("zhigh").alias("z_upper"),
        _q6(F.col("p_tost")).alias("p_tost"),
        F.when(F.col("p_tost") < 0.05, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_equivalent"),
    )
