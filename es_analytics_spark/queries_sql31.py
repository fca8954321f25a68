"""Round-5 batch-31 surface: revenue-quintile migration between window
halves, and standardized chi-square cell residuals.

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
# Revenue-quintile migration (first half -> second half)
# ---------------------------------------------------------------------------


def _bucket_sql(rev: str, cuts: str) -> str:
    return (
        f"1 + CAST({rev} > {cuts}[1] AS INT) + CAST({rev} > {cuts}[2] AS INT)"
        f" + CAST({rev} > {cuts}[3] AS INT) + CAST({rev} > {cuts}[4] AS INT)"
    )


_MIGRATE_SQL = f"""
    WITH span AS (
        SELECT CAST(MIN(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)))
                    AS BIGINT) AS d0,
               CAST(MAX(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)))
                    AS BIGINT) AS d1
        FROM events
    ), pu AS MATERIALIZED (
        SELECT e.user_id,
               {dsum_expr("CASE WHEN event_type = 'purchase' AND "
                          "CAST(DATEDIFF('day', DATE '1970-01-01',"
                          " CAST(ts AS DATE)) AS BIGINT)"
                          " <= (s.d0 + s.d1) // 2 THEN value ELSE 0 END")}
                   AS h1,
               {dsum_expr("CASE WHEN event_type = 'purchase' AND "
                          "CAST(DATEDIFF('day', DATE '1970-01-01',"
                          " CAST(ts AS DATE)) AS BIGINT)"
                          " > (s.d0 + s.d1) // 2 THEN value ELSE 0 END")}
                   AS h2
        FROM events e CROSS JOIN span s
        GROUP BY e.user_id
    ), cuts AS (
        SELECT [ROUND(QUANTILE_CONT(h1, 0.2), 4),
                ROUND(QUANTILE_CONT(h1, 0.4), 4),
                ROUND(QUANTILE_CONT(h1, 0.6), 4),
                ROUND(QUANTILE_CONT(h1, 0.8), 4)] AS c1,
               [ROUND(QUANTILE_CONT(h2, 0.2), 4),
                ROUND(QUANTILE_CONT(h2, 0.4), 4),
                ROUND(QUANTILE_CONT(h2, 0.6), 4),
                ROUND(QUANTILE_CONT(h2, 0.8), 4)] AS c2
        FROM pu
    ), assigned AS MATERIALIZED (
        SELECT CAST({_bucket_sql('p.h1', 'c.c1')} AS BIGINT) AS q_from,
               CAST({_bucket_sql('p.h2', 'c.c2')} AS BIGINT) AS q_to
        FROM pu p CROSS JOIN cuts c
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM assigned
    )
    SELECT a.q_from, a.q_to, CAST(COUNT(*) AS BIGINT) AS n_users,
           FLOOR(CAST(COUNT(*) AS DOUBLE) / t.n * 1e6 + 0.5) / 1e6 AS share
    FROM assigned a CROSS JOIN tot t
    GROUP BY a.q_from, a.q_to, t.n
"""


@query("ts_decile_migration", oracle=_MIGRATE_SQL)
def ts_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-quintile migration matrix: bucket every user's purchase
    revenue into quintiles separately for the first and second half of
    the observation window, then count the (from, to) transitions —
    the customer-value mobility table behind "are our whales stable or
    churning" (rec_rfm_segments snapshots value once; migration shows
    the FLOW, which is what retention teams act on). Quintile cuts are
    per-half (each half gets its own distribution), so the diagonal
    measures rank stability, not revenue growth.

    Exactness: half-window revenues are decimal-contract sums;
    quintile cuts use the shared quantile contract (1e-4); bucket
    assignment is a sum of exact boolean indicators against identical
    thresholds; counts and shares are exact/quantized.

    Scale: one user-grain aggregate, one single-pass quantile row
    broadcast back, a 25-cell reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    epoch_day = F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))).cast(
        "bigint"
    )
    span = e.agg(F.min(epoch_day).alias("d0"), F.max(epoch_day).alias("d1"))
    mid = F.floor((F.col("d0") + F.col("d1")) / 2).cast("bigint")
    pu = (
        e.crossJoin(F.broadcast(span))
        .groupBy("user_id")
        .agg(
            dsum(
                F.when(
                    (F.col("event_type") == "purchase") & (epoch_day <= mid),
                    F.col("value"),
                ).otherwise(0)
            ).alias("h1"),
            dsum(
                F.when(
                    (F.col("event_type") == "purchase") & (epoch_day > mid),
                    F.col("value"),
                ).otherwise(0)
            ).alias("h2"),
        )
        .transform(cut_lineage)
    )
    cuts = pu.agg(
        *[
            F.round(F.percentile("h1", F.lit(p)), 4).alias(f"c1_{i}")
            for i, p in enumerate((0.2, 0.4, 0.6, 0.8), 1)
        ],
        *[
            F.round(F.percentile("h2", F.lit(p)), 4).alias(f"c2_{i}")
            for i, p in enumerate((0.2, 0.4, 0.6, 0.8), 1)
        ],
    )

    def bucket(rev, pref):
        b = F.lit(1)
        for i in range(1, 5):
            b = b + F.when(F.col(rev) > F.col(f"{pref}_{i}"), 1).otherwise(0)
        return b.cast("bigint")

    assigned = pu.crossJoin(F.broadcast(cuts)).select(
        bucket("h1", "c1").alias("q_from"), bucket("h2", "c2").alias("q_to")
    )
    tot = assigned.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        assigned.crossJoin(F.broadcast(tot))
        .groupBy("q_from", "q_to", "n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            "q_from",
            "q_to",
            "n_users",
            _q6(F.col("n_users").cast("double") / F.col("n")).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Standardized chi-square cell residuals (event type x day of week)
# ---------------------------------------------------------------------------

_RESID_SQL = """
    WITH cells AS MATERIALIZED (
        SELECT event_type,
               CAST(DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                    AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ), margins AS MATERIALIZED (
        SELECT c.event_type, c.dow, c.o,
               r.rt, k.ct, t.n
        FROM cells c
        JOIN (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt
              FROM cells GROUP BY 1) r USING (event_type)
        JOIN (SELECT dow, CAST(SUM(o) AS BIGINT) AS ct
              FROM cells GROUP BY 1) k USING (dow)
        CROSS JOIN (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells) t
    )
    SELECT event_type, dow, o AS observed,
           FLOOR(CAST(rt AS DOUBLE) * ct / n * 1e6 + 0.5) / 1e6 AS expected,
           FLOOR((o - CAST(rt AS DOUBLE) * ct / n)
                 / SQRT(CAST(rt AS DOUBLE) * ct / n
                        * (1.0 - CAST(rt AS DOUBLE) / n)
                        * (1.0 - CAST(ct AS DOUBLE) / n))
                 * 1e6 + 0.5) / 1e6 AS std_residual
    FROM margins
"""


@query("stat_chi2_residuals", oracle=_RESID_SQL)
def stat_chi2_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted standardized residuals for every cell of the
    (event type x day-of-week) contingency table:
    (O - E) / sqrt(E (1 - rowshare)(1 - colshare)) — the drill-down
    that turns stat_chi2_independence's single omnibus number into
    WHICH cells drive the association (|residual| > 2 flags the cells,
    the standard post-hoc for contingency tables).

    Exactness: observed counts and margins are exact integers; each
    expected value and residual is one fixed IEEE tree on exact
    rationals with a single SQRT, quantized at 1e-6.

    Scale: one shuffle to the 35-cell grain; margins are tiny
    broadcast join-backs."""
    e = _t(spark, sf_dir, "events")["events"]
    cells = (
        e.groupBy(
            "event_type",
            (
                F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) % 7
            )
            .cast("bigint")
            .alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .transform(cut_lineage)
    )
    rows = cells.groupBy("event_type").agg(
        F.sum("o").cast("bigint").alias("rt")
    )
    colsum = cells.groupBy("dow").agg(F.sum("o").cast("bigint").alias("ct"))
    tot = cells.agg(F.sum("o").cast("bigint").alias("n"))
    m = (
        cells.join(F.broadcast(rows), "event_type")
        .join(F.broadcast(colsum), "dow")
        .crossJoin(F.broadcast(tot))
    )
    exp = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    resid = (F.col("o") - exp) / F.sqrt(
        exp
        * (F.lit(1.0) - F.col("rt").cast("double") / F.col("n"))
        * (F.lit(1.0) - F.col("ct").cast("double") / F.col("n"))
    )
    return m.select(
        "event_type",
        "dow",
        F.col("o").alias("observed"),
        _q6(exp).alias("expected"),
        _q6(resid).alias("std_residual"),
    )
