"""Round-5 batch-15 surface: the skyline (Pareto frontier) operator, the
Wald-Wolfowitz runs test, KL / Jensen-Shannon distribution divergence,
and a quantile-quantile decile table.

Same contract as the rest of the catalog (see queries.py): every entry
pairs a Spark-first implementation with a DuckDB oracle, is
deterministic as a set of rows, and keeps float math cross-engine
stable via the decimal-sum contract, integer fixed-point intermediates,
and single-LN terms on identical rationals (quantize-at-1e-6
precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (min price, max size)
# ---------------------------------------------------------------------------

_SKYLINE_SQL = """
    WITH grain AS MATERIALIZED (
        SELECT CAST(p_size AS BIGINT) AS size,
               CAST(MIN(FLOOR(p_retailprice * 100 + 0.5)) AS BIGINT)
                   AS min_price_c,
               CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM part GROUP BY 1
    )
    SELECT p.size, p.min_price_c, p.n_parts
    FROM grain p
    WHERE NOT EXISTS (
        SELECT 1 FROM grain q
        WHERE q.size > p.size AND q.min_price_c <= p.min_price_c)
"""


@query("agg_skyline_pareto", oracle=_SKYLINE_SQL)
def agg_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of parts under (minimize price,
    maximize size): the classic multi-criteria DB operator — a part is
    on the skyline iff no other part is at least as cheap AND strictly
    larger; the output is exactly the "no-compromise" candidate set a
    buyer (or a downstream ranker) should ever consider.

    The scale-safe spelling: first reduce to the per-size cheapest
    price (one map-side-combinable aggregate to the value-domain-
    bounded size grain — dominance within a size collapses to MIN),
    THEN test dominance with an anti-join over that bounded grain.
    The naive row×row skyline join is quadratic in parts; this one is
    quadratic only in |size domain| (<= 50).

    Exactness: prices enter as exact integer cents (the stump-band
    convention); dominance is pure integer comparison — no floats."""
    p = _t(spark, sf_dir, "part")["part"]
    grain = (
        p.groupBy(F.col("p_size").cast("bigint").alias("size"))
        .agg(
            F.min(F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)))
            .cast("bigint")
            .alias("min_price_c"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        )
        .transform(cut_lineage)
    )
    dom = grain.select(
        F.col("size").alias("q_size"), F.col("min_price_c").alias("q_price")
    )
    return grain.join(
        F.broadcast(dom),
        (F.col("q_size") > F.col("size"))
        & (F.col("q_price") <= F.col("min_price_c")),
        "left_anti",
    ).select("size", "min_price_c", "n_parts")


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test per event type
# ---------------------------------------------------------------------------

_RUNS_SQL = f"""
    WITH daily AS MATERIALIZED (
        SELECT event_type, CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, ROUND(QUANTILE_CONT(y, 0.5), 4) AS med
        FROM daily GROUP BY 1
    ), signs AS (
        SELECT d.event_type, d.day, (d.y > m.med) AS s
        FROM daily d JOIN med m USING (event_type)
        WHERE d.y <> m.med
    ), lagged AS (
        SELECT event_type, s,
               CASE WHEN s <> LAG(s) OVER (PARTITION BY event_type
                                           ORDER BY day)
                    THEN 1 ELSE 0 END AS chg
        FROM signs
    ), runs AS (
        SELECT event_type, CAST(1 + SUM(chg) AS BIGINT) AS r,
               CAST(COUNT(*) FILTER (WHERE s) AS BIGINT) AS n1,
               CAST(COUNT(*) FILTER (WHERE NOT s) AS BIGINT) AS n2
        FROM lagged GROUP BY event_type
    )
    SELECT event_type, r AS n_runs, n1, n2,
           FLOOR((1 + 2.0 * n1 * n2 / CAST(n1 + n2 AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS expected_runs,
           FLOOR((CAST(r AS DOUBLE)
                  - (1 + 2.0 * n1 * n2 / CAST(n1 + n2 AS DOUBLE)))
                 / SQRT(2.0 * n1 * n2
                        * (2.0 * n1 * n2 - CAST(n1 + n2 AS DOUBLE))
                        / (CAST(n1 + n2 AS DOUBLE)
                           * CAST(n1 + n2 AS DOUBLE)
                           * CAST(n1 + n2 - 1 AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS z_runs
    FROM runs
"""


@query("stat_runs_test", oracle=_RUNS_SQL)
def stat_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test per event type: count runs of
    above/below-median days in the daily-revenue series and compare to
    the run count a random ordering would produce — the randomness
    screen that is orthogonal to BOTH Ljung-Box (linear
    autocorrelation) and Mann-Kendall (monotone trend): clustering of
    good/bad days with no linear structure still fails it.

    Exactness: the median threshold is the shared interpolated
    quantile rounded at 1e-4 (the agg_percentile contract), sign
    comparisons are on identical doubles (exact-tie days are excluded
    in both engines), the run count and n1/n2 are exact integers, and
    E[R]/z are fixed IEEE trees with one SQRT, quantized at 1e-6.

    Scale: one shuffle to the calendar-bounded (type, day) grain;
    per-type windows; a |types|-row reduction."""
    e = _t(spark, sf_dir, "events")["events"]
    daily = (
        e.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y"))
        .transform(cut_lineage)
    )
    med = daily.groupBy("event_type").agg(
        F.round(F.percentile("y", F.lit(0.5)), 4).alias("med")
    )
    signs = (
        daily.join(F.broadcast(med), "event_type")
        .filter(F.col("y") != F.col("med"))
        .select("event_type", "day", (F.col("y") > F.col("med")).alias("s"))
    )
    w = W.partitionBy("event_type").orderBy("day")
    runs = (
        signs.withColumn("chg", F.when(F.col("s") != F.lag("s").over(w), 1).otherwise(0))
        .groupBy("event_type")
        .agg(
            (1 + F.sum("chg")).cast("bigint").alias("r"),
            F.count_if(F.col("s")).cast("bigint").alias("n1"),
            F.count_if(~F.col("s")).cast("bigint").alias("n2"),
        )
    )
    n = (F.col("n1") + F.col("n2")).cast("double")
    er = 1 + F.lit(2.0) * F.col("n1") * F.col("n2") / n
    varr = (
        F.lit(2.0)
        * F.col("n1")
        * F.col("n2")
        * (F.lit(2.0) * F.col("n1") * F.col("n2") - n)
        / (n * n * (F.col("n1") + F.col("n2") - 1).cast("double"))
    )
    return runs.select(
        "event_type",
        F.col("r").alias("n_runs"),
        "n1",
        "n2",
        _q6(er).alias("expected_runs"),
        _q6((F.col("r").cast("double") - er) / F.sqrt(varr)).alias("z_runs"),
    )


# ---------------------------------------------------------------------------
# KL / Jensen-Shannon divergence between two event-type value mixes
# ---------------------------------------------------------------------------

_KL_BAND = 25.0
_KL_MAXBIN = 19
_KL_BINS = _KL_MAXBIN + 1

_KL_SQL = f"""
    WITH binned AS MATERIALIZED (
        SELECT LEAST(CAST(FLOOR(value / {_KL_BAND}) AS BIGINT),
                     {_KL_MAXBIN}) AS b,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS cp,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view')
                    AS BIGINT) AS cq
        FROM events WHERE event_type IN ('purchase', 'view') GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq
        FROM binned
    ), probs AS MATERIALIZED (
        SELECT b,
               CAST(cp + 1 AS DOUBLE) / CAST(np + {_KL_BINS} AS DOUBLE) AS p,
               CAST(cq + 1 AS DOUBLE) / CAST(nq + {_KL_BINS} AS DOUBLE) AS q,
               np, nq
        FROM binned CROSS JOIN tot
    )
    SELECT CAST(MAX(np) AS BIGINT) AS n_p, CAST(MAX(nq) AS BIGINT) AS n_q,
           FLOOR({dsum_expr('p * LN(p / q)')} * 1e6 + 0.5) / 1e6 AS kl_pq,
           FLOOR({dsum_expr('q * LN(q / p)')} * 1e6 + 0.5) / 1e6 AS kl_qp,
           FLOOR(({dsum_expr('0.5 * p * LN(p / ((p + q) / 2))')}
                  + {dsum_expr('0.5 * q * LN(q / ((p + q) / 2))')})
                 * 1e6 + 0.5) / 1e6 AS js
    FROM probs
"""


@query("stat_kl_divergence", oracle=_KL_SQL)
def stat_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence (both directions) and Jensen-Shannon divergence
    between the purchase and view value distributions over 20 fixed
    bands with add-one smoothing — the information-theoretic
    distribution-shift pair next to ml_psi_drift's PSI: KL is what
    loss functions see, JS is the bounded symmetric version safe to
    alert on.

    Exactness: band counts and totals are exact integers; smoothed
    p/q are identical exact-int ratios; every LN runs on identical
    rationals (the catalog LN precedent) inside per-band terms that
    are decimal-summed over the constant 20-band support; outputs
    quantize at 1e-6.

    Scale: one scan to the constant band grid; divergence arithmetic
    is band-count work. Add-one smoothing keeps empty bands finite in
    both directions by construction."""
    e = _t(spark, sf_dir, "events")["events"]
    binned = (
        e.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy(
            F.least(
                F.floor(F.col("value") / F.lit(_KL_BAND)).cast("bigint"),
                F.lit(_KL_MAXBIN).cast("bigint"),
            ).alias("b")
        )
        .agg(
            F.count_if(F.col("event_type") == "purchase")
            .cast("bigint")
            .alias("cp"),
            F.count_if(F.col("event_type") == "view")
            .cast("bigint")
            .alias("cq"),
        )
        .transform(cut_lineage)
    )
    tot = binned.agg(
        F.sum("cp").cast("bigint").alias("np"),
        F.sum("cq").cast("bigint").alias("nq"),
    )
    probs = binned.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            (F.col("cp") + 1).cast("double")
            / (F.col("np") + _KL_BINS).cast("double")
        ).alias("p"),
        (
            (F.col("cq") + 1).cast("double")
            / (F.col("nq") + _KL_BINS).cast("double")
        ).alias("q"),
        "np",
        "nq",
    )
    p, q = F.col("p"), F.col("q")
    m = (p + q) / 2
    return probs.agg(
        F.max("np").cast("bigint").alias("n_p"),
        F.max("nq").cast("bigint").alias("n_q"),
        _q6(dsum(p * F.log(p / q))).alias("kl_pq"),
        _q6(dsum(q * F.log(q / p))).alias("kl_qp"),
        _q6(
            dsum(F.lit(0.5) * p * F.log(p / m))
            + dsum(F.lit(0.5) * q * F.log(q / m))
        ).alias("js"),
    )


# ---------------------------------------------------------------------------
# Quantile-quantile decile table (purchase vs view values)
# ---------------------------------------------------------------------------

_QQ_PS = tuple(round(0.1 * k, 1) for k in range(1, 10))

_QQ_SQL = f"""
    WITH qs AS (
        SELECT event_type,
               QUANTILE_CONT(value, [{', '.join(str(p) for p in _QQ_PS)}])
                   AS qv
        FROM events WHERE event_type IN ('purchase', 'view')
        GROUP BY event_type
    ), longq AS (
        SELECT event_type, GENERATE_SUBSCRIPTS(qv, 1) AS k,
               ROUND(UNNEST(qv), 4) AS q
        FROM qs
    )
    SELECT CAST(p.k AS BIGINT) AS decile_idx,
           p.q AS q_purchase, v.q AS q_view,
           FLOOR((p.q - v.q) * 1e6 + 0.5) / 1e6 AS qq_gap
    FROM (SELECT k, q FROM longq WHERE event_type = 'purchase') p
    JOIN (SELECT k, q FROM longq WHERE event_type = 'view') v USING (k)
"""


@query("stat_qq_table", oracle=_QQ_SQL)
def stat_qq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-quantile decile table comparing the purchase and view
    value distributions: the nine decile pairs plus their gap — the
    table behind a QQ plot, which localizes WHERE two distributions
    diverge (stat_ks_test gives one max-gap number; the QQ table
    shows the tail vs body structure that explains it).

    Exactness: both engines compute the same interpolated quantile
    (Spark percentile ≡ DuckDB QUANTILE_CONT — the agg_percentile
    contract), rounded at 1e-4 before the gap subtraction, which is
    then one quantized IEEE op.

    Scale: one aggregate per group computing the full decile vector
    in a single pass (percentile with a literal array), then a
    9-row join — no per-decile rescans."""
    e = _t(spark, sf_dir, "events")["events"]
    ps = F.array(*[F.lit(p) for p in _QQ_PS])
    qs = (
        e.filter(F.col("event_type").isin("purchase", "view"))
        .groupBy("event_type")
        .agg(F.percentile("value", ps).alias("qv"))
    )
    longq = qs.select(
        "event_type", F.posexplode("qv").alias("k0", "qraw")
    ).select(
        "event_type",
        (F.col("k0") + 1).cast("bigint").alias("k"),
        F.round("qraw", 4).alias("q"),
    )
    pq = longq.filter(F.col("event_type") == "purchase").select(
        "k", F.col("q").alias("q_purchase")
    )
    vq = longq.filter(F.col("event_type") == "view").select(
        "k", F.col("q").alias("q_view")
    )
    return pq.join(vq, "k").select(
        F.col("k").alias("decile_idx"),
        "q_purchase",
        "q_view",
        _q6(F.col("q_purchase") - F.col("q_view")).alias("qq_gap"),
    )
