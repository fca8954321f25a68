"""Round-7 batch-46 surface: Welch heteroscedastic ANOVA, the
Jonckheere-Terpstra ordered-trend test, spectral entropy
(forecastability), item-item cosine CF, and the turning-point
randomness test.

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from es_analytics_spark.functions.exact import davg_expr, dsum, dsum_expr
from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.functions.fanout import fan_out
from es_analytics_spark.functions.ranks import cumulative_offsets
from es_analytics_spark.queries import _t, query


def _q6(c):
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


# ---------------------------------------------------------------------------
# Welch heteroscedastic one-way ANOVA
# ---------------------------------------------------------------------------

# F(2, inf) 0.95 critical value = chi2(2)/2 — the large-sample threshold
# (per-arm n is thousands here, so df2 is effectively infinite)
_F_CRIT_2_INF = 2.9957322735539895

_WANOVA_SQL = f"""
    WITH pu AS MATERIALIZED (
        SELECT user_id, CAST(user_id % 3 AS INT) AS grp,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), gstats AS MATERIALIZED (
        SELECT grp, COUNT(*) AS n, {davg_expr('rev')} AS mu
        FROM pu GROUP BY grp
    ), gvar AS (
        SELECT p.grp, MAX(g.n) AS n,
               FLOOR(MAX(g.mu) * 1e6 + 0.5) / 1e6 AS mu,
               FLOOR(CAST(ROUND(SUM(CAST((p.rev - g.mu) * (p.rev - g.mu)
                                         AS DECIMAL(38,6))), 4) AS DOUBLE)
                     / (MAX(g.n) - 1) * 1e6 + 0.5) / 1e6 AS var
        FROM pu p JOIN gstats g USING (grp)
        GROUP BY p.grp
    ), wsum AS (
        SELECT SUM(n) AS n_total, COUNT(*) AS k,
               SUM(n / var) AS w_sum,
               SUM(n / var * mu) AS wm_sum
        FROM gvar
    ), core AS (
        SELECT w.n_total, w.k,
               SUM(g.n / g.var * (g.mu - w.wm_sum / w.w_sum)
                   * (g.mu - w.wm_sum / w.w_sum)) / (w.k - 1) AS num,
               SUM((1.0 - (g.n / g.var) / w.w_sum)
                   * (1.0 - (g.n / g.var) / w.w_sum) / (g.n - 1)) AS lam
        FROM gvar g CROSS JOIN wsum w
        GROUP BY w.n_total, w.k
    )
    SELECT CAST(k AS BIGINT) AS k, CAST(n_total AS BIGINT) AS n,
           CAST(k - 1 AS BIGINT) AS df1,
           FLOOR((k * k - 1.0) / (3.0 * lam) * 1e4 + 0.5) / 1e4 AS df2,
           FLOOR(num / (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * lam) * 1e6 + 0.5)
               / 1e6 AS f_stat,
           num / (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * lam)
               > {_F_CRIT_2_INF} AS significant_approx
    FROM core
"""


@query("stat_welch_anova", oracle=_WANOVA_SQL)
def stat_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedastic one-way ANOVA over per-user purchase
    revenue across three variants (user_id % 3): the k-sample mean
    comparison that does NOT assume equal variances — the omnibus to
    run when stat_levene_bf / stat_bartlett reject homogeneity (plain
    stat_anova_oneway is anti-conservative under variance imbalance,
    the Behrens-Fisher problem ab_welch_ttest solves for k=2).
    Welch-Satterthwaite df2 reported; the verdict uses the F(df1, inf)
    large-sample critical value (per-arm n is thousands, so df2 is
    effectively infinite — documented approximation).

    Exactness: group means come from the decimal contract and the
    squared-deviation sums go through DECIMAL(38,6) (the
    agg_higher_moments recipe); means and variances are quantized at
    1e6 FIRST, so the Welch F and df2 are fixed IEEE trees over a
    3-row frame of exact quantized stats.

    Scale: user-grain aggregate, |groups|-row stats, one more
    user-grain deviation pass — every downstream frame is k-sized."""
    from pyspark.sql.types import DecimalType

    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("rev")
        )
        .select((F.col("user_id") % 3).cast("int").alias("grp"), "rev")
        .transform(cut_lineage)
    )
    gstats = pu.groupBy("grp").agg(
        F.count("*").alias("n"), (dsum("rev") / F.count("rev")).alias("mu")
    )
    gvar = (
        pu.join(F.broadcast(gstats), "grp")
        .groupBy("grp")
        .agg(
            F.max("n").alias("n"),
            _q6(F.max("mu")).alias("mu"),
            _q6(
                F.round(
                    F.sum(
                        (
                            (F.col("rev") - F.col("mu"))
                            * (F.col("rev") - F.col("mu"))
                        ).cast(DecimalType(38, 6))
                    ),
                    4,
                ).cast("double")
                / (F.max("n") - 1)
            ).alias("var"),
        )
    )
    w = F.col("n") / F.col("var")
    wsum = gvar.agg(
        F.sum("n").alias("n_total"),
        F.count("*").alias("k"),
        F.sum(w).alias("w_sum"),
        F.sum(w * F.col("mu")).alias("wm_sum"),
    )
    joined = gvar.crossJoin(F.broadcast(wsum))
    grand = F.col("wm_sum") / F.col("w_sum")
    core = joined.groupBy("n_total", "k").agg(
        (F.sum(w * (F.col("mu") - grand) * (F.col("mu") - grand)) / (F.col("k") - 1))
        .alias("num"),
        F.sum(
            (1.0 - w / F.col("w_sum")) * (1.0 - w / F.col("w_sum")) / (F.col("n") - 1)
        ).alias("lam"),
    )
    k = F.col("k")
    f_stat = F.col("num") / (1.0 + 2.0 * (k - 2.0) / (k * k - 1.0) * F.col("lam"))
    return core.select(
        k.cast("bigint").alias("k"),
        F.col("n_total").cast("bigint").alias("n"),
        (k - 1).cast("bigint").alias("df1"),
        (F.floor((k * k - 1.0) / (3.0 * F.col("lam")) * 1e4 + F.lit(0.5)) / 1e4).alias(
            "df2"
        ),
        _q6(f_stat).alias("f_stat"),
        (f_stat > _F_CRIT_2_INF).alias("significant_approx"),
    )


# ---------------------------------------------------------------------------
# Jonckheere-Terpstra ordered-alternative trend test
# ---------------------------------------------------------------------------

_JT_SQL = f"""
    WITH pu AS (
        SELECT user_id, CAST(user_id % 3 AS INT) AS grp,
               {dsum_expr("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS rev
        FROM events GROUP BY user_id
    ), g AS (
        SELECT rev,
               SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS c0,
               SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS c1,
               SUM(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS c2
        FROM pu GROUP BY rev
    ), cum AS (
        SELECT c0, c1, c2,
               SUM(c0) OVER (ORDER BY rev) - c0 AS k0,
               SUM(c1) OVER (ORDER BY rev) - c1 AS k1,
               SUM(c2) OVER (ORDER BY rev) - c2 AS k2
        FROM g
    ), agg AS (
        SELECT SUM(c0) AS n0, SUM(c1) AS n1, SUM(c2) AS n2,
               SUM(c1 * (2 * k0 + c0)) + SUM(c2 * (2 * k0 + c0))
                   + SUM(c2 * (2 * k1 + c1)) AS jt2
        FROM cum
    )
    SELECT CAST(n0 + n1 + n2 AS BIGINT) AS n,
           CAST(jt2 AS BIGINT) AS jt2,
           FLOOR((CAST(jt2 AS DOUBLE) / 2.0
                  - (CAST(n0 + n1 + n2 AS DOUBLE) * (n0 + n1 + n2)
                     - (CAST(n0 AS DOUBLE) * n0 + CAST(n1 AS DOUBLE) * n1
                        + CAST(n2 AS DOUBLE) * n2)) / 4.0)
                 / SQRT((CAST(n0 + n1 + n2 AS DOUBLE) * (n0 + n1 + n2)
                         * (2.0 * (n0 + n1 + n2) + 3.0)
                         - (CAST(n0 AS DOUBLE) * n0 * (2.0 * n0 + 3.0)
                            + CAST(n1 AS DOUBLE) * n1 * (2.0 * n1 + 3.0)
                            + CAST(n2 AS DOUBLE) * n2 * (2.0 * n2 + 3.0))) / 72.0)
                 * 1e6 + 0.5) / 1e6 AS z_score,
           ABS((CAST(jt2 AS DOUBLE) / 2.0
                - (CAST(n0 + n1 + n2 AS DOUBLE) * (n0 + n1 + n2)
                   - (CAST(n0 AS DOUBLE) * n0 + CAST(n1 AS DOUBLE) * n1
                      + CAST(n2 AS DOUBLE) * n2)) / 4.0)
               / SQRT((CAST(n0 + n1 + n2 AS DOUBLE) * (n0 + n1 + n2)
                       * (2.0 * (n0 + n1 + n2) + 3.0)
                       - (CAST(n0 AS DOUBLE) * n0 * (2.0 * n0 + 3.0)
                          + CAST(n1 AS DOUBLE) * n1 * (2.0 * n1 + 3.0)
                          + CAST(n2 AS DOUBLE) * n2 * (2.0 * n2 + 3.0))) / 72.0))
               > 1.959963984540054 AS significant
    FROM agg
"""


@query("stat_jonckheere_terpstra", oracle=_JT_SQL)
def stat_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-alternative trend test: is per-user
    purchase revenue MONOTONICALLY ordered across the three variants
    (grp 0 <= 1 <= 2)? JT = sum over group pairs i<j of the
    Mann-Whitney count #{x_i < x_j} (+ half-ties) — strictly more
    powerful than stat_kruskal_wallis when the alternative is a dose-
    response ordering (price tiers, exposure intensity), which is the
    hypothesis an ordered rollout actually tests.

    Exactness: doubled pair counts 2*U_ij = sum_v c_jv*(2*cum_i + c_iv)
    are pure BIGINT over value-grain counts and per-group exclusive
    cumulatives; the z-score is one fixed IEEE tree over the exact
    integers (standard no-tie variance — revenue ties are negligible
    at the decimal grain and BOTH engines use the identical formula),
    half-up quantized.

    Scale: the three per-group cumulatives ride the same window-free
    range-partition + triangle-offset recipe over ONE shared ranged
    frame; everything after the value grain is a reduction."""
    ev = _t(spark, sf_dir, "events")["events"]
    pu = (
        ev.groupBy("user_id")
        .agg(
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
            ).alias("rev")
        )
        .select((F.col("user_id") % 3).cast("int").alias("grp"), "rev")
    )
    g = pu.groupBy("rev").agg(
        *[
            F.sum(F.when(F.col("grp") == i, 1).otherwise(0)).alias(f"c{i}")
            for i in range(3)
        ]
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        g.repartitionByRange(n_parts, F.asc("rev"))
        .withColumn("pid", F.spark_partition_id())
        .transform(cut_lineage)
    )
    w = W.partitionBy("pid").orderBy(F.asc("rev")).rowsBetween(W.unboundedPreceding, 0)
    local = ranged.select(
        "pid",
        "c0",
        "c1",
        "c2",
        *[(F.sum(f"c{i}").over(w) - F.col(f"c{i}")).alias(f"l{i}") for i in range(3)],
    )
    cum = local
    for i in range(3):
        offs = cumulative_offsets(
            ranged.groupBy("pid").agg(F.sum(f"c{i}").alias("ct")), cnt="ct"
        ).withColumnRenamed("off", f"off{i}")
        cum = cum.join(F.broadcast(offs), "pid")
    k0, k1 = (
        F.col("l0") + F.col("off0"),
        F.col("l1") + F.col("off1"),
    )
    agg = cum.agg(
        F.sum("c0").alias("n0"),
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        (
            F.sum(F.col("c1") * (2 * k0 + F.col("c0")))
            + F.sum(F.col("c2") * (2 * k0 + F.col("c0")))
            + F.sum(F.col("c2") * (2 * k1 + F.col("c1")))
        ).alias("jt2"),
    )
    n0, n1, n2 = (F.col(c).cast("double") for c in ("n0", "n1", "n2"))
    n = n0 + n1 + n2
    mean = (n * n - (n0 * n0 + n1 * n1 + n2 * n2)) / 4.0
    var = (
        n * n * (2.0 * n + 3.0)
        - (
            n0 * n0 * (2.0 * n0 + 3.0)
            + n1 * n1 * (2.0 * n1 + 3.0)
            + n2 * n2 * (2.0 * n2 + 3.0)
        )
    ) / 72.0
    z = (F.col("jt2").cast("double") / 2.0 - mean) / F.sqrt(var)
    return agg.select(
        n.cast("bigint").alias("n"),
        F.col("jt2").cast("bigint").alias("jt2"),
        _q6(z).alias("z_score"),
        (F.abs(z) > 1.959963984540054).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Spectral entropy / forecastability of the daily-revenue series
# ---------------------------------------------------------------------------

_SE_PERIODS = (2, 3, 4, 5, 6, 7, 10, 14, 21, 28)


def _se_sql() -> str:
    from es_analytics_spark.queries_sql14 import _pg_twiddles

    blocks = []
    for p in _SE_PERIODS:
        tw = " UNION ALL ".join(
            f"SELECT {t} AS ph, {c!r} AS cs, {s!r} AS sn"
            for t, c, s in _pg_twiddles(p)
        )
        blocks.append(f"""
    SELECT {p} AS period,
           FLOOR((sc * sc + ss * ss) / CAST(n_days AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS power
    FROM (
        SELECT {dsum_expr('d.y * t.cs')} AS sc, {dsum_expr('d.y * t.sn')} AS ss,
               CAST(MAX(d.n_days) AS BIGINT) AS n_days
        FROM idx d JOIN ({tw}) t ON t.ph = d.i % {p}
    )""")
    union = " UNION ALL ".join(blocks)
    return f"""
    WITH daily AS MATERIALIZED (
        SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
               {dsum_expr('value')} AS y0
        FROM events GROUP BY 1
    ), mu AS (
        SELECT {dsum_expr('y0')} / COUNT(y0) AS m, COUNT(*) AS n_days
        FROM daily
    ), idx AS MATERIALIZED (
        SELECT CAST(DATEDIFF('day', (SELECT MIN(day) FROM daily), day)
                    AS BIGINT) AS i,
               y0 - (SELECT m FROM mu) AS y,
               (SELECT n_days FROM mu) AS n_days
        FROM daily
    ), pg AS MATERIALIZED ({union}),
    tot AS (
        SELECT SUM(power) AS ptot, COUNT(*) AS np FROM pg
    ), ent AS (
        SELECT t.np, t.ptot,
               SUM(CASE WHEN p.power > 0
                   THEN -(p.power / t.ptot)
                        * FLOOR(LN(p.power / t.ptot) * 1e6 + 0.5) / 1e6
                   ELSE 0 END) AS h_raw
        FROM pg p CROSS JOIN tot t GROUP BY t.np, t.ptot
    ), top AS (
        SELECT period AS top_period FROM pg
        ORDER BY power DESC, period ASC LIMIT 1
    )
    SELECT CAST(e.np AS BIGINT) AS n_periods,
           FLOOR(e.ptot * 1e4 + 0.5) / 1e4 AS total_power,
           FLOOR(e.h_raw / (FLOOR(LN(CAST(e.np AS DOUBLE)) * 1e6 + 0.5) / 1e6)
                 * 1e6 + 0.5) / 1e6 AS spectral_entropy,
           FLOOR((1.0 - e.h_raw / (FLOOR(LN(CAST(e.np AS DOUBLE)) * 1e6 + 0.5)
                                   / 1e6)) * 1e6 + 0.5) / 1e6 AS forecastability,
           t.top_period
    FROM ent e CROSS JOIN top t
"""


@query("ts_spectral_entropy", oracle=_se_sql())
def ts_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of the daily-revenue series over a fixed
    candidate-period bank (2-28 days): the normalized Shannon entropy
    of the periodogram power shares — LOW entropy means power is
    concentrated at one period (seasonal, forecastable), HIGH means
    near-white noise. `forecastability = 1 - entropy` is the series-
    selection score a forecasting pipeline computes BEFORE fitting
    anything (ts_periodogram_fixed scores two candidate periods; this
    collapses the whole bank into one schedulable number, with the
    winning period attached).

    Exactness: twiddle factors are Python-precomputed literals shared
    by both plans (no engine evaluates cos/sin); per-period powers are
    quantized at 1e6 BEFORE the share/entropy math; each LN goes
    through the quantize-at-6 transcendental contract, so the entropy
    is a fixed tree over a 10-row frame of exact values.

    Scale: each period adds one |period|-row broadcast join over the
    calendar-bounded daily frame — the bank is a constant factor on
    one scan, and everything after is 10-row arithmetic."""
    from es_analytics_spark.queries_sql14 import _pg_twiddles

    # decimal daily partial sums run map-side in the scan stage; fan
    # out on the day key (layout-adaptive no-op at scale)
    e = fan_out(
        _t(spark, sf_dir, "events")["events"],
        sf_dir, "events", F.date_trunc("day", "ts"), weight=8,
    )
    daily = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(dsum("value").alias("y0"))
        .transform(cut_lineage)
    )
    mu = daily.agg(
        (dsum("y0") / F.count("y0")).alias("m"), F.count(F.lit(1)).alias("n_days")
    )
    mins = daily.agg(F.min("day").alias("day0"))
    idx = (
        daily.crossJoin(F.broadcast(mu))
        .crossJoin(F.broadcast(mins))
        .select(
            F.datediff(F.col("day"), F.col("day0")).cast("bigint").alias("i"),
            (F.col("y0") - F.col("m")).alias("y"),
            "n_days",
        )
        .transform(cut_lineage)
    )
    # ONE pass over the daily frame for the whole period bank: the
    # banked twiddle table (sum of periods ~ 100 rows) broadcasts once
    # and a single grouped aggregate replaces the former 10 separate
    # agg branches (each paid its own broadcast build + job — measured
    # ~34 jobs/run for this query, mostly those branches). Per-period
    # terms y*cs / y*sn are the identical IEEE products, and dsum is
    # order-independent, so the grouped sums bit-match the per-branch
    # sums. The left join onto the literal period list reproduces the
    # old all-periods output (null power) even on an empty input frame.
    tw_all = spark.createDataFrame(
        [(p, t, c, s) for p in _SE_PERIODS for (t, c, s) in _pg_twiddles(p)],
        "period int, ph long, cs double, sn double",
    )
    by_period = (
        idx.join(
            F.broadcast(tw_all), F.col("i") % F.col("period") == F.col("ph")
        )
        .groupBy("period")
        .agg(
            dsum(F.col("y") * F.col("cs")).alias("sc"),
            dsum(F.col("y") * F.col("sn")).alias("ss"),
            F.max("n_days").cast("bigint").alias("n_days"),
        )
    )
    periods_lit = spark.createDataFrame(
        [(p,) for p in _SE_PERIODS], "period int"
    )
    pg = (
        periods_lit.join(by_period, "period", "left")
        .select(
            "period",
            _q6(
                (F.col("sc") * F.col("sc") + F.col("ss") * F.col("ss"))
                / F.col("n_days").cast("double")
            ).alias("power"),
        )
        .transform(cut_lineage)
    )
    tot = pg.agg(F.sum("power").alias("ptot"), F.count("*").alias("np"))
    share = F.col("power") / F.col("ptot")
    ln_q6 = F.floor(F.log(share) * 1e6 + F.lit(0.5)) / 1e6
    ent = (
        pg.crossJoin(F.broadcast(tot))
        .groupBy("np", "ptot")
        .agg(
            F.sum(
                F.when(F.col("power") > 0, -share * ln_q6).otherwise(0.0)
            ).alias("h_raw")
        )
    )
    top = (
        pg.orderBy(F.col("power").desc(), F.col("period").asc())
        .limit(1)
        .select(F.col("period").alias("top_period"))
    )
    ln_np = F.floor(F.log(F.col("np").cast("double")) * 1e6 + F.lit(0.5)) / 1e6
    return ent.crossJoin(F.broadcast(top)).select(
        F.col("np").cast("bigint").alias("n_periods"),
        (F.floor(F.col("ptot") * 1e4 + F.lit(0.5)) / 1e4).alias("total_power"),
        _q6(F.col("h_raw") / ln_np).alias("spectral_entropy"),
        _q6(1.0 - F.col("h_raw") / ln_np).alias("forecastability"),
        "top_period",
    )


# ---------------------------------------------------------------------------
# Item-item cosine collaborative filtering
# ---------------------------------------------------------------------------

_ICF_FP = 1_000_000_000

_ICF_SQL = f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), item AS (
        SELECT p, COUNT(*) AS n_p FROM op GROUP BY p
    ), pair AS (
        SELECT a.p AS p1, b.p AS p2, COUNT(*) AS support
        FROM op a JOIN op b ON a.o = b.o AND a.p < b.p
        GROUP BY a.p, b.p
    )
    SELECT p1, p2, support,
           CAST(FLOOR(CAST({_ICF_FP} AS DOUBLE) * support
                      / SQRT(CAST(i1.n_p * i2.n_p AS DOUBLE)) + 0.5) AS BIGINT)
               AS cosine_fp
    FROM pair
    JOIN item i1 ON i1.p = pair.p1
    JOIN item i2 ON i2.p = pair.p2
    WHERE support >= 2
    ORDER BY cosine_fp DESC, support DESC, p1 ASC, p2 ASC LIMIT 20
"""


@query("rec_item_cf_cosine", oracle=_ICF_SQL)
def rec_item_cf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine collaborative filtering: top-20 co-purchased
    part pairs by support / sqrt(pop1 * pop2) — the binary-vector
    cosine that classic item-item CF (Sarwar et al.) ranks neighbors
    by. Complements rec_item_cooccurrence's LIFT (lift finds
    surprising pairs, cosine finds RELIABLE pairs for a
    recommend-similar-items surface) and rec_user_cf_topk's user-side
    neighborhood.

    Exactness: supports and popularities are exact integers; the
    cosine quantizes to 1e9 fixed point via one fixed IEEE tree
    (BIGINT product under the sqrt), with (support, p1, p2) breaking
    ties.

    Scale: the same within-basket pair self-join as
    rec_item_cooccurrence (pairs bounded by basket-size caps natural
    to order data), item popularities broadcast, TakeOrdered top-20."""
    li = _t(spark, sf_dir, "lineitem")["lineitem"]
    op = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct().transform(cut_lineage)
    item = op.groupBy("p").agg(F.count(F.lit(1)).alias("n_p"))
    # basket-explosion stage parallelism (see rec_item_cooccurrence):
    # co-partition both self-join sides on the order key at the
    # conf-derived width; hash- instead of sort-merge-join
    opf = fan_out(op, sf_dir, "lineitem", "o", weight=8)
    a, b = opf.alias("a"), opf.alias("b")
    pair = (
        a.hint("shuffle_hash")
        .join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .groupBy(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
    )
    i1 = item.select(F.col("p").alias("p1"), F.col("n_p").alias("n1"))
    i2 = item.select(F.col("p").alias("p2"), F.col("n_p").alias("n2"))
    cos_fp = F.floor(
        F.lit(float(_ICF_FP))
        * F.col("support")
        / F.sqrt((F.col("n1") * F.col("n2")).cast("double"))
        + F.lit(0.5)
    ).cast("bigint")
    return (
        pair.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .select("p1", "p2", "support", cos_fp.alias("cosine_fp"))
        .orderBy(
            F.col("cosine_fp").desc(),
            F.col("support").desc(),
            F.col("p1").asc(),
            F.col("p2").asc(),
        )
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Turning-point randomness test per series
# ---------------------------------------------------------------------------

_TP_SQL = """
    WITH daily AS MATERIALIZED (
        SELECT event_type, DATE_TRUNC('day', ts) AS day, COUNT(*) AS cnt
        FROM events GROUP BY event_type, DATE_TRUNC('day', ts)
    ), lagged AS (
        SELECT event_type, cnt,
               LAG(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev,
               LEAD(cnt) OVER (PARTITION BY event_type ORDER BY day) AS next
        FROM daily
    ), agg AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN prev IS NOT NULL AND next IS NOT NULL
                             AND ((cnt > prev AND cnt > next)
                                  OR (cnt < prev AND cnt < next))
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
        FROM lagged GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days, n_turning,
           FLOOR(2.0 * (n - 2) / 3.0 * 1e6 + 0.5) / 1e6 AS expected,
           FLOOR((n_turning - 2.0 * (n - 2) / 3.0)
                 / SQRT((16.0 * n - 29.0) / 90.0) * 1e6 + 0.5) / 1e6 AS z_score,
           ABS((n_turning - 2.0 * (n - 2) / 3.0)
               / SQRT((16.0 * n - 29.0) / 90.0)) > 1.959963984540054
               AS reject_random
    FROM agg
    ORDER BY event_type
"""


@query("ts_turning_points", oracle=_TP_SQL)
def ts_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point randomness test per event type: count the strict
    local maxima/minima of the daily-count series and compare with the
    i.i.d. expectation 2(n-2)/3 (variance (16n-29)/90) — too FEW
    turning points means trend/autocorrelation, too MANY means
    oscillation. The distribution-free companion to stat_runs_test
    (runs tests level-vs-median structure; turning points test
    LOCAL-shape structure), and the cheap pre-check before fitting any
    ts_holt_* model (a series that accepts randomness has nothing to
    forecast). Plateau ties produce neither a peak nor a trough
    (strict inequalities — both engines identical).

    Exactness: turning-point counts are exact integers over lag/lead
    of exact daily counts; the z-score is one fixed IEEE tree,
    half-up quantized.

    Scale: per-series calendar-bounded windows (|days| rows per
    series) — the same shape as every ts_* daily entry; verdict frame
    is |series| rows."""
    ev = _t(spark, sf_dir, "events")["events"]
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("cnt"))
    w = W.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "cnt",
        F.lag("cnt").over(w).alias("prev"),
        F.lead("cnt").over(w).alias("next"),
    )
    turning = (
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & (
            ((F.col("cnt") > F.col("prev")) & (F.col("cnt") > F.col("next")))
            | ((F.col("cnt") < F.col("prev")) & (F.col("cnt") < F.col("next")))
        )
    )
    agg = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(turning, 1).otherwise(0)).cast("bigint").alias("n_turning"),
    )
    n = F.col("n").cast("double")
    expected = 2.0 * (n - 2) / 3.0
    z = (F.col("n_turning") - expected) / F.sqrt((16.0 * n - 29.0) / 90.0)
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        "n_turning",
        _q6(expected).alias("expected"),
        _q6(z).alias("z_score"),
        (F.abs(z) > 1.959963984540054).alias("reject_random"),
    ).orderBy("event_type")
