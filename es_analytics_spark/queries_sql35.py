"""Round-5 batch-35 surface: the stationary distribution of the
event-type Markov chain (unrolled power iteration under the
exact-compare contract).

Same contract as the rest of the catalog (see queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from es_analytics_spark.functions.lineage import cut_lineage
from es_analytics_spark.queries import _t, query
from es_analytics_spark.queries_sql2 import _dsum12_sql

_PI_ITERS = 8
# driver-pull guard: the transition matrix is |event_types|^2-bounded
_PI_MAX_EDGES = 200_000


def _stationary_sql(iters: int = _PI_ITERS) -> str:
    parts = [
        """
    WITH seq AS MATERIALIZED (
        SELECT event_type AS src,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY EPOCH_US(ts), event_id
               ) AS dst
        FROM events
    ), cnt AS MATERIALIZED (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
    ), rows_ AS MATERIALIZED (
        SELECT src, CAST(SUM(n) AS BIGINT) AS rs FROM cnt GROUP BY src
    ), kk AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k FROM rows_
    ), p0 AS (
        SELECT src AS node, CAST(1.0 AS DOUBLE) / kk.k AS pi
        FROM rows_ CROSS JOIN kk
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f""", p{i} AS (
        SELECT c.dst AS node,
               {_dsum12_sql('p.pi * c.n / r.rs')} AS pi
        FROM cnt c
        JOIN p{i - 1} p ON p.node = c.src
        JOIN rows_ r ON r.src = c.src
        GROUP BY c.dst
    )"""
        )
    parts.append(
        f""", resid AS (
        SELECT CAST(ROUND(MAX(ABS(a.pi - b.pi)), 9) AS DOUBLE) AS residual
        FROM p{iters} a JOIN p{iters - 1} b ON a.node = b.node
    )
    SELECT node AS event_type, ROUND(pi, 9) AS stationary_share, residual
    FROM p{iters} CROSS JOIN resid
"""
    )
    return "".join(parts)


@query("ts_markov_stationary", oracle=_stationary_sql())
def ts_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the first-order event-type Markov
    chain ({_PI_ITERS} unrolled power iterations from the uniform
    start, with the convergence residual): the long-run share of time
    a user's journey spends in each state — ts_markov_transitions
    gives the one-step dynamics; the stationary vector is what those
    dynamics IMPLY about equilibrium traffic mix, and the gap between
    stationary and observed shares flags a system still in transient
    (e.g., onboarding-heavy) regime.

    Exactness: transition counts and row sums are exact integers; each
    iteration's per-edge term (pi * n / rowsum) is an identical
    exact-rational IEEE tree decimal-summed at scale 12 (the pagerank
    iteration contract), so the distributed aggregation bit-matches
    the oracle's unrolled CTE chain; outputs round at 1e-9 with the
    residual telemetry sizing the iteration count (the r4 convergence
    contract).

    Scale: one lead() window per user, a |types|^2 count grain, then
    {_PI_ITERS} joins over that constant grain — iteration is
    driver-side control flow over lazily composed plans."""
    ev = _t(spark, sf_dir, "events")["events"]
    wu = W.partitionBy("user_id").orderBy(F.unix_micros(F.col("ts")), "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(wu).alias("dst"),
    )
    cnt = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .transform(cut_lineage)
    )
    rows_ = cnt.groupBy("src").agg(F.sum("n").cast("bigint").alias("rs"))
    # Driver-side power iteration over the |types|^2-bounded chain (the
    # seq_expected_steps_to_purchase recipe): the distributed loop paid
    # ~6 tiny jobs per iteration (broadcast builds + eager checkpoints,
    # measured 53 jobs/run) to re-derive a <=|types|-row frame 8 times.
    # The Python mirror reproduces the former expression tree op for op
    # (IEEE term, shortest-string double->DECIMAL(38,15) cast, exact
    # decimal sum, HALF_UP round at 12, 2^53-safe decimal->double);
    # collect is limit-guarded like every k-bounded driver pull here.
    edges = (
        cnt.join(rows_, "src")
        .select("src", "dst", "n", "rs")
        .limit(_PI_MAX_EDGES + 1)
        .collect()
    )
    if len(edges) > _PI_MAX_EDGES:
        raise ValueError(
            f"ts_markov_stationary: transition matrix exceeds {_PI_MAX_EDGES} "
            "rows; raise _PI_MAX_EDGES (|event_types|^2-bounded by design)"
        )
    import decimal as _dec

    q15, q12 = _dec.Decimal("1e-15"), _dec.Decimal("1e-12")
    srcs = sorted({r["src"] for r in edges})
    k = len(srcs)
    pi_map = {nd: 1.0 / k for nd in srcs}
    prev_map = dict(pi_map)
    with _dec.localcontext() as ctx:
        ctx.prec = 60
        for _ in range(_PI_ITERS):
            acc: dict[str, _dec.Decimal] = {}
            for r in edges:
                p = pi_map.get(r["src"])
                if p is None:
                    continue
                term = p * float(r["n"]) / float(r["rs"])
                acc[r["dst"]] = acc.get(r["dst"], _dec.Decimal(0)) + _dec.Decimal(
                    repr(term)
                ).quantize(q15, rounding=_dec.ROUND_HALF_UP)
            prev_map = pi_map
            pi_map = {
                nd: float(v.quantize(q12, rounding=_dec.ROUND_HALF_UP))
                for nd, v in acc.items()
            }
    pi = spark.createDataFrame(
        sorted(pi_map.items()), "node string, pi double"
    )
    pi_prev = spark.createDataFrame(
        sorted(prev_map.items()), "node string, pi double"
    )
    resid = (
        pi.join(pi_prev.select("node", F.col("pi").alias("prev")), "node").agg(
            F.round(F.max(F.abs(F.col("pi") - F.col("prev"))), 9)
            .cast("double")
            .alias("residual")
        )
    )
    return pi.crossJoin(F.broadcast(resid)).select(
        F.col("node").alias("event_type"),
        F.round("pi", 9).alias("stationary_share"),
        "residual",
    )
