"""Property tests for the round-3 algorithmic primitives: the
Misra-Gries superset invariant under adversarial streams/partitionings
(pure python — the same mg_update the registered query's Arrow workers
run) and the closed-form NTILE's equivalence with the window NTILE."""

import collections
import random

from hypothesis import given, settings, strategies as st

from es_analytics_spark.queries_sql3 import mg_update

from pyspark.sql import Window as W, functions as F


@given(
    data=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=2000),
    k=st.integers(min_value=3, max_value=16),
    n_parts=st.integers(min_value=1, max_value=5),
    batch=st.integers(min_value=1, max_value=64),
    seed=st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=200, deadline=None)
def test_misra_gries_superset_under_any_partitioning(data, k, n_parts, batch, seed):
    """Every key with global frequency > n/(k+1) must survive the
    per-partition summaries' union, for EVERY partitioning and batch
    slicing — the invariant that lets agg_heavy_hitters carry a plain
    SQL oracle instead of an approximation waiver."""
    rng = random.Random(seed)
    parts = [[] for _ in range(n_parts)]
    for x in data:
        parts[rng.randrange(n_parts)].append(x)
    candidates = set()
    for part in parts:
        counters = {}
        for i in range(0, len(part), batch):
            chunk = collections.Counter(part[i : i + batch])
            mg_update(counters, chunk.items(), k)
        candidates |= set(counters)
    n = len(data)
    truth = {key for key, c in collections.Counter(data).items() if c * (k + 1) > n}
    assert truth <= candidates, (
        f"lost heavy hitters {truth - candidates} (n={n}, k={k})"
    )


def test_ntile_closed_form_matches_window_ntile(spark):
    """The closed-form tile assignment must equal F.ntile for every
    rank across many awkward sizes (n smaller than, equal to, and not
    divisible by the bucket count)."""
    from es_analytics_spark.queries_sql3 import ntile_closed_form

    for n in [1, 3, 7, 10, 11, 19, 20, 21, 97, 100, 101, 500, 503]:
        for buckets in (3, 10):
            df = (
                spark.range(1, n + 1)
                .withColumn("rank", F.col("id"))
                .withColumn("n", F.lit(n).cast("bigint"))
            )
            got = df.select(
                "rank", ntile_closed_form(F.col("rank"), F.col("n"), buckets).alias("t")
            )
            want = df.select(
                "rank", F.ntile(buckets).over(W.orderBy("rank")).alias("t")
            )
            diff = got.exceptAll(want).union(want.exceptAll(got))
            assert diff.count() == 0, (n, buckets, diff.collect()[:5])
