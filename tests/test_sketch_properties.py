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


def test_oracle_compare_flags_int_float_dtype_skew():
    """The harness must fail value-equal results whose pandas dtype
    classes differ (int64 1 vs float64 1.0) — the exact skew DuckDB's
    HUGEINT->float64 conversion produced in round 2, which a
    value-only compare silently passes but the driver's hash does not."""
    import pandas as pd

    from es_analytics_spark.oracle import _canon, _dtype_class

    a = pd.DataFrame({"k": [1, 2], "v": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": [1, 2], "v": pd.Series([1.0, 2.0], dtype="float64")})
    ca, cb = _canon(a), _canon(b)
    assert (ca["v"].astype(float) == cb["v"].astype(float)).all(), "values equal"
    assert _dtype_class(ca["v"]) == "int"
    assert _dtype_class(cb["v"]) == "float"
    assert _dtype_class(ca["v"]) != _dtype_class(cb["v"]), (
        "dtype-class gate must see the skew the value compare erases"
    )


def test_containment_dominates_jaccard(spark):
    """For every compared pair, max(containment directions) >= jaccard
    (|A∩B|/min >= |A∩B|/|A∪B|), and containment hits 1.0 for a true
    excerpt whose Jaccard is small — the reason the asymmetric measure
    exists."""
    from pyspark.sql import Row

    from es_analytics_spark.operators.dedup import ngram_jaccard_pairs
    from es_analytics_spark.queries import REGISTRY

    long_words = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=long_words, source="s"),
            Row(doc_id=2, text=excerpt, source="s"),
        ]
    )
    jac = ngram_jaccard_pairs(df, "doc_id", "text", ngram=3, block_col="source")
    j = {(r.id_a, r.id_b): r.jaccard for r in jac.collect()}
    # containment of the excerpt in the long doc is exactly 1.0
    from es_analytics_spark.operators.dedup import exploded_shingles
    import pyspark.sql.functions as F

    tok = exploded_shingles(df, "text", 3, keep=["doc_id", "source"], out_col="tok")
    a = tok.select("source", F.col("doc_id").alias("id_a"), "tok")
    b = tok.select("source", F.col("doc_id").alias("id_b"), "tok")
    inter = (
        a.join(b, ["source", "tok"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .count()
        .collect()
    )
    n_small = tok.filter(F.col("doc_id") == 2).count()
    assert inter and inter[0]["count"] == n_small, "excerpt grams fully contained"
    assert j[(1, 2)] < 0.2, "symmetric jaccard must miss the excerpt"


def test_partition_count_independence_of_sensitive_shapes(spark, sf_dir):
    """The catalog's correctness contract is partition-count
    independence (results identical on any cluster size). Full-catalog
    sweeps at 8 and 17 shuffle partitions pass out-of-band; this pins
    the shapes that *internally depend on partitioning* — the
    distributed rank/NTILE (spark_partition_id + offset table), the
    Misra-Gries candidate phase (per-partition summaries), and the
    salted join — by comparing results across two partition counts in
    one session."""
    from es_analytics_spark.queries import REGISTRY

    names = [
        "ml_split_shuffle",
        "ml_quality_bucket_sample",
        "agg_heavy_hitters",
        "join_salted_skew",
    ]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("5", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            for n in names:
                rows = sorted(
                    map(tuple, REGISTRY[n].fn(spark, sf_dir).collect())
                )
                results.setdefault(n, []).append(rows)
        for n, (a, b) in results.items():
            assert a == b, f"{n} depends on the shuffle partition count"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_decimal_regression_agrees_with_native_regr(spark, sf_dir):
    """The exact-contract regression must agree with Spark's native
    regr_slope/intercept/r2 to float tolerance — the decimal component
    spelling changes determinism, not semantics."""
    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.sources.lake import load_tables

    got = {
        r.event_type: (r.slope, r.intercept, r.r2)
        for r in REGISTRY["agg_linear_regression"].fn(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    ev.createOrReplaceTempView("__regr_events")
    native = {
        r.event_type: (r.s, r.i, r.r)
        for r in spark.sql(
            """
            SELECT event_type,
                   regr_slope(value, CAST(day(ts) AS DOUBLE)) AS s,
                   regr_intercept(value, CAST(day(ts) AS DOUBLE)) AS i,
                   regr_r2(value, CAST(day(ts) AS DOUBLE)) AS r
            FROM __regr_events GROUP BY event_type
            """
        ).collect()
    }
    assert set(got) == set(native)
    for et, (s, i, r) in got.items():
        ns, ni, nr = native[et]
        assert abs(s - ns) < 1e-6 and abs(i - ni) < 1e-6 and abs(r - nr) < 1e-6, (
            et, got[et], native[et]
        )


@given(
    n_distinct=st.integers(min_value=1, max_value=4000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_kmv_estimate_error_bound(n_distinct, seed):
    """Pure-python referee for the KMV estimator the engine runs in
    batch (agg_kmv_distinct) and in streaming state
    (stream_kmv_distinct): under-k regimes are EXACT, and above k the
    relative error over random id sets stays within ~5 standard errors
    of the 1/sqrt(k-2) KMV bound (a hard-fail ceiling, not a
    distributional assertion — hypothesis explores adversarial id
    sets, and linear-congruential hashes on structured ids are exactly
    where a bad estimator would blow up)."""
    import random

    from es_analytics_spark.functions.portable import MIX_P, MIX_A, MIX_B
    from es_analytics_spark.streaming.stateful import KMV_K, kmv_estimate

    rng = random.Random(seed)
    ids = rng.sample(range(10_000_000), n_distinct)
    hashes = sorted({(i * MIX_A + MIX_B) % MIX_P for i in ids})
    est = kmv_estimate(hashes[:KMV_K], MIX_P)
    n_h = len(hashes)  # collisions make the sketch see n_h <= n_distinct
    if n_h < KMV_K:
        assert est == float(n_h)
    else:
        rel = abs(est - n_h) / n_h
        assert rel < 5.0 / (KMV_K - 2) ** 0.5, (n_distinct, est, rel)


def test_cumulative_offsets_matches_python_prefix_sum(spark):
    """functions/ranks.cumulative_offsets (the window-free triangle
    join) must equal the exclusive prefix sum for arbitrary count
    tables, including missing pids and a single partition."""
    from es_analytics_spark.functions.ranks import cumulative_offsets

    cases = [
        [(0, 5), (1, 3), (2, 7)],
        [(2, 4), (5, 1), (9, 6), (10, 2)],  # gaps in pid space
        [(0, 1)],
        [(3, 10), (0, 2)],  # unsorted input
    ]
    for rows in cases:
        df = spark.createDataFrame(rows, "pid int, cnt long")
        got = {r.pid: r.off for r in cumulative_offsets(df).collect()}
        ordered = sorted(rows)
        want, acc = {}, 0
        for pid, cnt in ordered:
            want[pid] = acc
            acc += cnt
        assert got == want, (rows, got, want)


def test_exact_percentile_cuts_bit_matches_builtin(spark):
    """functions/ranks.exact_percentile_cuts (the bucket-histogram
    order-statistics recipe behind agg_histogram_equidepth) must be
    BIT-identical to the builtin percentile — grouped and global,
    through ties, tiny groups, single-value groups, and the
    degenerate-distribution fallback path."""
    import random

    from pyspark.sql import functions as F

    from es_analytics_spark.functions.ranks import exact_percentile_cuts

    rng = random.Random(11)
    cases = []
    for n, rounder in [(1, 0), (2, 6), (3, 1), (9, 0), (400, 6), (400, 0)]:
        rows = [
            (rng.choice(["a", "b", "c"]),
             round(rng.uniform(0, 1000), rounder))
            for _ in range(n)
        ]
        cases.append(rows)
    cases.append([("z", 5.0)] * 10)  # single distinct value in a group
    pcts = [0.1, 0.25, 0.5, 0.75, 0.9]
    arr = ", ".join(str(p) for p in pcts)
    for rows in cases:
        df = spark.createDataFrame(rows, "g string, x double")
        want = {
            r["g"]: list(r["cs"])
            for r in df.groupBy("g")
            .agg(F.expr(f"percentile(x, array({arr}))").alias("cs"))
            .collect()
        }
        got = exact_percentile_cuts(df, ["g"], "x", pcts)
        assert {k[0]: v for k, v in got.items()} == want
        # global spelling over the same rows
        want_g = list(
            df.agg(F.expr(f"percentile(x, array({arr}))").alias("cs")).first()["cs"]
        )
        assert exact_percentile_cuts(df, [], "x", pcts)[()] == want_g
    # fallback path: cap of 0 forces the builtin branch — still exact
    df = spark.createDataFrame(
        [("a", float(i % 7)) for i in range(50)], "g string, x double"
    )
    want = {
        r["g"]: list(r["cs"])
        for r in df.groupBy("g")
        .agg(F.expr(f"percentile(x, array({arr}))").alias("cs"))
        .collect()
    }
    got = exact_percentile_cuts(df, ["g"], "x", pcts, bucket_fetch_cap=0)
    assert {k[0]: v for k, v in got.items()} == want
