"""Operator correctness beyond the SQL oracle: NumPy/exact references
for the approximate operators (SURVEY.md §2.B north-star extensions)."""

import math

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from es_analytics_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from es_analytics_spark.operators.joins import asof_join
from es_analytics_spark.operators.similarity import cosine_topk, lsh_bucketed_topk
from es_analytics_spark.sources.lake import read_table


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """LSH candidates (verified ≥0.5 Jaccard) must equal the exact
    all-pairs result at the same threshold: banding with 16 bands × 4
    rows has ~.99+ recall at j=0.5, and verification removes all false
    positives, so on the fixture data the sets should coincide."""
    docs = read_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3)
        .filter(F.col("jaccard") >= 0.5)
        .collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.5
        ).collect()
    }
    assert lsh == exact
    assert len(exact) > 0, "fixture should contain near-duplicates"


def test_simhash_similar_docs_close(spark):
    rows = [
        Row(id=1, text="the quick brown fox jumps over the lazy dog near the river bank"),
        Row(id=2, text="the quick brown fox jumps over the lazy dog near the river shore"),
        Row(id=3, text="completely unrelated text about spark streaming and parquet files"),
    ]
    df = spark.createDataFrame(rows)
    fp = {r.id: r.simhash for r in simhash(df, "id", "text").collect()}

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(fp[1], fp[2]) < hamming(fp[1], fp[3])
    assert hamming(fp[1], fp[2]) < hamming(fp[2], fp[3])


def test_cosine_topk_matches_numpy(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    got = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding", k=3).collect()

    rows = emb.orderBy("vec_id").collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    for qi in range(5):
        order = sorted(
            [(s, i) for s, i in zip(sims[qi], ids) if i != ids[qi]],
            key=lambda t: (-t[0], t[1]),
        )[:3]
        expect = [i for _, i in order]
        actual = [r.neighbor_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == ids[qi]]
        assert actual == expect, f"query {ids[qi]}"
        for (s, _), r in zip(order, [r for r in sorted(got, key=lambda r: r.rank) if r.query_id == ids[qi]]):
            assert math.isclose(r.cosine, s, rel_tol=1e-9)


def test_lsh_bucketed_recall(spark, sf_dir):
    """ANN recall@5 vs exact top-5 should be well above chance (bucket
    search scans ~1/2^planes of the corpus)."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, q, "vec_id", "embedding", k=5).collect()
    approx = lsh_bucketed_topk(
        emb, q, "vec_id", "embedding", k=5, num_planes=4, num_tables=12
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hit = tot = 0
    for r in approx:
        tot += 1
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hit += 1
    assert tot > 0
    assert hit / (5 * len(exact_sets)) > 0.3, f"recall@5 too low: {hit}/{5 * len(exact_sets)}"


def test_lsh_near_dup_recall_vs_exact(spark, sf_dir):
    """Recall referee for the registered dedup_embedding_cosine shape:
    the LSH candidate→verify pair set must recover most of the exact
    all-pairs set at the query's 0.40 bar, with zero false positives
    (every emitted pair is exact-verified, so precision is 1.0 by
    construction — assert it anyway)."""
    from es_analytics_spark.operators.similarity import (
        cosine_pairs_above_np,
        lsh_near_dup_pairs,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_pairs_above_np(emb, emb, "vec_id", "embedding", threshold=0.40)
        .filter(F.col("neighbor_id") > F.col("query_id"))
        .collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in lsh_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.40).collect()
    }
    assert exact, "fixture must produce exact pairs at the 0.40 bar"
    assert got <= exact, f"false positives: {sorted(got - exact)[:5]}"
    recall = len(got & exact) / len(exact)
    assert recall > 0.6, f"recall too low: {recall:.2f} ({len(got)}/{len(exact)})"


def test_cosine_pairs_np_rejects_unbounded_query_side(spark, sf_dir):
    """The brute-force path's collect is bounded: an over-limit query
    side raises instead of silently shipping the corpus to the driver."""
    from es_analytics_spark.operators.similarity import cosine_pairs_above_np

    emb = read_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="max_query_rows"):
        cosine_pairs_above_np(emb, emb, "vec_id", "embedding", 0.4, max_query_rows=100)


def test_asof_join_semantics(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qts=10, px=1.0),
            Row(sym="A", qts=20, px=2.0),
            Row(sym="A", qts=20, px=3.0),  # tie on ts → larger tie_break wins
            Row(sym="B", qts=5, px=9.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", tts=9),   # before any quote → null
            Row(sym="A", tts=10),  # equal ts → inclusive
            Row(sym="A", tts=25),  # after both ts=20 quotes → px=3 (tie-break on px)
            Row(sym="B", tts=100),
            Row(sym="C", tts=1),   # key absent from right → null
        ]
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_cols=["px"], tie_break="px",
    )
    got = {(r.sym, r.tts): r.px for r in out.collect()}
    assert got == {
        ("A", 9): None,
        ("A", 10): 1.0,
        ("A", 25): 3.0,
        ("B", 100): 9.0,
        ("C", 1): None,
    }


def test_asof_join_forward_semantics_and_symmetry(spark):
    quotes = spark.createDataFrame(
        [
            Row(sym="A", qts=10, px=1.0),
            Row(sym="A", qts=20, px=2.0),
            Row(sym="A", qts=20, px=3.0),  # tie on ts → larger tie_break wins
            Row(sym="B", qts=5, px=9.0),
        ]
    )
    trades = spark.createDataFrame(
        [
            Row(sym="A", tts=9),    # before both → nearest future qts=10
            Row(sym="A", tts=20),   # equal ts → inclusive, tie → px=3
            Row(sym="A", tts=25),   # after all quotes → null
            Row(sym="B", tts=1),
            Row(sym="C", tts=1),    # key absent from right → null
        ]
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_cols=["px"], tie_break="px", direction="forward",
    )
    got = {(r.sym, r.tts): r.px for r in out.collect()}
    assert got == {
        ("A", 9): 1.0,
        ("A", 20): 3.0,
        ("A", 25): None,
        ("B", 1): 9.0,
        ("C", 1): None,
    }

    # Direction symmetry: forward on t is backward on -t (same tie rule),
    # so the two scans must agree point-for-point on negated time.
    back = asof_join(
        trades.withColumn("tts", -F.col("tts")),
        quotes.withColumn("qts", -F.col("qts")),
        on="sym", left_ts="tts", right_ts="qts",
        right_cols=["px"], tie_break="px",
    )
    got_back = {(r.sym, -r.tts): r.px for r in back.collect()}
    assert got_back == got

    with pytest.raises(ValueError, match="direction"):
        asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                  direction="sideways")


def test_topk_per_group_determinism(spark, sf_dir):
    from es_analytics_spark.operators.joins import topk_per_group

    c = read_table(spark, sf_dir, "customer")
    a = topk_per_group(c, ["c_mktsegment"], [F.col("c_acctbal").desc(), F.col("c_custkey")], 2)
    b = topk_per_group(
        c.repartition(7), ["c_mktsegment"], [F.col("c_acctbal").desc(), F.col("c_custkey")], 2
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_weighted_avg_udaf_order_independent(spark, sf_dir):
    from es_analytics_spark.operators.udfs import grouped_weighted_avg

    li = read_table(spark, sf_dir, "lineitem")
    a = grouped_weighted_avg(li, ["l_returnflag"], "l_extendedprice", "l_quantity")
    b = grouped_weighted_avg(
        li.repartition(17), ["l_returnflag"], "l_extendedprice", "l_quantity"
    )
    assert {r.l_returnflag: r.wavg for r in a.collect()} == {
        r.l_returnflag: r.wavg for r in b.collect()
    }


def test_zscore_groupmap_properties(spark, sf_dir):
    from es_analytics_spark.operators.udfs import zscore_normalize

    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment", "c_acctbal")
    out = zscore_normalize(c, ["c_mktsegment"], "c_acctbal", "c_custkey").toPandas()
    for _seg, grp in out.groupby("c_mktsegment"):
        assert abs(grp.zscore.mean()) < 1e-9
        assert abs(grp.zscore.std(ddof=1) - 1.0) < 1e-6

def test_ivf_topk_recall(spark, sf_dir):
    """IVF recall@5 vs exact top-5: probing 2 of ~10 cells must stay
    well above chance; result must be deterministic (fixed centroids)."""
    from es_analytics_spark.operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, q, "vec_id", "embedding", k=5).collect()
    approx = ivf_topk(emb, q, "vec_id", "embedding", k=5, centroid_stride=50, nprobe=2).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hit = sum(1 for r in approx if r.neighbor_id in exact_sets.get(r.query_id, set()))
    assert len(approx) > 0
    assert hit / (5 * len(exact_sets)) > 0.3, f"recall@5 too low: {hit}/{5 * len(exact_sets)}"
    again = ivf_topk(emb, q, "vec_id", "embedding", k=5, centroid_stride=50, nprobe=2).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))

def test_hash_functions_stable(spark, sf_dir):
    """Pin xxhash64 / murmur hash / crc32 outputs (the partitioner
    primitives fn_hash_bucketing exposes) and seeded rand()
    reproducibility — these must never drift across runs or versions,
    or every banding/salting layout changes under existing lakes."""
    df = spark.createDataFrame([("Customer#000000000",), ("Supplier#000000042",)], ["s"])
    rows = df.select(
        F.xxhash64("s").alias("xx"),
        F.hash("s").alias("mm"),
        F.crc32(F.col("s").cast("binary")).alias("crc"),
    ).collect()
    assert [(r.xx, r.mm, r.crc) for r in rows] == [
        (8301032585243059592, -112550077, 2010948394),
        (-9068927139218753206, 982784409, 3430008262),
    ]
    # rand(seed) derives each partition's stream from (seed, partition
    # index) — pin numPartitions so the expectation is layout-stable
    rnd = spark.range(0, 3, 1, numPartitions=1).select(F.round(F.rand(seed=42), 8).alias("r"))
    r1 = [r.r for r in rnd.collect()]
    r2 = [r.r for r in rnd.collect()]
    assert r1 == r2 == [0.61918937, 0.50960188, 0.83252594]

def test_winnow_guarantee_shared_substring(spark):
    """Winnowing's selection guarantee: two documents sharing a
    normalized substring of length >= k + window - 1 must share at
    least one fingerprint; disjoint random texts share none."""
    import random

    from es_analytics_spark.operators.dedup import winnow_fingerprints

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def rand_text(n):
        return "".join(rng.choice(alpha + " ") for _ in range(n))

    shared = rand_text(15)  # >= k + window - 1 = 11 for k=8, w=4
    rows = [
        (0, rand_text(60) + " " + shared + " " + rand_text(60)),
        (1, rand_text(60) + " " + shared + " " + rand_text(60)),
        (2, rand_text(200)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp = winnow_fingerprints(df, "doc_id", "text", k=8, window=4).collect()
    by_doc = {}
    for r in fp:
        by_doc.setdefault(r.doc_id, set()).add(r.fingerprint)
    assert by_doc[0] & by_doc[1], "shared substring must yield a shared fingerprint"
    assert not (by_doc[0] & by_doc[2] & by_doc[1]), "disjoint doc should not match both"

def test_approx_percentile_bound(spark, sf_dir):
    """percentile_approx(accuracy=A) guarantees rank error <= n/A; with
    the fixture sizes that bounds the value error to within the local
    value spread — check against the exact percentile."""
    li = read_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rank error n/10000 < 1 row at fixture sizes → approx must be
        # within the two neighboring observed values; 1% value slack
        assert abs(r.approx - r.exact) / r.exact < 0.01, r

def test_stratified_sample(spark, sf_dir):
    """sampleBy: reproducible under a fixed seed and layout, and
    per-stratum rates near the requested fractions."""
    docs = read_table(spark, sf_dir, "documents")
    fractions = {r.lang: 0.5 for r in docs.select("lang").distinct().collect()}
    a = docs.sampleBy("lang", fractions, seed=42).select("doc_id").collect()
    b = docs.sampleBy("lang", fractions, seed=42).select("doc_id").collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    n, total = len(a), docs.count()
    assert 0.3 < n / total < 0.7, f"rate {n}/{total} far from 0.5"


def test_connected_components_chain_and_clique(spark):
    """Min-label CC: a 4-chain (worst-case diameter) and a triangle
    collapse to their min ids; disconnected nodes keep distinct labels."""
    from es_analytics_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain 1-2-3-4
         (10, 11), (11, 12), (10, 12),  # triangle
         (20, 21)],
        ["id_a", "id_b"],
    )
    got = {r.id: r.component for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_prefix_filter_lossless(spark, sf_dir):
    """PPJoin prefix filtering + size bound must return EXACTLY the
    pairs >= threshold that unpruned all-pairs returns (losslessness is
    the theorem; this pins the implementation to it)."""
    from es_analytics_spark.operators.dedup import ngram_jaccard_pairs
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.35, 0.7):
        exact = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(docs, "doc_id", "text", 3)
            .filter(F.col("jaccard") >= t).collect()
        }
        pruned = {
            (r.id_a, r.id_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", 3, threshold=t, prefix_filter=True
            ).filter(F.col("jaccard") >= t).collect()
        }
        assert pruned == exact, f"t={t}: prefix filter lost/invented pairs"


def test_pack_sequences_invariants(spark, sf_dir):
    """Packing: every doc in exactly one pack; no pack over budget
    unless a single oversize doc; deterministic across runs."""
    from es_analytics_spark.operators.text import pack_sequences
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"))
    )
    packed = pack_sequences(docs, "doc_id", "n_tokens", max_tokens=256, num_buckets=8)
    rows = packed.collect()
    assert len(rows) == docs.count()  # every doc exactly once
    assert len({r.doc_id for r in rows}) == len(rows)
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    for members in by_pack.values():
        total = sum(r.n_tokens for r in members)
        if total > 256:  # only legal as a singleton oversize doc
            assert len(members) == 1 and members[0].oversize
    # determinism
    again = {(r.doc_id, r.pack_id) for r in
             pack_sequences(docs, "doc_id", "n_tokens", max_tokens=256, num_buckets=8).collect()}
    assert again == {(r.doc_id, r.pack_id) for r in rows}
    # packing actually packs: fewer packs than docs
    assert len(by_pack) < len(rows)


def test_hll_sketch_accuracy(spark, sf_dir):
    """Sketch estimates (per-type and the merged union) within 5% of
    exact distinct counts; union-of-sketches equals sketch-of-union
    semantics (re-aggregatable rollup)."""
    from es_analytics_spark.queries import REGISTRY
    from pyspark.sql import functions as F

    got = {r.event_type: r.approx_users
           for r in REGISTRY["agg_hll_mergeable"].fn(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {r.event_type: r.n
             for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    exact["__all__"] = ev.select("user_id").distinct().count()
    for k, e in exact.items():
        assert abs(got[k] - e) <= max(0.05 * e, 2), (k, got[k], e)


def test_ivf_kmeans_quantizer_recall(spark, sf_dir):
    """k-means-trained IVF must be deterministic and reach reasonable
    recall@5 against exact brute force on the fixture (same bound as
    the stride quantizer test)."""
    from es_analytics_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(10)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, q, "vec_id", "embedding", k=5).collect()}
    kw = dict(k=5, max_centroids=16, nprobe=4, quantizer="kmeans")
    approx = {(r.query_id, r.neighbor_id)
              for r in ivf_topk(emb, q, "vec_id", "embedding", **kw).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall
    again = {(r.query_id, r.neighbor_id)
             for r in ivf_topk(emb, q, "vec_id", "embedding", **kw).collect()}
    assert again == approx  # deterministic init + iteration count


def test_interval_join_bucketed_equals_theta(spark, sf_dir):
    """The bucketized interval join must equal the naive theta join at
    every bucket width (width is a perf knob, never a semantics knob)."""
    from es_analytics_spark.operators.joins import interval_join_bucketed
    from es_analytics_spark.sources.lake import read_table
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events").select("event_id", "ts")
    windows = (
        ev.filter(F.col("event_id") % 211 == 0)
        .select(
            F.col("event_id").alias("wid"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 150 MINUTE")).alias("w_end"),
        )
    )
    naive = {
        (r.event_id, r.wid)
        for r in ev.join(
            windows, (F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end"))
        ).collect()
    }
    for width in ("1 hour", "1 day"):
        got = {
            (r.event_id, r.wid)
            for r in interval_join_bucketed(
                ev, windows, "ts", "w_start", "w_end", bucket=width
            ).collect()
        }
        assert got == naive, width


def test_pq_topk_recall(spark, sf_dir):
    """PQ+rerank recall@5 vs exact top-5: ADC candidate generation at
    8x oversample with exact rerank must beat the same bar as the
    other ANN paths (bucketed LSH, IVF)."""
    from es_analytics_spark.operators.similarity import cosine_topk, pq_topk
    from es_analytics_spark.sources.lake import load_tables

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    exact = cosine_topk(e, q, "vec_id", "embedding", k=5)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = pq_topk(e, q, "vec_id", "embedding", k=5, m=8, ksub=16, oversample=8)
    hit = 0
    for r in approx.collect():
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hit += 1
    assert hit / (5 * len(exact_sets)) > 0.3, f"recall@5 too low: {hit}/{5 * len(exact_sets)}"


def test_zorder_interleave_matches_python_reference_in_both_engines():
    """The generated Morton expression must compute the textbook bit
    interleave identically in DuckDB (the oracle side); the Spark side
    is covered by the sort_zorder_cluster catalog entry."""
    import duckdb

    from es_analytics_spark.functions.zorder import interleave_expr

    expr = interleave_expr(["x", "y"], bits=16)
    vals = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (65535, 0)]

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = ", ".join(
        f"(CAST({x} AS BIGINT), CAST({y} AS BIGINT))" for x, y in vals
    )
    got = duckdb.sql(
        f"SELECT {expr} FROM (VALUES {rows}) t(x, y)"
    ).fetchall()
    assert [g[0] for g in got] == [ref(x, y) for x, y in vals]


def test_charfold_hash_cross_engine_equality(spark):
    """The portable char-fold hash (count-min / feature hashing) must
    produce identical codes in Spark and DuckDB for adversarial
    strings — the property the exact-compare of those queries rests
    on."""
    import duckdb

    from pyspark.sql import functions as F

    words = ["", "a", "zz", "hello", "x" * 50, "abcdefghij" * 3, "qqq", "tok123abc"]
    sdf = spark.createDataFrame([(w,) for w in words], "t string")
    spark_codes = [
        r["h"]
        for r in sdf.select(
            F.expr(
                "aggregate(transform(split(t, ''), c -> cast(ascii(c) as bigint)),"
                " cast(0 as bigint), (a, b) -> (a * 31 + b) % 1000003)"
            ).alias("h")
        ).collect()
    ]
    duck_codes = [
        duckdb.sql(
            "SELECT LIST_REDUCE(LIST_TRANSFORM(STRING_SPLIT(?, ''),"
            " c -> CAST(ASCII(c) AS BIGINT)), (a, b) -> (a * 31 + b) % 1000003)",
            params=[w],
        ).fetchone()[0]
        for w in words
    ]
    assert spark_codes == duck_codes


def test_compression_ratio_orders_repetition(spark):
    """Repetitive text must compress harder than diverse text; empty
    text gets the neutral 1.0."""
    from es_analytics_spark.operators.text import with_compression_ratio

    rows = [
        (1, "spam " * 200),
        (2, "the quick brown fox jumps over the lazy dog " * 5),
        (3, "".join(__import__("random").Random(7).choices(
            [chr(c) for c in range(33, 127)], k=1000))),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.compression_ratio
        for r in with_compression_ratio(df, "text", ["doc_id"]).collect()
    }
    assert got[1] < got[2] < got[3]
    assert got[4] == 1.0
    assert all(0 < v <= 1.5 for v in got.values())


def test_semantic_dedup_recall(spark, sf_dir):
    """SemDeDup within-cluster pairs vs the all-pairs referee at the
    same threshold: precision must be 1.0 (every emitted pair carries
    an exact cosine >= tau) and recall must clear the same bar as the
    other candidate-generation paths; rerun must be deterministic
    (fixed xorshift k-means init)."""
    from es_analytics_spark.operators.similarity import (
        cosine_pairs_above_np,
        semantic_dedup_pairs,
    )
    from es_analytics_spark.sources.lake import load_tables

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    exact = {
        (min(r.query_id, r.neighbor_id), max(r.query_id, r.neighbor_id))
        for r in cosine_pairs_above_np(
            e, e, "vec_id", "embedding", threshold=0.40, max_query_rows=1000
        ).collect()
    }
    assert exact, "fixture must contain semantic near-duplicates at 0.40"
    got_rows = semantic_dedup_pairs(e, "vec_id", "embedding", threshold=0.40, k=16).collect()
    got = {(r.id_a, r.id_b) for r in got_rows}
    assert got <= exact, f"false positives: {got - exact}"
    recall = len(got & exact) / len(exact)
    assert recall > 0.3, f"semantic dedup recall too low: {recall:.2f}"
    again = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(e, "vec_id", "embedding", threshold=0.40, k=16).collect()
    }
    assert got == again, "semantic dedup must be deterministic"


def test_mmr_rerank_invariants(spark, sf_dir):
    """MMR invariants: per query — rank 1 equals the exact cosine
    top-1, no repeated neighbors, exactly k picks, and the pure-
    relevance degenerate case (lambda=1) reproduces cosine_topk's
    order."""
    from es_analytics_spark.operators.similarity import cosine_topk, mmr_rerank
    from es_analytics_spark.sources.lake import load_tables

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    got = mmr_rerank(e, q, "vec_id", "embedding", k=8, pool=32, lam=0.7).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    exact1 = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(e, q, "vec_id", "embedding", k=1).collect()
    }
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.mmr_rank)
        assert len(rows) == 8
        assert len({r.neighbor_id for r in rows}) == 8, "MMR must not repeat picks"
        assert rows[0].neighbor_id == exact1[qid], "rank 1 must be the cosine top-1"
    pure = mmr_rerank(e, q, "vec_id", "embedding", k=8, pool=32, lam=1.0).collect()
    exact8 = cosine_topk(e, q, "vec_id", "embedding", k=8).collect()
    pure_order = {(r.query_id, r.mmr_rank): r.neighbor_id for r in pure}
    exact_order = {(r.query_id, r.rank): r.neighbor_id for r in exact8}
    assert pure_order == exact_order, "lambda=1 MMR must equal relevance ranking"


def test_sq8_topk_recall(spark, sf_dir):
    """SQ8 + exact rerank recall@5 vs brute force — same bar as the
    other ANN tiers; quantized candidates must rerank deterministically."""
    from es_analytics_spark.operators.similarity import cosine_topk, sq8_topk
    from es_analytics_spark.sources.lake import load_tables

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    q = e.filter(F.col("vec_id") < 10)
    exact_sets = {}
    for r in cosine_topk(e, q, "vec_id", "embedding", k=5).collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = sq8_topk(e, q, "vec_id", "embedding", k=5, oversample=4).collect()
    hit = sum(1 for r in approx if r.neighbor_id in exact_sets.get(r.query_id, set()))
    assert hit / (5 * len(exact_sets)) > 0.5, f"SQ8 recall@5 too low: {hit}/{5 * len(exact_sets)}"


def test_misra_gries_superset_guarantee(spark, sf_dir):
    """The registered heavy-hitters query must agree with a plain
    exact GROUP BY at the contract threshold — i.e. the Misra-Gries
    candidate union is a true superset under the real partitioning."""
    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.sources.lake import load_tables

    got = {
        (r.user_id, r.cnt)
        for r in REGISTRY["agg_heavy_hitters"].fn(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir, ["events"])["events"]
    total = ev.count()
    truth = {
        (r.user_id, r.cnt)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * 1000 >= 5 * total)
        .collect()
    }
    assert got == truth


def test_triangle_stats_matches_bruteforce(spark):
    """Degree-ordered triangle enumeration vs an itertools brute force
    on random graphs — pins that orientation counts each triangle
    exactly once (the miscount failure modes — double-counted
    triangles on degree ties, dropped triangles when orientation
    breaks transitivity — are invisible on one fixture graph)."""
    import itertools
    import random

    from es_analytics_spark.queries_sql4 import triangle_stats

    for seed, n, p in [(1, 8, 0.5), (2, 12, 0.3), (3, 10, 0.8)]:
        rng = random.Random(seed)
        edges = [
            (u, v)
            for u, v in itertools.combinations(range(n), 2)
            if rng.random() < p
        ]
        want = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if ((a, b) in edges and (a, c) in edges and (b, c) in edges)
        )
        df = spark.createDataFrame(edges, ["u", "v"])
        row = triangle_stats(df).collect()[0]
        assert row.n_triangles == want, (seed, row.n_triangles, want)
        assert row.n_edges == len(edges)


def test_link_predict_scoring_matches_bruteforce(spark):
    """RA-index wedge scoring vs an adjacency-set brute force on random
    graphs — the mirrored-logic referee (the triangle test above caught
    exactly this class of bug: both engines agreeing on the same wrong
    algorithm, invisible to the cross-engine gate)."""
    import itertools
    import random

    RA_FP = 10_000_000_000

    for seed, n, p in [(1, 8, 0.5), (2, 12, 0.3), (3, 10, 0.8)]:
        rng = random.Random(seed)
        edges = [
            (u, v)
            for u, v in itertools.combinations(range(n), 2)
            if rng.random() < p
        ]
        eset = set(edges)
        adj = {i: set() for i in range(n)}
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        want = {}
        for u, v in itertools.combinations(range(n), 2):
            if (u, v) in eset:
                continue
            common = adj[u] & adj[v]
            if common:
                want[(u, v)] = (
                    len(common),
                    sum(RA_FP // len(adj[w]) for w in common),
                )

        edf = spark.createDataFrame(edges, ["u", "v"]).localCheckpoint()
        deg = (
            edf.select(F.col("u").alias("node"))
            .unionAll(edf.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        adjdf = edf.select(F.col("u").alias("w"), F.col("v").alias("nb")).unionAll(
            edf.select(F.col("v").alias("w"), F.col("u").alias("nb"))
        )
        adj_w = adjdf.join(
            F.broadcast(deg.withColumnRenamed("node", "w")), "w"
        ).withColumn("contrib", F.expr(f"{RA_FP} div d"))
        a, b = adj_w.alias("a"), adj_w.alias("b")
        scored = (
            a.join(b, (F.col("a.w") == F.col("b.w")) & (F.col("a.nb") < F.col("b.nb")))
            .select(
                F.col("a.nb").alias("u"),
                F.col("b.nb").alias("v"),
                F.col("a.contrib").alias("contrib"),
            )
            .groupBy("u", "v")
            .agg(
                F.count(F.lit(1)).alias("cn"),
                F.sum("contrib").cast("bigint").alias("score"),
            )
        )
        got = {
            (r.u, r.v): (r.cn, r.score)
            for r in scored.join(edf, ["u", "v"], "left_anti").collect()
        }
        assert got == want, (seed, len(got), len(want))


def test_proportional_allocation_quotas_match_referee(spark, sf_dir):
    """Hamilton largest-remainder referee computed independently in
    Python from the stratum sizes: quotas must sum to exactly the
    budget and match the registered query's per-stratum quotas."""
    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.sources.lake import read_table

    BUDGET = 100
    docs = read_table(spark, sf_dir, "documents")
    sizes = {
        r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = sum(sizes.values())
    base = {g: BUDGET * n // total for g, n in sizes.items()}
    rem = sorted(
        sizes, key=lambda g: (-(BUDGET * sizes[g] % total), g)
    )
    want = dict(base)
    for g in rem[: BUDGET - sum(base.values())]:
        want[g] += 1
    assert sum(want.values()) == BUDGET

    out = REGISTRY["sample_proportional_allocation"].fn(spark, sf_dir).collect()
    got = {}
    for r in out:
        got.setdefault(r.lang, set()).add(r.doc_id)
        assert r.quota == want[r.lang], (r.lang, r.quota, want[r.lang])
    assert sum(len(v) for v in got.values()) == BUDGET
    for g, picks in got.items():
        assert len(picks) == want[g], (g, len(picks), want[g])


def test_pagerank_matches_python_power_iteration(spark, sf_dir):
    """Independent referee for the mirrored 3-iteration PageRank: a
    pure-Python power iteration over the same bidirected graph must
    reproduce the registered query's top-20 ranks (1e-9 tolerance —
    the decimal contract rounds at scale 12). Pins damping placement,
    share division, and frontier join semantics against a second
    implementation that shares no code with either engine."""
    from collections import defaultdict

    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.sources.lake import read_table

    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (2 * F.col("o_custkey")).alias("c"), (2 * F.col("l_suppkey") + 1).alias("s")
        )
        .distinct()
        .collect()
    )
    edges = set()
    for r in pairs:
        edges.add((r.c, r.s))
        edges.add((r.s, r.c))
    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    n = len(out)
    rank = {u: 1.0 / n for u in out}
    for _ in range(3):
        contrib = defaultdict(list)
        for u, targets in out.items():
            share = rank[u] / len(targets)
            for v in targets:
                contrib[v].append(share)
        # mirror the decimal contract: order-independent sum, round 12
        rank = {
            v: 0.15 / n + 0.85 * round(math.fsum(sorted(shares)), 12)
            for v, shares in contrib.items()
        }
    want = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = [
        (r.node, r.rank)
        for r in REGISTRY["graph_pagerank"].fn(spark, sf_dir).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want], (got[:5], want[:5])
    for (gn, gr), (wn, wr) in zip(got, want):
        assert abs(gr - wr) < 1e-8, (gn, gr, wr)


def test_cusum_changepoint_matches_python_referee(spark, sf_dir):
    """Independent referee for the mirrored CUSUM walk: recompute
    argmax_t |prefix_t - t*mu| in pure Python from the collected daily
    grain (sf0.001, bounded) and require the registered query's
    changepoint day and magnitude to match exactly."""
    import math as _math
    from decimal import ROUND_HALF_UP, Decimal

    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.sources.lake import read_table

    ev = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("v")
        )
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.user_id, []).append((r.day, r.v))
    want = {}
    for uid, pts in series.items():
        pts.sort()
        # mirror dsum over the daily doubles for mu
        total = float(
            Decimal(
                sum(Decimal(repr(v)).quantize(Decimal("1e-10")) for _, v in pts)
            ).quantize(Decimal("1e-4"), rounding=ROUND_HALF_UP)
        )
        mu = total / len(pts)
        best = None
        prefix = Decimal(0)
        for t, (day, v) in enumerate(pts, start=1):
            prefix += Decimal(repr(v)).quantize(Decimal("1e-10"))
            pref_d = float(prefix.quantize(Decimal("1e-4"), rounding=ROUND_HALF_UP))
            c = _math.floor(abs(pref_d - t * mu) * 1e4 + 0.5) / 1e4
            if best is None or c > best[0]:
                best = (c, day)
        want[uid] = best

    got = {
        r.user_id: (r.c_mag, r.cp_day)
        for r in REGISTRY["ts_cusum_changepoint"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for uid in want:
        assert got[uid] == want[uid], (uid, got[uid], want[uid])


def test_winnow_fingerprints_match_python_referee(spark):
    """Exact-set referee for the mirrored winnowing pipeline: a pure-
    Python MOSS winnow (same normalize, same md5 grams, same
    window-min + start-position rule) must produce the identical
    fingerprint SET per document — the substring-guarantee test above
    only checks intersection non-emptiness."""
    import hashlib
    import re

    def norm(s):
        s = re.sub(r"[^a-z0-9\s]", "", s.lower())
        return re.sub(r"\s+", " ", s).strip()

    def winnow(s, k=8, window=4):
        t = norm(s)
        n_g = max(len(t) - k + 1, 1)
        grams = [
            hashlib.md5(t[i : i + k].encode()).hexdigest() for i in range(n_g)
        ]
        out = set()
        last_start = max(n_g - window, 0)
        for i in range(last_start + 1):
            out.add(min(grams[i : i + window]))
        return out

    from es_analytics_spark.operators.dedup import winnow_fingerprints

    rows = [
        Row(doc_id=1, text="The quick brown fox jumps over the lazy dog!"),
        Row(doc_id=2, text="Pack my box with five dozen liquor jugs, said the fox."),
        Row(doc_id=3, text="tiny"),  # shorter than one gram window
        Row(doc_id=4, text="The quick brown fox jumps over the lazy dog!"),
    ]
    df = spark.createDataFrame(rows)
    got = {}
    for r in winnow_fingerprints(df, "doc_id", "text", k=8, window=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    for r in rows:
        assert got.get(r.doc_id) == winnow(r.text), r.doc_id


def test_item_cooccurrence_matches_python_referee(spark, sf_dir):
    """Brute-force referee for market-basket support/lift: recompute
    from collected (order, part) pairs at sf0.001 and require the
    registered query's top-20 to match exactly."""
    import itertools
    import math as _math

    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.sources.lake import read_table

    li = read_table(spark, sf_dir, "lineitem")
    op = {
        (r.l_orderkey, r.l_partkey)
        for r in li.select("l_orderkey", "l_partkey").distinct().collect()
    }
    baskets = {}
    for o, p in op:
        baskets.setdefault(o, set()).add(p)
    n_orders = len(baskets)
    item = {}
    for ps in baskets.values():
        for p in ps:
            item[p] = item.get(p, 0) + 1
    support = {}
    for ps in baskets.values():
        for p1, p2 in itertools.combinations(sorted(ps), 2):
            support[(p1, p2)] = support.get((p1, p2), 0) + 1
    rows = []
    for (p1, p2), s in support.items():
        if s < 2:
            continue
        lift = _math.floor(s * n_orders / (item[p1] * item[p2]) * 1e6 + 0.5) / 1e6
        rows.append((s, lift, p1, p2))
    want = [
        (p1, p2, s, lift)
        for s, lift, p1, p2 in sorted(rows, key=lambda t: (-t[0], -t[1], t[2], t[3]))
    ][:20]

    got = [
        (r.p1, r.p2, r.support, r.lift)
        for r in REGISTRY["rec_item_cooccurrence"].fn(spark, sf_dir).collect()
    ]
    assert got == want


def test_kcore_fixed_rounds_reach_fixpoint(spark, sf_dir):
    """graph_kcore's contract is a FIXED 4 peeling rounds (unrolled in
    both engines); this referee computes the true k-core fixpoint in
    pure Python from the same edge list and pins that 4 rounds reach
    it on the fixture — the mirrored-logic rule from SCALE.md: an
    exact cross-engine match of identical unrolled logic cannot catch
    a wrong round count, an independent algorithm can."""
    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.queries_sql4 import _co_supply_edges
    from es_analytics_spark.queries_sql5 import _KCORE_K

    edges = [(r.u, r.v) for r in _co_supply_edges(spark, sf_dir).collect()]
    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    # true fixpoint peel
    changed = True
    while changed:
        doomed = [n for n, nb in adj.items() if len(nb) < _KCORE_K]
        changed = bool(doomed)
        for n in doomed:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    want = {n: len(nb) for n, nb in adj.items()}

    got = {
        r.node: r.core_degree
        for r in REGISTRY["graph_kcore"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_checkpoint_modes_produce_identical_results(spark, sf_dir, tmp_path):
    """Durability seam (r4 verdict ask 3): iterative queries cut
    lineage via functions.lineage.cut_lineage, which flips between
    localCheckpoint (fast, non-durable — executor loss kills the job)
    and reliable checkpoint() into spark.es_analytics.checkpoint.dir
    (survives executor loss; the 1000-executor default). Both modes
    must produce bit-identical results on the iterative graph
    queries."""
    from es_analytics_spark.functions.lineage import CHECKPOINT_DIR_CONF
    from es_analytics_spark.queries import REGISTRY

    for q in ["graph_pagerank", "graph_community_lpa"]:
        local = sorted(map(tuple, REGISTRY[q].fn(spark, sf_dir).collect()))
        spark.conf.set(CHECKPOINT_DIR_CONF, str(tmp_path / "ckpt"))
        try:
            reliable = sorted(map(tuple, REGISTRY[q].fn(spark, sf_dir).collect()))
        finally:
            spark.conf.set(CHECKPOINT_DIR_CONF, "")
        assert local == reliable, f"{q}: checkpoint modes disagree"
        assert len(local) > 0
    # the reliable run actually wrote checkpoint files
    import os

    assert any(os.scandir(tmp_path / "ckpt")), "no reliable checkpoint written"


def test_cut_lineage_lazy_defers_then_matches_eager(spark, sf_dir):
    """r11 optimization: the deterministic graph loops cut lineage
    LAZILY (materialize at the first consuming action — one fewer
    scheduler job per cut). The lazy cut must produce rows identical
    to the eager cut on a multi-consumer plan (two branches over one
    cut frame — the shape the graph residuals use). Checkpoint state
    itself is not observable through DataFrame.rdd (a fresh conversion
    per access), so equivalence IS the contract under test."""
    from pyspark.sql import functions as F

    from es_analytics_spark.functions.lineage import cut_lineage, cut_lineage_lazy
    from es_analytics_spark.sources.lake import load_tables

    base = (
        load_tables(spark, sf_dir, ["orders"])["orders"]
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
    )
    lazy = cut_lineage_lazy(base)

    def two_branch(df):
        tot = df.agg(F.sum("n").alias("t"))
        return (
            df.crossJoin(F.broadcast(tot))
            .select("o_custkey", (F.col("n") / F.col("t")).alias("share"))
        )

    got = sorted(map(tuple, two_branch(lazy).collect()))
    want = sorted(map(tuple, two_branch(cut_lineage(base)).collect()))
    assert got == want and len(got) > 0


def test_pq_topk_query_side_guard(spark, sf_dir):
    """round-10 fix: pq_topk collects the query set to the driver (the
    ADC LUT ships with every task) — a corpus-scale query side must
    raise instead of silently becoming an unbounded driver pull."""
    import pytest as _pytest

    from es_analytics_spark.operators.similarity import pq_topk
    from es_analytics_spark.sources.lake import load_tables

    e = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
    with _pytest.raises(ValueError, match="max_query_rows"):
        pq_topk(e, e, "vec_id", "embedding", k=5, max_query_rows=16)
