"""Skew stress tests (r3 verdict #7): the skew machinery — AQE
skew-join splitting, the salted-join rewrite, and the lake skew
diagnostics — exercised against a fixture with an actually-planted
hot key, not just uniform data.

Fixture: a zipf-flavored events table where one user holds ~60% of
all rows — the single-hot-key shape that turns a shuffle join into
one straggler task at scale.
"""

import shutil

import pytest
from pyspark.sql import functions as F


HOT_USER = 424242
N_ROWS = 400_000


@pytest.fixture(scope="module")
def skew_dir(spark, sf_dir, tmp_path_factory):
    """Temp sf-style dir: planted-skew events.parquet plus the small
    real lineitem/orders (lake_skew_report reads all three)."""
    d = tmp_path_factory.mktemp("skew_sf")
    (
        spark.range(N_ROWS)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 10 < 6, F.lit(HOT_USER))
            .otherwise(F.col("id") % 997)
            .alias("user_id"),
            F.when(F.col("id") % 3 == 0, "view").otherwise("purchase").alias("event_type"),
            F.timestamp_micros((F.lit(1704067200_000000) + F.col("id") * 1000).cast("bigint")).alias("ts"),
            (F.col("id") % 100 / 10.0).alias("value"),
        )
        .write.parquet(str(d / "events.parquet"))
    )
    for t in ("lineitem", "orders"):
        shutil.copytree(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet") if (
            __import__("os").path.isdir(f"{sf_dir}/{t}.parquet")
        ) else shutil.copy(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
    return str(d)


def test_aqe_skew_split_activates_on_hot_key(spark, skew_dir, tmp_path):
    """AQE's runtime skew-join split must actually fire on the planted
    hot key: with broadcast off and skew thresholds sized to the
    fixture, the executed SortMergeJoin must carry the skew=true
    marker — proof the one-straggler partition was split, not just
    that the config was set."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        ev = spark.read.parquet(f"{skew_dir}/events.parquet")
        # fact ⋈ per-key dim: no pair explosion (one dim row per key),
        # broadcast disabled so it plans as SMJ; the hot key's probe
        # partition is the skewed one AQE must split. The downstream
        # aggregate keys on event_type, NOT user_id — AQE declines to
        # split a skewed join whose output partitioning the next
        # operator reuses (splitting would force a re-shuffle).
        # carry a poorly-compressible payload so the hot partition's
        # COMPRESSED shuffle bytes (what AQE measures) clear the
        # threshold — 240k identical user_ids alone lz4 down to ~nothing
        fact = ev.withColumn("pad", F.sha2(F.col("event_id").cast("string"), 256))
        # the dim must be a MATERIALIZED table, not an inline aggregate:
        # OptimizeSkewedJoin pattern-matches SMJ(Sort(ShuffleStage),
        # Sort(ShuffleStage)) and an agg between shuffle and sort
        # disqualifies the join from skew splitting
        ev.groupBy("user_id").agg(F.max("value").alias("mx")).write.parquet(
            str(tmp_path / "dim.parquet")
        )
        dim = spark.read.parquet(str(tmp_path / "dim.parquet"))
        j = (
            fact.join(dim, "user_id")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"), F.max("mx").alias("mx"), F.max("pad").alias("p"))
        )
        j.collect()
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_equivalent_under_real_skew(spark, skew_dir):
    """salted_join on the actually-skewed fixture must (a) bit-match
    the plain join's aggregate result and (b) actually spread the hot
    key: with salt_buckets=16 the hot user's rows land in >1 salt
    bucket pre-join."""
    from es_analytics_spark.operators.joins import salted_join

    ev = spark.read.parquet(f"{skew_dir}/events.parquet")
    dim = (
        ev.select("user_id").distinct().withColumn("segment", (F.col("user_id") % 5).cast("int"))
    )
    plain = (
        ev.join(dim, "user_id")
        .groupBy("segment")
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(38,10)")).alias("s"))
    )
    salted = (
        salted_join(ev, dim, "user_id")
        .groupBy("segment")
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(38,10)")).alias("s"))
    )
    a = {r.segment: (r.n, r.s) for r in plain.collect()}
    b = {r.segment: (r.n, r.s) for r in salted.collect()}
    assert a == b

    # the salt must genuinely spread the hot key across buckets
    spread = (
        ev.filter(F.col("user_id") == HOT_USER)
        .withColumn("__salt", (F.rand(seed=7) * 16).cast("int"))
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread == 16


def test_lake_skew_report_flags_planted_key(spark, sf_dir, skew_dir):
    """lake_skew_report must put the planted hot key far above every
    uniform key: the events user_id row's max_key_rows is the hot
    user's count and its skew ratio dwarfs the same report over the
    uniform testdata fixture."""
    from es_analytics_spark.queries import REGISTRY

    rep = {
        r.key: r.asDict()
        for r in REGISTRY["lake_skew_report"].fn(spark, skew_dir).collect()
    }
    ev_row = next(v for k, v in rep.items() if "events" in k and "user" in k)
    assert ev_row["max_key_rows"] == pytest.approx(N_ROWS * 0.6, rel=0.01)
    # ratio is fixed-point x10000: hot key at 60% of rows over ~1000
    # keys → ratio ≈ 0.6 * n_keys * 10000 — orders of magnitude above
    # uniform (~1x = 10000)
    assert ev_row["skew_ratio_fp"] > 100 * 10000

    base = {
        r.key: r.asDict()
        for r in REGISTRY["lake_skew_report"].fn(spark, sf_dir).collect()
    }
    base_ev = next(v for k, v in base.items() if "events" in k and "user" in k)
    assert ev_row["skew_ratio_fp"] > 20 * base_ev["skew_ratio_fp"]
