"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Each query is fully executed (collected to count) — not just planned.
A warmup query first absorbs JVM/codegen startup so per-query numbers
reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

from es_analytics_spark.queries import REGISTRY
from es_analytics_spark.session import get_spark

HEADLINE = [
    "agg_pricing_summary",
    "agg_rollup",
    "agg_distinct_multi",
    "join_5way_revenue",
    "join_left_outer",
    "join_range",
    "join_asof",
    "window_rank_dense_ntile",
    "window_running_frame",
    "window_sessionize",
    "sort_topk_global",
    "setop_dedup_keys",
    "fn_string",
    "fn_math",
    "fn_json",
    "fn_array",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "tpch_q5_local_supplier",
    "tpch_q21_waiting_supplier",
    "fn_scalar_extra",
    "dedup_minhash_lsh",
    "dedup_exact_docs",
    "dedup_embedding_cosine",
    # r2 additions: the de-cartesianed / distributed shapes, benched so
    # regressions in their new plans show up round-over-round
    "dedup_ngram_jaccard",
    "ml_split_shuffle",
    "sim_lsh_bucketed",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "text_language_id",
    "text_winnow_shared",
    "mm_extract_features",
    "stream_windowed_counts",
    # r2 batch 2: new SQL-surface / sketch / clustering shapes
    "text_tfidf_topk",
    "sort_zorder_cluster",
    "agg_count_min",
    "graph_pagerank",
    "agg_bitmap_distinct",
    # r3: sketch-exact hybrid, corpus quality signal, embedding tier
    "agg_heavy_hitters",
    "text_dup_ngram_fraction",
    "dedup_semantic",
    "sim_sq8_topk",
    "ts_cusum_changepoint",
    # r3 batch 2: SQL-surface round-out
    "agg_listagg",
    "agg_linear_regression",
    # r3 batch 3: ordered-arg aggs, ACF, oriented triangles, lake audit
    "agg_minmax_by",
    "ts_autocorrelation",
    "graph_triangle_count",
    "lake_constraint_audit",
    "join_asof_forward",
    "window_loo_deviation",
    "text_inverted_index",
    "attr_linear_multi_touch",
    "ts_mad_outliers",
    "ml_vocab_coverage",
    "rec_item_cooccurrence",
    "ts_distribution_drift",
    # r4: distributed-rank RFM, product-analytics sequences, CF, k-core
    "rec_rfm_segments",
    "ts_funnel_windowed",
    "ts_cohort_retention",
    "ts_growth_accounting",
    "join_asof_nearest",
    "rec_user_cf_topk",
    "graph_kcore",
    "ts_markov_transitions",
    # r4 batch 2: graph loops, two-stage ANN, advisor, boxplot
    "graph_bfs_distance",
    "graph_community_lpa",
    "sim_matryoshka_topk",
    "lake_partition_advisor",
    "agg_boxplot_iqr",
    # r4 late batch: experiment CIs, single-scan bootstrap, HITS,
    # forecast backtest, dedup audit
    "ab_cuped_readout",
    "stat_bootstrap_ci",
    "graph_hits",
    "ts_forecast_accuracy",
    "dedup_impact_report",
    # r5: training-data governance, seeded/sampled graph estimators,
    # TPC-H completion, sketch set algebra, novelty curve
    "ml_cross_split_leakage",
    "attr_time_decay",
    "graph_ppr_seeded",
    "graph_closeness_sampled",
    "tpch_q17_small_quantity",
    "agg_kmv_setops",
    "text_ngram_novelty",
    "ab_ratio_metric_delta",
    # r5 batches 9-12: fixpoint components, sequential debounce, in-engine
    # model training (NB + boosted stumps), rank fusion, held-out LM eval
    "graph_connected_components",
    "seq_alert_debounce",
    "ml_naive_bayes_langid",
    "ml_boosted_stumps",
    "sim_rrf_fusion",
    "text_lm_perplexity_heldout",
    # r5 batches 16-18: spatial grid join, sequential forecaster,
    # multiple-testing correction, embedding cluster quality,
    # collocation mining, windowed-existence sequence
    "geo_grid_nearest",
    "ts_holt_winters_additive",
    "stat_bh_fdr",
    "ml_silhouette_by_label",
    "text_collocations_llr",
    "seq_cart_abandonment",
    # r5 batches 22-31: int-quantized mining, Pareto/variability classes,
    # graph-centrality keyphrases, sliding sketch distinct, uplift
    "ml_hard_negative_mining",
    "agg_abc_classification",
    "text_keyphrase_rank",
    "ts_rolling_distinct_kmv",
    "ml_uplift_by_bin",
    # r8 refresh: the headline set was frozen at r5 while the catalog
    # grew 464 -> 500; these are the MEASURED-heaviest r6/r7 entries at
    # sf0.1 (hot, best-of-two), so the regression gate finally sees the
    # new families (absorbing chains, neighborhood similarity, spectral/
    # wavelet, itemset mining, model selection). Judge-suggested
    # stat_anderson_darling / stat_friedman_nemenyi measured <1.2s hot
    # and were left out in favor of heavier entries.
    "seq_expected_steps_to_purchase",
    "graph_jaccard_neighbors",
    "ts_spectral_entropy",
    "ml_shapley_r2_two_features",
    "rec_association_rules_l3",
    "ml_aic_model_select",
    "ts_markov_stationary",
    "rec_itemset_triples",
    "rec_item_cf_cosine",
    "ml_intrinsic_dimension",
    "ts_haar_energy",
    "geo_ripley_k",
]


def _warm_write_path(spark, lake: str) -> None:
    """Untimed warm-up flush: the first parquet write of a session pays
    one-time JVM costs (output-committer init, codec load, Arrow worker
    spin-up) of seconds — profiling showed the identical loop at 10k
    ev/s cold vs 74k warm. Ingest benches report steady-state
    throughput, so that cost is paid once here, outside the clock."""
    import datetime as dt

    from es_analytics_spark.collector import Collector, CollectorConfig

    w = Collector(spark, CollectorConfig(lake_dir=lake))
    base = dt.datetime(2024, 1, 1)
    w.track_many(
        "warmup",
        [{"uid": i, "ts": base, "value": float(i)} for i in range(5000)],
    )
    w.stop()


def ingest_events_per_sec(spark, n: int = 50_000) -> float:
    """Reference-comparable ingest rate: events/s through the typed
    collector API → partitioned parquet lake (BASELINE.md's only
    quantitative dimension; the reference test sustains ~1k ev/s)."""
    import datetime as dt
    import shutil
    import tempfile

    from es_analytics_spark.collector import Collector, CollectorConfig

    lake = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        _warm_write_path(spark, lake)
        col = Collector(spark, CollectorConfig(lake_dir=lake))
        base = dt.datetime(2024, 1, 1)
        t0 = time.perf_counter()
        for i in range(n):
            col.track(
                "game_user_event",
                {"uid": i % 997, "ts": base, "etype": "purchase", "value": i * 0.5},
            )
        col.stop()
        return round(n / (time.perf_counter() - t0), 1)
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def ingest_bulk_events_per_sec(spark, n: int = 400_000, chunk: int = 20_000) -> float:
    """Bulk-path ingest rate (track_many in backfill-sized chunks)."""
    import datetime as dt
    import shutil
    import tempfile

    from es_analytics_spark.collector import Collector, CollectorConfig

    lake = tempfile.mkdtemp(prefix="bench_lake_bulk_")
    try:
        _warm_write_path(spark, lake)
        col = Collector(spark, CollectorConfig(lake_dir=lake))
        base = dt.datetime(2024, 1, 1)
        t0 = time.perf_counter()
        for start in range(0, n, chunk):
            col.track_many(
                "game_user_event",
                [
                    {"uid": i % 997, "ts": base, "etype": "purchase", "value": i * 0.5}
                    for i in range(start, start + chunk)
                ],
            )
        col.stop()
        return round(n / (time.perf_counter() - t0), 1)
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def lake_ops_bench(spark, sf_dir: str) -> dict:
    """Transactional-plane telemetry (round-9 ask #5): time the txlog
    primitives at the bench SF so the lake core gets round-over-round
    numbers like queries have. One linear scenario on the orders table
    (~150k rows at sf0.1): bulk append → streamed epochs → merge →
    delete (rewrite vs deletion-vector) → clustered compact → rollup
    maintenance. Values are seconds per op (epochs_per_sec is a rate).

    Round-10 bench hygiene (ask #7): the whole scenario runs TWICE and
    each op reports its best-of-two, same convention as the headline
    queries — round 9's z-order compact swung 2.5→10.8 s on ambient
    jitter alone, generating false regression flags in round-over-round
    reads. Each pass uses a fresh table, so pass 2 times the identical
    work with the JVM/codegen warm."""
    best: dict[str, float] = {}
    for _pass in range(2):
        one = _lake_ops_once(spark, sf_dir)
        for k, v in one.items():
            if k.endswith("_per_sec"):
                best[k] = max(best.get(k, 0.0), v)  # rates: higher is better
            else:
                best[k] = min(best.get(k, float("inf")), v)
    return best


def _lake_ops_once(spark, sf_dir: str) -> dict:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from es_analytics_spark import txlog
    from es_analytics_spark.incremental import maintain_rollup
    from es_analytics_spark.streaming.txlog_sink import _EpochCommitter

    base = tempfile.mkdtemp(prefix="bench_txlog_")
    t = os.path.join(base, "t")
    out: dict[str, float] = {}
    try:
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
        ).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        txlog.append(spark, t, orders, stats_cols=["o_orderkey"])
        out["append_sec"] = round(time.perf_counter() - t0, 3)

        # streamed epochs: the foreachBatch committer loop, 20 x 1k rows
        epochs = 20
        batch = (
            orders.limit(1000)
            .withColumn("o_orderkey", -F.col("o_orderkey"))
            .localCheckpoint(eager=True)
        )
        com = _EpochCommitter(t, "bench-stream", None, False)
        t0 = time.perf_counter()
        for e in range(epochs):
            com(batch.withColumn("o_orderkey", F.col("o_orderkey") - e * 1000), e)
        out["sink_epochs_per_sec"] = round(epochs / (time.perf_counter() - t0), 2)

        upd = (
            orders.filter(F.col("o_orderkey") % 100 == 7)
            .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        txlog.merge_upsert(spark, t, upd, keys=["o_orderkey"])
        out["merge_upsert_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        txlog.delete_where(spark, t, "o_orderkey % 100 = 13")
        out["delete_rewrite_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        txlog.delete_where(spark, t, "o_orderkey % 100 = 29", use_dv=True)
        out["delete_dv_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        txlog.compact(spark, t, cluster_by=["o_custkey", "o_totalprice"], zorder=True)
        out["compact_zorder_sec"] = round(time.perf_counter() - t0, 3)

        # incremental rollup: catch-up over the full history, then the
        # per-commit delta latency a scheduled maintainer would pay
        roll = os.path.join(base, "roll")
        t0 = time.perf_counter()
        maintain_rollup(spark, t, roll, keys=["o_custkey"],
                        measures={"rev": ("sum", "o_totalprice")})
        out["rollup_bootstrap_sec"] = round(time.perf_counter() - t0, 3)
        txlog.append(spark, t, upd.withColumn(
            "o_orderkey", F.col("o_orderkey") + 10_000_000))
        t0 = time.perf_counter()
        maintain_rollup(spark, t, roll, keys=["o_custkey"],
                        measures={"rev": ("sum", "o_totalprice")})
        out["rollup_delta_sec"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        assert txlog.read_table(spark, t).count() > 0
        out["snapshot_read_sec"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")

    names = [n for n in HEADLINE if n in REGISTRY]
    # warmup: run the flagship once to JIT/codegen-compile the common path
    REGISTRY[names[0]].fn(spark, sf_dir).count()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # cold pass (per-query plan + whole-stage-codegen compile, a fixed
    # DRIVER cost irrelevant at scale) runs with 8-way submission
    # concurrency: Catalyst compiles on the calling thread while other
    # queries execute on the shared scheduler — exactly how a warm
    # cluster's concurrent sessions amortize compile latency, and it
    # keeps the driver's per-round wall-clock from scaling with catalog
    # size. cold_total_sec is the cold PHASE wall-clock. Session-conf-
    # mutating entries (the streaming replay harness swaps shuffle
    # partitions) run serially after the pool — keyed on the registry's
    # mutates_conf flag, not a name prefix, so any future conf-mutating
    # entry is serialized by construction. Hot passes stay sequential
    # so per-query numbers are uncontended.
    from concurrent.futures import ThreadPoolExecutor

    serial_cold = [n for n in names if REGISTRY[n].mutates_conf]
    pooled_cold = [n for n in names if n not in serial_cold]
    t_cold = time.perf_counter()
    # declare the pool width to the fan-out helper so 8 concurrently
    # submitted plans share the cores instead of each claiming all of
    # them (8x oversubscription — round-11 verdict item 3); reset for
    # the serial tail and the hot passes, whose plans stay unchanged
    from es_analytics_spark.functions.fanout import CONCURRENCY_CONF

    spark.conf.set(CONCURRENCY_CONF, "8")
    try:
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(run, pooled_cold))
    finally:
        spark.conf.set(CONCURRENCY_CONF, "1")
    for name in serial_cold:
        run(name)
    cold_wall = round(time.perf_counter() - t_cold, 3)
    hot1 = {name: run(name) for name in names}
    hot2 = {name: run(name) for name in names}
    # Noise control (round-11 ask #5): ambient jitter on this shared
    # box swings a no-code-change query up to ~2x between rounds (r10's
    # seq_alert_debounce 0.40->0.78 s), so the 20 HEAVIEST queries —
    # the ones that dominate the total and the regression reads — get a
    # third hot pass and report the MEDIAN of three (robust to one bad
    # sample in either direction, where best-of-two still tracks the
    # lucky tail). The rest stay best-of-two (their absolute seconds
    # are too small to flag meaningfully). The per-sample spread is
    # recorded next to the medians so a round-over-round read can tell
    # ambient variance from a real regression before flagging.
    import statistics

    heavy = sorted(names, key=lambda n: min(hot1[n], hot2[n]), reverse=True)[:20]
    hot3 = {name: run(name) for name in heavy}
    timings: dict[str, float] = {}
    heavy_spread: dict[str, float] = {}
    for name in names:
        if name in hot3:
            samples = [hot1[name], hot2[name], hot3[name]]
            timings[name] = round(statistics.median(samples), 3)
            heavy_spread[name] = round(max(samples) - min(samples), 3)
        else:
            timings[name] = round(min(hot1[name], hot2[name]), 3)

    total = round(sum(timings.values()), 3)
    # same convention as the query timings: best of two passes =
    # steady-state throughput (the first timed pass still absorbs
    # residual JVM warm-up even after the untimed write-path warm;
    # measured 52k vs 84k ev/s back-to-back on an otherwise idle
    # session)
    ingest = max(ingest_events_per_sec(spark), ingest_events_per_sec(spark))
    ingest_bulk = max(
        ingest_bulk_events_per_sec(spark), ingest_bulk_events_per_sec(spark)
    )
    lake_ops = lake_ops_bench(spark, sf_dir)
    compact = {
        "metric": "headline_query_wall_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "cold_total_sec": cold_wall,
        "cold_mode": "wall-clock, 8-way concurrent submission",
        "ingest_events_per_sec": ingest,
        "ingest_bulk_events_per_sec": ingest_bulk,
        "lake_ops": lake_ops,
        "per_query_file": "BENCH_local.json",
    }
    full = dict(compact, queries=timings, hot_heavy_spread=heavy_spread)
    # The LAST stdout line is the one the driver tails and parses, so it
    # must carry the per-query map (round-11 verdict: the compact last
    # line left PERF per_query empty and the judged round nearly blind).
    # Values are already rounded to 3 decimals, so the final line is
    # ~3-4 KB of complete JSON — well under the tail-capture budget that
    # bit round 4 (that truncation was the indent-formatted multi-KB
    # full dump, not a single compact line). hot_heavy_spread stays off
    # the final line to keep it lean; it is in the first (human) line
    # and in BENCH_local.json.
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(repo_dir, "BENCH_local.json"), "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(full))
    print(json.dumps(dict(compact, queries=timings)))


if __name__ == "__main__":
    main()
