"""End-to-end LLM training-data pipeline over the lake.

Run with:  PYTHONPATH=/root/repo python examples/training_pipeline.py

The curation flow every large-scale pretraining corpus goes through —
each stage is a real engine operator (the same ones the oracle-checked
catalog registers), composed the way a user would compose them:

  1. quality + language signals          (operators.text)
  2. exact dedup                        (operators.dedup)
  3. MinHash-LSH near-dup -> clusters -> survivors
  4. semantic dedup over embeddings     (operators.similarity, SemDeDup)
  5. language rebalancing by deterministic hash acceptance
  6. train/val/test split + sequence packing for shard writing

Every stage is a lazy DataFrame transform until the final writes; at
100 TB the same script runs unchanged with a cluster master URL.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from es_analytics_spark import get_spark
from es_analytics_spark.operators.dedup import (
    connected_components,
    document_fingerprint,
    minhash_lsh_pairs,
)
from es_analytics_spark.operators.similarity import semantic_dedup_pairs
from es_analytics_spark.operators.text import language_id, pack_sequences, text_features
from es_analytics_spark.sources.lake import load_tables

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("training_pipeline")
    out = tempfile.mkdtemp(prefix="corpus_out_")
    try:
        t = load_tables(spark, SF_DIR, ["documents", "embeddings"])
        docs, emb = t["documents"], t["embeddings"]
        n0 = docs.count()

        # -- 1. signals: quality heuristics + language id ------------------
        scored = language_id(text_features(docs, "text"), "text")
        kept = scored.filter(
            (F.col("quality_score") >= 0.5) & (F.col("n_tokens") >= 8)
        )

        # -- 2. exact dedup on the normalized fingerprint ------------------
        fp = document_fingerprint(kept, "text")
        exact_survivors = (
            fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
        )
        kept = kept.join(exact_survivors, "doc_id", "left_semi")

        # -- 3. near-dup: MinHash-LSH pairs -> single-link clusters --------
        pairs = minhash_lsh_pairs(kept, "doc_id", "text")
        comp = connected_components(pairs, "id_a", "id_b")
        dup_losers = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
        kept = kept.join(dup_losers, "doc_id", "left_anti")

        # -- 4. semantic dedup over the embedding space (SemDeDup) ---------
        sem_pairs = semantic_dedup_pairs(emb, "vec_id", "embedding", threshold=0.40, k=8)
        sem_losers = sem_pairs.select(
            F.greatest("id_a", "id_b").alias("doc_id")
        ).distinct()
        kept = kept.join(sem_losers, "doc_id", "left_anti")

        # -- 5. language rebalance: deterministic hash acceptance ----------
        sizes = kept.groupBy("lang_pred").agg(F.count("*").alias("n_lang"))
        min_lang = sizes.agg(F.min("n_lang").alias("min_lang"))
        kept = (
            kept.join(F.broadcast(sizes), "lang_pred")
            .crossJoin(F.broadcast(min_lang))
            .filter(
                ((F.col("doc_id") * 9973 + 7919) % 1_000_003) * F.col("n_lang")
                < F.lit(1_000_003) * F.col("min_lang")
            )
        )

        # -- 6. split + pack into fixed-budget training sequences ----------
        bucket = F.pmod(F.xxhash64("doc_id"), F.lit(100))
        split = (
            F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
        )
        final = kept.withColumn("split", split)
        packs = pack_sequences(final, "doc_id", "n_tokens", max_tokens=512).select(
            "doc_id", "pack_id"
        )
        shards = final.join(packs, "doc_id").select(
            "split", "pack_id", "doc_id", "n_tokens", "lang_pred", "text"
        )
        shards.write.mode("overwrite").partitionBy("split").parquet(f"{out}/shards")

        # -- report --------------------------------------------------------
        back = spark.read.parquet(f"{out}/shards")
        n_final = back.count()
        print(f"\ndocs in: {n0}  docs out: {n_final}")
        back.groupBy("split").agg(
            F.count("*").alias("docs"),
            F.countDistinct("pack_id").alias("packs"),
            F.sum("n_tokens").alias("tokens"),
        ).orderBy("split").show()
        print("per-language after rebalance:")
        back.groupBy("lang_pred").count().orderBy("lang_pred").show()

        # -- 7. dataset card: the summary published beside every shipped
        #       corpus snapshot (per-language rows + ALL rollup in one
        #       scan; see the ml_dataset_card catalog entry)
        print("dataset card:")
        back.rollup("lang_pred").agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("pack_id").alias("n_packs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 1).alias("mean_tokens"),
            (F.count("*") - F.countDistinct("text")).alias("dup_docs"),
        ).select(
            F.coalesce("lang_pred", F.lit("ALL")).alias("lang"),
            "n_docs", "n_packs", "total_tokens", "mean_tokens", "dup_docs",
        ).orderBy("lang").show()
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
