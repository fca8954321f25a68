"""End-to-end training-corpus quality report over the documents lake.

Run with:  PYTHONPATH=/root/repo python examples/corpus_quality_report.py

The pre-training data-quality review an LLM data team runs before a
corpus ships — every stage is a registered, oracle-checked catalog
query over the documents/embeddings tables:

  1. profile      column profile + language/source composition
  2. health       Zipf-exponent screen, duplicated-ngram boilerplate
  3. filters      quality-filter ablation matrix (overlap audit)
  4. dedup        exact fingerprint groups, MinHash near-dup candidates,
                  survivorship-bias report (composition shift + TV)
  5. contamination 5-gram test-set decontamination screen
  6. drift        embedding-distribution drift between slices

Everything is lazy until the final shows; the same script runs
unchanged on a cluster at 100 TB — each audit is a bounded number of
corpus scans with map-side-combinable aggregates, and every underlying
query passes the repo's plan guards.
"""

from __future__ import annotations

import os

from es_analytics_spark import get_spark
from es_analytics_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

STAGES = [
    ("Column profile", "agg_profile_columns"),
    ("Zipf-exponent corpus health screen", "text_zipf_exponent"),
    ("Bigram conditional entropy (predictability)", "text_conditional_entropy"),
    ("Duplicated-ngram boilerplate fraction", "text_dup_ngram_fraction"),
    ("Quality-filter ablation matrix", "text_filter_ablation"),
    ("Exact fingerprint dedup groups", "text_fingerprint_dedup"),
    ("MinHash+LSH near-duplicate candidates", "dedup_minhash_lsh"),
    ("Dedup survivorship-bias report", "dedup_impact_report"),
    ("Test-set decontamination screen (5-gram)", "text_decontaminate"),
    ("Embedding-distribution drift monitor", "sim_embedding_drift"),
]


def main() -> None:
    spark = get_spark("corpus-quality-example")
    for title, name in STAGES:
        if name not in REGISTRY:
            print(f"\n=== {title} ({name}) — not registered, skipping ===")
            continue
        print(f"\n=== {title} ({name}) ===")
        REGISTRY[name].fn(spark, SF_DIR).show(8, truncate=False)


if __name__ == "__main__":
    main()
