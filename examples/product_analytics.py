"""End-to-end product-analytics review over the event lake.

Run with:  PYTHONPATH=/root/repo python examples/product_analytics.py

The weekly product review every analytics team assembles — each stage
is a registered, oracle-checked catalog query (queries_sql5), composed
the way a user would compose them over the collector's lake:

  1. acquisition & engagement   windowed funnel + Markov flow matrix
  2. retention                  cohort triangle + survival curve
  3. growth accounting          new / retained / resurrected / churned
  4. monetization segments      RFM quintile grid (distributed ranks)
  5. experiment readout         Wilson CIs + z-test with SRM guardrail

Everything is lazy until the final shows; at 100 TB the same script
runs unchanged with a cluster master URL, because every underlying
query passes the repo's plan guards (no cartesians, no data-sized
single-partition windows, no unguarded driver collects).
"""

from __future__ import annotations

import os

from es_analytics_spark import get_spark
from es_analytics_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

STAGES = [
    ("Funnel: furthest step within 7 days of first view", "ts_funnel_windowed"),
    ("Event-flow Markov transition matrix", "ts_markov_transitions"),
    ("Weekly cohort retention triangle", "ts_cohort_retention"),
    ("Lifetime survival curve (censoring-aware)", "ts_survival_churn"),
    ("Growth accounting", "ts_growth_accounting"),
    ("RFM segments (distributed quintiles)", "rec_rfm_segments"),
    ("Experiment variants with Wilson 95% CIs", "ab_experiment_report"),
    ("Decision: z-test + sample-ratio-mismatch guard", "ab_ztest_srm"),
]


def main() -> None:
    spark = get_spark("product-analytics-example")
    for title, name in STAGES:
        print(f"\n=== {title} ({name}) ===")
        REGISTRY[name].fn(spark, SF_DIR).show(8, truncate=False)


if __name__ == "__main__":
    main()
