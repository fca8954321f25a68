"""End-to-end experiment analysis over the event lake.

Run with:  PYTHONPATH=/root/repo python examples/experimentation_readout.py

The full decision pipeline a modern experimentation platform runs for
one experiment — every stage is a registered, oracle-checked catalog
query (deterministic hash-bucket variants, decimal-exact statistics):

  1. validity        sample-ratio-mismatch guard + z-test
  2. point estimates Wilson CIs on conversion, mean lift
  3. variance tools  CUPED adjustment (smaller CIs, same estimand),
                     Poisson-bootstrap CI (single-scan resampling),
                     delete-one-bucket jackknife for the ratio metric
  4. heterogeneity   quantile treatment effects (where the lift lives)
  5. robustness      nonparametric KS / Mann-Whitney / randomization
  6. monitoring      always-valid sequential test (peek daily)
  7. causal check    difference-in-differences around the midpoint

Everything is lazy until the final shows; at 100 TB the same script
runs unchanged against a cluster master URL — each stage is one
user-grain aggregate plus constant-size reductions, and every
underlying query passes the repo's plan guards.
"""

from __future__ import annotations

import os

from es_analytics_spark import get_spark
from es_analytics_spark.queries import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

STAGES = [
    ("Validity: z-test + sample-ratio-mismatch guard", "ab_ztest_srm"),
    ("Conversion report with Wilson 95% CIs", "ab_experiment_report"),
    ("CUPED variance-reduced means", "ab_cuped_readout"),
    ("Poisson-bootstrap 95% CI for mean purchase value", "stat_bootstrap_ci"),
    ("Jackknife CI for revenue-per-event (ratio metric)", "stat_jackknife_ratio_ci"),
    ("Quantile treatment effects (p25-p90)", "ab_quantile_lift"),
    ("Kolmogorov-Smirnov distribution test", "stat_ks_test"),
    ("Mann-Whitney rank test (tie-corrected)", "stat_mann_whitney"),
    ("Randomization test (200 hash relabelings)", "stat_randomization_test"),
    ("Action-mix guard: chi-square independence", "stat_chi2_independence"),
    ("Always-valid sequential monitor (mSPRT)", "ab_sequential_msprt"),
    ("Welch unequal-variance t-test", "ab_welch_ttest"),
    ("Novelty-effect decay detector", "ab_novelty_decay"),
    ("Difference-in-differences around the midpoint", "ab_diff_in_diff"),
    ("Power analysis for the next experiment", "ab_power_analysis"),
]


def main() -> None:
    spark = get_spark("experimentation-example")
    for title, name in STAGES:
        print(f"\n=== {title} ({name}) ===")
        REGISTRY[name].fn(spark, SF_DIR).show(8, truncate=False)


if __name__ == "__main__":
    main()
