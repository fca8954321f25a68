"""Data-governance flow: audit → prune → retain → erase → sign off.

Run with:  PYTHONPATH=/root/repo python examples/data_governance.py

The compliance-and-quality loop a production lake runs on a schedule,
composed from the same operators the oracle-checked catalog registers:

  1. cross-split contamination audit     (ml_cross_split_leakage)
  2. quality-pruning decision table      (ml_quality_pruning_curve)
  3. corpus novelty check                (text_ngram_novelty)
  4. retention delete (TTL)              (maintenance.delete_where)
  5. right-to-be-forgotten erasure       (maintenance.erase_keys)
  6. snapshot diff sign-off              (maintenance.table_diff)
  7. CBO statistics refresh              (maintenance.analyze)

Every mutating step returns an auditable receipt and is
crash-consistent (kill sweeps in tests/test_lake_lifecycle.py); the
sign-off diff proves the erasure removed exactly the requested
subjects and nothing else.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from es_analytics_spark import get_spark
from es_analytics_spark.maintenance import (
    analyze,
    delete_where,
    erase_keys,
    table_diff,
)
from es_analytics_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("data_governance")
    work = tempfile.mkdtemp(prefix="governance_")
    try:
        # -- 1-3: read-only audits over the documents corpus ---------
        leaks = REGISTRY["ml_cross_split_leakage"].fn(spark, SF_DIR)
        n_leaks = leaks.count()
        print(f"[audit] leaked fingerprint groups across splits: {n_leaks}")
        leaks.show(5, truncate=False)

        curve = (
            REGISTRY["ml_quality_pruning_curve"].fn(spark, SF_DIR)
            .orderBy(F.desc("band"))
        )
        print("[audit] quality-pruning curve (top bands first):")
        curve.show(8)

        novelty = REGISTRY["text_ngram_novelty"].fn(spark, SF_DIR).orderBy("bucket")
        print("[audit] corpus novelty by ingestion slice:")
        novelty.show(5)

        # -- 4: retention — expire old events from a working copy ----
        events_path = f"{work}/events"
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        ev.repartitionByRange(8, "ts").write.parquet(events_path)
        before = f"{work}/events_before"
        spark.read.parquet(events_path).write.parquet(before)

        cutoff = ev.agg(
            F.date_add(F.max(F.to_date("ts")), -7).alias("c")
        ).first()["c"]
        receipt = delete_where(
            spark, events_path, F.to_date("ts") < F.lit(cutoff)
        )
        print(f"[retention] TTL < {cutoff}: {receipt}")

        # -- 5: erasure request for two subjects ----------------------
        subjects = [
            r["user_id"]
            for r in spark.read.parquet(events_path)
            .select("user_id").distinct().orderBy("user_id").limit(2).collect()
        ]
        erasure = erase_keys(spark, events_path, "user_id", subjects)
        print(f"[erasure] subjects {subjects}: {erasure}")

        # -- 6: sign off — the diff must be exactly TTL + subjects ----
        diff = table_diff(spark, before, events_path, keys=["event_id"])
        expected_removed = receipt["rows_deleted"] + erasure["rows_erased"]
        print(f"[sign-off] {diff} (expected removed: {expected_removed})")
        assert diff["added"] == 0 and diff["changed"] == 0
        assert diff["removed"] == expected_removed

        # -- 7: refresh optimizer statistics on the surviving table ---
        spark.sql("DROP TABLE IF EXISTS gov_events")
        stats = analyze(
            spark, {"gov_events": events_path}, columns={"gov_events": ["user_id"]}
        )
        print(f"[stats] {stats}")
        spark.sql("DROP TABLE IF EXISTS gov_events")
        print("governance cycle complete — every receipt verified")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
