"""Bounded backfill of a txlog table with the availableNow-style drain.

A backfill job wants: "process everything committed as of NOW, in
rate-limited checkpointed steps, then exit" — not a forever-running
stream, and not one giant micro-batch. ``drain_txlog_feed`` is that
trigger for txlog tables (Spark's Python DataSource wrapper does not
implement SupportsTriggerAvailableNow, so the loop lives here — see
es_analytics_spark/streaming/drain.py). A kill at any point resumes
exactly-once from the same checkpoint.

Run: PYTHONPATH=/root/repo python examples/backfill_drain.py
"""

from __future__ import annotations

import os
import shutil
import tempfile

from es_analytics_spark import get_spark, txlog
from es_analytics_spark.streaming import drain_txlog_feed


def main() -> None:
    spark = get_spark("backfill-drain")
    base = tempfile.mkdtemp(prefix="drain_")
    table = os.path.join(base, "events_tx")
    ckpt = os.path.join(base, "ckpt")
    agg = os.path.join(base, "agg")
    try:
        # a table with 5 commits of history
        for c in range(5):
            txlog.append(spark, table, spark.createDataFrame(
                [(i, float(i)) for i in range(c * 100, (c + 1) * 100)],
                "id long, val double",
            ))

        # the backfill: sum val per micro-batch into a txlog rollup —
        # foreachBatch + txlog.append(txn=...) is the exactly-once sink
        def fold(df, batch_id):
            txlog.append(
                spark, agg,
                df.groupBy().sum("val").toDF("val_sum"),
                txn=("backfill-demo", batch_id),
            )

        r = drain_txlog_feed(
            spark, table, ckpt, fold, max_versions_per_batch=2
        )
        print(f"drained to v{r['ending_version']} in {r['passes']} pass(es)")

        total = spark.read.parquet(os.path.join(agg, "parts", "*")).groupBy() \
            .sum("val_sum").first()[0]
        print(f"rollup total: {total} (expect {sum(float(i) for i in range(500))})")

        # nothing new: the drain is a no-op against the same checkpoint
        r = drain_txlog_feed(spark, table, ckpt, fold, max_versions_per_batch=2)
        print(f"re-run: {r['passes']} pass(es), {r['drained']} version(s) drained")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
