"""Lake administration at streaming scale: bounded metadata, log
retention, column mapping, and SQL over transactional snapshots.

Run with:  PYTHONPATH=/root/repo python examples/lake_admin.py

A table fed by the per-epoch streaming sink accumulates one commit JSON
per micro-batch — 10^5-10^6 objects over a stream's lifetime. This
walkthrough shows the metadata plane that keeps such a table fast and
small, plus the rename/drop evolution that ships with it (the public
Delta checkpoint-pointer / log-retention / column-mapping designs,
re-expressed on this engine's commit log):

  1. burst        commit a few hundred times; the auto-checkpoint
                  cadence keeps replay bounded with no operator action
  2. bounded      reads touch the pointer + one checkpoint + the tail —
                  never an O(total-commits) directory LIST
  3. retain       clean_log reaps commit JSONs past a folded checkpoint;
                  time travel inside retention still works, expired
                  history raises VersionExpiredError, and exactly-once
                  state survives (a restarted sink re-commits nothing)
  4. evolve       rename_column / drop_column without rewriting a byte:
                  logical names move, immutable physical names stay;
                  protocol 3 stops pre-mapping readers from silently
                  nulling renamed columns
  5. query        register_table pins a transactional snapshot under a
                  SQL name — spark.sql() reads it with the same DV-aware,
                  manifest-pruned plan as read_table
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import Row, functions as F

from es_analytics_spark import txlog
from es_analytics_spark.session import get_spark
from es_analytics_spark.sources.fsio import lake_fs
from es_analytics_spark.streaming.txlog_sink import _EpochCommitter


def main() -> None:
    spark = get_spark("lake-admin")
    base = tempfile.mkdtemp(prefix="lake_admin_")
    t = os.path.join(base, "events")
    try:
        # -- 1. burst: a streaming sink's life, 60 epochs -------------------
        committer = _EpochCommitter(t, "pipeline-a", None, False)
        for epoch in range(60):
            batch = spark.createDataFrame(
                [Row(uid=epoch * 10 + i, amt=float(i), seg=f"s{i % 2}")
                 for i in range(10)]
            )
            committer(batch, epoch)
        fs = lake_fs(spark, t)
        hint = txlog._checkpoint_hint(fs, t)
        print(f"60 epochs committed; auto-checkpoint cadence left the "
              f"pointer at v{hint} (latest v{txlog.current_version(spark, t)})")

        # -- 2. bounded reads: no directory LIST on the hot path ------------
        n_logs = len(fs.glob(os.path.join(t, "_txlog", "v*.json")))
        print(f"log objects on disk: {n_logs}; snapshot reads replay only "
              f"{txlog.current_version(spark, t) - hint} tail commit(s) "
              "after one checkpoint")

        # -- 3. retention: reap old commit JSONs, keep the guarantees -------
        txlog.vacuum(spark, t, keep_versions=10, retention_seconds=0)
        res = txlog.clean_log(spark, t, keep_versions=10)
        print(f"clean_log cut at v{res['cut']}: removed "
              f"{res['removed_commits']} commit JSONs, "
              f"{res['removed_checkpoints']} old checkpoint(s)")
        print("rows after retention:", txlog.read_table(spark, t).count())
        try:
            txlog.read_table(spark, t, version=5)
        except txlog.VersionExpiredError as e:
            print("expired time travel raises:", str(e)[:60], "...")
        # exactly-once survives: a RESTARTED sink replaying an old epoch
        # finds its source token in the checkpoint-folded seen set
        restarted = _EpochCommitter(t, "pipeline-a", None, False)
        v_before = txlog.current_version(spark, t)
        restarted(spark.createDataFrame([Row(uid=1, amt=1.0, seg="s0")]), 30)
        print("replayed pre-truncation epoch re-committed:",
              txlog.current_version(spark, t) != v_before)

        # -- 4. evolve: rename + drop without rewrite -----------------------
        txlog.rename_column(spark, t, "amt", "amount")
        txlog.drop_column(spark, t, "seg")
        got = txlog.read_table(spark, t)
        print("columns after rename+drop:", got.columns)
        old_v = res["cut"] + 1
        print("time travel still shows the old names:",
              txlog.read_table(spark, t, version=old_v).columns)

        # -- 5. query: SQL over a pinned transactional snapshot -------------
        txlog.register_table(spark, "events_tx", t)
        row = spark.sql(
            "SELECT COUNT(*) AS n, SUM(amount) AS total FROM events_tx"
        ).first()
        print(f"spark.sql over the registered snapshot: n={row['n']} "
              f"total={row['total']}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
