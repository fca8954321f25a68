"""Lineage truncation with a durability seam.

Iterative queries (pagerank, LPA, HITS, connected components) and
multi-consumer intermediates MUST cut lineage each round or the plan
grows exponentially (two consumers per step double the recomputed
lineage — measured 134 shuffles vs 2 on HITS). Two ways to cut it:

- ``localCheckpoint()`` — blocks to executor storage. Fast (no
  replication, no external FS round-trip) but NON-DURABLE: lose an
  executor and every downstream stage that needs its blocks fails the
  JOB (lineage was truncated, so Spark cannot recompute them). Fine on
  local[N] and short interactive work; wrong default for a 1000-
  executor cluster where executor loss is routine.
- ``checkpoint()`` — materializes to the reliable checkpoint FS
  (HDFS/S3). Slower per cut, but executor loss only re-reads the
  checkpointed files.

``cut_lineage`` picks per the session conf
``spark.es_analytics.checkpoint.dir``: unset/empty → localCheckpoint;
set to a path/URI → reliable checkpoint into it. Designed for
``df.transform(cut_lineage)`` so call sites stay chain-shaped. Both
modes are eager (compute now), so timing and plan shape downstream are
identical — tests/test_operators.py pins result equivalence across the
two modes on the iterative graph queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: session conf key: reliable-checkpoint base dir ("" → localCheckpoint)
CHECKPOINT_DIR_CONF = "spark.es_analytics.checkpoint.dir"


def cut_lineage_lazy(df: DataFrame) -> DataFrame:
    """Lineage cut that materializes at the FIRST consuming action
    instead of immediately — one fewer scheduler-barrier job per cut
    (measured 5-8% end-to-end on the iterative graph queries, which
    cut 5-10 times per run).

    ONLY safe for frames whose content is DETERMINISTIC: until the
    first action completes, two consumers inside one job may compute a
    partition concurrently before the cache fills, so a
    nondeterministic frame (RangePartitioner pids, rand()) could
    diverge between branches — exactly the bug the eager default
    exists to prevent (see _dist_quintile). Keep `cut_lineage` for
    anything nondeterministic or pid-dependent.
    """
    return cut_lineage(df, eager=False)


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage, durably if the session asks for it."""
    spark = df.sparkSession
    ckdir = spark.conf.get(CHECKPOINT_DIR_CONF, "")
    if not ckdir:
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    # setCheckpointDir mints a fresh UUID subdir per call — set once per
    # (context, conf value), not per cut
    if getattr(sc, "_es_analytics_ckdir", None) != ckdir:
        sc.setCheckpointDir(ckdir)
        sc._es_analytics_ckdir = ckdir
    return df.checkpoint(eager=eager)
