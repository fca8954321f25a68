"""One-shot bounded drain of the ``txlog_feed`` streaming source — the
``Trigger.AvailableNow`` ergonomics for txlog tables (round-11 ask #6).

Delta's ``availableNow`` contract: process EVERYTHING committed at the
moment the trigger fired — in rate-limited micro-batches, each
checkpointed — then stop; data committed while the drain runs waits for
the next run. Spark's Python DataSource wrapper
(``PythonMicroBatchStream``) implements ``MicroBatchStream`` only, NOT
``SupportsTriggerAvailableNow``, so a plain
``.trigger(availableNow=True)`` start gives exactly ONE micro-batch per
``start()`` (pinned by ``tests/test_txlog_source.py::
test_rate_limit_bounds_each_batch``) — a rate-limited backfill would
need hand-rolled restarts. :func:`drain_txlog_feed` is that loop, done
right:

1. resolve the table's CURRENT version once (the snapshot bound) and
   pass it as the source's ``ending_version`` — commits landing during
   the drain can never extend it;
2. run availableNow passes against ONE checkpoint until the WAL cursor
   reaches the bound — each pass is one micro-batch of at most
   ``max_versions_per_batch`` versions, committed to the WAL before the
   next starts, so a kill at ANY point resumes exactly-once from the
   checkpoint (same offsets a continuous stream of the same options
   would have written);
3. stop. The checkpoint is a normal txlog_feed checkpoint — a later
   drain (or a continuous stream) resumes from it seamlessly.

Scale note: the loop is driver-side ORCHESTRATION only (start/await/
read-cursor); every micro-batch plans one file-partition per parquet
file and reads on executors, identical to the continuous stream.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import SparkSession

from es_analytics_spark.sources.txlog_source import _PyLog, register_txlog_feed


def _local_ckpt_dir(checkpoint_dir: str) -> str:
    """Normalize the checkpoint location to a plain local path:
    ``file://`` / ``file:`` URIs strip to their path (Spark writes the
    same bytes either way); any OTHER scheme is refused up front with a
    curated error — the cursor reader (and the txlog_feed source
    itself, see _PyLog) uses plain Python I/O, and silently returning
    None here would make the drain loop spin to its runaway cap and
    report failure AFTER the work succeeded."""
    if re.match(r"^file:", checkpoint_dir):
        from urllib.parse import urlparse

        return urlparse(checkpoint_dir).path or checkpoint_dir[len("file:"):]
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:/", checkpoint_dir):
        raise ValueError(
            f"drain_txlog_feed: checkpoint_dir {checkpoint_dir!r} is a "
            "non-local URI — the drain reads the WAL cursor (and the "
            "txlog_feed source reads the log) with plain Python I/O; "
            "use a local path, like the source's table path"
        )
    return checkpoint_dir


def _wal_cursor(checkpoint_dir: str) -> int | None:
    """The version cursor the checkpoint's WAL has COMMITTED (offsets of
    the newest batch id present in ``commits/``), or None before the
    first commit. Reads Spark's stable v1 checkpoint layout: one file
    per batch id under ``commits/`` and ``offsets/``; the offset file's
    last line is the source's serialized offset ``{"version": N}``."""
    checkpoint_dir = _local_ckpt_dir(checkpoint_dir)
    commits_dir = os.path.join(checkpoint_dir, "commits")
    try:
        batches = [int(n) for n in os.listdir(commits_dir) if n.isdigit()]
    except FileNotFoundError:
        return None
    if not batches:
        return None
    off_path = os.path.join(checkpoint_dir, "offsets", str(max(batches)))
    with open(off_path, "r", encoding="utf-8") as f:
        last = [ln for ln in f.read().splitlines() if ln.strip()][-1]
    return int(json.loads(last)["version"])


def drain_txlog_feed(
    spark: SparkSession,
    path: str,
    checkpoint_dir: str,
    batch_fn,
    max_versions_per_batch: int = 0,
    timeout_per_pass: float = 300.0,
    **source_options,
) -> dict:
    """Drain every commit of txlog table ``path`` up to ITS VERSION AT
    CALL TIME into ``batch_fn(df, batch_id)`` (a foreachBatch function),
    in checkpointed micro-batches of at most ``max_versions_per_batch``
    versions (0 = one batch for the whole backlog). Exactly-once across
    kills and re-runs via ``checkpoint_dir`` — a re-run resumes at the
    WAL cursor and a fully-drained checkpoint feeds nothing. Extra
    ``source_options`` (``cdf``, ``ignore_changes``,
    ``partition_filter``, ``starting_version``, …) pass through to the
    source. Returns {"ending_version", "passes", "drained"}."""
    register_txlog_feed(spark)
    _local_ckpt_dir(checkpoint_dir)  # refuse non-local URIs up front
    end_v = _PyLog(path).current_version()
    start_cursor = _wal_cursor(checkpoint_dir)
    passes = 0
    # each pass advances the WAL by >= 1 version (a micro-batch window
    # is never empty while cursor < end), so the loop is bounded by the
    # version distance; the cap below is a pure runaway backstop
    max_passes = max(4, (end_v + 2) * 2)
    while (_wal_cursor(checkpoint_dir) or 0) < end_v:
        if passes >= max_passes:
            raise RuntimeError(
                f"drain_txlog_feed under {path}: no convergence after "
                f"{passes} passes (cursor {_wal_cursor(checkpoint_dir)}, "
                f"bound v{end_v}) — a pass is not advancing the WAL"
            )
        reader = (
            spark.readStream.format("txlog_feed")
            .option("path", path)
            .option("ending_version", str(end_v))
        )
        if max_versions_per_batch:
            reader = reader.option(
                "max_versions_per_batch", str(max_versions_per_batch)
            )
        for k, v in source_options.items():
            reader = reader.option(k, str(v))
        q = (
            reader.load()
            .writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_per_pass)
        if q.isActive:
            q.stop()
            raise RuntimeError(
                f"drain_txlog_feed under {path}: pass {passes} exceeded "
                f"{timeout_per_pass}s"
            )
        if q.exception() is not None:
            raise q.exception()
        passes += 1
    return {
        "ending_version": end_v,
        "passes": passes,
        "drained": (_wal_cursor(checkpoint_dir) or 0) - (start_cursor or 0),
    }
