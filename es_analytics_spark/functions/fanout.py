"""Scale-adaptive scan fan-out for under-parallelized inputs.

A parquet scan's parallelism is bounded by its file/row-group layout:
a table stored as one single-row-group file is read by exactly ONE
task no matter how many cores the cluster has, and Spark's partial
aggregation / broadcast-join probe / projection work all run inside
that scan task (guide §2.1: map-side work is charged to the scan
stage). The bench's testdata is exactly this layout (one ~11 MB file,
one row group per table at sf0.1), so every scan-heavy first stage was
single-threaded on a 32-core session.

``fan_out(df, sf_dir, table, *keys)`` inserts one hash repartition
between the scan and the heavy map-side work — but ONLY when the
table's on-disk layout cannot feed the session's cores:

- the table path must resolve to local files (URI lakes: no-op —
  a real lake layout has many objects and the planner splits them);
- the file count must be below the session parallelism (many files
  already fan out across tasks);
- the total bytes must be under ``spark.es_analytics.fanout.max_bytes``
  (default 1 GiB) — never shuffle a big table just to re-spread it.

The partition count derives from input size (bytes /
``spark.es_analytics.fanout.bytes_per_task``, default 256 KiB,
clamped to the session parallelism), so sf0.001 gets 1-2 partitions
and sf0.1 gets the full core count — scale-adaptive, not a constant
tuned for either mode (guide §2: make partitioning derive from input
size). On a cluster reading a real multi-file lake every guard trips
and the call is an exact no-op, so plans at scale are unchanged.

Repartitioning by an explicit key (pass the downstream grouping/join
key) keeps the exchange count identical when the next operator needs
hashpartitioning on that key — the shuffle this helper adds is the
shuffle the aggregation needed anyway; only the expensive per-row
work moves from the 1-task scan stage to the post-exchange parallel
stage. Keyless calls use round-robin (pays the sort-before-repartition
pass; prefer a key).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame

MAX_BYTES_CONF = "spark.es_analytics.fanout.max_bytes"
BYTES_PER_TASK_CONF = "spark.es_analytics.fanout.bytes_per_task"
CONCURRENCY_CONF = "spark.es_analytics.fanout.concurrency"

_DEFAULT_MAX_BYTES = 1 << 30  # 1 GiB
_DEFAULT_BYTES_PER_TASK = 256 << 10  # 256 KiB

#: (abs path, mtime) -> (total_bytes, file_count)
_LAYOUT_CACHE: dict[tuple[str, float], tuple[int, int]] = {}


def _layout(path: str) -> tuple[int, int] | None:
    """(total_bytes, file_count) for a local file/dir, None if not local."""
    try:
        st = os.stat(path)
    except OSError:
        return None  # URI store or missing — never fan out blind
    key = (os.path.abspath(path), st.st_mtime)
    hit = _LAYOUT_CACHE.get(key)
    if hit is not None:
        return hit
    if os.path.isfile(path):
        out = (st.st_size, 1)
    else:
        total = count = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.startswith(("_", ".")):
                    continue  # commit markers / checksums
                try:
                    total += os.path.getsize(os.path.join(root, f))
                    count += 1
                except OSError:
                    pass
        out = (total, count)
    _LAYOUT_CACHE[key] = out
    return out


def fan_out(
    df: DataFrame, sf_dir: str, table: str, *keys: str | Column, weight: float = 1.0
) -> DataFrame:
    """Hash-repartition ``df`` iff ``table``'s layout under-feeds the cores.

    ``weight`` declares how much heavier the downstream per-row work is
    than a plain scan (e.g. a 64-hash shingle pipeline over a small
    compressed text table amplifies each input byte ~30x); it scales
    the partition-count estimate, never the no-op guards — a big or
    multi-file table stays untouched regardless of weight.
    """
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    lay = _layout(os.path.join(sf_dir, f"{table}.parquet"))
    if lay is None:
        return df
    total_bytes, file_count = lay
    if file_count >= cores:
        return df
    try:
        max_bytes = int(spark.conf.get(MAX_BYTES_CONF, str(_DEFAULT_MAX_BYTES)))
        per_task = int(
            spark.conf.get(BYTES_PER_TASK_CONF, str(_DEFAULT_BYTES_PER_TASK))
        )
        concurrency = int(spark.conf.get(CONCURRENCY_CONF, "1"))
    except ValueError:
        max_bytes, per_task = _DEFAULT_MAX_BYTES, _DEFAULT_BYTES_PER_TASK
        concurrency = 1
    # Under N-way concurrent query submission each fanned-out plan would
    # otherwise claim the full core count, oversubscribing the pool N
    # times over (round-11 verdict: the bench's 8-way cold phase paid
    # ~9% for it). A submitter that runs queries concurrently declares
    # its width via this conf; each plan then targets its fair share of
    # the cores. Width only — the no-op guards are unchanged, and the
    # default (1) keeps single-query plans identical.
    cores = max(1, cores // max(concurrency, 1))
    if total_bytes > max_bytes:
        return df
    parts = max(
        1, min(cores, -(-int(total_bytes * max(weight, 1.0)) // max(per_task, 1)))
    )
    if parts <= file_count:
        return df
    return df.repartition(parts, *keys) if keys else df.repartition(parts)


def broadcast_if_small(
    df: DataFrame, sf_dir: str, table: str, factor: float = 1.0
) -> DataFrame:
    """``F.broadcast(df)`` iff ``table``'s on-disk bytes bound ``df`` small.

    For iterative graph loops the per-iteration state frame (rank /
    frontier / score) is node-sized, and the node set is bounded by the
    rows of the table the edges derive from — so when that table's
    LOCAL layout is under ``spark.es_analytics.fanout.max_bytes``
    (default 1 GiB, same knob as :func:`fan_out`), broadcasting the
    state replaces a per-iteration shuffle of the (much larger) edge
    list with a task-local hash probe (guide §3.1: broadcast replaces
    the shuffle of the big side). On a URI lake or a big/multi-file
    layout the guard trips, the frame is returned unchanged, and the
    caller's explicit shuffle-strategy hint keeps the scale-audited
    plan — the same adapt-by-layout contract as ``fan_out``, never an
    unconditional broadcast of an unbounded frame.

    ``factor`` declares how much LARGER than the bounding table the
    frame can grow (e.g. a multi-source BFS frontier is |nodes| x
    |seeds|, so the caller passes the measured seed count): the guard
    becomes ``table_bytes * factor <= max_bytes``, keeping the
    broadcast decision honest for super-linear state instead of
    pretending node-sized.
    """
    spark = df.sparkSession
    lay = _layout(os.path.join(sf_dir, f"{table}.parquet"))
    if lay is None:
        return df
    try:
        max_bytes = int(spark.conf.get(MAX_BYTES_CONF, str(_DEFAULT_MAX_BYTES)))
    except ValueError:
        max_bytes = _DEFAULT_MAX_BYTES
    if lay[0] * max(factor, 1.0) > max_bytes:
        return df
    from pyspark.sql import functions as F

    return F.broadcast(df)
