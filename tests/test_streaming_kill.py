"""Mid-epoch driver-kill sweep for the checkpointed streaming lake path.

The existing restart test (test_lake_lifecycle.py::
test_stream_to_lake_restart_is_exactly_once) re-runs a CLEANLY
TERMINATED query. This sweep is the harder contract: a separate driver
process is SIGKILLed while an epoch is IN FLIGHT — its offset written
to the checkpoint WAL but its commit not yet recorded, the exact window
where a naive sink would double-write on restart. Resume from the same
checkpoint must (a) re-run the torn epoch, (b) ignore any orphan files
it half-wrote (the parquet sink's _spark_metadata log gates batch-read
visibility), and (c) land every source row in the lake exactly once.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
from es_analytics_spark.session import get_spark
from es_analytics_spark.streaming.collector_sink import stream_to_lake

src, lake, ckpt = sys.argv[1:4]
spark = get_spark("kill-child", cpus=4)
schema = spark.read.parquet(src).schema
stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", "1")
    .parquet(src)
)
q = stream_to_lake(stream, table="events", lake_dir=lake, checkpoint_dir=ckpt)
q.awaitTermination()  # runs until SIGKILLed by the parent
"""


def _entries(d: str) -> set[str]:
    if not os.path.isdir(d):
        return set()
    return {e for e in os.listdir(d) if not e.startswith(".")}


@pytest.mark.slow
def test_mid_epoch_driver_kill_resumes_exactly_once(spark, sf_dir, tmp_path):
    from es_analytics_spark.sources.lake import read_table
    from es_analytics_spark.streaming.collector_sink import read_lake_table, stream_to_lake

    src = str(tmp_path / "src")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    events = read_table(spark, sf_dir, "events")
    n_src = events.count()
    # 12 single-file epochs give the kill loop a dozen in-flight windows
    events.repartition(12).write.parquet(src)
    child_py = tmp_path / "child.py"
    child_py.write_text(CHILD)

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, str(child_py), src, lake, ckpt],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    killed_mid_epoch = False
    try:
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                pytest.fail(f"child driver exited early (rc={proc.returncode})")
            offsets = _entries(f"{ckpt}/offsets")
            commits = _entries(f"{ckpt}/commits")
            # offset written, commit absent => an epoch is mid-flight;
            # require >=2 committed epochs first so the resume must
            # ALSO prove it does not re-ingest already-committed ones
            if len(commits) >= 2 and len(offsets) > len(commits):
                os.kill(proc.pid, signal.SIGKILL)
                killed_mid_epoch = True
                break
            time.sleep(0.02)
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()
    assert killed_mid_epoch, "never observed an in-flight epoch to kill"
    torn = _entries(f"{ckpt}/offsets") - _entries(f"{ckpt}/commits")
    assert torn, "kill landed after commit — no torn epoch to recover"

    # resume from the same checkpoint in THIS session; drain to the end
    schema = spark.read.parquet(src).schema
    resumed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_to_lake(
        resumed, table="events", lake_dir=lake, checkpoint_dir=ckpt,
        available_now=True,
    )
    q.awaitTermination()

    got = read_lake_table(spark, lake, "events")
    assert got.count() == n_src, "lost or duplicated rows across the kill"
    assert got.select("event_id").distinct().count() == n_src, (
        "torn epoch was double-written on resume"
    )
    # the torn epoch really was re-run by the resumed query
    assert torn <= _entries(f"{ckpt}/commits")


TXLOOP_CHILD = """
import sys
from es_analytics_spark.session import get_spark
from es_analytics_spark.sources.txlog_source import register_txlog_feed
from es_analytics_spark.streaming.txlog_sink import stream_to_txlog

src, dst, ckpt = sys.argv[1:4]
spark = get_spark("kill-loop-child", cpus=4)
register_txlog_feed(spark)
feed = (
    spark.readStream.format("txlog_feed")
    .option("path", src)
    .option("max_versions_per_batch", "1")
    .load()
)
q = stream_to_txlog(feed, dst, checkpoint_dir=ckpt, stream_id="loop")
q.awaitTermination()  # runs until SIGKILLed by the parent
"""


@pytest.mark.slow
def test_mid_epoch_kill_in_txlog_to_txlog_loop(spark, tmp_path):
    """The closed transactional loop under the same torn-epoch contract:
    txlog A → txlog_feed source (1 commit per epoch) → exactly-once
    txlog sink → txlog B, SIGKILLed while an epoch is in flight. The
    crash can land between the sink's txlog CAS and the WAL commit —
    the exact window where the resumed query REPLAYS the epoch and the
    sink must see its source name already committed and no-op. Resume
    must leave B == A as an exact multiset, with a gap-free epoch
    history in B's log."""
    from pyspark.sql import Row

    from es_analytics_spark.sources.txlog_source import register_txlog_feed
    from es_analytics_spark.streaming.txlog_sink import stream_to_txlog
    from es_analytics_spark.txlog import append, read_table, table_sources

    register_txlog_feed(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    n_commits = 12
    for lo in range(0, n_commits * 10, 10):
        append(
            spark,
            src,
            spark.createDataFrame(
                [Row(id=i, val=float(i)) for i in range(lo, lo + 10)]
            ),
        )
    child_py = tmp_path / "child_loop.py"
    child_py.write_text(TXLOOP_CHILD)

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, str(child_py), src, dst, ckpt],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    killed_mid_epoch = False
    try:
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                pytest.fail(f"child driver exited early (rc={proc.returncode})")
            offsets = _entries(f"{ckpt}/offsets")
            commits = _entries(f"{ckpt}/commits")
            if len(commits) >= 2 and len(offsets) > len(commits):
                os.kill(proc.pid, signal.SIGKILL)
                killed_mid_epoch = True
                break
            time.sleep(0.02)
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()
    assert killed_mid_epoch, "never observed an in-flight epoch to kill"
    torn = _entries(f"{ckpt}/offsets") - _entries(f"{ckpt}/commits")
    assert torn, "kill landed after commit — no torn epoch to recover"

    # resume the SAME loop from the same checkpoint in this session
    feed = (
        spark.readStream.format("txlog_feed")
        .option("path", src)
        .option("max_versions_per_batch", "1")
        .load()
    )
    # availableNow falls back to single-batch for Python sources and the
    # rate limit bounds each run to one source commit: drain in a loop
    # until the sink has every epoch
    from es_analytics_spark.txlog import _read_commit, current_version, lake_fs, txn_version

    for _ in range(n_commits + 2):
        q = stream_to_txlog(
            feed, dst, checkpoint_dir=ckpt, stream_id="loop", available_now=True
        )
        q.awaitTermination(120)
        if txn_version(spark, dst, "loop") >= n_commits - 1:
            break

    a = sorted(map(tuple, read_table(spark, src).select("id", "val").collect()))
    b = sorted(map(tuple, read_table(spark, dst).select("id", "val").collect()))
    assert a == b, "lost or duplicated rows across the kill"
    # gap-free epoch history: every epoch's writer-txn mark exactly once
    fs = lake_fs(spark, dst)
    epochs = [
        _read_commit(fs, dst, v)["txn"]["version"]
        for v in range(1, current_version(spark, dst) + 1)
    ]
    assert epochs == sorted(set(epochs)) and len(epochs) == n_commits
    assert torn <= _entries(f"{ckpt}/commits"), "torn epoch was not re-run"
