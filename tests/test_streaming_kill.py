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
