"""Exactly-once streaming sink INTO the transaction log.

The round-7 verdict's ask #2: the WAL-checkpointed streaming path and
the transactional txlog existed side by side with nothing connecting
them. These tests pin the composition end to end:

- epoch-per-commit semantics (one txlog append per micro-batch,
  stamped with the writer transaction ``(stream_id, batch_id)``), with
  the committed epochs visible to ``changes_since`` consumers
  downstream;
- clean-restart replay: re-running a drained query from the same
  checkpoint commits nothing twice;
- the hard contract, mirroring tests/test_streaming_kill.py: a child
  driver SIGKILLed MID-EPOCH (offset in the WAL, commit absent), where
  a naive sink double-writes on resume — the txlog source set must
  make the replayed epoch a no-op if its CAS already won, and a fresh
  commit if it did not, landing every source row exactly once;
- the streamed table stays a normal txlog table: compaction underneath
  a cursor consumer neither double-feeds nor loses rows.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from es_analytics_spark import txlog
from es_analytics_spark.streaming.txlog_sink import epoch_source, stream_to_txlog

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
from es_analytics_spark.session import get_spark
from es_analytics_spark.streaming.txlog_sink import stream_to_txlog

src, table, ckpt = sys.argv[1:4]
spark = get_spark("txlog-kill-child", cpus=4)
schema = spark.read.parquet(src).schema
stream = (
    spark.readStream.schema(schema)
    .option("maxFilesPerTrigger", "1")
    .parquet(src)
)
q = stream_to_txlog(stream, path=table, checkpoint_dir=ckpt, stream_id="killstream")
q.awaitTermination()  # runs until SIGKILLed by the parent
"""


def _entries(d: str) -> set[str]:
    if not os.path.isdir(d):
        return set()
    return {e for e in os.listdir(d) if not e.startswith(".")}


def _drain(spark, src: str, table: str, ckpt: str, stream_id: str) -> None:
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_to_txlog(
        stream, path=table, checkpoint_dir=ckpt,
        stream_id=stream_id, available_now=True,
    )
    q.awaitTermination()


def test_stream_to_txlog_epochs_commit_exactly_once(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    n_src = events.count()
    events.repartition(5).write.parquet(src)

    _drain(spark, src, table, ckpt, "s1")
    got = txlog.read_table(spark, table)
    assert got.count() == n_src
    assert got.select("event_id").distinct().count() == n_src
    hist = txlog.history(spark, table)
    assert all(h["operation"] == "append" for h in hist)
    assert len(hist) == 5  # one commit per single-file epoch
    # one writer-txn mark, high water at the last epoch
    assert txlog.txn_version(spark, table, "s1") == 4
    fs = txlog.lake_fs(spark, table)
    assert [
        txlog._read_commit(fs, table, v)["txn"]["version"] for v in range(1, 6)
    ] == list(range(5))

    # clean-restart replay from the SAME checkpoint: nothing new commits
    v_before = txlog.current_version(spark, table)
    _drain(spark, src, table, ckpt, "s1")
    assert txlog.current_version(spark, table) == v_before
    assert txlog.read_table(spark, table).count() == n_src

    # the committed epochs ARE the change feed downstream
    delta, cursor = txlog.changes_since(spark, table, 0)
    assert delta.count() == n_src and cursor == v_before

    # the streamed table stays transactional: compact under the consumer,
    # then stream MORE data; the cursor consumer sees only the new rows
    txlog.compact(spark, table)
    more_src = str(tmp_path / "src2")
    more = events.limit(100).select(
        "event_id", "user_id", F.lit("late").alias("event_type")
    )
    more.coalesce(1).write.parquet(more_src)
    _drain(spark, more_src, table, str(tmp_path / "ckpt2"), "s2")
    delta, cursor2 = txlog.changes_since(spark, table, cursor)
    assert delta.count() == 100  # compaction invisible, new epochs visible
    assert txlog.read_table(spark, table).count() == n_src + 100
    assert cursor2 == txlog.current_version(spark, table)


def test_two_concurrent_streams_one_table_exactly_once(spark, sf_dir, tmp_path):
    """Multi-writer is the point of the txlog sink: two independent
    streaming queries (distinct stream_ids and checkpoints) drain into
    the SAME table concurrently. The CAS serializes their epochs into a
    gap-free history and every source row lands exactly once — with
    per-epoch zone maps recorded along the way."""
    import threading

    table = str(tmp_path / "table")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    n = events.count()
    half1, half2 = str(tmp_path / "a"), str(tmp_path / "b")
    events.filter(F.col("event_id") % 2 == 0).repartition(4).write.parquet(half1)
    events.filter(F.col("event_id") % 2 == 1).repartition(4).write.parquet(half2)

    def run(src: str, sid: str) -> None:
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_to_txlog(
            stream, path=table, checkpoint_dir=str(tmp_path / f"ckpt_{sid}"),
            stream_id=sid, available_now=True, stats_cols=["event_id"],
        )
        q.awaitTermination()

    t1 = threading.Thread(target=run, args=(half1, "sa"))
    t2 = threading.Thread(target=run, args=(half2, "sb"))
    t1.start(); t2.start(); t1.join(); t2.join()

    got = txlog.read_table(spark, table)
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n
    hist = txlog.history(spark, table)
    assert [h["version"] for h in hist] == list(range(1, 9))  # gap-free
    fs = txlog.lake_fs(spark, table)
    sids = {
        txlog._read_commit(fs, table, v)["txn"]["app"] for v in range(1, 9)
    }
    assert sids == {"sa", "sb"}
    # the recorded zone maps actually skip: a range read opens a subset
    lo = events.agg(F.max("event_id")).first()[0]
    sub = txlog.read_table(spark, table, range_filter={"event_id": (lo, lo)})
    assert sub.count() == 1
    opened = {f.rsplit("/parts/", 1)[1].split("/")[0] for f in sub.inputFiles()}
    assert len(opened) < 8


def test_merge_committer_handles_map_columns(spark, tmp_path):
    """Second-review finding: the full-row xxhash64 tie-break broke any
    stream with a MapType column (Spark prohibits hashing maps). The
    tie-break hashes only hashable columns now; latest-per-key dedup
    must still work with a map payload."""
    from es_analytics_spark.streaming.txlog_sink import _MergeEpochCommitter

    table = str(tmp_path / "t")
    batch = spark.createDataFrame(
        [(1, 2, {"a": "x"}), (1, 1, {"a": "old"}), (2, 1, {"b": "y"})],
        "k long, seq long, attrs map<string,string>",
    )
    committer = _MergeEpochCommitter(table, "s", ["k"], "seq", False)
    committer(batch, 0)  # runs exactly as foreachBatch would
    got = {r["k"]: (r["seq"], dict(r["attrs"])) for r in txlog.read_table(spark, table).collect()}
    assert got == {1: (2, {"a": "x"}), 2: (1, {"b": "y"})}


def test_committer_zombie_race_conflicts_then_noops(spark, tmp_path, monkeypatch):
    """Deterministic coverage of the committer's narrowest window: a
    zombie driver lands the SAME epoch between our seen-snapshot and
    our CAS. append's writer-transaction rule raises CommitConflict
    (already durable); the committer must recognize the epoch as done
    and no-op — never retry into a duplicate, never surface the error."""
    from es_analytics_spark.streaming import txlog_sink

    table = str(tmp_path / "t")
    committer = txlog_sink._EpochCommitter(table, "s", None, False)
    committer(spark.range(0, 5), 0)  # v1
    real_append = txlog.append
    state = {"raced": False}

    def zombie_then_append(spark_, path, df, **kw):
        if not state["raced"]:
            state["raced"] = True
            # the zombie's replay of the same epoch (same offset range)
            real_append(spark_, path, spark.range(5, 9), txn=kw["txn"])
        return real_append(spark_, path, df, **kw)

    monkeypatch.setattr(txlog_sink.txlog, "append", zombie_then_append)
    committer(spark.range(5, 9), 1)  # zombie wins epoch 1; we must no-op
    assert txlog.current_version(spark, table) == 2
    got = sorted(r["id"] for r in txlog.read_table(spark, table).collect())
    assert got == list(range(9))  # exactly once despite the race
    # a FRESH epoch still commits normally afterwards
    monkeypatch.setattr(txlog_sink.txlog, "append", real_append)
    committer(spark.range(9, 12), 2)
    assert txlog.read_table(spark, table).count() == 12


def test_stream_merge_to_txlog_converges_to_latest_per_key(spark, tmp_path):
    """CDC-shaped sink: epochs MERGE transactionally; the table
    converges to latest-row-per-key, a replayed drain commits nothing,
    and table_changes_cdf shows each epoch's delete(old)+insert(new)."""
    from es_analytics_spark.streaming.txlog_sink import stream_merge_to_txlog

    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    schema = "k bigint, val string, seq bigint"

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = stream_merge_to_txlog(
            stream, path=table, keys=["k"], order_col="seq",
            checkpoint_dir=ckpt, stream_id="cdc", available_now=True,
        )
        q.awaitTermination()

    # phase 1: initial snapshot, incl. a within-epoch duplicate key
    # (k=5 twice in one file; seq 2 must win inside the epoch)
    base = spark.createDataFrame(
        [(k, "v1", 1) for k in range(30)] + [(5, "v1-late", 2)], schema
    )
    base.coalesce(1).write.mode("append").parquet(src)
    drain()
    got = {r["k"]: r["val"] for r in txlog.read_table(spark, table).collect()}
    assert len(got) == 30 and got[5] == "v1-late" and got[7] == "v1"

    # replayed drain from the same checkpoint: nothing new commits
    v = txlog.current_version(spark, table)
    drain()
    assert txlog.current_version(spark, table) == v

    # phase 2: updates for 10 keys + 5 new keys arrive as a new file
    upd = spark.createDataFrame(
        [(k, "v2", 3) for k in range(10, 25, 1) if k < 20]
        + [(k, "v2", 3) for k in range(30, 35)],
        schema,
    )
    upd.coalesce(1).write.mode("append").parquet(src)
    drain()
    got = {r["k"]: r["val"] for r in txlog.read_table(spark, table).collect()}
    assert len(got) == 35
    assert all(got[k] == "v2" for k in range(10, 20))
    assert all(got[k] == "v1" for k in range(10) if k != 5)
    assert got[5] == "v1-late"  # untouched keys keep their phase-1 rows
    assert all(got[k] == "v2" for k in range(30, 35))

    # the row-level feed shows the update epoch as delete+insert
    cdf = txlog.table_changes_cdf(spark, table, v)
    by = {
        (r["_change_type"],): r["count"]
        for r in cdf.groupBy("_change_type").count().collect()
    }
    assert by[("insert",)] == 15 and by[("delete",)] == 10


@pytest.mark.slow
def test_mid_epoch_kill_resumes_into_txlog_exactly_once(spark, sf_dir, tmp_path):
    """The streaming kill sweep pointed at the transactional sink: the
    child driver dies with an epoch's offset in the WAL but its commit
    unrecorded — exactly the window where the epoch may or may not have
    already won its txlog CAS. Resume must land every row exactly once
    either way, and the change feed must equal the table."""
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    n_src = events.count()
    events.repartition(12).write.parquet(src)
    child_py = tmp_path / "child.py"
    child_py.write_text(CHILD)

    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, str(child_py), src, table, ckpt],
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

    # resume from the same checkpoint in THIS session; drain to the end
    _drain(spark, src, table, ckpt, "killstream")

    got = txlog.read_table(spark, table)
    assert got.count() == n_src, "lost or duplicated rows across the kill"
    assert got.select("event_id").distinct().count() == n_src, (
        "torn epoch was double-committed on resume"
    )
    # every commit is a distinct epoch of the one stream (writer-txn
    # marks: strictly increasing versions under one app)
    fs = txlog.lake_fs(spark, table)
    txns = [
        txlog._read_commit(fs, table, v).get("txn")
        for v in range(1, txlog.current_version(spark, table) + 1)
    ]
    assert all(t and t["app"] == "killstream" for t in txns)
    epochs = [t["version"] for t in txns]
    assert epochs == sorted(set(epochs)), "an epoch double-committed"
    # the torn epoch really was re-run by the resumed query
    assert torn <= _entries(f"{ckpt}/commits")
    # downstream cursor consumer: the feed IS the table for appends-only
    delta, _cur = txlog.changes_since(spark, table, 0)
    assert delta.count() == n_src
