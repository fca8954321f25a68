"""The ``txlog_feed`` streaming/batch source (`sources/txlog_source.py`):
a txlog table as a first-class Structured Streaming SOURCE — version
offsets, exactly-once restarts, rate limiting, strict/ignore_changes/cdf
modes, schema-evolution failure, and the full loop (stream a txlog
table into another txlog table and converge)."""

import os

import pytest
from pyspark.sql import Row

from es_analytics_spark.sources.txlog_source import register_txlog_feed
from es_analytics_spark.txlog import (
    append,
    compact,
    delete_where,
    merge_upsert,
    read_table,
    table_changes_cdf,
    vacuum,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_txlog_feed(spark)


def _ids(spark, lo, hi, **tags):
    rows = [Row(id=i, val=float(i), **tags) for i in range(lo, hi)]
    return spark.createDataFrame(rows)


def _table(spark, tmp_path, name="t"):
    path = os.path.join(str(tmp_path), name)
    append(spark, path, _ids(spark, 0, 10))  # v1
    append(spark, path, _ids(spark, 10, 20))  # v2
    return path


def _run_stream(spark, path, checkpoint, **options):
    """One availableNow pass collected via foreachBatch (the memory sink
    can't recover from a checkpoint; foreachBatch can). Returns
    (query, rows-collected-by-THIS-run)."""
    reader = spark.readStream.format("txlog_feed").option("path", path)
    for k, v in options.items():
        reader = reader.option(k, v)
    rows: list = []
    q = (
        reader.load()
        .writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    except Exception:
        pass  # failure surfaces via q.exception(), which tests assert on
    return q, rows


def test_stream_matches_table(spark, tmp_path):
    path = _table(spark, tmp_path)
    _q, rows = _run_stream(spark, path, os.path.join(str(tmp_path), "ckpt"))
    got = {r.id for r in rows}
    want = {r.id for r in read_table(spark, path).collect()}
    assert got == want == set(range(20))


def test_restart_is_exactly_once(spark, tmp_path):
    """Stop, append more, resume from the SAME checkpoint: only the new
    commits feed — no duplicates, no gaps (version offsets in the WAL)."""
    path = _table(spark, tmp_path)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    _q, first = _run_stream(spark, path, ckpt)
    append(spark, path, _ids(spark, 20, 25))  # v3 — after the stream stopped
    _q, second = _run_stream(spark, path, ckpt)
    assert {r.id for r in first} == set(range(20))
    assert sorted(r.id for r in second) == list(range(20, 25))
    # a third run with nothing new feeds nothing (cursor is durable)
    _q, third = _run_stream(spark, path, ckpt)
    assert third == []


def test_starting_version_skips_history(spark, tmp_path):
    path = _table(spark, tmp_path)
    _q, rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt"), starting_version=1
    )
    assert sorted(r.id for r in rows) == list(range(10, 20))


def test_rate_limit_bounds_each_batch(spark, tmp_path):
    """max_versions_per_batch=1 on a 3-version history → each pass
    advances exactly one commit (availableNow falls back to single-batch
    for Python sources, so each start = one bounded, checkpointed step)."""
    path = _table(spark, tmp_path)
    append(spark, path, _ids(spark, 20, 30))  # v3
    ckpt = os.path.join(str(tmp_path), "ckpt")
    seen = []
    for _ in range(3):
        _q, rows = _run_stream(spark, path, ckpt, max_versions_per_batch=1)
        seen.append(sorted(r.id for r in rows))
    assert seen == [list(range(0, 10)), list(range(10, 20)), list(range(20, 30))]


def test_strict_mode_fails_on_delete(spark, tmp_path):
    path = _table(spark, tmp_path)
    delete_where(spark, path, "id < 5")  # v3: data-changing non-append
    q, _rows = _run_stream(spark, path, os.path.join(str(tmp_path), "ckpt"))
    assert q.exception() is not None
    assert "ignore_changes" in str(q.exception())


def test_ignore_changes_streams_insert_feed(spark, tmp_path):
    """ignore_changes: delete/merge commits don't fail the stream; the
    fed rows are exactly the batch insert-only feed (survivor rewrites
    invisible, merge's genuinely-new rows included)."""
    path = _table(spark, tmp_path)
    delete_where(spark, path, "id < 5")  # v3
    merge_upsert(
        spark,
        path,
        spark.createDataFrame([Row(id=7, val=700.0), Row(id=99, val=99.0)]),
        keys=["id"],
    )  # v4
    _q, rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt"), ignore_changes="true"
    )
    # insert-only feed: the original appends (0..19 — deletions not
    # expressible) plus the merge's updates part (7's new version, 99)
    assert sorted(r.id for r in rows) == sorted(list(range(0, 20)) + [7, 99])


def test_compaction_is_invisible_and_empty_batch_ok(spark, tmp_path):
    """A window containing only a compact commit plans zero input
    partitions and the stream still advances its offset past it."""
    path = _table(spark, tmp_path)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    _run_stream(spark, path, ckpt)
    compact(spark, path)  # v3: pure rewrite
    q, rows = _run_stream(spark, path, ckpt)
    assert q.exception() is None and rows == []
    append(spark, path, _ids(spark, 20, 22))  # v4
    _q, rows = _run_stream(spark, path, ckpt)
    assert sorted(r.id for r in rows) == [20, 21]


def test_cdf_stream_replays_to_snapshot(spark, tmp_path):
    """cdf=true: the streamed row-level feed equals the batch
    table_changes_cdf multiset, and net(insert − delete) per full row
    reconstructs the live table exactly."""
    from collections import Counter

    path = _table(spark, tmp_path)
    delete_where(spark, path, "id >= 15")  # v3
    merge_upsert(
        spark,
        path,
        spark.createDataFrame([Row(id=3, val=333.0), Row(id=77, val=77.0)]),
        keys=["id"],
    )  # v4
    _q, rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt"), cdf="true"
    )
    cols = ["id", "val", "_change_type", "_commit_version"]
    batch = table_changes_cdf(spark, path, 0)
    assert sorted((r.id, r.val, r._change_type, r._commit_version) for r in rows) == sorted(
        map(tuple, batch.select(*cols).collect())
    )
    net = Counter()
    for r in rows:
        net[(r.id, r.val)] += 1 if r._change_type == "insert" else -1
    replayed = sorted(k for k, n in net.items() if n > 0)
    assert replayed == sorted(
        (r.id, r.val) for r in read_table(spark, path).select("id", "val").collect()
    )


def test_schema_evolution_fails_running_stream_with_restart_hint(spark, tmp_path):
    """A RUNNING query that planned before an evolution fails loudly
    when a batch first covers the evolved commit (silently dropping the
    new column would be undetectable data loss); a restarted query
    re-plans with the evolved schema and null-fills old parts."""
    import time

    path = _table(spark, tmp_path)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    rows: list = []
    q = (
        spark.readStream.format("txlog_feed")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(lambda df, _bid: rows.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while len(rows) < 20 and time.time() < deadline:
        time.sleep(0.2)
    assert len(rows) == 20  # planned-schema batches flowed
    df = spark.createDataFrame([Row(id=100, val=1.0, extra="x")])
    append(spark, path, df, evolve=True)  # v3 evolves under the running query
    while q.exception() is None and time.time() < deadline:
        time.sleep(0.2)
    assert q.exception() is not None
    assert "restart the stream" in str(q.exception())
    # the restarted query (same checkpoint) plans the evolved schema;
    # it re-covers only the unfinished window and null-fill applies to
    # any pre-evolution part in it
    q2, rows2 = _run_stream(spark, path, ckpt)
    assert q2.exception() is None
    assert {(r.id, r.extra) for r in rows2} == {(100, "x")}
    # a FRESH stream (new checkpoint) replays history under the evolved
    # schema: old parts read the new column as null
    _q, rows3 = _run_stream(spark, path, os.path.join(str(tmp_path), "ckpt2"))
    assert {r.id for r in rows3} == set(range(0, 20)) | {100}
    assert {r.extra for r in rows3} == {None, "x"}


def test_vacuumed_history_raises_clear_error(spark, tmp_path):
    path = _table(spark, tmp_path)
    compact(spark, path)  # v3 rewrites v1/v2's parts
    append(spark, path, _ids(spark, 20, 22))  # v4 pushes v1/v2 past retention
    vacuum(spark, path, keep_versions=1, retention_seconds=0)
    q, _rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt"), ignore_changes="true"
    )
    assert q.exception() is not None
    assert "vacuum retention" in str(q.exception())


def test_batch_reader_window(spark, tmp_path):
    path = _table(spark, tmp_path)
    append(spark, path, _ids(spark, 20, 25))  # v3
    got = (
        spark.read.format("txlog_feed")
        .option("path", path)
        .option("from_version", 1)
        .load()
    )
    assert sorted(r.id for r in got.collect()) == list(range(10, 25))
    window = (
        spark.read.format("txlog_feed")
        .option("path", path)
        .option("from_version", 1)
        .option("to_version", 2)
        .load()
    )
    assert sorted(r.id for r in window.collect()) == list(range(10, 20))


def test_full_loop_stream_txlog_to_txlog(spark, tmp_path):
    """The closed loop: txlog table A → txlog_feed source → exactly-once
    txlog sink → table B; B converges to A across restarts and new
    commits on A."""
    from es_analytics_spark.streaming.txlog_sink import stream_to_txlog

    src = _table(spark, tmp_path, "src")
    dst = os.path.join(str(tmp_path), "dst")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def run_once():
        feed = spark.readStream.format("txlog_feed").option("path", src).load()
        q = stream_to_txlog(
            feed, dst, checkpoint_dir=ckpt, stream_id="loop", available_now=True
        )
        q.awaitTermination(120)

    run_once()
    append(spark, src, _ids(spark, 20, 30))
    run_once()
    a = sorted(map(tuple, read_table(spark, src).select("id", "val").collect()))
    b = sorted(map(tuple, read_table(spark, dst).select("id", "val").collect()))
    assert a == b and len(b) == 30


def test_cdf_stream_rejects_replace_schema_change_parts(spark, tmp_path):
    """A replace_schema overwrite's change parts keep their WRITE-TIME
    schema; a cdf stream planned on the new schema cannot represent
    them (a restart can't fix it — the latest schema still lacks the
    old column). The batch must fail at PLAN time with bootstrap
    guidance, and starting past the overwrite must work."""
    from pyspark.sql import functions as F

    from es_analytics_spark.txlog import overwrite_table

    path = _table(spark, tmp_path)
    overwrite_table(
        spark,
        path,
        spark.createDataFrame([Row(id=1, renamed=9.0)]),
        replace_schema=True,
        cdc=True,
    )  # v3: deletes carry the OLD (id, val) schema; stream schema lacks val
    # from v0 the commit-level guard names the replace_schema remedy
    # (a restart cannot represent the pre-replace window)
    q, _rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt"), cdf="true"
    )
    assert q.exception() is not None
    assert "replace_schema" in str(q.exception())
    # a window covering ONLY the overwrite trips the per-ENTRY guard:
    # the commit schema matches the stream, but its cdc delete part
    # keeps the write-time (pre-replace) schema
    q, _rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt_e"), cdf="true",
        starting_version=2,
    )
    assert q.exception() is not None
    assert "write-time schema" in str(q.exception())
    # starting past the offending window streams fine
    _q, rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt2"), cdf="true",
        starting_version=3,
    )
    append(spark, path, spark.createDataFrame([Row(id=2, renamed=1.0)]))
    _q2, rows2 = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt2"), cdf="true",
        starting_version=3,
    )
    assert {r.id for r in rows + rows2} == {2}


def test_partition_filter_streams_one_tenant(spark, tmp_path):
    """partition_filter: exact-tag manifest pruning in the stream
    planner — a per-tenant consumer plans only its partition's parts;
    cdf mode refuses the option (change parts are untagged)."""
    import json as _json

    path = os.path.join(str(tmp_path), "t")
    append(spark, path, _ids(spark, 0, 5, d="a"), partition={"d": "a"})
    append(spark, path, _ids(spark, 5, 9, d="b"), partition={"d": "b"})
    append(spark, path, _ids(spark, 9, 12, d="a"), partition={"d": "a"})
    _q, rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt"),
        partition_filter=_json.dumps({"d": "a"}),
    )
    assert sorted(r.id for r in rows) == [0, 1, 2, 3, 4, 9, 10, 11]
    # batch window read honors it too
    got = (
        spark.read.format("txlog_feed").option("path", path)
        .option("partition_filter", _json.dumps({"d": "b"})).load()
    )
    assert sorted(r.id for r in got.collect()) == [5, 6, 7, 8]
    q, _rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt2"), cdf="true",
        partition_filter=_json.dumps({"d": "a"}),
    )
    assert q.exception() is not None and "untagged" in str(q.exception())


def test_rate_limit_floor_call_order_robustness(spark, tmp_path):
    """The rate-limit floor must not depend on the probed call-order
    contract of the Python streaming API: if a (future) Spark asks for
    latestOffset() on a restart BEFORE any partitions()/commit() seeds
    the floor, declining our clamped offer and asking again must WIDEN
    the clamp by one max_versions step per ask (round-10 ADVICE: the
    old full unclamp let one micro-batch span the entire backlog) —
    the stream converges past its WAL-committed offset in bounded
    steps instead of stalling below it forever."""
    from es_analytics_spark.sources.txlog_source import TxLogFeedStreamReader

    path = _table(spark, tmp_path)  # v1, v2
    append(spark, path, _ids(spark, 20, 30))  # v3
    schema = read_table(spark, path).schema

    # healthy restart order: partitions(committed, committed) first
    r = TxLogFeedStreamReader(schema, path, {"max_versions_per_batch": "1"})
    r.partitions({"version": 2}, {"version": 2})
    assert r.latestOffset() == {"version": 3}

    # pathological order: latestOffset first, twice, floor unseeded —
    # the clamped offer (v1) is below the committed offset (v2); each
    # repeat widens one step, so the stream passes v2 on the next ask
    # instead of stalling at v1 (and never jumps the whole backlog)
    r2 = TxLogFeedStreamReader(schema, path, {"max_versions_per_batch": "1"})
    assert r2.latestOffset() == {"version": 1}
    assert r2.latestOffset() == {"version": 2}
    assert r2.latestOffset() == {"version": 3}
    # once partitions() reveals the committed offset the clamp resumes
    r2.partitions({"version": 2}, {"version": 2})
    assert r2.latestOffset() == {"version": 3}


def test_starting_version_latest_streams_new_data_only(spark, tmp_path):
    path = _table(spark, tmp_path)  # v1, v2
    ckpt = os.path.join(str(tmp_path), "ckpt")
    _q, rows = _run_stream(spark, path, ckpt, starting_version="latest")
    assert rows == []  # nothing new at bootstrap
    append(spark, path, _ids(spark, 20, 25))  # v3
    _q, rows = _run_stream(spark, path, ckpt, starting_version="latest")
    # the WAL owns the cursor across restarts; only the new commit feeds
    assert sorted(r.id for r in rows) == list(range(20, 25))


def test_cdf_stream_spans_rename_window(spark, tmp_path):
    """round-10 ADVICE fix: in cdf mode EVERY in-window action carries
    its commit's write-time schema, so a stream planned AFTER
    rename_column used to fail at plan time on any pre-rename commit.
    Entry fields now match by physical identity (like
    _check_no_unseen_columns): the window is fully representable and
    streams under the window-end names, equal to the batch feed."""
    from es_analytics_spark.txlog import rename_column

    path = os.path.join(str(tmp_path), "t")
    append(spark, path, _ids(spark, 0, 10))  # v1: cols (id, val)
    rename_column(spark, path, "val", "amount")  # v2
    append(spark, path, spark.createDataFrame([Row(id=10, amount=10.0)]))  # v3
    delete_where(spark, path, "id < 3")  # v4: change part, post-rename schema
    q, rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ckpt"), cdf="true"
    )
    assert q.exception() is None, q.exception()
    got = sorted(
        (r["id"], r["amount"], r["_change_type"], r["_commit_version"])
        for r in rows
    )
    want = sorted(
        (r["id"], r["amount"], r["_change_type"], r["_commit_version"])
        for r in table_changes_cdf(spark, path, 0).collect()
    )
    assert got == want
    # pre-rename bytes present under the window-end logical name
    assert (10, 10.0, "insert", 3) in got and (0, 0.0, "insert", 1) in got


def test_rate_limit_repeated_ask_advances_one_step(spark, tmp_path):
    """round-10 ADVICE fix: a repeated latestOffset() with no
    partitions()/commit() in between advances the clamp by ONE
    max_versions step per ask — never the whole backlog at once."""
    from es_analytics_spark.sources.txlog_source import (
        TxLogFeedDataSource,
        TxLogFeedStreamReader,
    )

    path = _table(spark, tmp_path)  # v1, v2
    for lo in (20, 30, 40):
        append(spark, path, _ids(spark, lo, lo + 10))  # v3..v5
    schema = TxLogFeedDataSource(options={"path": path}).schema()
    r = TxLogFeedStreamReader(
        schema, path, {"max_versions_per_batch": "1", "starting_version": "0"}
    )
    assert r.initialOffset() == {"version": 0}
    assert r.latestOffset() == {"version": 1}  # clamped to one step
    # declined offers widen by exactly one step each, never unclamp
    assert r.latestOffset() == {"version": 2}
    assert r.latestOffset() == {"version": 3}
    # consuming a window resets the throttle at the new floor
    r.partitions({"version": 0}, {"version": 2})
    r.commit({"version": 2})
    assert r.latestOffset() == {"version": 3}
    r.partitions({"version": 2}, {"version": 3})
    r.commit({"version": 3})
    assert r.latestOffset() == {"version": 4}


def test_starting_timestamp_replays_exactly_like_version_start(spark, tmp_path):
    """round-10 ask #6: a stream started by wall clock replays exactly
    the rows the equivalent version-started stream replays (resolved
    through the same running-max stamp normalization as AS-OF reads);
    a timestamp before history replays everything; ISO-8601 accepted."""
    import time as _time

    path = os.path.join(str(tmp_path), "t")
    before = _time.time() - 1
    append(spark, path, _ids(spark, 0, 10))  # v1
    _time.sleep(0.05)
    after_v1 = _time.time()
    _time.sleep(0.05)
    append(spark, path, _ids(spark, 10, 20))  # v2
    append(spark, path, _ids(spark, 20, 30))  # v3

    _q, by_version = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ck_v"), starting_version=1
    )
    _q, by_ts = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ck_t"),
        starting_timestamp=str(after_v1),
    )
    assert sorted(r.id for r in by_ts) == sorted(r.id for r in by_version)
    assert sorted(r.id for r in by_ts) == list(range(10, 30))

    # before history: full replay (no snapshot to pin — stream semantics)
    _q, rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ck_b"),
        starting_timestamp=str(before),
    )
    assert sorted(r.id for r in rows) == list(range(0, 30))

    # ISO-8601 spelling resolves identically
    import datetime as _dt

    iso = _dt.datetime.fromtimestamp(after_v1).isoformat()
    _q, rows = _run_stream(
        spark, path, os.path.join(str(tmp_path), "ck_i"),
        starting_timestamp=iso,
    )
    assert sorted(r.id for r in rows) == list(range(10, 30))


def test_starting_timestamp_past_retention_raises_curated(spark, tmp_path):
    import time as _time

    from es_analytics_spark.sources.txlog_source import TxLogFeedStreamReader
    from es_analytics_spark.txlog import VersionExpiredError, checkpoint, clean_log

    path = os.path.join(str(tmp_path), "t")
    append(spark, path, _ids(spark, 0, 10))  # v1
    _time.sleep(0.05)
    inside = _time.time()  # resolves to v1
    _time.sleep(0.05)
    for lo in (10, 20, 30):
        append(spark, path, _ids(spark, lo, lo + 10))  # v2..v4
    checkpoint(spark, path)  # folded cut point at v4
    append(spark, path, _ids(spark, 40, 50))  # v5
    assert clean_log(spark, path, keep_versions=1)["cut"] == 4  # reaps v1..v4

    schema = read_table(spark, path).schema
    with pytest.raises(VersionExpiredError, match="already reaped"):
        TxLogFeedStreamReader(
            schema, path, {"starting_timestamp": str(inside)}
        )
    # at/after the boundary still resolves (the folded stamp anchors it)
    r = TxLogFeedStreamReader(
        schema, path, {"starting_timestamp": str(_time.time())}
    )
    assert r._start == 5
    with pytest.raises(ValueError, match="not both"):
        TxLogFeedStreamReader(
            schema, path,
            {"starting_timestamp": str(inside), "starting_version": "2"},
        )
    with pytest.raises(ValueError, match="unix seconds or an ISO-8601"):
        TxLogFeedStreamReader(schema, path, {"starting_timestamp": "nonsense"})
