"""Txlog metadata-plane scalability: the `_last_checkpoint` pointer
(bounded log listing — O(commits-since-checkpoint) log objects per
read, never a directory LIST), automatic checkpoint cadence on the
write path, commit-log retention (`clean_log`) with checkpoint-folded
schema/sources/properties/timestamp state, and SQL registration.

These are the knobs that keep a table fed by the per-epoch streaming
sink readable at 10^5-10^6 commits: without the pointer every
read/CAS-retry pays an O(total-commits) object-store LIST, and without
log retention + state folding the JSON count (and the exactly-once
seen-source scan) grows forever.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from es_analytics_spark import txlog
from es_analytics_spark.txlog import (
    VersionExpiredError,
    _checkpoint_hint,
    _commit_path,
    _try_commit,
    append,
    checkpoint,
    clean_log,
    current_version,
    history,
    read_table,
    register_table,
    set_table_properties,
    table_properties,
    table_schema,
    table_sources,
    vacuum,
    version_at_timestamp,
)
from es_analytics_spark.sources.fsio import LocalFS


def _ids(spark, lo, hi, **tags):
    df = spark.range(lo, hi).select(F.col("id").cast("long"))
    for k, v in tags.items():
        df = df.withColumn(k, F.lit(v))
    return df


class _CountingFS:
    """LocalFS shim counting commit-log object touches — the
    instrumentation the bounded-listing guarantee is asserted through."""

    def __init__(self):
        self._b = LocalFS()
        self.log_touches = 0
        self.log_globs = 0

    def __getattr__(self, name):
        return getattr(self._b, name)

    def read_bytes(self, p):
        if "_txlog" in p:
            self.log_touches += 1
        return self._b.read_bytes(p)

    def exists(self, p):
        if "_txlog" in p:
            self.log_touches += 1
        return self._b.exists(p)

    def glob(self, pat):
        if "_txlog" in pat:
            self.log_globs += 1
            self.log_touches += 1
        return self._b.glob(pat)


def _synthetic_commits(path: str, start: int, n: int, schema: dict) -> None:
    """Blind metadata-only append commits, written straight through the
    CAS primitive — the shape a streaming sink's empty-ish epochs have,
    letting the test build a 5000-commit log in seconds."""
    fs = LocalFS()
    for v in range(start, start + n):
        assert _try_commit(
            fs, path, v,
            {"operation": "append", "adds": [], "removes": [],
             "scope_partition": None, "schema": schema},
        )


def test_reads_touch_o_of_tail_not_o_of_log(spark, tmp_path, monkeypatch):
    """≥5000-commit log: with a checkpoint + pointer present, a snapshot
    read touches only the pointer, one checkpoint, and the tail commits
    — and performs ZERO log-directory globs. This is the 10^6-epoch
    streaming-table guarantee."""
    path = str(tmp_path / "t")
    append(spark, path, _ids(spark, 0, 20))  # v1 (real data)
    schema = json.loads(
        LocalFS().read_bytes(_commit_path(path, 1)).decode("utf-8")
    )["schema"]
    _synthetic_commits(path, 2, 5000, schema)  # v2..v5001
    assert checkpoint(spark, path)["version"] == 5001
    _synthetic_commits(path, 5002, 3, schema)  # small tail

    shim = _CountingFS()
    monkeypatch.setattr(txlog, "lake_fs", lambda _s, _p: shim)
    assert read_table(spark, path).count() == 20
    assert current_version(spark, path) == 5004
    assert shim.log_globs == 0, "bounded read must not LIST the log dir"
    # pointer + checkpoint + 3 tail commits + probes + schema lookups:
    # a small constant over the tail, nowhere near the 5004 commits
    assert shim.log_touches <= 40, shim.log_touches

    # the streaming source's poll loop is bounded the same way: its
    # per-trigger current_version() must answer from the pointer, never
    # a directory LIST
    from es_analytics_spark.sources import txlog_source as tsrc

    def _no_glob(pat):
        raise AssertionError(f"_PyLog.current_version globbed: {pat}")

    monkeypatch.setattr(tsrc._glob, "glob", _no_glob)
    assert tsrc._PyLog(path).current_version() == 5004


def test_auto_checkpoint_cadence_on_write_path(spark, tmp_path, monkeypatch):
    """Writers checkpoint every _CHECKPOINT_EVERY commits on their own —
    a stream that never runs optimize() still gets bounded replay."""
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 5)
    path = str(tmp_path / "t")
    append(spark, path, _ids(spark, 0, 10))  # v1
    fs = LocalFS()
    assert _checkpoint_hint(fs, path) == 0
    for i in range(4):  # v2..v5 — v5 crosses the cadence
        set_table_properties(spark, path, {f"k{i}": str(i)})
    assert _checkpoint_hint(fs, path) == 5
    assert os.path.exists(os.path.join(path, "_txlog", "checkpoint.v000005.json"))
    # next cadence window: v6..v10 → second auto checkpoint
    for i in range(5):
        set_table_properties(spark, path, {f"m{i}": str(i)})
    assert _checkpoint_hint(fs, path) == 10
    assert read_table(spark, path).count() == 10


def test_clean_log_retention_and_time_travel_boundary(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)  # manual control
    path = str(tmp_path / "t")
    stamps = []
    for i in range(4):  # v1..v4
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10),
               sources=[f"s{i + 1}"], since_version=i)
        stamps.append(time.time())
        time.sleep(0.02)
    assert checkpoint(spark, path)["version"] == 4
    for i in range(4, 6):  # v5, v6
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10),
               sources=[f"s{i + 1}"], since_version=i)
        stamps.append(time.time())
        time.sleep(0.02)
    vacuum(spark, path, keep_versions=2, retention_seconds=0)
    res = clean_log(spark, path, keep_versions=2)  # bound v4 → cut at ck v4
    assert res == {"cut": 4, "removed_commits": 4, "removed_checkpoints": 0,
                   "removed_chunks": 0}
    assert not os.path.exists(_commit_path(path, 4))
    assert os.path.exists(_commit_path(path, 5))

    # inside retention: latest, v5, and the checkpointed v4 itself
    assert read_table(spark, path).count() == 60
    assert read_table(spark, path, version=5).count() == 50
    assert read_table(spark, path, version=4).count() == 40
    # outside retention: expired loudly, at plan time
    with pytest.raises(VersionExpiredError):
        read_table(spark, path, version=3)
    # exactly-once state survives the truncation via the folded set
    assert table_sources(spark, path) == {f"s{i}" for i in range(1, 7)}
    # timestamp resolution: inside retention resolves, inside the reaped
    # range raises the expiry error (not a wrong answer)
    assert version_at_timestamp(spark, path, stamps[4]) == 5
    with pytest.raises(VersionExpiredError):
        version_at_timestamp(spark, path, stamps[1])
    # history reports the retained commits only
    assert [h["version"] for h in history(spark, path)] == [5, 6]


def test_clean_log_requires_folded_checkpoint(spark, tmp_path, monkeypatch):
    """A legacy checkpoint (no folded sources) is NOT an eligible cut —
    reaping at it would break exactly-once. clean_log must no-op."""
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    for i in range(3):
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10))
    checkpoint(spark, path)
    ck_path = os.path.join(path, "_txlog", "checkpoint.v000003.json")
    ck = json.loads(open(ck_path, "rb").read().decode("utf-8"))
    for k in ("sources", "props", "schema", "ts"):
        ck.pop(k, None)
    open(ck_path, "w").write(json.dumps(ck))
    assert clean_log(spark, path)["cut"] == 0
    assert os.path.exists(_commit_path(path, 1))


def test_checkpoint_folds_properties_schema_and_survives_clean(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    append(spark, path, _ids(spark, 0, 10))  # v1
    set_table_properties(spark, path, {"k": "1", "j": "x"})  # v2
    set_table_properties(spark, path, {"k": "2", "j": None})  # v3
    append(spark, path, _ids(spark, 10, 20).withColumn("extra", F.lit(1.5)),
           evolve=True)  # v4 (evolves)
    checkpoint(spark, path)
    assert clean_log(spark, path) == {
        "cut": 4, "removed_commits": 4, "removed_checkpoints": 0,
        "removed_chunks": 0,
    }
    assert table_properties(spark, path) == {"k": "2"}
    sch = table_schema(spark, path)
    assert [f.name for f in sch.fields] == ["id", "extra"]
    # new writes still validate against the folded schema, and reads
    # align pre-evolution rows with nulls
    append(spark, path, _ids(spark, 20, 30).withColumn("extra", F.lit(2.5)))
    got = read_table(spark, path)
    assert got.count() == 30
    assert got.filter(F.col("extra").isNull()).count() == 10


def test_stream_restart_after_clean_log_does_not_recommit(spark, tmp_path, monkeypatch):
    """A restarted stream's cold seen-source cache must answer from the
    checkpoint-folded set: replayed pre-truncation epochs stay no-ops
    even though their commit JSONs are gone."""
    from es_analytics_spark.streaming.txlog_sink import _EpochCommitter

    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    com = _EpochCommitter(path, "sid", None, False)
    for i in range(5):
        com(_ids(spark, i * 10, (i + 1) * 10), i)  # epochs 0..4 → v1..v5
    assert current_version(spark, path) == 5
    checkpoint(spark, path)
    assert clean_log(spark, path)["removed_commits"] == 5

    fresh = _EpochCommitter(path, "sid", None, False)  # restart, cold cache
    fresh(_ids(spark, 20, 30), 2)  # WAL replay of epoch 2
    assert current_version(spark, path) == 5  # no re-commit
    assert read_table(spark, path).count() == 50
    fresh(_ids(spark, 50, 60), 5)  # genuinely new epoch
    assert current_version(spark, path) == 6
    assert read_table(spark, path).count() == 60


def test_register_table_sql_over_pinned_snapshot(spark, tmp_path):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"
    )
    path = str(tmp_path / "li")
    append(spark, path, li)
    register_table(spark, "tx_lineitem", path)
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               SUM(l_extendedprice) AS sum_price,
               COUNT(*) AS n
        FROM tx_lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    exp = (
        read_table(spark, path)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    )
    assert got == exp
    # snapshot pinning: a later append does not leak into the view
    n0 = spark.sql("SELECT COUNT(*) AS n FROM tx_lineitem").first()["n"]
    append(spark, path, li.limit(10))
    assert spark.sql("SELECT COUNT(*) AS n FROM tx_lineitem").first()["n"] == n0
    txlog.refresh_table(spark, "tx_lineitem", path)
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM tx_lineitem").first()["n"] == n0 + 10
    )
    # explicit version pin
    register_table(spark, "tx_lineitem_v1", path, version=1)
    assert spark.sql("SELECT COUNT(*) FROM tx_lineitem_v1").first()[0] == n0


def test_txn_high_water_mark_idempotence_and_fold(spark, tmp_path, monkeypatch):
    """Writer transactions (the Delta setTransaction design): one
    checkpoint-folded integer per app makes replays no-ops, keeps
    checkpoints epoch-count-independent, and survives log retention."""
    from es_analytics_spark.txlog import CommitConflict, txn_version

    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    for e in range(5):
        append(spark, path, _ids(spark, e * 10, (e + 1) * 10), txn=("sink-a", e))
    assert txn_version(spark, path, "sink-a") == 4
    assert txn_version(spark, path, "other") == -1
    # a replayed epoch refuses up front — already durable
    with pytest.raises(CommitConflict, match="already durable"):
        append(spark, path, _ids(spark, 0, 10), txn=("sink-a", 3))
    assert read_table(spark, path).count() == 50

    checkpoint(spark, path)
    ck = json.loads(
        LocalFS().read_bytes(
            os.path.join(path, "_txlog", "checkpoint.v000005.json")
        ).decode("utf-8")
    )
    # ONE entry per writer, and no per-epoch source tokens
    assert ck["txns"] == {"sink-a": 4}
    assert ck["sources"] == []
    clean_log(spark, path)
    assert txn_version(spark, path, "sink-a") == 4  # folded through retention
    with pytest.raises(CommitConflict):
        append(spark, path, _ids(spark, 0, 10), txn=("sink-a", 4))
    append(spark, path, _ids(spark, 50, 60), txn=("sink-a", 5))  # next epoch fine
    assert txn_version(spark, path, "sink-a") == 5


def test_txn_zombie_cas_race_single_winner(spark, tmp_path, monkeypatch):
    """Two drivers replaying the SAME epoch race the CAS: exactly one
    commits; the loser sees its transaction already durable. Simulated
    by injecting a rival commit with the same (app, version) between
    the winner's snapshot read and its CAS attempt."""
    from es_analytics_spark.txlog import CommitConflict

    path = str(tmp_path / "t")
    append(spark, path, _ids(spark, 0, 10), txn=("sid", 0))  # v1

    real = txlog._try_commit
    fired = {"n": 0}

    def inject_rival(fs, p, version, payload):
        if fired["n"] == 0 and payload.get("txn", {}).get("app") == "sid" \
                and payload["txn"]["version"] == 1:
            fired["n"] = 1
            rival = {
                "operation": "append", "adds": [], "removes": [],
                "scope_partition": None,
                "schema": payload.get("schema"),
                "txn": {"app": "sid", "version": 1},
            }
            assert real(fs, p, version, rival)  # the zombie twin wins v2
        return real(fs, p, version, payload)

    monkeypatch.setattr(txlog, "_try_commit", inject_rival)
    with pytest.raises(CommitConflict, match="zombie|durable"):
        append(spark, path, _ids(spark, 10, 20), txn=("sid", 1))
    monkeypatch.setattr(txlog, "_try_commit", real)
    # the epoch is durable exactly once; the next epoch proceeds
    assert txlog.txn_version(spark, path, "sid") == 1
    append(spark, path, _ids(spark, 20, 30), txn=("sid", 2))
    assert read_table(spark, path).count() == 20  # rival carried no rows


def test_sink_checkpoints_stay_epoch_count_independent(spark, tmp_path, monkeypatch):
    """The streaming sink's dedup state in a checkpoint is one txn mark,
    however many epochs have committed — the O(total-epochs) seen-source
    growth is gone."""
    from es_analytics_spark.streaming.txlog_sink import _EpochCommitter

    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    com = _EpochCommitter(path, "sid", None, False)
    for e in range(30):
        com(_ids(spark, e, e + 1), e)
    checkpoint(spark, path)
    ck = json.loads(
        LocalFS().read_bytes(
            os.path.join(path, "_txlog", "checkpoint.v000030.json")
        ).decode("utf-8")
    )
    assert ck["txns"] == {"sid": 29} and ck["sources"] == []
    # replay after restart + retention: still exactly-once
    clean_log(spark, path)
    fresh = _EpochCommitter(path, "sid", None, False)
    fresh(_ids(spark, 7, 8), 7)
    assert current_version(spark, path) == 30
    fresh(_ids(spark, 30, 31), 30)
    assert current_version(spark, path) == 31


def test_metadata_plane_over_uri_store(spark, tmp_path, monkeypatch):
    """The pointer, cadence, retention, and rename path exercise
    DIFFERENT code on URI stores (HadoopFS: FileContext renames, JVM
    globs) than on LocalFS — drive the whole round-trip over a file://
    URI so the s3a/hdfs-shaped path is covered, not just os.rename."""
    from es_analytics_spark.txlog import rename_column

    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 5)
    path = "file://" + str(tmp_path / "t")
    append(spark, path, _ids(spark, 0, 10))
    for i in range(5):  # cross the cadence: auto checkpoint + pointer
        set_table_properties(spark, path, {f"k{i}": "x"})
    fs = txlog.lake_fs(spark, path)
    hint = txlog._checkpoint_hint(fs, path)
    assert hint >= 5
    append(spark, path, _ids(spark, 10, 20))
    rename_column(spark, path, "id", "event_id")
    assert read_table(spark, path).columns == ["event_id"]
    vacuum(spark, path, keep_versions=2, retention_seconds=0)
    res = clean_log(spark, path, keep_versions=2)
    assert res["cut"] >= 5 and res["removed_commits"] >= 5
    got = read_table(spark, path)
    assert got.count() == 20
    assert got.select(F.sum("event_id")).first()[0] == sum(range(20))
    with pytest.raises(VersionExpiredError):
        read_table(spark, path, version=1)
    assert len(table_properties(spark, path)) == 5


def test_clean_log_races_contending_writers(spark, tmp_path):
    """Retention runs while writers commit: clean_log must never break a
    concurrent append's CAS loop or a reader's replay — the pointer is
    advanced before any deletion, so readers route through the surviving
    checkpoint. Final history is gap-free above the cut and every row
    survives."""
    import threading

    path = str(tmp_path / "t")
    append(spark, path, _ids(spark, 0, 10))
    errs = []

    def writer(w: int) -> None:
        try:
            for i in range(6):
                append(
                    spark, path,
                    _ids(spark, 1000 * w + i * 10, 1000 * w + i * 10 + 10),
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    def cleaner() -> None:
        try:
            for _ in range(8):
                checkpoint(spark, path)
                clean_log(spark, path, keep_versions=3)
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    threads.append(threading.Thread(target=cleaner))
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = read_table(spark, path)
    assert got.count() == 10 + 2 * 60
    # retained history is contiguous and replays clean
    vs = [h["version"] for h in history(spark, path)]
    assert vs == list(range(vs[0], vs[-1] + 1))


def test_restore_across_rename_restores_old_schema(spark, tmp_path):
    from es_analytics_spark.txlog import rename_column, restore

    path = str(tmp_path / "t")
    append(spark, path, _ids(spark, 0, 10))  # v1
    rename_column(spark, path, "id", "event_id")  # v2
    append(
        spark, path,
        _ids(spark, 10, 20).withColumnRenamed("id", "event_id"),
    )  # v3
    restore(spark, path, 1)  # v4: undo both the rename and the append
    got = read_table(spark, path)
    assert got.columns == ["id"] and got.count() == 10
    # the rename is still visible at its own version (history preserved)
    assert read_table(spark, path, version=3).columns == ["event_id"]
    # and the table can rename again afterwards
    rename_column(spark, path, "id", "uid")
    assert read_table(spark, path).columns == ["uid"]


# ---------------------------------------------------------------------------
# round-9 self-review fixes
# ---------------------------------------------------------------------------


def test_legacy_basename_dv_vectors_still_filter(spark, tmp_path):
    """Deletion vectors written before the part-relative key change
    store bare file basenames; the reader must honor BOTH formats (the
    two are disjoint — new keys always contain '/'), never silently
    match nothing and resurrect legacy-deleted rows."""
    from es_analytics_spark.txlog import delete_where

    path = str(tmp_path / "t")
    append(spark, path, spark.range(0, 100).coalesce(1))
    r = delete_where(spark, path, "id < 30", use_dv=True)
    assert r["parts_vectored"] == 1
    # rewrite the vector into the LEGACY format (strip the part prefix)
    dv_dirs = [
        d for d in os.listdir(os.path.join(path, "parts")) if d.startswith("dv-")
    ]
    assert len(dv_dirs) == 1
    dv_dir = os.path.join(path, "parts", dv_dirs[0])
    dv = spark.read.parquet(dv_dir).collect()
    legacy = spark.createDataFrame(
        [(r["dv_file"].split("/")[-1], r["dv_idx"]) for r in dv],
        "dv_file string, dv_idx long",
    )
    for f in os.listdir(dv_dir):
        os.remove(os.path.join(dv_dir, f))
    legacy.coalesce(1).write.mode("overwrite").parquet(dv_dir)
    got = sorted(x["id"] for x in read_table(spark, path).collect())
    assert got == list(range(30, 100))


def test_clean_log_refuses_when_pointer_cannot_advance(spark, tmp_path, monkeypatch):
    """Deleting commits the pointer does not cover would let
    current_version regress into the reaped range and a new append
    re-CREATE a reaped version number — clean_log must refuse."""
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    for i in range(3):
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10))
    checkpoint(spark, path)
    monkeypatch.setattr(txlog, "_advance_pointer", lambda *a, **k: False)
    with pytest.raises(RuntimeError, match="pointer"):
        clean_log(spark, path)
    assert os.path.exists(_commit_path(path, 1))  # nothing reaped
    assert read_table(spark, path, version=1).count() == 10


def test_append_conflicts_with_concurrent_drop_of_carried_column(
    spark, tmp_path, monkeypatch
):
    """A retrying append whose part was staged under the old mapping
    must NOT re-attach past a concurrent drop/rename of a column it
    carries — the re-merge would re-mint the dropped physical name and
    resurrect the dropped bytes."""
    from es_analytics_spark.txlog import CommitConflict, drop_column, rename_column

    path = str(tmp_path / "t")
    df0 = spark.createDataFrame([(1, 2.0)], "id long, val double")
    append(spark, path, df0)
    rename_column(spark, path, "val", "amount")  # mapping active

    real = txlog._try_commit
    state = {"dropped": False}

    def drop_then_commit(fs, p, version, payload):
        if payload.get("operation") == "append" and not state["dropped"]:
            state["dropped"] = True
            drop_column(spark, path, "amount")  # rival wins first
        return real(fs, p, version, payload)

    monkeypatch.setattr(txlog, "_try_commit", drop_then_commit)
    with pytest.raises(CommitConflict, match="renamed or dropped"):
        append(
            spark, path,
            spark.createDataFrame([(9, 9.0)], "id long, amount double"),
            evolve=True,
        )
    monkeypatch.setattr(txlog, "_try_commit", real)
    # the dropped column stayed dropped; re-running against the new
    # schema mints a FRESH physical id (old bytes stay invisible)
    append(
        spark, path,
        spark.createDataFrame([(9, 9.0)], "id long, amount double"),
        evolve=True,
    )
    got = read_table(spark, path)
    assert got.filter(F.col("amount").isNotNull()).count() == 1
    assert got.filter(F.col("id") == 1).first()["amount"] is None


def test_checkpoint_only_table_reads_and_resolves(spark, tmp_path, monkeypatch):
    """clean_log with cut == latest leaves ZERO commit JSONs — the
    checkpoint IS the snapshot: explicit-version reads, timestamp
    resolution, and new appends must all keep working."""
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    for i in range(3):
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10))
    checkpoint(spark, path)
    assert clean_log(spark, path)["removed_commits"] == 3
    assert _ids(spark, 0, 0).count() == 0  # touch spark
    assert sorted(
        os.listdir(os.path.join(path, "_txlog"))
    ) == ["_last_checkpoint", "checkpoint.v000003.json"]
    assert current_version(spark, path) == 3
    assert read_table(spark, path).count() == 30
    assert read_table(spark, path, version=3).count() == 30  # explicit pin
    with pytest.raises(VersionExpiredError):
        read_table(spark, path, version=2)
    assert version_at_timestamp(spark, path, time.time()) == 3
    append(spark, path, _ids(spark, 30, 40))  # the log grows back
    assert current_version(spark, path) == 4
    assert read_table(spark, path).count() == 40


def test_batch_feeds_raise_version_expired_past_retention(spark, tmp_path, monkeypatch):
    from es_analytics_spark.txlog import iter_changes, table_changes, table_changes_cdf

    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    for i in range(4):
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10))
    checkpoint(spark, path)
    append(spark, path, _ids(spark, 40, 50))
    clean_log(spark, path, keep_versions=1)
    for fn in (table_changes, table_changes_cdf):
        with pytest.raises(VersionExpiredError, match="log retention"):
            fn(spark, path, 0)
    with pytest.raises(VersionExpiredError, match="log retention"):
        iter_changes(spark, path, 0)
    # windows inside retention still feed
    assert table_changes(spark, path, 4).count() == 10


def test_optimize_runs_log_retention_from_committed_policy(spark, tmp_path, monkeypatch):
    from es_analytics_spark.txlog import optimize

    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    set_table_properties(spark, path, {
        "retention.keep_versions": "3",
        "retention.seconds": "0",
        "retention.log_keep_versions": "3",
    })
    for i in range(8):
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10))
    res = optimize(spark, path, vacuum_after=True)
    # the only checkpoint sits at latest — correctly NOT a cut while
    # keep_versions=3 still needs the commits behind it
    assert res["clean_log"]["cut"] == 0
    ck1 = res["checkpoint"]["version"]
    for i in range(8, 12):  # commit past the checkpoint
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10))
    res = optimize(spark, path, vacuum_after=True)
    assert res["clean_log"]["cut"] == ck1
    assert res["clean_log"]["removed_commits"] == ck1
    latest = current_version(spark, path)
    assert read_table(spark, path).count() == 120
    assert read_table(spark, path, version=latest).count() == 120
    with pytest.raises(VersionExpiredError):
        read_table(spark, path, version=2)


# ---------------------------------------------------------------------------
# round-10 ADVICE fixes: concurrent log retention surfaces the curated
# VersionExpiredError on EVERY walk/retry read path, never a bare
# FileNotFoundError
# ---------------------------------------------------------------------------


def test_folded_state_reads_below_cut_raise_version_expired(
    spark, tmp_path, monkeypatch
):
    """txn_version / table_properties / table_sources with an explicit
    version below the retention cut: the folded checkpoint cannot answer
    (it sits above the requested version) and the commits are reaped —
    the read must raise VersionExpiredError, not FileNotFoundError."""
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    for i in range(4):  # v1..v4
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10),
               sources=[f"s{i}"], since_version=i, txn=("app", i))
    checkpoint(spark, path)
    append(spark, path, _ids(spark, 40, 50))  # v5
    assert clean_log(spark, path, keep_versions=1)["cut"] == 4

    for probe in (
        lambda: table_sources(spark, path, version=2),
        lambda: table_properties(spark, path, version=2),
        lambda: txlog.txn_version(spark, path, "app", version=2),
    ):
        with pytest.raises(VersionExpiredError, match="log retention"):
            probe()
    # at/above the cut the folded state still answers
    assert table_sources(spark, path, version=4) == {f"s{i}" for i in range(4)}
    assert txlog.txn_version(spark, path, "app", version=4) == 3


def test_intervening_conflict_scan_raises_curated_expiry(
    spark, tmp_path, monkeypatch
):
    """The CAS loser's _intervening scan racing a clean_log reap gets
    the curated expiry error (re-run against fresh state), not a raw
    filesystem failure mid-retry-loop."""
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    for i in range(3):
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10))
    checkpoint(spark, path)
    append(spark, path, _ids(spark, 30, 40))  # v4
    clean_log(spark, path, keep_versions=1)  # reaps v1..v3
    with pytest.raises(VersionExpiredError, match="log retention"):
        txlog._intervening(LocalFS(), path, 0, 3)


def test_version_at_timestamp_concurrent_reap_is_curated(
    spark, tmp_path, monkeypatch
):
    """version_at_timestamp's commit loop walks a listing that a
    concurrent clean_log can invalidate mid-call: simulate the race with
    a stale listing and assert the curated error."""
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    for i in range(3):
        append(spark, path, _ids(spark, i * 10, (i + 1) * 10))
    checkpoint(spark, path)
    append(spark, path, _ids(spark, 30, 40))  # v4
    stale = txlog._list_versions(LocalFS(), path)  # [1, 2, 3, 4]
    clean_log(spark, path, keep_versions=1)  # reaps v1..v3 "concurrently"
    real = txlog._list_versions
    monkeypatch.setattr(
        txlog, "_list_versions",
        lambda fs, p, prefix="v": stale if prefix == "v" else real(fs, p, prefix),
    )
    with pytest.raises(VersionExpiredError, match="log retention"):
        version_at_timestamp(spark, path, time.time())


def test_refresh_table_remembers_registration_path(spark, tmp_path):
    """round-10 fix: register_table records the name→path binding, so
    refresh_table needs only the name; unregistered names still demand
    an explicit path."""
    path = str(tmp_path / "t")
    append(spark, path, _ids(spark, 0, 10))
    register_table(spark, "reg_t", path)
    n0 = spark.sql("SELECT COUNT(*) FROM reg_t").first()[0]
    append(spark, path, _ids(spark, 10, 15))
    assert spark.sql("SELECT COUNT(*) FROM reg_t").first()[0] == n0  # pinned
    txlog.refresh_table(spark, "reg_t")  # no path needed
    assert spark.sql("SELECT COUNT(*) FROM reg_t").first()[0] == n0 + 5
    with pytest.raises(ValueError, match="not registered"):
        txlog.refresh_table(spark, "never_registered")
