"""Column mapping: rename/drop schema evolution WITHOUT data rewrite
(the public Delta column-mapping design, name-mapping mode). Logical
names live in the committed schema; immutable physical names live in
the parquet bytes; protocol 3 guards v<=2 readers from nulling renamed
columns."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row, functions as F

from es_analytics_spark import txlog
from es_analytics_spark.txlog import (
    CommitConflict,
    ProtocolVersionError,
    SchemaMismatchError,
    append,
    checkpoint,
    clean_log,
    compact,
    current_version,
    delete_where,
    drop_column,
    merge_upsert,
    read_table,
    rename_column,
    table_changes_cdf,
    table_schema,
)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [Row(id=i, val=float(i), tag=f"t{i % 3}") for i in range(lo, hi)]
    )


def test_rename_roundtrip_time_travel_and_writes(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, _df(spark, 0, 20))  # v1
    rename_column(spark, path, "val", "amount")  # v2

    got = read_table(spark, path)
    assert set(got.columns) == {"id", "amount", "tag"}
    assert got.select(F.sum("amount")).first()[0] == float(sum(range(20)))
    # time travel reads the OLD name at the old version
    old = read_table(spark, path, version=1)
    assert set(old.columns) == {"id", "val", "tag"}
    assert old.select(F.sum("val")).first()[0] == float(sum(range(20)))

    # new writes use the new logical name; physical layout is invisible
    append(spark, path, _df(spark, 20, 30).withColumnRenamed("val", "amount"))
    got = read_table(spark, path)
    assert got.count() == 30
    assert got.select(F.sum("amount")).first()[0] == float(sum(range(30)))
    # the old name is gone: a drifted writer errors honestly
    with pytest.raises(SchemaMismatchError, match="drift"):
        append(spark, path, _df(spark, 30, 40))
    # renaming to a taken / reserved name refuses
    with pytest.raises(SchemaMismatchError, match="already exists"):
        rename_column(spark, path, "tag", "amount")
    with pytest.raises(SchemaMismatchError, match="reserved"):
        rename_column(spark, path, "tag", "_f_path")


def test_rename_stamps_protocol_three_and_old_reader_refuses(
    spark, tmp_path, monkeypatch
):
    path = str(tmp_path / "t")
    append(spark, path, _df(spark, 0, 10))
    rename_column(spark, path, "val", "amount")
    c = json.loads(
        open(os.path.join(path, "_txlog", "v000002.json"), "rb").read()
    )
    assert c["protocol"] == 3
    # a pre-mapping reader must refuse, never silently null the column
    monkeypatch.setattr(txlog, "PROTOCOL_VERSION", 2)
    with pytest.raises(ProtocolVersionError, match="protocol 3"):
        read_table(spark, path)
    # but the pre-rename history stays readable to it
    assert read_table(spark, path, version=1).count() == 10


def test_drop_then_readd_never_resurrects_dropped_bytes(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, _df(spark, 0, 10))  # v1
    drop_column(spark, path, "val")  # v2
    got = read_table(spark, path)
    assert set(got.columns) == {"id", "tag"}
    # time travel still shows the dropped column
    assert read_table(spark, path, version=1).select(F.sum("val")).first()[0] == 45.0
    # re-add the same logical name: fresh physical identity — old parts
    # read it as NULL, never as the dropped bytes
    append(
        spark, path,
        spark.createDataFrame([Row(id=100, tag="x", val=7.5)]),
        evolve=True,
    )  # v3
    got = read_table(spark, path)
    assert got.count() == 11
    assert got.filter(F.col("val").isNotNull()).count() == 1
    assert got.filter(F.col("id") == 100).first()["val"] == 7.5
    # last-column drop refuses
    p2 = str(tmp_path / "one")
    append(spark, p2, spark.range(0, 3))
    with pytest.raises(SchemaMismatchError, match="last column"):
        drop_column(spark, p2, "id")


def test_zone_maps_survive_rename(spark, tmp_path):
    path = str(tmp_path / "t")
    for lo in (0, 100, 200):
        append(
            spark, path,
            spark.range(lo, lo + 100).select(F.col("id").cast("long")),
            stats_cols=["id"],
        )
    rename_column(spark, path, "id", "event_id")
    got = read_table(spark, path, range_filter={"event_id": (150, 160)})
    assert sorted(r["event_id"] for r in got.collect()) == list(range(150, 161))
    # pruning still works: only the middle part is scanned
    files = got.inputFiles()
    assert len({f.rsplit("/parts/", 1)[1].split("/")[0] for f in files}) == 1


def test_rowlevel_ops_and_compact_on_mapped_table(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, _df(spark, 0, 30))
    rename_column(spark, path, "val", "amount")
    # rewrite delete under the new name
    r = delete_where(spark, path, "amount < 5.0")
    assert r["rows_deleted"] == 5
    # DV delete under the new name
    r = delete_where(spark, path, "amount >= 25.0", use_dv=True)
    assert r["rows_deleted"] == 5
    assert read_table(spark, path).count() == 20
    # merge on the renamed key space
    up = spark.createDataFrame(
        [Row(id=10, amount=1000.0, tag="z"), Row(id=999, amount=9.0, tag="n")]
    )
    m = merge_upsert(spark, path, up, keys=["id"])
    assert m["rows_updated"] == 1 and m["rows_inserted"] == 1
    got = read_table(spark, path)
    assert got.filter(F.col("id") == 10).first()["amount"] == 1000.0
    # compact materializes DVs away and normalizes parts — still mapped
    compact(spark, path)
    got = read_table(spark, path)
    assert got.count() == 21
    assert got.filter(F.col("id") == 999).first()["amount"] == 9.0
    assert set(got.columns) == {"id", "amount", "tag"}


def test_cdf_window_spanning_rename_is_uniform(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, _df(spark, 0, 10))  # v1
    rename_column(spark, path, "val", "amount")  # v2
    append(spark, path, _df(spark, 10, 20).withColumnRenamed("val", "amount"))  # v3
    delete_where(spark, path, "amount = 3.0")  # v4
    feed = table_changes_cdf(spark, path, 0)
    # one uniform frame under the window-END names, physical identity
    # joining the pre-rename inserts to the post-rename ones
    assert "amount" in feed.columns and "val" not in feed.columns
    ins = feed.filter(F.col("_change_type") == "insert")
    assert ins.count() == 20
    assert ins.select(F.sum("amount")).first()[0] == float(sum(range(20)))
    dels = feed.filter(F.col("_change_type") == "delete").collect()
    assert [r["amount"] for r in dels] == [3.0]


def test_rollup_maintenance_across_rename(spark, tmp_path):
    from es_analytics_spark.incremental import maintain_rollup, read_rollup

    src = str(tmp_path / "src")
    roll = str(tmp_path / "roll")
    append(spark, src, _df(spark, 0, 10))
    maintain_rollup(spark, src, roll, keys=["tag"], measures={"s": ("sum", "val")})
    rename_column(spark, src, "val", "amount")
    append(spark, src, _df(spark, 10, 20).withColumnRenamed("val", "amount"))
    # the maintainer's measure column follows the rename
    maintain_rollup(spark, src, roll, keys=["tag"], measures={"s": ("sum", "amount")})
    got = {r["tag"]: r["s"] for r in read_rollup(spark, roll).collect()}
    exp = {}
    for i in range(20):
        exp[f"t{i % 3}"] = exp.get(f"t{i % 3}", 0.0) + float(i)
    assert got == exp


def test_checkpoint_and_clean_log_preserve_mapping(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    append(spark, path, _df(spark, 0, 10))
    rename_column(spark, path, "val", "amount")
    append(spark, path, _df(spark, 10, 20).withColumnRenamed("val", "amount"))
    ck = checkpoint(spark, path)
    assert ck["version"] == 3
    # the checkpoint carries the mapped-schema protocol guard
    raw = json.loads(
        open(os.path.join(path, "_txlog", "checkpoint.v000003.json"), "rb").read()
    )
    assert raw["protocol"] == 3
    clean_log(spark, path)
    got = read_table(spark, path)
    assert set(got.columns) == {"id", "amount", "tag"} and got.count() == 20
    sch = table_schema(spark, path)
    amount = next(f for f in sch.fields if f.name == "amount")
    assert amount.metadata.get("cm.phys") == "val"
    # writes against the folded mapped schema still route to physical
    append(spark, path, _df(spark, 20, 25).withColumnRenamed("val", "amount"))
    assert read_table(spark, path).select(F.sum("amount")).first()[0] == float(
        sum(range(25))
    )


def test_streaming_source_over_mapped_table_and_restart_on_rename(spark, tmp_path):
    from es_analytics_spark.sources.txlog_source import register_txlog_feed

    register_txlog_feed(spark)
    path = str(tmp_path / "t")
    append(spark, path, _df(spark, 0, 10))  # v1
    rename_column(spark, path, "val", "amount")  # v2
    append(spark, path, _df(spark, 10, 20).withColumnRenamed("val", "amount"))  # v3

    def run(ckpt):
        rows = []
        q = (
            spark.readStream.format("txlog_feed").option("path", path).load()
            .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
            .option("checkpointLocation", os.path.join(str(tmp_path), ckpt))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        return q, rows

    # a fresh stream plans the CURRENT (renamed) schema and reads the
    # pre-rename parts through the physical mapping
    q, rows = run("ck1")
    assert q.exception() is None
    assert sorted(r.amount for r in rows) == [float(i) for i in range(20)]

    # a rename mid-history does NOT strand the stream: physical identity
    # joins the planned schema to every window; the resumed run re-plans
    # under the CURRENT names and its window may span the rename commit
    rename_column(spark, path, "amount", "value2")  # v4
    append(
        spark, path,
        _df(spark, 20, 25).withColumnRenamed("val", "value2"),
    )  # v5
    q2, rows2 = run("ck1")  # resumes from v3; window (3,5] covers the rename
    assert q2.exception() is None
    assert sorted(r.value2 for r in rows2) == [float(i) for i in range(20, 25)]
    # a fresh plan streams the whole history under the new name
    q3, rows3 = run("ck2")
    assert q3.exception() is None
    assert sorted(r.value2 for r in rows3) == [float(i) for i in range(25)]


def test_concurrent_same_name_evolution_mint_conflict(spark, tmp_path):
    """Two writers concurrently adding the SAME logical column on a
    mapped table mint different physical ids — the loser must conflict
    (its part bytes are unreadable under the winner's identity), never
    silently union."""
    from es_analytics_spark.txlog import _union_schema_json

    path = str(tmp_path / "t")
    append(spark, path, _df(spark, 0, 5))
    drop_column(spark, path, "val")  # enters mapping mode
    a = txlog._committed_schema(txlog.lake_fs(spark, path), path, 2)
    df_new = spark.createDataFrame([Row(id=9, tag="x", extra=1.0)])
    sj_a = txlog._merge_schema(a, df_new, evolve=True)
    sj_b = txlog._merge_schema(a, df_new, evolve=True)
    with pytest.raises(SchemaMismatchError, match="physical ids"):
        _union_schema_json(sj_a, sj_b)
    # and the retrying-writer path: a re-merge that finds the column
    # committed under a different physical id raises CommitConflict
    mint_a = {f["name"]: txlog._phys_name(f) for f in sj_a["fields"]}
    with pytest.raises(CommitConflict, match="physical id"):
        txlog._merge_schema(sj_b, df_new, evolve=True, mint=mint_a)
