"""Type-widening evolution (round-10 ask #4): the public Delta
type-widening matrix on the txlog — implicit widening via
``append(evolve=True)`` with a wider frame, the explicit
:func:`txlog.widen_column`, narrower writes into wider columns, old
parts read through Spark 4's parquet widening scan, CDF/time-travel/
colmap/zone-map/streaming interplay, and the protocol argument (no
bump — an incapable engine fails loudly, never silently misreads)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_analytics_spark import txlog
from es_analytics_spark.txlog import (
    SchemaMismatchError,
    _union_schema_json,
    _widens_to,
    append,
    checkpoint,
    clean_log,
    current_version,
    read_table,
    table_changes_cdf,
    table_schema,
    widen_column,
)


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").cast("int").alias("v"))


def _longs(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("v"))


def test_widening_matrix():
    """The lattice itself: lossless promotions only."""
    assert _widens_to("byte", "short") and _widens_to("short", "integer")
    assert _widens_to("integer", "long") and _widens_to("byte", "long")
    assert _widens_to("float", "double") and _widens_to("integer", "double")
    assert not _widens_to("long", "integer")  # narrowing
    assert not _widens_to("long", "double")   # lossy past 2^53
    assert not _widens_to("double", "float")
    assert not _widens_to("string", "long")
    assert _widens_to("decimal(5,2)", "decimal(7,2)")
    assert _widens_to("decimal(5,2)", "decimal(10,4)")
    assert not _widens_to("decimal(5,2)", "decimal(5,3)")  # digits shrink
    assert not _widens_to("decimal(10,4)", "decimal(5,2)")
    assert _widens_to("date", "timestamp_ntz")


def test_append_evolve_widens_and_old_parts_upcast(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, _ints(spark, 0, 10))  # v1: int
    # wider frame without evolve: refused with the widening remedy named
    with pytest.raises(SchemaMismatchError, match="evolve=True"):
        append(spark, path, _longs(spark, 10, 20))
    append(spark, path, _longs(spark, 10, 20), evolve=True)  # v2: widens
    sch = table_schema(spark, path)
    assert sch["v"].dataType.simpleString() == "bigint"
    got = read_table(spark, path)
    assert dict(got.dtypes)["v"] == "bigint"
    assert got.count() == 20
    assert got.agg(F.sum("v")).first()[0] == sum(range(20))
    # values past int range land fine after the widening
    append(spark, path, spark.createDataFrame([(2**40,)], "v long"))
    assert read_table(spark, path).agg(F.max("v")).first()[0] == 2**40
    # time travel reads v1 under ITS committed (narrow) type
    assert dict(read_table(spark, path, version=1).dtypes)["v"] == "int"


def test_narrower_write_into_wider_column_needs_no_evolve(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, _longs(spark, 0, 10))  # committed long
    append(spark, path, _ints(spark, 10, 20))  # int part, no evolve needed
    sch = table_schema(spark, path)
    assert sch["v"].dataType.simpleString() == "bigint"  # unchanged
    got = read_table(spark, path)
    assert got.count() == 20 and dict(got.dtypes)["v"] == "bigint"
    assert got.agg(F.sum("v")).first()[0] == sum(range(20))


def test_non_widening_type_change_still_never_allowed(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, _ints(spark, 0, 10))
    with pytest.raises(SchemaMismatchError, match="never"):
        append(
            spark, path,
            spark.range(1).select(F.lit("x").alias("v")),
            evolve=True,
        )


def test_widen_column_explicit(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, _ints(spark, 0, 10))  # v1
    r = widen_column(spark, path, "v", "bigint")  # alias spelling
    assert r["version"] == 2
    assert table_schema(spark, path)["v"].dataType.simpleString() == "bigint"
    # idempotent: no new commit
    assert widen_column(spark, path, "v", "long")["version"] == 2
    assert current_version(spark, path) == 2
    # narrowing / unknown column / non-widening all refused
    with pytest.raises(SchemaMismatchError, match="not a lossless widening"):
        widen_column(spark, path, "v", "int")
    with pytest.raises(SchemaMismatchError, match="no column"):
        widen_column(spark, path, "nope", "long")
    # a post-widen narrow append still lands (upcast on read)
    append(spark, path, _ints(spark, 10, 20))
    assert read_table(spark, path).agg(F.sum("v")).first()[0] == sum(range(20))


def test_widen_decimal_and_float(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(3).select(
        F.col("id").cast("float").alias("f"),
        F.expr("cast(id * 1.25 as decimal(5,2))").alias("d"),
    )
    append(spark, path, df)
    widen_column(spark, path, "f", "double")
    widen_column(spark, path, "d", "decimal(12,4)")
    got = read_table(spark, path)
    assert dict(got.dtypes) == {"f": "double", "d": "decimal(12,4)"}
    assert got.agg(F.sum("f")).first()[0] == 3.0
    assert float(got.agg(F.sum("d")).first()[0]) == 3.75


def test_widen_interplay_colmap_zonemap_cdf(spark, tmp_path):
    """rename → widen → DV-delete chain: zone maps on the renamed+
    widened column still prune exactly, and a CDF window spanning the
    widening presents ONE uniform wide type with window-end names."""
    from es_analytics_spark.txlog import delete_where, rename_column

    path = str(tmp_path / "t")
    append(
        spark, path,
        spark.range(0, 100).select(F.col("id").cast("int").alias("amt")),
        stats_cols=["amt"],
    )  # v1
    rename_column(spark, path, "amt", "amount")  # v2
    widen_column(spark, path, "amount", "long")  # v3
    append(
        spark, path,
        spark.range(1000, 1100).select(F.col("id").alias("amount")),
        stats_cols=["amount"],
    )  # v4
    delete_where(spark, path, "amount = 5", use_dv=True)  # v5
    # zone maps: disjoint range over the pre-rename/pre-widen part skips
    got = read_table(spark, path, range_filter={"amount": (1000, 1010)})
    assert got.count() == 11
    got = read_table(spark, path, range_filter={"amount": (0, 10)})
    assert got.count() == 10  # 0..10 minus the DV-deleted 5
    # CDF across rename + widen: uniform window-end name and wide type
    feed = table_changes_cdf(spark, path, 0)
    assert dict(feed.dtypes)["amount"] == "bigint"
    ins = feed.filter(F.col("_change_type") == "insert")
    assert ins.count() == 200
    assert ins.agg(F.max("amount")).first()[0] == 1099
    dels = feed.filter(F.col("_change_type") == "delete")
    assert [r["amount"] for r in dels.collect()] == [5]


def test_widen_survives_checkpoint_fold_and_retention(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    path = str(tmp_path / "t")
    append(spark, path, _ints(spark, 0, 10))
    widen_column(spark, path, "v", "long")
    append(spark, path, _longs(spark, 10, 20))
    checkpoint(spark, path)
    assert clean_log(spark, path)["removed_commits"] == 3
    sch = table_schema(spark, path)
    assert sch["v"].dataType.simpleString() == "bigint"
    assert read_table(spark, path).agg(F.sum("v")).first()[0] == sum(range(20))
    # the validate path still works off the folded (wide) schema
    append(spark, path, _ints(spark, 20, 30))
    assert read_table(spark, path).count() == 30


def test_union_schema_resolves_widening_on_cas_reattach():
    a = {"type": "struct", "fields": [
        {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
    ]}
    b = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
    ]}
    # whichever side is wider wins; incompatible still raises
    assert _union_schema_json(a, b)["fields"][0]["type"] == "long"
    assert _union_schema_json(b, a)["fields"][0]["type"] == "long"
    c = {"type": "struct", "fields": [
        {"name": "k", "type": "string", "nullable": True, "metadata": {}},
    ]}
    with pytest.raises(SchemaMismatchError):
        _union_schema_json(a, c)


def test_stream_widening_requires_restart_then_reads_wide(spark, tmp_path):
    """A stream planned on the narrow schema fails AT PLAN TIME when its
    window covers the widening (restart remedy named); a restarted
    stream re-plans wide and reads pre-widening narrow parts upcast."""
    from es_analytics_spark.sources.txlog_source import register_txlog_feed

    register_txlog_feed(spark)
    import os

    path = os.path.join(str(tmp_path), "t")
    append(spark, path, _ints(spark, 0, 10))  # v1 (int)
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def drain(cp):
        rows: list = []
        q = (
            spark.readStream.format("txlog_feed").option("path", path).load()
            .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass
        return q, rows

    q, rows = drain(ckpt)  # consumes v1 under the int plan
    assert q.exception() is None and len(rows) == 10

    # freeze the narrow plan (a LIVE stream's schema is fixed at plan
    # time; an availableNow restart would re-plan wide, so the guard is
    # driven at the reader level)
    from es_analytics_spark.sources.txlog_source import TxLogFeedStreamReader

    narrow_schema = read_table(spark, path).schema
    widen_column(spark, path, "v", "long")  # v2
    append(spark, path, spark.createDataFrame([(2**40,)], "v long"))  # v3
    live = TxLogFeedStreamReader(narrow_schema, path, {})
    with pytest.raises(ValueError, match="restart the stream"):
        live.partitions({"version": 1}, {"version": 3})

    # resumed from the WAL (fresh plan = wide schema): the window past
    # the widening feeds, the wide row reads exactly
    q, rows = drain(ckpt)
    assert q.exception() is None
    assert sorted(r["v"] for r in rows) == [2**40]
    # a fully restarted stream re-reads everything: narrow v1 parts
    # upcast under the wide plan
    q, rows = drain(os.path.join(str(tmp_path), "ckpt2"))
    assert q.exception() is None
    assert sorted(r["v"] for r in rows) == list(range(10)) + [2**40]
