"""Adversarial cross-feature chain over the round-10 surfaces — the
judge-style end-to-end drive: every number asserted exactly.

rename → widen → chunked checkpoint → SQL UPDATE on the renamed+widened
column → SQL tombstone MERGE → DV delete → zone-map range reads over
pre-rename parts → CDF window across ALL of it (names, types, column
order) → restore with cdc → log retention at the checkpoint →
streaming source (cdf) spanning merge + delete + restore.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from es_analytics_spark import txlog
from es_analytics_spark.sqldml import execute_sql
from es_analytics_spark.txlog import (
    VersionExpiredError,
    append,
    checkpoint,
    clean_log,
    current_version,
    read_table,
    register_table,
    rename_column,
    restore,
    table_changes_cdf,
    widen_column,
)


@pytest.fixture(autouse=True)
def _chunked(monkeypatch):
    monkeypatch.setattr(txlog, "_CKPT_INLINE_MAX", 2)
    monkeypatch.setattr(txlog, "_CKPT_CHUNK_TARGET", 2)
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    txlog._CKPT_CACHE.clear()
    yield
    txlog._CKPT_CACHE.clear()


def test_round10_cross_feature_chain(spark, tmp_path):
    path = str(tmp_path / "t")
    # v1..v3: three int parts with zone maps (amt in [0,99], [100,199], [200,299])
    for lo in (0, 100, 200):
        append(
            spark, path,
            spark.range(lo, lo + 100).select(
                F.col("id").cast("int").alias("amt"),
                (F.col("id") % 5).cast("long").alias("grp"),
            ),
            stats_cols=["amt"],
        )
    rename_column(spark, path, "amt", "amount")        # v4 (protocol 3)
    widen_column(spark, path, "amount", "long")        # v5
    ck = checkpoint(spark, path)                       # chunked @ v5
    assert ck["version"] == 5 and ck["chunks_written"] >= 1
    register_table(spark, "chain_t", path)

    # v6: SQL UPDATE on the renamed+widened column over pre-rename parts
    r = execute_sql(
        spark, "UPDATE chain_t SET amount = amount + 1000000 WHERE amount < 3"
    )
    assert r["rows_updated"] == 3
    assert spark.sql(
        "SELECT COUNT(*) FROM chain_t WHERE amount >= 1000000"
    ).first()[0] == 3

    # v7: SQL tombstone MERGE — delete 100, update 101, insert 900,
    # drop a tombstone for a key that never existed
    spark.createDataFrame(
        [(100, 0, True), (101, 77, False), (900, 9, False), (555555, 0, True)],
        "amount long, grp long, _deleted boolean",
    ).createOrReplaceTempView("chain_cdc")
    r = execute_sql(spark, """
        MERGE INTO chain_t t USING chain_cdc s ON t.amount = s.amount
        WHEN MATCHED AND s._deleted THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED AND NOT s._deleted THEN INSERT *
    """)
    assert (r["rows_deleted"], r["rows_updated"], r["rows_inserted"]) == (1, 1, 1)
    merge_v = r["version"]

    # v8: DV delete on the widened column
    r = txlog.delete_where(spark, path, "amount = 250", use_dv=True)
    assert r["rows_deleted"] == 1 and r["parts_rewritten"] == 0

    # exact state: 300 rows - 1 merge-delete - 1 dv-delete + 1 insert
    got = read_table(spark, path)
    assert got.count() == 299
    assert dict(got.dtypes)["amount"] == "bigint"
    # zone maps survive rename+widen; the updated part's amount entry
    # was dropped (values changed), so range reads are exact, never
    # stale-envelope-pruned
    assert read_table(spark, path, range_filter={"amount": (1000000, None)}).count() == 3
    assert read_table(spark, path, range_filter={"amount": (200, 299)}).count() == 99
    assert {x["amount"] for x in read_table(
        spark, path, range_filter={"amount": (100, 102)}
    ).collect()} == {102, 101}  # 100 merge-deleted; 101 updated in place

    # CDF across rename+widen+update+merge+dv: window-end names, wide
    # type, metadata columns last
    feed = table_changes_cdf(spark, path, 3)
    assert feed.columns == ["amount", "grp", "_change_type", "_commit_version"]
    assert dict(feed.dtypes)["amount"] == "bigint"
    merge_feed = {
        (x["amount"], x["_change_type"])
        for x in feed.filter(F.col("_commit_version") == merge_v).collect()
    }
    assert merge_feed == {
        (100, "delete"), (101, "delete"), (101, "insert"), (900, "insert"),
    }

    # v9: restore to the pre-update snapshot (v5) — the chunked
    # checkpoint IS that snapshot; schema keeps the widened type
    restore(spark, path, 5, cdc=True)
    back = read_table(spark, path)
    assert back.count() == 300
    assert back.agg(F.sum("amount")).first()[0] == sum(range(300))
    assert dict(back.dtypes)["amount"] == "bigint"

    # retention: cut exactly at the checkpointed v5 — pre-rename history
    # expires, the mutation window stays streamable
    latest = current_version(spark, path)
    res = clean_log(spark, path, keep_versions=latest - 5)
    assert res["cut"] == 5 and res["removed_commits"] == 5
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 300
    with pytest.raises(VersionExpiredError):
        read_table(spark, path, version=2)

    # streaming source (cdf) from the merge onward, over the
    # chunk-checkpointed, retention-trimmed table: spans merge + dv
    # delete + cdc restore and matches the batch feed exactly
    from es_analytics_spark.sources.txlog_source import register_txlog_feed

    register_txlog_feed(spark)
    rows: list = []
    q = (
        spark.readStream.format("txlog_feed")
        .option("path", path)
        .option("starting_version", str(merge_v - 1))
        .option("cdf", "true")
        .load()
        .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None, q.exception()
    stream_multiset = sorted(
        (x["amount"], x["_change_type"], x["_commit_version"]) for x in rows
    )
    batch_multiset = sorted(
        (x["amount"], x["_change_type"], x["_commit_version"])
        for x in table_changes_cdf(spark, path, merge_v - 1).collect()
    )
    assert stream_multiset == batch_multiset
    assert {
        (a, c) for a, c, v in stream_multiset if v == merge_v
    } == merge_feed
