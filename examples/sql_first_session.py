"""A SQL-first session over a transactional txlog table — ZERO Python
txlog calls.

The whole lifecycle in SQL: CTAS bootstrap (``CREATE TABLE … USING
txlog LOCATION … AS SELECT``), SELECT / INSERT / DELETE / UPDATE /
full-grammar MERGE, time-travel ``SELECT … VERSION AS OF``, the
``table_changes('t', a, b)`` change-feed TVF spelling, DESCRIBE
HISTORY, RESTORE, OPTIMIZE, VACUUM — every statement routed through
``execute_sql`` to the transactional API (atomic commits, conflict
rules, row-level change feed), with the registered view re-pinned
after each write so the session reads its own writes. The reference's
lake exists to be queried (/root/reference/README.md:3); this is the
query-first face of it.

Run: PYTHONPATH=/root/repo python examples/sql_first_session.py
"""

from __future__ import annotations

import os
import shutil
import tempfile

from es_analytics_spark import execute_sql, get_spark


def main() -> None:
    spark = get_spark("sql-first-session")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    base = tempfile.mkdtemp(prefix="sql_dml_")
    table = os.path.join(base, "orders_tx")
    try:
        # SQL-first bootstrap: CTAS straight from the parquet source —
        # no Python txlog.append / register_table needed
        r = execute_sql(spark, f"""
            CREATE TABLE orders_tx USING txlog LOCATION '{table}'
            AS SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
               FROM parquet.`{os.path.join(sf_dir, "orders.parquet")}`
               LIMIT 1000
        """)
        n0 = execute_sql(spark, "SELECT COUNT(*) AS n FROM orders_tx").first()["n"]
        print(f"CTAS v{r['version']}: orders_tx with {n0} rows")

        r = execute_sql(
            spark,
            "INSERT INTO orders_tx VALUES "
            "(9000001, 1, 42.5, 'O'), (9000002, 2, 99.0, 'F')",
        )
        print(f"INSERT committed v{r['version']}; "
              f"count={execute_sql(spark, 'SELECT COUNT(*) FROM orders_tx').first()[0]}")

        r = execute_sql(spark, "DELETE FROM orders_tx WHERE o_orderstatus = 'F'")
        print(f"DELETE removed {r['rows_deleted']} rows at v{r['version']}")

        # CDC-shaped MERGE with the full grammar: a tombstone DELETE, a
        # column-level conditional UPDATE reading BOTH rows, an INSERT
        # with an explicit column list, and a BY SOURCE no-op guard
        spark.createDataFrame(
            [(9000001, 1, 50.0, "O", False),
             (9000002, 2, 0.0, "F", True),      # tombstone for a deleted key: dropped
             (9000003, 3, 10.0, "O", False)],
            "o_orderkey long, o_custkey long, o_totalprice double, "
            "o_orderstatus string, _deleted boolean",
        ).createOrReplaceTempView("cdc_batch")
        r = execute_sql(spark, """
            MERGE INTO orders_tx t USING cdc_batch s
            ON t.o_orderkey = s.o_orderkey
            WHEN MATCHED AND s._deleted THEN DELETE
            WHEN MATCHED THEN UPDATE SET
                o_totalprice = s.o_totalprice + t.o_totalprice * 0,
                o_orderstatus = s.o_orderstatus
            WHEN NOT MATCHED AND NOT s._deleted THEN
                INSERT (o_orderkey, o_custkey, o_totalprice, o_orderstatus)
                VALUES (s.o_orderkey, s.o_custkey, s.o_totalprice, s.o_orderstatus)
        """)
        merge_version = r["version"]
        print(f"MERGE v{merge_version}: updated={r['rows_updated']} "
              f"inserted={r['rows_inserted']} deleted={r['rows_deleted']}")

        upd = execute_sql(
            spark,
            "SELECT o_totalprice FROM orders_tx WHERE o_orderkey = 9000001",
        ).first()[0]
        print(f"read-your-writes: o_orderkey=9000001 now {upd}")

        r = execute_sql(
            spark,
            "UPDATE orders_tx SET o_totalprice = o_totalprice * 1.1 "
            "WHERE o_orderkey >= 9000000",
        )
        print(f"UPDATE v{r['version']}: bumped {r['rows_updated']} rows")

        # time-travel SELECT: the snapshot BEFORE the merge still has
        # the pre-update price, while the live view has the merged one
        old = execute_sql(spark, f"""
            SELECT COUNT(*) AS n FROM orders_tx VERSION AS OF {merge_version - 1}
        """).first()["n"]
        print(f"SELECT ... VERSION AS OF {merge_version - 1}: {old} rows (pre-merge)")

        # the row-level change feed of the merge, via the TVF spelling
        feed = execute_sql(spark, f"""
            SELECT o_orderkey, _change_type
            FROM table_changes('orders_tx', {merge_version - 1}, {merge_version})
            ORDER BY o_orderkey, _change_type
        """).collect()
        print("change feed for the merge:",
              [(x["o_orderkey"], x["_change_type"]) for x in feed])

        execute_sql(spark, "ALTER TABLE orders_tx RENAME COLUMN o_totalprice TO amount")
        execute_sql(spark, "ALTER TABLE orders_tx ALTER COLUMN o_custkey TYPE bigint")
        top = execute_sql(
            spark,
            "SELECT o_orderkey, amount FROM orders_tx ORDER BY amount DESC LIMIT 1",
        ).first()
        print(f"after rename+widen: top order {top['o_orderkey']} at {round(top['amount'], 2)}")

        r = execute_sql(spark, "OPTIMIZE orders_tx")
        print(f"OPTIMIZE: {r['compact']['parts_before']} parts -> "
              f"{r['compact']['parts_after']}")
        r = execute_sql(spark, "VACUUM orders_tx RETAIN 0 HOURS")
        print(f"VACUUM reaped {r['reaped']} unreferenced part(s)")

        r = execute_sql(
            spark, f"RESTORE TABLE orders_tx TO VERSION AS OF {merge_version}"
        )
        n_restored = execute_sql(spark, "SELECT COUNT(*) FROM orders_tx").first()[0]
        print(f"RESTORE to v{merge_version}: {n_restored} rows, "
              f"committed v{r['version']}")

        hist = [(x["version"], x["operation"])
                for x in execute_sql(spark, "DESCRIBE HISTORY orders_tx").collect()]
        print(f"history: {[op for _, op in hist]}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
