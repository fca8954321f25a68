"""A SQL-first session over a transactional txlog table.

The whole lifecycle without touching the Python verbs after setup:
register the table once, then SELECT / INSERT / DELETE / MERGE through
``execute_sql`` — every statement routed to the transactional API
(atomic commits, conflict rules, row-level change feed), with the
registered view re-pinned after each write so the session reads its own
writes. The reference's lake exists to be queried
(/root/reference/README.md:3); this is the query-first face of it.

Run: PYTHONPATH=/root/repo python examples/sql_first_session.py
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from es_analytics_spark import execute_sql, get_spark, txlog


def main() -> None:
    spark = get_spark("sql-first-session")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    base = tempfile.mkdtemp(prefix="sql_dml_")
    table = os.path.join(base, "orders_tx")
    try:
        orders = (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
            .limit(1000)
        )
        txlog.append(spark, table, orders)
        txlog.register_table(spark, "orders_tx", table)

        n0 = execute_sql(spark, "SELECT COUNT(*) AS n FROM orders_tx").first()["n"]
        print(f"registered orders_tx with {n0} rows")

        r = execute_sql(
            spark,
            "INSERT INTO orders_tx VALUES "
            "(9000001, 1, 42.5, 'O'), (9000002, 2, 99.0, 'F')",
        )
        print(f"INSERT committed v{r['version']}; "
              f"count={execute_sql(spark, 'SELECT COUNT(*) FROM orders_tx').first()[0]}")

        r = execute_sql(spark, "DELETE FROM orders_tx WHERE o_orderstatus = 'F'")
        print(f"DELETE removed {r['rows_deleted']} rows at v{r['version']}")

        # CDC-shaped MERGE: one update, one tombstone, one brand-new row
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
            WHEN MATCHED THEN UPDATE SET *
            WHEN NOT MATCHED AND NOT s._deleted THEN INSERT *
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

        feed = txlog.table_changes_cdf(
            spark, table, merge_version - 1, merge_version
        )
        print("change feed for the merge:",
              sorted((x["o_orderkey"], x["_change_type"])
                     for x in feed.select("o_orderkey", "_change_type").collect()))

        hist = [h["operation"] for h in txlog.history(spark, table)]
        print(f"history: {hist}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
