"""SQL-first table lifecycle (round-11 ask #2): CREATE TABLE / CTAS
``USING txlog``, time-travel ``SELECT … VERSION|TIMESTAMP AS OF``, and
the ``table_changes`` TVF spelling — a SQL session needs zero Python
txlog calls."""

from __future__ import annotations

import time

import pytest

from es_analytics_spark import txlog
from es_analytics_spark.sqldml import SqlDmlError, execute_sql
from es_analytics_spark.txlog import (
    CommitConflict,
    append,
    create_table,
    current_version,
    read_table,
    register_table,
)


def test_create_table_empty_then_dml(spark, tmp_path):
    path = str(tmp_path / "t")
    r = execute_sql(spark, f"""
        CREATE TABLE lc_t (k BIGINT, val STRING, x DOUBLE)
        USING txlog LOCATION '{path}'
        TBLPROPERTIES ('retention.keep_versions' = '7')
    """)
    assert r["operation"] == "create_table" and r["created"] is True
    # schema-stable empty read, both via SQL and the Python API
    assert spark.sql("SELECT * FROM lc_t").columns == ["k", "val", "x"]
    assert spark.sql("SELECT COUNT(*) FROM lc_t").first()[0] == 0
    assert txlog.table_properties(spark, path) == {"retention.keep_versions": "7"}
    # the declared schema gates writes from the first row
    execute_sql(spark, "INSERT INTO lc_t VALUES (1, 'a', 1.5)")
    assert spark.sql("SELECT COUNT(*) FROM lc_t").first()[0] == 1
    with pytest.raises(SqlDmlError, match="never evolves"):
        execute_sql(spark, "INSERT INTO lc_t (k, nope) VALUES (2, 'b')")
    # no placeholder part was written for the empty create
    hist = txlog.history(spark, path)
    assert hist[0]["operation"] == "create" and hist[0]["n_adds"] == 0


def test_create_table_if_not_exists_and_conflict(spark, tmp_path):
    path = str(tmp_path / "t")
    execute_sql(spark, f"CREATE TABLE lc_ine (k BIGINT) USING txlog LOCATION '{path}'")
    with pytest.raises(SqlDmlError, match="already exists|already has"):
        execute_sql(spark, f"CREATE TABLE lc_ine (k BIGINT) USING txlog LOCATION '{path}'")
    r = execute_sql(
        spark,
        f"CREATE TABLE IF NOT EXISTS lc_ine (k BIGINT) USING txlog LOCATION '{path}'",
    )
    assert r["created"] is False
    # Python API: CAS-arbitrated create
    with pytest.raises(ValueError, match="already has"):
        create_table(spark, path, "k bigint")
    with pytest.raises(ValueError, match="at least one column"):
        create_table(spark, str(tmp_path / "empty"), "")


def test_create_table_reserved_columns_refused(spark, tmp_path):
    with pytest.raises(txlog.SchemaMismatchError, match="reserved"):
        create_table(spark, str(tmp_path / "r"), "k long, _change_type string")


def test_ctas_and_or_replace(spark, tmp_path):
    path = str(tmp_path / "t")
    r = execute_sql(spark, f"""
        CREATE TABLE lc_ctas USING txlog LOCATION '{path}'
        AS SELECT id AS k, CAST(id AS DOUBLE) AS x FROM range(5)
    """)
    assert r["created"] is True
    assert spark.sql("SELECT SUM(k) FROM lc_ctas").first()[0] == 10
    with pytest.raises(SqlDmlError, match="already exists"):
        execute_sql(spark, f"""
            CREATE TABLE lc_ctas USING txlog LOCATION '{path}'
            AS SELECT id AS k, CAST(id AS DOUBLE) AS x FROM range(2)
        """)
    v_before = current_version(spark, path)
    r = execute_sql(spark, f"""
        CREATE OR REPLACE TABLE lc_ctas USING txlog LOCATION '{path}'
        AS SELECT id AS k, CAST(id AS DOUBLE) AS x FROM range(3)
    """)
    # OR REPLACE is a transactional overwrite: history survives
    assert r["version"] == v_before + 1
    assert spark.sql("SELECT COUNT(*) FROM lc_ctas").first()[0] == 3
    assert read_table(spark, path, version=v_before).count() == 5
    with pytest.raises(SqlDmlError, match="no column list"):
        execute_sql(spark, f"""
            CREATE OR REPLACE TABLE lc_ctas (k BIGINT) USING txlog
            LOCATION '{path}' AS SELECT 1L AS k
        """)


def test_create_table_non_txlog_passes_through(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS lc_parq")
    try:
        execute_sql(
            spark,
            f"CREATE TABLE lc_parq (k INT) USING parquet "
            f"LOCATION '{tmp_path / 'parq'}'",
        )
        assert spark.catalog.tableExists("lc_parq")
        assert txlog.registered_table_path(spark, "lc_parq") is None
    finally:
        spark.sql("DROP TABLE IF EXISTS lc_parq")


def test_select_version_as_of(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, spark.createDataFrame([(1, "a")], "k long, val string"))
    register_table(spark, "lc_tt", path)
    execute_sql(spark, "INSERT INTO lc_tt VALUES (2, 'b')")
    execute_sql(spark, "DELETE FROM lc_tt WHERE k = 1")
    assert spark.sql("SELECT COUNT(*) FROM lc_tt").first()[0] == 1
    assert execute_sql(
        spark, "SELECT COUNT(*) AS n FROM lc_tt VERSION AS OF 1"
    ).first()["n"] == 1
    assert execute_sql(
        spark, "SELECT COUNT(*) AS n FROM lc_tt VERSION AS OF 2"
    ).first()["n"] == 2
    # works at subquery depth and joined against the live view
    got = execute_sql(spark, """
        SELECT live.k FROM lc_tt live
        LEFT ANTI JOIN (SELECT k FROM lc_tt VERSION AS OF 1) old
        ON live.k = old.k
    """).collect()
    assert [r["k"] for r in got] == [2]
    with pytest.raises(SqlDmlError, match="integer version"):
        execute_sql(spark, "SELECT * FROM lc_tt VERSION AS OF abc")
    # an AS OF lookalike inside a string literal is data
    row = execute_sql(
        spark, "SELECT 'lc_tt VERSION AS OF 1' AS s FROM lc_tt LIMIT 1"
    ).first()
    assert row["s"] == "lc_tt VERSION AS OF 1"


def test_select_timestamp_as_of(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, spark.createDataFrame([(1,)], "k long"))
    register_table(spark, "lc_ts", path)
    time.sleep(0.05)
    mid = time.time()
    time.sleep(0.05)
    execute_sql(spark, "INSERT INTO lc_ts VALUES (2)")
    assert execute_sql(
        spark, f"SELECT COUNT(*) AS n FROM lc_ts TIMESTAMP AS OF {mid}"
    ).first()["n"] == 1
    # ISO-8601 string spelling
    import datetime as dt

    iso = dt.datetime.fromtimestamp(mid).isoformat()
    assert execute_sql(
        spark, f"SELECT COUNT(*) AS n FROM lc_ts TIMESTAMP AS OF '{iso}'"
    ).first()["n"] == 1


def test_table_changes_tvf(spark, tmp_path):
    path = str(tmp_path / "t")
    append(spark, path, spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, val string"))
    register_table(spark, "lc_cdf", path)
    execute_sql(spark, "UPDATE lc_cdf SET val = 'a2' WHERE k = 1")   # v2
    execute_sql(spark, "DELETE FROM lc_cdf WHERE k = 2")             # v3
    feed = execute_sql(spark, """
        SELECT k, _change_type FROM table_changes('lc_cdf', 1, 3)
        ORDER BY k, _change_type
    """).collect()
    assert [(r["k"], r["_change_type"]) for r in feed] == [
        (1, "delete"), (1, "insert"), (2, "delete")
    ]
    # bounded window
    feed2 = execute_sql(
        spark, "SELECT COUNT(*) AS n FROM table_changes('lc_cdf', 1, 2)"
    ).first()["n"]
    assert feed2 == 2
    with pytest.raises(SqlDmlError, match="not a registered"):
        execute_sql(spark, "SELECT * FROM table_changes('nope', 0)")


def test_create_table_cas_race(spark, tmp_path, monkeypatch):
    """Two racers creating the same table: exactly one wins the v1 CAS."""
    path = str(tmp_path / "race")
    real = txlog._try_commit
    fired = {"n": 0}

    def inject(fs, p, version, payload):
        if payload.get("operation") == "create" and fired["n"] == 0:
            fired["n"] = 1
            monkeypatch.setattr(txlog, "_try_commit", real)
            create_table(spark, path, "k long")  # the rival lands first
        return real(fs, p, version, payload)

    monkeypatch.setattr(txlog, "_try_commit", inject)
    with pytest.raises(CommitConflict, match="concurrent"):
        create_table(spark, path, "k long")
    assert current_version(spark, path) == 1


def test_table_changes_lookalike_in_literal_untouched(spark, tmp_path):
    """Round-11 review fix: a table_changes(...) lookalike INSIDE a
    string literal is data — no rewrite, no registration error."""
    path = str(tmp_path / "t")
    append(spark, path, spark.createDataFrame([(1,)], "k long"))
    register_table(spark, "lc_lit", path)
    row = execute_sql(
        spark,
        "SELECT 'see table_changes(''lc_lit'', 1) for docs' AS s FROM lc_lit",
    ).first()
    assert row["s"] == "see table_changes('lc_lit', 1) for docs"
    row = execute_sql(
        spark,
        "SELECT 'table_changes(''nope_unregistered'', 1)' AS s FROM lc_lit",
    ).first()
    assert "nope_unregistered" in row["s"]


def test_create_if_not_exists_does_not_mutate_properties(spark, tmp_path):
    """IF NOT EXISTS hitting an existing table is a FULL no-op: the
    statement's TBLPROPERTIES must not overwrite committed metadata."""
    path = str(tmp_path / "t")
    execute_sql(spark, f"""
        CREATE TABLE lc_props (k BIGINT) USING txlog LOCATION '{path}'
        TBLPROPERTIES ('retention.keep_versions' = '720')
    """)
    v = current_version(spark, path)
    r = execute_sql(spark, f"""
        CREATE TABLE IF NOT EXISTS lc_props (k BIGINT) USING txlog
        LOCATION '{path}' TBLPROPERTIES ('retention.keep_versions' = '1')
    """)
    assert r["created"] is False
    assert current_version(spark, path) == v  # no property commit landed
    assert txlog.table_properties(spark, path) == {
        "retention.keep_versions": "720"
    }
