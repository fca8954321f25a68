"""Committed CHECK / NOT-NULL constraints (round-11 ask #4): recorded
in the log, folded into checkpoints, enforced pre-commit on every write
verb with failing-row counts, survive retention/restore/rename, and the
SQL ALTER TABLE ADD/DROP CONSTRAINT + SET/DROP NOT NULL routes."""

from __future__ import annotations

import pytest

from es_analytics_spark import txlog
from es_analytics_spark.sqldml import SqlDmlError, execute_sql
from es_analytics_spark.txlog import (
    ConstraintViolationError,
    add_constraint,
    append,
    create_table,
    current_version,
    drop_constraint,
    merge,
    merge_upsert,
    read_table,
    register_table,
    table_constraints,
    update_where,
)


def _base(spark, tmp_path, n=10):
    path = str(tmp_path / "t")
    append(spark, path, spark.createDataFrame(
        [(k, f"v{k}", float(k)) for k in range(n)],
        "k long, val string, x double",
    ))
    return path


def _df(spark, rows, schema="k long, val string, x double"):
    return spark.createDataFrame(rows, schema)


def test_add_validates_existing_rows_and_expression(spark, tmp_path):
    path = _base(spark, tmp_path)
    with pytest.raises(ConstraintViolationError, match="10 existing row"):
        add_constraint(spark, path, "impossible", "x > 100")
    with pytest.raises(ValueError, match="does not analyze"):
        add_constraint(spark, path, "bad", "no_such_col > 0")
    with pytest.raises(ValueError, match="bad constraint name"):
        add_constraint(spark, path, "1bad", "x >= 0")
    r = add_constraint(spark, path, "x_nonneg", "x >= 0")
    assert table_constraints(spark, path) == {"x_nonneg": "x >= 0"}
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(spark, path, "x_nonneg", "x >= 1")
    assert r["version"] == current_version(spark, path)


def test_enforced_on_every_write_verb(spark, tmp_path):
    path = _base(spark, tmp_path)
    add_constraint(spark, path, "x_nonneg", "x >= 0")
    v0 = current_version(spark, path)
    with pytest.raises(ConstraintViolationError, match="x_nonneg.*2 row"):
        append(spark, path, _df(spark, [(100, "a", -1.0), (101, "b", -2.0)]))
    with pytest.raises(ConstraintViolationError):
        txlog.overwrite_table(spark, path, _df(spark, [(1, "a", -1.0)]))
    with pytest.raises(ConstraintViolationError):
        update_where(spark, path, {"x": "x - 100"}, "k < 3")
    with pytest.raises(ConstraintViolationError):
        merge_upsert(spark, path, _df(spark, [(1, "a", -5.0)]), keys=["k"])
    with pytest.raises(ConstraintViolationError):
        merge(spark, path, _df(spark, [(1, "a", -5.0)]), ["k"],
              matched=[{"action": "update", "set": {"x": "s.x"}}])
    # nothing committed by any failed attempt
    assert current_version(spark, path) == v0
    assert read_table(spark, path).count() == 10
    # satisfying writes pass
    append(spark, path, _df(spark, [(100, "ok", 5.0)]))
    update_where(spark, path, {"x": "x + 1"}, "k = 1")
    assert read_table(spark, path).count() == 11


def test_ansi_null_semantics_and_not_null_spelling(spark, tmp_path):
    path = _base(spark, tmp_path, n=3)
    add_constraint(spark, path, "x_range", "x < 100")
    # ANSI CHECK: NULL passes a plain range check …
    append(spark, path, _df(spark, [(50, "n", None)]))
    assert read_table(spark, path).count() == 4
    # … and the IS NOT NULL spelling rejects it
    with pytest.raises(ConstraintViolationError, match="1 existing row"):
        add_constraint(spark, path, "val_notnull", "x IS NOT NULL")
    add_constraint(spark, path, "val_nn", "val IS NOT NULL")
    with pytest.raises(ConstraintViolationError, match="val_nn"):
        append(spark, path, _df(spark, [(51, None, 1.0)]))


def test_evolve_null_fill_checked_as_null(spark, tmp_path):
    """A column omitted by an evolving append reads as NULL — the
    constraint must see NULL (not crash, not skip the rows)."""
    path = _base(spark, tmp_path, n=3)
    add_constraint(spark, path, "val_nn", "val IS NOT NULL")
    with pytest.raises(ConstraintViolationError, match="val_nn"):
        append(spark, path, spark.createDataFrame([(7, 1.0)], "k long, x double"),
               evolve=True)
    add_constraint(spark, path, "x_range", "x >= 0")
    # omitting x null-fills -> NULL passes the range check (ANSI)
    append(spark, path,
           spark.createDataFrame([(8, "ok")], "k long, val string"), evolve=True)
    assert read_table(spark, path).count() == 4


def test_drop_constraint_and_unknown(spark, tmp_path):
    path = _base(spark, tmp_path, n=3)
    add_constraint(spark, path, "x_nonneg", "x >= 0")
    drop_constraint(spark, path, "x_nonneg")
    assert table_constraints(spark, path) == {}
    append(spark, path, _df(spark, [(9, "neg", -1.0)]))  # enforced no more
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(spark, path, "x_nonneg")


def test_survives_checkpoint_and_log_retention(spark, tmp_path):
    path = _base(spark, tmp_path, n=3)
    add_constraint(spark, path, "x_nonneg", "x >= 0")
    for i in range(5):
        append(spark, path, _df(spark, [(100 + i, "a", float(i))]))
    txlog.checkpoint(spark, path)
    txlog.clean_log(spark, path, keep_versions=1)
    # the set_constraint commit is reaped; the folded checkpoint answers
    assert table_constraints(spark, path) == {"x_nonneg": "x >= 0"}
    with pytest.raises(ConstraintViolationError):
        append(spark, path, _df(spark, [(200, "bad", -1.0)]))


def test_survives_restore_and_rename(spark, tmp_path):
    path = _base(spark, tmp_path, n=3)
    add_constraint(spark, path, "x_nonneg", "x >= 0")
    v = current_version(spark, path)
    append(spark, path, _df(spark, [(50, "a", 5.0)]))
    txlog.restore(spark, path, v)
    with pytest.raises(ConstraintViolationError):
        append(spark, path, _df(spark, [(60, "bad", -1.0)]))
    # rename: the constraint expression follows the column atomically
    txlog.rename_column(spark, path, "x", "amount")
    assert table_constraints(spark, path) == {"x_nonneg": "amount >= 0"}
    with pytest.raises(ConstraintViolationError):
        append(spark, path, _df(spark, [(61, "bad", -1.0)],
                                "k long, val string, amount double"))
    append(spark, path, _df(spark, [(62, "ok", 1.0)],
                            "k long, val string, amount double"))
    # a literal containing the old name is data, not a reference
    add_constraint(spark, path, "lit", "val != 'x'")
    txlog.rename_column(spark, path, "amount", "x")
    assert table_constraints(spark, path)["lit"] == "val != 'x'"
    assert table_constraints(spark, path)["x_nonneg"] == "x >= 0"


def test_drop_column_refused_while_referenced(spark, tmp_path):
    path = _base(spark, tmp_path, n=3)
    add_constraint(spark, path, "x_nonneg", "x >= 0")
    with pytest.raises(txlog.SchemaMismatchError, match="referenced by"):
        txlog.drop_column(spark, path, "x")
    drop_constraint(spark, path, "x_nonneg")
    txlog.drop_column(spark, path, "x")
    assert "x" not in read_table(spark, path).columns


def test_sql_routes(spark, tmp_path):
    path = str(tmp_path / "t")
    execute_sql(spark, f"""
        CREATE TABLE con_t (k BIGINT, val STRING, x DOUBLE)
        USING txlog LOCATION '{path}'
    """)
    execute_sql(spark, "INSERT INTO con_t VALUES (1, 'a', 1.0)")
    r = execute_sql(spark, "ALTER TABLE con_t ADD CONSTRAINT x_pos CHECK (x > 0)")
    assert r["operation"] == "alter_table"
    execute_sql(spark, "ALTER TABLE con_t ALTER COLUMN val SET NOT NULL")
    desc = {r["name"]: r["expr"]
            for r in execute_sql(spark, "DESCRIBE CONSTRAINTS con_t").collect()}
    assert desc == {"x_pos": "x > 0", "notnull_val": "val IS NOT NULL"}
    with pytest.raises(ConstraintViolationError, match="violate"):
        execute_sql(spark, "INSERT INTO con_t VALUES (2, 'b', -1.0)")
    with pytest.raises(ConstraintViolationError, match="violate"):
        execute_sql(spark, "INSERT INTO con_t VALUES (3, NULL, 1.0)")
    with pytest.raises(SqlDmlError, match="existing row"):
        execute_sql(spark, "ALTER TABLE con_t ADD CONSTRAINT big CHECK (x > 50)")
    execute_sql(spark, "ALTER TABLE con_t DROP CONSTRAINT x_pos")
    execute_sql(spark, "ALTER TABLE con_t ALTER COLUMN val DROP NOT NULL")
    execute_sql(spark, "INSERT INTO con_t VALUES (2, NULL, -1.0)")
    assert spark.sql("SELECT COUNT(*) FROM con_t").first()[0] == 2


def test_create_then_constraint_gates_from_first_row(spark, tmp_path):
    path = str(tmp_path / "t")
    create_table(spark, path, "k long, x double")
    add_constraint(spark, path, "x_pos", "x > 0")
    register_table(spark, "con_first", path)
    with pytest.raises(ConstraintViolationError):
        append(spark, path, spark.createDataFrame([(1, -1.0)], "k long, x double"))
    append(spark, path, spark.createDataFrame([(1, 1.0)], "k long, x double"))
    assert read_table(spark, path).count() == 1


def test_preupgrade_cleaned_log_still_writes(spark, tmp_path):
    """Round-11 review fix: a table whose checkpoints predate the
    constraints fold (simulated by stripping the key) and whose log was
    cleaned must keep accepting writes — the replay treats the reaped,
    provably constraint-free prefix as empty instead of raising
    VersionExpiredError on every write."""
    import json as _json

    path = str(tmp_path / "t")
    for i in range(6):
        append(spark, path, _df(spark, [(i, "a", float(i))]))
    txlog.checkpoint(spark, path)
    # simulate a pre-upgrade checkpoint: drop the constraints fold
    from es_analytics_spark.sources.fsio import LocalFS

    fs = LocalFS()
    ck_path = txlog._checkpoint_path(path, 6)
    ck = _json.loads(fs.read_bytes(ck_path).decode())
    ck.pop("constraints", None)
    fs.delete(ck_path)
    fs.put_bytes(ck_path, _json.dumps(ck).encode())
    txlog._CKPT_CACHE.clear()
    r = txlog.clean_log(spark, path, keep_versions=0)
    assert r["removed_commits"] > 0
    assert table_constraints(spark, path) == {}
    append(spark, path, _df(spark, [(100, "ok", 1.0)]))  # must not raise
    txlog.checkpoint(spark, path)  # heals: folds constraints ({})


def test_clean_log_refuses_cut_past_unfolded_constraint(spark, tmp_path):
    """A checkpoint lacking the constraints fold may not cut past a
    constraints-carrying commit (the fold would be the only surviving
    copy); the next folding checkpoint unblocks the cut."""
    import json as _json

    path = str(tmp_path / "t")
    for i in range(3):
        append(spark, path, _df(spark, [(i, "a", float(i))]))
    add_constraint(spark, path, "x_nonneg", "x >= 0")
    append(spark, path, _df(spark, [(50, "b", 5.0)]))
    txlog.checkpoint(spark, path)
    from es_analytics_spark.sources.fsio import LocalFS

    fs = LocalFS()
    v = txlog.current_version(spark, path)
    ck_path = txlog._checkpoint_path(path, v)
    ck = _json.loads(fs.read_bytes(ck_path).decode())
    ck.pop("constraints", None)
    fs.delete(ck_path)
    fs.put_bytes(ck_path, _json.dumps(ck).encode())
    txlog._CKPT_CACHE.clear()
    r = txlog.clean_log(spark, path, keep_versions=0)
    assert r["cut"] == 0 and r["removed_commits"] == 0
    # constraint survives and enforces
    with pytest.raises(ConstraintViolationError):
        append(spark, path, _df(spark, [(60, "bad", -1.0)]))
    # a FOLDING checkpoint (fresh write at a new version) unblocks
    append(spark, path, _df(spark, [(61, "ok", 1.0)]))
    txlog.checkpoint(spark, path)
    r = txlog.clean_log(spark, path, keep_versions=0)
    assert r["removed_commits"] > 0
    assert table_constraints(spark, path) == {"x_nonneg": "x >= 0"}


def test_add_constraint_revalidates_on_cas_retry(spark, tmp_path, monkeypatch):
    """TOCTOU closure, constraint side: a rival append landing
    violating rows between validation and the CAS makes the retry
    re-validate and refuse — the constraint can never commit over a
    snapshot it was not checked against."""
    path = _base(spark, tmp_path, n=3)
    real = txlog._try_commit
    fired = {"n": 0}

    def inject(fs, p, version, payload):
        if payload.get("operation") == "set_constraint" and fired["n"] == 0:
            fired["n"] = 1
            append(spark, path, _df(spark, [(50, "rival", -5.0)]))
        return real(fs, p, version, payload)

    monkeypatch.setattr(txlog, "_try_commit", inject)
    with pytest.raises(ConstraintViolationError, match="existing row"):
        add_constraint(spark, path, "x_nonneg", "x >= 0")
    assert table_constraints(spark, path) == {}


def test_append_reenforces_on_cas_retry(spark, tmp_path, monkeypatch):
    """TOCTOU closure, append side: a constraint committed between the
    append's validation and its CAS win is enforced on the retry — the
    blind-append commute cannot slip violating rows past it."""
    path = _base(spark, tmp_path, n=3)
    real = txlog._try_commit
    fired = {"n": 0}

    def inject(fs, p, version, payload):
        if payload.get("operation") == "append" and fired["n"] == 0 \
                and payload["adds"] and not payload.get("constraints"):
            fired["n"] = 1
            add_constraint(spark, path, "x_nonneg", "x >= 0")
        return real(fs, p, version, payload)

    monkeypatch.setattr(txlog, "_try_commit", inject)
    with pytest.raises(ConstraintViolationError):
        append(spark, path, _df(spark, [(50, "bad", -5.0)]))
    monkeypatch.setattr(txlog, "_try_commit", real)
    assert read_table(spark, path).count() == 3


def test_backticked_constraint_follows_rename(spark, tmp_path):
    """Round-11 review fix: a constraint written with a backtick-quoted
    identifier is STILL a reference — rename rewrites it, drop_column
    refuses while it holds."""
    path = _base(spark, tmp_path, n=3)
    add_constraint(spark, path, "bt", "`x` >= 0")
    with pytest.raises(txlog.SchemaMismatchError, match="referenced by"):
        txlog.drop_column(spark, path, "x")
    txlog.rename_column(spark, path, "x", "amount")
    assert table_constraints(spark, path) == {"bt": "`amount` >= 0"}
    with pytest.raises(ConstraintViolationError):
        append(spark, path, _df(spark, [(60, "bad", -1.0)],
                                "k long, val string, amount double"))
