"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree."""

import importlib.util
import sys
from pathlib import Path


def _load_entry():
    path = Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    spec = importlib.util.spec_from_file_location("spark_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_oracle_keys_subset_of_queries(spark):
    mod = _load_entry()
    q = mod.queries()
    o = mod.oracle_sql()
    assert q, "queries() must not be empty"
    assert set(o) <= set(q)
    # column-name discipline: spot-check a few pairs run and share columns
    for name in list(o)[:3]:
        df = q[name](spark, "/root/testdata/sf0.001")
        assert df.columns
