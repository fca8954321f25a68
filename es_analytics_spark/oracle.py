"""Local DuckDB oracle harness mirroring the driver's correctness gate:
row count + column names + order-insensitive value comparison.

Used by tests and by `python -m es_analytics_spark.oracle [sf_dir]`
during development to validate every REGISTRY query before shipping.
"""

from __future__ import annotations

import math
import sys
import time
from dataclasses import dataclass

import duckdb
import pandas as pd

from pyspark.sql import SparkSession

from es_analytics_spark.queries import REGISTRY
from es_analytics_spark.sources.lake import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None and not isinstance(v, str) else v)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def _dtype_class(s: pd.Series) -> str:
    """Coarse dtype class the driver's value hash is sensitive to.

    The driver hashes pandas values, so an int64 `1` vs float64 `1.0`
    mismatch (DuckDB HUGEINT -> float64 being the classic source) fails
    its hash even when every value compares equal. We therefore assert
    class parity instead of silently coercing it away."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    secs: float = 0.0


def compare_query(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, sf_dir: str, name: str
) -> CompareResult:
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return CompareResult(name, len(sdf) >= 0, f"rows-only: {len(sdf)} rows")
    ddf = con.sql(spec.oracle).df()
    return _compare_frames(name, sdf, ddf)


def _compare_frames(name: str, sdf: pd.DataFrame, ddf: pd.DataFrame) -> CompareResult:
    if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, ddf.columns)):
        return CompareResult(
            name, False, f"column mismatch: spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}"
        )
    if len(sdf) != len(ddf):
        return CompareResult(name, False, f"row count: spark={len(sdf)} duck={len(ddf)}")
    ddf.columns = [c for c in ddf.columns]
    a, b = _canon(sdf), _canon(ddf.rename(columns=dict(zip(ddf.columns, ddf.columns))))
    b.columns = a.columns  # align case
    bad = []
    for c in a.columns:
        ca, cb = _dtype_class(a[c]), _dtype_class(b[c])
        if ca != cb:
            bad.append(f"{c}: dtype class spark={ca}({a[c].dtype}) duck={cb}({b[c].dtype})")
    if bad:
        return CompareResult(name, False, "DTYPE: " + "; ".join(bad[:6]))
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float)
            bv = bv.astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                idx = neq.idxmax()
                maxdiff = (av[neq] - bv[neq]).abs().max()
                bad.append(f"{c}: {int(neq.sum())} diffs, max {maxdiff:.3g} e.g. {av[idx]}!={bv[idx]}")
        else:
            try:
                neq = ~((av == bv) | (av.isna() & bv.isna()))
            except Exception:
                neq = av.astype(str) != bv.astype(str)
            if neq.any():
                idx = neq.idxmax()
                bad.append(f"{c}: {int(neq.sum())} diffs e.g. {av[idx]!r}!={bv[idx]!r}")
    if bad:
        return CompareResult(name, False, "; ".join(bad[:4]))
    return CompareResult(name, True, f"{len(a)} rows exact")


def driver_record(
    spark: SparkSession, con: duckdb.DuckDBPyConnection, sf_dir: str, name: str
) -> dict:
    """One per-query record in the DRIVER's exact CORRECTNESS schema
    ({rows_match, schema_match, hash_match, spark_rows, oracle_rows,
    err}) so a committed full-catalog artifact is line-diffable against
    the driver's sampled CORRECTNESS_r{N}.json. no-oracle entries get
    the driver's weaker rows-only row (all None + err='no_oracle')."""
    spec = REGISTRY[name]
    try:
        sdf = spec.fn(spark, sf_dir).toPandas()
    except Exception as exc:
        return {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None,
            "err": f"{type(exc).__name__}: {exc}"[:300],
        }
    if spec.oracle is None:
        return {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": int(len(sdf)), "oracle_rows": None, "err": "no_oracle",
        }
    try:
        ddf = con.sql(spec.oracle).df()
    except Exception as exc:
        return {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": int(len(sdf)), "oracle_rows": None,
            "err": f"oracle: {type(exc).__name__}: {exc}"[:300],
        }
    rows_match = len(sdf) == len(ddf)
    schema_match = sorted(map(str.lower, sdf.columns)) == sorted(
        map(str.lower, ddf.columns)
    )
    res = _compare_frames(name, sdf, ddf)
    return {
        "rows_match": bool(rows_match),
        "schema_match": bool(schema_match),
        "hash_match": bool(res.ok),
        "spark_rows": int(len(sdf)),
        "oracle_rows": int(len(ddf)),
        "err": None if res.ok else res.detail[:300],
    }


def run_all(
    spark: SparkSession,
    sf_dir: str,
    names: list[str] | None = None,
    workers: int = 1,
) -> list[CompareResult]:
    """Check the named queries (default: whole catalog) against DuckDB.

    ``workers > 1`` checks queries concurrently: Spark's scheduler
    interleaves jobs from multiple submitting threads (fixture-scale
    queries are scheduling-bound, not compute-bound, so this is ~Nx),
    and each worker owns a private DuckDB connection (the connection
    object is not thread-safe). Safe because every query either derives
    from the read-only sf_dir parquet or writes only to per-call
    tempdirs, and concurrent createOrReplaceTempView calls register
    identical definitions for a given sf_dir. Per-query secs are
    wall-clock under contention — use workers=1 for timing work."""
    todo = list(names or REGISTRY)

    def check(name: str) -> CompareResult:
        con = duck_connection(sf_dir)
        t0 = time.monotonic()
        try:
            res = compare_query(spark, con, sf_dir, name)
        except Exception as exc:
            res = CompareResult(name, False, f"EXCEPTION: {type(exc).__name__}: {exc}")
        finally:
            con.close()
        res.secs = time.monotonic() - t0
        return res

    if workers <= 1:
        con = duck_connection(sf_dir)
        out = []
        for name in todo:
            t0 = time.monotonic()
            try:
                res = compare_query(spark, con, sf_dir, name)
            except Exception as exc:
                res = CompareResult(name, False, f"EXCEPTION: {type(exc).__name__}: {exc}")
            res.secs = time.monotonic() - t0
            out.append(res)
        return out

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as pool:
        return list(pool.map(check, todo))


if __name__ == "__main__":
    import os

    from es_analytics_spark.session import get_spark

    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    names = argv[1].split(",") if len(argv) > 1 else None
    spark = get_spark("oracle_check")
    # fixture-scale check harness: tiny inputs under 32-task shuffles pay
    # far more in scheduling than compute — 8 post-AQE partitions keeps
    # the full-catalog sweep fast without touching any query's shape
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    workers = int(os.environ.get("ORACLE_WORKERS", "6"))
    if json_out:
        # full-catalog artifact in the driver's exact per-query schema —
        # committed per round (CORRECTNESS_full_r{N}.json) so entries
        # outside the driver's fixed 50-name sample still get a
        # driver-diffable correctness row
        import json as _json
        from concurrent.futures import ThreadPoolExecutor

        todo = list(names or REGISTRY)

        def rec(name: str) -> tuple[str, dict]:
            con = duck_connection(sf_dir)
            try:
                return name, driver_record(spark, con, sf_dir, name)
            finally:
                con.close()

        with ThreadPoolExecutor(max_workers=workers) as pool:
            records = dict(pool.map(rec, todo))
        with open(json_out, "w") as f:
            _json.dump(records, f, indent=1, sort_keys=True)
            f.write("\n")
        n_pass = sum(1 for r in records.values() if r["hash_match"])
        n_rows_only = sum(1 for r in records.values() if r["err"] == "no_oracle")
        n_fail = sum(
            1
            for r in records.values()
            if r["hash_match"] is False
        )
        print(
            f"{json_out}: {len(records)} entries — {n_pass} hash-exact, "
            f"{n_rows_only} rows-only (no_oracle), {n_fail} FAIL"
        )
        sys.exit(0 if n_fail == 0 else 1)
    results = run_all(spark, sf_dir, names, workers=workers)
    n_ok = sum(r.ok for r in results)
    for r in results:
        print(("PASS" if r.ok else "FAIL"), f"{r.secs:6.2f}s", r.name.ljust(28), r.detail)
    print(f"\n{n_ok}/{len(results)} passed, {sum(r.secs for r in results):.1f}s total")
    sys.exit(0 if n_ok == len(results) else 1)
