"""Canonical result snapshots for optimization equivalence proofs.

    python scripts/snapshot_results.py write /tmp/snap.json <q1,q2|ALL> [sf_dir]
    python scripts/snapshot_results.py check /tmp/snap.json <q1,q2|ALL> [sf_dir]

A snapshot records, per query, the row count, the schema (names+types),
and an order-insensitive SHA-256 over the canonically-rendered sorted
rows — the same idea as the driver's oracle hash, computed engine-side
so a restructured query can be proven result-identical at ANY scale
factor (the DuckDB oracle only covers SFs it can hold).
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import hashlib
import json
import sys


def _canon(v) -> str:
    import datetime as dt
    import math

    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # repr round-trips doubles exactly; -0.0 normalized
        return repr(v + 0.0 if v == 0 else v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def snapshot(df) -> dict:
    rows = df.collect()
    rendered = sorted("|".join(_canon(v) for v in row) for row in rows)
    h = hashlib.sha256("\n".join(rendered).encode()).hexdigest()
    return {"rows": len(rows), "schema": str(df.schema.simpleString()), "hash": h}


def main() -> int:
    mode, path, which = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"

    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.session import get_spark

    names = sorted(REGISTRY) if which == "ALL" else which.split(",")
    spark = get_spark("snapshot")
    if mode == "write":
        out = {}
        for name in names:
            out[name] = snapshot(REGISTRY[name].fn(spark, sf_dir))
            print(f"{name}: {out[name]['rows']} rows {out[name]['hash'][:12]}")
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        return 0
    want = json.load(open(path))
    bad = 0
    for name in names:
        got = snapshot(REGISTRY[name].fn(spark, sf_dir))
        ok = got == want.get(name)
        if not ok:
            bad += 1
        print(f"{name}: {'OK' if ok else 'MISMATCH  want=' + str(want.get(name)) + ' got=' + str(got)}")
    print(f"{len(names) - bad}/{len(names)} identical")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
