"""Dump .explain("formatted") for catalog queries to plans/$PLANS_ROUND/
(default r12).

    python scripts/dump_plans.py before <query>[,<query>...] [sf_dir]
    python scripts/dump_plans.py after  <query>[,<query>...] [sf_dir]

Writes plans/r11/<query>_<tag>.txt so the optimization round's plan
claims (Exchange counts, join strategies, PushedFilters) are checkable
without running Spark.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import sys


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
