"""Plan-audit CLI: the scale-shape report for any catalog queries.

    python -m es_analytics_spark.plans.audit /root/testdata/sf0.01
    python -m es_analytics_spark.plans.audit /root/testdata/sf0.01 q1,q2

Prints one line per query — shuffles, broadcasts, reused exchanges,
scans, sorts — the numbers the shuffle-budget tests pin for flagship
shapes (tests/test_plans.py::test_flagship_shuffle_budgets). Use it
when adding a query: if the audit shows more Exchanges than the
operator's SCALE.md family argues for, the plan needs work before the
catalog does.
"""

from __future__ import annotations

import sys


def main() -> int:
    from es_analytics_spark.plans.inspect import plan_audit
    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = (
        [n.strip() for n in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else sorted(REGISTRY)
    )
    spark = get_spark("plan-audit")
    worst = 0
    for name in names:
        if name not in REGISTRY:
            print(f"{name:34s} UNKNOWN")
            continue
        try:
            audit = plan_audit(REGISTRY[name].fn(spark, sf_dir))
        except Exception as exc:  # a query that cannot plan is the finding
            print(f"{name:34s} ERROR {str(exc)[:90]}")
            worst = max(worst, 1)
            continue
        print(
            f"{name:34s} shuffles={audit['shuffles']:<3d}"
            f" broadcasts={audit['broadcasts']:<3d}"
            f" reused={audit['reused_exchanges']:<2d}"
            f" scans={audit['scans']:<3d} sorts={audit['sorts']}"
        )
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
