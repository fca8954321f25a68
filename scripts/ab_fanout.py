"""A/B a query with fan_out disabled vs enabled in ONE session.

    python scripts/ab_fanout.py <q1,q2,...> [reps] [sf_dir]

fan_out gates on spark.es_analytics.fanout.max_bytes; setting it to 0
makes every call a no-op, which reproduces the pre-optimization plan
without a code change — interleaved A/B runs in one session cancel
ambient load.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import statistics
import sys
import time


def main() -> int:
    names = sys.argv[1].split(",")
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from es_analytics_spark.functions.fanout import MAX_BYTES_CONF
    from es_analytics_spark.queries import REGISTRY
    from es_analytics_spark.session import get_spark

    spark = get_spark("ab")
    REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        offs, ons = [], []
        for _ in range(reps):
            spark.conf.set(MAX_BYTES_CONF, "0")
            offs.append(run(name))
            spark.conf.set(MAX_BYTES_CONF, str(1 << 30))
            ons.append(run(name))
        spark.conf.unset(MAX_BYTES_CONF)
        print(
            f"{name:34s} off={statistics.median(offs):6.3f}s"
            f" on={statistics.median(ons):6.3f}s"
            f"  ({statistics.median(offs) / max(statistics.median(ons), 1e-9):.2f}x)"
            f"  off_runs={[round(x, 2) for x in offs]} on_runs={[round(x, 2) for x in ons]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
