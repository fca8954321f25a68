"""Profile the collector ingest paths: loop-only rate vs flush cost.

    python scripts/profile_ingest.py [n]

Reports (a) events/s of the pure tracking loop with the flush excluded
(record limit above n, no stop), (b) the flush seconds alone, (c) the
bench-identical end-to-end rate (warm write path first, stop included),
and a cProfile top-15 of the loop.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import cProfile
import datetime as dt
import pstats
import shutil
import tempfile
import time


def main() -> int:
    n = int(_sys.argv[1]) if len(_sys.argv) > 1 else 50_000

    from es_analytics_spark.collector import Collector, CollectorConfig
    from es_analytics_spark.session import get_spark
    import bench

    spark = get_spark("profile-ingest")

    lake = tempfile.mkdtemp(prefix="prof_ingest_")
    try:
        bench._warm_write_path(spark, lake)
        base = dt.datetime(2024, 1, 1)

        # (a) loop only — no flush ever fires
        col = Collector(spark, CollectorConfig(lake_dir=lake))
        t0 = time.perf_counter()
        for i in range(n):
            col.track(
                "game_user_event",
                {"uid": i % 997, "ts": base, "etype": "purchase", "value": i * 0.5},
            )
        loop_s = time.perf_counter() - t0
        # (b) the single flush at stop
        t0 = time.perf_counter()
        col.stop()
        flush_s = time.perf_counter() - t0
        print(f"loop only : {n / loop_s:10.1f} ev/s  ({loop_s:.3f}s)")
        print(f"flush(stop): {flush_s:.3f}s for {n} rows")
        print(f"end-to-end : {n / (loop_s + flush_s):10.1f} ev/s (bench-equivalent)")

        # two more bench-identical passes (steady state)
        for rep in range(2):
            print(f"bench-identical pass {rep}: "
                  f"{bench.ingest_events_per_sec(spark, n):.1f} ev/s")
        print(f"bulk pass: {bench.ingest_bulk_events_per_sec(spark):.1f} ev/s")

        # cProfile of the loop
        col2 = Collector(spark, CollectorConfig(lake_dir=lake))
        prof = cProfile.Profile()
        prof.enable()
        for i in range(n):
            col2.track(
                "game_user_event",
                {"uid": i % 997, "ts": base, "etype": "purchase", "value": i * 0.5},
            )
        prof.disable()
        col2.stop()
        pstats.Stats(prof).sort_stats("cumulative").print_stats(15)
    finally:
        shutil.rmtree(lake, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
