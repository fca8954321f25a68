"""In-repo bench regression gate (round-5 ask #6 / round-6 ask #8).

Compares a fresh sf0.1 run of the committed headline-bench queries
against the per-query baselines in the COMMITTED ``BENCH_local.json``
(read from git HEAD, so a locally re-run bench.py cannot move its own
goalposts). The gate exists to catch plan pathologies — a lost
broadcast, a de-pushed filter, an accidental cartesian — not scheduler
noise, so it is deliberately forgiving of timing jitter:

- tolerance is **2.5×** the committed time, with a 0.5 s absolute floor
  (sub-half-second baselines are scheduling-noise-dominated at sf0.1);
- the shared test session runs local[8] while the committed numbers
  come from the driver's local[32] run — absorbed by the tolerance;
- an offender on the first pass is re-run once and flagged only if it
  exceeds tolerance BOTH times (transient GC/compile hiccups pass);
- the whole gate skips under external load (1-min load average above
  half the cores before starting) — a contended box proves nothing.
"""

from __future__ import annotations

import json
import os
import subprocess
import time

import pytest

from es_analytics_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.1"
TOLERANCE = 2.5
ABS_FLOOR_SEC = 0.5
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _committed_baseline() -> dict[str, float]:
    try:
        blob = subprocess.run(
            ["git", "show", "HEAD:BENCH_local.json"],
            cwd=REPO,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        with open(os.path.join(REPO, "BENCH_local.json")) as f:
            blob = f.read()
    return json.load(__import__("io").StringIO(blob))["queries"]


@pytest.mark.slow
def test_no_headline_query_regressed_beyond_tolerance(spark):
    load1 = os.getloadavg()[0]
    cores = os.cpu_count() or 1
    if load1 > cores / 2:
        pytest.skip(f"machine under external load (load1={load1:.1f}, cores={cores})")
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} fixture absent")

    baseline = _committed_baseline()
    names = [n for n in baseline if n in REGISTRY]
    assert len(names) >= 50, "committed baseline unexpectedly small"

    def run(name: str) -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # cold pass: absorb per-query Catalyst/codegen compile outside the
    # measured pass (the committed numbers are hot-pass numbers).
    # Conf-mutating entries run serially, as in bench.py.
    from concurrent.futures import ThreadPoolExecutor

    serial = [n for n in names if REGISTRY[n].mutates_conf]
    pooled = [n for n in names if n not in serial]
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(run, pooled))
    for n in serial:
        run(n)

    hot = {n: run(n) for n in names}
    suspects = {
        n: t
        for n, t in hot.items()
        if t > max(baseline[n], ABS_FLOOR_SEC) * TOLERANCE
    }
    # retry-before-flag: a transient hiccup must not fail the gate
    confirmed = {}
    for n in suspects:
        t2 = run(n)
        if t2 > max(baseline[n], ABS_FLOOR_SEC) * TOLERANCE:
            confirmed[n] = (baseline[n], min(suspects[n], t2))
    assert not confirmed, (
        "headline queries regressed >"
        f"{TOLERANCE}x vs committed BENCH_local.json (baseline_s, now_s): "
        + ", ".join(f"{n}=({b:.2f}, {t:.2f})" for n, (b, t) in sorted(confirmed.items()))
    )
    # totals sanity: the whole hot pass should not have doubled either
    base_total = sum(baseline[n] for n in names)
    assert sum(hot.values()) < base_total * TOLERANCE, (
        f"hot-pass total {sum(hot.values()):.1f}s vs committed {base_total:.1f}s"
    )
