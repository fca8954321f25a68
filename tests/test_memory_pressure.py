"""Memory-pressure / spill proof for the heavy tier (r4 verdict ask 4).

The 100×-scale story requires queries to COMPLETE AND STAY CORRECT when
the working set doesn't fit in executor memory — Spark's sort/agg/join
operators spill to disk under pressure instead of failing. This sweep
runs the heaviest catalog entries at sf0.1 inside a deliberately tiny
JVM (2 GiB heap shared by driver + executor threads in local mode —
per-task execution memory is a few MB, guaranteeing spills the
comfortable 16 GiB test session never exercises) and asserts each one
still hash-matches its DuckDB oracle (or its rows-only contract).

A subprocess is required: driver memory is a static conf, fixed at JVM
launch, so the pressure session cannot share the suite's SparkSession.
"""

import os
import subprocess
import sys

import pytest

# the heavy tier: iterative graph queries (multi-round shuffles +
# checkpoints), the inverted-index CF self-join, bucket-local Pandas
# packs, banded LSH, k-means semantic dedup, and full-distribution
# percentile/boxplot shapes
HEAVY = [
    "graph_pagerank",
    "rec_user_cf_topk",
    "graph_hits",
    "text_winnow_shared",
    "dedup_minhash_lsh",
    "agg_boxplot_iqr",
    "dedup_semantic",
    "graph_kcore",
    "sim_sq8_topk",
    "graph_bfs_distance",
]

SF01 = "/root/testdata/sf0.1"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 fixture absent")
def test_heavy_tier_completes_and_matches_oracle_under_2g():
    env = dict(
        os.environ,
        SPARK_GRAFT_DRIVER_MEM="2g",
        # 8 task slots on a 2 GiB heap: each task's share of the
        # execution-memory pool is small enough that the heavy shapes
        # MUST spill; 32 slots would mostly measure task-launch overhead
        SPARK_GRAFT_CPUS="8",
        ORACLE_WORKERS="2",
    )
    proc = subprocess.run(
        [sys.executable, "-m", "es_analytics_spark.oracle", SF01, ",".join(HEAVY)],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    tail = "\n".join(proc.stdout.splitlines()[-14:])
    assert proc.returncode == 0, (
        f"heavy tier failed under 2 GiB:\n{tail}\n{proc.stderr[-2000:]}"
    )
    assert f"{len(HEAVY)}/{len(HEAVY)} passed" in proc.stdout, tail
