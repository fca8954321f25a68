"""Measured proof of the chunked-checkpoint write-path claim at a
realistic part count (SCALE.md round-10 section).

Builds a metadata-only txlog with N live parts (synthetic add entries —
checkpointing never opens parts, so the live-set size is the only
variable that matters), then measures:

- the FIRST chunked checkpoint (full write: every chunk + footer),
- a cadence checkpoint after ONE more commit (the incremental claim:
  ~1 chunk + footer, not O(live set)),
- the footer-only folded read (table_properties) and the cold
  assembled snapshot read at that size,
- the bytes a format-1 (inline) checkpoint would have re-serialized
  per cadence, for comparison.

Run: PYTHONPATH=/root/repo python scripts/ckpt_scale_proof.py [n_parts]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import uuid

from es_analytics_spark import get_spark, txlog
from es_analytics_spark.sources.fsio import LocalFS
from es_analytics_spark.txlog import _try_commit, checkpoint


def main() -> None:
    n_parts = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark("ckpt-scale-proof")
    path = tempfile.mkdtemp(prefix="ckpt_proof_") + "/t"
    fs = LocalFS()
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
    ]}
    per_commit = 1000
    v = 0
    for _ in range(n_parts // per_commit):
        v += 1
        adds = [
            {"path": f"{path}/parts/{uuid.uuid4().hex}",
             "partition": {}, "stats": {"k": [0, 1_000_000]}}
            for _ in range(per_commit)
        ]
        assert _try_commit(fs, path, v, {
            "operation": "append", "adds": adds, "removes": [],
            "scope_partition": None, "schema": schema,
        })

    t0 = time.perf_counter()
    r1 = checkpoint(spark, path)
    t_full = time.perf_counter() - t0
    inline_bytes = len(json.dumps(
        [dict(e, path=p) for p, e in sorted(
            txlog._snapshot(fs, path)[1].items())]
    ).encode())

    v += 1
    assert _try_commit(fs, path, v, {
        "operation": "append",
        "adds": [{"path": f"{path}/parts/{uuid.uuid4().hex}", "partition": {}}],
        "removes": [], "scope_partition": None, "schema": schema,
    })
    t0 = time.perf_counter()
    r2 = checkpoint(spark, path)
    t_incr = time.perf_counter() - t0

    t0 = time.perf_counter()
    props = txlog.table_properties(spark, path)
    t_folded = time.perf_counter() - t0
    txlog._CKPT_CACHE.clear()
    t0 = time.perf_counter()
    _v, live = txlog._snapshot(fs, path)
    t_cold = time.perf_counter() - t0
    assert len(live) == n_parts + 1 and props == {}

    # remote-store shape: per-object GET latency dominates cold
    # assembly at 10^5-10^6 parts. Simulate it and compare the pooled
    # _load_checkpoint against a sequential fetch of the same chunks —
    # the round-11 parallel-assembly claim, measured.
    get_latency = 0.004  # 4 ms per object — S3-intra-region shape
    footer = txlog._load_checkpoint(fs, path, r2["version"], with_live=False)
    chunk_names = sorted({r["name"] for r in footer.get("live_chunks", [])})

    class _LatencyFS(LocalFS):
        def read_bytes(self, p: str) -> bytes:
            time.sleep(get_latency)
            return super().read_bytes(p)

    lfs = _LatencyFS()
    t0 = time.perf_counter()
    for nm in chunk_names:
        json.loads(lfs.read_bytes(f"{path}/_txlog/{nm}").decode("utf-8"))
    t_seq = time.perf_counter() - t0
    txlog._CKPT_CACHE.clear()
    t0 = time.perf_counter()
    ck = txlog._load_checkpoint(lfs, path, r2["version"])
    t_pooled = time.perf_counter() - t0
    assert ck is not None and len(ck["live"]) == n_parts + 1

    print(json.dumps({
        "n_parts": n_parts,
        "full_ckpt_sec": round(t_full, 3),
        "full_chunks_written": r1["chunks_written"],
        "incremental_ckpt_sec": round(t_incr, 3),
        "incremental_chunks_written": r2["chunks_written"],
        "inline_live_bytes_per_cadence": inline_bytes,
        "folded_read_sec": round(t_folded, 4),
        "cold_snapshot_assemble_sec": round(t_cold, 3),
        "n_chunks": len(chunk_names),
        "simulated_get_latency_sec": get_latency,
        "cold_assemble_sequential_sec_at_latency": round(t_seq, 3),
        "cold_assemble_pooled_sec_at_latency": round(t_pooled, 3),
    }))


if __name__ == "__main__":
    main()
