"""Self-generated scale proof: sf1-equivalent data, heaviest entries.

The driver fixtures stop at sf0.1; this script builds seeded 3x and 10x
(sf1-equivalent) copies of every sf0.1 table in scratch space (never
touching the read-only fixtures) and measures the N heaviest committed
bench entries at each scale, producing the runtime-vs-rows curves in
SCALE.md and flagging any super-linear entry.

Scaling technique (extends the SCALE.md scratch-copy recipe):

- Relational tables: k shifted-key copies with consistent FK shifts
  (lineitem copy k joins orders/part/supplier copy k), so join
  cardinalities scale linearly like a real bigger warehouse. Dimension
  leaves (region, nation) stay fixed, as TPC-H itself scales them.
- events: shifted event/user ids over the SAME time range — 10x the
  traffic per calendar grain, which is what a 10x-bigger product emits.
- documents: copy 0 verbatim; copies k>0 suffix every 7th word (phase
  k%7) with ~k, dropping cross-copy shingle Jaccard to ~0.4 so near-dup
  entries see a 10x corpus, not 10-way duplicate clusters (pair counts
  would otherwise grow ~k^2 — an OUTPUT property, not an engine cost,
  as the 25x embedding table in SCALE.md already documents).
- embeddings: deterministic per-(copy, element) sinusoidal noise at
  0.25 amplitude decorrelates copies for the same reason.

Usage::

    python scripts/scale_proof.py                # build + run, top 20
    python scripts/scale_proof.py --top 5        # quicker sweep
    python scripts/scale_proof.py --scales 3,10  # default

Writes SCALE_CURVES.json next to the repo bench artifacts and prints a
markdown table ready for SCALE.md. Super-linear flag: hot time ratio at
10x exceeding 13 (10x rows + 30% margin).
"""

from __future__ import annotations

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SCRATCH = "/tmp/es_scale_proof"

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# per-copy key shifts (strides far above every sf0.1 max key)
SHIFTS = {
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**7},
    "part": {"p_partkey": 10**7},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**9, "l_partkey": 10**7, "l_suppkey": 10**7},
    "events": {"event_id": 10**9, "user_id": 10**7},
    "documents": {"doc_id": 10**7},
    "embeddings": {"vec_id": 10**7},
}


def build_scale_dir(spark, factor: int) -> str:
    out = f"{SCRATCH}/x{factor}"
    marker = f"{out}/_COMPLETE"
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = spark.read.parquet(f"{SF01}/{t}.parquet")
        src.createOrReplaceTempView(f"__scale_{t}")
        if t in ("region", "nation"):
            copies = [src]
        else:
            copies = []
            for k in range(factor):
                sel = []
                for c in src.columns:
                    shift = SHIFTS.get(t, {}).get(c)
                    if shift is not None:
                        sel.append(f"{c} + {k * shift} AS {c}")
                    elif t == "documents" and c == "text" and k > 0:
                        sel.append(
                            "array_join(transform(split(text, ' '), (w, i) -> "
                            f"CASE WHEN i % 7 = {k % 7} THEN concat(w, '~{k}') "
                            "ELSE w END), ' ') AS text"
                        )
                    elif t == "embeddings" and c == "embedding" and k > 0:
                        sel.append(
                            "transform(embedding, (x, i) -> CAST(x + 0.25 * "
                            f"sin(vec_id * 0.37 + i * 1.3 + {k} * 2.1) AS "
                            "float)) AS embedding"
                        )
                    else:
                        sel.append(c)
                copies.append(spark.sql(
                    f"SELECT {', '.join(sel)} FROM __scale_{t}"
                ))
            # keep per-copy files separate: linear file counts, and the
            # writer never funnels the union through one stage
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def heaviest_entries(n: int) -> list[str]:
    with open(os.path.join(REPO, "BENCH_local.json")) as f:
        q = json.load(f)["queries"]
    return [name for name, _t in sorted(q.items(), key=lambda kv: -kv[1])[:n]]


def run_entry(spark, name: str, sf_dir: str) -> float:
    from es_analytics_spark.queries import REGISTRY

    def once() -> float:
        t0 = time.perf_counter()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    once()  # cold: plan + codegen compile, uncounted
    return round(min(once(), once()), 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--scales", default="3,10")
    ap.add_argument("--names", default=None, help="comma list overriding --top")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from es_analytics_spark.session import get_spark

    spark = get_spark("scale_proof")
    dirs = {1: SF01}
    for f in scales:
        t0 = time.perf_counter()
        dirs[f] = build_scale_dir(spark, f)
        print(f"# built x{f} in {time.perf_counter() - t0:.0f}s -> {dirs[f]}")

    names = (
        args.names.split(",") if args.names else heaviest_entries(args.top)
    )
    results: dict[str, dict[str, float]] = {}
    for name in names:
        row = {}
        for f, d in dirs.items():
            row[f"x{f}"] = run_entry(spark, name, d)
        top = scales[-1]
        row["ratio"] = round(row[f"x{top}"] / max(row["x1"], 0.05), 1)
        row["super_linear"] = row["ratio"] > top * 1.3
        results[name] = row
        print(f"# {name}: {row}")

    with open(os.path.join(REPO, "SCALE_CURVES.json"), "w") as f:
        json.dump(
            {"baseline": "sf0.1", "scales": scales, "entries": results},
            f, indent=1, sort_keys=True,
        )
        f.write("\n")

    top = scales[-1]
    print("\n| entry | x1 (sf0.1) | " + " | ".join(f"x{f}" for f in scales)
          + f" | t(x{top})/t(x1) | verdict |")
    print("|---|---|" + "---|" * (len(scales) + 2))
    for name, row in sorted(results.items(), key=lambda kv: -kv[1]["ratio"]):
        verdict = "**SUPER-LINEAR**" if row["super_linear"] else "sub-linear" if row["ratio"] < top else "~linear"
        cells = " | ".join(f"{row[f'x{f}']:.2f} s" for f in [1] + scales)
        print(f"| `{name}` | {cells} | {row['ratio']}x | {verdict} |")


if __name__ == "__main__":
    main()
