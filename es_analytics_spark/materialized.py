"""Incrementally-maintained materialized rollups.

At 100 TB you do not recompute a daily dashboard aggregate from the
full fact table; you keep a small table of *mergeable partial
aggregates* and fold in only the files that arrived since the last
refresh. This module maintains exactly that contract over a lake
directory (reference behavior: the collector keeps appending
``YYYY/MM/DD/HH/table/guid`` objects — Collector.ts:262-270's key
scheme — so "new data" is always "new files").

Mergeability rules (classic aggregation-lattice algebra):

- ``count``  -> partials merge by SUM
- ``sum``    -> partials merge by SUM, stored as DECIMAL(38,10) so the
  merge is order-independent and a refreshed rollup bit-matches a full
  recompute (same contract as functions.exact.dsum)
- ``min``/``max`` -> partials merge by MIN/MAX

AVG is intentionally absent: store count+sum and divide at read time
(``read_rollup`` exposes the division).

The refresh never reads incorporated files again: the manifest (a JSON
file next to the rollup data) records every file already folded in,
new files are aggregated alone, and the two partial tables merge with
one small groupBy. All file ops route through the sources.fsio seam,
so the rollup lives on local FS or any Hadoop URI.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from es_analytics_spark.sources.fsio import join as fs_join, lake_fs

_SUM_DECIMAL = "decimal(38,10)"


def _partial_aggs(measures: dict[str, tuple[str, str | None]]) -> list:
    aggs = []
    for name, (kind, col) in measures.items():
        if kind == "count":
            aggs.append(F.count("*").alias(name))
        elif kind == "sum":
            aggs.append(F.sum(F.col(col).cast(_SUM_DECIMAL)).alias(name))
        elif kind == "min":
            aggs.append(F.min(col).alias(name))
        elif kind == "max":
            aggs.append(F.max(col).alias(name))
        else:
            raise ValueError(f"unsupported measure kind {kind!r} for {name!r}")
    return aggs


def _merge_aggs(measures: dict[str, tuple[str, str | None]]) -> list:
    aggs = []
    for name, (kind, _col) in measures.items():
        if kind in ("count", "sum"):
            aggs.append(F.sum(name).alias(name))
        elif kind == "min":
            aggs.append(F.min(name).alias(name))
        elif kind == "max":
            aggs.append(F.max(name).alias(name))
    return aggs


def _data_path(rollup_path: str) -> str:
    return fs_join(rollup_path, "data")


def _manifest_path(rollup_path: str) -> str:
    return fs_join(rollup_path, "_manifest.json")


def _read_manifest(fs, rollup_path: str) -> dict:
    p = _manifest_path(rollup_path)
    if not fs.exists(p):
        return {"files": []}
    return json.loads(fs.read_bytes(p).decode("utf-8"))


def refresh_rollup(
    spark: SparkSession,
    source_glob: str,
    rollup_path: str,
    group_cols: list[str],
    measures: dict[str, tuple[str, str | None]],
) -> dict:
    """Create or incrementally refresh the rollup at ``rollup_path``
    from all files matching ``source_glob``. Only files absent from
    the manifest are read; the first call is the full build. Returns
    ``{"new_files": int, "total_files": int, "groups": int}``.

    The merge is a groupBy over |rollup| + |new partials| rows — the
    fact table's size never appears in the refresh cost. Counts/sums
    merge exactly (decimal), so refresh(a) then refresh(b) equals a
    one-shot build over a+b bit-for-bit.
    """
    fs = lake_fs(spark, rollup_path)
    manifest = _read_manifest(fs, rollup_path)
    seen = set(manifest["files"])
    current = lake_fs(spark, source_glob).glob(source_glob)
    new_files = [f for f in current if f not in seen]
    data = _data_path(rollup_path)

    if not new_files:
        n_groups = spark.read.parquet(data).count() if fs.exists(data) else 0
        return {"new_files": 0, "total_files": len(seen), "groups": n_groups}

    fresh = (
        spark.read.parquet(*new_files).groupBy(*group_cols).agg(*_partial_aggs(measures))
    )
    if fs.exists(data):
        merged = (
            spark.read.parquet(data)
            .unionByName(fresh)
            .groupBy(*group_cols)
            .agg(*_merge_aggs(measures))
        )
    else:
        merged = fresh

    staging = data.rstrip("/") + ".__refresh__"
    merged.write.mode("overwrite").parquet(staging)
    n_groups = spark.read.parquet(staging).count()
    if fs.exists(data):
        fs.delete(data)
    fs.rename(staging, data)
    manifest["files"] = sorted(seen | set(new_files))
    fs.put_bytes(
        _manifest_path(rollup_path), json.dumps(manifest, indent=0).encode("utf-8")
    )
    return {
        "new_files": len(new_files),
        "total_files": len(manifest["files"]),
        "groups": n_groups,
    }


def read_rollup(
    spark: SparkSession,
    rollup_path: str,
    measures: dict[str, tuple[str, str | None]],
    avg_pairs: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """Read the rollup, casting decimal sums back to double and adding
    derived averages (``avg_pairs`` maps out-name -> (sum_name,
    count_name))."""
    df = spark.read.parquet(_data_path(rollup_path))
    for name, (kind, _c) in measures.items():
        if kind == "sum":
            df = df.withColumn(name, F.round(F.col(name), 4).cast("double"))
    for out, (s, c) in (avg_pairs or {}).items():
        df = df.withColumn(out, F.col(s) / F.col(c))
    return df
