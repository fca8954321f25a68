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

The refresh never reads incorporated files again: the manifest records
every file already folded in, new files are aggregated alone, and the
two partial tables merge with one small groupBy. All file ops route
through the sources.fsio seam, so the rollup lives on local FS or any
Hadoop URI.

Crash safety: data and manifest live TOGETHER inside one version
directory (``<rollup>/current/{data, _manifest.json}``) and a refresh
builds the complete next version in a staging dir, then swaps it in
with the two-rename dance (staged manifest travels with its data, so
no crash point can publish data the manifest doesn't record — the
double-count / lost-rollup windows of a separate-manifest layout).
The remaining window — backup renamed away, new version not yet
renamed in — is healed on the next read/refresh by restoring the
backup (single-writer contract, as in maintenance._swap).
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


def _current_path(rollup_path: str) -> str:
    return fs_join(rollup_path, "current")


def _backup_path(rollup_path: str) -> str:
    return fs_join(rollup_path, "current.__old__")


def _staging_path(rollup_path: str) -> str:
    return fs_join(rollup_path, "current.__refresh__")


def _data_path(version_path: str) -> str:
    return fs_join(version_path, "data")


def _manifest_path(version_path: str) -> str:
    return fs_join(version_path, "_manifest.json")


def _heal(fs, rollup_path: str) -> None:
    """Finish an interrupted swap: if a crash left the backup as the
    only complete version, restore it (single-writer contract)."""
    cur, bak = _current_path(rollup_path), _backup_path(rollup_path)
    if not fs.exists(cur) and fs.exists(bak):
        fs.rename(bak, cur)


def _read_manifest(fs, rollup_path: str) -> dict:
    _heal(fs, rollup_path)
    p = _manifest_path(_current_path(rollup_path))
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
    manifest = _read_manifest(fs, rollup_path)  # heals interrupted swaps
    seen = set(manifest["files"])
    current_files = lake_fs(spark, source_glob).glob(source_glob)
    new_files = [f for f in current_files if f not in seen]
    cur = _current_path(rollup_path)
    data = _data_path(cur)

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

    # build the COMPLETE next version (data + its manifest) in staging,
    # then swap the version directory — data and the manifest that
    # records it are published in the same rename
    staging = _staging_path(rollup_path)
    fs.delete(staging)  # a crashed prior refresh may have left one
    merged.write.mode("overwrite").parquet(_data_path(staging))
    n_groups = spark.read.parquet(_data_path(staging)).count()
    manifest["files"] = sorted(seen | set(new_files))
    fs.put_bytes(
        _manifest_path(staging), json.dumps(manifest, indent=0).encode("utf-8")
    )
    backup = _backup_path(rollup_path)
    fs.delete(backup)
    if fs.exists(cur):
        fs.rename(cur, backup)
    fs.rename(staging, cur)
    fs.delete(backup)
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
    _heal(lake_fs(spark, rollup_path), rollup_path)
    df = spark.read.parquet(_data_path(_current_path(rollup_path)))
    for name, (kind, _c) in measures.items():
        if kind == "sum":
            df = df.withColumn(name, F.round(F.col(name), 4).cast("double"))
    for out, (s, c) in (avg_pairs or {}).items():
        df = df.withColumn(out, F.col(s) / F.col(c))
    return df


# ---------------------------------------------------------------------------
# Incrementally-maintained enriched JOIN view (manifest-gated reads)
# ---------------------------------------------------------------------------
#
# A rollup's output is one small merged table, so a refresh can rebuild
# and atomically swap the whole version directory. An enriched view
# (fact rows joined to dims) is FACT-SIZED — rebuilding it per refresh
# would defeat incrementality — so this structure flips the contract:
# data part-directories are immutable and append-only, and the single
# atomically-renamed manifest is the source of truth for WHICH parts a
# reader may see. A crash after writing parts but before the manifest
# rename leaves orphan directories that no reader ever observes and the
# next refresh re-derives (then reaps); nothing can double-count and
# nothing is lost. Each published refresh also writes an immutable
# numbered snapshot manifest, so readers get time travel
# (read_enriched_view(version=N) / view_history) for free — sound
# because parts are append-only, making every snapshot's part set a
# subset of the current manifest (vacuum-safe). This is the minimal
# manifest-gated-visibility step toward a transactional log (see
# BASELINE.md's table-format decision for where Delta/Iceberg would
# take over: multi-writer commits, log compaction, OPTIMIZE rewrites —
# a rewrite would break the append-only property snapshots rely on).


def _view_manifest_path(view_path: str, version: int | None = None) -> str:
    if version is None:
        return fs_join(view_path, "_manifest.json")
    return fs_join(view_path, f"_manifest.v{version:06d}.json")


def _read_view_manifest(fs, view_path: str, version: int | None = None) -> dict:
    if version is not None:
        # Validate against the CURRENT pointer: a snapshot file can
        # exist at current+1 as debris from a refresh that crashed
        # before publishing the pointer — view_history excludes it, and
        # direct versioned reads must too (its orphan part is fair game
        # for vacuum, so reading it would return parquet-not-found or
        # stale data).
        current = _read_view_manifest(fs, view_path)
        if version > current["version"]:
            raise FileNotFoundError(
                f"no snapshot v{version} under {view_path} published yet "
                f"(current is v{current['version']}; see view_history)"
            )
    p = _view_manifest_path(view_path, version)
    if not fs.exists(p):
        if version is not None:
            raise FileNotFoundError(
                f"no snapshot v{version} under {view_path} (see view_history)"
            )
        return {"version": 0, "sources": [], "parts": []}
    m = json.loads(fs.read_bytes(p).decode("utf-8"))
    m.setdefault("version", 0)
    return m


def _put_json_atomic(fs, dir_path: str, target: str, payload: dict) -> None:
    """Write JSON via temp-name + atomic replace so no reader (or
    crash) ever observes a torn OR MISSING file. The earlier
    delete-then-rename spelling had a crash window — target deleted,
    rename never ran, readers see an empty view — caught by the
    refresh crash-consistency sweep; ``replace_file`` renames over the
    existing file in one atomic step (os.replace locally,
    FileContext.rename(OVERWRITE) on Hadoop stores; on object stores
    without atomic replace this is the exact seam a transactional log
    replaces)."""
    tmp = fs_join(dir_path, f".{target.rsplit('/', 1)[-1]}.tmp")
    fs.delete(tmp)
    fs.put_bytes(tmp, json.dumps(payload, indent=0).encode("utf-8"))
    fs.replace_file(tmp, target)


def _write_view_manifest(fs, view_path: str, manifest: dict) -> None:
    """Publish the current-pointer manifest atomically."""
    _put_json_atomic(fs, view_path, _view_manifest_path(view_path), manifest)


def _json_scalar(v):
    """JSON-storable form of a part-stat bound. Datetimes go to ISO
    strings (ISO-8601 UTC compares lexicographically, so pruning works
    on the stored form); numerics and strings pass through."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def refresh_enriched_view(
    spark: SparkSession,
    source_glob: str,
    view_path: str,
    enrich,
    stats_cols: list[str] | None = None,
) -> dict:
    """Create or incrementally refresh a fact-sized materialized view:
    every source file not yet in the manifest is read, transformed by
    ``enrich`` (a DataFrame -> DataFrame callable — typically a
    broadcast-dim join and projection), and written as a new immutable
    part directory; the manifest (sources + visible parts) is then
    published in one atomic rename. Refresh cost tracks the increment,
    never the view size. Returns {"new_files", "total_files", "parts"}.

    ``enrich`` must be deterministic per source row (joins against
    stable dims); if a dim changes, that is a *different view* —
    rebuild under a new path or bump a version in the path. SCD-style
    dim history belongs in the enrich join itself (join_scd2 shape).
    """
    import uuid as _uuid

    fs = lake_fs(spark, view_path)
    fs.mkdirs(view_path)
    manifest = _read_view_manifest(fs, view_path)
    seen = set(manifest["sources"])
    new_files = [f for f in lake_fs(spark, source_glob).glob(source_glob) if f not in seen]
    if not new_files:
        return {
            "new_files": 0,
            "total_files": len(seen),
            "parts": len(manifest["parts"]),
            "version": manifest["version"],
        }
    part = fs_join(view_path, "parts", str(_uuid.uuid4()))
    enrich(spark.read.parquet(*new_files)).write.mode("overwrite").parquet(part)
    manifest["version"] = manifest["version"] + 1
    manifest["sources"] = sorted(seen | set(new_files))
    manifest["parts"] = sorted(set(manifest["parts"]) | {part})
    if stats_cols:
        # manifest zone maps: one increment-sized aggregate per refresh
        # records each new part's [min, max] per declared column, so
        # point/range reads can skip whole parts without opening them
        # (the Iceberg/Delta data-skipping idea on this manifest format)
        from pyspark.sql import functions as F

        pdf = spark.read.parquet(part)
        aggs = []
        for c in stats_cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        row = pdf.agg(*aggs).first()
        manifest.setdefault("stats", {})[part] = {
            c: [_json_scalar(row[f"__mn_{c}"]), _json_scalar(row[f"__mx_{c}"])]
            for c in stats_cols
        }
    # snapshot manifest first, then publish "current". A crash between
    # the two leaves a snapshot (and part) no pointer names — invisible
    # to readers, identical to the orphan-part story. The next refresh
    # re-derives version N from the still-old current manifest and
    # OVERWRITES the stale unpublished snapshot: a snapshot becomes
    # immutable only once the current pointer has named it, because
    # from then on version numbers advance past it (single-writer
    # contract).
    _put_json_atomic(
        fs, view_path, _view_manifest_path(view_path, manifest["version"]), manifest
    )
    _write_view_manifest(fs, view_path, manifest)
    return {
        "new_files": len(new_files),
        "total_files": len(manifest["sources"]),
        "parts": len(manifest["parts"]),
        "version": manifest["version"],
    }


def refresh_enriched_view_tx(
    spark: SparkSession,
    source_glob: str,
    view_path: str,
    enrich,
    max_attempts: int = 5,
) -> dict:
    """Multi-writer-safe enriched-view refresh: the txlog backend for
    :func:`refresh_enriched_view`.

    The single-manifest design above is single-writer by contract — two
    concurrent refreshes would both read manifest version N, both
    incorporate the same new source files, and whichever ``replace_file``
    lands last would publish a view that either double-counts the
    increment (both parts listed by the survivor) or orphans the other
    writer's commit entirely. This variant routes the refresh through
    ``txlog``: the incorporated-source set lives IN the commits
    (``txlog.append(sources=...)``), so incorporation is exactly-once —
    a racing writer loses the source-overlap conflict check, re-reads
    :func:`txlog.table_sources`, finds nothing new, and no-ops. Read the
    view (with time travel and partition pruning) via
    :func:`txlog.read_table`.

    Same incremental contract as the single-writer refresh: only files
    absent from the incorporated set are read; refresh cost tracks the
    increment, never the view size. Returns {"new_files", "total_files",
    "version"}.
    """
    from es_analytics_spark import txlog

    last_conflict: Exception | None = None
    for _ in range(max_attempts):
        v0 = txlog.current_version(spark, view_path)
        seen = txlog.table_sources(spark, view_path, version=v0)
        new_files = [
            f for f in lake_fs(spark, source_glob).glob(source_glob) if f not in seen
        ]
        if not new_files:
            return {"new_files": 0, "total_files": len(seen), "version": v0}
        try:
            res = txlog.append(
                spark,
                view_path,
                enrich(spark.read.parquet(*new_files)),
                sources=new_files,
                since_version=v0,
            )
            return {
                "new_files": len(new_files),
                "total_files": len(seen) + len(new_files),
                "version": res["version"],
            }
        except txlog.CommitConflict as exc:
            # another refresh incorporated (some of) our files first; its
            # commit is the source of truth — recompute the increment
            # against the new snapshot (our orphan part is vacuum fodder)
            last_conflict = exc
            continue
    raise txlog.CommitConflict(
        f"refresh_enriched_view_tx under {view_path}: {max_attempts} attempts "
        f"all conflicted; last: {last_conflict}"
    )


def read_enriched_view(
    spark: SparkSession,
    view_path: str,
    version: int | None = None,
    prune: tuple | None = None,
) -> DataFrame:
    """Read ONLY the parts the manifest publishes — orphan part
    directories from interrupted refreshes are invisible by
    construction.

    ``version=N`` is a snapshot (time-travel) read: the view exactly as
    refresh N published it. Sound because parts are immutable and
    append-only — every published version's part set is a subset of the
    current manifest, so vacuum (which keeps everything the current
    manifest references) can never reap under a live snapshot.

    ``prune=(col, lo, hi)`` — or a LIST of such triples, ANDed — is a
    zone-map read: parts whose recorded [min, max] for ``col`` (see
    ``refresh_enriched_view`` stats_cols) is disjoint from [lo, hi]
    on ANY predicate are skipped WITHOUT being opened, and the
    residual range filters are applied to the survivors —
    manifest-level data skipping, correct because stats are computed
    from the immutable part at publish time. Parts with no recorded
    stats for a column are conservatively read. Datetime bounds
    compare via their ISO form (the stored form)."""
    from pyspark.sql import functions as F

    fs = lake_fs(spark, view_path)
    manifest = _read_view_manifest(fs, view_path, version)
    if not manifest["parts"]:
        raise FileNotFoundError(f"no published parts under {view_path}")
    parts = manifest["parts"]
    if prune is not None:
        preds = [prune] if isinstance(prune, tuple) else list(prune)
        stats = manifest.get("stats", {})
        kept = []
        for p in parts:
            keep = True
            for col, lo, hi in preds:
                s = stats.get(p, {}).get(col)
                if s is None or s[0] is None or s[1] is None:
                    continue  # no stats for this column — can't skip
                lo_c, hi_c = _json_scalar(lo), _json_scalar(hi)
                if s[1] < lo_c or s[0] > hi_c:
                    keep = False
                    break
            if keep:
                kept.append(p)
        if not kept:
            # schema-stable empty frame without opening any data part
            return spark.read.parquet(parts[0]).filter(F.lit(False))
        df = spark.read.parquet(*kept)
        for col, lo, hi in preds:
            df = df.filter((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
        return df
    return spark.read.parquet(*parts)


def view_history(spark: SparkSession, view_path: str) -> list[dict]:
    """Published snapshots, oldest first: [{version, parts, sources}].
    Only versions the current pointer has advanced past (or currently
    names) are listed — an unpublished crash-debris snapshot never has
    version <= current and is excluded, and snapshots removed by
    expire_snapshots no longer appear (their manifests are gone)."""
    fs = lake_fs(spark, view_path)
    current = _read_view_manifest(fs, view_path)
    out = []
    for v in range(1, current["version"] + 1):
        try:
            m = _read_view_manifest(fs, view_path, v)
        except FileNotFoundError:  # expired by retention
            continue
        out.append(
            {"version": v, "parts": len(m["parts"]), "sources": len(m["sources"])}
        )
    return out


def expire_snapshots(
    spark: SparkSession, view_path: str, keep_last: int = 7
) -> list[int]:
    """Retention policy on time travel: delete every numbered snapshot
    manifest older than the newest ``keep_last`` versions and return
    the expired version numbers. This is the metadata half of Delta's
    VACUUM/RETAIN pair for this engine's manifest-gated views — it
    bounds manifest growth and CLOSES the time-travel window (reading
    an expired version raises the standard no-snapshot error;
    view_history and read_view_changes skip/refuse it), while the
    current pointer, the newest ``keep_last`` snapshots, and every data
    part stay untouched (parts are shared across snapshots; erasure
    already rewrites them in place, see erase_from_view).

    Crash-safe and idempotent by construction: expiry is a sequence of
    independent single-manifest deletes, each of which only ever
    removes an already-expired-eligible file — a crash mid-loop leaves
    a subset expired and a re-run completes the rest. Single-writer
    contract (same as refresh)."""
    if keep_last < 1:
        raise ValueError("expire_snapshots: keep_last must be >= 1")
    fs = lake_fs(spark, view_path)
    current = _read_view_manifest(fs, view_path)
    cutoff = current["version"] - keep_last
    expired = []
    for v in range(1, cutoff + 1):
        p = _view_manifest_path(view_path, v)
        if fs.exists(p):
            fs.delete(p)
            expired.append(v)
    return expired


def vacuum_enriched_view(spark: SparkSession, view_path: str) -> list[str]:
    """Reap part directories the manifest does not reference (debris
    from refreshes that crashed before their manifest rename). Safe at
    any time: unreferenced parts are unreachable by readers, and the
    manifest is only ever extended by whole committed refreshes."""
    fs = lake_fs(spark, view_path)
    manifest = _read_view_manifest(fs, view_path)
    live = set(manifest["parts"])
    victims = [
        p for p in fs.glob(fs_join(view_path, "parts", "*")) if p not in live
    ]
    for p in victims:
        fs.delete(p)
    return victims


def read_view_changes(
    spark: SparkSession, view_path: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Change feed between two published view versions: the rows added
    by refreshes (from_version, to_version] — exact because parts are
    immutable and append-only, so the version delta IS the inserted
    rows (the minimal CDC-read a transactional log would expose as
    table_changes / CDF). from_version=0 reads everything up to
    to_version. Raises on unpublished versions via the validated
    snapshot read path.

    Incremental consumers (downstream rollups, exports) read each new
    version's delta instead of re-scanning the view — refresh-sized
    work, never view-sized."""
    fs = lake_fs(spark, view_path)
    to_manifest = _read_view_manifest(
        fs, view_path, None if to_version is None else to_version
    )
    if from_version == 0:
        old_parts: set[str] = set()
    else:
        old_parts = set(_read_view_manifest(fs, view_path, from_version)["parts"])
    new_parts = [p for p in to_manifest["parts"] if p not in old_parts]
    if not new_parts:
        return spark.read.parquet(*to_manifest["parts"]).limit(0)
    return spark.read.parquet(*new_parts)


def erase_from_view(
    spark: SparkSession, view_path: str, key_col: str, values: list
) -> dict:
    """Right-to-be-forgotten erasure over an enriched view: rewrite
    every published part that contains matching rows, IN PLACE at the
    same part path, then publish a new manifest version.

    This deliberately pierces the append-only/snapshot-immutability
    contract: GDPR erasure must be RETROACTIVE, so time-travel reads
    of any earlier version — which reference the same (now rewritten)
    part paths — also stop returning the subject's rows. That is the
    legally-required behavior, not a bug; the new manifest version
    records that an erasure event happened. (Transactional formats
    face the same tension: Delta requires VACUUMing old versions after
    a GDPR delete for exactly this reason.)

    Part zone-map stats are left as recorded: the old [min, max] is a
    superset of the rewritten part's range, so pruned reads stay
    CORRECT (they may merely under-prune) without re-aggregating.

    Per-part replacement is the compact-style dir swap (crash window
    documented there); a crash mid-loop leaves some parts erased and a
    re-run completes the rest — idempotent. A verification re-read of
    the current view proves zero survivors before returning."""
    from es_analytics_spark.maintenance import erasure_predicates

    fs = lake_fs(spark, view_path)
    manifest = _read_view_manifest(fs, view_path)
    if not manifest["parts"]:
        return {"rows_erased": 0, "parts_rewritten": 0, "verified": True}
    pred, keep = erasure_predicates(key_col, values)
    rewritten = 0
    rows_erased = 0
    for part in manifest["parts"]:
        df = spark.read.parquet(part)
        if key_col not in df.columns:
            raise ValueError(f"erase_from_view: {key_col!r} absent from {part}")
        hits = df.filter(pred).count()
        if hits == 0:
            continue
        staging = part + ".__erase__"
        df.filter(keep).write.mode("overwrite").parquet(staging)
        backup = part + ".__old__"
        fs.delete(backup)
        fs.rename(part, backup)
        fs.rename(staging, part)
        fs.delete(backup)
        spark.catalog.refreshByPath(part)
        rewritten += 1
        rows_erased += hits
    if rewritten:
        # publish the erasure as a manifest version so consumers see a
        # change event (the change feed between the two versions is
        # empty — erasure removes, never adds — which is itself the
        # auditable signature of an erasure-only version)
        manifest["version"] = manifest["version"] + 1
        _put_json_atomic(
            fs,
            view_path,
            _view_manifest_path(view_path, manifest["version"]),
            manifest,
        )
        _write_view_manifest(fs, view_path, manifest)
    survivors = (
        read_enriched_view(spark, view_path).filter(pred).limit(1).count()
    )
    return {
        "rows_erased": int(rows_erased),
        "parts_rewritten": int(rewritten),
        "verified": survivors == 0,
    }
