"""Multi-writer optimistic concurrency over the manifest seam.

The single-writer structures in ``materialized.py`` publish state by
atomically renaming ONE mutable manifest — correct for one writer, but
two concurrent refreshes would silently overwrite each other's commit.
This module removes that restriction with the classic transactional-log
design (the public Delta/Iceberg commit protocol, re-expressed on this
engine's fsio seam):

- **The log is a sequence of write-once files** ``_txlog/v000001.json,
  v000002.json, …`` — nothing in the log is ever mutated. This is the
  reference's ``Store.put`` contract (every batch object goes to a
  fresh write-once key — lib/store/Store.ts:4-8, StoreS3.ts:21-35)
  promoted to the commit path.
- **Committing version N is a compare-and-swap**: atomically create
  ``vN.json`` iff absent (``fsio.put_if_absent`` — hard-link locally,
  ``FileContext.rename`` without OVERWRITE on Hadoop stores). Exactly
  one writer wins each version number; losers re-read the log and
  either re-attach their commit at a later version (when provably
  safe) or abort with :class:`CommitConflict`.
- **Data parts are immutable directories** under ``parts/``; a commit
  lists the parts it adds and removes. A crash between writing parts
  and winning the CAS leaves orphan directories no reader can ever
  observe (``vacuum`` reaps them) — the same invisible-debris story as
  the enriched-view manifest, now safe under contention.

Conflict rules (optimistic, checked by the CAS loser against every
commit that landed since its snapshot):

========================  =========================================
our commit                safe to re-attach at a later version iff
========================  =========================================
append (adds only)        always — blind appends commute
compact (removes R)       no intervening commit removed any r ∈ R
overwrite partition P     no intervening commit added or removed a
                          part in P
========================  =========================================

Anything else raises :class:`CommitConflict`; the caller re-runs the
transaction against the new snapshot (its orphaned parts are vacuumed).
Serializability: the winning order IS the version order, every commit's
removes are validated live at replay (a violated rule cannot be
recorded), and the two-writer stress + kill sweeps in
``tests/test_txlog.py`` check the whole history, not just the end
state.

Scale: log operations are metadata-sized (one small JSON per commit;
``checkpoint`` bounds replay cost the way Delta's parquet checkpoints
do); data reads/writes stay fully distributed DataFrame ops over the
live part list. On raw S3 the CAS primitive needs an external
coordinator (put-if-absent is not native there) — the documented
boundary in ``sources/fsio.py``.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from es_analytics_spark.sources.fsio import join as fs_join, lake_fs

_CHECKPOINT_EVERY_HINT = 20  # advisory; checkpoint() is explicit


class CommitConflict(Exception):
    """The transaction's snapshot was invalidated by a concurrent
    commit (or the CAS retry budget ran out); re-run it."""


def _log_dir(path: str) -> str:
    return fs_join(path, "_txlog")


def _commit_path(path: str, version: int) -> str:
    return fs_join(_log_dir(path), f"v{version:06d}.json")


def _checkpoint_path(path: str, version: int) -> str:
    return fs_join(_log_dir(path), f"checkpoint.v{version:06d}.json")


def _part_dir(path: str) -> str:
    return fs_join(path, "parts")


def _list_versions(fs, path: str, prefix: str = "v") -> list[int]:
    pat = fs_join(_log_dir(path), f"{prefix}*.json")
    out = []
    for p in fs.glob(pat):
        name = p.rsplit("/", 1)[-1]
        out.append(int(name[len(prefix): -len(".json")]))
    return sorted(out)


def _read_commit(fs, path: str, version: int) -> dict:
    return json.loads(fs.read_bytes(_commit_path(path, version)).decode("utf-8"))


def _snapshot(fs, path: str, version: int | None = None) -> tuple[int, dict[str, dict]]:
    """Replay the log up to ``version`` (default: latest): returns
    ``(version, live)`` where live maps part path -> its partition tag.
    Replay STARTS from the newest checkpoint <= version and VALIDATES
    every remove against the live set — a commit removing a non-live
    part means the conflict protocol was violated, and raising here is
    what makes the stress tests check the whole history."""
    versions = _list_versions(fs, path)
    if not versions:
        return 0, {}
    latest = versions[-1]
    if version is None:
        version = latest
    elif version > latest:
        raise FileNotFoundError(
            f"no commit v{version} under {path} (latest is v{latest})"
        )
    if versions != list(range(1, latest + 1)):
        missing = sorted(set(range(1, latest + 1)) - set(versions))
        raise RuntimeError(f"txlog corrupt under {path}: missing commits {missing}")

    live: dict[str, dict] = {}
    start = 1
    ckpts = [v for v in _list_versions(fs, path, prefix="checkpoint.v") if v <= version]
    if ckpts:
        ck = json.loads(
            fs.read_bytes(_checkpoint_path(path, ckpts[-1])).decode("utf-8")
        )
        live = {e["path"]: e.get("partition", {}) for e in ck["live"]}
        start = ck["version"] + 1
    for v in range(start, version + 1):
        c = _read_commit(fs, path, v)
        for r in c.get("removes", []):
            if r not in live:
                raise RuntimeError(
                    f"txlog corrupt under {path}: v{v} removes non-live part {r}"
                )
            del live[r]
        for a in c.get("adds", []):
            live[a["path"]] = a.get("partition", {})
    return version, live


def current_version(spark: SparkSession, path: str) -> int:
    fs = lake_fs(spark, path)
    versions = _list_versions(fs, path)
    return versions[-1] if versions else 0


def history(spark: SparkSession, path: str) -> list[dict]:
    """All commits oldest-first: [{version, operation, n_adds,
    n_removes, partition}] — the audit log a serializability check
    replays."""
    fs = lake_fs(spark, path)
    out = []
    for v in _list_versions(fs, path):
        c = _read_commit(fs, path, v)
        out.append(
            {
                "version": v,
                "operation": c["operation"],
                "n_adds": len(c.get("adds", [])),
                "n_removes": len(c.get("removes", [])),
                "partition": c.get("scope_partition"),
            }
        )
    return out


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """Snapshot read: exactly the parts live at ``version`` (default
    latest) — concurrent commits landing after the replay can't change
    what this frame reads, because parts are immutable and commits only
    ever add/remove whole parts. ``partition_filter`` prunes parts by
    their commit-recorded partition tag WITHOUT opening them
    (manifest-level partition pruning)."""
    fs = lake_fs(spark, path)
    v, live = _snapshot(fs, path, version)
    parts = sorted(live)
    if partition_filter:
        parts = [
            p
            for p in parts
            if all(live[p].get(k) == pv for k, pv in partition_filter.items())
        ]
    if not parts:
        if live:
            # schema-stable empty frame from any historical live part
            from pyspark.sql import functions as F

            return spark.read.parquet(sorted(live)[0]).filter(F.lit(False))
        raise FileNotFoundError(f"no live parts under {path} at v{v}")
    return spark.read.parquet(*parts)


def _write_part(spark: SparkSession, path: str, df: DataFrame) -> str:
    part = fs_join(_part_dir(path), uuid.uuid4().hex)
    df.write.mode("overwrite").parquet(part)
    return part


def _try_commit(fs, path: str, version: int, payload: dict) -> bool:
    payload = dict(payload, version=version)
    return fs.put_if_absent(
        _commit_path(path, version), json.dumps(payload, indent=0).encode("utf-8")
    )


def append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition: dict | None = None,
    max_retries: int = 50,
    sources: list[str] | None = None,
    since_version: int | None = None,
) -> dict:
    """Transactional append: write an immutable part, then CAS it into
    the log. Blind appends commute, so losing the CAS race costs one
    metadata retry — the part is NOT rewritten. Returns
    {"version", "part"}.

    ``sources`` makes the append EXACTLY-ONCE per source file: the
    commit records which upstream files it incorporated, and the commit
    re-attaches only if no commit after ``since_version`` (the version
    at which the caller computed its new-file set — required with
    sources) shares a source. Two refreshes racing over the same new
    files therefore serialize: one wins, the other raises
    :class:`CommitConflict`, re-reads :func:`table_sources`, and finds
    nothing left to incorporate. This is the incremental-view refresh
    contract (``materialized.refresh_enriched_view_tx``)."""
    fs = lake_fs(spark, path)
    if sources is not None and since_version is None:
        raise ValueError("append: sources requires since_version (the snapshot "
                         "version the new-file set was computed at)")
    part = _write_part(spark, path, df)
    payload = {
        "operation": "append",
        "adds": [{"path": part, "partition": partition or {}}],
        "removes": [],
        "scope_partition": partition,
    }
    if sources is not None:
        payload["sources"] = sorted(sources)
    src_set = set(sources or [])
    checked = since_version if sources is not None else None
    v = current_version(spark, path)
    for _ in range(max_retries):
        if checked is not None and v > checked:
            for c in _intervening(fs, path, checked, v):
                overlap = src_set & set(c.get("sources", []))
                if overlap:
                    raise CommitConflict(
                        f"append under {path}: v{c['version']} already "
                        f"incorporated {len(overlap)} of this refresh's source "
                        "files; re-read table_sources and re-run"
                    )
            checked = v
        if _try_commit(fs, path, v + 1, payload):
            return {"version": v + 1, "part": part}
        v = max(v + 1, current_version(spark, path))
    raise CommitConflict(f"append lost the CAS {max_retries} times under {path}")


def table_sources(spark: SparkSession, path: str, version: int | None = None) -> set[str]:
    """Union of every source file incorporated by commits <= ``version``
    (default: all) — the incremental-refresh "seen" set. Metadata-sized:
    commit files are never deleted (checkpoints bound REPLAY, not
    retention), so this always reads the full, exact history."""
    fs = lake_fs(spark, path)
    versions = _list_versions(fs, path)
    if version is not None:
        versions = [v for v in versions if v <= version]
    out: set[str] = set()
    for v in versions:
        out.update(_read_commit(fs, path, v).get("sources", []))
    return out


def _intervening(fs, path: str, since: int, until: int) -> list[dict]:
    return [_read_commit(fs, path, v) for v in range(since + 1, until + 1)]


def compact(
    spark: SparkSession,
    path: str,
    max_retries: int = 10,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Transactional compaction: rewrite the snapshot's live parts into
    one part per partition tag, then commit {adds, removes=snapshot
    parts}. A CAS loss re-attaches at a later version iff no
    intervening commit removed any part we are removing (intervening
    APPENDS are safe — they stay live, simply not compacted by this
    run); otherwise :class:`CommitConflict` — the caller re-runs, and
    the orphaned rewrite is vacuum fodder. Returns {"version",
    "parts_before", "parts_after"}.

    Each partition group is rewritten with size-targeted bin-packing
    (the ``maintenance.compact`` sizing contract): files approach
    ``target_file_bytes`` via a bytes-per-row estimate from the group's
    current on-disk size, written across ``ceil(bytes/target)`` tasks —
    never a single-task ``coalesce(1)``, which at 100 TB would make a
    hot partition a multi-GB single-thread write and a straggler/OOM
    magnet."""
    fs = lake_fs(spark, path)
    v0, live = _snapshot(fs, path)
    if len(live) <= 1:
        return {"version": v0, "parts_before": len(live), "parts_after": len(live)}

    groups: dict[tuple, list[str]] = {}
    for p, tag in live.items():
        groups.setdefault(tuple(sorted(tag.items())), []).append(p)
    adds = []
    for key, parts in sorted(groups.items()):
        parts = sorted(parts)
        merged = spark.read.parquet(*parts)
        group_bytes = sum(s for p in parts for s in fs.file_sizes(p, ".parquet"))
        n_rows = merged.count()
        bytes_per_row = max(group_bytes / max(n_rows, 1), 1.0)
        rows_per_file = max(int(target_file_bytes / bytes_per_row), 1)
        n_files = max(-(-group_bytes // max(target_file_bytes, 1)), 1)
        sized = merged.repartition(int(n_files))
        part = fs_join(_part_dir(path), uuid.uuid4().hex)
        (
            sized.write.mode("overwrite")
            .option("maxRecordsPerFile", rows_per_file)
            .parquet(part)
        )
        adds.append({"path": part, "partition": dict(key)})
    removes = sorted(live)
    payload = {
        "operation": "compact",
        "adds": adds,
        "removes": removes,
        "scope_partition": None,
    }
    our_removes = set(removes)
    v = v0
    for _ in range(max_retries):
        v += 1
        if _try_commit(fs, path, v, payload):
            return {
                "version": v,
                "parts_before": len(removes),
                "parts_after": len(adds),
            }
        latest = current_version(spark, path)
        for c in _intervening(fs, path, v - 1, latest):
            if our_removes & set(c.get("removes", [])):
                raise CommitConflict(
                    f"compact under {path}: v{c['version']} already removed "
                    "part(s) from this snapshot; re-run against the new state"
                )
        v = max(v, latest)
    raise CommitConflict(f"compact lost the CAS {max_retries} times under {path}")


def overwrite_partition(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    partition: dict,
    max_retries: int = 10,
) -> dict:
    """Transactional partition overwrite (the upsert shape: replace
    partition P's content wholesale): removes every live part tagged
    exactly P, adds the new part. Commits from DISJOINT partitions
    merge — a CAS loss re-attaches iff every intervening commit left P
    untouched (no add or remove tagged P, and none of our removes
    gone); a concurrent writer in the SAME partition raises
    :class:`CommitConflict`. Returns {"version", "removed_parts"}.

    "Tagged exactly P" is tag-dict EQUALITY: a part tagged
    ``{p:1, q:2}`` is NOT removed by ``partition={p:1}``, and untagged
    parts (plain ``append`` default) are never removed. Hierarchical
    overwrites must name the full tag they replace — this keeps the
    remove set unambiguous under the conflict rules (a subset match
    would let two "disjoint" overwrites race on the same part)."""
    fs = lake_fs(spark, path)
    if not isinstance(partition, dict) or not partition:
        raise ValueError("overwrite_partition: partition must be a non-empty dict")
    v0, live = _snapshot(fs, path)
    removes = sorted(p for p, tag in live.items() if tag == partition)
    part = _write_part(spark, path, df)
    payload = {
        "operation": "overwrite_partition",
        "adds": [{"path": part, "partition": partition}],
        "removes": removes,
        "scope_partition": partition,
    }

    def _touches_scope(c: dict) -> bool:
        if set(removes) & set(c.get("removes", [])):
            return True
        # exact tag equality, mirroring the remove rule above
        return any(a.get("partition", {}) == partition for a in c.get("adds", []))

    v = v0
    for _ in range(max_retries):
        v += 1
        if _try_commit(fs, path, v, payload):
            return {"version": v, "removed_parts": len(removes)}
        latest = current_version(spark, path)
        for c in _intervening(fs, path, v - 1, latest):
            if _touches_scope(c):
                raise CommitConflict(
                    f"overwrite_partition under {path}: v{c['version']} touched "
                    f"partition {partition}; re-run against the new state"
                )
        v = max(v, latest)
    raise CommitConflict(
        f"overwrite_partition lost the CAS {max_retries} times under {path}"
    )


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change feed between two committed versions: the rows ADDED by
    commits in (from_version, to_version] — the txlog analog of
    ``materialized.read_view_changes`` (Delta's ``table_changes`` /
    CDF for the insert-only case). Exact for append/refresh workloads
    because parts are immutable; parts added-and-then-removed inside
    the window (a compact's rewrites) are EXCLUDED along with their
    removed sources — compaction rewrites content that was already
    visible at some version, so surfacing it again would double-feed
    an incremental consumer. ``from_version=0`` reads everything up to
    ``to_version``.

    ``overwrite_partition`` commits DO contribute their new part (the
    replacement rows are new content; this is an insert-only feed, so
    the replaced rows are not emitted as deletes — the documented
    contract, same as the view change feed).

    Incremental consumers (downstream rollups, exports) read each
    version delta instead of re-scanning the table — commit-sized
    work, never table-sized."""
    fs = lake_fs(spark, path)
    latest = current_version(spark, path)
    if to_version is None:
        to_version = latest
    if to_version > latest or from_version > to_version:
        raise FileNotFoundError(
            f"table_changes({from_version}, {to_version}) under {path}: "
            f"latest committed version is v{latest}"
        )
    added: dict[str, dict] = {}
    removed: set[str] = set()
    for v in range(from_version + 1, to_version + 1):
        c = _read_commit(fs, path, v)
        for r in c.get("removes", []):
            removed.add(r)
            added.pop(r, None)
        for a in c.get("adds", []):
            # a compact's adds REWRITE content visible before the
            # window — not new rows; append/refresh/overwrite adds are
            if c.get("operation") != "compact":
                added[a["path"]] = a.get("partition", {})
    parts = sorted(added)
    if not parts:
        # schema-stable empty frame from the snapshot
        from pyspark.sql import functions as F

        _v, live = _snapshot(fs, path, to_version)
        if not live:
            raise FileNotFoundError(f"no live parts under {path} at v{to_version}")
        return spark.read.parquet(sorted(live)[0]).filter(F.lit(False))
    return spark.read.parquet(*parts)


def checkpoint(spark: SparkSession, path: str) -> dict:
    """Write a checkpoint of the current live set so replay cost stays
    bounded as the log grows (Delta's parquet-checkpoint idea, JSON
    here — the live set is part-count-sized, not data-sized).
    Write-once via the same CAS primitive: two writers checkpointing
    the same version is an idempotent race, and a checkpoint never
    blocks commits (readers just start replay later). Time travel to
    pre-checkpoint versions still works — commit files are never
    deleted by this call."""
    fs = lake_fs(spark, path)
    v, live = _snapshot(fs, path)
    if v == 0:
        return {"version": 0, "written": False}
    payload = {
        "version": v,
        "live": [{"path": p, "partition": tag} for p, tag in sorted(live.items())],
    }
    won = fs.put_if_absent(
        _checkpoint_path(path, v), json.dumps(payload, indent=0).encode("utf-8")
    )
    return {"version": v, "written": bool(won)}


def vacuum(
    spark: SparkSession,
    path: str,
    keep_versions: int = 0,
    retention_seconds: float = 24 * 3600,
) -> list[str]:
    """Reap part directories that NO commit references — debris from
    transactions that wrote data but lost their conflict check or
    crashed before the CAS. Referenced-but-removed parts are kept (they
    back time travel); pass ``keep_versions=N`` to also drop parts
    whose last reference is older than the newest N versions AND that
    are not live (bounded time-travel retention, the expire_snapshots
    analog).

    **In-flight-writer safety (retention horizon).** Every transaction
    writes its part BEFORE winning the CAS (``append`` → ``_write_part``
    then ``_try_commit``), so at any instant an unreferenced part may
    belong to a writer that is about to commit. Reaping it would let the
    writer's CAS publish a dangling reference — permanent
    ``PATH_NOT_FOUND`` corruption on every later read. Therefore an
    unreferenced part is reaped only when its mtime is older than
    ``retention_seconds`` (default 24 h — Delta's
    ``deletedFileRetentionDuration`` idea): any sane commit completes
    within the horizon, so a part older than it is genuinely dead.
    ``retention_seconds=0`` is an explicit quiescent-table override —
    the caller asserts no writer is in flight (test/teardown use only).
    """
    import time as _time

    fs = lake_fs(spark, path)
    latest, live = _snapshot(fs, path)
    referenced: dict[str, int] = {}
    for v in range(1, latest + 1):
        c = _read_commit(fs, path, v)
        for a in c.get("adds", []):
            referenced[a["path"]] = v
        for r in c.get("removes", []):
            referenced[r] = v
    cutoff = latest - keep_versions if keep_versions > 0 else 0
    horizon = _time.time() - retention_seconds
    victims = []
    for p in fs.glob(fs_join(_part_dir(path), "*")):
        if p in live:
            continue
        last_ref = referenced.get(p)
        if last_ref is None:
            # possibly in-flight: only reap past the retention horizon
            try:
                if fs.mtime(p) <= horizon:
                    victims.append(p)
            except (OSError, FileNotFoundError):
                continue  # vanished concurrently — nothing to do
        elif keep_versions > 0 and last_ref <= cutoff:
            # referenced by a commit → it WAS committed, never in-flight;
            # expiry is governed by the version retention alone
            victims.append(p)
    for p in victims:
        fs.delete(p)
    return sorted(victims)
