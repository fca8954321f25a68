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
    import uuid

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
) -> dict:
    """Transactional append: write an immutable part, then CAS it into
    the log. Blind appends commute, so losing the CAS race costs one
    metadata retry — the part is NOT rewritten. Returns
    {"version", "part"}."""
    fs = lake_fs(spark, path)
    part = _write_part(spark, path, df)
    payload = {
        "operation": "append",
        "adds": [{"path": part, "partition": partition or {}}],
        "removes": [],
        "scope_partition": partition,
    }
    v = current_version(spark, path)
    for _ in range(max_retries):
        v += 1
        if _try_commit(fs, path, v, payload):
            return {"version": v, "part": part}
        v = max(v, current_version(spark, path))
    raise CommitConflict(f"append lost the CAS {max_retries} times under {path}")


def _intervening(fs, path: str, since: int, until: int) -> list[dict]:
    return [_read_commit(fs, path, v) for v in range(since + 1, until + 1)]


def compact(
    spark: SparkSession,
    path: str,
    max_retries: int = 10,
) -> dict:
    """Transactional compaction: rewrite the snapshot's live parts into
    one part per partition tag, then commit {adds, removes=snapshot
    parts}. A CAS loss re-attaches at a later version iff no
    intervening commit removed any part we are removing (intervening
    APPENDS are safe — they stay live, simply not compacted by this
    run); otherwise :class:`CommitConflict` — the caller re-runs, and
    the orphaned rewrite is vacuum fodder. Returns {"version",
    "parts_before", "parts_after"}."""
    fs = lake_fs(spark, path)
    v0, live = _snapshot(fs, path)
    if len(live) <= 1:
        return {"version": v0, "parts_before": len(live), "parts_after": len(live)}

    groups: dict[tuple, list[str]] = {}
    for p, tag in live.items():
        groups.setdefault(tuple(sorted(tag.items())), []).append(p)
    adds = []
    for key, parts in sorted(groups.items()):
        merged = spark.read.parquet(*sorted(parts))
        part = _write_part(spark, path, merged.coalesce(1))
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
    :class:`CommitConflict`. Returns {"version", "removed_parts"}."""
    fs = lake_fs(spark, path)
    if not isinstance(partition, dict) or not partition:
        raise ValueError("overwrite_partition: partition must be a non-empty dict")
    v0, live = _snapshot(fs, path)
    removes = sorted(
        p
        for p, tag in live.items()
        if all(tag.get(k) == pv for k, pv in partition.items()) and tag
    )
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
        for a in c.get("adds", []):
            tag = a.get("partition", {})
            if tag and all(tag.get(k) == pv for k, pv in partition.items()):
                return True
        return False

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


def vacuum(spark: SparkSession, path: str, keep_versions: int = 0) -> list[str]:
    """Reap part directories that NO commit references — debris from
    transactions that wrote data but lost their conflict check or
    crashed before the CAS. Referenced-but-removed parts are kept (they
    back time travel); pass ``keep_versions=N`` to also drop parts
    whose last reference is older than the newest N versions AND that
    are not live (bounded time-travel retention, the expire_snapshots
    analog)."""
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
    victims = []
    for p in fs.glob(fs_join(_part_dir(path), "*")):
        if p in live:
            continue
        last_ref = referenced.get(p)
        if last_ref is None or (keep_versions > 0 and last_ref <= cutoff):
            victims.append(p)
    for p in victims:
        fs.delete(p)
    return sorted(victims)
