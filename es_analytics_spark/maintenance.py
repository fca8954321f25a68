"""Lake maintenance jobs.

The reference's 200k-records-per-object flush target
(Collector.ts:178) is an anti-small-files heuristic; at lake scale the
engine needs explicit compaction (SURVEY.md §4 "small-file
compaction"): rewrite a partitioned table so files approach a target
size, preserving partition columns. Plain DataFrame rewrite — no
custom rules; Catalyst + maxRecordsPerFile do the sizing.

File operations route through the ``sources.fsio`` seam, so ``path``
may be a plain local path or any Hadoop URI (``s3a://`` etc., the
reference's StoreS3 analog — StoreS3.ts:21-35). Swap atomicity is
rename-level and has a crash window: between the two renames (target →
backup, staging → target) no table exists at ``path``; a crash there
needs a manual rename of the ``.__old__`` backup. On object stores
rename is copy+delete (not atomic at all) — concurrent readers need a
transactional table format (Delta/Iceberg), which this single-writer
contract deliberately stops short of.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from es_analytics_spark.sources.fsio import is_uri, join, lake_fs

# time-dependent SQL functions a retention predicate is allowed to use —
# they get pinned to literals once up front (see _pin_time_functions);
# bare current_date / current_timestamp (no parens) are valid ANSI SQL,
# but bare `now` is NOT a Spark function — only now() matches
_TIME_FN_RE = re.compile(
    r"\b(now)\s*\(\s*\)|\b(current_timestamp|localtimestamp|current_date)\b(\s*\(\s*\))?",
    re.IGNORECASE,
)
# genuinely non-deterministic functions: never valid in a delete
# predicate that is re-evaluated by scan, rewrite, and verification
_NONDET_FN_RE = re.compile(
    r"\b(rand|randn|random|uuid|shuffle|monotonically_increasing_id)\s*\(",
    re.IGNORECASE,
)
# quoted regions a textual substitution must never touch: single-quoted
# string literals ('' escapes) and backtick-quoted identifiers
_QUOTED_RE = re.compile(r"'(?:[^']|'')*'|`(?:[^`]|``)*`")


def _mask_quoted(sql: str) -> str:
    """Same-length copy of ``sql`` with every quoted region blanked, so
    regex offsets on the mask are valid offsets into the original."""
    return _QUOTED_RE.sub(lambda m: " " * len(m.group(0)), sql)


def _pin_time_functions(spark: SparkSession, sql: str) -> str:
    """Rewrite time-dependent functions in a predicate SQL string to
    literals evaluated ONCE, so the three separate queries a pruned
    delete runs (per-file hit scan, per-file rewrite filter,
    verification re-read) all see the same cutoff. Without pinning, a
    TTL predicate like ``ts < now() - interval 90 days`` drifts between
    the scan and the verification: rows expiring in that window show up
    as survivors and a correct delete reports ``verified=False``.

    Genuinely non-deterministic functions (rand/uuid/...) raise — no
    single evaluation point can make them consistent across queries.

    Matching is done on a quoted-region mask of the SQL, so a string
    literal like ``status = 'now()'`` or a backticked column named
    ```current_date``` is never rewritten. The literals are rendered
    JVM-SIDE (``CAST(current_timestamp() AS STRING)``) in the session
    timezone: a driver-side ``.first()`` datetime would be formatted in
    the driver OS timezone, and re-parsing it as a TIMESTAMP literal in
    a differently-pinned ``spark.sql.session.timeZone`` would shift the
    cutoff by the offset — a retention delete would silently remove
    rows hours outside the intended window.
    """
    masked = _mask_quoted(sql)
    if _NONDET_FN_RE.search(masked):
        raise ValueError(
            "delete_where: predicate uses a non-deterministic function "
            "(rand/uuid/...); it would be re-evaluated differently by the "
            "hit scan, the rewrites, and the verification read"
        )
    matches = list(_TIME_FN_RE.finditer(masked))
    if not matches:
        return sql
    row = spark.sql(
        "SELECT CAST(current_timestamp() AS STRING) AS ts, "
        "CAST(localtimestamp() AS STRING) AS lts, "
        "CAST(current_date() AS STRING) AS d"
    ).first()

    def _lit(m: re.Match) -> str:
        fn = (m.group(1) or m.group(2)).lower()
        if fn in ("now", "current_timestamp"):
            return f"TIMESTAMP '{row['ts']}'"
        if fn == "localtimestamp":
            # localtimestamp() is TIMESTAMP_NTZ — keep the type on the pin
            return f"TIMESTAMP_NTZ '{row['lts']}'"
        return f"DATE '{row['d']}'"

    out, last = [], 0
    for m in matches:
        out.append(sql[last: m.start()])
        out.append(_lit(m))
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def table_stats(spark: SparkSession, path: str) -> dict:
    sizes = lake_fs(spark, path).file_sizes(path, ".parquet")
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "avg_bytes": (sum(sizes) // len(sizes)) if sizes else 0,
    }


def _swap(spark: SparkSession, path: str, staging: str) -> None:
    """Replace ``path`` with ``staging`` via the two-rename dance.
    Single-writer contract; see module docstring for the crash window."""
    fs = lake_fs(spark, path)
    backup = path.rstrip("/") + ".__old__"
    fs.delete(backup)  # a crashed prior run may have left one behind
    fs.rename(path, backup)
    fs.rename(staging, path)
    fs.delete(backup)
    # the swap is an external rename Spark's shared FileStatusCache
    # cannot observe — without this, a later read of ``path`` in the
    # same session can list the pre-swap file generation and fail with
    # FILE_NOT_EXIST at execution
    spark.catalog.refreshByPath(path)


def compact(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``path`` in place with files sized toward
    ``target_file_bytes``. Returns before/after stats.

    Strategy: read, estimate rows/file from current bytes-per-row,
    write with maxRecordsPerFile + one shuffle-free coalesce pass to a
    staging dir, then swap (see module docstring for atomicity). On a
    cluster the same job runs per-partition-predicate to bound memory;
    local fixture sizes keep it single-pass here.
    """
    before = table_stats(spark, path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    bytes_per_row = max(before["total_bytes"] / max(n_rows, 1), 1.0)
    rows_per_file = max(int(target_file_bytes / bytes_per_row), 1)
    n_target_files = max(int(n_rows / rows_per_file), 1)

    staging = path.rstrip("/") + ".__compact__"
    writer = (
        df.repartition(n_target_files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(staging)

    _swap(spark, path, staging)
    after = table_stats(spark, path)
    return {"before": before, "after": after, "rows": n_rows}


def upsert(
    spark: SparkSession,
    path: str,
    updates,
    keys: list[str],
) -> dict:
    """MERGE-by-rewrite: upsert ``updates`` into the parquet table at
    ``path`` on ``keys`` — matched rows are replaced, unmatched rows
    inserted (the Delta MERGE semantics, without a transaction log).

    Like SQL/Delta MERGE, duplicate key tuples in ``updates`` are an
    error (each would try to replace the same target row); the check is
    one aggregate over the update set, done before any write.

    Plan shape: target LEFT ANTI updates on the keys (drop the rows
    being replaced) UNION ALL updates, rewritten to a staging dir and
    swapped (see module docstring for the atomicity contract). At scale
    the anti-join broadcasts the update set when small, and the rewrite
    is restricted to the partitions the updates touch (partition-pruned
    read via the updates' partition values); the fixture-size
    implementation rewrites the whole table.
    """
    from pyspark.sql import functions as F

    target = spark.read.parquet(path)
    missing = [k for k in keys if k not in target.columns or k not in updates.columns]
    if missing:
        raise ValueError(f"upsert keys {missing} absent from target or updates")
    dup = (
        updates.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"upsert updates contain duplicate key tuple {tuple(dup[0][k] for k in keys)}; "
            "deduplicate updates on the merge keys first (MERGE semantics)"
        )
    # Materialize the count before the swap: if ``updates`` was derived
    # from reading ``path`` itself, counting after the rewrite would
    # re-read the new data (or fail on the vanished files).
    n_updates = updates.count()
    kept = target.join(updates.select(*keys), on=keys, how="left_anti")
    merged = kept.unionByName(updates.select(*target.columns))

    staging = path.rstrip("/") + ".__upsert__"
    merged.write.mode("overwrite").parquet(staging)
    _swap(spark, path, staging)
    out = spark.read.parquet(path)
    return {"rows": out.count(), "updated_or_inserted": n_updates}


def cluster_by(
    spark: SparkSession,
    path: str,
    cluster_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``path`` range-clustered on ``cluster_cols`` (the
    OPTIMIZE ZORDER-lite for a single sort dimension set): rows are
    range-partitioned then sorted within files, so every file covers a
    narrow, non-overlapping slice of the cluster key and parquet
    row-group min/max stats let scans with predicates on those columns
    skip whole files/row groups instead of reading everything.

    One repartitionByRange shuffle + in-partition sort; file sizing via
    the same bytes-per-row estimate as compact. Swap semantics identical
    to compact (module docstring).
    """
    before = table_stats(spark, path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    bytes_per_row = max(before["total_bytes"] / max(n_rows, 1), 1.0)
    rows_per_file = max(int(target_file_bytes / bytes_per_row), 1)
    n_files = max(int(n_rows / rows_per_file), 1)

    staging = path.rstrip("/") + ".__cluster__"
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(staging)
    )
    _swap(spark, path, staging)
    return {"before": before, "after": table_stats(spark, path), "rows": n_rows}


def zorder_by(
    spark: SparkSession,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``path`` clustered on the z-order (Morton) curve of
    ``zorder_cols`` — multi-dimensional OPTIMIZE ZORDER without a
    table-format dependency. Each column is linearly normalized into
    [0, 2**bits) using its min/max (one stats pass), the bit
    interleave (functions.zorder) produces the curve position, and a
    repartitionByRange + in-partition sort on that position gives every
    output file a small bounding box in EVERY cluster dimension, so
    parquet footer min/max stats prune box predicates on any of them.

    Contrast cluster_by: perfect pruning on one leading key, none on
    the rest. Swap semantics identical to compact (module docstring).
    Two jobs (stats, rewrite) + the one range shuffle — same cost
    shape as cluster_by at any scale.
    """
    from pyspark.sql import functions as F

    from es_analytics_spark.functions.zorder import curve_position

    before = table_stats(spark, path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    # shared curve construction (type handling, bigint clamp) with
    # txlog.compact(zorder=True) — one source of truth for both paths
    z = curve_position(df, zorder_cols, bits)

    bytes_per_row = max(before["total_bytes"] / max(n_rows, 1), 1.0)
    rows_per_file = max(int(target_file_bytes / bytes_per_row), 1)
    n_files = max(int(n_rows / rows_per_file), 1)

    staging = path.rstrip("/") + ".__zorder__"
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(staging)
    )
    _swap(spark, path, staging)
    return {"before": before, "after": table_stats(spark, path), "rows": n_rows}


# Artifacts the engine's own jobs leave behind on crash: swap backups,
# staging rewrites, and Spark's output-committer scratch dirs.
_VACUUM_SUFFIXES = (".__old__", ".__compact__", ".__upsert__", ".__cluster__", ".__zorder__")


def vacuum(
    spark: SparkSession,
    lake_root: str,
    retention_hours: float = 168.0,
    dry_run: bool = False,
) -> list[str]:
    """Remove crash leftovers under ``lake_root``: swap backups and
    staging directories from interrupted compact/upsert/cluster/zorder
    runs, and ``_temporary`` output-committer scratch dirs — but only
    ones older than ``retention_hours`` (default 7 days, the Delta
    VACUUM convention), so a concurrently *running* rewrite's staging
    dir is never yanked out from under it.

    Scoped deliberately: only artifacts with the engine's own staging
    suffixes are candidates — vacuum never inspects or deletes data
    files inside live table directories, because without a manifest
    (no Delta/Iceberg here; see BASELINE.md's table-format decision)
    a "file not referenced by the table" test does not exist. The
    rename-swap contract guarantees anything carrying a staging suffix
    is either crash debris or an in-flight rewrite, and the retention
    window separates those two.

    Returns the list of removed (or, with ``dry_run``, would-remove)
    paths. Citation: reference keeps no janitor (write-once lake,
    Collector.ts:342-350); this is lake-operations surface the engine
    adds alongside compact/upsert.
    """
    import time as _time

    fs = lake_fs(spark, lake_root)
    cutoff = _time.time() - retention_hours * 3600.0
    victims: list[str] = []
    candidates: list[str] = []
    for suffix in _VACUUM_SUFFIXES:
        candidates.extend(fs.glob(join(lake_root, f"*{suffix}")))
        candidates.extend(fs.glob(join(lake_root, "*", f"*{suffix}")))
    candidates.extend(fs.glob(join(lake_root, "*", "_temporary")))
    candidates.extend(fs.glob(join(lake_root, "_temporary")))
    for path in sorted(set(candidates)):
        try:
            if fs.mtime(path) > cutoff:
                continue
        except Exception:
            continue  # raced with a concurrent cleanup — skip
        victims.append(path)
        if not dry_run:
            fs.delete(path)
    return victims


def erasure_predicates(key_col: str, values: list):
    """(match, keep) predicate pair shared by every erasure path.

    ``keep`` must be null-safe: ``~col.isin(values)`` evaluates to NULL
    (not TRUE) for NULL-key rows, and a ``.filter`` on it would silently
    drop every NULL-key row from each rewritten file — data loss beyond
    the erasure request that the survivor check (``filter(match)``)
    cannot detect, since NULL never matches. NULL identifies no subject,
    so NULL-key rows are never erasure targets: ``keep`` ORs in
    ``isNull()`` explicitly.
    """
    from pyspark.sql import functions as F

    match = F.col(key_col).isin(values)
    keep = ~match | F.col(key_col).isNull()
    return match, keep


def erase_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    values: list,
) -> dict:
    """Right-to-be-forgotten erasure: physically remove every row whose
    ``key_col`` is in ``values`` from the parquet table at ``path``,
    rewriting ONLY the files that contain matching rows (file-level
    pruning — the property that makes erasure tractable on a 100 TB
    table: after ``cluster_by(key_col)`` an erasure request touches a
    handful of files, and untouched files keep their bytes, stats, and
    cache residency). Returns an auditable receipt.

    Mechanics: one scan tags rows with ``input_file_name`` and counts
    per-file matches (file-count-bounded driver state, same class as
    ``table_stats``); each affected file is rewritten without the
    matching rows and atomically swapped in via ``replace_file`` (a
    file whose rows ALL match is deleted outright); a verification
    re-read proves zero survivors before the receipt is returned.
    Per-file replacement is idempotent — a crash mid-loop leaves some
    files already erased and a re-run completes the rest; no file is
    ever visible in a half-written state. The per-file loop is
    driver-sequenced; a cluster deployment fans the independent file
    rewrites out as parallel jobs.

    ``key_col`` must be a data column. Erasing on a *partition* column
    is a directory delete, not a rewrite — raises with that guidance.

    ``values`` is the erasure request batch (subject identifiers) —
    driver-sized by nature. Erasure sets big enough to need an
    anti-join belong to ``upsert``-style whole-table rewrites.
    """
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.read.parquet(path)
    if key_col not in df.columns:
        raise ValueError(f"erase_keys: {key_col!r} absent from {path}")

    pred, keep = erasure_predicates(key_col, values)
    return _prune_rewrite(
        spark, path, pred, keep, op="erase_keys", in_file_col=key_col
    )


def _prune_rewrite(
    spark: SparkSession,
    path: str,
    pred,
    keep,
    op: str,
    in_file_col: str | None = None,
) -> dict:
    """Shared file-pruned delete core (erase_keys / delete_where): scan
    once tagging ``input_file_name``, rewrite only files with matching
    rows (all-match files are deleted outright), atomic per-file
    replace, verification re-read. ``keep`` must be the NULL-safe
    complement of ``pred`` (see :func:`erasure_predicates`)."""
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    fs = lake_fs(spark, path)

    def _local(file_uri: str) -> str:
        if is_uri(path):
            return file_uri
        p = urlparse(file_uri)
        return unquote(p.path) if p.scheme else file_uri

    all_files = (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(
            F.count(F.when(pred, F.lit(1))).alias("hits"),
            F.count("*").alias("total"),
        )
        .collect()
    )
    n_files_total = len(all_files)
    per_file = [r for r in all_files if r["hits"] > 0]
    if not per_file:
        return {
            "rows_erased": 0,
            "files_rewritten": 0,
            "files_deleted": 0,
            "verified": True,
        }

    # partition-column predicates would scan fine (the value comes from
    # the directory) but the per-file rewrite below cannot express them:
    # the column is not IN the file
    sample_file = _local(per_file[0]["__file"])
    sample_cols = spark.read.parquet(sample_file).columns
    if in_file_col is not None and in_file_col not in sample_cols:
        raise ValueError(
            f"{op}: {in_file_col!r} is a partition column of {path}; "
            "delete the matching partition directories instead of rewriting files"
        )
    # general form of the same guard: a predicate MIXING partition and
    # data columns (``part_col = 1 AND v > 5``) analyzes fine on the
    # table but not on a bare file read — without this pre-check the
    # AnalysisException would fire mid-loop AFTER some all-match files
    # were already deleted, leaving a partially applied delete
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(sample_file).filter(keep).schema
    except AnalysisException as e:
        raise ValueError(
            f"{op}: predicate references column(s) not present in the "
            f"data files of {path} (partition columns live in the "
            "directory name, not the file; delete matching partition "
            f"directories instead): {e}"
        ) from None

    staging = path.rstrip("/") + ".__erase__"
    fs.delete(staging)
    rewritten = deleted = 0

    def _drop_crc(fpath: str) -> None:
        # Hadoop's checksummed local FS keeps a .<name>.crc sidecar; a
        # stale one would fail every read of the replaced bytes. It is
        # dropped BEFORE the file mutation: a crash between the two
        # leaves the old file without its sidecar (readable — Hadoop
        # skips verification when no .crc exists), never new bytes
        # under an old checksum (unreadable). No-op where no sidecar
        # exists (URI object stores).
        d, _, b = fpath.rpartition("/")
        fs.delete(f"{d}/.{b}.crc")

    try:
        for i, row in enumerate(per_file):
            f = _local(row["__file"])
            if row["hits"] == row["total"]:
                _drop_crc(f)
                fs.delete(f)
                deleted += 1
                continue
            slot = join(staging, f"f{i:05d}")
            (
                spark.read.parquet(f)
                .filter(keep)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(slot)
            )
            part = [p for p in fs.glob(join(slot, "part-*.parquet"))][0]
            _drop_crc(f)
            fs.replace_file(part, f)
            rewritten += 1
    finally:
        fs.delete(staging)

    # per-file replaces bypass Spark's committers — invalidate the
    # cached listing before the verification read (see _swap)
    spark.catalog.refreshByPath(path)
    if deleted == n_files_total:
        # whole-table expiry: every file was all-match and deleted, no
        # parquet parts remain — a re-read would raise "unable to infer
        # schema" AFTER the delete already succeeded. Zero files means
        # zero survivors by construction.
        survivors = 0
    else:
        survivors = spark.read.parquet(path).filter(pred).limit(1).count()
    return {
        "rows_erased": int(sum(r["hits"] for r in per_file)),
        "files_rewritten": rewritten,
        "files_deleted": deleted,
        "verified": survivors == 0,
    }


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
) -> dict:
    """Predicate delete (``DELETE FROM t WHERE predicate`` without a
    table format): physically remove every row matching ``predicate``
    (a SQL string or Column) from the parquet table at ``path``, with
    the same file-level pruning, atomic per-file replacement, crash
    idempotence, and verification re-read as :func:`erase_keys` — the
    retention/TTL primitive (``delete_where(t, "ts < now() - interval
    90 days")``).

    SQL DELETE semantics: only rows where the predicate is TRUE are
    removed; FALSE and NULL rows are kept (the null-safe ``keep`` is
    built here, not left to ``~pred``'s three-valued logic).

    Time-dependent predicates are supported ONLY as SQL strings:
    ``now()`` / ``current_timestamp`` / ``current_date`` /
    ``localtimestamp`` are pinned to literals evaluated once up front,
    so the hit scan, the per-file rewrites, and the verification
    re-read all agree on the cutoff. A ``Column`` predicate embedding
    those functions (or any predicate using rand/uuid/...) raises —
    pass the SQL string form, or compute the literal cutoff yourself.

    On a time-clustered table (``cluster_by(ts)`` or append-ordered
    ingestion), a TTL predicate matches whole files, which this op
    deletes outright without rewriting — O(expired files) metadata
    work, the property that makes retention viable at 100 TB. The
    predicate must be over data columns; partition-column retention is
    a directory delete (raises with that guidance, same as
    erase_keys).
    """
    from pyspark.sql import Column, functions as F

    if isinstance(predicate, str):
        pred = F.expr(_pin_time_functions(spark, predicate))
    else:
        pred = predicate
        if not isinstance(pred, Column):
            raise TypeError(
                "delete_where: predicate must be a SQL string or Column"
            )
        # a Column's expression tree isn't rewritable from Python —
        # reject time-dependent/non-deterministic ones instead of
        # silently evaluating them at three different wall-clock times
        text = str(pred)
        if _TIME_FN_RE.search(text) or _NONDET_FN_RE.search(text):
            raise ValueError(
                "delete_where: Column predicate uses a time-dependent or "
                "non-deterministic function; pass the predicate as a SQL "
                "string so the cutoff can be pinned to a literal once"
            )
    keep = ~F.coalesce(pred, F.lit(False))
    # a predicate over a partition column shows up as "column not in
    # file"; detection happens in the shared core only for simple
    # column references — for arbitrary expressions Spark's analyzer
    # raises on the per-file read, which is the same guidance
    receipt = _prune_rewrite(spark, path, pred, keep, op="delete_where")
    return {
        "rows_deleted": receipt["rows_erased"],
        "files_rewritten": receipt["files_rewritten"],
        "files_deleted": receipt["files_deleted"],
        "verified": receipt["verified"],
    }


def table_diff(
    spark: SparkSession,
    path_a: str,
    path_b: str,
    keys: list[str],
) -> dict:
    """Row-level diff between two parquet table snapshots, keyed by
    ``keys``: how many key tuples were added (only in B), removed
    (only in A), changed (present in both, any non-key column
    differs), and unchanged — the validation a migration, compaction,
    backfill, or erasure run is signed off against (compact must diff
    empty; an erasure must diff exactly the victim keys).

    Comparison is distributed end-to-end: one full-outer join on the
    keys with a hash over the non-key columns on each side (xxhash64 —
    arbitrary width, no driver state), then a 4-way conditional count.
    At 100 TB both sides shuffle once on the key; with pre-bucketed
    snapshots the join is exchange-free.
    """
    from pyspark.sql import functions as F

    # snapshots are routinely produced by out-of-band copies/swaps the
    # session's file-index cache hasn't observed
    spark.catalog.refreshByPath(path_a)
    spark.catalog.refreshByPath(path_b)
    a = spark.read.parquet(path_a)
    b = spark.read.parquet(path_b)
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"table_diff: column sets differ: {sorted(set(a.columns) ^ set(b.columns))}"
        )
    missing = [k for k in keys if k not in a.columns]
    if missing:
        raise ValueError(f"table_diff: keys {missing} absent")
    others = sorted(c for c in a.columns if c not in keys)

    def sig(df):
        # order-independent multiset signature per key: COUNT plus the
        # DECIMAL sum of per-row xxhash64 (decimal: a long sum of
        # full-range hashes overflows, which ANSI mode turns into a
        # runtime error)
        h = (
            F.xxhash64(
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00"))
                    for c in others
                ]
            )
            if others
            else F.lit(0)
        )
        return df.groupBy(*keys).agg(
            F.count("*").alias("__n"),
            F.sum(h.cast("decimal(38,0)")).alias("__h"),
        )

    ja = sig(a).withColumnRenamed("__n", "__na").withColumnRenamed("__h", "__ha")
    jb = sig(b).withColumnRenamed("__n", "__nb").withColumnRenamed("__h", "__hb")
    j = ja.join(jb, keys, "full_outer")
    counts = j.agg(
        F.sum(F.when(F.col("__na").isNull(), 1).otherwise(0)).alias("added"),
        F.sum(F.when(F.col("__nb").isNull(), 1).otherwise(0)).alias("removed"),
        F.sum(
            F.when(
                F.col("__na").isNotNull()
                & F.col("__nb").isNotNull()
                & (
                    (F.col("__na") != F.col("__nb"))
                    | (F.col("__ha") != F.col("__hb"))
                ),
                1,
            ).otherwise(0)
        ).alias("changed"),
        F.sum(
            F.when(
                (F.col("__na") == F.col("__nb")) & (F.col("__ha") == F.col("__hb")), 1
            ).otherwise(0)
        ).alias("unchanged"),
    ).first()
    out = {k: int(counts[k] or 0) for k in ("added", "removed", "changed", "unchanged")}
    out["identical"] = (
        out["added"] == 0 and out["removed"] == 0 and out["changed"] == 0
    )
    return out


def scd2_merge(
    spark: SparkSession,
    path: str,
    updates,
    key_cols: list[str],
    ts_col: str,
) -> dict:
    """Type-2 slowly-changing-dimension merge: maintain full attribute
    history for each key instead of overwriting. The table at ``path``
    carries three system columns — ``__valid_from``, ``__valid_to``
    (NULL while open) and ``__is_current`` — and each incoming
    (key, attrs, ts) row either:

    - opens the key's first version (no current row exists),
    - closes the current version at ``ts`` and opens a new one (any
      non-key attribute differs), or
    - is a no-op (attributes identical to the current version).

    Multiple updates for one key in a single call collapse to the
    LATEST by (ts, then attribute order) — deterministic latest-wins,
    documented difference from ``upsert``'s duplicate rejection
    (dimension feeds routinely batch several days of changes).

    The rewrite is history ∪ closed-currents ∪ new-versions to a
    staging dir + the standard atomic swap. At scale the anti/equi
    joins key on ``key_cols`` (broadcast when the update batch is
    small) and the rewrite restricts to touched partitions; the
    fixture-size implementation rewrites the whole table. Point-in-time
    reads are ``__valid_from <= t AND (t < __valid_to OR __valid_to IS
    NULL)`` — the SCD2 as-of predicate.

    First call may target an empty/nonexistent path (initial load).
    Returns {"opened", "closed", "unchanged", "rows"}.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    fs = lake_fs(spark, path)
    attr_cols = sorted(c for c in updates.columns if c not in key_cols + [ts_col])
    latest = (
        updates.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*key_cols).orderBy(
                    F.col(ts_col).desc(), *[F.col(c).desc_nulls_last() for c in attr_cols]
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    def attr_sig(df):
        return F.xxhash64(
            *[F.coalesce(F.col(c).cast("string"), F.lit("\x00null\x00")) for c in attr_cols]
        )

    if fs.exists(path):
        spark.catalog.refreshByPath(path)
        target = spark.read.parquet(path)
        current = target.filter(F.col("__is_current"))
        history = target.filter(~F.col("__is_current"))
    else:
        target = None
        current = history = None

    if current is not None:
        cur_keyed = current.withColumn("__sig", attr_sig(current))
        upd_keyed = latest.withColumn("__sig_new", attr_sig(latest))
        j = cur_keyed.alias("c").join(
            upd_keyed.alias("u"), key_cols, "full_outer"
        )
        # classify: update-only keys open; matching keys with differing
        # sigs close+open; identical sigs no-op; target-only keys pass
        changed = j.filter(
            F.col("c.__sig").isNotNull()
            & F.col("u.__sig_new").isNotNull()
            & (F.col("c.__sig") != F.col("u.__sig_new"))
        )
        n_changed = changed.count()
        brand_new = j.filter(F.col("c.__sig").isNull())
        n_new = brand_new.count()
        unchanged_keys = j.filter(
            F.col("c.__sig").isNotNull()
            & F.col("u.__sig_new").isNotNull()
            & (F.col("c.__sig") == F.col("u.__sig_new"))
        ).count()

        changed_key_rows = changed.select(*[F.col(f"u.{k}") for k in key_cols])
        closers = (
            current.join(changed_key_rows, key_cols, "left_semi")
            .join(
                latest.select(*key_cols, F.col(ts_col).alias("__close_at")),
                key_cols,
            )
            .withColumn("__valid_to", F.col("__close_at"))
            .withColumn("__is_current", F.lit(False))
            .drop("__close_at")
        )
        keep_current = current.join(changed_key_rows, key_cols, "left_anti")
        openers_src = latest.join(
            current.select(*key_cols), key_cols, "left_semi"
        ).join(changed_key_rows, key_cols, "left_semi").unionByName(
            latest.join(current.select(*key_cols), key_cols, "left_anti")
        )
        openers = (
            openers_src.withColumn("__valid_from", F.col(ts_col))
            .withColumn("__valid_to", F.lit(None).cast("timestamp"))
            .withColumn("__is_current", F.lit(True))
            .drop(ts_col)
        )
        out = (
            history.unionByName(keep_current)
            .unionByName(closers)
            .unionByName(openers)
        )
        opened = n_changed + n_new
        closed = n_changed
    else:
        out = (
            latest.withColumn("__valid_from", F.col(ts_col))
            .withColumn("__valid_to", F.lit(None).cast("timestamp"))
            .withColumn("__is_current", F.lit(True))
            .drop(ts_col)
        )
        opened = latest.count()
        closed = unchanged_keys = 0

    staging = path.rstrip("/") + ".__scd2__"
    out.write.mode("overwrite").parquet(staging)
    if fs.exists(path):
        _swap(spark, path, staging)
    else:
        fs.rename(staging, path)
        spark.catalog.refreshByPath(path)
    n_rows = spark.read.parquet(path).count()
    return {
        "opened": int(opened),
        "closed": int(closed),
        "unchanged": int(unchanged_keys),
        "rows": int(n_rows),
    }


def analyze(
    spark: SparkSession,
    tables: dict[str, str] | list[str],
    columns: dict[str, list[str]] | None = None,
) -> dict[str, dict]:
    """Cost-based-optimizer statistics: run ``ANALYZE TABLE … COMPUTE
    STATISTICS [FOR COLUMNS …]`` over catalog tables so Catalyst's CBO
    (``spark.sql.cbo.enabled``) can estimate post-filter/join
    cardinalities from row counts and column NDV/min/max instead of raw
    file sizes — the enablement that flips borderline join strategies
    (a dim that is too big to broadcast on disk but tiny after a
    selective filter becomes a BroadcastHashJoin once column stats let
    the planner see the selectivity; ``tests/test_plans.py`` pins that
    flip).

    ``tables``: catalog table names, or ``{name: parquet_path}`` to
    (idempotently) register unmanaged external tables over an existing
    lake path first — registration is metadata-only, no data copy, so
    the same parquet files serve both path-based reads and
    stats-informed catalog reads. ``columns``: per-table column lists
    for ``FOR COLUMNS`` (column-level NDV/min/max/null-count; table
    row-count/size stats are always computed).

    Returns per-table stats as recorded in the catalog
    (``{name: {"sizeInBytes": int, "rowCount": int | None,
    "columns": [analyzed cols]}}``) read back via
    ``DESCRIBE TABLE EXTENDED``, proving the stats actually landed
    rather than echoing the request.

    Scale: ANALYZE is one distributed scan per table (plus one per
    column set); on a 100 TB lake it is scheduled maintenance after
    bulk loads, exactly like compaction. Stats staleness is the
    documented trade — re-run after mutations big enough to change
    plan choices.
    """
    def _norm_loc(p: str) -> tuple[str, str]:
        from urllib.parse import unquote, urlparse

        u = urlparse(p)
        return (u.netloc, (unquote(u.path) if u.scheme else p).rstrip("/"))

    if isinstance(tables, dict):
        for name, path in tables.items():
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {name} USING parquet "
                f"LOCATION '{path}'"
            )
            # IF NOT EXISTS silently no-ops when a same-named table
            # already points elsewhere — ANALYZE would then compute (and
            # this function would report) stats for the WRONG data while
            # appearing to succeed for the requested path
            loc = [
                r["data_type"]
                for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
                if r["col_name"] == "Location"
            ]
            if loc and _norm_loc(loc[0]) != _norm_loc(path):
                raise ValueError(
                    f"analyze: catalog table {name!r} already exists at "
                    f"{loc[0]}, not the requested {path}; DROP TABLE it "
                    "or register under a different name"
                )
        names = list(tables)
    else:
        names = list(tables)
    out: dict[str, dict] = {}
    for name in names:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        cols = (columns or {}).get(name)
        if cols:
            collist = ", ".join(cols)
            spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS FOR COLUMNS {collist}")
        stats_row = [
            r
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
            if r["col_name"] == "Statistics"
        ]
        size = rows = None
        if stats_row:
            text = stats_row[0]["data_type"]  # e.g. "12345 bytes, 678 rows"
            for part in text.split(","):
                part = part.strip()
                if part.endswith("bytes"):
                    size = int(part.split()[0])
                elif part.endswith("rows"):
                    rows = int(part.split()[0])
        out[name] = {"sizeInBytes": size, "rowCount": rows, "columns": cols or []}
    return out
