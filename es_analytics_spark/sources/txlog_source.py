"""Streaming SOURCE over the transaction log: ``spark.readStream
.format("txlog_feed")`` — the read half of the streaming↔txlog loop
(the write half is ``streaming/txlog_sink.stream_to_txlog``).

Round 8 made the txlog a transactional multi-writer table format with a
change feed (``table_changes`` / ``table_changes_cdf``) and an
exactly-once streaming SINK; this module closes the loop so a txlog
table is also a first-class Structured Streaming *source* — the Delta
streaming-source role (`spark.readStream.format("delta")`), built on
PySpark 4's Python DataSource streaming API (the same pluggable-citizen
pattern as ``typed_csv_ds.py``).

Design, Spark-first:

- **Offsets are commit versions** (``{"version": N}``). A micro-batch
  covers the commit window ``(start, end]``; parts are immutable and
  the window replay is a pure function of the commit dicts
  (:func:`txlog._insert_window_parts` / :func:`txlog._cdf_commit_actions`
  — shared with the batch feeds so the two can never drift), so
  ``partitions(start, end)`` is deterministic and replay under the
  checkpoint WAL is exactly-once.
- **One input partition per parquet file** inside the window's part
  directories — reads distribute across executors and scale with data,
  not with 1 task per commit. Rows travel as Arrow record batches
  (``pyarrow.parquet`` → ``RecordBatch`` yields), never per-row Python.
- **Rate limiting**: ``max_versions_per_batch`` bounds each trigger's
  window (Delta's ``maxFilesPerTrigger`` shape), so a consumer
  bootstrapping against a long history progresses in bounded,
  checkpointed steps instead of one giant batch.
- **Three modes**, Delta-parity semantics:

  * default (strict appends): any data-changing non-append commit in a
    window fails the stream with the version and operation named —
    silently skipping a delete/overwrite would be data loss the
    consumer can't detect (Delta raises the same way);
  * ``ignore_changes=true``: replacement ops don't fail; the window
    feeds exactly what batch :func:`txlog.table_changes` would
    (insert-only replay, survivor rewrites invisible);
  * ``cdf=true``: row-level change feed — every row tagged
    ``_change_type`` (insert|delete) and ``_commit_version``, reading
    the commit-recorded change parts; an upsert streams as
    delete(old)+insert(new) at one version.

- **Schema is the committed schema** (schema-in-commit), never file
  sampling. A stream plans with the schema at start; if a later commit
  evolves the table, the batch that first covers it fails with an
  explicit "restart to pick up the evolved schema" error instead of
  silently dropping the new column (Delta fails streams on schema
  change for the same reason). Pre-evolution parts align with nulls.

The log and part files are read with plain Python I/O (the planner runs
in the driver's Python worker, the readers in executor Python workers —
no SparkSession exists there), so the source requires a LOCAL table
path. URI stores (s3a/hdfs) would plug an fsspec filesystem into
``_PyLog``; the seam is one class, documented at the boundary the same
way ``fsio.HadoopFS`` is for the JVM half.

Reference parity: the reference's pipeline ends at write-once lake
objects (lib/store/Store.ts:4-8) that downstreams poll; this source is
that poll loop upgraded to checkpointed, exactly-once, version-cursor
streaming.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..txlog import _cdf_commit_actions, _insert_window_parts
from ..txlog import _widens_to as _txwiden
from .fsio import is_uri

_CDF_COLS = ("_change_type", "_commit_version")


class _PyLog:
    """Driver/executor-side commit-log access with plain Python I/O
    (no SparkSession). Local paths only — the URI seam documented in
    the module docstring."""

    def __init__(self, path: str):
        if is_uri(path):
            raise ValueError(
                "txlog_feed reads the commit log with plain Python I/O and "
                f"supports local table paths only, got {path!r}; URI stores "
                "need an fsspec filesystem plugged into _PyLog (documented "
                "seam)"
            )
        if not os.path.isabs(path):
            # same split-brain refusal as txlog._log_dir: the JVM and the
            # Python workers may not share a working directory
            raise ValueError(
                f"txlog_feed table path must be absolute, got {path!r}"
            )
        self.path = path
        self._log = os.path.join(path, "_txlog")

    def current_version(self) -> int:
        """Newest committed version — pointer + tail probing, mirroring
        txlog._latest_version: latestOffset() fires every trigger, so an
        O(total-commits) directory LIST here would make the poll loop
        itself the metadata bottleneck on a long-lived table. Falls back
        to the full glob when no pointer exists (young/legacy log)."""
        hint = 0
        try:
            with open(os.path.join(self._log, "_last_checkpoint"), "rb") as f:
                hint = int(json.loads(f.read().decode("utf-8"))["version"])
        except Exception:
            pass
        if hint > 0:
            v = hint
            while os.path.exists(os.path.join(self._log, f"v{v + 1:06d}.json")):
                v += 1
            return v
        vs = [
            int(os.path.basename(p)[1:-5])
            for p in _glob.glob(os.path.join(self._log, "v*.json"))
        ]
        return max(vs, default=0)

    def commit(self, version: int) -> dict:
        from ..txlog import PROTOCOL_VERSION, ProtocolVersionError

        try:
            with open(os.path.join(self._log, f"v{version:06d}.json"), "rb") as f:
                c = json.loads(f.read().decode("utf-8"))
        except FileNotFoundError:
            raise FileNotFoundError(
                f"txlog_feed: commit v{version} under {self.path} was reaped "
                "by log retention (txlog.clean_log) — restart the stream "
                f"from a newer starting_version, or re-bootstrap from a "
                "snapshot"
            ) from None
        if c.get("protocol", 1) > PROTOCOL_VERSION:
            # same reader contract as txlog._read_commit: never silently
            # misread a future writer's commit semantics
            raise ProtocolVersionError(
                f"commit v{version} under {self.path} was written at txlog "
                f"protocol {c['protocol']}; this reader supports <= "
                f"{PROTOCOL_VERSION} — upgrade the engine"
            )
        return c

    def committed_schema(self, version: int | None = None) -> dict:
        """Latest commit schema at-or-before ``version`` (schema-in-commit
        walk-back, mirroring txlog._committed_schema; a walk that runs
        into log-retention-reaped commits answers from the surviving
        checkpoint's folded schema)."""
        v = self.current_version() if version is None else version
        while v >= 1:
            try:
                sj = self.commit(v).get("schema")
            except FileNotFoundError:
                sj = self._checkpoint_schema(v)
                if sj is not None:
                    return sj
                raise
            if sj is not None:
                return sj
            v -= 1
        raise ValueError(
            f"txlog_feed: no committed schema under {self.path} — the table "
            "is empty or predates schema-in-commit; append once with the "
            "current writer to record one"
        )

    def _newest_footer(self, version: int | None, key: str) -> dict | None:
        """Newest checkpoint FOOTER at/below ``version`` (None = any)
        that carries folded state ``key`` — footer-only reads, so a
        chunked (format-2) checkpoint costs no chunk I/O here."""
        cks = sorted(
            int(os.path.basename(p)[len("checkpoint.v"):-5])
            for p in _glob.glob(os.path.join(self._log, "checkpoint.v*.json"))
        )
        from ..txlog import PROTOCOL_VERSION, ProtocolVersionError

        for cv in reversed([c for c in cks if version is None or c <= version]):
            with open(
                os.path.join(self._log, f"checkpoint.v{cv:06d}.json"), "rb"
            ) as f:
                ck = json.loads(f.read().decode("utf-8"))
            if ck.get("protocol", 1) > PROTOCOL_VERSION:
                raise ProtocolVersionError(
                    f"checkpoint v{cv} under {self.path} was written at txlog "
                    f"protocol {ck['protocol']}; this reader supports <= "
                    f"{PROTOCOL_VERSION} — upgrade the engine"
                )
            if ck.get(key) is not None:
                return ck
        return None

    def _checkpoint_schema(self, version: int) -> dict | None:
        """Folded schema of the newest checkpoint <= ``version`` (the
        retention boundary's authoritative copy), None when no folded
        checkpoint survives."""
        ck = self._newest_footer(version, "schema")
        return ck["schema"] if ck is not None else None

    def version_at_timestamp(self, ts: float) -> int:
        """The snapshot version live at wall-clock ``ts`` — the plain-
        Python twin of :func:`txlog.version_at_timestamp`, with the SAME
        running-max stamp normalization (writers' clocks may skew; the
        version order is the serialization order) and folded-checkpoint
        seeding at the retention boundary. Stream-bootstrap semantics:
        a timestamp EARLIER than the first retained commit on an
        untruncated log returns 0 (the stream replays full history —
        there is no snapshot to pin, unlike the batch AS-OF read which
        raises); a timestamp inside history that log retention already
        reaped raises :class:`txlog.VersionExpiredError`."""
        from ..txlog import VersionExpiredError

        vs = sorted(
            int(os.path.basename(p)[1:-5])
            for p in _glob.glob(os.path.join(self._log, "v*.json"))
        )
        chosen, running = 0, float("-inf")
        if not vs:
            ck = self._newest_footer(None, "ts")
            if ck is None:
                return 0  # empty/young table: feed whatever arrives
            if ck["ts"] <= ts:
                return ck["version"]
            raise VersionExpiredError(
                f"starting_timestamp {ts} under {self.path} resolves into "
                "history that log retention already reaped (earliest "
                f"retained snapshot is v{ck['version']} at ts {ck['ts']})"
            )
        if vs[0] > 1:
            ck = self._newest_footer(vs[0] - 1, "ts")
            if ck is not None:
                if ck["ts"] <= ts:
                    chosen, running = ck["version"], ck["ts"]
                else:
                    raise VersionExpiredError(
                        f"starting_timestamp {ts} under {self.path} resolves "
                        "into history that log retention already reaped "
                        f"(earliest retained snapshot is v{ck['version']} "
                        f"at ts {ck['ts']})"
                    )
        for v in vs:
            running = max(running, self.commit(v).get("ts", float("-inf")))
            if running <= ts:
                chosen = v
        if chosen == 0 and vs[0] > 1:
            # truncated prefix with no folded stamp to anchor on: the
            # timestamp falls inside reaped history — never guess
            raise VersionExpiredError(
                f"starting_timestamp {ts} under {self.path} resolves into "
                "history that log retention already reaped; start from a "
                "newer timestamp/version or re-bootstrap from a snapshot"
            )
        return chosen

    def part_files(self, part_dir: str) -> list[str]:
        files = sorted(_glob.glob(os.path.join(part_dir, "*.parquet")))
        if not files and not os.path.isdir(part_dir):
            raise FileNotFoundError(
                f"txlog_feed: part {part_dir} is gone — expired by "
                "vacuum retention; restart the stream from a newer "
                "starting_version or re-bootstrap from a snapshot"
            )
        return files


def _field_phys(f: dict) -> str:
    return (f.get("metadata") or {}).get("cm.phys", f["name"])


def _check_no_unseen_columns(commit_schema: dict | None, query_by_phys: dict,
                             latest_phys: set[str], version: int) -> None:
    """Plan-time guard: a commit whose schema carries columns the
    running query never planned cannot feed without silently dropping
    them. Identity is the PHYSICAL column name (rename-stable): a
    pre-rename commit whose logical name differs from the query's is
    the SAME column and feeds fine; only a genuinely new physical
    column trips the guard. Two distinct remedies, named honestly: if
    the LATEST table schema still has the columns, the table evolved
    after the stream started and a restart re-plans with them (Delta
    parity); if it does not, a later replace_schema overwrite (or
    drop_column) removed them — no restart can represent this window,
    so start past it or consume it via the batch feed.

    TYPES are checked on the same physical pairing: a commit whose
    column is NARROWER than the planned type feeds fine (the Arrow
    reader upcasts — type-widening parity with the batch scan); a
    commit WIDER than the planned type means a widening landed after
    the stream planned, and the stream must restart to re-plan wide
    (Delta fails streams on schema change the same way) — silently
    downcasting could overflow mid-batch."""
    if not commit_schema:
        return
    extra = []
    for f in commit_schema.get("fields", []):
        q = query_by_phys.get(_field_phys(f))
        if q is None:
            extra.append(f)
        elif q[1] != f["type"] and not _txwiden(f["type"], q[1]):
            if _txwiden(q[1], f["type"]):
                raise ValueError(
                    f"txlog_feed: commit v{version} widened column "
                    f"{f['name']!r} to {f['type']} (the running stream "
                    f"planned {q[0]!r} as {q[1]}); restart the stream to "
                    "pick up the widened schema"
                )
            raise ValueError(
                f"txlog_feed: commit v{version} carries column {f['name']!r} "
                f"at type {f['type']}, which the stream's planned type "
                f"{q[1]} cannot represent — consume the window via batch "
                "txlog.table_changes / table_changes_cdf, or start past it "
                f"(starting_version >= {version})"
            )
    if not extra:
        return
    extra_names = sorted(f["name"] for f in extra)
    extra_phys = {_field_phys(f) for f in extra}
    if extra_phys <= latest_phys:
        raise ValueError(
            f"txlog_feed: commit v{version} evolved the table schema with "
            f"column(s) {extra_names} the running stream did not plan; "
            "restart the stream to pick up the evolved schema"
        )
    raise ValueError(
        f"txlog_feed: commit v{version} carries column(s) {extra_names} "
        "that a later replace_schema overwrite dropped — no stream planned "
        "on the current schema can represent this window. Start the stream "
        f"past it (starting_version >= {version}), or consume the window "
        "via batch txlog.table_changes / table_changes_cdf"
    )


class _PartFilePartition(InputPartition):
    """One parquet file of one committed part: the unit of parallelism.

    ``change_type``/``version`` are None in the insert-only modes and
    set in cdf mode (they become the literal ``_change_type`` /
    ``_commit_version`` columns). ``renames`` maps PHYSICAL parquet
    column names to the logical names the query planned (column-mapping
    tables; empty for unmapped tables)."""

    def __init__(self, file: str, change_type: str | None, version: int | None,
                 renames: dict | None = None):
        self.file = file
        self.change_type = change_type
        self.version = version
        self.renames = renames or {}


def _arrow_target(schema):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _aligned_batches(partition: _PartFilePartition, schema, cdf: bool):
    """Read one parquet file and yield Arrow batches aligned to the
    query schema: committed-schema column order, evolution-added
    columns null-filled, types cast (e.g. INT96/ns timestamps → us).
    A file column absent from the query schema fails loudly — see
    _check_no_unseen_columns (this is the executor-side backstop)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = _arrow_target(schema)
    data_fields = [f for f in target if f.name not in _CDF_COLS] if cdf else list(target)
    table = pq.read_table(partition.file)
    if partition.renames:
        # column-mapping table: the bytes are stored under physical
        # names; present them under the logical names the query planned
        table = table.rename_columns(
            [partition.renames.get(n, n) for n in table.column_names]
        )
    known = {f.name for f in data_fields}
    extra = [n for n in table.column_names if n not in known]
    if extra:
        raise ValueError(
            f"txlog_feed: part file {partition.file} carries column(s) "
            f"{extra} the running stream did not plan; restart the stream "
            "to pick up the evolved schema"
        )
    n = len(table)
    cols = []
    for f in data_fields:
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != f.type:
                col = col.cast(f.type)
        else:
            col = pa.nulls(n, f.type)
        cols.append(col)
    if cdf:
        cols.append(pa.array([partition.change_type] * n,
                             target.field("_change_type").type))
        cols.append(pa.array([partition.version] * n,
                             target.field("_commit_version").type))
    for batch in pa.Table.from_arrays(cols, schema=target).to_batches():
        yield batch


def _check_cdf_entry_schema(entry_schema: dict | None, query_by_phys: dict,
                            version: int) -> None:
    """A change part is read with its WRITE-TIME schema (the commit
    records it per entry — a ``replace_schema`` overwrite's deletes
    carry the pre-replace schema). The streaming query's schema is
    fixed at plan time, so an entry column the query lacks — or holds
    at a different type — is UNREPRESENTABLE in the stream, and unlike
    mid-stream evolution a restart cannot fix it (the latest schema
    still lacks the old column). Fail at plan time with the honest
    remedies instead of an executor cast error or a silent coercion
    that would desync delete rows from the inserts they undo.

    Fields match by PHYSICAL identity (``cm.phys``), exactly like
    :func:`_check_no_unseen_columns`: on a column-mapping table every
    in-window action — plain inserts included — carries its commit's
    write-time schema, whose LOGICAL names may predate a rename. The
    physical name is the rename-stable column identity and the
    ``renames`` map already presents those bytes under the query's
    names, so only a genuinely absent or type-changed physical column
    is unrepresentable."""
    if not entry_schema:
        return
    for f in entry_schema.get("fields", []):
        q = query_by_phys.get(_field_phys(f))
        if q is not None and (q[1] == f["type"] or _txwiden(f["type"], q[1])):
            # equal, or the entry is NARROWER than the planned type —
            # the Arrow read upcasts losslessly (type-widening parity)
            continue
        problem = (
            f"column {f['name']!r} (physical {_field_phys(f)!r}, absent "
            "from the stream's schema)"
            if q is None
            else (
                f"column {f['name']!r} at type {f['type']} "
                f"(stream plans {q[0]!r} as {q[1]})"
            )
        )
        raise ValueError(
            f"txlog_feed: commit v{version}'s change rows carry {problem} — "
            "a replace_schema overwrite's change parts keep their write-time "
            "schema, which this stream cannot represent. Consume that window "
            "via batch txlog.table_changes_cdf, or start the stream past it "
            f"(starting_version >= {version})"
        )


def _plan_window(log: _PyLog, start_v: int, end_v: int, *, cdf: bool,
                 ignore_changes: bool, query_schema,
                 partition_filter: dict | None = None,
                 ) -> list[_PartFilePartition]:
    """Turn the commit window (start_v, end_v] into input partitions —
    the streaming analog of table_changes/table_changes_cdf's planning,
    via the SAME pure replay helpers. ``partition_filter`` keeps only
    parts whose commit-recorded tag matches on every filter key (the
    ``read_table(partition_filter=...)`` subset-match manifest
    contract): a per-tenant consumer then plans and reads only its
    partition's parts — untagged parts are invisible to it, same as
    the batch read."""
    def _struct_phys(f):
        md = f.metadata or {}
        return md.get("cm.phys", f.name)

    # ONE physical->logical map serves every file in the window: the
    # bytes store immutable physical names, and the query's own schema
    # (planned from the committed schema, metadata preserved through
    # the DataSource plumbing) says what to call them
    renames = {
        _struct_phys(f): f.name
        for f in query_schema.fields
        if f.name not in _CDF_COLS and _struct_phys(f) != f.name
    }
    # physical name -> (logical name, type): the rename-stable pairing
    # the change-part representability check runs on
    query_by_phys = {
        _struct_phys(f): (f.name, f.dataType.jsonValue())
        for f in query_schema.fields
        if f.name not in _CDF_COLS
    }
    latest_phys = {
        _field_phys(f) for f in log.committed_schema().get("fields", [])
    }
    commits = [log.commit(v) for v in range(start_v + 1, end_v + 1)]
    for v, c in zip(range(start_v + 1, end_v + 1), commits):
        _check_no_unseen_columns(c.get("schema"), query_by_phys, latest_phys, v)
        op = c.get("operation")
        if not cdf and not ignore_changes and op not in (
            # rename/drop/widen are metadata-only (no rows added or
            # removed): physical identity keeps the planned columns
            # complete across a rename (the stream presents ITS planned
            # names; a restart re-plans under the new ones); a drop
            # narrows the committed schema and the planned column
            # null-fills on newer parts; a widen is caught above when
            # the planned type can no longer represent the column
            "append", "compact", "set_properties",
            "rename_column", "drop_column", "widen_column",
        ):
            raise ValueError(
                f"txlog_feed: commit v{v} is a data-changing {op!r}; the "
                "default mode streams appends only (skipping it would be "
                "silent data loss). Set option ignore_changes=true for "
                "insert-only replacement semantics, or cdf=true for the "
                "row-level change feed"
            )
    out: list[_PartFilePartition] = []
    if cdf:
        for v, c in zip(range(start_v + 1, end_v + 1), commits):
            for a in _cdf_commit_actions(c, v):
                _check_cdf_entry_schema(a.get("schema"), query_by_phys, v)
                for f in log.part_files(a["path"]):
                    out.append(_PartFilePartition(f, a["change_type"], v, renames))
    else:
        added = _insert_window_parts(commits)
        for part in sorted(added):
            if partition_filter is not None and not all(
                added[part].get(k) == pv for k, pv in partition_filter.items()
            ):
                # subset tag matching — the read_table(partition_filter=)
                # manifest contract exactly (an untagged part never matches)
                continue
            for f in log.part_files(part):
                out.append(_PartFilePartition(f, None, None, renames))
    return out


def _parse_partition_filter(options, cdf: bool) -> dict | None:
    """``partition_filter`` option: a JSON object of tag equality, e.g.
    '{"tenant": "a"}'. Exact-tag manifest semantics (untagged parts
    invisible), so it composes with per-partition writers. Refused in
    cdf mode: change parts carry no partition tag (a delete may span
    partitions), so a filtered change feed would silently miss
    deletes — filter rows downstream instead."""
    raw = options.get("partition_filter")
    if raw is None:
        return None
    if cdf:
        raise ValueError(
            "txlog_feed: partition_filter is not supported with cdf=true — "
            "change parts are untagged (a delete may span partitions), so a "
            "tag-filtered change feed would silently miss deletes; filter "
            "rows in the query instead"
        )
    pf = json.loads(raw)
    if not isinstance(pf, dict):
        raise ValueError(
            f"txlog_feed: partition_filter must be a JSON object, got {raw!r}"
        )
    return pf


def _parse_ts_option(raw) -> float:
    """``starting_timestamp``: unix seconds (int/float) or an ISO-8601
    string (naive = local time, same as Python's fromisoformat)."""
    s = str(raw).strip()
    try:
        return float(s)
    except ValueError:
        import datetime as _dt

        try:
            return _dt.datetime.fromisoformat(s).timestamp()
        except ValueError:
            raise ValueError(
                f"txlog_feed: starting_timestamp must be unix seconds or an "
                f"ISO-8601 datetime, got {raw!r}"
            ) from None


class TxLogFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema, path: str, options):
        self._schema = schema
        self._log = _PyLog(path)
        self._cdf = str(options.get("cdf", "false")).lower() == "true"
        self._ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )
        raw_start_ts = options.get("starting_timestamp")
        if raw_start_ts is not None and options.get("starting_version") is not None:
            raise ValueError(
                "txlog_feed: pass starting_version OR starting_timestamp, "
                "not both"
            )
        if raw_start_ts is not None:
            # wall-clock bootstrap (Delta's startingTimestamp, the
            # ergonomic twin of AS-OF-TIMESTAMP reads): resolved ONCE at
            # stream start through the same running-max normalization as
            # txlog.version_at_timestamp; the WAL owns the cursor after
            self._start = self._log.version_at_timestamp(
                _parse_ts_option(raw_start_ts)
            )
        else:
            raw_start = str(options.get("starting_version", "0"))
            # "latest": new-data-only bootstrap (Delta's startingVersion=
            # latest) — resolve the current version ONCE at stream start;
            # the WAL then owns the cursor across restarts
            self._start = (
                self._log.current_version()
                if raw_start.lower() == "latest"
                else int(raw_start)
            )
        self._max_versions = int(options.get("max_versions_per_batch", 0))
        # ending_version: hard upper bound on the stream's cursor — the
        # drain trigger's termination point (see streaming.drain_txlog
        # _feed): commits landing AFTER a bounded backfill started must
        # not extend the drain, exactly like Delta's availableNow
        # snapshot bound. latestOffset never offers past it.
        raw_end = options.get("ending_version")
        self._ending = int(raw_end) if raw_end is not None else None
        self._partition_filter = _parse_partition_filter(options, self._cdf)
        # Rate-limit floor: the newest version known delivered/planned.
        # Call-order contract (probed empirically, pinned by
        # test_rate_limit_bounds_each_batch): a FRESH stream calls
        # latestOffset() BEFORE initialOffset(), while EVERY restart
        # calls partitions(committed, committed) before latestOffset().
        # So latestOffset() may lazily seed the floor with
        # starting_version — on a restart the floor was already raised
        # to the WAL-recovered offset by partitions(), and a clamp can
        # never regress the stream below a committed offset.
        #
        # The contract is additionally made CALL-ORDER ROBUST (it is an
        # empirically-probed API behavior, not a documented guarantee):
        # partitions() raises the floor with its START offset too (the
        # WAL-committed position Spark hands back), and if an offer of
        # new data (a latestOffset > floor) is followed by ANOTHER
        # latestOffset call with no partitions()/commit() in between,
        # Spark declined the offer — which only happens when our clamp
        # landed BELOW its committed offset. Each repeated call then
        # advances the clamp window by ONE more max_versions step
        # (floor + N*max_versions) instead of dropping the throttle
        # entirely: a stale floor converges on the committed offset in
        # bounded steps, while a Spark that legitimately re-asks before
        # consuming can never turn one micro-batch into the whole
        # backlog (the unclamped answer used to bypass
        # max_versions_per_batch completely on the second ask).
        self._floor: int | None = None
        self._offer_steps = 0  # consecutive undelivered offers

    def initialOffset(self) -> dict:  # noqa: N802
        self._floor = self._start
        return {"version": self._start}

    def latestOffset(self) -> dict:  # noqa: N802
        if self._floor is None:
            self._floor = self._start  # fresh stream (see __init__ contract)
        latest = self._log.current_version()
        if self._ending is not None:
            latest = min(latest, self._ending)
        if self._max_versions > 0:
            latest = min(
                latest,
                self._floor + self._max_versions * (self._offer_steps + 1),
            )
        out = max(latest, self._floor)  # never regress
        # an offer that is consumed resets via partitions()/commit();
        # a repeated ask widens the next clamp window by one step
        self._offer_steps = self._offer_steps + 1 if out > self._floor else 0
        return {"version": out}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = start["version"], end["version"]
        # `s` is the offset Spark recovered/committed — the authoritative
        # floor even if a future Spark calls latestOffset() first
        self._floor = max(self._floor or 0, s, e)
        self._offer_steps = 0
        return _plan_window(
            self._log, s, e, cdf=self._cdf,
            ignore_changes=self._ignore_changes,
            query_schema=self._schema,
            partition_filter=self._partition_filter,
        )

    def read(self, partition: _PartFilePartition):
        return _aligned_batches(partition, self._schema, self._cdf)

    def commit(self, end: dict) -> None:
        self._floor = max(self._floor or 0, end["version"])
        self._offer_steps = 0


class TxLogFeedBatchReader(DataSourceReader):
    """Batch window read through the same planner: ``spark.read
    .format("txlog_feed").option("from_version", N)`` — the Python-I/O
    twin of :func:`txlog.table_changes` (with ``cdf=true``, of
    :func:`txlog.table_changes_cdf`), useful when the consumer wants
    the feed through the pluggable-source API (e.g. to union it with
    other sources) rather than the library call."""

    def __init__(self, schema, path: str, options):
        self._schema = schema
        self._log = _PyLog(path)
        self._cdf = str(options.get("cdf", "false")).lower() == "true"
        self._partition_filter = _parse_partition_filter(options, self._cdf)
        self._from = int(options.get("from_version", 0))
        to = options.get("to_version")
        self._to = int(to) if to is not None else self._log.current_version()

    def partitions(self):
        return _plan_window(
            self._log, self._from, self._to, cdf=self._cdf,
            ignore_changes=True,
            query_schema=self._schema,
            partition_filter=self._partition_filter,
        )

    def read(self, partition: _PartFilePartition):
        return _aligned_batches(partition, self._schema, self._cdf)


class TxLogFeedDataSource(DataSource):
    """``txlog_feed``: a txlog table as a pluggable Spark source.

    Options: ``path`` (absolute local table root, required),
    ``cdf`` (row-level feed with ``_change_type``/``_commit_version``),
    ``ignore_changes`` (don't fail on replacement commits),
    ``starting_version`` (stream bootstrap cursor, default 0 = full
    history; ``"latest"`` starts at the current version — new data
    only), ``starting_timestamp`` (wall-clock bootstrap, unix seconds
    or ISO-8601 — resolves to the snapshot version live at that instant
    via the same running-max stamp normalization as AS-OF-TIMESTAMP
    reads; earlier than history = full replay, inside reaped history =
    VersionExpiredError; mutually exclusive with ``starting_version``),
    ``max_versions_per_batch`` (per-trigger window bound),
    ``ending_version`` (hard cursor bound — the stream never offers
    past it; the drain trigger's termination point, see
    ``streaming.drain_txlog_feed``),
    ``from_version``/``to_version`` (batch reads)."""

    @classmethod
    def name(cls) -> str:
        return "txlog_feed"

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructField, StructType

        path = self.options.get("path")
        if not path:
            raise ValueError("txlog_feed: path option required")
        sj = _PyLog(path).committed_schema()
        st = StructType.fromJson(sj)
        if str(self.options.get("cdf", "false")).lower() == "true":
            st = StructType(
                st.fields
                + [
                    StructField("_change_type", StringType(), False),
                    StructField("_commit_version", LongType(), False),
                ]
            )
        return st

    def streamReader(self, schema) -> TxLogFeedStreamReader:  # noqa: N802
        return TxLogFeedStreamReader(schema, self.options.get("path"), self.options)

    def reader(self, schema) -> TxLogFeedBatchReader:
        return TxLogFeedBatchReader(schema, self.options.get("path"), self.options)


def register_txlog_feed(spark) -> None:
    spark.dataSource.register(TxLogFeedDataSource)
