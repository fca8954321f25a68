"""CAS-coordinator seam: one write-once contract, three backends.

The txlog commit protocol needs exactly one primitive — atomically
create a path iff absent — and round 7 left its raw-S3 story as a
documented boundary (rename there is copy+delete, not exclusive).
The seam closes it: ``put_if_absent`` is pluggable, with

- ``LocalFS``      hard-link publish (POSIX link(2) EEXIST),
- ``HadoopFS``     FileContext.rename without OVERWRITE (HDFS-class),
- ``SqliteCasCoordinator`` a lock-TABLE arbiter — the in-sandbox
  stand-in for the DynamoDB-style coordinator raw S3 deployments use
  (the public S3DynamoDBLogStore claim → publish → recover design).

The CONTRACT tests run identically against all three; the coordinator
additionally proves its crash-window recovery (claim durable, publish
missing → any later toucher completes it); and txlog's own contention
stress runs UNMODIFIED over the coordinator via lake_fs registration.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from es_analytics_spark import txlog
from es_analytics_spark.sources.fsio import (
    CoordinatedFS,
    LocalFS,
    SqliteCasCoordinator,
    lake_fs,
    register_cas_coordinator,
    unregister_cas_coordinator,
)

BACKENDS = ["local", "hadoop", "sqlite"]


@pytest.fixture
def make_fs(spark, tmp_path):
    """Returns (fs, path_for(name)) for a backend: same contract
    surface, different arbitration primitive underneath."""

    def _make(backend: str):
        if backend == "local":
            return LocalFS(), lambda n: str(tmp_path / "local" / n)
        if backend == "hadoop":
            return (
                lake_fs(spark, f"file://{tmp_path}"),
                lambda n: f"file://{tmp_path}/hadoop/{n}",
            )
        coord = SqliteCasCoordinator(str(tmp_path / "claims.db"))
        return CoordinatedFS(LocalFS(), coord), lambda n: str(
            tmp_path / "sqlite" / n
        )

    return _make


@pytest.mark.parametrize("backend", BACKENDS)
def test_contract_single_winner_under_contention(backend, make_fs):
    fs, p = make_fs(backend)
    target = p("commit.json")
    results: list[tuple[int, bool]] = []
    lock = threading.Lock()

    def attempt(i: int) -> None:
        won = fs.put_if_absent(target, f"writer-{i}".encode())
        with lock:
            results.append((i, won))

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(16)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    winners = [i for i, won in results if won]
    assert len(winners) == 1, f"expected one winner, got {winners}"
    # the winner's bytes are what every reader sees — no torn content
    assert fs.read_bytes(target) == f"writer-{winners[0]}".encode()


@pytest.mark.parametrize("backend", BACKENDS)
def test_contract_existing_path_loses_and_is_preserved(backend, make_fs):
    fs, p = make_fs(backend)
    target = p("v1.json")
    assert fs.put_if_absent(target, b"first") is True
    assert fs.put_if_absent(target, b"second") is False
    assert fs.read_bytes(target) == b"first"
    # a distinct path is an independent race
    assert fs.put_if_absent(p("v2.json"), b"third") is True


class _FailingPublishFS(LocalFS):
    """Base store whose next put_bytes dies — the coordinator's
    claim→publish crash window made deterministic."""

    def __init__(self):
        self.fail_next = 0

    def put_bytes(self, path: str, data: bytes) -> None:
        if self.fail_next > 0:
            self.fail_next -= 1
            raise OSError("simulated crash between claim and publish")
        super().put_bytes(path, data)


def test_coordinator_crash_window_recovered_by_loser(tmp_path):
    base = _FailingPublishFS()
    coord = SqliteCasCoordinator(str(tmp_path / "claims.db"), base_fs=base)
    target = str(tmp_path / "t" / "v1.json")
    # writer A claims, then crashes before publishing the file
    base.fail_next = 1
    with pytest.raises(OSError, match="simulated"):
        coord.put_if_absent(target, b"payload-A")
    assert not base.exists(target)  # committed-but-invisible window
    # writer B loses the claim — and completes A's publish on the way out
    assert coord.put_if_absent(target, b"payload-B") is False
    assert base.read_bytes(target) == b"payload-A"


def test_coordinator_crash_window_recovered_by_reader(tmp_path):
    base = _FailingPublishFS()
    coord = SqliteCasCoordinator(str(tmp_path / "claims.db"), base_fs=base)
    fs = CoordinatedFS(base, coord)
    target = str(tmp_path / "t" / "v1.json")
    base.fail_next = 1
    with pytest.raises(OSError, match="simulated"):
        fs.put_if_absent(target, b"payload")
    # a reader heals the pending publish transparently
    assert fs.read_bytes(target) == b"payload"
    assert base.exists(target)
    # a genuinely unknown path still raises
    with pytest.raises((OSError, FileNotFoundError)):
        fs.read_bytes(str(tmp_path / "t" / "nope.json"))


def test_txlog_runs_unmodified_on_the_coordinator_backend(spark, tmp_path):
    """The seam's acceptance test from the round-7 verdict: register the
    lock-table coordinator for the table prefix and run txlog's real
    multi-writer workload — contended appends, compact, snapshot reads,
    change feed — without touching txlog itself."""
    prefix = str(tmp_path / "coordinated")
    coord = SqliteCasCoordinator(str(tmp_path / "claims.db"))
    register_cas_coordinator(prefix, coord)
    try:
        path = f"{prefix}/events"
        fs = lake_fs(spark, path)
        assert isinstance(fs, CoordinatedFS)  # the registration took

        def writer(w: int) -> None:
            for i in range(2):
                lo = (w * 2 + i) * 100
                txlog.append(
                    spark, path,
                    spark.range(lo, lo + 100).select(F.col("id").cast("long")),
                )

        threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
        [t.start() for t in threads]
        [t.join() for t in threads]
        hist = txlog.history(spark, path)
        assert [h["version"] for h in hist] == list(range(1, 9))  # gap-free
        got = sorted(r["id"] for r in txlog.read_table(spark, path).collect())
        assert got == list(range(800))  # zero lost updates
        txlog.compact(spark, path)
        assert txlog.read_table(spark, path).count() == 800
        delta, cur = txlog.changes_since(spark, path, 0)
        assert delta.count() == 800 and cur == 9
        # every commit was arbitrated by the lock table, not the FS
        import sqlite3

        with sqlite3.connect(str(tmp_path / "claims.db")) as conn:
            n_claims = conn.execute("SELECT COUNT(*) FROM claims").fetchone()[0]
        assert n_claims >= 9
    finally:
        unregister_cas_coordinator(prefix)
