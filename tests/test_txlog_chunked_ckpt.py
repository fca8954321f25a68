"""Chunked (format-2) checkpoints — round-10 ask #1: past
_CKPT_INLINE_MAX live parts the checkpoint live set is written as
content-addressed chunk files + a small footer, so the one metadata
object that grew with table size is gone: cadence writes serialize
O(changed-entries) (unchanged chunks are reused by name), folded-state
reads stay footer-only, cold snapshot reads stay O(live set) with zero
directory globs, retention reaps superseded chunks without touching
shared ones, and a v<=3 reader refuses the footer with the named
upgrade error instead of a KeyError."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from es_analytics_spark import txlog
from es_analytics_spark.sources.fsio import LocalFS
from es_analytics_spark.txlog import (
    ProtocolVersionError,
    VersionExpiredError,
    append,
    checkpoint,
    clean_log,
    current_version,
    read_table,
    table_properties,
)


@pytest.fixture(autouse=True)
def _small_thresholds(monkeypatch):
    """Force chunking at test scale (production: 512 inline / 256 per
    chunk) and manual checkpoint control."""
    monkeypatch.setattr(txlog, "_CKPT_INLINE_MAX", 8)
    monkeypatch.setattr(txlog, "_CKPT_CHUNK_TARGET", 4)
    monkeypatch.setattr(txlog, "_CHECKPOINT_EVERY", 0)
    txlog._CKPT_CACHE.clear()
    yield
    txlog._CKPT_CACHE.clear()


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").cast("long"))


def _grow(spark, path, n, start=0, width=10):
    for i in range(n):
        append(spark, path, _ids(spark, start + i * width, start + (i + 1) * width))


def _footer(path, v):
    p = os.path.join(path, "_txlog", f"checkpoint.v{v:06d}.json")
    return json.loads(open(p, "rb").read().decode("utf-8"))


def test_chunked_roundtrip_and_footer_shape(spark, tmp_path):
    path = str(tmp_path / "t")
    _grow(spark, path, 20)  # 20 live parts > inline max
    r = checkpoint(spark, path)
    assert r["written"] and r["chunks_written"] > 1
    ck = _footer(path, 20)
    assert ck["format"] == 2 and "live" not in ck
    assert ck["n_live"] == 20 and ck["protocol"] == 4
    assert sum(c["n"] for c in ck["live_chunks"]) == 20
    # folded state is footer-resident
    assert ck["schema"] is not None and ck["txns"] == {}
    # snapshot reads assemble the chunks exactly
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 200
    assert read_table(spark, path, version=20).count() == 200
    # retention over the new format: reap everything below the cut
    res = clean_log(spark, path)
    assert res["cut"] == 20 and res["removed_commits"] == 20
    assert res["removed_chunks"] == 0  # all chunks still referenced
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 200
    with pytest.raises(VersionExpiredError):
        read_table(spark, path, version=19)
    # the log keeps working past the truncation
    append(spark, path, _ids(spark, 900, 910))
    assert read_table(spark, path).count() == 210


def test_cadence_write_is_incremental(spark, tmp_path):
    """THE scale claim: a checkpoint after K new commits writes ~K
    chunks, not the whole live set — content-addressed reuse."""
    path = str(tmp_path / "t")
    _grow(spark, path, 20)
    r1 = checkpoint(spark, path)
    assert r1["chunks_written"] >= 4  # 20 entries, sticky 4-chunk layout
    append(spark, path, _ids(spark, 5000, 5010))  # ONE new part
    r2 = checkpoint(spark, path)
    assert r2["written"]
    # one part lands in one hash bucket: exactly one chunk differs
    # (plus nothing else — the other buckets' content is unchanged, and
    # the sticky n_chunks means no boundary reshuffle). The clean
    # buckets were REUSED from the previous footer without even
    # re-serializing (O(delta) cadence CPU, not just O(delta) writes).
    assert r2["chunks_written"] == 1, r2
    ck1, ck2 = _footer(path, 20), _footer(path, 21)
    assert ck1["n_chunks"] == ck2["n_chunks"]
    assert r2["chunks_reused"] == ck1["n_chunks"] - 1, r2
    n1 = {c["name"] for c in ck1["live_chunks"]}
    n2 = {c["name"] for c in ck2["live_chunks"]}
    assert len(n2 - n1) == 1  # shared content, one fresh chunk


def test_folded_reads_touch_no_chunks_and_snapshot_is_bounded(
    spark, tmp_path, monkeypatch
):
    """Instrumented-fsio extension of the bounded-listing guarantee:
    folded-state reads (properties/schema/sources) are FOOTER-ONLY; a
    cold snapshot read touches footer + chunks + tail, never a glob."""
    path = str(tmp_path / "t")
    _grow(spark, path, 20)
    txlog.set_table_properties(spark, path, {"k": "v"})  # v21
    checkpoint(spark, path)
    append(spark, path, _ids(spark, 800, 810))  # v22 (tail)

    class _CountingFS:
        def __init__(self):
            self._b = LocalFS()
            self.chunk_reads = 0
            self.log_globs = 0

        def __getattr__(self, name):
            return getattr(self._b, name)

        def read_bytes(self, p):
            if "/chunk-" in p:
                self.chunk_reads += 1
            return self._b.read_bytes(p)

        def glob(self, pat):
            if "_txlog" in pat:
                self.log_globs += 1
            return self._b.glob(pat)

    shim = _CountingFS()
    monkeypatch.setattr(txlog, "lake_fs", lambda _s, _p: shim)
    txlog._CKPT_CACHE.clear()
    # folded read first: ZERO chunk I/O
    assert table_properties(spark, path) == {"k": "v"}
    assert shim.chunk_reads == 0
    # cold snapshot: chunks fetched once (O(live set)), no globs
    assert read_table(spark, path).count() == 210
    first = shim.chunk_reads
    ck = _footer(path, 21)
    assert 0 < first <= len({c["name"] for c in ck["live_chunks"]})
    # warm snapshot: the assembled payload is cached — no chunk re-reads
    assert read_table(spark, path).count() == 210
    assert shim.chunk_reads == first
    assert shim.log_globs == 0


def test_clean_log_reaps_superseded_chunks_keeps_shared(spark, tmp_path):
    path = str(tmp_path / "t")
    _grow(spark, path, 20)
    checkpoint(spark, path)  # ck A @ v20
    _grow(spark, path, 3, start=7000)  # 3 more parts
    checkpoint(spark, path)  # ck B @ v23 — shares most chunks with A
    a = {c["name"] for c in _footer(path, 20)["live_chunks"]}
    b = {c["name"] for c in _footer(path, 23)["live_chunks"]}
    shared, only_a = a & b, a - b
    assert shared and only_a
    res = clean_log(spark, path, chunk_retention_seconds=0)
    assert res["cut"] == 23 and res["removed_checkpoints"] == 1
    assert res["removed_chunks"] == len(only_a)
    on_disk = {
        os.path.basename(p)
        for p in LocalFS().glob(os.path.join(path, "_txlog", "chunk-*.json"))
    }
    assert on_disk == b  # shared survive, superseded gone
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 230
    # the default horizon protects a concurrent checkpointer's chunks:
    # fresh unreferenced debris is NOT reaped without the explicit 0
    orphan = os.path.join(path, "_txlog", "chunk-" + "f" * 32 + ".json")
    LocalFS().put_bytes(orphan, json.dumps({"live": []}).encode())
    assert clean_log(spark, path)["removed_chunks"] == 0
    assert clean_log(spark, path, chunk_retention_seconds=0)["removed_chunks"] == 1


def test_crash_between_chunks_and_footer_heals(spark, tmp_path, monkeypatch):
    """Kill sweep at the new format's crash point: chunks written,
    footer never lands. Readers fall back to replay (no torn state); the
    retried checkpoint REUSES the orphaned chunks (zero rewrites)."""
    path = str(tmp_path / "t")
    _grow(spark, path, 20)

    real = LocalFS.put_if_absent

    def die_on_footer(self, p, data):
        if "checkpoint.v" in p:
            raise RuntimeError("injected crash before footer publish")
        return real(self, p, data)

    monkeypatch.setattr(LocalFS, "put_if_absent", die_on_footer)
    with pytest.raises(RuntimeError, match="injected crash"):
        checkpoint(spark, path)
    monkeypatch.setattr(LocalFS, "put_if_absent", real)
    # no footer: reads replay the log unharmed
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 200
    # retry: every chunk already on disk under its content name
    r = checkpoint(spark, path)
    assert r["written"] and r["chunks_written"] == 0
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 200


def test_old_reader_refuses_chunked_footer(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "t")
    _grow(spark, path, 20)
    checkpoint(spark, path)
    clean_log(spark, path)  # snapshot now REQUIRES the checkpoint
    txlog._CKPT_CACHE.clear()
    monkeypatch.setattr(txlog, "PROTOCOL_VERSION", 3)
    with pytest.raises(ProtocolVersionError, match="upgrade the engine"):
        read_table(spark, path)


def test_streaming_source_over_chunked_table(spark, tmp_path):
    """After retention leaves only the chunked checkpoint, the streaming
    source still plans (folded schema from the footer) and feeds new
    commits."""
    from es_analytics_spark.sources.txlog_source import register_txlog_feed

    register_txlog_feed(spark)
    path = str(tmp_path / "t")
    _grow(spark, path, 20)
    checkpoint(spark, path)
    clean_log(spark, path)
    append(spark, path, _ids(spark, 9000, 9005))  # v21
    rows: list = []
    q = (
        spark.readStream.format("txlog_feed")
        .option("path", path)
        .option("starting_version", "20")
        .load()
        .writeStream.foreachBatch(lambda df, _b: rows.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert sorted(r["id"] for r in rows) == list(range(9000, 9005))


def test_reused_chunk_reaped_midflight_heals_after_publish(spark, tmp_path):
    """Self-review fix: a clean_log racing a cadence checkpoint can reap
    a chunk the checkpoint REUSES from the superseded footer. The
    post-publish verify re-creates it byte-identically (content-
    addressed name), healing every footer that references it."""
    path = str(tmp_path / "t")
    _grow(spark, path, 20)
    checkpoint(spark, path)
    append(spark, path, _ids(spark, 5000, 5010))
    ck1 = _footer(path, 20)
    reused_names = {c["name"] for c in ck1["live_chunks"]}

    real = LocalFS.put_if_absent
    state = {"reaped": None}

    def reap_before_footer(self, p, data):
        if "checkpoint.v" in p and state["reaped"] is None:
            # simulate the racing clean_log: delete one chunk the new
            # footer is about to reference via REUSE (parse the footer
            # being published — the dirty bucket's fresh chunk is not a
            # reuse and would not exercise the heal)
            new_names = {c["name"] for c in json.loads(data)["live_chunks"]}
            victim = sorted(new_names & reused_names)[0]
            os.remove(os.path.join(path, "_txlog", victim))
            state["reaped"] = victim
        return real(self, p, data)

    import pytest as _p

    _p.MonkeyPatch().setattr(LocalFS, "put_if_absent", reap_before_footer)
    try:
        r = checkpoint(spark, path)
    finally:
        LocalFS.put_if_absent = real
    assert state["reaped"] is not None
    # the heal re-created the reaped chunk under its recorded name
    assert os.path.exists(os.path.join(path, "_txlog", state["reaped"]))
    assert r["chunks_written"] >= 1  # the dirty bucket + the heal
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 210
    # the SUPERSEDED footer is healed too (same content-addressed file)
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path, version=20).count() == 200


def test_snapshot_degrades_past_unreadable_checkpoint(spark, tmp_path):
    """Self-review fix: a torn/unreadable newest checkpoint no longer
    kills the read when the commits (or an older checkpoint) can still
    reconstruct the version — corruption raises ONLY when the replay is
    genuinely impossible."""
    path = str(tmp_path / "t")
    _grow(spark, path, 20)
    checkpoint(spark, path)
    # corrupt the footer (commits all retained -> full replay works)
    fpath = os.path.join(path, "_txlog", "checkpoint.v000020.json")
    open(fpath, "w").write("{torn")
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 200
    assert read_table(spark, path, version=10).count() == 100
    # now reap the commits: the torn checkpoint is genuinely required
    os.remove(fpath)
    checkpoint(spark, path)
    clean_log(spark, path)
    open(os.path.join(path, "_txlog", "checkpoint.v000020.json"), "w").write("{torn")
    txlog._CKPT_CACHE.clear()
    with pytest.raises(RuntimeError, match="unreadable"):
        read_table(spark, path, version=20)


def test_concurrent_checkpointers_idempotent_over_chunks(spark, tmp_path):
    """Two writers hitting the cadence together: chunk names are a
    deterministic function of (live set, n_chunks), so the race is
    idempotent — exactly one footer wins, both reference the same
    chunks, no torn state, and readers see one consistent snapshot."""
    import threading

    path = str(tmp_path / "t")
    _grow(spark, path, 20)
    results: list[dict] = []
    errs: list[Exception] = []

    def ck():
        try:
            results.append(checkpoint(spark, path))
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    threads = [threading.Thread(target=ck) for _ in range(3)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs, errs
    assert sum(1 for r in results if r["written"]) == 1  # one footer won
    assert {r["version"] for r in results} == {20}
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 200
    res = clean_log(spark, path)
    assert res["cut"] == 20 and res["removed_chunks"] == 0
    txlog._CKPT_CACHE.clear()
    assert read_table(spark, path).count() == 200
