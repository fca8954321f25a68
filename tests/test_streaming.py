"""Batch ≡ streaming replay equivalence (SURVEY.md §5.4): the same
transformation applied to the batch frame and to the streamed fixture
must agree, and streaming-only state ops behave as specified."""

from pyspark.sql import functions as F

from es_analytics_spark.sources.lake import read_table
from es_analytics_spark.streaming.ingest import (
    dedup_within_watermark,
    replay_stream,
    session_window_agg,
    stream_events,
    windowed_event_counts,
)


def _rows(df, *keys):
    return sorted(map(tuple, df.collect()), key=lambda t: tuple(str(x) for x in t))


def test_windowed_counts_stream_equals_batch(spark, sf_dir):
    batch = windowed_event_counts(read_table(spark, sf_dir, "events"))
    stream = replay_stream(
        spark, windowed_event_counts(stream_events(spark, sf_dir)),
        name="t_wc", output_mode="complete",
    )
    assert _rows(batch) == _rows(stream)


def test_session_windows_stream_equals_batch(spark, sf_dir):
    batch = session_window_agg(read_table(spark, sf_dir, "events"))
    stream = replay_stream(
        spark, session_window_agg(stream_events(spark, sf_dir)),
        name="t_sw", output_mode="complete",
    )
    assert _rows(batch) == _rows(stream)


def test_dedup_within_watermark_drops_in_horizon_dupes(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    # duplicate every event (same event_id) — dupes are at identical
    # event time, trivially inside the watermark horizon
    doubled = ev.union(ev)
    out = replay_stream(
        spark, dedup_within_watermark(doubled, ["event_id"]), name="t_dd"
    )
    n_batch = read_table(spark, sf_dir, "events").count()
    assert out.count() == n_batch


def test_stream_source_schema_matches_batch(spark, sf_dir):
    assert stream_events(spark, sf_dir).schema == read_table(spark, sf_dir, "events").schema


def test_rate_source_smoke(spark):
    """The declared rate streaming source: produces rows at a fixed
    rate; one availableNow-style micro-batch must yield rows with the
    (timestamp, value) contract."""
    from es_analytics_spark.streaming.ingest import replay_stream

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 500)
        .option("numPartitions", 2)
        .load()
    )
    q = (
        rate.writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 20
        while _t.time() < deadline and spark.table("t_rate").count() == 0:
            _t.sleep(0.5)
        got = spark.table("t_rate")
        assert got.count() > 0
        assert [f.name for f in got.schema.fields] == ["timestamp", "value"]
    finally:
        q.stop()


def test_stream_failure_routes_to_on_error(spark, sf_dir, tmp_path):
    """A16 parity for the error signal: a stream that dies must emit on
    the on_error channel (reference onError, Collector.ts:147-151)."""
    import time

    from pyspark.sql import functions as F

    from es_analytics_spark.streaming.collector_sink import stream_to_lake
    from es_analytics_spark.streaming.ingest import stream_events

    errors = []
    failing = stream_events(spark, sf_dir).withColumn(
        "boom", F.raise_error(F.lit("deliberate failure"))
    )
    q = stream_to_lake(
        failing,
        table="events",
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        available_now=True,
        on_error=errors.append,
    )
    try:
        q.awaitTermination()
    except Exception:
        pass  # the query itself fails; the signal is what we assert
    for _ in range(50):  # listener events are delivered asynchronously
        if errors:
            break
        time.sleep(0.2)
    assert errors and "failed" in str(errors[0])


def test_typed_csv_streaming_source_incremental(spark, tmp_path):
    """The typed_csv Python data source as a STREAMING source: offsets
    are lake-object counts, so a checkpointed availableNow run drains
    exactly the objects that appeared since the last commit."""
    import datetime as dt2

    from pyspark.sql import functions as F

    from es_analytics_spark.collector import Collector, CollectorConfig
    from es_analytics_spark.sources.typed_csv_ds import register_typed_csv

    lake = str(tmp_path / "lake")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    register_typed_csv(spark)
    pattern = f"{lake}/*/*/*/*/t/*.csv*"

    def track(lo, hi):
        col = Collector(
            spark,
            CollectorConfig(lake_dir=lake, sink_format="csv", batch_record_limit=10),
        )
        for i in range(lo, hi):
            col.track("t", {"k": i, "v": i * 0.5})
        col.stop()

    def drain():
        q = (
            spark.readStream.format("typed_csv")
            .load(pattern)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    track(0, 25)
    drain()
    assert spark.read.parquet(out).count() == 25

    track(25, 60)
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 60  # exactly-once: no re-read of batch-1 objects
    assert got.agg(F.sum("k")).first()[0] == sum(range(60))


def test_schema_evolution_across_streaming_restart(spark, tmp_path):
    """Widen the schema between two availableNow replays with the
    checkpoint intact: the restarted stream appends lake objects with
    the new column, the first replay's files are NOT re-delivered
    (offsets survive the schema change — exactly-once holds across
    evolution), and a mergeSchema read surfaces nulls in the new
    column for pre-evolution rows. Streaming twin of
    test_schema_evolution_merges_old_and_new."""
    from es_analytics_spark.streaming.collector_sink import read_lake_table, stream_to_lake

    src = tmp_path / "incoming"
    src.mkdir()
    lake, ckpt = str(tmp_path / "lake"), str(tmp_path / "ckpt")

    def drain(schema):
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = stream_to_lake(
            stream, table="ev", lake_dir=lake, checkpoint_dir=ckpt, available_now=True
        )
        q.awaitTermination()

    v1 = spark.range(0, 100).selectExpr(
        "id as user_id",
        "timestamp'2024-01-01 10:00:00' + make_interval(0,0,0,0,0,0,id) as ts",
        "cast(id as double) as value",
    )
    v1.write.parquet(str(src / "b1"))
    drain(v1.schema)

    v2 = spark.range(100, 150).selectExpr(
        "id as user_id",
        "timestamp'2024-01-01 11:00:00' + make_interval(0,0,0,0,0,0,id) as ts",
        "cast(id as double) as value",
        "concat('t', id) as tag",  # evolved: new nullable column
    )
    v2.write.parquet(str(src / "b2"))
    drain(v2.schema)

    df = read_lake_table(spark, lake, "ev", merge_schema=True)
    assert "tag" in df.columns
    rows = {r.user_id: r.tag for r in df.collect()}
    assert len(rows) == 150  # b1 delivered exactly once, not re-read
    assert all(rows[i] is None for i in range(100))  # pre-evolution rows
    assert rows[120] == "t120"


def test_tws_profiles_match_batch_aggregate(spark, sf_dir):
    """transformWithState running profiles == batch aggregate (same
    oracle as the applyInPandasWithState twin). Skips where the TWS
    Python worker's protobuf dependency is absent."""
    import pytest

    from es_analytics_spark.queries_sql2 import _tws_available, stream_tws_profiles

    if not _tws_available():
        pytest.skip("google.protobuf absent: transformWithState worker cannot start")

    from pyspark.sql import functions as F

    from es_analytics_spark.sources.lake import read_table

    got = {r.user_id: (r.n_events, r.total_value) for r in
           stream_tws_profiles(spark, sf_dir).collect()}
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(38,10)")), 4)
            .cast("double")
            .alias("total_value"),
        )
        .collect()
    }
    assert got == want


def test_kafka_seam_option_contract_and_wire_decode(spark, sf_dir):
    """Kafka source seam (no broker in the sandbox): (a) the reader
    option contract is exactly the documented set — offset bound per
    micro-batch, no silent data loss; (b) decoding a batch frame with
    Kafka's wire schema through parse_kafka_events yields the events
    schema with correct values — the same code path a live stream
    runs; (c) without the connector jar the reader raises the
    documented error, not an opaque ClassNotFound."""
    import json

    import pytest

    from es_analytics_spark.streaming.ingest import (
        KAFKA_WIRE_SCHEMA,
        kafka_reader_options,
        parse_kafka_events,
        stream_events_kafka,
    )

    opts = kafka_reader_options("b1:9092,b2:9092", "events")
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "events",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "200000",
    }

    payload = {
        "event_id": 7,
        "user_id": 3,
        "event_type": "purchase",
        "ts": "2024-01-01T10:30:00",
        "value": 9.5,
    }
    wire = spark.createDataFrame(
        [
            (
                None,
                json.dumps(payload).encode(),
                "events",
                0,
                42,
                __import__("datetime").datetime(2024, 1, 1, 10, 30, 1),
                0,
            )
        ],
        KAFKA_WIRE_SCHEMA,
    )
    row = parse_kafka_events(wire).collect()[0]
    assert (row.event_id, row.user_id, row.event_type, row.value) == (7, 3, "purchase", 9.5)
    assert row.ts.isoformat() == "2024-01-01T10:30:00"
    assert (row.topic, row.partition, row.offset) == ("events", 0, 42)

    try:
        df = stream_events_kafka(spark, "localhost:9092")
    except RuntimeError as e:
        assert "spark-sql-kafka" in str(e)
    else:  # connector present (real deployment): plan must be streaming
        assert df.isStreaming and "ts" in df.columns


def test_funnel_state_requalifies_on_out_of_order_view(spark, tmp_path):
    """The streaming funnel's bounded state must handle cross-batch
    disorder: batch 1 delivers a click at t=100 and a view at t=50
    (level 2); batch 2 delivers a LATE view at t=10 — the first-view
    anchor drops to 10, the same click still qualifies, and a purchase
    at t=200 completes level 3. A state that only kept the current
    winners (not the cap-earliest step times) would lose the click's
    qualification when t1 moves."""
    import pandas as pd

    from es_analytics_spark.streaming.ingest import replay_stream
    from es_analytics_spark.streaming.stateful import running_funnel_levels

    d = tmp_path / "src"
    d.mkdir()
    schema = "user_id bigint, event_type string, tus bigint"
    b1 = pd.DataFrame(
        {"user_id": [1, 1], "event_type": ["click", "view"], "tus": [100, 50]}
    )
    b2 = pd.DataFrame(
        {"user_id": [1, 1], "event_type": ["view", "purchase"], "tus": [10, 200]}
    )
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(d / "b2"))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out = replay_stream(
        spark,
        running_funnel_levels(src, window_us=1000),
        name="funnel_ooo",
        output_mode="append",
    ).toPandas()
    final = out.sort_values("n_rows").groupby("user_id").last()
    assert int(final.loc[1, "funnel_level"]) == 3
    # and the intermediate epoch (if emitted separately) was level 2
    if len(out) > 1:
        assert int(out.sort_values("n_rows").iloc[0]["funnel_level"]) == 2


def test_rate_source_live_to_lake_with_listener(spark, tmp_path):
    """Live-source end-to-end (r4 verdict ask 9): the built-in rate
    source — a genuinely UNBOUNDED stream, not a file replay — flows
    through the collector sink on a processing-time trigger, the
    FlushSignalListener fires per micro-batch with the A16 FlushInfo
    contract, windowed aggregation works on the live frame, and
    graceful stop drains without error. This closes the 'only
    file-source replay is exercised live' gap; Kafka swaps in behind
    the same seam."""
    import time

    from es_analytics_spark.streaming.collector_sink import (
        read_lake_table,
        stream_to_lake,
    )
    from es_analytics_spark.streaming.ingest import rate_events, windowed_event_counts

    flushes, errors = [], []
    ev = rate_events(spark, rows_per_second=500)
    assert ev.isStreaming
    # the same transformation stack batch queries use applies unchanged
    windowed = windowed_event_counts(ev, "1 minute")
    assert windowed.isStreaming

    q = stream_to_lake(
        ev,
        table="live_events",
        lake_dir=str(tmp_path / "lake"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        processing_time="1 seconds",
        on_flush=flushes.append,
        on_error=errors.append,
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if sum(f.records for f in flushes) > 0 and len(flushes) >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)

    assert not errors
    assert len(flushes) >= 2, "expected multiple live micro-batch flushes"
    assert sum(f.records for f in flushes) > 0
    # FlushInfo parity: epoch-keyed, per-batch record counts
    assert all(f.table == "live_events" for f in flushes)
    assert all(f.key == f"epoch={f.id}" for f in flushes)

    got = read_lake_table(spark, str(tmp_path / "lake"), "live_events")
    n = got.count()
    assert n > 0
    assert {"ingest_date", "ingest_hour"} <= set(got.columns)
    # deterministic shaping: event fields are functions of event_id
    bad = got.filter(
        (F.col("user_id") != F.col("event_id") % 97)
        | (F.col("value") != F.col("event_id") % 1000 / 10.0)
    ).count()
    assert bad == 0


def test_transition_state_splits_on_out_of_order_arrival(spark, tmp_path):
    """The streaming Markov-transition state must RE-DERIVE, not
    accumulate: epoch 1 delivers view(t=10) and purchase(t=30) — the
    observed transition is view->purchase; epoch 2 delivers a LATE
    click(t=20), which must retroactively SPLIT that transition into
    view->click and click->purchase. A carry-only-counters design
    cannot retract the already-counted view->purchase — exactly the
    failure the sequence re-derivation contract exists to prevent."""
    import pandas as pd

    from es_analytics_spark.streaming.ingest import replay_stream
    from es_analytics_spark.streaming.stateful import running_transitions

    d = tmp_path / "src"
    d.mkdir()
    schema = "user_id bigint, tus bigint, eid bigint, code int"
    # codes: 0=view, 1=click, 2=purchase (test-local mapping)
    b1 = pd.DataFrame({"user_id": [1, 1], "tus": [10, 30], "eid": [1, 2], "code": [0, 2]})
    b2 = pd.DataFrame({"user_id": [1], "tus": [20], "eid": [3], "code": [1]})
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(d / "b2"))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out = replay_stream(
        spark,
        running_transitions(src),
        name="transitions_ooo",
        output_mode="append",
    ).toPandas()
    final = out[out["n_rows"] == out["n_rows"].max()]
    got = {
        (int(r.src_code), int(r.dst_code)): int(r.cnt)
        for r in final.itertuples()
        if r.src_code >= 0
    }
    assert got == {(0, 1): 1, (1, 2): 1}, got  # view->click, click->purchase
    # file-source epoch ordering is not guaranteed; only when the late
    # click genuinely arrived second does an intermediate epoch exist
    # with the unsplit view->purchase transition
    early = out[out["n_rows"] == 2]
    if len(early):
        assert {(int(r.src_code), int(r.dst_code)) for r in early.itertuples()} == {
            (0, 2)
        }


def test_transition_state_cap_keeps_newest_and_marks_overflow(
    spark, tmp_path, monkeypatch
):
    """Round-7 advice: past TRANSITION_STATE_CAP the old truncation kept
    the EARLIEST events, so every later arrival sorted past the cap and
    was discarded each epoch — output silently froze. Contract now: the
    NEWEST events are kept (the sequence slides, output keeps evolving)
    and an overflow marker row (src=-2, dst=-2, cnt=dropped) exposes
    that exactness degraded."""
    import pandas as pd

    from es_analytics_spark.streaming import stateful
    from es_analytics_spark.streaming.ingest import replay_stream

    monkeypatch.setattr(stateful, "TRANSITION_STATE_CAP", 4)
    d = tmp_path / "src"
    d.mkdir()
    schema = "user_id bigint, tus bigint, eid bigint, code int"
    # epoch 1: six events (codes 0,1,0,1,0,1) — two over the cap of 4
    b1 = pd.DataFrame(
        {"user_id": [1] * 6, "tus": range(10, 70, 10), "eid": range(1, 7),
         "code": [0, 1, 0, 1, 0, 1]}
    )
    # epoch 2: a NEWER event must still change the output (no freeze)
    b2 = pd.DataFrame({"user_id": [1], "tus": [70], "eid": [7], "code": [2]})
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(d / "b2"))

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out = replay_stream(
        spark,
        stateful.running_transitions(src),
        name="transitions_cap",
        output_mode="append",
    ).toPandas()
    final = out[out["n_rows"] == out["n_rows"].max()]
    got = {
        (int(r.src_code), int(r.dst_code)): int(r.cnt) for r in final.itertuples()
    }
    # newest 4 of 7 events: codes (1,0,1) at tus 40,50,60 + (2) at 70
    assert got[(1, 0)] == 1 and got[(0, 1)] == 1 and got[(1, 2)] == 1
    # the late event was NOT discarded (the old bug) and the overflow
    # marker reports exactly how many older events slid out of state
    assert got[(-2, -2)] == 3
    assert all(k in {(1, 0), (0, 1), (1, 2), (-2, -2)} for k in got)
