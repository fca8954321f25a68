"""Multimodal plumbing: schema, Arrow batch shape, determinism of the
stand-in decode, and the NotImplementedError gate for real codecs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from es_analytics_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    fake_decode,
    real_decode,
    sample_segments,
)
from es_analytics_spark.sources.lake import read_table


def _payloads(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    return d.withColumn("payload", F.encode("text", "utf-8"))


def test_extract_features_schema_and_shape(spark, sf_dir):
    out = extract_features(_payloads(spark, sf_dir), "payload", "doc_id")
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint",
        "features:array<float>",
        "n_bytes:bigint",
    ]
    rows = out.collect()
    assert len(rows) == 500
    for r in rows[:10]:
        assert len(r.features) == FEATURE_DIM
        norm = float(np.linalg.norm(r.features))
        assert abs(norm - 1.0) < 1e-5 or norm == 0.0  # l2-normalized


def test_extract_features_deterministic_across_partitioning(spark, sf_dir):
    base = _payloads(spark, sf_dir)
    a = {r.id: r.features for r in extract_features(base, "payload", "doc_id").collect()}
    b = {
        r.id: r.features
        for r in extract_features(base.repartition(13), "payload", "doc_id").collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]


def test_fake_decode_contract():
    sig = fake_decode(b"\x00\x01\x01\xff")
    assert sig.shape == (256,) and sig.dtype == np.float32
    assert sig[0] == 1 and sig[1] == 2 and sig[255] == 1
    assert fake_decode(b"").sum() == 0  # empty payload → zero signal


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        real_decode(b"\xff\xd8\xff")  # JPEG magic — codec not in container


def test_segment_sample_offsets(spark):
    df = spark.createDataFrame([(1, b"0123456789abcdef")], "id long, payload binary")
    rows = {r.segment_idx: bytes(r.segment) for r in
            sample_segments(df, "payload", "id", n_segments=4, segment_bytes=4).collect()}
    assert rows == {0: b"0123", 1: b"4567", 2: b"89ab", 3: b"cdef"}


def test_binary_file_source_to_features(spark, tmp_path):
    """Raw media dir -> binaryFile scan -> typed meta -> Arrow
    featurize: the full multimodal ingest edge on real files."""
    from pyspark.sql import functions as F

    from es_analytics_spark.operators.multimodal import FEATURE_DIM, extract_features
    from es_analytics_spark.sources.binary import read_binary_files

    media = tmp_path / "media"
    media.mkdir()
    payloads = {
        "a.img": bytes(range(256)) * 4,
        "b.img": b"\x07" * 1024,
        "c.img": b"\x00\x01\x02\x03" * 100,
    }
    for name, data in payloads.items():
        (media / name).write_bytes(data)
    (media / "ignore.txt").write_bytes(b"not media")

    df = read_binary_files(spark, str(media), glob_filter="*.img", mime="image/fake")
    rows = {r["file_id"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, data in payloads.items():
        assert rows[name]["length"] == len(data)
        assert rows[name]["media_meta"]["n_bytes"] == len(data)
        assert rows[name]["media_meta"]["mime"] == "image/fake"

    feats = extract_features(
        df.withColumn("mid", F.xxhash64("file_id")), "content", "mid"
    )
    got = feats.collect()
    assert len(got) == 3
    assert all(len(r["features"]) == FEATURE_DIM for r in got)
    assert all(abs(sum(x * x for x in r["features"]) - 1.0) < 1e-3 for r in got)


def test_media_near_dup_pairs(spark):
    """Re-encoded variants (same byte distribution, jittered) must pair
    up; structurally different payloads must not."""
    from es_analytics_spark.operators.multimodal import media_near_dup_pairs

    base = bytes(range(256)) * 8
    variant = base[:-16] + bytes(range(16))  # near-identical histogram
    other = b"\x01\x02" * 1024               # concentrated, different shape
    rows = [(1, base), (2, variant), (3, other), (4, other + b"\x01\x02" * 4)]
    df = spark.createDataFrame(rows, "mid long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in media_near_dup_pairs(df, "payload", "mid").collect()
    }
    assert (1, 2) in pairs
    assert (3, 4) in pairs
    assert not any({a, b} == {1, 3} or {a, b} == {2, 3} for a, b in pairs)
