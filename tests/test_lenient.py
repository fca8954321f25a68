"""Quarantine-scan contract: malformed rows routed, good rows intact,
counts exact."""

from pyspark.sql import types as T

from es_analytics_spark.sources.lenient import (
    corruption_rate,
    read_csv_lenient,
    read_json_lenient,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def test_json_lenient_routes_corrupt_rows(spark, tmp_path):
    p = tmp_path / "data.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "v": 1.5}\n'
        "this is not json\n"
        '{"id": 2, "name": "b", "v": 2.5}\n'
        '{"id": "NaNopě", "name": "c", "v": 3.5}\n'  # id not castable
        '{"id": 4, "name": "d"}\n'  # missing field is NOT corrupt (null)
    )
    good, bad = read_json_lenient(spark, str(p), SCHEMA)
    assert {r.id for r in good.collect()} == {1, 2, 4}
    raw = [r[0] for r in bad.collect()]
    assert len(raw) == 2 and any("not json" in s for s in raw)
    assert abs(corruption_rate(good, bad) - 2 / 5) < 1e-9


def test_csv_lenient_routes_corrupt_rows(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("1,a,1.5\nnot,enough\n2,b,2.5\nx,y,notafloat\n")
    good, bad = read_csv_lenient(spark, str(p), SCHEMA)
    assert {r.id for r in good.collect()} == {1, 2}
    assert bad.count() == 2
