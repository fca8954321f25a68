"""Typed-header CSV compat format.

The reference lake's file format (README.md:125-148 in /root/reference):
line 1 is a ``#``-prefixed comma list of column types, line 2 the RFC-4180
header, then data rows; optionally gzipped. Spark's CSV reader skips
comment lines without capturing them, so the reader here fetches line 1
separately to build the StructType, then does a normal schema'd CSV read
(SURVEY.md §1.6).

Wire-format limitation: embedded NUL (``\\x00``) in string values does
not survive the read side — Spark's univocity CSV parser strips it.
Data that must carry NUL belongs on the native parquet sink, which
round-trips it bit-exactly.
"""

from __future__ import annotations

import datetime as dt
import glob as _glob
import gzip
import io
import csv as _csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from es_analytics_spark.collector import DataType, SPARK_TYPE


def _iso(v: dt.datetime) -> str:
    """JS Date.toISOString() format: millisecond precision, Z suffix
    (Collector.ts:126-133)."""
    if v.tzinfo is not None:
        v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return v.isoformat(timespec="milliseconds") + "Z"


def encode_typed_csv(rows: list[dict], cols: dict[str, DataType]) -> bytes:
    """Serialize rows to the typed-CSV byte format (uncompressed)."""
    buf = io.StringIO(newline="")
    buf.write("#" + ",".join(t.value for t in cols.values()) + "\r\n")
    writer = _csv.writer(buf, lineterminator="\r\n")
    writer.writerow(cols.keys())
    for r in rows:
        out = []
        for k in cols:
            v = r.get(k)
            if v is None:
                out.append("")
            elif isinstance(v, dt.datetime):
                out.append(_iso(v))
            elif isinstance(v, bool):
                out.append("true" if v else "false")
            else:
                out.append(v)
        writer.writerow(out)
    return buf.getvalue().encode("utf-8")


def _read_types_line(path: str) -> list[DataType]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        line = f.readline().strip()
    if not line.startswith("#"):
        raise ValueError(f"{path}: missing typed header line")
    return [DataType(tok) for tok in line[1:].split(",")]


def read_typed_csv(spark: SparkSession, pattern: str) -> DataFrame:
    """Read typed-header CSV objects (possibly gzipped) into a DataFrame.

    Schema comes from the first matched file's ``#types`` line + header
    row; the scan itself is Spark's distributed CSV source.
    """
    paths = sorted(_glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(pattern)
    types = _read_types_line(paths[0])
    opener = gzip.open if paths[0].endswith(".gz") else open
    with opener(paths[0], "rt", encoding="utf-8") as f:
        f.readline()
        header = next(_csv.reader([f.readline()]))
    schema = T.StructType(
        [T.StructField(name, SPARK_TYPE[t], True) for name, t in zip(header, types)]
    )
    return (
        spark.read.option("header", True)
        .option("comment", "#")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSX")
        # RFC-4180 escapes quotes by doubling them; Spark's default
        # escape is backslash, which misparses a field like `"""`
        .option("escape", '"')
        .schema(schema)
        .csv(paths)
    )
