"""Typed-header CSV compat format.

The reference lake's file format (README.md:125-148 in /root/reference):
line 1 is a ``#``-prefixed comma list of column types, line 2 the RFC-4180
header, then data rows; optionally gzipped. Spark's CSV reader skips
comment lines without capturing them, so the reader here fetches line 1
separately to build the StructType, then does a normal schema'd CSV read
(SURVEY.md §1.6).

Wire-format limitations (both readers, documented in one place):

- Embedded NUL (``\\x00``) in string values does not survive the read
  side — Spark's univocity CSV parser strips it. Data that must carry
  NUL belongs on the native parquet sink, which round-trips it
  bit-exactly.
- Embedded newlines in string values are legal (QUOTE_MINIMAL quotes
  them on write): the JVM path reads them via ``multiLine`` (which
  makes a file the split unit — fine here, lake objects are already
  bounded by ``batch_record_limit`` and are the parallel unit), and
  the Python data source feeds one csv.reader the whole object so
  quoted newlines never shear a row.
- Unicode line separators (``\\u2028``, ``\\x85``) are ordinary
  in-field characters, never record terminators.
- Embedded ``\\r\\n`` inside a quoted field reads back as ``\\n``
  (univocity's multiLine normalization; the Python source mirrors it
  so both readers agree). Lone ``\\r`` and ``\\n`` survive unchanged.
  CRLF-exact data belongs on the parquet sink.
"""

from __future__ import annotations

import datetime as dt
import gzip
import io
import csv as _csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from es_analytics_spark.collector import DataType, SPARK_TYPE
from es_analytics_spark.sources import fsio


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


def _head_text(spark: SparkSession, path: str) -> str:
    """Decoded text of a (possibly gzipped) lake object, fetched
    through the store seam so URI lake roots (s3a:// etc.) work."""
    data = fsio.lake_fs(spark, path).read_bytes(path)
    if path.endswith(".gz"):
        data = gzip.decompress(data)
    return data.decode("utf-8")


def schema_from_typed_header(text: str) -> T.StructType:
    """StructType from the '#types' line + RFC-4180 header row.

    The header ROW is parsed with csv.reader over the post-types text,
    not splitlines() — a quoted column name containing an embedded
    newline is one RFC-4180 record spanning several physical lines, and
    line-splitting would shear it (the same class of bug the ADVICE r3
    fix removed from row parsing). The '#types' line itself is safe to
    line-split: its tokens are fixed enum names, never quoted."""
    nl = text.find("\n")
    first = text[: nl if nl >= 0 else len(text)].rstrip("\r")
    if not first.startswith("#"):
        raise ValueError("missing typed header line")
    types = [DataType(tok) for tok in first[1:].split(",")]
    if nl < 0:
        # no newline: slicing text[nl + 1:] would re-parse the '#types'
        # line as the header row, yielding type tokens as field names
        raise ValueError("missing header row after '#types' line")
    header = next(_csv.reader(io.StringIO(text[nl + 1 :], newline="")))
    return T.StructType(
        [T.StructField(name, SPARK_TYPE[t], True) for name, t in zip(header, types)]
    )


def read_typed_csv(spark: SparkSession, pattern: str) -> DataFrame:
    """Read typed-header CSV objects (possibly gzipped) into a DataFrame.

    Schema comes from the first matched file's ``#types`` line + header
    row; the scan itself is Spark's distributed CSV source. ``pattern``
    may be a local glob or a Hadoop-URI glob (file://, s3a://, ...).
    """
    paths = fsio.lake_fs(spark, pattern).glob(pattern)
    if not paths:
        raise FileNotFoundError(pattern)
    schema = schema_from_typed_header(_head_text(spark, paths[0]))
    return (
        spark.read.option("header", True)
        .option("comment", "#")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSX")
        # RFC-4180 escapes quotes by doubling them; Spark's default
        # escape is backslash, which misparses a field like `"""`
        .option("escape", '"')
        # quoted fields may contain newlines; without multiLine the
        # line-splitting scanner shears them (module docstring)
        .option("multiLine", True)
        .schema(schema)
        .csv(paths)
    )


def read_typed_csv_lake(
    spark: SparkSession,
    lake_dir: str,
    table: str,
    y: int | None = None,
    m: int | None = None,
    d: int | None = None,
    h: int | None = None,
) -> DataFrame:
    """Read a whole ``YYYY/MM/DD/HH/{table}/`` lake tree (the reference
    key scheme — Collector.ts:136-142,344-346) as one DataFrame with
    ``y/m/d/h`` recovered as partition columns.

    Partition pruning: the lake's date dirs are positional, not
    hive-style ``k=v``, so Spark's partition discovery can't prune them.
    Pruning happens at file-list time instead — y/m/d/h constraints
    narrow the glob BEFORE the scan is planned, so unselected hours
    never enter the file index (same effect as hive pruning: the scan's
    inputFiles only cover matching dirs). The recovered columns come
    from the file path, one regexp per row, JVM-side.
    """
    from pyspark.sql import functions as F

    seg = [
        f"{y:04d}" if y is not None else "*",
        f"{m:02d}" if m is not None else "*",
        f"{d:02d}" if d is not None else "*",
        f"{h:02d}" if h is not None else "*",
    ]
    pattern = fsio.join(lake_dir, *seg, table, "*.csv*")
    df = read_typed_csv(spark, pattern)
    fname = F.input_file_name()
    rx = r"(\d{4})/(\d{2})/(\d{2})/(\d{2})/[^/]+/[^/]+$"
    return df.select(
        "*",
        F.regexp_extract(fname, rx, 1).cast("int").alias("y"),
        F.regexp_extract(fname, rx, 2).cast("int").alias("m"),
        F.regexp_extract(fname, rx, 3).cast("int").alias("d"),
        F.regexp_extract(fname, rx, 4).cast("int").alias("h"),
    )
