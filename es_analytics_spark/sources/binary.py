"""Raw-file ingestion for multimodal payloads.

Spark's ``binaryFile`` source turns a directory of opaque media files
(images, audio, video segments) into a DataFrame of
``(path, modificationTime, length, content: binary)`` rows — the
ingestion edge of the multimodal pipeline (operators.multimodal takes
over from the ``content`` column: typed metadata, feature extraction,
segment sampling).

Scale: the source lists files distributively and reads each file as
one row; ``maxPartitionBytes`` groups small files per task, so a
100M-object corpus does not become 100M tasks. Push ``pathGlobFilter``
down instead of filtering on the path column after the scan — the
filter then prunes at listing time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob_filter: str | None = None,
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Read a directory/glob of raw files as (file_id, length, content,
    media_meta) rows. ``glob_filter`` (e.g. ``"*.jpg"``) prunes at
    listing time; ``mime`` stamps the typed metadata struct the
    multimodal operators key on."""
    from es_analytics_spark.operators.multimodal import attach_media_meta

    reader = spark.read.format("binaryFile")
    if glob_filter:
        reader = reader.option("pathGlobFilter", glob_filter)
    df = reader.load(path).select(
        F.col("path").alias("file_id"),
        F.col("length"),
        F.col("content"),
    )
    return attach_media_meta(df, "content", mime=mime)
