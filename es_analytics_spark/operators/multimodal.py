"""Multimodal (image/audio/video) column support.

Convention: a modality column is an opaque ``binary`` payload plus a
typed metadata struct (mime, width/height or sample rate, etc.) —
parquet stores the bytes columnar and Spark moves them with Arrow, so
the same partitioning/shuffle story as any other column applies at
100 TB (media never leaves the executor; only features do).

The *decode* step (JPEG→pixels, PCM→samples, video→frames) requires
codec libraries that are not in this container, so it is stubbed
behind ``decoder=`` hooks: the default ``fake_decode`` is a
deterministic stand-in (byte-histogram "pixels") that keeps every
piece of Spark-side plumbing — schema, Arrow batch shapes, mapInPandas
iterator contract, partition boundaries — real and testable. Swap in a
real decoder (PIL/ffmpeg) by passing ``decoder=`` in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# -- schema conventions ------------------------------------------------

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

FEATURE_DIM = 32


def attach_media_meta(df: DataFrame, bin_col: str, mime: str, out_col: str = "media_meta") -> DataFrame:
    """Typed metadata struct computed JVM-side (no Python)."""
    c = F.col(bin_col)
    return df.withColumn(
        out_col,
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(c).cast("long").alias("n_bytes"),
            F.sha2(c, 256).alias("sha256"),
        ),
    )


# -- decode / featurize (Pandas-UDF over mapInPandas) ------------------


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic decode stand-in: 256-bin byte histogram as the
    "decoded signal". Real decoders (PIL.Image.open, soundfile, ffmpeg
    frame extraction) plug in with the same ``bytes -> ndarray``
    contract."""
    if payload is None or len(payload) == 0:
        return np.zeros(256, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr, minlength=256).astype(np.float32)


def real_decode(payload: bytes) -> np.ndarray:  # pragma: no cover - env stub
    """Real image decode — requires PIL/opencv, absent in this
    container by design."""
    raise NotImplementedError(
        "codec libraries are not available in this environment; "
        "pass decoder=fake_decode (tests) or a PIL/ffmpeg-backed callable"
    )


def extract_features(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """binary → fixed-dim float feature vector via mapInPandas.

    Arrow-batched: each pandas batch decodes vectorized NumPy-side, no
    per-row Python function dispatch through the serializer. Output
    schema is (id, features array<float>, n_bytes) — the shape an ANN
    index (operators.similarity) consumes directly.
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            sig = np.stack([decoder(p) for p in payloads]) if len(pdf) else np.zeros((0, 256))
            # pool the decoded signal into `dim` buckets (mean-pool) and
            # l2-normalize — a stand-in for a real embedding model head
            pooled = sig.reshape(sig.shape[0], dim, -1).mean(axis=2) if len(pdf) else sig[:, :dim]
            norms = np.linalg.norm(pooled, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            feats = (pooled / norms).astype(np.float32)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "features": list(feats),
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                }
            )

    return df.select(id_col, bin_col).mapInPandas(batches, schema=out_schema)


def sample_segments(
    df: DataFrame, bin_col: str, id_col: str, n_segments: int = 4, segment_bytes: int = 64
) -> DataFrame:
    """Deterministic "frame sampling" for video/audio-as-bytes: take
    ``n_segments`` evenly spaced byte windows. Pure built-ins
    (substring on binary is JVM-side), one row per segment."""
    c = F.col(bin_col)
    total = F.length(c)
    seg = F.explode(F.sequence(F.lit(0), F.lit(n_segments - 1))).alias("segment_idx")
    out = df.select(F.col(id_col), c.alias("__payload"), total.alias("__len"), seg)
    offset = (F.col("segment_idx") * F.greatest((F.col("__len") / n_segments).cast("long"), F.lit(1))) + 1
    return out.select(
        id_col,
        "segment_idx",
        F.substring(F.col("__payload"), offset.cast("int"), segment_bytes).alias("segment"),
        F.col("__len").alias("n_bytes"),
    )


def media_near_dup_pairs(
    df: DataFrame,
    bin_col: str,
    id_col: str,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    threshold: float = 0.98,
) -> DataFrame:
    """Perceptual near-duplicate pairs over media payloads: decode →
    pooled feature vector (extract_features) → sign-quantized
    signature (each feature bit = above/below the global feature mean)
    → candidates share a signature bucket → exact cosine verify at
    ``threshold``. The binary-side analog of dedup.simhash for text:
    re-encoded/resized variants keep their coarse signal shape, so
    they land in the same bucket even when bytes differ.

    Scale: features are FEATURE_DIM floats per object (the payload
    never shuffles); bucketing is a groupBy on a 32/64-bit signature;
    only in-bucket pairs pay the exact cosine — no all-pairs stage.
    The global feature-mean vector is one tiny aggregate row.
    """
    # materialize the decoded features ONCE: three consumers (the
    # global-mean aggregate and both self-join sides) would otherwise
    # re-run the decode+pool mapInPandas pass each (guide §5 caching
    # rule — reused AND expensive); content is deterministic, so the
    # lazy cut is safe (functions.lineage.cut_lineage_lazy)
    from es_analytics_spark.functions.lineage import cut_lineage_lazy

    feats = cut_lineage_lazy(extract_features(df, bin_col, id_col, decoder=decoder))
    dim = FEATURE_DIM
    means = feats.agg(
        *[F.avg(F.col("features")[i]).alias(f"m{i}") for i in range(dim)]
    )
    sig_bits = [
        F.when(F.col("features")[i] > F.col(f"m{i}"), F.lit(1)).otherwise(0)
        * F.lit(2**i)
        for i in range(dim)
    ]
    signed = feats.join(F.broadcast(means)).select(
        "id",
        "features",
        sum(sig_bits[1:], sig_bits[0]).cast("long").alias("sig"),
    )
    a = signed.alias("a")
    b = signed.alias("b")
    ip = F.expr(
        "aggregate(zip_with(a.features, b.features, (x, y) -> x * y),"
        " 0D, (acc, v) -> acc + v)"
    )
    # features are l2-normalized by extract_features, so dot = cosine
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(ip, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
