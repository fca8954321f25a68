"""The engine's Python-extension surface (SURVEY.md §2.B UDF/UDAF/UDTF).

The rule of the engine: built-ins first (everything in queries.py is
JVM-side); these wrappers exist for the cases users genuinely need
Python — and they demonstrate the fast variants of each shape:

- scalar: Arrow-batched pandas_udf (never row-at-a-time F.udf in hot
  paths)
- UDAF: GROUPED_AGG pandas_udf with math.fsum (exact summation → the
  result is independent of row arrival order, keeping distributed runs
  deterministic)
- grouped map: applyInPandas with an explicit in-group sort before any
  float accumulation (same determinism argument)
- UDTF: Python table function (row-expanding; the slow path, kept off
  hot tables)
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def weighted_avg_udaf():
    """GROUPED_AGG: sum(v*w)/sum(w) with exact (order-independent)
    float summation.

    Built lazily — decorating with @pandas_udf at module import time
    requires an active SparkSession (return-type resolution), which a
    library must not assume.
    """

    @pandas_udf("double")
    def wavg(values: pd.Series, weights: pd.Series) -> float:
        num = math.fsum((values * weights).tolist())
        den = math.fsum(weights.tolist())
        return num / den if den else float("nan")

    return wavg


def grouped_weighted_avg(
    df: DataFrame, keys: list[str], value_col: str, weight_col: str, out_col: str = "wavg"
) -> DataFrame:
    return df.groupBy(*keys).agg(
        weighted_avg_udaf()(F.col(value_col), F.col(weight_col)).alias(out_col)
    )


def zscore_normalize(
    df: DataFrame, keys: list[str], value_col: str, order_col: str, out_col: str = "zscore"
) -> DataFrame:
    """applyInPandas grouped map: per-group z-score.

    The group is sorted by ``order_col`` before any accumulation so the
    float math sees one canonical order no matter how the shuffle
    delivered rows.
    """
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType())]
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].astype(float)
        mean = math.fsum(vals.tolist()) / len(vals)
        var = math.fsum(((vals - mean) ** 2).tolist()) / (len(vals) - 1) if len(vals) > 1 else 0.0
        std = math.sqrt(var)
        pdf[out_col] = (vals - mean) / std if std > 0 else 0.0
        return pdf

    return df.groupBy(*keys).applyInPandas(normalize, schema=schema)


def token_udtf(spark) -> None:
    """Register a Python UDTF `split_tokens(text)` → (pos, token) rows.

    Demonstrates the UDTF shape (Spark 3.5+). Row-at-a-time by nature —
    the built-in posexplode(split(...)) in queries.fn_explode_posexplode
    is the hot-path equivalent.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, token: string")
    class SplitTokens:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.split()):
                    yield i, tok

    spark.udtf.register("split_tokens", SplitTokens)
    return SplitTokens
