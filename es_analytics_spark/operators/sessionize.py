"""Gap-based sessionization (SURVEY.md §2.B Window functions).

lag + cumulative-sum window over (user, ts): one shuffle on the user
key, linear passes after the sort — the canonical scalable plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def sessionize(
    df: DataFrame, user_col: str, ts_col: str, gap_seconds: int, session_col: str = "session_id"
) -> DataFrame:
    """Assign 1-based per-user session numbers; a new session starts when
    the gap since the previous event exceeds ``gap_seconds``."""
    w = W.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # Compare in microseconds: unix_timestamp() truncates to whole seconds,
    # which misses boundaries where the true gap exceeds gap_seconds only in
    # the fractional part (DuckDB EPOCH() is fractional).
    is_new = F.when(
        prev.isNull()
        | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
