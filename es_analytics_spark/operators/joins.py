"""Join operators Spark lacks as primitives (SURVEY.md §2.B Joins).

as-of join: implemented with the union + last(ignorenulls) window
rewrite rather than join-then-filter. The naive inequality join
explodes to O(matches) intermediate rows; the union plan is one shuffle
on the key, a sort within partitions, and a linear window pass —
the shape that survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance: Column | None = None,
    tie_break: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row with equal
    ``on`` key and ``right[right_ts] <= left[left_ts]``
    (``direction="backward"``, the default; DuckDB ``ASOF JOIN``
    semantics) or ``right[right_ts] >= left[left_ts]``
    (``direction="forward"`` — "next event at-or-after"), left outer.

    Forward is the identical union + running-last plan scanned in
    descending timestamp order — still one shuffle, no join node.

    ``tie_break``: right column ordering the winner among right rows
    sharing the same timestamp (the largest tie value wins, in both
    directions); required for a deterministic, oracle-matchable
    result.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    payload = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols])

    order = [F.col("__ts").desc() if fwd else F.col("__ts").asc(), F.col("__side").asc()]
    if tie_break is not None:
        order.append(F.col("__tie").asc_nulls_first())

    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),  # right sorts before left at equal ts → inclusive <=
        (F.col(tie_break) if tie_break else F.lit(None)).alias("__tie"),
        payload.alias("__payload"),
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).alias("__tie"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
    )
    unioned = l.unionByName(r.select(*r.columns, F.lit(None).cast(l.schema["__lrow"].dataType).alias("__lrow")))

    w = W.partitionBy("__key").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    matched = unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = matched.filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            F.col("__match.__rts") - F.col("__ts")
            if fwd
            else F.col("__ts") - F.col("__match.__rts")
        )
        out = out.withColumn("__match", F.when(gap <= tolerance, F.col("__match")))
    sel = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    sel += [F.col(f"__match.{c}").alias(c) for c in right_cols]
    return out.select(*sel)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant equi join: the (large, skewed) left side gets a
    random salt in [0, salt_buckets); the (smaller) right side is
    replicated across all salt values, so a hot key's rows spread over
    ``salt_buckets`` tasks instead of one straggler.

    AQE's skew-join splitting handles most cases at runtime; this
    explicit rewrite is for the pathological keys AQE can't split
    (single-key hot partitions feeding a window/agg downstream) and as
    the documented, testable form of the technique.
    """
    salted_l = left.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_r = right.select(F.col("*"), salts)
    return salted_l.join(salted_r, [on, "__salt"], how).drop("__salt")


def topk_per_group(df: DataFrame, keys: list[str], order: list[Column], k: int) -> DataFrame:
    """Deterministic per-group top-k via a rank window (planner keeps it
    as one shuffle + partial sort; no global sort)."""
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .withColumnRenamed("__rn", "rank_in_group")
    )


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Pure interval join (point ∈ [start, end], NO equi key) without
    the nested-loop blow-up: both sides map to fixed-width time
    buckets — points to the one bucket containing them, intervals
    exploded to every bucket they overlap — then a plain equi-join on
    the bucket plus the exact range filter. Each qualifying pair
    appears exactly once (the point's bucket), so no dedup pass.

    Scale shape: shuffle on the bucket id replaces the BNLJ that a raw
    theta join plans; cost is points + sum(interval_span/width) rows.
    Pick ``bucket`` near the median interval span — too fine explodes
    the interval side, too coarse funnels everything into few buckets
    (time skew: salt hot buckets or AQE-split them).
    """
    unit_us = {
        "1 hour": 3_600_000_000,
        "1 day": 86_400_000_000,
        "1 week": 7 * 86_400_000_000,
    }[bucket]
    def us(c: str):
        # NTZ columns cast to TIMESTAMP first (UTC session: same wall clock)
        return F.unix_micros(F.col(c).cast("timestamp"))

    p = points.withColumn("__b", F.floor(us(ts_col) / unit_us))
    i = intervals.withColumn(
        "__b",
        F.explode(F.sequence(F.floor(us(start_col) / unit_us), F.floor(us(end_col) / unit_us))),
    )
    return (
        p.join(i, "__b")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("__b")
    )
