"""Order-independent ("exact") floating aggregate expressions.

Summing doubles is order-dependent; a distributed partial/final
aggregation visits rows in a different order than a single-threaded
engine, so SUM(double) differs in the last ulp run-to-run and
engine-to-engine. The engine's deterministic aggregates cast each
addend to DECIMAL(38, s) (exact, order-independent integer arithmetic)
and cast the final sum back to double. Any engine computing the same
contract bit-matches — this is what makes the DuckDB oracle hash-compare
viable (SURVEY.md §7 "Float canonicalization").

The per-addend double expression itself (e.g. price * (1 - discount))
is IEEE-754 double math, identical on every engine.

The final decimal→double conversion is itself a portability hazard:
converting a scale-10 decimal whose unscaled int128 exceeds 2^53 is
correctly rounded by Java BigDecimal but goes through intermediate
float division in other engines (observed: DuckDB differs by ~6e-8 at
1e8 magnitude). So the sum is rounded (HALF_UP — the rule Spark and
DuckDB share; decimal→decimal *cast* truncates in DuckDB but rounds in
Spark, so cast is unusable) to scale 4 first — the unscaled value then
fits in 2^53 up to ~9e11 magnitude, where (int → double exact, ÷10^4
one correctly-rounded IEEE op) is deterministic everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql import types as T

SCALE = 10
OUT_SCALE = 4


def dsum(col: Column | str) -> Column:
    """Deterministic SUM over a double column/expression → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(T.DecimalType(38, SCALE))), OUT_SCALE).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum divided (in double) by count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def dsum_expr(sql_expr: str) -> str:
    """DuckDB/ANSI SQL text equivalent of :func:`dsum`."""
    return (
        f"CAST(ROUND(SUM(CAST(({sql_expr}) AS DECIMAL(38,{SCALE}))),"
        f" {OUT_SCALE}) AS DOUBLE)"
    )


def davg_expr(sql_expr: str) -> str:
    """DuckDB/ANSI SQL text equivalent of :func:`davg`."""
    return f"({dsum_expr(sql_expr)} / COUNT({sql_expr}))"
