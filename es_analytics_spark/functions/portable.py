"""Portable integer hash for deterministic, engine-agnostic sampling.

One linear-congruential mix ``(id * A + B) mod P`` shared by the Spark
expressions and the DuckDB oracle SQL: pure BIGINT arithmetic in both
engines (no overflow: id * A + B < 2^63 for doc-scale ids), uniform
enough for rate-based acceptance sampling and sampling keys. Lives in
its own module so both the catalog modules and Python workers can
import it without touching the (heavy, registry-building) query
modules — importing a catalog module from a worker would re-enter
queries.py and trip its import-time registration.
"""

from __future__ import annotations

from pyspark.sql import Column

MIX_A, MIX_B, MIX_P = 9973, 7919, 1_000_003


def accept_hash_sql(id_expr: str) -> str:
    return f"(({id_expr}) * {MIX_A} + {MIX_B}) % {MIX_P}"


def accept_hash(col: Column) -> Column:
    return (col * MIX_A + MIX_B) % MIX_P
