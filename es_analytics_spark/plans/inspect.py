"""Physical-plan inspection helpers — the engine's scale guardrails.

A query that is correct but scans all columns, skips pushdown, or
cartesian-joins will pass the oracle and still fall over at 100 TB.
These helpers turn `.explain("formatted")` into assertions the test
suite can pin (tests/test_plans.py), so plan regressions fail CI the
same way wrong answers do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *needles: str) -> None:
    """Assert parquet-level pushdown happened (PushedFilters mentions
    each needle column)."""
    plan = physical_plan(df)
    assert "PushedFilters: [" in plan, f"no pushed filters in plan:\n{plan}"
    for n in needles:
        assert any(
            n in line for line in plan.splitlines() if "PushedFilters" in line
        ), f"filter on {n} not pushed:\n{plan}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = physical_plan(df)
    got = plan.count("BroadcastHashJoin")
    assert got >= min_count, f"expected ≥{min_count} broadcast joins, saw {got}:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (ReadSchema) — for asserting
    column pruning."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols.extend(part.split(":")[0].strip() for part in inner.split(",") if ":" in part)
    return cols


def plan_audit(df: DataFrame) -> dict:
    """Summarize the physical plan's scale-relevant shape: shuffle
    (Exchange) count, broadcast count, scan count, and whole-stage
    codegen span count. The audit is what the shuffle-budget tests
    pin — a refactor that silently doubles the shuffles fails CI even
    while answers stay right."""
    import re

    plan = physical_plan(df)
    # tree section only: node lines end with "(N)"; the details section
    # repeats every node as "(N) Name" and would double-count
    tree = [
        line
        for line in plan.splitlines()
        if re.search(r"\(\d+\)\s*$", line) and not line.lstrip().startswith("(")
    ]
    def n(name: str) -> int:
        return sum(1 for line in tree if re.search(rf"\b{name}\b", line))

    return {
        # \bExchange\b does not match inside BroadcastExchange /
        # ReusedExchange, so this is exactly the shuffle count
        "shuffles": n("Exchange"),
        "broadcasts": n("BroadcastExchange"),
        "reused_exchanges": n("ReusedExchange"),
        "scans": n("Scan parquet"),
        "sorts": n("Sort"),
        "nodes": len(tree),
    }
