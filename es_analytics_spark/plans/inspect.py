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


def single_partition_hotspots(df: DataFrame) -> list[str]:
    """Window/Sort nodes whose data flows through an
    ``Exchange SinglePartition`` — the shape that funnels a data-sized
    input onto ONE task (the 100 TB killer the ml_split_shuffle fix
    removed). Returns the offending node lines; empty list = clean.

    Detection: parse the physical plan tree (indentation = depth), and
    for each Window/Sort node find the first Exchange in its subtree;
    flag it when that exchange is SinglePartition. Bounded-by-design
    cases (e.g. a cumsum over one row per shuffle partition) must be
    allowlisted by the caller — plan text cannot see cardinality.
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    nodes: list[tuple[int, str]] = []  # (depth, node text)
    for ln in plan.splitlines():
        m = re.search(r"(?:\+-|:-) ", ln)
        if m:
            depth = m.start() // 3 + 1
            text = ln[m.end():]
        else:
            depth, text = 0, ln
        text = re.sub(r"^\*\(\d+\) ", "", text).strip()  # codegen prefix
        if text:
            nodes.append((depth, text))

    # distribution-preserving single-child nodes: the exchange that set
    # the Window/Sort's input distribution is found by walking straight
    # down through these; anything else (join, aggregate, limit, scan)
    # establishes its own output distribution, so stop clean there
    passthrough = ("Sort ", "Project", "Filter", "Window", "WindowGroupLimit")
    hits = []
    for i, (d, text) in enumerate(nodes):
        if not (text.startswith("Window") or text.startswith("Sort ")):
            continue
        cur = d
        for dj, tj in nodes[i + 1:]:
            if dj != cur + 1:
                break  # not the direct child chain anymore
            if tj.startswith(("Exchange", "ReusedExchange")):
                if "SinglePartition" in tj:
                    hits.append(text[:100])
                break
            if not tj.startswith(passthrough):
                break
            cur = dj
    return hits
