"""Shared sequential-forecast recursions (pure Python, engine-agnostic).

The batch catalog entry (ts_holt_winters_additive) and its streaming
twin (stream_holt_winters) must emit BIT-IDENTICAL rows, and both must
match the recursive-CTE DuckDB oracle — so the recurrence lives here
once, as plain float arithmetic (Python floats are IEEE doubles; the
same update order as the oracle's fixed expression trees).
"""

from __future__ import annotations

import math

# Dyadic smoothing constants (exact in binary — the catalog convention)
HW_ALPHA = 0.5
HW_BETA = 0.25
HW_GAMMA = 0.25
HW_PERIOD = 7


def q6(x: float) -> float:
    """The catalog 1e-6 half-up quantizer (FLOOR spelling)."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def holt_winters_state(ys: list[float]) -> tuple[float, float, list[float]]:
    """Run the additive Holt-Winters recursion over the full series and
    return the final (level, trend, seasonal[7]) state — seasonal[0]
    applies to the next (t+1) step. Same init/update order as
    holt_winters_rows. Requires len(ys) >= 15."""
    l0 = sum(ys[0:7]) / 7
    b0 = (sum(ys[7:14]) / 7 - sum(ys[0:7]) / 7) / 7
    s = [y - l0 for y in ys[0:7]]
    lev, tr = l0, b0
    for t in range(7, len(ys)):
        y = ys[t]
        s7 = s[0]
        l_new = 0.5 * (y - s7) + 0.5 * (lev + tr)
        b_new = 0.25 * (l_new - lev) + 0.75 * tr
        s_new = 0.25 * (y - l_new) + 0.75 * s7
        s = s[1:7] + [s_new]
        lev, tr = l_new, b_new
    return lev, tr, s


def holt_winters_forecast(ys: list[float], horizon: int) -> list[float]:
    """h-step-ahead forecasts from the state after training on ``ys``:
    f_h = level + h*trend + seasonal[(h-1) mod 7]. Mirrors the
    recursive-CTE oracle's fixed expression tree."""
    lev, tr, s = holt_winters_state(ys)
    return [lev + h * tr + s[(h - 1) % 7] for h in range(1, horizon + 1)]


def holt_winters_rows(ys: list[float]) -> list[dict]:
    """Additive Holt-Winters over an ordered daily series.

    Returns one dict per day from index 7 (day 8) on, with keys
    (idx, y, level, trend, seasonal, fitted, residual) — idx is the
    0-based position in ``ys``; float outputs are 1e-6-quantized.
    Initialization and update order mirror the recursive-CTE oracle in
    queries_sql17 exactly (see that module's docstring)."""
    if len(ys) < 15:
        return []
    l0 = sum(ys[0:7]) / 7
    b0 = (sum(ys[7:14]) / 7 - sum(ys[0:7]) / 7) / 7
    s = [y - l0 for y in ys[0:7]]
    lev, tr = l0, b0
    out: list[dict] = []
    for t in range(7, len(ys)):
        y = ys[t]
        s7 = s[0]
        fitted = lev + tr + s7
        l_new = 0.5 * (y - s7) + 0.5 * (lev + tr)
        b_new = 0.25 * (l_new - lev) + 0.75 * tr
        s_new = 0.25 * (y - l_new) + 0.75 * s7
        s = s[1:7] + [s_new]
        lev, tr = l_new, b_new
        out.append(
            {
                "idx": t,
                "y": y,
                "level": q6(l_new),
                "trend": q6(b_new),
                "seasonal": q6(s_new),
                "fitted": q6(fitted),
                "residual": q6(y - fitted),
            }
        )
    return out
