"""Arbitrary stateful streaming (SURVEY.md §2.B: applyInPandasWithState).

Custom per-key state the built-in windows can't express: a running
per-user profile (event count, value sum, last seen) maintained across
micro-batches with GroupState, emitted every epoch. State is keyed and
partition-local — the same code runs on a 1000-executor cluster with
state sharded by user.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    last_ts = None
    for pdf in pdfs:
        pdf = pdf.sort_values("event_id", kind="mergesort")  # canonical order
        n += len(pdf)
        total = math.fsum([total] + pdf["value"].astype(float).tolist())
        if len(pdf):
            last_ts = pdf["ts"].max()
    state.update((n, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "last_ts": [last_ts],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Cumulative per-user profile per epoch. On a bounded replay the
    row with max n_events per user equals the batch aggregate —
    that's the oracle check."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_user_profiles_tws(events: DataFrame) -> DataFrame:
    """The same running profile on Spark 4's transformWithState API
    (StatefulProcessor + typed ValueState) — the successor surface to
    applyInPandasWithState: explicit state variables with their own
    schemas/TTLs instead of one state tuple, init/close lifecycle, and
    timer support. Keeping both operators pins that the engine's
    stateful contract survives the API migration (same oracle).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._profile = handle.getValueState(
                "profile", STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:  # noqa: N802
            got = self._profile.get() if self._profile.exists() else None
            n, total = got if got is not None else (0, 0.0)
            last_ts = None
            for pdf in rows:
                pdf = pdf.sort_values("event_id", kind="mergesort")
                n += len(pdf)
                total = math.fsum([total] + pdf["value"].astype(float).tolist())
                if len(pdf):
                    last_ts = pdf["ts"].max()
            self._profile.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "last_ts": [last_ts],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=ProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# KMV sketch state: bounded mergeable distinct-count state
# ---------------------------------------------------------------------------

KMV_K = 64
KMV_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("kmv_est", T.DoubleType()),
    ]
)
KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_rows", T.LongType()),
        T.StructField("kmins", T.ArrayType(T.LongType())),
    ]
)


def kmv_estimate(kmins: list, mix_p: int, k: int = KMV_K) -> float:
    """The KMV estimator over a k-smallest-distinct-hash state, spelled
    to match the batch/oracle SQL bit-for-bit: exact integers into one
    IEEE double division, half-up quantized at 1e4 (Python floats ARE
    IEEE doubles, so this is the same arithmetic the JVM and DuckDB
    run)."""
    import math as _math

    if len(kmins) < k:
        return float(len(kmins))
    return _math.floor((k - 1) * mix_p * 1.0 / kmins[k - 1] * 1e4 + 0.5) / 1e4


def running_kmv_distinct(hashes: DataFrame, mix_p: int) -> DataFrame:
    """Distinct-count KMV sketch maintained in streaming state: per
    key, the k smallest DISTINCT hash values — merging a micro-batch is
    set-union + re-truncate, the same merge a partial/final batch
    aggregate or a cross-stream sketch union performs (KMV state is
    mergeable by construction, which is what makes it streaming-legal).
    State per key is <= k longs FOREVER — the streaming
    dropDuplicates alternative keys state by every distinct value.

    Emits the cumulative estimate per epoch; on a bounded replay the
    max-n_rows row per key must equal the batch KMV estimate exactly
    (same hashes, same truncation, same arithmetic)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_rows, kmins = state.get if state.exists else (0, [])
        s = set(kmins)
        for pdf in pdfs:
            n_rows += len(pdf)
            s.update(int(h) for h in pdf["h"])
        kmins = sorted(s)[:KMV_K]
        state.update((n_rows, kmins))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_rows": [n_rows],
                "kmv_est": [kmv_estimate(kmins, mix_p)],
            }
        )

    return hashes.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=KMV_OUTPUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming windowed funnel ------------------------------------------

FUNNEL_STEP_CAP = 32  # earliest step-times kept per user per step type

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("funnel_level", T.IntegerType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("t1", T.LongType()),
        T.StructField("clicks", T.ArrayType(T.LongType())),
        T.StructField("purchases", T.ArrayType(T.LongType())),
    ]
)


def running_funnel_levels(events: DataFrame, window_us: int) -> DataFrame:
    """The windowed funnel (ts_funnel_windowed semantics) maintained BY
    THE STREAMING ENGINE in arbitrary state: per user, the earliest
    view time plus the FUNNEL_STEP_CAP earliest click/purchase times
    live in GroupState, and every epoch re-derives the furthest level
    from those anchors — so late or out-of-order arrivals that lower
    t1 retroactively re-qualify earlier clicks, exactly as the batch
    window spelling would.

    State per user is <= 2 + 2*cap longs FOREVER. The level is exact
    whenever each qualifying step is among its user's cap earliest of
    that type (a user needs > cap clicks strictly before their first
    view to break it — the KMV-style bounded-state trade, and the
    replayed result is pinned equal to the batch/SQL funnel on the
    fixtures)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, t1, clicks, purchases = (
            state.get if state.exists else (0, None, [], [])
        )
        clicks, purchases = list(clicks), list(purchases)
        for pdf in pdfs:
            n += len(pdf)
            for et, tus in zip(pdf["event_type"], pdf["tus"]):
                tus = int(tus)
                if et == "view":
                    t1 = tus if t1 is None else min(t1, tus)
                elif et == "click":
                    clicks.append(tus)
                elif et == "purchase":
                    purchases.append(tus)
        clicks = sorted(set(clicks))[:FUNNEL_STEP_CAP]
        purchases = sorted(set(purchases))[:FUNNEL_STEP_CAP]
        state.update((n, t1, clicks, purchases))
        t2 = (
            min((c for c in clicks if t1 < c <= t1 + window_us), default=None)
            if t1 is not None
            else None
        )
        t3 = (
            min((p for p in purchases if t2 < p <= t1 + window_us), default=None)
            if t2 is not None
            else None
        )
        level = 3 if t3 is not None else 2 if t2 is not None else 1 if t1 is not None else 0
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_rows": [n], "funnel_level": [level]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming bottom-k uniform sample ----------------------------------

BOTTOMK_K = 16

BOTTOMK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("sample_ids", T.ArrayType(T.LongType())),
    ]
)

BOTTOMK_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("hs", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
    ]
)


def running_bottomk_sample(hashed: DataFrame, k: int = BOTTOMK_K) -> DataFrame:
    """Uniform k-sample per key maintained in streaming state: keep the
    rows whose portable hash is among the k smallest seen — the
    deterministic bottom-k sample (hash order is a uniform random
    order, but reproducible across engines, replays, and reruns,
    unlike reservoir sampling's RNG). Merge per micro-batch is
    union + re-truncate, the same mergeability argument as the KMV
    sketch — in fact bottom-k IS the KMV state carrying its row ids.

    State per key is <= k (hash, id) pairs forever; the replayed final
    sample must equal the batch bottom-k (and therefore the SQL
    oracle) exactly."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, hs, ids = state.get if state.exists else (0, [], [])
        pairs = dict(zip(ids, hs))
        for pdf in pdfs:
            n += len(pdf)
            for h, i in zip(pdf["h"], pdf["event_id"]):
                pairs[int(i)] = int(h)
        best = sorted(((h, i) for i, h in pairs.items()))[:k]
        hs = [h for h, _ in best]
        ids = [i for _, i in best]
        state.update((n, hs, ids))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_rows": [n], "sample_ids": [ids]}
        )

    return hashed.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=BOTTOMK_OUTPUT_SCHEMA,
        stateStructType=BOTTOMK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming alert debounce (cooldown suppression) ---------------------

DEBOUNCE_STATE_CAP = 4096  # per-key alert cap (fixture max ~60)

DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_alerts", T.LongType()),
        T.StructField("n_kept", T.LongType()),
        T.StructField("first_kept_us", T.LongType()),
        T.StructField("last_kept_us", T.LongType()),
    ]
)

DEBOUNCE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ts", T.ArrayType(T.LongType())),
        T.StructField("ids", T.ArrayType(T.LongType())),
    ]
)


def running_debounce(alerts: DataFrame, cooldown_us: int) -> DataFrame:
    """seq_alert_debounce's cooldown chain maintained by the STREAMING
    engine: state per user is the (ts, event_id) alert set, and every
    epoch RE-DERIVES the kept chain from the sorted set — so unlike a
    naive "carry last_kept" design, late or out-of-order arrivals that
    insert an earlier alert retroactively re-anchor the chain, exactly
    as the batch recursive-CTE oracle would. This is the same
    bounded-state re-derivation trade running_funnel_levels documents:
    a key needs more than DEBOUNCE_STATE_CAP alerts to break exactness
    (fixture max is ~60; a production cap pairs with an alert-volume
    guard upstream).

    Input must be pre-filtered to alert rows with columns
    (user_id, tus, event_id); state is keyed by user and
    partition-local, so the same code shards across executors."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, ts, ids = state.get if state.exists else (0, [], [])
        pairs = set(zip(ts, ids))
        for pdf in pdfs:
            n += len(pdf)
            for t, i in zip(pdf["tus"], pdf["event_id"]):
                pairs.add((int(t), int(i)))
        ordered = sorted(pairs)[:DEBOUNCE_STATE_CAP]
        state.update(
            (n, [t for t, _ in ordered], [i for _, i in ordered])
        )
        kept = []
        last = None
        for t, _ in ordered:
            if last is None or t >= last + cooldown_us:
                kept.append(t)
                last = t
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_rows": [n],
                "n_alerts": [len(ordered)],
                "n_kept": [len(kept)],
                "first_kept_us": [kept[0] if kept else None],
                "last_kept_us": [kept[-1] if kept else None],
            }
        )

    return alerts.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HW_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("g", T.IntegerType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("day_epoch", T.LongType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
        T.StructField("seasonal", T.DoubleType()),
        T.StructField("fitted", T.DoubleType()),
        T.StructField("residual", T.DoubleType()),
    ]
)

HW_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("days", T.ArrayType(T.LongType())),
        T.StructField("sums10", T.ArrayType(T.LongType())),
    ]
)

_US_PER_DAY = 86_400_000_000


def running_holt_winters(series: DataFrame) -> DataFrame:
    """ts_holt_winters_additive's recurrence maintained by the STREAMING
    engine: per-series state is the day -> exact scale-10 integer value
    sum (the dsum decimal contract carried as plain int arithmetic, so
    late or out-of-order rows land in their day exactly as batch
    aggregation would), and every epoch RE-DERIVES the whole forecast
    from that calendar-bounded state via the SHARED recursion
    (functions.forecast.holt_winters_rows) — the bounded-state
    re-derivation trade running_debounce documents. Rows therefore
    match the batch entry bit-for-bit once the stream drains.

    Input columns: (g, tus, value) — g is the series key (the fixture
    has one global series; a multi-tenant deployment keys by series id
    and the state shards across executors). State stays exact while a
    day's scale-10 sum fits int64 (~9e8 value-units per day — two
    orders past the sf100 fixture day)."""
    from decimal import ROUND_HALF_UP, Decimal

    from es_analytics_spark.functions.forecast import holt_winters_rows

    q10 = Decimal("1e-10")

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, days, sums = state.get if state.exists else (0, [], [])
        acc = dict(zip(days, sums))
        for pdf in pdfs:
            n += len(pdf)
            for tus, v in zip(pdf["tus"], pdf["value"]):
                d = int(tus) // _US_PER_DAY
                u = int(
                    Decimal(float(v)).quantize(q10, rounding=ROUND_HALF_UP)
                    .scaleb(10)
                )
                acc[d] = acc.get(d, 0) + u
        ordered = sorted(acc)
        state.update((n, ordered, [acc[d] for d in ordered]))
        # dsum's output convention: round the scale-10 sum to scale 4
        # HALF_UP (away from zero, sign-aware — Python // floors toward
        # -inf), then one exact int -> double division

        def r4(u: int) -> int:
            return (
                (u + 5 * 10**5) // 10**6
                if u >= 0
                else -((-u + 5 * 10**5) // 10**6)
            )

        ys = [r4(acc[d]) / 1e4 for d in ordered]
        rows = holt_winters_rows(ys)
        yield pd.DataFrame(
            [
                {
                    "g": key[0],
                    "n_rows": n,
                    "day_epoch": ordered[r["idx"]],
                    "y": r["y"],
                    "level": r["level"],
                    "trend": r["trend"],
                    "seasonal": r["seasonal"],
                    "fitted": r["fitted"],
                    "residual": r["residual"],
                }
                for r in rows
            ],
            columns=[f.name for f in HW_OUTPUT_SCHEMA.fields],
        )

    return series.groupBy("g").applyInPandasWithState(
        update,
        outputStructType=HW_OUTPUT_SCHEMA,
        stateStructType=HW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


ABANDON_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_views", T.LongType()),
        T.StructField("n_converted", T.LongType()),
    ]
)

ABANDON_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("views", T.ArrayType(T.LongType())),
        T.StructField("purchases", T.ArrayType(T.LongType())),
    ]
)

ABANDON_STATE_CAP = 65_536


def running_abandonment(events: DataFrame, window_us: int) -> DataFrame:
    """seq_cart_abandonment's windowed-existence check maintained by
    the STREAMING engine: state per user is the (view-ts, purchase-ts)
    pair of sorted timestamp sets, and every epoch RE-DERIVES each
    view's converted flag (any purchase strictly later and within
    ``window_us``) from those sets — so late or out-of-order arrivals
    (a purchase landing after its view's epoch) retroactively convert
    the view, exactly as the batch correlated-EXISTS oracle would.
    Same bounded-state re-derivation trade as running_debounce; a key
    needs more than ABANDON_STATE_CAP events of one kind to break
    exactness.

    Input columns: (user_id, tus, kind) with kind 1 = view,
    2 = purchase."""
    from bisect import bisect_right, insort

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, views, purchases = state.get if state.exists else (0, [], [])
        views, purchases = list(views), list(purchases)
        for pdf in pdfs:
            n += len(pdf)
            for tus, kind in zip(pdf["tus"], pdf["kind"]):
                if int(kind) == 1:
                    insort(views, int(tus))
                else:
                    insort(purchases, int(tus))
        views = views[:ABANDON_STATE_CAP]
        purchases = purchases[:ABANDON_STATE_CAP]
        state.update((n, views, purchases))
        conv = 0
        for v in views:
            i = bisect_right(purchases, v)
            if i < len(purchases) and purchases[i] <= v + window_us:
                conv += 1
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_rows": [n],
                "n_views": [len(views)],
                "n_converted": [conv],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=ABANDON_OUTPUT_SCHEMA,
        stateStructType=ABANDON_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- per-user Markov transition counts ----------------------------------

TRANSITION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("src_code", T.IntegerType()),
        T.StructField("dst_code", T.IntegerType()),
        T.StructField("cnt", T.LongType()),
    ]
)

TRANSITION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("tus", T.ArrayType(T.LongType())),
        T.StructField("eid", T.ArrayType(T.LongType())),
        T.StructField("code", T.ArrayType(T.IntegerType())),
    ]
)

TRANSITION_STATE_CAP = 65_536


def running_transitions(events: DataFrame) -> DataFrame:
    """ts_markov_transitions' per-user event sequence maintained by the
    STREAMING engine: state per user is the (ts, event_id, type-code)
    triple list kept sorted by the batch twin's exact total order
    (EPOCH_US(ts), event_id), and every epoch RE-DERIVES the full
    (src -> dst) transition multiset from that sequence — so an
    out-of-order arrival that lands BETWEEN two already-seen events
    retroactively splits their transition exactly as the batch lead()
    window would. Same bounded-state re-derivation trade as
    running_abandonment (a key needs more than TRANSITION_STATE_CAP
    events to break exactness — orders of magnitude above any fixture
    or per-user activity bound).

    **Cap behavior is detectable, not silent**: past the cap the NEWEST
    events are kept (a sliding sequence — output keeps evolving with
    arrivals, instead of freezing on the earliest CAP events while
    later epochs silently discard everything), and the epoch emits an
    overflow marker row ``(src_code=-2, dst_code=-2, cnt=n_dropped)``
    so consumers can see exactness was degraded and by how much.
    Negative codes are reserved: -1 is the keyed no-op row, -2 the
    overflow marker; real transitions filter ``src_code >= 0``.

    Input columns: (user_id, tus, eid, code). Emits one row per
    (user, src, dst) per epoch plus n_rows for final-epoch selection.
    """
    from bisect import insort

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, tus, eid, code = state.get if state.exists else (0, [], [], [])
        triples = sorted(zip(tus, eid, code))
        for pdf in pdfs:
            n += len(pdf)
            for t, e, c in zip(pdf["tus"], pdf["eid"], pdf["code"]):
                insort(triples, (int(t), int(e), int(c)))
        triples = triples[-TRANSITION_STATE_CAP:]  # keep the NEWEST on overflow
        state.update(
            (
                n,
                [t for t, _e, _c in triples],
                [e for _t, e, _c in triples],
                [c for _t, _e, c in triples],
            )
        )
        counts: dict[tuple[int, int], int] = {}
        for (_t1, _e1, c1), (_t2, _e2, c2) in zip(triples, triples[1:]):
            counts[(c1, c2)] = counts.get((c1, c2), 0) + 1
        dropped = n - len(triples)
        if dropped > 0:
            counts[(-2, -2)] = dropped  # overflow marker: exactness degraded
        if not counts:
            counts[(-1, -1)] = 0  # keyed no-op row keeps n_rows visible
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(counts),
                "n_rows": [n] * len(counts),
                "src_code": [s for s, _d in counts],
                "dst_code": [d for _s, d in counts],
                "cnt": [counts[k] for k in counts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
