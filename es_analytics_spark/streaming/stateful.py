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
