"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the engine's answer to "operator Spark
lacks, not expressible with built-in windowed aggs" — SURVEY §2.9 /
brief's custom-stateful-operator requirement).

Semantics match the batch twin (queries.sessions.s_sessionize): a
session closes when the same user's next event arrives more than
GAP minutes later. State per user = the open session (start, last-seen,
count, value sum) — O(1) per user regardless of history; closed
sessions are emitted in append mode. The batch/stream parity test
drains the source with availableNow and checks the emitted closed
sessions against the batch plan's output minus each user's still-open
final session.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, sv double"


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = SESSION_GAP_MIN * 60_000_000
    if state.exists:
        start, last, n, sv = state.get
    else:
        start = last = None
        n, sv = 0, 0.0
    closed: list[tuple[Any, ...]] = []
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])
    for ts, val in zip(rows["ts"], rows["value"]):
        us = int(pd.Timestamp(ts).value // 1000)
        if last is not None and us - last > gap_us:
            closed.append(
                (key[0], pd.Timestamp(start * 1000), n, round(sv, 2))
            )
            start, n, sv = None, 0, 0.0
        if start is None:
            start = us
        n += 1
        sv += float(val)
        last = us
    state.update((start, last, n, sv))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "n_events", "sum_value"]
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Stateful sessionizer over a streaming events DataFrame."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionize_available_now(
    spark, source_dir: str, query_name: str
) -> DataFrame:
    """Drain the source, emit all closed sessions, return the sink."""
    from recommender_systems_spark.streaming.events import read_events_stream

    q = (
        sessionize_stream(read_events_stream(spark, source_dir))
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
