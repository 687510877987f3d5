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

Scale shape (round-13): the stream groups by a USER BUCKET
(pmod(user_id, 256)), not the raw user id, and each group's state is
the composite array-encoded map of its users' open sessions.
``applyInPandasWithState`` pays ~0.8 ms of Arrow/pandas plumbing PER
GROUP per micro-batch — measured 126 s for a 10 M-event drain at
150 k user-groups (sf10), pure per-group overhead, kernel math
negligible. Bucketing divides the group count by ~600 while keeping
identical per-user session logic (the kernel loops users WITHIN one
NumPy frame, the ALS SOLVE_BUCKETS trick applied to streaming state).
State size is unchanged — the same per-user tuples, packed into five
parallel arrays per bucket.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30
SESSION_BUCKETS = 256

_OUT_SCHEMA = (
    "user_id long, session_start timestamp, n_events long, sum_value double"
)
# Composite per-bucket state: parallel arrays over the bucket's users.
_STATE_SCHEMA = (
    "user_ids array<long>, starts array<long>, lasts array<long>, "
    "ns array<long>, svs array<double>"
)


def _sessionize_bucket(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    gap_us = SESSION_GAP_MIN * 60_000_000
    st: dict[int, list] = {}
    if state.exists:
        uids, starts, lasts, ns, svs = state.get
        st = {
            int(u): [s, l, n, v]
            for u, s, l, n, v in zip(uids, starts, lasts, ns, svs)
        }
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts", "event_id"])
    # µs epoch regardless of the Arrow batch's native unit (the old
    # per-row pd.Timestamp(ts).value // 1000, vectorised).
    t_all = rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    v_all = rows["value"].to_numpy(dtype="float64")
    closed: list[tuple[Any, ...]] = []
    for u, idx in rows.groupby("user_id", sort=False).indices.items():
        u = int(u)
        t_sub = t_all[idx]
        v_sub = v_all[idx]
        cur = st.get(u)
        # Segment the user's batch rows at > gap breaks (vectorised).
        seg_begin = np.concatenate(
            ([0], np.nonzero(np.diff(t_sub) > gap_us)[0] + 1)
        )
        seg_end = np.concatenate((seg_begin[1:], [len(t_sub)]))
        seg_sv = np.add.reduceat(v_sub, seg_begin)
        merge_first = cur is not None and t_sub[0] - cur[1] <= gap_us
        if cur is not None and not merge_first:
            closed.append(
                (u, pd.Timestamp(cur[0] * 1000), cur[2], round(cur[3], 2))
            )
            cur = None
        last_i = len(seg_begin) - 1
        for si in range(len(seg_begin)):
            n = int(seg_end[si] - seg_begin[si])
            sv = float(seg_sv[si])
            start = int(t_sub[seg_begin[si]])
            if si == 0 and merge_first:
                start = int(cur[0])
                n += int(cur[2])
                sv += float(cur[3])
            if si < last_i:
                closed.append((u, pd.Timestamp(start * 1000), n, round(sv, 2)))
            else:
                st[u] = [start, int(t_sub[-1]), n, sv]
    if st:
        items = sorted(st.items())
        state.update(
            (
                [u for u, _ in items],
                [int(s[0]) for _, s in items],
                [int(s[1]) for _, s in items],
                [int(s[2]) for _, s in items],
                [float(s[3]) for _, s in items],
            )
        )
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "n_events", "sum_value"]
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Stateful sessionizer over a streaming events DataFrame (grouped
    by user bucket; see module docstring for the scale shape)."""
    return (
        events.withColumn(
            "__b", F.pmod(F.col("user_id"), F.lit(SESSION_BUCKETS))
        )
        .groupBy("__b")
        .applyInPandasWithState(
            _sessionize_bucket,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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
