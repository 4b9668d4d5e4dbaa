"""Keyed-state streaming operators via applyInPandasWithState.

The reference's three keyed-state operators (SURVEY §2.6), re-expressed on
Spark's stateful API:

- T1 new-vs-returning fix (BaseLogApp.java:69-102): ValueState<seen> per mid.
- T2 daily-first-visit UV dedup (UniqueVisitApp.java:53-102): ValueState
  <last date> with 24h TTL per mid.
- T3 CEP bounce detection (UserJumpDetailApp.java:81-120): Flink CEP pattern
  (two consecutive session starts / 10s timeout) → here a pending-start
  ValueState plus an event-time timer; match and timeout both emit, the
  union the reference builds explicitly (:120) falls out of one processor.

Implementation notes:
- Every pandas function is fully self-contained (imports inside, no module
  globals) — Spark pickles them to Python workers that don't have this
  package importable.
- State is scoped per key and dropped via timeouts, so state size is
  O(active keys) regardless of stream length — the same bound the
  reference gets from StateTtlConfig (UniqueVisitApp.java:66-73).
- Rows inside a micro-batch are processed in (ts, id) order inside the
  processor, making results independent of shuffle order; across batches
  ordering is guaranteed by the event-time watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

NEW_USER_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("is_new", IntegerType()),
    ]
)

UV_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("visit_day", TimestampType()),
        StructField("first_ts", TimestampType()),
    ]
)


def new_user_fix_stream(events: DataFrame) -> DataFrame:
    """T1: emit every event with is_new=1 only on the key's first-ever event."""

    def fix(key, pdfs, state):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        flags = []
        for _ in range(len(rows)):
            flags.append(0 if seen else 1)
            seen = 1
        state.update((1,))
        yield pd.DataFrame(
            {"event_id": rows["event_id"].values, "user_id": rows["user_id"].values, "is_new": flags}
        )

    return events.select("event_id", "user_id", "ts").groupBy("user_id").applyInPandasWithState(
        fix,
        outputStructType=NEW_USER_OUT_SCHEMA,
        stateStructType=StructType([StructField("seen", IntegerType())]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def uv_dedup_stream(events: DataFrame) -> DataFrame:
    """T2: first visit per (user, day); state = last seen epoch-day (the
    24h-TTL ValueState of the reference, here expired by watermark progress)."""

    def dedup(key, pdfs, state):
        import pandas as pd

        seen_days = set(state.get[0]) if state.exists and state.get[0] is not None else set()
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        days = rows["ts"].dt.floor("D")
        out = []
        for day, grp in rows.groupby(days):
            epoch_day = int(day.timestamp()) // 86400
            if epoch_day in seen_days:
                continue
            seen_days.add(epoch_day)
            first = grp.iloc[0]
            out.append((key[0], day, first["ts"]))
        state.update((list(seen_days),))
        yield pd.DataFrame(out, columns=["user_id", "visit_day", "first_ts"])

    from pyspark.sql.types import ArrayType

    return events.select("event_id", "user_id", "ts").groupBy("user_id").applyInPandasWithState(
        dedup,
        outputStructType=UV_OUT_SCHEMA,
        stateStructType=StructType([StructField("days", ArrayType(LongType()))]),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bounce_stream(
    events: DataFrame, gap_s: int, timeout_s: int
) -> DataFrame:
    """T3 bounce CEP: emit session-start events with no follow-up within
    timeout_s. Match path (a later event arrives with a big gap) and
    timeout path (event-time timer fires) both emit — the reference unions
    these two CEP outputs (UserJumpDetailApp.java:103-120).

    Requires a watermark on `ts` (for the event-time timer), and
    timeout_s <= gap_s (same reduction-validity constraint as
    operators/stateful_batch.bounce_events — a follow-up inside the timeout
    must not itself be a session start)."""
    if timeout_s > gap_s:
        raise ValueError(
            f"bounce timeout_s ({timeout_s}) must be <= session gap_s ({gap_s})"
        )

    def detect(key, pdfs, state, _gap=gap_s, _timeout=timeout_s):
        import pandas as pd

        prev_us, pending, pending_id = state.get if state.exists else (None, 0, None)
        out = []

        if state.hasTimedOut:
            # timer fired: the pending start had no follow-up within timeout
            if pending and pending_id is not None:
                out.append((pending_id, key[0], pd.Timestamp(prev_us, unit="us")))
            state.update((prev_us, 0, None))  # keep prev_us for future gap calc
            yield pd.DataFrame(out, columns=["event_id", "user_id", "ts"])
            return

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        for r in rows.itertuples(index=False):
            ts_us = r.ts.value // 1000  # pandas ns -> us
            if pending:
                if ts_us - prev_us > _timeout * 1_000_000:
                    out.append((pending_id, key[0], pd.Timestamp(prev_us, unit="us")))
                pending, pending_id = 0, None
            is_start = prev_us is None or ts_us - prev_us > _gap * 1_000_000
            if is_start:
                pending, pending_id = 1, int(r.event_id)
            prev_us = ts_us
        state.update((prev_us, pending, pending_id))
        if pending:
            # event-time timer; must stay above the current watermark
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(prev_us // 1000 + _timeout * 1000, wm + 1))
        yield pd.DataFrame(out, columns=["event_id", "user_id", "ts"])

    return events.select("event_id", "user_id", "ts").groupBy("user_id").applyInPandasWithState(
        detect,
        outputStructType=EVENT_OUT_SCHEMA,
        stateStructType=StructType(
            [
                StructField("prev_us", LongType()),
                StructField("pending", IntegerType()),
                StructField("pending_id", LongType()),
            ]
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
