"""Event sessionization — batch (oracle-checkable) + stateful streaming.

A session is a maximal run of a user's events where consecutive events are
separated by <= gap_seconds. Two implementations with identical semantics:

- `sessionize_batch`: lag/cumulative-sum over a per-user window — the
  classic SQL formulation, so the DuckDB oracle runs the same plan
  (contract query `event_sessions`). The window partitions by user_id:
  parallel across users; a pathological single-user firehose would need
  pre-splitting by day before the window (noted, not needed for the
  driver's events table).
- `sessionize_stream`: Structured Streaming `applyInPandasWithState` —
  the custom-stateful-operator shape the mandate names. State per user is
  the open session (start, last, n, sum); closed sessions are emitted as
  soon as a later event proves the gap, and the open session is emitted
  when the event-time timeout (watermark passing last+gap) fires. Bounded
  state: one open session per active user.

Parity: tests replay a deterministic event log through the stream and
assert the emitted sessions equal `sessionize_batch` of the same log
(all sessions closed by a final far-future event).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double"
)
_STATE_SCHEMA = "start long, last long, n long, sv double"


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, session_start, session_end, n_events, sum_value) per
    session — gap-split via lag + running sum, all window ops partitioned
    by user_id (no global window)."""
    ev = events.select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    w = Window.partitionBy("user_id").orderBy("ts")
    new_sess = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long")).over(w)
        > gap_seconds
    )
    sid = F.sum(F.when(F.coalesce(new_sess, F.lit(False)), 1).otherwise(0)).over(w)
    return (
        ev.withColumn("sid", sid)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .drop("sid")
    )


def sessionize_oracle_sql(gap_seconds: int = 1800) -> str:
    """DuckDB equivalent of sessionize_batch over the `events` view."""
    return f"""
WITH ev AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   > {gap_seconds}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM ev
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*)::BIGINT AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def _emit_row(user_id: int, start: int, last: int, n: int, sv: float) -> dict:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start, unit="s"),
        "session_end": pd.Timestamp(last, unit="s"),
        "n_events": n,
        "sum_value": round(sv, 6),
    }


def sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization with applyInPandasWithState (append mode,
    event-time timeout). Emits each session exactly once: either when a
    later in-order event proves the gap, or when the watermark passes the
    open session's end + gap."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame([_emit_row(user_id, start, last, n, sv)])
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        ts = (rows["ts"].astype("int64") // 1_000_000_000).to_numpy()
        vals = rows["value"].to_numpy()
        out: list[dict] = []
        if state.exists:
            start, last, n, sv = state.get
        else:
            start, last, n, sv = 0, 0, 0, 0.0
        for t, v in zip(ts, vals):
            t = int(t)
            if n and t - last > gap_seconds:
                out.append(_emit_row(user_id, start, last, n, sv))
                start, last, n, sv = t, t, 1, float(v)
            else:
                if n == 0:
                    start = t
                last = max(last, t)
                n += 1
                sv += float(v)
        state.update((start, last, n, sv))
        # event-time timeout: fire once the watermark passes last + gap
        state.setTimeoutTimestamp((last + gap_seconds) * 1000)
        if out:
            yield pd.DataFrame(out)

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
