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
  the BUFFER of not-yet-finalized events (ts + value arrays); a session is
  emitted only once the watermark has passed its end + gap, at which point
  no admissible event (all future rows have ts >= watermark, late rows
  below it are dropped by Spark) can extend it, land inside it, or sort
  before it. This makes emission correct for ANY arrival order the
  watermark admits — including events that arrive out of order across
  micro-batches — not just in-order replay. State is bounded by the
  watermark horizon: finalized sessions leave the buffer every batch, so a
  user retains only events within roughly (watermark_delay + gap) of the
  stream head.

Parity: tests replay a deterministic event log through the stream and
assert the emitted sessions equal `sessionize_batch` of the same log
(all sessions closed by a final far-future event); an out-of-order replay
(late cross-batch events within the watermark) asserts the same.
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
_STATE_SCHEMA = "ets array<long>, evs array<double>"


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
    event-time timeout). Each batch merges new events into the per-user
    buffer, gap-splits the sorted buffer, and emits exactly the prefix of
    sessions whose end + gap the watermark has already passed — those are
    immutable under any further admissible arrival. The remaining events
    stay buffered; an event-time timeout at (max_ts + gap) guarantees the
    tail session is finalized once the watermark passes it even if the
    user never sends another event."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        ets: list[int] = []
        evs: list[float] = []
        if state.exists:
            old_ts, old_vs = state.get
            ets.extend(int(t) for t in old_ts)
            evs.extend(float(v) for v in old_vs)
        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            if len(rows):
                ets.extend(
                    int(t) for t in rows["ts"].astype("int64") // 1_000_000_000
                )
                evs.extend(float(v) for v in rows["value"])
        if not ets:
            if state.exists:
                state.remove()
            return
        order = sorted(range(len(ets)), key=ets.__getitem__)
        ts = [ets[i] for i in order]
        vals = [evs[i] for i in order]
        # gap-split the full buffer, then finalize the prefix of sessions
        # already sealed by the watermark (compare in ms to match Spark's
        # watermark precision exactly).
        wm_ms = state.getCurrentWatermarkMs()
        bounds = [0]
        bounds += [i for i in range(1, len(ts)) if ts[i] - ts[i - 1] > gap_seconds]
        bounds.append(len(ts))
        out: list[dict] = []
        keep_from = 0
        for a, b in zip(bounds, bounds[1:]):
            last = ts[b - 1]
            if (last + gap_seconds) * 1000 < wm_ms:
                out.append(
                    _emit_row(user_id, ts[a], last, b - a, sum(vals[a:b]))
                )
                keep_from = b
            else:
                break
        ts, vals = ts[keep_from:], vals[keep_from:]
        if ts:
            state.update((ts, vals))
            # wake when the watermark passes the tail session's close
            state.setTimeoutTimestamp((ts[-1] + gap_seconds) * 1000 + 1)
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
