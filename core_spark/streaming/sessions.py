"""Stateful sessionization — the custom-stateful-operator seam (SURVEY §2.10).

Two implementations with identical session semantics (gap-based: a session
ends when the next event of the same user arrives more than ``gap`` after
the previous one):

  sessionize_batch   pure window composition — lag -> gap flag -> running
                     sum = session id -> groupBy. Fully SQL-expressible
                     (DuckDB oracle in __spark_entry__), and the exact
                     batch analog the streaming variant is tested against.

  sessionize_stream  ``applyInPandasWithState`` (GroupState + event-time
                     timeout): per-user state {start, last, n, total};
                     a closed session is emitted when a later event exceeds
                     the gap, and open sessions flush on event-time timeout
                     once the watermark passes. This is THE pattern for
                     operators Spark's built-ins can't express (reference
                     analog: the pluggable strategy seam, SURVEY §2.10).

Scale: state is per-user O(1); the shuffle key is user_id (uniform unless a
bot user dominates — the G8 salting note applies if so).
"""

from __future__ import annotations

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)


def sessionize_batch(df, gap_minutes: int = 30, user_col: str = "user_id",
                     ts_col: str = "ts", value_col: str = "value"):
    """Window-based sessionization (deterministic: ties broken by event_id)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    # exact microsecond arithmetic (unix_timestamp truncates to whole seconds,
    # which can split a 1800.5s gap differently from the fractional oracle);
    # timestampdiff handles TIMESTAMP_NTZ, unix_micros does not
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = F.when(
        F.col("_prev").isNull()
        | (F.expr(f"timestampdiff(MICROSECOND, _prev, {ts_col})") > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_prev", F.lag(F.col(ts_col)).over(w))
        .withColumn("_sess", sess_id)
        .groupBy(user_col, "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .drop("_sess")
    )


def sql_sessionize(events_table: str, gap_minutes: int = 30) -> str:
    """DuckDB oracle: same window composition in ANSI SQL (microseconds)."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events, SUM(value) AS total_value
FROM (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess
  FROM (
    SELECT *, CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > {gap_us}
              THEN 1 ELSE 0 END AS new_sess
    FROM (
      SELECT user_id, ts, event_id, value,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM {events_table}
    )
  )
) GROUP BY user_id, sess
"""


def sessionize_stream(stream, gap_minutes: int = 30, watermark: str = "10 minutes"):
    """applyInPandasWithState sessionization over a streaming events source.

    Emits a session row when (a) a later event of the same user exceeds the
    gap, or (b) the event-time timeout fires (watermark passed last+gap).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        out = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0
        for r in rows.itertuples():
            ts_us = int(r.ts.value // 1000)  # ns -> us
            if last is not None and (ts_us - last) > gap_s * 1_000_000:
                out.append((user_id, start, last, n, total))
                start, last, n, total = ts_us, ts_us, 1, float(r.value)
            else:
                if start is None:
                    start = ts_us
                last = ts_us
                n += 1
                total += float(r.value)
        state.update((start, last, n, total))
        state.setTimeoutTimestamp(last // 1000 + gap_s * 1000)  # ms
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                    "total_value": [o[4] for o in out],
                }
            )

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start bigint, last bigint, n bigint, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
