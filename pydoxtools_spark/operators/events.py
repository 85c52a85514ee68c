"""Event-stream batch operators: gap-timeout sessionization.

Beyond the reference's surface (it has no event analytics; the engine
ships the events table ops — hourly rollups in the driver contract,
watermarked streaming windows in streaming/stateful.py — because a
100 TB ingestion pipeline always grows an activity log next to the
corpus).  Pure Spark SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-timeout sessionization: per user, events ordered by time
    (deterministic tie-break on `tiebreak_col`) start a NEW session
    whenever the gap to the previous event exceeds `gap_minutes`.
    Returns one row per session: (user_col, session_idx, session_start,
    session_end, n_events, sum_value).

    The classic lag -> boundary-flag -> running-sum shape (the same
    cumsum pattern as the dedup interval merge): two window passes and
    one aggregate, all keyed on the user — a single shuffle.  Gap
    arithmetic is integer microseconds via timestamp_diff, which works
    on timezone-naive (NTZ) timestamps without any session-timezone
    involvement — boundaries are bit-identical across engines
    (unix_micros would both reject NTZ and drag the session tz in).

    Scale: per-user window sort; users are many and sessions short, so
    skew is bounded by the busiest single user — a monitoring bot with
    millions of events becomes one long task (pre-split such users by
    day first if the log has them).  The streaming twin of this op is
    applyInPandasWithState with a session timeout (streaming/
    stateful.py pattern).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    gap_us = gap_minutes * 60_000_000
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
    brk = F.when(
        prev.isNull() | (gap > F.lit(gap_us)), 1
    ).otherwise(0)
    sess = (
        events.withColumn("_brk", brk)
        .withColumn("session_idx", F.sum("_brk").over(run))
    )
    return (
        sess.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
    )
