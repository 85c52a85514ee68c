"""Custom stateful streaming operator: exactly-once streaming
deduplication with applyInPandasWithState.

The reference has no streaming (SURVEY.md §2.10); this extends the
engine for incremental corpora: as new documents arrive, emit only the
first occurrence of each content fingerprint.  State = one seen-flag
per content hash, partitioned by the hash — the streaming twin of
operators/dedup.exact_dedup.

Scale: state is keyed by md5 hash (uniform, no skew); each micro-batch
shuffles only (hash, doc_id); state store size = number of distinct
documents (RocksDB state store on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT = StructType(
    [
        StructField("content_hash", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("dup_count_so_far", LongType(), False),
    ]
)

STATE = StructType(
    [
        StructField("first_doc_id", StringType(), True),
        StructField("count", LongType(), True),
    ]
)


def _dedup_fn(key, batches, state: GroupState):
    """Emit the group's first-ever doc; update the running dup count."""
    import pandas as pd

    (content_hash,) = key
    first_doc, count = (state.get if state.exists else (None, 0))
    rows = []
    for pdf in batches:
        for doc_id in sorted(pdf["doc_id"]):
            count += 1
            if first_doc is None:
                first_doc = doc_id
                rows.append((content_hash, doc_id, count))
    state.update((first_doc, count))
    yield pd.DataFrame(rows, columns=["content_hash", "doc_id", "dup_count_so_far"])


def streaming_exact_dedup(doc_stream: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """Streaming DataFrame (doc_id, text) -> first-seen docs per content
    hash.  Use with writeStream(outputMode='update') + checkpoint."""
    hashed = doc_stream.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")).alias(
            "content_hash"),
    )
    return hashed.groupBy("content_hash").applyInPandasWithState(
        _dedup_fn, OUTPUT, STATE, "update", GroupStateTimeout.NoTimeout
    )


def windowed_event_counts(event_stream: DataFrame,
                          window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window rollup with a watermark for late
    data: events arriving more than `watermark` behind the max seen
    event time are dropped and their windows finalized — the standard
    Structured Streaming pattern for the events table's batch rollup
    (q_events_rollup).  Use outputMode('append') after the watermark
    closes windows."""
    return (
        event_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )


def streaming_sessionize(event_stream: DataFrame,
                         gap_minutes: int = 30) -> DataFrame:
    """Streaming twin of operators/events.sessionize: per-user session
    state in applyInPandasWithState; an arriving event whose gap to the
    open session exceeds `gap_minutes` CLOSES that session (emitted
    downstream) and opens a new one.  Deterministic: sessions close on
    EVENT time carried by the data itself, so AvailableNow replays give
    identical output; the residual open session per user stays in
    state.  (Production streams additionally arm an event-time timeout
    + watermark so idle users' last sessions flush without a closing
    event; the cut logic is identical.)

    Input: streaming (event_id, ts, user_id, value).  Output rows are
    COMPLETED sessions: (user_id, session_idx, session_start,
    session_end, n_events, sum_value) — session_idx is the same
    per-user ordinal the batch operator assigns.

    Scale: state is one open-session tuple per user (five scalars —
    tiny even at 10^9 users with RocksDB); each micro-batch shuffles
    only that user's new events.
    """
    import pandas as pd  # noqa: F401  (kernel dependency, import-checked)

    from pyspark.sql.types import DoubleType, TimestampNTZType

    out_schema = StructType([
        StructField("user_id", LongType(), False),
        StructField("session_idx", LongType(), False),
        StructField("session_start", TimestampNTZType(), False),
        StructField("session_end", TimestampNTZType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), False),
    ])
    state_schema = StructType([
        StructField("session_idx", LongType(), True),
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        StructField("n", LongType(), True),
        StructField("sumv", DoubleType(), True),
    ])
    gap_us = gap_minutes * 60_000_000

    def _session_fn(key, batches, state: GroupState):
        import pandas as pd

        (user_id,) = key
        idx, start_us, last_us, n, sumv = (
            state.get if state.exists else (0, None, None, 0, 0.0))
        ev = pd.concat(list(batches), ignore_index=True)
        ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
        done = []
        for ts, val in zip(ev["ts"], ev["value"]):
            ts_us = pd.Timestamp(ts).value // 1000
            if start_us is None:
                idx, start_us, last_us, n, sumv = (
                    idx + 1, ts_us, ts_us, 1, float(val))
            elif ts_us - last_us > gap_us:
                done.append((user_id, idx,
                             pd.Timestamp(start_us * 1000),
                             pd.Timestamp(last_us * 1000), n, sumv))
                idx, start_us, last_us, n, sumv = (
                    idx + 1, ts_us, ts_us, 1, float(val))
            else:
                last_us, n, sumv = ts_us, n + 1, sumv + float(val)
        state.update((idx, start_us, last_us, n, sumv))
        yield pd.DataFrame(
            done, columns=["user_id", "session_idx", "session_start",
                           "session_end", "n_events", "sum_value"])

    return event_stream.select(
        "event_id", "ts", F.col("user_id").cast("long").alias("user_id"),
        "value",
    ).groupBy("user_id").applyInPandasWithState(
        _session_fn, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout,
    )
