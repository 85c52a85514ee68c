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
