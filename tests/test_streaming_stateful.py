"""Stateful streaming dedup: state survives across micro-batches via
the checkpoint — re-sent content is never re-emitted."""

import time


def _run_available_now(stream_df, out_dir, ckpt):
    # parquet sink has no update mode; foreachBatch-append is the
    # standard pattern for stateful-update outputs
    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedup_state_across_batches(spark, tmp_path):
    from pydoxtools_spark.streaming.stateful import streaming_exact_dedup

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [("a", "hello world"), ("b", "hello world"), ("c", "unique one")]
    spark.createDataFrame(batch1, ["doc_id", "text"]).write.parquet(in_dir)

    def stream():
        src = spark.readStream.schema("doc_id string, text string").parquet(in_dir)
        return streaming_exact_dedup(src)

    _run_available_now(stream(), out_dir, ckpt)
    got1 = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    # first-seen only: 'a' (min of a/b within the batch) and 'c'
    assert set(got1) == {"a", "c"}

    # batch 2: duplicate of batch-1 content + one new doc
    batch2 = [("d", "hello world"), ("e", "brand new text")]
    spark.createDataFrame(batch2, ["doc_id", "text"]).write.mode(
        "append").parquet(in_dir)
    _run_available_now(stream(), out_dir, ckpt)
    got2 = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    # 'd' suppressed by state (content already seen); 'e' emitted
    assert set(got2) == {"a", "c", "e"}


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    """Event-time windows finalize once the watermark passes; a very
    late event (beyond the watermark) is dropped."""
    from pydoxtools_spark.streaming.stateful import windowed_event_counts

    in_dir = str(tmp_path / "ev_in")
    out_dir = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)

    rows1 = [(1, t0, "click", 1.0), (2, t0 + dt.timedelta(minutes=30), "click", 2.0),
             (3, t0 + dt.timedelta(hours=5), "view", 1.0)]  # advances watermark
    spark.createDataFrame(rows1, ["event_id", "ts", "event_type", "value"]) \
        .write.parquet(in_dir)

    def stream():
        src = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        ).parquet(in_dir)
        return windowed_event_counts(src, "1 hour", "2 hours")

    def sink(batch_df, _):
        batch_df.write.mode("append").parquet(out_dir)

    for _ in range(2):  # second run: no new data, flush finalized windows
        q = (stream().writeStream.foreachBatch(sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    got = {(str(r["window_start"]), r["event_type"]): r["n_events"]
           for r in spark.read.parquet(out_dir).collect()}
    # the 10:00 click window closed (watermark at 5h - 2h = 3h > 11:00)
    assert got.get(("2026-01-01 10:00:00", "click")) == 2

    # a VERY late event for the closed 10:00 window must be dropped
    late = [(9, t0 + dt.timedelta(minutes=10), "click", 9.0)]
    spark.createDataFrame(late, ["event_id", "ts", "event_type", "value"]) \
        .write.mode("append").parquet(in_dir)
    q = (stream().writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got2 = {(str(r["window_start"]), r["event_type"]): r["n_events"]
            for r in spark.read.parquet(out_dir).collect()}
    assert got2.get(("2026-01-01 10:00:00", "click")) == 2  # unchanged
