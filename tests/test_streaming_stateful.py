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


def test_streaming_sessionize_state_across_batches(spark, tmp_path):
    """Open sessions survive in state across micro-batches; an arriving
    event beyond the gap closes and emits the previous session with the
    same per-user ordinal the batch operator would assign."""
    import datetime as dt

    from pydoxtools_spark.streaming.stateful import streaming_sessionize

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = ("event_id long, ts timestamp_ntz, user_id long, "
              "value double")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    batch1 = [(1, t0, 10, 1.0), (2, t0 + dt.timedelta(minutes=5), 10, 2.0)]
    spark.createDataFrame(batch1, schema).write.parquet(in_dir)

    def stream():
        src = spark.readStream.schema(schema).parquet(in_dir)
        return streaming_sessionize(src, gap_minutes=30)

    _run_available_now(stream(), out_dir, ckpt)
    # session still open -> nothing emitted yet
    assert spark.read.parquet(out_dir).count() == 0

    batch2 = [(3, t0 + dt.timedelta(hours=2), 10, 4.0),
              (4, t0, 20, 9.0)]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(in_dir)
    _run_available_now(stream(), out_dir, ckpt)
    got = {(r["user_id"], r["session_idx"]): r
           for r in spark.read.parquet(out_dir).collect()}
    # user 10's first session closed by the 2h-later event
    assert set(got) == {(10, 1)}
    r = got[(10, 1)]
    assert r["n_events"] == 2 and r["sum_value"] == 3.0
    assert r["session_start"] == t0
    assert r["session_end"] == t0 + dt.timedelta(minutes=5)

    batch3 = [(5, t0 + dt.timedelta(hours=5), 10, 7.0),
              (6, t0 + dt.timedelta(hours=5), 20, 8.0)]
    spark.createDataFrame(batch3, schema).write.mode("append").parquet(in_dir)
    _run_available_now(stream(), out_dir, ckpt)
    got = {(r["user_id"], r["session_idx"]) for r in
           spark.read.parquet(out_dir).collect()}
    # user 10's SECOND session (the 2h event) now closed too; user 20's
    # first session closed by its 5h event
    assert got == {(10, 1), (10, 2), (20, 1)}
