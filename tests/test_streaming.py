from __future__ import annotations

import os
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.streaming import ingest, stateful, windows

TS = "2024-03-01 {}:00"


def _write_batch(spark, path, rows, mtime):
    """Land ONE parquet file (not a directory — FileStreamSource does
    not recurse) with a controlled mtime so micro-batch order is
    deterministic."""
    import shutil
    from datetime import datetime

    rows = [
        (eid, datetime.fromisoformat(ts), uid, et, v) for eid, ts, uid, et, v in rows
    ]
    df = spark.createDataFrame(rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
    staging = tempfile.mkdtemp(prefix="stage_")
    out = os.path.join(staging, "out")
    df.coalesce(1).write.parquet(out)
    part = next(f for f in os.listdir(out) if f.endswith(".parquet"))
    dest = os.path.join(path, f"{uuid.uuid4().hex}.parquet")
    shutil.move(os.path.join(out, part), dest)
    os.utime(dest, (mtime, mtime))


def test_watermark_drops_late_rows_in_append_mode(spark):
    """Append mode + 30-min watermark, micro-batches driven one file at
    a time: a row arriving in batch 2 that is older than the watermark
    must be dropped, and only watermark-finalized windows are emitted."""
    landing = tempfile.mkdtemp(prefix="late_events_")
    t0 = time.time()
    _write_batch(
        spark,
        landing,
        [
            (1, TS.format("10:00"), 1, "click", 1.0),
            (2, TS.format("10:15"), 1, "click", 1.0),
            (3, TS.format("11:00"), 1, "click", 1.0),
        ],
        t0 - 100,
    )
    raw = spark.readStream.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    ).parquet(landing)
    result = windows.tumbling_event_counts(raw, "1 hour", watermark="30 minutes")
    name = f"wm_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_wm_")
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 → watermark becomes 10:30
        _write_batch(
            spark,
            landing,
            [
                (4, TS.format("09:10"), 1, "click", 1.0),  # late: < 10:30 watermark
                (5, TS.format("13:00"), 1, "click", 1.0),
            ],
            t0 - 50,
        )
        q.processAllAvailable()  # batch 2 → watermark becomes 12:30
        _write_batch(spark, landing, [(6, TS.format("15:00"), 1, "click", 1.0)], t0 - 10)
        q.processAllAvailable()  # batch 3 flushes windows ending ≤ 12:30
        got = {
            r["window_start"].strftime("%H:%M"): r["n_events"]
            for r in spark.table(name).collect()
        }
    finally:
        q.stop()
    # [10,11) finalized with 2 rows; [11,12) finalized with 1 row; the
    # late 09:10 row was dropped (no [09,10) window); [13,14) flushed
    # by the extra batch Spark runs when the watermark advances to
    # 14:30; [15,16) is not yet past the watermark, so not emitted.
    assert got == {"10:00": 2, "11:00": 1, "13:00": 1}


def test_stateful_counts_accumulate_across_microbatches(spark):
    """applyInPandasWithState keeps state across micro-batches: with
    one file per trigger, the second batch's emission includes the
    first batch's counts."""
    landing = tempfile.mkdtemp(prefix="stateful_events_")
    t0 = time.time()
    _write_batch(spark, landing, [(1, TS.format("10:00"), 7, "click", 1.5)], t0 - 100)
    _write_batch(spark, landing, [(2, TS.format("11:00"), 7, "click", 2.5)], t0 - 50)
    raw = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    result = stateful.running_user_counts(raw)
    name = f"st_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_st_")
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    # update mode emits once per batch; the LAST emission has the
    # accumulated totals
    final = max((r["n_events"], r["total_value_q"]) for r in rows)
    assert final == (2, 4_000_000)


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    batch = windows.tumbling_event_counts(tables.load(spark, "events", sf_dir))
    stream = ingest.run_to_memory(
        windows.tumbling_event_counts(ingest.read_event_stream(spark, sf_dir)),
        f"eq_{uuid.uuid4().hex[:8]}",
    )
    b = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"]) for r in batch.collect()}
    s = {(r["window_start"], r["event_type"]): (r["n_events"], r["total_value"]) for r in stream.collect()}
    assert b == s


def test_session_windows_merge_within_gap(spark):
    rows = [
        (1, TS.format("10:00"), 1, "click", 1.0),
        (2, TS.format("10:20"), 1, "click", 1.0),  # within 30min gap → same session
        (3, TS.format("12:00"), 1, "click", 1.0),  # new session
        (4, TS.format("10:05"), 2, "click", 1.0),
    ]
    from datetime import datetime

    rows = [(eid, datetime.fromisoformat(ts), uid, et, v) for eid, ts, uid, et, v in rows]
    events = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    )
    out = windows.session_event_stats(events, "30 minutes").orderBy("user_id", "session_start")
    got = [(r["user_id"], r["session_start"].strftime("%H:%M"), r["n_events"]) for r in out.collect()]
    assert got == [(1, "10:00", 2), (1, "12:00", 1), (2, "10:05", 1)]


def test_streaming_dedup_within_watermark(spark):
    """Streaming exact-dedup: a row re-arriving in a later micro-batch
    (within the watermark) is dropped by dropDuplicatesWithinWatermark
    — the streaming form of the pipeline's exact dedup operator."""
    landing = tempfile.mkdtemp(prefix="dedup_events_")
    t0 = time.time()
    _write_batch(spark, landing, [
        (1, TS.format("10:00"), 1, "click", 1.0),
        (2, TS.format("10:05"), 1, "click", 1.0),
    ], t0 - 100)
    _write_batch(spark, landing, [
        (1, TS.format("10:00"), 1, "click", 1.0),  # duplicate of event 1
        (3, TS.format("10:10"), 1, "click", 1.0),
    ], t0 - 50)
    raw = (
        spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
        )
        .parquet(landing)
    )
    result = raw.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    name = f"dd_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_dd_")
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = sorted(r["event_id"] for r in spark.table(name).collect())
    assert ids == [1, 2, 3]


def test_foreachbatch_idempotent_parquet_sink(spark):
    """Streaming → foreachBatch → idempotent parquet append (the
    incremental_append ingest operator as a streaming sink): replaying
    the same data into a fresh stream does not duplicate rows."""
    from multi_search_retrival_big_data_spark.ingest.pipeline import incremental_append

    landing = tempfile.mkdtemp(prefix="fb_events_")
    sink = os.path.join(tempfile.mkdtemp(prefix="fb_sink_"), "events")
    t0 = time.time()
    _write_batch(spark, landing, [(1, TS.format("10:00"), 1, "click", 1.0),
                                  (2, TS.format("10:05"), 1, "click", 1.0)], t0 - 100)

    def run_stream():
        raw = spark.readStream.schema(
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
        ).parquet(landing)
        ckpt = tempfile.mkdtemp(prefix="ckpt_fb_")
        q = (
            raw.writeStream.foreachBatch(
                lambda df, _bid: incremental_append(spark, df, sink, ["event_id"])
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_stream()
    assert spark.read.parquet(sink).count() == 2
    # fresh stream (new checkpoint) replays the same file → no dupes
    run_stream()
    assert spark.read.parquet(sink).count() == 2


def test_stream_upsert_latest_matches_batch_even_with_triplicate_delivery(spark, sf_dir):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from multi_search_retrival_big_data_spark import tables

    out = ingest.run_stream_upsert_latest(spark, sf_dir, copies=3)
    got = {r["user_id"]: (r["event_id"], r["value"]) for r in out.collect()}
    ev = tables.load(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    expected = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == expected


def test_stream_curation_ingest_absorbs_triplicate_delivery(spark, sf_dir):
    from multi_search_retrival_big_data_spark.operators import curation, dedup
    from multi_search_retrival_big_data_spark.operators import textanalysis as ta
    from multi_search_retrival_big_data_spark.queries.curation_queries import (
        _aug_spark,
    )

    qmin = 0.5
    out3 = ingest.run_stream_curation_ingest(
        spark, sf_dir, lambda df: _aug_spark(), qmin, copies=3
    )
    got = {r["content_hash"]: r["doc_id"] for r in out3.collect()}
    # batch recompute of the same pipeline over the clean feed
    docs = tables.load(spark, "documents", sf_dir)
    red = docs.select(
        "doc_id", curation.redact_pii(_aug_spark()).alias("__red")
    )
    scored = ta.quality_features(red, "doc_id", "__red", keep_cols=("__red",))
    ok = scored.filter(F.col("quality") >= qmin).select(
        "doc_id", dedup.content_hash(F.col("__red")).alias("content_hash")
    )
    expected = {
        r["content_hash"]: r["doc_id"]
        for r in ok.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    assert got == expected
    # the gate actually drops something and dedup actually merges
    assert 0 < len(got) < docs.count()
