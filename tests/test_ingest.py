from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.ingest import pipeline


@pytest.fixture(scope="module")
def out(spark):
    d = tempfile.mkdtemp(prefix="ingest_")
    return pipeline.run(spark, d, collections=2, videos_per=2), spark


def test_shot_detection_covers_all_frames(spark):
    videos = pipeline.synth_videos(spark, 1, 1, frames_per_video=250)
    shots = pipeline.detect_shots(videos).orderBy("shot").collect()
    assert shots[0]["start_frame"] == 0
    assert shots[-1]["end_frame"] == 249
    for a, b in zip(shots, shots[1:]):
        assert b["start_frame"] == a["end_frame"] + 1


def test_global_ids_dense_and_ordered(out):
    paths, spark = out
    kf = spark.read.parquet(paths["keyframes"])
    rows = kf.orderBy("keyframe_id").collect()
    ids = [r["keyframe_id"] for r in rows]
    assert ids == list(range(len(rows)))  # dense 0..N-1
    keys = [(r["collection"], r["video"], r["frame_idx"]) for r in rows]
    assert keys == sorted(keys)  # enumeration order = (collection, video, frame)


def test_keyframes_assigned_to_containing_shot(out):
    paths, spark = out
    kf = spark.read.parquet(paths["keyframes"])
    sh = spark.read.parquet(paths["shots"])
    joined = kf.join(sh, ["collection", "video", "shot"])
    bad = joined.filter(
        (F.col("frame_idx") < F.col("start_frame"))
        | (F.col("frame_idx") > F.col("end_frame"))
    ).count()
    assert bad == 0


def test_bridges_respect_video_boundaries(out):
    paths, spark = out
    a2i = spark.read.parquet(paths["audio2img"])
    kf = spark.read.parquet(paths["keyframes"]).select(
        "keyframe_id", F.col("video").alias("kf_video"), F.col("collection").alias("kf_coll")
    )
    joined = a2i.join(kf, "keyframe_id")
    assert joined.filter(
        (F.col("video") != F.col("kf_video")) | (F.col("collection") != F.col("kf_coll"))
    ).count() == 0


def test_img2audio_two_nearest_per_keyframe_shot(out):
    paths, spark = out
    i2a = spark.read.parquet(paths["img2audio"])
    per_kf = i2a.groupBy("keyframe_id").count().agg(F.max("count")).first()[0]
    assert per_kf <= 2


def test_embeddings_normalized(out):
    paths, spark = out
    emb = spark.read.parquet(paths["embeddings"])
    from multi_search_retrival_big_data_spark.functions.vector import l2_norm

    norms = emb.select(l2_norm("embedding").alias("n")).collect()
    for r in norms:
        assert abs(r["n"] - 1.0) < 1e-9


def test_partitioned_by_collection(out):
    paths, _ = out
    import os

    subdirs = os.listdir(paths["keyframes"])
    assert any(s.startswith("collection=") for s in subdirs)


def test_incremental_append_is_idempotent(spark):
    import tempfile, os

    sink = os.path.join(tempfile.mkdtemp(prefix="inc_"), "sink")
    batch1 = spark.createDataFrame([(1, "a"), (2, "b")], "id BIGINT, v STRING")
    assert pipeline.incremental_append(spark, batch1, sink, ["id"]) == 2
    # same batch again: no-op
    assert pipeline.incremental_append(spark, batch1, sink, ["id"]) == 0
    # overlapping batch: only the novel row lands
    batch2 = spark.createDataFrame([(2, "b"), (3, "c")], "id BIGINT, v STRING")
    assert pipeline.incremental_append(spark, batch2, sink, ["id"]) == 1
    assert spark.read.parquet(sink).count() == 3


def test_collection_filter_prunes_partitions(out):
    """Reading one collection from the partitioned sink must prune the
    other collection's files at plan level (PartitionFilters)."""
    paths, spark = out
    from pyspark.sql import functions as F

    df = spark.read.parquet(paths["keyframes"]).filter(F.col("collection") == "L01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "L01" in plan
    assert df.select("collection").distinct().count() == 1


def test_stream_semantic_ingest_equals_batch_probe(spark, sf_dir):
    """Double-delivered embedding feed converges to the batch delta
    probe (order-independence + replay guard)."""
    from multi_search_retrival_big_data_spark import index_store, tables
    from multi_search_retrival_big_data_spark.operators import dedup
    from multi_search_retrival_big_data_spark.queries.pipeline_queries import (
        SEMANTIC_DUP_THRESHOLD,
        _SEM_ITERS,
    )
    from multi_search_retrival_big_data_spark.streaming import ingest

    streamed = ingest.run_stream_semantic_ingest(
        spark, sf_dir, SEMANTIC_DUP_THRESHOLD, copies=2
    )
    base_f, (d1, d2) = index_store.incremental_split_filters(spark, sf_dir)
    delta_f = f"({d1}) OR ({d2})"
    assign = index_store.ivf_assignments_incremental(spark, sf_dir, base_f, delta_f)
    emb = tables.load(spark, "embeddings", sf_dir)
    batch = dedup.semantic_delta_candidate_pairs(
        assign, emb.filter(delta_f).select("vec_id"), SEMANTIC_DUP_THRESHOLD
    )
    s = {(r.id_a, r.id_b, r.cosine) for r in streamed.collect()}
    b = {(r.id_a, r.id_b, r.cosine) for r in batch.collect()}
    assert s == b and len(s) > 0
