"""Bridge operators: bucketed interval join == naive range join, etc."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.operators import bridges


def _intervals(spark, sf_dir, etype, prefix):
    ev = tables.load(spark, "events", sf_dir)
    dur = F.expr("INTERVAL 10 MINUTES")
    return ev.filter(F.col("event_type") == etype).select(
        F.col("event_id").alias(f"{prefix}_id"),
        "user_id",
        F.col("ts").alias(f"{prefix}s"),
        (F.col("ts") + dur).alias(f"{prefix}e"),
    )


def test_bucketed_interval_join_equals_naive(spark, sf_dir):
    left = _intervals(spark, sf_dir, "click", "c")
    right = _intervals(spark, sf_dir, "purchase", "p")
    naive = bridges.interval_join(
        left, right, "cs", "ce", "ps", "pe", keys=["user_id"], bucket_seconds=None
    )
    bucketed = bridges.interval_join(
        left, right, "cs", "ce", "ps", "pe", keys=["user_id"], bucket_seconds=600
    )
    n = {(r.c_id, r.p_id) for r in naive.select("c_id", "p_id").collect()}
    b = [(r.c_id, r.p_id) for r in bucketed.select("c_id", "p_id").collect()]
    assert set(b) == n
    assert len(b) == len(n)  # anchor-bucket dedup: no duplicate pairs


def test_bucketed_join_with_small_buckets(spark, sf_dir):
    """Bucket smaller than the interval → intervals span many buckets;
    pair set must still be exact and duplicate-free."""
    left = _intervals(spark, sf_dir, "view", "c")
    right = _intervals(spark, sf_dir, "error", "p")
    naive = bridges.interval_join(left, right, "cs", "ce", "ps", "pe", keys=["user_id"])
    bucketed = bridges.interval_join(
        left, right, "cs", "ce", "ps", "pe", keys=["user_id"], bucket_seconds=97
    )
    n = {(r.c_id, r.p_id) for r in naive.select("c_id", "p_id").collect()}
    b = [(r.c_id, r.p_id) for r in bucketed.select("c_id", "p_id").collect()]
    assert set(b) == n and len(b) == len(n)


def test_nearest_neighbors_join_top2(spark, sf_dir):
    ev = tables.load(spark, "events", sf_dir)
    purchases = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("pid"), "user_id", F.unix_micros("ts").alias("pts")
    )
    clicks = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("cid"), "user_id", F.unix_micros("ts").alias("cts")
    )
    out = bridges.nearest_neighbors_join(
        purchases, clicks, "pts", "cts", n=2, keys=["user_id"], l_id="pid", r_id="cid",
        rank_col="rn",
    ).collect()
    per_left = {}
    for r in out:
        per_left.setdefault(r.pid, []).append(r)
    assert all(len(v) <= 2 for v in per_left.values())
    # rank 1 is at least as near as rank 2
    for v in per_left.values():
        if len(v) == 2:
            d = {r.rn: abs(r.pts - r.cts) for r in v}
            assert d[1] <= d[2]


def test_propagate_scores_sums_many_to_many(spark):
    scores = spark.createDataFrame([(1, 2.0), (2, 3.0)], "seg BIGINT, score DOUBLE")
    bridge = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 11)], "seg BIGINT, kf BIGINT"
    )
    got = {
        r.kf: r.score
        for r in bridges.propagate_scores(scores, bridge, "seg", "kf").collect()
    }
    assert got == {10: 2.0, 11: 5.0}
