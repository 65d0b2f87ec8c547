"""Deterministic Lloyd trainer (operators/kmeans.py) — structure,
hand-checked means, empty-cluster rule, and PQ book shapes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.operators import kmeans


@pytest.fixture(scope="module")
def vecs(spark):
    # two tight groups on a line: {0,1} near x=0, {2,3} near x=10
    rows = [
        (0, [0.0, 0.0]),
        (1, [2.0, 0.0]),
        (2, [10.0, 0.0]),
        (3, [12.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")


def test_stride_init_sorted_sample(vecs):
    init = kmeans.stride_init(vecs, stride=2)
    assert [cid for cid, _ in init] == [0, 2]
    assert init[0][1] == [0.0, 0.0] and init[1][1] == [10.0, 0.0]


def test_train_lloyd_hand_checked_means(vecs):
    # seed at x=0 and x=10 → assignment {0,1} vs {2,3} → means x=1, x=11
    cents = kmeans.train_lloyd(vecs, kmeans.stride_init(vecs, stride=2), iters=1)
    got = {cid: cv for cid, cv in cents}
    assert got[0] == [1.0, 0.0]
    assert got[2] == [11.0, 0.0]
    # second iteration is a fixed point for this data
    cents2 = kmeans.train_lloyd(vecs, kmeans.stride_init(vecs, stride=2), iters=2)
    assert {cid: cv for cid, cv in cents2} == got


def test_train_lloyd_empty_cluster_keeps_centroid(spark):
    rows = [(0, [0.0]), (1, [0.2])]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    # second centroid far away never wins a point → must survive unchanged
    init = [(0, [0.0]), (99, [100.0])]
    cents = kmeans.train_lloyd(df, init, iters=2)
    got = {cid: cv for cid, cv in cents}
    assert got[99] == [100.0]
    assert got[0] == [0.1]


def test_assign_cid_tiebreak_lowest_cid(spark):
    df = spark.createDataFrame([(7, [5.0])], "vec_id INT, embedding ARRAY<DOUBLE>")
    # equidistant centroids → lowest cid wins (matches ORDER BY d, cid)
    cents = [(3, [4.0]), (1, [6.0])]
    out = df.select(kmeans.assign_cid("embedding", cents).alias("cid")).collect()
    assert out[0]["cid"] == 1


def test_train_lloyd_pq_shapes_and_mse(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    init = kmeans.pq_stride_init(df, dim=8, m=2, ks=4, stride=3)
    assert set(init) == {0, 1}
    assert all(len(book) == 4 for book in init.values())
    assert all(len(cv) == 4 for book in init.values() for _, cv in book)
    trained = kmeans.train_lloyd_pq(df, init, dim=8, iters=2)
    assert set(trained) == {0, 1}
    assert all(len(book) == 4 for book in trained.values())

    def mse(books):
        data = {r["vec_id"]: r["embedding"] for r in df.collect()}
        tot = 0.0
        for v in data.values():
            for m in range(2):
                sub = v[m * 4 : (m + 1) * 4]
                best = min(
                    sum((a - b) ** 2 for a, b in zip(sub, cv)) for _, cv in books[m]
                )
                tot += best
        return tot

    # Lloyd never increases quantization error
    assert mse(trained) <= mse(init) + 1e-9


def test_quantized_mean_is_order_independent(spark):
    # the quantized-decimal sum must not depend on partitioning
    rows = [(i, [math.sin(i) * 0.5]) for i in range(200)]
    a = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    b = a.repartition(13)
    ca = kmeans.train_lloyd(a, [(0, [0.0])], iters=1)
    cb = kmeans.train_lloyd(b, [(0, [0.0])], iters=1)
    assert ca == cb
