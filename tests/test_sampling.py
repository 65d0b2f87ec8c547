"""Unit tests for operators/sampling.py."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.operators import sampling


@pytest.fixture(scope="module")
def ids(spark):
    return spark.createDataFrame([(i,) for i in range(1000)], ["id"])


def test_hash_sample_matches_python_md5(spark, ids):
    th = "1" + "9" * 31
    got = {r["id"] for r in sampling.hash_sample(ids, "id", th).collect()}
    expected = {i for i in range(1000) if hashlib.md5(str(i).encode()).hexdigest() < th}
    assert got == expected
    assert 50 < len(got) < 150  # ~10%


def test_hash_sample_stable_under_repartition(spark, ids):
    th = "1" + "9" * 31
    a = {r["id"] for r in sampling.hash_sample(ids, "id", th).collect()}
    b = {r["id"] for r in sampling.hash_sample(ids.repartition(7), "id", th).collect()}
    assert a == b


def test_stratified_sample_exact_n_and_deterministic(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    out = sampling.stratified_sample(df, ["grp"], "id", 10).collect()
    by_grp: dict[str, list] = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    assert {g: len(v) for g, v in by_grp.items()} == {"a": 10, "b": 10}
    # rank order must follow the md5 order of the id string
    for g, members in by_grp.items():
        members.sort(key=lambda r: r["sample_rank"])
        hashes = [hashlib.md5(str(r["id"]).encode()).hexdigest() for r in members]
        assert hashes == sorted(hashes)


def test_kmv_estimate_close_to_truth(spark):
    n = 5000
    df = spark.createDataFrame([(f"tok{i % n}",) for i in range(2 * n)], ["t"])
    row = sampling.kmv_distinct(df, "t", 256).collect()[0]
    assert row["k_min"] == 256
    # KMV with k=256 has ~1/sqrt(k) ≈ 6% stddev; allow 25%
    assert abs(row["est_distinct"] - n) / n < 0.25


def test_kmv_small_set_underfills_k(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], ["t"])
    row = sampling.kmv_distinct(df, "t", 256).collect()[0]
    assert row["k_min"] == 2  # only 2 distinct values exist


def test_heavy_hitters_order_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (1, "y"), (2, "y"), (1, "z")],
        ["doc", "t"],
    )
    got = [(r["t"], r["freq"]) for r in sampling.heavy_hitters(df, "t", 2).collect()]
    assert got == [("x", 3), ("y", 2)]


def test_binned_quantiles_exact_on_uniform(spark):
    # 0..999 uniform, width 10: every bin holds exactly 10 values, so
    # the interpolated estimate p·N lands at value ≈ 1000p
    df = spark.createDataFrame([(i,) for i in range(1000)], ["x"])
    got = {
        r["p"]: r["est"]
        for r in sampling.binned_quantiles(df, "x", 10, [0.5, 0.9]).collect()
    }
    assert got[0.5] == pytest.approx(500.0, abs=10)
    assert got[0.9] == pytest.approx(900.0, abs=10)


def test_binned_quantiles_matches_python_recompute(spark):
    vals = [((i * 37) % 211) + 3 for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    width, ps = 16, [0.25, 0.75, 0.99]
    got = {
        r["p"]: r["est"]
        for r in sampling.binned_quantiles(df, "x", width, ps).collect()
    }
    # python replica of the histogram interpolation
    from collections import Counter

    bins = Counter(v // width for v in vals)
    n_total = len(vals)
    for p in ps:
        t = p * n_total
        cum = 0
        for b in sorted(bins):
            if cum + bins[b] >= t:
                expected = b * width + (t - cum) / bins[b] * width
                break
            cum += bins[b]
        assert got[p] == pytest.approx(expected, rel=1e-12)


def test_binned_quantiles_error_bounded_by_width(spark):
    import statistics

    vals = [((i * 131) % 997) for i in range(600)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = {
        r["p"]: r["est"]
        for r in sampling.binned_quantiles(df, "x", 25, [0.5]).collect()
    }
    exact = statistics.quantiles(vals, n=2, method="inclusive")[0]
    assert abs(got[0.5] - exact) <= 25 + 1
