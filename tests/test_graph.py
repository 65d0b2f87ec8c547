"""Unit tests for operators/graph.py."""

from __future__ import annotations

import math

from multi_search_retrival_big_data_spark.operators import graph


def _py_pagerank(edges, iters, d=0.85, scale=12):
    """Python replica of graph.pagerank's exact arithmetic (quantized
    contribution sums)."""
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    m = float(10**scale)
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for s, t in edges:
            contrib[t] += int(math.floor(r[s] / out[s] * m + 0.5))
        r = {v: (1.0 - d) / n + d * (contrib[v] / m) for v in nodes}
    return r


def test_pagerank_matches_python_replica(spark):
    raw = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c")]
    df = spark.createDataFrame(raw, "src STRING, dst STRING")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=4).collect()}
    expected = _py_pagerank(raw, iters=4)
    assert set(got) == set(expected)
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-12
    # mass sanity: hub b outranks the others
    assert got["b"] == max(got.values())


def _py_pagerank_redistributed(edges, iters, d=0.85, scale=12):
    """Python replica of redistribute_dangling=True: per-round
    quantized dangling-mass sum shared equally across all nodes."""
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    n = len(nodes)
    r = {v: 1.0 / n for v in nodes}
    m = float(10**scale)
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for s, t in edges:
            contrib[t] += int(math.floor(r[s] / out[s] * m + 0.5))
        dm = sum(int(math.floor(r[v] * m + 0.5)) for v in nodes if v not in out) / m
        r = {v: (1.0 - d) / n + d * (contrib[v] / m + dm / n) for v in nodes}
    return r


def test_pagerank_redistributed_matches_replica_and_conserves_mass(spark):
    # c and d are dangling (no out-edges): their mass must be shared,
    # not leaked — total rank stays 1 every round (±quantization dust)
    raw = [("a", "b"), ("b", "c"), ("a", "c"), ("b", "d")]
    df = spark.createDataFrame(raw, "src STRING, dst STRING")
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, iters=4, redistribute_dangling=True).collect()
    }
    expected = _py_pagerank_redistributed(raw, iters=4)
    assert set(got) == set(expected)
    for v in expected:
        assert abs(got[v] - expected[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the simple variant on the same graph leaks the dangling mass
    leaky = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=4).collect()}
    assert sum(leaky.values()) < 1.0 - 1e-3


def test_pagerank_dangling_node_gets_base_rank(spark):
    # c has an in-link but no out-links (dangling): it still receives
    # rank; nodes nobody links to sit at the (1-d)/N floor
    df = spark.createDataFrame([("a", "c"), ("b", "c")], "src STRING, dst STRING")
    got = {r["node"]: r["rank"] for r in graph.pagerank(df, iters=3).collect()}
    base = (1.0 - 0.85) / 3
    assert abs(got["a"] - base) < 1e-12
    assert abs(got["b"] - base) < 1e-12
    assert got["c"] > got["a"]
