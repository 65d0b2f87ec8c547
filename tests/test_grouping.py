"""Result-shaping operators (operators/grouping.py) — quota top-k."""

from __future__ import annotations

from multi_search_retrival_big_data_spark.operators import grouping


def _hits(spark):
    # source A holds the 3 best hits; quota must demote the third
    rows = [
        (1, 0.9, "A"),
        (2, 0.8, "A"),
        (3, 0.7, "A"),
        (4, 0.6, "B"),
        (5, 0.5, "B"),
        (6, 0.4, "C"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, score DOUBLE, source STRING")


def test_quota_enforced_and_globally_ranked(spark):
    got = grouping.quota_topk(_hits(spark), "source", quota=2, k=10).collect()
    ids = [r.doc_id for r in got]
    assert ids == [1, 2, 4, 5, 6]  # doc 3 (rank 3 in A) is demoted out
    per_src = {}
    for r in got:
        per_src[r.source] = per_src.get(r.source, 0) + 1
    assert max(per_src.values()) <= 2


def test_quota_k_truncates_after_quota(spark):
    got = grouping.quota_topk(_hits(spark), "source", quota=2, k=3).collect()
    assert [r.doc_id for r in got] == [1, 2, 4]


def test_quota_ties_break_by_id_within_group(spark):
    rows = [(7, 0.5, "A"), (3, 0.5, "A"), (9, 0.5, "A")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, score DOUBLE, source STRING")
    got = grouping.quota_topk(df, "source", quota=2, k=10).collect()
    assert [r.doc_id for r in got] == [3, 7]


def test_quota_plan_uses_window_group_limit(spark):
    plan = grouping.quota_topk(_hits(spark), "source", quota=2, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
