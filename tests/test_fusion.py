"""Fusion invariants (SURVEY.md §5 property tests)."""

from __future__ import annotations

from multi_search_retrival_big_data_spark.operators import fusion


def _df(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, score DOUBLE")


def test_single_list_identity(spark):
    a = _df(spark, [(1, 0.9), (2, 0.5), (3, 0.1)])
    got = fusion.merge_by_addition([a]).collect()
    assert [(r.id, r.score) for r in got] == [(1, 0.9), (2, 0.5), (3, 0.1)]


def test_permutation_invariance(spark):
    a = _df(spark, [(1, 0.9), (2, 0.5)])
    b = _df(spark, [(2, 3.0), (3, 1.0)])
    ab = {(r.id, round(r.score, 9)) for r in fusion.merge_by_addition([a, b]).collect()}
    ba = {(r.id, round(r.score, 9)) for r in fusion.merge_by_addition([b, a]).collect()}
    assert ab == ba


def test_duplicate_ids_sum_across_sources(spark):
    # id 2 appears in both lists → its fused score is the sum of the
    # per-list min-max normalized scores (rank boost, combine_utils:45-51)
    a = _df(spark, [(1, 1.0), (2, 0.0)])
    b = _df(spark, [(2, 2.0), (3, 0.0)])
    got = {r.id: r.score for r in fusion.merge_by_addition([a, b]).collect()}
    # normalized: a -> {1: 1/(1+1e-6), 2: 0}; b -> {2: 2/(2+1e-6), 3: 0}
    assert abs(got[2] - (0.0 + 2.0 / (2.0 + 1e-6))) < 1e-9
    assert abs(got[1] - 1.0 / (1.0 + 1e-6)) < 1e-9
    assert got[3] == 0.0


def test_minmax_normalize_bounds(spark):
    a = _df(spark, [(1, -5.0), (2, 0.0), (3, 10.0)])
    got = {r.id: r.score for r in fusion.minmax_normalize(a).collect()}
    assert got[1] == 0.0
    assert 0.0 < got[2] < got[3] < 1.0


def test_l2_dedup_keeps_max(spark):
    a = _df(spark, [(1, 3.0), (2, 4.0)])  # l2 = 5
    b = _df(spark, [(1, 1.0)])  # l2 = 1
    got = {r.id: r.score for r in fusion.merge_l2_dedup_max([a, b]).collect()}
    # id1: max(3/5, 1/1) = 1.0
    assert abs(got[1] - 1.0) < 1e-12
    assert abs(got[2] - 0.8) < 1e-12
