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


def test_rrf_scores_and_order(spark):
    # a: ranks 1,2,3 → ids 1,2,3; b: ranks 1,2 → ids 2,4
    a = _df(spark, [(1, 0.9), (2, 0.5), (3, 0.1)])
    b = _df(spark, [(2, 3.0), (4, 1.0)])
    got = {r.id: r.score for r in fusion.reciprocal_rank_fusion([a, b]).collect()}

    import math

    def q(*ranks):  # exact integer sum of quantized addends, divided once
        return sum(math.floor(1e12 / (60.0 + r) + 0.5) for r in ranks) / 1e12

    assert got[2] == q(2, 1)  # in both lists → boosted
    assert got[1] == q(1)
    assert got[4] == q(2)
    assert got[3] == q(3)
    order = [
        r.id for r in fusion.reciprocal_rank_fusion([a, b]).collect()
    ]
    assert order[0] == 2  # dual membership outranks any single rank-1


def test_rrf_scale_invariance(spark):
    # rank fusion ignores score scales entirely: multiplying one list's
    # scores by 1000 changes nothing (the property min-max only approximates)
    a = _df(spark, [(1, 0.9), (2, 0.5)])
    a_scaled = _df(spark, [(1, 900.0), (2, 500.0)])
    b = _df(spark, [(2, 3.0), (3, 1.0)])
    base = {(r.id, r.score) for r in fusion.reciprocal_rank_fusion([a, b]).collect()}
    scaled = {(r.id, r.score) for r in fusion.reciprocal_rank_fusion([a_scaled, b]).collect()}
    assert base == scaled


def test_rrf_rank_ties_break_by_id(spark):
    # equal scores: the smaller id takes the better rank in every engine
    a = _df(spark, [(7, 0.5), (3, 0.5)])
    got = {r.id: r.score for r in fusion.reciprocal_rank_fusion([a]).collect()}
    import math

    assert got[3] == math.floor(1e12 / 61.0 + 0.5) / 1e12
    assert got[7] == math.floor(1e12 / 62.0 + 0.5) / 1e12


def test_dim_routed_fallback_picks_matching_space(spark, sf_dir):
    """Reference faiss_processing.py:133-152: a query vector whose
    dimension mismatches the requested index searches the other one."""
    import pytest

    from multi_search_retrival_big_data_spark import tables
    from multi_search_retrival_big_data_spark.encoders import MODEL_B_DIM, model_b_encode
    from multi_search_retrival_big_data_spark.operators import dense

    emb = tables.load(spark, "embeddings", sf_dir)
    emb_b = dense.model_b_embeddings(emb)
    spaces = {"clip": (emb, 64), "clipv2": (emb_b, MODEL_B_DIM)}
    qb = model_b_encode([0.1] * 64)

    routed = dense.topk_cosine_dim_routed("clip", spaces, qb, k=10, round_to=6)
    direct = dense.topk_cosine(emb_b, qb, k=10, round_to=6)
    assert [tuple(r) for r in routed.collect()] == [tuple(r) for r in direct.collect()]

    with pytest.raises(ValueError, match="no embedding space"):
        dense.topk_cosine_dim_routed("clip", spaces, [0.0] * 7, k=10)


def test_model_b_is_a_distinct_space(spark, sf_dir):
    """Model B must be a different similarity, not a rescaled copy:
    its top-k over the same corpus differs from model A's."""
    from multi_search_retrival_big_data_spark import tables
    from multi_search_retrival_big_data_spark.encoders import model_b_encode
    from multi_search_retrival_big_data_spark.operators import dense
    from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC

    emb = tables.load(spark, "embeddings", sf_dir)
    a = [r["vec_id"] for r in dense.topk_cosine(emb, QUERY_VEC, k=20, round_to=6).collect()]
    b = [
        r["vec_id"]
        for r in dense.topk_cosine(
            dense.model_b_embeddings(emb), model_b_encode(QUERY_VEC), k=20, round_to=6
        ).collect()
    ]
    assert a != b
