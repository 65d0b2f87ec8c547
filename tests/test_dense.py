"""Dense operators vs NumPy reference math (SURVEY.md §5 strategy 2:
engine == reference-math on the same inputs)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.operators import dense
from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = tables.load(spark, "embeddings", sf_dir).select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def np_cosine_topk(ids, mat, q, k):
    q = np.asarray(q, dtype=np.float64)
    scores = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    # stable sort on (-score, id): ids already ascending, argsort stable
    order = np.argsort(-scores, kind="stable")[:k]
    return ids[order], scores[order]


def test_topk_cosine_matches_numpy(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    got = dense.topk_cosine(emb, QUERY_VEC, k=25).collect()
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    exp_ids, exp_scores = np_cosine_topk(ids[order], mat[order], QUERY_VEC, 25)
    assert [r.vec_id for r in got] == exp_ids.tolist()
    np.testing.assert_allclose([r.score for r in got], exp_scores, rtol=0, atol=1e-9)


def test_topk_subset_is_filter_of_full(spark, sf_dir):
    """Property: subset search == full search restricted to subset
    (reference IDSelectorArray semantics)."""
    emb = tables.load(spark, "embeddings", sf_dir)
    subset = emb.filter("label < 3").select("vec_id")
    sub = dense.topk_cosine(emb, QUERY_VEC, k=10, subset=subset).collect()
    full = dense.topk_cosine(emb, QUERY_VEC, k=10**6).collect()
    allowed = {r.vec_id for r in subset.collect()}
    expected = [r.vec_id for r in full if r.vec_id in allowed][:10]
    assert [r.vec_id for r in sub] == expected


def test_knn_by_id_self_is_top1(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    got = dense.knn_by_id(emb, query_id=7, k=5).collect()
    assert got[0].vec_id == 7
    assert abs(got[0].score - 1.0) < 1e-9


def test_rocchio_negative_votes_removed_and_scores_shift(spark, sf_dir, emb_np):
    emb = tables.load(spark, "embeddings", sf_dir)
    candidates = dense.topk_cosine(emb, QUERY_VEC, k=10)
    votes = spark.createDataFrame([(3, 1.0), (11, -1.0)], "vec_id BIGINT, sign DOUBLE")
    got = dense.rocchio_rerank(emb, candidates, votes, k=10).collect()
    got_ids = {r.vec_id for r in got}
    assert 11 not in got_ids  # negative vote dropped from candidates
    # hand-compute expectation
    ids, mat = emb_np
    cand = candidates.collect()
    pos = mat[np.searchsorted(ids, 3)]
    neg = mat[np.searchsorted(ids, 11)]

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    exp = {}
    for r in cand:
        if r.vec_id == 11:
            continue
        v = mat[np.searchsorted(ids, r.vec_id)]
        exp[r.vec_id] = r.score + cos(v, pos) - cos(v, neg)
    for r in got:
        assert abs(r.score - exp[r.vec_id]) < 1e-9


def test_vocab_knn_l2_orders_ascending(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    got = dense.vocab_knn_l2(emb, QUERY_VEC, k=20).collect()
    dists = [r.dist for r in got]
    assert dists == sorted(dists)


def test_topk_cosine_arrow_matches_sql_path(spark, sf_dir):
    """The Arrow/NumPy physical strategy and the Catalyst-expression
    strategy are the same logical operator: identical rows in
    identical order after det-rounding."""
    emb = tables.load(spark, "embeddings", sf_dir)
    sql_rows = dense.topk_cosine(emb, QUERY_VEC, k=50, round_to=6).collect()
    arrow_rows = dense.topk_cosine_arrow(emb, QUERY_VEC, k=50, round_to=6).collect()
    assert [r.vec_id for r in arrow_rows] == [r.vec_id for r in sql_rows]
    np.testing.assert_allclose(
        [r.score for r in arrow_rows], [r.score for r in sql_rows], rtol=0, atol=1e-6
    )


def test_batch_topk_cosine_arrow_matches_per_query(spark, sf_dir):
    """Batched arrow scoring == independent single-query arrow runs."""
    emb = tables.load(spark, "embeddings", sf_dir)
    queries = [(0, QUERY_VEC), (1, [-v for v in QUERY_VEC])]
    batched = dense.batch_topk_cosine_arrow(emb, queries, k=10, round_to=6).collect()
    for qid, qvec in queries:
        single = dense.topk_cosine_arrow(emb, qvec, k=10, round_to=6).collect()
        got = [r for r in batched if r.query_id == qid]
        assert [r.vec_id for r in got] == [r.vec_id for r in single]
        np.testing.assert_allclose(
            [r.score for r in got], [r.score for r in single], rtol=0, atol=1e-12
        )


def test_expand_to_dim_matches_driver_encode(spark, sf_dir):
    """The corpus-side d=768 expansion (dense.expand_to_dim) and the
    driver-side query encoding (encoders.dim_expand_encode) apply the
    SAME md5-derived components — per-row float-exact up to the
    double→float storage cast."""
    from multi_search_retrival_big_data_spark.encoders import dim_expand_encode

    emb = tables.load(spark, "embeddings", sf_dir)
    rows = (
        dense.expand_to_dim(emb, out_dim=768, in_dim=64)
        .filter(F.col("vec_id").isin(0, 7))
        .collect()
    )
    base = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(0, 7)).collect()
    }
    for r in rows:
        want = dim_expand_encode(base[r["vec_id"]], 64, 768)
        got = list(r["embedding"])
        assert len(got) == 768
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.float32),
            np.asarray(want, dtype=np.float64).astype(np.float32),
        )


def test_topk_cosine_arrow_matches_expr_at_768(spark, sf_dir):
    """Expression vs Arrow strategies stay the same logical operator at
    production width: identical top-k at d=768 on the derived corpus."""
    from multi_search_retrival_big_data_spark.encoders import dim_expand_encode

    emb = tables.load(spark, "embeddings", sf_dir)
    wide = dense.expand_to_dim(emb, out_dim=768, in_dim=64)
    qv = dim_expand_encode(QUERY_VEC, 64, 768)
    expr_rows = dense.topk_cosine(wide, qv, k=25, round_to=6).collect()
    arrow_rows = dense.topk_cosine_arrow(wide, qv, k=25, round_to=6).collect()
    assert [r.vec_id for r in arrow_rows] == [r.vec_id for r in expr_rows]
    np.testing.assert_allclose(
        [r.score for r in arrow_rows],
        [r.score for r in expr_rows],
        rtol=0,
        atol=1e-6,
    )
