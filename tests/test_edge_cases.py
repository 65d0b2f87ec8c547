"""Edge-case behavior: OOV queries, k larger than corpus, empty
subsets/inputs — the degenerate shapes a serving layer actually sends."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.operators import dedup, dense, fusion, sparse
from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC


def test_oov_only_query_returns_empty(spark, sf_dir):
    docs = tables.load(spark, "documents", sf_dir)
    postings = sparse.fit_tfidf(docs)
    out = sparse.tfidf_score(postings, [("zzzquux", 1)], k=10)
    assert out.count() == 0


def test_k_larger_than_corpus(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    n = emb.count()
    out = dense.topk_cosine(emb, QUERY_VEC, k=n * 10)
    assert out.count() == n


def test_empty_subset_restriction(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    empty = emb.filter(F.lit(False)).select("vec_id")
    assert dense.topk_cosine(emb, QUERY_VEC, k=10, subset=empty).count() == 0


def test_fusion_of_empty_and_nonempty_sources(spark):
    a = spark.createDataFrame([(1, 2.0), (2, 1.0)], "id BIGINT, score DOUBLE")
    b = spark.createDataFrame([], "id BIGINT, score DOUBLE")
    out = {r["id"]: r["score"] for r in fusion.merge_by_addition([a, b]).collect()}
    # empty source contributes nothing; min-max of a still applies
    assert set(out) == {1, 2}
    assert out[1] > out[2]


def test_dedup_on_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    assert dedup.exact_dedup(docs, "doc_id", "text").count() == 0
    assert dedup.minhash_near_duplicates(docs, "doc_id", "text", 0.5).count() == 0


def test_single_doc_corpus_has_no_pairs(spark):
    docs = spark.createDataFrame([(1, "the quick brown fox jumps")], "doc_id BIGINT, text STRING")
    assert dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 0.0).count() == 0
