"""Oracle-checked second-stage rerank queries (operators/rerank.py).

First stage = persisted-postings TF-IDF top-n (the reference's sparse
recall path); second stage = cross-encoder pair scoring through the
Arrow mapInPandas seam (deterministic fake — encoders.FakeCrossEncoder
— whose md5 pair score the oracle re-derives digit by digit)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multi_search_retrival_big_data_spark import index_store, tables
from multi_search_retrival_big_data_spark.operators import rerank, sparse
from multi_search_retrival_big_data_spark.queries import query
from multi_search_retrival_big_data_spark.queries.common import sql_det_round
from multi_search_retrival_big_data_spark.queries.sparse_queries import (
    QUERY_TEXT,
    tfidf_cte,
)

_QS = sparse.query_terms(QUERY_TEXT, (1, 1))
_ALPHA = 0.5
_N_CAND = 50
_K = 10


def _md5_int_sql(expr: str) -> str:
    """First 8 hex digits of md5(expr) as an integer — the positional
    instr decode shared with the MinHash oracle (dedup.shingle_int_value
    mirrors the same expression Spark-side)."""
    digits = " + ".join(
        f"(instr('0123456789abcdef', substring(md5({expr}), {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"({digits})"


_PAIR = "'" + QUERY_TEXT + "' || chr(31) || d.text"
_CE = f"({_md5_int_sql(_PAIR)} / 4294967296.0)"


@query(
    "rerank_cross_encoder",
    oracle=f"""
    WITH {tfidf_cte('ce_', (1, 1), _QS)},
    cand AS (SELECT doc_id, score FROM ce_topk ORDER BY score DESC, doc_id LIMIT {_N_CAND}),
    scored AS (
      SELECT c.doc_id,
             {_ALPHA!r} * c.score + {1.0 - _ALPHA!r} * {_CE} AS blended,
             {_CE} AS ce
      FROM cand c JOIN documents d USING (doc_id)
    )
    SELECT doc_id, {sql_det_round('blended')} AS score, {sql_det_round('ce')} AS ce_score
    FROM scored ORDER BY score DESC, doc_id LIMIT {_K}
    """,
)
def rerank_cross_encoder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: persisted-postings TF-IDF recall (top-50)
    → cross-encoder pair rerank (top-10, blended 0.5·s1 + 0.5·ce).
    The pair model is the encoders.FakeCrossEncoder seam running
    through the real Arrow mapInPandas path — swap in a transformer
    cross-encoder on a production cluster and the plan is unchanged
    (same slot as the reference's /feedback rerank tail, app.py;
    see operators/rerank.py header). Candidate text is attached by
    broadcasting the 50-row hit list into a corpus hash-join."""
    docs = tables.load(spark, "documents", sf_dir)
    postings = index_store.tfidf_postings(spark, sf_dir)
    hits = sparse.tfidf_score(postings, _QS, k=_N_CAND, round_to=6)
    cand = rerank.attach_candidate_text(hits, docs, "doc_id", "text")
    return rerank.cross_encoder_rerank(
        cand, QUERY_TEXT, alpha=_ALPHA, k=_K, round_to=6
    )
