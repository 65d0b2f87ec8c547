"""Second-stage cross-encoder reranking — the precision tail of
two-stage retrieval.

Reference placement: the reference's serving stack is FAISS recall +
a rerank tail — its rerank is vector-side relevance feedback
(/root/reference/app.py /feedback endpoint; utils/faiss_processing.py
re-query path, Q3). A cross-encoder is the text-side occupant of the
same slot in production retrieval stacks (bi-encoder recall stage →
cross-attention precision stage, MS MARCO rerankers): score each
(query, passage) candidate pair with a pair model, blend with the
first-stage score, re-rank.

Model seam: encoders.CrossEncoder — same placement as the reference's
model boundaries (encoders.py header). The deterministic fake scores
through the REAL Arrow mapInPandas plumbing; a production cluster
swaps the score() body and keeps the plan.

Scale shape: the rerank touches ONLY the request-sized candidate list
(first-stage top-n, n ≲ 100) — the one place per-pair Python inference
is affordable by design, because candidate count is independent of
corpus size. Passage text is attached by broadcasting the TINY hit
list into a corpus hash-join (one pruned scan; never a corpus shuffle,
never a corpus-side broadcast), then a single Arrow batch flows
through the encoder.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.encoders import CrossEncoder, FakeCrossEncoder
from multi_search_retrival_big_data_spark.functions.rounding import det_round

if TYPE_CHECKING:
    import pandas as pd

CE_SCHEMA = "id BIGINT, s1 DOUBLE, ce DOUBLE"


def attach_candidate_text(
    hits: DataFrame, corpus: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, score) hits + corpus → (id, score, text). The HIT side is
    broadcast (request-sized) and hash-joined against the corpus — the
    scale-correct direction: one corpus scan with a broadcast semi-side,
    no corpus shuffle and no corpus-sized broadcast."""
    return corpus.select(id_col, text_col).join(F.broadcast(hits), id_col)


def cross_encoder_rerank(
    candidates: DataFrame,
    query_text: str,
    encoder: CrossEncoder | None = None,
    id_col: str = "doc_id",
    score_col: str = "score",
    text_col: str = "text",
    alpha: float = 0.5,
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Rerank a (id, first-stage score, text) candidate list by
    blended score alpha·s1 + (1−alpha)·ce(query, text), descending,
    ties → id ASC. Output: (id, score, ce_score).

    Determinism: s1 arrives det-rounded from the first stage, the fake
    ce is an exact 32-bit integer / 2³², and the blend is the same
    two-multiply-one-add IEEE expression the oracle renders — so the
    blended doubles are bit-identical cross-engine before the final
    det_round."""
    enc = encoder if encoder is not None else FakeCrossEncoder()
    sel = candidates.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(score_col).cast("double").alias("s1"),
        F.col(text_col).alias("txt"),
    )

    def _score(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "s1": pdf["s1"],
                    "ce": [enc.score(query_text, t) for t in pdf["txt"]],
                }
            )

    scored = sel.mapInPandas(_score, CE_SCHEMA)
    blended = F.lit(float(alpha)) * F.col("s1") + F.lit(float(1.0 - alpha)) * F.col("ce")
    return (
        scored.select(
            F.col("id").alias(id_col),
            det_round(blended, round_to).alias("score"),
            det_round(F.col("ce"), round_to).alias("ce_score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
