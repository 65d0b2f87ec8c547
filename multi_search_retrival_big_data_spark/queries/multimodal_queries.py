"""Oracle-checked multimodal plumbing queries (operators/multimodal.py).

The fake decoder's features are pure functions of the payload bytes;
the corpus text is ASCII, so DuckDB can recompute byte sums as
`ord(substring(text, i, 1))` sums — verifying the mapInPandas seam
value-for-value against SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.operators import multimodal as mm
from multi_search_retrival_big_data_spark.queries import query

_MEDIA_TYPE_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'image' "
    "WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"
)

_BYTESUM_CTE = """
    bytesum AS (
      SELECT doc_id, CAST(sum(ord(substring(text, CAST(i AS INTEGER), 1))) AS BIGINT) AS s
      FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
      GROUP BY doc_id
    )"""


@query(
    "multimodal_decode_features",
    oracle=f"""
    WITH {_BYTESUM_CTE}
    SELECT d.doc_id AS media_id,
           {_MEDIA_TYPE_SQL} AS media_type,
           octet_length(CAST(d.text AS BLOB)) AS byte_len,
           b.s % {mm.CHECKSUM_MOD} AS checksum,
           octet_length(CAST(d.text AS BLOB)) // {mm.FRAME_BYTES} + 1 AS n_frames
    FROM documents d JOIN bytesum b USING (doc_id)
    ORDER BY media_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → Arrow-batched fake decode via mapInPandas
    → (byte_len, checksum, n_frames). Validates the multimodal UDF
    plumbing end to end against pure SQL."""
    docs = tables.load(spark, "documents", sf_dir)
    media = mm.as_media_table(docs)
    return mm.decode_media(media).orderBy("media_id")


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH frames AS (
      SELECT doc_id AS media_id,
             octet_length(CAST(text AS BLOB)) // {mm.FRAME_BYTES} + 1 AS n_frames
      FROM documents
    )
    SELECT media_id, CAST(f AS BIGINT) AS frame_idx
    FROM frames, unnest(range(0, n_frames, 2)) AS t(f)
    ORDER BY media_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-index sampling (every 2nd synthetic frame) after decode —
    the per-frame fan-out stage of a video pipeline."""
    docs = tables.load(spark, "documents", sf_dir)
    decoded = mm.decode_media(mm.as_media_table(docs))
    return mm.frame_sample(decoded, every=2).orderBy("media_id", "frame_idx")


@query(
    "multimodal_fake_embedding",
    oracle=f"""
    WITH comps AS (
      SELECT doc_id AS media_id,
             CAST((CAST(i AS INTEGER) - 1) % {mm.EMBED_DIM} AS INTEGER) AS component,
             CAST(sum(ord(substring(text, CAST(i AS INTEGER), 1))) AS BIGINT) AS s
      FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
      GROUP BY 1, 2
    )
    SELECT media_id, component,
           (s % {mm.EMBED_MOD}) / {float(mm.EMBED_MOD)} AS feat
    FROM comps
    ORDER BY media_id, component
    """,
)
def multimodal_fake_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake feature-encoder seam (stands in for CLIP):
    exploded (media_id, component, feat) from byte-position sums."""
    docs = tables.load(spark, "documents", sf_dir)
    media = mm.as_media_table(docs)
    return mm.fake_embedding_components(media).orderBy("media_id", "component")
