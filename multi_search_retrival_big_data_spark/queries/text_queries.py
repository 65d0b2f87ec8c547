"""Oracle-checked text-analysis queries over `documents` — SimHash
fingerprints + near-dup pairs, winnowing fingerprints, language ID,
quality scoring, token counting (operators/textanalysis.py).

Oracle SQL is generated from the same constants/stopword lists the
Spark operators use; every hash is md5 over identical bytes, so values
match bit-for-bit (the gate rounds floats to 9 decimals and then
requires exact equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.operators import textanalysis as ta
from multi_search_retrival_big_data_spark.queries import query

_HEX = ta.HEX_CHARS
_BITS = ta.SIMHASH_BITS
_CHUNKS = ta.SIMHASH_CHUNKS
_CW = _BITS // _CHUNKS


def _simhash_cte() -> str:
    """CTEs computing (doc_id, simhash) exactly like
    textanalysis.simhash_fingerprints."""
    vals = ",\n             ".join(
        f"instr('{_HEX}', substring(md5(tok), {d + 1}, 1)) - 1 AS v{d}" for d in range(16)
    )
    sums = ",\n             ".join(
        f"SUM(tf * (((v{p // 4} >> {p % 4}) & 1) * 2 - 1)) AS s{p}" for p in range(_BITS)
    )
    bits = ", ".join(
        f"CASE WHEN s{p} >= 0 THEN '1' ELSE '0' END" for p in range(_BITS)
    )
    return rf"""
    toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS tok
      FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    vals AS (
      SELECT doc_id, tf,
             {vals}
      FROM tf
    ),
    sums AS (
      SELECT doc_id,
             {sums}
      FROM vals GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, concat({bits}) AS simhash FROM sums)"""


@query(
    "text_simhash_fingerprints",
    oracle=f"WITH {_simhash_cte()} SELECT doc_id, simhash FROM fp ORDER BY doc_id",
)
def text_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, "documents", sf_dir)
    return ta.simhash_fingerprints(docs, "doc_id", "text").orderBy("doc_id")


@query(
    "text_simhash_near_dups",
    oracle=f"""
    WITH {_simhash_cte()},
    chunks AS (
      SELECT doc_id, simhash, CAST(c AS INTEGER) AS chunk_idx,
             substring(simhash, CAST(c AS INTEGER) * {_CW} + 1, {_CW}) AS chunk
      FROM fp, unnest(range(0, {_CHUNKS})) AS t(c)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sh_a, b.simhash AS sh_b
      FROM chunks a
      JOIN chunks b ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
                   AND a.doc_id < b.doc_id
    ),
    scored AS (
      SELECT id_a, id_b,
             len(list_filter(range(1, {_BITS + 1}),
                 p -> substring(sh_a, CAST(p AS INTEGER), 1)
                   <> substring(sh_b, CAST(p AS INTEGER), 1))) AS hamming
      FROM cand
    )
    SELECT id_a, id_b, hamming FROM scored
    WHERE hamming <= {_CHUNKS - 1}
    ORDER BY hamming, id_a, id_b
    """,
)
def text_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs: 8-bit-chunk pigeonhole candidates,
    verified Hamming ≤ 7 — full recall at that radius with an
    equi-join, no all-pairs scan."""
    docs = tables.load(spark, "documents", sf_dir)
    fp = ta.simhash_fingerprints(docs, "doc_id", "text")
    out = ta.simhash_near_duplicates(fp, "doc_id")
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    ).orderBy("hamming", "id_a", "id_b")


_WK, _WW = ta.WINNOW_K, ta.WINNOW_W


@query(
    "text_winnow_fingerprints",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos, length(text) AS len,
             md5(substring(lower(text), CAST(i AS INTEGER), {_WK})) AS gh
      FROM documents, unnest(range(1, length(text) - {_WK - 2})) AS t(i)
      WHERE length(text) >= {_WK + _WW - 1}
    ),
    wins AS (
      SELECT doc_id, pos, len,
             min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND {_WW - 1} FOLLOWING) AS wmin
      FROM grams
    ),
    fp AS (
      SELECT DISTINCT doc_id, wmin FROM wins
      WHERE pos <= len - {_WK - 1} - {_WW - 1}
    )
    SELECT doc_id, count(*) AS n_fp, min(wmin) AS fp_min, max(wmin) AS fp_max
    FROM fp GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint summary per doc (count / min / max of the
    fingerprint set) — compact value check of the full rolling-hash
    window pipeline."""
    docs = tables.load(spark, "documents", sf_dir)
    fp = ta.winnow_fingerprints(docs, "doc_id", "text")
    return (
        fp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            F.min("fingerprint").alias("fp_min"),
            F.max("fingerprint").alias("fp_max"),
        )
        .orderBy("doc_id")
    )


def _stopword_values() -> str:
    return ", ".join(
        f"('{lang}', '{w}')" for lang, words in ta.STOPWORDS.items() for w in words
    )


@query(
    "text_language_id",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS word
      FROM documents
    ),
    ntok AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY doc_id),
    sw(lang, word) AS (VALUES {_stopword_values()}),
    hits AS (
      SELECT doc_id, lang, count(*) AS hits
      FROM toks JOIN sw USING (word) GROUP BY doc_id, lang
    ),
    best AS (
      SELECT doc_id, lang, hits,
             row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
      FROM hits
    )
    SELECT d.doc_id,
           coalesce(b.lang, 'und') AS predicted_lang,
           coalesce(b.hits, 0) AS hits,
           coalesce(n.n_tokens, 0) AS n_tokens,
           CASE WHEN coalesce(n.n_tokens, 0) > 0
                THEN coalesce(b.hits, 0) / CAST(n.n_tokens AS DOUBLE)
                ELSE 0.0 END AS hit_ratio
    FROM documents d
    LEFT JOIN (SELECT doc_id, lang, hits FROM best WHERE rn = 1) b USING (doc_id)
    LEFT JOIN ntok n USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, "documents", sf_dir)
    return ta.language_id(docs, "doc_id", "text").orderBy("doc_id")


_EN_LIST = ", ".join(f"'{w}'" for w in ta.STOPWORDS["en"])


@query(
    "text_quality_scores",
    oracle=rf"""
    SELECT doc_id,
           length(text) AS n_chars,
           len(regexp_extract_all(lower(text), '\w+')) AS n_tokens,
           length(regexp_replace(text, '[^\w]', '', 'g'))
             / CAST(CASE WHEN length(text) > 0 THEN length(text) ELSE 1 END AS DOUBLE)
             AS word_char_ratio,
           length(regexp_replace(text, '[\w\s]', '', 'g'))
             / CAST(CASE WHEN length(text) > 0 THEN length(text) ELSE 1 END AS DOUBLE)
             AS punct_ratio,
           length(regexp_replace(text, '[^0-9]', '', 'g'))
             / CAST(CASE WHEN length(text) > 0 THEN length(text) ELSE 1 END AS DOUBLE)
             AS digit_ratio,
           len(list_filter(regexp_extract_all(lower(text), '\w+'),
               x -> list_contains([{_EN_LIST}], x)))
             / CAST(CASE WHEN len(regexp_extract_all(lower(text), '\w+')) > 0
                         THEN len(regexp_extract_all(lower(text), '\w+')) ELSE 1 END AS DOUBLE)
             AS stopword_ratio,
           (len(list_filter(regexp_extract_all(lower(text), '\w+'),
                x -> list_contains([{_EN_LIST}], x)))
              / CAST(CASE WHEN len(regexp_extract_all(lower(text), '\w+')) > 0
                          THEN len(regexp_extract_all(lower(text), '\w+')) ELSE 1 END AS DOUBLE)
            + (1.0 - length(regexp_replace(text, '[\w\s]', '', 'g'))
                 / CAST(CASE WHEN length(text) > 0 THEN length(text) ELSE 1 END AS DOUBLE))
            + CAST(least(len(regexp_extract_all(lower(text), '\w+')), 100) AS DOUBLE) / 100.0
           ) / 3.0 AS quality
    FROM documents
    ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, "documents", sf_dir)
    return ta.quality_features(docs, "doc_id", "text").orderBy("doc_id")


@query(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
           len(regexp_extract_all(lower(text), '\w+')) AS word_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe_ish_tokens,
           length(text) AS n_chars
    FROM documents
    ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tables.load(spark, "documents", sf_dir)
    return ta.token_counts(docs, "doc_id", "text").orderBy("doc_id")


from multi_search_retrival_big_data_spark.queries.common import sql_det_round, sql_dsum


@query(
    "text_bigram_lm_scores",
    oracle=f"""
    WITH bigrams AS (
      SELECT doc_id, substring(lower(text), CAST(i AS INTEGER), 2) AS g
      FROM documents, unnest(range(1, length(text))) AS t(i)
      WHERE length(text) >= 2
    ),
    c2 AS (SELECT g, count(*) AS c2 FROM bigrams GROUP BY g),
    c1 AS (SELECT substring(g, 1, 1) AS x, count(*) AS c1 FROM bigrams GROUP BY 1),
    v AS (SELECT count(DISTINCT substring(g, 1, 1)) AS v FROM bigrams),
    scored AS (
      SELECT b.doc_id, ln((c2.c2 + 1.0) / (c1.c1 + v.v)) AS lp
      FROM bigrams b JOIN c2 USING (g)
      JOIN c1 ON substring(b.g, 1, 1) = c1.x
      CROSS JOIN v
    )
    SELECT doc_id, count(*) AS n_bigrams,
           {sql_det_round(sql_dsum('lp', 9) + ' / count(*)')} AS avg_logprob
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-estimated char-bigram LM score per document — the
    perplexity-style quality filter of training-data pipelines."""
    docs = tables.load(spark, "documents", sf_dir)
    return ta.char_bigram_lm_scores(docs, "doc_id", "text").orderBy("doc_id")
