"""Persisted fitted-index store — build once, read per query.

The reference never re-fits an index on the query path: vectorizers and
doc-term matrices are fitted offline and loaded from pickle/npz at
startup (/root/reference/utils/object_retrieval_engine/object_retrieval.py:117-145;
speech_retrieval.py:51-68; faiss .bin files at app.py:164-165). Round 1
re-fit TF-IDF inside every sparse query (the `.cache()` only de-duped
the two consumers *within* one plan), so bench times were dominated by
fit cost — a non-starter at 100 TB, where the fit is a full corpus
scan + 3 shuffles.

This module is the Spark-native analogue of the fitted-artifact load:
each fitted index is materialized ONCE per (corpus, config) as a
parquet table bucketed + sorted by `term` (sparse.write_postings_bucketed)
and every query reads the table. Bucketing by the join/agg key means
repeated scoring joins and idf lookups read pre-clustered buckets with
no Exchange on the index side. The first call in a session builds (or
overwrites) the table; subsequent calls are a catalog lookup.

At real scale this build is the ingest job that maintains the index as
the corpus grows; the `documents`-table fingerprint in the table name
stands in for a snapshot/version id.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.operators import ann, dedup, sparse

POSTINGS_BUCKETS = 32


def _table_name(kind: str, sf_dir: str, variant: str) -> str:
    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"msrbd_{kind}_{variant}_{h}"


def _drop_stale_location(spark: SparkSession, name: str) -> None:
    """The default session catalog is in-memory: a NEW session does not
    know the table, but the warehouse directory survives from the
    previous one and blocks CREATE (LOCATION_ALREADY_EXISTS). Managed-
    table metadata (bucketing!) lives in the catalog, so re-registering
    the bare files would silently lose the bucket layout — instead the
    stale location is removed and the index rebuilt once per session
    (on a metastore-backed cluster this branch never fires)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + name
    )
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)


def _read_or_build(
    spark: SparkSession, name: str, build: "callable", buckets: int = POSTINGS_BUCKETS
) -> DataFrame:
    if not spark.catalog.tableExists(name):
        _drop_stale_location(spark, name)
        sparse.write_postings_bucketed(build(), name, buckets=buckets)
    return spark.table(name)


def tfidf_postings(
    spark: SparkSession,
    sf_dir: str,
    ngram_range: tuple[int, int] = (1, 1),
    analyzer: str = "word",
) -> DataFrame:
    """(term, doc_id, weight, idf) — sklearn-parity TF-IDF posting
    lists for the corpus at `sf_dir`, persisted term-bucketed.
    analyzer='char' builds the char-n-gram fallback channel
    (object_retrieval.py:79-89) as its own persisted index."""
    prefix = "c" if analyzer == "char" else ""
    name = _table_name("tfidf", sf_dir, f"{prefix}{ngram_range[0]}{ngram_range[1]}")
    return _read_or_build(
        spark,
        name,
        lambda: sparse.fit_tfidf(
            tables.load(spark, "documents", sf_dir),
            ngram_range=ngram_range,
            analyzer=analyzer,
        ),
    )


def bm25_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, score_w) — BM25Okapi posting lists, persisted."""
    name = _table_name("bm25", sf_dir, "11")
    return _read_or_build(
        spark, name, lambda: sparse.fit_bm25(tables.load(spark, "documents", sf_dir))
    )


def multichannel_postings(
    spark: SparkSession, sf_dir: str, channels: dict[str, tuple[int, int]]
) -> DataFrame:
    """(channel, term, doc_id, weight, idf) for ALL channels, persisted.
    Bucketed by `term`: HashPartitioning(term) still satisfies a
    clustering on (channel, term), so the scoring join stays
    exchange-free on the index side."""
    variant = "_".join(f"{ch}{a}{b}" for ch, (a, b) in sorted(channels.items()))
    name = _table_name("mc", sf_dir, variant)
    return _read_or_build(
        spark,
        name,
        lambda: sparse.fit_tfidf_multichannel(
            tables.load(spark, "documents", sf_dir), channels
        ),
    )


def ivf_assignments(
    spark: SparkSession, sf_dir: str, stride: int = ann.IVF_CENTROID_STRIDE
) -> DataFrame:
    """(vec_id, cid) — the IVF inverted lists, built ONCE by the
    coarse-quantizer job (ann.ivf_assign) and persisted PARTITIONED BY
    cid, so a query's nprobe cell probe prunes to nprobe/nlist of the
    table (FAISS builds its inverted lists once at add time —
    create_bin.ipynb cells 3-8; the round-1 inline recompute was a
    corpus×centroids pass per query, the scale killer this removes)."""
    name = _table_name("ivf", sf_dir, f"s{stride}")
    if not spark.catalog.tableExists(name):
        _drop_stale_location(spark, name)
        emb = tables.load(spark, "embeddings", sf_dir)
        _, assign = ann.ivf_assign(emb, stride=stride)
        ann.write_ivf_assignments(assign, name)
    return spark.table(name)


def _save_partitioned(df: DataFrame, name: str, cols: list[str]) -> None:
    df.write.mode("overwrite").partitionBy(*cols).format("parquet").saveAsTable(name)


def emb_lsh_bands(
    spark: SparkSession,
    sf_dir: str,
    bands: int = ann.ANN_BANDS,
    num_planes: int = ann.NUM_PLANES,
) -> DataFrame:
    """(vec_id, band, bval) — the hyperplane-LSH banding of the
    embedding corpus, built once and persisted PARTITIONED BY
    (band, bval): a query's band probe reads `bands` of the
    bands × 2^rows partitions (partition pruning), and near-dup pair
    mining equi-joins the table against itself — the per-run
    16-hyperplane signature pass over every vector moves to ingest."""
    name = _table_name("lshband", sf_dir, f"b{bands}p{num_planes}")
    if not spark.catalog.tableExists(name):
        _drop_stale_location(spark, name)
        emb = tables.load(spark, "embeddings", sf_dir)
        banded = ann.banded_signatures(emb, bands=bands, num_planes=num_planes)
        _save_partitioned(banded, name, ["band", "bval"])
    return spark.table(name)


def doc_shingles(
    spark: SparkSession, sf_dir: str, k: int = dedup.SHINGLE_K
) -> DataFrame:
    """(doc_id, shingle) — distinct char k-grams per document,
    persisted bucketed by doc_id (the verify stage's joins and size
    aggregation key). The explode+distinct over the corpus — the
    widest stage of the dedup pipeline — runs once at ingest."""
    name = _table_name("shingle", sf_dir, f"k{k}")
    if not spark.catalog.tableExists(name):
        _drop_stale_location(spark, name)
        docs = tables.load(spark, "documents", sf_dir)
        sh = dedup.char_shingles(docs, "doc_id", "text", k)
        (
            sh.write.mode("overwrite")
            .bucketBy(POSTINGS_BUCKETS, "doc_id")
            .sortBy("doc_id")
            .format("parquet")
            .saveAsTable(name)
        )
    return spark.table(name)


def minhash_sigs(
    spark: SparkSession,
    sf_dir: str,
    k: int = dedup.SHINGLE_K,
    num_perm: int = dedup.NUM_PERM,
) -> DataFrame:
    """(doc_id, h0..h{P-1}) — the minhash signature table derived from
    the persisted shingles; one row per document, tiny at rest. The
    md5-per-shingle permutation pass — the dedup pipeline's dominant
    CPU cost — happens only here, at build time."""
    name = _table_name("minhash", sf_dir, f"k{k}p{num_perm}")
    if not spark.catalog.tableExists(name):
        _drop_stale_location(spark, name)
        sig = dedup.minhash_signatures(doc_shingles(spark, sf_dir, k), "doc_id", num_perm)
        (
            sig.write.mode("overwrite")
            .bucketBy(POSTINGS_BUCKETS, "doc_id")
            .sortBy("doc_id")
            .format("parquet")
            .saveAsTable(name)
        )
    return spark.table(name)


def pq_codes(
    spark: SparkSession,
    sf_dir: str,
    m: int = ann.PQ_M,
    ks: int = ann.PQ_KS,
    stride: int = ann.PQ_STRIDE,
) -> DataFrame:
    """(vec_id, c0..c{M-1}) — the PQ code table, built ONCE by the
    encode job (ann.pq_encode, FAISS IndexPQ.add analogue) and
    persisted bucketed by vec_id. The ADC query path reads ONLY this
    table — M small ints per vector — never the embeddings."""
    name = _table_name("pq", sf_dir, f"m{m}k{ks}s{stride}")
    if not spark.catalog.tableExists(name):
        _drop_stale_location(spark, name)
        emb = tables.load(spark, "embeddings", sf_dir)
        ann.write_pq_codes(ann.pq_encode(emb, m=m, ks=ks, stride=stride), name)
    return spark.table(name)
