"""Structured Streaming source/sink plumbing for the `events` table.

`read_event_stream` turns the driver's events parquet into a file
stream (the same code path a production deployment pointed at an
append-only directory / Kafka-landed parquet would use);
`run_to_memory` executes any streaming transform to completion with
Trigger.AvailableNow and returns the final result as a batch
DataFrame — which is what lets the driver's DuckDB oracle verify a
REAL streaming execution value-for-value.

The events parquet has shipped as TIMESTAMP(NANOS) in some testdata
generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others
(see tables._load_events); the stream peeks the parquet footer with a
batch read and picks the matching source schema + ts conversion, so
both layouts produce the identical session-TZ timestamp column.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampType

_EVENTS_SCHEMA_TMPL = (
    "event_id BIGINT, ts {ts_type}, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_event_stream(spark: SparkSession, sf_dir: str, copies: int = 1) -> DataFrame:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed in newer Spark → nanos files unsupported there
    # FileStreamSource wants a directory it can watch for appended
    # files; the driver ships a single parquet file, so stage a
    # symlink into a temp "landing" directory — exactly the layout an
    # append-only ingest folder would have in production. `copies > 1`
    # stages the same file N times — the at-least-once redelivery a
    # dedup stage must absorb (each copy is a separate source file, so
    # duplicates arrive across micro-batch boundaries too).
    src = os.path.join(sf_dir, "events.parquet")
    # footer peek (batch read plans only the schema; no data scan)
    ts_type = spark.read.parquet(src).schema["ts"].dataType
    landing = tempfile.mkdtemp(prefix="events_stream_")
    for i in range(copies):
        os.symlink(src, os.path.join(landing, f"events_{i}.parquet"))
    if isinstance(ts_type, LongType):
        raw = spark.readStream.schema(
            _EVENTS_SCHEMA_TMPL.format(ts_type="BIGINT")
        ).parquet(landing)
        # `div` (integer division) — double `/ 1000` can round up 1µs
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(ts_type, TimestampType):
        raw = spark.readStream.schema(
            _EVENTS_SCHEMA_TMPL.format(ts_type="TIMESTAMP_NTZ")
        ).parquet(landing)
        # identity wall-clock under the UTC session timezone
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.readStream.schema(
        _EVENTS_SCHEMA_TMPL.format(ts_type="TIMESTAMP")
    ).parquet(landing)


def run_to_memory(
    result: DataFrame,
    name: str | None = None,
    output_mode: str = "complete",
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    memory sink and return the materialized table. Memory sink is a
    test/driver harness choice — production would writeStream to
    parquet/Kafka with the same trigger and checkpoint contract."""
    name = name or f"stream_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result.sparkSession.table(name)


def run_stream_upsert_latest(
    spark: SparkSession, sf_dir: str, copies: int = 2
) -> DataFrame:
    """STREAMING keyed-table maintenance: materialize "latest event per
    user" from an at-least-once event feed — the streaming MERGE INTO
    every CDC/serving pipeline runs. Each micro-batch is reduced to
    its per-key winner (max (ts, event_id) — ts alone is not a total
    order under replays), then merged into the maintained table with
    the same rule, so replays and out-of-order arrivals can never
    regress a key (an older version loses the (ts, event_id) compare
    no matter when it arrives; `copies=2` delivers every event twice
    across micro-batch boundaries to prove it).

    The maintained state lives as a localCheckpoint'd DataFrame —
    keys-sized by construction (one row per user). Production swaps
    that for Delta/Iceberg MERGE or alternating compacted parquet
    generations with identical merge semantics; the checkpointed
    stream gives exactly-once batch application either way.
    `stream_upsert_latest_parity` proves the final table equals the
    batch answer over the deduplicated feed."""
    from pyspark.sql.window import Window

    stream = read_event_stream(spark, sf_dir, copies=copies)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )

    state: dict[str, DataFrame | None] = {"table": None}

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        cur = state["table"]
        merged = latest if cur is None else cur.unionByName(latest)
        merged = (
            merged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # eager materialization: the maintained table must not chain
        # lineage across micro-batches (plan doubles per batch), and
        # must survive the batch_df going out of scope
        state["table"] = merged.localCheckpoint()

    ckpt = tempfile.mkdtemp(prefix="upsert_stream_ckpt_")
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    out = state["table"]
    if out is None:  # survives python -O (r10 hardening)
        raise AssertionError("stream delivered no micro-batches")
    return out


_DOCS_SCHEMA = "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"


def read_document_stream(
    spark: SparkSession, sf_dir: str, copies: int = 1
) -> DataFrame:
    """File stream over the documents corpus — the crawl-landing
    directory shape. `copies > 1` stages the same parquet N times AND
    pins maxFilesPerTrigger=1, so every document is redelivered in a
    DIFFERENT micro-batch: the at-least-once worst case a streaming
    curation stage must absorb."""
    src = os.path.join(sf_dir, "documents.parquet")
    landing = tempfile.mkdtemp(prefix="docs_stream_")
    for i in range(copies):
        os.symlink(src, os.path.join(landing, f"documents_{i}.parquet"))
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    # The caller owns cleanup: symlink staging dirs would otherwise
    # leak one tempdir per bench/oracle invocation.
    return stream, landing


def run_stream_curation_ingest(
    spark: SparkSession,
    sf_dir: str,
    augment,
    quality_min: float,
    copies: int = 2,
) -> DataFrame:
    """STREAMING curation ingest — the continuous form of the batch
    curation pipeline, chained per micro-batch inside foreachBatch:

        plant PII (test harness) → redact → quality score → threshold
        gate → content-hash exact dedup → first-writer-per-hash merge
        into the maintained accepted-corpus table.

    Every stage is ORDER-INDEPENDENT by construction: redaction and
    scoring are row-local; the dedup winner rule is min(doc_id) per
    content hash, which commutes across micro-batch boundaries and is
    idempotent under redelivery (`copies=2` delivers every document
    twice in different micro-batches to prove it). That is the design
    rule for streaming curation at 100 TB: any stage whose output
    depends on arrival order cannot be replay-proof. State is one row
    per accepted content hash (the accepted-corpus table itself),
    maintained exactly like run_stream_upsert_latest — per-batch
    reduce, merge with the same rule, localCheckpoint to cut lineage.
    `stream_curation_ingest_parity` proves the final table equals the
    one-shot batch pipeline over the clean feed."""
    from multi_search_retrival_big_data_spark.operators import curation, dedup
    from multi_search_retrival_big_data_spark.operators import textanalysis as ta

    stream, landing = read_document_stream(spark, sf_dir, copies=copies)
    state: dict[str, DataFrame | None] = {"table": None}

    def _reduce(df: DataFrame) -> DataFrame:
        return df.groupBy("content_hash").agg(
            F.min("doc_id").alias("doc_id"), F.min("quality").alias("quality")
        )

    def _curate(batch_df: DataFrame, _batch_id: int) -> None:
        red = batch_df.select(
            "doc_id", curation.redact_pii(augment(batch_df)).alias("__red")
        )
        scored = ta.quality_features(red, "doc_id", "__red", keep_cols=("__red",))
        ok = scored.filter(F.col("quality") >= quality_min).select(
            "doc_id",
            "quality",
            dedup.content_hash(F.col("__red")).alias("content_hash"),
        )
        batch_win = _reduce(ok)
        cur = state["table"]
        merged = batch_win if cur is None else _reduce(cur.unionByName(batch_win))
        state["table"] = merged.localCheckpoint()

    ckpt = tempfile.mkdtemp(prefix="curate_stream_ckpt_")
    q = (
        stream.writeStream.foreachBatch(_curate)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(landing, ignore_errors=True)
    out = state["table"]
    if out is None:  # survives python -O (r10 hardening)
        raise AssertionError("stream delivered no micro-batches")
    return out


_EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"


def read_embedding_stream(
    spark: SparkSession, sf_dir: str, copies: int = 2
) -> tuple[DataFrame, str]:
    """File stream over the embeddings corpus — the shape of an
    encoder-output landing directory (the reference's ingest notebooks
    drop .npy batches the same way, data_extraction/clip/clip.ipynb).
    `copies > 1` + maxFilesPerTrigger=1 redelivers every vector in a
    different micro-batch (at-least-once worst case). Caller owns
    cleanup of the returned landing dir."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    landing = tempfile.mkdtemp(prefix="emb_stream_")
    for i in range(copies):
        os.symlink(src, os.path.join(landing, f"embeddings_{i}.parquet"))
    stream = (
        spark.readStream.schema(_EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing)
    )
    return stream, landing


def run_stream_semantic_ingest(
    spark: SparkSession,
    sf_dir: str,
    threshold: float,
    copies: int = 2,
) -> DataFrame:
    """STREAMING SemDeDup ingest — continuous semantic dedup of an
    embedding feed against a growing corpus, per micro-batch inside
    foreachBatch:

        assign new vectors to the FROZEN trained quantizer's cells
        (pure per-vector projection) → first-writer-per-vec_id replay
        guard (anti-join on the maintained assignment) → probe the
        fresh rows' cells against the maintained assignment
        (dedup.semantic_delta_candidate_pairs) → merge verified pairs.

    Order-independence: a pair (x, y) is discovered exactly when the
    LATER of x, y arrives (the earlier one is already in the
    maintained assignment), and redelivered vectors are dropped by the
    anti-join before they can re-probe — so any arrival order and any
    at-least-once redelivery yields the same final pair set
    (`copies=2` delivers every vector twice across micro-batches to
    prove it). The maintained assignment is the in-memory stand-in for
    the persisted cid-partitioned table a production job appends to
    (index_store.ivf_assignments_incremental); pair state is
    pair-set-sized. `stream_semantic_ingest_parity` proves the final
    pair table equals the one-shot batch delta probe."""
    import shutil

    from multi_search_retrival_big_data_spark import index_store, tables
    from multi_search_retrival_big_data_spark.operators import dedup, kmeans

    base_f, (d1, d2) = index_store.incremental_split_filters(spark, sf_dir)
    delta_f = f"({d1}) OR ({d2})"
    cent_df, _ = index_store.ivf_trained(spark, sf_dir, iters=2)
    cents = [(r["cid"], r["cv"]) for r in cent_df.collect()]

    def assign(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id", "embedding", kmeans.assign_cid("embedding", cents).alias("cid")
        )

    emb = tables.load(spark, "embeddings", sf_dir)
    state: dict[str, DataFrame | None] = {
        "assign": assign(emb.filter(base_f)).localCheckpoint(),
        "pairs": None,
    }

    def _ingest(batch_df: DataFrame, _batch_id: int) -> None:
        fresh = assign(batch_df.filter(delta_f)).dropDuplicates(["vec_id"])
        cur = state["assign"]
        fresh = fresh.join(cur.select("vec_id"), "vec_id", "left_anti")
        merged = cur.unionByName(fresh).localCheckpoint()
        found = dedup.semantic_delta_candidate_pairs(
            merged, fresh.select("vec_id"), threshold
        )
        p = state["pairs"]
        merged_pairs = found if p is None else p.unionByName(found).distinct()
        state["pairs"] = merged_pairs.localCheckpoint()
        state["assign"] = merged

    stream, landing = read_embedding_stream(spark, sf_dir, copies=copies)
    ckpt = tempfile.mkdtemp(prefix="sem_stream_ckpt_")
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(landing, ignore_errors=True)
    out = state["pairs"]
    if out is None:  # survives python -O (r10 hardening)
        raise AssertionError("stream delivered no micro-batches")
    return out
