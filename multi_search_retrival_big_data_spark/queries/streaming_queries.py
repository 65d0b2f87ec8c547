"""Oracle-checked streaming/time-window queries over `events`.

`stream_*` entries execute REAL Structured Streaming plans —
readStream file source → windowed/stateful aggregation →
Trigger.AvailableNow → memory sink — and return the materialized
result, which the driver then verifies against batch DuckDB SQL. That
is the strongest check available for a streaming engine: the streaming
execution must converge to the batch answer.

`session_window_stats` runs the native session_window operator in
batch mode (its streaming mode needs append+watermark semantics that
cannot converge to a batch-equal answer within one trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.queries import query
from multi_search_retrival_big_data_spark.queries.common import sql_dsum
from multi_search_retrival_big_data_spark.streaming import ingest, stateful, windows

_DSUM_VALUE = sql_dsum("value")


@query(
    "stream_tumbling_event_counts",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n_events, {_DSUM_VALUE} AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type — executed as a real
    streaming query (file stream → window agg → AvailableNow → memory
    sink)."""
    stream = ingest.read_event_stream(spark, sf_dir)
    result = windows.tumbling_event_counts(stream, "1 hour")
    return ingest.run_to_memory(result, "tumbling_counts").orderBy(
        "window_start", "event_type"
    )


@query(
    "stream_sliding_event_counts",
    oracle=f"""
    WITH ev AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS tb, event_type, value FROM events
    )
    SELECT tb - CAST(o AS INTEGER) * INTERVAL '1 hour' AS window_start, event_type,
           count(*) AS n_events, {_DSUM_VALUE} AS total_value
    FROM ev, unnest(range(0, 2)) AS t(o)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def stream_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows hopping hourly (each event in exactly 2
    frames), as a real streaming execution. The oracle materializes the
    overlap by exploding each event into its two covering windows."""
    stream = ingest.read_event_stream(spark, sf_dir)
    result = windows.sliding_event_counts(stream, "2 hours", "1 hour")
    return ingest.run_to_memory(result, "sliding_counts").orderBy(
        "window_start", "event_type"
    )


@query(
    "session_window_stats",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, min(ts) AS session_start,
           count(*) AS n_events, {_DSUM_VALUE} AS total_value
    FROM s
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap-based session windows (30-min gap) via Spark's
    native session_window operator; the oracle is the classic
    gaps-and-islands formulation."""
    events = tables.load(spark, "events", sf_dir)
    return windows.session_event_stats(events, "30 minutes").orderBy(
        "user_id", "session_start"
    )


@query(
    "stream_stateful_user_counts",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS DECIMAL(38,0))) AS BIGINT)
             AS total_value_q
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running
    per-user counters in the streaming state store, run to completion —
    the emitted final state must equal the batch aggregate."""
    stream = ingest.read_event_stream(spark, sf_dir)
    result = stateful.running_user_counts(stream)
    return ingest.run_to_memory(result, "stateful_counts", output_mode="update").orderBy(
        "user_id"
    )


@query(
    "stream_attribution_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id, c.ts AS click_ts, p.ts AS purchase_ts, p.value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND c.ts <= p.ts
     AND c.ts >= p.ts - INTERVAL '30 minutes'
    ORDER BY click_id, purchase_id
    """,
)
def stream_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join executed as a REAL streaming query: two
    watermarked event streams joined on user + a bounded time range
    (click→purchase attribution), run to completion and verified
    against the batch interval join."""
    stream = ingest.read_event_stream(spark, sf_dir)
    clicks = stream.filter(stream["event_type"] == "click")
    purchases = stream.filter(stream["event_type"] == "purchase")
    result = windows.attribution_join(clicks, purchases)
    return ingest.run_to_memory(result, "attribution", output_mode="append").orderBy(
        "click_id", "purchase_id"
    )


@query(
    "stream_dedup_event_counts",
    oracle="""
    SELECT event_type, count(*) AS n_unique
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def stream_dedup_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once delivery: the landing
    directory stages the events file TWICE (every event delivered
    twice, across separate source files), and
    dropDuplicatesWithinWatermark(event_id) must collapse the
    redeliveries so the per-type counts equal the batch counts over
    the UNIQUE events — the idempotent-ingest contract of any
    replayed pipeline. State is bounded by the watermark horizon
    (1 hour of event-time per key), not by stream length."""
    stream = ingest.read_event_stream(spark, sf_dir, copies=2)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    from pyspark.sql import functions as F

    counts = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_unique"))
    return ingest.run_to_memory(counts, "dedup_counts").orderBy("event_type")


@query(
    "events_json_props_agg",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           min(CAST(json_extract(props, '$.k') AS INTEGER)) AS k_min,
           max(CAST(json_extract(props, '$.k') AS INTEGER)) AS k_max,
           CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured handling: the events `props` JSON column parsed
    with a typed schema (from_json → STRUCT) and aggregated — schema'd
    JSON parsing stays in the JVM (no Python), and at scale the parse
    cost amortizes into the scan stage."""
    from pyspark.sql import functions as F

    ev = tables.load(spark, "events", sf_dir)
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("p")
    ).select("event_type", F.col("p.k").alias("k"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "stream_upsert_latest_parity",
    oracle="""
    SELECT user_id, event_id AS last_event_id, value AS last_value
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def stream_upsert_latest_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE INTO proof: a keyed 'latest event per user'
    table maintained by a foreachBatch merge over a DOUBLE-DELIVERED
    event stream (every event arrives twice, across micro-batch
    boundaries) must equal the batch answer over the clean feed — the
    per-key (ts, event_id) compare makes replays and out-of-order
    arrivals no-ops (ingest.run_stream_upsert_latest). This is the
    CDC/serving materialization pattern; state is one row per key."""
    from pyspark.sql import functions as F

    out = ingest.run_stream_upsert_latest(spark, sf_dir, copies=2)
    return (
        out.select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


# --- streaming curation ingest ---------------------------------------------

_CURATE_QMIN = 0.5


def _stream_curation_oracle() -> str:
    from multi_search_retrival_big_data_spark.operators import curation
    from multi_search_retrival_big_data_spark.queries.curation_queries import _AUG_SQL
    from multi_search_retrival_big_data_spark.queries.text_queries import QUALITY_SQL

    email, ipv4, phone = (p for _, p, _ in curation.PII_PATTERNS)
    return rf"""
    WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t0 FROM documents),
    red AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(t0,
                 '{email}', '<EMAIL>', 'g'),
                 '{ipv4}', '<IP>', 'g'),
                 '{phone}', '<PHONE>', 'g') AS text
      FROM aug
    ),
    q AS (SELECT doc_id, text, {QUALITY_SQL} AS quality FROM red),
    ok AS (
      SELECT doc_id, quality,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS content_hash
      FROM q WHERE quality >= {_CURATE_QMIN}
    )
    SELECT content_hash, min(doc_id) AS doc_id, min(quality) AS quality
    FROM ok GROUP BY content_hash
    ORDER BY content_hash
    """


@query("stream_curation_ingest_parity", oracle=_stream_curation_oracle())
def stream_curation_ingest_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING curation ingest proof: the continuous pipeline —
    plant PII (harness) → redact → quality score → ≥{_CURATE_QMIN}
    gate → content-hash dedup → first-writer-per-hash merge — run as a
    REAL Structured Streaming job (ingest.run_stream_curation_ingest)
    over a DOUBLE-DELIVERED document feed with one file per
    micro-batch, must equal the one-shot batch pipeline over the clean
    feed (this oracle). Every stage is order-independent (row-local
    transforms + a commuting min-merge), which is the design rule that
    makes streaming curation replay-proof; the maintained state IS the
    accepted-corpus table, one row per content hash."""
    from multi_search_retrival_big_data_spark.queries.curation_queries import (
        _aug_spark,
    )

    out = ingest.run_stream_curation_ingest(
        spark, sf_dir, lambda df: _aug_spark(), _CURATE_QMIN, copies=2
    )
    return out.select("content_hash", "doc_id", "quality").orderBy("content_hash")


# ---- streaming SemDeDup ingest (embedding feed vs growing corpus) ----------

from pyspark.sql import functions as F  # noqa: E402

from multi_search_retrival_big_data_spark.queries.pipeline_queries import (  # noqa: E402
    _SEM_MODEL_CTES,
    _sem_cos,
    SEMANTIC_DUP_THRESHOLD,
)
from multi_search_retrival_big_data_spark.queries.common import sql_det_round  # noqa: E402
from multi_search_retrival_big_data_spark.queries.kmeans_sql import KEM_CTE  # noqa: E402


@query(
    "stream_semantic_ingest_parity",
    oracle=f"""
    WITH {KEM_CTE},
    {_SEM_MODEL_CTES},
    t1 AS (SELECT CAST(floor(max(vec_id) * 0.6) AS BIGINT) AS v FROM embeddings),
    dpairs AS (
      SELECT least(a.vec_id, b.vec_id) AS id_a,
             greatest(a.vec_id, b.vec_id) AS id_b
      FROM tassign a
      JOIN tassign b ON a.cid = b.cid AND a.vec_id <> b.vec_id
      WHERE a.vec_id >= (SELECT v FROM t1)
      GROUP BY 1, 2
    ),
    verified AS (
      SELECT d.id_a, d.id_b,
             {sql_det_round(_sem_cos('ea.v', 'eb.v'))} AS cosine
      FROM dpairs d
      JOIN kem ea ON ea.vec_id = d.id_a
      JOIN kem eb ON eb.vec_id = d.id_b
    )
    SELECT id_a, id_b, cosine FROM verified
    WHERE cosine >= {SEMANTIC_DUP_THRESHOLD}
    ORDER BY cosine DESC, id_a, id_b
    """,
)
def stream_semantic_ingest_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING SemDeDup ingest parity: the delta corpus slice arrives
    as a real file stream with every vector delivered TWICE in
    different micro-batches (at-least-once worst case); each batch
    assigns under the frozen quantizer, replay-guards on vec_id, and
    probes only the fresh rows' cells
    (ingest.run_stream_semantic_ingest). The double-delivered stream's
    final pair table must equal the one-shot batch delta probe — the
    same oracle as dedup_semantic_delta_pairs, so stream ≡ batch ≡
    full recompute close the triangle."""
    out = ingest.run_stream_semantic_ingest(
        spark, sf_dir, SEMANTIC_DUP_THRESHOLD, copies=2
    )
    return out.orderBy(F.desc("cosine"), "id_a", "id_b")
