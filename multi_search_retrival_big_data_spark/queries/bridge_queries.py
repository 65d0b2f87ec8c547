"""Oracle-checked bridge queries (SURVEY.md §2 S6/S7, Q10/Q11) mapped
onto the `events` table: 'click' events play the keyframe/shot side,
'purchase' events the scored audio-segment side, `user_id` the video
grouping key — the same interval-overlap → bridge → propagate-scores
dataflow the reference runs between VAD segments and shots."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.operators import bridges
from multi_search_retrival_big_data_spark.queries import query

WINDOW_MIN = 10  # interval length in minutes for both sides

_INTERVALS = f"""
    clicks AS (
      SELECT event_id AS click_id, user_id, ts AS cs, ts + INTERVAL {WINDOW_MIN} MINUTE AS ce
      FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, value, ts AS ps,
             ts + INTERVAL {WINDOW_MIN} MINUTE AS pe
      FROM events WHERE event_type = 'purchase'
    ),
    bridge AS (
      SELECT c.click_id, p.purchase_id, p.value
      FROM clicks c JOIN purchases p
        ON c.user_id = p.user_id AND c.cs < p.pe AND c.ce > p.ps
    )"""


def _click_purchase_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = tables.load(spark, "events", sf_dir)
    dur = F.expr(f"INTERVAL {WINDOW_MIN} MINUTES")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("cs"),
        (F.col("ts") + dur).alias("ce"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        "value",
        F.col("ts").alias("ps"),
        (F.col("ts") + dur).alias("pe"),
    )
    return clicks, purchases


def _bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    clicks, purchases = _click_purchase_frames(spark, sf_dir)
    joined = bridges.interval_join(
        clicks,
        purchases.withColumnRenamed("p_user_id", "user_id"),
        l_start="cs",
        l_end="ce",
        r_start="ps",
        r_end="pe",
        keys=["user_id"],
        bucket_seconds=WINDOW_MIN * 60,
    )
    return joined.select("click_id", "purchase_id", "value")


@query(
    "bridge_interval_join",
    oracle=f"""
    WITH {_INTERVALS}
    SELECT click_id, purchase_id FROM bridge
    ORDER BY click_id, purchase_id
    """,
)
def bridge_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — overlap join building the seg↔keyframe bridge
    (data_preparation.ipynb cell 14). The Spark side runs the
    *bucketed* equi-join strategy (time buckets of one window length),
    the oracle the naive range join — identical pair sets prove the
    dedup-by-anchor-bucket trick correct."""
    return _bridge(spark, sf_dir).select("click_id", "purchase_id").orderBy(
        "click_id", "purchase_id"
    )


@query(
    "bridge_propagate_scores",
    oracle=f"""
    WITH {_INTERVALS},
    prop AS (
      SELECT click_id,
             CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS score
      FROM bridge GROUP BY 1
    )
    SELECT click_id, score FROM prop
    ORDER BY score DESC, click_id
    LIMIT 100
    """,
)
def bridge_propagate_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — asr_post_processing (faiss_processing.py:176-192): scored
    purchases fan out to every bridged click, summing where a click is
    bridged from several purchases."""
    b = _bridge(spark, sf_dir)
    scores = b.select(F.col("purchase_id"), F.col("value").alias("score")).distinct()
    bridge_only = b.select("purchase_id", "click_id")
    return bridges.propagate_scores(
        scores, bridge_only, score_key="purchase_id", target_key="click_id", k=100
    )


@query(
    "bridge_subset_reverse",
    oracle=f"""
    WITH {_INTERVALS},
    allowed AS (SELECT event_id AS click_id FROM events
                WHERE event_type = 'click' AND user_id % 3 = 0),
    cand AS (SELECT DISTINCT b.purchase_id, b.value FROM bridge b
             WHERE b.click_id IN (SELECT click_id FROM allowed)),
    prop AS (
      SELECT b.click_id,
             CAST(SUM(CAST(FLOOR(c.value * 1e6 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e6 AS score
      FROM bridge b JOIN cand c ON b.purchase_id = c.purchase_id
      WHERE b.click_id IN (SELECT click_id FROM allowed)
      GROUP BY 1
    )
    SELECT click_id, score FROM prop
    ORDER BY score DESC, click_id
    LIMIT 50
    """,
)
def bridge_subset_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 — asr_retrieval_helper (faiss_processing.py:194-231): an
    allowed target subset inverts the bridge into a candidate source
    set; candidates are scored and propagated back through the bridge,
    restricted to the allowed targets."""
    ev = tables.load(spark, "events", sf_dir)
    allowed = ev.filter(
        (F.col("event_type") == "click") & (F.col("user_id") % 3 == 0)
    ).select(F.col("event_id").alias("click_id"))
    b = _bridge(spark, sf_dir)
    bridge_only = b.select("purchase_id", "click_id")
    cand = bridges.subset_candidates_via_bridge(
        allowed, bridge_only, score_key="purchase_id", target_key="click_id"
    )
    scores = (
        b.select("purchase_id", F.col("value").alias("score"))
        .distinct()
        .join(cand, "purchase_id", "left_semi")
    )
    restricted = bridge_only.join(allowed, "click_id", "left_semi")
    return bridges.propagate_scores(
        scores, restricted, score_key="purchase_id", target_key="click_id", k=50
    )


@query(
    "bridge_nearest_asof",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS purchase_id, user_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS click_id, user_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT p.purchase_id, c.click_id,
             row_number() OVER (
               PARTITION BY p.purchase_id
               ORDER BY abs(epoch_us(p.pts) - epoch_us(c.cts)), c.click_id
             ) AS rn
      FROM purchases p JOIN clicks c ON p.user_id = c.user_id
    )
    SELECT purchase_id, click_id, rn FROM ranked WHERE rn <= 2
    ORDER BY purchase_id, rn
    """,
)
def bridge_nearest_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — the 2-nearest-centers as-of match (data_preparation.ipynb
    cells 25-26 `find_nearest`): per purchase, the 2 clicks of the
    same user with nearest timestamps, ties → smaller click id."""
    ev = tables.load(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("ts").alias("pts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("cts"),
    )
    out = bridges.nearest_neighbors_join(
        purchases,
        clicks,
        l_point="pts",
        r_point="cts",
        n=2,
        keys=["user_id"],
        l_id="purchase_id",
        r_id="click_id",
        rank_col="rn",
    )
    return out.select("purchase_id", "click_id", "rn").orderBy("purchase_id", "rn")
