"""Result shaping — Q15 (group hits by video), Q18 (metadata
hydration). The presentation tail of every reference entry point:
hits → hydrate dims → group by parent entity → order groups by best
hit (utils/search_utils.py:62-93; app.py:119-131).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hydrate(
    hits: DataFrame,
    dim: DataFrame,
    id_col: str,
    attrs: list[str],
) -> DataFrame:
    """Q18 — attach dimension attributes to each hit; the INNER join
    silently drops hits whose id is missing from the dim, exactly the
    reference's `_gather_infos` skip-on-KeyError semantics
    (faiss_processing.py:61-82). The dim side is broadcast — it is the
    reference's whole-metadata-dict-in-RAM trick, minus the RAM."""
    hid = hits.columns[0]
    return hits.join(
        F.broadcast(dim.select(F.col(id_col).alias(hid), *attrs)), hid, "inner"
    )


def group_hits(
    hydrated: DataFrame,
    group_cols: list[str],
    id_col: str,
    score_col: str = "score",
    collect: bool = False,
) -> DataFrame:
    """Q15 — group hits per parent (video), rank groups by their best
    hit score (the reference sorts videos by first == best hit,
    search_utils.py:92). With collect=True also materializes the
    rank-ordered member list (groupBy → sort_array(collect_list));
    scalar mode keeps the oracle comparable."""
    aggs = [
        F.max(score_col).alias("best_score"),
        F.count("*").alias("hit_count"),
        # best_id = id of the best-scored hit, ties → smallest id
        F.expr(f"min_by({id_col}, struct(-{score_col}, {id_col}))").alias("best_id"),
    ]
    if collect:
        aggs.append(
            F.sort_array(
                F.collect_list(
                    F.struct((-F.col(score_col)).alias("ns"), F.col(id_col).alias("id"))
                )
            ).alias("members")
        )
    out = hydrated.groupBy(*group_cols).agg(*aggs)
    return out.orderBy(F.desc("best_score"), *[F.asc(c) for c in group_cols])


def quota_topk(
    hydrated: DataFrame,
    group_col: str,
    quota: int,
    k: int,
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """Diversified top-k: at most `quota` hits per parent entity
    (video/source) in the final ranking — the serving-side diversity
    rule result pages apply on top of Q15's grouping
    (search_utils.py:62-93 sorts videos by best hit; the quota keeps
    one video from monopolizing the page). Deterministic: per-group
    rank and the global tail both order by (score DESC, id ASC).

    Scale shape: the window is partitioned by the parent key over the
    REQUEST-SIZED candidate list (first-stage top-n), never the
    corpus; Spark plans the rank≤quota filter as WindowGroupLimit, so
    each group truncates to `quota` rows before the final ≤n-row
    sort."""
    w = Window.partitionBy(group_col).orderBy(F.desc(score_col), F.asc(id_col))
    return (
        hydrated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= quota)
        .drop("__rn")
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def rank_in_group(df: DataFrame, group_cols: list[str], score_col: str, id_col: str) -> DataFrame:
    """Per-group rank (best hit = 1) with deterministic ties."""
    w = Window.partitionBy(*group_cols).orderBy(F.desc(score_col), F.asc(id_col))
    return df.withColumn("rank", F.row_number().over(w))
