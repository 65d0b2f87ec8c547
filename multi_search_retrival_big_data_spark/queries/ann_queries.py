"""Oracle-checked ANN / embedding near-dup queries over `embeddings`
(operators/ann.py). The hyperplane literals are generated once in
Python (md5-derived ±1 components) and embedded in BOTH the Spark plan
and the oracle SQL, so both engines bucket identically; dot products
are sequential double folds on both sides (bit-identical)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import index_store, tables
from multi_search_retrival_big_data_spark.operators import ann
from multi_search_retrival_big_data_spark.queries import query
from multi_search_retrival_big_data_spark.queries.common import (
    EMB_DIM,
    QUERY_VEC,
    dsum,
    grid_hits,
    grid_row,
    sql_det_round,
    sql_dsum,
    sql_vec,
    union_rows,
)

COSINE_DUP_THRESHOLD = 0.45

_PLANES = ann.hyperplanes(EMB_DIM, ann.NUM_PLANES)
_QSIG = ann.signature_of(QUERY_VEC, _PLANES)
_ROWS = ann.NUM_PLANES // ann.ANN_BANDS

_V = "CAST(embedding AS DOUBLE[])"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


def _sig_sql(vec_expr: str) -> str:
    cases = ", ".join(
        f"CASE WHEN list_dot_product({vec_expr}, {sql_vec(p)}) >= 0 THEN '1' ELSE '0' END"
        for p in _PLANES
    )
    return f"concat({cases})"


def _band_filter_sql() -> str:
    return " OR ".join(
        f"substring(s, {b * _ROWS + 1}, {_ROWS}) = '{qband}'"
        for b, qband in ann.query_bands(_QSIG)
    )


@query(
    "ann_lsh_topk_cosine",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    )
    SELECT vec_id, {sql_det_round(_cos_sql("v", sql_vec(QUERY_VEC)))} AS score
    FROM sig
    WHERE {_band_filter_sql()}
    ORDER BY score DESC, vec_id
    LIMIT 50
    """,
)
def ann_lsh_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: hyperplane-LSH band probe + exact cosine rank within
    the candidate bucket union — the scale path for Q1 when an exact
    full scan is too expensive. The banding is read from the persisted
    (band, bval)-partitioned table (index_store.emb_lsh_bands), so the
    probe is partition pruning, not a per-query signature pass."""
    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    return ann.ann_lsh_topk(emb, QUERY_VEC, k=50, round_to=6, banded=banded)


def _near_dup_tail(pair_src: str, threshold: float) -> str:
    r = sql_det_round(_cos_sql("va", "vb"))
    return f"""
    SELECT id_a, id_b, {r} AS cosine
    FROM {pair_src}
    WHERE {r} >= {threshold}
    ORDER BY cosine DESC, id_a, id_b"""


@query(
    "emb_near_dup_exact",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_V.replace('embedding', 'a.embedding')} AS va,
             {_V.replace('embedding', 'b.embedding')} AS vb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    {_near_dup_tail("pairs", COSINE_DUP_THRESHOLD)}
    """,
)
def emb_near_dup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs embedding near-duplicate mining (ground truth /
    audit path; quadratic — use the LSH variant at scale)."""
    emb = tables.load(spark, "embeddings", sf_dir)
    return (
        ann.embedding_near_dup_pairs(
            emb, COSINE_DUP_THRESHOLD, use_lsh=False, round_to=6
        )
        .orderBy(F.desc("cosine"), "id_a", "id_b")
    )


@query(
    "emb_near_dup_lsh",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    ),
    banded AS (
      SELECT vec_id, v, CAST(b AS INTEGER) AS band,
             substring(s, CAST(b AS INTEGER) * {_ROWS} + 1, {_ROWS}) AS bval
      FROM sig, unnest(range(0, {ann.ANN_BANDS})) AS t(b)
    ),
    pairs AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
    )
    {_near_dup_tail("pairs", COSINE_DUP_THRESHOLD)}
    """,
)
def emb_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-pruned embedding near-duplicate mining: candidate pairs
    share ≥1 signature band (equi-join, no cross join), then exact
    cosine ≥ threshold — scored via the Arrow/NumPy strategy (one
    vectorized pass per candidate batch; ~1.6× the expression fold at
    sf0.1, the pair list being candidate-volume bound). Candidate
    generation reads the persisted banding table
    (index_store.emb_lsh_bands) — no per-run signature pass."""
    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    return (
        ann.embedding_near_dup_pairs(
            emb, COSINE_DUP_THRESHOLD, dim=EMB_DIM, use_lsh=True, round_to=6,
            strategy="arrow", banded=banded,
        )
        .orderBy(F.desc("cosine"), "id_a", "id_b")
    )


@query(
    "emb_near_dup_delta",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    ),
    banded AS (
      SELECT vec_id, CAST(b AS INTEGER) AS band,
             substring(s, CAST(b AS INTEGER) * {_ROWS} + 1, {_ROWS}) AS bval
      FROM sig, unnest(range(0, {ann.ANN_BANDS})) AS t(b)
    ),
    pairs AS (
      SELECT DISTINCT least(a.vec_id, b.vec_id) AS id_a,
             greatest(a.vec_id, b.vec_id) AS id_b
      FROM banded a
      JOIN banded b ON a.band = b.band AND a.bval = b.bval
                   AND a.vec_id <> b.vec_id
      WHERE a.vec_id % 5 = 0
    ),
    pv AS (
      SELECT p.id_a, p.id_b,
             CAST(ea.embedding AS DOUBLE[]) AS va,
             CAST(eb.embedding AS DOUBLE[]) AS vb
      FROM pairs p
      JOIN embeddings ea ON ea.vec_id = p.id_a
      JOIN embeddings eb ON eb.vec_id = p.id_b
    )
    {_near_dup_tail("pv", COSINE_DUP_THRESHOLD)}
    """,
)
def emb_near_dup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING near-dup mining: a delta batch (vec_id %
    5 = 0 plays the newly-ingested vectors) probes the persisted
    (band, bval)-partitioned banding table instead of re-running the
    corpus band self-join — the embedding sibling of
    dedup_delta_batch_pairs. Cost is O(|delta| × band collision
    rate) reads at the delta's partition keys; candidates with ≥1
    delta member are then exact-cosine verified through the shared
    Arrow pair scorer (ann.score_pairs_arrow — the same vectorized
    pass the full mining path uses, so the probe is never slower per
    pair than the path it replaces). The oracle derives the SAME
    delta-touching pair set from a full banding, proving the
    probe ≡ full-self-join-restricted equivalence."""
    from multi_search_retrival_big_data_spark.operators import dedup as _dedup

    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir).select(
        "vec_id", "band", F.col("bval").alias("bucket")
    )
    delta_ids = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id")
    cand = _dedup.lsh_delta_candidate_pairs(banded, delta_ids, "vec_id")
    return ann.score_pairs_arrow(
        emb, cand, COSINE_DUP_THRESHOLD, round_to=6
    ).orderBy(F.desc("cosine"), "id_a", "id_b")


_STRIDE = ann.IVF_CENTROID_STRIDE
_NPROBE = ann.IVF_NPROBE


def _l2_sql(a: str, b: str) -> str:
    return f"list_distance({a}, {b})"


@query(
    "ann_ivf_topk_cosine",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, {_V} AS cv FROM embeddings WHERE vec_id % {_STRIDE} = 0
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('c.cv', 'CAST(e.embedding AS DOUBLE[])')}, c.cid
               ) AS rn
        FROM embeddings e, cent c
      ) WHERE rn = 1
    ),
    probed AS (
      SELECT cid FROM cent
      ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))}, cid
      LIMIT {_NPROBE}
    ),
    cand AS (
      SELECT a.vec_id FROM assign a JOIN probed p USING (cid)
    )
    SELECT e.vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
    FROM embeddings e JOIN cand c USING (vec_id)
    ORDER BY score DESC, e.vec_id
    LIMIT 50
    """,
)
def ann_ivf_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN query path: nprobe=2 cell probe against the
    PRECOMPUTED, cid-partitioned inverted lists (index_store), exact
    cosine rank within the probed cells — the FAISS IndexIVFFlat
    search dataflow as DataFrame joins, with the quantizer assignment
    built once at ingest, never in the query plan."""
    emb = tables.load(spark, "embeddings", sf_dir)
    assign = index_store.ivf_assignments(spark, sf_dir)
    return ann.ann_ivf_topk(emb, QUERY_VEC, k=50, round_to=6, assign=assign)


@query(
    "ann_ivf_filtered_topk",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, {_V} AS cv FROM embeddings WHERE vec_id % {_STRIDE} = 0
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('c.cv', 'CAST(e.embedding AS DOUBLE[])')}, c.cid
               ) AS rn
        FROM embeddings e, cent c
      ) WHERE rn = 1
    ),
    probed AS (
      SELECT cid FROM cent
      ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))}, cid
      LIMIT {_NPROBE}
    ),
    cand AS (
      SELECT a.vec_id FROM assign a JOIN probed p USING (cid)
      WHERE a.vec_id IN (SELECT vec_id FROM embeddings WHERE label % 3 = 0)
    )
    SELECT e.vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
    FROM embeddings e JOIN cand c USING (vec_id)
    ORDER BY score DESC, e.vec_id
    LIMIT 50
    """,
)
def ann_ivf_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search through the IVF index: top-k among only
    the vectors passing a metadata predicate (label % 3 = 0), with the
    allowed-id semi-join applied AFTER the nprobe cell prune and
    BEFORE the exact-cosine rank — the plan still reads nprobe/nlist
    of the cid-partitioned inverted lists, then ranks only the allowed
    rows inside them. The IVF sibling of ann_pq_filtered_topk: every
    ANN serving path here has a filtered mode, because a vector store
    that post-filters its top-k starves under selective predicates."""
    emb = tables.load(spark, "embeddings", sf_dir)
    assign = index_store.ivf_assignments(spark, sf_dir)
    allowed = emb.filter(F.col("label") % 3 == 0).select("vec_id")
    return ann.ann_ivf_topk(
        emb, QUERY_VEC, k=50, round_to=6, assign=assign, subset=allowed
    )


_RECALL_K = 50


@query(
    "ann_recall_at_k",
    oracle=f"""
    WITH exact AS (
      SELECT vec_id FROM (
        SELECT vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
        FROM embeddings ORDER BY score DESC, vec_id LIMIT {_RECALL_K})
    ),
    sig AS (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    ),
    lsh AS (
      SELECT vec_id FROM (
        SELECT vec_id, {sql_det_round(_cos_sql("v", sql_vec(QUERY_VEC)))} AS score
        FROM sig WHERE {_band_filter_sql()}
        ORDER BY score DESC, vec_id LIMIT {_RECALL_K})
    ),
    cent AS (
      SELECT vec_id AS cid, {_V} AS cv FROM embeddings WHERE vec_id % {_STRIDE} = 0
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('c.cv', 'CAST(e.embedding AS DOUBLE[])')}, c.cid
               ) AS rn
        FROM embeddings e, cent c
      ) WHERE rn = 1
    ),
    probed AS (
      SELECT cid FROM cent
      ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))}, cid
      LIMIT {_NPROBE}
    ),
    ivf AS (
      SELECT vec_id FROM (
        SELECT e.vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
        FROM embeddings e
        JOIN (SELECT a.vec_id FROM assign a JOIN probed p USING (cid)) c USING (vec_id)
        ORDER BY score DESC, e.vec_id LIMIT {_RECALL_K})
    )
    SELECT 'ivf' AS method, {_RECALL_K} AS k, count(*) AS hits,
           CAST(count(*) AS DOUBLE) / CAST({_RECALL_K} AS DOUBLE) AS recall
    FROM ivf JOIN exact USING (vec_id)
    UNION ALL
    SELECT 'lsh', {_RECALL_K}, count(*),
           CAST(count(*) AS DOUBLE) / CAST({_RECALL_K} AS DOUBLE)
    FROM lsh JOIN exact USING (vec_id)
    ORDER BY method
    """,
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metric for the approximate paths: recall@k of the LSH
    band-probe and IVF cell-probe ANN variants against the exact
    brute-force top-k ground truth (the audit every production ANN
    deployment runs before trading exactness for speed — FAISS's own
    recall-vs-nprobe methodology applied to our DataFrame ANN).

    One row per method: (method, k, hits, recall). The exact list, the
    approximate lists, and the intersection are all computed inside the
    one plan — at scale this runs as a periodic sampled audit job, the
    same dataflow with a sampled query set."""
    from multi_search_retrival_big_data_spark.operators import dense

    emb = tables.load(spark, "embeddings", sf_dir)
    exact = dense.topk_cosine(emb, QUERY_VEC, k=_RECALL_K, round_to=6).select("vec_id")

    def hits_row(approx: DataFrame, method: str) -> DataFrame:
        return grid_row(_RECALL_K, grid_hits(approx, exact), method=method)

    assign = index_store.ivf_assignments(spark, sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    ivf = ann.ann_ivf_topk(emb, QUERY_VEC, k=_RECALL_K, round_to=6, assign=assign)
    lsh = ann.ann_lsh_topk(emb, QUERY_VEC, k=_RECALL_K, round_to=6, banded=banded)
    return hits_row(ivf, "ivf").union(hits_row(lsh, "lsh")).orderBy("method")


def _band_filter_sql_for(bands: int) -> str:
    rows = ann.NUM_PLANES // bands
    return " OR ".join(
        f"substring(s, {b * rows + 1}, {rows}) = '{qband}'"
        for b, qband in ann.query_bands(_QSIG, bands, rows)
    )


_GRID_BANDS = (2, 4, 8)


def _grid_cfg_sql(bands: int) -> str:
    f = _band_filter_sql_for(bands)
    return f"""
    SELECT {bands} AS bands, {_RECALL_K} AS k,
           (SELECT count(*) FROM sig WHERE {f}) AS candidates,
           (SELECT count(*) FROM (
              SELECT vec_id FROM (
                SELECT vec_id, {sql_det_round(_cos_sql("v", sql_vec(QUERY_VEC)))} AS score
                FROM sig WHERE {f}
                ORDER BY score DESC, vec_id LIMIT {_RECALL_K}) t
              JOIN exact USING (vec_id)) h) AS hits"""


@query(
    "ann_lsh_recall_grid",
    oracle=f"""
    WITH exact AS (
      SELECT vec_id FROM (
        SELECT vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
        FROM embeddings ORDER BY score DESC, vec_id LIMIT {_RECALL_K})
    ),
    sig AS (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    ),
    grid AS (
      {" UNION ALL ".join(_grid_cfg_sql(b) for b in _GRID_BANDS)}
    )
    SELECT bands, k, candidates, hits,
           CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall
    FROM grid ORDER BY bands
    """,
)
def ann_lsh_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH tuning curve: recall@k AND candidate volume (= scan
    cost) of the band probe at several band widths over the same
    16-plane signature. Wider bands (more, shorter) probe more
    buckets → more candidates → higher recall; this query IS the
    recall-vs-cost grid a production rollout tunes `bands` against
    (the FAISS recall-vs-nprobe sweep for our hyperplane LSH).

    One row per config: (bands, k, candidates, hits, recall)."""
    from multi_search_retrival_big_data_spark.operators import dense

    emb = tables.load(spark, "embeddings", sf_dir)
    exact = dense.topk_cosine(emb, QUERY_VEC, k=_RECALL_K, round_to=6).select("vec_id")

    def cfg_row(bands: int) -> DataFrame:
        rows = ann.NUM_PLANES // bands
        planes = ann.hyperplanes(EMB_DIM, ann.NUM_PLANES)
        qsig = ann.signature_of(QUERY_VEC, planes)
        sig = emb.withColumn("__sig", ann.signature_bits("embedding", planes))
        cond = None
        for b, qband in ann.query_bands(qsig, bands, rows):
            c = F.substring(F.col("__sig"), b * rows + 1, rows) == F.lit(qband)
            cond = c if cond is None else cond | c
        cand = sig.filter(cond)
        n_cand = cand.agg(F.count("*").alias("candidates"))
        topk = ann.ann_lsh_topk(emb, QUERY_VEC, k=_RECALL_K, bands=bands, round_to=6)
        return grid_row(_RECALL_K, grid_hits(topk, exact), n_cand, bands=bands)

    return union_rows([cfg_row(b) for b in _GRID_BANDS]).orderBy("bands")


_IVF_GRID_NPROBE = (1, 2, 4)


def _ivf_grid_cfg_sql(nprobe: int) -> str:
    return f"""
    SELECT {nprobe} AS nprobe, {_RECALL_K} AS k,
           (SELECT count(*) FROM assign a
            JOIN (SELECT cid FROM cent ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))}, cid
                  LIMIT {nprobe}) p USING (cid)) AS candidates,
           (SELECT count(*) FROM (
              SELECT vec_id FROM (
                SELECT e.vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
                FROM embeddings e
                JOIN (SELECT a.vec_id FROM assign a
                      JOIN (SELECT cid FROM cent ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))}, cid
                            LIMIT {nprobe}) p USING (cid)) c USING (vec_id)
                ORDER BY score DESC, e.vec_id LIMIT {_RECALL_K}) t
              JOIN exact USING (vec_id)) h) AS hits"""


@query(
    "ann_ivf_recall_grid",
    oracle=f"""
    WITH exact AS (
      SELECT vec_id FROM (
        SELECT vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
        FROM embeddings ORDER BY score DESC, vec_id LIMIT {_RECALL_K})
    ),
    cent AS (
      SELECT vec_id AS cid, {_V} AS cv FROM embeddings WHERE vec_id % {_STRIDE} = 0
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('c.cv', 'CAST(e.embedding AS DOUBLE[])')}, c.cid
               ) AS rn
        FROM embeddings e, cent c
      ) WHERE rn = 1
    ),
    grid AS (
      {" UNION ALL ".join(_ivf_grid_cfg_sql(p) for p in _IVF_GRID_NPROBE)}
    )
    SELECT nprobe, k, candidates, hits,
           CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall
    FROM grid ORDER BY nprobe
    """,
)
def ann_ivf_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF tuning curve: recall@k AND candidate volume (= scan
    cost) of the cell probe at several nprobe settings, against the
    exact brute-force ground truth — FAISS's recall-vs-nprobe sweep
    run as one plan over the PRECOMPUTED inverted lists (the stored
    assignment table is read, never rebuilt; the oracle recomputes the
    quantizer from scratch, which doubles as a staleness check on the
    stored lists).

    One row per config: (nprobe, k, candidates, hits, recall)."""
    from multi_search_retrival_big_data_spark.operators import dense

    emb = tables.load(spark, "embeddings", sf_dir)
    assign = index_store.ivf_assignments(spark, sf_dir)
    exact = dense.topk_cosine(emb, QUERY_VEC, k=_RECALL_K, round_to=6).select("vec_id")

    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec

    def cfg_row(nprobe: int) -> DataFrame:
        probed = (
            ann.centroids(emb, stride=_STRIDE)
            .select("cid", l2_dist("__cv", lit_vec(QUERY_VEC)).alias("__d"))
            .orderBy(F.asc("__d"), F.asc("cid"))
            .limit(nprobe)
            .select("cid")
        )
        cand = assign.join(F.broadcast(probed), "cid")
        n_cand = cand.agg(F.count("*").alias("candidates"))
        topk = ann.ann_ivf_topk(
            emb, QUERY_VEC, k=_RECALL_K, nprobe=nprobe, round_to=6, assign=assign
        )
        return grid_row(_RECALL_K, grid_hits(topk, exact), n_cand, nprobe=nprobe)

    return union_rows([cfg_row(p) for p in _IVF_GRID_NPROBE]).orderBy("nprobe")


@query(
    "emb_label_centroid_norms",
    oracle="""
    WITH ex AS (
      SELECT label, CAST(i AS INT) AS dim,
             CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
    ),
    per_dim AS (
      SELECT label, dim,
             CAST(SUM(CAST(FLOOR(v * 1e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS s,
             count(*) AS n
      FROM ex GROUP BY label, dim
    ),
    mean AS (SELECT label, n, s / CAST(n AS DOUBLE) AS m FROM per_dim),
    agg AS (
      SELECT label, max(n) AS n_vecs,
             CAST(SUM(CAST(FLOOR(m * m * 1e12 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS ss
      FROM mean GROUP BY label
    )
    SELECT label, n_vecs,
           CAST(FLOOR(sqrt(ss) * 1e6 + 0.5) AS DOUBLE) / 1e6 AS centroid_norm
    FROM agg ORDER BY label
    """,
)
def emb_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (dense.label_centroid_norms) —
    the centroid-training building block behind IVF cells
    (faiss_processing.py:17-22 loads FAISS-trained centroids) and
    per-class corpus audits. Shuffle volume after the partial agg is
    labels × d rows regardless of corpus size; all float sums are
    quantized so the mean is order-independent (a plain float mean
    over a shuffled partitioning differs run to run)."""
    from multi_search_retrival_big_data_spark.operators import dense

    emb = tables.load(spark, "embeddings", sf_dir)
    return dense.label_centroid_norms(emb).orderBy("label")


# --- Product quantization (PQ/ADC) -----------------------------------------

_PQ_M, _PQ_KS, _PQ_STRIDE = ann.PQ_M, ann.PQ_KS, ann.PQ_STRIDE
_PQ_DSUB = EMB_DIM // _PQ_M
_PQ_K = 100
_PQ_RECALL_K = 20
_PQ_GRID_R = (50, 200)


def _pq_sub(expr: str, i: int) -> str:
    return f"{expr}[{i * _PQ_DSUB + 1}:{(i + 1) * _PQ_DSUB}]"


def _pq_ctes(stride: int = _PQ_STRIDE) -> str:
    """CTE chain: train → per-sub-space codebooks → per-sub-space
    argmin encodes → wide code table → per-sub-space query LUTs —
    mirroring ann.pq_codebook / pq_encode / ann_pq_adc_topk."""
    parts = [
        f"""train AS (
      SELECT CAST(vec_id // {stride} AS INT) AS code, {_V} AS v
      FROM embeddings
      WHERE vec_id % {stride} = 0 AND vec_id < {_PQ_KS * stride}
    )"""
    ]
    for i in range(_PQ_M):
        qsub = sql_vec(QUERY_VEC[i * _PQ_DSUB : (i + 1) * _PQ_DSUB])
        parts.append(
            f"cb{i} AS (SELECT code, {_pq_sub('v', i)} AS cv FROM train)"
        )
        parts.append(
            f"""e{i} AS (
      SELECT e.vec_id, c.code,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY (list_distance({_pq_sub(_V, i)}, c.cv)
                         * list_distance({_pq_sub(_V, i)}, c.cv)) ASC, c.code ASC
             ) AS rn
      FROM embeddings e CROSS JOIN cb{i} c
    )"""
        )
        parts.append(
            f"lut{i} AS (SELECT code, (list_distance(cv, {qsub}) * list_distance(cv, {qsub})) AS d FROM cb{i})"
        )
    joins = " ".join(
        f"JOIN e{i} ON e{i}.vec_id = e0.vec_id AND e{i}.rn = 1" for i in range(1, _PQ_M)
    )
    parts.append(
        f"""codes AS (
      SELECT e0.vec_id, {", ".join(f"e{i}.code AS c{i}" for i in range(_PQ_M))}
      FROM e0 {joins}
      WHERE e0.rn = 1
    )"""
    )
    dist = " + ".join(f"l{i}.d" for i in range(_PQ_M))
    lut_joins = " ".join(
        f"JOIN lut{i} l{i} ON codes.c{i} = l{i}.code" for i in range(_PQ_M)
    )
    parts.append(
        f"""adc AS (
      SELECT codes.vec_id, {sql_det_round(dist)} AS approx_dist
      FROM codes {lut_joins}
    )"""
    )
    return ",\n    ".join(parts)


@query(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH {_pq_ctes()}
    SELECT vec_id, approx_dist FROM adc
    ORDER BY approx_dist ASC, vec_id ASC LIMIT {_PQ_K}
    """,
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k (ann.ann_pq_adc_topk over the persisted
    index_store.pq_codes table): the query answers from M code bytes
    per vector — narrow code scan + M broadcast LUT joins + projection
    sum + TakeOrderedAndProject; no vector IO, no shuffle. The third
    ANN scale path after hyperplane LSH and IVF (FAISS IndexPQ;
    the reference stays exact-flat, faiss_processing.py:17-22)."""
    emb = tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    return ann.ann_pq_adc_topk(
        emb, codes, QUERY_VEC, k=_PQ_K, round_to=6,
        codebook=ann.pq_codebook(emb), literal_lut=True,
    )


@query(
    "ann_pq_filtered_topk",
    oracle=f"""
    WITH {_pq_ctes()}
    SELECT a.vec_id, a.approx_dist FROM adc a
    JOIN embeddings e ON e.vec_id = a.vec_id
    WHERE e.label % 3 = 0
    ORDER BY approx_dist ASC, a.vec_id ASC LIMIT {_PQ_K}
    """,
)
def ann_pq_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search through the PQ index: top-k among only
    the vectors passing a metadata predicate (label % 3 = 0) — the
    pre-filtered ANN mode every vector store serves (the reference's
    id-subset restriction, faiss_processing.py:154-166, generalized
    from an id list to a predicate). The allowed-id set semi-join
    prunes the code table BEFORE scoring, so the ADC scan shrinks with
    the predicate's selectivity instead of post-filtering a top-k that
    might starve. At 100 TB the filter column belongs IN the code
    table (one wider column at rest ⇒ the predicate pushes into the
    scan with no join at all); the semi-join form shown here is the
    layout-free fallback."""
    emb = tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    allowed = emb.filter(F.col("label") % 3 == 0).select("vec_id")
    codes_f = codes.join(allowed, "vec_id", "left_semi")
    return ann.ann_pq_adc_topk(
        emb, codes_f, QUERY_VEC, k=_PQ_K, round_to=6,
        codebook=ann.pq_codebook(emb), literal_lut=True,
    )


@query(
    "ann_pq_recall_grid",
    oracle=f"""
    WITH {_pq_ctes()},
    adc_ranked AS MATERIALIZED (
      SELECT vec_id, row_number() OVER (ORDER BY approx_dist ASC, vec_id ASC) AS rn
      FROM adc
    ),
    exact AS MATERIALIZED (
      SELECT vec_id FROM embeddings
      ORDER BY list_distance({_V}, {sql_vec(QUERY_VEC)}) ASC, vec_id ASC
      LIMIT {_PQ_RECALL_K}
    )
    {" UNION ALL ".join(
        f'''SELECT {r} AS r, {_PQ_RECALL_K} AS k,
               (SELECT count(*) FROM adc_ranked a JOIN exact x ON a.vec_id = x.vec_id
                WHERE a.rn <= {r}) AS hits,
               (SELECT count(*) FROM adc_ranked a JOIN exact x ON a.vec_id = x.vec_id
                WHERE a.rn <= {r}) / CAST({_PQ_RECALL_K} AS DOUBLE) AS recall'''
        for r in _PQ_GRID_R
    )}
    ORDER BY r
    """,
)
def ann_pq_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall-vs-candidate-count audit for the PQ path: for each
    shortlist size R, how many of the exact-L2 top-{k} survive in the
    ADC top-R — the measurement that governs a PQ rollout exactly as
    ann_lsh_recall_grid / ann_ivf_recall_grid govern theirs (two-stage
    PQ serving reranks the top-R shortlist exactly)."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec

    emb = tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    exact = (
        emb.select("vec_id", l2_dist("embedding", lit_vec(QUERY_VEC)).alias("__d"))
        .orderBy(F.asc("__d"), F.asc("vec_id"))
        .limit(_PQ_RECALL_K)
        .select("vec_id")
    )

    def cfg_row(r: int) -> DataFrame:
        cand = ann.ann_pq_adc_topk(emb, codes, QUERY_VEC, k=r, round_to=6).select(
            "vec_id"
        )
        return grid_row(_PQ_RECALL_K, grid_hits(cand, exact), r=r)

    return union_rows([cfg_row(r) for r in _PQ_GRID_R]).orderBy("r")


_PQ_MIX_SQL = " + ".join(f"{2 * i + 1} * c{i}" for i in range(1, _PQ_M))
# incremental-parity stride: training ids {0,16,...,240} must sit
# inside the 60% base slice of the 500-row driver corpus (the guard in
# index_store.pq_codes_incremental enforces exactly this precondition)
_PQ_INC_STRIDE = 16


@query(
    "index_incremental_pq_parity",
    oracle=f"""
    WITH {_pq_ctes(stride=_PQ_INC_STRIDE)}
    SELECT c0, count(*) AS n_vecs,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
           CAST(SUM({_PQ_MIX_SQL}) AS BIGINT) AS code_checksum
    FROM codes GROUP BY c0 ORDER BY c0
    """,
)
def index_incremental_pq_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental PQ maintenance proof (FAISS IndexPQ train/add as a
    bucketed append): codes built from the base corpus slice under the
    FROZEN stride codebook, delta slices APPENDED
    (index_store.pq_codes_incremental), then aggregated per leading
    code with a position-weighted code checksum (weights 3,5,7,… catch
    column swaps integer-exactly). The oracle re-derives the codebook
    and encodes EVERY vector from scratch — a hash match proves
    append ≡ rebuild for the code table and that the frozen codebook
    is bit-stable. Completes the incremental family for the PQ path
    next to LSH bands, IVF lists, and delta dedup."""
    base_f, (d1, d2) = index_store.incremental_split_filters(spark, sf_dir)
    t = index_store.pq_codes_incremental(
        spark, sf_dir, base_f, f"({d1}) OR ({d2})", stride=_PQ_INC_STRIDE
    )
    mix = None
    for i in range(1, _PQ_M):
        term = F.lit(2 * i + 1) * F.col(f"c{i}")
        mix = term if mix is None else mix + term
    return (
        t.groupBy("c0")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
            F.sum(mix).cast("bigint").alias("code_checksum"),
        )
        .orderBy("c0")
    )


_PQF_SELS = (("mod03", 3), ("mod10", 10))


@query(
    "ann_pq_filtered_recall_grid",
    oracle=f"""
    WITH {_pq_ctes()},
    {",".join(
        f'''
    alw_{s} AS (SELECT vec_id FROM embeddings WHERE label % {m} = 0),
    fadc_{s} AS MATERIALIZED (
      SELECT a.vec_id,
             row_number() OVER (ORDER BY a.approx_dist ASC, a.vec_id ASC) AS rn
      FROM adc a JOIN alw_{s} w ON w.vec_id = a.vec_id
    ),
    fex_{s} AS MATERIALIZED (
      SELECT e.vec_id FROM embeddings e JOIN alw_{s} w ON w.vec_id = e.vec_id
      ORDER BY list_distance({_V}, {sql_vec(QUERY_VEC)}) ASC, e.vec_id ASC
      LIMIT {_PQ_RECALL_K}
    )'''
        for s, m in _PQF_SELS
    )}
    {" UNION ALL ".join(
        f'''SELECT '{s}' AS sel, {r} AS r, {_PQ_RECALL_K} AS k,
               (SELECT count(*) FROM fadc_{s} a JOIN fex_{s} x ON a.vec_id = x.vec_id
                WHERE a.rn <= {r}) AS hits,
               (SELECT count(*) FROM fadc_{s} a JOIN fex_{s} x ON a.vec_id = x.vec_id
                WHERE a.rn <= {r}) / CAST({_PQ_RECALL_K} AS DOUBLE) AS recall'''
        for s, _m in _PQF_SELS
        for r in _PQ_GRID_R
    )}
    ORDER BY sel, r
    """,
)
def ann_pq_filtered_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall governance for FILTERED vector search — the
    selectivity × shortlist grid ann_pq_filtered_topk lacks: for each
    metadata predicate (label % 3 / % 10, ~33% / ~10% selective) and
    shortlist size R, how many of the exact filtered top-{k} survive
    in the pre-filter ADC top-R. Filtered ANN quietly loses recall at
    scale exactly here (a fixed R covers a shrinking fraction of the
    allowed set as predicates tighten), so the rollout gate must
    measure the interaction, not the unfiltered grid. Same plan shape
    per cell as ann_pq_filtered_topk: allowed-id semi-join BEFORE the
    ADC scan, then the exact filtered scan as ground truth."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec

    emb = tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    out = []
    for sel, mod in _PQF_SELS:
        allowed = emb.filter(F.col("label") % mod == 0).select("vec_id")
        exact = (
            emb.join(allowed, "vec_id", "left_semi")
            .select("vec_id", l2_dist("embedding", lit_vec(QUERY_VEC)).alias("__d"))
            .orderBy(F.asc("__d"), F.asc("vec_id"))
            .limit(_PQ_RECALL_K)
            .select("vec_id")
        )
        codes_f = codes.join(allowed, "vec_id", "left_semi")
        for r in _PQ_GRID_R:
            cand = ann.ann_pq_adc_topk(
                emb, codes_f, QUERY_VEC, k=r, round_to=6
            ).select("vec_id")
            out.append(grid_row(_PQ_RECALL_K, grid_hits(cand, exact), sel=sel, r=r))
    return union_rows(out).orderBy("sel", "r")


# --- Two-stage PQ: ADC shortlist → exact re-rank ---------------------------

_PQ_RERANK_K = 50
_PQ_RERANK_R = ann.PQ_RERANK_SHORTLIST
_PQ_RERANK_GRID_R = (50, 200, 400, 800)


@query(
    "ann_pq_rerank_topk",
    oracle=f"""
    WITH {_pq_ctes()},
    short AS (
      SELECT vec_id FROM adc ORDER BY approx_dist ASC, vec_id ASC LIMIT {_PQ_RERANK_R}
    )
    SELECT e.vec_id,
           {sql_det_round(f"list_distance({_V}, {sql_vec(QUERY_VEC)})")} AS dist
    FROM embeddings e JOIN short USING (vec_id)
    ORDER BY dist ASC, e.vec_id ASC LIMIT {_PQ_RERANK_K}
    """,
)
def ann_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEFAULT PQ serving query: ADC shortlist of {R} from the
    persisted code table (no vector IO), exact-L2 re-rank of the
    shortlist only (ann.ann_pq_rerank_topk) — recall@k becomes
    shortlist recall (see ann_pq_rerank_recall_grid) at the cost of
    |shortlist| exact distance folds instead of |corpus|."""
    emb = tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    return ann.ann_pq_rerank_topk(
        emb, codes, QUERY_VEC, k=_PQ_RERANK_K, shortlist=_PQ_RERANK_R, round_to=6,
        codebook=ann.pq_codebook(emb), literal_lut=True,
    )


@query(
    "ann_pq_rerank_recall_grid",
    oracle=f"""
    WITH {_pq_ctes()},
    adc_ranked AS MATERIALIZED (
      SELECT vec_id, row_number() OVER (ORDER BY approx_dist ASC, vec_id ASC) AS rn
      FROM adc
    ),
    exact AS MATERIALIZED (
      SELECT vec_id FROM embeddings
      ORDER BY list_distance({_V}, {sql_vec(QUERY_VEC)}) ASC, vec_id ASC
      LIMIT {_PQ_RERANK_K}
    )
    {" UNION ALL ".join(
        f'''SELECT {r} AS shortlist, {_PQ_RERANK_K} AS k,
               (SELECT count(*) FROM adc_ranked a JOIN exact x ON a.vec_id = x.vec_id
                WHERE a.rn <= {r}) AS hits,
               (SELECT count(*) FROM adc_ranked a JOIN exact x ON a.vec_id = x.vec_id
                WHERE a.rn <= {r}) / CAST({_PQ_RERANK_K} AS DOUBLE) AS recall'''
        for r in _PQ_RERANK_GRID_R
    )}
    ORDER BY shortlist
    """,
)
def ann_pq_rerank_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the two-stage PQ query per shortlist size — since
    the second stage re-ranks exactly, recall@k IS the shortlist's
    coverage of the exact top-k, so this grid directly prices the
    shortlist-size knob (the FAISS `k_factor` sweep for IndexRefineFlat).
    One row per config: (shortlist, k, hits, recall)."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec

    emb = tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    exact = (
        emb.select("vec_id", l2_dist("embedding", lit_vec(QUERY_VEC)).alias("__d"))
        .orderBy(F.asc("__d"), F.asc("vec_id"))
        .limit(_PQ_RERANK_K)
        .select("vec_id")
    )

    def cfg_row(r: int) -> DataFrame:
        # round_to=None: the re-rank must order by the RAW distance here
        # so its top-k equals shortlist∩exact-top-k set-wise (the oracle
        # counts shortlist membership); 1e-6-rounded ties at the k
        # boundary could otherwise swap one boundary member by id
        reranked = ann.ann_pq_rerank_topk(
            emb, codes, QUERY_VEC, k=_PQ_RERANK_K, shortlist=r,
            round_to=None, shortlist_round_to=6,
        ).select("vec_id")
        return grid_row(_PQ_RERANK_K, grid_hits(reranked, exact), shortlist=r)

    return union_rows([cfg_row(r) for r in _PQ_RERANK_GRID_R]).orderBy("shortlist")


# --- Lloyd-trained quantizers (operators/kmeans.py, kmeans_sql.py) ---------

from multi_search_retrival_big_data_spark.queries.kmeans_sql import (  # noqa: E402
    KEM_CTE,
    ivf_lloyd_ctes,
    pq_lloyd_ctes,
)

_KM_ITERS = 2

_IVF_TRAIN_CTES, _IVF_TRAIN_FINAL = ivf_lloyd_ctes(_STRIDE, EMB_DIM, _KM_ITERS)


def _ivf_trained_grid_cfg_sql(nprobe: int) -> str:
    return f"""
    SELECT {nprobe} AS nprobe, {_RECALL_K} AS k,
           (SELECT count(*) FROM tassign a
            JOIN (SELECT cid FROM tcent ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))}, cid
                  LIMIT {nprobe}) p USING (cid)) AS candidates,
           (SELECT count(*) FROM (
              SELECT vec_id FROM (
                SELECT e.vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
                FROM embeddings e
                JOIN (SELECT a.vec_id FROM tassign a
                      JOIN (SELECT cid FROM tcent ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))}, cid
                            LIMIT {nprobe}) p USING (cid)) c USING (vec_id)
                ORDER BY score DESC, e.vec_id LIMIT {_RECALL_K}) t
              JOIN exact USING (vec_id)) h) AS hits"""


@query(
    "ann_ivf_trained_recall_grid",
    oracle=f"""
    WITH {KEM_CTE},
    {_IVF_TRAIN_CTES},
    tcent AS MATERIALIZED (SELECT cid, cv FROM {_IVF_TRAIN_FINAL}),
    tassign AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv) ASC, c.cid ASC
               ) AS rn
        FROM kem e CROSS JOIN tcent c
      ) WHERE rn = 1
    ),
    exact AS (
      SELECT vec_id FROM (
        SELECT vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
        FROM embeddings ORDER BY score DESC, vec_id LIMIT {_RECALL_K})
    ),
    grid AS (
      {" UNION ALL ".join(_ivf_trained_grid_cfg_sql(p) for p in _IVF_GRID_NPROBE)}
    )
    SELECT nprobe, k, candidates, hits,
           CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall
    FROM grid ORDER BY nprobe
    """,
)
def ann_ivf_trained_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF recall-vs-nprobe sweep under Lloyd-TRAINED coarse
    centroids (kmeans.train_lloyd, FAISS IndexIVFFlat.train analogue) —
    comparable row-for-row with ann_ivf_recall_grid's stride-sampled
    centroids, so trained-vs-stride recall at equal probe cost is read
    straight off the two grids. Spark reads the PERSISTED trained
    centroid + inverted-list tables (index_store.ivf_trained); the
    oracle re-derives the training from the raw corpus (possible
    because every Lloyd step is engine-portable — see
    operators/kmeans.py) and doubles as a staleness check on the
    stored model."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec
    from multi_search_retrival_big_data_spark.operators import dense

    emb = tables.load(spark, "embeddings", sf_dir)
    cent_df, assign = index_store.ivf_trained(spark, sf_dir, iters=_KM_ITERS)
    exact = dense.topk_cosine(emb, QUERY_VEC, k=_RECALL_K, round_to=6).select("vec_id")
    score = None

    def cfg_row(nprobe: int) -> DataFrame:
        probed = (
            cent_df.select("cid", l2_dist("cv", lit_vec(QUERY_VEC)).alias("__d"))
            .orderBy(F.asc("__d"), F.asc("cid"))
            .limit(nprobe)
            .select("cid")
        )
        cand = assign.join(F.broadcast(probed), "cid")
        n_cand = cand.agg(F.count(F.lit(1)).alias("candidates"))
        from multi_search_retrival_big_data_spark.functions.vector import cosine_sim
        from multi_search_retrival_big_data_spark.functions.rounding import det_round

        # vectors are co-located in the pruned inverted-list partitions —
        # rank them directly, no second corpus scan
        topk = (
            cand.select(
                "vec_id",
                det_round(cosine_sim("embedding", lit_vec(QUERY_VEC)), 6).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(_RECALL_K)
        )
        return grid_row(_RECALL_K, grid_hits(topk, exact), n_cand, nprobe=nprobe)

    return union_rows([cfg_row(p) for p in _IVF_GRID_NPROBE]).orderBy("nprobe")


_PQT_M, _PQT_KS, _PQT_STRIDE = ann.PQT_M, ann.PQT_KS, ann.PQT_STRIDE
_PQT_DSUB = EMB_DIM // _PQT_M

_PQ_TRAIN_CTES, _PQ_TRAIN_FINALS = pq_lloyd_ctes(
    _PQT_M, _PQT_KS, _PQT_STRIDE, EMB_DIM, _KM_ITERS
)


def _pq_trained_ctes() -> str:
    """Trained-codebook encode + ADC CTEs: ranks sub-space codes by
    UNSQUARED list_distance (matching kmeans._assign_sub's (d, code)
    struct-min, which the persisted trained code table was built
    with), unlike the stride path's squared pq_encode ranking."""
    parts = []
    for i in range(_PQT_M):
        lo, hi = i * _PQT_DSUB + 1, (i + 1) * _PQT_DSUB
        qsub = sql_vec(QUERY_VEC[i * _PQT_DSUB : (i + 1) * _PQT_DSUB])
        parts.append(
            f"""te{i} AS (
      SELECT e.vec_id, c.code,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_distance(e.v[{lo}:{hi}], c.cv) ASC, c.code ASC
             ) AS rn
      FROM kem e CROSS JOIN {_PQ_TRAIN_FINALS[i]} c
    )"""
        )
        parts.append(
            f"tlut{i} AS (SELECT code, (list_distance(cv, {qsub}) * list_distance(cv, {qsub})) AS d FROM {_PQ_TRAIN_FINALS[i]})"
        )
    joins = " ".join(
        f"JOIN te{i} ON te{i}.vec_id = te0.vec_id AND te{i}.rn = 1"
        for i in range(1, _PQT_M)
    )
    parts.append(
        f"""tcodes AS (
      SELECT te0.vec_id, {", ".join(f"te{i}.code AS c{i}" for i in range(_PQT_M))}
      FROM te0 {joins}
      WHERE te0.rn = 1
    )"""
    )
    dist = " + ".join(f"l{i}.d" for i in range(_PQT_M))
    lut_joins = " ".join(
        f"JOIN tlut{i} l{i} ON tcodes.c{i} = l{i}.code" for i in range(_PQT_M)
    )
    parts.append(
        f"""tadc AS (
      SELECT tcodes.vec_id, {sql_det_round(dist)} AS approx_dist
      FROM tcodes {lut_joins}
    )"""
    )
    return ",\n    ".join(parts)


@query(
    "ann_pq_trained_recall_grid",
    oracle=f"""
    WITH {KEM_CTE},
    {_PQ_TRAIN_CTES},
    {_pq_trained_ctes()},
    adc_ranked AS MATERIALIZED (
      SELECT vec_id, row_number() OVER (ORDER BY approx_dist ASC, vec_id ASC) AS rn
      FROM tadc
    ),
    exact AS MATERIALIZED (
      SELECT vec_id FROM embeddings
      ORDER BY list_distance({_V}, {sql_vec(QUERY_VEC)}) ASC, vec_id ASC
      LIMIT {_PQ_RERANK_K}
    )
    {" UNION ALL ".join(
        f'''SELECT {r} AS shortlist, {_PQ_RERANK_K} AS k,
               (SELECT count(*) FROM adc_ranked a JOIN exact x ON a.vec_id = x.vec_id
                WHERE a.rn <= {r}) AS hits,
               (SELECT count(*) FROM adc_ranked a JOIN exact x ON a.vec_id = x.vec_id
                WHERE a.rn <= {r}) / CAST({_PQ_RERANK_K} AS DOUBLE) AS recall'''
        for r in _PQ_RERANK_GRID_R
    )}
    ORDER BY shortlist
    """,
)
def ann_pq_trained_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the two-stage PQ query per shortlist size, with
    Lloyd-TRAINED sub-space codebooks (kmeans.train_lloyd_pq, FAISS
    IndexPQ.train analogue) — row-for-row comparable with
    ann_pq_rerank_recall_grid's stride codebooks: the trained cells
    should lift shortlist coverage at every R. Spark reads the
    PERSISTED trained codebook + code tables (index_store.pq_trained);
    the oracle re-trains from the raw corpus in CTEs (bit-parity, see
    operators/kmeans.py) — also a staleness check on the stored
    model."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec

    emb = tables.load(spark, "embeddings", sf_dir)
    book_df, codes = index_store.pq_trained(spark, sf_dir, iters=_KM_ITERS)
    exact = (
        emb.select("vec_id", l2_dist("embedding", lit_vec(QUERY_VEC)).alias("__d"))
        .orderBy(F.asc("__d"), F.asc("vec_id"))
        .limit(_PQ_RERANK_K)
        .select("vec_id")
    )

    def cfg_row(r: int) -> DataFrame:
        reranked = ann.ann_pq_rerank_topk(
            emb, codes, QUERY_VEC, k=_PQ_RERANK_K, shortlist=r, m=_PQT_M,
            round_to=None, shortlist_round_to=6, codebook=book_df,
        ).select("vec_id")
        return grid_row(_PQ_RERANK_K, grid_hits(reranked, exact), shortlist=r)

    return union_rows([cfg_row(r) for r in _PQ_RERANK_GRID_R]).orderBy("shortlist")


# --- incremental index maintenance parity ----------------------------------
# Split points are DERIVED from the corpus (60/20/20 of max vec_id,
# index_store.incremental_split_filters) and asserted non-empty — a
# hardcoded id threshold on a small sf dir would leave the delta empty
# and silently turn every parity proof into rebuild ≡ rebuild.


@query(
    "index_incremental_update_parity",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_sig_sql(_V)} AS s FROM embeddings
    ),
    banded AS (
      SELECT vec_id, CAST(b AS INTEGER) AS band,
             substring(s, CAST(b AS INTEGER) * {_ROWS} + 1, {_ROWS}) AS bval
      FROM sig, unnest(range(0, {ann.ANN_BANDS})) AS t(b)
    )
    SELECT band, bval, count(*) AS n_vecs, CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
    FROM banded GROUP BY band, bval
    ORDER BY band, bval
    """,
)
def index_incremental_update_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance proof: the LSH band table is built
    from the base corpus slice (derived 60% split), the delta slices
    are APPENDED partition-wise (index_store.lsh_bands_incremental —
    band rows are per-vector pure functions, so appends never rewrite
    existing partitions), and the post-append table is aggregated per
    (band, bval). The oracle computes the same aggregate from a
    FROM-SCRATCH banding of the full corpus — a hash match proves
    append ≡ rebuild (the reference's idempotent skip-if-exists
    re-ingest, clip.ipynb cell 7, upgraded to true increments). The
    same banding body runs per micro-batch under a foreachBatch sink
    for streaming ingest."""
    base_f, (d1, d2) = index_store.incremental_split_filters(spark, sf_dir)
    t = index_store.lsh_bands_incremental(
        spark, sf_dir, base_f, f"({d1}) OR ({d2})"
    )
    return (
        t.groupBy("band", "bval")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        .orderBy("band", "bval")
    )


@query(
    "index_incremental_ivf_parity",
    oracle=f"""
    WITH {KEM_CTE},
    {_IVF_TRAIN_CTES},
    tcent AS MATERIALIZED (SELECT cid, cv FROM {_IVF_TRAIN_FINAL}),
    tassign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv) ASC, c.cid ASC
               ) AS rn
        FROM kem e CROSS JOIN tcent c
      ) WHERE rn = 1
    )
    SELECT a.cid, count(*) AS n_vecs,
           CAST(SUM(a.vec_id) AS BIGINT) AS sum_vec_id,
           {sql_dsum("e.v[1]")} AS vec_checksum
    FROM tassign a JOIN kem e USING (vec_id)
    GROUP BY a.cid
    ORDER BY a.cid
    """,
)
def index_incremental_ivf_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental IVF maintenance proof: inverted lists built from the
    base corpus slice under the FROZEN Lloyd-trained quantizer, delta
    slices APPENDED partition-wise (index_store.ivf_assignments_
    incremental — FAISS's train/add split as a cid-partitioned append),
    then aggregated per cell with a vector checksum. The oracle
    re-trains the quantizer from the raw corpus and assigns every
    vector from scratch — a hash match proves (a) append ≡ rebuild for
    the lists and (b) the frozen model itself is bit-stable. Completes
    the incrementality family: LSH bands (pure per-row), IVF lists
    (pure per-row GIVEN the model; centroid refresh is the documented
    retrain boundary)."""
    base_f, (d1, d2) = index_store.incremental_split_filters(spark, sf_dir)
    t = index_store.ivf_assignments_incremental(
        spark, sf_dir, base_f, f"({d1}) OR ({d2})", iters=_KM_ITERS
    )
    return (
        t.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
            dsum(F.element_at("embedding", 1).cast("double")).alias("vec_checksum"),
        )
        .orderBy("cid")
    )


@query(
    "index_incremental_stream_parity",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_sig_sql(_V)} AS s FROM embeddings
    ),
    banded AS (
      SELECT vec_id, CAST(b AS INTEGER) AS band,
             substring(s, CAST(b AS INTEGER) * {_ROWS} + 1, {_ROWS}) AS bval
      FROM sig, unnest(range(0, {ann.ANN_BANDS})) AS t(b)
    )
    SELECT band, bval, count(*) AS n_vecs, CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
    FROM banded GROUP BY band, bval
    ORDER BY band, bval
    """,
)
def index_incremental_stream_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental index maintenance proof: the delta corpus
    slices arrive through a real Structured Streaming file source (one
    micro-batch per landed file, maxFilesPerTrigger=1) and a
    foreachBatch sink appends each micro-batch's band rows to the
    partitioned index table (index_store.lsh_bands_stream_incremental).
    The oracle recomputes the aggregate from a from-scratch banding of
    the full corpus — a hash match proves that an index following an
    append-only ingest feed micro-batch by micro-batch equals the
    batch rebuild."""
    t = index_store.lsh_bands_stream_incremental(spark, sf_dir)
    return (
        t.groupBy("band", "bval")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        .orderBy("band", "bval")
    )


@query(
    "index_incremental_stream_latedata_parity",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_sig_sql(_V)} AS s FROM embeddings
    ),
    banded AS (
      SELECT vec_id, CAST(b AS INTEGER) AS band,
             substring(s, CAST(b AS INTEGER) * {_ROWS} + 1, {_ROWS}) AS bval
      FROM sig, unnest(range(0, {ann.ANN_BANDS})) AS t(b)
    )
    SELECT band, bval, count(*) AS n_vecs, CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
    FROM banded GROUP BY band, bval
    ORDER BY band, bval
    """,
)
def index_incremental_stream_latedata_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STREAMING index maintenance under AT-LEAST-ONCE OUT-OF-ORDER
    delivery: the delta slices arrive late, interleaved, and partially
    REPLAYED across three micro-batches (one of them duplicate-only);
    a watermark + dropDuplicatesWithinWatermark(vec_id) in front of
    the foreachBatch append drops every replay exactly once
    (index_store.lsh_bands_stream_latedata). The oracle is the same
    from-scratch full-corpus banding as the in-order stream proof — a
    hash match proves the index following a messy real-world feed
    still equals the batch rebuild. Without the dedup stage the
    replayed rows would double-append and the n_vecs counts would
    mismatch, so this parity row is sensitive to exactly the failure
    it guards."""
    t = index_store.lsh_bands_stream_latedata(spark, sf_dir)
    return (
        t.groupBy("band", "bval")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("vec_id").alias("sum_vec_id"),
        )
        .orderBy("band", "bval")
    )


# --- IVF-PQ: coarse cells + residual PQ codes (FAISS IndexIVFPQ) -----------

_IVFPQ_K = 100
_IVFPQ_NPROBE = ann.IVFPQ_NPROBE
_IVFPQ_GRID_NPROBE = (1, 2, 4)
_IVFPQ_SHORTLIST = 200

_RPQ_TRAIN_CTES, _RPQ_FINALS = pq_lloyd_ctes(
    _PQ_M, _PQ_KS, _PQ_STRIDE, EMB_DIM, _KM_ITERS, src="resv", vcol="r", prefix="r"
)


def _ivfpq_base_ctes() -> str:
    """kem → trained coarse (c2) → assignment → residuals → residual-PQ
    training → encode → wide code table. Shared by the top-k query and
    the recall grid."""
    enc = []
    for i in range(_PQ_M):
        lo, hi = i * _PQ_DSUB + 1, (i + 1) * _PQ_DSUB
        enc.append(
            f"""re{i} AS (
      SELECT e.vec_id, c.code,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_distance(e.r[{lo}:{hi}], c.cv) ASC, c.code ASC
             ) AS rn
      FROM resv e CROSS JOIN {_RPQ_FINALS[i]} c
    )"""
        )
    joins = " ".join(
        f"JOIN re{i} ON re{i}.vec_id = re0.vec_id AND re{i}.rn = 1"
        for i in range(1, _PQ_M)
    )
    enc.append(
        f"""rcodes AS MATERIALIZED (
      SELECT re0.vec_id, rv.cid, {", ".join(f"re{i}.code AS c{i}" for i in range(_PQ_M))}
      FROM re0 {joins}
      JOIN resv rv ON rv.vec_id = re0.vec_id
      WHERE re0.rn = 1
    )"""
    )
    enc_sql = ",\n    ".join(enc)
    return f"""{KEM_CTE},
    {_IVF_TRAIN_CTES},
    tassign AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv) ASC, c.cid ASC
               ) AS rn
        FROM kem e CROSS JOIN {_IVF_TRAIN_FINAL} c
      ) WHERE rn = 1
    ),
    resv AS MATERIALIZED (
      SELECT e.vec_id, a.cid,
             list_transform(range(1, {EMB_DIM + 1}),
                            i -> e.v[CAST(i AS INT)] - c.cv[CAST(i AS INT)]) AS r
      FROM kem e JOIN tassign a USING (vec_id) JOIN {_IVF_TRAIN_FINAL} c USING (cid)
    ),
    {_RPQ_TRAIN_CTES},
    {enc_sql}"""


def _ivfpq_adc_cte(nprobe: int, tag: str) -> str:
    """probe → residual query → per-cell LUTs → ADC, namespaced by tag."""
    parts = [
        f"""{tag}probed AS (
      SELECT cid, cv FROM {_IVF_TRAIN_FINAL}
      ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))} ASC, cid ASC LIMIT {nprobe}
    )""",
        f"""{tag}qres AS (
      SELECT cid, list_transform(range(1, {EMB_DIM + 1}),
                                 i -> ({sql_vec(QUERY_VEC)})[CAST(i AS INT)] - cv[CAST(i AS INT)]) AS qr
      FROM {tag}probed
    )""",
    ]
    for i in range(_PQ_M):
        lo, hi = i * _PQ_DSUB + 1, (i + 1) * _PQ_DSUB
        parts.append(
            f"""{tag}lut{i} AS (
      SELECT q.cid, b.code,
             (list_distance(q.qr[{lo}:{hi}], b.cv) * list_distance(q.qr[{lo}:{hi}], b.cv)) AS d
      FROM {tag}qres q CROSS JOIN {_RPQ_FINALS[i]} b
    )"""
        )
    dist = " + ".join(f"l{i}.d" for i in range(_PQ_M))
    lut_joins = " ".join(
        f"JOIN {tag}lut{i} l{i} ON l{i}.cid = k.cid AND k.c{i} = l{i}.code"
        for i in range(_PQ_M)
    )
    parts.append(
        f"""{tag}adc AS (
      SELECT k.vec_id, {sql_det_round(dist)} AS approx_dist
      FROM rcodes k JOIN {tag}probed p ON k.cid = p.cid {lut_joins}
    )"""
    )
    return ",\n    ".join(parts)


@query(
    "ann_ivfpq_adc_topk",
    oracle=f"""
    WITH {_ivfpq_base_ctes()},
    {_ivfpq_adc_cte(_IVFPQ_NPROBE, "t")}
    SELECT vec_id, approx_dist FROM tadc
    ORDER BY approx_dist ASC, vec_id ASC LIMIT {_IVFPQ_K}
    """,
)
def ann_ivfpq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k (FAISS IndexIVFPQ.search): probe nprobe trained
    cells, score their members from the RESIDUAL code table alone via
    per-cell ADC lookup tables (ann.ann_ivfpq_adc_topk over the
    persisted index_store.ivfpq tables). The plan reads the k-row
    centroid table + the probed partitions of the M-byte code table —
    no vector IO; cells compose with codes exactly as in Jégou et al.
    TPAMI'11 §IV. Oracle re-derives coarse training, residuals,
    residual-PQ training, encode and the per-cell LUTs from the raw
    corpus — full hash-match."""
    cents_t, book_t, codes_t = index_store.ivfpq(spark, sf_dir, iters=_KM_ITERS)
    return ann.ann_ivfpq_adc_topk(
        codes_t, cents_t, book_t, QUERY_VEC, k=_IVFPQ_K,
        nprobe=_IVFPQ_NPROBE, round_to=6, literal_lut=True,
    )


_IVFPQ_GRID_ADC = ",\n    ".join(
    _ivfpq_adc_cte(p, f"g{p}") for p in _IVFPQ_GRID_NPROBE
)


@query(
    "ann_ivfpq_recall_grid",
    oracle=f"""
    WITH {_ivfpq_base_ctes()},
    {_IVFPQ_GRID_ADC},
    exact AS MATERIALIZED (
      SELECT vec_id FROM embeddings
      ORDER BY list_distance({_V}, {sql_vec(QUERY_VEC)}) ASC, vec_id ASC
      LIMIT {_PQ_RERANK_K}
    )
    {" UNION ALL ".join(
        f'''SELECT {p} AS nprobe, {_IVFPQ_SHORTLIST} AS shortlist, {_PQ_RERANK_K} AS k,
               (SELECT count(*) FROM (
                  SELECT vec_id FROM g{p}adc
                  ORDER BY approx_dist ASC, vec_id ASC LIMIT {_IVFPQ_SHORTLIST}) s
                JOIN exact USING (vec_id)) AS hits,
               (SELECT count(*) FROM (
                  SELECT vec_id FROM g{p}adc
                  ORDER BY approx_dist ASC, vec_id ASC LIMIT {_IVFPQ_SHORTLIST}) s
                JOIN exact USING (vec_id)) / CAST({_PQ_RERANK_K} AS DOUBLE) AS recall'''
        for p in _IVFPQ_GRID_NPROBE
    )}
    ORDER BY nprobe
    """,
)
def ann_ivfpq_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ recall sweep: coverage of the exact-L2 top-{k} by the
    nprobe-cell ADC shortlist ({S} candidates) — the recall-vs-nprobe
    curve that governs an IndexIVFPQ rollout (cell coverage bounds the
    achievable recall; residual codes then rank within it). One row
    per nprobe: (nprobe, shortlist, k, hits, recall)."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec

    emb = tables.load(spark, "embeddings", sf_dir)
    cents_t, book_t, codes_t = index_store.ivfpq(spark, sf_dir, iters=_KM_ITERS)
    exact = (
        emb.select("vec_id", l2_dist("embedding", lit_vec(QUERY_VEC)).alias("__d"))
        .orderBy(F.asc("__d"), F.asc("vec_id"))
        .limit(_PQ_RERANK_K)
        .select("vec_id")
    )

    def cfg_row(p: int) -> DataFrame:
        short = ann.ann_ivfpq_adc_topk(
            codes_t, cents_t, book_t, QUERY_VEC, k=_IVFPQ_SHORTLIST,
            nprobe=p, round_to=6,
        ).select("vec_id")
        return grid_row(
            _PQ_RERANK_K,
            grid_hits(short, exact),
            nprobe=p,
            shortlist=_IVFPQ_SHORTLIST,
        )

    return union_rows([cfg_row(p) for p in _IVFPQ_GRID_NPROBE]).orderBy("nprobe")


# --- SQ8 scalar quantization ------------------------------------------------

_SQ8_K = 100
_SQ8_RECALL_K = 50

_SQ8_CTES = f"""{KEM_CTE},
    bnd AS (
      SELECT CAST(t.i AS INT) AS i,
             min(e.v[CAST(t.i AS INT)]) AS vmin,
             max(e.v[CAST(t.i AS INT)]) AS vmax
      FROM kem e, unnest(range(1, {EMB_DIM + 1})) AS t(i)
      GROUP BY 1
    ),
    barr AS (
      SELECT list(vmin ORDER BY i) AS lo,
             list(CASE WHEN vmax > vmin THEN 255.0 / (vmax - vmin) ELSE 0.0 END
                  ORDER BY i) AS sc,
             list((vmax - vmin) / 255.0 ORDER BY i) AS st
      FROM bnd
    ),
    recon AS MATERIALIZED (
      SELECT e.vec_id,
             list_transform(range(1, {EMB_DIM + 1}),
               i -> GREATEST(0, LEAST(255,
                      CAST(FLOOR((e.v[CAST(i AS INT)] - b.lo[CAST(i AS INT)])
                                 * b.sc[CAST(i AS INT)] + 0.5) AS INT)))
                    * b.st[CAST(i AS INT)] + b.lo[CAST(i AS INT)]) AS rv
      FROM kem e CROSS JOIN barr b
    )"""


@query(
    "ann_sq8_topk",
    oracle=f"""
    WITH {_SQ8_CTES}
    SELECT vec_id,
           {sql_det_round(f"list_distance(rv, {sql_vec(QUERY_VEC)})")} AS approx_dist
    FROM recon
    ORDER BY approx_dist ASC, vec_id ASC LIMIT {_SQ8_K}
    """,
)
def ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 top-k (FAISS IndexScalarQuantizer QT_8bit): rank by exact
    L2 over per-dimension AFFINE-DEQUANTIZED byte codes
    (ann.ann_sq8_topk over the persisted index_store.sq8 tables) — the
    fourth compression path after LSH buckets, IVF cells and PQ codes:
    d bytes/vector, reconstruction exact to 1/255 of each dimension's
    range, no float vector read at query time."""
    bounds, codes = index_store.sq8(spark, sf_dir)
    return ann.ann_sq8_topk(codes, bounds, QUERY_VEC, k=_SQ8_K, round_to=6)


@query(
    "ann_sq8_recall",
    oracle=f"""
    WITH {_SQ8_CTES},
    sq AS (
      SELECT vec_id FROM recon
      ORDER BY list_distance(rv, {sql_vec(QUERY_VEC)}) ASC, vec_id ASC
      LIMIT {_SQ8_RECALL_K}
    ),
    exact AS (
      SELECT vec_id FROM embeddings
      ORDER BY list_distance({_V}, {sql_vec(QUERY_VEC)}) ASC, vec_id ASC
      LIMIT {_SQ8_RECALL_K}
    )
    SELECT {_SQ8_RECALL_K} AS k, count(*) AS hits,
           count(*) / CAST({_SQ8_RECALL_K} AS DOUBLE) AS recall
    FROM sq JOIN exact USING (vec_id)
    """,
)
def ann_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{k} of the SQ8 path vs the exact scan — the audit row
    that prices 8-bit quantization (expected ≈ 1.0: 1/255-of-range
    per-dimension error rarely reorders a top-50)."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec

    emb = tables.load(spark, "embeddings", sf_dir)
    bounds, codes = index_store.sq8(spark, sf_dir)
    exact = (
        emb.select("vec_id", l2_dist("embedding", lit_vec(QUERY_VEC)).alias("__d"))
        .orderBy(F.asc("__d"), F.asc("vec_id"))
        .limit(_SQ8_RECALL_K)
        .select("vec_id")
    )
    sq = ann.ann_sq8_topk(
        codes, bounds, QUERY_VEC, k=_SQ8_RECALL_K, round_to=None
    ).select("vec_id")
    return grid_row(_SQ8_RECALL_K, grid_hits(sq, exact))


@query(
    "ann_pq_rerank_trained_topk",
    oracle=f"""
    WITH {KEM_CTE},
    {_PQ_TRAIN_CTES},
    {_pq_trained_ctes()},
    short AS (
      SELECT vec_id FROM tadc ORDER BY approx_dist ASC, vec_id ASC LIMIT {_PQ_RERANK_R}
    )
    SELECT e.vec_id,
           {sql_det_round(f"list_distance({_V}, {sql_vec(QUERY_VEC)})")} AS dist
    FROM embeddings e JOIN short USING (vec_id)
    ORDER BY dist ASC, e.vec_id ASC LIMIT {_PQ_RERANK_K}
    """,
)
def ann_pq_rerank_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship PQ serving query: Lloyd-TRAINED codebooks (whose
    shortlist-200 coverage of the exact top-50 measures 1.00 on the
    grid) + exact re-rank of the shortlist — effectively exact top-k
    answered from 16 bytes/vector plus |shortlist| vector fetches.
    This is the configuration a production rollout serves with; the
    untrained ann_pq_rerank_topk stays as the training-free
    comparison point."""
    emb = tables.load(spark, "embeddings", sf_dir)
    book_df, codes = index_store.pq_trained(spark, sf_dir, iters=_KM_ITERS)
    return ann.ann_pq_rerank_topk(
        emb, codes, QUERY_VEC, k=_PQ_RERANK_K, shortlist=_PQ_RERANK_R,
        m=_PQT_M, round_to=6, codebook=book_df, literal_lut=True,
    )


# --- batched multi-query PQ/ADC --------------------------------------------

from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC_B  # noqa: E402

_BATCH_ADC_K = 20


def _pq_adc_b_ctes() -> str:
    """Second-query LUT + ADC chain over the SAME codes CTE that
    _pq_ctes() builds for QUERY_VEC (tag b = QUERY_VEC_B)."""
    parts = []
    for i in range(_PQ_M):
        qsub = sql_vec(QUERY_VEC_B[i * _PQ_DSUB : (i + 1) * _PQ_DSUB])
        parts.append(
            f"lutb{i} AS (SELECT code, (list_distance(cv, {qsub}) * list_distance(cv, {qsub})) AS d FROM cb{i})"
        )
    dist = " + ".join(f"l{i}.d" for i in range(_PQ_M))
    lut_joins = " ".join(
        f"JOIN lutb{i} l{i} ON codes.c{i} = l{i}.code" for i in range(_PQ_M)
    )
    parts.append(
        f"""adcb AS (
      SELECT codes.vec_id, {sql_det_round(dist)} AS approx_dist
      FROM codes {lut_joins}
    )"""
    )
    return ",\n    ".join(parts)


@query(
    "ann_pq_batch_adc_topk",
    oracle=f"""
    WITH {_pq_ctes()},
    {_pq_adc_b_ctes()},
    ra AS (
      SELECT 0 AS query_id, vec_id, approx_dist,
             row_number() OVER (ORDER BY approx_dist ASC, vec_id ASC) AS rn
      FROM adc
    ),
    rb AS (
      SELECT 1 AS query_id, vec_id, approx_dist,
             row_number() OVER (ORDER BY approx_dist ASC, vec_id ASC) AS rn
      FROM adcb
    )
    SELECT query_id, vec_id, approx_dist
    FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
    WHERE rn <= {_BATCH_ADC_K}
    ORDER BY query_id, approx_dist ASC, vec_id ASC
    """,
)
def ann_pq_batch_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query PQ/ADC (ann.batch_pq_adc_topk): both query
    vectors' lookup tables broadcast together, ONE scan of the
    persisted code table for the whole batch, per-query top-{k} via a
    window partial sort — completing the batched-serving trio (dense
    and sparse batch paths measured 2.3-2.7× amortization in r2; the
    code-table scan is even cheaper to amortize)."""
    emb = tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in QUERY_VEC]), (1, [float(x) for x in QUERY_VEC_B])],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    return ann.batch_pq_adc_topk(
        emb, codes, qdf, k=_BATCH_ADC_K, round_to=6,
        codebook=ann.pq_codebook(emb), literal_lut=True,
    )


# --- SQ8 incremental maintenance + filtered IVF recall governance ----------

_SQ8_INC_WEIGHTS = "i -> (2*i + 1) * cd[CAST(i AS INT)]"


@query(
    "index_incremental_sq8_parity",
    oracle=f"""
    WITH {KEM_CTE},
    t1 AS (SELECT CAST(floor(max(vec_id) * 0.6) AS BIGINT) AS v FROM embeddings),
    bnd AS (
      SELECT CAST(t.i AS INT) AS i,
             min(e.v[CAST(t.i AS INT)]) AS vmin,
             max(e.v[CAST(t.i AS INT)]) AS vmax
      FROM kem e, t1, unnest(range(1, {EMB_DIM + 1})) AS t(i)
      WHERE e.vec_id < t1.v
      GROUP BY 1
    ),
    barr AS (
      SELECT list(vmin ORDER BY i) AS lo,
             list(CASE WHEN vmax > vmin THEN 255.0 / (vmax - vmin) ELSE 0.0 END
                  ORDER BY i) AS sc
      FROM bnd
    ),
    codes AS MATERIALIZED (
      SELECT e.vec_id,
             list_transform(range(1, {EMB_DIM + 1}),
               i -> GREATEST(0, LEAST(255,
                      CAST(FLOOR((e.v[CAST(i AS INT)] - b.lo[CAST(i AS INT)])
                                 * b.sc[CAST(i AS INT)] + 0.5) AS INT)))) AS cd
      FROM kem e CROSS JOIN barr b
    )
    SELECT CAST(vec_id % 16 AS BIGINT) AS g, count(*) AS n_vecs,
           CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
           CAST(SUM(list_sum(list_transform(range(1, {EMB_DIM + 1}),
                {_SQ8_INC_WEIGHTS}))) AS BIGINT) AS code_checksum
    FROM codes GROUP BY 1 ORDER BY g
    """,
)
def index_incremental_sq8_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SQ8 maintenance proof (index_store.sq8_codes_incremental):
    byte codes built from the base slice under FROZEN base-trained
    per-dimension bounds, delta slices APPENDED (clamping where they
    exceed the trained range), then aggregated with a position-weighted
    code checksum (weights 3,5,…,2d+1 catch dimension swaps
    integer-exactly). The oracle re-derives the SAME base-slice bounds
    (threshold = floor(max(vec_id)·0.6), the exact
    incremental_split_filters arithmetic) and encodes EVERY vector
    from scratch — a hash match proves append ≡ rebuild and bounds
    bit-stability. Completes the incremental family across all four
    quantization paths: LSH bands, IVF lists, PQ codes, SQ8 codes."""
    base_f, (d1, d2) = index_store.incremental_split_filters(spark, sf_dir)
    t = index_store.sq8_codes_incremental(
        spark, sf_dir, base_f, f"({d1}) OR ({d2})"
    )
    wsum = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(1), F.lit(EMB_DIM)),
            lambda c, i: (F.lit(2) * i + F.lit(1)).cast("bigint") * c.cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        t.select("vec_id", wsum.alias("__w"))
        .groupBy((F.col("vec_id") % 16).cast("bigint").alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("vec_id").cast("bigint").alias("sum_vec_id"),
            F.sum("__w").cast("bigint").alias("code_checksum"),
        )
        .orderBy("g")
    )


# --- recall-drift governance for frozen-model appends -----------------------
# The append parities prove appends are bit-exact GIVEN the model; this
# row measures what the parities exclude — the model going stale when
# appended data shifts distribution (the actual retrain trigger, FAISS
# train/add convention documented at index_store.py:42-45).

_DRIFT_STRIDE = 16
_DRIFT_OFFSET = 0.6
_DRIFT_NPROBE = 2
_DRIFT_K = 20
# query from the SHIFTED distribution: driver-side constant, injected
# as the same literal into both plans (no cross-engine arithmetic)
_DRIFT_QV = [x + _DRIFT_OFFSET for x in QUERY_VEC]


def _drift_arm_sql(model: str, cent: str, assign: str) -> str:
    probe = (
        f"(SELECT cid FROM {cent} ORDER BY "
        f"{_l2_sql('cv', sql_vec(_DRIFT_QV))} ASC, cid ASC LIMIT {_DRIFT_NPROBE})"
    )
    return f"""
    SELECT '{model}' AS model, {_DRIFT_K} AS k,
      (SELECT count(*) FROM {assign} a JOIN {probe} p USING (cid)) AS candidates,
      (SELECT count(*) FROM (
         SELECT a.vec_id FROM {assign} a JOIN {probe} p USING (cid)
         JOIN drift d ON d.vec_id = a.vec_id
         ORDER BY {_l2_sql('d.v', sql_vec(_DRIFT_QV))} ASC, a.vec_id ASC
         LIMIT {_DRIFT_K}) t JOIN exact USING (vec_id)) AS hits,
      (SELECT max(n) FROM (
         SELECT count(*) AS n FROM {assign} GROUP BY cid)) AS max_cell_n"""


def _drift_assign_sql(name: str, cent: str) -> str:
    return f"""{name} AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT d.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY d.vec_id
                 ORDER BY {_l2_sql('d.v', 'c.cv')} ASC, c.cid ASC
               ) AS rn
        FROM drift d CROSS JOIN {cent} c
      ) WHERE rn = 1
    )"""


@query(
    "ann_incremental_recall_drift",
    oracle=f"""
    WITH {KEM_CTE},
    t1 AS (SELECT CAST(floor(max(vec_id) * 0.6) AS BIGINT) AS v FROM embeddings),
    drift AS MATERIALIZED (
      SELECT e.vec_id,
             CASE WHEN e.vec_id < t1.v THEN e.v
                  ELSE list_transform(e.v, x -> x + CAST({_DRIFT_OFFSET!r} AS DOUBLE)) END AS v
      FROM kem e, t1
    ),
    fcent AS (
      SELECT d.vec_id AS cid, d.v AS cv FROM drift d, t1
      WHERE d.vec_id < t1.v AND d.vec_id % {_DRIFT_STRIDE} = 0
    ),
    rcent AS (
      SELECT vec_id AS cid, v AS cv FROM drift WHERE vec_id % {_DRIFT_STRIDE} = 0
    ),
    exact AS MATERIALIZED (
      SELECT vec_id FROM (
        SELECT vec_id FROM drift
        ORDER BY {_l2_sql('v', sql_vec(_DRIFT_QV))} ASC, vec_id ASC
        LIMIT {_DRIFT_K})
    ),
    {_drift_assign_sql("fassign", "fcent")},
    {_drift_assign_sql("rassign", "rcent")},
    arms AS ({_drift_arm_sql("frozen", "fcent", "fassign")}
      UNION ALL
      {_drift_arm_sql("retrained", "rcent", "rassign")})
    SELECT model, k, candidates, hits,
           CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall, max_cell_n
    FROM arms ORDER BY model
    """,
)
def ann_incremental_recall_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-side RECALL-DRIFT gauge for incremental indexes (the
    retrain trigger monitor_text_oov_rate provides for text): the delta
    slice of the corpus is deliberately distribution-shifted (every
    component + {_DRIFT_OFFSET}) and appended to the cid-partitioned
    IVF lists under a quantizer FROZEN on the base slice
    (index_store.ivf_assignments_drifted — FAISS add-after-train with
    stale training data), then a query from the shifted distribution is
    answered by the frozen appended index AND by a from-scratch
    retrained twin. Each arm reports recall@k vs the exact scan, the
    probed-cell candidate volume, and the max inverted-list size — at
    this data scale the drift manifests as the frozen model collapsing
    the shifted mass into mega-cells (candidate volume and max list
    blow up toward a near-full scan; any recall it keeps is bought by
    brute-force-sized probes) while the retrained twin restores
    ~nprobe/nlist probe volume. Those two gauges crossing a threshold
    is what schedules a quantizer retrain at 100 TB. Frozen-arm
    assignments come from the PERSISTED post-append table; centroid
    models are driver-held literals (FAISS-in-RAM convention), so no
    corpus×centroid recompute ships to the serving plan."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec
    from multi_search_retrival_big_data_spark.operators import kmeans

    frozen_t, drift = index_store.ivf_assignments_drifted(
        spark, sf_dir, stride=_DRIFT_STRIDE, offset=_DRIFT_OFFSET
    )
    base_f, _deltas = index_store.incremental_split_filters(spark, sf_dir)
    qv = lit_vec(_DRIFT_QV)
    exact = (
        drift.select("vec_id", l2_dist("embedding", qv).alias("__d"))
        .orderBy(F.asc("__d"), F.asc("vec_id"))
        .limit(_DRIFT_K)
        .select("vec_id")
    )
    rcent = drift.filter(F.col("vec_id") % _DRIFT_STRIDE == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("__cv")
    )
    rcents = [(r["cid"], r["__cv"]) for r in rcent.collect()]
    retrained = drift.select(
        "vec_id", "embedding", kmeans.assign_cid("embedding", rcents).alias("cid")
    )
    fcent = drift.filter(F.expr(base_f)).filter(
        F.col("vec_id") % _DRIFT_STRIDE == 0
    ).select(F.col("vec_id").alias("cid"), F.col("embedding").alias("__cv"))

    def arm(model: str, assign_df: DataFrame, cent_df: DataFrame) -> DataFrame:
        probed = (
            cent_df.select("cid", l2_dist("__cv", qv).alias("__d"))
            .orderBy(F.asc("__d"), F.asc("cid"))
            .limit(_DRIFT_NPROBE)
            .select("cid")
        )
        cand = assign_df.join(F.broadcast(probed), "cid")
        n_cand = cand.agg(F.count(F.lit(1)).alias("candidates"))
        topk = (
            cand.select("vec_id", l2_dist("embedding", qv).alias("__d"))
            .orderBy(F.asc("__d"), F.asc("vec_id"))
            .limit(_DRIFT_K)
            .select("vec_id")
        )
        max_cell = (
            assign_df.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(F.max("n").alias("max_cell_n"))
        )
        return (
            n_cand.crossJoin(grid_hits(topk, exact))
            .crossJoin(max_cell)
            .select(
                F.lit(model).alias("model"),
                F.lit(_DRIFT_K).alias("k"),
                F.col("candidates"),
                F.col("hits"),
                (F.col("hits").cast("double") / F.lit(float(_DRIFT_K))).alias(
                    "recall"
                ),
                F.col("max_cell_n"),
            )
        )

    return union_rows(
        [arm("frozen", frozen_t, fcent), arm("retrained", retrained, rcent)]
    ).orderBy("model")


_IVFF_SELS = (("mod03", 3), ("mod10", 10))
_IVFF_NPROBE = (1, 2, 4)


def _ivff_grid_cfg_sql(sel: str, mod: int, nprobe: int) -> str:
    probed = (
        f"(SELECT cid FROM cent ORDER BY {_l2_sql('cv', sql_vec(QUERY_VEC))}, cid "
        f"LIMIT {nprobe})"
    )
    return f"""
    SELECT '{sel}' AS sel, {nprobe} AS nprobe, {_RECALL_K} AS k,
           (SELECT count(*) FROM assign a
            JOIN {probed} p USING (cid)
            JOIN alw_{sel} w ON w.vec_id = a.vec_id) AS candidates,
           (SELECT count(*) FROM (
              SELECT vec_id FROM (
                SELECT e.vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
                FROM embeddings e
                JOIN (SELECT a.vec_id FROM assign a
                      JOIN {probed} p USING (cid)
                      JOIN alw_{sel} w ON w.vec_id = a.vec_id) c USING (vec_id)
                ORDER BY score DESC, e.vec_id LIMIT {_RECALL_K}) t
              JOIN fex_{sel} USING (vec_id)) h) AS hits"""


@query(
    "ann_ivf_filtered_recall_grid",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, {_V} AS cv FROM embeddings WHERE vec_id % {_STRIDE} = 0
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('c.cv', 'CAST(e.embedding AS DOUBLE[])')}, c.cid
               ) AS rn
        FROM embeddings e, cent c
      ) WHERE rn = 1
    ),
    {",".join(
        f'''
    alw_{s} AS (SELECT vec_id FROM embeddings WHERE label % {m} = 0),
    fex_{s} AS MATERIALIZED (
      SELECT vec_id FROM (
        SELECT e.vec_id, {sql_det_round(_cos_sql(_V, sql_vec(QUERY_VEC)))} AS score
        FROM embeddings e JOIN alw_{s} w ON w.vec_id = e.vec_id
        ORDER BY score DESC, e.vec_id LIMIT {_RECALL_K})
    )'''
        for s, m in _IVFF_SELS
    )},
    grid AS (
      {" UNION ALL ".join(
        _ivff_grid_cfg_sql(s, m, p) for s, m in _IVFF_SELS for p in _IVFF_NPROBE
      )}
    )
    SELECT sel, nprobe, k, candidates, hits,
           CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall
    FROM grid ORDER BY sel, nprobe
    """,
)
def ann_ivf_filtered_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall governance for FILTERED IVF search — the selectivity ×
    nprobe grid ann_ivf_filtered_topk lacks (the IVF sibling of
    ann_pq_filtered_recall_grid): for each metadata predicate
    (label % 3 / % 10) and nprobe, the surviving candidate volume
    inside the probed cells AND how many of the exact FILTERED top-k
    the filtered cell union recovers. This is where filtered IVF
    quietly starves at scale — a selective predicate empties exactly
    the probed cells while the answers sit one cell further out — so
    the rollout gate must measure the interaction, not the unfiltered
    sweep. Same plan shape per cell as ann_ivf_filtered_topk: semi-join
    AFTER the cell prune, BEFORE the rank."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec
    from multi_search_retrival_big_data_spark.operators import dense

    emb = tables.load(spark, "embeddings", sf_dir)
    assign = index_store.ivf_assignments(spark, sf_dir)
    out = []
    for sel, mod in _IVFF_SELS:
        allowed = emb.filter(F.col("label") % mod == 0).select("vec_id")
        exact = (
            dense.topk_cosine(
                emb.join(allowed, "vec_id", "left_semi"),
                QUERY_VEC,
                k=_RECALL_K,
                round_to=6,
            ).select("vec_id")
        )
        for nprobe in _IVFF_NPROBE:
            probed = (
                ann.centroids(emb, stride=_STRIDE)
                .select("cid", l2_dist("__cv", lit_vec(QUERY_VEC)).alias("__d"))
                .orderBy(F.asc("__d"), F.asc("cid"))
                .limit(nprobe)
                .select("cid")
            )
            cand = assign.join(F.broadcast(probed), "cid").join(
                allowed, "vec_id", "left_semi"
            )
            n_cand = cand.agg(F.count("*").alias("candidates"))
            topk = ann.ann_ivf_topk(
                emb,
                QUERY_VEC,
                k=_RECALL_K,
                nprobe=nprobe,
                round_to=6,
                assign=assign,
                subset=allowed,
            )
            out.append(
                grid_row(
                    _RECALL_K, grid_hits(topk, exact), n_cand, sel=sel, nprobe=nprobe
                )
            )
    return union_rows(out).orderBy("sel", "nprobe")


# --- multi-probe LSH + batched IVF serving ---------------------------------


def _multiprobe_filter_sql() -> str:
    """Hamming-≤1 probe predicate per band, values computed statically
    from the query signature (same driver-side placement as
    _band_filter_sql)."""
    return " OR ".join(
        "substring(s, {off}, {n}) IN ({vals})".format(
            off=b * _ROWS + 1,
            n=_ROWS,
            vals=", ".join(f"'{v}'" for v in ann.multiprobe_values(qband)),
        )
        for b, qband in ann.query_bands(_QSIG)
    )


@query(
    "ann_lsh_multiprobe_topk",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    )
    SELECT vec_id, {sql_det_round(_cos_sql("v", sql_vec(QUERY_VEC)))} AS score
    FROM sig
    WHERE {_multiprobe_filter_sql()}
    ORDER BY score DESC, vec_id
    LIMIT 50
    """,
)
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k (ann.ann_lsh_multiprobe_topk): each band
    probes its own bucket PLUS the `rows` Hamming-1 flip buckets —
    recall comparable to extra hash tables for zero extra index, the
    multi-probe trade (Lv et al., VLDB'07). Against the persisted
    (band, bval)-partitioned banding the probe list is still a static
    partition-pruning predicate: bands·(rows+1) partitions read."""
    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    return ann.ann_lsh_multiprobe_topk(
        emb, QUERY_VEC, k=50, round_to=6, banded=banded
    )


def _probe_grid_cfg_sql(level: int, flt: str) -> str:
    return f"""
    SELECT {level} AS probe_level, {_RECALL_K} AS k,
           (SELECT count(*) FROM sig WHERE {flt}) AS candidates,
           (SELECT count(*) FROM (
              SELECT vec_id FROM (
                SELECT vec_id, {sql_det_round(_cos_sql("v", sql_vec(QUERY_VEC)))} AS score
                FROM sig WHERE {flt}
                ORDER BY score DESC, vec_id LIMIT {_RECALL_K}) t
              JOIN exact USING (vec_id)) h) AS hits"""


@query(
    "ann_lsh_multiprobe_recall_grid",
    oracle=f"""
    WITH sig AS MATERIALIZED (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    ),
    exact AS MATERIALIZED (
      SELECT vec_id FROM (
        SELECT vec_id, {sql_det_round(_cos_sql("v", sql_vec(QUERY_VEC)))} AS score
        FROM sig ORDER BY score DESC, vec_id LIMIT {_RECALL_K})
    ),
    grid AS (
      {_probe_grid_cfg_sql(0, _band_filter_sql())}
      UNION ALL
      {_probe_grid_cfg_sql(1, _multiprobe_filter_sql())}
    )
    SELECT probe_level, k, candidates, hits,
           CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall
    FROM grid ORDER BY probe_level
    """,
)
def ann_lsh_multiprobe_recall_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-probe decision row: recall@k AND candidate volume at
    probe level 0 (plain banding) vs level 1 (Hamming-1 multi-probe)
    on the SAME persisted index — what the extra probed partitions buy
    and what they cost, so widening the probe set is a measured trade
    exactly like the bands sweep (ann_lsh_recall_grid) and the cap
    (dedup_lsh_bucket_stats)."""
    from multi_search_retrival_big_data_spark.operators import dense

    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    exact = dense.topk_cosine(emb, QUERY_VEC, k=_RECALL_K, round_to=6).select(
        "vec_id"
    )
    rows = ann.NUM_PLANES // ann.ANN_BANDS

    def cfg_row(level: int) -> DataFrame:
        probes = [
            (b, ann.multiprobe_values(qb)[: 1 + level * rows])
            for b, qb in ann.query_bands(_QSIG)
        ]
        cond = None
        for b, vals in probes:
            c = (F.col("band") == b) & F.col("bval").isin(vals)
            cond = c if cond is None else cond | c
        cand = banded.filter(cond).select("vec_id").distinct()
        n_cand = cand.agg(F.count("*").alias("candidates"))
        fn = ann.ann_lsh_multiprobe_topk if level else ann.ann_lsh_topk
        topk = fn(emb, QUERY_VEC, k=_RECALL_K, round_to=6, banded=banded)
        return grid_row(
            _RECALL_K, grid_hits(topk, exact), n_cand, probe_level=level
        )

    return union_rows([cfg_row(0), cfg_row(1)]).orderBy("probe_level")


_BATCH_IVF_K = 50


def _batch_ivf_cfg_sql(qid: int, qvec_sql: str) -> str:
    probed = (
        f"(SELECT cid FROM cent ORDER BY {_l2_sql('cv', qvec_sql)}, cid "
        f"LIMIT {_NPROBE})"
    )
    return f"""
    SELECT {qid} AS query_id, vec_id, score FROM (
      SELECT e.vec_id, {sql_det_round(_cos_sql(_V, qvec_sql))} AS score,
             row_number() OVER (
               ORDER BY {sql_det_round(_cos_sql(_V, qvec_sql))} DESC, e.vec_id
             ) AS rn
      FROM embeddings e
      JOIN (SELECT a.vec_id FROM assign a JOIN {probed} p USING (cid)) c
        USING (vec_id)
    ) WHERE rn <= {_BATCH_IVF_K}"""


@query(
    "ann_ivf_batch_topk",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, {_V} AS cv FROM embeddings WHERE vec_id % {_STRIDE} = 0
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY {_l2_sql('c.cv', 'CAST(e.embedding AS DOUBLE[])')}, c.cid
               ) AS rn
        FROM embeddings e, cent c
      ) WHERE rn = 1
    )
    {_batch_ivf_cfg_sql(0, sql_vec(QUERY_VEC))}
    UNION ALL
    {_batch_ivf_cfg_sql(1, sql_vec(QUERY_VEC_B))}
    ORDER BY query_id, score DESC, vec_id
    """,
)
def ann_ivf_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query IVF top-k (ann.batch_ivf_topk): both
    queries' nprobe cells elected driver-side against the centroid
    model, ONE `cid IN (union)` pruned scan of the persisted inverted
    lists serves the whole batch, per-query membership via a
    request-sized broadcast, per-query top-{k} via a window partial
    sort — completing the batched-serving family across all four
    paths (dense, sparse, PQ/ADC, and now IVF)."""
    emb = tables.load(spark, "embeddings", sf_dir)
    assign = index_store.ivf_assignments(spark, sf_dir)
    return ann.batch_ivf_topk(
        emb,
        [(0, QUERY_VEC), (1, QUERY_VEC_B)],
        k=_BATCH_IVF_K,
        round_to=6,
        assign=assign,
    )


@query(
    "ann_ivfpq_filtered_topk",
    oracle=f"""
    WITH {_ivfpq_base_ctes()},
    {_ivfpq_adc_cte(_IVFPQ_NPROBE, "f")}
    SELECT vec_id, approx_dist FROM fadc
    WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE label % 3 = 0)
    ORDER BY approx_dist ASC, vec_id ASC LIMIT {_IVFPQ_K}
    """,
)
def ann_ivfpq_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search through the IVFPQ index: top-k among
    only the vectors passing a metadata predicate (label % 3 = 0),
    with the allowed-id semi-join applied AFTER the trained-cell prune
    and BEFORE the per-cell ADC score — completing the filtered mode
    across every quantized serving path (PQ, IVF, and now IVFPQ),
    because a vector store that post-filters its top-k starves under
    selective predicates regardless of which index served it."""
    emb = tables.load(spark, "embeddings", sf_dir)
    cents_t, book_t, codes_t = index_store.ivfpq(spark, sf_dir, iters=_KM_ITERS)
    allowed = emb.filter(F.col("label") % 3 == 0).select("vec_id")
    return ann.ann_ivfpq_adc_topk(
        codes_t, cents_t, book_t, QUERY_VEC, k=_IVFPQ_K,
        nprobe=_IVFPQ_NPROBE, round_to=6, literal_lut=True, subset=allowed,
    )


@query(
    "ann_sq8_filtered_topk",
    oracle=f"""
    WITH {_SQ8_CTES}
    SELECT vec_id,
           {sql_det_round(f"list_distance(rv, {sql_vec(QUERY_VEC)})")} AS approx_dist
    FROM recon
    WHERE vec_id IN (SELECT vec_id FROM embeddings WHERE label % 3 = 0)
    ORDER BY approx_dist ASC, vec_id ASC LIMIT {_SQ8_K}
    """,
)
def ann_sq8_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search through the SQ8 index: allowed-id
    semi-join BEFORE the dequantize-and-rank projection (only allowed
    byte rows are reconstructed; bucketed-by-id code table makes the
    semi-join shuffle-free at rest)."""
    emb = tables.load(spark, "embeddings", sf_dir)
    bounds, codes = index_store.sq8(spark, sf_dir)
    allowed = emb.filter(F.col("label") % 3 == 0).select("vec_id")
    return ann.ann_sq8_topk(
        codes, bounds, QUERY_VEC, k=_SQ8_K, round_to=6, subset=allowed
    )


@query(
    "ann_lsh_filtered_topk",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    )
    SELECT vec_id, {sql_det_round(_cos_sql("v", sql_vec(QUERY_VEC)))} AS score
    FROM sig
    WHERE ({_band_filter_sql()})
      AND vec_id IN (SELECT vec_id FROM embeddings WHERE label % 3 = 0)
    ORDER BY score DESC, vec_id
    LIMIT 50
    """,
)
def ann_lsh_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search through the LSH index: allowed-id
    semi-join AFTER the partition-pruned bucket probe, BEFORE the
    exact-cosine rank. With SQ8 and IVFPQ this closes the claim:
    EVERY ANN serving path (LSH, IVF, PQ, IVFPQ, SQ8) has a filtered
    mode with pre-filter semantics inside its pruned candidate set —
    post-filtering a top-k starves under selective predicates no
    matter which index served it."""
    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    allowed = emb.filter(F.col("label") % 3 == 0).select("vec_id")
    return ann.ann_lsh_topk(
        emb, QUERY_VEC, k=50, round_to=6, banded=banded, subset=allowed
    )


def _batch_lsh_cfg_sql(qid: int, qvec: list, qsig: str) -> str:
    flt = " OR ".join(
        f"substring(s, {b * _ROWS + 1}, {_ROWS}) = '{qband}'"
        for b, qband in ann.query_bands(qsig)
    )
    return f"""
    SELECT {qid} AS query_id, vec_id, score FROM (
      SELECT vec_id, {sql_det_round(_cos_sql("v", sql_vec(qvec)))} AS score,
             row_number() OVER (
               ORDER BY {sql_det_round(_cos_sql("v", sql_vec(qvec)))} DESC, vec_id
             ) AS rn
      FROM sig WHERE {flt}
    ) WHERE rn <= {_BATCH_IVF_K}"""


_QSIG_B = ann.signature_of(QUERY_VEC_B, _PLANES)


@query(
    "ann_lsh_batch_topk",
    oracle=f"""
    WITH sig AS MATERIALIZED (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    )
    {_batch_lsh_cfg_sql(0, QUERY_VEC, _QSIG)}
    UNION ALL
    {_batch_lsh_cfg_sql(1, QUERY_VEC_B, _QSIG_B)}
    ORDER BY query_id, score DESC, vec_id
    """,
)
def ann_lsh_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query LSH top-k (ann.batch_lsh_topk): both
    queries' band signatures computed driver-side, the union of their
    buckets read from the persisted banding in ONE partition-pruned
    pass, per-query candidate membership via a request-sized probe
    broadcast, per-query top-{k} via a window partial sort — the
    batched-serving family now covers all five paths (dense, sparse,
    PQ, IVF, LSH)."""
    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    return ann.batch_lsh_topk(
        emb,
        [(0, QUERY_VEC), (1, QUERY_VEC_B)],
        k=_BATCH_IVF_K,
        round_to=6,
        banded=banded,
    )


# ---- cascade router: LSH probe with exact-scan fallback --------------------


def _cascade_oracle(min_c: int) -> str:
    r = sql_det_round(_cos_sql("v", sql_vec(QUERY_VEC)))
    return f"""
    WITH sig AS (
      SELECT vec_id, {_V} AS v, {_sig_sql(_V)} AS s FROM embeddings
    ),
    cand AS (SELECT vec_id FROM sig WHERE {_band_filter_sql()}),
    nc AS (SELECT count(*) AS c FROM cand),
    lshr AS (
      SELECT vec_id, {r} AS score
      FROM sig JOIN cand USING (vec_id)
      ORDER BY score DESC, vec_id LIMIT 50
    ),
    exr AS (
      SELECT vec_id, {r} AS score
      FROM sig ORDER BY score DESC, vec_id LIMIT 50
    )
    SELECT vec_id, score FROM (
      SELECT * FROM lshr WHERE (SELECT c FROM nc) >= {min_c}
      UNION ALL
      SELECT * FROM exr WHERE (SELECT c FROM nc) < {min_c}
    ) ORDER BY score DESC, vec_id
    """


_CASCADE_LO, _CASCADE_HI = 10, 100_000


@query("ann_cascade_topk_pruned", oracle=_cascade_oracle(_CASCADE_LO))
def ann_cascade_topk_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade router, pruned branch live: the bucket-union candidate
    count clears the gate, so the served plan is the partition-pruned
    LSH path (ann.ann_cascade_topk scale notes; the gate probe is one
    driver-side long over the persisted banding table). Oracle mirrors
    the branch with a scalar-count predicate, so a mis-route would
    hash-mismatch."""
    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    return ann.ann_cascade_topk(
        emb, QUERY_VEC, 50, banded, min_candidates=_CASCADE_LO, round_to=6
    )


@query("ann_cascade_topk_fallback", oracle=_cascade_oracle(_CASCADE_HI))
def ann_cascade_topk_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascade router, fallback branch live: the gate is set above any
    bucket union this corpus can produce, so the router must serve the
    exact scan — worst-case recall bounded at brute-force quality
    exactly when the buckets under-populate. Same oracle shape as the
    pruned row with the opposite branch taken."""
    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    return ann.ann_cascade_topk(
        emb, QUERY_VEC, 50, banded, min_candidates=_CASCADE_HI, round_to=6
    )


# --- production-width (d=768) TUNED space-partitioning grids ----------------
#
# Space-partitioning geometry does NOT transfer across dimension
# (VERDICT r6): the d=64 defaults measure recall@50 0.34 (LSH) / 0.18
# (IVF nprobe=2) at d=768. These two grid rows pin the DIMENSION-
# DERIVED defaults (ann.lsh_geometry / ann.ivf_nprobe_frac) next to
# the legacy geometry, with candidates + hits + recall hash-matched —
# the d=768 analogue of ann_lsh_recall_grid / ann_ivf_recall_grid.
# The oracle derives the 48 hyperplanes from the SAME md5 parity rule
# the Python side uses (no 48×768 literal dump), and re-derives the
# d=768 corpus element-exactly (dense_dim768_derivation pins it).

from multi_search_retrival_big_data_spark.queries.dense_queries import (  # noqa: E402
    _D768_EX_CTE,
    _d768_qv,
    _dim768_comps_sql,
)

_D768 = 768
_D768_K = 50
_T_PLANES, _T_BANDS = ann.lsh_geometry(_D768)  # (48, 12)
_T_ROWS = _T_PLANES // _T_BANDS

_PLANES768_CTE = f"""planes AS MATERIALIZED (
      SELECT p, list(CASE WHEN substring(md5(concat(p, ':', d)), 1, 1)
                            IN ('0','2','4','6','8','a','c','e')
                          THEN CAST(1.0 AS DOUBLE)
                          ELSE CAST(-1.0 AS DOUBLE) END ORDER BY d) AS pv
      FROM range(0, {_T_PLANES}) t(p), range(0, {_D768}) u(d)
      GROUP BY p
    )"""

_SIG768_CTES = f"""{_PLANES768_CTE},
    sig AS MATERIALIZED (
      SELECT e.vec_id,
             string_agg(CASE WHEN list_dot_product(e.v, pl.pv) >= 0
                             THEN '1' ELSE '0' END, '' ORDER BY pl.p) AS s
      FROM ex e, planes pl GROUP BY e.vec_id
    ),
    qsig AS MATERIALIZED (
      SELECT string_agg(CASE WHEN list_dot_product({{qv}}, pv) >= 0
                        THEN '1' ELSE '0' END, '' ORDER BY p) AS s
      FROM planes
    )"""


def _lsh768_cond_sql(bands: int, rows: int) -> str:
    return " OR ".join(
        f"substring(g.s, {b * rows + 1}, {rows}) = substring(q.s, {b * rows + 1}, {rows})"
        for b in range(bands)
    )


def _lsh768_cfg_sql(num_planes: int, bands: int, cos: str) -> str:
    rows = num_planes // bands
    cond = _lsh768_cond_sql(bands, rows)
    cand = f"SELECT g.vec_id FROM sig g, qsig q WHERE {cond}"
    return f"""
    SELECT {num_planes} AS planes, {bands} AS bands, {_D768_K} AS k,
           (SELECT count(*) FROM ({cand}) c) AS candidates,
           (SELECT count(*) FROM (
              SELECT e.vec_id FROM ex e JOIN ({cand}) c USING (vec_id)
              ORDER BY {cos} DESC, e.vec_id LIMIT {_D768_K}) t
            JOIN exact USING (vec_id)) AS hits"""


def _lsh768_oracle() -> str:
    qv = sql_vec(_d768_qv())
    cos = sql_det_round(_cos_sql("e.v", qv))
    return (
        "WITH "
        + _D768_EX_CTE.format(comps=_dim768_comps_sql())
        + ",\n    "
        + _SIG768_CTES.format(qv=qv)
        + f""",
    exact AS MATERIALIZED (
      SELECT e.vec_id FROM ex e ORDER BY {cos} DESC, e.vec_id LIMIT {_D768_K}
    ),
    grid AS ({_lsh768_cfg_sql(ann.NUM_PLANES, ann.ANN_BANDS, cos)}
      UNION ALL {_lsh768_cfg_sql(_T_PLANES, _T_BANDS, cos)})
    SELECT planes, bands, k, candidates, hits,
           CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall
    FROM grid ORDER BY planes
    """
    )


@query("ann_lsh_d768_tuned_grid", oracle=_lsh768_oracle())
def ann_lsh_d768_tuned_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding at PRODUCTION width, legacy vs dimension-derived
    geometry: one grid row for the d=64-era (16 planes, 4 bands) and
    one for ann.lsh_geometry(768) = (48, 12) — per config the
    candidate volume (= probe scan cost), exact-cosine hit count
    against the d=768 exact top-50, and recall, all hash-matched.
    Measured at sf0.1 this is 0.34 → 0.84 recall@50 at a ~55%
    candidate fraction — the SRP geometry limit on this corpus
    (per-bit agreement for the top-50 ≈ 0.6, so deeper rows collapse
    recall; see ann.lsh_geometry scale notes). The signature pass is
    an index-build job at scale (index_store.emb_lsh_bands), never a
    per-query cost."""
    from multi_search_retrival_big_data_spark.functions.rounding import det_round
    from multi_search_retrival_big_data_spark.functions.vector import cosine_sim, lit_vec
    from multi_search_retrival_big_data_spark.operators import dense

    wide = index_store.dim_corpus(spark, sf_dir, _D768)
    qv = _d768_qv()
    exact = dense.topk_cosine(wide, qv, k=_D768_K, round_to=6).select("vec_id")

    def cfg_row(num_planes: int, bands: int) -> DataFrame:
        rows = num_planes // bands
        planes = ann.hyperplanes(_D768, num_planes)
        qsig = ann.signature_of(qv, planes)
        # Arrow signature pass (bit-identical to the packed Catalyst
        # fold — see ann.signature_bits_arrow); at (48, 768) the
        # interpreted fold costs ~180 s for a 2k-row corpus
        sig = wide.withColumn("__sig", ann.signature_bits_arrow("embedding", planes))
        cond = None
        for b, qband in ann.query_bands(qsig, bands, rows):
            c = F.substring(F.col("__sig"), b * rows + 1, rows) == F.lit(qband)
            cond = c if cond is None else cond | c
        cand = sig.filter(cond)
        n_cand = cand.agg(F.count(F.lit(1)).alias("candidates"))
        topk = (
            cand.select(
                "vec_id",
                det_round(cosine_sim("embedding", lit_vec(qv)), 6).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(_D768_K)
        )
        return grid_row(
            _D768_K, grid_hits(topk, exact), n_cand,
            planes=num_planes, bands=bands,
        )

    return union_rows(
        [cfg_row(ann.NUM_PLANES, ann.ANN_BANDS), cfg_row(_T_PLANES, _T_BANDS)]
    ).orderBy("planes")


def _ivf768_oracle() -> str:
    from multi_search_retrival_big_data_spark.queries.kmeans_sql import ivf_lloyd_ctes

    qv = sql_vec(_d768_qv())
    cos = sql_det_round(_cos_sql("e.v", qv))
    frac = repr(ann.ivf_nprobe_frac(_D768))
    lloyd, cfinal = ivf_lloyd_ctes(ann.IVF_CENTROID_STRIDE, _D768, 2)
    tuned_np = f"(SELECT CAST(ceil({frac} * max(nl)) AS INTEGER) FROM corder)"

    def cfg(np_label: str, np_bound: str) -> str:
        cand = (
            f"SELECT a.vec_id FROM tassign a JOIN corder o USING (cid) "
            f"WHERE o.rn <= {np_bound}"
        )
        return f"""
    SELECT {np_label} AS nprobe, {_D768_K} AS k,
           (SELECT count(*) FROM ({cand}) c) AS candidates,
           (SELECT count(*) FROM (
              SELECT e.vec_id FROM ex e JOIN ({cand}) c USING (vec_id)
              ORDER BY {cos} DESC, e.vec_id LIMIT {_D768_K}) t
            JOIN exact USING (vec_id)) AS hits"""

    return (
        "WITH "
        + _D768_EX_CTE.format(comps=_dim768_comps_sql())
        + f""",
    kem AS (SELECT vec_id, v FROM ex),
    {lloyd},
    tassign AS MATERIALIZED (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_distance(e.v, c.cv) ASC, c.cid ASC
               ) AS rn
        FROM kem e CROSS JOIN {cfinal} c
      ) WHERE rn = 1
    ),
    corder AS MATERIALIZED (
      SELECT cid,
             row_number() OVER (ORDER BY {_l2_sql('cv', qv)} ASC, cid ASC) AS rn,
             count(*) OVER () AS nl
      FROM {cfinal}
    ),
    exact AS MATERIALIZED (
      SELECT e.vec_id FROM ex e ORDER BY {cos} DESC, e.vec_id LIMIT {_D768_K}
    ),
    grid AS ({cfg(str(ann.IVF_NPROBE), str(ann.IVF_NPROBE))}
      UNION ALL {cfg(tuned_np, tuned_np)})
    SELECT nprobe, k, candidates, hits,
           CAST(hits AS DOUBLE) / CAST(k AS DOUBLE) AS recall
    FROM grid ORDER BY nprobe
    """
    )


@query("ann_ivf_d768_tuned_grid", oracle=_ivf768_oracle())
def ann_ivf_d768_tuned_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-quantizer IVF at PRODUCTION width, legacy vs
    dimension-derived probe depth: one grid row for the d=64-era
    nprobe=2 and one for nprobe = ⌈ann.ivf_nprobe_frac(768) · nlist⌉,
    per config candidates + hits + recall hash-matched. The oracle
    re-runs the full deterministic Lloyd training at d=768
    (kmeans_sql.ivf_lloyd_ctes over the re-derived wide corpus), so
    this row also proves the trained model at width. Measured at
    sf0.1: 0.18 → ≥0.8 recall@50 around 60% of cells probed — cell
    boundaries stop separating neighbors as angles concentrate (see
    ann.ivf_nprobe_frac). Training is a build-time job; the serving
    plan probes the persisted cid-partitioned lists."""
    import math as _math

    from multi_search_retrival_big_data_spark.functions.rounding import det_round
    from multi_search_retrival_big_data_spark.functions.vector import (
        cosine_sim,
        l2_dist,
        lit_vec,
    )
    from multi_search_retrival_big_data_spark.operators import dense

    wide = index_store.dim_corpus(spark, sf_dir, _D768)
    qv = _d768_qv()
    cents_df, assign = index_store.ivf_trained_dim(spark, sf_dir, _D768, iters=2)
    nlist = cents_df.count()
    exact = dense.topk_cosine(wide, qv, k=_D768_K, round_to=6).select("vec_id")

    def cfg_row(nprobe: int) -> DataFrame:
        probed = (
            cents_df.select("cid", l2_dist("cv", lit_vec(qv)).alias("__d"))
            .orderBy(F.asc("__d"), F.asc("cid"))
            .limit(nprobe)
            .select("cid")
        )
        cand = assign.join(F.broadcast(probed), "cid")
        n_cand = cand.agg(F.count(F.lit(1)).alias("candidates"))
        topk = (
            cand.select(
                "vec_id",
                det_round(cosine_sim("embedding", lit_vec(qv)), 6).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(_D768_K)
        )
        return grid_row(_D768_K, grid_hits(topk, exact), n_cand, nprobe=nprobe)

    tuned = _math.ceil(ann.ivf_nprobe_frac(_D768) * nlist)
    return union_rows([cfg_row(ann.IVF_NPROBE), cfg_row(tuned)]).orderBy("nprobe")


# ---- family recall grids (registry consolidation, r7 verdict item 4) -------
#
# The per-path recall/tuning grids above stay as capability code (each
# builds its own index variant and measures the recall-vs-cost trade),
# but registering ~12 near-identical 2-3-row grid outputs separately
# stretched the driver's 50-row proof-rotation cycle past 4 rounds.
# Each FAMILY row below unions its members under a normalized schema —
# (variant, config, k, [candidates,] hits, recall) — absorbing the
# member registrations: the member's Spark plan AND its full oracle SQL
# run unchanged inside the union, so nothing is lost but registry rows.

from multi_search_retrival_big_data_spark.queries import REGISTRY as _REG  # noqa: E402


def _absorb(name: str):
    qd = _REG.pop(name)
    return qd.fn, qd.oracle


def _fam_oracle(parts, with_candidates: bool) -> str:
    sels = []
    for variant, (_, oracle), cols in parts:
        if cols:
            cfg = "concat_ws(',', " + ", ".join(
                f"concat('{c}=', CAST({c} AS VARCHAR))" for c in cols
            ) + ")"
        else:
            cfg = "''"
        cand = "candidates, " if with_candidates else ""
        sels.append(
            f"SELECT '{variant}' AS variant, {cfg} AS config, k, {cand}hits, recall"
            f" FROM (\n{oracle}\n)"
        )
    return "\nUNION ALL\n".join(sels) + "\nORDER BY variant, config"


def _fam_fn(parts, with_candidates: bool):
    keep = ["k"] + (["candidates"] if with_candidates else []) + ["hits", "recall"]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        outs = []
        for variant, (f_, _), cols in parts:
            df = f_(spark, sf_dir)
            cfg = (
                F.concat_ws(
                    ",",
                    *[
                        F.concat(F.lit(f"{c}="), F.col(c).cast("string"))
                        for c in cols
                    ],
                )
                if cols
                else F.lit("")
            )
            outs.append(
                df.select(
                    F.lit(variant).alias("variant"), cfg.alias("config"), *keep
                )
            )
        out = outs[0]
        for o in outs[1:]:
            out = out.union(o)
        return out.orderBy("variant", "config")

    return fn


def _register_family(name: str, parts, with_candidates: bool, doc: str) -> None:
    fn = _fam_fn(parts, with_candidates)
    fn.__name__ = name
    fn.__doc__ = doc
    query(name, oracle=_fam_oracle(parts, with_candidates))(fn)


_register_family(
    "ann_lsh_family_grid",
    [
        ("bands", _absorb("ann_lsh_recall_grid"), ["bands"]),
        ("multiprobe", _absorb("ann_lsh_multiprobe_recall_grid"), ["probe_level"]),
        ("d768_tuned", _absorb("ann_lsh_d768_tuned_grid"), ["planes", "bands"]),
    ],
    with_candidates=True,
    doc="""LSH recall/tuning family grid: the bands sweep (recall bought
    with wider banding), the multi-probe sweep (recall bought with
    neighbor buckets at fixed banding), and the d=768 tuned geometry
    pair (dimension-derived ann.lsh_geometry vs the d=64 default) in
    one normalized (variant, config, k, candidates, hits, recall)
    output — each member's plan and oracle run unchanged.""",
)

_register_family(
    "ann_ivf_family_grid",
    [
        ("stride", _absorb("ann_ivf_recall_grid"), ["nprobe"]),
        ("trained", _absorb("ann_ivf_trained_recall_grid"), ["nprobe"]),
        ("filtered", _absorb("ann_ivf_filtered_recall_grid"), ["sel", "nprobe"]),
        ("d768_tuned", _absorb("ann_ivf_d768_tuned_grid"), ["nprobe"]),
    ],
    with_candidates=True,
    doc="""IVF recall/tuning family grid: nprobe sweeps over the
    stride-seeded and Lloyd-trained quantizers, the filtered-search
    selectivity grid, and the d=768 tuned probe fraction
    (ann.ivf_nprobe_frac), normalized to (variant, config, k,
    candidates, hits, recall).""",
)

_register_family(
    "ann_pq_family_grid",
    [
        ("pq_adc", _absorb("ann_pq_recall_grid"), ["r"]),
        ("pq_rerank", _absorb("ann_pq_rerank_recall_grid"), ["shortlist"]),
        ("pq_trained", _absorb("ann_pq_trained_recall_grid"), ["shortlist"]),
        ("pq_filtered", _absorb("ann_pq_filtered_recall_grid"), ["sel", "r"]),
        ("ivfpq", _absorb("ann_ivfpq_recall_grid"), ["nprobe", "shortlist"]),
        ("sq8", _absorb("ann_sq8_recall"), []),
    ],
    with_candidates=False,
    doc="""Quantized-path recall family grid: PQ ADC, PQ re-rank
    shortlist sweep (stride and trained codebooks), filtered PQ,
    IVF-PQ, and SQ8, normalized to (variant, config, k, hits,
    recall) — the recall ledger of every compressed serving path.""",
)
