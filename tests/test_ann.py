from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark import tables
from multi_search_retrival_big_data_spark.operators import ann, dense
from multi_search_retrival_big_data_spark.queries.common import EMB_DIM, QUERY_VEC


def test_hyperplanes_deterministic_and_pm1():
    p1 = ann.hyperplanes(8, 4)
    p2 = ann.hyperplanes(8, 4)
    assert p1 == p2
    assert all(v in (1.0, -1.0) for plane in p1 for v in plane)


@pytest.mark.slow
def test_engine_signature_matches_python(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir).limit(20)
    planes = ann.hyperplanes(EMB_DIM, ann.NUM_PLANES)
    rows = emb.select(
        "vec_id", "embedding", ann.signature_bits("embedding", planes).alias("sig")
    ).collect()
    for r in rows:
        assert r["sig"] == ann.signature_of(r["embedding"], planes)


def test_ann_topk_subset_of_exact_with_same_scores(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    exact = {
        r["vec_id"]: r["score"]
        for r in dense.topk_cosine(emb, QUERY_VEC, k=1000, round_to=6).collect()
    }
    approx = ann.ann_lsh_topk(emb, QUERY_VEC, k=20, round_to=6).collect()
    assert len(approx) > 0
    for r in approx:
        assert math.isclose(exact[r["vec_id"]], r["score"], abs_tol=1e-9)


@pytest.mark.slow
def test_near_dup_lsh_subset_of_exact(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    t = 0.3
    exact = {
        (r["id_a"], r["id_b"])
        for r in ann.embedding_near_dup_pairs(emb, t, use_lsh=False, round_to=6).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in ann.embedding_near_dup_pairs(emb, t, dim=EMB_DIM, use_lsh=True, round_to=6).collect()
    }
    assert lsh <= exact


@pytest.mark.slow
def test_identical_vectors_always_collide(spark):
    # identical vectors share every band → LSH near-dup must find them
    base = [math.sin(i) for i in range(8)]
    rows = [(1, base), (2, base), (3, [-v for v in base])]
    emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = ann.embedding_near_dup_pairs(emb, 0.99, dim=8, use_lsh=True, round_to=6)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(1, 2)}


def test_ivf_topk_subset_of_exact_with_same_scores(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    exact = {
        r["vec_id"]: r["score"]
        for r in dense.topk_cosine(emb, QUERY_VEC, k=1000, round_to=6).collect()
    }
    approx = ann.ann_ivf_topk(emb, QUERY_VEC, k=20, round_to=6).collect()
    assert len(approx) > 0
    for r in approx:
        assert math.isclose(exact[r["vec_id"]], r["score"], abs_tol=1e-9)


def test_ivf_assignment_is_nearest_centroid(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir).limit(50)
    cent, assign = ann.ivf_assign(emb)
    cents = {r["cid"]: r["__cv"] for r in cent.collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    got = {r["vec_id"]: r["cid"] for r in assign.collect()}
    for vid, vec in vecs.items():
        dists = {
            cid: sum((float(a) - float(b)) ** 2 for a, b in zip(vec, cv))
            for cid, cv in cents.items()
        }
        best = min(dists.items(), key=lambda kv: (kv[1], kv[0]))[0]
        assert got[vid] == best


def test_recall_at_k_query_shape_and_bounds(spark, sf_dir):
    from multi_search_retrival_big_data_spark.queries.ann_queries import ann_recall_at_k

    rows = {r.method: r for r in ann_recall_at_k(spark, sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf"}
    for r in rows.values():
        assert r.k == 50
        assert 0 <= r.hits <= r.k
        assert abs(r.recall - r.hits / 50.0) < 1e-12


def test_near_dup_arrow_strategy_matches_expr(spark, sf_dir):
    """Both physical strategies for LSH near-dup scoring produce the
    same pair set with the same rounded cosines."""
    emb = tables.load(spark, "embeddings", sf_dir)
    expr_rows = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in ann.embedding_near_dup_pairs(
            emb, 0.45, dim=EMB_DIM, use_lsh=True, round_to=6
        ).collect()
    )
    arrow_rows = sorted(
        (r.id_a, r.id_b, r.cosine)
        for r in ann.embedding_near_dup_pairs(
            emb, 0.45, dim=EMB_DIM, use_lsh=True, round_to=6, strategy="arrow"
        ).collect()
    )
    assert [(a, b) for a, b, _ in arrow_rows] == [(a, b) for a, b, _ in expr_rows]
    for (_, _, ca), (_, _, ce) in zip(arrow_rows, expr_rows):
        assert abs(ca - ce) < 1e-6


@pytest.mark.slow
def test_lsh_recall_grid_monotone_in_bands(spark, sf_dir):
    """More, shorter bands probe more buckets: candidate volume and
    recall are non-decreasing in the band count."""
    from multi_search_retrival_big_data_spark.queries.ann_queries import (
        ann_lsh_recall_grid,
    )

    rows = ann_lsh_recall_grid(spark, sf_dir).collect()
    assert [r.bands for r in rows] == [2, 4, 8]
    cands = [r.candidates for r in rows]
    recalls = [r.recall for r in rows]
    assert cands == sorted(cands)
    assert recalls == sorted(recalls)


def test_ivf_query_plan_has_no_quantizer_recompute(spark, sf_dir):
    """With precomputed inverted lists the executed query plan must
    not re-run the coarse-quantizer assignment (corpus × centroids
    argmin = a per-vec_id row_number window). The only windows/joins
    allowed are the nprobe probe + pruned candidate join."""
    from multi_search_retrival_big_data_spark import index_store, tables
    from multi_search_retrival_big_data_spark.operators import ann

    emb = tables.load(spark, "embeddings", sf_dir)
    assign = index_store.ivf_assignments(spark, sf_dir)
    df = ann.ann_ivf_topk(emb, [0.1] * 64, k=10, round_to=6, assign=assign)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan
    assert "msrbd_ivf" in plan  # reads the stored assignment table


def test_ivf_stored_matches_inline(spark, sf_dir):
    from multi_search_retrival_big_data_spark import index_store, tables
    from multi_search_retrival_big_data_spark.operators import ann

    emb = tables.load(spark, "embeddings", sf_dir)
    assign = index_store.ivf_assignments(spark, sf_dir)
    q = [0.3] * 32 + [-0.2] * 32
    a = ann.ann_ivf_topk(emb, q, k=20, round_to=6).collect()
    b = ann.ann_ivf_topk(emb, q, k=20, round_to=6, assign=assign).collect()
    assert [(r["vec_id"], r["score"]) for r in a] == [(r["vec_id"], r["score"]) for r in b]


def test_pq_encode_wide_schema_and_code_range(spark, sf_dir):
    from multi_search_retrival_big_data_spark import tables
    from multi_search_retrival_big_data_spark.operators import ann

    emb = tables.load(spark, "embeddings", sf_dir)
    codes = ann.pq_encode(emb)
    assert codes.columns == ["vec_id"] + [f"c{i}" for i in range(ann.PQ_M)]
    rows = codes.collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        for i in range(ann.PQ_M):
            assert 0 <= r[f"c{i}"] < ann.PQ_KS


def test_pq_training_vectors_encode_to_own_codes(spark, sf_dir):
    """A training vector's sub-slices are at distance 0 from their own
    codebook entry, so vector j*stride must encode to code j in every
    sub-space."""
    from multi_search_retrival_big_data_spark import tables
    from multi_search_retrival_big_data_spark.operators import ann
    from pyspark.sql import functions as F

    emb = tables.load(spark, "embeddings", sf_dir)
    codes = ann.pq_encode(emb).filter(
        (F.col("vec_id") % ann.PQ_STRIDE == 0)
        & (F.col("vec_id") < ann.PQ_KS * ann.PQ_STRIDE)
    )
    for r in codes.collect():
        j = r["vec_id"] // ann.PQ_STRIDE
        assert all(r[f"c{i}"] == j for i in range(ann.PQ_M)), r


def test_pq_adc_no_shuffle_and_reads_code_table(spark, sf_dir):
    from multi_search_retrival_big_data_spark import index_store, tables
    from multi_search_retrival_big_data_spark.operators import ann
    from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC

    emb = tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    df = ann.ann_pq_adc_topk(emb, codes, QUERY_VEC, k=10, round_to=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "msrbd_pq" in plan           # reads the persisted code table
    assert "BroadcastHashJoin" in plan  # LUTs arrive by broadcast
    # the only acceptable exchange is the broadcast itself — no
    # hash-partition shuffle anywhere in the ADC path
    assert "hashpartitioning" not in plan


def test_ivfpq_residuals_reconstruct(spark):
    from multi_search_retrival_big_data_spark.operators import ann as _ann

    rows = [(i, [float(i), float(-i), 1.0, 0.5]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    cents = [(0, [0.0, 0.0, 1.0, 0.5]), (10, [10.0, -10.0, 1.0, 0.5])]
    res = _ann.ivfpq_residuals(emb, cents)
    got = {r["vec_id"]: (r["cid"], r["r"]) for r in res.collect()}
    cent = dict(cents)
    for i, v in rows:
        cid, r = got[i]
        # centroid + residual reconstructs the vector exactly
        rec = [c + x for c, x in zip(cent[cid], r)]
        assert rec == v, (i, cid, rec, v)


def test_ivfpq_adc_candidates_come_from_probed_cells(spark, sf_dir):
    from multi_search_retrival_big_data_spark import index_store
    from multi_search_retrival_big_data_spark.operators import ann as _ann
    from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC

    cents_t, book_t, codes_t = index_store.ivfpq(spark, sf_dir)
    out = _ann.ann_ivfpq_adc_topk(
        codes_t, cents_t, book_t, QUERY_VEC, k=500, nprobe=2, round_to=6
    )
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec
    from pyspark.sql import functions as F

    probed = {
        r["cid"]
        for r in cents_t.select(
            "cid", l2_dist("cv", lit_vec(QUERY_VEC)).alias("d")
        )
        .orderBy("d", "cid")
        .limit(2)
        .collect()
    }
    member_cids = {
        r["cid"]
        for r in codes_t.join(out.select("vec_id"), "vec_id", "left_semi")
        .select("cid")
        .distinct()
        .collect()
    }
    assert member_cids <= probed
    assert out.count() > 0


def test_sq8_roundtrip_error_bounded(spark):
    from multi_search_retrival_big_data_spark.operators import ann as _ann
    from pyspark.sql import functions as F

    rows = [(i, [(-1) ** i * (i / 7.0), 0.25 * i, -3.0 + i]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    bounds = _ann.sq8_train(emb, dim=3)
    codes = _ann.sq8_encode(emb, bounds)
    b = {int(r["dim"]): (r["vmin"], r["vmax"]) for r in bounds.collect()}
    got = {r["vec_id"]: r["codes"] for r in codes.collect()}
    for i, v in rows:
        for j, x in enumerate(v):
            lo, hi = b[j]
            code = got[i][j]
            assert 0 <= code <= 255
            recon = lo + code * (hi - lo) / 255.0
            # reconstruction error bounded by half a quantization step
            assert abs(recon - x) <= (hi - lo) / 255.0 / 2 + 1e-12


def test_batch_pq_adc_matches_single_query(spark, sf_dir):
    from multi_search_retrival_big_data_spark import index_store
    from multi_search_retrival_big_data_spark.operators import ann as _ann
    from multi_search_retrival_big_data_spark.queries.common import (
        QUERY_VEC,
        QUERY_VEC_B,
    )
    from multi_search_retrival_big_data_spark import tables as _tables

    emb = _tables.load(spark, "embeddings", sf_dir)
    codes = index_store.pq_codes(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in QUERY_VEC]), (1, [float(x) for x in QUERY_VEC_B])],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    batch = _ann.batch_pq_adc_topk(emb, codes, qdf, k=10, round_to=6).collect()
    for qi, qv in ((0, QUERY_VEC), (1, QUERY_VEC_B)):
        single = _ann.ann_pq_adc_topk(emb, codes, qv, k=10, round_to=6).collect()
        got = [(r["vec_id"], r["approx_dist"]) for r in batch if r["query_id"] == qi]
        assert got == [(r["vec_id"], r["approx_dist"]) for r in single]


@pytest.mark.slow
def test_literal_lut_matches_join_path(spark, sf_dir):
    """The serving fast path (driver-collected codebook -> literal
    element_at LUTs, zero joins) must reproduce the join-LUT plan's
    output bit-for-bit — the LUT entries are computed with the same
    left-to-right double arithmetic as the in-plan expression."""
    from multi_search_retrival_big_data_spark import index_store

    book, codes = index_store.pq_trained(spark, sf_dir, iters=2)
    emb = tables.load(spark, "embeddings", sf_dir)
    kw = dict(k=20, shortlist=60, m=ann.PQT_M, round_to=None, codebook=book)
    joins = ann.ann_pq_rerank_topk(emb, codes, QUERY_VEC, **kw).collect()
    lits = ann.ann_pq_rerank_topk(
        emb, codes, QUERY_VEC, literal_lut=True, **kw
    ).collect()
    assert [(r["vec_id"], r["dist"]) for r in lits] == [
        (r["vec_id"], r["dist"]) for r in joins
    ]
    # zero joins in the fast path's shortlist stage
    plan = (
        ann.ann_pq_adc_topk(
            emb, codes, QUERY_VEC, k=60, m=ann.PQT_M,
            codebook=book, literal_lut=True,
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan


def test_literal_lut_requires_codebook(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    with pytest.raises(ValueError, match="persisted codebook"):
        ann.ann_pq_adc_topk(emb, emb, QUERY_VEC, k=5, literal_lut=True)


def test_ivfpq_literal_lut_matches_join_path(spark, sf_dir):
    """The IVFPQ serving fast path (driver-side probe selection +
    per-cell literal LUTs + static cid IN partition filter) must
    reproduce the join-LUT plan's output bit-for-bit."""
    from multi_search_retrival_big_data_spark import index_store

    cents_t, book_t, codes_t = index_store.ivfpq(spark, sf_dir, iters=2)
    kw = dict(k=30, nprobe=2, round_to=None)
    joins = ann.ann_ivfpq_adc_topk(
        codes_t, cents_t, book_t, QUERY_VEC, **kw
    ).collect()
    lits_df = ann.ann_ivfpq_adc_topk(
        codes_t, cents_t, book_t, QUERY_VEC, literal_lut=True, **kw
    )
    lits = lits_df.collect()
    assert [(r["vec_id"], r["approx_dist"]) for r in lits] == [
        (r["vec_id"], r["approx_dist"]) for r in joins
    ]
    plan = lits_df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "PartitionFilters: [cid" in plan  # static prune, no runtime subquery


def test_batch_literal_lut_matches_join_path(spark, sf_dir):
    emb = tables.load(spark, "embeddings", sf_dir)
    from multi_search_retrival_big_data_spark import index_store
    from multi_search_retrival_big_data_spark.queries.common import (
        QUERY_VEC_B,
    )

    codes = index_store.pq_codes(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in QUERY_VEC]), (1, [float(x) for x in QUERY_VEC_B])],
        "query_id INT, qvec ARRAY<DOUBLE>",
    )
    kw = dict(k=15, round_to=None)
    joins = ann.batch_pq_adc_topk(emb, codes, qdf, **kw).collect()
    lits_df = ann.batch_pq_adc_topk(
        emb, codes, qdf, codebook=ann.pq_codebook(emb), literal_lut=True, **kw
    )
    lits = lits_df.collect()
    key = lambda r: (r["query_id"], r["vec_id"], r["approx_dist"])  # noqa: E731
    assert [key(r) for r in lits] == [key(r) for r in joins]
    plan = lits_df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_multiprobe_values_hamming1():
    from multi_search_retrival_big_data_spark.operators import ann

    vals = ann.multiprobe_values("0110")
    assert vals[0] == "0110"
    assert sorted(vals[1:]) == sorted(["1110", "0010", "0100", "0111"])
    assert len(set(vals)) == 5


def test_multiprobe_candidates_superset_of_plain(spark, sf_dir):
    from multi_search_retrival_big_data_spark import tables
    from multi_search_retrival_big_data_spark.operators import ann
    from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC

    emb = tables.load(spark, "embeddings", sf_dir)
    plain = ann.ann_lsh_topk(emb, QUERY_VEC, k=1000, round_to=6)
    multi = ann.ann_lsh_multiprobe_topk(emb, QUERY_VEC, k=1000, round_to=6)
    p = {r["vec_id"] for r in plain.collect()}
    m = {r["vec_id"] for r in multi.collect()}
    assert p <= m  # Hamming-0 buckets are in the Hamming-<=1 probe set


def test_batch_ivf_matches_per_query_path(spark, sf_dir):
    from multi_search_retrival_big_data_spark import tables
    from multi_search_retrival_big_data_spark.operators import ann
    from multi_search_retrival_big_data_spark.queries.common import (
        QUERY_VEC,
        QUERY_VEC_B,
    )

    emb = tables.load(spark, "embeddings", sf_dir)
    batch = ann.batch_ivf_topk(
        emb, [(0, QUERY_VEC), (1, QUERY_VEC_B)], k=20, round_to=6
    ).collect()
    for qid, qv in [(0, QUERY_VEC), (1, QUERY_VEC_B)]:
        single = ann.ann_ivf_topk(emb, qv, k=20, round_to=6).collect()
        got = [(r["vec_id"], r["score"]) for r in batch if r["query_id"] == qid]
        want = [(r["vec_id"], r["score"]) for r in single]
        assert got == want


def test_filtered_lsh_subset_and_prefix(spark, sf_dir):
    from multi_search_retrival_big_data_spark import index_store, tables
    from multi_search_retrival_big_data_spark.operators import ann
    from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC
    from pyspark.sql import functions as F

    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    allowed = emb.filter(F.col("label") % 3 == 0).select("vec_id")
    out = ann.ann_lsh_topk(
        emb, QUERY_VEC, k=50, round_to=6, banded=banded, subset=allowed
    ).collect()
    allow = {r["vec_id"] for r in allowed.collect()}
    assert out and all(r["vec_id"] in allow for r in out)
    # filtered result = unfiltered candidates ∩ allowed, re-ranked
    full = ann.ann_lsh_topk(
        emb, QUERY_VEC, k=10**6, round_to=6, banded=banded
    ).collect()
    want = [
        (r["vec_id"], r["score"]) for r in full if r["vec_id"] in allow
    ][:50]
    assert [(r["vec_id"], r["score"]) for r in out] == want


def test_batch_lsh_matches_per_query_path(spark, sf_dir):
    from multi_search_retrival_big_data_spark import index_store, tables
    from multi_search_retrival_big_data_spark.operators import ann
    from multi_search_retrival_big_data_spark.queries.common import (
        QUERY_VEC,
        QUERY_VEC_B,
    )

    emb = tables.load(spark, "embeddings", sf_dir)
    banded = index_store.emb_lsh_bands(spark, sf_dir)
    batch = ann.batch_lsh_topk(
        emb, [(0, QUERY_VEC), (1, QUERY_VEC_B)], k=20, round_to=6, banded=banded
    ).collect()
    for qid, qv in [(0, QUERY_VEC), (1, QUERY_VEC_B)]:
        single = ann.ann_lsh_topk(emb, qv, k=20, round_to=6, banded=banded).collect()
        got = [(r["vec_id"], r["score"]) for r in batch if r["query_id"] == qid]
        want = [(r["vec_id"], r["score"]) for r in single]
        assert got == want


def test_cascade_router_branches(spark):
    from multi_search_retrival_big_data_spark.operators import ann
    from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC

    import math
    emb = spark.createDataFrame(
        [(i, [math.sin(i * 0.7 + j) for j in range(64)]) for i in range(40)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    banded = ann.banded_signatures(emb)
    lo = ann.ann_cascade_topk(emb, QUERY_VEC, 5, banded, min_candidates=1, round_to=6)
    hi = ann.ann_cascade_topk(emb, QUERY_VEC, 5, banded, min_candidates=10_000, round_to=6)
    lsh_rows = lo.collect()
    hi_rows = hi.collect()
    # fallback branch == the exact scan top-k (independent recompute)
    from multi_search_retrival_big_data_spark.operators import dense

    exact = dense.topk_cosine(emb, QUERY_VEC, k=5, round_to=6).collect()
    assert [(r.vec_id, r.score) for r in hi_rows] == [
        (r.vec_id, r.score) for r in exact
    ]
    # pruned branch serves only bucket candidates, ranked by the SAME
    # det-rounded cosine — scores agree wherever ids overlap
    assert 0 < len(lsh_rows) <= 5
    hi_scores = {r.vec_id: r.score for r in hi_rows}
    for r in lsh_rows:
        if r.vec_id in hi_scores:
            assert r.score == hi_scores[r.vec_id]


def test_signature_bits_packed_matches_unpacked(spark):
    from multi_search_retrival_big_data_spark.operators import ann
    from multi_search_retrival_big_data_spark.queries.common import EMB_DIM

    emb = spark.createDataFrame(
        [(i, [((i * 7 + j * 13) % 19 - 9) / 4.0 for j in range(EMB_DIM)])
         for i in range(40)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    planes = ann.hyperplanes(EMB_DIM, ann.NUM_PLANES)
    a = emb.select("vec_id", ann.signature_bits("embedding", planes).alias("s"))
    b = emb.select("vec_id", ann.signature_bits_packed("embedding", planes).alias("s"))
    assert {(r.vec_id, r.s) for r in a.collect()} == {
        (r.vec_id, r.s) for r in b.collect()
    }


def test_signature_bits_packed_rejects_non_sign_planes(spark):
    import pytest as _pytest

    from multi_search_retrival_big_data_spark.operators import ann

    with _pytest.raises(ValueError, match="±1"):
        ann.signature_bits_packed("embedding", [[0.5, -1.0]])


# ---- corpus-derived nlist retrain policy -------------------------------


def test_ivf_nlist_policy_values():
    from multi_search_retrival_big_data_spark.operators import ann

    assert ann.ivf_nlist(1) == 1
    assert ann.ivf_nlist(62) == 1
    assert ann.ivf_nlist(63) == 2
    assert ann.ivf_nlist(620_000) == 10_000
    # expected cell population stays ~= target at any corpus size
    for n in (1_000, 50_000, 2_000_000):
        nlist = ann.ivf_nlist(n)
        assert n / nlist <= ann.IVF_TARGET_CELL
        assert n / nlist > ann.IVF_TARGET_CELL / 2


def test_ivf_retrain_arms_cells_stay_flat(spark, sf_dir):
    from pyspark.sql import functions as F

    from multi_search_retrival_big_data_spark import index_store

    fa, ra, grown = index_store.ivf_retrain_arms(spark, sf_dir, growth=4)
    assert grown.count() == 4 * 500
    fmax = fa.groupBy("cid").count().agg(F.max("count")).collect()[0][0]
    rmax = ra.groupBy("cid").count().agg(F.max("count")).collect()[0][0]
    fcells = fa.select("cid").distinct().count()
    rcells = ra.select("cid").distinct().count()
    # retrained nlist scales with the grown corpus; frozen stays at the
    # build-time count, so its cells hold ~growth x the members
    assert rcells > fcells
    assert rmax < fmax


def test_signature_bits_arrow_bit_identical_at_width(spark, sf_dir):
    """The Arrow signature twin must produce EXACTLY the packed
    Catalyst fold's bits at the production geometry (48 planes ×
    d=768) — this is what licenses swapping it into the oracle-checked
    d=768 rows and the index builds (ann.signature_bits_arrow's
    identity argument, pinned on real data)."""
    wide = dense.expand_to_dim(
        tables.load(spark, "embeddings", sf_dir).limit(40), out_dim=768, in_dim=EMB_DIM
    )
    planes = ann.hyperplanes(768, 48)
    got = wide.select(
        "vec_id",
        ann.signature_bits_arrow("embedding", planes).alias("a"),
        ann.signature_bits_packed("embedding", planes).alias("p"),
    ).collect()
    assert len(got) == 40
    for r in got:
        assert r["a"] == r["p"], f"vec {r['vec_id']}: arrow != packed"


def test_assign_cid_arrow_bit_identical_at_width(spark, sf_dir):
    """kmeans._assign_cid_arrow vs the literal-struct argmin on real
    d=768 vectors: same cid for every row (distance folds, sqrt, and
    the (d, cid) tiebreak all bit-equal)."""
    from multi_search_retrival_big_data_spark.operators import kmeans

    wide = dense.expand_to_dim(
        tables.load(spark, "embeddings", sf_dir).limit(40), out_dim=768, in_dim=EMB_DIM
    )
    cents = kmeans.stride_init(wide, stride=7)  # several d=768 centroids
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec

    literal = F.array_min(
        F.array(
            *[
                F.struct(
                    l2_dist("embedding", lit_vec(cv)).alias("d"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, cv in cents
            ]
        )
    ).getField("cid")
    got = wide.select(
        "vec_id",
        literal.alias("lit_cid"),
        kmeans._assign_cid_arrow("embedding", cents).alias("arrow_cid"),
    ).collect()
    assert len(got) == 40
    for r in got:
        assert r["lit_cid"] == r["arrow_cid"], f"vec {r['vec_id']}"


def test_assign_cid_arrow_bit_identical_under_ties(spark, sf_dir):
    """Adversarial tie geometry for the GEMM-prefilter argmin: the
    centroid set contains EXACT DUPLICATES (a planted viral cell's
    shape — stride_init can sample two near-identical vectors) and a
    centroid equal to a data row (distance exactly 0). The prefilter's
    margin must surface every tied candidate and the exact re-rank
    must keep the LOWEST cid, matching the literal-struct argmin."""
    from multi_search_retrival_big_data_spark.functions.vector import l2_dist, lit_vec
    from multi_search_retrival_big_data_spark.operators import kmeans

    emb = tables.load(spark, "embeddings", sf_dir).limit(60)
    rows = emb.select("embedding").limit(3).collect()
    v0 = [float(x) for x in rows[0]["embedding"]]
    v1 = [float(x) for x in rows[1]["embedding"]]
    # cids deliberately non-contiguous; centroid 7 duplicates 3, and 3
    # equals a real data row (zero distance, tie between cid 3 and 7)
    cents = [(3, v0), (5, v1), (7, list(v0)), (11, [x + 1e-13 for x in v0])]
    literal = F.array_min(
        F.array(
            *[
                F.struct(
                    l2_dist("embedding", lit_vec(cv)).alias("d"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, cv in cents
            ]
        )
    ).getField("cid")
    got = emb.select(
        "vec_id",
        literal.alias("lit_cid"),
        kmeans._assign_cid_arrow("embedding", cents).alias("arrow_cid"),
    ).collect()
    assert len(got) == 60
    for r in got:
        assert r["lit_cid"] == r["arrow_cid"], f"vec {r['vec_id']}"


@pytest.mark.slow
def test_pq_codes_arrow_bit_identical_at_width(spark, sf_dir):
    """ann.pq_codes_arrow vs the broadcast-join MIN(struct) argmin at
    the trained d=768 geometry (M=16, KS=32, dsub=48), BOTH rank
    spellings — squared (d·d after sqrt, the stride oracle's) and
    unsquared (the trainer's). Equal codes for every row licenses the
    Arrow dispatch inside pq_encode/train_lloyd_pq."""
    wide = dense.expand_to_dim(
        tables.load(spark, "embeddings", sf_dir).limit(30), out_dim=768, in_dim=EMB_DIM
    )
    from multi_search_retrival_big_data_spark.operators import kmeans

    init = kmeans.pq_stride_init(wide, dim=768, m=ann.PQT_M, ks=ann.PQT_KS, stride=1)
    book_rows = [
        (int(mi), int(code), [float(x) for x in cv])
        for mi, book in sorted(init.items())
        for code, cv in book
    ]
    cb = spark.createDataFrame(book_rows, "m INT, code INT, cv ARRAY<DOUBLE>")
    for squared in (True, False):
        a = ann.pq_encode(
            wide, dim=768, m=ann.PQT_M, ks=ann.PQT_KS,
            codebook=cb, squared=squared, use_arrow=True,
        ).collect()
        b = ann.pq_encode(
            wide, dim=768, m=ann.PQT_M, ks=ann.PQT_KS,
            codebook=cb, squared=squared, use_arrow=False,
        ).collect()
        ka = sorted(tuple(r) for r in a)
        kb = sorted(tuple(r) for r in b)
        assert ka == kb, f"squared={squared}: arrow != join"


def test_pq_codes_arrow_bit_identical_under_ties(spark, sf_dir):
    """GEMM-prefilter tie handling in pq_codes_arrow: codebooks with
    EXACT DUPLICATE codewords (and one codeword equal to a data
    sub-vector → zero distance) must keep the LOWEST code, matching the
    broadcast-join MIN(struct(dist, code)) tiebreak, for BOTH rank
    spellings."""
    emb = tables.load(spark, "embeddings", sf_dir).limit(40)
    m_count, dsub = 4, EMB_DIM // 4
    row = [float(x) for x in emb.limit(1).collect()[0]["embedding"]]
    book_rows = []
    for mi in range(m_count):
        sub = row[mi * dsub : (mi + 1) * dsub]
        book_rows += [
            (mi, 0, [x + 0.5 for x in sub]),
            (mi, 1, list(sub)),       # equals a real sub-vector
            (mi, 2, list(sub)),       # exact duplicate of code 1
            (mi, 3, [x + 1e-13 for x in sub]),
        ]
    cb = spark.sparkSession.createDataFrame(
        book_rows, "m INT, code INT, cv ARRAY<DOUBLE>"
    ) if hasattr(spark, "sparkSession") else spark.createDataFrame(
        book_rows, "m INT, code INT, cv ARRAY<DOUBLE>"
    )
    for squared in (True, False):
        a = ann.pq_encode(
            emb, dim=EMB_DIM, m=m_count, ks=4,
            codebook=cb, squared=squared, use_arrow=True,
        ).collect()
        b = ann.pq_encode(
            emb, dim=EMB_DIM, m=m_count, ks=4,
            codebook=cb, squared=squared, use_arrow=False,
        ).collect()
        ka = sorted(tuple(r) for r in a)
        kb = sorted(tuple(r) for r in b)
        assert ka == kb, f"squared={squared}: arrow != join under ties"


def test_ranked_cosine_topk_arrow_matches_expr_at_768(spark, sf_dir):
    """The width-gated serving rank (r11): at d=768 the Arrow BLAS path
    must produce the same top-k ids and quantized scores as the proven
    Catalyst fold (which d<256 corpora keep executing)."""
    from multi_search_retrival_big_data_spark import tables
    from multi_search_retrival_big_data_spark.encoders import dim_expand_encode
    from multi_search_retrival_big_data_spark.operators import dense
    from multi_search_retrival_big_data_spark.queries.common import QUERY_VEC

    emb = tables.load(spark, "embeddings", sf_dir)
    wide = dense.expand_to_dim(emb, out_dim=768, in_dim=64)
    qv = dim_expand_encode(QUERY_VEC, 64, 768)
    assert len(qv) >= ann.ARROW_RANK_MIN_DIM  # the gate actually fires
    got = ann.ranked_cosine_topk(wide, qv, 25, "vec_id", "embedding", 6).collect()
    # reference: the sub-gate expression spelling on the same rows
    from multi_search_retrival_big_data_spark.functions.rounding import det_round
    from multi_search_retrival_big_data_spark.functions.vector import cosine_sim, lit_vec

    want = (
        wide.select(
            "vec_id", det_round(cosine_sim("embedding", lit_vec(qv)), 6).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(25)
        .collect()
    )
    assert [r.vec_id for r in got] == [r.vec_id for r in want]
    assert [r.score for r in got] == [r.score for r in want]


def test_argmin_arrow_nonfinite_row_keeps_lowest_id(spark):
    """r10 advice: a NaN/Inf embedding makes every GEMM-prefilter
    comparison False; the kernels must fall back to the exact fold over
    all centroids/codes (lowest id under NaN, matching array_min /
    MIN(struct) with Spark's NaN-is-largest ordering) instead of
    raising IndexError."""
    import pandas as pd

    from multi_search_retrival_big_data_spark.operators import kmeans

    cents = [(3, [0.0] * 8), (7, [1.0] * 8)]
    # wide fake geometry to force the Arrow twin through the dispatch
    wide_cents = [(i, [float(i)] * 1300) for i in range(8)]
    df = spark.createDataFrame(
        [
            (1, [float("nan")] * 1300),
            (2, [float("inf")] * 1300),
            (3, [1.0] * 1300),
        ],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    got = {
        r["vec_id"]: r["cid"]
        for r in df.select(
            "vec_id", kmeans.assign_cid("embedding", wide_cents).alias("cid")
        ).collect()
    }
    assert got[1] == 0          # NaN row: lowest cid, no crash
    assert got[3] == 1          # finite row still assigns exactly
    # pq_codes_arrow: same guard per sub-space
    books = {
        mi: [(c, [float(c)] * 50) for c in range(4)] for mi in range(26)
    }
    codes = df.select(
        "vec_id", ann.pq_codes_arrow("embedding", books, 1300).alias("c")
    ).collect()
    by_id = {r["vec_id"]: r["c"] for r in codes}
    assert by_id[1] == [0] * 26  # NaN: lowest code everywhere, no crash
    assert by_id[3] == [1] * 26
