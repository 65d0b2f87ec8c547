"""Unit tests for operators/curation.py."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.operators import curation


# ---------------------------------------------------------------- PII


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "mail me at jo.doe+x@corp.example.org today"),
        (2, "server 192.168.0.1 and 10.0.0.255 are up"),
        (3, "call 555-867-5309 or 555 123 4567 now"),
        (4, "mixed: a@b.co from 8.8.8.8 call 111-222-3333"),
        (5, "clean text with no identifiers at all"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_redact_pii_golden(spark, pii_docs):
    out = {
        r["id"]: r["red"]
        for r in pii_docs.select(
            "id", curation.redact_pii(F.col("text")).alias("red")
        ).collect()
    }
    assert out[1] == "mail me at <EMAIL> today"
    assert out[2] == "server <IP> and <IP> are up"
    assert out[3] == "call <PHONE> or <PHONE> now"
    assert out[4] == "mixed: <EMAIL> from <IP> call <PHONE>"
    assert out[5] == "clean text with no identifiers at all"


def test_count_pii_agrees_with_redaction(spark, pii_docs):
    rows = pii_docs.select("id", *curation.count_pii(F.col("text"))).collect()
    counts = {r["id"]: (r["pii_email"], r["pii_ipv4"], r["pii_phone"]) for r in rows}
    assert counts[1] == (1, 0, 0)
    assert counts[2] == (0, 2, 0)
    assert counts[3] == (0, 0, 2)
    assert counts[4] == (1, 1, 1)
    assert counts[5] == (0, 0, 0)


# ------------------------------------------------------------ packing


def test_pack_budget_bins_hand_computed(spark):
    # one partition, capacity 10; sizes walk the boundary cases:
    # cumulative before: 0,4,8,14,17,29 → bins 0,0,1,1,2 (+ oversized)
    rows = [
        ("p", 1, 4),
        ("p", 2, 4),
        ("p", 3, 6),   # starts at cum_before=8 → bin 0? no: floor(8/10)=0
        ("p", 4, 3),
        ("p", 5, 12),  # oversized doc
        ("p", 6, 1),
    ]
    df = spark.createDataFrame(rows, ["part", "id", "n"])
    out = {
        r["id"]: (r["bin_id"], r["cum_tokens"])
        for r in curation.pack_budget_bins(df, "part", "id", "n", 10).collect()
    }
    assert out[1] == (0, 4)
    assert out[2] == (0, 8)
    assert out[3] == (0, 14)   # starts inside bin 0, overflows it
    assert out[4] == (1, 17)
    assert out[5] == (1, 29)   # oversized: owns the span
    assert out[6] == (2, 30)   # next doc skips to floor(29/10)=2


def test_pack_budget_bins_partition_independent(spark):
    rows = [(p, i, 5) for p in ("a", "b") for i in range(6)]
    df = spark.createDataFrame(rows, ["part", "id", "n"])
    out = curation.pack_budget_bins(df, "part", "id", "n", 10)
    per_part = {
        (r["part"], r["id"]): r["bin_id"] for r in out.collect()
    }
    # both partitions pack identically and independently
    for i in range(6):
        assert per_part[("a", i)] == per_part[("b", i)] == (i * 5) // 10


# ----------------------------------------------------------- sampling


def _aes_priority(doc_id: int, w: float) -> int:
    # the QUANTIZED key the operator ranks on (r5: floor(p·1e12+0.5))
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 2**32
    return math.floor(-math.log(u) / w * 1e12 + 0.5)


def test_weighted_sample_matches_python_recompute(spark):
    rows = [(i, float(10 + (i * 7) % 90)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    out = curation.weighted_sample_aes(df, "id", "w", 25).collect()
    got = [(r["id"], r["priority_rank"]) for r in sorted(out, key=lambda r: r["priority_rank"])]
    expected = sorted(rows, key=lambda t: (_aes_priority(t[0], t[1]), t[0]))[:25]
    assert [i for i, _ in got] == [i for i, _ in expected]
    assert [rk for _, rk in got] == list(range(1, 26))


def test_weighted_sample_prefers_heavy_rows(spark):
    # weights 1 vs 1000: the heavy half should dominate the sample
    rows = [(i, 1000.0 if i < 100 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "w"])
    out = curation.weighted_sample_aes(df, "id", "w", 50).collect()
    heavy = sum(1 for r in out if r["id"] < 100)
    assert heavy >= 45


# ------------------------------------------------------------- upsert


def test_upsert_last_writer_wins(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    delta = spark.createDataFrame([(2, "B"), (4, "D")], ["k", "v"])
    out = {r["k"]: r["v"] for r in curation.upsert(base, delta, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_upsert_composite_key(spark):
    base = spark.createDataFrame([(1, "x", "a"), (1, "y", "b")], ["k1", "k2", "v"])
    delta = spark.createDataFrame([(1, "y", "B")], ["k1", "k2", "v"])
    out = {(r["k1"], r["k2"]): r["v"] for r in curation.upsert(base, delta, ["k1", "k2"]).collect()}
    assert out == {(1, "x"): "a", (1, "y"): "B"}


# ---------------------------------------------------------- mixtures


def test_mixture_interleave_stride_schedule(spark):
    rows = [(c, i) for c in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(rows, ["cls", "id"])
    # a twice as frequent as b → strides a=1, b=2
    out = curation.mixture_interleave(df, "cls", {"a": 1, "b": 2}, "id", 9).collect()
    sched = [(r["cls"], r["class_rank"], r["vt"]) for r in out]
    assert sched == [
        ("a", 1, 1),
        ("a", 2, 2), ("b", 1, 2),
        ("a", 3, 3),
        ("a", 4, 4), ("b", 2, 4),
        ("a", 5, 5),
        ("a", 6, 6), ("b", 3, 6),
    ]


def test_mixture_interleave_ratio_and_exclusion(spark):
    rows = [(c, i) for c in ("a", "b", "junk") for i in range(100)]
    df = spark.createDataFrame(rows, ["cls", "id"])
    out = curation.mixture_interleave(df, "cls", {"a": 1, "b": 3}, "id", 80).collect()
    by_cls = {c: sum(1 for r in out if r["cls"] == c) for c in ("a", "b", "junk")}
    assert by_cls["junk"] == 0
    # 3:1 ratio within rounding of the schedule prefix
    assert abs(by_cls["a"] - 3 * by_cls["b"]) <= 3


# ------------------------------------------------ line-level dedupe


def test_remove_boilerplate_lines_golden(spark):
    rows = [
        (1, "unique alpha\nSHARED NAV\nbody one"),
        (2, "unique beta\nSHARED NAV\nbody two"),
        (3, "unique gamma\nSHARED NAV\nbody three"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in curation.remove_boilerplate_lines(df, "id", "text", 2).collect()
    }
    assert out[1] == ("unique alpha\nbody one", 2, 1)
    assert out[2] == ("unique beta\nbody two", 2, 1)
    assert out[3] == ("unique gamma\nbody three", 2, 1)


def test_remove_boilerplate_keeps_order_and_duplicate_lines_within_doc(spark):
    df = spark.createDataFrame([(1, "a\nb\na\nc")], ["id", "text"])
    out = curation.remove_boilerplate_lines(df, "id", "text", 5).collect()[0]
    # within-doc repeats count once toward df, and both copies survive
    assert out["text"] == "a\nb\na\nc"
    assert out["n_lines_kept"] == 4


def test_remove_boilerplate_all_dropped_yields_null(spark):
    # pinned r5 contract: text IS NULL ⟺ n_lines_kept = 0 (matching
    # the oracle's string_agg(...) FILTER, which is NULL over an empty
    # group) — never '' for an all-boilerplate document
    rows = [(i, "SHARED NAV") for i in range(1, 4)] + [(4, "unique\nSHARED NAV")]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: (r["text"], r["n_lines_kept"])
        for r in curation.remove_boilerplate_lines(df, "id", "text", 2).collect()
    }
    assert out[1] == (None, 0)
    assert out[2] == (None, 0)
    assert out[4] == ("unique", 1)


# ----------------------------------------------------------- chunking


def test_chunk_documents_overlap_and_tail(spark):
    text = "".join(chr(ord("a") + i % 26) for i in range(25))
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    out = sorted(
        (r["chunk_idx"], r["chunk"])
        for r in curation.chunk_documents(df, "id", "text", 10, 4).collect()
    )
    # stride 6: starts 1,7,13,19,25
    assert out == [
        (0, text[0:10]),
        (1, text[6:16]),
        (2, text[12:22]),
        (3, text[18:25]),
        (4, text[24:25]),
    ]
    # consecutive chunks overlap by exactly 4 chars
    assert out[0][1][-4:] == out[1][1][:4]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "abc")], ["id", "text"])
    with pytest.raises(ValueError):
        curation.chunk_documents(df, "id", "text", 10, 10)


def test_chunk_documents_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "abc")], "id BIGINT, text STRING")
    out = sorted(
        (r["id"], r["chunk_idx"], r["chunk"])
        for r in curation.chunk_documents(df, "id", "text", 10, 4).collect()
    )
    # empty/null docs yield no chunks instead of an illegal-sequence crash
    assert out == [(3, 0, "abc")]


def test_weighted_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 5.0), (4, 1.0)], "id BIGINT, w DOUBLE"
    )
    out = curation.weighted_sample_aes(df, "id", "w", 10).collect()
    assert sorted(r["id"] for r in out) == [3, 4]


def test_weighted_sample_per_group_is_groupwise_consistent(spark):
    rows = [(i, "a" if i % 2 else "b", float(1 + (i * 13) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "grp", "w"])
    out = curation.weighted_sample_aes_per_group(df, ["grp"], "id", "w", 7)
    by_grp: dict[str, list] = {}
    for r in out.collect():
        by_grp.setdefault(r["grp"], []).append(r)
    assert {g: len(v) for g, v in by_grp.items()} == {"a": 7, "b": 7}
    # within each group the selection equals the python A-ES recompute
    for g, members in by_grp.items():
        pool = [(i, w) for i, grp, w in rows if grp == g]
        expected = [
            i for i, _ in sorted(pool, key=lambda t: (_aes_priority(t[0], t[1]), t[0]))[:7]
        ]
        got = [r["id"] for r in sorted(members, key=lambda r: r["priority_rank"])]
        assert got == expected


def test_chunk_documents_reconstruction_property(spark):
    """Dropping each chunk's overlap prefix and concatenating
    reproduces the original text exactly."""
    texts = [
        "the quick brown fox jumps over the lazy dog repeatedly today",
        "x" * 97,
        "short",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["id", "text"])
    size, overlap = 16, 5
    rows = curation.chunk_documents(df, "id", "text", size, overlap).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append((r["chunk_idx"], r["chunk"]))
    for i, text in enumerate(texts):
        chunks = [c for _, c in sorted(by_id[i])]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == text


def test_quality_quantile_filter_histogram_election(spark):
    from multi_search_retrival_big_data_spark.operators import curation

    # keep_frac 0.5 (exactly representable). The real cross-engine
    # hazard for other fractions: a bare decimal literal in the DuckDB
    # oracle is exact DECIMAL arithmetic while Spark computes the
    # product in IEEE doubles, so k could differ by 1 when the double
    # product straddles an integer — which is why the oracle casts the
    # literal to DOUBLE so both engines share the SAME double
    # arithmetic rather than a "mathematical" k.
    # group A: scores .9 .8 .7 .6 .5 -> k=ceil(2.5)=3 -> threshold bin
    # 7000 (cum: 1, 2, 3>=3) -> keep {1,2,3}
    # group B: boundary tie — scores .9 .5 .5 .1, k=2; cum at bin 5000
    # = 3 >= 2 -> threshold 5000, boundary-bin ties are KEPT -> {6,7,8}
    rows = [
        (1, "A", 0.9), (2, "A", 0.8), (3, "A", 0.7), (4, "A", 0.6), (5, "A", 0.5),
        (6, "B", 0.9), (7, "B", 0.5), (8, "B", 0.5), (9, "B", 0.1),
    ]
    docs = spark.createDataFrame(rows, "id BIGINT, grp STRING, q DOUBLE")
    out = curation.quality_quantile_filter(docs, "id", "q", "grp", 0.5)
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [1, 2, 3, 6, 7, 8]
    thr = {r["grp"]: r["min_qbin"] for r in out.select("grp", "min_qbin").distinct().collect()}
    assert thr == {"A": 7000, "B": 5000}


def test_assign_shards_deterministic_and_balanced(spark):
    from multi_search_retrival_big_data_spark.operators import curation

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id BIGINT")
    a = curation.assign_shards(docs, "doc_id", 8).collect()
    b = curation.assign_shards(docs, "doc_id", 8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # pure function of id
    by_shard = {}
    for r in a:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], 0)
        by_shard[r["shard"]] += 1
    # md5 equidistributes sequential ids: every shard populated, no
    # shard grabs more than half the corpus
    assert len(by_shard) == 8 and max(by_shard.values()) < 100


def test_quality_quantile_filter_keeps_at_least_k_per_group(spark):
    from math import ceil

    from multi_search_retrival_big_data_spark.operators import curation

    # 40 docs over 3 skewed groups with distinct scores
    rows = []
    i = 0
    for grp, n in [("en", 25), ("fr", 10), ("zh", 5)]:
        for j in range(n):
            rows.append((i, grp, (j + 1) / (n + 1)))
            i += 1
    docs = spark.createDataFrame(rows, "id BIGINT, grp STRING, q DOUBLE")
    out = curation.quality_quantile_filter(docs, "id", "q", "grp", 0.25)
    kept = {}
    for r in out.collect():
        kept.setdefault(r["grp"], 0)
        kept[r["grp"]] += 1
    for grp, n in [("en", 25), ("fr", 10), ("zh", 5)]:
        k = ceil(0.25 * n)
        # histogram election keeps at least the target, and boundary
        # ties can only ADD rows
        assert kept[grp] >= k, (grp, kept[grp], k)


def test_shard_manifest_partitions_the_corpus(spark):
    from multi_search_retrival_big_data_spark.operators import curation

    docs = spark.createDataFrame(
        [(i, 10 + i) for i in range(123)], "doc_id BIGINT, n_chars BIGINT"
    )
    s = curation.assign_shards(docs, "doc_id", 8)
    agg = s.groupBy("shard").count().collect()
    assert sum(r["count"] for r in agg) == 123  # partition: no loss, no dup
    total = s.agg({"n_chars": "sum"}).collect()[0][0]
    assert total == sum(10 + i for i in range(123))


def test_cross_modal_manifest_counts_consistent(spark, sf_dir):
    from multi_search_retrival_big_data_spark.queries.curation_queries import (
        pipeline_cross_modal_manifest,
    )

    rows = {r["modality"]: r for r in pipeline_cross_modal_manifest(spark, sf_dir).collect()}
    assert set(rows) == {"text", "image", "audio", "video"}
    for m, r in rows.items():
        assert r["n_kept"] + r["n_dropped"] == r["n_items"], m
        assert r["n_kept"] >= 1, m
        assert r["kept_checksum"] != 0, m
