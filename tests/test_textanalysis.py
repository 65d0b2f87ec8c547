from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.operators import textanalysis as ta


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the mat"),  # identical → identical simhash
        (3, "the cat sat on the hat"),  # near dup → small hamming
        (4, "quantum flux capacitor overdrive maximal entropy"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def _py_simhash(text: str) -> str:
    import re
    from collections import Counter

    tf = Counter(re.findall(r"\w+", text.lower()))
    sums = [0] * 64
    for tok, f in tf.items():
        h = hashlib.md5(tok.encode()).hexdigest()
        for p in range(64):
            bit = (int(h[p // 4], 16) >> (p % 4)) & 1
            sums[p] += f * (2 * bit - 1)
    return "".join("1" if s >= 0 else "0" for s in sums)


def test_simhash_matches_python_reference(docs, spark):
    out = {r["doc_id"]: r["simhash"] for r in ta.simhash_fingerprints(docs, "doc_id", "text").collect()}
    assert out[1] == _py_simhash("the cat sat on the mat")
    assert out[4] == _py_simhash("quantum flux capacitor overdrive maximal entropy")
    assert out[1] == out[2]


def test_simhash_near_dups_pigeonhole(docs):
    fp = ta.simhash_fingerprints(docs, "doc_id", "text")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in ta.simhash_near_duplicates(fp, "doc_id").collect()}
    assert pairs[(1, 2)] == 0  # identical docs
    # near-dup (1,3) has hamming equal to the python reference distance
    d = sum(a != b for a, b in zip(_py_simhash("the cat sat on the mat"), _py_simhash("the cat sat on the hat")))
    if d <= 7:
        assert pairs[(1, 3)] == d


def test_winnow_fingerprints_match_python(docs):
    text = "the cat sat on the mat"
    k, w = ta.WINNOW_K, ta.WINNOW_W
    s = text.lower()
    grams = [hashlib.md5(s[i : i + k].encode()).hexdigest() for i in range(len(s) - k + 1)]
    expected = {min(grams[i : i + w]) for i in range(len(grams) - w + 1)}
    out = ta.winnow_fingerprints(docs, "doc_id", "text")
    got = {r["fingerprint"] for r in out.filter(F.col("doc_id") == 1).collect()}
    assert got == expected


def test_language_id_picks_en_and_handles_no_hits(docs):
    out = {r["doc_id"]: r for r in ta.language_id(docs, "doc_id", "text").collect()}
    assert out[1]["predicted_lang"] == "en" and out[1]["hits"] == 2  # 'the' twice
    assert out[4]["predicted_lang"] == "und" and out[4]["hits"] == 0
    assert out[1]["n_tokens"] == 6


def test_quality_and_token_counts(docs):
    q = {r["doc_id"]: r for r in ta.quality_features(docs, "doc_id", "text").collect()}
    assert q[1]["n_tokens"] == 6
    assert q[1]["punct_ratio"] == 0.0
    assert abs(q[1]["stopword_ratio"] - 2 / 6) < 1e-12
    t = {r["doc_id"]: r for r in ta.token_counts(docs, "doc_id", "text").collect()}
    assert t[1]["ws_tokens"] == 6 and t[1]["word_tokens"] == 6 and t[1]["bpe_ish_tokens"] == 6


def test_bigram_lm_matches_python(spark):
    import math
    from collections import Counter

    rows = [(1, "ababab"), (2, "abzzzq")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r for r in ta.char_bigram_lm_scores(docs, "doc_id", "text").collect()}

    grams = []
    for _, t in rows:
        grams += [t[i : i + 2] for i in range(len(t) - 1)]
    c2 = Counter(grams)
    c1 = Counter(g[0] for g in grams)
    v = len(c1)
    for doc_id, t in rows:
        lps = [math.log((c2[g] + 1.0) / (c1[g[0]] + v)) for g in (t[i : i + 2] for i in range(len(t) - 1))]
        expect = sum(lps) / len(lps)
        assert abs(out[doc_id]["avg_logprob"] - expect) < 1e-6
        assert out[doc_id]["n_bigrams"] == len(t) - 1
    # the common-pattern doc scores higher than the rare-pattern doc
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


def test_decontamination_overlap_finds_planted_dup(spark):
    from multi_search_retrival_big_data_spark.operators import textanalysis as _ta

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with no overlap at all here"),
        ],
        "doc_id BIGINT, text STRING",
    )
    evalset = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over the lazy dog")],
        "doc_id BIGINT, text STRING",
    )
    out = _ta.decontamination_overlap(corpus, evalset, "doc_id", "text", n=5, min_hits=2)
    rows = {(r["corpus_id"], r["eval_id"]) for r in out.collect()}
    assert (1, 100) in rows
    assert all(c != 2 for c, _ in rows)


def test_repetition_features_flags_repeats(spark):
    from multi_search_retrival_big_data_spark.operators import textanalysis as _ta

    docs = spark.createDataFrame(
        [
            (1, "spam line\nspam line\nspam line\nspam line"),
            (2, "all words here are entirely distinct from each other friend"),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r["doc_id"]: r for r in _ta.repetition_features(docs, "doc_id", "text").collect()}
    assert got[1]["dup_line_frac"] > 0.7
    assert got[1]["top_bigram_count"] >= 4
    assert got[1]["dup_trigram_frac"] > 0.5
    assert got[2]["dup_line_frac"] == 0.0
    assert got[2]["top_bigram_count"] == 1
    assert got[2]["dup_trigram_frac"] == 0.0


def test_hamming_distance_matches_positional_definition(spark):
    """The packed conv/XOR/bit_count hamming must equal the positional
    mismatch count for arbitrary bit strings, including all-zero,
    all-one, and single-bit cases (it replaced an interpreted
    per-position substr fold that dominated the near-dup verify)."""
    import random

    from pyspark.sql import functions as F

    from multi_search_retrival_big_data_spark.operators.textanalysis import (
        hamming_distance,
    )

    rng = random.Random(8)
    rows = [("0" * 64, "0" * 64), ("1" * 64, "0" * 64)]
    for _ in range(20):
        a = "".join(rng.choice("01") for _ in range(64))
        flip = rng.sample(range(64), rng.randint(0, 64))
        b = "".join(
            ("1" if a[i] == "0" else "0") if i in flip else a[i] for i in range(64)
        )
        rows.append((a, b))
    df = spark.createDataFrame(rows, "a STRING, b STRING")
    got = df.select(
        "a", "b", hamming_distance(F.col("a"), F.col("b")).alias("h")
    ).collect()
    for r in got:
        expected = sum(1 for x, y in zip(r["a"], r["b"]) if x != y)
        assert r["h"] == expected, (r["a"], r["b"], r["h"], expected)
