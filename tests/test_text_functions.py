"""Unit tests for functions/text.py scalar expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.functions import text as T


def _one(spark, expr, value="abcdef"):
    return spark.createDataFrame([(value,)], ["t"]).select(expr.alias("g")).collect()[0].g


def test_tokenize_lowercases_and_splits(spark):
    got = _one(spark, T.tokenize(F.col("t")), "Hello, WORLD 42!")
    assert got == ["hello", "world", "42"]


def test_word_ngrams_short_doc_guard(spark):
    # sequence() generates DESCENDING ranges when stop < start; the
    # guard must yield an empty array, not fabricated grams
    got = _one(spark, T.word_ngrams(T.tokenize(F.col("t")), 3), "one two")
    assert got == []


def test_word_ngrams_basic(spark):
    got = _one(spark, T.word_ngrams(T.tokenize(F.col("t")), 2), "a b c")
    assert got == ["a b", "b c"]


def test_char_ngrams_regression_lambda_index(spark):
    # regression: `lambda i, n=n:` inside F.transform made Spark pass
    # the array index as the second arg, rebinding n per element
    got = _one(spark, T.char_ngrams(F.col("t"), 3, 4), "abcdef")
    assert got == ["abc", "bcd", "cde", "def", "abcd", "bcde", "cdef"]


def test_char_ngrams_short_string(spark):
    assert _one(spark, T.char_ngrams(F.col("t"), 3, 5), "ab") == []
