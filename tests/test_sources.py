"""Unit tests for sources.py round-trips on adversarial content."""

from __future__ import annotations

import os
import tempfile

from multi_search_retrival_big_data_spark import sources

SCHEMA = "id BIGINT, text STRING"

NASTY = [
    (1, 'line with "quotes" inside'),
    (2, "embedded\nnewline"),
    (3, "comma, semicolon; tab\there"),
    (4, ""),
    (5, None),
    (6, "unicode: héllo wörld — 中文"),
]


def _roundtrip(spark, writer, reader):
    df = spark.createDataFrame(NASTY, ["id", "text"])
    path = os.path.join(tempfile.mkdtemp(prefix="srctest_"), "d")
    writer(df, path)
    back = reader(spark, path, SCHEMA)
    return {r["id"]: r["text"] for r in back.collect()}


def test_jsonl_roundtrip_nasty(spark):
    got = _roundtrip(spark, sources.write_jsonl, sources.read_jsonl)
    # JSON omits null fields on write; the read yields None — parity
    assert got == {i: t for i, t in NASTY}


def test_csv_roundtrip_nasty(spark):
    got = _roundtrip(spark, sources.write_csv, sources.read_csv)
    # CSV cannot distinguish NULL from empty string with quoteAll —
    # both come back as empty-ish; assert the distinguishable rows
    expected = {i: t for i, t in NASTY}
    for i in (1, 2, 3, 6):
        assert got[i] == expected[i]


def test_partitioned_parquet_prunes(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10)], ["id", "part"]
    )
    path = os.path.join(tempfile.mkdtemp(prefix="srctest_"), "p")
    sources.write_partitioned_parquet(df, path, ["part"])
    from pyspark.sql import functions as F

    back = sources.read_parquet(spark, path).filter(F.col("part") == "a")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(part" in plan or "PartitionFilters: [" in plan
    assert back.count() == 5


def test_compact_parquet_collapses_file_count(spark, tmp_path):
    import glob

    from multi_search_retrival_big_data_spark import sources

    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    frag = str(tmp_path / "frag")
    df.repartition(32).write.parquet(frag)
    assert len(glob.glob(frag + "/part-*")) == 32
    dst = str(tmp_path / "compact")
    sources.compact_parquet(spark, frag, dst, 3)
    assert len(glob.glob(dst + "/part-*")) == 3
    got = {r["id"]: r["v"] for r in spark.read.parquet(dst).collect()}
    assert got == {i: 2 * i for i in range(1000)}
