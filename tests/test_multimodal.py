from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_search_retrival_big_data_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "abc", "s0"),
        (1, "x" * 250, "s1"),
        (2, "hello world", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, source STRING")
    return mm.as_media_table(docs)


def test_media_table_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,media_type:string,content:binary,"
        "meta:struct<source:string,declared_bytes:int>>"
    )
    types = {r["media_id"]: r["media_type"] for r in media.collect()}
    assert types == {0: "image", 1: "audio", 2: "video"}


def test_fake_decode_features(media):
    out = {r["media_id"]: r for r in mm.decode_media(media).collect()}
    assert out[0]["byte_len"] == 3
    assert out[0]["checksum"] == (ord("a") + ord("b") + ord("c")) % mm.CHECKSUM_MOD
    assert out[0]["n_frames"] == 1
    assert out[1]["byte_len"] == 250 and out[1]["n_frames"] == 3


def test_real_decoder_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="cv2"):
        mm.decode_media(media, decoder="image")


def test_frame_sample(media):
    decoded = mm.decode_media(media)
    frames = mm.frame_sample(decoded, every=2)
    got = sorted(
        (r["media_id"], r["frame_idx"]) for r in frames.collect()
    )
    # doc1 has 3 frames -> 0, 2 ; others 1 frame -> 0
    assert got == [(0, 0), (1, 0), (1, 2), (2, 0)]


def test_fake_embedding_matches_python(media):
    out = mm.fake_embedding_components(media)
    rows = out.filter(F.col("media_id") == 2).orderBy("component").collect()
    blob = b"hello world"
    sums = [0] * mm.EMBED_DIM
    for i, byte in enumerate(blob):
        sums[i % mm.EMBED_DIM] += byte
    expected = [(s % mm.EMBED_MOD) / mm.EMBED_MOD for s in sums]
    assert [r["feat"] for r in rows] == expected
