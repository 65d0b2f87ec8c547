"""Multimodal (image/audio/video) column plumbing.

The reference ingests media with heavyweight model UDFs — CLIP image
encoders (data_extraction/clip/clip.ipynb cells 6-7), wav2vec2 ASR
(BE_FE_ver1/dataset_extraction/audio/audio_regconition.ipynb cell 1),
easyocr (data_extraction/metadata/ocr.ipynb cell 6). The engine-side
pattern is always the same: **opaque binary content column + typed
metadata + an Arrow-batched decode/feature UDF**. This module makes
that plumbing real — schema, partitioning, `mapInPandas` batch shape —
while the actual codec/model calls are STUBBED (the image/audio
libraries are not in this container):

- `decoder="fake"` → deterministic features computed from the raw
  bytes (length / checksum / frame count) so the whole pipeline is
  testable and oracle-comparable end to end;
- any real decoder name → `NotImplementedError` at the exact seam
  where cv2/PIL/torchaudio would be imported on a production cluster.

Scale notes: `mapInPandas` streams Arrow record batches through one
Python worker per core with no shuffle; binary payloads stay columnar
in Arrow buffers (no per-row pickling). Media tables should be written
with content-defined row-group sizing (`parquet.block.size`) so a
single task never materializes more than a batch of blobs; decode
output is narrow (features only) — never re-emit the blob column
after decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")

FAKE_DECODER = "fake"
CHECKSUM_MOD = 997
FRAME_BYTES = 100  # fake codec: 1 synthetic frame per 100 bytes

DECODE_SCHEMA = (
    "media_id BIGINT, media_type STRING, byte_len BIGINT, "
    "checksum BIGINT, n_frames BIGINT"
)


def as_media_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Synthesize a media table from the documents corpus: the UTF-8
    bytes of `text` stand in for an encoded media payload. Schema is
    the real one: (media_id, media_type, content BINARY, meta STRUCT).
    media_type cycles deterministically by id."""
    mt = (
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        mt.alias("media_type"),
        F.col(text_col).cast("binary").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.length(F.col(text_col).cast("binary")).alias("declared_bytes"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, decoder: str = FAKE_DECODER) -> DataFrame:
    """Decode/feature-extract media blobs via an Arrow-batched
    `mapInPandas` — one Python worker per partition, blob bytes arrive
    in columnar Arrow buffers, output is the narrow feature frame
    (DECODE_SCHEMA), never the blob.

    decoder="fake": deterministic per-blob features (byte length,
    byte-sum checksum mod 997, 1 frame / 100 bytes). Any other decoder
    name marks the seam where a real codec (cv2 / PIL / torchaudio /
    pyav) would run on a production cluster and raises
    NotImplementedError here."""
    if decoder != FAKE_DECODER:
        raise NotImplementedError(
            f"decoder {decoder!r}: real media codecs (cv2/PIL/torchaudio/pyav) "
            "are not available in this environment; wire them in here. "
            "The Spark-side plumbing (schema, Arrow batching, partitioning) "
            "is identical for any decoder."
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            byte_len = content.map(len)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": byte_len,
                    "checksum": content.map(lambda b: int(sum(b)) % CHECKSUM_MOD),
                    "n_frames": byte_len // FRAME_BYTES + 1,
                }
            )

    return media.mapInPandas(_decode, DECODE_SCHEMA)


def frame_sample(decoded: DataFrame, every: int = 2) -> DataFrame:
    """Sample frame indices 0, every, 2·every, … per media item —
    the explode is a narrow transform (no shuffle); downstream
    per-frame decode would be another mapInPandas over
    (media_id, frame_idx)."""
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )


EMBED_DIM = 8
EMBED_MOD = 1000

EMBED_SCHEMA = "media_id BIGINT, component INT, feat DOUBLE"


def fake_embedding_components(media: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor standing in for a CLIP-like
    encoder (reference clip.ipynb cells 6-7): component j = (sum of
    bytes at positions ≡ j mod 8) mod 1000 / 1000. Output is exploded
    (media_id, component, feat) — same Arrow-batched seam a real
    encoder UDF would occupy, with a narrow numeric result."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, comps, feats = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                sums = [0] * EMBED_DIM
                for i, byte in enumerate(blob):
                    sums[i % EMBED_DIM] += byte
                for j in range(EMBED_DIM):
                    ids.append(mid)
                    comps.append(j)
                    feats.append((sums[j] % EMBED_MOD) / float(EMBED_MOD))
            yield pd.DataFrame({"media_id": ids, "component": comps, "feat": feats})

    return media.mapInPandas(_embed, EMBED_SCHEMA)
