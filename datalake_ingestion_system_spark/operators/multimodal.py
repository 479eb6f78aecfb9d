"""Multimodal (binary) column plumbing: images/audio/video as opaque bytes.

The Spark-side contract is real and tested — typed metadata struct, Arrow
batch shape, ``mapInPandas`` decode stage, partition sizing — while the
actual codec work is stubbed (no image/audio libraries in this container):
``decode_media`` raises ``NotImplementedError`` unless given the
deterministic fake decoder, which derives pseudo width/height/duration from
the byte content so tests have stable assertions.

At 100 TB the pattern is: keep bytes in their own column (parquet stores them
contiguously), select ONLY metadata columns for routing/filtering (column
pruning keeps the scan cheap), and let the decode stage run ``mapInPandas``
with small ``maxRecordsPerBatch`` so a batch of blobs fits in memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

#: Metadata emitted by the decode stage, alongside the pass-through id.
MEDIA_META_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),
    StructField("byte_len", LongType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),
])


def attach_media_column(df: DataFrame, id_col: str, text_col: str,
                        media_type: str = "image") -> DataFrame:
    """Build an opaque binary media column (test stand-in: encode the text
    column) plus a typed metadata struct — the storage contract."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(text_col).cast("binary").alias("media_bytes"),
    )


def fake_decoder(media_type: str, payload: bytes) -> dict:
    """Deterministic stand-in for a real codec: dimensions derived from the
    byte content (stable across runs/partitions)."""
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    return {
        "byte_len": n,
        "width": 16 + checksum % 256,
        "height": 16 + (checksum * 7) % 256,
        "duration_ms": (n * 10) if media_type in ("audio", "video") else 0,
    }


def real_decoder(media_type: str, payload: bytes) -> dict:  # pragma: no cover
    raise NotImplementedError(
        "codec libraries (PIL/av/librosa) are not available in this "
        "environment; inject fake_decoder or a real one")


def decode_media(df: DataFrame,
                 decoder: Callable[[str, bytes], dict] = real_decoder,
                 batch_size_hint: int = 256) -> DataFrame:
    """Decode stage: mapInPandas over (media_id, media_type, media_bytes).

    Arrow streams columnar batches of blobs into Python; each batch yields a
    metadata frame.  Swap ``decoder`` for the real codec in production.
    """
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            metas = [decoder(t, bytes(b)) for t, b in
                     zip(pdf["media_type"], pdf["media_bytes"])]
            out = pd.DataFrame(metas)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[[f.name for f in MEDIA_META_SCHEMA.fields]]

    return df.mapInPandas(decode_batches, MEDIA_META_SCHEMA)
