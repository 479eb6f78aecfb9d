"""Binary-file media source: directories of image/audio/video files as a
typed media DataFrame.

Feeds the multimodal tier (``operators/multimodal.py``) from REAL files:
Spark's built-in ``binaryFile`` format reads each file as one row of
(path, modificationTime, length, content) with the content column only
materialized for rows that survive pushed filters — ``pathGlobFilter``
prunes by extension BEFORE any bytes are read.

Scale notes: one row per file means many small files → many tiny tasks;
for 100 TB media lakes, pair this with the compaction plan (small files
into parquet with a binary column) so downstream decode scans parquet,
not object-store listings.  ``maxBytesPerTrigger``-style batching falls
out of the decode stage's ``mapInPandas`` batch sizing, not this source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → media_type routing for the common container formats
_EXT_TYPES = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "bmp": "image", "wav": "audio", "mp3": "audio", "ogg": "audio",
    "flac": "audio", "mp4": "video", "mkv": "video", "webm": "video",
}


def media_type_for(path_col) -> F.Column:
    """media_type from the file extension (lowercased); 'binary' when the
    extension is not a known container."""
    ext = F.lower(F.element_at(F.split(path_col, r"\."), -1))
    expr = F.lit("binary")
    for e, t in sorted(_EXT_TYPES.items()):
        expr = F.when(ext == e, t).otherwise(expr)
    return expr


def read_media_dir(spark: SparkSession, directory: str,
                   glob: str | None = None) -> DataFrame:
    """Read a directory tree of media files into the multimodal contract:
    (media_id, media_type, media_bytes, src_path, byte_len).

    ``media_id`` is the xxhash64 of the file path — stable across runs and
    executors, collision-safe at file-census scale.  ``glob`` (e.g.
    ``"*.png"``) prunes files BEFORE content is read (pushed to the file
    index)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(directory)
    return df.select(
        F.xxhash64("path").alias("media_id"),
        media_type_for(F.col("path")).alias("media_type"),
        F.col("content").alias("media_bytes"),
        F.col("path").alias("src_path"),
        F.col("length").alias("byte_len"),
    )
