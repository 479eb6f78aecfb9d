"""JSONL (newline-delimited JSON) source with quarantine-grade parsing.

The reference's landing surface is CSV-only (DATALAKE_TRANSFORMATION_S3_
DAILY_JOB.PY:123-124 reads gzip CSV); modern feeds land JSONL, so this
module extends the source tier with the same contract the CSV path has:
an explicit schema (never inference in production — one scan saved, and
drift fails loudly instead of silently re-typing a column), malformed
lines captured rather than dropped, and a streaming twin for the
Structured Streaming ingest path.

Spark-first notes:

- ``PERMISSIVE`` + ``columnNameOfCorruptRecord`` is the engine-native way
  to split good/bad rows in ONE scan.  Spark refuses to filter on the
  corrupt column alone over a lazy JSON relation (SPARK-21610: the
  pushdown would have to re-parse), so the split materializes the parsed
  batch once via ``cache()`` — bounded by the batch being read, and
  released through the ``release`` callable ``read_jsonl`` returns (call
  it after both frames are consumed; otherwise each call pins a parsed
  copy in executor storage until the session ends).
- At 100 TB the schema is the contract: field additions arrive as NULLs
  (forward-compatible), type changes land in quarantine, and the scan
  prunes to referenced fields because JSON parsing is projection-aware
  (Jackson stops at requested paths).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def _full_schema(schema: StructType) -> StructType:
    if _CORRUPT in schema.fieldNames():
        raise ValueError(f"schema must not pre-declare {_CORRUPT}")
    # build a NEW StructType: StructType.add mutates the receiver in place,
    # which would silently grow the caller's schema on every read
    return StructType(list(schema.fields)
                      + [StructField(_CORRUPT, StringType())])


def read_jsonl(spark: SparkSession, path: str, schema: StructType,
               ) -> tuple[DataFrame, DataFrame, Callable[[], None]]:
    """One-scan good/quarantine split of a JSONL source.

    Returns ``(good, quarantine, release)``: ``good`` carries exactly
    ``schema``'s columns (malformed lines excluded); ``quarantine``
    carries the raw offending line plus its source file, the same
    observability the CSV ingest's quarantine table gives (K3);
    ``release()`` unpersists the cached parsed batch — call it once both
    frames have been consumed.
    """
    df = (spark.read.schema(_full_schema(schema))
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", _CORRUPT)
          .json(path)
          .withColumn("_src_file", F.input_file_name())
          .cache())  # SPARK-21610: corrupt-column filters need materialization
    good = (df.filter(F.col(_CORRUPT).isNull())
            .select(*schema.fieldNames()))
    quarantine = (df.filter(F.col(_CORRUPT).isNotNull())
                  .select(F.col(_CORRUPT).alias("raw_line"),
                          F.col("_src_file").alias("src_file")))

    def release() -> None:
        df.unpersist()

    return good, quarantine, release


def read_jsonl_strict(spark: SparkSession, path: str,
                      schema: StructType) -> DataFrame:
    """FAILFAST variant: any malformed line aborts the read — the mode for
    sources whose contract says malformed == bug, not noise."""
    return (spark.read.schema(schema).option("mode", "FAILFAST").json(path))


def stream_jsonl(spark: SparkSession, path_glob: str,
                 schema: StructType) -> DataFrame:
    """Streaming twin: malformed lines surface as rows with every schema
    field NULL and the raw line in the corrupt column, so a downstream
    ``filter`` routes them to the quarantine sink inside the SAME
    micro-batch (foreachBatch can apply the batch split above)."""
    return (spark.readStream.schema(_full_schema(schema))
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
            .json(path_glob))
