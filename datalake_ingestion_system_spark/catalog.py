"""Test-lake catalog: load the driver-generated parquet tables.

Replaces the reference's Glue-crawler + Athena catalog round-trip
(RUN_CRAWLER_JOB.PY:35-91): schemas are known at read time from parquet
footers, so registration is a plain ``createOrReplaceTempView`` — no
polling orchestration needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Dimension tables small enough to always broadcast at any scale factor.
BROADCAST_DIMS = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def fix_nanos_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """TIMESTAMP(NANOS) parquet columns are read as long (nanosAsLong conf);
    floor-convert ns→µs to a real timestamp (same truncation DuckDB applies)."""
    if col in df.columns and isinstance(df.schema[col].dataType, LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def epoch_seconds(col) -> F.Column:
    """Epoch seconds of a timestamp column, valid for both TIMESTAMP and
    TIMESTAMP_NTZ inputs (the driver-generated parquet carries no tz
    metadata, so Spark 4 reads ``ts`` as NTZ; a bare ``cast("long")`` is
    only legal on LTZ).  NTZ → LTZ interprets the wall clock in the session
    timezone; epoch *differences* — the only thing callers use this for —
    are timezone-invariant."""
    return F.col(col).cast("timestamp").cast("long") if isinstance(col, str) \
        else col.cast("timestamp").cast("long")


def ensure_ltz(df: DataFrame, *cols: str) -> DataFrame:
    """Cast TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).  Event-time watermarks
    require LTZ (`EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`); batch reads of the
    same parquet surface NTZ.  No-op for columns already LTZ."""
    for c in cols:
        if c in df.columns and str(df.schema[c].dataType) == "TimestampNTZType()":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def ensure_ntz(df: DataFrame, *cols: str) -> DataFrame:
    """Cast TIMESTAMP (LTZ) columns back to TIMESTAMP_NTZ so collected values
    are naive wall clocks that compare bit-for-bit with the oracle engine's
    (DuckDB's timestamps are naive).  Round-trips ensure_ltz under any fixed
    session timezone."""
    for c in cols:
        if c in df.columns and str(df.schema[c].dataType) == "TimestampType()":
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table. Column pruning/pushdown flow from the caller's
    ``select``/``filter`` via Catalyst — never pre-collect or cache here."""
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = fix_nanos_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register every lake table as a temp view for the SQL surface."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
