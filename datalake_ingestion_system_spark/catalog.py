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
