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
    only legal on LTZ).

    Computed with pure WALL-CLOCK arithmetic — days-since-epoch of the
    date part plus the time-of-day components — which involves no timezone
    conversion at all: an earlier ``cast("timestamp").cast("long")`` form
    interpreted the NTZ wall clock in the session zone, so with a
    DST-observing SPARK_GRAFT_TZ, differences spanning a transition were
    off by the offset change vs the naive-timestamp DuckDB oracle
    (ADVICE r4).  This form treats naive wall clocks as UTC under every
    session timezone, matching the oracle unconditionally."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.unix_date(F.to_date(c)) * F.lit(86400).cast("long")
            + F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c))


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


def spread(df: DataFrame) -> DataFrame:
    """Spread a narrow source across the cluster for CPU-bound per-row work.

    A small file arrives as ONE input split, so char/token-level pipelines
    (rolling hashes, n-gram explosion, signature math) run on a single core
    no matter how many are idle — measured 4-7x end-to-end on local[32]
    for the MinHash and contamination paths.  At real scale the input
    already has >= parallelism splits and this is a no-op.  The shuffle
    moves only the pruned input columns (call after ``select`` when
    possible).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8):
    """Morton z-value Column over ``cols`` (each quantized to ``2**bits``
    uniform buckets between its min and max — two scalars per column),
    or None for an empty frame.  The shared primitive behind
    ``plans.maintenance.zorder_write`` and
    ``TxnLogFormat.compact(..., zorder=True)``: interleaved bucket bits
    keep per-file min/max TIGHT on every clustered column at once, which
    is what multi-column data skipping needs (single-column range
    clustering prunes one column and nothing else).  Raises on
    entirely-NULL cluster columns."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("z-order over 1-4 columns")
    stats = df.agg(*[f(c).alias(f"{n}_{c}") for c in cols
                     for n, f in (("mn", F.min), ("mx", F.max))]).head()
    if any(stats[f"mn_{c}"] is None for c in cols):
        if not df.head(1):
            return None  # empty frame: nothing to cluster
        bad = [c for c in cols if stats[f"mn_{c}"] is None]
        raise ValueError(
            f"z-order columns {bad} are entirely NULL — cluster on "
            "non-null columns or fill first")
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn = float(stats[f"mn_{c}"])
        mx = float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        bucket = F.least(
            F.lit(2 ** bits - 1),
            F.floor((F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span) * F.lit(2 ** bits))).cast("long")
        for b in range(bits):
            z = z + (F.shiftright(bucket, b).bitwiseAND(F.lit(1))
                     .cast("long")
                     * F.lit(1 << (b * len(cols) + ci)).cast("long"))
    return z


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register every lake table as a temp view for the SQL surface."""
    for name in names:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
