"""Metadata config registry — the mapping table driving ingestion.

Rebuilds the reference's metadata mapping CSV contract
(DATALAKE_TRANSFORMATION_S3_DAILY_JOB.PY:138-143, FIXTURES.md §A2) with real
types instead of ``ast.literal_eval``-ed Python list literals (reference
D:302): column lists are pipe-separated strings parsed once into genuine
``array<string>`` columns; validity dates are real dates; TYPELIST codes map
to actual Spark types (the reference's typed-cast path was abandoned due to a
broken format string — see SURVEY §0.3.1 — ours works).

Registry columns:
    TABLE      string   table name == landing filename prefix
    HEADLIST   string   'COL_A|COL_B|...'  (imposed on headerless CSVs)
    TYPELIST   string   '4|1|6|...'        (codes below; optional)
    FEQ        string   daily|weekly|monthly cadence folder
    STARTDATE  string   yyyy/MM/dd validity start (inclusive)
    ENDDATE    string   yyyy/MM/dd validity end (exclusive)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Reference type codes (D:90-98) → Spark DDL types.  Code 2 maps to DOUBLE
#: (not FLOAT) for SQL-engine parity; code 3 carries explicit default
#: precision (config may extend with 'decimal(p,s)' literals later).
TYPE_CODES = {
    "1": "string",
    "2": "double",
    "3": "decimal(18,4)",
    "4": "bigint",
    "5": "timestamp",
    "6": "date",
    "7": "boolean",
}

#: Correct timestamp/date formats — the reference shipped
#: ``yyyyy/mm/dd hh:mm:ss`` (5×y, minutes-for-months, 12-h clock, D:152)
#: and abandoned typed casting; these are the fixed equivalents.
TIMESTAMP_FMT = "yyyy/MM/dd HH:mm:ss"
DATE_FMT = "yyyy/MM/dd"


class ConfigError(ValueError):
    """Raised on registry integrity violations (job-abort semantics, D:222-230)."""


def load_registry(spark: SparkSession, path: str) -> DataFrame:
    """Read the mapping CSV and parse typed columns."""
    raw = spark.read.option("header", True).csv(path)
    return parse_registry(raw)


def parse_registry(raw: DataFrame) -> DataFrame:
    """Parse/typify a raw (all-string) registry DataFrame."""
    return raw.select(
        F.col("TABLE"),
        F.split("HEADLIST", r"\|").alias("head_list"),
        F.when(F.col("TYPELIST").isNull() | (F.col("TYPELIST") == ""),
               F.array().cast("array<string>"))
         .otherwise(F.split("TYPELIST", r"\|")).alias("type_list"),
        F.coalesce(F.col("FEQ"), F.lit("daily")).alias("feq"),
        F.to_date("STARTDATE", DATE_FMT).alias("start_date"),
        F.to_date("ENDDATE", DATE_FMT).alias("end_date"),
    )


def validate_registry(conf: DataFrame) -> None:
    """Config integrity: duplicate column names in any HEADLIST abort the run
    (reference D:222-230 did this with a driver loop + SNS; one expression
    here).  Also rejects arity mismatch between HEADLIST and TYPELIST."""
    bad = (
        conf.filter(
            (F.size(F.array_distinct("head_list")) < F.size("head_list"))
            | ((F.size("type_list") > 0)
               & (F.size("type_list") != F.size("head_list")))
        )
        .select("TABLE")
        .limit(20)
        .collect()
    )
    if bad:
        tables = sorted({r[0] for r in bad})
        raise ConfigError(
            f"registry integrity violation (duplicate columns or HEADLIST/"
            f"TYPELIST arity mismatch) for tables: {tables}")


def ddl_for(head_list: list[str], type_list: list[str] | None,
            all_string: bool = False) -> str:
    """DDL schema string for a config row ('a STRING, b BIGINT, ...')."""
    if all_string or not type_list:
        return ", ".join(f"`{c}` string" for c in head_list)
    if len(type_list) != len(head_list):
        raise ConfigError(
            f"TYPELIST arity {len(type_list)} != HEADLIST arity {len(head_list)}")
    try:
        types = [TYPE_CODES[t] for t in type_list]
    except KeyError as e:  # unknown code
        raise ConfigError(f"unknown TYPELIST code {e}") from None
    return ", ".join(f"`{c}` {t}" for c, t in zip(head_list, types))
