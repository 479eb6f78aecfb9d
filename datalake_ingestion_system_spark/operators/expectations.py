"""Declarative data-quality expectations over a DataFrame (Deequ-shape).

The reference's only validation is file-level arity checking with quarantine
routing (SURVEY §2, P10/K3); a lake at 100 TB also needs row- and
column-level contracts.  Each expectation compiles to a plain aggregate
expression, so ANY number of checks is ONE scan + ONE partial-agg shuffle
(no per-rule job); uniqueness checks add one groupBy each (they cannot
share the row-level pass).

Expectations are plain tuples — (name, kind, args) — so configs can live in
tables, mirroring the reference's tables-as-config registry design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple:
    return (f"not_null({col})", "row", F.col(col).isNull())

def in_range(col: str, lo, hi) -> tuple:
    return (f"in_range({col},{lo},{hi})", "row",
            ~F.col(col).between(lo, hi) | F.col(col).isNull())

def matches(col: str, pattern: str) -> tuple:
    return (f"matches({col})", "row",
            ~F.col(col).rlike(pattern) | F.col(col).isNull())

def in_set(col: str, values: list) -> tuple:
    return (f"in_set({col})", "row",
            ~F.col(col).isin(values) | F.col(col).isNull())

def unique(*cols: str) -> tuple:
    return (f"unique({','.join(cols)})", "unique", list(cols))


def check(df: DataFrame, expectations: list[tuple]) -> DataFrame:
    """Evaluate expectations; returns (rule, n_rows, n_violations, pass)
    one row per rule.  Row-level rules share one aggregate pass; each
    uniqueness rule is one extra groupBy counting over-represented keys'
    surplus rows."""
    row_rules = [(n, viol) for (n, kind, viol) in expectations
                 if kind == "row"]
    uniq_rules = [(n, cols) for (n, kind, cols) in expectations
                  if kind == "unique"]

    out = None
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(F.when(viol, 1).otherwise(0)).alias(f"_v{i}")
            for i, (_n, viol) in enumerate(row_rules)]
        r = df.agg(*aggs)
        parts = [
            F.struct(F.lit(name).alias("rule"),
                     F.col("_n").alias("n_rows"),
                     F.col(f"_v{i}").alias("n_violations"))
            for i, (name, _v) in enumerate(row_rules)]
        out = (r.select(F.explode(F.array(*parts)).alias("p"))
               .select("p.rule", "p.n_rows", "p.n_violations"))

    for name, cols in uniq_rules:
        n_rows = F.sum("_c").cast("long")
        surplus = F.sum(F.col("_c") - 1).cast("long")
        u = (df.groupBy(*cols).agg(F.count(F.lit(1)).alias("_c"))
             .agg(F.lit(name).alias("rule"),
                  n_rows.alias("n_rows"),
                  surplus.alias("n_violations")))
        out = u if out is None else out.unionByName(u)

    return out.withColumn("pass", F.col("n_violations") == 0)
