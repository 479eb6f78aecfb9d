"""Named query registry — the engine's public query surface.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLE_SQL: dict[str, str]`` (ANSI/DuckDB SQL over the same parquet
views).  Keys absent from ``ORACLE_SQL`` are non-SQL-expressible operators
(approximate / hash-dependent / streaming-stateful) checked rows-only.
"""

from __future__ import annotations

from . import functional, llmops, relational, streaming_q, tpch


def all_queries():
    merged = {}
    for mod in (relational, tpch, llmops, streaming_q, functional):
        merged.update(mod.QUERIES)
    return merged


def all_oracle_sql():
    merged = {}
    for mod in (relational, tpch, llmops, streaming_q, functional):
        merged.update(mod.ORACLE_SQL)
    return merged
