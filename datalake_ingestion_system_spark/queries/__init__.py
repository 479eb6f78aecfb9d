"""Named query registry — the engine's public query surface.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLE_SQL: dict[str, str]`` (ANSI/DuckDB SQL over the same parquet
views).  Keys absent from ``ORACLE_SQL`` are non-SQL-expressible operators
(approximate / hash-dependent / streaming-stateful) checked rows-only.
"""

from __future__ import annotations

from . import functional, llmops, relational, streaming_q, tpch


# Merge order controls which queries front the dict (CI samples a prefix).
# Round 2 verified the relational+tpch tier; round 3 fronts the
# llmops/streaming/functional tier so its queries get verified rows too.
# Queries with a green CORRECTNESS row in an earlier round rotate to the
# back so the sampled prefix spends its slots on not-yet-driver-verified
# entries (every rotated query remains registered and locally verified).
_MODULE_ORDER = (llmops, streaming_q, functional, relational, tpch)
_ROTATE_TO_BACK = (
    # verified green in CORRECTNESS_r02
    "q_dedup_exact", "q_doc_fingerprint",
    # verified green in CORRECTNESS_r03
    "q_word_jaccard_pairs", "q_ngram_jaccard_pairs", "q_text_quality",
    "q_lang_id", "q_repetition_quality", "q_corpus_clean_pipeline",
    "q_array_functions", "q_embedding_norm_stats",
    "q_binary_bytes_by_source", "q_grouped_pandas_agg",
    "q_rolling_fingerprint", "q_winnow_fingerprints", "q_bpe_token_stats",
)


def _merge(attr):
    merged = {}
    for mod in _MODULE_ORDER:
        merged.update(getattr(mod, attr))
    for key in _ROTATE_TO_BACK:
        if key in merged:
            merged[key] = merged.pop(key)
    return merged


def all_queries():
    return _merge("QUERIES")


def all_oracle_sql():
    return _merge("ORACLE_SQL")
