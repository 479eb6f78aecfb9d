"""Python user-defined table functions (SURVEY U2 — the UDTF surface).

Spark 4 Python UDTFs are the lateral-join generator shape: one input row
expands to 0..n output rows with per-call Python state (here: the
first-occurrence map) — the piece of the UDF surface ``explode`` +
builtins cannot express when the expansion logic is stateful.

Scale notes: a UDTF runs row-at-a-time in Python workers — strictly the
slow path vs ``explode``/``transform``.  Use it when per-row generator
state is genuinely needed; keep the emitted row width small (the output
here is three narrow columns).  The term-stats job itself could be done
with explode + groupBy; it is registered to exercise and pin the UDTF
contract (registration, lateral correlated join, typed yields) against a
plain-SQL oracle.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# re.ASCII: Python \w is Unicode-aware by default, but the engine-side
# tokenizer (textfns.tokens, Java regex) and the DuckDB RE2 oracle both
# match ASCII-only \w — without the flag, tokenization diverges on any
# non-ASCII document (ADVICE r4).
_WORD_RE = re.compile(r"\w+", re.ASCII)


@udtf(returnType="term string, first_pos int, n_occurrences int")
class TermStats:
    """Per-document distinct-term statistics: one output row per distinct
    lower-cased ``\\w+`` token, with its first position and count —
    the same tokenization as ``textfns.tokens`` so results line up with
    the rest of the text tier."""

    def eval(self, text: str):
        if text is None:
            return
        seen: dict[str, list[int]] = {}
        for i, t in enumerate(_WORD_RE.findall(text.lower())):
            if t in seen:
                seen[t][1] += 1
            else:
                seen[t] = [i, 1]
        for t, (pos, n) in seen.items():
            yield t, pos, n


def register_udtfs(spark) -> None:
    """Register every UDTF under its class name for SQL lateral joins."""
    spark.udtf.register("TermStats", TermStats)
