"""Text-analysis column expressions for the training-data pipeline surface.

All built-ins (regexp/array functions) — tokenization, shingling, counting and
fingerprinting run inside whole-stage codegen, so a 100 TB documents table is
one scan with no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Lower-cased word tokens (``\\w+`` runs)."""
    return F.regexp_extract_all(F.lower(_c(text)), F.lit(r"\w+"), 0)


def token_count(text: Column | str) -> Column:
    """Whitespace-token count (BPE-ish proxy: non-space runs)."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(r"\S+"), 0))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lower-case, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Array of character n-grams over normalized text (near-dup unit for
    short/CJK-ish content where word shingles are too coarse)."""
    t = normalize_text(text)
    return F.when(
        F.length(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - (n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_of(ws: Column, n: int = 3) -> Column:
    """n-word shingles from an ALREADY-MATERIALIZED token-array attribute.

    ``ws`` must be a plain column reference (stage ``tokens(...)`` in its own
    projection first).  Passing the tokenization expression directly would
    re-evaluate the regex once per shingle inside the ``transform`` lambda —
    higher-order-function bodies are interpreted per element with no
    cross-lambda subexpression elimination (measured O(tokens²): 5.3s → 0.9s
    at sf0.1 for MinHash signatures after staging).
    """
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of n-word shingles (the MinHash unit) as one expression.

    Convenience form for one-shot use; hot paths should stage ``tokens``
    into its own projection and call ``shingles_of`` (see its docstring).
    """
    return shingles_of(tokens(text), n)

#: GPT-2-style pre-tokenizer split (simplified to be Java-regex / RE2
#: compatible on both engines): a token is an optional leading space plus a
#: letter run, digit run, or punctuation run.  This is the unit a BPE vocab
#: merges from, so its count tracks LLM token counts far better than
#: whitespace splitting (code, punctuation-dense and CJK-ish text).
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-pre-tokenizer token array (see ``BPE_SPLIT_RE``)."""
    return F.regexp_extract_all(_c(text), F.lit(BPE_SPLIT_RE), 0)


#: Rabin-Karp rolling-hash parameters (shared with the DuckDB oracle).
RK_BASE = 257
#: Second independent base — pairing two rolling hashes (same positions,
#: different base) drops the per-pair collision odds from ~n²/2³¹ (real
#: at corpus scale) to ~n²/2⁶², so exact-substring dedup can group on
#: the hash PAIR without verifying bytes.
RK_BASE2 = 263
RK_MOD = 2147483647  # 2^31 - 1


def char_codes(text: Column | str) -> Column:
    """Char-code array of normalized text — STAGE THIS in its own projection
    before calling ``rolling_hashes_of`` (same O(len²) re-evaluation trap as
    ``shingles_of``; unstaged it measured 65s vs 1s at sf0.01)."""
    return F.transform(F.split(normalize_text(text), ""),
                       lambda ch: F.ascii(ch).cast("long"))


def rolling_hashes_of(codes: Column | str, n: int = 8,
                      base: int = RK_BASE) -> Column:
    """Rabin-Karp rolling hashes of every char n-gram:
    ``h_i = sum_k codes[i+k] * BASE^k mod MOD`` over an ALREADY-MATERIALIZED
    char-code array attribute (see ``char_codes``).

    The winnowing/fingerprinting unit (Schleimer et al., SIGMOD'03): a
    document fingerprint is a selection over this array (min, mod-0 sample,
    or per-window minima).  Pure codegen — per position it is ``n`` multiply-
    adds; terms stay < 2^42 so no overflow under ANSI mode.  Docs shorter
    than ``n`` chars yield an empty array (guarded: an unguarded descending
    ``sequence`` would silently emit reversed positions).
    """
    codes = _c(codes)
    pows = [pow(base, k, RK_MOD) for k in range(n)]

    def h(i):
        s = F.element_at(codes, i) * F.lit(pows[0])
        for k in range(1, n):
            s = s + F.element_at(codes, i + F.lit(k)) * F.lit(pows[k])
        return F.pmod(s, F.lit(RK_MOD))

    return F.when(
        F.size(codes) >= n,
        F.transform(F.sequence(F.lit(1), F.size(codes) - (n - 1)), h),
    ).otherwise(F.array().cast("array<long>"))


def winnow(rolling_hashes: Column | str, window: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer et al., SIGMOD'03): the
    distinct per-window minima of the rolling-hash array — every ``window``
    consecutive hashes contribute their min, so any match of length
    ``>= n + window - 1`` chars between two documents is guaranteed to share
    a selected fingerprint (the positional-coverage guarantee plain
    min-sampling lacks).  Input is the STAGED array from
    ``rolling_hashes_of``; output is sorted for deterministic comparison."""
    rh = _c(rolling_hashes)
    mins = F.transform(
        F.sequence(F.lit(1), F.size(rh) - (window - 1)),
        lambda i: F.array_min(F.slice(rh, i, window)))
    return F.when(F.size(rh) >= window,
                  F.array_sort(F.array_distinct(mins))).otherwise(
        F.when(F.size(rh) > 0,
               F.array(F.array_min(rh))).otherwise(
            F.array().cast("array<long>")))
