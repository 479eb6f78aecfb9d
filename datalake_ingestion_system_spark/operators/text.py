"""Text analysis operators: language ID, quality scoring, token stats.

Deterministic heuristics built from regexp/length expressions only, so the
documents scan stays in whole-stage codegen and the same column definitions
can be mirrored exactly in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import token_count

#: Tiny per-language stopword marker sets (heuristic language ID).
STOPWORDS = {
    "en": ("the", "and", "a"),
    "es": ("el", "la", "los"),
    "fr": ("le", "la", "les"),
    "de": ("der", "die", "das"),
}


def _count_words(text: Column, words: tuple[str, ...]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def lang_id(text: Column | str) -> Column:
    """Stopword-vote language guess; 'und' (undetermined) when no marker hits.

    Ties break by fixed language order — mirrored exactly in the SQL oracle.
    """
    text = F.col(text) if isinstance(text, str) else text
    counts = {lang: _count_words(text, ws) for lang, ws in STOPWORDS.items()}
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # reversed: earlier languages win ties via later WHEN overwrite order
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((counts[lang] > 0) & (counts[lang] == best), lang).otherwise(expr)
    return expr


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features: char/word counts, punctuation/digit/
    space ratios, mean word length — the usual pre-training filters."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_words = token_count(t).cast("long")
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,;:!?]"), 0))
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 4).alias("punct_ratio"),
        F.round(n_digit / F.greatest(n_chars, F.lit(1)), 4).alias("digit_ratio"),
        F.round((n_chars - F.length(F.regexp_replace(t, r"\s", ""))) /
                F.greatest(n_chars, F.lit(1)), 4).alias("space_ratio"),
        F.round(F.length(F.regexp_replace(t, r"\s", "")) /
                F.greatest(n_words, F.lit(1)), 4).alias("mean_word_len"),
    )
