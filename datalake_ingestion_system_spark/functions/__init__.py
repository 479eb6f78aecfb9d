"""Column-level helper functions (all JVM-side Catalyst expressions).

Everything here returns ``pyspark.sql.Column`` built from built-in functions —
no Python UDFs — so the hot path stays inside whole-stage codegen and scales
linearly with executors.
"""

from .vectors import cosine_similarity, dot, l2_norm
from .textfns import normalize_text, token_count, tokens, word_shingles

__all__ = [
    "cosine_similarity", "dot", "l2_norm",
    "normalize_text", "token_count", "tokens", "word_shingles",
]
