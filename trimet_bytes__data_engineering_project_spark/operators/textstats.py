"""Text-analysis operators (north-star extensions): token counting,
quality signals, language-ID heuristics, fingerprinting.

All native column expressions — these run inside whole-stage codegen on
the scan, so at 100 TB they cost one pass over the text column with no
Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def token_count_col(text: Column) -> Column:
    """Whitespace token count (split on runs of whitespace)."""
    return F.size(F.split(F.trim(text), r"\s+")).cast("int")


def char_class_count(text: Column, char_class: str) -> Column:
    """Count of characters matching a regex character class, computed as
    length delta after global removal (identical semantics in DuckDB via
    regexp_replace(..., 'g'))."""
    return F.length(text) - F.length(F.regexp_replace(text, char_class, ""))


def quality_stats(text: Column) -> list[Column]:
    """Quality-scoring signal set (doc length, vowel/space density,
    token shape).  Integer counts + one IEEE division — deterministic
    across engines."""
    n_chars = F.length(text).cast("long").alias("n_chars_measured")
    n_vowels = char_class_count(text, "[aeiou]").cast("long").alias("n_vowels")
    n_spaces = char_class_count(text, "[ ]").cast("long").alias("n_spaces")
    n_tokens = token_count_col(text)
    return [
        n_chars,
        n_vowels,
        n_spaces,
        n_tokens.alias("n_tokens"),
        (F.length(text).cast("double") / n_tokens).alias("avg_token_len"),
    ]
