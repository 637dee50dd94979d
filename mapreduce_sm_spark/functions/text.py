"""Text tokenization / normalization as pure column expressions.

Token grammar reproduces the reference wordcount's scanner intent
(/root/reference/examples/wordcount/wordcount.c:56-92): a word is a maximal
run starting with a letter, continuing over letters and apostrophes,
uppercased. (The reference's cross-chunk NUL bug — SURVEY App. A.4 — is
intentionally NOT reproduced; Spark line records have no chunk seams.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# after upper(): a token is [A-Z][A-Z']*
WORD_TOKEN_RE = "[A-Z][A-Z']*"

# The same grammar for the DuckDB oracle (RE2 syntax, '' escapes the quote
# inside a SQL string literal).
WORD_TOKEN_RE_SQL = "[A-Z][A-Z'']*"


def tokenize_words(col: Column | str) -> Column:
    """array<string> of uppercased word tokens.

    regexp_extract_all runs JVM-side inside codegen; the equivalent oracle is
    DuckDB's regexp_extract_all(upper(x), '[A-Z][A-Z'']*').
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.upper(c), F.lit(WORD_TOKEN_RE), F.lit(0))


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """array<string> of all k-character substrings (shingles) of a string.

    Built from sequence+transform (codegen'd) rather than a Python UDF.
    Oracle: list_transform(generate_series(1, len(x)-k+1), i -> substr(x,i,k)).
    Strings shorter than k yield a single truncated shingle (both engines).
    """
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.substr(c, i, F.lit(k)))


def char_shingles_sql(expr: str, k: int = 5) -> str:
    """DuckDB rendering of char_shingles."""
    return (
        f"list_transform(generate_series(1, greatest(len({expr}) - {k - 1}, 1)), "
        f"i -> substr({expr}, i, {k}))"
    )


def distinct_shingles(col: Column | str, k: int = 5) -> Column:
    """array<string> of the DISTINCT k-grams (a set, for Jaccard)."""
    return F.array_distinct(char_shingles(col, k))
