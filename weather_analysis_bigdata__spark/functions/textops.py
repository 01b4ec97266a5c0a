"""Text expressions shared by the dedup / text-analysis operators.

Everything here is a built-in-function composition (split / transform /
sequence / md5) — JVM-side, codegen-friendly, no Python UDFs — with an
ANSI-SQL mirror for the DuckDB oracle. Hash parity: ``md5``/``sha2`` of
the same bytes produce identical lowercase hex on both engines (Spark
needs an explicit binary cast).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword list for ratio features and the language-ID heuristic.
STOPWORDS = ("the", "a", "of", "to", "in")

HEX = "0123456789abcdef"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (trim first so no empty edge tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


SQL_TOKENS = "regexp_split_to_array(trim({c}), '\\s+')"


def md5s(col: Column) -> Column:
    """md5 hex of a string column (Spark md5 wants binary input)."""
    return F.md5(col.cast("binary"))


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column.

    Guarded: Spark's ``sequence(1, 0)`` counts *down* (yielding [1,0]),
    so short documents must short-circuit to an empty array.
    """
    size = F.size(toks)
    idx = F.sequence(F.lit(1), size - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(size >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def sql_word_ngrams(toks: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`word_ngrams` (generate_series(1,0) is
    empty in DuckDB, so no guard needed)."""
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), i -> {parts})"
    )


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse interior
    whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


SQL_NORMALIZED = "regexp_replace(lower(trim({c})), '\\s+', ' ', 'g')"


def hexval(char_col: Column) -> Column:
    """Value 0-15 of one lowercase hex character. Spark side uses a map
    literal '0'→0 … 'f'→15 (built lazily — F.lit needs a live session);
    the SQL mirror indexes the hex alphabet with strpos — both are exact
    integer lookups."""
    hexmap = F.create_map(
        *[x for i, ch in enumerate(HEX) for x in (F.lit(ch), F.lit(i))]
    )
    return F.element_at(hexmap, char_col)


def sql_hexval(char_expr: str) -> str:
    return f"(strpos('{HEX}', {char_expr}) - 1)"
