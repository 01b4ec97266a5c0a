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
    """Word n-gram shingles as an array column — O(tokens), not O(tokens²).

    Built with ``zip_with`` over shifted ``slice``s: a higher-order
    function materializes its *array arguments* once per row and then
    loops, whereas an index lambda like
    ``transform(sequence(1, n-2), i -> concat(element_at(toks, i), …))``
    re-evaluates the underlying ``split(text)`` on every element after
    Catalyst's CollapseProject inlines it (measured: 40× slowdown on the
    shingle pipeline). ``slice`` with length ``greatest(n_tok-(n-1), 0)``
    also makes the short-document case an empty array without a
    ``sequence(1, 0)`` guard (Spark's sequence counts *down* there).
    """
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, 1 + j, m),
            lambda g, t: F.concat(g, F.lit(" "), t),
        )
    return grams


def sql_word_ngrams(toks: str, n: int = 3) -> str:
    """DuckDB mirror of :func:`word_ngrams` (generate_series(1,0) is
    empty in DuckDB, so no guard needed)."""
    parts = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, len({toks}) - {n - 1}), i -> {parts})"
    )


#: JVM-exact trim/split mirrors for the Arrow text kernels below.
#: Spark's ``trim(col)`` strips the SPACE character (U+0020) only —
#: NOT Java String.trim's ≤U+0020 range (probed: control chars at the
#: edges survive F.trim). Java regex \s is exactly [ \t\n\x0B\f\r ]
#: and Python's re.ASCII \s is the same set (\x0B == \v), so a
#: compiled ASCII pattern splits identically.
_JAVA_TRIM_CHARS = " "


def _java_tokens(text: str, _ws=None) -> list[str]:
    """CPython mirror of :func:`tokens` = split(trim(text), '\\s+'):
    Spark trim (space-only), then Java-regex \\s+ split (empty string
    → [''], matching Java split semantics)."""
    import re

    ws = _ws or re.compile(r"\s+", re.ASCII)
    return ws.split(text.strip(_JAVA_TRIM_CHARS))


def arrow_paragraph_rows(df, w: int, text: str = "text", with_pos: bool = True):
    """(…, text) → one row per fixed-width paragraph window, in Arrow
    batches (guide §4.2): tokens = Java-exact trim+\\s+ split, windows
    of ``w`` consecutive tokens (last one ragged), para = ' '-join.
    Replaces ``posexplode(paragraphs(text))`` — the w-deep zip_with/
    concat expression chain (O(n·w) interpreted string concats per doc
    plus a Catalyst tree that costs real planning time) — with one
    C-speed regex split per document. Output rows/values are identical:
    the splitter and joiner mirror the JVM ops char for char (see
    _java_tokens), and win_id reproduces posexplode's 0-based int pos.
    ``text`` is consumed; every other column passes through (repeated
    per window)."""
    import re

    from pyspark.sql import types as T

    keep_fields = [f for f in df.schema.fields if f.name != text]
    keep = [f.name for f in keep_fields]
    out_fields = list(keep_fields)
    if with_pos:
        out_fields.append(T.StructField("win_id", T.IntegerType(), False))
    out_fields.append(T.StructField("para", T.StringType(), True))
    schema = T.StructType(out_fields)

    def seg(it):
        import numpy as np
        import pyarrow as pa

        ws = re.compile(r"\s+", re.ASCII)
        for batch in it:
            if batch.num_rows == 0:
                continue
            texts = batch.column(
                batch.schema.get_field_index(text)
            ).to_pylist()
            paras: list[str] = []
            counts = np.empty(len(texts), dtype=np.int64)
            for i, t in enumerate(texts):
                if t is None:
                    # posexplode(paragraphs(NULL)) emitted no rows —
                    # null-propagate instead of crashing the task
                    # (round-11 advice item 2).
                    counts[i] = 0
                    continue
                toks = _java_tokens(t, ws)
                n = len(toks)
                c = (n + w - 1) // w
                counts[i] = c
                for j in range(0, n, w):
                    paras.append(" ".join(toks[j : j + w]))
            idx = pa.array(np.repeat(np.arange(len(texts)), counts))
            arrays = [
                batch.column(batch.schema.get_field_index(k)).take(idx)
                for k in keep
            ]
            names = list(keep)
            if with_pos:
                pos = np.concatenate(
                    [np.arange(c, dtype=np.int32) for c in counts]
                ) if len(counts) else np.empty(0, dtype=np.int32)
                arrays.append(pa.array(pos, pa.int32()))
                names.append("win_id")
            arrays.append(pa.array(paras, pa.string()))
            names.append("para")
            yield pa.RecordBatch.from_arrays(arrays, names)

    return df.mapInArrow(seg, schema)


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


def hex15_to_long(hex_col: Column) -> Column:
    """First 15 hex chars of a digest → BIGINT (< 2^60). Spark side uses
    conv(…, 16, 10); the SQL mirror is a Horner chain over strpos
    lookups (DuckDB has no hex-string→int cast)."""
    return F.conv(F.substring(hex_col, 1, 15), 16, 10).cast("long")


def sql_hex15_to_long(hex_expr: str) -> str:
    acc = "0"
    for i in range(1, 16):
        acc = f"({acc} * 16 + {sql_hexval(f'substr({hex_expr}, {i}, 1)')})"
    return f"CAST({acc} AS BIGINT)"
