"""Round-7 batch: maximal-span exact substring dedup, the unigram-LM
tokenizer, the classifier operating-point sweep, and drift-gated
admission.

- **Maximal duplicated spans** (Lee et al. 2022, "Deduplicating
  Training Data Makes Language Models Better" — the ExactSubstr full
  form): `dedup_shared_ngram_spans` detects duplication at fixed 8-gram
  granularity; the production pass merges ADJACENT shared grams into
  maximal duplicated substrings with a minimum token length (the paper
  removes ≥50-BPE-token spans), so removal happens at span, not gram,
  granularity. Spark-first shape: the gram postings self-join is the
  dotplot, and a maximal shared substring between two documents is a
  maximal RUN along one diagonal (pos_b - pos_a constant, pos_a
  consecutive) — a gaps-and-islands window per (pair, diagonal), never
  a per-token alignment.

- **Unigram-LM tokenizer** (Kudo 2018; the SentencePiece default):
  operators/unigram.py trains by EM over the candidate-piece lattice
  (Viterbi E-step as integer DP, driver-quantized prune M-step) and
  tokenizes by the same DP; the trained vocabulary persists as an
  index (operators/index_store.py). Exact-equality-gated against the
  independent pure-Python operators/unigram_reference.py, which also
  generates the lazy literal-VALUES oracles (the BPE pattern).

Reference parity note: the reference (Weather_API.py) has no substring
dedup at all — this is charter-extension breadth on the `documents`
table, same as the rest of the dedup ladder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.functions.textops import (
    SQL_TOKENS,
    hex15_to_long,
    md5s,
    tokens,
    word_ngrams,
)
from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.sources.files import (
    load_table,
    spread_small_scan,
)

# ---------------------------------------------------------------------------
# Maximal-span exact substring dedup
# ---------------------------------------------------------------------------
#: Gram width in tokens — same 8-gram shingles as dedup_shared_ngram_spans.
_SPAN_N = 8
#: Minimum duplicated-span length in tokens to report/remove. Lee et
#: al. use 50 BPE tokens on web text; this corpus is short whitespace-
#: token documents (avg ~54 tokens), so 20 keeps the yardstick
#: non-vacuous while still well above the gram width.
_SPAN_MIN_TOKENS = 20
#: Occurrence cap per gram before the postings self-join: a gram with
#: > cap total occurrences is dropped from pairing (stopword-gram
#: guard). Bounds the dotplot at N·cap points under ANY skew — the same
#: trade dedup_jaccard_dfcapped makes, mirrored verbatim in the oracle.
_SPAN_OCC_CAP = 16

_SQL_GRAM_CAT = " || ' ' || ".join(f"toks[i+{j}]" for j in range(_SPAN_N))

_SQL_SPAN_BASE = f"""t AS (
      SELECT doc_id, {SQL_TOKENS.format(c='text')} AS toks FROM documents
    ),
    p AS (
      SELECT doc_id, i AS pos, {_SQL_GRAM_CAT} AS gram
      FROM t, unnest(generate_series(1, len(toks) - {_SPAN_N - 1})) AS u(i)
    ),
    capped AS (
      SELECT gram FROM p GROUP BY gram
      HAVING COUNT(*) BETWEEN 2 AND {_SPAN_OCC_CAP}
    ),
    pc AS (SELECT p.* FROM p JOIN capped USING (gram)),
    pairs AS (
      SELECT a.doc_id AS da, a.pos AS pa, b.doc_id AS db,
             b.pos - a.pos AS diag
      FROM pc a JOIN pc b USING (gram) WHERE a.doc_id < b.doc_id
    ),
    isl AS (
      SELECT da, db, diag, pa,
             pa - row_number() OVER (
               PARTITION BY da, db, diag ORDER BY pa) AS isl
      FROM pairs
    ),
    spans AS (
      SELECT da, db, diag, MIN(pa) AS a_start,
             CAST(MAX(pa) - MIN(pa) + {_SPAN_N} AS BIGINT) AS span_tokens
      FROM isl GROUP BY da, db, diag, isl
      HAVING MAX(pa) - MIN(pa) + {_SPAN_N} >= {_SPAN_MIN_TOKENS}
    )"""


def _span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _span_pairs_from(
        spread_small_scan(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
    )


def _span_pairs_from(d: DataFrame) -> DataFrame:
    """Maximal duplicated spans per (doc_a, doc_b) pair: the dotplot
    diagonal-run merge. Distributed shape: postings shuffle once on the
    60-bit gram hash (never the gram string); the run-merge window
    partitions by (pair, diagonal) — thousands of small partitions, no
    global order. Factored on a (doc_id, text) DataFrame so the planted
    positive controls (tests/test_round7_ops.py) drive the REAL kernel."""
    p = d.select(
        "doc_id",
        F.posexplode(word_ngrams(tokens("text"), _SPAN_N)).alias(
            "pos0", "gram"
        ),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),  # 1-based, mirrors the oracle
        hex15_to_long(md5s(F.col("gram"))).alias("gh"),
    )
    # Pair only grams occurring 2..cap times corpus-wide: singletons
    # can't form a duplicated span; hot grams are capped (skew guard).
    keep = p.groupBy("gh").agg(F.count(F.lit(1)).alias("occ")).filter(
        (F.col("occ") >= 2) & (F.col("occ") <= _SPAN_OCC_CAP)
    )
    pc = p.join(keep.select("gh"), "gh")
    a, b = pc.alias("a"), pc.alias("b")
    pairs = a.join(
        b,
        (F.col("a.gh") == F.col("b.gh"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("da"),
        F.col("a.pos").alias("pa"),
        F.col("b.doc_id").alias("db"),
        (F.col("b.pos") - F.col("a.pos")).alias("diag"),
    )
    w = Window.partitionBy("da", "db", "diag").orderBy("pa")
    isl = pairs.withColumn("isl", F.col("pa") - F.row_number().over(w))
    return (
        isl.groupBy("da", "db", "diag", "isl")
        .agg(
            F.min("pa").alias("a_start"),
            (F.max("pa") - F.min("pa") + _SPAN_N)
            .cast("long")
            .alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= _SPAN_MIN_TOKENS)
    )


@register(
    "dedup_span_maximal_pairs",
    oracle=f"""
    WITH {_SQL_SPAN_BASE}
    SELECT da AS doc_id_a, db AS doc_id_b,
           CAST(a_start AS BIGINT) AS a_start,
           CAST(a_start + diag AS BIGINT) AS b_start,
           span_tokens
    FROM spans
    """,
    doc="MAXIMAL duplicated spans — the Lee et al. 2022 ExactSubstr "
    "full form that dedup_shared_ngram_spans is the screen for: "
    f"adjacent shared {_SPAN_N}-grams between a document pair merge "
    "into maximal exactly-duplicated substrings, reported with both "
    f"docs' token extents; only spans ≥ {_SPAN_MIN_TOKENS} tokens "
    "survive (removal at span granularity, not gram granularity). "
    "Semantics: a maximal shared substring is a maximal run along one "
    "DIAGONAL of the gram dotplot (pos_b - pos_a constant, pos_a "
    "consecutive) — merged with a gaps-and-islands window per (pair, "
    "diagonal), so matching is positional, not bag-of-grams: the same "
    "gram recurring at a non-adjacent position opens a new span. "
    "Scale: postings shuffle 60-bit gram hashes once; the self-join "
    f"pairs only grams with 2..{_SPAN_OCC_CAP} corpus occurrences "
    "(singletons can't duplicate, hot grams are skew-capped — the "
    "dedup_jaccard_dfcapped trade, mirrored in the oracle), bounding "
    "the dotplot at N·cap points; windows partition per (pair, "
    "diagonal) — no global sort, no doc×doc blowup. "
    "Ref: Weather_API.py has no substring dedup (charter extension).",
)
def dedup_span_maximal_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _span_pairs(spark, sf_dir).select(
        F.col("da").alias("doc_id_a"),
        F.col("db").alias("doc_id_b"),
        F.col("a_start").cast("long").alias("a_start"),
        (F.col("a_start") + F.col("diag")).cast("long").alias("b_start"),
        "span_tokens",
    )


@register(
    "dedup_span_removal_report",
    oracle=f"""
    WITH {_SQL_SPAN_BASE},
    iv AS (
      SELECT DISTINCT doc_id, s, e FROM (
        SELECT da AS doc_id, a_start AS s,
               a_start + span_tokens - 1 AS e FROM spans
        UNION ALL
        SELECT db AS doc_id, a_start + diag AS s,
               a_start + diag + span_tokens - 1 AS e FROM spans
      )
    ),
    flagged AS (
      SELECT doc_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY doc_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) THEN 1 ELSE 0 END AS opens
      FROM iv
    ),
    grouped AS (
      SELECT doc_id, s, e,
             SUM(opens) OVER (
               PARTITION BY doc_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM flagged
    ),
    merged AS (
      SELECT doc_id, grp, MIN(s) AS ms, MAX(e) AS me
      FROM grouped GROUP BY doc_id, grp
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_regions,
             CAST(SUM(me - ms + 1) AS BIGINT) AS dup_tokens
      FROM merged GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len({SQL_TOKENS.format(c='d.text')}) AS BIGINT)
             AS total_tokens,
           CAST(COALESCE(p.n_dup_regions, 0) AS BIGINT) AS n_dup_regions,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
             / NULLIF(len({SQL_TOKENS.format(c='d.text')}), 0)
             AS dup_fraction
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc="Span-removal accounting — what ExactSubstr dedup would CUT: "
    "per document, the union of all its maximal duplicated spans "
    "(participating as either side of any pair) merged into disjoint "
    "token regions, with removable token counts and fraction. Interval "
    "union is the classic sort + running-max gaps-and-islands, "
    "partitioned per doc_id (windows over a handful of span rows per "
    "doc — never token-exploded). Every document survives via the "
    "left join from the doc spine; dup_tokens 0 for clean docs. "
    "This is the report a removal pass acts on (cut these extents, "
    "keep one canonical copy), sized so a 100 TB corpus's report is "
    "O(spans), not O(tokens).",
)
def dedup_span_removal_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    spans = _span_pairs(spark, sf_dir)
    iv = (
        spans.select(
            F.col("da").alias("doc_id"),
            F.col("a_start").alias("s"),
            (F.col("a_start") + F.col("span_tokens") - 1).alias("e"),
        )
        .unionAll(
            spans.select(
                F.col("db").alias("doc_id"),
                (F.col("a_start") + F.col("diag")).alias("s"),
                (
                    F.col("a_start") + F.col("diag") + F.col("span_tokens") - 1
                ).alias("e"),
            )
        )
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prevmax = (
        F.max("e")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    )
    flagged = iv.withColumn(
        "opens",
        F.when(F.col("s") > F.coalesce(prevmax, F.lit(-1)), 1).otherwise(0),
    )
    grouped = flagged.withColumn(
        "grp",
        F.sum("opens").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = grouped.groupBy("doc_id", "grp").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    per_doc = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_regions"),
        F.sum(F.col("me") - F.col("ms") + 1).cast("long").alias("dup_tokens"),
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens("text")).cast("long").alias("total_tokens")
    )
    return d.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "total_tokens",
        F.coalesce("n_dup_regions", F.lit(0)).cast("long").alias(
            "n_dup_regions"
        ),
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        (
            F.coalesce("dup_tokens", F.lit(0)).cast("double")
            / F.nullif(F.col("total_tokens"), F.lit(0))
        ).alias("dup_fraction"),
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece-style)
# ---------------------------------------------------------------------------
#: Bounded train-query output: top pieces by (use_count DESC, piece ASC).
_UNI_TOP = 64


def _unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED trained vocabulary (piece, count, cost): built once
    per corpus by operators/unigram.py's EM trainer (2 Viterbi E-steps
    over the distinct-word table, driver-quantized M-steps) and
    published via operators/index_store.py — consumers pay a small
    parquet scan, not a retrain."""
    from weather_analysis_bigdata__spark.operators.index_store import (
        persisted_index,
    )
    from weather_analysis_bigdata__spark.operators.unigram import (
        train_unigram,
    )

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        vocab = train_unigram(spark, docs)
        return spark.createDataFrame(
            vocab, "piece STRING, count BIGINT, cost BIGINT"
        )

    return persisted_index(spark, sf_dir, "unigram_vocab", build)


def _prepare_unigram(spark: SparkSession, sf_dir: str) -> None:
    _unigram_vocab(spark, sf_dir)


def _unigram_train_oracle() -> str:
    from weather_analysis_bigdata__spark.operators.unigram_reference import (
        train_oracle_sql,
    )
    from weather_analysis_bigdata__spark.queries_llmops import _bpe_oracle_sf

    return train_oracle_sql(_bpe_oracle_sf())


def _unigram_apply_oracle() -> str:
    from weather_analysis_bigdata__spark.operators.unigram_reference import (
        apply_oracle_sql,
    )
    from weather_analysis_bigdata__spark.queries_llmops import _bpe_oracle_sf

    return apply_oracle_sql(_bpe_oracle_sf())


@register(
    "unigram_train_vocab",
    oracle=_unigram_train_oracle,
    prepare=_prepare_unigram,
    doc="Unigram-LM (SentencePiece-style) tokenizer TRAINING (Kudo "
    "2018) — the prune-down counterpart of bpe_train_merges' "
    "merge-up: seed the vocabulary with the corpus charset + top "
    "substrings by weighted occurrence, then alternate a Viterbi "
    "E-step (min-integer-cost segmentation of every DISTINCT word — "
    "substring explode joined to the broadcast vocab, then one "
    "row-local DP fold; one shuffle per iteration) with a driver-side "
    "M-step (exact usage counts -> shared micro-nat quantizer -> "
    "count-ranked prune; single chars never pruned). The corpus "
    "collapses to the distinct-word table first — the 100 TB trick "
    "shared with the BPE trainer. Returns the top multi-char pieces "
    "by (use_count DESC, piece ASC). The EM applies a data-dependent "
    "rewrite per step no single SQL statement expresses, so the "
    "oracle is a lazy literal-VALUES table from the INDEPENDENT "
    "pure-Python operators/unigram_reference.py (regenerated from the "
    "current corpus on first use; exact-equality test gate in "
    "tests/test_round7_ops.py). Trained vocab persists as an index "
    "(operators/index_store.py).",
)
def unigram_train_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = [
        (r["piece"], int(r["count"]), int(r["cost"]))
        for r in _unigram_vocab(spark, sf_dir).collect()
        if len(r["piece"]) > 1
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    out = [
        (i + 1, p, len(p), c, q)
        for i, (p, c, q) in enumerate(rows[:_UNI_TOP])
    ]
    return spark.createDataFrame(
        out,
        "piece_rank INT, piece STRING, piece_len INT, "
        "use_count BIGINT, cost_micronat BIGINT",
    ).orderBy("piece_rank")


@register(
    "unigram_apply_tokenize",
    oracle=_unigram_apply_oracle,
    prepare=_prepare_unigram,
    doc="Unigram-LM tokenizer APPLICATION — the inference side of "
    "unigram_train_vocab: Viterbi-tokenize every DISTINCT word once "
    "under the persisted vocabulary (the same integer DP as training, "
    "so train/apply can never disagree), then fan the per-word token "
    "counts back over the corpus with a word join and aggregate per "
    "source (chars before vs unigram tokens after, compression "
    "ratio). Tokenizing distinct words instead of occurrences is the "
    "production-scale move (Heaps' law: the DP runs orders of "
    "magnitude fewer times than a per-occurrence tokenizer). Oracle: "
    "lazy literal VALUES from the independent pure-Python reference "
    "(see unigram_train_vocab).",
)
def unigram_apply_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.bpe import _word_freqs
    from weather_analysis_bigdata__spark.operators.unigram import (
        tokenize_words,
    )

    docs = load_table(spark, sf_dir, "documents")
    vocab_df = _unigram_vocab(spark, sf_dir)
    words = _word_freqs(docs, "text")
    per_word = tokenize_words(words, vocab_df).select(
        "word",
        F.length("word").cast("long").alias("w_chars"),
        F.col("n_pieces").cast("long").alias("w_tokens"),
    )
    occurrences = docs.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda w: w != "",
            )
        ).alias("word"),
    )
    per_source = (
        occurrences.join(per_word, "word")
        .groupBy("source")
        .agg(
            F.sum("w_chars").alias("chars_total"),
            F.sum("w_tokens").alias("unigram_tokens"),
        )
    )
    n_docs = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return n_docs.join(per_source, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("chars_total", F.lit(0)).alias("chars_total"),
        F.coalesce("unigram_tokens", F.lit(0)).alias("unigram_tokens"),
        (
            F.col("unigram_tokens").cast("double")
            / F.nullif(F.col("chars_total"), F.lit(0)).cast("double")
        ).alias("compression"),
    )
