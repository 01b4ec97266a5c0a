"""Unigram-LM (SentencePiece-style) tokenizer training over a corpus.

The second tokenizer family of an LLM data pipeline (Kudo 2018,
"Subword Regularization"; the SentencePiece unigram trainer): model
each word as the min-cost segmentation into vocabulary pieces under a
unigram piece model, alternate Viterbi segmentation (E-step) with
count-based re-estimation and pruning (M-step) until the vocabulary
reaches its target size. Complements operators/bpe.py — BPE grows a
vocabulary bottom-up by merging; unigram-LM shrinks a large seed
vocabulary top-down by pruning, which is what SentencePiece ships by
default.

Spark-first design (mirrors operators/bpe.py where the problems
coincide):

- The corpus collapses to the DISTINCT-WORD frequency table first
  (``operators.bpe._word_freqs`` — identical normalization, one
  corpus-wide shuffle); training and tokenization both run over
  distinct words only and fan results back out with a join. At 100 TB
  the distinct-word table is orders of magnitude smaller than the
  corpus (Heaps' law), which is how production subword trainers scale.
- Candidate piece matches come from an EXPLODE of word substrings
  (lengths 1..``MAX_PIECE``) joined against the broadcast vocabulary
  table — a join, not a giant IN-list, so a production-sized
  vocabulary (1M pieces) would work unchanged; matches regroup per
  word (the one shuffle per E-step).
- The Viterbi DP itself is row-local: a single ``F.aggregate`` fold
  over character positions carrying (dp-costs, backpointers), followed
  by a second fold that walks the backpointers into the piece list.
  All comparisons are over exact integers (micro-nat piece costs), so
  the DP is bit-deterministic at any parallelism.
- The ONLY non-integer operation — quantizing a count ratio to an
  integer cost — runs once per piece in CPython on the driver
  (:func:`piece_cost`), the established shared-quantizer pattern
  (queries_eval._nb_lp_generic): the Spark path and the oracle
  generator call the SAME function on exact integer counts, so both
  sides see bit-identical parameters.

Determinism: counts are exact integers; seed selection, Viterbi
tie-breaks (min cost, then LONGEST piece), and pruning order
(count DESC, piece ASC) are all total orders. Correctness is gated by
tests/test_round7_ops.py::test_unigram_matches_reference, which
recomputes the trained vocabulary with the INDEPENDENT pure-Python
implementation in operators/unigram_reference.py (exact equality — the
EM iteration applies a data-dependent rewrite per step that one SQL
statement cannot express, the bpe.py rationale), and by the lazy
literal-VALUES oracles of the registered query pair.

Ref: the reference repo (Weather_API.py) has no tokenizer at all —
this is charter-extension breadth, paired with bpe_train_merges.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.operators.bpe import _word_freqs
from weather_analysis_bigdata__spark.session import pin

#: Maximum piece length in characters (SentencePiece's
#: max_sentencepiece_length is 16; 4 keeps the candidate lattice tight
#: for this short-word corpus while still exercising multi-step DP).
MAX_PIECE = 4
#: Seed vocabulary: the top SEED multi-char substrings by weighted
#: occurrence count (SentencePiece's seed_sentencepiece_size, scaled
#: down to this corpus).
SEED = 384
#: Multi-char pieces surviving each M-step prune (the target vocab is
#: VOCAB_TARGET multi-char pieces + the full corpus charset — single
#: chars are never pruned, exactly as SentencePiece keeps required
#: chars).
VOCAB_TARGET = 256
#: Multi-char pieces need at least this many Viterbi uses to survive.
MIN_COUNT = 2
#: EM iterations (E: Viterbi counts, M: re-estimate + prune).
EM_ITERS = 2
#: Cost quantization: micro-nats (the _NBC_SCALE convention).
SCALE = 1_000_000
#: Effectively-infinite integer cost for "no segmentation" (never
#: reachable: every corpus char is in the vocabulary).
_INF = 1 << 40


def piece_cost(count: int, total: int, vocab_size: int) -> int:
    """Integer micro-nat cost of a piece: -floor(SCALE * log p) with
    add-one smoothing, p = (count+1)/(total+vocab_size). The single
    non-integer op of the whole trainer; shared verbatim by the Spark
    M-step (driver-side) and the pure-Python oracle reference, so both
    paths quantize identically (the _nb_lp_generic precedent)."""
    lp = math.log(count + 1) - math.log(total + vocab_size)
    return -math.floor(SCALE * lp)


def _costed_vocab(counts: dict[str, int]) -> list[tuple[str, int, int]]:
    """counts -> [(piece, count, cost_int)] with the shared quantizer;
    total/vocab_size derive from the full kept vocabulary."""
    total = sum(counts.values())
    v = len(counts)
    return [(p, c, piece_cost(c, total, v)) for p, c in sorted(counts.items())]


def _prune(char_counts: dict[str, int], multi_counts: dict[str, int]) -> dict[str, int]:
    """M-step vocabulary selection: every single char survives; multi-
    char pieces need count >= MIN_COUNT and a top-VOCAB_TARGET slot
    under (count DESC, piece ASC)."""
    kept = sorted(
        ((p, c) for p, c in multi_counts.items() if c >= MIN_COUNT),
        key=lambda kv: (-kv[1], kv[0]),
    )[:VOCAB_TARGET]
    out = dict(char_counts)
    out.update(kept)
    return out


def _substr_counts(words: DataFrame) -> tuple[dict[str, int], dict[str, int]]:
    """Seed counts over the distinct-word table: weighted occurrence
    counts of every substring of length 1 (charset) and 2..MAX_PIECE
    (seed candidates). One explode + one aggregate; the collect is
    bounded to SEED + charset rows by the top-k pushdown."""
    subs = (
        words.select(
            "freq",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("start"),
            "word",
        )
        .select(
            "freq",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(MAX_PIECE),
                        F.length("word") - F.col("start") + 1,
                    ),
                )
            ).alias("len"),
            "start",
            "word",
        )
        .select(
            F.col("word").substr(F.col("start"), F.col("len")).alias("piece"),
            "freq",
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("n"))
    )
    chars = {
        r["piece"]: int(r["n"])
        for r in subs.filter(F.length("piece") == 1).collect()
    }
    top_multi = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.col("n").desc(), F.col("piece"))
        .limit(SEED)
        .collect()
    )
    return chars, {r["piece"]: int(r["n"]) for r in top_multi}


def _viterbi_pieces(words: DataFrame, vocab_df: DataFrame) -> DataFrame:
    """(word, freq) × broadcast (piece, cost) -> (word, freq, pieces):
    the min-integer-cost segmentation of each word.

    Candidate matches: substring explode joined to the broadcast vocab
    (start, len, cost per match), regrouped per word — the E-step's one
    shuffle. DP: ONE fold over positions 1..n carrying (dp costs, best
    segmentation per prefix); the per-position argmin is array_min over
    (cost, -len) structs, so ties prefer the LONGER piece. Carrying the
    segmentations forward (O(n²) strings per word, words are short)
    avoids a separate backpointer-walk fold, which CollapseProject
    would inline into an O(n)× re-evaluation of the forward DP (the
    PERF.md recompute trap).

    Deployment note: the per-word DP state is O(len²), so a web-scale
    corpus with pathological 'words' (long URLs, base64 blobs) should
    pre-split or cap word length before this kernel — the analogue of
    SentencePiece's max-sentence-length guard. The whitespace word
    model here bounds len at the corpus's longest token, which the
    distinct-word table makes cheap to audit first (one MAX(length))."""
    cand = (
        words.select(
            "word",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("start"),
        )
        .select(
            "word",
            "start",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(MAX_PIECE),
                        F.length("word") - F.col("start") + 1,
                    ),
                )
            ).alias("len"),
        )
        .select(
            "word",
            "start",
            "len",
            F.col("word").substr(F.col("start"), F.col("len")).alias("piece"),
        )
        .join(F.broadcast(vocab_df.select("piece", "cost")), "piece")
        .groupBy("word")
        .agg(
            F.collect_list(F.struct("start", "len", "cost")).alias("matches")
        )
    )
    wm = words.join(cand, "word")

    word, matches = F.col("word"), F.col("matches")
    n = F.length("word")

    dp_init = F.struct(
        F.array(F.lit(0).cast("long")).alias("dp"),
        F.array(F.array().cast("array<string>")).alias("segs"),
    )

    def dp_step(acc, i):
        # candidates ending at position i, as (total_cost, -len) structs
        cands = F.transform(
            F.filter(matches, lambda m: m.start + m.len - 1 == i),
            lambda m: F.struct(
                (F.element_at(acc.dp, m.start) + m.cost).alias("c"),
                (-m.len).alias("nl"),
            ),
        )
        best = F.coalesce(
            F.array_min(cands),
            F.struct(
                F.lit(_INF).cast("long").alias("c"), F.lit(0).alias("nl")
            ),
        )
        blen = -best.nl
        new_seg = F.when(
            blen > 0,
            F.concat(
                F.element_at(acc.segs, i - blen + 1),
                F.array(word.substr(i - blen + 1, blen)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.struct(
            F.concat(acc.dp, F.array(best.c)).alias("dp"),
            F.concat(acc.segs, F.array(new_seg)).alias("segs"),
        )

    pieces = F.element_at(
        F.aggregate(F.sequence(F.lit(1), n), dp_init, dp_step).segs, -1
    )

    return wm.select("word", "freq", pieces.alias("pieces"))


def train_unigram(
    spark: SparkSession, docs: DataFrame, text_col: str = "text"
) -> list[tuple[str, int, int]]:
    """Train the unigram-LM vocabulary; returns the final
    [(piece, count, cost_int)] sorted by piece (chars + multi-char).

    Seed: charset + top-SEED substrings by weighted occurrence count.
    Then EM_ITERS × (Viterbi E-step over distinct words → driver-side
    quantize/prune M-step). Per iteration only the bounded piece-count
    table is collected (≤ charset + SEED rows)."""
    words = _word_freqs(docs, text_col).transform(pin)

    char_seed, multi_seed = _substr_counts(words)
    vocab = _costed_vocab(_prune(char_seed, multi_seed))

    for _ in range(EM_ITERS):
        vocab_df = spark.createDataFrame(
            vocab, "piece STRING, count BIGINT, cost BIGINT"
        )
        used = (
            _viterbi_pieces(words, vocab_df)
            .select(F.explode("pieces").alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").alias("n"))
            .collect()
        )
        counts = {r["piece"]: int(r["n"]) for r in used}
        # chars keep their Viterbi-use counts (0 if now unused — they
        # stay in-vocab with the smoothed floor cost)
        chars = {p: counts.get(p, 0) for p in char_seed}
        multi = {p: c for p, c in counts.items() if len(p) > 1}
        vocab = _costed_vocab(_prune(chars, multi))
    return vocab


def tokenize_words(words: DataFrame, vocab_df: DataFrame) -> DataFrame:
    """(word, freq) -> (word, freq, n_pieces): Viterbi token count per
    distinct word under the trained vocabulary (the apply side)."""
    return _viterbi_pieces(words, vocab_df).select(
        "word", "freq", F.size("pieces").alias("n_pieces")
    )
