"""Physical-plan audit: sweep every registered query, count the plan
nodes that matter at 100 TB, and flag scale red flags.

Usage: python tools/plan_audit.py [--sf DIR]

Red flags (printed with !!):
- CartesianProduct      unbounded N×M blowup
- SortMergeJoin         a join that failed to broadcast (fine for
                        fact⋈fact, a bug for dim joins)
- SortAggregate         agg fell off the hash path (non-mutable buffer
                        type — e.g. string min/max; see PERF.md)
- exchanges > 4         likely a redundant shuffle to merge
- WINDOW_GLOBAL         a WindowExec with an empty partition spec —
                        Spark moves EVERY input row to one partition
                        ("No Partition Defined" warning). Fine over a
                        provably bounded reduction (O(days), O(k));
                        fatal over a fact table. The round-2 scale-flag
                        class, now machine-caught.
- GENERATE_PROJ         a Project directly above a Generate that
                        evaluates heavy expressions (tokenizers, array
                        HOFs) over non-generated columns — Catalyst's
                        ExtractGenerator re-evaluates them once per
                        EXPLODED row. The round-5 quality_ensemble_vote
                        defect class (12× constant on a linear plan),
                        now machine-caught; positive control in
                        tests/test_plan_flags.py.

Queries that execute side effects at build time (streaming replays,
file-format round-trips, MERGE materialization) are skipped — their
plans are pinned by dedicated tests instead.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SKIP_PREFIXES = (
    "streaming_",
    "csv_",
    "json_roundtrip",
    "merge_",
    # executes a bounded streaming query; the batch plan over its memory
    # sink is not the interesting artifact
    "python_datasource_stream",
)

#: Reviewed flags: plans whose red-flag pattern is the *correct* design,
#: with the reason. Printed as `ok(reviewed)` instead of `!!` so a new
#: regression stands out from an accepted trade-off. Each entry lists
#: the REVIEWED flag KINDS in REVIEWED_FLAGS; any flag of a kind outside
#: that set still prints !! (an accepted SORTAGG must not silence a
#: future XCHG regression on the same query).
KNOWN_EXCEPTIONS = {
    "full_outer_join": "fact⋈fact full outer — SMJ is the right strategy "
    "(no side is broadcastable and hash full-outer spills worse)",
    "funnel_steps": "3 sequential event-order stages + 2 bounded "
    "BNLJ steps over per-user minima — exchanges carry per-user rows "
    "(≪ events), each required by a different key",
    "dedup_ngram_jaccard": "shingle→posting→pair pipeline: exchanges are "
    "over postings/pairs that shrink stage-over-stage; single-key "
    "alternatives would recompute the shingle subtree",
    "dedup_jaccard_dfcapped": "adds the DF-cap semi-join ahead of the "
    "jaccard pipeline — two extra small exchanges over the capped "
    "posting list buy the quadratic-hot-key bound",
    "dedup_containment": "same posting pipeline with asymmetric "
    "normalization; exchanges over shrinking candidate pairs",
    "collation_ci_group": "grouping on a UTF8_LCASE-collated key — "
    "Spark 4.1 plans SortAggregate for non-binary-equality collations "
    "(no hash support for collation keys yet); the row count per group "
    "is small and the op exists to exercise collation semantics",
    "bitmap_exact_distinct_merge": "bitmap_construct/or_agg buffers are "
    "BinaryType — not UnsafeRow-mutable, so Spark plans SortAggregate "
    "by construction for these functions; state is one small bitmap "
    "per (group, bucket) and the merge levels sort tiny intermediates",
    "table_snapshot_diff": "fact⋈fact FULL OUTER on the primary key — "
    "SMJ is the correct strategy (neither side broadcastable; rows "
    "are pre-projected to key+hash, so the sorted shuffle is ~40 B/row)",
    "triangle_count": "wedge-close self-joins are fact⋈fact by nature "
    "(no side broadcastable at scale) — hash-join hinted, exchanges "
    "carry distinct edge pairs plus three 1-row stat collects",
    "ann_ladder_candidate_audit": "four independent rung estimates in "
    "one plan (bucket counts ×2, probe join, and — round 3 — a SCAN of "
    "the persisted IVF assignment instead of an inlined centroid "
    "subtree; 11→8 exchanges) — each exchange carries bucket/cluster "
    "COUNT rows or id/bucket pairs; the audit exists to price the "
    "rungs, it never builds them",
    "theil_sen_trend": "raw lineitem reduces to the ~84-row monthly "
    "table in the FIRST exchange; every later exchange and all four "
    "BNLJ steps carry that 84-row table, its 84×84/2 slope pairs, or "
    "1-row scalar stats — the quadratic term never touches raw data",
    "seasonal_profile_monthly": "the O(months) monthly aggregate "
    "feeds grand-mean, seasonal-mean, and the output join — the "
    "replans all operate on the ≤84-row reduction; the raw scan is "
    "exchanged once per consumer but reduces immediately",
    "bloom_filter_membership": "exchanges carry DISTINCT custkeys "
    "(O(keys)) and md5 position sets (O(build·k) ≈ 900 rows), all "
    "joined via broadcast; the only fact-scale work is the two "
    "distinct-key reductions",
    "bag_semantics_battery": "four independent scalar counts (|A|, "
    "|B|, |EXCEPT ALL|, |INTERSECT ALL|) each reduce to a 1-row "
    "exchange; the set-op aggregates themselves are single-shuffle "
    "per-key counts — every exchange carries scalars or key counts",
    "hybrid_search_rrf": "the RRF fuse is a full-outer join of two "
    "O(k)=10-row rank lists (full outer cannot broadcast) — the SMJ "
    "sorts 20 rows; both rank subplans are the already-audited BM25 "
    "and exact-cosine top-k shapes",
    "lsh_recall_audit": "composes the ALREADY-REVIEWED jaccard and "
    "minhash pipelines verbatim (the audit must run exactly what it "
    "measures) plus a full-outer join of the two O(pairs) sets — the "
    "SMJ and extra exchanges operate on ~10² pair rows, never "
    "documents",
    "ivf_lloyd_convergence": "THREE full Lloyd iterations in one plan — "
    "each iteration inherently re-exchanges: a per-(label,pos) centroid "
    "aggregate, a per-vec argmin assignment, and the iteration metrics; "
    "the SMJs are assignment⋈assignment joins between successive "
    "iterations keyed on vec_id (fact⋈fact — neither side is "
    "broadcastable at scale, SMJ is the right strategy). 20 exchanges "
    "/ 3 iterations ≈ the per-iteration cost of ivf_centroid_refresh, "
    "which is the point being measured",
    "multimodal_video_near_dup": "frame-hash posting pipeline (videos → "
    "frame hashes → df-capped buckets → shared-frame pairs → groups): "
    "the same shrinking postings→pairs shape as dedup_ngram_jaccard; "
    "every exchange after the first carries posting/pair rows bounded "
    "by buckets·cap², never raw frames",
    "dedup_simhash_hamming": "banded-Hamming pipeline over DISTINCT "
    "fingerprint representatives: exchanges carry distinct simhashes, "
    "3 band buckets of them, verified pairs, then group ids — each "
    "stage ≪ documents; the doc→fingerprint reduction is the only "
    "fact-scale exchange",
    "corpus_ingest_router_multimodal": "FOUR modality gates in one "
    "plan, each joining the arriving batch against its persisted "
    "corpus index via broadcast (bhj=9, no SMJ) — the exchanges carry "
    "batch-size rows once per gate plus the final precedence "
    "aggregate; gates are independent by design so their subplans "
    "don't share exchanges",
    "ann_batch_ivfpq_residual_topk": "residual IVFADC serve: exchanges "
    "carry probe ranks (batch×nprobe), per-list LUT aggregates "
    "(batch×nprobe×80), corpus code argmins (index-scale), and the "
    "final per-query ADC sums — the one fact-scale exchange "
    "(candidates → codes) is the same audited shape as "
    "ann_batch_ivfpq_adc_topk; the residual LUT's extra list key adds "
    "broadcast joins, not exchanges",
    "ann_pq_variant_recall_audit": "composes THREE already-audited "
    "serve pipelines verbatim (raw ADC, refine, residual ADC) plus "
    "the exact candidate ranking they are scored against — the audit "
    "must run exactly what it measures; every exchange beyond those "
    "subplans carries batch×k rank rows or 1-row hit counts, "
    "intersected via broadcast (smj=0)",
    "benchmark_decontaminate": "the reviewed shingle pipeline shape "
    "(dedup_ngram_jaccard family): one fact-scale exchange builds the "
    "distinct train shingle table — inherent to shingling — and every "
    "other exchange carries benchmark-side shingles (small and fixed "
    "by nature, then BROADCAST into the hit join, bhj=3), gram df "
    "counts, or the ~flagged-doc aggregate; the train fact table is "
    "never shuffled by the contamination join itself",
    "training_mix_schedule": "two_pass_ordinals' documented TeraSort "
    "recipe (same reviewed shape as equi_depth_bins_twopass / "
    "decile_stats_twopass): boundary-sketch aggregate, O(parts) "
    "bucket counts, broadcast offsets (the 2 BNLJ steps are the 1-row "
    "offset attach), one range exchange and one bucket-partitioned "
    "window — plus the per-source ordinal's hash exchange on source; "
    "every exchange carries either the fact rows ONCE (the sort this "
    "op exists to produce) or O(parts) count rows",
    "perplexity_tertile_split": "the two_pass_ordinals TeraSort recipe "
    "again (same reviewed shape as equi_depth_bins_twopass / "
    "training_mix_schedule): the scored-doc exchange ONCE plus "
    "boundary-sketch, O(parts) counts, broadcast offsets (the BNLJ "
    "steps), and the bucket-partitioned rank window; the LM join is a "
    "256-row broadcast",
    "rag_context_assembly": "all fact-scale work is the ONE cached "
    "execution of the already-reviewed hybrid_search_rrf subplan (its "
    "reviewed k-row full-outer SMJ included); the k+2-row candidate "
    "set is .persist()ed and every post-top-k stage (near-dup theta "
    "join, survivor prefix sum, final stitch) is a broadcast join "
    "over ≤12 rows. The audit's counts are inflated ~5× because "
    "toString() reprints the whole InMemoryRelation child under "
    "every InMemoryTableScan reference — one retrieval execution, "
    "printed five times",
    "epoch_shuffle_order": "the two_pass_ordinals TeraSort recipe once "
    "more (same reviewed shape as equi_depth_bins_twopass / "
    "training_mix_schedule): the 3-epoch×doc key exchange ONCE (24 "
    "bytes/row), boundary-sketch aggregate, O(parts) bucket counts, "
    "broadcast offsets (the 2 BNLJ steps are the 1-row bounds/offset "
    "attach), the bucket-partitioned rank window, and the final "
    "O(epochs)-row audit aggregate",
    "pack_concat_chunk_boundaries": "the two_pass_prefix_sum TeraSort "
    "recipe (same reviewed shape as shard_manifest_fixed_tokens): one "
    "doc-key exchange, boundary sketch, O(parts) weight sums, "
    "broadcast offsets (BNLJ), bucket-partitioned running window, "
    "then the bounded doc→sequence fan-out and the per-sequence "
    "fragment aggregate",
    "dedup_cc_overmerge_audit": "audit-tier composition (the "
    "dedup_ladder_audit class): components build eagerly (pinned), "
    "then the rep-similarity rescore runs entirely over pinned "
    "clustered-doc-sized tables — the exchanges are shuffle_hash "
    "pairs and group-key aggregates over the CLUSTERED subset, never "
    "the corpus; the one corpus-scale pass (tokenize + semi-filter "
    "to members) happens exactly once behind the shc pin",
    "curriculum_anneal_schedule": "two_pass_ordinals (same reviewed "
    "shape as perplexity_tertile_split, whose deployment this "
    "composes with the epoch axis): one doc exchange, boundary "
    "sketch, O(parts) counts, broadcast offsets (BNLJ), bucket rank "
    "window, then the O(epochs×tertiles) schedule aggregate",
    "loader_resume_window": "the two-pass recipe with ORDINAL "
    "PUSHDOWN — the extra exchange/BNLJ is the bucket-count/offset "
    "pass whose broadcast then PRUNES every bucket outside the resume "
    "window before the rank window; all post-prune work is O(1 "
    "bucket), which is the query's entire point",
    "shard_manifest_fixed_tokens": "the two_pass_prefix_sum TeraSort "
    "recipe (weighted two_pass_ordinals — same reviewed shape as "
    "epoch_shuffle_order / training_mix_schedule): one doc-key "
    "exchange, boundary-sketch aggregate, O(parts) weight sums, "
    "broadcast offsets (the 2 BNLJ bounds/offset attaches), the "
    "bucket-partitioned running-sum window, and the final "
    "O(shards)-row manifest aggregate",
    "training_corpus_manifest": "composition of four audited kernels "
    "(decontaminate → fingerprint-dedup → DSIR gate → stride "
    "schedule) with the survivor set PERSISTED before the two-pass "
    "sort; the textual count triple-prints the cached subtree — the "
    "plan holds 4 InMemoryTableScan references to ONE cached "
    "pipeline, so executed exchanges are the ~15 of the component "
    "kernels run once, not 61 (this audit counts plan TEXT, and "
    "InMemoryRelation bodies repeat per reference)",
    # ---- WINDOW_GLOBAL reviews: every unpartitioned window below runs
    # over a PROVABLY BOUNDED reduction (O(days), O(cells), O(k)...),
    # never a fact table; fact-scale ntile yardsticks carry a
    # hash-proven distributed twin instead.
    "nulls_ordering": "windows over ≤200 rows by construction "
    "(o_orderkey ≤ 200 filter precedes them) — the query exists to pin "
    "NULLS FIRST/LAST portability semantics, not to scale",
    "crosstab_share": "share-of-total windows over the O(sources × "
    "langs) contingency reduction, not documents",
    "token_budget_pareto": "Pareto rank / running-share windows over "
    "the O(sources) post-aggregate dimension (the crosstab_share "
    "class); the fact-side work is one map-side-combined count/sum",
    "key_skew_profile": "global rank over the O(distinct keys) count "
    "table — the docstring's point: the window sorts keys, not rows; "
    "the only fact-scale op is the map-combinable first count",
    "events_disorder_profile": "cumulative-coverage / lag windows over "
    "the <= 14-row lateness-digit bucket table (the crosstab_share "
    "class); the fact-scale work is one user-keyed runmax window + "
    "one map-combinable bucket aggregate",
    "chisq_independence": "margin windows over the O(event_types × 5) "
    "contingency cells",
    "pareto_frontier_2d": "running-max sweep over the DISTINCT-price "
    "reduction; docstring documents the local-frontier pre-filter that "
    "bounds the final sweep at 100 TB (per-partition frontiers are "
    "supersets of the global frontier)",
    "cusum_changepoint": "cumulative stats over the O(days) daily "
    "reduction",
    "ewma_dyadic_smoothing": "lag chain over the O(days) daily "
    "reduction",
    "ks_two_sample_doclen": "ECDF cumsum over the O(distinct "
    "document lengths) count reduction",
    "equi_depth_bins": "exact global-ntile YARDSTICK over the fact — "
    "kept deliberately; equi_depth_bins_twopass is the scale-safe "
    "twin, oracle-gated to the identical result (same SQL, same hash)",
    "calibration_by_decile": "exact global-ntile yardstick; "
    "calibration_by_decile_twopass is the hash-proven scale twin",
    "decile_stats": "exact global-ntile yardstick; "
    "decile_stats_twopass is the hash-proven scale twin",
    # ---- two-pass twins: exchange counts are the price of the
    # distributed form; all but one exchange carry O(parts) rows.
    "pack_sequences_fixed_budget": "two-pass prefix sum: ONE exchange "
    "carries the token-count table (bucket clustering for the local "
    "cumsum window); the rest carry O(parts) bucket sums, 1-row "
    "min/max bounds, or the O(shards) output aggregate",
    "equi_depth_bins_twopass": "two-pass ordinal recipe: one "
    "fact-scale exchange (bucket clustering), the rest O(parts) "
    "counts/offsets, 1-row bounds/N scalars, and the O(k) bin "
    "aggregate",
    "calibration_by_decile_twopass": "same two-pass recipe over "
    "events: one fact-scale exchange, rest O(parts)/scalar",
    "dedup_minhash_bucket_capped": "adds the bucket-size semi-join "
    "ahead of the pair join (same shape as dedup_jaccard_dfcapped's "
    "DF cap): the extra exchanges carry (band, count) rows and the "
    "capped band table — k×8 B/doc signatures, never text — and they "
    "buy the cap²/2 per-bucket pair bound that survives viral "
    "duplicates",
    "dedup_minhash_incremental": "the LIVE batch band subtree is "
    "planned twice (vs-corpus join and vs-self join) — every exchange "
    "carries batch-sized signature/band rows (k×8 B/doc) or the final "
    "candidate aggregate; the corpus side is a persisted-index SCAN, "
    "so corpus text is never re-read or shuffled",
    "corpus_temperature_mixture": "per-source counts feed weights, "
    "the sorted-fold normalizer, and the total — every exchange but "
    "the final per-source output aggregate carries O(sources) count "
    "rows or a 1-row scalar; the fact-scale gate scan joins the "
    "broadcast rate table statelessly (one pass, no doc shuffle)",
    "decile_stats_twopass": "same two-pass recipe over orders: one "
    "fact-scale exchange, rest O(parts)/scalar",
    "corpus_drift_tv": "both sides reduce to ≤256-row bucket tables "
    "at their FIRST map-side-combined aggregate; the SMJ is the "
    "bucket-table FULL OUTER (the full_outer_join class — cannot "
    "broadcast), sorting ≤256 rows; remaining exchanges are the two "
    "fact-scale token-count reductions, 1-row totals, and the final "
    "4-column summary aggregate",
    "corpus_datasheet": "composition capstone (the "
    "training_corpus_manifest class): the 5-way ensemble subtree "
    "(ensemble 2-scan stitch + classifier scorer, both audited) feeds "
    "one documents-projection join, an O(sources) aggregate, and a "
    "1-row total broadcast (the BNLJ) — every exchange is one of the "
    "component kernels' linear doc-grained shuffles or carries "
    "O(sources) rows; nothing here is quadratic or re-executed",
    "quality_classifier_confusion": "the audit composes BOTH sides by "
    "definition (the lsh_recall_audit pattern): the serving scorer "
    "(one feature aggregate + model broadcast) AND the live ensemble "
    "label kernel (its own audited 2-scan shape) — each exchange "
    "belongs to one of the two already-reviewed subplans or to the "
    "final ≤4-row confusion aggregate; the production path is "
    "quality_classifier_nb (xchg=2), which exists precisely so this "
    "composition never runs at serving time",
    "dedup_paragraph_near": "the dedup_minhash_incremental shape one "
    "granularity down: all five exchanges carry batch-sized "
    "pid/band/decision rows (16 B keys + k×8 B signatures, never "
    "paragraph text) — distinct pids, the signature aggregate, the "
    "banded candidate pair aggregate, the per-pid best-match "
    "aggregate, and the occurrence stitch (shuffle-hash hinted); the "
    "SortAggregates are the deterministic argmin over a (vote, "
    "32-char pid) struct — non-mutable buffer type plans SortAgg by "
    "construction (the bitmap_exact_distinct_merge class), state one "
    "pair per batch paragraph",
    "dedup_span_removal_report": "linear chain of strictly-shrinking "
    "per-doc reductions over the audited dedup_span_maximal_pairs "
    "subtree (xchg=3): span-interval distinct, the per-doc interval-"
    "union window (partitioned by doc_id, O(spans-per-doc) rows), and "
    "the doc-spine stitch (shuffle-hash hinted) — every exchange past "
    "the dotplot carries O(spans), not O(tokens), rows",
    "unigram_apply_tokenize": "the distinct-word fan-out shape: the "
    "word-frequency reduction, the candidate-match regroup (the "
    "trainer's audited E-step shuffle), the occurrence-to-word stitch "
    "(shuffle-hash hinted, carries one long per occurrence), and the "
    "O(sources) aggregate + stitch — one linear pass over the corpus, "
    "everything else keyed on the Heaps-law distinct-word table",
    "corpus_drift_gated_admission": "the corpus_drift_tv composition "
    "run once per admission slice (3 deterministic slices): each "
    "slice contributes one map-side-combined reduction to a ≤256-row "
    "bucket table, the ≤256-row FULL OUTER share join (the "
    "full_outer_join class — cannot broadcast; that is the SMJ, "
    "sorting ≤256 rows), a 1-row TV broadcast, and the audited "
    "paragraph-decision kernel's pid join + doc aggregate — every "
    "exchange is slice-linear or bucket-bounded, nothing re-executes "
    "across slices",
    "dedup_ladder_audit": "composition capstone (the corpus_datasheet "
    "class): the exact-fingerprint groupBy+stitch (2), the audited "
    "paragraph_dedup subtree (2), the audited span dotplot subtree "
    "(xchg=3 + interval distinct + per-doc window), and three "
    "doc-keyed shuffle-hash stitches carrying one row per doc — "
    "every exchange belongs to one of the three already-audited "
    "kernels or to a doc-grained stitch; nothing re-executes",
    "tokenizer_fertility_compare": "composes BOTH tokenizer families "
    "by definition (the quality_classifier_confusion pattern): the "
    "BPE fold's O(sources) aggregate plus the unigram side's audited "
    "distinct-word chain (word-frequency reduction, E-step match "
    "regroup, shuffle-hash occurrence stitch) and two O(sources) "
    "stitches — each exchange belongs to one of the two audited "
    "tokenizer subplans",
    "dedup_span_cap_audit": "audit runs the span kernel at BOTH caps "
    "by definition (the lsh_recall_audit pattern): two audited "
    "dotplot+interval-union subtrees (~6 exchanges each, the "
    "dedup_span_removal_report shape) over the planted-union corpus, "
    "plus the overcap-residual count and two O(groups) stitches — "
    "every exchange belongs to one of the two cap levels' audited "
    "chains; nothing re-executes within a level",
    "decontaminate_semantic": "two-rung composition by definition "
    "(the dedup_ladder_audit pattern): the audited n-gram gate "
    "subtree (eval-gram broadcast semi-join + per-doc regroup), the "
    "IVF probe side (persisted index scans; candidates bounded by "
    "probed lists; the tiny eval/probe tables broadcast), the "
    "cand-keyed cosine regroup, and doc-grained report stitches — "
    "every exchange belongs to one audited rung or carries one row "
    "per train doc; the train corpus itself never shuffles",
    "multimodal_interleave_assembly": "three-modality composition by "
    "definition (the corpus_ingest_router_multimodal class): the "
    "paragraph-count regroup, one fingerprint-keyed keep window per "
    "media rung, two doc-grained placement stitches, and ONE final "
    "doc-partitioned window that carries sequencing AND record "
    "accounting on a single sort — each exchange belongs to one "
    "modality's audited kernel or carries (doc, segment) rows; the "
    "segment subtree executes once",
    "pack_interleaved_records": "the pack_sequences_fixed_budget "
    "prefix-sum machinery (6 reviewed exchanges incl. the two bounded "
    "BNLJ bucket-offset steps) composed with the two media keep "
    "rungs: one fingerprint-keyed window shuffle per modality plus "
    "doc-grained left stitches onto the record spine — each exchange "
    "belongs to the audited packing subtree or to one modality's "
    "audited keep kernel; nothing re-executes",
    "dedup_ladder_summary": "dedup_ladder_audit's 12 reviewed "
    "exchanges (the exact-fingerprint groupBy+stitch, the audited "
    "paragraph and span subtrees, three doc-grained stitches — see "
    "that entry) plus ONE final O(rungs)-row rollup aggregate. The "
    "chain is linear: each kernel runs once and the rollup adds one "
    "partial+final agg over the one-row-per-doc audit output; the "
    "sibling audit query is the reviewed baseline and this is "
    "baseline+1 by construction",
}

#: Flag KINDS covered by each review above (kind = flag text before any
#: `=`). A flag whose kind is absent here still prints !!.
REVIEWED_FLAGS = {
    "full_outer_join": {"SORTMERGE"},
    "funnel_steps": {"XCHG"},
    "dedup_ngram_jaccard": {"XCHG"},
    "dedup_jaccard_dfcapped": {"XCHG"},
    "dedup_containment": {"XCHG"},
    "collation_ci_group": {"SORTAGG"},
    "bitmap_exact_distinct_merge": {"SORTAGG"},
    "table_snapshot_diff": {"SORTMERGE"},
    "triangle_count": {"XCHG"},
    "ann_ladder_candidate_audit": {"XCHG"},
    "theil_sen_trend": {"XCHG", "WINDOW_GLOBAL"},
    "seasonal_profile_monthly": {"XCHG"},
    "bloom_filter_membership": {"XCHG"},
    "bag_semantics_battery": {"XCHG"},
    "hybrid_search_rrf": {"SORTMERGE"},
    "lsh_recall_audit": {"XCHG", "SORTMERGE"},
    "nulls_ordering": {"WINDOW_GLOBAL"},
    "crosstab_share": {"WINDOW_GLOBAL"},
    "token_budget_pareto": {"WINDOW_GLOBAL"},
    "events_disorder_profile": {"WINDOW_GLOBAL"},
    "epoch_shuffle_order": {"XCHG"},
    "shard_manifest_fixed_tokens": {"XCHG"},
    "curriculum_anneal_schedule": {"XCHG"},
    "loader_resume_window": {"XCHG"},
    "pack_concat_chunk_boundaries": {"XCHG"},
    "dedup_cc_overmerge_audit": {"XCHG"},
    "key_skew_profile": {"WINDOW_GLOBAL"},
    "chisq_independence": {"WINDOW_GLOBAL"},
    "pareto_frontier_2d": {"WINDOW_GLOBAL"},
    "cusum_changepoint": {"WINDOW_GLOBAL"},
    "ewma_dyadic_smoothing": {"WINDOW_GLOBAL"},
    "ks_two_sample_doclen": {"WINDOW_GLOBAL"},
    "equi_depth_bins": {"WINDOW_GLOBAL"},
    "calibration_by_decile": {"WINDOW_GLOBAL"},
    "decile_stats": {"WINDOW_GLOBAL"},
    "pack_sequences_fixed_budget": {"XCHG"},
    "equi_depth_bins_twopass": {"XCHG"},
    "calibration_by_decile_twopass": {"XCHG"},
    "dedup_minhash_bucket_capped": {"XCHG"},
    "dedup_minhash_incremental": {"XCHG"},
    "corpus_temperature_mixture": {"XCHG"},
    "decile_stats_twopass": {"XCHG"},
    "ivf_lloyd_convergence": {"XCHG", "SORTMERGE"},
    "multimodal_video_near_dup": {"XCHG"},
    "dedup_simhash_hamming": {"XCHG"},
    "corpus_ingest_router_multimodal": {"XCHG"},
    "ann_batch_ivfpq_residual_topk": {"XCHG"},
    "ann_pq_variant_recall_audit": {"XCHG"},
    "benchmark_decontaminate": {"XCHG"},
    "training_mix_schedule": {"XCHG"},
    "training_corpus_manifest": {"XCHG"},
    "perplexity_tertile_split": {"XCHG"},
    "rag_context_assembly": {"XCHG", "SORTMERGE"},
    "dedup_paragraph_near": {"XCHG", "SORTAGG"},
    "quality_classifier_confusion": {"XCHG"},
    "corpus_datasheet": {"XCHG"},
    "corpus_drift_tv": {"XCHG", "SORTMERGE"},
    "dedup_span_removal_report": {"XCHG"},
    "unigram_apply_tokenize": {"XCHG"},
    "corpus_drift_gated_admission": {"XCHG", "SORTMERGE"},
    "tokenizer_fertility_compare": {"XCHG"},
    "dedup_ladder_audit": {"XCHG"},
    "dedup_ladder_summary": {"XCHG"},
    "dedup_span_cap_audit": {"XCHG"},
    "decontaminate_semantic": {"XCHG"},
    "multimodal_interleave_assembly": {"XCHG"},
    "pack_interleaved_records": {"XCHG"},
}


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    if "--sf" in args:
        sf_dir = args[args.index("--sf") + 1]
    only: set[str] | None = None
    if "--only" in args:
        only = set(args[args.index("--only") + 1].split(","))

    from weather_analysis_bigdata__spark.plans.inspect import (
        n_generate_hot_projects,
        n_global_windows as count_global_windows,
    )
    from weather_analysis_bigdata__spark.registry import all_queries
    from weather_analysis_bigdata__spark.session import get_spark

    spark = get_spark("plan_audit")
    flagged = 0
    rows = []
    for name, q in all_queries().items():
        if name.startswith(SKIP_PREFIXES):
            continue
        if only is not None and name not in only:
            continue
        try:
            plan = (
                q.fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # noqa: BLE001
            rows.append((name, f"BUILD ERROR: {e}"))
            flagged += 1
            continue
        n = lambda op: plan.count(op)  # noqa: E731
        stats = {
            "xchg": n("Exchange hashpartitioning")
            + n("Exchange rangepartitioning")
            + n("Exchange SinglePartition"),
            "bhj": n("BroadcastHashJoin"),
            "smj": n("SortMergeJoin"),
            "bnlj": n("BroadcastNestedLoopJoin"),
            "cart": n("CartesianProduct"),
            "sortagg": n("SortAggregate"),
            "gwin": count_global_windows(plan),
            "genproj": n_generate_hot_projects(plan),
        }
        flags = []
        if stats["gwin"]:
            flags.append(f"WINDOW_GLOBAL={stats['gwin']}")
        if stats["genproj"]:
            flags.append(f"GENERATE_PROJ={stats['genproj']}")
        if stats["cart"]:
            flags.append("CARTESIAN")
        if stats["smj"]:
            flags.append("SORTMERGE")
        if stats["sortagg"]:
            flags.append("SORTAGG")
        if stats["xchg"] > 4:
            flags.append(f"XCHG={stats['xchg']}")
        reviewed_kinds = REVIEWED_FLAGS.get(name, set()) if name in KNOWN_EXCEPTIONS else set()
        reviewed = [f for f in flags if f.split("=")[0] in reviewed_kinds]
        unreviewed = [f for f in flags if f.split("=")[0] not in reviewed_kinds]
        mark = ""
        if reviewed:
            mark += f" ok(reviewed: {','.join(reviewed)})"
        if unreviewed:
            mark += " !! " + ",".join(unreviewed)
            flagged += 1
        rows.append(
            (
                name,
                f"xchg={stats['xchg']} bhj={stats['bhj']} "
                f"smj={stats['smj']} bnlj={stats['bnlj']} "
                f"sortagg={stats['sortagg']} gwin={stats['gwin']} "
                f"genproj={stats['genproj']}{mark}",
            )
        )
    width = max(len(r[0]) for r in rows)
    for name, line in rows:
        print(f"{name:<{width}}  {line}")
    print(f"\n{len(rows)} plans audited, {flagged} flagged")


if __name__ == "__main__":
    main()
