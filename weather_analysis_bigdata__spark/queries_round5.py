"""Round-5 operator batch: perceptual NEAR-duplicate matching across
the image and audio modalities, IVF centroid refresh (index
maintenance closes the upsert → drift → retrain loop), and the capped
hyperplane-LSH rung.

The round-4 verdict's frontier list, worked top-down:

1. ``multimodal_image_near_dup``: the round-4 phash kernel grouped
   images by EXACT ``(phash, w, h)`` equality; true perceptual dedup
   matches at Hamming radius. Distinct hashes are banded (pigeonhole /
   multi-index hashing: B=4 bands of 12 bits finds every pair within
   Hamming ≤ 3 — a theorem, not a probability) and verified with one
   XOR+popcount, reusing the packed-bit machinery of
   ``sim_search_binary_hamming`` (queries_round3.py).
2. ``multimodal_audio_*``: the WAV modality gains its near-dup kernel
   — an energy-delta fingerprint over the REAL PCM16 decode
   (operators/multimodal.py:wav_fingerprint), exact groups plus the
   same banded Hamming radius on top. All three modalities (text,
   image, audio) now close the dedup loop.
3. ``ivf_centroid_refresh``: one deterministic Lloyd iteration over
   the PERSISTED assignments — recompute centroids as exact floor-
   means of their assigned vectors, re-assign, and report per-list
   movement / churn; the retrain step production IVF pairs with
   ``ivf_index_upsert``'s stale-centroid serving.
4. ``sim_search_lsh_capped``: the hyperplane-LSH family gets the same
   bucket-skew guard MinHash got in round 3 — candidates per bucket
   capped at a deterministic first-c-by-vec_id, bounding the per-
   bucket pair term at |bucket|·c instead of |bucket|².

Reference parity note: the reference notebook (Weather_API.py) has
none of this — the batch extends the charter LLM-data-pipeline surface
(SURVEY.md §7.2 M4/M5) along the round-4 verdict's "What's missing"
list.

Determinism follows the repo rules: integer-exact hashes and energies
(int64 sums of squares), exact scaled-integer vector arithmetic, fully
tie-broken ranks, identical column aliases on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.registry import register
from weather_analysis_bigdata__spark.session import pin
from weather_analysis_bigdata__spark.sources.files import load_table

# ---------------------------------------------------------------------------
# Shared oracle CTEs: closed-form phash / audio fingerprint recomputation
# (byte i of a synthetic PPM = (id+i) mod 256; WAV sample k =
# (id·7 + k·13) mod 2001 − 1000 — see operators/multimodal.py synth_*)
# ---------------------------------------------------------------------------
def _sql_img_perdoc(src: str = "documents", prefix: str = "") -> str:
    """CTE chain recomputing the PPM perceptual hash in closed form for
    every doc_id in ``src``; final CTE ``{prefix}perdoc`` has
    (doc_id, w, h, phash). ``prefix`` namespaces the inner CTEs so two
    instantiations (corpus + arriving batch) coexist in one query."""
    p = prefix
    return f"""{p}img AS (
      SELECT doc_id,
             CAST(4 + doc_id % 5 AS BIGINT) AS w,
             CAST(3 + doc_id % 4 AS BIGINT) AS h
      FROM {src}
    ),
    {p}pix AS (
      SELECT doc_id, w, h, t.p AS p,
             ((doc_id + 3 * t.p) % 256)
             + ((doc_id + 3 * t.p + 1) % 256)
             + ((doc_id + 3 * t.p + 2) % 256) AS gray
      FROM {p}img, unnest(generate_series(0, w * h - 1)) AS t(p)
    ),
    {p}tot AS (
      SELECT doc_id, w, h, SUM(gray) AS total, COUNT(*) AS npix
      FROM {p}pix GROUP BY doc_id, w, h
    ),
    {p}perdoc AS (
      SELECT p.doc_id, p.w, p.h,
             CAST(SUM(CASE WHEN p.gray * t.npix > t.total
                           THEN (CAST(1 AS BIGINT) << CAST(p.p AS INT))
                           ELSE 0 END) AS BIGINT) AS phash
      FROM {p}pix p JOIN {p}tot t ON p.doc_id = t.doc_id
      GROUP BY p.doc_id, p.w, p.h
    )"""


def _sql_audio_perdoc(src: str = "documents", prefix: str = "") -> str:
    """CTE chain recomputing the WAV energy-delta fingerprint in closed
    form for every doc_id in ``src``; final CTE ``{prefix}afpd`` has
    (doc_id, sample_rate, n_frames, afp)."""
    p = prefix
    return f"""{p}aud AS (
      SELECT doc_id, 50 + doc_id % 50 AS n FROM {src}
    ),
    {p}fr AS (
      SELECT doc_id, CAST(n // 10 AS BIGINT) AS nf, t.f AS f,
             list_sum(list_transform(
               generate_series(10 * t.f, 10 * t.f + 9),
               k -> ((doc_id * 7 + k * 13) % 2001 - 1000)
                  * ((doc_id * 7 + k * 13) % 2001 - 1000))) AS e
      FROM {p}aud, unnest(generate_series(0, n // 10 - 1)) AS t(f)
    ),
    {p}afpd AS (
      SELECT a.doc_id, CAST(8000 AS BIGINT) AS sample_rate, a.nf AS n_frames,
             CAST(SUM(CASE WHEN b.e > a.e
                           THEN (CAST(1 AS BIGINT) << CAST(a.f AS INT))
                           ELSE 0 END) AS BIGINT) AS afp
      FROM {p}fr a JOIN {p}fr b ON a.doc_id = b.doc_id AND b.f = a.f + 1
      GROUP BY a.doc_id, a.nf
    )"""


#: Static instantiations (prefix-free names: img/pix/tot/perdoc and
#: aud/fr/afpd) used by the single-corpus oracles above.
_SQL_IMG_PERDOC = _sql_img_perdoc()

_SQL_AUDIO_PERDOC = _sql_audio_perdoc()

_IMG_HAMMING_T = 3  # Hamming radius; < _IMG_BANDS (pigeonhole)
_IMG_BANDS = 4  # 4 bands × 12 bits cover the ≤48-bit phash
_AUD_HAMMING_T = 2  # < _AUD_BANDS
_AUD_BANDS = 3  # 3 bands × 3 bits cover the ≤9-bit fingerprint


def _image_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct perceptual hashes with representative + multiplicity:
    exact duplicates collapse BEFORE the Hamming stage, so the pair
    term is over distinct fingerprints only (a million identical
    images are one row here)."""
    from weather_analysis_bigdata__spark.operators.multimodal import (
        ppm_phash,
        synth_media,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    per_doc = ppm_phash(synth_media(d, "ppm"))
    return per_doc.groupBy("w", "h", "phash").agg(
        F.min("doc_id").cast("long").alias("rep_id"),
        F.count(F.lit(1)).cast("long").alias("n_images"),
    )


@register(
    "multimodal_image_near_dup",
    oracle=f"""
    WITH {_SQL_IMG_PERDOC},
    reps AS (
      SELECT w, h, phash,
             CAST(MIN(doc_id) AS BIGINT) AS rep_id,
             CAST(COUNT(*) AS BIGINT) AS n_images
      FROM perdoc GROUP BY w, h, phash
    )
    SELECT a.w, a.h,
           a.phash AS phash_a, b.phash AS phash_b,
           a.rep_id AS rep_a, b.rep_id AS rep_b,
           a.n_images AS n_images_a, b.n_images AS n_images_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
    FROM reps a JOIN reps b
      ON a.w = b.w AND a.h = b.h AND a.phash < b.phash
    WHERE bit_count(xor(a.phash, b.phash)) <= {_IMG_HAMMING_T}
    """,
    doc=f"IMAGE near-duplicate matching at Hamming radius "
    f"{_IMG_HAMMING_T} — the round-4 verdict's top item: the phash "
    "kernel's exact (phash, w, h) groups miss re-encodes that flip a "
    "few perceptual bits. Every document's synthetic PPM runs the "
    "REAL decode (mapInPandas → decode_ppm) into a ≤48-bit average "
    "hash; EXACT duplicates collapse first (groupBy — the skew guard: "
    "viral identical images are one representative row), then "
    f"distinct hashes are banded into {_IMG_BANDS}×12-bit keys "
    "(operators/hamming.py): by pigeonhole, any pair within Hamming "
    f"{_IMG_HAMMING_T} < {_IMG_BANDS} bands shares at least one EXACT "
    "band — candidate generation is an equi-join on (w, h, band_idx, "
    "band_val), verification one XOR+popcount (multi-index hashing, "
    "Norouzi et al. 2012; same packed-bit machinery as "
    "sim_search_binary_hamming). The oracle recomputes hashes in "
    "closed form and does the all-pairs check DIRECTLY — the match "
    "proves the banding finds EVERY pair (exact recall), not just "
    "plausible ones. At 100 TB: decode+hash is row-local, the band "
    "join shuffles 8-byte keys (never pixels), and the pair term is "
    "O(Σ bucket²) over distinct-hash band buckets.",
)
def multimodal_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.hamming import (
        banded_hamming_pairs,
    )

    pairs = banded_hamming_pairs(
        _image_reps(spark, sf_dir),
        class_cols=["w", "h"],
        hash_col="phash",
        n_bits=48,
        n_bands=_IMG_BANDS,
        max_hamming=_IMG_HAMMING_T,
        carry_cols=("rep_id", "n_images"),
    )
    return pairs.select(
        "w",
        "h",
        F.col("phash_a"),
        F.col("phash_b"),
        F.col("rep_id_a").alias("rep_a"),
        F.col("rep_id_b").alias("rep_b"),
        F.col("n_images_a"),
        F.col("n_images_b"),
        "hamming",
    )


@register(
    "multimodal_image_near_dup_groups",
    oracle=f"""
    WITH RECURSIVE {_SQL_IMG_PERDOC},
    reps AS (
      SELECT w, h, phash, CAST(MIN(doc_id) AS BIGINT) AS rep_id
      FROM perdoc GROUP BY w, h, phash
    ),
    edges AS (
      SELECT a.rep_id AS u, b.rep_id AS v
      FROM reps a JOIN reps b
        ON a.w = b.w AND a.h = b.h AND a.phash < b.phash
      WHERE bit_count(xor(a.phash, b.phash)) <= {_IMG_HAMMING_T}
    ),
    sym AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    reach(src, dst) AS (
      SELECT u, u FROM sym
      UNION
      SELECT r.src, s.v FROM reach r JOIN sym s ON r.dst = s.u
    ),
    comp AS (SELECT src AS rep_id, MIN(dst) AS grp FROM reach GROUP BY src)
    SELECT p.doc_id, p.w, p.h, p.phash,
           CAST(COALESCE(c.grp, r.rep_id) AS BIGINT) AS group_id
    FROM perdoc p
    JOIN reps r ON p.w = r.w AND p.h = r.h AND p.phash = r.phash
    LEFT JOIN comp c ON r.rep_id = c.rep_id
    """,
    doc="Image near-dup GROUP assignment — the dedup endgame for the "
    "image modality: Hamming similarity is not transitive, so 'keep "
    "one image per group' needs the connected components of the "
    "near-dup pair graph, not buckets. Edges are the banded pairs of "
    "multimodal_image_near_dup over the distinct-hash representative "
    "graph (tiny: one node per distinct fingerprint); components via "
    "iterative min-label propagation (operators/components.py, the "
    "same BSP kernel as dedup_connected_components); every document "
    "then inherits its representative's group. group_id = min doc_id "
    "reachable — deterministic and partitioning-invariant. Each "
    "exact-phash group maps into exactly one output group, so groups "
    "⊇ the exact groups by construction (pinned by a test). The "
    "oracle resolves reachability with a recursive CTE — the hash "
    "match proves banding + propagation ≡ true transitive closure.",
)
def multimodal_image_near_dup_groups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.components import (
        connected_components,
    )
    from weather_analysis_bigdata__spark.operators.hamming import (
        banded_hamming_pairs,
    )
    from weather_analysis_bigdata__spark.operators.multimodal import (
        ppm_phash,
        synth_media,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    per_doc = ppm_phash(synth_media(d, "ppm"))
    reps = per_doc.groupBy("w", "h", "phash").agg(
        F.min("doc_id").cast("long").alias("rep_id")
    )
    # Checkpoint the (tiny) edge list: label propagation re-joins the
    # edges every superstep, and without this the decode+banding
    # subtree would re-execute per iteration.
    edges = (
        banded_hamming_pairs(
            reps,
            class_cols=["w", "h"],
            hash_col="phash",
            n_bits=48,
            n_bands=_IMG_BANDS,
            max_hamming=_IMG_HAMMING_T,
            carry_cols=("rep_id",),
        )
        .select(F.col("rep_id_a").alias("u"), F.col("rep_id_b").alias("v"))
        .transform(pin)
    )
    comp = connected_components(edges)
    return (
        per_doc.join(reps, ["w", "h", "phash"])
        # comp holds only representatives with >=1 near-dup edge — a
        # bounded dedup artifact (collision clusters), broadcast so the
        # fact-scale doc->group resolution never sorts (was an SMJ).
        .join(F.broadcast(comp), reps["rep_id"] == comp["node"], "left")
        .select(
            "doc_id",
            "w",
            "h",
            "phash",
            F.coalesce("comp", "rep_id").cast("long").alias("group_id"),
        )
    )


# ---------------------------------------------------------------------------
# Audio modality: energy-delta fingerprint groups + Hamming near-dup
# ---------------------------------------------------------------------------
def _audio_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.multimodal import (
        synth_media,
        wav_fingerprint,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return wav_fingerprint(synth_media(d, "wav"))


@register(
    "multimodal_audio_fingerprint_groups",
    oracle=f"""
    WITH {_SQL_AUDIO_PERDOC}
    SELECT sample_rate, n_frames, afp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM afpd GROUP BY sample_rate, n_frames, afp
    """,
    doc="AUDIO-modality dedup — the WAV counterpart of the image phash "
    "kernel (round-4 verdict item 7): every document's synthetic WAV "
    "runs the REAL decode path (Arrow-batched mapInPandas → stdlib "
    "RIFF parse + PCM16 reinterpret, operators/multimodal.py:"
    "wav_fingerprint) and an ENERGY-DELTA fingerprint is computed "
    "from the decoded samples: 10-sample frames, exact int64 "
    "sum-of-squares energy per frame, bit f set iff "
    "energy[f+1] > energy[f] — gain-invariant by construction (the "
    "Haitsma-Kalker / Shazam band-energy idea collapsed to one "
    "band). Audio sharing (sample_rate, n_frames, afp) are "
    "perceptual duplicates; output is the collision-group table a "
    "dedup pass consumes. The oracle recomputes the fingerprint in "
    "closed form from the synthesis formula (sample k = "
    "(id·7 + k·13) mod 2001 − 1000) WITHOUT any decode — the match "
    "proves codec + fingerprint end-to-end. Scale shape: decode+hash "
    "is row-local; the group-by carries 8-byte fingerprints, never "
    "samples.",
)
def multimodal_audio_fingerprint_groups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return (
        _audio_fps(spark, sf_dir)
        .groupBy("sample_rate", "n_frames", "afp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
    )


@register(
    "multimodal_audio_near_dup",
    oracle=f"""
    WITH {_SQL_AUDIO_PERDOC},
    reps AS (
      SELECT sample_rate, n_frames, afp,
             CAST(MIN(doc_id) AS BIGINT) AS rep_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM afpd GROUP BY sample_rate, n_frames, afp
    )
    SELECT a.sample_rate, a.n_frames,
           a.afp AS afp_a, b.afp AS afp_b,
           a.rep_id AS rep_a, b.rep_id AS rep_b,
           a.n_docs AS n_docs_a, b.n_docs AS n_docs_b,
           CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
    FROM reps a JOIN reps b
      ON a.sample_rate = b.sample_rate AND a.n_frames = b.n_frames
     AND a.afp < b.afp
    WHERE bit_count(xor(a.afp, b.afp)) <= {_AUD_HAMMING_T}
    """,
    doc=f"AUDIO near-duplicate matching at Hamming radius "
    f"{_AUD_HAMMING_T}: recordings whose energy-delta fingerprints "
    "differ in a couple of comparisons (a re-encode nudging two frame "
    "energies across each other) match even though their exact "
    "fingerprint groups differ. Same shape as the image path: exact "
    "duplicates collapse to distinct-fingerprint representatives "
    f"first, then {_AUD_BANDS}×3-bit pigeonhole bands "
    "(operators/hamming.py) generate candidates within "
    "(sample_rate, n_frames) classes and one XOR+popcount verifies. "
    "With this, near-dup closes over ALL THREE modalities: text "
    "(MinHash/SimHash/winnowing), image (phash Hamming), audio "
    "(energy-fingerprint Hamming). Oracle = closed-form all-pairs; "
    "the match proves exact recall of the banded plan.",
)
def multimodal_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.hamming import (
        banded_hamming_pairs,
    )

    reps = (
        _audio_fps(spark, sf_dir)
        .groupBy("sample_rate", "n_frames", "afp")
        .agg(
            F.min("doc_id").cast("long").alias("rep_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )
    pairs = banded_hamming_pairs(
        reps,
        class_cols=["sample_rate", "n_frames"],
        hash_col="afp",
        n_bits=9,
        n_bands=_AUD_BANDS,
        max_hamming=_AUD_HAMMING_T,
        carry_cols=("rep_id", "n_docs"),
    )
    return pairs.select(
        "sample_rate",
        "n_frames",
        F.col("afp_a"),
        F.col("afp_b"),
        F.col("rep_id_a").alias("rep_a"),
        F.col("rep_id_b").alias("rep_b"),
        F.col("n_docs_a"),
        F.col("n_docs_b"),
        "hamming",
    )


# ---------------------------------------------------------------------------
# IVF centroid refresh: one deterministic Lloyd iteration over the
# persisted assignments — upsert → drift → REFRESH closes the index-
# maintenance loop (round-4 verdict item 2).
# ---------------------------------------------------------------------------
from weather_analysis_bigdata__spark.functions.vectorops import (  # noqa: E402
    scaled_vec,
)
from weather_analysis_bigdata__spark.queries_llmops import (  # noqa: E402
    _IVF_PROBES,
    _IVF_QUERIES,
    _IVF_TOPK,
    _ivf_assign,
    _ivf_centroids,
    _sqdist_col,
    _sql_sqdist,
    _SQL_FLOORDIV,
    _SQL_SVA,
    _SQL_VPOS,
)

#: Oracle CTE chain: train (label-mean centroids) → assign0 (the
#: persisted inverted lists) → ONE Lloyd step: newc_arr = exact floor-
#: means over each list's members → assign1 (re-assignment against the
#: refreshed centroids). Shared by the refresh report and the
#: refreshed-serve oracle below.
_SQL_LLOYD = f"""{_SQL_VPOS.strip()},
    cent AS (
      SELECT label AS c_label, pos,
             CAST({_SQL_FLOORDIV.format(s='SUM(v_int)', n='COUNT(*)')} AS BIGINT)
               AS c_int
      FROM vpos GROUP BY label, pos
    ),
    cent_arr AS (
      SELECT c_label, list(c_int ORDER BY pos) AS c_arr
      FROM cent GROUP BY c_label
    ),
    sv AS (SELECT vec_id, {_SQL_SVA} AS sva FROM embeddings),
    assign0 AS (
      SELECT vec_id AS cand_id, c_label AS part_label FROM (
        SELECT s.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {_sql_sqdist('s.sva', 'c.c_arr')}, c.c_label) AS rn
        FROM sv s CROSS JOIN cent_arr c) WHERE rn = 1
    ),
    vpos0 AS (
      SELECT a.part_label, v.pos, v.v_int
      FROM vpos v JOIN assign0 a ON v.vec_id = a.cand_id
    ),
    newc AS (
      SELECT part_label, pos,
             CAST({_SQL_FLOORDIV.format(s='SUM(v_int)', n='COUNT(*)')} AS BIGINT)
               AS c_int
      FROM vpos0 GROUP BY part_label, pos
    ),
    newc_arr AS (
      SELECT part_label, list(c_int ORDER BY pos) AS c_arr
      FROM newc GROUP BY part_label
    ),
    assign1 AS (
      SELECT vec_id AS cand_id, part_label FROM (
        SELECT s.vec_id, c.part_label,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {_sql_sqdist('s.sva', 'c.c_arr')}, c.part_label) AS rn
        FROM sv s CROSS JOIN newc_arr c) WHERE rn = 1
    )"""


def _ivf_refreshed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED refreshed centroid table (part_label, c_arr): exact
    floor-mean of each inverted list's members — one deterministic
    Lloyd iteration from the persisted assignment, never from the
    (label-supervised) training shortcut."""
    from weather_analysis_bigdata__spark.operators.index_store import (
        persisted_index,
    )

    def build() -> DataFrame:
        sv = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", scaled_vec("embedding").alias("sva")
        )
        vp = (
            sv.join(
                _ivf_assign(spark, sf_dir),
                sv["vec_id"] == F.col("cand_id"),
            )
            .select("part_label", F.posexplode("sva").alias("pos", "v_int"))
        )
        s, n = F.sum("v_int"), F.count(F.lit(1))
        floordiv = (s - (((s % n) + n) % n)) / n
        newc = vp.groupBy("part_label", "pos").agg(
            floordiv.cast("long").alias("c_int")
        )
        return newc.groupBy("part_label").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c_int"))),
                lambda st: st["c_int"],
            ).alias("c_arr")
        )

    return persisted_index(spark, sf_dir, "ivf_centroids_refreshed", build)


def _ivf_refreshed_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED re-assignment (cand_id, part_label) against the
    refreshed centroids — the updated inverted lists."""
    from weather_analysis_bigdata__spark.operators.index_store import (
        persisted_index,
    )

    def build() -> DataFrame:
        cent = _ivf_refreshed_centroids(spark, sf_dir)
        sv = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", scaled_vec("embedding").alias("sva")
        )
        scored = sv.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "part_label",
            _sqdist_col(F.col("sva"), F.col("c_arr")).alias("dist"),
        )
        w_vec = Window.partitionBy("vec_id").orderBy("dist", "part_label")
        return (
            scored.select("*", F.row_number().over(w_vec).alias("rn"))
            .filter(F.col("rn") == 1)
            .select(F.col("vec_id").alias("cand_id"), "part_label")
        )

    return persisted_index(spark, sf_dir, "ivf_assign_refreshed", build)


def _prepare_ivf_refresh(spark: SparkSession, sf_dir: str) -> None:
    _ivf_refreshed_assign(spark, sf_dir)


@register(
    "ivf_centroid_refresh",
    oracle=f"""
    WITH {_SQL_LLOYD},
    moves AS (
      SELECT a0.part_label AS old_l, a1.part_label AS new_l
      FROM assign0 a0 JOIN assign1 a1 USING (cand_id)
    ),
    bf AS (SELECT part_label, COUNT(*) AS n_before FROM assign0
           GROUP BY part_label),
    af AS (SELECT part_label, COUNT(*) AS n_after FROM assign1
           GROUP BY part_label),
    outs AS (SELECT old_l AS part_label, COUNT(*) AS n_out FROM moves
             WHERE old_l <> new_l GROUP BY old_l),
    ins AS (SELECT new_l AS part_label, COUNT(*) AS n_in FROM moves
            WHERE old_l <> new_l GROUP BY new_l)
    SELECT CAST(n.part_label AS BIGINT) AS c_label,
           CAST(COALESCE(bf.n_before, 0) AS BIGINT) AS n_before,
           CAST(COALESCE(af.n_after, 0) AS BIGINT) AS n_after,
           CAST(COALESCE(outs.n_out, 0) AS BIGINT) AS n_out,
           CAST(COALESCE(ins.n_in, 0) AS BIGINT) AS n_in,
           CAST({_sql_sqdist('c.c_arr', 'n.c_arr')} AS DOUBLE)
             / 10000000000000000.0 AS centroid_shift
    FROM newc_arr n
    JOIN cent_arr c ON c.c_label = n.part_label
    LEFT JOIN bf ON bf.part_label = n.part_label
    LEFT JOIN af ON af.part_label = n.part_label
    LEFT JOIN outs ON outs.part_label = n.part_label
    LEFT JOIN ins ON ins.part_label = n.part_label
    """,
    doc="IVF centroid REFRESH — the retrain step that closes the "
    "index-maintenance loop (upsert → drift → refresh; round-4 "
    "verdict item 2): ivf_index_upsert serves arrivals against stale "
    "centroids forever, so this operator runs ONE deterministic Lloyd "
    "iteration from the PERSISTED index state: new centroid = exact "
    "integer floor-mean of each inverted list's members (computed "
    "from the persisted assignment, not the label-supervised training "
    "shortcut), then every vector re-assigns against the refreshed "
    "centroids. Output per list: size before/after, departures (n_out)"
    " / arrivals (n_in), and how far the centroid moved (exact scaled "
    "squared L2) — the convergence/health report that decides whether "
    "another iteration is worth it (k-means convergence: movement "
    "monotonically shrinks). Both the refreshed centroids and the "
    "re-assignment are PERSISTED indexes (ivf_centroids_refreshed, "
    "ivf_assign_refreshed) that ivf_probe_topk_refreshed serves from "
    "— refresh once, serve many. Scale shape: the mean recompute is "
    "one groupBy over (list, dim) pairs; re-assignment broadcasts "
    "k×d centroids and is embarrassingly parallel; the report joins "
    "O(k)-row aggregates. Hash-proven deterministic: exact integer "
    "floor-means and fully tie-broken argmins on both engines.",
    prepare=_prepare_ivf_refresh,
)
def ivf_centroid_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    old_cent = _ivf_centroids(spark, sf_dir)
    new_cent = _ivf_refreshed_centroids(spark, sf_dir)
    old_assign = _ivf_assign(spark, sf_dir)
    new_assign = _ivf_refreshed_assign(spark, sf_dir)
    before = old_assign.groupBy("part_label").agg(
        F.count(F.lit(1)).alias("n_before")
    )
    after = new_assign.groupBy("part_label").agg(
        F.count(F.lit(1)).alias("n_after")
    )
    moves = (
        old_assign.select("cand_id", F.col("part_label").alias("old_l"))
        .join(
            new_assign.select("cand_id", F.col("part_label").alias("new_l")),
            "cand_id",
        )
        .filter(F.col("old_l") != F.col("new_l"))
    )
    outs = moves.groupBy(F.col("old_l").alias("part_label")).agg(
        F.count(F.lit(1)).alias("n_out")
    )
    ins = moves.groupBy(F.col("new_l").alias("part_label")).agg(
        F.count(F.lit(1)).alias("n_in")
    )
    shift = new_cent.alias("n").join(
        old_cent.alias("o"), F.col("o.c_label") == F.col("n.part_label")
    ).select(
        "part_label",
        (
            _sqdist_col(F.col("o.c_arr"), F.col("n.c_arr")).cast("double")
            / 1e16
        ).alias("centroid_shift"),
    )
    # every side is an O(k)-row aggregate — broadcast to keep the plan
    # a chain of tiny hash joins (the ivf_index_upsert precedent)
    return (
        shift.join(F.broadcast(before), "part_label", "left")
        .join(F.broadcast(after), "part_label", "left")
        .join(F.broadcast(outs), "part_label", "left")
        .join(F.broadcast(ins), "part_label", "left")
        .select(
            F.col("part_label").cast("long").alias("c_label"),
            F.coalesce("n_before", F.lit(0)).cast("long").alias("n_before"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            F.coalesce("n_out", F.lit(0)).cast("long").alias("n_out"),
            F.coalesce("n_in", F.lit(0)).cast("long").alias("n_in"),
            "centroid_shift",
        )
    )


@register(
    "ivf_probe_topk_refreshed",
    oracle=f"""
    WITH {_SQL_LLOYD},
    probes AS (
      SELECT vec_id AS query_id, part_label AS probe_label FROM (
        SELECT s.vec_id, c.part_label,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {_sql_sqdist('s.sva', 'c.c_arr')}, c.part_label) AS rn
        FROM sv s CROSS JOIN newc_arr c
        WHERE s.vec_id < {_IVF_QUERIES}) WHERE rn <= {_IVF_PROBES}
    ),
    cands AS (
      SELECT p.query_id, a.cand_id
      FROM probes p JOIN assign1 a ON p.probe_label = a.part_label
      WHERE a.cand_id <> p.query_id
    ),
    pair AS (
      SELECT c.query_id, c.cand_id,
             {_sql_sqdist('q.sva', 'x.sva')} AS dist
      FROM cands c
      JOIN sv q ON q.vec_id = c.query_id
      JOIN sv x ON x.vec_id = c.cand_id
    )
    SELECT query_id, cand_id AS neighbor_id,
           CAST(dist AS DOUBLE) / 10000000000000000.0 AS sq_dist, rn
    FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY dist, cand_id) AS BIGINT) AS rn
      FROM pair)
    WHERE rn <= {_IVF_TOPK}
    """,
    doc=f"IVF serve AFTER refresh — proves the refreshed persisted "
    "index actually serves: the same probe shape as ivf_probe_topk "
    f"({_IVF_QUERIES} queries × {_IVF_PROBES} probes, "
    f"top-{_IVF_TOPK} exact re-rank) but routed entirely through the "
    "REFRESHED centroid table and REFRESHED inverted lists "
    "(ivf_centroids_refreshed / ivf_assign_refreshed — the output of "
    "one Lloyd iteration), never the stale training-time index. "
    "Together with ivf_index_upsert and ivf_centroid_refresh this is "
    "the full production lifecycle: build → upsert (stale serve) → "
    "refresh → serve. Same scale shape as ivf_probe_topk: broadcast "
    "k×d centroids, probe-pruned list scans, per-query grouped "
    "ranking.",
    prepare=_prepare_ivf_refresh,
)
def ivf_probe_topk_refreshed(spark: SparkSession, sf_dir: str) -> DataFrame:
    assign = _ivf_refreshed_assign(spark, sf_dir)
    cent = _ivf_refreshed_centroids(spark, sf_dir)
    sv = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", scaled_vec("embedding").alias("sva")
    )
    scored = (
        sv.filter(F.col("vec_id") < _IVF_QUERIES)
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "part_label",
            _sqdist_col(F.col("sva"), F.col("c_arr")).alias("dist"),
        )
    )
    w_vec = Window.partitionBy("vec_id").orderBy("dist", "part_label")
    probes = (
        scored.select("*", F.row_number().over(w_vec).alias("rn"))
        .filter(F.col("rn") <= _IVF_PROBES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("part_label").alias("probe_label"),
        )
    )
    cands = (
        F.broadcast(probes)
        .join(assign, F.col("probe_label") == F.col("part_label"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
    )
    q = sv.select(
        F.col("vec_id").alias("query_id"), F.col("sva").alias("q_sva")
    ).filter(F.col("query_id") < _IVF_QUERIES)
    pair = (
        cands.join(sv, F.col("cand_id") == F.col("vec_id"))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            _sqdist_col(F.col("q_sva"), F.col("sva")).alias("dist"),
        )
    )
    w_q = Window.partitionBy("query_id").orderBy("dist", "cand_id")
    return (
        pair.select(
            "*", F.row_number().over(w_q).cast("bigint").alias("rn")
        )
        .filter(F.col("rn") <= _IVF_TOPK)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            (F.col("dist").cast("double") / 1e16).alias("sq_dist"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# Capped hyperplane LSH: the ANN family's skewed-bucket guard
# ---------------------------------------------------------------------------
from weather_analysis_bigdata__spark.functions.vectorops import (  # noqa: E402
    cosine,
    norm,
    sql_dot,
    sql_norm,
)
from weather_analysis_bigdata__spark.queries_llmops import (  # noqa: E402
    _LSH_BUCKET_CAP,
    _hyperplanes,
    _sql_bucket,
)


@register(
    "sim_search_lsh_capped",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, embedding, {sql_norm('embedding')} AS nrm FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, embedding, nrm, ({_sql_bucket()}) AS bucket FROM n
    ),
    kept AS (
      SELECT vec_id, embedding, nrm, bucket, brank FROM (
        SELECT *, CAST(row_number() OVER (
                 PARTITION BY bucket ORDER BY vec_id) AS BIGINT) AS brank
        FROM bucketed) WHERE brank <= {_LSH_BUCKET_CAP}
    )
    SELECT bucket, query_id, neighbor_id, neighbor_brank, cosine_sim, rn
    FROM (
      SELECT a.bucket, a.vec_id AS query_id, b.vec_id AS neighbor_id,
             b.brank AS neighbor_brank,
             {sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)
               AS cosine_sim,
             CAST(row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY {sql_dot('a.embedding', 'b.embedding')}
                        / (a.nrm * b.nrm) DESC,
                        b.vec_id) AS BIGINT) AS rn
      FROM bucketed a JOIN kept b
        ON a.bucket = b.bucket AND a.vec_id <> b.vec_id)
    WHERE rn <= 3
    """,
    doc=f"Hyperplane LSH with a PER-BUCKET CANDIDATE CAP — the ANN "
    "family's skewed-bucket guard (round-4 verdict item 3), mirroring "
    "dedup_minhash_bucket_capped on the dedup side: sim_search_lsh "
    "pairs every query with EVERY bucket-mate, an O((N/2^planes)²) "
    "per-bucket term that a hot bucket (near-duplicate embeddings, "
    "boilerplate vectors) turns quadratic. Here each bucket's "
    f"CANDIDATE side is capped at its first {_LSH_BUCKET_CAP} members "
    "by vec_id (deterministic — no sampling nondeterminism), while "
    "EVERY query is still served: the join is bucketed-queries × "
    "capped-candidates, so per-bucket work is ≤ |bucket|·cap and the "
    "whole rung is ≤ N·cap comparisons regardless of bucket skew — "
    "the bound that survives viral embeddings at 100 TB. "
    "neighbor_brank exposes which capped slot each neighbor came "
    "from; the recall cost of the cap is priced as a first-class "
    "column (lsh256_capped_cands vs lsh256_pairs) in "
    "ann_ladder_candidate_audit. Same integer-exact bucket hashes "
    "and scaled-integer cosine as the uncapped rung.",
)
def sim_search_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.functions.vectorops import (
        arrow_bucket_norm,
        arrow_pair_cosine,
    )

    planes = _hyperplanes()
    # Arrow bucket/norm pass + Arrow pair scorer — see sim_search_lsh.
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", scaled_vec("embedding").alias("sva")
    )
    bucketed = arrow_bucket_norm(emb, planes).hint("shuffle_hash")
    wb = Window.partitionBy("bucket").orderBy("vec_id")
    kept = (
        bucketed.select(
            "*", F.row_number().over(wb).cast("bigint").alias("brank")
        )
        .filter(F.col("brank") <= _LSH_BUCKET_CAP)
    )
    a = bucketed.select(
        "bucket",
        F.col("vec_id").alias("query_id"),
        F.col("sva").alias("a_sva"),
        F.col("nrm").alias("a_nrm"),
    )
    b = kept.select(
        F.col("bucket").alias("b_bucket"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("brank").alias("neighbor_brank"),
        F.col("sva").alias("b_sva"),
        F.col("nrm").alias("b_nrm"),
    )
    pairs = a.join(
        b,
        (F.col("bucket") == F.col("b_bucket"))
        & (F.col("query_id") != F.col("neighbor_id")),
    ).select(
        "bucket",
        "query_id",
        "neighbor_id",
        "neighbor_brank",
        "a_sva",
        "b_sva",
        "a_nrm",
        "b_nrm",
    )
    scored = arrow_pair_cosine(pairs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), "neighbor_id"
    )
    return (
        scored.select(
            "bucket",
            "query_id",
            "neighbor_id",
            "neighbor_brank",
            "cosine_sim",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


_VID_DF_CAP = 10  # frame-hashes in more videos than this are boilerplate
_VID_MIN_SHARED = 2  # near-dup needs >=2 shared discriminative frames


def _sql_video_fhash(src: str = "documents", prefix: str = "") -> str:
    """CTE chain recomputing the per-frame Y4M luma hash in closed form
    (frame f byte j = (id + 7f + j) mod 256 over the C420 payload; the
    Y plane is the first w·h bytes); final CTE ``{prefix}fhash`` has
    (doc_id, w, h, n_frames, f, fh)."""
    p = prefix
    return f"""{p}vids AS (
      SELECT doc_id,
             CAST(4 + 2 * (doc_id % 3) AS BIGINT) AS w,
             CAST(4 + 2 * (doc_id % 2) AS BIGINT) AS h,
             CAST(2 + doc_id % 4 AS BIGINT) AS nf
      FROM {src}
    ),
    {p}vf AS (
      SELECT doc_id, w, h, nf, t.f AS f
      FROM {p}vids, unnest(generate_series(0, nf - 1)) AS t(f)
    ),
    {p}ypix AS (
      SELECT doc_id, w, h, nf, f, t.j AS j,
             (doc_id + 7 * f + t.j) % 256 AS y
      FROM {p}vf, unnest(generate_series(0, w * h - 1)) AS t(j)
    ),
    {p}ysum AS (
      SELECT doc_id, f, SUM(y) AS total, COUNT(*) AS npix
      FROM {p}ypix GROUP BY doc_id, f
    ),
    {p}fhash AS (
      SELECT p.doc_id, p.w, p.h, p.nf AS n_frames, p.f,
             CAST(SUM(CASE WHEN p.y * s.npix > s.total
                           THEN (CAST(1 AS BIGINT) << CAST(p.j AS INT))
                           ELSE 0 END) AS BIGINT) AS fh
      FROM {p}ypix p JOIN {p}ysum s
        ON p.doc_id = s.doc_id AND p.f = s.f
      GROUP BY p.doc_id, p.w, p.h, p.nf, p.f
    )"""



# ---------------------------------------------------------------------------
# Multimodal ingest router: one plan routes text + image + audio
# ---------------------------------------------------------------------------
def _image_rep_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED corpus image-fingerprint index (w, h, phash, rep_id) —
    built once through the REAL decode path, served as a scan."""
    from weather_analysis_bigdata__spark.operators.index_store import (
        persisted_index,
    )

    return persisted_index(
        spark,
        sf_dir,
        "image_phash_reps",
        lambda: _image_reps(spark, sf_dir).select(
            "w", "h", "phash", "rep_id"
        ),
    )


def _audio_rep_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED corpus audio-fingerprint index
    (sample_rate, n_frames, afp, rep_id)."""
    from weather_analysis_bigdata__spark.operators.index_store import (
        persisted_index,
    )

    def build() -> DataFrame:
        return (
            _audio_fps(spark, sf_dir)
            .groupBy("sample_rate", "n_frames", "afp")
            .agg(F.min("doc_id").cast("long").alias("rep_id"))
        )

    return persisted_index(spark, sf_dir, "audio_afp_reps", build)


def _video_kept_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERSISTED corpus video frame-hash index: distinct
    (doc_id, w, h, fhash) rows whose frame-hash appears in ≤
    ``_VID_DF_CAP`` videos — boilerplate frames are excluded at BUILD
    time, so the serve join never sees the hot buckets."""
    from weather_analysis_bigdata__spark.operators.index_store import (
        persisted_index,
    )

    def build() -> DataFrame:
        vhash = (
            _video_fhash(spark, sf_dir)
            .select("doc_id", "w", "h", "fhash")
            .distinct()
        )
        bsize = vhash.groupBy("w", "h", "fhash").agg(
            F.count(F.lit(1)).alias("n_videos")
        )
        return vhash.join(
            bsize.filter(F.col("n_videos") <= _VID_DF_CAP),
            ["w", "h", "fhash"],
        ).select("doc_id", "w", "h", "fhash")

    return persisted_index(spark, sf_dir, "video_fhash_kept", build)


def _prepare_router_multimodal(spark: SparkSession, sf_dir: str) -> None:
    from weather_analysis_bigdata__spark.queries_round4 import (
        _router_fp_index,
    )

    _router_fp_index(spark, sf_dir)
    _image_rep_index(spark, sf_dir)
    _audio_rep_index(spark, sf_dir)
    _video_kept_index(spark, sf_dir)


def _router_batch_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized arriving batch (doc_id, text): an identical-text
    slice (id+1e6) and a text-modified slice (id+2e6) — shared by the
    batch router and its streaming replay."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        d.filter(F.col("doc_id") % 50 == 0)
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
        .unionByName(
            d.filter(F.col("doc_id") % 50 == 1).select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zznovel")).alias("text"),
            )
        )
    )


def _route_batch(
    spark: SparkSession, sf_dir: str, batch: DataFrame
) -> DataFrame:
    """Route (doc_id, text) arrivals through the FOUR modality gates
    against the persisted corpus indexes — the router kernel, shared
    by the batch query and the streaming replay. Decisions are pure
    per-doc functions of (doc, corpus indexes), so routing COMMUTES
    with micro-batching — the property the streaming replay's
    stream ≡ batch oracle certifies."""
    from weather_analysis_bigdata__spark.functions.distributed import (
        grouped_topk,
    )
    from weather_analysis_bigdata__spark.functions.textops import md5s
    from weather_analysis_bigdata__spark.operators.hamming import (
        banded_hamming_join,
    )
    from weather_analysis_bigdata__spark.operators.multimodal import (
        ppm_phash,
        synth_media,
        wav_fingerprint,
        y4m_frame_phash,
    )
    from weather_analysis_bigdata__spark.queries_round4 import (
        _router_fp_index,
    )

    ids = batch.select("doc_id")
    # Arriving media runs the SAME real decode kernels the corpus
    # indexes were built with.
    bimg = ppm_phash(synth_media(ids, "ppm"))
    baud = wav_fingerprint(synth_media(ids, "wav"))

    tmatch = (
        batch.select("doc_id", md5s(F.col("text")).alias("fp"))
        .join(_router_fp_index(spark, sf_dir), "fp")
        .select("doc_id", "fp_doc_id")
    )
    icand = banded_hamming_join(
        bimg.select("w", "h", "phash", "doc_id"),
        _image_rep_index(spark, sf_dir),
        class_cols=["w", "h"],
        hash_col="phash",
        n_bits=48,
        n_bands=_IMG_BANDS,
        max_hamming=_IMG_HAMMING_T,
        left_carry=("doc_id",),
        right_carry=("rep_id",),
    )
    imatch = grouped_topk(
        icand, ["doc_id"], [F.col("hamming"), F.col("rep_id")], 1
    ).select("doc_id", F.col("rep_id").alias("i_rep"), F.col("hamming").alias("i_ham"))
    acand = banded_hamming_join(
        baud.select("sample_rate", "n_frames", "afp", "doc_id"),
        _audio_rep_index(spark, sf_dir),
        class_cols=["sample_rate", "n_frames"],
        hash_col="afp",
        n_bits=9,
        n_bands=_AUD_BANDS,
        max_hamming=_AUD_HAMMING_T,
        left_carry=("doc_id",),
        right_carry=("rep_id",),
    )
    amatch = grouped_topk(
        acand, ["doc_id"], [F.col("hamming"), F.col("rep_id")], 1
    ).select("doc_id", F.col("rep_id").alias("a_rep"), F.col("hamming").alias("a_ham"))

    # Video gate: arriving frame hashes (REAL Y4M decode) vs the
    # df-capped persisted frame index — each shared frame hash is a
    # band; best corpus video by (shared frames desc, doc asc).
    bvd = (
        y4m_frame_phash(synth_media(ids, "y4m"))
        .select("doc_id", "w", "h", "fhash")
        .distinct()
    )
    bvn = bvd.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bf")
    )
    ck = _video_kept_index(spark, sf_dir).select(
        F.col("doc_id").alias("cand"), "w", "h", "fhash"
    )
    vpair = (
        bvd.join(ck, ["w", "h", "fhash"])
        .groupBy("doc_id", "cand")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _VID_MIN_SHARED)
    )
    vmatch = (
        grouped_topk(
            vpair, ["doc_id"], [F.col("n_shared").desc(), F.col("cand")], 1
        )
        .join(F.broadcast(bvn), "doc_id")
        .select(
            "doc_id",
            F.col("cand").cast("long").alias("v_rep"),
            F.col("n_shared").alias("v_shared"),
            "n_bf",
        )
    )

    routed = (
        batch.select("doc_id")
        .join(F.broadcast(tmatch), "doc_id", "left")
        .join(F.broadcast(imatch), "doc_id", "left")
        .join(F.broadcast(amatch), "doc_id", "left")
        .join(F.broadcast(vmatch), "doc_id", "left")
    )
    t = F.col("fp_doc_id")
    i_ham, a_ham = F.col("i_ham"), F.col("a_ham")
    v_sh, v_nbf = F.col("v_shared"), F.col("n_bf")
    return routed.select(
        F.col("doc_id").alias("new_doc_id"),
        F.when(t.isNotNull(), "drop_exact_text")
        .when(i_ham == 0, "drop_image_dup")
        .when(i_ham.isNotNull(), "link_image_near_dup")
        .when(a_ham == 0, "drop_audio_dup")
        .when(a_ham.isNotNull(), "link_audio_near_dup")
        .when(v_sh == v_nbf, "drop_video_dup")
        .when(v_sh.isNotNull(), "link_video_near_dup")
        .otherwise("keep")
        .alias("decision"),
        F.when(t.isNotNull(), "text")
        .when(i_ham.isNotNull(), "image")
        .when(a_ham.isNotNull(), "audio")
        .when(v_sh.isNotNull(), "video")
        .alias("modality"),
        F.when(t.isNotNull(), t)
        .when(i_ham.isNotNull(), F.col("i_rep"))
        .when(a_ham.isNotNull(), F.col("a_rep"))
        .when(v_sh.isNotNull(), F.col("v_rep"))
        .alias("matched_doc_id"),
        F.when(t.isNotNull(), F.lit(0).cast("long"))
        .when(i_ham.isNotNull(), i_ham)
        .when(a_ham.isNotNull(), a_ham)
        .when(v_sh.isNotNull(), v_nbf - v_sh)
        .alias("match_distance"),
        t.alias("text_doc_id"),
        i_ham.alias("image_hamming"),
        a_ham.alias("audio_hamming"),
        v_sh.alias("video_shared_frames"),
    )


#: Shared by the batch router and its streaming replay (decisions are
#: per-doc, so stream-built segments must equal this batch SQL).
_ROUTER_MM_ORACLE = f"""
    WITH batch AS (
      SELECT doc_id + 1000000 AS doc_id, text
      FROM documents WHERE doc_id % 50 = 0
      UNION ALL
      SELECT doc_id + 2000000, text || ' zznovel'
      FROM documents WHERE doc_id % 50 = 1
    ),
    {_sql_img_perdoc('documents', 'c')},
    {_sql_img_perdoc('batch', 'b')},
    {_sql_audio_perdoc('documents', 'ca')},
    {_sql_audio_perdoc('batch', 'ba')},
    cfp AS (
      SELECT md5(text) AS fp, CAST(MIN(doc_id) AS BIGINT) AS fp_doc_id
      FROM documents GROUP BY fp
    ),
    cireps AS (
      SELECT w, h, phash, CAST(MIN(doc_id) AS BIGINT) AS rep_id
      FROM cperdoc GROUP BY w, h, phash
    ),
    careps AS (
      SELECT sample_rate, n_frames, afp,
             CAST(MIN(doc_id) AS BIGINT) AS rep_id
      FROM caafpd GROUP BY sample_rate, n_frames, afp
    ),
    tmatch AS (
      SELECT b.doc_id, c.fp_doc_id
      FROM (SELECT doc_id, md5(text) AS fp FROM batch) b
      JOIN cfp c USING (fp)
    ),
    imatch AS (
      SELECT doc_id, rep_id, hamming FROM (
        SELECT b.doc_id, r.rep_id,
               CAST(bit_count(xor(b.phash, r.phash)) AS BIGINT) AS hamming,
               row_number() OVER (
                 PARTITION BY b.doc_id
                 ORDER BY bit_count(xor(b.phash, r.phash)), r.rep_id) AS rn
        FROM bperdoc b JOIN cireps r ON b.w = r.w AND b.h = r.h
        WHERE bit_count(xor(b.phash, r.phash)) <= {_IMG_HAMMING_T})
      WHERE rn = 1
    ),
    amatch AS (
      SELECT doc_id, rep_id, hamming FROM (
        SELECT b.doc_id, r.rep_id,
               CAST(bit_count(xor(b.afp, r.afp)) AS BIGINT) AS hamming,
               row_number() OVER (
                 PARTITION BY b.doc_id
                 ORDER BY bit_count(xor(b.afp, r.afp)), r.rep_id) AS rn
        FROM baafpd b JOIN careps r
          ON b.sample_rate = r.sample_rate AND b.n_frames = r.n_frames
        WHERE bit_count(xor(b.afp, r.afp)) <= {_AUD_HAMMING_T})
      WHERE rn = 1
    ),
    {_sql_video_fhash('documents', 'cv')},
    {_sql_video_fhash('batch', 'bv')},
    cvd AS (SELECT DISTINCT doc_id, w, h, fh FROM cvfhash),
    cvb AS (SELECT w, h, fh, COUNT(*) AS nv FROM cvd GROUP BY w, h, fh),
    cvkept AS (
      SELECT c.* FROM cvd c JOIN cvb b
        ON c.w = b.w AND c.h = b.h AND c.fh = b.fh
      WHERE b.nv <= {_VID_DF_CAP}
    ),
    bvd AS (SELECT DISTINCT doc_id, w, h, fh FROM bvfhash),
    bvn AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bf
            FROM bvd GROUP BY doc_id),
    vpair AS (
      SELECT b.doc_id, c.doc_id AS cand,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM bvd b JOIN cvkept c
        ON b.w = c.w AND b.h = c.h AND b.fh = c.fh
      GROUP BY b.doc_id, c.doc_id
      HAVING COUNT(*) >= {_VID_MIN_SHARED}
    ),
    vmatch AS (
      SELECT doc_id, CAST(cand AS BIGINT) AS rep_id, n_shared, n_bf FROM (
        SELECT v.*, n.n_bf,
               row_number() OVER (
                 PARTITION BY v.doc_id
                 ORDER BY v.n_shared DESC, v.cand) AS rn
        FROM vpair v JOIN bvn n ON v.doc_id = n.doc_id)
      WHERE rn = 1
    )
    SELECT b.doc_id AS new_doc_id,
           CASE WHEN t.fp_doc_id IS NOT NULL THEN 'drop_exact_text'
                WHEN i.hamming = 0 THEN 'drop_image_dup'
                WHEN i.hamming IS NOT NULL THEN 'link_image_near_dup'
                WHEN a.hamming = 0 THEN 'drop_audio_dup'
                WHEN a.hamming IS NOT NULL THEN 'link_audio_near_dup'
                WHEN v.n_shared = v.n_bf THEN 'drop_video_dup'
                WHEN v.n_shared IS NOT NULL THEN 'link_video_near_dup'
                ELSE 'keep' END AS decision,
           CASE WHEN t.fp_doc_id IS NOT NULL THEN 'text'
                WHEN i.hamming IS NOT NULL THEN 'image'
                WHEN a.hamming IS NOT NULL THEN 'audio'
                WHEN v.n_shared IS NOT NULL THEN 'video' END AS modality,
           CASE WHEN t.fp_doc_id IS NOT NULL THEN t.fp_doc_id
                WHEN i.hamming IS NOT NULL THEN i.rep_id
                WHEN a.hamming IS NOT NULL THEN a.rep_id
                WHEN v.n_shared IS NOT NULL THEN v.rep_id
                END AS matched_doc_id,
           CASE WHEN t.fp_doc_id IS NOT NULL THEN CAST(0 AS BIGINT)
                WHEN i.hamming IS NOT NULL THEN i.hamming
                WHEN a.hamming IS NOT NULL THEN a.hamming
                WHEN v.n_shared IS NOT NULL THEN v.n_bf - v.n_shared
                END AS match_distance,
           t.fp_doc_id AS text_doc_id,
           i.hamming AS image_hamming,
           a.hamming AS audio_hamming,
           v.n_shared AS video_shared_frames
    FROM batch b
    LEFT JOIN tmatch t ON b.doc_id = t.doc_id
    LEFT JOIN imatch i ON b.doc_id = i.doc_id
    LEFT JOIN amatch a ON b.doc_id = a.doc_id
    LEFT JOIN vmatch v ON b.doc_id = v.doc_id
    """


@register(
    "corpus_ingest_router_multimodal",
    oracle=_ROUTER_MM_ORACLE,
    doc="MULTIMODAL corpus ingest router — the round-5 capstone "
    "(verdict item 9, extended to ALL FOUR modalities): one plan "
    "routes an arriving batch through every modality gate against "
    "PERSISTED corpus indexes: text exact (md5 fingerprint vs the "
    f"router_fp index), image perceptual (REAL PPM decode → phash, "
    f"banded Hamming ≤ {_IMG_HAMMING_T} vs image_phash_reps — "
    "distance 0 is a perceptual dup, 1..t a near-dup link), audio "
    f"perceptual (REAL WAV decode → energy fingerprint, Hamming ≤ "
    f"{_AUD_HAMMING_T} vs audio_afp_reps), and video (REAL Y4M "
    "decode → per-frame luma hashes vs the df-capped "
    f"video_fhash_kept index: ≥ {_VID_MIN_SHARED} shared "
    "discriminative frames links, full frame-set coverage drops). "
    "Precedence text > image > audio > video mirrors production "
    "triage (cheapest-certain gate first); each arriving doc gets "
    "ONE decision plus the PER-MODALITY EVIDENCE columns "
    "(text_doc_id, image_hamming, audio_hamming, "
    "video_shared_frames) — the decision log a pipeline audits, with "
    "every gate's verdict visible even when precedence overrides it. "
    "The arriving media is decoded by the same Arrow-batched kernels "
    "the corpus indexes were built with — the oracle recomputes both "
    "sides in closed form, so the match certifies decode + hash + "
    "banding + df-cap + precedence end-to-end. Scale shape: the "
    "batch is the only non-index scan; index joins are equi-joins on "
    "fingerprint/band keys (batch side broadcasts); per-doc best "
    "match is a grouped top-1, partitioned by arriving doc.",
    prepare=_prepare_router_multimodal,
)
def corpus_ingest_router_multimodal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _route_batch(spark, sf_dir, _router_batch_df(spark, sf_dir))


# ---------------------------------------------------------------------------
# Video modality: frame-level luma hashes + shared-frame near-dup
# ---------------------------------------------------------------------------
def _video_fhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.multimodal import (
        synth_media,
        y4m_frame_phash,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return y4m_frame_phash(synth_media(d, "y4m"))


@register(
    "multimodal_video_frame_phash_groups",
    oracle=f"""
    WITH {_sql_video_fhash()}
    SELECT w, h, fh AS fhash,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_videos,
           CAST(COUNT(*) AS BIGINT) AS n_frame_hits,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM fhash GROUP BY w, h, fh
    """,
    doc="VIDEO-modality fingerprint index — frame-granular, the unit "
    "video copy-detection systems index: every document's synthetic "
    "Y4M runs the REAL container decode (stream-header grammar, "
    "FRAME markers, C420 plane math — operators/multimodal.py:"
    "y4m_frame_phash) and each frame's Y plane hashes to a ≤48-bit "
    "luma average-hash. Output = the frame-hash collision table "
    "(how many videos / frame hits share each hash): its SKEW is the "
    "point — a handful of boilerplate gradients collide across ~80 "
    "videos on this corpus (the black-frame/intro-card phenomenon at "
    "scale), which is exactly why the near-dup query df-caps them. "
    "The oracle recomputes every frame hash in closed form from the "
    "synthesis formula without decoding — the match proves container "
    "parse + plane math + hash end-to-end. Scale: decode+hash is "
    "row-local; the group-by ships 8-byte hashes, never frames.",
)
def multimodal_video_frame_phash_groups(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return (
        _video_fhash(spark, sf_dir)
        .groupBy("w", "h", F.col("fhash"))
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_videos"),
            F.count(F.lit(1)).cast("long").alias("n_frame_hits"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
    )


@register(
    "multimodal_video_near_dup",
    oracle=f"""
    WITH {_sql_video_fhash()},
    vhash AS (
      SELECT DISTINCT doc_id, w, h, n_frames, fh FROM fhash
    ),
    bsize AS (
      SELECT w, h, fh, COUNT(*) AS n_videos
      FROM vhash GROUP BY w, h, fh
    ),
    kept AS (
      SELECT v.* FROM vhash v JOIN bsize b
        ON v.w = b.w AND v.h = b.h AND v.fh = b.fh
      WHERE b.n_videos <= {_VID_DF_CAP}
    )
    SELECT a.w, a.h,
           a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_frames,
           CAST(MAX(a.n_frames) AS BIGINT) AS n_frames_a,
           CAST(MAX(b.n_frames) AS BIGINT) AS n_frames_b
    FROM kept a JOIN kept b
      ON a.w = b.w AND a.h = b.h AND a.fh = b.fh
     AND a.doc_id < b.doc_id
    GROUP BY a.w, a.h, a.doc_id, b.doc_id
    HAVING COUNT(*) >= {_VID_MIN_SHARED}
    """,
    doc=f"VIDEO near-duplicate matching by shared frame fingerprints — "
    "the fourth and final modality (text: MinHash; image: phash "
    "Hamming; audio: energy fingerprint; video: frame-hash overlap): "
    f"two videos in the same (w, h) class sharing ≥ {_VID_MIN_SHARED} "
    "DISCRIMINATIVE frame hashes are near-duplicates — robust to "
    "trims, re-ordering and frame insertion, which whole-file hashes "
    "miss (the content-ID / video copy-detection join). Frame hashes "
    f"appearing in more than {_VID_DF_CAP} videos are dropped BEFORE "
    "pair generation: the frame-hash collision table shows ~80-video "
    "boilerplate buckets on this corpus whose |bucket|² pairs would "
    "dominate the join while carrying no signal — the SAME df-cap "
    "rule the MinHash band family uses for hot shingles "
    "(dedup_minhash_bucket_capped), applied at video granularity; "
    "each frame hash is naturally a band, so pair work is "
    "O(#buckets · cap²) regardless of corpus skew. Per-video frame "
    "sets are DISTINCT'd first (a looping video counts each hash "
    "once). Oracle = the same algebra in closed form — the match "
    "certifies decode, hashing, the df-cap, and the overlap count.",
)
def multimodal_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    vhash = (
        _video_fhash(spark, sf_dir)
        .select("doc_id", "w", "h", "n_frames", "fhash")
        .distinct()
    )
    bsize = vhash.groupBy("w", "h", "fhash").agg(
        F.count(F.lit(1)).alias("n_videos")
    )
    kept = vhash.join(
        bsize.filter(F.col("n_videos") <= _VID_DF_CAP),
        ["w", "h", "fhash"],
    )
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.fhash") == F.col("b.fhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.w").alias("w"),
            F.col("a.h").alias("h"),
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_frames"),
            F.max("a.n_frames").cast("long").alias("n_frames_a"),
            F.max("b.n_frames").cast("long").alias("n_frames_b"),
        )
        .filter(F.col("n_shared_frames") >= _VID_MIN_SHARED)
    )


@register(
    "streaming_multimodal_router_replay",
    oracle=_ROUTER_MM_ORACLE,
    doc="The multimodal ingest router RUN BY THE STREAMING ENGINE — "
    "production ingest is a stream, not a batch job: the arriving "
    "docs replay in 4 micro-batches (availableNow, one file per "
    "trigger) and foreachBatch routes EACH micro-batch through the "
    "four modality gates against the PERSISTED corpus indexes "
    "(_route_batch — the exact kernel the batch query runs), "
    "publishing each batch's decisions as a batch_id-keyed overwrite "
    "segment (deterministic per batch → idempotent under "
    "at-least-once redelivery). The registered result is the UNION of "
    "the stream-built decision segments; the oracle is the batch "
    "router's SQL VERBATIM — the hash match proves routing COMMUTES "
    "with micro-batching (decisions are pure per-doc functions of "
    "doc + corpus indexes), i.e. a streaming deployment of the "
    "router loses nothing vs the batch job. Completes the streaming "
    "index-maintenance family: streaming_minhash_index_replay "
    "maintains the index side; this replays the DECISION side.",
    prepare=_prepare_router_multimodal,
)
def streaming_multimodal_router_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile
    import uuid

    from weather_analysis_bigdata__spark.operators.index_store import (
        read_replay_segments,
        replay_segment_dir,
    )

    run = uuid.uuid4().hex[:10]
    src_dir = tempfile.mkdtemp(prefix=f"mmrt_src_{run}_")
    # Segments outlive this function — the result IS their scan (the
    # round-6 replay_segment_dir pattern; this was the last replay that
    # froze its output via collect()+createDataFrame).
    seg_dir = replay_segment_dir("mmrouter_seg")
    try:
        batch = _router_batch_df(spark, sf_dir)
        schema = batch.schema
        batch.repartition(4).write.mode("overwrite").parquet(src_dir)

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

        def publish(batch_df: DataFrame, batch_id: int) -> None:
            _route_batch(spark, sf_dir, batch_df).write.mode(
                "overwrite"
            ).parquet(os.path.join(seg_dir, f"seg_{batch_id}"))

        q = (
            stream.writeStream.foreachBatch(publish)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        # Distributed scan of the published segments — no collect().
        return read_replay_segments(spark, seg_dir)
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# Lloyd convergence: K refresh iterations, objective proven monotone
# ---------------------------------------------------------------------------
_LLOYD_ITERS = 3


def _sql_lloyd_convergence(k_iter: int) -> str:
    """CTE chain for ``k_iter`` full Lloyd iterations from the
    label-trained centroids: assign_i (argmin + its distance) against
    cent_arr_i, then cent_arr_{i+1} = exact floor-means over assign_i.
    Objective sums use DECIMAL(38,0) (per-vector distances reach
    ~2.6e18; a corpus sum overflows BIGINT)."""
    sq = _sql_sqdist("s.sva", "c.c_arr")
    parts = [
        _SQL_VPOS.strip(),
        f"""cent0 AS (
      SELECT label AS part_label, pos,
             CAST({_SQL_FLOORDIV.format(s='SUM(v_int)', n='COUNT(*)')} AS BIGINT)
               AS c_int
      FROM vpos GROUP BY label, pos
    ),
    cent_arr_0 AS (
      SELECT part_label, list(c_int ORDER BY pos) AS c_arr
      FROM cent0 GROUP BY part_label
    ),
    sv AS (SELECT vec_id, {_SQL_SVA} AS sva FROM embeddings)""",
    ]
    for i in range(k_iter + 1):
        parts.append(
            f"""assign_{i} AS (
      SELECT vec_id, part_label, dist FROM (
        SELECT s.vec_id, c.part_label, {sq} AS dist,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {sq}, c.part_label) AS rn
        FROM sv s CROSS JOIN cent_arr_{i} c) WHERE rn = 1
    ),
    obj_{i} AS (
      SELECT CAST(SUM(CAST(dist AS DECIMAL(38, 0))) AS DOUBLE)
               / 10000000000000000.0 AS objective
      FROM assign_{i}
    )"""
        )
        if i == k_iter:
            break
        parts.append(
            f"""vp_{i} AS (
      SELECT a.part_label, v.pos, v.v_int
      FROM vpos v JOIN assign_{i} a ON v.vec_id = a.vec_id
    ),
    cent_{i + 1} AS (
      SELECT part_label, pos,
             CAST({_SQL_FLOORDIV.format(s='SUM(v_int)', n='COUNT(*)')} AS BIGINT)
               AS c_int
      FROM vp_{i} GROUP BY part_label, pos
    ),
    cent_arr_{i + 1} AS (
      SELECT part_label, list(c_int ORDER BY pos) AS c_arr
      FROM cent_{i + 1} GROUP BY part_label
    ),
    shift_{i + 1} AS (
      SELECT CAST(SUM(CAST({_sql_sqdist('a.c_arr', 'b.c_arr')}
                           AS DECIMAL(38, 0))) AS DOUBLE)
               / 10000000000000000.0 AS total_shift
      FROM cent_arr_{i} a JOIN cent_arr_{i + 1} b USING (part_label)
    ),
    moved_{i + 1} AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_reassigned
      FROM assign_{i} p JOIN assign_{i + 1} n USING (vec_id)
      WHERE p.part_label <> n.part_label
    )"""
        )
    selects = [
        "SELECT CAST(0 AS BIGINT) AS iteration, objective, "
        "CAST(NULL AS BIGINT) AS n_reassigned, "
        "CAST(NULL AS DOUBLE) AS centroid_shift_total FROM obj_0"
    ]
    for i in range(1, k_iter + 1):
        selects.append(
            f"SELECT CAST({i} AS BIGINT), o.objective, m.n_reassigned, "
            f"s.total_shift FROM obj_{i} o, moved_{i} m, shift_{i} s"
        )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


@register(
    "ivf_lloyd_convergence",
    oracle=_sql_lloyd_convergence(_LLOYD_ITERS),
    doc=f"K-MEANS CONVERGENCE proven cross-engine: {_LLOYD_ITERS} full "
    "Lloyd iterations from the label-trained centroids, each emitting "
    "the clustering OBJECTIVE (Σ squared distance of every vector to "
    "its nearest centroid — exact DECIMAL(38,0) sums of scaled-integer "
    "distances, one rounding at the boundary), the number of vectors "
    "that changed lists, and the total centroid movement. Lloyd's "
    "theorem says the objective is monotone non-increasing (each "
    "assignment step and each mean-update step can only lower it) — "
    "the output curve SHOWS it, a pytest asserts it, and the DuckDB "
    "hash match proves both engines walk the identical trajectory "
    "(floor-means + tie-broken argmins are deterministic, so there is "
    "exactly one). This extends ivf_centroid_refresh's single step to "
    "the full retrain loop a production index runs until movement is "
    "small. Scale shape per iteration: broadcast k×d centroids, one "
    "embarrassingly-parallel argmin pass, one groupBy(label, dim) "
    "mean — O(N·k·d) work, no pairwise terms; the iteration count is "
    "the only sequential dimension.",
)
def ivf_lloyd_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.functions.vectorops import (
        arrow_centroid_argmin,
        arrow_label_moments,
    )
    from weather_analysis_bigdata__spark.session import pin_lazy

    sv = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", scaled_vec("embedding").alias("sva")
    )
    # Floor-mean over the Arrow moments kernel's exact (s, n) partials
    # — identical integers to the old posexplode + groupBy form (sums
    # are associative), but the exchange carries ≤ batches·k·d partial
    # rows instead of N·d exploded rows (guide §2.3).
    s, n = F.sum("s"), F.sum("n")
    floordiv = (s - (((s % n) + n) % n)) / n

    def mean_cent_rows(labeled: DataFrame) -> list[tuple[int, list[int]]]:
        """(part_label, sva) rows → label-sorted (label, centroid)
        floor-means as BOUNDED DRIVER STATE (k×d longs — the
        NB-count-index pattern). Every generation was already
        collect()ed for the argmin kernel's task closure; collecting
        the mean aggregate DIRECTLY (instead of pinning a centroid
        DataFrame and collecting from it) removes one eager
        materialization job per generation — the round-11 eager-pin
        build-time class, guide §1/§5."""
        rows = (
            arrow_label_moments(labeled)
            .groupBy("part_label", "pos")
            .agg(floordiv.cast("long").alias("c_int"))
            .collect()
        )
        by: dict[int, dict[int, int]] = {}
        for r in rows:
            by.setdefault(r["part_label"], {})[r["pos"]] = r["c_int"]
        return sorted(
            (lab, [d[p] for p in sorted(d)]) for lab, d in by.items()
        )

    def py_shift(
        old: list[tuple[int, list[int]]], new: list[tuple[int, list[int]]]
    ) -> float | None:
        """Σ sqdist(old, new) over labels present in BOTH generations —
        the old `cent ⋈ new_cent` aggregate, computed exactly in driver
        integer arithmetic over the already-collected k×d state
        (Python ints are exact; the single float(int) at the end is
        the same correctly-rounded conversion as the JVM's
        DECIMAL(38,0)→DOUBLE cast). Empty intersection mirrors the old
        inner join's NULL sum."""
        od = dict(old)
        tot, seen = 0, False
        for lab, arr in new:
            oa = od.get(lab)
            if oa is None:
                continue
            seen = True
            tot += sum((x - y) * (x - y) for x, y in zip(oa, arr))
        return float(tot) / 1e16 if seen else None

    cent_rows = mean_cent_rows(
        load_table(spark, sf_dir, "embeddings").select(
            F.col("label").alias("part_label"),
            scaled_vec("embedding").alias("sva"),
        )
    )

    def assign_against(
        cent_rows: list[tuple[int, list[int]]], last: bool
    ) -> DataFrame:
        # k×d centroids ride the task closure; the Arrow argmin kernel
        # assigns with ZERO shuffles — the old form paid a broadcast
        # crossJoin (N×k rows), k·d interpreted lambdas per vector, and
        # a window exchange+sort per pass. Ties break identically
        # (centroids sorted by label, argmin takes the first minimum).
        # sva rides along so the centroid update needs no join back to
        # vectors. Intermediate assigns pin LAZILY: their first reader
        # is the next generation's moments collect, which materializes
        # the blocks in the same job (one job per generation instead of
        # pin + collect). The LAST assign has no such single-reader
        # probe — the final union references it twice (objective +
        # moved-count), so it keeps the eager pin.
        a = arrow_centroid_argmin(sv, cent_rows, keep_vec=True)
        return a.transform(pin if last else pin_lazy)

    def objective(assign: DataFrame):
        return (
            F.sum(F.col("dist").cast("decimal(38,0)")).cast("double") / 1e16
        )

    rows = []
    assign = assign_against(cent_rows, last=_LLOYD_ITERS == 0)
    obj0 = assign.agg(objective(assign).alias("objective"))
    rows.append(
        obj0.select(
            F.lit(0).cast("long").alias("iteration"),
            "objective",
            F.lit(None).cast("long").alias("n_reassigned"),
            F.lit(None).cast("double").alias("centroid_shift_total"),
        )
    )
    for i in range(1, _LLOYD_ITERS + 1):
        new_cent_rows = mean_cent_rows(assign.select("part_label", "sva"))
        shift_val = py_shift(cent_rows, new_cent_rows)
        new_assign = assign_against(new_cent_rows, last=i == _LLOYD_ITERS)
        moved = (
            assign.select("vec_id", F.col("part_label").alias("old_l"))
            .join(
                new_assign.select("vec_id", F.col("part_label").alias("new_l")),
                "vec_id",
            )
            .filter(F.col("old_l") != F.col("new_l"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_reassigned"))
        )
        obj = new_assign.agg(objective(new_assign).alias("objective"))
        rows.append(
            obj.crossJoin(moved)
            .select(
                F.lit(i).cast("long").alias("iteration"),
                "objective",
                "n_reassigned",
                F.lit(shift_val)
                .cast("double")
                .alias("centroid_shift_total"),
            )
        )
        # Superseded assign pins are NOT unpin()'d here (unlike the
        # CC/BPE/pagerank loops): every appended report plan still
        # references its iteration's assign and only executes in the
        # final union — releasing them would force recomputes at
        # collection. Bounded by design: _LLOYD_ITERS(3) + 1 pins,
        # each O(vectors) rows; centroid generations are k×d driver
        # lists, never pinned DataFrames.
        cent_rows, assign = new_cent_rows, new_assign
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Cross-modality consensus dedup: composite fingerprint groups
# ---------------------------------------------------------------------------
@register(
    "multimodal_dedup_consensus",
    oracle=f"""
    WITH {_sql_img_perdoc()},
    {_sql_audio_perdoc()}
    SELECT p.w, p.h, p.phash, a.sample_rate, a.n_frames, a.afp,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(p.doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(p.doc_id) AS BIGINT) AS max_doc_id
    FROM perdoc p JOIN afpd a ON p.doc_id = a.doc_id
    GROUP BY p.w, p.h, p.phash, a.sample_rate, a.n_frames, a.afp
    HAVING COUNT(*) >= 2
    """,
    doc="CROSS-MODALITY consensus dedup: documents grouped by the "
    "COMPOSITE (image phash × audio fingerprint) key — both computed "
    "through their REAL decode paths — and only groups where ≥2 docs "
    "agree on BOTH modalities survive. Single-modality fingerprints "
    "false-positive on boilerplate (the gradient-image and flat-audio "
    "collision classes are visible in their group tables); requiring "
    "agreement across independent modalities multiplies the collision "
    "probabilities, so consensus groups are high-confidence duplicate "
    "sets (55 doc-pairs at sf0.01 vs ~3k per single modality). The "
    "scale insight is the FORMULATION: consensus needs NO pair join — "
    "grouping by the composite key is one linear shuffle of 16-byte "
    "fingerprints, where intersecting two pair sets would inherit "
    "each modality's Σc² skew term. The oracle joins the two "
    "closed-form fingerprint chains on doc_id and groups identically.",
)
def multimodal_dedup_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.operators.multimodal import (
        ppm_phash,
        synth_media,
        wav_fingerprint,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    img = ppm_phash(synth_media(d, "ppm"))
    aud = wav_fingerprint(synth_media(d, "wav"))
    return (
        img.join(aud, "doc_id")
        .groupBy("w", "h", "phash", "sample_rate", "n_frames", "afp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# IVF index DELETE: tombstones + post-delete serve (completes CRUD)
# ---------------------------------------------------------------------------
_DELETE_MOD = 4  # every 4th vector is deleted


@register(
    "ivf_index_delete",
    oracle=f"""
    WITH {_SQL_VPOS.strip()},
    cent AS (
      SELECT label AS c_label, pos,
             CAST({_SQL_FLOORDIV.format(s='SUM(v_int)', n='COUNT(*)')} AS BIGINT)
               AS c_int
      FROM vpos GROUP BY label, pos
    ),
    cent_arr AS (
      SELECT c_label, list(c_int ORDER BY pos) AS c_arr
      FROM cent GROUP BY c_label
    ),
    sv AS (SELECT vec_id, {_SQL_SVA} AS sva FROM embeddings),
    assign AS (
      SELECT vec_id AS cand_id, c_label AS part_label FROM (
        SELECT s.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {_sql_sqdist('s.sva', 'c.c_arr')}, c.c_label) AS rn
        FROM sv s CROSS JOIN cent_arr c) WHERE rn = 1
    )
    SELECT CAST(part_label AS BIGINT) AS part_label,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN cand_id % {_DELETE_MOD} = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
           CAST(SUM(CASE WHEN cand_id % {_DELETE_MOD} = 0
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_after,
           CAST(SUM(CASE WHEN cand_id % {_DELETE_MOD} = 0
                         THEN 0 ELSE 1 END) AS DOUBLE)
             / COUNT(*) AS live_fraction
    FROM assign GROUP BY part_label
    """,
    doc=f"IVF index DELETE — the lifecycle operation the maintenance "
    "family still lacked (build → upsert → refresh → DELETE → serve): "
    f"a delete set (every {_DELETE_MOD}th vector — GDPR erasure, "
    "dataset recall, retention expiry) is applied to the PERSISTED "
    "inverted lists as TOMBSTONES, and the report shows per-list size "
    "before, deletions, survivors, and the live fraction — the "
    "compaction trigger (FAISS remove_ids / vector-DB tombstone "
    "semantics: serve-time filtering is cheap until the dead fraction "
    "justifies rebuilding the list). The delete set never touches "
    "vectors: it is an anti-join on ids against the assignment scan. "
    "ivf_probe_topk_post_delete serves from the same tombstoned "
    "index and proves deleted ids never surface in results.",
    prepare=_prepare_ivf_refresh,
)
def ivf_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.queries_llmops import _ivf_assign

    assign = _ivf_assign(spark, sf_dir)
    dead = F.col("cand_id") % _DELETE_MOD == 0
    return assign.groupBy(F.col("part_label").cast("long").alias("part_label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(F.when(dead, 1).otherwise(0)).cast("long").alias("n_deleted"),
        F.sum(F.when(dead, 0).otherwise(1)).cast("long").alias("n_after"),
        (
            F.sum(F.when(dead, 0).otherwise(1)).cast("double")
            / F.count(F.lit(1))
        ).alias("live_fraction"),
    )


#: Serve-after-delete oracle: IVF probe over the LIVE (non-tombstoned)
#: assignment. queries_serving.py:ivf_probe_topk_post_compact registers
#: THIS EXACT STRING as its oracle — compaction changes the index
#: representation (dead rows physically purged from cold lists), never
#: the serve results, and the shared oracle is that proof.
_SQL_POST_DELETE_SERVE = f"""
    WITH {_SQL_VPOS.strip()},
    cent AS (
      SELECT label AS c_label, pos,
             CAST({_SQL_FLOORDIV.format(s='SUM(v_int)', n='COUNT(*)')} AS BIGINT)
               AS c_int
      FROM vpos GROUP BY label, pos
    ),
    cent_arr AS (
      SELECT c_label, list(c_int ORDER BY pos) AS c_arr
      FROM cent GROUP BY c_label
    ),
    sv AS (SELECT vec_id, {_SQL_SVA} AS sva FROM embeddings),
    assign AS (
      SELECT vec_id AS cand_id, c_label AS part_label FROM (
        SELECT s.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {_sql_sqdist('s.sva', 'c.c_arr')}, c.c_label) AS rn
        FROM sv s CROSS JOIN cent_arr c) WHERE rn = 1
    ),
    live AS (
      SELECT cand_id, part_label FROM assign
      WHERE cand_id % {_DELETE_MOD} <> 0
    ),
    probes AS (
      SELECT vec_id AS query_id, c_label AS probe_label FROM (
        SELECT s.vec_id, c.c_label,
               row_number() OVER (
                 PARTITION BY s.vec_id
                 ORDER BY {_sql_sqdist('s.sva', 'c.c_arr')}, c.c_label) AS rn
        FROM sv s CROSS JOIN cent_arr c
        WHERE s.vec_id < {_IVF_QUERIES}) WHERE rn <= {_IVF_PROBES}
    ),
    cands AS (
      SELECT p.query_id, a.cand_id
      FROM probes p JOIN live a ON p.probe_label = a.part_label
      WHERE a.cand_id <> p.query_id
    ),
    pair AS (
      SELECT c.query_id, c.cand_id,
             {_sql_sqdist('q.sva', 'x.sva')} AS dist
      FROM cands c
      JOIN sv q ON q.vec_id = c.query_id
      JOIN sv x ON x.vec_id = c.cand_id
    )
    SELECT query_id, cand_id AS neighbor_id,
           CAST(dist AS DOUBLE) / 10000000000000000.0 AS sq_dist, rn
    FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY dist, cand_id) AS BIGINT) AS rn
      FROM pair)
    WHERE rn <= {_IVF_TOPK}
    """


@register(
    "ivf_probe_topk_post_delete",
    oracle=_SQL_POST_DELETE_SERVE,
    doc=f"IVF serve AFTER DELETE: the single-query probe shape "
    f"({_IVF_QUERIES} queries × {_IVF_PROBES} probes, "
    f"top-{_IVF_TOPK}) with the tombstone filter applied to the "
    "persisted inverted-list scan — deleted vectors are excluded "
    "BEFORE candidate generation (an anti-join pushdown on the index "
    "scan, never a post-rank patch, so every query still yields k "
    "live results; a test proves no tombstoned id ever surfaces). "
    "Together with upsert and refresh this completes the index CRUD "
    "lifecycle. Note queries themselves may be deleted ids — a "
    "deleted user can still search; they just can't be FOUND.",
    prepare=_prepare_ivf_refresh,
)
def ivf_probe_topk_post_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.queries_llmops import (
        _ivf_assign,
        _ivf_probes,
    )

    live = _ivf_assign(spark, sf_dir).filter(
        F.col("cand_id") % _DELETE_MOD != 0
    )
    probes = _ivf_probes(spark, sf_dir)
    sv = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", scaled_vec("embedding").alias("sva")
    )
    cands = (
        F.broadcast(probes)
        .join(live, F.col("probe_label") == F.col("part_label"))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id")
    )
    q = sv.select(
        F.col("vec_id").alias("query_id"), F.col("sva").alias("q_sva")
    ).filter(F.col("query_id") < _IVF_QUERIES)
    pair = (
        cands.join(sv, F.col("cand_id") == F.col("vec_id"))
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            _sqdist_col(F.col("q_sva"), F.col("sva")).alias("dist"),
        )
    )
    w_q = Window.partitionBy("query_id").orderBy("dist", "cand_id")
    return (
        pair.select(
            "*", F.row_number().over(w_q).cast("bigint").alias("rn")
        )
        .filter(F.col("rn") <= _IVF_TOPK)
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            (F.col("dist").cast("double") / 1e16).alias("sq_dist"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# SimHash at Hamming radius: the text modality joins the banded family
# ---------------------------------------------------------------------------
_SIM_HAMMING_T = 2  # < _SIM_BANDS
_SIM_BANDS = 3  # 3 bands × 6 bits cover the 16-bit simhash


def _sql_simhash_reps() -> str:
    """CTE chain: the dedup_simhash fingerprint algebra (distinct
    unigrams → md5-nibble ±1 votes → 16 sign bits) over the
    planted-duplicate corpus, collapsed to distinct-simhash
    representatives. Mirrors queries_llmops.dedup_simhash exactly."""
    from weather_analysis_bigdata__spark.functions.textops import (
        SQL_TOKENS,
        sql_hexval,
    )
    from weather_analysis_bigdata__spark.queries_llmops import SQL_DOCS_DUP

    sums = ", ".join(
        f"SUM(2 * (({sql_hexval(f'substr(h4, {p // 4 + 1}, 1)')} "
        f">> {3 - p % 4}) & 1) - 1) AS s{p}"
        for p in range(16)
    )
    bits = " + ".join(
        f"CASE WHEN s{p} > 0 THEN {1 << p} ELSE 0 END" for p in range(16)
    )
    return f"""{SQL_DOCS_DUP.strip()},
    tok AS (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest({SQL_TOKENS.format(c='text')}) AS tok FROM docs
      )
    ),
    th AS (SELECT doc_id, substr(md5(tok), 1, 4) AS h4 FROM tok),
    sums AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
    sim AS (
      SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM sums
    ),
    reps AS (
      SELECT simhash,
             CAST(MIN(doc_id) AS BIGINT) AS rep_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM sim GROUP BY simhash
    )"""


@register(
    "dedup_simhash_hamming",
    oracle=f"""
    WITH {_sql_simhash_reps()}
    SELECT a.simhash AS simhash_a, b.simhash AS simhash_b,
           a.rep_id AS rep_a, b.rep_id AS rep_b,
           a.n_docs AS n_docs_a, b.n_docs AS n_docs_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM reps a JOIN reps b ON a.simhash < b.simhash
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SIM_HAMMING_T}
    """,
    doc=f"SimHash near-dup at Hamming radius {_SIM_HAMMING_T} — "
    "dedup_simhash's own docstring promises 'group by hamming-ball "
    "probes' at 100 TB; this delivers it with the SAME pigeonhole "
    "banding the image/audio modalities use (operators/hamming.py: "
    f"{_SIM_BANDS}×6-bit bands over the 16-bit fingerprint, exact "
    "recall by theorem): documents whose simhashes differ in a couple "
    "of sign bits — a few changed tokens flipping marginal vote sums "
    "— match even though exact-simhash grouping separates them. "
    "Exact-fingerprint duplicates collapse to representatives first "
    "(the standard skew guard), so the banded pair term is over "
    "distinct fingerprints. With this, the BANDED HAMMING family is "
    "uniform across all fingerprint modalities: text simhash, image "
    "phash, audio energy code — one operator, one theorem, three "
    "kernels. Oracle = closed-form all-pairs over the same vote "
    "algebra; the match proves banding finds every pair.",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.functions.textops import tokens
    from weather_analysis_bigdata__spark.operators.hamming import (
        banded_hamming_pairs,
    )
    from weather_analysis_bigdata__spark.queries_llmops import (
        _docs_with_dups,
        hexval,
    )

    docs = _docs_with_dups(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("tok")
    ).distinct()
    th = tok.select(
        "doc_id",
        F.substring(F.md5(F.col("tok").cast("binary")), 1, 4).alias("h4"),
    )
    sums = th.groupBy("doc_id").agg(
        *[
            F.sum(
                2
                * (
                    F.shiftright(
                        hexval(F.substring("h4", p // 4 + 1, 1)), 3 - p % 4
                    ).bitwiseAND(F.lit(1))
                )
                - 1
            ).alias(f"s{p}")
            for p in range(16)
        ]
    )
    simhash = sum(
        F.when(F.col(f"s{p}") > 0, F.lit(1 << p)).otherwise(0)
        for p in range(16)
    ).cast("long")
    reps = (
        sums.select("doc_id", simhash.alias("simhash"))
        .groupBy("simhash")
        .agg(
            F.min("doc_id").cast("long").alias("rep_id"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )
    pairs = banded_hamming_pairs(
        reps,
        class_cols=[],
        hash_col="simhash",
        n_bits=16,
        n_bands=_SIM_BANDS,
        max_hamming=_SIM_HAMMING_T,
        carry_cols=("rep_id", "n_docs"),
    )
    return pairs.select(
        F.col("simhash_a"),
        F.col("simhash_b"),
        F.col("rep_id_a").alias("rep_a"),
        F.col("rep_id_b").alias("rep_b"),
        F.col("n_docs_a"),
        F.col("n_docs_b"),
        "hamming",
    )


# ---------------------------------------------------------------------------
# Postings index DELETE: the text-side erasure mirror of ivf_index_delete
# ---------------------------------------------------------------------------
_PDEL_MOD = 10
_PDEL_REM = 3


@register(
    "postings_index_delete",
    oracle=f"""
    WITH basetf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
        FROM documents)
      GROUP BY doc_id, term
    ),
    basedf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM basetf
               GROUP BY term),
    removed AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df_removed,
             CAST(SUM(tf) AS BIGINT) AS tf_removed
      FROM basetf WHERE doc_id % {_PDEL_MOD} = {_PDEL_REM}
      GROUP BY term
    )
    SELECT r.term,
           b.df AS df_before,
           r.df_removed,
           b.df - r.df_removed AS df_after,
           r.tf_removed
    FROM removed r JOIN basedf b USING (term)
    """,
    doc=f"Inverted-index DELETE — the text-side erasure kernel "
    "(GDPR right-to-erasure / retention expiry applied to a search "
    "index), completing the postings lifecycle with "
    "postings_index_upsert: the delete set (every "
    f"{_PDEL_MOD}th doc) is resolved against the PERSISTED raw "
    "posting index — per-term negative deltas (df_removed, "
    "tf_removed) — and merged df (index df_before − df_removed) must "
    "equal the from-scratch rebuild over the surviving corpus: the "
    "oracle IS that rebuild, so the hash match proves raw postings "
    "are subtractive as well as additive (weighted postings are "
    "neither — the reason segment engines persist the raw layer). "
    "Output rows = only the terms the deleted docs touch, i.e. the "
    "tombstone segment a deletion publishes; terms whose df_after "
    "hits 0 leave the dictionary. Per-delete cost: O(|deleted docs| "
    "postings) read from the index partition-pruned by doc_id — the "
    "corpus is never re-tokenized.",
)
def postings_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from weather_analysis_bigdata__spark.queries_round4 import _raw_postings

    raw = _raw_postings(spark, sf_dir)
    df_base = raw.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_before")
    )
    removed = (
        raw.filter(F.col("doc_id") % _PDEL_MOD == _PDEL_REM)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df_removed"),
            F.sum("tf").cast("long").alias("tf_removed"),
        )
    )
    return (
        F.broadcast(removed)
        .join(df_base, "term")
        .select(
            "term",
            "df_before",
            "df_removed",
            (F.col("df_before") - F.col("df_removed"))
            .cast("long")
            .alias("df_after"),
            "tf_removed",
        )
    )
