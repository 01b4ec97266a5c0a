"""Vector (embedding) expressions: exact dot product, norm, cosine.

Embeddings are ``array<float>`` columns. A float dot product summed in
parallel is order-dependent in the last bits, and decimal→double casts
round differently across engines (DuckDB goes hugeint × 10^-scale — two
roundings; measured 1-ulp cosine drift vs Spark's BigDecimal path). The
portable exact form used here is **pure 64-bit integer arithmetic**:

1. quantize each element float → double → DECIMAL(18,8) (both engines
   round the binary double identically — verified bit-exact),
2. scale to longs: xi = x·10^8,
3. dot = Σ xi·yi — each product ≤ 10^16·‖x‖∞², the sum stays exact in
   64 bits for any vector family with dims·(‖x‖∞·10^8)² < 2^63 (64-dim
   unit vectors: ≤ 6.4·10^17 — ample margin),
4. one correctly-rounded BIGINT→double cast (identical on both engines),
   then divide by 1e16 (exactly representable: 2^16·5^16, 5^16 < 2^53).

Quantization to 1e-8 is part of the operator contract (float32 carries
~7 significant digits; at |x|≤1 the quantization is at or below input
precision) — both engines apply it identically, so results are
bit-identical AND independent of partitioning/reduction order at
1000-executor scale.

Everything is higher-order functions (``zip_with``/``aggregate``) over
primitive longs — no UDFs, no explode, no Decimal object allocation
(HOFs run interpreted, so per-element object cost is the constant that
matters; longs are ~10× cheaper than Decimals here).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ELEM = T.DecimalType(18, 8)
_SCALE = 100_000_000  # 10^8 per element → 10^16 per product
_SCALE_SQ = float(_SCALE) ** 2


def scaled_vec(col: Column | str) -> Column:
    """array<float> → array<long>: elements quantized to DECIMAL(18,8)
    and scaled by 10^8 (exact integer representation)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: (x.cast("double").cast(_ELEM) * F.lit(_SCALE)).cast("long")
    )


def dot(a: Column, b: Column) -> Column:
    """Exact dot product of two scaled-long vectors → double."""
    prod = F.zip_with(a, b, lambda x, y: x * y)
    s = F.aggregate(prod, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return s.cast("double") / F.lit(_SCALE_SQ)


def norm(a: Column) -> Column:
    """Euclidean norm from the exact self-dot → double."""
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine similarity with precomputed norms (norms are computed once
    per vector, not once per pair — at N vectors × K candidates that's
    O(N·d) instead of O(N·K·d))."""
    return dot(a, b) / (norm_a * norm_b)


# ---- SQL mirrors (DuckDB list lambdas) --------------------------------


def _sql_ielem(x: str) -> str:
    return f"CAST(CAST(CAST({x} AS DOUBLE) AS DECIMAL(18,8)) * {_SCALE} AS BIGINT)"


def sql_dot(a: str, b: str) -> str:
    """DuckDB: exact dot of two FLOAT[] columns → DOUBLE. list_sum over
    BIGINT promotes to HUGEINT (exact); the BIGINT narrowing before the
    double cast matters — DuckDB's HUGEINT→DOUBLE misrounds some
    negative values, BIGINT→DOUBLE rounds correctly (measured)."""
    term = f"{_sql_ielem(f'{a}[i]')} * {_sql_ielem(f'{b}[i]')}"
    return (
        f"(CAST(CAST(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> {term})) AS BIGINT) AS DOUBLE) / {_SCALE_SQ!r})"
    )


def sql_norm(a: str) -> str:
    return f"sqrt({sql_dot(a, a)})"


def _list_col_matrix(batch, name: str):
    """Arrow list<int64> column of a record batch → N×d int64 NumPy
    matrix. Contract: non-empty batch, NO null entries, uniform dims —
    flatten() drops nulls silently, so a null list would misalign every
    row after it; raise loudly instead (round-11 advice item 2). The
    embeddings sources are non-null by construction, so this is a
    tripwire, not a path."""
    import numpy as np

    col = batch.column(batch.schema.get_field_index(name))
    n = len(col)
    if col.null_count:
        raise ValueError(
            f"_list_col_matrix: column {name!r} has {col.null_count} "
            "null entries; the Arrow vector kernels require non-null "
            "fixed-width lists"
        )
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if flat.shape[0] % n:
        raise ValueError(
            f"_list_col_matrix: column {name!r} is ragged "
            f"({flat.shape[0]} values / {n} rows)"
        )
    return flat.reshape(n, flat.shape[0] // n).astype(np.int64, copy=False)


def arrow_pair_cosine(
    df,
    a: str = "a_sva",
    b: str = "b_sva",
    an: str = "a_nrm",
    bn: str = "b_nrm",
    out: str = "cosine_sim",
):
    """Score joined candidate pairs in Arrow batches (guide §4.2): the
    exact integer dot of the two scaled-long arrays as a NumPy int64
    row-wise product-sum, then the identical float steps the JVM
    :func:`cosine` performs — int64→double (correctly rounded in both),
    ÷ 1e16 (exact power of two times 5^16), ÷ (nrm_a·nrm_b). Integer
    addition is associative and the sum is bounded by the same 2^63
    headroom as the JVM aggregate, so the result is bit-identical to
    the interpreted higher-order-function form it replaces; the per-pair
    cost drops from 64 interpreted lambda evaluations to a vectorized
    batch multiply. The two array columns and the two norm columns are
    consumed (dropped from the output); every other column passes
    through."""
    from pyspark.sql import types as T

    keep_fields = [
        f for f in df.schema.fields if f.name not in (a, b, an, bn)
    ]
    keep = [f.name for f in keep_fields]
    schema = T.StructType(
        keep_fields + [T.StructField(out, T.DoubleType(), True)]
    )

    def score(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            av = _list_col_matrix(batch, a)
            bv = _list_col_matrix(batch, b)
            dots = (av * bv).sum(axis=1, dtype=np.int64)
            anv = batch.column(batch.schema.get_field_index(an)).to_numpy(
                zero_copy_only=False
            )
            bnv = batch.column(batch.schema.get_field_index(bn)).to_numpy(
                zero_copy_only=False
            )
            denom = anv * bnv
            zero = denom == 0.0
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (dots.astype(np.float64) / _SCALE_SQ) / denom
            arrays = [
                batch.column(batch.schema.get_field_index(k)) for k in keep
            ]
            # Spark's Divide yields NULL on a zero divisor (ANSI off);
            # NumPy yields NaN/±inf, which would sort ABOVE every
            # double in a descending top-k — mask zero-norm pairs to
            # null to reproduce the JVM semantics exactly (round-11
            # advice item 3; no zero-norm vector exists in the corpus,
            # so current results are unchanged — oracle-gated).
            yield pa.RecordBatch.from_arrays(
                arrays
                + [
                    pa.array(cos, pa.float64(), mask=zero)
                    if zero.any()
                    else pa.array(cos, pa.float64())
                ],
                keep + [out],
            )

    return df.mapInArrow(score, schema)


def arrow_pair_cosine_selfnorm(
    df, a: str = "a_sva", b: str = "b_sva", out: str = "cosine_sim"
):
    """:func:`arrow_pair_cosine` for pair rows that do NOT carry
    precomputed norm columns: the norms are derived inside the batch
    with the identical float steps :func:`norm` performs on the JVM —
    x² int64 row-sum (exact), int64→double (correctly rounded), ÷ 1e16
    (exact), sqrt — so the result is bit-identical to
    ``cosine(a, b, norm(a), norm(b))`` while removing BOTH the per-pair
    interpreted dot and the per-row interpreted norm pass. Zero-norm
    pairs null out (Spark Divide semantics). The two array columns are
    consumed; every other column passes through."""
    from pyspark.sql import types as T

    keep_fields = [f for f in df.schema.fields if f.name not in (a, b)]
    keep = [f.name for f in keep_fields]
    schema = T.StructType(
        keep_fields + [T.StructField(out, T.DoubleType(), True)]
    )

    def score(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            av = _list_col_matrix(batch, a)
            bv = _list_col_matrix(batch, b)
            dots = (av * bv).sum(axis=1, dtype=np.int64)
            a2 = (av * av).sum(axis=1, dtype=np.int64)
            b2 = (bv * bv).sum(axis=1, dtype=np.int64)
            anrm = np.sqrt(a2.astype(np.float64) / _SCALE_SQ)
            bnrm = np.sqrt(b2.astype(np.float64) / _SCALE_SQ)
            denom = anrm * bnrm
            zero = denom == 0.0
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (dots.astype(np.float64) / _SCALE_SQ) / denom
            arrays = [
                batch.column(batch.schema.get_field_index(k)) for k in keep
            ]
            yield pa.RecordBatch.from_arrays(
                arrays
                + [
                    pa.array(cos, pa.float64(), mask=zero)
                    if zero.any()
                    else pa.array(cos, pa.float64())
                ],
                keep + [out],
            )

    return df.mapInArrow(score, schema)


def arrow_sqdist(df, a: str = "q_sva", b: str = "sva", out: str = "dist"):
    """Exact squared-L2 between two scaled-long array columns of joined
    pair rows, in Arrow batches (guide §4.2): (x−y)² summed row-wise in
    NumPy int64 — elementwise diff ≤ 2·10⁸·‖x‖∞ so the 64-dim sum stays
    exact in 64 bits, the identical bound :func:`_sqdist_col`'s JVM
    aggregate relies on. Integer arithmetic is associative, so the
    result is bit-identical to the interpreted zip_with/aggregate form
    it replaces; per-pair cost drops from 64 interpreted lambda
    evaluations to one vectorized batch subtract-square-sum. The two
    array columns are consumed (dropped from the output); every other
    column passes through."""
    from pyspark.sql import types as T

    keep_fields = [f for f in df.schema.fields if f.name not in (a, b)]
    keep = [f.name for f in keep_fields]
    schema = T.StructType(
        keep_fields + [T.StructField(out, T.LongType(), True)]
    )

    def score(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            av = _list_col_matrix(batch, a)
            bv = _list_col_matrix(batch, b)
            d = av - bv
            dist = (d * d).sum(axis=1, dtype=np.int64)
            arrays = [
                batch.column(batch.schema.get_field_index(k)) for k in keep
            ]
            yield pa.RecordBatch.from_arrays(
                arrays + [pa.array(dist, pa.int64())], keep + [out]
            )

    return df.mapInArrow(score, schema)


def arrow_centroid_argmin(
    df,
    centroids: list[tuple[int, list[int]]],
    sva: str = "sva",
    out_label: str = "part_label",
    out_dist: str = "dist",
    keep_vec: bool = False,
):
    """Nearest-centroid assignment in one Arrow pass (guide §4.2 / §8:
    the centroid table is k×d bounded driver state, so it rides the
    task closure instead of a crossJoin): per batch, k exact int64
    (q−c)² row sums — the same 2⁶³-headroom arithmetic as
    :func:`arrow_sqdist` — then argmin over centroids SORTED BY LABEL,
    which reproduces ``row_number() OVER (ORDER BY dist, label) = 1``
    exactly (NumPy argmin returns the first minimum). Replaces a
    broadcast-crossJoin (N×k rows), k·d interpreted lambda evals per
    vector, and a full window exchange+sort with zero shuffles.
    ``sva`` is consumed unless ``keep_vec``; other columns pass
    through."""
    from pyspark.sql import types as T

    cents = sorted(centroids)
    keep_fields = [
        f
        for f in df.schema.fields
        if keep_vec or f.name != sva
    ]
    keep = [f.name for f in keep_fields]
    schema = T.StructType(
        keep_fields
        + [
            T.StructField(out_label, T.LongType(), True),
            T.StructField(out_dist, T.LongType(), True),
        ]
    )

    def assign(it):
        import numpy as np
        import pyarrow as pa

        labels = np.asarray([c[0] for c in cents], dtype=np.int64)
        cmat = np.asarray([c[1] for c in cents], dtype=np.int64)  # k×d
        for batch in it:
            if batch.num_rows == 0:
                continue
            q = _list_col_matrix(batch, sva)
            dists = np.empty((q.shape[0], cmat.shape[0]), dtype=np.int64)
            for j in range(cmat.shape[0]):
                d = q - cmat[j]
                dists[:, j] = (d * d).sum(axis=1, dtype=np.int64)
            idx = dists.argmin(axis=1)
            best = dists[np.arange(q.shape[0]), idx]
            arrays = [
                batch.column(batch.schema.get_field_index(k)) for k in keep
            ]
            yield pa.RecordBatch.from_arrays(
                arrays
                + [
                    pa.array(labels[idx], pa.int64()),
                    pa.array(best, pa.int64()),
                ],
                keep + [out_label, out_dist],
            )

    return df.mapInArrow(assign, schema)


def arrow_label_moments(df, sva: str = "sva", label: str = "part_label"):
    """Per-(label, dimension) partial sums/counts of scaled-long
    vectors, one Arrow pass: each batch emits ≤ k×d rows of
    (label, pos, s, n) — map-side aggregation for a centroid update
    (guide §2.3, aggregate before the shuffle), replacing a
    posexplode of N×d rows into the exchange. Exact int64 partials
    (elements ≤ 1e8, corpus rows ≪ 2^33); the caller finishes with
    groupBy(label, pos).sum — integer addition is associative, so the
    final sums are bit-identical to the exploded form."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(label, T.LongType(), True),
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("s", T.LongType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )

    def moments(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            v = _list_col_matrix(batch, sva)
            labs = batch.column(
                batch.schema.get_field_index(label)
            ).to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(labs, return_inverse=True)
            k, d = uniq.shape[0], v.shape[1]
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, inv, v)
            cnts = np.bincount(inv, minlength=k).astype(np.int64)
            out_lab = np.repeat(uniq, d)
            out_pos = np.tile(np.arange(d, dtype=np.int32), k)
            out_s = sums.reshape(-1)
            out_n = np.repeat(cnts, d)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_lab, pa.int64()),
                    pa.array(out_pos, pa.int32()),
                    pa.array(out_s, pa.int64()),
                    pa.array(out_n, pa.int64()),
                ],
                [label, "pos", "s", "n"],
            )

    return df.mapInArrow(moments, schema)


def arrow_bucket_norm(df, planes: list[list[int]], sva: str = "sva"):
    """Hyperplane-LSH bucket + Euclidean norm from the scaled-long
    ``sva`` column in one Arrow pass: proj = Q·Wᵀ in int64 (|w| ≤ 15,
    |q| ≤ 1e8, d = 64 → |proj| ≤ 1e11, exact), bucket = Σ 2^p over
    proj_p > 0 — the identical sign rule :func:`lsh_bucket` folds —
    and nrm = sqrt((Q·Q)/1e16), op-for-op :func:`norm`. Replaces
    dims×planes interpreted multiply-adds per row with one batch
    matmul; bit-identical output."""
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("nrm", T.DoubleType(), True),
            T.StructField("bucket", T.IntegerType(), True),
        ]
    )
    names = [f.name for f in df.schema.fields]

    def tag(it):
        import numpy as np
        import pyarrow as pa

        w = np.asarray(planes, dtype=np.int64)  # P×d
        pow2 = (1 << np.arange(w.shape[0])).astype(np.int64)
        for batch in it:
            if batch.num_rows == 0:
                continue
            q = _list_col_matrix(batch, sva)
            proj = q @ w.T
            bucket = ((proj > 0) * pow2).sum(axis=1).astype(np.int32)
            x2 = (q * q).sum(axis=1, dtype=np.int64)
            nrm = np.sqrt(x2.astype(np.float64) / _SCALE_SQ)
            arrays = [
                batch.column(batch.schema.get_field_index(k)) for k in names
            ]
            yield pa.RecordBatch.from_arrays(
                arrays + [pa.array(nrm, pa.float64()), pa.array(bucket)],
                names + ["nrm", "bucket"],
            )

    return df.mapInArrow(tag, schema)


def lsh_bucket(emb_col: Column, planes: list[list[int]]) -> Column:
    """Hyperplane-LSH bucket id in ONE pass over the embedding.

    Eight separate projection expressions would each inline (and
    re-evaluate) the scaled-vector transform — expression trees don't
    share work across siblings. Here a single ``aggregate`` folds over
    element indices once, carrying an array of P partial sums (one per
    plane), and the finish lambda turns the signs into the bucket id.
    Per row: dims × P multiply-adds, every access O(1) (elements are
    indexed from the raw array; the flat weight matrix is a literal).
    Integer arithmetic throughout → deterministic bucket assignment.
    """
    n_planes = len(planes)
    dims = len(planes[0])
    w_flat = F.array(
        *[F.lit(w).cast("long") for row in planes for w in row]
    )  # index p·dims + i (1-based via element_at)
    pow2 = F.array(*[F.lit(1 << p) for p in range(n_planes)])

    def xi(i: Column) -> Column:
        return (
            F.element_at(emb_col, i).cast("double").cast(_ELEM) * F.lit(_SCALE)
        ).cast("long")

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(dims)),
        F.array_repeat(F.lit(0).cast("long"), n_planes),
        lambda acc, i: F.transform(
            acc,
            lambda s, p: s + F.element_at(w_flat, p * dims + i) * xi(i),
        ),
        lambda acc: F.aggregate(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            F.lit(0),
            lambda b, p: b
            + F.when(F.element_at(acc, p + 1) > 0, F.element_at(pow2, p + 1)).otherwise(
                0
            ),
        ),
    )
