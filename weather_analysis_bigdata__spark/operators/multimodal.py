"""Multimodal (image/audio/video) column processing.

Media is carried as opaque ``binary`` payload columns with typed metadata
— the layout a 100 TB training-data lake uses (parquet binary + column
stats; large blobs can be externalized to object-store pointers without
changing this API). All processing runs as **Arrow-batched
``mapInPandas``** stages: executors stream record batches through a
pandas function, nothing ever touches the driver, and batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual codec work (image decode / resize, audio feature extraction,
video frame sampling) needs libraries not present in this container
(PIL/cv2/librosa/av), so the decode kernels are STUBS behind
``NotImplementedError`` — but the Spark-side plumbing (schemas, UDF
signatures, batch iteration, partition parallelism) is real and tested
via the deterministic metadata extractor.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Output schema of :func:`extract_binary_metadata`.
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        T.StructField("fake_width", T.LongType()),
        T.StructField("fake_height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to HxWxC uint8. STUB: PIL/cv2 are not
    available in this container."""
    raise NotImplementedError(
        "image decode requires PIL or cv2 (not installed); "
        "use extract_binary_metadata for the tested plumbing path"
    )


def sample_video_frames(payload: bytes, every_n: int = 30) -> "list[object]":
    """Sample every-nth frame from a video payload. STUB: av/cv2 missing."""
    raise NotImplementedError("video decode requires av or cv2 (not installed)")


def extract_audio_features(payload: bytes, sr: int = 16000) -> "object":
    """MFCC-style features from an audio payload. STUB: librosa missing."""
    raise NotImplementedError("audio decode requires librosa (not installed)")


def _metadata_batches(
    batches: Iterator[pd.DataFrame], id_col: str, payload_col: str
) -> Iterator[pd.DataFrame]:
    """Deterministic per-batch metadata: byte length, sha256, and fake
    decode dimensions derived from the digest (stands in for the real
    decoder so the batch shape / schema contract is exercised)."""
    for pdf in batches:
        payloads = pdf[payload_col]
        digests = [hashlib.sha256(bytes(p)).hexdigest() for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": payloads.map(len).astype("int64"),
                "content_sha256": digests,
                "fake_width": [16 + int(h[0:2], 16) % 240 for h in digests],
                "fake_height": [16 + int(h[2:4], 16) % 240 for h in digests],
                "n_frames": [1 + int(h[4:6], 16) % 8 for h in digests],
            }
        )


def extract_binary_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary payload column.

    One ``mapInPandas`` stage: no shuffle, no driver transfer; each
    executor partition streams its record batches through pandas. At
    100 TB this is the decode/feature-extract template — swap the
    metadata kernel for a real codec and the plan shape is unchanged.
    """
    return df.select(id_col, payload_col).mapInPandas(
        lambda it: _metadata_batches(it, id_col, payload_col), METADATA_SCHEMA
    )


#: Output schema of :func:`sample_frames_stub` — one row per sampled frame.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def _frame_batches(
    batches: Iterator[pd.DataFrame], id_col: str, payload_col: str, every_n: int
) -> Iterator[pd.DataFrame]:
    """1→N row expansion inside an Arrow stage: each payload yields one
    row per sampled frame. The frame 'decode' is a deterministic fake
    (digest of payload + frame index) standing in for the codec; the
    cardinality-changing batch contract is the real thing being tested."""
    for pdf in batches:
        ids: list[int] = []
        idxs: list[int] = []
        shas: list[str] = []
        for did, p in zip(pdf[id_col], pdf[payload_col]):
            raw = bytes(p)
            h = hashlib.sha256(raw).hexdigest()
            n_frames = 1 + int(h[4:6], 16) % 8
            for i in range(0, n_frames, every_n):
                ids.append(int(did))
                idxs.append(i)
                shas.append(hashlib.sha256(raw + str(i).encode()).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "ts_ms": pd.Series([i * 33 for i in idxs], dtype="int64"),
                "frame_sha256": shas,
            }
        )


def sample_frames_stub(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 2,
) -> DataFrame:
    """Video frame sampling as a cardinality-EXPANDING mapInPandas stage.

    Real frame sampling (av/cv2) plugs into `_frame_batches` without
    touching the plan: still one shuffle-free Arrow stage whose output
    rows outnumber its input rows — the shape that matters for sizing
    downstream partitions (a 1 h video at every-30th-frame is ~3600
    rows from one input row; `repartition` AFTER this stage, not before).
    """
    return df.select(id_col, payload_col).mapInPandas(
        lambda it: _frame_batches(it, id_col, payload_col, every_n), FRAME_SCHEMA
    )


#: Output schema of :func:`arrow_byte_stats`.
BYTESTATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def arrow_byte_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Byte-level payload stats via ``mapInArrow`` — the zero-pandas
    Arrow path.

    mapInPandas converts every batch through pandas (object boxing for
    binary columns); ``mapInArrow`` hands the raw RecordBatch to Python,
    so byte-level kernels (codec sniffing, magic-number checks, frame
    header parsing) can run on buffers directly — here via
    ``np.frombuffer`` per payload, no per-byte Python loop. Same
    shuffle-free single-stage plan as the pandas variants.
    """
    import numpy as np
    import pyarrow as pa

    def kernel(batches):
        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1).to_pylist()
            n = [len(p) for p in payloads]
            fb = [p[0] if len(p) > 0 else None for p in payloads]
            bs = [
                int(np.frombuffer(p, dtype=np.uint8).sum()) if len(p) else 0
                for p in payloads
            ]
            yield pa.record_batch(
                [
                    ids,
                    pa.array(n, pa.int64()),
                    pa.array(fb, pa.int64()),
                    pa.array(bs, pa.int64()),
                ],
                names=["doc_id", "n_bytes", "first_byte", "byte_sum"],
            )

    return df.select(id_col, payload_col).mapInArrow(kernel, BYTESTATS_SCHEMA)
