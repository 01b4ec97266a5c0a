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
