"""Multimodal (image/audio/video) column processing.

Media is carried as opaque ``binary`` payload columns with typed metadata
— the layout a 100 TB training-data lake uses (parquet binary + column
stats; large blobs can be externalized to object-store pointers without
changing this API). All processing runs as **Arrow-batched
``mapInPandas``** stages: executors stream record batches through a
pandas function, nothing ever touches the driver, and batch size is
governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

Codec status: **PPM (P6) images, WAV (PCM16) audio and Y4M (YUV4MPEG2)
video all decode for real, pure-Python/numpy** (no external codec
library needed — each is a text header + raw samples: RGB bytes, PCM16
frames, C420 planes). Compressed formats (JPEG/PNG/H.264/MP3/…) still
need libraries not present in this container (PIL/cv2/librosa/av), so
:func:`decode_image` / :func:`extract_audio_features` /
:func:`sample_video_frames` dispatch on the magic number: supported
container formats decode for real, everything else raises
``NotImplementedError``.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# Real codecs: PPM (P6) images, WAV (PCM16) audio — pure Python/numpy
# ---------------------------------------------------------------------------
def encode_ppm(width: int, height: int, pixels: np.ndarray) -> bytes:
    """Encode an RGB image as binary PPM (P6): ASCII header
    ``P6\\n<w> <h>\\n255\\n`` followed by ``3·w·h`` raw bytes in
    row-major R,G,B order."""
    px = np.asarray(pixels, dtype=np.uint8).reshape(-1)
    if px.size != 3 * width * height:
        raise ValueError(f"expected {3 * width * height} bytes, got {px.size}")
    return f"P6\n{width} {height}\n255\n".encode("ascii") + px.tobytes()


def decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a binary PPM (P6) payload to ``(width, height, HxWx3 uint8)``.

    Full header grammar: magic ``P6``, then three whitespace-separated
    ASCII integers (width, height, maxval ≤ 255), ``#`` comments allowed
    between tokens, exactly ONE whitespace byte after maxval, then raw
    sample data. Real parser, not a stub — no image library required
    because P6 stores uncompressed bytes.
    """
    if payload[:2] != b"P6":
        raise NotImplementedError(
            "only PPM (P6) images decode without PIL/cv2; got magic "
            f"{payload[:2]!r}"
        )
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        # skip whitespace and comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if start == pos:
            raise ValueError(f"bad PPM header near byte {pos}")
        vals.append(int(payload[start:pos]))
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pos += 1  # exactly one whitespace byte after maxval
    data = np.frombuffer(payload, dtype=np.uint8, count=3 * w * h, offset=pos)
    return w, h, data.reshape(h, w, 3)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode mono int16 samples as a canonical 44-byte-header WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a WAV payload to ``(sample_rate, int16 samples)`` via the
    stdlib ``wave`` parser (RIFF chunk walk — handles any chunk layout,
    not just the canonical 44-byte header)."""
    if payload[:4] != b"RIFF":
        raise NotImplementedError(
            "only WAV (RIFF) audio decodes without librosa; got magic "
            f"{payload[:4]!r}"
        )
    with wave.open(io.BytesIO(payload), "rb") as wv:
        if wv.getnchannels() != 1 or wv.getsampwidth() != 2:
            raise ValueError("only mono PCM16 supported")
        sr = wv.getframerate()
        n = wv.getnframes()
        data = np.frombuffer(wv.readframes(n), dtype="<i2")
    return sr, data


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to HxWx3 uint8. PPM (P6) decodes for real
    (pure numpy); compressed formats (JPEG/PNG) would need PIL/cv2 and
    raise ``NotImplementedError``."""
    _, _, arr = decode_ppm(payload)  # raises NotImplementedError on non-P6
    return arr


def encode_y4m(
    width: int,
    height: int,
    frames: "list[np.ndarray]",
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Encode raw YUV420 frames as Y4M (YUV4MPEG2) — the uncompressed
    video container (plain-text stream header, ``FRAME\\n`` markers,
    raw planes): Y is w×h bytes, U and V are (w/2)×(h/2) each."""
    if width % 2 or height % 2:
        raise ValueError("C420 needs even dimensions")
    frame_len = width * height * 3 // 2
    out = [
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
        f"Ip A0:0 C420jpeg\n".encode("ascii")
    ]
    for fr in frames:
        raw = np.asarray(fr, dtype=np.uint8).reshape(-1)
        if raw.size != frame_len:
            raise ValueError(f"expected {frame_len} bytes/frame, got {raw.size}")
        out.append(b"FRAME\n")
        out.append(raw.tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[int, int, tuple[int, int], "list[np.ndarray]"]:
    """Decode a Y4M payload to ``(width, height, (fps_n, fps_d),
    [frame bytes …])`` — real container parse: stream-header token
    grammar (W/H/F/I/A/C parameters), per-frame ``FRAME`` markers with
    optional parameters, raw C420 plane math. No video library needed
    because Y4M stores uncompressed planes."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise NotImplementedError(
            "only Y4M (YUV4MPEG2) video decodes without av/cv2; got magic "
            f"{payload[:9]!r}"
        )
    eol = payload.index(b"\n")
    w = h = None
    fps = (25, 1)
    for tok in payload[9:eol].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = (int(num), int(den))
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    frame_len = w * h * 3 // 2
    frames = []
    pos = eol + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1  # frame params allowed
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=frame_len, offset=pos)
        )
        pos += frame_len
    return w, h, fps, frames


def sample_video_frames(payload: bytes, every_n: int = 30) -> "list[np.ndarray]":
    """Sample every-nth frame from a video payload. Y4M decodes for
    REAL (container parse + raw planes); compressed codecs (H.264/VP9)
    would need av/cv2 and raise ``NotImplementedError``."""
    _, _, _, frames = decode_y4m(payload)  # raises on non-Y4M magic
    return frames[::every_n]


def extract_audio_features(payload: bytes, sr: int = 16000) -> dict:
    """Deterministic audio features from a WAV payload: sample count,
    rate, min/max/sum and energy (sum of squares, exact in int64).
    Spectral features (MFCC) would need librosa; WAV framing + PCM
    decode + time-domain features are real."""
    rate, samples = decode_wav_pcm16(payload)  # raises on non-RIFF
    s = samples.astype(np.int64)
    return {
        "sample_rate": rate,
        "n_samples": int(s.size),
        "s_min": int(s.min()) if s.size else None,
        "s_max": int(s.max()) if s.size else None,
        "s_sum": int(s.sum()),
        "s_sumsq": int((s * s).sum()),
    }


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


# ---------------------------------------------------------------------------
# Synthetic media generation + REAL decode stats (PPM / WAV)
# ---------------------------------------------------------------------------
#: Output schema of :func:`ppm_decode_stats`.
PPM_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("pixel_sum", T.LongType()),
        T.StructField("px_min", T.LongType()),
        T.StructField("px_max", T.LongType()),
        T.StructField("r_sum", T.LongType()),
    ]
)

#: Output schema of :func:`wav_decode_stats`.
WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("s_min", T.LongType()),
        T.StructField("s_max", T.LongType()),
        T.StructField("s_sum", T.LongType()),
        T.StructField("s_sumsq", T.LongType()),
    ]
)

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def synth_ppm_payload(doc_id: int) -> bytes:
    """Deterministic synthetic image: ``w = 4 + id%5``, ``h = 3 + id%4``,
    byte ``i`` of the raster = ``(id + i) % 256`` — closed form both
    engines can recompute, so decode output is oracle-checkable."""
    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    px = (doc_id + np.arange(3 * w * h, dtype=np.int64)) % 256
    return encode_ppm(w, h, px)


def synth_wav_payload(doc_id: int) -> bytes:
    """Deterministic synthetic audio: ``n = 50 + id%50`` samples at
    8 kHz, sample ``k`` = ``(id·7 + k·13) % 2001 − 1000`` (int16)."""
    n = 50 + doc_id % 50
    k = np.arange(n, dtype=np.int64)
    samples = (doc_id * 7 + k * 13) % 2001 - 1000
    return encode_wav_pcm16(samples, 8000)


def synth_y4m_payload(doc_id: int) -> bytes:
    """Deterministic synthetic video: even dims ``w = 4 + 2·(id%3)``,
    ``h = 4 + 2·(id%2)``, ``nf = 2 + id%4`` frames; byte ``j`` of frame
    ``f`` = ``(id + 7·f + j) % 256`` over the w·h·3/2 C420 payload."""
    w, h = 4 + 2 * (doc_id % 3), 4 + 2 * (doc_id % 2)
    nf = 2 + doc_id % 4
    frame_len = w * h * 3 // 2
    j = np.arange(frame_len, dtype=np.int64)
    frames = [(doc_id + 7 * f + j) % 256 for f in range(nf)]
    return encode_y4m(w, h, frames)


def synth_media(df: DataFrame, kind: str, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas stage: id → (id, encoded media payload). The payload
    crosses an Arrow boundary as a true ``binary`` column, so the decode
    stage downstream exercises the same path real media bytes take."""
    fn = {
        "ppm": synth_ppm_payload,
        "wav": synth_wav_payload,
        "y4m": synth_y4m_payload,
    }[kind]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [fn(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(gen, PAYLOAD_SCHEMA)


def ppm_decode_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode in an Arrow-batched stage: parse each PPM
    header (ASCII grammar incl. comments), reinterpret the raster with
    numpy, emit per-image pixel statistics. Shuffle-free, partition
    parallel — the 100 TB decode template with an actual codec in it."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                w, h, arr = decode_ppm(raw)
                flat = arr.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(did),
                        w,
                        h,
                        len(raw),
                        int(flat.sum()),
                        int(flat.min()),
                        int(flat.max()),
                        int(arr[:, :, 0].astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_bytes",
                    "pixel_sum",
                    "px_min",
                    "px_max",
                    "r_sum",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, PPM_STATS_SCHEMA)


def resize_nearest(arr: np.ndarray, factor: int = 2) -> np.ndarray:
    """Nearest-neighbor downsample of an (h, w, 3) raster by integer
    ``factor`` (keep every factor-th row/column starting at 0) — the
    dependency-free resize kernel; swap in PIL/cv2 interpolation at the
    same call site when those libs exist."""
    return arr[::factor, ::factor, :]


PPM_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("in_w", T.LongType()),
        T.StructField("in_h", T.LongType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("out_pixel_sum", T.LongType()),
        T.StructField("out_px_min", T.LongType()),
        T.StructField("out_px_max", T.LongType()),
    ]
)


def ppm_resize_stats(
    df: DataFrame,
    factor: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode → RESIZE (nearest-neighbor ÷factor) → stats, all in one
    Arrow-batched shuffle-free stage — the thumbnail/preprocess step of
    an image-corpus pipeline, with the real parser and a real numpy
    resample (no stub)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, arr = decode_ppm(bytes(p))
                small = resize_nearest(arr, factor)
                flat = small.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        int(did),
                        w,
                        h,
                        small.shape[1],
                        small.shape[0],
                        int(flat.sum()),
                        int(flat.min()),
                        int(flat.max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in PPM_RESIZE_SCHEMA])

    return df.select(id_col, payload_col).mapInPandas(
        kernel, PPM_RESIZE_SCHEMA
    )


#: Output schema of :func:`y4m_frame_sample_stats` — one row per
#: SAMPLED frame.
Y4M_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("y_sum", T.LongType()),
        T.StructField("uv_sum", T.LongType()),
    ]
)


def y4m_frame_sample_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 2,
) -> DataFrame:
    """REAL video decode + frame sampling in one Arrow stage: each Y4M
    payload is container-parsed, every ``every_n``-th frame's luma and
    chroma plane sums are emitted — a cardinality-EXPANDING stage whose
    per-frame rows are exactly what a downstream vision featurizer
    partitions on (replaces the round-1 digest-fake frame sampler with
    an actual parser)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                w, h, _fps, frames = decode_y4m(raw)
                y_len = w * h
                for f_idx in range(0, len(frames), every_n):
                    fr = frames[f_idx].astype(np.int64)
                    rows.append(
                        (
                            int(did),
                            w,
                            h,
                            len(frames),
                            len(raw),
                            f_idx,
                            int(fr[:y_len].sum()),
                            int(fr[y_len:].sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_frames",
                    "n_bytes",
                    "frame_idx",
                    "y_sum",
                    "uv_sum",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, Y4M_FRAME_SCHEMA)


def wav_decode_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL audio decode in an Arrow-batched stage: stdlib ``wave`` RIFF
    parse + PCM16 numpy reinterpret per payload, emitting time-domain
    statistics (energy as exact int64 sum of squares)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                feats = extract_audio_features(raw)
                rows.append(
                    (
                        int(did),
                        feats["sample_rate"],
                        feats["n_samples"],
                        len(raw),
                        feats["s_min"],
                        feats["s_max"],
                        feats["s_sum"],
                        feats["s_sumsq"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "n_bytes",
                    "s_min",
                    "s_max",
                    "s_sum",
                    "s_sumsq",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, WAV_STATS_SCHEMA)


def ppm_phash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual AVERAGE HASH from REAL PPM decode (Arrow-batched,
    shuffle-free): per pixel, grayscale = R+G+B from the decoded
    raster; bit p set iff gray_p · n_pixels > Σ gray (strictly above
    the image mean, integer cross-multiplied); bits fold into one
    ≤48-bit integer. Images sharing (phash, w, h) are perceptual
    duplicates — the image-modality analogue of a MinHash band key."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("w", T.LongType()),
            T.StructField("h", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, arr = decode_ppm(bytes(p))
                px = arr.reshape(-1, 3).astype(np.int64)
                gray = px.sum(axis=1)
                total = int(gray.sum())
                npix = w * h
                if npix > 63:
                    # bits << arange(npix) overflows int64 past bit 62,
                    # silently colliding hashes — enforce the ≤48-bit
                    # contract instead (real pipelines average-pool the
                    # raster down to 8×8 BEFORE hashing; this operator
                    # hashes the raw raster and so owns the guard).
                    raise ValueError(
                        f"ppm_phash: {w}x{h} raster has {npix} pixels; "
                        "the fold supports at most 63 (contract: <=48). "
                        "Downsample the raster before hashing."
                    )
                bits = (gray * npix > total).astype(np.int64)
                ph = int((bits << np.arange(npix, dtype=np.int64)).sum())
                rows.append((int(did), w, h, ph))
            yield pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "phash"]
            )

    return df.mapInPandas(kernel, schema)


_WAV_FP_FRAME = 10  # samples per energy frame


def wav_fingerprint(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Energy-delta audio fingerprint from REAL WAV decode
    (Arrow-batched, shuffle-free): the PCM16 stream is cut into
    ``_WAV_FP_FRAME``-sample frames (tail samples dropped), each
    frame's energy is the exact int64 sum of squares, and bit ``f`` of
    the fingerprint is set iff ``energy[f+1] > energy[f]`` — the
    sign-of-energy-delta code that makes the fingerprint invariant to
    uniform gain (scaling every sample scales every energy, preserving
    the comparisons), the same robustness idea as Haitsma-Kalker /
    Shazam band-energy fingerprints, collapsed to one band.

    Output: (doc_id, sample_rate, n_frames, afp). Audio sharing
    (sample_rate, n_frames, afp) are near-identical recordings; the
    Hamming-radius query on top catches re-encodes that flip a few
    energy comparisons. The audio analogue of ``ppm_phash``.
    """
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sample_rate", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("afp", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                sr, samples = decode_wav_pcm16(bytes(p))
                s = samples.astype(np.int64)
                nf = len(s) // _WAV_FP_FRAME
                if nf - 1 > 63:
                    raise ValueError(
                        f"wav_fingerprint: {nf} frames need {nf - 1} "
                        "bits; the fold supports at most 63. Use wider "
                        "frames."
                    )
                e = (
                    s[: nf * _WAV_FP_FRAME]
                    .reshape(nf, _WAV_FP_FRAME)
                    .__pow__(2)
                    .sum(axis=1)
                )
                bits = (e[1:] > e[:-1]).astype(np.int64)
                afp = int((bits << np.arange(nf - 1, dtype=np.int64)).sum())
                rows.append((int(did), int(sr), int(nf), afp))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_frames", "afp"],
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)


def y4m_frame_phash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-FRAME luma average-hash from REAL Y4M decode (Arrow-batched,
    shuffle-free): each C420 frame's Y plane (the first w·h bytes)
    hashes to one ≤48-bit integer — bit j set iff ``Y_j · npix >
    Σ Y`` (strictly above the frame's luma mean, integer
    cross-multiplied). One output row per (video, frame_idx).

    This is the video-modality fingerprint at FRAME granularity — the
    unit video copy-detection systems index, because near-duplicate
    videos (re-encodes, trims, intro/outro edits) share frame hashes
    without sharing a whole-file hash. The near-dup query on top
    joins videos on shared DISCRIMINATIVE frame hashes (df-capped:
    viral boilerplate frames — black frames, intro cards — collide
    across thousands of videos and carry no signal)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("w", T.LongType()),
            T.StructField("h", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("fhash", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                w, h, _fps, frames = decode_y4m(bytes(p))
                npix = w * h
                if npix > 63:
                    raise ValueError(
                        f"y4m_frame_phash: {w}x{h} luma plane has "
                        f"{npix} pixels; the fold supports at most 63 "
                        "(contract: <=48). Downsample frames first."
                    )
                for f, fr in enumerate(frames):
                    y = np.frombuffer(fr, dtype=np.uint8, count=npix).astype(
                        np.int64
                    )
                    s = int(y.sum())
                    bits = (y * npix > s).astype(np.int64)
                    fh = int((bits << np.arange(npix, dtype=np.int64)).sum())
                    rows.append(
                        (int(did), w, h, len(frames), f, fh)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "w", "h", "n_frames", "frame_idx", "fhash",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
