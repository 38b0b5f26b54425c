"""Multimodal column operators: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched pandas pipelines
(``mapInPandas``) — the image/audio/video surface of a training-data
pipeline.

The Spark-side plumbing (schemas, Arrow batch transfer, partitioning,
UDF signatures, batch shapes) is real and tested. The actual media
*decode* is a stub: this environment has no image/audio codecs, so
``decode_media`` either raises ``NotImplementedError`` (real mode) or
produces a deterministic fake "decoded" array derived from the payload
bytes (fake mode, default — reproducible across runs and engines).

Scale design (100 TB mindset):

- Payloads never leave their scan partition until explicitly shuffled:
  every operator here is ``mapInPandas`` (narrow, no shuffle) — the
  expensive bytes stay where they were read, only small feature rows
  flow on.
- Feature extraction is vectorized numpy over Arrow record batches —
  one Python invocation per batch, not per row.
- Metadata is a typed struct column, so Catalyst prunes it
  independently of the payload (a query touching only ``meta.format``
  never deserializes payload bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media formats assigned deterministically by doc_id.
FORMATS = ("png", "jpeg", "wav", "mp4")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("byte_entropy", T.DoubleType()),
        # Comma-joined 16-bucket histogram. A string (not array<long>) so
        # downstream engines/canonicalizers that can't hash array cells —
        # including the driver's pandas-based comparator — handle it.
        T.StructField("hist16", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Fabricate the media table from ``documents`` deterministically:
    payload = utf-8 bytes of the text (an opaque blob as far as every
    operator here is concerned), metadata derived from doc_id. At 100 TB
    this would be a parquet/iceberg table with a real binary column; the
    operators below are agnostic to where the bytes came from."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.element_at(
                F.array(*[F.lit(f) for f in FORMATS]),
                (F.col("doc_id") % len(FORMATS) + 1).cast("int"),
            ).alias("format"),
            (16 + F.col("doc_id") % 64).cast("int").alias("width"),
            (16 + (F.col("doc_id") * 7) % 64).cast("int").alias("height"),
            (1 + F.col("doc_id") % 8).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, fmt: str, *, fake: bool = True) -> np.ndarray:
    """STUB — media decode. Real mode needs codecs (PIL/ffmpeg/soundfile)
    that are not available in this environment; fake mode returns the
    payload bytes as a uint8 array, which is deterministic and exercises
    the identical downstream plumbing (shapes, dtypes, batching)."""
    if not fake:
        raise NotImplementedError(
            f"real {fmt} decode requires media codecs not present here; "
            "use fake=True (deterministic byte-array decode)"
        )
    return np.frombuffer(payload, dtype=np.uint8)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column:
    byte-level stats standing in for image/audio features. One numpy
    pass per Arrow batch; no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                arr = decode_media(payload, meta["format"])
                if arr.size:
                    hist = np.bincount(arr >> 4, minlength=16).astype("int64")
                    p = hist / arr.size
                    nz = p[p > 0]
                    entropy = float(-(nz * np.log2(nz)).sum())
                    mean = float(arr.mean())
                else:
                    hist = np.zeros(16, dtype="int64")
                    entropy = 0.0
                    mean = 0.0
                out.append(
                    (
                        doc_id,
                        meta["format"],
                        arr.size,
                        mean,
                        entropy,
                        ",".join(map(str, hist)),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling for multi-frame media: split the payload into
    ``meta.n_frames`` equal chunks, keep every ``every``-th, emit one
    row per kept frame (md5 + size). Row-expanding mapInPandas — the
    UDTF shape of the multimodal surface."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                n = max(int(meta["n_frames"]), 1)
                size = len(payload) // n
                for i in range(0, n, every):
                    frame = payload[i * size : (i + 1) * size] if size else b""
                    rows.append(
                        (
                            doc_id,
                            i,
                            len(frame),
                            hashlib.md5(frame).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return media.mapInPandas(batches, FRAME_SCHEMA)


def resize_media(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize plumbing: emit a payload of exactly width*height bytes
    (truncate / cyclic-pad the fake-decoded array — a real resize would
    interpolate pixels here) with updated metadata. Binary-in →
    binary-out through Arrow, the shape a thumbnailing pipeline needs."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            out_payload = []
            out_meta = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                arr = decode_media(payload, meta["format"])
                if arr.size == 0:
                    resized = np.zeros(target, dtype=np.uint8)
                else:
                    reps = -(-target // arr.size)
                    resized = np.tile(arr, reps)[:target]
                out_payload.append(resized.tobytes())
                out_meta.append(
                    {
                        "format": meta["format"],
                        "width": width,
                        "height": height,
                        "n_frames": meta["n_frames"],
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)
