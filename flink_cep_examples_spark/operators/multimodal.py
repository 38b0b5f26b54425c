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
    """Media decode. Fake mode (default — this sandbox ships no codecs)
    returns the payload bytes as a uint8 array: deterministic,
    oracle-stable, and it exercises the identical downstream plumbing
    (shapes, dtypes, batching).

    Real mode (``fake=False``) attempts the optional codec import at
    call time — PIL for png/jpeg (decoded to a flat grayscale uint8
    array), soundfile for wav (int16 samples requantized to uint8) —
    and raises ``NotImplementedError`` when the codec is absent or the
    format has no bundled decoder (mp4 needs ffmpeg). Downstream
    operators are agnostic: both modes yield a flat uint8 array."""
    if fake:
        return np.frombuffer(payload, dtype=np.uint8)
    import io

    if fmt in ("png", "jpeg"):
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                f"real {fmt} decode requires PIL, not installed here; "
                "use fake=True (deterministic byte-array decode)"
            ) from exc
        img = Image.open(io.BytesIO(payload))
        return np.asarray(img.convert("L"), dtype=np.uint8).ravel()
    if fmt == "wav":
        try:
            import soundfile
        except ImportError as exc:
            raise NotImplementedError(
                "real wav decode requires soundfile, not installed here; "
                "use fake=True (deterministic byte-array decode)"
            ) from exc
        data, _rate = soundfile.read(io.BytesIO(payload), dtype="int16")
        samples = np.asarray(data, dtype=np.int32).ravel()
        return ((samples + 32768) >> 8).astype(np.uint8)
    raise NotImplementedError(
        f"real {fmt} decode has no bundled decoder (video needs ffmpeg); "
        "use fake=True (deterministic byte-array decode)"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column:
    byte-level stats standing in for image/audio features. The stats
    are computed ACROSS the whole Arrow batch in numpy (round 4): the
    decoded buffers are concatenated once, per-doc 16-bucket nibble
    histograms come from one segmented ``bincount`` over
    ``doc_index*16 + nibble``, byte sums from one weighted
    ``bincount`` — no per-row numpy calls. Only the (stub) decode is
    inherently per-item. No shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    columns=[f.name for f in FEATURE_SCHEMA.fields]
                )
                continue
            decoded = [
                decode_media(p, m["format"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            lens = np.fromiter(
                (a.size for a in decoded), dtype=np.int64, count=n
            )
            concat = (
                np.concatenate(decoded)
                if lens.sum()
                else np.empty(0, dtype=np.uint8)
            )
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
            # one segmented bincount at byte resolution feeds BOTH the
            # nibble histogram (fold 16:1) and the exact byte sums
            # (dot with 0..255) — measured ~30% over the per-row loop
            # and over separate hist + weighted-bincount passes
            h256 = np.bincount(
                doc_idx * 256 + concat, minlength=n * 256
            ).reshape(n, 256)
            hist = h256.reshape(n, 16, 16).sum(axis=2)
            sums = h256 @ np.arange(256, dtype=np.float64)
            safe_len = np.maximum(lens, 1)
            mean = np.where(lens > 0, sums / safe_len, 0.0)
            p = hist / safe_len[:, None]
            logs = np.log2(p, out=np.zeros_like(p), where=p > 0)
            # entropy terms quantized to integer pico-units before the
            # sum: the per-term p·log2(p) is transcendental (numpy and
            # DuckDB log2 may differ by an ulp) and float summation is
            # order-sensitive — flooring each term at 1e-12 and summing
            # the (exactly representable) integers makes the value
            # bit-identical to the oracle's mirrored fixed-point fold
            # (same discipline as queries/curation.py, round 6)
            tq = np.floor((p * logs) * 1e12 + 0.5)
            entropy = np.where(lens > 0, -tq.sum(axis=1) / 1e12, 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "format": [m["format"] for m in pdf["meta"]],
                    "payload_bytes": lens.astype("int32"),
                    "mean_byte": mean,
                    "byte_entropy": entropy,
                    "hist16": [",".join(map(str, row)) for row in hist],
                }
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
