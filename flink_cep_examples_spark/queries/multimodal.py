"""Multimodal catalog queries: binary payload + typed metadata columns
processed through Arrow-batched ``mapInPandas`` (operators/multimodal).

Oracle strategy: payloads are utf-8 bytes of ASCII text, so DuckDB can
independently reproduce byte counts, md5 digests, frame slices, and the
fake-decode byte statistics with string/char arithmetic — pinning the
Spark binary plumbing end-to-end, numpy feature math included."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_examples_spark.operators.multimodal import (
    FORMATS,
    extract_features,
    media_table,
    resize_media,
    sample_frames,
)
from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.sources.tables import load_table, spread

FRAME_EVERY = 2
RESIZE_W = RESIZE_H = 32

_SQL_FORMAT = (
    "CASE CAST(doc_id % 4 AS INTEGER) "
    + " ".join(f"WHEN {i} THEN '{f}'" for i, f in enumerate(FORMATS))
    + " END"
)


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(spread(load_table(spark, sf_dir, "documents"), "doc_id"))


def mm_media_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media table's typed-metadata projection + payload digest.
    Touches ``meta`` and ``payload`` independently — metadata-only
    consumers never deserialize the bytes."""
    m = _media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.length("payload").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


ORACLE_CATALOG = f"""
SELECT doc_id,
       {_SQL_FORMAT} AS format,
       CAST(16 + doc_id % 64 AS INTEGER) AS width,
       CAST(16 + (doc_id * 7) % 64 AS INTEGER) AS height,
       CAST(1 + doc_id % 8 AS INTEGER) AS n_frames,
       CAST(length(text) AS INTEGER) AS payload_bytes,
       md5(text) AS payload_md5
FROM documents
"""


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-decoded byte features (mean, entropy, 16-bin histogram) via
    Arrow-batched numpy. The fake decode is deterministic byte
    arithmetic, so DuckDB reproduces it exactly: mean = sum(byte)/n is
    exact IEEE (integer-valued partials), the 16-bin histogram is
    integer counts, and entropy terms are quantized to integer
    pico-units before the (exact, order-free) sum so the value is
    bit-identical across engines (round 6 — the old ulp-level
    summation wobble only passed under the retired 6-dp comparator)."""
    return extract_features(_media(spark, sf_dir))


ORACLE_FEATURES = f"""
WITH chars AS (
  SELECT doc_id, ord(substr(text, CAST(i AS INTEGER), 1)) AS b
  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
),
bins AS (
  SELECT doc_id, CAST(b // 16 AS INTEGER) AS bin, count(*) AS c
  FROM chars GROUP BY 1, 2
),
means AS (
  SELECT doc_id, sum(b) * 1.0 / count(*) AS mean_byte FROM chars GROUP BY doc_id
),
ents AS (
  -- fixed-point pico-unit terms: mirrors the Spark kernel's
  -- floor(p*log2(p)*1e12 + 0.5) exactly (order-free integer sum)
  SELECT doc_id,
         -CAST(SUM(CAST(FLOOR((c * 1.0 / n) * log2(c * 1.0 / n) * 1e12
                               + 0.5) AS BIGINT)) AS BIGINT) / 1e12
           AS byte_entropy
  FROM (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM bins)
  GROUP BY doc_id
),
hists AS (
  SELECT d.doc_id,
         string_agg(CAST(coalesce(bn.c, 0) AS VARCHAR), ','
                    ORDER BY g.bin) AS hist16
  FROM (SELECT doc_id FROM documents) d
  CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) g
  LEFT JOIN bins bn ON bn.doc_id = d.doc_id AND bn.bin = g.bin
  GROUP BY d.doc_id
)
SELECT doc.doc_id,
       {_SQL_FORMAT.replace("doc_id", "doc.doc_id")} AS format,
       CAST(length(doc.text) AS INTEGER) AS payload_bytes,
       coalesce(m.mean_byte, 0.0) AS mean_byte,
       coalesce(e.byte_entropy, 0.0) AS byte_entropy,
       h.hist16
FROM documents doc
LEFT JOIN means m ON m.doc_id = doc.doc_id
LEFT JOIN ents e ON e.doc_id = doc.doc_id
JOIN hists h ON h.doc_id = doc.doc_id
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sample of each payload's n_frames equal chunks
    (row-expanding mapInPandas), digest per kept frame."""
    return sample_frames(_media(spark, sf_dir), every=FRAME_EVERY)


ORACLE_FRAMES = f"""
WITH m AS (
  SELECT doc_id, text,
         CAST(1 + doc_id % 8 AS INTEGER) AS n_frames,
         CAST(length(text) // (1 + doc_id % 8) AS INTEGER) AS fsize
  FROM documents
)
SELECT doc_id,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(CASE WHEN fsize > 0 THEN fsize ELSE 0 END AS INTEGER) AS frame_bytes,
       md5(CASE WHEN fsize > 0
                THEN substr(text, i * fsize + 1, fsize) ELSE '' END) AS frame_md5
FROM m, unnest(range(0, n_frames, {FRAME_EVERY})) AS t(i)
"""


def mm_resize_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize every payload to RESIZE_W x RESIZE_H bytes (cyclic-pad/
    truncate stub resize) and digest the result — binary-in/binary-out
    through Arrow verified against DuckDB's string reconstruction."""
    resized = resize_media(_media(spark, sf_dir), RESIZE_W, RESIZE_H)
    return resized.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.length("payload").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


ORACLE_RESIZE = f"""
SELECT doc_id,
       CAST({RESIZE_W} AS INTEGER) AS width,
       CAST({RESIZE_H} AS INTEGER) AS height,
       CAST({RESIZE_W * RESIZE_H} AS INTEGER) AS payload_bytes,
       md5(substr(repeat(text, CAST(ceil({RESIZE_W * RESIZE_H} * 1.0
                                     / length(text)) AS INTEGER)),
                  1, {RESIZE_W * RESIZE_H})) AS payload_md5
FROM documents
"""


register(
    "mm_media_catalog", mm_media_catalog, ORACLE_CATALOG,
    driver=False,  # r5 rotation: driver-verified green r2-r4; slot
    # freed for cep_group_unbounded (new sub-NFA loop feature)
)
register(
    "mm_decode_features", mm_decode_features, ORACLE_FEATURES,
    driver=False,  # r13 rotation: 8 green rounds (r3,r6-r12); pytest-gated now
)
register("mm_frame_sample", mm_frame_sample, ORACLE_FRAMES, driver=False)
register("mm_resize_digest", mm_resize_digest, ORACLE_RESIZE, driver=False,  # r4 rotation: driver-verified green in r2+r3; pytest-gated now
)
