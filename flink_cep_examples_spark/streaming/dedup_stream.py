"""Streaming deduplication: the ingest-time twin of the batch dedup
catalog (queries/dedup.py). A training-data pipeline dedups records as
they arrive — state cannot grow forever, so uniqueness is enforced
within the watermark horizon via Spark's
``dropDuplicatesWithinWatermark`` (first occurrence wins; the key's
state is dropped once the watermark passes its event time + delay).

Scale notes (100 TB mindset):

- State is keyed by the dedup key only (a 32-byte md5 for content
  dedup), never the payload, and is bounded by the watermark horizon —
  at 1000 executors this is the same per-key hash state as a streaming
  aggregation, sharded by the shuffle on the key.
- Content keying hashes scan-side (JVM ``md5``), so the exchange
  carries the digest, not the document body.
- Exactly the same first-occurrence contract as batch
  ``dropDuplicates`` on the key — pinned by the agreement test
  (tests/test_streaming_dedup.py) — EXCEPT that two occurrences more
  than ``watermark_delay`` apart are both kept (state already aged
  out). That horizon is the documented streaming-dedup trade-off, not
  a bug; batch remains the global-dedup path.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    event_time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """First-occurrence exact dedup on ``key_cols`` within the
    watermark horizon."""
    return df.withWatermark(
        event_time_col, watermark_delay
    ).dropDuplicatesWithinWatermark(list(key_cols))


def dedup_content_stream(
    df: DataFrame,
    content_col: str = "text",
    event_time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Content dedup: key = md5(content), computed scan-side so the
    dedup shuffle ships the 32-byte digest, not the payload."""
    keyed = df.withColumn("content_key", F.md5(F.col(content_col)))
    return dedup_exact_stream(
        keyed, ["content_key"], event_time_col, watermark_delay
    )


# ---------------------------------------------------------------------------
# Round 4: watermark-bounded MinHash-band near-dup detection — the
# streaming twin of queries/dedup.py dedup_minhash_lsh.
# ---------------------------------------------------------------------------

DETECTION_SCHEMA = "band_key string, dup_id long, dup_ts timestamp, owner_id long"

_STATE_SCHEMA = "owner_id long, owner_ts long"


def minhash_band_keys_udf():
    """Vectorized scalar UDF: text → the 8 LSH band keys, reproducing
    the batch pipeline's exact arithmetic (queries/dedup.py
    ``_shingle_hashes`` / ``_minhash_signatures`` / band md5) so the
    streaming and batch paths bucket identically — pinned by
    tests/test_streaming_dedup.py. Scan-side and stateless: in batch
    the signature is a groupBy over exploded shingles (map-side
    combinable — right for a full-corpus pass); at ingest each doc's
    signature must be complete before the stateful bucket scan, and a
    pre-stateful streaming aggregation would hold rows until watermark
    close, so the signature is computed per document inside the scan.

    Cost note (honest trade): the md5 token hashing here is per-row
    Python — unavoidable if streaming keys must equal the batch keys
    bit-for-bit, since the batch path's md5/`conv` arithmetic has no
    vectorized numpy equivalent. The work is O(tokens) per document
    exactly like the batch JVM path, arrives pre-shuffle, and scales
    out with input partitions; swap in a cheaper non-md5 hash family
    on BOTH paths if ingest CPU ever dominates."""
    import hashlib
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from flink_cep_examples_spark.queries.dedup import (
        BANDS,
        C1,
        C2,
        MINHASH_AB,
        P,
        ROWS_PER_BAND,
    )

    nonword = re.compile(r"[^a-z0-9 ]")
    spaces = re.compile(r" +")

    def h31(tok: str) -> int:
        return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16) % P

    def keys_for(text: str) -> list[str]:
        norm = spaces.sub(" ", nonword.sub("", (text or "").lower())).strip()
        h = [h31(t) for t in norm.split(" ")]
        n = len(h)
        hs = [
            (h[i] * C1
             + (h[i + 1] if i + 1 < n else 0) * C2
             + (h[i + 2] if i + 2 < n else 0)) % P
            for i in range(n)
        ]
        mh = [min((a * x + b) % P for x in hs) for a, b in MINHASH_AB]
        return [
            hashlib.md5(
                ",".join(
                    map(str, [bi, *mh[bi * ROWS_PER_BAND:(bi + 1) * ROWS_PER_BAND]])
                ).encode("utf-8")
            ).hexdigest()
            for bi in range(BANDS)
        ]

    @pandas_udf("array<string>")
    def band_keys(texts: pd.Series) -> pd.Series:
        return texts.map(keys_for)

    return band_keys


def dedup_minhash_band_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming near-duplicate DETECTION: emit one row per (arriving
    doc, colliding LSH band bucket) where the bucket already has an
    owner inside the watermark horizon — ``(band_key, dup_id, dup_ts,
    owner_id)``. A doc appearing as ``dup_id`` in >= 1 detection is a
    near-dup candidate of its bucket owner (the standard >=1-band LSH
    candidate rule); docs emitting nothing are novel.

    Scale shape: band keys are computed scan-side (Arrow kernel,
    identical arithmetic to the batch signatures), so the one shuffle
    ships (32-byte band key, id, ts) — never text. State is one
    (owner_id, owner_ts) pair per DISTINCT band bucket within the
    horizon, purged by an event-time timeout — the same bound as a
    streaming aggregation keyed by bucket. Within a micro-batch, rows
    order by (ts, id) before the ownership scan, so replaying a corpus
    through ``availableNow`` reproduces the batch candidate pairs
    exactly (agreement test)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    exploded = (
        docs.withColumn("__bk", F.explode(minhash_band_keys_udf()(F.col(text_col))))
        .select(
            F.col("__bk").alias("band_key"),
            F.col(id_col).alias("dup_id"),
            F.col(event_time_col).alias("dup_ts"),
        )
        .withWatermark("dup_ts", watermark_delay)
    )

    def scan(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["dup_ts", "dup_id"], kind="mergesort")
        owner_id, owner_ts = state.get() if state.exists else (None, None)
        out = []
        for _, r in rows.iterrows():
            ts_us = int(r["dup_ts"].value // 1000)
            if owner_id is None:
                owner_id, owner_ts = int(r["dup_id"]), ts_us
            else:
                out.append((key[0], int(r["dup_id"]), r["dup_ts"], owner_id))
        state.update((owner_id, owner_ts))
        # purge when the watermark passes the bucket's latest activity
        # (the watermark already lags real time by watermark_delay, so
        # this holds the bucket for exactly the horizon)
        state.setTimeoutTimestamp(
            int(rows["dup_ts"].max().value // 1_000_000) + 1
        )
        if out:
            yield pd.DataFrame(
                out, columns=["band_key", "dup_id", "dup_ts", "owner_id"]
            )

    return exploded.groupBy("band_key").applyInPandasWithState(
        scan,
        outputStructType=DETECTION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
