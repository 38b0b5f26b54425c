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

_STATE_SCHEMA = "owners binary"  # pickled {band_key: (owner_id, owner_ts_ms)}


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

    Kernel shape: token md5s are the only per-item Python work
    (unavoidable when streaming keys must equal the batch md5/`conv`
    arithmetic bit-for-bit) and are MEMOIZED across the UDF's lifetime
    — natural-language token reuse makes the hit rate high; the
    shingle combination and all 32 minhash passes are int64 numpy
    (values stay < 2^52, no overflow). Work arrives pre-shuffle and
    scales out with input partitions."""
    import hashlib
    import re

    import numpy as np
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
    memo: dict[str, int] = {}
    A = np.array([a for a, _ in MINHASH_AB], dtype=np.int64)[:, None]
    B = np.array([b for _, b in MINHASH_AB], dtype=np.int64)[:, None]

    def h31(tok: str) -> int:
        h = memo.get(tok)
        if h is None:
            if len(memo) >= 1_000_000:  # bound the cache on long streams
                memo.clear()
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16) % P
            memo[tok] = h
        return h

    def keys_for(text: str) -> list[str]:
        norm = spaces.sub(" ", nonword.sub("", (text or "").lower())).strip()
        toks = norm.split(" ")
        h = np.fromiter((h31(t) for t in toks), dtype=np.int64, count=len(toks))
        pad = np.concatenate([h, np.zeros(2, dtype=np.int64)])
        hs = (h * C1 + pad[1 : len(h) + 1] * C2 + pad[2 : len(h) + 2]) % P
        mh = ((A * hs[None, :] + B) % P).min(axis=1)
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
    n_buckets: int = 64,
    signature: str = "vector",
) -> DataFrame:
    """Streaming near-duplicate DETECTION: emit one row per (arriving
    doc, colliding LSH band bucket) where the bucket already has an
    owner inside the watermark horizon — ``(band_key, dup_id, dup_ts,
    owner_id)``. A doc appearing as ``dup_id`` in >= 1 detection is a
    near-dup candidate of its bucket owner (the standard >=1-band LSH
    candidate rule); docs emitting nothing are novel.

    Scale shape: band keys are computed scan-side (Arrow kernel,
    identical arithmetic to the batch signatures), so the one shuffle
    ships (32-byte band key, id, ts) — never text. State is sharded by
    ``crc32(band_key) % n_buckets`` (the cep_stream trick): the
    stateful operator sees O(n_buckets) groups per micro-batch instead
    of one per distinct band bucket, each holding a pickled
    ``{band_key: (owner_id, owner_ts_ms)}`` dict — per-group pandas
    overhead amortizes over thousands of rows (measured ~6× on a 20k
    replay vs per-band-key groups). Entries age out lazily against the
    current watermark (one horizon after last activity) plus a final
    event-time timeout that drops the whole shard — state is bounded
    by the horizon exactly like a streaming aggregation. Within a
    micro-batch, rows order by (ts, id) before the ownership scan, so
    replaying a corpus through ``availableNow`` reproduces the batch
    candidate pairs exactly (agreement test)."""
    import pickle

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    horizon_ms = int(pd.Timedelta(watermark_delay).total_seconds() * 1000)

    # signature mode (round 5): "vector" (the DEFAULT) computes the
    # band keys with codegen JVM tokenization + the flat-numpy Arrow
    # kernel (queries/dedup.py vector_band_keys_kernel — same MinHash
    # structure, vectorized byte-matrix token hashing, no per-token
    # Python; shared bit-identically with the batch vector path);
    # "md5" keeps the memoized per-token-md5 kernel whose keys are
    # byte-equal to the batch md5/`conv` arithmetic that the DuckDB
    # oracles pin.
    if signature == "vector":
        from flink_cep_examples_spark.queries.dedup import (
            with_vector_band_keys,
        )

        keyed = with_vector_band_keys(
            docs, text_col=text_col, out_col="__bks"
        ).withColumn(
            "__bk",
            F.explode(
                F.transform(F.col("__bks"), lambda k: k.cast("string"))
            ),
        )
    elif signature == "md5":
        keyed = docs.withColumn(
            "__bk", F.explode(minhash_band_keys_udf()(F.col(text_col)))
        )
    else:
        raise ValueError(f"unknown signature mode {signature!r}")
    exploded = (
        keyed.select(
            F.col("__bk").alias("band_key"),
            F.col(id_col).alias("dup_id"),
            F.col(event_time_col).alias("dup_ts"),
        )
        .withWatermark("dup_ts", watermark_delay)
        .withColumn(
            "bucket", (F.crc32(F.col("band_key")) % n_buckets).cast("int")
        )
    )

    def scan(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        rows = rows.sort_values(["dup_ts", "dup_id"], kind="mergesort")
        owners: dict = (
            pickle.loads(state.get()[0]) if state.exists else {}
        )
        wm = state.getCurrentWatermarkMs()
        if wm > 0 and owners:
            owners = {
                bk: v for bk, v in owners.items() if v[1] + horizon_ms >= wm
            }
        out_bk, out_id, out_ts, out_owner = [], [], [], []
        bks = rows["band_key"].to_numpy()
        ids = rows["dup_id"].to_numpy()
        tss = rows["dup_ts"].to_numpy()
        for bk, did, ts in zip(bks, ids, tss):
            ts_ms = int(ts.astype("datetime64[ms]").astype("int64"))
            prev = owners.get(bk)
            if prev is None:
                owners[bk] = (int(did), ts_ms)
            else:
                out_bk.append(bk)
                out_id.append(int(did))
                out_ts.append(ts)
                out_owner.append(prev[0])
        state.update((pickle.dumps(owners),))
        last_ms = max((v[1] for v in owners.values()), default=0)
        state.setTimeoutTimestamp(last_ms + horizon_ms + 1)
        if out_bk:
            yield pd.DataFrame(
                {
                    "band_key": out_bk,
                    "dup_id": out_id,
                    "dup_ts": out_ts,
                    "owner_id": out_owner,
                }
            )

    return exploded.groupBy("bucket").applyInPandasWithState(
        scan,
        outputStructType=DETECTION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def corpus_clean_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming ingest twin of queries/pipeline.py::
    corpus_clean_pipeline — the first two stages run streaming-native:

    1. quality gate — the SAME keep-rule expressions as the batch
       catalog query (queries/text.py::quality_columns), evaluated
       scan-side;
    2. exact content dedup — first occurrence per md5(text) within the
       watermark horizon (dedup_content_stream).

    Output: the kept (id, ts, quality columns) append stream. The
    third batch stage (near-dup removal) is deliberately NOT an
    inline anti-join: stream-stream anti joins would hold rows to the
    horizon, and a doc's 8 band verdicts live in different state
    shards. Production ingest does late near-dedup instead — run
    :func:`dedup_minhash_band_stream` on the SAME source and drop the
    flagged ``dup_id``s at compaction/shard-write time (the flagged
    set is a superset of the batch pipeline's est-Jaccard-filtered
    losers; the batch pipeline remains the exact-recall path)."""
    from flink_cep_examples_spark.queries.text import quality_columns

    cols = quality_columns(F.col(text_col))
    scored = docs.select(
        F.col(id_col),
        F.col(event_time_col),
        F.col(text_col),
        *[expr.alias(name) for name, expr in cols.items()],
    ).filter(F.col("keep"))
    return dedup_content_stream(
        scored,
        content_col=text_col,
        event_time_col=event_time_col,
        watermark_delay=watermark_delay,
    ).drop(text_col)


# ---------------------------------------------------------------------------
# Round 13: novelty check against a FROZEN corpus — the ingest-time
# question "is this arriving doc a near-dup of anything we already
# have?" (the watermark-horizon operator above answers it only within
# the stream's own recent past).
# ---------------------------------------------------------------------------


def write_band_index(spark, sf_dir: str, index_dir: str) -> None:
    """Persist the corpus's LSH band index: one row per distinct
    ``band_key`` with its owner (smallest doc_id in the bucket) and
    bucket size. Band keys are the "vector" signature mode
    (queries/dedup.py::with_vector_band_keys — the same minhash/band
    structure as the batch LSH query), so an arriving doc collides
    with the index iff it would be an LSH candidate pair with a corpus
    doc. Output is O(docs × 8 bands) before dedup, one row per
    distinct bucket after — tiny next to the corpus, and it lives in
    ordinary parquet (the serve-side join is distributed, never a
    broadcast/collect)."""
    from flink_cep_examples_spark.queries.dedup import (
        with_vector_band_keys,
    )
    from flink_cep_examples_spark.sources.tables import load_table, spread

    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    (
        with_vector_band_keys(docs)
        .select("doc_id", F.explode("band_keys").alias("band_key"))
        .groupBy("band_key")
        .agg(
            F.min("doc_id").alias("owner_id"),
            F.count(F.lit(1)).alias("bucket_size"),
        )
        .write.mode("overwrite")
        .parquet(f"{index_dir}/bands")
    )


def novelty_check_stream(df: DataFrame, index_dir: str) -> DataFrame:
    """Check arriving documents (``doc_id``, ``text``) against a
    persisted band index: emit one row per (doc, colliding band) —
    ``(doc_id, band_key, owner_id, bucket_size)``. A doc emitting >= 1
    row is an LSH near-dup CANDIDATE of the frozen corpus (the
    standard >=1-band rule, same keys as the batch LSH query); a doc
    emitting nothing is novel.

    Plan shape: band keys are computed scan-side (the shared Arrow
    kernel — the stream ships 8 longs per doc, never text), then ONE
    stream-static equi-join against the parquet index. Stateless: no
    watermark, no state store; the static side is planned per
    micro-batch by Catalyst like any batch join (shuffled or
    broadcast by size). Works identically on a batch DataFrame."""
    from flink_cep_examples_spark.queries.dedup import (
        with_vector_band_keys,
    )

    index = df.sparkSession.read.parquet(f"{index_dir}/bands")
    keyed = with_vector_band_keys(df).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode("band_keys").alias("band_key"),
    )
    return keyed.join(index, "band_key").select(
        "doc_id", "band_key", "owner_id", "bucket_size"
    )
