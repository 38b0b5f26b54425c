"""Sequence packing — the "sample packing" stage of an LLM training
pipeline: concatenate documents into fixed-token-budget training
sequences with minimal padding. (Beyond-reference surface; the
reference's closest analogue is the keyed stateful tier, SURVEY §2.4 —
packing is the same shape: an order-dependent running fold per key.)

Design for 100 TB:

- The corpus is split into ``N_BUCKETS`` deterministic hash buckets
  (Knuth mixer on ``doc_id`` — no engine hash, so the oracle can
  reproduce the assignment bit-for-bit). A bucket is the sequential
  unit: packing inside it is an order-dependent fold, but buckets are
  independent, so the job is embarrassingly parallel with exactly ONE
  shuffle (the groupBy on bucket). Scale the bucket count with the
  corpus so each stays executor-sized.
- Token counts are computed JVM-side (codegen ``split``/``size``)
  BEFORE the Python stage; only three narrow int columns cross the
  Arrow boundary — the text itself never leaves the JVM.
- The per-bucket fold is the genuinely sequential part, so it is an
  ``applyInPandas`` numpy loop over pre-sorted int arrays — O(rows),
  no string work, no per-row Python objects.

Greedy rule (first-fit in doc_id order, the standard streaming packer):
a document starts a new pack iff the current pack's fill plus its
token count would exceed ``TOKEN_BUDGET``; a document larger than the
whole budget sits alone in its pack, flagged ``truncated``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cep_examples_spark.queries import register
from flink_cep_examples_spark.sources.tables import load_table

#: Knuth multiplicative mixer (shared convention with queries/sampling.py)
_MIX = 2654435761
_MOD = 1 << 32

#: tokens per packed training sequence (whitespace tokens stand in for
#: BPE tokens; swap the count expression for the real tokenizer's)
TOKEN_BUDGET = 256

#: sequential packing units — scale with corpus size
N_BUCKETS = 16

_OUT_SCHEMA = (
    "doc_id long, bucket long, n_tokens long, "
    "pack_seq long, pack_pos long, truncated boolean"
)


def _pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy first-fit fold over one bucket, in doc_id order."""
    pdf = pdf.sort_values("doc_id", ignore_index=True)
    n = pdf["n_tokens"].to_numpy()
    pack_seq = [0] * len(pdf)
    pack_pos = [0] * len(pdf)
    fill = seq = pos = 0
    for i, tok in enumerate(map(int, n)):
        if i > 0 and fill + tok <= TOKEN_BUDGET:
            fill += tok
            pos += 1
        else:  # first doc, overflow, or oversize doc: start a pack
            if i > 0:
                seq += 1
            pos = 0
            # an oversize doc fills its pack to the brim (truncated),
            # so the next doc always overflows and starts fresh
            fill = min(tok, TOKEN_BUDGET)
        pack_seq[i] = seq
        pack_pos[i] = pos
    out = pdf[["doc_id", "bucket", "n_tokens"]].copy()
    out["pack_seq"] = pack_seq
    out["pack_pos"] = pack_pos
    out["truncated"] = pdf["n_tokens"] > TOKEN_BUDGET
    return out


def pack_sequences(docs: DataFrame, doc_id: str = "doc_id",
                   n_tokens: str = "n_tokens") -> DataFrame:
    """Assign every document a (bucket, pack_seq, pack_pos) packing
    coordinate. Input needs ``doc_id`` (bigint) and ``n_tokens``
    (bigint) only — compute counts upstream, JVM-side."""
    bucketed = docs.select(
        F.col(doc_id).alias("doc_id"),
        ((F.col(doc_id) * F.lit(_MIX)) % F.lit(_MOD) % F.lit(N_BUCKETS))
        .alias("bucket"),
        F.col(n_tokens).cast("long").alias("n_tokens"),
    )
    return bucketed.groupBy("bucket").applyInPandas(_pack_bucket, _OUT_SCHEMA)


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack the ``documents`` corpus into TOKEN_BUDGET-token training
    sequences across N_BUCKETS hash buckets (whitespace token counts)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
    )
    return pack_sequences(docs)


#: DuckDB twin: the same greedy fold as a recursive CTE stepping one
#: row (per bucket) at a time, carrying (pack_seq, pack_pos, fill).
ORACLE_PACK = rf"""
WITH RECURSIVE s AS (
  SELECT doc_id,
         (doc_id * {_MIX}) % {_MOD} % {N_BUCKETS} AS bucket,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, bucket, n_tokens,
         row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM s
), rec(bucket, rn, doc_id, n_tokens, pack_seq, pack_pos, fill) AS (
  SELECT bucket, rn, doc_id, n_tokens, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         LEAST(n_tokens, {TOKEN_BUDGET})
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN rec.fill + o.n_tokens > {TOKEN_BUDGET}
              THEN rec.pack_seq + 1 ELSE rec.pack_seq END,
         CASE WHEN rec.fill + o.n_tokens > {TOKEN_BUDGET}
              THEN 0 ELSE rec.pack_pos + 1 END,
         CASE WHEN rec.fill + o.n_tokens > {TOKEN_BUDGET}
              THEN LEAST(o.n_tokens, {TOKEN_BUDGET})
              ELSE rec.fill + o.n_tokens END
  FROM rec JOIN o ON o.bucket = rec.bucket AND o.rn = rec.rn + 1
)
SELECT doc_id, bucket, n_tokens, pack_seq, pack_pos,
       n_tokens > {TOKEN_BUDGET} AS truncated
FROM rec
"""


register("docs_pack_sequences", docs_pack_sequences, ORACLE_PACK, driver=False)
