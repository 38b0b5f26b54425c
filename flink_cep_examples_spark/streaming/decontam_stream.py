"""Ingest-time benchmark decontamination: flag arriving documents that
share an N_GRAM-token window hash with a held-out eval set — the
streaming twin of ``queries/decontam.py::docs_decontaminate``.

The deployment shape: the eval set is FROZEN long before ingest;
its window-hash set is built once (bounded by eval size — the same
quantity the batch query broadcasts) and shipped to the scorer, which
checks every arriving document statelessly. Contaminated docs are
flagged at the door instead of by a full-corpus sweep later.

Scoring is stateless ``mapInPandas`` (no state store, no shuffle, no
watermark — each Arrow batch scores independently; the same callable
serves batch DataFrames). Featurization replicates the batch
expressions exactly — the dedup family's text normalization
(lower → strip non-alphanumerics → collapse spaces → trim), the
portable 15-hex-digit md5 31-bit token hash, and the Horner window
combiner with the SAME mod-P fold order — so the streamed
(doc_id, n_hits) rows are identical to the batch query's
(pinned by tests/test_streaming_decontam.py).

At larger eval sets the exact set hands off to the Bloom variant
(``docs_decontaminate_bloom``'s fixed 2^17-bit filter) — the same
swap the batch tier documents; the probe arithmetic is equally
replicable here if an operator ever needs it.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cep_examples_spark.queries.decontam import (
    _MIX,
    _MOD,
    _WEIGHTS,
    _window_hashes,
    EVAL_MOD,
    EVAL_RESIDUE,
    N_GRAM,
)
from flink_cep_examples_spark.queries.dedup import P
from flink_cep_examples_spark.sources.tables import load_table, spread

_NON_ALNUM = re.compile(r"[^a-z0-9 ]")
_SPACES = re.compile(r" +")


def eval_window_hash_set(spark: SparkSession, sf_dir: str) -> frozenset[int]:
    """The frozen eval set's distinct window hashes (the batch query's
    broadcast side), using the same deterministic eval slice."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    is_eval = (F.col("doc_id") * _MIX) % _MOD % EVAL_MOD == EVAL_RESIDUE
    rows = _window_hashes(docs.filter(is_eval)).select("wh").distinct()
    return frozenset(r.wh for r in rows.collect())


def _doc_window_hashes(text: str) -> set[int]:
    """Replicates _window_hashes for one document: normalized tokens →
    31-bit md5-arith token hashes → Horner window combiner, the same
    mod-P fold order as the Spark expression."""
    norm = _SPACES.sub(
        " ", _NON_ALNUM.sub("", (text or "").lower())
    ).strip()
    toks = norm.split(" ")
    hs = [
        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16) % P
        for t in toks
    ]
    out: set[int] = set()
    for i in range(len(hs) - N_GRAM + 1):
        acc = None
        for k, wt in enumerate(_WEIGHTS):
            term = (hs[i + k] % P) * wt % P
            acc = term if acc is None else (acc + term) % P
        out.add(acc)
    return out


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_hits", T.LongType(), False),
    ]
)


def decontaminate_stream(
    df: DataFrame,
    eval_hashes: frozenset[int],
    *,
    emit_clean: bool = False,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Flag contaminated documents in ``df`` (streaming or batch; needs
    ``doc_id`` and ``text``): one output row per CONTAMINATED doc with
    its distinct shared-window count — the batch query's contract.
    ``emit_clean=True`` emits EVERY doc (clean ones with n_hits=0) so
    the operator composes as a pipeline stage; ``passthrough`` carries
    the named input columns onto the output (pipeline plumbing)."""
    ev = eval_hashes  # captured; broadcast with the function
    extra = tuple(passthrough)

    def score(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            hits = [
                len(_doc_window_hashes(t) & ev) for t in pdf["text"]
            ]
            out = pdf.assign(n_hits=pd.Series(hits, index=pdf.index))
            if not emit_clean:
                out = out[out["n_hits"] > 0]
            if len(out):
                yield out[["doc_id", "n_hits", *extra]]

    schema = T.StructType(
        [*_OUT_SCHEMA.fields]
        + [df.schema[c] for c in extra]
    )
    projected = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        *[c for c in extra if c not in ("doc_id", "text")],
    )
    return projected.mapInPandas(score, schema=schema)
