"""Ingest-time quality scoring: score a document stream against a
FROZEN Naive-Bayes quality model — the serve half of
``queries/curation.py::docs_nb_quality_classifier`` (which trains and
scores one corpus snapshot in a single plan).

The deployment shape this mirrors: the classifier is trained once per
corpus version (the bm25/ivf/keep-best persisted pattern), then every
arriving shard is scored against the frozen weights — training never
reruns at ingest. ``train_nb_quality_model`` collects the model (at
most B+16 weight rows + 2 scalars — bounded whatever the corpus size)
through the SAME Spark expressions the catalog query uses, so the
served scores are bit-equal to the batch query's on the training
corpus (pinned by tests/test_streaming_quality.py).

Scoring is STATELESS — ``mapInPandas`` with the model captured in the
closure (Spark broadcasts it with the serialized function): no state
store, no shuffle, no watermark; each Arrow batch scores
independently, so the same callable serves batch DataFrames too.
Per-token md5 hashing is inherently per-token work; it runs inside the
Arrow batch loop exactly like the batch tier's interpreted hash stage.

Determinism craft: featurization replicates the batch expressions —
tokens are ``split(lower(trim(text)), '\\s+')`` with ASCII semantics
(``re.ASCII``: Java's ``\\s`` is ASCII-only where Python's default is
Unicode — the one observable dialect gap, closed explicitly), buckets
are ``int(md5(tok)[:15 hex], 16) % B``, and the score is the exact
integer fold Σ tf·lwq + lpq in nano-nats, so predicted classes cannot
drift between the trained plan and the served one. Buckets never seen
in training score the model's add-one-smoothing default weight
(computed by the same Spark ln/floor expression, not Python ``math``).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cep_examples_spark.queries.curation import (
    NBQ_BUCKETS,
    NBQ_FEATS,
    NBQ_LEN_BIN_WIDTH,
    NBQ_LEN_BINS,
    _nb_feature_rows,
    _nb_model_frames,
    _nb_weak_labels,
)
from flink_cep_examples_spark.sources.tables import load_table, spread

_WS = re.compile(r"\s+", re.ASCII)


@dataclass(frozen=True)
class NbQualityModel:
    """Frozen NB quality model: bucket → nano-nat log-ratio weight,
    class-prior log-odds, and the unseen-bucket default (all BIGINT
    nano-nats — the exact integers the batch plan computes)."""

    weights: dict[int, int]
    lpq: int
    default_lwq: int


def train_nb_quality_model(
    spark: SparkSession, sf_dir: str, *, docs: DataFrame | None = None
) -> NbQualityModel:
    """Train the catalog query's model on the ``documents`` snapshot
    and collect it (≤ B+16 weight rows + 2 scalars — bounded at any
    corpus size). Pass ``docs`` to train on an explicit frame instead
    (the deployment shape: train on corpus version N, serve shards the
    trainer never saw — pinned held-out by
    tests/test_streaming_quality.py::test_nb_heldout_generalization)."""
    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    docs = spread(docs, "doc_id")
    lab = _nb_weak_labels(docs)
    btf = _nb_feature_rows(lab)
    lw, prior = _nb_model_frames(lab, btf)
    weights = {r.b: r.lwq for r in lw.collect()}
    lpq = prior.first().lpq
    # a bucket with cg = cb = 0 under the same add-one smoothing /
    # quantization expression the trained buckets use
    tot = btf.agg(
        F.sum(
            F.when(F.col("rule_good"), F.col("tf")).otherwise(0)
        ).alias("ng"),
        F.sum(
            F.when(~F.col("rule_good"), F.col("tf")).otherwise(0)
        ).alias("nb"),
    )
    default_lwq = tot.select(
        F.floor(
            (
                F.log(F.lit(1) / (F.col("ng") + F.lit(NBQ_FEATS)))
                - F.log(F.lit(1) / (F.col("nb") + F.lit(NBQ_FEATS)))
            )
            * F.lit(1e9)
            + F.lit(0.5)
        ).alias("d")
    ).first()["d"]
    return NbQualityModel(
        weights=weights, lpq=int(lpq), default_lwq=int(default_lwq)
    )


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_feats", T.LongType(), False),
        T.StructField("log_odds", T.DoubleType(), False),
        T.StructField("pred_good", T.BooleanType(), False),
    ]
)


def _bucket(tok: str) -> int:
    return (
        int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
        % NBQ_BUCKETS
    )


def nb_quality_score(
    df: DataFrame,
    model: NbQualityModel,
    *,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Score ``df`` (streaming or batch; needs ``doc_id`` and ``text``)
    against the frozen model. Stateless mapInPandas — one output row
    per document with the exact integer-fold log-odds and the
    predicted class. ``passthrough`` carries the named input columns
    onto the output (pipeline plumbing)."""
    weights, lpq, default = model.weights, model.lpq, model.default_lwq
    extra = tuple(passthrough)

    def score(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_feats, log_odds, pred = [], [], []
            for text in pdf["text"]:
                toks = _WS.split((text or "").strip().lower()) or [""]
                tf: dict[int, int] = {}
                for t in toks:
                    b = _bucket(t)
                    tf[b] = tf.get(b, 0) + 1
                lb = NBQ_BUCKETS + min(
                    len(toks) // NBQ_LEN_BIN_WIDTH, NBQ_LEN_BINS - 1
                )
                tf[lb] = tf.get(lb, 0) + 1
                sq = lpq + sum(
                    n * weights.get(b, default) for b, n in tf.items()
                )
                n_feats.append(len(toks) + 1)
                log_odds.append(sq / 1e9)
                pred.append(sq > 0)
            out = pdf.assign(
                n_feats=pd.Series(n_feats, index=pdf.index),
                log_odds=pd.Series(log_odds, index=pdf.index),
                pred_good=pd.Series(pred, index=pdf.index),
            )
            yield out[["doc_id", "n_feats", "log_odds", "pred_good",
                       *extra]]

    schema = T.StructType(
        [*_OUT_SCHEMA.fields] + [df.schema[c] for c in extra]
    )
    projected = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        *[c for c in extra if c not in ("doc_id", "text")],
    )
    return projected.mapInPandas(score, schema=schema)
