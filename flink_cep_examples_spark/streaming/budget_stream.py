"""Streaming token-budget admission: the ingest-time twin of
``queries/sampling.py::docs_token_budget_mix``.

A training-data pipeline that assembles a mix at ingest admits
documents per language until that language's TOKEN budget fills, then
drops the rest — the streaming counterpart of the batch query's
minimal-prefix selection. The batch query's canonical order is the
deterministic ``mix(doc_id)`` hash; a stream's canonical order is
arrival, so this operator admits the minimal ARRIVAL-order prefix
(within each micro-batch, rows are folded in ``mix(doc_id)`` order so
single-batch replays reproduce the batch selection exactly — pinned by
the agreement test in tests/test_streaming_budget.py).

Scale design (100 TB mindset):

- State per key is two scalars — the admitted token total and the
  admitted row count — O(1) whatever the corpus size, surviving
  checkpoint restart as plain columns. A saturated key keeps its state
  and drops arrivals in one vectorized comparison per micro-batch.
- The token proxy is the SHARED batch expression
  (queries/sampling.py::TOKEN_PROXY_SQL), evaluated scan-side before
  the shuffle, so the exchange carries (doc_id, lang, tok), never the
  document body.
- The shuffle keys on language — a skewed axis (English dominates real
  corpora). ``n_shards > 1`` splits each language into deterministic
  hash shards with the budget divided across them (remainder to the
  low shards), turning one hot state partition into ``n_shards``
  parallel ones; total admitted budget is unchanged (the shard budgets
  sum exactly). Sharded admission is a documented relaxation: the
  union of per-shard prefixes, not the single global prefix. The
  drift is QUANTITATIVELY bounded (proved + property-pinned by
  tests/test_streaming_budget.py::test_sharded_drift_bound):

  * Token OVERSHOOT vs the global prefix is at most
    ``n_shards × (max admitted doc's tokens − 1)``, unconditionally.
    Proof sketch: a shard admits a doc only while its running total
    is ≤ its sub-budget − 1, so each shard's total is
    ≤ b_s − 1 + max_tok; the totals sum to
    ≤ budget + n_shards·(max_tok − 1). If the global prefix saturates
    (rejects ≥ 1 doc) its total is ≥ budget, giving the bound; if it
    admits EVERYTHING, the sharded union is a subset of it and the
    overshoot is ≤ 0.
  * Token UNDERSHOOT vs the global prefix is bounded the same way
    whenever every shard saturates — the hot-language regime sharding
    exists for. When hash skew starves a shard below its sub-budget
    the unfilled remainder stays unspent (a shard never borrows
    another's budget); with the uniform ``mix(doc_id)`` hash the
    per-shard mass imbalance concentrates like 1/sqrt(rows), so a
    language hot enough to shard saturates every shard in practice.

Reference parity: extends the reference's keyed stateful tier
(FlinkProcessFunctionExample.scala's ValueState counter pattern) with
the admission-control state a Flink user would keep in a
KeyedProcessFunction — here via applyInPandasWithState, the same
pattern as streaming/sketch_stream.py.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cep_examples_spark.queries.sampling import (
    _MIX,
    _MOD,
    TOKEN_PROXY_SQL,
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("tok", T.LongType(), False),
        T.StructField("cum_tok", T.LongType(), False),
    ]
)

#: (admitted token total, admitted row count) — O(1) per key
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total", T.LongType(), True),
        T.StructField("n_admitted", T.LongType(), True),
    ]
)


def shard_budgets(budget: int, n_shards: int) -> list[int]:
    """Split ``budget`` across ``n_shards`` (remainder to the low
    shards); the shares sum to ``budget`` exactly."""
    base, rem = divmod(budget, n_shards)
    return [base + (1 if s < rem else 0) for s in range(n_shards)]


def admit_batch(
    pdf: pd.DataFrame, total: int, budget: int
) -> tuple[pd.DataFrame | None, int]:
    """The admission core, one micro-batch for one key: sort by the
    deterministic hash order, keep the prefix whose preceding token
    mass (``total`` + within-batch cumsum-before) is below ``budget``,
    return (admitted rows with ``cum_tok``, new total). Pure — unit-
    and property-tested directly (tests/test_streaming_budget.py)."""
    if not len(pdf) or total >= budget:
        return None, total
    pdf = pdf.sort_values(["h", "doc_id"], kind="mergesort")
    cum_before = total + pdf["tok"].cumsum() - pdf["tok"]
    keep = pdf[cum_before < budget]
    if not len(keep):
        return None, total
    admitted = keep.assign(
        cum_tok=(total + keep["tok"].cumsum()).astype("int64")
    )
    return admitted, int(admitted["cum_tok"].iloc[-1])


def budget_admission_stream(
    df: DataFrame,
    budgets: dict[str, int],
    n_shards: int = 1,
) -> DataFrame:
    """``df`` is a streaming DataFrame with ``doc_id``, ``lang`` and
    ``n_chars`` columns; returns an append-mode stream of the admitted
    rows (doc_id, lang, tok, running admitted total). A language absent
    from ``budgets`` has budget 0 (admits nothing) — budgets are the
    explicit ingest contract, never guessed from a partial stream.

    A doc is admitted iff its (lang, shard) running token total is
    still below the shard budget when it is folded, mirroring the
    batch rule ``cum_before < budget`` — the budget is met or overshot
    by at most one document per shard."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    per_shard = {
        lang: shard_budgets(b, n_shards) for lang, b in budgets.items()
    }

    projected = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.expr(TOKEN_PROXY_SQL).cast("long").alias("tok"),
        (
            (F.col("doc_id").cast("long") * F.lit(_MIX)) % F.lit(_MOD)
        ).alias("h"),
    ).withColumn(
        "shard", (F.col("h") % F.lit(n_shards)).cast("long")
    )

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        lang, shard = key[0], int(key[1])
        budget = per_shard.get(lang, [0] * n_shards)[shard]
        if state.exists:
            total, n_admitted = state.get
        else:
            total, n_admitted = 0, 0
        out: list[pd.DataFrame] = []
        for pdf in pdfs:
            # deterministic within-batch order: the batch query's
            # canonical hash order (doc_id tiebreak); cross-batch
            # order stays arrival order (the stream's canonical one)
            admitted, total = admit_batch(pdf, total, budget)
            if admitted is None:
                continue
            n_admitted += len(admitted)
            out.append(admitted[["doc_id", "lang", "tok", "cum_tok"]])
        # admission state never expires (a filled budget stays filled);
        # update even on drop-only batches so restart resumes exactly
        state.update((total, n_admitted))
        yield from out

    return projected.groupBy("lang", "shard").applyInPandasWithState(
        fold,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
