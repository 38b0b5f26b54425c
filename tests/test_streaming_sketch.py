"""Streaming HLL sketch: the streamed register fold must reproduce the
batch query bit-for-bit (shared projection + shared finalization), and
the register state must merge associatively (the property that makes
the sketch restartable and backfillable)."""

from __future__ import annotations

import numpy as np

from flink_cep_examples_spark.queries import QUERIES, load_all
from flink_cep_examples_spark.queries.sampling import (
    _HLL_M,
    hll_bucket_rho_cols,
    hll_estimate,
)

load_all()


def test_hll_stream_matches_batch_bitwise(spark, sf_small, tmp_path):
    from flink_cep_examples_spark.streaming.sketch_stream import (
        hll_distinct_stream,
    )

    batch = {
        r.event_type: (r.n_zero, r.denom_q, r.est_distinct)
        for r in QUERIES["events_hll_distinct"](spark, sf_small).collect()
    }

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    src = tmp_path / "src"
    # several files → several chances for multi-micro-batch folding
    ev.repartition(4).write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = hll_distinct_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hll_stream").collect()
    assert rows, "stream emitted nothing"
    # the LAST update per key is the full-corpus estimate
    last = {}
    for r in rows:
        if r.event_type not in last or r.updates > last[r.event_type].updates:
            last[r.event_type] = r
    got = {
        t: (r.n_zero, r.denom_q, r.est_distinct) for t, r in last.items()
    }
    assert got == batch  # bit-exact: shared projection + finalization
    # running estimates exist when ingestion spanned micro-batches
    assert max(r.updates for r in rows) >= 1


def test_hll_registers_merge_associatively(spark, sf_small):
    """Fold halves separately, merge by bucket-wise MAX → identical
    estimate to one whole-corpus fold (restart/backfill soundness)."""
    ev = (
        spark.read.parquet(f"{sf_small}/events.parquet")
        .select(*hll_bucket_rho_cols("user_id"), "event_id")
        .collect()
    )
    whole = np.zeros(_HLL_M, dtype=np.uint8)
    a, b = whole.copy(), whole.copy()
    for r in ev:
        np.maximum.at(whole, [r.bucket], [r.rho])
        np.maximum.at(a if r.event_id % 2 == 0 else b, [r.bucket], [r.rho])
    assert hll_estimate(np.maximum(a, b)) == hll_estimate(whole)
    assert (np.maximum(a, b) == whole).all()


def test_cms_stream_matches_batch_estimates(spark, sf_small, tmp_path):
    """Replay the events table through the streaming CMS; the final
    running estimate per probed user must equal the batch CMS probe
    (shared bucket SQL + integer SUM merge = bit parity by
    construction)."""
    from flink_cep_examples_spark.streaming.sketch_stream import (
        cms_frequency_stream,
    )

    batch = {
        (r.event_type, r.user_id): r.est_cnt
        for r in QUERIES["events_cms_heavy_hitters"](
            spark, sf_small
        ).collect()
    }
    assert batch
    probe_ids = sorted({u for _t, u in batch})

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    src = tmp_path / "cms_src"
    ev.repartition(4).write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = cms_frequency_stream(stream, probe_ids)
    q = (
        out.writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM cms_stream").collect()
    assert rows, "stream emitted nothing"
    last = {}
    for r in rows:
        k = (r.event_type, r.user_id)
        if k not in last or r.updates > last[k].updates:
            last[k] = r
    # every batch-probed (type, user) pair must match the final
    # streamed estimate exactly
    for k, est in batch.items():
        assert k in last, f"stream never reported {k}"
        assert last[k].est_cnt == est, (k, last[k].est_cnt, est)
    # the sketch overestimate guarantee holds on the stream side too
    exact = {
        (r.event_type, r.user_id): r.cnt
        for r in spark.read.parquet(f"{sf_small}/events.parquet")
        .groupBy("event_type", "user_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    for k, r in last.items():
        assert r.est_cnt >= exact.get(k, 0)


def test_cms_counters_merge_by_sum(spark, sf_small):
    """Fold halves separately, merge by element-wise SUM → identical
    counters to one whole fold (backfill/restart soundness)."""
    from flink_cep_examples_spark.queries.sampling import (
        _CMS_D,
        _CMS_W,
        _cms_bucket_sql,
    )
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    rows = (
        ev.select("event_type", "user_id", "event_id")
        .select(
            "event_type",
            "user_id",
            "event_id",
            F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("d"),
        )
        .select(
            "event_type",
            "event_id",
            "d",
            F.expr(_cms_bucket_sql("user_id", "div")).alias("bucket"),
        )
        .filter(F.col("event_type") == "click")
        .collect()
    )
    whole = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    a, b = whole.copy(), whole.copy()
    for r in rows:
        whole[r.d][r.bucket] += 1
        (a if r.event_id % 2 == 0 else b)[r.d][r.bucket] += 1
    assert ((a + b) == whole).all()


def test_quantile_hist_stream_matches_batch_bitwise(spark, sf_small, tmp_path):
    """Streaming log2-histogram quantiles (round 12): the final
    streamed row per key must equal the batch query bit-for-bit
    (shared scan-side binning + replicated rank/edge arithmetic), and
    running estimates appear while ingestion is in flight."""
    from flink_cep_examples_spark.streaming.sketch_stream import (
        quantile_hist_stream,
    )

    batch = {
        r.event_type: (r.n_rows, r.p5, r.p9, r.p99)
        for r in QUERIES["events_value_quantile_hist"](
            spark, sf_small
        ).collect()
    }

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    src = tmp_path / "src"
    ev.repartition(4).write.parquet(str(src))
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = quantile_hist_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("qh_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM qh_stream").collect()
    assert rows, "stream emitted nothing"
    last = {}
    for r in rows:
        if r.event_type not in last or r.updates > last[r.event_type].updates:
            last[r.event_type] = r
    got = {t: (r.n_rows, r.p5, r.p9, r.p99) for t, r in last.items()}
    assert got == batch  # bit-exact
    # the monitor actually ran live: some key updated more than once
    assert max(r.updates for r in rows) > 1


def test_quantile_hist_stream_tolerates_null_values(spark, tmp_path):
    """ADVICE r12 low: a NULL value column binned to b=NULL and
    ``pdf['b'].to_numpy(dtype=np.int64)`` raised on NA, crashing the
    streaming query where the batch twin survives. Pin: null bins are
    dropped before the int64 fold — the stream completes, and its
    final histogram equals the batch twin run on the NON-NULL subset
    (an all-null micro-batch contributes no state update)."""
    import datetime as dt

    from flink_cep_examples_spark.streaming.sketch_stream import (
        quantile_hist_stream,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        ("click", base + dt.timedelta(minutes=i), v)
        for i, v in enumerate((1.5, None, 0.25, 8.0, None, 2.0))
    ] + [("view", base, None), ("view", base, 4.0)]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    src = tmp_path / "src"
    ev.repartition(3).write.parquet(str(src))

    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = (
        quantile_hist_stream(stream)
        .writeStream.format("memory")
        .queryName("qh_null_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_rows = spark.sql("SELECT * FROM qh_null_stream").collect()
    assert got_rows, "stream emitted nothing"
    last = {}
    for r in got_rows:
        if r.event_type not in last or r.updates > last[r.event_type].updates:
            last[r.event_type] = r
    got = {t: (r.n_rows, r.p5, r.p9, r.p99) for t, r in last.items()}

    # batch twin over the non-null subset (the implied null semantics:
    # a null value is no observation)
    import flink_cep_examples_spark.queries.sampling as S

    nn = ev.filter("value IS NOT NULL")
    orig = S.load_table
    S.load_table = lambda _s, _d, _t: nn
    try:
        batch = {
            r.event_type: (r.n_rows, r.p5, r.p9, r.p99)
            for r in S.events_value_quantile_hist(spark, "unused").collect()
        }
    finally:
        S.load_table = orig
    assert got == batch


def test_quantile_hist_counters_merge_by_sum(spark, sf_small):
    """Halves folded separately then vector-added equal one whole fold
    (restart/backfill soundness — the continuous-aggregate property)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    units = F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5)).cast(
        "bigint"
    )
    b = (
        ev.select(
            F.when(units <= 0, F.lit(0))
            .otherwise(F.length(F.bin(units)))
            .cast("int")
            .alias("b")
        )
        .collect()
    )
    bins = np.array([r.b for r in b], dtype=np.int64)
    whole = np.zeros(65, dtype=np.int64)
    np.add.at(whole, bins, 1)
    h1 = np.zeros(65, dtype=np.int64)
    h2 = np.zeros(65, dtype=np.int64)
    np.add.at(h1, bins[: len(bins) // 2], 1)
    np.add.at(h2, bins[len(bins) // 2 :], 1)
    assert ((h1 + h2) == whole).all()
