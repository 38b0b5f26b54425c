"""Hot-key streaming CEP regression pin (round 16, VERDICT r15 item
7): promote the round-9/round-15 ``tools/stream_hotkey_probe.py``
adjudication into the suite, so a future NFA/bucketing change that
breaks hot-key handling fails a TEST, not a round-end probe.

The operator walks a per-key Python NFA inside each key-bucket task; a
single hot key is inherently sequential (Flink serializes a key on one
subtask the same way). The probe history pins the expected shape: at
50% of all events on ONE key, the measured slowdown vs the uniform
profile is ~1.7× (SCALING.md r9/r15: uniform 282k ev/s → skewed 162k
ev/s at 1M events). This test replays both profiles at a suite-sized
scale and asserts the bounded ratio — a regression that serializes
MORE than the hot key (e.g. a bucketing change hashing many keys into
the hot task, or a per-step blowup in the NFA walk) lands well past
the bound, while host drift stays inside it (min-of-2 per arm, one
warmup, same methodology as bench's cep_streaming block).

Correctness of the skewed run is asserted too: the re-keyed stream
must produce the same MATCH COUNT through both profiles' own oracles
(each profile compared against its batch twin), so the pin can never
pass by silently dropping the hot key's matches.
"""

from __future__ import annotations

import time

import pytest

pytestmark = pytest.mark.slow  # round-17 driver-budget deselection (VERDICT r16 item 1); round close runs `pytest -m slow`
from pyspark.sql import functions as F

REPLICAS = 10  # sf0.001 billing × 10 — suite-sized, past the 1s floor
HOT_FRACTION = 0.5  # the round-15 stress point
MAX_SKEW_RATIO = 3.0  # measured ~1.7×; 3× bounds drift, catches breakage


def _replicated_billing(spark, sf_small):
    from flink_cep_examples_spark.sources.billing import events_as_billing

    billing = events_as_billing(spark, sf_small)
    return (
        billing.withColumn(
            "r", F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)]))
        )
        .withColumn("id", F.concat_ws("#", "id", "r"))
        .drop("r")
    )


@pytest.mark.slow
def test_hotkey_streaming_bounded_slowdown(spark, sf_small, tmp_path):
    from flink_cep_examples_spark.operators import match_pattern
    from flink_cep_examples_spark.plans.pattern import billing_pattern
    from flink_cep_examples_spark.streaming import match_pattern_stream

    rep = _replicated_billing(spark, sf_small)
    skewed = rep.withColumn(
        "id",
        F.when(
            F.pmod(F.xxhash64("id", "event_time"), F.lit(100))
            < int(HOT_FRACTION * 100),
            F.lit("hot#0"),
        ).otherwise(F.col("id")),
    )
    n_events = rep.count()
    assert n_events > 0

    pattern = billing_pattern(emit_timeouts=True)
    times: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, frame in (("uniform", rep), ("skewed", skewed)):
        src = str(tmp_path / f"src_{name}")
        frame.coalesce(4).write.parquet(src)
        schema = spark.read.parquet(src).schema

        def run_stream(chk: str) -> tuple[float, int]:
            stream = spark.readStream.schema(schema).parquet(src)
            out = match_pattern_stream(
                stream, pattern, "6 minutes", n_buckets=32
            )
            t0 = time.perf_counter()
            q = (
                out.writeStream.outputMode("append")
                .format("memory")
                .queryName(f"hotkey_{name}_{chk}")
                .option(
                    "checkpointLocation", str(tmp_path / f"chk_{name}_{chk}")
                )
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300), "stream timed out"
            dt = time.perf_counter() - t0
            n = spark.sql(
                f"SELECT COUNT(*) c FROM hotkey_{name}_{chk}"
            ).first().c
            return dt, n

        run_stream("warmup")
        (t1, n1), (t2, n2) = run_stream("a"), run_stream("b")
        assert n1 == n2  # replay determinism
        times[name] = min(t1, t2)
        counts[name] = n1
        # correctness anchor: the streaming result must match the
        # batch operator on the SAME frame — the pin cannot pass by
        # dropping the hot key's work
        batch_n = match_pattern(frame, pattern).count()
        assert n1 == batch_n, (name, n1, batch_n)

    # the hot key concentrates matches differently, but both profiles
    # must have produced real work
    assert counts["uniform"] > 0 and counts["skewed"] > 0
    ratio = times["skewed"] / times["uniform"]
    if ratio > MAX_SKEW_RATIO:
        # one adjudication re-measure before failing (round-16 review:
        # a wall-clock ratio on a loaded host can breach without a
        # code regression — a genuine hot-key regression breaches on
        # the quiet re-run too)
        import time as _time

        def _one(name: str, frame) -> float:
            src = str(tmp_path / f"src_{name}")
            schema = spark.read.parquet(src).schema
            stream = spark.readStream.schema(schema).parquet(src)
            out = match_pattern_stream(
                stream, pattern, "6 minutes", n_buckets=32
            )
            t0 = _time.perf_counter()
            q = (
                out.writeStream.outputMode("append")
                .format("noop")
                .option(
                    "checkpointLocation",
                    str(tmp_path / f"chk_{name}_retry"),
                )
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(300), "stream timed out"
            return _time.perf_counter() - t0

        ratio = min(
            ratio, _one("skewed", skewed) / _one("uniform", rep)
        )
    assert ratio <= MAX_SKEW_RATIO, (
        f"hot-key slowdown {ratio:.2f}x exceeds the {MAX_SKEW_RATIO}x "
        f"bound (uniform {times['uniform']:.2f}s, skewed "
        f"{times['skewed']:.2f}s over {n_events} events) — the per-key "
        "NFA walk or key bucketing regressed on skew"
    )
