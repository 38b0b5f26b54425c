"""Long-span ALL ROWS capture-cost probe (round 12, ADVICE r11 low).

The round-11 ALL ROWS capture accumulator extended by tuple
concatenation — O(k²) per k-row span — so a single long B* run under a
wide WITHIN horizon degraded super-linearly in the streaming tier.
Round 12 replaced it with a shared append-only log (cep_stream._cap_fold,
O(1) amortized per consumed row). This probe pins the cost class: one
key, one match of span k (A, k×B, C), replayed through the REAL
streaming operator in a single micro-batch (the quadratic was in-batch
extension cost, not cross-batch pickling), at k and 10k. A linear fold
shows ~10× wall growth on the fold-dominated portion; the old concat
showed ~100×.

Usage: PYTHONPATH=/root/repo python tools/stream_longspan_probe.py [k]
Prints one JSON line {"k": ..., "sec_k": ..., "sec_10k": ..., "ratio": ...}.
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
import time


BODY = """
  PARTITION BY id ORDER BY event_time
  MEASURES FINAL COUNT(B.*) AS n_b, SUM(B.balanceAfter) AS sum_b
  ALL ROWS PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B* C)
  DEFINE
    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
    B AS B.balanceBefore >= B.balanceAfter,
    C AS C.balanceBefore < C.balanceAfter
"""


def _rows(k: int):
    """One key: A, k descending-balance B rows, C — a single k+2-row
    match whose capture accumulator is extended k+1 times."""
    base = dt.datetime(2020, 5, 1)
    rows = [("k", base, 0, 11.0, 6.0)]  # A
    bal = 6.0
    for i in range(k):
        rows.append(("k", base + dt.timedelta(seconds=i + 1), i + 1, bal, bal))
    rows.append(
        ("k", base + dt.timedelta(seconds=k + 1), k + 1, bal, bal + 10.0)
    )  # C
    return rows


def _run(spark, k: int, tag: str) -> float:
    from flink_cep_examples_spark.sql.match_recognize import match_recognize

    df = spark.createDataFrame(
        _rows(k),
        "id string, event_time timestamp, seq long, "
        "balanceBefore double, balanceAfter double",
    )
    src = tempfile.mkdtemp(prefix=f"longspan_{tag}_")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = match_recognize(stream, BODY, watermark_delay="0 seconds")
    t0 = time.time()
    q = (
        out.writeStream.format("memory")
        .queryName(f"longspan_{tag}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    sec = time.time() - t0
    n = spark.sql(f"SELECT count(*) c FROM longspan_{tag}").first().c
    assert n == k + 2, (n, k)
    return sec


def main() -> None:
    from flink_cep_examples_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    spark = get_spark(
        app_name="longspan-probe", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    _run(spark, 200, "warm")  # JVM/Arrow warmup, unmeasured
    sec_k = _run(spark, k, "k1")
    sec_10k = _run(spark, 10 * k, "k10")
    print(
        json.dumps(
            {
                "k": k,
                "sec_k": round(sec_k, 3),
                "sec_10k": round(sec_10k, 3),
                "ratio": round(sec_10k / sec_k, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
