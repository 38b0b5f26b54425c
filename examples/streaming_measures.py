"""Round-11 streaming measure surface on the reference's golden input:
the billing alarm pattern (FlinkCEPExample.scala:55-76) replayed through
Structured Streaming with the measure families that used to be
batch-only — aggregate MEASURES (incremental span accumulators), a
SUBSET union, and ALL ROWS PER MATCH (captured-row expansion; beyond
the reference — Flink SQL MATCH_RECOGNIZE is ONE ROW PER MATCH only on
streams).

Expected golden output: the key-2 match row with aggregates over its
two B rows (sum_b=7, avg_b=3.5, min_b=3, max_b=4) and
u_first/u_last = 6/23 over SUBSET U = (A, C); then the same match
expanded to its four rows (A B B C) by the ALL ROWS query, with
b_so_far running 0, 1, 2, 2 down the match (round 11.2: RUNNING
measures stream under ALL ROWS).
"""

import os
import sys
import tempfile
import time

from _common import input_df, session

from flink_cep_examples_spark.sql.match_recognize import match_recognize

ONE_ROW_BODY = """
  PARTITION BY id ORDER BY event_time
  MEASURES
    FIRST(A.datetime) AS alarmTriggerDatetime,
    SUM(B.balanceAfter) AS sum_b, AVG(B.balanceAfter) AS avg_b,
    MIN(B.balanceAfter) AS min_b, MAX(B.balanceAfter) AS max_b,
    FIRST(U.balanceAfter) AS u_first, LAST(U.balanceAfter) AS u_last
  ONE ROW PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
  SUBSET U = (A, C)
  DEFINE
    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
    B AS B.balanceBefore >= B.balanceAfter,
    C AS C.balanceBefore < C.balanceAfter
"""

ALL_ROWS_BODY = """
  PARTITION BY id ORDER BY event_time
  MEASURES FINAL COUNT(B.*) AS n_b, SUM(B.balanceAfter) AS sum_b,
           RUNNING COUNT(B.*) AS b_so_far
  ALL ROWS PER MATCH
  AFTER MATCH SKIP PAST LAST ROW
  PATTERN (A B* C) WITHIN INTERVAL '1' HOUR
  DEFINE
    A AS A.balanceBefore >= 10 AND A.balanceAfter < 10,
    B AS B.balanceBefore >= B.balanceAfter,
    C AS C.balanceBefore < C.balanceAfter
"""

# Round 13: PREV() physical-row navigation STREAMS — the operator
# computes the lag from its own watermark-sorted buffer and evaluates
# the predicate in-operator (token-gated DuckDB). The V-shape on the
# golden input emits key 2's two falling-run matches (STRT ba=6 and
# ba=4, both rising at 11:40); key 1's V (9→5→25) stays PENDING: its
# closing row is the stream frontier (inside the watermark delay), the
# streaming twin of "not yet decidable".
NAV_BODY = """
  PARTITION BY id ORDER BY event_time
  MEASURES STRT.balanceAfter AS strt_ba, COUNT(DOWN.*) AS n_down,
           UP.balanceAfter AS up_ba
  ONE ROW PER MATCH
  AFTER MATCH SKIP TO NEXT ROW
  PATTERN (STRT DOWN+ UP)
  DEFINE
    DOWN AS DOWN.balanceAfter < PREV(DOWN.balanceAfter),
    UP AS UP.balanceAfter > PREV(UP.balanceAfter)
"""


def main() -> None:
    spark = session()
    batch = input_df(spark, sys.argv)
    src = os.path.join(tempfile.mkdtemp(), "billing_stream")
    batch.coalesce(1).write.parquet(src)
    time.sleep(0.2)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    for name, body in (
        ("one_row", ONE_ROW_BODY),
        ("all_rows", ALL_ROWS_BODY),
        ("vshape_prev", NAV_BODY),
    ):
        out = match_recognize(stream, body)
        q = (
            out.writeStream.format("memory")
            .queryName(f"golden_{name}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        order = {
            "one_row": ["id"],
            "all_rows": ["id", "event_time"],
            "vshape_prev": ["id", "strt_ba"],
        }[name]
        spark.table(f"golden_{name}").orderBy(*order).show(truncate=False)


if __name__ == "__main__":
    main()
