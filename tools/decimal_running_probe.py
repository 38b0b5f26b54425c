"""DECIMAL RUNNING-measure 10× probe (VERDICT r12 item 6).

The round-12 dtype gate (operators/fast_path.py::
fast_loop_chain_all_rows_applicable) routes RUNNING SUM/AVG/MIN/MAX
over DECIMAL/object source columns to the NFA tier — correct by design
(the float64 segmented kernels would silently fold exact decimals in
binary floating point) — but that tier's 10× growth on a
decimal-valued corpus had no SCALING.md row. This probe measures it
directly: the chain-kernel shape ``A B+ C`` with the full RUNNING
battery (MIN/MAX/SUM) over a DECIMAL(18,6) column, 1× and K×=10
disjoint key spaces, min-of-2 per scale. The kernelize-only-if->2×
rule from rounds 10-12 applies to the result.

Usage: python tools/decimal_running_probe.py [K]
Prints one JSON line; the result is recorded in SCALING.md.
"""

from __future__ import annotations

import datetime as dt
import decimal
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cep_examples_spark.session import get_spark  # noqa: E402
from flink_cep_examples_spark.sql.match_recognize import (  # noqa: E402
    match_recognize,
    parse_match_recognize,
)

BODY = """
PARTITION BY user_id ORDER BY ts, event_id
MEASURES RUNNING MIN(B.value) AS rmin, RUNNING MAX(B.value) AS rmax,
         RUNNING SUM(B.value) AS rsum, FINAL COUNT(B.*) AS nb
ALL ROWS PER MATCH
AFTER MATCH SKIP PAST LAST ROW
PATTERN (A B+ C)
DEFINE A AS event_id % 4 = 1, B AS event_id % 4 = 2,
       C AS event_id % 4 = 3
"""


def gen_rows(n_users: int, rows_per_user: int, seed: int, key_base: int):
    rng = random.Random(seed)
    rows = []
    for u in range(n_users):
        t = 0
        for _ in range(rows_per_user):
            t += rng.randrange(0, 3)
            rows.append(
                (
                    key_base + u,
                    t,
                    rng.randrange(0, 5),  # %4 classes + inert 4s
                    decimal.Decimal(rng.randrange(-10_000_000, 10_000_000))
                    / decimal.Decimal(1_000_000),
                )
            )
    return rows


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(
        app_name="decimal-running-probe",
        master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = dt.datetime(2024, 1, 1)

    def df_of(rows):
        return spark.createDataFrame(
            [
                (u, base + dt.timedelta(minutes=m), e, v)
                for u, m, e, v in rows
            ],
            "user_id long, ts timestamp, event_id long, value decimal(18,6)",
        ).cache()

    n_users, rpu = 64, 2000
    rows1 = gen_rows(n_users, rpu, seed=7, key_base=0)
    rowsk = list(rows1)
    for rep in range(1, k):
        rowsk += gen_rows(n_users, rpu, seed=7 + rep, key_base=rep * 100000)
    d1, dk = df_of(rows1), df_of(rowsk)
    d1.count(), dk.count()

    # the probe is only honest if the gate actually routes DECIMAL to
    # the NFA tier — assert the dispatch decision
    from flink_cep_examples_spark.operators.fast_path import (
        fast_loop_chain_all_rows_applicable,
    )

    spec = parse_match_recognize(BODY)
    assert not fast_loop_chain_all_rows_applicable(spec, d1), (
        "DECIMAL source unexpectedly took the float64 kernel"
    )

    def measure(df):
        ts, n = [], 0
        for _ in range(2):
            t0 = time.time()
            n = match_recognize(df, BODY, tiebreak_col="event_id").count()
            ts.append(time.time() - t0)
        return min(ts), n

    t1, n1 = measure(d1)
    tk, nk = measure(dk)
    print(
        json.dumps(
            {
                "probe": "decimal_running_nfa_tier",
                "rows_1x": n_users * rpu,
                "k": k,
                "t_1x_sec": round(t1, 3),
                "t_kx_sec": round(tk, 3),
                "out_rows_1x": n1,
                "out_rows_kx": nk,
                "growth_ratio_vs_linear": round(tk / (t1 * k), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
