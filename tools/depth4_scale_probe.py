"""Depth-4 nested-group 10× probe (VERDICT r10 item 6).

Depth-4 nesting (``((((A B)+ C)+ D)+ E)+``, 4 loop groups) is validated
for correctness on the NFA tier (round 10: burst-mutation sequences vs
Python ``re``, tests/test_nested_groups.py::test_depth4_skip_past_
matches_re) but had no SCALING row. No catalog query uses depth 4 — it
is two extensions beyond the reference — so this probe measures the NFA
tier directly with the same protocol the nested3 PRE-KERNEL measurement
used: burst-mutation rows (uniform random rows essentially never
complete a depth-4 pattern) at 1× and K×=10 DISJOINT key spaces,
min-of-2 per scale.

Usage: python tools/depth4_scale_probe.py [K]
Prints one JSON line with 1×/K× timings and the growth ratio; the
result is recorded in SCALING.md.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cep_examples_spark.session import get_spark  # noqa: E402
from flink_cep_examples_spark.sql.match_recognize import (  # noqa: E402
    match_recognize,
)

BODY = """
PARTITION BY user_id ORDER BY ts, event_id
MEASURES COUNT(A.*) AS na, COUNT(E.*) AS ne
ONE ROW PER MATCH
AFTER MATCH SKIP PAST LAST ROW
PATTERN (((((A B)+ C)+ D)+ E)+)
DEFINE A AS event_id % 6 = 1, B AS event_id % 6 = 2,
       C AS event_id % 6 = 3, D AS event_id % 6 = 4,
       E AS event_id % 6 = 5
"""


def _burst(rng: random.Random) -> list[int]:
    """One depth-4-shaped burst (tests' _gen_d4_distinct)."""
    out = []
    for _ in range(rng.randrange(1, 3)):
        for _ in range(rng.randrange(1, 3)):
            for _ in range(rng.randrange(1, 3)):
                for _ in range(rng.randrange(1, 3)):
                    out += [1, 2]
                out.append(3)
            out.append(4)
        out.append(5)
    return out


def gen_rows(n_users: int, rows_per_user: int, seed: int, key_base: int):
    rng = random.Random(seed)
    rows = []
    for u in range(n_users):
        ms: list[int] = []
        while len(ms) < rows_per_user:
            ms += _burst(rng)
            # mutations keep partial/broken shapes frequent
            for _ in range(rng.randrange(0, 4)):
                if not ms:
                    break
                op, pos = rng.random(), rng.randrange(len(ms))
                if op < 0.4:
                    ms.pop(pos)
                elif op < 0.8:
                    ms[pos] = rng.randrange(0, 6)
                else:
                    ms.insert(pos, rng.randrange(0, 6))
        t = 0
        for m in ms[:rows_per_user]:
            t += rng.randrange(0, 3)
            rows.append((key_base + u, t, m))
    return rows


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(
        app_name="depth4-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = dt.datetime(2024, 1, 1)

    def df_of(rows):
        return spark.createDataFrame(
            [(u, base + dt.timedelta(minutes=m), e) for u, m, e in rows],
            "user_id long, ts timestamp, event_id long",
        ).cache()

    n_users, rpu = 64, 2000
    rows1 = gen_rows(n_users, rpu, seed=7, key_base=0)
    rowsk = list(rows1)
    for rep in range(1, k):
        rowsk += gen_rows(n_users, rpu, seed=7 + rep, key_base=rep * 100000)
    d1, dk = df_of(rows1), df_of(rowsk)
    d1.count(), dk.count()

    def measure(df):
        ts, out = [], None
        for _ in range(2):
            t0 = time.time()
            out = match_recognize(df, BODY, tiebreak_col="event_id").collect()
            ts.append(time.time() - t0)
        return min(ts), len(out)

    t1, m1 = measure(d1)
    tk, mk = measure(dk)
    print(
        json.dumps(
            {
                "pattern": "((((A B)+ C)+ D)+ E)+ depth-4 NFA tier",
                "rows1": len(rows1),
                "rowsK": len(rowsk),
                "t1": round(t1, 3),
                "tK": round(tk, 3),
                "growth": round(tk / t1, 2),
                "matches1": m1,
                "matchesK": mk,
                "k": k,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
