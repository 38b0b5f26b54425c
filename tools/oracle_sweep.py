"""Full-catalog exact-mode oracle sweep — the local twin of the driver
gate, run over EVERY catalog query (not just the 50 gated ones) at a
given SF. Exit code 1 if any query fails.

Usage: python tools/oracle_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

from flink_cep_examples_spark.session import get_spark
from flink_cep_examples_spark.queries import QUERIES, ORACLES, load_all

from tests.oracle_harness import compare


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    load_all()
    names = sys.argv[2:] or sorted(ORACLES)
    spark = get_spark(
        app_name="oracle-sweep", master="local[16]", shuffle_partitions=16
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            ok, msg = compare(QUERIES[name](spark, sf), ORACLES[name], sf)
        except Exception as e:  # noqa: BLE001 — sweep must report, not die
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        dt = time.time() - t0
        tag = "ok " if ok else "FAIL"
        print(f"[{i + 1}/{len(names)}] {tag} {name} ({dt:.1f}s) {msg[:300]}",
              flush=True)
        if not ok:
            failures.append(name)
    print(f"\nsweep: {len(names) - len(failures)}/{len(names)} green; "
          f"failures: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
