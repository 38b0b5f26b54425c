"""Deterministic driver-gate rotation planner (COVERAGE.md policy).

The driver correctness gate records at most 50 rows per round, while the
catalog is larger, so each round rotates which queries occupy the gate.
The policy (documented in COVERAGE.md §rotation) is deterministic and
history-driven so every query gets a driver row within a bounded number
of rounds:

1. PROMOTE, in order, until the gate is full:
   a. queries that have NEVER had a green driver row (never-verified
      pool — round 5 proved this pool is where gate misses hide),
   b. then queries with the fewest green rounds,
   c. then the query whose most recent green is OLDEST,
   ties broken by name (ascending).
2. DEMOTE the complement: currently-gated queries with the MOST green
   rounds / most recent greens leave first.
3. New queries register ``driver=True`` when the cap allows, else they
   join the never-verified pool at the head of next round's promotions.

Usage: python tools/rotation.py  — prints the promotion queue for the
next round, derived from CORRECTNESS_r*.json files at the repo root.
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def history() -> dict[str, list[int]]:
    """query name -> sorted list of rounds with a green driver row."""
    greens: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            if ok:
                greens.setdefault(name, []).append(rnd)
    return {k: sorted(v) for k, v in greens.items()}


def promotion_queue() -> list[tuple[str, list[int]]]:
    """Full catalog ordered by the rotation policy (most-deserving of a
    driver row first)."""
    from flink_cep_examples_spark.queries import QUERIES, load_all

    load_all()
    greens = history()
    names = sorted(QUERIES)

    def key(n: str):
        g = greens.get(n, [])
        # never-verified first (0 greens), then fewest greens, then
        # oldest most-recent green, then name
        return (len(g), g[-1] if g else 0, n)

    return [(n, greens.get(n, [])) for n in sorted(names, key=key)]


def main() -> int:
    from flink_cep_examples_spark.queries import DRIVER_QUERIES, load_all

    load_all()
    gated = set(DRIVER_QUERIES)
    print(f"{'query':40s} {'greens':20s} gated")
    for name, g in promotion_queue():
        print(f"{name:40s} {str(g):20s} {'*' if name in gated else ''}")
    never = [n for n, g in promotion_queue() if not g]
    print(f"\nnever-driver-verified pool ({len(never)}): {never}")
    stale = [n for n, g in promotion_queue() if g and n not in gated][:10]
    print(f"next-stalest non-gated (promote after pool drains): {stale}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
