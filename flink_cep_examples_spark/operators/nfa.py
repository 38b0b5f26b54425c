"""The NFA core: event-time row-pattern matching over one key group.

This is the engine's heart — the part Spark has no built-in for
(SURVEY §4 "what can never be Catalyst"). It re-implements, from the
observable semantics of the reference, Flink-CEP-style NFA simulation:

- per-key runs started at every row matching the first variable
  (begin state branching);
- strict contiguity (``.next``, FlinkCEPExample.scala:64,69): a live
  branch must consume the next row or die; relaxed contiguity
  (``.followedBy``) skips non-matching rows — engine extension;
- quantifiers ``+ * ?`` with epsilon-skip over optional variables;
- ``within`` deadline: a partial whose first row is ≥ `within` older
  than the current row is pruned *before* the row is processed, so a
  completion at exactly ``start + within`` does NOT match (Flink prunes
  on ``ts - start >= window``; confirmed by the golden fixtures: 40 min
  gap → match, 2.5 h → timeout);
- after-match SKIP_PAST_LAST_EVENT (FlinkCEPExample.scala:58): on
  emission, discard every partial and resume scanning after the match's
  last row; NO_SKIP emits all completions;
- timeout emission (absence-of-event,
  FlinkCEPAbsenceOfEventExample.scala:93-103): a pruned partial emits
  one timeout row (dedup: one per run, using its longest branch — with
  mutually-exclusive predicates, the reference class, a run has exactly
  one branch, so this equals Flink's per-partial emission).

Design notes (deliberate, documented deviations):
- loop-iteration contiguity follows the variable's own contiguity
  (MATCH_RECOGNIZE-style strictness for ``.next`` loops). Flink's
  default loop contiguity is relaxed unless ``.consecutive()``; for the
  reference pattern B's predicate is the complement of C's, so the two
  semantics coincide (any row between two Bs is either a B or completes
  the match).
- matches complete the moment the final state is reached (non-greedy
  emission); patterns ending in a loop variable emit on each extension
  under NO_SKIP. The reference pattern ends in a ``once`` variable, so
  this is unobservable there.

The scan is pure Python but touches only precomputed numpy boolean
arrays and int64 timestamps — all predicate evaluation happened
vectorized in Spark SQL before the shuffle (the single biggest perf
lever, SURVEY §4). At 100 TB the per-key state stays bounded by the
``within`` horizon; the batch entry point additionally offers a pure
DataFrame fast path (operators/fast_path.py) with no Python at all.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from flink_cep_examples_spark.plans.pattern import (
    NO_SKIP,
    RELAXED,
    SKIP_PAST_LAST_EVENT,
    PatternSpec,
)


class _Branch(NamedTuple):
    var: int  # index of the variable currently being filled
    count: int  # rows consumed by that variable so far
    # per-variable (first_row, last_row, count) or None if not reached
    rows: tuple


class _Run:
    __slots__ = ("start", "start_ts", "branches")

    def __init__(self, start: int, start_ts: int, branches: list[_Branch]):
        self.start = start
        self.start_ts = start_ts
        self.branches = branches


def _successors(spec: PatternSpec, var: int) -> list[int]:
    """Variables a branch at ``var`` may consume next (excluding the
    stay-in-loop option): the chain of following variables, stopping
    after the first non-optional one (epsilon-skip over optionals)."""
    out = []
    j = var + 1
    n = len(spec.variables)
    while j < n:
        out.append(j)
        if not spec.variables[j].optional:
            break
        j += 1
    return out


def _is_complete(spec: PatternSpec, var: int) -> bool:
    """A branch that just consumed a row into ``var`` is a complete match
    iff every later variable is optional."""
    return all(v.optional for v in spec.variables[var + 1 :])


def _extend(br: _Branch, var: int, row: int) -> _Branch:
    rows = list(br.rows)
    cur = rows[var]
    rows[var] = (row, row, 1) if cur is None else (cur[0], row, cur[2] + 1)
    count = br.count + 1 if var == br.var else 1
    return _Branch(var, count, tuple(rows))


def scan_key_group(
    spec: PatternSpec,
    preds: np.ndarray,  # bool[n_vars, n_rows], rows already event-time sorted
    ts_ms: np.ndarray,  # int64[n_rows]
):
    """Run the NFA over one sorted key group.

    Returns ``(matches, timeouts)`` where each match is a dict
    ``var_name -> (first_row, last_row, count)`` plus ``"_last"`` (index
    of the match's last row), and each timeout is the same for the
    partial's consumed variables.
    """
    n_vars = len(spec.variables)
    n = ts_ms.shape[0]
    # timestamps arrive as exact integer microseconds (unix_micros)
    within_ms = (
        int(spec.within.total_seconds() * 1_000_000)
        if spec.within is not None
        else None
    )
    skip_past = spec.after_match == SKIP_PAST_LAST_EVENT
    empty_rows = (None,) * n_vars

    runs: list[_Run] = []
    matches: list[dict] = []
    timeouts: list[dict] = []
    cursor = -1  # rows ≤ cursor are consumed by an emitted match

    def _branch_to_dict(br: _Branch, last_row: int) -> dict:
        d = {
            spec.variables[i].name: br.rows[i]
            for i in range(n_vars)
            if br.rows[i] is not None
        }
        d["_last"] = last_row
        return d

    def _timeout(run: _Run) -> None:
        # one timeout per run: its longest (most-consumed) branch
        best = max(run.branches, key=lambda b: sum(r[2] for r in b.rows if r))
        timeouts.append(_branch_to_dict(best, run.start))

    pred_cols = [preds[i] for i in range(n_vars)]
    first_pred = pred_cols[0]

    for r in range(n):
        t = int(ts_ms[r])

        # 1. prune timed-out partials before processing the row
        if within_ms is not None and runs:
            live = []
            for run in runs:
                if t - run.start_ts >= within_ms:
                    if spec.emit_timeouts:
                        _timeout(run)
                else:
                    live.append(run)
            runs = live

        # 2. advance live runs with row r
        completed: list[tuple[_Run, _Branch]] = []
        for run in runs:
            new_branches: list[_Branch] = []
            seen = set()
            for br in run.branches:
                v = spec.variables[br.var]
                moved = False
                # stay in loop
                if v.can_loop and pred_cols[br.var][r]:
                    nb = _extend(br, br.var, r)
                    moved = True
                    if _is_complete(spec, br.var):
                        completed.append((run, nb))
                    key = (nb.var, nb.rows)
                    if key not in seen:
                        seen.add(key)
                        new_branches.append(nb)
                # advance to a later variable
                for j in _successors(spec, br.var):
                    if pred_cols[j][r]:
                        nb = _extend(br, j, r)
                        moved = True
                        if _is_complete(spec, j):
                            completed.append((run, nb))
                            if not spec.variables[j].can_loop:
                                continue  # final once-var: branch ends here
                        key = (nb.var, nb.rows)
                        if key not in seen:
                            seen.add(key)
                            new_branches.append(nb)
                if not moved and v.contiguity == RELAXED:
                    # relaxed: survive a non-matching row unchanged
                    key = (br.var, br.rows)
                    if key not in seen:
                        seen.add(key)
                        new_branches.append(br)
                # strict + no transition → branch dies (drop it)
            run.branches = new_branches
        runs = [run for run in runs if run.branches]

        # 3. start a new run at r (begin-state branching)
        if r > cursor and first_pred[r]:
            nb = _extend(_Branch(0, 0, empty_rows), 0, r)
            run = _Run(r, t, [nb])
            if _is_complete(spec, 0):
                completed.append((run, nb))
                if not spec.variables[0].can_loop:
                    run.branches = []
            if run.branches:
                runs.append(run)

        # 4. emit completions
        if completed:
            completed.sort(key=lambda rc: rc[0].start)
            if skip_past:
                run, br = completed[0]
                matches.append(_branch_to_dict(br, r))
                runs = []  # discard every partial; resume past last row
                cursor = r
            else:  # NO_SKIP: emit all completions, partials keep running
                for run, br in completed:
                    matches.append(_branch_to_dict(br, r))

    # 5. end of input = watermark → ∞: every surviving partial times out
    if spec.emit_timeouts:
        for run in runs:
            _timeout(run)

    return matches, timeouts
