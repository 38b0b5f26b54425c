"""The NFA core: event-time row-pattern matching, incremental.

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
  than the current event time is pruned *before* the row is processed,
  so a completion at exactly ``start + within`` does NOT match (Flink
  prunes on ``ts - start >= window``; confirmed by the golden fixtures:
  40 min gap → match, 2.5 h → timeout);
- after-match SKIP_PAST_LAST_EVENT (FlinkCEPExample.scala:58): on
  emission, discard every partial — including a run begun at the
  match's own last row — and resume scanning after it; NO_SKIP emits
  all completions;
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

The engine is **incremental**: :class:`Nfa` holds the compiled pattern;
:class:`NfaState` is a small picklable per-key state (live runs), fed
one row at a time via :meth:`Nfa.step` — the same object drives the
batch operator (whole sorted group) and the Structured Streaming
operator (rows released as the watermark advances, state persisted in
the state store between micro-batches).

Rows are abstracted as *payloads* (the caller decides what a branch
must remember per matched row — a row index in batch, a tuple of
measure values in streaming), so the engine itself only ever touches
booleans and int64 timestamps; every predicate was evaluated vectorized
in Spark SQL before the shuffle (SURVEY §4: the biggest perf lever).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

from flink_cep_examples_spark.plans.pattern import (
    RELAXED,
    SKIP_PAST_LAST_EVENT,
    PatternSpec,
)


class _Branch(NamedTuple):
    var: int  # index of the variable currently being filled
    count: int  # rows consumed by that variable so far
    # per-variable (first_payload, last_payload, count) or None
    rows: tuple


class _Run:
    """One NFA run (all branches sharing a start row). Picklable."""

    __slots__ = ("start_ts", "seq", "branches")

    def __init__(self, start_ts: int, seq: int, branches: list[_Branch]):
        self.start_ts = start_ts
        self.seq = seq  # creation order; earliest run wins emission priority
        self.branches = branches

    def __getstate__(self):
        return (self.start_ts, self.seq, self.branches)

    def __setstate__(self, s):
        self.start_ts, self.seq, self.branches = s


class NfaState:
    """Per-key mutable state: live runs + a monotonically increasing run
    counter. Small (bounded by the ``within`` horizon) and picklable for
    the streaming state store."""

    __slots__ = ("runs", "next_seq")

    def __init__(self) -> None:
        self.runs: list[_Run] = []
        self.next_seq = 0

    def __getstate__(self):
        return (self.runs, self.next_seq)

    def __setstate__(self, s):
        self.runs, self.next_seq = s


class Nfa:
    """Compiled pattern + transition logic (stateless; shareable)."""

    def __init__(self, spec: PatternSpec):
        spec.validate()
        self.spec = spec
        self.n_vars = len(spec.variables)
        self.within_us = (
            int(spec.within.total_seconds() * 1_000_000)
            if spec.within is not None
            else None
        )
        self.skip_past = spec.after_match == SKIP_PAST_LAST_EVENT
        self.emit_timeouts = spec.emit_timeouts
        self._empty_rows = (None,) * self.n_vars
        # successors[i]: vars consumable after i (epsilon-skip optionals)
        self._succ: list[list[int]] = []
        for i in range(self.n_vars):
            out, j = [], i + 1
            while j < self.n_vars:
                out.append(j)
                if not spec.variables[j].optional:
                    break
                j += 1
            self._succ.append(out)
        # complete[i]: consuming into var i may finish the match
        self._complete = [
            all(v.optional for v in spec.variables[i + 1 :])
            for i in range(self.n_vars)
        ]
        self._can_loop = [v.can_loop for v in spec.variables]
        self._relaxed = [v.contiguity == RELAXED for v in spec.variables]
        # A branch sitting at var i survives a row it cannot consume iff
        # something it is WAITING FOR is relaxed: a relaxed successor
        # (contiguity describes a var's relation to its predecessor), or
        # its own next loop iteration when the looping var is relaxed.
        self._wait_relaxed = [
            any(self._relaxed[j] for j in self._succ[i])
            or (self._can_loop[i] and self._relaxed[i])
            for i in range(self.n_vars)
        ]

    # -- helpers ------------------------------------------------------
    def _extend(self, br: _Branch, var: int, payload) -> _Branch:
        rows = list(br.rows)
        cur = rows[var]
        rows[var] = (
            (payload, payload, 1) if cur is None else (cur[0], payload, cur[2] + 1)
        )
        count = br.count + 1 if var == br.var else 1
        return _Branch(var, count, tuple(rows))

    def _branch_dict(self, br: _Branch) -> dict:
        return {
            self.spec.variables[i].name: br.rows[i]
            for i in range(self.n_vars)
            if br.rows[i] is not None
        }

    def _timeout_dict(self, run: _Run) -> dict:
        best = max(run.branches, key=lambda b: sum(r[2] for r in b.rows if r))
        return self._branch_dict(best)

    # -- engine steps -------------------------------------------------
    def advance_time(self, st: NfaState, t_us: int) -> list[dict]:
        """Prune partials whose deadline has passed at time ``t_us``
        (an arriving row's event time, or the watermark). Returns
        timeout emissions (empty unless ``emit_timeouts``)."""
        if self.within_us is None or not st.runs:
            return []
        timeouts, live = [], []
        for run in st.runs:
            if t_us - run.start_ts >= self.within_us:
                if self.emit_timeouts:
                    timeouts.append(self._timeout_dict(run))
            else:
                live.append(run)
        st.runs = live
        return timeouts

    def step(
        self, st: NfaState, t_us: int, pred_row, payload
    ) -> tuple[list[dict], list[dict]]:
        """Process one event-time-ordered row. ``pred_row[i]`` is the
        precomputed boolean of variable i's predicate on this row.
        Returns ``(matches, timeouts)`` as var-name → (first, last,
        count) payload dicts."""
        timeouts = self.advance_time(st, t_us)

        completed: list[tuple[int, _Branch]] = []  # (run seq, branch)
        for run in st.runs:
            new_branches: list[_Branch] = []
            seen = set()
            for br in run.branches:
                moved = False
                if self._can_loop[br.var] and pred_row[br.var]:
                    nb = self._extend(br, br.var, payload)
                    moved = True
                    if self._complete[br.var]:
                        completed.append((run.seq, nb))
                    if (nb.var, nb.rows) not in seen:
                        seen.add((nb.var, nb.rows))
                        new_branches.append(nb)
                for j in self._succ[br.var]:
                    if pred_row[j]:
                        nb = self._extend(br, j, payload)
                        moved = True
                        if self._complete[j]:
                            completed.append((run.seq, nb))
                            if not self._can_loop[j]:
                                continue  # final once-var: branch ends
                        if (nb.var, nb.rows) not in seen:
                            seen.add((nb.var, nb.rows))
                            new_branches.append(nb)
                if not moved and self._wait_relaxed[br.var]:
                    if (br.var, br.rows) not in seen:
                        seen.add((br.var, br.rows))
                        new_branches.append(br)
            run.branches = new_branches
        st.runs = [r for r in st.runs if r.branches]

        # begin-state branching: a fresh run starts at this row
        if pred_row[0]:
            nb = self._extend(_Branch(0, 0, self._empty_rows), 0, payload)
            run = _Run(t_us, st.next_seq, [nb])
            st.next_seq += 1
            if self._complete[0]:
                completed.append((run.seq, nb))
                if not self._can_loop[0]:
                    run.branches = []
            if run.branches:
                st.runs.append(run)

        matches: list[dict] = []
        if completed:
            completed.sort(key=lambda rc: rc[0])
            if self.skip_past:
                matches.append(self._branch_dict(completed[0][1]))
                st.runs = []  # discard every partial (incl. run begun here)
            else:
                matches.extend(self._branch_dict(br) for _, br in completed)
        return matches, timeouts

    def finish(self, st: NfaState) -> list[dict]:
        """End of input (batch) — watermark → ∞: every partial times out."""
        timeouts = (
            [self._timeout_dict(run) for run in st.runs] if self.emit_timeouts else []
        )
        st.runs = []
        return timeouts


def scan_key_group(
    spec,  # PatternSpec, or a pre-compiled Nfa (hot loops pass the Nfa)
    preds: np.ndarray,  # bool[n_vars, n_rows], rows already event-time sorted
    ts_us: np.ndarray,  # int64[n_rows]
) -> tuple[list[dict], list[dict]]:
    """Batch driver: run the NFA over one sorted key group with the row
    index as payload. Returns (matches, timeouts); each dict maps
    var name → (first_row_idx, last_row_idx, count)."""
    nfa = spec if isinstance(spec, Nfa) else Nfa(spec)
    st = NfaState()
    matches: list[dict] = []
    timeouts: list[dict] = []
    n = ts_us.shape[0]
    cols = [preds[i] for i in range(preds.shape[0])]
    for r in range(n):
        pred_row = tuple(bool(c[r]) for c in cols)
        m, to = nfa.step(st, int(ts_us[r]), pred_row, r)
        matches.extend(m)
        timeouts.extend(to)
    timeouts.extend(nfa.finish(st))
    return matches, timeouts
