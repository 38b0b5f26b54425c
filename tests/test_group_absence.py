"""Absence/timeout emission composed with LONGEST-derivation loop
groups (round 8): the reference's defining capability — the timed-out
partial side output (FlinkCEPAbsenceOfEventExample.scala:93-103,
TimedOutPartialMatchHandler) — now works on grouped patterns
(``(X Y)+`` / ``(X Y)+ Z`` with WITHIN), which round 7 rejected loudly
(plans/pattern.py validate).

Semantics under test (operators/nfa.py::Nfa.advance_time longest walk):

- an expired run whose start HOLDS a completion is a decided MATCH —
  the match channel wins, never the timeout channel (a start that
  matched within the deadline is not a timed-out partial);
- only never-matched partials emit timeout rows (Flink's contract:
  the timeout handler sees partial matches whose deadline passed, not
  failed ones — a run killed by a contiguity break emits nothing);
- under AFTER MATCH SKIP PAST LAST ROW an emitted match's span
  discards later-started partials (their timeouts never emit), the
  same discipline the engine applies to mid-stream emission.

The differential oracle is a from-scratch mini-simulator written
directly from these rules (per-row event loop, expiry before
consumption, decision in start order) — structurally unlike the
engine's branch/held machinery.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_cep_examples_spark.operators import nfa as N
from flink_cep_examples_spark.plans.pattern import (
    NO_SKIP,
    PatternSpec,
    PatternVar,
    SKIP_PAST_LAST_EVENT,
    SKIP_TO_NEXT,
)

WITHIN_MS = 10


def _spec(after, has_z: bool):
    vars_ = (PatternVar("X", "px"), PatternVar("Y", "py"))
    if has_z:
        vars_ += (PatternVar("Z", "pz"),)
    return PatternSpec(
        variables=vars_,
        loop_groups=((0, 1),),
        after_match=after,
        within=dt.timedelta(milliseconds=WITHIN_MS),
        derivation="longest",
        emit_timeouts=True,
    ).validate()


def _run_nfa(spec, ms, times_ms, has_z: bool):
    """Drive the engine; classes: 1=X, 2=Y, 3=Z, 0=inert. Returns
    (matches, timeouts) as row-index tuples: match = (start, end,
    x_count); timeout = (start, last_consumed, x_count)."""
    eng = N.Nfa(spec)
    stt = N.NfaState()
    matches, touts = [], []
    for i, m in enumerate(ms):
        preds = (m == 1, m == 2, m == 3) if has_z else (m == 1, m == 2)
        mt, to = eng.step(stt, times_ms[i] * 1000, preds, i)
        matches.extend(mt)
        touts.extend(to)
    mt, to = eng.finish(stt)
    matches.extend(mt)
    touts.extend(to)

    def tup(d):
        first = min(sp[3] for sp in d.values())
        last = max(sp[4] for sp in d.values())
        return (first, last, d["X"][2])

    return sorted(tup(d) for d in matches), sorted(tup(d) for d in touts)


def _brute(ms, times_ms, has_z: bool, skip_past: bool):
    """Mini-simulator, from the rules in the module docstring.

    Runs are just start indices — strict contiguity means a live run
    at row j has consumed exactly rows start..j-1. Expiry (strict
    ``>=`` at start+within) happens BEFORE a row is consumed; decided
    runs resolve in start order; a match under skip-past discards
    every live/deciding run whose start lies inside its span."""
    n = len(ms)
    runs: list[int] = []  # live starts, ascending
    matches, touts = [], []

    def xcount(s, last):
        return (last - s) // 2 + 1

    def decide_batch(decisions):
        """decisions: list of (start, kind, end) with kind 'match' or
        'timeout', resolved in start order; a skip-past match's span
        discards every later decision AND live run starting inside it."""
        nonlocal runs
        cutoff = -1  # starts <= cutoff are inside an emitted span
        for s, kind, end in sorted(decisions):
            if s <= cutoff:
                continue
            if kind == "match":
                pairs = (end - s + 1) // 2 if not has_z else (end - s) // 2
                matches.append((s, end, pairs))
                if skip_past:
                    cutoff = end
                    runs = [r for r in runs if r > end]
            else:
                touts.append((s, end, xcount(s, end)))

    for j in range(n + 1):
        t = times_ms[j] if j < n else None
        # 1. expiry at this row's event time (or end-of-input horizon)
        expired = [
            s
            for s in runs
            if t is None or t - times_ms[s] >= WITHIN_MS
        ]
        if expired:
            runs = [s for s in runs if s not in set(expired)]
            decisions = []
            for s in expired:
                consumed = j - s  # rows s..j-1
                pairs = consumed // 2
                if not has_z and pairs >= 1:
                    # held longest completion emits as a MATCH
                    decisions.append((s, "match", s + 2 * pairs - 1))
                else:
                    decisions.append((s, "timeout", j - 1))
            decide_batch(decisions)
        if t is None:
            break
        m = ms[j]
        # 2. consumption: deaths, completions, continuations
        survivors, decisions = [], []
        for s in runs:
            off = j - s
            if off % 2 == 1:  # expects Y
                if m == 2:
                    survivors.append(s)
                elif not has_z and off >= 2:
                    # contiguity break after >=1 pair: held emits
                    decisions.append((s, "match", s + (off // 2) * 2 - 1))
                # else: pairless death, silent
            else:  # expects X (continue) or Z (complete, has_z)
                if m == 1:
                    survivors.append(s)
                elif has_z and m == 3 and off >= 2:
                    decisions.append((s, "match", j))
                elif not has_z and off >= 2:
                    decisions.append((s, "match", s + (off // 2) * 2 - 1))
        runs = survivors
        if decisions:
            decide_batch(decisions)
        if m == 1:  # every X row starts a run (cutoffs apply at emission)
            runs.append(j)
            runs.sort()
    return sorted(matches), sorted(touts)


def _case(spec_after, has_z, ms, times_ms):
    skip_past = spec_after == SKIP_PAST_LAST_EVENT
    got = _run_nfa(_spec(spec_after, has_z), ms, times_ms, has_z)
    want = _brute(ms, times_ms, has_z, skip_past)
    assert got == want, f"{ms=} {times_ms=} got={got} want={want}"


# --- hand cases (the scenarios from the design note) ------------------


def test_held_completion_wins_over_timeout():
    # X Y then expiry: the held pair is a decided match, NOT a timeout
    _case(SKIP_PAST_LAST_EVENT, False, [1, 2, 0], [0, 1, 50])


def test_dangling_x_expires_to_timeout():
    _case(SKIP_PAST_LAST_EVENT, False, [1, 0], [0, 50])
    _case(SKIP_PAST_LAST_EVENT, False, [1], [0])


def test_group_chain_without_z_times_out_with_pairs():
    # (X Y)+ Z: the whole chain is a timed-out partial (2-pair and
    # 1-pair runs both expire; Flink emits one timeout per partial)
    got = _run_nfa(
        _spec(SKIP_PAST_LAST_EVENT, True), [1, 2, 1, 2, 0], [0, 1, 2, 3, 50], True
    )
    assert got == ([], [(0, 3, 2), (2, 3, 1)])


def test_group_z_within_deadline_matches():
    _case(SKIP_PAST_LAST_EVENT, True, [1, 2, 3], [0, 1, 2])


def test_match_then_dangling_timeout():
    _case(SKIP_PAST_LAST_EVENT, True, [1, 2, 3, 1, 0], [0, 1, 2, 3, 50])


def test_span_discard_suppresses_inner_timeouts():
    # the 2-pair match's span covers the start at row 2 — no timeout
    got = _run_nfa(
        _spec(SKIP_PAST_LAST_EVENT, False), [1, 2, 1, 2], [0, 1, 2, 3], False
    )
    assert got == ([(0, 3, 2)], [])


def test_deadline_caps_match_then_tail_times_out():
    # within=10: pairs at 0,1 fit; row2 X at t=9 starts/extends, row3
    # at t=30 expires everything — start 0 matches 1 pair (rows 2
    # consumed but incomplete), start 2 is a dangling-X timeout
    _case(SKIP_PAST_LAST_EVENT, False, [1, 2, 1, 2], [0, 1, 9, 30])


def test_staggered_expiries_separate_advance_calls():
    _case(SKIP_PAST_LAST_EVENT, False, [1, 2, 1, 2, 0, 1, 2], [0, 1, 2, 3, 11, 30, 31])


# --- Hypothesis differentials -----------------------------------------

_CLASSES = st.integers(min_value=0, max_value=2)
_CLASSES_Z = st.integers(min_value=0, max_value=3)


@st.composite
def _timed_seq(draw, classes):
    ms = draw(st.lists(classes, max_size=28))
    gaps = draw(
        st.lists(
            st.integers(min_value=1, max_value=8),
            min_size=len(ms),
            max_size=len(ms),
        )
    )
    times, t = [], 0
    for g in gaps:
        t += g
        times.append(t)
    return ms, times


@settings(max_examples=300, deadline=None)
@given(_timed_seq(_CLASSES))
def test_trailing_group_timeout_skip_past_matches_brute(seq):
    ms, times = seq
    _case(SKIP_PAST_LAST_EVENT, False, ms, times)


@settings(max_examples=300, deadline=None)
@given(_timed_seq(_CLASSES))
def test_trailing_group_timeout_skip_next_matches_brute(seq):
    ms, times = seq
    _case(SKIP_TO_NEXT, False, ms, times)


@settings(max_examples=300, deadline=None)
@given(_timed_seq(_CLASSES_Z))
def test_group_suffix_timeout_skip_past_matches_brute(seq):
    ms, times = seq
    _case(SKIP_PAST_LAST_EVENT, True, ms, times)


@settings(max_examples=300, deadline=None)
@given(_timed_seq(_CLASSES_Z))
def test_group_suffix_timeout_skip_next_matches_brute(seq):
    ms, times = seq
    _case(SKIP_TO_NEXT, True, ms, times)


@settings(max_examples=200, deadline=None)
@given(_timed_seq(_CLASSES))
def test_trailing_group_timeout_no_skip_matches_brute(seq):
    ms, times = seq
    _case(NO_SKIP, False, ms, times)
