"""Leading-optional begin states (round 9).

A pattern whose FIRST variable is optional (``A? B``) or a zero-or-more
loop (``B* C``) may match with that variable absorbing ZERO rows, so a
run must be able to begin at any position in the epsilon-closure of
position 0 (SQL:2016 row-pattern semantics; Flink CEP's
``begin(...).optional()`` behaves the same). Before round 9 the NFA
only ever opened runs at position 0 — a lone ``b`` under ``A? B``
silently produced nothing while the compiled window kernels matched it,
i.e. the two execution tiers diverged (same family as the r8
multi-branch-prefix bug, ADVICE r8 #1).

Oracle: Python ``re`` on the classified row string — for these strict
single-char-class shapes, AFTER MATCH SKIP PAST LAST ROW is exactly
``re.finditer`` (leftmost, greedy, non-overlapping) and SKIP TO NEXT
ROW is ``re.match`` anchored at every position.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_cep_examples_spark.operators import nfa as N
from flink_cep_examples_spark.plans.pattern import (
    ONE_OR_MORE,
    OPTIONAL,
    PatternSpec,
    PatternVar,
    SKIP_PAST_LAST_EVENT,
    SKIP_TO_NEXT,
    ZERO_OR_MORE,
)

_LETTER = {0: ".", 1: "a", 2: "b", 3: "c"}
_NAME_CLS = {"A": 1, "B": 2, "C": 3}


def _run(spec, ms):
    def preds(m):
        return tuple(m == _NAME_CLS[v.name] for v in spec.variables)

    eng = N.Nfa(spec)
    stt = N.NfaState()
    out = []
    for i, m in enumerate(ms):
        mt, _ = eng.step(stt, i * 1000, preds(m), i)
        out.extend(mt)
    mt, _ = eng.finish(stt)
    out.extend(mt)
    return sorted(
        (min(s[3] for s in d.values()), max(s[4] for s in d.values()))
        for d in out
    )


def _brute_finditer(rx, ms):
    s = "".join(_LETTER[m] for m in ms)
    return sorted((mt.start(), mt.end() - 1) for mt in rx.finditer(s))


def _brute_per_start(rx, ms):
    s = "".join(_LETTER[m] for m in ms)
    out = []
    for i in range(len(s)):
        mt = rx.match(s, i)
        if mt:
            out.append((i, mt.end() - 1))
    return sorted(out)


def _opt_b(after=SKIP_PAST_LAST_EVENT):  # A? B
    return PatternSpec(
        variables=(
            PatternVar("A", "pa", quantifier=OPTIONAL),
            PatternVar("B", "pb"),
        ),
        after_match=after,
    ).validate()


def _star_c(after=SKIP_PAST_LAST_EVENT):  # B* C
    return PatternSpec(
        variables=(
            PatternVar("B", "pb", quantifier=ZERO_OR_MORE),
            PatternVar("C", "pc"),
        ),
        after_match=after,
    ).validate()


def _opt_opt_c(after=SKIP_PAST_LAST_EVENT):  # A? B? C
    return PatternSpec(
        variables=(
            PatternVar("A", "pa", quantifier=OPTIONAL),
            PatternVar("B", "pb", quantifier=OPTIONAL),
            PatternVar("C", "pc"),
        ),
        after_match=after,
    ).validate()


def test_hand_cases():
    assert _run(_opt_b(), [2]) == [(0, 0)]  # the lost zero-width case
    assert _run(_opt_b(), [1, 2]) == [(0, 1)]
    assert _run(_opt_b(), [1]) == []
    assert _run(_star_c(), [3]) == [(0, 0)]
    assert _run(_star_c(), [2, 2, 3]) == [(0, 2)]
    assert _run(_opt_opt_c(), [3]) == [(0, 0)]
    assert _run(_opt_opt_c(), [2, 3]) == [(0, 1)]
    assert _run(_opt_opt_c(), [1, 2, 3]) == [(0, 2)]
    # a non-optional first variable keeps the single-begin hot path
    eng = N.Nfa(
        PatternSpec(
            variables=(PatternVar("A", "pa"), PatternVar("B", "pb")),
        ).validate()
    )
    assert eng._begin_positions == (0,)


_CLS = st.integers(min_value=0, max_value=3)

_OPT_B = re.compile(r"a?b")
_STAR_C = re.compile(r"b*c")
_OPT_OPT_C = re.compile(r"a?b?c")
_PLUS_C = re.compile(r"a+c")


@settings(max_examples=400, deadline=None)
@given(st.lists(_CLS, max_size=30))
def test_opt_b_skip_past_matches_re(ms):
    assert _run(_opt_b(), ms) == _brute_finditer(_OPT_B, ms)


@settings(max_examples=300, deadline=None)
@given(st.lists(_CLS, max_size=30))
def test_opt_b_skip_to_next_matches_re(ms):
    assert _run(_opt_b(SKIP_TO_NEXT), ms) == _brute_per_start(_OPT_B, ms)


@settings(max_examples=400, deadline=None)
@given(st.lists(_CLS, max_size=30))
def test_star_c_skip_past_matches_re(ms):
    assert _run(_star_c(), ms) == _brute_finditer(_STAR_C, ms)


@settings(max_examples=300, deadline=None)
@given(st.lists(_CLS, max_size=30))
def test_opt_opt_c_skip_past_matches_re(ms):
    assert _run(_opt_opt_c(), ms) == _brute_finditer(_OPT_OPT_C, ms)


@settings(max_examples=300, deadline=None)
@given(st.lists(_CLS, max_size=30))
def test_nonoptional_first_unaffected(ms):
    """Control: A+ C (non-optional first var) — the single-begin fast
    path — still matches ``re`` exactly after the begin-closure change.
    (The tail must be non-optional: eager emission completes ``A+ C?``
    at the first A, which ``re``'s greedy semantics never do.)"""
    spec = PatternSpec(
        variables=(
            PatternVar("A", "pa", quantifier=ONE_OR_MORE),
            PatternVar("C", "pc"),
        ),
    ).validate()
    assert _run(spec, ms) == _brute_finditer(_PLUS_C, ms)
