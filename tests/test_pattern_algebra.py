"""Pattern-algebra semantics on the NFA core: after-match skip
strategies (incl. SKIP TO NEXT ROW), times(n[,m]), consecutive() /
allowCombinations() loop contiguity, and notNext / notFollowedBy
absence variables (incl. trailing timed absence).

Pure-NFA tests: predicates are pre-evaluated booleans (exactly what the
Spark operators feed the engine), so these pin engine semantics without
a SparkSession.
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_cep_examples_spark.operators.nfa import Nfa, NfaState, scan_key_group
from flink_cep_examples_spark.plans.pattern import (
    NO_SKIP,
    SKIP_PAST_LAST_EVENT,
    SKIP_TO_NEXT,
    Measure,
    Pattern,
)

MIN = 60_000_000  # one minute in µs


def run(spec, rows, ts=None):
    """rows: list of sets of variable names the row satisfies."""
    names = [v.name for v in spec.variables]
    preds = np.array(
        [[name in r for r in rows] for name in names], dtype=bool
    )
    if ts is None:
        ts = np.arange(len(rows), dtype=np.int64) * MIN
    else:
        ts = np.asarray(ts, dtype=np.int64)
    return scan_key_group(spec, preds, ts)


def spans(matches, var):
    return [m.get(var) and (m[var][0], m[var][1]) for m in matches]


# ---------------------------------------------------------------------------
# After-match skip strategies
# ---------------------------------------------------------------------------


def ab_plus(skip):
    return (
        Pattern.begin("A", skip=skip).where("x").next("B").one_or_more().where("y")
    ).build()


def test_no_skip_emits_every_loop_extension():
    m, _ = run(ab_plus(NO_SKIP), [{"A"}, {"B"}, {"B"}])
    # A B and A BB — every completion of the same start row
    assert spans(m, "B") == [(1, 1), (1, 2)]


def test_skip_to_next_one_match_per_start_row():
    m, _ = run(ab_plus(SKIP_TO_NEXT), [{"A"}, {"B"}, {"B"}])
    # the A BB extension shares the start row with the emitted A B
    assert spans(m, "B") == [(1, 1)]


def test_skip_to_next_keeps_other_start_rows():
    p = (
        Pattern.begin("A", skip=SKIP_TO_NEXT)
        .where("x")
        .followed_by("C")
        .where("y")
    ).build()
    m, _ = run(p, [{"A"}, {"A"}, {"C"}])
    # both starts complete at row 2; distinct start rows → both emit
    assert spans(m, "A") == [(0, 0), (1, 1)]
    # skip-past would emit only the earliest
    p2 = (
        Pattern.begin("A", skip=SKIP_PAST_LAST_EVENT)
        .where("x")
        .followed_by("C")
        .where("y")
    ).build()
    m2, _ = run(p2, [{"A"}, {"A"}, {"C"}])
    assert spans(m2, "A") == [(0, 0)]


def test_skip_to_next_discards_sibling_partials_of_start_row():
    # after the match at row2, the same start row must not emit again
    m, _ = run(ab_plus(SKIP_TO_NEXT), [{"A"}, {"B"}, {"B"}, {"A"}, {"B"}])
    assert spans(m, "A") == [(0, 0), (3, 3)]
    assert spans(m, "B") == [(1, 1), (4, 4)]


# ---------------------------------------------------------------------------
# times(n[, m])
# ---------------------------------------------------------------------------


def abc_times(lo, hi=None, skip=NO_SKIP):
    return (
        Pattern.begin("A", skip=skip)
        .where("a")
        .next("B")
        .times(lo, hi)
        .where("b")
        .next("C")
        .where("c")
    ).build()


def test_times_exact_requires_n_rows():
    assert run(abc_times(2), [{"A"}, {"B"}, {"C"}])[0] == []
    m, _ = run(abc_times(2), [{"A"}, {"B"}, {"B"}, {"C"}])
    assert spans(m, "B") == [(1, 2)]


def test_times_exact_caps_loop():
    # a third B breaks strict contiguity once B{2} is saturated
    assert run(abc_times(2), [{"A"}, {"B"}, {"B"}, {"B"}, {"C"}])[0] == []


def test_times_range():
    m, _ = run(abc_times(2, 3), [{"A"}, {"B"}, {"B"}, {"B"}, {"C"}])
    assert spans(m, "B") == [(1, 3)]
    # below the floor still fails
    assert run(abc_times(2, 3), [{"A"}, {"B"}, {"C"}])[0] == []


def test_times_in_final_position_counts():
    p = (
        Pattern.begin("A", skip=NO_SKIP).where("a").next("B").times(2).where("b")
    ).build()
    m, _ = run(p, [{"A"}, {"B"}, {"B"}, {"B"}])
    assert spans(m, "B") == [(1, 2)]  # exactly two, not three


# ---------------------------------------------------------------------------
# Loop contiguity: consecutive() / allowCombinations()
# ---------------------------------------------------------------------------


def test_default_relaxed_loop_skips_gap_rows():
    p = (
        Pattern.begin("A", skip=NO_SKIP)
        .where("a")
        .followed_by("B")
        .times(2)
        .where("b")
    ).build()
    m, _ = run(p, [{"A"}, {"B"}, set(), {"B"}])
    assert spans(m, "B") == [(1, 3)]


def test_consecutive_requires_adjacent_loop_rows():
    p = (
        Pattern.begin("A", skip=NO_SKIP)
        .where("a")
        .followed_by("B")
        .times(2)
        .where("b")
        .consecutive()
    ).build()
    assert run(p, [{"A"}, {"B"}, set(), {"B"}])[0] == []
    m, _ = run(p, [{"A"}, set(), {"B"}, {"B"}])
    assert spans(m, "B") == [(2, 3)]


def test_allow_combinations_emits_all_subsets():
    p = (
        Pattern.begin("A", skip=NO_SKIP)
        .where("a")
        .followed_by("B")
        .times(2)
        .where("b")
        .allow_combinations()
    ).build()
    m, _ = run(p, [{"A"}, {"B"}, {"B"}, {"B"}])
    # all 2-subsets of the three Bs
    assert spans(m, "B") == [(1, 2), (1, 3), (2, 3)]
    # deterministic relaxed loop: only the contiguous first pair
    p2 = (
        Pattern.begin("A", skip=NO_SKIP)
        .where("a")
        .followed_by("B")
        .times(2)
        .where("b")
    ).build()
    m2, _ = run(p2, [{"A"}, {"B"}, {"B"}, {"B"}])
    assert spans(m2, "B") == [(1, 2)]


# ---------------------------------------------------------------------------
# notNext / notFollowedBy
# ---------------------------------------------------------------------------


def test_not_next_blocks_immediate_row_only():
    p = (
        Pattern.begin("A", skip=NO_SKIP)
        .where("a")
        .not_next("N")
        .where("n")
        .followed_by("C")
        .where("c")
    ).build()
    assert run(p, [{"A"}, {"N"}, {"C"}])[0] == []
    # N later in the gap is fine — only the immediate row is guarded
    m, _ = run(p, [{"A"}, set(), {"N"}, {"C"}])
    assert spans(m, "C") == [(3, 3)]


def test_not_followed_by_blocks_whole_gap():
    p = (
        Pattern.begin("A", skip=NO_SKIP)
        .where("a")
        .not_followed_by("N")
        .where("n")
        .followed_by("C")
        .where("c")
    ).build()
    assert run(p, [{"A"}, set(), {"N"}, {"C"}])[0] == []
    m, _ = run(p, [{"A"}, set(), {"C"}])
    assert spans(m, "C") == [(2, 2)]


def test_not_followed_by_take_precedence():
    # a row matching both N and C transitions (Flink's NOT(N) guards the
    # ignore edge, not the take edge)
    p = (
        Pattern.begin("A", skip=NO_SKIP)
        .where("a")
        .not_followed_by("N")
        .where("n")
        .followed_by("C")
        .where("c")
    ).build()
    m, _ = run(p, [{"A"}, {"N", "C"}])
    assert spans(m, "C") == [(1, 1)]


def test_trailing_not_followed_by_validation():
    with pytest.raises(ValueError, match="within"):
        (
            Pattern.begin("A", skip=NO_SKIP).where("a").not_followed_by("N").where("n")
        ).build()
    with pytest.raises(ValueError, match="notNext"):
        (
            Pattern.begin("A", skip=NO_SKIP)
            .where("a")
            .not_next("N")
            .where("n")
            .within("1 hour")
        ).build()


def trailing_spec(skip=NO_SKIP):
    return (
        Pattern.begin("A", skip=skip)
        .where("a")
        .not_followed_by("N")
        .where("n")
        .within("1 hour")
    ).build()


def test_trailing_absence_emits_at_end_of_input():
    m, to = run(trailing_spec(), [{"A"}])
    assert spans(m, "A") == [(0, 0)] and to == []


def test_trailing_absence_killed_by_forbidden_row():
    m, _ = run(trailing_spec(), [{"A"}, {"N"}])
    assert m == []


def test_trailing_absence_emits_at_deadline_not_before():
    # N arrives 2h after A: deadline (1h) passed clean → match emitted
    # when the NFA's clock reaches the deadline, N is irrelevant
    m, _ = run(trailing_spec(), [{"A"}, {"N"}], ts=[0, 7_200_000_000])
    assert spans(m, "A") == [(0, 0)]


def test_trailing_absence_streaming_incremental():
    # same semantics via incremental step/advance_time (streaming shape)
    spec = trailing_spec()
    nfa = Nfa(spec)
    st = NfaState()
    m, to = nfa.step(st, 0, (True, False), 0)
    assert m == [] and to == []
    # watermark passes the deadline with no N seen
    m, to = nfa.advance_time(st, 3_600_000_001)
    assert [x["A"][0] for x in m] == [0] and to == []
    assert st.runs == []


# ---------------------------------------------------------------------------
# Interplay: measures over absence patterns, skip with timeouts
# ---------------------------------------------------------------------------


def test_measure_on_negated_var_rejected():
    with pytest.raises(ValueError, match="negated"):
        (
            Pattern.begin("A", skip=NO_SKIP)
            .where("a")
            .not_followed_by("N")
            .where("n")
            .within("1 hour")
        ).build(measures=(Measure("m", "N", "x", "first"),))


def test_skip_to_next_timeouts_still_emit():
    # relaxed contiguity: the partial survives the gap row, then the
    # within deadline prunes it → timeout (a STRICT partial killed by a
    # contiguity break dies structurally and emits nothing, as in Flink)
    p = (
        Pattern.begin("A", skip=SKIP_TO_NEXT)
        .where("a")
        .followed_by("B")
        .where("b")
        .within("1 hour")
    ).build(emit_timeouts=True)
    # A with no B within the hour → timeout; later A+B → match
    m, to = run(
        p,
        [{"A"}, set(), {"A"}, {"B"}],
        ts=[0, MIN, 2 * 3_600_000_000, 2 * 3_600_000_000 + MIN],
    )
    assert spans(m, "A") == [(2, 2)]
    assert spans(to, "A") == [(0, 0)]


# ---------------------------------------------------------------------------
# until() stop condition
# ---------------------------------------------------------------------------


def abc_until(skip=NO_SKIP, with_until=True):
    p = (
        Pattern.begin("A", skip=skip)
        .where("x")
        .followed_by("B")
        .one_or_more()
        .optional()
        .where("y")
    )
    if with_until:
        p = p.until("u")
    return p.followed_by("C").where("z").build()


def run_until(spec, rows, ts=None):
    """rows: sets of variable names + 'U' for the stop condition."""
    names = [v.name for v in spec.variables]
    if any(v.until is not None for v in spec.variables):
        names = names + ["U"]
    preds = np.array([[n in r for r in rows] for n in names], dtype=bool)
    ts = (
        np.arange(len(rows), dtype=np.int64) * MIN
        if ts is None
        else np.asarray(ts, dtype=np.int64)
    )
    return scan_key_group(spec, preds, ts)


def test_until_truncates_the_loop_but_not_the_match():
    rows = [{"A"}, {"B"}, {"B"}, {"B", "U"}, {"B"}, {"C"}]
    m, _ = run_until(abc_until(), rows)
    assert spans(m, "B") == [(1, 2)]  # stop row and later B excluded
    assert spans(m, "C") == [(5, 5)]
    m2, _ = run_until(abc_until(with_until=False), rows)
    assert spans(m2, "B") == [(1, 4)]  # without until: the whole loop


def test_until_before_any_loop_row_empties_the_loop():
    rows = [{"A"}, {"B", "U"}, {"B"}, {"C"}]
    m, _ = run_until(abc_until(), rows)
    assert len(m) == 1 and m[0].get("B") is None
    assert spans(m, "C") == [(3, 3)]


def test_until_is_per_run():
    # run 1 sees the stop row; run 2 starts after it and loops freely
    rows = [{"A"}, {"U"}, {"A"}, {"B"}, {"C"}]
    m, _ = run_until(abc_until(skip=NO_SKIP), rows)
    got = sorted(
        ((-1, -1) if sp is None else sp for sp in spans(m, "B"))
    )
    assert got == [(-1, -1), (3, 3)]


def test_until_requires_looping_variable():
    with pytest.raises(ValueError):
        (
            Pattern.begin("A").where("x").followed_by("B").where("y").until("u")
        ).build().validate()


def test_single_until_only():
    with pytest.raises(ValueError):
        (
            Pattern.begin("A")
            .where("x")
            .one_or_more()
            .until("u")
            .followed_by("B")
            .where("y")
            .one_or_more()
            .until("v")
        ).build().validate()


# ---------------------------------------------------------------------------
# SKIP TO FIRST/LAST <var> (SQL:2016 / Flink skipToFirst/skipToLast)
# ---------------------------------------------------------------------------

from flink_cep_examples_spark.plans.pattern import (  # noqa: E402
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
)


def abc_times2(skip, skip_var=None):
    """A B{2} C, strict — with every row satisfying every variable the
    candidate matches overlap, so each strategy selects a DIFFERENT
    match set (the distinguishing fixture)."""
    return (
        Pattern.begin("A", skip=skip, skip_var=skip_var)
        .where("x")
        .next("B")
        .times(2)
        .where("y")
        .next("C")
        .where("z")
    ).build()


ALL_ROWS_6 = [{"A", "B", "C"}] * 6  # candidate matches start at 0, 1, 2


def test_skip_strategies_select_distinct_match_sets():
    starts = lambda m: [sp[0] for sp in spans(m, "A")]
    m, _ = run(abc_times2(SKIP_PAST_LAST_EVENT), ALL_ROWS_6)
    assert starts(m) == [0]  # resume after row 3: no room for another
    m, _ = run(abc_times2(SKIP_TO_NEXT), ALL_ROWS_6)
    assert starts(m) == [0, 1, 2]  # one per start row
    m, _ = run(abc_times2(SKIP_TO_FIRST, "B"), ALL_ROWS_6)
    # resume at first B (row 1): starts 1 and 2 both survive
    assert starts(m) == [0, 1, 2]
    m, _ = run(abc_times2(SKIP_TO_LAST, "B"), ALL_ROWS_6)
    # resume at last B (row 2): start 1 is discarded, start 2 survives
    assert starts(m) == [0, 2]


def test_skip_to_first_of_missing_var_discards_only_emitted_run():
    # B is optional and absent: skip-to-first-B has no resumption row —
    # only the emitted run is discarded (progress guaranteed), matching
    # Flink's relaxed skip-to-miss behavior.
    p = (
        Pattern.begin("A", skip=SKIP_TO_FIRST, skip_var="B")
        .where("x")
        .next("B")
        .one_or_more()
        .optional()
        .where("y")
        .next("C")
        .where("z")
    ).build()
    m, _ = run(p, [{"A"}, {"C", "A"}, {"C"}])
    # match (A0, C1); run started at row 1 survives and matches (A1, C2)
    assert spans(m, "A") == [(0, 0), (1, 1)]


def test_skip_var_must_exist_and_be_positive():
    with pytest.raises(ValueError):
        (
            Pattern.begin("A", skip=SKIP_TO_LAST, skip_var="Z").where("x")
        ).build()
    with pytest.raises(ValueError):
        (
            Pattern.begin("A", skip=SKIP_TO_LAST).where("x")
        ).build()


# ---------------------------------------------------------------------------
# Greedy vs reluctant quantifier preference
# ---------------------------------------------------------------------------


def a_bplus_comb_c(reluctant: bool):
    p = (
        Pattern.begin("A", skip=SKIP_PAST_LAST_EVENT)
        .where("x")
        .followed_by("B")
        .one_or_more()
        .allow_combinations()
    )
    if reluctant:
        p = p.reluctant()
    return (p.where("y").followed_by("C").where("z")).build()


def test_greedy_prefers_most_rows_reluctant_fewest():
    # allowCombinations: branches with B = {1,2}, {1}, {2} all complete
    # on row 3 — the quantifier preference picks which one emits.
    rows = [{"A"}, {"B"}, {"B"}, {"C"}]
    m, _ = run(a_bplus_comb_c(reluctant=False), rows)
    assert [mm["B"][2] for mm in m] == [2]  # greedy: both B rows
    assert spans(m, "B") == [(1, 2)]
    m, _ = run(a_bplus_comb_c(reluctant=True), rows)
    assert [mm["B"][2] for mm in m] == [1]  # reluctant: a single B row


def test_reluctant_needs_quantifier():
    with pytest.raises(ValueError):
        (
            Pattern.begin("A").where("x").next("B").reluctant().where("y")
        ).build()


def test_skip_to_last_is_positional_under_timestamp_ties():
    """SQL resumption is a row POSITION, not a timestamp: with every
    row sharing one timestamp (ordered by tiebreak), SKIP TO LAST B
    must still discard the run started between the match start and the
    resumption row — starts {0, 2}, exactly as in the distinct-ts
    fixture. A timestamp-based cutoff would let every same-ts run
    survive and emit starts {0, 1, 2}."""
    m, _ = run(
        abc_times2(SKIP_TO_LAST, "B"), ALL_ROWS_6, ts=[0] * len(ALL_ROWS_6)
    )
    assert [sp[0] for sp in spans(m, "A")] == [0, 2]


def test_skip_to_last_prunes_completed_runs_started_before_cutoff():
    """Regression: two runs completing on the SAME row, where the
    earlier emission's resumption point lies after the later run's
    start — the later completed-but-unemitted match must be discarded
    even though its run already left the live set (its only branch was
    consumed into the final once-variable)."""
    from flink_cep_examples_spark.plans.pattern import SKIP_TO_LAST

    p = (
        Pattern.begin("A", skip=SKIP_TO_LAST, skip_var="C")
        .where("x")
        .followed_by("C")
        .where("y")
    ).build()
    # A@0, A@1, C@5: both runs complete at row 5; emitting run 0 sets
    # the resumption point to row 5 (last C), so run 1 (start 1 < 5)
    # must NOT emit.
    m, _ = run(p, [{"A"}, {"A"}, {}, {}, {}, {"C"}])
    assert spans(m, "A") == [(0, 0)]


def test_finish_applies_skip_to_discipline():
    """Regression: end-of-input flush must apply the same SKIP TO
    FIRST/LAST resumption pruning as mid-stream deadline maturation —
    batch output must not depend on whether a late row pushed the
    deadline past before the input ended."""
    from flink_cep_examples_spark.plans.pattern import SKIP_TO_LAST

    p = (
        Pattern.begin("A", skip=SKIP_TO_LAST, skip_var="B")
        .where("x")
        .followed_by("B")
        .one_or_more()
        .where("y")
        .not_followed_by("N")
        .where("z")
        .within("10 minutes")
    ).build()
    rows = [{"A"}, {"A"}, {"B"}]
    # end-of-input flush: run 0 emits with resumption at its last B
    # (row 2); run 1 (started at row 1 < 2) must be suppressed.
    m, _ = run(p, rows)
    assert spans(m, "A") == [(0, 0)]
    # the same pendings matured by a far-future row must agree
    m2, _ = run(p, rows + [set()], ts=[0, MIN, 2 * MIN, 10**12])
    assert spans(m2, "A") == [(0, 0)]


def test_simultaneous_deadline_maturation_matches_incremental():
    """Regression: several deadlines passing inside ONE advance_time
    call (time jump / end of input) must produce the same output as
    deadlines maturing one row at a time.

    SKIP_PAST_LAST: the first pending match discards every later
    expired run — 1 match either way, never 2."""
    p = (
        Pattern.begin("A", skip=SKIP_PAST_LAST_EVENT)
        .where("x")
        .not_followed_by("N")
        .where("y")
        .within("10 minutes")
    ).build()
    rows = [{"A"}, {"A"}]
    flush = run(p, rows)[0]  # both deadlines mature in finish()
    stepped = run(p, rows + [set()], ts=[0, MIN, 100 * MIN])[0]
    between = run(p, rows + [set(), set()], ts=[0, MIN, int(10.5 * MIN), 100 * MIN])[0]
    assert spans(flush, "A") == spans(stepped, "A") == spans(between, "A") == [(0, 0)]


def test_skip_to_cutoff_suppresses_timeouts_consistently():
    """Regression: a run the resumption cutoff discards must emit
    NEITHER a match NOR a timeout, whether its deadline matures
    incrementally or in the same flush as the emitting run."""
    from dataclasses import replace as _dc_replace

    from flink_cep_examples_spark.plans.pattern import SKIP_TO_LAST

    p = (
        Pattern.begin("A", skip=SKIP_TO_LAST, skip_var="B")
        .where("x")
        .followed_by("B")
        .times(2)
        .where("y")
        .not_followed_by("N")
        .where("z")
        .within("10 minutes")
    ).build()
    spec = _dc_replace(p, emit_timeouts=True).validate()
    # A@0, B@1, A@2, B@3: run0 = A0,B{1,3} pending; run1 = A2,B{3,?}
    # partial. run0's emission (cutoff = last B ord 3) discards run1
    # (start 2 < 3) -> no timeout from it, flush or incremental.
    rows = [{"A"}, {"B"}, {"A"}, {"B"}]
    m1, t1 = run(spec, rows)
    m2, t2 = run(spec, rows + [set(), set()], ts=[0, MIN, 2 * MIN, 3 * MIN, int(10.5 * MIN), 100 * MIN])
    assert spans(m1, "A") == spans(m2, "A") == [(0, 0)]
    assert t1 == t2 == []
