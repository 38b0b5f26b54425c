"""SQL:2016 LONGEST (greedy) emission for unbounded loop groups
(round 6): ``PATTERN ((X Y)+)`` must emit the most-iterations match per
start — a completed match is HELD in the NFA (NfaState.helds) while the
same start's loop branch is still alive, and resolves once the start
can no longer improve (operators/nfa.py::_resolve_helds).

Reference semantics source: SQL:2016 row-pattern greedy quantifier
preferment under strict (MATCH_RECOGNIZE) contiguity — which, on a
classified row string, is exactly Python ``re`` leftmost-greedy
matching, so the brute-force oracle here is the ``re`` module:

- AFTER MATCH SKIP PAST LAST ROW == ``re.finditer`` (leftmost-longest,
  non-overlapping, resume past the match);
- AFTER MATCH SKIP TO NEXT ROW == ``re.match`` anchored at every start
  position (one greedy match per start, overlapping allowed).

The MATCH_RECOGNIZE front-end selects derivation="longest" for pure
loop-group patterns; the Flink-tier Pattern DSL keeps the documented
eager emission (Flink rejects greedy group patterns outright, so there
is no Flink behavior to diverge from).
"""

from __future__ import annotations

import datetime as dt
import pickle
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_cep_examples_spark.operators import nfa as N
from flink_cep_examples_spark.plans.pattern import (
    NO_SKIP,
    Measure,
    Pattern,
    PatternSpec,
    PatternVar,
    SKIP_PAST_LAST_EVENT,
    SKIP_TO_FIRST,
    SKIP_TO_NEXT,
)
from flink_cep_examples_spark.sql.match_recognize import (
    match_recognize,
    parse_match_recognize,
)

_SCHEMA = "id string, event_time timestamp, seq long, m long"


def _xy_spec(after=SKIP_PAST_LAST_EVENT, within=None, derivation="longest"):
    """Trailing loop group ``(X Y)+`` — the shape where longest vs
    eager emission actually differ (a completion can still extend)."""
    return PatternSpec(
        variables=(PatternVar("X", "px"), PatternVar("Y", "py")),
        loop_groups=((0, 1),),
        after_match=after,
        within=within,
        derivation=derivation,
    )


def _run(spec, ms, times_ms=None):
    """Drive the NFA over class sequence ``ms`` (1=X, 2=Y, else inert
    for both predicates); returns (x_first, y_last, pairs) per match in
    emission order."""
    eng = N.Nfa(spec)
    stt = N.NfaState()
    out = []
    for i, m in enumerate(ms):
        t = (times_ms[i] if times_ms is not None else i) * 1000
        matches, _ = eng.step(stt, t, (m == 1, m == 2), i)
        out.extend(matches)
    m, _ = eng.finish(stt)
    out.extend(m)
    return [(d["X"][0], d["Y"][1], d["X"][2]) for d in out]


def _classes(ms) -> str:
    return "".join("a" if m == 1 else "b" if m == 2 else "." for m in ms)


_XY_RE = re.compile(r"(?:ab)+")


def _brute_skip_past(ms):
    """re.finditer == leftmost-longest non-overlapping == SQL:2016
    greedy (X Y)+ under SKIP PAST LAST ROW."""
    return [
        (mt.start(), mt.end() - 1, (mt.end() - mt.start()) // 2)
        for mt in _XY_RE.finditer(_classes(ms))
    ]


def _brute_skip_next(ms):
    """One greedy match per start position (overlaps allowed) ==
    SKIP TO NEXT ROW (and NO SKIP, which longest collapses to the same
    one-preferred-match-per-start set)."""
    s = _classes(ms)
    out = []
    for i in range(len(s)):
        mt = _XY_RE.match(s, i)
        if mt:
            out.append((i, mt.end() - 1, (mt.end() - i) // 2))
    return out


def test_longest_hand_cases_skip_past():
    run = lambda ms: _run(_xy_spec(), ms)
    # eager would emit (0,1,1) and (2,3,1); longest merges the chain
    assert run([1, 2, 1, 2]) == [(0, 3, 2)]
    assert run([1, 2, 1, 2, 1, 2]) == [(0, 5, 3)]
    # a break row resolves the held chain and restarts
    assert run([1, 2, 1, 2, 0, 1, 2]) == [(0, 3, 2), (5, 6, 1)]
    # odd tail: the dangling X never completes another pair
    assert run([1, 2, 1]) == [(0, 1, 1)]
    # phase break (X X): first X's run dies before completing
    assert run([1, 1, 2, 1, 2]) == [(1, 4, 2)]
    assert run([2, 2]) == []
    assert run([]) == []


def test_longest_vs_eager_observable_difference():
    ms = [1, 2, 1, 2, 1, 2]
    assert _run(_xy_spec(derivation="longest"), ms) == [(0, 5, 3)]
    assert _run(_xy_spec(derivation="eager"), ms) == [
        (0, 1, 1),
        (2, 3, 1),
        (4, 5, 1),
    ]


def test_longest_skip_to_next_overlapping_starts():
    ms = [1, 2, 1, 2]
    # every X row starts its own greedy match
    assert _run(_xy_spec(after=SKIP_TO_NEXT), ms) == [(0, 3, 2), (2, 3, 1)]
    assert _run(_xy_spec(after=NO_SKIP), ms) == [(0, 3, 2), (2, 3, 1)]


@settings(max_examples=400, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2), max_size=48))
def test_longest_skip_past_matches_re(ms):
    assert _run(_xy_spec(), ms) == _brute_skip_past(ms)


@settings(max_examples=400, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2), max_size=48))
def test_longest_skip_to_next_matches_re(ms):
    assert sorted(_run(_xy_spec(after=SKIP_TO_NEXT), ms)) == _brute_skip_next(
        ms
    )


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2), max_size=40))
def test_longest_terminated_group_equals_eager(ms):
    """For ((X Y)+ Z) under STRICT contiguity the completion is gated
    by Z and every run dies on the Z row, so longest == eager — the
    r5-green cep_group_unbounded oracle stays valid under the new
    derivation."""
    base = dict(
        variables=(
            PatternVar("X", "px"),
            PatternVar("Y", "py"),
            PatternVar("Z", "pz"),
        ),
        loop_groups=((0, 1),),
        after_match=SKIP_PAST_LAST_EVENT,
    )

    def drive(spec):
        eng = N.Nfa(spec)
        stt = N.NfaState()
        out = []
        for i, m in enumerate(ms):
            got, _ = eng.step(stt, i * 1000, (m == 1, m == 2, m == 0), i)
            out.extend(got)
        got, _ = eng.finish(stt)
        out.extend(got)
        return [(d["X"][0], d["Z"][1], d["X"][2]) for d in out]

    assert drive(PatternSpec(**base, derivation="longest")) == drive(
        PatternSpec(**base, derivation="eager")
    )


def test_longest_within_deadline_resolves_held():
    """within prunes the live loop run at the deadline; the held
    completion (made before the gap) must still emit."""
    spec = _xy_spec(within=dt.timedelta(milliseconds=10))
    # pairs at t=0..3, then a >10ms gap, then a fresh pair
    out = _run(spec, [1, 2, 1, 2, 1, 2], times_ms=[0, 1, 2, 3, 50, 51])
    # the t=50 X row first expires the old run (held resolves with the
    # 2 pairs consumed before the gap), then starts the new chain
    assert out == [(0, 3, 2), (4, 5, 1)]


def test_longest_state_pickle_roundtrip():
    """Held completions survive a checkpoint: pickle NfaState
    mid-chain (a held exists), restore, continue — identical output."""
    ms = [1, 2, 1, 2, 1, 2, 0, 1, 2]
    spec = _xy_spec()
    eng = N.Nfa(spec)
    stt = N.NfaState()
    out = []
    for i, m in enumerate(ms):
        if i == 3:  # mid-chain: helds is non-empty here
            assert stt.helds
            stt = pickle.loads(pickle.dumps(stt))
        got, _ = eng.step(stt, i * 1000, (m == 1, m == 2), i)
        out.extend(got)
    got, _ = eng.finish(stt)
    out.extend(got)
    assert [(d["X"][0], d["Y"][1], d["X"][2]) for d in out] == _brute_skip_past(
        ms
    )


def test_legacy_state_restores_without_helds():
    """Pre-round-6 checkpoints pickled (runs, next_seq, row_ord) —
    they must restore with an empty helds dict."""
    stt = N.NfaState.__new__(N.NfaState)
    stt.__setstate__(([], 5, 7))
    assert stt.helds == {} and stt.next_seq == 5 and stt.row_ord == 7


def test_validate_guards():
    with pytest.raises(ValueError, match="derivation"):
        _xy_spec(derivation="greediest").validate()
    # emit_timeouts composes since round 8 (the advance_time longest
    # walk: held completion wins the match channel, never timeout) —
    # see tests/test_group_absence.py for the differentials
    PatternSpec(
        variables=(PatternVar("X", "px"), PatternVar("Y", "py")),
        loop_groups=((0, 1),),
        derivation="longest",
        emit_timeouts=True,
        within=dt.timedelta(hours=1),
    ).validate()
    with pytest.raises(NotImplementedError, match="SKIP"):
        PatternSpec(
            variables=(PatternVar("X", "px"), PatternVar("Y", "py")),
            loop_groups=((0, 1),),
            derivation="longest",
            after_match=SKIP_TO_FIRST,
            skip_var="X",
        ).validate()
    with pytest.raises(NotImplementedError, match="absence"):
        PatternSpec(
            variables=(
                PatternVar("X", "px"),
                PatternVar("Y", "py"),
                PatternVar("G", "pg", negated=True),
            ),
            loop_groups=((0, 1),),
            derivation="longest",
            within=dt.timedelta(hours=1),
        ).validate()


def test_parser_selects_longest_for_loop_groups():
    spec = parse_match_recognize(
        """
        PARTITION BY id ORDER BY event_time
        MEASURES FIRST(X.seq) AS s
        ONE ROW PER MATCH
        PATTERN ((X Y)+)
        DEFINE X AS m = 1, Y AS m = 2
        """
    )
    assert spec.derivation == "longest"
    plain = parse_match_recognize(
        """
        PARTITION BY id ORDER BY event_time
        MEASURES FIRST(A.seq) AS s
        ONE ROW PER MATCH
        PATTERN (A B+)
        DEFINE A AS m = 1, B AS m = 2
        """
    )
    assert plain.derivation == "eager"


def test_dsl_group_builder_stays_eager():
    spec = (
        Pattern.begin("X", skip=SKIP_PAST_LAST_EVENT)
        .where("m = 1")
        .next("Y")
        .where("m = 2")
        .build(key_cols=("id",), order_col="event_time")
    )
    # builder wraps (X Y) in a group via begin_group elsewhere; the
    # plain chain has no loop group and stays eager
    assert spec.derivation == "eager"


def _class_df(spark, ms, key="k"):
    t0 = dt.datetime(2020, 5, 1, 12, 0, 0)
    rows = [
        (key, t0 + dt.timedelta(minutes=i), i, m) for i, m in enumerate(ms)
    ]
    return spark.createDataFrame(rows, _SCHEMA)


_TRAILING_BODY = """
    PARTITION BY id ORDER BY event_time, seq
    MEASURES FIRST(X.seq) AS s, LAST(Y.seq) AS e, COUNT(X.*) AS k,
             MATCH_NUMBER() AS mn
    ONE ROW PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PATTERN ((X Y)+)
    DEFINE X AS m = 1, Y AS m = 2
"""


def test_sql_trailing_group_longest_end_to_end(spark):
    ms = [1, 2, 1, 2, 0, 1, 2, 1, 2, 1, 2, 0, 1, 2, 1]
    out = match_recognize(_class_df(spark, ms), _TRAILING_BODY)
    got = sorted((r.s, r.e, r.k, r.mn) for r in out.collect())
    brute = _brute_skip_past(ms)
    assert got == [(s, e, k, i + 1) for i, (s, e, k) in enumerate(brute)]
    assert got == [(0, 3, 2, 1), (5, 10, 3, 2), (12, 13, 1, 3)]


def test_streaming_trailing_group_longest_matches_batch(spark, tmp_path):
    """Held completions ride the streaming state store: replay the
    class stream and compare with the batch result (MATCH_NUMBER
    dropped — batch-tier under longest, guarded below)."""
    from flink_cep_examples_spark.streaming.cep_stream import (
        match_pattern_stream,
    )

    body = _TRAILING_BODY.replace(
        ",\n             MATCH_NUMBER() AS mn", ""
    )
    ms = [1, 2, 1, 2, 0, 1, 1, 2, 1, 2, 0, 2, 1, 2, 1, 2, 1, 2, 1]
    df = _class_df(spark, ms + [9] * 3)  # sentinel pushes the watermark
    batch = sorted((r.s, r.e, r.k) for r in match_recognize(df, body).collect())
    assert batch == _brute_skip_past(ms)

    spec = parse_match_recognize(body)
    src_dir = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src_dir))
    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    out = match_pattern_stream(stream, spec, watermark_delay="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("longest_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.s, r.e, r.k)
        for r in spark.sql("SELECT * FROM longest_stream").collect()
    )
    assert got == batch and len(batch) >= 3


def test_streaming_match_number_longest_past_last_streams(spark, tmp_path):
    """Round 12: MATCH_NUMBER under longest + SKIP PAST LAST streams
    (disjoint matches, sequential hold resolution = start-order
    emission); overlapping skips keep the loud reject."""
    import dataclasses

    from flink_cep_examples_spark.plans.pattern import SKIP_TO_NEXT
    from flink_cep_examples_spark.streaming.cep_stream import (
        match_pattern_stream,
    )

    spec = parse_match_recognize(_TRAILING_BODY)
    ms = [1, 2, 1, 2, 0, 1, 2, 1, 2, 1, 2, 0, 1, 2, 1, 0, 0]
    df = _class_df(spark, ms)
    batch = sorted(
        (r.s, r.e, r.k, r.mn)
        for r in match_recognize(df, _TRAILING_BODY).collect()
    )
    src_dir = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src_dir))
    stream = spark.readStream.schema(df.schema).parquet(str(src_dir))
    out = match_pattern_stream(stream, spec, watermark_delay="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("longest_mn_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.s, r.e, r.k, r.mn)
        for r in spark.table("longest_mn_stream").collect()
    )
    assert got == batch and len(batch) >= 2
    # overlapping skip (round 13): the former loud reject now streams
    # via the start-order reorder hold — agreement with the batch
    # (start, end) renumbering on the same corpus
    from flink_cep_examples_spark.operators import match_pattern

    overlap = dataclasses.replace(spec, after_match=SKIP_TO_NEXT)
    batch2 = sorted(
        (r.s, r.e, r.k, r.mn)
        for r in match_pattern(df, overlap).collect()
    )
    stream2 = spark.readStream.schema(df.schema).parquet(str(src_dir))
    out2 = match_pattern_stream(
        stream2, overlap, watermark_delay="0 seconds"
    )
    q2 = (
        out2.writeStream.format("memory")
        .queryName("longest_mn_overlap_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got2 = sorted(
        (r.s, r.e, r.k, r.mn)
        for r in spark.table("longest_mn_overlap_stream").collect()
    )
    assert got2 == batch2 and len(batch2) >= len(batch)


# ---------------------------------------------------------------------------
# (X Y)* via the alternation coordinator (round 7): greedy star = loop
# branch listed first + leftmost coordination + coordinator-held
# longest (nfa.greedy_loops); reluctant star/plus = eager. The regex
# oracle runs on a classified string whose class 4 satisfies X, Y AND Z
# simultaneously — the overlap that distinguishes greedy from eager.
# ---------------------------------------------------------------------------

_STAR_SQL = """
PARTITION BY id ORDER BY event_time, seq
MEASURES FIRST(A.seq) AS a, LAST(Z.seq) AS e, COUNT(X.*) AS k
ONE ROW PER MATCH
AFTER MATCH SKIP {skip}
PATTERN (A (X Y){quant} Z)
DEFINE A AS m = 3, X AS m IN (1, 4), Y AS m IN (2, 4), Z AS m IN (0, 4)
"""

_STAR_PREDS = {
    "A": lambda m: m == 3,
    "X": lambda m: m in (1, 4),
    "Y": lambda m: m in (2, 4),
    "Z": lambda m: m in (0, 4),
}


def _star_chars(ms) -> str:
    return "".join(
        {3: "a", 1: "x", 2: "y", 0: "z", 4: "w"}.get(m, ".") for m in ms
    )


def _run_star(ms, quant="*", skip="PAST LAST ROW"):
    """Drive the parsed star pattern through the alternation
    coordinator (scan_key_group_alternation) — no Spark needed."""
    import numpy as np

    spec = parse_match_recognize(_STAR_SQL.format(skip=skip, quant=quant))
    alts = spec.alternatives
    nfas = [N.Nfa(a) for a in alts]
    ts = np.arange(len(ms), dtype=np.int64) * 1000
    preds = [
        np.array(
            [[_STAR_PREDS[v.name](m) for m in ms] for v in a.variables],
            dtype=bool,
        ).reshape(len(a.variables), len(ms))
        for a in alts
    ]
    got = N.scan_key_group_alternation(
        nfas, preds, ts, spec.after_match, spec.derivation
    )
    out = []
    for _a, d in got:
        x = d.get("X")
        out.append((d["A"][0], d["Z"][1], x[2] if x else 0))
    return out


def _brute_star(ms, pattern, overlapping):
    s = _star_chars(ms)
    rx = re.compile(pattern)
    if not overlapping:
        return [
            (mt.start(), mt.end() - 1, (mt.end() - mt.start() - 2) // 2)
            for mt in rx.finditer(s)
        ]
    out = []
    for i in range(len(s)):
        mt = rx.match(s, i)
        if mt:
            out.append((i, mt.end() - 1, (mt.end() - i - 2) // 2))
    return out


def test_star_greedy_hand_cases():
    # a w w w: greedy takes one (X Y) pair from the w's, then Z
    assert _run_star([3, 4, 4, 4]) == [(0, 3, 1)]
    # reluctant takes the empty expansion
    assert _run_star([3, 4, 4, 4], quant="*?") == [(0, 1, 0)]
    # disjoint classes: both coincide
    assert _run_star([3, 0, 3, 1, 2, 0]) == [(0, 1, 0), (2, 5, 1)]
    assert _run_star([3, 0, 3, 1, 2, 0], quant="*?") == [
        (0, 1, 0),
        (2, 5, 1),
    ]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=36)
)
def test_star_greedy_skip_past_matches_re(ms):
    assert _run_star(ms) == _brute_star(
        ms, r"a(?:[xw][yw])*[zw]", overlapping=False
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=36)
)
def test_star_greedy_skip_to_next_matches_re(ms):
    assert sorted(_run_star(ms, skip="TO NEXT ROW")) == _brute_star(
        ms, r"a(?:[xw][yw])*[zw]", overlapping=True
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=36)
)
def test_star_reluctant_skip_past_matches_re(ms):
    assert _run_star(ms, quant="*?") == _brute_star(
        ms, r"a(?:[xw][yw])*?[zw]", overlapping=False
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=36)
)
def test_plus_reluctant_skip_past_matches_re(ms):
    """(X Y)+? — single-spec reluctant loop: eager derivation =
    fewest-iterations preferment = Python re non-greedy +?."""
    import numpy as np

    spec = parse_match_recognize(
        _STAR_SQL.format(skip="PAST LAST ROW", quant="+?")
    )
    assert spec.derivation == "eager"
    eng = N.Nfa(spec)
    stt = N.NfaState()
    out = []
    for i, m in enumerate(ms):
        pred = [_STAR_PREDS[v.name](m) for v in spec.variables]
        got, _ = eng.step(stt, i * 1000, pred, i)
        out.extend(got)
    got, _ = eng.finish(stt)
    out.extend(got)
    ours = [(d["A"][0], d["Z"][1], d["X"][2]) for d in out]
    assert ours == _brute_star(
        ms, r"a(?:[xw][yw])+?[zw]", overlapping=False
    )
