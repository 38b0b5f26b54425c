"""The NFA core: event-time row-pattern matching, incremental.

This is the engine's heart — the part Spark has no built-in for
(SURVEY §4 "what can never be Catalyst"). It re-implements, from the
observable semantics of the reference, Flink-CEP-style NFA simulation:

- per-key runs started at every row matching the first variable
  (begin state branching);
- strict contiguity (``.next``, FlinkCEPExample.scala:64,69): a live
  branch must consume the next row or die; relaxed contiguity
  (``.followedBy``) skips non-matching rows — engine extension;
- quantifiers ``+ * ?`` and counted ``times(n[, m])`` with epsilon-skip
  over optional variables;
- loop contiguity: by default iterations follow the variable's own
  contiguity (deviation note below); ``consecutive()`` forces strict,
  ``allowCombinations()`` lets a branch also *skip* a matching loop row
  (non-deterministic relaxed — all combinations);
- negative (absence) variables — ``notNext`` (the row directly after
  the previous match must not satisfy the predicate; absolute, even if
  that row could transition) and ``notFollowedBy`` (no gap row may
  satisfy it before the next variable matches; a row that *transitions*
  takes precedence, mirroring Flink's NOT(N) ignore-condition). A
  TRAILING ``notFollowedBy`` + ``within`` is timed absence: the match
  emits when the deadline passes with no forbidden row;
- ``within`` deadline: a partial whose first row is ≥ `within` older
  than the current event time is pruned *before* the row is processed,
  so a completion at exactly ``start + within`` does NOT match (Flink
  prunes on ``ts - start >= window``; confirmed by the golden fixtures:
  40 min gap → match, 2.5 h → timeout);
- after-match skip (FlinkCEPExample.scala:58): SKIP_PAST_LAST_EVENT —
  on emission, discard every partial — including a run begun at the
  match's own last row — and resume after it; SKIP_TO_NEXT (SQL:2016
  ``AFTER MATCH SKIP TO NEXT ROW``) — emit at most one match per start
  row: on emission discard only the partials sharing the match's start
  row, other runs continue; NO_SKIP emits all completions;
  SKIP_TO_FIRST/SKIP_TO_LAST <var> (SQL:2016 / Flink skipToFirst/Last)
  — resume AT the first/last row the named variable matched: the
  emitted run and every run started before that row are discarded,
  runs started at/after it survive. Quantifier preference (greedy
  ``B*`` vs reluctant ``B*?``) arbitrates same-row completions of one
  run, leftmost variable first;
- timeout emission (absence-of-event,
  FlinkCEPAbsenceOfEventExample.scala:93-103): a pruned partial emits
  one timeout row (dedup: one per run, using its longest branch — with
  mutually-exclusive predicates, the reference class, a run has exactly
  one branch, so this equals Flink's per-partial emission).

Design notes (deliberate, documented deviations):
- default loop-iteration contiguity follows the variable's own
  contiguity (MATCH_RECOGNIZE-style strictness for ``.next`` loops);
  Flink's default is relaxed unless ``.consecutive()``. For the
  reference pattern B's predicate is the complement of C's, so the two
  semantics coincide. ``consecutive()`` / ``allowCombinations()`` give
  explicit control.
- matches complete the moment the final state is reached (non-greedy
  emission); patterns ending in a loop variable emit on each extension
  under NO_SKIP. The reference pattern ends in a ``once`` variable, so
  this is unobservable there. Exception (round 6): under
  ``derivation="longest"`` (selected by the MATCH_RECOGNIZE front-end
  for unbounded loop-group patterns) completions are HELD per start in
  :attr:`NfaState.helds` and the preferred — most-iterations — one
  emits once the start can no longer improve, giving SQL:2016 greedy
  group-quantifier semantics (:meth:`Nfa._resolve_helds`).
- a ``notFollowedBy`` guarding a gap also constrains rows ignored
  *between loop iterations* of the preceding variable, and when
  optional variables are epsilon-skipped the union of all gaps on the
  skip path is active (the waiting row cannot know which gap it sits
  in).

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

from typing import NamedTuple

import numpy as np

from flink_cep_examples_spark.plans.pattern import (
    RELAXED,
    SKIP_PAST_LAST_EVENT,
    SKIP_TO_FIRST,
    SKIP_TO_LAST,
    SKIP_TO_NEXT,
    STRICT,
    PatternSpec,
)


class _Branch(NamedTuple):
    var: int  # POSITIVE-variable position currently being filled
    count: int  # rows consumed by that variable so far
    # per-positive-variable span
    # (first_payload, last_payload, count, first_row_ord, last_row_ord)
    # or None — the ordinals (per-key row positions in (order, tiebreak)
    # sequence) feed SKIP TO FIRST/LAST resumption points POSITIONALLY,
    # so rows sharing a timestamp still resolve correctly
    rows: tuple
    fresh: bool = True  # consumed/created on the previous processed row
    # (drives notNext: only the immediately-next row is checked)
    loop_open: bool = True  # until() not yet fired (permanent once False)


def _rows_key(rows: tuple) -> tuple:
    """Hashable dedup key for a branch's span tuple. The round-12
    ALL ROWS capture accumulator is ``[n, shared_log]`` (a list — the
    shared append-only log, see streaming/cep_stream.py::_cap_fold),
    which tuples can't hash; key it on (log identity, prefix length):
    same log object + same length ⇔ identical captured rows, so the
    dedup never merges branches with different captures. Content-equal
    captures in DIFFERENT log objects (possible only after a
    copy-diverge) hash apart — a benign dedup miss, never a wrong
    merge. Fold-less spans (≤5 fields) and tuple accumulators (the
    aggregate fold, the pre-round-12 capture) pass through unchanged."""
    if all(sp is None or len(sp) < 6 or type(sp[5]) is not list for sp in rows):
        return rows
    return tuple(
        sp
        if sp is None or len(sp) < 6 or type(sp[5]) is not list
        else (*sp[:5], id(sp[5][1]), sp[5][0])
        for sp in rows
    )


def _span_content(sp):
    """Span with a shared-log capture accumulator (``[n, log]``, see
    streaming/cep_stream.py::_cap_fold) rewritten to its hashable
    CONTENT — ``(*sp[:5], tuple(log[:n]))``. Fold-less spans and
    non-list fold accumulators pass through unchanged."""
    if sp is None or len(sp) < 6 or type(sp[5]) is not list:
        return sp
    n, log = sp[5]
    return (*sp[:5], tuple(log) if len(log) == n else tuple(log[:n]))


def _branch_content_key(br: _Branch) -> tuple:
    """Hashable CONTENT key for a completed branch — unlike _rows_key
    (which keys shared-log captures by log identity for the O(1)
    per-row keep() dedup), this resolves the captured rows, so two
    branches whose logs diverged (copy-diverge) but hold identical
    captures compare EQUAL. Used only at NO_SKIP emission, where every
    completed branch is emitted and an identity-keyed dedup miss would
    emit the same match twice (batch tuple accumulators dedup these by
    content at keep(); streaming must agree). O(captured rows) per
    COMPLETION, not per row — the hot keep() path is untouched."""
    return (br.var, tuple(_span_content(sp) for sp in br.rows))


def _migrate_branch(br: _Branch) -> _Branch:
    """Pad pre-round-3 3-field row spans to the 5-field ordinal-carrying
    shape so old streaming-checkpoint state restores cleanly."""
    if all(r is None or len(r) >= 5 for r in br.rows):
        return br  # 5-field, or 6-field with a fold accumulator (r11)
    return br._replace(
        rows=tuple(
            r if r is None or len(r) >= 5 else (*r, 0, 0) for r in br.rows
        )
    )


class _Run:
    """One NFA run (all branches sharing a start row). Picklable."""

    __slots__ = ("start_ts", "seq", "branches", "pending", "start_ord")

    def __init__(
        self, start_ts: int, seq: int, branches: list[_Branch], start_ord: int = 0
    ):
        self.start_ts = start_ts
        self.seq = seq  # creation order; earliest run wins emission priority
        self.branches = branches
        self.start_ord = start_ord  # per-key row position of the start row
        # completed branch awaiting a trailing-notFollowedBy deadline
        self.pending: _Branch | None = None

    def __getstate__(self):
        return (self.start_ts, self.seq, self.branches, self.pending, self.start_ord)

    def __setstate__(self, s):
        # tolerate pre-round-3 checkpoints (4-tuple, 3-field row spans):
        # skip-to strategies did not exist then, so ordinal 0 is inert.
        if len(s) == 4:
            s = (*s, 0)
        self.start_ts, self.seq, self.branches, self.pending, self.start_ord = s
        self.branches = [_migrate_branch(b) for b in self.branches]
        if self.pending is not None:
            self.pending = _migrate_branch(self.pending)


class NfaState:
    """Per-key mutable state: live runs + monotonically increasing run
    and row counters, plus held completions for the "longest"
    derivation (round 6). Small (bounded by the ``within`` horizon)
    and picklable for the streaming state store."""

    __slots__ = ("runs", "next_seq", "row_ord", "helds")

    def __init__(self) -> None:
        self.runs: list[_Run] = []
        self.next_seq = 0
        self.row_ord = 0  # rows processed for this key, in order
        #: "longest" derivation: start_ord → preferred completed branch
        #: held while the same start could still complete a
        #: derivation-preferred (more loop iterations) match
        self.helds: dict[int, _Branch] = {}

    def __getstate__(self):
        return (self.runs, self.next_seq, self.row_ord, self.helds)

    def __setstate__(self, s):
        if len(s) == 2:  # pre-round-3 checkpoint
            s = (*s, 0)
        if len(s) == 3:  # pre-round-6 checkpoint (no helds)
            s = (*s, {})
        self.runs, self.next_seq, self.row_ord, self.helds = s


class Nfa:
    """Compiled pattern + transition logic (stateless; shareable)."""

    def __init__(self, spec: PatternSpec):
        spec.validate()
        self.spec = spec
        self.within_us = (
            int(spec.within.total_seconds() * 1_000_000)
            if spec.within is not None
            else None
        )
        self.after_match = spec.after_match
        self.emit_timeouts = spec.emit_timeouts
        #: optional (init_fn, fold_fn) — when set, every per-variable
        #: span grows a 6th field: an accumulator folded over each
        #: payload the variable consumes. The streaming tier uses this
        #: for aggregate MEASURES (SUM/AVG/MIN/MAX/COUNT(col)) so they
        #: emit from bounded state without retaining matched rows
        #: (round 11; batch drives the NFA with row indices and slices
        #: the source arrays instead). Branch forks stay correct for
        #: free: spans are immutable tuples copied per extension.
        self._payload_fold: tuple | None = None

        all_vars = spec.variables
        #: spec indices of the positive (consuming) variables, in order
        self._pos = [i for i, v in enumerate(all_vars) if not v.negated]
        self.n_pos = len(self._pos)
        #: predicate index of the begin variable — callers may use it to
        #: skip step() for rows that can neither start nor extend a run
        self.first_pred = self._pos[0]
        self._names = [all_vars[i].name for i in self._pos]
        self._empty_rows = (None,) * self.n_pos

        pv = [all_vars[i] for i in self._pos]
        self._minc = [v.min_count for v in pv]
        self._maxc = [v.max_count for v in pv]
        self._can_loop = [v.can_loop for v in pv]
        self._relaxed = [v.contiguity == RELAXED for v in pv]
        self._loop_relaxed = [
            (v.loop_contiguity or v.contiguity) == RELAXED for v in pv
        ]
        self._combinations = [v.combinations for v in pv]
        self._optional = [v.optional for v in pv]
        self._greedy = [v.greedy for v in pv]
        #: positive position SKIP_TO_FIRST/LAST resumes at (else None)
        self._skip_pos: int | None = (
            self._names.index(spec.skip_var)
            if spec.skip_var is not None
            else None
        )

        # gap[p] = negative spec-var constraints between positive p and
        # positive p+1 (gap[n_pos-1] = trailing): list of (pred_index,
        # is_not_next)
        gaps: list[list[tuple[int, bool]]] = [[] for _ in range(self.n_pos)]
        p = -1
        for i, v in enumerate(all_vars):
            if v.negated:
                gaps[p].append((i, v.contiguity == STRICT))
            else:
                p += 1
        self._trailing = gaps[self.n_pos - 1]
        if any(nn for _, nn in self._trailing):  # validated upstream
            raise ValueError(
                "trailing not_next is unsupported at the NFA tier "
                "(PatternSpec.validate should have rejected it)"
            )

        # successors[p]: positive positions consumable after p
        # (epsilon-skip over optional positives)
        self._succ: list[list[int]] = []
        for p in range(self.n_pos):
            out, j = [], p + 1
            while j < self.n_pos:
                out.append(j)
                if not self._optional[j]:
                    break
                j += 1
            self._succ.append(out)
        # complete[p]: consuming into positive p may finish the match
        # (all later positives optional); with trailing negatives the
        # completion is *pending* until the within deadline.
        self._complete = [
            all(self._optional[q] for q in range(p + 1, self.n_pos))
            for p in range(self.n_pos)
        ]

        # multi-branch unbounded group (A B | C D)+ (round 8,
        # PatternSpec.loop_branches): the linear successor chain is
        # wrong INSIDE the group — a branch's end variable must jump
        # PAST the sibling branches (its successors are the variables
        # after the whole group), and its completion status is the
        # GROUP end's, not the next sibling's. Loop-back edges (all
        # branch starts) are added with _loop_succ below.
        pos_of_spec = {i: p for p, i in enumerate(self._pos)}
        self._branch_spans: list[tuple[int, int]] = [
            (pos_of_spec[s], pos_of_spec[e])
            for s, e in getattr(spec, "loop_branches", ())
        ]
        if self._branch_spans:
            g_end = self._branch_spans[-1][1]
            after, j = [], g_end + 1
            while j < self.n_pos:
                after.append(j)
                if not self._optional[j]:
                    break
                j += 1
            for _s_p, e_p in self._branch_spans[:-1]:
                self._succ[e_p] = list(after)
                self._complete[e_p] = self._complete[g_end]
            # PREFIX variables before the group (P (A B | C D)+,
            # round 9): the linear chain wires them only to the FIRST
            # branch's start, making a first iteration via any other
            # branch unreachable. Every position whose epsilon-skip
            # successor chain reaches the first branch start also
            # fans out to ALL branch starts. (Branch starts are
            # non-optional — quantifier ONCE is validated — so they
            # terminate the chain and appending keeps the leftmost-
            # branch preference order.)
            bs0 = self._branch_spans[0][0]
            for p in range(bs0):
                if bs0 in self._succ[p]:
                    self._succ[p].extend(
                        s_p
                        for s_p, _ in self._branch_spans[1:]
                        if s_p not in self._succ[p]
                    )
        # negatives active while a branch waits at p: union of every gap
        # on its epsilon-skip path (it cannot know which gap the waiting
        # row sits in). Trailing gap excluded — handled via pending.
        self._active_negs: list[list[tuple[int, bool]]] = []
        for p in range(self.n_pos):
            last = self._succ[p][-1] if self._succ[p] else p
            negs: list[tuple[int, bool]] = []
            for j in range(p, last):
                negs.extend(gaps[j])
            self._active_negs.append(negs)
        self._succ_relaxed = [
            any(self._relaxed[q] for q in self._succ[p])
            for p in range(self.n_pos)
        ]

        # unbounded group quantifiers (X Y)+: loop-back edges. Spec
        # indices → positive positions (group vars are non-negated,
        # validated), then for each group's END position the loop-back
        # targets are the group's start position plus epsilon-skips
        # over optional vars INSIDE the group (mirroring _succ) — a new
        # iteration may begin at any of them. Consuming the loop-back
        # row resets the target variable's count (_extend: p != br.var)
        # while its row SPAN keeps merging across iterations, which is
        # exactly what FIRST/LAST/COUNT need.
        self._loop_succ: dict[int, tuple[int, ...]] = {}
        if self._branch_spans:
            # every branch end loops back to EVERY branch start — one
            # iteration per branch choice, shared loop
            starts = tuple(s_p for s_p, _ in self._branch_spans)
            for _s_p, e_p in self._branch_spans:
                self._loop_succ[e_p] = starts
        else:
            for s_i, e_i in getattr(spec, "loop_groups", ()):
                s_p, e_p = pos_of_spec[s_i], pos_of_spec[e_i]
                targets, j = [], s_p
                while j <= e_p:
                    targets.append(j)
                    if not self._optional[j]:
                        break
                    j += 1
                # NESTED groups (round 8, e.g. (A (B C)+)+) may share
                # an end variable — its loop-back target set is the
                # UNION of the groups' starts (inner re-entry and
                # outer re-entry are both legal next iterations)
                prev = self._loop_succ.get(e_p, ())
                self._loop_succ[e_p] = prev + tuple(
                    t for t in targets if t not in prev
                )

        #: run-start positions: the epsilon-closure of position 0 —
        #: a LEADING optional variable (``A? B``, ``B* C``) matches
        #: zero rows, so a run may begin at any position reachable by
        #: skipping optional leading positives (round 9; previously
        #: only position 0, which silently dropped zero-width-prefix
        #: matches). A multi-branch group reachable from the begin
        #: closure additionally opens at EVERY branch's start.
        begins, j = [], 0
        while j < self.n_pos:
            begins.append(j)
            if not self._optional[j]:
                break
            j += 1
        if self._branch_spans and self._branch_spans[0][0] in begins:
            begins.extend(
                s_p
                for s_p, _ in self._branch_spans[1:]
                if s_p not in begins
            )
        self._begin_positions: tuple[int, ...] = tuple(begins)
        #: predicate indices whose OR says "this row can start a run" —
        #: callers prefilter with these (scan drivers, streaming tier)
        self.begin_preds = tuple(self._pos[p] for p in self._begin_positions)
        self._single_begin = len(self._begin_positions) == 1

        #: greedy (non-reluctant) loop groups — in ALTERNATION
        #: coordination (round 7), a completion from such an
        #: alternative is held and REPLACED by later (more-iterations)
        #: completions while its run lives, realizing SQL:2016 longest
        #: preferment for ``(X Y)*`` expansions; reluctant loops
        #: (greedy=False body vars) emit their first completion.
        self.greedy_loops = bool(self._loop_succ) and all(
            spec.variables[i].greedy
            for s_i, e_i in getattr(spec, "loop_groups", ())
            for i in range(s_i, e_i + 1)
        )

        #: "longest" derivation (round 6, SQL:2016 greedy group
        #: quantifier): completions are HELD in NfaState.helds while
        #: the same start's loop branches live, then the preferred
        #: (most-iterations) one emits — vs the default eager emission
        #: (first completion per start wins, Flink's behavior: Flink
        #: rejects greedy group patterns outright). Selected by the
        #: MATCH_RECOGNIZE front-end for loop-group patterns.
        self.longest = (
            getattr(spec, "derivation", "eager") == "longest"
        )

        # until(): at most one looping variable carries a stop condition
        # (validated upstream). Its predicate is the extra pred column
        # AFTER the per-variable ones (PatternSpec.pred_exprs layout).
        self._until_var: int | None = None  # positive position
        self._until_pred: int | None = None
        for p, v in enumerate(pv):
            if v.until is not None:
                self._until_var = p
                self._until_pred = len(all_vars)

    # -- helpers ------------------------------------------------------
    def enable_payload_fold(self, init_fn, fold_fn) -> None:
        """Grow every span with a folded accumulator (see
        ``_payload_fold``): ``init_fn(payload, ord) -> acc`` on the
        variable's first row, ``fold_fn(acc, payload, ord) -> acc`` on
        each later row. ``ord`` is the NFA's per-key row ordinal — the
        same monotone sequence the span ordinals carry, so a fold that
        records it can order captured rows ACROSS micro-batches (a
        caller-side batch-local index would reset and interleave
        wrongly). Call before the first ``step()``."""
        self._payload_fold = (init_fn, fold_fn)

    def _extend(self, br: _Branch, p: int, payload, ord_: int) -> _Branch:
        rows = list(br.rows)
        cur = rows[p]
        if self._payload_fold is None:
            rows[p] = (
                (payload, payload, 1, ord_, ord_)
                if cur is None
                else (cur[0], payload, cur[2] + 1, cur[3], ord_)
            )
        else:
            init_fn, fold_fn = self._payload_fold
            if cur is not None and len(cur) < 6:
                # a 5-field span can only restore from a checkpoint
                # written WITHOUT the fold (pre-aggregate/ALL ROWS
                # query shape); the state schema is an opaque binary
                # blob, so Spark cannot reject the restart itself —
                # fail loud here instead of an IndexError deep in emit
                raise RuntimeError(
                    "restored NFA span has no fold accumulator: this "
                    "checkpoint was written by a query without "
                    "aggregate/ALL ROWS measures; restart from a "
                    "fresh checkpoint directory"
                )
            rows[p] = (
                (payload, payload, 1, ord_, ord_, init_fn(payload, ord_))
                if cur is None
                else (
                    cur[0],
                    payload,
                    cur[2] + 1,
                    cur[3],
                    ord_,
                    fold_fn(cur[5], payload, ord_),
                )
            )
        count = br.count + 1 if p == br.var else 1
        return _Branch(p, count, tuple(rows), True, br.loop_open)

    def _pref_key(self, br: _Branch) -> tuple:
        """SQL:2016 quantifier preference among same-row completions of
        one run: leftmost variable first, greedy prefers more rows,
        reluctant fewer. Stable sort keeps branch creation order as the
        final tie-break."""
        return tuple(
            (-(br.rows[p][2]) if self._greedy[p] else br.rows[p][2])
            if br.rows[p] is not None
            else 0
            for p in range(self.n_pos)
        )

    def _skip_cutoff(self, br: _Branch) -> int | None:
        """Resumption row ordinal for SKIP_TO_FIRST/LAST: the first/last
        row the skip variable matched in the emitted branch. None when
        the (optional) variable matched no rows — the caller then only
        discards the emitted run (Flink's skip-to-miss relaxed
        behavior), which always makes progress."""
        span = br.rows[self._skip_pos] if self._skip_pos is not None else None
        if span is None:
            return None
        return span[3] if self.after_match == SKIP_TO_FIRST else span[4]

    def _apply_skip_to(
        self, st: NfaState, completed: list[tuple[int, int, _Branch]]
    ) -> list[dict]:
        """Sequential SKIP TO FIRST/LAST emission over (seq, start_ord,
        branch) tuples sorted by (seq, preference): emit the earliest
        surviving run's preferred branch, then discard every run —
        live OR completed-but-unemitted — started BEFORE the resumption
        row (runs started at/after it survive: matching 'resumes at'
        that row). Completions are carried with their own start ordinal
        because their runs may already be gone from ``st.runs`` (all
        branches consumed into a final once-variable)."""
        out: list[dict] = []
        killed: set[int] = set()
        cutoff: int | None = None
        for seq, start_ord, br in completed:
            if seq in killed:
                continue
            if cutoff is not None and start_ord < cutoff:
                killed.add(seq)  # started before the resumption row
                continue
            out.append(self._branch_dict(br))
            killed.add(seq)
            c = self._skip_cutoff(br)
            if c is not None:
                cutoff = c if cutoff is None else max(cutoff, c)
        st.runs = [
            r
            for r in st.runs
            if r.seq not in killed
            and (cutoff is None or r.start_ord >= cutoff)
        ]
        return out

    def _branch_dict(self, br: _Branch) -> dict:
        return {
            self._names[p]: br.rows[p]
            for p in range(self.n_pos)
            if br.rows[p] is not None
        }

    def _timeout_dict(self, run: _Run) -> dict:
        best = max(run.branches, key=lambda b: sum(r[2] for r in b.rows if r))
        return self._branch_dict(best)

    def _may_wait(self, br: _Branch) -> bool:
        """Can this branch survive a row it doesn't consume? Yes if its
        own next loop iteration is relaxed (and still allowed), or if it
        may leave for a relaxed successor (min count satisfied)."""
        p = br.var
        loop_ok = (
            self._can_loop[p]
            and self._loop_relaxed[p]
            and (self._maxc[p] is None or br.count < self._maxc[p])
            and (br.loop_open or p != self._until_var)
        )
        return loop_ok or (br.count >= self._minc[p] and self._succ_relaxed[p])

    # -- engine steps -------------------------------------------------
    def advance_time(
        self, st: NfaState, t_us: int
    ) -> tuple[list[dict], list[dict]]:
        """Prune partials whose deadline has passed at time ``t_us``
        (an arriving row's event time, or the watermark). Returns
        ``(matches, timeouts)``: matches are pending timed-absence
        completions whose deadline arrived clean; timeouts are expired
        partials (empty unless ``emit_timeouts``).

        Several deadlines may pass inside one call (a time jump, or
        end-of-input); they are processed SEQUENTIALLY in deadline
        order — identical ``within`` means deadline order is run-start
        order, which is ``st.runs``' append order — so the output never
        depends on whether an inert row happened to land between two
        deadlines: under SKIP_PAST_LAST_EVENT the first pending match
        discards every later expired run (their matches AND timeouts)
        exactly as its incremental emission would; under
        SKIP_TO_FIRST/LAST the running resumption cutoff suppresses
        later expired runs that started before it.

        "longest" derivation composes (round 8): an expired run whose
        start HOLDS a completion is a decided MATCH — the match channel
        wins, never the timeout channel (a start that matched within
        the deadline is not a timed-out partial; only never-matched
        partials emit timeout rows, mirroring the reference's absence
        side output, FlinkCEPAbsenceOfEventExample.scala:93-103)."""
        if self.within_us is None or not st.runs:
            if self.longest and st.helds:
                # no live runs → every held start is decided
                return self._resolve_helds(st), []
            return [], []
        expired, live = [], []
        for run in st.runs:
            (expired if t_us - run.start_ts >= self.within_us else live).append(
                run
            )
        st.runs = live
        if not expired:
            return [], []
        matches: list[dict] = []
        timeouts: list[dict] = []
        cutoff: int | None = None
        if self.longest:
            # Constant ``within`` makes expiry a start-order PREFIX of
            # st.runs, so every surviving run starts after every
            # expired one. Walk the decided starts — expired partials
            # plus helds below the live frontier — in start order:
            # held ⇒ match (under SKIP PAST LAST ROW its span discards
            # later expired partials WITHOUT timeout rows, the same
            # discipline as mid-stream emission discarding partials);
            # no held ⇒ timeout row. Helds newly unblocked by the
            # walk's own span-discards resolve through the standard
            # _resolve_helds pass below (their starts all lie above
            # every walked start, so emission stays start-ordered).
            run_by_start = {r.start_ord: r for r in expired}
            min_live = min((r.start_ord for r in st.runs), default=None)
            decided = set(run_by_start)
            decided.update(
                s for s in st.helds if min_live is None or s < min_live
            )
            for s in sorted(decided):
                if cutoff is not None and s < cutoff:
                    st.helds.pop(s, None)  # inside an emitted span
                    continue
                br = st.helds.pop(s, None)
                run = run_by_start.get(s)
                if br is not None:
                    matches.append(self._branch_dict(br))
                    if self.after_match == SKIP_PAST_LAST_EVENT:
                        end_ord = _branch_end_ord(br)
                        cutoff = end_ord + 1
                        st.runs = [
                            r for r in st.runs if r.start_ord > end_ord
                        ]
                        for s2 in [s2 for s2 in st.helds if s2 <= end_ord]:
                            del st.helds[s2]
                elif self.emit_timeouts and run is not None and run.branches:
                    timeouts.append(self._timeout_dict(run))
            if st.helds:
                matches.extend(self._resolve_helds(st))
            return matches, timeouts
        for run in expired:  # deadline (= start = append) order
            if cutoff is not None and run.start_ord < cutoff:
                continue  # discarded by an earlier emission's resumption
            if run.pending is not None:
                matches.append(self._branch_dict(run.pending))
                if self.after_match == SKIP_PAST_LAST_EVENT:
                    st.runs = []
                    break  # every later expired run is discarded too
                if self.after_match in (SKIP_TO_FIRST, SKIP_TO_LAST):
                    c = self._skip_cutoff(run.pending)
                    if c is not None:
                        cutoff = c if cutoff is None else max(cutoff, c)
            elif self.emit_timeouts and run.branches:
                timeouts.append(self._timeout_dict(run))
        if cutoff is not None:
            st.runs = [r for r in st.runs if r.start_ord >= cutoff]
        return matches, timeouts

    def _resolve_helds(self, st: NfaState, final: bool = False) -> list[dict]:
        """Emit held "longest"-derivation completions whose start is
        decided: no live run with the SAME start (it could complete a
        preferred, more-iterations match) and — under SKIP PAST LAST
        ROW, which resolves starts sequentially — no live run with an
        EARLIER start (its match would preempt). Emission under SKIP
        PAST LAST discards runs and helds whose start lies inside the
        emitted span; SKIP TO NEXT ROW / NO_SKIP (which longest
        collapses to one preferred match per start, exactly like the
        alternation tier's leftmost derivation) resolve each start
        independently. ``final=True`` (end of input) treats every live
        run as unable to complete."""
        helds = st.helds
        out: list[dict] = []
        if not helds:
            return out
        live = set() if final else {r.start_ord for r in st.runs}
        if self.after_match == SKIP_PAST_LAST_EVENT:
            min_live = min(live) if live else None
            while helds:
                s_min = min(helds)
                if min_live is not None and min_live <= s_min:
                    break
                br = helds[s_min]
                end_ord = _branch_end_ord(br)
                out.append(self._branch_dict(br))
                st.runs = [r for r in st.runs if r.start_ord > end_ord]
                live = {s for s in live if s > end_ord}
                min_live = min(live) if live else None
                for s in [s for s in helds if s <= end_ord]:
                    del helds[s]
        else:  # SKIP_TO_NEXT / NO_SKIP: starts decide independently
            for s in sorted(helds):
                if s in live:
                    continue
                out.append(self._branch_dict(helds[s]))
                del helds[s]
        return out

    def step(
        self, st: NfaState, t_us: int, pred_row, payload
    ) -> tuple[list[dict], list[dict]]:
        """Process one event-time-ordered row. ``pred_row[i]`` is the
        precomputed boolean of spec variable i's predicate on this row
        (negated variables included). Returns ``(matches, timeouts)``
        as var-name → (first, last, count) payload dicts."""
        matches, timeouts = self.advance_time(st, t_us)
        completed = self._consume(st, t_us, pred_row, payload)
        if self.longest:
            # SQL:2016 greedy group derivation: hold each start's
            # preferred completion (quantifier preference — more loop
            # iterations — via _pref_key) instead of emitting eagerly;
            # resolution happens once the start can no longer improve.
            for _seq, s, br in completed:
                cur = st.helds.get(s)
                if cur is None or self._pref_key(br) < self._pref_key(cur):
                    st.helds[s] = br
            # runs may also have died on this row (contiguity break),
            # unblocking earlier helds — resolve unconditionally
            matches.extend(self._resolve_helds(st))
            return matches, timeouts
        if completed:
            # (seq, pref) sort: earliest run wins; within a run the
            # quantifier-preferred branch (greedy/reluctant) wins; the
            # stable sort keeps branch creation order as final tie-break.
            completed.sort(key=lambda rc: (rc[0], self._pref_key(rc[2])))
            if self.after_match == SKIP_PAST_LAST_EVENT:
                matches.append(self._branch_dict(completed[0][2]))
                st.runs = []  # discard every partial (incl. run begun here)
            elif self.after_match == SKIP_TO_NEXT:
                emitted: set[int] = set()
                for seq, _, br in completed:
                    if seq not in emitted:
                        emitted.add(seq)
                        matches.append(self._branch_dict(br))
                # discard only partials sharing an emitted match's start
                # row; runs begun at other rows continue
                st.runs = [r for r in st.runs if r.seq not in emitted]
            elif self.after_match in (SKIP_TO_FIRST, SKIP_TO_LAST):
                matches.extend(self._apply_skip_to(st, completed))
            else:
                # NO_SKIP emits every completion — dedup by CONTENT
                # (ADVICE r12 medium): identity-keyed keep() lets two
                # branches with content-equal shared-log captures both
                # survive and both complete; batch tuple accumulators
                # merge them at keep(), so emitting both here would
                # diverge streaming ALL ROWS from batch.
                seen_emit: set = set()
                for seq, _, br in completed:
                    k = (seq, _branch_content_key(br))
                    if k not in seen_emit:
                        seen_emit.add(k)
                        matches.append(self._branch_dict(br))
        return matches, timeouts

    def step_collect(
        self, st: NfaState, t_us: int, pred_row, payload
    ) -> list[tuple[int, int, _Branch]]:
        """Alternation driver entry: process one row but return the RAW
        completions — (run seq, run start ordinal, branch) sorted by
        (seq, quantifier preference) — withOUT applying the after-match
        skip. The caller (scan_key_group_alternation) coordinates
        emission and run discarding ACROSS several NFAs so skip
        strategies act on the union of alternatives. Only valid for
        specs without trailing negatives (no pending completions) and
        without timeout emission — the alternation validator enforces
        both."""
        if self.longest:  # survives python -O, unlike assert
            raise AssertionError(
                "'longest' derivation is a single-pattern discipline — "
                "alternation alternatives must stay eager (the "
                "coordinator owns held resolution)"
            )
        matches, _ = self.advance_time(st, t_us)
        if matches:  # survives python -O, unlike assert
            raise AssertionError(
                "alternation specs cannot carry pendings — validator "
                "must reject trailing absence variables"
            )
        completed = self._consume(st, t_us, pred_row, payload)
        completed.sort(key=lambda rc: (rc[0], self._pref_key(rc[2])))
        return completed

    def _consume(
        self, st: NfaState, t_us: int, pred_row, payload
    ) -> list[tuple[int, int, _Branch]]:
        """Feed one row to every live run + the begin state; returns
        the completions this row produced (skip NOT yet applied)."""
        ord_ = st.row_ord
        st.row_ord += 1

        # (run seq, run start ordinal, branch)
        completed: list[tuple[int, int, _Branch]] = []
        for run in st.runs:
            # a trailing-notFollowedBy row voids the pending completion
            # (a later completion may re-arm it below)
            if run.pending is not None and any(
                pred_row[n] for n, _ in self._trailing
            ):
                run.pending = None
            new_branches: list[_Branch] = []
            seen = set()

            def keep(nb: _Branch) -> None:
                k = (nb.var, _rows_key(nb.rows))
                if k not in seen:
                    seen.add(k)
                    new_branches.append(nb)

            def complete(run: _Run, nb: _Branch) -> None:
                if self._trailing:
                    if run.pending is None:
                        run.pending = nb
                else:
                    completed.append((run.seq, run.start_ord, nb))

            for br in run.branches:
                p = br.var
                # notNext: the row directly after the previous match
                # must not satisfy the negative — absolute, checked
                # before any transition.
                if br.fresh and any(
                    nn and pred_row[n] for n, nn in self._active_negs[p]
                ):
                    continue
                # until(): a stop row fired while the looping variable
                # is reachable (currently filling it, or it is a
                # successor) closes the loop permanently for this
                # branch — the stop row itself is never consumed by it.
                if (
                    br.loop_open
                    and self._until_var is not None
                    and pred_row[self._until_pred]
                    and (
                        p == self._until_var or self._until_var in self._succ[p]
                    )
                ):
                    br = br._replace(loop_open=False)
                # moved_det: the row was consumed into a DETERMINISTIC
                # variable (no allowCombinations) — then the un-advanced
                # branch must not also survive (relaxed contiguity is
                # deterministic: a matching row must be taken). Rows
                # consumed only into combination vars leave the ignore
                # edge open (non-deterministic relaxed: all subsets).
                moved_det = False
                if (
                    self._can_loop[p]
                    and (br.loop_open or p != self._until_var)
                    and pred_row[self._pos[p]]
                    and (self._maxc[p] is None or br.count < self._maxc[p])
                ):
                    nb = self._extend(br, p, payload, ord_)
                    moved_det = moved_det or not self._combinations[p]
                    if self._complete[p] and nb.count >= self._minc[p]:
                        complete(run, nb)
                    keep(nb)
                if br.count >= self._minc[p]:
                    for q in self._succ[p]:
                        if q == self._until_var and not br.loop_open:
                            continue
                        if pred_row[self._pos[q]]:
                            nb = self._extend(br, q, payload, ord_)
                            moved_det = moved_det or not self._combinations[q]
                            if self._complete[q] and self._minc[q] <= 1:
                                complete(run, nb)
                                # a final once-var ends the branch —
                                # UNLESS it closes a loop-group
                                # iteration (the branch may loop back
                                # next row; same as a trailing B+
                                # variable emitting on each extension)
                                if (
                                    not self._can_loop[q]
                                    and q not in self._loop_succ
                                ):
                                    continue
                            keep(nb)
                    # group loop-back: the end variable of a (X Y)+
                    # group just finished an iteration — a parallel
                    # branch may start the next iteration at the
                    # group's start (strict: it must consume this
                    # row). For a single-body group this is never a
                    # completion (the start is always followed by the
                    # non-optional group end), but a SINGLE-VARIABLE
                    # branch of a multi-branch group ((A | C D)+,
                    # round 8) completes on its own start variable —
                    # check _complete like the successor edge does.
                    for q in self._loop_succ.get(p, ()):
                        if pred_row[self._pos[q]]:
                            nb = self._extend(br, q, payload, ord_)
                            moved_det = (
                                moved_det or not self._combinations[q]
                            )
                            if (
                                self._complete[q]
                                and nb.count >= self._minc[q]
                            ):
                                complete(run, nb)
                            keep(nb)
                # survival without consuming (the "ignore edge"): blocked
                # by a deterministic consumption or by any active
                # notFollowedBy the row satisfies.
                may_ignore = not moved_det
                if (
                    may_ignore
                    and self._may_wait(br)
                    and not any(
                        (not nn) and pred_row[n]
                        for n, nn in self._active_negs[p]
                    )
                ):
                    keep(br._replace(fresh=False))
            run.branches = new_branches
        st.runs = [r for r in st.runs if r.branches or r.pending is not None]

        # begin-state branching: a fresh run starts at this row. The
        # single-begin form (every pattern except a leading
        # multi-branch group) stays the inlined hot path — this runs
        # per row per key.
        if self._single_begin:
            if pred_row[self.first_pred]:
                nb = self._extend(
                    _Branch(0, 0, self._empty_rows), 0, payload, ord_
                )
                run = _Run(t_us, st.next_seq, [nb], start_ord=ord_)
                st.next_seq += 1
                if self._complete[0] and self._minc[0] <= 1:
                    if self._trailing:
                        run.pending = nb
                    else:
                        completed.append((run.seq, run.start_ord, nb))
                    if not self._can_loop[0] and 0 not in self._loop_succ:
                        run.branches = []
                if run.branches or run.pending is not None:
                    st.runs.append(run)
            return completed
        # multi-begin (leading multi-branch group): one initial branch
        # per begin position the row satisfies — they share ONE
        # run/start ordinal, like mid-run branch nondeterminism
        run = None
        for p in self._begin_positions:
            if not pred_row[self._pos[p]]:
                continue
            if run is None:
                run = _Run(t_us, st.next_seq, [], start_ord=ord_)
                st.next_seq += 1
            nb = self._extend(
                _Branch(p, 0, self._empty_rows), p, payload, ord_
            )
            if self._complete[p] and self._minc[p] <= 1:
                if self._trailing:
                    if run.pending is None:
                        run.pending = nb
                else:
                    completed.append((run.seq, run.start_ord, nb))
                if self._can_loop[p] or p in self._loop_succ:
                    run.branches.append(nb)
            else:
                run.branches.append(nb)
        if run is not None and (run.branches or run.pending is not None):
            st.runs.append(run)

        return completed

    def finish(self, st: NfaState) -> tuple[list[dict], list[dict]]:
        """End of input (batch) — watermark → ∞: pending timed-absence
        completions emit as matches, every other partial times out.
        Delegates to :meth:`advance_time` at an effectively-infinite
        timestamp so emission runs under the SAME after-match skip
        discipline as mid-stream maturation — batch output cannot
        depend on whether a deadline happened to pass before input
        ended. Pendings require ``within`` (validated), so the
        no-``within`` fallback only ever flushes timeouts."""
        if self.within_us is not None and st.runs:
            horizon = max(r.start_ts for r in st.runs) + self.within_us
            return self.advance_time(st, horizon)
        # "longest" derivation without within: live runs could never be
        # pruned mid-stream, so held completions resolve here. Resolve
        # BEFORE collecting timeouts: a start that holds a completion
        # is a match, never a timed-out partial, and under SKIP PAST
        # LAST ROW an emitted span discards the partials inside it
        # (st.runs shrinks) without timeout rows.
        held_starts = frozenset(st.helds) if self.longest else frozenset()
        matches = self._resolve_helds(st, final=True) if self.longest else []
        timeouts = (
            [
                self._timeout_dict(r)
                for r in st.runs
                if r.branches and r.start_ord not in held_starts
            ]
            if self.emit_timeouts
            else []
        )
        st.runs = []
        return matches, timeouts


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
    # rows that can neither start a run (begin predicate false) nor
    # extend one (no live runs) are no-ops — skip the step() call; all
    # pending obligations live in st.runs, so empty runs ⇒ nothing to
    # time out either (same pruning as the streaming operator)
    can_begin = cols[nfa.begin_preds[0]]
    for bp in nfa.begin_preds[1:]:
        can_begin = can_begin | cols[bp]
    for r in range(n):
        if not st.runs and not can_begin[r]:
            continue
        pred_row = tuple(bool(c[r]) for c in cols)
        m, to = nfa.step(st, int(ts_us[r]), pred_row, r)
        matches.extend(m)
        timeouts.extend(to)
    m, to = nfa.finish(st)
    matches.extend(m)
    timeouts.extend(to)
    return matches, timeouts


def scan_key_group_alternation(
    nfas: list,  # one compiled Nfa per alternative
    preds: list,  # per-alternative bool[n_vars_a, n_rows] arrays
    ts_us: np.ndarray,
    after_match: str,
    derivation: str = "eager",
) -> list[tuple[int, dict]]:
    """Batch driver for top-level PATTERN alternation ``(P1 | P2 |
    ...)``: one NFA per alternative advances in lockstep over the
    sorted key group; emission and after-match discarding act on the
    UNION of the alternatives' runs, so the skip strategy sees the
    alternation as ONE pattern.

    Preference among simultaneous completions (SQL:2016 derivation
    order): earliest start row first, then LEFTMOST alternative, then
    the alternative's own quantifier preference. Returns matches as
    ``(alternative_index, var→span dict)`` in emission order.

    Supported strategies: SKIP_PAST_LAST_EVENT (emit the preferred
    completion, discard every partial of every alternative),
    SKIP_TO_NEXT (at most one match per start row across ALL
    alternatives; discard partials sharing an emitted start row), and
    NO_SKIP (emit everything). SKIP TO FIRST/LAST is rejected by the
    alternation validator (the skip variable need not exist in every
    alternative). Per-alternative ``within`` deadlines prune inside
    each NFA's own advance_time.

    Scale note: per-row cost is O(live branches) summed over
    alternatives — identical to running the alternatives separately —
    plus an O(#completions) merge; a row inert for EVERY alternative
    is skipped entirely (row ordinals advance in every NFA on every
    processed row, keeping cross-alternative ordinal comparisons
    valid)."""
    states = [NfaState() for _ in nfas]
    n = ts_us.shape[0]
    cols = [[p[i] for i in range(p.shape[0])] for p in preds]
    begins = []
    for nf, c in zip(nfas, cols):
        b = c[nf.begin_preds[0]]
        for bp in nf.begin_preds[1:]:
            b = b | c[bp]
        begins.append(b)
    helds: dict[int, tuple[int, _Branch]] | None = (
        {} if derivation == "leftmost" else None
    )
    out: list[tuple[int, dict]] = []
    for r in range(n):
        if not any(
            st.runs or begins[a][r] for a, st in enumerate(states)
        ):
            continue
        pred_rows = [tuple(bool(c[r]) for c in cols[a]) for a in range(len(nfas))]
        out.extend(
            coordinate_alternation_row(
                nfas, states, int(ts_us[r]), pred_rows, r, after_match,
                helds=helds,
            )
        )
    if helds:
        # end of input: every live run is now dead for resolution
        # purposes — resolve the remaining held completions
        out.extend(
            resolve_alternation_helds(
                nfas, states, after_match, helds, final=True
            )
        )
    return out


def coordinate_alternation_row(
    nfas: list,
    states: list[NfaState],
    t_us: int,
    pred_rows: list[tuple],
    payload,
    after_match: str,
    helds: dict | None = None,
) -> list[tuple[int, dict]]:
    """One row of lockstep multi-NFA coordination — the shared core of
    the batch scan above and the streaming alternation operator
    (streaming/cep_stream.py): collect raw completions from every
    alternative, emit under the UNION skip discipline, discard runs
    accordingly. MUST be called for every alternative on every
    processed row (ordinals advance in lockstep so cross-alternative
    start_ord comparisons stay valid); callers may skip a row only
    when EVERY alternative is inert on it.

    ``helds`` selects the derivation (AlternationSpec.derivation):
    None → eager (earliest completion wins, documented default); a
    dict → SQL:2016 "leftmost" — completions are HELD in it (keyed by
    start ordinal, best alternative index kept) and emitted only once
    no earlier-listed alternative can still complete for that start
    (resolve_alternation_helds). The dict is caller-owned so the
    streaming operator can persist it per key across micro-batches."""
    merged: list[tuple[int, int, int, object]] = []
    for a, (nf, st) in enumerate(zip(nfas, states)):
        for pos, (seq, start_ord, br) in enumerate(
            nf.step_collect(st, t_us, pred_rows[a], payload)
        ):
            merged.append((start_ord, a, pos, br))
    if helds is not None:
        for start_ord, a, _pos, br in sorted(merged, key=lambda e: e[:3]):
            cur = helds.get(start_ord)
            if cur is None or a < cur[0]:
                helds[start_ord] = (a, br)
            elif (
                a == cur[0]
                and nfas[a].greedy_loops
                and _branch_end_ord(br) > _branch_end_ord(cur[1])
            ):
                # greedy loop branch (round 7): a later completion has
                # more iterations — SQL:2016 longest preferment within
                # the winning alternative (the hold persists while the
                # run lives; see resolve_alternation_helds)
                helds[start_ord] = (a, br)
        return resolve_alternation_helds(
            nfas, states, after_match, helds, final=False
        )
    if not merged:
        return []
    merged.sort(key=lambda e: e[:3])
    out: list[tuple[int, dict]] = []
    if after_match == SKIP_PAST_LAST_EVENT:
        start_ord, a, _, br = merged[0]
        out.append((a, nfas[a]._branch_dict(br)))
        for st in states:
            st.runs = []
    elif after_match == SKIP_TO_NEXT:
        emitted: set[int] = set()
        for start_ord, a, _, br in merged:
            if start_ord not in emitted:
                emitted.add(start_ord)
                out.append((a, nfas[a]._branch_dict(br)))
        for st in states:
            st.runs = [
                run for run in st.runs if run.start_ord not in emitted
            ]
    else:  # NO_SKIP — content dedup mirrors Nfa.step (ADVICE r12 medium)
        seen_emit: set = set()
        for start_ord, a, _, br in merged:
            k = (a, start_ord, _branch_content_key(br))
            if k not in seen_emit:
                seen_emit.add(k)
                out.append((a, nfas[a]._branch_dict(br)))
    return out


def _branch_end_ord(br: _Branch) -> int:
    """Last row ordinal consumed by a completed branch (positional —
    rows sharing a timestamp resolve by (order, tiebreak) position)."""
    return max(sp[4] for sp in br.rows if sp is not None)


def resolve_alternation_helds(
    nfas: list,
    states: list[NfaState],
    after_match: str,
    helds: dict,
    final: bool,
) -> list[tuple[int, dict]]:
    """Emit held completions whose SQL:2016 leftmost derivation is now
    decided (AlternationSpec.derivation == "leftmost").

    A held completion for start ordinal ``s`` from alternative
    ``a_held`` is blocked while an EARLIER-listed alternative still has
    a live run for ``s`` — that run, completing later, would win the
    derivation. Under SKIP PAST LAST ROW the resolution is additionally
    sequential by start: a live run with an earlier start (any
    alternative) blocks, because the standard scans starts in order and
    an earlier start's match preempts; emission discards runs AND holds
    whose start lies inside the emitted span (start_ord <= end_ord).
    Under SKIP TO NEXT ROW (and NO_SKIP, which leftmost collapses to
    one preferred match per start) starts decide independently.

    ``final=True`` (end of batch input / streaming state timeout)
    treats every live run as unable to complete."""
    out: list[tuple[int, dict]] = []
    if not helds:
        return out
    # one O(live runs) pass: per start ordinal, the best (lowest)
    # alternative index still alive — resolution checks are then O(1)
    # per held entry instead of O(runs) each
    live: dict[int, int] = {}
    if not final:
        for ai, st in enumerate(states):
            for run in st.runs:
                cur = live.get(run.start_ord)
                if cur is None or ai < cur:
                    live[run.start_ord] = ai
    if after_match == SKIP_PAST_LAST_EVENT:
        min_live = min(live) if live else None
        while helds:
            s_min = min(helds)
            a_held, br = helds[s_min]
            if min_live is not None and (
                min_live < s_min
                or (live.get(s_min, len(nfas)) < a_held)
                # greedy loop branch (round 7): its own live run can
                # still extend to a longer completion — hold
                or (
                    live.get(s_min) == a_held
                    and nfas[a_held].greedy_loops
                )
            ):
                break
            end_ord = _branch_end_ord(br)
            out.append((a_held, nfas[a_held]._branch_dict(br)))
            for st in states:
                st.runs = [r for r in st.runs if r.start_ord > end_ord]
            for s in [s for s in live if s <= end_ord]:
                del live[s]
            min_live = min(live) if live else None
            for s in [s for s in helds if s <= end_ord]:
                del helds[s]
    else:  # SKIP_TO_NEXT / NO_SKIP: per-start independent resolution
        for s in sorted(helds):
            a_held, br = helds[s]
            if live.get(s, len(nfas)) < a_held or (
                live.get(s) == a_held and nfas[a_held].greedy_loops
            ):
                continue
            out.append((a_held, nfas[a_held]._branch_dict(br)))
            for st in states:
                st.runs = [r for r in st.runs if r.start_ord != s]
            del helds[s]
    return out
