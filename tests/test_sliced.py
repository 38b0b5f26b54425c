"""Time-sliced CEP (round 4): the hot-key skew answer for batch
pattern matching — each key's timeline splits into within-bounded
overlapping slices matched in parallel, a match owned by the slice
holding its first row. Differential-tested against the sequential
operator on seeded random streams (matches AND absence timeouts),
plus validation and parallelism-shape checks.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from flink_cep_examples_spark.operators.cep_batch import (
    match_pattern,
    match_pattern_time_sliced,
)
from flink_cep_examples_spark.plans.pattern import (
    Measure,
    NO_SKIP,
    Pattern,
    SKIP_TO_NEXT,
)

_SCHEMA = (
    "id string, event_time timestamp, seq long, fa boolean, fc boolean"
)


def _spec(skip=SKIP_TO_NEXT, emit_timeouts=False):
    p = (
        Pattern.begin("A", skip=skip)
        .where("fa")
        .followed_by("C")
        .where("fc")
        .within("30 minutes")
    )
    return p.build(
        measures=[
            Measure("a_seq", "A", "seq", "first"),
            Measure("c_seq", "C", "seq", "first"),
        ],
        emit_timeouts=emit_timeouts,
    )


def _random_df(spark, seed=11, keys=12):
    rng = random.Random(seed)
    rows = []
    for k in range(keys):
        n = rng.randint(20, 120)
        t = dt.datetime(2020, 5, 1)
        for i in range(n):
            # irregular gaps so matches straddle slice boundaries
            t += dt.timedelta(minutes=rng.randint(1, 25))
            rows.append(
                (f"k{k}", t, i, rng.random() < 0.3, rng.random() < 0.25)
            )
    return spark.createDataFrame(rows, _SCHEMA)


@pytest.mark.parametrize("emit_timeouts", [False, True])
def test_sliced_matches_sequential(spark, emit_timeouts):
    spec = _spec(emit_timeouts=emit_timeouts)
    df = _random_df(spark)
    seq = sorted(map(tuple, match_pattern(df, spec).collect()))
    sliced = sorted(
        map(tuple, match_pattern_time_sliced(df, spec).collect())
    )
    assert seq and seq == sliced


def test_sliced_longer_slices_agree(spark):
    spec = _spec(skip=NO_SKIP)
    df = _random_df(spark, seed=12)
    seq = sorted(map(tuple, match_pattern(df, spec).collect()))
    for dur in ("30 minutes", "2 hours", "1 day"):
        got = sorted(
            map(
                tuple,
                match_pattern_time_sliced(
                    df, spec, slice_duration=dur
                ).collect(),
            )
        )
        assert seq == got, dur


def test_sliced_validation():
    import dataclasses

    spec = _spec()
    with pytest.raises(ValueError, match="must be >= within"):
        match_pattern_time_sliced(None, spec, slice_duration="5 minutes")
    no_within = dataclasses.replace(spec, within=None)
    with pytest.raises(ValueError, match="within"):
        match_pattern_time_sliced(None, no_within)
    past_last = _spec(skip="skip_past_last_event")
    with pytest.raises(NotImplementedError, match="sequential cursor"):
        match_pattern_time_sliced(None, past_last)
    mno = dataclasses.replace(
        spec, measures=(*spec.measures, Measure("n", "", "", "match_number"))
    )
    with pytest.raises(NotImplementedError, match="MATCH_NUMBER"):
        match_pattern_time_sliced(None, mno)


def test_sliced_spreads_hot_key(spark):
    """The shuffle key is (key, slice): one hot key's rows land in
    many groups — assert the sliced plan repartitions on both."""
    spec = _spec()
    df = _random_df(spark, seed=13, keys=1)  # a single hot key
    out = match_pattern_time_sliced(df, spec)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__slice" in plan
    # and the results still agree with the sequential scan
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, match_pattern(df, spec).collect())
    )


def test_sliced_negative_timestamps(spark):
    """Pre-1970 event times: slice ids go negative and cross-boundary
    matches must still replicate into the previous slice (pmod-based
    offsets, no home>0 guard)."""
    rows = [
        ("k", dt.datetime(1969, 12, 31, 23, 58), 0, True, False),
        ("k", dt.datetime(1970, 1, 1, 0, 1), 1, False, True),
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    spec = _spec()
    seq = sorted(map(tuple, match_pattern(df, spec).collect()))
    sliced = sorted(
        map(tuple, match_pattern_time_sliced(df, spec).collect())
    )
    assert seq, "expected the cross-epoch match"
    assert seq == sliced
