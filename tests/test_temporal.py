"""As-of / range join operator semantics on hand-built frames, a
brute-force differential on pseudo-random data, and plan-shape audits
(one Exchange for as-of; no nested-loop join for range)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flink_cep_examples_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "l1"),
            (1, _ts("2024-01-01 12:00:00"), "l2"),
            (2, _ts("2024-01-01 10:30:00"), "l3"),
            (3, _ts("2024-01-01 09:00:00"), "l4"),  # key with no right rows
        ],
        "k long, t timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:59:00"), 10.0),
            (1, _ts("2024-01-01 10:00:00"), 20.0),  # tie with l1's time
            (1, _ts("2024-01-01 11:30:00"), 30.0),
            (2, _ts("2024-01-01 10:45:00"), 40.0),  # after l3 only
        ],
        "k long, t timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive_and_outer(spark):
    left, right = _frames(spark)
    out = {
        r["lbl"]: (r["v"], r["t_r"])
        for r in asof_join(left, right, "k", "t").collect()
    }
    assert out["l1"] == (20.0, _ts("2024-01-01 10:00:00"))  # tie: inclusive
    assert out["l2"] == (30.0, _ts("2024-01-01 11:30:00"))
    assert out["l3"] == (None, None)  # right row is in the future
    assert out["l4"] == (None, None)  # unmatched key kept (outer)


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        r["lbl"]: r["v"]
        for r in asof_join(
            left, right, "k", "t", direction="forward"
        ).collect()
    }
    assert out["l1"] == 20.0  # inclusive tie wins over 11:30
    assert out["l2"] is None  # nothing at/after 12:00
    assert out["l3"] == 40.0


def test_asof_tolerance_boundary(spark):
    left, right = _frames(spark)
    # l2 matches 11:30 (gap = 30 min): inclusive at exactly 1800 s,
    # excluded one microsecond under
    out = asof_join(left, right, "k", "t", tolerance_seconds=1800)
    got = {r["lbl"]: r["v"] for r in out.collect()}
    assert got["l2"] == 30.0
    out2 = asof_join(left, right, "k", "t", tolerance_seconds=1799.999999)
    got2 = {r["lbl"]: r["v"] for r in out2.collect()}
    assert got2["l2"] is None


def test_asof_single_exchange_plan(spark):
    left, right = _frames(spark)
    plan = (
        asof_join(left, right, "k", "t")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan  # window-merge, not a join at all


def test_range_join_bounds_inclusive(spark):
    left, right = _frames(spark)
    pairs = range_join(
        left,
        right,
        on="k",
        left_time="t",
        right_time="t",
        lower_seconds=-3600,
        upper_seconds=0,
    ).collect()
    got = sorted((r["lbl"], r["v"]) for r in pairs)
    # l1@10:00 window [09:00,10:00]: hits 09:59 and the 10:00 tie
    # l2@12:00 window [11:00,12:00]: hits 11:30
    # l3@10:30 window [09:30,10:30]: right row 10:45 is outside
    assert got == [("l1", 10.0), ("l1", 20.0), ("l2", 30.0)]


def test_range_join_differential_vs_bruteforce(spark):
    """Pseudo-random frames: binned range join == naive O(n^2) filter."""
    import hashlib

    def h(i, s):
        return int(hashlib.md5(f"{s}:{i}".encode()).hexdigest()[:8], 16)

    base = dt.datetime(2024, 1, 1)
    lrows = [
        (h(i, "k") % 5, base + dt.timedelta(seconds=h(i, "lt") % 7200), i)
        for i in range(60)
    ]
    rrows = [
        (h(i, "rk") % 5, base + dt.timedelta(seconds=h(i, "rt") % 7200), i)
        for i in range(60)
    ]
    left = spark.createDataFrame(lrows, "k long, t timestamp, lid long")
    right = spark.createDataFrame(rrows, "k long, rt timestamp, rid long")
    lo, hi = -300, 450
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(
            left, right, "k", "t", "rt", lower_seconds=lo, upper_seconds=hi
        ).collect()
    )
    want = sorted(
        (lid, rid)
        for lk, lt, lid in lrows
        for rk, rt, rid in rrows
        if lk == rk
        and lt + dt.timedelta(seconds=lo) <= rt <= lt + dt.timedelta(seconds=hi)
    )
    assert got == want and want  # non-empty: the test actually bites


def test_range_join_no_nested_loop(spark):
    left, right = _frames(spark)
    plan = (
        range_join(left, right, "k", "t", "t", -3600, 0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
