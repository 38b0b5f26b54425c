"""Round-2 pattern algebra on the golden billing input: the Flink CEP
idioms beyond the reference's own four programs that a CEP user
reaches for next.

1. ``notFollowedBy`` — absence INSIDE the pattern: alarms with no
   top-up in the following hour (the in-pattern twin of the
   TimedOutPartialMatchHandler flavor in cep_absence_alerts.py).
   Golden input: id 1's 11:00 alarm never tops up → one row.
2. ``times(2, 3)`` + ``consecutive()`` — counted strict loops.
3. ``AFTER MATCH SKIP TO NEXT ROW`` — at most one match per start row,
   overlapping matches across start rows allowed.
"""

import sys

from _common import input_df, session

from flink_cep_examples_spark.operators import match_pattern
from flink_cep_examples_spark.plans import Measure, Pattern
from flink_cep_examples_spark.plans.pattern import NO_SKIP, SKIP_TO_NEXT
from flink_cep_examples_spark.schemas import MATCH_TAG

ALARM = "balanceBefore >= 10 AND balanceAfter < 10"
NON_INCREASING = "balanceBefore >= balanceAfter"
TOPUP = "balanceBefore < balanceAfter"


def absence_in_pattern(df):
    spec = (
        Pattern.begin("A", skip=NO_SKIP)
        .where(ALARM)
        .not_followed_by("N")
        .where(TOPUP)
        .within("1 hour")
        .build(
            key_cols=("id",),
            order_col="event_time",
            tiebreak_col="seq",
            measures=(Measure("alarmTriggerDatetime", "A", "datetime", "first"),),
        )
    )
    return match_pattern(df, spec).where(f"tag = '{MATCH_TAG}'").drop("tag")


def counted_consecutive(df):
    spec = (
        Pattern.begin("A", skip=NO_SKIP)
        .where(ALARM)
        .next("B")
        .where(NON_INCREASING)
        .times(2, 3)
        .consecutive()
        .next("C")
        .where(TOPUP)
        .within("1 day")
        .build(
            key_cols=("id",),
            order_col="event_time",
            tiebreak_col="seq",
            measures=(
                Measure("alarmTriggerDatetime", "A", "datetime", "first"),
                Measure("nB", "B", "datetime", "count"),
                Measure("topupDatetime", "C", "datetime", "last"),
            ),
        )
    )
    return match_pattern(df, spec).drop("tag")


def skip_to_next_row(df):
    spec = (
        Pattern.begin("A", skip=SKIP_TO_NEXT)
        .where(ALARM)
        .followed_by("C")
        .where(TOPUP)
        .within("1 hour")
        .build(
            key_cols=("id",),
            order_col="event_time",
            tiebreak_col="seq",
            measures=(
                Measure("alarmTriggerDatetime", "A", "datetime", "first"),
                Measure("topupDatetime", "C", "datetime", "last"),
            ),
        )
    )
    return match_pattern(df, spec).drop("tag")


def skip_to_last(df):
    """SQL:2016 AFTER MATCH SKIP TO LAST <var> (round 3): after a
    match, scanning resumes AT the last row variable B consumed —
    overlapping matches whose start lies at/after that row survive.
    On the golden input the billing algebra makes strategies coincide;
    the strategy-distinguishing fixtures live in
    tests/test_pattern_algebra.py."""
    from flink_cep_examples_spark.plans.pattern import SKIP_TO_LAST

    spec = (
        Pattern.begin("A", skip=SKIP_TO_LAST, skip_var="B")
        .where(ALARM)
        .next("B")
        .one_or_more()
        .optional()
        .where(NON_INCREASING)
        .next("C")
        .where(TOPUP)
        .within("1 hour")
        .build(
            key_cols=("id",),
            order_col="event_time",
            tiebreak_col="seq",
            measures=(
                Measure("alarmTriggerDatetime", "A", "datetime", "first"),
                Measure("topupDatetime", "C", "datetime", "last"),
            ),
        )
    )
    return match_pattern(df, spec).drop("tag")


def main() -> None:
    spark = session()
    df = input_df(spark, sys.argv)
    print("== notFollowedBy (alarm with no top-up within 1h)")
    absence_in_pattern(df).show(truncate=False)
    print("== times(2,3).consecutive() (alarm, 2-3 non-increasing, top-up)")
    counted_consecutive(df).show(truncate=False)
    print("== AFTER MATCH SKIP TO NEXT ROW")
    skip_to_next_row(df).show(truncate=False)
    print("== AFTER MATCH SKIP TO LAST B")
    skip_to_last(df).show(truncate=False)


if __name__ == "__main__":
    main()
