"""Funnel and cohort-retention semantics pinned by hand-built event
timelines: greedy strictly-after chaining, conversion windows,
same-instant ties NOT chaining, cohort first-touch assignment and
calendar-period indexing."""

import datetime as dt

import pytest
from pyspark.sql import Row

from updater_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_steps,
)


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


STEPS = [
    ("view", "etype = 'view'"),
    ("click", "etype = 'click'"),
    ("buy", "etype = 'buy'"),
]


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes the funnel in order
        Row(u=1, ts=_ts(1, 9), etype="view"),
        Row(u=1, ts=_ts(1, 10), etype="click"),
        Row(u=1, ts=_ts(2, 11), etype="buy"),
        # u2: click BEFORE view -> that click can't count; a later
        # click chains
        Row(u=2, ts=_ts(1, 8), etype="click"),
        Row(u=2, ts=_ts(1, 9), etype="view"),
        Row(u=2, ts=_ts(1, 12), etype="click"),
        # u3: view only
        Row(u=3, ts=_ts(3, 9), etype="view"),
        # u4: same-instant view+click -> strictly-after rule blocks
        # the chain
        Row(u=4, ts=_ts(1, 9), etype="view"),
        Row(u=4, ts=_ts(1, 9), etype="click"),
        # u5: full funnel but buy lands outside a 1-day window
        Row(u=5, ts=_ts(1, 9), etype="view"),
        Row(u=5, ts=_ts(1, 10), etype="click"),
        Row(u=5, ts=_ts(5, 9), etype="buy"),
        # u6: never views -> absent from output
        Row(u=6, ts=_ts(1, 9), etype="buy"),
    ]
    return spark.createDataFrame(rows)


def test_greedy_strictly_after_chain(spark, events):
    got = {
        r["u"]: r
        for r in funnel_steps(events, "u", "ts", STEPS).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1]["stage"] == 3
    assert got[1]["t_buy"] == _ts(2, 11)
    # u2's pre-view click ignored; later click picked
    assert got[2]["stage"] == 2
    assert got[2]["t_click"] == _ts(1, 12)
    assert got[3]["stage"] == 1 and got[3]["t_click"] is None
    # same-instant tie does not chain
    assert got[4]["stage"] == 1
    assert got[5]["stage"] == 3


def test_conversion_window(spark, events):
    got = {
        r["u"]: r
        for r in funnel_steps(
            events, "u", "ts", STEPS, within="1 days"
        ).collect()
    }
    # u5's buy at day 5 falls outside the 1-day window from view
    assert got[5]["stage"] == 2
    # u1's buy at day 2 11:00 is outside 1 day of day-1 09:00 too
    assert got[1]["stage"] == 2
    got48 = {
        r["u"]: r
        for r in funnel_steps(
            events, "u", "ts", STEPS, within="48 hours"
        ).collect()
    }
    assert got48[1]["stage"] == 3 and got48[5]["stage"] == 2


def test_funnel_counts(spark, events):
    rows = {
        r["name"]: r
        for r in funnel_counts(events, "u", "ts", STEPS).collect()
    }
    assert rows["view"]["reached"] == 5
    assert rows["click"]["reached"] == 3
    assert rows["buy"]["reached"] == 2
    assert rows["view"]["conversion"] == 1.0
    assert rows["buy"]["conversion"] == pytest.approx(2 / 5)
    assert rows["buy"]["step_conversion"] == pytest.approx(2 / 3)


def test_funnel_validation(spark, events):
    with pytest.raises(ValueError, match="non-empty"):
        funnel_steps(events, "u", "ts", [])
    with pytest.raises(ValueError, match="duplicate"):
        funnel_steps(
            events, "u", "ts", [("a", "1=1"), ("a", "1=1")]
        )


def test_cohort_retention_day(spark):
    rows = [
        # cohort Jan 1: u1 active day 0, 1, 3; u2 active day 0 only
        Row(u=1, ts=_ts(1, 9)),
        Row(u=1, ts=_ts(1, 23)),  # same day: one activity
        Row(u=1, ts=_ts(2, 1)),
        Row(u=1, ts=_ts(4, 5)),
        Row(u=2, ts=_ts(1, 5)),
        # cohort Jan 2: u3 active day 0 and 2
        Row(u=3, ts=_ts(2, 8)),
        Row(u=3, ts=_ts(4, 8)),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["cohort"].day, r["periods_since"]): r
        for r in cohort_retention(df, "u", "ts", "day").collect()
    }
    assert got[(1, 0)]["n_cohort"] == 2
    assert got[(1, 0)]["n_active"] == 2
    assert got[(1, 0)]["retention"] == 1.0
    assert got[(1, 1)]["n_active"] == 1
    assert got[(1, 1)]["retention"] == 0.5
    assert got[(1, 3)]["n_active"] == 1
    assert (1, 2) not in got  # nobody from Jan-1 cohort active Jan 3
    assert got[(2, 0)]["n_cohort"] == 1
    assert got[(2, 2)]["n_active"] == 1
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, "u", "ts", "year")


def test_cohort_retention_week_and_hour(spark):
    rows = [
        Row(u=1, ts=_ts(1, 9)),    # Mon Jan 1
        Row(u=1, ts=_ts(10, 9)),   # Wed Jan 10 -> week index 1
        Row(u=2, ts=_ts(1, 9, 30)),
        Row(u=2, ts=_ts(1, 11)),   # hour index 2
    ]
    df = spark.createDataFrame(rows)
    wk = {
        (r["cohort"].day, r["periods_since"])
        for r in cohort_retention(df, "u", "ts", "week").collect()
    }
    assert (1, 0) in wk and (1, 1) in wk
    hr = {
        r["periods_since"]
        for r in cohort_retention(
            df.filter(df.u == 2), "u", "ts", "hour"
        ).collect()
    }
    assert hr == {0, 2}


def test_transition_matrix(spark):
    from updater_spark.operators.funnel import transition_matrix

    rows = [
        Row(u=1, ts=_ts(1, 1), id=1, e="view"),
        Row(u=1, ts=_ts(1, 2), id=2, e="click"),
        Row(u=1, ts=_ts(1, 3), id=3, e="view"),
        Row(u=1, ts=_ts(1, 4), id=4, e="buy"),
        Row(u=2, ts=_ts(1, 1), id=5, e="view"),
        Row(u=2, ts=_ts(1, 2), id=6, e="click"),
        Row(u=3, ts=_ts(1, 1), id=7, e="view"),  # single event: no pair
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p"])
        for r in transition_matrix(
            df, "u", "ts", "e", order_cols=["id"]
        ).collect()
    }
    # view -> {click: 2, buy: 1}; click -> view: 1
    assert got[("view", "click")] == (2, pytest.approx(2 / 3))
    assert got[("view", "buy")] == (1, pytest.approx(1 / 3))
    assert got[("click", "view")] == (1, 1.0)
    assert ("buy", "view") not in got
    # cross-user pairs never form (u2's click doesn't chain to u3)
    assert sum(n for n, _ in got.values()) == 4

    withends = {
        (r["from_state"], r["to_state"]): r["n"]
        for r in transition_matrix(
            df, "u", "ts", "e", order_cols=["id"], include_ends=True
        ).collect()
    }
    assert withends[("__START__", "view")] == 3
    assert withends[("buy", "__END__")] == 1
    assert withends[("click", "__END__")] == 1
    assert withends[("view", "__END__")] == 1  # u3's single event


def test_sequence_pattern_hand_values(spark):
    from datetime import datetime

    from updater_spark.operators.funnel import sequence_pattern

    def ev(i, user, typ, minute):
        return (i, datetime(2024, 1, 1, 9, minute), user, typ, 0.0, "")

    rows = [
        # user 1: error,error,purchase -> one match
        ev(0, 1, "error", 0), ev(1, 1, "error", 1), ev(2, 1, "purchase", 2),
        # user 2: error,click,error,purchase -> run broken, no match
        ev(3, 2, "error", 0), ev(4, 2, "click", 1),
        ev(5, 2, "error", 2), ev(6, 2, "purchase", 3),
        # user 3: two disjoint matching runs
        ev(7, 3, "error", 0), ev(8, 3, "error", 1), ev(9, 3, "purchase", 2),
        ev(10, 3, "error", 3), ev(11, 3, "error", 4), ev(12, 3, "error", 5),
        ev(13, 3, "purchase", 6),
        # user 4: single error then purchase -> needs >= 2 errors
        ev(14, 4, "error", 0), ev(15, 4, "purchase", 1),
        # user 5: two BACK-TO-BACK matching runs with nothing between —
        # the case single separators undercount (shared delimiter)
        ev(16, 5, "error", 0), ev(17, 5, "error", 1),
        ev(18, 5, "purchase", 2),
        ev(19, 5, "error", 3), ev(20, 5, "error", 4),
        ev(21, 5, "purchase", 5),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {
        r["user_id"]: (r["n_matches"], r["matched"])
        for r in sequence_pattern(
            df, pattern=",error,(,error,)+,purchase,"
        ).collect()
    }
    assert out == {
        1: (1, 1), 2: (0, 0), 3: (2, 1), 4: (0, 0), 5: (2, 1)
    }


def test_sequence_pattern_orders_by_time_then_id(spark):
    from datetime import datetime

    from updater_spark.operators.funnel import sequence_pattern

    t = datetime(2024, 1, 1, 9, 0)
    # same timestamp: event_id decides the order -> error,purchase
    rows = [
        (1, t, 9, "purchase", 0.0, ""),
        (0, t, 9, "error", 0.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = sequence_pattern(df, pattern=",error,,purchase,").collect()[0]
    assert out["n_matches"] == 1


def test_sequence_pattern_counts_match_python_regex(spark):
    """The doubled-separator convention against a Python re reference
    over a brute-force event-type enumeration — pins that regexp_count
    over the engine's string equals non-overlapping re.findall over
    the same construction, including every back-to-back case up to
    length 6."""
    import itertools
    import re
    from datetime import datetime

    from updater_spark.operators.funnel import sequence_pattern

    pattern = ",error,(,error,)+,purchase,"
    rows = []
    expected = {}
    uid = 0
    for n in (3, 4, 5, 6):
        for combo in itertools.product(["error", "purchase"], repeat=n):
            s = "," + ",,".join(combo) + ","
            expected[uid] = len(re.findall(pattern, s))
            for j, ev in enumerate(combo):
                rows.append(
                    (uid * 100 + j, datetime(2024, 1, 1, 9, j), uid, ev,
                     0.0, "")
                )
            uid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r["user_id"]: r["n_matches"]
        for r in sequence_pattern(df, pattern=pattern).collect()
    }
    assert got == expected
