"""Ordered funnel analysis and cohort retention over event streams —
the two workhorse product-analytics queries (every events warehouse
ships them: Amplitude/Mixpanel-style funnels, the classic triangle
retention matrix). The reference engine's event surface is a grouped
hourly count (/root/reference/src/download.py:607-637 family); these
add the ORDER-aware and FIRST-TOUCH-aware layers on top.

Spark-first shapes:

- ``funnel_steps``: the greedy earliest-match chain — step i+1's
  timestamp is the MIN event time satisfying its predicate strictly
  after step i's timestamp, per key. That is k−1 self-joins, each a
  hash equi-join on the key; after the first shuffle every subsequent
  join reuses the same hash partitioning (no re-shuffle — the
  exchange-reuse discipline), and each step's aggregate shrinks the
  frame to one row per surviving key, so the chain gets CHEAPER per
  step, not more expensive. No window sort over whole histories, no
  per-key UDF state.
- ``cohort_retention``: two aggregates — first-touch per key (the
  cohort), then distinct (key, period) activity joined back and
  counted per (cohort, periods_since). The join's right side is one
  row per key (broadcastable when the key space is small; hash join
  co-partitioned on key otherwise).

Both are exactly SQL-expressible, so their oracles are literal
translations, not approximations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PERIODS = {"day": "DD", "week": "WEEK", "month": "MM", "hour": "HH"}


def funnel_steps(
    df: DataFrame,
    key_col: str,
    time_col: str,
    steps: list[tuple[str, str]],
    within: str | None = None,
) -> DataFrame:
    """Per-key greedy funnel: for ``steps = [(name, predicate), ...]``
    compute ``t_<name>`` = the earliest event time matching predicate
    ``i`` STRICTLY AFTER the key's step-``i−1`` time (first step:
    earliest match overall). Returns one row per key that completed
    step 1, with NULL times from the first uncompleted step on, plus
    ``stage`` = number of completed steps. ``within`` (an INTERVAL
    literal, e.g. ``'7 days'``) additionally requires every later
    step to land within that interval of step 1 — the conversion-
    window convention.

    Strictly-after ordering means a single event can never satisfy
    two consecutive steps (the standard funnel rule, and what makes
    the greedy chain well-defined under duplicate timestamps: ties
    between DIFFERENT steps' events at the same instant do not
    chain)."""
    if len(steps) < 1:
        raise ValueError("steps must be non-empty")
    names = [n for n, _ in steps]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate step names: {names}")

    key = F.col(key_col)
    first_name, first_pred = steps[0]
    cur = (
        df.filter(F.expr(first_pred))
        .groupBy(key.alias("_k"))
        .agg(F.min(F.col(time_col)).alias(f"t_{first_name}"))
    )
    prev_t = f"t_{first_name}"
    for name, pred in steps[1:]:
        nxt = (
            df.filter(F.expr(pred))
            .select(key.alias("_k"), F.col(time_col).alias("_t"))
            .join(cur, "_k")
            .filter(F.col("_t") > F.col(prev_t))
        )
        if within is not None:
            nxt = nxt.filter(
                F.col("_t")
                <= F.col(f"t_{steps[0][0]}")
                + F.expr(f"INTERVAL {within}")
            )
        agg = nxt.groupBy("_k").agg(F.min("_t").alias(f"t_{name}"))
        cur = cur.join(agg, "_k", "left")
        prev_t = f"t_{name}"
    stage = sum(
        [
            F.when(F.col(f"t_{n}").isNotNull(), F.lit(1)).otherwise(
                F.lit(0)
            )
            for n in names
        ],
        F.lit(0),
    )
    return cur.withColumnRenamed("_k", key_col).withColumn(
        "stage", stage
    )


def funnel_counts(
    df: DataFrame,
    key_col: str,
    time_col: str,
    steps: list[tuple[str, str]],
    within: str | None = None,
) -> DataFrame:
    """The funnel summary: for each step, how many keys reached AT
    LEAST that stage, plus the step-over-step and overall conversion
    ratios. k rows out — the chart every funnel UI draws."""
    per_key = funnel_steps(df, key_col, time_col, steps, within)
    names = [n for n, _ in steps]
    agg = per_key.agg(
        *[
            F.sum(
                F.when(F.col("stage") >= i + 1, F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias(f"_c{i}")
            for i in range(len(names))
        ]
    )
    structs = [
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(n).alias("name"),
            F.col(f"_c{i}").alias("reached"),
            (
                F.col(f"_c{i}")
                / F.when(F.col("_c0") > 0, F.col("_c0")).cast("double")
            ).alias("conversion"),
            (
                F.col(f"_c{i}")
                / F.when(
                    F.col(f"_c{max(i - 1, 0)}") > 0,
                    F.col(f"_c{max(i - 1, 0)}"),
                ).cast("double")
            ).alias("step_conversion"),
        )
        for i, n in enumerate(names)
    ]
    return agg.select(F.explode(F.array(*structs)).alias("_r")).select(
        "_r.*"
    )


def cohort_retention(
    df: DataFrame,
    key_col: str,
    time_col: str,
    period: str = "day",
) -> DataFrame:
    """The retention triangle: cohort keys by their FIRST-touch
    period, then count how many of each cohort were active again n
    periods later. Returns ``(cohort, periods_since, n_active,
    n_cohort, retention)`` — ``periods_since = 0`` rows carry the
    cohort sizes (retention 1.0 by construction).

    ``period``: hour | day | week | month (calendar truncation;
    ``periods_since`` counts CALENDAR periods between the truncated
    stamps, the product-analytics convention)."""
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}")
    trunc = F.date_trunc(period, F.col(time_col))
    activity = (
        df.select(
            F.col(key_col).alias("_k"), trunc.alias("_p")
        ).distinct()
    )
    first = activity.groupBy("_k").agg(F.min("_p").alias("_cohort"))
    if period == "hour":
        diff = (
            F.unix_timestamp("_p") - F.unix_timestamp("_cohort")
        ) / F.lit(3600)
    elif period == "day":
        diff = F.datediff(F.col("_p"), F.col("_cohort"))
    elif period == "week":
        diff = F.datediff(F.col("_p"), F.col("_cohort")) / F.lit(7)
    else:  # month
        diff = F.months_between(F.col("_p"), F.col("_cohort"))
    joined = activity.join(first, "_k").select(
        "_k",
        "_cohort",
        diff.cast("long").alias("periods_since"),
    )
    sizes = first.groupBy("_cohort").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    out = (
        joined.groupBy("_cohort", "periods_since")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(sizes, "_cohort")
        .select(
            F.col("_cohort").alias("cohort"),
            "periods_since",
            "n_active",
            "n_cohort",
            (F.col("n_active") / F.col("n_cohort")).alias("retention"),
        )
    )
    return out


def transition_matrix(
    df: DataFrame,
    key_col: str,
    time_col: str,
    state_col: str,
    order_cols: list[str] | None = None,
    include_ends: bool = False,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: count every consecutive ``(from_state, to_state)``
    pair (ordered by ``time_col`` then ``order_cols`` — pass a
    unique tiebreaker when stamps collide), and the row-normalized
    probability ``p = n / Σ n over from_state`` — the "what do users
    do next" matrix behind every flow-sankey UI, and the training
    count table for sequence models.

    ``include_ends=True`` adds the boundary pseudo-states: a
    ``__START__ → first-event`` transition per key (the entry-point
    distribution) and ``last-event → __END__`` (the exit-point
    distribution).

    Spark shape: ONE key shuffle for the lag window, one two-key
    aggregate (partial-combined), and a from_state-sum window over
    the |states|² aggregate — never over events."""
    from pyspark.sql import Window

    order = [F.col(time_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    lagged = df.select(
        F.col(key_col).alias("_k"),
        F.col(state_col).cast("string").alias("_to"),
        F.lag(F.col(state_col).cast("string")).over(w).alias("_from"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy(key_col)
        ).alias("_len"),
    )
    pairs = lagged.filter(F.col("_from").isNotNull()).select(
        F.col("_from").alias("from_state"),
        F.col("_to").alias("to_state"),
    )
    if include_ends:
        starts = lagged.filter(F.col("_rn") == 1).select(
            F.lit("__START__").alias("from_state"),
            F.col("_to").alias("to_state"),
        )
        ends = lagged.filter(F.col("_rn") == F.col("_len")).select(
            F.col("_to").alias("from_state"),
            F.lit("__END__").alias("to_state"),
        )
        pairs = pairs.unionByName(starts).unionByName(ends)
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_from = Window.partitionBy("from_state")
    return counts.select(
        "from_state",
        "to_state",
        "n",
        (F.col("n") / F.sum("n").over(w_from)).alias("p"),
    )


def sequence_pattern(
    df: DataFrame,
    pattern: str,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    event_col: str = "event_type",
    sep: str = ",",
) -> DataFrame:
    """MATCH_RECOGNIZE-lite: regex matching over each key's time-
    ordered event-type SEQUENCE — the complex-event-processing
    primitive (SQL:2016 row pattern matching; Flink CEP) the funnel
    above can't express: funnels ask "did these steps happen in
    order, anything between"; a pattern like ``error(,error)+,purchase``
    asks for CONSECUTIVE structure (runs, alternations, bounded
    repetition).

    Each key's events collapse to one string in (time, id) order with
    a DOUBLED ``sep`` between events and single ``sep`` brackets
    (",a,,b,,c,"): every token carries its OWN boundary separators, so
    a pattern token is written ``,a,`` and adjacent non-overlapping
    matches never share a delimiter character. (With single
    separators ",a,b," the first match of a bracketed pattern
    consumes the comma the next run needs, silently undercounting
    back-to-back occurrences.) ``er`` still can never match inside
    ``error``. Matches count NON-overlapping occurrences (regexp
    semantics in both engines).

    Scale shape: one shuffle on the key (the collect_list aggregate,
    partial-combining); the regex runs once per KEY on a string bounded
    by that key's history — the sessionize memory model (a key's
    sequence must fit a task; pre-split pathological keys by coarse
    time bucket first). Returns (key, seq_len, n_matches, matched)."""
    ordered = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(time_col).alias("t"),
                F.col(id_col).alias("i"),
                F.col(event_col).alias("e"),
            )
        )
    )
    seq = F.concat(
        F.lit(sep),
        F.array_join(F.transform(ordered, lambda s: s["e"]), sep + sep),
        F.lit(sep),
    )
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("seq_len"),
            F.regexp_count(seq, F.lit(pattern)).alias("n_matches"),
        )
        .withColumn("matched", (F.col("n_matches") > 0).cast("int"))
    )
