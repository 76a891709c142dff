"""Interval (range) join: points against [start, end) intervals.

The reference has no temporal joins (SURVEY.md §2.3: all joins are
integer equi-joins); this is the second temporal shape a pipeline
needs beside ``asof_join`` — "which window was this event inside?":
maintenance windows, promo periods, experiment enrollment spans,
validity intervals of slowly-changing dimensions.

Spark's optimizer turns a raw inequality join (``p.ts >= i.start AND
p.ts < i.end``) into a BroadcastNestedLoopJoin (or a cartesian
product when neither side broadcasts) — O(|P|·|I|) comparisons per
key group. The scalable composition is the classic *binning* trick
(same family as DuckDB/Databricks range-join optimizations, built
from plain operators):

1. choose a bin width ``w``; a point belongs to bin floor(ts/w);
2. explode each interval into the bins it overlaps — an interval of
   length L produces ceil(L/w)+1 candidate rows, so pick ``w`` near
   the TYPICAL interval length to keep the blow-up ~2×;
3. hash equi-join on (partition keys…, bin) — ONE shuffle of each
   side, AQE-splittable like any other equi-join;
4. apply the exact predicate ``start <= ts < end`` to discard
   same-bin false candidates.

Each (point, interval) pair meets in exactly one bin (the point's),
so no dedup pass is needed. Output cardinality equals the true match
count; a point inside k overlapping intervals yields k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts < end`` (and equal ``on`` keys, if given).

    Timestamps/bounds may be numeric or timestamp columns (timestamps
    are binned via ``unix_micros``; ``bin_width`` is then seconds).
    ``how='left'`` keeps unmatched points with NULL interval columns.
    Column name collisions between the two inputs (other than ``on``)
    must be resolved by the caller — both sides' columns are carried.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    on = list(on or [])

    def to_num(c):
        col = F.col(c)
        # timestamp-typed columns bin on epoch micros (bin_width: sec);
        # cast("timestamp") lets TIMESTAMP_NTZ through unix_micros
        # (no-op on LTZ, wall-clock-preserving under a pinned UTC tz)
        if _is_ts(points, intervals, c):
            return F.unix_micros(col.cast("timestamp"))
        return col

    width = F.lit(bin_width * 1_000_000) if _is_ts(
        points, intervals, point_ts
    ) else F.lit(bin_width)

    p = points.withColumn("__bin", F.floor(to_num(point_ts) / width)).alias(
        "__p"
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(to_num(start_col) / width),
                # end is exclusive, but a zero-length tail still needs
                # its bin; sequence is inclusive on both ends
                F.floor(to_num(end_col) / width),
            )
        ),
    ).alias("__i")

    # bin equality is what makes this an equi-join physically; the
    # range predicate rides along and discards same-bin false hits.
    # A point meets each interval in exactly ONE bin (its own), so a
    # left join emits unmatched points once and matched points once
    # per true overlap — no dedup, no anti-join pass.
    cond = F.col("__p.__bin") == F.col("__i.__bin")
    for c in on:
        cond = cond & (F.col(f"__p.{c}") == F.col(f"__i.{c}"))
    cond = (
        cond
        & (F.col(f"__p.{point_ts}") >= F.col(f"__i.{start_col}"))
        & (F.col(f"__p.{point_ts}") < F.col(f"__i.{end_col}"))
    )
    i_cols = [
        c for c in intervals.columns if c not in on
    ]
    return p.join(i, cond, how).select(
        *[F.col(f"__p.{c}").alias(c) for c in points.columns],
        *[F.col(f"__i.{c}").alias(c) for c in i_cols],
    )


def _is_ts(a: DataFrame, b: DataFrame, col: str) -> bool:
    for df in (a, b):
        if col in df.columns:
            return dict(df.dtypes)[col].startswith("timestamp")
    raise ValueError(f"column {col!r} not found in either input")
