"""As-of (point-in-time) join.

The reference has no temporal joins (SURVEY.md §2.3: all joins are
integer equi-joins), but a training-data pipeline routinely needs
"latest state as of event time" lookups — feature snapshots joined to
example timestamps, prior-action context for each interaction, etc.

Spark has no native ASOF JOIN, so this is the classic composition on
built-in operators (pattern used by Flink temporal joins and DuckDB's
ASOF implementation, re-expressed as union + window):

1. union the left (probe) and right (build) rows into one stream
   tagged with a side marker, carrying the right payload as a struct
   (NULL on left rows);
2. one window per key ordered by (ts, side, tiebreak) with
   ``last(payload, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)`` — each left row
   picks up the payload of the nearest preceding right row;
3. keep left rows, unpack the struct.

Why this shape at 100 TB: a naive range join (``l.key = r.key AND
r.ts <= l.ts`` + argmax) explodes to |matches| intermediate rows —
quadratic per key for long histories. The union+window form shuffles
each input ONCE on the key and then does a linear sort-scan per
partition: cost is sort(|L|+|R|), independent of history length.
Skewed keys behave like any other window (one key = one task); salt
by time-bucket if a single key's history exceeds a partition.

Tie semantics: ``backward`` matches right_ts <= left_ts (right rows
sort before left rows at equal ts); among right ties on ts the
largest ``tiebreak`` wins — deterministic output regardless of input
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the columns of the single right row
    with the greatest ``right_ts`` <= ``left_ts`` within the same
    ``on`` key (backward as-of, inclusive). Left rows with no match
    keep NULL right columns (left-outer semantics).

    ``right_cols`` limits the attached payload (default: all right
    columns except the key). Attached columns are suffixed with
    ``suffix`` when they collide with a left column name.
    ``tiebreak`` orders right rows sharing the same timestamp (last
    one wins); omit if timestamps are unique per key.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    payload = F.struct(*[F.col(c) for c in right_cols]).alias("_payload")
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        payload,
    )
    l = left.select(
        F.struct(*left.columns).alias("_row"),
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    r = r.withColumn("_row", F.lit(None).cast(l.schema["_row"].dataType))

    # right (_side=0) sorts before left (_side=1) at equal _ts →
    # backward-inclusive; among right ties, max _tb is "last", wins.
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"_match.{c}").alias(out_names[c])
            for c in right_cols
        ],
    )
