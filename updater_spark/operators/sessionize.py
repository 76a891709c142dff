"""Sessionization: group event streams into activity sessions split at
inactivity gaps.

Batch form: two window functions (lag → gap flag → running sum) and a
groupBy — the classic gaps-and-islands plan. One shuffle on user_id,
both window functions share the same partitioning/ordering so Catalyst
runs them in a single Window operator; the session groupBy reuses the
user_id shuffle.

Streaming form: ``session_window`` (built-in session windows with
watermark) — or ``applyInPandasWithState`` when per-session logic
outgrows an aggregate. Offered via ``sessionize_stream``.

Timestamps compare as exact epoch microseconds (``unix_micros``):
integer arithmetic, no float-time skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user sessions: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Deterministic ordering tie-
    break on ``id_col``.

    Returns (user_id, session_idx, session_start_us, session_end_us,
    n_events, sum_value_e6)."""
    gap_us = gap_minutes * 60 * 1_000_000
    # cast("timestamp") is a no-op on LTZ and makes TIMESTAMP_NTZ
    # inputs (Spark 4's reading of tz-less parquet) acceptable to
    # unix_micros; deterministic when session tz is pinned (demo.py)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc())
    flagged = events.select(
        F.col(user_col),
        us.alias("_us"),
        F.col(id_col).alias("_eid"),
        F.col(value_col).alias("_val"),
    ).withColumn(
        "_new_session",
        F.when(
            F.lag("_us").over(
                Window.partitionBy(user_col).orderBy(
                    F.col("_us").asc(), F.col("_eid").asc()
                )
            ).isNull()
            | (
                F.col("_us")
                - F.lag("_us").over(
                    Window.partitionBy(user_col).orderBy(
                        F.col("_us").asc(), F.col("_eid").asc()
                    )
                )
                > gap_us
            ),
            1,
        ).otherwise(0),
    )
    with_idx = flagged.withColumn(
        "session_idx",
        F.sum("_new_session").over(
            Window.partitionBy(user_col)
            .orderBy(F.col("_us").asc(), F.col("_eid").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return with_idx.groupBy(user_col, "session_idx").agg(
        F.min("_us").alias("session_start_us"),
        F.max("_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("_val") * F.lit(1_000_000)).cast("long")).alias(
            "sum_value_e6"
        ),
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessions via the built-in ``session_window`` — state
    merges windows whose gaps are below the threshold; the watermark
    bounds state and late data."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("sw.start").cast("string").alias("session_start"),
            F.col("sw.end").cast("string").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
