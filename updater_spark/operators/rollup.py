"""Hypertable-style time-bucket rollups: continuous aggregates kept
incrementally, coarsened resolution-to-resolution.

The reference's derived tables (tribe_active/tribe_stats,
post_update.py:19-91) are rebuilt from scratch each run; a
time-series workload instead maintains bucketed aggregates
*incrementally* (the TimescaleDB "continuous aggregate" /
materialized-rollup pattern). Three pieces, all plain DataFrame ops:

- ``bucket_rollup``: raw events → per-(bucket, keys) mergeable
  partial state (count / integerized sum / min / max). Integerized
  sums keep the state exactly mergeable and order-insensitive.
- ``rollup_merge``: existing state ⊎ new batch's state — the
  incremental step for append-only streams (union + re-agg; every
  component is associative+commutative, so merging a day's worth of
  micro-batches equals aggregating the raw day). Run it inside
  ``foreachBatch`` against the stored rollup.
- ``rollup_coarsen``: hourly → daily (any truncation pair) computed
  FROM THE HOURLY STATE, never re-reading raw data — the multi-
  resolution pyramid (hour→day→month) costs |hourly| not |events|.

Scale shape: everything is groupBy on (bucket, keys) — partial-agg
(map-side combine) means each shuffle carries one row per group per
input partition; the merge's union adds no shuffle of its own.
Append-only semantics: updates/deletes of historical events are out
of scope (re-bucket and rebuild the affected range instead — the
partition-pruned write path in plans/cdc.py is the template).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bucket_rollup", "rollup_merge", "rollup_coarsen"]

STATE_COLS = ("n", "sum_e6", "vmin_e6", "vmax_e6")


def bucket_rollup(
    events: DataFrame,
    ts_col: str,
    value_col: str,
    keys: list[str],
    bucket: str = "hour",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Aggregate raw events into per-(time bucket, keys) mergeable
    state. ``bucket`` is a ``date_trunc`` unit (hour/day/week/...).
    The value is integerized (floor(v·1e6)) so sums are exact and
    engine-portable."""
    v = F.floor(F.col(value_col) * 1_000_000).cast("long")
    return (
        events.withColumn(bucket_col, F.date_trunc(bucket, F.col(ts_col)))
        .groupBy(bucket_col, *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).alias("sum_e6"),
            F.min(v).alias("vmin_e6"),
            F.max(v).alias("vmax_e6"),
        )
    )


def _remerge(df: DataFrame, group_cols: list[str]) -> DataFrame:
    return df.groupBy(*group_cols).agg(
        F.sum("n").alias("n"),
        F.sum("sum_e6").alias("sum_e6"),
        F.min("vmin_e6").alias("vmin_e6"),
        F.max("vmax_e6").alias("vmax_e6"),
    )


def rollup_merge(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Fold a new batch's rollup state into the stored state: buckets
    touched by both merge component-wise, others pass through. Exact:
    merge(rollup(A), rollup(B)) ≡ rollup(A ∪ B) for append-only
    events (every component is associative and commutative)."""
    return _remerge(existing.unionByName(delta), [bucket_col, *keys])


def rollup_coarsen(
    fine: DataFrame,
    keys: list[str],
    bucket: str = "day",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Derive a coarser-resolution rollup from a finer one (hour →
    day, day → month, ...) without touching raw events: truncate the
    fine bucket timestamp and re-merge the states."""
    return _remerge(
        fine.withColumn(bucket_col, F.date_trunc(bucket, F.col(bucket_col))),
        [bucket_col, *keys],
    )
