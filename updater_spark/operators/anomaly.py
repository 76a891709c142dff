"""Rolling-window anomaly detection over per-key event series — the
streaming-telemetry z-score (the textbook statistical process control
rule, Shewhart/3-sigma; the shape every metrics pipeline runs over
ingest volumes, error rates, and latency series). The reference
engine's nearest sibling is its periodic tribe_stats recompute
(/root/reference/src/download.py:607-637) — a batch rollup with no
notion of "this point is off its own recent baseline"; this operator
adds that per-point signal.

Spark-first shape: ONE shuffle (hash partition on the series key for
the window), then pure whole-stage-codegen window aggregates — no
UDFs, no state store, no iteration. The rolling frame is
``rowsBetween(-window, -1)``: strictly PRECEDING rows, so the current
point never contaminates its own baseline (the classic leak that
makes a level shift score z≈0 on arrival).

Scale notes (100 TB): a window partitionBy sorts each key's rows
within one task — fine while no single key's history dwarfs a
partition (telemetry keys: devices, users, shards — millions of keys,
bounded history each). For a pathological mega-key, pre-split the
series by coarse time bucket first (the ``operators/skew.py`` move)
and accept frame truncation at bucket boundaries, or run the
streaming variant over ``session_window``. The frame buffer the
executor holds is ``window`` rows — constant memory per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    window: int = 20,
    min_periods: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Per-key rolling z-score: for each row, compare ``value_col``
    against the mean/stddev of the previous ``window`` values of the
    SAME key (ordered by ``time_col`` then ``order_cols`` — pass a
    unique tiebreaker when timestamps can collide, or the frame
    contents are nondeterministic across runs).

    Adds columns:

    - ``roll_mean`` / ``roll_std`` — the preceding-frame baseline
      (sample stddev; NULL until ``min_periods`` prior points exist)
    - ``zscore`` — (value - roll_mean) / roll_std; NULL during
      warm-up and when the baseline is flat (std = 0 — a constant
      series then any change is flagged via ``is_anomaly`` directly)
    - ``is_anomaly`` — |z| >= threshold, or a value departing a FLAT
      baseline (std = 0 and value != mean); NULL during warm-up
      (no verdict — downstream decides how to treat cold starts).
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if min_periods < 2:
        # stddev_samp needs >= 2 points; below that every z is NULL
        raise ValueError("min_periods must be >= 2")
    order = [F.col(time_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-window, -1)
    )
    n_prev = F.count(F.col(value_col)).over(w)
    mean = F.avg(F.col(value_col)).over(w)
    std = F.stddev_samp(F.col(value_col)).over(w)
    warm = n_prev >= F.lit(min_periods)
    v = F.col(value_col)
    z = F.when(
        warm & (std > 0), (v - mean) / std
    )  # NULL otherwise
    return (
        df.withColumn("_n_prev", n_prev)
        .withColumn("roll_mean", F.when(warm, mean))
        .withColumn("roll_std", F.when(warm, std))
        .withColumn("zscore", z)
        .withColumn(
            "is_anomaly",
            F.when(
                ~warm, F.lit(None).cast("boolean")
            ).when(
                std == 0, v != mean
            ).otherwise(F.abs(z) >= F.lit(float(threshold))),
        )
        .drop("_n_prev")
    )
