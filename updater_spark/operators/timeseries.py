"""Time-series densification: forward-fill and bucket gap-fill — the
hypertable signature pair (TimescaleDB's ``time_bucket_gapfill`` +
``locf``, InfluxDB's ``fill(previous)``). Telemetry pipelines need a
DENSE per-key grid before windowed models or charting; raw event
tables are sparse exactly where the interesting silence is (a sensor
that stopped reporting is invisible in a groupBy of what it sent).

Spark-first shapes:

- ``forward_fill``: ``last(value, ignorenulls=True)`` over an
  unbounded-preceding per-key window — ONE shuffle on the key, no
  UDF, no iteration; whole-stage codegen end to end.
- ``gapfill``: aggregate per (key, bucket), derive each key's
  [first, last] bucket span in the same aggregate pass, explode a
  ``sequence(first, last, interval)`` to the dense grid, left-join
  the sparse aggregates back (co-partitioned on the key), then
  forward-fill. The grid explosion is bounded by span/step per key —
  the honest cost of densification; a key silent for a year at 1s
  buckets makes 31M rows, so the bucket width is a REQUIRED argument,
  never defaulted.

Both are exactly SQL-expressible (DuckDB window frames support
``IGNORE NULLS``; ``generate_series`` builds the grid), so the
oracles are literal translations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_FILLS = {"ffill", "null", "zero"}
_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": lambda c: F.count(c),
    "last": None,  # handled via max_by on time
}


def forward_fill(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_cols: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Replace NULLs in ``value_cols`` with the key's most recent
    non-NULL value (ordered by ``time_col`` then ``order_cols`` —
    pass a unique tiebreaker when stamps can collide). Leading NULLs
    (no prior observation) stay NULL — no value is invented."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    order = [F.col(time_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(
            c, F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out


def gapfill(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    bucket: str,
    agg: str = "avg",
    fill: str = "ffill",
) -> DataFrame:
    """Dense per-key time grid: bucket ``time_col`` by the INTERVAL
    literal ``bucket`` (e.g. ``'1 day'``, ``'15 minutes'``),
    aggregate ``value_col`` per (key, bucket) with ``agg`` (avg | sum
    | min | max | count | last — last = value at the max time in the
    bucket), then emit EVERY bucket between each key's first and last
    active bucket, filling silent buckets per ``fill``:

    - ``ffill`` — carry the previous bucket's aggregate forward
      (LOCF); ``gap_filled`` marks synthesized rows
    - ``null`` — keep the gap visible as NULL
    - ``zero`` — 0.0 (the counting convention)

    Buckets are epoch-aligned: ``floor(epoch / step) * step``, the
    time_bucket convention (calendar months are NOT supported — use
    a calendar truncation + cohort-style indexing for that)."""
    if fill not in _FILLS:
        raise ValueError(f"fill must be one of {sorted(_FILLS)}")
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")
    low = bucket.lower()
    if "month" in low or "year" in low:
        # calendar intervals don't have a fixed second width: the
        # epoch-aligned bucketing and the sequence() grid would
        # disagree (a silent misalignment, not an error) — refuse
        raise ValueError(
            "calendar buckets (month/year) are not supported — "
            "time_bucket is epoch-aligned; use date_trunc + "
            "cohort-style indexing for calendar periods"
        )
    step = F.expr(f"INTERVAL {bucket}")
    step_secs = F.unix_timestamp(
        F.lit("1970-01-01 00:00:00").cast("timestamp") + step
    )
    ts = F.col(time_col)
    bucketed = F.timestamp_seconds(
        (F.unix_timestamp(ts) / step_secs).cast("long") * step_secs
    )
    if agg == "last":
        val = F.expr(f"max_by({value_col}, {time_col})")
    else:
        val = _AGGS[agg](F.col(value_col))
    sparse = (
        df.select(
            F.col(key_col).alias("_k"), bucketed.alias("_b"), value_col,
            time_col,
        )
        .groupBy("_k", "_b")
        .agg(val.cast("double").alias("_v"))
    )
    spans = sparse.groupBy("_k").agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    grid = spans.select(
        "_k",
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), step)
        ).alias("_b"),
    )
    dense = grid.join(sparse, ["_k", "_b"], "left").withColumn(
        "gap_filled", F.col("_v").isNull()
    )
    if fill == "ffill":
        w = (
            Window.partitionBy("_k")
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        dense = dense.withColumn(
            "_v", F.last(F.col("_v"), ignorenulls=True).over(w)
        )
    elif fill == "zero":
        dense = dense.withColumn("_v", F.coalesce("_v", F.lit(0.0)))
    return dense.select(
        F.col("_k").alias(key_col),
        F.col("_b").alias("bucket"),
        F.col("_v").alias(f"{agg}_{value_col}"),
        "gap_filled",
    )


def ewma(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    alpha: float,
    order_cols: list[str] | None = None,
    out_col: str = "ewma",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-key exponentially weighted moving average,
    ``y_t = α·x_t + (1−α)·y_{t−1}`` with ``y_0 = x_0`` (pandas
    ``ewm(adjust=False)``) — the standard smoother for noisy
    telemetry before thresholding (EWMA control charts, Roberts
    1959; the memory-decay complement of ``gapfill``'s LOCF).

    The recurrence is inherently sequential per key, and the
    prefix-product closed form ``y_t = α Σ (1−α)^{t−i} x_i``
    OVERFLOWS as (1−α)^{−i} past a few thousand points — so this is
    an Arrow ``applyInPandas`` per key (the sanctioned vectorized
    escape hatch, never row-at-a-time Python), computing pandas'
    C-implemented ``ewm`` over the key's (time, tiebreak)-sorted
    rows. Memory bound: each key's history buffers in one task —
    the same per-key bound as any window sort here; a mega-key needs
    time-bucket pre-splitting (operators/skew.py) with seeded
    carry-over.

    NULL values propagate NULL for their own row and are SKIPPED by
    the decay (pandas ``ignore_na=False`` semantics kept: decay
    still advances over the gap).

    ``num_partitions``: the grouped-Python stage is CPU-bound in the
    worker (per-group pandas dispatch), but AQE sizes the exchange
    by BYTES and coalesces the byte-light key shuffle down to a few
    partitions — measured 2 tasks on 32 cores at sf0.1 (3.1 s; 1.1 s
    with the explicit repartition, identical rows). The default
    derives from the cluster (2×defaultParallelism — scale-adaptive,
    not a local constant); the explicit repartition SATISFIES the
    applyInPandas clustered-distribution requirement, so the plan
    still carries exactly one exchange (pinned by
    tests/test_timeseries_part.py). Pass an int to override, or
    ``0`` to keep the AQE-sized behavior."""
    if not 0 < alpha <= 1:
        raise ValueError("alpha must be in (0, 1]")

    import pandas as pd  # noqa: F401 (schema-time check of the dep)

    order = [time_col] + list(order_cols or [])
    out_fields = df.schema.fields

    def _smooth(pdf):
        pdf = pdf.sort_values(order)
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields]
        + [f"`{out_col}` double"]
    )
    n_parts = num_partitions
    if n_parts is None:
        n_parts = 2 * df.sparkSession.sparkContext.defaultParallelism
    if n_parts:
        df = df.repartition(n_parts, key_col)
    return df.groupBy(key_col).applyInPandas(_smooth, schema=schema)


def ohlc_bars(
    df: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "hour",
    round_digits: int = 4,
) -> DataFrame:
    """Open/high/low/close downsampling per (key, time bucket) — the
    hypertable "candlestick" rollup (TimescaleDB ``ohlc``/``first``/
    ``last`` aggregates): one bar per key per bucket summarizing the
    first, extreme, and last observed values. The generic
    first-and-last-in-window primitive — attribution (first/last
    touch), sensor snapshots, price bars — not just finance.

    Determinism: "first"/"last" are defined by (time, id) lexicographic
    order, so duplicate timestamps cannot make the bar depend on scan
    order (the rolling_zscore tiebreaker discipline).

    Scale shape: ONE exchange on (key, bucket); the two row_number
    windows (ascending and descending) reuse it with two in-partition
    sorts, and the final aggregate partial-combines on the already-
    partitioned data. No self-join, no collect."""
    b = F.date_trunc(bucket, F.col(time_col)).alias("bucket")
    staged = df.select(
        F.col(key_col), b, F.col(time_col), F.col(id_col), F.col(value_col)
    )
    wa = Window.partitionBy(key_col, "bucket").orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    wd = Window.partitionBy(key_col, "bucket").orderBy(
        F.col(time_col).desc(), F.col(id_col).desc()
    )
    v = F.col(value_col)
    return (
        staged.withColumn("_ra", F.row_number().over(wa))
        .withColumn("_rd", F.row_number().over(wd))
        .groupBy(key_col, "bucket")
        .agg(
            F.round(F.max(F.when(F.col("_ra") == 1, v)), round_digits).alias(
                "open"
            ),
            F.round(F.max(v), round_digits).alias("high"),
            F.round(F.min(v), round_digits).alias("low"),
            F.round(F.max(F.when(F.col("_rd") == 1, v)), round_digits).alias(
                "close"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
