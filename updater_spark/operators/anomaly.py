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


def cusum(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    slack_k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Per-key CUSUM change-point detection (Page 1954) — the
    complement of ``rolling_zscore``: the z-score flags single
    outliers; CUSUM accumulates many SMALL shifts in the same
    direction until the cumulative drift crosses ``h``, catching a
    level change no single point reveals (the data-drift signal for
    ingest-volume and model-feature monitoring).

    The textbook recurrence
    ``s⁺_t = max(0, s⁺_{t−1} + z_t − k)`` is not a window aggregate —
    but it has the classic CLOSED FORM over prefix sums:
    ``s⁺_t = p_t − min(0, min_{i≤t} p_i)`` with ``p_t = Σ(z_i − k)``
    (reset-at-zero == subtracting the running minimum). So the whole
    detector is TWO cumulative window aggregates per side — pure
    codegen, one shuffle on the key, no recursion, no UDF — and stays
    exactly SQL-expressible for the oracle.

    ``z`` standardizes against the key's WHOLE-series mean/std (the
    offline-CUSUM convention: the in-control target; for a drifting
    target compose with ``rolling_zscore``'s frame instead).
    ``slack_k`` is the per-step allowance (0.5 = flag sustained
    drifts beyond half a standard deviation); ``h`` the alarm
    threshold in std units. Keys with a flat series (std = 0) carry
    NULL scores — no in-control scale exists.

    Adds ``cusum_pos``, ``cusum_neg``, ``cusum_alarm``."""
    if h <= 0:
        raise ValueError("h must be > 0")
    stats = df.groupBy(F.col(key_col).alias("_sk")).agg(
        F.avg(F.col(value_col)).alias("_mu"),
        F.stddev_samp(F.col(value_col)).alias("_sd"),
    )
    joined = df.join(
        stats, F.col(key_col) == F.col("_sk"), "left"
    ).drop("_sk")
    z = F.when(
        F.col("_sd") > 0,
        (F.col(value_col) - F.col("_mu")) / F.col("_sd"),
    )
    order = [F.col(time_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    k = F.lit(float(slack_k))
    p = F.sum(z - k).over(w)
    q = F.sum(-z - k).over(w)
    s_pos = p - F.least(F.lit(0.0), F.min(p).over(w))
    s_neg = q - F.least(F.lit(0.0), F.min(q).over(w))
    return (
        joined.withColumn("cusum_pos", s_pos)
        .withColumn("cusum_neg", s_neg)
        .withColumn(
            "cusum_alarm",
            F.when(
                F.col("cusum_pos").isNotNull(),
                (F.col("cusum_pos") > F.lit(float(h)))
                | (F.col("cusum_neg") > F.lit(float(h))),
            ),
        )
        .drop("_mu", "_sd")
    )


def mad_outliers(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    threshold: float = 3.0,
    round_digits: int = 4,
) -> DataFrame:
    """Robust per-key outlier detection by Median Absolute Deviation:

        robust_z = 0.6745 * (x - median) / MAD,
        MAD = median(|x - median|)

    (Iglewicz & Hoaglin 1993's modified z-score; 0.6745 makes it
    consistent with sigma under normality). The rolling_zscore above
    uses mean/stddev, which the outliers themselves inflate — one
    large spike can mask every other spike in its key. Medians don't
    move, so MAD flags all of them; the standard robust screen for
    value columns in event/metrics pipelines.

    Scale shape: two grouped EXACT medians (Catalyst ``percentile`` —
    a per-key sort-based aggregate, partial-combining, shuffled by
    key) and one join back by key — no window over the raw stream,
    no driver collect. Keys whose MAD is 0 (over half the values
    identical) get a NULL robust_z rather than a division blow-up:
    any deviation from a constant majority is "infinitely" anomalous,
    so ``is_outlier`` flags any value != median there while robust_z
    stays NULL (the MySQL /0->NULL stance).

    Returns (id, key, value, robust_z, is_outlier) with robust_z
    rounded (cross-engine float tolerance)."""
    med = df.groupBy(key_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    with_med = df.join(med, key_col)
    mad = with_med.groupBy(key_col).agg(
        F.percentile(
            F.abs(F.col(value_col) - F.col("_med")), F.lit(0.5)
        ).alias("_mad")
    )
    rz = F.when(
        F.col("_mad") > 0,
        F.round(
            F.lit(0.6745)
            * (F.col(value_col) - F.col("_med"))
            / F.col("_mad"),
            round_digits,
        ),
    )
    return (
        with_med.join(mad, key_col)
        .select(
            F.col(id_col),
            F.col(key_col),
            F.col(value_col),
            rz.alias("robust_z"),
            F.when(
                F.col("_mad") > 0,
                (F.abs(rz) > F.lit(threshold)).cast("int"),
            )
            .otherwise(
                (F.col(value_col) != F.col("_med")).cast("int")
            )
            .alias("is_outlier"),
        )
    )


def robust_scale(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    round_digits: int = 4,
) -> DataFrame:
    """Per-key robust normalization: ``(x - median) / IQR`` — the
    RobustScaler preprocessing step (outlier-insensitive feature
    scaling; mean/stddev standardization moves with every spike, the
    median/IQR pair doesn't). The mad_outliers sibling above DETECTS
    outliers; this NORMALIZES values for downstream models in their
    presence.

    Scale shape: one grouped aggregate computing the three exact
    quantiles (p25/p50/p75 via Catalyst ``percentile`` — one per-key
    sort-based agg, partial-combining) and one join back on the key.
    Keys with IQR 0 (over half the values tied) carry NULL scaled
    values — no scale exists (the MySQL /0->NULL stance).

    Returns (id, key, value, scaled) with scaled rounded."""
    q = df.groupBy(key_col).agg(
        F.percentile(value_col, F.lit(0.25)).alias("_q1"),
        F.percentile(value_col, F.lit(0.5)).alias("_med"),
        F.percentile(value_col, F.lit(0.75)).alias("_q3"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    scaled = F.when(
        iqr > 0,
        F.round(
            (F.col(value_col) - F.col("_med")) / iqr, round_digits
        ),
    )
    return df.join(q, key_col).select(
        F.col(id_col),
        F.col(key_col),
        F.col(value_col),
        scaled.alias("scaled"),
    )
