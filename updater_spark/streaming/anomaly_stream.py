"""Streaming rolling z-score: the live twin of
operators/anomaly.py::rolling_zscore. The batch operator scores a
finished table; this scores events AS THEY ARRIVE — the shape every
telemetry monitor needs — keeping per-key state equal to the last
``window`` observations, nothing else.

Built-in streaming aggregations can't express "mean/std of the
PREVIOUS N points of this key" (sliding event-count frames don't
exist in streaming), so this is ``applyInPandasWithState`` — the
sanctioned escape hatch (Arrow-batched, never row-at-a-time).

State contract (the part that matters at 100 TB): ONE fixed-size
float buffer per key — ``window`` values, explicitly trimmed every
batch — so state bytes = |active keys| × window × 8, independent of
stream length (the semantic_stream.py lesson: unbounded streaming
state is the real scale-killer, and the bound must be designed in,
not hoped for).

Ordering contract (MEASURED, pinned in tests/test_anomaly_stream.py):
rows are scored in (ts, id) order WITHIN each micro-batch, and state
carries across batches in arrival order — so when drops arrive in
event-time order the output EQUALS the batch operator on the same
data (the test's oracle); out-of-order arrivals are scored against
the baseline as-of arrival (the honest streaming answer — a late
point cannot rewrite history already emitted). No watermark is
needed: the buffer never grows with lateness.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("roll_mean", DoubleType()),
        StructField("roll_std", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("buf", ArrayType(DoubleType()))]
)


def _make_scorer(window: int, min_periods: int, threshold: float):
    def _score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (buf,) = state.get if state.exists else ([],)
        buf = list(buf)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                n = len(buf)
                if n >= min_periods:
                    m = sum(buf) / n
                    var = sum((x - m) ** 2 for x in buf) / (n - 1)
                    s = math.sqrt(var)
                    if s > 0:
                        z = (float(v) - m) / s
                        row = (key[0], int(eid), m, s, z,
                               abs(z) >= threshold)
                    else:
                        row = (key[0], int(eid), m, s, None,
                               float(v) != m)
                else:
                    row = (key[0], int(eid), None, None, None, None)
                out.append(row)
                buf.append(float(v))
                if len(buf) > window:
                    buf = buf[-window:]
        state.update((buf,))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "event_id", "roll_mean", "roll_std",
                    "zscore", "is_anomaly",
                ],
            )

    return _score


def streaming_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 20,
    min_periods: int = 5,
    threshold: float = 3.0,
) -> DataFrame:
    """Score a (streaming or batch-test) DataFrame of events; returns
    (user_id, event_id, roll_mean, roll_std, zscore, is_anomaly) with
    the batch operator's NULL conventions (warm-up rows NULL verdict,
    flat baseline flags departures without a z)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if min_periods < 2:
        raise ValueError("min_periods must be >= 2")
    keyed = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(time_col).alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_scorer(window, min_periods, threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("cusum_pos", DoubleType()),
        StructField("cusum_neg", DoubleType()),
        StructField("cusum_alarm", BooleanType()),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("sp", DoubleType()),
        StructField("sn", DoubleType()),
    ]
)


def _make_cusum(
    mu: float, sd: float, slack_k: float, h: float
):
    def _score(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sp, sn = state.get if state.exists else (0.0, 0.0)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                z = (float(v) - mu) / sd
                sp = max(0.0, sp + z - slack_k)
                sn = max(0.0, sn - z - slack_k)
                out.append(
                    (key[0], int(eid), sp, sn, sp > h or sn > h)
                )
        state.update((sp, sn))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "event_id", "cusum_pos", "cusum_neg",
                    "cusum_alarm",
                ],
            )

    return _score


def streaming_cusum(
    events: DataFrame,
    target_mean: float,
    target_std: float,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    slack_k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Online CUSUM (the form Page 1954 actually describes: a KNOWN
    in-control target (mean, std) — estimated offline, e.g. from
    last week's batch — and the recursion run live). This is the
    MINIMAL stateful streaming operator: per-key state is exactly
    TWO floats (s⁺, s⁻) — no buffer at all, the strongest possible
    state bound — because the fixed target removes the need for any
    history. Complements streaming_zscore (which buffers ``window``
    points to estimate a LOCAL baseline); use CUSUM when the
    in-control distribution is known and stable, zscore when it must
    track the key's own recent behavior.

    Semantics equal the batch ``operators/anomaly.py::cusum`` run
    with the same (mean, std) target when drops arrive in event-time
    order — the same measured ordering contract as
    streaming_zscore."""
    if target_std <= 0:
        raise ValueError("target_std must be > 0")
    if h <= 0:
        raise ValueError("h must be > 0")
    keyed = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(time_col).alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_cusum(
            float(target_mean), float(target_std), float(slack_k),
            float(h),
        ),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
