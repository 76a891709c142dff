"""Streaming sessionization: Spark's built-in ``session_window``
aggregation with watermark-driven session closing.

The batch twin is operators/sessionize.py (gaps-and-islands over two
window functions); this is the operator you run while events are
still arriving: per-(user, session) aggregates maintained in the
state store, a session emitted EXACTLY ONCE when the watermark
passes its end (append mode) — so downstream consumers see closed
sessions only, never partials.

Boundary contract (MEASURED, pinned by
tests/test_session_stream.py): an event at EXACTLY ``prev + gap``
MERGES into the session — ``session_window`` splits only on
``diff > gap``, the same convention as the batch gaps-and-islands
sessionize (operators/sessionize.py), so the two operators agree on
every dataset. (The window's reported ``end`` is still
``last_ts + gap``, exclusive.)

Scale shape: state is one row per OPEN (user, session) — bounded by
active users × watermark horizon, not stream length; closed sessions
leave state on emission. Session merging across micro-batches (an
event bridging two provisional sessions) is the state store's job —
exactly the semantics a hand-rolled applyInPandasWithState would
have to re-prove.

Finite drains need the flush-row discipline (join_stream.py): append
mode only emits sessions whose end precedes the watermark, so a
far-future sentinel event pushes every real session out before the
drain stops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

__all__ = ["session_aggregate", "run_session_stream"]


def session_aggregate(
    events: DataFrame,
    gap_minutes: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(user, session) aggregate; works on streaming AND batch
    frames (the batch run of the SAME definition is the test oracle).
    Returns (user, session_start_us, session_end_us, n_events,
    sum_e6); end is exclusive: last event + gap.

    ``ts_col`` must ALREADY be a (LTZ) timestamp: casting here would
    produce a new attribute that no longer carries the stream's
    watermark tag, and append-mode session aggregation then refuses
    to plan (run_session_stream casts BEFORE withWatermark)."""
    ts = F.col(ts_col)
    grouped = events.groupBy(
        F.col(user_col),
        F.session_window(ts, f"{gap_minutes} minutes").alias("_sw"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col(value_col) * 1_000_000).cast("long")).alias(
            "sum_e6"
        ),
    )
    return grouped.select(
        F.col(user_col),
        F.unix_micros(F.col("_sw.start")).alias("session_start_us"),
        F.unix_micros(F.col("_sw.end")).alias("session_end_us"),
        "n_events",
        "sum_e6",
    )


def run_session_stream(
    spark: SparkSession,
    src_dir: str,
    schema: StructType,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int,
    watermark_delay: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark_delay)
    )
    out = session_aggregate(src, gap_minutes, user_col, ts_col, value_col)
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
