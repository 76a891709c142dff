"""Stream-stream event-time interval join: two live streams matched
on a key within a time window, with watermark-bounded state.

Why this exists: the reference engine is batch-only (cheeseformice/
updater ``src/`` re-reads full snapshots each cycle); its closest
shape is the snapshot diff join (J1). Real event pipelines also need
the STREAMING twin — requests matched to the responses that follow
within a window (click↔conversion, query↔result, span↔parent) while
both sides are still arriving. Structured Streaming's symmetric hash
join is exactly this operator; what this module adds is the pinned
contract (projection discipline, watermark math, drain fixture) that
makes it exactly reproducible against a batch SQL oracle.

Spark shape and the 100 TB math:

- Both sides ``withWatermark`` on their event-time column, inner join
  on ``key`` equality AND ``right_ts ∈ [left_ts, left_ts + window]``.
  The range condition is what lets Spark BOUND the join state: a left
  row is dropped once the watermark passes ``left_ts + window``, a
  right row once it passes ``right_ts`` — so steady-state state is
  O(arrival_rate × (watermark_delay + window)) per side, independent
  of stream length. Without the range condition the same join keeps
  every row forever; that unbounded variant is exactly what this
  module exists to avoid (the ``semantic_first_seen`` lesson, r5).
- Execution is StreamingSymmetricHashJoin: both sides shuffle on the
  key (HashClusteredDistribution), state lives in the per-partition
  state store — scale-out is by key partitions, a hot key is the same
  skew problem (and salting answer) as any batch join.
- Lateness semantics (pinned by tests/test_join_stream.py, measured
  on Spark 4.1): for INNER stream-stream joins the watermark bounds
  STATE EVICTION, not input admission — state cleanup runs at each
  micro-batch END against the batch-start watermark, so a formally
  late row can still match state that hasn't been evicted yet, and a
  row arriving after the other side's eviction horizon
  (watermark > left_ts + window) deterministically cannot match.
  Exactness trade: the drain fixture feeds time-ordered drops with a
  delay ≥ the max cross-drop disorder, so stream == batch exactly
  (tests re-slice to prove it); beyond the delay, pairs are lost
  through eviction — deterministically, not racily.

Reference parity note: J1 diff semantics live in operators/diff.py;
this is the extension-surface streaming join, cited against Spark's
public stream-stream join semantics (SPARK-19791 et seq.).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

__all__ = ["stream_interval_join", "run_stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    watermark_delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) frames on ``key`` with
    ``right_ts`` in ``[left_ts, left_ts + window_seconds]``.

    Both frames must already be projected to disjoint column names
    apart from ``key`` (the fixture discipline: rename at the edge,
    never after the join). On streaming inputs both sides get the
    same ``watermark_delay``; on batch inputs ``withWatermark`` is a
    no-op and the SAME code path yields the oracle join — one
    definition, two execution modes.

    ``how="left_outer"`` adds the unmatched-left rows (null right
    columns). Streaming semantics caveat that the fixture must own: a
    null-match can only be emitted once the watermark proves no
    future right row can still match — i.e. passes
    ``left_ts + window + delay`` — so a drained stream emits null
    rows ONLY for lefts whose horizon closed. A finite drain needs a
    terminal FLUSH row on both sides (far-future ts, non-matching
    key, filtered from output) to push the watermark past every real
    left row; q_streaming_join_outer shows the discipline."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    lw = (
        left.withWatermark(left_ts, watermark_delay)
        if left.isStreaming
        else left
    )
    rw = (
        right.withWatermark(right_ts, watermark_delay)
        if right.isStreaming
        else right
    )
    cond = (
        (lw[key] == rw[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {window_seconds} SECONDS")
        )
    )
    return lw.join(rw, cond, how).drop(rw[key])


def run_stream_interval_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    schema: StructType,
    prepare_left: Callable[[DataFrame], DataFrame],
    prepare_right: Callable[[DataFrame], DataFrame],
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "1 hour",
    max_files_per_trigger: int = 1,
    how: str = "inner",
) -> StreamingQuery:
    """Drive the join over two file-source streams, appending matched
    pairs to ``out_dir`` parquet; AvailableNow, so a drain processes
    every dropped file then stops. Restart-safe: the checkpoint owns
    source offsets AND join state, so a second drain after more drops
    resumes mid-stream (tests/test_join_stream.py pins it)."""

    def _src(d: str) -> DataFrame:
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(d)
        )

    joined = stream_interval_join(
        prepare_left(_src(left_dir)),
        prepare_right(_src(right_dir)),
        key,
        left_ts,
        right_ts,
        window_seconds,
        watermark_delay,
        how,
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def drain(q: StreamingQuery) -> None:
    q.awaitTermination()
    if q.exception() is not None:  # pragma: no cover - surfaced loudly
        raise q.exception()


def read_pairs(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the appended join output; empty-dir safe (no files yet →
    empty frame is an error the caller should see, so just read)."""
    if not os.path.isdir(out_dir):
        raise FileNotFoundError(out_dir)
    return spark.read.parquet(out_dir)
