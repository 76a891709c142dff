"""Custom stateful streaming operator: online SEMANTIC first-seen.

The embedding twin of ``dedup_stream``'s fingerprint first-seen: a
training-data ingest stream admits a vector iff no EARLIER vector of
the same centroid cell was within ``threshold`` cosine — paraphrase
admission control at ingest time, where the batch operators
(``semantic_dedup``, ``SemanticIndex``) run after the fact. Built-in
``dropDuplicates`` can't express "near", and the batch pair-join
can't see a stream; this is ``applyInPandasWithState`` — per-cell
state object, explicit timeout control (the escape hatch the guide
reserves for stateful logic built-ins can't express).

Keying and state: groups are CENTROID CELLS (assignment is the same
argmax-dot, ties to the lowest cell, computed per micro-batch in the
JVM via Catalyst dots — the codebook is a literal expression tree, so
this path shares ``ivf_assign``'s ~1k-cell practical bound; larger
codebooks belong to the batch arrow path). State per cell holds the
ids + unit vectors of every vector seen so far in that cell —
bounded by cell size, the same occupancy ``max_cell``/telemetry
watches in batch, and ``GroupStateTimeout`` can bound the horizon
where the dedup window is finite.

Determinism contract (what the exact oracle checks): vectors are
processed in ``vec_id`` order — sorted within each micro-batch, and
the fixture feeds id-ranged file drops in order (the
``rollup_stream`` discipline) — so ``dup_of`` is exactly
``min {u < v : cell(u) = cell(v), round(cos(u, v), d) >= t}`` and
``is_new`` marks chain-first vectors, independent of micro-batch
slicing (tests/test_semantic_stream.py re-slices to prove it).
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
        StructField("vec_id", LongType()),
        StructField("cell", LongType()),
        StructField("dup_of", LongType()),
        StructField("is_new", BooleanType()),
    ]
)

# ids + row-flattened unit vectors of everything seen in the cell
STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("flat", ArrayType(DoubleType())),
        StructField("dim", LongType()),
    ]
)


def _make_scorer(threshold: float, round_digits: int):
    def score_cell(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            ids_l, flat, dim = state.get
            seen_ids = np.array(ids_l, dtype=np.int64)
            seen = np.array(flat, dtype=np.float64).reshape(-1, int(dim))
        else:
            seen_ids = np.empty(0, dtype=np.int64)
            seen = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("vec_id")
            vm = np.array(pdf["u"].tolist(), dtype=np.float64)
            vids = pdf["vec_id"].to_numpy()
            if seen is None:
                seen = np.empty((0, vm.shape[1]), dtype=np.float64)
            # "any EARLIER vector" has no sequential dependency — the
            # comparison set of row j is (all state rows) ∪ (batch
            # rows i < j), duplicates included — so the whole batch
            # scores as two GEMMs instead of a per-row loop
            big = np.full(len(vids), np.iinfo(np.int64).max)
            if len(seen):
                hit_s = np.round(seen @ vm.T, round_digits) >= threshold
                any_s = hit_s.any(axis=0)
                if any_s.any():
                    masked = np.where(
                        hit_s, seen_ids[:, None], np.iinfo(np.int64).max
                    )
                    big = masked.min(axis=0)
            in_sims = np.round(vm @ vm.T, round_digits) >= threshold
            # strict lower triangle: row i earlier than column j
            in_sims &= np.tri(len(vids), k=-1, dtype=bool).T
            if in_sims.any():
                masked_b = np.where(
                    in_sims, vids[:, None], np.iinfo(np.int64).max
                )
                big = np.minimum(big, masked_b.min(axis=0))
            is_new = big == np.iinfo(np.int64).max
            yield pd.DataFrame(
                {
                    "vec_id": vids,
                    "cell": int(key[0]),
                    "dup_of": pd.array(
                        [None if n else int(b) for n, b in zip(is_new, big)],
                        dtype="Int64",
                    ),
                    "is_new": is_new,
                }
            )
            seen = np.vstack([seen, vm])
            seen_ids = np.append(seen_ids, vids)
        if seen is not None and len(seen):
            state.update(
                (
                    [int(x) for x in seen_ids],
                    [float(x) for x in seen.ravel()],
                    int(seen.shape[1]),
                )
            )

    return score_cell


def semantic_first_seen(
    stream: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    round_digits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming transform: assign each incoming vector to its cell
    (Catalyst dots over unit-normalized centroids — JVM-side, no
    Python in the assignment), then run the per-cell stateful scorer.
    Returns the transformed streaming DataFrame; caller attaches the
    sink/trigger/checkpoint."""
    from updater_spark.operators.similarity import as_double, dot, unit

    cents = []
    for c in centroids:
        nrm = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        cents.append([float(x) / nrm for x in c])
    u = stream.select(
        F.col(id_col).alias("vec_id"),
        unit(as_double(F.col(vec_col))).alias("u"),
    )
    dots = [dot(F.col("u"), F.array(*[F.lit(x) for x in c])) for c in cents]
    arr = F.array(*dots)
    assigned = u.withColumn(
        "cell", (F.array_position(arr, F.array_max(arr)) - 1).cast("long")
    )
    return assigned.groupBy("cell").applyInPandasWithState(
        _make_scorer(threshold, round_digits),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_semantic_stream(
    spark,
    src_path: str,
    src_schema,
    centroids: list[list[float]],
    out_path: str,
    checkpoint: str,
    threshold: float = 0.9,
    round_digits: int = 4,
    max_files_per_trigger: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """File-source driver: drain ``src_path`` drops AvailableNow
    through ``semantic_first_seen`` into a parquet sink. Per-cell
    state persists in the checkpoint across micro-batches and
    restarts — re-running after new drops resumes, it does not
    re-admit."""
    stream = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_path)
    )
    out = semantic_first_seen(
        stream,
        centroids,
        threshold=threshold,
        round_digits=round_digits,
        id_col=id_col,
        vec_col=vec_col,
    )
    return (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
