"""Deterministic sampling operators for training-data assembly.

A 100 TB pipeline cannot use ``df.sample`` (seeded per-partition RNG:
resharding or recovery changes the sample) — every selection here is a
pure function of (row id, salt), so samples are reproducible across
reruns, repartitioning, and engines, and composable with the split /
packing operators (operators/packing.py).

- ``hash_sample``: keep a fraction of rows by md5-prefix threshold.
- ``stratified_sample``: per-stratum fractions (e.g. per language or
  per quality band), same mechanism.
- ``mixture_resample``: domain re-weighting by *expected copy count* —
  the up/down-sampling step that turns a raw corpus into a training
  mixture (floor(w) guaranteed copies + one more with probability
  frac(w), decided by the row's own hash). Emits ``copy_idx`` so
  downstream shuffles can decorrelate duplicate copies.

Scale notes: all three are stateless per-row projections (the resample
adds a generate/explode) — they run at scan speed inside whole-stage
codegen, shuffle nothing, and preserve the input partitioning. The
selection hash is 32 bits of md5: collision-free "is this row in the
sample" thresholds down to fractions of ~1e-9, independent per salt.

Reference scope: the reference engine (cheeseformice/updater) has no
sampling — north-star extension per BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "stratified_sample",
    "mixture_resample",
    "hash_unit",
    "deterministic_shuffle",
]

_SCALE = float(1 << 32)


def hash_unit(id_col: str, salt: str) -> F.Column:
    """Uniform [0,1) value from the first 32 bits of md5(id || salt).

    Portable: every engine renders md5 hex identically, and the hex →
    int conversion is exact for 8 hex digits.
    """
    hx = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)).cast("binary")),
        1,
        8,
    )
    return F.conv(hx, 16, 10).cast("double") / F.lit(_SCALE)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Keep each row iff hash_unit(id, salt) < fraction.

    Deterministic Bernoulli sample: membership depends only on the
    row's own id, so it is stable under corpus growth (a kept row is
    kept forever) and disjoint salts give independent samples.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_unit(id_col, salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "strata-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling.

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed keep ``default_fraction``. One scan, no shuffle — the
    per-row threshold is a CASE over the stratum column.
    """
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {v}")
    thr: F.Column = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == F.lit(value), F.lit(float(frac))).otherwise(
            thr
        )
    return df.filter(hash_unit(id_col, salt) < thr)


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
    pos_col: str = "pos",
) -> DataFrame:
    """Global deterministic shuffle: assign every row a contiguous
    0-based position in md5(id || salt) order — the reproducible
    training-order shuffle of an LLM data pipeline (same corpus + salt
    ⇒ same order on any engine, any partitioning, any rerun).

    Scale shape: the naive ``row_number() OVER (ORDER BY h)`` collapses
    the whole table into ONE window partition — a non-starter at
    100 TB. Instead the classic distributed zipWithIndex: (1) range-
    partitioned sort on the hash (split points sampled, every
    partition sorts in parallel), (2) count rows per sorted partition
    (tiny agg — one long per partition reaches the driver), (3) a
    NARROW Arrow pass stamps position = partition offset + running
    local index. One shuffle total (the sort's), no single-reducer
    stage, order preserved because mapInPandas maps partitions
    in-place.
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    sorted_df = (
        df.withColumn("__h", h)
        .sort(F.col("__h"), F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
    )
    # Re-running the range partitioner on fresh samples could move the
    # split points between the count job and the stamping job — pin
    # the sorted result so the counted partitions ARE the stamped ones.
    sorted_df = sorted_df.persist()
    counts = dict(
        sorted_df.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sorted_df.schema
    )

    def stamp(batches):
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            base = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.copy()
            pdf[pos_col] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return (
        sorted_df.mapInPandas(stamp, schema=f"{fields}, {pos_col} long")
        .drop("__h", "__pid")
    )


def mixture_resample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str,
    id_col: str = "doc_id",
    salt: str = "mix-v1",
    default_weight: float = 1.0,
) -> DataFrame:
    """Re-weight domains by expected copy count.

    A row in a domain with weight ``w`` is emitted ``floor(w)`` times,
    plus one more iff hash_unit(id, salt) < w - floor(w) — so the
    expected multiplicity is exactly ``w`` and the realized counts are
    deterministic. ``w < 1`` downsamples, ``w > 1`` upsamples; the
    output carries ``copy_idx`` (0-based) distinguishing the copies.

    This is the standard mixture step of an LLM data pipeline
    (domain-balanced pretraining corpora); expressed as a generate
    (array_repeat + explode) it stays in codegen with no shuffle.
    """
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"weight for {k!r} must be >= 0, got {v}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")
    w: F.Column = F.lit(float(default_weight))
    for value, weight in sorted(weights.items()):
        w = F.when(F.col(domain_col) == F.lit(value), F.lit(float(weight))).otherwise(w)
    base = F.floor(w).cast("int")
    extra = (hash_unit(id_col, salt) < (w - F.floor(w))).cast("int")
    n_copies = (base + extra).alias("n_copies")
    return (
        df.withColumn("__n_copies", n_copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            "copy_idx",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    (F.col("__n_copies") - 1).cast("long"),
                )
            ),
        )
        .drop("__n_copies")
    )
