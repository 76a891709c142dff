"""Incremental maintenance of a materialized JOIN view: keep
``V = A ⋈ B`` (equi-join) current under CDC epochs on either base
table, rewriting only the hash buckets the epoch touched.

Why: derived.py maintains AGGREGATE views (the reference's
tribe_stats, post_update.py:19-91, kept incrementally); real
pipelines also materialize joins — enriched fact tables, document ×
metadata, player × tribe denormalizations — and the reference's
answer (re-join everything each cycle) is O(|A ⋈ B|) per epoch no
matter how small the change. The standard IVM observation: an epoch
can only change view rows whose JOIN VALUE appeared in the delta on
either side, so recomputing those join-value slices and splicing
them in is exact.

Spark shape (the partitioned-CDC / derived.py bucket-rewrite
pattern, plans/cdc.py:463):

- The view is stored hash-partitioned by ``pmod(xxhash64(join_col),
  buckets)`` — the join value, NOT either side's primary key, so a
  change on EITHER side maps to the same partition set.
- Per epoch: collect the affected join values' BUCKET ids (a tiny
  distinct-collect, like derived.py's touched list), recompute
  ``A' ⋈ B'`` restricted to those buckets (both scans
  bucket-pruned BEFORE the join shuffle), dynamically overwrite
  exactly those partitions, and drop any bucket the rewrite emptied.
- Cost per epoch: O(touched_buckets / buckets) of the view rewritten
  + one delta-sized distinct — scales with the delta's join-value
  spread, not with |A ⋈ B|.

Affected-value discipline (the correctness subtlety): an UPDATE that
MOVES a row's join value from j1 to j2 affects BOTH slices, and a
DELETE affects the OLD value — so the caller must feed pre-image
join values for updated/deleted rows alongside the post-image delta.
CdcEngine already materializes exactly this: ``{t}__delta`` (post
images) and the changelog's pre-images (J5, operators/merge.py) —
with ``changelog_mode="full"`` so DELETE pre-images are archived too
(the updates-only default drops exactly the rows a view must
un-splice); tests/test_joinview_cdc.py pins the end-to-end
composition. Same pre-image feed stats_repair uses for tribe moves
(``member_before``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from updater_spark.sources.store import TableStore

__all__ = [
    "join_view_bootstrap",
    "join_view_repair",
    "affected_join_values",
]

PART_COL = "_jbucket"


def _bucket(col, buckets: int):
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("long")


def _joined(a: DataFrame, b: DataFrame, on: str, buckets: int) -> DataFrame:
    return a.join(b, on).withColumn(PART_COL, _bucket(F.col(on), buckets))


def affected_join_values(
    post_images: DataFrame | None,
    pre_images: DataFrame | None,
    on: str,
) -> DataFrame:
    """Distinct join values an epoch touched on one side: post-image
    values of upserts ∪ pre-image values of updates and deletes
    (value moves and removals affect the OLD slice)."""
    parts = [
        df.select(F.col(on)) for df in (post_images, pre_images) if df is not None
    ]
    if not parts:
        raise ValueError("need post_images and/or pre_images")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def join_view_bootstrap(
    store: TableStore,
    name: str,
    a: DataFrame,
    b: DataFrame,
    on: str,
    buckets: int = 64,
) -> None:
    """Full compute + join-value-bucketed write (first run). The
    repartition aligns write tasks with partitions — without it every
    join task emits a file into every bucket directory (the
    tasks × partitions small-file bomb rollup_stream measured)."""
    store.write_partitioned(
        name, _joined(a, b, on, buckets).repartition(PART_COL), PART_COL
    )


def join_view_repair(
    store: TableStore,
    name: str,
    a_new: DataFrame,
    b_new: DataFrame,
    on: str,
    affected: DataFrame,
    buckets: int = 64,
) -> int:
    """Splice one epoch's changes into the stored view.

    ``a_new`` / ``b_new`` are the POST-epoch base tables (the CDC
    replicas); ``affected`` is the union of both sides'
    ``affected_join_values``. Returns the number of buckets
    rewritten (0 = epoch didn't touch the view)."""
    touched = [
        r[0]
        for r in affected.select(_bucket(F.col(on), buckets).alias("b"))
        .distinct()
        .collect()
    ]
    if not touched:
        return 0
    # bucket-pruned recompute: both base scans drop to the touched
    # buckets BEFORE the join shuffle. isin on a collected list stays
    # a scan-level filter for any realistic bucket count (≤ buckets),
    # unlike broadcasting the raw affected-value set, which is
    # churn-sized and needs the measured-gate treatment. When a base
    # is ALREADY stored partitioned by this view's bucket column (the
    # partitioned-CDC replica layout, plans/cdc.py), filter the
    # partition column itself so the scan is DIRECTORY-pruned, not
    # just row-filtered — at 20M rows that is the difference between
    # a 1.33× and a real crossover (the joinview probe measures it).
    def _pruned(side: DataFrame) -> DataFrame:
        if PART_COL in side.columns:
            return side.filter(F.col(PART_COL).isin(touched)).drop(PART_COL)
        return side.filter(_bucket(F.col(on), buckets).isin(touched))

    va = _pruned(a_new)
    vb = _pruned(b_new)
    fresh = _joined(va, vb, on, buckets).persist()
    try:
        still = {r[0] for r in fresh.select(PART_COL).distinct().collect()}
        emptied = [x for x in touched if x not in still]
        if emptied:
            store.drop_partitions(name, PART_COL, emptied)
        if still:
            store.overwrite_partitions(
                name, fresh.repartition(PART_COL), PART_COL
            )
    finally:
        fresh.unpersist()
    return len(touched)
