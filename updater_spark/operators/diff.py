"""Snapshot diff — the heart of the engine (SURVEY.md §2.3 J1).

The reference implements a 180-line streaming symmetric hash diff-join
(/root/reference/src/download.py:113-336): two ``(id, hash)`` streams
(internal replica fingerprints vs. external source fingerprints) are
merged with two dicts, classifying every row as unchanged / changed /
new / deleted, exploiting near-identical row order to keep memory
~O(disorder).

The Spark-first re-expression is ONE full-outer join on the key. A
sort-merge join gives the same memory behavior (sorted runs, no
full-side materialization) automatically, distributes across
executors, and stays entirely in whole-stage codegen. At 100 TB the
join shuffles both sides on the key once — with both fingerprint
tables written bucketed/partitioned by ``id`` the shuffle disappears
entirely (storage-side co-location replaces the reference's
"exploit near-sorted order" trick).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# change_type values
UNCHANGED = "unchanged"
UPDATE = "update"
INSERT = "insert"
DELETE = "delete"


def snapshot_diff(
    source_fp: DataFrame,
    replica_fp: DataFrame,
    key: str = "id",
    hash_col: str = "hashed",
    assume_changed: bool = False,
) -> DataFrame:
    """Classify each key into insert/update/delete/unchanged.

    ``source_fp`` is the external (new) fingerprint set, ``replica_fp``
    the internal (previous) one — mirrors download.py:189-336:
    equal hash → unchanged (dropped downstream), unequal → update,
    source-only → insert, replica-only → delete.

    ``assume_changed=True``: keys present on BOTH sides classify as
    update even when the hashes match. Used for full-churn schema
    boundaries, where the two hash sets were rendered over DIFFERENT
    column bases — equality there is a meaningless coincidence (e.g.
    ``[name]``→'x' vs ``[tier]``→'x' concat identically), and trusting
    it would silently skip a row whose common-column values changed.

    Returns ``(key, change_type, new_hash)``; ``new_hash`` is NULL for
    deletes.
    """
    s = source_fp.select(F.col(key), F.col(hash_col).alias("_src_hash"))
    r = replica_fp.select(F.col(key), F.col(hash_col).alias("_rep_hash"))
    joined = s.join(r, on=key, how="full_outer")
    return joined.select(
        F.col(key),
        F.when(F.col("_rep_hash").isNull(), F.lit(INSERT))
        .when(F.col("_src_hash").isNull(), F.lit(DELETE))
        .when(F.col("_src_hash") != F.col("_rep_hash"), F.lit(UPDATE))
        .otherwise(F.lit(UPDATE if assume_changed else UNCHANGED))
        .alias("change_type"),
        F.col("_src_hash").alias("new_hash"),
    )


@dataclass
class DiffSplit:
    """The three actionable id sets (unchanged rows are dropped, as in
    download.py:199-205 where matching hashes are simply evicted)."""

    upserts: DataFrame  # (key, new_hash): inserts + updates → fetch full rows
    updates: DataFrame  # (key,): subset that existed before → changelog pre-images
    deletes: DataFrame  # (key,): replica-only keys


def split_diff(diff: DataFrame, key: str = "id") -> DiffSplit:
    """Split a ``snapshot_diff`` result into the id sets each
    downstream stage consumes (download.py: pipe1 → fetch_loop for
    changed/new, delete list for internal-only)."""
    return DiffSplit(
        upserts=diff.filter(F.col("change_type").isin(INSERT, UPDATE)).select(
            key, "new_hash"
        ),
        updates=diff.filter(F.col("change_type") == UPDATE).select(key),
        deletes=diff.filter(F.col("change_type") == DELETE).select(key),
    )
