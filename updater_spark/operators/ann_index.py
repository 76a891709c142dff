"""Persistent, incrementally-maintained IVF index.

``ivf_assign`` + a one-shot partitioned write (similarity.py) covers
the batch case; this class is the CDC-cycle twin — the ANN analogue of
the incremental dedup index (dedup_index.py): state that persists
between runs so each update touches O(|delta|) vectors, not the
corpus.

Storage (via TableStore):

- ``{name}__codebook``: (cid, centroid array<double>, codebook_id) —
  the quantizer, stored WITH the index so the index is
  self-describing: ``search()`` never takes centroids from the caller,
  making the stale-codebook mismatch (ADVICE r1) structurally
  impossible here.
- ``{name}__cells``: the corpus + ``bucket`` column, hash-partitioned
  by bucket — searches prune to probed cells at the parquet level
  (tests/test_similarity.py asserts the PartitionFilters).

``upsert(delta)`` re-assigns only the delta, then dynamically
overwrites ONLY the affected cell partitions: the new vectors' cells
plus any cell holding a stale copy of a re-ingested id (an updated
vector can migrate buckets — the stale copy must leave its OLD cell).
The old-cell lookup is an id-join against the index's (id, bucket)
columns — a column-pruned scan; corpora where that scan dominates
should add an id→bucket sidecar, the same trade as a secondary index.

Scale shape: writes touch |affected cells| directories; searches read
|probed cells|; nothing ever rewrites or scans the whole index except
``bootstrap``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from updater_spark.operators.similarity import (
    codebook_id,
    ivf_assign,
    ivf_topk,
)
from updater_spark.sources.store import TableStore


class IvfIndex:
    def __init__(
        self,
        store: TableStore,
        name: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.store = store
        self.name = name
        self.id_col = id_col
        self.vec_col = vec_col
        # the codebook is immutable between bootstraps (upsert/remove
        # never retrain), so one read serves the object's lifetime —
        # maintenance and search ops skip a per-call codebook job
        self._cb_cache: tuple[list[list[float]], str] | None = None

    @property
    def _cells(self) -> str:
        return f"{self.name}__cells"

    @property
    def _codebook(self) -> str:
        return f"{self.name}__codebook"

    def exists(self) -> bool:
        return self.store.exists_partitioned(self._cells)

    # -- codebook ------------------------------------------------------
    def _codebook_state(self) -> tuple[list[list[float]], str]:
        if self._cb_cache is None:
            rows = self.store.read(self._codebook).orderBy("cid").collect()
            self._cb_cache = (
                [list(r["centroid"]) for r in rows],
                rows[0]["codebook_id"],
            )
        return self._cb_cache

    def centroids(self) -> list[list[float]]:
        return self._codebook_state()[0]

    def codebook(self) -> str:
        return self._codebook_state()[1]

    # -- lifecycle -----------------------------------------------------
    def bootstrap(self, corpus: DataFrame, centroids: list[list[float]]) -> None:
        spark = self.store.spark
        cb = codebook_id(centroids)
        self.store.write(
            self._codebook,
            spark.createDataFrame(
                [(i, c, cb) for i, c in enumerate(centroids)],
                "cid long, centroid array<double>, codebook_id string",
            ),
        )
        self._cb_cache = ([list(c) for c in centroids], cb)
        assigned = ivf_assign(
            corpus, centroids, self.id_col, self.vec_col
        )
        # align tasks with cells before the partitioned write: without
        # it every input task emits a file into every bucket directory
        # (tasks × cells tiny files); with it each cell gets its
        # task's worth of files and reads stay listing-cheap
        self.store.write_partitioned(
            self._cells, assigned.repartition("bucket"), "bucket"
        )

    def _cell_stats(
        self, idx: DataFrame, touched_ids: DataFrame, inserts: DataFrame | None
    ) -> tuple[list, list]:
        """ONE aggregation job computing everything the maintenance
        bookkeeping needs: per cell, how many stored rows it has, how
        many of those are stale copies of touched ids, and how many
        new rows land in it. From those k rows (k = codebook size, a
        driver-safe bound independent of corpus size) derive

        - ``affected``: cells that must be rewritten (hold a stale
          copy, or receive an insert), and
        - ``to_drop``: affected cells left EMPTY by the rebuild —
          dynamic partition overwrite only replaces partitions present
          in the new data, so emptied ones need an explicit drop.

        Replaces the former four distinct().collect() jobs per
        maintenance op (old-cell scan, new-cell scan, affected union,
        surviving-cell scan of the full rebuilt plan) with a single
        pass over the index's (id, bucket) columns."""
        hits = touched_ids.withColumn("_hit", F.lit(1))
        per_old = (
            idx.select(self.id_col, "bucket")
            .join(hits, self.id_col, "left")
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("_hit").alias("n_stale"),
            )
        )
        if inserts is not None:
            per_new = inserts.groupBy("bucket").agg(
                F.count(F.lit(1)).alias("n_ins")
            )
            stats = per_old.join(per_new, "bucket", "full").fillna(
                0, ["n_rows", "n_stale", "n_ins"]
            )
        else:
            stats = per_old.withColumn("n_ins", F.lit(0))
        affected, to_drop = [], []
        for r in stats.collect():
            if r["n_stale"] == 0 and r["n_ins"] == 0:
                continue  # untouched cell
            affected.append(r["bucket"])
            if r["n_rows"] - r["n_stale"] + r["n_ins"] == 0:
                to_drop.append(r["bucket"])
        return affected, to_drop

    def upsert(self, delta: DataFrame) -> None:
        """Insert or replace the delta's vectors; only affected cell
        partitions are rewritten (the new vectors' cells plus any cell
        holding a stale copy — an updated vector can migrate buckets).

        Two Spark jobs total: the ``_cell_stats`` bookkeeping pass and
        the dynamic-partition-overwrite of the affected cells.

        ``delta`` (and ``remove``'s ``ids``) must not be a LAZY plan
        over this index's own storage: the rewrite deletes files such
        a plan would re-scan on its next evaluation. Derive deltas
        from the upstream source, or materialize first."""
        cents = self.centroids()
        assigned = ivf_assign(delta, cents, self.id_col, self.vec_col)
        idx = self.store.read_partitioned(self._cells)
        delta_ids = delta.select(self.id_col).distinct()
        affected, to_drop = self._cell_stats(idx, delta_ids, assigned)
        if not affected:
            return
        rebuilt = (
            idx.filter(F.col("bucket").isin(affected))
            .join(delta_ids, self.id_col, "anti")
            .unionByName(assigned.select(*idx.columns))
        )
        self.store.overwrite_partitions(
            self._cells, rebuilt.repartition("bucket"), "bucket"
        )
        self.store.drop_partitions(self._cells, "bucket", to_drop)

    def remove(self, ids: DataFrame) -> None:
        """Drop vectors by id; rewrites (or drops) only their cells.
        Same two-job shape as ``upsert``."""
        idx = self.store.read_partitioned(self._cells)
        key = ids.select(self.id_col).distinct()
        affected, to_drop = self._cell_stats(idx, key, None)
        if not affected:
            return
        rebuilt = idx.filter(F.col("bucket").isin(affected)).join(
            key, self.id_col, "anti"
        )
        # an affected cell can be fully emptied; overwrite replaces
        # the survivors' partitions, drop removes the emptied ones
        survivors = [b for b in affected if b not in set(to_drop)]
        if survivors:
            self.store.overwrite_partitions(
                self._cells, rebuilt.repartition("bucket"), "bucket"
            )
        self.store.drop_partitions(self._cells, "bucket", to_drop)

    # -- search --------------------------------------------------------
    def search(self, queries: DataFrame, k: int = 5, nprobe: int = 4) -> DataFrame:
        """Top-k over the stored index. Centroids come FROM the index
        (self-describing) — caller cannot desynchronize them. The
        partitioned cell read carries no column metadata, so the
        codebook table's stored identity is passed explicitly; it must
        hash-match the centroids read from the same table, catching a
        codebook/cells restore mismatch."""
        stored = self.store.read_partitioned(self._cells)
        return ivf_topk(
            stored,
            queries,
            self.centroids(),
            self.id_col,
            self.vec_col,
            k=k,
            nprobe=nprobe,
            bucket_col="bucket",
            codebook=self.codebook(),
        )
