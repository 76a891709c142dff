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

    @property
    def _cells(self) -> str:
        return f"{self.name}__cells"

    @property
    def _codebook(self) -> str:
        return f"{self.name}__codebook"

    def exists(self) -> bool:
        return self.store.exists_partitioned(self._cells)

    # -- codebook ------------------------------------------------------
    def centroids(self) -> list[list[float]]:
        rows = self.store.read(self._codebook).orderBy("cid").collect()
        return [list(r["centroid"]) for r in rows]

    def codebook(self) -> str:
        return self.store.read(self._codebook).head()["codebook_id"]

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
        assigned = ivf_assign(
            corpus, centroids, self.id_col, self.vec_col
        )
        self.store.write_partitioned(self._cells, assigned, "bucket")

    def upsert(self, delta: DataFrame) -> None:
        """Insert or replace the delta's vectors; only affected cell
        partitions are rewritten.

        ``delta`` (and ``remove``'s ``ids``) must not be a LAZY plan
        over this index's own storage: the rewrite deletes files such
        a plan would re-scan on its next evaluation. Derive deltas
        from the upstream source, or materialize first."""
        cents = self.centroids()
        assigned = ivf_assign(delta, cents, self.id_col, self.vec_col)
        idx = self.store.read_partitioned(self._cells)
        delta_ids = delta.select(self.id_col).distinct()
        old_cells = (
            idx.join(delta_ids, self.id_col)
            .select("bucket")
            .distinct()
        )
        new_cells = assigned.select("bucket").distinct()
        affected = [
            r["bucket"] for r in old_cells.unionByName(new_cells).distinct().collect()
        ]
        rebuilt = (
            idx.filter(F.col("bucket").isin(affected))
            .join(delta_ids, self.id_col, "anti")
            .unionByName(assigned.select(*idx.columns))
        )
        # compute the surviving-cell set BEFORE the overwrite: rebuilt
        # is lazy, and re-evaluating it after the write would re-scan
        # source files the overwrite just deleted
        present = {r["bucket"] for r in rebuilt.select("bucket").distinct().collect()}
        self.store.overwrite_partitions(self._cells, rebuilt, "bucket")
        self.store.drop_partitions(
            self._cells, "bucket", [b for b in affected if b not in present]
        )

    def remove(self, ids: DataFrame) -> None:
        """Drop vectors by id; rewrites (or drops) only their cells."""
        idx = self.store.read_partitioned(self._cells)
        key = ids.select(self.id_col).distinct()
        affected = [
            r["bucket"]
            for r in idx.join(key, self.id_col).select("bucket").distinct().collect()
        ]
        if not affected:
            return
        rebuilt = idx.filter(F.col("bucket").isin(affected)).join(
            key, self.id_col, "anti"
        )
        # pre-write for the same lazy-re-evaluation reason as upsert
        present = {r["bucket"] for r in rebuilt.select("bucket").distinct().collect()}
        self.store.overwrite_partitions(self._cells, rebuilt, "bucket")
        self.store.drop_partitions(
            self._cells, "bucket", [b for b in affected if b not in present]
        )

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
