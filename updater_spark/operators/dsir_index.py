"""DSIR as CDC state: a persistent bucket-count model updated per
epoch, so data selection stays current as the corpus churns without
re-counting 100 TB.

The one-shot operator (operators/dsir.py) re-scans BOTH corpora to
build its bucket model on every run. But the model state is just two
integers per bucket — target count and raw count — and counts are
ADDITIVE: an epoch's effect on the model is

    counts' = counts + features(added docs) - features(removed docs)

where "removed" covers deletes AND the pre-image of every changed doc
(the reference's changelog keeps exactly these pre-images —
/root/reference/src/table.py changelog rows; here
``changelog_preimages``, operators/merge.py). So an update costs one
token-stream scan of the DELTA plus a B-row merge — O(|delta|), never
O(corpus) — and the incremental counts are EXACTLY the from-scratch
counts (integers, no drift; pinned in tests/test_dsir_index.py).

This is the same "derived state under CDC" family as the MinHash
index (dedup_index.py), the semantic index (semantic_index.py), and
the rollup repair path (rollup.py) — the reference's signature move
(cache what is expensive, update it from the diff) applied to the
selection model.

State: ``{name}_counts`` (bucket, t_cnt, r_cnt) — 2^hash_bits rows —
via TableStore's versioned write + atomic pointer swap, with a params
sidecar refusing mismatched (hash_bits, alpha, hasher) instances (the
DedupIndex identity stance).

Scale shape: the delta agg partial-combines to ≤ B rows before its
shuffle; the merge is a B-row full-outer join (broadcast, trivially);
scoring reads the B-row model and broadcasts it exactly like the
one-shot path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from updater_spark.operators.dsir import hashed_ngram_buckets
from updater_spark.sources.store import TableStore

__all__ = ["DsirIndex"]


class DsirIndex:
    PARAM_KEYS = ("hash_bits", "alpha", "hasher")

    def __init__(
        self,
        store: TableStore,
        name: str,
        hash_bits: int = 12,
        alpha: float = 1.0,
        hasher: str = "md5",
    ):
        if alpha <= 0:
            raise ValueError(f"alpha must be > 0, got {alpha}")
        self.store = store
        self.name = name
        self.hash_bits = hash_bits
        self.alpha = alpha
        self.hasher = hasher

    @property
    def _counts_name(self) -> str:
        return f"{self.name}_counts"

    def exists(self) -> bool:
        return self.store.exists(self._counts_name)

    def _write_params(self) -> None:
        self.store.write_sidecar(
            self._counts_name,
            "params",
            json.dumps({k: getattr(self, k) for k in self.PARAM_KEYS}),
        )

    def _check_params(self) -> None:
        raw = self.store.read_sidecar(self._counts_name, "params")
        if raw is None:
            return
        stored = json.loads(raw)
        mine = {k: getattr(self, k) for k in self.PARAM_KEYS}
        if stored != mine:
            raise ValueError(
                f"dsir index {self.name!r} state was built with "
                f"{stored}, this instance has {mine}; construct "
                "DsirIndex with the stored parameters"
            )

    def _features(
        self, docs: DataFrame, id_col: str, text_col: str, out: str
    ) -> DataFrame:
        """Bucket counts of a doc frame: ≤ B rows after the agg."""
        return (
            hashed_ngram_buckets(
                docs, id_col, text_col, self.hash_bits, self.hasher
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    def counts(self) -> DataFrame:
        return self.store.read(self._counts_name)

    def bootstrap(
        self,
        raw: DataFrame,
        target: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Initial model: every bucket materialized (even empty ones —
        updates must be able to move any bucket off zero without an
        outer-join resurrection step)."""
        spark = raw.sparkSession
        all_b = spark.range(1 << self.hash_bits).select(
            F.col("id").alias("bucket")
        )
        t = self._features(target, id_col, text_col, "_t")
        r = self._features(raw, id_col, text_col, "_r")
        counts = (
            all_b.join(F.broadcast(t), "bucket", "left")
            .join(F.broadcast(r), "bucket", "left")
            .select(
                "bucket",
                F.coalesce("_t", F.lit(0)).alias("t_cnt"),
                F.coalesce("_r", F.lit(0)).alias("r_cnt"),
            )
        )
        self.store.write(self._counts_name, counts)
        self._write_params()

    def update(
        self,
        raw_added: DataFrame | None = None,
        raw_removed: DataFrame | None = None,
        target_added: DataFrame | None = None,
        target_removed: DataFrame | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Apply one CDC epoch to the model. ``*_removed`` frames must
        carry the PRE-IMAGE text of deleted/changed docs (a changed
        doc appears in both removed — old text — and added — new
        text). Counts can mathematically only reach zero, never go
        negative, when the pre-images are faithful; a negative count
        here means the feed lied, so it raises rather than silently
        corrupting every later selection."""
        if not self.exists():
            raise ValueError(
                f"dsir index {self.name!r} has no state; bootstrap() first"
            )
        self._check_params()

        merged = self.counts()
        for frame, col, sign in (
            (target_added, "t_cnt", 1),
            (target_removed, "t_cnt", -1),
            (raw_added, "r_cnt", 1),
            (raw_removed, "r_cnt", -1),
        ):
            if frame is None:
                continue
            d = self._features(frame, id_col, text_col, "_d")
            merged = (
                merged.join(F.broadcast(d), "bucket", "left")
                .withColumn(
                    col,
                    F.col(col) + F.lit(sign) * F.coalesce("_d", F.lit(0)),
                )
                .drop("_d")
            )
        bad = merged.filter(
            (F.col("t_cnt") < 0) | (F.col("r_cnt") < 0)
        ).count()
        if bad:
            raise ValueError(
                f"{bad} buckets would go negative — a *_removed frame "
                "does not match the features previously added (stale "
                "or missing pre-images); refusing to corrupt the model"
            )
        self.store.write(self._counts_name, merged)

    def log_ratios(self) -> DataFrame:
        """(bucket, log_ratio) from the stored counts — same smoothing
        algebra and operand order as dsir_log_ratios so weights from
        an up-to-date index equal the one-shot operator's exactly."""
        counts = self.counts()
        totals = counts.agg(
            F.sum("t_cnt").alias("t"), F.sum("r_cnt").alias("r")
        ).first()
        t_total, r_total = totals["t"] or 0, totals["r"] or 0
        if t_total == 0 or r_total == 0:
            raise ValueError(
                f"empty model (target={t_total}, raw={r_total})"
            )
        b_count = 1 << self.hash_bits
        t_denom = float(t_total + self.alpha * b_count)
        r_denom = float(r_total + self.alpha * b_count)
        return counts.select(
            "bucket",
            (
                F.log((F.col("t_cnt") + F.lit(self.alpha)) / F.lit(t_denom))
                - F.log((F.col("r_cnt") + F.lit(self.alpha)) / F.lit(r_denom))
            ).alias("log_ratio"),
        )

    def weights(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        round_digits: int = 4,
    ) -> DataFrame:
        """Per-document log importance weight under the CURRENT model
        — the dsir_weights contract (featureless docs kept at 0)."""
        feats = hashed_ngram_buckets(
            docs, id_col, text_col, self.hash_bits, self.hasher
        )
        scored = (
            feats.join(F.broadcast(self.log_ratios()), "bucket")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_feats"),
                F.round(F.sum("log_ratio"), round_digits).alias(
                    "log_weight"
                ),
            )
        )
        return (
            docs.select(id_col)
            .distinct()
            .join(scored, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
            )
        )
