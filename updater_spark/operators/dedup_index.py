"""Incremental corpus dedup: a persistent MinHash/LSH index updated
per CDC cycle.

The one-shot pipeline (dedup.py) re-signs the WHOLE corpus every run —
fine for a batch job, wrong for the reference's incremental model
(SURVEY.md §2.6: diff → fetch only changed rows → derive). At 100 TB
a full re-sign is days of compute to process a 0.1% delta. This index
is the dedup twin of the CDC fingerprint cache (plans/cdc.py): state
that persists between runs so each update touches O(|delta|) docs:

- ``{name}_sigs``  (id, signature array<long>) — MinHash signatures.
- ``{name}_bands`` (id, band, band_hash)       — LSH probe table.

``update(delta)`` signs ONLY the delta, probes its band hashes against
the stored band table (new×old), runs banding among the delta itself
(new×new), replaces any stale state for re-ingested ids, and appends
the delta's state. Every LSH-collision pair {a, b} is emitted exactly
once — by whichever call ingests the later of the two docs — so the
union of all calls' outputs equals the one-shot scan's pairs on the
final corpus (asserted in tests/test_dedup_index.py).

Scale shape: the delta band table is small → broadcast side of the
new×old probe join; the stored band table only ever streams through
that join (no groupBy over the full corpus, ever). State writes go
through TableStore's versioned write + atomic pointer swap (same
crash-safety as the CDC hash cache, reference table.py:108-117). For
corpus-scale state, back the band table with
``write_bucketed_versioned`` on (band, band_hash) to make the probe
join exchange-free on the stored side — same trade as
CdcEngine(fingerprint_buckets=N).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from updater_spark.operators.dedup import (
    band_hashes,
    lsh_candidate_pairs,
    minhash_signatures,
)
from updater_spark.sources.store import TableStore


class DedupIndex:
    def __init__(
        self,
        store: TableStore,
        name: str,
        num_hashes: int = 64,
        bands: int = 16,
        shingle_n: int = 3,
        seed: int = 7,
        max_bucket: int = 200,
        shingle_unit: str = "word",
    ):
        if shingle_unit not in ("word", "char"):
            raise ValueError(
                f"shingle_unit must be 'word' or 'char', got {shingle_unit!r}"
            )
        self.store = store
        self.name = name
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.seed = seed
        self.max_bucket = max_bucket
        self.shingle_unit = shingle_unit

    PARAM_KEYS = (
        "num_hashes",
        "bands",
        "shingle_n",
        "seed",
        "max_bucket",
        "shingle_unit",
    )

    @property
    def _sigs_name(self) -> str:
        return f"{self.name}_sigs"

    @property
    def _bands_name(self) -> str:
        return f"{self.name}_bands"

    def exists(self) -> bool:
        return self.store.exists(self._sigs_name)

    # -- parameter identity (the IvfIndex codebook-identity stance) ----
    def _write_params(self) -> None:
        import json

        self.store.write_sidecar(
            self._sigs_name,
            "params",
            json.dumps({k: getattr(self, k) for k in self.PARAM_KEYS}),
        )

    def _check_params(self) -> None:
        """The stored state is signed/banded with ONE parameter set; an
        instance constructed with different parameters would probe
        8-hash band slices against a 16-band table and silently find
        nothing (the exact recall loss the occupancy telemetry exists
        to catch) — refuse loudly instead. ``reband`` updates the
        sidecar when it legitimately changes the banding; legacy
        indexes without the sidecar skip the check."""
        import json

        raw = self.store.read_sidecar(self._sigs_name, "params")
        if raw is None:
            return
        stored = json.loads(raw)
        # sidecars written before the unit switch existed are
        # word-unit by construction — fill the default instead of
        # failing every legacy index on a missing key
        stored.setdefault("shingle_unit", "word")
        mine = {k: getattr(self, k) for k in self.PARAM_KEYS}
        if stored != mine:
            raise ValueError(
                f"dedup index {self.name!r} state was built with "
                f"{stored}, this instance has {mine}; construct "
                "DedupIndex with the stored parameters (or reband())"
            )

    def signatures(self) -> DataFrame:
        return self.store.read(self._sigs_name)

    def _sign(self, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        return minhash_signatures(
            docs,
            id_col,
            text_col,
            self.num_hashes,
            self.shingle_n,
            self.seed,
            shingle_unit=self.shingle_unit,
        )

    def bootstrap(
        self, docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        """Build the index from the initial corpus; returns the
        candidate pairs within it (the one-shot scan's output)."""
        sigs = self._sign(docs, id_col, text_col)
        self.store.write(self._sigs_name, sigs)
        self.store.write(
            self._bands_name, band_hashes(self.signatures(), self.bands)
        )
        self._write_params()
        return lsh_candidate_pairs(
            self.signatures(), self.bands, self.max_bucket
        )

    def update(
        self, delta: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        """Ingest new/changed docs; returns candidate pairs involving
        the delta (new×old ∪ new×new). A re-ingested id's previous
        signature and bands are replaced first, so pairs always
        reflect current text and a changed doc never pairs through its
        own stale buckets."""
        if not self.exists():
            return self.bootstrap(delta, id_col, text_col)
        self._check_params()
        delta_sigs = self._sign(delta, id_col, text_col)
        delta_ids = delta.select(F.col(id_col).alias("id")).distinct()

        old_sigs = self.signatures().join(delta_ids, "id", "anti")
        old_bands = (
            self.store.read(self._bands_name).join(delta_ids, "id", "anti")
        )

        # persist FIRST (versioned write + pointer swap is atomic), so
        # the returned pairs — computed lazily by the caller — read
        # consistent state.
        new_sigs = old_sigs.unionByName(delta_sigs)
        self.store.write(self._sigs_name, new_sigs)
        delta_bands = band_hashes(
            self.signatures().join(delta_ids, "id", "semi"), self.bands
        )
        self.store.write(
            self._bands_name, old_bands.unionByName(delta_bands)
        )

        # read back the POST-write state (version dirs are immutable
        # but old versions are GC-eligible; never hold pre-write refs)
        stored = self.store.read(self._bands_name)
        probe = stored.join(delta_ids, "id", "semi")
        rest = stored.join(delta_ids, "id", "anti")
        # delta side is small by construction → broadcast it; the full
        # band table streams through the join without shuffling
        new_old = (
            F.broadcast(
                probe.select(F.col("id").alias("id_n"), "band", "band_hash")
            )
            .join(rest, ["band", "band_hash"])
            .select(
                F.least("id_n", "id").alias("id_a"),
                F.greatest("id_n", "id").alias("id_b"),
            )
            .distinct()
        )
        new_new = lsh_candidate_pairs(
            self.store.read(self._sigs_name).join(delta_ids, "id", "semi"),
            self.bands,
            self.max_bucket,
        )
        return new_old.unionByName(new_new).distinct()

    def occupancy(self) -> dict:
        """Bucket-skew telemetry — the MinHash twin of the ANN
        indexes' ``occupancy()`` (VERDICT r6 #8): band-bucket drift is
        the same failure mode as IVF cell drift, except the symptom is
        silent RECALL loss, not probe cost — ``lsh_candidate_pairs``
        skips buckets over ``max_bucket``, so as near-dup mass
        concentrates (template boilerplate, crawl bursts) a growing
        fraction of docs sits in buckets that can never pair.

        Unlike the ANN indexes (k = codebook-size buckets, safe to
        collect), the LSH bucket count scales with the CORPUS — so the
        histogram is reduced DISTRIBUTED (groupBy sizes → one second
        aggregate) and only a single summary row reaches the driver.

        Returns ``{n_buckets, total_rows, mean, p50, p99, max,
        imbalance, capped_buckets, capped_row_fraction}`` where
        ``capped_*`` counts buckets past ``max_bucket`` and the
        fraction of band rows living in them — THE recall-drift
        signal."""
        self._check_params()
        sizes = (
            self.store.read(self._bands_name)
            .groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        row = sizes.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("n").alias("total"),
            F.avg("n").alias("mean"),
            F.expr("approx_percentile(n, 0.5)").alias("p50"),
            F.expr("approx_percentile(n, 0.99)").alias("p99"),
            F.max("n").alias("mx"),
            F.sum(
                F.when(F.col("n") > self.max_bucket, F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).alias("capped"),
            F.sum(
                F.when(F.col("n") > self.max_bucket, F.col("n")).otherwise(
                    F.lit(0)
                )
            ).alias("capped_rows"),
        ).collect()[0]
        n_buckets = int(row["n_buckets"] or 0)
        if not n_buckets:
            return {
                "n_buckets": 0,
                "total_rows": 0,
                "mean": 0.0,
                "p50": 0,
                "p99": 0,
                "max": 0,
                "imbalance": 0.0,
                "capped_buckets": 0,
                "capped_row_fraction": 0.0,
            }
        total = int(row["total"])
        mean = float(row["mean"])
        return {
            "n_buckets": n_buckets,
            "total_rows": total,
            "mean": round(mean, 2),
            "p50": int(row["p50"]),
            "p99": int(row["p99"]),
            "max": int(row["mx"]),
            "imbalance": round(int(row["mx"]) / mean, 2) if mean else 0.0,
            "capped_buckets": int(row["capped"]),
            "capped_row_fraction": round(int(row["capped_rows"]) / total, 4)
            if total
            else 0.0,
        }

    @staticmethod
    def _trips(
        stats: dict, max_capped_fraction: float, max_imbalance: float
    ) -> bool:
        """The ONE advisory predicate ``needs_retrain`` and
        ``maybe_reband`` share — a threshold change cannot diverge."""
        return bool(stats["n_buckets"]) and (
            stats["capped_row_fraction"] > max_capped_fraction
            or stats["imbalance"] > max_imbalance
        )

    def needs_retrain(
        self,
        max_capped_fraction: float = 0.05,
        max_imbalance: float = 8.0,
    ) -> bool:
        """Advisory, same contract as ``ann_index.needs_retrain``: True
        when the capped-bucket row fraction (docs that can no longer
        pair — direct recall loss) or the bucket imbalance crosses its
        threshold. The actuator is ``reband``/``maybe_reband`` (or a
        full re-sign ``bootstrap()`` when ``num_hashes`` itself must
        change); nothing here mutates the index."""
        return self._trips(
            self.occupancy(), max_capped_fraction, max_imbalance
        )

    def reband(
        self, bands: int | None = None, max_bucket: int | None = None
    ) -> DataFrame:
        """The ``needs_retrain`` ACTUATOR — the DedupIndex twin of the
        ANN indexes' ``retrain``: rebuild the band table from the
        STORED signatures with new banding parameters. Signatures are
        band-independent, so this is one scan over the sigs table —
        no re-sign, no access to document text (the property that
        makes it cheap at 100 TB: O(corpus) narrow rows rewritten,
        zero shingling/hashing work).

        Knobs and their physics: FEWER ``bands`` → longer band rows →
        stricter collisions → smaller buckets (the fix when
        ``capped_row_fraction`` tripped on a hot near-dup corpus) at
        lower recall; MORE bands → higher recall at bigger buckets.
        Exact clones collide in every band regardless — those belong
        to exact dedup, which is why ``max_bucket`` (also adjustable
        here) remains the guard.

        Returns the FULL one-shot candidate set of the stored corpus
        under the NEW banding — which REPLACES the consumer's
        accumulated pair feed, exactly ``SemanticIndex.retrain``'s
        contract: banding moved, so previously-emitted candidates are
        neither a subset nor a superset of what the new parameters
        would emit. The new parameters are persisted in the index's
        params sidecar — a later instance constructed with the OLD
        parameters fails loudly instead of silently probing mismatched
        band slices."""
        self._check_params()  # this instance must match current state
        if bands is not None:
            if self.num_hashes % bands != 0:
                raise ValueError(
                    f"bands={bands} must divide num_hashes="
                    f"{self.num_hashes}"
                )
            self.bands = bands
        if max_bucket is not None:
            self.max_bucket = max_bucket
        self.store.write(
            self._bands_name, band_hashes(self.signatures(), self.bands)
        )
        self._write_params()
        return lsh_candidate_pairs(
            self.signatures(), self.bands, self.max_bucket
        )

    def maybe_reband(
        self,
        bands: int | None = None,
        max_bucket: int | None = None,
        max_capped_fraction: float = 0.05,
        max_imbalance: float = 8.0,
    ) -> dict:
        """Measure → act: reband only when the advisory trips (same
        shape as ``SemanticIndex.maybe_compact``/``maybe_retrain``).
        Returns the pre-act stats plus ``{"rebanded": bool}``; when it
        acted, the caller must REPLACE its pair feed with
        ``self.reband``'s return — so the acted branch also carries
        ``"pairs"`` (the new one-shot candidate plan)."""
        stats = self.occupancy()
        if not self._trips(stats, max_capped_fraction, max_imbalance):
            return {"rebanded": False, **stats}
        pairs = self.reband(bands=bands, max_bucket=max_bucket)
        return {"rebanded": True, "pairs": pairs, **stats}

    def remove(self, ids: DataFrame) -> None:
        """Drop documents (e.g. CDC deletes) from the index state."""
        self._check_params()
        ids = ids.toDF("id")
        self.store.write(
            self._sigs_name, self.signatures().join(ids, "id", "anti")
        )
        self.store.write(
            self._bands_name,
            self.store.read(self._bands_name).join(ids, "id", "anti"),
        )


def apply_cdc_epoch(
    index: DedupIndex,
    store: TableStore,
    table: str,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Maintain a dedup index from one ``CdcEngine`` epoch — the
    "dedup as engine state" composition (SURVEY.md §9): after
    ``engine.update(spec, source)``, the store holds the epoch's full
    change feed (``{table}__delta`` changed+new rows,
    ``{table}__deleted`` applied delete keys); this feeds both into
    the index so its state always mirrors the replica:

    1. deleted docs leave the signature/band state (their stale
       buckets can never pair again), then
    2. the delta is ingested (``DedupIndex.update``: sign ONLY the
       delta, probe stored bands; re-ingested ids replace their old
       state first).

    Returns the epoch's new candidate pairs (new x old ∪ new x new).
    Cross-epoch contract: the union of every epoch's pairs, filtered
    to ids alive in the final replica and exact-verified against its
    text, equals one-shot verified dedup of that final corpus
    (tests/test_dedup_index.py::test_cdc_epochs_match_one_shot).

    Cost per epoch is O(|delta| + |deletes|) signing/probing plus the
    index-state rewrite — never a corpus re-sign.

    Materialize the returned pairs (collect, or persist + action)
    BEFORE driving the next epoch: they are a lazy plan over the
    store's current state versions, which later epochs' writes make
    GC-eligible (same contract as DedupIndex.update)."""
    if store.exists(f"{table}__deleted"):
        deleted = store.read(f"{table}__deleted")
        if index.exists() and not deleted.isEmpty():
            index.remove(deleted.select(id_col))
    delta = store.read(f"{table}__delta").select(id_col, text_col)
    return index.update(delta, id_col, text_col)
