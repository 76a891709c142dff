"""Incremental dedup index: cross-run pair parity with the one-shot
scan, re-ingest replacement, deletes."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)
from updater_spark.operators.dedup_index import DedupIndex


def _corpus(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 5 == 0)
    )
    copies = docs.withColumn("doc_id", F.col("doc_id") + 100_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz yy xx"))
    )
    return docs, copies


def _pairs_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_incremental_equals_one_shot(spark, sf_dir, tmp_store):
    docs, copies = _corpus(spark, sf_dir)
    idx = DedupIndex(tmp_store, "docs")
    p0 = _pairs_set(idx.bootstrap(docs, "doc_id", "text"))
    p1 = _pairs_set(idx.update(copies, "doc_id", "text"))

    full = docs.unionByName(copies)
    want = _pairs_set(
        lsh_candidate_pairs(minhash_signatures(full, "doc_id", "text"))
    )
    assert p0 | p1 == want
    # every update pair touches the delta (no old×old re-emission)
    assert all(a >= 100_000 or b >= 100_000 for a, b in p1)
    # state now covers the full corpus
    assert idx.signatures().count() == full.count()


def test_reingest_replaces_state(spark, sf_dir, tmp_store):
    docs, copies = _corpus(spark, sf_dir)
    idx = DedupIndex(tmp_store, "docs")
    idx.bootstrap(docs, "doc_id", "text")
    idx.update(copies, "doc_id", "text")

    # re-ingest one copy with totally different text: its old pairs
    # must not survive in state-derived pairs
    victim = copies.orderBy("doc_id").limit(1)
    vid = victim.first()["doc_id"]
    changed = victim.withColumn(
        "text", F.lit("totally unrelated replacement text with nothing shared")
    )
    pairs = _pairs_set(idx.update(changed, "doc_id", "text"))
    assert pairs == set()  # new text collides with nothing
    # exactly one signature row for the re-ingested id
    assert idx.signatures().filter(F.col("id") == vid).count() == 1
    # and the full-state pair scan no longer links the victim
    state_pairs = _pairs_set(lsh_candidate_pairs(idx.signatures()))
    assert not any(vid in p for p in state_pairs)


def test_remove_drops_ids(spark, tmp_store):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"doc number {i} with some shared words") for i in range(10)]
    )
    idx = DedupIndex(tmp_store, "docs")
    idx.bootstrap(docs, "doc_id", "text")
    idx.remove(spark.createDataFrame([Row(id=3)]))
    assert idx.signatures().filter("id = 3").count() == 0
    assert idx.signatures().count() == 9


def test_update_on_empty_index_bootstraps(spark, tmp_store):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="alpha beta gamma delta epsilon zeta")]
    )
    idx = DedupIndex(tmp_store, "docs")
    assert not idx.exists()
    idx.update(docs, "doc_id", "text")
    assert idx.exists() and idx.signatures().count() == 1


def test_cdc_epochs_match_one_shot(spark, sf_dir, tmp_store):
    """The SURVEY §9 composition — dedup index as CDC engine state:
    three epochs (bootstrap; inserts + text updates; deletes) driven
    through CdcEngine, with apply_cdc_epoch mirroring each epoch's
    persisted change feed (__delta + __deleted) into the index. The
    union of per-epoch candidate pairs, filtered to ids alive in the
    final replica and exact-verified against its text, must equal the
    one-shot LSH-verified dedup of the final corpus."""
    from updater_spark.operators.dedup import (
        lsh_verified_pairs,
        verify_pairs_exact,
    )
    from updater_spark.operators.dedup_index import apply_cdc_epoch
    from updater_spark.plans.cdc import CdcEngine
    from updater_spark.schema import TableSpec

    docs, copies = _corpus(spark, sf_dir)
    spec = TableSpec(name="docs_cdc", primary_key="doc_id")
    eng = CdcEngine(tmp_store, fingerprint_algo="md5")
    idx = DedupIndex(tmp_store, "docsidx")

    def epoch_pairs():
        # collect eagerly: the pairs are lazy over store versions the
        # NEXT epoch's writes garbage-collect (documented contract)
        return _pairs_set(
            apply_cdc_epoch(idx, tmp_store, "docs_cdc", "doc_id", "text")
        )

    # epoch 0: originals only
    eng.bootstrap(spec, docs)
    acc = [epoch_pairs()]

    # epoch 1: insert the near-copies, and CHANGE some originals' text
    # (the CDC diff must pick the modification up via fingerprints and
    # the index must re-sign exactly those docs)
    k = F.col("doc_id")
    src1 = docs.withColumn(
        "text",
        F.when(k % 15 == 0, F.concat("text", F.lit(" qq"))).otherwise(
            F.col("text")
        ),
    ).unionByName(copies)
    st1 = eng.update(spec, src1)
    assert st1.updates > 0 and st1.deletes == 0
    acc.append(epoch_pairs())

    # epoch 2: delete every 20th original (their pairs with surviving
    # copies must drop out of the final answer)
    src2 = src1.filter(~((k % 20 == 0) & (k < 100_000)))
    st2 = eng.update(spec, src2)
    assert st2.deletes > 0 and st2.deletes_applied
    acc.append(epoch_pairs())

    final = tmp_store.read("docs_cdc").select("doc_id", "text")
    alive = {r[0] for r in final.select("doc_id").collect()}
    union = set().union(*acc)
    cand_rows = [
        (a, b) for a, b in union if a in alive and b in alive
    ]
    cand = spark.createDataFrame(cand_rows, "id_a long, id_b long")
    got = _pairs_set(
        verify_pairs_exact(final, cand, "doc_id", "text", n=3, threshold=0.5)
    )
    want = _pairs_set(
        lsh_verified_pairs(final, "doc_id", "text", n=3, threshold=0.5)
    )
    assert got == want and len(want) > 0
    # deletes really dropped pairs: some accumulated pair must involve
    # a now-dead doc (the epoch-2 deletions had copies)
    assert any(a not in alive or b not in alive for a, b in union)
    # index state mirrors the final replica exactly
    assert idx.signatures().count() == final.count()
    assert (
        idx.signatures()
        .join(final.select(F.col("doc_id").alias("id")), "id", "anti")
        .count()
        == 0
    )


def test_occupancy_and_needs_retrain(spark, sf_dir, tmp_store):
    """Bucket-skew telemetry (VERDICT r6 #8): the stats summarize the
    band-bucket histogram distributed-side, capped_* counts buckets
    past max_bucket (the silent-recall-loss signal), and the advisory
    trips when identical docs pile into the same buckets."""
    docs, copies = _corpus(spark, sf_dir)
    idx = DedupIndex(tmp_store, "occ", max_bucket=200)
    idx.bootstrap(docs, "doc_id", "text")
    stats = idx.occupancy()
    assert stats["n_buckets"] > 0
    assert stats["total_rows"] == idx.signatures().count() * idx.bands
    assert stats["max"] >= stats["p99"] >= stats["p50"] >= 1
    assert stats["capped_buckets"] == 0  # near-unique docs: no pileup
    assert idx.needs_retrain() is False

    # pile 300 exact copies of one doc into the index: every band
    # bucket they share blows past max_bucket -> capped fraction and
    # imbalance both trip the advisory
    one = docs.limit(1)
    clones = (
        one.crossJoin(spark.range(300).select(F.col("id").alias("_k")))
        .select(
            (F.col("doc_id") + 500_000 + F.col("_k")).alias("doc_id"),
            "text",
        )
    )
    idx.update(clones, "doc_id", "text")
    hot = idx.occupancy()
    assert hot["capped_buckets"] > 0
    assert hot["capped_row_fraction"] > 0
    assert hot["max"] >= 300
    assert idx.needs_retrain() is True
    # empty index edge: all-zero stats, advisory stays quiet
    empty = DedupIndex(tmp_store, "occ_empty")
    empty.bootstrap(docs.limit(0), "doc_id", "text")
    z = empty.occupancy()
    assert z["n_buckets"] == 0 and empty.needs_retrain() is False


def test_reband_equals_fresh_bootstrap(spark, sf_dir, tmp_store):
    """reband() from STORED signatures must land on exactly the state
    (band table + one-shot candidates) of a fresh index built at the
    new parameters — and it must not touch document text (the sigs
    are the only input)."""
    docs, copies = _corpus(spark, sf_dir)
    corpus = docs.unionByName(copies)

    idx = DedupIndex(tmp_store, "rb", num_hashes=64, bands=16)
    idx.bootstrap(corpus, "doc_id", "text")
    pairs = _pairs_set(idx.reband(bands=8))
    assert idx.bands == 8

    fresh = DedupIndex(tmp_store, "rb_fresh", num_hashes=64, bands=8)
    want = _pairs_set(fresh.bootstrap(corpus, "doc_id", "text"))
    assert pairs == want and len(want) > 0
    got_bands = sorted(
        tuple(r) for r in tmp_store.read("rb_bands").collect()
    )
    want_bands = sorted(
        tuple(r) for r in tmp_store.read("rb_fresh_bands").collect()
    )
    assert got_bands == want_bands
    # subsequent incremental updates run under the new banding
    extra = docs.limit(5).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    p2 = idx.update(extra, "doc_id", "text")
    assert p2.count() >= 5  # the re-texted copies pair with originals

    with pytest.raises(ValueError, match="must divide"):
        idx.reband(bands=7)


def test_maybe_reband_measure_act(spark, sf_dir, tmp_store):
    docs, _ = _corpus(spark, sf_dir)
    idx = DedupIndex(tmp_store, "mrb", max_bucket=200)
    idx.bootstrap(docs, "doc_id", "text")
    quiet = idx.maybe_reband(bands=8)
    assert quiet["rebanded"] is False and idx.bands == 16

    one = docs.limit(1)
    clones = (
        one.crossJoin(spark.range(300).select(F.col("id").alias("_k")))
        .select(
            (F.col("doc_id") + 500_000 + F.col("_k")).alias("doc_id"),
            "text",
        )
    )
    idx.update(clones, "doc_id", "text")
    acted = idx.maybe_reband(max_bucket=400)
    assert acted["rebanded"] is True and idx.max_bucket == 400
    assert "pairs" in acted and acted["pairs"].count() > 0


def test_param_identity_guard(spark, sf_dir, tmp_store):
    """An instance constructed with parameters that differ from the
    stored state's (e.g. after a reband, or just a config drift) must
    fail loudly — probing 4-hash band slices against an 8-hash band
    table silently finds nothing, the exact recall loss the telemetry
    exists to catch."""
    docs, _ = _corpus(spark, sf_dir)
    idx = DedupIndex(tmp_store, "pg", num_hashes=64, bands=16)
    idx.bootstrap(docs, "doc_id", "text")
    idx.reband(bands=8)

    stale = DedupIndex(tmp_store, "pg", num_hashes=64, bands=16)
    extra = docs.limit(3).select(
        (F.col("doc_id") + 77_000).alias("doc_id"), "text"
    )
    with pytest.raises(ValueError, match="construct DedupIndex"):
        stale.update(extra, "doc_id", "text")
    with pytest.raises(ValueError, match="construct DedupIndex"):
        stale.occupancy()
    # matching construction proceeds
    fresh = DedupIndex(tmp_store, "pg", num_hashes=64, bands=8)
    assert fresh.update(extra, "doc_id", "text").count() >= 0
