"""Incremental dedup index: cross-run pair parity with the one-shot
scan, re-ingest replacement, deletes."""

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
