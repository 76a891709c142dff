"""Sharded export: deterministic across reruns, contiguous slabs of
the global shuffle order, consumer-verifiable manifest."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.sampling import deterministic_shuffle
from updater_spark.operators.shards import (
    read_shards,
    shard_manifest,
    write_shards,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from updater_spark import demo

    return demo.load(spark, sf_dir, "documents").select("doc_id", "lang").cache()


def test_shards_are_contiguous_deterministic_slabs(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    m1 = write_shards(docs, out, n_shards=4)
    assert m1["total_rows"] == docs.count()
    assert len(m1["shards"]) == 4
    # near-balanced slabs
    sizes = [s["n_rows"] for s in m1["shards"].values()]
    assert max(sizes) - min(sizes) <= 1
    # contiguous, non-overlapping position ranges in shard order
    spans = [
        (s["pos_min"], s["pos_max"])
        for _, s in sorted(m1["shards"].items(), key=lambda kv: int(kv[0]))
    ]
    assert spans[0][0] == 0
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert b_lo == a_hi + 1

    # rerun into another dir: identical manifest (ignoring nothing)
    m2 = write_shards(docs, str(tmp_path / "shards2"), n_shards=4)
    assert m1 == m2

    # concatenated shard order == the deterministic shuffle order
    got = [r["doc_id"] for r in read_shards(spark, out).collect()]
    want = [
        r["doc_id"]
        for r in deterministic_shuffle(docs, id_col="doc_id")
        .orderBy("pos")
        .collect()
    ]
    assert got == want


def test_manifest_verifies_and_detects_tamper(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    written = write_shards(docs, out, n_shards=3)
    disk = json.load(open(os.path.join(out, "_manifest.json")))
    recomputed = shard_manifest(spark.read.parquet(out))
    assert recomputed["shards"] == disk["shards"]
    assert recomputed["total_rows"] == written["total_rows"]

    # tamper: drop one shard's files -> recomputed manifest diverges
    victim = sorted(glob.glob(os.path.join(out, "shard=1", "*.parquet")))
    for f in victim:
        os.remove(f)
    damaged = shard_manifest(spark.read.parquet(out))
    assert damaged["shards"] != disk["shards"]


def test_one_file_per_shard(spark, docs, tmp_path):
    out = str(tmp_path / "shards")
    write_shards(docs, out, n_shards=5)
    for d in glob.glob(os.path.join(out, "shard=*")):
        assert len(glob.glob(os.path.join(d, "*.parquet"))) == 1
