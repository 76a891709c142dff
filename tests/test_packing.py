"""Dataset split + sequence packing vs Python/DuckDB oracles."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from updater_spark.operators.packing import (
    dataset_split,
    pack_chunks,
    pack_greedy,
    shard_by_hash,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.length("text").cast("long").alias("n_tokens"))
        .cache()
    )


def _py_split(doc_id: int, salt: str) -> str:
    hx = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:4]
    if hx < "cccc":
        return "train"
    if hx < "e666":
        return "val"
    return "test"


def test_dataset_split_python_oracle(spark, docs):
    got = {
        r["doc_id"]: r["split"]
        for r in dataset_split(docs, "doc_id", salt="split-v1").collect()
    }
    assert len(got) == docs.count()
    for doc_id, label in got.items():
        assert label == _py_split(doc_id, "split-v1")
    fractions = {
        lab: sum(1 for v in got.values() if v == lab) / len(got)
        for lab in ("train", "val", "test")
    }
    assert abs(fractions["train"] - 0.8) < 0.06
    assert abs(fractions["val"] - 0.1) < 0.04
    assert abs(fractions["test"] - 0.1) < 0.04


def test_dataset_split_stable_under_corpus_growth(spark, docs):
    # A row's label is a pure function of (id, salt): filtering the
    # corpus must not change any surviving row's assignment.
    full = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in dataset_split(docs.filter(F.col("doc_id") % 2 == 0)).collect()
    }
    assert half == {k: v for k, v in full.items() if k % 2 == 0}


def test_shard_by_hash_balanced(spark, docs):
    rows = shard_by_hash(docs, "doc_id", num_shards=8).groupBy("shard").count().collect()
    assert len(rows) == 8
    n = docs.count()
    for r in rows:
        assert abs(r["count"] / n - 1 / 8) < 0.05


def test_pack_chunks_duckdb_oracle(spark, sf_dir, docs):
    sharded = shard_by_hash(docs, "doc_id", num_shards=4)
    got = pack_chunks(sharded, "doc_id", "n_tokens", budget=4096).collect()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = con.sql(
        """
        WITH toks AS (
            SELECT doc_id, length(text)::BIGINT AS n_tokens,
                   CAST(('0x' || substr(md5(doc_id::VARCHAR || 'shard-v1'), 1, 8))::UBIGINT % 4 AS BIGINT) AS shard
            FROM documents
        ), cum AS (
            SELECT shard, doc_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0)::BIGINT AS pack_offset
            FROM toks
        )
        SELECT shard, doc_id, n_tokens, pack_offset,
               (pack_offset // 4096)::BIGINT AS pack_id
        FROM cum
        """
    ).fetchall()
    got_set = {tuple(r) for r in got}
    want_set = {tuple(r) for r in want}
    assert got_set == want_set


def _py_greedy(rows, budget):
    """Pure-Python first-fit oracle over (shard, doc_id, n_tokens)."""
    out = {}
    by_shard = {}
    for shard, doc_id, tok in rows:
        by_shard.setdefault(shard, []).append((doc_id, tok))
    for shard, items in by_shard.items():
        items.sort()
        seq, fill = 0, 0
        for doc_id, tok in items:
            if fill > 0 and fill + tok > budget:
                seq += 1
                fill = 0
            fill += tok
            out[(shard, doc_id)] = (seq, fill)
    return out


def test_pack_greedy_python_oracle(spark, docs):
    budget = 4096
    sharded = shard_by_hash(docs, "doc_id", num_shards=4)
    rows = [
        (r["shard"], r["doc_id"], r["n_tokens"])
        for r in sharded.select("shard", "doc_id", "n_tokens").collect()
    ]
    want = _py_greedy(rows, budget)
    got = pack_greedy(sharded, "doc_id", "n_tokens", budget=budget).collect()
    assert len(got) == len(rows)
    for r in got:
        assert (r["pack_seq"], r["pack_fill"]) == want[(r["shard"], r["doc_id"])]


def test_pack_greedy_budget_invariant(spark):
    # Packs never exceed the budget unless a single oversized doc owns
    # the pack outright.
    budget = 100
    df = spark.createDataFrame(
        [(0, i, t) for i, t in enumerate([40, 40, 40, 250, 10, 90, 30])],
        "shard long, doc_id long, n_tokens long",
    )
    got = pack_greedy(df, "doc_id", "n_tokens", budget=budget).collect()
    by_pack = {}
    for r in got:
        by_pack.setdefault(r["pack_seq"], []).append(r["n_tokens"])
    for toks in by_pack.values():
        assert sum(toks) <= budget or len(toks) == 1
