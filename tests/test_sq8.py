"""SQ8 scalar quantization: error bound, code range, recall vs exact."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.similarity import (
    SQModel,
    cosine_topk,
    sq_assign,
    sq_topk,
    sq_train,
)


def _load_emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_sq_train_minmax_exact(spark):
    df = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[0.0, -2.0, 5.0]),
            Row(vec_id=2, embedding=[1.0, 3.0, 5.0]),
            Row(vec_id=3, embedding=[0.5, 0.0, 5.0]),
        ]
    )
    m = sq_train(df)
    assert m.mins == [0.0, -2.0, 5.0]
    assert m.maxs == [1.0, 3.0, 5.0]
    assert m.dim == 3


def test_sq_codes_range_and_reconstruction_bound(spark, sf_dir):
    emb = _load_emb(spark, sf_dir)
    m = sq_train(emb)
    codes = sq_assign(emb, m)
    joined = emb.join(codes, "vec_id").select(
        "vec_id", "embedding", "sq_code"
    )
    rows = joined.collect()
    assert rows
    for r in rows:
        assert all(0 <= c <= 255 for c in r["sq_code"])
        for i, (x, c) in enumerate(zip(r["embedding"], r["sq_code"])):
            span = m.maxs[i] - m.mins[i]
            xh = m.mins[i] + c * (span / 255.0) if span > 0 else m.mins[i]
            # half-step quantization error bound (+eps for float32 input)
            assert abs(xh - x) <= span / 255.0 / 2 + 1e-5, (r["vec_id"], i)


def test_sq_constant_dim_codes_zero(spark):
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[1.0, 7.0]), Row(vec_id=2, embedding=[2.0, 7.0])]
    )
    m = sq_train(df)
    codes = {r["vec_id"]: r["sq_code"] for r in sq_assign(df, m).collect()}
    assert codes[1][1] == 0 and codes[2][1] == 0
    # and the dequantized constant dim is exact → sim on dim-2 vectors ok
    got = sq_topk(df, sq_assign(df, m), m, k=1).collect()
    assert len(got) == 2


def test_sq_topk_recall_vs_exact(spark, sf_dir):
    emb = _load_emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    exact = cosine_topk(emb, queries, k=5)
    m = sq_train(emb)
    approx = sq_topk(queries, sq_assign(emb, m), m, k=5)

    def tops(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    e, a = tops(exact), tops(approx)
    assert set(e) == set(a)
    hits = sum(len(e[q] & a[q]) for q in e)
    total = sum(len(e[q]) for q in e)
    recall = hits / total
    # 8-bit/dim on 64-dim embeddings: near-lossless in practice
    assert recall >= 0.9, recall


def test_sq_topk_arrow_matches_catalyst(spark, sf_dir):
    from updater_spark.operators.similarity import sq_topk_arrow

    emb = _load_emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    m = sq_train(emb)
    codes = sq_assign(emb, m)

    def rows(df):
        return {
            (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
            for r in df.collect()
        }

    cat = rows(sq_topk(queries, codes, m, k=5))
    arr = rows(sq_topk_arrow(queries, codes, m, k=5))
    assert cat == arr


def test_sq_model_validation():
    with pytest.raises(ValueError, match="mismatch"):
        SQModel([0.0], [1.0, 2.0])
