"""DsirIndex: incremental bucket-count model vs from-scratch rebuild."""

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.dsir import dsir_weights
from updater_spark.operators.dsir_index import DsirIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.fixture()
def corpora(spark):
    raw = _docs(
        spark,
        [
            (0, "the cat sat on the mat", "en"),
            (1, "the dog ran in the park", "en"),
            (2, "le chat est sur le tapis", "fr"),
            (3, "der hund lief im park", "de"),
            (4, "the fast cat ran fast", "en"),
        ],
    )
    return raw, raw.filter(F.col("lang") == "en")


def test_incremental_equals_rebuild(spark, tmp_store, corpora):
    raw, target = corpora
    idx = DsirIndex(tmp_store, "m", hash_bits=8)
    idx.bootstrap(raw, target)

    # epoch: doc 1 changes text, doc 3 deleted, doc 5 added (en)
    old1 = raw.filter("doc_id = 1")
    new1 = _docs(spark, [(1, "the dog slept all day", "en")])
    del3 = raw.filter("doc_id = 3")
    add5 = _docs(spark, [(5, "the bird flew over the park", "en")])

    idx.update(
        raw_added=new1.unionByName(add5),
        raw_removed=old1.unionByName(del3),
        target_added=new1.unionByName(add5),
        target_removed=old1,  # doc 3 was never in the target (de)
    )

    final_raw = _docs(
        spark,
        [
            (0, "the cat sat on the mat", "en"),
            (1, "the dog slept all day", "en"),
            (2, "le chat est sur le tapis", "fr"),
            (4, "the fast cat ran fast", "en"),
            (5, "the bird flew over the park", "en"),
        ],
    )
    rebuilt = DsirIndex(tmp_store, "m2", hash_bits=8)
    rebuilt.bootstrap(final_raw, final_raw.filter(F.col("lang") == "en"))

    inc = {r["bucket"]: (r["t_cnt"], r["r_cnt"]) for r in idx.counts().collect()}
    scratch = {
        r["bucket"]: (r["t_cnt"], r["r_cnt"]) for r in rebuilt.counts().collect()
    }
    assert inc == scratch

    # and the weights under the maintained model equal the one-shot op
    w_idx = {
        r["doc_id"]: r["log_weight"]
        for r in idx.weights(final_raw).collect()
    }
    w_oneshot = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(
            final_raw,
            final_raw.filter(F.col("lang") == "en"),
            hash_bits=8,
        ).collect()
    }
    assert w_idx == w_oneshot


def test_negative_count_guard(spark, tmp_store, corpora):
    raw, target = corpora
    idx = DsirIndex(tmp_store, "g", hash_bits=8)
    idx.bootstrap(raw, target)
    phantom = _docs(spark, [(99, "words never counted before", "en")])
    with pytest.raises(ValueError, match="negative"):
        idx.update(raw_removed=phantom)


def test_param_identity_guard(spark, tmp_store, corpora):
    raw, target = corpora
    DsirIndex(tmp_store, "p", hash_bits=8).bootstrap(raw, target)
    other = DsirIndex(tmp_store, "p", hash_bits=10)
    with pytest.raises(ValueError, match="stored parameters"):
        other.update(raw_added=raw.limit(1))


def test_update_requires_bootstrap(spark, tmp_store, corpora):
    raw, _ = corpora
    idx = DsirIndex(tmp_store, "nope", hash_bits=8)
    with pytest.raises(ValueError, match="bootstrap"):
        idx.update(raw_added=raw)
