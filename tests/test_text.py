"""Text-analysis operators vs Python oracles."""

from pyspark.sql import Row

from updater_spark.operators.text import (
    STOPWORDS_EN,
    doc_fingerprint,
    lang_id,
    quality_score,
    text_stats,
    token_counts,
)

DOCS = [
    Row(doc_id=1, text="the quick brown fox and the lazy dog in a field"),
    Row(doc_id=2, text="le chat et le chien est dans la maison des amis"),
    Row(doc_id=3, text="x y"),
]


def test_text_stats_oracle(spark):
    df = spark.createDataFrame(DOCS)
    got = {r["doc_id"]: r for r in text_stats(df).collect()}
    for d in DOCS:
        toks = d.text.split()
        r = got[d.doc_id]
        assert r["n_words"] == len(toks)
        assert r["n_uniq_words"] == len(set(toks))
        sw = sum(1 for t in toks if t in STOPWORDS_EN)
        assert abs(r["stopword_ratio"] - round(sw / len(toks), 6)) < 1e-9
        mean_len = round(sum(len(t) for t in toks) / len(toks), 6)
        assert abs(r["mean_word_len"] - mean_len) < 1e-9


def test_lang_id(spark):
    df = spark.createDataFrame(DOCS)
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "en"  # no hits anywhere → deterministic tie-break


def test_token_counts(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world42 x-y!")])
    r = token_counts(df).collect()[0]
    assert r["n_ws_tokens"] == 3
    # hello | world | 42 | x | - | y | !
    assert r["n_bpe_tokens"] == 7


def test_doc_fingerprint_rolling_oracle(spark):
    df = spark.createDataFrame(DOCS)
    got = {r["doc_id"]: r for r in doc_fingerprint(df).collect()}
    import hashlib

    for d in DOCS:
        norm = " ".join(d.text.split())
        acc = 0
        for ch in norm:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        assert got[d.doc_id]["rolling_fp"] == acc
        assert got[d.doc_id]["md5_fp"] == hashlib.md5(norm.encode()).hexdigest()


def test_quality_score_range(spark):
    df = spark.createDataFrame(DOCS)
    scores = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
    assert all(0 <= v <= 1 for v in scores.values())
    assert scores[1] > scores[3]  # tiny doc penalized
