"""The r11 distinct-word memoization (`_memoized_apply`) must be
byte-identical to the original per-instance fold for every tokenizer
family and every edge class: NULL text, empty text, punctuation-only
text (zero words after normalization), overlong words (truncation
counter), repeated words, non-ASCII byte-level input, and CJK
pre-splitting. The memoized path is the registry default; the
`distinct_words=False` escape hatch IS the inherited plan, so this
test pins the optimization to the old semantics directly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from updater_spark.operators.tokenizer import (
    bpe_tokenize,
    unigram_tokenize,
    unigram_train,
    wordpiece_tokenize,
)

VOCAB = [
    "scan", "sca", "table", "tab", "data", "the", "fast", "row",
    "er", "or",
] + [chr(c) for c in range(ord("a"), ord("z") + 1)]
MERGES = [
    ("t", "h"), ("th", "e"), ("d", "a"), ("da", "t"), ("dat", "a"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
]
BYTE_MERGES = [("C3", "A9"), ("74", "68"), ("7468", "65"), ("64", "61")]

ROWS = [
    (1, "the data scan runs fast and the table merges rows"),
    (2, None),
    (3, ""),
    (4, "12345 !!!"),
    (5, "supercalifragilisticexpialidocious tiny a"),
    (6, "Valué strings with UPPER case and punct!?"),
    (7, "the the the scan scan"),
    (8, "abcdefghijklmnopqrstuvwxyz abc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def _assert_same(a, b):
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb


def test_wordpiece_memo_identical(docs):
    _assert_same(
        wordpiece_tokenize(
            docs, "text", VOCAB, max_word_len=16, distinct_words=False
        ),
        wordpiece_tokenize(
            docs, "text", VOCAB, max_word_len=16, distinct_words=True
        ),
    )


def test_bpe_memo_identical(docs):
    _assert_same(
        bpe_tokenize(
            docs, "text", MERGES, max_word_len=16, distinct_words=False
        ),
        bpe_tokenize(
            docs, "text", MERGES, max_word_len=16, distinct_words=True
        ),
    )


def test_bpe_bytes_memo_identical(docs):
    _assert_same(
        bpe_tokenize(
            docs, "text", BYTE_MERGES, max_word_len=16,
            byte_level=True, distinct_words=False,
        ),
        bpe_tokenize(
            docs, "text", BYTE_MERGES, max_word_len=16,
            byte_level=True, distinct_words=True,
        ),
    )


def test_bpe_bytes_cjk_memo_identical(docs):
    cjk = docs.withColumn(
        "text",
        F.when(
            F.col("text").isNotNull(),
            F.concat(F.lit("日本語テスト "), F.col("text")),
        ),
    )
    _assert_same(
        bpe_tokenize(
            cjk, "text", BYTE_MERGES, max_word_len=16,
            byte_level=True, cjk_split=True, distinct_words=False,
        ),
        bpe_tokenize(
            cjk, "text", BYTE_MERGES, max_word_len=16,
            byte_level=True, cjk_split=True, distinct_words=True,
        ),
    )


def test_unigram_memo_identical(docs):
    vocab_df = unigram_train(
        docs.filter(F.col("text").isNotNull()),
        "text",
        vocab_size=40,
        n_iters=2,
        max_piece_len=3,
        max_word_len=16,
    )
    vocab = [(r["piece"], r["logprob_scaled"]) for r in vocab_df.collect()]
    _assert_same(
        unigram_tokenize(
            docs, "text", vocab, max_word_len=16, max_piece_len=3,
            distinct_words=False,
        ),
        unigram_tokenize(
            docs, "text", vocab, max_word_len=16, max_piece_len=3,
            distinct_words=True,
        ),
    )


def test_memoized_plan_folds_once_per_distinct_word(docs):
    """The memoized plan must contain the reattach join (the fold
    sits on the DISTINCT side) and must NOT re-evaluate the text
    normalization chain after the explode — the CollapseProject trap
    that made the first cut of this optimization 6× SLOWER than the
    per-instance fold it replaced."""
    plan = (
        wordpiece_tokenize(docs, "text", VOCAB, max_word_len=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" in plan
    # one regexp_replace per Generate branch (probe + distinct), i.e.
    # per-document parsing only — never per word instance
    assert plan.count("regexp_replace") <= 2
