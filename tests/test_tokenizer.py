"""Greedy longest-match tokenizer vs a Python reference: randomized
parity, tie-break, truncation, normalization, vocab validation."""

import random
import string

import pytest
from pyspark.sql import Row

from updater_spark.operators.tokenizer import wordpiece_tokenize

VOCAB = ["scan", "sca", "ring", "ri", "ng", "abc", "ab"] + list(
    string.ascii_lowercase
)


def _py_tok(text, vocab, max_word_len=32):
    norm = "".join(c for c in text.lower() if c in string.ascii_lowercase + " ")
    words = [w[:max_word_len] for w in norm.split() if w]
    out, n = [], 0
    for w in words:
        pos, pieces = 0, []
        while pos < len(w):
            best = max(
                (p for p in vocab if w.startswith(p, pos)),
                key=lambda p: (len(p), p),
            )
            pieces.append(best)
            pos += len(best)
        out.append("|".join(pieces))
        n += len(pieces)
    return " ".join(out), n


def _run(spark, texts, vocab=VOCAB, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    return {
        r.doc_id: (r.pieces, r.n_pieces)
        for r in wordpiece_tokenize(df, "text", vocab, **kw).collect()
    }


def test_longest_match_and_tiebreak(spark):
    got = _run(spark, ["scan ring", "scaring", "abcd"])
    assert got[0] == ("scan ring", 2)
    # "scaring": "scan" does NOT prefix it — longest match at pos 0
    # is "sca" (beats "sc"? not in vocab; beats single "s"), then
    # "ring" beats "ri"
    assert got[1] == ("sca|ring", 2)
    assert got[2] == ("abc|d", 2)


def test_matches_python_reference_randomized(spark):
    rng = random.Random(5)
    texts = [
        " ".join(
            "".join(rng.choice("abcginrs") for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(1, 8))
        )
        for _ in range(60)
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _py_tok(t, VOCAB), t


def test_normalization_truncation_and_empty(spark):
    long_word = "a" * 50
    got = _run(spark, ["He7llo, W@rld!", long_word, "123 !!!", ""])
    assert got[0] == _py_tok("He7llo, W@rld!", VOCAB)
    assert got[1] == ("|".join(["a"] * 32), 32)  # truncated to 32
    assert got[2] == ("", 0)
    assert got[3] == ("", 0)


def test_vocab_validation(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError, match="cover a-z"):
        wordpiece_tokenize(df, "text", ["ab", "b"])
    with pytest.raises(ValueError, match="duplicates"):
        wordpiece_tokenize(
            df, "text", list(string.ascii_lowercase) + ["a"]
        )
