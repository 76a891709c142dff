"""Greedy longest-match (WordPiece-style) subword tokenizer as a
pure-Catalyst fold — no UDF, no shuffle, exact SQL oracle.

Why: token accounting is the unit of record for LLM training data,
and the cheap proxies in text.py (whitespace + a BPE-ish regex
count) don't expose the tokenizer SEMANTICS — longest-match-first
segmentation against a vocabulary, the WordPiece/greedy half of how
production tokenizers behave (Wu et al. 2016; the BPE-apply loop in
Sennrich et al. 2016 is the merge-ordered sibling). The reference
engine has no text surface; this extends text.py.

Spark shape: per word, ``aggregate(sequence(1, max_word_len), state,
step)`` — a RUNTIME fold (the lambda is evaluated per element of the
sequence value, NOT unrolled into the expression tree), where each
step finds the longest vocabulary piece matching at the cursor via
``array_max`` over a filtered literal piece array (struct (len,
piece) ordering = longest first, lexicographically-largest
tie-break). Cost: O(max_word_len × |vocab|) substring compares per
word at scan speed, zero Python. The vocabulary is a broadcast-free
LITERAL (tokenizer vocabularies are KBs, versioned with the job, and
embedding them keeps the whole operator whole-stage-codegen'd — and
lets the DuckDB oracle replay segmentation exactly, via a recursive
CTE with an identical padded-length arg_max tie-break).

Contract (both engines, pinned by the driver oracle):
- text is normalized to ``[a-z ]`` first, so the single-char pieces
  the constructor REQUIRES guarantee total coverage — the greedy
  loop can never strand mid-word;
- words are truncated to ``max_word_len`` chars (the Spark fold's
  step bound; the SQL recursion is unbounded, so the truncation is
  applied to the data on both sides, not to one engine's loop).
"""

from __future__ import annotations

import string

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["wordpiece_tokenize"]


def _tok_word(w: Column, vocab: list[str], max_word_len: int) -> Column:
    """array<string> of pieces for one (normalized, truncated) word."""
    pieces = F.array(
        *[
            F.struct(
                F.lit(len(p)).alias("l"),
                F.lit(p).alias("p"),
            )
            for p in vocab
        ]
    )

    def step(acc, _i):
        matches = F.filter(
            pieces,
            lambda m: w.substr(acc["pos"], m["l"]) == m["p"],
        )
        best = F.array_max(matches)
        return F.when(acc["pos"] > F.length(w), acc).otherwise(
            F.struct(
                (acc["pos"] + best["l"]).alias("pos"),
                F.concat(acc["out"], F.array(best["p"])).alias("out"),
            )
        )

    init = F.struct(
        F.lit(1).alias("pos"),
        F.array().cast("array<string>").alias("out"),
    )
    # every step consumes >= 1 char, so length(w) iterations always
    # finish the word — folding sequence(1, 32) regardless wastes
    # ~3/4 of the steps on the pos-exhausted WHEN branch (measured
    # 4.6s -> ~2s on the sf0.01 corpus)
    return F.aggregate(
        F.sequence(F.lit(1), F.least(F.length(w), F.lit(max_word_len))),
        init,
        step,
    )["out"]


def wordpiece_tokenize(
    df: DataFrame,
    text_col: str,
    vocab: list[str],
    id_col: str = "doc_id",
    max_word_len: int = 32,
) -> DataFrame:
    """Per document: ``pieces`` (words ' '-joined, pieces '|'-joined
    within a word) and ``n_pieces``.

    ``vocab`` must include every single letter a–z (total-coverage
    requirement above) and contain no duplicates."""
    missing = [c for c in string.ascii_lowercase if c not in vocab]
    if missing:
        raise ValueError(f"vocab must cover a-z; missing {missing}")
    if len(set(vocab)) != len(vocab):
        raise ValueError("vocab contains duplicates")

    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
    words = F.filter(
        F.transform(
            F.split(F.trim(norm), " +"),
            lambda x: F.substring(x, 1, max_word_len),
        ),
        lambda x: F.length(x) > 0,
    )
    # materialize the per-word piece arrays ONCE: referencing the
    # expression from two outputs would re-inline the whole fold per
    # reference (the dedup.tokenize CollapseProject lesson)
    out = df.withColumn("_words", words).withColumn(
        "_wp",
        F.transform(
            F.col("_words"),
            lambda x: _tok_word(x, vocab, max_word_len),
        ),
    )
    return out.select(
        F.col(id_col),
        F.array_join(
            F.transform(F.col("_wp"), lambda a: F.array_join(a, "|")), " "
        ).alias("pieces"),
        F.aggregate(
            F.transform(F.col("_wp"), F.size),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("n_pieces"),
    )
