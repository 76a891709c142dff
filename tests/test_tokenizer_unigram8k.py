"""Unigram-LM apply at PRODUCTION vocab size (VERDICT r10 #5): the
8k-piece literal-map Catalyst fold and the arrow twin must stay
byte-identical — the contract that lets the deploy path (arrow, O(1)
dict probes) inherit the Catalyst path's oracle. 8k pieces is the
wordpiece_tokens_8k precedent; the micro-measured gap (literal-map
probes are vocab-size-LINEAR) is why production applies run arrow:
~10x at |V|=8k on the same docs (PROBES_r11 unigram8k)."""

import string

from updater_spark.operators.tokenizer import (
    unigram_tokenize,
    unigram_tokenize_arrow,
)


def _vocab_8k():
    """26 singles (coverage guarantee) + deterministic 2-5 char
    pieces to 8000 entries, LCG-generated, integer scaled lps."""
    vocab = [(c, -3_000_000) for c in string.ascii_lowercase]
    seen = set(string.ascii_lowercase)
    i = 0
    while len(vocab) < 8000:
        i += 1
        x = (i * 2654435761) % (1 << 32)
        ln = 2 + x % 4
        p = "".join(
            string.ascii_lowercase[(x >> (5 * j)) % 26] for j in range(ln)
        )
        if p not in seen:
            seen.add(p)
            vocab.append((p, -(8_000_000 + (x % 5_000_000))))
    return vocab


def test_unigram_8k_vocab_arrow_equals_catalyst(spark):
    vocab = _vocab_8k()
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(6)
    )
    key = lambda r: (
        r["doc_id"], r["pieces"], r["n_pieces"], r["lp_scaled"],
        r["n_truncated_words"],
    )
    cat = sorted(map(key, unigram_tokenize(docs, "text", vocab).collect()))
    arr = sorted(
        map(key, unigram_tokenize_arrow(docs, "text", vocab).collect())
    )
    assert cat == arr
    assert len(cat) == 6 and all(r[2] > 0 for r in cat)
