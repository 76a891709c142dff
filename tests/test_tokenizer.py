"""Greedy longest-match tokenizer vs a Python reference: randomized
parity, tie-break, truncation, normalization, vocab validation."""

import random
import string

import pytest
from pyspark.sql import Row

from updater_spark.operators.tokenizer import (
    bpe_tokenize,
    bpe_tokenize_arrow,
    synthetic_vocab,
    wordpiece_tokenize,
    wordpiece_tokenize_arrow,
)

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
    with pytest.raises(ValueError, match="cover a-z"):
        wordpiece_tokenize_arrow(df, "text", ["ab", "b"])


def test_arrow_twin_matches_catalyst_demo_vocab(spark):
    rng = random.Random(11)
    texts = [
        " ".join(
            "".join(rng.choice("abcginrs") for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(1, 8))
        )
        for _ in range(40)
    ] + ["He7llo, W@rld!", "a" * 50, "123 !!!", "", None]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    cat = sorted(
        tuple(r)
        for r in wordpiece_tokenize(df, "text", VOCAB).collect()
    )
    arr = sorted(
        tuple(r)
        for r in wordpiece_tokenize_arrow(df, "text", VOCAB).collect()
    )
    assert cat == arr
    # NULL text propagates as (NULL, NULL) on BOTH paths — not a
    # coerced empty document
    null_rows = [t for t in cat if t[1] is None]
    assert len(null_rows) == 1 and null_rows[0][2] is None


def test_arrow_twin_matches_catalyst_8k_vocab(spark):
    """The r6 verdict's vocab-size ceiling: both paths must agree at a
    production-sized (8k-piece) vocabulary — the bucketed Catalyst
    fold stays correct and the arrow twin is the throughput path."""
    vocab = synthetic_vocab(8192)
    assert len(vocab) == 8192 and len(set(vocab)) == 8192
    rng = random.Random(17)
    texts = [
        " ".join(
            "".join(
                rng.choice(string.ascii_lowercase)
                for _ in range(rng.randint(1, 14))
            )
            for _ in range(rng.randint(1, 6))
        )
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    cat = sorted(
        tuple(r) for r in wordpiece_tokenize(df, "text", vocab).collect()
    )
    arr = sorted(
        tuple(r)
        for r in wordpiece_tokenize_arrow(df, "text", vocab).collect()
    )
    assert cat == arr
    # and both match the Python reference on a few docs
    for i in (0, 7, 29):
        assert (texts[i] and cat[i][1:3] == _py_tok(texts[i], vocab)) or not texts[i]


# ---------------------------------------------------------------------------
# BPE apply (merge-ordered)
# ---------------------------------------------------------------------------

MERGES = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("s", "t"), ("f", "a"), ("fa", "st"), ("e", "r"),
    ("o", "r"), ("or", "d"), ("ord", "er"),
]


def _py_bpe_classic(text, merges, max_word_len=32):
    """Classic Sennrich apply: replace ALL occurrences of the
    best-ranked present pair, repeat. On a well-formed merge table
    (composite pieces only appear in later merges) this equals the
    operator's iterated lowest-rank-leftmost single merge."""
    rank = {m: r for r, m in enumerate(merges)}
    norm = "".join(c for c in text.lower() if c in string.ascii_lowercase + " ")
    out, n = [], 0
    for w in norm.split():
        ps = list(w[:max_word_len])
        while len(ps) > 1:
            pairs = {(ps[i], ps[i + 1]) for i in range(len(ps) - 1)}
            ranked = [p for p in pairs if p in rank]
            if not ranked:
                break
            a, b = min(ranked, key=lambda p: rank[p])
            i, merged = 0, []
            while i < len(ps):
                if i < len(ps) - 1 and ps[i] == a and ps[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(ps[i])
                    i += 1
            ps = merged
        out.append("|".join(ps))
        n += len(ps)
    return " ".join(out), n


def _run_bpe(spark, texts, merges=MERGES, arrow=False, **kw):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    fn = bpe_tokenize_arrow if arrow else bpe_tokenize
    return {
        r.doc_id: (r.pieces, r.n_pieces)
        for r in fn(df, "text", merges, **kw).collect()
    }


def test_tokenizer_fertility_oracle(spark):
    from updater_spark.operators.tokenizer import tokenizer_fertility

    docs = [
        Row(doc_id=0, lang="en", text="scan the ring"),
        Row(doc_id=1, lang="en", text="abc ring ring!"),
        Row(doc_id=2, lang="fr", text="zz qq"),
        Row(doc_id=3, lang="de", text="123 ..."),  # no letters at all
    ]
    df = spark.createDataFrame(docs)
    tok = wordpiece_tokenize(df, "text", VOCAB)
    got = {
        r["lang"]: r
        for r in tokenizer_fertility(df, tok, ("lang",)).collect()
    }
    # python oracle from the same _py_tok reference
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        norm = "".join(
            c for c in d.text.lower() if c in string.ascii_lowercase + " "
        )
        words = [w for w in norm.split() if w]
        _, n_pieces = _py_tok(d.text, VOCAB)
        a = agg[d.lang]
        a[0] += 1
        a[1] += len(words)
        a[2] += n_pieces
        a[3] += sum(len(w) for w in words)
    for lang, (nd, nw, np_, nc) in agg.items():
        r = got[lang]
        assert (r["n_docs"], r["n_words"], r["n_pieces"], r["n_chars"]) == (
            nd, nw, np_, nc,
        ), lang
        if nw:
            assert r["fertility"] == round(np_ / nw, 6)
            assert r["chars_per_piece"] == round(nc / np_, 6)
        else:
            assert r["fertility"] is None
            assert r["chars_per_piece"] is None
    # sanity: 'zz qq' shatters to characters → fertility 2.0 for fr
    assert got["fr"]["fertility"] == 2.0


def test_bpe_merge_order_examples(spark):
    got = _run_bpe(spark, ["table", "fast order", "xyz", ""])
    # merges chain: t+a, ta+b, tab+l, tabl+e
    assert got[0] == ("table", 1)
    # fast via f+a then fa+st (st from s+t); order via or+d then ord+er
    assert got[1] == ("fast order", 2)
    assert got[2] == ("x|y|z", 3)  # no merge applies
    assert got[3] == ("", 0)


def test_bpe_rank_beats_length(spark):
    """BPE is merge-ORDERED, not longest-match: with rank(a,b) <
    rank(b,c), 'abc' merges to [ab, c] even though 'bc' is also a
    learned pair — the semantic split from wordpiece."""
    got = _run_bpe(spark, ["abc"], merges=[("a", "b"), ("b", "c")])
    assert got[0] == ("ab|c", 2)
    got2 = _run_bpe(spark, ["abc"], merges=[("b", "c"), ("a", "b")])
    assert got2[0] == ("a|bc", 2)


def test_bpe_matches_classic_apply_randomized(spark):
    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abdefortsl") for _ in range(rng.randint(1, 14)))
            for _ in range(rng.randint(1, 8))
        )
        for _ in range(60)
    ] + ["T@ble! 123 order", "a" * 50]
    got = _run_bpe(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == _py_bpe_classic(t, MERGES), t


def test_bpe_arrow_twin_matches_catalyst(spark):
    rng = random.Random(13)
    texts = [
        " ".join(
            "".join(rng.choice("abdefortsl") for _ in range(rng.randint(1, 14)))
            for _ in range(rng.randint(1, 6))
        )
        for _ in range(40)
    ] + ["", "order fast table", None]
    cat = _run_bpe(spark, texts)
    arr = _run_bpe(spark, texts, arrow=True)
    assert cat == arr
    assert cat[len(texts) - 1] == (None, None)  # NULL text propagates


def test_bpe_truncation(spark):
    # 50 a's truncate to 32 before merging; (a,a) merges pairwise
    got = _run_bpe(spark, ["a" * 50], merges=[("a", "a")])
    # leftmost (a,a) repeatedly: aa aa ... -> but merged piece 'aa'
    # never re-merges ('aa aa' not in merges), so 16 'aa' pieces
    assert got[0] == ("|".join(["aa"] * 16), 16)


def test_bpe_validation(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError, match="non-empty"):
        bpe_tokenize(df, "text", [])
    with pytest.raises(ValueError, match="duplicate"):
        bpe_tokenize(df, "text", [("a", "b"), ("a", "b")])
    with pytest.raises(ValueError, match="empty merge operand"):
        bpe_tokenize_arrow(df, "text", [("a", "")])


def test_wordpiece_vocab_counts_and_ranking(spark):
    """Piece counting matches a hand-computed expansion; ranking is
    (count DESC, piece ASC) with a deterministic cut."""
    from collections import Counter

    from updater_spark.operators.tokenizer import wordpiece_vocab

    texts = ["aba ab!", "Ba  aba", ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    def py_pieces(text, max_piece=6, max_word=16):
        import re

        norm = re.sub("[^a-z ]", "", text.lower())
        out = []
        for w in [x for x in re.split(" +", norm.strip()) if x]:
            w = w[:max_word]
            for i in range(len(w)):
                for j in range(1, min(max_piece, len(w) - i) + 1):
                    out.append(
                        w[i : i + j] if i == 0 else "##" + w[i : i + j]
                    )
        return out

    want = Counter()
    for t in texts:
        want.update(py_pieces(t))

    got = {
        r["piece"]: r["cnt"]
        for r in wordpiece_vocab(df, "text", vocab_size=10_000).collect()
    }
    assert got == dict(want)

    # the cut keeps the top-V of the (cnt DESC, piece ASC) total order
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    top3 = wordpiece_vocab(df, "text", vocab_size=3).collect()
    assert [(r["piece"], r["cnt"]) for r in sorted(
        top3, key=lambda r: (-r["cnt"], r["piece"])
    )] == ranked[:3]

    # min_count prunes singletons; built vocab feeds the tokenizer
    got_mc = {
        r["piece"]
        for r in wordpiece_vocab(
            df, "text", vocab_size=10_000, min_count=2
        ).collect()
    }
    assert got_mc == {p for p, c in want.items() if c >= 2}


def test_wordpiece_vocab_respects_length_caps(spark):
    from updater_spark.operators.tokenizer import wordpiece_vocab

    df = spark.createDataFrame(
        [(1, "abcdefgh")], "doc_id long, text string"
    )
    got = {
        r["piece"]
        for r in wordpiece_vocab(
            df, "text", vocab_size=10_000, max_piece_len=2, max_word_len=3
        ).collect()
    }
    # word truncated to 'abc'; pieces of len<=2 only
    assert got == {"a", "ab", "##b", "##bc", "##c"}


def _py_bpe_train(texts, n_merges, max_word_len=16):
    """Pure-Python Sennrich trainer: word-freq table, chars, iterate
    (count pairs weighted by freq, merge best with (cnt DESC, a, b)
    tie-break, leftmost non-overlapping apply)."""
    import re
    from collections import Counter

    wf = Counter()
    for t in texts:
        norm = re.sub("[^a-z ]", "", t.lower())
        for w in [x for x in re.split(" +", norm.strip()) if x]:
            wf[w[:max_word_len]] += 1
    state = {w: [c for c in w] for w in wf}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, toks in state.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += wf[w]
        if not pairs:
            break
        (a, b), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b))
        for w, toks in state.items():
            out = []
            for t in toks:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            state[w] = out
    return merges


def test_bpe_train_matches_reference_trainer(spark):
    from updater_spark.operators.tokenizer import bpe_train

    texts = [
        "the cat sat on the mat",
        "the cats eat the rats",
        "a tattered hat on that cat",
        "",
        "THE CAT!!",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["a"], r["b"])
        for r in sorted(
            bpe_train(df, "text", n_merges=12).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]
    want = _py_bpe_train(texts, 12)
    assert got == want


def test_bpe_train_early_stop_and_feeds_apply(spark):
    from updater_spark.operators.tokenizer import bpe_tokenize, bpe_train

    # tiny corpus: merges exhaust before n_merges
    texts = ["ab ab", "ab"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = sorted(
        bpe_train(df, "text", n_merges=10).collect(),
        key=lambda r: r["merge_rank"],
    )
    want = _py_bpe_train(texts, 10)
    assert [(r["merge_rank"], r["a"], r["b"]) for r in rows] == want
    assert len(rows) < 10  # early-stopped: 'ab' fully merges in 1 step
    # the learned merges feed straight into the apply operator
    merges = [(r["a"], r["b"]) for r in rows]
    out = bpe_tokenize(df, "text", merges).collect()
    assert all(r["n_pieces"] >= 1 for r in out)


def test_bpe_train_tiebreak_is_total(spark):
    from updater_spark.operators.tokenizer import bpe_train

    # 'xy' and 'yx' pairs tie at count 2 -> (a ASC, b ASC) picks (x,y)
    texts = ["xy xy yx yx"]
    df = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    rows = sorted(
        bpe_train(df, "text", n_merges=2).collect(),
        key=lambda r: r["merge_rank"],
    )
    assert (rows[0]["a"], rows[0]["b"]) == ("x", "y")
    assert [(r["merge_rank"], r["a"], r["b"]) for r in rows] == _py_bpe_train(
        texts, 2
    )


def test_bpe_byte_level_unk_free_and_twins_match(spark):
    from updater_spark.operators.tokenizer import (
        bpe_tokenize,
        bpe_tokenize_arrow,
    )

    merges = [("C3", "A9"), ("74", "68"), ("7468", "65")]
    rows = [
        (1, "the Valué thé"),       # case kept, é bytes fuse to C3A9
        (2, "日本語 mixed текст"),   # 3- and 2-byte chars, zero UNKs
        (3, "  tabs\tand\nnewlines "),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cat = {
        r["doc_id"]: (r["pieces"], r["n_pieces"])
        for r in bpe_tokenize(
            df, "text", merges, byte_level=True
        ).collect()
    }
    arw = {
        r["doc_id"]: (r["pieces"], r["n_pieces"])
        for r in bpe_tokenize_arrow(
            df, "text", merges, byte_level=True
        ).collect()
    }
    assert cat == arw
    # UNK-free: every symbol is a hex pair or a merge of hex pairs —
    # nothing drops. "the" fully merges; é's two bytes fuse; case is
    # preserved (V stays 56, unmerged)
    assert cat[1] == ("746865 56|61|6C|75|C3A9 7468|C3A9", 8)
    # 3-byte CJK chars: 9 bytes for 3 chars, all present as symbols
    pieces2 = cat[2][0].split(" ")
    assert pieces2[0].count("|") == 8  # 9 hex-pair symbols
    assert cat[4] == (None, None)
    assert cat[5] == ("", 0)


def test_bpe_byte_level_roundtrips_bytes(spark):
    from updater_spark.operators.tokenizer import bpe_tokenize

    # lossless at the byte level: concatenating the hex symbols of
    # each word re-encodes the word exactly (the UNK-free property
    # stated as a round trip)
    merges = [("61", "62")]
    words = ["abc", "ÅÖ", "混合mix", "x"]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["pieces"] for r in bpe_tokenize(
        df, "text", merges, byte_level=True
    ).collect()}
    for i, w in enumerate(words):
        hx = out[i].replace("|", "")
        assert bytes.fromhex(hx).decode("utf-8") == w


def test_bpe_train_byte_level_learns_and_applies(spark):
    from updater_spark.operators.tokenizer import bpe_train, bpe_tokenize

    # tiny corpus where the byte pair for "ab" dominates; é appears
    # often enough that its two UTF-8 bytes merge too
    rows = [(i, "abab abé abab") for i in range(5)] + [(99, "xy")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (r["a"], r["b"])
        for r in bpe_train(
            df, "text", n_merges=4, byte_level=True
        ).orderBy("merge_rank").collect()
    ]
    # first merge must be the dominant (61, 62) = "ab"
    assert merges[0] == ("61", "62")
    # é's two bytes end up fused into one learned symbol — via the
    # progressive chain ('6162','C3') then ('6162C3','A9'), not a
    # standalone ('C3','A9'): C3 always follows the already-merged
    # 'ab' here, so the chained pair outcounts the bare one
    assert any("C3A9" in a + b for a, b in merges)
    # learned merges feed straight into the byte-level apply
    out = bpe_tokenize(
        df.limit(1), "text", merges, byte_level=True
    ).collect()[0]
    # "abab" = two fused "ab" symbols after merges
    first_word = out["pieces"].split(" ")[0]
    assert first_word.count("6162") == 2


def test_n_truncated_words_counts_the_cliff(spark):
    """VERDICT r9 #2: the max_word_len truncation must be COUNTED —
    a spaceless doc silently losing all but 32 chars is the exact
    failure mode this column exposes."""
    from updater_spark.operators.tokenizer import (
        bpe_tokenize,
        bpe_tokenize_arrow,
    )

    rows = [
        (0, "short words only here"),
        (1, "x" * 100),                      # one giant spaceless word
        (2, "ok " + "y" * 40 + " " + "z" * 50),  # two over the bound
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in (bpe_tokenize, bpe_tokenize_arrow):
        out = {
            r["doc_id"]: r
            for r in fn(
                df, "text", [("a", "b")], max_word_len=32
            ).collect()
        }
        assert out[0]["n_truncated_words"] == 0
        assert out[1]["n_truncated_words"] == 1
        assert out[1]["n_pieces"] == 32  # the cliff, now visible
        assert out[2]["n_truncated_words"] == 2
        assert out[3]["n_truncated_words"] is None  # NULL propagates


def test_cjk_split_byte_level(spark):
    """Script-aware split: each CJK codepoint becomes its own word,
    so a spaceless CJK doc no longer truncates to its first 32
    chars; Catalyst and Arrow agree exactly."""
    from updater_spark.operators.tokenizer import (
        bpe_tokenize,
        bpe_tokenize_arrow,
    )

    text = "日本語のテキスト" * 10  # 80 spaceless codepoints
    df = spark.createDataFrame(
        [(0, text), (1, "latin stays whole 日本 mixed")],
        "doc_id long, text string",
    )
    merges = [("E6", "97")]
    cat = {
        r["doc_id"]: r
        for r in bpe_tokenize(
            df, "text", merges, byte_level=True, cjk_split=True
        ).collect()
    }
    arr = {
        r["doc_id"]: r
        for r in bpe_tokenize_arrow(
            df, "text", merges, byte_level=True, cjk_split=True
        ).collect()
    }
    assert cat == arr
    # every one of the 80 codepoints survives as its own word
    assert cat[0]["n_truncated_words"] == 0
    words = cat[0]["pieces"].split(" ")
    assert len(words) == 80
    # round-trip: each word's hex bytes decode back to one codepoint
    decoded = "".join(
        bytes.fromhex(w.replace("|", "")).decode("utf-8") for w in words
    )
    assert decoded == text
    # mixed doc: latin words intact, CJK chars separated
    w1 = [
        bytes.fromhex(w.replace("|", "")).decode("utf-8")
        for w in cat[1]["pieces"].split(" ")
    ]
    assert w1 == ["latin", "stays", "whole", "日", "本", "mixed"]
    # WITHOUT the split, the same doc is one truncated word
    legacy = bpe_tokenize(
        df.filter("doc_id = 0"), "text", merges, byte_level=True
    ).collect()[0]
    assert legacy["n_truncated_words"] == 1


def test_bpe_train_cjk_split_matches_apply_boundary(spark):
    from updater_spark.operators.tokenizer import bpe_train

    df = spark.createDataFrame(
        [(0, "日本日本日本 abab")], "doc_id long, text string"
    )
    merges = [
        (r["a"], r["b"])
        for r in bpe_train(
            df, "text", n_merges=2, byte_level=True, cjk_split=True
        ).orderBy("merge_rank").collect()
    ]
    # with the per-char split, 日 and 本 are separate words; the four
    # within-codepoint byte pairs tie at count 3 and the total
    # (count DESC, a ASC, b ASC) order picks ('97','A5') — 日's tail
    assert merges[0] == ("97", "A5")
    assert len(merges) == 2


# ---------------------------------------------------------------------------
# Unigram LM (SentencePiece family)
# ---------------------------------------------------------------------------


def test_unigram_train_and_roundtrip(spark):
    from updater_spark.operators.tokenizer import (
        unigram_tokenize,
        unigram_tokenize_arrow,
        unigram_train,
    )

    rows = [(i, "the cat sat on the mat the cat") for i in range(6)] + [
        (9, "zebra quilt 123 !!"),
        (10, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab_df = unigram_train(
        df, "text", vocab_size=30, n_iters=2, max_piece_len=3
    )
    vrows = vocab_df.collect()
    vocab = [(r["piece"], r["logprob_scaled"]) for r in vrows]
    pieces = {p for p, _ in vocab}
    # coverage: all a-z present even though the corpus lacks most
    import string as _s

    assert set(_s.ascii_lowercase) <= pieces
    # log-probs are negative integers; smoothed probs sum to ~1
    import math

    assert all(isinstance(lp, int) and lp < 0 for _, lp in vocab)
    assert abs(sum(math.exp(lp / 1e6) for _, lp in vocab) - 1.0) < 0.01
    # dominant corpus words survive EM as whole or near-whole pieces
    assert "the" in pieces or "th" in pieces

    out = {
        r["doc_id"]: r for r in unigram_tokenize(df, "text", vocab).collect()
    }
    arr = {
        r["doc_id"]: r
        for r in unigram_tokenize_arrow(df, "text", vocab).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in arr.items()
    }
    # round-trip: pieces concatenate back to the normalized words
    joined = out[0]["pieces"]
    words = ["".join(w.split("|")) for w in joined.split(" ")]
    assert words == "the cat sat on the mat the cat".split()
    # lp is the exact integer sum of the chosen pieces' log-probs
    lp_of = dict(vocab)
    manual = sum(
        lp_of[p] for w in out[0]["pieces"].split(" ") for p in w.split("|")
    )
    assert out[0]["lp_scaled"] == manual
    # NULL text propagates
    assert out[10]["pieces"] is None and out[10]["lp_scaled"] is None


def test_unigram_viterbi_prefers_high_prob_piece(spark):
    """Viterbi picks the MAX-probability segmentation, not greedy
    longest-match: with lp(ab)+lp(c) > lp(abc), 'abc' splits."""
    from updater_spark.operators.tokenizer import unigram_tokenize
    import string as _s

    vocab = [(c, -5_000_000) for c in _s.ascii_lowercase] + [
        ("ab", -1_000_000),
        ("abc", -2_500_000),
    ]
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    out = unigram_tokenize(df, "text", vocab).collect()[0]
    # ab+c = -6.0M < abc = -2.5M ... abc wins; flip the odds:
    assert out["pieces"] == "abc"
    vocab2 = [(c, -1_000_000) for c in _s.ascii_lowercase] + [
        ("ab", -1_000_000),
        ("abc", -9_000_000),
    ]
    out2 = unigram_tokenize(df, "text", vocab2).collect()[0]
    assert out2["pieces"] == "ab|c"
    assert out2["lp_scaled"] == -2_000_000


def test_unigram_tie_breaks_by_path(spark):
    """Equal total lp -> lexicographically smallest path, the
    cross-engine total order."""
    from updater_spark.operators.tokenizer import (
        unigram_tokenize,
        unigram_tokenize_arrow,
    )
    import string as _s

    # 'aa': [a|a] = -2M; [aa] = -2M -> tie; 'a|a' < 'aa' ('|'=0x7C
    # sorts after ASCII letters... 'a|a' vs 'aa': pos 2 '|' vs 'a',
    # '|' > 'a', so 'aa' is the SMALLER path and must win)
    vocab = [(c, -1_000_000) for c in _s.ascii_lowercase] + [
        ("aa", -2_000_000)
    ]
    df = spark.createDataFrame([(0, "aa")], "doc_id long, text string")
    for fn in (unigram_tokenize, unigram_tokenize_arrow):
        out = fn(df, "text", vocab).collect()[0]
        assert out["pieces"] == "aa", fn.__name__
        assert out["lp_scaled"] == -2_000_000


def test_unigram_vocab_validation(spark):
    from updater_spark.operators.tokenizer import unigram_tokenize
    import pytest as _pt

    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with _pt.raises(ValueError, match="cover a-z"):
        unigram_tokenize(df, "text", [("a", -1)])
    import string as _s

    dup = [(c, -1_000_000) for c in _s.ascii_lowercase] + [("a", -2)]
    with _pt.raises(ValueError, match="duplicate"):
        unigram_tokenize(df, "text", dup)
