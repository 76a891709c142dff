"""Greedy longest-match (WordPiece-style) subword tokenizer as a
pure-Catalyst fold — no UDF, exact SQL oracle. By default the fold
runs once per DISTINCT word (``_memoized_apply`` — two narrow
exchanges instead of per-instance evaluation; ``distinct_words=False``
restores the original zero-shuffle per-instance plan).

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
``array_max`` over a filtered piece array (struct (len, piece)
ordering = longest first, lexicographically-largest tie-break). The
vocabulary is a broadcast-free LITERAL (tokenizer vocabularies are
KBs, versioned with the job — and embedding them lets the DuckDB
oracle replay segmentation exactly, via a recursive CTE with an
identical padded-length arg_max tie-break), keyed by FIRST CHARACTER
into a constant-folded literal map: each cursor probes a 26-key map
once and filters only the matching bucket (~|vocab|/26 candidates),
not the whole vocabulary — the r6 verdict's vocab-size ceiling, cut
26×. Cost: O(max_word_len × |vocab|/26) substring compares per word
at scan speed, zero Python; the folded map rides the plan as one
referenced object, not inline codegen, so a big vocabulary does not
blow the JIT method limit the way inline literal arrays do.

At production vocabularies (8k-30k pieces) the per-cursor bucket is
still hundreds of compares — ``wordpiece_tokenize_arrow`` is the
deploy path there (the ``pq_adc_arrow`` discipline): one Arrow batch
per task, an O(1) dict probe per candidate length, byte-identical
output (pinned by tests and a shared driver oracle).

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

__all__ = [
    "wordpiece_tokenize",
    "wordpiece_tokenize_arrow",
    "bpe_tokenize",
    "bpe_tokenize_arrow",
    "synthetic_vocab",
    "wordpiece_vocab",
    "bpe_train",
    "unigram_train",
    "unigram_tokenize",
    "unigram_tokenize_arrow",
    "CJK_RANGES",
    "CJK_CHAR_CLASS",
]

# No-whitespace-script codepoint blocks for the byte-level
# ``cjk_split`` pre-segmentation: Hiragana+Katakana, CJK Extension A,
# CJK Unified Ideographs, Hangul syllables. Single source of truth —
# the Spark/RE2 char class (\x{..} escapes parse in Java regex AND
# RE2, so the DuckDB oracle replays the identical pattern) and the
# Python-re twin (\uXXXX; Python re lacks \x{..}) both derive from
# these ranges, so the three engines can never drift.
CJK_RANGES = [
    (0x3040, 0x30FF),
    (0x3400, 0x4DBF),
    (0x4E00, 0x9FFF),
    (0xAC00, 0xD7AF),
]
CJK_CHAR_CLASS = (
    "[" + "".join(f"\\x{{{a:04X}}}-\\x{{{b:04X}}}" for a, b in CJK_RANGES) + "]"
)
_CJK_PY_CLASS = (
    "[" + "".join(f"\\u{a:04X}-\\u{b:04X}" for a, b in CJK_RANGES) + "]"
)


def synthetic_vocab(size: int) -> list[str]:
    """Deterministic production-sized demo vocabulary: all single
    letters (the total-coverage requirement), all 676 bigrams, then
    evenly-strided trigrams/4-grams up to ``size``. Purely a test/
    bench artifact — real deployments pass their trained vocab — but
    it exercises the same shape: dense short pieces, every first-char
    bucket populated."""
    import itertools

    letters = list(string.ascii_lowercase)
    out = list(letters)
    out += ["".join(t) for t in itertools.product(letters, repeat=2)]
    tri = ["".join(t) for t in itertools.product(letters, repeat=3)]
    out += [g for i, g in enumerate(tri) if i % 7 < 3]
    if len(out) < size:
        quad = itertools.product(letters, repeat=4)
        out += ["".join(t) for t in itertools.islice(quad, size - len(out))]
    return out[:size]


def wordpiece_vocab(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 1000,
    max_piece_len: int = 6,
    max_word_len: int = 16,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-driven vocabulary CONSTRUCTION — the missing first half
    of the tokenizer lifecycle (``wordpiece_tokenize``/``bpe_tokenize``
    apply a vocab; this builds one). Frequency-ranked piece selection:
    for every corpus word occurrence, emit every substring piece up to
    ``max_piece_len`` — word-initial pieces plain, word-internal
    pieces ``##``-prefixed (the WordPiece continuation convention, Wu
    et al. 2016; frequency ranking is the standard seed vocabulary
    before likelihood refinement) — count them corpus-wide and keep
    the top ``vocab_size`` by ``(count DESC, piece ASC)`` (a total
    order, so the selected SET is deterministic).

    Normalization matches ``wordpiece_tokenize`` exactly (lowercase,
    strip to ``[a-z ]``, words truncated to ``max_word_len``), so the
    built vocab feeds straight into it.

    Scale shape (r11): words collapse to the DISTINCT word-frequency
    table first (one narrow word count — Heaps-law sublinear in the
    corpus), and the ≤ max_word_len×max_piece_len piece expansion
    runs once per distinct word with counts as ``sum(freq)`` — at
    sf0.1 that is 2.8k exploded piece rows instead of 24M (270,704
    word instances over 31 distinct words; counts identical since a
    piece's corpus count is Σ_word freq·multiplicity). Top-V is
    ``TakeOrderedAndProject`` (per-partition heaps, V rows to the
    driver — never a full sort). Zero UDFs, exact DuckDB oracle.

    Returns ``(piece, cnt)``, the selected vocabulary."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
    words = F.filter(
        F.transform(
            F.split(F.trim(norm), " +"),
            lambda x: F.substring(x, 1, max_word_len),
        ),
        lambda x: F.length(x) > 0,
    )
    w = (
        df.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("_freq"))
    )
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length("w") - F.lit(1)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("w") - i),
                ),
                lambda j: F.when(
                    i == F.lit(0), F.col("w").substr(F.lit(1), j)
                ).otherwise(
                    F.concat(
                        F.lit("##"), F.col("w").substr(i + F.lit(1), j)
                    )
                ),
            ),
        )
    )
    return (
        w.select(F.explode(pieces).alias("piece"), "_freq")
        .groupBy("piece")
        .agg(F.sum("_freq").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(vocab_size)
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 20,
    max_word_len: int = 16,
    byte_level: bool = False,
    cjk_split: bool = False,
) -> DataFrame:
    """BPE merge TRAINING (Sennrich et al. 2016) — learns the ranked
    merge list that ``bpe_tokenize`` applies, completing the tokenizer
    lifecycle (``wordpiece_vocab`` ranks pieces by frequency; this
    learns the merge ORDER GPT-family tokenizers actually ship).

    Classic algorithm on the word-frequency table: start from
    characters; each round, count adjacent token pairs weighted by
    word frequency, merge the most frequent pair everywhere
    (leftmost-first, non-overlapping), repeat ``n_merges`` times.
    Tie-break is total: ``(count DESC, a ASC, b ASC)``.

    Spark shape per round (the industrial trainer shape — all BPE
    trainers iterate; the win is running each round distributed):

    - pair counting: one narrow per-word pair expansion + one
      ``groupBy(a, b)`` partial agg over the word-frequency table —
      which is |distinct normalized words| rows, already thousands of
      times smaller than the corpus (the only corpus-sized job is the
      initial word count);
    - best pair: a 1-row bounded collect (``TakeOrdered`` heap);
    - merge application: a pure-Catalyst ``aggregate`` fold over each
      token array — narrow, no shuffle;
    - lineage truncated per round (``localCheckpoint``, the
      clusters.py rationale).

    Early-stops when no adjacent pairs remain (every word fully
    merged). Normalization matches the other tokenizer ops. Returns
    ``(merge_rank, a, b)`` — feedable straight into ``bpe_tokenize``
    as ``[(a, b), ...]`` in rank order. The DuckDB oracle is the same
    recurrence unrolled (pair-count CTE + LIMIT 1 best + a
    ``list_reduce`` fold per round).

    ``byte_level=True`` trains over the same hex-pair byte alphabet
    ``bpe_tokenize(byte_level=True)`` applies (no normalization,
    ASCII-whitespace split, start symbols = UTF-8 bytes as uppercase
    hex pairs) — the learned merges feed straight into the byte-level
    apply, completing the GPT-family lifecycle. Everything past the
    start-symbol construction is alphabet-agnostic.

    ``cjk_split`` (byte_level only) applies the same CJK space-pad
    pre-split as ``bpe_tokenize`` — train and apply must use the SAME
    word boundary or the learned merges see different pair statistics
    than the apply path."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if cjk_split and not byte_level:
        raise ValueError("cjk_split requires byte_level=True")
    if byte_level:
        base = F.col(text_col)
        if cjk_split:
            base = F.regexp_replace(base, f"({CJK_CHAR_CLASS})", " $1 ")
        words_src = F.split(F.trim(base), "[ \t\n\r]+")
    else:
        norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
        words_src = F.split(F.trim(norm), " +")
    words = F.filter(
        F.transform(
            words_src,
            lambda x: F.substring(x, 1, max_word_len),
        ),
        lambda x: F.length(x) > 0,
    )
    wf = (
        df.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if byte_level:
        start = F.regexp_extract_all(
            F.hex(F.encode("w", "UTF-8")), F.lit(".."), 0
        )
    else:
        start = F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        )
    state = wf.select(start.alias("toks"), "freq")
    spark = df.sparkSession
    merges: list[tuple[int, str, str]] = []
    prev = None
    for rank in range(n_merges):
        state = state.localCheckpoint(eager=True)
        if prev is not None:
            prev.unpersist()
        prev = state
        # sequence(1, n) DESCENDS when n < 1 — guard single-token words
        pair_idx = F.when(
            F.size("toks") > 1,
            F.sequence(F.lit(1), F.size("toks") - F.lit(1)),
        ).otherwise(F.array().cast("array<int>"))
        best = (
            state.select(
                F.explode(
                    F.transform(
                        pair_idx,
                        lambda i: F.struct(
                            F.element_at("toks", i).alias("a"),
                            F.element_at("toks", i + F.lit(1)).alias("b"),
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((rank, a, b))
        la, lb, lm = F.lit(a), F.lit(b), F.lit(a + b)
        state = state.select(
            F.aggregate(
                "toks",
                F.array().cast("array<string>"),
                lambda acc, t: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == la)
                    & (t == lb),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                        F.array(lm),
                    ),
                ).otherwise(F.concat(acc, F.array(t))),
            ).alias("toks"),
            "freq",
        )
    if prev is not None:
        prev.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank bigint, a string, b string"
    )


def _n_truncated(raw_words: Column, max_word_len: int) -> Column:
    """``n_truncated_words`` — how many words LOST characters to the
    ``max_word_len`` truncation (VERDICT r9: on a spaceless script
    the whitespace split yields one document-sized word and the
    truncation silently drops all but ``max_word_len`` characters;
    this column makes the cliff visible and countable — a nonzero
    value on a CJK corpus says "use cjk_split / a char-aware split").
    NULL text propagates (size() is -1 on NULL under legacy conf, so
    the guard is explicit)."""
    return (
        F.when(
            raw_words.isNotNull(),
            F.size(
                F.filter(raw_words, lambda x: F.length(x) > max_word_len)
            ),
        )
        .cast("long")
        .alias("n_truncated_words")
    )


def _memoized_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    raw_words: Column,
    word_seg,
    max_word_len: int,
    with_lp: bool = False,
) -> DataFrame:
    """Distinct-word memoization for the Catalyst tokenizer folds —
    the spark_optimization_guide §8 shape (decide on small rows,
    reattach): segmentation depends ONLY on the (truncated) word, so
    the expensive per-word DP fold runs once per DISTINCT word
    instead of once per word INSTANCE, and the results are joined
    back and reassembled per document. Zipf/Heaps corpora make the
    distinct-word table orders of magnitude smaller than the instance
    stream (measured 31 distinct vs 270,704 instances on the sf0.1
    fixture — a 8,732× cut in fold evaluations; real web corpora sit
    near |V| ≈ O(N^0.5)), and AQE turns the reattach join into a
    broadcast once the distinct stage's true size is known.

    ``word_seg``: Column(word) -> struct with ``path`` (pieces
    '|'-joined) and, when ``with_lp``, ``lp``. The piece count is
    derived here from ``path`` (pieces never contain '|': [a-z] in
    the letter alphabets, hex pairs in the byte alphabet), so the
    expensive fold is referenced as few times as possible — every
    reference re-inlines the whole fold expression (the
    CollapseProject lesson below).

    Cost trade (vs the zero-shuffle per-instance fold): two extra
    exchanges — the distinct over bare words and the per-doc
    regroup of (pos, path) rows, both carrying only word keys and
    piece strings, never document text. The fold itself is the
    dominant term at every scale where the vocabulary is sublinear
    in the corpus.

    Requires ``id_col`` to be unique per row (the regroup is a
    groupBy on it) — true for every caller in this repo; the
    ``distinct_words=False`` escape hatch keeps the original
    per-instance fold for frames where it is not.

    NULL text keeps NULL outputs and zero-word docs keep ''/0
    outputs: ``posexplode_outer`` emits one NULL-word row for both,
    the left join leaves ``_seg`` NULL, and a ``text IS NULL`` flag
    disambiguates at the end.

    The RAW (untruncated) words are what explode; truncation and the
    overlong-word indicator are per-instance projections AFTER the
    Generate. Anything computed from the words ARRAY would be
    collapsed below/above the Generate by CollapseProject and
    re-evaluate the regexp+split chain once per word INSTANCE —
    measured 6× slower than the per-instance fold it replaced when
    ``n_truncated_words`` was written that way; deriving it from the
    exploded stream (Σ overlong indicators) keeps the text parsed
    once per document."""
    tnull = F.col(text_col).isNull()
    ex = df.select(
        F.col(id_col),
        tnull.alias("_tnull"),
        F.posexplode_outer(raw_words).alias("_pos", "_wr"),
    ).select(
        F.col(id_col),
        "_tnull",
        "_pos",
        F.substring(F.col("_wr"), 1, max_word_len).alias("_w"),
        # NULL on the no-word sentinel row (length(NULL) is NULL) —
        # sum() skips it, so empty docs aggregate to NULL, coalesced
        # to 0 below
        (F.length("_wr") > max_word_len).cast("int").alias("_tr"),
    )
    seg = (
        ex.select("_w")
        .where(F.col("_w").isNotNull())
        .distinct()
        .select("_w", word_seg(F.col("_w")).alias("_seg"))
    )
    joined = ex.join(seg, "_w", "left")
    parts = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("_pos").alias("p"), F.col("_seg")["path"].alias("s")
            )
        )
    )
    aggs = [
        F.array_join(F.transform(parts, lambda x: x["s"]), " ").alias(
            "_pieces"
        ),
        # explicit NULL-seg guard: with ANSI off size(NULL) is -1
        # (legacy sizeOfNull), which would poison the empty-doc sum
        F.sum(
            F.when(
                F.col("_seg").isNotNull(),
                F.size(F.split(F.col("_seg")["path"], r"\|")),
            )
        )
        .cast("long")
        .alias("_np"),
        # constant within each doc's group (it rode the explode), so
        # max is an exact, deterministic carry
        F.max("_tnull").alias("_tn"),
        F.sum("_tr").alias("_trs"),
    ]
    if with_lp:
        aggs.insert(2, F.sum(F.col("_seg")["lp"]).cast("long").alias("_lp"))
    g = joined.groupBy(id_col).agg(*aggs)
    notnull = ~F.col("_tn")
    cols = [
        F.col(id_col),
        F.when(notnull, F.coalesce(F.col("_pieces"), F.lit(""))).alias(
            "pieces"
        ),
        F.when(notnull, F.coalesce(F.col("_np"), F.lit(0)))
        .cast("long")
        .alias("n_pieces"),
    ]
    if with_lp:
        cols.append(
            F.when(notnull, F.coalesce(F.col("_lp"), F.lit(0)))
            .cast("long")
            .alias("lp_scaled")
        )
    cols.append(
        F.when(notnull, F.coalesce(F.col("_trs"), F.lit(0)))
        .cast("long")
        .alias("n_truncated_words")
    )
    return g.select(*cols)


def _vocab_by_char(vocab: list[str]):
    """First-char-keyed literal map: ``char -> array<struct<l,p>>``.
    All-literal ``create_map`` is constant-folded to ONE map object
    referenced by the plan; ``element_at`` then scans 26 keys instead
    of the step filtering the whole vocabulary."""
    buckets: dict[str, list[str]] = {}
    for p in vocab:
        buckets.setdefault(p[0], []).append(p)
    entries = []
    for ch, ps in buckets.items():
        entries.append(F.lit(ch))
        entries.append(
            F.array(
                *[
                    F.struct(
                        F.lit(len(p)).alias("l"), F.lit(p).alias("p")
                    )
                    for p in ps
                ]
            )
        )
    return F.create_map(*entries)


def _tok_word(w: Column, by_char: Column, max_word_len: int) -> Column:
    """array<string> of pieces for one (normalized, truncated) word."""

    def step(acc, _i):
        matches = F.filter(
            F.element_at(by_char, w.substr(acc["pos"], F.lit(1))),
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
    distinct_words: bool = True,
) -> DataFrame:
    """Per document: ``pieces`` (words ' '-joined, pieces '|'-joined
    within a word) and ``n_pieces``.

    ``vocab`` must include every single letter a–z (total-coverage
    requirement above) and contain no duplicates.

    ``distinct_words=True`` (default) runs the greedy fold once per
    DISTINCT truncated word and reattaches by join
    (``_memoized_apply`` — requires unique ``id_col``); ``False``
    keeps the original zero-shuffle per-instance fold."""
    missing = [c for c in string.ascii_lowercase if c not in vocab]
    if missing:
        raise ValueError(f"vocab must cover a-z; missing {missing}")
    if len(set(vocab)) != len(vocab):
        raise ValueError("vocab contains duplicates")

    by_char = _vocab_by_char(vocab)
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
    raw_words = F.filter(
        F.split(F.trim(norm), " +"), lambda x: F.length(x) > 0
    )
    if distinct_words:
        def word_seg(w):
            return F.struct(
                F.array_join(
                    _tok_word(w, by_char, max_word_len), "|"
                ).alias("path")
            )

        return _memoized_apply(
            df, id_col, text_col, raw_words, word_seg, max_word_len
        )
    # materialize the raw words and per-word piece arrays ONCE:
    # referencing the expression from two outputs would re-inline the
    # whole fold per reference (the dedup.tokenize CollapseProject
    # lesson). Truncate-after-filter ≡ filter-after-truncate: substr
    # never empties a non-empty word.
    out = df.withColumn("_wraw", raw_words).withColumn(
        "_words",
        F.transform(
            F.col("_wraw"), lambda x: F.substring(x, 1, max_word_len)
        ),
    ).withColumn(
        "_wp",
        F.transform(
            F.col("_words"),
            lambda x: _tok_word(x, by_char, max_word_len),
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
        _n_truncated(F.col("_wraw"), max_word_len),
    )


def tokenizer_fertility(
    df: DataFrame,
    tokenized: DataFrame,
    group_cols: tuple[str, ...] = ("lang",),
    id_col: str = "doc_id",
    text_col: str = "text",
    n_pieces_col: str = "n_pieces",
) -> DataFrame:
    """Per-group tokenizer-quality profile — the fertility report every
    tokenizer paper tables (e.g. XLM-R, §Appendix: pieces/word by
    language) and every multilingual corpus build checks before
    committing to a vocabulary: a language whose fertility is 2× the
    corpus mean is under-served by the vocab (its words shatter into
    characters) and will train badly at fixed sequence length.

    ``tokenized`` is any per-doc frame carrying ``n_pieces_col``
    (wordpiece_tokenize / bpe_tokenize / unigram_tokenize output —
    the operator composes with the whole family). Word and char
    counts use the family's shared letters-only normalization
    (lower → strip non-[a-z ] → split; word truncation ignored, so
    chars_per_piece reads ≤ true coverage on >32-char words).

    Returns per group: ``n_docs, n_words, n_pieces, n_chars,
    fertility`` (pieces per word), ``chars_per_piece`` (compression),
    ratios rounded to 6 and NULL when the denominator is 0.

    Scale shape: one map-side projection per doc (no explode — word
    and char counts fold inside the array expressions), one join to
    ``tokenized`` on the id (co-partitioned if both sides came from
    the same scan), one tiny group agg. Ratios derive from the SUMS,
    so partial aggregation stays exact."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
    words = F.filter(
        F.split(F.trim(norm), " +"), lambda x: F.length(x) > 0
    )
    per_doc = df.select(
        F.col(id_col),
        *[F.col(c) for c in group_cols],
        F.size(words).cast("long").alias("_nw"),
        F.length(F.array_join(words, "")).cast("long").alias("_nc"),
    ).join(
        tokenized.select(
            F.col(id_col), F.col(n_pieces_col).cast("long").alias("_np")
        ),
        id_col,
    )
    sum_w, sum_p, sum_c = F.sum("_nw"), F.sum("_np"), F.sum("_nc")
    return per_doc.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        sum_w.alias("n_words"),
        sum_p.alias("n_pieces"),
        sum_c.alias("n_chars"),
        F.when(
            sum_w > 0, F.round(sum_p / sum_w, 6)
        ).alias("fertility"),
        F.when(
            sum_p > 0, F.round(sum_c / sum_p, 6)
        ).alias("chars_per_piece"),
    )


def wordpiece_tokenize_arrow(
    df: DataFrame,
    text_col: str,
    vocab: list[str],
    id_col: str = "doc_id",
    max_word_len: int = 32,
) -> DataFrame:
    """Arrow twin of ``wordpiece_tokenize`` — byte-identical output,
    built for PRODUCTION vocabularies (8k-30k pieces) where even the
    bucketed Catalyst fold pays hundreds of substring compares per
    cursor. Here each cursor probes a Python set once per candidate
    LENGTH, longest first — O(max_piece_len) O(1)-probes — inside one
    ``mapInPandas`` pass (Arrow batches, no per-row Python). Greedy
    longest-match is unambiguous (one exact substring per length), so
    the Catalyst tie-break is vacuous and the two paths agree exactly.
    Scale: the vocabulary ships once per task via closure (KBs-MBs);
    work is a single scan, no shuffle, no joins."""
    import re

    missing = [c for c in string.ascii_lowercase if c not in vocab]
    if missing:
        raise ValueError(f"vocab must cover a-z; missing {missing}")
    if len(set(vocab)) != len(vocab):
        raise ValueError("vocab contains duplicates")

    vs = frozenset(vocab)
    max_len = max(len(p) for p in vocab)
    id_type = df.schema[id_col].dataType.simpleString()

    def seg(batches):
        import pandas as pd

        strip = re.compile(r"[^a-z ]")
        # per-task word memo (the HF-tokenizer token-cache shape):
        # segmentation depends only on the truncated word, and Zipf
        # makes repeats dominate; capped so adversarial all-unique
        # streams cannot grow it unboundedly
        memo: dict[str, tuple[str, int]] = {}
        for pdf in batches:
            pieces_out, n_out, trunc_out = [], [], []
            for t in pdf[text_col]:
                if t is None or (isinstance(t, float) and pd.isna(t)):
                    # byte-identical to the Catalyst fold: NULL text
                    # propagates (regexp_replace(NULL) is NULL), it
                    # does not coerce to an empty document
                    pieces_out.append(None)
                    n_out.append(None)
                    trunc_out.append(None)
                    continue
                norm = strip.sub("", t.lower())
                total = 0
                n_trunc = 0
                word_pieces = []
                for wd in norm.split():
                    if len(wd) > max_word_len:
                        n_trunc += 1
                    wd = wd[:max_word_len]
                    hit = memo.get(wd)
                    if hit is None:
                        pos, n = 0, len(wd)
                        ps = []
                        while pos < n:
                            for k in range(min(max_len, n - pos), 0, -1):
                                cand = wd[pos : pos + k]
                                if cand in vs:
                                    ps.append(cand)
                                    pos += k
                                    break
                        hit = ("|".join(ps), len(ps))
                        if len(memo) < 1 << 20:
                            memo[wd] = hit
                    word_pieces.append(hit[0])
                    total += hit[1]
                pieces_out.append(" ".join(word_pieces))
                n_out.append(total)
                trunc_out.append(n_trunc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": pieces_out,
                    "n_pieces": pd.array(n_out, dtype="Int64"),
                    "n_truncated_words": pd.array(trunc_out, dtype="Int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        seg,
        schema=(
            f"{id_col} {id_type}, pieces string, n_pieces long,"
            " n_truncated_words long"
        ),
    )


# ---------------------------------------------------------------------------
# BPE apply (merge-ordered) — the Sennrich et al. 2016 sibling
# ---------------------------------------------------------------------------


def _validate_merges(merges: list[tuple[str, str]]) -> None:
    if not merges:
        raise ValueError("merges must be non-empty")
    seen = set()
    for a, b in merges:
        if not a or not b:
            raise ValueError(f"empty merge operand in ({a!r}, {b!r})")
        if (a, b) in seen:
            raise ValueError(f"duplicate merge ({a!r}, {b!r})")
        seen.add((a, b))


def _merge_ranks(merges: list[tuple[str, str]]) -> Column:
    """Literal ``'a b' -> rank`` map (space separator — normalized
    pieces are [a-z]+ so the key is unambiguous), constant-folded to
    one referenced object like the wordpiece vocab map."""
    entries = []
    for rank, (a, b) in enumerate(merges):
        entries.append(F.lit(f"{a} {b}"))
        entries.append(F.lit(rank))
    return F.create_map(*entries)


def _bpe_word(
    w: Column, ranks: Column, max_word_len: int, byte_level: bool = False
) -> Column:
    """array<string> BPE pieces for one (normalized, truncated) word:
    start from single characters and repeatedly apply the LOWEST-rank
    adjacent merge, leftmost occurrence first. One leftmost merge per
    fold step is equivalent to the classic replace-all-occurrences
    apply (after merging the leftmost occurrence, the same pair — if
    still present — is still the minimum rank and merges next), and
    each merge shrinks the array by one, so ``max_word_len - 1`` steps
    always reach the fixed point.

    ``byte_level``: the start symbols are the word's UTF-8 BYTES as
    uppercase hex pairs (``hex(encode(w))`` chunked by 2) instead of
    characters — a fixed 256-symbol printable alphabet, so EVERY
    input tokenizes (UNK-free by construction; the GPT-2 byte-BPE
    property) and the fold bound is octet count, not char count."""

    def step(acc, _i):
        n = F.size(acc)
        cands = F.filter(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(
                        ranks,
                        F.concat(
                            F.element_at(acc, i),
                            F.lit(" "),
                            F.element_at(acc, i + 1),
                        ),
                    ).alias("r"),
                    i.alias("i"),
                ),
            ),
            lambda c: c["r"].isNotNull(),
        )
        best = F.array_min(cands)  # (rank, position): lowest, leftmost
        merged = F.concat(
            F.slice(acc, F.lit(1), best["i"] - 1),
            F.array(
                F.concat(
                    F.element_at(acc, best["i"]),
                    F.element_at(acc, best["i"] + 1),
                )
            ),
            F.slice(acc, best["i"] + 2, n),
        )
        return F.when(n < 2, acc).otherwise(
            F.when(F.size(cands) == 0, acc).otherwise(merged)
        )

    if byte_level:
        chars = F.regexp_extract_all(
            F.hex(F.encode(w, "UTF-8")), F.lit(".."), 0
        )
        n_syms = F.octet_length(w)
    else:
        chars = F.filter(F.split(w, ""), lambda x: F.length(x) > 0)
        n_syms = F.length(w)
    # each merge shrinks the array by one, so n_symbols - 1 steps
    # reach any word's fixed point — folding a constant
    # max_word_len - 1 steps instead wastes ~4/5 of the steps on the
    # no-candidate WHEN branch for typical words (measured 16.6s →
    # ~4s on the sf0.1 corpus; the same bound trick as the wordpiece
    # fold). The data-side truncation to max_word_len stays — the SQL
    # oracle's recursion is unbounded either way.
    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(n_syms - 1, F.lit(1))),
        chars,
        step,
    )


def bpe_tokenize(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    max_word_len: int = 32,
    byte_level: bool = False,
    cjk_split: bool = False,
    distinct_words: bool = True,
) -> DataFrame:
    """Merge-ordered BPE apply (Sennrich et al. 2016) as a
    pure-Catalyst runtime fold — the other half of production
    tokenization next to ``wordpiece_tokenize``'s greedy longest
    match: WordPiece asks "what is the longest piece HERE", BPE asks
    "which adjacent pair merges FIRST by training rank", and the two
    segment the same word differently whenever a low-rank merge sits
    right of a longer dictionary piece.

    Output shape matches ``wordpiece_tokenize`` exactly: ``pieces``
    (words ' '-joined, pieces '|'-joined) and ``n_pieces``. Same
    normalization ([a-z ]) and ``max_word_len`` truncation — applied
    to the DATA so the unbounded SQL-oracle recursion sees identical
    words.

    Cost: each fold step scans the current pieces for the best-ranked
    pair via a constant-folded literal rank map — O(len² × map-probe)
    per word, zero Python, no shuffle. The map probe is a linear scan
    of |merges| (Catalyst ``GetMapValue``), so production merge
    tables (30k+) belong on ``bpe_tokenize_arrow``, exactly the
    wordpiece discipline.

    ``byte_level=True`` switches to GPT-family byte BPE: NO
    lowercasing or character stripping (case and punctuation are
    data), words split on ASCII whitespace only, and each word's
    start symbols are its UTF-8 bytes as uppercase hex pairs — a
    fixed 256-symbol alphabet, so any Unicode input tokenizes with
    zero UNKs by construction (merges are written in the same hex
    alphabet, e.g. ``("C3", "A9")`` fuses the two bytes of "é").
    ``max_word_len`` still truncates by CHARACTER before encoding
    (so the oracle's recursion sees identical words); the fold bound
    becomes the octet count.

    ``cjk_split`` (byte_level only): space-pad every CJK-block
    codepoint (``CJK_CHAR_CLASS``: kana, CJK ideographs incl. ext A,
    Hangul) BEFORE the whitespace split, so each becomes its own
    "word" — the script-aware split that keeps a spaceless document
    from arriving as ONE word and losing everything past
    ``max_word_len`` chars to the truncation (the cliff
    ``n_truncated_words`` counts). The byte alphabet already makes
    every codepoint tokenizable; this makes the WORD boundary honest
    too.

    Output adds ``n_truncated_words`` — words that LOST characters
    to the truncation (0 on healthy corpora; NULL text propagates)."""
    _validate_merges(merges)
    ranks = _merge_ranks(merges)
    if cjk_split and not byte_level:
        raise ValueError("cjk_split requires byte_level=True")
    if byte_level:
        base = F.col(text_col)
        if cjk_split:
            base = F.regexp_replace(base, f"({CJK_CHAR_CLASS})", " $1 ")
        words_src = F.split(F.trim(base), "[ \t\n\r]+")
    else:
        norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
        words_src = F.split(F.trim(norm), " +")
    raw_words = F.filter(words_src, lambda x: F.length(x) > 0)
    if distinct_words:
        # fold once per DISTINCT truncated word, reattach by join
        # (_memoized_apply; requires unique id_col) — the merge loop
        # is O(len²·|merges|) per evaluation, the dominant term
        def word_seg(w):
            return F.struct(
                F.array_join(
                    _bpe_word(w, ranks, max_word_len, byte_level), "|"
                ).alias("path")
            )

        return _memoized_apply(
            df, id_col, text_col, raw_words, word_seg, max_word_len
        )
    out = df.withColumn("_wraw", raw_words).withColumn(
        "_words",
        F.transform(
            F.col("_wraw"), lambda x: F.substring(x, 1, max_word_len)
        ),
    ).withColumn(
        "_wp",
        F.transform(
            F.col("_words"),
            lambda x: _bpe_word(x, ranks, max_word_len, byte_level),
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
        _n_truncated(F.col("_wraw"), max_word_len),
    )


def bpe_tokenize_arrow(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    max_word_len: int = 32,
    byte_level: bool = False,
    cjk_split: bool = False,
) -> DataFrame:
    """Arrow twin of ``bpe_tokenize`` — byte-identical output with an
    O(1) dict probe per adjacent pair, for production merge tables
    where the literal map's linear ``GetMapValue`` scan dominates.
    ``byte_level`` mirrors the Catalyst flag: hex-pair byte symbols,
    ASCII-whitespace word split, no normalization, UNK-free;
    ``cjk_split`` mirrors the script-aware CJK space-padding (the
    Python-re char class derives from the same CJK_RANGES)."""
    import re

    _validate_merges(merges)
    if cjk_split and not byte_level:
        raise ValueError("cjk_split requires byte_level=True")
    rank_of = {f"{a} {b}": r for r, (a, b) in enumerate(merges)}
    id_type = df.schema[id_col].dataType.simpleString()

    def seg(batches):
        import pandas as pd

        strip = re.compile(r"[^a-z ]")
        ws = re.compile(r"[ \t\n\r]+")
        cjk = re.compile(f"({_CJK_PY_CLASS})")
        # per-task word memo (capped; see wordpiece_tokenize_arrow)
        memo: dict[str, tuple[str, int]] = {}
        for pdf in batches:
            pieces_out, n_out, trunc_out = [], [], []
            for t in pdf[text_col]:
                if t is None or (isinstance(t, float) and pd.isna(t)):
                    # NULL propagates, matching the Catalyst fold
                    pieces_out.append(None)
                    n_out.append(None)
                    trunc_out.append(None)
                    continue
                if byte_level:
                    if cjk_split:
                        t = cjk.sub(r" \1 ", t)
                    wds = [w for w in ws.split(t.strip(" ")) if w]
                else:
                    wds = strip.sub("", t.lower()).split()
                total = 0
                n_trunc = 0
                word_pieces = []
                for wd in wds:
                    if len(wd) > max_word_len:
                        n_trunc += 1
                        wd = wd[:max_word_len]
                    hit = memo.get(wd)
                    if hit is None:
                        if byte_level:
                            hx = wd.encode("utf-8").hex().upper()
                            ps = [
                                hx[i : i + 2] for i in range(0, len(hx), 2)
                            ]
                        else:
                            ps = list(wd)
                        while len(ps) > 1:
                            best_r, best_i = None, None
                            for i in range(len(ps) - 1):
                                r = rank_of.get(f"{ps[i]} {ps[i + 1]}")
                                if r is not None and (
                                    best_r is None or r < best_r
                                ):
                                    best_r, best_i = r, i
                            if best_i is None:
                                break
                            ps[best_i : best_i + 2] = [
                                ps[best_i] + ps[best_i + 1]
                            ]
                        hit = ("|".join(ps), len(ps))
                        if len(memo) < 1 << 20:
                            memo[wd] = hit
                    word_pieces.append(hit[0])
                    total += hit[1]
                pieces_out.append(" ".join(word_pieces))
                n_out.append(total)
                trunc_out.append(n_trunc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": pieces_out,
                    "n_pieces": pd.array(n_out, dtype="Int64"),
                    "n_truncated_words": pd.array(trunc_out, dtype="Int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        seg,
        schema=(
            f"{id_col} {id_type}, pieces string, n_pieces long,"
            " n_truncated_words long"
        ),
    )


# ---------------------------------------------------------------------------
# Unigram LM (SentencePiece family) — EM-trained piece probabilities +
# Viterbi segmentation (Kudo 2018), the third production tokenizer
# family next to WordPiece (greedy longest-match) and BPE
# (merge-ordered).
# ---------------------------------------------------------------------------


def _round_half_away(v: float) -> int:
    """Half-away-from-zero to int — DuckDB's round() convention
    (Python's built-in round is half-even and WOULD drift)."""
    import math

    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def _scaled_ln(num: float, den: float, scale: int = 1_000_000) -> int:
    """round(ln(num/den) * scale) as the engine-portable INTEGER
    log-prob (the logreg rounded-state discipline, taken one step
    further: once the per-piece lp is an integer, every Viterbi DP
    sum is exact int64 arithmetic — zero cross-engine float risk in
    the hot path; the one ln per (piece, iteration) is glibc log in
    both Python and DuckDB)."""
    import math

    return _round_half_away(math.log(num / den) * scale)


def _viterbi_word(w: Column, lp_map: Column, max_piece_len: int) -> Column:
    """Best-segmentation ``struct(lp long, path string)`` for one
    normalized word — a pure-Catalyst forward DP fold: dp[i] = max
    over k ≤ max_piece_len of dp[i-k] + lp(substr(i-k+1, k)), ties on
    equal (integer) lp broken by LEXICOGRAPHICALLY SMALLEST path (a
    total order both engines share; encoded as array_min over
    struct(-lp, path)). The vocabulary must cover a-z, so position
    i is always reachable via the k=1 candidate and the fold needs
    no unreachable sentinel."""

    def step(acc, i):
        ks = F.sequence(F.lit(1), F.least(F.lit(max_piece_len), i))

        def cand(k):
            prev = F.element_at(acc, (i - k + 1).cast("int"))
            piece = w.substr(i - k + 1, k)
            plp = F.element_at(lp_map, piece)
            return F.struct(
                (-(prev["lp"] + plp)).alias("neg"),
                F.when(prev["path"] == "", piece)
                .otherwise(F.concat(prev["path"], F.lit("|"), piece))
                .alias("path"),
            )

        cands = F.filter(
            F.transform(ks, cand), lambda c: c["neg"].isNotNull()
        )
        best = F.array_min(cands)
        return F.concat(
            acc,
            F.array(
                F.struct(
                    (-best["neg"]).alias("lp"), best["path"].alias("path")
                )
            ),
        )

    init = F.array(
        F.struct(F.lit(0).cast("long").alias("lp"), F.lit("").alias("path"))
    )
    dp = F.aggregate(F.sequence(F.lit(1), F.length(w)), init, step)
    return F.element_at(dp, F.length(w) + 1)


def _unigram_norm_words(text_col: str, max_word_len: int) -> Column:
    """The shared wordpiece-family normalization: lowercase, strip to
    [a-z ], split, drop empties, truncate to max_word_len."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
    raw = F.filter(F.split(F.trim(norm), " +"), lambda x: F.length(x) > 0)
    return F.transform(raw, lambda x: F.substring(x, 1, max_word_len))


def unigram_train(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 120,
    n_iters: int = 2,
    max_piece_len: int = 3,
    max_word_len: int = 16,
) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo 2018, hard-EM/Viterbi
    variant): seed the vocabulary with the top ``vocab_size``
    frequency-ranked substrings (every single char always kept — the
    coverage guarantee), then iterate: (E) Viterbi-segment the word
    table under current piece log-probs, (M) re-estimate
    ``lp(p) = ln((usage_p + 1) / (Σusage + |V|))`` (add-one smoothing
    keeps never-used single chars finite) and drop non-single pieces
    with zero usage. Hard EM (count only the BEST segmentation) is
    the deterministic sibling of full forward-backward EM — the same
    algorithmic family, exactly replayable cross-engine.

    Determinism (what makes an exact DuckDB oracle possible): piece
    log-probs are INTEGERS (``_scaled_ln``), so the Viterbi DP is
    pure int64 arithmetic with a path-string tie-break; the M-step
    runs DRIVER-side on the vocab-sized usage table (bounded collect,
    the bpe_train discipline) with glibc log — the same libm DuckDB's
    ``ln`` calls.

    Scale shape: the corpus is touched ONCE (the word count); every
    EM iteration runs on the DISTINCT-WORD frequency table (thousands
    of rows at any corpus size — segmentation depends only on the
    word), one narrow Viterbi fold + one vocab-sized groupBy each.
    Per-iteration driver traffic is |vocab| rows.

    Returns ``(piece, logprob_scaled, usage)`` — feed
    ``[(piece, logprob_scaled), ...]`` straight into
    ``unigram_tokenize``."""
    if vocab_size < 1 or n_iters < 1 or max_piece_len < 1:
        raise ValueError("vocab_size, n_iters, max_piece_len must be >= 1")
    spark = df.sparkSession
    words = _unigram_norm_words(text_col, max_word_len)
    wf = (
        df.select(F.explode(words).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)  # reused every iteration
    )
    # seed substring counts (freq-weighted), distributed
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length("w") - F.lit(1)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length("w") - i),
                ),
                lambda l: F.col("w").substr(i + F.lit(1), l),
            ),
        )
    )
    seedcnt = (
        wf.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )
    top = seedcnt.orderBy(
        F.col("cnt").desc(), F.col("piece").asc()
    ).limit(vocab_size)
    singles = seedcnt.filter(F.length("piece") == 1)
    members = {r["piece"]: r["cnt"] for r in top.collect()}
    members.update({r["piece"]: r["cnt"] for r in singles.collect()})
    # ALL of a-z, even letters the corpus never contains: the apply
    # contract requires total coverage, and add-one smoothing (same
    # formula as the M-step) keeps their ln finite
    for c in string.ascii_lowercase:
        members.setdefault(c, 0)
    total = sum(members.values()) + len(members)
    vocab = {p: _scaled_ln(c + 1, total) for p, c in members.items()}
    usage: dict[str, int] = {}
    for _ in range(n_iters):
        vmap = F.create_map(
            *[F.lit(x) for p, lp in sorted(vocab.items()) for x in (p, lp)]
        )
        seg = wf.select(
            "freq",
            _viterbi_word(F.col("w"), vmap, max_piece_len)["path"].alias(
                "path"
            ),
        )
        usage = {
            r["piece"]: r["u"]
            for r in seg.select(
                F.explode(F.split("path", r"\|")).alias("piece"), "freq"
            )
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("u"))
            .collect()
        }
        singles_set = {p for p in vocab if len(p) == 1}
        member_set = set(usage) | singles_set
        denom = sum(usage.values()) + len(member_set)
        vocab = {
            p: _scaled_ln(usage.get(p, 0) + 1, denom) for p in member_set
        }
    rows = sorted(
        (p, vocab[p], usage.get(p, 0)) for p in vocab
    )
    return spark.createDataFrame(
        rows, "piece string, logprob_scaled bigint, usage bigint"
    )


def _validate_unigram_vocab(vocab: list[tuple[str, int]]) -> None:
    pieces = [p for p, _ in vocab]
    missing = [c for c in string.ascii_lowercase if c not in pieces]
    if missing:
        raise ValueError(f"vocab must cover a-z; missing {missing}")
    if len(set(pieces)) != len(pieces):
        raise ValueError("vocab contains duplicate pieces")


def unigram_tokenize(
    df: DataFrame,
    text_col: str,
    vocab: list[tuple[str, int]],
    id_col: str = "doc_id",
    max_word_len: int = 16,
    max_piece_len: int | None = None,
    distinct_words: bool = True,
) -> DataFrame:
    """Viterbi (max-log-prob) segmentation under a trained unigram
    vocabulary — ``unigram_train``'s apply half, as a pure-Catalyst
    DP fold (zero Python, no shuffle; the vocabulary rides the plan
    as one constant-folded literal map, the wordpiece discipline).

    ``vocab``: ``[(piece, logprob_scaled)]`` — integer scaled
    log-probs, must cover a-z. Output matches the tokenizer-family
    contract (``pieces``/``n_pieces``/``n_truncated_words``) plus
    ``lp_scaled`` — the document's total segmentation log-prob (the
    unigram LM score; integer, exactly portable).

    Per-cursor cost is a linear probe of the literal map —
    production vocabularies belong on ``unigram_tokenize_arrow``
    (O(1) dict probes), byte-identical by construction."""
    _validate_unigram_vocab(vocab)
    if max_piece_len is None:
        max_piece_len = max(len(p) for p, _ in vocab)
    lp_map = F.create_map(
        *[F.lit(x) for p, lp in sorted(vocab) for x in (p, lp)]
    )
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z ]", "")
    raw_words = F.filter(
        F.split(F.trim(norm), " +"), lambda x: F.length(x) > 0
    )
    if distinct_words:
        # Viterbi once per DISTINCT truncated word, reattach by join
        # (_memoized_apply; requires unique id_col) — the DP fold's
        # O(len·plen) literal-map probes are the dominant term
        def word_seg(w):
            # the fold's struct(lp, path) already carries both fields
            # _memoized_apply reads — return it as-is so the fold is
            # referenced exactly once
            return _viterbi_word(w, lp_map, max_piece_len)

        return _memoized_apply(
            df, id_col, text_col, raw_words, word_seg, max_word_len,
            with_lp=True,
        )
    out = df.withColumn("_wraw", raw_words).withColumn(
        "_words",
        F.transform(
            F.col("_wraw"), lambda x: F.substring(x, 1, max_word_len)
        ),
    ).withColumn(
        "_seg",
        F.transform(
            F.col("_words"),
            lambda x: _viterbi_word(x, lp_map, max_piece_len),
        ),
    )
    return out.select(
        F.col(id_col),
        F.array_join(
            F.transform(F.col("_seg"), lambda s: s["path"]), " "
        ).alias("pieces"),
        F.aggregate(
            F.transform(
                F.col("_seg"), lambda s: F.size(F.split(s["path"], r"\|"))
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("n_pieces"),
        F.aggregate(
            F.transform(F.col("_seg"), lambda s: s["lp"]),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("lp_scaled"),
        _n_truncated(F.col("_wraw"), max_word_len),
    )


def unigram_tokenize_arrow(
    df: DataFrame,
    text_col: str,
    vocab: list[tuple[str, int]],
    id_col: str = "doc_id",
    max_word_len: int = 16,
    max_piece_len: int | None = None,
) -> DataFrame:
    """Arrow twin of ``unigram_tokenize`` — byte-identical output
    with O(1) dict probes per DP candidate, the deploy path for
    production vocabularies (the wordpiece/bpe twin discipline).
    The tie-break replays the Catalyst fold exactly: candidates
    minimized by ``(-lp, path)`` tuples (ASCII pieces, so Python and
    UTF-8-binary string orders coincide)."""
    import re

    _validate_unigram_vocab(vocab)
    if max_piece_len is None:
        max_piece_len = max(len(p) for p, _ in vocab)
    lp_of = dict(vocab)
    id_type = df.schema[id_col].dataType.simpleString()
    plen = max_piece_len

    def seg_word(wd):
        dp = [(0, "")]
        for i in range(1, len(wd) + 1):
            best = None
            for k in range(1, min(plen, i) + 1):
                piece = wd[i - k : i]
                plp = lp_of.get(piece)
                if plp is None:
                    continue
                prev_lp, prev_path = dp[i - k]
                path = piece if prev_path == "" else prev_path + "|" + piece
                cand = (-(prev_lp + plp), path)
                if best is None or cand < best:
                    best = cand
            dp.append((-best[0], best[1]))
        return dp[-1]

    def run(batches):
        import pandas as pd

        strip = re.compile(r"[^a-z ]")
        # per-task word memo (capped; see wordpiece_tokenize_arrow)
        memo: dict[str, tuple[int, str]] = {}
        for pdf in batches:
            pieces_out, n_out, lp_out, trunc_out = [], [], [], []
            for t in pdf[text_col]:
                if t is None or (isinstance(t, float) and pd.isna(t)):
                    pieces_out.append(None)
                    n_out.append(None)
                    lp_out.append(None)
                    trunc_out.append(None)
                    continue
                total_n = 0
                total_lp = 0
                n_trunc = 0
                word_paths = []
                for wd in strip.sub("", t.lower()).split():
                    if len(wd) > max_word_len:
                        n_trunc += 1
                        wd = wd[:max_word_len]
                    hit = memo.get(wd)
                    if hit is None:
                        hit = seg_word(wd)
                        if len(memo) < 1 << 20:
                            memo[wd] = hit
                    lp, path = hit
                    word_paths.append(path)
                    total_n += path.count("|") + 1
                    total_lp += lp
                pieces_out.append(" ".join(word_paths))
                n_out.append(total_n)
                lp_out.append(total_lp)
                trunc_out.append(n_trunc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pieces": pieces_out,
                    "n_pieces": pd.array(n_out, dtype="Int64"),
                    "lp_scaled": pd.array(lp_out, dtype="Int64"),
                    "n_truncated_words": pd.array(trunc_out, dtype="Int64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        run,
        schema=(
            f"{id_col} {id_type}, pieces string, n_pieces long,"
            " lp_scaled long, n_truncated_words long"
        ),
    )
