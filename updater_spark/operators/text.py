"""Text-analysis operators: quality stats, language ID, token
counting, document fingerprinting.

All built-in Catalyst expressions (split / array lambdas / regexp) —
no Python UDFs, so these run at scan speed and compose with any
pipeline stage. Designed for the ``documents`` table
(doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from updater_spark.operators.dedup import tokens
from updater_spark.operators.tokenizer import _round_half_away

# Tiny marker-word lists for the n-gram/stopword language heuristic.
# Deliberately short and deterministic — mirrored verbatim in the
# DuckDB oracle SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "fr": ["le", "la", "et", "les", "des", "un", "est"],
    "de": ["der", "die", "und", "das", "ein", "ist", "nicht"],
    "es": ["el", "la", "de", "los", "las", "es", "una"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["it", "for", "on", "with", "as", "this"]

# BPE-ish tokenizer regex: word pieces, digit runs, single punctuation.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def _count_in(toks: Column, words: list[str]) -> Column:
    lit_arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, token counts, type-token
    ratio, stopword ratio, mean word length."""
    toks = tokens(text_col)
    n_words = F.size(toks)
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_words"),
        F.round(F.size(F.array_distinct(toks)) / n_words, 6).alias("type_token_ratio"),
        F.round(_count_in(toks, STOPWORDS_EN) / n_words, 6).alias("stopword_ratio"),
        F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t)),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            / n_words,
            6,
        ).alias("mean_word_len"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Composite heuristic quality score in [0, 1]: favors mid-length
    docs, lexical diversity, and plausible word lengths (the usual
    C4/Gopher-style filters, condensed)."""
    s = text_stats(df, id_col, text_col)
    len_ok = F.when((F.col("n_words") >= 10) & (F.col("n_words") <= 100000), 1.0).otherwise(0.3)
    diversity = F.least(F.col("type_token_ratio") * 2, F.lit(1.0))
    word_len_ok = F.when(
        (F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), 1.0
    ).otherwise(0.2)
    return s.select(
        id_col,
        F.round((len_ok * 0.4 + diversity * 0.4 + word_len_ok * 0.2), 6).alias(
            "quality"
        ),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID with a deterministic argmax (ties break
    by the fixed language order en, fr, de, es, zh)."""
    toks = tokens(text_col)
    hits = {lang: _count_in(toks, words) for lang, words in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    best = F.lit(langs[0])
    best_n = hits[langs[0]]
    for lang in langs[1:]:
        cond = hits[lang] > best_n
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_n = F.when(cond, hits[lang]).otherwise(best_n)
    out = df.select(
        F.col(id_col),
        *[hits[lang].cast("long").alias(f"{lang}_hits") for lang in langs],
        best.alias("pred_lang"),
    )
    return out


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (the cheap
    proxy pair for LLM token accounting)."""
    return df.select(
        F.col(id_col),
        F.size(tokens(text_col)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: the fraction of word / 2-gram /
    3-gram occurrences that are repeats of an earlier occurrence
    (``1 - distinct/total``). High values flag boilerplate and
    degenerate (looping) text — a standard pre-training filter.

    Pure per-row array arithmetic — no explode, no shuffle: the whole
    thing is a projection fused into the scan, so at 100 TB it runs at
    read speed with zero exchanges. Tokens are pre-materialized (see
    dedup.tokenize) so the gram lambdas slice a bound column instead
    of re-splitting the text per element.
    """
    from updater_spark.operators.dedup import tokenize

    toks = F.col("_toks")

    def gram_frac(n: int) -> Column:
        if n == 1:
            grams: Column = toks
        else:
            idx = F.sequence(
                F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))
            )
            # same slice+concat_ws gram construction as
            # dedup.word_shingles_of, but WITHOUT array_distinct —
            # here the multiplicity is the signal.
            grams = F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
            )
        return F.round(
            F.lit(1) - F.size(F.array_distinct(grams)) / F.size(grams), 6
        )

    return tokenize(df, text_col).select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_words"),
        gram_frac(1).alias("dup_word_frac"),
        gram_frac(2).alias("dup_2gram_frac"),
        gram_frac(3).alias("dup_3gram_frac"),
    )


# (name, pattern, replacement) — patterns restricted to syntax valid in
# BOTH Java regex (Spark) and RE2 (DuckDB oracle): character classes,
# bounded repetition, \b word boundaries. No lookarounds/backrefs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
]


def pii_redact(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Scrub PII-shaped spans (emails, IPv4 addresses, US-style phone
    fragments) from ``text_col``: per-pattern match counts (measured on
    the ORIGINAL text) plus the redacted text with each span replaced
    by a typed placeholder. Patterns are applied in PII_PATTERNS order
    (email first, so an address is consumed before its digit runs can
    match narrower patterns).

    Counts + replace are Catalyst ``regexp_count``/``regexp_replace``
    — a scan-fused projection, no shuffle (same scale shape as
    repetition_stats)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(
            f"n_{name}"
        )
        for name, pat, _ in PII_PATTERNS
    ]
    red = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


def _ascii_terms(text_col: str) -> Column:
    """ASCII-letter term array: split on non-letter runs, lowercase.

    Restricting terms to [A-Za-z] runs keeps lowercase semantics
    byte-identical across engines (Unicode case-folding differs
    between ICU/JVM/C library implementations; ASCII never does)."""
    return F.filter(
        F.transform(
            F.split(F.col(text_col), r"[^A-Za-z]+"), lambda t: F.lower(t)
        ),
        lambda t: t != "",
    )


def top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
) -> DataFrame:
    """Corpus-level top-k term frequencies: ``(rank, term, n_docs,
    n_occurrences)`` ordered by occurrence count (ties → term asc).

    Scale shape: explode → two-level agg. The per-(doc, term) count
    happens first so the second agg's ``n_docs`` is a plain COUNT —
    both aggs partial-combine map-side, so the shuffle carries the
    vocabulary, not the token stream. The final top-k ranks only the
    aggregated vocab (orders of magnitude smaller than the corpus);
    its single-partition window is over ≤|vocab| rows and is the
    correct place to pay that cost.
    """
    from pyspark.sql import Window

    per_doc = (
        df.select(F.col(id_col), F.explode(_ascii_terms(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tf").alias("n_occurrences")
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
    return (
        vocab.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("rank", "term", "n_docs", "n_occurrences")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_tf: int = 2,
) -> DataFrame:
    """Per-document top-k distinctive terms by TF-IDF:
    ``(doc_id, rank, term, tf, df, tfidf)``.

    Ranking is INTEGER-only — (tf desc, df asc, term asc) — so result
    order is engine-exact; the float ``tfidf = tf · ln((N+1)/(df+1))``
    is carried as a rounded output column, never compared.

    Scale shape: the doc-frequency table is a vocab-sized aggregate
    joined back on ``term`` (broadcast when the vocab is small, AQE
    decides); the corpus-wide doc count N is the one scalar collected.
    The per-doc top-k window partitions by doc — fully parallel.
    """
    from pyspark.sql import Window

    n_docs = df.select(id_col).distinct().count()
    per_doc = (
        df.select(F.col(id_col), F.explode(_ascii_terms(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .filter(F.col("tf") >= min_tf)
    )
    doc_freq = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        per_doc.join(doc_freq, "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "rank",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log(F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
                4,
            ).alias("tfidf"),
        )
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
    champion_n: int | None = None,
    persist_posting: bool = False,
) -> DataFrame:
    """BM25 top-k retrieval (Robertson & Zaragoza 2009) — the lexical
    search primitive training-data pipelines use for hard-negative
    mining, retrieval-augmented filtering, and query-based corpus
    slicing; the sparse sibling of the ANN operators.

    ``champion_n`` (opt-in, default None = exact): champion-list
    pruning (Manning et al., IIR §7.1.3) — each term's posting list
    is cut to its top-``champion_n`` documents by (tf desc, doc_id
    asc) BEFORE the query join. APPROXIMATE CONTRACT: a document
    outside a term's champion list receives no contribution from
    that term, so scores are lower bounds and low-tf matches on
    Zipf-head terms can drop out of the top-k; documents that rank
    highly do so through terms they use heavily, which is exactly
    what the cut preserves (recall@k vs exact is pytest-pinned).
    WHY: the exact join carries FULL posting lists for every query
    term — head terms make that the scale-killer (measured: the bm25
    leg was 159s of a 185s 1M-doc × 10k-query hybrid pipeline,
    PROBES_r10 ``hybrid_1m``); the cut bounds the join at
    ``champion_n`` rows per term. df/idf and document lengths stay
    EXACT (computed over the full posting list — pruning changes
    which docs score, never how a surviving doc scores). The cut is
    ONE per-term row_number window that Catalyst's WindowGroupLimit
    rule splits into a Partial (map-side, before the exchange) and a
    Final limit — each input partition pre-prunes to its local
    top-champion_n, so the shuffle carries ≤ champion_n ×
    n_partitions rows per term and no task ever sorts a full
    Zipf-head posting list.

    ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``; per matched term
    ``idf · tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``, summed per
    (query, doc). Query text is tokenized like documents and treated
    as a term SET. Ranking is over the ROUNDED score with a doc-id
    tie-break — a total order both engines reproduce (the
    ``tfidf_top_terms`` determinism discipline; raw float sums differ
    in addend order across engines, rounded ones don't at few-term
    query sizes).

    Scale shape: postings/doc-length/df are the classic three
    aggregates over the exploded term stream (all partial-combine
    map-side, shuffles carry vocab- or doc-sized rows, never the
    token stream), dl/df derived from the ONE posting subtree;
    ``persist_posting`` (opt-in) pins that subtree as a cached table
    so the corpus tokenizes once per query — measured a WIN only
    when postings are bounded (see the inline note; the full-corpus
    cache was 1.7× slower at 1M docs). The cache must outlive the
    returned lazy plan, so it is never unpersisted here: long-lived
    sessions should unpersist after their terminal action (ADVICE
    r11 — the ``score_buckets``/``cache_scored`` caveat). The query
    set joins the postings on ``term`` —
    query sets are small by construction, so AQE broadcasts them —
    and the per-query top-k window partitions by query. The one
    scalar collected is (N, avgdl).

    Returns ``(qid, rank, doc_id, score)``."""
    from pyspark.sql import Window

    # pre-apply the join-key not-null filters the optimizer would
    # push down ANYWAY (the scored join keys on term and id): with
    # them already in the shared subtree, the posting branches under
    # dfreq / dl / the query join stay canonically IDENTICAL and
    # ReuseExchange can unify them — without this, per-branch pushed
    # isnotnull() filters make each branch re-tokenize the corpus
    # (r11, guide §2.4; explode never yields NULL terms and ids are
    # keys, so the filters drop nothing)
    terms = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col), F.explode(_ascii_terms(text_col)).alias("term"))
        .filter(F.col("term").isNotNull())
    )
    posting = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    if persist_posting:
        # OPT-IN posting materialization (r11, guide §2.4 vs §5): the
        # (N, avgdl) collect below already executes the tokenize+
        # aggregate subtree, so persisting it means dl, df and the
        # query join all read the SAME computed postings instead of
        # re-tokenizing the corpus per branch (ReuseExchange only
        # unifies branches at AQE runtime, never across the separate
        # (N, avgdl) job). MEASURED BOTH WAYS at 1M docs × 10k
        # queries (hybridchamp probe): persist-ON made the EXACT leg
        # 1.7× SLOWER (110 → 183 s) — the full posting table is
        # corpus-sized, and caching it trades two cheap codegen-fused
        # recomputes for three cache materialization/read passes plus
        # storage-memory pressure (the guide §5 caching warning,
        # measured) — while the champion-cut leg (bounded postings)
        # was flat. Hence DEFAULT OFF; opt in when the posting table
        # is bounded (champion-cut, small corpora, or memory to
        # spare). Values are row-identical either way (pinned by the
        # package-boundary check).
        posting = posting.persist()
    # dl/dfreq derive from `posting`, NOT from `terms` (r11, guide
    # §2.4): dl = Σ tf per doc is the same integer as counting the
    # raw token stream, so every consumer shares the ONE tokenize +
    # (id, term) aggregate subtree, and the dl aggregate's input is
    # the (already partially combined) posting table rather than the
    # full token stream.
    dl = posting.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    n_docs, avgdl = dl.agg(
        F.count(F.lit(1)), F.sum("dl")
    ).collect()[0]
    avgdl = avgdl / n_docs
    # df over the FULL posting list, before any champion cut: idf
    # stays exact under pruning
    dfreq = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if champion_n is not None:
        if champion_n < 1:
            raise ValueError(f"champion_n must be >= 1, got {champion_n}")
        # One per-term row_number window: Catalyst's WindowGroupLimit
        # rule inserts a PARTIAL group limit BEFORE the exchange (and
        # a Final one after), so every input partition pre-prunes to
        # its local top-champion_n per term and the shuffle carries
        # <= champion_n x n_partitions rows per term — no task ever
        # sorts a full Zipf-head posting list (verified in the
        # physical plan: WindowGroupLimit ... Partial / Final).
        wg = Window.partitionBy("term").orderBy(
            F.col("tf").desc(), F.col(id_col).asc()
        )
        posting = (
            posting.withColumn("_gr", F.row_number().over(wg))
            .filter(F.col("_gr") <= champion_n)
            .drop("_gr")
        )
    qterms = queries.select(
        F.col(qid_col).alias("qid"),
        F.explode(_ascii_terms(qtext_col)).alias("term"),
    ).distinct()
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * F.col("dl") / F.lit(float(avgdl))
            )
        )
    )
    scored = (
        qterms.join(dfreq, "term")
        .join(posting, "term")
        .join(dl, id_col)
        .groupBy("qid", id_col)
        .agg(F.round(F.sum(idf * tf_part), round_digits).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", id_col, "score")
    )


def doc_fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Content fingerprints: md5 of whitespace-normalized text plus a
    31-base polynomial rolling hash over the normalized characters
    (the Rabin-Karp shape) — both pure Catalyst expressions.

    Modulus 1e9+7 keeps ``acc*31 + v`` < 2^63 (no long overflow, so the
    arithmetic is portable to any engine/oracle)."""
    norm = F.concat_ws(" ", tokens(text_col))
    # split('') gives one array element per character — the linear-time
    # path (substring(norm, i, 1) per index would be O(len²) per doc).
    chars = F.transform(F.split(F.col("_norm"), ""), lambda ch: F.ascii(ch))
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 31 + v) % F.lit(1_000_000_007),
    )
    return (
        df.withColumn("_norm", norm)
        .select(
            F.col(id_col),
            F.md5(F.col("_norm").cast("binary")).alias("md5_fp"),
            rolling.alias("rolling_fp"),
        )
    )


def chunk_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int = 64,
) -> DataFrame:
    """Split documents into overlapping token windows (the RAG /
    context-window chunking shape): chunk i covers tokens
    ``[i*stride, i*stride + chunk_tokens)``; with ``stride <
    chunk_tokens`` consecutive chunks overlap by ``chunk_tokens -
    stride`` tokens. Every token lands in ≥1 chunk; a doc shorter
    than one window yields exactly one (short) chunk.

    Pure Catalyst (split once, slice per window — no per-token
    explode, no Python): the expansion factor is ~len/stride rows per
    doc, each carrying only its window's text. Output
    ``(id, chunk_idx, n_chunk_tokens, chunk)`` — deterministic,
    engine-portable (tests + DuckDB oracle in __spark_entry__)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        # windows would leave inter-chunk gaps — tokens silently
        # dropped from every downstream consumer; always a config bug
        raise ValueError(
            f"stride ({stride}) > chunk_tokens ({chunk_tokens}) drops "
            "tokens between windows"
        )
    from updater_spark.operators.dedup import tokenize

    toked = tokenize(df, text_col)
    n = F.size("_toks")
    # window starts: 0, stride, … covering the last token; posexplode
    # gives the chunk index for free
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = toked.select(
        F.col(id_col),
        F.posexplode_outer(starts).alias("chunk_idx", "_start"),
        F.col("_toks"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.slice("_toks", F.col("_start") + 1, chunk_tokens).alias("_w"),
    )
    return chunks.select(
        id_col,
        "chunk_idx",
        F.size("_w").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", "_w").alias("chunk"),
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int = 100,
    line_sep: str = "\n",
) -> DataFrame:
    """Corpus-level boilerplate removal (the CCNet/RefinedWeb
    paragraph-frequency filter): a LINE that occurs in more than
    ``max_df`` distinct documents is boilerplate (cookie banners,
    nav menus, "subscribe" footers) and is dropped from every doc;
    remaining lines are reassembled in their original order.

    Two-shuffle shape, all Catalyst: explode lines carrying their
    position → per-line distinct-doc frequency (two-level partial
    agg) → anti-join hot lines → rebuild with an in-group
    array_sort (no window, no Python). At 100 TB the line-frequency
    table is the only wide state, and it is orders of magnitude
    smaller than the corpus (lines repeat — that is the point).

    Returns ``(id, text, n_lines, n_dropped)``; a fully-boilerplate
    doc keeps its row with empty text, so downstream length filters
    see it rather than silently losing the id."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), F.lit(line_sep))).alias(
            "_pos", "_line"
        ),
    )
    hot = (
        lines.groupBy("_line")
        .agg(F.countDistinct(id_col).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("_line")
    )
    kept = lines.join(hot, "_line", "anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_line"))
                ),
                lambda s: s["_line"],
            ),
            line_sep,
        ).alias(text_col),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(text_col, F.lit("")).alias(text_col),
            F.col("n_lines"),
            (F.col("n_lines") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_filter=None,
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document mean bigram log-probability — the first-order LM
    the CCNet-style perplexity quality filter actually wants
    (``unigram_logprob`` is its zeroth-order sibling: rare-WORD soup
    scores low there; scrambled-but-common-word soup only a
    sequence model catches). Add-k smoothed:

        P(w2|w1) = (c(w1,w2) + k) / (c(w1,·) + k·V)

    with V = |train vocabulary| and c(w1,·) the bigram-context count,
    so held-out bigrams get principled mass. ``train_filter`` (a
    Column predicate) trains the counts on a SUBSET (e.g. a trusted
    high-quality slice — the CCNet recipe trains on Wikipedia) and
    scores every document, unseen bigrams degrading smoothly to
    k/(c+kV) and unseen contexts to 1/V; None trains on the whole
    corpus (the self-perplexity signal).

    Scale shape: two partial-combining aggregates over the exploded
    bigram stream (pair counts, context counts — shuffles carry the
    bigram vocabulary, never the token stream), two left joins back
    (vocab-sized right sides, AQE broadcasts when small), one per-doc
    agg. V — one bigint — folds on the driver as a literal (the
    unigram_logprob stance: no scalar-subquery cartesian in the
    plan). Docs with < 2 tokens return ``n_bigrams = 0`` and a NULL
    score.

    Returns ``(id, n_bigrams, avg_logprob)`` rounded to 4 decimals
    (cross-engine float-sum tolerance)."""
    train = df.filter(train_filter) if train_filter is not None else df

    def _bigrams(frame: DataFrame, *keep):
        t = frame.select(*keep, tokens(text_col).alias("_toks"))
        pairs = F.when(
            F.size("_toks") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - F.lit(1)),
                lambda i: F.struct(
                    F.element_at("_toks", i).alias("w1"),
                    F.element_at("_toks", i + F.lit(1)).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        return t.select(*keep, F.explode(pairs).alias("_bg")).select(
            *keep, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2")
        )

    train_bg = _bigrams(train)
    pair_cnt = train_bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("_c12")
    )
    ctx_cnt = train_bg.groupBy("w1").agg(F.count(F.lit(1)).alias("_c1"))
    # tokens('') is [''] (the split-on-empty quirk) — the empty token
    # never forms a bigram (arrays of one) so it must not inflate V
    v = (
        train.select(F.explode(tokens(text_col)).alias("_tok"))
        .filter(F.col("_tok") != "")
        .agg(F.countDistinct("_tok"))
        .first()[0]
    )
    if not v:
        raise ValueError("train set has no tokens; nothing to model")

    doc_bg = _bigrams(df, F.col(id_col))
    logp = F.log(
        (F.coalesce(F.col("_c12"), F.lit(0)) + F.lit(add_k))
        / (
            F.coalesce(F.col("_c1"), F.lit(0))
            + F.lit(add_k) * F.lit(float(v))
        )
    )
    scored = (
        doc_bg.join(pair_cnt, ["w1", "w2"], "left")
        .join(ctx_cnt, "w1", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logprob"),
        )
    )
    # docs with < 2 tokens emit no bigram rows — reattach with NULLs
    return (
        df.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's
    OWN unigram distribution — the cheap stand-in for the LM-
    perplexity quality filter (CCNet trains a small LM; the unigram
    model is its zeroth-order version and needs no training
    artifacts). Low scores = rare-token soup (gibberish, codes,
    mangled encodings); high = common fluent vocabulary.

    Two passes over the tokens, both Catalyst: corpus term counts
    (two-level partial agg), then a token→count join and per-doc
    mean of ln(count/N). N — one bigint — is folded on the DRIVER
    (the vocab plan runs once, eagerly) and embedded as a literal:
    the scalar-subquery shape without the one-row
    BroadcastNestedLoopJoin a crossJoin would put in the plan (the
    plan lint bans cartesian nodes, and a lint that must allowlist
    benign cases stops being a lint).

    Returns ``(id, n_tokens, avg_logprob)`` with avg_logprob rounded
    to 4 decimals (cross-engine float-sum tolerance)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    )
    vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    n_total = vocab.agg(F.sum("_cnt")).first()[0]
    scored = (
        toks.join(vocab, "_tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("_cnt") / F.lit(float(n_total)))), 4
            ).alias("avg_logprob"),
        )
    )
    return scored


def backoff_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_filter=None,
    alpha: float = 0.4,
    add_k: float = 0.5,
) -> DataFrame:
    """Per-document mean trigram log-score under a Stupid Backoff LM
    (Brants et al. 2007, "Large Language Models in Machine
    Translation") — the production-shaped perplexity quality filter:
    CCNet's recipe with the unnormalized backoff score web-scale LMs
    actually use (no discounting pass, counts only). Per trigram
    position::

        S(w3|w1,w2) = c123 / c12                       if c123 > 0
                    = alpha   * c23 / c2               elif c23 > 0
                    = alpha^2 * (c3 + k) / (N + k*V)   otherwise

    with counts from the ``train_filter`` slice (the trusted-subset
    recipe — CCNet trains on Wikipedia; None = self-perplexity), N/V
    the train token total / vocabulary, and the final leg add-k
    smoothed so OOV words score smoothly instead of -inf. The backoff
    chain is exactly why this beats ``bigram_logprob`` as a filter:
    a fluent held-out sentence keeps hitting seen trigrams, while
    shuffled-but-common-word soup falls through to the penalized legs.

    Scale shape: ONE tokenize+explode pass over the train slice
    emits all three gram orders tagged, and one partial-combining
    count aggregate collapses them to the (persisted, vocab-sized)
    per-order count table — the shuffle carries the gram VOCABULARY
    of the train slice, CCNet-sized, not corpus-sized. The three
    backoff legs are then pre-divided into per-gram SCORE tables on
    the vocab side (vocab-sized joins among the count slices), so the
    corpus trigram stream takes exactly THREE left joins — tri, bi,
    uni score probes, AQE-broadcast — and one coalesce down the
    backoff chain, then one per-doc agg. N and V — two scalars —
    fold on the driver as literals (the ``unigram_logprob`` stance:
    no scalar-subquery cartesian in the plan). Docs with < 3 tokens
    return ``n_trigrams = 0`` and a NULL score.

    Cache lifetime (ADVICE r11): the vocab-sized count table is
    ``persist()``-ed and must outlive the returned LAZY plan, so this
    function never unpersists it. In a long-lived session that calls
    this repeatedly, unpersist after the terminal action via
    ``spark.catalog.clearCache()`` or by tracking
    ``df.sparkSession.catalog`` — the same caveat as
    ``score_buckets``'s ``cache_scored`` and ``bm25_topk``'s
    ``persist_posting``.

    Returns ``(id, n_trigrams, avg_logprob)`` rounded to 4 decimals
    (cross-engine float-sum tolerance)."""
    train = df.filter(train_filter) if train_filter is not None else df

    def _grams(frame: DataFrame, n: int, *keep):
        names = [f"w{j + 1}" for j in range(n)]
        t = frame.select(*keep, tokens(text_col).alias("_toks"))
        typ = "array<struct<" + ",".join(f"{c}:string" for c in names) + ">>"
        grams = F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1)),
                lambda i: F.struct(
                    *[
                        F.element_at("_toks", i + F.lit(j)).alias(c)
                        for j, c in enumerate(names)
                    ]
                ),
            ),
        ).otherwise(F.array().cast(typ))
        return t.select(*keep, F.explode(grams).alias("_g")).select(
            *keep, *[F.col(f"_g.{c}").alias(c) for c in names]
        )

    # ONE tokenize+explode+shuffle pass builds ALL THREE gram-order
    # count tables (r11, guide §2.4 "remove shuffles outright"): each
    # order's gram list is computed exactly as the old per-order
    # passes did (same token array, same element_at windows, same
    # empty-token filter on the unigram leg — tokens('') is [''], the
    # split-on-empty quirk, and 1-token docs form no grams), tagged
    # with its order and concatenated BEFORE the single explode. The
    # train slice is scanned/tokenized once instead of three times,
    # one combined partial-agg shuffle replaces three, and the
    # persisted count table (vocab-sized — the same rows the three
    # separate tables held, plus a 1-byte tag) is sliced per order,
    # so the score-table joins and the N/V action never re-scan the
    # corpus. Counts are identical integers, so every score — and
    # the oracle — is unchanged.
    _gtyp = "array<struct<_n:int,w1:string,w2:string,w3:string>>"
    _nul = F.lit(None).cast("string")

    def _tagged(n: int):
        if n == 1:
            return F.transform(
                F.filter(F.col("_toks"), lambda t: t != F.lit("")),
                lambda t: F.struct(
                    F.lit(1).alias("_n"),
                    t.alias("w1"),
                    _nul.alias("w2"),
                    _nul.alias("w3"),
                ),
            )
        return F.when(
            F.size("_toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1)),
                lambda i: F.struct(
                    F.lit(n).alias("_n"),
                    *[
                        (
                            F.element_at("_toks", i + F.lit(j))
                            if j < n
                            else _nul
                        ).alias(f"w{j + 1}")
                        for j in range(3)
                    ],
                ),
            ),
        ).otherwise(F.array().cast(_gtyp))

    gram_cnt = (
        train.select(tokens(text_col).alias("_toks"))
        .select(
            F.explode(
                F.concat(_tagged(3), _tagged(2), _tagged(1))
            ).alias("_g")
        )
        .select("_g.*")
        .groupBy("_n", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("_c"))
        .persist()
    )
    tri_cnt = gram_cnt.filter(F.col("_n") == 3).select(
        "w1", "w2", "w3", F.col("_c").alias("_c123")
    )
    bi_cnt = gram_cnt.filter(F.col("_n") == 2).select(
        "w1", "w2", F.col("_c").alias("_c12")
    )
    uni_cnt = gram_cnt.filter(F.col("_n") == 1).select(
        F.col("w1").alias("_tok"), F.col("_c").alias("_c1")
    )
    row = uni_cnt.agg(
        F.sum("_c1").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    if not row or not row["n"]:
        raise ValueError("train set has no tokens; nothing to model")
    n_total, v = float(row["n"]), float(row["v"])

    doc_tg = _grams(df, 3, F.col(id_col))
    # pre-divide each leg into a per-gram score table (vocab-sized
    # joins among the COUNT tables): the corpus stream then probes
    # three score tables and coalesces down the chain — the division
    # operands are identical longs either way, so values (and the
    # oracle) are unchanged; only the plan shape is
    denom = n_total + add_k * v
    tri_score = tri_cnt.join(bi_cnt, ["w1", "w2"]).select(
        "w1", "w2", "w3", (F.col("_c123") / F.col("_c12")).alias("_s3")
    )
    bi_score = bi_cnt.join(
        uni_cnt.withColumnRenamed("_tok", "w1"), "w1"
    ).select(
        F.col("w1").alias("w2"),
        F.col("w2").alias("w3"),
        (F.lit(alpha) * F.col("_c12") / F.col("_c1")).alias("_s2"),
    )
    uni_score = uni_cnt.select(
        F.col("_tok").alias("w3"),
        (
            F.lit(alpha * alpha)
            * (F.col("_c1") + F.lit(add_k))
            / F.lit(denom)
        ).alias("_s1"),
    )
    oov = alpha * alpha * add_k / denom
    score = F.coalesce(
        F.col("_s3"), F.col("_s2"), F.col("_s1"), F.lit(oov)
    )
    scored = (
        doc_tg.join(tri_score, ["w1", "w2", "w3"], "left")
        .join(bi_score, ["w2", "w3"], "left")
        .join(uni_score, "w3", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.avg(F.log(score)), 4).alias("avg_logprob"),
        )
    )
    # docs with < 3 tokens emit no trigram rows — reattach with NULLs
    return (
        df.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_trigrams", F.lit(0)).alias("n_trigrams"),
            "avg_logprob",
        )
    )


def score_buckets(
    scored: DataFrame,
    score_col: str = "avg_logprob",
    probs: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    labels: tuple[str, ...] = ("tail", "middle", "head"),
    out: str = "bucket",
    thresh_digits: int | None = 4,
    cache_scored: bool = True,
) -> DataFrame:
    """CCNet-style percentile bucketing over any per-document score:
    compute ``len(probs)`` EXACT percentile thresholds over the
    non-NULL scores, then label every row map-side — ``labels[i]``
    covers scores in [t_{i-1}, t_i), the last label taking
    ``score >= t_last`` (boundary scores promote). NULL scores get a
    NULL bucket. This is the scale-correct filter shape (CCNet §4.3
    cuts the corpus into head/middle/tail at perplexity terciles):
    ONE single-column aggregate job computes the thresholds, which
    fold back into the plan as literals, so the labeling pass is a
    pure map — no global sort, no ntile window over the corpus.

    ``percentile`` is exact (linear interpolation) and buffers the
    score column on one executor; for >1e9 docs switch to
    ``approx_percentile`` and accept sketch-accuracy thresholds (the
    labeling stays exact either way). ``thresh_digits`` rounds the
    interpolated thresholds (half-away-from-zero — Spark/DuckDB
    round()) to the SCORE column's own precision before comparing:
    cross-engine percentile interpolation agrees only to an ulp
    (measured: Spark ``percentile`` vs DuckDB ``quantile_cont``
    differ in the last bit on tercile positions), and an unrounded
    threshold turns that ulp into a bucket flip for every score
    exactly at the boundary. Over d-digit scores a tercile
    interpolation point keeps ≥ (10^-d)/6 distance from any rounding
    boundary, so rounding both engines' thresholds to d digits makes
    the cut deterministic. (A plain median over evenly-spaced scores
    CAN land exactly on a half boundary — knife-edge by nature; pass
    thresh_digits=None to compare raw.) Raises if ``labels`` is not
    one longer than ``probs``, or if no non-NULL scores exist.

    ``cache_scored`` persists the input before the threshold action:
    the threshold agg and the labeled output otherwise BOTH recompute
    the (typically expensive — a whole LM scoring pass) upstream
    (measured 83s → 30s on the backoff pipeline at sf0.1). The cache
    is the narrow per-doc score frame, not the gram stream; at >1e9
    docs prefer writing the scored frame to storage between the two
    passes and pass cache_scored=False."""
    if len(labels) != len(probs) + 1:
        raise ValueError(
            f"need len(labels) == len(probs) + 1, got {len(labels)} labels "
            f"for {len(probs)} thresholds"
        )
    if sorted(probs) != list(probs):
        raise ValueError(f"probs must be ascending, got {probs!r}")
    if cache_scored:
        scored = scored.persist()
    arr = ", ".join(repr(p) for p in probs)
    row = (
        scored.filter(F.col(score_col).isNotNull())
        .agg(F.expr(f"percentile({score_col}, array({arr}))").alias("t"))
        .first()
    )
    if row is None or row["t"] is None:
        raise ValueError(f"no non-NULL {score_col!r} values to bucket")
    thresholds = list(row["t"])
    if thresh_digits is not None:
        scale = 10.0 ** thresh_digits
        thresholds = [
            _round_half_away(t * scale) / scale for t in thresholds
        ]
    expr = F.lit(labels[0])
    for t, lab in zip(thresholds, labels[1:]):
        expr = F.when(F.col(score_col) >= F.lit(t), F.lit(lab)).otherwise(
            expr
        )
    expr = (
        F.when(F.col(score_col).isNull(), F.lit(None).cast("string"))
        .otherwise(expr)
    )
    return scored.withColumn(out, expr)


def pmi_collocations(
    df: DataFrame,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information —
    the classic corpus-analytics signal for multi-word expressions
    (Church & Hanks 1990):

        PMI(w1,w2) = ln( p(w1 w2) / (p(w1) p(w2)) )

    with p(w1 w2) = c12/N_bigrams and p(w) = c(w)/N_unigrams.
    ``min_count`` drops rare pairs (PMI's known low-frequency bias:
    a hapax pair of two hapax words maxes the score); ties break on
    the words so the top-k set is a total order both engines
    reproduce.

    Scale shape: two partial-combining aggregates over the exploded
    token/bigram streams (the shuffles carry the vocab and the bigram
    vocab, never the corpus), two vocab-sized joins back (AQE
    broadcasts small sides), one TakeOrdered top-k. Both totals fold
    on the driver as literals (the unigram_logprob stance — no
    scalar-subquery cartesian in the plan).

    Returns ``(w1, w2, n_pair, pmi)`` with pmi rounded
    (cross-engine libm tolerance)."""
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toked = df.select(tokens(text_col).alias("_toks"))
    unis = toked.select(F.explode("_toks").alias("_tok")).filter(
        F.col("_tok") != ""
    )
    uni_cnt = unis.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    bis = toked.select(
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - F.lit(1)),
                    lambda i: F.struct(
                        F.element_at("_toks", i).alias("w1"),
                        F.element_at("_toks", i + F.lit(1)).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("_bg")
    ).select("_bg.w1", "_bg.w2")
    pair_cnt = bis.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    n_uni = uni_cnt.agg(F.sum("_c")).first()[0] or 0
    n_bi = pair_cnt.agg(F.sum("n_pair")).first()[0] or 0
    if n_bi == 0:
        raise ValueError("corpus has no bigrams; nothing to rank")
    c1 = uni_cnt.select(
        F.col("_tok").alias("w1"), F.col("_c").alias("_c1")
    )
    c2 = uni_cnt.select(
        F.col("_tok").alias("w2"), F.col("_c").alias("_c2")
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair") / F.lit(float(n_bi)))
            / (
                (F.col("_c1") / F.lit(float(n_uni)))
                * (F.col("_c2") / F.lit(float(n_uni)))
            )
        ),
        round_digits,
    )
    return (
        pair_cnt.filter(F.col("n_pair") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .select("w1", "w2", "n_pair", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(k)
    )


# html_extract's tag/entity chain, shared module-level so the DuckDB
# oracle generator can replay the IDENTICAL patterns in the IDENTICAL
# order. RE2-safe by construction: no backreferences (DuckDB's regex
# engine lacks them), no lookaround — each container tag gets its own
# literal open..close pattern instead of <(script|style)>.*?</\1>.
HTML_DROP_BLOCKS = [
    r"(?is)<!--.*?-->",
    r"(?is)<script\b[^>]*>.*?</script\s*>",
    r"(?is)<style\b[^>]*>.*?</style\s*>",
    r"(?is)<noscript\b[^>]*>.*?</noscript\s*>",
]
# block-level tags become newlines (block segmentation); everything
# else strips to a space so inline tags never glue words together
HTML_BLOCK_TAG = (
    r"(?is)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|table|blockquote|"
    r"section|article|header|footer|pre)\b[^>]*>"
)
HTML_ANY_TAG = r"(?s)<[^>]*>"
# fixed entity table, decoded in ORDER — &amp; must come last so a
# double-escaped "&amp;lt;" decodes exactly one level (to "&lt;")
HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
]


def html_extract(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """HTML -> text extraction: the ingestion edge of a web-crawl
    pipeline (every RefinedWeb/CCNet-style corpus starts as raw HTML;
    ``strip_boilerplate`` and ``quality_score`` assume extracted
    text already exists — this produces it).

    Honest, LOSSY, fully declarative: a fixed chain of regexp
    replaces, not an HTML5 parser. Comments and script/style/noscript
    containers drop with their content; block-level tags become line
    breaks (block segmentation); remaining tags strip to a space (so
    ``foo<b>bar</b>`` never glues to ``foobar``); a fixed entity
    table decodes (&amp; last, so double-escaped entities decode one
    level); whitespace collapses and empty blocks drop. Malformed
    markup degrades gracefully — an unclosed <script> eats to the
    next </script> or survives as text, exactly as the patterns say.

    Pure Catalyst regexp chain: runs at scan speed inside whole-stage
    codegen, zero shuffles, zero Python — at 100 TB this is a map-only
    stage that fuses with whatever filter follows it. Output
    ``(id, text, n_blocks)`` with blocks newline-joined, the exact
    shape strip_boilerplate consumes."""
    s = F.col(html_col)
    for pat in HTML_DROP_BLOCKS:
        s = F.regexp_replace(s, pat, "")
    s = F.regexp_replace(s, HTML_BLOCK_TAG, "\n")
    s = F.regexp_replace(s, HTML_ANY_TAG, " ")
    for ent, repl in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(repl))
    s = F.regexp_replace(s, r"[ \t\r]+", " ")
    blocks = F.filter(
        F.transform(F.split(s, "\n"), lambda b: F.trim(b)),
        lambda b: b != "",
    )
    return df.select(
        F.col(id_col),
        F.array_join(blocks, "\n").alias(text_col),
        F.size(blocks).cast("long").alias("n_blocks"),
    )


def rrf_fuse(
    ranked: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    qid_col: str = "qid",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    round_digits: int = 6,
    validate_unique: bool = False,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) —
    the standard hybrid-retrieval combiner: given N ranked lists over
    the same (query, doc) space (BM25's lexical top-k, an ANN dense
    top-k, ...), score every candidate ``sum over lists of
    1/(rrf_k + rank)`` and re-rank. Rank-only fusion needs no score
    calibration between a BM25 log-sum and a cosine — that is the
    point of RRF, and why it is the default in hybrid search stacks.

    Determinism contract: contributions are exact double divisions;
    for TWO lists the sum is order-free (IEEE addition of two
    addends commutes), so the rounded score is bit-identical on any
    engine. Beyond two lists the grouped-sum addend order is
    engine-dependent and ``round_digits`` absorbs the ulp — pin an
    oracle only on two-list fusions. Final order (rrf_score DESC,
    id ASC) is total.

    Scale shape: one union of k-per-query rows per list (inputs are
    already top-k — tiny relative to any corpus), one groupBy
    (query, doc) with map-side partial aggregation, one per-query
    top-k window. The corpus itself is never touched.

    Input contract: each list must be rank-UNIQUE per (query, doc) —
    the shape every top-k operator here emits. A duplicated pair
    inside one list would sum both contributions and inflate
    ``n_sources``. ``validate_unique=True`` enforces it with one
    eager duplicate-count per list (inputs are k-per-query-sized, so
    the pass is cheap — but it IS an action, and an uncached
    upstream plan recomputes for the real fusion; cache first or
    leave it off for inputs correct by construction, which all
    call sites here are). On violation it raises naming the
    offending list index and one example (qid, doc_id).

    Returns ``(qid, doc_id, rrf_score, n_sources, rank)``."""
    from pyspark.sql import Window

    if len(ranked) < 2:
        raise ValueError(
            f"rrf_fuse needs >= 2 ranked lists, got {len(ranked)}"
        )
    if rrf_k < 1 or k < 1:
        raise ValueError(f"k and rrf_k must be >= 1, got k={k} rrf_k={rrf_k}")
    if validate_unique:
        for i, p in enumerate(ranked):
            dup = (
                p.groupBy(qid_col, id_col)
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"rrf_fuse: ranked list {i} is not rank-unique per "
                    f"({qid_col}, {id_col}): e.g. "
                    f"({dup[0][qid_col]}, {dup[0][id_col]}) appears "
                    f"{dup[0]['_n']} times"
                )
    parts = ranked[0].select(qid_col, id_col, rank_col)
    for p in ranked[1:]:
        parts = parts.unionByName(p.select(qid_col, id_col, rank_col))
    fused = parts.groupBy(qid_col, id_col).agg(
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col))),
            round_digits,
        ).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return fused.withColumn(
        rank_col, F.row_number().over(w).cast("long")
    ).filter(F.col(rank_col) <= k)


# url_normalize's tracking-parameter blocklist, module-level so the
# DuckDB oracle generator replays the IDENTICAL pattern. RE2-safe:
# (?i) works in both Java regex and RE2. Case-insensitive and the
# '=' optional (ADVICE r9): 'UTM_SOURCE=x', 'Fbclid=z' and a bare
# '?utm_source' are the same tracking noise as the lowercase valued
# forms — leaving them split otherwise-identical pages into distinct
# dedup keys, the opposite of the operator's purpose.
URL_TRACKING_PARAM = r"(?i)^(utm_[a-z0-9_]*|fbclid|gclid|msclkid|ref)(=|$)"


def url_normalize(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_norm",
) -> DataFrame:
    """Dedup-oriented URL canonicalization — the other half of the
    web-ingestion edge next to ``html_extract``: crawl frontiers see
    the same page as ``HTTP://WWW.Site.com:80/a/?b=2&a=1&utm_x=t#f``
    and ``http://site.com/a?a=1&b=2``; URL-level dedup only works
    after both collapse to one key.

    Canonicalization steps (fixed, documented, replayed exactly by
    the oracle): trim; scheme and host lowercase (path/query case is
    data); default ports drop (:80 for http, :443 for https);
    leading ``www.`` drops (dedup-oriented — aggressive for serving,
    right for corpus keys); trailing path slashes drop; the fragment
    drops; query parameters drop the tracking blocklist
    (``URL_TRACKING_PARAM``: utm_*, fbclid, gclid, msclkid, ref —
    case-insensitive, valued or bare), then SORT lexicographically
    and rejoin. A row that does not look
    like ``scheme://authority...`` passes through trimmed-only (no
    guessing).

    Pure Catalyst (regexp extracts + array sort/filter/join): a
    map-only projection, zero shuffles — at crawl scale this fuses
    with the scan, and the downstream URL-dedup groupBy shuffles
    canonical KEYS, never pages. Returns the input plus
    ``(out_col, host)``."""
    u = F.trim(F.col(url_col))
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    auth = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    auth = F.when(
        (scheme == "http") & auth.endswith(":80"),
        F.substring(auth, F.lit(1), F.length(auth) - 3),
    ).when(
        (scheme == "https") & auth.endswith(":443"),
        F.substring(auth, F.lit(1), F.length(auth) - 4),
    ).otherwise(auth)
    host = F.regexp_replace(auth, r"^www\.", "")
    path = F.regexp_replace(
        F.regexp_extract(
            u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ),
        r"/+$",
        "",
    )
    qraw = F.regexp_extract(u, r"\?([^#]*)", 1)
    qkept = F.array_sort(
        F.filter(
            F.split(qraw, "&"),
            lambda p: (p != "") & ~p.rlike(URL_TRACKING_PARAM),
        )
    )
    query = F.array_join(qkept, "&")
    norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), query)
        ),
    )
    return df.withColumn(
        out_col, F.when(scheme == "", u).otherwise(norm)
    ).withColumn("host", F.when(scheme == "", F.lit(None)).otherwise(host))


# encoding_quality's shared patterns (module-level for oracle
# generation, the html_extract discipline). \x{...} escapes work in
# BOTH Java regex (Spark) and RE2 (DuckDB); � would not (RE2
# lacks \u). The mojibake list is literal double-encoding signatures
# (UTF-8 bytes read back as Latin-1/cp1252): no regex metacharacters,
# so the alternation needs no escaping.
ENC_REPLACEMENT = r"\x{FFFD}"
ENC_CONTROL = r"[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]"
MOJIBAKE_SIGNS = [
    "Ã©", "Ã¨", "Ã¤", "Ã¶", "Ã¼", "Ã±", "Ã§", "Ã¡", "Ã³",
    "â€™", "â€œ", "â€“", "Â«", "Â»", "Â°",
]
MOJIBAKE_PATTERN = "|".join(MOJIBAKE_SIGNS)


def encoding_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encoding-quality signals — the ingestion-QA step between raw
    bytes and every downstream text operator: crawl corpora arrive
    with U+FFFD replacement characters (decode failures upstream),
    stray C0 control bytes, and MOJIBAKE (UTF-8 bytes decoded as
    Latin-1/cp1252 — 'é' rendered as 'Ã©', curly quotes as 'â€™'),
    and encoding-broken documents poison tokenizers and dedup keys
    alike (CCNet/RefinedWeb both filter on encoding health).

    Detection is honest pattern counting, not a charset detector:
    the replacement char, the C0 control class (tab/newline/CR are
    legitimate and excluded), and a fixed list of double-encoding
    signatures (``MOJIBAKE_SIGNS``). ``enc_ok`` = zero hits of all
    three. NULL text yields NULL counts (propagates like the other
    text ops).

    Pure Catalyst regexp counts: map-only, zero shuffles, fuses with
    the scan — the html_extract scale shape. Returns the id plus
    ``(n_replacement, n_control, n_mojibake, enc_ok)``."""
    s = F.col(text_col)
    n_rep = F.regexp_count(s, F.lit(ENC_REPLACEMENT)).cast("long")
    n_ctl = F.regexp_count(s, F.lit(ENC_CONTROL)).cast("long")
    n_moj = F.regexp_count(s, F.lit(MOJIBAKE_PATTERN)).cast("long")
    return df.select(
        F.col(id_col),
        n_rep.alias("n_replacement"),
        n_ctl.alias("n_control"),
        n_moj.alias("n_mojibake"),
        F.when(s.isNull(), F.lit(None).cast("int"))
        .otherwise(
            ((n_rep == 0) & (n_ctl == 0) & (n_moj == 0)).cast("int")
        )
        .alias("enc_ok"),
    )
