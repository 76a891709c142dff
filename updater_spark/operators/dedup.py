"""Deduplication operators for large-scale training-data pipelines.

Beyond reference parity (BASELINE.json north star): exact dedup,
MinHash+LSH, SimHash, and n-gram Jaccard — all expressed with built-in
Catalyst array/lambda expressions (no Python UDFs), so the hot path is
whole-stage-codegen'd JVM work and scales linearly with executors.

Scale design notes (100 TB):
- exact dedup is one hash-shuffle on the dedup key (map-side partial
  aggregation makes the shuffle carry ~unique keys only).
- MinHash/LSH: signature computation is a single explode + groupBy
  (one shuffle keyed by doc); banding shuffles once more on
  (band, band_hash). Bucket join output is bounded by bucket sizes —
  salt oversized buckets (cap via ``max_bucket``) to dodge skew.
- n-gram Jaccard's shingle self-join explodes quadratically on common
  shingles — use it only AFTER an LSH candidate filter at scale; the
  direct form here is the small-data verifier.
- shingle units: every shingle-based operator takes a unit switch —
  ``word`` (whitespace tokens, the Latin default) or ``char``
  (codepoint n-grams, the honest unit for CJK/Thai and other
  no-whitespace scripts, where the word unit sees one giant token
  per document and near-dups sail through undetected).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime for the universal-hash family (public-domain
# construction: h_i(x) = (a_i * x + b_i) mod p, datasketch-style).
MERSENNE_P = (1 << 61) - 1


def tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def tokenize(df: DataFrame, text_col: str, out: str = "_toks") -> DataFrame:
    """Materialize the whitespace token array as a real column.

    ALWAYS pre-tokenize before building shingles: a higher-order
    function whose lambda references the raw ``split(...)`` expression
    (as the gram builder's ``slice(toks, i+1, n)`` does) gets the
    split INLINED INTO THE LAMBDA by Catalyst and re-splits the text
    once per array element — O(len²) regex work per doc (measured 7×
    slower on the sf0.1 corpus). A multiply-referenced non-cheap
    alias survives CollapseProject, so the split runs once per row."""
    return df.withColumn(out, tokens(text_col))


def word_shingles_of(toks_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a PRE-MATERIALIZED token
    array column (see ``tokenize``) as an array<string> (the classic
    shingling step; MMDS ch.3).

    ``slice``-based gram construction measured ~2× faster than
    per-position ``element_at`` lookups (element_at pays ordinal/null
    handling per call; slice+concat_ws stays in one specialized loop).
    Short docs (< n tokens) yield their single partial gram."""
    toks = F.col(toks_col) if isinstance(toks_col, str) else toks_col
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return F.array_distinct(grams)


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Shingles straight from a text column. Convenience for small
    inputs/tests — hot paths must use ``tokenize`` +
    ``word_shingles_of`` (see tokenize docstring for the O(len²)
    trap this form carries)."""
    return word_shingles_of(tokens(text_col), n)


def normalize_ws(text_col: str | Column) -> Column:
    """Whitespace-collapsed text (trim + runs → single space): the
    canonical form char shingles are taken over, so formatting
    differences never split a shingle."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_replace(F.trim(c), r"\s+", " ")


def char_shingles_of(
    norm_col: str | Column, n: int = 5, chars_col: str | Column | None = None
) -> Column:
    """Distinct character n-gram shingles from a PRE-MATERIALIZED
    whitespace-normalized column (see ``normalize_ws`` — the same
    materialize-first rule as ``word_shingles_of``: a lambda
    referencing the raw regexp_replace would re-run it per element).

    This is the script-honest shingle unit (VERDICT r9 #1): the word
    unit tokenizes on ``\\s+``, so a Chinese/Japanese/Thai document
    with no spaces becomes ONE "word" and yields ~zero shingles —
    MinHash/SimHash/Jaccard then silently pass CJK near-duplicates.
    Character n-grams need no word boundaries; ``substr`` counts
    CODEPOINTS (not bytes) in both Spark and DuckDB, so the unit is
    script-agnostic and oracle-exact. n=4-6 is the standard range
    for near-dup detection over unsegmented scripts (n-gram density
    per codepoint is ~1, vs ~1 per word for word shingles — shingle
    volume grows ~5×, the price of honesty; the LSH banding and
    skew caps downstream are unchanged).

    Docs shorter than ``n`` chars yield their single partial gram,
    mirroring ``word_shingles_of``.

    ``chars_col``: optionally a PRE-MATERIALIZED ``split(norm, '')``
    column. ``substr(i, n)`` re-scans the string's bytes from the
    start to find codepoint ``i`` (UTF-8 offsets are not random
    access), so the gram transform is O(len²) per document without
    it; the array-slice path is O(len·n) (r11, measured 1.6× on the
    langid gram build — same values byte-for-byte, including the
    empty-string single-partial-gram edge: split('','') is ['']
    and slices of it re-join to ''). Hot paths (``shingles_frame``,
    ``simhash``, ``decontam``) all pass it."""
    t = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - n + 1, F.lit(1)))
    if chars_col is not None:
        return F.array_distinct(_char_grams(t, chars_col, n))
    return F.array_distinct(F.transform(idx, lambda i: t.substr(i, F.lit(n))))


def _char_grams(norm: Column, chars_col: str | Column, n: int) -> Column:
    """POSITIONAL codepoint n-grams via O(1) array slices over a
    pre-materialized split-to-chars column (must be a real column —
    an inline ``split`` inside the lambda would re-split the string
    once per element, the tokenize materialize-first rule).

    Gram = ``concat_ws('', get(c, i-1), ..., get(c, i+n-2))`` — n
    O(1) element lookups, no intermediate array. Microbenched (r11,
    10 M chars per shape, best-of-3 noop) against the two
    alternatives at n=5:

    ========  ========  =========  ======
    doc len   substr    slice+join  get
    ========  ========  =========  ======
    250       0.343 s   2.000 s    0.470 s
    1000      0.870 s   1.982 s    0.415 s
    4000      2.958 s   1.877 s    0.426 s
    ========  ========  =========  ======

    ``substr`` is O(len²) per doc (each lookup re-scans the UTF-8
    bytes to codepoint ``i``); ``slice``+``array_join`` is O(len·n)
    but pays a per-gram array allocation; ``get``+``concat_ws`` is
    O(len·n) and flat — the only shape safe for long documents.

    The index bound deliberately comes from ``size(chars)`` rather
    than ``length(norm)``: referencing the chars column in the bound
    as well as the lambda stops CollapseProject from inlining the
    non-cheap ``split`` into the lambda body, where it would be
    re-evaluated once per ELEMENT — measured as a 2.5–5× regression
    on dedup_char_lsh/decontam_char when the bound used ``length``
    and the single-reference projection collapsed (r11; the plan
    showed the split inside the lambdafunction). Values are
    identical: split never emits a trailing empty, so
    ``size(split(s,'')) == length(s)`` for non-empty ``s``, and the
    empty-string edge (``split('','') == ['']`` → size 1) yields the
    same single partial gram as ``greatest(length-n+1, 1)``.

    Edge parity with the substr path (pytest-pinned): NULL text →
    ``[NULL]`` (the first-char NULL guard — ``concat_ws`` alone
    would turn all-NULL lookups into ``''``), empty text → ``['']``,
    text shorter than n → one partial gram (``concat_ws`` skips the
    NULL out-of-bounds lookups)."""
    c = F.col(chars_col) if isinstance(chars_col, str) else chars_col
    if n == 1:
        # the chars array IS the 1-gram list (split('','') == ['']
        # matches the single-partial-gram convention); NULL text
        # must still yield [NULL], not NULL (the substr contract)
        return F.when(
            c.isNull(), F.array(F.lit(None).cast("string"))
        ).otherwise(c)
    idx = F.sequence(
        F.lit(1), F.greatest(F.size(c) - n + 1, F.lit(1))
    )

    def gram(i: Column) -> Column:
        g0 = F.get(c, i - 1)
        rest = [F.get(c, i + k - 1) for k in range(1, n)]
        return F.when(g0.isNull(), F.lit(None).cast("string")).otherwise(
            F.concat_ws("", g0, *rest)
        )

    return F.transform(idx, gram)


def shingles_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    shingle_unit: str = "word",
) -> DataFrame:
    """``(id, sh array<string>)`` — the unit-dispatched shingle-set
    builder every dedup operator shares. ``shingle_unit``: ``word``
    (whitespace tokens, the Latin-script default) or ``char``
    (codepoint n-grams, the no-whitespace-script-honest unit)."""
    if shingle_unit == "word":
        return tokenize(df, text_col).select(
            F.col(id_col).alias("id"),
            word_shingles_of("_toks", n).alias("sh"),
        )
    if shingle_unit == "char":
        return (
            df.withColumn("_norm", normalize_ws(text_col))
            .withColumn("_chars", F.split(F.col("_norm"), ""))
            .select(
                F.col(id_col).alias("id"),
                char_shingles_of("_norm", n, "_chars").alias("sh"),
            )
        )
    raise ValueError(
        f"shingle_unit must be 'word' or 'char', got {shingle_unit!r}"
    )


def md5_hash32(c: Column) -> Column:
    """Portable 32-bit base hash: first 8 hex chars of md5 as a long.

    Engine-portable twin of ``pmod(xxhash64, 2^32)`` — every SQL
    engine renders md5 identically, so a DuckDB/Trino oracle can
    reproduce MinHash signatures bit-for-bit (same precedent as the
    md5-vs-crc32 fingerprint split, updater_spark.demo). The xxhash64
    default stays the production path (pure JVM, no hex round-trip)."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


def md5_hash64(c: Column) -> Column:
    """Portable 64-bit base hash from two md5 hex windows.

    Built as signed arithmetic ``(hi - 2^32 if hi >= 2^31 else hi) *
    2^32 + lo`` rather than shifts: bit-identical to ``(hi<<32)|lo``
    in two's complement, but expressible in engines whose shift
    operators overflow-check (DuckDB)."""
    hexstr = F.md5(c.cast("binary"))
    hi = F.conv(F.substring(hexstr, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hexstr, 9, 8), 16, 10).cast("long")
    hi_signed = F.when(hi >= F.lit(1 << 31), hi - F.lit(1 << 32)).otherwise(hi)
    return hi_signed * F.lit(1 << 32) + lo


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup via hash-groupBy: one representative (min id) per
    distinct key tuple, plus multiplicity."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _hash_coeffs(num_hashes: int, seed: int = 7) -> list[tuple[int, int, int]]:
    """Deterministic (a, b, r) triples — reproducible across runs and
    in the pure-Python test oracle.

    Sized so ``a * (h ^ r) + b`` stays < 2^63 for 32-bit base hashes
    (a, b < 2^30; r < 2^32): the fold is plain signed-long arithmetic,
    portable to any engine with 64-bit ints — no 128-bit
    intermediates.

    The per-slot XOR mask ``r`` is essential, not decoration: with a
    bare linear fold ``(a*h+b) mod p`` and a small, the product never
    wraps past p for small base hashes, so ONE shingle with a tiny
    32-bit hash achieves the minimum in (nearly) every slot and the
    estimator collapses (observed: a true-J=0.90 pair matching 4/64
    slots). XORing h with an independent mask per slot breaks the
    cross-slot ordering correlation (measured estimator bias after
    fix: |mean error| < 0.01 at 64 hashes)."""
    coeffs = []
    state = seed

    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        return state

    for _ in range(num_hashes):
        a = (nxt() % ((1 << 30) - 1)) + 1
        b = nxt() % (1 << 30)
        r = nxt() % (1 << 32)
        coeffs.append((a, b, r))
    return coeffs


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    seed: int = 7,
    base_hash=None,
    shingle_unit: str = "word",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """``(id, signature array<long>)`` — element i is min over
    shingles of ((a_i * (base_hash(shingle) ^ r_i) + b_i) mod p).

    One explode + one groupBy (single shuffle keyed by doc id); the
    per-shingle k-way hashing is a JVM ``transform`` over a literal
    coefficient array, no Python in the loop.

    ``base_hash``: Column→Column producing a non-negative 32-bit base
    hash. Default is ``pmod(xxhash64, 2^32)`` (fast JVM path); pass
    ``md5_hash32`` for an output any SQL engine can reproduce exactly
    (driver oracle queries do).

    ``shingle_unit``: ``word`` (default) or ``char`` — char n-grams
    make the signature honest on no-whitespace scripts (CJK/Thai),
    where the word unit sees one giant "word" and the estimator
    collapses (see ``char_shingles_of``); use shingle_n ≈ 5 there.
    """
    if base_hash is None:
        base_hash = lambda c: F.pmod(F.xxhash64(c), F.lit(1 << 32))  # noqa: E731
    coeffs = _hash_coeffs(num_hashes, seed)
    # explode_outer: plain explode's inferred size>0 filter re-inlines
    # the gram build below the token projection (see tokenize
    # docstring); shingle arrays are never empty so outer ≡ inner.
    base = (
        shingles if shingles is not None
        else shingles_frame(df, id_col, text_col, shingle_n, shingle_unit)
    ).select(
        "id",
        F.explode_outer("sh").alias("shingle"),
    ).select(
        "id",
        # non-negative 32-bit base hash (keeps a*h+b < 2^63, see
        # _hash_coeffs)
        base_hash(F.col("shingle")).alias("h"),
    )
    # direct per-occurrence hashing. A dictionary variant (hash each
    # DISTINCT shingle once, join back) was measured SLOWER here —
    # the extra shuffle costs more than the ~5× saved hash evaluations
    # at a 4.6:1 repeat ratio; revisit only for corpora with very
    # heavy shingle repetition (boilerplate-dominated crawls).
    #
    # k flat scalar columns, NOT one zip_with array: higher-order
    # functions are interpreted (no whole-stage codegen), while k
    # scalar projections + k min aggregates stay codegen'd — measured
    # 1.5× faster end-to-end at 64 hashes on the sf0.1 corpus.
    n = num_hashes
    proj = base.select(
        "id",
        *[
            (
                (F.lit(a) * F.col("h").bitwiseXOR(F.lit(r)) + F.lit(b))
                % F.lit(MERSENNE_P)
            ).alias(f"h{i}")
            for i, (a, b, r) in enumerate(coeffs)
        ],
    )
    agg = proj.groupBy("id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(n)]
    )
    return agg.select(
        "id", F.array(*[F.col(f"m{i}") for i in range(n)]).alias("signature")
    )


def band_hashes(
    signatures: DataFrame, bands: int = 16, band_hash=None
) -> DataFrame:
    """``(id, band, band_hash)`` — the LSH banding step: hash each of
    ``bands`` contiguous signature slices. Shared by the one-shot
    candidate-pair scan and the incremental index (dedup_index.py),
    which persists exactly this table as probe state.

    ``band_hash``: Column→Column over the comma-joined slot string;
    default xxhash64 (JVM fast path), pass ``md5_hash32`` for SQL-
    engine-reproducible band keys."""
    if band_hash is None:
        band_hash = F.xxhash64
    first = signatures.select(F.size("signature")).first()
    # empty input (e.g. a deletes-only CDC epoch's delta): keep the
    # same expression tree so the zero-row output is schema-identical
    # to the populated path (unionByName-safe in dedup_index state)
    n = bands if first is None else first[0]
    rows_per_band = n // bands
    return signatures.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    band_hash(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("signature", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    max_bucket: int = 200,
    band_hash=None,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (id_a < id_b) that
    collide in ≥1 band. ``max_bucket`` drops degenerate buckets (all-
    identical boilerplate) that would explode quadratically — the
    standard skew guard; dropped buckets should be handled by exact
    dedup first."""
    banded = band_hashes(signatures, bands, band_hash)
    grouped = banded.groupBy("band", "band_hash").agg(
        F.collect_list("id").alias("ids")
    )
    bounded = grouped.filter(
        (F.size("ids") > 1) & (F.size("ids") <= max_bucket)
    )
    # chained explodes stream the pairs through codegen'd Generate
    # nodes; a nested transform+flatten+filter would materialize the
    # full |bucket|^2 array per bucket in interpreted HOF code.
    pairs = (
        bounded.select("ids", F.explode("ids").alias("id_a"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    return pairs.distinct()


def lsh_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 7,
    shingle_unit: str = "word",
    persist_shingles: bool = False,
) -> DataFrame:
    """THE at-scale near-dup pipeline: MinHash+LSH proposes candidate
    pairs (sub-quadratic), exact n-gram Jaccard verifies ONLY those
    candidates — the composition the direct ``ngram_jaccard_pairs``
    docstring defers to for large corpora, where the shingle inverted
    index's pair expansion would explode quadratically on common
    shingles.

    Cost shape at 100 TB: signatures + banding are two bounded
    shuffles; the verify join touches |candidates| rows (≪ n²), each
    carrying its two shingle sets once. Output ⊆ the exact operator's
    output, with identical jaccard values on every emitted pair
    (asserted in tests/test_dedup.py). ``shingle_unit='char'`` (with
    n ≈ 5) runs the same pipeline over codepoint n-grams — the
    honest unit for no-whitespace scripts.

    ``persist_shingles`` (r11, opt-in): build the per-doc shingle
    frame ONCE and persist it (MEMORY_AND_DISK) — it feeds the
    signature aggregate AND both sides of the verify join, so the
    lazy default re-normalizes and re-shingles the corpus three
    times per execution. The persisted frame is corpus-shaped
    (≈ the text rewritten as grams): opt in when memory+disk can
    hold it, exactly like materializing the signature table in a
    production pipeline. Values are identical either way."""
    sh = shingles_frame(df, id_col, text_col, n, shingle_unit)
    if persist_shingles:
        sh = sh.persist()
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, n, seed,
        shingle_unit=shingle_unit, shingles=sh,
    )
    cand = lsh_candidate_pairs(sigs, bands)
    return verify_pairs_exact(
        df, cand, id_col, text_col, n, threshold, shingle_unit,
        shingles=sh,
    )


def verify_pairs_exact(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    shingle_unit: str = "word",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard computed ONLY for the given candidate
    ``pairs`` (columns id_a, id_b) — the refine step after any
    sub-quadratic candidate generator (one-shot LSH, the incremental
    index, SimHash banding). Each side's shingle set is built once and
    joined in by id; cost is O(|pairs|), never O(n²)."""
    sh = (
        shingles if shingles is not None
        else shingles_frame(df, id_col, text_col, n, shingle_unit)
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_jaccard_estimate(
    signatures: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Estimated Jaccard = fraction of matching signature slots."""
    sa = signatures.select(
        F.col("id").alias("id_a"), F.col("signature").alias("sig_a")
    )
    sb = signatures.select(
        F.col("id").alias("id_b"), F.col("signature").alias("sig_b")
    )
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    match = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda v: v,
        )
    )
    return joined.select(
        "id_a",
        "id_b",
        (match / F.size("sig_a")).alias("est_jaccard"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact) — small-data verifier / post-LSH refinement
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_posting: int | None = None,
    shingle_unit: str = "word",
) -> DataFrame:
    """Exact Jaccard over n-gram shingle sets (``shingle_unit``:
    whitespace words, or codepoint chars for no-whitespace scripts)
    for all pairs sharing ≥1 shingle. Shuffles on the shingle
    (inverted index), then on the pair.

    ``max_posting`` is the opt-in skew guard that makes the pair
    expansion bounded (the quadratic blow-up lives in per-shingle
    document frequency): shingles appearing in more than
    ``max_posting`` documents are dropped from the inverted index —
    the classic stop-shingle cut, mirroring ``lsh_candidate_pairs``'
    ``max_bucket``. Consequence: a pair whose only overlap was
    stop-shingles is not emitted, and surviving pairs' Jaccard is a
    conservative underestimate by the dropped shingles' contribution
    to the intersection (denominators still use full set sizes).
    Boilerplate frequent enough to hit the cap should be removed by
    exact dedup / boilerplate stripping first.

    The default is ``None`` — EXACT semantics; a cap silently changes
    the function's contract, so callers (and any oracle modeling
    them) must choose it consciously. At corpus scale pass a cap
    (e.g. 200): without one a single hot shingle materializes an
    O(df²) pair expansion inside one task."""
    sh = shingles_frame(df, id_col, text_col, n, shingle_unit)
    # One pass: explode carrying the set size, group by shingle into a
    # posting list, pair-expand each posting. No self-join → the
    # shingle computation and its shuffle happen once (a self-join
    # would recompute and reshuffle both branches).
    # explode_outer: dodge the inferred size>0 filter that re-inlines
    # the gram build (see tokenize docstring); sh is never empty.
    inv = sh.select(
        F.struct(F.col("id"), F.size("sh").alias("n_sh")).alias("doc"),
        F.explode_outer("sh").alias("shingle_str"),
    ).select(
        "doc",
        # shuffle 8-byte hashes, not shingle strings (64-bit collision
        # odds are ~n²/2^65 — immaterial up to billions of shingles)
        F.xxhash64("shingle_str").alias("shingle"),
    )
    postings = inv.groupBy("shingle").agg(F.collect_list("doc").alias("docs"))
    if max_posting is not None:
        # the bound that keeps one hot shingle from materializing an
        # O(df²) pair expansion inside a single task
        postings = postings.filter(F.size("docs") <= max_posting)
    # chained explodes (streamed, codegen'd Generate) instead of a
    # nested transform+flatten+filter that would build each posting
    # list's |docs|^2 pair array in interpreted HOF code — measured
    # ~13% faster end-to-end on the sf0.1 corpus.
    pairs = (
        postings.select("docs", F.explode("docs").alias("a"))
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a")["id"] < F.col("b")["id"])
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
    )
    jac = (
        pairs.groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    base_hash=None,
    token_unit: str = "word",
    char_n: int = 4,
) -> DataFrame:
    """64-bit SimHash over token features (Charikar 2002): bit j of
    the fingerprint is the sign of the sum over features of ±1
    according to bit j of the feature hash. One explode + one groupBy.

    ``base_hash``: Column→Column 64-bit token hash; default xxhash64,
    pass ``md5_hash64`` for SQL-engine-reproducible fingerprints.

    ``token_unit``: ``word`` (whitespace tokens, the default) or
    ``char`` — POSITIONAL (non-distinct, matching the word unit's
    occurrence weighting) codepoint ``char_n``-grams over the
    whitespace-normalized text, the honest feature for no-whitespace
    scripts where the word unit hashes the entire document as one
    feature and every spaceless doc collapses to a near-degenerate
    fingerprint."""
    if base_hash is None:
        base_hash = F.xxhash64
    if token_unit == "word":
        feats = df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(text_col)).alias("tok"),
        )
    elif token_unit == "char":
        # materialize the normalized text AND its split-to-chars
        # array first (the tokenize rule: a lambda referencing the
        # raw regexp_replace/split re-runs it per element); grams via
        # O(1) array slices instead of O(i) substr codepoint scans
        # (r11 — see char_shingles_of); positional, duplicates kept
        grams = _char_grams(F.col("_norm"), F.col("_chars"), char_n)
        # NULL-text docs must DROP, matching the word unit's contract
        # (explode over tokens(NULL) drops the row). The char path
        # previously used explode_outer, and a NULL doc survived as
        # tok=NULL: xxhash64(NULL) returns the seed, so every NULL doc
        # got the IDENTICAL fingerprint — pairwise Hamming-0 matches,
        # O(n_null²) spurious pairs downstream. NB an explicit filter
        # is required (not just plain explode): greatest() SKIPS
        # nulls, so a NULL _norm still yields the array [NULL] and
        # explode would emit the tok=NULL row anyway.
        feats = (
            df.withColumn("_norm", normalize_ws(text_col))
            .withColumn("_chars", F.split(F.col("_norm"), ""))
            .filter(F.col("_norm").isNotNull())
            .select(
                F.col(id_col).alias("id"),
                F.explode(grams).alias("tok"),
            )
        )
    else:
        raise ValueError(
            f"token_unit must be 'word' or 'char', got {token_unit!r}"
        )
    toked = feats.select("id", base_hash(F.col("tok")).alias("h"))

    def bit_lit(j: int):
        # bit 63 of a signed 64-bit long is the sign bit
        return F.lit((1 << j) if j < 63 else -(1 << 63))

    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(bit_lit(j)) != 0, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    summed = toked.groupBy("id").agg(*aggs)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"b{j}") > 0, bit_lit(j)).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp.bitwiseOR(term)
    return summed.select("id", fp.alias("simhash"))


def simhash_near_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket: int | None = None,
    warn_expansion: int | None = 100_000_000,
) -> DataFrame:
    """Near-dup pairs with Hamming distance ≤ ``max_hamming`` using
    the pigeonhole banding trick: split 64 bits into ``chunks`` blocks;
    any pair within distance < chunks must agree on ≥1 block → block
    equality is the bucket key, exact Hamming verifies.

    SCALE CONTRACT (measured, PROBES_r10 ``imagehash_10m``): bucket
    size is |corpus| / 2^(64/chunks) when fingerprints are
    well-spread, and the candidate join is Σ bucket² — QUADRATIC in
    the corpus when the hash distribution is near-uniform (the
    adversarial worst case: 2M→50s but 10M→1504s on random payloads).
    Real near-dup corpora concentrate duplicate mass in SMALL buckets
    (similar inputs ⇒ equal blocks) while the giant buckets are
    either uniform noise (no pairs under ``max_hamming`` anyway) or
    degenerate exact-dup clusters that exact dedup should resolve
    first — so at scale pass ``max_bucket`` (the
    ``lsh_candidate_pairs`` guard): (chunk, block) buckets larger
    than it are dropped, bounding the expansion; a pair is still
    found if ANY of its agreeing blocks lands in a surviving bucket.
    Default ``None`` = exact pigeonhole semantics (the cap changes
    the recall contract, so callers opt in consciously).

    ``warn_expansion`` (VERDICT r10 #3 ergonomics): when
    ``max_bucket`` is None, ONE cheap aggregate estimates the
    candidate-join size (Σ bucket² over the (chunk, block) buckets —
    the exact pre-dedup pair count) before building the join, and a
    RuntimeWarning fires if it exceeds this threshold — the
    at-scale caller who forgot the cap learns about the measured
    quadratic cliff (2M→50s, 10M→1504s on near-uniform fingerprints)
    from a warning naming the fix instead of from a hung job. The
    estimate costs one extra pass over the fingerprint frame
    (8 bytes/row), immaterial next to the join it predicts; set
    ``warn_expansion=None`` to skip it (e.g. inside tight loops over
    frames already known small)."""
    width = 64 // chunks
    mask = (1 << width) - 1
    blocks = fingerprints.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", c * width).bitwiseAND(F.lit(mask))
                    for c in range(chunks)
                ]
            )
        ).alias("chunk", "block"),
    )
    if max_bucket is None and warn_expansion is not None:
        import warnings

        est = (
            blocks.groupBy("chunk", "block")
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .agg(F.sum(F.col("_bsz") * F.col("_bsz")).alias("_e"))
            .first()["_e"]
        )
        if est is not None and est > warn_expansion:
            warnings.warn(
                f"simhash_near_pairs: estimated candidate expansion "
                f"(Σ bucket² = {est:,}) exceeds {warn_expansion:,} and "
                f"max_bucket is not set — the banded candidate join is "
                f"quadratic in bucket size (measured: 2M uniform "
                f"fingerprints→50s, 10M→1504s). Pass max_bucket to drop "
                f"oversized buckets (near-dup mass concentrates in small "
                f"ones), run exact dedup first to collapse identical "
                f"fingerprints, or raise warn_expansion to accept the "
                f"cost.",
                RuntimeWarning,
                stacklevel=2,
            )
    if max_bucket is not None:
        sizes = blocks.groupBy("chunk", "block").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        blocks = blocks.join(
            sizes.filter(F.col("_bsz") <= max_bucket).select(
                "chunk", "block"
            ),
            ["chunk", "block"],
        )
    a = blocks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "block"
    )
    b = blocks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "block"
    )
    # lowest-agreeing-chunk dedup instead of distinct() (r11, guide
    # §2.4): a pair agreeing on several blocks surfaces once per
    # agreeing chunk, and the old distinct() shuffled the FULL
    # Σ bucket² candidate stream (32 B/row) to drop the repeats. Both
    # fingerprints are already on the joined row, so "is this the
    # pair's first agreeing chunk" is a pure expression — keep the
    # row only when NO chunk before this one agrees — and the
    # candidate stream pipelines straight into the Hamming verify
    # with zero exchanges. Same pair set, emitted exactly once.
    # (With max_bucket set, a dropped bucket can eat a pair's lowest
    # agreeing chunk, so surviving occurrences keep the guard: any
    # EARLIER agreeing block must sit in a dropped-oversized bucket.)
    # flat CASE over the chunk id — higher-order exists()/slice()
    # lambdas run interpreted per candidate row (measured 6× slower
    # than the distinct() they replaced); a WHEN chain of bitwise
    # compares stays in whole-stage codegen and each row evaluates
    # only its own branch's ≤ chunks−1 comparisons
    def _agree(c: int) -> Column:
        return F.shiftright(F.col("sh_a"), c * width).bitwiseAND(
            F.lit(mask)
        ) == F.shiftright(F.col("sh_b"), c * width).bitwiseAND(F.lit(mask))

    earlier_agree = F.when(F.col("chunk") == 0, F.lit(False))
    for c in range(1, chunks):
        any_earlier = _agree(0)
        for c2 in range(1, c):
            any_earlier = any_earlier | _agree(c2)
        earlier_agree = earlier_agree.when(F.col("chunk") == c, any_earlier)
    earlier_agree = earlier_agree.otherwise(F.lit(False))
    if max_bucket is not None:
        # under the cap, "earlier chunk agrees" only suppresses this
        # occurrence if that earlier bucket SURVIVED the cap — join
        # the surviving (chunk, block) keys of the pair's earlier
        # agreeing chunks is corpus-shaped; instead keep the exact
        # distinct() semantics on the (already cap-reduced) stream.
        cand = (
            a.join(b, ["chunk", "block"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b")
            .distinct()
        )
    else:
        cand = (
            a.join(b, ["chunk", "block"])
            .filter(F.col("id_a") < F.col("id_b"))
            .filter(~earlier_agree)
            .select("id_a", "id_b", "sh_a", "sh_b")
        )
    # long, not int: stable schema across engines (bit_count is int32
    # in Spark, BIGINT in most SQL engines)
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def dup_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
    unit: str = "word",
) -> DataFrame:
    """Substring-granularity duplication profile: for every doc, how
    much of it is covered by token n-gram windows that also appear in
    at least ``min_df`` documents (the window itself included).

    This is the Spark-native reading of exact-substring training-data
    dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): instead of a suffix array over the
    concatenated corpus, hash every POSITIONAL n-token window, count
    document frequency per window hash, and union the duplicated
    windows back into maximal per-doc spans (gaps-and-islands).
    Document-level near-dup (MinHash) misses a boilerplate paragraph
    pasted into thousands of otherwise-unique pages; this catches it
    and says exactly which token ranges to cut.

    Returns one row per input doc:
    ``(id, n_tokens, n_windows, n_dup_windows, n_spans, dup_tokens,
    dup_frac)`` where ``dup_tokens`` is the size of the union of all
    duplicated windows' token ranges and ``dup_frac`` its share of
    the doc (0.0 for docs shorter than ``n`` tokens).

    Scale shape: the positional-window explode is ~one row per corpus
    token, then (1) one md5-keyed groupBy for document frequency
    (partial count-distinct aggregation, so hot boilerplate windows
    don't single-reduce), (2) one md5-keyed join back to positions
    (only hashes with df >= min_df survive the join's build side), and
    (3) one doc-keyed window for island merging, bounded per doc by
    doc length. No per-row Python, no driver materialization.

    ``unit``: ``word`` (token n-gram windows) or ``char`` (codepoint
    n-gram windows over the whitespace-normalized text — the honest
    unit for no-whitespace scripts, where the word unit sees one
    token per document and profiles nothing; use n ≈ 20-50 there,
    the char-equivalent of 8 tokens). With ``char`` the token columns
    count CODEPOINTS. The window explode is one row per corpus char
    instead of per corpus token (~5× rows, same three key-bounded
    shuffles).
    """
    if unit not in ("word", "char"):
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    if unit == "word":
        toks = F.col("_toks")
        toked = tokenize(df, text_col).select(
            F.col(id_col).alias("id"),
            F.size(toks).alias("n_tokens"),
            toks.alias("_toks"),
        )
        # positional (non-distinct) windows; docs < n tokens emit none
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array())
        win_h = F.md5(F.concat_ws(" ", F.slice(toks, F.col("pos") + 1, n)))
        carry = "_toks"
    else:
        t = F.col("_norm")
        toked = df.withColumn("_norm", normalize_ws(text_col)).select(
            F.col(id_col).alias("id"),
            F.length(t).alias("n_tokens"),
            t.alias("_norm"),
        )
        idx = F.when(
            F.length(t) >= n, F.sequence(F.lit(0), F.length(t) - n)
        ).otherwise(F.array())
        win_h = F.md5(t.substr(F.col("pos") + 1, F.lit(n)))
        carry = "_norm"
    wins = toked.select(
        "id", carry, F.explode(idx).alias("pos")
    ).select("id", "pos", win_h.alias("h"))
    freq = wins.groupBy("h").agg(
        F.count_distinct("id").alias("gram_df")
    ).filter(F.col("gram_df") >= min_df)
    dup = wins.join(freq, "h").select(
        "id", "pos", (F.col("pos") + n - 1).alias("end")
    )
    # gaps-and-islands: a window starts a new span when its start is
    # past every previous window's end (+1 merges exactly-adjacent
    # ranges — same union size either way)
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.select(
        "id",
        "pos",
        "end",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("_new"),
        F.lit(1).alias("_one"),
    ).withColumn(
        "island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = flagged.groupBy("id", "island").agg(
        F.min("pos").alias("s"),
        F.max("end").alias("e"),
        F.count("_one").alias("wins_in_span"),
    )
    per_doc = spans.groupBy("id").agg(
        F.count("island").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
        F.sum("wins_in_span").alias("n_dup_windows"),
    )
    n_wins = F.greatest(F.col("n_tokens") - n + 1, F.lit(0))
    return (
        toked.drop(carry)
        .join(per_doc, "id", "left")
        .select(
            F.col("id"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            n_wins.cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.when(F.col("n_tokens") > 0, F.col("n_tokens")),
                6,
            ).alias("dup_frac"),
        )
    )


def strip_dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 2,
    unit: str = "word",
) -> DataFrame:
    """Cut every duplicated span (as found by ``dup_span_stats``'s
    construction) out of every document and return the cleaned text —
    the actionable end of substring-level dedup: boilerplate that
    appears in >= ``min_df`` docs is removed wherever it occurs.

    Returns ``(id, n_tokens, kept_tokens, clean_text)`` with
    ``clean_text`` the surviving tokens joined by single spaces
    (tokenization already collapses whitespace runs).

    Scale shape: same three key-bounded shuffles as dup_span_stats to
    build the merged spans, then ONE doc-keyed join of the span lists
    back to the token arrays; coverage is evaluated as an
    array-lambda (``exists`` over the per-doc span list — bounded by
    doc length x span count, no non-equi join, no BNLJ).

    ``unit='char'``: windows, spans and counts are CODEPOINTS over
    the whitespace-normalized text (the no-whitespace-script unit,
    see ``dup_span_stats``); the cut is a single sorted-span
    ``aggregate`` fold emitting the between-span substrings — spans
    never overlap (merged islands), so the fold is one O(len) pass.
    """
    if unit not in ("word", "char"):
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    if unit == "word":
        toks = F.col("_toks")
        toked = tokenize(df, text_col).select(
            F.col(id_col).alias("id"),
            toks.alias("_toks"),
        )
        idx = F.when(
            F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
        ).otherwise(F.array())
        win_h = F.md5(F.concat_ws(" ", F.slice(toks, F.col("pos") + 1, n)))
        carry = "_toks"
    else:
        t = F.col("_norm")
        toked = df.withColumn("_norm", normalize_ws(text_col)).select(
            F.col(id_col).alias("id"),
            t.alias("_norm"),
        )
        idx = F.when(
            F.length(t) >= n, F.sequence(F.lit(0), F.length(t) - n)
        ).otherwise(F.array())
        win_h = F.md5(t.substr(F.col("pos") + 1, F.lit(n)))
        carry = "_norm"
    wins = toked.select(
        "id", carry, F.explode(idx).alias("pos")
    ).select("id", "pos", win_h.alias("h"))
    freq = (
        wins.groupBy("h")
        .agg(F.count_distinct("id").alias("gram_df"))
        .filter(F.col("gram_df") >= min_df)
    )
    dup = wins.join(freq.select("h"), "h").select(
        "id", "pos", (F.col("pos") + n - 1).alias("end")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.select(
        "id",
        "pos",
        "end",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end + 1), 1)
        .otherwise(0)
        .alias("_new"),
    ).withColumn(
        "island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = (
        flagged.groupBy("id", "island")
        .agg(F.min("pos").alias("s"), F.max("end").alias("e"))
        .groupBy("id")
        .agg(F.collect_list(F.struct("s", "e")).alias("_spans"))
    )
    joined = toked.join(spans, "id", "left")
    sp = F.coalesce(F.col("_spans"), F.array())
    if unit == "word":
        kept_idx = F.filter(
            F.sequence(F.lit(0), F.size(F.col("_toks")) - 1),
            lambda i: ~F.exists(
                sp, lambda r: (i >= r["s"]) & (i <= r["e"])
            ),
        )
        kept_toks = F.transform(
            kept_idx, lambda i: F.element_at(F.col("_toks"), i + 1)
        )
        return joined.select(
            "id",
            F.size("_toks").cast("long").alias("n_tokens"),
            F.size(kept_toks).cast("long").alias("kept_tokens"),
            F.concat_ws(" ", kept_toks).alias("clean_text"),
        )
    # char: one sorted-span fold — state (cur, out) appends the
    # substring between the previous span's end and this span's start
    t = F.col("_norm")
    folded = F.aggregate(
        F.array_sort(sp),
        F.struct(F.lit(0).alias("cur"), F.lit("").alias("out")),
        lambda acc, r: F.struct(
            (r["e"] + 1).alias("cur"),
            F.concat(
                acc["out"], t.substr(acc["cur"] + 1, r["s"] - acc["cur"])
            ).alias("out"),
        ),
    )
    # materialize the fold once: two output columns referencing the
    # raw expression would re-run the whole fold per reference
    staged = joined.withColumn("_fold", folded)
    clean = F.concat(
        F.col("_fold")["out"],
        t.substr(
            F.col("_fold")["cur"] + 1, F.length(t) - F.col("_fold")["cur"]
        ),
    )
    return staged.withColumn("_clean", clean).select(
        "id",
        F.length("_norm").cast("long").alias("n_tokens"),
        F.length("_clean").cast("long").alias("kept_tokens"),
        F.col("_clean").alias("clean_text"),
    )
