"""Dedup operators vs pure-Python oracles (the non-SQL-expressible
paths: MinHash signatures, SimHash bits, LSH banding)."""

from pyspark.sql import Row

from updater_spark.operators.dedup import (
    MERSENNE_P,
    _hash_coeffs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
    word_shingles,
)

DOCS = [
    Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
    Row(doc_id=2, text="the quick brown fox jumps over the lazy cat"),
    Row(doc_id=3, text="completely different words entirely here now"),
    Row(doc_id=4, text="the quick brown fox jumps over the lazy dog"),  # dup of 1
]


def py_shingles(text, n=3):
    toks = text.strip().split()
    if len(toks) <= n:
        return {" ".join(toks[:n])}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup(spark):
    df = spark.createDataFrame(DOCS)
    out = {
        r["keeper_id"]: r["n_copies"]
        for r in exact_dedup(df, ["text"], "doc_id").collect()
    }
    assert out[1] == 2  # docs 1 and 4 collapse, min id kept
    assert out[2] == 1 and out[3] == 1


def test_word_shingles_match_python(spark):
    df = spark.createDataFrame(DOCS)
    got = df.select("doc_id", word_shingles("text", 3).alias("sh")).collect()
    for r in got:
        assert set(r["sh"]) == py_shingles(DOCS[r["doc_id"] - 1].text), r["doc_id"]


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(DOCS)
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    # python oracle
    for (a, b), j in pairs.items():
        sa, sb = py_shingles(DOCS[a - 1].text), py_shingles(DOCS[b - 1].text)
        expected = len(sa & sb) / len(sa | sb)
        assert abs(j - expected) < 1e-12, (a, b)
    assert pairs[(1, 4)] == 1.0
    assert pairs[(1, 2)] > 0.5
    assert (1, 3) not in pairs  # no shared shingles


def py_minhash(text, num_hashes=16, seed=7):
    """Pure-Python twin of minhash_signatures (same xxhash64 base via
    Spark; here we only verify the (a*h+b) mod p fold given the base
    hashes, so the Spark query supplies them)."""
    return _hash_coeffs(num_hashes, seed)


def test_minhash_signature_matches_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(DOCS)
    # base shingle hashes from Spark (xxhash64 is JVM-specific)
    base = (
        df.select(
            "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
        )
        .select(
            "doc_id",
            F.pmod(F.xxhash64("shingle"), F.lit(1 << 32)).alias("h"),
        )
        .collect()
    )
    by_doc = {}
    for r in base:
        by_doc.setdefault(r["doc_id"], []).append(r["h"])
    coeffs = _hash_coeffs(16, seed=7)
    expected = {
        d: [
            min(((a * (h ^ r) + b) % MERSENNE_P) for h in hs)
            for a, b, r in coeffs
        ]
        for d, hs in by_doc.items()
    }
    sigs = {
        r["id"]: list(r["signature"])
        for r in minhash_signatures(
            df, "doc_id", "text", num_hashes=16, seed=7
        ).collect()
    }
    assert sigs == expected


def test_lsh_finds_duplicates(spark):
    df = spark.createDataFrame(DOCS)
    sigs = minhash_signatures(df, "doc_id", "text", num_hashes=32)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, bands=8).collect()
    }
    assert (1, 4) in pairs  # exact dups always collide
    assert (1, 2) in pairs  # near dups collide with 8 bands of 4
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_properties(spark):
    df = spark.createDataFrame(DOCS)
    fps = {r["id"]: r["simhash"] for r in simhash(df, "doc_id", "text").collect()}
    assert fps[1] == fps[4]  # identical docs → identical fingerprint
    ham_12 = bin((fps[1] ^ fps[2]) & ((1 << 64) - 1)).count("1")
    ham_13 = bin((fps[1] ^ fps[3]) & ((1 << 64) - 1)).count("1")
    assert ham_12 < ham_13  # near-dup closer than unrelated

    near = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(
            simhash(df, "doc_id", "text"), max_hamming=63
        ).collect()
    }
    assert near[(1, 4)] == 0
    assert near[(1, 2)] == ham_12


def test_simhash_python_bit_oracle(spark):
    """Recompute the sign-sum from Spark's own token hashes in Python
    and check bit-for-bit equality."""
    from pyspark.sql import functions as F
    from updater_spark.operators.dedup import tokens

    df = spark.createDataFrame(DOCS[:1])
    hs = [
        r["h"]
        for r in df.select(F.explode(tokens("text")).alias("t"))
        .select(F.xxhash64("t").alias("h"))
        .collect()
    ]
    fp = 0
    for j in range(64):
        s = sum(1 if (h >> j) & 1 else -1 for h in hs)
        if s > 0:
            fp |= 1 << j
    if fp & (1 << 63):  # python int → signed 64-bit
        fp -= 1 << 64
    got = simhash(df, "doc_id", "text").collect()[0]["simhash"]
    assert got == fp


def test_lsh_verified_pipeline(spark):
    """lsh_verified_pairs = exact-jaccard refinement of LSH candidates:
    output ⊆ the exact operator's pairs with identical jaccard values,
    and full recall on this clearly-separated corpus (perturbed copies
    at J≈0.9 vs unrelated docs at J≈0)."""
    from updater_spark.operators.dedup import lsh_verified_pairs, ngram_jaccard_pairs

    base = [(i, " ".join(f"w{i}t{j}" for j in range(30))) for i in range(40)]
    copies = [(i + 1000, t + " zz yy xx") for i, t in base if i % 2 == 0]
    df = spark.createDataFrame(base + copies, "doc_id long, text string")

    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in lsh_verified_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert set(verified) <= set(exact)
    for pair, j in verified.items():
        assert abs(j - exact[pair]) < 1e-12
    # the 20 planted near-dup pairs are far above threshold — LSH at
    # 16 bands x 4 rows catches them all here
    planted = {(i, i + 1000) for i in range(0, 40, 2)}
    assert planted <= set(verified)
    assert len(exact) == len(planted)  # nothing else crosses 0.5


def test_ngram_jaccard_posting_cap(spark):
    """A single hot shingle shared by every doc must not explode the
    pair expansion: with max_posting the stop-shingle is cut from the
    inverted index, with None it pairs everything quadratically."""
    hot = [
        Row(doc_id=i, text=f"hot1 hot2 hot3 u{i}a u{i}b") for i in range(120)
    ]
    near = [
        Row(doc_id=1000, text="alpha beta gamma delta epsilon zeta"),
        Row(doc_id=1001, text="alpha beta gamma delta epsilon eta"),
    ]
    df = spark.createDataFrame(hot + near)

    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.0, max_posting=100
    ).collect()
    # hot-only overlaps are gone; the genuine near-dup pair survives
    # with its exact jaccard (its shingles are all below the cap)
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(1000, 1001)}
    [pair] = capped
    # sets: 4 shingles each, 3 common -> 3/5
    assert abs(pair["jaccard"] - 3 / 5) < 1e-12

    uncapped = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.0, max_posting=None
    )
    # every hot pair (120 choose 2) plus the near-dup pair
    assert uncapped.count() == 120 * 119 // 2 + 1


def test_md5_portable_hashes_match_hashlib(spark):
    """md5_hash32/64 must equal the reference construction (first
    4/8 md5 bytes big-endian, 64-bit signed) — the property the DuckDB
    oracle transcription relies on."""
    import hashlib

    from pyspark.sql import functions as F

    from updater_spark.operators.dedup import md5_hash32, md5_hash64

    words = ["alpha", "beta gamma", "héllo wörld", "", "123", "zz yy xx"]
    df = spark.createDataFrame([Row(s=w) for w in words])
    got = {
        r["s"]: (r["h32"], r["h64"])
        for r in df.select(
            "s",
            md5_hash32(F.col("s")).alias("h32"),
            md5_hash64(F.col("s")).alias("h64"),
        ).collect()
    }
    for w in words:
        d = hashlib.md5(w.encode("utf-8")).digest()
        exp32 = int.from_bytes(d[:4], "big")
        exp64 = int.from_bytes(d[:8], "big", signed=True)
        assert got[w] == (exp32, exp64), w


def test_dup_span_stats_islands(spark):
    """Two docs share a 7-token run; with n=3 that's five duplicated
    windows per doc which must merge into ONE island covering exactly
    the shared tokens. The unique doc and the too-short doc report
    zeros (and a too-short doc still gets a row)."""
    from updater_spark.operators.dedup import dup_span_stats

    shared = "alpha beta gamma delta epsilon zeta eta"
    docs = [
        Row(doc_id=1, text=f"one two {shared} three four"),
        Row(doc_id=2, text=f"{shared} nine ten eleven"),
        Row(doc_id=3, text="totally unrelated words in this document"),
        Row(doc_id=4, text="tiny doc"),
    ]
    out = {
        r["id"]: r.asDict()
        for r in dup_span_stats(
            spark.createDataFrame(docs), n=3, min_df=2
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # doc 1: shared run at positions 2..8 -> one island of 7 tokens
    assert out[1]["n_spans"] == 1
    assert out[1]["dup_tokens"] == 7
    assert out[1]["n_dup_windows"] == 5
    assert abs(out[1]["dup_frac"] - 7 / 11) < 1e-6
    # doc 2: same run at positions 0..6
    assert out[2]["n_spans"] == 1 and out[2]["dup_tokens"] == 7
    # unique doc: windows exist, none duplicated
    assert out[3]["n_windows"] == 4 and out[3]["dup_tokens"] == 0
    assert out[3]["dup_frac"] == 0.0
    # 2-token doc: shorter than n -> no windows at all
    assert out[4]["n_windows"] == 0 and out[4]["n_spans"] == 0


def test_dup_span_stats_disjoint_spans(spark):
    """Two separated shared runs in one doc must stay two islands;
    dup_tokens is the union size, not windows * n."""
    from updater_spark.operators.dedup import dup_span_stats

    a = "red green blue"
    b = "cyan magenta yellow"
    docs = [
        Row(doc_id=1, text=f"{a} filler1 filler2 filler3 {b}"),
        Row(doc_id=2, text=f"{a} other words entirely {b}"),
    ]
    out = {
        r["id"]: r.asDict()
        for r in dup_span_stats(
            spark.createDataFrame(docs), n=3, min_df=2
        ).collect()
    }
    assert out[1]["n_spans"] == 2
    assert out[1]["dup_tokens"] == 6  # two 3-token islands
    assert out[2]["n_spans"] == 2 and out[2]["dup_tokens"] == 6


def test_strip_dup_spans(spark):
    """Cleaned text drops exactly the duplicated-window union; docs
    without duplication come back verbatim (whitespace-collapsed)."""
    from updater_spark.operators.dedup import strip_dup_spans

    shared = "alpha beta gamma delta epsilon"
    docs = [
        Row(doc_id=1, text=f"one two {shared} three"),
        Row(doc_id=2, text=f"{shared} nine ten"),
        Row(doc_id=3, text="totally unrelated words here today"),
    ]
    out = {
        r["id"]: r.asDict()
        for r in strip_dup_spans(
            spark.createDataFrame(docs), n=5, min_df=2
        ).collect()
    }
    assert out[1]["clean_text"] == "one two three"
    assert out[1]["kept_tokens"] == 3 and out[1]["n_tokens"] == 8
    assert out[2]["clean_text"] == "nine ten"
    assert out[3]["clean_text"] == "totally unrelated words here today"
    assert out[3]["kept_tokens"] == out[3]["n_tokens"] == 5


def test_simhash_near_pairs_lowest_chunk_dedup(spark):
    """r11: the candidate distinct() was replaced by a
    lowest-agreeing-chunk filter — a pair agreeing on MANY blocks
    (identical fingerprints agree on all of them) must still surface
    exactly once, and the uncapped plan must carry no aggregation
    above the candidate join (the Σ bucket² stream pipelines straight
    into the Hamming verify)."""
    from pyspark.sql import functions as F

    fps = spark.createDataFrame(
        [
            Row(id=1, simhash=7),          # dup pair: agree on every chunk
            Row(id=2, simhash=7),
            Row(id=3, simhash=7 | (1 << 40)),  # near pair vs 1/2
            Row(id=4, simhash=-1),         # far from everything
        ]
    ).select("id", F.col("simhash").cast("long").alias("simhash"))
    out = simhash_near_pairs(fps, max_hamming=3, chunks=4)
    rows = out.collect()
    pairs = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in rows)
    assert pairs == [(1, 2, 0), (1, 3, 1), (2, 3, 1)]
    # exactly-once emission is pre-verify: the candidate stream itself
    # must already be distinct (count pairs before the hamming filter)
    assert len(rows) == len(set((r["id_a"], r["id_b"]) for r in rows))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in plan and "Aggregate" not in plan
    # capped path keeps the distinct() semantics (a dropped bucket can
    # eat the lowest agreeing chunk) — same result on this tiny frame
    capped = simhash_near_pairs(fps, max_hamming=3, chunks=4, max_bucket=10)
    assert sorted(
        (r["id_a"], r["id_b"], r["hamming"]) for r in capped.collect()
    ) == pairs
