"""Char-unit (no-whitespace-script) dedup: planted CJK near-dups that
the word unit provably MISSES must be caught by the char unit, with a
DuckDB cross-engine check on the codepoint semantics (VERDICT r9 #1).

Fixture: spaceless Japanese/Chinese-range documents — each doc is a
deterministic stream of CJK codepoints with NO whitespace, so the
word tokenizer sees exactly one giant "word" per document.
"""

import duckdb
import pytest
from pyspark.sql import Row

from updater_spark.operators.dedup import (
    char_shingles_of,
    dup_span_stats,
    lsh_verified_pairs,
    md5_hash64,
    minhash_signatures,
    ngram_jaccard_pairs,
    normalize_ws,
    simhash,
    simhash_near_pairs,
    strip_dup_spans,
)


def _cjk_text(seed: int, length: int) -> str:
    """Deterministic spaceless CJK string (LCG over the unified
    ideograph block)."""
    state = seed * 2654435761 % (1 << 32)
    chars = []
    for _ in range(length):
        state = (state * 1103515245 + 12345) % (1 << 31)
        chars.append(chr(0x4E00 + state % 0x5000))
    return "".join(chars)


def _fixture():
    """20 base docs + 5 planted near-dups (one char in ~30 mutated) +
    2 docs sharing a long boilerplate run."""
    docs = []
    for i in range(20):
        docs.append(Row(doc_id=i, text=_cjk_text(i + 1, 120)))
    # near-dups of docs 0-4: flip one codepoint per 30
    for i in range(5):
        base = list(_cjk_text(i + 1, 120))
        for p in range(15, 120, 30):
            base[p] = chr(0x4E00 + (i * 31 + p) % 0x5000)
        docs.append(Row(doc_id=100 + i, text="".join(base)))
    # shared boilerplate: a 60-char run embedded in two unrelated docs
    boiler = _cjk_text(999, 60)
    docs.append(Row(doc_id=200, text=_cjk_text(50, 40) + boiler + _cjk_text(51, 30)))
    docs.append(Row(doc_id=201, text=_cjk_text(60, 35) + boiler + _cjk_text(61, 25)))
    return docs


PLANTED = {(i, 100 + i) for i in range(5)}


@pytest.fixture(scope="module")
def cjk_df(spark):
    return spark.createDataFrame(_fixture())


def test_word_unit_misses_cjk_neardups(spark, cjk_df):
    """The documented failure mode: spaceless docs yield one 'word',
    so the word-unit pipeline reports NO near-dup pairs at all."""
    pairs = lsh_verified_pairs(
        cjk_df, "doc_id", "text", n=3, threshold=0.5, shingle_unit="word"
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert not (found & PLANTED)


def test_char_unit_catches_cjk_neardups(spark, cjk_df):
    pairs = lsh_verified_pairs(
        cjk_df, "doc_id", "text", n=5, threshold=0.5, shingle_unit="char"
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert PLANTED <= found
    # no false positives among unrelated base docs
    for a, b in found - PLANTED:
        assert (a, b) in {(200, 201)} or max(a, b) >= 100, (a, b)


def test_char_jaccard_matches_duckdb(spark, cjk_df):
    """Codepoint semantics cross-engine: Spark substr == DuckDB substr
    on CJK text (both count CODEPOINTS, not bytes) — the exactness
    claim behind the char unit's driver-grade oracles."""
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in ngram_jaccard_pairs(
            cjk_df, "doc_id", "text", n=5, threshold=0.3,
            shingle_unit="char",
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)",
        [(r.doc_id, r.text) for r in _fixture()],
    )
    rows = con.execute(
        """
        WITH norm AS (
            SELECT doc_id,
                   regexp_replace(trim(text), '\\s+', ' ', 'g') AS t
            FROM docs
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(1, greatest(length(t) - 5 + 1, 1) + 1),
                       i -> substr(t, i::INT, 5))) AS s
            FROM norm
        )
        SELECT a.doc_id, b.doc_id,
               round(len(list_intersect(a.s, b.s))::DOUBLE
                     / len(list_distinct(list_concat(a.s, b.s))), 6)
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        """
    ).fetchall()
    want = {(a, b): j for a, b, j in rows if j >= 0.3}
    assert got == want


def test_char_shingles_codepoints_not_bytes(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="日本語のテキスト")])
    out = df.select(
        char_shingles_of(normalize_ws("text"), 3).alias("sh")
    ).first()["sh"]
    assert "日本語" in out and "語のテ" in out
    assert all(len(s) == 3 for s in out)


def test_char_simhash_neardups(spark, cjk_df):
    fps = simhash(
        cjk_df, "doc_id", "text", base_hash=md5_hash64,
        token_unit="char", char_n=4,
    )
    # planted pairs measure hamming 6-13 (4 flipped codepoints touch
    # ~16 of ~117 grams); chunks=16 makes the pigeonhole guarantee
    # cover distance <= 15
    pairs = simhash_near_pairs(fps, max_hamming=14, chunks=16).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert PLANTED <= found


def test_word_simhash_degenerate_on_spaceless(spark, cjk_df):
    """Word-unit simhash of a spaceless doc hashes ONE feature: the
    planted near-dups (1-char edits) land in unrelated buckets."""
    fps = simhash(cjk_df, "doc_id", "text", base_hash=md5_hash64)
    pairs = simhash_near_pairs(fps, max_hamming=14, chunks=16).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert not (found & PLANTED)


def test_char_dup_spans_find_boilerplate(spark, cjk_df):
    stats = {
        r["id"]: r
        for r in dup_span_stats(
            cjk_df, "doc_id", "text", n=20, min_df=2, unit="char"
        ).collect()
    }
    # the 60-char shared run covers >= 60 chars of docs 200/201
    for d in (200, 201):
        assert stats[d]["dup_tokens"] >= 60, stats[d]
        assert stats[d]["dup_frac"] > 0.4
    # planted near-dups share long exact runs too (expected); fully
    # unique docs 5..19 must show zero duplication
    for d in range(5, 20):
        assert stats[d]["dup_tokens"] == 0, (d, stats[d])


def test_char_strip_spans_removes_boilerplate(spark, cjk_df):
    boiler = _cjk_text(999, 60)
    out = {
        r["id"]: r
        for r in strip_dup_spans(
            cjk_df, "doc_id", "text", n=20, min_df=2, unit="char"
        ).collect()
    }
    for d in (200, 201):
        assert boiler not in out[d]["clean_text"]
        assert out[d]["kept_tokens"] == len(out[d]["clean_text"])
        assert out[d]["kept_tokens"] < out[d]["n_tokens"]
    # untouched docs round-trip exactly
    originals = {r.doc_id: r.text for r in _fixture()}
    for d in range(5, 20):
        assert out[d]["clean_text"] == originals[d]
        assert out[d]["kept_tokens"] == out[d]["n_tokens"]


def test_char_unit_dedup_index_incremental(spark, tmp_path):
    """The persistent CDC-maintained index honors the unit switch:
    a char-unit index catches a spaceless near-dup arriving in a
    LATER epoch, and the parameter-identity sidecar refuses a
    mixed-unit probe (plus stays backward-compatible with legacy
    word-unit sidecars lacking the key)."""
    import json

    import pytest

    from updater_spark.operators.dedup_index import DedupIndex
    from updater_spark.sources.store import TableStore

    store = TableStore(spark, str(tmp_path / "store"))
    base = spark.createDataFrame(_fixture()[:20])  # spaceless bases
    idx = DedupIndex(store, "cjk", shingle_n=5, shingle_unit="char")
    idx.bootstrap(base, "doc_id", "text")

    # epoch 2: the planted near-dups arrive incrementally
    delta = spark.createDataFrame(_fixture()[20:25])
    pairs = idx.update(delta, "doc_id", "text").collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert PLANTED <= found

    # unit mismatch refuses loudly
    with pytest.raises(ValueError, match="stored parameters"):
        DedupIndex(store, "cjk", shingle_n=5)._check_params()

    # legacy sidecar (no shingle_unit key) == word unit
    raw = json.loads(store.read_sidecar("cjk_sigs", "params"))
    raw.pop("shingle_unit")
    store.write_sidecar("cjk_sigs", "params", json.dumps(raw))
    DedupIndex(
        store, "cjk", shingle_n=5, shingle_unit="word"
    )._check_params()  # must not raise


def test_char_unit_decontamination(spark, cjk_df):
    """Decontamination honesty on spaceless scripts: a CJK benchmark
    sentence has NO word 13-grams to collide on (word unit finds
    nothing), while char 40-grams catch every doc sharing the
    planted 60-char run — including exact copies of benchmark docs."""
    from updater_spark.operators.decontam import (
        contamination,
        decontaminate,
    )

    # benchmark = the shared boilerplate carrier + one full base doc
    bench = spark.createDataFrame(
        [r for r in _fixture() if r.doc_id in (0, 200)]
    ).select("text")
    word = {
        r["doc_id"]: r["contaminated"]
        for r in contamination(
            cjk_df, bench, "doc_id", "text", n=13
        ).collect()
    }
    # word unit on spaceless text: the whole doc is ONE partial
    # 13-gram, so only EXACT copies of benchmark docs flag — the
    # near-dup (100) and the partial-overlap carrier (201) slip
    # through, the blindness the char unit fixes
    assert word[0] and word[200]
    assert not word[100] and not word[201]
    # char n=20: the near-dup's clean runs between flips are 29
    # chars, so 20-grams bridge them while 40-grams would not
    char = {
        r["doc_id"]: r["contaminated"]
        for r in contamination(
            cjk_df, bench, "doc_id", "text", n=20, shingle_unit="char"
        ).collect()
    }
    # doc 0 (in the benchmark), its near-dup 100 (shares long exact
    # runs), and both boilerplate carriers must flag
    for d in (0, 100, 200, 201):
        assert char[d], d
    # unrelated base docs stay clean
    for d in range(5, 20):
        assert not char[d], d
    clean = decontaminate(
        cjk_df, bench, "doc_id", "text", n=20, shingle_unit="char"
    )
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert {0, 100, 200, 201}.isdisjoint(kept)
    assert set(range(5, 20)) <= kept


def test_char_unit_contamination_bloom_matches_exact(spark, cjk_df):
    from updater_spark.operators.decontam import (
        contamination,
        contamination_bloom,
    )

    bench = spark.createDataFrame(
        [r for r in _fixture() if r.doc_id == 200]
    ).select("text")
    exact = sorted(
        tuple(r)
        for r in contamination(
            cjk_df, bench, "doc_id", "text", n=40, shingle_unit="char"
        ).collect()
    )
    bloom = sorted(
        tuple(r)
        for r in contamination_bloom(
            cjk_df, bench, "doc_id", "text", n=40, shingle_unit="char"
        ).collect()
    )
    assert exact == bloom  # no false negatives; FPs die in the verify


def test_char_simhash_drops_null_text_docs(spark, cjk_df):
    """NULL-text docs must DROP from the char-unit fingerprint frame,
    matching the word unit (ADVICE r10: explode_outer kept them as
    tok=NULL rows, every NULL doc got the identical xxhash64-seed
    fingerprint, and n_null docs produced O(n_null²) spurious
    Hamming-0 pairs)."""
    from pyspark.sql import functions as F

    nulls = spark.createDataFrame(
        [Row(doc_id=900, text=None), Row(doc_id=901, text=None),
         Row(doc_id=902, text=None)],
        "doc_id long, text string",
    )
    df = cjk_df.unionByName(nulls)
    for unit in ("word", "char"):
        fps = simhash(
            df, "doc_id", "text", base_hash=md5_hash64, token_unit=unit
        )
        ids = {r["id"] for r in fps.select("id").collect()}
        assert ids.isdisjoint({900, 901, 902}), unit
        pairs = simhash_near_pairs(fps, max_hamming=0, chunks=16)
        null_pairs = pairs.filter(F.col("id_a") >= 900).count()
        assert null_pairs == 0, unit


def test_char_gram_split_stays_materialized(spark, cjk_df):
    """The O(len·n) gram build depends on split() running once per
    DOCUMENT, not once per array element: CollapseProject will inline
    a single-reference non-cheap split into the transform lambda,
    where it re-splits the whole string per gram — measured as a
    2.5–5× regression on dedup_char_lsh/decontam_char (r11). The
    size(_chars)-derived sequence bound gives the chars column a
    second reference, which blocks the collapse; this test pins that
    plan shape (split in its own Project node, never inside a
    lambdafunction)."""
    from updater_spark.operators.dedup import shingles_frame

    plan = (
        shingles_frame(cjk_df, "doc_id", "text", n=5, shingle_unit="char")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "lambdafunction" in plan
    for line in plan.splitlines():
        if "lambdafunction" in line:
            assert "split(" not in line, line
