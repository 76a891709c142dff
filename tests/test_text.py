"""Text-analysis operators vs Python oracles."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.text import (
    STOPWORDS_EN,
    doc_fingerprint,
    lang_id,
    quality_score,
    text_stats,
    token_counts,
)

DOCS = [
    Row(doc_id=1, text="the quick brown fox and the lazy dog in a field"),
    Row(doc_id=2, text="le chat et le chien est dans la maison des amis"),
    Row(doc_id=3, text="x y"),
]


def test_text_stats_oracle(spark):
    df = spark.createDataFrame(DOCS)
    got = {r["doc_id"]: r for r in text_stats(df).collect()}
    for d in DOCS:
        toks = d.text.split()
        r = got[d.doc_id]
        assert r["n_words"] == len(toks)
        assert r["n_uniq_words"] == len(set(toks))
        sw = sum(1 for t in toks if t in STOPWORDS_EN)
        assert abs(r["stopword_ratio"] - round(sw / len(toks), 6)) < 1e-9
        mean_len = round(sum(len(t) for t in toks) / len(toks), 6)
        assert abs(r["mean_word_len"] - mean_len) < 1e-9


def test_lang_id(spark):
    df = spark.createDataFrame(DOCS)
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "en"  # no hits anywhere → deterministic tie-break


def test_token_counts(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world42 x-y!")])
    r = token_counts(df).collect()[0]
    assert r["n_ws_tokens"] == 3
    # hello | world | 42 | x | - | y | !
    assert r["n_bpe_tokens"] == 7


def test_doc_fingerprint_rolling_oracle(spark):
    df = spark.createDataFrame(DOCS)
    got = {r["doc_id"]: r for r in doc_fingerprint(df).collect()}
    import hashlib

    for d in DOCS:
        norm = " ".join(d.text.split())
        acc = 0
        for ch in norm:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        assert got[d.doc_id]["rolling_fp"] == acc
        assert got[d.doc_id]["md5_fp"] == hashlib.md5(norm.encode()).hexdigest()


def test_quality_score_range(spark):
    df = spark.createDataFrame(DOCS)
    scores = {r["doc_id"]: r["quality"] for r in quality_score(df).collect()}
    assert all(0 <= v <= 1 for v in scores.values())
    assert scores[1] > scores[3]  # tiny doc penalized


def test_repetition_stats_oracle(spark):
    from updater_spark.operators.text import repetition_stats

    docs = [
        Row(doc_id=1, text="a b a b a b"),  # heavy 1/2-gram repetition
        Row(doc_id=2, text="one two three four five"),  # no repeats
        Row(doc_id=3, text="x"),  # shorter than gram width
    ]
    got = {
        r["doc_id"]: r
        for r in repetition_stats(spark.createDataFrame(docs)).collect()
    }

    def frac(items):
        return round(1 - len(set(items)) / len(items), 6)

    for d in docs:
        toks = d.text.split()
        grams2 = [" ".join(toks[i : i + 2]) for i in range(max(len(toks) - 1, 1))]
        grams3 = [" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 1))]
        r = got[d.doc_id]
        assert r["n_words"] == len(toks)
        assert abs(r["dup_word_frac"] - frac(toks)) < 1e-9
        assert abs(r["dup_2gram_frac"] - frac(grams2)) < 1e-9
        assert abs(r["dup_3gram_frac"] - frac(grams3)) < 1e-9
    assert got[2]["dup_word_frac"] == 0.0
    assert got[3]["dup_word_frac"] == 0.0  # single partial gram, no dup


def test_pii_redact(spark):
    from updater_spark.operators.text import pii_redact

    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text="mail bob.smith+x@corp.example.org or alice@ex.io, "
                "host 192.168.0.1 ext 555-0199",
            ),
            Row(doc_id=2, text="no pii here at all"),
        ]
    )
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    r1 = got[1]
    assert (r1["n_email"], r1["n_ipv4"], r1["n_phone"]) == (2, 1, 1)
    assert r1["redacted"] == (
        "mail <EMAIL> or <EMAIL>, host <IP> ext <PHONE>"
    )
    r2 = got[2]
    assert (r2["n_email"], r2["n_ipv4"], r2["n_phone"]) == (0, 0, 0)
    assert r2["redacted"] == "no pii here at all"


def test_top_terms_and_tfidf(spark):
    from updater_spark.operators.text import tfidf_top_terms, top_terms

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat"),
            (2, "the dog sat on the log"),
            (3, "cats & dogs; CATS!"),
        ],
        "doc_id long, text string",
    )
    top = {r["term"]: (r["n_docs"], r["n_occurrences"], r["rank"])
           for r in top_terms(docs, k=3).collect()}
    # 'the': 5 occurrences across 2 docs; 'cat' 2; 'cats' 2 (lowercased,
    # punctuation split); ties broken term-asc
    assert top == {"the": (2, 5, 1), "cat": (1, 2, 2), "cats": (1, 2, 3)}

    tfidf = tfidf_top_terms(docs, k=2, min_tf=2).collect()
    by_doc = {}
    for r in tfidf:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"], r["df"]))
    # doc 1: tf>=2 terms are the(3), cat(2); doc 2: the(2); doc 3: cats(2)
    assert sorted(by_doc[1]) == [(1, "the", 3, 2), (2, "cat", 2, 1)]
    assert sorted(by_doc[2]) == [(1, "the", 2, 2)]
    assert sorted(by_doc[3]) == [(1, "cats", 2, 1)]
    # tfidf value sanity: rarer term scores higher at equal tf
    vals = {(r["doc_id"], r["term"]): r["tfidf"] for r in tfidf}
    assert vals[(1, "cat")] > vals[(2, "the")]


def test_chunk_text_windows(spark):
    from pyspark.sql import Row

    from updater_spark.operators.text import chunk_text

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(toks)), Row(doc_id=2, text="solo")]
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"], r["chunk"])
        for r in chunk_text(df, chunk_tokens=4, stride=3).collect()
    }
    # doc 1: starts 0,3,6,9 → windows of 4,4,4,1 tokens; full coverage
    # with 1-token overlap between consecutive chunks
    assert out[(1, 0)] == (4, "t0 t1 t2 t3")
    assert out[(1, 1)] == (4, "t3 t4 t5 t6")
    assert out[(1, 2)] == (4, "t6 t7 t8 t9")
    assert out[(1, 3)] == (1, "t9")
    # short doc → exactly one short chunk
    assert out[(2, 0)] == (1, "solo")
    assert len(out) == 5


def test_chunk_text_rejects_bad_params(spark):
    import pytest
    from pyspark.sql import Row

    from updater_spark.operators.text import chunk_text

    df = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with pytest.raises(ValueError):
        chunk_text(df, stride=0)


def test_chunk_text_fuzz_coverage(spark):
    """Property: every token lands in >=1 chunk, chunk i starts at
    i*stride, consecutive chunks overlap by chunk_tokens - stride, and
    concatenating each chunk's first `stride` tokens (plus the final
    chunk's tail) reconstructs the document."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Row

    from updater_spark.operators.text import chunk_text

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n_toks=st.integers(1, 40),
        chunk=st.integers(1, 12),
        data=st.data(),
    )
    def prop(n_toks, chunk, data):
        stride = data.draw(st.integers(1, chunk))
        toks = [f"t{i}" for i in range(n_toks)]
        df = spark.createDataFrame([Row(doc_id=1, text=" ".join(toks))])
        out = sorted(
            (r["chunk_idx"], r["chunk"].split(" "))
            for r in chunk_text(
                df, chunk_tokens=chunk, stride=stride
            ).collect()
        )
        # windows are exactly toks[i*stride : i*stride+chunk]
        for i, w in out:
            assert w == toks[i * stride : i * stride + chunk]
        # full coverage: reconstruct from stride-prefixes + last tail
        recon = []
        for i, w in out:
            recon.extend(w[:stride])
        last_i, last_w = out[-1]
        recon.extend(last_w[stride:])
        assert recon == toks

    prop()


def test_strip_boilerplate_drops_hot_lines_keeps_order(spark):
    from updater_spark.operators.text import strip_boilerplate

    docs = spark.createDataFrame(
        [
            (1, "alpha one\nBOILER\nbeta two"),
            (2, "gamma three\nBOILER"),
            (3, "BOILER\ndelta four\nepsilon five"),
            (4, "BOILER"),  # fully boilerplate
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(docs, max_df=2).collect()
    }
    assert out[1]["text"] == "alpha one\nbeta two"
    assert out[2]["text"] == "gamma three"
    assert out[3]["text"] == "delta four\nepsilon five"
    # fully-boilerplate doc keeps its row with empty text
    assert out[4]["text"] == "" and out[4]["n_dropped"] == 1
    assert all(out[i]["n_dropped"] == 1 for i in (1, 2, 3))
    # a line at exactly max_df distinct docs survives
    docs2 = spark.createDataFrame(
        [(1, "x\nshared"), (2, "y\nshared")], "doc_id long, text string"
    )
    out2 = {r["doc_id"]: r["text"] for r in strip_boilerplate(docs2, max_df=2).collect()}
    assert out2 == {1: "x\nshared", 2: "y\nshared"}


def test_strip_boilerplate_df_counts_distinct_docs(spark):
    """A line repeated WITHIN one doc counts once toward df."""
    from updater_spark.operators.text import strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "rep\nrep\nrep\nunique")], "doc_id long, text string"
    )
    out = strip_boilerplate(docs, max_df=2).collect()[0]
    assert out["text"] == "rep\nrep\nrep\nunique"  # df=1, kept


def test_unigram_logprob_hand_computed(spark):
    import math

    from updater_spark.operators.text import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    # counts: a=2, b=2, c=1; N=5
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    exp1 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
    assert abs(out[1]["avg_logprob"] - round(exp1, 4)) < 1e-9
    assert abs(out[2]["avg_logprob"] - round(exp2, 4)) < 1e-9
    # rare-token doc scores lower than common-token doc
    assert out[2]["avg_logprob"] < out[1]["avg_logprob"]


def test_bm25_topk_matches_reference(spark):
    """BM25 scores and ranking match a pure-Python evaluation of the
    Robertson formula, including the rounded-score/doc-id total order
    and the query-as-term-SET convention (duplicate query terms count
    once)."""
    import math
    import re
    from collections import Counter

    from updater_spark.operators.text import bm25_topk

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the lazy dog sleeps all day the dog",
        3: "quick foxes and quick dogs",
        4: "a completely unrelated document about spark",
        5: "dog dog dog dog",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(100, "quick dog quick"), (200, "spark")],
        "qid long, qtext string",
    )
    got = {
        (r["qid"], r["rank"]): (r["doc_id"], r["score"])
        for r in bm25_topk(df, qs, k=3).collect()
    }

    def toks(t):
        return [w.lower() for w in re.split("[^A-Za-z]+", t) if w]

    tf = {i: Counter(toks(t)) for i, t in texts.items()}
    dl = {i: sum(c.values()) for i, c in tf.items()}
    n = len(texts)
    avgdl = sum(dl.values()) / n
    dfreq = Counter(t for c in tf.values() for t in c)
    k1, b = 1.2, 0.75

    def score(qid_terms, i):
        s = 0.0
        for t in qid_terms:
            if t not in tf[i]:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            f = tf[i][t]
            s += idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[i] / avgdl))
        return round(s, 4)

    for qid, qt in ((100, {"quick", "dog"}), (200, {"spark"})):
        want = sorted(
            (
                (score(qt, i), i)
                for i in texts
                if any(t in tf[i] for t in qt)
            ),
            key=lambda si: (-si[0], si[1]),
        )[:3]
        for rank, (s, i) in enumerate(want, 1):
            assert got[(qid, rank)] == (i, s), (qid, rank, got.get((qid, rank)), (i, s))
    # no row for docs that match nothing
    assert all(qid in (100, 200) for qid, _ in got)


def test_bigram_logprob_matches_reference(spark):
    """Add-k bigram model vs a pure-Python evaluation: train/score
    split, unseen-bigram and unseen-context smoothing, short-doc
    NULLs, and the scrambled-vs-fluent separation the unigram model
    cannot see."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from updater_spark.operators.text import bigram_logprob

    fluent = "the cat sat on the mat and the dog sat on the rug"
    scrambled = "mat the on dog sat rug the the and cat on sat the"
    texts = {
        1: fluent,
        2: fluent,
        3: scrambled,          # same words, broken sequence
        4: "completely new words here",  # unseen bigrams + contexts
        5: "one",              # < 2 tokens -> NULL
        6: "",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    train_pred = F.col("doc_id") <= 2
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob(
            df, train_filter=train_pred, add_k=0.5
        ).collect()
    }

    train_toks = [texts[1].split(), texts[2].split()]
    pair = Counter(
        (w[i], w[i + 1]) for w in train_toks for i in range(len(w) - 1)
    )
    ctx = Counter(w[i] for w in train_toks for i in range(len(w) - 1))
    v = len({t for w in train_toks for t in w})
    k = 0.5

    def score(text):
        w = text.split()
        if len(w) < 2:
            return (0, None)
        lps = [
            math.log(
                (pair.get((w[i], w[i + 1]), 0) + k)
                / (ctx.get(w[i], 0) + k * v)
            )
            for i in range(len(w) - 1)
        ]
        return (len(lps), round(sum(lps) / len(lps), 4))

    for i, t in texts.items():
        assert got[i] == score(t), (i, got[i], score(t))
    # fluent >> scrambled under the bigram model
    assert got[1][1] > got[3][1]
    # unseen context + unseen bigram degrades to exactly ln(1/V)
    import math as _m

    assert got[4][1] == round(_m.log(1.0 / v), 4)
    assert got[5] == (0, None) and got[6] == (0, None)

    # empty train set is loud
    import pytest

    with pytest.raises(ValueError, match="no tokens"):
        bigram_logprob(df, train_filter=F.col("doc_id") == 6)


def test_pmi_collocations_hand_value(spark):
    import math

    from updater_spark.operators.text import pmi_collocations

    # corpus: "a b" x3 and "c d" x1 -> unigrams: a3 b3 c1 d1 (N=8),
    # bigrams: (a,b)x3, (c,d)x1 (N=4)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a b"), (3, "c d")],
        "doc_id long, text string",
    )
    out = pmi_collocations(docs, min_count=1, k=10).collect()
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"]) for r in out}
    exp_ab = round(math.log((3 / 4) / ((3 / 8) * (3 / 8))), 4)
    exp_cd = round(math.log((1 / 4) / ((1 / 8) * (1 / 8))), 4)
    assert got[("a", "b")] == (3, exp_ab)
    assert got[("c", "d")] == (1, exp_cd)
    # min_count floor drops the hapax pair
    out2 = pmi_collocations(docs, min_count=2, k=10).collect()
    assert [(r["w1"], r["w2"]) for r in out2] == [("a", "b")]


def test_pmi_collocations_guards(spark):
    import pytest as _pytest

    from updater_spark.operators.text import pmi_collocations

    docs = spark.createDataFrame([(0, "solo")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="no bigrams"):
        pmi_collocations(docs)
    with _pytest.raises(ValueError, match="min_count"):
        pmi_collocations(docs, min_count=0)


def test_html_extract_hand_values(spark):
    from updater_spark.operators.text import html_extract

    rows = [
        # comments, style/script containers (with tag soup inside),
        # entities incl. one double-escape, inline + block tags
        (1, '<html><head><style>p{c}</style></head><body><!-- x -->'
            '<h1>Title</h1><p>Hello <b>world</b> &amp;amp; '
            '&lt;tag&gt;</p><script>var t="<p>no</p>";</script>'
            '<div>End&nbsp;block</div></body></html>'),
        (2, "<p>a</p><p>  </p><p>b</p>"),    # empty block drops
        (3, "plain, no tags at all"),        # passthrough
        (4, "<ul><li>one</li><li>two</li></ul>"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert out[1]["text"] == "Title\nHello world &amp; <tag>\nEnd block"
    assert out[1]["n_blocks"] == 3
    assert out[2]["text"] == "a\nb" and out[2]["n_blocks"] == 2
    assert out[3]["text"] == "plain, no tags at all"
    assert out[4]["text"] == "one\ntwo"


def test_html_extract_malformed_degrades_gracefully(spark):
    from updater_spark.operators.text import html_extract

    rows = [
        (1, "<p>unclosed <b>bold"),            # tags strip anyway
        (2, "<script>never closed, eats rest"),  # survives as text
        (3, "a < b and c > d"),                 # bare < consumes to >
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {r["doc_id"]: r["text"] for r in html_extract(df).collect()}
    assert out[1] == "unclosed bold"
    # no closing </script>: the drop pattern can't match, the open
    # tag strips as a tag and the content stays — lossy but stated
    assert out[2] == "never closed, eats rest"
    # "< b and c >" parses as one tag per the [^>]* pattern — the
    # documented lossiness of a regex extractor on bare angle brackets
    assert out[3] == "a d"


def test_html_extract_composes_with_quality_and_boilerplate(spark):
    from updater_spark.operators.text import (
        html_extract,
        quality_score,
        strip_boilerplate,
    )

    # 6 docs share a nav-menu block; per-doc unique body text
    rows = [
        (i, f"<div>HOME | ABOUT | CONTACT</div><p>unique body {i} "
            f"with several words here</p>")
        for i in range(6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    extracted = html_extract(df)  # (doc_id, text, n_blocks)
    cleaned = strip_boilerplate(extracted, max_df=3)
    for r in cleaned.collect():
        assert "HOME | ABOUT" not in r["text"]
        assert f"unique body {r['doc_id']}" in r["text"]
        assert r["n_dropped"] == 1
    scored = quality_score(extracted.select("doc_id", "text"))
    assert scored.count() == 6


def test_rrf_fuse_hand_values(spark):
    from updater_spark.operators.text import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "qid long, doc_id long, rank long",
    )
    dense = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2), (1, 10, 3)],
        "qid long, doc_id long, rank long",
    )
    out = {
        r["doc_id"]: (r["rrf_score"], r["n_sources"], r["rank"])
        for r in rrf_fuse([lex, dense], k=4).collect()
    }
    # doc 20: 1/62 + 1/61; doc 10: 1/61 + 1/63; doc 40: 1/62; doc 30: 1/63
    assert out[20][0] == round(1 / 62 + 1 / 61, 6)
    assert out[10][0] == round(1 / 61 + 1 / 63, 6)
    assert out[20][1] == 2 and out[40][1] == 1
    # fused order: both-list docs beat single-list docs here
    assert out[20][2] == 1 and out[10][2] == 2
    assert {out[30][2], out[40][2]} == {3, 4}


def test_rrf_fuse_ties_break_by_id_and_guards(spark):
    import pytest as _pytest

    from updater_spark.operators.text import rrf_fuse

    a = spark.createDataFrame(
        [(1, 7, 1), (1, 5, 2)], "qid long, doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(1, 9, 1), (1, 3, 2)], "qid long, doc_id long, rank long"
    )
    rows = rrf_fuse([a, b], k=4).collect()
    got = [(r["rank"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["rank"])]
    # 7 and 9 tie at 1/61 -> lower id first; 3 and 5 tie at 1/62
    assert got == [(1, 7), (2, 9), (3, 3), (4, 5)]
    with _pytest.raises(ValueError, match=">= 2 ranked"):
        rrf_fuse([a])
    with _pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([a, b], rrf_k=0)


def test_rrf_fuse_validate_unique(spark):
    import pytest as _pytest

    from updater_spark.operators.text import rrf_fuse

    a = spark.createDataFrame(
        [(1, 7, 1), (1, 5, 2)], "qid long, doc_id long, rank long"
    )
    # list 1 repeats (qid=1, doc_id=9) — a contract violation that
    # silently inflates rrf_score and n_sources without validation
    dup = spark.createDataFrame(
        [(1, 9, 1), (1, 9, 2), (1, 3, 3)],
        "qid long, doc_id long, rank long",
    )
    with _pytest.raises(ValueError, match=r"list 1 is not rank-unique"):
        rrf_fuse([a, dup], validate_unique=True)
    # clean inputs pass validation and fuse identically to default
    b = dup.filter("rank != 2")
    validated = sorted(
        (r["doc_id"], r["rrf_score"], r["rank"])
        for r in rrf_fuse([a, b], k=4, validate_unique=True).collect()
    )
    plain = sorted(
        (r["doc_id"], r["rrf_score"], r["rank"])
        for r in rrf_fuse([a, b], k=4).collect()
    )
    assert validated == plain and len(validated) == 4
    # without validation the duplicated pair double-counts — the trap
    # the flag exists to catch
    bad = {
        r["doc_id"]: r["n_sources"]
        for r in rrf_fuse([a, dup], k=4).collect()
    }
    assert bad[9] == 2


def test_url_normalize_hand_values(spark):
    from updater_spark.operators.text import url_normalize

    rows = [
        (1, "HTTP://WWW.Site.com:80/a/?b=2&a=1&utm_x=t#frag"),
        (2, "http://site.com/a?a=1&b=2"),      # same canonical as 1
        (3, "https://Example.COM:443/Path/Sub/"),
        (4, "https://example.com/Path/Sub"),   # same canonical as 3
        (5, "not a url"),                      # passthrough, host NULL
        (6, "  https://h.io/?fbclid=abc  "),   # tracking-only query
        (7, "ftp://Files.example.org:21/x"),   # non-http port KEPT
        (8, "https://x.io/p?ref=nav&keep=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: (r["url_norm"], r["host"]) for r in url_normalize(df).collect()}
    assert out[1] == out[2] == ("http://site.com/a?a=1&b=2", "site.com")
    assert out[3] == out[4] == ("https://example.com/Path/Sub", "example.com")
    assert out[5] == ("not a url", None)
    assert out[6] == ("https://h.io", "h.io")
    # default-port stripping is scheme-aware: ftp's :21 is data
    assert out[7] == ("ftp://files.example.org:21/x", "files.example.org:21")
    assert out[8] == ("https://x.io/p?keep=1", "x.io")


def test_url_normalize_dedups_at_scale_shape(spark):
    from updater_spark.operators.text import url_normalize

    # 100 URLs, 10 canonical pages under scheme/case/port/query noise
    rows = [
        (
            i,
            ("HTTP://WWW." if i % 2 else "http://")
            + f"host{i % 10}.COM"
            + (":80" if i % 2 else "")
            + "/p"
            + ("?b=1&a=2&utm_q=z" if i % 3 == 0 else "?a=2&b=1"),
        )
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    n = url_normalize(df).select("url_norm").distinct().count()
    assert n == 10


def test_encoding_quality_hand_values(spark):
    from updater_spark.operators.text import encoding_quality

    rows = [
        (1, "perfectly clean text"),
        (2, "two � bad � chars"),
        (3, "cafÃ© and â€™quote"),  # Ã© + â€™
        (4, "ctl\x01 but \t tab and \n newline are fine"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: tuple(r)[1:] for r in encoding_quality(df).collect()}
    assert out[1] == (0, 0, 0, 1)
    assert out[2] == (2, 0, 0, 0)
    assert out[3] == (0, 0, 2, 0)
    assert out[4] == (0, 1, 0, 0)
    assert out[5] == (None, None, None, None)


def test_web_ingestion_pipeline_composes(spark):
    """End-to-end front-end of a crawl pipeline, every stage this
    repo's own operator: html_extract -> encoding_quality gate ->
    url_normalize dedup -> quality_score. Pins that the stage
    CONTRACTS line up (column names/shapes), not just that each
    stage works alone."""
    import pyspark.sql.functions as F

    from updater_spark.operators.text import (
        encoding_quality,
        html_extract,
        quality_score,
        url_normalize,
    )

    pages = [
        # two URL variants of the same page -> one survivor
        (1, "HTTP://WWW.a.com:80/x?b=2&a=1", "<p>the quick brown fox jumps over it</p>"),
        (2, "http://a.com/x?a=1&b=2", "<p>the quick brown fox jumps over it</p>"),
        # encoding-broken page -> dropped by the gate
        (3, "http://b.com/y", "<p>broken � page</p>"),
        # clean unique page -> kept
        (4, "http://c.com/z", "<div>another page with plenty of words here</div>"),
    ]
    df = spark.createDataFrame(pages, "doc_id long, url string, html string")
    extracted = html_extract(df)  # (doc_id, text, n_blocks)
    gated = (
        extracted.join(
            encoding_quality(extracted).select("doc_id", "enc_ok"), "doc_id"
        )
        .filter(F.col("enc_ok") == 1)
        .drop("enc_ok")
    )
    with_urls = gated.join(df.select("doc_id", "url"), "doc_id")
    canon = url_normalize(with_urls)
    survivors = (
        canon.groupBy("url_norm")
        .agg(F.min("doc_id").alias("doc_id"))
        .join(canon.select("doc_id", "text"), "doc_id")
    )
    assert sorted(r["doc_id"] for r in survivors.collect()) == [1, 4]
    scored = quality_score(survivors.select("doc_id", "text"))
    assert scored.count() == 2


def test_bm25_champion_list_prune(spark):
    """Champion-list contract: champion_n >= n_docs is IDENTICAL to
    exact; under a real cut, scores only ever DROP (a pruned posting
    removes contributions, never adds); and on a corpus with
    discriminative rare terms — the retrieval shape BM25 is built
    for, where idf concentrates score mass in short posting lists
    the cut never touches — recall@5 vs exact stays ~1 while only
    Zipf-head posting lists are pruned. A tf-flat corpus with NO
    rare terms (e.g. the tiny synthetic documents table) is the
    documented worst case: every list is a head list, ties break by
    doc_id, and pruning is arbitrary — champion_n is opt-in for
    exactly that reason."""
    from updater_spark.operators.text import bm25_topk

    # 300 docs: 8 shared filler words (df=300 head terms) + 2 rare
    # doc-specific terms (df<=2: doc i shares its "rare" tokens with
    # doc i+150, making non-trivial cross-doc matches)
    rows = []
    for i in range(300):
        filler = "alpha beta gamma delta epsilon zeta eta theta"
        # letters only: _ascii_terms splits on non-alpha, so a
        # digit-bearing token would shatter into common fragments
        a, b = chr(97 + (i % 150) % 26), chr(97 + (i % 150) // 26)
        rare = f"uq{a}{b}xx uq{a}{b}yy"
        rows.append((i, f"{filler} {rare}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    qs = spark.createDataFrame(
        [(i, "alpha beta uq{0}{1}xx uq{0}{1}yy".format(
            chr(97 + (i % 150) % 26), chr(97 + (i % 150) // 26)))
         for i in range(0, 300, 29)],
        "qid long, qtext string",
    )
    exact = bm25_topk(docs, qs, k=5).collect()
    # champion_n >= corpus size: the cut keeps every posting
    full = bm25_topk(docs, qs, k=5, champion_n=1_000).collect()
    key = lambda r: (r["qid"], r["rank"], r["doc_id"], r["score"])
    assert sorted(map(key, full)) == sorted(map(key, exact))

    pruned_rows = bm25_topk(docs, qs, k=5, champion_n=16).collect()
    exact_score = {(r["qid"], r["doc_id"]): r["score"] for r in exact}
    for r in pruned_rows:
        k2 = (r["qid"], r["doc_id"])
        if k2 in exact_score:
            assert r["score"] <= exact_score[k2] + 1e-9, (k2, r["score"])
    # recall@5: the rare-term postings (df<=2 << champion_n) are
    # untouched, and they carry the idf mass that decides the top-5
    exact_sets, pruned_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["qid"], set()).add(r["doc_id"])
    for r in pruned_rows:
        pruned_sets.setdefault(r["qid"], set()).add(r["doc_id"])
    recalls = [
        len(exact_sets[q] & pruned_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    for q in exact_sets:
        assert q in pruned_sets.get(q, set()), q  # self-retrieval survives


def test_bm25_champion_rejects_bad_n(spark):
    from updater_spark.operators.text import bm25_topk

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    qs = spark.createDataFrame([(1, "a")], "qid long, qtext string")
    with pytest.raises(ValueError, match="champion_n"):
        bm25_topk(docs, qs, champion_n=0).collect()


@pytest.mark.parametrize("champion_n", [None, 3])
def test_bm25_persist_posting_identical(spark, champion_n):
    """persist_posting is a pure execution-plan toggle (ADVICE r11):
    the cached-posting path must return row-identical results to the
    recompute path, for both the exact and the champion-cut legs —
    a regression in the persist branch (row identity or the shared
    single-tokenize subtree) would otherwise go undetected."""
    from updater_spark.operators.text import bm25_topk

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the lazy dog sleeps all day the dog",
        3: "quick foxes and quick dogs",
        4: "a completely unrelated document about spark",
        5: "dog dog dog dog",
        6: None,
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    qs = spark.createDataFrame(
        [(100, "quick dog quick"), (200, "spark"), (300, "fox day")],
        "qid long, qtext string",
    )
    off = bm25_topk(docs, qs, k=3, champion_n=champion_n)
    on = bm25_topk(
        docs, qs, k=3, champion_n=champion_n, persist_posting=True
    )
    assert sorted(map(tuple, off.collect())) == sorted(
        map(tuple, on.collect())
    )
