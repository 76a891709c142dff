"""Property-based invariants for the round-9 ingestion operators:
URL canonicalization must be IDEMPOTENT (a canonical form that
re-canonicalizes to something else is not canonical), HTML extraction
must keep its block bookkeeping consistent on arbitrary tag soup, and
byte-level BPE must round-trip any Unicode word (the UNK-free
guarantee as a property, not an example)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# URL-ish generator: enough structure to hit every normalization arm,
# enough junk to hit the passthrough path
scheme_st = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", ""])
host_st = st.text(alphabet="abXY.w", min_size=1, max_size=10)
port_st = st.sampled_from(["", ":80", ":443", ":8080"])
path_st = st.text(alphabet="/abC1", min_size=0, max_size=8)
param_st = st.sampled_from(
    ["a=1", "b=2", "utm_source=x", "fbclid=z", "ref=nav", "Keep=Case", ""]
)
query_st = st.lists(param_st, max_size=4).map("&".join)
frag_st = st.sampled_from(["", "#f", "#frag"])


@st.composite
def url_st(draw):
    s = draw(scheme_st)
    if not s:
        return draw(st.text(alphabet="ab <>:/?#", max_size=12))
    u = f"{s}://{draw(host_st)}{draw(port_st)}{draw(path_st)}"
    q = draw(query_st)
    if q:
        u += "?" + q
    return u + draw(frag_st)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(url_st(), min_size=1, max_size=20))
def test_url_normalize_idempotent(spark, urls):
    from updater_spark.operators.text import url_normalize

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    once = url_normalize(df).select(
        "doc_id", "url_norm"
    )
    twice = url_normalize(
        once.withColumnRenamed("url_norm", "url")
    ).select("doc_id", "url_norm")
    a = dict((r["doc_id"], r["url_norm"]) for r in once.collect())
    b = dict((r["doc_id"], r["url_norm"]) for r in twice.collect())
    assert a == b


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(alphabet="ab <>/&;! péσ\tx-", max_size=40),
        min_size=1,
        max_size=15,
    )
)
def test_html_extract_block_bookkeeping(spark, docs):
    from updater_spark.operators.text import html_extract

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, html string"
    )
    for r in html_extract(df).collect():
        text, n = r["text"], r["n_blocks"]
        if text == "":
            assert n == 0
        else:
            blocks = text.split("\n")
            assert n == len(blocks)
            for b in blocks:
                assert b == b.strip(" ") and b != ""
                assert "  " not in b  # whitespace collapsed


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
                blacklist_characters=" \t\n\r",
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_byte_bpe_roundtrips_any_unicode(spark, words):
    from updater_spark.operators.tokenizer import bpe_tokenize

    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    out = bpe_tokenize(
        df, "text", [("61", "62")], max_word_len=8, byte_level=True
    ).collect()[0]
    import re

    got_words = out["pieces"].split(" ") if out["pieces"] else []
    # reference model mirrors the documented contract: split on ASCII
    # whitespace ONLY — Python str.split() also drops \x1f-style
    # unicode whitespace, which the engine correctly treats as data
    joined = " ".join(words)
    exp_words = [
        w[:8] for w in re.split(r"[ \t\n\r]+", joined.strip(" ")) if w
    ]
    assert len(got_words) == len(exp_words)
    for hx, w in zip(got_words, exp_words):
        assert bytes.fromhex(hx.replace("|", "")).decode("utf-8") == w
