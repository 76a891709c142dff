"""Decontamination + grouped quantiles vs Python oracles."""

from pyspark.sql import Row

from updater_spark.operators.decontam import contamination, decontaminate


def _grams(text, n):
    toks = text.split()
    return {
        " ".join(toks[i : i + n])
        for i in range(max(len(toks) - n + 1, 1))
    }


CORPUS = [
    # doc 1 fully contains the benchmark sentence → contaminated
    Row(doc_id=1, text="alpha beta gamma delta epsilon zeta eta theta iota"),
    # doc 2 shares a long run with doc 1 but not with the benchmark
    Row(doc_id=2, text="one two three four five six seven eight nine ten"),
    # doc 3 short, disjoint
    Row(doc_id=3, text="completely different words here entirely"),
]
BENCH = [Row(bid=100, text="beta gamma delta epsilon zeta eta theta")]


def test_contamination_oracle(spark):
    corpus = spark.createDataFrame(CORPUS)
    bench = spark.createDataFrame(BENCH)
    n = 4
    got = {
        r["doc_id"]: r
        for r in contamination(corpus, bench, "doc_id", "text", n=n).collect()
    }
    bench_grams = set()
    for b in BENCH:
        bench_grams |= _grams(b.text, n)
    for d in CORPUS:
        g = _grams(d.text, n)
        r = got[d.doc_id]
        assert r["n_grams"] == len(g)
        assert r["n_hit_grams"] == len(g & bench_grams)
        assert r["contaminated"] == bool(g & bench_grams)
    assert got[1]["contaminated"] and not got[2]["contaminated"]


def test_decontaminate_drops_only_dirty(spark):
    corpus = spark.createDataFrame(CORPUS)
    bench = spark.createDataFrame(BENCH)
    kept = decontaminate(corpus, bench, "doc_id", "text", n=4)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]
    assert kept.columns == corpus.columns


def test_group_quantiles_oracle(spark):
    from updater_spark.operators.aggregates import group_quantiles

    rows = [Row(g="a", v=float(x)) for x in [1, 2, 3, 4, 10]] + [
        Row(g="b", v=float(x)) for x in [5, 7]
    ]
    got = {
        r["g"]: r
        for r in group_quantiles(
            spark.createDataFrame(rows), ["g"], "v", probs=(0.5, 0.9)
        ).collect()
    }

    def interp(vals, p):
        vals = sorted(vals)
        pos = p * (len(vals) - 1)
        lo = int(pos)
        hi = min(lo + 1, len(vals) - 1)
        return round(vals[lo] + (vals[hi] - vals[lo]) * (pos - lo), 6)

    a_vals = [1, 2, 3, 4, 10]
    assert got["a"]["n"] == 5
    assert got["a"]["vmin"] == 1 and got["a"]["vmax"] == 10
    assert got["a"]["p50"] == interp(a_vals, 0.5)
    assert got["a"]["p90"] == interp(a_vals, 0.9)
    assert got["b"]["p50"] == 6.0


def test_bloom_variant_matches_exact(spark, sf_dir):
    """contamination_bloom must produce EXACTLY contamination's output
    (no false negatives by Bloom construction; false positives removed
    by the verify join) — on the real documents table."""
    from pyspark.sql import functions as F

    from updater_spark.operators.decontam import (
        contamination,
        contamination_bloom,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    exact = contamination(docs, bench, "doc_id", "text", n=8)
    bloom = contamination_bloom(docs, bench, "doc_id", "text", n=8)
    key = lambda r: r["doc_id"]  # noqa: E731
    a = sorted(exact.collect(), key=key)
    b = sorted(bloom.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # sanity: scenario actually contains contaminated docs
    assert any(r["contaminated"] for r in a)


def test_bloom_tiny_filter_forces_fp_then_verify_kills_them(spark):
    """With a deliberately tiny Bloom (high fpp) the prefilter passes
    false candidates — the exact verify must still zero them out."""
    from pyspark.sql import Row

    from updater_spark.operators.decontam import contamination_bloom

    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"unique text body number {i} with words") for i in range(50)]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=0, text="completely disjoint benchmark content here")]
    )
    out = contamination_bloom(
        corpus, bench, "doc_id", "text", n=3, m_bits=64, num_probes=1
    )
    assert out.filter("contaminated").count() == 0


def test_bloom_parameter_validation(spark):
    """Invalid Bloom shapes fail fast with clear errors instead of an
    IndexError (ragged word array) or a crash on an empty plan."""
    import pytest

    from updater_spark.operators.decontam import contamination_bloom

    corpus = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([("a b c",)], "text string")
    with pytest.raises(ValueError, match="multiple of 64"):
        contamination_bloom(corpus, bench, "doc_id", "text", n=2, m_bits=100)
    with pytest.raises(ValueError, match="num_probes"):
        contamination_bloom(
            corpus, bench, "doc_id", "text", n=2, num_probes=0
        )
