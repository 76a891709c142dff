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
