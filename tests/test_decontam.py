"""Decontamination + grouped quantiles vs Python oracles."""

from pyspark.sql import Row
from pyspark.sql import functions as F

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


def test_semantic_contamination_flags_and_values(spark):
    import math

    import numpy as np
    import pytest

    from updater_spark.operators.decontam import semantic_contamination

    rng = np.random.RandomState(11)
    bench_vecs = rng.randn(6, 8)
    far_vecs = rng.randn(10, 8) * 0.5 - 3.0  # shifted cluster
    bench = spark.createDataFrame(
        [Row(vec_id=i, v=[float(x) for x in bench_vecs[i]]) for i in range(6)]
    )
    corpus_rows = (
        # exact rescales of bench rows: cos == 1.0 -> contaminated
        [
            Row(vec_id=100 + i, v=[float(x) * 2.5 for x in bench_vecs[i]])
            for i in range(3)
        ]
        # tiny direction nudge: still >= 0.95
        + [
            Row(
                vec_id=200,
                v=[float(x) + 0.01 for x in bench_vecs[3]],
            )
        ]
        + [
            Row(vec_id=300 + i, v=[float(x) for x in far_vecs[i]])
            for i in range(10)
        ]
    )
    corpus = spark.createDataFrame(corpus_rows)
    got = {
        r["vec_id"]: (r["max_sim"], r["contaminated"])
        for r in semantic_contamination(
            corpus, bench, "vec_id", "v", threshold=0.95
        ).collect()
    }
    assert len(got) == len(corpus_rows)
    for i in range(3):
        assert got[100 + i] == (1.0, True)
    assert got[200][1] is True

    # numpy reference for every value
    bn = bench_vecs / np.linalg.norm(bench_vecs, axis=1, keepdims=True)
    for r in corpus_rows:
        c = np.asarray(r.v)
        c = c / np.linalg.norm(c)
        want = round(float((c @ bn.T).max()), 4)
        assert math.isclose(got[r.vec_id][0], want, abs_tol=1e-9)
        assert got[r.vec_id][1] == (want >= 0.95)


def test_semantic_contamination_guards(spark):
    import pytest

    from updater_spark.operators.decontam import semantic_contamination

    corpus = spark.createDataFrame([Row(vec_id=1, v=[1.0, 0.0])])
    big_bench = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("v"),
    )
    with pytest.raises(ValueError, match="max_benchmark"):
        semantic_contamination(
            corpus, big_bench, "vec_id", "v", max_benchmark=5
        )
    with pytest.raises(ValueError, match="empty"):
        semantic_contamination(
            corpus, big_bench.limit(0), "vec_id", "v"
        )
    # zero vectors must not NaN out the scan
    zc = spark.createDataFrame([Row(vec_id=9, v=[0.0, 0.0])])
    row = semantic_contamination(
        zc, big_bench.limit(3), "vec_id", "v"
    ).collect()[0]
    assert row["max_sim"] == 0.0 and row["contaminated"] is False


def test_semantic_contamination_names_bad_vectors(spark):
    import pytest
    from pyspark.sql import types as T

    from updater_spark.operators.decontam import semantic_contamination

    bench = spark.createDataFrame([Row(vec_id=1, v=[1.0, 0.0])])
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, None), (12, [1.0, 0.0, 5.0])], schema
    )
    with pytest.raises(Exception, match="NULL or wrong-dimension"):
        semantic_contamination(corpus, bench, "vec_id", "v").collect()


def test_semantic_contamination_names_bad_benchmark_vectors(spark):
    """The BENCHMARK side gets the same validation as the corpus: a
    NULL or ragged-dimension benchmark embedding used to make
    np.asarray build an object array and np.linalg.norm die with an
    opaque driver-side TypeError (ADVICE r7) — now the offending row
    indices are named before the matrix is built."""
    import pytest
    from pyspark.sql import types as T

    from updater_spark.operators.decontam import semantic_contamination

    corpus = spark.createDataFrame([Row(vec_id=1, v=[1.0, 0.0])])
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
        ]
    )
    bench_null = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])], schema
    )
    with pytest.raises(ValueError, match="benchmark rows \\[1\\]"):
        semantic_contamination(corpus, bench_null, "vec_id", "v")
    bench_ragged = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 3.0])], schema
    )
    with pytest.raises(ValueError, match="wrong-dimension"):
        semantic_contamination(corpus, bench_ragged, "vec_id", "v")
