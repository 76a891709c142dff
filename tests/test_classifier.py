"""Naive Bayes classifier vs a pure-Python oracle, plus contracts:
learnability on a marker corpus, OOV handling, min_df cut, hashed
V-geometry, and the broadcast gate (plan-level)."""

import math

import pytest
from pyspark.sql import Row

from updater_spark.operators.classifier import nb_score, nb_train

# A corpus with REAL lexical signal (unlike the synthetic sf tables,
# whose lang is independent of text): marker words dominate each class.
TRAIN = [
    Row(doc_id=1, lang="en", text="the cat and the dog run in the park"),
    Row(doc_id=2, lang="en", text="the quick fox and a lazy dog"),
    Row(doc_id=3, lang="fr", text="le chat et le chien dans la maison"),
    Row(doc_id=4, lang="fr", text="la vie et le temps des amis"),
]
TEST = [
    Row(doc_id=10, lang="en", text="the dog and the fox"),
    Row(doc_id=11, lang="fr", text="le chien et la vie"),
    Row(doc_id=12, lang="en", text="zzz qqq unseen tokens only"),
]
LABELS = ["en", "fr"]


def _py_nb(train, test, labels, alpha=1.0, min_df=1, bits=None):
    """Reference implementation: plain dict counting."""
    import zlib  # noqa: F401  (not used; hash path replays md5 below)

    def tok(t):
        return t.strip().split()

    def bucket(w):
        if bits is None:
            return w
        import hashlib

        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % (1 << bits)

    counts: dict = {}
    for r in train:
        for w in tok(r.text):
            b = bucket(w)
            counts.setdefault(b, {l: 0 for l in labels})
            counts[b][r.lang] += 1
    counts = {
        b: c for b, c in counts.items() if sum(c.values()) >= min_df
    }
    V = (1 << bits) if bits is not None else len(counts)
    N = {l: sum(c[l] for c in counts.values()) for l in labels}
    docs = {l: sum(1 for r in train if r.lang == l) for l in labels}
    prior = {l: math.log(docs[l] / len(train)) for l in labels}
    oov = {l: math.log(alpha / (N[l] + alpha * V)) for l in labels}
    out = {}
    for r in test:
        post = {}
        for l in labels:
            s = prior[l]
            for w in tok(r.text):
                b = bucket(w)
                if b in counts:
                    s += math.log(
                        (counts[b][l] + alpha) / (N[l] + alpha * V)
                    )
                else:
                    s += oov[l]
            post[l] = s
        best = max(labels, key=lambda l: (post[l], -labels.index(l)))
        vals = sorted(post.values())
        out[r.doc_id] = (best, round(vals[-1] - vals[-2], 4))
    return out


@pytest.mark.parametrize("bits", [None, 10])
def test_nb_matches_python_oracle(spark, bits):
    train = spark.createDataFrame(TRAIN)
    test = spark.createDataFrame(TEST)
    model, meta = nb_train(train, "lang", "text", LABELS, hash_bits=bits)
    got = {
        r["doc_id"]: (r["pred"], r["margin"])
        for r in nb_score(
            test, model, meta, "doc_id", "text", keep_cols=("lang",)
        ).collect()
    }
    want = _py_nb(TRAIN, TEST, LABELS, bits=bits)
    assert got == want
    # learnability: marker corpus classifies correctly
    assert got[10][0] == "en" and got[11][0] == "fr"


def test_nb_oov_doc_falls_to_prior(spark):
    """A fully-OOV doc scores n·oov_l + prior_l — with balanced token
    mass the prior decides; here both classes have 2 docs, so the
    tie-break (and the larger-vocab-denominator geometry) decides
    deterministically and matches the Python oracle."""
    train = spark.createDataFrame(TRAIN)
    test = spark.createDataFrame(TEST)
    model, meta = nb_train(train, "lang", "text", LABELS)
    got = {
        r["doc_id"]: r["pred"]
        for r in nb_score(test, model, meta, "doc_id", "text").collect()
    }
    assert got[12] == _py_nb(TRAIN, TEST, LABELS)[12][0]


def test_nb_min_df_shrinks_model_and_geometry(spark):
    train = spark.createDataFrame(TRAIN)
    m1, meta1 = nb_train(train, "lang", "text", LABELS, min_df=1)
    m2, meta2 = nb_train(train, "lang", "text", LABELS, min_df=2)
    assert m2.count() < m1.count()
    assert meta2.vocab_size == m2.count()  # V follows the cut
    assert all(
        meta2.label_tokens[l] <= meta1.label_tokens[l] for l in LABELS
    )
    test = spark.createDataFrame(TEST)
    want = _py_nb(TRAIN, TEST, LABELS, min_df=2)
    got = {
        r["doc_id"]: (r["pred"], r["margin"])
        for r in nb_score(test, m2, meta2, "doc_id", "text").collect()
    }
    assert got == want


def test_nb_hashed_fixed_v_no_count_pass(spark):
    train = spark.createDataFrame(TRAIN)
    model, meta = nb_train(train, "lang", "text", LABELS, hash_bits=6)
    assert meta.vocab_size == 64  # 2**bits regardless of seen buckets
    assert model.count() <= 64


def test_nb_empty_label_fails_loudly(spark):
    train = spark.createDataFrame(TRAIN)
    with pytest.raises(ValueError, match="no training documents"):
        nb_train(train, "lang", "text", ["en", "fr", "xx"])


def test_nb_null_text_doc_scores_priors_only(spark):
    """A NULL-text document must NOT vanish from the scored output
    (plain explode drops the row): it rides explode_outer as one
    NULL-token row contributing 0 likelihood, so its posterior is
    exactly the priors — pred = argmax prior, margin = prior gap."""
    from pyspark.sql import types as T

    train = spark.createDataFrame(TRAIN)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    test = spark.createDataFrame(
        [(10, "en", "the dog and the fox"), (99, "en", None)], schema
    )
    for bits in (None, 10):
        model, meta = nb_train(train, "lang", "text", LABELS, hash_bits=bits)
        got = {
            r["doc_id"]: (r["pred"], r["margin"])
            for r in nb_score(test, model, meta, "doc_id", "text").collect()
        }
        assert set(got) == {10, 99}  # the NULL-text doc is present
        pri = sorted(meta.priors.values())
        want_pred = max(
            LABELS, key=lambda l: (meta.priors[l], -LABELS.index(l))
        )
        assert got[99] == (want_pred, round(pri[-1] - pri[-2], 4))


def test_nb_single_label_fails_loudly(spark):
    train = spark.createDataFrame(TRAIN)
    with pytest.raises(ValueError, match=">= 2 labels"):
        nb_train(train, "lang", "text", ["en"])


def test_nb_broadcast_gate(spark):
    """Small vocab → broadcast join; gate at 0 → shuffle join."""
    train = spark.createDataFrame(TRAIN)
    test = spark.createDataFrame(TEST)
    model, meta = nb_train(train, "lang", "text", LABELS)
    plan_b = nb_score(
        test, model, meta, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b
    plan_s = nb_score(
        test, model, meta, "doc_id", "text", max_broadcast_vocab=0
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_s


def test_logreg_learns_separable_data(spark):
    from updater_spark.operators.classifier import logreg_score, logreg_train

    # y = 1 iff x1 > 0: linearly separable on one feature
    rows = [(i, float(i % 2), 1.0 if i % 2 else -1.0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, y double, x1 double")
    model = logreg_train(df, "y", ["x1"], lr=1.0, iters=10)
    assert model.weights[1] > 0  # positive weight on the separating feature
    scored = logreg_score(df, model, "doc_id").collect()
    acc = sum(
        1 for r in scored if r["keep"] == (1 if r["doc_id"] % 2 else 0)
    ) / len(scored)
    assert acc == 1.0


def test_logreg_deterministic_across_partitionings(spark):
    from updater_spark.operators.classifier import logreg_train

    rows = [
        (i, float(i % 3 == 0), float(i % 7) / 3.0, float(i % 5) / 2.0)
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, y double, x1 double, x2 double")
    m1 = logreg_train(df.repartition(1), "y", ["x1", "x2"])
    m2 = logreg_train(df.repartition(7), "y", ["x1", "x2"])
    # gradient rounding makes the weights exact, not partitioning-dependent
    assert m1.weights == m2.weights


def test_logreg_guards(spark):
    import pytest as _pytest

    from updater_spark.operators.classifier import logreg_train

    df = spark.createDataFrame([(1, 1.0, 1.0)], "doc_id long, y double, x double")
    with _pytest.raises(ValueError, match="iters"):
        logreg_train(df, "y", ["x"], iters=0)
    with _pytest.raises(ValueError, match="feature_cols"):
        logreg_train(df, "y", [])


def test_classifier_eval_hand_values(spark):
    from updater_spark.operators.classifier import classifier_eval

    # 4 pos, 4 neg with a known ordering; one tie pair at 0.5
    rows = [
        (1, 0.9), (1, 0.8), (1, 0.5), (1, 0.2),
        (0, 0.7), (0, 0.5), (0, 0.3), (0, 0.1),
    ]
    df = spark.createDataFrame(rows, "y int, s double")
    out = {
        r["threshold"]: r
        for r in classifier_eval(df, "y", "s", thresholds=[0.5]).collect()
    }
    r = out[0.5]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 2, 1, 2)
    assert r["precision"] == 0.6 and r["recall"] == 0.75
    assert r["f1"] == round(2 * 0.6 * 0.75 / 1.35, 6)
    # hand AUC with average ranks: pos>neg pairs = 4+4+2+1 = 11 full
    # wins + the 0.5-0.5 tie counts 0.5 => 11.5 / 16
    assert r["auc"] == round(11.5 / 16, 6)
    assert r["n_excluded"] == 0


def test_classifier_eval_nulls_and_degenerate(spark):
    import pytest as _pytest

    from updater_spark.operators.classifier import classifier_eval

    rows = [(1, 0.9), (None, 0.5), (0, None), (0, 0.1)]
    df = spark.createDataFrame(rows, "y int, s double")
    out = classifier_eval(df, "y", "s", thresholds=[0.95]).collect()[0]
    assert out["n_excluded"] == 2
    # no predicted positives at 0.95: precision NULL, recall 0
    assert out["tp"] == 0 and out["precision"] is None
    assert out["recall"] == 0.0 and out["f1"] is None
    # single-class input: AUC NULL
    pos_only = spark.createDataFrame([(1, 0.9), (1, 0.2)], "y int, s double")
    assert (
        classifier_eval(pos_only, "y", "s", thresholds=[0.5])
        .collect()[0]["auc"]
        is None
    )
    with _pytest.raises(ValueError, match="thresholds"):
        classifier_eval(df, "y", "s", thresholds=[])
