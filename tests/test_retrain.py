"""Re-train actuators: ``pq_train`` (the residual-PQ codebook
trainer) and ``retrain``/``maybe_retrain`` on IvfIndex, IvfPqIndex,
and SemanticIndex — the consumers of the ``needs_retrain`` advisory
(VERDICT r5 #7 added the telemetry; this wires the actuator).

The invariants: pq_train equals a straight single-threaded numpy
implementation EXACTLY (on integer-valued vectors, where float sums
are order-independent); a retrain leaves the index in exactly the
state a fresh bootstrap of the current corpus with the same trained
quantizer would produce; and the measure→advise→act loop trips on a
drifted index and repairs its skew."""

import numpy as np
import pytest
from pyspark.sql import Row

from updater_spark.operators.ann_index import (
    IvfIndex,
    IvfPqIndex,
    needs_retrain,
)
from updater_spark.operators.semantic_index import SemanticIndex
from updater_spark.operators.similarity import (
    ivf_topk,
    ivf_train,
    ivfpq_topk,
    pq_train,
)


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def int_corpus(spark):
    """Integer-valued doubles: float sums are exact regardless of
    partition/accumulation order, so Spark-side distributed partial
    sums equal numpy's single-pass sums bit-for-bit."""
    dim = 8
    rows = [
        Row(
            vec_id=i,
            embedding=[float(((i * 7 + j * 3) % 11) - 5) for j in range(dim)],
        )
        for i in range(60)
    ]
    vecs = np.array([r.embedding for r in rows], dtype=np.float64)
    return spark.createDataFrame(rows), vecs


def _pq_train_numpy(vecs, cents, m_sub, k_cw, iters):
    """Reference implementation: same init (residual subvectors of the
    K lowest-id rows), same assignment (argmax dot / argmin d2, ties
    low), same update (mean; empty codewords keep previous)."""
    cm = np.array(cents, dtype=np.float64)
    sub = vecs.shape[1] // m_sub
    cells = (vecs @ cm.T).argmax(axis=1)
    resid = (vecs - cm[cells]).reshape(len(vecs), m_sub, sub)
    cb = np.ascontiguousarray(resid[:k_cw].transpose(1, 0, 2))
    for _ in range(iters):
        d2 = ((resid[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
        codes = d2.argmin(axis=2)
        new = cb.copy()
        for m in range(m_sub):
            for c in range(k_cw):
                mask = codes[:, m] == c
                if mask.any():
                    new[m, c] = resid[mask, m].mean(axis=0)
        cb = new
    return cb


def test_pq_train_matches_numpy_exactly(spark, int_corpus):
    df, vecs = int_corpus
    cents = [[float(x) for x in vecs[0]], [float(x) for x in vecs[30]]]
    got = pq_train(
        df, cents, m_sub=2, k_codewords=4, iterations=3
    )
    want = _pq_train_numpy(vecs, cents, m_sub=2, k_cw=4, iters=3)
    assert np.array_equal(np.array(got, dtype=np.float64), want)


def test_pq_train_reduces_quantization_error(spark, int_corpus):
    """More Lloyd iterations never increase the mean residual
    quantization error (the k-means objective is non-increasing)."""
    df, vecs = int_corpus
    cents = [[float(x) for x in vecs[0]], [float(x) for x in vecs[30]]]
    cm = np.array(cents)
    cells = (vecs @ cm.T).argmax(axis=1)
    resid = (vecs - cm[cells]).reshape(len(vecs), 2, 4)

    def err(books):
        cb = np.array(books, dtype=np.float64)
        d2 = ((resid[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
        return d2.min(axis=2).sum()

    errs = [
        err(pq_train(df, cents, m_sub=2, k_codewords=4, iterations=i))
        for i in (0, 1, 3)
    ]
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] < errs[0]  # and it actually improves on this data


def test_pq_train_validates_geometry(spark, int_corpus):
    df, _ = int_corpus
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, [[0.0] * 8], m_sub=3)
    with pytest.raises(ValueError, match="k_codewords"):
        pq_train(df, [[0.0] * 8], m_sub=2, k_codewords=100)


@pytest.fixture(scope="module")
def drift_corpus(spark):
    """120 random base vectors + 300 vectors fanning tightly around
    one direction: with a degenerate (parallel) codebook everything
    lands in ≤2 cells and the hot direction makes one of them ~5x the
    other. The fan vectors are DISTINCT (sweeping a second direction)
    — exact-duplicate vectors would flood the top-k with exact sim
    ties, whose survival through the per-batch argpartition cut is
    partitioning-dependent."""
    rng = np.random.RandomState(23)
    base = rng.randn(120, 16).astype(np.float64)
    hot_vecs = base[0][None, :] + np.linspace(0.0, 0.5, 300)[:, None] * base[
        1
    ][None, :]
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in base[i]])
        for i in range(120)
    ] + [
        Row(vec_id=1000 + i, embedding=[float(x) for x in hot_vecs[i]])
        for i in range(300)
    ]
    return spark.createDataFrame(rows), base


def test_ivf_retrain_lifecycle(spark, drift_corpus, tmp_store):
    df, base = drift_corpus
    bad = [
        [float(x) for x in base[0]],
        [float(2.0 * x) for x in base[0]],
    ]  # parallel: ≤2 cells
    idx = IvfIndex(tmp_store, "drifted")
    idx.bootstrap(df.filter("vec_id < 120"), bad)
    idx.upsert(df.filter("vec_id >= 1000"))

    before = idx.occupancy()
    assert needs_retrain(before, 1.5)
    out = idx.maybe_retrain(max_imbalance=1.5, k=4, iterations=2)
    assert out["retrained"] is True
    # the hot direction gets its own centroid: the hottest cell
    # shrinks in absolute size (imbalance is mean-relative, so with
    # MORE cells it is not comparable across codebook sizes)
    assert out["occupancy"]["max"] < before["max"]
    assert out["codebook"] != __import__(
        "updater_spark.operators.similarity", fromlist=["codebook_id"]
    ).codebook_id(bad)

    # retrained state ≡ a fresh one-shot with the same trained codebook
    q = df.filter("vec_id % 40 = 0")
    cents = idx.centroids()
    assert _sorted(idx.search(q, k=3, nprobe=len(cents))) == _sorted(
        ivf_topk(df, q, cents, k=3, nprobe=len(cents))
    )


def test_ivf_maybe_retrain_no_trip_is_noop(spark, drift_corpus, tmp_store):
    df, base = drift_corpus
    bad = [
        [float(x) for x in base[0]],
        [float(2.0 * x) for x in base[0]],
    ]
    idx = IvfIndex(tmp_store, "calm")
    idx.bootstrap(df, bad)
    cb = idx.codebook()
    out = idx.maybe_retrain(max_imbalance=1e9)
    assert out == {"retrained": False, "occupancy": out["occupancy"]}
    assert idx.codebook() == cb


def test_ivfpq_retrain_requires_corpus(spark, drift_corpus, tmp_store):
    df, base = drift_corpus
    cents = ivf_train(df, k=4, iterations=1)
    books = pq_train(df, cents, m_sub=4, k_codewords=4, iterations=1)
    idx = IvfPqIndex(tmp_store, "pq_codes_only")
    idx.bootstrap(df, cents, books)
    with pytest.raises(ValueError, match="codes only"):
        idx.retrain(None)


def test_ivfpq_retrain_matches_fresh_bootstrap(
    spark, drift_corpus, tmp_store
):
    """retrain(corpus) must land on EXACTLY the state a fresh index
    bootstrapped with identically-trained quantizers would hold —
    same identity, same search results."""
    df, base = drift_corpus
    old_cents = [
        [float(x) for x in base[0]],
        [float(2.0 * x) for x in base[0]],
    ]
    old_books = pq_train(df, old_cents, m_sub=4, k_codewords=4, iterations=1)
    idx = IvfPqIndex(tmp_store, "pq_live")
    idx.bootstrap(df.filter("vec_id < 120"), old_cents, old_books)
    idx.upsert(df.filter("vec_id >= 1000"))

    out = idx.maybe_retrain(
        df, max_imbalance=1.5, k=4, iterations=2, pq_iterations=2
    )
    assert out["retrained"] is True

    fresh = IvfPqIndex(tmp_store, "pq_fresh")
    cents = ivf_train(df, k=4, iterations=2)
    books = pq_train(df, cents, m_sub=4, k_codewords=4, iterations=2)
    fresh.bootstrap(df, cents, books)
    assert idx.identity() == fresh.identity()
    q = df.filter("vec_id % 40 = 0")
    assert _sorted(idx.search(q, k=3, nprobe=4)) == _sorted(
        fresh.search(q, k=3, nprobe=4)
    )


def test_semantic_retrain_replaces_pair_feed(spark, drift_corpus, tmp_store):
    """After drift + retrain, the returned pair feed equals the
    one-shot pair set a fresh bootstrap with the same trained codebook
    emits — the REPLACE contract (old accumulated pairs are void once
    cell boundaries move)."""
    df, base = drift_corpus
    # NB: SemanticIndex normalizes centroids, so parallel SCALINGS
    # collapse into identical unit vectors (everything ties into cell
    # 0) — the degenerate pair here is (v0, -v0): assignment by dot
    # sign, hot fan on the positive side
    bad = [
        [float(x) for x in base[0]],
        [float(-x) for x in base[0]],
    ]
    sem = SemanticIndex(tmp_store, "sem_live", threshold=0.9)
    sem.bootstrap(df.filter("vec_id < 120"), bad)
    sem.update(df.filter("vec_id >= 1000")).count()

    out = sem.maybe_retrain(max_imbalance=1.5, k=4, iterations=2)
    assert out["retrained"] is True
    got = out["pairs"].localCheckpoint(eager=True)

    # bootstrap unit-normalizes its corpus itself, so the fresh twin
    # takes the RAW vectors + the retrained centroids
    fresh = SemanticIndex(tmp_store, "sem_fresh", threshold=0.9)
    want = fresh.bootstrap(df, sem.centroids())
    assert _sorted(got) == _sorted(want)
    assert out["occupancy"]["max"] < out["occupancy_before"]["max"]
