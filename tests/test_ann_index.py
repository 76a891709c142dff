"""IvfIndex: persistent incrementally-maintained IVF index. The
invariant under test everywhere: after any sequence of
bootstrap/upsert/remove, search results EQUAL a fresh one-shot
ivf_topk over the current corpus with the same codebook."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updater_spark.operators.ann_index import IvfIndex
from updater_spark.operators.similarity import ivf_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(120, 16).astype(np.float64)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in vecs[i]])
        for i in range(120)
    ]
    return spark.createDataFrame(rows), vecs


def _cents(vecs, idxs):
    return [[float(x) for x in vecs[i]] for i in idxs]


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_bootstrap_search_matches_oneshot(spark, corpus, tmp_store):
    df, vecs = corpus
    cents = _cents(vecs, range(0, 40, 5))
    idx = IvfIndex(tmp_store, "emb")
    idx.bootstrap(df, cents)
    q = df.filter("vec_id % 20 = 0")
    assert _sorted(idx.search(q, k=3, nprobe=3)) == _sorted(
        ivf_topk(df, q, cents, k=3, nprobe=3)
    )
    assert idx.codebook() == __import__(
        "updater_spark.operators.similarity", fromlist=["codebook_id"]
    ).codebook_id(cents)


def test_upsert_migrating_vector_leaves_old_cell(spark, corpus, tmp_store):
    """An updated vector that lands in a DIFFERENT cell must vanish
    from its old cell — otherwise searches probing the old cell return
    a stale copy."""
    df, vecs = corpus
    cents = _cents(vecs, range(0, 40, 5))
    idx = IvfIndex(tmp_store, "emb_mig")
    idx.bootstrap(df, cents)

    # replace vec 7 with (a perturbation of) vec 33's vector — it
    # almost surely moves cells; also add a brand-new vec 500
    moved = [float(x) + 0.01 for x in vecs[33]]
    delta = spark.createDataFrame(
        [Row(vec_id=7, embedding=moved), Row(vec_id=500, embedding=moved)]
    )
    idx.upsert(delta)

    current = df.filter("vec_id <> 7").unionByName(delta)
    stored = tmp_store.read_partitioned("emb_mig__cells")
    # no duplicate ids anywhere (stale copy gone), corpus size right
    assert stored.groupBy("vec_id").count().filter("count > 1").count() == 0
    assert stored.count() == current.count()

    q = df.filter("vec_id % 20 = 0")
    assert _sorted(idx.search(q, k=3, nprobe=3)) == _sorted(
        ivf_topk(current, q, cents, k=3, nprobe=3)
    )


def test_remove_and_emptied_cell_dropped(spark, corpus, tmp_store):
    df, vecs = corpus
    cents = _cents(vecs, range(0, 40, 5))
    idx = IvfIndex(tmp_store, "emb_rm")
    # tiny corpus: one cell likely holds exactly one vector
    small = df.filter("vec_id < 10")
    idx.bootstrap(small, cents)
    stored = tmp_store.read_partitioned("emb_rm__cells")
    one_cell = (
        stored.groupBy("bucket").count().filter("count = 1").head()
    )
    # materialize: a lazy plan over the pre-remove index would re-scan
    # files the remove deletes
    victim_ids = [
        r["vec_id"]
        for r in stored.filter(F.col("bucket") == one_cell["bucket"])
        .select("vec_id")
        .collect()
    ]
    victims = spark.createDataFrame(
        [Row(vec_id=v) for v in victim_ids]
    )
    idx.remove(victims)
    after = tmp_store.read_partitioned("emb_rm__cells")
    assert after.filter(F.col("bucket") == one_cell["bucket"]).count() == 0
    assert after.count() == 10 - 1
    # search parity vs one-shot over the shrunken corpus
    current = small.join(victims, "vec_id", "anti")
    q = small.limit(3)
    assert _sorted(idx.search(q, k=2, nprobe=4)) == _sorted(
        ivf_topk(current, q, cents, k=2, nprobe=4)
    )
