"""Connected components + cluster resolution vs a Python union-find
oracle."""

import random

import pytest
from pyspark.sql import Row

from updater_spark.operators.clusters import (
    connected_components,
    resolve_clusters,
)


def _uf_oracle(edges, vertices=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    for v in vertices or ():
        find(v)
    # min-id canonical label per component
    comp_min = {}
    for v in parent:
        comp_min.setdefault(find(v), set()).add(v)
    out = {}
    for root, members in comp_min.items():
        label = min(members)
        for v in members:
            out[v] = label
    return out


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in edges]
    )


def test_chain_requires_transitivity(spark):
    # 1-2-3-4 chain + isolated pair: labels must propagate across hops
    edges = [(2, 1), (2, 3), (4, 3), (10, 11)]
    got = {
        r["id"]: r["component"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_random_graph_vs_union_find(spark):
    rng = random.Random(13)
    verts = list(range(100))
    edges = [
        (rng.choice(verts), rng.choice(verts)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = {
        r["id"]: r["component"]
        for r in connected_components(_pairs_df(spark, edges)).collect()
    }
    want = _uf_oracle(edges)
    assert got == want


def test_max_iter_raises(spark):
    # a 6-vertex path needs ~5 hash-min rounds worst case; 1 round
    # cannot close it
    edges = [(i + 1, i) for i in range(1, 6)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs_df(spark, edges), max_iter=1)


def test_resolve_clusters_keepers_and_singletons(spark):
    docs = spark.createDataFrame([Row(doc_id=i) for i in [1, 2, 3, 7, 9]])
    pairs = _pairs_df(spark, [(1, 2), (2, 3)])
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in resolve_clusters(docs, pairs, "doc_id").collect()
    }
    assert got == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        7: (7, True),  # singleton: own cluster, kept
        9: (9, True),
    }
    # the keeper set IS the deduplicated corpus: one doc per cluster
    keepers = [d for d, (_, k) in got.items() if k]
    assert sorted(keepers) == [1, 7, 9]


def test_resolve_clusters_best_argmax_and_ties(spark):
    from updater_spark.operators.clusters import resolve_clusters_best

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, q=0.2),   # cluster {1,2,3}: 2 has max score
            Row(doc_id=2, q=0.9),
            Row(doc_id=3, q=0.9),   # tie with 2 → min id 2 wins
            Row(doc_id=7, q=None),  # singleton with NULL score: kept
            Row(doc_id=8, q=None),  # cluster {8,9}: NULL loses to 0.1
            Row(doc_id=9, q=0.1),
        ],
        "doc_id long, q double",
    )
    pairs = _pairs_df(spark, [(1, 2), (2, 3), (8, 9)])
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_keeper"])
        for r in resolve_clusters_best(docs, pairs, "doc_id", "q").collect()
    }
    assert got == {
        1: (1, False),
        2: (1, True),
        3: (1, False),
        7: (7, True),
        8: (8, False),
        9: (8, True),
    }
    # exactly one keeper per cluster, always
    from collections import Counter

    per_cluster = Counter(c for c, k in got.values() if k)
    clusters = {c for c, _ in got.values()}
    assert per_cluster == {c: 1 for c in clusters}


def test_resolve_clusters_best_all_null_falls_back_to_min_id(spark):
    from updater_spark.operators.clusters import resolve_clusters_best

    docs = spark.createDataFrame(
        [Row(doc_id=4, q=None), Row(doc_id=5, q=None)],
        "doc_id long, q double",
    )
    pairs = _pairs_df(spark, [(4, 5)])
    got = {
        r["doc_id"]: r["is_keeper"]
        for r in resolve_clusters_best(docs, pairs, "doc_id", "q").collect()
    }
    assert got == {4: True, 5: False}


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    """Near-dup pairs must land in the SAME split — the property a
    per-doc split violates (train/test contamination via near-copies)."""
    from pyspark.sql import functions as F

    from updater_spark.operators.clusters import resolve_clusters
    from updater_spark.operators.dedup import ngram_jaccard_pairs
    from updater_spark.operators.packing import dataset_split

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 5 == 0)
    )
    copies = docs.withColumn("doc_id", F.col("doc_id") + 100_000).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zz yy"))
    )
    corpus = docs.unionByName(copies)
    pairs = ngram_jaccard_pairs(corpus, "doc_id", "text", n=3, threshold=0.5)
    split = dataset_split(
        resolve_clusters(corpus, pairs, "doc_id"),
        id_col="cluster_id",
        salt="split-v1",
    )
    # every pair's two sides share a split
    s = split.select("doc_id", "split")
    straddling = (
        pairs.join(s.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("split", "split_a")
        .join(s.withColumnRenamed("doc_id", "id_b"), "id_b")
        .filter(F.col("split_a") != F.col("split"))
        .count()
    )
    assert straddling == 0
    assert pairs.count() > 0  # scenario non-trivial
    # and the split is non-degenerate (more than one label used)
    assert split.select("split").distinct().count() >= 2
