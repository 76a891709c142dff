"""PageRank: the Spark loop must match a pure-Python evaluation of
the same recurrence exactly (modulo end-rounding), including dangling
mass, duplicate-edge collapse, and self-loops."""

import pytest
from pyspark.sql import Row

from updater_spark.operators.graph import degree_stats, pagerank


def _py_pagerank(edge_set, iterations=5, d=0.85):
    nodes = sorted({u for u, _ in edge_set} | {v for _, v in edge_set})
    n = len(nodes)
    outdeg = {}
    for u, _ in edge_set:
        outdeg[u] = outdeg.get(u, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dangling = sum(p for v, p in pr.items() if v not in outdeg)
        contrib = {v: 0.0 for v in nodes}
        for u, v in edge_set:
            contrib[v] += pr[u] / outdeg[u]
        pr = {
            v: (1 - d) / n + d * (contrib[v] + dangling / n)
            for v in nodes
        }
    return pr


EDGES = [
    (1, 2), (2, 3), (3, 1),          # a cycle
    (1, 3), (4, 1),                  # extra links
    (5, 5),                          # self-loop
    (3, 6),                          # 6 is dangling (no out-edges)
    (4, 1),                          # duplicate edge (collapses)
    (7, 2), (7, 3), (7, 6),
]


def test_pagerank_matches_reference_recurrence(spark):
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in EDGES])
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=5).collect()}
    want = _py_pagerank(set(EDGES), iterations=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == round(want[v], 6), (v, got[v], want[v])
    # probability mass is conserved (within end-rounding)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_dangling_mass_redistributes(spark):
    # star into a sink: without dangling redistribution the sink's
    # mass would leak out of the system each round
    edges = [(i, 99) for i in range(1, 6)]
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=3).collect()}
    want = _py_pagerank(set(edges), iterations=3)
    for v in want:
        assert got[v] == round(want[v], 6)
    assert got[99] > got[1]


def test_pagerank_single_iteration_and_validation(spark):
    df = spark.createDataFrame([Row(src=1, dst=2)])
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=1).collect()}
    want = _py_pagerank({(1, 2)}, iterations=1)
    assert got == {v: round(p, 6) for v, p in want.items()}
    with pytest.raises(ValueError, match="iterations"):
        pagerank(df, iterations=0)


def test_degree_stats(spark):
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in EDGES])
    got = {
        r["node"]: (r["out_deg"], r["in_deg"])
        for r in degree_stats(df).collect()
    }
    assert got[6] == (0, 2)   # dangling, two in-links
    assert got[7] == (3, 0)   # pure source
    assert got[5] == (1, 1)   # self-loop counts both ways
    assert got[1] == (2, 2)   # duplicate (4,1) collapsed


def _py_ppr(edge_set, seeds, iterations=5, d=0.85):
    nodes = sorted({u for u, _ in edge_set} | {v for _, v in edge_set})
    seeds = [v for v in nodes if v in seeds]
    base = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    outdeg = {}
    for u, _ in edge_set:
        outdeg[u] = outdeg.get(u, 0) + 1
    pr = dict(base)
    for _ in range(iterations):
        dangling = sum(p for v, p in pr.items() if v not in outdeg)
        contrib = {v: 0.0 for v in nodes}
        for u, v in edge_set:
            contrib[v] += pr[u] / outdeg[u]
        pr = {
            v: (1 - d) * base[v] + d * (contrib[v] + dangling * base[v])
            for v in nodes
        }
    return pr


def test_personalized_pagerank_matches_reference(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in EDGES])
    seeds = spark.createDataFrame([Row(id=1), Row(id=7), Row(id=999)])
    got = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=4, seeds=seeds).collect()
    }
    want = _py_ppr(set(EDGES), {1, 7}, iterations=4)  # 999 not in graph
    assert set(got) == set(want)
    for v in want:
        assert got[v] == round(want[v], 6), (v, got[v], want[v])
    # rank concentrates near the seeds: their out-neighborhood beats
    # nodes unreachable from any seed
    assert got[2] > 0 and got[3] > 0   # reached from seeds 1 and 7
    assert got[5] == 0.0               # self-loop island, unreachable
    # mass conserved
    assert abs(sum(got.values()) - 1.0) < 1e-4

    # guards
    import pytest

    with pytest.raises(ValueError, match="single-column"):
        pagerank(df, seeds=seeds.select(F.lit(1).alias("a"), "id"))
    with pytest.raises(ValueError, match="no seed id"):
        pagerank(df, seeds=spark.createDataFrame([Row(id=12345)]))


def test_personalized_uniform_seed_set_equals_classic(spark):
    """Seeding with ALL nodes reproduces classic PageRank exactly —
    the base-distribution generalization is conservative."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in EDGES])
    all_nodes = df.select(F.col("src").alias("id")).union(
        df.select(F.col("dst"))
    ).distinct()
    classic = {r["node"]: r["pr"] for r in pagerank(df, iterations=3).collect()}
    seeded = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=3, seeds=all_nodes).collect()
    }
    assert classic == seeded


def _py_lpa(edge_set, iterations):
    sym = set()
    for u, v in edge_set:
        if u != v:
            sym.add((u, v))
            sym.add((v, u))
    nodes = sorted({a for a, _ in sym})
    lab = {v: v for v in nodes}
    for _ in range(iterations):
        new = {}
        for v in nodes:
            counts = {}
            for a, b in sym:
                if a == v:
                    counts[lab[b]] = counts.get(lab[b], 0) + 1
            new[v] = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    return lab


def test_label_propagation_matches_reference(spark):
    from updater_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge: ONE connected
    # component, but LPA keeps the dense sides apart
    edges = [
        (1, 2), (2, 3), (1, 3),
        (10, 11), (11, 12), (10, 12),
        (3, 10),            # the bridge
        (5, 5),             # self-loop-only node: absent from output
    ]
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])
    for it in (1, 3, 5):
        got = {
            r["node"]: r["label"]
            for r in label_propagation(df, iterations=it).collect()
        }
        assert got == _py_lpa(set(edges), it), it
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, iterations=5).collect()
    }
    # dense sides stay separate communities despite the bridge
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]
    assert 5 not in got

    import pytest

    with pytest.raises(ValueError, match="iterations"):
        label_propagation(df, iterations=0)


def _py_triangles(edge_list):
    und = set()
    for u, v in edge_list:
        if u != v:
            und.add((min(u, v), max(u, v)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {v: 0 for v in adj}
    for a, b in und:
        for c in adj[a] & adj[b]:
            counts[c] += 1
    # every triangle was credited once per edge to its third vertex
    # -> each vertex of each triangle credited exactly once... no:
    # triangle (x,y,z) has 3 edges; the edge (x,y) credits z, (x,z)
    # credits y, (y,z) credits x -> each vertex exactly once. Correct.
    return counts


def test_triangle_count_matches_reference(spark):
    from updater_spark.operators.graph import triangle_count

    edges = [
        (1, 2), (2, 3), (3, 1),          # a triangle
        (3, 4), (4, 5), (5, 3),          # second triangle sharing node 3
        (2, 1),                          # reverse duplicate (collapses)
        (6, 6),                          # self-loop: dropped entirely
        (5, 6), (6, 7),                  # a path: no triangles
        (1, 4),                          # closes (1,3,4)
    ]
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(df).collect()
    }
    want = _py_triangles(edges)
    assert got == want
    # sanity on the known structure
    assert got[3] == 3 and got[7] == 0
    # global triangle count: per-node credits sum to 3x the triangles
    assert sum(got.values()) % 3 == 0


def test_triangle_count_clique_and_hub(spark):
    from updater_spark.operators.graph import triangle_count

    # K5 (every node in C(4,2)=6 triangles) plus a hub star that adds
    # NO triangles but gives the hub the highest degree — exercises
    # the degree orientation around a hub
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(100, k) for k in range(200, 230)]
    df = spark.createDataFrame([Row(src=u, dst=v) for u, v in edges])
    got = {
        r["node"]: r["triangles"]
        for r in triangle_count(df).collect()
    }
    want = _py_triangles(edges)
    assert got == want
    assert all(got[i] == 6 for i in range(5))
    assert got[100] == 0 and got[200] == 0
