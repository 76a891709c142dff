"""Similarity search: exact top-k vs numpy oracle; LSH recall."""

import numpy as np
import pytest
from pyspark.sql import Row

from updater_spark.operators.similarity import cosine_topk, lsh_topk


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(80, 16).astype(np.float32)
    # make ids 0 and 1 near-duplicates
    vecs[1] = vecs[0] + rng.randn(16).astype(np.float32) * 0.01
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in vecs[i]]) for i in range(80)
    ]
    return spark.createDataFrame(rows), vecs


def np_topk(vecs, qids, k=5):
    out = {}
    norms = np.linalg.norm(vecs, axis=1)
    for q in qids:
        sims = vecs @ vecs[q] / (norms * norms[q])
        order = sorted(
            (i for i in range(len(vecs)) if i != q),
            key=lambda i: (-round(float(sims[i]), 4), i),
        )
        out[q] = order[:k]
    return out


def test_cosine_topk_matches_numpy(spark, emb_df):
    df, vecs = emb_df
    qids = [0, 10, 20]
    queries = df.filter(df.vec_id.isin(qids))
    got = cosine_topk(df, queries, k=5).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert by_q == np_topk(vecs, qids, k=5)


def test_topk_finds_planted_neighbor(spark, emb_df):
    df, _ = emb_df
    queries = df.filter(df.vec_id == 0)
    top = cosine_topk(df, queries, k=1).collect()[0]
    assert top["neighbor_id"] == 1 and top["sim"] > 0.99


def test_arrow_topk_matches_catalyst(spark, emb_df):
    from updater_spark.operators.similarity import cosine_topk_arrow

    df, _ = emb_df
    qids = [0, 8, 40]
    queries = df.filter(df.vec_id.isin(qids))
    cat = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk(df, queries, k=4).collect()
    }
    arr = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in cosine_topk_arrow(df, queries, k=4).collect()
    }
    assert cat == arr


def test_ivf_beats_random_and_finds_planted(spark, emb_df):
    from updater_spark.operators.similarity import ivf_topk, ivf_train

    df, vecs = emb_df
    centroids = ivf_train(df, k=8, iterations=3)
    assert len(centroids) == 8 and all(len(c) == 16 for c in centroids)
    # training is deterministic
    again = ivf_train(df, k=8, iterations=3)
    assert centroids == again

    qids = list(range(0, 80, 8))
    queries = df.filter(df.vec_id.isin(qids))
    approx = {}
    for r in ivf_topk(df, queries, centroids, k=3, nprobe=3).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert 1 in approx.get(0, set())  # planted near-dup shares the bucket
    exact = np_topk(vecs, qids, k=3)
    recalls = [
        len(set(exact[q][:3]) & approx.get(q, set())) / 3 for q in qids
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # nprobe 3/8 ⇒ high recall


def test_lsh_recall_reasonable(spark, emb_df):
    df, vecs = emb_df
    qids = list(range(0, 80, 8))
    queries = df.filter(df.vec_id.isin(qids))
    exact = np_topk(vecs, qids, k=3)
    approx = {}
    for r in lsh_topk(df, queries, k=3, bits=3, dim=16).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # planted near-dup must land in the same bucket — the property LSH
    # actually guarantees (random-vector recall is noise at this size)
    assert 1 in approx.get(0, set())
    recalls = [
        len(set(exact[q][:3]) & approx[q]) / 3 for q in qids if q in approx
    ]
    assert recalls and sum(recalls) / len(recalls) >= 0.15


def test_ivf_kmeans_parallel_init(spark, emb_df):
    """k-means|| init: deterministic, k centers, and recall at least as
    good as the lowest-id init on the planted corpus (measured +5pp at
    sf0.1, nprobe=4)."""
    from updater_spark.operators.similarity import ivf_topk, ivf_train

    df, vecs = emb_df
    c1 = ivf_train(df, k=8, iterations=3, init="kmeans_parallel")
    c2 = ivf_train(df, k=8, iterations=3, init="kmeans_parallel")
    assert c1 == c2
    assert len(c1) == 8 and all(len(c) == 16 for c in c1)

    qids = list(range(0, 80, 8))
    queries = df.filter(df.vec_id.isin(qids))
    exact = np_topk(vecs, qids, k=3)
    approx = {}
    for r in ivf_topk(df, queries, c1, k=3, nprobe=3).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(set(exact[q][:3]) & approx.get(q, set())) / 3 for q in qids
    ]
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivf_assign_bucket_col_parity(spark, emb_df, tmp_path):
    """Searching a materialized (parquet round-tripped) IVF index must
    return exactly what per-batch assignment returns."""
    from updater_spark.operators.similarity import ivf_assign, ivf_topk

    df, vecs = emb_df
    cents = [[float(x) for x in vecs[i]] for i in range(0, 32, 4)]  # 8 cells
    queries = df.filter("vec_id % 10 = 0")

    direct = ivf_topk(df, queries, cents, k=3, nprobe=3)
    idx = ivf_assign(df, cents)
    path = str(tmp_path / "ivf_index")
    idx.write.parquet(path)
    stored = spark.read.parquet(path)
    via_index = ivf_topk(
        stored, queries, cents, k=3, nprobe=3, bucket_col="bucket"
    )

    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    a = sorted(direct.collect(), key=key)
    b = sorted(via_index.collect(), key=key)
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) > 0


def test_ivf_stale_index_rejected(spark, emb_df, tmp_path):
    """Bucket column built from one codebook + search with another =
    hard error, not silent recall loss (metadata survives a FLAT
    parquet write)."""
    from updater_spark.operators.similarity import ivf_assign, ivf_topk

    df, vecs = emb_df
    cents_a = [[float(x) for x in vecs[i]] for i in range(0, 16, 2)]
    cents_b = [[float(x) for x in vecs[i]] for i in range(1, 17, 2)]
    path = str(tmp_path / "stale_index")
    ivf_assign(df, cents_a).write.parquet(path)
    stored = spark.read.parquet(path)
    with pytest.raises(ValueError, match="stale IVF index"):
        ivf_topk(stored, df.limit(3), cents_b, k=3, bucket_col="bucket")


def test_ivf_stale_partitioned_index_rejected(spark, emb_df, tmp_path):
    """The PARTITIONED layout drops column metadata on read, which
    used to silently disarm the staleness guard. With the sidecar
    (write_ivf_index/read_ivf_index) the stale search still raises;
    and a metadata-free partitioned read refuses to run at all rather
    than degrade recall silently."""
    from updater_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )

    df, vecs = emb_df
    cents_a = [[float(x) for x in vecs[i]] for i in range(0, 16, 2)]
    cents_b = [[float(x) for x in vecs[i]] for i in range(1, 17, 2)]
    path = str(tmp_path / "stale_part_index")
    write_ivf_index(ivf_assign(df, cents_a), path)

    stored = read_ivf_index(spark, path)
    with pytest.raises(ValueError, match="stale IVF index"):
        ivf_topk(stored, df.limit(3), cents_b, k=3, bucket_col="bucket")

    # the raw partitioned read has no identity: unverifiable, not quiet
    bare = spark.read.parquet(path)
    assert ({} == (bare.schema["bucket"].metadata or {}))
    with pytest.raises(ValueError, match="unverifiable IVF index"):
        ivf_topk(bare, df.limit(3), cents_a, k=3, bucket_col="bucket")

    # explicit opt-out still works (caller owns the risk)
    out = ivf_topk(
        bare, df.limit(3), cents_a, k=3, bucket_col="bucket",
        allow_unverified=True,
    )
    assert out.count() > 0

    # matching search through the sidecar path returns results
    ok = ivf_topk(stored, df.limit(3), cents_a, k=3, bucket_col="bucket")
    assert ok.count() > 0


def test_write_ivf_index_requires_identity(spark, emb_df, tmp_path):
    """write_ivf_index refuses a bucket column that did not come from
    ivf_assign (no identity to persist)."""
    from pyspark.sql import functions as F

    from updater_spark.operators.similarity import write_ivf_index

    df, _ = emb_df
    fake = df.withColumn("bucket", F.col("vec_id") % 4)
    with pytest.raises(ValueError, match="no codebook identity"):
        write_ivf_index(fake, str(tmp_path / "noid"))


def test_null_buckets_skipped(spark, emb_df):
    """Rows with NULL bucket (never indexed) are excluded from the
    search instead of crashing the Arrow stage with NaN casts."""
    from pyspark.sql import functions as F

    from updater_spark.operators.similarity import ivf_assign, ivf_topk

    df, vecs = emb_df
    cents = [[float(x) for x in vecs[i]] for i in range(0, 16, 2)]
    from updater_spark.operators.similarity import codebook_id

    idx = ivf_assign(df, cents).withColumn(
        "bucket",
        F.when(F.col("vec_id") >= 40, F.col("bucket")),  # nulls below 40
    ).withMetadata("bucket", {"codebook": codebook_id(cents)})
    out = ivf_topk(idx, df.filter("vec_id % 10 = 0"), cents, k=3,
                   bucket_col="bucket")
    neighbors = {r["neighbor_id"] for r in out.collect()}
    assert neighbors and all(n >= 40 for n in neighbors)


def test_query_side_bound_fails_fast(spark, emb_df):
    from updater_spark.operators.similarity import _collect_unit_queries

    df, _ = emb_df
    with pytest.raises(ValueError, match="max_rows"):
        _collect_unit_queries(df, "vec_id", "embedding", max_rows=10)


def test_indexed_search_prunes_partitions(spark, emb_df, tmp_path):
    """A bucket-partitioned index must be read with partition pruning:
    the probe filter reaches the parquet scan as a PartitionFilter, so
    only probed cells' files are opened. Uses the sidecar-carrying
    write/read pair, which is the supported partitioned layout."""
    from updater_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        read_ivf_index,
        write_ivf_index,
    )

    df, vecs = emb_df
    cents = [[float(x) for x in vecs[i]] for i in range(0, 32, 4)]
    path = str(tmp_path / "pruned_index")
    write_ivf_index(ivf_assign(df, cents), path)
    stored = read_ivf_index(spark, path)
    out = ivf_topk(
        stored, df.filter("vec_id % 10 = 0"), cents, k=3, nprobe=2,
        bucket_col="bucket",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the pushed filter is on the bucket partition column, and it is
    # NOT the empty list a full scan would show
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "bucket" in m.group(1)
    assert out.count() > 0


def test_multiprobe_lsh_recall_dominates_single_probe(spark, emb_df):
    """Multi-probe must be a superset-quality search: recall vs the
    exact baseline never decreases, and every planted near-identical
    pair is found at multiprobe=1."""
    from updater_spark.operators.similarity import cosine_topk, lsh_topk

    df, vecs = emb_df
    q = df.filter("vec_id % 7 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(df, q, k=3).collect()
    }

    def recall(mp):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_topk(
                df, q, k=3, bits=6, dim=16, multiprobe=mp
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0
    # planted near-dup (vec 0 ↔ 1): one borderline hyperplane bit must
    # not hide it once we probe Hamming-1 buckets
    got1 = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(df, q, k=3, bits=6, dim=16, multiprobe=1).collect()
    }
    assert (0, 1) in got1


def test_pq_assign_matches_numpy(spark, emb_df):
    """Per-subspace argmin + reconstruction error vs a numpy oracle;
    codeword vectors must code to themselves with zero error."""
    import numpy as np

    from updater_spark.operators.similarity import pq_assign

    df, vecs = emb_df
    dim = len(vecs[0])
    m_sub = 4
    sub = dim // m_sub
    cw_ids = list(range(0, 16))
    codebooks = [
        [[float(x) for x in vecs[j][m * sub : (m + 1) * sub]] for j in cw_ids]
        for m in range(m_sub)
    ]
    out = {r["vec_id"]: r for r in pq_assign(df, codebooks).collect()}

    cb = np.array(codebooks)  # (m, k, sub)
    for vid in range(20):
        v = np.asarray(vecs[vid], dtype=np.float64)
        want_codes, want_err = [], 0.0
        for m in range(m_sub):
            d = np.linalg.norm(cb[m] - v[m * sub : (m + 1) * sub], axis=1)
            want_codes.append(int(np.argmin(d)))
            want_err += float(d.min())
        got = out[vid]
        assert list(got["codes"]) == want_codes, vid
        assert abs(got["recon_err"] - round(want_err, 6)) < 1e-4
    # self-coding: the codeword-source vectors reconstruct exactly
    for j in cw_ids:
        assert list(out[j]["codes"]) == [j] * m_sub
        assert out[j]["recon_err"] == 0.0


def test_pq_topk_adc(spark):
    """ADC distances must equal the hand-computed table lookups; ranks
    order by (rounded dist, neighbor id); self-matches excluded and
    query_id is BIGINT (engine-stable schema)."""
    from updater_spark.operators.similarity import pq_assign, pq_topk

    # 4-dim vectors, 2 subspaces of 2 dims, 2 codewords each
    codebooks = [
        [[0.0, 0.0], [1.0, 1.0]],
        [[0.0, 1.0], [1.0, 0.0]],
    ]
    vecs = [
        (1, [0.1, 0.0, 0.0, 0.9]),   # codes (0, 0)
        (2, [0.9, 1.0, 1.0, 0.1]),   # codes (1, 1)
        (3, [0.0, 0.1, 0.9, 0.0]),   # codes (0, 1)
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs],
        "vec_id long, embedding array<double>",
    )
    codes = pq_assign(df, codebooks).select("vec_id", "codes")
    got_codes = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert got_codes == {1: [0, 0], 2: [1, 1], 3: [0, 1]}

    q = (7, [0.0, 0.0, 0.0, 1.0])  # table: sub0 {c0:0, c1:2}, sub1 {c0:0, c1:2}
    out = pq_topk(codes, codebooks, [q], k=3)
    assert dict(out.dtypes)["query_id"] == "bigint"
    rows = {r["neighbor_id"]: (r["dist"], r["rank"]) for r in out.collect()}
    assert rows[1] == (0.0, 1)   # codes (0,0) -> 0 + 0
    assert rows[3] == (2.0, 2)   # codes (0,1) -> 0 + 2
    assert rows[2] == (4.0, 3)   # codes (1,1) -> 2 + 2


def test_pq_topk_tie_and_self_exclusion(spark):
    from updater_spark.operators.similarity import pq_assign, pq_topk

    codebooks = [[[0.0], [1.0]], [[0.0], [1.0]]]
    # ids 5 and 9 quantize identically -> tied dist, rank by id
    df = spark.createDataFrame(
        [(9, [0.0, 0.0]), (5, [0.1, 0.1]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    codes = pq_assign(df, codebooks).select("vec_id", "codes")
    out = pq_topk(codes, codebooks, [(2, [1.0, 1.0])], k=5).collect()
    ranked = [(r["rank"], r["neighbor_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [(1, 5), (2, 9)]  # self (2) excluded, tie -> lower id first


def test_pq_topk_arrow_matches_literal_path(spark):
    """The Arrow-gather ADC scorer and the literal-table Catalyst one
    are the same function: identical (query, neighbor, dist, rank)
    sets on a corpus with planted structure."""
    from updater_spark.operators.similarity import (
        pq_assign,
        pq_topk,
        pq_topk_arrow,
    )

    codebooks = [
        [[0.0, 0.0], [1.0, 1.0], [0.5, -0.5]],
        [[0.0, 1.0], [1.0, 0.0], [-0.5, 0.5]],
    ]
    vecs = [
        (i, [((i * 7) % 5) / 4.0, ((i * 3) % 7) / 6.0,
             ((i * 11) % 3) / 2.0, ((i * 5) % 9) / 8.0])
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    ).repartition(4)
    codes = pq_assign(df, codebooks).select("vec_id", "codes")
    queries = [(i, v) for i, v in vecs if i % 13 == 1]
    qdf = spark.createDataFrame(
        [(i, v) for i, v in queries], "vec_id long, embedding array<double>"
    )
    lit_rows = sorted(
        tuple(r) for r in pq_topk(codes, codebooks, queries, k=4).collect()
    )
    arrow_rows = sorted(
        tuple(r)
        for r in pq_topk_arrow(codes, codebooks, qdf, k=4).collect()
    )
    assert lit_rows == arrow_rows
    assert len(lit_rows) == len(queries) * 4


def test_pq_assign_arrow_matches_catalyst(spark):
    """The numpy assign twin is bit-identical to the generated-SQL
    Catalyst path: same codes (ties to lowest codeword) and the same
    rounded recon_err, including an exact-tie codeword pair."""
    from updater_spark.operators.similarity import (
        pq_assign,
        pq_assign_arrow,
    )

    codebooks = [
        [[0.0, 0.5], [0.5, 0.0], [0.5, 0.0]],  # cw1 == cw2: tie -> 1
        [[1.0, 1.0], [0.25, 0.75], [0.0, 0.0]],
    ]
    vecs = [
        (i, [((i * 13) % 7) / 6.0, ((i * 5) % 4) / 3.0,
             ((i * 9) % 8) / 7.0, ((i * 3) % 5) / 4.0])
        for i in range(1, 101)
    ] + [(999, [0.5, 0.0, 0.1, 0.1])]  # exact tie in subspace 0
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    ).repartition(4)
    cat = {
        r["vec_id"]: (list(r["codes"]), r["recon_err"])
        for r in pq_assign(df, codebooks).collect()
    }
    arw = {
        r["vec_id"]: (list(r["codes"]), r["recon_err"])
        for r in pq_assign_arrow(df, codebooks).collect()
    }
    assert cat == arw
    assert arw[999][0][0] == 1  # tie resolved to the lower codeword


def test_semantic_dedup_chains_and_cells(spark):
    """Planted chain a-b-c (a~b, b~c, a!~c) must collapse into one
    group via connected components; an isolated vector keeps itself;
    items in different cells are never compared."""
    from updater_spark.operators.similarity import semantic_dedup

    # two well-separated directions as centroids
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    vecs = [
        # chain inside cell 0: consecutive cosines high, ends lower
        (1, [1.0, 0.00, 0.0, 0.0]),
        (2, [1.0, 0.25, 0.0, 0.0]),
        (3, [1.0, 0.52, 0.0, 0.0]),
        # isolated in cell 0 (cos to all others < .97 after rounding)
        (4, [0.3, -1.0, 0.0, 0.0]),
        # pair in cell 1 — must not see cell 0 despite high-ish dims
        (5, [0.0, 0.0, 0.1, 1.0]),
        (6, [0.0, 0.0, 0.12, 1.0]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    out = {
        r["id"]: (r["cell"], r["group"], r["keep"])
        for r in semantic_dedup(df, cents, threshold=0.97).collect()
    }
    assert out[1] == (0, 1, True)
    assert out[2] == (0, 1, False)   # chained through 2's neighbors
    assert out[3] == (0, 1, False)   # a!~c but linked via b
    assert out[4][1] == 4 and out[4][2] is True
    assert out[5] == (1, 5, True)
    assert out[6] == (1, 5, False)


def test_semantic_dedup_max_cell_guards_degenerate_codebook(spark):
    """A DEGENERATE codebook (every centroid in one direction) funnels
    the whole corpus into one cell — the O(|cell|^2) cliff max_cell
    exists for. With the cap engaged, the hot cell contributes no
    pairs (its members come out as singletons), while an under-cap
    cell still dedups; uncapped, the same corpus chains normally."""
    from updater_spark.operators.similarity import semantic_dedup

    # both centroids point the same way: cell 0 swallows everything
    # along +x (argmax ties resolve to the lowest cell)
    cents = [[1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
    hot = [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(1, 11)]
    # a genuinely different direction would still land in cell 0 here
    # (degenerate codebook!), so give the under-cap path its own run
    df = spark.createDataFrame(
        hot, "vec_id long, embedding array<double>"
    )
    capped = {
        r["id"]: (r["group"], r["keep"])
        for r in semantic_dedup(
            df, cents, threshold=0.99, max_cell=5
        ).collect()
    }
    # cap engaged: 10 > 5, so the hot cell forms NO pairs — all
    # singletons, everything kept
    assert all(capped[i] == (i, True) for i in range(1, 11))
    uncapped = {
        r["id"]: r["group"]
        for r in semantic_dedup(df, cents, threshold=0.99).collect()
    }
    assert uncapped[2] == 1  # same corpus chains without the cap
    # cap above the cell size: identical to uncapped (no silent cut)
    roomy = {
        r["id"]: r["group"]
        for r in semantic_dedup(
            df, cents, threshold=0.99, max_cell=10
        ).collect()
    }
    assert roomy == uncapped


def test_ivfpq_residual_codes_and_probe_pruning(spark):
    """Residual quantization discriminates within-cluster neighbors
    (raw PQ would give every member identical codes); a query only
    ever scores vectors from its nprobe nearest cells."""
    import numpy as np

    from updater_spark.operators.similarity import (
        ivfpq_assign,
        ivfpq_topk,
    )

    # two clusters on orthogonal axes; members differ in a residual dim
    def v(axis, eps):
        base = [0.0, 0.0, 0.0, 0.0]
        base[axis] = 1.0
        base[2] = eps
        n = float(np.linalg.norm(base))
        return [x / n for x in base]

    vecs = [
        (1, v(0, 0.00)), (2, v(0, 0.05)), (3, v(0, 0.30)),
        (11, v(3, 0.00)), (12, v(3, 0.05)), (13, v(3, 0.30)),
    ]
    cents = [v(0, 0.1), v(3, 0.1)]
    # residual codewords: small/large offsets in the residual dim
    codebooks = [
        [[0.0, 0.0], [0.0, 0.0]],
        [[-0.1, 0.0], [0.2, 0.0]],
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    idx = ivfpq_assign(df, cents, codebooks)
    got = {r["vec_id"]: (r["cell"], list(r["codes"])) for r in idx.collect()}
    assert {got[i][0] for i in (1, 2, 3)} == {0}
    assert {got[i][0] for i in (11, 12, 13)} == {1}
    # residual codes separate eps=0/0.05 (code 0) from eps=0.30 (code 1)
    assert got[1][1][1] == got[2][1][1] == 0
    assert got[3][1][1] == 1

    qdf = spark.createDataFrame([(1, v(0, 0.0))], "vec_id long, embedding array<double>")
    out = ivfpq_topk(idx, cents, codebooks, qdf, k=5, nprobe=1).collect()
    seen = {r["neighbor_id"] for r in out}
    assert seen <= {2, 3}  # own cell only, self excluded
    ranked = sorted((r["rank"], r["neighbor_id"]) for r in out)
    assert ranked[0][1] == 2  # same-code neighbor outranks far one


def test_refine_topk_restores_exact_ranking(spark):
    """Refining a shortlist yields exactly the brute-force ranking
    restricted to the shortlist; candidates outside it never appear."""
    from pyspark.sql import functions as F

    from updater_spark.operators.similarity import cosine_topk, refine_topk

    vecs = [
        (i, [1.0, i / 10.0, ((i * 3) % 5) / 5.0, 0.1])
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qdf = df.filter("vec_id = 1")
    exact = {
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in cosine_topk(df, qdf, k=3).collect()
    }
    # shortlist = the true top-3 plus noise candidates
    short = spark.createDataFrame(
        [(1, n) for n in [r[1] for r in exact] + [15, 19]],
        "query_id long, neighbor_id long",
    )
    refined = {
        (r["query_id"], r["neighbor_id"], r["sim"], r["rank"])
        for r in refine_topk(short, df, qdf, k=3).collect()
    }
    assert refined == exact
    # a shortlist MISSING a true neighbor can't invent it
    short2 = short.filter(F.col("neighbor_id") != sorted(exact)[0][1])
    got = {r["neighbor_id"] for r in refine_topk(short2, df, qdf, k=3).collect()}
    assert sorted(exact)[0][1] not in got


def test_ivfpq_index_roundtrip_staleness_and_pruning(spark, tmp_path):
    """Disk round-trip returns identical search results; a stale
    quantizer is rejected; the probe-set filter reaches the cell
    partition directories (PartitionFilters, not a post-scan
    Filter)."""
    from updater_spark.operators.similarity import (
        ivfpq_assign,
        ivfpq_topk,
        read_ivfpq_index,
        write_ivfpq_index,
    )

    def v(axis, eps):
        base = [0.0] * 4
        base[axis] = 1.0
        base[2] = eps
        n = float(np.linalg.norm(base))
        return [x / n for x in base]

    vecs = [(i, v(0, i / 100.0)) for i in range(1, 9)] + [
        (i, v(3, (i - 10) / 100.0)) for i in range(11, 19)
    ]
    cents = [v(0, 0.05), v(3, 0.05)]
    codebooks = [[[0.0, 0.0], [0.1, 0.0]], [[-0.05, 0.0], [0.05, 0.0]]]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    idx = ivfpq_assign(df, cents, codebooks)
    qdf = df.filter("vec_id = 1")
    mem = sorted(
        tuple(r)
        for r in ivfpq_topk(idx, cents, codebooks, qdf, k=3, nprobe=1).collect()
    )

    path = str(tmp_path / "index")
    write_ivfpq_index(idx, path, cents, codebooks)
    stored = read_ivfpq_index(spark, path)
    disk = sorted(
        tuple(r)
        for r in ivfpq_topk(
            stored, cents, codebooks, qdf, k=3, nprobe=1
        ).collect()
    )
    assert disk == mem and len(mem) == 3

    # stale quantizer (different codebooks) must be rejected
    other = [[[9.0, 9.0], [8.0, 8.0]], [[7.0, 7.0], [6.0, 6.0]]]
    with pytest.raises(ValueError, match="stale IVF-PQ index"):
        ivfpq_topk(stored, cents, other, qdf, k=3, nprobe=1)

    # probe-set filter reaches the partition directories
    plan = (
        ivfpq_topk(stored, cents, codebooks, qdf, k=3, nprobe=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "cell" in plan


def test_semantic_dedup_arrow_equals_catalyst(spark):
    """The deploy path (arrow=True: GEMM argmax assignment +
    block-chunked per-cell GEMM scoring) must produce EXACTLY the
    Catalyst path's output — same cells (argmax ties to the lowest
    cell), same rounded-then-thresholded pairs, same components —
    on the planted chain fixture, with and without max_cell. Also
    exercises the pair_block chunking boundary (cell larger than the
    block) via a monkeypatched tiny block."""
    from updater_spark.operators.similarity import semantic_dedup

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    vecs = [
        (1, [1.0, 0.00, 0.0, 0.0]),
        (2, [1.0, 0.25, 0.0, 0.0]),
        (3, [1.0, 0.52, 0.0, 0.0]),
        (4, [0.3, -1.0, 0.0, 0.0]),
        (5, [0.0, 0.0, 0.1, 1.0]),
        (6, [0.0, 0.0, 0.12, 1.0]),
        # tie case: equidistant from both centroids — must go to cell 0
        (7, [0.5, 0.0, 0.0, 0.5]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    def snap(out):
        return sorted(tuple(r) for r in out.collect())

    cat = snap(semantic_dedup(df, cents, threshold=0.97))
    arw = snap(semantic_dedup(df, cents, threshold=0.97, arrow=True))
    assert cat == arw
    assert any(r[0] == 7 and r[1] == 0 for r in cat)  # tie to low cell

    # max_cell engagement: degenerate codebook funnels all of +x into
    # cell 0; capped at 3 the hot cell contributes no pairs on BOTH
    # paths (members come out as singletons)
    deg = [[1.0, 0.0, 0.0, 0.0], [1.0, 0.0, 0.0, 0.0]]
    hot = spark.createDataFrame(
        [(i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(1, 9)],
        "vec_id long, embedding array<double>",
    )
    cat_cap = snap(semantic_dedup(hot, deg, threshold=0.99, max_cell=3))
    arw_cap = snap(
        semantic_dedup(hot, deg, threshold=0.99, max_cell=3, arrow=True)
    )
    assert cat_cap == arw_cap
    assert all(r[3] for r in arw_cap)  # all singletons: keep=true

    # chunking boundary: an 8-member chained cell scored with
    # pair_block=3 (smaller than the cell) must still find every pair
    cat_big = snap(semantic_dedup(hot, deg, threshold=0.99))
    arw_big = snap(
        semantic_dedup(hot, deg, threshold=0.99, arrow=True, pair_block=3)
    )
    assert cat_big == arw_big


def test_hard_negatives_excludes_same_label_and_self(spark):
    from updater_spark.operators.similarity import hard_negatives_arrow

    # two tight clusters; labels split WITHIN each cluster so the
    # nearest different-label vector is a same-cluster neighbor
    rows = []
    for i in range(8):
        base = [1.0, 0.0, 0.0] if i < 4 else [0.0, 1.0, 0.0]
        vec = [base[0] + i * 0.001, base[1], base[2] + i * 0.0001]
        rows.append((i, vec, i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives_arrow(df, df.filter("vec_id = 0"), k=3).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in out]
    ids = [n for n, _ in got]
    # all returned negatives have label 1 (query 0 has label 0)
    assert set(ids) <= {1, 3, 5, 7}
    assert 0 not in ids  # self never appears
    # the two same-cluster odd vectors outrank the far-cluster ones
    assert set(ids[:2]) == {1, 3}


def test_hard_negatives_exact_against_numpy(spark):
    import numpy as np

    from updater_spark.operators.similarity import hard_negatives_arrow

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8))
    rows = [
        (i, [float(x) for x in vecs[i]], int(i % 3)) for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).repartition(5)
    queries = df.filter("vec_id < 4")
    out = hard_negatives_arrow(df, queries, k=4).collect()
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ unit.T
    for q in range(4):
        cand = [
            (round(float(sims[q, j]), 4), j)
            for j in range(40)
            if j % 3 != q % 3
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        exp = [(j, s) for s, j in cand[:4]]
        got = sorted(
            [(r["neighbor_id"], r["sim"]) for r in out if r["query_id"] == q],
            key=lambda t: -t[1],
        )
        assert [j for j, _ in got] == [j for j, _ in exp]


def test_mmr_select_prefers_diversity(spark):
    from updater_spark.operators.similarity import mmr_select

    # query along x (NOT itself a candidate — if it were, every rel
    # would equal the sim to the first pick and all scores would tie
    # at 0); two near-duplicate high-rel vectors and one moderately
    # relevant diverse vector: plain top-2 takes the twins, MMR must
    # swap the second twin for the diverse vector
    rows = [
        (1, [0.99, 0.14, 0.0]),
        (2, [0.98, 0.17, 0.0]),   # near-dup of 1
        (3, [0.6, 0.0, 0.8]),     # diverse
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = mmr_select(df, [1.0, 0.0, 0.0], k=2, lam=0.5)
    picked = [r["vec_id"] for r in out.orderBy("rank").collect()]
    assert picked == [1, 3]


def test_mmr_select_python_oracle(spark):
    import numpy as np

    from updater_spark.operators.similarity import mmr_select

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in vecs[0]]
    out = mmr_select(df, q, k=6, lam=0.7)
    got = [(r["vec_id"], r["rank"]) for r in out.orderBy("rank").collect()]

    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = np.asarray(q) / np.linalg.norm(q)
    rel = np.round(unit @ qn, 4)
    taken, ms, exp = set(), np.zeros(30), []
    for rank in range(1, 7):
        best, best_key = None, None
        for i in range(30):
            if i in taken:
                continue
            key = (round(0.7 * rel[i] - (1.0 - 0.7) * ms[i], 4), -i)
            if best_key is None or key > best_key:
                best, best_key = i, key
        exp.append((best, rank))
        taken.add(best)
        ms = np.maximum(ms, np.round(unit @ unit[best], 4))
    assert got == exp


def test_mmr_select_guards(spark):
    import pytest as _pytest

    from updater_spark.operators.similarity import mmr_select

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="lam"):
        mmr_select(df, [1.0, 0.0], lam=1.5)
    with _pytest.raises(ValueError, match="k must"):
        mmr_select(df, [1.0, 0.0], k=0)
    with _pytest.raises(ValueError, match="no candidates"):
        mmr_select(df.filter("vec_id < 0"), [1.0, 0.0])


def test_kmeans_lloyd_separates_obvious_clusters(spark):
    from updater_spark.operators.similarity import kmeans_lloyd

    rows = [(i, [10.0 + (i % 3) * 0.01, 0.0]) for i in range(10)] + [
        (i, [-10.0 - (i % 3) * 0.01, 1.0]) for i in range(10, 20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents, asg = kmeans_lloyd(df, k=2, iters=3)
    got = {r["vec_id"]: r["cluster"] for r in asg.collect()}
    left = {got[i] for i in range(10)}
    right = {got[i] for i in range(10, 20)}
    assert len(left) == 1 and len(right) == 1 and left != right
    # centroids landed on the true means (to rounding)
    xs = sorted(c[0] for c in cents)
    assert abs(xs[0] - (-10.01)) < 0.01 and abs(xs[1] - 10.01) < 0.01


def test_kmeans_lloyd_deterministic_and_inertia_decreases(spark):
    import numpy as np

    from updater_spark.operators.similarity import kmeans_lloyd

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(60, 5))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    _, a1 = kmeans_lloyd(df, k=4, iters=1)
    _, a3 = kmeans_lloyd(df, k=4, iters=3)
    inertia1 = sum(r["d2"] for r in a1.collect())
    inertia3 = sum(r["d2"] for r in a3.collect())
    assert inertia3 <= inertia1 + 1e-9

    _, b3 = kmeans_lloyd(df.repartition(7), k=4, iters=3)
    assert sorted(map(tuple, a3.collect())) == sorted(map(tuple, b3.collect()))


def test_kmeans_lloyd_guards(spark):
    import pytest as _pytest

    from updater_spark.operators.similarity import kmeans_lloyd

    df = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="at least k"):
        kmeans_lloyd(df, k=3)
    with _pytest.raises(ValueError, match="must be >= 1"):
        kmeans_lloyd(df, k=0)


def test_kmeans_arrow_engine_matches_catalyst(spark):
    import numpy as np

    from updater_spark.operators.similarity import kmeans_lloyd

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(50, 6))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    c1, a1 = kmeans_lloyd(df, k=5, iters=2)
    c2, a2 = kmeans_lloyd(df, k=5, iters=2, engine="arrow")
    assert c1 == c2
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))


def test_hard_negatives_null_corpus_label_is_universal_negative(spark):
    from updater_spark.operators.similarity import hard_negatives_arrow

    # corpus row 9 has a NULL label: it must act as a negative for
    # every query (NaN never equals), not raise inside the stage
    rows = [
        (i, [1.0 + i * 0.001, 0.5, 0.0], i % 2 if i < 9 else None)
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives_arrow(df, df.filter("vec_id = 0"), k=9).collect()
    ids = {r["neighbor_id"] for r in out}
    assert 9 in ids  # NULL-labelled row returned as a negative
    assert 0 not in ids


def test_hard_negatives_rounded_tie_breaks_by_id(spark):
    from updater_spark.operators.similarity import hard_negatives_arrow

    # vectors engineered so raw sims differ only past the 4th decimal:
    # after rounding they tie, and the lower neighbor_id must win the
    # final slot even when the raw-sim order says otherwise
    import numpy as np

    q = np.array([1.0, 0.0])
    # ids 1..3 same label-0 pool; sims ~cos(theta) with tiny offsets
    def vec(eps):
        v = np.array([1.0, eps])
        return [float(x) for x in v / np.linalg.norm(v)]

    rows = [
        (1, vec(0.020000), 1),   # clearly top
        (2, vec(0.030001), 1),   # rounds equal to id 3 but raw LOWER
        (3, vec(0.030000), 1),   # raw higher; same rounded sim
        (4, vec(0.500000), 1),   # clearly out
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1)
    queries = spark.createDataFrame(
        [(0, [float(x) for x in q], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    out = hard_negatives_arrow(df, queries, k=2).collect()
    got = sorted((r["rank"], r["neighbor_id"]) for r in out)
    # ids 2 and 3 tie on the rounded sim; id 2 must take rank 2
    assert got == [(1, 1), (2, 2)]
