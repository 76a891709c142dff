"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the corpus, dot products via ``zip_with`` +
``aggregate`` (JVM lambda expressions, no Python). Scale path: LSH
bucketing by random-hyperplane sign bits; queries probe only their
bucket (and neighbors), cutting the scanned fraction to
~1/2^bits per probe.

At 100 TB the corpus side stays partitioned; only the query set and
the hyperplane matrix are broadcast. An IVF variant would replace the
random planes with k-means centroids — same bucket-join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def unit(a: Column) -> Column:
    """Pre-normalized vector: cosine(a, b) == dot(unit(a), unit(b)).
    Normalizing each vector ONCE (O(n) work) instead of computing both
    norms per candidate pair (O(n·m)) is the difference between a
    linear and a quadratic norm bill in every top-k / near-dup scan.

    The norm fold runs ONCE per row via ``aggregate``'s *finish*
    lambda (r11): the old shape captured the norm aggregate inside
    the transform lambda, where Catalyst re-evaluated it PER ELEMENT
    — O(d²) interpreted fold work per row (4096 lambda evals at
    d=64 vs 128 now), silently multiplied wherever the expression
    was inlined. Same accumulation order (left-to-right x², sqrt,
    per-element divide), so values are bit-identical; empty → [] and
    NULL → NULL edges unchanged.

    CAUTION still holds one level up: a join that fans this whole
    expression out per candidate pair pays the O(d) fold per PAIR —
    persist() the projected column first (see semantic_dedup — 20x
    measured)."""
    return F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, x: acc + x * x,
        lambda ss: F.transform(a, lambda x: x / F.sqrt(ss)),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 4,
) -> DataFrame:
    """Brute-force exact top-k: ``(query_id, neighbor_id, sim, rank)``.

    Deterministic ordering: (rounded sim DESC, neighbor id ASC) so
    results are stable across engines and runs. Self-matches excluded.
    The query side is broadcast; the corpus is scanned once, fully
    parallel — this is the exact-recall baseline the ANN variants are
    measured against.

    Kept deliberately UDF-free (Catalyst lambda dot products) as the
    engine-native didactic twin of ``cosine_topk_arrow``; the Arrow
    GEMM variant is ~7× faster at sf0.1 and is the brute-force path to
    actually deploy. Don't "optimize" this one — its value is that a
    plain-DataFrame reading of the semantics exists and oracles the
    others.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit(as_double(F.col(vec_col))).alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        unit(as_double(F.col(vec_col))).alias("cv"),
    )
    sim = dot(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_query_rows: int | None = None,
) -> DataFrame:
    """Brute-force top-k via Arrow-batched numpy GEMM.

    The exception that proves the "UDFs are the slow path" rule: dense
    matrix multiply is the one workload where per-element Catalyst
    lambdas lose to BLAS. The (small) query matrix is closed over and
    shipped once per executor; each Arrow batch of the corpus does one
    ``C @ Q.T``; per-batch local top-k keeps the shuffle tiny, a window
    finishes globally. Same output contract as ``cosine_topk``.
    """
    import numpy as np
    import pandas as pd

    qids, qm = _collect_unit_queries(
        queries, id_col, vec_col, max_rows=max_query_rows or MAX_QUERY_ROWS
    )

    out_schema = "query_id long, neighbor_id long, sim double"

    # bound the (batch x queries) score matrix per task — same knob
    # as pq_topk_arrow's q_block: 200k queries x a 10k-row Arrow
    # batch is 16 GB of float64 unchunked, 80 MB at 1024
    q_block = 1024

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            ids = pdf[id_col].to_numpy()
            n_local = min(k + 1, len(ids))  # +1 to survive self-match drop
            for q0 in range(0, len(qids), q_block):
                qb = qm[q0 : q0 + q_block]
                sims = cm @ qb.T  # (batch, q_block)
                # round BEFORE the local selection and break ties by
                # id (the hard_negatives_arrow discipline, ADVICE r9):
                # a bare argpartition on raw floats can keep the
                # higher-id member of a 4-decimal tie straddling the
                # batch-local k+1 boundary, while the global window
                # (sim DESC, id ASC) — and the DuckDB oracle — keep
                # the lower id. Negating the rounded sims turns that
                # order into _adc_local_topk's native (dist ASC,
                # id ASC).
                neg = -np.round(sims.T, 4)  # (q_block, batch)
                out_d, out_i = _adc_local_topk(neg, ids, n_local)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(
                            qids[q0 : q0 + q_block], n_local
                        ),
                        "neighbor_id": out_i.ravel(),
                        "sim": (-out_d).ravel(),
                    }
                )

    local = corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


class SQModel:
    """Per-dimension affine int8 codebook: ``mins[i]``/``maxs[i]``
    bound dimension i over the training corpus. 2·d doubles — the
    whole 'index' is two literal arrays, vs PQ's k·d codebook."""

    def __init__(self, mins: list[float], maxs: list[float]):
        if len(mins) != len(maxs):
            raise ValueError("mins/maxs length mismatch")
        self.mins = [float(v) for v in mins]
        self.maxs = [float(v) for v in maxs]

    @property
    def dim(self) -> int:
        return len(self.mins)


def sq_train(
    corpus: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> SQModel:
    """Train scalar (SQ8) quantization: per-dimension min/max over the
    corpus — the int8 compression every production vector store ships
    (FAISS ScalarQuantizer, Milvus/Qdrant "scalar quantization"):
    4 B/dim float32 → 1 B/dim code at ~0.99+ recall@10, so a 100 TB
    embedding corpus scores from a 25 TB scan.

    Scale shape: ONE aggregate job with 2·d partial-combining min/max
    expressions (``element_at`` per dim — no explode, no shuffle of
    the vectors; only d-length partial states merge). min/max are
    order-insensitive and EXACT on doubles, so the model replays
    bit-identically in any engine — no float-sum drift in training.
    The 2·d-double model folds back as plan literals (the IVF/PQ
    codebook stance: the corpus is never re-shuffled to use it)."""
    if dim is None:
        probe = corpus.select(F.size(vec_col).alias("d")).first()
        if probe is None:
            raise ValueError("empty corpus; nothing to train")
        dim = probe["d"]
    v = as_double(F.col(vec_col))
    row = corpus.agg(
        *[F.min(F.element_at(v, i + 1)).alias(f"mn{i}") for i in range(dim)],
        *[F.max(F.element_at(v, i + 1)).alias(f"mx{i}") for i in range(dim)],
    ).first()
    return SQModel(
        [row[f"mn{i}"] for i in range(dim)],
        [row[f"mx{i}"] for i in range(dim)],
    )


def sq_assign(
    corpus: DataFrame,
    model: SQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to its SQ8 code array: ``code_i =
    clamp(floor((x_i - min_i) / span_i * 255 + 0.5), 0, 255)``
    (half-away rounding, written as floor(+0.5) so both engines use
    the identical primitive); a zero-span (constant) dimension codes
    to 0 and dequantizes back to the constant. Returns ``(id_col,
    sq_code: array<int>)``.

    The int array keeps codes engine-portable for the oracle; the
    deploy format packs them to a d-byte binary column (1 B/dim) —
    the arithmetic is unchanged, only the container. Map-only:
    d clamp expressions per row, whole-stage codegen, no shuffle."""
    v = as_double(F.col(vec_col))

    def code(i: int) -> Column:
        span = model.maxs[i] - model.mins[i]
        if span <= 0.0:
            return F.lit(0)
        x = F.element_at(v, i + 1)
        raw = F.floor(
            (x - F.lit(model.mins[i])) / F.lit(span) * F.lit(255.0)
            + F.lit(0.5)
        )
        return F.least(
            F.greatest(raw, F.lit(0)), F.lit(255)
        ).cast("int")

    return corpus.select(
        F.col(id_col),
        F.array(*[code(i) for i in range(model.dim)]).alias("sq_code"),
    )


def sq_topk(
    queries: DataFrame,
    codes: DataFrame,
    model: SQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 4,
) -> DataFrame:
    """Asymmetric SQ8 cosine top-k: the FULL-precision query against
    DEQUANTIZED corpus codes ``x̂_i = min_i + code_i · span_i/255``
    (ADC — the query never loses precision, only the stored corpus
    does). Same contract as ``cosine_topk``: ``(query_id,
    neighbor_id, sim, rank)``, rounded-sim-then-id ordering,
    self-matches excluded.

    The dequantized unit-vector projection is persist()ed before the
    query join — the ``unit`` CAUTION in action: CollapseProject
    otherwise inlines the whole dequant+normalize expression tree
    into the join output and re-evaluates it PER CANDIDATE PAIR
    (measured 141s → 4s at sf0.1, the semantic_dedup 20× lesson).
    That cache holds full-width doubles, which defeats SQ8's 4× scan
    saving — so this is the didactic oracle twin; the deploy path is
    ``sq_topk_arrow``, which streams the CODES and dequantizes per
    Arrow batch so the 1 B/dim representation is what crosses the
    scan. Compose with the IVF cell restriction for sub-linear
    probes, exactly as FAISS pairs IVF with SQ."""
    steps = [
        (model.maxs[i] - model.mins[i]) / 255.0 for i in range(model.dim)
    ]
    dequant = F.array(
        *[
            F.lit(model.mins[i])
            + F.element_at(F.col("sq_code"), i + 1) * F.lit(steps[i])
            for i in range(model.dim)
        ]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit(as_double(F.col(vec_col))).alias("qv"),
    )
    c = (
        codes.select(
            F.col(id_col).alias("neighbor_id"), dequant.alias("_xh")
        )
        .select("neighbor_id", unit(F.col("_xh")).alias("cv"))
        .persist()
    )
    sim = dot(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def sq_topk_arrow(
    queries: DataFrame,
    codes: DataFrame,
    model: SQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "sq_code",
    k: int = 5,
    max_query_rows: int | None = None,
) -> DataFrame:
    """SQ8 deploy path: Arrow-batched asymmetric scoring over the
    CODE column — the corpus that crosses the scan is the 1 B/dim
    int8 representation; each batch dequantizes ``mins + codes *
    steps`` in numpy (identical elementwise affine as the Catalyst
    twin — no float-sum reorder in the dequant itself), unit-
    normalizes, and scores one ``C @ Q.T`` GEMM. Same output
    contract as ``sq_topk``; rounds before the batch-local top-k and
    ties by id (the cosine_topk_arrow/ADVICE-r9 discipline), a
    window finishes globally on k·|Q|-sized locals. This is the FAISS
    IVF-SQ scan loop expressed as mapInPandas — nothing corpus-sized
    is cached or shuffled."""
    import numpy as np
    import pandas as pd

    qids, qm = _collect_unit_queries(
        queries, id_col, vec_col, max_rows=max_query_rows or MAX_QUERY_ROWS
    )
    mins = np.array(model.mins, dtype=np.float64)
    steps = np.array(
        [(mx - mn) / 255.0 for mn, mx in zip(model.mins, model.maxs)],
        dtype=np.float64,
    )
    out_schema = "query_id long, neighbor_id long, sim double"
    q_block = 1024

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(pdf[code_col].tolist(), dtype=np.float64)
            cm = mins + cm * steps  # exact per-element affine dequant
            norms = np.linalg.norm(cm, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            cm = cm / norms
            ids = pdf[id_col].to_numpy()
            n_local = min(k + 1, len(ids))
            for q0 in range(0, len(qids), q_block):
                qb = qm[q0 : q0 + q_block]
                sims = cm @ qb.T
                neg = -np.round(sims.T, 4)
                out_d, out_i = _adc_local_topk(neg, ids, n_local)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(
                            qids[q0 : q0 + q_block], n_local
                        ),
                        "neighbor_id": out_i.ravel(),
                        "sim": (-out_d).ravel(),
                    }
                )

    local = codes.select(id_col, code_col).mapInPandas(
        score, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int = 11) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG-driven, reproducible
    in the pure-Python test oracle without numpy RNG state)."""
    state = seed
    planes = []
    for _ in range(bits):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            row.append((state / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec · plane_i)."""
    code = None
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        code = bit if code is None else code + bit
    return code


# Default ceiling on how many query rows the fused searches pull to
# the driver — the same small-side stance a broadcast join takes with
# spark.sql.autoBroadcastJoinThreshold, and a PARAMETER, not a
# functional limit (every search takes ``max_query_rows``).
#
# Memory model of the fused query side (all terms bounded, none scale
# with the corpus):
#   driver:   Q × D × 8 B          query matrix (Arrow-collected flat,
#                                  no per-float Python objects)
#           + QB × C × 8 B         probe-assign GEMM block (QB =
#                                  _Q_BLOCK rows at a time, never Q×C)
#   executor: Q × D × 8 B          closure-shipped query matrix, plus
#           + QB × batch × 8 B     the score matrix, query axis
#                                  chunked at q_block (pq_topk_arrow /
#                                  ivfpq_topk)
# At the default 200k × 64-dim: 100 MB driver + 100 MB/executor —
# raise the parameter if the cluster affords more; past a few 100 MB
# the right tool is a partitioned corpus-corpus join
# (embedding_near_dup_pairs) rather than a broadcast-shaped search.
MAX_QUERY_ROWS = 200_000

# ivfpq_topk: a cell's ADC distance table is cached across Arrow
# batches only when its prober set is at most this many queries
# (256 x M x K doubles ≈ 17 MB at M=32, K=256); larger sets build
# per-(cell, q_block) transients instead — the bound that keeps a
# task's table memory independent of total query count.
_TABLE_CACHE_QSEL = 256


def _pq_query_tables(qsub, cb):
    """(Q, M, K) squared subspace distances via the GEMM identity
    ``||a-b||² = ||a||² - 2·a·b + ||b||²`` — measured 2.6× faster
    than the broadcast ``((a-b)**2).sum`` form at deploy shapes (the
    4-D temporary it materializes is allocation/bandwidth-bound, the
    matmul is BLAS). Numerically within ~1e-15 of the exact form,
    absorbed by the 1e-6 dist rounding every consumer applies before
    ranking. QUERY tables only: code ASSIGNMENT (pq_assign_arrow /
    ivfpq_assign) keeps the exact subtraction form — its
    lowest-codeword tie contract plants EXACT ties that rearranged
    arithmetic need not preserve bit-for-bit."""
    import numpy as np

    qn = np.einsum("qms,qms->qm", qsub, qsub)
    cn = np.einsum("mks,mks->mk", cb, cb)
    dot = np.matmul(qsub.transpose(1, 0, 2), cb.transpose(0, 2, 1))
    t = qn.T[:, :, None] + cn[:, None, :] - 2.0 * dot  # (M, Q, K)
    return np.ascontiguousarray(t.transpose(1, 0, 2))

# queries GEMM'd against centroids per block during probe assignment:
# bounds the (block × C) matrix at ~64 MB for C=1024 cells.
_Q_BLOCK = 8192

# pq_topk builds one M*K-literal expression tree PER query — a much
# lower ceiling than the tensor-shipping paths.
MAX_LITERAL_QUERIES = 256


def _collect_queries(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    max_rows: int = MAX_QUERY_ROWS,
    unit: bool = False,
):
    """Driver-side (ids, row matrix) for the fused searches — the same
    small-query-side assumption a broadcast join would make (see the
    MAX_QUERY_ROWS memory model).

    Collected via Arrow straight into flat numpy: at 200k × 64 dims
    that is ~100 MB of float64, vs ~400 MB+ of boxed PyFloats the Row
    path would allocate — the query matrix is the ONLY per-Q driver
    allocation, so this is what bounds driver RSS.

    Raises past ``max_rows`` instead of silently OOMing: the parameter
    is the broadcast-size knob; a query set too big to broadcast
    should run as a partitioned corpus-corpus join
    (``embedding_near_dup_pairs``) instead."""
    import numpy as np

    tbl = (
        queries.select(
            F.col(id_col).cast("long").alias("id"),
            as_double(F.col(vec_col)).alias("v"),
        )
        .limit(max_rows + 1)
        .toArrow()
    )
    if tbl.num_rows > max_rows:
        raise ValueError(
            f"query side exceeds max_rows={max_rows}: the fused "
            "top-k broadcasts the query matrix to every executor "
            f"(~{max_rows * 64 * 8 >> 20} MB at 64 dims). Raise "
            "max_query_rows if the cluster affords it, or use a "
            "partitioned corpus-corpus join for corpus-sized query sets"
        )
    qids = tbl.column("id").to_numpy()
    vcol = tbl.column("v").combine_chunks()
    flat = vcol.flatten().to_numpy(zero_copy_only=False)
    qm = np.ascontiguousarray(
        flat.reshape(len(qids), -1) if len(qids) else flat.reshape(0, 1),
        dtype=np.float64,
    )
    if unit:
        qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    return qids, qm


def _collect_unit_queries(
    queries: DataFrame, id_col: str, vec_col: str, max_rows: int = MAX_QUERY_ROWS
):
    return _collect_queries(queries, id_col, vec_col, max_rows, unit=True)


def _fused_bucket_topk(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    assign,
    by_bucket: dict,
    bucket_col: str | None = None,
) -> DataFrame:
    """Shared engine for bucketed ANN (LSH and IVF): ONE narrow
    mapInPandas stage over the corpus — each Arrow batch assigns its
    vectors to buckets (``assign``: unit matrix → int64 bucket per
    row) and GEMM-scores them against the queries probing those
    buckets (``by_bucket``: bucket → (qids, unit query matrix)),
    emitting at most k+1 rows per probing query per batch. The corpus
    is never joined or shuffled; only the final top-k window shuffles
    the small candidate set. Per-pair Catalyst lambda dots (the
    broadcast-join formulation) run interpreted and lose to BLAS ~7x
    on the same flops.

    ``bucket_col``: if the corpus already carries a materialized
    bucket assignment (a persistent IVF index — ``ivf_assign``), pass
    its column name and the stage skips the assignment GEMM entirely,
    reading buckets from the column instead of calling ``assign``.
    NULL buckets (rows the index never covered) are filtered out
    before the stage — they would otherwise poison the whole batch's
    int bucket array with NaN."""
    import numpy as np
    import pandas as pd

    out_schema = "query_id long, neighbor_id long, sim double"
    in_cols = [id_col, vec_col] + ([bucket_col] if bucket_col else [])
    if bucket_col:
        # restrict the scan to PROBED cells (non-probed buckets can't
        # contribute) — on an index written partitionBy(bucket_col)
        # this becomes parquet partition pruning: only nprobe/k of the
        # corpus files are ever opened. Also drops NULL buckets (rows
        # the index never covered), which would otherwise poison the
        # batch's int bucket array with NaN.
        corpus = corpus.filter(
            F.col(bucket_col).isin([int(b) for b in by_bucket])
        )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            ids = pdf[id_col].to_numpy()
            assigned = (
                pdf[bucket_col].to_numpy(dtype=np.int64)
                if bucket_col
                else assign(vm)
            )
            frames = []
            for b in np.unique(assigned):
                sub = by_bucket.get(int(b))
                if sub is None:
                    continue
                sqids, sqm = sub
                rows = assigned == b
                sims = vm[rows] @ sqm.T  # (bucket rows in batch, nq probing)
                rids = ids[rows]
                n_local = min(k + 1, len(rids))  # +1 survives self-match drop
                # vectorized local top-k over ALL probing queries, tail
                # partition to avoid the full -sims copy (see
                # cosine_topk_arrow)
                top = np.argpartition(sims, len(rids) - n_local, axis=0)[
                    len(rids) - n_local :, :
                ]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(sqids, n_local),
                            "neighbor_id": rids[top].ravel(order="F"),
                            "sim": np.round(
                                np.take_along_axis(sims, top, axis=0), 4
                            ).ravel(order="F"),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    local = corpus.select(*in_cols).mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
    seed: int = 11,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane
    signature, rank within shared buckets only. Trades recall for a
    ~2^bits scan reduction; measure recall against ``cosine_topk``
    (tests/test_similarity.py). Runs on the fused narrow-stage engine
    (``_fused_bucket_topk``) — signature + scoring per Arrow batch,
    no join, no corpus shuffle.

    ``multiprobe``: additionally probe every bucket within Hamming
    distance ≤ ``multiprobe`` of the query's signature (the classic
    multi-probe LSH recall lever — a true neighbor differing on one
    borderline hyperplane lands one bit away). Scanned fraction grows
    from ~1/2^bits to ~(1 + C(bits,1) + …)/2^bits: at bits=8,
    multiprobe=1 probes 9 of 256 buckets — still a 28× reduction,
    with measured recall@10 0.48 → 0.84 on the clustered 1M-vector
    probe (bench_scale ann). The corpus side is untouched — only the
    query→bucket map grows."""
    import itertools

    import numpy as np

    P = np.array(_hyperplanes(dim, bits, seed), dtype=np.float64)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    def signature(vm):
        return ((vm @ P.T) > 0) @ weights

    qids, qm = _collect_unit_queries(queries, id_col, vec_col)
    qsig = signature(qm)
    # flip masks for Hamming distance 0..multiprobe
    masks = [0]
    for d in range(1, multiprobe + 1):
        for combo in itertools.combinations(range(bits), d):
            masks.append(sum(1 << b for b in combo))
    by_bucket: dict = {}
    for m in masks:
        probed = qsig ^ np.int64(m)
        for b in np.unique(probed):
            mask = probed == b
            if int(b) in by_bucket:
                pids, pqm = by_bucket[int(b)]
                by_bucket[int(b)] = (
                    np.concatenate([pids, qids[mask]]),
                    np.concatenate([pqm, qm[mask]]),
                )
            else:
                by_bucket[int(b)] = (qids[mask], qm[mask])
    return _fused_bucket_topk(corpus, id_col, vec_col, k, signature, by_bucket)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + cluster-probed search
# ---------------------------------------------------------------------------


def _kmeans_parallel_init(
    base: DataFrame, k: int, oversample: int, rounds: int, seed: int
) -> list[list[float]]:
    """Deterministic k-means|| (Bahmani et al., VLDB 2012): each round
    samples ~``oversample`` candidates with probability proportional to
    their squared distance to the current center set, then the
    weighted candidate set is reduced to k centers driver-side with
    k-means++. All distributed passes are narrow GEMM stages; the
    "randomness" is a hash of (id, round), so the same corpus always
    yields the same centers.

    Unit vectors: d² = 2·(1 − max cosine) up to scale; the constant
    factor cancels in the sampling ratio."""
    import numpy as np
    import pandas as pd

    first = base.orderBy("id").limit(1).collect()
    centers = [list(first[0]["v"])]
    for rnd in range(rounds):
        cm = np.array(centers, dtype=np.float64)

        def costs(batches, cm=cm):
            for pdf in batches:
                if not len(pdf):
                    continue
                vm = np.array(pdf["v"].tolist(), dtype=np.float64)
                d2 = np.maximum(0.0, 1.0 - (vm @ cm.T).max(axis=1))
                yield pd.DataFrame({"id": pdf["id"], "v": pdf["v"], "d2": d2})

        scored = base.mapInPandas(
            costs, schema="id long, v array<double>, d2 double"
        ).persist()
        total = scored.agg(F.sum("d2").alias("s")).collect()[0]["s"]
        if not total:
            scored.unpersist()
            break
        # P(pick) = min(1, oversample * d2 / total); u = hash(id, rnd)
        u = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + rnd)), F.lit(1 << 20)) / (
            1 << 20
        )
        cand = scored.filter(
            u < F.lit(float(oversample)) * F.col("d2") / F.lit(float(total))
        ).collect()
        scored.unpersist()
        centers.extend(list(r["v"]) for r in cand)
    cm = np.array(centers, dtype=np.float64)

    # weight candidates by how many corpus points they own
    def owners(batches, cm=cm):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf["v"].tolist(), dtype=np.float64)
            yield pd.DataFrame({"c": np.argmax(vm @ cm.T, axis=1)})

    w = {
        r["c"]: r["n"]
        for r in base.mapInPandas(owners, schema="c long")
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    weights = np.array([w.get(i, 0) for i in range(len(centers))], dtype=np.float64)

    # weighted k-means++ reduction to k, deterministic LCG
    chosen = [0]
    state = seed
    for _ in range(1, min(k, len(centers))):
        d2 = np.maximum(0.0, 1.0 - (cm @ cm[chosen].T).max(axis=1))
        p = weights * d2
        s = p.sum()
        if not s:
            break
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        target = (state / float(1 << 63)) * s
        chosen.append(int(np.searchsorted(np.cumsum(p), target)))
    out = [list(cm[i]) for i in chosen]
    # pad with lowest-id vectors if the candidate pool was too small
    if len(out) < k:
        pad = base.orderBy("id").limit(k).collect()
        out.extend(list(r["v"]) for r in pad[: k - len(out)])
    return out[:k]


def ivf_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iterations: int = 5,
    init: str = "lowest_id",
) -> list[list[float]]:
    """Lloyd's k-means over unit vectors, one job per iteration. Only
    the k×dim centroid matrix ever reaches the driver.

    Assignment + partial mean-update run fused in an Arrow-batched
    GEMM (the ``cosine_topk_arrow`` exception to the "UDFs are the
    slow path" rule: dense matmul is where BLAS beats per-element
    Catalyst lambdas). Each batch emits per-cluster (count, sum)
    partials, so the stage is narrow and the shuffle carries only
    ~k rows per partition — vs. the previous Catalyst formulation
    (broadcast-join argmin + window + posexplode) that shuffled
    corpus×k scored rows and corpus×dim exploded elements. Measured
    1.4× faster at sf0.1 (k=16, 3 iters) with zero centroid drift.

    Deterministic: initial centroids are the k lowest-id vectors,
    numpy argmax ties break to the lowest cluster (matching the
    Catalyst argmin's (_d DESC, cluster ASC) order), and reductions
    are exact per-position float sums in fixed cluster order."""
    import numpy as np
    import pandas as pd

    base = corpus.select(
        F.col(id_col).alias("id"), unit(as_double(F.col(vec_col))).alias("v")
    ).persist()  # scanned once per Lloyd iteration — cache the unit vectors
    if init == "kmeans_parallel":
        centroids = _kmeans_parallel_init(
            base, k, oversample=2 * k, rounds=2, seed=7
        )
    else:  # "lowest_id": the cheap deterministic default
        rows = base.orderBy("id").limit(k).collect()
        centroids = [list(r["v"]) for r in rows]
    dim = len(centroids[0])
    for _ in range(iterations):
        cm = np.array(centroids, dtype=np.float64)

        def partials(batches, cm=cm):
            for pdf in batches:
                if not len(pdf):
                    continue
                vm = np.array(pdf["v"].tolist(), dtype=np.float64)
                assign = np.argmax(vm @ cm.T, axis=1)
                out = []
                for cl in np.unique(assign):
                    mask = assign == cl
                    out.append(
                        {
                            "cluster": int(cl),
                            "n": int(mask.sum()),
                            "s": vm[mask].sum(axis=0).tolist(),
                        }
                    )
                yield pd.DataFrame(out)

        part = base.mapInPandas(
            partials, schema="cluster long, n long, s array<double>"
        )
        rows = (
            part.groupBy("cluster")
            .agg(
                F.sum("n").alias("n"),
                *[
                    F.sum(F.element_at("s", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ],
            )
            .collect()
        )
        by_cluster = {
            r["cluster"]: [r[f"s{i}"] / r["n"] for i in range(dim)] for r in rows
        }
        centroids = [
            by_cluster.get(i, centroids[i]) for i in range(k)
        ]  # empty clusters keep their previous centroid
    base.unpersist()
    return centroids


def codebook_id(centroids: list[list[float]]) -> str:
    """Stable identity of a quantizer codebook — md5 over the exact
    float64 bytes of the centroid matrix. Persisted into the bucket
    column's metadata by ``ivf_assign`` and verified by ``ivf_topk``
    so a stale index (buckets from different centroids than the query
    probes) errors instead of silently degrading recall."""
    import hashlib

    import numpy as np

    return hashlib.md5(
        np.ascontiguousarray(centroids, dtype=np.float64).tobytes()
    ).hexdigest()


def pq_train(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    k_codewords: int = 16,
    iterations: int = 3,
) -> list[list[list[float]]]:
    """Residual PQ codebook trainer (Jegou et al. 2011 §III): per-
    subspace Lloyd's k-means in residual space ``v - centroid[cell]``
    — the codebooks ``ivfpq_assign``/``IvfPqIndex.bootstrap`` consume.
    Until now PQ codebooks were caller-supplied fixtures; this is the
    production trainer, and with ``ivf_train`` it completes the
    re-train actuator for ``needs_retrain`` (see
    ``IvfPqIndex.retrain``).

    Scale shape: ALL ``m_sub`` subspaces train in ONE narrow
    mapInPandas pass + one shuffle per Lloyd iteration — each Arrow
    batch assigns cells (GEMM), forms residuals, argmin-codes every
    subspace against the current codebooks, and emits per-(m, code)
    (count, sum) partials, so the shuffle carries ~partitions × M × K
    rows regardless of corpus size and only the (M, K, dim/M)
    codebook tensor ever reaches the driver. Never a per-subspace
    job, never a corpus collect — the ``ivf_train`` shape, keyed
    (m, code) instead of (cluster).

    Deterministic: initial codewords are the residual subvectors of
    the ``k_codewords`` lowest-id rows, numpy argmin ties break to
    the lowest codeword (``ivfpq_assign``'s convention), reductions
    are exact per-position float sums, and empty codewords keep
    their previous value (``ivf_train``'s convention). Assignment
    and residual formation here are bit-identical to
    ``ivfpq_assign``'s, so trained books quantize exactly as the
    index will."""
    import numpy as np
    import pandas as pd

    cm = np.array(centroids, dtype=np.float64)
    dim = cm.shape[1]
    if dim % m_sub:
        raise ValueError(
            f"dim {dim} is not divisible by m_sub {m_sub} — PQ needs "
            "equal-width subspaces"
        )
    sub = dim // m_sub
    base = corpus.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("v")
    ).persist()  # scanned once for init + once per Lloyd iteration
    rows = base.orderBy("id").limit(k_codewords).collect()
    if len(rows) < k_codewords:
        base.unpersist()
        raise ValueError(
            f"corpus has {len(rows)} rows < k_codewords={k_codewords}"
        )
    vm0 = np.array([r["v"] for r in rows], dtype=np.float64)
    cells0 = (vm0 @ cm.T).argmax(axis=1)
    resid0 = (vm0 - cm[cells0]).reshape(len(vm0), m_sub, sub)
    cb = np.ascontiguousarray(resid0.transpose(1, 0, 2))  # (M, K, sub)

    for _ in range(iterations):
        cb_now = cb.copy()

        def partials(batches, cm=cm, cb=cb_now):
            for pdf in batches:
                if not len(pdf):
                    continue
                vm = np.array(pdf["v"].tolist(), dtype=np.float64)
                cells = (vm @ cm.T).argmax(axis=1)
                resid = (vm - cm[cells]).reshape(len(vm), m_sub, sub)
                out = []
                d2 = ((resid[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(
                    axis=3
                )
                codes = d2.argmin(axis=2)  # (B, M), ties to lowest
                for m in range(m_sub):
                    for cl in np.unique(codes[:, m]):
                        mask = codes[:, m] == cl
                        out.append(
                            {
                                "m": int(m),
                                "code": int(cl),
                                "n": int(mask.sum()),
                                "s": resid[mask, m].sum(axis=0).tolist(),
                            }
                        )
                yield pd.DataFrame(out)

        part = base.mapInPandas(
            partials, schema="m long, code long, n long, s array<double>"
        )
        agg = (
            part.groupBy("m", "code")
            .agg(
                F.sum("n").alias("n"),
                *[
                    F.sum(F.element_at("s", i + 1)).alias(f"s{i}")
                    for i in range(sub)
                ],
            )
            .collect()
        )
        for r in agg:  # empty codewords keep their previous value
            cb[r["m"], r["code"]] = [r[f"s{i}"] / r["n"] for i in range(sub)]
    base.unpersist()
    return [[[float(x) for x in cw] for cw in book] for book in cb]


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Materialize the IVF cell assignment as a column — the
    index-build step of a persistent IVF index. Write the result as
    a table partitioned/bucketed by ``out_col``; ``ivf_topk(...,
    bucket_col=out_col)`` then searches it without re-running the
    assignment GEMM (and partition pruning skips unprobed cells
    entirely on a parquet-backed index).

    Assignment = argmax over centroids of ``dot(v, c)`` (ties to the
    lowest cell, matching numpy argmax). Raw dots: scaling a vector by
    a positive norm never changes its argmax cell, so unit
    normalization is skipped here. The codebook's identity
    (``codebook_id``) rides in the column metadata; a FLAT parquet
    write preserves it, but ``partitionBy(out_col)`` does NOT (Spark
    drops partition-column metadata on read) — persist partitioned
    indexes through ``write_ivf_index``/``read_ivf_index``, which
    carry the identity in a sidecar file."""
    dots = [
        dot(as_double(F.col(vec_col)), F.array(*[F.lit(x) for x in c]))
        for c in centroids
    ]
    arr = F.array(*dots)
    best = (F.array_position(arr, F.array_max(arr)) - 1).cast("long")
    return corpus.withColumn(out_col, best).withMetadata(
        out_col, {"codebook": codebook_id(centroids)}
    )


IVF_CODEBOOK_SIDECAR = "_IVF_CODEBOOK"


def _hadoop_fs(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def write_ivf_index(
    assigned: DataFrame, path: str, bucket_col: str = "bucket"
) -> None:
    """Persist an ``ivf_assign``-ed corpus as a bucket-partitioned
    parquet index. ``partitionBy`` turns the bucket column into
    directory names, and Spark drops partition-column METADATA on
    read — so the codebook identity ``ivf_assign`` put there would
    silently vanish and ``ivf_topk``'s staleness guard would never
    fire. This writer copies the identity into a ``_IVF_CODEBOOK``
    sidecar (underscore-prefixed: invisible to the parquet reader);
    ``read_ivf_index`` re-attaches it. Uses the Hadoop FileSystem API
    so any scheme (file/hdfs/s3a) the index lives on works."""
    meta: dict = {}
    for f in assigned.schema.fields:
        if f.name == bucket_col:
            meta = f.metadata or {}
    cb = meta.get("codebook")
    if not cb:
        raise ValueError(
            f"column {bucket_col!r} carries no codebook identity — "
            "build the index with ivf_assign(), which attaches it"
        )
    assigned.write.partitionBy(bucket_col).parquet(path)
    spark = assigned.sparkSession
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark._jvm
    sidecar = jvm.org.apache.hadoop.fs.Path(path, IVF_CODEBOOK_SIDECAR)
    out = fs.create(sidecar, True)
    try:
        out.write(bytearray(cb.encode("utf-8")))
    finally:
        out.close()


def read_ivf_index(
    spark, path: str, bucket_col: str = "bucket"
) -> DataFrame:
    """Read a ``write_ivf_index`` layout, restoring the codebook
    identity from the sidecar into the bucket column's metadata so
    ``ivf_topk(bucket_col=...)`` verifies it exactly as it does for a
    flat (non-partitioned) index."""
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark._jvm
    sidecar = jvm.org.apache.hadoop.fs.Path(path, IVF_CODEBOOK_SIDECAR)
    if not fs.exists(sidecar):
        raise FileNotFoundError(
            f"{path} has no {IVF_CODEBOOK_SIDECAR} sidecar — was this "
            "index written with write_ivf_index()?"
        )
    stream = fs.open(sidecar)
    try:
        cb = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()
    return spark.read.parquet(path).withMetadata(
        bucket_col, {"codebook": cb}
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    bucket_col: str | None = None,
    codebook: str | None = None,
    allow_unverified: bool = False,
) -> DataFrame:
    """IVF search: corpus vectors live in their nearest-centroid
    bucket; each query probes its ``nprobe`` nearest buckets and ranks
    only those vectors. Scan fraction ≈ nprobe/k with far better
    recall than hyperplane LSH at the same reduction, because buckets
    follow the data distribution (k-means) instead of random planes.

    Runs on the fused narrow-stage engine (``_fused_bucket_topk``):
    assignment (numpy argmax GEMM, ties to lowest cluster) + scoring
    per Arrow batch, no join, no corpus shuffle. Queries are collected
    to the driver — the small-side assumption a broadcast join would
    make (bounded by MAX_QUERY_ROWS).

    ``bucket_col``: search a pre-assigned corpus (``ivf_assign``)
    instead of assigning per batch. The index's codebook identity —
    from the column's ``codebook`` metadata, or the ``codebook``
    argument (e.g. read from ``write_ivf_index``'s sidecar or an
    ``IvfIndex`` codebook table) — must match these ``centroids``; a
    mismatch raises instead of silently probing the wrong cells.
    When NO identity is available the search refuses to run (a
    partitioned parquet read drops the metadata, which would
    otherwise disable this guard silently): pass
    ``allow_unverified=True`` to explicitly accept an unverifiable
    index."""
    import numpy as np

    if bucket_col is not None:
        meta = {}
        for f in corpus.schema.fields:
            if f.name == bucket_col:
                meta = f.metadata or {}
        stored = meta.get("codebook") or codebook
        expected = codebook_id(centroids)
        if stored is not None and stored != expected:
            raise ValueError(
                f"stale IVF index: column {bucket_col!r} was assigned "
                f"with codebook {stored}, search uses "
                f"{expected}; re-run ivf_assign"
            )
        if stored is None and not allow_unverified:
            raise ValueError(
                f"unverifiable IVF index: column {bucket_col!r} "
                "carries no codebook identity (partitioned parquet "
                "writes drop column metadata) — read the index via "
                "read_ivf_index(), pass codebook=, or opt out with "
                "allow_unverified=True"
            )

    cm = np.array(centroids, dtype=np.float64)

    def nearest(vm):
        return np.argmax(vm @ cm.T, axis=1)

    qids, qm = _collect_unit_queries(queries, id_col, vec_col)
    # probe sets: stable argsort of -sim keeps ascending cluster order
    # among ties — the (sim DESC, cluster ASC) probe order
    probes = np.argsort(-(qm @ cm.T), axis=1, kind="stable")[:, :nprobe]
    by_cluster = {}
    for c in range(len(centroids)):
        mask = (probes == c).any(axis=1)
        if mask.any():
            by_cluster[c] = (qids[mask], qm[mask])
    return _fused_bucket_topk(
        corpus, id_col, vec_col, k, nearest, by_cluster, bucket_col=bucket_col
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 8,
    dim: int = 64,
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: only
    same-bucket pairs are scored (near-identical vectors land in the
    same bucket with high probability)."""
    planes = _hyperplanes(dim, bits, seed)
    v = df.select(
        F.col(id_col).alias("id"), unit(as_double(F.col(vec_col))).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v"), planes))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("va"), F.col("vb")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def pq_assign(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization — the vector-COMPRESSION half of the ANN
    toolbox (IVF/LSH bucket, PQ shrinks what's stored): split each
    D-dim vector into M contiguous subvectors and store, per
    subspace, only the index of the nearest codeword. At D=64 fp32
    that is 256 bytes -> M bytes + one shared codebook, the trade
    that makes billion-vector indexes fit on disk budgets.

    ``codebooks``: M lists of k codewords, each of dimension D/M.
    Assignment = per-subspace argmin of Euclidean distance, ties to
    the lowest codeword (matching SQL row_number order).

    The M*k distance expressions are GENERATED SQL (the md5-minhash
    lesson): building ~4k Column objects through py4j costs ~4 ms per
    call = 16 s of pure driver-side plan construction at M=4, k=16;
    one parsed ``selectExpr`` string is milliseconds. Element casts
    are materialized once as flat columns first so the cast array
    isn't re-evaluated per element_at reference (the tokenize()
    lesson — 30 s instead of ~1.5 s on the sf0.1 embeddings when the
    transform gets inlined into every access).

    Returns ``(id, codes array<long>, recon_err double)`` where
    recon_err is the sum over subspaces of the winning Euclidean
    distance — the quantization-quality number to monitor when
    retraining codebooks."""
    m_sub = len(codebooks)
    sub = len(codebooks[0][0])
    dim = m_sub * sub
    flat = corpus.selectExpr(
        id_col,
        *[
            f"CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) AS _e{i}"
            for i in range(dim)
        ],
    )

    def dist_sql(m: int, j: int) -> str:
        cw = codebooks[m][j]
        terms = " + ".join(
            f"((_e{m * sub + s} - ({float(cw[s])!r})) * "
            f"(_e{m * sub + s} - ({float(cw[s])!r})))"
            for s in range(sub)
        )
        return f"sqrt({terms})"

    arrs = flat.selectExpr(
        id_col,
        *[
            f"array({', '.join(dist_sql(m, j) for j in range(len(codebooks[m])))})"
            f" AS _arr{m}"
            for m in range(m_sub)
        ],
    )
    code_sqls = ", ".join(
        f"CAST(array_position(_arr{m}, array_min(_arr{m})) - 1 AS LONG)"
        for m in range(m_sub)
    )
    recon = " + ".join(f"array_min(_arr{m})" for m in range(m_sub))
    return arrs.selectExpr(
        id_col,
        f"array({code_sqls}) AS codes",
        f"round({recon}, 6) AS recon_err",
    )


def pq_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-compressed corpus —
    the SEARCH half of product quantization (``pq_assign`` is the
    compression half; Jegou et al. 2011, "Product Quantization for
    Nearest Neighbor Search").

    For each query the driver precomputes the M x K table of SQUARED
    Euclidean distances from the query's m-th subvector to every
    codeword (M*K floats — a few hundred doubles per query, broadcast
    as literals).  A corpus row's approximate squared distance to the
    query is then ``sum_m table[m][code_m]`` — M constant-array
    lookups per (row, query), all whole-stage codegen'd; the original
    vectors are never touched, which is the entire point: search runs
    on the compressed representation.

    ``queries`` is a BOUNDED list of (query_id, vector) pairs —
    every query adds an M*K-literal array expression to the plan, so
    the bound is enforced (``MAX_LITERAL_QUERIES``): past it,
    driver-side plan construction and codegen blow up with no clear
    error. Larger query sets belong on ``pq_topk_arrow``, which
    ships ONE (Q, M, K) tensor instead of Q expression trees.
    Returns ``(query_id, neighbor_id, dist, rank)``; rank orders by
    (rounded dist ASC, neighbor_id ASC) so the result is
    engine-stable.  Self-matches excluded.

    Scale shape: corpus scanned once, no shuffle before the top-k
    window; what the window shuffles is Q x N fixed-width structs
    (the codes and tables are gone by then).  With Q bounded and the
    rounded-dist ordering, the plan is one Exchange keyed by
    query_id.
    """
    if len(queries) > MAX_LITERAL_QUERIES:
        raise ValueError(
            f"pq_topk takes at most {MAX_LITERAL_QUERIES} queries — "
            f"got {len(queries)}; each query is an M*K-literal "
            "expression tree (plan construction and codegen scale "
            "with it). Use pq_topk_arrow for large query sets."
        )
    m_sub = len(codebooks)
    n_cw = len(codebooks[0])
    sub = len(codebooks[0][0])

    def table(qvec: list[float]) -> list[list[float]]:
        return [
            [
                sum(
                    (float(qvec[m * sub + s]) - float(cw[s])) ** 2
                    for s in range(sub)
                )
                for cw in codebooks[m]
            ]
            for m in range(m_sub)
        ]

    code_at = [
        F.element_at(F.col(codes_col), m + 1).cast("int") + 1
        for m in range(m_sub)
    ]
    per_query = []
    for qid, qvec in queries:
        t = table(qvec)
        dist = sum(
            F.element_at(
                F.array(*[F.lit(float(x)) for x in t[m]]), code_at[m]
            )
            for m in range(m_sub)
        )
        per_query.append(
            F.struct(
                F.lit(int(qid)).cast("long").alias("query_id"),
                F.round(dist, round_digits).alias("dist"),
            )
        )
    scored = (
        codes.select(
            F.col(id_col).alias("neighbor_id"),
            F.explode(F.array(*per_query)).alias("q"),
        )
        .select("q.query_id", "neighbor_id", "q.dist")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def pq_topk_arrow(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """Many-query ADC search over PQ codes — the deploy path of
    ``pq_topk`` when the query set is thousands of vectors (the
    literal-table variant's expression tree grows with Q; this one
    ships ONE (Q, M, K) distance-table tensor per executor).

    Same asymmetric contract: queries stay uncompressed, the corpus is
    scanned as codes only. Per Arrow batch the scorer does M gathers
    (``tables[:, m, codes[:, m]]`` — pure numpy indexing, no float
    vector math) and a per-batch local top-k, so the shuffle carries
    ~(Q * n_local * partitions) fixed-width rows, not Q * N. Output
    contract identical to ``pq_topk`` (rounded dist ASC, neighbor ASC,
    self-matches excluded) so the two share an oracle.

    At 100 TB: the codes table is M bytes/vector instead of 4*D — the
    16x compression is what lets a billion-vector corpus sit in
    executor page cache; what ships in the task closure is the RAW
    query matrix (Q*D doubles — the documented only-per-Q
    allocation), NOT the (Q, M, K) distance tensor: at deploy-shaped
    parameters (200k queries, M=32, K=256) that tensor is ~13 GB and
    driver-materializing it OOMs before the job starts (measured by
    bench_scale.py annrss, round 5) — tables are built per
    (task, query-block) instead, a ~50 MFLOP transient per block.
    """
    import numpy as np
    import pandas as pd

    m_sub = len(codebooks)
    n_cw = len(codebooks[0])
    sub = len(codebooks[0][0])

    qids, qm = _collect_queries(
        queries, id_col, vec_col, max_rows=max_query_rows
    )
    cb = np.array(codebooks, dtype=np.float64)  # (M, K, sub)

    out_schema = "query_id long, neighbor_id long, dist double"

    # bound BOTH per-task allocations on the query axis: the
    # (q_block, M, K) distance-table block (~67 MB at M=32, K=256)
    # and the (q_block x batch) score matrix (~80 MB vs a 10k-row
    # Arrow batch) — chunking changes nothing semantically (top-k is
    # per query row).
    q_block = 1024

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(pdf[codes_col].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            n_local = min(k + 1, len(ids))  # +1 survives self-match drop
            for q0 in range(0, len(qids), q_block):
                qsub = qm[q0 : q0 + q_block].reshape(-1, m_sub, sub)
                tb = _pq_query_tables(qsub, cb)
                acc = np.zeros((len(tb), len(ids)))
                for m in range(m_sub):
                    # .take on the contiguous (block, K) slice is the
                    # FAST gather: the mixed-index form
                    # ``tb[:, m, cm[:, m]]`` goes through numpy's
                    # general advanced-indexing path and measured 9x
                    # slower at deploy shapes (bench_scale annrss r5)
                    np.add(
                        acc, tb[:, m, :].take(cm[:, m], axis=1), out=acc
                    )
                # round BEFORE the local top-k so selection uses the
                # same (rounded dist, id) order the global window and
                # the oracle rank by — two raw dists <0.5e-6 apart
                # that round equal must not drop the lower id locally
                np.round(acc, round_digits, out=acc)
                # composite (dist, id) local top-k: PQ distances tie
                # structurally, a dist-only argpartition keeps an
                # arbitrary tied subset (see _adc_local_topk)
                out_d, out_i = _adc_local_topk(acc, ids, n_local)
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(
                            qids[q0 : q0 + q_block], n_local
                        ),
                        "neighbor_id": out_i.ravel(),
                        "dist": out_d.ravel(),
                    }
                )

    local = codes.select(id_col, codes_col).mapInPandas(
        score, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def pq_assign_arrow(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized twin of ``pq_assign`` — same contract, Arrow-batched
    numpy instead of M*K generated scalar expressions.

    The Catalyst version's giant projection is correct but pays a
    ~2 s whole-stage-codegen compile per plan (the generated method
    is past the JIT huge-method limit, so the compiled code isn't
    even fast); at M=4, K=16 the per-row work is 4k flops, which is
    exactly the dense-arithmetic shape where one numpy broadcast per
    Arrow batch wins (the cosine_topk_arrow argument). Ties go to the
    lowest codeword (argmin's first-hit rule == the SQL row_number
    order), distances accumulate in float64, and recon_err rounds to
    6 like the Catalyst twin, so the two paths are bit-identical and
    share oracles.
    """
    import numpy as np
    import pandas as pd

    m_sub = len(codebooks)
    sub = len(codebooks[0][0])
    cb = np.array(codebooks, dtype=np.float64)  # (M, K, sub)

    out_schema = f"{id_col} long, codes array<long>, recon_err double"

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vs = vm.reshape(len(vm), m_sub, sub)  # (B, M, sub)
            # (B, M, K) squared distances, then per-subspace argmin
            d2 = ((vs[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
            codes = d2.argmin(axis=2)  # first minimum -> lowest codeword
            best = np.sqrt(np.take_along_axis(d2, codes[:, :, None], axis=2))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "codes": list(codes.astype(np.int64)),
                    "recon_err": np.round(best[:, :, 0].sum(axis=1), 6),
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        assign, schema=out_schema
    )


def arrow_cell_assign(u_df: DataFrame, unit_cents: list[list[float]]) -> DataFrame:
    """GEMM-argmax cell assignment over a ``(id, u)`` unit-vector
    frame — the LARGE-CODEBOOK twin of ``ivf_assign`` (whose k
    dot-aggregate Catalyst expressions cap usable codebook size at
    ~1k cells; this runs one (batch x k) GEMM per Arrow batch).
    Argmax first-hit == ties to the lowest cell, matching
    ``ivf_assign``'s array_position order. Shared by
    ``semantic_dedup(arrow=True)`` and ``SemanticIndex(arrow=True)``.
    """
    import numpy as np
    import pandas as pd

    cm = np.array(unit_cents, dtype=np.float64)

    def assign_fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf["u"].tolist(), dtype=np.float64)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "u": pdf["u"],
                    "cell": (vm @ cm.T).argmax(axis=1),
                }
            )

    return u_df.mapInPandas(
        assign_fn, schema="id long, u array<double>, cell long"
    )


def arrow_cell_pairs(
    assigned: DataFrame,
    threshold: float,
    round_digits: int = 4,
    max_cell: int | None = None,
    pair_block: int = 1024,
) -> DataFrame:
    """Intra-cell near-dup pairs over an ``(id, u, cell)`` frame via
    per-cell BLOCK-CHUNKED GEMMs inside applyInPandas (grouped by
    cell — the shuffle the Catalyst pair join pays anyway).

    Per-task score-matrix bound: the GEMM runs over ROW BLOCKS of the
    cell (``pair_block``), so peak memory is O(block x |cell|)
    float64 — NOT |cell|² (with max_cell unset, an unchunked matrix
    would re-create exactly the task-OOM cliff the cap exists to
    prevent; the Catalyst twin degrades gracefully via a
    shuffle-backed join, so the deploy path must too). Default 1024 x
    a 100k-row cell ≈ 0.8 GB — the same knob as pq_topk_arrow's
    q_block. applyInPandas still holds the cell's VECTORS in one task
    (inherent to grouping); the quadratic score matrix was the
    allocation that outgrew them. Cells past ``max_cell`` contribute
    NO pairs (their members surface as singletons downstream) — the
    exact ``semantic_dedup`` cap semantics."""
    import numpy as np
    import pandas as pd

    def cell_pairs(pdf):
        if len(pdf) < 2 or (max_cell is not None and len(pdf) > max_cell):
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "sim": pd.Series(dtype="float64")}
            )
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        vm = np.array(pdf["u"].tolist(), dtype=np.float64)[order]
        n = len(ids)
        out_a, out_b, out_s = [], [], []
        for lo in range(0, n - 1, pair_block):
            hi = min(lo + pair_block, n)
            # rows lo..hi scored against every LATER row: the
            # (i < j) half of the matrix, one block-slab at a time
            sims = np.round(vm[lo:hi] @ vm[lo:].T, round_digits)
            ii, jj = np.nonzero(sims >= threshold)
            # strict upper triangle: the slab's columns start at
            # global row lo, so global col (lo + jj) exceeds global
            # row (lo + ii) exactly when jj > ii
            keep = jj > ii
            ii, jj = ii[keep], jj[keep]
            out_a.append(ids[lo + ii])
            out_b.append(ids[lo + jj])
            out_s.append(sims[ii, jj])
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "sim": pd.Series(dtype="float64")}
            )
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "sim": np.concatenate(out_s),
            }
        )

    return assigned.select("id", "u", "cell").groupBy("cell").applyInPandas(
        cell_pairs, "id_a long, id_b long, sim double"
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
    max_cell: int | None = None,
    stats_out: dict | None = None,
    arrow: bool = False,
    pair_block: int = 1024,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    by nearest centroid, compare pairs ONLY within a cluster, chain
    near-identical items into groups, keep one representative each.
    Text-level dedup misses paraphrases and re-encodings; this is the
    embedding-space answer, and the centroid pre-partition is what
    keeps it off the O(n^2) cliff — the corpus-wide pair join becomes
    per-cell joins bounded by cell size (same skew argument as LSH
    ``max_bucket``: k-means cells of a well-spread codebook are the
    bucketing).

    Returns one row per input vector: ``(id, cell, group, keep)``
    where ``group`` is the min-id member of the item's near-dup
    chain (connected components over the intra-cell pair graph) and
    ``keep`` marks the representative. Cell assignment is cosine
    argmax (vectors unit-normalized here; centroids normalized
    driver-side), ties to the lowest cell like ``ivf_assign``.

    Scale shape: one narrow GEMM-free assignment projection, one
    cell-keyed self-join (bounded output), then hash-min CC in
    O(log diameter) rounds — near-dup chains are short, so this
    converges in 2-3 rounds. Nothing driver-side but the codebook.

    ``max_cell`` is the opt-in hot-cell guard, the semantic twin of
    LSH ``max_bucket`` / inverted-index ``max_posting``: the
    intra-cell pair join is O(|cell|²) per cell, and a DEGENERATE
    codebook (or an embedding-collapsed corpus) funnels everything
    into one quadratic cell. With ``max_cell`` set, cells holding
    more than that many vectors contribute NO pairs — their members
    come out as singletons (keep=true), exactly what the oracle of
    the capped variant models. Cap engagement is a retrain signal
    for the codebook, not business as usual; default None = exact
    (the ADVICE r2 stance: caps are opt-in, never silent).

    ``arrow=True`` is the LARGE-CODEBOOK deploy path: SemDeDup at
    scale needs k ≈ the corpus's natural cluster count (the paper
    runs 50k clusters at 100M docs) to keep cells small, and at that
    k the Catalyst formulation collapses twice over — assignment
    builds k dot-aggregate expressions (plan construction alone is
    minutes past ~1k centroids), and the pair join evaluates one
    interpreted zip_with dot PER PAIR. The arrow path assigns cells
    with one GEMM argmax per Arrow batch and scores each cell with
    BLOCK-CHUNKED GEMMs inside applyInPandas (grouped by cell — the
    shuffle the Catalyst join pays anyway; peak task memory is
    O(block × |cell|), never |cell|²). Same semantics
    (argmax ties to the lowest cell, sims rounded then thresholded,
    max_cell cut identical); differs only by float-sum association
    inside the dot products, so exact oracle twins keep the default
    Catalyst path and the probe/deploy scale runs use arrow
    (equality on the planted fixture asserted in
    tests/test_similarity.py).
    """
    import math

    from updater_spark.operators.clusters import connected_components

    unit_cents = []
    for c in centroids:
        nrm = math.sqrt(sum(float(x) * float(x) for x in c)) or 1.0
        unit_cents.append([float(x) / nrm for x in c])

    u = corpus.select(
        F.col(id_col).alias("id"),
        unit(as_double(F.col(vec_col))).alias("u"),
    )
    # persist() the assignment: it feeds BOTH sides of the pair
    # self-join plus the final output join, and an unmaterialized
    # lineage re-evaluates the unit()/cast lambda tree per candidate
    # PAIR — with the norm aggregate re-run per element inside the
    # transform lambda, that's O(pairs * d^2) interpreted work
    # (measured 20 s for 500 vectors at sf0.1; ~1 s materialized).
    if arrow:
        assigned = arrow_cell_assign(u, unit_cents).persist()
        pairs = arrow_cell_pairs(
            assigned, threshold, round_digits, max_cell, pair_block
        )
    else:
        assigned = ivf_assign(
            u, unit_cents, id_col="id", vec_col="u", out_col="cell"
        ).persist()
        paired = assigned
        if max_cell is not None:
            # hot-cell guard: cells past the cap are excluded from the
            # pair join wholesale (one small count agg + a broadcast-able
            # semi filter on cell id — never a per-row window)
            ok_cells = (
                assigned.groupBy("cell")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") <= max_cell)
                .select("cell")
            )
            paired = assigned.join(F.broadcast(ok_cells), "cell")
        a = paired.select(
            F.col("id").alias("id_a"), F.col("u").alias("ua"), "cell"
        )
        b = paired.select(
            F.col("id").alias("id_b"), F.col("u").alias("ub"), "cell"
        )
        sim = F.round(dot(F.col("ua"), F.col("ub")), round_digits)
        pairs = (
            a.join(b, "cell")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", sim.alias("sim"))
            .filter(F.col("sim") >= threshold)
        )
    # connected_components is EAGER (localCheckpoint + count per
    # round), so by the time it returns, every consumer of the
    # persisted assignment that fans out per PAIR has already run —
    # the cache can be released here instead of leaking pinned
    # partitions into a long-lived session (ADVICE r3). The final
    # output join below re-derives the assignment lazily from
    # lineage, which is per-ROW work (one unit()/argmax projection
    # pass), not the per-pair fan-out the persist exists to prevent.
    if stats_out is not None:
        # scale telemetry (bench_scale.py semantic): cell occupancy
        # distribution — THE anti-O(n²) observable — and pair width
        sizes = (
            assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.count(F.lit(1)).alias("cells"),
                F.max("n").alias("max_cell_size"),
                F.expr("percentile(n, 0.99)").alias("p99_cell_size"),
                F.sum(F.col("n") * (F.col("n") - 1) / 2).alias(
                    "pair_candidates"
                ),
            )
            .collect()[0]
        )
        stats_out.update(sizes.asDict())
        pairs = pairs.persist()
        stats_out["pairs_above_threshold"] = pairs.count()
    cc = connected_components(
        pairs, stats_out=stats_out if stats_out is not None else None
    )
    assigned.unpersist()
    if stats_out is not None:
        pairs.unpersist()
    return (
        assigned.join(cc, assigned.id == cc.id, "left")
        .select(
            assigned.id.alias("id"),
            F.col("cell"),
            F.coalesce(cc.component, assigned.id).alias("group"),
            (F.coalesce(cc.component, assigned.id) == assigned.id).alias(
                "keep"
            ),
        )
    )


def ivfpq_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ index build (Jegou et al. 2011, the full construction):
    assign each vector to its nearest coarse centroid, then
    product-quantize the RESIDUAL ``v - centroid[cell]``.

    Quantizing residuals instead of raw vectors is what makes PQ
    usable on clustered data: raw-vector PQ collapses every member of
    a tight cluster onto the same codes (measured recall@10 0.005 on
    the 1M-vector clustered probe — ADC then ranks same-cluster
    neighbors by id, not distance), while residuals are centered at
    the origin where the codebook's resolution actually discriminates
    neighbors.

    Cell = argmax dot(v, centroid) (cosine order for unit-normalized
    inputs; ties to the lowest cell). Codes = per-subspace argmin of
    Euclidean distance in residual space (ties to the lowest
    codeword). Returns ``(id, cell long, codes array<long>)`` —
    cell + M bytes per vector, the layout to write partitioned by
    ``cell`` for a disk-backed index (partition pruning then skips
    unprobed cells, the ivf_assign/write_ivf_index story).

    Arrow-batched numpy throughout (one GEMM for cells, one broadcast
    subtract, one (B, M, K) argmin per batch).
    """
    import numpy as np
    import pandas as pd

    m_sub = len(codebooks)
    sub = len(codebooks[0][0])
    cm_ = np.array(centroids, dtype=np.float64)  # (C, D)
    cb = np.array(codebooks, dtype=np.float64)  # (M, K, sub)

    out_schema = f"{id_col} long, cell long, codes array<long>"

    def assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cells = (vm @ cm_.T).argmax(axis=1)
            resid = (vm - cm_[cells]).reshape(len(vm), m_sub, sub)
            d2 = ((resid[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(
                axis=3
            )
            codes = d2.argmin(axis=2)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cell": cells.astype(np.int64),
                    "codes": list(codes.astype(np.int64)),
                }
            )

    return (
        corpus.select(id_col, vec_col)
        .mapInPandas(assign, schema=out_schema)
        .withMetadata(
            "cell", {"ivfpq": ivfpq_index_id(centroids, codebooks)}
        )
    )


def ivfpq_topk(
    index: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    repartition_by_cell: bool = True,
    identity: str | None = None,
    allow_unverified: bool = False,
    max_query_rows: int = MAX_QUERY_ROWS,
) -> DataFrame:
    """ADC search over an IVF-PQ index: each query probes its
    ``nprobe`` nearest coarse cells and scores ONLY their members,
    using a per-(query, cell) distance table over the query's
    residual against that cell — ``dist = sum_m T[q,cell][m][code_m]``
    approximates ``||q - x||^2``.

    The corpus side is the ``ivfpq_assign`` output (cell + codes, no
    floats); it is scanned once and never shuffled before the final
    top-k window. Tables are built lazily per (cell, query-block) as
    each Arrow batch reveals which cells it holds — at most
    Q * nprobe tables exist, and a query never scores a vector
    outside its probed cells (the IVF contract). Output/ordering
    contract matches ``pq_topk`` (rounded dist ASC, neighbor ASC,
    self-matches excluded).

    At scale this is the billion-vector layout: cells partition the
    index on disk (partition pruning skips unprobed cells when the
    probe set is pushed down as a cell filter), codes are M bytes,
    and the only broadcast state is centroids + codebooks + the query
    matrix.

    Identity policy (mirrors ``ivf_topk``): an index whose ``cell``
    column carries a quantizer identity is verified against the given
    centroids+codebooks; when NO identity is present (a plain
    ``spark.read.parquet`` of the cell-partitioned layout drops
    column metadata) the search REFUSES to run rather than silently
    disarming the guard — read the index via ``read_ivfpq_index``,
    pass ``identity=`` (e.g. from an ``IvfPqIndex`` quantizer table),
    or opt out explicitly with ``allow_unverified=True``.
    """
    import numpy as np
    import pandas as pd

    m_sub = len(codebooks)
    sub = len(codebooks[0][0])
    cm_ = np.array(centroids, dtype=np.float64)
    cb = np.array(codebooks, dtype=np.float64)

    qids, qm = _collect_queries(
        queries, id_col, vec_col, max_rows=max_query_rows
    )
    n_probe = min(nprobe, len(centroids))
    # nprobe nearest cells per query, ties to the lowest cell id
    # (stable argsort on -sim). The coarse GEMM runs in query BLOCKS:
    # a full (Q, C) similarity matrix at 200k queries × 1024 cells is
    # ~1.6 GB of float64 on the driver before the job starts; blocking
    # keeps it at (_Q_BLOCK, C) ≈ 64 MB while the (Q, nprobe) probe
    # table — the part that must exist whole — is ~13 MB.
    probe = np.empty((len(qids), n_probe), dtype=np.int64)
    for q0 in range(0, len(qids), _Q_BLOCK):
        sims_b = qm[q0 : q0 + _Q_BLOCK] @ cm_.T
        probe[q0 : q0 + _Q_BLOCK] = np.argsort(
            -sims_b, axis=1, kind="stable"
        )[:, :n_probe]
    # per-cell list of probing query indices
    probers: dict[int, np.ndarray] = {}
    for c in np.unique(probe):
        qsel = np.nonzero((probe == c).any(axis=1))[0]
        probers[int(c)] = qsel

    out_schema = "query_id long, neighbor_id long, dist double"

    # per-task score-matrix bound, same knob as pq_topk_arrow
    q_block = 1024

    def score(batches):
        tables: dict[int, np.ndarray] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            cm_codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            ids = pdf[id_col].to_numpy()
            for c in np.unique(cells):
                qsel = probers.get(int(c))
                if qsel is None or not len(qsel):
                    continue
                mask = cells == c
                cids = ids[mask]
                ccodes = cm_codes[mask]
                n_local = min(k + 1, len(cids))
                # chunk the probing-query axis exactly as
                # pq_topk_arrow does — for BOTH allocations: the
                # (|qsel|, |cell|) float64 acc AND the (|qsel|, M, K)
                # residual distance table. Caching whole-cell tables
                # across batches is only safe when the cell's prober
                # set is small (<= _TABLE_CACHE_QSEL, ~17 MB at M=32,
                # K=256); at deploy query counts (200k queries x
                # nprobe probes spread over the codebook) whole-cell
                # tables are ~100 MB EACH and a task hosting a few
                # cells OOMs the executor — measured by
                # bench_scale.py annrss (round 5). Large prober sets
                # rebuild a (q_block, M, K) transient per block
                # instead (~50 MFLOPs, noise next to the gathers).
                cacheable = len(qsel) <= _TABLE_CACHE_QSEL
                t = tables.get(int(c)) if cacheable else None
                if cacheable and t is None:
                    qres = (qm[qsel] - cm_[c]).reshape(
                        len(qsel), m_sub, sub
                    )
                    t = _pq_query_tables(qres, cb)
                    tables[int(c)] = t
                for q0 in range(0, len(qsel), q_block):
                    if t is not None:
                        tq = t[q0 : q0 + q_block]
                    else:
                        qres = (
                            qm[qsel[q0 : q0 + q_block]] - cm_[c]
                        ).reshape(-1, m_sub, sub)
                        tq = _pq_query_tables(qres, cb)
                    acc = np.zeros((len(tq), len(cids)))
                    for m in range(m_sub):
                        # contiguous-slice .take — the fast gather
                        # (9x vs mixed fancy indexing, see
                        # pq_topk_arrow's scorer)
                        np.add(
                            acc,
                            tq[:, m, :].take(ccodes[:, m], axis=1),
                            out=acc,
                        )
                    # round BEFORE local selection: the global window
                    # and the oracle rank by (rounded dist, id), so
                    # local top-k must use the same composite order
                    np.round(acc, round_digits, out=acc)
                    out_d, out_i = _adc_local_topk(acc, cids, n_local)
                    yield pd.DataFrame(
                        {
                            "query_id": np.repeat(
                                qids[qsel[q0 : q0 + q_block]], n_local
                            ),
                            "neighbor_id": out_i.ravel(),
                            "dist": out_d.ravel(),
                        }
                    )

    # staleness guard: an index carrying a quantizer identity (set by
    # ivfpq_assign, restored from the sidecar by read_ivfpq_index, or
    # passed as identity=) must match the centroids+codebooks this
    # search builds its tables from — silently mixing them degrades
    # recall with no error otherwise. And identity ABSENCE is not a
    # pass: a plain parquet read of the partitioned layout drops the
    # metadata, which would otherwise disarm the guard silently
    # (ivf_topk's policy, mirrored here).
    meta = (
        next(
            (f.metadata for f in index.schema.fields if f.name == "cell"),
            None,
        )
        or {}
    )
    ident = meta.get("ivfpq") or identity
    if ident is not None and ident != ivfpq_index_id(centroids, codebooks):
        raise ValueError(
            "stale IVF-PQ index: the index was built from different "
            "centroids/codebooks than this search was given — rebuild "
            "with ivfpq_assign or pass the quantizer the index was "
            "built with"
        )
    if ident is None and not allow_unverified:
        raise ValueError(
            "unverifiable IVF-PQ index: the 'cell' column carries no "
            "quantizer identity (partitioned parquet writes drop "
            "column metadata) — read the index via read_ivfpq_index(), "
            "pass identity=, or opt out with allow_unverified=True"
        )
    # probe-set pruning: no query scores a cell outside its probe
    # set, so filtering to the union of probe sets is a semantic
    # no-op — and on a cell-partitioned disk index (write_ivfpq_index
    # layout) it becomes PartitionFilters: unprobed cell directories
    # are never read.
    probed_cells = sorted(int(c) for c in np.unique(probe))
    src = index.select(id_col, "cell", "codes").filter(
        F.col("cell").isin(probed_cells)
    )
    # The per-task table cache is keyed by cell: with cells scattered
    # across partitions every task eventually builds ~all Q*nprobe
    # tables. Co-locating each cell in one partition first (a shuffle
    # of just id+cell+codes — a few bytes/row) bounds the cache at
    # cells-per-partition tables.
    if repartition_by_cell:
        # sortWithinPartitions makes each cell's rows CONTIGUOUS, so a
        # cell spans ~ceil(|cell|/arrow_batch) batches instead of all
        # of them — large-Q table (re)builds happen once per cell, not
        # once per (cell, batch); an in-memory sort of the task's few
        # bytes/row codes, no extra shuffle
        src = src.repartition("cell").sortWithinPartitions("cell")
    local = src.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        local.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def refine_topk(
    shortlist: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 4,
) -> DataFrame:
    """Exact re-rank of an ANN shortlist (the FAISS "refine" stage):
    take any candidate set ``(query_id, neighbor_id)`` — from IVF-PQ
    ADC, LSH, anything recall-limited — fetch ONLY those candidates'
    raw vectors, score them exactly, and keep the true top-k.

    This is how a compressed index gets exact-ranking quality without
    exact-ranking cost: the shortlist bounds the vectors touched to
    |shortlist| ≈ Q * shortlist_k rows (a semi-join against the
    corpus, shuffled by id — never a corpus scan), and the final
    quality equals the shortlist's RECALL, not its ranking precision.
    Measured on the 1M clustered probe: raw ADC ranking recall@10
    ~0.3, the same shortlist refined ~the coarse-cell recall.

    Output contract matches ``cosine_topk`` (rounded sim DESC,
    neighbor ASC, self-matches excluded).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit(as_double(F.col(vec_col))).alias("qv"),
    )
    cand = shortlist.select("query_id", "neighbor_id").distinct()
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        unit(as_double(F.col(vec_col))).alias("cv"),
    )
    sim = dot(F.col("qv"), F.col("cv"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


IVFPQ_CODEBOOK_SIDECAR = "_IVFPQ_CODEBOOK"


def ivfpq_index_id(
    centroids: list[list[float]], codebooks: list[list[list[float]]]
) -> str:
    """Stable identity of an IVF-PQ quantizer — md5 over the exact
    float64 bytes of BOTH the coarse centroid matrix and the residual
    codebook tensor (ADC tables depend on both; a search against an
    index built from either different one silently degrades recall)."""
    import hashlib

    import numpy as np

    h = hashlib.md5()
    h.update(np.ascontiguousarray(centroids, dtype=np.float64).tobytes())
    h.update(np.ascontiguousarray(codebooks, dtype=np.float64).tobytes())
    return h.hexdigest()


def write_ivfpq_index(
    index: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
) -> None:
    """Persist an ``ivfpq_assign``-ed corpus as a cell-partitioned
    parquet index — the disk layout where the probe-set filter
    becomes PartitionFilters and unprobed cells are never read. The
    quantizer identity goes into an ``_IVFPQ_CODEBOOK`` sidecar (the
    ``write_ivf_index`` lesson: partitionBy drops partition-column
    metadata on read, so identity in column metadata would silently
    vanish and the staleness guard would never fire)."""
    index.write.partitionBy("cell").parquet(path)
    spark = index.sparkSession
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark._jvm
    sidecar = jvm.org.apache.hadoop.fs.Path(path, IVFPQ_CODEBOOK_SIDECAR)
    out = fs.create(sidecar, True)
    try:
        out.write(
            bytearray(ivfpq_index_id(centroids, codebooks).encode("utf-8"))
        )
    finally:
        out.close()


def read_ivfpq_index(spark, path: str) -> DataFrame:
    """Read a ``write_ivfpq_index`` layout, restoring the quantizer
    identity from the sidecar into the cell column's metadata so
    ``ivfpq_topk`` verifies it against the centroids+codebooks it is
    given."""
    fs, _ = _hadoop_fs(spark, path)
    jvm = spark._jvm
    sidecar = jvm.org.apache.hadoop.fs.Path(path, IVFPQ_CODEBOOK_SIDECAR)
    if not fs.exists(sidecar):
        raise FileNotFoundError(
            f"{path} has no {IVFPQ_CODEBOOK_SIDECAR} sidecar — was this "
            "index written with write_ivfpq_index()?"
        )
    stream = fs.open(sidecar)
    try:
        ident = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        ).decode("utf-8")
    finally:
        stream.close()
    return spark.read.parquet(path).withMetadata(
        "cell", {"ivfpq": ident}
    )


def _adc_local_topk(acc, ids, n_local):
    """Per-row local top-``n_local`` of an ADC score matrix under the
    COMPOSITE order (dist ASC, neighbor_id ASC) — returns
    ``(dists, ids)`` of shape (rows, n_local).

    PQ distances tie STRUCTURALLY (identical codes => identical ADC
    sums), so an argpartition on distance alone keeps an arbitrary
    subset of the tied candidates and the global (dist, id) window
    then ranks different survivors run to run — memory vs disk
    searches of the same index returned different tied neighbors.
    Selection: argpartition by dist with a 64-wide margin, composite-
    sort the narrow slice (two stable argsorts), and fall back to a
    full-row composite sort for the rare row whose boundary tie
    extends past the margin (exactness guard, not a heuristic).
    """
    import numpy as np

    n_rows, b = acc.shape
    take = min(b, n_local + 64)
    if take < b:
        part = np.argpartition(acc, take - 1, axis=1)[:, :take]
    else:
        part = np.broadcast_to(np.arange(b), (n_rows, b)).copy()
    pdist = np.take_along_axis(acc, part, axis=1)
    pids = ids[part]
    # composite sort of the slice: stable sort by id, then by dist
    o1 = np.argsort(pids, axis=1, kind="stable")
    pdist = np.take_along_axis(pdist, o1, axis=1)
    pids = np.take_along_axis(pids, o1, axis=1)
    o2 = np.argsort(pdist, axis=1, kind="stable")
    pdist = np.take_along_axis(pdist, o2, axis=1)
    pids = np.take_along_axis(pids, o2, axis=1)
    out_d = pdist[:, :n_local]
    out_i = pids[:, :n_local]
    if take < b:
        kth = out_d[:, -1]
        # ties at the boundary value beyond the slice -> full re-sort
        full_ties = (acc == kth[:, None]).sum(axis=1)
        slice_ties = (pdist == kth[:, None]).sum(axis=1)
        for r in np.nonzero(full_ties > slice_ties)[0]:
            o = sorted(range(b), key=lambda j: (acc[r, j], ids[j]))[
                :n_local
            ]
            out_d[r] = acc[r, o]
            out_i[r] = ids[o]
    return out_d, out_i


def hard_negatives_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_query_rows: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar corpus vectors with a DIFFERENT
    label — the "hard" negatives that sit near the decision boundary
    (in-batch random negatives are mostly easy; retrieval-training
    recipes like DPR, Karpukhin et al. 2020, mine these explicitly).

    Same engine shape as ``cosine_topk_arrow`` (one narrow
    mapInPandas GEMM scan of the corpus, per-batch local top-k, a
    window finishes globally), with the label exclusion applied as a
    vectorized mask on the score matrix BEFORE the local top-k — so
    the per-batch candidate set is exact and self-matches are
    excluded for free (a row always shares its own label). A NULL
    corpus label never equals any query label (NaN compare), so such
    a row acts as a universal negative — filter upstream if that is
    not intended. Symmetrically, a NULL-labeled QUERY row matches no
    label at all, INCLUDING its own: every corpus row (itself too,
    at sim 1.0) ranks as its negative — label your queries.

    Scores are rounded to 4 decimals BEFORE the per-batch local
    top-k and local ties break by neighbor_id (via _adc_local_topk's
    composite order) — selecting on raw floats and rounding after
    can drop the lower-id member of a rounded tie that the global
    (sim DESC, id ASC) window and the oracle would keep.

    Returns ``(query_id, neighbor_id, sim, rank)``, exact (the
    oracle-friendly baseline; at larger corpora compose the same mask
    with the IVF probe path and accept recall < 1)."""
    import numpy as np
    import pandas as pd

    qids, qm = _collect_unit_queries(
        queries, id_col, vec_col, max_rows=max_query_rows or MAX_QUERY_ROWS
    )
    # Arrow collect, not Rows — at MAX_QUERY_ROWS the boxed-Row path
    # would allocate 4x the bytes for the same two long columns (the
    # _collect_queries rationale)
    tbl = queries.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(label_col).cast("long").alias("lab"),
    ).toArrow()
    lab_map = dict(
        zip(tbl.column("id").to_numpy(), tbl.column("lab").to_numpy())
    )
    # float64 so a NULL label becomes NaN and never equals anything —
    # int64 coercion would raise on NULLs instead of treating the row
    # as the universal negative the docstring promises
    qlabels = np.array(
        [lab_map[i] for i in qids], dtype=np.float64
    )

    out_schema = "query_id long, neighbor_id long, sim double"
    q_block = 1024

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cm = cm / np.linalg.norm(cm, axis=1, keepdims=True)
            ids = pdf[id_col].to_numpy()
            # float64, not int64: NULL corpus labels arrive as None/NaN
            # and an int64 coercion raises inside the stage; as NaN the
            # row simply never matches and stays a universal negative
            clabels = pd.to_numeric(
                pdf[label_col], errors="coerce"
            ).to_numpy(dtype=np.float64)
            n_local = min(k, len(ids))
            for q0 in range(0, len(qids), q_block):
                qb = qm[q0 : q0 + q_block]
                sims = cm @ qb.T  # (batch, q_block)
                # in-place masked assignment: np.where would COPY the
                # (batch x q_block) float64 score matrix per block —
                # measured 85% overhead over the plain top-k; the
                # boolean mask alone is 8x smaller and writes in place
                sims[
                    clabels[:, None] == qlabels[q0 : q0 + q_block][None, :]
                ] = -np.inf
                # round BEFORE the local selection and break ties by
                # id: argpartition on raw floats can keep the higher-id
                # member of a rounded tie that the global window (sim
                # DESC, id ASC) would rank inside the top-k. Negating
                # the rounded sims turns (sim DESC, id ASC) into
                # _adc_local_topk's native (dist ASC, id ASC); masked
                # -inf becomes +inf and sorts last.
                neg = -np.round(sims.T, 4)  # (q_block, batch)
                out_d, out_i = _adc_local_topk(neg, ids, n_local)
                svals = -out_d.ravel()
                qcol = np.repeat(qids[q0 : q0 + q_block], n_local)
                ncol = out_i.ravel()
                keep = np.isfinite(svals)  # batches thin on other labels
                yield pd.DataFrame(
                    {
                        "query_id": qcol[keep],
                        "neighbor_id": ncol[keep],
                        "sim": svals[keep],
                    }
                )

    local = corpus.select(id_col, vec_col, label_col).mapInPandas(
        score, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return local.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def mmr_select(
    candidates: DataFrame,
    query_vec: list[float],
    k: int = 10,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_candidates: int | None = None,
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    greedily pick ``k`` candidates maximizing

        mmr(d) = lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)

    — relevance to the query traded against redundancy with what is
    already selected. The diversity-aware selection step of retrieval
    and training-data curation (a plain top-k returns near-duplicate
    neighbors; MMR spends the budget on coverage).

    Spark-first honesty: MMR is inherently SEQUENTIAL (step t depends
    on the selected set of step t-1), so it is a RERANK stage over a
    BOUNDED candidate set — run it after an ANN/filter stage has cut
    the corpus to <= max_candidates rows (the MAX_QUERY_ROWS driver
    memory model), never over the corpus itself. The candidate matrix
    collects via Arrow once; the k x N score loop is numpy on the
    driver — k*N float ops, microseconds at any sane k.

    Determinism contract (the oracle-exactness discipline): rel and
    every pairwise sim are ROUNDED to 4 decimals before use, the mmr
    score is rounded again, and ties break on id — so the selection
    chain is a total order an unrolled-SQL oracle reproduces exactly.

    Returns (id, rel, mmr, rank) for the selected rows, rank 1..k in
    selection order. The first pick carries no diversity penalty
    (its max-sim term is 0)."""
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    ids, cm = _collect_unit_queries(
        candidates, id_col, vec_col, max_rows=max_candidates or MAX_QUERY_ROWS
    )
    if not len(ids):
        raise ValueError("no candidates to rerank")
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / np.linalg.norm(q)
    rel = np.round(cm @ q, 4)

    selected: list[int] = []
    max_sim = np.zeros(len(ids))
    taken = np.zeros(len(ids), dtype=bool)
    out = []
    for rank in range(1, min(k, len(ids)) + 1):
        mmr = np.round(lam * rel - (1.0 - lam) * max_sim, 4)
        mmr_masked = np.where(taken, -np.inf, mmr)
        best = int(np.lexsort((ids, -mmr_masked))[0])
        out.append(
            (int(ids[best]), float(rel[best]), float(mmr[best]), rank)
        )
        taken[best] = True
        selected.append(best)
        max_sim = np.maximum(max_sim, np.round(cm @ cm[best], 4))

    spark = candidates.sparkSession
    return spark.createDataFrame(
        pd.DataFrame(out, columns=[id_col, "rel", "mmr", "rank"])
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    engine: str = "catalyst",
) -> tuple[list[list[float]], DataFrame]:
    """First-class k-means (Lloyd) with an exact-replay contract —
    the clustering primitive behind the IVF/PQ training paths
    (ivf_train / pq_train run the same loop tuned for their index
    shapes), exposed standalone for corpus clustering, prototype
    selection, and diversity analysis.

    Determinism contract (the logreg_train discipline): init is the
    ``k`` lowest-id vectors, every centroid component is ROUNDED
    after each averaging step, every distance is rounded before the
    argmin, and ties break to the lowest cluster id — so the full
    iteration chain is a total order an unrolled-SQL oracle replays
    exactly. A cluster that loses all members keeps its previous
    centroid (both engines must agree on SOMETHING; dropping it
    would renumber every later cluster).

    Scale shape per iteration: one assignment scan (pure Catalyst —
    k rounded quadratic-form distances per row, argmin via
    array_position, the ivf_assign shape) and one grouped average
    (explode to (cluster, pos, val); partial aggs collapse to k*dim
    rows before the shuffle; k*dim doubles reach the driver). No
    UDFs, no per-row Python, corpus never joined to itself.

    ``engine``: ``"catalyst"`` is the oracle-replay default;
    ``"arrow"`` computes the assignment as one numpy GEMM per batch
    (same rounded-argmin semantics BY CONTRACT, the
    semantic_dedup_arrow stance) — the higher-order-function folds of
    the catalyst form run interpreted per element and measured 43k
    rows/s/iter at k=32 x dim=64; the GEMM twin measured 82k (2.3x
    end-to-end — the shared centroid-update explode bounds the gap;
    PROBES kmeans_1m) and is the deploy path.

    Returns (centroids, assignments) — assignments is
    (id, cluster, d2) under the FINAL centroids."""
    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1, got k={k} iters={iters}")
    if engine not in ("catalyst", "arrow"):
        raise ValueError(f"engine must be 'catalyst' or 'arrow', got {engine!r}")
    base = df.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("_v")
    )
    init_rows = (
        base.orderBy(id_col)
        .limit(k)
        .select(F.transform("_v", lambda x: F.round(x, round_digits)).alias("c"))
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"need at least k={k} rows, got {len(init_rows)}")
    cents = [[float(x) for x in r["c"]] for r in init_rows]

    def assign_arrow(cs: list[list[float]]) -> DataFrame:
        import numpy as np
        import pandas as pd

        cm = np.array(cs, dtype=np.float64)
        cc = (cm * cm).sum(axis=1)

        def run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                vm = np.array(pdf["_v"].tolist(), dtype=np.float64)
                d2 = np.round(
                    (vm * vm).sum(axis=1)[:, None] - 2.0 * (vm @ cm.T) + cc,
                    round_digits,
                )
                best = d2.argmin(axis=1)  # first min = lowest cluster
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "_v": pdf["_v"],
                        "cluster": best.astype("int64"),
                        "d2": d2[np.arange(len(best)), best],
                    }
                )

        return base.mapInPandas(
            run,
            schema=f"{id_col} long, _v array<double>, cluster long, d2 double",
        )

    def assign_catalyst(cs: list[list[float]]) -> DataFrame:
        ipvv = dot(F.col("_v"), F.col("_v"))
        d2s = [
            F.round(
                ipvv
                - F.lit(2.0) * dot(F.col("_v"), F.array(*[F.lit(x) for x in c]))
                + F.lit(sum(x * x for x in c)),
                round_digits,
            )
            for c in cs
        ]
        arr = F.array(*d2s)
        return base.select(
            F.col(id_col),
            F.col("_v"),
            (F.array_position(arr, F.array_min(arr)) - 1).cast("long").alias(
                "cluster"
            ),
            F.array_min(arr).alias("d2"),
        )

    assign = assign_catalyst if engine == "catalyst" else assign_arrow

    for _ in range(iters):
        asg = assign(cents)
        comp = (
            asg.select("cluster", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), round_digits).alias("cv"))
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty cluster keeps previous
        by_cluster: dict[int, dict[int, float]] = {}
        for r in comp:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["pos"])] = float(
                r["cv"]
            )
        for ci, posmap in by_cluster.items():
            new_cents[ci] = [posmap[j] for j in range(len(posmap))]
        cents = new_cents

    return cents, assign(cents).select(id_col, "cluster", "d2")
