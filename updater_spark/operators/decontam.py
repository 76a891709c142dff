"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by long n-gram collision (the GPT-3 appendix-C
/ Llama approach: any shared n-gram of ~8–13 words marks the training
doc as contaminated and it is dropped or split).

Scale shape (the whole point at 100 TB): the benchmark side is tiny —
eval suites are at most millions of grams — so its distinct gram-hash
set is BROADCAST and the corpus side is never shuffled for the probe:
scan → explode grams → broadcast-hash-semi-probe → per-doc count. The
only exchange is the per-doc-id groupBy, which carries only HIT rows
(rare by construction). Corpus text never leaves its scan partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from updater_spark.operators.dedup import (
    char_shingles_of,
    normalize_ws,
    tokenize,
    word_shingles_of,
)


def _gram_source(df, text_col, n, shingle_unit):
    """``(staged_df, grams_column)`` — unit-dispatched distinct
    n-gram array with the token/normalized column pre-materialized
    (the dedup.tokenize inline-trap rule). ``shingle_unit='char'``
    makes decontamination honest on no-whitespace scripts (a CJK
    benchmark sentence has no word 13-grams to collide on — use
    char n ~ 40-60, the same overlap width); the unit MUST match
    between corpus and benchmark, which the callers guarantee by
    threading one parameter."""
    if shingle_unit == "word":
        return tokenize(df, text_col), word_shingles_of("_toks", n)
    if shingle_unit == "char":
        return (
            df.withColumn("_norm", normalize_ws(text_col)).withColumn(
                "_chars", F.split(F.col("_norm"), "")
            ),
            char_shingles_of("_norm", n, "_chars"),
        )
    raise ValueError(
        f"shingle_unit must be 'word' or 'char', got {shingle_unit!r}"
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    shingle_unit: str = "word",
) -> DataFrame:
    """``(id_col, n_grams, n_hit_grams, contaminated)`` for every
    corpus doc: distinct word ``n``-grams, how many also occur
    anywhere in ``benchmark``, and the drop flag (≥1 shared gram).

    Grams are compared as 64-bit xxhash64 values (collision odds
    ~|grams|²/2⁶⁵ — immaterial; same trade as the dedup inverted
    index)."""
    bench_text_col = bench_text_col or text_col
    # explode_outer, NOT explode: plain explode gets an inferred
    # size(...)>0 filter (InferFiltersFromGenerate) that re-inlines
    # the whole gram construction — including the O(len²)
    # split-per-element trap — into a pushed-down Filter (measured
    # ~5× slower). Shingle arrays are never empty (≥1 partial gram),
    # so outer semantics are identical.
    bench_staged, bench_sh = _gram_source(
        benchmark, bench_text_col, n, shingle_unit
    )
    bench_grams = (
        bench_staged.select(F.explode_outer(bench_sh).alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    # ONE gram pass per corpus doc: explode carries the gram-set size
    # alongside each gram, a LEFT join against the broadcast set marks
    # hits, and a single doc-keyed groupBy produces both counts — the
    # gram build (the expensive part) is never duplicated across
    # branches (measured ~2× end-to-end vs a sizes⋈hits two-branch
    # plan at sf0.1).
    corpus_staged, corpus_sh = _gram_source(
        corpus, text_col, n, shingle_unit
    )
    exploded = (
        corpus_staged.select(
            F.col(id_col).alias("_id"),
            corpus_sh.alias("_grams"),
        )
        .select(
            "_id",
            F.size("_grams").cast("long").alias("n_grams"),
            F.explode_outer("_grams").alias("g"),
        )
        .select("_id", "n_grams", F.xxhash64("g").alias("gh"))
    )
    marked = exploded.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "gh", "left"
    )
    return (
        marked.groupBy("_id", "n_grams")
        .agg(
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias(
                "n_hit_grams"
            )
        )
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "n_hit_grams",
            (F.col("n_hit_grams") > 0).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    shingle_unit: str = "word",
) -> DataFrame:
    """The corpus minus contaminated docs (all original columns)."""
    dirty = contamination(
        corpus, benchmark, id_col, text_col, bench_text_col, n,
        shingle_unit,
    ).filter("contaminated")
    return corpus.join(
        dirty.select(F.col(id_col)), id_col, "anti"
    )


def _bloom_array(
    gram_hashes: DataFrame,
    hash_col: str,
    m_bits: int,
    num_probes: int,
    seed: int,
) -> list[int]:
    """Build the Bloom bit array (as ``m_bits/64`` longs) over a
    DataFrame of 64-bit gram hashes. The OR-fold runs distributed
    (``bit_or`` per word index); only the folded words reach the
    driver — at most ``m_bits/64`` rows regardless of gram count.

    ``m_bits`` must be a positive multiple of 64 (the array is stored
    as whole 64-bit words; a ragged tail would make bit positions in
    the last word unaddressable) and ``num_probes`` >= 1."""
    if m_bits <= 0 or m_bits % 64 != 0:
        raise ValueError(
            f"m_bits must be a positive multiple of 64, got {m_bits}"
        )
    if num_probes < 1:
        raise ValueError(f"num_probes must be >= 1, got {num_probes}")
    probes = gram_hashes
    words = None
    for s in range(num_probes):
        p = F.pmod(F.xxhash64(F.col(hash_col), F.lit(seed + s)), F.lit(m_bits))
        one = probes.select(
            (p / 64).cast("long").alias("_idx"),
            F.expr(f"shiftleft(1L, cast(pmod(xxhash64({hash_col}, {seed + s}), {m_bits}) % 64 as int))").alias("_mask"),
        )
        words = one if words is None else words.unionByName(one)
    folded = words.groupBy("_idx").agg(F.bit_or("_mask").alias("_word")).collect()
    arr = [0] * (m_bits // 64)
    for r in folded:
        arr[int(r["_idx"])] = int(r["_word"])
    return arr


def contamination_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
    m_bits: int = 1 << 17,
    num_probes: int = 4,
    seed: int = 9000,
    shingle_unit: str = "word",
) -> DataFrame:
    """``contamination`` with a Bloom prefilter — same exact output
    (Bloom filters have no false negatives; false positives die in the
    exact verify join), different scale shape.

    ``contamination`` broadcasts the benchmark's full distinct
    gram-hash set — right when the eval suite is small. When the
    "benchmark" is itself huge (e.g. decontaminating against an entire
    held-out split, billions of grams), broadcast dies; this variant:

    1. folds the benchmark grams into an ``m_bits``-bit Bloom array
       distributedly (``bit_or`` per 64-bit word; only m/64 longs hit
       the driver) and embeds it as a literal — the probe stays
       whole-stage-codegen'd integer arithmetic, no UDF;
    2. probes every corpus gram against the Bloom in the scan stage —
       survivors are ~(true hits + fpp·grams), a vanishing fraction;
    3. shuffle-joins ONLY the survivors against the exact gram set for
       verification (the join the broadcast version couldn't afford is
       now on a tiny left side), then folds counts per doc.

    The corpus text still never shuffles: the doc-keyed groupBy
    carries (id, n_grams, survivor hashes) — a few longs per doc.

    fpp ≈ (1 - e^(-k·n/m))^k; defaults (m=131072 bits, k=4) hold
    ~10k grams at ~2% — size ``m_bits`` to the benchmark (~10 bits
    per gram for 1%)."""
    bench_text_col = bench_text_col or text_col
    bench_staged, bench_sh = _gram_source(
        benchmark, bench_text_col, n, shingle_unit
    )
    bench_grams = (
        bench_staged.select(F.explode_outer(bench_sh).alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    arr = _bloom_array(bench_grams, "gh", m_bits, num_probes, seed)
    bloom = F.array(*[F.lit(x).cast("long") for x in arr])

    corpus_staged, corpus_sh = _gram_source(
        corpus, text_col, n, shingle_unit
    )
    exploded = (
        corpus_staged.select(
            F.col(id_col).alias("_id"),
            corpus_sh.alias("_grams"),
        )
        .select(
            "_id",
            F.size("_grams").cast("long").alias("n_grams"),
            F.explode_outer("_grams").alias("g"),
        )
        .select("_id", "n_grams", F.xxhash64("g").alias("gh"))
        .withColumn("_bloom", bloom)
    )
    might = None
    for s in range(num_probes):
        hit = F.expr(
            f"((element_at(_bloom, cast(pmod(xxhash64(gh, {seed + s}), {m_bits}) div 64 as int) + 1)"
            f" >> cast(pmod(xxhash64(gh, {seed + s}), {m_bits}) % 64 as int)) & 1) != 0"
        )
        might = hit if might is None else (might & hit)

    # one doc-keyed shuffle carrying only survivor hashes; exact verify
    # joins the (tiny) exploded survivor set without any broadcast
    per_doc = (
        exploded.withColumn("_cand", F.when(might, F.col("gh")))
        .groupBy("_id", "n_grams")
        .agg(F.collect_set("_cand").alias("_cands"))
    )
    verified = (
        per_doc.select(
            "_id", "n_grams", F.explode_outer("_cands").alias("gh")
        )
        .join(bench_grams.withColumn("_hit", F.lit(1)), "gh", "left")
        .groupBy("_id", "n_grams")
        .agg(
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias(
                "n_hit_grams"
            )
        )
    )
    return verified.select(
        F.col("_id").alias(id_col),
        "n_grams",
        "n_hit_grams",
        (F.col("n_hit_grams") > 0).alias("contaminated"),
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str,
    bench_vec_col: str | None = None,
    threshold: float = 0.95,
    max_benchmark: int = 100_000,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-level contamination: flag corpus documents whose
    embedding sits within cosine ``threshold`` of ANY benchmark
    embedding — the paraphrase-level leak the n-gram ``contamination``
    probe cannot see (a rephrased eval question shares no 13-gram
    with its source but embeds next to it; Yang et al. 2023,
    "Rethinking Benchmark and Contamination for Language Models with
    Rephrased Samples"). The two probes compose: n-gram catches
    verbatim inclusion cheaply, this catches the rewrites.

    Returns ``(id_col, max_sim, contaminated)`` for every corpus doc:
    the rounded max cosine against the benchmark set and the flag.

    Scale shape (same stance as the n-gram probe): eval suites are
    SMALL by construction, so the benchmark's unit vectors ride the
    task closure (guarded by ``max_benchmark`` — the delete-guard
    discipline, loud instead of silently collecting a corpus) and the
    corpus is never shuffled: one ``mapInPandas`` scan, one
    |batch|×|benchmark| GEMM per Arrow batch (the
    ``streaming/semantic_stream.arrow_cell_assign`` shape), exact max
    — no index, no recall trade. At 100 TB this is embarrassingly
    parallel: zero exchanges, benchmark bytes shipped once per task.
    """
    import numpy as np

    bench_vec_col = bench_vec_col or vec_col
    rows = (
        benchmark.select(bench_vec_col).limit(max_benchmark + 1).collect()
    )
    if len(rows) > max_benchmark:
        raise ValueError(
            f"benchmark exceeds max_benchmark={max_benchmark}; a "
            "benchmark this large would broadcast like a corpus — "
            "raise the guard only if the closure size is acceptable"
        )
    if not rows:
        raise ValueError("benchmark is empty; nothing to probe against")
    # mirror the corpus-side validation on the collected benchmark:
    # a NULL or ragged-dimension row would make np.asarray build an
    # object array and np.linalg.norm die with an opaque driver-side
    # TypeError — name the offending row indices instead (ADVICE r7)
    vecs = [r[0] for r in rows]
    bdim = next((len(v) for v in vecs if v is not None), None)
    bad = [
        i
        for i, v in enumerate(vecs)
        if v is None or len(v) != bdim
    ]
    if bad:
        raise ValueError(
            f"NULL or wrong-dimension {bench_vec_col!r} (expected "
            f"{bdim}) in benchmark rows {bad[:5]}"
            + ("..." if len(bad) > 5 else "")
        )
    bench = np.asarray(vecs, dtype=np.float64)
    bn = np.linalg.norm(bench, axis=1, keepdims=True)
    bench = bench / np.where(bn == 0.0, 1.0, bn)
    id_type = corpus.schema[id_col].dataType.simpleString()

    dim = bench.shape[1]

    def probe(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            vals = pdf[vec_col].tolist()
            bad = [
                pdf[id_col].iloc[i]
                for i, v in enumerate(vals)
                if v is None or len(v) != dim
            ]
            if bad:
                # a raw numpy ragged-array TypeError would fail the
                # stage namelessly — name the offending ids instead
                raise ValueError(
                    f"NULL or wrong-dimension {vec_col!r} (expected "
                    f"{dim}) for ids {bad[:5]}"
                    + ("..." if len(bad) > 5 else "")
                )
            c = np.asarray(vals, dtype=np.float64)
            cn = np.linalg.norm(c, axis=1, keepdims=True)
            c = c / np.where(cn == 0.0, 1.0, cn)
            mx = np.round((c @ bench.T).max(axis=1), round_digits)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "max_sim": mx,
                    "contaminated": mx >= threshold,
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        probe,
        schema=f"{id_col} {id_type}, max_sim double, contaminated boolean",
    )
