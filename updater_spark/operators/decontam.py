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

from updater_spark.operators.dedup import tokenize, word_shingles_of


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 13,
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
    bench_grams = (
        tokenize(benchmark, bench_text_col)
        .select(F.explode_outer(word_shingles_of("_toks", n)).alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    # ONE gram pass per corpus doc: explode carries the gram-set size
    # alongside each gram, a LEFT join against the broadcast set marks
    # hits, and a single doc-keyed groupBy produces both counts — the
    # gram build (the expensive part) is never duplicated across
    # branches (measured ~2× end-to-end vs a sizes⋈hits two-branch
    # plan at sf0.1).
    exploded = (
        tokenize(corpus, text_col)
        .select(
            F.col(id_col).alias("_id"),
            word_shingles_of("_toks", n).alias("_grams"),
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
) -> DataFrame:
    """The corpus minus contaminated docs (all original columns)."""
    dirty = contamination(
        corpus, benchmark, id_col, text_col, bench_text_col, n
    ).filter("contaminated")
    return corpus.join(
        dirty.select(F.col(id_col)), id_col, "anti"
    )
