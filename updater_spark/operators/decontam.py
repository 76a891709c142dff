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

from updater_spark.operators.dedup import word_shingles


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
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(bench_text_col, n)).alias("g")
        )
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(text_col, n)).alias("g"),
    ).select("_id", F.xxhash64("g").alias("gh"))
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gh", "semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_hit_grams"))
    )
    sizes = corpus.select(
        F.col(id_col).alias("_id"),
        F.size(word_shingles(text_col, n)).cast("long").alias("n_grams"),
    )
    return (
        sizes.join(hits, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            F.coalesce("n_hit_grams", F.lit(0)).cast("long").alias(
                "n_hit_grams"
            ),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
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
