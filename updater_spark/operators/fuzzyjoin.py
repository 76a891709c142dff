"""Fuzzy string join: all pairs within a Levenshtein edit-distance
bound, via q-gram prefix blocking — never a cartesian product.

Why: training-data pipelines link records across sources by
near-equal strings (titles, names, URLs) — the record-linkage sibling
of the document-level near-dup operators in dedup.py. The reference
engine's only string matching is exact keys + LIKE (P7); this is
extension surface, built on the published blocking theory
(q-gram count filtering: Gravano et al., VLDB 2001; prefix filtering:
Chaudhuri et al. SSJoin, ICDE 2006; ED-Join: Xiao et al., VLDB 2008).

Spark-first shape and the 100 TB math:
- Each side explodes into q-grams ONCE (ids only — strings are NOT
  carried through the gram shuffle; the verify stage joins them back
  by id, so shuffle bytes scale with gram count, not gram count ×
  string length).
- Global gram document-frequency (one agg over both sides' postings)
  gives a consistent rarity order; each string keeps only its
  ``k·q + 1`` RAREST gram VALUES, all occurrences (prefix filter —
  completeness: if ``ed(a,b) ≤ k`` then each side's gram multiset
  loses at most ``k·q`` vs the other, so value prefixes of size
  ``k·q + 1`` under one global order must share a value). Posting
  lists shrink from O(|s|) to O(k·q) per string, and the rarest-gram
  choice makes the candidate join's key distribution as flat as the
  data allows (the same df-ordering lever as dedup.py's df-cut).
- Candidates = equi-join of the two prefix posting sets on the gram
  PLUS the positional q-gram constraints (Gravano et al.):
  ``|pos_l − pos_r| ≤ k`` and ``|len_l − len_r| ≤ k``. On
  low-entropy vocabularies (many near-identical strings) the
  position test is the difference between quadratic and linear
  candidate counts — measured 113s → seconds at sf0.1 on a 64-name
  corpus of 20k rows. Distinct pairs, then exact verify: built-in
  ``levenshtein`` (JVM codegen) — the only per-pair work.
- Strings too short for the bound (fewer than ``k·q + 1`` grams) can
  share ZERO grams with a true match ("ab"→"ba" at k=2), so they
  take a separate short-pool path: both pools are bounded by
  construction (length < q + k·q), the pool join is gated on
  non-emptiness (no cross join appears in plans over short-free
  data) and guarded by ``max_short_pool`` — the delete-guard
  discipline, loud instead of silently huge.

Exactness: the driver oracle is the naive ``LEFT CROSS JOIN ...
WHERE levenshtein ≤ k`` — blocking must be invisible to results.

Choosing ``q`` (the scale lever — measured, PROBES_r7): candidate
density is governed by gram-space entropy. Expected bucket size per
(gram, position-bucket) is ~``n·(L−q+1) / (|Σ|^q · L/k)``, and the
candidate count grows with its SQUARE — so ``q`` must be sized to
the ALPHABET, not just the edit bound. At 1M×1M hex-alphabet 18-char
strings (|Σ|=16): q=4 → 65k gram values → 162M candidates, 69s
total, candidates+verify 56s of it; q=5 → 1M gram values → 10.7M
candidates, 25s total — 2.8× end-to-end with identical verified
output (the operator is exact for every valid q; q only moves the
prefix size k·q+1 and the blocking selectivity). Rule of thumb:
pick the smallest q with ``|Σ|^q ≥ ~n``, subject to the length
floor ``L − q + 1 ≥ k·q + 1`` (strings below it ride the bounded
short pool). The per-id dense_rank prefix window was also probed
against a groupBy+sort_array rewrite: the window is 3.6× FASTER
(4.2s vs 15.2s at 1M ids) — it stays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["fuzzy_join"]


def _grams(col: str, q: int) -> Column:
    """Array of q-grams (character windows); a string shorter than
    ``q`` yields itself as its only gram."""
    return F.expr(
        f"transform(sequence(1, greatest(length({col}) - {q} + 1, 1)),"
        f" i -> substring({col}, i, {q}))"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
    max_short_pool: int = 10_000,
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein ≤ max_dist``.

    Returns (``left_id``, ``right_id``, ``dist``). Ids must be unique
    per side (they key the verify join-back)."""
    prefix = max_dist * q + 1
    short_len = q + max_dist * q - 1  # < prefix grams available

    l = left.select(F.col(left_id).alias("_lid"), F.col(left_col).alias("_a"))
    r = right.select(
        F.col(right_id).alias("_rid"), F.col(right_col).alias("_b")
    )

    # positional postings (gram, first-window position, string length):
    # the positional q-gram lemma (Gravano et al. 2001) says matches
    # within edit distance k keep ≥ L−q+1−k·q shared grams whose
    # positions differ by ≤ k, so the candidate join can demand
    # |pos_l − pos_r| ≤ k and |len_l − len_r| ≤ k on top of gram
    # equality (ED-Join). On degenerate low-entropy vocabularies this
    # is the difference between quadratic and linear candidates —
    # measured 113s → ~10s at sf0.1 on the 64-name part fixture.
    def _postings(side: DataFrame, idc: str, sc: str) -> DataFrame:
        return side.select(
            idc,
            F.length(sc).alias("_len"),
            F.posexplode(_grams(sc, q)).alias("_pos", "g"),
        )

    lg = _postings(l, "_lid", "_a")
    rg = _postings(r, "_rid", "_b")

    # one global rarity order over BOTH sides' gram vocabulary
    df_tbl = (
        lg.select("g")
        .unionByName(rg.select("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("_df"))
    )

    def _prefix(postings: DataFrame, idc: str) -> DataFrame:
        # VALUE-level prefix (dense_rank): keep every occurrence of
        # the k·q+1 rarest gram VALUES. An occurrence-level cut could
        # evict exactly the positionally-matched occurrence of a
        # repeated gram while keeping an incompatible twin; at value
        # level the prefix theorem picks a shared VALUE and the
        # position filter then sees all its occurrences.
        # broadcast the df table EXPLICITLY: it is bounded by the
        # gram-value space (≤ alphabet^q), while the postings side
        # sits under a posexplode whose size estimate is unreliable —
        # left to itself the planner broadcast the 36M-row POSTINGS
        # side at 2M strings/side and OOM'd the driver
        ranked = postings.join(F.broadcast(df_tbl), "g").withColumn(
            "_rk",
            F.dense_rank().over(Window.partitionBy(idc).orderBy("_df", "g")),
        )
        return ranked.filter(F.col("_rk") <= prefix).select(
            idc, "g", "_pos", "_len"
        )

    # binned equi-join on (gram, position bucket) — the rangejoin.py
    # trick: the |pos diff| ≤ k test must be IN the join key, not a
    # post-join filter, or the gram join fans out to every occurrence
    # of a common gram regardless of position (measured 90s vs 8s at
    # sf0.1 on the low-entropy fixture). Bucket width = k; the left
    # side explodes to its bucket ±1, which covers every |Δpos| ≤ k.
    w = max(max_dist, 1)
    lp = _prefix(lg, "_lid").withColumn(
        "_b",
        F.explode(
            F.array(
                F.floor(F.col("_pos") / w) - 1,
                F.floor(F.col("_pos") / w),
                F.floor(F.col("_pos") / w) + 1,
            )
        ),
    )
    rp = (
        _prefix(rg, "_rid")
        .withColumn("_b", F.floor(F.col("_pos") / w))
        .withColumnsRenamed({"_pos": "_rpos", "_len": "_rlen"})
    )
    # both posting sides sit downstream of posexplode, whose size
    # estimates are unreliable enough for the planner to pick a
    # corpus-sized broadcast (measured OOM at 2M rows/side, 8g
    # driver) — pin the candidate join to a shuffle join as well
    cand = (
        lp.join(rp.hint("shuffle_hash"), ["g", "_b"])
        .filter(
            (F.abs(F.col("_pos") - F.col("_rpos")) <= F.lit(max_dist))
            & (F.abs(F.col("_len") - F.col("_rlen")) <= F.lit(max_dist))
        )
        .select("_lid", "_rid")
        .distinct()
    )

    # short×short pool (see module docstring). A short-vs-LONG true
    # pair is still caught by the gram path: with |grams(b)| ≥ k·q+1
    # the overlap bound |A∩B| ≥ |B| − k·q ≥ 1 holds and the short
    # side's "prefix" is its whole gram set, so the standard
    # prefix-intersection theorem applies — only short×short can
    # share zero grams. The pool pairs through a LENGTH-bucket
    # equi-join (left explodes to len−k..len+k), not a cross join:
    # same bounded candidate set (shorts have ≤ short_len+1 distinct
    # lengths), but the plan stays an equi-join — no CartesianProduct
    # anywhere, which the plan-lint suite asserts globally.
    shorts_l = l.filter(F.length("_a") <= short_len)
    shorts_r = r.filter(F.length("_b") <= short_len)
    n_sl = shorts_l.limit(max_short_pool + 1).count()
    if n_sl:
        n_sr = shorts_r.limit(max_short_pool + 1).count()
        if n_sl > max_short_pool or n_sr > max_short_pool:
            raise ValueError(
                f"short-string pool exceeds max_short_pool="
                f"{max_short_pool} ({n_sl} x {n_sr}); raise the guard "
                f"or pre-filter degenerate strings"
            )
        if n_sr:
            sl = shorts_l.select(
                "_lid",
                F.explode(
                    F.sequence(
                        F.length("_a") - max_dist,
                        F.length("_a") + max_dist,
                    )
                ).alias("_lb"),
            )
            sr = shorts_r.select(
                "_rid", F.length("_b").alias("_lb")
            )
            cand = cand.unionByName(
                sl.join(sr, "_lb").select("_lid", "_rid")
            ).distinct()

    # verify join-back: l/r are corpus-sized string tables by
    # definition — pin them to shuffle joins so a near-threshold size
    # estimate can't tempt AQE into broadcasting the corpus (measured:
    # 2M rows × 18-char strings OOM'd an 8g driver's broadcast build)
    return (
        cand.join(l.hint("shuffle_hash"), "_lid")
        .join(r.hint("shuffle_hash"), "_rid")
        .filter(
            (
                F.abs(F.length("_a") - F.length("_b")) <= F.lit(max_dist)
            )
            & (F.levenshtein("_a", "_b") <= F.lit(max_dist))
        )
        .select(
            F.col("_lid").alias(left_id),
            F.col("_rid").alias(right_id),
            F.levenshtein("_a", "_b").cast("long").alias("dist"),
        )
    )
